package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cluster

/** Connected-components / canonicalization: label propagation must
  * resolve transitive duplicate chains, leave singletons alone, and
  * converge to the min-id label regardless of edge order.
  */
class ClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chains, triangles and singletons resolve to min-id components") {
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {10,11}; {20} isolated node in docs only
    val edges = Seq((2L, 1L), (3L, 4L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = Cluster.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long path converges (diameter > a couple of iterations)") {
    // path 0-1-2-...-12: needs several propagation rounds
    val edges = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Cluster.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(cc.size == 13 && cc.values.forall(_ == 0L))
  }

  test("worst-case diameter: path longer than maxIter throws, ample maxIter converges") {
    // path 0-1-...-30: diameter 30 > maxIter 8 — partial labels would be
    // silently wrong, so the guard must throw rather than return them
    val edges = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Cluster.connectedComponents(edges, "id_a", "id_b", maxIter = 8).count()
    }
    assert(e.getMessage.contains("did not converge"))
    // the same graph with enough iterations resolves fully to min-id 0
    val cc = Cluster.connectedComponents(edges, "id_a", "id_b", maxIter = 40)
      .as[(Long, Long)].collect().toMap
    assert(cc.size == 31 && cc.values.forall(_ == 0L))
  }

  test("canonicalize marks one keeper per cluster and keeps singletons") {
    val docs = Seq(1L, 2L, 3L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Cluster.canonicalize(docs, pairs, "doc_id")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (7L, 7L, true)))
  }

  test("memoized LSH-candidate queries survive repeated + interleaved access") {
    // sibling of GraphSpec's label-prop regression: five dedup_*
    // queries share the memoized candidate relation; repeated and
    // cross-query invocations (the bench's 3 passes) must agree
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val raw = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
    val nPairs = raw.count()
    assert(nPairs > 0)
    assert(SparkEntry.queries("dedup_candidate_hist")(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).as[Long]
      .collect()(0) == nPairs, "histogram must cover exactly the pair set")
    assert(SparkEntry.queries("dedup_clusters")(spark, sfDir).count() > 0)
    assert(SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count() == nPairs)
  }
}
