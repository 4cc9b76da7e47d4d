package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, TopK}

/** Pins the equivalence claims the ANN paths rest on: the bounded-heap
  * [[TopK.topKPerGroup]] must produce exactly what the window
  * `row_number` form would (same rows, same ranks, same tie-breaks) —
  * the heap is a pure plan-shape optimization, not a semantics change.
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference implementation: the window form the heap replaced. */
  private def windowTopK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("candidate_id").asc)
    df.filter(col("cosine").isNotNull)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("candidate_id"),
        col("cosine"), col("rank").cast("long").as("rank"))
  }

  test("heap top-k equals window top-k on random scores, ties included") {
    val rnd = new Random(7)
    // deliberately collide scores (3-value quantization) so tie-breaks
    // are exercised, and include a NULL-score row (must be ignored)
    val rows = (1L to 400L).map { i =>
      (i % 8, i, math.floor(rnd.nextDouble() * 3) / 3.0)
    }
    val scored = rows.toDF("query_id", "candidate_id", "cosine")
      .union(Seq((0L, 9999L, Double.NaN)).toDF("query_id", "candidate_id", "cosine")
        .select(col("query_id"), col("candidate_id"), lit(null).cast("double").as("cosine")))

    for (k <- Seq(1, 5, 17)) {
      val heap = TopK.topKPerGroup(scored, Seq("query_id"), "cosine", "candidate_id", k)
        .select("query_id", "candidate_id", "cosine", "rank")
      val window = windowTopK(scored, k)
      assert(heap.exceptAll(window).isEmpty && window.exceptAll(heap).isEmpty,
        s"heap vs window mismatch at k=$k")
    }
  }

  test("bruteForceTopK equals the window-form reference on random embeddings") {
    val rnd = new Random(11)
    val dim = 8
    def vec() = Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
    val embs = (1L to 60L).map(i => (i, vec())).toDF("id", "emb")
    val queries = embs.filter(col("id") <= 3)

    val heap = Similarity.bruteForceTopK(embs, queries, "emb", "id", k = 5)

    // independent reference: explicit cosine + window ranking
    val q = queries.select(col("id").as("query_id"), col("emb").as("q_vec"))
    val c = embs.select(col("id").as("candidate_id"), col("emb").as("c_vec"))
    val scored = c.crossJoin(q).filter(col("query_id") =!= col("candidate_id"))
      .select(col("query_id"), col("candidate_id"),
        round(graft.functions.VectorFunctions.cosineSimilarity(
          col("q_vec"), col("c_vec")), 6).as("cosine"))
    val reference = windowTopK(scored, 5)

    assert(heap.exceptAll(reference).isEmpty && reference.exceptAll(heap).isEmpty)
  }

  test("pqTopK: self-coded training vectors rank their own direction first") {
    // 16-d vectors, m=4 subspaces of 4: three tight direction groups —
    // PQ's approximate IP must still rank same-group candidates above
    // cross-group ones for a group-member query.
    val rnd = new Random(11)
    def jitter(base: Array[Float]): Seq[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f).toSeq
    val dirs = Seq(
      Array.tabulate(16)(i => if (i < 6) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 6 && i < 11) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 11) 1.0f else 0.0f))
    val rows = (0 until 30).map(i => (i.toLong, jitter(dirs(i % 3))))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(df, df.filter(col("vec_id") < 3),
      "embedding", "vec_id", k = 5, m = 4, subK = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.nonEmpty)
    // every top-5 neighbor of query q belongs to q's direction group
    assert(out.forall { case (q, c, _) => c % 3 == q % 3 },
      s"cross-group neighbor in ${out.mkString(",")}")
    // deterministic across runs
    val again = Similarity.pqTopK(df, df.filter(col("vec_id") < 3),
      "embedding", "vec_id", k = 5, m = 4, subK = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.sortBy(x => (x._1, x._3)).sameElements(again.sortBy(x => (x._1, x._3))))
  }

  test("ivfPqTopK keeps group structure and respects the probed-cell prune") {
    val rnd = new Random(13)
    def jitter(base: Array[Float]): Seq[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f).toSeq
    val dirs = Seq(
      Array.tabulate(16)(i => if (i < 6) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 6 && i < 11) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 11) 1.0f else 0.0f))
    val rows = (0 until 30).map(i => (i.toLong, jitter(dirs(i % 3))))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.ivfPqTopK(df, df.filter(col("vec_id") < 3),
      "embedding", "vec_id", k = 5, nCells = 6, nProbe = 2, m = 4, subK = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.nonEmpty)
    // with tight direction groups, probed cells are same-direction cells:
    // every returned neighbor shares the query's group
    assert(out.forall { case (q, c, _) => c % 3 == q % 3 },
      s"cross-group neighbor in ${out.mkString(",")}")
    // deterministic across runs
    val again = Similarity.ivfPqTopK(df, df.filter(col("vec_id") < 3),
      "embedding", "vec_id", k = 5, nCells = 6, nProbe = 2, m = 4, subK = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.sortBy(x => (x._1, x._3)).sameElements(again.sortBy(x => (x._1, x._3))))
  }

  test("semanticDedup: planted near-identical vectors collapse to the lowest id") {
    val rnd = new Random(23)
    val dim = 16
    def vec() = Seq.fill(dim)(rnd.nextDouble() * 2 - 1)
    // 40 well-separated random vectors + 3 planted near-copies of id 1
    // (tiny perturbation: cosine to the original > 0.999)
    val base = (1L to 40L).map(i => (i, vec()))
    val orig = base.head._2
    val copies = (100L to 102L).map(i =>
      (i, orig.map(x => x + rnd.nextDouble() * 1e-4)))
    val embs = (base ++ copies).toDF("vec_id", "embedding")
    val out = graft.operators.Dedup
      .semanticDedup(embs, "embedding", "vec_id", k = 4, iters = 2, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.size == 43) // one verdict per vector
    assert(out(1L), "lowest id of the duplicate group must survive")
    assert(Seq(100L, 101L, 102L).forall(!out(_)), "planted copies must drop")
    // random vectors in 16-d are near-orthogonal: none clears 0.95
    assert(base.tail.forall { case (i, _) => out(i) }, "unrelated vectors must survive")
  }

  test("semanticDedup adaptive k: chooseK tracks the input and the default path matches the explicit k it resolves to") {
    import graft.operators.Dedup
    // the formula: ceil(n / cellSize), floored at kMin
    assert(Dedup.chooseK(50L, 64, 8) == 8)      // sf0.001-sized
    assert(Dedup.chooseK(500L, 64, 8) == 8)     // gate sf0.01: ⌈500/64⌉ = 8
    assert(Dedup.chooseK(5000L, 64, 8) == 79)   // bench sf0.1 grows k
    assert(Dedup.chooseK(1000000L, 64, 8) == 15625)
    assert(Dedup.chooseK(0L, 64, 8) == 8)
    // default (adaptive) invocation ≡ explicit k = chooseK(N):
    // 43 vectors → k = max(8, ⌈43/64⌉) = 8
    val rnd = new Random(7)
    val dim = 16
    val embs = (1L to 43L).map(i =>
      (i, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vec_id", "embedding")
    val adaptive = Dedup.semanticDedup(embs, "embedding", "vec_id",
        iters = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    val explicit = Dedup.semanticDedup(embs, "embedding", "vec_id",
        k = 8, iters = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(adaptive.sameElements(explicit))
  }

  test("ANN recall@3 vs brute force clears the floor on the real embeddings table") {
    // Correctness rows pin determinism; THIS pins retrieval quality —
    // the point of ANN. Ground truth = exact brute-force cosine top-3;
    // recall = |approx ∩ truth| / |truth|, averaged over 20 queries of
    // the driver-generated embeddings table (500 × 64-dim, labeled
    // clusters). Floors are deliberately below observed values so the
    // test flags structural recall collapse, not sampling noise.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 20)
    val k = 3

    def topSet(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("query_id"), col("candidate_id"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, cs) => q -> cs.map(_._2).toSet }

    val truth = topSet(Similarity.bruteForceTopK(e, queries, "embedding", "vec_id", k))
    def recall(df: DataFrame): Double = {
      val approx = topSet(df)
      val per = truth.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      per.sum / per.size
    }

    // the same operating points the declared knn_* queries use
    val results = Map(
      "lsh" -> recall(Similarity.lshTopK(e, queries, "embedding", "vec_id", k,
        dim = 64, seeds = Seq(42L, 43L, 44L, 45L), probeHamming = 2)),
      "ivf" -> recall(Similarity.ivfTopK(e, queries, "embedding", "vec_id", k, nProbe = 6)),
      "pq" -> recall(Similarity.pqTopK(e, queries, "embedding", "vec_id", k, refine = 96)),
      "ivfpq" -> recall(Similarity.ivfPqTopK(e, queries, "embedding", "vec_id", k,
        nProbe = 8, refine = 96)))
    info(s"recall@$k: $results")
    // measured: lsh 0.75, ivf 0.75, pq 0.85, ivfpq 0.817 (deterministic
    // pipeline — the margin only absorbs a testdata regeneration)
    val floors = Map("lsh" -> 0.65, "ivf" -> 0.65, "pq" -> 0.75, "ivfpq" -> 0.7)
    floors.foreach { case (m, floor) =>
      assert(results(m) >= floor, s"$m recall@$k ${results(m)} below floor $floor ($results)")
    }
  }

  test("planted near-duplicates land in the same minhash band bucket") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val docs = Seq(
      (1L, base),
      (2L, base + " now"),                       // near-dup of 1
      (3L, "completely different content about spark catalyst optimizer rules"),
      (4L, base)                                  // exact dup of 1
    ).toDF("doc_id", "text")

    val pairs = graft.operators.Dedup
      .minHashCandidates(docs, "text", "doc_id", shingleLen = 5, bands = 4, rowsPerBand = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "exact dup must share every band")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      "planted near-dup must share at least one band")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must not appear in any candidate pair")
  }
}
