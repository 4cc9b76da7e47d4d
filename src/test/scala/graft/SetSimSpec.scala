package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.functions.TextFunctions

/** Prefix-filtered exact set-similarity join: output must equal the
  * brute-force all-pairs Jaccard join (exact recall is the whole point
  * — a missed pair means the prefix bound is implemented wrong).
  */
class SetSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumped over the lazy dog"), // near-dup of 1
    (3L, "completely different content about spark plans"),
    (4L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 1
    (5L, "spark plans and completely different content"),  // shares much with 3
    (6L, "zz")                                             // below shingle length
  ).toDF("doc_id", "text")

  private def brute(threshold: Double): Set[(Long, Long)] = {
    val sets = docs
      .select(col("doc_id"), TextFunctions.normalizeWs(col("text")).as("n"))
      .select(col("doc_id"), TextFunctions.charShinglesOf(col("n"), 5).as("sh"))
    val a = sets.select(col("doc_id").as("id_a"), col("sh").as("sa"))
    val b = sets.select(col("doc_id").as("id_b"), col("sh").as("sb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(size(col("sa")) > 0 && size(col("sb")) > 0)
      .filter(TextFunctions.jaccard(col("sa"), col("sb")) >= threshold)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  test("matches brute force exactly at t=0.5") {
    val got = Dedup.prefixFilterPairs(docs, "text", "doc_id", 5, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == brute(0.5))
    assert(got.contains((1L, 2L)) && got.contains((1L, 4L)) && got.contains((2L, 4L)))
  }

  test("matches brute force exactly at a high threshold") {
    val got = Dedup.prefixFilterPairs(docs, "text", "doc_id", 5, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == brute(0.9))
    assert(got.contains((1L, 4L))) // the exact dup survives any threshold
  }

  test("exact duplicates report jaccard 1.0 and short docs never pair") {
    val rows = Dedup.prefixFilterPairs(docs, "text", "doc_id", 5, 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(rows.find(r => r._1 == 1L && r._2 == 4L).exists(_._3 == 1.0))
    assert(!rows.exists(r => r._1 == 6L || r._2 == 6L))
  }

  test("classic single-witness bound (c=1) is still exact") {
    val got = Dedup.prefixFilterPairs(docs, "text", "doc_id", 5, 0.5,
        witnesses = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == brute(0.5))
  }

  test("no cartesian product in the physical plan") {
    val plan = Dedup.prefixFilterPairs(docs, "text", "doc_id", 5, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "prefix-filter join must pair via the prefix-token equi-join")
  }

  test("releases the corpus-sized pins, keeping only the pair result") {
    // a doc set unique to this test — an input shared with earlier
    // tests would make persist() a cache HIT and the count a no-op
    val own = (0L until 40L).map(i =>
      (i, s"pin release probe text number ${i % 7} variant ${i % 3}"))
      .toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = Dedup.prefixFilterPairs(own, "text", "doc_id", 5, 0.5)
    out.collect()
    // ordered-token and dictionary pins released; the pinned pair
    // relation is the single survivor (round-7 review's leak)
    assert(spark.sparkContext.getPersistentRDDs.size == before + 1)
    out.unpersist()
    assert(spark.sparkContext.getPersistentRDDs.size == before)
  }
}
