package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus

/** Token-budget shard packing: the distributed two-level prefix sum
  * must equal the single-window reference semantics exactly.
  */
class PackShardsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ids deliberately sparse + out of insertion order; two strata
  private val docs = Seq(
    (7L, "a", "w1 w2 w3"),          // 3 tokens
    (1L, "a", "w1 w2 w3 w4"),       // 4
    (300L, "a", "w1 w2"),           // 2
    (65L, "a", "w1 w2 w3 w4 w5"),   // 5 — crosses bucketWidth=64
    (2L, "b", "w1"),                // separate stratum restarts at 0
    (900L, "b", "w1 w2 w3 w4 w5 w6")
  ).toDF("doc_id", "source", "text")

  test("two-level prefix sum equals the single-window reference for every bucket width") {
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val reference = docs
      .select($"doc_id", $"source",
        size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("shard_id",
        (coalesce(sum($"n_tokens").over(w), lit(0L)) / lit(5L)).cast("long"))
    for (bw <- Seq(1L, 2L, 64L, 1L << 16)) {
      val packed = Corpus.packShards(docs, budget = 5, bucketWidth = bw)
      assert(packed.exceptAll(reference).isEmpty &&
        reference.exceptAll(packed).isEmpty, s"bucketWidth=$bw")
    }
  }

  test("budget-5 packing splits stratum a at the documented boundaries") {
    val got = Corpus.packShards(docs, budget = 5, bucketWidth = 64)
      .filter($"source" === "a")
      .select($"doc_id", $"shard_id").as[(Long, Long)].collect().toMap
    // order: 1(4 tok, cum_before 0 → shard 0), 7(3, 4 → 0),
    //        65(5, 7 → 1), 300(2, 12 → 2)
    assert(got == Map(1L -> 0L, 7L -> 0L, 65L -> 1L, 300L -> 2L))
  }
}
