package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Sub-document (token-block) dedup: planted shared boilerplate must
  * survive only at its first corpus occurrence.
  */
class BlockDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4-token blocks; "h1 h2 h3 h4" is boilerplate shared by docs 1-3
  private val boiler = "h1 h2 h3 h4"
  private val docs = Seq(
    (1L, s"$boiler a b c d"),
    (2L, s"$boiler e f g h"),
    (3L, s"$boiler a b c d"), // fully duplicate of doc 1
    (4L, "x y z")             // short doc: one partial block
  ).toDF("doc_id", "text")

  private lazy val out =
    Dedup.blockDedup(docs, 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("boilerplate survives only in the first document") {
    assert(out(1L) == ((2L, 2L, s"$boiler a b c d")))
    assert(out(2L) == ((2L, 1L, "e f g h")))
  }

  test("fully duplicate document reassembles to empty text") {
    assert(out(3L) == ((2L, 0L, "")))
  }

  test("partial trailing block is kept as its own unit") {
    assert(out(4L) == ((1L, 1L, "x y z")))
  }

  test("token mass is conserved: kept blocks partition the distinct block set") {
    val totalKept = out.values.map(_._2).sum
    // distinct blocks: boiler, "a b c d", "e f g h", "x y z"
    assert(totalKept == 4L)
  }
}
