package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Intervals

class IntervalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def merge(spans: Seq[(String, Long, Long)]) =
    Intervals.mergeOverlapping(
      spans.toDF("k", "s", "e"), Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet

  test("overlapping and touching spans coalesce; gaps split") {
    assert(merge(Seq(("a", 0L, 10L), ("a", 5L, 12L), ("a", 12L, 20L),
      ("a", 25L, 30L))) ==
      Set(("a", 0L, 20L, 3L), ("a", 25L, 30L, 1L)))
  }

  test("a long span swallows later short ones (running max, not lag)") {
    // (0,100) covers (10,20) and (30,40); naive prev-end logic would
    // break at 30 because 30 > 20
    assert(merge(Seq(("a", 0L, 100L), ("a", 10L, 20L), ("a", 30L, 40L),
      ("a", 150L, 160L))) ==
      Set(("a", 0L, 100L, 3L), ("a", 150L, 160L, 1L)))
  }

  test("keys are independent islands") {
    assert(merge(Seq(("a", 0L, 10L), ("b", 5L, 15L))) ==
      Set(("a", 0L, 10L, 1L), ("b", 5L, 15L, 1L)))
  }
}
