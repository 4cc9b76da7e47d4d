package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(points: Seq[(String, Long, Long)],
                    intervals: Seq[(String, Long, Long, Long)]) =
    for {
      (pk, pid, v) <- points
      (ik, iid, lo, hi) <- intervals
      if pk == ik && v >= lo && v <= hi
    } yield (pid, iid)

  test("bucketized range join equals the naive cross-filter, spans included") {
    val points = Seq(
      ("a", 1L, 5L), ("a", 2L, 25L), ("a", 3L, 99L),
      ("b", 4L, 5L), ("b", 5L, 1000L))
    // intervals: inside one bucket, spanning several, touching bounds
    val intervals = Seq(
      ("a", 10L, 0L, 9L), ("a", 11L, 5L, 95L), ("a", 12L, 99L, 120L),
      ("b", 13L, 0L, 4L), ("b", 14L, 990L, 1000L))

    val got = RangeJoin.pointInInterval(
      points.toDF("k", "pid", "v"),
      intervals.toDF("k", "iid", "lo", "hi"),
      "v", "lo", "hi", bucketWidth = 10L, keys = Seq("k"))
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq

    assert(got == naive(points, intervals).sorted)
  }

  test("long values above 2^53 bucket exactly (epoch-nanos scale)") {
    val base = 1700000000000000000L // ~2^60, beyond double's mantissa
    val w = 604800000000000L        // one week of nanos
    // point exactly on an interval's lower bound, near a bucket edge
    val points = Seq(("k", 1L, base)).toDF("k", "pid", "v")
    val intervals = Seq(("k", 2L, base, base + w - 1)).toDF("k", "iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi",
      bucketWidth = w, keys = Seq("k"))
    assert(got.count() == 1)
  }

  test("no equi keys: global point-in-interval still matches exactly once per pair") {
    val points = Seq(("x", 1L, 15L)).toDF("k", "pid", "v").drop("k")
    val intervals = Seq(("x", 9L, 0L, 100L)).toDF("k", "iid", "lo", "hi").drop("k")
    val got = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 7L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 9L))) // interval covers 15 buckets; one match, no dups
  }
}
