package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CdcOps, IncrementalAgg}

/** Maintained aggregate must equal a from-scratch recompute over the
  * merged state — inserts add, updates move between groups, deletes
  * retract (dropping a group entirely when it empties).
  */
class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")

  private def ev(i: Int, op: String, id: Long, grp: String, v: Double) =
    (ts(i), op, id, grp, v)

  private val cols = Seq("timestamp", "__op", "id", "grp", "v")

  test("maintain equals recompute across inserts, cross-group updates, deletes") {
    val day1 = Seq(
      ev(1, "c", 1, "a", 10.0), ev(2, "c", 2, "a", 20.0),
      ev(3, "c", 3, "b", 30.0), ev(4, "c", 4, "c", 40.0))
      .toDF(cols: _*)
    val day2 = Seq(
      ev(5, "u", 2, "b", 25.0),  // moves a→b
      ev(6, "d", 4, "c", 0.0),   // group c empties and must vanish
      ev(7, "c", 5, "d", 50.0),  // brand-new group d
      ev(8, "u", 5, "d", 55.0))  // same-batch update chain
      .toDF(cols: _*)

    val state1 = CdcOps.foldMerge(day1, Seq("id"), Seq("timestamp"))
    val agg1 = IncrementalAgg.recompute(state1, Seq("grp"), "v")

    val maintained = IncrementalAgg.maintain(agg1, state1, day2,
      Seq("id"), Seq("timestamp"), Seq("grp"), "v")

    val state2 = CdcOps.foldMerge(day1.unionByName(day2), Seq("id"), Seq("timestamp"))
    val expected = IncrementalAgg.recompute(state2, Seq("grp"), "v")

    val got = maintained.select($"grp", $"sum_val".cast("double"), $"n")
      .as[(String, Double, Long)].collect().sortBy(_._1).toSeq
    val want = expected.select($"grp", $"sum_val".cast("double"), $"n")
      .as[(String, Double, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
    assert(got.map(_._1) == Seq("a", "b", "d")) // c retracted away
    assert(got.find(_._1 == "b").get._2 == 55.0) // 30 + moved 25
  }

  test("a late batch event older than a prior delete does not resurrect the key") {
    val day1 = Seq(ev(1, "c", 1, "a", 99.0), ev(9, "d", 1, "a", 0.0)).toDF(cols: _*)
    val state1 = CdcOps.foldMerge(day1, Seq("id"), Seq("timestamp")) // empty
    val agg1 = IncrementalAgg.recompute(state1, Seq("grp"), "v")
    val tombs = Seq((ts(9), 1L)).toDF("timestamp", "id")
    val lateBatch = Seq(ev(5, "u", 1, "a", 42.0)).toDF(cols: _*) // older than the delete

    val maintained = IncrementalAgg.maintain(agg1, state1, lateBatch,
      Seq("id"), Seq("timestamp"), Seq("grp"), "v", prevTombstones = Some(tombs))
    assert(maintained.count() == 0) // delete still wins
  }

  test("NULL group keys merge null-safely instead of duplicating the group") {
    val day1 = Seq((ts(1), "c", 1L, null: String, 10.0)).toDF(cols: _*)
    val day2 = Seq((ts(2), "c", 2L, null: String, 5.0)).toDF(cols: _*)
    val state1 = CdcOps.foldMerge(day1, Seq("id"), Seq("timestamp"))
    val agg1 = IncrementalAgg.recompute(state1, Seq("grp"), "v")
    val got = IncrementalAgg.maintain(agg1, state1, day2,
      Seq("id"), Seq("timestamp"), Seq("grp"), "v")
      .select($"grp", $"sum_val".cast("double"), $"n")
      .as[(Option[String], Double, Long)].collect().toSeq
    assert(got == Seq((None, 15.0, 2L)))
  }

  test("a group whose values are all NULL keeps sum_val NULL, matching SQL SUM") {
    val day1 = Seq((ts(1), "c", 1L, "a", Some(1.0))).toDF(cols: _*)
    val day2 = Seq((ts(2), "c", 2L, "b", None: Option[Double])).toDF(cols: _*)
    val state1 = CdcOps.foldMerge(day1, Seq("id"), Seq("timestamp"))
    val agg1 = IncrementalAgg.recompute(state1, Seq("grp"), "v")
    val got = IncrementalAgg.maintain(agg1, state1, day2,
      Seq("id"), Seq("timestamp"), Seq("grp"), "v")
      .select($"grp", $"sum_val".cast("double"), $"n")
      .as[(String, Option[Double], Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", Some(1.0), 1L), ("b", None, 1L)))
  }

  test("empty batch is a no-op") {
    val day1 = Seq(ev(1, "c", 1, "a", 10.0)).toDF(cols: _*)
    val state1 = CdcOps.foldMerge(day1, Seq("id"), Seq("timestamp"))
    val agg1 = IncrementalAgg.recompute(state1, Seq("grp"), "v")
    val maintained = IncrementalAgg.maintain(agg1, state1,
      day1.where(lit(false)), Seq("id"), Seq("timestamp"), Seq("grp"), "v")
    assert(maintained.select($"grp", $"sum_val".cast("double"), $"n")
      .as[(String, Double, Long)].collect().toSeq == Seq(("a", 10.0, 1L)))
  }
}
