package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CdcOps, Scd}

/** SCD Type-2 + point-in-time snapshot over the F3 merge script. */
class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")

  private val script: Seq[(Timestamp, String, String, Option[String])] = Seq(
    (ts(1), "r", "1", Some("LOAN")),
    (ts(2), "c", "2", Some("CARD")),
    (ts(4), "u", "1", Some("DEPOSIT")),
    (ts(3), "u", "1", Some("SAVINGS")),
    (ts(5), "d", "2", None),
    (ts(6), "c", "2", Some("CARD2")),
    (ts(7), "u", "3", Some("BOND")),
    (ts(8), "d", "9", None),
    (ts(9), "c", "4", None),
    (ts(10), "u", "4", Some("FX"))
  )

  private def frame(events: Seq[(Timestamp, String, String, Option[String])]): DataFrame =
    events.toDF("timestamp", "__op", "ID", "PRODUCT")
      .withColumn("__deleted", lit("false"))
      .select($"timestamp", $"__op", $"__deleted", $"ID", $"PRODUCT")

  test("scd2 opens a version per upsert and closes with the next event") {
    val hist = Scd.scd2(frame(script), Seq("ID"), Seq("timestamp"))
      .select($"ID", $"PRODUCT", $"valid_from", $"valid_to", $"is_current")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
      .toSet
    val expected = Set(
      // key 1: r@1 closed by u@3, u@3 closed by u@4, u@4 current
      ("1", Some("LOAN"), ts(1), Some(ts(3)), false),
      ("1", Some("SAVINGS"), ts(3), Some(ts(4)), false),
      ("1", Some("DEPOSIT"), ts(4), None, true),
      // key 2: c@2 closed by d@5 (delete emits no row), c@6 current
      ("2", Some("CARD"), ts(2), Some(ts(5)), false),
      ("2", Some("CARD2"), ts(6), None, true),
      ("3", Some("BOND"), ts(7), None, true),
      // key 9: delete only — no versions at all
      ("4", None, ts(9), Some(ts(10)), false),
      ("4", Some("FX"), ts(10), None, true))
    assert(hist == expected)
  }

  test("scd2 current rows equal the foldMerge state") {
    val current = Scd.scd2(frame(script), Seq("ID"), Seq("timestamp"))
      .filter($"is_current")
      .select($"ID", $"PRODUCT")
    val folded = CdcOps.foldMerge(frame(script), Seq("ID"), Seq("timestamp"))
      .select($"ID", $"PRODUCT")
    assert(current.exceptAll(folded).isEmpty && folded.exceptAll(current).isEmpty)
  }

  test("snapshotAt reconstructs each intermediate state of the script") {
    def state(asOf: Timestamp): Map[String, Option[String]] =
      Scd.snapshotAt(frame(script), Seq("ID"), lit(asOf), Seq("timestamp"))
        .select($"ID", $"PRODUCT").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(state(ts(1)) == Map("1" -> Some("LOAN")))
    assert(state(ts(4)) == Map("1" -> Some("DEPOSIT"), "2" -> Some("CARD")))
    assert(state(ts(5)) == Map("1" -> Some("DEPOSIT"))) // 2 deleted
    assert(state(ts(10)) == Map("1" -> Some("DEPOSIT"), "2" -> Some("CARD2"),
      "3" -> Some("BOND"), "4" -> Some("FX")))
  }

  test("snapshotAt before the first event is empty") {
    assert(Scd.snapshotAt(frame(script), Seq("ID"),
      lit(Timestamp.valueOf("2023-12-31 00:00:00")), Seq("timestamp")).isEmpty)
  }
}
