package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** One NEGATIVE test per round-8 ADVICE item (round-9 verdict, "Next
  * round" #7): the fixes were verified landed in code; these pin them
  * so they cannot regress silently. Each test is named for the advice
  * item it guards.
  */
class AdviceRegressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.operators.{Eval, Rank}

  test("advice r8#1: weightedPercentiles RAISES on a fractional weight " +
    "instead of truncating it") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 2.5), ("a", 2.0, 1.0)).toDF("g", "v", "w")
    val e = intercept[Exception] {
      Rank.weightedPercentiles(df, col("g"), col("v"), col("w"),
        Seq("p50" -> 0.5)).collect()
    }
    assert(String.valueOf(e.getMessage).contains("non-integral weight") ||
      String.valueOf(e.getCause).contains("non-integral weight"),
      s"wrong failure: $e")
    // integral-valued doubles still pass (the guard is about VALUE,
    // not declared type)
    val ok = Rank.weightedPercentiles(
      Seq(("a", 1.0, 2.0), ("a", 2.0, 1.0)).toDF("g", "v", "w"),
      col("g"), col("v"), col("w"), Seq("p50" -> 0.5)).collect()
    assert(ok.nonEmpty)
  }

  test("advice r8#2: bootstrapMeanCI rejects reps outside the provable " +
    "decimal-overflow bound [2, 64]") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    for (bad <- Seq(1, 65, 1000)) {
      val e = intercept[IllegalArgumentException] {
        Eval.bootstrapMeanCI(df, col("v"), col("id"), reps = bad)
      }
      assert(e.getMessage.contains("reps"), s"reps=$bad: $e")
    }
  }

  test("advice r8#3: eventsStream re-probes the ts type when the fixture " +
    "is regenerated in place (tsTypeCache keyed on mtime AND length)") {
    val dir = java.nio.file.Files.createTempDirectory("tscache").toFile
    def writeEvents(nanosAsLong: Boolean, n: Int): Unit = {
      import spark.implicits._
      val base = (1 to n).map { i =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:0${i % 6}%d:00"),
          i.toLong % 5, "click", i.toDouble, """{"k":1}""")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val flavored =
        if (nanosAsLong) // older generation: ts as a raw nanos long
          base.withColumn("ts", (unix_timestamp(col("ts")) * 1000000000L))
        else base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      val tmp = new java.io.File(dir, "stage")
      flavored.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(dir, "events.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    def runStream(): Long = {
      val out = SparkEntry.queries("stream_dedup")(spark, dir.toString)
      out.count()
    }
    writeEvents(nanosAsLong = false, n = 8)
    assert(runStream() == 8L)
    // regenerate IN PLACE with the other ts flavor and a different row
    // count; a stale footer-probe cache entry would declare the wrong
    // stream schema here and fail (or silently misread) the second run
    writeEvents(nanosAsLong = true, n = 12)
    assert(runStream() == 12L)
  }

  test("advice r8#4: the localCheckpoint release guard only fires on a " +
    "single-LogicalRDD-leaf plan (a union of two checkpoints keeps both)") {
    import spark.implicits._
    val m = graft.operators.Cluster.getClass.getDeclaredMethods
      .find(_.getName.endsWith("unpersistLocalCheckpoint"))
      .getOrElse(fail("unpersistLocalCheckpoint no longer exists"))
    m.setAccessible(true)
    val a = Seq(1, 2, 3).toDF("x").localCheckpoint()
    val b = Seq(4, 5).toDF("x").localCheckpoint()
    val two = a.union(b)
    m.invoke(graft.operators.Cluster, two)
    // both inputs must still be readable — the guard refused the
    // ambiguous release
    assert(two.count() == 5L)
    assert(a.count() == 3L && b.count() == 2L)
    val single = Seq(9).toDF("x").localCheckpoint()
    m.invoke(graft.operators.Cluster, single)
    // released: the backing RDD is no longer in the block manager set
    // (count() would now recompute-fail for a localCheckpoint, so just
    // check the storage level dropped)
    val rdd = single.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.head
    assert(rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("advice r9#1: jsdFromBinCounts yields NULL (not NaN-poisoned 0) " +
    "when a cohort is empty") {
    import spark.implicits._
    // all rows pre-split: cohort B is empty -> 0/0 shares would go NaN
    // and Spark's NaN > 0 = true would fold NaN terms into the decimal
    // sum as NULL jsd with non-NULL terms; the guard NULLs the whole
    // readout like cvmStatistic
    val bins = Seq((0L, 5L, 0L), (1L, 3L, 0L)).toDF("bin", "ca", "cb")
    val out = Eval.jsdFromBinCounts(bins, 0, 1).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("p_b")), "p_b must be NULL")
      assert(r.isNullAt(r.fieldIndex("term")), "term must be NULL")
      assert(r.isNullAt(r.fieldIndex("jsd")), "jsd must be NULL")
      assert(r.isNullAt(r.fieldIndex("jsd_bits")), "jsd_bits must be NULL")
    }
    // both cohorts populated -> fully non-NULL readout
    val ok = Eval.jsdFromBinCounts(
      Seq((0L, 5L, 2L), (1L, 3L, 6L)).toDF("bin", "ca", "cb"), 0, 1)
      .collect()
    ok.foreach(r => assert(!r.isNullAt(r.fieldIndex("jsd"))))
  }

  test("advice r9#2: q_logrank's arm predicate is sign-preserving % " +
    "(pmod would silently flip the arm for negative ids)") {
    import spark.implicits._
    // the behavioral fact the fix rests on: Spark % matches DuckDB %
    // (sign-preserving) while pmod does not — on user_id = -3, the
    // oracle's `user_id % 2 = 1` is FALSE (-3 % 2 = -1) but
    // pmod(-3, 2) = 1 would put the row in arm A
    val rows = Seq(-3L, -2L, 3L).toDF("user_id")
      .select(col("user_id"),
        (col("user_id") % 2 === 1).as("arm_mod"),
        (pmod(col("user_id"), lit(2L)) === 1).as("arm_pmod"))
      .collect()
    val m = rows.map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(m(-3L) == ((false, true)), "Spark % and pmod must diverge on -3")
    assert(m(3L) == ((true, true)))
    // and the query source pins the sign-preserving form: the q_logrank
    // arm must not be built from pmod (the r8#5 source-pin precedent)
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala"))
    val i = src.indexOf("\"q_logrank\" ->")
    assert(i > 0, "q_logrank query disappeared")
    val block = src.substring(i, src.indexOf("\" ->", i + 20) max (i + 400))
    assert(!block.contains("pmod("), "q_logrank arm regressed to pmod")
    assert(block.contains("% 2 === 1"), "q_logrank arm predicate changed")
  }

  test("advice r9#3: kendallTauB coalesces the tie counters to 0 on " +
    "empty input, matching the oracle's degenerate-row contract") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Double)].toDF("x", "y")
    val r = Eval.kendallTauB(empty, col("x"), col("y")).collect()(0)
    assert(r.getAs[Long]("concordant") == 0L)
    assert(r.getAs[Long]("discordant") == 0L)
    assert(r.getAs[Long]("ties_x") == 0L, "ties_x must coalesce to 0")
    assert(r.getAs[Long]("ties_y") == 0L, "ties_y must coalesce to 0")
    assert(r.isNullAt(r.fieldIndex("tau_b")), "tau_b undefined on empty")
  }

  test("advice r8#5: OracleGen's scaladoc still documents the replay " +
    "contract next to the code (doc re-attached, not drifting)") {
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/OracleGen.scala"))
    val objIdx = src.indexOf("object OracleGen")
    assert(objIdx > 0)
    val docEnd = src.lastIndexOf("*/", objIdx)
    assert(docEnd > 0 && src.substring(0, docEnd).contains("/**"),
      "OracleGen lost its attached scaladoc block")
  }
}
