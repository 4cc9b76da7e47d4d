package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dropDuplicatesWithinWatermark suppresses redelivery across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamingOps.dedupWithinWatermark(
      input.toDF().toDF("event_id", "ts", "payload"),
      Seq("event_id"), "ts", "10 minutes")
    val query = deduped.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_out").start()
    try {
      input.addData((1L, ts("2024-01-01 00:00:00"), "a"), (2L, ts("2024-01-01 00:00:30"), "b"))
      query.processAllAvailable()
      // batch 2: event 1 redelivered (at-least-once), new event 3
      input.addData((1L, ts("2024-01-01 00:00:00"), "a"), (3L, ts("2024-01-01 00:01:00"), "c"))
      query.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally query.stop()
  }

  test("stream-stream interval join matches within the time bound only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(String, Timestamp, Long)]
    val buys = MemoryStream[(String, Timestamp, Long)]
    val joined = StreamingOps.intervalJoin(
      clicks.toDF().toDF("user", "ts", "click_id"),
      buys.toDF().toDF("user", "ts", "buy_id"),
      key = "user", leftTs = "ts", rightTs = "ts",
      before = "0 seconds", after = "1 hour", watermark = "2 hours")
    val query = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ij_out").start()
    try {
      clicks.addData(("u1", ts("2024-01-01 10:00:00"), 1L), ("u2", ts("2024-01-01 10:00:00"), 2L))
      buys.addData(
        ("u1", ts("2024-01-01 10:30:00"), 100L), // in window  -> match
        ("u1", ts("2024-01-01 12:00:00"), 101L), // too late   -> no match
        ("u2", ts("2024-01-01 09:59:00"), 102L)) // before click -> no match
      query.processAllAvailable()
      val got = spark.table("ij_out").select("click_id", "right_buy_id")
        .as[(Long, Long)].collect().toSeq
      assert(got == Seq((1L, 100L)))
    } finally query.stop()
  }

  test("left-semi interval join emits each matched left row once, cross-batch, no right columns") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(String, Timestamp, Long)]
    val buys = MemoryStream[(String, Timestamp, Long)]
    val joined = StreamingOps.intervalJoin(
      clicks.toDF().toDF("user", "ts", "click_id"),
      buys.toDF().toDF("user", "ts", "buy_id"),
      key = "user", leftTs = "ts", rightTs = "ts",
      before = "0 seconds", after = "1 hour", watermark = "2 hours",
      joinType = "left_semi")
    assert(joined.columns.toSeq == Seq("user", "ts", "click_id"),
      "semi join must carry left columns only")
    val query = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sj_out").start()
    try {
      clicks.addData(("u1", ts("2024-01-01 10:00:00"), 1L),
        ("u2", ts("2024-01-01 10:00:00"), 2L))
      buys.addData(("u1", ts("2024-01-01 10:30:00"), 100L))
      query.processAllAvailable()
      assert(spark.table("sj_out").select("click_id").as[Long].collect().toSeq
        == Seq(1L), "batch 1: only the matched left row emits")
      // batch 2: a SECOND in-window buy must not re-emit u1; a first
      // match for u2 (still in state) emits it exactly once
      buys.addData(("u1", ts("2024-01-01 10:40:00"), 101L),
        ("u2", ts("2024-01-01 10:20:00"), 102L))
      query.processAllAvailable()
      val got = spark.table("sj_out").select("click_id").as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L), s"each left row at most once, got $got")
    } finally query.stop()
  }

  test("left-outer interval join emits null rows after the watermark closes the state") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(String, Timestamp, Long)]
    val buys = MemoryStream[(String, Timestamp, Long)]
    val joined = StreamingOps.intervalJoin(
      clicks.toDF().toDF("user", "ts", "click_id"),
      buys.toDF().toDF("user", "ts", "buy_id"),
      key = "user", leftTs = "ts", rightTs = "ts",
      before = "0 seconds", after = "1 hour", watermark = "10 minutes",
      joinType = "left_outer")
    val query = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("oj_out").start()
    try {
      clicks.addData(("u1", ts("2024-01-01 10:00:00"), 1L), ("u2", ts("2024-01-01 10:00:00"), 2L))
      buys.addData(("u1", ts("2024-01-01 10:30:00"), 100L)) // u2 stays unmatched
      query.processAllAvailable()
      // inner match emits immediately; u2's null row is withheld while
      // a matching buy could still arrive
      val before = spark.table("oj_out").select("click_id").as[Long].collect().toSeq
      assert(before == Seq(1L))
      // advance both watermarks past u2's whole match window
      // (10:00 + 1h + 10min), then one more batch to evict + emit
      clicks.addData(("u3", ts("2024-01-01 12:00:00"), 3L))
      buys.addData(("u3", ts("2024-01-01 12:00:01"), 103L))
      query.processAllAvailable()
      clicks.addData(("u4", ts("2024-01-01 12:00:02"), 4L))
      buys.addData(("u4", ts("2024-01-01 12:00:03"), 104L))
      query.processAllAvailable()
      val out = spark.table("oj_out")
        .select("click_id", "right_buy_id")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      assert(out(2L) == -1L, "unmatched click must surface with null buy")
      assert(out(1L) == 100L)
    } finally query.stop()
  }

  test("sessionizeTws: successor events close sessions in-batch; event-time timers close idle ones") {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Timestamp, Double)]
      // gap 1 minute, watermark delay 0 (wm = max event time seen so far)
      val out = StreamingOps.sessionizeTws(
        input.toDF().toDF("user_id", "ts", "value"), gapMs = 60L * 1000L,
        watermark = "0 seconds")
      val query = out.writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("sess_tws_out").start()
      try {
        // batch 1: user 1 has a 2-event session; user 2 starts one
        input.addData((1L, ts("2024-01-01 10:00:00"), 1.25),
          (1L, ts("2024-01-01 10:00:30"), 2.00),
          (2L, ts("2024-01-01 10:00:30"), 5.00))
        query.processAllAvailable()
        // batch 2: user 2's far-later event closes their first session by
        // SUCCESSOR in this batch; user 1's timer (10:01:30) is still
        // above the batch-1 watermark (10:00:30) so it must NOT fire yet
        input.addData((2L, ts("2024-01-01 10:05:00"), 7.50))
        query.processAllAvailable()
        val afterB2 = spark.table("sess_tws_out").as[StreamingOps.SessOut].collect()
        assert(afterB2.map(_.user_id).toSet == Set(2L),
          s"only user 2's successor-closed session may be out after batch 2: ${afterB2.toSeq}")
        // batch 3: unrelated user advances the watermark to 10:05:00 —
        // user 1's idle session must now emit from handleExpiredTimer
        input.addData((9L, ts("2024-01-01 11:00:00"), 0.50))
        query.processAllAvailable()
        val rows = spark.table("sess_tws_out").as[StreamingOps.SessOut].collect()
          .map(r => r.user_id -> r).toMap
        assert(rows.keySet == Set(1L, 2L)) // users 2-second + 9's sessions still open
        assert(rows(1L).n_events == 2L && rows(1L).cents == 325L,
          s"timer-closed session wrong: ${rows(1L)}")
        assert(rows(2L).n_events == 1L && rows(2L).cents == 500L)
      } finally {
        query.stop()
        spark.catalog.dropTempView("sess_tws_out")
      }
    } finally {
      prior match {
        case Some(v) => spark.conf.set(provKey, v)
        case None    => spark.conf.unset(provKey)
      }
    }
  }

  test("sessionizeTws: cross-batch late arrivals extend the session start " +
      "backward within gap, or emit alone beyond it") {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Timestamp, Double)]
      // gap 1 minute, LONG watermark delay so late rows stay in-watermark
      val out = StreamingOps.sessionizeTws(
        input.toDF().toDF("user_id", "ts", "value"), gapMs = 60L * 1000L,
        watermark = "2 hours")
      val query = out.writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("sess_tws_late").start()
      try {
        // batch 1: user 1's open session starts 10:00:00
        input.addData((1L, ts("2024-01-01 10:00:00"), 1.00))
        query.processAllAvailable()
        // batch 2, both LATE but in-watermark: 09:59:30 is within the
        // gap of the session start → merges, extending the start
        // BACKWARD (the pre-fix code kept start=10:00:00, emitting a
        // session 'containing' an event before its own start);
        // 09:00:00 is >gap before the start → its own completed session
        input.addData((1L, ts("2024-01-01 09:59:30"), 2.00),
          (1L, ts("2024-01-01 09:00:00"), 4.00))
        query.processAllAvailable()
        val emitted = spark.table("sess_tws_late")
          .as[StreamingOps.SessOut].collect()
        assert(emitted.length == 1, s"only the 09:00 orphan emits: ${emitted.toSeq}")
        assert(emitted(0).start_us == emitted(0).last_us &&
          emitted(0).n_events == 1L && emitted(0).cents == 400L)
        // close the open session via the watermark: its start must be
        // the extended 09:59:30, not the original 10:00:00 (two batches:
        // the watermark computed FROM batch 3 only gates batch 4)
        input.addData((9L, ts("2024-01-01 15:00:00"), 0.10))
        query.processAllAvailable()
        input.addData((9L, ts("2024-01-01 15:00:01"), 0.10))
        query.processAllAvailable()
        val sess1 = spark.table("sess_tws_late").as[StreamingOps.SessOut]
          .collect().filter(s => s.user_id == 1L && s.n_events > 1L)
        assert(sess1.length == 1, s"merged session missing: ${sess1.toSeq}")
        assert(sess1(0).start_us == ts("2024-01-01 09:59:30").getTime * 1000L &&
          sess1(0).last_us == ts("2024-01-01 10:00:00").getTime * 1000L &&
          sess1(0).n_events == 2L && sess1(0).cents == 300L,
          s"start not extended backward: ${sess1(0)}")
      } finally {
        query.stop()
        spark.catalog.dropTempView("sess_tws_late")
      }
    } finally {
      prior match {
        case Some(v) => spark.conf.set(provKey, v)
        case None    => spark.conf.unset(provKey)
      }
    }
  }
}
