package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming operators beyond the reference's raw dump: the reference
  * tolerates Kafka's at-least-once delivery by deduplicating *in batch*
  * hours later (`pipelines/daily_data_handler.py:106-109`); these fold
  * the same guarantees into the stream itself.
  */
object StreamingOps {

  /** Exactly-once-per-key-within-watermark dedup of an at-least-once
    * stream. State is bounded by the watermark horizon (keys expire as
    * event time advances), so it survives unbounded key cardinality —
    * the property plain `dropDuplicates` on a stream lacks.
    */
  def dedupWithinWatermark(df: DataFrame, keys: Seq[String],
                           tsCol: String, delay: String): DataFrame = {
    require(keys.nonEmpty, "dedupWithinWatermark needs at least one key column")
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
  }

  /** Stream-stream interval join: left events matched to right events
    * with the same `key` whose timestamp lies in
    * `[leftTs - before, leftTs + after]`. Both sides are watermarked so
    * the join state is purged as event time advances — the unbounded
    * buffering a naive stream join would need is exactly what breaks
    * at scale.
    *
    * Right columns are prefixed with `right_` (the join key keeps the
    * left name).
    *
    * `joinType` may be `left_semi`: each left row emits AT MOST ONCE,
    * as soon as some in-window right row is seen (no right columns in
    * the output); unmatched left rows are silently dropped from state
    * once the watermark proves no match can arrive — so the result is
    * exactly the batch semi join, with state bounded the same way as
    * the inner join.
    *
    * `joinType` may be `left_outer`: unmatched left rows surface with
    * null right columns once the watermark proves no matching right
    * row can still arrive — Spark holds them in state until then, so
    * outer results trail the inner ones by up to the watermark delay
    * (and rows the final watermark never clears are withheld, the
    * price of a provably-correct outer result on an unbounded stream).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   before: String, after: String,
                   watermark: String, joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"right_$c"))
      .withWatermark(s"right_$rightTs", watermark)
    val joined = l.join(r,
      col(key) === col(s"right_$key") &&
        col(s"right_$rightTs") >= col(leftTs) - expr(s"INTERVAL $before") &&
        col(s"right_$rightTs") <= col(leftTs) + expr(s"INTERVAL $after"),
      joinType)
    // a semi join carries no right columns at all; for the others,
    // right-only rows of a full/right outer carry the key only on the
    // right side (coalescing is a no-op for inner/left rows)
    if (joinType == "left_semi") joined
    else joined
      .withColumn(key, coalesce(col(key), col(s"right_$key")))
      .drop(s"right_$key")
  }

  /** Input/output rows for [[SessionProcessor]]. Times travel as epoch
    * MICROS (java.sql.Timestamp in state would lose sub-ms through the
    * encoder round-trip only at output; µs longs are unambiguous) and
    * money as exact CENTS (the corpus `value` is a 2-dp double, so
    * `round(v*100)` is exact and the sum is order-independent —
    * `cents / 100.0` equals DuckDB's `CAST(SUM(DECIMAL(12,2)) AS
    * DOUBLE)` because both are the nearest double to the same rational).
    */
  final case class SessIn(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessOpen(startUs: Long, lastUs: Long, n: Long, cents: Long)
  final case class SessOut(user_id: Long, start_us: Long, last_us: Long,
                           n_events: Long, cents: Long)

  /** Gap-based sessionizer on Spark 4 `transformWithState` with
    * EVENT-TIME TIMERS — the API surface the built-in `session_window`
    * hides: a session closed by a successor event emits immediately in
    * that batch; the trailing open session per key emits from
    * [[StatefulProcessor.handleExpiredTimer]] when the watermark passes
    * `last + gap` (timer re-registered as events extend the session),
    * and a session the final watermark never clears is withheld —
    * correct unbounded-stream semantics, modeled explicitly by the
    * `stream_session_tws` oracle exactly as `stream_outer_join` does.
    *
    * State is one [[SessOpen]] + one timer per LIVE key — bounded by
    * the concurrent-session working set, not key history.
    */
  class SessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, SessIn, SessOut] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, ExpiredTimerInfo, TTLConfig, ValueState}
    @transient private var open: ValueState[SessOpen] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessOpen]("session",
        org.apache.spark.sql.Encoders.product[SessOpen], TTLConfig.NONE)
    private def tsUs(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
    private def emit(key: Long, s: SessOpen): SessOut =
      SessOut(key, s.startUs, s.lastUs, s.n, s.cents)
    override def handleInputRows(key: Long, rows: Iterator[SessIn],
        timerValues: TimerValues): Iterator[SessOut] = {
      val evs = rows.toArray.sortBy(e => tsUs(e.ts))
      var out = List.empty[SessOut]
      var cur = if (open.exists()) Option(open.get()) else None
      evs.foreach { e =>
        val us = tsUs(e.ts)
        val cents = math.round(e.value * 100.0)
        cur = cur match {
          case Some(s) if us - s.lastUs > gapMs * 1000L =>
            out ::= emit(key, s)
            Some(SessOpen(us, us, 1L, cents))
          // cross-batch late arrival BEFORE the open session's start
          // (in-batch reordering is already handled by the sort above):
          // within the gap of the start it genuinely merges — extending
          // the start backward, as full-data sessionization would —
          // beyond it it belongs to an earlier, already-closed session
          // and emits alone (the bounded-state best effort: one open
          // session per key means earlier late siblings can't regroup)
          case Some(s) if us < s.startUs =>
            if (s.startUs - us <= gapMs * 1000L)
              Some(SessOpen(us, s.lastUs, s.n + 1L, s.cents + cents))
            else {
              out ::= SessOut(key, us, us, 1L, cents)
              Some(s)
            }
          case Some(s) =>
            Some(SessOpen(s.startUs, math.max(s.lastUs, us), s.n + 1L, s.cents + cents))
          case None =>
            Some(SessOpen(us, us, 1L, cents))
        }
      }
      cur.foreach { s =>
        open.update(s)
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(s.lastUs / 1000L + gapMs)
      }
      out.reverseIterator
    }
    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessOut] =
      if (open.exists()) {
        val s = open.get()
        open.clear()
        Iterator.single(emit(key, s))
      } else Iterator.empty
  }

  /** Sessionize `(user_id, ts, value)` rows via [[SessionProcessor]].
    * Requires the RocksDB state-store provider (transformWithState
    * rejects the default store).
    */
  def sessionizeTws(events: DataFrame, gapMs: Long,
                    watermark: String): org.apache.spark.sql.Dataset[SessOut] = {
    import events.sparkSession.implicits._
    events.selectExpr("user_id", "ts", "value").as[SessIn]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append)
  }
}
