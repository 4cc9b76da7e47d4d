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
    l.join(r,
      col(key) === col(s"right_$key") &&
        col(s"right_$rightTs") >= col(leftTs) - expr(s"INTERVAL $before") &&
        col(s"right_$rightTs") <= col(leftTs) + expr(s"INTERVAL $after"),
      joinType)
      // right-only rows of a full/right outer carry the key only on the
      // right side; coalescing is a no-op for inner/left rows
      .withColumn(key, coalesce(col(key), col(s"right_$key")))
      .drop(s"right_$key")
  }
}
