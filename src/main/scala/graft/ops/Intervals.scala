package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed spans — the gaps-and-islands primitive
  * behind availability windows, incident timelines, and coverage
  * reporting.
  *
  * [[mergeOverlapping]] coalesces overlapping *or touching* spans per
  * key: an island breaks only where a span starts strictly after the
  * running max end of everything before it. Variable-length spans make
  * this genuinely different from gap sessionization (`q_sessionize`) —
  * a long span can swallow several later short ones, so the break test
  * needs the running MAX of ends, not the previous row's end.
  *
  * Plan shape: both windows (running max-end, island counter) and the
  * final group-by share ONE partitioning on the key, so Catalyst plans
  * a single exchange + one sort for the whole operator. Per-key data is
  * the unit of work — the classic scale contract for keyed timelines.
  */
object Intervals {

  /** Merge overlapping/adjacent `[startCol, endCol]` spans (long
    * microseconds or any comparable numeric) per `keys`. Returns one
    * row per island: keys, `merged_start`, `merged_end`, `n_spans`.
    */
  def mergeOverlapping(df: DataFrame, keys: Seq[String],
                       startCol: String, endCol: String): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    val before = byKey.rowsBetween(Window.unboundedPreceding, -1)
    val upToHere = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("__pmax", max(col(endCol)).over(before))
      .withColumn("__brk",
        when(col("__pmax").isNull || col(startCol) > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__brk")).over(upToHere))
      .groupBy((keys.map(col) :+ col("__island")): _*)
      .agg(min(col(startCol)).as("merged_start"),
        max(col(endCol)).as("merged_end"),
        count(lit(1)).as("n_spans"))
      .drop("__island")
  }
}
