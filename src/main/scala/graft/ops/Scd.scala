package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension views over a CDC change log.
  *
  * The reference pipeline materializes only the *latest* state of each
  * key (`history_data_handler.py:124-151`: anti-join + union). These
  * operators derive the two other canonical consumption shapes of the
  * same log — the full Type-2 version history and the state as of an
  * arbitrary past instant — without any new infrastructure: both are
  * single-shuffle plans over the already-parsed event stream.
  *
  * Scale notes: each operator shuffles ONCE on the primary key (the
  * window / aggregate partitioning); there is no self-join, no driver
  * collection, and no per-version growth beyond the event count itself,
  * so the plans hold at 100 TB exactly like the LWW merge does.
  */
object Scd {

  /** Build a Type-2 history: one row per surviving change event, with
    * `[valid_from, valid_to)` validity and `is_current`.
    *
    * Semantics: every upsert event (op ∈ c/r/u) opens a version at its
    * timestamp; the next event of the SAME key (any op, deletes
    * included) closes it. Delete events close the previous version but
    * emit no version row themselves, so a deleted key has only closed
    * versions and `is_current = false` everywhere — the tombstone
    * behavior of the reference merge (`daily_data_handler.py:88-95`)
    * replayed over time instead of collapsed.
    *
    * One window over (key, orderColumns asc) computes the closing edge
    * (`lead`) and the version ordinal in the same exchange+sort; the
    * delete filter happens AFTER the lead so tombstones still close
    * their predecessors.
    */
  def scd2(events: DataFrame, primaryKeys: Seq[String],
           orderColumns: Seq[String] = Seq("timestamp")): DataFrame = {
    val w = Window
      .partitionBy(primaryKeys.map(col): _*)
      .orderBy(orderColumns.map(col(_).asc): _*)
    val ts = col(orderColumns.head)
    events
      .withColumn("valid_to", lead(ts, 1).over(w))
      .filter(col(CdcOps.OpColumn) =!= graft.model.OpCode.Delete)
      .withColumn("valid_from", ts)
      .withColumn("is_current", col("valid_to").isNull)
      .drop(CdcOps.metaColumns: _*)
  }

  /** Reconstruct the table state as of `asOf` (inclusive): replay the
    * log up to the instant, keep the last writer per key, drop keys
    * whose last event is a delete.
    *
    * The time filter is a plain predicate on the scan — at 100 TB it
    * prunes date partitions before anything shuffles — and the replay
    * itself is the one-pass `max_by` aggregate of
    * [[CdcOps.lastWriterWinsAgg]] (map-side partial agg, no sort), so
    * snapshot cost is bounded by the surviving event volume, not the
    * full history.
    */
  def snapshotAt(events: DataFrame, primaryKeys: Seq[String], asOf: Column,
                 orderColumns: Seq[String] = Seq("timestamp")): DataFrame = {
    val upTo = events.filter(col(orderColumns.head) <= asOf)
    CdcOps.lastWriterWinsAgg(upTo, primaryKeys, orderColumns)
      .filter(col(CdcOps.OpColumn) =!= graft.model.OpCode.Delete)
      .drop(CdcOps.metaColumns: _*)
  }
}
