package graft.jobs

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.TableSpec
import graft.ops.CdcOps
import graft.sources.Lake

/** The three pipeline stages, re-expressed Spark-first. Each is a thin
  * orchestration shell over the pure operators in [[CdcOps]] — the
  * orchestration (Airflow in the reference, `airflow_dags/
  * cdc_ingestion_dag.py:20-66`) stays external.
  */
object Jobs {

  /** Raw ingest (`pipelines/raw_data_handler.py`): stream →
    * cast-projection → date partitions → partitioned append, one
    * micro-batch per run.
    *
    * `Trigger.AvailableNow` is the modern `trigger(once=True)`
    * (S4): it drains everything available, checkpointed, possibly in
    * several rate-limited batches — exactly-once via the offset ledger
    * in `checkpointLocation`.
    */
  def rawIngest(raw: DataFrame, spec: TableSpec): Unit = {
    val q = raw.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", spec.checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cast = CdcOps.castEnvelope(batch)
        Lake.appendPartitioned(CdcOps.withDatePartitions(cast), spec.dataDir, spec.format)
      }
      .start()
    q.awaitTermination()
  }

  /** One day's parsed, sanitized change events (S6, S7, P2-P4). Returns
    * None when the day's partition is empty (the "no new data" case the
    * reference detects by catching AnalysisException on the missing
    * path, `daily_data_handler.py:39-41` — with partition-pruned reads
    * an empty day is just an empty frame, no exception control flow).
    */
  def readDayEvents(spark: SparkSession, spec: TableSpec, ds: LocalDate,
                    lowerNames: Boolean = false): Option[DataFrame] = {
    // a raw root that doesn't exist yet (merge scheduled before the
    // first ingest trigger) is "no new data", not an error — the one
    // missing-path case the reference's blanket except covered
    if (!Lake.pathExists(spark, spec.dataDir)) None
    else {
      val day = Lake.readDay(spark, spec.dataDir, ds.getYear,
        ds.getMonthValue, ds.getDayOfMonth, spec.format)
        .drop(Lake.partitionColumns: _*)
      if (day.isEmpty) None
      else Some(parseRaw(day, lowerNames))
    }
  }

  /** Parse a raw `(timestamp, value)` frame: resolve the payload schema
    * via the provider (per-batch inference by default — the reference's
    * deliberate schema-drift tolerance, S7; declared mode skips the
    * inference pass entirely), parse, flatten, sanitize names.
    */
  def parseRaw(raw: DataFrame, lowerNames: Boolean = false,
               schemaProvider: graft.schema.SchemaProvider =
                 graft.schema.SchemaProvider.Inferred): DataFrame = {
    val schema = schemaProvider.schemaFor(raw)
    val parsed = CdcOps.parseEnvelope(raw, schema)
    CdcOps.sanitizeColumnNames(parsed, lower = lowerNames)
  }

  /** Daily merge (`pipelines/daily_data_handler.py`): merge one day of
    * events into `<table>_daily`.
    */
  def dailyMerge(spark: SparkSession, spec: TableSpec, ds: LocalDate): Unit =
    readDayEvents(spark, spec, ds).foreach { events =>
      mergeInto(spark, spec, spec.dailyTable, events)
    }

  /** History merge (`pipelines/history_data_handler.py`): merge ds−1
    * into `<table>_history` (the reference's off-by-one contract with
    * the Airflow hour-0 branch, `history_data_handler.py:65`), falling
    * back to a full-raw backfill when the history table doesn't exist
    * yet (`:77-81`). Merge mode then truncates the daily staging table
    * (`:211-214`); increment mode appends deduped rows.
    */
  def historyMerge(spark: SparkSession, spec: TableSpec, ds: LocalDate): Unit = {
    val lowered = true // history lowercases names (history_data_handler.py:95)
    spec.mode match {
      case "increment" =>
        readDayEvents(spark, spec, ds.minusDays(1), lowered).foreach { events =>
          Lake.appendTable(
            CdcOps.withDatePartitions(CdcOps.incrementBatch(events)),
            spec.historyTable, Lake.partitionColumns, spec.format)
        }
      case _ =>
        val wrote =
          if (Lake.tableExists(spark, spec.historyTable))
            readDayEvents(spark, spec, ds.minusDays(1), lowered).map { ev =>
              mergeInto(spark, spec, spec.historyTable, ev.distinct())
            }.isDefined
          else {
            // Backfill: the whole raw log arrives as ONE batch, where the
            // reference's merge would keep every historical insert row for
            // a key alongside its latest update (inserts are only
            // tombstoned across batches, `daily_data_handler.py:88-101`).
            // A from-scratch rebuild has cleaner correct semantics: the
            // LWW fold of the full event log. Deliberate divergence.
            if (!Lake.pathExists(spark, spec.dataDir)) false
            else {
              val all = Lake.readAll(spark, spec.dataDir, spec.format)
                .drop(Lake.partitionColumns: _*)
              if (all.isEmpty) false
              else {
                val folded = CdcOps.foldMerge(
                  parseRaw(all, lowered).distinct(), spec.primaryKeys, spec.orderColumns)
                Lake.overwriteTableSafely(folded, spec.historyTable, format = spec.format)
                true
              }
            }
          }
        if (wrote && Lake.tableExists(spark, spec.dailyTable))
          Lake.truncateTable(spark, spec.dailyTable)
    }
  }

  /** Shared merge core (`_overwrite_daily_table`,
    * `daily_data_handler.py:75-104`): route ops, LWW-dedup updates,
    * anti-join out tombstoned keys, union, overwrite.
    */
  private def mergeInto(spark: SparkSession, spec: TableSpec,
                        table: String, events: DataFrame): Unit = {
    // Cache HERE, above any caller-side distinct(), so the routed
    // counts below and the merge itself all read one materialization
    // (a cache below the distinct would re-run the distinct shuffle
    // per action); released once the merge has written.
    val ev = events.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val routed = CdcOps.routeOps(ev, spec.primaryKeys)
      val existing =
        if (Lake.tableExists(spark, table)) spark.table(table)
        else CdcOps.emptyLike(routed.inserts)
      // Tombstones past the broadcast budget switch the merge to the
      // bloom-pruned anti-join (no full-table exchange of `existing`).
      // |updates| + |deletes| upper-bounds the tombstone count; one
      // cache-backed scan computes both counts.
      val limit = spark.conf.getOption("graft.cdc.tombstoneBroadcastLimit")
        .map(_.toLong).getOrElse(1L << 22)
      val beyond = routed.updates.select(lit(1L).as("__one"))
        .unionByName(routed.deleteKeys.select(lit(1L).as("__one")))
        .count() > limit
      val merged = CdcOps.mergeBatch(existing, routed, spec.primaryKeys,
        spec.orderColumns, tombstonesBeyondBroadcast = beyond)
      Lake.overwriteTableSafely(merged, table, format = spec.format)
    } finally ev.unpersist(blocking = false)
  }
}
