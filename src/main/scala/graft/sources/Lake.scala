package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-layer IO: partitioned file writes, catalog tables, safe
  * overwrite. Covers SURVEY §2.1 S5, S6, S8, S9, S10.
  */
object Lake {

  val partitionColumns: Seq[String] = Seq("op_year", "op_month", "op_day")

  /** S5 — date-partitioned append write of the raw layer
    * (`raw_data_handler.py:77-87`). Parquet by default (ORC in the
    * reference; both columnar — `format` switches).
    */
  def appendPartitioned(df: DataFrame, dir: String, format: String = "parquet"): Unit =
    df.write
      .partitionBy(partitionColumns: _*)
      .mode(SaveMode.Append)
      .format(format)
      .save(dir)

  /** Clustered write: range-partition on the cluster keys, sort within
    * partitions, then write. Files then carry tight min/max ranges on
    * the keys, so later scans with key predicates prune at the
    * row-group level (parquet statistics) on top of directory-level
    * partition pruning — the difference between touching 100 TB and
    * touching one key's worth of files. `nFiles` bounds output file
    * count (small-files control, the scalable form of the reference's
    * `coalesce(1)` at `history_data_handler.py:149`).
    */
  def writeClustered(df: DataFrame, dir: String, clusterCols: Seq[String],
                     nFiles: Int, format: String = "parquet"): Unit =
    df.repartitionByRange(nFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(SaveMode.Append).format(format).save(dir)

  /** Small-files compaction — the maintenance pass every streaming
    * ingest lake needs: micro-batch appends leave one (or more) file
    * per trigger per partition, and a year of hourly triggers makes
    * scans metadata-bound long before they are IO-bound. Rewrites a
    * directory to ≈`targetBytes` files based on its CURRENT on-disk
    * size (cheap Hadoop listing — no data read for sizing), preserving
    * rows exactly.
    *
    * Scale shape: one read + one `coalesce` write. `coalesce` (not
    * `repartition`) so the rewrite is shuffle-free — output tasks read
    * whole input files; at 100 TB you compact per partition directory,
    * bounding each rewrite to one day's data. The rewrite is staged
    * (tmp dir + atomic-ish rename) so a concurrent reader never sees a
    * half-compacted directory.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
              format: String = "parquet"): Int = {
    require(targetBytes > 0)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compact-tmp")
    val old = new org.apache.hadoop.fs.Path(dir + ".compact-old")
    spark.read.format(format).load(dir)
      .coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).format(format).save(tmp.toString)
    stagedSwap(fs, path, tmp, old)
    nFiles
  }

  /** The checked staged-directory swap shared by [[compact]] and
    * [[graft.streaming.StreamingUpsert.compactLog]]: back the live
    * `path` up to `old`, move `tmp` in, clean up — with every Hadoop
    * rename CHECKED (they signal failure by RETURNING FALSE, not
    * throwing; unchecked, stale `old` debris silently no-ops the swap,
    * and a failure between the renames deletes the only copy).
    *
    * Honest limits, by design: (a) there is an instant between the two
    * renames where `path` does not exist — a concurrent reader can hit
    * PATH_NOT_FOUND and must retry; (b) rows appended to `path` after
    * the rewrite's snapshot read are swept into `old` and deleted.
    * Without a transaction log a plain directory cannot do better, so
    * run compaction only on CLOSED partitions (past days) or in a
    * maintenance window — [[compact]]'s per-day usage satisfies this.
    */
  private[graft] def stagedSwap(fs: org.apache.hadoop.fs.FileSystem,
                                path: org.apache.hadoop.fs.Path,
                                tmp: org.apache.hadoop.fs.Path,
                                old: org.apache.hadoop.fs.Path): Unit = {
    if (fs.exists(old)) // debris from a crashed prior run; path is live
      require(fs.delete(old, true), s"cannot clear stale $old")
    require(fs.rename(path, old), s"stagedSwap: rename $path -> $old failed")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // roll back so readers still see the data
      throw new IllegalStateException(
        s"stagedSwap: rename $tmp -> $path failed; rolled back")
    }
    require(fs.delete(old, true), s"stagedSwap: cleanup of $old failed")
  }

  /** Z-order (Morton) curve value of two non-negative integer keys:
    * interleave the low `bits` bits of each (x in even positions, y in
    * odd). Pure integer expression — identical in any engine — so a
    * z-clustered layout is reproducible and oracle-checkable.
    */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
             bits: Int = 16): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      val xb = shiftrightunsigned(x.cast("long"), i).bitwiseAND(lit(1L))
      val yb = shiftrightunsigned(y.cast("long"), i).bitwiseAND(lit(1L))
      shiftleft(xb, 2 * i) + shiftleft(yb, 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Z-order clustered write: [[writeClustered]] on the Morton value of
    * two keys instead of a single-key range. A lexicographic sort on
    * (a, b) gives tight file min/max on `a` but near-full-range spans on
    * `b`; the space-filling curve keeps BOTH columns' per-file ranges
    * tight, so predicates on either key (or both) prune at the
    * row-group level. This is the standard multi-dimensional data-
    * skipping layout (Delta/Iceberg `OPTIMIZE ZORDER BY`) expressed as
    * plain Spark: project z → range-partition on z → sort within → write.
    */
  def writeZOrdered(df: DataFrame, dir: String, colA: String, colB: String,
                    nFiles: Int, bits: Int = 16, format: String = "parquet"): Unit =
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Append).format(format).save(dir)

  /** S6 — read one day of the raw layer. The reference constructs the
    * partition path by hand (`daily_data_handler.py:51-58`); here the
    * table root is read and Catalyst partition-prunes the filter — the
    * plan's scan shows `PartitionFilters`, no full listing of other
    * days' files — which also keeps partition columns in the result and
    * composes with predicate pushdown.
    */
  /** Does the data directory exist yet? First deployments run the merge
    * schedule before the first ingest trigger ever creates the raw
    * root — readers use this to treat "no directory" as "no data"
    * (the case the reference's blanket AnalysisException catch covered,
    * `daily_data_handler.py:39-41`, without swallowing real errors).
    */
  def pathExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def readDay(spark: SparkSession, dir: String, year: Int, month: Int, day: Int,
              format: String = "parquet"): DataFrame =
    spark.read.format(format).load(dir)
      .where(col("op_year") === year && col("op_month") === month && col("op_day") === day)

  /** Full-history read (backfill path, `history_data_handler.py:77-81`). */
  def readAll(spark: SparkSession, dir: String, format: String = "parquet"): DataFrame =
    spark.read.format(format).load(dir)

  /** S9/S10 — catalog helpers (public Scala APIs; the reference needed a
    * private `_jsparkSession` bridge only because of its PySpark
    * version, `daily_data_handler.py:160-162`).
    */
  def tableExists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  def refreshTable(spark: SparkSession, table: String): Unit =
    spark.catalog.refreshTable(table)

  def truncateTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"TRUNCATE TABLE $table")

  /** S8 — safe overwrite of a catalog table whose current contents feed
    * the new plan. The reference works around Spark's cannot-overwrite-
    * what-you-read restriction with a two-phase tmp-table dance
    * (`daily_data_handler.py:125-155`: write tmp → refresh → read back →
    * overwrite real → TRUNCATE tmp) — non-atomic across three jobs.
    * `localCheckpoint` cuts the lineage instead: one materialization,
    * then a plain overwrite, no tmp table, no legacy conf.
    */
  def overwriteTableSafely(df: DataFrame, table: String,
                           partitionBy: Seq[String] = Nil,
                           format: String = "parquet"): Unit = {
    val materialized = df.localCheckpoint(eager = true)
    val w = materialized.write.mode(SaveMode.Overwrite).format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .saveAsTable(table)
  }

  /** S8 — plain append `saveAsTable` (increment mode,
    * `history_data_handler.py:146-155`). AQE coalesces output
    * partitions, replacing the reference's `coalesce(1)` single-writer
    * small-files control without sacrificing parallelism.
    */
  def appendTable(df: DataFrame, table: String,
                  partitionBy: Seq[String] = Nil,
                  format: String = "parquet"): Unit = {
    val w = df.write.mode(SaveMode.Append).format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .saveAsTable(table)
  }
}
