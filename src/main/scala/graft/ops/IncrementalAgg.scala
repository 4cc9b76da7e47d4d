package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.OpCode

/** Incremental maintenance of per-group aggregates under CDC — the
  * materialized-view capability the reference's full-rescan merges
  * can't offer: after a change batch, the new aggregate is
  *
  *   newAgg = prevAgg ⊖ contributions(replaced rows) ⊕ contributions(new rows)
  *
  * so the work is proportional to the *changed key set*, never the
  * 100 TB base table. Valid for algebraic aggregates (sum/count here;
  * avg = sum/n downstream). Exact decimal arithmetic keeps the
  * maintained aggregate bit-identical to a from-scratch recompute.
  */
object IncrementalAgg {

  /** @param prevAgg     previous aggregate from [[recompute]] (or a
    *                    prior [[maintain]]): (groupCols..., sum_val,
    *                    n, n_nonnull)
    * @param prevState   current base rows (payload incl. orderColumns and groupCols)
    * @param batch       CDC events: payload + `__op` (+ orderColumns, groupCols)
    * @param primaryKeys base-table key
    * @param orderColumns LWW ordering within (prevState ∪ batch)
    * @param groupCols   aggregation grouping columns (NULL group keys
    *                    supported — matched null-safely)
    * @param valueCol    summed column (a group with no non-null values
    *                    has sum_val NULL, like SQL SUM)
    * @param prevTombstones deleted keys as (primaryKeys ++ orderColumns)
    *                    rows. Without them, a batch event OLDER than a
    *                    prior delete would resurrect the key (the state
    *                    alone has no memory of the delete); pass the
    *                    delete log when late arrivals are possible.
    * @return            (groupCols..., sum_val, n, n_nonnull) — empty
    *                    groups dropped
    */
  def maintain(prevAgg: DataFrame, prevState: DataFrame, batch: DataFrame,
               primaryKeys: Seq[String], orderColumns: Seq[String],
               groupCols: Seq[String], valueCol: String,
               prevTombstones: Option[DataFrame] = None): DataFrame = {
    val touched = batch.select(primaryKeys.map(col): _*).distinct()

    // old contributions: the current rows of keys the batch touches
    val oldRows = prevState.join(touched, primaryKeys, "left_semi")

    // new rows for those keys: fold (current row as a snapshot read)
    // ∪ (prior delete tombstones) ∪ (the batch) — LWW picks the
    // survivor; deletes drop out
    val asEvents = oldRows
      .withColumn(CdcOps.OpColumn, lit(OpCode.Read))
      .withColumn(CdcOps.DeletedColumn, lit("false"))
    val tombEvents = prevTombstones.map {
      _.join(touched, primaryKeys, "left_semi")
        .withColumn(CdcOps.OpColumn, lit(OpCode.Delete))
        .withColumn(CdcOps.DeletedColumn, lit("true"))
    }
    val folded = tombEvents.foldLeft(asEvents)(
      (a, t) => a.unionByName(t, allowMissingColumns = true))
    val newRows = CdcOps.foldMerge(
      folded.unionByName(batch, allowMissingColumns = true),
      primaryKeys, orderColumns)

    def contrib(df: DataFrame, sign: Int): DataFrame =
      df.groupBy(groupCols.map(col): _*)
        .agg((sum(col(valueCol).cast("decimal(12,2)")) * sign).as("d_sum"),
          (count(lit(1)) * sign).as("d_n"),
          (count(col(valueCol)) * sign).as("d_nn"))

    val delta = contrib(oldRows, -1).unionByName(contrib(newRows, 1))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("d_sum")).as("d_sum"), sum(col("d_n")).as("d_n"),
        sum(col("d_nn")).as("d_nn"))

    // null-safe group match (a NULL group key is a real group)
    val p = prevAgg.as("p"); val d = delta.as("d")
    val cond = groupCols.map(c => col(s"p.$c") <=> col(s"d.$c")).reduce(_ && _)
    val n = coalesce(col("p.n"), lit(0L)) + coalesce(col("d.d_n"), lit(0L))
    val nn = coalesce(col("p.n_nonnull"), lit(0L)) + coalesce(col("d.d_nn"), lit(0L))
    p.join(d, cond, "full_outer")
      .select(groupCols.map(c => coalesce(col(s"p.$c"), col(s"d.$c")).as(c)) ++ Seq(
        when(nn === 0, lit(null)) // SUM over zero non-null values is NULL
          .otherwise(coalesce(col("p.sum_val"), lit(0)) + coalesce(col("d.d_sum"), lit(0)))
          .as("sum_val"),
        n.as("n"), nn.as("n_nonnull")): _*)
      .filter(col("n") > 0)
  }

  /** From-scratch aggregate with the same shape as [[maintain]]'s
    * output — bootstrap and recompute-audit path.
    */
  def recompute(state: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    state.groupBy(groupCols.map(col): _*)
      .agg(sum(col(valueCol).cast("decimal(12,2)")).as("sum_val"),
        count(lit(1)).as("n"),
        count(col(valueCol)).as("n_nonnull"))
}
