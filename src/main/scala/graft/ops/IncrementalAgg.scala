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

  /** @param prevAgg     previous aggregate: (groupCols..., sum_val: decimal, n: long)
    * @param prevState   current base rows (payload incl. orderColumns and groupCols)
    * @param batch       CDC events: payload + `__op` (+ orderColumns, groupCols)
    * @param primaryKeys base-table key
    * @param orderColumns LWW ordering within (prevState ∪ batch)
    * @param groupCols   aggregation grouping columns
    * @param valueCol    summed column
    * @return            (groupCols..., sum_val, n) — empty groups dropped
    */
  def maintain(prevAgg: DataFrame, prevState: DataFrame, batch: DataFrame,
               primaryKeys: Seq[String], orderColumns: Seq[String],
               groupCols: Seq[String], valueCol: String): DataFrame = {
    val touched = batch.select(primaryKeys.map(col): _*).distinct()

    // old contributions: the current rows of keys the batch touches
    val oldRows = prevState.join(touched, primaryKeys, "left_semi")

    // new rows for those keys: fold (their current row as a snapshot
    // read) ∪ (the batch) — LWW picks the survivor; deletes drop out
    val asEvents = oldRows
      .withColumn(CdcOps.OpColumn, lit(OpCode.Read))
      .withColumn(CdcOps.DeletedColumn, lit("false"))
    val newRows = CdcOps.foldMerge(
      asEvents.unionByName(batch, allowMissingColumns = true),
      primaryKeys, orderColumns)

    def contrib(df: DataFrame, sign: Int): DataFrame =
      df.groupBy(groupCols.map(col): _*)
        .agg((sum(col(valueCol).cast("decimal(12,2)")) * sign).as("d_sum"),
          (count(lit(1)) * sign).as("d_n"))

    val delta = contrib(oldRows, -1).unionByName(contrib(newRows, 1))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("d_sum")).as("d_sum"), sum(col("d_n")).as("d_n"))

    prevAgg.join(delta, groupCols.toSeq, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        (coalesce(col("sum_val"), lit(0)) + coalesce(col("d_sum"), lit(0)))
          .as("sum_val"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n")): _*)
      .filter(col("n") > 0)
  }

  /** From-scratch aggregate with the same shape as [[maintain]]'s
    * output — bootstrap and recompute-audit path.
    */
  def recompute(state: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    state.groupBy(groupCols.map(col): _*)
      .agg(sum(col(valueCol).cast("decimal(12,2)")).as("sum_val"),
        count(lit(1)).as("n"))
}
