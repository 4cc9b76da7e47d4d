package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — an operator Spark lacks natively:
  * for every left row, the single newest right row with
  * `rightTs <= leftTs` on the same key (classic CDC/time-series
  * enrichment: "the account state in effect when this event
  * happened").
  *
  * Built by composition (SURVEY §7.3 preference (a)): union the two
  * tagged sides, then one `last(_, ignoreNulls)` carry-forward window
  * per key ordered by (ts, side). That is ONE shuffle on the key and a
  * per-partition sort — no range-condition join, which Catalyst would
  * plan as a broadcast-nested-loop (quadratic) — so it scales to
  * 100 TB exactly like any other keyed window.
  */
object AsOfJoin {

  /** @param rightPrefix   prefix applied to right-side payload columns
    *                      in the output (collision-proofing).
    * @param rightTiebreak right-side payload columns used to order
    *                      right rows that tie on (keys, ts) — the
    *                      greatest tiebreak value wins. Without it,
    *                      which tied right row is carried forward
    *                      depends on physical row order.
    * @param direction     "backward" (default): newest right with
    *                      `rightTs <= leftTs`; "forward": earliest
    *                      right with `rightTs >= leftTs` — the same
    *                      one-window plan traversed in reverse time
    *                      order.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightPrefix: String = "right_",
           rightTiebreak: Seq[String] = Nil,
           direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val rightStruct = StructType(rightPayload.map(c => right.schema(c)))

    // a NULL right timestamp has no place on the timeline: backward's
    // ascending order would sort it FIRST (nulls first) and carry it
    // into every left row preceding the first real right row, while
    // forward's descending order makes it inert — drop on both paths
    // so the directions agree
    val rightClean = right.filter(col(rightTs).isNotNull)
    val taggedRight = rightClean.select(
      (keys.map(col) :+ col(rightTs).as("__t") :+ lit(0).as("__side") :+
        struct(rightPayload.map(col): _*).as("__r") :+
        lit(null).cast(StructType(left.schema.fields)).as("__l")): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTs).as("__t") :+ lit(1).as("__side") :+
        lit(null).cast(rightStruct).as("__r") :+
        struct(left.columns.map(col): _*).as("__l")): _*)

    // right (side 0) sorts before left (side 1) at equal ts, so a right
    // row at exactly leftTs is visible — `>=` backward, `<=` forward
    // (forward simply traverses time in reverse). Tied right rows order
    // by the caller's tiebreak (nulls first, so left rows — whose __r
    // is null — never outrank a real right row).
    val tiebreak = rightTiebreak.map(c => col(s"__r.$c").asc_nulls_first)
    val tOrd = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tOrd +: col("__side").asc +: tiebreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftCols = left.columns.toSeq.map(c => col(s"__l.$c").as(c))
    val rightCols = rightPayload.map(c => col(s"__asof.$c").as(s"$rightPrefix$c"))
    carried.select(leftCols ++ rightCols: _*)
  }
}
