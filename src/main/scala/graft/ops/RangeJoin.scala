package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Range join (equi keys AND `lo <= point <= hi`) planned as a pure
  * equi-join — an operator Spark lacks natively: Catalyst plans a bare
  * range predicate as a broadcast-nested-loop join, which is quadratic
  * and falls over long before 100 TB.
  *
  * The scale path: pick a bucket width, explode each interval into the
  * fixed-width buckets it covers, give each point its single bucket,
  * hash-join on (keys, bucket), then apply the exact range predicate.
  * Cost is `points + intervals × (span/bucketWidth + 1)` rows through
  * one shuffle hash join — linear, AQE-skew-splittable, and each
  * (point, interval) pair meets in exactly one bucket so no dedup pass
  * is needed.
  */
object RangeJoin {

  /** @param pointCol    numeric column on `points` (cast timestamps to
    *                    epoch micros first)
    * @param loCol/hiCol inclusive interval bounds on `intervals`
    * @param bucketWidth bucket size in `pointCol` units; choose ≈ the
    *                    typical interval span so intervals explode into
    *                    ~2 buckets
    * @param keys        extra equi-join columns present on both sides
    */
  /** floor(c / w) that stays exact for integral columns: `c / w` on
    * longs promotes to double, whose 53-bit mantissa misplaces boundary
    * values above 2^53 (epoch nanos are ~2^60) into the adjacent
    * bucket — a silently dropped match. Integral types use exact long
    * arithmetic; fractional types keep floating floor (their values are
    * doubles to begin with).
    */
  private def bucketOf(df: DataFrame, c: String, w: Long): Column =
    df.schema(c).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        expr(s"(`$c` - pmod(`$c`, ${w}L)) div ${w}L")
      case _ => floor(col(c) / lit(w)).cast("long")
    }

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pts = points.withColumn("__bucket", bucketOf(points, pointCol, bucketWidth))
    val ivs = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(intervals, loCol, bucketWidth),
        bucketOf(intervals, hiCol, bucketWidth))))
    pts.join(ivs, (keys :+ "__bucket").toSeq, "inner")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
