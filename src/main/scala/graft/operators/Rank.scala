package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed exact ranking primitives. The built-in `ntile`/"global
  * row_number" window with no PARTITION BY moves the whole relation to
  * ONE task — the canonical scale cliff. These compute the identical
  * answers through [[Corpus.globalIds]]' range-partition + offset
  * machinery: every task handles one range slice, driver state is one
  * count per partition.
  */
object Rank {

  /** Exact SQL `NTILE(n) OVER (ORDER BY orderCols)` without a
    * single-partition window. `orderCols` lexicographic must be a
    * UNIQUE total order (append a key column as tiebreaker) — that is
    * also what makes plain SQL NTILE deterministic, so the oracle
    * carries the same tiebreaker.
    *
    * Bucket algebra (matches the SQL spec): with t rows and n buckets,
    * q = t div n, m = t mod n — the first m buckets take q+1 rows, the
    * rest q; a 0-based global rank r maps to
    * `r < m(q+1) ? r/(q+1)+1 : m+(r−m(q+1))/q+1`.
    */
  def ntileExact(df: DataFrame, orderCols: Seq[String], n: Int,
                 outCol: String, nParts: Int = 32): DataFrame = {
    require(n >= 1, "ntile bucket count must be >= 1")
    val ranked = Corpus.globalIds(df, orderCols, nParts)
    val t = ranked.count() // one long to the driver
    val q = t / n
    val m = t % n
    val big = m * (q + 1)
    val bucket =
      if (q == 0) col("global_id") + 1 // fewer rows than buckets
      else when(col("global_id") < big,
        floor(col("global_id") / (q + 1)) + 1)
        .otherwise(lit(m) + floor((col("global_id") - big) / q) + 1)
    ranked.withColumn(outCol, bucket.cast("long")).drop("global_id")
  }
}
