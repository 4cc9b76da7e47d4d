package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a key column — the mergeable-sketch form of
  * heavy-hitter detection (Cormode & Muthukrishnan 2005), the
  * frequency analysis a training-data pipeline runs to spot dominated
  * sources/users/domains without an exact per-key count shuffle.
  *
  * The sketch is materialized as its own relation: `(j, bucket, cnt)`
  * with `j < depth`, `bucket < width` — at most `depth × width` rows
  * REGARDLESS of input size or key cardinality. Building it is one
  * pass over the input exploded to `depth` rows each, aggregated with
  * map-side combine into ≤ depth×width groups — so the shuffle moves
  * ≤ depth×width×partitions partial rows at 100 TB, not the key set,
  * and two sketches built on disjoint data merge by adding counts
  * (the property that makes CMS work across days/shards). Estimation
  * for a probe key is `min_j sketch[j][h_j(key)]` — always ≥ the true
  * count, with overcount bounded by collisions (≤ e·N/width w.h.p.).
  *
  * Hashes are md5-derived (`h_j(x) = int(md5(j ‖ ":" ‖ x)[0,8)) mod
  * width`) so the exact same sketch is reproducible in any engine —
  * the DuckDB oracle rebuilds it bucket for bucket.
  */
object Sketch {

  /** h_j(key): first 8 md5 hex chars of "j:key" as a 32-bit int, mod
    * width. Engine-portable (md5 + string concat only).
    */
  private def bucketOf(j: Int, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat_ws(":", lit(j).cast("string"),
      key.cast("string"))), 1, 8), 16, 10).cast("long"), lit(width.toLong))

  /** Build the CMS relation `(j, bucket, cnt)` for `keyCol`, one count
    * per input row. ≤ depth×width rows.
    */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1)
    // NULL keys are excluded, matching the oracle: DuckDB's `||` concat
    // propagates NULL into a NULL bucket while Spark's concat_ws would
    // silently hash the bare "j" prefix — drop them on both sides.
    df.filter(col(keyCol).isNotNull)
      .select(posexplode(array((0 until depth).map(j =>
        bucketOf(j, col(keyCol), width)): _*)).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Heavy hitters with sketch-estimated counts: the `topN` keys by
    * EXACT count (count desc, key asc — deterministic), each carrying
    * the CMS estimate and its overcount. The exact count rides along
    * as the verification column (at 100 TB you would drop it and keep
    * only the sketch estimate; here it doubles as the oracle anchor
    * proving `est ≥ exact` row by row).
    *
    * Scale shape: one exploded pass builds the bounded sketch; the
    * exact top-N is a keyed agg + distributed TakeOrdered (N rows to
    * the driver-side limit, never the key set); estimation joins the
    * N probe keys against the broadcast ≤ depth×width sketch.
    */
  def cmsHeavyHitters(df: DataFrame, keyCol: String,
                      depth: Int = 4, width: Int = 64,
                      topN: Int = 20): DataFrame = {
    val sketch = cmsBuild(df, keyCol, depth, width)
    val top = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col(keyCol))
      .limit(topN)
    val probes = top.select(col(keyCol), col("exact_cnt"),
      posexplode(array((0 until depth).map(j =>
        bucketOf(j, col(keyCol), width)): _*)).as(Seq("j", "bucket")))
    probes.join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy(col(keyCol), col("exact_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
      .select(col(keyCol), col("exact_cnt"), col("est_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("overcount"))
  }
}
