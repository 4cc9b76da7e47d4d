package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed exact ranking primitives. The built-in `ntile`/"global
  * row_number" window with no PARTITION BY moves the whole relation to
  * ONE task — the canonical scale cliff. These compute the identical
  * answers through [[Corpus.globalIds]]' range-partition + offset
  * machinery: every task handles one range slice, driver state is one
  * count per partition.
  */
object Rank {

  /** Shared cache hygiene: pin the (small) final projection, release
    * the intermediate persists — one implementation, [[Eval]]'s.
    */
  private def pinAndRelease(out: DataFrame,
                            intermediates: DataFrame*): DataFrame =
    Eval.pinAndRelease(out, intermediates: _*)

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
    // counting RANKED (not df) doubles as the cache materializer for
    // globalIds' pinned range partition — see the persist note there
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

  /** Exact per-group percentiles WITHOUT a per-group single-partition
    * window — the scale-safe exact counterpart to the interpolated
    * `percentile()` (whose per-group buffer is the documented cliff in
    * `q_percentiles`) and the GK-sketch `q_percentiles_approx`.
    * Definition: discrete (lower) percentile — the smallest value whose
    * inclusive cumulative count reaches `⌈p·n_group⌉`.
    *
    * Scale shape: collapse to (group, value, count) map-side, range
    * partition by (group, value), per-slice running counts plus a
    * broadcast exclusive prefix over the ≤ nParts×groups per-(slice,
    * group) totals — a single group LARGER THAN A PARTITION still
    * computes through slice-local sums, nothing ever buffers a whole
    * group. One `min(when(cum ≥ target, v))` aggregate per requested
    * percentile finishes it.
    */
  /** The slice-offset cumulative machinery shared by
    * [[exactPercentiles]] and [[quantileRank]]: `g` is one row per
    * (group, value) with count `c`; returns that relation extended with
    * `cum` (inclusive cumulative count within the group, value order)
    * and `__n` (group total), plus the internally pinned
    * range-partitioned frame. The pin is a CORRECTNESS device
    * (repartitionByRange samples bounds — both branches must see the
    * same materialization, see [[Corpus.globalIds]]); callers that
    * reduce to a small projection release it via [[pinAndRelease]],
    * callers whose output is corpus-sized must keep it.
    */
  private def cumCountsByValue(g: DataFrame, gCol: String, vCol: String,
                               nParts: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val parted = g.repartitionByRange(nParts, col(gCol), col(vCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ≤ nParts × groups rows: small relation, windows here are the point
    val pidTotals = parted.groupBy(col("__pid"), col(gCol))
      .agg(sum(col("c")).as("__t"))
    val offs = pidTotals
      .withColumn("__off", coalesce(sum(col("__t")).over(
        Window.partitionBy(col(gCol)).orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col(gCol), col("__off"))
    val totals = pidTotals.groupBy(col(gCol)).agg(sum(col("__t")).as("__n"))
    val localW = Window.partitionBy(col("__pid"), col(gCol)).orderBy(col(vCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = parted
      .withColumn("__loc", sum(col("c")).over(localW))
      .join(broadcast(offs), Seq("__pid", gCol))
      .withColumn("cum", col("__loc") + col("__off"))
      .join(broadcast(totals), gCol)
    (cum, parted)
  }

  def exactPercentiles(df: DataFrame, group: Column, value: Column,
                       ps: Seq[(String, Double)],
                       nParts: Int = 32): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    val g = df.select(group.as("g"), value.as("v")).na.drop(Seq("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    percentilesFromCounts(g, ps, nParts)
  }

  /** Exact WEIGHTED percentiles per group — the revenue-weighted
    * latency / unit-weighted price readout: the weighted p-quantile is
    * the smallest v whose cumulative weight ≥ ⌈p·W⌉ (lower weighted
    * quantile — no interpolation, so integral weights keep the rank
    * arithmetic exact and engine-portable). Same range-partition
    * machinery as [[exactPercentiles]]: the per-value reduction just
    * sums the weight instead of counting rows, so the plan shape — and
    * its 100 TB story — is identical.
    *
    * @param weight integral-valued column (cast to long); NULL-weight
    *               rows are dropped with NULL values, and rows with
    *               weight <= 0 are dropped too (a zero weight must not
    *               be an eligible percentile answer and a negative one
    *               would make the cumulative mass non-monotone). A
    *               fractional weight raises at runtime — silently
    *               truncating it would mis-mass the distribution.
    */
  def weightedPercentiles(df: DataFrame, group: Column, value: Column,
                          weight: Column, ps: Seq[(String, Double)],
                          nParts: Int = 32): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    val wl = weight.cast("long")
    // lossless-cast guard: NULL weight keeps NULL (then drops); a
    // fractional weight fails loudly instead of truncating
    val w = when(wl.cast("double") =!= weight.cast("double"),
      raise_error(concat(lit("weightedPercentiles: non-integral weight "),
        weight.cast("string")))).otherwise(wl)
    val g = df.select(group.as("g"), value.as("v"), w.as("w"))
      .na.drop(Seq("v", "w")).filter(col("w") > 0)
      .groupBy(col("g"), col("v")).agg(sum(col("w")).as("c"))
    percentilesFromCounts(g, ps, nParts)
  }

  /** Shared tail of [[exactPercentiles]]/[[weightedPercentiles]]: the
    * per-(group, value) mass relation → cumulative mass → smallest v
    * at each ⌈p·total⌉ target rank.
    */
  private def percentilesFromCounts(g: DataFrame, ps: Seq[(String, Double)],
                                    nParts: Int): DataFrame = {
    val (cum0, parted) = cumCountsByValue(g, "g", "v", nParts)
    val cum = cum0.withColumnRenamed("__n", "n")
    val aggs = ps.map { case (name, p) =>
      // ceil(p·n) in plain double arithmetic — the oracle runs the
      // textually identical expression, so the target rank agrees
      min(when(col("cum") >= ceil(lit(p) * col("n")), col("v"))).as(name)
    }
    pinAndRelease(
      cum.groupBy(col("g"), col("n")).agg(aggs.head, aggs.tail: _*),
      parted)
  }

  /** Winsorized and trimmed statistics per group — the robust location
    * readout for heavy-tailed quality scores: values are clamped to
    * the group's exact discrete [lo, hi] percentiles (winsorized mean)
    * or excluded outside them (trimmed mean), so a handful of extreme
    * outliers cannot drag the location estimate.
    *
    * Scale shape: percentile bounds come from [[exactPercentiles]]
    * (range-partition machinery, one small row per group) and join
    * back BROADCAST, so the corpus-side pass is one map-side-combinable
    * groupBy — no window anywhere. Sums are exact DECIMAL(12,2) (the
    * q_corr convention) divided once and 6-dp rounded, so they are
    * order-independent and oracle-mirrorable.
    *
    * Returns one row per group: `(g, n, p_lo, p_hi, win_mean,
    * trim_mean, n_trim)`.
    */
  def winsorizedStats(df: DataFrame, group: Column, value: Column,
                      lo: Double = 0.05, hi: Double = 0.95,
                      nParts: Int = 32): DataFrame = {
    require(0 <= lo && lo < hi && hi <= 1, "need 0 <= lo < hi <= 1")
    val pct = exactPercentiles(df, group, value,
        Seq("p_lo" -> lo, "p_hi" -> hi), nParts)
    val rows = df.select(group.as("g"), value.as("v")).na.drop(Seq("v"))
    val d = "decimal(12,2)"
    val inBand = col("v") >= col("p_lo") && col("v") <= col("p_hi")
    rows.join(broadcast(pct), "g")
      .groupBy(col("g"), col("n"), col("p_lo"), col("p_hi"))
      .agg(
        round(sum(least(greatest(col("v"), col("p_lo")), col("p_hi"))
          .cast(d)).cast("double") / col("n"), 6).as("win_mean"),
        round(sum(when(inBand, col("v").cast(d))).cast("double") /
          sum(when(inBand, 1L).otherwise(0L)), 6).as("trim_mean"),
        sum(when(inBand, 1L).otherwise(0L)).as("n_trim"))
  }

  /** Per-row quantile-rank normalization within each group — the
    * distribution-free score transform a quality-filter pipeline runs
    * before thresholding heterogeneous scorers: each row's value maps
    * to its inclusive ECDF position `cum/n ∈ (0, 1]` within its group,
    * so thresholds mean the same thing across groups regardless of the
    * raw score scale.
    *
    * Scale shape: collapse to one row per (group, value) map-side (the
    * only corpus-sized shuffle), per-distinct-value cumulative counts
    * via the same slice-offset machinery as [[exactPercentiles]], then
    * ONE co-partitioned join maps the (group, value) → quantile
    * relation back onto the rows — never a corpus-wide window. The
    * ratio is one double division, 6-dp.
    *
    * The distinct-value relation is persisted like [[exactPercentiles]]'
    * — NOT as a perf cache but because repartitionByRange samples its
    * partition bounds, and the offsets branch and the quantile-map
    * branch must see the SAME bounds (see the persist note in
    * [[Corpus.globalIds]]); the output is corpus-sized, so the pin
    * cannot be traded for a materialize-and-release.
    *
    * Appends `qrank` to the input rows (null-valued rows are dropped).
    */
  def quantileRank(df: DataFrame, group: Column, value: Column,
                   nParts: Int = 32): DataFrame = {
    val rows = df.withColumn("__g", group).withColumn("__v", value)
      .na.drop(Seq("__v"))
    val g = rows.groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("c"))
    // the pin inside stays (output is corpus-sized — see cumCountsByValue)
    val (cum, _) = cumCountsByValue(g, "__g", "__v", nParts)
    val qmap = cum.select(col("__g"), col("__v"),
      round(col("cum").cast("double") / col("__n"), 6).as("qrank"))
    rows.join(qmap, Seq("__g", "__v")).drop("__g", "__v")
  }

  /** Exact 2-D skyline (Pareto frontier), both dimensions MINIMIZED:
    * rows whose `(c1, c2)` pair no other pair dominates (≤ in both
    * dims, < in at least one). The multi-objective "best trade-off"
    * query — cheapest-vs-smallest parts, freshest-vs-highest-quality
    * docs.
    *
    * Scale shape: the naive formulation is an all-pairs NOT EXISTS
    * (what the oracle runs — quadratic, fine only at oracle scale).
    * Here the DISTINCT pair set is range-partitioned on `(c1, c2)`;
    * a pair is dominated iff the minimum `c2` over pairs strictly
    * before it in that order is ≤ its own `c2`, which decomposes into
    * a partition-local running min plus a broadcast exclusive
    * prefix-min over the ≤ `nParts` per-partition minima — the same
    * slice-offset machinery as [[Corpus.globalIds]]. One range
    * shuffle of the pair set, windows only within slices, and a
    * final semi-join maps frontier pairs back to rows; nothing is
    * ever pair × pair.
    */
  def skyline2d(points: DataFrame, c1: String, c2: String,
                nParts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = points.select(col(c1), col(c2)).na.drop().distinct()
    val parted = pairs.repartitionByRange(nParts, col(c1), col(c2))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ≤ nParts rows: the single-partition window is the point
    val prefix = parted.groupBy(col("__pid")).agg(min(col(c2)).as("__pmin"))
      .withColumn("__premin", min(col("__pmin")).over(
        Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__pid"), col("__premin"))
    val localW = Window.partitionBy(col("__pid")).orderBy(col(c1), col(c2))
      .rowsBetween(Window.unboundedPreceding, -1)
    // least() skips nulls, so slice heads fall back to the prefix min
    // alone (null for the very first slice = nothing precedes)
    val frontier = parted.join(broadcast(prefix), "__pid")
      .withColumn("__dmin", least(min(col(c2)).over(localW), col("__premin")))
      .filter(col("__dmin").isNull || col("__dmin") > col(c2))
      .select(col(c1), col(c2))
    pinAndRelease(points.join(frontier, Seq(c1, c2), "left_semi"), parted)
  }
}
