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
                      topN: Int = 20): DataFrame =
    heavyHittersFromSketch(cmsBuild(df, keyCol, depth, width), df, keyCol,
      depth, width, topN)

  /** The probing tail of [[cmsHeavyHitters]] over an ALREADY-BUILT
    * sketch cell relation `(j, bucket, cnt)` — batch-built or the
    * materialized final state of a complete-mode streaming
    * [[cmsBuild]] aggregate (the additive-merge property that makes
    * CMS cells legal streaming state).
    */
  def heavyHittersFromSketch(sketch: DataFrame, df: DataFrame, keyCol: String,
                             depth: Int, width: Int, topN: Int): DataFrame = {
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

  // ------------------------------------------------------------------
  // HyperLogLog (Flajolet et al. 2007) — approximate COUNT(DISTINCT)
  // ------------------------------------------------------------------

  /** α_m bias-correction constant from the HLL paper. */
  private def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** HLL register relation `(groupCol, b, r)` for `keyCol`: bucket
    * `b = h mod m`, register `r = max over keys of rho(h div m)` where
    * `rho` is the 1-based position of the leftmost set bit in the
    * remaining 60−log2(m) hash bits (all-zero remainder → width+1).
    *
    * The hash is the first 15 hex chars (60 bits) of md5 — portable to
    * any engine, which is what lets the DuckDB oracle rebuild the
    * registers bit for bit. ≤ groups×m rows regardless of input size;
    * the groupBy max is map-side combinable, so at 100 TB the shuffle
    * moves ≤ groups×m×partitions partial rows, never the key set.
    * Registers built on disjoint data (days, shards) merge by
    * element-wise MAX — the property that makes the sketch reusable
    * across ingestion batches.
    */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String,
                   m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    val log2m = java.lang.Integer.numberOfTrailingZeros(m)
    val wbits = 60 - log2m
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val b = h.bitwiseAND(lit(m - 1L)).cast("int")
    val w = shiftright(h, log2m)
    // bit length via base-2 string render (codegen'd, exact) — no
    // float log2, whose ulp error flips floor() at exact powers of two
    val rho = when(w === 0, lit(wbits + 1))
      .otherwise(lit(wbits + 1) - length(conv(w.cast("string"), 10, 2)))
    df.filter(col(keyCol).isNotNull)
      .select(col(groupCol), b.as("b"), rho.cast("int").as("r0"))
      .groupBy(col(groupCol), col("b"))
      .agg(max(col("r0")).as("r"))
  }

  /** Estimate per group from a register relation: harmonic-mean raw
    * estimate with the paper's small-range linear-counting correction.
    * Absent buckets are zero registers (they contribute 2⁰ = 1 each).
    */
  def hllEstimate(regs: DataFrame, groupCol: String, m: Int): DataFrame = {
    val alpha = hllAlpha(m)
    regs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("nreg"),
        sum(pow(lit(0.5), col("r"))).as("sp"))
      .select(col(groupCol),
        (lit(m.toLong) - col("nreg")).as("zeros"),
        (lit(alpha * m * m) / (col("sp") + (lit(m.toLong) - col("nreg"))))
          .as("raw"))
      .select(col(groupCol),
        when(col("raw") <= lit(2.5 * m) && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("raw")).as("approx"))
  }

  /** Per-group approximate-distinct report plus an `allLabel` row
    * estimated from the MERGED registers (element-wise max across
    * groups) — proving the merge property inside the query. The exact
    * `COUNT(DISTINCT)` rides along as the verification anchor (at
    * 100 TB you would drop it; it is the very cost HLL avoids).
    */
  def hllDistinctReport(df: DataFrame, groupCol: String, keyCol: String,
                        m: Int = 64, allLabel: String = "__all__"): DataFrame =
    hllReportFromRegisters(hllRegisters(df, groupCol, keyCol, m),
      df, groupCol, keyCol, m, allLabel)

  /** The report tail on an ALREADY-BUILT register relation — shared by
    * the batch path above and the streaming path (where the registers
    * come out of a complete-mode streaming aggregation and `exactFrom`
    * is the batch read of the same data). This split is the point of
    * the sketch: registers can be maintained anywhere (batch, stream,
    * per-day shards) and the estimate is a cheap fold over ≤ groups×m
    * rows.
    */
  def hllReportFromRegisters(regs: DataFrame, exactFrom: DataFrame,
                             groupCol: String, keyCol: String,
                             m: Int = 64, allLabel: String = "__all__"): DataFrame = {
    val merged = regs.groupBy(col("b")).agg(max(col("r")).as("r"))
      .select(lit(allLabel).as(groupCol), col("b"), col("r"))
    val approx = hllEstimate(regs.union(merged), groupCol, m)
      .select(col(groupCol), round(col("approx"), 4).as("approx_distinct"))
    val base = exactFrom.filter(col(keyCol).isNotNull)
    val exact = base.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("exact_distinct"))
      .union(base.select(lit(allLabel).as(groupCol), col(keyCol))
        .groupBy(col(groupCol))
        .agg(countDistinct(col(keyCol)).as("exact_distinct")))
    exact.join(approx, Seq(groupCol))
      .select(col(groupCol), col("exact_distinct"), col("approx_distinct"),
        round(abs(col("approx_distinct") - col("exact_distinct")) /
          col("exact_distinct"), 4).as("rel_err"))
  }

  /** Pairwise segment-overlap estimation from HLL registers — the
    * "how much do these two audiences / crawl slices share" question,
    * answered by sketch ALGEBRA instead of a pairwise key join:
    * |A∩B| ≈ |A| + |B| − |A∪B|, where |A∪B| comes from the
    * element-wise-max merge of the two register sets (the only set
    * operation HLL supports losslessly).
    *
    * Scale shape: the input is scanned ONCE to build per-group
    * registers (≤ groups×m rows); every pairwise step after that —
    * group cross pairs, register union, harmonic estimates — runs on
    * sketch-sized relations, so adding a segment costs one register
    * set, not a corpus re-scan per pair. The exact pairwise
    * intersection rides along as the verification anchor (one
    * key-partitioned self-join; at 100 TB you would drop it — that
    * join is the very cost the sketch algebra avoids).
    */
  def hllOverlapReport(df: DataFrame, groupCol: String, keyCol: String,
                       m: Int = 64): DataFrame = {
    val regs = hllRegisters(df, groupCol, keyCol, m)
      .localCheckpoint() // sketch-sized; read three times below
    val groups = regs.select(col(groupCol)).distinct()
    val pairs = groups.select(col(groupCol).as("ga"))
      .crossJoin(groups.select(col(groupCol).as("gb")))
      .filter(col("ga") < col("gb"))
    // union registers per pair: element-wise max across the two groups
    val ra = pairs.join(regs.withColumnRenamed(groupCol, "ga"), "ga")
    val rb = pairs.join(regs.withColumnRenamed(groupCol, "gb"), "gb")
    val unionRegs = ra.select(col("ga"), col("gb"), col("b"), col("r"))
      .union(rb.select(col("ga"), col("gb"), col("b"), col("r")))
      .groupBy(col("ga"), col("gb"), col("b")).agg(max(col("r")).as("r"))
      // struct pair key — a '|'-joined string would alias distinct
      // pairs whenever a segment name itself contains '|'
      .withColumn("__pk", struct(col("ga"), col("gb")))
    val estU = hllEstimate(unionRegs, "__pk", m)
      .select(col("__pk"), col("approx").as("eu"))
    val estS = hllEstimate(regs, groupCol, m)
    // exact pairwise intersection over the distinct (group, key) set
    val d = df.filter(col(keyCol).isNotNull)
      .select(col(groupCol).as("g"), col(keyCol).as("k")).distinct()
    val exact = d.select(col("g").as("ga"), col("k"))
      .join(d.select(col("g").as("gb"), col("k")), "k")
      .filter(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb")).agg(count(lit(1)).as("xc"))
    pairs
      .join(estS.select(col(groupCol).as("ga"), col("approx").as("ea")), "ga")
      .join(estS.select(col(groupCol).as("gb"), col("approx").as("eb")), "gb")
      .join(estU, struct(col("ga"), col("gb")) === col("__pk"))
      .join(exact, Seq("ga", "gb"), "left")
      .select(col("ga").as("seg_a"), col("gb").as("seg_b"),
        coalesce(col("xc"), lit(0L)).as("exact_intersect"),
        round(col("eu"), 4).as("approx_union"),
        round(greatest(lit(0.0), col("ea") + col("eb") - col("eu")), 4)
          .as("approx_intersect"))
  }
}
