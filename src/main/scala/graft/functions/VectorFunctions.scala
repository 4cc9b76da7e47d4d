package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector operators over `array<float>` columns.
  *
  * All pure codegen'd array expressions (`aggregate`, `zip_with`) — no
  * UDFs — so a 100 TB embedding scan stays in whole-stage codegen.
  * Elements are cast to double before arithmetic for deterministic,
  * engine-portable results.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — a native codegen'd kernel ([[VectorKernels.dot]]) with
    * the sequential-left-fold IEEE order the old `zip_with` +
    * `aggregate` form had. Higher-order functions are CodegenFallback
    * (every lambda step interpreted, and the whole projection drops out
    * of whole-stage codegen); the kernel is one JVM loop per row.
    */
  def dotProduct(a: Column, b: Column): Column = vecnative.dot_product(a, b)

  /** Σ aᵢ² — sequential fold, deterministic. */
  def sumSquares(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(sumSquares(a))

  /** Cosine similarity; 0.0 when either vector is all-zero. Native
    * kernel ([[VectorKernels.cosineSim]]) — bit-identical to the
    * fold form (same element casts, fold order, zero-denominator rule).
    */
  def cosineSimilarity(a: Column, b: Column): Column = vecnative.cosine_sim(a, b)

  /** Unit-normalize to `array<double>`. Pre-normalizing once at write
    * time turns every downstream cosine into a dot product — the right
    * trade at 100 TB where vectors are read many times.
    */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Feature-hashing text embedding (the "hashing trick"): map a token
    * array to a `dim`-bucket count vector via an md5-derived bucket per
    * token. No vocabulary, no model — a deterministic, engine-portable
    * stand-in for a learned embedding that still supports cosine
    * retrieval/near-dup over raw text. One pure projection, zero
    * shuffles: bucket ids once per token, then ONE `aggregate` fold over
    * the bucket array accumulating the count vector. The fold keeps the
    * md5 work O(tokens) — the per-dimension `filter` form re-evaluates
    * the bucket lambda (and its hashes) once per output dimension,
    * because higher-order-function bodies defeat subexpression
    * elimination. Remaining arithmetic is dim adds per token.
    */
  def hashEmbed(toks: Column, dim: Int): Column = {
    require(dim >= 1)
    val buckets = transform(toks, t =>
      pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(dim.toLong)))
    aggregate(
      buckets,
      array_repeat(lit(0.0), dim),
      (acc, b) => transform(acc, (x, i) =>
        x + when(i.cast("long") === b, 1.0).otherwise(0.0)))
  }

  /** Symmetric int8 scalar quantization: q_i = round(v_i / scale) with
    * scale = max|v|/127 (zero vectors get scale 0 and all-zero codes).
    * 4× smaller vectors and SIMD-friendly int dot products — the
    * standard storage/recall trade for billion-scale ANN; the scale
    * rides along for dequantization. Division order (v/scale, one IEEE
    * divide) is fixed so results are bit-identical across engines.
    * Returns struct(scale double, q array<int>).
    */
  def quantizeInt8(v: Column): Column = {
    val amax = array_max(transform(v, x => abs(x.cast("double"))))
    val scale = amax / lit(127.0)
    struct(
      scale.as("scale"),
      when(amax === 0.0, transform(v, x => lit(0).cast("int")))
        .otherwise(transform(v, x => round(x.cast("double") / scale).cast("int")))
        .as("q"))
  }

  /** Squared L2 distance. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane LSH bit signature (SimHash for vectors): bit i =
    * sign(v · rᵢ) where rᵢ is a deterministic pseudo-random hyperplane
    * derived from (seed, i, dim) via a splitmix64-style integer mix —
    * reproducible across engines and runs with no stored model.
    * Returns an int in [0, 2^bits) usable as an ANN bucket key.
    * Native kernel ([[VectorKernels.hyperplaneBucket]]): the per-bit
    * fold form was bits × an interpreted 64-element lambda fold per row;
    * the kernel is one codegen'd loop with the identical IEEE sum order.
    */
  def hyperplaneBucket(v: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    require(bits <= 30, "bucket bits must fit an int")
    vecnative.hyperplane_bucket(v, dim, bits, seed)
  }
}
