package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.vecnative

/** First principal direction of an embedding table by power iteration
  * — the dimensionality-reduction / whitening primitive (top PC scores
  * drive outlier pruning and cheap 1-d indexing of embedding spaces).
  *
  * Each iteration is ONE corpus aggregate: with the current direction
  * vₜ broadcast as a literal, every row contributes x·(x·vₜ) and the
  * per-dimension sums are taken in EXACT decimal arithmetic
  * (order-independent — the same discipline as [[KMeans]] centroid
  * means), so the fitted direction is bit-stable under any partitioning.
  * Only `dim` numbers ever reach the driver per iteration (bounded
  * model fit, like the IVF/PQ codebooks). The final output is a pure
  * projection: every vector's 6-dp-rounded score along the fitted
  * direction via the native codegen'd dot kernel.
  *
  * Determinism/oracle parity: input components and every derived
  * quantity are rounded to 6 dp before use (products before the
  * decimal cast, sums after, the normalized direction after its
  * divide), the start vector is the exact constant 1/√dim per
  * component, and norms use the same sequential fold as DuckDB's
  * `list_dot_product` — so the oracle replays the identical iteration.
  */
object Pca {

  // the shared 6-dp HALF_UP contract — one definition, not a copy
  private def round6(x: Double): Double = graft.functions.VectorKernels.round6(x)

  /** Componentwise Hotelling deflation: x ← x − (x·dir)·dir with the
    * shared 6-dp contract at every step (the projection, each product,
    * each difference) so Spark and the DuckDB oracle replay the same
    * arithmetic.
    *
    * The projection scalar x·dir must be computed ONCE per row — naively
    * referenced from the `zip_with` lambda it is re-evaluated per array
    * element (64 dot folds per row; measured 3× the whole query's
    * runtime), because higher-order lambdas are interpreted per element
    * and CollapseProject's fixpoint inlines any single-reference alias
    * into them, even through an intermediate projection. The barrier
    * that survives the optimizer: prepend the scalar to the vector
    * (`__vp = concat(array(p), v)`) — the consuming projection then
    * references `__vp` twice (slice + element_at), and CollapseProject
    * never inlines a multiply-referenced non-trivial alias, so the
    * concat column stays materialized and the lambda reads the scalar
    * with a constant-time element_at.
    */
  private def deflatedFrame(df: DataFrame, dir: Seq[Double],
                            vCol: String): DataFrame =
    df.withColumn("__vp", concat(
        array(round(vecnative.dot_product(col(vCol), typedlit(dir)), 6)), col(vCol)))
      .withColumn(vCol, zip_with(slice(col("__vp"), 2, dir.length), typedlit(dir),
        (x, dv) => round(x - round(element_at(col("__vp"), 1) * dv, 6), 6)))
      .drop("__vp")

  /** The fitted unit direction after `iters` power iterations, over
    * vectors first deflated by the already-fitted `deflate` directions
    * (empty = first component).
    */
  def fitPc(embs: DataFrame, vecCol: String, idCol: String,
            dim: Int, iters: Int, deflate: Seq[Seq[Double]] = Nil): Seq[Double] = {
    val base = embs
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(transform(col(vecCol), x => round(x.cast("double"), 6)).as("v"))
    // cache the (deflated) input across the power iterations — the
    // standard iterative-ML pattern (each iteration is one aggregate
    // job; without the persist every job re-reads and re-projects the
    // source). MEMORY_AND_DISK: rows are dim doubles, and a 100 TB
    // corpus spills rather than OOMs.
    // repartition before the per-row work: a small parquet arrives as
    // one input split, which would run every deflation product and all
    // `dim` decimal aggregate columns on a single core; the decimal
    // sums are order-independent, so the exchange cannot move the result
    val e = deflate.foldLeft(base.repartition(32))(
        (df, dir) => deflatedFrame(df, dir, "v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var v: Seq[Double] = Seq.fill(dim)(round6(1.0 / math.sqrt(dim.toDouble)))
      // each power iteration replays ONE fixed aggregate job over the
      // cached deflated frame — nothing for AQE to discover, one
      // blocking re-plan per iteration to skip (Iter scaladoc)
      Iter.noAqe(embs.sparkSession) { for (_ <- 1 to iters) {
        // stage the per-row projection scalar below the aggregate — inlined
        // into all `dim` aggregate expressions it would be folded dim times
        val staged = e.withColumn("__d",
          round(vecnative.dot_product(col("v"), typedlit(v)), 6))
        val sums = staged.select((0 until dim).map(i =>
          sum(round(element_at(col("v"), i + 1) * col("__d"), 6).cast("decimal(25,12)"))
            .as(s"s$i")): _*).collect()(0)
        require(!sums.isNullAt(0),
          "power iteration needs at least one non-null embedding row")
        val raw = (0 until dim).map(i => round6(sums.getDecimal(i).doubleValue()))
        val nrm = math.sqrt(raw.map(x => x * x).sum) // ascending-index fold
        require(nrm > 0, "power iteration collapsed to the zero vector")
        v = raw.map(x => round6(x / nrm))
      } }
      v
    } finally e.unpersist()
  }

  /** (id, pc1): every vector's score along the fitted first principal
    * direction. The scoring pass is a single codegen'd projection.
    */
  def pc1Scores(embs: DataFrame, vecCol: String, idCol: String,
                dim: Int, iters: Int = 3): DataFrame = {
    val v = fitPc(embs, vecCol, idCol, dim, iters)
    embs.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("vec_id"),
        round(vecnative.dot_product(
          transform(col(vecCol), x => round(x.cast("double"), 6)), typedlit(v)), 6)
          .as("pc1"))
  }

  /** (id, pc1, …, pcK): scores along the first `nComponents` principal
    * directions, each further direction fit by power iteration over
    * vectors deflated by its predecessors. pcₖ is the score of the
    * (k−1)-times-deflated vector along direction k — identical to the
    * raw-vector score under exact orthogonality, and well-defined under
    * the 6-dp contract. Fitting state stays bounded (k × dim numbers on
    * the driver); the scoring pass is one codegen'd projection.
    */
  def pcaScores(embs: DataFrame, vecCol: String, idCol: String,
                dim: Int, iters: Int = 3, nComponents: Int = 2): DataFrame = {
    var dirs = Vector.empty[Seq[Double]]
    for (_ <- 0 until nComponents)
      dirs :+= fitPc(embs, vecCol, idCol, dim, iters, dirs)
    var cur = embs.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("vec_id"),
        transform(col(vecCol), x => round(x.cast("double"), 6)).as("__v"))
    dirs.zipWithIndex.foreach { case (dir, k) =>
      cur = cur.withColumn(s"pc${k + 1}",
        round(vecnative.dot_product(col("__v"), typedlit(dir)), 6))
      if (k + 1 < dirs.length) cur = deflatedFrame(cur, dir, "__v")
    }
    cur.select(col("vec_id") +: dirs.indices.map(k => col(s"pc${k + 1}")): _*)
  }
}
