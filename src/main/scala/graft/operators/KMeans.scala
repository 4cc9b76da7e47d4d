package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions, vecnative}

/** Spherical k-means (cosine Lloyd iterations) over an embedding
  * column — the training pass behind a real IVF index
  * ([[Similarity.ivfTopK]] uses a hashed sample as centroids; this is
  * the upgrade path that fits them properly).
  *
  * Determinism / oracle portability:
  *  - components are rounded to 6 dp (doubles) up front — clustering on
  *    lightly-quantized vectors is standard at billion scale, and a
  *    6-dp double is far enough from any decimal tie that the exact
  *    DECIMAL(25,12) cast used for centroid sums rounds identically in
  *    every engine (raw float casts do hit HALF_UP/HALF_EVEN ties);
  *  - per-cell component sums run in exact decimal → order-independent
  *    across partitions/engines; the mean is cast to double and rounded
  *    to 6 dp, so both engines iterate from bit-identical centroids;
  *  - init = the k vectors with the smallest (FNV-1a(id), id) — the
  *    same deterministic hash-strided sample as `ivfTopK`; cells are
  *    labeled 0..k−1 in pick order;
  *  - assignment = argmax of 6-dp-rounded cosine, ties to the lowest
  *    cell label.
  *
  * Scale shape per iteration: one projection (argmax over k centroid
  * literals — no shuffle) + one k-row hash aggregate with map-side
  * combine; only the k×dim centroid matrix is ever collected (bounded
  * model state, exactly like MLlib's KMeans driver loop). A cell that
  * loses all members simply drops out (no re-seeding), which keeps the
  * trace reproducible.
  */
object KMeans {

  /** Fit `k` centroids with `iters` Lloyd iterations and return the
    * final assignment: (id, cell_id, cosine-to-centroid).
    */
  def sphericalKMeans(embs: DataFrame, vecCol: String, idCol: String,
                      k: Int = 8, iters: Int = 2): DataFrame = {
    val session = embs.sparkSession
    import session.implicits._

    // persisted: the init scan, every Lloyd iteration's assignment
    // aggregate, and the final projection all read this projected/
    // rounded relation — unpersisted without it each pass re-scans and
    // re-rounds the source (same rationale as Pca.fitPc's persist)
    // repartition before the per-row work (the Pca.fitPc rationale): a
    // small parquet arrives as ONE input split, which would run every
    // n·k·d assignment pass on a single core — the 100× audit caught
    // dedup_semantic's 1M-vector assignment serialized exactly this
    // way. The decimal centroid sums are order-independent, so the
    // exchange cannot move any result.
    val e = embs
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("vec_id"),
        transform(col(vecCol), x => round(x.cast("double"), 6)).as("v"))
      .repartition(session.sparkContext.defaultParallelism)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // deterministic hash-strided init, labeled 0..k-1 in pick order
    val init: Seq[Seq[Double]] = e
      .select(col("vec_id"), col("v"),
        element_at(graft.functions.native.token_hashes(
          col("vec_id").cast("string")), 1).as("__h"))
      .orderBy(col("__h"), col("vec_id"))
      .limit(k)
      .select(col("v")).as[Seq[Double]].collect().toSeq
    require(init.nonEmpty, "k-means needs at least one vector")
    val dim = init.head.size

    // (sim desc, cell asc) argmax over the whole centroid set in ONE
    // native codegen'd kernel call (vecnative.cosine_argmax) — NOT a
    // k-arm greatest(struct…) and NOT a higher-order fold. The k-arm
    // form's expression size is O(k): the 100× audit's adaptive
    // k ≈ 15 600 built a 15k-branch expression whose Catalyst analysis
    // alone took minutes; the HOF fold keeps the plan O(1) but
    // ArrayAggregate is CodegenFallback — interpreted per row ×
    // centroid, a 10–50× tax on the inherent n·k·d assignment flops.
    // The kernel replays cosineSim's exact IEEE sequence + round-6 +
    // lowest-cell tie-break, so results are bit-identical to both
    // prior forms (oracle-pinned).
    def best(cents: Seq[(Int, Seq[Double])])(vec: Column): Column =
      vecnative.cosine_argmax(vec,
        cents.map(_._1).toArray, cents.map(_._2.toArray).toArray)

    var cents: Seq[(Int, Seq[Double])] = init.zipWithIndex.map(_.swap)
    // one fixed assign+aggregate job per Lloyd round over the cached
    // vectors — skip AQE's per-stage re-plan for the loop (Iter doc)
    Iter.noAqe(embs.sparkSession) { for (_ <- 0 until iters) {
      val assigned = e.withColumn("cell", best(cents)(col("v")).getField("cell"))
      // exact-decimal component sums: order-independent, engine-portable
      val aggs = count(lit(1)).as("n") +: (0 until dim).map(j =>
        sum(element_at(col("v"), j + 1).cast("decimal(25,12)")).as(s"s$j"))
      val rows = assigned.groupBy(col("cell")).agg(aggs.head, aggs.tail: _*).collect()
      cents = rows.map { r =>
        val n = r.getAs[Long]("n")
        val cv = (0 until dim).map { j =>
          val mean = r.getAs[java.math.BigDecimal](s"s$j").doubleValue() / n
          BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        r.getAs[Int]("cell") -> cv
      }.sortBy(_._1).toSeq
    } }

    val fin = best(cents)(col("v"))
    val out = e.select(col("vec_id"),
      fin.getField("cell").cast("long").as("cell_id"),
      fin.getField("sim").as("cosine"))
    // pin the slim 3-column result, release the wide vector cache
    Eval.pinAndRelease(out, e)
  }
}
