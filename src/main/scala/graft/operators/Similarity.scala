package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[bruteForceTopK]] — exact cosine top-k; the correctness baseline.
  *    Queries are broadcast (they're the small side by construction), so
  *    the 100 TB candidate scan never shuffles; top-k is a window over
  *    (query, cosine) — per-query heap via rank.
  *  - [[lshTopK]] — hyperplane-LSH bucketed: candidates limited to the
  *    query's bucket(s); recall traded for a bucket-local join. The
  *    scale path when the candidate set is the whole corpus.
  *  - [[ivfTopK]] — IVF-style: coarse centroids (sampled rows) define
  *    cells; probe the nProbe nearest cells only.
  */
object Similarity {

  /** Exact top-k: for each query row, the k nearest candidates by
    * cosine. `queries` must be small (it is broadcast).
    */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame,
                     vecCol: String, idCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = candidates.select(col(idCol).as("candidate_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("candidate_id"))
      .select(col("query_id"), col("candidate_id"),
        cosineSimilarity(col("q_vec"), col("c_vec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("candidate_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("candidate_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** LSH-bucketed ANN top-k: candidates restricted to the query's
    * hyperplane bucket. Recall can be raised with multiple seeds
    * (multi-probe): results are unioned before the final top-k window.
    */
  def lshTopK(candidates: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int,
              dim: Int, bits: Int = 8, seeds: Seq[Long] = Seq(42L, 43L)): DataFrame = {
    val probed = seeds.map { seed =>
      val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        hyperplaneBucket(col(vecCol), dim, bits, seed).as("bucket"))
      val c = candidates.select(col(idCol).as("candidate_id"), col(vecCol).as("c_vec"),
        hyperplaneBucket(col(vecCol), dim, bits, seed).as("bucket"))
      c.join(broadcast(q), Seq("bucket"))
        .filter(col("query_id") =!= col("candidate_id"))
        .select(col("query_id"), col("candidate_id"),
          cosineSimilarity(col("q_vec"), col("c_vec")).as("cosine"))
    }.reduce(_ unionByName _).distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("candidate_id").asc)
    probed
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("candidate_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** IVF-style ANN: `nCells` coarse centroids chosen as a deterministic
    * sample of the corpus (rows where id % step == 0 — no training
    * needed for a reproducible index); every vector is assigned to its
    * nearest centroid (broadcast); queries probe their `nProbe` nearest
    * cells. Returns top-k within probed cells.
    *
    * At 100 TB the assignment pass is one broadcast-join scan, the
    * search is a cell-key equi-join — both shuffle-free on the corpus
    * side except the final per-query window.
    */
  def ivfTopK(candidates: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val n = candidates.count()
    val step = math.max(n / nCells, 1L)
    val centroids = candidates
      .filter(pmod(col(idCol), lit(step)) === 0 && col(idCol) < step * nCells)
      .select(col(idCol).as("cell_id"), col(vecCol).as("cent_vec"))

    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame = {
      val scored = df.join(broadcast(centroids))
        .withColumn("__sim", round(cosineSimilarity(col(vec), col("cent_vec")), 6))
      if (keep == 1)
        // argmax as a map-side-combinable aggregate: the corpus-side
        // assignment never sorts, it folds (×nCells rows collapse back
        // to one per vector inside each scan task). Tie-break matches
        // the window form: highest sim, then lowest cell_id.
        scored
          .groupBy(col(id))
          .agg(max_by(struct(col(vec), col("cell_id")),
            struct(col("__sim"), negate(col("cell_id")))).as("__best"))
          .select(col(id), col(s"__best.$vec").as(vec),
            col("__best.cell_id").as("cell_id"))
      else {
        val w = Window.partitionBy(col(id))
          .orderBy(col("__sim").desc, col("cell_id").asc)
        scored
          .withColumn("__r", row_number().over(w))
          .filter(col("__r") <= keep)
          .drop("cent_vec", "__sim", "__r")
      }
    }

    val assigned = assign(
      candidates.select(col(idCol).as("candidate_id"), col(vecCol).as("c_vec")),
      "candidate_id", "c_vec", 1)
    val probedQ = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      "query_id", "q_vec", nProbe)

    val scored = assigned.join(broadcast(probedQ), Seq("cell_id"))
      .filter(col("query_id") =!= col("candidate_id"))
      .select(col("query_id"), col("candidate_id"),
        cosineSimilarity(col("q_vec"), col("c_vec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 6).desc, col("candidate_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("candidate_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }
}
