package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers:
  *  - [[bruteForceTopK]] — exact cosine top-k; the correctness baseline.
  *    Queries are broadcast (they're the small side by construction), so
  *    the 100 TB candidate scan never shuffles.
  *  - [[lshTopK]] — hyperplane-LSH bucketed: candidates limited to the
  *    query's bucket(s); recall traded for a bucket-local join. The
  *    scale path when the candidate set is the whole corpus.
  *  - [[ivfTopK]] — IVF-style: coarse centroids define cells; probe the
  *    nProbe nearest cells only.
  *
  * All three end in [[TopK.topKPerGroup]] — a bounded min-heap
  * aggregator with map-side partial aggregation — instead of a
  * `row_number` window: the window form shuffles and sorts EVERY scored
  * pair into per-query partitions (corpus-sized row sets per task at
  * scale); the heap shrinks each partition to ≤ k entries before the
  * exchange.
  */
object Similarity {

  /** Final top-k over scored (query_id, candidate_id, cosine) rows:
    * rank by 6-dp-rounded cosine descending, ties to the smallest
    * candidate id (deterministic and engine-portable).
    */
  private def topK(scored: DataFrame, k: Int): DataFrame =
    TopK.topKPerGroup(
      scored.select(col("query_id"), col("candidate_id"),
        round(col("cosine"), 6).as("cosine")),
      Seq("query_id"), "cosine", "candidate_id", k)
      .select(col("query_id"), col("candidate_id"), col("cosine"), col("rank"))

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
    topK(scored, k)
  }

  /** LSH-bucketed ANN top-k: candidates restricted to buckets within
    * Hamming distance `probeHamming` of the query's hyperplane bucket
    * (classic multi-probe LSH: a near neighbor that flips one or two
    * marginal hyperplane bits is still found). Recall knobs: more
    * `seeds` (independent tables), higher `probeHamming` (more buckets
    * per table). The Hamming-ball expansion is QUERY-side only (the
    * broadcast list grows ×(1 + bits + C(bits,2))); the candidate side
    * is ONE scan emitting (seed, bucket) per seed — all seed tables in
    * a single pass — so the 100 TB plan shape (scan → broadcast-join →
    * heap) is unchanged.
    */
  def lshTopK(candidates: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int,
              dim: Int, bits: Int = 8, seeds: Seq[Long] = Seq(42L, 43L),
              probeHamming: Int = 2): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= 2, "probeHamming in 0..2")
    // XOR masks of weight <= probeHamming: distinct, so a candidate
    // matches a query at most once per (seed, mask) table
    val masks = Seq(0) ++
      (if (probeHamming >= 1) (0 until bits).map(1 << _) else Nil) ++
      (if (probeHamming >= 2)
        for { a <- 0 until bits; b <- a + 1 until bits } yield (1 << a) | (1 << b)
      else Nil)
    // ONE candidate scan computes every seed's bucket, exploded to
    // (seed index, bucket) rows — not one scan per seed; the join key
    // carries the seed so tables stay independent.
    val c = candidates
      .select(col(idCol).as("candidate_id"), col(vecCol).as("c_vec"),
        posexplode(array(seeds.map(s =>
          hyperplaneBucket(col(vecCol), dim, bits, s)): _*)).as(Seq("seed_i", "bucket")))
    // two chained explodes so each seed's bucket tree is evaluated ONCE
    // per query row (a flat `base XOR mask` probe array would clone the
    // whole signature expression per mask — Column trees are trees, not
    // DAGs; the Generate between the projections also stops Catalyst's
    // CollapseProject from re-inlining it)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        posexplode(array(seeds.map(s =>
          hyperplaneBucket(col(vecCol), dim, bits, s)): _*)).as(Seq("seed_i", "base")))
      .select(col("query_id"), col("q_vec"), col("seed_i"),
        explode(array(masks.map(m =>
          col("base").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val probed = c.join(broadcast(q), Seq("seed_i", "bucket"))
      .filter(col("query_id") =!= col("candidate_id"))
      .select(col("query_id"), col("candidate_id"),
        cosineSimilarity(col("q_vec"), col("c_vec")).as("cosine"))
      .distinct() // a pair found in several seed tables scores once
    topK(probed, k)
  }

  /** The rounded corpus projection + hash-strided sub-centroid
    * codebooks shared by [[pqTopK]] and [[pqDistortion]]: returns
    * (rounded (candidate_id, v) frame, cents(j)(t) = subvector j of
    * training vector t, subspace width).
    */
  private def pqCodebooks(candidates: DataFrame, vecCol: String, idCol: String,
                          m: Int, subK: Int): (DataFrame, Seq[Seq[Seq[Double]]], Int) = {
    val session = candidates.sparkSession
    import session.implicits._
    val e = candidates
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("candidate_id"),
        transform(col(vecCol), x => round(x.cast("double"), 6)).as("v"))
    val train: Array[Seq[Double]] = e
      .select(col("candidate_id"), col("v"),
        element_at(graft.functions.native.token_hashes(
          col("candidate_id").cast("string")), 1).as("__h"))
      .orderBy(col("__h"), col("candidate_id"))
      .limit(subK)
      .select(col("v")).as[Seq[Double]].collect()
    require(train.nonEmpty, "PQ needs at least one training vector")
    val dim = train.head.size
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    (e, (0 until m).map(j => train.toSeq.map(_.slice(j * sub, (j + 1) * sub))), sub)
  }

  /** Product-quantization ANN (inner-product ADC): the memory-bounded
    * scale path — each candidate vector is compressed to `m` one-byte
    * codes (its nearest sub-centroid per subspace, by squared L2 over
    * that subspace), and query scoring touches ONLY the codes:
    * per query a (m × subK) look-up table of subspace inner products is
    * computed once on the (broadcast) query side, and a candidate's
    * approximate inner product is m LUT reads + adds. At 100 TB the
    * corpus scan reads 8-byte codes instead of 256-byte vectors — a 32×
    * I/O cut — and the plan is scan → project codes → broadcast-join
    * LUTs → heap top-k: zero corpus shuffles.
    *
    * Determinism/oracle parity: components rounded to 6 dp, sub-centroid
    * training set = the `subK` hash-strided vectors (as [[ivfTopK]] /
    * KMeans init), encoding argmin on 6-dp-rounded L2² with
    * smallest-index tie-break, LUT entries rounded to 6 dp (so the final
    * m-term sum is order-immune far beyond double error), final score
    * re-rounded to 6 dp.
    *
    * `refine` > 0 adds the standard exact re-rank stage (FAISS
    * `RefineFlat`): ADC shortlists `refine` candidates per query, then
    * ONLY those shortlist rows are re-scored with exact cosine over the
    * raw vectors — output becomes (query_id, candidate_id, cosine,
    * rank). At 100 TB the re-rank reads queries×refine full vectors via
    * a broadcast semi-join on the shortlist, not the corpus, so ADC's
    * 32× I/O cut on the scan is kept while recall recovers to
    * P(truth ∈ shortlist).
    */
  def pqTopK(candidates: DataFrame, queries: DataFrame,
             vecCol: String, idCol: String, k: Int,
             m: Int = 8, subK: Int = 16, refine: Int = 0): DataFrame = {
    val (e, cents, sub) = pqCodebooks(candidates, vecCol, idCol, m, subK)

    // encode: per subspace, argmin of 6-dp-rounded L2² with lowest-index
    // tie-break — ONE native codegen'd kernel call per row (the
    // least-of-struct fold-tree form ran interpreted and broke
    // whole-stage codegen for the corpus scan)
    val centsArr: Array[Array[Array[Double]]] =
      cents.map(_.map(_.toArray).toArray).toArray
    val coded = e.select(col("candidate_id"),
      graft.functions.vecnative.pq_encode(col("v"), centsArr).as("__codes"))

    val lutCols = (0 until m).map { j =>
      val sl = slice(col("qv"), j * sub + 1, sub)
      array(cents(j).map(cv =>
        round(graft.functions.VectorFunctions.dotProduct(sl, typedlit(cv)), 6)): _*)
        .as(s"lut$j")
    }
    val q = queries
      .select(col(idCol).cast("long").as("query_id"),
        transform(col(vecCol), x => round(x.cast("double"), 6)).as("qv"))
      .select(col("query_id") +: lutCols: _*)

    val scored = coded.join(broadcast(q), col("query_id") =!= col("candidate_id"))
      .select(col("query_id"), col("candidate_id"),
        round((0 until m).map(j =>
          element_at(col(s"lut$j"), element_at(col("__codes"), j + 1) + 1)).reduce(_ + _), 6)
          .as("approx_ip"))
    if (refine <= 0)
      TopK.topKPerGroup(scored, Seq("query_id"), "approx_ip", "candidate_id", k)
        .select(col("query_id"), col("candidate_id"), col("approx_ip"), col("rank"))
    else refineExact(candidates, queries, vecCol, idCol, scored, "approx_ip", refine, k)
  }

  /** PQ reconstruction-error audit: per subspace, the count / mean /
    * max of the 6-dp-rounded squared L2 distance between every vector's
    * subvector and its CHOSEN centroid — the quantization-quality gate
    * a retrieval pipeline checks before swapping ADC scoring in (a
    * subspace whose distortion dwarfs the others wants more codebook
    * bits or a rotation). Shares [[pqCodebooks]]' deterministic
    * hash-strided training set and [[pqTopK]]'s encoding tie-breaks;
    * means ride exact DECIMAL(18,6) sums (order-free), one rounded
    * division at the end. One corpus scan, m rows out, no shuffle
    * beyond the m-group aggregate.
    */
  def pqDistortion(candidates: DataFrame, vecCol: String, idCol: String,
                   m: Int = 8, subK: Int = 16): DataFrame = {
    val (e, cents, sub) = pqCodebooks(candidates, vecCol, idCol, m, subK)
    val centsArr: Array[Array[Array[Double]]] =
      cents.map(_.map(_.toArray).toArray).toArray
    val coded = e.select(col("v"),
      graft.functions.vecnative.pq_encode(col("v"), centsArr).as("__codes"))
    val ddCols = (0 until m).map { j =>
      val subv = slice(col("v"), j * sub + 1, sub)
      val cv = element_at(typedlit(cents(j)), element_at(col("__codes"), j + 1) + 1)
      round(graft.functions.VectorFunctions.l2DistanceSq(subv, cv), 6)
    }
    coded
      .select(posexplode(array(ddCols: _*)).as(Seq("j", "dd")))
      .groupBy(col("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("dd").cast("decimal(18,6)")).as("__sum"),
        max(col("dd")).as("__max"))
      .select(col("j").cast("long").as("subspace"), col("n"),
        round(col("__sum").cast("double") / col("n"), 6).as("mse"),
        round(col("__max"), 6).as("max_err"))
  }

  /** Exact re-rank shared by the PQ paths: shortlist the top `refine`
    * rows per query by the approximate score (deterministic: score DESC,
    * candidate ASC), fetch ONLY the shortlisted raw vectors via a
    * broadcast join, score exact cosine, return the final top-k. The
    * corpus-sized input never shuffles; the shortlist (queries×refine
    * rows) is the only thing broadcast.
    */
  private def refineExact(candidates: DataFrame, queries: DataFrame,
                          vecCol: String, idCol: String,
                          scored: DataFrame, scoreCol: String,
                          refine: Int, k: Int): DataFrame = {
    val shortlist = TopK.topKPerGroup(scored, Seq("query_id"), scoreCol, "candidate_id", refine)
      .select(col("query_id"), col("candidate_id"))
    val cvec = candidates
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("candidate_id"), col(vecCol).as("c_vec"))
    val qvec = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("q_vec"))
    val exact = cvec.join(broadcast(shortlist), Seq("candidate_id"))
      .join(broadcast(qvec), Seq("query_id"))
      .select(col("query_id"), col("candidate_id"),
        cosineSimilarity(col("q_vec"), col("c_vec")).as("cosine"))
    topK(exact, k)
  }

  /** IVF-style ANN: the `nCells` vectors with the smallest (FNV-1a of
    * the id string, id) serve as deterministic coarse centroids — a
    * hashed sample, not a training pass. Ordering by the id HASH rather
    * than the id itself decorrelates the pick from insertion order
    * (the lowest-id rows are often the oldest/most-correlated slice of
    * a corpus, which skews cells and hurts recall; a hash-strided pick
    * approximates a uniform sample while staying reproducible and
    * oracle-expressible). Every vector is assigned to its nearest
    * centroid as a PURE PROJECTION over the scan (struct-argmax over
    * the fitted centroid literals — no shuffle, no window, no extra
    * action); queries probe their `nProbe` nearest cells. Returns
    * top-k within probed cells.
    *
    * Collecting the centroids is bounded model fitting (`nCells` rows,
    * like a k-means fit), served by a distributed top-k
    * (TakeOrderedAndProject), not a full sort — the corpus itself is
    * never collected. At 100 TB the corpus side is scan → project →
    * join(broadcast queries) → heap-aggregate: zero corpus shuffles.
    */
  def ivfTopK(candidates: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val session = candidates.sparkSession
    import session.implicits._
    val cents: Array[(Long, Seq[Double])] = candidates
      // NULL ids/vectors would throw at Dataset decode / typedlit time
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("__cid"),
        col(vecCol).cast("array<double>").as("__cv"),
        element_at(graft.functions.native.token_hashes(
          col(idCol).cast("long").cast("string")), 1).as("__chash"))
      .orderBy(col("__chash"), col("__cid"))
      .limit(nCells)
      .select(col("__cid"), col("__cv"))
      .as[(Long, Seq[Double])]
      .collect()
    require(cents.nonEmpty, "IVF needs at least one candidate vector")

    // (sim, -cell_id, cell_id) structs: lexicographic struct ordering
    // gives argmax-by-sim with smallest-cell tie-break.
    def cellStructs(vec: Column): Seq[Column] = cents.toSeq.map { case (id, v) =>
      struct(
        round(cosineSimilarity(vec, typedlit(v)), 6).as("sim"),
        lit(-id).as("neg"),
        lit(id).as("cell_id"))
    }
    def bestCell(vec: Column): Column = {
      val ss = cellStructs(vec)
      (if (ss.size == 1) ss.head else greatest(ss: _*)).getField("cell_id")
    }
    def probeCells(vec: Column): Column =
      slice(reverse(array_sort(array(cellStructs(vec): _*))), 1, nProbe)

    val assigned = candidates
      .select(col(idCol).cast("long").as("candidate_id"), col(vecCol).as("c_vec"))
      .withColumn("cell_id", bestCell(col("c_vec")))
    val probedQ = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("q_vec"))
      .select(col("query_id"), col("q_vec"),
        explode(probeCells(col("q_vec"))).as("__cell"))
      .select(col("query_id"), col("q_vec"), col("__cell.cell_id").as("cell_id"))

    val scored = assigned.join(broadcast(probedQ), Seq("cell_id"))
      .filter(col("query_id") =!= col("candidate_id"))
      .select(col("query_id"), col("candidate_id"),
        cosineSimilarity(col("q_vec"), col("c_vec")).as("cosine"))
    topK(scored, k)
  }

  /** IVF-PQ — the composition that actually runs billion-scale ANN
    * (FAISS `IVFx,PQy` shape): an IVF coarse quantizer prunes the
    * candidate set to the query's nProbe cells, and within those cells
    * candidates are scored by PQ asymmetric-distance lookup instead of
    * full-vector cosine — so the per-candidate cost is m table lookups
    * over byte codes, and full vectors are never touched at query time.
    *
    * Plan shape: ONE scan of the candidates computes BOTH the cell id
    * (argmax over centroid literals, raw vectors — same convention as
    * [[ivfTopK]]) and the m PQ codes (argmin over subspace-centroid
    * literals, 6-dp-rounded vectors — same as [[pqTopK]]) as pure
    * projections; queries broadcast (cell_id, LUT…) rows; the only
    * joins are the bucket equi-join and the final bounded-heap top-k.
    * Model fit (nCells + subK vector collects) is bounded and
    * hash-strided, not data-volume-dependent. `refine` > 0 adds the
    * exact re-rank over the ADC shortlist, as in [[pqTopK]].
    */
  def ivfPqTopK(candidates: DataFrame, queries: DataFrame,
                vecCol: String, idCol: String, k: Int,
                nCells: Int = 16, nProbe: Int = 4,
                m: Int = 8, subK: Int = 16, refine: Int = 0): DataFrame = {
    val session = candidates.sparkSession
    import session.implicits._
    val clean = candidates.filter(col(idCol).isNotNull && col(vecCol).isNotNull)

    // --- IVF coarse quantizer (raw vectors, as in ivfTopK) ---
    val cents: Array[(Long, Seq[Double])] = clean
      .select(col(idCol).cast("long").as("__cid"),
        col(vecCol).cast("array<double>").as("__cv"),
        element_at(graft.functions.native.token_hashes(
          col(idCol).cast("long").cast("string")), 1).as("__chash"))
      .orderBy(col("__chash"), col("__cid"))
      .limit(nCells)
      .select(col("__cid"), col("__cv"))
      .as[(Long, Seq[Double])].collect()
    require(cents.nonEmpty, "IVF-PQ needs at least one candidate vector")
    def cellStructs(vec: Column): Seq[Column] = cents.toSeq.map { case (id, v) =>
      struct(round(cosineSimilarity(vec, typedlit(v)), 6).as("sim"),
        lit(-id).as("neg"), lit(id).as("cell_id"))
    }
    def bestCell(vec: Column): Column = {
      val ss = cellStructs(vec)
      (if (ss.size == 1) ss.head else greatest(ss: _*)).getField("cell_id")
    }
    def probeCells(vec: Column): Column =
      slice(reverse(array_sort(array(cellStructs(vec): _*))), 1, nProbe)

    // --- PQ codebook (6-dp-rounded vectors, as in pqTopK) ---
    val train: Array[Seq[Double]] = clean
      .select(transform(col(vecCol), x => round(x.cast("double"), 6)).as("v"),
        col(idCol).cast("long").as("__id"),
        element_at(graft.functions.native.token_hashes(
          col(idCol).cast("long").cast("string")), 1).as("__h"))
      .orderBy(col("__h"), col("__id"))
      .limit(subK)
      .select(col("v")).as[Seq[Double]].collect()
    val dim = train.head.size
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val subCents: Seq[Seq[Seq[Double]]] =
      (0 until m).map(j => train.toSeq.map(_.slice(j * sub, (j + 1) * sub)))

    // --- one-scan encode: cell id + m codes per candidate; the codes
    // come from ONE native codegen'd argmin kernel (see pqTopK) ---
    val subCentsArr: Array[Array[Array[Double]]] =
      subCents.map(_.map(_.toArray).toArray).toArray
    val encoded = clean
      .select(col(idCol).cast("long").as("candidate_id"),
        col(vecCol).as("__v"),
        transform(col(vecCol), x => round(x.cast("double"), 6)).as("__vr"))
      .select(col("candidate_id"), bestCell(col("__v")).as("cell_id"),
        graft.functions.vecnative.pq_encode(col("__vr"), subCentsArr).as("__codes"))

    // --- probe side: (query, probed cell, LUTs) broadcast ---
    val lutCols = (0 until m).map { j =>
      val sl = slice(col("__qr"), j * sub + 1, sub)
      array(subCents(j).map(cv => round(dotProduct(sl, typedlit(cv)), 6)): _*)
        .as(s"lut$j")
    }
    val probedQ = queries
      .select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("__q"),
        transform(col(vecCol), x => round(x.cast("double"), 6)).as("__qr"))
      .select(col("query_id") +: explode(probeCells(col("__q"))).as("__cell") +: lutCols: _*)
      .withColumn("cell_id", col("__cell.cell_id")).drop("__cell")

    val scored = encoded.join(broadcast(probedQ), Seq("cell_id"))
      .filter(col("query_id") =!= col("candidate_id"))
      .select(col("query_id"), col("candidate_id"),
        round((0 until m).map(j =>
          element_at(col(s"lut$j"), element_at(col("__codes"), j + 1) + 1)).reduce(_ + _), 6)
          .as("approx_ip"))
    if (refine <= 0)
      TopK.topKPerGroup(scored, Seq("query_id"), "approx_ip", "candidate_id", k)
        .select(col("query_id"), col("candidate_id"), col("approx_ip"), col("rank"))
    else refineExact(candidates, queries, vecCol, idCol, scored, "approx_ip", refine, k)
  }
}
