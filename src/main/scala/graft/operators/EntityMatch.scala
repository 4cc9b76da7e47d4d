package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate entity resolution (record linkage): match dirty records
  * to a clean reference by edit distance, with a blocking key so the
  * candidate set is an equi-join, never a cross product.
  *
  * The two-stage shape is the standard scale pattern: (1) block — hash
  * equi-join on a cheap stable key, which bounds candidates to
  * per-block pairs; (2) verify — exact `levenshtein` only on the
  * candidates, then keep the best match per dirty record with a
  * map-side-combinable `min_by` aggregate (no window over a global
  * key). Skewed blocks are AQE's problem, not the plan's.
  *
  * The per-block candidate bound is the whole scale contract, so it is
  * MACHINE-ENFORCED, not comment-enforced: every blocked side passes
  * through [[EntityMatch.requireBoundedBlocks]], which fails the job
  * the moment any block exceeds `maxBlock` members — a low-cardinality
  * block function (the classic "first letter of the name" mistake)
  * dies loudly instead of going quadratic in production.
  */
object EntityMatch {

  /** Fail the job if any `__blk` block in `keyed` exceeds `maxBlock`
    * members. Implemented IN the plan, not as a separate action: the
    * per-block count is a map-side-combinable aggregate joined back on
    * `__blk` — co-partitioned with the block join that follows, so the
    * guard adds no exchange beyond the one the join pays anyway — and
    * the check lives in a `filter(raise_error(...))` condition, which
    * Catalyst cannot prune away (a dropped checked COLUMN could be).
    */
  private def requireBoundedBlocks(keyed: DataFrame, maxBlock: Int,
                                   who: String): DataFrame = {
    val sizes = keyed.groupBy(col("__blk")).agg(count(lit(1)).as("__bn"))
    keyed.join(sizes, Seq("__blk"))
      .filter(when(col("__bn") > maxBlock,
        raise_error(concat(
          lit(s"$who: block "), col("__blk").cast("string"),
          lit(" has "), col("__bn").cast("string"),
          lit(s" members (max $maxBlock) - the blocking key is too " +
            "coarse and would turn the blocked join quadratic"))))
        .otherwise(lit(true)))
      .drop("__bn")
  }

  /** Best clean match per dirty row. Both frames must expose `idCol`
    * and `nameCol`; `block` derives the blocking key from the name.
    * Ties (equal distance) resolve to the smallest clean id, so the
    * result is deterministic. Any block with more than `maxBlock`
    * members on either side fails the job (see object doc).
    */
  def bestMatch(dirty: DataFrame, clean: DataFrame,
                idCol: String, nameCol: String,
                block: Column => Column, maxDistance: Int,
                maxBlock: Int = 10000): DataFrame = {
    val d = requireBoundedBlocks(
      dirty.select(col(idCol).as("dirty_id"), col(nameCol).as("dirty_name"),
        block(col(nameCol)).as("__blk")), maxBlock, "EntityMatch.bestMatch(dirty)")
    val c = requireBoundedBlocks(
      clean.select(col(idCol).as("matched_id"), col(nameCol).as("clean_name"),
        block(col(nameCol)).as("__blk")), maxBlock, "EntityMatch.bestMatch(clean)")
    d.join(c, "__blk")
      .select(col("dirty_id"),
        col("matched_id"),
        // threshold-bounded affix-trimming kernel (bit-identical to
        // levenshtein(l, r, maxDistance): actual distance ≤ bound, -1
        // above it — parity property-tested incl. multibyte): blocked
        // candidates share long affixes by construction (the block key
        // is a name substring), so the banded DP runs only on the few
        // bytes that can differ. The verify stage is the blocked
        // join's entire cost — measured 85% of dedup_fuzzy_clusters'
        // 100×-octave wall clock before this kernel.
        graft.functions.native.levenshtein_within(
          col("dirty_name"), col("clean_name"), maxDistance)
          .cast("long").as("distance"))
      .filter(col("distance") >= 0)
      .groupBy(col("dirty_id"))
      .agg(min_by(struct(col("distance"), col("matched_id")),
        struct(col("distance"), col("matched_id"))).as("__best"))
      .select(col("dirty_id"), col("__best.matched_id").as("matched_id"),
        col("__best.distance").as("distance"))
  }

  /** Within-corpus fuzzy duplicate PAIRS: block the frame against
    * itself on the cheap key, verify candidates with exact
    * `levenshtein`, and emit each unordered pair once (`id_a < id_b`).
    *
    * This is the discovery half of fuzzy ENTITY RESOLUTION — feed the
    * pairs to [[Cluster.canonicalize]] to resolve them into duplicate
    * groups, because pairwise matches are not clusters: A~B and B~C
    * with A~̸C still belong in one group, and only the transitive
    * closure finds that. Same scale shape as [[bestMatch]]: the block
    * join bounds candidates to per-block pairs (never a cross
    * product), and only candidates pay the edit-distance kernel.
    * Blocks above `maxBlock` fail the job; guarding one side suffices
    * for the self-join (both sides are the same keyed relation).
    */
  def candidatePairs(df: DataFrame, idCol: String, nameCol: String,
                     block: Column => Column, maxDistance: Int,
                     maxBlock: Int = 10000): DataFrame = {
    val a = requireBoundedBlocks(
      df.select(col(idCol).cast("long").as("id_a"),
        col(nameCol).as("__na"), block(col(nameCol)).as("__blk")),
      maxBlock, "EntityMatch.candidatePairs")
    val b = df.select(col(idCol).cast("long").as("id_b"),
      col(nameCol).as("__nb"), block(col(nameCol)).as("__blk"))
    a.join(b, "__blk")
      // bounded affix-trimming kernel, same contract as in bestMatch:
      // -1 above the threshold, so >= 0 keeps exactly the
      // <= maxDistance pairs (id_a < id_b first: And short-circuits in
      // codegen, halving the kernel invocations)
      .filter(col("id_a") < col("id_b") &&
        graft.functions.native.levenshtein_within(
          col("__na"), col("__nb"), maxDistance) >= 0)
      .select(col("id_a"), col("id_b"))
  }
}
