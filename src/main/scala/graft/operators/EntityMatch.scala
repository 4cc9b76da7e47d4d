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
  */
object EntityMatch {

  /** Best clean match per dirty row. Both frames must expose `idCol`
    * and `nameCol`; `block` derives the blocking key from the name.
    * Ties (equal distance) resolve to the smallest clean id, so the
    * result is deterministic.
    */
  def bestMatch(dirty: DataFrame, clean: DataFrame,
                idCol: String, nameCol: String,
                block: Column => Column, maxDistance: Int): DataFrame = {
    val d = dirty.select(col(idCol).as("dirty_id"), col(nameCol).as("dirty_name"),
      block(col(nameCol)).as("__blk"))
    val c = clean.select(col(idCol).as("matched_id"), col(nameCol).as("clean_name"),
      block(col(nameCol)).as("__blk"))
    d.join(c, "__blk")
      .select(col("dirty_id"),
        col("matched_id"),
        levenshtein(col("dirty_name"), col("clean_name")).cast("long").as("distance"))
      .filter(col("distance") <= maxDistance)
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
    */
  def candidatePairs(df: DataFrame, idCol: String, nameCol: String,
                     block: Column => Column, maxDistance: Int): DataFrame = {
    val a = df.select(col(idCol).cast("long").as("id_a"),
      col(nameCol).as("__na"), block(col(nameCol)).as("__blk"))
    val b = df.select(col(idCol).cast("long").as("id_b"),
      col(nameCol).as("__nb"), block(col(nameCol)).as("__blk"))
    a.join(b, "__blk")
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("__na"), col("__nb")) <= maxDistance)
      .select(col("id_a"), col("id_b"))
  }
}
