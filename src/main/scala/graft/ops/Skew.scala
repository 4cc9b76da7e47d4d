package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at 100 TB.
  *
  * AQE's runtime skew-join splitting (on in `Sessions`) handles most
  * cases; these are the explicit tools for when the skew is known ahead
  * of time (a null-heavy join key, one mega-tenant) or the operation is
  * an aggregation, which AQE does not re-balance.
  */
object Skew {

  private val SaltCol = "__salt"

  /** Two-phase salted aggregation: pre-aggregate on (keys, salt) so one
    * hot key's rows spread over `salts` reducers, then combine. Valid
    * for algebraic aggregates — pass the partial and final expressions
    * (e.g. partial `sum(x) as s, count(1) as c`, fin `sum(s), sum(c)`).
    *
    * The salt is `pmod(hash(entire row), salts)` — deterministic, no
    * `rand()` (which breaks task retry idempotence).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
                      partial: Seq[Column], fin: Seq[Column]): DataFrame = {
    val salted = df.withColumn(SaltCol, pmod(hash(df.columns.map(col): _*), lit(salts)))
    val pre = salted
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partial.head, partial.tail: _*)
    pre.groupBy(keys.map(col): _*).agg(fin.head, fin.tail: _*)
  }

  /** Salted equi-join of a skewed big side against a small side: the
    * big side gets a deterministic row salt in [0, salts); the small
    * side is replicated `salts` times; the join key becomes
    * (keys, salt). Row multiplication is confined to the small side —
    * the classic explicit skew-join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    // the small side is REPLICATED: a right/full outer join would emit
    // each unmatched small row once per salt — refuse loudly
    require(Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin replicates the small side $salts times — join type " +
        s"'$joinType' would duplicate unmatched small-side rows; use " +
        "inner/left variants only")
    val bigSalted = big.withColumn(SaltCol,
      pmod(hash(big.columns.map(col): _*), lit(salts)))
    val smallSalted = small
      .withColumn(SaltCol, explode(sequence(lit(0), lit(salts - 1))))
      .withColumn(SaltCol, col(SaltCol).cast("int"))
    bigSalted.join(smallSalted, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Isolate-and-union skew join: rows with the listed hot key values
    * join via broadcast (no shuffle for them at all); the long tail
    * joins normally. Use when a handful of keys dominate (nulls, a
    * mega-customer).
    */
  def isolatedSkewJoin(big: DataFrame, small: DataFrame, key: String,
                       hotKeys: Seq[Any], joinType: String = "inner"): DataFrame = {
    // null-SAFE hot test: isin() evaluates to NULL for null-keyed rows,
    // which would silently leave the null hot partition — the use case
    // the doc leads with — in the cold shuffled branch
    val isHot = hotKeys.map {
      case null => col(key).isNull
      case k    => col(key) <=> lit(k)
    }.reduce(_ || _)
    val hot = big.filter(isHot).join(broadcast(small.filter(isHot)), Seq(key), joinType)
    val cold = big.filter(!isHot).join(small.filter(!isHot), Seq(key), joinType)
    hot.unionByName(cold)
  }
}
