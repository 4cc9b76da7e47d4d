package graft.ext

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge

import graft.functions.{CharShingleHashes, MinHashes, SimHash64, TokenHashes}

/** SQL surface for the native expressions, so `spark.sql(...)` users
  * get them too:
  *
  *  - `graft_shingle_hashes(text, n)` → array<bigint>
  *  - `graft_token_hashes(text)`      → array<bigint>
  *  - `graft_simhash64(hashes)`       → bigint
  *  - `graft_minhashes(hashes, k)`    → array<bigint>
  *
  * Two registration paths: `spark.sql.extensions=graft.ext.GraftExtensions`
  * at session build (this class), or [[GraftExtensions.register]] on a
  * live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), asFunctionBuilder(builder)))
    }
    // scale lint: fail on global windows over unbounded relations
    // (conf-gated — see GlobalWindowGuard)
    e.injectOptimizerRule(_ => graft.plans.GlobalWindowGuard)
  }

  private def asFunctionBuilder(b: Seq[Expression] => Expression): Seq[Expression] => Expression = b
}

object GraftExtensions {

  private def intArg(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_shingle_hashes" -> (es => CharShingleHashes(es.head, intArg(es(1)))),
    "graft_token_hashes" -> (es => TokenHashes(es.head)),
    "graft_simhash64" -> (es => SimHash64(es.head)),
    "graft_minhashes" -> (es => MinHashes(es.head, intArg(es(1))))
  )

  /** Register all graft SQL functions on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }
}
