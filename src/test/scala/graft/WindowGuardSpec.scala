package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GlobalWindowGuard

/** The GlobalWindowGuard optimizer rule (installed via
  * GraftExtensions): global windows over unbounded relations must fail
  * at optimization time; the engine's own bounded patterns must pass.
  */
class WindowGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sfDocs = {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  }

  test("guard is installed and ON in graft sessions") {
    assert(spark.conf.get(GlobalWindowGuard.ConfKey) == "true")
    assert(spark.sessionState.optimizer.batches.exists(
      _.rules.exists(_ eq GlobalWindowGuard)))
  }

  test("naive global window over a raw scan fails at optimization time") {
    val w = Window.orderBy(col("doc_id"))
    val plan = sfDocs.withColumn("rn", row_number().over(w))
    val e = intercept[Exception] { plan.queryExecution.optimizedPlan }
    assert(e.getMessage.contains("GlobalWindowGuard"), e.getMessage)
  }

  test("global window above an aggregate (bounded relation) passes") {
    val w = Window.orderBy(col("lang"))
    val agg = sfDocs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    assert(agg.withColumn("rn", row_number().over(w)).count() > 0)
  }

  test("global window above a limit passes") {
    val w = Window.orderBy(col("doc_id"))
    assert(sfDocs.limit(50).withColumn("rn", row_number().over(w)).count() == 50)
  }

  test("global window above a checkpointed frame passes") {
    val w = Window.orderBy(col("doc_id"))
    val cp = sfDocs.limit(20).localCheckpoint(true)
    assert(cp.withColumn("rn", row_number().over(w)).count() == 20)
  }

  test("the override conf disables the guard") {
    val w = Window.orderBy(col("doc_id"))
    spark.conf.set(GlobalWindowGuard.ConfKey, "false")
    try assert(sfDocs.withColumn("rn", row_number().over(w)).count() > 0)
    finally spark.conf.set(GlobalWindowGuard.ConfKey, "true")
  }

  test("bhFdr's boundedness contract is machine-enforced: a RAW corpus " +
      "input fails at optimization time, an aggregate-reduced one passes") {
    import graft.operators.Eval
    // misuse: per-test p-values straight off an unbounded scan — the
    // rank window is global, so the guard must refuse to plan it
    // the operator pins eagerly, so the guard fires inside the call
    val e = intercept[Exception] {
      Eval.bhFdr(sfDocs.select(col("doc_id").cast("string").as("k"),
        ((col("n_chars") % 100).cast("double") / 100.0).as("p")), Seq("k"),
        col("p"), 0.1)
    }
    assert(e.getMessage.contains("GlobalWindowGuard"), e.getMessage)
    // contract use: one row per (bounded) language group
    val agg = sfDocs.groupBy(col("lang"))
      .agg(((count(lit(1)) % 97).cast("double") / 97.0).as("p"))
      .select(col("lang").as("k"), col("p"))
    assert(Eval.bhFdr(agg, Seq("k"), col("p"), 0.1).count() > 0)
  }
}
