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
}
