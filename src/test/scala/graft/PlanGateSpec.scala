package graft

import org.scalatest.funsuite.AnyFunSuite

/** The whole-inventory plan-shape regression gate: every declared
  * query's {exchanges, windows, join strategies, sorts, aggregates}
  * counts must match the checked-in golden file. PlanSpec asserts ~20
  * hand-picked shapes exactly; this spec makes the other 250 queries'
  * plans diff-reviewed too — an accidental extra shuffle, a broadcast
  * join degrading to sort-merge, or a window sneaking into a
  * previously window-free operator shows up as a named per-query diff.
  *
  * On an INTENDED plan change, regenerate with
  * `sbt "Test/runMain graft.PlanGate"` and review the golden's git
  * diff alongside the code change.
  */
class PlanGateSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private def sfPresent = new java.io.File(s"$sfDir/lineitem.parquet").exists()

  test("every query's plan-shape metrics match the golden file") {
    assume(sfPresent)
    val goldenFile = new java.io.File(PlanMetrics.goldenPath)
    assert(goldenFile.exists(),
      s"golden missing - generate it: sbt \"Test/runMain graft.PlanGate\"")
    val golden = java.nio.file.Files.readString(goldenFile.toPath)
    val now = PlanMetrics.inventoryJson(TestSpark.spark, sfDir)
    if (golden != now) {
      // line-level diff so the failure names the drifted queries
      val g = golden.linesIterator.toSeq
      val n = now.linesIterator.toSeq
      val changed = (g.toSet -- n.toSet) ++ (n.toSet -- g.toSet)
      fail(s"plan-shape drift in ${changed.size} line(s) - if INTENDED, " +
        "regenerate: sbt \"Test/runMain graft.PlanGate\" and review the " +
        "golden diff; drifted lines:\n" + changed.toSeq.sorted.mkString("\n"))
    }
  }

  test("planted regression: an extra exchange is caught by the metrics") {
    assume(sfPresent)
    val spark = TestSpark.spark
    val df = spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count()
    val (_, base) = PlanMetrics.metrics(df)
    val (_, extra) = PlanMetrics.metrics(df.repartition(7))
    assert(extra.getOrElse("Exchange", 0) > base.getOrElse("Exchange", 0),
      s"metrics failed to see the planted exchange: base=$base extra=$extra")
  }

  test("planted regression: a global window is caught by the metrics") {
    assume(sfPresent)
    val spark = TestSpark.spark
    // the session-wide GlobalWindowGuard forbids unbounded global
    // windows, so plant a PARTITIONed one — the Window count still
    // moves, which is what the gate needs to flag a windowed rewrite
    // of a window-free operator
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$sfDir/nation.parquet")
    val (_, base) = PlanMetrics.metrics(df.select(col("n_nationkey")))
    val (_, win) = PlanMetrics.metrics(df.select(col("n_nationkey"),
      row_number().over(W.partitionBy("n_regionkey").orderBy("n_nationkey")).as("rn")))
    assert(win.getOrElse("Window", 0) > base.getOrElse("Window", 0),
      s"metrics failed to see the planted window: base=$base win=$win")
  }
}
