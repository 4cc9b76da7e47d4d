package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch phase-timer for iterating on operator cost (not part of the
  * driver contract; kept out of Bench/Verify).
  */
object ScratchTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.session.Sessions.local(32, 32, "graft-scratch")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def ld(n: String) = graft.sources.Tables.load(spark, dir, n)
    for (pass <- 1 to 2) {
      println(s"[scratch] pass $pass")
      val edges = t("build") {
        val g = graft.operators.Graph.purchaseGraph(ld("orders"), ld("lineitem"))
        g.persist(); g.count(); g
      }
      // replicate pageRank body with timers
      val e = edges.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val guard = t("guard job") {
        deg.select(col("src").as("ns"))
          .join(e.select(col("dst").as("nd")).distinct(), col("ns") === col("nd"), "full_outer")
          .agg(count(lit(1)).as("n"),
            sum(when(col("ns").isNull, 1L).otherwise(0L)).as("noOut"),
            sum(when(col("nd").isNull, 1L).otherwise(0L)).as("noIn"))
          .collect()(0)
      }
      val n = guard.getAs[Long]("n")
      val teleport = 0.15 / n
      val eW = t("eW build") {
        val w = e.join(deg, "src")
          .select(col("src").as("esrc"), col("dst").as("edst"), col("deg"))
          .repartition(col("esrc")).persist(StorageLevel.MEMORY_AND_DISK)
        w.count(); w
      }
      var ranks = t("rank init ckpt") {
        deg.select(col("src").as("node")).withColumn("rank", lit(1.0 / n)).localCheckpoint()
      }
      for (i <- 1 to 5) {
        ranks = ranks.join(eW, col("node") === col("esrc"))
          .select(col("edst"), (col("rank") / col("deg")).as("share"))
          .groupBy(col("edst"))
          .agg((lit(teleport) + lit(0.85) * sum(col("share"))).as("rank"))
          .select(col("edst").as("node"), col("rank"))
      }
      t("all 5 iters fused lazily") { ranks.count() }
      t("output") {
        ranks.select(col("node"), round(col("rank") * n, 6).as("rank_norm"))
          .write.format("noop").mode("overwrite").save()
      }
      e.unpersist(); eW.unpersist(); edges.unpersist()
    }
    spark.stop()
  }
}
