package graft.tools

import org.apache.spark.sql.functions._

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
      val g = t("purchaseGraph build+count") {
        val g = graft.operators.Graph.purchaseGraph(ld("orders"), ld("lineitem"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        g.count(); g
      }
      t("pageRank on prebuilt edges") {
        graft.operators.Graph.pageRank(g, iters = 5, damping = 0.85)
          .write.format("noop").mode("overwrite").save()
      }
      t("full graph_pagerank query") {
        graft.SparkEntry.queries("graph_pagerank")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      g.unpersist()
      t("graph_triangles query") {
        graft.SparkEntry.queries("graph_triangles")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      t("dedup_clusters query") {
        graft.SparkEntry.queries("dedup_clusters")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
