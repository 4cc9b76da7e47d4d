package graft.tools

import org.apache.spark.sql.functions._

/** Scratch phase-timer for iterating on operator cost (not part of the
  * driver contract; kept out of Bench/Verify).
  *
  * Round-9 shape: split the pagerank/HITS pair (the suite's two most
  * expensive queries, both over `purchasePairsCached`) into build vs
  * iterate by timing each operator at two iteration counts on the SAME
  * prebuilt edge relation — per-iteration cost = Δt/Δiters, build +
  * fixed overhead = the remainder.
  */
object ScratchTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.session.Sessions.localBench(32, 32, "graft-scratch")
    def t[A](label: String)(f: => A): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] $label: $s%.2f s"); s
    }
    def ld(n: String) = graft.sources.Tables.load(spark, dir, n)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (pass <- 1 to 3) {
      println(s"[scratch] pass $pass")
      val p = graft.operators.Graph.purchasePairs(ld("orders"), ld("lineitem"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("purchasePairs build+count")(p.count())
      val sym = p.select(col("c").as("src"), col("s").as("dst"))
        .union(p.select(col("s").as("src"), col("c").as("dst")))
      val pr1 = t("pageRank iters=1")(noop(graft.operators.Graph.pageRank(sym, iters = 1)))
      val pr5 = t("pageRank iters=5")(noop(graft.operators.Graph.pageRank(sym, iters = 5)))
      println(f"[scratch]   pageRank per-iter ${(pr5 - pr1) / 4}%.2f s, build+fixed ${pr1 - (pr5 - pr1) / 4}%.2f s")
      val dirEdges = p.select(col("c").as("src"), col("s").as("dst"))
      val h1 = t("hits iters=1")(noop(graft.operators.Graph.hits(dirEdges, iters = 1)))
      val h3 = t("hits iters=3")(noop(graft.operators.Graph.hits(dirEdges, iters = 3)))
      println(f"[scratch]   hits per-iter ${(h3 - h1) / 2}%.2f s, build+fixed ${h1 - (h3 - h1) / 2}%.2f s")
      p.unpersist()
    }
    spark.stop()
  }
}
