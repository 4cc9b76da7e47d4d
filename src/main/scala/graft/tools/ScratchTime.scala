package graft.tools

import org.apache.spark.sql.functions._

/** Scratch phase-timer for iterating on operator cost (not part of the
  * driver contract; kept out of Bench/Verify).
  *
  * Round-12 shape: split `dedup_fuzzy_clusters` (the last query above
  * 150 s at the 100× octave) into its three stages — candidate
  * discovery (block self-join + bounded Levenshtein verify), the
  * min-label fixpoint over the discovered pairs, and the final
  * left-join projection — so the round's "which stage dominates"
  * question is measured, not guessed. Also prints the candidate /
  * pair / block-size workload counts the stage costs scale with.
  */
object ScratchTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale100")
    val spark = graft.session.Sessions.localBench(32, 32, "graft-scratch")
    import java.util.concurrent.atomic.AtomicLong
    val gcMs = new AtomicLong; val spill = new AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            gcMs.addAndGet(m.jvmGCTime): Unit
            spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled): Unit
          }
        }
      })
    def t[A](label: String)(f: => A): A = {
      val (g0, s0) = (gcMs.get, spill.get)
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"gc=${(gcMs.get - g0) / 1e3}%.1f s spill=${(spill.get - s0) / 1e6}%.0f MB")
      r
    }
    def ld(n: String) = graft.sources.Tables.load(spark, dir, n)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (pass <- 1 to 3) {
      println(s"[scratch] pass $pass")
      val cust = ld("customer")
      // workload shape (pass 1 only: counts don't change)
      if (pass == 1) {
        val blocks = cust.select(substring(col("c_name"), 11, 6).as("b"))
          .groupBy("b").count()
        val stats = blocks.agg(count(lit(1)).as("nBlocks"),
          max(col("count")).as("maxBlk"),
          sum(col("count") * col("count")).as("candidates")).collect()(0)
        println(s"[scratch] blocks=${stats.getAs[Long]("nBlocks")} " +
          s"maxBlock=${stats.getAs[Long]("maxBlk")} " +
          s"orderedCandidates=${stats.getAs[Long]("candidates")}")
      }
      val pairs = t("candidatePairs build+persist+count") {
        val p = graft.operators.EntityMatch.candidatePairs(cust,
          "c_custkey", "c_name",
          name => name.substr(lit(11), lit(6)), maxDistance = 1)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[scratch] pairs=${p.count()}")
        p
      }
      val cc = t("connectedComponents") {
        val c = graft.operators.Cluster.connectedComponents(pairs, "id_a", "id_b")
        noop(c); c
      }
      t("canonicalize join (end-to-end minus cc reuse)") {
        noop(cust.select(col("c_custkey").cast("long").as("c_custkey"))
          .join(cc.select(col("id").as("c_custkey"), col("comp")), Seq("c_custkey"), "left")
          .select(col("c_custkey"),
            coalesce(col("comp"), col("c_custkey")).as("canonical_id")))
      }
      pairs.unpersist()
      t("FULL query (as declared)") {
        noop(graft.operators.Cluster.canonicalize(
          cust.select(col("c_custkey")),
          graft.operators.EntityMatch.candidatePairs(cust,
            "c_custkey", "c_name",
            name => name.substr(lit(11), lit(6)), maxDistance = 1),
          "c_custkey"))
      }
    }
    spark.stop()
  }
}
