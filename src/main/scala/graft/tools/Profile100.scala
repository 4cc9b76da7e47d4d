package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One-shot phase probe for pageRank at the 100x replica — rebuilt in
  * round 11 for the nodeStats + shuffle-hash-deg shape: times each
  * phase AND attributes GC/spill to it via a task-metrics listener, so
  * "where do the octave's gigabytes of spill come from" is measured
  * per phase instead of guessed from the query total.
  */
object Profile100 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/scale100")
    val spark = graft.session.Sessions.localBench(32, 32, "graft-profile100")
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
    def t[A](label: String)(body: => A): A = {
      val (g0, s0) = (gcMs.get, spill.get)
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        f"gc=${(gcMs.get - g0) / 1e3}%.1f s spill=${(spill.get - s0) / 1e6}%.0f MB")
      r
    }
    def ld(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")
    val pairs = t("purchasePairs persist+count") {
      val p = graft.operators.Graph.purchasePairs(ld("orders"), ld("lineitem"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[prof] pairs rows: ${p.count()}")
      p
    }
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("c").as("dst")))
    // mirrors Graph.pageRank's shipped shape (round 11): two
    // single-column map-side aggregates full-outer-joined on the node —
    // the probe's per-phase attribution must measure the production
    // build, not the retired explode+array+groupBy form
    val nodeStats = t("nodeStats split-agg full-outer persist+guard") {
      val ns = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
        .join(edges.select(col("dst").as("node")).distinct()
            .withColumn("hasD", lit(1)),
          Seq("node"), "full_outer")
        .select(col("node"),
          when(col("deg").isNotNull, lit(1L)).otherwise(lit(0L)).as("hasS"),
          coalesce(col("hasD"), lit(0)).as("hasD"),
          coalesce(col("deg"), lit(0L)).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val g = ns.agg(count(lit(1)).as("n"), sum(col("deg")).as("m")).collect()(0)
      println(s"[prof] n=${g.getAs[Long]("n")} m=${g.getAs[Long]("m")}")
      ns
    }
    val n = nodeStats.count()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    val eW = t("eW shuffle-hash deg join persist+count") {
      val x = edges.select(col("src").as("esrc"), col("dst").as("edst"))
        .join(nodeStats.select(col("node"), col("deg")).hint("shuffle_hash"),
          col("esrc") === col("node"))
        .select(col("esrc"), col("edst"), col("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[prof] eW rows: ${x.count()}, partitions: ${x.rdd.getNumPartitions}")
      x
    }
    var ranks = nodeStats.select(col("node")).withColumn("rank", lit(1.0 / n))
    for (i <- 1 to 5) {
      ranks = ranks.join(eW, col("node") === col("esrc"))
        .select(col("edst"), (col("rank") / col("deg")).as("share"))
        .groupBy(col("edst"))
        .agg((lit(0.03) + lit(0.85) * sum(col("share"))).as("rank"))
        .select(col("edst").as("node"), col("rank"))
      ranks = t(s"iteration $i (checkpoint)") { ranks.localCheckpoint() }
    }
    if (args.length > 1) ranks.explain()
    spark.stop()
  }
}
