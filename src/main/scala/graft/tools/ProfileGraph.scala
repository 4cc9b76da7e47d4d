package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Ad-hoc phase-level profiler for the iterative graph operators —
  * round-10 tooling for the bench-variance hunt: replays pageRank's
  * internal phases (edge cache, guard job, iteration chain, final
  * checkpoint) with a wall-clock per phase, so "which stage eats the
  * seconds" is measured, not guessed.
  *
  * Usage: `sbt "runMain graft.tools.ProfileGraph [sfDir] [reps]"`
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.session.Sessions.localBench(32, 32, "graft-profile")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def ld(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")

    val pairs = t("purchasePairs build+persist+count") {
      val p = graft.operators.Graph.purchasePairs(ld("orders"), ld("lineitem"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .union(pairs.select(col("s").as("src"), col("c").as("dst")))
      // phase replay of Graph.pageRank
      val e = edges.select(col("src"), col("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val eW = e.join(deg, "src")
        .select(col("src").as("esrc"), col("dst").as("edst"), col("deg"))
        .repartition(col("esrc")).persist(StorageLevel.MEMORY_AND_DISK)
      val n = t("guard job (materializes eW)") {
        eW.select(col("esrc").as("ns")).distinct()
          .join(eW.select(col("edst").as("nd")).distinct(),
            col("ns") === col("nd"), "full_outer")
          .agg(count(lit(1)).as("n"))
          .collect()(0).getAs[Long]("n")
      }
      e.unpersist(blocking = false)
      val teleport = 0.15 / n
      var ranks = eW.select(col("esrc").as("node")).distinct()
        .withColumn("rank", lit(1.0 / n))
      for (_ <- 1 to 5) {
        ranks = ranks.join(eW, col("node") === col("esrc"))
          .select(col("edst"), (col("rank") / col("deg")).as("share"))
          .groupBy(col("edst"))
          .agg((lit(teleport) + lit(0.85) * sum(col("share"))).as("rank"))
          .select(col("edst").as("node"), col("rank"))
      }
      val out = t("iteration chain (5 iters, one job) + localCheckpoint") {
        ranks.localCheckpoint()
      }
      t("final noop write") {
        out.select(col("node"), round(col("rank") * n, 6).as("rank_norm"))
          .write.format("noop").mode("overwrite").save()
      }
      // variant B: single-pass guard — explode endpoints, one groupBy
      val eB = edges.select(col("src"), col("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val degB = eB.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val eWB = eB.join(degB, "src")
        .select(col("src").as("esrc"), col("dst").as("edst"), col("deg"))
        .repartition(col("esrc")).persist(StorageLevel.MEMORY_AND_DISK)
      val nB = t("guard variant B (single explode+groupBy)") {
        eWB.select(explode(array(
            struct(col("esrc").as("node"), lit(1).as("s"), lit(0).as("d")),
            struct(col("edst").as("node"), lit(0).as("s"), lit(1).as("d"))))
            .as("x"))
          .groupBy(col("x.node"))
          .agg(max(col("x.s")).as("hasS"), max(col("x.d")).as("hasD"))
          .agg(count(lit(1)).as("n"),
            sum(lit(1) - col("hasS")).as("noOut"),
            sum(lit(1) - col("hasD")).as("noIn"))
          .collect()(0).getAs[Long]("n")
      }
      eB.unpersist(blocking = false)
      var ranksB = eWB.select(col("esrc").as("node")).distinct()
        .withColumn("rank", lit(1.0 / nB))
      for (_ <- 1 to 5) {
        ranksB = broadcast(ranksB).join(eWB, col("node") === col("esrc"))
          .select(col("edst"), (col("rank") / col("deg")).as("share"))
          .groupBy(col("edst"))
          .agg((lit(0.15 / nB) + lit(0.85) * sum(col("share"))).as("rank"))
          .select(col("edst").as("node"), col("rank"))
      }
      t("iteration variant B (broadcast ranks) + localCheckpoint") {
        ranksB.localCheckpoint(): Unit
      }
      def iterChain(src: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        var r = src.select(col("esrc").as("node")).distinct()
          .withColumn("rank", lit(1.0 / nB))
        for (_ <- 1 to 5) {
          r = r.join(src, col("node") === col("esrc"))
            .select(col("edst"), (col("rank") / col("deg")).as("share"))
            .groupBy(col("edst"))
            .agg((lit(0.15 / nB) + lit(0.85) * sum(col("share"))).as("rank"))
            .select(col("edst").as("node"), col("rank"))
        }
        r
      }
      def withConf[A](kvs: (String, String)*)(body: => A): A = {
        val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
        kvs.foreach { case (k, v) => spark.conf.set(k, v) }
        try body finally prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
      t("iteration variant D (AQE off)") {
        withConf("spark.sql.adaptive.enabled" -> "false") {
          iterChain(eWB).localCheckpoint(): Unit
        }
      }
      t("iteration variant E (shuffle.partitions=8)") {
        withConf("spark.sql.shuffle.partitions" -> "8") {
          iterChain(eWB).localCheckpoint(): Unit
        }
      }
      t("iteration variant F (AQE off + parts=8)") {
        withConf("spark.sql.adaptive.enabled" -> "false",
            "spark.sql.shuffle.partitions" -> "8") {
          iterChain(eWB).localCheckpoint(): Unit
        }
      }
      t("iteration variant G (AQE off + parts=1)") {
        withConf("spark.sql.adaptive.enabled" -> "false",
            "spark.sql.shuffle.partitions" -> "1") {
          iterChain(eWB).localCheckpoint(): Unit
        }
      }
      t("iteration variant G2 (AQE off + parts=1, 2nd)") {
        withConf("spark.sql.adaptive.enabled" -> "false",
            "spark.sql.shuffle.partitions" -> "1") {
          iterChain(eWB).localCheckpoint(): Unit
        }
      }
      eWB.unpersist()
      eW.unpersist()
      t("full Graph.pageRank (operator as shipped)") {
        graft.operators.Graph.pageRank(edges, 5, 0.85)
          .write.format("noop").mode("overwrite").save()
      }
      t("full Graph.hits (operator as shipped)") {
        graft.operators.Graph.hits(
            pairs.select(col("c").as("src"), col("s").as("dst")), 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
