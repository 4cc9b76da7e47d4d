package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** One-shot phase/plan probe for pageRank at the 100x replica. */
object Profile100 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/scale100")
    val spark = graft.session.Sessions.local(32, 32, "graft-profile100")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
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
    val eW = t("eW window build+persist+count") {
      val x = edges.select(col("src").as("esrc"), col("dst").as("edst"),
          count(lit(1)).over(Window.partitionBy(col("src"))).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[prof] eW rows: ${x.count()}, partitions: ${x.rdd.getNumPartitions}")
      x
    }
    val n = t("guard explode+groupBy") {
      eW.select(explode(array(
          struct(col("esrc").as("node"), lit(1).as("s"), lit(0).as("d")),
          struct(col("edst").as("node"), lit(0).as("s"), lit(1).as("d")))).as("x"))
        .groupBy(col("x.node"))
        .agg(max(col("x.s")).as("hasS"))
        .agg(count(lit(1)).as("n")).collect()(0).getAs[Long]("n")
    }
    println(s"[prof] n nodes: $n")
    def oneIter(label: String, parts: String, smj: String): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.join.preferSortMergeJoin", smj)
      val ranks = eW.select(col("esrc").as("node")).distinct()
        .withColumn("rank", lit(1.0 / n))
      val it = ranks.join(eW, col("node") === col("esrc"))
        .select(col("edst"), (col("rank") / col("deg")).as("share"))
        .groupBy(col("edst"))
        .agg(sum(col("share")).as("rank"))
      if (args.length > 1) it.explain()
      t(s"ONE iteration [$label]") { it.write.format("noop").mode("overwrite").save() }
    }
    oneIter("parts=2 shj", "2", "false")
    oneIter("parts=2 smj", "2", "true")
    oneIter("parts=32 shj", "32", "false")
    oneIter("parts=32 smj", "32", "true")
    // plan for the winner
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    val ranks = eW.select(col("esrc").as("node")).distinct().withColumn("rank", lit(1.0 / n))
    ranks.join(eW, col("node") === col("esrc"))
      .select(col("edst"), (col("rank") / col("deg")).as("share"))
      .groupBy(col("edst")).agg(sum(col("share")).as("rank")).explain()
    spark.stop()
  }
}
