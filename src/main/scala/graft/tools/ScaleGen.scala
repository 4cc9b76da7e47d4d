package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Empirical-scaling fixture generator: replicate the sf0.1 tables
  * `factor`× (default 10 → ≈ sf1) with CONSISTENT key offsets, so
  * every join in the inventory still lines up and the workload grows
  * the way a real corpus grows — not the way naive row duplication
  * would distort it:
  *
  *  - fact/dim keys (`custkey`, `orderkey`, `partkey`, `suppkey`,
  *    `doc_id`, `vec_id`, `event_id`) are offset per replica, so FK
  *    joins stay 1:1 and the co-purchase/co-activity graphs scale
  *    HORIZONTALLY (10 disjoint copies), matching real growth;
  *  - `events.ts` shifts by replica × the original 30-day span and
  *    `user_id` offsets per replica — more history and more users, the
  *    real growth axes — so per-(hour, event_type) group sizes stay
  *    constant instead of densifying 10× (which would quadratically
  *    inflate every wedge/pair workload and measure a fiction);
  *  - `customer.c_name` is REGENERATED from the offset key (same
  *    `Customer#<9 digits>` shape), so name-blocked fuzzy matching
  *    keeps its bounded-block contract instead of seeing each name 10
  *    times;
  *  - `documents.text` gets a per-replica suffix token (replica 0
  *    unchanged), so exact/near-dup relations grow linearly instead of
  *    every document acquiring 9 verbatim clones (`n_chars` is
  *    recomputed);
  *  - `region`/`nation` stay as-is: genuinely fixed dimensions.
  *
  * Output layout matches TESTDATA.md: ONE parquet file per table named
  * `<table>.parquet` (the streaming readers glob on the leaf file
  * name), produced by writing single-part and renaming.
  *
  * Usage: `sbt "runMain graft.tools.ScaleGen [srcDir] [dstDir] [factor]"`
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/scale10")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.session.Sessions.local(cpus, cpus, "graft-scalegen")
    import spark.implicits._

    def t(name: String): DataFrame = graft.sources.Tables.load(spark, src, name)
    // per-replica copies: cross join with the replica index relation
    // (explode of a literal sequence — no data-dependent fan-out)
    def rep(df: DataFrame): DataFrame =
      df.crossJoin(Seq.range(0, factor).toDF("__r"))
    def off(c: String, stride: Long) = col(c) + col("__r") * stride

    val out: Seq[(String, DataFrame)] = Seq(
      "region" -> t("region"),
      "nation" -> t("nation"),
      "supplier" -> rep(t("supplier"))
        .withColumn("s_suppkey", off("s_suppkey", 1000L))
        .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey"))),
      "part" -> rep(t("part"))
        .withColumn("p_partkey", off("p_partkey", 20000L)),
      // name regenerated from the ALREADY-offset key (the supplier
      // pattern) — formatting off(...) here would double-apply the
      // replica offset and break the name↔key contract
      "customer" -> rep(t("customer"))
        .withColumn("c_custkey", off("c_custkey", 15000L))
        .withColumn("c_name",
          format_string("Customer#%09d", col("c_custkey"))),
      "orders" -> rep(t("orders"))
        .withColumn("o_orderkey", off("o_orderkey", 150000L))
        .withColumn("o_custkey", off("o_custkey", 15000L)),
      "lineitem" -> rep(t("lineitem"))
        .withColumn("l_orderkey", off("l_orderkey", 150000L))
        .withColumn("l_partkey", off("l_partkey", 20000L))
        .withColumn("l_suppkey", off("l_suppkey", 1000L)),
      "events" -> rep(t("events"))
        .withColumn("event_id", off("event_id", 100000L))
        .withColumn("user_id", off("user_id", 1500L))
        .withColumn("ts", expr("timestampadd(DAY, __r * 30, ts)")),
      "documents" -> rep(t("documents"))
        .withColumn("doc_id", off("doc_id", 5000L))
        .withColumn("text", when(col("__r") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" r"), col("__r"))))
        .withColumn("n_chars", length(col("text"))),
      "embeddings" -> rep(t("embeddings"))
        .withColumn("vec_id", off("vec_id", 2000L))
    )

    val dstDir = new java.io.File(dst)
    dstDir.mkdirs()
    out.foreach { case (name, df) =>
      val tmp = s"$dst/__tmp_$name"
      df.drop("__r").coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file written for $name"))
      val target = new java.io.File(dstDir, s"$name.parquet")
      if (target.exists()) target.delete()
      require(part.renameTo(target), s"rename failed for $name")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(tmp))
      println(s"[scalegen] $name -> ${target.getPath}")
    }
    spark.stop()
  }
}
