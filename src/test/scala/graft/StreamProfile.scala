package graft

/** Scratch: where does a stream_* query's time go at sf0.1 —
  * schema probe, stream start/await, tail computation.
  * Run: sbt "Test/runMain graft.StreamProfile"
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = TestSpark.spark
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF| $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm the session (parquet footer caches, codegen)
    spark.read.parquet(s"$dir/events.parquet").count()
    for (round <- 1 to 2) {
      println(s"-- round $round")
      t("schema probe") {
        spark.read.parquet(s"$dir/events.parquet").schema
      }
      t("whole stream_topk") {
        SparkEntry.queries("stream_topk")(spark, dir).count()
      }
      t("whole stream_approx_distinct") {
        SparkEntry.queries("stream_approx_distinct")(spark, dir).count()
      }
      t("batch equivalent") {
        import org.apache.spark.sql.functions._
        val counts = spark.read.parquet(s"$dir/events.parquet")
          .filter(col("user_id").isNotNull)
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("n"))
        graft.operators.TopK.topKPerGroup(
          counts, Seq("event_type"), "n", "user_id", k = 3).count()
      }
      // bare streaming machinery: stateless pass-through to a memory
      // sink — no aggregation, no state stores
      t("bare stateless stream") {
        import org.apache.spark.sql.functions._
        val schema = spark.read.parquet(s"$dir/events.parquet").schema
        val src = spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .filter(col("event_id") % 100000 === 0)
        val sink = s"prof_bare_${System.nanoTime()}"
        val q = src.writeStream.outputMode("append").format("memory")
          .queryName(sink)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination(); spark.table(sink).count()
        spark.catalog.dropTempView(sink)
      }
      // stateful agg at different state-partition counts
      for (parts <- Seq(8, 4, 2)) t(s"stateful agg parts=$parts") {
        import org.apache.spark.sql.functions._
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        try {
          val schema = spark.read.parquet(s"$dir/events.parquet").schema
          val src = spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet").parquet(dir)
          val agg = src.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
          val sink = s"prof_agg_${System.nanoTime()}"
          val q = agg.writeStream.outputMode("complete").format("memory")
            .queryName(sink)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          q.awaitTermination(); spark.table(sink).count()
          spark.catalog.dropTempView(sink)
        } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
    }
    spark.stop()
  }
}
