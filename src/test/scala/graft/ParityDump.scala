package graft

/** Scratch dump: which oracle SQLs does Spark's analyzer reject, and why.
  * Run: sbt "Test/runMain graft.ParityDump"
  */
object ParityDump {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val spark = TestSpark.spark
    for (f <- new java.io.File(sfDir).listFiles(); if f.getName.endsWith(".parquet"))
      spark.read.parquet(f.getPath)
        .createOrReplaceTempView(f.getName.stripSuffix(".parquet"))
    TypeParity.registerOracleStubs(spark)
    spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    val out = new java.io.PrintWriter("target/parity_errors.txt")
    new java.io.File("target/parity_sql").mkdirs()
    SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
      val rewritten = TypeParity.duckdbToSpark(sql)
      try { spark.sql(rewritten).schema; () }
      catch { case e: Exception =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("\\s+", " ").take(200)
        out.println(s"$name\t$msg")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"target/parity_sql/$name.sql"), rewritten)
      }
    }
    out.close()
    spark.stop()
  }
}
