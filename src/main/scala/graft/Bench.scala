package graft

/** Benchmark main: times every declared query at
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line for the driver.
  *
  * Each query is run twice and the best time reported — the first pass
  * pays JIT + codegen compilation (seconds of constant overhead that
  * would never show on a long-running cluster), the second measures the
  * steady-state plan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.session.Sessions.local(cpus, cpus, "graft-bench")

    val names = SparkEntry.queries.keys.toSeq.sorted
    // noop sink: materializes every row and column (a bare count() lets
    // Catalyst prune the payload or answer from parquet metadata, which
    // would flatter scan-heavy queries)
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }

    val pass1 = names.map(n => n -> runOnce(n)).toMap
    val pass2 = names.map(n => n -> runOnce(n)).toMap
    val best = names.map { n =>
      val ts = Seq(pass1(n), pass2(n)).filter(_ >= 0)
      n -> (if (ts.isEmpty) -1.0 else ts.min)
    }

    val qs = best.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = best.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
