package graft

/** Ad-hoc single-query timing main for perf iteration:
  * `sbt "runMain graft.Time <sfDir> <query> [passes]"` — runs one
  * declared query through the same noop-sink methodology as Bench and
  * prints per-pass seconds.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = graft.session.Sessions.local(8, 8, "graft-time")
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[time] $name pass $p: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
