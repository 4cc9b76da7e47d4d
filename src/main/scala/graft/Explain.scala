package graft

/** Plan-inspection main: prints the formatted physical plan of each
  * named query (all queries if no names given) — the tool used to keep
  * every operator's plan scale-honest: filters pushed to the scan,
  * small sides broadcast, no stray exchanges.
  *
  * Usage: `sbt "runMain graft.Explain [sfDir] [query ...]"`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.session.Sessions.local(8, 8, "graft-explain")
    names.foreach { n =>
      println(s"\n===== $n =====")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"(failed: ${e.getMessage})") }
    }
    spark.stop()
  }
}
