package graft.tools

import org.apache.spark.sql.functions._

/** Scratch phase-timer for iterating on operator cost (not part of the
  * driver contract; kept out of Bench/Verify).
  */
object ScratchTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.session.Sessions.local(32, 32, "graft-scratch")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // replicate stream_semi_join's core with varying shuffle partitions
    for (pass <- 1 to 2; parts <- Seq(32, 8, 4)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      t(s"pass$pass semi-join parts=$parts") {
        graft.SparkEntry.queries("stream_semi_join")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    spark.stop()
  }
}
