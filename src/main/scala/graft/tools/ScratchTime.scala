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
    def ld(n: String) = graft.sources.Tables.load(spark, dir, n)
    for (pass <- 1 to 2) {
      println(s"[scratch] pass $pass")
      val docs = ld("documents")
      val grams = docs.select(col("doc_id"),
          explode(graft.functions.TextFunctions.wordShingles(col("text"), 3)).as("g"))
        .select(col("doc_id"), md5(col("g")).as("fp"))
      t("explode+md5 count") { grams.count() }
      val firsts = grams.groupBy(col("fp")).agg(min(col("doc_id")).as("first_doc"))
      t("firsts groupBy") { firsts.count() }
      t("join+agg") {
        grams.join(firsts, "fp")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
          .count()
      }
      t("full novelty noop") {
        graft.operators.Corpus.noveltyScore(docs, n = 3)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
