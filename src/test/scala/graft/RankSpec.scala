package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Rank

/** ntileExact must equal the built-in single-partition NTILE window for
  * every (row count, bucket count) shape — including t < n, t = n,
  * uneven division, and skewed keys.
  */
class RankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(t: Int, n: Int): Unit = {
    // scrambled unique keys with a skewed gap structure
    val rows = (1 to t).map(i => (i.toLong * i % 7919, i.toLong)).toDF("v", "id")
    val got = Rank.ntileExact(rows, Seq("v", "id"), n, "bucket", nParts = 5)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    val want = rows.withColumn("bucket",
        ntile(n).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(got == want, s"t=$t n=$n")
  }

  test("matches built-in NTILE on uneven division") { check(103, 5) }
  test("matches built-in NTILE on exact division") { check(100, 4) }
  test("matches built-in NTILE when rows < buckets") { check(3, 7) }
  test("matches built-in NTILE when rows = buckets") { check(6, 6) }
  test("matches built-in NTILE with one bucket") { check(17, 1) }
}
