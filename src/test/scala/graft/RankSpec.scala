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

  /** skyline2d must equal the quadratic NOT-EXISTS definition on data
    * with ties in each dimension and duplicate points (the duplicate
    * pair dominates neither copy, so both rows survive).
    */
  private def bruteSkyline(pts: Seq[(Long, Long, Long)]): Set[Long] = {
    val pairs = pts.map(p => (p._2, p._3))
    pts.filter { case (_, x, y) =>
      !pairs.exists { case (qx, qy) =>
        qx <= x && qy <= y && (qx < x || qy < y)
      }
    }.map(_._1).toSet
  }

  private def checkSkyline(pts: Seq[(Long, Long, Long)]): Unit = {
    val df = pts.toDF("id", "x", "y")
    val got = Rank.skyline2d(df, "x", "y", nParts = 4)
      .select("id").as[Long].collect().toSet
    assert(got == bruteSkyline(pts), s"pts=$pts")
  }

  test("skyline2d matches brute force on a random cloud") {
    val rnd = new scala.util.Random(42)
    checkSkyline((1 to 200).map(i =>
      (i.toLong, rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)))
  }

  test("skyline2d keeps duplicate frontier points and handles ties") {
    checkSkyline(Seq(
      (1L, 1L, 5L), (2L, 1L, 5L),          // duplicate frontier pair
      (3L, 1L, 7L),                         // tied x, dominated on y
      (4L, 3L, 3L), (5L, 5L, 1L),
      (6L, 5L, 2L),                         // tied x with 5, dominated
      (7L, 9L, 9L)))                        // interior
  }

  test("skyline2d on a strictly increasing chain keeps only the head") {
    checkSkyline((1 to 50).map(i => (i.toLong, i.toLong, i.toLong)))
  }

  test("skyline2d on an anti-chain keeps everything") {
    checkSkyline((1 to 50).map(i => (i.toLong, i.toLong, 51L - i)))
  }

  test("exactPercentiles matches the brute-force discrete definition") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 500).map(_ =>
      (Seq("x", "y", "z")(rnd.nextInt(3)), rnd.nextInt(40).toDouble))
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val got = Rank.exactPercentiles(rows.toDF("g", "v"), col("g"), col("v"),
        ps, nParts = 7)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      def pct(p: Double) = sorted(math.ceil(p * sorted.size).toInt - 1)
      val (n, p50, p90, p99) = got(g)
      assert(n == grp.size.toLong)
      assert((p50, p90, p99) == (pct(0.5), pct(0.9), pct(0.99)), s"group $g")
    }
  }

  test("exactPercentiles: a single-value group reports that value everywhere") {
    val df = ((1 to 20).map(_ => ("a", 7.0)) :+ (("b", 1.0))).toDF("g", "v")
    val got = Rank.exactPercentiles(df, col("g"), col("v"),
        Seq("p50" -> 0.5, "p99" -> 0.99), nParts = 3)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got("a") == ((7.0, 7.0)) && got("b") == ((1.0, 1.0)))
  }

  test("quantileRank: inclusive ECDF per group, ties share a rank") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0),
      ("b", 3.0), ("b", 3.0)).toDF("g", "v")
    val got = Rank.quantileRank(df, col("g"), col("v"), nParts = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    assert(got(("a", 1.0)) == 0.25)
    assert(got(("a", 2.0)) == 0.75) // cum includes the whole tie group
    assert(got(("a", 5.0)) == 1.0)
    assert(got(("b", 3.0)) == 1.0)
    // row multiplicity preserved
    assert(Rank.quantileRank(df, col("g"), col("v"), nParts = 3).count() == 6)
  }

  test("winsorizedStats matches a brute-force replay with outliers") {
    val rnd = new scala.util.Random(5)
    val vals = (1 to 97).map(_ => rnd.nextInt(1000) / 100.0) ++
      Seq(9999.99, -9999.99, 5000.0) // outliers the clamp must absorb
    val df = vals.map(("a", _)).toDF("g", "v")
    val r = Rank.winsorizedStats(df, col("g"), col("v"), 0.05, 0.95, nParts = 4)
      .collect()(0)
    // brute: discrete percentile = smallest v with cum count >= ceil(p*n)
    val sorted = vals.sorted
    def pct(p: Double): Double = sorted(math.ceil(p * sorted.size).toInt - 1)
    val (lo, hi) = (pct(0.05), pct(0.95))
    assert(r.getDouble(2) == lo && r.getDouble(3) == hi)
    def rnd6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val winMean = rnd6(vals.map(v => BigDecimal(math.min(math.max(v, lo), hi))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / vals.size)
    val inBand = vals.filter(v => v >= lo && v <= hi)
    val trimMean = rnd6(inBand.map(BigDecimal(_)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / inBand.size)
    assert(r.getDouble(4) == winMean)
    assert(r.getDouble(5) == trimMean)
    assert(r.getLong(6) == inBand.size.toLong)
    // the clamp really bit: plain mean is dragged, winsorized is not
    assert(math.abs(vals.sum / vals.size) > math.abs(winMean) + 10)
  }
}
