package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.operators.Rank

/** exactPercentiles must equal the in-memory discrete-percentile
  * definition for ANY data shape and partition count — the slice-offset
  * machinery cannot be allowed to drop or double-count boundary runs
  * (ties spanning a range-partition edge are the classic bug).
  */
class RankPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val gen = for {
    n <- Gen.choose(1, 300)
    nParts <- Gen.choose(1, 9)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0, 12) // heavy ties on purpose
    } yield (g, v.toDouble))
  } yield (rows, nParts)

  test("exactPercentiles equals the sorted-seq definition under ties and any nParts") {
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)
    val prop = Prop.forAll(gen) { case (rows, nParts) =>
      val got = Rank.exactPercentiles(rows.toDF("g", "v"), col("g"), col("v"),
          ps, nParts = nParts)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      rows.groupBy(_._1).forall { case (g, grp) =>
        val sorted = grp.map(_._2).sorted
        def pct(p: Double) = sorted(math.ceil(p * sorted.size).toInt - 1)
        got(g) == ((grp.size.toLong, pct(0.25), pct(0.5), pct(0.9)))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("weightedPercentiles equals exactPercentiles over the weight-expanded rows") {
    // the defining identity: a row with weight w behaves exactly like
    // w copies of an unweighted row
    val wgen = for {
      n <- Gen.choose(1, 120)
      nParts <- Gen.choose(1, 7)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        v <- Gen.choose(0, 9)
        w <- Gen.choose(1L, 5L)
      } yield (g, v.toDouble, w))
    } yield (rows, nParts)
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)
    val prop = Prop.forAll(wgen) { case (rows, nParts) =>
      val got = Rank.weightedPercentiles(rows.toDF("g", "v", "w"),
          col("g"), col("v"), col("w"), ps, nParts = nParts)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      val expanded = rows.flatMap { case (g, v, w) => Seq.fill(w.toInt)((g, v)) }
      val want = Rank.exactPercentiles(expanded.toDF("g", "v"),
          col("g"), col("v"), ps, nParts = nParts)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
