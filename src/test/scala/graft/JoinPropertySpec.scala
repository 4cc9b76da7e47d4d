package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.{AsOfJoin, RangeJoin}

/** Property-based checks for the composed join operators: random
  * inputs against naive in-memory models (the joins are windows/bucket
  * tricks whose models are one-liners).
  */
class JoinPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(30)

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("asOf equals naive newest-at-or-before for random keyed streams") {
    val genLeft = Gen.listOfN(25, for {
      k <- Gen.choose(1, 4); ts <- Gen.choose(0L, 40L)
    } yield (k, ts))
    val genRight = Gen.listOfN(15, for {
      k <- Gen.choose(1, 4); ts <- Gen.choose(0L, 40L); tag <- Gen.choose(0L, 1000L)
    } yield (k, ts, tag))
    check(Prop.forAll(genLeft, genRight) { (l0, r0) =>
      val l = l0.zipWithIndex.map { case ((k, ts), i) => (k, i.toLong, ts) }
      // unique (k, ts, tag) triples; tiebreak on tag makes ties defined
      val r = r0.distinct
      // sorted Seq, not Map: a join-multiplication regression must fail
      val got = AsOfJoin.asOf(
        l.toDF("k", "lid", "ts"), r.toDF("k", "ts", "tag"),
        Seq("k"), "ts", "ts", rightTiebreak = Seq("tag"))
        .select($"lid", $"right_tag").as[(Long, Option[Long])].collect()
        .sortBy(_._1).toSeq
      val want = l.map { case (k, lid, ts) =>
        val m = r.filter(x => x._1 == k && x._2 <= ts)
        lid -> (if (m.isEmpty) None
                else Some(m.maxBy(x => (x._2, x._3))._3))
      }.sortBy(_._1)
      got == want
    })
  }

  test("pointInInterval equals naive cross-filter for random intervals and widths") {
    val genPts = Gen.listOfN(20, for {
      k <- Gen.choose(1, 3); v <- Gen.choose(-50L, 50L)
    } yield (k, v))
    val genIvs = Gen.listOfN(10, for {
      k <- Gen.choose(1, 3); lo <- Gen.choose(-50L, 50L); span <- Gen.choose(0L, 30L)
    } yield (k, lo, lo + span))
    val genW = Gen.choose(1L, 25L)
    check(Prop.forAll(genPts, genIvs, genW) { (p0, ivs0, w) =>
      val pts = p0.zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v) }
      val ivs = ivs0.zipWithIndex.map { case ((k, lo, hi), i) => (k, 100L + i, lo, hi) }
      val got = RangeJoin.pointInInterval(
        pts.toDF("k", "pid", "v"), ivs.toDF("k", "iid", "lo", "hi"),
        "v", "lo", "hi", bucketWidth = w, keys = Seq("k"))
        .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
      val want = (for {
        (pk, pid, v) <- pts
        (ik, iid, lo, hi) <- ivs
        if pk == ik && v >= lo && v <= hi
      } yield (pid, iid)).sorted
      got == want
    })
  }
}
