package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.CdcOps

/** Property-based check (FIXTURES.md F5): the merged table equals a
  * sequential in-memory fold of the same events — the merge is a LWW
  * map, so the model is a few lines.
  */
class LwwPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  case class Ev(offset: Long, tsSec: Int, op: String, key: Int, v: Option[String])

  private val genEv: Gen[(Int, String, Int, Option[String])] = for {
    t <- Gen.choose(0, 50) // deliberate duplicate timestamps
    op <- Gen.frequency(3 -> Gen.oneOf("c", "r"), 5 -> Gen.const("u"), 2 -> Gen.const("d"))
    k <- Gen.choose(1, 12) // small key pool → collisions
    v <- Gen.option(Gen.alphaStr.map(_.take(4)))
  } yield (t, op, k, v)

  /** In-memory oracle: fold events sorted by (ts, offset). */
  private def model(events: Seq[Ev]): Map[Int, Option[String]] =
    events.sortBy(e => (e.tsSec, e.offset)).foldLeft(Map.empty[Int, Option[String]]) {
      case (m, e) =>
        if (e.op == "d") m - e.key
        else m + (e.key -> e.v)
    }

  test("foldMerge equals the sequential LWW fold for random event streams") {
    val prop = Prop.forAll(Gen.listOfN(60, genEv)) { raw =>
      val events = raw.zipWithIndex.map { case ((t, op, k, v), i) =>
        Ev(i.toLong, t, op, k, v)
      }
      val df = events
        .map(e => (new Timestamp(e.tsSec * 1000L), e.offset, e.op, "false", e.key, e.v.orNull))
        .toDF("timestamp", "offset", "__op", "__deleted", "key", "v")
      val merged = CdcOps.foldMerge(df, Seq("key"), Seq("timestamp", "offset"))
      val got = merged.collect()
        .map(r => r.getAs[Int]("key") -> Option(r.getAs[String]("v"))).toMap
      got == model(events)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
