package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.Intervals

/** Property: the windowed gaps-and-islands merge equals a naive
  * sequential sweep for arbitrary span sets.
  */
class IntervalsPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naiveMerge(spans: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    val sorted = spans.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for ((s, e) <- sorted) {
      if (out.nonEmpty && s <= out.last._2)
        out(out.size - 1) = (out.last._1, math.max(out.last._2, e), out.last._3 + 1)
      else out += ((s, e, 1L))
    }
    out.toSeq
  }

  private val spanGen = for {
    s <- Gen.choose(0L, 200L)
    len <- Gen.choose(0L, 60L)
  } yield (s, s + len)

  test("mergeOverlapping equals the sequential sweep on random span sets") {
    val prop = Prop.forAll(Gen.nonEmptyListOf(spanGen)) { spans =>
      val got = Intervals.mergeOverlapping(
        spans.map { case (s, e) => ("k", s, e) }.toDF("k", "s", "e"),
        Seq("k"), "s", "e")
        .select($"merged_start", $"merged_end", $"n_spans")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      got == naiveMerge(spans)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
