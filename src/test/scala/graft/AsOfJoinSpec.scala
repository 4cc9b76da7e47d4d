package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(left: Seq[(String, Long, Long)],
                    right: Seq[(String, Long, String)]) =
    left.map { case (k, lid, lts) =>
      val m = right.filter(r => r._1 == k && r._2 <= lts)
      (lid, if (m.isEmpty) null else m.maxBy(_._2)._3)
    }

  test("asOf picks the newest right row at-or-before each left ts; no match -> null") {
    val left = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 5L), // 5L precedes any right row
      ("b", 4L, 100L), ("c", 5L, 50L))               // c has no right rows
    val right = Seq(
      ("a", 10L, "r10"), ("a", 15L, "r15"),
      ("b", 100L, "r100"), ("b", 90L, "r90"))        // exact-ts match visible (>=)

    val got = AsOfJoin.asOf(
      left.toDF("k", "lid", "ts"), right.toDF("k", "ts", "tag"),
      Seq("k"), "ts", "ts")
      .select($"lid", $"right_tag").as[(Long, Option[String])].collect()
      .map { case (i, t) => (i, t.orNull) }.sortBy(_._1).toSeq

    assert(got == naive(left, right).sortBy(_._1))
  }

  test("tied right rows resolve deterministically via rightTiebreak (greatest wins)") {
    val left = Seq(("k", 1L, 10L)).toDF("k", "lid", "ts")
    val right = Seq(("k", 10L, "t1"), ("k", 10L, "t9"), ("k", 10L, "t5"))
      .toDF("k", "ts", "tag")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts",
      rightTiebreak = Seq("tag"))
      .select($"right_tag").as[String].collect().toSeq
    assert(got == Seq("t9"))
  }

  test("forward direction picks the earliest right row at-or-after each left ts") {
    val left = Seq(
      ("a", 1L, 10L), ("a", 2L, 16L), ("a", 3L, 15L), // 15L hits r15 exactly (<=)
      ("b", 4L, 101L), ("c", 5L, 50L))                // b past last right; c empty
    val right = Seq(
      ("a", 10L, "r10"), ("a", 15L, "r15"),
      ("b", 100L, "r100"), ("b", 90L, "r90"))
    val naiveFwd = left.map { case (k, lid, lts) =>
      val m = right.filter(r => r._1 == k && r._2 >= lts)
      (lid, if (m.isEmpty) null else m.minBy(_._2)._3)
    }
    val got = AsOfJoin.asOf(
      left.toDF("k", "lid", "ts"), right.toDF("k", "ts", "tag"),
      Seq("k"), "ts", "ts", direction = "forward")
      .select($"lid", $"right_tag").as[(Long, Option[String])].collect()
      .map { case (i, t) => (i, t.orNull) }.sortBy(_._1).toSeq
    assert(got == naiveFwd.sortBy(_._1))
  }

  test("left rows and row count are preserved exactly (left-outer semantics)") {
    val left = (1L to 100L).map(i => ("k", i, i))
    val right = Seq(("k", 50L, "mid"))
    val out = AsOfJoin.asOf(left.toDF("k", "lid", "ts"),
      right.toDF("k", "ts", "tag"), Seq("k"), "ts", "ts")
    assert(out.count() == 100)
    assert(out.filter($"right_tag".isNotNull).count() == 51) // ts 50..100
  }
}
