package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopK

class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("heap top-k equals window top-k, including ties and short groups") {
    val rows = Seq(
      ("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 9.0), ("a", 4L, 1.0), ("a", 5L, 7.0),
      ("b", 6L, 2.0), // group smaller than k
      ("c", 7L, 3.0), ("c", 8L, 3.0), ("c", 9L, 3.0), ("c", 10L, 3.0)) // all tied
    val df = rows.toDF("g", "tag", "score")

    val got = TopK.topKPerGroup(df, Seq("g"), "score", "tag", k = 3)
      .select($"g", $"tag", $"score", $"rank")
      .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq

    val w = Window.partitionBy($"g").orderBy($"score".desc, $"tag".asc)
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"g", $"tag", $"score", $"rank")
      .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq

    assert(got == want)
  }

  test("NULL scores are ignored, never fabricated as 0.0") {
    val df = Seq(("a", 1L, Some(-5.0)), ("a", 2L, None), ("a", 3L, Some(7.0)))
      .toDF("g", "tag", "score")
    val got = TopK.topKPerGroup(df, Seq("g"), "score", "tag", k = 3)
      .select($"tag", $"score", $"rank").as[(Long, Double, Long)]
      .collect().sortBy(_._3).toSeq
    assert(got == Seq((3L, 7.0, 1L), (1L, -5.0, 2L))) // null row absent
  }

  test("partial aggregation bounds state: 10k rows, one group, k=5") {
    val df = spark.range(0, 10000).select(
      lit("g").as("g"), col("id").as("tag"),
      (col("id") % 997).cast("double").as("score"))
    val got = TopK.topKPerGroup(df, Seq("g"), "score", "tag", k = 5)
      .select($"tag", $"score", $"rank")
      .as[(Long, Double, Long)].collect().sortBy(_._3).toSeq
    // max score 996 at tags 996, 1993, ... — smallest tag wins ties
    assert(got.map(_._2) == Seq(996.0, 996.0, 996.0, 996.0, 996.0))
    assert(got.map(_._1) == Seq(996L, 1993L, 2990L, 3987L, 4984L))
  }

  // The subtle boundary is `ord.lt(e, h.head)` replace-on-tie inside
  // push(): a tie with the heap's weakest entry must replace iff the
  // newcomer's TAG is smaller, and the property must survive heap
  // MERGES at partition boundaries (round-7 advice) — hence many
  // partitions and heavy score ties.
  test("property: heap top-k equals window top-k for tie-heavy multisets, all k") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        s <- Gen.choose(0, 4) // 5 distinct scores => constant ties
        t <- Gen.choose(0L, 500L)
      } yield (g, t, s.toDouble))
    } yield rows.distinctBy(r => (r._1, r._2)) // tag unique per group
    val prop = Prop.forAll(gen.suchThat(_.nonEmpty), Gen.choose(1, 6)) { (rows, k) =>
      {
        val df = rows.toDF("g", "tag", "score").repartition(7)
        val got = TopK.topKPerGroup(df, Seq("g"), "score", "tag", k)
          .select($"g", $"tag", $"score", $"rank")
          .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
        val w = Window.partitionBy($"g").orderBy($"score".desc, $"tag".asc)
        val want = df.withColumn("rank", row_number().over(w).cast("long"))
          .filter($"rank" <= k)
          .select($"g", $"tag", $"score", $"rank")
          .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
        got == want
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(r.passed, r.status.toString)
  }

  test("NaN scores are excluded, not crowned rank 1; string tags fail fast") {
    val df = Seq(("a", 1L, 5.0), ("a", 2L, Double.NaN), ("a", 3L, 7.0))
      .toDF("g", "tag", "score")
    val got = TopK.topKPerGroup(df, Seq("g"), "score", "tag", k = 2)
      .select($"tag", $"rank").as[(Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq(3L -> 1L, 1L -> 2L),
      s"NaN must not enter the heap (TotalOrdering ranks it FIRST): $got")
    val strTags = Seq(("a", "doc_1", 5.0)).toDF("g", "tag", "score")
    intercept[IllegalArgumentException] {
      TopK.topKPerGroup(strTags, Seq("g"), "score", "tag", k = 1)
    }
  }
}
