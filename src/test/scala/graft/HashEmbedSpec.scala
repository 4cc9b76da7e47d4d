package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

class HashEmbedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16

  private def embed(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select($"id", TF.tokens(lower(trim($"text"))).as("toks"))
      .select($"id", VF.hashEmbed($"toks", dim).as("v"))
      .as[(Long, Seq[Double])].collect().toMap

  test("bucket counts conserve token mass and dimension") {
    val v = embed(Seq("a b c a b a"))(0L)
    assert(v.length == dim)
    assert(v.sum == 6.0)          // every token lands in exactly one bucket
    assert(v.forall(_ >= 0.0))
  }

  test("embedding is a pure function of the token multiset") {
    val m = embed(Seq("x y z", "x y z", "z y x"))
    assert(m(0L) == m(1L))
    assert(m(0L) == m(2L))        // order-insensitive (counts)
  }

  test("self-cosine is 1; empty-ish text yields the zero-vector guard") {
    val df = Seq((1L, "alpha beta gamma")).toDF("id", "text")
      .select($"id", TF.tokens(lower(trim($"text"))).as("toks"))
      .select($"id", VF.hashEmbed($"toks", dim).as("v"))
    val cos = df.select(round(VF.cosineSimilarity($"v", $"v"), 9)).as[Double].head()
    assert(cos == 1.0)
  }
}
