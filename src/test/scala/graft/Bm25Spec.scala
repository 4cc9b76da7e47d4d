package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus

class Bm25Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark filler filler"),
    (2L, "spark filler filler filler filler"),
    (3L, "filler filler filler filler filler"),
    (4L, "spark merge")
  ).toDF("doc_id", "text")

  private lazy val out = Corpus.bm25(docs, Seq("spark", "merge"))
    .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
    .toMap

  test("doc with no query terms scores zero") {
    assert(out(3L) == ((5L, 0L, 0.0)))
  }

  test("higher tf scores higher at equal length; more matched terms add up") {
    assert(out(1L)._3 > out(2L)._3)       // tf saturation still monotone
    assert(out(4L)._2 == 2L)              // both terms hit
    assert(out(4L)._3 > out(2L)._3)       // two rare terms + shorter doc
  }

  test("dl and n_hit are reported per document") {
    assert(out(1L)._1 == 5L && out(1L)._2 == 1L)
    assert(out(4L)._1 == 2L)
  }
}
