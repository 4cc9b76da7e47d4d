package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

/** Power-iteration PC1: recovers a planted dominant direction and is
  * bit-deterministic across runs (the exact-decimal aggregate makes
  * the fit independent of partitioning).
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16

  test("fitPc1 recovers a planted dominant direction") {
    val rnd = new Random(7)
    val u = {
      val raw = Seq.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    // strong signal along u, weak isotropic noise
    val rows = (1L to 300L).map { i =>
      val c = rnd.nextGaussian() * 10.0
      (i, u.map(_ * c).zip(Seq.fill(dim)(rnd.nextGaussian() * 0.1)).map(t => t._1 + t._2))
    }
    val df = rows.toDF("vec_id", "embedding")
    val v = Pca.fitPc(df, "embedding", "vec_id", dim, iters = 4)
    val align = math.abs(v.zip(u).map(t => t._1 * t._2).sum)
    assert(align > 0.99, s"|v.u| = $align")
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-4, "direction not unit")
  }

  test("pcaScores' deflated second component recovers the second planted axis") {
    val rnd = new Random(23)
    def unit(raw: Seq[Double]) = {
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val u1 = unit(Seq.fill(dim)(rnd.nextGaussian()))
    // Gram-Schmidt a second axis orthogonal to u1
    val u2 = {
      val raw = Seq.fill(dim)(rnd.nextGaussian())
      val p = raw.zip(u1).map(t => t._1 * t._2).sum
      unit(raw.zip(u1).map(t => t._1 - p * t._2))
    }
    // variance 10 along u1, 3 along u2, 0.05 noise
    val rows = (1L to 400L).map { i =>
      val a = rnd.nextGaussian() * 10.0
      val b = rnd.nextGaussian() * 3.0
      (i, (0 until dim).map(j => a * u1(j) + b * u2(j) + rnd.nextGaussian() * 0.05))
    }
    val df = rows.toDF("vec_id", "embedding")
    val d1 = Pca.fitPc(df, "embedding", "vec_id", dim, iters = 4)
    val d2 = Pca.fitPc(df, "embedding", "vec_id", dim, iters = 4, Seq(d1))
    assert(math.abs(d2.zip(u2).map(t => t._1 * t._2).sum) > 0.99,
      "pc2 missed the second planted axis")
    assert(math.abs(d2.zip(d1).map(t => t._1 * t._2).sum) < 0.01,
      "pc2 not orthogonal to pc1")
    val out = Pca.pcaScores(df, "embedding", "vec_id", dim, iters = 4)
    assert(out.columns.toSeq == Seq("vec_id", "pc1", "pc2"))
    assert(out.count() == 400)
  }

  test("pc1Scores is deterministic and scores scale with the planted coefficient") {
    val rnd = new Random(11)
    val u = {
      val raw = Seq.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val coef = (1L to 100L).map(i => i -> (if (i % 2 == 0) i.toDouble else -i.toDouble))
    val df = coef.map { case (i, c) => (i, u.map(_ * c)) }.toDF("vec_id", "embedding")
    val s1 = Pca.pc1Scores(df, "embedding", "vec_id", dim, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s2 = Pca.pc1Scores(df, "embedding", "vec_id", dim, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s1 == s2, "fit not deterministic")
    // rank-1 data: |score| must equal |coefficient| (up to rounding)
    coef.foreach { case (i, c) =>
      assert(math.abs(math.abs(s1(i)) - math.abs(c)) < 1e-2, s"id $i: ${s1(i)} vs $c")
    }
    // sign consistency: scores of same-sign coefficients share a sign
    val pos = coef.filter(_._2 > 0).map(x => s1(x._1))
    assert(pos.forall(_ > 0) || pos.forall(_ < 0))
  }
}
