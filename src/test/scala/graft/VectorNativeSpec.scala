package graft

import scala.util.Random

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{vecnative, VectorFunctions}

/** Pins the native vector kernels to the higher-order-function fold
  * forms they replaced: same IEEE fold order, same casts, same
  * zero-denominator and null semantics — bit-identical outputs, not
  * just approximately equal. The kernels exist purely for execution
  * shape (one codegen'd JVM loop instead of interpreted lambda folds);
  * any value drift here would silently break oracle parity.
  */
class VectorNativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the old composable forms, kept here as the reference semantics
  private def foldDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
  private def foldNorm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
  private def foldCosine(a: Column, b: Column): Column = {
    val denom = foldNorm(a) * foldNorm(b)
    when(denom === 0.0, lit(0.0)).otherwise(foldDot(a, b) / denom)
  }
  private def foldBucket(v: Column, dim: Int, bits: Int, seed: Long): Column = {
    def comp(b: Int, j: Int): Double = {
      var z = seed + b.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      if ((z & 1L) == 0L) 1.0 else -1.0
    }
    (0 until bits).map { b =>
      val comps = Array.tabulate(dim)(j => comp(b, j))
      val dot = aggregate(zip_with(v, lit(comps), (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _).cast("int")
  }

  private def randFloats(rnd: Random, n: Int): Seq[Float] =
    Seq.fill(n)((rnd.nextFloat() * 2 - 1) * (if (rnd.nextBoolean()) 10 else 0.01f))

  test("cosine and dot kernels are bit-identical to the fold forms (float and double)") {
    val rnd = new Random(3)
    val rows = (1L to 300L).map(i => (i, randFloats(rnd, 16), randFloats(rnd, 16))) ++
      Seq((301L, Seq.fill(16)(0.0f), randFloats(rnd, 16))) // zero vector → cosine 0.0
    val df = rows.toDF("id", "a", "b").persist()
    val cosDiff = df.select(
      (vecnative.cosine_sim(col("a"), col("b")) === foldCosine(col("a"), col("b")))
        .as("eq")).filter(!col("eq")).count()
    assert(cosDiff == 0, "cosine kernel drifted from the fold form")
    val dotDiff = df.select(
      (vecnative.dot_product(col("a"), col("b")) === foldDot(col("a"), col("b")))
        .as("eq")).filter(!col("eq")).count()
    assert(dotDiff == 0, "dot kernel drifted from the fold form")
    // double arrays (the rounded-vector convention) too
    val dd = df.select(col("id"),
      transform(col("a"), x => round(x.cast("double"), 6)).as("a"),
      transform(col("b"), x => round(x.cast("double"), 6)).as("b"))
      .select((vecnative.cosine_sim(col("a"), col("b")) ===
        foldCosine(col("a"), col("b"))).as("eq")).filter(!col("eq")).count()
    assert(dd == 0, "double-array cosine kernel drifted")
    df.unpersist()
  }

  test("hyperplane bucket kernel matches the per-bit fold form across seeds") {
    val rnd = new Random(5)
    val rows = (1L to 200L).map(i => (i, randFloats(rnd, 64)))
    val df = rows.toDF("id", "v")
    for (seed <- Seq(42L, 43L, 99L); bits <- Seq(8, 10)) {
      val n = df.select(
        (vecnative.hyperplane_bucket(col("v"), 64, bits, seed) ===
          foldBucket(col("v"), 64, bits, seed)).as("eq")).filter(!col("eq")).count()
      assert(n == 0, s"bucket kernel drift at seed=$seed bits=$bits")
    }
  }

  test("pq encode kernel matches the least-of-struct argmin trees") {
    val rnd = new Random(7)
    val m = 4; val sub = 4; val subK = 6
    val cents: Array[Array[Array[Double]]] = Array.fill(m, subK, sub)(rnd.nextDouble() * 2 - 1)
    // reference: the old per-subspace least(struct(round(l2sq), t)) form
    def l2sq(a: Column, c: Seq[Double]): Column =
      aggregate(zip_with(a, typedlit(c), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val refCodes = array((0 until m).map { j =>
      val sl = slice(col("v"), j * sub + 1, sub)
      val ss = cents(j).toSeq.zipWithIndex.map { case (cv, t) =>
        struct(round(l2sq(sl, cv.toSeq), 6).as("d"), lit(t).as("t"))
      }
      least(ss: _*).getField("t")
    }: _*)
    // include exact-tie rows (vector equidistant between two centroids)
    // by duplicating a centroid: argmin must take the LOWEST index
    val tieCents = cents.map(_.clone()); tieCents(0)(3) = tieCents(0)(1).clone()
    val rows = (1L to 200L).map(i => (i, Seq.fill(m * sub)(
      math.rint((rnd.nextDouble() * 2 - 1) * 1e6) / 1e6)))
    val df = rows.toDF("id", "v")
    val drift = df.select(
      (vecnative.pq_encode(col("v"), cents) === refCodes).as("eq"))
      .filter(!col("eq")).count()
    assert(drift == 0, "pq encode kernel drifted from the argmin trees")
    val tieRef = array((0 until m).map { j =>
      val sl = slice(col("v"), j * sub + 1, sub)
      val ss = tieCents(j).toSeq.zipWithIndex.map { case (cv, t) =>
        struct(round(l2sq(sl, cv.toSeq), 6).as("d"), lit(t).as("t"))
      }
      least(ss: _*).getField("t")
    }: _*)
    val tieDrift = df.select(
      (vecnative.pq_encode(col("v"), tieCents) === tieRef).as("eq"))
      .filter(!col("eq")).count()
    assert(tieDrift == 0, "pq encode tie-break drifted (lowest index must win)")
  }
}
