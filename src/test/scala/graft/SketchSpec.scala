package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketch

/** Count-min sketch: bounded size, the one-sided error guarantee, and
  * the additive-merge property that makes it work across shards.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Zipf-ish skew: key k appears ~ 600/k times
  private def skewed = (1 to 30).flatMap(k => Seq.fill(600 / k)(k.toLong))

  test("cmsBuild: sketch is bounded by depth x width and counts sum to depth x N") {
    val df = skewed.toDF("k")
    val sk = Sketch.cmsBuild(df, "k", depth = 4, width = 16).collect()
    assert(sk.length <= 4 * 16)
    // every input row lands in exactly one bucket per hash row
    val perRow = sk.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perRow.values.toSet == Set(skewed.size.toLong))
  }

  test("cmsHeavyHitters: estimates never undercount and the top set is exact") {
    val out = Sketch.cmsHeavyHitters(skewed.toDF("k"), "k",
      depth = 4, width = 16, topN = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 10)
    // top-10 by exact count = keys 1..10 (counts strictly decrease in k)
    assert(out.map(_._1).sorted.toSeq == (1L to 10L).toSeq)
    out.foreach { case (k, exact, est, over) =>
      assert(exact == 600 / k)
      assert(est >= exact, s"CMS undercounted key $k")
      assert(over == est - exact && over >= 0)
    }
  }

  test("cms merges: sketch(a ++ b) = bucketwise sum of sketch(a) + sketch(b)") {
    val (a, b) = skewed.splitAt(skewed.size / 2)
    def toMap(xs: Seq[Long]) =
      Sketch.cmsBuild(xs.toDF("k"), "k", depth = 3, width = 8).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = toMap(skewed)
    val merged = (toMap(a).toSeq ++ toMap(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(whole == merged)
  }

  test("heavy hitters is deterministic across runs and tie-broken by key") {
    val ties = (1L to 6L).flatMap(k => Seq.fill(5)(k)) // all counts equal
    val out = Sketch.cmsHeavyHitters(ties.toDF("k"), "k", topN = 3)
      .collect().map(_.getLong(0))
    assert(out.sorted.sameElements(Array(1L, 2L, 3L))) // smallest keys win ties
    val again = Sketch.cmsHeavyHitters(ties.toDF("k"), "k", topN = 3)
      .collect().map(_.getLong(0))
    assert(out.sorted.sameElements(again.sorted))
  }

  // ---- HyperLogLog -------------------------------------------------

  test("hllRegisters: bounded by m per group, rho within [1, wbits+1]") {
    val df = (1L to 500L).map(i => ("g" + (i % 2), i)).toDF("g", "k")
    val regs = Sketch.hllRegisters(df, "g", "k", m = 64).collect()
    assert(regs.length <= 2 * 64)
    regs.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) < 64) // bucket
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 55) // register
    }
  }

  test("hll estimate lands within the expected error band of exact") {
    // m=64 → standard error ~1.04/sqrt(64) = 13%; assert a generous 3σ
    val df = (1L to 1000L).map(i => ("g", i * 7919)).toDF("g", "k")
    val out = Sketch.hllDistinctReport(df, "g", "k", m = 64)
      .filter(col("g") === "g").collect()
    assert(out.length == 1)
    val (exact, approx) = (out(0).getLong(1), out(0).getDouble(2))
    assert(exact == 1000L)
    assert(math.abs(approx - exact) / exact < 0.4,
      s"HLL estimate $approx too far from $exact")
  }

  test("hll merge: union registers = element-wise max of part registers") {
    val a = (1L to 300L).map(("x", _)).toDF("g", "k")
    val b = (200L to 500L).map(("x", _)).toDF("g", "k")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      Sketch.hllRegisters(df, "g", "k", m = 32).collect()
        .map(r => r.getInt(1) -> r.getInt(2)).toMap
    val whole = toMap(a.union(b))
    val merged = (toMap(a).toSeq ++ toMap(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(whole == merged)
  }

  test("hll '__all__' row merges the per-group registers, not re-reads") {
    // two groups over the SAME key set: per-group estimates equal the
    // merged one (registers identical), and exact __all__ = 100
    val df = (1L to 100L).flatMap(i => Seq(("a", i), ("b", i))).toDF("g", "k")
    val rows = Sketch.hllDistinctReport(df, "g", "k", m = 64).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet == Set("a", "b", "__all__"))
    assert(rows("__all__")._1 == 100L && rows("a")._1 == 100L)
    assert(rows("__all__")._2 == rows("a")._2 && rows("a")._2 == rows("b")._2)
  }

  test("hllOverlapReport: identical segments estimate intersect ≈ union") {
    // a == b keyset ⇒ union registers = single registers ⇒
    // approx_intersect = 2e − e = e = approx_union, exact = 200
    val df = (1L to 200L).flatMap(i => Seq(("a", i), ("b", i))).toDF("g", "k")
    val r = Sketch.hllOverlapReport(df, "g", "k", m = 64).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "a" && row.getString(1) == "b")
    assert(row.getLong(2) == 200L)
    assert(row.getDouble(3) == row.getDouble(4),
      "identical segments: intersect estimate must equal union estimate")
  }

  test("hllOverlapReport: disjoint and partial overlaps, every pair present") {
    // a: 1..300, b: 201..500 (overlap 100), c: 1000..1299 (disjoint)
    val df = ((1L to 300L).map(("a", _)) ++ (201L to 500L).map(("b", _)) ++
      (1000L to 1299L).map(("c", _))).toDF("g", "k")
    val rows = Sketch.hllOverlapReport(df, "g", "k", m = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(rows(("a", "b"))._1 == 100L)
    assert(rows(("a", "c"))._1 == 0L && rows(("b", "c"))._1 == 0L)
    // m=64 standard error ~13%; allow 3σ on the 500-key union
    assert(math.abs(rows(("a", "b"))._2 - 500.0) < 200.0)
    // estimated intersect within additive sketch error of exact
    assert(math.abs(rows(("a", "b"))._3 - 100.0) < 250.0)
    rows.values.foreach { case (_, u, i) =>
      assert(i >= 0.0 && u > 0.0, "intersect clamped at 0, union positive")
    }
  }
}
