package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Eval

/** Eval.aucBinary / Eval.ksStatistic against brute-force definitions on
  * small randomized inputs with heavy ties — the distributed
  * prefix-sum machinery must reproduce the textbook statistics exactly.
  */
class EvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Textbook tie-aware AUC: average over all (pos, neg) pairs of
    * [1 if s⁺ > s⁻, ½ if tie, 0 otherwise].
    */
  private def bruteAuc(rows: Seq[(Double, Int)]): Option[Double] = {
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      Some(BigDecimal(wins / (pos.size.toDouble * neg.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  private def runAuc(rows: Seq[(Double, Int)]): (Option[Double], Long, Long) = {
    val r = Eval.aucBinary(rows.toDF("s", "y"), col("s"), col("y") === 1)
      .collect()(0)
    (Option(r.get(0)).map(_.asInstanceOf[Double]),
      r.getLong(1), r.getLong(2))
  }

  test("aucBinary matches the pairwise definition on random ties") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map(_ =>
      (rnd.nextInt(20).toDouble / 4.0, if (rnd.nextBoolean()) 1 else 0))
    val (auc, np, nn) = runAuc(rows)
    assert(np == rows.count(_._2 == 1).toLong)
    assert(nn == rows.count(_._2 == 0).toLong)
    assert(auc == bruteAuc(rows))
  }

  test("aucBinary is 1.0 on perfectly separated scores") {
    val rows = (1 to 50).map(i => (i.toDouble, if (i > 25) 1 else 0))
    assert(runAuc(rows)._1.contains(1.0))
  }

  test("aucBinary is 0.5 when every score ties") {
    val rows = (1 to 40).map(i => (3.14, i % 2))
    assert(runAuc(rows)._1.contains(0.5))
  }

  test("aucBinary is NULL when a class is empty") {
    val rows = (1 to 10).map(i => (i.toDouble, 1))
    val (auc, np, nn) = runAuc(rows)
    assert(auc.isEmpty && np == 10L && nn == 0L)
  }

  /** Brute-force two-sample KS with smallest-value argmax tie-break. */
  private def bruteKs(a: Seq[Double], b: Seq[Double]): (Double, Double) = {
    val xs = (a ++ b).distinct.sorted
    val cand = xs.map { x =>
      val fa = a.count(_ <= x).toLong * b.size
      val fb = b.count(_ <= x).toLong * a.size
      (math.abs(fa - fb), x)
    }
    val mx = cand.map(_._1).max
    val at = cand.filter(_._1 == mx).map(_._2).min
    (BigDecimal(mx.toDouble / (a.size.toDouble * b.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, at)
  }

  test("ksStatistic matches brute force on random discrete samples") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { _ =>
      val g = if (rnd.nextBoolean()) "a" else "b"
      val v = if (g == "a") rnd.nextInt(15).toDouble
              else rnd.nextInt(15).toDouble + (rnd.nextInt(3) - 1)
      (v, g)
    }
    val df = rows.toDF("v", "g")
    val r = Eval.ksStatistic(df, col("v"), col("g") === "a", col("g") === "b")
      .collect()(0)
    val a = rows.filter(_._2 == "a").map(_._1)
    val b = rows.filter(_._2 == "b").map(_._1)
    val (want, wantAt) = bruteKs(a, b)
    assert(r.getDouble(0) == want)
    assert(r.getDouble(1) == wantAt)
    assert(r.getLong(2) == a.size.toLong && r.getLong(3) == b.size.toLong)
  }

  test("liftTable matches a brute-force gain chart with ties") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(12).toDouble, if (rnd.nextInt(3) == 0) 1 else 0))
    val df = rows.toDF("id", "s", "y")
    val got = Eval.liftTable(df, col("s"), col("y") === 1, col("id"), n = 10)
      .orderBy("bucket")
      .select("bucket", "n_rows", "n_pos", "pos_rate", "lift")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // brute: sort by (score desc, id), SQL NTILE bucket algebra
    val sorted = rows.sortBy(r => (-r._2, r._1))
    val t = sorted.size; val q = t / 10; val m = t % 10
    def bucketOf(r0: Int): Long =
      (if (r0 < m * (q + 1)) r0 / (q + 1) else m + (r0 - m * (q + 1)) / q) + 1L
    val byB = sorted.zipWithIndex.groupBy { case (_, i) => bucketOf(i) }
    val totPos = rows.map(_._3).sum.toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (b, nr, np, pr, lift) =>
      val g = byB(b).map(_._1)
      assert(nr == g.size.toLong && np == g.map(_._3).sum.toLong, s"bucket $b")
      assert(pr == r6(np.toDouble / nr))
      assert(lift == r6((np.toDouble / nr) / (totPos / t)))
    }
  }

  test("psiDrift is 0 on identical distributions and totals correctly") {
    // literally identical sides: every value appears 10x in A and 10x in B
    val same = for (v <- -3 to 3; _ <- 1 to 10; side <- Seq(true, false))
      yield (v.toDouble, side)
    val df = same.toDF("v", "inA")
    val r = Eval.psiDrift(df, col("v"), col("inA"), !col("inA"))
      .collect()
    assert(r.length == 11) // dense bin axis -5..5
    assert(r.forall(_.getDouble(6) == 0.0)) // identical halves: psi = 0
    // shares sum to 1 on each side (within 6-dp rounding slack)
    assert(math.abs(r.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    assert(r.map(_.getLong(1)).sum == 70L) // ca total = side-A rows
  }

  test("psiDrift detects a shifted distribution with a positive score") {
    val rows = (1 to 200).map(i =>
      if (i <= 100) (0.0 + i % 2, true) else (3.0 + i % 2, false))
    val r = Eval.psiDrift(rows.toDF("v", "inA"), col("v"),
      col("inA"), !col("inA")).collect()
    assert(r.head.getDouble(6) > 1.0) // gross shift => large PSI
  }

  test("mutualInformation: zero for independence, ln|X| for identity") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // independent: every (x, y) cell equally likely
    val ind = (for (x <- Seq("a", "b"); y <- 0 until 4; _ <- 1 to 5)
      yield (x, y.toDouble)).toDF("x", "v")
    val ri = Eval.mutualInformation(ind, col("x"), col("v"))
    assert(ri.collect().forall(_.getDouble(6) == 0.0))
    // deterministic: y = f(x), two equiprobable symbols => MI = ln 2
    // (up to the documented per-term 6-dp rounding BEFORE the sum:
    // each cell contributes round6(0.5·ln 2))
    val det = (for (x <- Seq("a", "b"); _ <- 1 to 10)
      yield (x, if (x == "a") 1.0 else 2.0)).toDF("x", "v")
    val rd = Eval.mutualInformation(det, col("x"), col("v")).collect()
    val want = r6(2 * r6(0.5 * math.log(2.0)))
    assert(rd.forall(r => r.getDouble(6) == want))
    assert(math.abs(want - math.log(2.0)) < 2e-6)
  }

  test("twoProportionZ matches the textbook pooled z on known counts") {
    // A: 30/100 successes, B: 20/100
    val rows = (1 to 100).map(i => ("a", i <= 30)) ++
      (1 to 100).map(i => ("b", i <= 20))
    val r = graft.operators.Eval.twoProportionZ(rows.toDF("g", "y"),
      col("g") === "a", col("g") === "b", col("y")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((100L, 30L, 100L, 20L)))
    val pp = 50.0 / 200.0
    val want = BigDecimal((0.3 - 0.2) /
        math.sqrt(pp * (1 - pp) * (1.0 / 100 + 1.0 / 100)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(6) == want)
    // degenerate pooled rate (all failures): z must be NULL, not NaN
    val zero = (1 to 50).map(i => (if (i <= 25) "a" else "b", false))
    val r0 = graft.operators.Eval.twoProportionZ(zero.toDF("g", "y"),
      col("g") === "a", col("g") === "b", col("y")).collect()(0)
    assert(r0.isNullAt(6))
  }

  test("ksStatistic is 1.0 on disjoint supports and 0.0 on identical ones") {
    val disjoint = ((1 to 20).map(i => (i.toDouble, "a")) ++
      (1 to 20).map(i => (100.0 + i, "b"))).toDF("v", "g")
    val r1 = Eval.ksStatistic(disjoint, col("v"), col("g") === "a", col("g") === "b")
      .collect()(0)
    assert(r1.getDouble(0) == 1.0 && r1.getDouble(1) == 20.0)
    val same = ((1 to 20) ++ (1 to 20)).zipWithIndex
      .map { case (v, i) => (v.toDouble, if (i < 20) "a" else "b") }.toDF("v", "g")
    val r2 = Eval.ksStatistic(same, col("v"), col("g") === "a", col("g") === "b")
      .collect()(0)
    assert(r2.getDouble(0) == 0.0)
  }

  /** Textbook Spearman: average-tie ranks, then Pearson. */
  private def bruteSpearman(rows: Seq[(Double, Double)]): Option[Double] = {
    def avgRanks(vs: Seq[Double]): Seq[Double] = {
      val sorted = vs.sorted
      val rank = vs.map { v =>
        val below = sorted.count(_ < v)
        val ties = sorted.count(_ == v)
        below + (ties + 1) / 2.0
      }
      rank
    }
    val rx = avgRanks(rows.map(_._1))
    val ry = avgRanks(rows.map(_._2))
    val n = rows.size.toDouble
    val sx = rx.sum; val sy = ry.sum
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val sxx = rx.map(a => a * a).sum
    val syy = ry.map(a => a * a).sum
    val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
    if (vx <= 0 || vy <= 0) None
    else Some(BigDecimal((n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("spearman matches the average-rank definition on random ties") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map(_ =>
      (rnd.nextInt(25).toDouble, rnd.nextInt(12).toDouble))
    val r = Eval.spearman(rows.toDF("x", "y"), col("x"), col("y"))
      .collect()(0)
    assert(r.getLong(0) == 300L)
    val got = Option(r.get(1)).map(_.asInstanceOf[Double])
    val want = bruteSpearman(rows.map { case (a, b) => (a, b) })
    // doubled ranks scale both vectors by 2: correlation unchanged;
    // allow 1 ulp of rounding slack from the different sum orders
    assert(got.isDefined && want.isDefined &&
      math.abs(got.get - want.get) <= 1e-6)
  }

  test("spearman is ±1 on monotone data and NULL on a constant column") {
    val inc = (1 to 50).map(i => (i.toDouble, math.exp(i / 10.0)))
    val r1 = Eval.spearman(inc.toDF("x", "y"), col("x"), col("y")).collect()(0)
    assert(r1.getDouble(1) == 1.0)
    val dec = (1 to 50).map(i => (i.toDouble, -i * 3.0))
    val r2 = Eval.spearman(dec.toDF("x", "y"), col("x"), col("y")).collect()(0)
    assert(r2.getDouble(1) == -1.0)
    val const = (1 to 20).map(i => (i.toDouble, 7.0))
    val r3 = Eval.spearman(const.toDF("x", "y"), col("x"), col("y")).collect()(0)
    assert(r3.isNullAt(1))
  }

  test("gini: 0 on perfect equality, (n-1)/n on total concentration, " +
      "scale-invariant, matches brute force with ties") {
    def run(xs: Seq[Long]): (Long, Long, Option[Double]) = {
      val r = Eval.gini(xs.map(Tuple1(_)).toDF("x"), col("x")).collect()(0)
      (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))
    }
    assert(run(Seq.fill(10)(7L)) == ((10L, 70L, Some(0.0))))
    val (n1, t1, g1) = run(0L +: Seq.fill(19)(0L) :+ 100L)
    assert(n1 == 21L && t1 == 100L &&
      g1.contains(BigDecimal(20.0 / 21)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(run(Seq(0L, 0L, 0L)) == ((3L, 0L, None))) // Σx = 0 → NULL
    // brute force (tie-aware mean absolute difference form):
    // G = Σᵢⱼ|xᵢ−xⱼ| / (2n²·mean)
    val rnd = new scala.util.Random(31)
    val xs = (1 to 80).map(_ => rnd.nextInt(50).toLong)
    val brute = {
      val diffs = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum.toDouble
      BigDecimal(diffs / (2.0 * xs.size * xs.size * (xs.sum.toDouble / xs.size)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = run(xs)._3.get
    assert(math.abs(got - brute) <= 1e-6)
    // integer scaling leaves G unchanged
    assert(run(xs.map(_ * 7))._3.get == got)
  }

  test("averagePrecision matches the textbook definition on random data") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 200).map(i =>
      (rnd.nextInt(40).toDouble, rnd.nextInt(5) == 0, i.toLong))
    val r = Eval.averagePrecision(rows.toDF("s", "y", "tb"),
      col("s"), col("y"), col("tb")).collect()(0)
    // brute: sort by (score desc, tb asc); AP = mean over positives of
    // (positives so far)/(rank), each term rounded to 6 dp
    val sorted = rows.sortBy { case (s, _, tb) => (-s, tb) }
    var seen = 0
    val terms = sorted.zipWithIndex.collect { case ((_, true, _), i) =>
      seen += 1
      BigDecimal(seen.toDouble / (i + 1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val want = BigDecimal(terms.sum.toDouble / terms.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == terms.size.toLong)
    assert(r.getDouble(1) == want)
  }

  test("averagePrecision is 1.0 when all positives rank first, NULL with " +
      "no positives") {
    val perfect = (1 to 30).map(i => (100.0 - i, i <= 10, i.toLong))
    val r1 = Eval.averagePrecision(perfect.toDF("s", "y", "tb"),
      col("s"), col("y"), col("tb")).collect()(0)
    assert(r1.getLong(0) == 10L && r1.getDouble(1) == 1.0)
    val none = (1 to 10).map(i => (i.toDouble, false, i.toLong))
    val r0 = Eval.averagePrecision(none.toDF("s", "y", "tb"),
      col("s"), col("y"), col("tb")).collect()(0)
    assert(r0.getLong(0) == 0L && r0.isNullAt(1))
  }

  test("meanNdcgBinary matches a hand-computed fixture") {
    def d(i: Int): BigDecimal =
      BigDecimal(1.0 / (math.log(i + 1) / math.log(2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // q1: positives at ranks 1 and 3 of 4 (2 positives total) →
    //   DCG = d(1)+d(3), IDCG = d(1)+d(2)
    // q2: positive at rank 2 of 2 (1 positive) → DCG = d(2), IDCG = d(1)
    // q3: no positives → excluded
    val rows = Seq(
      ("q1", 9.0, 1, 1L), ("q1", 8.0, 0, 2L), ("q1", 7.0, 1, 3L), ("q1", 6.0, 0, 4L),
      ("q2", 5.0, 0, 5L), ("q2", 4.0, 1, 6L),
      ("q3", 3.0, 0, 7L))
    val r = Eval.meanNdcgBinary(rows.toDF("q", "s", "rel", "tb"),
      col("q"), col("s"), col("rel") === 1, col("tb"), k = 10).collect()(0)
    assert(r.getLong(0) == 2L)
    def rnd6(x: BigDecimal): BigDecimal =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val n1 = rnd6((d(1) + d(3)) / (d(1) + d(2)))
    val n2 = rnd6(d(2) / d(1))
    val want = rnd6((n1 + n2) / 2).toDouble
    assert(r.getDouble(1) == want)
  }

  test("meanNdcgBinary is 1.0 when every positive ranks first") {
    val rows = Seq(
      ("a", 9.0, 1, 1L), ("a", 1.0, 0, 2L),
      ("b", 8.0, 1, 3L), ("b", 2.0, 0, 4L))
    val r = Eval.meanNdcgBinary(rows.toDF("q", "s", "rel", "tb"),
      col("q"), col("s"), col("rel") === 1, col("tb")).collect()(0)
    assert(r.getLong(0) == 2L && r.getDouble(1) == 1.0)
  }

  test("eval statistics release intermediate persists (only the final " +
      "projection stays pinned)") {
    val df = (1 to 200).map(i =>
      (i.toDouble % 17, if (i % 3 == 0) "a" else "b")).toDF("v", "g")
    val before = spark.sparkContext.getPersistentRDDs.size
    val ks = Eval.ksStatistic(df, col("v"), col("g") === "a", col("g") === "b")
    ks.collect()
    // ksStatistic persists two intermediates (range-partitioned counts,
    // ECDF relation); both must be released, leaving exactly the pinned
    // one-row result
    assert(spark.sparkContext.getPersistentRDDs.size == before + 1)
    ks.unpersist()
    val psi = Eval.psiDrift(df, col("v"), col("g") === "a", col("g") === "b")
    psi.collect()
    assert(spark.sparkContext.getPersistentRDDs.size == before + 1)
    psi.unpersist()
    val mi = Eval.mutualInformation(df, col("g"), col("v"))
    mi.collect()
    assert(spark.sparkContext.getPersistentRDDs.size == before + 1)
    mi.unpersist()
    assert(spark.sparkContext.getPersistentRDDs.size == before)
    // averagePrecision runs globalIds TWICE — both range-partition pins
    // must release (the round-7 review's leak)
    val scored = (1 to 200).map(i =>
      (i.toDouble % 23, i % 3 == 0, i.toLong)).toDF("s", "y", "id")
    val ap = Eval.averagePrecision(scored, col("s"), col("y"), col("id"))
    ap.collect()
    assert(spark.sparkContext.getPersistentRDDs.size == before + 1)
    ap.unpersist()
    assert(spark.sparkContext.getPersistentRDDs.size == before)
  }

  test("centroidDrift: orthogonal and identical centroids, exact geometry") {
    // label 0 → centroid (1,0); label 1 → centroid (0,1); label 2 ==
    // label 0's centroid from twice the mass (scale invariance)
    val rows = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(1.0f, 0.0f)),
      (1, Seq(0.0f, 1.0f)),
      (2, Seq(1.0f, 0.0f)), (2, Seq(1.0f, 0.0f)),
      (2, Seq(1.0f, 0.0f)), (2, Seq(1.0f, 0.0f)))
    val out = Eval.centroidDrift(rows.toDF("label", "embedding"),
      "label", "embedding", dim = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out.keySet == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    val (na, nb, cos01, l201) = out((0L, 1L))
    assert(na == 2L && nb == 1L)
    assert(cos01 == 0.0 && l201 == 1.414214) // √2 @ 6 dp
    val (_, n2, cos02, l202) = out((0L, 2L))
    assert(n2 == 4L && cos02 == 1.0 && l202 == 0.0,
      "same mean at different mass: cosine 1, distance 0")
  }

  test("centroidDrift is invariant to duplicating every vector") {
    // doubling each label's mass leaves every centroid — hence every
    // cosine/l2 — unchanged; only the counts double (the scale
    // invariance the sums-not-means arithmetic is built on)
    val rnd = new scala.util.Random(11)
    val rows = for (l <- 0 to 3; _ <- 1 to 5) yield
      (l, Seq.fill(8)(rnd.nextFloat() * 2 - 1))
    def run(df: Seq[(Int, Seq[Float])]) =
      Eval.centroidDrift(df.toDF("label", "embedding"),
        "label", "embedding", dim = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    val once = run(rows)
    val twice = run(rows ++ rows)
    assert(once.keySet == twice.keySet)
    once.foreach { case (k, (na, nb, cos, l2)) =>
      val (na2, nb2, cos2, l22) = twice(k)
      assert(na2 == 2 * na && nb2 == 2 * nb)
      assert(cos2 == cos && l22 == l2, s"pair $k drifted under duplication")
    }
  }
}
