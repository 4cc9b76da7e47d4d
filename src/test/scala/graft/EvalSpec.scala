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

  // ---- mannWhitneyU -------------------------------------------------

  /** Textbook U_A = #(a > b) + ½·#(a = b) over all cross pairs. */
  private def bruteU(as: Seq[Double], bs: Seq[Double]): Double =
    (for (a <- as; b <- bs)
      yield if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum

  private def runMwu(rows: Seq[(Double, String)]) = {
    val r = Eval.mannWhitneyU(rows.toDF("v", "g"), col("v"),
      col("g") === "a", col("g") === "b").collect()(0)
    (r.getLong(0), r.getLong(1),
      Option(r.get(2)).map(_.asInstanceOf[Double]),
      Option(r.get(3)).map(_.asInstanceOf[Double]),
      Option(r.get(4)).map(_.asInstanceOf[Double]))
  }

  test("mannWhitneyU matches the pairwise definition on random ties") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map(_ => (rnd.nextInt(15).toDouble / 3.0,
      if (rnd.nextBoolean()) "a" else "b"))
    val as = rows.filter(_._2 == "a").map(_._1)
    val bs = rows.filter(_._2 == "b").map(_._1)
    val (na, nb, u, eff, z) = runMwu(rows)
    assert(na == as.size.toLong && nb == bs.size.toLong)
    val wantU = bruteU(as, bs)
    assert(u.contains(BigDecimal(wantU)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(eff.contains(BigDecimal(wantU / (as.size.toDouble * bs.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(z.isDefined, "tie-corrected z defined on mixed data")
  }

  test("mannWhitneyU: separated samples give effect 1 and positive z, " +
      "all-tied gives NULL z, empty side gives NULL stats") {
    // every a strictly above every b
    val sep = (1 to 20).map(i => (100.0 + i, "a")) ++
      (1 to 30).map(i => (i.toDouble, "b"))
    val (_, _, u, eff, z) = runMwu(sep)
    assert(u.contains(600.0) && eff.contains(1.0) && z.exists(_ > 0))
    // all values identical: U = n₁n₂/2, effect ½, σ = 0 → z NULL
    val tied = (1 to 12).map(i => (5.0, if (i % 2 == 0) "a" else "b"))
    val (_, _, uT, effT, zT) = runMwu(tied)
    assert(uT.contains(18.0) && effT.contains(0.5) && zT.isEmpty)
    // no b rows at all
    val (naE, nbE, uE, _, _) = runMwu((1 to 5).map(i => (i.toDouble, "a")))
    assert(naE == 5L && nbE == 0L && uE.isEmpty)
  }

  // ---- chiSquareIndependence ----------------------------------------

  private def runChi2(rows: Seq[(String, Int)]) = {
    val r = Eval.chiSquareIndependence(rows.toDF("r", "c"),
      col("r"), col("c")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      Option(r.get(4)).map(_.asInstanceOf[Double]),
      Option(r.get(5)).map(_.asInstanceOf[Double]))
  }

  test("chiSquareIndependence matches the textbook 2x2 fixture") {
    // classic 2x2: o = [[10, 20], [30, 40]]; N=100
    // chi2 = N(ad-bc)²/((a+b)(c+d)(a+c)(b+d)) = 100·(400−600)²/(30·70·40·60)
    val rows = Seq.fill(10)(("x", 0)) ++ Seq.fill(20)(("x", 1)) ++
      Seq.fill(30)(("y", 0)) ++ Seq.fill(40)(("y", 1))
    val (n, kr, kc, dof, chi2, v) = runChi2(rows)
    assert(n == 100L && kr == 2L && kc == 2L && dof == 1L)
    val want = 100.0 * 200.0 * 200.0 / (30.0 * 70.0 * 40.0 * 60.0)
    assert(chi2.exists(c => math.abs(c - want) < 2e-6), s"$chi2 vs $want")
    assert(v.exists(c => math.abs(c - math.sqrt(want / 100.0)) < 2e-6))
  }

  test("chiSquareIndependence: exact independence gives chi2 0; " +
      "a single column level gives dof 0 and NULL stats") {
    // perfectly proportional cells: 2:1 row ratio at every column
    val ind = Seq.fill(20)(("x", 0)) ++ Seq.fill(40)(("x", 1)) ++
      Seq.fill(10)(("y", 0)) ++ Seq.fill(20)(("y", 1))
    val (_, _, _, dof, chi2, _) = runChi2(ind)
    assert(dof == 1L && chi2.contains(0.0))
    val degenerate = Seq.fill(30)(("x", 7)) ++ Seq.fill(30)(("y", 7))
    val (_, _, kc1, dof0, chi2N, vN) = runChi2(degenerate)
    assert(kc1 == 1L && dof0 == 0L && chi2N.isEmpty && vN.isEmpty)
  }

  // ---- mannKendallTrend ----------------------------------------------

  private def runMk(rows: Seq[(Long, Double)]) = {
    val r = Eval.mannKendallTrend(rows.toDF("t", "x"), "t", "x").collect()(0)
    (r.getLong(0), r.getLong(1),
      Option(r.get(2)).map(_.asInstanceOf[Double]),
      Option(r.get(3)).map(_.asInstanceOf[Double]))
  }

  test("mannKendallTrend: strictly increasing series has S = n(n-1)/2, " +
      "positive z, and the exact slope") {
    val rows = (1 to 25).map(i => (i.toLong, 3.5 * i + 10.0))
    val (n, s, z, slope) = runMk(rows)
    assert(n == 25L && s == 25L * 24 / 2)
    assert(z.exists(_ > 0) && slope.contains(3.5))
  }

  test("mannKendallTrend matches a brute-force S and median slope") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 40).map(i => (i.toLong, rnd.nextInt(6).toDouble))
    val (n, s, z, slope) = runMk(rows)
    val brute = (for {
      i <- rows.indices; j <- rows.indices if rows(i)._1 < rows(j)._1
    } yield math.signum(rows(j)._2 - rows(i)._2).toLong).sum
    assert(n == 40L && s == brute)
    val slopes = (for {
      i <- rows.indices; j <- rows.indices if rows(i)._1 < rows(j)._1
    } yield (rows(j)._2 - rows(i)._2) / (rows(j)._1 - rows(i)._1).toDouble)
      .sorted
    val m = slopes.size
    val med = if (m % 2 == 1) slopes(m / 2)
      else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
    assert(slope.contains(BigDecimal(med)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(z.isDefined)
  }

  test("mannKendallTrend: constant series gives S 0, NULL z, slope 0") {
    val (n, s, z, slope) = runMk((1 to 10).map(i => (i.toLong, 2.0)))
    assert(n == 10L && s == 0L && z.isEmpty && slope.contains(0.0))
  }

  // ---- classifierReport ----------------------------------------------

  test("classifierReport: counts, rates, and predicted-only/true-only " +
      "classes all present") {
    // y=a: 3 rows (2 predicted a, 1 predicted b)
    // y=b: 2 rows (both predicted c) — c is predicted-only, and no row
    // predicts anything as d; add y=d with pred a → d is true-only
    val rows = Seq(("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "c"), ("b", "c"), ("d", "a"))
    val out = Eval.classifierReport(rows.toDF("y", "p"),
      col("y"), col("p")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double]),
        Option(r.get(6)).map(_.asInstanceOf[Double])))).toMap
    assert(out.keySet == Set("a", "b", "c", "d"))
    assert(out("a") == ((3L, 3L, 2L, Some(0.666667), Some(0.666667),
      Some(0.666667))))
    assert(out("b") == ((2L, 1L, 0L, Some(0.0), Some(0.0), Some(0.0))))
    // c: never true, predicted twice → recall NULL, precision 0
    assert(out("c") == ((0L, 2L, 0L, Some(0.0), None, Some(0.0))))
    // d: true once, never predicted → precision NULL, recall 0
    assert(out("d") == ((1L, 0L, 0L, None, Some(0.0), Some(0.0))))
  }

  // ---- welchTTest ------------------------------------------------------

  private def runWelch(rows: Seq[(Double, String)]) = {
    val r = Eval.welchTTest(rows.toDF("v", "g"), col("v"),
      col("g") === "a", col("g") === "b").collect()(0)
    (r.getLong(0), r.getLong(1),
      Option(r.get(4)).map(_.asInstanceOf[Double]),
      Option(r.get(5)).map(_.asInstanceOf[Double]),
      Option(r.get(6)).map(_.asInstanceOf[Double]))
  }

  test("welchTTest matches the textbook formulas on random data") {
    val rnd = new scala.util.Random(41)
    val as = (1 to 60).map(_ => rnd.nextInt(200) / 4.0)
    val bs = (1 to 45).map(_ => rnd.nextInt(200) / 4.0 + 3.0)
    val (na, nb, t, dof, d) =
      runWelch(as.map((_, "a")) ++ bs.map((_, "b")))
    assert(na == 60L && nb == 45L)
    def meanVar(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
    }
    val ((m1, v1), (m2, v2)) = (meanVar(as), meanVar(bs))
    val se2 = v1 / as.size + v2 / bs.size
    val wantT = (m1 - m2) / math.sqrt(se2)
    val wantDof = se2 * se2 /
      (math.pow(v1 / as.size, 2) / (as.size - 1) +
        math.pow(v2 / bs.size, 2) / (bs.size - 1))
    val sp2 = ((as.size - 1) * v1 + (bs.size - 1) * v2) /
      (as.size + bs.size - 2).toDouble
    assert(t.exists(x => math.abs(x - wantT) < 1e-5), s"$t vs $wantT")
    assert(dof.exists(x => math.abs(x - wantDof) < 1e-4))
    assert(d.exists(x => math.abs(x - (m1 - m2) / math.sqrt(sp2)) < 1e-5))
  }

  test("welchTTest: all-tied values give NULL t; a 1-row side too") {
    val (_, _, t, dof, d) =
      runWelch((1 to 20).map(i => (7.0, if (i % 2 == 0) "a" else "b")))
    assert(t.isEmpty && dof.isEmpty && d.isEmpty, "zero variance => NULLs")
    val (na, _, t1, _, _) =
      runWelch(Seq((1.0, "a")) ++ (1 to 10).map(i => (i.toDouble, "b")))
    assert(na == 1L && t1.isEmpty, "n=1 side has no variance => NULL t")
  }

  // ---- oneWayAnova -----------------------------------------------------

  test("oneWayAnova matches the textbook F on a 3-group fixture") {
    val rnd = new scala.util.Random(53)
    val groups = Map(
      "g0" -> (1 to 40).map(_ => rnd.nextInt(100) / 4.0),
      "g1" -> (1 to 30).map(_ => rnd.nextInt(100) / 4.0 + 2.0),
      "g2" -> (1 to 50).map(_ => rnd.nextInt(100) / 4.0 - 1.0))
    val rows = groups.toSeq.flatMap { case (g, xs) => xs.map((_, g)) }
    val r = Eval.oneWayAnova(rows.toDF("v", "g"), col("v"), col("g"))
      .collect()(0)
    val n = groups.valuesIterator.map(_.size).sum
    val grand = groups.valuesIterator.flatten.sum / n
    val ssb = groups.valuesIterator.map { xs =>
      val m = xs.sum / xs.size
      xs.size * (m - grand) * (m - grand)
    }.sum
    val ssw = groups.valuesIterator.map { xs =>
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum
    }.sum
    val wantF = (ssb / (groups.size - 1)) / (ssw / (n - groups.size))
    assert(r.getLong(0) == n.toLong && r.getLong(1) == groups.size.toLong)
    assert(math.abs(r.getDouble(2) - ssb) < 1e-3, s"ssb ${r.getDouble(2)} vs $ssb")
    assert(math.abs(r.getDouble(3) - ssw) < 1e-3)
    assert(math.abs(r.getDouble(4) - wantF) < 1e-5, s"F ${r.getDouble(4)} vs $wantF")
  }

  // ---- bootstrapMeanCI --------------------------------------------------

  test("bootstrapMeanCI: CI brackets the true mean, se is sane, and the " +
      "replicate machinery is deterministic") {
    val rnd = new scala.util.Random(61)
    val rows = (1 to 2000).map(i => (i.toLong, 50.0 + rnd.nextInt(400) / 4.0))
    def run() = Eval.bootstrapMeanCI(rows.toDF("id", "v"), col("v"),
      col("id"), reps = 32).collect()(0)
    val r = run()
    assert(r.getLong(0) == 2000L && r.getLong(1) == 32L)
    val mean = r.getDouble(2)
    val (se, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val want = rows.map(_._2).sum / rows.size
    assert(math.abs(mean - want) < 1e-6)
    // sd of the value dist is ~29; se of the mean ~29/√2000 ≈ 0.65
    assert(se > 0.2 && se < 2.0, s"boot se $se implausible")
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] must bracket $mean")
    assert(hi - lo < 6 * se + 1e-6, "interval width vs se consistency")
    val again = run()
    assert(again.getDouble(3) == se && again.getDouble(4) == lo &&
      again.getDouble(5) == hi, "md5-coin bootstrap must be deterministic")
  }

  test("bootstrapMeanCI: constant values give a zero-width interval " +
      "and se 0; empty input gives NULL stats") {
    val r = Eval.bootstrapMeanCI((1 to 100).map(i => (i.toLong, 42.0))
      .toDF("id", "v"), col("v"), col("id"), reps = 16).collect()(0)
    assert(r.getLong(1) == 16L && r.getDouble(2) == 42.0)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 42.0 &&
      r.getDouble(5) == 42.0)
    val e = Eval.bootstrapMeanCI(Seq.empty[(Long, Double)]
      .toDF("id", "v"), col("v"), col("id"), reps = 8).collect()(0)
    assert(e.getLong(0) == 0L && e.isNullAt(2) && e.isNullAt(4))
  }

  test("kaplanMeier: textbook curve with right-censoring at the horizon") {
    // lifetimes: u1,u2 die at t=1, u3 dies at t=2, u4 reaches the
    // horizon (day 3) and is CENSORED — it thins the risk set but must
    // not step the curve down
    def ts(d: Int) = java.sql.Timestamp.valueOf(s"2024-01-0${d + 1} 00:00:00")
    val ev = Seq(
      ("u1", ts(0)), ("u1", ts(1)),
      ("u2", ts(0)), ("u2", ts(1)),
      ("u3", ts(0)), ("u3", ts(2)),
      ("u4", ts(0)), ("u4", ts(3))).toDF("id", "ts")
    val got = Eval.kaplanMeier(ev, col("ts"), col("id"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // t=1: risk 4, deaths 2 → S=0.5; t=2: risk 2, death 1 → S=0.25;
    // t=3: risk 1, censored → S stays 0.25
    assert(got.toSeq == Seq(
      (1L, 4L, 2L, 0.5), (2L, 2L, 1L, 0.25), (3L, 1L, 0L, 0.25)))
  }

  test("kaplanMeier: everyone alive at the horizon → flat curve at 1") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(s"2024-01-0${d + 1} 00:00:00")
    val ev = Seq(("a", ts(0)), ("a", ts(2)), ("b", ts(1)), ("b", ts(2)))
      .toDF("id", "ts")
    val got = Eval.kaplanMeier(ev, col("ts"), col("id"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L, 0L, 1.0), (2L, 1L, 0L, 1.0)))
    assert(Eval.kaplanMeier(ev.limit(0), col("ts"), col("id")).isEmpty)
  }

  test("oneWayAnova: a single group or zero within-variance gives NULL F") {
    val one = Eval.oneWayAnova((1 to 10).map(i => (i.toDouble, "g"))
      .toDF("v", "g"), col("v"), col("g")).collect()(0)
    assert(one.getLong(1) == 1L && one.isNullAt(4))
    val flat = Eval.oneWayAnova(
      (Seq.fill(5)((1.0, "a")) ++ Seq.fill(5)((2.0, "b"))).toDF("v", "g"),
      col("v"), col("g")).collect()(0)
    assert(flat.isNullAt(4), "SSW 0 => F undefined, not Inf")
  }

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Textbook two-arm log-rank mirrored step-for-step (same per-term
    * 6-dp rounding, exact-decimal sums, same double associativity).
    * Subjects are (id, event-day offsets, isArmA).
    */
  private def bruteLogRank(subj: Seq[(String, Seq[Int], Boolean)])
      : (Long, Long, Long, Long, Double, Double, Option[Double]) = {
    val life = subj.map { case (_, ds, a) => (ds.min, ds.max, if (a) 1 else 0) }
    val m = life.map(_._2).max
    val byArmT = life.groupBy(l => (l._3, l._2 - l._1)).map { case ((arm, t), ls) =>
      (arm, t, ls.size.toLong, ls.count(_._2 < m).toLong) }.toSeq
    val times = byArmT.map(_._2).distinct
    def nRisk(arm: Int, t: Int) =
      byArmT.filter(x => x._1 == arm && x._2 >= t).map(_._3).sum
    def dAt(arm: Int, t: Int) =
      byArmT.filter(x => x._1 == arm && x._2 == t).map(_._4).sum
    val rows = times.map { t =>
      val n1 = nRisk(1, t); val n = n1 + nRisk(0, t)
      val d1 = dAt(1, t); val dd = d1 + dAt(0, t)
      (n1, n, d1, dd)
    }.filter(_._4 > 0)
    val oA = rows.map(_._3).sum
    val eRaw = rows.map { case (n1, n, _, dd) =>
      BigDecimal(r6(dd.toDouble * (n1.toDouble / n.toDouble))) }.sum
    val vRaw = rows.map { case (n1, n, _, dd) =>
      val sh = n1.toDouble / n.toDouble
      BigDecimal(if (n > 1)
        r6(dd.toDouble * sh * (1.0 - sh) * (n - dd).toDouble / (n - 1).toDouble)
      else 0.0) }.sum
    val chi2 = if (vRaw > 0)
      Some(r6((oA - eRaw.toDouble) * (oA - eRaw.toDouble) / vRaw.toDouble))
    else None
    (life.count(_._3 == 1).toLong, life.count(_._3 == 0).toLong,
      rows.size.toLong, oA, r6(eRaw.toDouble), r6(vRaw.toDouble), chi2)
  }

  private def logRankDf(subj: Seq[(String, Seq[Int], Boolean)]) = {
    def ts(d: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong).atStartOfDay())
    subj.flatMap { case (id, ds, a) => ds.map(d => (id, ts(d), a)) }
      .toDF("id", "ts", "a")
  }

  test("logRank matches the textbook statistic on a random two-arm mix") {
    val rnd = new scala.util.Random(11)
    val subj = (1 to 40).map { i =>
      val f = rnd.nextInt(10)
      val days = Seq(f) ++ (1 to 1 + rnd.nextInt(2)).map(_ => f + rnd.nextInt(12))
      (s"u$i", days, rnd.nextBoolean())
    }
    val (nA, nB, nT, oA, eA, vA, chi2) = bruteLogRank(subj)
    val r = Eval.logRank(logRankDf(subj), col("ts"), col("id"), col("a"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((nA, nB, nT, oA)))
    assert(r.getDouble(4) == eA && r.getDouble(5) == vA)
    assert(Option(r.get(6)).map(_.asInstanceOf[Double]) == chi2)
    assert(chi2.isDefined, "fixture must exercise the non-degenerate path")
  }

  test("logRank: perfectly symmetric arms give chi2 exactly 0") {
    // each arm: one subject dying at t=1, one at t=2, one censored at
    // the horizon (t=3); share is 0.5 at every death time so O == E
    val subj = Seq(
      ("a1", Seq(0, 1), true), ("a2", Seq(0, 2), true), ("a3", Seq(0, 3), true),
      ("b1", Seq(0, 1), false), ("b2", Seq(0, 2), false), ("b3", Seq(0, 3), false))
    val r = Eval.logRank(logRankDf(subj), col("ts"), col("id"), col("a"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 3L, 2L, 2L)))
    assert(r.getDouble(4) == 2.0 && r.getDouble(6) == 0.0)
  }

  test("cohenKappa matches the marginal-chance definition on random labels") {
    val rnd = new scala.util.Random(3)
    val labs = Array("x", "y", "z", "w")
    val pairs = (1 to 300).map { _ =>
      val a = labs(rnd.nextInt(4))
      // correlated second rater: agree 60% of the time
      val b = if (rnd.nextInt(10) < 6) a else labs(rnd.nextInt(4))
      (a, b)
    }
    val n = pairs.size
    val agree = pairs.count(p => p._1 == p._2)
    val na = pairs.groupBy(_._1).map { case (k, v) => k -> v.size }
    val nb = pairs.groupBy(_._2).map { case (k, v) => k -> v.size }
    val keys = na.keySet ++ nb.keySet
    val peNum = keys.toSeq
      .map(k => BigInt(na.getOrElse(k, 0)) * BigInt(nb.getOrElse(k, 0))).sum
    val pO = r6(agree.toDouble / n.toDouble)
    val pE = r6(peNum.toDouble / (n.toLong * n.toLong).toDouble)
    val kap = r6((pO - pE) / (1.0 - pE))
    val r = Eval.cohenKappa(pairs.toDF("ra", "rb"), col("ra"), col("rb"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((n.toLong, keys.size.toLong, agree.toLong)))
    assert(r.getDouble(3) == pO && r.getDouble(4) == pE)
    assert(r.getDouble(5) == kap)
  }

  test("cohenKappa: perfect agreement gives 1; constant raters give NULL; " +
      "null-label rows are dropped") {
    val perfect = (1 to 60).map(i => (s"l${i % 3}", s"l${i % 3}"))
    val p = Eval.cohenKappa(perfect.toDF("ra", "rb"), col("ra"), col("rb"))
      .collect()(0)
    assert(p.getDouble(3) == 1.0 && p.getDouble(5) == 1.0)
    val const = (1 to 20).map(_ => ("same", "same"))
    val c = Eval.cohenKappa(const.toDF("ra", "rb"), col("ra"), col("rb"))
      .collect()(0)
    assert(c.getDouble(4) == 1.0 && c.isNullAt(5), "p_e = 1 => kappa undefined")
    val withNulls = Seq(("a", "a"), ("a", null), (null, "b"), ("b", "b"))
    val w = Eval.cohenKappa(withNulls.toDF("ra", "rb"), col("ra"), col("rb"))
      .collect()(0)
    assert(w.getLong(0) == 2L && w.getLong(2) == 2L)
  }

  test("bhFdr implements STEP-UP rejection: a test above its own threshold " +
      "is still rejected when a later rank passes") {
    // m=4, alpha=0.2 -> thresholds 0.05/0.10/0.15/0.20; p2=0.12 > 0.10
    // but p3=0.14 <= 0.15, so kmax=3 rejects tests 1..3 INCLUDING #2
    val tests = Seq(("t1", 0.01), ("t2", 0.12), ("t3", 0.14), ("t4", 0.9))
    val got = Eval.bhFdr(tests.toDF("k", "p"), Seq("k"), col("p"), 0.2)
      .collect().map(r => r.getString(0) ->
        (r.getInt(2), r.getDouble(4), r.getBoolean(5))).toMap
    assert(got("t1") == ((1, 0.05, true)))
    assert(got("t2") == ((2, 0.1, true)), "step-up must reject rank 2")
    assert(got("t3") == ((3, 0.15, true)))
    assert(got("t4") == ((4, 0.2, false)))
  }

  test("bhFdr matches the brute-force procedure on random p-values, and " +
      "rejects nothing when all p exceed alpha") {
    val rnd = new scala.util.Random(5)
    // a cluster of true signals (small p) among uniform noise — BH must
    // reject the cluster plus whatever noise the step-up sweeps in
    val tests = (1 to 50).map { i =>
      val p = if (i <= 12) rnd.nextDouble() * 0.03 else rnd.nextDouble()
      (f"t$i%03d", r6(p))
    }
    val alpha = 0.25
    val m = tests.size
    val sorted = tests.sortBy(t => (t._2, t._1))
    val thr = sorted.zipWithIndex.map { case (_, i) =>
      r6((i + 1).toDouble * alpha / m.toDouble) }
    val kmax = sorted.zipWithIndex
      .filter { case ((_, p), i) => p <= thr(i) }
      .map(_._2 + 1).lastOption.getOrElse(0)
    val expect = sorted.zipWithIndex.map { case ((k, p), i) =>
      k -> (i + 1 <= kmax) }.toMap
    val got = Eval.bhFdr(tests.toDF("k", "p"), Seq("k"), col("p"), alpha)
      .collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(got == expect)
    assert(expect.values.exists(identity), "fixture must reject something")
    val none = Eval.bhFdr(Seq(("a", 0.8), ("b", 0.9)).toDF("k", "p"),
      Seq("k"), col("p"), 0.05).collect()
    assert(none.forall(!_.getBoolean(5)))
  }

  test("jsDivergence: identical distributions give 0; disjoint give ln 2 " +
      "(up to the pinned 6-dp term rounding); the bin axis is dense") {
    val rnd = new scala.util.Random(9)
    val same = (1 to 200).map(_ => rnd.nextGaussian() * 2)
      .toDF("v").withColumn("g", lit("both"))
    val s = Eval.jsDivergence(same, col("v"), lit(true), lit(true))
      .collect()
    assert(s.length == 11, "one row per bin of the default [-5,5] axis")
    assert(s.forall(r => r.getDouble(6) == 0.0 && r.getDouble(7) == 0.0))
    val disj = ((1 to 100).map(_ => (0.5, "a")) ++
      (1 to 100).map(_ => (1.5, "b"))).toDF("v", "g")
    val d = Eval.jsDivergence(disj, col("v"), col("g") === "a",
      col("g") === "b").collect()
    assert(d.length == 11)
    // per-bin term = round6(0.5*ln 2) = 0.346574; their exact-decimal
    // sum is 0.693148 (one ulp above ln 2 from the two roundings)
    assert(d.forall(_.getDouble(6) == 0.693148))
    assert(d.forall(_.getDouble(7) == 1.000001))
  }

  test("cvmStatistic matches the exact-integer definition on random ties") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(40).toDouble / 4.0, rnd.nextInt(2)))
    // brute force with the operator's exact arithmetic: per distinct v
    // inclusive cohort cums; S = Σ c·(ca·nb − cb·na)² exact; one division
    val byV = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (v, rs) =>
      (v, rs.count(_._2 == 1).toLong, rs.count(_._2 == 0).toLong) }
    val cums = byV.scanLeft((0.0, 0L, 0L)) { case ((_, ca, cb), (v, a, b)) =>
      (v, ca + a, cb + b) }.drop(1)
    val na = cums.last._2; val nb = cums.last._3
    val s = byV.zip(cums).map { case ((_, a, b), (_, ca, cb)) =>
      val d = BigInt(ca) * nb - BigInt(cb) * na
      BigInt(a + b) * d * d }.sum
    val h = (na + nb).toDouble
    val expT = BigDecimal(s.toDouble / (na.toDouble * nb.toDouble * h * h))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Eval.cvmStatistic(rows.toDF("v", "y"), col("v"),
      col("y") === 1, col("y") === 0).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((na, nb, byV.size.toLong)))
    assert(r.getDouble(3) == expT)
  }

  test("cvmStatistic: coincident cohorts give exactly 0; an empty cohort " +
      "gives NULL") {
    // every row counts in BOTH cohorts -> a == b per value -> every
    // cross-product difference is exactly 0
    val rnd = new scala.util.Random(23)
    val same = (1 to 300).map(_ => rnd.nextGaussian()).toDF("v")
    val r = Eval.cvmStatistic(same, col("v"), lit(true), lit(true))
      .collect()(0)
    assert(r.getDouble(3) == 0.0)
    val onesided = Eval.cvmStatistic((1 to 50).map(i => (i.toDouble, 1))
      .toDF("v", "y"), col("v"), col("y") === 1, col("y") === 0).collect()(0)
    assert(onesided.isNullAt(3))
  }

  test("kendallTauB matches the brute-force pair count under heavy ties, " +
      "and hits ±1 on monotone data") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 200).map(_ => (rnd.nextInt(8).toLong, rnd.nextInt(8).toLong))
    val n = rows.size
    var cc = 0L; var dd = 0L; var t1 = 0L; var t2 = 0L
    for (i <- 0 until n; j <- (i + 1) until n) {
      val ((x1, y1), (x2, y2)) = (rows(i), rows(j))
      if (x1 == x2) t1 += 1
      if (y1 == y2) t2 += 1
      if (x1 != x2 && y1 != y2) {
        if ((x1 < x2) == (y1 < y2)) cc += 1 else dd += 1
      }
    }
    val n0 = n.toLong * (n - 1) / 2
    val tau = r6((cc - dd).toDouble /
      math.sqrt((n0 - t1).toDouble * (n0 - t2).toDouble))
    val r = Eval.kendallTauB(rows.toDF("x", "y"), col("x"), col("y"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((n.toLong, cc, dd, t1, t2)))
    assert(r.getDouble(6) == tau)
    val mono = (1 to 40).map(i => (i.toLong, (i * 3).toLong))
    assert(Eval.kendallTauB(mono.toDF("x", "y"), col("x"), col("y"))
      .collect()(0).getDouble(6) == 1.0)
    val anti = (1 to 40).map(i => (i.toLong, (100 - i).toLong))
    assert(Eval.kendallTauB(anti.toDF("x", "y"), col("x"), col("y"))
      .collect()(0).getDouble(6) == -1.0)
  }

  test("kendallTauB: a constant margin gives NULL tau (n0 == ties)") {
    val const = (1 to 30).map(i => (5L, i.toLong))
    val r = Eval.kendallTauB(const.toDF("x", "y"), col("x"), col("y"))
      .collect()(0)
    assert(r.getLong(4) == 30L * 29 / 2 && r.isNullAt(6))
  }

  test("jsDivergence is symmetric in the two cohorts") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 400).map(_ =>
      (rnd.nextGaussian() * (if (rnd.nextBoolean()) 1.0 else 2.5),
        if (rnd.nextBoolean()) "a" else "b")).toDF("v", "g")
    val ab = Eval.jsDivergence(rows, col("v"), col("g") === "a",
      col("g") === "b").collect()(0).getDouble(6)
    val ba = Eval.jsDivergence(rows, col("v"), col("g") === "b",
      col("g") === "a").collect()(0).getDouble(6)
    assert(ab == ba && ab > 0.0)
  }
}
