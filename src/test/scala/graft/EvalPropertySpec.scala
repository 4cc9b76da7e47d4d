package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.operators.Eval

/** Algebraic invariants of the eval statistics — properties a correct
  * implementation cannot dodge:
  *  - AUC is rank-based: any strictly increasing transform of the
  *    scores leaves it unchanged;
  *  - complementing the AUC label reflects it around 0.5;
  *  - swapping the two KS samples leaves the statistic unchanged.
  */
class EvalPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // heavy ties on purpose (15 distinct scores), both labels present
  private val rowsGen: Gen[List[(Double, Boolean)]] = for {
    n <- Gen.choose(20, 120)
    rows <- Gen.listOfN(n, for {
      s <- Gen.choose(0, 15)
      y <- Gen.oneOf(true, false)
    } yield (s.toDouble, y))
  } yield ((1.0, true) :: (2.0, false) :: rows)

  private def auc(rows: Seq[(Double, Boolean)],
                  f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                  flip: Boolean = false): Double = {
    val df = rows.toDF("s", "y")
    val lbl = if (flip) !col("y") else col("y")
    Eval.aucBinary(df, f(col("s")), lbl).collect()(0).getDouble(0)
  }

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("AUC is invariant under strictly increasing score transforms") {
    check(Prop.forAll(rowsGen) { rows =>
      val base = auc(rows, identity)
      // exp and positive-affine are strictly increasing: ranks frozen
      auc(rows, s => exp(s)) == base &&
        auc(rows, s => s * lit(3.0) + lit(41.0)) == base
    })
  }

  test("complementing the label reflects AUC around 0.5") {
    check(Prop.forAll(rowsGen) { rows =>
      math.abs(auc(rows, identity) + auc(rows, identity, flip = true) - 1.0) < 2e-6
    })
  }

  test("KS statistic is symmetric in its two samples") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("v", "g")
      val ab = Eval.ksStatistic(df, col("v"), col("g"), !col("g")).collect()(0)
      val ba = Eval.ksStatistic(df, col("v"), !col("g"), col("g")).collect()(0)
      ab.getDouble(0) == ba.getDouble(0) &&
        ab.getLong(2) == ba.getLong(3) && ab.getLong(3) == ba.getLong(2)
    })
  }

  // two numeric columns with heavy ties, non-constant by construction
  private val xyGen: Gen[List[(Double, Double)]] = for {
    n <- Gen.choose(20, 100)
    rows <- Gen.listOfN(n, for {
      x <- Gen.choose(0, 12)
      y <- Gen.choose(0, 9)
    } yield (x.toDouble, y.toDouble))
  } yield ((0.0, 0.0) :: (1.0, 1.0) :: (2.0, 0.0) :: rows)

  test("Spearman is rank-based: strictly increasing transforms of " +
      "either column leave rho unchanged; swapping columns is symmetric") {
    check(Prop.forAll(xyGen) { rows =>
      val df = rows.toDF("x", "y")
      def rho(xc: org.apache.spark.sql.Column,
              yc: org.apache.spark.sql.Column): Double =
        Eval.spearman(df, xc, yc).collect()(0).getDouble(1)
      val base = rho(col("x"), col("y"))
      rho(exp(col("x")), col("y")) == base &&
        rho(col("x"), col("y") * lit(7.0) + lit(1.0)) == base &&
        rho(col("y"), col("x")) == base
    })
  }

  test("Spearman negates under a strictly decreasing transform") {
    check(Prop.forAll(xyGen) { rows =>
      val df = rows.toDF("x", "y")
      val base = Eval.spearman(df, col("x"), col("y")).collect()(0).getDouble(1)
      val neg = Eval.spearman(df, -col("x"), col("y")).collect()(0).getDouble(1)
      math.abs(base + neg) < 2e-6
    })
  }

  test("NDCG is invariant under strictly increasing score transforms " +
      "and always within (0, 1]") {
    check(Prop.forAll(rowsGen) { rows =>
      // one query per 10 rows; tiebreak = index keeps ranks unique
      val df = rows.zipWithIndex
        .map { case ((s, y), i) => (i / 10, s, y, i.toLong) }
        .toDF("q", "s", "y", "tb")
      def m(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        Eval.meanNdcgBinary(df, col("q"), f(col("s")), col("y"), col("tb"))
          .collect()(0)
      val base = m(identity)
      val scaled = m(s => s * lit(5.0) + lit(3.0))
      base.getLong(0) == scaled.getLong(0) &&
        base.getDouble(1) == scaled.getDouble(1) &&
        base.getDouble(1) > 0.0 && base.getDouble(1) <= 1.0
    })
  }

  // q_changepoint_cusum computes the one-sided CUSUM through its
  // window-expressible closed form Cₜ = Sₜ − min(0, min_{i≤t} Sᵢ); the
  // textbook definition is the recursion Cₜ = max(0, Cₜ₋₁ + devₜ).
  // The leading 0 (the empty prefix) is load-bearing: without it the
  // two differ exactly when every early prefix sum is positive —
  // writing this property test is what caught that omission in the
  // query's first version. The identity must hold for every series,
  // including all-negative and alternating deviations (scaled
  // integers, as the query uses).
  test("property: CUSUM closed form equals the max(0, ...) recursion") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-50, 50))) { xs =>
      val n = xs.length.toLong
      val total = xs.map(_.toLong).sum
      val devs = xs.map(x => x * n - total) // the query's scaling
      val s = devs.scanLeft(0L)(_ + _).tail // prefix sums S_t
      val sminWithZero = s.scanLeft(0L)(math.min).tail
      val closedForm = s.zip(sminWithZero).map { case (a, b) => a - b }
      val recursion = devs.scanLeft(0L)((c, d) => math.max(0L, c + d)).tail
      closedForm == recursion
    })
  }

  // Mann-Whitney's defining identity: U_A + U_B = n₁·n₂ (every cross
  // pair contributes exactly 1 split between the two statistics, ties
  // contributing ½ to each), so effect(A,B) + effect(B,A) = 1 exactly.
  // This exercises the doubled-rank integer bookkeeping from both
  // directions — an off-by-one in the tie-group rank formula or the
  // below-count prefix breaks the symmetry on some multiset.
  test("property: mannWhitneyU effect sizes from the two directions sum to 1") {
    val gen = for {
      n <- Gen.choose(10, 80)
      rows <- Gen.listOfN(n, for {
        v <- Gen.choose(0, 6) // 7 distinct values => constant tie groups
        a <- Gen.oneOf(true, false)
      } yield (v.toDouble, a))
    } yield ((0.0, true) :: (0.0, false) :: rows)
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("v", "a")
      def eff(isA: org.apache.spark.sql.Column) =
        Eval.mannWhitneyU(df, col("v"), isA, !isA)
          .collect()(0).getAs[Double]("effect")
      val (ab, ba) = (eff(col("a")), eff(!col("a")))
      // each effect is independently 6-dp-rounded; the sum can land
      // one ulp-of-6dp off exactly at x.xxxxx5 boundaries — and that
      // deviation, computed in IEEE doubles, can itself sit a few
      // float-ulps ABOVE 1e-6 (e.g. 0.254688 + 0.745313 deviates by
      // 1.0000000000139778e-6), so the bound needs slack past the
      // intended one-6dp-ulp allowance
      math.abs(ab + ba - 1.0) <= 1.01e-6
    })
  }

  // Brute-force Kaplan-Meier with the engine's exact rounding contract:
  // factor and running product both 6-dp HALF_UP per step, censoring =
  // last day equals the cohort horizon.
  private def bruteKM(spans: Seq[(Long, Long)]): Seq[(Long, Long, Long, Double)] = {
    val horizon = spans.map(_._2).max
    val lifetimes = spans.map { case (f, l) => (l - f, l < horizon) }
    var s = 1.0
    lifetimes.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, grp) =>
      val nRisk = lifetimes.count(_._1 >= t).toLong
      val d = grp.count(_._2).toLong
      val factor = BigDecimal((nRisk - d).toDouble / nRisk)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      s = BigDecimal(s * factor)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (t, nRisk, d, s)
    }
  }

  test("property: kaplanMeier equals the brute-force curve with censoring") {
    val spansGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 25)
      spans <- Gen.listOfN(n, for {
        f <- Gen.choose(0, 12)
        span <- Gen.choose(0, 8)
      } yield (f.toLong, (f + span).toLong))
    } yield spans
    check(Prop.forAll(spansGen) { spans =>
      def ts(d: Long) = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(d).atStartOfDay())
      val ev = spans.zipWithIndex.flatMap { case ((f, l), i) =>
        Seq((s"u$i", ts(f)), (s"u$i", ts(l)))
      }.toDF("id", "ts")
      val got = Eval.kaplanMeier(ev, col("ts"), col("id"))
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
      got == bruteKM(spans)
    })
  }

  test("cvmStatistic is symmetric under cohort swap") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("s", "y")
      def t(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        Eval.cvmStatistic(df, col("s"), a, b).collect()(0).getDouble(3)
      t(col("y"), !col("y")) == t(!col("y"), col("y"))
    })
  }

  test("kendallTauB is invariant under strictly increasing transforms " +
      "of either margin") {
    val xyGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(15, 80)
      rows <- Gen.listOfN(n, for {
        x <- Gen.choose(0L, 9L); y <- Gen.choose(0L, 9L)
      } yield (x, y))
    } yield (0L, 0L) :: (1L, 1L) :: rows
    check(Prop.forAll(xyGen) { rows =>
      val df = rows.toDF("x", "y")
      def tau(xc: org.apache.spark.sql.Column,
              yc: org.apache.spark.sql.Column): Any =
        Eval.kendallTauB(df, xc, yc).collect()(0).get(6)
      // τ is rank-based: affine-positive x and a strictly increasing
      // cubic-ish y (monotone for y >= 0) must not move it
      tau(col("x"), col("y")) ==
        tau(col("x") * 3 + 7, col("y") * col("y") * col("y") + col("y"))
    })
  }

  test("logRank chi2 is invariant under swapping the two arms") {
    val subjGen: Gen[List[(Int, Int, Boolean)]] = for {
      n <- Gen.choose(8, 40)
      rows <- Gen.listOfN(n, for {
        f <- Gen.choose(0, 6); d <- Gen.choose(0, 9)
        a <- Gen.oneOf(true, false)
      } yield (f, f + d, a))
    } yield (0, 3, true) :: (0, 4, false) :: rows
    check(Prop.forAll(subjGen) { subj =>
      def ts(d: Int) = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong).atStartOfDay())
      val ev = subj.zipWithIndex.flatMap { case ((f, l, a), i) =>
        Seq((s"u$i", ts(f), a), (s"u$i", ts(l), a)) }.toDF("id", "ts", "a")
      def chi2(arm: org.apache.spark.sql.Column): Any =
        Eval.logRank(ev, col("ts"), col("id"), arm).collect()(0).get(6)
      // (O_b − E_b) = −(O_a − E_a) and V is arm-symmetric, so the
      // statistic cannot depend on which arm is called A
      chi2(col("a")) == chi2(!col("a"))
    })
  }
}
