package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EntityMatch

class EntityMatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val clean = Seq(
    (1L, "alpha-0001"), (2L, "alpha-0002"), (3L, "bravo-0001")
  ).toDF("id", "name")

  // block on the alpha/bravo prefix
  private def blk(c: org.apache.spark.sql.Column) = substring(c, 1, 5)

  test("one-edit corruption matches back to its source") {
    val dirty = Seq((10L, "alpha-00x1"), (11L, "bravo-0001")).toDF("id", "name")
    val got = EntityMatch.bestMatch(dirty, clean, "id", "name", blk, 2)
      .as[(Long, Long, Long)].collect().toSet
    // "alpha-00x1" is 1 edit from alpha-0001 AND 2 from alpha-0002 → best = 1
    assert(got == Set((10L, 1L, 1L), (11L, 3L, 0L)))
  }

  test("equal-distance ties resolve to the smallest clean id") {
    val dirty = Seq((20L, "alpha-000x")).toDF("id", "name") // 1 edit from both alphas
    val got = EntityMatch.bestMatch(dirty, clean, "id", "name", blk, 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((20L, 1L, 1L)))
  }

  test("beyond maxDistance or blocked-away candidates yield no row") {
    val dirty = Seq(
      (30L, "alpha-xxxx"),  // 4 edits: above threshold
      (31L, "zulu!-0001")   // block key matches nothing
    ).toDF("id", "name")
    assert(EntityMatch.bestMatch(dirty, clean, "id", "name", blk, 2).isEmpty)
  }

  test("candidatePairs emits each unordered in-block pair once") {
    val df = Seq(
      (1L, "alpha-0001"), (2L, "alpha-0002"), // distance 1
      (3L, "alpha-0099"),                     // 2 from both: out at max=1
      (4L, "bravo-0001")                      // other block
    ).toDF("id", "name")
    val got = EntityMatch.candidatePairs(df, "id", "name", blk, 1)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("pairwise matches chain into one cluster only via the closure") {
    // A~B and B~C at distance 1, but A and C differ by 2 — no direct
    // pair; only the connected-components step puts all three together
    val df = Seq(
      (1L, "alpha-0011"), (2L, "alpha-0012"), (3L, "alpha-0022"),
      (9L, "alpha-0099")
    ).toDF("id", "name")
    val pairs = EntityMatch.candidatePairs(df, "id", "name", blk, 1)
    assert(pairs.as[(Long, Long)].collect().toSet == Set((1L, 2L), (2L, 3L)))
    val got = graft.operators.Cluster
      .canonicalize(df.select(col("id")), pairs, "id")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (9L, 9L, true)))
  }

  test("a degenerate (low-cardinality) block key fails loudly, not quadratically") {
    // 8 rows, constant block key, maxBlock = 4: the guard must throw
    // at materialization instead of silently running an 8x8 block
    val df = (1L to 8L).map(i => (i, f"name-$i%04d")).toDF("id", "name")
    val ex = intercept[Exception] {
      EntityMatch.candidatePairs(df, "id", "name", _ => lit("all"),
        maxDistance = 1, maxBlock = 4).count()
    }
    assert(String.valueOf(ex.getMessage).contains("too coarse") ||
      String.valueOf(ex.getCause).contains("too coarse"))
    val ex2 = intercept[Exception] {
      EntityMatch.bestMatch(df, df, "id", "name", _ => lit("all"),
        maxDistance = 1, maxBlock = 4).count()
    }
    assert(String.valueOf(ex2.getMessage).contains("too coarse") ||
      String.valueOf(ex2.getCause).contains("too coarse"))
  }

  test("blocks at exactly maxBlock pass the guard") {
    val df = (1L to 4L).map(i => (i, f"name-$i%04d")).toDF("id", "name")
    // all 4 rows share one block; bound is 4 → no throw, pairs flow
    val got = EntityMatch.candidatePairs(df, "id", "name", _ => lit("all"),
      maxDistance = 1, maxBlock = 4).count()
    assert(got == 6L) // C(4,2): every pair within distance 1 of pattern
  }

  // textbook Levenshtein DP — the reference the blocked join must agree
  // with on every candidate it admits or rejects
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("property: fuzzy clusters equal union-find over brute-force pairs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val namesGen: Gen[List[String]] = for {
      n <- Gen.choose(2, 30)
      names <- Gen.listOfN(n, for {
        blk <- Gen.oneOf("a", "b")
        cs <- Gen.listOfN(3, Gen.oneOf('x', 'y', 'z'))
      } yield blk + cs.mkString)
    } yield names
    val prop = Prop.forAll(namesGen) { names =>
      val rows = names.zipWithIndex.map { case (nm, i) => ((i + 1).toLong, nm) }
      val df = rows.toDF("id", "name")
      val pairs = EntityMatch.candidatePairs(df, "id", "name",
        c => substring(c, 1, 1), maxDistance = 1)
      val wantPairs = (for {
        (ia, na) <- rows; (ib, nb) <- rows
        if ia < ib && na.head == nb.head && lev(na, nb) <= 1
      } yield (ia, ib)).toSet
      val gotPairs = pairs.as[(Long, Long)].collect().toSet
      // union-find canonicalization over the brute pairs
      val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      wantPairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val wantClusters = rows.map { case (i, _) =>
        val c = find(i); (i, c, c == i)
      }.toSet
      val gotClusters = graft.operators.Cluster
        .canonicalize(df.select(col("id")), pairs, "id")
        .as[(Long, Long, Boolean)].collect().toSet
      (gotPairs == wantPairs) && (gotClusters == wantClusters)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
