package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the corpus assumptions the DuckDB oracles rely on (BMP-only
  * printable-ASCII text, non-NULL — see [[OracleGen]] scaladoc): the
  * guard must hold on the real driver testdata and must fire on planted
  * violations, so a future testdata-generator change fails loudly
  * instead of reporting corpus drift as engine bugs.
  */
class OracleAssumptionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("guard passes on the driver testdata corpus") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    assert(OracleGen.guardViolations(spark, "/root/testdata/sf0.001") == Seq.empty)
  }

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = s"target/tmp/oracle-guard-${System.nanoTime()}"
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("guard flags NULL text") {
    val dir = writeDocs(Seq(1L -> "plain ascii", 2L -> null))
    val v = OracleGen.guardViolations(spark, dir)
    assert(v.exists(_.contains("NULL text")), v.toString)
  }

  test("guard flags non-ASCII and astral characters") {
    val dir = writeDocs(Seq(
      1L -> "fine text", 2L -> "café", 3L -> "emoji 😀"))
    val v = OracleGen.guardViolations(spark, dir)
    assert(v.exists(_.contains("non-printable-ASCII")), v.toString)
    assert(v.mkString.contains("2 docs")) // both offenders counted
  }

  test("guard flags an empty corpus") {
    val dir = writeDocs(Seq.empty)
    assert(OracleGen.guardViolations(spark, dir) == Seq("documents table is empty"))
  }
}
