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
}
