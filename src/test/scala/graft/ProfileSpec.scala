package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile reports exact counts/nulls/min/max in one pass") {
    val df = Seq(
      (1L, Some(10.0), "x"), (2L, None, "y"), (3L, Some(-5.0), null))
      .toDF("id", "v", "s")
    val p = Profile.profile(df).as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(p(("id", "count")) == 3.0 && p(("id", "null_count")) == 0.0)
    assert(p(("v", "count")) == 2.0 && p(("v", "null_count")) == 1.0)
    assert(p(("s", "null_count")) == 1.0)
    assert(p(("v", "min")) == -5.0 && p(("v", "max")) == 10.0)
    assert(!p.contains(("s", "min"))) // non-numeric: no min/max
  }

  test("column names containing dots profile as columns, not nested paths") {
    val df = Seq((1L, 2L)).toDF("user.id", "plain")
    val p = Profile.profile(df).as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(p(("user.id", "count")) == 1.0)
    assert(p(("user.id", "max")) == 1.0)
  }

  test("approx_distinct is within 5% of exact on 10k distinct values") {
    val df = spark.range(0, 10000).toDF("id")
    val p = Profile.profile(df).as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val est = p(("id", "approx_distinct"))
    assert(math.abs(est - 10000.0) / 10000.0 < 0.05, s"estimate $est")
  }
}
