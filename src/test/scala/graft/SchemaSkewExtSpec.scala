package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.GraftExtensions
import graft.ops.Skew
import graft.schema.SchemaProvider

/** Schema-provider modes, skew utilities, SQL function registration. */
class SchemaSkewExtSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val raw = Seq(
    (java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), """{"ID":"1","PRODUCT":"LOAN","RATE":5}"""),
    (java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), """{"ID":"2","PRODUCT":"CARD"}"""))
    .toDF("timestamp", "value")

  test("SchemaProvider: inferred vs declared vs declared-with-drift") {
    val inferred = SchemaProvider.Inferred.schemaFor(raw)
    assert(inferred.fieldNames.toSet == Set("ID", "PRODUCT", "RATE"))
    assert(inferred("RATE").dataType == LongType) // inference picked long

    val declared = StructType(Seq(
      StructField("ID", StringType), StructField("PRODUCT", StringType)))
    assert(SchemaProvider.Declared(declared).schemaFor(raw) == declared)

    val drift = SchemaProvider.DeclaredWithDrift(declared).schemaFor(raw)
    assert(drift.fieldNames.toSeq == Seq("ID", "PRODUCT", "RATE")) // declared base + drift column
  }

  test("SchemaProvider.fromJson parses the reference's schema-file format") {
    val json =
      """{"type":"struct","fields":[
        |{"name":"ID","type":"string","nullable":true,"metadata":{}},
        |{"name":"__op","type":"string","nullable":true,"metadata":{}}]}""".stripMargin
    val s = SchemaProvider.fromJson(json)
    assert(s.fieldNames.toSeq == Seq("ID", "__op"))
  }

  test("saltedAggregate equals plain aggregation") {
    val df = (1 to 1000).map(i => ("hot", i.toLong)) ++ (1 to 10).map(i => (s"k$i", i.toLong))
    val data = df.toDF("key", "v")
    val salted = Skew.saltedAggregate(data, Seq("key"), salts = 8,
      partial = Seq(sum($"v").as("s"), count(lit(1)).as("c")),
      fin = Seq(sum($"s").as("total"), sum($"c").as("n")))
    val plain = data.groupBy($"key").agg(sum($"v").as("total"), count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin and isolatedSkewJoin equal a plain join") {
    val big = ((1 to 500).map(_ => 1) ++ (1 to 50).map(identity)).toDF("k")
    val small = (1 to 50).map(i => (i, s"v$i")).toDF("k", "v")
    val plain = big.join(small, Seq("k"))
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 4)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty)
    val isolated = Skew.isolatedSkewJoin(big, small, "k", hotKeys = Seq(1))
    assert(isolated.count() == plain.count())
    assert(isolated.exceptAll(plain).isEmpty)
  }

  test("saltedJoin refuses outer types that would duplicate small rows; " +
      "isolatedSkewJoin isolates NULL hot keys") {
    val big = ((1 to 100).map(_ => Some(1)) ++ Seq(None, None, Some(7)))
      .toDF("k")
    val small = Seq(Some(1) -> "a", (None: Option[Int]) -> "n", Some(7) -> "b")
      .toDF("k", "v")
    // replicated small side + full outer = each unmatched small row
    // once per salt — must be refused up front
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, Seq("k"), salts = 4, joinType = "full_outer")
    }
    // null hot key: result must still equal the plain join (nulls never
    // equi-match), and the hot branch must actually select the null rows
    // (isin() would return NULL and silently skip them)
    val plain = big.join(small, Seq("k"))
    val iso = Skew.isolatedSkewJoin(big, small, "k", hotKeys = Seq(null, 1))
    assert(iso.count() == plain.count())
    assert(iso.exceptAll(plain).isEmpty && plain.exceptAll(iso).isEmpty)
  }

  test("graft SQL functions register and run through spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_simhash64(graft_token_hashes('a b c')) AS s,
        |size(graft_shingle_hashes('hello world', 4)) AS ns,
        |size(graft_minhashes(graft_token_hashes('x y z'), 8)) AS nm""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) != 0L)
    assert(r.getInt(1) > 0)
    assert(r.getInt(2) == 8)
  }
}
