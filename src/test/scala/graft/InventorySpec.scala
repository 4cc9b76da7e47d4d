package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariant: the declared inventory is 100%
  * oracle-backed — every query has oracle SQL and no oracle is
  * orphaned. A one-sided entry silently downgrades the correctness
  * gate (rows-only check) or is dead weight; fail loudly instead.
  */
class InventorySpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${(o -- q).toSeq.sorted}")
  }

  // The round-5 failure mode, pinned: one combinatorially-generated
  // oracle (dedup_winnow, 6.2 MB of SQL, >4 min of DuckDB) blew the
  // driver's correctness-gate budget and zeroed the whole round's
  // signal. SQL size is the proxy we can check in-JVM: an oracle that
  // explodes textually is exactly the nested-re-inlining bug class,
  // and everything hand-written sits orders of magnitude below these
  // caps (round-6 worst: ~20 KB single, ~190 KB total).
  test("gate budget: no oracle SQL above 64 KB, whole set under 512 KB") {
    val sizes = SparkEntry.oracleSql.view.mapValues(_.length).toMap
    val over = sizes.filter(_._2 > 64 * 1024)
    assert(over.isEmpty,
      s"oracle SQL over 64 KB (combinatorial generation?): " +
        over.map { case (n, s) => s"$n=${s / 1024}KB" }.mkString(", "))
    val total = sizes.values.sum
    assert(total <= 512 * 1024,
      s"oracle_sql.json would be ${total / 1024} KB serialized (cap 512 KB) " +
        "— the driver's DuckDB gate has a finite budget; put the biggest " +
        "oracles on a diet before declaring them")
  }

  // The round-6 failure mode, pinned: the driver's comparator sorts
  // result frames with pandas, and a top-level array/map column raises
  // `TypeError: unhashable type: 'numpy.ndarray'` inside sort_values —
  // the row goes ERR and the query's signal is lost (r6:
  // corpus_inverted_index, text_winnow). Declared results must be flat:
  // join/sort/explode or string-join any collection before returning.
  test("gate shape: no declared query returns a top-level array or map column") {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/lineitem.parquet").exists())
    val spark = TestSpark.spark
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(bad.isEmpty,
      s"array/map-typed output columns crash the driver's pandas " +
        s"comparator (sort_values on ndarray) — flatten or string-join " +
        s"them: ${bad.mkString(", ")}")
  }

  test("README's query count matches the declared inventory") {
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val m = "(\\d+)-query inventory".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README no longer states the inventory size")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.get.group(1)}, inventory is ${SparkEntry.queries.size}")
  }
}
