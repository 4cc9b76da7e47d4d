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
