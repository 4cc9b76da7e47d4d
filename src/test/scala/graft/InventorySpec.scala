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
