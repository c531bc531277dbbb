package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry consistency: a query registered in `queries` but missing
  * from `oracleSql` silently skips the driver's correctness gate (the
  * checker iterates oracles) — it LOOKS graded while verifying
  * nothing. The contract allows deliberately oracle-less queries, so
  * they must be waived HERE by name, not by omission.
  */
class RegistrySpec extends AnyFunSuite {

  private val waived = Set.empty[String]

  test("every registered query has an oracle, or a named waiver") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val unoracled = q -- o -- waived
    assert(unoracled.isEmpty,
      s"queries with no oracle and no waiver: ${unoracled.toSeq.sorted}")
  }

  test("no oracle points at an unregistered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty,
      s"oracles without a query: ${dangling.toSeq.sorted}")
  }
}
