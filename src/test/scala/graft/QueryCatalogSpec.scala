package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SURVEY §2 query runs on sf0.001 and the contract invariants
  * hold (one oracle per query unless rows-only; flagship non-empty).
  */
class QueryCatalogSpec extends AnyFunSuite {
  import SparkTestBase._

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query is oracle-checked — no rows-only keys left") {
    // r14: d11, the last rows-only entry, became a recall audit whose
    // exact-reference output the oracle replays — the set is empty
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only set: $rowsOnly")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
