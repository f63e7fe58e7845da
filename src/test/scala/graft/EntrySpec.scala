package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows; every query has an
  * oracle; every oracle has a query.
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracles are aligned") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    // queries without an oracle fall back to the driver's rows-only
    // check — allowed ONLY for results DuckDB cannot reproduce
    // (sketch estimates); everything else must be oracle-gated
    val rowsOnly = Set("q85_sketch_profile", "q86_cms_heavyhitters")
    assert(o.subsetOf(q), s"orphan oracles: ${o -- q}")
    assert(q -- o == rowsOnly,
      s"un-oracled queries beyond the sketch allowlist: ${q -- o -- rowsOnly}")
    assert(q.size >= 64)
  }
}
