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
    // EVERY query is oracle-gated. The two sketch queries (q85/q86)
    // carry partial oracles: rows + schema + exact columns compare
    // for real, while the sketch VALUE columns are approximated on
    // the DuckDB side (its own HLL; exact counts for CMS) — their
    // hash row may legitimately disagree, and the sketch-accuracy
    // contracts live in PipeSpec instead.
    assert(o.subsetOf(q), s"orphan oracles: ${o -- q}")
    assert((q -- o).isEmpty, s"un-oracled queries: ${q -- o}")
    assert(q.size >= 64)
  }
}
