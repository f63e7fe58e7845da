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
    // EVERY query is oracle-gated, sketch queries included: q85/q86
    // compare rows + schema + exact columns for real, and their
    // sketch columns are ACCURACY-VERDICT booleans (each engine
    // asserts its own sketch against its own exact counts), so the
    // full row hash is deterministic on both sides — raw estimator
    // values never cross engines. Raw-value accuracy and determinism
    // contracts additionally live in PipeSpec.
    assert(o.subsetOf(q), s"orphan oracles: ${o -- q}")
    assert((q -- o).isEmpty, s"un-oracled queries: ${q -- o}")
    assert(q.size >= 139)
  }
}
