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
    assert(q == o, s"mismatch: only-queries=${q -- o} only-oracles=${o -- q}")
    assert(q.size >= 64)
  }
}
