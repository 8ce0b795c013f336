package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() yields rows; every declared query runs on
  * sf0.001; every oracleSql key has a matching query.
  */
class EntrySmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  // legitimately empty at the smallest scale factor (every customer has
  // an order at sf0.001)
  private val emptyOk = Set("j7_join_anti")

  test("every query executes and is non-empty on sf0.001") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, TestSpark.Sf0001).count()
      if (n == 0 && !emptyOk(name)) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }
}
