package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("describe: counts, nulls, distincts and moments per column") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, null), (3L, "b"))
      .toDF("k", "s")
    val got = Profiling.describe(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = got("k")
    assert(k.getLong(1) == 4L && k.getLong(2) == 4L && k.getLong(3) == 3L)
    assert(k.getString(4) == "1" && k.getString(5) == "3")
    assert(k.getDouble(6) == 2.25)
    assert(k.getDouble(7) == 0.8292) // sqrt(0.6875) rounded
    val s = got("s")
    assert(s.getLong(1) == 4L && s.getLong(2) == 3L && s.getLong(3) == 2L)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
    assert(s.isNullAt(6) && s.isNullAt(7))
  }
}
