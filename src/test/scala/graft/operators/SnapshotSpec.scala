package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged by content") {
    val oldV = Seq(
      (1L, "stays the same"), (2L, "will change"), (3L, "will be removed"),
      (5L, "whitespace  only")).toDF("doc_id", "text")
    val newV = Seq(
      (1L, "stays the same"), (2L, "has changed"), (4L, "brand new"),
      (5L, "white space only")).toDF("doc_id", "text") // fp-equal variant
    val got = Snapshot.diff(oldV, newV, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged"))
  }
}
