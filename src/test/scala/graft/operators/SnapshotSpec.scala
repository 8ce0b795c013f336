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

  test("applyIncrement upserts, inserts, tombstones, leaves the rest") {
    val corpus = Seq(
      (1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"))
      .toDF("doc_id", "text", "source")
    val inc = Seq(
      (2L, "two-v2", "a", false),  // update
      (4L, "four", "c", false),    // insert
      (3L, "ignored", "b", true))  // delete
      .toDF("doc_id", "text", "source", "deleted")
    val got = Snapshot.applyIncrement(corpus, inc, "doc_id", Some("deleted"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "one", "a"), (2L, "two-v2", "a"), (4L, "four", "c")))
  }

  test("applyIncrement null increment values inherit the corpus value") {
    val corpus = Seq((1L, "keep", "a")).toDF("doc_id", "text", "source")
    val inc = Seq((1L, null.asInstanceOf[String], "b"))
      .toDF("doc_id", "text", "source")
    val got = Snapshot.applyIncrement(corpus, inc, "doc_id")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "keep", "b")))
  }
}
