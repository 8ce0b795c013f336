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

  test("schemaDrift: added/removed/type-changed/kept + null-rate drift") {
    import org.apache.spark.sql.functions.col
    val a = Seq((1L, Some("x"), 10), (2L, Option.empty[String], 20),
        (3L, Some("z"), 30), (4L, Some("w"), 40))
      .toDF("id", "body", "score")
    val b = Seq((1L, Option.empty[String], "s1", 5L),
        (2L, Option.empty[String], "s2", 6L))
      .toDF("id", "body", "tag", "score")
      .select(col("id"), col("body"), col("tag"), col("score"))
    val got = Snapshot.schemaDrift(a, b)
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    def row(c: String) = {
      val r = got(c)
      (r.getAs[String]("status"), Option(r.getAs[String]("dtype_a")),
        Option(r.getAs[String]("dtype_b")),
        Option(r.getAs[Any]("null_rate_a_e6")),
        Option(r.getAs[Any]("null_rate_b_e6")),
        Option(r.getAs[Any]("null_drift_e6")))
    }
    assert(row("id") == (("kept", Some("bigint"), Some("bigint"),
      Some(0L), Some(0L), Some(0L))))
    // body: 1/4 null -> 1/1 null: drift = 1e6 - 250000
    assert(row("body") == (("kept", Some("string"), Some("string"),
      Some(250000L), Some(1000000L), Some(750000L))))
    assert(row("tag") == (("added", None, Some("string"),
      None, Some(0L), None)))
    // score: int -> bigint
    assert(row("score") == (("type_changed", Some("int"),
      Some("bigint"), Some(0L), Some(0L), None)))
    assert(got.size == 4)
    // an empty snapshot has no defined rates
    val e = Snapshot.schemaDrift(a.filter(col("id") < 0), b)
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(e("id").isNullAt(e("id").fieldIndex("null_rate_a_e6")))
  }

  test("retention: last-n precedence, daily thinning window, raises") {
    import spark.implicits._
    val h = 3600L * 1000 * 1000 * 1000
    val d = 24L * h
    // days 0,0,1,2,2,8,9 — keepLast=1 keeps only id 6 (newest); the
    // daily window (> 9−3 = 6) keeps the last of days 8 and 9; day 9's
    // last is already last_n (precedence), day 8's id 7 reads 'daily'
    val snaps = Seq(
      (1L, 1 * h), (2L, 5 * h), (3L, d + h), (4L, 2 * d + h),
      (5L, 2 * d + 3 * h), (7L, 8 * d + h), (6L, 9 * d + h))
      .toDF("id", "ts")
    val got = Snapshot.retention(snaps, "id", "ts",
        keepLast = 1, keepDays = 3)
      .as[(Long, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._4, r._5, r._6))).toMap
    assert(got(6L) == ((1L, "keep", "last_n")))
    assert(got(7L) == ((2L, "keep", "daily")))
    // day 2's last (id 5) is OUTSIDE the daily window -> expires
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(got(_)._2 == "expire"))
    // same-ts tie inside a day breaks on the higher id, deterministic
    val tie = Snapshot.retention(
        Seq((10L, 1 * h), (11L, 1 * h)).toDF("id", "ts"), "id", "ts",
        keepLast = 0, keepDays = 1)
      .as[(Long, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r._6).toMap
    assert(tie == Map(10L -> "expire", 11L -> "daily"))
    val dup = intercept[IllegalArgumentException] {
      Snapshot.retention(
        Seq((1L, 1 * h), (1L, 2 * h)).toDF("id", "ts"), "id", "ts")
    }
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)
  }
}
