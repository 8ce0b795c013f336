package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChatDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stats(turns: Seq[(Long, Long, String, String)]) =
    ChatData.conversationStats(
        turns.toDF("conv", "ord", "role", "text"),
        "conv", "ord", "role", "text")
      .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap

  test("conversationStats: hand-computed validity grid") {
    val got = stats(Seq(
      // conv 1: textbook valid u/a/u/a
      (1L, 0L, "user", "hi"), (1L, 1L, "assistant", "hello there"),
      (1L, 2L, "user", "ok"), (1L, 3L, "assistant", "bye"),
      // conv 2: double user turn -> alternation broken
      (2L, 0L, "user", "a"), (2L, 1L, "user", "b"),
      (2L, 2L, "assistant", "c"),
      // conv 3: starts with assistant, ends on user
      (3L, 0L, "assistant", "a"), (3L, 1L, "user", "b"),
      // conv 4: unknown role fails validity but not alternation
      (4L, 0L, "user", "a"), (4L, 1L, "system", "b"),
      (4L, 2L, "assistant", "c"),
      // conv 5: single turn -> no full exchange
      (5L, 0L, "user", "a"),
      // conv 6: out-of-order ordinals still sort by ordinal
      (6L, 3L, "assistant", "zz"), (6L, 0L, "user", "aa")))
    def row(c: Long) = {
      val r = got(c)
      (r.getAs[Long]("n_turns"), r.getAs[Long]("n_user"),
        r.getAs[Long]("n_assistant"), r.getAs[Long]("n_other"),
        r.getAs[Boolean]("starts_user"), r.getAs[Boolean]("ends_assistant"),
        r.getAs[Boolean]("alternates"), r.getAs[Boolean]("valid"),
        r.getAs[Long]("total_chars"))
    }
    assert(row(1L) == ((4L, 2L, 2L, 0L, true, true, true, true, 18L)))
    assert(row(2L) == ((3L, 2L, 1L, 0L, true, true, false, false, 3L)))
    assert(row(3L) == ((2L, 1L, 1L, 0L, false, false, true, false, 2L)))
    assert(row(4L) == ((3L, 1L, 1L, 1L, true, true, true, false, 3L)))
    assert(row(5L) == ((1L, 1L, 0L, 0L, true, false, true, false, 1L)))
    assert(row(6L) == ((2L, 1L, 1L, 0L, true, true, true, true, 4L)))
  }

  test("conversationStats rejects a duplicate ordinal loudly") {
    val e = intercept[Exception] {
      stats(Seq((1L, 0L, "user", "a"), (1L, 0L, "assistant", "b")))
    }
    assert(e.getMessage.contains("duplicate ordinal")
      || e.getCause != null &&
        e.getCause.getMessage.contains("duplicate ordinal"),
      e.getMessage)
  }
}
