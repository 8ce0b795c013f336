package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.TestSpark

/** Property tests for the round-7 scalar kernels — each Spark run is
  * ONE batched action over all generated cases (the
  * [[EvalPropertiesSpec]] discipline), judged against independent
  * plain-Scala mirrors.
  */
class TextPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[A](gen: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (1 to n).flatMap(i => gen.apply(params, Seed(i.toLong)))
  }

  // ---- plain-Scala mirrors -------------------------------------------

  private def luhnValid(digits: String): Boolean =
    digits.length >= 13 && digits.length <= 19 && {
      val sum = digits.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val x = 2 * d; if (x > 9) x - 9 else x } else d
      }.sum
      sum % 10 == 0
    }

  private def mirrorValidCount(text: String): Long =
    "[0-9][0-9 -]*[0-9]".r.findAllIn(text)
      .map(_.filter(_.isDigit)).count(luhnValid)

  private def mirrorPassE6(n: Int, c: Int, k: Int): Option[Long] =
    if (n < k) None
    else {
      val num = (0 until k).map(i => BigInt(n - c - i)).product
      val den = (0 until k).map(i => BigInt(n - i)).product
      // the operator's exact sequence: one division of exact integers
      Some(math.floor(
        (1.0 - num.toDouble / den.toDouble) * 1000000.0 + 0.5).toLong)
    }

  // ---- Luhn ----------------------------------------------------------

  test("luhnPanStats n_luhn_valid equals the scala mirror on random text") {
    import spark.implicits._
    val digitRun = for {
      len <- Gen.chooseNum(10, 22)
      ds <- Gen.listOfN(len, Gen.numChar)
      sep <- Gen.oneOf("", " ", "-")
    } yield ds.mkString.grouped(4).mkString(sep)
    val doc = for {
      runs <- Gen.chooseNum(0, 3)
      rs <- Gen.listOfN(runs, digitRun)
      words <- Gen.listOfN(runs + 1,
        Gen.listOfN(3, Gen.alphaChar).map(_.mkString))
    } yield words.zipAll(rs, "", "").map { case (w, r) => s"$w $r" }
      .mkString(" ")
    val cases = sample(doc, 250).zipWithIndex.map { case (t, i) =>
      (i.toLong, t)
    }
    val got = TextAnalytics.luhnPanStats(
        cases.toDF("doc_id", "text"), "doc_id", "text")
      .select("id", "n_luhn_valid").as[(Long, Long)].collect().toMap
    cases.foreach { case (id, text) =>
      assert(got(id) == mirrorValidCount(text), s"doc $id: '$text'")
    }
  }

  test("adjacent PANs fuse into one over-length run (maximality)") {
    import spark.implicits._
    val two = "4111111111111111" * 2 // 32 digits: ONE run, no candidate
    val got = TextAnalytics.luhnPanStats(
        Seq((1L, s"x $two y")).toDF("doc_id", "text"), "doc_id", "text")
      .select("n_runs", "n_pan_candidates", "n_luhn_valid")
      .as[(Long, Long, Long)].head()
    assert(got == ((1L, 0L, 0L)))
  }

  // ---- pass@k --------------------------------------------------------

  test("passAtK equals the BigInt-binomial mirror and is monotone in k") {
    import spark.implicits._
    val g = for {
      n <- Gen.chooseNum(1, 25)
      c <- Gen.chooseNum(0, n)
    } yield (n, c)
    val cases = sample(g, 120).zipWithIndex.map { case ((n, c), i) =>
      (i.toLong, n, c)
    }
    val samples = cases.flatMap { case (task, n, c) =>
      (0 until n).map(j => (task, j < c))
    }
    val got = Retrieval.passAtK(
        samples.toDF("task", "ok"), "task", "ok", ks = Seq(1, 3, 10))
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    cases.foreach { case (task, n, c) =>
      val (_, gn, gc, p1, p3, p10) = got(task)
      assert((gn, gc) == ((n.toLong, c.toLong)))
      assert(p1 == mirrorPassE6(n, c, 1), s"n=$n c=$c k=1")
      assert(p3 == mirrorPassE6(n, c, 3), s"n=$n c=$c k=3")
      assert(p10 == mirrorPassE6(n, c, 10), s"n=$n c=$c k=10")
      // more draws can only help: pass@k non-decreasing in k when defined
      for ((lo, hi) <- Seq((p1, p3), (p3, p10)))
        (lo, hi) match {
          case (Some(a), Some(b)) => assert(a <= b, s"n=$n c=$c")
          case _ => ()
        }
    }
  }

  // ---- script profile ------------------------------------------------

  test("scriptProfile counts are additive under concatenation") {
    import spark.implicits._
    val piece = Gen.oneOf(
      "abc", "где", "αβγ", "你好", "한글", "ابت", "אבג", "नम", "123", " .,")
    val g = for {
      a <- Gen.listOfN(4, piece).map(_.mkString)
      b <- Gen.listOfN(4, piece).map(_.mkString)
    } yield (a, b)
    val cases = sample(g, 80).zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, a, b)
    }
    val rows = cases.flatMap { case (i, a, b) =>
      Seq((i * 3, a), (i * 3 + 1, b), (i * 3 + 2, a + b))
    }
    val names = TextAnalytics.ScriptClasses.map(_._1) :+ "digits"
    val got = TextAnalytics.scriptProfile(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map { r =>
        r.getLong(0) -> names.map(n => r.getLong(r.fieldIndex(n)))
      }.toMap
    cases.foreach { case (i, a, b) =>
      val sumAb = got(i * 3).zip(got(i * 3 + 1)).map { case (x, y) => x + y }
      assert(got(i * 3 + 2) == sumAb, s"case $i: '$a' ++ '$b'")
      // no class ever counts more codepoints than the text holds
      assert(got(i * 3 + 2).forall(_ <= (a + b).codePointCount(0, (a + b).length)))
    }
  }
}
