package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DecontaminationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ngrams(text: String, n: Int): Set[String] =
    text.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet

  test("flagContaminated matches a brute-force n-gram overlap oracle") {
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    def doc(seed: Int, len: Int): String = {
      val r = new scala.util.Random(seed)
      Seq.fill(len)(words(r.nextInt(words.length))).mkString(" ")
    }
    val bench = (1L to 5L).map(i => (i, doc(i.toInt, 12))).toDF("bid", "btext")
    val corpus = (10L to 40L).map(i => (i, doc(i.toInt, 15))).toDF("id", "text")

    val got = Decontamination
      .flagContaminated(corpus, "id", "text", bench, "bid", "btext", n = 3)
      .as[(Long, Long, Boolean)].collect().toSeq

    val benchSh = bench.as[(Long, String)].collect()
      .flatMap { case (_, t) => ngrams(t, 3) }.toSet
    val expected = corpus.as[(Long, String)].collect().map { case (id, t) =>
      val hits = ngrams(t, 3).count(benchSh.contains)
      (id, hits.toLong, hits > 0)
    }.toSeq

    assert(got.sortBy(_._1) == expected.sortBy(_._1))
    // the constructed corpus must exercise both outcomes
    assert(expected.exists(_._3) && expected.exists(!_._3))
  }

  test("documents shorter than n tokens are clean with zero hits") {
    val bench = Seq((1L, "a b c d e")).toDF("bid", "btext")
    val corpus = Seq((10L, "a b c"), (11L, "a b c d x")).toDF("id", "text")
    val got = Decontamination
      .flagContaminated(corpus, "id", "text", bench, "bid", "btext", n = 4)
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, h, c) => id -> ((h, c)) }.toMap
    assert(got(10L) == ((0L, false)))
    assert(got(11L) == ((1L, true)))
  }

  test("bloomDecontaminate is byte-identical to the exact test") {
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    def doc(seed: Int, len: Int): String = {
      val r = new scala.util.Random(seed)
      Seq.fill(len)(words(r.nextInt(words.length))).mkString(" ")
    }
    val bench = (1L to 5L).map(i => (i, doc(i.toInt, 12))).toDF("bid", "btext")
    val corpus = (10L to 60L).map(i => (i, doc(i.toInt, 15))).toDF("id", "text")
    val exact = Decontamination
      .flagContaminated(corpus, "id", "text", bench, "bid", "btext", n = 3)
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    val bloom = Decontamination
      .bloomDecontaminate(corpus, "id", "text", bench, "bid", "btext", n = 3)
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(bloom == exact)
    assert(exact.exists(_._3) && exact.exists(!_._3))
  }

  test("bloomDecontaminate: empty benchmark leaves every doc clean") {
    val bench = Seq.empty[(Long, String)].toDF("bid", "btext")
    val corpus = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("id", "text")
    val got = Decontamination
      .bloomDecontaminate(corpus, "id", "text", bench, "bid", "btext", n = 3)
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 0L, false), (2L, 0L, false)))
  }

  test("bloom_filter_agg / might_contain are SQL-callable via extensions") {
    spark.range(100).selectExpr("id * 7 AS k").createOrReplaceTempView("bl_in")
    val bf = spark.sql(
      "SELECT bloom_filter_agg(k, CAST(100 AS BIGINT), CAST(4096 AS BIGINT)) AS bf FROM bl_in")
      .head().getAs[Array[Byte]](0)
    assert(bf != null && bf.length > 0)
    spark.createDataFrame(Seq(Tuple1(bf))).toDF("bf")
      .createOrReplaceTempView("bl_bf")
    // members always hit (no false negatives); non-multiples mostly miss
    val hits = spark.sql(
      """SELECT count(*) FROM range(0, 700) r
        |WHERE might_contain((SELECT bf FROM bl_bf), r.id)""".stripMargin)
      .head().getLong(0)
    assert(hits >= 100 && hits < 300, s"unexpected bloom hit count $hits")
  }

  test("flagNearContaminated catches edited benchmark leaks, ids stay disjoint sides") {
    def doc(seed: Int, len: Int): String = {
      val r = new scala.util.Random(seed)
      (1 to len).map(_ => s"w${r.nextInt(400)}").mkString(" ")
    }
    val bench = (1L to 4L).map(i => (i, doc(i.toInt, 30))).toDF("bid", "btext")
    // corpus: one near-copy of bench doc 2 (first 27 of 30 tokens — high
    // jaccard, zero exact match of all shingles not required), plus
    // unrelated docs; id 2 ALSO exists in the corpus with unrelated text
    // (sides must not be confused by overlapping id spaces)
    val leak = doc(2, 30).split(" ").take(27).mkString(" ")
    val corpus = ((10L to 25L).map(i => (i, doc(1000 + i.toInt, 30))) :+
      (2L, doc(777, 30)) :+ (30L, leak)).toDF("id", "text")
    val got = Decontamination.flagNearContaminated(
        corpus, "id", "text", bench, "bid", "btext", n = 3, threshold = 0.6)
      .as[(Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(30L)._4, "the 90%-overlap leak must be flagged")
    assert(got(30L)._2 > 0.6 && got(30L)._3 == 1L)
    assert(!got(2L)._4, "corpus id 2 is unrelated text; the bench id 2 must not leak onto it")
    assert((10L to 25L).forall(i => !got(i)._4), "unrelated docs stay clean")
    assert(got.size == corpus.count())
  }

  test("contaminationReport aggregates the flag pipeline per slice") {
    val bench = Seq((100L, "the quick brown fox jumps"))
      .toDF("bid", "btext")
    val corpus = Seq(
      // feedA: one leaked doc (shares two 4-grams), one clean
      (1L, "feedA", "intro the quick brown fox jumps end"),
      (2L, "feedA", "totally unrelated words here today"),
      // feedB: all clean (3 docs)
      (3L, "feedB", "alpha beta gamma delta epsilon"),
      (4L, "feedB", "one two three four five six"),
      (5L, "feedB", "red green blue cyan magenta"))
      .toDF("id", "source", "text")
    val got = Decontamination.contaminationReport(
        corpus, "id", "text", "source", bench, "bid", "btext", n = 4)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // feedA: 2 docs, 1 contaminated ("the quick brown fox" + "quick
    // brown fox jumps" = 2 hits), rate 500000
    assert(got("feedA") == (("feedA", 2L, 1L, 2L, 500000L)))
    assert(got("feedB") == (("feedB", 3L, 0L, 0L, 0L)))
  }
}
