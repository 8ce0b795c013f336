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
}
