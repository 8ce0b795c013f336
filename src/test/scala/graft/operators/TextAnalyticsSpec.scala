package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.TestSpark

class TextAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat and the dog"),
    (2L, "el perro y la casa es de la que"),
    (3L, "zzz yyy xxx www")
  ).toDF("doc_id", "text")

  test("tokenStats computes counts and ratios") {
    val r = TextAnalytics.tokenStats(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val d1 = r(1L)
    assert(d1.getAs[Int]("n_tokens") == 5)
    assert(d1.getAs[Int]("n_chars") == 19)
    // tokens: the(3) cat(3) and(3) the(3) dog(3) -> avg 3.0
    assert(d1.getAs[Double]("avg_token_len") == 3.0)
    assert(d1.getAs[Double]("uniq_ratio") == 0.8) // 4 distinct / 5
  }

  test("qualityScore blends ratios deterministically") {
    val r = TextAnalytics.qualityScore(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    // doc1: stop 3/5 ("the" x2, "and"), uniq 4/5, length<20 -> 0.5 weight
    val want = math.rint((0.6 * 0.25 + 0.8 * 0.5 + 0.5 * 0.25) * 10000) / 10000
    assert(r(1L).getAs[Double]("quality") == want)
    assert(r(3L).getAs[Double]("stop_ratio") == 0.0)
  }

  test("repetitionStats: top-bigram and duplicate-trigram fractions") {
    val reps = Seq(
      (1L, "a b a b a b"), // bigrams: ab,ba,ab,ba,ab -> top 3/5; trigrams all dup -> 4/4
      (2L, "x y z w"),     // bigrams distinct -> 1/3; trigrams distinct -> 0/2
      (3L, "x y")          // < 3 tokens: excluded
    ).toDF("doc_id", "text")
    val r = TextAnalytics.repetitionStats(reps, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L).getAs[Double]("top_bigram_frac") == 0.6)
    assert(r(1L).getAs[Double]("dup_trigram_frac") == 1.0)
    assert(r(2L).getAs[Double]("top_bigram_frac") == 0.3333)
    assert(r(2L).getAs[Double]("dup_trigram_frac") == 0.0)
  }

  test("packingPlan assigns chunk by start offset, independent per stream") {
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val d = Seq(
      (1L, "a", words(4)),  // start 0  -> chunk 0, off 0
      (2L, "a", words(5)),  // start 4  -> chunk 0, off 4
      (3L, "a", words(4)),  // start 9  -> chunk 0, off 9 (straddles into 1)
      (4L, "a", words(12)), // start 13 -> chunk 1, off 3
      (5L, "b", words(11))  // own stream: start 0 -> chunk 0, off 0
    ).toDF("doc_id", "src", "text")
    val got = TextAnalytics.packingPlan(d, "doc_id", "text", "src", budget = 10)
      .select("id", "chunk", "chunk_off").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> (0L, 0L), 2L -> (0L, 4L), 3L -> (0L, 9L),
      4L -> (1L, 3L), 5L -> (0L, 0L)))
  }

  test("langId picks marker language with precedence, und on no evidence") {
    val r = TextAnalytics.langId(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(r(1L) == "en")
    assert(r(2L) == "es")
    assert(r(3L) == "und")
  }

  test("bpeish token count separates words, numbers, punctuation") {
    val df = Seq((1L, "hello world 42 times, ok!")).toDF("doc_id", "text")
    val r = TextAnalytics.bpeishTokenCount(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("ws_tokens") == 5)
    // hello, world, 42, times, ',', ok, '!'
    assert(r.getAs[Long]("bpeish_tokens") == 7)
  }

  test("winnowing: identical docs share all fingerprints, long shared substring overlaps") {
    val base = "the quick brown fox jumps over the lazy dog repeatedly tonight"
    val df = Seq(
      (1L, base),
      (2L, base),
      (3L, "zzzz completely unrelated content with other words qqqq"),
      (4L, "PREFIX " + base + " SUFFIX")
    ).toDF("doc_id", "text")
    val fp = TextAnalytics.winnowFingerprints(df, "doc_id", "text")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fp(1L) == fp(2L))
    assert((fp(1L) intersect fp(4L)).nonEmpty)  // shared substring -> shared prints
    assert((fp(1L) intersect fp(3L)).isEmpty)
  }

  test("fingerprint is whitespace/case invariant") {
    val two = Seq((1L, "Hello World"), (2L, "hello  world"), (3L, "other"))
      .toDF("doc_id", "text")
    val fp = TextAnalytics.fingerprints(two, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("tfIdf ranks rare discriminative terms above ubiquitous ones") {
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the dog sat on the log"),
      (2L, "the bird flew over the log")
    ).toDF("doc_id", "text")
    val got = TextAnalytics.tfIdfTopTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
    // "the" appears in every doc (idf = 0) so it can never rank; the
    // doc-unique terms must lead
    assert(got(0L).head == "cat" || got(0L).head == "mat")
    assert(!got.values.flatten.toSet.contains("the"))
    // deterministic tie-break: doc 0's top-2 are its unique terms sorted
    assert(got(0L).toSet == Set("cat", "mat"))
  }

  test("unigramLogProb: mean -ln p(token) under the corpus unigram model") {
    // counts: a=2, b=2, c=1, total=5
    val docs = Seq((0L, "a a b"), (1L, "b c")).toDF("doc_id", "text")
    val got = TextAnalytics.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    // doc 0: every token has p = 2/5 -> mean = ln(2.5)
    assert(got(0L)._1 == 3L)
    assert(got(0L)._2 == BigDecimal(math.log(2.5))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // doc 1: (-ln(2/5) - ln(1/5)) / 2
    val exp1 = (math.log(5.0 / 2) + math.log(5.0)) / 2
    assert(got(1L)._1 == 2L)
    assert(math.abs(got(1L)._2 - exp1) < 5e-5)
    // rare-token soup scores strictly higher than common-token text
    assert(got(1L)._2 > got(0L)._2)
  }

  test("redactPii: counts on the original, typed placeholders in order") {
    val pii = Seq(
      (1L, "mail bob.smith+x@corp.example.org or alice@a.io, call 555-123-4567"),
      (2L, "server at 192.168.0.1 and 10.0.0.255, no mail"),
      (3L, "clean text with nothing to hide"),
      // numeric host is no email (TLD must be alpha) but IS a dotted quad
      (4L, "u@42.17.3.10 and 1234-567-8901 has no 3-3-4 boundary")
    ).toDF("doc_id", "text")
    val r = TextAnalytics.redactPii(pii, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L)._2 == 2 && r(1L)._3 == 1 && r(1L)._4 == 0)
    assert(r(1L)._5 == "mail <EMAIL> or <EMAIL>, call <PHONE>")
    assert(r(2L)._2 == 0 && r(2L)._3 == 0 && r(2L)._4 == 2)
    assert(r(2L)._5 == "server at <IP> and <IP>, no mail")
    assert(r(3L)._5 == "clean text with nothing to hide")
    // no alpha TLD -> not an email; \b kills the 4-3-4 phone; quad is an IP
    assert(r(4L)._2 == 0 && r(4L)._3 == 0 && r(4L)._4 == 1)
    assert(r(4L)._5 == "u@<IP> and 1234-567-8901 has no 3-3-4 boundary")
  }

  test("chunkDocs properties: count formula, coverage, full non-last chunks") {
    val rnd = new scala.util.Random(42)
    val lens = Seq(1, 2, 19, 20, 21, 29, 30, 31, 49, 50, 51) ++
      Seq.fill(60)(1 + rnd.nextInt(200))
    val docs = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(j => s"d${i}_$j").mkString(" ")) }
      .toDF("doc_id", "text")
    for ((c, s) <- Seq((30, 20), (30, 30), (16, 7))) {
      val byDoc = TextAnalytics.chunkDocs(docs, "doc_id", "text", c, s)
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      for ((n, i) <- lens.zipWithIndex) {
        val chunks = byDoc(i.toLong)
        val wantCount = if (n <= c) 1 else (n - c + s - 1) / s + 1
        assert(chunks.length == wantCount, s"n=$n c=$c s=$s")
        // token multiset coverage: chunk i holds tokens [i*s+1, i*s+c]
        val covered = chunks.flatMap(_._4.split(" ")).toSet
        assert(covered == (1 to n).map(j => s"d${i}_$j").toSet, s"n=$n c=$c s=$s")
        // every non-last chunk is full; sizes match the reported count
        chunks.dropRight(1).foreach(ch => assert(ch._3 == c))
        chunks.foreach(ch => assert(ch._4.split(" ").length == ch._3))
      }
    }
  }

  test("urlStats: counts, lowercased sorted distinct domains") {
    val docs = Seq(
      (1L, "read https://A.Example.com/x and https://a.example.com/y plus http://b.org/z"),
      (2L, "no links here"),
      (3L, "edge https://c.net")
    ).toDF("doc_id", "text")
    val got = TextAnalytics.urlStats(docs, "doc_id", "text")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, "a.example.com,b.org")))
    assert(got(2L) == ((2L, 0L, "")))
    assert(got(3L) == ((3L, 1L, "c.net")))
  }

  test("tokenEntropy: 0 for repetition, ln(n) for distinct, hand value between") {
    val docs = Seq(
      (1L, "x x x x"),              // H = 0
      (2L, "a b c d e"),            // H = ln 5
      (3L, "a a b b c c c c")       // n=8: ln 8 - (2·2ln2 + 4ln4)/8
    ).toDF("doc_id", "text")
    val got = TextAnalytics.tokenEntropy(docs, "doc_id", "text", roundTo = 6)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 1L, 0.0)))
    assert(math.abs(got(2L)._4 - math.log(5)) < 1e-6 && got(2L)._3 == 5L)
    val h3 = math.log(8) - (2 * 2 * math.log(2) + 4 * math.log(4)) / 8
    assert(math.abs(got(3L)._4 - h3) < 1e-6)
    // spread-out repetition scores lower entropy than distinct text of equal length
    assert(got(3L)._4 < math.log(8) && got(3L)._4 > 0)
  }

  test("quality gates: exact percentile vs approx cutoff agree, monotone per group") {
    // two sources with distinct quality profiles (lengths vary -> distinct scores)
    val docs = (1L to 30L).map { i =>
      val n = 20 + (i * 7 % 25).toInt
      (i, if (i % 2 == 0) "a" else "b",
        (1 to n).map(j => if (j % 3 == 0) "the" else s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val exact = TextAnalytics.qualityPercentileGate(
      docs, "doc_id", "text", "source", keepFrac = 0.5)
      .as[(Long, String, Double, Double)].collect()
    val approx = TextAnalytics.qualityCutoffGate(
      docs, "doc_id", "text", "source", keepFrac = 0.5)
      .as[(Long, String, Double)].collect()
    // roughly half of each group survives the exact gate
    val perGrp = exact.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perGrp("a") >= 7 && perGrp("a") <= 9, perGrp.toString)
    assert(perGrp("b") >= 7 && perGrp("b") <= 9, perGrp.toString)
    // monotone: every kept row outscores every dropped row of its group
    val all = TextAnalytics.qualityScore(docs, "doc_id", "text")
      .select("id", "quality").as[(Long, Double)].collect().toMap
    for (gate <- Seq(exact.map(r => (r._1, r._2)).toSet,
        approx.map(r => (r._1, r._2)).toSet); grp <- Seq("a", "b")) {
      val ids = (1L to 30L).filter(i => (if (i % 2 == 0) "a" else "b") == grp)
      val (kept, dropped) = ids.partition(i => gate.contains((i, grp)))
      assert(kept.nonEmpty && dropped.nonEmpty)
      assert(kept.map(all).min >= dropped.map(all).max,
        s"$grp: kept min ${kept.map(all).min} < dropped max ${dropped.map(all).max}")
    }
    // high-accuracy sketch on a small corpus: the two gates keep the same set
    assert(exact.map(r => (r._1, r._2)).toSet == approx.map(r => (r._1, r._2)).toSet)
  }

  test("chunkDocs: sliding windows cover every token, overlap = size - stride") {
    def text(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text(50)), (2L, text(10)), (3L, text(71)))
      .toDF("doc_id", "text")
    val got = TextAnalytics.chunkDocs(docs, "doc_id", "text",
        chunkSize = 30, stride = 20)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // n=50: chunks [1..30], [21..50]; n=10: one short chunk; n=71: 4 chunks
    assert(got(1L).map(_._3).toSeq == Seq(30L, 30L))
    assert(got(1L)(1)._4.startsWith("w21 ") && got(1L)(1)._4.endsWith(" w50"))
    assert(got(2L).toSeq == Seq((2L, 0L, 10L, text(10))))
    assert(got(3L).map(_._3).toSeq == Seq(30L, 30L, 30L, 11L))
    assert(got(3L)(3)._4 == (61 to 71).map(i => s"w$i").mkString(" "))
    // coverage: the set of tokens across chunks is exactly the document
    val toks = got(3L).flatMap(_._4.split(" ")).toSet
    assert(toks == (1 to 71).map(i => s"w$i").toSet)
  }

  test("domainBlocklistFilter: case-folded overlap, URL-free docs clean") {
    val docs = Seq(
      (1L, "visit https://Bad.Example.COM/x now"),
      (2L, "visit https://good.example.com/x now"),
      (3L, "no links at all")).toDF("doc_id", "text")
    val bl = Seq("bad.example.com").toDF("domain")
    val got = TextAnalytics
      .domainBlocklistFilter(docs, "doc_id", "text", bl, "domain")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(1L) == ((1L, true)))
    assert(got(2L) == ((1L, false)))
    assert(got(3L) == ((0L, false)))
  }

  test("gopherSignals: hand-computed doc-quality fractions") {
    val docs = Seq((1L, "the cat ### 42")).toDF("doc_id", "text")
    val r = TextAnalytics.gopherSignals(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    // 4 words; chars 14 - 3 spaces = 11 -> 2.75; alpha 2/4; stop 1/4; # 3/4
    assert(r == ((1L, 4L, 2.75, 0.5, 0.25, 0.75)))
  }

  test("bigramLogProb matches hand-computed add-one bigram NLLs") {
    // corpus: "a b a", "a b"; V = 2; c(a,b)=2, c(b,a)=1; hist a=2, b=1
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "a"))
      .toDF("doc_id", "text")
    val got = TextAnalytics.bigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc1: -ln(3/4), -ln(2/3) -> mean 0.3466; doc2: -ln(3/4) = 0.2877
    assert(got(1L) == ((2L, 0.3466)))
    assert(got(2L) == ((1L, 0.2877)))
    assert(!got.contains(3L)) // single token: no bigrams, not emitted
  }

  test("bm25 matches a hand-computed Okapi model") {
    val docs = Seq(
      (1L, "spark query engine"),
      (2L, "query query planner"),
      (3L, "storage layer notes"),
      (4L, "spark spark spark runtime")).toDF("doc_id", "text")
    val got = TextAnalytics.bm25(docs, "doc_id", "text",
        Seq("spark", "query"), k1 = 1.2, b = 0.75)
      .as[(Long, Double)].collect().toMap
    // independent scalar model
    val lens = Map(1L -> 3.0, 2L -> 3.0, 3L -> 3.0, 4L -> 4.0)
    val avgdl = lens.values.sum / 4
    val n = 4.0
    def idf(df: Double) = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, len: Double, df: Double) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * len) / avgdl))
    val exp = Map(
      1L -> (w(1, 3, 2) + w(1, 3, 2)), // spark df=2, query df=2
      2L -> w(2, 3, 2),
      4L -> w(3, 4, 2))
    assert(got.keySet == exp.keySet) // doc 3 has no query term: absent
    exp.foreach { case (id, v) =>
      assert(got(id) == math.rint(v * 1e4) / 1e4 ||
        math.abs(got(id) - v) < 5e-5, s"doc $id: ${got(id)} vs $v")
    }
  }

  test("pmi collocations match the hand computation") {
    // corpus: "a b a b" and "a b c" -> tokens N=7 (a:3 b:3 c:1),
    // bigrams B=5: (a,b)x3, (b,a)x1, (b,c)x1
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalytics.collocationsPmi(df, "doc_id", "text",
        minCount = 2L)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(got.length == 1) // only (a,b) reaches the floor
    val (w1, w2, c12, c1, c2, pmi) = got.head
    assert((w1, w2, c12, c1, c2) == (("a", "b", 3L, 3L, 3L)))
    // ln((3/5) / ((3/7)*(3/7))) = ln(49/15)
    val exp = math.rint(math.log((3.0 / 5.0) /
      ((3.0 / 7.0) * (3.0 / 7.0))) * 1e6) / 1e6
    assert(pmi == exp, s"$pmi vs $exp")
  }

  test("readability matches the hand-computed FK grade") {
    // "the cat sat. it ran!" -> words 5, sentences 2 (. and !),
    // syllables: e,a,a,i,a -> 5
    // fk = 0.39*(5/2) + 11.8*(5/5) - 15.59 = 0.975 + 11.8 - 15.59 = -2.815
    val got = TextAnalytics.readability(
        Seq((1L, "the cat sat. it ran!")).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got == ((1L, 5L, 2L, 5L,
      math.floor((0.39 * 2.5 + 11.8 * 1.0 - 15.59) * 1e4 + 0.5).toLong)))
  }

  test("readability floors sentences at 1 and nulls zero-word docs") {
    val got = TextAnalytics.readability(
        Seq((1L, "no terminal punctuation here"), (2L, "")).toDF(
          "doc_id", "text"),
        "doc_id", "text")
      .select("id", "n_sentences", "fk_e4")
      .as[(Long, Long, Option[Long])].collect().sortBy(_._1)
    assert(got(0)._2 == 1L && got(0)._3.isDefined)
    assert(got(1)._3.isEmpty) // empty text: 0 words -> NULL grade
  }

  test("pmi floor bounds the output and independence scores near zero") {
    // strict alternation: cross-symbol bigrams are ~2x the independence
    // expectation (pmi > 0) and same-symbol bigrams never occur (absent
    // — the floor plus zero count, not a -inf row)
    val text = (1 to 50).map(i => if (i % 2 == 0) "x" else "y").mkString(" ")
    val got = TextAnalytics.collocationsPmi(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        minCount = 5L)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._6).toMap
    // strict alternation: (y,x) and (x,y) exist, (x,x)/(y,y) never do
    assert(got.keySet == Set(("x", "y"), ("y", "x")))
    // pmi = ln((24or25/49) / (25*24/2500-ish)) > 0 for the observed pairs
    assert(got.values.forall(_ > 0.0))
  }

  test("lexiconScore: weighted hit rate on the token grid, hand-checked") {
    val lex = Map("bad" -> 3, "worse" -> 5)
    val rows = Seq(
      (1L, "bad bad worse ok"),  // 4 toks, 3 hits, w-sum 11
      (2L, "all clean here"),    // 0 hits
      (3L, "worse")              // 1 tok, 1 hit, w-sum 5
    ).toDF("doc_id", "text")
    val got = TextAnalytics.lexiconScore(rows, "doc_id", "text", lex)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // floor(11*1e4/4 + .5) = 27500
    assert(got(1L) == ((1L, 4L, 3L, Some(27500L))))
    assert(got(2L) == ((2L, 3L, 0L, Some(0L))))
    // floor(5*1e4/1 + .5) = 50000
    assert(got(3L) == ((3L, 1L, 1L, Some(50000L))))
    intercept[IllegalArgumentException] {
      TextAnalytics.lexiconScore(rows, "doc_id", "text", Map.empty)
    }
    intercept[IllegalArgumentException] {
      TextAnalytics.lexiconScore(rows, "doc_id", "text", Map("x" -> 0))
    }
  }

  test("perplexityBuckets: per-language tertile thresholds, ties share a tier") {
    // mixed corpus: ten en docs of varying token rarity (every doc holds
    // at least one 'the' so langId says en), five und docs, and one
    // duplicated text (ids 9 & 10) to pin the tie rule at a boundary
    val corpus: Seq[(Long, String)] = Seq(
      1L -> "the the the the",
      2L -> "the the the qq1",
      3L -> "the the qq2 qq3",
      4L -> "the qq4 qq5 qq6",
      5L -> "the rare7 rare8 rare9",
      6L -> "the the qq1 qq1",
      7L -> "the zz zz zz",
      8L -> "the zz qq2 rare7",
      9L -> "the the the zz",
      10L -> "the the the zz",
      11L -> "uno dos tres cuatro",
      12L -> "uno uno dos dos",
      13L -> "blip blop bleep bloop",
      14L -> "uno blip zz qq4",
      15L -> "mmm nnn ooo ppp")
    val docs = corpus.toDF("doc_id", "text")
    val got = TextAnalytics.perplexityBuckets(docs, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("lang"), r.getAs[Double]("mean_nll"),
          r.getAs[String]("tier"))))
      .toMap

    // independent plain-Scala model: unigram counts -> per-doc rounded
    // mean NLL, marker-count language, histogram tertile thresholds
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val counts = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val total = toks.map(_._2.size).sum.toDouble
    val nll = toks.map { case (id, ws) =>
      val m = ws.map(w => -math.log(counts(w) / total)).sum / ws.size
      id -> BigDecimal(m).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }.toMap
    val en = Set("the", "a", "of", "and", "is")
    val lang = toks.map { case (id, ws) =>
      id -> (if (ws.count(en) > 0) "en" else "und")
    }.toMap
    val expected = corpus.map(_._1).groupBy(lang).flatMap { case (_, ids) =>
      val grid = ids.map(nll).sorted.distinct
      val cum = grid.map(v => v -> ids.count(i => nll(i) <= v)).toMap
      val n = ids.size
      val headMax = grid.find(v => cum(v) * 3 >= n).get
      val midMax = grid.find(v => cum(v) * 3 >= 2 * n).get
      ids.map { i =>
        i -> (if (nll(i) <= headMax) "head"
              else if (nll(i) <= midMax) "middle" else "tail")
      }
    }
    assert(got.keySet == corpus.map(_._1).toSet)
    for ((id, tier) <- expected) {
      assert(got(id)._1 == lang(id), s"lang of $id")
      assert(got(id)._2 == nll(id), s"nll of $id")
      assert(got(id)._3 == tier, s"tier of $id")
    }
    // identical texts always share a tier, whatever the cuts landed on
    assert(got(9L)._3 == got(10L)._3)
    // tiers are monotone in NLL within each language
    for (l <- Seq("en", "und")) {
      val byTier = got.values.filter(_._1 == l).toSeq.groupBy(_._3)
      def rng(t: String) = byTier.getOrElse(t, Nil).map(_._2)
      if (rng("head").nonEmpty && rng("middle").nonEmpty)
        assert(rng("head").max <= rng("middle").min)
      if (rng("middle").nonEmpty && rng("tail").nonEmpty)
        assert(rng("middle").max <= rng("tail").min)
    }
  }

  test("ngramNovelty: shared shingles are not novel, short docs drop") {
    val docs = Seq(
      (1L, "a b c d"),  // shingles {a b c, b c d}
      (2L, "a b c x"),  // shingles {a b c, b c x}
      (3L, "z z"))      // < 3 tokens → no shingle set
      .toDF("doc_id", "text")
    val got = TextAnalytics.ngramNovelty(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L))
    // each doc: 2 shingles, 1 unique ("a b c" has df = 2) → 50%
    for (id <- Seq(1L, 2L)) {
      assert(got(id)._2 == 2L && got(id)._3 == 1L)
      assert(got(id)._4 == 500000L)
    }
    // repeated shingles inside one doc count once (distinct set)
    val rep = Seq((7L, "p q r p q r p q r")).toDF("doc_id", "text")
    val r7 = TextAnalytics.ngramNovelty(rep, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect().head
    // distinct shingles of p q r p q r p q r: 3 rotations, all df=1
    assert(r7._2 == 3L && r7._3 == 3L && r7._4 == 1000000L)
  }

  test("htmlExtract strips boilerplate and reports link structure") {
    val page =
      "<html><head><title>My Page</title>" +
        "<style type=\"text/css\">body { color: red }</style>" +
        "<script>if (a < b) { alert('<p>'); }</script></head>" +
        "<body><h1>Head</h1><p>Tom &amp; Jerry say &amp;lt;hi&amp;gt; " +
        "&quot;loudly&quot;&nbsp;today</p>" +
        "<a href=\"/1\">one</a> <a\nhref=\"/2\">two</a></body></html>"
    val got = TextAnalytics.htmlExtract(
        Seq((1L, page), (2L, "<p>no title here</p>")).toDF("doc_id", "html"),
        "doc_id", "html")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val p = got(1L)
    assert(p.getAs[String]("title") == "My Page")
    // script/style bodies gone (including the '<p>' inside the script
    // string and the `a < b` comparison), tags gone, entities decoded
    // exactly one level (&amp;lt; → &lt;, never <), whitespace collapsed
    assert(p.getAs[String]("text") ==
      "My Page Head Tom & Jerry say &lt;hi&gt; \"loudly\" today one two")
    assert(p.getAs[Long]("n_links") == 2L)
    assert(p.getAs[Long]("n_tokens") == 12L)
    // round(2 / 12 * 1e6) = 166667
    assert(p.getAs[Long]("link_density_e6") == 166667L)
    val q = got(2L)
    assert(q.getAs[String]("title") == "")
    assert(q.getAs[String]("text") == "no title here")
    assert(q.getAs[Long]("n_links") == 0L)
    assert(q.getAs[Long]("link_density_e6") == 0L)
  }

  test("htmlExtract: empty-body page reports 0 tokens and NULL density") {
    // A nav-only page whose extracted text is empty used to read
    // n_tokens = 1 (split("", " ") = [""]) — understating link density
    // for exactly the pages the signal exists to flag.
    val got = TextAnalytics.htmlExtract(
        Seq((1L, "<body><a href=\"/x\"></a><a href=\"/y\"></a></body>"))
          .toDF("doc_id", "html"),
        "doc_id", "html")
      .collect().head
    assert(got.getAs[String]("text") == "")
    assert(got.getAs[Long]("n_tokens") == 0L)
    assert(got.getAs[Long]("n_links") == 2L)
    assert(got.isNullAt(got.fieldIndex("link_density_e6")))
  }

  test("codeQuality: hand-computed line profile and keep verdict") {
    val code = "a = 1\n# c\n\nzz zz"
    val minified = "x" * 1200 // one 1200-char line: fails max_line_len
    val got = TextAnalytics.codeQuality(
        Seq((1L, code), (2L, minified), (3L, "")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val c = got(1L)
    assert(c.getAs[Long]("n_lines") == 4L)
    assert(c.getAs[Long]("max_line_len") == 5L)
    // mean 13/4 = 3.25 on the 1e-4 lattice
    assert(c.getAs[Long]("mean_line_len_e4") == 32500L)
    // alnum: a,1,c,z,z,z,z = 7 of 16 chars
    assert(c.getAs[Long]("alnum_frac_e6") == 437500L)
    // 1 comment line of 4
    assert(c.getAs[Long]("comment_frac_e6") == 250000L)
    assert(c.getAs[Boolean]("keep"))
    assert(!got(2L).getAs[Boolean]("keep"))
    assert(got(2L).getAs[Long]("max_line_len") == 1200L)
    // empty file: 1 empty line, NULL alnum fraction, fails keep
    val e = got(3L)
    assert(e.getAs[Long]("n_lines") == 1L)
    assert(e.isNullAt(e.fieldIndex("alnum_frac_e6")))
    assert(!e.getAs[Boolean]("keep"))
  }

  test("fimSplit: deterministic cuts reassemble to the original text") {
    val got = TextAnalytics.fimSplit(
        Seq((1L, "abcdef"), (2L, "ab"), (3L, "")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val a = got(1L)
    // id 1, len 6: cut1 = 1 + 31 % 4 = 4, cut2 = 5 + 17 % 1 = 5
    assert(a.getAs[Boolean]("fim"))
    assert(a.getAs[String]("prefix") == "abcd")
    assert(a.getAs[String]("middle") == "e")
    assert(a.getAs[String]("suffix") == "f")
    assert(a.getAs[String]("fim_text") == "<PRE>abcd<SUF>f<MID>e")
    // too short: pass-through, fim = false
    assert(!got(2L).getAs[Boolean]("fim"))
    assert(got(2L).getAs[String]("prefix") == "ab")
    assert(got(2L).getAs[String]("fim_text") == "ab")
    assert(!got(3L).getAs[Boolean]("fim"))
    // reassembly property on a spread of ids/lengths
    val docs = (0L until 200L)
      .map(i => (i, ("lorem ipsum dolor sit amet " * (1 + i % 7).toInt)
        .take(3 + (i % 50).toInt)))
    val all = TextAnalytics.fimSplit(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
    val byId = docs.toMap
    all.foreach { r =>
      val id = r.getAs[Long]("id")
      assert(r.getAs[String]("prefix") + r.getAs[String]("middle") +
        r.getAs[String]("suffix") == byId(id), s"id $id")
      if (r.getAs[Boolean]("fim")) {
        assert(r.getAs[String]("middle").nonEmpty, s"id $id middle")
        assert(r.getAs[String]("suffix").nonEmpty, s"id $id suffix")
      }
    }
  }

  test("skipgramPairs: hand-computed window-2 fan-out") {
    val got = TextAnalytics.skipgramPairs(
        Seq(("a b c", 1)).toDF("text", "x"), "text",
        window = 2, minCount = 1L)
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // adjacencies: (a,b), (b,c) at k=1; (a,c) at k=2 — both directions
    assert(got == Map(
      ("a", "b") -> 1L, ("b", "a") -> 1L,
      ("b", "c") -> 1L, ("c", "b") -> 1L,
      ("a", "c") -> 1L, ("c", "a") -> 1L))
    // minCount floors rare pairs; repeated text multiplies counts
    val floored = TextAnalytics.skipgramPairs(
        Seq(("a b", 1), ("a b", 2), ("a c", 3)).toDF("text", "x"),
        "text", window = 2, minCount = 2L)
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(floored == Map(("a", "b") -> 2L, ("b", "a") -> 2L))
  }

  test("normalizeText unifies typography and drops zero-widths") {
    val got = TextAnalytics.normalizeText(
        Seq(
          (1L, "“Hi” — it’s fine…"),
          (2L, "zero​width and　spaces"),
          (3L, "already plain text"),
          (4L, "  padded\t \n inside  "))
          .toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("text_norm"), r.getAs[Boolean]("changed")))).toMap
    assert(got(1L) == (("\"Hi\" - it's fine...", true)))
    assert(got(2L) == (("zerowidth and spaces", true)))
    assert(got(3L) == (("already plain text", false)))
    // whitespace collapse + trim counts as a change
    assert(got(4L) == (("padded inside", true)))
  }

  test("mojibakeStats counts artifacts, FFFD and controls exactly") {
    val rows = TextAnalytics.mojibakeStats(
        Seq(
          (1L, "clean text with tabs\tand\nnewlines"),
          (2L, "cafÃ© and another cafÃ©"),
          (3L, "âquotedâ"),
          (4L, "lost�twice�"),
          (5L, "bell\u0007null\u0000esc\u001b"))
          .toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_mojibake"), r.getAs[Long]("n_replacement"),
          r.getAs[Long]("n_control"), r.getAs[Boolean]("is_clean")))).toMap
    // tab/LF are legitimate whitespace, not "control" damage
    assert(rows(1L) == ((0L, 0L, 0L, true)))
    assert(rows(2L) == ((2L, 0L, 0L, false)))
    // one opening + one closing smart-quote artifact
    assert(rows(3L) == ((2L, 0L, 0L, false)))
    assert(rows(4L) == ((0L, 2L, 0L, false)))
    assert(rows(5L) == ((0L, 0L, 3L, false)))
  }

  test("sentenceSplit: abbreviation guards, ordinals, token counts") {
    val got = TextAnalytics.sentenceSplit(
        Seq(
          (1L, "Hello world. Dr. Smith vs. the U.S. won! Was it fun? " +
            "Pi is 3.14 here. See Fig. 2 for more..."),
          (2L, "  . leading dot"),
          (3L, "no terminator at all"))
          .toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("sent_idx")) ->
        ((r.getAs[String]("sentence"), r.getAs[Long]("n_tokens")))).toMap
    // Dr./vs./Fig. guarded; U.S. splits after "S." (heuristic contract);
    // 3.14 never splits (no whitespace after the dot); trailing "..."
    // has no following whitespace, so it stays with its sentence
    assert(got((1L, 1L)) == (("Hello world.", 2L)))
    assert(got((1L, 2L)) == (("Dr. Smith vs. the U.S.", 5L)))
    assert(got((1L, 3L)) == (("won!", 1L)))
    assert(got((1L, 4L)) == (("Was it fun?", 3L)))
    assert(got((1L, 5L)) == (("Pi is 3.14 here.", 4L)))
    assert(got((1L, 6L)) == (("See Fig. 2 for more...", 5L)))
    // the lone dot survives as its own piece; idx keeps split ordinals
    assert(got((2L, 1L)) == ((".", 1L)))
    assert(got((2L, 2L)) == (("leading dot", 2L)))
    assert(got((3L, 1L)) == (("no terminator at all", 4L)))
    assert(got.size == 9)
  }

  test("zipfFit matches a plain-Scala least-squares mirror") {
    // counts 24/12/8/6 = 24/r: exact Zipf, slope ≈ −1
    val words = Seq("w1" -> 24, "w2" -> 12, "w3" -> 8, "w4" -> 6)
    val text = words.flatMap { case (w, c) => Seq.fill(c)(w) }
      .mkString(" ")
    val got = TextAnalytics.zipfFit(
        Seq((1L, text)).toDF("doc_id", "text"), "text", topK = 1000)
      .as[(Long, Long, Option[Long])].collect().head
    // plain-Scala mirror of the lattice + closed form
    val pts = words.map(_._2.toLong).sorted(Ordering[Long].reverse)
      .zipWithIndex.map { case (c, i) =>
        (math.floor(math.log((i + 1).toDouble) * 1e6 + 0.5).toLong,
          math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong)
      }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val syy = pts.map(p => p._2 * p._2).sum.toDouble
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    val slope = math.floor(cov / varx * 1e6 + 0.5).toLong
    val r2 = math.floor(cov * cov / (varx * vary) * 1e6 + 0.5).toLong
    assert(got._1 == 4L)
    assert(got._2 == slope)
    assert(got._3.contains(r2))
    // exact Zipf data: slope −1 and r² = 1 up to the ln lattice
    assert(math.abs(got._2 + 1000000L) < 200L, s"slope ${got._2}")
    assert(got._3.get >= 999990L)
  }

  test("scriptProfile: hand-checked counts, priority ties, none case") {
    val docs = Seq(
      (1L, "hello мир"),            // latin 5, cyrillic 3 -> latin
      (2L, "аб ab"),                // tie 2-2: latin wins (priority)
      (3L, "你好 привет"),          // cyrillic 6 > cjk 2
      (4L, "12345 ..."),            // digits only -> none
      (5L, "שלום नमस्ते"),          // hebrew 4, devanagari 6 -> devanagari
      (6L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalytics.scriptProfile(docs, "doc_id", "text")
      .select("id", "latin", "cyrillic", "cjk", "hebrew", "devanagari",
        "digits", "dominant")
      .as[(Long, Long, Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 5L && got(1L)._3 == 3L && got(1L)._8 == "latin")
    assert(got(2L)._2 == 2L && got(2L)._3 == 2L && got(2L)._8 == "latin")
    assert(got(3L)._3 == 6L && got(3L)._4 == 2L && got(3L)._8 == "cyrillic")
    assert(got(4L)._7 == 5L && got(4L)._8 == "none")
    assert(got(5L)._5 == 4L && got(5L)._6 == 6L &&
      got(5L)._8 == "devanagari")
    assert(got(6L)._8 == "none")
  }

  test("luhnPanStats: hand-checked Luhn validation and run maximality") {
    val docs = Seq(
      // classic valid test PAN, spaced; plus a zip-length run
      (1L, "pay 4111 1111 1111 1111 now, zip 90210"),
      // same digits, last digit bumped: candidate but Luhn-invalid
      (2L, "card 4111-1111-1111-1112 declined"),
      // 25-digit run: ONE rejected candidate, never a carved prefix
      (3L, "id 1111111111111111111111111 end"),
      // valid 13-digit Visa-style PAN (4222222222222 is Luhn-valid)
      (4L, "old card 4222222222222"),
      // two runs, one valid one not
      (5L, "a 4111111111111111 b 1234567890123 c"),
      (6L, "no digits at all")
    ).toDF("doc_id", "text")
    val got = TextAnalytics.luhnPanStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 1L, 1L)))
    assert(got(2L) == ((1L, 1L, 0L)))
    assert(got(3L) == ((1L, 0L, 0L))) // 25 digits: one run, no candidate
    assert(got(4L) == ((1L, 1L, 1L)))
    // 1234567890123 has Luhn sum 1+4+3+8+5+2+7+6+9+0+1+4+3 -> invalid
    assert(got(5L) == ((2L, 2L, 1L)))
    assert(got(6L) == ((0L, 0L, 0L)))
  }

  test("stupidBackoffLogProb: hand-checked three-level backoff chain") {
    val train = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c x"),  // (a,b,c) seen 1/2; (b,c,x) -> uni x: 0.016
      (2L, "c a b"),    // (c,a,b) seen -> 1/1, no backoff
      (3L, "a a b")     // (a,a,b) unseen, (a,b) seen -> 0.4·(2/2)
    ).toDF("doc_id", "text")
    val got = TextAnalytics
      .stupidBackoffLogProb(train, score, "doc_id", "text")
      .as[(Long, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // doc1: (-ln(0.5) - ln(0.16·1/10)) / 2 = 2.414157... -> 2.4142
    assert(got(1L) == ((2L, 2.4142, 0L, 1L)))
    assert(got(2L) == ((1L, -0.0, 0L, 0L)) ||
      got(2L) == ((1L, 0.0, 0L, 0L)))
    // doc3: -ln(0.4) = 0.916290... -> 0.9163
    assert(got(3L) == ((1L, 0.9163, 1L, 0L)))
    // a doc with < 3 tokens emits no row at all
    val short = TextAnalytics.stupidBackoffLogProb(
      train, Seq((9L, "a b")).toDF("doc_id", "text"), "doc_id", "text")
    assert(short.count() == 0L)
  }

  test("keyness: hand-checked G² against an independent scalar model") {
    // target: "a a a b"; ref: "a b b b c" — 'a' leans target, 'b' ref,
    // 'c' is ref-only (one-sided term exercises the 0·ln0 limit)
    val docs = Seq((0L, "a a a b"), (1L, "a b b b c")).toDF("doc_id", "text")
    val got = TextAnalytics.keyness(docs, "doc_id", "text",
        col("doc_id") === 0, minCount = 1)
      .as[(String, Long, Long, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // independent model in plain scala (same fixed tree)
    def g2(a: Long, b: Long, na: Long, nb: Long): Double = {
      val t = na.toDouble + nb.toDouble
      val ab = a.toDouble + b.toDouble
      val at = if (a > 0) a * math.log(a * t / (na * ab)) else 0.0
      val bt = if (b > 0) b * math.log(b * t / (nb * ab)) else 0.0
      BigDecimal(2.0 * (at + bt))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got("a") == ((3L, 1L, g2(3, 1, 4, 5), "target")))
    assert(got("b") == ((1L, 3L, g2(1, 3, 4, 5), "ref")))
    assert(got("c") == ((0L, 1L, g2(0, 1, 4, 5), "ref")))
    // balanced term: equal rates → direction 'even', G² = 0
    val even = TextAnalytics.keyness(
        Seq((0L, "x y"), (1L, "x y")).toDF("doc_id", "text"),
        "doc_id", "text", col("doc_id") === 0, minCount = 1)
      .as[(String, Long, Long, Double, String)].collect()
    assert(even.forall(r => r._5 == "even" && math.abs(r._4) == 0.0))
    // minCount prunes the tail: a and b total 4 each, c only 1
    assert(TextAnalytics.keyness(docs, "doc_id", "text",
      col("doc_id") === 0, minCount = 4).count() == 2)
  }

  test("lexicalRichness: hand case + BigInt reference model, all exact") {
    val got = TextAnalytics.lexicalRichness(
        Seq((7L, "a a b c")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    // N=4, V=3, V1=2, S2=6: ttr=750000, hapax=666667 (half-up),
    // K_e2 = 1e6·(6-4)/16 = 125000 exact
    assert(got == ((7L, 4L, 3L, 2L, 750000L, 666667L, 125000L)))
    // randomized parity vs a plain-Scala BigInt model
    val rnd = new scala.util.Random(41)
    val docs = (0L until 60L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(50))(s"w${rnd.nextInt(12)}").mkString(" "))
    }
    val want = docs.map { case (id, text) =>
      val tf = text.split(" ").groupBy(identity).map(_._2.length.toLong)
      val n = BigInt(tf.sum); val v = BigInt(tf.size)
      val v1 = BigInt(tf.count(_ == 1L))
      val s2 = tf.map(x => BigInt(x) * x).sum
      def lat(num: BigInt, den: BigInt) =
        ((2 * num * 1000000 + den) / (2 * den)).toLong
      (id, tf.sum, v.toLong, v1.toLong, lat(v, n), lat(v1, v),
        lat(s2 - n, n * n))
    }.toSet
    val all = TextAnalytics.lexicalRichness(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(all == want)
  }

  test("vocabularyGrowth: hand checkpoints, first-seen semantics, " +
      "monotone curve on a random corpus") {
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "c d e"), (4L, "f"))
      .toDF("doc_id", "text")
    val got = TextAnalytics.vocabularyGrowth(docs, "doc_id", "text",
        nCheckpoints = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // k=1 → ids ≤ 2: 2 docs, 4 tokens, V {a,b,c} = 3; k=2 → all
    assert(got == Map(1L -> ((2L, 2L, 4L, 3L)),
      2L -> ((4L, 4L, 8L, 6L))))
    // random corpus: curve is monotone in docs/tokens/vocab and the
    // last checkpoint equals the whole-corpus truth
    val rnd = new scala.util.Random(59)
    val rows = (1L to 120L).map(i =>
      (i, Seq.fill(5 + rnd.nextInt(20))(s"w${rnd.nextInt(300)}")
        .mkString(" ")))
    val curve = TextAnalytics.vocabularyGrowth(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(curve.length == 8)
    curve.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3 && a._4 <= b._4 && a._5 <= b._5)
    }
    val allToks = rows.flatMap(_._2.split(" "))
    assert(curve.last._4 == allToks.size.toLong)
    assert(curve.last._5 == allToks.distinct.size.toLong)
    // independent prefix model at every checkpoint
    curve.foreach { case (_, cap, nd, nt, nv) =>
      val pre = rows.filter(_._1 <= cap)
      assert(nd == pre.size.toLong)
      assert(nt == pre.flatMap(_._2.split(" ")).size.toLong)
      assert(nv == pre.flatMap(_._2.split(" ")).distinct.size.toLong)
    }
  }

  test("vocabularyGrowth: checkpoints below the smallest id still emit " +
      "zero rows (one row per checkpoint, always)") {
    // ids start at a large offset, so the first three id-range splits
    // ⌊maxId·k/n⌋ hold no documents — an inner join would silently
    // drop them, breaking the "one row per checkpoint" contract
    val docs = Seq((100L, "a b"), (101L, "a c")).toDF("doc_id", "text")
    val got = TextAnalytics.vocabularyGrowth(docs, "doc_id", "text",
        nCheckpoints = 4)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 4)
    assert(got(0) == ((1L, 25L, 0L, 0L, 0L)))
    assert(got(1) == ((2L, 50L, 0L, 0L, 0L)))
    assert(got(2) == ((3L, 75L, 0L, 0L, 0L)))
    assert(got(3) == ((4L, 101L, 2L, 4L, 3L)))
  }

  test("termJsd: hand lattice terms and rationals, empty-slice raise; " +
      "scalar parity on a random corpus") {
    import org.apache.spark.sql.functions.col
    // target "a a b" vs ref "a c": S_p = ⌊2e6·ln(8/7)⌋ + ⌊1e6·ln 2⌋,
    // S_q = ⌊1e6·ln(6/7)⌋ + ⌊1e6·ln 2⌋ — hand-checked reads below
    val docs = Seq((true, "a a b"), (false, "a c")).toDF("tgt", "text")
    val got = TextAnalytics.termJsd(docs, "text", col("tgt"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((3L, 3L, 2L, 320070L, 269498L, 294784L)))
    // identical slices → all three reads are ~0 (exact 0 here: every
    // term has a = b and N_A = N_B, so ln(1) = 0 per term)
    val same = TextAnalytics.termJsd(
        Seq((true, "x y z"), (false, "x y z")).toDF("tgt", "text"),
        "text", col("tgt"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(same == ((3L, 3L, 3L, 0L, 0L, 0L)))
    // an empty slice raises — JSD against nothing is upstream breakage
    val e = intercept[Exception] {
      TextAnalytics.termJsd(
        Seq((true, "a b")).toDF("tgt", "text"), "text", col("tgt"))
        .collect()
    }
    assert((e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("empty slice"), e.getMessage)
    // random corpus ≡ independent scalar model (same fixed IEEE trees)
    val rnd = new scala.util.Random(137)
    val rows = (1 to 250).map(i =>
      (i % 9 == 0, Seq.fill(5 + rnd.nextInt(25))(
        s"w${rnd.nextInt(60)}").mkString(" ")))
    val gotR = TextAnalytics.termJsd(
        rows.toDF("tgt", "text"), "text", col("tgt"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val counts = rows.flatMap { case (t, txt) =>
      txt.split(" ", -1).map(w => (w, t)) }
      .groupBy(_._1).toSeq.map { case (_, v) =>
        (v.count(_._2).toLong, v.count(!_._2).toLong) }
    val na = counts.map(_._1).sum; val nb = counts.map(_._2).sum
    def lat(cnt: Long, other: Long, a: Long, b: Long): Long =
      if (cnt == 0) 0L
      else math.floor(1e6 * cnt *
        math.log((2.0 * cnt * other) /
          (a.toDouble * nb + b.toDouble * na))).toLong
    val sp = counts.map { case (a, b) => lat(a, nb, a, b) }.sum
    val sq = counts.map { case (a, b) => lat(b, na, a, b) }.sum
    def ha(num: BigInt, den: BigInt): Long =
      (if (num >= 0) (2 * num + den) / (2 * den)
       else -((-2 * num + den) / (2 * den))).toLong
    assert(gotR == ((counts.size.toLong, na, nb,
      ha(sp, na), ha(sq, nb),
      ha(BigInt(sp) * nb + BigInt(sq) * na, 2 * BigInt(na) * nb))))
  }

  test("frequencySpectrum: hand buckets, zero-fill, tail bucket; " +
      "plain-Scala parity on a random corpus") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val got = TextAnalytics.frequencySpectrum(docs, "text")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 11)
    assert(got(1L) == ((1L, 1L)) && got(2L) == ((1L, 2L)) &&
      got(3L) == ((1L, 3L)))
    (4L to 11L).foreach(m => assert(got(m) == ((0L, 0L)), s"m=$m"))
    // tail bucket: a term at 12 occurrences lands in m_bucket 11
    val tail = TextAnalytics.frequencySpectrum(
        Seq((1L, Seq.fill(12)("z").mkString(" "))).toDF("doc_id", "text"),
        "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(tail(11L) == ((1L, 12L)))
    // random corpus ≡ independent plain-Scala spectrum
    val rnd = new scala.util.Random(67)
    val rows = (1L to 150L).map(i =>
      (i, Seq.fill(5 + rnd.nextInt(30))(s"w${rnd.nextInt(120)}")
        .mkString(" ")))
    val spark_ = TextAnalytics.frequencySpectrum(
        rows.toDF("doc_id", "text"), "text")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val tf = rows.flatMap(_._2.split(" ", -1))
      .groupBy(identity).map(_._2.size.toLong)
    val want = (1L to 11L).map { m =>
      val in = tf.filter(f => math.min(f, 11L) == m)
      m -> ((in.size.toLong, in.sum))
    }.toMap
    assert(spark_ == want)
  }

  test("dispersion: hand-checked Gries DP, closed-form absent-part " +
      "mass; plain-Scala parity on a random corpus") {
    // parts X: "a a b", Y: "a c c", Z: "b b b c"; term a: c=(2,1,0),
    // C=3, t=(3,3,4), T=10 → DP = (|2/3−3/10|+|1/3−3/10|+4/10)/2 = 0.4
    val docs = Seq(("X", "a a b"), ("Y", "a c c"), ("Z", "b b b c"))
      .toDF("source", "text")
    val got = TextAnalytics.dispersion(docs, "source", "text", minCount = 1)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((3L, 2L, 400000L)))
    // b: c=(1,0,3), C=4, DP = (|1/4−3/10|+3/10+|3/4−4/10|)/2 = 0.35
    assert(got("b") == ((4L, 2L, 350000L)))
    // c: c=(0,2,1), C=3, DP = (3/10+|2/3−3/10|+|1/3−4/10|)/2 = 11/30
    assert(got("c") == ((3L, 2L, 366667L)))
    // random corpus ≡ independent BigInt rational model
    val rnd = new scala.util.Random(71)
    val rows = (1 to 200).map(i =>
      (s"p${rnd.nextInt(6)}",
        Seq.fill(4 + rnd.nextInt(20))(s"w${rnd.nextInt(40)}")
          .mkString(" ")))
    val gotR = TextAnalytics.dispersion(
        rows.toDF("source", "text"), "source", "text", minCount = 3)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val counts = rows.flatMap { case (p, txt) =>
      txt.split(" ", -1).map(w => (p, w)) }
      .groupBy(identity).map { case ((p, w), v) => (p, w, v.size.toLong) }
    val pt = counts.groupBy(_._1).map { case (p, v) => p -> v.map(_._3).sum }
    val tt = BigInt(pt.values.sum)
    val want = counts.groupBy(_._2)
      .map { case (w, v) => (w, v.map(_._3).sum, v) }
      .filter(_._2 >= 3)
      .map { case (w, ctot, v) =>
        val c = BigInt(ctot)
        val present = v.map { case (p, _, ci) =>
          (BigInt(ci) * tt - BigInt(pt(p)) * c).abs - BigInt(pt(p)) * c
        }.sum
        val den = c * tt
        val dp = (2 * (present + den) * 1000000 + 2 * den) / (4 * den)
        w -> ((ctot, v.size.toLong, dp.toLong))
      }.toMap
    assert(gotR == want && want.nonEmpty)
  }

  test("sttr: hand segments, partial-segment exclusion, NULL for short " +
      "docs; plain-Scala parity on a random corpus") {
    val docs = Seq((1L, "a b a c c d e"), (2L, "x y"))
      .toDF("doc_id", "text")
    val got = TextAnalytics.sttr(docs, "doc_id", "text", segLen = 3)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: segs [a b a] v=2, [c c d] v=2, partial [e] dropped →
    // sttr = 4/6, half-up e6 = 666667
    assert(got(1L) == ((7L, 2L, Some(666667L))))
    assert(got(2L) == ((2L, 0L, None)))
    // random corpus ≡ independent plain-Scala segment model
    val rnd = new scala.util.Random(73)
    val rows = (1L to 120L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(70))(s"w${rnd.nextInt(15)}")
        .mkString(" ")))
    val gotR = TextAnalytics.sttr(
        rows.toDF("doc_id", "text"), "doc_id", "text", segLen = 10)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val want = rows.map { case (id, txt) =>
      val w = txt.split(" ", -1)
      val full = w.grouped(10).filter(_.length == 10).toSeq
      val sumv = full.map(_.distinct.length.toLong).sum
      val sttr = if (full.isEmpty) None
        else Some((2 * sumv * 1000000L + full.size * 10L) /
          (2 * full.size * 10L))
      id -> ((w.length.toLong, full.size.toLong, sttr))
    }.toMap
    assert(gotR == want)
  }

  test("unigramModel: frozen LM counts; over-cap vocabulary fails loudly") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat ran")).toDF("doc_id", "text")
    val (m, total) = TextAnalytics.unigramModel(docs, "doc_id", "text")
    assert(m("the") == 2L && m("cat") == 2L && m("sat") == 1L &&
      m("ran") == 1L && total == 6L)
    // open-vocabulary guard: the driver collect must refuse rather
    // than materialize an unbounded term table
    val e = intercept[IllegalArgumentException] {
      TextAnalytics.unigramModel(docs, "doc_id", "text", maxVocab = 3)
    }
    assert(e.getMessage.contains("maxVocab"), e.getMessage)
  }
  test("termBurstiness: hand cf/df lattice; plain-Scala parity on a " +
      "generated corpus; minDf cut") {
    import spark.implicits._
    // "a a a b" + "a b" → a: cf 4, df 2, B = 2; b: cf 2, df 2, B = 1
    val got = TextAnalytics.termBurstiness(
        Seq((1L, "a a a b"), (2L, "a b")).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map("a" -> ((4L, 2L, 2000000L)),
      "b" -> ((2L, 2L, 1000000L))))
    // df = 1 terms cut at the default minDf = 2
    val cut = TextAnalytics.termBurstiness(
        Seq((1L, "x x y"), (2L, "y")).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(String, Long, Long, Long)].collect().map(_._1).toSet
    assert(cut == Set("y"))
    // generated corpus ≡ independent plain-Scala model
    val rnd = new scala.util.Random(239)
    val docs = (0L until 120L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(30))(s"w${rnd.nextInt(40)}")
        .mkString(" ")))
    val gotR = TextAnalytics.termBurstiness(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val perDoc = docs.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).groupBy(identity)
        .toSeq.map { case (w, o) => (w, id, o.length.toLong) }
    }
    val want = perDoc.groupBy(_._1).collect {
      case (w, occ) if occ.size >= 2 =>
        val cf = occ.map(_._3).sum; val df = occ.size.toLong
        w -> ((cf, df, (2 * cf * 1000000L + df) / (2 * df)))
    }.toMap
    assert(gotR == want)
  }

  test("queryLikelihood: scalar-model parity (every doc scores, " +
      "background mass only for no-hit docs), absent term raises") {
    import spark.implicits._
    val docs = Seq((1L, "table of data"), (2L, "query the table table"),
      (3L, "nothing here at all"))
    val terms = Seq("table", "query")
    val got = TextAnalytics.queryLikelihood(
        docs.toDF("doc_id", "text"), "doc_id", "text", terms,
        mu = 100L)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // independent scalar model
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val cTotal = toks.values.map(_.size).sum.toDouble
    val cf = terms.map(t =>
      t -> toks.values.map(_.count(_ == t)).sum.toDouble).toMap
    val want = docs.map { case (id, _) =>
      val len = toks(id).size.toDouble
      val hit = terms.count(t => toks(id).contains(t)).toLong
      val score = terms.map { t =>
        val tf = toks(id).count(_ == t).toDouble
        math.floor(math.log(
          (tf + 100.0 * (cf(t) / cTotal)) / (len + 100.0)) * 1e6).toLong
      }.sum
      id -> ((hit, score))
    }.toMap
    assert(got == want)
    assert(got(3L)._1 == 0L) // no-hit doc still scored
    val e = intercept[Exception] {
      TextAnalytics.queryLikelihood(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        Seq("table", "zzzmissing")).collect()
    }
    assert((e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("absent from the corpus"), e.getMessage)
  }

  test("goodTuring: hand spectrum with unseen mass on the r=0 row; " +
      "plain-Scala parity on a random corpus") {
    // "a a b c": N=4, N1=2, N2=1 → P0 = 2/4, r*(1) = 2·1/2 = 1,
    // r*(2) = 3·0/1 = 0 (the raw Turing read), masses 1/2 each
    val hand = Seq((1L, "a a b c")).toDF("doc_id", "text")
    val got = TextAnalytics.goodTuring(hand, "text")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0L) == ((0L, None, Some(500000L))))
    assert(got(1L) == ((2L, Some(1000000L), Some(500000L))))
    assert(got(2L) == ((1L, Some(0L), Some(500000L))))
    assert(got(5L) == ((0L, None, Some(0L))))
    assert(got.size == 11)
    // random corpus ≡ independent scalar model
    val rnd = new scala.util.Random(83)
    val docs = (1L to 40L).map(i => (i, (0 until rnd.nextInt(30))
      .map(_ => s"w${rnd.nextInt(40)}").mkString(" ")))
    val gotR = TextAnalytics.goodTuring(docs.toDF("doc_id", "text"), "text")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val toks = docs.flatMap(_._2.split(" "))
    val tf = toks.groupBy(identity).map(_._2.size)
    val spec = tf.groupBy(identity).map { case (r, v) => r -> v.size }
      .withDefaultValue(0)
    val n = toks.size.toLong
    (0 to 10).foreach { r =>
      val nr = spec(r).toLong
      val next = spec(r + 1).toLong
      val rstar =
        if (r == 0 || nr == 0) None
        else Some((2 * (r + 1) * next * 1000000L + nr) / (2 * nr))
      val mass =
        if (n == 0) None
        else if (r == 0) Some((2 * next * 1000000L + n) / (2 * n))
        else Some((2 * r * nr * 1000000L + n) / (2 * n))
      assert(gotR(r.toLong) == ((nr, rstar, mass)), s"r=$r")
    }
  }

  test("queryLikelihoodJm: hand mixture scores; zero-tf term finite " +
      "(JM's point); absent term raises; IEEE-tree parity") {
    // corpus: "q q w" + "w w"; cf(q)=2, C=5, λ=0.5
    val docs = Seq((1L, "q q w"), (2L, "w w")).toDF("doc_id", "text")
    val got = TextAnalytics.queryLikelihoodJm(
        docs, "doc_id", "text", Seq("q"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    def s(tf: Long, len: Long, cf: Long, c: Long): Long =
      math.floor(math.log(
        (if (len == 0) 0.0 else (500.0 * tf) / (1000.0 * len)) +
          (500.0 * cf) / (1000.0 * c)) * 1e6).toLong
    assert(got(1L) == ((1L, s(2, 3, 2, 5))))
    // the zero-tf doc still scores (background mass only) — where
    // unsmoothed likelihood and pure-doc models read −∞
    assert(got(2L) == ((0L, s(0, 2, 2, 5))))
    val err = intercept[Exception] {
      TextAnalytics.queryLikelihoodJm(
        docs, "doc_id", "text", Seq("q", "zzz")).collect()
    }
    assert((err.getMessage +
      Option(err.getCause).map(_.getMessage).getOrElse(""))
      .contains("absent from the corpus"))
    // random corpus ≡ the same fixed double tree in plain Scala
    val rnd = new scala.util.Random(163)
    val corpus = (1L to 60L).map(i => (i, (0 until rnd.nextInt(25))
      .map(_ => s"w${rnd.nextInt(12)}").mkString(" ")))
    val terms = Seq("w0", "w1", "w2")
    val gotR = TextAnalytics.queryLikelihoodJm(
        corpus.toDF("doc_id", "text"), "doc_id", "text", terms)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    val toks = corpus.map { case (i, t) => i -> t.split(" ").toSeq }
    val cTotal = toks.map(_._2.size).sum.toLong
    val cfm = terms.map(t =>
      t -> toks.map(_._2.count(_ == t)).sum.toLong).toMap
    corpus.foreach { case (i, _) =>
      val w = toks.find(_._1 == i).get._2
      val scores = terms.map { t =>
        val tf = w.count(_ == t).toLong
        (if (tf > 0) 1L else 0L, s(tf, w.size, cfm(t), cTotal))
      }
      assert(gotR(i) == ((scores.map(_._1).sum, scores.map(_._2).sum)),
        s"doc $i")
    }
  }

  test("codeSwitchReport: mixed/mono/unknown verdicts, dominant " +
      "tie-break lang-asc, 80% mixed boundary") {
    val docs = Seq(
      // 2 en + 1 es identified + 1 und: dominant en 2/3, 5·2 ≤ 4·3
      // fails (10 > 12 false → 10 <= 12 true) → mixed
      (1L, "the cat is big and the dog. el perro de la casa es. " +
        "xyzzy plugh. a boy of the town is here."),
      // all en → mono
      (2L, "the cat is big. a dog of the house is small."),
      // nothing identified → unknown, sentinel dominant
      (3L, "xyzzy plugh. qwerty asdf."),
      // en and fr tie 1-1 → dominant 'en' (asc), share 1/2 → mixed
      (4L, "the cat is big and of. le chien et les chats est."),
      // dominant 5/6 > 80% → mono despite a second language
      (5L, "the a of. the is a. of and the. is the of. and a is. " +
        "el la de que es."))
      .toDF("doc_id", "text")
    val got = TextAnalytics.codeSwitchReport(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, String, Option[Long], String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7)))
      .toMap
    assert(got(1L) == ((4L, 3L, 2L, "en", Some(666667L), "mixed")))
    assert(got(2L) == ((2L, 2L, 1L, "en", Some(1000000L), "mono")))
    assert(got(3L) == ((2L, 0L, 0L, "none", None, "unknown")))
    assert(got(4L) == ((2L, 2L, 2L, "en", Some(500000L), "mixed")))
    assert(got(5L) == ((6L, 6L, 2L, "en", Some(833333L), "mono")))
  }
}
