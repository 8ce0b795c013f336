package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The fluent facade must compose to exactly what calling the operators
  * directly produces — it is porcelain, not a second implementation.
  */
class CorpusPipelineFacadeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("facade chain ≡ direct operator composition on sf0.001 docs") {
    val docs = Tables(spark, TestSpark.Sf0001, "documents")
    val viaFacade = CorpusPipeline(docs, "doc_id", "text")
      .gateQuality(0.4)
      .redactPii()
      .dedupSegments(segTokens = 20)
      .chunk(chunkSize = 30, stride = 30)
      .df
    val curated = docs
      .filter(operators.TextAnalytics.qualityColumn(col("text")) >= 0.4)
      .withColumn("text", operators.TextAnalytics.redactColumn(col("text")))
    val deduped = operators.Dedup
      .segmentDedup(curated, "doc_id", "text", 20)
      .filter(col("n_kept") > 0)
      .select(col("id").as("doc_id"), col("text_dedup").as("text"))
    val direct = operators.TextAnalytics
      .chunkDocs(curated.drop("text").join(deduped, Seq("doc_id")),
        "doc_id", "text", 30, 30)
      .select(col("id"), col("chunk_id"), col("chunk_text"))
    // facade id = doc << 20 | chunk index, original doc id carried along
    val a = viaFacade.select(col("doc_id_doc"),
        col("doc_id").bitwiseAND(lit((1L << 20) - 1)).as("ci"), col("text"))
      .as[(Long, Long, String)].collect().toSet
    val b = direct.as[(Long, Long, String)].collect().toSet
    assert(a == b && a.nonEmpty)
    // the chunk-scoped id is unique — downstream dedup keys on it
    val ids = viaFacade.select("doc_id").as[Long].collect()
    assert(ids.length == ids.distinct.length)
    // non-text columns survive the chunk stage
    assert(viaFacade.columns.contains("source"))
  }

  test("gateEncoding drops damage before normalize canonicalizes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean “fancy” text — fine"),
      (2L, "broken cafÃ© row"),
      (3L, "plain already"))
      .toDF("doc_id", "text")
    val got = CorpusPipeline(docs, "doc_id", "text")
      .gateEncoding()
      .normalize()
      .df.as[(Long, String)].collect().toMap
    // doc 2 gated out on the RAW bytes; doc 1 then canonicalized
    assert(got == Map(
      1L -> "clean \"fancy\" text - fine",
      3L -> "plain already"))
    // equivalence with the operators called directly
    val direct = operators.TextAnalytics.normalizeText(
        operators.TextAnalytics.mojibakeStats(docs, "doc_id", "text")
          .filter(col("is_clean")).select(col("id").as("doc_id"))
          .join(docs, Seq("doc_id")),
        "doc_id", "text")
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(direct == got)
  }

  test("dedupNear keeps each near-dup cluster's min id; gateLanguage filters") {
    val base = (1 to 30).map(i => s"w${i * 7 % 97}").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base.split(" ").take(27).mkString(" ")), // near-dup of 1
      (3L, (40 to 70).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val kept = CorpusPipeline(docs, "doc_id", "text")
      .dedupNear(threshold = 0.6)
      .df.select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
    // language gate composes over the same frame
    val gated = CorpusPipeline(docs, "doc_id", "text")
      .gateLanguage(Seq("en", "unknown")).df.count()
    assert(gated <= 3L)
  }

  test("gateLicense keeps the allowlist (incl. 'none'), drops copyleft, " +
      "first-match precedence decides") {
    val docs = Seq(
      (1L, "plain text, no licence markers here"),
      (2L, "Licensed under the Apache License, Version 2.0 terms"),
      (3L, "free software under the GNU General Public License v3"),
      // both MIT and Apache phrases: Apache wins by precedence, so the
      // doc passes an {none, MIT, Apache-2.0} allowlist via Apache
      (4L, "Permission is hereby granted, free of charge." +
        " See the Apache License, Version 2.0."))
      .toDF("doc_id", "text")
    val kept = CorpusPipeline(docs, "doc_id", "text")
      .gateLicense(Seq("none", "MIT", "Apache-2.0"))
      .df.select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 4L))
    // a copyleft-only allowlist inverts the read
    val gplOnly = CorpusPipeline(docs, "doc_id", "text")
      .gateLicense(Seq("GPL-3.0"))
      .df.select("doc_id").as[Long].collect().toSeq
    assert(gplOnly == Seq(3L))
  }

  test("weighted keeps target rows with null weights (left join)") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val w = CorpusPipeline(docs, "doc_id", "text")
      .weighted(col("doc_id") === 1L).df
    assert(w.count() == 2L)
    assert(w.filter(col("doc_id") === 1L)
      .select("log_ratio").first().isNullAt(0))
    assert(!w.filter(col("doc_id") === 2L)
      .select("log_ratio").first().isNullAt(0))
  }

  test("dedupNearBest keeps the best-quality member, not the min id") {
    // doc 2 is the longer, higher-quality member of the {1, 2} near-dup
    // pair: same shingle set (near-dup) but 1 is a truncated copy
    val rich = (1 to 60).map(i => s"w${i * 7 % 97}").mkString(" ") +
      " the a to of and in on for extra tail tokens here"
    val poor = rich.split(" ").take(58).mkString(" ")
    val docs = Seq(
      (1L, poor), (2L, rich),
      (3L, (40 to 80).map(i => s"v$i").mkString(" ")))
      .toDF("doc_id", "text")
    val q = docs.select(col("doc_id"),
      operators.TextAnalytics.qualityColumn(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(q(2L) != q(1L)) // the test is only meaningful if quality differs
    val best = if (q(2L) > q(1L)) 2L else 1L
    val kept = CorpusPipeline(docs, "doc_id", "text")
      .dedupNearBest(threshold = 0.6)
      .df.select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(best, 3L).sorted)
    // min-id policy would have dropped doc 2 regardless of quality
    val minId = CorpusPipeline(docs, "doc_id", "text")
      .dedupNear(threshold = 0.6)
      .df.select("doc_id").as[Long].collect().sorted.toSeq
    assert(minId == Seq(1L, 3L))
  }

  test("fromJsonl starts the chain from raw gzip shards") {
    val docs = Tables(spark, TestSpark.Sf0001, "documents").limit(20)
    val dir = Files.createTempDirectory("facade-jsonl").toFile
    val dest = new java.io.File(dir, "docs").getPath
    graft.sources.DocumentsJsonl.write(docs, dest, shards = Some(2))
    val viaJsonl = CorpusPipeline.fromJsonl(spark, Seq(dest))
      .gateQuality(0.3).df.select("doc_id").as[Long].collect().toSet
    val viaParquet = CorpusPipeline(docs, "doc_id", "text")
      .gateQuality(0.3).df.select("doc_id").as[Long].collect().toSet
    assert(viaJsonl == viaParquet && viaJsonl.nonEmpty)
  }

  test("dedupExact and dedupNear keep canonical ids, writeShards lands") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "unrelated text entirely"), (4L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val exact = CorpusPipeline(docs, "doc_id", "text").dedupExact()
      .df.select("doc_id").as[Long].collect().sorted.toSeq
    assert(exact == Seq(1L, 3L)) // min id per content group survives
    val dir = Files.createTempDirectory("facade-shards").toString
    CorpusPipeline(docs, "doc_id", "text").dedupExact()
      .writeShards(dir, nShards = 2, epoch = 1L)
    assert(spark.read.parquet(dir).select("doc_id").distinct().count() == 2L)
  }

  test("gateLexicon drops severe docs; empty and clean docs pass") {
    val docs = Seq(
      (1L, "bad bad bad stuff"),      // severity 3*3*1e4/4 = 22500
      (2L, "mostly fine text here"),  // 0
      (3L, "one bad word in a longer run of text")) // 1*3e4/9 = 3333
      .toDF("doc_id", "text")
    val kept = CorpusPipeline(docs, "doc_id", "text")
      .gateLexicon(Map("bad" -> 3), maxSeverityE4 = 10000L)
      .df.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("gatePerplexityTiers keeps the named tiers; facade ≡ operator") {
    val docs = Tables(spark, TestSpark.Sf0001, "documents")
    val viaFacade = CorpusPipeline(docs, "doc_id", "text")
      .gatePerplexityTiers(Seq("head", "middle"))
      .df.select("doc_id").as[Long].collect().toSet
    val viaOp = graft.operators.TextAnalytics
      .perplexityBuckets(docs, "doc_id", "text")
      .filter($"tier" =!= "tail").select("id").as[Long].collect().toSet
    assert(viaFacade == viaOp && viaFacade.nonEmpty)
    intercept[IllegalArgumentException] {
      CorpusPipeline(docs, "doc_id", "text").gatePerplexityTiers(Seq("hard"))
    }
  }

  test("dedupUrls keeps one doc per canonical url by score then id") {
    val docs = Seq(
      (1L, "t1", "https://www.A.example/p", 5L),
      (2L, "t2", "https://a.example/p/", 9L),
      (3L, "t3", "https://a.example/p#x", 9L),
      (4L, "t4", "https://b.example/q", 1L))
      .toDF("doc_id", "text", "url", "score")
    val kept = CorpusPipeline(docs, "doc_id", "text")
      .dedupUrls("url", "score")
      .df.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L)) // 2 beats 3 on the id tie at score 9
  }

  test("gatePan and gateScripts: facade ≡ operator verdicts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "english text with 4111 1111 1111 1111 inside"), // valid PAN
      (2L, "english text with 4111111111111112 inside"),    // bad checksum
      (3L, "чисто русский текст без цифр"),                 // cyrillic
      (4L, "mixed 文 but mostly english words here"),
      (5L, "12345 67890"))                                  // scriptless
      .toDF("doc_id", "text")
    val pan = CorpusPipeline(docs, "doc_id", "text")
      .gatePan().df.select("doc_id").as[Long].collect().toSet
    assert(pan == Set(2L, 3L, 4L, 5L))
    val viaStats = operators.TextAnalytics
      .luhnPanStats(docs, "doc_id", "text")
      .filter(col("n_luhn_valid") === 0)
      .select("id").as[Long].collect().toSet
    assert(viaStats == pan)
    val latinOnly = CorpusPipeline(docs, "doc_id", "text")
      .gateScripts(Seq("latin"))
      .df.select("doc_id").as[Long].collect().toSet
    assert(latinOnly == Set(1L, 2L, 4L)) // 3 cyrillic, 5 none
    val viaProfile = operators.TextAnalytics
      .scriptProfile(docs, "doc_id", "text")
      .filter(col("dominant") === "latin")
      .select("id").as[Long].collect().toSet
    assert(viaProfile == latinOnly)
  }

  test("gateCode: facade ≡ batch t35 keep verdict, schema unpolluted") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x = 1\n# init\ny = x + 2"), // clean -> kept
      (2L, "z" * 1200),                 // minified -> dropped
      (3L, "--- !!! ...\n??? ***"))     // low alnum -> dropped
      .toDF("doc_id", "text")
    val gated = CorpusPipeline(docs, "doc_id", "text").gateCode()
    assert(gated.df.columns.toSeq == Seq("doc_id", "text"))
    val kept = gated.df.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    val viaKeep = operators.TextAnalytics
      .codeQuality(docs, "doc_id", "text")
      .filter(col("keep")).select("id").as[Long].collect().toSet
    assert(viaKeep == kept)
  }

  test("resample attaches exact copy counts and drops zero-weight rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", 2L), (2L, "b", 0L), (3L, "c", 3L), (4L, "d", 5L))
      .toDF("doc_id", "text", "w")
    val got = CorpusPipeline(docs, "doc_id", "text")
      .resample("w", m = 5L).df
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    // the s13 hand comb: W = 10, m = 5 -> copies 1 / dropped / 2 / 2
    assert(got == Map(1L -> 1L, 3L -> 2L, 4L -> 2L))
    assert(got.values.sum == 5L)
    // original columns survive alongside the new n_copies
    val cols = CorpusPipeline(docs, "doc_id", "text")
      .resample("w", m = 5L).df.columns.toSet
    assert(cols == Set("doc_id", "text", "w", "n_copies"))
  }
}
