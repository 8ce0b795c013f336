package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.{ShingleFunctions, TextFunctions}

/** The fused per-row shingle/MinHash/SimHash kernels must be BIT-IDENTICAL
  * to the legacy relational pipeline (posexplode -> lead window -> SQL
  * hash functions) they replaced — the relational form stays in the repo
  * solely as this spec's independent oracle. Any drift here silently
  * changes every dedup/decontamination result, so the corpus includes the
  * edge shapes whitespace tokenization actually produces: empty tokens
  * from doubled/leading/trailing spaces, unicode, single-token docs,
  * docs shorter than n, repeated shingles, and a null text.
  */
class ShingleParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "épsilon", "ζeta",
      "eta", "θ", "iota", "kappa", "λλ", "mu", "", "nu-1", "xi,comma")
    val generated = (0L until 40L).map { i =>
      val len = rnd.nextInt(30)
      (i, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val edges = Seq(
      (100L, ""),                       // one empty token after split
      (101L, "solo"),                   // fewer tokens than n
      (102L, "a b"),                    // exactly n-1 for n=3
      (103L, "a b c"),                  // exactly one shingle
      (104L, "a  b   c"),               // doubled/tripled spaces -> empty tokens
      (105L, " leading and trailing "),
      (106L, "x y z x y z x y z"),      // repeated shingles (dup keys)
      (107L, null.asInstanceOf[String]) // null text
    )
    (generated ++ edges).toDF("doc_id", "text")
  }

  /** The legacy (id, n_sh, shkey) rows: window-lead shingling + SQL hash
    * exprs + collect_set — verbatim the pre-kernel formulation.
    */
  private def legacyRows(n: Int, portable: Boolean): DataFrame = {
    val occ = Dedup.shingleOccurrencesLegacy(docs, "doc_id", "text", n, portable)
    occ.groupBy("id").agg(collect_set(col("shkey")).as("ss"))
      .select(col("id"), size(col("ss")).as("n_sh"), explode(col("ss")).as("shkey"))
  }

  /** The PRODUCTION kernel path — Dedup.shingleSets itself, so wiring
    * drift there (hash family default, dedup, empty-set filter) fails
    * this spec, not just a private re-implementation of it.
    */
  private def kernelRows(n: Int, portable: Boolean): DataFrame =
    Dedup.shingleSets(docs, "doc_id", "text", n, portable)
      .select(col("id"), size(col("ss")).as("n_sh"), explode(col("ss")).as("shkey"))

  for (portable <- Seq(false, true); n <- Seq(2, 3, 4)) {
    test(s"shingle keys bit-identical to legacy pipeline (n=$n portable=$portable)") {
      val legacy = legacyRows(n, portable)
        .as[(Long, Int, Long)].collect().toSet
      val kernel = kernelRows(n, portable)
        .as[(Long, Int, Long)].collect().toSet
      assert(kernel == legacy)
      assert(legacy.nonEmpty)
    }
  }

  test("minHash signatures bit-identical to the k-min-aggregate formulation") {
    for (portable <- Seq(false, true)) {
      val k = 16
      val p = if (portable) Dedup.PortableMinHashPrime else 4294967311L
      val (as, bs) =
        if (portable) Dedup.portableMinHashCoeffs(k, seed = 42L)
        else {
          val rnd = new scala.util.Random(42L)
          (Seq.fill(k)(1L + rnd.nextInt(Int.MaxValue - 1).toLong),
            Seq.fill(k)(rnd.nextInt(Int.MaxValue).toLong))
        }
      val legacy = legacyRows(3, portable)
        .withColumn("h", pmod(col("shkey"), lit(p)))
        .groupBy("id")
        .agg(min(pmod(col("h") * as.head + bs.head, lit(p))).as("mh0"),
          (1 until k).map(i =>
            min(pmod(col("h") * as(i) + bs(i), lit(p))).as(s"mh$i")): _*)
        .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong).toVector)
        .toMap
      val kernel = docs.select(col("doc_id").as("id"),
          array_distinct(ShingleFunctions.shingleKeys(
            TextFunctions.tokens(col("text")), 3, portable)).as("ss"))
        .filter(size(col("ss")) > 0)
        .select(col("id"), ShingleFunctions.minhashSig(col("ss"), as, bs, p).as("sig"))
        .as[(Long, Seq[Long])].collect().map { case (id, s) => id -> s.toVector }
        .toMap
      assert(kernel == legacy, s"portable=$portable")
      assert(legacy.nonEmpty)
    }
  }

  test("fused simHash bit-identical to the explode+aggregate formulation") {
    for (portable <- Seq(false, true)) {
      val tokenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        if (portable) Dedup.portableTokenHash else (c => xxhash64(c))
      // custom lambda -> generic relational path (reference semantics)
      val legacy = Dedup.simHash(docs, "doc_id", "text", c => tokenHash(c))
        .as[(Long, Long)].collect().toMap
      // standard family reference -> fused kernel path
      val fused = Dedup.simHash(docs, "doc_id", "text",
          if (portable) Dedup.portableTokenHash else Dedup.defaultTokenHash)
        .as[(Long, Long)].collect().toMap
      assert(fused == legacy, s"portable=$portable")
      assert(legacy.nonEmpty)
    }
  }

  test("fused repetitionStats bit-identical to the relational formulation") {
    val legacy = TextAnalytics.repetitionStatsLegacy(docs, "doc_id", "text")
      .as[(Long, Double, Double)].collect().toSet
    val fused = TextAnalytics.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Double, Double)].collect().toSet
    assert(fused == legacy)
    assert(legacy.nonEmpty)
  }

  test("property: kernel ≡ legacy on arbitrary unicode corpora") {
    // ScalaCheck-style seeded sweep without the forAll session overhead:
    // 12 corpora of 30 docs with tokens drawn from arbitrary unicode
    // (including astral-plane code points, combining marks, separators)
    val rnd = new scala.util.Random(99)
    def arbToken(): String = {
      val len = rnd.nextInt(6)
      (0 until len).map { _ =>
        rnd.nextInt(5) match {
          case 0 => (0x61 + rnd.nextInt(26)).toChar.toString   // ascii
          case 1 => (0x3b1 + rnd.nextInt(24)).toChar.toString  // greek
          case 2 => new String(Character.toChars(0x1F600 + rnd.nextInt(64))) // astral
          case 3 => "́"                                   // combining mark
          case _ => (0x4e00 + rnd.nextInt(256)).toChar.toString // cjk
        }
      }.mkString
    }
    for (trial <- 0 until 12) {
      val portable = trial % 2 == 0
      val corpus = (0 until 30).map { i =>
        (i.toLong, (0 until rnd.nextInt(12)).map(_ => arbToken()).mkString(" "))
      }
      val df = corpus.toDF("doc_id", "text")
      val legacy = Dedup.shingleOccurrencesLegacy(df, "doc_id", "text", 3, portable)
        .dropDuplicates("id", "shkey").as[(Long, Long)].collect().toSet
      val kernel = df.select(col("doc_id").as("id"),
          explode(array_distinct(ShingleFunctions.shingleKeys(
            TextFunctions.tokens(col("text")), 3, portable))).as("shkey"))
        .as[(Long, Long)].collect().toSet
      assert(kernel == legacy, s"trial=$trial portable=$portable")
    }
  }

  test("kernel expressions run inside whole-stage codegen (no fallback)") {
    // repartition first: a LocalTableScan-only plan has no codegen stage
    // to inspect, whatever the expression supports
    val df = docs.repartition(2).select(
      ShingleFunctions.shingleKeys(TextFunctions.tokens(col("text")), 3, false).as("a"),
      ShingleFunctions.simhash64(TextFunctions.tokens(col("text"))).as("b"))
    df.collect() // also proves codegen compiles (janino would throw here)
    val plan = df.queryExecution.executedPlan.toString // AQE-final after exec
    // the codegen'd Project renders as "*(n) Project" in the final plan
    assert(plan.contains("*(1) Project [shingle_keys"), plan)
  }
}
