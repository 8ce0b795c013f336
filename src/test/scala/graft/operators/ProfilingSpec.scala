package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("describe: counts, nulls, distincts and moments per column") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, null), (3L, "b"))
      .toDF("k", "s")
    val got = Profiling.describe(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = got("k")
    assert(k.getLong(1) == 4L && k.getLong(2) == 4L && k.getLong(3) == 3L)
    assert(k.getString(4) == "1" && k.getString(5) == "3")
    assert(k.getDouble(6) == 2.25)
    assert(k.getDouble(7) == 0.8292) // sqrt(0.6875) rounded
    val s = got("s")
    assert(s.getLong(1) == 4L && s.getLong(2) == 3L && s.getLong(3) == 2L)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
    assert(s.isNullAt(6) && s.isNullAt(7))
  }

  test("distributionDrift: identical distributions give psi exactly 0") {
    import spark.implicits._
    val a = Seq(0.05, 0.15, 0.35, 0.75, 0.95).toDF("v")
    val got = Profiling.distributionDrift(a, a, "v", 0.0, 1.0, bins = 10)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length == 10)
    assert(got.forall(r => r._6 == 0.0)) // p == q -> (p-q)·ln(1) = 0
    assert(got.count(r => r._2 > 0) == 5)
  }

  test("distributionDrift flags a shifted distribution, bins are clamped") {
    import spark.implicits._
    // a: mass at the low end; b: mass at the high end (+ out-of-range
    // values that must clamp into the edge bins, not crash or vanish)
    val a = Seq(0.05, 0.1, 0.15, 0.12, -0.5).toDF("v") // -0.5 -> bin 0
    val b = Seq(0.85, 0.9, 0.95, 1.0, 7.0).toDF("v")   // 1.0, 7.0 -> bin 9
    val got = Profiling.distributionDrift(a, b, "v", 0.0, 1.0, bins = 10)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L)._2 == 2L && got(0L)._3 == 0L) // 0.05 and clamped -0.5
    assert(got(9L)._2 == 0L && got(9L)._3 == 4L) // 0.9, 0.95, 1.0, 7.0
    // total PSI over bins clearly above the 0.1 no-drift threshold
    val total = got.values.map(_._6).sum
    assert(total > 0.1, s"expected drift, psi=$total")
    // every bin finite (Laplace smoothing covers empty bins)
    assert(got.values.forall(r => !r._6.isNaN && !r._6.isInfinite))
  }

  test("distributionDrift excludes null/NaN from bins AND denominators") {
    import spark.implicits._
    val withJunk = Seq(Some(0.05), None, Some(Double.NaN), Some(0.15))
      .toDF("v")
    val cleanOnly = Seq(0.05, 0.15).toDF("v")
    val a = Profiling.distributionDrift(withJunk, cleanOnly, "v", 0.0, 1.0)
      .as[(Long, Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    val b = Profiling.distributionDrift(cleanOnly, cleanOnly, "v", 0.0, 1.0)
      .as[(Long, Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq) // junk rows fully invisible
  }

  test("distributionDrift is deterministic across partitionings") {
    import spark.implicits._
    val a = (0 until 500).map(i => (i % 97) / 100.0).toDF("v")
    val b = (0 until 300).map(i => (i % 89) / 100.0).toDF("v")
    val r1 = Profiling.distributionDrift(a, b, "v", 0.0, 1.0)
      .as[(Long, Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    val r2 = Profiling.distributionDrift(
        a.repartition(7), b.repartition(3), "v", 0.0, 1.0)
      .as[(Long, Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(r1.toSeq == r2.toSeq)
  }

  test("release gate computes hand-checked rates and flips on thresholds") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 4 docs: ids 0 (benchmark), 1-3 corpus; doc 3 duplicates doc 2's
    // text; doc 1 shares a 4-shingle with the benchmark -> contaminated
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon", "en"),
      (1L, "alpha beta gamma delta other words here", "en"),
      (2L, "totally unrelated text body here now", "fr"),
      (3L, "totally unrelated text body here now", "fr"))
      .toDF("doc_id", "text", "lang")
    def gate(maxDup: Long, maxCont: Long, minQ: Long) =
      Profiling.releaseGate(docs, "doc_id", "text", "lang",
          benchPred = col("doc_id") % 10 === 0,
          maxDupE6 = maxDup, maxContamE6 = maxCont, minQualityE6 = minQ)
        .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().head
    val r = gate(300000L, 400000L, 0L)
    val (nDocs, _, dup, _, en, cont, ok) = r
    assert(nDocs == 4L)
    assert(dup == 250000L)  // 1 of 4 docs is a duplicate
    assert(en == 500000L)   // 2 of 4 docs are en
    assert(cont == 333333L) // 1 of 3 corpus docs hits a benchmark shingle
    assert(ok)
    // each threshold flips the verdict on its own
    assert(!gate(200000L, 400000L, 0L)._7)      // dup over budget
    assert(!gate(300000L, 300000L, 0L)._7)      // contamination over
    assert(!gate(300000L, 400000L, 999999L)._7) // quality under
  }

  test("release gate fails loudly on empty corpora instead of NaN rates") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq((0L, "alpha beta gamma delta", "en"))
      .toDF("doc_id", "text", "lang")
    val empty = intercept[Exception] {
      Profiling.releaseGate(docs.filter(col("doc_id") < 0),
        "doc_id", "text", "lang", benchPred = col("doc_id") % 10 === 0)
        .collect()
    }
    assert(empty.getMessage.contains("empty corpus"), empty.getMessage)
    val allBench = intercept[Exception] {
      Profiling.releaseGate(docs, "doc_id", "text", "lang",
        benchPred = col("doc_id") >= 0).collect()
    }
    assert(allBench.getMessage.contains("benchPred"), allBench.getMessage)
  }

  test("kAnonymity: class sizes and the at-risk flag, hand-checked") {
    val rows = Seq(
      ("en", "web"), ("en", "web"), ("en", "web"), // class of 3
      ("en", "books"), ("en", "books"),            // class of 2
      ("fr", "web")                                // singleton
    ).toDF("lang", "source")
    val got = Profiling.kAnonymity(rows, Seq("lang", "source"), k = 3L)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("class_size"), r.getAs[Boolean]("at_risk"))))
      .toMap
    assert(got.size == 3)
    assert(got(("en", "web")) == ((3L, false)))
    assert(got(("en", "books")) == ((2L, true)))
    assert(got(("fr", "web")) == ((1L, true)))
    // guards
    intercept[IllegalArgumentException] {
      Profiling.kAnonymity(rows, Seq.empty, k = 3L)
    }
    intercept[IllegalArgumentException] {
      Profiling.kAnonymity(rows, Seq("lang"), k = 1L)
    }
  }

  test("shardManifest: order-free seal, tamper flips it") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "alpha", 0), (2L, "beta", 0), (3L, "gamma", 1))
      .toDF("id", "text", "shard")
    def manifest(df: org.apache.spark.sql.DataFrame) =
      Profiling.shardManifest(df, "id", "text", "shard")
        .collect().map(r => r.getAs[Int]("shard") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars"),
            r.getAs[Long]("min_id"), r.getAs[Long]("max_id"),
            r.getAs[Long]("digest_xor")))).toMap
    val base = manifest(docs)
    assert(base(0)._1 == 2L && base(0)._2 == 9L &&
      base(0)._3 == 1L && base(0)._4 == 2L)
    // hand-computed xor of the two 60-bit md5 slices
    def h(s: String) = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString.take(15), 16)
    assert(base(0)._5 == (h("alpha") ^ h("beta")))
    // row order / partitioning cannot move the seal
    assert(manifest(docs.orderBy(desc("id")).repartition(7)) == base)
    // any content change flips the shard's xor, others untouched
    val tampered = manifest(
      Seq((1L, "alphA", 0), (2L, "beta", 0), (3L, "gamma", 1))
        .toDF("id", "text", "shard"))
    assert(tampered(0)._5 != base(0)._5 && tampered(1) == base(1))
    // a duplicated doc flips it too (xor of equal halves cancels the
    // ORIGINAL - the count catches what the xor alone would not)
    val duped = manifest(docs.unionAll(
      Seq((1L, "alpha", 0)).toDF("id", "text", "shard")))
    assert(duped(0)._1 == 3L && duped(0)._5 == h("beta"))
    // a null text would be counted but silently unsealed: raise
    val err = intercept[Exception] {
      Profiling.shardManifest(
        Seq((1L, Option.empty[String], 0)).toDF("id", "text", "shard"),
        "id", "text", "shard").collect()
    }
    assert(err.getMessage.contains("null text")
      || err.getCause != null &&
        err.getCause.getMessage.contains("null text"), err.getMessage)
  }
  test("ksDrift: identical sets stable at 0, disjoint sets drift at 1e6") {
    def run(a: Seq[Double], b: Seq[Double]) = Profiling.ksDrift(
        a.toDF("v"), b.toDF("v"), "v")
      .as[(Long, Long, Option[Long], String)].head()
    val xs = (1 to 20).map(_.toDouble)
    assert(run(xs, xs) == ((20L, 20L, Some(0L), "stable")))
    // disjoint supports: D = 1 exactly; critical value 1.358*sqrt(2/20)
    // = 0.43 < 1 -> drifted
    assert(run((1 to 20).map(_.toDouble), (21 to 40).map(_.toDouble)) ==
      ((20L, 20L, Some(1000000L), "drifted")))
    // one empty side: no defined statistic
    assert(run(xs, Seq.empty[Double])._4 == "undefined")
    // NaN values raise (engines order NaN differently)
    val err = intercept[Exception] {
      Profiling.ksDrift(Seq(1.0, Double.NaN).toDF("v"),
        Seq(1.0).toDF("v"), "v").collect()
    }
    assert(err.getMessage.contains("null/NaN")
      || err.getCause != null &&
        err.getCause.getMessage.contains("null/NaN"), err.getMessage)
  }

  test("ksDrift ≡ brute-force exact-fraction KS on random integer data") {
    val rnd = new scala.util.Random(43)
    val a = Seq.fill(150)(rnd.nextInt(30).toDouble)
    val b = Seq.fill(90)((rnd.nextInt(30) + rnd.nextInt(4)).toDouble)
    val (na, nb, ks, verdict) = Profiling.ksDrift(
        a.toDF("v"), b.toDF("v"), "v")
      .as[(Long, Long, Option[Long], String)].head()
    assert(na == a.size.toLong && nb == b.size.toLong)
    // exact-fraction reference: D_num = max |cumA*nB - cumB*nA|
    val grid = (a ++ b).distinct.sorted
    val dnum = grid.map { v =>
      (BigInt(a.count(_ <= v)) * b.size - BigInt(b.count(_ <= v)) * a.size).abs
    }.max
    val k = BigInt(a.size) * b.size
    assert(ks.contains(((2 * dnum * 1000000 + k) / (2 * k)).toLong))
    val lhs = BigInt(1000000) * dnum * dnum
    val rhs = BigInt(1844164) * (a.size + b.size) * k
    assert(verdict == (if (lhs > rhs) "drifted" else "stable"))
  }

  test("licenseScan: first-match precedence, case-insensitive, none " +
      "bucket, exact shares, null source raises") {
    import spark.implicits._
    val docs = Seq(
      (1L, "web", "code under the APACHE License, Version 2.0 here"),
      (2L, "web", "Permission is hereby granted, free of charge, to use"),
      // BOTH phrases: Apache must win by list precedence even though
      // the MIT phrase appears first in the text
      (3L, "web", "Permission is hereby granted, free of charge." +
        " See the Apache License, Version 2.0."),
      (4L, "web", "no licence text at all"),
      (5L, "code", "This follows the GNU General Public License v3"),
      (6L, "code", "This work: Creative Commons Attribution 4.0")
    ).toDF("doc_id", "source", "text")
    val got = Profiling.licenseScan(docs, "doc_id", "text", "source")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("web", "Apache-2.0")) == ((2L, 500000L)))
    assert(got(("web", "MIT")) == ((1L, 250000L)))
    assert(got(("web", "none")) == ((1L, 250000L)))
    assert(got(("code", "GPL-3.0")) == ((1L, 500000L)))
    assert(got(("code", "CC-BY-4.0")) == ((1L, 500000L)))
    assert(got.size == 5)
    val e = intercept[Exception] {
      Profiling.licenseScan(
        Seq((1L, Option.empty[String], "x")).toDF("doc_id", "source", "text"),
        "doc_id", "text", "source").collect()
    }
    assert(e.getMessage.contains("null source")
      || e.getCause != null &&
        e.getCause.getMessage.contains("null source"), e.getMessage)
  }
}
