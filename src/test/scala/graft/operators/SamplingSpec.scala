package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows =
    ((1L to 50L).map(i => (i, "a")) ++ (101L to 110L).map(i => (i, "b")))
      .toDF("doc_id", "src")

  test("stratifiedSample takes k per stratum, all rows when stratum < k") {
    val got = Sampling.stratifiedSample(rows, "doc_id", "src", k = 20)
    val bySrc = got.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc == Map("a" -> 20L, "b" -> 10L))
    val ranks = got.filter($"src" === "a")
      .select("sample_rank").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 20L))
  }

  test("stratifiedSample is deterministic and seed-sensitive") {
    def ids(seed: String) =
      Sampling.stratifiedSample(rows, "doc_id", "src", k = 10, seed = seed)
        .filter($"src" === "a").select("doc_id").as[Long].collect().toSet
    assert(ids("graft") == ids("graft"))
    assert(ids("graft") != ids("other-seed"))
  }

  test("domainMix hits exact targets, cycling the permutation to upsample") {
    // a: 50 rows, target 120 = 2 full epochs + 20 of a third;
    // b: 10 rows, target 4 (downsample); c absent from targets -> nothing.
    val withC = rows.union(Seq((201L, "c"), (202L, "c")).toDF("doc_id", "src"))
    val got = Sampling.domainMix(withC, "doc_id", "src",
        targets = Map("a" -> 120, "b" -> 4))
      .as[(Long, String, Long, Long)].collect()

    val byDomain = got.groupBy(_._2)
    assert(byDomain.keySet == Set("a", "b"))
    assert(byDomain("a").length == 120 && byDomain("b").length == 4)
    // mix_rank covers 1..target exactly once per domain
    assert(byDomain("a").map(_._4).sorted.toSeq == (1L to 120L))
    assert(byDomain("b").map(_._4).sorted.toSeq == (1L to 4L))
    // epochs 0 and 1 replay the full domain; epoch 2 is the permutation's
    // first 20 ranks — a strict subset of each full epoch
    val epochs = byDomain("a").groupBy(_._3).view.mapValues(_.map(_._1).toSet)
    assert(epochs(0L) == rows.filter($"src" === "a").select("doc_id")
      .as[Long].collect().toSet)
    assert(epochs(1L) == epochs(0L))
    assert(epochs(2L).size == 20 && epochs(2L).subsetOf(epochs(0L)))
  }

  test("domainMix downsample agrees with the stratifiedSample permutation") {
    val mix = Sampling.domainMix(rows, "doc_id", "src", targets = Map("a" -> 10))
      .select("id").as[Long].collect().toSet
    val strat = Sampling.stratifiedSample(rows, "doc_id", "src", k = 10)
      .filter($"src" === "a").select("doc_id").as[Long].collect().toSet
    assert(mix == strat)
  }

  test("temperatureResample flattens a skewed mix to hand-computed √-share targets") {
    // a: 50 rows, b: 10 rows; raw share 83/17, √-share ≈ 69/31.
    // w_a = round(√50, 9), w_b = round(√10, 9); tgt_d = floor(12·w_d/Z).
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (wa, wb) = (r9(math.sqrt(50.0)), r9(math.sqrt(10.0)))
    val z = wa + wb
    val (tgtA, tgtB) =
      (math.floor(12.0 * wa / z).toLong, math.floor(12.0 * wb / z).toLong)
    val got = Sampling.temperatureResample(rows, "doc_id", "src", budget = 12)
      .as[(Long, String, Long)].collect()
    val byDomain = got.groupBy(_._2)
    assert(byDomain("a").length == tgtA && byDomain("b").length == tgtB)
    assert(tgtA + tgtB <= 12)
    // sample_rank covers 1..tgt per domain; chosen ids are the md5
    // permutation's prefix — identical to stratifiedSample's at the same k
    assert(byDomain("a").map(_._3).sorted.toSeq == (1L to tgtA))
    assert(byDomain("b").map(_._3).sorted.toSeq == (1L to tgtB))
    val strat = Sampling.stratifiedSample(rows, "doc_id", "src", k = tgtA.toInt)
      .filter($"src" === "a").select("doc_id").as[Long].collect().toSet
    assert(byDomain("a").map(_._1).toSet == strat)
  }

  test("tokenBudgetSelect equals the naive greedy prefix for any bucket count") {
    // deterministic corpus: 60 docs, score = a hash-ish spread, tokens 5..64
    val docs = (1L to 60L)
      .map(i => (i, ((i * 37) % 100).toDouble / 100.0, 5L + (i % 60)))
      .toDF("doc_id", "score", "tok")
    val local = docs.as[(Long, Double, Long)].collect()
      .sortBy { case (id, s, _) => (-s, id) }
    val want = local.scanLeft((0L, 0.0, 0L, 0L)) {
      case ((_, _, _, run), (id, s, t)) => (id, s, t, run + t)
    }.tail.takeWhile(_._4 <= 700L).map(r => (r._1, r._2, r._3)).toSet
    for (b <- Seq(1, 7, 4096)) {
      val got = Sampling.tokenBudgetSelect(docs, "doc_id", "score", "tok",
          budget = 700L, buckets = b)
        .as[(Long, Double, Long)].collect().toSet
      assert(got == want, s"buckets=$b")
    }
    assert(want.nonEmpty && want.size < 60)
  }

  test("tokenBudgetSelect: all-equal scores degrade to an id-ordered prefix") {
    val docs = (1L to 10L).map(i => (i, 0.5, 10L)).toDF("doc_id", "score", "tok")
    val got = Sampling.tokenBudgetSelect(docs, "doc_id", "score", "tok",
        budget = 35L)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("importanceWeights: target-like docs score higher, hand-checked NLL ratio") {
    import org.apache.spark.sql.functions.col
    // target model: all "wiki"; corpus docs: one wiki-ish, one web-ish
    val docs = Seq(
      (10L, "wiki wiki facts"),
      (20L, "wiki facts"),
      (1L, "wiki facts today"),
      (2L, "spam click buy")
    ).toDF("doc_id", "text")
    val got = Sampling.importanceWeights(docs, "doc_id", "text",
        col("doc_id") >= 10L)
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // only raw-corpus docs are scored
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 3L && got(2L)._1 == 3L)
    assert(got(1L)._2 > 0 && got(2L)._2 < 0)
    assert(got(1L)._2 > got(2L)._2)
    // hand-check doc 1: counts tgt {wiki:3, facts:2}, raw {wiki:1, facts:1,
    // today:1, spam:1, click:1, buy:1}; N_tgt=5, N_raw=6, V=6
    def lr(ct: Long, cr: Long): Double =
      math.log((ct + 1).toDouble / 11) - math.log((cr + 1).toDouble / 12)
    val want1 = BigDecimal((lr(3, 1) + lr(2, 1) + lr(0, 1)) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(1L)._2 - want1) < 1e-9, s"got ${got(1L)._2} want $want1")
  }

  test("gumbelTopK noise is not a lattice in id (mixer regression)") {
    import org.apache.spark.sql.functions.{col, lit}
    // Equal weights: selection depends on the noise alone. A linear
    // (Weyl) hash u(id) = a·id + b (mod 1) selects ids forming a
    // near-arithmetic set — by the three-distance theorem the sorted
    // consecutive gaps take at most 3 distinct values. The avalanche
    // mixer must produce many distinct gaps.
    val pop = spark.range(2000L).select(col("id"), lit(0.0).as("w"))
    val ids = Sampling.gumbelTopK(pop, "id", "w", k = 100)
      .select("id").as[Long].collect().sorted
    val gaps = ids.sliding(2).map(p => p(1) - p(0)).toSeq.distinct
    assert(gaps.size > 10, s"only ${gaps.size} distinct gaps — lattice noise")
  }

  test("gumbelTopK: deterministic, weight-sensitive, top-k planned (no global sort)") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val pop = spark.range(1000L).select(
      col("id"),
      // one row with overwhelming log-weight, the rest tiny
      when(col("id") === 7L, lit(50.0)).otherwise(lit(0.0)).as("w"))
    val s1 = Sampling.gumbelTopK(pop, "id", "w", k = 10)
      .as[(Long, Double, Long)].collect()
    assert(s1.length == 10)
    // rank 1 must be the dominant row: its score is w + g >= 50 + g_min,
    // unreachable for w = 0 rows (max Gumbel of 1000 draws ~ ln(1000) ≈ 7)
    assert(s1.minBy(_._3)._1 == 7L)
    // same seed -> identical sample; different seed -> different noise
    val s2 = Sampling.gumbelTopK(pop, "id", "w", k = 10)
      .as[(Long, Double, Long)].collect()
    assert(s1.toSeq == s2.toSeq)
    val s3 = Sampling.gumbelTopK(pop, "id", "w", k = 10, seed = 99L)
      .as[(Long, Double, Long)].collect()
    assert(s1.map(_._1).toSet != s3.map(_._1).toSet)
    // scale shape: per-partition top-k merge, not a corpus-wide sort
    val plan = Sampling.gumbelTopK(pop, "id", "w", k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("diverseSample keeps medoid-region and fringe per cluster, deterministically") {
    // two well-separated 1-D-ish clusters around (0,...) and (10,...):
    // ids 0-19 at distance id*0.1 from origin, ids 100-119 likewise at 10
    def vec(center: Float, off: Float) =
      Array.tabulate(4)(j => if (j == 0) center + off else 0.0f)
    val rows = (0 until 20).map(i => (i.toLong, vec(0f, i * 0.1f))) ++
      (0 until 20).map(i => (100L + i, vec(10f, i * 0.1f)))
    val df = rows.toDF("vec_id", "embedding")
    val model = graft.operators.Similarity.IvfModel(
      Seq(Seq.tabulate(4)(j => if (j == 0) 0f else 0f),
        Seq.tabulate(4)(j => if (j == 0) 10f else 0f)))
    val got = Sampling.diverseSample(df, "vec_id", "embedding", model,
        perCluster = 6, fringeFrac = 0.5)
      .as[(Long, Int, Double, String)].collect()
    val byCluster = got.groupBy(_._2)
    assert(byCluster.keySet == Set(0, 1))
    for ((c, rowsC) <- byCluster) {
      assert(rowsC.length == 6, s"cluster $c kept ${rowsC.length}")
      val base = if (c == 0) 0L else 100L
      val core = rowsC.filter(_._4 == "core").map(_._1).toSet
      val fringe = rowsC.filter(_._4 == "fringe").map(_._1).toSet
      assert(core == Set(base, base + 1, base + 2), s"cluster $c core $core")
      assert(fringe == Set(base + 17, base + 18, base + 19),
        s"cluster $c fringe $fringe")
    }
    // deterministic: same inputs, same sample
    val again = Sampling.diverseSample(df, "vec_id", "embedding", model,
        perCluster = 6, fringeFrac = 0.5)
      .as[(Long, Int, Double, String)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("curriculumOrder: dense easy-to-hard permutation, partitioning-proof") {
    import org.apache.spark.sql.functions.{col, concat, lit, md5}
    val docs = (1L to 200L).map(i => (i, (i % 7) * 10.0))
      .toDF("doc_id", "difficulty")
    val got = Sampling.curriculumOrder(docs, "doc_id", "difficulty",
        numPartitions = 8)
      .as[(Long, Double, Long)].collect()
    // pos is a permutation of 1..n
    assert(got.map(_._3).sorted.toSeq == (1L to 200L))
    // positions are monotone in score: easy docs train first
    val byPos = got.sortBy(_._3)
    assert(byPos.sliding(2).forall(p => p(0)._2 <= p(1)._2))
    // within a same-score run the order IS the seeded md5 permutation
    val hashes = docs
      .select(col("doc_id"),
        md5(concat(lit("graft"), col("doc_id").cast("string"))).as("h"))
      .as[(Long, String)].collect().toMap
    byPos.filter(_._2 == 0.0).map(r => hashes(r._1))
      .sliding(2).foreach(p => assert(p(0) <= p(1)))
    // identical output under a different input partitioning
    val again = Sampling.curriculumOrder(docs.repartition(13),
        "doc_id", "difficulty", numPartitions = 3)
      .as[(Long, Double, Long)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("groupSplit: whole groups move together, thresholds hold exactly") {
    val rows = (1 to 400).map(i => (i.toLong, s"grp${i % 40}"))
    val df = rows.toDF("id", "grp")
    val got = Sampling.groupSplit(df, "grp", valPct = 20, testPct = 20)
      .as[(Long, String, String)].collect()
    assert(got.length == 400)
    // leakage safety: one split per group, always
    val perGroup = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(perGroup.values.forall(_.size == 1))
    // exact parity with an independently computed md5 bucket
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(g: String): Long = {
      val hex = md.digest(s"graft$g".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 100
    }
    got.foreach { case (_, g, s) =>
      val b = bucket(g)
      val want = if (b < 20) "val" else if (b < 40) "test" else "train"
      assert(s == want, s"group $g bucket $b")
    }
    // re-seeding redraws at least one group's assignment
    val reseeded = Sampling.groupSplit(df, "grp", 20, 20, seed = "other")
      .as[(Long, String, String)].collect()
    assert(reseeded.map(r => r._1 -> r._3).toMap !=
      got.map(r => r._1 -> r._3).toMap)
    // a degenerate percentage split is rejected loudly
    intercept[IllegalArgumentException] {
      Sampling.groupSplit(df, "grp", valPct = 60, testPct = 40)
    }
  }

  test("splitLeakageReport flags cross-split duplicates, skips singletons") {
    // 40 groups guarantee all three splits occur at 15/15; text bodies
    // are duplicated across pairs of groups so some pairs straddle
    val docs = (0L until 80L).map { i =>
      (i, s"shared body ${i % 40}", s"grp${i % 40}")
    } ++ Seq((900L, "unique body", "grp0"))
    val df = docs.toDF("id", "text", "grp")
    val splitOf = Sampling.groupSplit(df, "grp", 15, 15)
      .select("id", "split").as[(Long, String)].collect().toMap
    val got = Sampling.splitLeakageReport(df, "id", "text", "grp", 15, 15)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    // every duplicated text appears (each i%40 body occurs twice);
    // the singleton never does
    assert(got.length == 40)
    got.foreach { case (fp, n, tr, va, te, leaky) =>
      assert(n == 2L && n == tr + va + te, fp)
      assert(leaky == ((tr > 0 && (va > 0 || te > 0)) ||
        (va > 0 && te > 0)), fp)
    }
    // cross-check one group against the raw split assignment: body k
    // lives in grp k (x2 via i and i+40 -> SAME group, same split, so
    // those two rows are never leaky on their own)... bodies are
    // per-(i%40) so both copies share the group: expect zero leaks
    assert(got.forall(!_._6))
    // now plant a true leak: the same body under two groups whose
    // splits differ (search one such pair deterministically)
    val bySplit = (0L until 40L).groupBy(g => splitOf(g))
    assert(bySplit.size >= 2, s"need 2 splits, got ${bySplit.keySet}")
    val (s1, g1) = bySplit.head
    val (_, g2) = bySplit.tail.head
    val leakDocs = df.unionByName(Seq(
        (1000L, s"shared body ${g1.head}", s"grp${g2.head}"))
      .toDF("id", "text", "grp"))
    val leaked = Sampling
      .splitLeakageReport(leakDocs, "id", "text", "grp", 15, 15)
      .filter($"leaky").as[(String, Long, Long, Long, Long, Boolean)]
      .collect()
    assert(leaked.length == 1)
    assert(leaked.head._2 == 3L) // the two originals + the plant
  }

  test("groupSplit rejects a null group loudly instead of train-defaulting") {
    // A null group used to hash to a null bucket and fall through both
    // when() branches into "train" — concentrating null-group near-dups
    // on the training side with no signal.
    val rows = Seq((1L, Some("a")), (2L, Option.empty[String]))
      .toDF("id", "grp")
    val e = intercept[Exception] {
      Sampling.groupSplit(rows, "grp").collect()
    }
    assert(e.getMessage.contains("null group")
      || e.getCause != null && e.getCause.getMessage.contains("null group"),
      e.getMessage)
  }
  test("sqrtMixingWeights: hand-computed dampened shares, null domain raises") {
    // 100 / 25 / 1 docs: raw shares 794k / 198k / 8k; sqrt-dampened
    // masses 10 / 5 / 1 -> 625k / 312.5k(->313k? no: half-up on the
    // lattice) / 62.5k — computed exactly below, not asserted from
    // prose
    val docs = ((1 to 100).map(i => (i.toLong, "web")) ++
      (1 to 25).map(i => (i.toLong, "wiki")) ++
      Seq((1L, "books"))).toDF("id", "domain")
    val got = Sampling.sqrtMixingWeights(docs, "domain")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val counts = Map("web" -> 100L, "wiki" -> 25L, "books" -> 1L)
    val sm = counts.view.mapValues(n =>
      math.floor(math.sqrt(n.toDouble) * 1e6).toLong).toMap
    val tn = counts.values.sum; val ts = sm.values.sum
    counts.foreach { case (dom, n) =>
      val raw = (2 * n * 1000000L + tn) / (2 * tn)
      val damp = (2 * sm(dom) * 1000000L + ts) / (2 * ts)
      assert(got(dom) == ((n, raw, damp)), s"domain $dom")
    }
    // sqrt dampening flattens: web loses share, books gains
    assert(got("web")._3 < got("web")._2)
    assert(got("books")._3 > got("books")._2)
    val err = intercept[Exception] {
      Sampling.sqrtMixingWeights(
        Seq((1L, Option.empty[String])).toDF("id", "domain"), "domain")
        .collect()
    }
    assert(err.getMessage.contains("null domain")
      || err.getCause != null &&
        err.getCause.getMessage.contains("null domain"), err.getMessage)
  }

  test("systematicResample: hand comb, zero-weight drop, exact total") {
    import spark.implicits._
    // W = 10, m = 5: comb points 1, 3, 5, 7, 9 over cum 2 | 2 | 5 | 10
    val got = Sampling.systematicResample(
        Seq((1L, 2L), (2L, 0L), (3L, 3L), (4L, 5L)).toDF("id", "w"),
        "id", "w", m = 5L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got == Map(1L -> ((2L, 1L)), 3L -> ((5L, 2L)),
      4L -> ((10L, 2L))))
  }

  test("systematicResample: Σcopies = m, within-1 of expectation, " +
      "partition/shard invariance, zero-total raise") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0L until 500L).map(i => (i, rnd.nextInt(20).toLong))
    val w = rows.map(_._2).sum
    val m = 777L
    def run(parts: Int, shardSize: Long) = Sampling.systematicResample(
        rows.toDF("id", "w").repartition(parts), "id", "w", m, shardSize)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val base = run(1, 64L)
    assert(base.map(_._4).sum == m)
    base.foreach { case (id, wi, _, c) =>
      val exp = m.toDouble * wi / w
      assert(math.abs(c - exp) < 1.0, s"id=$id copies=$c expected=$exp")
    }
    assert(run(7, 64L) == base)
    assert(run(3, 1024L) == base)
    val e = intercept[Exception] {
      Sampling.systematicResample(
        Seq((1L, 0L)).toDF("id", "w"), "id", "w", m = 5L).collect()
    }
    assert(e.getMessage.contains("total weight")
      || e.getCause != null &&
        e.getCause.getMessage.contains("total weight"), e.getMessage)
  }

  test("neymanAllocation: hand weights, largest remainder sums to m, " +
      "zero-variance strata draw 0, raises") {
    import spark.implicits._
    // A [1,5]: v=16 → w=4; B [3,3,3]: v=0 → w=0; C [0,10]: v=100 →
    // w=10. W=14, m=10: base A=2 rem 12, C=7 rem 2, B=0 → leftover 1
    // to A (largest remainder) → 3/0/7
    val df = Seq(("A", 1L), ("A", 5L), ("B", 3L), ("B", 3L), ("B", 3L),
      ("C", 0L), ("C", 10L)).toDF("s", "x")
    val got = Sampling.neymanAllocation(df, "s", "x", m = 10L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      "A" -> ((2L, 6L, 4L, 3L)),
      "B" -> ((3L, 9L, 0L, 0L)),
      "C" -> ((2L, 10L, 10L, 7L))))
    // BigInt/IEEE reference on a random corpus: Σ n_alloc = m exactly,
    // weights match floor(IEEE sqrt(N·Q − S²))
    val rnd = new scala.util.Random(19)
    val rows = (0 until 400).map(i =>
      (s"s${i % 7}", rnd.nextInt(5000).toLong))
    val m = 997L
    val out = Sampling.neymanAllocation(rows.toDF("s", "x"), "s", "x", m)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.map(_._5).sum == m)
    val wantW = rows.groupBy(_._1).map { case (s, xs) =>
      val n = BigInt(xs.size); val sx = xs.map(x => BigInt(x._2)).sum
      val q = xs.map(x => BigInt(x._2) * x._2).sum
      s -> math.sqrt((n * q - sx * sx).toDouble).floor.toLong
    }
    out.foreach(r => assert(r._4 == wantW(r._1), r._1))
    // all-zero-variance corpus raises
    val e = intercept[Exception] {
      Sampling.neymanAllocation(
        Seq(("A", 2L), ("A", 2L)).toDF("s", "x"), "s", "x", 5L).collect()
    }
    assert(e.getMessage.contains("zero") || e.getCause != null &&
      e.getCause.getMessage.contains("zero"), e.getMessage)
    val e2 = intercept[Exception] {
      Sampling.neymanAllocation(
        Seq(("A", -1L), ("A", 2L)).toDF("s", "x"), "s", "x", 5L).collect()
    }
    assert(e2.getMessage.contains("non-negative") || e2.getCause != null &&
      e2.getCause.getMessage.contains("non-negative"), e2.getMessage)
  }

  test("systematicResample: duplicate ids raise loudly (per-row copy " +
      "allocation would be partition-order-dependent)") {
    import spark.implicits._
    val dup = Seq((1L, 2L), (2L, 3L), (2L, 4L), (3L, 1L)).toDF("id", "w")
    for (parts <- Seq(1, 4)) {
      val e = intercept[Exception] {
        Sampling.systematicResample(
          dup.repartition(parts), "id", "w", m = 5L).collect()
      }
      assert(e.getMessage.contains("duplicate id")
        || e.getCause != null &&
          e.getCause.getMessage.contains("duplicate id"), e.getMessage)
    }
  }
  test("kFoldReport: folds are the portable md5 hash of the group, " +
      "shares sum to ~1e6 per stratum, null group raises") {
    import spark.implicits._
    val rows = (0L until 500L).map(i =>
      (s"g${i % 37}", if (i % 3 == 0) "en" else "de"))
    val got = Sampling.kFoldReport(rows.toDF("grp", "lang"),
        "grp", "lang", k = 5)
      .as[(Long, String, Long, Long)].collect()
    // independent model: same md5-prefix hash, same counts and lattice
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def fold(g: String): Long =
      java.lang.Long.parseLong(md5hex("graft" + g).take(15), 16) % 5
    val counts = rows.groupBy { case (g, l) => (fold(g), l) }
      .map { case (k, v) => k -> v.size.toLong }
    val strata = rows.groupBy(_._2).map { case (l, v) => l -> v.size.toLong }
    val want = counts.map { case ((f, l), n) =>
      (f, l, n, (2 * n * 1000000L + strata(l)) / (2 * strata(l)))
    }.toSet
    assert(got.toSet == want)
    // every group's rows land in exactly one fold (the leakage rule)
    assert(got.map(_._1).distinct.size <= 5)
    // per-stratum shares sum to 1e6 within k half-ulps of rounding
    strata.keys.foreach { l =>
      val tot = got.filter(_._2 == l).map(_._4).sum
      assert(math.abs(tot - 1000000L) <= 5, s"$l shares sum $tot")
    }
    val e = intercept[Exception] {
      Sampling.kFoldReport(
        Seq((Option.empty[String], "en")).toDF("grp", "lang"),
        "grp", "lang").collect()
    }
    assert((e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("null group"), e.getMessage)
  }
}
