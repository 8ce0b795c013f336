package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Equivalence specs for the embedding-statistics family: standardize
  * against hand math, the distributed covariance against a dense local
  * recomputation, and the PCA basis against its defining properties
  * (orthonormality, eigen equation, per-component projected variance).
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic anisotropic cloud: dominant direction along (1,1,0,...)
  private val dim = 8
  private lazy val vecs: Seq[(Long, Seq[Float])] =
    (0L until 200L).map { i =>
      val a = math.sin(i * 0.7) * 3.0
      val b = math.cos(i * 1.3)
      val v = Seq.tabulate(dim) { d =>
        (a * (if (d < 2) 1.0 else 0.0) +
          b * (if (d == 2) 1.0 else 0.0) +
          0.1 * math.sin(i * 0.1 + d)).toFloat
      }
      (i, v)
    }
  private lazy val emb = vecs.toDF("vec_id", "embedding")

  private def denseCov(): (Array[Double], Array[Array[Double]]) = {
    val n = vecs.size
    val mean = Array.tabulate(dim)(d => vecs.map(_._2(d).toDouble).sum / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      vecs.map { case (_, v) =>
        (v(i) - mean(i)) * (v(j) - mean(j))
      }.sum / n
    }
    (mean, cov)
  }

  test("standardize: zero mean, unit variance, hand-checked value") {
    val z = Pca.standardize(emb, "vec_id", "embedding", roundTo = 6)
      .as[(Long, Long, Long)].collect()
      .map { case (id, d, zs) => (id, d, zs / 1e6) }
    val byDim = z.groupBy(_._2)
    assert(byDim.size == dim)
    for ((_, rows) <- byDim) {
      val m = rows.map(_._3).sum / rows.size
      val v = rows.map(r => r._3 * r._3).sum / rows.size
      assert(math.abs(m) < 1e-4, s"mean $m")
      assert(math.abs(v - 1.0) < 1e-4, s"var $v")
    }
    val (mean, cov) = denseCov()
    val want = (vecs.head._2(0) - mean(0)) / math.sqrt(cov(0)(0))
    val got = z.find(r => r._1 == 0L && r._2 == 0L).get._3
    assert(math.abs(got - want) < 1e-4)
  }

  test("covariance matches a dense local recomputation, and is symmetric") {
    val got = Pca.covariance(emb, "vec_id", "embedding", roundTo = 8)
      .as[(Long, Long, Long)].collect()
      .map { case (i, j, c) => ((i.toInt, j.toInt), c / 1e8) }.toMap
    assert(got.size == dim * dim)
    val (_, cov) = denseCov()
    for (i <- 0 until dim; j <- 0 until dim) {
      assert(math.abs(got((i, j)) - cov(i)(j)) < 1e-6, s"cov($i,$j)")
      assert(got((i, j)) == got((j, i)))
    }
  }

  test("standardize: a zero-variance dimension yields z = 0, not NaN-garbage") {
    // dim 1 is constant across the corpus -> sd = 0 -> 0/0 without the
    // explicit branch; dim 0 varies and must be unaffected
    val flat = (0L until 50L)
      .map(i => (i, Seq((math.sin(i * 0.9) * 2.0).toFloat, 0.25f)))
      .toDF("vec_id", "embedding")
    val z = Pca.standardize(flat, "vec_id", "embedding", roundTo = 6)
      .as[(Long, Long, Long)].collect()
    assert(z.filter(_._2 == 1L).forall(_._3 == 0L))
    val d0 = z.filter(_._2 == 0L).map(_._3 / 1e6)
    assert(math.abs(d0.map(x => x * x).sum / d0.length - 1.0) < 1e-4)
  }

  test("non-finite embedding components fail loudly, never quantize to 0") {
    val bad = Seq((1L, Seq(0.1f, Float.NaN)), (2L, Seq(0.2f, 0.3f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Pca.covariance(bad, "vec_id", "embedding").collect()
    }
    assert(ex.getMessage.contains("null/NaN/Inf"), ex.getMessage)
    val ex2 = intercept[Exception] {
      Pca.standardize(bad, "vec_id", "embedding").collect()
    }
    assert(ex2.getMessage.contains("null/NaN/Inf"), ex2.getMessage)
  }

  test("covariance is bit-identical across partition layouts (Gram pass)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Pca.covariance(df, "vec_id", "embedding", roundTo = 8)
        .as[(Long, Long, Long)].collect().toSet
    val one = run(emb.coalesce(1))
    val many = run(emb.repartition(7))
    assert(one == many)
    assert(one.size == dim * dim)
  }

  test("Gram accumulator flushes to BigInteger before long sums can wrap") {
    // components ~1e2 on the 1e7 grid -> vi ~1e9, per-row products ~1e18:
    // the per-row budget (Long.MaxValue/2) forces a flush every ~4 rows,
    // so this corpus exercises the overflow path hundreds of times
    val big = (0L until 400L).map { i =>
      (i, Seq.tabulate(4)(d => (100.0 + math.sin(i * 0.31 + d) * 50.0).toFloat))
    }
    val bigDf = big.toDF("vec_id", "embedding")
    val got = Pca.covariance(bigDf, "vec_id", "embedding", roundTo = 4)
      .as[(Long, Long, Long)].collect()
      .map { case (i, j, c) => ((i.toInt, j.toInt), c / 1e4) }.toMap
    val n = big.size
    val mean = Array.tabulate(4)(d => big.map(_._2(d).toDouble).sum / n)
    for (i <- 0 until 4; j <- 0 until 4) {
      val want = big.map { case (_, v) =>
        (v(i) - mean(i)) * (v(j) - mean(j))
      }.sum / n
      assert(math.abs(got((i, j)) - want) < 1e-3 * math.max(1.0, math.abs(want)),
        s"cov($i,$j): ${got((i, j))} vs $want")
    }
  }

  test("train: orthonormal basis, eigen equation, descending eigenvalues") {
    val k = 3
    val m = Pca.train(emb, "vec_id", "embedding", k = k)
    for (a <- 0 until k; b <- 0 until k) {
      val dot = (0 until dim).map(i => m.components(a)(i) * m.components(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-6, s"<w$a,w$b> = $dot")
    }
    assert(m.eigenvalues.toSeq == m.eigenvalues.sortBy(-_).toSeq)
    // eigen equation against the dense covariance: C w = lambda w
    val (_, cov) = denseCov()
    for (c <- 0 until k) {
      val w = m.components(c)
      val cw = Array.tabulate(dim)(i => (0 until dim).map(j => cov(i)(j) * w(j)).sum)
      for (i <- 0 until dim)
        assert(math.abs(cw(i) - m.eigenvalues(c) * w(i)) < 1e-4,
          s"comp $c dim $i: ${cw(i)} vs ${m.eigenvalues(c) * w(i)}")
    }
  }

  test("project: per-component variance ≈ eigenvalue, total variance bounded") {
    val k = 3
    val m = Pca.train(emb, "vec_id", "embedding", k = k)
    val pcs = Pca.project(emb, "vec_id", "embedding", m, roundTo = 6)
      .as[(Long, Seq[Long])].collect()
      .map { case (id, v) => (id, v.map(_ / 1e6)) }
    assert(pcs.length == vecs.size)
    val (_, cov) = denseCov()
    val total = (0 until dim).map(i => cov(i)(i)).sum
    for (c <- 0 until k) {
      val xs = pcs.map(_._2(c))
      val mu = xs.sum / xs.length
      val v = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      assert(math.abs(v - m.eigenvalues(c)) < 1e-2 * math.max(1.0, m.eigenvalues(c)),
        s"var(pc$c) $v vs ${m.eigenvalues(c)}")
      assert(m.eigenvalues(c) <= total + 1e-9)
    }
  }
}
