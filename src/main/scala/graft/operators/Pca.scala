package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorFunctions._

/** Corpus-level embedding statistics and decorrelation: per-dimension
  * standardization, the distributed covariance matrix, and PCA
  * (train on distributed moments, project as a codegen'd map).
  *
  * The scale contract mirrors [[Similarity.ivfTrain]]: only
  * dimension-sized summaries (d means, d×d covariance entries, k×d
  * components) ever reach the driver; everything over the corpus is a
  * shuffle-bounded relational plan with map-side partial aggregation.
  *
  * Determinism contract: float sums are partition-order-dependent, so a
  * plain `avg`/`stddev` over doubles can flip a value sitting on a
  * rounding boundary between runs (and between engines). Every moment
  * here is therefore computed on an integer grid — each component is
  * quantized to `⌊v·grid + ½⌋` and summed in exact `decimal(38,0)`
  * (order-independent), and only the final mean/variance/z arithmetic
  * runs in double, on operands that are bit-identical across runs,
  * partitionings and SQL engines. The grid (default 1e7) sits below
  * float32 resolution for unit-scale embeddings, so the quantization
  * error (≤ 5e-8 per component) is invisible at the output rounding.
  */
object Pca {

  /** The embedding cast to array<double> with a loud totality guard:
    * a null/NaN/Inf component would otherwise quantize to a silent
    * in-range integer (`floor(NaN) = 0`, `floor(+Inf) = Long.MaxValue`)
    * — indistinguishable from legitimate data in every downstream
    * moment. Out-of-contract input fails with a labeled error instead.
    */
  private def finiteVec(vecCol: String, op: String): Column = {
    val d = col(vecCol).cast("array<double>")
    when(exists(d, x => x.isNull || isnan(x) ||
        abs(x) === lit(Double.PositiveInfinity)),
      raise_error(lit(s"Pca.$op: embedding contains a null/NaN/Inf " +
        "component — clean or impute before computing moments")))
      .otherwise(d)
  }

  /** The exploded (id, dim, v) view of an embedding column — the
    * relational shape every moment aggregate here starts from.
    */
  private def exploded(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).cast("long").as("id"),
        posexplode(finiteVec(vecCol, "moments")).as(Seq("dim", "v")))
      .select(col("id"), col("dim").cast("long").as("dim"),
        col("v").cast("double").as("v"))

  /** The integer-grid view (id, dim, vi = ⌊v·grid + ½⌋ as decimal(38,0)):
    * sums over vi are exact whatever the partition order, which is what
    * makes every downstream moment reproducible. decimal(38,0) rather
    * than long so second-moment sums can't wrap at corpus scale
    * (1e9 rows × (1e7·v)² clears Long.MaxValue).
    *
    * ⌊x+½⌋, never `round(x)`: multiply, add and floor are each a single
    * exactly-specified IEEE 754 operation, so every engine (and every
    * version of the same engine) that receives the same double produces
    * the same integer. Engine `round()` carries no such guarantee — its
    * implementations disagree within 1 ulp of half boundaries, which is
    * exactly where a quantizer lives.
    */
  private def quantized(
      emb: DataFrame, idCol: String, vecCol: String, grid: Double): DataFrame =
    exploded(emb, idCol, vecCol).select(col("id"), col("dim"),
      floor(col("v") * grid + lit(0.5)).cast(DecimalType(38, 0)).as("vi"))

  /** Per-dimension z-score standardization, exploded output
    * (id, dim, z_scaled) with z = (vi - mean_dim) / stddev_pop_dim on
    * the quantization grid (scale cancels, so z is unit-free and exact)
    * and z_scaled = ⌊z·10^roundTo + ½⌋ as a BIGINT — the output never
    * carries a float, so its bytes (and any hash of them) are identical
    * across engines and engine versions; consumers that want the decimal
    * form divide by 10^roundTo.
    *
    * The d per-dimension moments come from one groupBy (map-side partials
    * collapse each partition to d rows) and re-attach via a broadcast
    * join — never a window over a d-partition key, which would cap
    * parallelism at d at corpus scale.
    */
  def standardize(
      emb: DataFrame, idCol: String, vecCol: String,
      roundTo: Int = 4, grid: Double = 1e7): DataFrame = {
    val q = quantized(emb, idCol, vecCol, grid)
    val stats = q.groupBy("dim").agg(
      sum("vi").as("s1"),
      sum(col("vi") * col("vi")).as("s2"),
      count(lit(1)).as("n"))
    // finishing math in double, on exact integer operands — written as
    // s2/n - (s1/n)² (not a fused stddev) so the oracle SQL can mirror
    // the exact same IEEE operation sequence. A zero-variance dimension
    // standardizes to z = 0 EXPLICITLY (both engines branch on the same
    // exact-operand variance expression): without the branch, 0/0 is
    // NaN and floor(NaN) is a silent 0 here but an error in the oracle.
    // <= 0, not == 0: the double finish can land a true-zero variance
    // a hair negative, and sqrt of that is NaN too.
    val mu = col("s1").cast("double") / col("n")
    val variance = col("s2").cast("double") / col("n") - mu * mu
    val sd = sqrt(variance)
    q.join(broadcast(stats), Seq("dim"))
      .select(col("id"), col("dim"),
        when(variance <= 0, lit(0L))
          .otherwise(floor((col("vi").cast("double") - mu) / sd
            * lit(math.pow(10, roundTo)) + lit(0.5))).as("z_scaled"))
  }

  /** The d×d population covariance matrix as (i, j, cov_scaled) rows:
    * cov = E[v_i v_j] - E[v_i]E[v_j] over the grid-quantized components,
    * rescaled back to the input units and emitted as
    * cov_scaled = ⌊cov·10^roundTo + ½⌋ BIGINT (see [[standardize]] for
    * why the output is integer, not a rounded double).
    *
    * Shape: one [[gramMoments]] pass — the corpus never shuffles at all;
    * the only exchange moves p·(d²+d) partial rows (p = input
    * partitions), constant in n.
    */
  def covariance(
      emb: DataFrame, idCol: String, vecCol: String,
      roundTo: Int = 6, grid: Double = 1e7): DataFrame = {
    // eager materialization: the pair and first-moment branches below
    // both read the Gram result, and without it each branch would re-run
    // the full corpus pass (the result is d²+d rows — trivial to hold)
    val g = gramMoments(emb, idCol, vecCol, grid, corpusDim(emb, vecCol))
      .localCheckpoint()
    val pair = g.filter(col("j") >= 0)
    val m = g.filter(col("j") === -1)
    val mi = m.select(col("i"), col("sij").as("s1i"))
    val mj = m.select(col("i").as("j"), col("sij").as("s1j"))
    val mui = col("s1i").cast("double") / col("n")
    val muj = col("s1j").cast("double") / col("n")
    pair.join(broadcast(mi), Seq("i")).join(broadcast(mj), Seq("j"))
      .select(col("i"), col("j"),
        floor((col("sij").cast("double") / col("n") - mui * muj)
          / lit(grid * grid) * lit(math.pow(10, roundTo)) + lit(0.5))
          .as("cov_scaled"))
  }

  /** Exact integer moment sums in ONE corpus pass, no self-join:
    * (i, j ≥ 0, sij = Σ vi·vj, n) second moments plus (i, j = -1,
    * si = Σ vi, n) first moments, over the ⌊v·grid + ½⌋ quantization.
    *
    * Each task folds its rows into a d×d long Gram accumulator —
    * genuine per-partition imperative state that no relational operator
    * expresses without exploding the corpus — and emits d²+d partial
    * rows; a d²-sized hash aggregate sums the partials in
    * decimal(38,0). Versus the previous exploded self-join (2·n·d rows
    * through an exchange), nothing corpus-sized ever shuffles: at 10⁹
    * rows × d=32 the exchange drops from ~6·10¹⁰ rows to
    * p·(d²+d) ≈ 10⁶.
    *
    * Exactness contract: per-row products run in long (|vi| ≤ grid·|v|
    * stays under ~2³¹ for unit-scale embeddings, so vi·vj can't wrap —
    * the same bound the join-based version relied on); accumulator
    * cells flush into exact BigInteger before any long SUM could wrap
    * (a conservative per-row budget check, O(1) per row). Integer sums
    * are associative and commutative, so the result is bit-identical
    * across partitionings — the [[Pca]] determinism contract.
    */
  /** The corpus embedding dimension, derived once on the driver from a
    * column-pruned single-row probe (0 for an empty corpus). Passed into
    * [[gramMoments]] so every partition validates against the SAME
    * dimension — a per-partition "first row wins" guard would let a
    * corpus whose partitions are internally uniform but mutually ragged
    * slip through and silently mix dimensions in the moment sums.
    */
  private def corpusDim(emb: DataFrame, vecCol: String): Int =
    emb.select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)

  private def gramMoments(
      emb: DataFrame, idCol: String, vecCol: String, grid: Double,
      dim: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // spread before the d×d per-row Gram fold (Guards.spread scaladoc):
    // exact long/BigInteger accumulators, so the partition layout cannot
    // change a single output bit
    val vecs = Guards.spread(emb.select(
        transform(finiteVec(vecCol, "gramMoments"),
          x => floor(x * grid + lit(0.5))).as("varr"))
      .where(col("varr").isNotNull))
      .as[Seq[Long]]
    val partials = vecs.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val d = dim
        var acc: Array[Long] = null   // d² second-moment cells + d first-moment cells
        var big: Array[java.math.BigInteger] = null
        var n = 0L
        var budget = 0L
        def flush(): Unit = {
          var k = 0
          while (k < acc.length) {
            if (acc(k) != 0L) {
              big(k) = big(k).add(java.math.BigInteger.valueOf(acc(k)))
              acc(k) = 0L
            }
            k += 1
          }
          budget = Long.MaxValue / 2
        }
        it.foreach { v =>
          if (acc == null) {
            acc = new Array[Long](d * d + d)
            big = Array.fill(d * d + d)(java.math.BigInteger.ZERO)
            budget = Long.MaxValue / 2
          }
          require(v.length == d,
            s"ragged embedding: expected dim $d, got ${v.length}")
          var m = 0L
          var i = 0
          while (i < d) { val a = math.abs(v(i)); if (a > m) m = a; i += 1 }
          // the per-row product bound itself must fit a long — past this
          // the quantized component magnitudes (grid·|v|) are outside the
          // operator's contract, so fail loudly instead of wrapping
          require(m <= 3037000499L,
            s"quantized component magnitude $m overflows the long product" +
              " bound — lower the grid for this value range")
          // every cell gains at most one |product| ≤ m² this row; flush
          // while the worst cell still has headroom
          if (budget < m * m || budget < m) flush()
          budget -= math.max(m * m, m)
          i = 0
          while (i < d) {
            val vi = v(i)
            val row = i * d
            var j = 0
            while (j < d) { acc(row + j) += vi * v(j); j += 1 }
            acc(d * d + i) += vi
            i += 1
          }
          n += 1
        }
        flush()
        val out = new Array[(Long, Long, String, Long)](d * d + d)
        var i = 0
        while (i < d) {
          var j = 0
          while (j < d) {
            out(i * d + j) = (i.toLong, j.toLong, big(i * d + j).toString, n)
            j += 1
          }
          out(d * d + i) = (i.toLong, -1L, big(d * d + i).toString, n)
          i += 1
        }
        out.iterator
      }
    }.toDF("i", "j", "s", "n")
    partials
      .select(col("i"), col("j"),
        col("s").cast(DecimalType(38, 0)).as("sij"), col("n"))
      .groupBy("i", "j")
      .agg(sum("sij").as("sij"), sum("n").as("n"))
  }

  /** Trained PCA basis: the corpus mean and the top-k principal
    * components (rows of an orthonormal k×d matrix) with their
    * eigenvalues. Driver-sized — rides into projection plans as literals.
    */
  case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def k: Int = components.length
    def dim: Int = mean.length
  }

  /** Dominant eigenpair of a symmetric PSD matrix by power iteration
    * with a deterministic start and a final Rayleigh-quotient estimate.
    * Driver-side over a d×d array — O(iters · d²) flops, d is the
    * embedding dimension (tiny).
    */
  private def powerIter(c: Array[Array[Double]], iters: Int): (Double, Array[Double]) = {
    val d = c.length
    var v = Array.tabulate(d)(i => 1.0 / (i + 1))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(i => {
        var s = 0.0; var j = 0
        while (j < d) { s += c(i)(j) * v(j); j += 1 }; s
      })
      val n = math.sqrt(w.map(x => x * x).sum)
      if (n > 0) v = w.map(_ / n)
    }
    val cv = Array.tabulate(d)(i => {
      var s = 0.0; var j = 0
      while (j < d) { s += c(i)(j) * v(j); j += 1 }; s
    })
    val lambda = v.indices.map(i => v(i) * cv(i)).sum
    (lambda, v)
  }

  /** Train a top-k PCA: distributed exact integer moments (see
    * [[covariance]] for the shuffle contract), then power iteration with
    * deflation on the driver-side d×d matrix. Deterministic end to end —
    * no random init, no sampling, and the moments are aggregation-order-
    * independent, so two runs (or two cluster layouts) produce the
    * bit-identical basis.
    */
  def train(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 200, grid: Double = 1e7): PcaModel = {
    val d = corpusDim(emb, vecCol)
    require(k >= 1 && k <= d, s"k $k must be in [1, dim $d]")
    // one Gram pass feeds every driver-bound moment (d first moments,
    // d² second moments) — a single d²+d-row collect
    val g = gramMoments(emb, idCol, vecCol, grid, d).collect()
    val s1 = new Array[Double](d)
    var n = 0L
    g.foreach { r =>
      if (r.getAs[Long]("j") == -1L) {
        s1(r.getAs[Long]("i").toInt) = r.getAs[java.math.BigDecimal]("sij").doubleValue
        n = r.getAs[Long]("n")
      }
    }
    require(n > 0, "PCA train needs a non-empty corpus")
    val mean = Array.tabulate(d)(i => s1(i) / n / grid)
    val cov = Array.ofDim[Double](d, d)
    g.foreach { r =>
      val j = r.getAs[Long]("j").toInt
      if (j >= 0) {
        val i = r.getAs[Long]("i").toInt
        val sij = r.getAs[java.math.BigDecimal]("sij").doubleValue
        cov(i)(j) = (sij / n - (s1(i) / n) * (s1(j) / n)) / (grid * grid)
      }
    }
    val comps = new Array[Array[Double]](k)
    val eigs = new Array[Double](k)
    for (c <- 0 until k) {
      val (lambda, v) = powerIter(cov, iters)
      comps(c) = v; eigs(c) = lambda
      // deflate: cov -= lambda v v^T
      for (i <- 0 until d; j <- 0 until d) cov(i)(j) -= lambda * v(i) * v(j)
    }
    PcaModel(mean, comps, eigs)
  }

  /** Project embeddings onto the trained basis: pc_c = <v - mean, w_c> =
    * <v, w_c> - <mean, w_c>, the second term a driver-computed scalar —
    * so the plan is k fused dot products against component literals
    * ([[graft.functions.FloatDotProduct]]): a codegen'd per-row map, no
    * join, no shuffle, and the mean never ships with the data. Each
    * projection is emitted as ⌊pc·10^roundTo + ½⌋ BIGINT (see
    * [[standardize]] for the no-float-output contract).
    */
  def project(
      emb: DataFrame, idCol: String, vecCol: String,
      model: PcaModel, roundTo: Int = 4): DataFrame = {
    val pcs = model.components.map { w =>
      val off = w.indices.map(i => w(i) * model.mean(i)).sum
      floor((fdot(col(vecCol), typedLit(w.map(_.toFloat).toSeq)) - lit(off))
        * lit(math.pow(10, roundTo)) + lit(0.5))
    }
    emb.select(col(idCol).cast("long").as("id"), array(pcs.toSeq: _*).as("pc"))
  }
}
