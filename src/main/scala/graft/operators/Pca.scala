package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Corpus-level embedding statistics and decorrelation: per-dimension
  * standardization, the distributed covariance matrix, and PCA
  * (train on distributed moments, project as a codegen'd map).
  *
  * The scale contract mirrors [[Similarity.ivfTrain]]: only
  * dimension-sized summaries (d means, d×d covariance entries, k×d
  * components) ever reach the driver; everything over the corpus is a
  * shuffle-bounded relational plan with map-side partial aggregation.
  */
object Pca {

  /** The exploded (id, dim, v) view of an embedding column — the
    * relational shape every moment aggregate here starts from.
    */
  private def exploded(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).cast("long").as("id"),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("id"), col("dim").cast("long").as("dim"),
        col("v").cast("double").as("v"))

  /** Per-dimension z-score standardization, exploded output
    * (id, dim, z) with z = (v - mean_dim) / stddev_pop_dim.
    *
    * The d per-dimension moments come from one groupBy (map-side partials
    * collapse each partition to d rows) and re-attach via a broadcast
    * join — never a window over a d-partition key, which would cap
    * parallelism at d at corpus scale.
    */
  def standardize(
      emb: DataFrame, idCol: String, vecCol: String,
      roundTo: Int = 4): DataFrame = {
    val ex = exploded(emb, idCol, vecCol)
    val stats = ex.groupBy("dim")
      .agg(avg("v").as("mu"), stddev_pop("v").as("sd"))
    ex.join(broadcast(stats), Seq("dim"))
      .select(col("id"), col("dim"),
        round((col("v") - col("mu")) / col("sd"), roundTo).as("z"))
  }

  /** The centered exploded view: (id, dim, cv = v - mean_dim, mu) with
    * the means broadcast back — mu rides along so a consumer holding a
    * materialized copy can read the mean without re-scanning the corpus.
    */
  private def centered(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val ex = exploded(emb, idCol, vecCol)
    val mu = ex.groupBy("dim").agg(avg("v").as("mu"))
    ex.join(broadcast(mu), Seq("dim"))
      .select(col("id"), col("dim"), (col("v") - col("mu")).as("cv"), col("mu"))
  }

  /** The d×d population covariance matrix as (i, j, cov) rows:
    * cov = mean over rows of (v_i - mu_i)(v_j - mu_j).
    *
    * Shape: self-join of the centered exploded view on the row id — the
    * shuffle moves 2·n·d rows (never n·d² : the d² blowup happens inside
    * the join's output stream and immediately collapses into the
    * (i, j) hash aggregate's map-side partials, ≤ d² rows per partition).
    * The final shuffle is d² rows per partition — constant in n.
    */
  def covariance(
      emb: DataFrame, idCol: String, vecCol: String,
      roundTo: Int = 6): DataFrame =
    covFromCentered(centered(emb, idCol, vecCol), roundTo)

  private def covFromCentered(c: DataFrame, roundTo: Int): DataFrame = {
    val a = c.select(col("id"), col("dim").as("i"), col("cv").as("vi"))
    val b = c.select(col("id"), col("dim").as("j"), col("cv").as("vj"))
    a.join(b, Seq("id"))
      .groupBy("i", "j")
      .agg(round(avg(col("vi") * col("vj")), roundTo).as("cov"))
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

  /** Train a top-k PCA: distributed mean + covariance (see
    * [[covariance]] for the shuffle contract), then power iteration with
    * deflation on the driver-side d×d matrix. Deterministic end to end —
    * no random init, no sampling.
    */
  def train(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 200): PcaModel = {
    val d = emb.select(size(col(vecCol))).head.getInt(0)
    require(k >= 1 && k <= d, s"k $k must be in [1, dim $d]")
    // one materialization feeds both driver-bound moment reads: the mean
    // (d rows, a tiny agg over the checkpointed view) and the covariance
    // self-join's two consumers — without it the mean agg and each join
    // side would re-run the explode over the corpus
    val ctr = centered(emb, idCol, vecCol).localCheckpoint()
    val mean = new Array[Double](d)
    ctr.groupBy("dim").agg(first("mu").as("mu")).collect()
      .foreach { case Row(dim: Long, mu: Double) => mean(dim.toInt) = mu }
    val cov = Array.ofDim[Double](d, d)
    covFromCentered(ctr, roundTo = 12).collect().foreach {
      case Row(i: Long, j: Long, c: Double) => cov(i.toInt)(j.toInt) = c
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
    * join, no shuffle, and the mean never ships with the data.
    */
  def project(
      emb: DataFrame, idCol: String, vecCol: String,
      model: PcaModel, roundTo: Int = 4): DataFrame = {
    val pcs = model.components.map { w =>
      val off = w.indices.map(i => w(i) * model.mean(i)).sum
      round(fdot(col(vecCol), typedLit(w.map(_.toFloat).toSeq)) - lit(off), roundTo)
    }
    emb.select(col(idCol).cast("long").as("id"), array(pcs.toSeq: _*).as("pc"))
  }
}
