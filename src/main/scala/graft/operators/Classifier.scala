package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed linear classifier training — the quality-classifier step
  * of LLM corpus curation (fastText/logistic filters scoring "does this
  * page look like reference text", e.g. the GPT-3 / LLaMA WebText
  * quality filters) re-expressed as fixed-round batch gradient descent
  * where each round is ONE map-side-combined aggregation over the
  * corpus and the model itself never leaves driver scale.
  */
object Classifier {

  /** Trained linear model: bias + one weight per feature column, plus
    * the training hyperparameters (carried so scoring and twins can
    * reproduce the exact arithmetic).
    */
  case class LinearModel(
      bias: Double, weights: Array[Double], lr: Double, grid: Int)

  /** The softsign link σ(z) = 0.5·(1 + z/(1+|z|)) — a logistic-shaped
    * squashing onto (0,1) built from +,·,/,|·| only. Chosen over exp's
    * logistic because it is bit-reproducible across engines: IEEE
    * double add/mul/div/abs are correctly rounded everywhere, while
    * exp() differs by ulps between libm implementations (the reason the
    * LM-fluency queries round ln() outputs instead of chaining them).
    */
  def softsign(z: Column): Column =
    lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))

  private def zExpr(b: Double, w: Array[Double], feats: Seq[Column]): Column =
    feats.zipWithIndex.foldLeft(lit(b): Column) {
      case (acc, (f, j)) => acc + lit(w(j)) * f
    }

  /** Half-up decimal rounding matching Spark's `round` (Spark rounds the
    * canonical shortest-decimal rendering of the double, i.e.
    * BigDecimal.valueOf semantics — so does DuckDB's round in every case
    * the oracle suite has exercised).
    */
  private def roundGrid(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Fixed-round full-batch gradient descent for a linear classifier
    * under the [[softsign]] link and squared-error-style update
    * g_j = Σ_i (p_i − y_i)·x_ij / n,  w_j ← w_j − lr·g_j  (w_0 = 0).
    *
    * Determinism: per-row gradient contributions are rounded to the
    * 1e-`grid` grid and summed in decimal(38, grid) — exact in any
    * partition order — and the driver-side weight update is a fixed
    * sequence of IEEE double ops re-synchronized to the grid each round,
    * so two runs (or a mirroring engine) reproduce the weights bit for
    * bit. Same discipline as [[Pca.train]]'s moments + power iteration.
    *
    * Scale: each round is one aggregation producing d+1 decimal sums
    * (map-side partials, a d+1-column single row to the driver) over the
    * once-checkpointed feature projection; rounds are a fixed
    * hyperparameter. Nothing corpus-sized ever reaches the driver, and
    * the feature matrix is scanned, never shuffled.
    */
  def trainSoftsign(
      df: DataFrame, featureCols: Seq[String], labelCol: String,
      rounds: Int = 8, lr: Double = 0.5, grid: Int = 12): LinearModel = {
    require(featureCols.nonEmpty, "need at least one feature column")
    require(rounds >= 1 && rounds <= 64, s"rounds in [1, 64] (got $rounds)")
    require(grid >= 6 && grid <= 18, s"grid in [6, 18] (got $grid)")
    // One projected materialization feeds all `rounds` scans.
    val m = df.select(
      (col(labelCol).cast("double").as("__y") +: featureCols.zipWithIndex
        .map { case (c, j) => col(c).cast("double").as(s"__x$j") }): _*)
      .localCheckpoint()
    val n = m.count()
    require(n > 0, "empty training input")
    val dec = DecimalType(38, grid)
    var b = 0.0
    var w = Array.fill(featureCols.size)(0.0)
    for (_ <- 1 to rounds) {
      val p = softsign(zExpr(b, w, featureCols.indices.map(j => col(s"__x$j"))))
      val diff = p - col("__y")
      val aggs = round(diff, grid).cast(dec).as("g_b") +:
        featureCols.indices.map(j =>
          round(diff * col(s"__x$j"), grid).cast(dec).as(s"g_$j"))
      val row = m.select(aggs: _*)
        .agg(sum("g_b").as("g_b"),
          featureCols.indices.map(j => sum(s"g_$j").as(s"g_$j")): _*)
        .head()
      def upd(cur: Double, i: Int): Double =
        roundGrid(cur - lr * (row.getDecimal(i).doubleValue() / n), grid)
      b = upd(b, 0)
      w = Array.tabulate(w.length)(j => upd(w(j), j + 1))
    }
    LinearModel(b, w, lr, grid)
  }

  /** Reliability-diagram calibration bins for a probabilistic scorer —
    * the model-eval companion to training: per decile bin of the score,
    * the count, mean score and empirical positive rate, and their gap
    * (whose n-weighted sum is ECE). Everything is exact arithmetic:
    * scores arrive rounded (6dp from [[score]]) so the decimal bin sums
    * are order-independent, labels sum as integers, and the two
    * quotients divide exactly the same doubles in any engine.
    *
    * Scale: one hash aggregate keyed on the ≤ `bins` bin ids with
    * map-side partials — a scan, one tiny shuffle, nothing else.
    */
  def calibrationBins(
      scored: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins in [2, 1000] (got $bins)")
    val s = col(scoreCol).cast("double")
    val bin = least(floor(s * lit(bins.toDouble)), lit((bins - 1).toDouble))
      .cast("long")
    val meanScore = sum(s.cast(DecimalType(38, 6))).cast("double") /
      count(lit(1))
    val fracPos = sum(col(labelCol).cast("long")).cast("double") /
      count(lit(1))
    scored.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(meanScore, 6).as("mean_score"),
        round(fracPos, 6).as("frac_pos"),
        round(abs(meanScore - fracPos), 6).as("gap"))
  }

  /** Score every row with a trained model: appends `score` (the softsign
    * probability rounded to `roundTo`) and `pred` (1 when the unrounded
    * probability ≥ 0.5, i.e. z ≥ 0). Scan-side projection — weights ride
    * in as literals, no shuffle, no UDF.
    */
  def score(
      df: DataFrame, featureCols: Seq[String], model: LinearModel,
      roundTo: Int = 6): DataFrame = {
    require(featureCols.size == model.weights.length,
      s"model has ${model.weights.length} weights, got ${featureCols.size} features")
    val p = softsign(zExpr(model.bias, model.weights,
      featureCols.map(c => col(c).cast("double"))))
    df.withColumn("score", round(p, roundTo))
      .withColumn("pred", (p >= lit(0.5)).cast("long"))
  }
}
