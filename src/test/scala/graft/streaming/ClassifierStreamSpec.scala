package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.TestSpark
import graft.operators.Classifier

/** Stream ≡ batch for model scoring: a batch-trained [[Classifier]]
  * model is a pure scan-side projection (weights ride in as literals),
  * so the SAME score/pred expressions run unchanged over Structured
  * Streaming micro-batches — the online half of the train-offline /
  * score-online quality-gate deployment. Stateless: no watermark, no
  * state store, append mode.
  */
class ClassifierStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming scoring with a batch-trained model equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val train = Seq(
      (1.0, 0.9, 0.8), (1.0, 0.7, 0.9), (1.0, 1.2, 0.3), (1.0, 0.6, 0.7),
      (0.0, 0.1, 0.2), (0.0, 0.3, 0.1), (0.0, 0.2, 0.4), (0.0, 0.4, 0.3))
      .toDF("y", "x1", "x2")
    val model = Classifier.trainSoftsign(
      train, Seq("x1", "x2"), "y", rounds = 40)

    val fresh = Seq(
      (10L, 0.8, 0.9), (11L, 0.2, 0.1), (12L, 0.5, 0.6), (13L, 0.05, 0.3))
    val mem = MemoryStream[(Long, Double, Double)]
    val q = Classifier.score(
        mem.toDF().toDF("id", "x1", "x2"), Seq("x1", "x2"), model)
      .writeStream.format("memory").queryName("scored_stream")
      .outputMode("append").start()
    try {
      mem.addData(fresh.take(2): _*)
      q.processAllAvailable()
      mem.addData(fresh.drop(2): _*) // second micro-batch, same literals
      q.processAllAvailable()
      val streamed = spark.table("scored_stream")
        .select("id", "score", "pred")
        .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
      val batch = Classifier.score(
          fresh.toDF("id", "x1", "x2"), Seq("x1", "x2"), model)
        .select("id", "score", "pred")
        .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
      assert(streamed == batch) // exact ==, scoring is deterministic
      assert(streamed.map(_._1) == fresh.map(_._1).sorted)
      // the separable concept transfers: high-feature rows score high
      val byId = streamed.map(r => r._1 -> r._3).toMap
      assert(byId(10L) == 1L && byId(11L) == 0L && byId(13L) == 0L)
    } finally q.stop()
  }
}
