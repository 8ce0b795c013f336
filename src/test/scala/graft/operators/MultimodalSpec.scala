package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("payload plumbing and batched meta extraction") {
    val docs = Seq((1L, "abc"), (2L, "some longer payload body"), (3L, "x"))
      .toDF("doc_id", "text")
    val withBin = Multimodal.withPayload(docs, "text")
    assert(withBin.schema("payload").dataType.typeName == "binary")
    val meta = Multimodal.extractMeta(spark, withBin, "doc_id").collect()
      .map(m => m.id -> m).toMap
    assert(meta.size == 3)
    assert(meta(1L).n_bytes == 3)
    assert(meta(1L).digest == java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(Set("image", "audio", "video").contains(meta(2L).kind))
    // deterministic across runs
    val again = Multimodal.extractMeta(spark, withBin, "doc_id").collect()
      .map(m => m.id -> m).toMap
    assert(again == meta)
  }
}
