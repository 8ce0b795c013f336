package graft.vcf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Search-index publication (reference S7/S8: Elasticsearch bulk sink with
  * a nested mapping, `GenomicsLoader.scala:208-213`, `Elastic/Data.scala`).
  *
  * Connector-free parity target: the same nested per-variant documents are
  * written as partitioned JSON lines — byte-for-byte what an ES bulk
  * client would index. A real connector slots in via
  * `df.write.format(...)` without touching the document shape.
  */
object DocumentSink {

  /** Shape the final variant table into the nested search document
    * (arrays of per-sample maps, effect structs, prediction/population
    * structs, cohort frequency).
    */
  def toDocuments(variants: DataFrame): DataFrame =
    variants.select(
      col("chrom"), col("pos"), col("ref"), col("alt"),
      col("freq"), col("effects"), col("predictions"), col("populations"),
      col("samples"))

  /** Write JSON-lines documents partitioned by chromosome. */
  def writeJson(variants: DataFrame, dest: String): Unit =
    toDocuments(variants)
      .write.mode("overwrite").partitionBy("chrom").json(dest)

  /** ES `_bulk` protocol body: one action line + one source line per
    * document (reference bulk indexing, `GenomicsLoader.scala:208-213`).
    * `_id` is the variant's natural key `chrom_pos_ref_alt`, so re-runs
    * upsert instead of duplicating. Emitted as a one-column DataFrame of
    * "action\nsource" strings — written with `.text()` the file IS a
    * valid `_bulk` request body, byte-for-byte what the HTTP client posts.
    */
  def bulkLines(variants: DataFrame, index: String): DataFrame = {
    val docs = toDocuments(variants)
    docs.select(
      concat(
        lit("""{"index":{"_index":""""), lit(index), lit("""","_id":""""),
        concat_ws("_", col("chrom"), col("pos"), col("ref"), col("alt")),
        lit("\"}}\n"),
        to_json(struct(docs.columns.map(col): _*))
      ).as("value"))
  }

  /** Write the `_bulk` body as text files (NDJSON action/source pairs). */
  def writeBulk(variants: DataFrame, dest: String, index: String = "variants"): Unit =
    bulkLines(variants, index).write.mode("overwrite").text(dest)

  /** POST the `_bulk` body to a live cluster, `batchSize` documents per
    * request, one HTTP client per partition — opt-in via `esUrl` (there is
    * deliberately no default: the engine never assumes a cluster exists).
    * Executor-side and shuffle-free: each partition streams its own rows.
    */
  def postBulk(
      variants: DataFrame, esUrl: String,
      index: String = "variants", batchSize: Int = 500): Unit = {
    val lines = bulkLines(variants, index)
    lines.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      // Bounded timeouts: a hung endpoint must fail the task (so Spark
      // retries it) rather than block the executor — and any streaming
      // micro-batch behind it — indefinitely.
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(10)).build()
      val uri = java.net.URI.create(s"$esUrl/_bulk")
      val buf = new StringBuilder
      var n = 0
      def flush(): Unit = if (n > 0) {
        val req = java.net.http.HttpRequest.newBuilder(uri)
          .header("Content-Type", "application/x-ndjson")
          .timeout(java.time.Duration.ofSeconds(60))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(buf.toString))
          .build()
        val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() / 100 == 2, s"bulk indexing failed: ${resp.statusCode()}")
        // ES returns 200 with per-item failures flagged in the body
        // ("errors":true) — e.g. 429 rejections under write backpressure.
        // Silently accepting them would lose documents while the stream
        // checkpoint commits; fail the task so Spark retries the partition.
        require(!resp.body().contains("\"errors\":true"),
          s"bulk response reported item failures: ${resp.body().take(500)}")
        buf.clear(); n = 0
      }
      while (rows.hasNext) {
        buf.append(rows.next().getString(0)).append('\n')
        n += 1
        if (n >= batchSize) flush()
      }
      flush()
    }
  }

  /** Index lifecycle over REST (reference S8 index DDL): PUT the mapping
    * to create, DELETE to drop. Driver-side single calls, opt-in via an
    * explicit URL — returns the HTTP status so callers decide policy
    * (e.g. 400 resource_already_exists on re-create).
    */
  def putIndex(
      esUrl: String, index: String,
      shards: Int = 8, replicas: Int = 0): Int = {
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(s"$esUrl/$index"))
      .header("Content-Type", "application/json")
      .timeout(java.time.Duration.ofSeconds(30))
      .PUT(java.net.http.HttpRequest.BodyPublishers.ofString(
        indexMapping(shards, replicas)))
      .build()
    httpClient.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      .statusCode()
  }

  private def httpClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()

  /** Drop the index (reference `action = delete` path). */
  def deleteIndex(esUrl: String, index: String): Int = {
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(s"$esUrl/$index"))
      .timeout(java.time.Duration.ofSeconds(30))
      .DELETE().build()
    httpClient.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      .statusCode()
  }

  /** The nested index mapping for the document shape (reference S8,
    * `Elastic/Data.scala:34-93`, 8 shards / 0 replicas) — emitted as a
    * JSON document; shipping it to a cluster is an ops concern outside
    * the engine.
    */
  def indexMapping(shards: Int = 8, replicas: Int = 0): String =
    s"""{
       |  "settings": {"number_of_shards": $shards, "number_of_replicas": $replicas,
       |    "refresh_interval": "1000ms"},
       |  "mappings": {"properties": {
       |    "chrom": {"type": "integer"}, "pos": {"type": "integer"},
       |    "ref": {"type": "keyword"}, "alt": {"type": "keyword"},
       |    "freq": {"type": "float"},
       |    "samples": {"type": "nested"},
       |    "effects": {"type": "nested"},
       |    "predictions": {"type": "object"},
       |    "populations": {"type": "object"}
       |  }}
       |}""".stripMargin
}
