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
