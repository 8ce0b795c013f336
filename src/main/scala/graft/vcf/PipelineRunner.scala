package graft.vcf

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Config-driven stage dispatch (reference §3.1 `GenomicsLoader.main`:
  * HOCON `pipeline` step list, each stage read-parquet -> transform ->
  * write-parquet with the filesystem as the IR between stages).
  *
  * Differences from the reference, by design: no per-chromosome/band
  * driver loops (partition pruning + `partitionBy` cover it), no manual
  * path construction, stages declare their own inputs.
  */
object PipelineRunner {

  case class Config(
      root: String,
      gvcfPaths: Seq[String] = Nil,
      chrom: Int = 1,
      binWidth: Double = 1e6,
      stages: Seq[String] = Seq("parse", "group", "effects", "variants", "publish"))

  private def path(c: Config, table: String) = s"${c.root}/$table"

  /** Run the configured stages in order. Each stage is independently
    * restartable — state lives only in the stage tables.
    */
  def run(spark: SparkSession, c: Config): Unit = {
    if (c.stages.contains("parse")) {
      val parsed = VcfPipeline.qualityGate(
        VcfPipeline.ingest(spark, c.gvcfPaths, c.chrom))
      VcfPipeline.writePartitioned(parsed.toDF(), path(c, "parsedSamples"))
    }
    def parsed: DataFrame = spark.read.parquet(path(c, "parsedSamples"))

    if (c.stages.contains("group"))
      VcfPipeline.sampleGroups(parsed, c.binWidth)
        .write.mode("overwrite").parquet(path(c, "samples"))
    if (c.stages.contains("effects"))
      VcfPipeline.effectGroups(parsed)
        .write.mode("overwrite").parquet(path(c, "effects"))
    if (c.stages.contains("variants")) {
      val samples = spark.read.parquet(path(c, "samples"))
      val effects = spark.read.parquet(path(c, "effects"))
      effects.join(samples, Seq("chrom", "pos", "ref", "alt"), "left")
        .withColumn("freq", VcfPipeline.freqColumn(org.apache.spark.sql.functions.col("samples")))
        .write.mode("overwrite").parquet(path(c, "variants"))
    }
    if (c.stages.contains("publish"))
      DocumentSink.writeJson(
        spark.read.parquet(path(c, "variants")), path(c, "documents"))
  }
}
