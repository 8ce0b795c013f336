package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus snapshot management: content-level diff between two versions
  * of a document corpus — the audit step between crawl refreshes
  * (what entered, what left, what silently changed under a stable id).
  */
object Snapshot {

  /** Per-id status between two snapshots, compared by the normalized
    * content fingerprint ([[TextFunctions.fingerprint]]):
    * `added` (new only), `removed` (old only), `changed` (both, fingerprint
    * differs), `unchanged`. One full-outer equi-join on the id — the
    * shuffle moves two 16-byte fingerprint rows per doc, never the text.
    */
  def diff(
      oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val o = oldDocs.select(col(idCol).as("id"),
      TextFunctions.fingerprint(col(textCol)).as("fp_old"))
    val n = newDocs.select(col(idCol).as("id"),
      TextFunctions.fingerprint(col(textCol)).as("fp_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") === col("fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Apply an increment to a corpus snapshot (the merge/upsert step of
    * incremental corpus maintenance): increment rows replace same-id
    * corpus rows, new ids are inserted, and increment rows flagged in
    * `deletedCol` (when given) tombstone the id out of the result.
    * Both inputs must share the corpus schema (plus the optional flag).
    *
    * One full-outer equi-join on the id — at 100 TB the increment side
    * is small, so AQE broadcast-plans it and the corpus is never
    * shuffled; columns are taken side-wise with `coalesce`, so the
    * shuffle (when there is one) carries each column once.
    */
  def applyIncrement(
      corpus: DataFrame, increment: DataFrame,
      idCol: String, deletedCol: Option[String] = None): DataFrame = {
    val dataCols = corpus.columns.filter(_ != idCol).toSeq
    val inc = deletedCol.fold(increment)(d =>
      increment.withColumnRenamed(d, "__del"))
    val c = corpus.select(
      col(idCol).as("__id") +: dataCols.map(n => col(n).as(s"__c_$n")): _*)
    val i = inc.select(
      col(idCol).as("__id") +:
        (dataCols.map(n => col(n).as(s"__i_$n")) :+
          (if (deletedCol.isDefined) col("__del") else lit(false))
            .as("__del")): _*)
    c.join(i, Seq("__id"), "full_outer")
      .filter(coalesce(col("__del"), lit(false)) === false)
      .select(col("__id").as(idCol) +: dataCols.map(n =>
        coalesce(col(s"__i_$n"), col(s"__c_$n")).as(n)): _*)
  }
}
