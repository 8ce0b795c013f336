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
    // presence is tracked by explicit flags, never by fingerprint
    // nullness: fingerprint(null text) is null, so an id present in
    // BOTH snapshots with a null text on either side would masquerade
    // as added/removed — the audit this op exists for would be wrong
    // for every null-text row. <=> (null-safe equality) then classifies
    // null-vs-null text as unchanged and null-vs-text as changed.
    val o = oldDocs.select(col(idCol).as("id"),
      TextFunctions.fingerprint(col(textCol)).as("fp_old"),
      lit(true).as("__in_old"))
    val n = newDocs.select(col(idCol).as("id"),
      TextFunctions.fingerprint(col(textCol)).as("fp_new"),
      lit(true).as("__in_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("fp_old") <=> col("fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Apply an increment to a corpus snapshot (the merge/upsert step of
    * incremental corpus maintenance): increment rows replace same-id
    * corpus rows (null increment values inherit the corpus value), new
    * ids are inserted, and increment rows flagged in `deletedCol` (when
    * given) tombstone the id out of the result. Both inputs must share
    * the corpus schema (plus the optional flag).
    *
    * NOT one full-outer join: Spark cannot broadcast a full-outer hash
    * join, so that shape would shuffle AND sort the entire corpus per
    * increment. Instead: (a) corpus LEFT-joins the broadcast increment —
    * map-side, one corpus scan, no corpus shuffle — handling updates,
    * deletes and untouched rows; (b) inserts are the increment minus the
    * matched-id set, where the matched ids come from a column-pruned
    * id-only corpus scan semi-joined against the (small) increment —
    * again map-side. At 100 TB the corpus is scanned, never shuffled;
    * both joins broadcast increment-sized tables only.
    */
  def applyIncrement(
      corpus: DataFrame, increment: DataFrame,
      idCol: String, deletedCol: Option[String] = None): DataFrame = {
    val dataCols = corpus.columns.filter(_ != idCol).toSeq
    val inc = deletedCol.fold(increment)(d =>
      increment.withColumnRenamed(d, "__del"))
    val i = inc.select(
      col(idCol).as("__id") +:
        (dataCols.map(n => col(n).as(s"__i_$n")) :+
          (if (deletedCol.isDefined) col("__del") else lit(false))
            .as("__del")): _*)
    val fromCorpus = corpus
      .join(broadcast(i), col(idCol) === col("__id"), "left")
      .filter(coalesce(col("__del"), lit(false)) === false)
      .select(col(idCol) +: dataCols.map(n =>
        coalesce(col(s"__i_$n"), col(n)).as(n)): _*)
    val matchedIds = corpus.select(col(idCol).as("__mid"))
      .join(broadcast(i.select("__id")), col("__mid") === col("__id"), "left_semi")
    val inserts = i
      .join(broadcast(matchedIds), col("__id") === col("__mid"), "left_anti")
      .filter(coalesce(col("__del"), lit(false)) === false)
      .select(col("__id").as(idCol) +:
        dataCols.map(n => col(s"__i_$n").as(n)): _*)
    fromCorpus.unionByName(inserts)
  }

  /** Schema + null-integrity drift between two snapshot VERSIONS — the
    * metadata-level companion of [[diff]] (content rows) and the PSI
    * drift report (one column's distribution): which columns appeared,
    * vanished or changed type, and how each shared column's null rate
    * moved. The check a consumer runs before pointing a pipeline at
    * dataset v2.
    *
    * The schema comparison is DRIVER-side by design (a schema is
    * model-sized — the same justification as the k-means centroid
    * collects); the null counts are ONE map-side-combined aggregate
    * per snapshot regardless of column count. Rates ride the 1e-6
    * lattice via round-half-up integer division; an empty snapshot has
    * no defined rate (NULL). `null_drift_e6` = rate_b − rate_a for
    * kept same-type columns (negative = fewer nulls), NULL otherwise.
    *
    * Output: one row per column in either schema — (column, status
    * 'added'|'removed'|'type_changed'|'kept', dtype_a, dtype_b,
    * null_rate_a_e6, null_rate_b_e6, null_drift_e6). dtype strings are
    * Spark catalogString ('bigint', 'string', …).
    */
  def schemaDrift(a: DataFrame, b: DataFrame): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    def stats(df: DataFrame): (Long, Map[String, Long]) = {
      val cols = df.schema.fields.map(_.name)
      if (cols.isEmpty) return (df.count(), Map.empty)
      val aggCols = count(lit(1)).as("__n") +:
        cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L))
          .as(s"__nn_$c"))
      val r = df.agg(aggCols.head, aggCols.tail: _*).collect().head
      (r.getAs[Long]("__n"),
        cols.map(c => c -> r.getAs[Long](s"__nn_$c")).toMap)
    }
    val ta = a.schema.fields.map(f => f.name -> f.dataType.catalogString).toMap
    val tb = b.schema.fields.map(f => f.name -> f.dataType.catalogString).toMap
    val (na, nullsA) = stats(a)
    val (nb, nullsB) = stats(b)
    def rate(nulls: Option[Long], n: Long): Option[Long] =
      nulls.flatMap(x =>
        if (n > 0) Some((2 * x * 1000000L + n) / (2 * n)) else None)
    val rows = (ta.keySet ++ tb.keySet).toSeq.sorted.map { c =>
      val (inA, inB) = (ta.contains(c), tb.contains(c))
      val status =
        if (inA && !inB) "removed"
        else if (!inA && inB) "added"
        else if (ta(c) != tb(c)) "type_changed"
        else "kept"
      val ra = rate(nullsA.get(c), na)
      val rb = rate(nullsB.get(c), nb)
      val drift = if (status == "kept") for (x <- ra; y <- rb) yield y - x
        else None
      (c, status, ta.get(c), tb.get(c), ra, rb, drift)
    }
    rows.toDF("column", "status", "dtype_a", "dtype_b",
      "null_rate_a_e6", "null_rate_b_e6", "null_drift_e6")
  }

  /** Snapshot retention policy (the lakehouse GC decision next to
    * [[diff]]/[[applyIncrement]]): keep the newest `keepLast` snapshots
    * unconditionally, plus the LAST snapshot of each UTC day for the
    * most recent `keepDays` days (relative to the newest snapshot's
    * day), expire the rest — the standard keep-recent + daily-thinning
    * schedule every table-format VACUUM implements.
    *
    * Deterministic end-to-end: days are exact sign-correct floor
    * divisions of the nanosecond timestamp; "last of day" is a
    * struct-max argmax on (ts, id) so a same-timestamp tie breaks on
    * the id, never on partition order; duplicate snapshot ids fail
    * loudly (two registries merged badly — corrupt input, not a
    * tie to break silently). Reason precedence: 'last_n' over 'daily'
    * over 'expire'.
    *
    * Scale: the snapshot REGISTRY is the input — metadata-sized by
    * definition (thousands of rows for years of hourly snapshots), so
    * the two global windows here run over registry rows, never corpus
    * rows (the j12 envelope argument does not even arise).
    *
    * Output: (snapshot_id, ts, day, rank_desc, verdict ∈ keep|expire,
    * reason ∈ last_n|daily|expire).
    */
  def retention(
      snapshots: DataFrame, idCol: String, tsCol: String,
      keepLast: Int = 5, keepDays: Int = 7): DataFrame = {
    require(keepLast >= 0, s"keepLast must be >= 0 (got $keepLast)")
    require(keepDays >= 0, s"keepDays must be >= 0 (got $keepDays)")
    import org.apache.spark.sql.expressions.Window
    val dayNs = 86400L * 1000 * 1000 * 1000
    val base = snapshots.select(
        when(col(idCol).isNull,
          raise_error(lit("retention: null snapshot id")))
          .otherwise(col(idCol).cast("long")).as("snapshot_id"),
        when(col(tsCol).isNull,
          raise_error(lit("retention: null snapshot ts")))
          .otherwise(col(tsCol).cast("long")).as("ts"))
      .withColumn("day",
        expr(s"(ts - pmod(ts, ${dayNs}L)) div ${dayNs}L"))
    val dup = base.groupBy("snapshot_id").count()
      .filter(col("count") > 1).limit(1).count()
    require(dup == 0, "retention: duplicate snapshot ids")
    val byRecency = Window.orderBy(col("ts").desc, col("snapshot_id").desc)
    val ranked = base
      .withColumn("rank_desc", row_number().over(byRecency).cast("long"))
    val lastOfDay = base.groupBy("day")
      .agg(max(struct(col("ts"), col("snapshot_id"))).as("mx"))
      .select(col("day"), col("mx.snapshot_id").as("__keep_id"))
    val newestDay = base.agg(max("day").as("d1"))
    ranked
      .join(lastOfDay, Seq("day"), "left")
      .crossJoin(broadcast(newestDay))
      .select(col("snapshot_id"), col("ts"), col("day"), col("rank_desc"),
        when(col("rank_desc") <= keepLast, lit("last_n"))
          .when(col("snapshot_id") === col("__keep_id") &&
            col("day") > col("d1") - keepDays, lit("daily"))
          .otherwise(lit("expire")).as("reason"))
      .withColumn("verdict",
        when(col("reason") === "expire", lit("expire"))
          .otherwise(lit("keep")))
      .select("snapshot_id", "ts", "day", "rank_desc", "verdict", "reason")
  }
}
