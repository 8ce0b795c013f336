package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Coverage-depth histogram over an interval table — the genomics
  * `genomecov` question ("how many bases are covered at depth d?") the
  * reference's gVCF band/variant intersection logic circles around
  * (reference `gzToParquet`'s band tables are exactly such intervals);
  * the same operator profiles any span data: session overlap, ad
  * delivery, time-range load.
  *
  * Algorithm: the classic event sweep, made distributed.
  * Each interval [start, stop] emits (+1 at start, −1 at stop+1);
  * events collapse per (chrom, pos) into one delta row; the running
  * prefix sum of deltas in (chrom, pos) order IS the depth over the
  * segment [pos, next event pos). The histogram sums segment lengths
  * per depth.
  *
  * The prefix sum is where naive Spark dies at scale: a window
  * `PARTITION BY chrom ORDER BY pos` sorts every chromosome on ONE
  * reducer — human chr1 is a tenth of the genome. Instead this runs
  * the external-sort-rank discipline ([[Sampling.curriculumOrder]],
  * RecordLinkage's sorted run) generalized to prefix SUMS:
  * one `repartitionByRange` on (chrom, pos), per-(partition, chrom)
  * delta subtotals collected once (≤ partitions + chroms rows —
  * model-sized, the offset vector of an external scan), and a
  * per-partition streaming pass that adds the carried offset. Segment
  * ends come from the partition-local next row, or — only for the last
  * row of a partition mid-chromosome — from the next non-empty
  * partition's first position, known on the driver from the same
  * collect. Every step is exact integer arithmetic; output is
  * engine-bit-identical.
  *
  * The sweep invariant makes chrom boundaries safe with no special
  * case: every interval closes inside its chromosome, so the running
  * depth returns to 0 at a chromosome's last event and the (depth > 0)
  * filter drops the unbounded tail segment.
  *
  * Input contract: `startCol <= endCol` per row (violations raise),
  * positions are integers, intervals are CLOSED ([start, stop]).
  * Output: (depth, n_bases), depth >= 1.
  */
object IntervalDepth {

  /** Shared sweep preamble: validated (chrom, s, e) intervals become
    * per-(chrom, pos) delta rows with the close event at
    * `stop + closeShift`, range-partitioned and sorted on (chrom, pos),
    * plus the model-sized driver state a partition-local pass needs:
    * carry-in depth per (pid, chrom) and the first (chrom, pos) of the
    * next non-empty partition.
    */
  private def sweepRuns(
      intervals: DataFrame, chromCol: String, startCol: String,
      endCol: String, closeShift: Long, numPartitions: Int, op: String)
      : (Dataset[(Int, String, Long, Long)],
         Map[(Int, String), Long], Map[Int, (String, Long)]) = {
    val spark = intervals.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val iv = intervals.select(
      // fail loudly on a null chrom — the streaming carry pass keys its
      // per-partition offsets on the chrom value, and its "new chrom"
      // sentinel is null, so a genuine null key would silently skip the
      // carried offset instead of crashing
      when(col(chromCol).isNull,
        raise_error(lit(s"$op: null chrom")))
        .otherwise(col(chromCol).cast("string")).as("chrom"),
      col(startCol).cast("long").as("s"),
      // fail loudly on an inverted interval — a silent drop would
      // undercount depth with no signal
      when(col(endCol).cast("long") < col(startCol).cast("long"),
        raise_error(concat(lit(s"$op: interval with end < "
          + "start at chrom "), col(chromCol).cast("string"))))
        .otherwise(col(endCol).cast("long")).as("e"))
    val ev = iv.select(col("chrom"), col("s").as("pos"), lit(1L).as("d"))
      .unionAll(iv.select(col("chrom"), (col("e") + closeShift).as("pos"),
        lit(-1L).as("d")))
    // one delta row per event position — map-side partials collapse
    // duplicate positions before the exchange
    val agg = ev.groupBy("chrom", "pos").agg(sum("d").as("delta"))
    val run = agg
      .repartitionByRange(parts, col("chrom"), col("pos"))
      .sortWithinPartitions("chrom", "pos")
      .select(spark_partition_id().as("pid"), col("chrom"), col("pos"),
        col("delta"))
      .as[(Int, String, Long, Long)]
      .localCheckpoint()
    // per-(partition, chrom) subtotals and first event per partition:
    // <= partitions + chroms rows — the model-sized driver traffic of
    // an external scan's offset vector. KEY-CARDINALITY CONTRACT: this
    // collect is bounded because the carry key is a CHROMOSOME —
    // genomes have tens of contigs (a few thousand with scaffolds),
    // so partitions × chroms stays offset-vector-sized at any corpus
    // scale. Reusing this sweep for a NON-genomic track key (e.g.
    // per-document or per-user intervals, millions of keys) would make
    // the driver map key-cardinality-sized — don't: re-key such data
    // onto a bounded partition key first, or use the bin-join
    // operators (IntervalJoin) whose state never leaves the executors.
    val partials = run.groupBy("pid", "chrom")
      .agg(sum("delta").as("sd"), min("pos").as("firstPos"))
      .as[(Int, String, Long, Long)].collect().sortBy(r => (r._2, r._1))
    // carry-in per (pid, chrom): sum of the same chrom's deltas in all
    // earlier partitions (range partitioning makes "earlier" = smaller
    // pid)
    val offsets: Map[(Int, String), Long] = {
      val m = scala.collection.mutable.Map.empty[(Int, String), Long]
      partials.groupBy(_._2).foreach { case (chrom, rows) =>
        var acc = 0L
        rows.sortBy(_._1).foreach { case (pid, _, sd, _) =>
          m((pid, chrom)) = acc; acc += sd
        }
      }
      m.toMap
    }
    // first (chrom, pos) of the next non-empty partition after each pid
    val firstOf: Map[Int, (String, Long)] = partials
      .groupBy(_._1)
      .map { case (pid, rows) =>
        val f = rows.minBy(r => (r._2, r._4)); pid -> ((f._2, f._4))
      }
    val nextFirst: Map[Int, (String, Long)] = {
      val pids = firstOf.keys.toArray.sorted
      pids.zipWithIndex.flatMap { case (pid, i) =>
        if (i + 1 < pids.length) Some(pid -> firstOf(pids(i + 1)))
        else None
      }.toMap
    }
    (run, offsets, nextFirst)
  }

  def depthHistogram(
      intervals: DataFrame, chromCol: String, startCol: String,
      endCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = intervals.sparkSession
    import spark.implicits._
    val (run, offsets, nextFirst) = sweepRuns(intervals, chromCol,
      startCol, endCol, closeShift = 1L, numPartitions, "depthHistogram")
    val segs = run.mapPartitions { it =>
      val b = it.buffered
      var curChrom: String = null
      var depth = 0L
      b.flatMap { case (pid, chrom, pos, delta) =>
        if (chrom != curChrom) {
          curChrom = chrom
          depth = offsets.getOrElse((pid, chrom), 0L)
        }
        depth += delta
        val nextPos: Option[Long] =
          if (b.hasNext && b.head._2 == chrom) Some(b.head._3)
          else nextFirst.get(pid) match {
            case Some((c, p)) if c == chrom => Some(p)
            case _ => None
          }
        nextPos match {
          case Some(np) if depth > 0 => Iterator((depth, np - pos))
          case _ => Iterator.empty[(Long, Long)]
        }
      }
    }.toDF("depth", "bases")
    segs.groupBy("depth").agg(sum("bases").as("n_bases"))
  }

  /** Per-chrom coverage summary (the mosdepth report): covered bases,
    * breadth at each depth threshold (bases covered ≥ t×), and mean
    * depth over covered bases — the QC numbers a sequencing pipeline
    * gates on.
    *
    * Same distributed sweep as [[depthHistogram]], with the partition-
    * local pass emitting (chrom, depth, len) segments; one hash
    * aggregate per chrom then folds exact longs — Σlen, Σ(depth·len),
    * per-threshold conditional sums — and the mean lands on the 1e-4
    * lattice via round-half-up INTEGER division (2a+b) div 2b, no
    * float path. Segment rows number O(2·intervals), aggregate state
    * is one row per chrom.
    *
    * Output: (chrom, covered_bases, breadth_ge_<t>…, mean_depth_e4).
    */
  def coverageSummary(
      intervals: DataFrame, chromCol: String, startCol: String,
      endCol: String, thresholds: Seq[Long], numPartitions: Int = 0)
      : DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(_ >= 1),
      s"thresholds must be >= 1 (got $thresholds)")
    val spark = intervals.sparkSession
    import spark.implicits._
    val (run, offsets, nextFirst) = sweepRuns(intervals, chromCol,
      startCol, endCol, closeShift = 1L, numPartitions, "coverageSummary")
    val segs = run.mapPartitions { it =>
      val b = it.buffered
      var curChrom: String = null
      var depth = 0L
      b.flatMap { case (pid, chrom, pos, delta) =>
        if (chrom != curChrom) {
          curChrom = chrom
          depth = offsets.getOrElse((pid, chrom), 0L)
        }
        depth += delta
        val nextPos: Option[Long] =
          if (b.hasNext && b.head._2 == chrom) Some(b.head._3)
          else nextFirst.get(pid) match {
            case Some((c, p)) if c == chrom => Some(p)
            case _ => None
          }
        nextPos match {
          case Some(np) if depth > 0 => Iterator((chrom, depth, np - pos))
          case _ => Iterator.empty[(String, Long, Long)]
        }
      }
    }.toDF("chrom", "depth", "len")
    val aggs =
      Seq(sum(col("len")).as("covered_bases")) ++
      thresholds.map(t =>
        sum(when(col("depth") >= t, col("len")).otherwise(lit(0L)))
          .as(s"breadth_ge_$t")) ++
      Seq(sum(col("depth") * col("len")).as("__ds"))
    segs.groupBy("chrom").agg(aggs.head, aggs.tail: _*)
      .withColumn("mean_depth_e4",
        expr("(2 * __ds * 10000 + covered_bases) div (2 * covered_bases)"))
      .drop("__ds")
  }

  /** Interval coalescing — `bedtools merge`: collapse every chain of
    * overlapping-or-book-ended intervals (and, with `maxGap` > 0,
    * chains whose gaps are ≤ maxGap bases) into one merged interval per
    * chrom. The union-of-spans primitive: callable-region consolidation
    * in genomics, busy-period extraction over session/ad spans.
    *
    * Same distributed sweep as [[depthHistogram]] (close events shifted
    * by 1 + maxGap so a qualifying gap never lets the depth touch 0) —
    * but instead of segment lengths the partition-local pass emits RUN
    * BOUNDARIES: a 0→positive depth transition opens a merged interval
    * at `pos`, a positive→0 transition closes it at `pos − 1 − maxGap`
    * (undoing the shift, so the reported stop is the true max stop).
    * The sweep invariant (depth returns to 0 inside every chrom) means
    * starts and ends strictly alternate per chrom in position order, so
    * the k-th start pairs with the k-th end. That global k is assigned
    * WITHOUT any per-chrom window: boundaries stay range-partitioned
    * and sorted from the sweep, per-(partition, chrom, kind) boundary
    * counts are collected once (model-sized — boundary rows number
    * ≤ merged runs), and a second partition-local pass adds the carried
    * rank offset — the external-sort-rank discipline again. The final
    * (chrom, rank) regroup shuffles merged-run-sized rows only.
    *
    * Input contract as [[depthHistogram]]; closed intervals. Output:
    * (chrom, start, stop), one row per merged interval.
    */
  def coalesce(
      intervals: DataFrame, chromCol: String, startCol: String,
      endCol: String, maxGap: Long = 0L, numPartitions: Int = 0)
      : DataFrame = {
    require(maxGap >= 0, s"maxGap must be >= 0 (got $maxGap)")
    val spark = intervals.sparkSession
    import spark.implicits._
    val (run, offsets, _) = sweepRuns(intervals, chromCol, startCol,
      endCol, closeShift = 1L + maxGap, numPartitions, "coalesce")
    // (pid, chrom, kind, pos): kind true = run start, false = run end.
    // Partition layout and intra-partition order survive mapPartitions,
    // so the rank pass below rides the same partitions — no new shuffle.
    val bounds = run.mapPartitions { it =>
      var curChrom: String = null
      var depth = 0L
      it.flatMap { case (pid, chrom, pos, delta) =>
        if (chrom != curChrom) {
          curChrom = chrom
          depth = offsets.getOrElse((pid, chrom), 0L)
        }
        val prev = depth
        depth += delta
        if (prev == 0L && depth > 0L)
          Iterator((pid, chrom, true, pos))
        else if (prev > 0L && depth == 0L)
          Iterator((pid, chrom, false, pos - 1L - maxGap))
        else Iterator.empty[(Int, String, Boolean, Long)]
      }
    }.localCheckpoint()
    // carried rank offset per (pid, chrom, kind): boundaries in earlier
    // partitions — model-sized (<= partitions × chroms × 2 rows)
    val cnts = bounds.groupBy("_1", "_2", "_3").count()
      .as[(Int, String, Boolean, Long)].collect()
    val rankOff: Map[(Int, String, Boolean), Long] = {
      val m = scala.collection.mutable.Map.empty[(Int, String, Boolean), Long]
      cnts.groupBy(r => (r._2, r._3)).foreach { case ((chrom, kind), rows) =>
        var acc = 0L
        rows.sortBy(_._1).foreach { case (pid, _, _, c) =>
          m((pid, chrom, kind)) = acc; acc += c
        }
      }
      m.toMap
    }
    bounds.mapPartitions { it =>
      val local = scala.collection.mutable.Map.empty[(String, Boolean), Long]
      it.map { case (pid, chrom, kind, pos) =>
        val k = (chrom, kind)
        val r = local.getOrElse(k, rankOff.getOrElse((pid, chrom, kind), 0L))
        local(k) = r + 1
        (chrom, r, kind, pos)
      }
    }.toDF("chrom", "rank", "kind", "pos")
      .groupBy("chrom", "rank")
      .agg(
        max(when(col("kind"), col("pos"))).as("start"),
        max(when(!col("kind"), col("pos"))).as("stop"))
      .select("chrom", "start", "stop")
  }

  /** Fixed-width genome windows with per-window coverage (bedtools
    * makewindows + coverage): tile each chrom `[0, max stop]` into
    * `windowBp`-wide closed windows and report, per window, how many
    * raw intervals overlap it and how many bases are covered by ≥ 1
    * interval — the binned coverage track behind every genome-browser
    * heat row and capture-QC report.
    *
    * Shape: the window index IS the bin key (windows tile disjointly),
    * so each interval explodes to exactly the window indexes it
    * overlaps — `floor(start/W)..floor(stop/W)` — and the equi-join on
    * (chrom, i) is exactly-once by construction: no distinct, no
    * residual overlap predicate, no theta join. covered_bp reads the
    * [[coalesce]]d runs (double-counting overlapping intervals is the
    * bug this avoids), clipped per window with exact closed-interval
    * integer arithmetic. The window table is genome/W rows — broadcast
    * class; per-interval fan-out is span/W + 1 rows (the j2 bin
    * envelope).
    *
    * Input contract as [[depthHistogram]]: closed intervals, inverted
    * rows raise. Output: (chrom, w_start, w_end, n_intervals,
    * covered_bp) — every window emitted, zero-filled.
    */
  def genomeWindows(
      intervals: DataFrame, chromCol: String, startCol: String,
      endCol: String, windowBp: Long): DataFrame = {
    require(windowBp > 0, s"windowBp must be positive (got $windowBp)")
    val base = intervals.select(
        col(chromCol).cast("string").as("chrom"),
        // Genome coordinates are non-negative by contract; a negative
        // start would make the `div` bin indexes below truncate toward
        // zero instead of flooring (mis-binning) and a negative
        // chrom_end would emit a garbage [0, chrom_end] window — raise
        // loudly like the inverted-interval case instead.
        when(col(startCol).cast("long") < 0,
          raise_error(lit("genomeWindows: negative start (genome " +
            "coordinates are non-negative by contract)")))
          .otherwise(col(startCol).cast("long")).as("start"),
        when(col(endCol).cast("long") < col(startCol).cast("long"),
          raise_error(lit("genomeWindows: inverted interval")))
          .otherwise(col(endCol).cast("long")).as("stop"))
      .localCheckpoint() // feeds the extent agg, the raw join, coalesce
    val windows = base.groupBy("chrom").agg(max("stop").as("chrom_end"))
      .select(col("chrom"), col("chrom_end"),
        explode(Guards.boundedSequence(lit(0L),
          expr(s"chrom_end div ${windowBp}L"),
          Guards.MaxWindowsPerChrom, "genomeWindows tiling")).as("i"))
      .select(col("chrom"), col("i"),
        (col("i") * windowBp).as("w_start"),
        least(col("i") * windowBp + (windowBp - 1), col("chrom_end"))
          .as("w_end"))
      .localCheckpoint() // joined by both measure legs + the final fill
    def toBins(df: DataFrame): DataFrame =
      df.withColumn("i", explode(Guards.boundedSequence(
        expr(s"start div ${windowBp}L"), expr(s"stop div ${windowBp}L"),
        Guards.MaxBinsPerRow, "genomeWindows binning")))
    val nIv = toBins(base)
      .groupBy("chrom", "i").agg(count(lit(1)).as("n_intervals"))
    val runs = coalesce(base, "chrom", "start", "stop")
    val cov = toBins(runs).join(windows, Seq("chrom", "i"))
      .groupBy("chrom", "i")
      .agg(sum(least(col("w_end"), col("stop")) -
        greatest(col("w_start"), col("start")) + 1).as("covered_bp"))
    windows
      .join(nIv, Seq("chrom", "i"), "left")
      .join(cov, Seq("chrom", "i"), "left")
      .select(col("chrom"), col("w_start"), col("w_end"),
        // functions.coalesce spelled out: the object's own
        // coalesce(DataFrame, ...) shadows the import here
        org.apache.spark.sql.functions.coalesce(
          col("n_intervals"), lit(0L)).as("n_intervals"),
        org.apache.spark.sql.functions.coalesce(
          col("covered_bp"), lit(0L)).as("covered_bp"))
  }

  /** Two-track covered/intersection base counts in ONE sweep — the
    * [[IntervalJoin.intervalJaccard]] engine. Both interval sets' events
    * ride one (chrom, pos) range exchange as tagged deltas (da, db);
    * the partition-local pass tracks both running depths and sums, per
    * segment [pos, next pos): its length into a_bp when depth_a > 0,
    * into b_bp when depth_b > 0, into inter_bp when both — exactly the
    * per-position counts the old shape derived from TWO [[coalesce]]
    * sweeps plus a merged-run bin join (a covered position is a
    * position with positive depth; disjoint merged runs count it once;
    * the clipped-overlap sum counts it once in the intersection). All
    * integer sums — engine-bit-identical. Same input contract and
    * model-sized driver state as [[depthHistogram]].
    *
    * Output: one row (a_bp, b_bp, inter_bp), zeros when empty.
    */
  private[operators] def twoTrackCoveredBp(
      a: DataFrame, aChrom: String, aStartCol: String, aEndCol: String,
      b: DataFrame, bChrom: String, bStartCol: String, bEndCol: String,
      numPartitions: Int, op: String): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    def iv(df: DataFrame, chromCol: String, startCol: String,
        endCol: String): DataFrame = df.select(
      when(col(chromCol).isNull,
        raise_error(lit(s"$op: null chrom")))
        .otherwise(col(chromCol).cast("string")).as("chrom"),
      col(startCol).cast("long").as("s"),
      when(col(endCol).cast("long") < col(startCol).cast("long"),
        raise_error(concat(lit(s"$op: interval with end < "
          + "start at chrom "), col(chromCol).cast("string"))))
        .otherwise(col(endCol).cast("long")).as("e"))
    def ev(df: DataFrame, tagA: Boolean): DataFrame = {
      val (da, db) = if (tagA) (lit(1L), lit(0L)) else (lit(0L), lit(1L))
      df.select(col("chrom"), col("s").as("pos"), da.as("da"), db.as("db"))
        .unionAll(df.select(col("chrom"), (col("e") + 1L).as("pos"),
          (-da).as("da"), (-db).as("db")))
    }
    val agg = ev(iv(a, aChrom, aStartCol, aEndCol), tagA = true)
      .unionAll(ev(iv(b, bChrom, bStartCol, bEndCol), tagA = false))
      .groupBy("chrom", "pos")
      .agg(sum("da").as("da"), sum("db").as("db"))
    val run = agg
      .repartitionByRange(parts, col("chrom"), col("pos"))
      .sortWithinPartitions("chrom", "pos")
      .select(spark_partition_id().as("pid"), col("chrom"), col("pos"),
        col("da"), col("db"))
      .as[(Int, String, Long, Long, Long)]
      .localCheckpoint()
    // same KEY-CARDINALITY CONTRACT as sweepRuns: carry keys are
    // chromosomes, so the collect is offset-vector-sized at any scale
    val partials = run.groupBy("pid", "chrom")
      .agg(sum("da").as("sa"), sum("db").as("sb"), min("pos").as("firstPos"))
      .as[(Int, String, Long, Long, Long)].collect().sortBy(r => (r._2, r._1))
    val offsets: Map[(Int, String), (Long, Long)] = {
      val m = scala.collection.mutable.Map.empty[(Int, String), (Long, Long)]
      partials.groupBy(_._2).foreach { case (chrom, rows) =>
        var accA = 0L; var accB = 0L
        rows.sortBy(_._1).foreach { case (pid, _, sa, sb, _) =>
          m((pid, chrom)) = (accA, accB); accA += sa; accB += sb
        }
      }
      m.toMap
    }
    val firstOf: Map[Int, (String, Long)] = partials
      .groupBy(_._1)
      .map { case (pid, rows) =>
        val f = rows.minBy(r => (r._2, r._5)); pid -> ((f._2, f._5))
      }
    val nextFirst: Map[Int, (String, Long)] = {
      val pids = firstOf.keys.toArray.sorted
      pids.zipWithIndex.flatMap { case (pid, i) =>
        if (i + 1 < pids.length) Some(pid -> firstOf(pids(i + 1)))
        else None
      }.toMap
    }
    val segs = run.mapPartitions { it =>
      val buf = it.buffered
      var curChrom: String = null
      var depthA = 0L
      var depthB = 0L
      buf.flatMap { case (pid, chrom, pos, da, db) =>
        if (chrom != curChrom) {
          curChrom = chrom
          val (oa, ob) = offsets.getOrElse((pid, chrom), (0L, 0L))
          depthA = oa; depthB = ob
        }
        depthA += da
        depthB += db
        val nextPos: Option[Long] =
          if (buf.hasNext && buf.head._2 == chrom) Some(buf.head._3)
          else nextFirst.get(pid) match {
            case Some((c, p)) if c == chrom => Some(p)
            case _ => None
          }
        nextPos match {
          case Some(np) if depthA > 0 || depthB > 0 =>
            val len = np - pos
            Iterator((
              if (depthA > 0) len else 0L,
              if (depthB > 0) len else 0L,
              if (depthA > 0 && depthB > 0) len else 0L))
          case _ => Iterator.empty[(Long, Long, Long)]
        }
      }
    }.toDF("la", "lb", "li")
    segs.agg(
      coalesce2(sum("la")).as("a_bp"),
      coalesce2(sum("lb")).as("b_bp"),
      coalesce2(sum("li")).as("inter_bp"))
  }

  // functions.coalesce with a zero default, named to dodge this
  // object's own `coalesce` (the merge operator) shadowing it
  private def coalesce2(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.coalesce(c, lit(0L))

  /** Uncovered-region complement (bedtools complement): the regions of
    * each genome chrom `[1, size]` NOT covered by any interval —
    * capture-kit gap reporting, the inverse of [[coalesce]].
    *
    * Shape: intervals first collapse through [[coalesce]]'s
    * distributed sweep (the corpus-scale step — raw intervals never
    * reach a window), merged runs clip to the genome bounds, and a
    * zero-width SENTINEL at `size + 1` per chrom turns gap derivation
    * into one `lag` over the merged runs — the sentinel's gap is the
    * tail `[last_stop+1, size]`, and on an interval-less chrom the
    * sentinel alone yields the whole span `[1, size]`. The per-chrom
    * window runs over MERGED-RUN rows (orders smaller than the input;
    * the j12 envelope), and the genome table is dim-sized — broadcast.
    *
    * Input contract as [[depthHistogram]]; closed intervals, genome
    * spans `[1, size]`. Intervals outside their chrom's bounds clip;
    * intervals on chroms absent from `genome` drop (no defined span to
    * complement). Output: (chrom, start, stop).
    */
  def complement(
      intervals: DataFrame, chromCol: String, startCol: String,
      endCol: String, genome: DataFrame, gChromCol: String,
      gSizeCol: String): DataFrame = {
    val g = genome.select(col(gChromCol).cast("string").as("chrom"),
      col(gSizeCol).cast("long").as("gsize"))
    val clipped = coalesce(intervals, chromCol, startCol, endCol)
      .join(broadcast(g), Seq("chrom"))
      .select(col("chrom"),
        greatest(col("start"), lit(1L)).as("start"),
        least(col("stop"), col("gsize")).as("stop"))
      .filter(col("start") <= col("stop"))
    val withSentinel = clipped.unionByName(
      g.select(col("chrom"), (col("gsize") + 1).as("start"),
        (col("gsize") + 1).as("stop")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("chrom").orderBy("start")
    withSentinel
      .withColumn("prevstop", lag("stop", 1).over(w))
      // functions.coalesce spelled out: this object's `coalesce`
      // (the merge operator) shadows the SQL function here
      .select(col("chrom"),
        (org.apache.spark.sql.functions.coalesce(
          col("prevstop"), lit(0L)) + 1).as("start"),
        (col("start") - 1).as("stop"))
      .filter(col("start") <= col("stop"))
  }
}
