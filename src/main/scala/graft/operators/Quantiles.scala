package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Exact distributed quantiles by global rank selection.
  *
  * Spark's built-in exact `percentile` aggregate collects every value of a
  * group into one aggregation buffer — a single task holds a whole group,
  * which is exactly the shape that breaks first at scale (a 100 TB corpus
  * with a handful of event types puts terabytes through one buffer). This
  * operator computes the same linear-interpolation quantiles
  * (`rank = p * (n-1)`; `v_lo + (v_hi - v_lo) * frac`) with the classic
  * distributed-selection plan instead:
  *
  *  1. ONE range shuffle on (group, value) — afterwards partition i holds a
  *     contiguous, sorted slice of each group's value range, so parallelism
  *     is the partition count, never the group count;
  *  2. a per-partition (group, count) pass — the collected state is bounded
  *     by partitions × groups-touching-each-partition (a range partition
  *     touches at most all groups, and the rows are counts, not values);
  *  3. an exclusive prefix sum over those counts gives each partition its
  *     per-group starting global rank (driver-side, tiny) — the same
  *     two-level pattern as `Curation.packSequences`;
  *  4. a second pass over the SAME shuffled data (Spark reuses the shuffle
  *     files; the re-executed work is the narrow count/filter above them)
  *     emits only the rows whose global rank is a needed order statistic —
  *     at most 2 × |ps| rows per group cross back to the driver.
  *
  * The interpolation arithmetic is evaluated in the exact IEEE shape the
  * DuckDB oracle uses (`p*(n-1)` in double, `floor`, `v_lo+(v_hi-v_lo)*frac`),
  * so results hash-match without rounding. Ties in `value` are harmless:
  * ranks among equal values are arbitrary but the value AT a rank is not.
  */
object Quantiles {

  /** Per-group exact quantiles. `ps` maps output column name -> p in [0,1];
    * output is one row per group: (groupCol, ps.map(_._1)*), group rendered
    * as string. Null values are excluded (SQL aggregate semantics); groups
    * with no non-null values don't appear.
    *
    * `gridDecimals` (r18): when set, each emitted quantile is snapped to
    * the k-decimal floor grid `floor(q·10^k + 0.5)/10^k` — the
    * [[graft.functions.GridFunctions.gridRound]] contract, making the
    * READOUT exact-by-construction instead of exact-by-replicated-
    * expression (the interpolation itself is still the identical IEEE
    * chain both engines evaluate; the grid removes the residual class
    * where an oracle rewrite could re-associate it). The operand is
    * finite by construction: an interpolation between two finite data
    * values with frac in [0,1). Default None preserves the raw readout
    * for callers whose oracles replay the raw chain. */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     ps: Seq[(String, Double)],
                     gridDecimals: Option[Int] = None): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"quantile ps must be in [0,1]; got $ps")
    val spark = df.sparkSession
    import spark.implicits._
    // fanOutScan: repartitionByRange SAMPLES its input in a separate job
    // and its map side runs in the input's own partitions — both were
    // profiled serial (2.4 s + 1.1 s single-task) on the one-row-group
    // bench scans; no-op when the input is already parallel
    val sorted = Parallelism.fanOutScan(df
        .select(col(groupCol).cast("string").as("g"),
          col(valueCol).cast("double").as("v"))
        .where(col("v").isNotNull && col("g").isNotNull))
      .repartitionByRange(col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .as[(String, Double)]
      .rdd

    // pass 1: per-partition per-group counts, in partition order (the range
    // partitioner emits key ranges in partition-index order, so a group's
    // slices across partitions are rank-ordered by pid)
    val partCounts: Array[(Int, Array[(String, Long)])] = sorted
      .mapPartitionsWithIndex { (pid, it) =>
        val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (g, _) => counts.update(g, counts.getOrElse(g, 0L) + 1L) }
        Iterator.single(pid -> counts.toArray)
      }
      .collect()
      .sortBy(_._1)

    val totals = scala.collection.mutable.HashMap.empty[String, Long]
    val starts = scala.collection.mutable.HashMap.empty[(Int, String), Long]
    partCounts.foreach { case (pid, counts) =>
      counts.foreach { case (g, c) =>
        starts.update((pid, g), totals.getOrElse(g, 0L))
        totals.update(g, totals.getOrElse(g, 0L) + c)
      }
    }
    if (totals.isEmpty) {
      val schema = StructType(StructField(groupCol, StringType) +:
        ps.map { case (name, _) => StructField(name, DoubleType) })
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }

    // needed order statistics per group: floor and ceil rank for each p
    val needed: Map[String, Array[Long]] = totals.iterator.map { case (g, n) =>
      val ranks = ps.flatMap { case (_, p) =>
        val rank = p * (n - 1).toDouble
        val lo = math.floor(rank).toLong
        Seq(lo, math.min(lo + 1, n - 1))
      }
      g -> ranks.distinct.sorted.toArray
    }.toMap

    val neededB = spark.sparkContext.broadcast(needed)
    val startsB = spark.sparkContext.broadcast(starts.toMap)

    // pass 2: walk the sorted partitions again (shuffle reused), keep only
    // the rows sitting at a needed global rank
    val selected: Map[(String, Long), Double] = sorted
      .mapPartitionsWithIndex { (pid, it) =>
        var curG: String = null
        var idx = 0L
        var start = 0L
        var want: Array[Long] = Array.emptyLongArray
        it.flatMap { case (g, v) =>
          if (g != curG) {
            curG = g
            idx = 0L
            start = startsB.value.getOrElse((pid, g), 0L)
            want = neededB.value.getOrElse(g, Array.emptyLongArray)
          }
          val rank = start + idx
          idx += 1L
          if (java.util.Arrays.binarySearch(want, rank) >= 0) Iterator.single((g, rank, v))
          else Iterator.empty
        }
      }
      .collect()
      .map { case (g, rank, v) => (g, rank) -> v }
      .toMap

    val rows = totals.keys.toSeq.sorted.map { g =>
      val n = totals(g)
      val qs = ps.map { case (_, p) =>
        val rank = p * (n - 1).toDouble
        val lo = math.floor(rank).toLong
        val hi = math.min(lo + 1, n - 1)
        val frac = rank - lo.toDouble
        val vLo = selected((g, lo))
        val vHi = selected((g, hi))
        val raw = vLo + (vHi - vLo) * frac
        // same op sequence as GridFunctions.gridRound / the SQL twin
        // `floor((x) * 10^k + 0.5) / 10^k` — one correctly-rounded IEEE
        // op per step, so identical on any engine
        gridDecimals.fold(raw) { k =>
          val pw = math.pow(10, k)
          math.floor(raw * pw + 0.5) / pw
        }
      }
      Row.fromSeq(g +: qs)
    }
    val schema = StructType(StructField(groupCol, StringType) +:
      ps.map { case (name, _) => StructField(name, DoubleType) })
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Robust per-group outlier detection by median/MAD — the heavy-tail-safe
    * alternative to mean/stddev z-scores (one wild value shifts a mean;
    * the median absolute deviation ignores it). Output per group:
    * (groupCol, n, med, mad, n_outliers, outlier_frac) where a row is an
    * outlier iff |v - med| > k·mad, strict.
    *
    * Determinism: both medians come from [[exactQuantiles]], whose
    * interpolation is the exact IEEE sequence the oracle replays, so `med`
    * and `mad` are BIT-IDENTICAL across engines — |v-med|, k·mad, and the
    * strict compare then evaluate identically everywhere, and the flag
    * can't straddle a float boundary without any rounding.
    *
    * Scale: two range-shuffle quantile passes (value, then absolute
    * deviation — MAD is inherently two-round) + one map-side-partial count
    * aggregation; the med/mad tables are group-count-sized and broadcast.
    * Never a whole group through one percentile buffer. */
  def robustOutlierStats(df: DataFrame, groupCol: String, valueCol: String,
                         k: Double = 3.0,
                         gridDecimals: Option[Int] = None): DataFrame = {
    require(k > 0, s"need k>0; got $k")
    // fanned out HERE so both quantile passes inherit the parallel layout
    // (the second pass's input is base JOIN med — a broadcast join keeps
    // base's partitioning, and a join-shaped plan is past fanOutScan's
    // scan-shape guard inside exactQuantiles)
    val base = Parallelism.fanOutScan(df
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && col("g").isNotNull))
    // gridDecimals grids BOTH medians — med feeds the deviations, so the
    // oracle must replay the gridded med in ad = |v - med| as well as in
    // the emitted column (q96's twin does)
    val med = exactQuantiles(base, "g", "v", Seq("med" -> 0.5), gridDecimals)
    val dev = base.join(broadcast(med), "g")
      .withColumn("ad", abs(col("v") - col("med")))
    val mad = exactQuantiles(dev, "g", "ad", Seq("mad" -> 0.5), gridDecimals)
    dev.join(broadcast(mad), "g")
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("ad") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("g").as(groupCol), col("n"), col("med"), col("mad"),
        col("n_outliers"),
        round(col("n_outliers").cast("double") / col("n"), 6)
          .as("outlier_frac"))
  }

  /** Histogram-sketch quantiles — the BOUNDED-STATE tier below
    * [[exactQuantiles]]: where the exact path range-shuffles every row by
    * value, this pass shuffles only (group, bin, count) rows — at most
    * groups × nBins after map-side combine, whatever the corpus size. The
    * price is resolution: the estimate interpolates uniformly inside the
    * winning equi-width bin, so it sits within one bin width
    * (range / nBins) of the true order statistic v_(ceil(p·n)) — the
    * classic accuracy/state trade, chosen
    * DETERMINISTICALLY (fixed equi-width grid from the group's exact
    * min/max, rank ceil(p·n) lower-bound selection) so a SQL oracle
    * replays it bit-for-bit: no t-digest randomness, no engine-specific
    * sketch.
    *
    * Plan: one map-side-collapsed (min, max, n) aggregate, broadcast back
    * (group-count-sized, same pattern as [[robustOutlierStats]]); one
    * narrow binning pass; one bounded (group, bin) count shuffle; a
    * groups×nBins window cumsum; per-p conditional selection. Two scans of
    * the input, both narrow. */
  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                         ps: Seq[(String, Double)], nBins: Int = 256,
                         gridDecimals: Option[Int] = None): DataFrame = {
    require(nBins >= 1, s"need nBins>=1; got $nBins")
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0.0 && p <= 1.0 },
      s"histogram quantile ps must be in (0,1]; got $ps")
    import org.apache.spark.sql.expressions.Window
    val base = df
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && col("g").isNotNull)
    val stats = base.groupBy("g")
      .agg(min("v").as("mn"), max("v").as("mx"), count(lit(1)).as("n"))
    // constant groups (mx == mn) pin to bin 0 — the ratio would be NaN and
    // the interpolation term multiplies by (mx - mn) = 0 anyway
    val binned = base.join(broadcast(stats), "g")
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("v") - col("mn")) / (col("mx") - col("mn")) * nBins).cast("long"),
            lit(nBins - 1L))))
    val counts = binned.groupBy("g", "bin")
      .agg(count(lit(1)).as("c"),
        max("mn").as("mn"), max("mx").as("mx"), max("n").as("n"))
    val wCum = Window.partitionBy("g").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("cumBefore", col("cum") - col("c"))
    val aggs = ps.map { case (name, p) =>
      val tr = greatest(ceil(lit(p) * col("n")).cast("long"), lit(1L))
      // grid OUTSIDE the max: the floor grid is monotone, so
      // grid(max(x)) == max(grid(x)), and exactly one bin satisfies the
      // rank condition anyway; operand finite (in-bin interpolation of
      // finite bounds)
      val sel = max(when(col("cumBefore") < tr && col("cum") >= tr,
        col("mn") + (col("mx") - col("mn")) / nBins.toDouble *
          (col("bin").cast("double") +
            (tr - col("cumBefore")).cast("double") / col("c").cast("double"))))
      gridDecimals.fold(sel)(k =>
        graft.functions.GridFunctions.gridRound(sel, k)).as(name)
    }
    cum.groupBy("g")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("g").as(groupCol) +: ps.map(p => col(p._1)): _*)
  }

  /** FIXED-grid histogram cells — [[histogramQuantiles]]'s grid declared up
    * front ([lo, hi), out-of-range values clamped into the edge bins)
    * instead of derived from per-group min/max. Fixing the grid removes
    * the two-pass dependence, which makes the aggregation STREAMING-legal:
    * under `readStream` + Update mode this is a running (group, bin) count
    * whose state is bounded at groups × nBins forever, and since cell
    * counts only grow, each cell's last update equals the batch cell under
    * any micro-batch slicing (the q84 count-min argument). */
  def fixedGridCells(df: DataFrame, groupCol: String, valueCol: String,
                     lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(hi > lo, s"need hi > lo; got [$lo, $hi)")
    require(nBins >= 1, s"need nBins>=1; got $nBins")
    df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && col("g").isNotNull)
      .withColumn("bin",
        least(greatest(floor((col("v") - lo) / (hi - lo) * nBins), lit(0.0)),
          lit((nBins - 1).toDouble)).cast("long"))
      .groupBy("g", "bin")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile selection over a fixed-grid cell table (`g`, `bin`, `cnt`) —
    * the read side of [[fixedGridCells]]: cumulative counts per group, the
    * ceil(p·n) lower-bound rank rule, uniform in-bin interpolation on the
    * declared grid. The cell table is groups × nBins rows, so the windows
    * here are over bounded data by construction. */
  def quantilesFromCells(cells: DataFrame, groupCol: String,
                         lo: Double, hi: Double, nBins: Int,
                         ps: Seq[(String, Double)],
                         gridDecimals: Option[Int] = None): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0.0 && p <= 1.0 },
      s"histogram quantile ps must be in (0,1]; got $ps")
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy("g").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("g")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = cells
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(wAll))
      .withColumn("cumBefore", col("cum") - col("cnt"))
    val aggs = ps.map { case (name, p) =>
      val tr = greatest(ceil(lit(p) * col("n")).cast("long"), lit(1L))
      val sel = max(when(col("cumBefore") < tr && col("cum") >= tr,
        lit(lo) + lit(hi - lo) / nBins.toDouble *
          (col("bin").cast("double") +
            (tr - col("cumBefore")).cast("double") / col("cnt").cast("double"))))
      gridDecimals.fold(sel)(k =>
        graft.functions.GridFunctions.gridRound(sel, k)).as(name)
    }
    cum.groupBy("g")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("g").as(groupCol) +: ps.map(p => col(p._1)): _*)
  }

  /** Nearest-rank winsorization census: per group, clip values at the
    * `lo`/`hi` nearest-rank order statistics and report clip counts plus
    * the winsorized sum — the outlier-capping transform run before any
    * moment statistic is trusted.
    *
    * Nearest-rank (value at rank ceil(p*n)) rather than interpolation:
    * the bound is an ELEMENT of the data, exact on the integer grid, and
    * the value at a rank is deterministic even when ties make row order
    * not so. ONE pass: a per-group rank window plus an unbounded window
    * that broadcasts the two bound values to every row — no second
    * derivation of the ranked frame (the multi-subtree trap).
    * Per-group sort parallelizes across groups; for a single monster
    * group use the range-shuffle `exactQuantiles` machinery instead. */
  def winsorizeCensus(df: org.apache.spark.sql.DataFrame, groupCol: String,
                      valueMilli: org.apache.spark.sql.Column,
                      lo: Double, hi: Double): org.apache.spark.sql.DataFrame = {
    require(0.0 < lo && lo < hi && hi <= 1.0, s"need 0 < lo < hi <= 1; got $lo, $hi")
    import org.apache.spark.sql.expressions.Window
    val wRank = Window.partitionBy("g").orderBy("vm")
    val wAll = Window.partitionBy("g")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.select(col(groupCol).as("g"), valueMilli.cast("long").as("vm"))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("lo_t", greatest(ceil(lit(lo) * col("n")).cast("long"), lit(1L)))
      .withColumn("hi_t", greatest(ceil(lit(hi) * col("n")).cast("long"), lit(1L)))
      .withColumn("lo_vm",
        max(when(col("rn") === col("lo_t"), col("vm"))).over(wAll))
      .withColumn("hi_vm",
        max(when(col("rn") === col("hi_t"), col("vm"))).over(wAll))
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        max("lo_vm").as("lo_vm"), max("hi_vm").as("hi_vm"),
        sum(when(col("vm") < col("lo_vm"), 1L).otherwise(0L)).as("n_clipped_lo"),
        sum(when(col("vm") > col("hi_vm"), 1L).otherwise(0L)).as("n_clipped_hi"),
        sum(greatest(least(col("vm"), col("hi_vm")), col("lo_vm")))
          .as("winsorized_sum"))
      .select(col("g").as(groupCol), col("n"), col("lo_vm"), col("hi_vm"),
        col("n_clipped_lo"), col("n_clipped_hi"), col("winsorized_sum"))
      .orderBy(groupCol)
  }
}
