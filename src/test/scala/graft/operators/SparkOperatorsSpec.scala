package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{Frames, Synthetic}
import graft.dsp.Signal

/** Spark-layer ports of the reference's pipeline/equivalence tests
  * (tests/test_pipeline.py, tests/test_utils.py) plus SQL-vs-Scala parity
  * for the CAR aggregate. */
class SparkOperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("operators-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    // harness events.parquet carries TIMESTAMP(NANOS); read as long nanos
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private def collectTraces(df: DataFrame): Map[(Int, Option[Int]), Array[Double]] =
    df.select(col("channel"), col("band"), col("values")).collect().map { r =>
      val band = if (r.isNullAt(1)) None else Some(r.getInt(1))
      (r.getInt(0), band) -> r.getSeq[Double](2).toArray
    }.toMap

  // --- tests/test_utils.py:6-23 --------------------------------------------
  test("synthetic generator: shape and flag/seed sensitivity") {
    val base = Synthetic.segments(spark, 2.0, 4, 400.0)
    val traces = collectTraces(base)
    assert(traces.size == 4)
    assert(traces.values.forall(_.length == 800))
    def first(df: DataFrame) = collectTraces(df)((0, None))
    val noHg = first(Synthetic.segments(spark, 2.0, 4, 400.0, highGamma = false))
    val noLn = first(Synthetic.segments(spark, 2.0, 4, 400.0, linenoise = false))
    val seed1 = first(Synthetic.segments(spark, 2.0, 4, 400.0, seed = 1))
    val ref = traces((0, None))
    assert(!(noHg sameElements ref), "high_gamma flag has no effect")
    assert(!(noLn sameElements ref), "linenoise flag has no effect")
    assert(!(seed1 sameElements ref), "seed has no effect")
    // deterministic: same args -> same data
    val again = first(Synthetic.segments(spark, 2.0, 4, 400.0))
    assert(again sameElements ref, "generator is not deterministic")
  }

  // --- SQL trimmed mean == Scala oracle ------------------------------------
  test("SQL CAR trimmed mean matches Signal.trimmedMean exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val nCh = 100
    val rows = for (t <- 0 until 20; ch <- 0 until nCh)
      yield ("s", t.toLong, ch, rnd.nextDouble() * 200 - 100)
    val long = rows.toDF("series", "t_idx", "channel", "value")
    val got = CommonReferencing.car(long, nCh, 0.95)
      .orderBy("t_idx").collect().map(_.getDouble(2))
    val byT = rows.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (_, rs) => Signal.trimmedMean(rs.map(_._4).toArray, 0.95) }
    got.zip(byT).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    // ramp fixture: 3 time points x 100 channels, CAR = 49.5 with outliers
    val ramp = (for (t <- 0 until 3; ch <- 0 until 100) yield {
      val v = if (ch == 0) -100.0 else if (ch == 99) 111.0 else ch.toDouble
      ("r", t.toLong, ch, v)
    }).toDF("series", "t_idx", "channel", "value")
    val cars = CommonReferencing.car(ramp, 100, 0.95).collect().map(_.getDouble(2))
    assert(cars.forall(_ == 49.5))
  }

  test("long-form CAR null/NaN semantics match np.nanmean (sort-last, trim, skip)") {
    import spark.implicits._
    // common_referencing.py:34-41: sort puts NaN last, trim 1 from each end,
    // nanmean skips any NaN still inside the kept window
    val oneNull = Seq[(String, Long, Int, java.lang.Double)](
      ("s", 0L, 0, 10.0), ("s", 0L, 1, 2.0), ("s", 0L, 2, 5.0), ("s", 0L, 3, null),
      ("s", 0L, 4, 7.0), ("s", 0L, 5, 1.0), ("s", 0L, 6, 9.0), ("s", 0L, 7, 4.0))
      .toDF("series", "t_idx", "channel", "value")
    // sorted [1,2,4,5,7,9,10,NaN] -> kept [2,4,5,7,9,10] -> 37/6
    assert(CommonReferencing.car(oneNull, 8, 0.95).head().getDouble(2) == 37.0 / 6)
    val twoNull = Seq[(String, Long, Int, java.lang.Double)](
      ("s", 0L, 0, 10.0), ("s", 0L, 1, 2.0), ("s", 0L, 2, null), ("s", 0L, 3, null),
      ("s", 0L, 4, 7.0), ("s", 0L, 5, 1.0), ("s", 0L, 6, 9.0), ("s", 0L, 7, 4.0))
      .toDF("series", "t_idx", "channel", "value")
    // sorted [1,2,4,7,9,10,NaN,NaN] -> kept [2,4,7,9,10,NaN] -> nanmean 32/5
    assert(CommonReferencing.car(twoNull, 8, 0.95).head().getDouble(2) == 32.0 / 5)
    // meanFrac=1.0 degenerates to nanmean over all channels
    assert(CommonReferencing.car(oneNull, 8, 1.0).head().getDouble(2) == 38.0 / 7)
  }

  test("native TypedImperativeAggregate trimmed mean == pure-SQL form, nulls included") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val nCh = 16
    val rows = (for (t <- 0 until 50; ch <- 0 until nCh) yield {
      val v: java.lang.Double =
        if ((t * nCh + ch) % 13 == 0) null else rnd.nextDouble() * 50 - 25
      ("s", t.toLong, ch, v)
    }).filter { case (_, t, ch, _) =>
      // ragged groups: whole channel rows ABSENT (not null) for some t —
      // the SQL slice keeps [nExclude, nExclude+nKeep) of however many rows
      // exist; the native form must window identically, not trim both ends
      !(t % 7 == 0 && ch >= nCh - 1 - (t % 3).toInt)
    }
    val long = rows.toDF("series", "t_idx", "channel", "value")
    for (mf <- Seq(0.95, 0.8, 1.0)) {
      val sql = long.groupBy("series", "t_idx")
        .agg(CommonReferencing.trimmedMeanAgg(nCh, mf).as("car"))
        .orderBy("t_idx").collect().map(_.getDouble(2))
      val native = long.groupBy("series", "t_idx")
        .agg(CommonReferencing.trimmedMeanAggNative(spark, nCh, mf).as("car"))
        .orderBy("t_idx").collect().map(_.getDouble(2))
      sql.zip(native).zipWithIndex.foreach { case ((a, b), i) =>
        if (mf < 1.0)
          // both forms sum the kept middle in sorted order -> bit-equal
          assert(a == b || (a.isNaN && b.isNaN), s"meanFrac=$mf t=$i: sql $a != native $b")
        else
          // meanFrac=1: SQL avg accumulates in partial-agg order, native in
          // sorted order — FP addition order differs at the ulp level (numpy
          // nanmean itself sums unsorted here; no order is canonical)
          assert(math.abs(a - b) <= 1e-12 * math.max(1.0, math.abs(b)),
            s"meanFrac=$mf t=$i: sql $a !~ native $b")
      }
    }
  }

  test("user-supplied kernel list: gaussian builders == named filterbank; None == analytic signal") {
    import graft.dsp.Kernels
    val raw = Synthetic.segments(spark, 1.0, 2, 400.0, seed = 31)
    // builders replicating the named 'human' hg-only bank must reproduce it
    val cfs = Kernels.centerFrequencies("human", hgOnly = true)
    val sds = Kernels.constQSds(cfs)
    val builders: Seq[Option[(Int, Double) => Array[Double]]] =
      cfs.indices.map(i => Some((n: Int, rate: Double) =>
        Kernels.gaussian(n, rate, cfs(i), sds(i))))
    val named = collectTraces(DspOperators.amplitude(
      DspOperators.waveletTransform(raw, "human", hgOnly = true)))
    val custom = collectTraces(DspOperators.amplitude(
      DspOperators.waveletTransform(raw, builders, Signal.FastPad)))
    assert(named.keySet == custom.keySet && named.nonEmpty)
    for (k <- named.keySet) {
      val worst = named(k).zip(custom(k)).map { case (a, b) => math.abs(a - b) }.max
      assert(worst < 1e-12, s"custom kernel list diverges from named bank at $k: $worst")
    }
    // a None entry is the raw analytic signal (wavelet_transform.py:316-318):
    // its amplitude envelope of a pure cosine is the constant cosine amplitude
    import spark.implicits._
    val t = (0 until 1024).map(i => 3.0 * math.cos(2 * math.Pi * 32 * i / 1024.0))
    val one = Seq(("s", 0, 1024.0, 0.0, t.toArray))
      .toDF("series", "channel", "rate", "startingTime", "values")
    val env = collectTraces(DspOperators.amplitude(DspOperators.waveletTransform(
      one, Seq(None), Signal.ExactPad(0))))((0, Some(0)))
    assert(env.forall(v => math.abs(v - 3.0) < 1e-9),
      s"analytic envelope of pure cosine != amplitude: ${env.take(5).mkString(",")}")
  }

  test("subtractCarLongBlocked == join-form subtractCar incl. planted nulls") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = for (t <- 0L until 700L; ch <- 0 until 8) yield
      ("s", ch, null: Integer, 400.0, 0.0, t,
        if (ch == 3 && t % 97 == 0) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf(rnd.nextDouble() * 100 - 50))
    val long = rows.toDF("series", "channel", "band", "rate", "startingTime", "t_idx", "value")
    def collectVals(df: org.apache.spark.sql.DataFrame) =
      df.select("t_idx", "channel", "value").collect()
        .map(r => (r.getLong(0), r.getInt(1)) ->
          (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    val joinForm = collectVals(CommonReferencing.subtractCar(long, 8))
    // stride 256 forces multiple windows over the 700-sample trace
    val blocked = collectVals(CommonReferencing.subtractCarLongBlocked(long, 8, stride = 256))
    assert(joinForm.keySet == blocked.keySet && joinForm.size == 700 * 8)
    for (k <- joinForm.keySet) {
      val (a, b) = (joinForm(k), blocked(k))
      assert((a.isNaN && b.isNaN) || math.abs(a - b) < 1e-12, s"diverges at $k: $a vs $b")
    }
  }

  test("blocked segment CAR == long-form SQL CAR (small blockSize forces multi-block)") {
    val raw = Synthetic.segments(spark, 1.0, 8, 400.0, seed = 21)
    val blocked = CommonReferencing.subtractCarSegments(raw, 8, 0.95, blockSize = 64)
    val longForm = Frames.toSegments(
      CommonReferencing.subtractCar(Frames.toLong(raw), 8, 0.95))
    val a = collectTraces(blocked)
    val b = collectTraces(longForm)
    assert(a.keySet == b.keySet && a.nonEmpty)
    for (k <- a.keySet) {
      assert(a(k).length == b(k).length)
      val worst = a(k).zip(b(k)).map { case (x, y) => math.abs(x - y) }.max
      assert(worst == 0.0, s"blocked CAR diverges at $k by $worst")
    }
  }

  // --- tests/test_pipeline.py:102-154 analog: partitioning invariance ------
  test("pipeline result is invariant to partitioning (chunked == unchunked analog)") {
    val raw = Synthetic.segments(spark, 1.0, 8, 2000.0, seed = 3)
    val cfg = Pipeline.Config(initialRate = 1000.0, finalRate = Some(250.0),
      filters = "human", hgOnly = true, scaling = 1.0)
    val one = Pipeline.preprocessBlock(raw.coalesce(1), 8, cfg)
    val many = Pipeline.preprocessBlock(raw.repartition(8), 8, cfg)
    val a = collectTraces(one)
    val b = collectTraces(many)
    assert(a.keySet == b.keySet)
    assert(a.keySet.size == 8 * 8, s"expected 8ch x 8 human-hg bands, got ${a.keySet.size}")
    for (k <- a.keySet) {
      val (x, y) = (a(k), b(k))
      assert(x.length == y.length)
      val worst = x.zip(y).map { case (u, v) => math.abs(u - v) / math.max(1e-12, math.abs(v)) }.max
      assert(worst < 1e-9, s"segment $k diverges: $worst")
    }
  }

  // --- end-to-end physics: the minimum slice of SURVEY.md §7 ---------------
  test("flagship slice: notch removes 60 Hz, wavelet tracks high gamma, zscore normalizes") {
    val rate = 1000.0
    val raw = Synthetic.segments(spark, 4.0, 8, rate, seed = 5)
    // notch: 60 Hz power before vs after on channel 0
    def power60(values: Array[Double], r: Double): Double = {
      val re = values.indices.map(i => values(i) * math.cos(2 * math.Pi * 60 * i / r)).sum
      val im = values.indices.map(i => values(i) * math.sin(2 * math.Pi * 60 * i / r)).sum
      math.hypot(re, im) / values.length
    }
    val before = collectTraces(raw)((0, None))
    val notched = collectTraces(DspOperators.applyLinenoiseNotch(raw))((0, None))
    assert(power60(before, rate) / power60(notched, rate) > 100.0, "60 Hz not removed")

    val amp = Pipeline.preprocessBlock(raw, 8,
      Pipeline.Config(initialRate = 1000.0, finalRate = None, filters = "human",
        hgOnly = true, scaling = 1.0))
    val hg = Pipeline.highGammaTrace(amp, baselineSamples = 125)
    val traces = collectTraces(hg)
    assert(traces.size == 8)
    // z-scored and band-averaged: roughly zero-mean over the baseline
    for ((_, t) <- traces) {
      val baseMean = t.take(125).sum / 125
      assert(math.abs(baseMean) < 1.0, s"baseline mean $baseMean not ~0")
    }
  }

  // --- events adapter ------------------------------------------------------
  test("precision='single': float32 compute end to end, within single tolerance of double") {
    val raw = Synthetic.segments(spark, 1.0, 4, 2000.0, seed = 31)
    def isF32(x: Array[Double]): Boolean = x.forall(v => v == v.toFloat.toDouble)
    // each operator's single-precision output must be exactly
    // float32-representable (proof the compute ran in float32, not a cast
    // at the end) and within the reference's own single-vs-double tolerance
    val dsS = DspOperators.resample(raw, 1000.0, precision = "single")
    val dsD = DspOperators.resample(raw, 1000.0)
    val ntS = DspOperators.applyLinenoiseNotch(dsS, precision = "single")
    val ntD = DspOperators.applyLinenoiseNotch(dsD)
    val wvS = DspOperators.amplitude(DspOperators.waveletTransform(
      ntS, "human", hgOnly = true, precision = "single"))
    val wvD = DspOperators.amplitude(DspOperators.waveletTransform(ntD, "human", hgOnly = true))
    def bands(df: DataFrame) = df.select(col("channel"), col("band"), col("values"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
    for ((df, label) <- Seq(dsS -> "resample", ntS -> "notch")) {
      val ts = collectTraces(df)
      assert(ts.values.forall(isF32), s"$label single output not float32-valued")
    }
    val sMap = bands(wvS)
    val dMap = bands(wvD)
    assert(sMap.keySet == dMap.keySet && sMap.nonEmpty)
    for (k <- sMap.keySet) {
      val rms = math.sqrt(dMap(k).map(v => v * v).sum / dMap(k).length)
      val worst = sMap(k).zip(dMap(k)).map { case (a, b) => math.abs(a - b) }.max
      assert(worst < 1e-3 * math.max(rms, 1.0),
        s"single diverges from double at $k: $worst (band rms $rms)")
    }
    intercept[IllegalArgumentException](DspOperators.resample(raw, 1000.0, precision = "half"))
  }

  test("precision='single': CAR and z-score accumulate in float32 (last parity gap)") {
    // reference threads precision through CAR itself (common_referencing.py:11-23
    // via utils.py:9-31) and the tutorial z-score runs on float32 arrays; the
    // single path must produce exactly-float32-representable values (proof the
    // COMPUTE narrowed, not a trailing cast) within single tolerance of double
    val raw = Synthetic.segments(spark, 1.0, 8, 400.0, seed = 37)
      // float32-round inputs first, like the reference's astype at ingest
      .withColumn("values", expr("transform(values, v -> cast(cast(v as float) as double))"))
    def isF32(x: Array[Double]): Boolean = x.forall(v => v.isNaN || v == v.toFloat.toDouble)
    def close(s: Map[(Int, Option[Int]), Array[Double]],
              d: Map[(Int, Option[Int]), Array[Double]], label: String): Unit = {
      assert(s.keySet == d.keySet && s.nonEmpty)
      for (k <- s.keySet) {
        val rms = math.sqrt(d(k).map(v => v * v).sum / d(k).length)
        val worst = s(k).zip(d(k)).map { case (a, b) => math.abs(a - b) }.max
        assert(worst < 1e-3 * math.max(rms, 1.0), s"$label single vs double at $k: $worst")
      }
    }
    val carS = CommonReferencing.subtractCarSegments(raw, 8, precision = "single")
    val carD = CommonReferencing.subtractCarSegments(raw, 8)
    val (cs, cd) = (collectTraces(carS), collectTraces(carD))
    assert(cs.values.forall(isF32), "single blocked CAR output not float32-valued")
    close(cs, cd, "blocked CAR")
    // the CAR trace itself (CAR_of_ series)
    val trS = CommonReferencing.carSegments(raw, 8, precision = "single")
    assert(trS.select("values").collect()
      .forall(r => isF32(r.getSeq[Double](0).toArray)), "single CAR trace not f32-valued")
    // join-form CAR via the native trimmed-mean aggregate's single flag
    val longF = Frames.toLong(raw)
    val joinS = Frames.toSegments(CommonReferencing.subtractCar(longF, 8, precision = "single"))
    val joinD = Frames.toSegments(CommonReferencing.subtractCar(longF, 8))
    val (js, jd) = (collectTraces(joinS), collectTraces(joinD))
    assert(js.values.forall(isF32), "single join-form CAR output not float32-valued")
    close(js, jd, "join-form CAR")
    // z-score in float32
    val zS = collectTraces(DspOperators.zscoreSegments(carS, 125, precision = "single"))
    val zD = collectTraces(DspOperators.zscoreSegments(carD, 125))
    assert(zS.values.forall(isF32), "single z-score output not float32-valued")
    close(zS, zD, "z-score")
    // the cross-band average at the pipeline tail narrows too: the high-gamma
    // trace is the last stage a float32 pipeline flows through
    val ampBands = DspOperators.amplitude(DspOperators.waveletTransform(
      raw, "human", hgOnly = true, precision = "single"))
    val hgS = collectTraces(Pipeline.highGammaTrace(ampBands, 125, precision = "single"))
    val hgD = collectTraces(Pipeline.highGammaTrace(ampBands, 125))
    assert(hgS.values.forall(isF32), "single high-gamma trace not float32-valued")
    close(hgS, hgD, "high-gamma band average")
    intercept[IllegalArgumentException](
      CommonReferencing.subtractCarSegments(raw, 8, precision = "half"))
  }

  test("bucketed dense index equals single-window row_number") {
    import org.apache.spark.sql.expressions.Window
    val events = Frames.normalizeTsNanos(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .withColumn("channel", pmod(col("user_id"), lit(8)).cast("int"))
    val w = Window.partitionBy(col("channel")).orderBy(col("ts"), col("event_id"))
    val expect = events.withColumn("t_idx", (row_number().over(w) - 1).cast("long"))
      .select("channel", "event_id", "t_idx")
    val got = Frames.denseIndexByKey(events, Seq("channel"),
        (col("ts").cast("long") / (3600L * 1000 * 1000 * 1000)).cast("long"),
        Seq(col("ts"), col("event_id")), "t_idx")
      .select("channel", "event_id", "t_idx")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "bucketed dense index diverges from global row_number")
    // and the plan has no whole-channel window: every window partitioning
    // includes the bucket column
    val windows = got.queryExecution.optimizedPlan.collect {
      case wn: org.apache.spark.sql.catalyst.plans.logical.Window => wn
    }
    assert(windows.nonEmpty)
    val bigDataWindow = windows.filter(_.output.exists(_.name == "t_idx"))
    assert(bigDataWindow.forall(_.partitionSpec.length >= 2),
      "per-row rank window must be partitioned by (key, bucket), not key alone")
  }

  test("eventsToSegments == toSegments(rectangularize(eventsToLong)) exactly") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val fused = Frames.eventsToSegments(events, 8, 1000.0)
    val staged = Frames.toSegments(Frames.rectangularize(
      Frames.eventsToLong(events, 8, 1000.0)))
    val f = collectTraces(fused)
    val s = collectTraces(staged)
    assert(f.keySet == s.keySet && f.size == 8)
    for (k <- f.keySet) {
      assert(f(k).length == s(k).length, s"length differs at $k")
      assert(f(k) sameElements s(k), s"fused adapter diverges at $k")
    }
  }

  test("eventsToLong is deterministic and rectangular after trim") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val long = Frames.rectangularize(Frames.eventsToLong(events, 8, 200.0))
    val counts = long.groupBy("channel").count().collect().map(_.getLong(1)).distinct
    assert(counts.length == 1, s"not rectangular: ${counts.toSeq}")
    val a = long.orderBy("channel", "t_idx").collect()
    val b = Frames.rectangularize(Frames.eventsToLong(events, 8, 200.0))
      .orderBy("channel", "t_idx").collect()
    assert(a sameElements b)
    // round-trip long -> segments -> long preserves values
    val seg = Frames.toSegments(long)
    assert(seg.count() == 8)
    val back = Frames.toLong(seg)
    assert(back.count() == long.count())
  }
}
