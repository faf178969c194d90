package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dsp.Signal

/** Dev probe: localize windowed-vs-whole parity divergence by t_idx bucket
  * on the calib (line-free) series of [[DspMegaSoak]]'s planted signal. */
object DspMegaDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = DspMegaSoak.Params(nCh = 8, nWindows = 2, parityCh = 1)
    val calib = DspMegaSoak.planted(spark, p, p.cleanWindows, lines = false, "calib")
    val newFreq = p.rate / 4
    val cleanWholePadded = p.cleanNRes.toInt +
      Signal.padPlan(p.cleanNRes.toInt, Signal.FastPad).padTotal

    // windowed arm up to z
    val w = Windowing.windowLong(calib, p.stride, p.context)
    val r = DspOperators.resample(w, newFreq)
    val nch = DspOperators.applyLinenoiseNotch(r, continuousProfile = true)
    val car = CommonReferencing.subtractCarSegments(nch, p.nCh)
    val amp = DspOperators.amplitude(DspOperators.waveletTransform(
      car, "rat", hgOnly = true, Signal.FastPad, Some(cleanWholePadded)))
    val st = Windowing.stitch(amp, p.strideP, p.contextP).persist()
    val stats = st.filter(col("win_idx") === 0)
      .select(col("channel"), col("band"),
        posexplode(col("values")).as(Seq("_pos", "v")))
      .filter(col("_pos") >= p.edgeTrim)
      .groupBy("channel", "band")
      .agg(avg("v").as("mu"),
        sqrt(avg(col("v") * col("v")) - avg("v") * avg("v")).as("sd"))
    val z = st.join(broadcast(stats), Seq("channel", "band"))
      .withColumn("values", transform(col("values"), v => (v - col("mu")) / col("sd")))
      .drop("mu", "sd")
    val a = Windowing.stitchedToLong(z.filter(col("channel") < 1), p.strideP)
      .select(col("channel"), col("band"), col("t_idx"), col("value").as("va"))

    // whole arm
    val segs = calib.groupBy("channel")
      .agg(graft.functions.SeriesAssembleFunctions.assembleSeries(spark,
        col("t_idx"), col("value")).as("values"))
      .select(lit("calib").as("series"), col("channel"),
        lit(null).cast("int").as("band"), lit(p.rate).as("rate"),
        lit(0.0).as("startingTime"), col("values"))
    val rw = DspOperators.resample(segs, newFreq)
    val nw = DspOperators.applyLinenoiseNotch(rw, continuousProfile = true)
    val cw = CommonReferencing.subtractCarSegments(nw, p.nCh)
    val aw = DspOperators.amplitude(DspOperators.waveletTransform(
      cw.filter(col("channel") < 1), "rat", hgOnly = true,
      Signal.FastPad, Some(cleanWholePadded)))
    val zw = DspOperators.zscoreSegments(aw,
      baselineSamples = p.baseline - p.edgeTrim.toInt,
      precision = "double", baselineOffset = p.edgeTrim.toInt)
    val b = zw.select(col("channel"), col("band"),
        posexplode(col("values")).as(Seq("t_idx", "vb")))
      .select(col("channel"), col("band"),
        col("t_idx").cast("long").as("t_idx"), col("vb"))

    val j = a.join(b, Seq("channel", "band", "t_idx")).persist()
    println("=== band0 err histogram by t_idx/32768 ===")
    j.filter(col("band") === 0)
      .withColumn("bucket", floor(col("t_idx") / 32768))
      .groupBy("bucket")
      .agg(avg(abs(col("va") - col("vb"))).as("mean_err"),
        max(abs(col("va") - col("vb"))).as("max_err"),
        sqrt(avg(col("vb") * col("vb"))).as("rms_b"),
        sqrt(avg(col("va") * col("va"))).as("rms_a"),
        avg("va").as("mu_a"), avg("vb").as("mu_b"))
      .orderBy("bucket")
      .collect().foreach(r => println(
        f"bucket ${r.getLong(0)}%3d mean_err ${r.getDouble(1)}%10.4f max_err ${r.getDouble(2)}%10.2f " +
          f"rms_a ${r.getDouble(4)}%8.3f rms_b ${r.getDouble(3)}%8.3f mu_a ${r.getDouble(5)}%8.3f mu_b ${r.getDouble(6)}%8.3f"))
    println("=== top errors band0 ===")
    j.filter(col("band") === 0)
      .withColumn("err", abs(col("va") - col("vb")))
      .orderBy(col("err").desc).limit(10)
      .collect().foreach(r => println(s"  $r"))
    spark.stop()
  }
}
