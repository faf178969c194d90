package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Frames

/** Dev profiling harness (not a test): splits q21/q33 cost between the
  * events->segments adapter and the DSP/CAR chain at bench scale.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.operators.Q33Profile"
  */
object Q33Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    time("events count")(events.count())
    // warm
    val warmLong = Frames.rectangularize(Frames.eventsToLong(events, 8, 1000.0))
    time("adapter warm (eventsToLong+rect)")(warmLong.count())
    for (i <- 1 to 2) {
      val long = Frames.rectangularize(Frames.eventsToLong(events, 8, 1000.0))
      time(s"adapter long count #$i")(long.count())
      val seg = Frames.toSegments(long)
      time(s"adapter toSegments #$i")(seg.count())
    }
    val seg = Frames.toSegments(Frames.rectangularize(Frames.eventsToLong(events, 8, 1000.0)))
    for (i <- 1 to 2) {
      val amp = Pipeline.preprocessBlock(seg, 8,
        Pipeline.Config(initialRate = 1000.0, finalRate = Some(250.0),
          filters = "human", hgOnly = true, scaling = 1.0))
      val hg = Pipeline.highGammaTrace(amp, baselineSamples = 50)
      time(s"q33 dsp chain from cached-shape segments #$i")(hg.count())
    }
    // q21 split
    val long21 = Frames.rectangularize(Frames.eventsToLong(events, 8, 200.0))
      .withColumn("series", lit("events"))
    time("q21 adapter (200Hz long) count")(long21.count())
    for (i <- 1 to 2) {
      val ref = CommonReferencing.subtractCarLongBlocked(long21, nChannels = 8, meanFrac = 0.95)
      time(s"q21 blocked CAR #$i")(ref.count())
    }
    spark.stop()
  }
}
