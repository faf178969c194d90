package graft.tools
import org.apache.spark.sql.SparkSession
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val skip = Set("q36_streaming_windowed_wavelet", "q37_streaming_crossfade_stitch",
      "q55_streaming_event_agg", "q56_streaming_running_stats",
      "q64_streaming_dedup", "q73_streaming_pii_scrub",
      "q78_streaming_minhash_dedup", "q84_streaming_count_min",
      "q102_streaming_histogram_quantiles", "q103_streaming_sessions",
      "q104_streaming_interval_join", "q106_streaming_native_dedup", "q107_stream_static_enrich")
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1) if !skip(name)) {
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val scans = "FileScan parquet".r.findAllIn(plan).length
        val reused = "ReusedExchange".r.findAllIn(plan).length
        val exch = "Exchange (hash|range|Single)".r.findAllIn(plan).length
        val cart = if (plan.contains("CartesianProduct")) " CARTESIAN" else ""
        val smj = "SortMergeJoin".r.findAllIn(plan).length
        println(s"[audit] $name scans=$scans reused=$reused exchanges=$exch smj=$smj$cart")
      } catch { case e: Throwable =>
        println(s"[audit] $name ERR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
