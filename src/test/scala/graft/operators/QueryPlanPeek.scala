package graft.operators

import org.apache.spark.sql.SparkSession

/** Dev main: print the formatted physical plan of registry queries at
  * sf0.001 — the `.explain`-and-iterate loop the build brief mandates.
  *
  * Run: sbt "Test/runMain graft.operators.QueryPlanPeek q79_... q83_..."
  */
object QueryPlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q79_zipf_spectrum", "q83_count_min_heavy_hitters")
    for (n <- names) {
      println(s"\n======== $n ========")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
