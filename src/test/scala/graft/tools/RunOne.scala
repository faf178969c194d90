package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev helper: run ONE SparkEntry query and dump its parquet + oracle SQL,
  * so a single oracle can be iterated without a full Verify pass.
  * Usage: Test/runMain graft.tools.RunOne <queryName> <sfDir> <outDir> */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    println(f"[run_one] $name done in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_oracle.sql"), sql)
    }
    spark.stop()
  }
}
