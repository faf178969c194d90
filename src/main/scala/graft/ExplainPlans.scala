package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` for a set of declared queries to
  * one text file each — the plan evidence the optimization rounds commit
  * under plans/r<N>/. Usage:
  *
  *   runMain graft.ExplainPlans <sfDir> <outDir> [q01_...,q42_...]
  *
  * With no third arg it dumps every declared query. The session mirrors
  * Bench's conf (shuffle partitions = cores, AQE on) so the captured plan
  * is the plan the bench actually runs — except these are the PRE-execution
  * plans (AdaptiveSparkPlan isFinalPlan=false); runtime re-optimizations
  * (coalesced reads, broadcast rewrites) appear only in executed plans.
  * Queries whose builder itself runs jobs (streaming sinks, iterative
  * loops) execute those during construction, same as in Bench. */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainPlans <sfDir> <outDir> [names]")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    val names: Seq[String] =
      if (args.length >= 3) args(2).split(",").toSeq
      else qs.keys.toSeq.sorted
    names.foreach { name =>
      qs.get(name) match {
        case None => System.err.println(s"[explain] unknown query: $name")
        case Some(build) =>
          try {
            val df = build(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), plan)
            println(s"[explain] wrote $name (${plan.linesIterator.size} lines)")
          } catch {
            case e: Throwable =>
              System.err.println(s"[explain] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
