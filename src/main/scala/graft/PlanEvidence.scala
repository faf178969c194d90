package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Checkpoints, Graph}
import Checkpoints.Pinnable

/** Dev tool: committed plan evidence for the r18 iterative-loop fix. The
  * iterative operators pin (checkpoint) state each round, so the FINAL
  * query explain is a LogicalRDD stub that cannot show the per-round join
  * shape — this main reconstructs one relaxation round's join over the
  * same sf data under BOTH pinning disciplines and writes the two
  * formatted plans, which is where the before/after difference lives:
  *
  *   before: dir pinned plain (UnknownPartitioning) — the round join
  *           plans Exchange + Sort on the full edge side, EVERY round
  *   after:  dir pinned via Graph.pinByKey — the edge side arrives
  *           hash-partitioned and sorted; only the small state side moves
  *
  * Usage: runMain graft.PlanEvidence <sfDir> <outDir> */
object PlanEvidence {
  def main(args: Array[String]): Unit = {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
      .withColumn("w", pmod(col("a") + col("b"), lit(7)) + lit(1))
    // persist + count exactly like boundedSssp does before tier dispatch —
    // the cached relation's REAL size feeds the round joins' stats, which
    // is what drives the loop's join strategy (an unpersisted probe
    // under-estimates and shows a broadcast the real rounds never get)
    val e = edges.select(col("a").cast("long").as("a"),
        col("b").cast("long").as("b"), col("w").cast("long").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count()
    val dirRaw = e.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .union(e.select(col("b").as("src"), col("a").as("dst"), col("w")))

    def roundPlan(dir: org.apache.spark.sql.DataFrame): String = {
      // replay ssspRounds exactly: round 1 from the seeds, then EXPLAIN
      // round 2 — the steady-state round shape every later round repeats
      // (round 1's seed frame has known-small stats and can broadcast;
      // from round 2 the state is a pinned union+min aggregate, which is
      // what the loop actually joins against)
      val seeds = li.filter(col("l_partkey") % 100 === 0)
        .select(col("l_partkey").cast("long").as("v")).distinct()
      var dist = seeds.select(col("v"), lit(0L).as("d")).pin
      var explained = ""
      for (r <- 1 to 2) {
        val relaxed = dir.join(dist, dir("src") === dist("v"))
          .select(col("dst").as("v"), (col("d") + col("w")).as("d"))
        val next = dist.union(relaxed).groupBy("v").agg(min("d").as("d"))
        if (r == 2) explained = next.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        dist = next.pin
      }
      explained
    }

    // BEFORE discipline: plain pin — partitioning lost
    val dirBefore = dirRaw.pin
    java.nio.file.Files.writeString(
      outDir.resolve("sssp_round_join_before.txt"),
      "// one ssspRounds relaxation round, dir pinned PLAIN (pre-870672b)\n" +
        roundPlan(dirBefore))
    // AFTER discipline: pinByKey — partitioned + sorted on src
    val dirAfter = Graph.pinByKey(dirRaw, "src")
    java.nio.file.Files.writeString(
      outDir.resolve("sssp_round_join_after.txt"),
      "// one ssspRounds relaxation round, dir pinned via pinByKey (870672b)\n" +
        roundPlan(dirAfter))
    println("wrote round-join before/after plans")
    spark.stop()
  }
}
