package graft.operators

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Scale soak for the graph family with CLOSED-FORM invariants:
  *
  *   - K disjoint k-cliques  -> exactly K * C(k,3) triangles
  *   - one H-leaf star hub   -> exactly 0 triangles, maximal degree skew
  *
  * The star is the adversarial case for triangle counting: a naive
  * wedge-at-every-vertex join generates C(H,2) wedges at the hub (5e11 at
  * H=1M — job-killing); degree orientation points every star edge INTO
  * the hub (leaf degree 1 < hub degree H), so the hub generates ZERO
  * wedges and the star costs nothing. The soak asserts the exact triangle
  * count and PageRank leaf-uniformity/mass invariants at ~1M-edge scale.
  *
  * Run: sbt "Test/runMain graft.operators.GraphSoak [K] [k] [H] [iters] [ckptDir]"
  *
  * A non-empty 5th arg switches every iterative pin from executor-memory
  * localCheckpoint to RELIABLE checkpointing into that directory
  * (Checkpoints.DirKey) — the executor-loss-safe cluster mode; the soak
  * then certifies the reliable path at the same scale and invariants.
  */
object GraphSoak {

  def main(args: Array[String]): Unit = {
    val cliques = if (args.length > 0) args(0).toInt else 2000
    val k = if (args.length > 1) args(1).toInt else 6
    val leaves = if (args.length > 2) args(2).toLong else 1000000L
    val iters = if (args.length > 3) args(3).toInt else 5
    val ckptDir = if (args.length > 4) args(4).trim else ""

    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graph-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    if (ckptDir.nonEmpty) {
      spark.conf.set(Checkpoints.DirKey, ckptDir)
      println(s"pin mode: RELIABLE checkpoint -> $ckptDir")
    } else println("pin mode: localCheckpoint")
    import spark.implicits._

    // clique pair template: C(k,2) (j1, j2) offsets
    val pairTemplate = (for {
      a <- 0 until k; b <- (a + 1) until k
    } yield (a, b)).toDF("j1", "j2")
    val cliqueEdges = spark.range(0, cliques.toLong).select(col("id").as("c"))
      .crossJoin(pairTemplate)
      .select((col("c") * k + col("j1")).as("a"), (col("c") * k + col("j2")).as("b"))
    val hub = cliques.toLong * k
    val starEdges = spark.range(0, leaves)
      .select(lit(hub).as("a"), (lit(hub) + 1 + col("id")).as("b"))
    val edges = cliqueEdges.union(starEdges)

    val expectTri = cliques.toLong * (k.toLong * (k - 1) * (k - 2) / 6)
    val nEdges = cliques.toLong * k * (k - 1) / 2 + leaves

    var t0 = System.nanoTime()
    val tri = Graph.triangleStats(edges).collect()(0)
    val triSec = (System.nanoTime() - t0) / 1e9
    println(f"triangleStats: ${triSec}%.1f s  nodes=${tri.getLong(0)} edges=${tri.getLong(1)} " +
      f"wedges=${tri.getLong(2)} triangles=${tri.getLong(3)}")
    assert(tri.getLong(3) == expectTri,
      s"triangles ${tri.getLong(3)} != expected $expectTri")
    assert(tri.getLong(1) == nEdges, s"edges ${tri.getLong(1)} != $nEdges")

    t0 = System.nanoTime()
    val ranks = Graph.pageRankScaled(edges, iters = iters)
    val leafRanks = ranks.filter(col("v") > hub).select(col("rank_scaled"))
      .distinct().collect().map(_.getLong(0))
    val hubRank = ranks.filter(col("v") === hub).collect()(0).getLong(1)
    val mass = ranks.agg(sum("rank_scaled")).collect()(0).getLong(0)
    val prSec = (System.nanoTime() - t0) / 1e9
    println(f"pageRank($iters): ${prSec}%.1f s  hubRank=$hubRank " +
      f"distinctLeafRanks=${leafRanks.length} mass=$mass")
    // all star leaves are symmetric -> identical ranks
    assert(leafRanks.length == 1, s"leaves not uniform: ${leafRanks.length} values")
    assert(hubRank > leafRanks(0), "hub must outrank leaves")
    // floor losses only: mass within (iters+1) * nNodes of the scale
    val nNodes = cliques.toLong * k + 1 + leaves
    assert(mass <= 1000000000000L && mass > 1000000000000L - (iters + 1).toLong * nNodes,
      s"mass $mass outside floor-loss envelope")

    spark.stop()
  }
}
