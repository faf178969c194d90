package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r19 optimization internals:
  *  - pinByKey must still deliver a HashPartitioning + in-partition
  *    ordering on the checkpointed frame now that the AQE-off bracket is
  *    THREAD-scoped (cloned SQLConf) instead of session-global;
  *  - the session's own adaptive.enabled must be untouched by a pin;
  *  - the partition count must derive from the caller-known row count
  *    (capped at the session conf);
  *  - the broadcast and shuffled triangle tiers (closedOrientedWedges
  *    dispatch) must produce identical censuses / per-node coefficients;
  *  - the dense-array local tiers (kCoreLocal, ssspLocal) must equal the
  *    distributed round loops on the same graph.
  */
class GraphPinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graph-pin-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // a deterministic pseudo-random graph with triangles, hubs and chains
  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def graph(n: Int, m: Int): Seq[(Long, Long)] =
    (1 to m).map { i =>
      val a = math.floorMod(mix(i.toLong), n.toLong)
      val b = math.floorMod(mix(i.toLong * 2 + 1), n.toLong)
      (math.min(a, b), math.max(a, b))
    }.filter { case (a, b) => a != b }.distinct

  test("pinByKey: layout pinned, session AQE untouched, sized partitions") {
    val df = graph(500, 3000).toDF("a", "b")
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    spark.conf.set(Graph.PinRowsPerPartitionKey, "1000")
    val pinned =
      try Graph.pinByKey(df, "a", rows = 3000L)
      finally spark.conf.unset(Graph.PinRowsPerPartitionKey)
    // the bracket must not leak to the shared session
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val plan = pinned.queryExecution.executedPlan
    val part = plan.outputPartitioning
    assert(part.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.physical.HashPartitioning],
      s"expected HashPartitioning, got $part")
    // ceil(3000 / 1000) = 3 partitions, under the session's 4
    assert(part.numPartitions == 3, s"expected 3 partitions, got $part")
    assert(plan.outputOrdering.nonEmpty, "expected pinned in-partition ordering")
    // rows <= 0 falls back to the session conf
    val pinnedDefault = Graph.pinByKey(df, "a")
    assert(pinnedDefault.queryExecution.executedPlan
      .outputPartitioning.numPartitions == 4)
  }

  test("triangle tiers agree: broadcast wedge joins == shuffled wedge joins") {
    val edges = graph(120, 900).toDF("a", "b")
    val viaBroadcast = Graph.triangleStats(edges).collect()(0)
    spark.conf.set(Graph.BroadcastEdgeCapKey, "0")
    val viaShuffle =
      try Graph.triangleStats(edges).collect()(0)
      finally spark.conf.unset(Graph.BroadcastEdgeCapKey)
    assert(viaBroadcast.toSeq === viaShuffle.toSeq)
    assert(viaBroadcast.getLong(3) > 0L, "graph should contain triangles")

    val lcB = Graph.localClustering(edges).orderBy("v").collect().map(_.toSeq)
    spark.conf.set(Graph.BroadcastEdgeCapKey, "0")
    val lcS =
      try Graph.localClustering(edges).orderBy("v").collect().map(_.toSeq)
      finally spark.conf.unset(Graph.BroadcastEdgeCapKey)
    assert(lcB === lcS)
  }

  test("k-core tiers agree: dense-array local peel == distributed rounds") {
    val edges = graph(200, 2400).toDF("a", "b")
    val local = Graph.boundedKCorePeel(edges, k = 8, rounds = 6)
      .orderBy("round").collect().map(_.toSeq)
    spark.conf.set(Graph.LocalEdgeCapKey, "0")
    val dist =
      try Graph.boundedKCorePeel(edges, k = 8, rounds = 6)
        .orderBy("round").collect().map(_.toSeq)
      finally spark.conf.unset(Graph.LocalEdgeCapKey)
    assert(local === dist)
  }

  test("sssp tiers agree: dense-array local relax == distributed rounds") {
    val edges = graph(300, 1200).toDF("a", "b")
      .withColumn("w", pmod(col("a") + col("b"), lit(5)) + lit(1))
    val seeds = Seq(0L, 7L, 13L).toDF("v")
    val local = Graph.boundedSssp(edges, seeds, iters = 4)
      .orderBy("v").collect().map(_.toSeq)
    spark.conf.set(Graph.LocalEdgeCapKey, "0")
    val dist =
      try Graph.boundedSssp(edges, seeds, iters = 4)
        .orderBy("v").collect().map(_.toSeq)
      finally spark.conf.unset(Graph.LocalEdgeCapKey)
    assert(local === dist)
    assert(local.nonEmpty)
  }
}
