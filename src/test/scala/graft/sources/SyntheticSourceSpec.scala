package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** The DSv2 synthetic source: value fidelity vs the library generator,
  * planning-time partition pruning from pushed channel predicates, and
  * column pruning reaching the scan. */
class SyntheticSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("synthetic-source-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def src(nCh: Int = 8, nTime: Int = 64): DataFrame =
    spark.read.format("graft.sources.SyntheticSource")
      .option("nchannels", nCh).option("ntime", nTime).option("seed", 42)
      .load()

  test("values match Synthetic.rawTraceForSource exactly, all channels") {
    val rows = src().collect()
    assert(rows.length === 8 * 64)
    val byCh = rows.groupBy(_.getInt(0))
    for (ch <- 0 until 8) {
      val expect = graft.model.Synthetic.rawTraceForSource(64, 42L, ch)
      val got = byCh(ch).sortBy(_.getInt(1)).map(_.getDouble(2))
      assert(got.toSeq === expect.toSeq, s"channel $ch")
    }
  }

  test("equality filter prunes to ONE partition at planning time") {
    val df = src().filter(col("channel") === 3)
    assert(df.rdd.getNumPartitions === 1)
    assert(df.select(countDistinct("channel")).collect()(0).getLong(0) === 1)
  }

  test("range filter prunes partitions to the channel span") {
    val df = src().filter(col("channel") >= 2 && col("channel") < 6)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 4 * 64)
  }

  test("IN-set filter prunes to the set size") {
    val df = src().filter(col("channel").isin(1, 5, 7))
    assert(df.rdd.getNumPartitions === 3)
    assert(df.count() === 3 * 64)
  }

  test("column pruning reaches the scan (value generation skipped)") {
    val df = src().select("channel", "t")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq ===
      Seq("channel", "t"))
    assert(df.count() === 8 * 64)
  }

  test("channelsPerPartition groups channels into blocks") {
    val df = spark.read.format("graft.sources.SyntheticSource")
      .option("nchannels", 8).option("ntime", 16)
      .option("channelsPerPartition", 4).load()
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 8 * 16)
  }
}
