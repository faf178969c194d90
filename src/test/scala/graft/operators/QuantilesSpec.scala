package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distributed rank-selection quantiles against Spark's built-in exact
  * `percentile` aggregate (same linear-interpolation definition) and
  * against hand-computed values; partition-count invariance. */
class QuantilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("quantiles-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  val ps = Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99)

  test("quantiles equal Spark's percentile aggregate on mixed random groups") {
    val rng = new scala.util.Random(7)
    // skewed group sizes, duplicated values, a singleton group, nulls
    val rows = Seq.tabulate(2000)(i =>
      ("g" + (i % 5), math.rint(rng.nextGaussian() * 50) / 4)) ++
      Seq(("solo", 42.0))
    val df = rows.toDF("g", "v")
      .union(Seq(("g1", null.asInstanceOf[java.lang.Double])).toDF("g", "v"))
    val ours = Quantiles.exactQuantiles(df, "g", "v", ps)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val ref = df.filter($"v".isNotNull).groupBy("g")
      .agg(expr("percentile(v, array(0.5, 0.95, 0.99))").as("q"))
      .collect().map { r =>
        val q = r.getSeq[Double](1)
        r.getString(0) -> ((q(0), q(1), q(2)))
      }.toMap
    assert(ours.keySet === ref.keySet)
    ours.foreach { case (g, (a, b, c)) =>
      val (ra, rb, rc) = ref(g)
      assert(a === ra, s"$g p50")
      assert(b === rb, s"$g p95")
      assert(c === rc, s"$g p99")
    }
    assert(ours("solo") === ((42.0, 42.0, 42.0)), "singleton group is its own quantile")
  }

  test("hand-computed interpolation on a 5-value group") {
    // values 1..5: p50 -> rank 2 -> 3.0; p95 -> rank 3.8 -> 4 + 0.8*(5-4)
    val df = Seq.tabulate(5)(i => ("a", (i + 1).toDouble)).toDF("g", "v")
    val r = Quantiles.exactQuantiles(df, "g", "v", ps).head()
    assert(r.getDouble(1) === 3.0)
    assert(r.getDouble(2) === 4.0 + (5.0 - 4.0) * (0.95 * 4.0 - 3.0))
    assert(r.getDouble(3) === 4.0 + (5.0 - 4.0) * (0.99 * 4.0 - 3.0))
  }

  test("result is partition-layout invariant") {
    val rng = new scala.util.Random(11)
    val df = Seq.tabulate(999)(i => ("g" + (i % 3), rng.nextDouble() * 100))
      .toDF("g", "v")
    val a = Quantiles.exactQuantiles(df.repartition(1), "g", "v", ps)
      .collect().map(_.toSeq).toSeq
    val b = Quantiles.exactQuantiles(df.repartition(13), "g", "v", ps)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("empty input yields an empty frame with the declared schema") {
    val df = Seq.empty[(String, Double)].toDF("g", "v")
    val out = Quantiles.exactQuantiles(df, "g", "v", ps)
    assert(out.columns.toSeq === Seq("g", "p50", "p95", "p99"))
    assert(out.count() === 0)
  }
}
