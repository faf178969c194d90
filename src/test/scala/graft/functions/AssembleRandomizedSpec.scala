package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Randomized (seeded, reproducible) model checks for the assembly
  * aggregates: random index sets — dense, gappy, duplicated, negative,
  * offset — shuffled into random partition counts so partial/merge paths
  * vary, compared against the plain-Scala reference model (sort). */
class AssembleRandomizedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("assemble-randomized")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("assemble_series matches the sort model on random index sets") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 25) {
      val n = 1 + rnd.nextInt(400)
      val base = rnd.nextInt(1000).toLong - 200
      // dense with probability ~1/2, else random gaps and duplicates
      val ts: Seq[Long] =
        if (rnd.nextBoolean()) rnd.shuffle((0 until n).map(base + _.toLong))
        else Seq.fill(n)(base + rnd.nextInt(3 * n + 1).toLong)
      val vs = Seq.fill(n)(rnd.nextInt(10000) / 7.0)
      val model = ts.zip(vs).sortBy(_._1).map(_._2)
      val parts = 1 + rnd.nextInt(7)
      val got = ts.zip(vs).toDF("t", "v").repartition(parts)
        .groupBy(lit(1))
        .agg(SeriesAssembleFunctions.assembleSeries(spark, $"t", $"v").as("values"))
        .head().getSeq[Double](1)
      // duplicates make the order among equal-t values nondeterministic:
      // compare the sorted-by-t multiset per t instead of positions
      val gotByT = ts.sorted.zip(got).groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val modelByT = ts.zip(vs).groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      assert(gotByT == modelByT, s"trial $trial (n=$n, parts=$parts)")
      assert(got.length == model.length)
    }
  }

  test("assemble_timed matches the sort model on random triples") {
    val rnd = new scala.util.Random(77L)
    for (trial <- 0 until 25) {
      val n = 1 + rnd.nextInt(300)
      val rows = Seq.fill(n)((rnd.nextInt(50).toLong * 1000L,
        rnd.nextInt(20).toLong, rnd.nextInt(1000) / 3.0))
      val model = rows.sorted
      val parts = 1 + rnd.nextInt(7)
      val got = rows.toDF("ts", "id", "v").repartition(parts)
        .groupBy(lit(1))
        .agg(SeriesAssembleFunctions.assembleTimed(spark, $"ts", $"id", $"v").as("a"))
        .select($"a.values", $"a.ts")
        .head()
      val gotVs = got.getSeq[Double](0)
      val gotTs = got.getSeq[Long](1)
      assert(gotVs == model.map(_._3), s"trial $trial values (n=$n, parts=$parts)")
      assert(gotTs == model.map(_._1), s"trial $trial ts (n=$n, parts=$parts)")
    }
  }
}
