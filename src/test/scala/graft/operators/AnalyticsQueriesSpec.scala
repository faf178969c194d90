package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantics invariants for the growth/bars analytics shapes (q145-q147):
  * cohort identities, growth accounting conservation, and the max-struct
  * OHLC idiom vs an explicit sort. */
class AnalyticsQueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("analytics-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("cohort cells: offset-0 count is the cohort size; counts never exceed it") {
    val act = Seq( // (user, day) already distinct
      (1L, 0L), (1L, 1L), (1L, 3L),
      (2L, 0L), (2L, 3L),
      (3L, 1L), (3L, 2L),
      (4L, 2L)
    ).toDF("user_id", "day")
    val first = act.groupBy("user_id").agg(min("day").as("cohort_day"))
    val cells = act.join(first, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("off"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(cells((0L, 0L)) === 2L) // users 1,2
    assert(cells((0L, 3L)) === 2L)
    assert(cells((1L, 0L)) === 1L) // user 3
    assert(cells((2L, 0L)) === 1L) // user 4
    val sizes = cells.collect { case ((c, 0L), n) => c -> n }
    assert(cells.forall { case ((c, _), n) => n <= sizes(c) })
  }

  test("growth accounting: active = new + returning, cumulative ends at distinct users") {
    val act = Seq(
      (1L, 0L), (2L, 0L), (1L, 1L), (3L, 1L), (2L, 2L), (4L, 2L), (1L, 2L)
    ).toDF("user_id", "day")
    val daily = act.groupBy("day").agg(count(lit(1)).as("n_active"))
    val news = act.groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = daily.join(news, Seq("day"), "left")
      .select(col("day"), col("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
      .withColumn("cum_users", sum("n_new").over(w))
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out === Array((0L, 2L, 2L, 0L, 2L), (1L, 2L, 1L, 1L, 3L),
      (2L, 3L, 1L, 2L, 4L)))
    assert(out.forall { case (_, a, n, r, _) => a == n + r })
  }

  test("OHLC max-struct open/close equals the explicit time-sorted first/last") {
    val e = Seq( // (type, h, ts, id, vm) with a ts tie inside bar (a,0)
      ("a", 0L, 100L, 1L, 5L), ("a", 0L, 50L, 2L, 9L), ("a", 0L, 100L, 3L, 2L),
      ("a", 1L, 10L, 4L, 7L),
      ("b", 0L, 30L, 5L, 1L), ("b", 0L, 20L, 6L, 8L)
    ).toDF("t", "h", "ts", "id", "vm")
    val bars = e.groupBy("t", "h").agg(
        min(struct(col("ts"), col("id"), col("vm"))).getField("vm").as("open_vm"),
        max(struct(col("ts"), col("id"), col("vm"))).getField("vm").as("close_vm"),
        max("vm").as("high_vm"), min("vm").as("low_vm"))
      .orderBy("t", "h").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // bar (a,0): open = ts 50 -> 9; close = (ts 100, id 3) -> 2 (tie on ts
    // breaks on id, never on vm)
    assert(bars === Array(
      ("a", 0L, 9L, 2L, 9L, 2L),
      ("a", 1L, 7L, 7L, 7L, 7L),
      ("b", 0L, 8L, 1L, 8L, 1L)))
  }
}
