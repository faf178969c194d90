package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import QueryDef.table

/** General relational coverage over the harness star schema: aggregation,
  * multi-way joins (broadcast dims), semi/anti joins, window ranking,
  * distinct aggregates, time bucketing, sessionization. All pure Catalyst —
  * filters/projections push to the parquet scan, small dimensions broadcast,
  * AQE handles the rest at scale.
  */
object Relational {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q01_pricing_summary", "A6/A-family aggregations; scan pushdown",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        li.groupBy("l_returnflag", "l_linestatus").agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
            round(avg("l_quantity"), 6).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  round(avg(l_quantity), 6) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QueryDef("q03_top_revenue_orders", "join lineitem-orders-customer; top-k",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val o = table(s, dir, "orders")
        val c = table(s, dir, "customer")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .filter(col("c_mktsegment") === "BUILDING")
          .groupBy("l_orderkey")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY l_orderkey
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    QueryDef("q05_nation_revenue", "6-table join with broadcast dims (J2-style)",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val o = table(s, dir, "orders")
        val c = table(s, dir, "customer")
        val su = table(s, dir, "supplier")
        val n = table(s, dir, "nation")
        val r = table(s, dir, "region")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(su, col("l_suppkey") === col("s_suppkey") &&
                    col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    QueryDef("q07_semi_anti_customers", "left_semi / left_anti joins",
      (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders")
        val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy("c_nationkey").agg(count(lit(1)).as("with_orders"))
        val withoutO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey").agg(count(lit(1)).as("without_orders"))
        withO.join(withoutO, Seq("c_nationkey"), "full_outer")
          .select(col("c_nationkey"),
            coalesce(col("with_orders"), lit(0L)).as("with_orders"),
            coalesce(col("without_orders"), lit(0L)).as("without_orders"))
          .orderBy("c_nationkey")
      },
      Some("""WITH w AS (
             |  SELECT c_nationkey, count(*) AS with_orders FROM customer
             |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |  GROUP BY c_nationkey
             |), wo AS (
             |  SELECT c_nationkey, count(*) AS without_orders FROM customer
             |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |  GROUP BY c_nationkey
             |)
             |SELECT coalesce(w.c_nationkey, wo.c_nationkey) AS c_nationkey,
             |  coalesce(with_orders, 0) AS with_orders,
             |  coalesce(without_orders, 0) AS without_orders
             |FROM w FULL OUTER JOIN wo ON w.c_nationkey = wo.c_nationkey
             |ORDER BY c_nationkey""".stripMargin)),

    QueryDef("q08_top_orders_per_customer", "window ranking (row_number)",
      (s, dir) => {
        val o = table(s, dir, "orders")
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("price"), col("rk"))
          .orderBy("o_custkey", "rk")
      },
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rk
             |FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice, CAST(row_number() OVER (
             |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
             |  FROM orders) t
             |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin)),

    QueryDef("q09_distinct_parts", "distinct aggregates",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        li.groupBy("l_returnflag").agg(
            countDistinct(col("l_partkey")).as("distinct_parts"),
            countDistinct(col("l_suppkey")).as("distinct_supps"),
            count(lit(1)).as("rows"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts,
             |  count(DISTINCT l_suppkey) AS distinct_supps, count(*) AS rows
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QueryDef("q10_events_minute_agg", "event-time bucketing aggregation (ST/W analog)",
      (s, dir) => {
        val e = table(s, dir, "events")
        // ts is long nanos in Spark; DuckDB sees micros — minute floor agrees
        e.withColumn("minute_epoch", (floor(col("ts") / 60000000000L) * 60).cast("long"))
          .groupBy("minute_epoch", "event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
          .orderBy("minute_epoch", "event_type")
      },
      Some("""SELECT CAST(floor(epoch_ns(ts) / 60000000000) * 60 AS BIGINT) AS minute_epoch,
             |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("q11_user_sessions", "lag window + gap sessionization",
      (s, dir) => {
        val e = table(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        // session break: > 30 min gap (nanos)
        e.withColumn("prev_ts", lag("ts", 1).over(w))
          .withColumn("brk", when(col("prev_ts").isNull ||
            col("ts") - col("prev_ts") > 1800000000000L, 1).otherwise(0))
          .groupBy("user_id")
          .agg(sum("brk").cast("long").as("sessions"), count(lit(1)).as("events"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, CAST(sum(brk) AS BIGINT) AS sessions, count(*) AS events
             |FROM (
             |  SELECT user_id,
             |    CASE WHEN prev_ts IS NULL OR epoch_ns(ts) - epoch_ns(prev_ts) > 1800000000000
             |         THEN 1 ELSE 0 END AS brk
             |  FROM (SELECT user_id, ts, event_id,
             |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |        FROM events) t1) t2
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    QueryDef("q87_asof_view_click",
      "as-of join: each click matched to the user's most recent prior view",
      // the operator Spark lacks, composed as graft.operators.AsOf: one
      // union + one per-user carry-forward window — no join operator, both
      // sides shuffle exactly once. Certified against DuckDB's NATIVE
      // ASOF JOIN. All ts emitted at micro precision (ts div 1000): the
      // parquet carries TIMESTAMP(NANOS) that Spark reads as nano longs
      // while DuckDB truncates to micros; (user, micro) collisions are
      // verified absent at every sf, so ordering agrees across engines.
      (s, dir) => {
        val e = table(s, dir, "events")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = e.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"))
        graft.operators.AsOf.asOfJoin(clicks, views,
            keys = Seq("user_id"), ordCol = "ts", tieCol = "event_id",
            rightPayload = Seq("event_id", "ts"))
          .select(col("event_id").as("click_id"), col("user_id"),
            expr("ts div 1000").as("click_us"),
            col("asof_event_id").as("view_id"),
            expr("asof_ts div 1000").as("view_us"),
            expr("(ts div 1000) - (asof_ts div 1000)").as("lag_us"))
          .orderBy("click_id")
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
             |), v AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
             |)
             |SELECT c.event_id AS click_id, c.user_id,
             |  epoch_us(c.ts) AS click_us, v.event_id AS view_id,
             |  epoch_us(v.ts) AS view_us,
             |  epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
             |FROM c ASOF LEFT JOIN v
             |  ON c.user_id = v.user_id AND v.ts <= c.ts
             |ORDER BY click_id""".stripMargin)),

    QueryDef("q88_range_join_error_clicks",
      "range join: clicks in the 2 hours strictly before each error, per user",
      // graft.operators.RangeJoin: ord-binned equi-join (2 bins per left
      // row, exact predicate inside the hash join) — never a nested-loop
      // range scan. Micro-precision ords on both engines (ts div 1000 ==
      // epoch_us), strictly-before window [-2h, -1us].
      (s, dir) => {
        val e = table(s, dir, "events")
        val errors = e.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"))
        graft.operators.RangeJoin.rangeJoin(errors, clicks,
            keys = Seq("user_id"), ordCol = "us",
            lower = -7200000000L, upper = -1L,
            rightPayload = Seq("event_id", "us"))
          .select(col("event_id").as("error_id"), col("user_id"),
            col("us").as("error_us"), col("r_event_id").as("click_id"),
            col("r_us").as("click_us"))
          .orderBy("error_id", "click_id")
      },
      Some("""WITH ee AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events
             |  WHERE event_type = 'error'
             |), cc AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events
             |  WHERE event_type = 'click'
             |)
             |SELECT ee.event_id AS error_id, ee.user_id, ee.us AS error_us,
             |  cc.event_id AS click_id, cc.us AS click_us
             |FROM ee JOIN cc
             |  ON ee.user_id = cc.user_id
             | AND cc.us BETWEEN ee.us - 7200000000 AND ee.us - 1
             |ORDER BY error_id, click_id""".stripMargin)),

    QueryDef("q91_value_quantiles",
      "exact distributed quantiles (p50/p95/p99) by global rank selection",
      // graft.operators.Quantiles: one range shuffle + two-level rank
      // offsets — never a whole group through one percentile buffer. The
      // oracle replays the identical interpolation (p*(n-1), floor,
      // v_lo+(v_hi-v_lo)*frac) over row_number order statistics; the
      // READOUT rides the 6-decimal floor grid (r18 — parity by
      // construction, closing the emitted-float census).
      (s, dir) => graft.operators.Quantiles.exactQuantiles(
          table(s, dir, "events"), "event_type", "value",
          Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99),
          gridDecimals = Some(6))
        .orderBy("event_type"),
      Some("""WITH v AS (
             |  SELECT event_type AS g, value AS v FROM events
             |  WHERE value IS NOT NULL AND event_type IS NOT NULL
             |), r AS (
             |  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) - 1 AS rk,
             |    count(*) OVER (PARTITION BY g) AS n
             |  FROM v
             |), sel AS (
             |  SELECT g, n,
             |    max(CASE WHEN rk = CAST(floor(0.5::DOUBLE * (n - 1)) AS BIGINT)
             |      THEN v END) AS lo50,
             |    max(CASE WHEN rk = least(CAST(floor(0.5::DOUBLE * (n - 1)) AS BIGINT) + 1, n - 1)
             |      THEN v END) AS hi50,
             |    max(CASE WHEN rk = CAST(floor(0.95::DOUBLE * (n - 1)) AS BIGINT)
             |      THEN v END) AS lo95,
             |    max(CASE WHEN rk = least(CAST(floor(0.95::DOUBLE * (n - 1)) AS BIGINT) + 1, n - 1)
             |      THEN v END) AS hi95,
             |    max(CASE WHEN rk = CAST(floor(0.99::DOUBLE * (n - 1)) AS BIGINT)
             |      THEN v END) AS lo99,
             |    max(CASE WHEN rk = least(CAST(floor(0.99::DOUBLE * (n - 1)) AS BIGINT) + 1, n - 1)
             |      THEN v END) AS hi99
             |  FROM r GROUP BY g, n
             |)
             |SELECT g AS event_type,
             |  floor((lo50 + (hi50 - lo50) * (0.5::DOUBLE * (n - 1) - floor(0.5::DOUBLE * (n - 1)))) * 1e6 + 0.5) / 1e6 AS p50,
             |  floor((lo95 + (hi95 - lo95) * (0.95::DOUBLE * (n - 1) - floor(0.95::DOUBLE * (n - 1)))) * 1e6 + 0.5) / 1e6 AS p95,
             |  floor((lo99 + (hi99 - lo99) * (0.99::DOUBLE * (n - 1) - floor(0.99::DOUBLE * (n - 1)))) * 1e6 + 0.5) / 1e6 AS p99
             |FROM sel ORDER BY event_type""".stripMargin)),

    QueryDef("q92_cube_pricing",
      "multidimensional CUBE aggregation with grouping_id over lineitem",
      // all four grouping sets ((flag,status),(flag),(status),()) in one
      // pass — Catalyst expands the cube before the single hash aggregate,
      // partials combine map-side like any groupBy. Rollup coordinates are
      // coalesced to a sentinel so neither engine's null ORDER BY policy
      // (Spark nulls-first, DuckDB nulls-last) touches the comparison.
      (s, dir) => table(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          count(lit(1)).as("n_rows"),
          grouping_id().cast("int").as("gid"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
          col("sum_qty"), col("sum_disc_price"), col("n_rows"), col("gid"))
        .orderBy("returnflag", "linestatus"),
      Some("""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
             |  coalesce(l_linestatus, '(all)') AS linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  count(*) AS n_rows,
             |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY returnflag, linestatus""".stripMargin)),

    QueryDef("q96_robust_outliers",
      "median/MAD robust outlier stats per group (two exact-quantile passes)",
      // Quantiles.robustOutlierStats composes two exactQuantiles range
      // shuffles; med and mad ride the 6-decimal floor grid (r18 — exact
      // by construction, not by two engines' doubles agreeing), so the
      // strict |v-med| > 3*mad flag compares identical inputs. The oracle
      // replays both GRIDDED medians via the q91 row_number
      // order-statistic idiom — the gridded med also feeds ad.
      (s, dir) => graft.operators.Quantiles.robustOutlierStats(
          table(s, dir, "lineitem"), "l_returnflag", "l_extendedprice",
          k = 3.0, gridDecimals = Some(6))
        .orderBy("l_returnflag"),
      Some("""WITH base AS (
             |  SELECT CAST(l_returnflag AS VARCHAR) AS g,
             |    CAST(l_extendedprice AS DOUBLE) AS v
             |  FROM lineitem
             |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL
             |), r AS (
             |  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) - 1 AS rk,
             |    count(*) OVER (PARTITION BY g) AS n FROM base
             |), medsel AS (
             |  SELECT g, n,
             |    max(CASE WHEN rk = CAST(floor(0.5::DOUBLE * (n - 1)) AS BIGINT)
             |      THEN v END) AS lo,
             |    max(CASE WHEN rk = least(CAST(floor(0.5::DOUBLE * (n - 1)) AS BIGINT) + 1, n - 1)
             |      THEN v END) AS hi
             |  FROM r GROUP BY g, n
             |), med AS (
             |  SELECT g, floor((lo + (hi - lo) *
             |    (0.5::DOUBLE * (n - 1) - floor(0.5::DOUBLE * (n - 1)))) * 1e6 + 0.5) / 1e6 AS med
             |  FROM medsel
             |), dev AS (
             |  SELECT b.g, b.v, m.med, abs(b.v - m.med) AS ad
             |  FROM base b JOIN med m USING (g)
             |), r2 AS (
             |  SELECT g, ad, row_number() OVER (PARTITION BY g ORDER BY ad) - 1 AS rk,
             |    count(*) OVER (PARTITION BY g) AS n FROM dev
             |), madsel AS (
             |  SELECT g, n,
             |    max(CASE WHEN rk = CAST(floor(0.5::DOUBLE * (n - 1)) AS BIGINT)
             |      THEN ad END) AS lo,
             |    max(CASE WHEN rk = least(CAST(floor(0.5::DOUBLE * (n - 1)) AS BIGINT) + 1, n - 1)
             |      THEN ad END) AS hi
             |  FROM r2 GROUP BY g, n
             |), mad AS (
             |  SELECT g, floor((lo + (hi - lo) *
             |    (0.5::DOUBLE * (n - 1) - floor(0.5::DOUBLE * (n - 1)))) * 1e6 + 0.5) / 1e6 AS mad
             |  FROM madsel
             |)
             |SELECT d.g AS l_returnflag, count(*) AS n,
             |  max(d.med) AS med, max(ma.mad) AS mad,
             |  CAST(sum(CASE WHEN d.ad > 3.0 * ma.mad THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_outliers,
             |  round(CAST(sum(CASE WHEN d.ad > 3.0 * ma.mad THEN 1 ELSE 0 END)
             |    AS DOUBLE) / count(*), 6) AS outlier_frac
             |FROM dev d JOIN mad ma USING (g)
             |GROUP BY d.g ORDER BY l_returnflag""".stripMargin)),

    QueryDef("q97_rolling_features",
      "event-time rolling features: trailing 1 h RANGE window per user",
      // the feature-engineering shape a training pipeline stamps onto every
      // event: per-user trailing-hour activity counts/extrema via a RANGE
      // frame (peers included by VALUE, so ties are deterministic in both
      // engines). Order-independent aggregates only: count, max, and an
      // integer milli-sum — a double running sum's association order
      // differs between engines, an integer sum cannot. One shuffle
      // (user_id), per-user sort; frame state is bounded by the hour span,
      // never the user's whole history.
      (s, dir) => {
        val e = table(s, dir, "events")
          .filter(col("value").isNotNull)
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000").as("us"),
            round(col("value") * 1000).cast("long").as("vmilli"),
            col("value"))
        val w = Window.partitionBy("user_id").orderBy("us")
          .rangeBetween(-3600000000L, 0L)
        e.select(col("event_id"), col("user_id"), col("us"),
            count(lit(1)).over(w).as("n_1h"),
            max("value").over(w).as("vmax_1h"),
            sum("vmilli").over(w).as("vmilli_1h"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, us,
             |  count(*) OVER w AS n_1h,
             |  max(value) OVER w AS vmax_1h,
             |  CAST(sum(vmilli) OVER w AS BIGINT) AS vmilli_1h
             |FROM (
             |  SELECT event_id, user_id, epoch_us(ts) AS us,
             |    CAST(round(value * 1000) AS BIGINT) AS vmilli, value
             |  FROM events WHERE value IS NOT NULL
             |) t
             |WINDOW w AS (PARTITION BY user_id ORDER BY us
             |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    QueryDef("q98_funnel_conversion",
      "ordered funnel: view -> click -> purchase per user, strict event order",
      // each stage is min-after-previous-stage: three user-keyed
      // aggregations chained by joins, all hash-partitioned on the SAME key
      // so the exchanges line up (no re-shuffle between stages), then a
      // single global count — integer mins end-to-end, nothing to round.
      (s, dir) => {
        val e = table(s, dir, "events")
          .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
        val tv = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("us").as("tv"))
        val tc = e.filter(col("event_type") === "click").join(tv, "user_id")
          .filter(col("us") > col("tv"))
          .groupBy("user_id").agg(min("us").as("tc"))
        val tp = e.filter(col("event_type") === "purchase").join(tc, "user_id")
          .filter(col("us") > col("tc"))
          .groupBy("user_id").agg(min("us").as("tp"))
        val users = e.agg(countDistinct("user_id").as("n_users"))
        users.crossJoin(
          tv.join(tc, Seq("user_id"), "left").join(tp, Seq("user_id"), "left")
            .agg(count(lit(1)).as("n_view"),
              count(col("tc")).as("n_view_click"),
              count(col("tp")).as("n_full_funnel")))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
             |), tv AS (
             |  SELECT user_id, min(us) AS tv FROM e
             |  WHERE event_type = 'view' GROUP BY user_id
             |), tc AS (
             |  SELECT e.user_id, min(us) AS tc FROM e JOIN tv USING (user_id)
             |  WHERE event_type = 'click' AND us > tv GROUP BY e.user_id
             |), tp AS (
             |  SELECT e.user_id, min(us) AS tp FROM e JOIN tc USING (user_id)
             |  WHERE event_type = 'purchase' AND us > tc GROUP BY e.user_id
             |)
             |SELECT (SELECT count(DISTINCT user_id) FROM e) AS n_users,
             |  count(*) AS n_view,
             |  count(tc.tc) AS n_view_click,
             |  count(tp.tp) AS n_full_funnel
             |FROM tv LEFT JOIN tc USING (user_id) LEFT JOIN tp USING (user_id)"""
        .stripMargin)),

    QueryDef("q99_json_props_extract",
      "JSON metadata extraction: parse event props, roll up by value decile",
      // semi-structured metadata is a first-class pipeline input: extract
      // $.k with the codegen'd JSON-path expression (no UDF, column-pruned
      // scan reads only props/user_id/value), bucket, and roll up. The
      // single-column global-distinct expands to the standard two-level
      // (decile, user) partial — pair space bounded by deciles x users.
      (s, dir) => {
        val e = table(s, dir, "events")
        // integer-literal k only, pinned by regex BEFORE the cast: for a
        // non-integer numeric string the engines' casts disagree (Spark
        // nulls it out, DuckDB rounds it in), so the contract is decided
        // by an explicit filter both sides share, not by cast semantics
        e.select(get_json_object(col("props"), "$.k").as("k_str"),
            col("user_id"),
            round(col("value") * 1000).cast("long").as("vmilli"))
          .filter(col("k_str").rlike("^-?\\d+$"))
          .select(expr("CAST(k_str AS BIGINT) div 10").as("k_decile"),
            col("user_id"), col("vmilli"))
          .groupBy("k_decile")
          .agg(count(lit(1)).as("n"),
            countDistinct("user_id").as("n_users"),
            sum("vmilli").as("vmilli_sum"))
          .orderBy("k_decile")
      },
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10
             |    AS k_decile,
             |  count(*) AS n,
             |  count(DISTINCT user_id) AS n_users,
             |  CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS vmilli_sum
             |FROM events
             |WHERE regexp_matches(json_extract_string(props, '$.k'), '^-?\d+$')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q105_rolling_anomaly",
      "trailing-window rolling z-score anomaly flags per user",
      // q97's RANGE-window shape carrying SECOND moments: rolling mean and
      // population variance from exact integer milli sums (sum and
      // sum-of-squares are order-independent in integers; (1000v)^2 sums
      // stay < 2^63 at any realistic window) — an event is anomalous when
      // it sits more than 1.5 rolling stddevs from the trailing-week mean
      // with >= 8 events of support (a week because the harness event rate
      // is ~2 events/user/day; 1.5 sigma because its values are
      // near-uniform and a uniform's max deviation is 1.73 sigma — a
      // 3-sigma flag can never fire). The flag compares squared deviations
      // — dev^2/sigma^2 = (n*vm - s)^2 / (n*q - s^2) — in EXACT integer
      // arithmetic via DECIMAL(38,0) cross-multiplication, so the decision
      // can't straddle a float boundary between engines.
      (s, dir) => {
        val e = table(s, dir, "events")
          .filter(col("value").isNotNull)
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000").as("us"),
            round(col("value") * 1000).cast("long").as("vm"))
        val w = Window.partitionBy("user_id").orderBy("us")
          .rangeBetween(-604800000000L, 0L)
        e.select(col("event_id"), col("user_id"), col("us"), col("vm"),
            count(lit(1)).over(w).as("n"),
            sum("vm").over(w).as("s"),
            sum(col("vm") * col("vm")).over(w).as("q"))
          .withColumn("is_anomaly",
            (col("n") >= 8) &&
              (expr("4 * (CAST(n AS DECIMAL(38,0)) * vm - s) * (CAST(n AS DECIMAL(38,0)) * vm - s)") >
                expr("9 * (CAST(n AS DECIMAL(38,0)) * q - CAST(s AS DECIMAL(38,0)) * s)")))
          .groupBy("user_id")
          .agg(count(lit(1)).as("events"),
            sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("anomalies"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us,
             |    CAST(round(value * 1000) AS BIGINT) AS vm
             |  FROM events WHERE value IS NOT NULL
             |), roll AS (
             |  SELECT user_id, vm,
             |    count(*) OVER w AS n, sum(vm) OVER w AS s,
             |    sum(vm * vm) OVER w AS q
             |  FROM e
             |  WINDOW w AS (PARTITION BY user_id ORDER BY us
             |    RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
             |), flagged AS (
             |  SELECT user_id,
             |    CASE WHEN n >= 8
             |      AND 4 * (CAST(n AS HUGEINT) * vm - s) * (CAST(n AS HUGEINT) * vm - s)
             |        > 9 * (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
             |      THEN 1 ELSE 0 END AS a
             |  FROM roll
             |)
             |SELECT user_id, count(*) AS events,
             |  CAST(sum(a) AS BIGINT) AS anomalies
             |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin)),

    QueryDef("q101_histogram_quantiles",
      "bounded-state histogram-sketch quantiles (deterministic equi-width grid)",
      // Quantiles.histogramQuantiles: the state-bounded tier below q91 —
      // only (group, bin, count) rows shuffle (<= groups x 256 after
      // map-side combine) vs q91's every-row range shuffle; error bounded
      // by one bin width. The grid, rank rule (ceil(p*n) lower bound) and
      // in-bin interpolation are deterministic, so the oracle replays the
      // sketch exactly — no t-digest randomness.
      (s, dir) => graft.operators.Quantiles.histogramQuantiles(
          table(s, dir, "events"), "event_type", "value",
          Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99), nBins = 256,
          gridDecimals = Some(6))
        .orderBy("event_type"),
      Some("""WITH base AS (
             |  SELECT CAST(event_type AS VARCHAR) AS g, CAST(value AS DOUBLE) AS v
             |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
             |), stats AS (
             |  SELECT g, min(v) AS mn, max(v) AS mx, count(*) AS n
             |  FROM base GROUP BY g
             |), binned AS (
             |  SELECT b.g,
             |    CASE WHEN s.mx = s.mn THEN 0
             |      ELSE least(CAST(floor((b.v - s.mn) / (s.mx - s.mn) * 256)
             |        AS BIGINT), 255) END AS bin,
             |    s.mn, s.mx, s.n
             |  FROM base b JOIN stats s USING (g)
             |), counts AS (
             |  SELECT g, bin, count(*) AS c, max(mn) AS mn, max(mx) AS mx,
             |    max(n) AS n
             |  FROM binned GROUP BY g, bin
             |), cum AS (
             |  SELECT g, bin, c, mn, mx, n,
             |    sum(c) OVER (PARTITION BY g ORDER BY bin) AS cum,
             |    sum(c) OVER (PARTITION BY g ORDER BY bin) - c AS cumb
             |  FROM counts
             |)
             |SELECT g AS event_type,
             |  floor((max(CASE WHEN cumb < greatest(CAST(ceil(0.5 * n) AS BIGINT), 1)
             |    AND cum >= greatest(CAST(ceil(0.5 * n) AS BIGINT), 1)
             |    THEN mn + (mx - mn) / 256.0 * (CAST(bin AS DOUBLE)
             |      + CAST(greatest(CAST(ceil(0.5 * n) AS BIGINT), 1) - cumb AS DOUBLE)
             |        / CAST(c AS DOUBLE)) END)) * 1e6 + 0.5) / 1e6 AS p50,
             |  floor((max(CASE WHEN cumb < greatest(CAST(ceil(0.95 * n) AS BIGINT), 1)
             |    AND cum >= greatest(CAST(ceil(0.95 * n) AS BIGINT), 1)
             |    THEN mn + (mx - mn) / 256.0 * (CAST(bin AS DOUBLE)
             |      + CAST(greatest(CAST(ceil(0.95 * n) AS BIGINT), 1) - cumb AS DOUBLE)
             |        / CAST(c AS DOUBLE)) END)) * 1e6 + 0.5) / 1e6 AS p95,
             |  floor((max(CASE WHEN cumb < greatest(CAST(ceil(0.99 * n) AS BIGINT), 1)
             |    AND cum >= greatest(CAST(ceil(0.99 * n) AS BIGINT), 1)
             |    THEN mn + (mx - mn) / 256.0 * (CAST(bin AS DOUBLE)
             |      + CAST(greatest(CAST(ceil(0.99 * n) AS BIGINT), 1) - cumb AS DOUBLE)
             |        / CAST(c AS DOUBLE)) END)) * 1e6 + 0.5) / 1e6 AS p99
             |FROM cum GROUP BY g ORDER BY event_type""".stripMargin)),

    QueryDef("q115_bucketed_join",
      "write-time bucketed layout + exchange-free co-located merge join",
      // BucketedLayout: both fact tables are laid out bucketed(16) on the
      // order key at write time, then the join reads co-located buckets —
      // zero Exchange under the SortMergeJoin (spec-certified on the
      // plan). The aggregate after the join is the certified output; its
      // values are layout-independent, so the oracle is the plain join.
      (s, dir) => {
        import graft.operators.BucketedLayout
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val (lt, rt) = (s"graft_bl_lineitem$tag", s"graft_bl_orders$tag")
        BucketedLayout.writeBucketed(table(s, dir, "lineitem"), lt,
          s"/tmp/graft_bucketed$tag/lineitem", "l_orderkey", buckets = 16)
        BucketedLayout.writeBucketed(table(s, dir, "orders"), rt,
          s"/tmp/graft_bucketed$tag/orders", "o_orderkey", buckets = 16)
        BucketedLayout.bucketedJoin(s, lt, rt, "l_orderkey", "o_orderkey")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n_items,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q116_zorder_stats",
      "Z-order (Morton) multi-dim clustering key + per-z-range bounding-box stats",
      // ZOrder.zValue is a pure-codegen shift/and/or fold (exact integer
      // math in any engine). The certified output is the per-z-range
      // bounding box over BOTH source dims — the min/max file statistics a
      // z-ordered write would give every file, i.e. the quantity that
      // makes two-dimensional scan pruning work. Buckets = z >> 8 (256
      // cells of the 16-bit curve), deterministic regardless of layout.
      (s, dir) => {
        import graft.operators.ZOrder
        // BOTH dims masked to the 8-bit grid zValue interleaves —
        // user ids reach 1499, and an unmasked x would alias ids 256
        // apart into one bucket while the reported x_min/x_max spanned
        // the raw domain, making the bounding boxes meaningless
        val e = table(s, dir, "events")
          .select(pmod(col("user_id"), lit(256L)).as("x"),
            least(lit(255L), floor(col("value") / 2.0).cast("long")).as("y"))
        e.withColumn("z", ZOrder.zValue(col("x"), col("y"), bits = 8))
          .groupBy(shiftright(col("z"), 8).as("bucket"))
          .agg(count(lit(1)).as("n"),
            min("x").as("x_min"), max("x").as("x_max"),
            min("y").as("y_min"), max("y").as("y_max"))
          .orderBy("bucket")
      },
      Some("""|WITH b AS (
             |  SELECT user_id % 256 AS x,
             |    least(255, CAST(floor(value / 2.0) AS BIGINT)) AS y
             |  FROM events
             |), z AS (
             |  SELECT x, y, CAST(list_sum(list_transform(generate_series(0, 7),
             |    i -> ((x >> i) & 1) * (1::BIGINT << (2 * i))
             |       + ((y >> i) & 1) * (1::BIGINT << (2 * i + 1)))) AS BIGINT) AS zv
             |  FROM b
             |)
             |SELECT zv >> 8 AS bucket, count(*) AS n,
             |  min(x) AS x_min, max(x) AS x_max,
             |  min(y) AS y_min, max(y) AS y_max
             |FROM z GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q118_gapfill_census",
      "dense hourly time-grid gap fill + longest-gap census per user",
      // GapFill: sequence-exploded per-user grid (bounded by span, not
      // event count), zero-filled via co-partitioned left join, longest
      // empty run by rownumber-difference grouping — exact integer math
      // end to end (ts div, never a double division near 2^60 nanos).
      (s, dir) => graft.operators.GapFill.gapCensus(table(s, dir, "events")),
      Some("""|WITH h AS (
             |  SELECT user_id, epoch_ns(ts) // 3600000000000 AS hour FROM events
             |), c AS (
             |  SELECT user_id, hour, count(*) AS n FROM h GROUP BY 1, 2
             |), span AS (
             |  SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM h GROUP BY 1
             |), grid AS (
             |  SELECT user_id, unnest(generate_series(h0, h1)) AS hour FROM span
             |), g AS (
             |  SELECT grid.user_id, grid.hour, COALESCE(c.n, 0) AS n
             |  FROM grid LEFT JOIN c USING (user_id, hour)
             |), z AS (
             |  SELECT user_id, hour,
             |    hour - row_number() OVER (PARTITION BY user_id ORDER BY hour) AS grp
             |  FROM g WHERE n = 0
             |), runs AS (
             |  SELECT user_id, grp, count(*) AS runlen FROM z GROUP BY 1, 2
             |), mg AS (
             |  SELECT user_id, max(runlen) AS max_gap FROM runs GROUP BY 1
             |), census AS (
             |  SELECT user_id, count(*) AS n_hours,
             |    CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS active_hours,
             |    CAST(sum(n) AS BIGINT) AS n_events
             |  FROM g GROUP BY 1
             |)
             |SELECT census.user_id, n_hours, active_hours, n_events,
             |  CAST(COALESCE(mg.max_gap, 0) AS BIGINT) AS max_gap
             |FROM census LEFT JOIN mg USING (user_id)
             |ORDER BY census.user_id""".stripMargin)),

    QueryDef("q121_chi2_independence",
      "Pearson chi-square independence screen (event_type x props-k bucket)",
      // Contingency.chiSquare: one data-sized cell agg, category-bounded
      // marginals broadcast back, per-cell (o-e)^2/e floored to the 1e-6
      // grid before the sum. k extraction regex-pinned like q99 so cast
      // semantics can't diverge.
      (s, dir) => {
        val e = table(s, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").as("k_str"))
          .filter(col("k_str").rlike("^-?\\d+$"))
          .select(col("event_type"),
            expr("CAST(k_str AS BIGINT) div 10").as("k_bucket"))
        graft.operators.Contingency.chiSquare(e, col("event_type"),
          col("k_bucket"))
      },
      Some("""|WITH base AS (
             |  SELECT event_type,
             |    CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket
             |  FROM events
             |  WHERE regexp_matches(json_extract_string(props, '$.k'), '^-?\d+$')
             |), cells AS (
             |  SELECT event_type AS a, k_bucket AS b, count(*) AS o
             |  FROM base GROUP BY 1, 2
             |), rt AS (SELECT a, sum(o) AS rt FROM cells GROUP BY 1),
             |ct AS (SELECT b, sum(o) AS ct FROM cells GROUP BY 1),
             |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
             |dims AS (
             |  SELECT (SELECT count(*) FROM rt) AS n_rows,
             |         (SELECT count(*) FROM ct) AS n_cols
             |), s AS (
             |  SELECT CAST(floor(
             |    (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             |    * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             |    * 1000000.0) AS BIGINT) AS c_e6, n
             |  FROM cells JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot
             |)
             |SELECT max(n) AS n,
             |  CAST(d.n_rows AS BIGINT) AS n_rows, CAST(d.n_cols AS BIGINT) AS n_cols,
             |  CAST((d.n_rows - 1) * (d.n_cols - 1) AS BIGINT) AS dof,
             |  round(CAST(sum(c_e6) AS DOUBLE) / 1000000.0, 6) AS chi2
             |FROM s CROSS JOIN dims d
             |GROUP BY d.n_rows, d.n_cols""".stripMargin)),

    QueryDef("q123_cdc_compaction",
      "changelog compaction to latest state per key with tombstone deletes",
      // Compaction.compactLatest: one max(struct)-aggregate shuffle (keys
      // on the wire, not versions — a window row_number would sort every
      // hot key's update history in one task). events replayed as a
      // change stream keyed by user: latest (ts, event_id) wins; a
      // trailing 'error' event tombstones the key.
      (s, dir) => {
        val e = table(s, dir, "events")
        graft.operators.Compaction.compactLatest(e,
            keys = Seq("user_id"), version = Seq("ts", "event_id"),
            payload = Seq("event_type", "value"),
            tombstone = col("last.event_type") === "error")
          .select(col("user_id"), col("last.ts").as("last_ts"),
            col("last.event_type").as("last_event_type"),
            col("last.value").as("last_value"), col("n_versions"))
          .orderBy("user_id")
      },
      Some("""|WITH ranked AS (
             |  SELECT user_id, epoch_ns(ts) AS ts_ns, event_type, value,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts DESC, event_id DESC) AS rn,
             |    count(*) OVER (PARTITION BY user_id) AS n_versions
             |  FROM events
             |)
             |SELECT user_id, ts_ns AS last_ts, event_type AS last_event_type,
             |  value AS last_value, CAST(n_versions AS BIGINT) AS n_versions
             |FROM ranked WHERE rn = 1 AND event_type <> 'error'
             |ORDER BY user_id""".stripMargin)),

    QueryDef("q124_behavior_bigrams",
      "behavioral event-sequence bigrams (per-user lag window, global top transitions)",
      // the sequence-mining primitive: per-user histories sort in
      // parallel (the window partitions by user and carries only the type
      // column), transition counts collapse through map-side partials to
      // the |types|^2-bounded table, final TakeOrdered is bounded
      (s, dir) => {
        val e = table(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        e.select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy("prev_type", "event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("prev_type"), col("event_type"))
          .limit(20)
      },
      Some("""|WITH lagged AS (
             |  SELECT user_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev_type
             |  FROM events
             |)
             |SELECT prev_type, event_type, count(*) AS n
             |FROM lagged WHERE prev_type IS NOT NULL
             |GROUP BY 1, 2
             |ORDER BY n DESC, prev_type, event_type LIMIT 20""".stripMargin)),

    QueryDef("q125_bloom_pruned_join",
      "Bloom semi-join reduction (broadcast bitset prunes the fact side pre-shuffle)",
      // BloomJoin.bloomPrunedEquiJoin: the certified value is equality
      // with the plain join — no false negatives by construction, false
      // positives die in the join — so the oracle needs no bloom model.
      // Small side: large parts only (p_size >= 40, ~22% of keys).
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val bigParts = table(s, dir, "part")
          .filter(col("p_size") >= 40)
          .select("p_partkey", "p_brand")
        graft.operators.BloomJoin.bloomPrunedEquiJoin(li, bigParts,
            "l_partkey", "p_partkey")
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("revenue"))
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, count(*) AS n_items,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_size >= 40
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q128_fk_audit",
      "referential-integrity audit across the star schema (orphan counts per FK)",
      // Profiler.fkAudit: one scan + one anti-null-count left join per
      // relationship (dim parents broadcast; the lineitem->orders audit
      // shuffles once on the key). events.user_id -> customer is the
      // deliberately-broken relationship (synthetic user ids are not
      // customer keys), exercising the nonzero-orphan path.
      (s, dir) => graft.operators.Profiler.fkAudit(Seq(
        ("customer.nation", table(s, dir, "customer"), "c_nationkey",
          table(s, dir, "nation"), "n_nationkey"),
        ("events.user_customer", table(s, dir, "events"), "user_id",
          table(s, dir, "customer"), "c_custkey"),
        ("lineitem.orders", table(s, dir, "lineitem"), "l_orderkey",
          table(s, dir, "orders"), "o_orderkey"),
        ("lineitem.part", table(s, dir, "lineitem"), "l_partkey",
          table(s, dir, "part"), "p_partkey"),
        ("orders.customer", table(s, dir, "orders"), "o_custkey",
          table(s, dir, "customer"), "c_custkey"))),
      Some("""|SELECT * FROM (
             |  SELECT 'customer.nation' AS relationship, count(*) AS n_child,
             |    CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
             |    round(CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS orphan_frac
             |  FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
             |    ON c.c_nationkey = n.n_nationkey
             |  UNION ALL
             |  SELECT 'events.user_customer', count(*),
             |    CAST(sum(CASE WHEN cu.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    round(CAST(sum(CASE WHEN cu.c_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             |  FROM events e LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) cu
             |    ON e.user_id = cu.c_custkey
             |  UNION ALL
             |  SELECT 'lineitem.orders', count(*),
             |    CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    round(CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             |    ON l.l_orderkey = o.o_orderkey
             |  UNION ALL
             |  SELECT 'lineitem.part', count(*),
             |    CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    round(CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             |  FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
             |    ON l.l_partkey = p.p_partkey
             |  UNION ALL
             |  SELECT 'orders.customer', count(*),
             |    CAST(sum(CASE WHEN cu.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    round(CAST(sum(CASE WHEN cu.c_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) cu
             |    ON o.o_custkey = cu.c_custkey
             |) ORDER BY relationship""".stripMargin)),

    QueryDef("q129_table_profile",
      "per-column table profile on the canonical long grid (rows/nulls/distincts/min/max)",
      // Profiler.profile: one column-pruned scan + two-level aggregate
      // per column (map-side collapse to the distinct set — no
      // countDistinct pair expansion). Doubles floor(x1000), strings by
      // length, event time as nanos: integer grids are engine-stable
      // where double->string formatting is not.
      (s, dir) => {
        val e = table(s, dir, "events")
        graft.operators.Profiler.profile(e, Seq(
          "event_id" -> col("event_id"),
          "event_type_len" -> length(col("event_type")),
          "props_len" -> length(col("props")),
          "ts" -> col("ts"),
          "user_id" -> col("user_id"),
          "value_milli" -> floor(col("value") * 1000)))
      },
      Some("""|WITH src AS (
             |  SELECT event_id, length(event_type) AS event_type_len,
             |    length(props) AS props_len, epoch_ns(ts) AS ts, user_id,
             |    CAST(floor(value * 1000) AS BIGINT) AS value_milli
             |  FROM events
             |)
             |SELECT * FROM (
             |  SELECT 'event_id' AS col_name, count(*) AS n,
             |    count(*) - count(event_id) AS n_null,
             |    count(DISTINCT event_id) AS n_distinct,
             |    min(event_id) AS min_scaled, max(event_id) AS max_scaled
             |  FROM src
             |  UNION ALL
             |  SELECT 'event_type_len', count(*), count(*) - count(event_type_len),
             |    count(DISTINCT event_type_len),
             |    CAST(min(event_type_len) AS BIGINT), CAST(max(event_type_len) AS BIGINT)
             |  FROM src
             |  UNION ALL
             |  SELECT 'props_len', count(*), count(*) - count(props_len),
             |    count(DISTINCT props_len),
             |    CAST(min(props_len) AS BIGINT), CAST(max(props_len) AS BIGINT)
             |  FROM src
             |  UNION ALL
             |  SELECT 'ts', count(*), count(*) - count(ts), count(DISTINCT ts),
             |    min(ts), max(ts)
             |  FROM src
             |  UNION ALL
             |  SELECT 'user_id', count(*), count(*) - count(user_id),
             |    count(DISTINCT user_id), min(user_id), max(user_id)
             |  FROM src
             |  UNION ALL
             |  SELECT 'value_milli', count(*), count(*) - count(value_milli),
             |    count(DISTINCT value_milli), min(value_milli), max(value_milli)
             |  FROM src
             |) ORDER BY col_name""".stripMargin)),

    QueryDef("q131_time_weighted_avg",
      "per-user time-weighted average (step-function hold, exact integer weighting)",
      // the sensor/feature-store aggregate: each value holds until the
      // next event; weights are exact (value-milli x dt-nanos) products
      // summed in DECIMAL(38,0) — addition order can't move an ulp; ONE
      // double chain at the end. Per-user lag sort parallelizes across
      // users; single-event users have no span and are excluded by
      // construction (both engines agree).
      (s, dir) => {
        val e = table(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        e.select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 1000).cast("long").as("vm"))
          .withColumn("next_ts", lead("ts", 1).over(w))
          .filter(col("next_ts").isNotNull)
          .withColumn("wdec", col("vm").cast("decimal(38,0)") *
            (col("next_ts") - col("ts")).cast("decimal(38,0)"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_intervals"),
            sum("wdec").cast("decimal(38,0)").as("wsum"),
            (max("next_ts") - min("ts")).as("span_ns"))
          .select(col("user_id"), col("n_intervals"), col("span_ns"),
            round(col("wsum").cast("double") / col("span_ns").cast("double")
              / lit(1000.0), 6).as("twa"))
          .orderBy("user_id")
      },
      Some("""|WITH stepped AS (
             |  SELECT user_id, epoch_ns(ts) AS ts_ns,
             |    CAST(floor(value * 1000) AS BIGINT) AS vm,
             |    lead(epoch_ns(ts)) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS next_ns
             |  FROM events
             |), weighted AS (
             |  SELECT user_id, ts_ns, next_ns,
             |    CAST(vm AS HUGEINT) * CAST(next_ns - ts_ns AS HUGEINT) AS w
             |  FROM stepped WHERE next_ns IS NOT NULL
             |)
             |SELECT user_id, count(*) AS n_intervals,
             |  CAST(max(next_ns) - min(ts_ns) AS BIGINT) AS span_ns,
             |  round(CAST(sum(w) AS DOUBLE) / CAST(max(next_ns) - min(ts_ns) AS DOUBLE)
             |    / 1000.0, 6) AS twa
             |FROM weighted GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    QueryDef("q132_ship_latency",
      "order-to-ship latency stats per priority (timestamp arithmetic on date columns)",
      // exercises the non-`ts` timestamp columns (o_orderdate/l_shipdate
      // arrive as TIMESTAMP_NTZ): day deltas via exact integer
      // micros div, avg on the day grid with one trailing double chain.
      // The orderkey join shuffles both fact sides once; stats collapse
      // map-side to |priorities| rows.
      (s, dir) => {
        val li = table(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_shipdate"))
        val o = table(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderdate"), col("o_orderpriority"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority"),
            expr("(unix_micros(CAST(l_shipdate AS TIMESTAMP)) - unix_micros(CAST(o_orderdate AS TIMESTAMP))) div 86400000000")
              .as("lat_days"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            min("lat_days").as("min_days"), max("lat_days").as("max_days"),
            round(sum("lat_days").cast("double") / count(lit(1)).cast("double"),
              6).as("avg_days"))
          .orderBy("o_orderpriority")
      },
      Some("""|WITH j AS (
             |  SELECT o_orderpriority,
             |    (epoch_us(l_shipdate) - epoch_us(o_orderdate)) // 86400000000
             |      AS lat_days
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |)
             |SELECT o_orderpriority, count(*) AS n,
             |  min(lat_days) AS min_days, max(lat_days) AS max_days,
             |  round(CAST(sum(lat_days) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             |    AS avg_days
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q133_market_basket",
      "market-basket association rules (co-occurrence lift on a pure integer grid)",
      // Association.liftPairs over order baskets: basket-bounded pair
      // quadratic, ReusedExchange on the distinct frame, lift ranked on
      // floor(c_ab*n*1e6 div c_a*c_b) — no doubles anywhere.
      (s, dir) => graft.operators.Association.liftPairs(
        table(s, dir, "lineitem"),
        basketCol = col("l_orderkey"), itemCol = col("l_partkey"),
        minPairCount = 3L, topK = 20),
      Some("""|WITH items AS (
             |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
             |), pc AS (
             |  SELECT a.i AS item_a, b.i AS item_b, count(*) AS c_ab
             |  FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
             |  GROUP BY 1, 2 HAVING count(*) >= 3
             |), ic AS (
             |  SELECT i, count(*) AS c FROM items GROUP BY 1
             |), nb AS (
             |  SELECT count(DISTINCT b) AS n_baskets FROM items
             |)
             |SELECT item_a, item_b, n_baskets, ia.c AS c_a, ib.c AS c_b, c_ab,
             |  CAST(CAST(c_ab AS HUGEINT) * n_baskets * 1000000
             |       // (CAST(ia.c AS HUGEINT) * ib.c) AS BIGINT) AS lift_e6
             |FROM pc
             |JOIN ic ia ON pc.item_a = ia.i
             |JOIN ic ib ON pc.item_b = ib.i
             |CROSS JOIN nb
             |ORDER BY lift_e6 DESC, item_a, item_b LIMIT 20""".stripMargin)),

    QueryDef("q134_pivot_event_matrix",
      "PIVOT: per-user-decile event-type count matrix (wide-format export)",
      // RelationalGroupedDataset.pivot with EXPLICIT pivot values — the
      // values-discovery scan is skipped (at 100 TB the implicit form
      // fires an extra distinct job) and the output schema is stable.
      // Compiles to one hash aggregate with |values| conditional counts.
      (s, dir) => {
        val e = table(s, dir, "events")
        e.select(expr("user_id div 10").as("user_decile"), col("event_type"))
          .groupBy("user_decile")
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("user_decile")
      },
      Some("""|SELECT user_id // 10 AS user_decile,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q135_set_operations",
      "INTERSECT / EXCEPT set algebra over customer key sets",
      // set operators compile to aggregate/join shapes (distinct +
      // left-semi/anti under the hood); certified over the customer key
      // universes of two order-priority slices
      (s, dir) => {
        val o = table(s, dir, "orders")
        def keysFor(p: String) =
          o.filter(col("o_orderpriority") === p).select(col("o_custkey"))
        val urgent = keysFor("1-URGENT")
        val high = keysFor("2-HIGH")
        val both = urgent.intersect(high)
          .agg(count(lit(1)).as("n")).select(lit("both").as("set_op"), col("n"))
        val onlyUrgent = urgent.except(high)
          .agg(count(lit(1)).as("n")).select(lit("only_urgent").as("set_op"), col("n"))
        val either = urgent.union(high).distinct()
          .agg(count(lit(1)).as("n")).select(lit("either").as("set_op"), col("n"))
        both.union(onlyUrgent).union(either).orderBy("set_op")
      },
      Some("""|WITH u AS (
             |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |), h AS (
             |  SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
             |)
             |SELECT * FROM (
             |  SELECT 'both' AS set_op,
             |    (SELECT count(*) FROM (SELECT o_custkey FROM u INTERSECT SELECT o_custkey FROM h)) AS n
             |  UNION ALL
             |  SELECT 'either',
             |    (SELECT count(*) FROM (SELECT o_custkey FROM u UNION SELECT o_custkey FROM h))
             |  UNION ALL
             |  SELECT 'only_urgent',
             |    (SELECT count(*) FROM (SELECT o_custkey FROM u EXCEPT SELECT o_custkey FROM h))
             |) ORDER BY set_op""".stripMargin)),

    QueryDef("q136_value_decile_bins",
      "equi-depth decile binning (ntile) with per-bin stats on the milli grid",
      // feature-discretization primitive: ntile is deterministic once the
      // order is total (value-milli, event_id tiebreak); per-type sorts
      // parallelize across types; bin stats collapse to |types| x 10 rows
      (s, dir) => {
        val e = table(s, dir, "events")
        val w = Window.partitionBy("event_type")
          .orderBy(col("vm"), col("event_id"))
        e.select(col("event_type"), col("event_id"),
            floor(col("value") * 1000).cast("long").as("vm"))
          .withColumn("decile", ntile(10).over(w))
          .groupBy("event_type", "decile")
          .agg(count(lit(1)).as("n"), min("vm").as("vm_min"),
            max("vm").as("vm_max"))
          .orderBy("event_type", "decile")
      },
      Some("""|WITH v AS (
             |  SELECT event_type, event_id,
             |    CAST(floor(value * 1000) AS BIGINT) AS vm
             |  FROM events
             |), binned AS (
             |  SELECT event_type, vm,
             |    ntile(10) OVER (PARTITION BY event_type ORDER BY vm, event_id)
             |      AS decile
             |  FROM v
             |)
             |SELECT event_type, decile, count(*) AS n,
             |  min(vm) AS vm_min, max(vm) AS vm_max
             |FROM binned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("q137_above_mean_screen",
      "strictly-above-group-mean screen on exact integers (no double mean anywhere)",
      // the decorrelated 'x > avg(x) over group' shape, made engine-exact:
      // compare c_milli * n > sum_milli (cross-multiplied integers) so no
      // double mean is ever computed — a windowed double avg's addition
      // order could flip boundary rows between engines
      (s, dir) => {
        val c = table(s, dir, "customer")
          .select(col("c_nationkey"),
            floor(col("c_acctbal") * 1000).cast("long").as("bm"))
        val w = Window.partitionBy("c_nationkey")
        c.withColumn("n_cust", count(lit(1)).over(w))
          .withColumn("sum_bm", sum("bm").over(w))
          .groupBy("c_nationkey")
          .agg(max("n_cust").as("n_customers"),
            sum(when(col("bm") * col("n_cust") > col("sum_bm"), 1L)
              .otherwise(0L)).as("n_above_mean"))
          .orderBy("c_nationkey")
      },
      Some("""|WITH b AS (
             |  SELECT c_nationkey, CAST(floor(c_acctbal * 1000) AS BIGINT) AS bm,
             |    count(*) OVER (PARTITION BY c_nationkey) AS n_cust,
             |    sum(CAST(floor(c_acctbal * 1000) AS BIGINT))
             |      OVER (PARTITION BY c_nationkey) AS sum_bm
             |  FROM customer
             |)
             |SELECT c_nationkey, CAST(max(n_cust) AS BIGINT) AS n_customers,
             |  CAST(sum(CASE WHEN bm * n_cust > sum_bm THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_above_mean
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q139_winsorized_stats",
      "nearest-rank winsorization census per event type (outlier capping on the milli grid)",
      // Quantiles.winsorizeCensus: bounds are ELEMENTS of the data
      // (nearest-rank — deterministic under ties), one ranked pass with
      // the bounds broadcast by an unbounded window, exact long sums
      (s, dir) => graft.operators.Quantiles.winsorizeCensus(
        table(s, dir, "events"), "event_type",
        floor(col("value") * 1000), lo = 0.05, hi = 0.95),
      Some("""|WITH v AS (
             |  SELECT event_type AS g, CAST(floor(value * 1000) AS BIGINT) AS vm
             |  FROM events
             |), r AS (
             |  SELECT g, vm,
             |    row_number() OVER (PARTITION BY g ORDER BY vm) AS rn,
             |    count(*) OVER (PARTITION BY g) AS n
             |  FROM v
             |), b AS (
             |  SELECT g, vm, rn, n,
             |    greatest(CAST(ceil(0.05 * n) AS BIGINT), 1) AS lo_t,
             |    greatest(CAST(ceil(0.95 * n) AS BIGINT), 1) AS hi_t
             |  FROM r
             |), w AS (
             |  SELECT g, vm, n,
             |    max(CASE WHEN rn = lo_t THEN vm END) OVER (PARTITION BY g) AS lo_vm,
             |    max(CASE WHEN rn = hi_t THEN vm END) OVER (PARTITION BY g) AS hi_vm
             |  FROM b
             |)
             |SELECT g AS event_type, count(*) AS n,
             |  max(lo_vm) AS lo_vm, max(hi_vm) AS hi_vm,
             |  CAST(sum(CASE WHEN vm < lo_vm THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
             |  CAST(sum(CASE WHEN vm > hi_vm THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
             |  CAST(sum(greatest(least(vm, hi_vm), lo_vm)) AS BIGINT) AS winsorized_sum
             |FROM w GROUP BY g ORDER BY g""".stripMargin)),

    QueryDef("q140_user_trends",
      "per-user activity trend (exact-integer least-squares slope of value vs hour)",
      // the zipf-regression idiom on event streams: x = hours since the
      // user's first event (min-window), y = value-milli; all four
      // regression sums are exact longs (order-free), ONE double division
      // at the end. Users seen in a single hour have a degenerate
      // denominator and are excluded by max(x) > 0 — a condition both
      // engines evaluate on exact integers.
      (s, dir) => {
        val e = table(s, dir, "events")
        val base = e.select(col("user_id"),
          expr("ts div 3600000000000").as("h"),
          floor(col("value") * 1000).cast("long").as("y"))
        val withX = base.withColumn("x",
          col("h") - min("h").over(Window.partitionBy("user_id")))
        val sums = withX.groupBy("user_id")
          .agg(count(lit(1)).as("n"), max("x").as("mx"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .filter(col("mx") > 0L)
        sums.select(col("user_id"), col("n"),
            round(((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")) /
              ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")), 6)
              .as("slope_milli_per_hour"))
          .orderBy("user_id")
      },
      Some("""|WITH base AS (
             |  SELECT user_id, epoch_ns(ts) // 3600000000000 AS h,
             |    CAST(floor(value * 1000) AS BIGINT) AS y
             |  FROM events
             |), wx AS (
             |  SELECT user_id, h - min(h) OVER (PARTITION BY user_id) AS x, y
             |  FROM base
             |), sums AS (
             |  SELECT user_id, count(*) AS n, max(x) AS mx,
             |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
             |  FROM wx GROUP BY 1
             |)
             |SELECT user_id, CAST(n AS BIGINT) AS n,
             |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
             |        CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_milli_per_hour
             |FROM sums WHERE mx > 0
             |ORDER BY user_id""".stripMargin)),

    QueryDef("q304_blame_suppliers",
      "sole-late-supplier blame analysis (the TPC-H Q21 plan shape on this schema)",
      // the classic multi-way EXISTS / NOT EXISTS optimizer stress: count,
      // per supplier, the multi-supplier orders where THAT supplier's item
      // shipped late (> 60 days after order date) while no other
      // supplier's did. Spark-first: both quantifiers become JOINS on the
      // order key — a left-semi against "some other supplier in this
      // order" and a left-anti against "some other supplier ALSO late" —
      // so the whole question runs as three co-partitioned passes over
      // lineitem on one join key, not correlated per-row subqueries.
      (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = table(s, dir, "orders")
          .select(col("o_orderkey"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("odu"))
        val late = table(s, dir, "lineitem")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
            "> odu + 5184000000000")) // 60 days in micros
          .select(col("l_orderkey"), col("l_suppkey")).distinct()
        val l1 = late.as("l1")
        val others = li.select(col("l_orderkey").as("ok"),
          col("l_suppkey").as("sk")).distinct()
        val otherSupp = l1.join(others,
          col("l1.l_orderkey") === col("ok") &&
            col("l1.l_suppkey") =!= col("sk"), "left_semi")
        val otherLate = late.select(col("l_orderkey").as("ok2"),
          col("l_suppkey").as("sk2"))
        val blamed = otherSupp.join(otherLate,
          col("l_orderkey") === col("ok2") &&
            col("l_suppkey") =!= col("sk2"), "left_anti")
        blamed.join(table(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_suppkey"), col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_suppkey"))
          .limit(20)
      },
      Some("""|WITH late AS (
             |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
             |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
             |  WHERE epoch_us(l.l_shipdate)
             |    > epoch_us(o.o_orderdate) + 5184000000000
             |)
             |SELECT s.s_suppkey, s.s_name, count(*) AS numwait
             |FROM late l1
             |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
             |WHERE EXISTS (
             |    SELECT 1 FROM lineitem l2
             |    WHERE l2.l_orderkey = l1.l_orderkey
             |      AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (
             |    SELECT 1 FROM late l3
             |    WHERE l3.l_orderkey = l1.l_orderkey
             |      AND l3.l_suppkey <> l1.l_suppkey)
             |GROUP BY 1, 2
             |ORDER BY numwait DESC, s.s_suppkey
             |LIMIT 20""".stripMargin)),

    QueryDef("q305_top_supplier",
      "top supplier by windowed revenue, exact max-tie semantics (the TPC-H Q15 view shape)",
      // Q15's view-plus-correlated-max shape: a revenue view over a fixed
      // 3-month ship window, then EVERY supplier whose revenue equals the
      // view's max (ties kept — the part naive top-1 gets wrong). The max
      // rides a 1-row broadcast cross join against the view, so the view
      // computes ONCE (pinned) instead of once per side of the compare.
      (s, dir) => {
        import graft.operators.Checkpoints.Pinnable
        val rev = table(s, dir, "lineitem")
          .filter(expr("l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
            "l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"))
          .groupBy(col("l_suppkey"))
          .agg(sum(expr("CAST(round(l_extendedprice * " +
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)"))
            .as("rev_c2"))
          .pin
        val mx = rev.agg(max("rev_c2").as("mx"))
        rev.crossJoin(broadcast(mx))
          .filter(col("rev_c2") === col("mx"))
          .join(table(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("rev_c2"))
          .orderBy("s_suppkey")
      },
      Some("""|WITH rev AS (
             |  SELECT l_suppkey,
             |    CAST(sum(CAST(round(l_extendedprice *
             |      (100 - CAST(round(l_discount * 100) AS BIGINT)))
             |      AS BIGINT)) AS BIGINT) AS rev_c2
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
             |  GROUP BY 1
             |)
             |SELECT s.s_suppkey, s.s_name, r.rev_c2
             |FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
             |WHERE r.rev_c2 = (SELECT max(rev_c2) FROM rev)
             |ORDER BY s.s_suppkey""".stripMargin)))
}
