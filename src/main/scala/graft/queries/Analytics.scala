package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import QueryDef.table
import graft.operators.{Compaction, Graph}

/** Warehouse/analytics operators beyond the core relational set: temporal
  * dimension builds (SCD Type-2, MERGE upsert), graph analytics (triangle
  * census, integer-grid PageRank), and growth accounting. Every query
  * carries an exact DuckDB oracle — iterative/float-adjacent math runs on
  * integer grids so both engines produce identical bits.
  */
object Analytics {

  private val PrScale = 1000000000000L

  /** One unrolled PageRank iteration for the DuckDB oracle — replays
    * [[Graph.pageRankScaled]]'s exact integer recurrence. */
  private def prIterSql(k: Int): String =
    s"""r$k AS (
       |  SELECT de.dst AS v,
       |    (15 * $PrScale) // (100 * nn.cnt)
       |      + (85 * sum(pr.r // dg.deg)) // 100 AS r
       |  FROM dirE de
       |  JOIN r${k - 1} pr ON de.src = pr.v
       |  JOIN deg dg ON de.src = dg.src
       |  CROSS JOIN nn
       |  GROUP BY de.dst, nn.cnt
       |)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q141_scd2_intervals",
      "SCD Type-2 validity intervals from a change log (lead-window interval build)",
      // Compaction.scdType2 over events-as-CDC: one user shuffle + per-key
      // sort (the irreducible interval-build shape). The user filter is a
      // pushed-down scan predicate and per-key results are independent of
      // it. Output pinned row-level (every interval boundary checked).
      (s, dir) => {
        val e = table(s, dir, "events")
          .filter(col("user_id") % 20 === 0)
          .select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 1000).cast("long").as("vm"))
        Compaction.scdType2(e, keys = Seq("user_id"), orderCol = "ts",
            tieCol = "event_id", payload = Seq("vm"))
          .select(col("user_id"), col("event_id"), col("valid_from"),
            col("valid_to"), col("vm"), col("is_current"))
          .orderBy("user_id", "valid_from", "event_id")
      },
      Some("""|WITH f AS (
             |  SELECT user_id, event_id, epoch_ns(ts) AS t,
             |    CAST(floor(value * 1000) AS BIGINT) AS vm
             |  FROM events WHERE user_id % 20 = 0
             |), iv AS (
             |  SELECT user_id, event_id, t AS valid_from,
             |    lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
             |      AS valid_to,
             |    vm
             |  FROM f
             |)
             |SELECT user_id, event_id, valid_from, valid_to, vm,
             |  CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
             |FROM iv ORDER BY user_id, valid_from, event_id""".stripMargin)),

    QueryDef("q142_merge_upsert",
      "MERGE INTO semantics: compacted CDC delta applied to a snapshot (insert/update/delete/keep)",
      // Compaction.mergeUpsert: ONE full-outer key-shuffle join (the
      // merge-on-read shape; pair with write-time bucketing at scale).
      // The delta is events compacted to latest-per-user (q123's
      // max-struct idiom), shifted by +1400 so all four actions occur
      // against the 0-1499 customer snapshot: updates (1400-1499),
      // inserts (1500+), deletes (latest event = error), keeps (rest).
      (s, dir) => {
        val snap = table(s, dir, "customer")
          .select(col("c_custkey").as("key"),
            floor(col("c_acctbal") * 1000).cast("long").as("vm"))
        val delta = Compaction.compactLatest(table(s, dir, "events"),
            keys = Seq("user_id"), version = Seq("ts", "event_id"),
            payload = Seq("event_type", "value"), tombstone = lit(false))
          .select((col("user_id") + 1400).as("key"),
            floor(col("last.value") * 1000).cast("long").as("vm"),
            (col("last.event_type") === "error").as("is_del"))
        Compaction.mergeUpsert(snap, delta, keys = Seq("key"),
            isDelete = col("is_del"), payload = Seq("vm"))
          .filter(col("key") % 3 === 0)
          .orderBy("key")
      },
      Some("""|WITH ranked AS (
             |  SELECT user_id + 1400 AS key,
             |    CAST(floor(value * 1000) AS BIGINT) AS vm,
             |    (event_type = 'error') AS is_del,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events
             |), delta AS (
             |  SELECT key, vm, is_del FROM ranked WHERE rn = 1
             |), snap AS (
             |  SELECT c_custkey AS key,
             |    CAST(floor(c_acctbal * 1000) AS BIGINT) AS vm
             |  FROM customer
             |), merged AS (
             |  SELECT coalesce(d.key, s.key) AS key,
             |    coalesce(d.vm, s.vm) AS vm,
             |    CASE WHEN d.key IS NULL THEN 'kept'
             |         WHEN s.key IS NULL THEN 'inserted'
             |         ELSE 'updated' END AS action,
             |    coalesce(d.is_del, false) AS is_del
             |  FROM snap s FULL OUTER JOIN delta d ON s.key = d.key
             |)
             |SELECT key, vm, action FROM merged
             |WHERE NOT is_del AND key % 3 = 0 ORDER BY key""".stripMargin)),

    QueryDef("q143_triangle_census",
      "exact triangle census of the part co-purchase graph (degree-oriented wedge join)",
      // Graph.coOccurrenceEdges (in-row pair generation over single-digit
      // order baskets) -> Graph.triangleStats (degree-oriented wedges:
      // per-key fan-out bounded by O(sqrt(2m)) under any degree skew).
      // The oracle counts the same triangles via the naive a<b<c
      // three-way join — orientation must not change the answer.
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        Graph.triangleStats(
          Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"))
      },
      Some("""|WITH e AS (
             |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
             |  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
             |  WHERE x.l_partkey < y.l_partkey
             |), deg AS (
             |  SELECT v, count(*) AS deg FROM (
             |    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
             |  ) GROUP BY 1
             |), tri AS (
             |  SELECT count(*) AS t
             |  FROM e e1
             |  JOIN e e2 ON e2.a = e1.b
             |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
             |)
             |SELECT (SELECT count(*) FROM deg) AS n_nodes,
             |  (SELECT CAST(sum(deg) // 2 AS BIGINT) FROM deg) AS n_edges,
             |  (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) FROM deg)
             |    AS n_wedges,
             |  (SELECT t FROM tri) AS n_triangles,
             |  round(3.0 * (SELECT t FROM tri)
             |    / (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) FROM deg),
             |    6) AS clustering_coeff""".stripMargin)),

    QueryDef("q144_part_pagerank",
      "fixed-iteration PageRank over the co-purchase graph on an exact integer grid",
      // Graph.pageRankScaled: per iteration one src-keyed join + one
      // dst-keyed aggregation, ranks localCheckpoint'ed so the plan stays
      // iteration-sized. Every step is integer floor arithmetic, so the
      // oracle's five unrolled CTE iterations replay identical longs.
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        Graph.pageRankScaled(
            Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"),
            iters = 5, scale = PrScale)
          .orderBy("v")
      },
      Some(s"""|WITH e AS (
              |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              |  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
              |  WHERE x.l_partkey < y.l_partkey
              |), dirE AS (
              |  SELECT a AS src, b AS dst FROM e
              |  UNION ALL SELECT b AS src, a AS dst FROM e
              |), deg AS (
              |  SELECT src, count(*) AS deg FROM dirE GROUP BY 1
              |), nn AS (SELECT count(*) AS cnt FROM deg),
              |r0 AS (
              |  SELECT src AS v, $PrScale // nn.cnt AS r FROM deg CROSS JOIN nn
              |),
              |${(1 to 5).map(prIterSql).mkString(",\n")}
              |SELECT v, CAST(r AS BIGINT) AS rank_scaled
              |FROM r5 ORDER BY v""".stripMargin)),

    QueryDef("q145_retention_cohorts",
      "cohort retention matrix: first-activity cohort x day offset, distinct active users",
      // growth-accounting primitive. (user, day) is distinct-ed FIRST so
      // the cohort rollup is a plain count — the family's two-level
      // distinct idiom (rows shrink to user x active-day before any join).
      // The cohort join and the first-day aggregation share the user key,
      // so the final (cohort, offset) agg collapses map-side to a
      // days^2-bounded frame; retention_pct comes from a window over that
      // bounded frame, never a second scan.
      (s, dir) => {
        val day = 86400000000000L
        val act = table(s, dir, "events")
          .select(col("user_id"), expr(s"ts div $day").as("day"))
          .distinct()
        val first = act.groupBy("user_id").agg(min("day").as("cohort_day"))
        val cells = act.join(first, "user_id")
          .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
          .agg(count(lit(1)).as("n_active"))
        val w = Window.partitionBy("cohort_day")
        cells
          .withColumn("cohort_size",
            max(when(col("day_offset") === 0, col("n_active"))).over(w))
          .select(col("cohort_day"), col("day_offset"), col("n_active"),
            round(col("n_active").cast("double") / col("cohort_size").cast("double"), 6)
              .as("retention_pct"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""|WITH act AS (
             |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
             |  FROM events
             |), first AS (
             |  SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1
             |), cells AS (
             |  SELECT f.cohort_day, a.day - f.cohort_day AS day_offset,
             |    count(*) AS n_active
             |  FROM act a JOIN first f ON a.user_id = f.user_id
             |  GROUP BY 1, 2
             |), sized AS (
             |  SELECT cohort_day, day_offset, n_active,
             |    max(CASE WHEN day_offset = 0 THEN n_active END)
             |      OVER (PARTITION BY cohort_day) AS cohort_size
             |  FROM cells
             |)
             |SELECT cohort_day, day_offset, n_active,
             |  round(CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE), 6)
             |    AS retention_pct
             |FROM sized ORDER BY cohort_day, day_offset""".stripMargin)),

    QueryDef("q146_growth_accounting",
      "daily new vs returning users + cumulative acquired (running sum over the bounded day frame)",
      // new = users whose FIRST active day is d; returning = active - new.
      // Both sides reduce to day-keyed bounded frames before the join, and
      // the cumulative sum's unpartitioned window runs over |days| rows —
      // bounded by the calendar, not the data.
      (s, dir) => {
        val day = 86400000000000L
        val act = table(s, dir, "events")
          .select(col("user_id"), expr(s"ts div $day").as("day"))
          .distinct()
        val daily = act.groupBy("day").agg(count(lit(1)).as("n_active"))
        val news = act.groupBy("user_id").agg(min("day").as("day"))
          .groupBy("day").agg(count(lit(1)).as("n_new"))
        val w = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.join(news, Seq("day"), "left")
          .select(col("day"), col("n_active"),
            coalesce(col("n_new"), lit(0L)).as("n_new"))
          .withColumn("n_returning", col("n_active") - col("n_new"))
          .withColumn("cum_users", sum("n_new").over(w))
          .orderBy("day")
      },
      Some("""|WITH act AS (
             |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
             |  FROM events
             |), daily AS (
             |  SELECT day, count(*) AS n_active FROM act GROUP BY 1
             |), news AS (
             |  SELECT day, count(*) AS n_new FROM (
             |    SELECT user_id, min(day) AS day FROM act GROUP BY 1
             |  ) GROUP BY 1
             |)
             |SELECT d.day, d.n_active, coalesce(n.n_new, 0) AS n_new,
             |  d.n_active - coalesce(n.n_new, 0) AS n_returning,
             |  CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY d.day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
             |FROM daily d LEFT JOIN news n ON d.day = n.day
             |ORDER BY d.day""".stripMargin)),

    QueryDef("q147_ohlc_bars",
      "OHLC time bars per (event_type, hour) — open/close via the max-struct argmax idiom",
      // open/close are min/max(struct(ts, event_id, vm)): the q123
      // compaction idiom extended to bars — one hash aggregate with
      // map-side combine, no per-bar window sort (a row_number
      // formulation would shuffle and sort every event per bar). The
      // (ts, event_id) prefix is unique, so the struct order never
      // consults vm.
      (s, dir) => {
        val e = table(s, dir, "events")
          .select(col("event_type"), expr("ts div 3600000000000").as("h"),
            col("ts"), col("event_id"),
            floor(col("value") * 1000).cast("long").as("vm"))
        e.groupBy("event_type", "h")
          .agg(
            min(struct(col("ts"), col("event_id"), col("vm")))
              .getField("vm").as("open_vm"),
            max(struct(col("ts"), col("event_id"), col("vm")))
              .getField("vm").as("close_vm"),
            max("vm").as("high_vm"), min("vm").as("low_vm"),
            count(lit(1)).as("n"), sum("vm").as("sum_vm"))
          .orderBy("event_type", "h")
      },
      Some("""|WITH v AS (
             |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS h,
             |    epoch_ns(ts) AS t, event_id,
             |    CAST(floor(value * 1000) AS BIGINT) AS vm
             |  FROM events
             |), r AS (
             |  SELECT *,
             |    row_number() OVER (PARTITION BY event_type, h
             |      ORDER BY t, event_id) AS rna,
             |    row_number() OVER (PARTITION BY event_type, h
             |      ORDER BY t DESC, event_id DESC) AS rnd
             |  FROM v
             |)
             |SELECT event_type, h,
             |  max(CASE WHEN rna = 1 THEN vm END) AS open_vm,
             |  max(CASE WHEN rnd = 1 THEN vm END) AS close_vm,
             |  max(vm) AS high_vm, min(vm) AS low_vm,
             |  count(*) AS n, CAST(sum(vm) AS BIGINT) AS sum_vm
             |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QueryDef("q148_sorted_neighborhood",
      "sorted-neighborhood dedup candidates: per-block rank windows + edit-distance scoring",
      // EntityResolution.sortedNeighborhoodPairs — the SNM alternative to
      // block-quadratic candidate generation: window·n candidates via a
      // bounded explode + equi-join on (block, rank), one block shuffle.
      // Pairs are then scored with levenshtein over 40-char prefixes
      // (Java and RE2-engine levenshtein agree — the q130 contract).
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val pairs = graft.text.EntityResolution.sortedNeighborhoodPairs(
            docs, col("doc_id"),
            concat_ws("|", col("lang"), col("source")), col("n_chars"),
            window = 3)
          .select(col("block"), col("id_a").as("doc_a"),
            col("id_b").as("doc_b"), col("gap"))
        pairs
          .join(docs.select(col("doc_id").as("doc_a"),
            substring(col("text"), 1, 40).as("ta")), "doc_a")
          .join(docs.select(col("doc_id").as("doc_b"),
            substring(col("text"), 1, 40).as("tb")), "doc_b")
          .select(col("block"), col("doc_a"), col("doc_b"), col("gap"),
            levenshtein(col("ta"), col("tb")).as("lev40"))
          .orderBy("block", "doc_a", "doc_b")
      },
      Some("""|WITH ranked AS (
             |  SELECT doc_id, lang || '|' || source AS block, n_chars,
             |    row_number() OVER (PARTITION BY lang || '|' || source
             |      ORDER BY n_chars, doc_id) AS rnk
             |  FROM documents
             |), pairs AS (
             |  SELECT a.block, a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    b.rnk - a.rnk AS gap
             |  FROM ranked a JOIN ranked b ON a.block = b.block
             |    AND b.rnk BETWEEN a.rnk + 1 AND a.rnk + 3
             |)
             |SELECT p.block, p.doc_a, p.doc_b, CAST(p.gap AS INT) AS gap,
             |  levenshtein(substr(da.text, 1, 40), substr(db.text, 1, 40))
             |    AS lev40
             |FROM pairs p
             |JOIN documents da ON p.doc_a = da.doc_id
             |JOIN documents db ON p.doc_b = db.doc_id
             |ORDER BY p.block, p.doc_a, p.doc_b""".stripMargin)),

    QueryDef("q149_centroid_similarity",
      "pairwise label-centroid cosine matrix on the exact integer micro grid",
      // embedding analytics without an all-pairs vector join: per-(label,
      // dim) SUMS are exact longs (float -> double widening is exact, then
      // floor to the micro grid), and centroid cosine == cosine of the
      // sum vectors (scale invariance), so no double mean is ever formed.
      // The pairwise join runs over the labels x dim bounded frame; dot
      // products accumulate in DECIMAL(38,0)/HUGEINT (sums overflow a
      // long at corpus scale), ONE double chain at the end.
      (s, dir) => {
        val el = table(s, dir, "embeddings")
          .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
          .select(col("label"), col("i"),
            floor(col("x").cast("double") * 1000000).cast("long").as("xm"))
        val sums = el.groupBy("label", "i")
          .agg(sum("xm").cast("decimal(38,0)").as("sv"))
        val dots = sums.as("a")
          .join(sums.as("b"),
            col("a.i") === col("b.i") && col("a.label") < col("b.label"))
          .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
          .agg(sum(col("a.sv") * col("b.sv")).as("dot"))
        val norms = sums.groupBy("label")
          .agg(sum(col("sv") * col("sv")).as("nrm"))
        dots
          .join(norms.select(col("label").as("label_a"), col("nrm").as("na")), "label_a")
          .join(norms.select(col("label").as("label_b"), col("nrm").as("nb")), "label_b")
          .select(col("label_a"), col("label_b"),
            round(col("dot").cast("double") /
              (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6)
              .as("cos_sim"))
          .orderBy("label_a", "label_b")
      },
      Some("""|WITH emb AS (
             |  SELECT label, embedding AS v FROM embeddings
             |), el AS (
             |  SELECT label, i,
             |    CAST(floor(CAST(v[i] AS DOUBLE) * 1000000) AS BIGINT) AS xm
             |  FROM emb CROSS JOIN (SELECT unnest(generate_series(1,
             |    (SELECT len(v) FROM emb LIMIT 1))) AS i) d
             |), sums AS (
             |  SELECT label, i, sum(xm) AS sv FROM el GROUP BY 1, 2
             |), dots AS (
             |  SELECT a.label AS label_a, b.label AS label_b,
             |    sum(a.sv * b.sv) AS dot
             |  FROM sums a JOIN sums b ON a.i = b.i AND a.label < b.label
             |  GROUP BY 1, 2
             |), norms AS (
             |  SELECT label, sum(sv * sv) AS nrm FROM sums GROUP BY 1
             |)
             |SELECT label_a, label_b,
             |  round(CAST(dot AS DOUBLE) /
             |    (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE))),
             |    6) AS cos_sim
             |FROM dots
             |JOIN norms na ON label_a = na.label
             |JOIN norms nb ON label_b = nb.label
             |ORDER BY label_a, label_b""".stripMargin)),

    QueryDef("q150_unpivot_metrics",
      "UNPIVOT/melt: wide per-type metrics to long (metric, value) form via stack()",
      // the wide->long export shape: stack() is a single Generate over the
      // already-bounded wide frame — no shuffle beyond the aggregation
      // that built it, and the metric names are pinned literals (schema
      // known without a discovery scan, the q134 PIVOT argument reversed)
      (s, dir) => {
        val e = table(s, dir, "events")
          .select(col("event_type"),
            floor(col("value") * 1000).cast("long").as("vm"))
        e.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("vm").as("sum_vm"),
            min("vm").as("min_vm"), max("vm").as("max_vm"))
          .select(col("event_type"),
            expr("stack(4, 'n', n, 'sum_vm', sum_vm, 'min_vm', min_vm, " +
              "'max_vm', max_vm) AS (metric, value)"))
          .orderBy("event_type", "metric")
      },
      Some("""|WITH wide AS (
             |  SELECT event_type, count(*) AS n,
             |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
             |      AS sum_vm,
             |    min(CAST(floor(value * 1000) AS BIGINT)) AS min_vm,
             |    max(CAST(floor(value * 1000) AS BIGINT)) AS max_vm
             |  FROM events GROUP BY 1
             |)
             |SELECT event_type, metric, value FROM (
             |  SELECT event_type, 'n' AS metric, n AS value FROM wide
             |  UNION ALL
             |  SELECT event_type, 'sum_vm', sum_vm FROM wide
             |  UNION ALL
             |  SELECT event_type, 'min_vm', min_vm FROM wide
             |  UNION ALL
             |  SELECT event_type, 'max_vm', max_vm FROM wide
             |)
             |ORDER BY event_type, metric""".stripMargin)),

    QueryDef("q151_lasttouch_attribution",
      "last-touch marketing attribution: purchases credited to the most recent prior touch within 24 h",
      // AsOf.asOfJoin (q87's union + carry-forward window — both sides
      // shuffle exactly ONCE, no join operator) matches each purchase to
      // the user's latest preceding click/view; the 24 h lookback and the
      // rollup compare at the shared MICRO grid (ts div 1000 == epoch_us)
      // so the nanos-vs-micros physical types can't disagree. Distinct
      // users via the two-level idiom, never countDistinct.
      (s, dir) => {
        val e = table(s, dir, "events")
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val touches = e.filter(col("event_type").isin("click", "view"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("event_type"))
        val j = graft.operators.AsOf.asOfJoin(purchases, touches,
          keys = Seq("user_id"), ordCol = "ts", tieCol = "event_id",
          rightPayload = Seq("event_type", "ts"))
        val credited = j.select(col("user_id"),
          when(col("asof_ts").isNotNull &&
            expr("(ts div 1000) - (asof_ts div 1000)") <= 86400000000L,
            col("asof_event_type")).otherwise(lit("unattributed"))
            .as("channel"))
        credited.groupBy("channel", "user_id")
          .agg(count(lit(1)).as("n"))
          .groupBy("channel")
          .agg(sum("n").as("n_purchases"), count(lit(1)).as("n_users"))
          .orderBy("channel")
      },
      Some("""|WITH p AS (
             |  SELECT event_id, user_id, ts FROM events
             |  WHERE event_type = 'purchase'
             |), t AS (
             |  SELECT event_id, user_id, ts, event_type FROM events
             |  WHERE event_type IN ('click', 'view')
             |), j AS (
             |  SELECT p.user_id,
             |    CASE WHEN t.event_id IS NOT NULL
             |           AND epoch_us(p.ts) - epoch_us(t.ts) <= 86400000000
             |         THEN t.event_type ELSE 'unattributed' END AS channel
             |  FROM p ASOF LEFT JOIN t
             |    ON p.user_id = t.user_id AND t.ts <= p.ts
             |), u AS (
             |  SELECT channel, user_id, count(*) AS n FROM j GROUP BY 1, 2
             |)
             |SELECT channel, CAST(sum(n) AS BIGINT) AS n_purchases,
             |  count(*) AS n_users
             |FROM u GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q152_rolling_actives",
      "DAU / trailing-7-day WAU / stickiness per day via bounded activity fan-out",
      // rolling distinct actives WITHOUT a distinct-over-range window:
      // each (user, active-day) row supports the next 7 calendar days, so
      // explode to ≤7 (user, day) support rows, distinct, count — every
      // exchange carries user×day-bounded rows and the fan-out constant is
      // the window length, independent of data volume. Stickiness =
      // DAU/WAU with one double division, rounded.
      (s, dir) => {
        val day = 86400000000000L
        val act = table(s, dir, "events")
          .select(col("user_id"), expr(s"ts div $day").as("day"))
          .distinct()
        val dau = act.groupBy("day").agg(count(lit(1)).as("n_dau"))
        val wau = act
          .select(col("user_id"),
            explode(sequence(col("day"), col("day") + 6)).as("day"))
          .distinct()
          .groupBy("day").agg(count(lit(1)).as("n_wau"))
        dau.join(wau, "day")
          .select(col("day"), col("n_dau"), col("n_wau"),
            round(col("n_dau").cast("double") / col("n_wau").cast("double"), 6)
              .as("stickiness"))
          .orderBy("day")
      },
      Some("""|WITH act AS (
             |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
             |  FROM events
             |), dau AS (
             |  SELECT day, count(*) AS n_dau FROM act GROUP BY 1
             |), sup AS (
             |  SELECT DISTINCT user_id, day + o.o AS day
             |  FROM act CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o) o
             |), wau AS (
             |  SELECT day, count(*) AS n_wau FROM sup GROUP BY 1
             |)
             |SELECT d.day, d.n_dau, w.n_wau,
             |  round(CAST(d.n_dau AS DOUBLE) / CAST(w.n_wau AS DOUBLE), 6)
             |    AS stickiness
             |FROM dau d JOIN wau w ON d.day = w.day
             |ORDER BY d.day""".stripMargin)),

    QueryDef("q154_sequence_patterns",
      "behavioral sequence-pattern census: per-user ordered event strings matched by regex",
      // the MATCH_RECOGNIZE-ish primitive: each user's history becomes an
      // ordered initial-letter string (per-user arrays are session-sized
      // and bounded — the one place the family's no-collect_list rule
      // yields to, documented as such), then pattern flags are plain
      // regexes both engines share (RE2-safe syntax: only `.` and `*`).
      // One user shuffle; the census collapses to a single row.
      (s, dir) => {
        val e = table(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("c"))
        val seqs = e.groupBy("user_id")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("c")))),
            x => x.getField("c")), "").as("seq"))
        seqs.agg(
          count(lit(1)).as("n_users"),
          sum(when(col("seq").rlike("v.*c.*p"), 1L).otherwise(0L))
            .as("n_view_click_buy"),
          sum(when(col("seq").rlike("s.*p"), 1L).otherwise(0L))
            .as("n_signup_buy"),
          sum(when(col("seq").contains("e"), 1L).otherwise(0L))
            .as("n_with_error"),
          sum(graft.text.TextAnalysis.substrCount(col("seq"), "vc"))
            .as("n_vc_adjacent"))
      },
      Some("""|WITH seqs AS (
             |  SELECT user_id,
             |    string_agg(substr(event_type, 1, 1), ''
             |      ORDER BY ts, event_id) AS seq
             |  FROM events GROUP BY user_id
             |)
             |SELECT count(*) AS n_users,
             |  CAST(sum(CASE WHEN regexp_matches(seq, 'v.*c.*p')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click_buy,
             |  CAST(sum(CASE WHEN regexp_matches(seq, 's.*p')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_buy,
             |  CAST(sum(CASE WHEN seq LIKE '%e%' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_with_error,
             |  CAST(sum((len(seq) - len(replace(seq, 'vc', ''))) // 2)
             |    AS BIGINT) AS n_vc_adjacent
             |FROM seqs""".stripMargin)),

    QueryDef("q155_activity_bitmaps",
      "per-user day-activity bitmaps (bit_or) + bitmap-segment census",
      // the bitmap-index segmentation idiom: 63 days of activity pack
      // into ONE long per user via shiftleft + bit_or (both engines share
      // exact two's-complement semantics), so any day-pattern segment
      // (day0 AND day7, popcount buckets) is a bitwise predicate on an
      // 8-byte column — no per-day join fan-out at query time. The day
      // origin is a 1-row broadcast, never a global window.
      (s, dir) => {
        val day = 86400000000000L
        val act = table(s, dir, "events")
          .select(col("user_id"), expr(s"ts div $day").as("day"))
          .distinct()
        val d0 = act.agg(min("day").as("d0"))
        val bitmaps = act.crossJoin(d0)
          .filter(col("day") - col("d0") < 63)
          .select(col("user_id"),
            expr("shiftleft(CAST(1 AS BIGINT), CAST(day - d0 AS INT))").as("bit"))
          .groupBy("user_id").agg(expr("bit_or(bit)").as("bm"))
        bitmaps
          .groupBy(expr("CAST(bit_count(bm) AS INT)").as("n_active_days"))
          .agg(count(lit(1)).as("n_users"),
            sum(when(expr("(bm & 1) = 1"), 1L).otherwise(0L))
              .as("n_active_day0"),
            sum(when(expr("(bm & 129) = 129"), 1L).otherwise(0L))
              .as("n_day0_and_day7"))
          .orderBy("n_active_days")
      },
      Some("""|WITH act AS (
             |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
             |  FROM events
             |), d0 AS (SELECT min(day) AS d0 FROM act),
             |bm AS (
             |  SELECT user_id,
             |    bit_or(1::BIGINT << CAST(day - d0 AS INT)) AS bm
             |  FROM act CROSS JOIN d0 WHERE day - d0 < 63
             |  GROUP BY user_id
             |)
             |SELECT CAST(bit_count(bm) AS INT) AS n_active_days,
             |  count(*) AS n_users,
             |  CAST(sum(CASE WHEN (bm & 1) = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_active_day0,
             |  CAST(sum(CASE WHEN (bm & 129) = 129 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_day0_and_day7
             |FROM bm GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q156_conversion_latency_quantiles",
      "view->purchase conversion latency quantiles per day (as-of + exact rank selection)",
      // composes two certified operators: AsOf.asOfJoin finds each
      // purchase's latest prior view (one union + carry-forward window),
      // Quantiles.exactQuantiles selects the p50/p90 order statistics by
      // global rank (range shuffle, bounded driver state — never a whole
      // group in one percentile buffer). Latencies compare at the shared
      // micro grid; the interpolation is the exact IEEE sequence the
      // oracle replays.
      (s, dir) => {
        val e = table(s, dir, "events")
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = e.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"))
        val j = graft.operators.AsOf.asOfJoin(purchases, views,
            keys = Seq("user_id"), ordCol = "ts", tieCol = "event_id",
            rightPayload = Seq("ts"))
          .filter(col("asof_ts").isNotNull)
          .select(expr("ts div 86400000000000").cast("string").as("day"),
            (expr("ts div 1000") - expr("asof_ts div 1000"))
              .cast("double").as("lat_us"))
        graft.operators.Quantiles.exactQuantiles(j, "day", "lat_us",
            Seq("p50" -> 0.5, "p90" -> 0.9), gridDecimals = Some(6))
          .orderBy("day")
      },
      Some("""|WITH p AS (
             |  SELECT event_id, user_id, ts FROM events
             |  WHERE event_type = 'purchase'
             |), vw AS (
             |  SELECT event_id, user_id, ts FROM events
             |  WHERE event_type = 'view'
             |), j AS (
             |  SELECT CAST(epoch_ns(p.ts) // 86400000000000 AS VARCHAR) AS g,
             |    CAST(epoch_us(p.ts) - epoch_us(vw.ts) AS DOUBLE) AS v
             |  FROM p ASOF JOIN vw
             |    ON p.user_id = vw.user_id AND vw.ts <= p.ts
             |), r AS (
             |  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) - 1 AS rk,
             |    count(*) OVER (PARTITION BY g) AS n
             |  FROM j
             |), sel AS (
             |  SELECT g, n,
             |    max(CASE WHEN rk = CAST(floor(0.5::DOUBLE * (n - 1)) AS BIGINT)
             |      THEN v END) AS lo50,
             |    max(CASE WHEN rk = least(CAST(floor(0.5::DOUBLE * (n - 1)) AS BIGINT) + 1, n - 1)
             |      THEN v END) AS hi50,
             |    max(CASE WHEN rk = CAST(floor(0.9::DOUBLE * (n - 1)) AS BIGINT)
             |      THEN v END) AS lo90,
             |    max(CASE WHEN rk = least(CAST(floor(0.9::DOUBLE * (n - 1)) AS BIGINT) + 1, n - 1)
             |      THEN v END) AS hi90
             |  FROM r GROUP BY g, n
             |)
             |SELECT g AS day,
             |  floor((lo50 + (hi50 - lo50) * (0.5::DOUBLE * (n - 1) - floor(0.5::DOUBLE * (n - 1)))) * 1e6 + 0.5) / 1e6 AS p50,
             |  floor((lo90 + (hi90 - lo90) * (0.9::DOUBLE * (n - 1) - floor(0.9::DOUBLE * (n - 1)))) * 1e6 + 0.5) / 1e6 AS p90
             |FROM sel ORDER BY day""".stripMargin)),

    QueryDef("q157_key_skew_report",
      "join-key skew diagnosis: frequency census + exact Gini concentration on the integer grid",
      // the pre-flight check before a big join: per-key frequencies
      // compress to the (frequency, multiplicity) frame — bounded by
      // DISTINCT frequency values, not keys — so the Gini rank sum uses a
      // closed form per run of equal frequencies (f·(m·s + m(m−1)/2))
      // and the only ordered window runs over that bounded frame. All
      // sums in DECIMAL(38,0)/HUGEINT; one double division for gini.
      (s, dir) => {
        val f = table(s, dir, "lineitem")
          .groupBy("l_partkey").agg(count(lit(1)).as("f"))
        val ff = f.groupBy("f").agg(count(lit(1)).as("m"))
        val w = Window.orderBy("f")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val terms = ff.withColumn("cum", sum("m").over(w))
          .select(col("f"), col("m"), (col("cum") - col("m") + 1).as("srank"))
        terms.agg(
            sum("m").as("nk"),
            sum((col("f") * col("m")).cast("decimal(38,0)")).as("nr"),
            max("f").as("max_count"),
            sum(col("f").cast("decimal(38,0)") *
              (col("m") * col("srank") + expr("m * (m - 1) div 2"))
                .cast("decimal(38,0)")).as("t"))
          .select(col("nk").as("n_keys"),
            col("nr").cast("long").as("n_rows"), col("max_count"),
            round((lit(2).cast("decimal(38,0)") * col("t") -
                (col("nk") + 1).cast("decimal(38,0)") * col("nr")).cast("double") /
              (col("nk").cast("decimal(38,0)") * col("nr")).cast("double"), 6)
              .as("gini"),
            expr("(max_count * 1000000) div CAST(nr AS BIGINT)")
              .as("top1_share_ppm"))
      },
      Some("""|WITH fr AS (
             |  SELECT l_partkey, count(*) AS f FROM lineitem GROUP BY 1
             |), ff AS (
             |  SELECT f, count(*) AS m FROM fr GROUP BY 1
             |), t AS (
             |  SELECT f, m,
             |    sum(m) OVER (ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND CURRENT ROW) - m + 1 AS s
             |  FROM ff
             |), agg AS (
             |  SELECT sum(m) AS nk, sum(f * m) AS nr, max(f) AS max_count,
             |    sum(f * (m * s + m * (m - 1) // 2)) AS t
             |  FROM t
             |)
             |SELECT CAST(nk AS BIGINT) AS n_keys, CAST(nr AS BIGINT) AS n_rows,
             |  max_count,
             |  round(CAST(2 * t - (nk + 1) * nr AS DOUBLE) /
             |        CAST(nk * nr AS DOUBLE), 6) AS gini,
             |  CAST((max_count * 1000000) // nr AS BIGINT) AS top1_share_ppm
             |FROM agg""".stripMargin)),

    QueryDef("q158_incremental_rollup",
      "incremental materialized-view maintenance: merged daily aggregate states == direct aggregate",
      // IncrementalAgg: per-(type, day) algebraic states (n/sum/min/max)
      // split into two partial tables, rolled up and MERGED — the oracle
      // is the direct aggregation over the raw events, so the certificate
      // is exactly 'state merge == rescan'. At 100 TB only the new day's
      // partition is ever aggregated; history merges as states. avg is
      // derived from merged states at read-out (a stored avg doesn't
      // merge). The daily-state frame is types x days bounded.
      (s, dir) => {
        import graft.operators.IncrementalAgg
        val e = table(s, dir, "events")
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"),
            floor(col("value") * 1000).cast("long").as("vm"))
        val daily = IncrementalAgg.aggState(e, Seq("event_type", "day"), col("vm"))
        val even = IncrementalAgg.rollupStates(
          daily.filter(pmod(col("day"), lit(2)) === 0), Seq("event_type"))
        val odd = IncrementalAgg.rollupStates(
          daily.filter(pmod(col("day"), lit(2)) === 1), Seq("event_type"))
        IncrementalAgg.mergeStates(even, odd, Seq("event_type"))
          .select(col("event_type"), col("st_n").as("n"),
            col("st_sum").as("sum_vm"), col("st_min").as("min_vm"),
            col("st_max").as("max_vm"),
            round(col("st_sum").cast("double") / col("st_n").cast("double"), 6)
              .as("avg_vm"))
          .orderBy("event_type")
      },
      Some("""|SELECT event_type, count(value) AS n,
             |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
             |    AS sum_vm,
             |  min(CAST(floor(value * 1000) AS BIGINT)) AS min_vm,
             |  max(CAST(floor(value * 1000) AS BIGINT)) AS max_vm,
             |  round(CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS DOUBLE)
             |    / CAST(count(value) AS DOUBLE), 6) AS avg_vm
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q159_index_term_query",
      "secondary-index term probe: materialized postings + partition-pruned lookup == direct scan",
      // SecondaryIndex: postings written once partitioned by the term's
      // first character; the probe for 'dup' prunes to ONE directory at
      // planning time and reads (doc_id, tf) only. The oracle computes
      // the same answer by scanning the corpus directly, so the
      // certificate is 'index probe == full scan'.
      (s, dir) => {
        import graft.operators.SecondaryIndex
        val docs = table(s, dir, "documents")
        val path = java.nio.file.Files.createTempDirectory("postings")
        graft.streaming.StreamingOps.deleteOnExit(path)
        SecondaryIndex.writePostings(docs, path.toString)
        SecondaryIndex.probeTerm(s, path.toString, "dup")
          .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
          .select(col("doc_id"), col("tf"), col("n_chars"))
          .orderBy(col("tf").desc, col("doc_id"))
      },
      Some("""|WITH tf AS (
             |  SELECT doc_id, count(*) AS tf FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |    FROM documents
             |  ) WHERE term = 'dup' GROUP BY doc_id
             |)
             |SELECT t.doc_id, t.tf, d.n_chars
             |FROM tf t JOIN documents d ON t.doc_id = d.doc_id
             |ORDER BY t.tf DESC, t.doc_id""".stripMargin)),

    QueryDef("q160_topk_with_ties",
      "per-group top-k WITH ties (rank, not row_number) on the exact milli grid",
      // the ties-included top-k semantic (q08 is the row_number variant):
      // rank() over the milli grid admits every row tying the k-th value,
      // so group output sizes vary — exactly what a cutoff report needs.
      // rank <= k compiles to the same WindowGroupLimit partial/final
      // pushdown as row_number, so at most k+ties rows per group per input
      // partition cross the shuffle.
      (s, dir) => {
        val c = table(s, dir, "customer")
          .select(col("c_nationkey"), col("c_custkey"),
            floor(col("c_acctbal") * 1000).cast("long").as("bm"))
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("bm").desc)
        c.withColumn("rnk", rank().over(w))
          .filter(col("rnk") <= 3)
          .select(col("c_nationkey"), col("rnk"), col("c_custkey"), col("bm"))
          .orderBy("c_nationkey", "rnk", "c_custkey")
      },
      Some("""|WITH b AS (
             |  SELECT c_nationkey, c_custkey,
             |    CAST(floor(c_acctbal * 1000) AS BIGINT) AS bm
             |  FROM customer
             |), r AS (
             |  SELECT c_nationkey, c_custkey, bm,
             |    CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY bm DESC)
             |      AS INT) AS rnk
             |  FROM b
             |)
             |SELECT c_nationkey, rnk, c_custkey, bm FROM r WHERE rnk <= 3
             |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin)),

    QueryDef("q161_debounce_census",
      "debounce/rate-limit dedup: drop events within 10 min of the previous same-key event",
      // the throttling primitive (distinct from sessionization: a kept
      // event RESETS nothing — the gap is measured to the immediately
      // preceding raw event): one (user, type) shuffle, per-key lag sorts
      // parallel, census collapses to |types| rows. Gaps compare as exact
      // integer nanos.
      (s, dir) => {
        val e = table(s, dir, "events")
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
        e.select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
            floor(col("value") * 1000).cast("long").as("vm"))
          .withColumn("prev_ts", lag("ts", 1).over(w))
          .withColumn("kept",
            when(col("prev_ts").isNull ||
              col("ts") - col("prev_ts") > 600000000000L, 1L).otherwise(0L))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_total"), sum("kept").as("n_kept"),
            sum(col("kept") * col("vm")).as("kept_vm_sum"))
          .orderBy("event_type")
      },
      Some("""|WITH lagged AS (
             |  SELECT event_type, epoch_ns(ts) AS t,
             |    CAST(floor(value * 1000) AS BIGINT) AS vm,
             |    lag(epoch_ns(ts)) OVER (PARTITION BY user_id, event_type
             |      ORDER BY ts, event_id) AS prev_t
             |  FROM events
             |), flagged AS (
             |  SELECT event_type, vm,
             |    CASE WHEN prev_t IS NULL OR t - prev_t > 600000000000
             |      THEN 1 ELSE 0 END AS kept
             |  FROM lagged
             |)
             |SELECT event_type, count(*) AS n_total,
             |  CAST(sum(kept) AS BIGINT) AS n_kept,
             |  CAST(sum(kept * vm) AS BIGINT) AS kept_vm_sum
             |FROM flagged GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q162_revenue_reconciliation",
      "cross-table conformance audit: per-order lineitem revenue vs orders.o_totalprice on the cents grid",
      // the anti-entropy data-quality check between two derivations of
      // 'the same' number: per-line cents are floored BEFORE summation
      // (one IEEE product chain per line — identical in any engine; the
      // long sum is order-free), so the diff census can't straddle a
      // float boundary. One orderkey join; the census is a single row.
      (s, dir) => {
        val li = table(s, dir, "lineitem")
          .select(col("l_orderkey"),
            floor(col("l_extendedprice") * (lit(1) - col("l_discount")) *
              (lit(1) + col("l_tax")) * 100).cast("long").as("line_cents"))
          .groupBy("l_orderkey")
          .agg(sum("line_cents").as("computed_cents"))
        val o = table(s, dir, "orders")
          .select(col("o_orderkey"),
            floor(col("o_totalprice") * 100).cast("long").as("stated_cents"))
        o.join(li, o("o_orderkey") === li("l_orderkey"), "left")
          .select(col("o_orderkey"),
            (col("computed_cents") - col("stated_cents")).as("diff"))
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("diff").isNull, 1L).otherwise(0L)).as("n_no_lines"),
            sum(when(col("diff") > 0, 1L).otherwise(0L)).as("n_over"),
            sum(when(col("diff") < 0, 1L).otherwise(0L)).as("n_under"),
            sum(when(col("diff") === 0, 1L).otherwise(0L)).as("n_exact"),
            max(abs(col("diff"))).as("max_abs_diff_cents"),
            sum(abs(col("diff"))).as("total_abs_diff_cents"))
      },
      Some("""|WITH li AS (
             |  SELECT l_orderkey,
             |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
             |      * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS computed_cents
             |  FROM lineitem GROUP BY 1
             |), j AS (
             |  SELECT o.o_orderkey,
             |    li.computed_cents
             |      - CAST(floor(o.o_totalprice * 100) AS BIGINT) AS diff
             |  FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
             |)
             |SELECT count(*) AS n_orders,
             |  CAST(sum(CASE WHEN diff IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_no_lines,
             |  CAST(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_over,
             |  CAST(sum(CASE WHEN diff < 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_under,
             |  CAST(sum(CASE WHEN diff = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_exact,
             |  max(abs(diff)) AS max_abs_diff_cents,
             |  CAST(sum(abs(diff)) AS BIGINT) AS total_abs_diff_cents
             |FROM j""".stripMargin)),

    QueryDef("q163_nested_export_fingerprint",
      "denormalized nested export: per-order sorted line array canonicalized and md5-pinned",
      // the wide-table materialization shape (order + nested lines) with
      // its content integrity pinned: lines sort by (l_linenumber, line)
      // inside each order's bounded array (single-digit baskets — the
      // documented collect_list exception; the line string tie-break
      // matters: this data has duplicate line numbers within orders),
      // serialize to a canonical integer-grid string, md5. The oracle
      // rebuilds the identical string via ordered string_agg, so any row
      // loss, reorder, or grid drift flips the hash.
      (s, dir) => {
        val li = table(s, dir, "lineitem")
          .filter(pmod(col("l_orderkey"), lit(50)) === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
            concat_ws(":", col("l_partkey"),
              floor(col("l_quantity")).cast("long"),
              floor(col("l_extendedprice") * 100).cast("long")).as("line"))
        li.groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_lines"),
            md5(array_join(transform(
              array_sort(collect_list(struct(col("l_linenumber"), col("line")))),
              x => x.getField("line")), ";")).as("lines_md5"))
          .orderBy("l_orderkey")
      },
      Some("""|WITH li AS (
             |  SELECT l_orderkey, l_linenumber,
             |    CAST(l_partkey AS VARCHAR) || ':' ||
             |    CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR) || ':' ||
             |    CAST(CAST(floor(l_extendedprice * 100) AS BIGINT) AS VARCHAR)
             |      AS line
             |  FROM lineitem WHERE l_orderkey % 50 = 0
             |)
             |SELECT l_orderkey, count(*) AS n_lines,
             |  md5(string_agg(line, ';' ORDER BY l_linenumber, line))
             |    AS lines_md5
             |FROM li GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef("q345_orc_roundtrip",
      "ORC interop: events -> ORC sink -> EventSources orc reader -> " +
        "per-type census; the second columnar format must be lossless " +
        "(counts, distinct users, micro-exact sums and timestamps)",
      // the format-interop certification for the engine's SECOND columnar
      // format (an exchange format a 100 TB lake actually encounters):
      // the normalized events frame (ts as long nanos) writes to ORC and
      // reads back through the same format-agnostic ingestion as
      // CSV/JSON; the census pins row count, user cardinality, value
      // sums, and the full ts range, so any row loss, duplication, or
      // precision drift in the round trip flips the oracle hash. ORC
      // lands vectorized + pushdown-capable like parquet (spec-asserted).
      (s, dir) => {
        val out = java.nio.file.Files.createTempDirectory("q345_orc")
        graft.streaming.StreamingOps.deleteOnExit(out)
        graft.sources.EventSources.readEvents(s, s"$dir/events.parquet")
          .write.mode("overwrite").orc(out.toString)
        graft.sources.EventSources.readEvents(s, out.toString, "orc")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            sum(floor(col("value") * 1000000).cast("long")).cast("long")
              .as("sum_v_e6"),
            min(expr("ts div 1000")).as("min_ts_us"),
            max(expr("ts div 1000")).as("max_ts_us"))
          .orderBy("event_type")
      },
      Some("""|SELECT event_type, count(*) AS n,
             |  count(DISTINCT user_id) AS n_users,
             |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
             |    AS sum_v_e6,
             |  min(epoch_ns(ts) // 1000) AS min_ts_us,
             |  max(epoch_ns(ts) // 1000) AS max_ts_us
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)))
}
