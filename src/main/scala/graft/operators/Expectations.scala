package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite (the Deequ/Great-Expectations
  * shape): a rule list compiles into ONE conditional-aggregate pass over the
  * table — every row-local rule becomes a `sum(when(pred,1))` inside a single
  * scan's map-side partials — plus one small grouped aggregate per uniqueness
  * rule (the only rule family that genuinely needs per-key state). The report
  * is exact-integer end to end: each rule yields `(metric_num, metric_den)`
  * counts and a `min_ratio_e6` threshold, and the verdict is the integer
  * comparison `metric_num * 1e6 >= min_ratio_e6 * metric_den` — no float
  * ratio ever crosses an engine boundary, so the same rule text replayed in
  * SQL agrees bit-for-bit.
  *
  * Scale shape: row-local rules cost one column-pruned scan regardless of
  * rule count (the conditional sums collapse map-side to a single row);
  * a `Unique` rule adds one hash aggregate on its column (partial combine,
  * then a one-row rollup) — no broadcast, no all-pairs, no driver loop.
  * At 10^13 rows the verdict arithmetic stays in Long range
  * (num * 1e6 < 2^63 up to ~9.2e12 rows; beyond that swap to DECIMAL).
  */
object Expectations {

  sealed trait Rule {
    def name: String
    /** Minimum passing fraction, scaled by 1e6 (1000000 = "all rows"). */
    def minRatioE6: Long
  }

  /** Fraction of rows where `predicateSql` evaluates TRUE (NULL = fail) —
    * the predicate text is ANSI SQL so the oracle can embed it verbatim. */
  final case class Satisfies(name: String, predicateSql: String,
                             minRatioE6: Long) extends Rule

  /** Completeness: fraction of rows with a non-null `column`. */
  final case class Complete(name: String, column: String,
                            minRatioE6: Long) extends Rule

  /** Uniqueness: fraction of rows whose `column` value occurs exactly once
    * (Deequ's "uniqueness"; NULL groups like any other value). */
  final case class Unique(name: String, column: String,
                          minRatioE6: Long) extends Rule

  /** Rule names become aggregate output columns, so they must not collide
    * with the internal `_den` denominator and must stay resolvable by
    * `col(name)` — a dot would parse as a field path and misbind. */
  private val SafeName = "[A-Za-z][A-Za-z0-9_]*".r
  private def validateNames(rules: Seq[Rule]): Unit = rules.foreach { r =>
    require(r.name != "_den", "rule name \"_den\" is reserved")
    require(SafeName.pattern.matcher(r.name).matches(),
      s"rule name '${r.name}' must match ${SafeName.regex} " +
        "(letters, digits, underscores; no dots)")
  }

  private def rowPredicate(r: Rule): Option[Column] = r match {
    case Satisfies(_, p, _) => Some(expr(p))
    case Complete(_, c, _)  => Some(col(c).isNotNull)
    case _                  => None
  }

  /** Run the suite; returns one row per rule:
    * (rule, metric_num, metric_den, min_ratio_e6, pass), ordered by rule. */
  def verify(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "expectation suite needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    validateNames(rules)

    val local = rules.flatMap(r => rowPredicate(r).map(p => (r, p)))

    val localOut: Option[DataFrame] =
      if (local.isEmpty) None
      else {
        val aggs = count(lit(1)).cast("long").as("_den") +:
          local.map { case (r, p) =>
            coalesce(sum(when(p, 1L).otherwise(0L)), lit(0L)).as(r.name)
          }
        val row = df.agg(aggs.head, aggs.tail: _*)
        Some(row.select(explode(array(local.map { case (r, _) =>
          struct(lit(r.name).as("rule"),
            col(r.name).cast("long").as("metric_num"),
            col("_den").as("metric_den"),
            lit(r.minRatioE6).as("min_ratio_e6"))
        }: _*)).as("m")).select("m.*"))
      }

    val uniqueOuts: Seq[DataFrame] = rules.collect { case u: Unique =>
      df.groupBy(col(u.column)).agg(count(lit(1)).as("_c"))
        .agg(
          coalesce(sum(when(col("_c") === 1L, 1L).otherwise(0L)), lit(0L))
            .cast("long").as("metric_num"),
          coalesce(sum(col("_c")), lit(0L)).cast("long").as("metric_den"))
        .select(lit(u.name).as("rule"), col("metric_num"),
          col("metric_den"), lit(u.minRatioE6).as("min_ratio_e6"))
    }

    val parts = localOut.toSeq ++ uniqueOuts
    parts.reduce(_ unionByName _)
      .withColumn("pass",
        col("metric_num") * lit(1000000L) >= col("min_ratio_e6") * col("metric_den"))
      .orderBy("rule")
  }

  /** One-pass OBSERVED expectations — the production shape at 100 TB: the
    * suite's row-local metrics attach to the frame as an `Observation`, so
    * they materialize as a side effect of whatever action the caller was
    * already running (the write, the count) and cost ZERO additional scans.
    * `Unique` rules need grouped state and are excluded — [[verify]] is the
    * offline path for those. Read the verdicts with [[report]] after the
    * action completes. */
  def observed(df: DataFrame, rules: Seq[Rule],
               name: String = "expectations")
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(rules.nonEmpty, "expectation suite needs at least one rule")
    validateNames(rules)
    val local = rules.flatMap(r => rowPredicate(r).map(p => (r, p)))
    require(local.size == rules.size,
      "observed() supports row-local rules only (Complete/Satisfies); " +
        "run Unique rules through verify()")
    val obs = org.apache.spark.sql.Observation(name)
    val aggs = count(lit(1)).cast("long").as("_den") +:
      local.map { case (r, p) =>
        coalesce(sum(when(p, 1L).otherwise(0L)), lit(0L)).as(r.name)
      }
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Render a completed [[observed]] run into the [[verify]] report schema
    * (rule, metric_num, metric_den, min_ratio_e6, pass), ordered by rule.
    * Blocks until the observed action has finished. */
  def report(spark: org.apache.spark.sql.SparkSession,
             obs: org.apache.spark.sql.Observation,
             rules: Seq[Rule]): DataFrame = {
    import spark.implicits._
    val m = obs.get
    val den = m("_den").asInstanceOf[Long]
    rules.map { r =>
      val num = m(r.name).asInstanceOf[Long]
      (r.name, num, den, r.minRatioE6,
        num * 1000000L >= r.minRatioE6 * den)
    }.sortBy(_._1)
      .toDF("rule", "metric_num", "metric_den", "min_ratio_e6", "pass")
  }
}
