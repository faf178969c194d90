package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Frames

/** Format-agnostic ingestion for the events contract
  * `(event_id long, ts, user_id long, event_type string, value double,
  * props string)` — parquet, CSV, or JSON line files all land on the SAME
  * normalized frame (`ts` as long nanos, via [[Frames.normalizeTsNanos]]),
  * so every downstream operator (`eventsToLong`, sessionization, rolling
  * features, interval joins) is source-format-independent.
  *
  * Text formats carry `ts` either as an ISO-8601 timestamp string or as an
  * integer epoch (auto-detected by magnitude: epoch seconds, millis,
  * micros, or nanos — the spans can't collide for any date between 1971
  * and 2500). Schema is DECLARED, not inferred: inference samples the
  * file (a second scan at scale) and text-format type guessing is exactly
  * the kind of silent contract drift the fixed schema exists to prevent.
  */
object EventSources {

  /** The text-format landing schema: ts arrives as a string and is parsed
    * explicitly — never inferred. */
  val TextSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", StringType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Parse a string ts column to long nanos: integer strings are epoch
    * values whose unit is detected by magnitude; anything else goes
    * through the timestamp parser under the UTC session. Bounds (epoch
    * values for 2001-09 .. 2255): seconds < 1e10 < millis < 1e13 <
    * micros < 1e16 < nanos. */
  private def parsedTsNanos(ts: org.apache.spark.sql.Column) = {
    val asLong = ts.cast(LongType)
    when(ts.rlike("^-?\\d+$"),
      when(abs(asLong) < 10000000000L, asLong * 1000000000L)
        .when(abs(asLong) < 10000000000000L, asLong * 1000000L)
        .when(abs(asLong) < 10000000000000000L, asLong * 1000L)
        .otherwise(asLong))
      .otherwise(unix_micros(to_timestamp(ts)) * 1000L)
  }

  /** Read events from `path` in the given format ("parquet", "orc",
    * "csv", "json"); the result always carries `ts` as long nanos. CSV
    * expects a header row. ORC is written by this engine with `ts`
    * already as long nanos (see the q345 round trip), so it lands like a
    * columnar sibling of parquet: vectorized scan, predicate pushdown,
    * column pruning all apply. */
  def readEvents(spark: SparkSession, path: String,
                 format: String = "parquet"): DataFrame = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    format match {
      case "parquet" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        Frames.normalizeTsNanos(spark.read.parquet(path))
      case "orc" =>
        Frames.normalizeTsNanos(spark.read.orc(path))
      case "csv" =>
        spark.read.schema(TextSchema).option("header", "true").csv(path)
          .withColumn("ts", parsedTsNanos(col("ts")))
      case "json" =>
        spark.read.schema(TextSchema).json(path)
          .withColumn("ts", parsedTsNanos(col("ts")))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported events format '$other' (parquet, orc, csv, json)")
    }
  }
}
