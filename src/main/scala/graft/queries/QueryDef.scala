package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark build plus (when the semantics are
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet tables.
  * Column names/types and rounding must match between the two exactly — the
  * driver hash-compares values after sorting columns by name.
  */
final case class QueryDef(
  name: String,
  /** Which SURVEY.md §2 inventory line(s) this query demonstrates. */
  covers: String,
  build: (SparkSession, String) => DataFrame,
  oracle: Option[String])

object QueryDef {
  /** Read one harness table, normalizing any `ts` column to long nanos —
    * the single batch-ingestion choke point. The harness has shipped events
    * timestamps both as TIMESTAMP(NANOS) (readable only under
    * `spark.sql.legacy.parquet.nanosAsLong`, arriving as long nanos) and as
    * TIMESTAMP(MICROS) (arriving as TIMESTAMP_NTZ);
    * [[graft.model.Frames.normalizeTsNanos]] absorbs both so every
    * downstream plan sees one contract. DuckDB oracles read the same column
    * natively (`epoch_ns`/`epoch_us`), which agrees with either generation. */
  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.model.Frames.normalizeTsNanos(s.read.parquet(s"$dir/$name.parquet"))
  }

  /** Shared events->channelized-LongFrame SQL for DuckDB oracles; mirrors
    * Frames.eventsToLong + rectangularize with nChannels=8. */
  val EventsRectSql: String =
    """WITH ranked AS (
      |  SELECT CAST(user_id % 8 AS INT) AS channel,
      |         CAST(value AS DOUBLE) AS value,
      |         CAST(row_number() OVER (PARTITION BY user_id % 8 ORDER BY ts, event_id) - 1 AS BIGINT) AS t_idx
      |  FROM events
      |), minlen AS (
      |  SELECT min(cnt) AS n FROM (SELECT count(*) AS cnt FROM ranked GROUP BY channel) t
      |), rect AS (
      |  SELECT r.channel, r.t_idx, r.value FROM ranked r, minlen m WHERE r.t_idx < m.n
      |)""".stripMargin
}
