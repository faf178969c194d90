package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary-index pattern: materialize a postings table for a text
  * column once, then answer selective term queries by probing the index
  * instead of scanning the corpus.
  *
  * The index is laid out PARTITIONED BY the term's first character, so a
  * term probe prunes to one directory at planning time (`PartitionFilters`
  * in the scan — spec-asserted) and reads only (term, doc_id, tf) columns:
  * at 100 TB the probe cost is the selected term's postings, not the
  * corpus. This is the file-layout complement to [[BucketedLayout]]
  * (which elides join exchanges): partition pruning elides the SCAN.
  * Production refinements — finer partition keys (2-char prefixes,
  * hash-mod directories) or bucketing by term inside partitions — change
  * only the layout constant, not the shape.
  */
object SecondaryIndex {

  /** Build and write the postings index: one row per (term, doc) with the
    * term frequency, partitioned by the term's first character. */
  def writePostings(docs: DataFrame, path: String, idCol: String = "doc_id",
                    textCol: String = "text"): Unit = {
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
      .withColumn("t0", substring(col("term"), 1, 1))
      .write.mode("overwrite").partitionBy("t0").parquet(path)
  }

  /** Probe the index for one exact term — partition-pruned scan returning
    * (doc_id, tf). */
  def probeTerm(spark: SparkSession, path: String, term: String): DataFrame = {
    require(term.nonEmpty, "term must be non-empty")
    spark.read.parquet(path)
      .filter(col("t0") === term.substring(0, 1) && col("term") === term)
      .select(col("doc_id"), col("tf"))
  }
}
