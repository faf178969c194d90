package org.apache.spark.sql.graftinternal

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions.col

/** Layout-declaring pin for loop-invariant frames (Graph.pinByKey).
  *
  * `Dataset.checkpoint` infers the preserved partitioning/ordering from the
  * executed physical plan — and under AQE that inference reports
  * `UnknownPartitioning`, which silently discards the very layout the
  * round loops depend on. The r18 workaround toggled
  * `spark.sql.adaptive.enabled` on the SHARED session around each pin (the
  * r18 verdict's multi-tenant hazard: a concurrently planned query could
  * observe AQE off); a thread-scoped `SQLConf.withExistingConf` clone does
  * NOT fix it, because `SQLExecution.withNewExecutionId` re-binds the
  * session conf before planning runs (probe-verified).
  *
  * So this shim performs the pin manually and DECLARES the layout instead
  * of inferring it: execute `repartition(n, key) + sortWithinPartitions`,
  * pin the resulting InternalRow RDD under the session's checkpoint policy,
  * and wrap it in a `LogicalRDD` carrying `HashPartitioning(key, n)` +
  * ascending key ordering. The declaration is true by construction even
  * with AQE fully on: an explicit-count repartition is
  * `REPARTITION_BY_NUM`, which AQE never coalesces or re-keys, and nothing
  * reorders a trailing in-partition sort. No session conf is touched at
  * any point. (`LogicalRDD` and `Dataset.ofRows` are `private[sql]`, hence
  * this one-object shim inside the `org.apache.spark.sql` package tree.)
  */
object PinnedLayout {

  def pinByKey(df: DataFrame, key: String, n: Int): DataFrame = {
    val classicDf = df.asInstanceOf[Dataset[Row]]
    val session = classicDf.sparkSession
    val laid = classicDf.repartition(n, col(key)).sortWithinPartitions(key)
    val qe = laid.queryExecution
    // rows must be copied out of the operator's reused UnsafeRow buffers
    // before they are stored — same as Dataset.checkpoint
    val rdd: RDD[InternalRow] = qe.toRdd.map(_.copy())
    graft.operators.Checkpoints.pinRdd(session, rdd)
    val output = qe.analyzed.output
    val keyAttr = output.find(_.name == key).getOrElse(
      throw new IllegalArgumentException(
        s"pin key '$key' not among ${output.map(_.name).mkString(", ")}"))
    val logical = LogicalRDD(
      output, rdd,
      HashPartitioning(Seq(keyAttr), n),
      Seq(SortOrder(keyAttr, Ascending)),
      isStreaming = false)(session)
    Dataset.ofRows(session, logical)
  }
}
