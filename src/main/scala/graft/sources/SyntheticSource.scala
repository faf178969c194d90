package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `graft-synthetic`: the deterministic raw smoothed-noise
  * ECoG trace ([[graft.model.Synthetic.rawTrace]], mirroring the
  * reference generator's noise stage, utils.py:190-198) exposed as a
  * first-class Spark table of (channel, t, value) samples — the
  * engine-native way to stand up an unbounded synthetic corpus with NO
  * driver-side data and NO shuffle:
  *
  *  - one InputPartition per channel block (`channelsPerPartition`), so a
  *    1000-executor cluster generates 100k channels fully in parallel;
  *  - CHANNEL filter pushdown (`SupportsPushDownFilters`): =, IN, >, >=,
  *    <, <= on `channel` prune entire partitions at PLANNING time —
  *    `df.filter($"channel" === 7)` plans exactly one partition;
  *  - column pruning (`SupportsPushDownRequiredColumns`): a query that
  *    never reads `value` skips trace generation entirely (the reader
  *    checks the pruned schema before computing the Gaussian trace).
  *
  * Options: nchannels (required), ntime (required), seed (default 0),
  * channelsPerPartition (default 1).
  */
class SyntheticSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-synthetic"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyntheticTable(new CaseInsensitiveStringMap(properties))
}

object SyntheticSource {
  val Schema: StructType = StructType(Seq(
    StructField("channel", IntegerType, nullable = false),
    StructField("t", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = false)))
}

final class SyntheticTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  private val nChannels = options.getInt("nchannels", -1)
  private val nTime = options.getInt("ntime", -1)
  private val seed = options.getLong("seed", 0L)
  private val chPerPart = options.getInt("channelsperpartition", 1)
  require(nChannels >= 1, "option nchannels >= 1 is required")
  require(nTime >= 1, "option ntime >= 1 is required")
  require(chPerPart >= 1, "channelsPerPartition must be >= 1")

  override def name(): String =
    s"graft_synthetic(nchannels=$nChannels, ntime=$nTime, seed=$seed)"
  override def schema(): StructType = SyntheticSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(nChannels, nTime, seed, chPerPart,
      options.getBoolean("columnar", true))
}

/** The closed-form aggregates the synthetic grid can answer WITHOUT
  * generating a single trace sample: counts and min/max over the
  * (channel, t) lattice are pure arithmetic on the (pruned) channel range.
  * A pushed `GROUP BY channel` count over a 10^11-row synthetic corpus
  * therefore plans to nChannels constant rows — the scan never runs. */
private sealed trait SynthAgg
private case object SynthCountStar extends SynthAgg
private final case class SynthCount(col: String) extends SynthAgg
private final case class SynthMin(col: String) extends SynthAgg
private final case class SynthMax(col: String) extends SynthAgg

final class SyntheticScanBuilder(nChannels: Int, nTime: Int, seed: Long,
                                 chPerPart: Int, columnar: Boolean = true)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = SyntheticSource.Schema
  private var pushed: Array[Filter] = Array.empty
  private var aggSpec: Option[(Boolean, Seq[SynthAgg])] = None
  // pruned channel range [lo, hi] plus an optional explicit allow-set
  private var chLo = 0
  private var chHi = nChannels - 1
  private var chSet: Option[Set[Int]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case sources.EqualTo("channel", v: Number) => true
      case sources.In("channel", vs) => vs.forall(_.isInstanceOf[Number])
      case sources.GreaterThan("channel", v: Number) => true
      case sources.GreaterThanOrEqual("channel", v: Number) => true
      case sources.LessThan("channel", v: Number) => true
      case sources.LessThanOrEqual("channel", v: Number) => true
      case _ => false
    }
    accepted.foreach {
      case sources.EqualTo("channel", v: Number) =>
        val c = v.intValue(); chLo = math.max(chLo, c); chHi = math.min(chHi, c)
      case sources.In("channel", vs) =>
        val s = vs.map(_.asInstanceOf[Number].intValue()).toSet
        chSet = Some(chSet.map(_.intersect(s)).getOrElse(s))
      case sources.GreaterThan("channel", v: Number) =>
        chLo = math.max(chLo, v.intValue() + 1)
      case sources.GreaterThanOrEqual("channel", v: Number) =>
        chLo = math.max(chLo, v.intValue())
      case sources.LessThan("channel", v: Number) =>
        chHi = math.min(chHi, v.intValue() - 1)
      case sources.LessThanOrEqual("channel", v: Number) =>
        chHi = math.min(chHi, v.intValue())
      case _ =>
    }
    pushed = accepted
    // pushed-down channel predicates are EXACT partition pruning, but we
    // still return them as "pushed" only (Spark keeps residual evaluation
    // of the rest array alone)
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COMPLETE aggregate pushdown for the closed-form cases: grouping is
    * empty or exactly `channel`, and every aggregate is COUNT(*) /
    * COUNT / MIN / MAX over `channel` or `t` (never `value` — that would
    * need the trace). Grouped rows are emitted one-channel-per-group from
    * disjoint partitions, so "complete" is sound under any parallelism. */
  private def analyzeAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(Boolean, Seq[SynthAgg])] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case nr: NamedReference if nr.fieldNames().length == 1 &&
        (nr.fieldNames()(0) == "t" || nr.fieldNames()(0) == "channel") =>
        Some(nr.fieldNames()(0))
      case _ => None
    }
    val grouped: Option[Boolean] = agg.groupByExpressions().toSeq match {
      case Seq() => Some(false)
      case Seq(nr: NamedReference)
          if nr.fieldNames().sameElements(Array("channel")) => Some(true)
      case _ => None
    }
    val funcs: Seq[Option[SynthAgg]] = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(SynthCountStar)
      case c: Count if !c.isDistinct => fieldOf(c.column()).map(SynthCount)
      case m: Min => fieldOf(m.column()).map(SynthMin)
      case m: Max => fieldOf(m.column()).map(SynthMax)
      case _ => None
    }
    // empty aggregateExpressions = a pushed DISTINCT channel (the optimizer
    // prunes unused aggregate outputs under e.g. count() — a grouped scan
    // with zero functions must still answer closed-form, or the whole
    // pushdown silently lapses back to the 10^9-row lattice walk)
    for (g <- grouped; fs <- Some(funcs) if fs.forall(_.isDefined) && (g || fs.nonEmpty))
      yield (g, fs.flatten)
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = analyzeAggregation(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = analyzeAggregation(agg) match {
    // only complete pushdown is offered: without it Spark would treat the
    // emitted rows as PARTIALS and re-aggregate
    case s @ Some(_) if supportCompletePushDown(agg) => aggSpec = s; true
    case _ => false
  }

  override def build(): Scan = aggSpec match {
    case Some((grouped, funcs)) =>
      new SyntheticAggScan(nTime, chPerPart, chLo, chHi, chSet, grouped, funcs)
    case None =>
      new SyntheticScan(nTime, seed, chPerPart, chLo, chHi, chSet, required,
        columnar)
  }
}

/** Scan for a completely-pushed aggregation: emits the closed-form rows
  * (group columns first, then aggregate values, positionally — the
  * V2ScanRelationPushDown contract). No trace generation, no shuffle. */
final class SyntheticAggScan(nTime: Int, chPerPart: Int,
                             chLo: Int, chHi: Int, chSet: Option[Set[Int]],
                             grouped: Boolean, funcs: Seq[SynthAgg])
    extends Scan with Batch {

  private def channels: Seq[Int] = {
    val base = chLo to chHi
    chSet.map(s => base.filter(s.contains)).getOrElse(base)
  }

  override def readSchema(): StructType = {
    val aggFields = funcs.zipWithIndex.map {
      case (SynthCountStar, i) =>
        StructField(s"agg_$i", LongType, nullable = false)
      case (SynthCount(_), i) =>
        StructField(s"agg_$i", LongType, nullable = false)
      case (SynthMin(_), i) => StructField(s"agg_$i", IntegerType, nullable = true)
      case (SynthMax(_), i) => StructField(s"agg_$i", IntegerType, nullable = true)
    }
    val gb = if (grouped)
      Seq(StructField("channel", IntegerType, nullable = false)) else Seq.empty
    StructType(gb ++ aggFields)
  }

  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synthetic AGGREGATED grouped=$grouped funcs=[${funcs.mkString(",")}]" +
      s" channels=[$chLo..$chHi]"

  override def planInputPartitions(): Array[InputPartition] =
    if (grouped)
      channels.grouped(chPerPart)
        .map(g => SyntheticAggPartition(g.toArray, nTime): InputPartition)
        .toArray
    else Array(SyntheticAggPartition(channels.toArray, nTime))

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticAggReaderFactory(grouped, funcs, readSchema())
}

final case class SyntheticAggPartition(chans: Array[Int], nTime: Int)
    extends InputPartition

final class SyntheticAggReaderFactory(grouped: Boolean, funcs: Seq[SynthAgg],
                                      schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SyntheticAggReader(p.asInstanceOf[SyntheticAggPartition], grouped, funcs)

  // The constant result rows are few (<= channelsPerPartition), but
  // emitting them as one ColumnarBatch keeps the pushed-aggregate scan on
  // the same codegen'd ColumnarToRow path as the normal vectorized scan —
  // no row-vs-columnar seam appears in the plan just because an aggregate
  // was pushed.
  override def supportColumnarReads(p: InputPartition): Boolean = true
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new SyntheticAggColumnarReader(p.asInstanceOf[SyntheticAggPartition],
      grouped, funcs, schema)
}

/** The closed-form pushed-aggregate values, in ONE place: per grouped row
  * the "range" is the row's single channel; the global row aggregates the
  * partition's whole channel set. Both the row reader and its columnar
  * twin evaluate through here, so a future aggregate added to the pushdown
  * cannot silently diverge between the two paths. */
private[sources] object SyntheticAggValues {
  def aggVals(funcs: Seq[SynthAgg], chans: Array[Int], nTime: Int): Seq[Any] =
    funcs.map {
      case SynthCountStar => chans.length.toLong * nTime
      case SynthCount(_) => chans.length.toLong * nTime // columns non-null
      case SynthMin("t") => if (chans.isEmpty) null else 0
      case SynthMax("t") => if (chans.isEmpty) null else nTime - 1
      case SynthMin("channel") => if (chans.isEmpty) null else chans.min
      case SynthMax("channel") => if (chans.isEmpty) null else chans.max
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
}

/** Columnar twin of [[SyntheticAggReader]]: the closed-form rows land in
  * one primitive ColumnarBatch (null min/max on an empty channel range,
  * same as the row reader — both evaluate [[SyntheticAggValues]]). */
final class SyntheticAggColumnarReader(p: SyntheticAggPartition,
                                       grouped: Boolean, funcs: Seq[SynthAgg],
                                       schema: StructType)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector

  private val nRows = if (grouped) p.chans.length else 1
  private var emitted = false
  private val vectors = OnHeapColumnVector.allocateColumns(math.max(nRows, 1), schema)
  private val batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
    vectors.map(v => v: org.apache.spark.sql.vectorized.ColumnVector))

  override def next(): Boolean = {
    if (emitted || nRows == 0) return false
    if (grouped) {
      var j = 0
      while (j < nRows) { vectors(0).putInt(j, p.chans(j)); j += 1 }
    }
    val off = if (grouped) 1 else 0
    var j = 0
    while (j < nRows) {
      val vals = SyntheticAggValues.aggVals(funcs,
        if (grouped) Array(p.chans(j)) else p.chans, p.nTime)
      var i = 0
      while (i < vals.length) {
        vals(i) match {
          case null => vectors(off + i).putNull(j)
          case l: Long => vectors(off + i).putLong(j, l)
          case n: Int => vectors(off + i).putInt(j, n)
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
        i += 1
      }
      j += 1
    }
    batch.setNumRows(nRows)
    emitted = true
    true
  }

  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch
  override def close(): Unit = batch.close()
}

/** Closed-form aggregate rows: per channel (grouped) or one global row.
  * Empty channel ranges yield zero counts and null min/max (ungrouped)
  * or no rows at all (grouped) — matching what the un-pushed aggregate
  * over an empty scan would produce. */
final class SyntheticAggReader(p: SyntheticAggPartition, grouped: Boolean,
                               funcs: Seq[SynthAgg])
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    def aggVals(chans: Array[Int]): Seq[Any] =
      SyntheticAggValues.aggVals(funcs, chans, p.nTime)
    if (grouped)
      p.chans.iterator.map(c =>
        new GenericInternalRow((Seq[Any](c) ++ aggVals(Array(c))).toArray))
    else
      Iterator.single(new GenericInternalRow(aggVals(p.chans).toArray))
  }

  private var cur: InternalRow = _
  override def next(): Boolean = {
    if (!rows.hasNext) return false
    cur = rows.next(); true
  }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}

final class SyntheticScan(nTime: Int, seed: Long, chPerPart: Int,
                          chLo: Int, chHi: Int, chSet: Option[Set[Int]],
                          required: StructType, columnar: Boolean = true)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering with SupportsReportPartitioning {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // --- storage-partitioned join (KeyGroupedPartitioning) ------------------
  // With channelsPerPartition=1 every InputPartition holds exactly one
  // channel, so the scan IS key-grouped on `channel` (each partition
  // carries its key via HasPartitionKey). Under
  // spark.sql.sources.v2.bucketing.enabled, a channel-keyed join between
  // two such scans plans with NO Exchange on either side — the V2
  // equivalent of co-located bucketed tables, and the shuffle-elision that
  // matters most at 100 TB (the reference's chunk-key locality,
  // wavelet_transform.py:231-232, expressed as a Spark partitioning
  // contract). Only claimed when `channel` survives column pruning: the
  // identity transform must reference a column of the scan OUTPUT.
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (chPerPart == 1 && required.fieldNames.contains("channel"))
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .identity("channel")),
        channels.size)
    else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
        ((channels.size + chPerPart - 1) / chPerPart).max(0))

  // --- runtime (dynamic) partition pruning --------------------------------
  // A join on `channel` against a filtered dim injects a DPP subquery; at
  // runtime Spark hands the dim's surviving keys to filter() BEFORE
  // planInputPartitions, so whole channel partitions vanish without a row
  // generated — the DSv2 equivalent of q326's parquet partition pruning.
  private var runtimeSet: Option[Set[Int]] = None

  // only advertise `channel` while it survives column pruning: Spark
  // resolves filterAttributes against the scan OUTPUT and throws on a
  // pruned column (a channel-free projection can't be runtime-filtered
  // anyway)
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (required.fieldNames.contains("channel"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("channel"))
    else Array.empty

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case sources.In("channel", vs) =>
      val s = vs.collect { case n: Number => n.intValue() }.toSet
      runtimeSet = Some(runtimeSet.map(_.intersect(s)).getOrElse(s))
    case sources.EqualTo("channel", v: Number) =>
      val s = Set(v.intValue())
      runtimeSet = Some(runtimeSet.map(_.intersect(s)).getOrElse(s))
    case _ => () // unsupported runtime predicates are simply not applied
  }

  /** Exact (not estimated) statistics — the lattice row count is known in
    * closed form AFTER filter pushdown, so the planner sizes joins against
    * the pruned scan rather than the conf default (Long.Max bytes, which
    * would never auto-broadcast a synthetic side no matter how small the
    * pruned channel range is). Bytes: 4 (channel) + 4 (t) + 8 (value) per
    * retained column. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = channels.size.toLong * nTime
    private val rowBytes = required.fieldNames.map {
      case "value" => 8L
      case _ => 4L
    }.sum.max(1L)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * rowBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }
  override def description(): String =
    s"graft-synthetic channels=[$chLo..$chHi]" +
      chSet.map(s => s" in {${s.toSeq.sorted.mkString(",")}}").getOrElse("") +
      s" columns=${required.fieldNames.mkString(",")}"

  private def channels: Seq[Int] = {
    val base = chLo to chHi
    val planned = chSet.map(s => base.filter(s.contains)).getOrElse(base)
    runtimeSet.map(s => planned.filter(s.contains)).getOrElse(planned)
  }

  override def planInputPartitions(): Array[InputPartition] =
    channels.grouped(chPerPart)
      .map(g => SyntheticPartition(g.toArray, nTime, seed): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required, columnar)
}

final case class SyntheticPartition(chans: Array[Int], nTime: Int, seed: Long)
    extends InputPartition with HasPartitionKey {
  /** Meaningful only under channelsPerPartition=1 (the only shape for which
    * the scan reports KeyGroupedPartitioning — Spark never consults the key
    * otherwise). */
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](chans(0)))
}

final class SyntheticReaderFactory(required: StructType,
                                   columnar: Boolean = true)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SyntheticReader(p.asInstanceOf[SyntheticPartition], required)

  // Vectorized path: the row iterator costs a GenericInternalRow + boxed
  // getters per LATTICE POINT (measured ~2.5 s for a 640M-point walk);
  // batches fill primitive column vectors directly and feed the codegen'd
  // ColumnarToRow, the same shape the parquet vectorized reader uses.
  override def supportColumnarReads(p: InputPartition): Boolean = columnar
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new SyntheticColumnarReader(p.asInstanceOf[SyntheticPartition], required)
}

/** Vectorized reader: per channel, the trace generates once and slices
  * into `batchSize`-row ColumnarBatches of primitive vectors. Column
  * pruning still applies — a value-free projection never generates a
  * trace. */
final class SyntheticColumnarReader(p: SyntheticPartition,
                                    required: StructType)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector

  private val batchSize = 4096
  private val needValue = required.fieldNames.contains("value")
  private var chIdx = 0
  private var t = 0 // next time index to emit within the current channel
  private var trace: Array[Double] = _

  // One vector set + batch for the reader's lifetime, reset() per batch —
  // the same reuse discipline as Spark's parquet vectorized reader. A
  // fresh allocation per 4096-row batch is pure GC churn on long scans
  // (~156k allocations per 640M-point walk).
  private val vectors = OnHeapColumnVector.allocateColumns(batchSize, required)
  private val batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
    vectors.map(v => v: org.apache.spark.sql.vectorized.ColumnVector))

  override def next(): Boolean = {
    if (chIdx >= p.chans.length) return false
    if (t >= p.nTime) {
      chIdx += 1; t = 0; trace = null
      if (chIdx >= p.chans.length) return false
    }
    if (needValue && trace == null)
      trace = graft.model.Synthetic.rawTraceForSource(p.nTime, p.seed, p.chans(chIdx))
    val n = math.min(batchSize, p.nTime - t)
    required.fieldNames.zipWithIndex.foreach {
      case ("channel", i) =>
        vectors(i).reset()
        var j = 0
        while (j < n) { vectors(i).putInt(j, p.chans(chIdx)); j += 1 }
      case ("t", i) =>
        vectors(i).reset()
        var j = 0
        while (j < n) { vectors(i).putInt(j, t + j); j += 1 }
      case ("value", i) =>
        vectors(i).reset()
        vectors(i).putDoubles(0, n, trace, t)
      case (other, _) =>
        throw new IllegalArgumentException(s"unknown column $other")
    }
    batch.setNumRows(n)
    t += n
    true
  }

  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch
  override def close(): Unit = batch.close() // closes the owned vectors too
}

/** Generates one channel's trace at a time; `value` is only computed when
  * the pruned schema asks for it (column pruning skips the Gaussian
  * trace entirely for channel/t-only scans). */
final class SyntheticReader(p: SyntheticPartition, required: StructType)
    extends PartitionReader[InternalRow] {

  private val needValue = required.fieldNames.contains("value")
  private val fieldGetters: Array[(Int, Int) => Any] =
    required.fieldNames.map {
      case "channel" => (ci: Int, t: Int) => p.chans(ci)
      case "t" => (ci: Int, t: Int) => t
      case "value" => (ci: Int, t: Int) => trace(t)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }

  private var chIdx = 0
  private var t = -1
  private var trace: Array[Double] = _

  override def next(): Boolean = {
    if (chIdx >= p.chans.length) return false
    t += 1
    if (t >= p.nTime) {
      chIdx += 1; t = 0; trace = null
      if (chIdx >= p.chans.length) return false
    }
    if (trace == null)
      trace =
        if (needValue)
          graft.model.Synthetic.rawTraceForSource(p.nTime, p.seed, p.chans(chIdx))
        else Array.empty[Double]
    true
  }

  override def get(): InternalRow =
    new GenericInternalRow(fieldGetters.map(g => g(chIdx, t)))

  override def close(): Unit = ()
}
