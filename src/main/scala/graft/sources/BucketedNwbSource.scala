package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.{InitContext, ReadSupport}
import org.apache.parquet.hadoop.api.ReadSupport.ReadContext
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.{Binary, Converter, GroupConverter, PrimitiveConverter, RecordMaterializer}
import org.apache.parquet.schema.{GroupType, MessageType, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Literal, Murmur3Hash, Pmod}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 READ path for the channel-bucketed processing store
  * (`NwbStore.writeProcessingBucketed`): presents the bucket layout a V1
  * `bucketBy(n, "channel")` write left on disk as a
  * `KeyGroupedPartitioning(identity(channel))` scan, so channel-keyed
  * joins between two STORED series plan with zero Exchange — the same
  * storage-partitioned-join contract the synthetic scan certifies (q361),
  * now over real files. The V1 catalog read (`spark.table`) elides the
  * shuffle only while the writing session's catalog entry lives; this
  * read needs nothing but the files plus two layout facts (`nbuckets`,
  * `nchannels`), so a NEW session — or a 1000-executor job that never saw
  * the writer's catalog — still gets the co-located join.
  *
  * Layout contract (exactly what Spark's bucketed write produces):
  *  - file `..._NNNNN.<ext>` belongs to bucket NNNNN
  *    (`BucketingUtils`' naming);
  *  - a row with channel c sits in bucket pmod(murmur3(c), nbuckets) —
  *    recomputed here with the same catalyst expressions the writer's
  *    `HashPartitioning.partitionIdExpression` used, so placement can
  *    never drift from Spark's;
  *  - channels are dense 0..nchannels-1 (the store's electrode ids).
  *
  * One InputPartition per CHANNEL (identity transforms need no function
  * catalog — a `bucket` transform would resolve only through a V2
  * FunctionCatalog, unavailable on the plain reader path): partition c
  * reads only bucket(c)'s files under a pushed `channel = c` parquet
  * predicate. The write sorted in-bucket by channel, so row-group stats
  * make that predicate skip everything but c's contiguous groups — the
  * per-channel over-read is bounded by row-group granularity, not bucket
  * size. Columns are pruned down to the requested projection
  * (`SupportsPushDownRequiredColumns` → parquet requested-schema
  * projection). Primitive columns only (int/bigint/float/double/boolean/
  * string/binary) — the long-form series shape the bucketed store holds.
  */
class BucketedNwbSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-nwb-bucketed"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BucketedNwbSource.footerSchema(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new BucketedNwbTable(schema, new CaseInsensitiveStringMap(properties))
}

object BucketedNwbSource {

  /** Spark's bucketed-file naming (`BucketingUtils.getBucketId`): the
    * `_NNNNN` group right before the (optional) extension. */
  private val bucketedFileName = """.*_(\d+)(?:\..*)?$""".r

  private[sources] def bucketIdOf(fileName: String): Option[Int] =
    fileName match {
      case bucketedFileName(id) => Some(id.toInt)
      case _ => None
    }

  /** The writer's placement function, recomputed via the SAME catalyst
    * expressions `HashPartitioning.partitionIdExpression` evaluates at
    * write time: pmod(murmur3_hash(channel), nBuckets). */
  private[sources] def bucketOfChannel(channel: Int, nBuckets: Int): Int =
    Pmod(new Murmur3Hash(Seq(Literal(channel))), Literal(nBuckets))
      .eval(null).asInstanceOf[Int]

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-nwb-bucketed requires a path")
    p
  }

  private[sources] def intOption(options: CaseInsensitiveStringMap,
                                 key: String): Int = {
    val v = options.get(key)
    require(v != null, s"graft-nwb-bucketed requires option '$key'")
    v.toInt
  }

  /** Data files under the root, keyed by bucket id (skips markers). */
  private[sources] def bucketFiles(path: String,
                                   nBuckets: Int): Map[Int, Seq[String]] = {
    val root = new Path(path)
    val fs = root.getFileSystem(NwbSink.sharedConf)
    val files = fs.listStatus(root).filter(_.isFile)
      .map(_.getPath)
      .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))
    val byBucket = files.flatMap { p =>
      bucketIdOf(p.getName).map(b => b -> p.toString)
    }
    byBucket.foreach { case (b, f) =>
      require(b < nBuckets,
        s"graft-nwb-bucketed: file $f has bucket id $b >= nbuckets=$nBuckets " +
          "— the nbuckets option does not match the written layout")
    }
    byBucket.groupBy(_._1).map { case (b, fs0) =>
      b -> fs0.map(_._2).sorted.toSeq
    }
  }

  /** Plan-time layout sanity pass: every row-group's `channel` stats must
    * sit inside [0, nchannels). The scan plans ONE partition per declared
    * channel, so a store row with a channel outside the contract (a
    * mis-declared `nchannels` option, a corrupted store) would be read by
    * NO partition — silent data loss. This footer sweep turns that into a
    * LOUD plan-time failure. Metadata-only (footers, never data pages),
    * O(files) driver-side; stores too large for a driver footer sweep can
    * opt out with `option("validate", "false")` — and then own the
    * contract themselves. */
  private[sources] def validateChannelStats(byBucket: Map[Int, Seq[String]],
                                            nChannels: Int): Unit = {
    import scala.jdk.CollectionConverters._
    byBucket.values.flatten.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f), NwbSink.sharedConf))
      try reader.getFooter.getBlocks.asScala.foreach { b =>
        b.getColumns.asScala
          .filter(_.getPath.toDotString == "channel")
          .foreach { c =>
            val st = c.getStatistics
            require(st != null && !st.isEmpty && st.hasNonNullValue,
              s"graft-nwb-bucketed: $f has a row group without `channel` " +
                "statistics — the [0, nchannels) layout contract cannot be " +
                "verified (pass validate=false only if the contract is " +
                "certain)")
            val mn = st.genericGetMin.asInstanceOf[Number].intValue()
            val mx = st.genericGetMax.asInstanceOf[Number].intValue()
            require(mn >= 0 && mx < nChannels,
              s"graft-nwb-bucketed: $f holds channels [$mn, $mx] outside " +
                s"the declared contract [0, ${nChannels - 1}] — such rows " +
                "would be read by NO per-channel partition (silent data " +
                "loss); fix the nchannels option or the store")
          }
      } finally reader.close()
    }
  }

  /** Schema inference from one footer (primitive columns only). */
  private[sources] def footerSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = pathOf(options)
    val nBuckets = intOption(options, "nbuckets")
    val files = bucketFiles(path, nBuckets).values.flatten.toSeq.sorted
    require(files.nonEmpty, s"graft-nwb-bucketed: no bucketed data files under $path")
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(files.head), NwbSink.sharedConf))
    val msg = try reader.getFooter.getFileMetaData.getSchema finally reader.close()
    StructType(msg.getFields.toArray.map { f =>
      val t = f.asInstanceOf[org.apache.parquet.schema.Type]
      require(t.isPrimitive,
        s"graft-nwb-bucketed: non-primitive column '${t.getName}' unsupported")
      val p = t.asPrimitiveType()
      val dt = p.getPrimitiveTypeName match {
        case PrimitiveTypeName.INT32 => IntegerType
        case PrimitiveTypeName.INT64 => LongType
        case PrimitiveTypeName.DOUBLE => DoubleType
        case PrimitiveTypeName.FLOAT => FloatType
        case PrimitiveTypeName.BOOLEAN => BooleanType
        case PrimitiveTypeName.BINARY =>
          if (p.getLogicalTypeAnnotation ==
              org.apache.parquet.schema.LogicalTypeAnnotation.stringType())
            StringType
          else BinaryType
        case other => throw new IllegalArgumentException(
          s"graft-nwb-bucketed: unsupported parquet type $other for '${t.getName}'")
      }
      StructField(t.getName,
        dt,
        nullable = t.getRepetition != org.apache.parquet.schema.Type.Repetition.REQUIRED)
    })
  }
}

final class BucketedNwbTable(schema0: StructType,
                             options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  private val path = BucketedNwbSource.pathOf(options)

  override def name(): String = s"graft_nwb_bucketed($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new BucketedNwbScanBuilder(path, schema0,
      BucketedNwbSource.intOption(options, "nbuckets"),
      BucketedNwbSource.intOption(options, "nchannels"),
      options.getBoolean("validate", true))
}

final class BucketedNwbScanBuilder(path: String, full: StructType,
                                   nBuckets: Int, nChannels: Int,
                                   validate: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new BucketedNwbScan(path, full, required, nBuckets, nChannels, validate)
}

final class BucketedNwbScan(path: String, full: StructType,
                            required: StructType, nBuckets: Int,
                            nChannels: Int, validate: Boolean = true)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsReportStatistics {

  require(full.fieldNames.contains("channel") &&
      full("channel").dataType == IntegerType,
    "graft-nwb-bucketed: the stored schema must carry an INT `channel` " +
      "column (the bucketing key)")

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private lazy val byBucket = BucketedNwbSource.bucketFiles(path, nBuckets)

  /** One partition per channel, keyed by its channel value — the claim
    * EnsureRequirements needs to zip two stored scans without an
    * Exchange. Only made while `channel` survives column pruning (an
    * identity transform must reference a column of the scan output). */
  override def outputPartitioning(): Partitioning =
    if (required.fieldNames.contains("channel"))
      new KeyGroupedPartitioning(
        Array(Expressions.identity("channel")), nChannels)
    else new UnknownPartitioning(nChannels)

  override def estimateStatistics(): Statistics = new Statistics {
    // file bytes of every planned bucket; rows unknown without footers
    private val bytes = {
      val fs = new Path(path).getFileSystem(NwbSink.sharedConf)
      byBucket.values.flatten
        .map(f => fs.getFileStatus(new Path(f)).getLen).sum
    }
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes.max(1L))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  override def description(): String =
    s"graft-nwb-bucketed path=$path nbuckets=$nBuckets nchannels=$nChannels " +
      s"columns=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    // loud-failure contract: rows with channel ∉ [0, nchannels) belong to
    // no per-channel partition, so verify the footer stats before planning
    if (validate) BucketedNwbSource.validateChannelStats(byBucket, nChannels)
    (0 until nChannels).map { c =>
      val files = byBucket
        .getOrElse(BucketedNwbSource.bucketOfChannel(c, nBuckets), Seq.empty)
      BucketedNwbPartition(c, files.toArray): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BucketedNwbReaderFactory(required)
}

final case class BucketedNwbPartition(channel: Int, files: Array[String])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](channel))
}

final class BucketedNwbReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new BucketedNwbReader(p.asInstanceOf[BucketedNwbPartition], required)
}

/** Streams the partition's bucket files through parquet-mr with a pushed
  * `channel = c` predicate (row-group + record level — the in-bucket sort
  * makes the row-group skip effective) and a requested-schema projection.
  * `channel` is force-included in the READ projection so the predicate
  * stays evaluable when the query pruned it; emitted rows carry only the
  * required columns (the read projection lists them first). */
final class BucketedNwbReader(p: BucketedNwbPartition, required: StructType)
    extends PartitionReader[InternalRow] {

  private val readStruct =
    if (required.fieldNames.contains("channel")) required
    else StructType(required.fields :+ StructField("channel", IntegerType))

  private val files = p.files.iterator
  private var reader: ParquetReader[InternalRow] = _
  private var cur: InternalRow = _

  private def nextReader(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (!files.hasNext) return false
    val f = files.next()
    reader = new BucketedNwbReaderBuilder(new Path(f), readStruct)
      .withConf(NwbSink.sharedConf)
      .withFilter(FilterCompat.get(FilterApi.eq(
        FilterApi.intColumn("channel"), Int.box(p.channel))))
      .build()
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (reader == null && !nextReader()) return false
      val row = reader.read()
      if (row != null) {
        cur =
          if (readStruct.length == required.length) row
          else {
            // drop the force-read trailing `channel`
            val vals = new Array[Any](required.length)
            var i = 0
            while (i < required.length) {
              vals(i) = row.get(i, required.fields(i).dataType); i += 1
            }
            new GenericInternalRow(vals)
          }
        return true
      }
      reader.close(); reader = null
    }
    false // unreachable
  }

  override def get(): InternalRow = cur

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}

private[sources] final class BucketedNwbReaderBuilder(
    file: Path, required: StructType)
    extends ParquetReader.Builder[InternalRow](file) {
  override def getReadSupport: ReadSupport[InternalRow] =
    new NwbRowReadSupport(required)
}

/** Minimal parquet-mr ReadSupport producing `InternalRow` directly (the
  * read-side mirror of [[NwbRowWriteSupport]]): the requested projection
  * is assembled from the FILE's own field types (exact repetition/type
  * match, parquet-mr prunes the rest), and a flat converter tree writes
  * primitives straight into a reusable value buffer — no Group tree, no
  * String detour. */
final class NwbRowReadSupport(required: StructType)
    extends ReadSupport[InternalRow] {

  override def init(context: InitContext): ReadContext = {
    val fileSchema = context.getFileSchema
    val fields = required.fields.map { f =>
      require(fileSchema.containsField(f.name),
        s"graft-nwb-bucketed: column '${f.name}' not present in file")
      fileSchema.getType(fileSchema.getFieldIndex(f.name))
    }
    new ReadContext(new MessageType(fileSchema.getName, fields: _*))
  }

  override def prepareForRead(conf: Configuration,
      keyValueMetaData: util.Map[String, String], fileSchema: MessageType,
      readContext: ReadContext): RecordMaterializer[InternalRow] =
    new NwbRowMaterializer(readContext.getRequestedSchema, required)
}

final class NwbRowMaterializer(requested: GroupType, required: StructType)
    extends RecordMaterializer[InternalRow] {

  private val buf = new Array[Any](required.length)

  private val root: GroupConverter = new GroupConverter {
    private val converters: Array[Converter] =
      required.fields.zipWithIndex.map { case (f, i) =>
        val pt = requested.getType(i)
        require(pt.isPrimitive,
          s"graft-nwb-bucketed: non-primitive column '${f.name}' unsupported")
        primitiveConverter(pt.asPrimitiveType(), f.dataType, i): Converter
      }
    override def getConverter(fieldIndex: Int): Converter = converters(fieldIndex)
    override def start(): Unit = java.util.Arrays.fill(
      buf.asInstanceOf[Array[AnyRef]], null)
    override def end(): Unit = ()
  }

  private def primitiveConverter(pt: PrimitiveType, dt: DataType,
                                 i: Int): PrimitiveConverter =
    (pt.getPrimitiveTypeName, dt) match {
      case (PrimitiveTypeName.INT32, IntegerType) => new PrimitiveConverter {
        override def addInt(v: Int): Unit = buf(i) = v
      }
      case (PrimitiveTypeName.INT64, LongType) => new PrimitiveConverter {
        override def addLong(v: Long): Unit = buf(i) = v
      }
      case (PrimitiveTypeName.DOUBLE, DoubleType) => new PrimitiveConverter {
        override def addDouble(v: Double): Unit = buf(i) = v
      }
      case (PrimitiveTypeName.FLOAT, FloatType) => new PrimitiveConverter {
        override def addFloat(v: Float): Unit = buf(i) = v
      }
      case (PrimitiveTypeName.BOOLEAN, BooleanType) => new PrimitiveConverter {
        override def addBoolean(v: Boolean): Unit = buf(i) = v
      }
      case (PrimitiveTypeName.BINARY, StringType) => new PrimitiveConverter {
        override def addBinary(v: Binary): Unit =
          buf(i) = UTF8String.fromBytes(v.getBytes)
      }
      case (PrimitiveTypeName.BINARY, BinaryType) => new PrimitiveConverter {
        override def addBinary(v: Binary): Unit = buf(i) = v.getBytes
      }
      case (ptn, other) => throw new IllegalArgumentException(
        s"graft-nwb-bucketed: file type $ptn does not match requested " +
          s"${other.sql} for column ${requested.getFieldName(i)}")
    }

  override def getCurrentRecord: InternalRow =
    new GenericInternalRow(buf.clone())

  override def getRootConverter: GroupConverter = root
}
