package graft.sources

import java.util
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileWriter
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `graft-nwb` WRITE path: the store's sink as a first-class
  * connector with the full two-phase commit protocol, so the NWB namespace
  * can be the target of `df.write.format("graft-nwb").save(path)` on a real
  * cluster with task retries and speculative execution in play:
  *
  *  - every task writes ONE staged file `part-<partition>-<task>-<uuid>`
  *    under `<path>/_staging_<queryId>/` and names it in its
  *    `WriterCommitMessage`; a retried/speculative attempt stages its own
  *    file, and only the attempt Spark commits is named — orphans die with
  *    the staging dir, so the protocol is exactly-once at the file level;
  *  - job commit (driver) moves ONLY the named files into the target,
  *    drops a `_SUCCESS` marker, and removes staging; job abort removes
  *    staging wholesale. `mode("overwrite")` arrives as TRUNCATE and
  *    clears previously committed part files inside the SAME job commit,
  *    so readers never observe a half-overwritten directory without also
  *    losing the marker;
  *  - files are plain Parquet (zstd, the store's codec) written via
  *    parquet-java's Group API — `spark.read.parquet` and DuckDB read them
  *    back natively, certified by q318's round-trip oracle.
  *
  * Schema support is the store's frame surface: the primitive columns plus
  * `array<double>`/`array<float>` (SegmentFrame `values`). Like the
  * built-in `noop` sink it declares ACCEPT_ANY_SCHEMA and validates the
  * incoming schema on the DRIVER in `build()` — unsupported types fail the
  * job before any task launches. */
class NwbSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-nwb"

  override def supportsExternalMetadata(): Boolean = true

  // write-only connector: the schema is whatever the incoming query has
  // (ACCEPT_ANY_SCHEMA); read the committed files back as plain parquet.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new NwbSinkTable(new CaseInsensitiveStringMap(properties))
}

object NwbSink {
  private[sources] def targetPath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-nwb sink requires a path")
    p
  }

  /** Spark schema -> parquet MessageType (driver-side validation). */
  private[sources] def parquetSchema(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      def prim(t: PrimitiveTypeName) = {
        val p = if (f.nullable) Types.optional(t) else Types.required(t)
        b.addField(p.named(f.name))
      }
      f.dataType match {
        case IntegerType => prim(PrimitiveTypeName.INT32)
        case LongType    => prim(PrimitiveTypeName.INT64)
        case DoubleType  => prim(PrimitiveTypeName.DOUBLE)
        case FloatType   => prim(PrimitiveTypeName.FLOAT)
        case BooleanType => prim(PrimitiveTypeName.BOOLEAN)
        case BinaryType  => prim(PrimitiveTypeName.BINARY)
        case StringType =>
          val p = if (f.nullable) Types.optional(PrimitiveTypeName.BINARY)
                  else Types.required(PrimitiveTypeName.BINARY)
          b.addField(p.as(LogicalTypeAnnotation.stringType()).named(f.name))
        case ArrayType(DoubleType, _) =>
          b.addField(Types.optionalList()
            .requiredElement(PrimitiveTypeName.DOUBLE).named(f.name))
        case ArrayType(FloatType, _) =>
          b.addField(Types.optionalList()
            .requiredElement(PrimitiveTypeName.FLOAT).named(f.name))
        case other => throw new IllegalArgumentException(
          s"graft-nwb sink: unsupported column type ${other.sql} for '${f.name}' " +
            "(supported: int, bigint, double, float, boolean, string, binary, " +
            "array<double>, array<float>)")
      }
    }
    b.named("graft_nwb_frame")
  }
}

final class NwbSinkTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {

  private val path = NwbSink.targetPath(options)

  override def name(): String = s"graft_nwb_sink($path)"
  override def schema(): StructType = StructType(Nil)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new NwbWriteBuilder(path, info, truncate = false)
}

final class NwbWriteBuilder(path: String, info: LogicalWriteInfo,
                            truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder =
    new NwbWriteBuilder(path, info, truncate = true)

  override def build(): Write = {
    // driver-side schema validation: fail before any task launches
    NwbSink.parquetSchema(info.schema())
    new NwbWrite(path, info.queryId(), info.schema(), truncate)
  }
}

final class NwbWrite(path: String, queryId: String, schema: StructType,
                     truncate: Boolean) extends Write {
  override def toBatch: BatchWrite =
    new NwbBatchWrite(path, queryId, schema, truncate)
  override def toStreaming: streaming.StreamingWrite =
    new NwbStreamingWrite(path, queryId, schema)
  override def description(): String =
    s"graft-nwb path=$path truncate=$truncate"
}

final case class NwbCommitMessage(stagedName: String) extends WriterCommitMessage

final class NwbBatchWrite(path: String, queryId: String, schema: StructType,
                          truncate: Boolean) extends BatchWrite {

  private def staging = new Path(path, s"_staging_$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new NwbWriterFactory(path, queryId, schema.json)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    fs.mkdirs(target)
    if (truncate) {
      val old = fs.globStatus(new Path(target, "part-*"))
      if (old != null) old.foreach(s => fs.delete(s.getPath, false))
      fs.delete(new Path(target, "_SUCCESS"), false)
    }
    // move ONLY the files named by committed tasks; orphaned attempts die
    // with the staging dir below
    messages.foreach {
      case NwbCommitMessage(name) =>
        if (!fs.rename(new Path(staging, name), new Path(target, name)))
          throw new java.io.IOException(
            s"graft-nwb commit: failed to publish $name into $target")
      case other => throw new IllegalStateException(s"unexpected message $other")
    }
    fs.create(new Path(target, "_SUCCESS"), true).close()
    fs.delete(staging, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val fs = staging.getFileSystem(conf)
    fs.delete(staging, true)
  }
}

final class NwbWriterFactory(path: String, queryId: String, schemaJson: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new NwbDataWriter(path, queryId,
      DataType.fromJson(schemaJson).asInstanceOf[StructType], partitionId, taskId)
}

/** Streaming (micro-batch) side of the sink: tasks stage per-epoch files
  * (epoch id baked into the name), and the driver commits each epoch
  * IDEMPOTENTLY — a `_committed/epoch-<id>` marker is checked first, so a
  * replayed epoch (driver restart re-running a committed batch) publishes
  * nothing twice. That marker + staged-rename protocol is what makes the
  * sink exactly-once under the micro-batch recovery contract. */
final class NwbStreamingWrite(path: String, queryId: String,
                              schema: StructType)
    extends streaming.StreamingWrite {

  private def staging = new Path(path, s"_staging_$queryId")
  private def marker(epochId: Long) =
    new Path(new Path(path, "_committed"), s"epoch-$epochId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory =
    new NwbStreamingWriterFactory(path, queryId, schema.json)

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    fs.mkdirs(target)
    if (fs.exists(marker(epochId))) {
      // epoch replay after recovery: already published, drop the re-staged
      // attempt wholesale
      messages.foreach {
        case NwbCommitMessage(name) => fs.delete(new Path(staging, name), false)
        case _ =>
      }
      return
    }
    messages.foreach {
      case NwbCommitMessage(name) =>
        if (!fs.rename(new Path(staging, name), new Path(target, name)))
          throw new java.io.IOException(
            s"graft-nwb epoch $epochId: failed to publish $name")
      case other => throw new IllegalStateException(s"unexpected message $other")
    }
    fs.mkdirs(new Path(path, "_committed"))
    fs.create(marker(epochId), true).close()
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val fs = staging.getFileSystem(conf)
    messages.foreach {
      case NwbCommitMessage(name) => fs.delete(new Path(staging, name), false)
      case _ =>
    }
  }
}

final class NwbStreamingWriterFactory(path: String, queryId: String,
                                      schemaJson: String)
    extends streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new NwbDataWriter(path, queryId,
      DataType.fromJson(schemaJson).asInstanceOf[StructType], partitionId,
      taskId, epochTag = s"e$epochId-")
}

/** One staged zstd parquet file per task attempt; the attempt's commit
  * message names it, nothing else touches the target directory. */
final class NwbDataWriter(path: String, queryId: String, schema: StructType,
                          partitionId: Int, taskId: Long,
                          epochTag: String = "")
    extends DataWriter[InternalRow] {

  private val fileName =
    f"part-$epochTag$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.zstd.parquet"
  private val staged = new Path(new Path(path, s"_staging_$queryId"), fileName)
  private val msgType = NwbSink.parquetSchema(schema)
  private val conf = {
    val c = new Configuration()
    GroupWriteSupport.setSchema(msgType, c)
    c
  }
  private val writer = ExampleParquetWriter.builder(staged)
    .withConf(conf)
    .withType(msgType)
    .withCompressionCodec(CompressionCodecName.ZSTD)
    .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
    .build()
  private val factory = new SimpleGroupFactory(msgType)

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val name = schema(i).name
        schema(i).dataType match {
          case IntegerType => g.add(name, row.getInt(i))
          case LongType    => g.add(name, row.getLong(i))
          case DoubleType  => g.add(name, row.getDouble(i))
          case FloatType   => g.add(name, row.getFloat(i))
          case BooleanType => g.add(name, row.getBoolean(i))
          case StringType  => g.add(name, row.getUTF8String(i).toString)
          case BinaryType  => g.add(name, Binary.fromConstantByteArray(row.getBinary(i)))
          case ArrayType(DoubleType, _) =>
            val arr = row.getArray(i)
            val outer = g.addGroup(name)
            var j = 0
            while (j < arr.numElements()) {
              outer.addGroup("list").add("element", arr.getDouble(j)); j += 1
            }
          case ArrayType(FloatType, _) =>
            val arr = row.getArray(i)
            val outer = g.addGroup(name)
            var j = 0
            while (j < arr.numElements()) {
              outer.addGroup("list").add("element", arr.getFloat(j)); j += 1
            }
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
      }
      i += 1
    }
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    NwbCommitMessage(fileName)
  }

  override def abort(): Unit = {
    writer.close()
    val fs = staged.getFileSystem(conf)
    fs.delete(staged, false)
  }

  override def close(): Unit = ()
}
