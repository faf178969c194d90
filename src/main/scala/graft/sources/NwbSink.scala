package graft.sources

import java.util
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetWriter}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.api.WriteSupport.WriteContext
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.{Binary, RecordConsumer}
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
  *  - every task writes ONE staged file under `<path>/_staging_<queryId>/`
  *    (task-attempt-unique name) and names it in its `WriterCommitMessage`;
  *    a retried/speculative attempt stages its own file, and only the
  *    attempt Spark commits is named — orphans die with the staging dir, so
  *    the protocol is exactly-once at the file level;
  *  - BATCH job commit (driver) moves ONLY the named files into the target,
  *    drops a `_SUCCESS` marker, and removes staging; job abort removes
  *    staging wholesale. `mode("overwrite")` arrives as TRUNCATE and
  *    clears previously committed part files inside the SAME job commit,
  *    so readers never observe a half-overwritten directory without also
  *    losing the marker;
  *  - STREAMING epoch commit publishes each partition's staged file under a
  *    DETERMINISTIC final name `part-e<epoch>-<partition>.zstd.parquet`,
  *    skipping any (epoch, partition) whose final file already exists, and
  *    only then writes the `_committed/epoch-<id>` marker. A driver crash
  *    at ANY point is therefore safe: replaying the epoch re-publishes only
  *    the partitions that did not land, never a second copy (the marker
  *    alone would not be enough — a crash between the renames and the
  *    marker write used to duplicate the whole epoch under UUID names).
  *    Epoch commit also prunes this epoch's orphaned attempts from staging
  *    and, on the run's first publish, removes stale `_staging_*` dirs left
  *    by previous runs (the sink is single-writer per target directory, as
  *    the epoch-marker namespace already requires);
  *  - files are plain Parquet (zstd, the store's codec) written through a
  *    direct `RecordConsumer` WriteSupport over `InternalRow` — no per-row
  *    Group object tree, no UTF8String→String detour — so the sink's write
  *    CPU tracks Spark's own row-wise parquet writer. `spark.read.parquet`
  *    and DuckDB read the files back natively, certified by q318's
  *    round-trip oracle.
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
  /** One read-only Hadoop conf per executor JVM: `new Configuration()`
    * parses the default XML resources every time — a measurable per-task
    * tax when 32 writers spin up together. Writers never mutate it. */
  private[sources] lazy val sharedConf = new Configuration()

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

/** SupportsStreamingUpdateAsAppend: Update-mode stateful queries (e.g.
  * transformWithState census folds) write their per-epoch UPDATE rows as
  * appends — the reader resolves last-per-key, the same contract the
  * memory-sink census queries (q343/q344) use. */
final class NwbWriteBuilder(path: String, info: LogicalWriteInfo,
                            truncate: Boolean)
    extends WriteBuilder with SupportsTruncate
    with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend {

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

final case class NwbCommitMessage(stagedName: String, partitionId: Int)
    extends WriterCommitMessage

/** Fault-injection hooks for crash-recovery certification (the
  * FaultInjectionSoak): a soak arms a hook, runs a real streaming query,
  * and the sink fails at the EXACT point the recovery contract protects.
  * Never armed by any production path — both hooks default to off and
  * auto-disarm after firing once. Single-JVM (local-mode) scope by design:
  * the soaks run driver and executors in one process. */
object NwbFailpoints {
  /** Master switch, captured ONCE per data writer at construction: in a
    * production JVM it is never set, so the writer's per-row failpoint
    * branch reads a final `false` field and JIT-eliminates — no
    * fault-injection surface in the hot write() path. Soaks call `arm()`
    * BEFORE starting their query (writers are constructed per task,
    * after arming). */
  @volatile var armed: Boolean = false
  def arm(): Unit = { armed = true }
  /** Driver-side: commit of THIS epoch throws after publishing every
    * partition file but BEFORE writing the marker — the window the
    * pre-publish manifest + marker fill-in protect. */
  val crashBeforeMarkerAtEpoch = new java.util.concurrent.atomic.AtomicLong(-1L)
  /** Executor-side: the first data writer to reach `writerFailAfterRows`
    * rows throws ONCE — exercising task retry + abort's staging cleanup
    * mid-batch. */
  val writerFailOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
  val writerFailAfterRows = 10
  def reset(): Unit = {
    armed = false
    crashBeforeMarkerAtEpoch.set(-1L)
    writerFailOnce.set(false)
  }
}

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
      case NwbCommitMessage(name, _) =>
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

/** Streaming (micro-batch) side of the sink: tasks stage per-epoch files,
  * and the driver publishes each partition under the DETERMINISTIC name
  * `part-e<epoch>-<partition>.zstd.parquet` — skipping names that already
  * exist — before writing the `_committed/epoch-<id>` marker. Both halves
  * of a crash are therefore idempotent: a replay after the marker landed
  * publishes nothing (marker short-circuit), and a replay after a PARTIAL
  * publish (crash between renames and marker) fills in only the missing
  * partitions, because the deterministic names make the already-published
  * ones visible. That is what makes the sink exactly-once under the
  * micro-batch recovery contract, not just under clean restarts. */
final class NwbStreamingWrite(path: String, queryId: String,
                              schema: StructType)
    extends streaming.StreamingWrite {

  private def staging = new Path(path, s"_staging_$queryId")
  private def marker(epochId: Long) =
    new Path(new Path(path, "_committed"), s"epoch-$epochId")
  /** Pre-publish manifest: the sorted final-name list this epoch WILL
    * publish, written before the first rename. A crash between publish and
    * marker leaves it behind; the replayed commit must present the exact
    * same name set, or the recovery ran under changed parallelism and the
    * fill-in would silently mix pre-crash and replayed partition files —
    * fail loudly instead. Deleted once the marker lands. */
  private def manifest(epochId: Long) =
    new Path(new Path(path, "_committed"), s"epoch-$epochId.inprogress")
  private def finalName(epochId: Long, partitionId: Int) =
    f"part-e$epochId-$partitionId%05d.zstd.parquet"
  // purge stale _staging_* dirs from previous runs once per run, on the
  // first real publish (never on the replay short-circuit path)
  @volatile private var purgedStale = false

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
        case NwbCommitMessage(name, _) =>
          fs.delete(new Path(staging, name), false)
        case _ =>
      }
      // crash between marker write and manifest delete leaves a stale
      // .inprogress file; clear it on the replay path
      fs.delete(manifest(epochId), false)
      return
    }
    if (!purgedStale) {
      val dirs = fs.globStatus(new Path(target, "_staging_*"))
      if (dirs != null) dirs.foreach { d =>
        if (d.getPath.getName != staging.getName) fs.delete(d.getPath, true)
      }
      purgedStale = true
    }
    val expected = messages.collect {
      case NwbCommitMessage(_, pid) => finalName(epochId, pid)
    }.sorted
    val man = manifest(epochId)
    if (fs.exists(man)) {
      val in = fs.open(man)
      // blank-line filter: an all-empty-partition epoch's manifest (or a
      // trailing newline) must read back as Vector(), not Vector("") —
      // otherwise a crash-replay of an empty epoch throws the
      // parallelism-changed error forever and the query can never recover
      val prior = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toVector finally in.close()
      if (prior != expected.toVector)
        throw new java.io.IOException(
          s"graft-nwb epoch $epochId: recovery replay produced partition set " +
            s"[${expected.mkString(",")}] but the interrupted publish had " +
            s"committed toward [${prior.mkString(",")}] — parallelism changed " +
            "between restarts; refusing to mix partition files within one epoch")
    } else if (expected.nonEmpty) {
      fs.mkdirs(new Path(path, "_committed"))
      val out = fs.create(man, true)
      try out.write((expected.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    messages.foreach {
      case NwbCommitMessage(name, pid) =>
        val dst = new Path(target, finalName(epochId, pid))
        if (fs.exists(dst)) {
          // this (epoch, partition) landed before a crash interrupted the
          // previous publish of the same epoch — drop the re-staged copy
          fs.delete(new Path(staging, name), false)
        } else if (!fs.rename(new Path(staging, name), dst)) {
          throw new java.io.IOException(
            s"graft-nwb epoch $epochId: failed to publish $name as $dst")
        }
      case other => throw new IllegalStateException(s"unexpected message $other")
    }
    if (NwbFailpoints.crashBeforeMarkerAtEpoch.compareAndSet(epochId, -1L))
      throw new java.io.IOException(
        s"graft-nwb FAULT INJECTION: crashing epoch $epochId after publish, " +
          "before marker (FaultInjectionSoak)")
    fs.mkdirs(new Path(path, "_committed"))
    fs.create(marker(epochId), true).close()
    fs.delete(man, false)
    // failed/speculative attempts of THIS epoch never get a commit message;
    // prune them now so staging does not accumulate across a long run
    val leftovers = fs.globStatus(new Path(staging, s"part-e$epochId-*"))
    if (leftovers != null) leftovers.foreach(s => fs.delete(s.getPath, false))
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val fs = staging.getFileSystem(conf)
    messages.foreach {
      case NwbCommitMessage(name, _) => fs.delete(new Path(staging, name), false)
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

/** Direct `RecordConsumer` WriteSupport over `InternalRow` — the same
  * row-wise encoding strategy Spark's own parquet writer uses, minus the
  * Group-object materialization the Example API would add per row. Field
  * writers are resolved ONCE per file into an array of closures, so the
  * per-row loop is monomorphic per column. */
private[sources] final class NwbRowWriteSupport(schema: StructType,
                                                msgType: MessageType)
    extends WriteSupport[InternalRow] {

  private var consumer: RecordConsumer = _
  private var writers: Array[InternalRow => Unit] = _

  override def init(conf: Configuration): WriteContext =
    new WriteContext(msgType, new util.HashMap[String, String]())

  override def prepareForWrite(rc: RecordConsumer): Unit = {
    consumer = rc
    writers = schema.fields.zipWithIndex.map { case (f, i) =>
      val name = f.name
      f.dataType match {
        case IntegerType => (row: InternalRow) => consumer.addInteger(row.getInt(i))
        case LongType    => (row: InternalRow) => consumer.addLong(row.getLong(i))
        case DoubleType  => (row: InternalRow) => consumer.addDouble(row.getDouble(i))
        case FloatType   => (row: InternalRow) => consumer.addFloat(row.getFloat(i))
        case BooleanType => (row: InternalRow) => consumer.addBoolean(row.getBoolean(i))
        case StringType  => (row: InternalRow) =>
          consumer.addBinary(
            Binary.fromReusedByteArray(row.getUTF8String(i).getBytes))
        case BinaryType  => (row: InternalRow) =>
          consumer.addBinary(Binary.fromReusedByteArray(row.getBinary(i)))
        case ArrayType(DoubleType, _) => (row: InternalRow) => {
          val arr = row.getArray(i)
          val n = arr.numElements()
          consumer.startGroup()
          if (n > 0) {
            consumer.startField("list", 0)
            var j = 0
            while (j < n) {
              consumer.startGroup()
              consumer.startField("element", 0)
              consumer.addDouble(arr.getDouble(j))
              consumer.endField("element", 0)
              consumer.endGroup()
              j += 1
            }
            consumer.endField("list", 0)
          }
          consumer.endGroup()
        }
        case ArrayType(FloatType, _) => (row: InternalRow) => {
          val arr = row.getArray(i)
          val n = arr.numElements()
          consumer.startGroup()
          if (n > 0) {
            consumer.startField("list", 0)
            var j = 0
            while (j < n) {
              consumer.startGroup()
              consumer.startField("element", 0)
              consumer.addFloat(arr.getFloat(j))
              consumer.endField("element", 0)
              consumer.endGroup()
              j += 1
            }
            consumer.endField("list", 0)
          }
          consumer.endGroup()
        }
        case other =>
          // build() validated the schema on the driver already
          throw new IllegalStateException(s"unreachable: $other for '$name'")
      }
    }
  }

  override def write(row: InternalRow): Unit = {
    consumer.startMessage()
    var i = 0
    while (i < writers.length) {
      if (!row.isNullAt(i)) {
        val name = schema(i).name
        consumer.startField(name, i)
        writers(i)(row)
        consumer.endField(name, i)
      }
      i += 1
    }
    consumer.endMessage()
  }
}

private[sources] final class NwbParquetBuilder(
    file: Path, schema: StructType, msgType: MessageType)
    extends ParquetWriter.Builder[InternalRow, NwbParquetBuilder](file) {
  override def self(): NwbParquetBuilder = this
  override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
    new NwbRowWriteSupport(schema, msgType)
}

/** One staged zstd parquet file per task attempt; the attempt's commit
  * message names it (and its partition id, which the streaming commit uses
  * for the deterministic final name), nothing else touches the target
  * directory. */
final class NwbDataWriter(path: String, queryId: String, schema: StructType,
                          partitionId: Int, taskId: Long,
                          epochTag: String = "")
    extends DataWriter[InternalRow] {

  private val fileName =
    f"part-$epochTag$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.zstd.parquet"
  private val staged = new Path(new Path(path, s"_staging_$queryId"), fileName)
  private val msgType = NwbSink.parquetSchema(schema)
  private val conf = NwbSink.sharedConf
  private val writer = new NwbParquetBuilder(staged, schema, msgType)
    .withConf(conf)
    .withCompressionCodec(CompressionCodecName.ZSTD)
    .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
    .build()

  // captured once at construction: final false in production, so the
  // per-row failpoint branch below is dead code to the JIT
  private val failpointsArmed = NwbFailpoints.armed
  private var rowsWritten = 0

  override def write(row: InternalRow): Unit = {
    writer.write(row)
    if (failpointsArmed) {
      rowsWritten += 1
      if (rowsWritten == NwbFailpoints.writerFailAfterRows &&
          NwbFailpoints.writerFailOnce.compareAndSet(true, false))
        throw new java.io.IOException(
          s"graft-nwb FAULT INJECTION: task failing mid-batch after $rowsWritten " +
            "rows (FaultInjectionSoak)")
    }
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    NwbCommitMessage(fileName, partitionId)
  }

  override def abort(): Unit = {
    writer.close()
    val fs = staged.getFileSystem(conf)
    fs.delete(staged, false)
  }

  override def close(): Unit = ()
}
