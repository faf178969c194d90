package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Growable parallel primitive buffers: the per-group state of the series
  * assembly is the (t_idx, value) pairs seen so far — two packed arrays, no
  * per-sample objects. */
final class PairBuf(var ts: Array[Long], var vs: Array[Double], var n: Int) {
  def add(t: Long, v: Double): Unit = {
    if (n == ts.length) {
      val cap = math.max(16, ts.length * 2)
      ts = java.util.Arrays.copyOf(ts, cap)
      vs = java.util.Arrays.copyOf(vs, cap)
    }
    ts(n) = t
    vs(n) = v
    n += 1
  }
}

/** Native series assembly: collects (t_idx, value) pairs into packed
  * primitive buffers and emits the values ordered by t_idx — the
  * scale-ingest replacement for `collect_list(struct(t_idx, value))` +
  * a placement UDF over the collected struct array. Semantics are identical:
  * dense pair sets (max - min + 1 == n, the declared LongFrame layout)
  * place each value at `t - min` in O(n); gappy sets fall back to a sort
  * by t_idx.
  *
  * Why native instead of collect_list: the generic aggregate boxes every
  * sample into an InternalRow copy inside an ArrayBuffer and serializes
  * partial buffers as struct arrays (~40 B/sample plus per-sample
  * allocation); this buffer appends two primitives (16 B/sample packed on
  * the shuffle wire, zero allocation per sample). Same one-shuffle plan
  * shape — ObjectHashAggregate with map-side partials — just a cheaper
  * payload, which is what the ingest assembly is bound by at soak scale. */
case class AssembleSeries(tIdx: Expression, value: Expression,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PairBuf] with BinaryLike[Expression] {

  override def left: Expression = tIdx
  override def right: Expression = value
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "assemble_series"

  override def checkInputDataTypes(): TypeCheckResult =
    if (tIdx.dataType == LongType && value.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, double), got " +
        s"(${tIdx.dataType.simpleString}, ${value.dataType.simpleString})")

  override def createAggregationBuffer(): PairBuf =
    new PairBuf(new Array[Long](16), new Array[Double](16), 0)

  override def update(buf: PairBuf, input: InternalRow): PairBuf = {
    val t = tIdx.eval(input)
    val v = value.eval(input)
    // null in either slot = no sample at that slot (does not occur in the
    // frame layouts, which declare both columns non-null)
    if (t != null && v != null)
      buf.add(t.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(a: PairBuf, b: PairBuf): PairBuf = {
    var i = 0
    while (i < b.n) { a.add(b.ts(i), b.vs(i)); i += 1 }
    a
  }

  override def eval(buf: PairBuf): Any = {
    val n = buf.n
    if (n == 0) return null
    var minT = Long.MaxValue
    var maxT = Long.MinValue
    var i = 0
    while (i < n) {
      val t = buf.ts(i)
      if (t < minT) minT = t
      if (t > maxT) maxT = t
      i += 1
    }
    val out = new Array[Double](n)
    if (maxT - minT + 1 == n) {
      i = 0
      while (i < n) { out((buf.ts(i) - minT).toInt) = buf.vs(i); i += 1 }
    } else {
      val order = Array.range(0, n).sortBy(buf.ts(_))
      i = 0
      while (i < n) { out(i) = buf.vs(order(i)); i += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def serialize(buf: PairBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ts(i)); i += 1 }
    i = 0
    while (i < buf.n) { bb.putDouble(buf.vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PairBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val ts = new Array[Long](math.max(n, 16))
    val vs = new Array[Double](math.max(n, 16))
    var i = 0
    while (i < n) { ts(i) = bb.getLong; i += 1 }
    i = 0
    while (i < n) { vs(i) = bb.getDouble; i += 1 }
    new PairBuf(ts, vs, n)
  }

  override def withNewMutableAggBufferOffset(offset: Int): AssembleSeries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): AssembleSeries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AssembleSeries =
    copy(tIdx = newLeft, value = newRight)
}

/** Column API + SQL registration, same pattern as TrimmedMeanFunctions. */
object SeriesAssembleFunctions {

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (registered.add(System.identityHashCode(spark).toString)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "assemble_series",
        exprs => AssembleSeries(exprs(0), exprs(1)),
        "built-in")
    }

  /** values ordered by tIdx (O(n) placement when tIdx is dense). */
  def assembleSeries(spark: org.apache.spark.sql.SparkSession,
                     tIdx: Column, value: Column): Column = {
    register(spark)
    call_function("assemble_series", tIdx, value)
  }
}
