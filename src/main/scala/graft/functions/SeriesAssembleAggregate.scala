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
    // null t_idx = no slot: skip. null VALUE at a real slot = missing
    // sample: keep the position as NaN (dropping it would silently shift
    // every later sample; the join-form CAR legitimately yields nulls for
    // absent channels, and NaN is the reference's missing-sample encoding)
    if (t != null)
      buf.add(t.asInstanceOf[Long],
        if (v == null) Double.NaN else v.asInstanceOf[Double])
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
    var placed = maxT - minT + 1 == n
    if (placed) {
      // guard against duplicate t_idx masquerading as dense (range == n but
      // a slot written twice): detected -> sort fallback, like any gap
      val seen = new Array[Boolean](n)
      i = 0
      while (placed && i < n) {
        val idx = (buf.ts(i) - minT).toInt
        if (seen(idx)) placed = false
        else { seen(idx) = true; out(idx) = buf.vs(i) }
        i += 1
      }
    }
    if (!placed) {
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

/** Growable parallel primitive buffers for (ts, event_id, value) triples. */
final class TripleBuf(var ts: Array[Long], var ids: Array[Long],
                      var vs: Array[Double], var n: Int) {
  def add(t: Long, id: Long, v: Double): Unit = {
    if (n == ts.length) {
      val cap = math.max(16, ts.length * 2)
      ts = java.util.Arrays.copyOf(ts, cap)
      ids = java.util.Arrays.copyOf(ids, cap)
      vs = java.util.Arrays.copyOf(vs, cap)
    }
    ts(n) = t
    ids(n) = id
    vs(n) = v
    n += 1
  }
}

/** Native timed assembly: collects (ts, event_id, value) triples into packed
  * primitive buffers and emits `struct(values, ts)` ordered by
  * (ts, event_id, value) — the replacement for
  * `array_sort(collect_list(struct(ts, event_id, value)))`, whose struct
  * comparator runs INTERPRETED per element pair (measured 50x the blocked
  * CAR on the same data at the 640M-point soak for the t_idx variant), on
  * the event-time paths that need the per-sample timestamps kept alongside
  * (streaming crossfade windows) or a total order over raw event triples
  * (the events->segments adapter). Same tie-breaking as array_sort's
  * lexicographic struct order. */
case class AssembleTimed(tsExpr: Expression, idExpr: Expression, valueExpr: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TripleBuf]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  override def first: Expression = tsExpr
  override def second: Expression = idExpr
  override def third: Expression = valueExpr
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("values",
      ArrayType(DoubleType, containsNull = false), nullable = false),
    org.apache.spark.sql.types.StructField("ts",
      ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "assemble_timed"

  override def checkInputDataTypes(): TypeCheckResult =
    if (tsExpr.dataType == LongType && idExpr.dataType == LongType &&
        valueExpr.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, bigint, double), got " +
        s"(${tsExpr.dataType.simpleString}, ${idExpr.dataType.simpleString}, " +
        s"${valueExpr.dataType.simpleString})")

  override def createAggregationBuffer(): TripleBuf =
    new TripleBuf(new Array[Long](16), new Array[Long](16), new Array[Double](16), 0)

  override def update(buf: TripleBuf, input: InternalRow): TripleBuf = {
    val t = tsExpr.eval(input)
    val id = idExpr.eval(input)
    val v = valueExpr.eval(input)
    // null key = no slot: skip; null VALUE at a real slot stays as NaN so
    // later samples keep their positions (same policy as assemble_series)
    if (t != null && id != null)
      buf.add(t.asInstanceOf[Long], id.asInstanceOf[Long],
        if (v == null) Double.NaN else v.asInstanceOf[Double])
    buf
  }

  override def merge(a: TripleBuf, b: TripleBuf): TripleBuf = {
    var i = 0
    while (i < b.n) { a.add(b.ts(i), b.ids(i), b.vs(i)); i += 1 }
    a
  }

  override def eval(buf: TripleBuf): Any = {
    val n = buf.n
    if (n == 0) return null
    val order = new Array[Integer](n)
    var i = 0
    while (i < n) { order(i) = i; i += 1 }
    java.util.Arrays.sort(order, (x: Integer, y: Integer) => {
      val c1 = java.lang.Long.compare(buf.ts(x), buf.ts(y))
      if (c1 != 0) c1
      else {
        val c2 = java.lang.Long.compare(buf.ids(x), buf.ids(y))
        if (c2 != 0) c2 else java.lang.Double.compare(buf.vs(x), buf.vs(y))
      }
    })
    val vs = new Array[Double](n)
    val ts = new Array[Long](n)
    i = 0
    while (i < n) { vs(i) = buf.vs(order(i)); ts(i) = buf.ts(order(i)); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UnsafeArrayData.fromPrimitiveArray(vs),
        UnsafeArrayData.fromPrimitiveArray(ts)))
  }

  override def serialize(buf: TripleBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 24 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ts(i)); i += 1 }
    i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); i += 1 }
    i = 0
    while (i < buf.n) { bb.putDouble(buf.vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TripleBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val ts = new Array[Long](math.max(n, 16))
    val ids = new Array[Long](math.max(n, 16))
    val vs = new Array[Double](math.max(n, 16))
    var i = 0
    while (i < n) { ts(i) = bb.getLong; i += 1 }
    i = 0
    while (i < n) { ids(i) = bb.getLong; i += 1 }
    i = 0
    while (i < n) { vs(i) = bb.getDouble; i += 1 }
    new TripleBuf(ts, ids, vs, n)
  }

  override def withNewMutableAggBufferOffset(offset: Int): AssembleTimed =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): AssembleTimed =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): AssembleTimed =
    copy(tsExpr = newFirst, idExpr = newSecond, valueExpr = newThird)
}

/** Column API + SQL registration, same pattern as TrimmedMeanFunctions.
  * Registration is unguarded: createOrReplaceTempFunction is idempotent and
  * per-session, so "already registered" bookkeeping (which would need a
  * session identity key) buys nothing. */
object SeriesAssembleFunctions {

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "assemble_series",
      exprs => AssembleSeries(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "assemble_timed",
      exprs => AssembleTimed(exprs(0), exprs(1), exprs(2)),
      "built-in")
  }

  /** values ordered by tIdx (O(n) placement when tIdx is dense). */
  def assembleSeries(spark: org.apache.spark.sql.SparkSession,
                     tIdx: Column, value: Column): Column = {
    register(spark)
    call_function("assemble_series", tIdx, value)
  }

  /** struct(values, ts) ordered by (ts, eventId, value). */
  def assembleTimed(spark: org.apache.spark.sql.SparkSession,
                    ts: Column, eventId: Column, value: Column): Column = {
    register(spark)
    call_function("assemble_timed", ts, eventId, value)
  }
}
