package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/** Growable primitive buffer for the trimmed-mean aggregate: the per-group
  * state is just the channel values seen so far (<= nChannels doubles). */
final class DoubleBuf(var arr: Array[Double], var n: Int) {
  def add(v: Double): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, math.max(8, arr.length * 2))
    arr(n) = v
    n += 1
  }
}

/** One-pass trimmed nanmean as a native TypedImperativeAggregate — the
  * SURVEY.md §7 "optional performance" replacement for the
  * collect_list + sort_array + slice + filter + aggregate-HOF chain in the
  * join-form CAR (higher-order functions run interpreted; this keeps a
  * primitive double buffer per group and does one JVM sort at eval).
  *
  * Semantics are the reference's CAR aggregate
  * (common_referencing.py:34-41) with np.nanmean null handling: null
  * inputs become NaN, the sort puts NaN last (so missing samples land in
  * the tail trim window), the kept window is nanmean'd, and a group whose
  * kept window holds no finite value evaluates to null (matching both the
  * SQL form's null-on-0/0 division and `avg` over all-nulls).
  *
  * The kept window is [nExclude, nExclude + nKeep) of the sorted values:
  * `nKeep = nChannels - 2*nExclude` reproduces the SQL form's
  * `slice(sorted, nExclude+1, nChannels - 2*nExclude)` bit-for-bit on ANY
  * group size, including ragged groups shorter than nChannels (where a
  * plain trim-both-ends would differ); `nKeep = -1` means "trim nExclude
  * from BOTH ends of the actual group" — the intuitive generic semantics
  * for ad-hoc SQL use. Both are precomputed driver-side, which keeps the
  * expression free of function-valued parameters.
  *
  * `single = true` is the reference's `precision='single'` compute mode
  * (common_referencing.py:11-23 via utils.py:9-31): inputs are cast to
  * float32 and the kept-window nanmean ACCUMULATES in float32, matching
  * np.nanmean over a float32 array. The buffer stays double (inputs are
  * already float32-rounded upstream so the cast is lossless and ordering
  * is unchanged); only the eval arithmetic narrows. */
case class TrimmedMeanNan(child: Expression, nExclude: Int, nKeep: Int = -1,
                          single: Boolean = false,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoubleBuf] with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "trimmed_mean_nan"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects double, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): DoubleBuf = new DoubleBuf(new Array[Double](8), 0)

  override def update(buf: DoubleBuf, input: InternalRow): DoubleBuf = {
    val v = child.eval(input)
    // null -> NaN: missing samples must take part in the sort (NaN-last)
    // rather than silently shrinking the trim window
    buf.add(if (v == null) Double.NaN else v.asInstanceOf[Double])
    buf
  }

  override def merge(a: DoubleBuf, b: DoubleBuf): DoubleBuf = {
    var i = 0
    while (i < b.n) { a.add(b.arr(i)); i += 1 }
    a
  }

  override def eval(buf: DoubleBuf): Any = {
    val n = buf.n
    if (n == 0) return null
    val hi = if (nKeep < 0) n - nExclude else math.min(n, nExclude + nKeep)
    if (single) {
      // float32 accumulate: cast, sort (NaN still last), sum in Float
      val vals = new Array[Float](n)
      var i = 0
      while (i < n) { vals(i) = buf.arr(i).toFloat; i += 1 }
      java.util.Arrays.sort(vals)
      var s = 0.0f
      var cnt = 0
      var k = nExclude
      while (k < hi) {
        val v = vals(k)
        if (!v.isNaN) { s += v; cnt += 1 }
        k += 1
      }
      if (cnt == 0) null else (s / cnt).toDouble
    } else {
      val vals = java.util.Arrays.copyOf(buf.arr, n)
      java.util.Arrays.sort(vals) // NaN sorts last, like np.sort
      var s = 0.0
      var cnt = 0
      var k = nExclude
      while (k < hi) {
        val v = vals(k)
        if (!v.isNaN) { s += v; cnt += 1 } // nanmean of the kept window
        k += 1
      }
      if (cnt == 0) null else s / cnt
    }
  }

  override def serialize(buf: DoubleBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DoubleBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Double](math.max(n, 8))
    var i = 0
    while (i < n) { arr(i) = bb.getDouble; i += 1 }
    new DoubleBuf(arr, n)
  }

  override def withNewMutableAggBufferOffset(offset: Int): TrimmedMeanNan =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TrimmedMeanNan =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TrimmedMeanNan =
    copy(child = newChild)
}

/** Column API + SQL registration, same pattern as ComplexArrayFunctions.
  * Registration is unguarded: createOrReplaceTempFunction is idempotent and
  * per-session, so "already registered" bookkeeping buys nothing. */
object TrimmedMeanFunctions {

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "trimmed_mean_nan",
      exprs => TrimmedMeanNan(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        if (exprs.length > 2) exprs(2).eval().asInstanceOf[Number].intValue() else -1,
        if (exprs.length > 3) exprs(3).eval().asInstanceOf[Boolean] else false),
      "built-in")

  /** `nKeep = -1`: trim nExclude from both ends of the actual group.
    * `single = true`: float32 accumulate (reference precision='single'). */
  def trimmedMeanNan(spark: org.apache.spark.sql.SparkSession,
                     value: Column, nExclude: Int, nKeep: Int = -1,
                     single: Boolean = false): Column = {
    register(spark)
    call_function("trimmed_mean_nan", value, lit(nExclude), lit(nKeep), lit(single))
  }
}
