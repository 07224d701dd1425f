package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Primitive value→count histogram: open-addressing hash map keyed by raw
  * double bits with long counts — no per-update boxing, array-backed
  * serialize/merge. The buffer for [[ExactPercentile]].
  */
final class DoubleCounts(initialCapacity: Int = 1 << 10) {
  // capacity is a power of two; EMPTY slots are marked by count == 0
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2 - 1)
  private var keys = new Array[Long](cap)
  private var counts = new Array[Long](cap)
  private var used = 0

  def size: Int = used

  private def mix(k: Long): Int = {
    // splitmix64 finalizer, truncated to the table mask
    var z = k + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)).toInt & (cap - 1)
  }

  def add(bits: Long, n: Long): Unit = {
    var i = mix(bits)
    while (counts(i) != 0 && keys(i) != bits) i = (i + 1) & (cap - 1)
    if (counts(i) == 0) { keys(i) = bits; used += 1 }
    counts(i) += n
    if (used * 2 > cap) grow()
  }

  private def grow(): Unit = {
    val ok = keys; val oc = counts
    cap <<= 1
    keys = new Array[Long](cap)
    counts = new Array[Long](cap)
    used = 0
    var i = 0
    while (i < ok.length) {
      if (oc(i) != 0) add(ok(i), oc(i))
      i += 1
    }
  }

  def foreach(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < cap) {
      if (counts(i) != 0) f(keys(i), counts(i))
      i += 1
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + used * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(used)
    foreach { (k, n) => out.writeLong(k); out.writeLong(n) }
    out.flush()
    bos.toByteArray
  }
}

object DoubleCounts {
  def deserialize(bytes: Array[Byte]): DoubleCounts = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new DoubleCounts(math.max(n * 2, 16))
    var i = 0
    while (i < n) { m.add(in.readLong(), in.readLong()); i += 1 }
    m
  }
}

/** Exact interpolating percentile over DOUBLE input — a semantics twin of
  * Spark's built-in `percentile` (value→count map, sort by value,
  * position = p·(N−1), linear interpolation between the bracketing
  * values) with a primitive buffer instead of the generic
  * `OpenHashMap[AnyRef, Long]`: updates don't box every double into a
  * map key, and merge/serialize walk primitive arrays. On high-
  * cardinality numeric columns (where the map holds ~one entry per row)
  * this is the difference between an allocation per input row and none.
  *
  * Interpolation parity with the built-in is pinned by a randomized
  * equality spec (PropertySpec) and by the five oracle queries whose
  * values flow through it (IQR/MAD/iforest outliers, fill_median,
  * scaling stats). Callers cast the child to DOUBLE, matching how
  * `graft.ops.Stats` always invoked the built-in.
  */
case class ExactPercentile(
    child: Expression,
    percentageExpression: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoubleCounts] {

  private lazy val returnArray =
    percentageExpression.dataType.isInstanceOf[ArrayType]

  private lazy val percentages: Array[Double] =
    percentageExpression.eval() match {
      case d: Double => Array(d)
      case arr: ArrayData => arr.toDoubleArray()
      case other => throw new IllegalArgumentException(
        s"percentage must be a foldable double or array<double>, got $other")
    }

  override def children: Seq[Expression] = child :: percentageExpression :: Nil

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure("graft_percentile expects a DOUBLE child")
    else if (!percentageExpression.foldable)
      TypeCheckResult.TypeCheckFailure("percentage must be foldable")
    else if (percentages.exists(p => p < 0.0 || p > 1.0))
      TypeCheckResult.TypeCheckFailure("percentage must be in [0, 1]")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType =
    if (returnArray) ArrayType(DoubleType, containsNull = false) else DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_percentile"

  override def createAggregationBuffer(): DoubleCounts = new DoubleCounts()

  override def update(buffer: DoubleCounts, input: InternalRow): DoubleCounts = {
    val v = child.eval(input)
    if (v != null) {
      buffer.add(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 1L)
    }
    buffer
  }

  override def merge(buffer: DoubleCounts, other: DoubleCounts): DoubleCounts = {
    other.foreach { (k, n) => buffer.add(k, n) }
    buffer
  }

  override def eval(buffer: DoubleCounts): Any = {
    val m = buffer.size
    if (m == 0) return null
    // sort distinct values ascending (total order: -0.0 < 0.0, NaN last —
    // same result positions as the built-in's physical double ordering)
    val vals = new Array[Double](m)
    val cnts = new Array[Long](m)
    var i = 0
    buffer.foreach { (k, n) =>
      vals(i) = java.lang.Double.longBitsToDouble(k); cnts(i) = n; i += 1
    }
    val idx = (0 until m).sortBy(i => vals(i))(Ordering.Double.TotalOrdering)
      .toArray
    val cum = new Array[Long](m)
    var total = 0L
    i = 0
    while (i < m) { total += cnts(idx(i)); cum(i) = total; i += 1 }

    // first sorted index whose cumulative count reaches `target`
    def indexAt(target: Long): Int = {
      var lo = 0; var hi = m - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cum(mid) < target) lo = mid + 1 else hi = mid
      }
      lo
    }

    def at(position: Double): Double = {
      val lower = math.floor(position).toLong
      val higher = math.ceil(position).toLong
      val lowerVal = vals(idx(indexAt(lower + 1)))
      if (lower == higher) return lowerVal
      val higherVal = vals(idx(indexAt(higher + 1)))
      if (higherVal == lowerVal) lowerVal
      else (higher - position) * lowerVal + (position - lower) * higherVal
    }

    val maxPosition = total - 1
    val out = percentages.map(p => at(p * maxPosition))
    if (returnArray) new GenericArrayData(out) else out(0)
  }

  override def serialize(buffer: DoubleCounts): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): DoubleCounts =
    DoubleCounts.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactPercentile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactPercentile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExactPercentile =
    copy(child = newChildren(0), percentageExpression = newChildren(1))
}

object ExactPercentile {
  /** Idempotently register `graft_percentile(col, p | array<p>)` in the
    * session's function registry so expression code can reach it via
    * `call_function`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_percentile",
      (args: Seq[Expression]) => ExactPercentile(args.head, args(1)),
      "scala_udf")
}
