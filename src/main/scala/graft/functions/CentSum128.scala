package graft.functions

import java.math.BigInteger
import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.graftbridge.TypeBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Exact money sum over scaled-integer cents with unbounded magnitude —
  * a custom `TypedImperativeAggregate` (SURVEY.md §2.7 UDAF surface).
  *
  * Motivation: Spark's `sum(DECIMAL(>18))` falls off the compact-long fast
  * path into per-row BigDecimal allocation (~3× slower), while plain long
  * sums silently wrap on giant groups (6-decimal cents overflow int64 at
  * ~1.7e7 rows/group — real at 100 TB). This aggregate keeps the per-row
  * hot path a single long add and spills into a BigInteger only when the
  * running long nears 2^62 — exact at any scale, long-speed in the loop.
  *
  * Input: long cents (caller scales, e.g. `floor(x*1e6 + 0.5) as long`).
  * Output: double of the exact scaled sum (cents / 10^scale).
  */
case class CentSum128(
    child: Expression,
    scale: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CentSum128.Buf] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cent_sum_128"
  // declared input type: narrower ints coerce to long at ANALYSIS time;
  // anything non-coercible is an AnalysisException, not a per-row
  // ClassCastException hours into a 100 TB aggregation
  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(LongType)

  override def createAggregationBuffer(): CentSum128.Buf = new CentSum128.Buf

  override def update(buf: CentSum128.Buf, input: InternalRow): CentSum128.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: CentSum128.Buf, other: CentSum128.Buf): CentSum128.Buf = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: CentSum128.Buf): Any =
    new java.math.BigDecimal(buf.total, scale).doubleValue()

  override def serialize(buf: CentSum128.Buf): Array[Byte] = {
    val hi = buf.hi.toByteArray
    ByteBuffer.allocate(12 + hi.length).putLong(buf.lo).putInt(hi.length).put(hi).array()
  }

  override def deserialize(bytes: Array[Byte]): CentSum128.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new CentSum128.Buf
    b.lo = bb.getLong
    val n = bb.getInt
    val arr = new Array[Byte](n)
    bb.get(arr)
    b.hi = new BigInteger(arr)
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): CentSum128 =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CentSum128 =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CentSum128 =
    copy(child = c.head)
}

object CentSum128 {
  // Invariant: |lo| < 2^61 between calls, so add (|c| ≤ 2^61) and merge
  // (|lo|+|o.lo| < 2^62) can never wrap int64.
  private val SpillAt = 1L << 61

  final class Buf {
    var lo: Long = 0L
    var hi: BigInteger = BigInteger.ZERO

    def add(c: Long): Unit = {
      // inputs beyond 2^61 would break the no-wrap invariant silently —
      // reject loudly (2^61 cents at scale 6 is $2.3e12 per row; any real
      // money value is orders of magnitude below)
      if (c >= SpillAt || c <= -SpillAt)
        throw new ArithmeticException(
          s"cent_sum_128 input $c exceeds ±2^61; pre-scale the column down")
      lo += c
      if (lo >= SpillAt || lo <= -SpillAt) spill()
    }

    def mergeFrom(o: Buf): Unit = {
      hi = hi.add(o.hi)
      lo += o.lo
      if (lo >= SpillAt || lo <= -SpillAt) spill()
    }

    def total: BigInteger = hi.add(BigInteger.valueOf(lo))

    private def spill(): Unit = { hi = hi.add(BigInteger.valueOf(lo)); lo = 0L }
  }

  /** `cent_sum_128(cents, scale)` as a Column aggregate. */
  def centSum128(cents: Column, scale: Int): Column =
    ColumnBridge.column(
      CentSum128(ColumnBridge.expression(cents), scale).toAggregateExpression())
}
