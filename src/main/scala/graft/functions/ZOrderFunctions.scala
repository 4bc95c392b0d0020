package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton-curve) building blocks as native codegen'd expressions:
  * per-column quantile bucketing, a lexicographic long proxy for strings,
  * and bit interleaving. Used by [[graft.operators.ZOrder]] to cluster a
  * lake so FILE-level min/max stay tight on EVERY clustered column at once
  * (a 1-D sort gives tight ranges on one column only) — the layout that
  * makes [[graft.sources.ZoneMaps]] pruning effective on multi-column
  * predicates.
  */
object ZOrderFunctions {

  /** Quantile-bucket id of a double: the number of `cuts` ≤ value, where
    * `cuts` is the RAW (sorted, duplicates kept) quantile array. Duplicates
    * matter: a value covering 10 % of the mass owns ~10 % of the cut
    * positions, so even a 10-distinct-value column spreads over the full
    * bucket range instead of collapsing into its low bits — buckets are
    * equal-POPULATION, not equal-width, and skew cannot flatten the curve.
    * NULL in, NULL out (callers coalesce to bucket 0: nulls cluster at
    * z-min). NaN compares ≤ nothing → bucket 0, alongside nulls.
    */
  final class Boundaries(val cuts: Array[Double]) extends Serializable {
    def bucket(v: Double): Int = {
      // upper bound: first index with cuts(i) > v (binarySearch is
      // unusable on duplicate runs — it returns an arbitrary match)
      var lo = 0
      var hi = cuts.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (cuts(m) <= v) lo = m + 1 else hi = m
      }
      lo
    }
  }

  case class QuantileBucket(child: Expression, boundaries: Boundaries)
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "quantile_bucket"
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(DoubleType)

    override def nullSafeEval(input: Any): Any =
      boundaries.bucket(input.asInstanceOf[Double])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("boundaries", boundaries,
        classOf[Boundaries].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.bucket($v);")
    }

    override protected def withNewChildInternal(newChild: Expression): QuantileBucket =
      copy(child = newChild)
  }

  /** First 6 UTF-8 bytes of a string as a big-endian unsigned long
    * (0-padded). 48 bits fit a double's 53-bit mantissa EXACTLY, so the
    * proxy survives the quantile sketch's double domain losslessly, and
    * byte-wise order matches parquet's binary min/max order — a range of
    * proxies is a range of strings.
    */
  case class StringPrefixLong(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = LongType
    override def prettyName: String = "string_prefix_long"
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StringType)

    override def nullSafeEval(input: Any): Any =
      StringPrefixLong.prefix(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = StringPrefixLong.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $cls.prefix($v);")
    }

    override protected def withNewChildInternal(newChild: Expression): StringPrefixLong =
      copy(child = newChild)
  }

  object StringPrefixLong {
    def prefix(s: UTF8String): Long = {
      val b = s.getBytes
      var v = 0L
      var i = 0
      while (i < 6) {
        v = (v << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
        i += 1
      }
      v
    }
  }

  /** Morton interleave of an array<int> of bucket ids into one long:
    * bit b of column c lands at position b*n + (n-1-c), so the HIGH bits
    * of every column dominate the curve equally. `bits` per column,
    * n*bits ≤ 63. NULL array → NULL; a NULL ELEMENT is a hard error —
    * [[graft.operators.ZOrder]] coalesces bucket ids to 0 first, so one
    * reaching here means a caller bypassed the null policy and silent
    * null-z rows would fall out of the clustering.
    */
  case class InterleaveBits(child: Expression, bits: Int, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(n >= 1 && bits >= 1 && n * bits <= 63,
      s"interleave needs 1..63 total bits, got $n cols * $bits bits")
    override def dataType: DataType = LongType
    override def prettyName: String = "interleave_bits"
    override def inputTypes: Seq[TypeBridge.AbstractType] =
      Seq(ArrayType(IntegerType))

    override def nullSafeEval(input: Any): Any =
      InterleaveBits.interleave(input.asInstanceOf[ArrayData], bits, n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = InterleaveBits.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = $cls.interleave($a, $bits, $n);")
    }

    override protected def withNewChildInternal(newChild: Expression): InterleaveBits =
      copy(child = newChild)
  }

  object InterleaveBits {
    def interleave(a: ArrayData, bits: Int, n: Int): Long = {
      if (a.numElements() != n) throw new IllegalArgumentException(
        s"interleave_bits expects $n bucket ids, got ${a.numElements()}")
      var z = 0L
      var c = 0
      while (c < n) {
        if (a.isNullAt(c)) throw new IllegalArgumentException(
          "interleave_bits: null bucket id (coalesce buckets before interleaving)")
        val x = a.getInt(c).toLong
        var b = 0
        while (b < bits) {
          z |= ((x >>> b) & 1L) << (b * n + (n - 1 - c))
          b += 1
        }
        c += 1
      }
      z
    }
  }

  def quantileBucket(c: Column, cuts: Array[Double]): Column =
    ColumnBridge.column(QuantileBucket(ColumnBridge.expression(c), new Boundaries(cuts)))

  def stringPrefixLong(c: Column): Column =
    ColumnBridge.column(StringPrefixLong(ColumnBridge.expression(c)))

  def interleaveBits(buckets: Column, bits: Int, n: Int): Column =
    ColumnBridge.column(InterleaveBits(ColumnBridge.expression(buckets), bits, n))
}
