package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** SQ8 scalar quantization as native codegen'd expressions: per-dimension
  * linear byte codes (1 byte/dim — the scan-tier memory dial between full
  * precision at 8 bytes/dim and PQ's m bytes/vector) and the asymmetric
  * dot product against a float query. The per-dim grid rides as a
  * reference object (the [[NearestCell.CentroidTable]] pattern): two fused
  * native loops, no per-row allocation beyond the code bytes.
  */
object SqFunctions {

  /** Executor-side per-dimension quantization grid: x̂_d = off_d + scale_d·b.
    * Encoding clamps to [0,255], so out-of-range values (vs the fit
    * sample) saturate instead of wrapping.
    */
  final class Sq8Grid(val offsets: Array[Double], val scales: Array[Double])
      extends Serializable {
    require(offsets.length == scales.length, "ragged SQ8 grid")
    val dim: Int = offsets.length

    def encode(v: ArrayData): Array[Byte] = {
      require(v.numElements() == dim,
        s"embedding dim ${v.numElements()} != SQ8 grid dim $dim")
      val out = new Array[Byte](dim)
      var i = 0
      while (i < dim) {
        val q = Math.round((v.getDouble(i) - offsets(i)) / scales(i))
        out(i) = Math.max(0L, Math.min(255L, q)).toByte
        i += 1
      }
      out
    }

    /** Asymmetric dot: Σ q_d · (off_d + scale_d · code_d). */
    def adc(code: Array[Byte], q: ArrayData): Double = {
      require(code.length == dim && q.numElements() == dim,
        s"SQ8 adc dims: code=${code.length} q=${q.numElements()} grid=$dim")
      var s = 0.0
      var i = 0
      while (i < dim) {
        s += q.getDouble(i) * (offsets(i) + scales(i) * (code(i) & 0xff))
        i += 1
      }
      s
    }

    /** Worst-case ADC error for a UNIT-norm query: |q·(x̂−x)| ≤ ‖q‖·‖x̂−x‖
      * ≤ ½·sqrt(Σ scale_d²) — deterministic from the grid, no sample pass.
      */
    def band: Double = 0.5 * math.sqrt(scales.map(s => s * s).sum)
  }

  case class Sq8Encode(child: Expression, grid: Sq8Grid)
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "sq8_encode"
    override def inputTypes: Seq[TypeBridge.AbstractType] =
      Seq(ArrayType(DoubleType))

    override def nullSafeEval(input: Any): Any =
      grid.encode(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("sq8grid", grid, classOf[Sq8Grid].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.encode($v);")
    }

    override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
      copy(child = newChild)
  }

  case class Sq8Adc(left: Expression, right: Expression, grid: Sq8Grid)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "sq8_adc"
    override def inputTypes: Seq[TypeBridge.AbstractType] =
      Seq(BinaryType, ArrayType(DoubleType))

    override def nullSafeEval(code: Any, q: Any): Any =
      grid.adc(code.asInstanceOf[Array[Byte]], q.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("sq8grid", grid, classOf[Sq8Grid].getName)
      nullSafeCodeGen(ctx, ev, (c, q) => s"${ev.value} = $ref.adc($c, $q);")
    }

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Sq8Adc = copy(left = newLeft, right = newRight)
  }

  def sq8Encode(emb: Column, grid: Sq8Grid): Column =
    ColumnBridge.column(Sq8Encode(ColumnBridge.expression(emb), grid))

  def sq8Adc(code: Column, q: Column, grid: Sq8Grid): Column =
    ColumnBridge.column(Sq8Adc(ColumnBridge.expression(code),
      ColumnBridge.expression(q), grid))
}
