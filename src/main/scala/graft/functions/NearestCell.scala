package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid assignment as a native codegen'd expression: the
  * incremental-ingest hot path ([[graft.operators.Similarity.assignCells]])
  * evaluates k exact squared-L2 distances per row and returns the argmin
  * cell id (ties → lowest id). The centroid table rides as a REFERENCE
  * OBJECT in the task closure (the [[Bpe.BpeVocab]] pattern — one flat
  * double[] per executor, no per-row allocation), so the loop is two
  * fused native loops instead of a higher-order-function chain (whose
  * per-element lambdas measured ~10× slower on the sf20 append).
  *
  * Distances use the same subtract-square accumulation as
  * `VectorFunctions.l2Distance`, so assignments agree with the probe-side
  * centroid ranking bit-for-bit.
  */
object NearestCell {

  /** Executor-side centroid table: flat row-major [k][dim]. */
  final class CentroidTable(flat: Array[Double], val k: Int, val dim: Int)
      extends Serializable {
    require(flat.length == k * dim, s"centroid table ${flat.length} != $k*$dim")
    def nearest(v: ArrayData): Int = {
      require(v.numElements() == dim,
        s"embedding dim ${v.numElements()} != centroid dim $dim")
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = c * dim
        var d = 0.0
        var i = 0
        while (i < dim) {
          val x = flat(off + i) - v.getDouble(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
  }

  object CentroidTable {
    def apply(centroids: Seq[Seq[Double]]): CentroidTable = {
      val k = centroids.size
      val dim = centroids.head.size
      val flat = new Array[Double](k * dim)
      centroids.zipWithIndex.foreach { case (c, i) =>
        require(c.size == dim, s"ragged centroid table at cell $i")
        c.copyToArray(flat, i * dim)
      }
      new CentroidTable(flat, k, dim)
    }
  }

  /** Argmin cell id of `child` (array<double>, caller-normalized) against
    * the table — NULL in, NULL out.
    */
  case class NearestCellExpr(child: Expression, table: CentroidTable)
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "nearest_cell"
    override def inputTypes: Seq[TypeBridge.AbstractType] =
      Seq(ArrayType(DoubleType))

    override def nullSafeEval(input: Any): Any =
      table.nearest(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("centroidTable", table,
        classOf[CentroidTable].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.nearest($v);")
    }

    override protected def withNewChildInternal(newChild: Expression): NearestCellExpr =
      copy(child = newChild)
  }

  def nearest_cell(emb: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCellExpr(ColumnBridge.expression(emb),
      CentroidTable(centroids)))
}
