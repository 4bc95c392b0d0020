package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Product-quantization primitives (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search") as native codegen'd
  * expressions — the memory-bound ANN scale path.
  *
  * A D-dim float vector (D×4 bytes) compresses to `m` one-byte codes: the
  * vector is split into m subspaces of D/m dims, each encoded as the index
  * of its nearest codebook centroid (≤256 per subspace). At 100 TB of
  * embeddings this is the difference between scanning 256-byte rows and
  * scanning 8-byte rows — the ADC scan side touches ~32× fewer bytes, and
  * the codes table of a billion-vector corpus fits in cluster page cache.
  *
  * Asymmetric distance computation (ADC): a QUERY stays un-quantized; its
  * similarity to a code is Σ_j table[j][code_j] where table[j][c] =
  * ⟨q_j, C[j][c]⟩ is computed once per query (m·ksub sub-dots), so the
  * per-candidate cost is m table lookups instead of D multiplies. The
  * three stages map to three expressions:
  *
  *  - [[PqEncode]] (corpus side, once per corpus version): vector →
  *    m-byte code. Cost O(D·ksub) per row, map-side, embarrassingly
  *    parallel.
  *  - [[PqTable]] (query side, once per query row, BEFORE the candidate
  *    join): vector → flattened [m][ksub] inner-product lookup table.
  *  - [[PqAdc]] (the per-candidate-pair hot path): (code, table) → Σ of m
  *    lookups, one fused loop in whole-stage codegen.
  *
  * All three are deterministic pure functions of (vector, codebooks); the
  * codebooks ride in as an ordinary array<double> expression (a literal in
  * practice — ≤ m·ksub·dsub = D·ksub doubles ≈ 8 KB at the defaults), so
  * the expressions stay engine-serializable with no broadcast plumbing.
  */
object PqFunctions {

  /** dsub inferred from the vector/codebook shapes; null on any shape
    * mismatch (a malformed embedding among billions must yield a null the
    * rank filters drop, not an exception that kills the job — the
    * [[DotProduct]] contract).
    */
  private[functions] def subDim(dim: Int, m: Int, cbLen: Int, ksub: Int): Int = {
    if (m <= 0 || ksub <= 0 || dim % m != 0) return -1
    val dsub = dim / m
    if (cbLen != m * ksub * dsub) -1 else dsub
  }

  /** vector (array<float|double>, length D) × codebooks (array<double>,
    * flattened [m][ksub][dsub]) → m-byte code; code[j] = argmin_c
    * ‖x_j − C[j][c]‖² (ties → lowest index, so encoding is deterministic).
    */
  def compute_encode(vec: ArrayData, vecIsFloat: Boolean, cb: ArrayData,
      m: Int, ksub: Int): Array[Byte] = {
    val dim = vec.numElements()
    val dsub = subDim(dim, m, cb.numElements(), ksub)
    if (dsub < 0) return null
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      x(i) = if (vecIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val base = j * ksub * dsub
      val off = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d = 0.0
        var t = 0
        val cbase = base + c * dsub
        while (t < dsub) {
          val diff = x(off + t) - cb.getDouble(cbase + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** query vector × codebooks → flattened [m][ksub] table of sub-space
    * inner products ⟨q_j, C[j][c]⟩. Runs once per QUERY row (cold path —
    * |Q| ≪ corpus), so its O(D·ksub) cost amortizes over every candidate
    * the query meets.
    */
  def compute_table(vec: ArrayData, vecIsFloat: Boolean, cb: ArrayData,
      m: Int, ksub: Int): ArrayData = {
    val dim = vec.numElements()
    val dsub = subDim(dim, m, cb.numElements(), ksub)
    if (dsub < 0) return null
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      x(i) = if (vecIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val base = j * ksub * dsub
      val off = j * dsub
      var c = 0
      while (c < ksub) {
        var s = 0.0
        var t = 0
        val cbase = base + c * dsub
        while (t < dsub) {
          s += x(off + t) * cb.getDouble(cbase + t)
          t += 1
        }
        out(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** code (binary, m bytes) × table (array<double>, m·ksub) → approximate
    * inner product Σ_j table[j·ksub + code_j]. THE hot path: once per
    * (query, candidate) pair.
    */
  def compute_adc(code: Array[Byte], table: ArrayData): java.lang.Double = {
    val m = code.length
    if (m == 0) return null
    val n = table.numElements()
    if (n % m != 0) return null
    val ksub = n / m
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = code(j) & 0xff
      if (c >= ksub) return null
      s += table.getDouble(j * ksub + c)
      j += 1
    }
    s
  }

  /** vector → vector/‖vector‖₂ in one fused pass (sum of squares, then
    * divide). The HOF spelling `transform(v, x => x / norm2(v))` re-evaluates
    * the norm expression per ELEMENT — O(D²) per row; a zero or null-element
    * vector yields null (a degenerate embedding must rank nowhere, not
    * divide by zero).
    */
  def compute_normalize(vec: ArrayData, vecIsFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    val x = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      val v = if (vecIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      x(i) = v
      s += v * v
      i += 1
    }
    if (s == 0.0) return null
    val inv = 1.0 / math.sqrt(s)
    i = 0
    while (i < n) { x(i) *= inv; i += 1 }
    new GenericArrayData(x)
  }

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _ => false
  }
  private def isFloatVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def isDoubleVec(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  case class PqEncode(left: Expression, right: Expression, m: Int, ksub: Int)
      extends BinaryExpression {
    require(m >= 1 && ksub >= 1 && ksub <= 256,
      s"pq_encode needs 1 <= m and 1 <= ksub <= 256, got m=$m ksub=$ksub")
    override def dataType: DataType = BinaryType
    override def prettyName: String = "pq_encode"
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (isVec(left.dataType) && isDoubleVec(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<double>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    private lazy val lf = isFloatVec(left.dataType)
    override def nullSafeEval(a: Any, b: Any): Any =
      compute_encode(a.asInstanceOf[ArrayData], lf, b.asInstanceOf[ArrayData], m, ksub)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |${ev.value} = graft.functions.PqFunctions.compute_encode($a, $lf, $b, $m, $ksub);
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
      copy(left = l, right = r)
  }

  case class PqTable(left: Expression, right: Expression, m: Int, ksub: Int)
      extends BinaryExpression {
    require(m >= 1 && ksub >= 1 && ksub <= 256,
      s"pq_table needs 1 <= m and 1 <= ksub <= 256, got m=$m ksub=$ksub")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "pq_table"
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (isVec(left.dataType) && isDoubleVec(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<double>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    private lazy val lf = isFloatVec(left.dataType)
    override def nullSafeEval(a: Any, b: Any): Any =
      compute_table(a.asInstanceOf[ArrayData], lf, b.asInstanceOf[ArrayData], m, ksub)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |${ev.value} = graft.functions.PqFunctions.compute_table($a, $lf, $b, $m, $ksub);
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqTable =
      copy(left = l, right = r)
  }

  case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc"
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && isDoubleVec(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, array<double>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    override def nullSafeEval(a: Any, b: Any): Any =
      compute_adc(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val boxed = ctx.freshName("boxed")
        s"""
           |java.lang.Double $boxed = graft.functions.PqFunctions.compute_adc($a, $b);
           |if ($boxed == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $boxed.doubleValue(); }
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
      copy(left = l, right = r)
  }

  case class L2Normalize(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "l2_normalize"
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got ${child.dataType.simpleString}")
    private lazy val cf = isFloatVec(child.dataType)
    override def nullSafeEval(a: Any): Any =
      compute_normalize(a.asInstanceOf[ArrayData], cf)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"""
           |${ev.value} = graft.functions.PqFunctions.compute_normalize($a, $cf);
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): L2Normalize =
      copy(child = newChild)
  }

  /** Column API. */
  def l2_normalize(vec: Column): Column =
    ColumnBridge.column(L2Normalize(ColumnBridge.expression(vec)))
  def pq_encode(vec: Column, codebooks: Column, m: Int, ksub: Int): Column =
    ColumnBridge.column(PqEncode(
      ColumnBridge.expression(vec), ColumnBridge.expression(codebooks), m, ksub))
  def pq_table(vec: Column, codebooks: Column, m: Int, ksub: Int): Column =
    ColumnBridge.column(PqTable(
      ColumnBridge.expression(vec), ColumnBridge.expression(codebooks), m, ksub))
  def pq_adc(code: Column, table: Column): Column =
    ColumnBridge.column(PqAdc(
      ColumnBridge.expression(code), ColumnBridge.expression(table)))
}
