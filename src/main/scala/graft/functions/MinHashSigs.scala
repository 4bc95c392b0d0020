package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k MinHash minima of a document's shingle set in ONE map-side pass —
  * the signature stage of MinHash/LSH dedup with ZERO exchanges.
  *
  * The aggregation formulation (explode the shingle array to rows, then
  * `groupBy(id).agg(min(md5(i ‖ ':' ‖ shingle)) × k)`) computes identical
  * values but pays for them with a full shuffle of every (id, shingle) row
  * and a k-string-column hash aggregate — at corpus scale that is a shuffle
  * of ~50× the document count for a result that is a pure per-document
  * function. This expression computes sig[i] = min over the doc's shingles
  * of md5(i ‖ ':' ‖ shingle) directly from the shingle ARRAY, so signatures
  * (and the band signatures derived from them) are embarrassingly parallel:
  * the only shuffle left in an LSH dedup pass is the banded candidate join
  * itself.
  *
  * Value parity: md5 inputs/outputs are byte-identical to the aggregation
  * form (and to the DuckDB oracle's `MIN(md5(CAST(i AS VARCHAR) || ':' ||
  * shingle))`). Minima are taken over the raw 16 digest bytes (unsigned
  * lexicographic) — hex encoding is order-preserving, so only the k winners
  * get hex-encoded. Null shingle elements are skipped like an agg `min`
  * skips null rows; an empty (or all-null) array yields an empty array —
  * callers gate docs with < n tokens upstream, as with the agg form, where
  * such docs simply had no rows.
  */
case class MinHashSigs(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"signature width must be positive, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sigs"
  override def inputTypes: Seq[TypeBridge.AbstractType] =
    Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSigs.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  private val HexDigits = "0123456789abcdef".toCharArray

  @inline private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** One MessageDigest reused across all k × |shingles| hashes of the row.
    * The shingle bytes are extracted ONCE per row (not once per (i, j) —
    * `getBytes` copies), and digests land in a reusable candidate buffer
    * swapped with `best` on improvement, so the k×m hot loop allocates
    * nothing per hash.
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val m = arr.numElements()
    val md = MessageDigest.getInstance("MD5")
    val shingle = new Array[Array[Byte]](m)
    var any = false
    var j = 0
    while (j < m) {
      if (!arr.isNullAt(j)) { shingle(j) = arr.getUTF8String(j).getBytes; any = true }
      j += 1
    }
    if (!any) return new GenericArrayData(Array.empty[Any])
    val mins = new Array[Array[Byte]](k)
    var cand = new Array[Byte](16)
    var i = 0
    while (i < k) {
      // per-i prefix bytes ("i:") are tiny and loop-invariant
      val prefix = (i.toString + ":").getBytes("UTF-8")
      var best: Array[Byte] = null
      j = 0
      while (j < m) {
        val s = shingle(j)
        if (s != null) {
          md.reset()
          md.update(prefix)
          md.update(s)
          md.digest(cand, 0, 16)
          if (best == null) { best = cand; cand = new Array[Byte](16) }
          else if (unsignedLess(cand, best)) { val t = best; best = cand; cand = t }
        }
        j += 1
      }
      mins(i) = best
      i += 1
    }
    val out = new Array[Any](k)
    i = 0
    while (i < k) { out(i) = hex(mins(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Column API: `minhash_sigs($"shingles", 16)`. */
  def minhash_sigs(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSigs(ColumnBridge.expression(shingles), k))
}
