package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native text statistics powering language-ID and quality
  * scoring.
  *
  * The composed forms of those two functions — `stopwordCount` =
  * `size(filter(regexp_extract_all(lower(text)), t => array_contains(…)))`
  * nested inside a CaseWhen — evaluate the tokenizing regex and an
  * INTERPRETED higher-order filter up to ~16 times per document: HOFs are
  * CodegenFallback, and CaseWhen branches are excluded from codegen
  * subexpression elimination, so nothing deduplicates the repeats. Measured
  * on the sf0.1 corpus that projection alone cost ~1 ms/doc and dominated
  * the whole cleaning pipeline (the corpus-pipeline benchmark spent more
  * time scoring 5k documents than LSH-joining them).
  *
  * [[TextStats.stats]] makes the same measurements in ONE scan of the
  * lowered bytes — token runs, per-language function-word hits, code-point
  * and punctuation counts — and the two expressions below consume it
  * directly. Semantics are bit-identical to the composed forms (same
  * tokenizer: maximal `[a-z0-9]+` runs of `lower(text)`; same double
  * arithmetic, same tie-breaks), so the DuckDB oracle mirrors are
  * unchanged. ~100× cheaper per document; scales with executors like any
  * codegen'd scalar.
  */
object TextStats {
  /** Indices into the stats vector. */
  final val NTokens = 0; final val EnHits = 1; final val EsHits = 2
  final val DeHits = 3; final val FrHits = 4; final val NChars = 5
  final val NPunct = 6

  private def set(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  // built from the same public lists the composed forms use
  private lazy val En = set(TextFunctions.StopwordsEn)
  private lazy val Es = set(TextFunctions.StopwordsEs)
  private lazy val De = set(TextFunctions.StopwordsDe)
  private lazy val Fr = set(TextFunctions.StopwordsFr)
  private lazy val MaxStopLen =
    (TextFunctions.StopwordsEn ++ TextFunctions.StopwordsEs ++
      TextFunctions.StopwordsDe ++ TextFunctions.StopwordsFr).map(_.length).max

  @inline private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** One pass over the document: {token count, en/es/de/fr function-word
    * hits, code points, punctuation code points}.
    *
    * Tokens are maximal ASCII `[a-z0-9]+` byte runs of
    * `UTF8String.toLowerCase` — exactly the runs `regexp_extract_all`
    * finds, because in UTF-8 the ASCII range never appears inside a
    * multi-byte sequence. Counts are over the ORIGINAL text (the composed
    * punctRatio/charCount never lower-case): a punctuation code point is
    * anything outside `[A-Za-z0-9]` and Java `\s` (space, \t, \n, \x0B,
    * \f, \r); every non-ASCII code point counts as punctuation, matching
    * `[^A-Za-z0-9\s]`.
    */
  def stats(text: UTF8String): Array[Long] = {
    val out = new Array[Long](7)
    // token + stopword scan over the lowered bytes
    val lb = text.toLowerCase.getBytes
    var i = 0
    val n = lb.length
    val maxStop = MaxStopLen
    while (i < n) {
      if (isTokenByte(lb(i))) {
        val start = i
        while (i < n && isTokenByte(lb(i))) i += 1
        out(NTokens) += 1
        val len = i - start
        if (len <= maxStop) {
          val tok = UTF8String.fromBytes(lb, start, len)
          if (En.contains(tok)) out(EnHits) += 1
          if (Es.contains(tok)) out(EsHits) += 1
          if (De.contains(tok)) out(DeHits) += 1
          if (Fr.contains(tok)) out(FrHits) += 1
        }
      } else i += 1
    }
    // code-point + punctuation scan over the original bytes
    val ob = text.getBytes
    var j = 0
    while (j < ob.length) {
      val b = ob(j)
      if ((b & 0xc0) != 0x80) { // code-point start byte
        out(NChars) += 1
        val punct =
          if ((b & 0x80) != 0) true // any non-ASCII code point
          else !((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
            (b >= '0' && b <= '9') || b == ' ' || b == '\t' || b == '\n' ||
            b == 0x0b || b == '\f' || b == '\r')
        if (punct) out(NPunct) += 1
      }
      j += 1
    }
    out
  }

  /** Language-ID verdict from a stats vector — argmax with the fixed
    * en > es > de > fr > und tie-break of [[TextFunctions.langId]].
    */
  def langOf(st: Array[Long]): UTF8String = {
    val en = st(EnHits); val es = st(EsHits); val de = st(DeHits); val fr = st(FrHits)
    if (en == 0 && es == 0 && de == 0 && fr == 0) LangUnd
    else if (en >= es && en >= de && en >= fr) LangEn
    else if (es >= de && es >= fr) LangEs
    else if (de >= fr) LangDe
    else LangFr
  }

  /** Quality score from a stats vector — same terms, weights, and double
    * evaluation order as [[TextFunctions.qualityScore]]'s composed form.
    */
  def qualityOf(st: Array[Long]): Double = {
    val chars = st(NChars)
    val lenTerm = math.min(1.0, chars.toDouble / 500.0)
    val punctTerm = 1.0 - (if (chars == 0) 0.0 else st(NPunct).toDouble / chars)
    val stopTerm = math.min(1.0,
      (if (st(NTokens) == 0) 0.0 else st(EnHits).toDouble / st(NTokens)) * 4.0)
    0.4 * lenTerm + 0.3 * punctTerm + 0.3 * stopTerm
  }

  def langIdCompute(text: UTF8String): UTF8String = langOf(stats(text))
  def qualityCompute(text: UTF8String): Double = qualityOf(stats(text))

  val LangUnd: UTF8String = UTF8String.fromString("und")
  private val LangEn = UTF8String.fromString("en")
  private val LangEs = UTF8String.fromString("es")
  private val LangDe = UTF8String.fromString("de")
  private val LangFr = UTF8String.fromString("fr")
}

/** Native language-ID: NULL for null text (the Column wrapper coalesces to
  * 'und', mirroring the composed CaseWhen's null arm).
  */
case class LangIdExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    TextStats.langIdCompute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextStats.langIdCompute($t);")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** Native quality score: NULL for null text, like the composed arithmetic
  * whose every term is NULL-propagating.
  */
case class QualityScoreExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"
  override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    TextStats.qualityCompute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextStats.qualityCompute($t);")

  override protected def withNewChildInternal(newChild: Expression): QualityScoreExpr =
    copy(child = newChild)
}

object TextStatsColumns {
  import org.apache.spark.sql.functions.{coalesce, lit}

  def lang_id(text: Column): Column =
    coalesce(ColumnBridge.column(LangIdExpr(ColumnBridge.expression(text))),
      lit("und"))

  def quality_score(text: Column): Column =
    ColumnBridge.column(QualityScoreExpr(ColumnBridge.expression(text)))
}
