package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL byte-pair-encoding tokenization over a caller-supplied merges
  * table (Sennrich et al. 2016; the greedy lowest-rank merge loop every
  * BPE tokenizer runs) — the exact counterpart of
  * [[TextFunctions.bpeTokenCount]]'s documented pre-tokenization
  * approximation.
  *
  * Shape at scale: a merges table is vocabulary-sized (tens of thousands
  * of rows — GPT-2 ships 50k), which is BROADCAST scale, not join scale:
  * the [[BpeVocab]] rides inside the expression (one rank map per
  * executor, shipped with the task closure exactly like a `typedLit`
  * codebook), so tokenization is a narrow codegen'd scalar — no shuffle,
  * no per-row lookup join, no UDF registry. Build the vocab once per job
  * from a DataFrame ([[BpeVocab.fromDataFrame]] — a bounded driver-side
  * collect of the merges table, the one collect this operator performs)
  * or directly from pairs.
  *
  * Pre-tokenization parity: text splits into the SAME pre-tokens the
  * approximate counter counts (`[A-Za-z]+` runs, `[0-9]+` runs, each other
  * non-space char alone — [[TextFunctions.bpeTokenCount]]'s regex,
  * hand-rolled here byte-equivalently), so for an EMPTY merges table the
  * exact count equals the pre-tokens' total character count, and with any
  * merges table it is bounded by [pre-token count, char count] — the
  * machine-checkable bracket the registry contract asserts.
  *
  * Within a pre-token the classic merge loop runs: start from single
  * characters, repeatedly find the adjacent pair with the LOWEST merge
  * rank and fuse every non-overlapping occurrence left-to-right, stop when
  * no adjacent pair is ranked. Deterministic for a fixed merges table.
  */
object Bpe {

  /** Immutable, serializable merge-rank table. `merges` order IS the rank
    * order (first = applied first), as in every published merges.txt.
    */
  final class BpeVocab(merges: Seq[(String, String)]) extends Serializable {
    // tuple keys: unambiguous for ANY symbol contents (a string-concat
    // key needs a separator no symbol can contain, and pre-tokens exclude
    // only \s — a NUL or any other non-space char CAN be a symbol)
    private val ranks: java.util.HashMap[(String, String), Integer] = {
      val m = new java.util.HashMap[(String, String), Integer](merges.size * 2)
      merges.zipWithIndex.foreach { case ((l, r), i) =>
        m.putIfAbsent((l, r), Integer.valueOf(i))
      }
      m
    }

    def size: Int = ranks.size

    @inline private def rankOf(l: String, r: String): Int = {
      val v = ranks.get((l, r))
      if (v == null) Int.MaxValue else v.intValue()
    }

    /** Merge loop over one pre-token; appends final symbols to `out`. */
    private def encodeWord(word: String, out: java.util.ArrayList[String]): Unit = {
      if (word.length == 1) { out.add(word); (); return }
      var syms = new java.util.ArrayList[String](word.length)
      var i = 0
      while (i < word.length) {
        // surrogate pairs stay one symbol: a split supplementary char is
        // not a token any vocab could contain
        val cp = word.codePointAt(i)
        val n = Character.charCount(cp)
        syms.add(word.substring(i, i + n))
        i += n
      }
      var done = false
      while (!done && syms.size > 1) {
        // lowest-ranked adjacent pair this round
        var best = Int.MaxValue
        var j = 0
        while (j < syms.size - 1) {
          val r = rankOf(syms.get(j), syms.get(j + 1))
          if (r < best) best = r
          j += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          // fuse every non-overlapping occurrence, left to right
          val next = new java.util.ArrayList[String](syms.size)
          var p = 0
          while (p < syms.size) {
            if (p < syms.size - 1 && rankOf(syms.get(p), syms.get(p + 1)) == best) {
              next.add(syms.get(p) + syms.get(p + 1)); p += 2
            } else { next.add(syms.get(p)); p += 1 }
          }
          syms = next
        }
      }
      var k = 0
      while (k < syms.size) { out.add(syms.get(k)); k += 1 }
    }

    @inline private def isAlpha(c: Char): Boolean =
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
    @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
    @inline private def isSpace(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

    /** All BPE tokens of `text` ([[TextFunctions.bpeTokenCount]]'s
      * pre-tokenization, then the merge loop per pre-token).
      */
    def encode(text: String): java.util.ArrayList[String] = {
      val out = new java.util.ArrayList[String]()
      var i = 0
      val n = text.length
      while (i < n) {
        val c = text.charAt(i)
        if (isAlpha(c)) {
          val s = i; while (i < n && isAlpha(text.charAt(i))) i += 1
          encodeWord(text.substring(s, i), out)
        } else if (isDigit(c)) {
          val s = i; while (i < n && isDigit(text.charAt(i))) i += 1
          encodeWord(text.substring(s, i), out)
        } else if (isSpace(c)) {
          i += 1
        } else {
          // one symbol per non-alnum non-space char (surrogate-aware),
          // exactly the regex's [^A-Za-z0-9\s] single-char alternative
          val cp = text.codePointAt(i)
          val w = Character.charCount(cp)
          encodeWord(text.substring(i, i + w), out)
          i += w
        }
      }
      out
    }

    // entry points the codegen'd expressions call
    def countTokens(text: UTF8String): Long = encode(text.toString).size.toLong
    def tokensArray(text: UTF8String): GenericArrayData = {
      val toks = encode(text.toString)
      val arr = new Array[Any](toks.size)
      var i = 0
      while (i < toks.size) { arr(i) = UTF8String.fromString(toks.get(i)); i += 1 }
      new GenericArrayData(arr)
    }
  }

  object BpeVocab {
    def apply(merges: Seq[(String, String)]): BpeVocab = new BpeVocab(merges)

    /** Build from a merges DataFrame with columns (left, right) ordered by
      * `rankCol` ascending — the one bounded driver-side collect of this
      * operator (a merges table is ≤ ~100k tiny rows by construction;
      * anything bigger is not a BPE vocabulary).
      */
    def fromDataFrame(merges: org.apache.spark.sql.DataFrame,
        leftCol: String = "left", rightCol: String = "right",
        rankCol: String = "rank"): BpeVocab = {
      import org.apache.spark.sql.functions.col
      new BpeVocab(merges.select(col(leftCol), col(rightCol), col(rankCol))
        .orderBy(col(rankCol))
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1))))
    }

    /** Build from a standard `merges.txt` (the GPT-2/RoBERTa/HF-tokenizers
      * export format): one merge per line, two space-separated symbols,
      * rank = line order; a leading `#version:` header and blank lines are
      * skipped. Read through Hadoop FileSystem so file://, hdfs:// and
      * s3a:// paths all work; a merges file is vocabulary-sized (GPT-2
      * ships 50k lines, ~0.5 MB) — driver-side by construction.
      *
      * Note the tokenizer around the vocab stays THIS engine's
      * (char-level symbols, the documented pre-tokenization): loading
      * GPT-2's merges gives GPT-2's merge RANKING over those symbols, not
      * byte-level-BPE output parity — byte-level pre-tokenization (Ġ
      * space-marking, byte fallback) is a tokenizer contract, not a
      * merges-file property.
      */
    def fromMergesFile(path: String,
        hconf: org.apache.hadoop.conf.Configuration =
          new org.apache.hadoop.conf.Configuration()): BpeVocab = {
      val p = new org.apache.hadoop.fs.Path(path)
      val in = p.getFileSystem(hconf).open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      val merges = lines.zipWithIndex
        .filterNot { case (l, i) => l.isEmpty || (i == 0 && l.startsWith("#version")) }
        .map { case (l, i) =>
          val sp = l.indexOf(' ')
          require(sp > 0 && l.indexOf(' ', sp + 1) < 0,
            s"$path line ${i + 1}: expected exactly two space-separated " +
              s"symbols, got '$l'")
          (l.substring(0, sp), l.substring(sp + 1))
        }
      require(merges.nonEmpty, s"$path contains no merges")
      new BpeVocab(merges)
    }
  }

  /** Exact BPE token count under `vocab` — NULL for null text. */
  case class BpeTokenCountExpr(child: Expression, vocab: BpeVocab)
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = LongType
    override def prettyName: String = "bpe_token_count"
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StringType)

    override def nullSafeEval(input: Any): Any =
      vocab.countTokens(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeVocab", vocab,
        classOf[BpeVocab].getName)
      nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.countTokens($t);")
    }

    override protected def withNewChildInternal(newChild: Expression): BpeTokenCountExpr =
      copy(child = newChild)
  }

  /** The BPE token array itself (for packing/inspection) — NULL for null
    * text, empty array for whitespace-only text.
    */
  case class BpeTokensExpr(child: Expression, vocab: BpeVocab)
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "bpe_tokens"
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StringType)

    override def nullSafeEval(input: Any): Any =
      vocab.tokensArray(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeVocab", vocab,
        classOf[BpeVocab].getName)
      nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.tokensArray($t);")
    }

    override protected def withNewChildInternal(newChild: Expression): BpeTokensExpr =
      copy(child = newChild)
  }

  def bpe_token_count(text: Column, vocab: BpeVocab): Column =
    ColumnBridge.column(BpeTokenCountExpr(ColumnBridge.expression(text), vocab))

  def bpe_tokens(text: Column, vocab: BpeVocab): Column =
    ColumnBridge.column(BpeTokensExpr(ColumnBridge.expression(text), vocab))
}
