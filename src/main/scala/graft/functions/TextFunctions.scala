package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the large-scale training-data pipeline
  * (language ID, quality scoring, token counting, fingerprinting).
  *
  * Everything here is a pure Catalyst expression over built-in functions —
  * no UDFs — so it all stays inside WholeStageCodegen and scales linearly
  * with executors; there is no per-row JVM closure dispatch in the hot path.
  */
object TextFunctions {

  /** Word tokens: maximal `[a-z0-9]+` runs of the lower-cased text. */
  val TokenPattern = "[a-z0-9]+"

  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(TokenPattern), lit(0))

  def tokenCount(text: Column): Column =
    regexp_count(lower(text), lit(TokenPattern)).cast("long")

  /** BPE-ish sub-word token count: alpha runs, digit runs, and each
    * non-alnum non-space symbol count as one token (approximates the
    * pre-tokenization split of byte-pair encoders). This is the CHEAP
    * approximation (one regex pass, no vocabulary); the REAL merge-loop
    * count over a caller-supplied merges table is
    * [[Bpe.bpe_token_count]], which shares this exact pre-tokenization —
    * so for any text, this count ≤ the exact count ≤ the pre-tokens'
    * total character count (BpeSpec pins the bracket).
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")

  def charCount(text: Column): Column = length(text).cast("long")

  /** Punctuation/symbol chars per text char, in [0,1]. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") / length(text))

  /** Count of tokens that appear in `words` (multiset semantics). */
  def stopwordCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(typedLit(words), t))).cast("long")

  def stopwordRatio(text: Column, words: Seq[String]): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(stopwordCount(text, words).cast("double") / n)
  }

  /** Tiny per-language function-word lists for the n-gram-free language-ID
    * heuristic. Deliberately small and fixed: the same lists are mirrored in
    * the DuckDB oracle SQL, so parity depends only on tokenization.
    */
  val StopwordsEn = Seq("the", "and", "of", "to", "a", "in", "is", "it")
  val StopwordsEs = Seq("el", "la", "de", "que", "y", "los", "en", "un")
  val StopwordsDe = Seq("der", "die", "und", "das", "ist", "ein", "nicht", "mit")
  val StopwordsFr = Seq("le", "la", "et", "les", "des", "un", "une", "est")

  /** Language-ID heuristic: argmax of function-word hit counts, with a fixed
    * tie-break priority (en > es > de > fr > und). Deterministic; mirrored
    * verbatim in SQL for the oracle. Evaluated by the native one-pass
    * [[LangIdExpr]]; [[langIdComposed]] is the built-in-functions
    * formulation it must stay bit-identical to (TextStatsSpec pins parity —
    * the composed form costs ~16 interpreted regex+filter passes per row).
    */
  def langId(text: Column): Column = TextStatsColumns.lang_id(text)

  def langIdComposed(text: Column): Column = {
    val en = stopwordCount(text, StopwordsEn)
    val es = stopwordCount(text, StopwordsEs)
    val de = stopwordCount(text, StopwordsDe)
    val fr = stopwordCount(text, StopwordsFr)
    // NULL text first: every count below is NULL, every WHEN predicate
    // would be NULL, and control would fall through to the 'fr' branch —
    // a null document must be undetermined, not French
    when(text.isNull, lit("und"))
      .when(en === 0 && es === 0 && de === 0 && fr === 0, lit("und"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Composite document-quality score in [0,1]:
    * 0.4·min(1, chars/500) + 0.3·(1 − punct_ratio) + 0.3·min(1, 4·stop_ratio).
    * The weights are arbitrary but fixed; parity with the oracle is exact
    * double arithmetic. Evaluated by the native one-pass
    * [[QualityScoreExpr]]; [[qualityScoreComposed]] is the reference
    * formulation (TextStatsSpec pins bit-level parity).
    */
  def qualityScore(text: Column): Column = TextStatsColumns.quality_score(text)

  def qualityScoreComposed(text: Column): Column = {
    val lenTerm = least(lit(1.0), charCount(text).cast("double") / 500.0)
    val punctTerm = lit(1.0) - punctRatio(text)
    val stopTerm = least(lit(1.0), stopwordRatio(text, StopwordsEn) * 4.0)
    lit(0.4) * lenTerm + lit(0.3) * punctTerm + lit(0.3) * stopTerm
  }

  /** Word n-grams of a token array, space-joined; token lists shorter than
    * `n` (or null) yield an empty array. Shared by shingling (Dedup) and
    * repetition scoring. Delegates to the native [[WordNGrams]] expression —
    * the HOF form (`transform` + `slice` + `concat_ws`) evaluates
    * interpreted and measured ~2.4 ms/doc, dominating every dedup pass.
    */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n, WordNGrams.word_ngrams(toks, n))
      .otherwise(array().cast("array<string>"))

  /** Repetition ratio: fraction of repeated word trigrams,
    * `1 − distinct(trigrams)/count(trigrams)` in [0,1). High values flag
    * boilerplate/spam — a standard training-data quality signal. 0 for
    * docs shorter than 3 tokens.
    */
  def repetitionRatio(text: Column): Column = {
    val grams = ngrams(tokens(text), 3)
    when(size(grams) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams))
  }

  /** Whitespace-normalized text: lowercase, runs of whitespace collapsed,
    * trimmed. The canonical form for exact-duplicate detection.
    */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text. md5 is bit-identical
    * across engines, so fingerprints computed here hash-match any external
    * system (including the DuckDB oracle) on the same normalization.
    */
  def fingerprint(text: Column): Column =
    md5(normalizedText(text).cast("binary"))
}
