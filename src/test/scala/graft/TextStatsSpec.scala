package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Bit-level parity of the native one-pass text stats ([[graft.functions
  * .TextStats]]) against the composed built-in-function forms they
  * replaced. The composed forms are the semantics contract (they are what
  * the DuckDB oracle mirrors); the native expressions exist purely because
  * the composed ones evaluate ~16 interpreted regex+HOF passes per row.
  */
class TextStatsSpec extends SparkSuite {
  import spark.implicits._

  private val edgeCases = Seq(
    null.asInstanceOf[String],
    "",
    "   ",
    "the and of to a in is it",                       // pure en stopwords
    "el la de que y los en un",                       // pure es
    "der die und das ist ein nicht mit",              // pure de
    "le la et les des un une est",                    // pure fr
    "la un",                                          // es/fr tie → es
    "de la",                                          // es wins ties
    "zzz qqq xxx",                                    // no stopwords → und
    "THE AND OF TO",                                  // case folding
    "the, and; of! to?",                              // punct-adjacent tokens
    "a1b2 3c4d 99",                                   // digit tokens
    "¡hola! ¿qué tal? café naïve — em–dash",          // non-ASCII punct + accents
    "日本語のテキスト the and of",                      // CJK + en words
    "tab\tnewline\nverticalform\ffeed\rret",    // every \s class char
    "KK kelvin",                                 // U+212A lowercases to 'k'
    "x" * 600,                                        // len term saturation
    ("the " * 200).trim)                              // stop term saturation

  private def corpus = {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"text").as[String].collect().toSeq
    (docs ++ edgeCases).toDF("text")
  }

  test("native langId matches the composed form on corpus + edge cases") {
    val got = corpus.select(
      TextFunctions.langId($"text").as("native"),
      TextFunctions.langIdComposed($"text").as("composed"))
    assert(got.where($"native" =!= $"composed" ||
      $"native".isNull =!= $"composed".isNull).count() === 0)
  }

  test("native qualityScore matches the composed form bit-for-bit") {
    val got = corpus.select(
      TextFunctions.qualityScore($"text").as("native"),
      TextFunctions.qualityScoreComposed($"text").as("composed"))
    // exact double equality — same terms, same evaluation order
    assert(got.where($"native" =!= $"composed" ||
      $"native".isNull =!= $"composed".isNull).count() === 0)
  }

  test("langId of null is 'und'; quality of null is null") {
    val row = Seq(Tuple1(null.asInstanceOf[String])).toDF("text")
      .select(TextFunctions.langId($"text").as("lang"),
        TextFunctions.qualityScore($"text").as("q"))
      .head()
    assert(row.getString(0) === "und")
    assert(row.isNullAt(1))
  }

  test("native expressions stay inside whole-stage codegen") {
    // a parquet-backed frame: local relations get eagerly evaluated by
    // ConvertToLocalRelation and would show no codegen at all
    val parquet = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val plan = parquet.select(
      TextFunctions.langId($"text"), TextFunctions.qualityScore($"text"))
      .queryExecution.executedPlan
    val formatted = plan.toString
    // the `*(n)` prefix is simpleString's WholeStageCodegen marker
    assert(formatted.contains("*(1) Project"),
      s"expected codegen'd project, got:\n$formatted")
  }
}
