package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, WordNGrams}

/** The native word_ngrams expression must be element-identical to the
  * higher-order formulation it replaced (transform + slice + concat_ws) —
  * the oracle SQL and every dedup signature derive from these grams.
  */
class WordNGramsSpec extends SparkSuite {
  import spark.implicits._

  private def hofNgrams(toks: org.apache.spark.sql.Column, n: Int) =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  test("matches the HOF form on real corpus text, n=2..4") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select($"doc_id", $"text")
    (2 to 4).foreach { n =>
      val toks = TextFunctions.tokens($"text")
      val diff = docs.select(
          TextFunctions.ngrams(toks, n).as("native"), hofNgrams(toks, n).as("hof"))
        .where(not($"native" <=> $"hof"))
      assert(diff.count() == 0, s"n=$n mismatch")
    }
  }

  test("edge cases: null array, short array, null tokens, empty strings") {
    val rows = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b")),          // shorter than n=3 → empty
      (3L, Seq.empty[String]),
      (4L, null.asInstanceOf[Seq[String]]),
      (5L, Seq("", "x", ""))        // empty strings are legal tokens
    ).toDF("id", "toks")
    val got = rows.select($"id", TextFunctions.ngrams($"toks", 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("a b c", "b c d"))
    assert(got(2L) == Seq.empty)
    assert(got(3L) == Seq.empty)
    assert(got(4L) == Seq.empty) // null tokens → when() guard → empty, like the HOF form
    assert(got(5L) == Seq(" x "))
  }

  test("null elements inside the window are skipped (concat_ws semantics)") {
    // build an array with a null element via a when() on a planted value
    val df = Seq((1L, Seq("a", "X", "c"))).toDF("id", "toks")
      .select($"id", transform($"toks", t => when(t =!= "X", t)).as("toks"))
    val native = df.select(WordNGrams.word_ngrams($"toks", 3).as("g"))
      .as[Seq[String]].head()
    val hof = df.select(hofNgrams($"toks", 3).as("g")).as[Seq[String]].head()
    assert(native == Seq("a c") && hof == native)
  }
}
