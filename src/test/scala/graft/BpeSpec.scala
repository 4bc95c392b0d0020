package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe
import graft.functions.Bpe.BpeVocab
import graft.functions.TextFunctions

/** Real BPE (merge loop over a caller-supplied merges table) — parity
  * against hand-computed tokenizations of a toy vocab, the classic
  * rank-order and non-overlapping-fuse semantics, and the bracket that
  * ties it to the cheap approximation: for any text,
  * bpeTokenCount(approx) ≤ exact BPE count ≤ pre-token char count.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private val toy = BpeVocab(Seq(("l", "o"), ("lo", "w"), ("e", "r")))

  private def tokens(v: BpeVocab, s: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    v.encode(s).asScala.toSeq
  }

  test("hand-computed toy-vocab tokenizations") {
    // "lower": l o w e r → (l,o) r0 → lo w e r → (lo,w) r1 → low e r
    //          → (e,r) r2 → low er
    assert(tokens(toy, "lower") == Seq("low", "er"))
    // "hello": h e l l o → only (l,o) ranked → h e l lo, then no ranked
    // pair remains
    assert(tokens(toy, "hello") == Seq("h", "e", "l", "lo"))
    // pre-tokenization: words split on whitespace, punctuation is its own
    // single symbol (never merged across pre-token boundaries)
    assert(tokens(toy, "lower hello!") ==
      Seq("low", "er", "h", "e", "l", "lo", "!"))
    // digits are their own run class: "low42er" → [low][42][er] pre-tokens?
    // no — the regex splits alpha/digit runs: "low" "42" "er"
    assert(tokens(toy, "low42er") == Seq("low", "4", "2", "er"))
  }

  test("merge rank order decides the split; non-overlapping left-to-right fuse") {
    val ab = BpeVocab(Seq(("a", "b"), ("b", "c")))
    val bc = BpeVocab(Seq(("b", "c"), ("a", "b")))
    assert(tokens(ab, "abc") == Seq("ab", "c"))
    assert(tokens(bc, "abc") == Seq("a", "bc"))
    val aa = BpeVocab(Seq(("a", "a")))
    assert(tokens(aa, "aaaa") == Seq("aa", "aa"))
    assert(tokens(aa, "aaa") == Seq("aa", "a"))
    val aaaa = BpeVocab(Seq(("a", "a"), ("aa", "aa")))
    assert(tokens(aaaa, "aaaa") == Seq("aaaa"))
  }

  test("unicode: non-ASCII chars are single symbols, surrogate pairs never split") {
    val none = BpeVocab(Nil)
    assert(tokens(none, "café") == Seq("c", "a", "f", "é"))
    val caf = BpeVocab(Seq(("c", "a"), ("ca", "f")))
    assert(tokens(caf, "café") == Seq("caf", "é"))
    // U+1D11E (musical G clef) is a surrogate pair in UTF-16: one symbol
    assert(tokens(none, "a𝄞b") == Seq("a", "𝄞", "b"))
  }

  test("column expressions: counts and tokens, null/empty semantics, codegen path") {
    val df = Seq(
      (1L, "lower hello!"),
      (2L, ""),
      (3L, "   \t\n"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val got = df.select($"id",
        Bpe.bpe_token_count($"text", toy).as("n"),
        Bpe.bpe_tokens($"text", toy).as("toks"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(1L) == 7L)
    assert(got(2L) == 0L && got(3L) == 0L)
    assert(got(4L) == -1L, "null text must yield NULL, not 0")
    // tokens array matches the count and the direct eval
    val toks = df.where($"id" === 1).select(Bpe.bpe_tokens($"text", toy))
      .head().getSeq[String](0)
    assert(toks == Seq("low", "er", "h", "e", "l", "lo", "!"))
  }

  test("bracket vs the cheap approximation on the real corpus: approx <= exact <= chars") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(500)
    val checked = docs.select(
        TextFunctions.bpeTokenCount($"text").as("approx"),
        Bpe.bpe_token_count($"text", toy).as("exact"),
        Bpe.bpe_token_count($"text", BpeVocab(Nil)).as("chars"))
      .agg(
        sum(when($"approx" <= $"exact" && $"exact" <= $"chars", 0).otherwise(1)).as("violations"),
        sum($"exact").as("se"), sum($"chars").as("sc"))
      .head()
    assert(checked.getLong(0) == 0, s"bracket violated: $checked")
    // the toy vocab's merges actually fire on English text (lo/er are
    // frequent bigrams): exact under the vocab is strictly below the
    // empty-vocab char count, i.e. the merge loop demonstrably ran
    assert(checked.getLong(1) < checked.getLong(2))
  }

  test("fromDataFrame orders merges by rank column") {
    val merges = Seq(("b", "c", 0), ("a", "b", 1)).toDF("left", "right", "rank")
    val v = BpeVocab.fromDataFrame(merges)
    assert(v.size == 2)
    assert(tokens(v, "abc") == Seq("a", "bc"))
  }

  test("fromMergesFile parses the standard merges.txt format; parity with the pair form") {
    // a real GPT-2-style snippet: version header, rank = line order
    val path = s"${tmpDir("graft-merges-")}/merges.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      ("#version: 0.2\nh e\nl l\nhe ll\ne r\nll o\n").getBytes("UTF-8"))
    val v = BpeVocab.fromMergesFile(path)
    assert(v.size == 5)
    // "hello": h e l l o → (h,e) r0 → he l l o → (l,l) r1 → he ll o
    //          → (he,ll) r2 → hell o; (ll,o) is rank 4 but ll was consumed
    assert(tokens(v, "hello") == Seq("hell", "o"))
    // byte-for-byte parity with the same ranking built from pairs
    val pairForm = BpeVocab(Seq(("h", "e"), ("l", "l"), ("he", "ll"),
      ("e", "r"), ("ll", "o")))
    Seq("hello there", "seller", "h ell o!", "er").foreach(s =>
      assert(tokens(v, s) == tokens(pairForm, s), s))
    // header handling is first-line-only; malformed lines are refused
    val bad = s"${tmpDir("graft-merges-bad-")}/merges.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(bad),
      "#version: 0.2\na b c\n".getBytes("UTF-8"))
    val ex = intercept[IllegalArgumentException] { BpeVocab.fromMergesFile(bad) }
    assert(ex.getMessage.contains("line 2"), ex.getMessage)
  }

  test("the codegen'd expression runs a merges-file vocab over a column") {
    val path = s"${tmpDir("graft-merges-col-")}/merges.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "t h\nth e\n".getBytes("UTF-8"))
    val v = BpeVocab.fromMergesFile(path)
    val got = Seq("the theory", "breathe").toDF("text")
      .select(Bpe.bpe_token_count(col("text"), v).as("n"))
      .collect().map(_.getLong(0)).toSeq
    // "the"→[the]=1, "theory"→[the,o,r,y]=4 → 5; "breathe"→[b,r,e,a,the]=5
    assert(got == Seq(5L, 5L))
  }
}
