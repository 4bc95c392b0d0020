package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Token-level repeated-span detection/removal (Dedup.repeatedSpans /
  * stripRepeatedSpans): hand-computed corpora pin the gram flagging, the
  * gaps-and-islands merge (overlap, exact-touch, and split cases), and the
  * keep-first strip semantics, all at k = 3 so every expectation is
  * verifiable by eye.
  */
class RepeatedSpanSpec extends SparkSuite {
  import spark.implicits._

  private def spans(docs: org.apache.spark.sql.DataFrame, k: Int = 3) =
    Dedup.repeatedSpans(docs, "doc_id", "text", k = k)
      .orderBy($"id", $"span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("cross-doc shared token run becomes one merged span per side") {
    val docs = Seq(
      (1L, "x1 x2 c1 c2 c3 c4 y1"),
      (2L, "z1 c1 c2 c3 c4 z2")).toDF("doc_id", "text")
    // shared grams: c1c2c3 (doc1@3, doc2@2), c2c3c4 (doc1@4, doc2@3) —
    // adjacent flags merge into one span covering c1..c4 on both sides
    assert(spans(docs) === Seq((1L, 3L, 6L, 4L), (2L, 2L, 5L, 4L)))
  }

  test("within-doc repetition flags both occurrences; far-apart flags stay split") {
    val docs = Seq((3L, "a b c m a b c")).toDF("doc_id", "text")
    // "a b c" at pos 1 and 5; 5 > 1 + 3 ⇒ two spans
    assert(spans(docs) === Seq((3L, 1L, 3L, 3L), (3L, 5L, 7L, 3L)))
  }

  test("exact-touch positions (p2 = p1 + k) merge into one span") {
    val docs = Seq((4L, "a b c a b c")).toDF("doc_id", "text")
    // "a b c" at pos 1 and 4; 4 ≤ 1 + 3 ⇒ single span covering the doc
    assert(spans(docs) === Seq((4L, 1L, 6L, 6L)))
  }

  test("no repeats → empty; docs shorter than k never flag") {
    val docs = Seq(
      (5L, "one two three four"),
      (6L, "ab cd")).toDF("doc_id", "text")
    assert(spans(docs).isEmpty)
  }

  test("strip keeps the (id, pos)-first occurrence, cuts every other") {
    val docs = Seq(
      (1L, "x1 x2 c1 c2 c3 c4 y1"),
      (2L, "z1 c1 c2 c3 c4 z2"),
      (3L, "a b c m a b c")).toDF("doc_id", "text")
    val got = Dedup.stripRepeatedSpans(docs, "doc_id", "text", k = 3)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got === Seq(
      // doc1 owns the shared run's first occurrence — untouched
      (1L, 7L, 0L, "x1 x2 c1 c2 c3 c4 y1"),
      // doc2's copy of c1..c4 is cut
      (2L, 6L, 4L, "z1 z2"),
      // doc3's second "a b c" is cut, its first kept
      (3L, 7L, 3L, "a b c m")))
  }

  test("an exact duplicate doc strips to empty; the keeper stays whole") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"),
      (2L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val got = Dedup.stripRepeatedSpans(docs, "doc_id", "text", k = 3)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(got === Seq((1L, 0L, "w1 w2 w3 w4 w5"), (2L, 5L, "")))
  }

  test("detection and strip agree: removed token count = loser span coverage") {
    // a mixed corpus: exact copy, partial overlap, and a unique doc
    val docs = Seq(
      (1L, "p q r s t u v"),
      (2L, "p q r s t u v"),
      (3L, "m n p q r s o"),
      (4L, "only unique words here")).toDF("doc_id", "text")
    val stripped = Dedup.stripRepeatedSpans(docs, "doc_id", "text", k = 3)
    val total = stripped.agg(sum($"n_removed")).head().getLong(0)
    // every removed position lies in some detected span of its doc
    val perDoc = stripped.select($"id", $"n_tokens", $"n_removed").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perDoc(1L)._2 === 0L) // corpus-first owner never loses tokens
    assert(perDoc(4L)._2 === 0L)
    assert(total > 0L)
    val detected = Dedup.repeatedSpans(docs, "doc_id", "text", k = 3)
      .groupBy($"id").agg(sum($"span_tokens").as("cov"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // strip can only remove positions detection flagged
    perDoc.foreach { case (id, (_, removed)) =>
      assert(removed <= detected.getOrElse(id, 0L))
    }
  }
}
