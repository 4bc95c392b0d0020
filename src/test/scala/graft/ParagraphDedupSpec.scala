package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class ParagraphDedupSpec extends SparkSuite {
  import spark.implicits._

  test("repeated paragraphs survive only at their first (doc, position) occurrence") {
    val docs = Seq(
      (1L, "unique alpha\n\nshared footer"),
      (2L, "unique beta\n\nshared footer"),
      (3L, "shared footer\n\nunique gamma"),
      (4L, "shared footer")).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 2L, 1L), (4L, 1L, 0L)))
    assert(got(0).getString(3) === "unique alpha\n\nshared footer")
    assert(got(1).getString(3) === "unique beta")
    assert(got(2).getString(3) === "unique gamma")
    assert(got(3).isNullAt(3)) // fully-boilerplate doc
  }

  test("whitespace variants of a paragraph dedup together, original kept verbatim") {
    val docs = Seq(
      (1L, "The  Footer"),
      (2L, "the footer")).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(got(0).getString(3) === "The  Footer")
    assert(got(1).getLong(2) === 0L)
  }

  test("a paragraph repeated inside ONE doc is dropped after its first position") {
    val docs = Seq((1L, "same\n\nmiddle\n\nsame")).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, "doc_id", "text").head()
    assert(got.getLong(1) === 3L && got.getLong(2) === 2L)
    assert(got.getString(3) === "same\n\nmiddle")
  }

  test("fingerprint window carries no paragraph bodies") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val docs = Seq((1L, "a\n\nb")).toDF("doc_id", "text")
    val plan = Dedup.paragraphDedup(docs, "doc_id", "text")
      .queryExecution.optimizedPlan
    // the Window's INPUT schema must be (doc_id, i, fp) — paragraph text
    // is consumed map-side by the fingerprint projection, never shuffled
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val inputs = w.child.output.map(_.name).toSet
      assert(inputs === Set("doc_id", "i", "fp"),
        s"window shuffles more than fingerprints: $inputs")
    }
  }

  test("containment flags a prefix copy that Jaccard under-scores") {
    val long = ("w" + (1 to 60).map(i => s"tok$i").mkString(" ", " ", ""))
    val short = long.split(" ").take(20).mkString(" ")
    val docs = Seq((1L, long), (2L, short)).toDF("doc_id", "text")
    val arrays = Dedup.shingleArrays(docs, "doc_id", "text", n = 3)
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val got = Dedup.containmentOnArrays(pairs, arrays).head()
    val (ca, cb, j) = (got.getDouble(2), got.getDouble(3), got.getDouble(4))
    // id_b is the contained side here: containment_b ≈ 1, jaccard ≈ 18/59
    assert(math.abs(cb - 1.0) < 1e-9)
    assert(j < 0.5)
    assert(ca < 0.5)
  }
}
