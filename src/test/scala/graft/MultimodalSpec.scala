package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRecord, StubDecoder}

/** Multimodal plumbing: schema/batch-shape/partitioning are real; the
  * decoder is the deterministic stub per the offline-container contract.
  */
class MultimodalSpec extends SparkSuite {
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark
  import spark.implicits._

  test("per-partition batched decode emits typed features for every record") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
    val media = Multimodal.fromDocuments(docs)
    val feats = Multimodal.extractFeatures(media, new StubDecoder(dim = 8))
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.feature.length == 8))
    assert(rows.forall(r => r.n_bytes > 0 && r.width >= 16 && r.height >= 16))
    // deterministic: same input → identical features
    val again = Multimodal.extractFeatures(media, new StubDecoder(dim = 8))
      .collect().map(r => r.doc_id -> r.feature.toSeq).toMap
    rows.foreach(r => assert(again(r.doc_id) == r.feature.toSeq))
  }

  test("decode stays narrow: no shuffle in the feature-extraction plan") {
    val media = Multimodal.fromDocuments(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val feats = Multimodal.extractFeatures(media, new StubDecoder())
    val p = feats.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("binary payloads with embedded zeros and empty payloads survive") {
    val media = Seq(
      MediaRecord(1L, Array[Byte](0, 1, 0, -1, 127), "application/octet-stream"),
      MediaRecord(2L, Array.empty[Byte], "application/octet-stream"))
      .toDS()
    val rows = Multimodal.extractFeatures(media, new StubDecoder(dim = 4))
      .collect().map(r => r.doc_id -> r).toMap
    assert(rows(1L).n_bytes == 5)
    assert(rows(2L).n_bytes == 0 && rows(2L).feature.forall(_ == 0.0f))
  }

  test("resize is batched, narrow, deterministic, and area-proportional") {
    val media = Multimodal.fromDocuments(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val small = Multimodal.resizeAll(media, new Multimodal.StubResizer, 32, 32)
    val large = Multimodal.resizeAll(media, new Multimodal.StubResizer, 64, 64)
    // no shuffle: same narrow shape as decode
    assert(!small.queryExecution.executedPlan.toString.contains("Exchange"))
    val s1 = small.collect().map(r => r.doc_id -> r.payload.toSeq).toMap
    val s2 = Multimodal.resizeAll(media, new Multimodal.StubResizer, 32, 32)
      .collect().map(r => r.doc_id -> r.payload.toSeq).toMap
    assert(s1 == s2, "resize must be deterministic")
    // payload size scales with target area; ids and mime preserved
    val l1 = large.collect().map(r => r.doc_id -> r).toMap
    s1.keys.foreach { id =>
      assert(s1(id).size == 32 * 32 / 8)
      assert(l1(id).payload.length == 64 * 64 / 8)
      assert(l1(id).mime == "application/octet-stream")
    }
  }
}
