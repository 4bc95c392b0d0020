package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs batched
  * per partition (the Scala twin of `mapInPandas` — one decoder instance
  * per partition, amortized over its rows, never per-row setup).
  *
  * The actual media decode is STUBBED behind [[Decoder]] (the container has
  * no image/audio libraries — per the offline contract): [[StubDecoder]] is
  * a deterministic fake so the schema, partitioning, batch shape, and
  * feature plumbing are real and tested end-to-end; a production decoder
  * (JNI to ffmpeg/opencv, or a model server client) drops in per partition
  * without touching the pipeline.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String)
  final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, feature: Array[Float])

  /** Per-partition decoder: open once, decode a batch. */
  trait Decoder extends Serializable {
    def open(): Unit
    def decode(r: MediaRecord): MediaFeatures
  }

  /** Deterministic fake: "dimensions" from payload length, "embedding" from
    * rolling byte statistics — stable across runs and engines.
    */
  final class StubDecoder(dim: Int = 8) extends Decoder {
    def open(): Unit = ()
    def decode(r: MediaRecord): MediaFeatures = {
      val bytes = r.payload
      val feat = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        feat(i % dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      MediaFeatures(r.doc_id, r.mime, bytes.length.toLong,
        width = 16 + (bytes.length % 64), height = 16 + (bytes.length % 48), feat)
    }
  }

  /** The pipeline: binary payload dataset → per-partition batched decode →
    * typed feature rows. Narrow (no shuffle); scales with partitions.
    */
  def extractFeatures(media: Dataset[MediaRecord], decoder: Decoder)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      decoder.open() // once per partition, amortized over the batch
      rows.map(decoder.decode)
    }
  }

  /** Wrap a text/binary column as media records (test harness: documents'
    * text bytes stand in for media bytes).
    */
  def fromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("mime")).as[MediaRecord]
  }

  /** Per-partition media resizer: open once, resize a batch to target
    * dimensions. Production: decode → scale → re-encode; the stub below
    * keeps the plumbing (typed schema, narrow execution, payload-size ∝
    * target area) real without media libraries.
    */
  trait Resizer extends Serializable {
    def open(): Unit
    def resize(r: MediaRecord, width: Int, height: Int): MediaRecord
  }

  /** Deterministic fake resize: stride-resample the payload bytes to
    * `width*height/8` output bytes — stable across runs/engines, output
    * size scales with the target area like a real thumbnail would.
    */
  final class StubResizer extends Resizer {
    def open(): Unit = ()
    def resize(r: MediaRecord, width: Int, height: Int): MediaRecord = {
      val n = math.max(1, width * height / 8)
      val src = r.payload
      val out = new Array[Byte](n)
      if (src.nonEmpty) {
        var i = 0
        while (i < n) {
          out(i) = src((i.toLong * src.length / n).toInt)
          i += 1
        }
      }
      MediaRecord(r.doc_id, out, r.mime)
    }
  }

  /** Batched per-partition resize — same execution shape as
    * [[extractFeatures]]: one resizer per partition, no shuffle.
    */
  def resizeAll(media: Dataset[MediaRecord], resizer: Resizer, width: Int, height: Int)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      resizer.open()
      rows.map(r => resizer.resize(r, width, height))
    }
  }
}
