package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs batched
  * per partition (the Scala twin of `mapInPandas` — one decoder instance
  * per partition, amortized over its rows, never per-row setup).
  *
  * IMAGE decode/resize is REAL ([[ImageIoDecoder]]/[[ImageIoResizer]]):
  * `javax.imageio` + `java.awt.image` ship with the JDK, so PNG/JPEG/GIF/
  * BMP decode needs no external library even offline. AUDIO/VIDEO decode
  * remains stubbed behind the [[Decoder]] seam ([[StubDecoder]] — a
  * deterministic fake keeping schema, partitioning, and batch shape real);
  * a production codec (JNI to ffmpeg, or a model-server client) drops in
  * per partition without touching the pipeline.
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

  /** REAL image decoder — JDK-only (`javax.imageio`), no external deps.
    * For payloads whose mime has the `image/` prefix: decodes the actual bytes (PNG/JPEG/GIF/BMP —
    * whatever the JVM's registered ImageIO readers handle), reports true
    * pixel dimensions, and emits a `gridSize`² feature vector of mean
    * luma (Rec.601: 0.299R + 0.587G + 0.114B, normalized to [0,1]) over a
    * gridSize×gridSize box partition of the image — computed by an exact
    * per-pixel accumulation, not a Graphics2D rescale, so the features
    * are bit-deterministic across JVMs and platforms.
    *
    * Non-image mimes delegate to `fallback` (the [[StubDecoder]] seam —
    * audio/video remain stubbed pending a real codec). UNDECODABLE image
    * bytes are an ERROR naming the doc_id, never a silently-fake feature
    * row (the geometry-refusal discipline applied to media): callers
    * needing DLQ semantics wrap the decode like the envelope's Ok/Failed
    * routing (T10) does — decode failures are data errors, not schema
    * surprises.
    */
  final class ImageIoDecoder(gridSize: Int = 4,
      fallback: Decoder = new StubDecoder()) extends Decoder {
    def open(): Unit = fallback.open()
    def decode(r: MediaRecord): MediaFeatures = {
      if (r.mime == null || !r.mime.startsWith("image/")) return fallback.decode(r)
      val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case e: java.io.IOException =>
          throw new IllegalArgumentException(
            s"doc_id=${r.doc_id}: undecodable ${r.mime} payload (${r.payload.length} bytes)", e) }
      if (img == null) // ImageIO signals "no reader recognized these bytes" as null
        throw new IllegalArgumentException(
          s"doc_id=${r.doc_id}: payload (${r.payload.length} bytes) is not a " +
            s"decodable image despite mime ${r.mime} — no ImageIO reader accepts it")
      MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong,
        img.getWidth, img.getHeight, lumaGrid(img, gridSize))
    }
  }

  /** gridSize² mean-luma features (Rec.601, normalized to [0,1]) over a
    * gridSize×gridSize box partition — exact per-pixel accumulation, so
    * bit-deterministic across JVMs/platforms. Shared by the image and
    * video (per-frame) decoders.
    */
  private[operators] def lumaGrid(img: java.awt.image.BufferedImage,
      g: Int): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Double](g * g)
    val counts = new Array[Long](g * g)
    // bulk scanline fetch: per-pixel getRGB(x, y) pays a ColorModel
    // conversion call per pixel (~10× slower) — w×h calls per record in
    // the pipeline's hot loop; the row form returns identical values
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      val cy = math.min(g - 1, y * g / h)
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val luma = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        val cell = cy * g + math.min(g - 1, x * g / w)
        sums(cell) += luma / 255.0
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(g * g)(i =>
      if (counts(i) == 0) 0.0f else (sums(i) / counts(i)).toFloat)
  }

  /** REAL audio decoder — JDK-only (`javax.sound.sampled`): WAV, AIFF and
    * AU payloads (the formats the JDK's built-in SPIs read; PCM plus
    * µ-law/a-law) decode to true sample rate, channel count, and a
    * `windows`-segment RMS-energy envelope over the mono-mixed signal
    * (each value in [0,1], 1.0 = full-scale) — the audio analogue of
    * [[ImageIoDecoder]]'s luma grid, computed by exact integer
    * accumulation (bit-deterministic). NON-audio mimes delegate to
    * `fallback`; audio mimes the JDK cannot decode — compressed codecs
    * (mp3/ogg/aac) have no JDK SPI — are an ERROR naming the doc_id, the
    * same rule as undecodable bytes: silently-fake features for real
    * audio are the failure mode this family refuses everywhere, so a
    * mixed-codec corpus must either route compressed mimes to a real
    * codec behind the seam or filter them upstream.
    *
    * [[MediaFeatures]] field mapping for the audio modality (the schema is
    * shared across modalities by design — one lake table, one pipeline):
    * `width` = sample rate in Hz, `height` = channel count.
    */
  final class JavaSoundDecoder(windows: Int = 8,
      fallback: Decoder = new StubDecoder()) extends Decoder {
    require(windows >= 1, s"windows must be positive, got $windows")
    def open(): Unit = fallback.open()
    def decode(r: MediaRecord): MediaFeatures = {
      if (r.mime == null || !r.mime.startsWith("audio/")) return fallback.decode(r)
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val pcm = try {
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val f = ais.getFormat
        // normalize every JDK-decodable encoding to 16-bit signed
        // little-endian PCM at the source rate/channels: one sample-read
        // loop below serves PCM and µ-law/a-law alike
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
          f.getSampleRate, false)
        AudioSystem.getAudioInputStream(target, ais)
      } catch {
        case e @ (_: javax.sound.sampled.UnsupportedAudioFileException |
                  _: java.io.IOException |
                  _: IllegalArgumentException) =>
          throw new IllegalArgumentException(
            s"doc_id=${r.doc_id}: undecodable ${r.mime} payload " +
              s"(${r.payload.length} bytes) — the JDK SPIs read WAV/AIFF/AU " +
              "(PCM, µ-law, a-law); compressed codecs need a real codec " +
              "behind the Decoder seam", e)
      }
      val fmt = pcm.getFormat
      val channels = fmt.getChannels
      val bytes = pcm.readAllBytes()
      val nFrames = bytes.length / (2 * channels)
      // mono-mix each frame, accumulate sum-of-squares per window
      val sums = new Array[Double](windows)
      val counts = new Array[Long](windows)
      var fr = 0
      while (fr < nFrames) {
        var mix = 0L
        var ch = 0
        while (ch < channels) {
          val off = (fr * channels + ch) * 2
          mix += ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort
          ch += 1
        }
        val s = mix.toDouble / channels / 32768.0
        val w = math.min(windows - 1, (fr.toLong * windows / math.max(1, nFrames)).toInt)
        sums(w) += s * s
        counts(w) += 1
        fr += 1
      }
      val feat = Array.tabulate(windows)(i =>
        if (counts(i) == 0) 0.0f else math.sqrt(sums(i) / counts(i)).toFloat)
      MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong,
        width = fmt.getSampleRate.toInt, height = channels, feat)
    }
  }

  /** REAL video decoder for MJPEG-AVI — JDK-only: [[MjpegAvi.frames]]
    * parses the RIFF container, `sampleFrames` I-frames are sampled evenly
    * ([[MjpegAvi.sampleIndices]] — deterministic frame sampling, the
    * pipeline never decodes every frame of a long clip), each decodes via
    * `ImageIO` to the shared `gridSize`² luma grid. The feature vector is
    * the CONCATENATION of the sampled frames' grids (a fixed
    * sampleFrames·gridSize² layout; clips shorter than `sampleFrames`
    * contribute fewer grids).
    *
    * [[MediaFeatures]] mapping for the video modality: `width`/`height` =
    * first sampled frame's pixel dims. Non-video mimes delegate to
    * `fallback`; video bytes that are not a well-formed MJPEG-AVI are an
    * ERROR naming the doc_id (compressed inter-frame codecs have no JDK
    * decoder — route them to a real codec behind the seam or filter
    * upstream), the same refusal rule as the image/audio decoders.
    */
  final class MjpegAviDecoder(gridSize: Int = 4, sampleFrames: Int = 4,
      fallback: Decoder = new StubDecoder()) extends Decoder {
    require(sampleFrames >= 1, s"sampleFrames must be positive, got $sampleFrames")
    def open(): Unit = fallback.open()
    def decode(r: MediaRecord): MediaFeatures = {
      if (r.mime == null || !r.mime.startsWith("video/")) return fallback.decode(r)
      val frameBytes = try MjpegAvi.frames(r.payload)
        catch { case e: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"doc_id=${r.doc_id}: undecodable ${r.mime} payload " +
              s"(${r.payload.length} bytes) — ${e.getMessage}", e) }
      val sampled = MjpegAvi.sampleIndices(frameBytes.size, sampleFrames)
        .map(frameBytes)
      val grids = sampled.zipWithIndex.map { case (f, i) =>
        val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
          catch { case e: java.io.IOException =>
            throw new IllegalArgumentException(
              s"doc_id=${r.doc_id}: sampled frame $i is undecodable", e) }
        if (img == null) throw new IllegalArgumentException(
          s"doc_id=${r.doc_id}: sampled frame $i is not a decodable JPEG")
        (img, lumaGrid(img, gridSize))
      }
      MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong,
        grids.head._1.getWidth, grids.head._1.getHeight,
        grids.flatMap(_._2).toArray)
    }
  }

  /** The full modality chain: video → audio → image → deterministic stub —
    * one decoder instance routing every mime the JDK can decode, for
    * mixed-modality lake tables.
    */
  def jdkDecoder(gridSize: Int = 4, sampleFrames: Int = 4,
      audioWindows: Int = 8): Decoder =
    new MjpegAviDecoder(gridSize, sampleFrames,
      new JavaSoundDecoder(audioWindows, new ImageIoDecoder(gridSize)))

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

  /** REAL image resizer — JDK-only: decode (`javax.imageio`) → scale
    * (`Graphics2D` with NEAREST-NEIGHBOR interpolation — the one
    * interpolation mode whose output is exactly determined by source
    * pixels and target geometry, so thumbnails are bit-identical across
    * JVMs/platforms) → re-encode as PNG (lossless + deterministic; JPEG
    * re-encode quality would vary by encoder build). Output mime is
    * `image/png` regardless of input format — the pixels, not the
    * container, are the payload contract. Non-image mimes delegate to
    * `fallback`; undecodable image bytes are an error naming the doc_id
    * (the [[ImageIoDecoder]] rule).
    */
  final class ImageIoResizer(fallback: Resizer = new StubResizer) extends Resizer {
    def open(): Unit = fallback.open()
    def resize(r: MediaRecord, width: Int, height: Int): MediaRecord = {
      if (r.mime == null || !r.mime.startsWith("image/"))
        return fallback.resize(r, width, height)
      val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case e: java.io.IOException =>
          throw new IllegalArgumentException(
            s"doc_id=${r.doc_id}: undecodable ${r.mime} payload (${r.payload.length} bytes)", e) }
      if (img == null)
        throw new IllegalArgumentException(
          s"doc_id=${r.doc_id}: payload (${r.payload.length} bytes) is not a " +
            s"decodable image despite mime ${r.mime} — no ImageIO reader accepts it")
      val out = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = out.createGraphics()
      try {
        g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g2.drawImage(img, 0, 0, width, height, null)
        ()
      } finally g2.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      MediaRecord(r.doc_id, baos.toByteArray, "image/png")
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
