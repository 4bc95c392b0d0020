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

  /** A real PNG, generated in-memory: `w`×`h`, horizontal black→white
    * gradient (left column 0, right column 255, all channels equal).
    */
  private def gradientPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if (w == 1) 0 else x * 255 / (w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("ImageIoDecoder decodes a real PNG: true dimensions, luma-grid features") {
    val png = gradientPng(32, 20)
    val media = Seq(
      MediaRecord(1L, png, "image/png"),
      // a non-image payload rides the same batch and falls back to the stub
      MediaRecord(2L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), "application/octet-stream"))
      .toDS()
    val rows = Multimodal.extractFeatures(media,
      new Multimodal.ImageIoDecoder(gridSize = 4)).collect()
      .map(r => r.doc_id -> r).toMap
    val img = rows(1L)
    assert(img.width == 32 && img.height == 20, s"${img.width}x${img.height}")
    assert(img.n_bytes == png.length)
    assert(img.feature.length == 16)
    // gradient: every luma in [0,1], each grid column strictly brighter
    // than the one left of it, rows identical (horizontal gradient)
    assert(img.feature.forall(v => v >= 0.0f && v <= 1.0f))
    for (row <- 0 until 4; c <- 0 until 3)
      assert(img.feature(row * 4 + c) < img.feature(row * 4 + c + 1),
        s"row $row col $c: ${img.feature.toSeq}")
    for (c <- 0 until 4)
      assert((0 until 4).map(r => img.feature(r * 4 + c)).distinct.size == 1)
    // decode is deterministic bit-for-bit
    val again = Multimodal.extractFeatures(media,
      new Multimodal.ImageIoDecoder(gridSize = 4)).collect()
      .find(_.doc_id == 1L).get
    assert(again.feature.toSeq == img.feature.toSeq)
    // the fallback row kept the stub's shape
    assert(rows(2L).n_bytes == 8 && rows(2L).feature.length == 8)
  }

  test("ImageIoResizer resizes a real PNG to the target dimensions, deterministically") {
    val media = Seq(MediaRecord(1L, gradientPng(32, 20), "image/png")).toDS()
    val out = Multimodal.resizeAll(media, new Multimodal.ImageIoResizer, 8, 8)
      .collect().head
    assert(out.mime == "image/png")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.payload))
    assert(back.getWidth == 8 && back.getHeight == 8)
    // still a horizontal gradient after nearest-neighbor downscale
    val left = back.getRGB(0, 4) & 0xff
    val right = back.getRGB(7, 4) & 0xff
    assert(left < right, s"left=$left right=$right")
    val again = Multimodal.resizeAll(media, new Multimodal.ImageIoResizer, 8, 8)
      .collect().head
    assert(out.payload.toSeq == again.payload.toSeq, "resize must be deterministic")
  }

  /** A real WAV, generated in-memory: 1 s of 16-bit mono PCM at `rate` Hz —
    * first half silence, second half a ±`amp` square wave.
    */
  private def halfSilentWav(rate: Int = 8000, amp: Short = 16384): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = rate
    val data = new Array[Byte](n * 2)
    for (i <- n / 2 until n) {
      val v: Short = if ((i / 8) % 2 == 0) amp else (-amp).toShort
      data(i * 2) = (v & 0xff).toByte
      data(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("JavaSoundDecoder decodes a real WAV: true rate/channels, RMS envelope") {
    val wav = halfSilentWav()
    val media = Seq(
      MediaRecord(1L, wav, "audio/wav"),
      MediaRecord(2L, Array[Byte](1, 2, 3, 4), "application/octet-stream"))
      .toDS()
    val rows = Multimodal.extractFeatures(media,
      new Multimodal.JavaSoundDecoder(windows = 8)).collect()
      .map(r => r.doc_id -> r).toMap
    val a = rows(1L)
    assert(a.width == 8000 && a.height == 1, s"${a.width}Hz x${a.height}ch")
    assert(a.n_bytes == wav.length)
    assert(a.feature.length == 8)
    // first half silent, second half full square wave at amp/32768 = 0.5 RMS
    (0 until 4).foreach(i => assert(a.feature(i) == 0.0f, a.feature.toSeq))
    (4 until 8).foreach(i => assert(math.abs(a.feature(i) - 0.5f) < 0.01f,
      a.feature.toSeq))
    // deterministic bit-for-bit
    val again = Multimodal.extractFeatures(media,
      new Multimodal.JavaSoundDecoder(windows = 8)).collect()
      .find(_.doc_id == 1L).get
    assert(again.feature.toSeq == a.feature.toSeq)
    // non-audio mime fell back to the stub
    assert(rows(2L).n_bytes == 4 && rows(2L).feature.length == 8)
    // undecodable audio-mime bytes are an error naming the doc_id
    val bad = Seq(MediaRecord(9L, Array[Byte](9, 9, 9), "audio/wav")).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(bad, new Multimodal.JavaSoundDecoder()).collect()
    }
    val msg = Option(ex.getCause).map(_.getMessage).getOrElse(ex.getMessage)
    assert(msg.contains("doc_id=9"), msg)
  }

  test("undecodable image bytes are an error naming the doc_id, never fake features") {
    val media = Seq(MediaRecord(7L, Array[Byte](1, 2, 3), "image/png")).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(media, new Multimodal.ImageIoDecoder()).collect()
    }
    val msg = Option(ex.getCause).map(_.getMessage).getOrElse(ex.getMessage)
    assert(msg.contains("doc_id=7"), msg)
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
