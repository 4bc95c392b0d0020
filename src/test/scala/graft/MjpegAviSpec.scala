package graft

import graft.operators.{MjpegAvi, Multimodal}
import graft.operators.Multimodal.MediaRecord

/** MJPEG-AVI video tier (r11): the one video format decodable with the
  * bare JDK — container round-trip is byte-exact, per-frame features match
  * the image decoder on the same JPEG bytes, frame sampling is
  * deterministic, and anything that is not a well-formed MJPEG-AVI is
  * refused naming the doc_id (the Multimodal rule: no silently-fake
  * features, ever).
  */
class MjpegAviSpec extends SparkSuite {

  /** A deterministic w×h JPEG whose gray level is `v` everywhere. */
  private def jpegFrame(w: Int, h: Int, v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    try { g2.setColor(new java.awt.Color(v, v, v)); g2.fillRect(0, 0, w, h) }
    finally g2.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  test("container round-trip is byte-exact: frames(encode(fs)) == fs") {
    val fs = (0 until 7).map(i => jpegFrame(32, 24, 30 * i))
    val avi = MjpegAvi.encode(fs, 32, 24, fps = 5)
    val back = MjpegAvi.frames(avi)
    assert(back.size == 7)
    back.zip(fs).zipWithIndex.foreach { case ((b, f), i) =>
      assert(java.util.Arrays.equals(b, f), s"frame $i changed in the container")
    }
  }

  test("video features = the image decoder's luma grids on the sampled frames") {
    val fs = (0 until 10).map(i => jpegFrame(40, 40, 25 * i))
    val avi = MjpegAvi.encode(fs, 40, 40)
    val dec = new Multimodal.MjpegAviDecoder(gridSize = 4, sampleFrames = 4)
    val got = dec.decode(MediaRecord(7L, avi, "video/avi"))
    assert(got.width == 40 && got.height == 40 && got.feature.length == 64)
    // frame sampling lattice: floor(i*10/4) = 0, 2, 5, 7 — deterministic
    assert(MjpegAvi.sampleIndices(10, 4) == Seq(0, 2, 5, 7))
    val img = new Multimodal.ImageIoDecoder(4)
    Seq(0, 2, 5, 7).zipWithIndex.foreach { case (fi, slot) =>
      val expect = img.decode(MediaRecord(0L, fs(fi), "image/jpeg")).feature
      val gotSlot = got.feature.slice(slot * 16, slot * 16 + 16)
      assert(gotSlot.sameElements(expect), s"frame $fi grid diverged from image decoder")
    }
    // clips shorter than sampleFrames contribute every frame once
    val short = MjpegAvi.encode(fs.take(2), 40, 40)
    assert(dec.decode(MediaRecord(8L, short, "video/avi")).feature.length == 32)
  }

  test("refusals: non-AVI video bytes, non-JPEG frames, truncation — all name the doc_id") {
    val dec = new Multimodal.MjpegAviDecoder()
    val e1 = intercept[IllegalArgumentException] {
      dec.decode(MediaRecord(41L, "mp4mp4mp4mp4mp4mp4".getBytes, "video/mp4"))
    }
    assert(e1.getMessage.contains("doc_id=41") && e1.getMessage.contains("RIFF"),
      e1.getMessage)
    // a structurally-valid AVI whose frame chunk is not JPEG (a stand-in
    // for any non-MJPEG codec) is refused, not fed to ImageIO
    val jpeg = jpegFrame(8, 8, 128)
    val good = MjpegAvi.encode(Seq(jpeg), 8, 8)
    val corrupt = good.clone()
    // flip the SOI marker of the embedded frame
    val soi = {
      var i = 12; var found = -1
      while (found < 0 && i < corrupt.length - 1) {
        if ((corrupt(i) & 0xff) == 0xff && (corrupt(i + 1) & 0xff) == 0xd8) found = i
        i += 1
      }
      found
    }
    corrupt(soi) = 0x00
    val e2 = intercept[IllegalArgumentException] {
      dec.decode(MediaRecord(42L, corrupt, "video/avi"))
    }
    assert(e2.getMessage.contains("doc_id=42"), e2.getMessage)
    // truncated container: chunk sizes past the end are a loud error
    val e3 = intercept[IllegalArgumentException] {
      dec.decode(MediaRecord(43L, good.take(good.length - 10), "video/avi"))
    }
    assert(e3.getMessage.contains("doc_id=43") && e3.getMessage.contains("truncated"),
      e3.getMessage)
  }

  test("the jdkDecoder chain routes every modality to its real decoder") {
    val dec = Multimodal.jdkDecoder(gridSize = 4, sampleFrames = 2)
    dec.open()
    val avi = MjpegAvi.encode(Seq(jpegFrame(16, 16, 100)), 16, 16)
    val v = dec.decode(MediaRecord(1L, avi, "video/avi"))
    assert(v.width == 16 && v.feature.length == 16) // 1 frame < sampleFrames
    val png = {
      val img = new java.awt.image.BufferedImage(12, 12,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos); baos.toByteArray
    }
    val i = dec.decode(MediaRecord(2L, png, "image/png"))
    assert(i.width == 12 && i.height == 12)
    val wav = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](1600)), fmt, 800L)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val a = dec.decode(MediaRecord(3L, wav, "audio/wav"))
    assert(a.width == 8000 && a.height == 1)
    // unknown modality falls through to the deterministic stub
    val s = dec.decode(MediaRecord(4L, Array[Byte](1, 2, 3), "application/octet-stream"))
    assert(s.n_bytes == 3)
  }
}
