package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal MJPEG-AVI container codec — the ONE video format decodable with
  * the bare JDK (every frame is an ordinary JPEG, which `ImageIO` reads),
  * closing the "video stays stubbed" caveat without external codec
  * libraries. RIFF-AVI structure (all sizes little-endian, chunks padded
  * to even length):
  *
  * {{{
  * RIFF <size> 'AVI '
  *   LIST 'hdrl'  { 'avih' main header, LIST 'strl' { 'strh', 'strf' } }
  *   LIST 'movi'  { '00dc' <jpeg bytes>, ... }     // optionally 'rec ' LISTs
  * }}}
  *
  * The PARSER walks chunks generically: any `..dc`/`..db` chunk inside the
  * `movi` list (including inside nested `rec ` lists) is a frame; MJPEG
  * frames are validated as JPEG by their SOI marker. The WRITER is
  * container-only — callers supply already-encoded JPEG frames (ImageIO
  * does the pixel encode), so container round-trip is byte-exact:
  * `frames(encode(fs)) == fs`.
  *
  * Compressed inter-frame codecs (H.264 etc.) remain behind the
  * [[Multimodal.Decoder]] seam — no JDK SPI exists; MJPEG is all
  * I-frames, which is exactly why it is JDK-decodable.
  */
object MjpegAvi {

  private def fourcc(s: String): Int = {
    require(s.length == 4)
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) | ((s(3) & 0xff) << 24)
  }

  /** Wrap JPEG frames in an MJPEG-AVI container. `width`/`height`/`fps`
    * land in the headers (players need them); the frames themselves are
    * written verbatim as `00dc` chunks.
    */
  def encode(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "an MJPEG-AVI needs at least one frame")
    frames.zipWithIndex.foreach { case (f, i) =>
      require(f.length >= 2 && (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8,
        s"frame $i is not a JPEG (no SOI marker): MjpegAvi.encode wraps " +
          "already-encoded JPEG frames — encode pixels with ImageIO first")
    }
    def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
      val padded = data.length + (data.length & 1)
      val b = ByteBuffer.allocate(8 + padded).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(fourcc(cc)); b.putInt(data.length); b.put(data)
      b.array()
    }
    def list(listType: String, payload: Array[Byte]): Array[Byte] = {
      val padded = payload.length + (payload.length & 1)
      val b = ByteBuffer.allocate(12 + padded).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(fourcc("LIST")); b.putInt(4 + payload.length)
      b.putInt(fourcc(listType)); b.put(payload)
      b.array()
    }
    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1000000 / math.max(1, fps)) // dwMicroSecPerFrame
      b.putInt(0); b.putInt(0); b.putInt(0)
      b.putInt(frames.size) // dwTotalFrames
      b.putInt(0); b.putInt(1) // dwStreams
      b.putInt(0); b.putInt(width); b.putInt(height)
      b.array() // remaining reserved dwords stay zero
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(fourcc("vids")); b.putInt(fourcc("MJPG"))
      b.putInt(0); b.putInt(0); b.putInt(0)
      b.putInt(1); b.putInt(math.max(1, fps)) // dwScale, dwRate
      b.putInt(0); b.putInt(frames.size) // dwStart, dwLength
      b.array()
    }
    val strf = { // BITMAPINFOHEADER
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40); b.putInt(width); b.putInt(height)
      b.putShort(1); b.putShort(24)
      b.putInt(fourcc("MJPG")); b.putInt(width * height * 3)
      b.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val payload = hdrl ++ movi
    val out = ByteBuffer.allocate(12 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(fourcc("RIFF")); out.putInt(4 + payload.length)
    out.putInt(fourcc("AVI ")); out.put(payload)
    out.array()
  }

  /** Extract every frame's bytes from an MJPEG-AVI, in stream order.
    * Throws (with a structural reason) on anything that is not a
    * well-formed AVI carrying JPEG frames — the Multimodal refusal rule:
    * undecodable media is an error, never silently-fake features.
    */
  def frames(bytes: Array[Byte]): Vector[Array[Byte]] = {
    require(bytes.length >= 12, s"not an AVI: ${bytes.length} bytes")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(b.getInt(0) == fourcc("RIFF") && b.getInt(8) == fourcc("AVI "),
      "not an AVI: missing RIFF/'AVI ' signature")
    val out = Vector.newBuilder[Array[Byte]]
    // walk [start, end) as a chunk sequence; recurse into LISTs (movi may
    // nest frames inside 'rec ' groups)
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val cc = b.getInt(off)
        val size = b.getInt(off + 4)
        require(size >= 0 && off + 8 + size <= end,
          s"truncated AVI: chunk at $off claims $size bytes past the container")
        if (cc == fourcc("LIST")) walk(off + 12, off + 8 + size)
        else {
          // frame chunks: '##dc' (compressed) / '##db' (uncompressed-kept)
          val c2 = (cc >>> 16) & 0xff; val c3 = (cc >>> 24) & 0xff
          if ((c2 == 'd' && (c3 == 'c' || c3 == 'b'))) {
            val f = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
            require(f.length >= 2 && (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8,
              s"AVI frame chunk at $off is not a JPEG — only MJPEG is " +
                "JDK-decodable; other video codecs need a real codec behind " +
                "the Decoder seam")
            out += f
          }
        }
        off += 8 + size + (size & 1)
      }
    }
    walk(12, bytes.length)
    val fs = out.result()
    require(fs.nonEmpty, "AVI contains no video frame chunks")
    fs
  }

  /** Evenly-spaced sample of `n` frame indices over `total` (the classic
    * floor(i·total/n) lattice — deterministic, includes frame 0, never
    * repeats while total ≥ n).
    */
  def sampleIndices(total: Int, n: Int): Seq[Int] = {
    val m = math.min(math.max(1, n), total)
    (0 until m).map(i => (i.toLong * total / m).toInt)
  }
}
