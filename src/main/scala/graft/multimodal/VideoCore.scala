package graft.multimodal

/** Video kernel: a REAL RIFF/AVI container parser for uncompressed
  * (DIB/BGR24) frames — closing the modality triple alongside
  * [[ImageCore]] (ImageIO) and [[AudioCore]] (WAVE): container facts
  * (dims, frame rate, frame count) come from the public AVI spec
  * (RIFF 'AVI ' → LIST hdrl → avih; frames in LIST movi as '..db'
  * chunks), and per-frame pixel statistics run through the SAME
  * [[ImageCore.stats]] kernel the image family uses — one set of
  * signature semantics (channel means + 64-bit aHash into the Hamming
  * near-dup screen) across stills and frames.
  *
  * Scope is honest: uncompressed '..db' frames only — the layout a
  * pipeline's own exports/fixtures produce. Compressed codecs ('..dc',
  * MJPG, H.264...) are not decodable without codec libraries absent
  * from this environment; such files degrade to None like every other
  * undecodable blob (quarantine relationally downstream, never kill
  * the task).
  *
  * DIB frame layout (public BMP/DIB spec): bottom-up rows of BGR
  * triples, each row padded to a 4-byte boundary.
  */
object VideoCore {

  final case class AviInfo(
      width: Int, height: Int, usPerFrame: Int, nFrames: Int,
      /** frames actually present as uncompressed '..db' chunks */
      nRawFrames: Int,
      /** [[ImageCore.stats]] of the first raw frame, if any */
      firstFrame: Option[ImageCore.Stats])

  /** Decode an AVI blob. None when the container is malformed or
    * carries no parseable header. */
  def decodeAvi(bytes: Array[Byte]): Option[AviInfo] = {
    def u16(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int) = (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
      ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ")
      return None

    var avih: Option[(Int, Int, Int, Int)] = None // usPerFrame, frames, w, h
    var rawFrames = List.empty[(Int, Int)]        // (offset, length)

    // walk chunks; LIST bodies (after their 4-byte type) are chunk lists
    def walk(start: Int, end: Int): Boolean = {
      var off = start
      while (off + 8 <= end) {
        val id = tag(off)
        val len = u32(off + 4).toInt
        val body = off + 8
        if (len < 0 || body + len > end) return false
        id match {
          case "LIST" =>
            if (len >= 4 && !walk(body + 4, body + len)) return false
          case "avih" if len >= 40 =>
            avih = Some((u32(body).toInt, u32(body + 16).toInt,
              u32(body + 32).toInt, u32(body + 36).toInt))
          case _ if id.length == 4 && id.endsWith("db") =>
            rawFrames = (body, len) :: rawFrames
          case _ => ()
        }
        off = body + len + (len & 1) // word alignment
      }
      true
    }
    if (!walk(12, bytes.length)) return None

    avih.collect { case (us, frames, w, h) if w > 0 && h > 0 =>
      val raws = rawFrames.reverse
      val first = raws.headOption.flatMap { case (o, l) =>
        dibPixels(bytes, o, l, w, h).map(ImageCore.stats(w, h, _))
      }
      AviInfo(w, h, us, frames, raws.length, first)
    }
  }

  /** Bottom-up padded BGR rows → row-major 0xRRGGBB, the image
    * kernel's pixel convention. None when the chunk is too short. */
  private def dibPixels(bytes: Array[Byte], off: Int, len: Int,
      w: Int, h: Int): Option[Array[Int]] = {
    val stride = ((3 * w + 3) / 4) * 4
    if (len < stride * h) return None
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val row = off + (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        val b = bytes(row + 3 * x) & 0xFF
        val g = bytes(row + 3 * x + 1) & 0xFF
        val r = bytes(row + 3 * x + 2) & 0xFF
        px(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    Some(px)
  }
}
