package graft.multimodal

/** Video kernel: a REAL RIFF/AVI container parser — closing the
  * modality triple alongside [[ImageCore]] (ImageIO) and [[AudioCore]]
  * (WAVE). Container facts (dims, frame rate, frame count) come from
  * the public AVI spec (RIFF 'AVI ' → LIST hdrl → avih + LIST strl →
  * strh/strf; frames in LIST movi as '..db'/'..dc' chunks); per-frame
  * pixel statistics run through the SAME [[ImageCore.stats]] kernel the
  * image family uses — one set of signature semantics (channel means +
  * 64-bit aHash into the Hamming near-dup screen) across stills and
  * frames.
  *
  * Two codecs decode, both dependency-free:
  *   - uncompressed 24-bpp DIB ('..db' chunks, strf declares
  *     biCompression == BI_RGB and biBitCount == 24 — anything else,
  *     16/32-bpp or RLE, would read as garbage pixel stats, so it
  *     honestly degrades to None instead);
  *   - MJPEG ('..dc' chunks where strf/strh declare the 'MJPG' fourcc):
  *     every frame is a standalone JPEG, which the JDK's ImageIO — the
  *     exact kernel stills go through — already decodes.
  * Anything else (H.264, VP9, ...) needs codec libraries absent from
  * this environment and degrades to None like every other undecodable
  * blob (quarantine relationally downstream, never kill the task).
  *
  * DIB frame layout (public BMP/DIB spec): bottom-up rows of BGR
  * triples, each row padded to a 4-byte boundary.
  */
object VideoCore {

  /** BI_RGB 24-bpp declared by strf. */
  val CodecRgb24 = "rgb24"
  /** Motion-JPEG: frames decode through ImageIO. */
  val CodecMjpeg = "mjpeg"
  /** No parseable video strf — nothing safe to decode. */
  val CodecNone = "none"

  final case class AviInfo(
      width: Int, height: Int, usPerFrame: Int, nFrames: Int,
      /** decodable codec ([[CodecRgb24]]/[[CodecMjpeg]]), or the
        * declared fourcc/bpp for streams we refuse to guess at */
      codec: String,
      /** frame chunks present that are decodable under `codec` */
      nRawFrames: Int,
      /** [[ImageCore.stats]] of the first decodable frame, if any */
      firstFrame: Option[ImageCore.Stats])

  private val MjpgFourcc = 0x47504A4D // 'MJPG' little-endian

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
    var inVideoStream = false                     // last strh was 'vids'
    var videoHandler = ""                         // strh fccHandler
    var videoFmt: Option[(Int, Int)] = None       // biBitCount, biCompression
    var strhSeen = -1                             // strh ordinal = stream index
    var videoStreamIdx = -1                       // index of the latched stream
    var dbChunks = List.empty[(Int, Int, Int)]    // (stream, offset, length)
    var dcChunks = List.empty[(Int, Int, Int)]
    // movi chunk ids are 'NNdb'/'NNdc' with NN the 2-digit stream index
    def streamOf(id: String): Int =
      id.substring(0, 2).toIntOption.getOrElse(-1)

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
          case "strh" if len >= 8 =>
            // Latch handler + strf TOGETHER for the first video stream
            // only: once a vids strf landed, later 'vids' strh chunks
            // (a second video stream) must not flip the handler — a
            // later MJPG stream would otherwise decode the FIRST
            // stream's format as mjpeg (or vice versa).
            strhSeen += 1
            inVideoStream = tag(body) == "vids" && videoFmt.isEmpty
            if (inVideoStream) {
              videoHandler = tag(body + 4)
              videoStreamIdx = strhSeen
            }
          case "strf" if inVideoStream && len >= 20 && videoFmt.isEmpty =>
            // BITMAPINFOHEADER: biBitCount at +14, biCompression at +16
            videoFmt = Some((u16(body + 14), u32(body + 16).toInt))
          case _ if id.length == 4 && id.endsWith("db") =>
            dbChunks = (streamOf(id), body, len) :: dbChunks
          case _ if id.length == 4 && id.endsWith("dc") =>
            dcChunks = (streamOf(id), body, len) :: dcChunks
          case _ => ()
        }
        off = body + len + (len & 1) // word alignment
      }
      true
    }
    if (!walk(12, bytes.length)) return None

    avih.collect { case (us, frames, w, h) if w > 0 && h > 0 =>
      val isMjpeg = videoHandler.equalsIgnoreCase("MJPG") ||
        videoFmt.exists(_._2 == MjpgFourcc)
      val codec = videoFmt match {
        case _ if isMjpeg => CodecMjpeg
        case Some((24, 0)) => CodecRgb24
        case Some((bpp, comp)) => s"bpp$bpp/comp$comp" // declared, undecodable
        case None => CodecNone
      }
      // only the latched stream's chunks: another stream's frames would
      // be decoded under the wrong codec/format
      def mine(cs: List[(Int, Int, Int)]) =
        cs.reverse.collect { case (s, o, l) if s == videoStreamIdx => (o, l) }
      val raws = codec match {
        case CodecRgb24 => mine(dbChunks)
        case CodecMjpeg => mine(dcChunks)
        case _ => Nil
      }
      val first = raws.headOption.flatMap { case (o, l) =>
        codec match {
          case CodecRgb24 =>
            dibPixels(bytes, o, l, w, h).map(ImageCore.stats(w, h, _))
          case CodecMjpeg =>
            ImageCore.decodeImage(java.util.Arrays.copyOfRange(bytes, o, o + l))
          case _ => None
        }
      }
      AviInfo(w, h, us, frames, codec, raws.length, first)
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
