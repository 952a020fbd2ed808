package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.BinaryQuantize

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic pixels: packed 0xRRGGBB from a simple LCG-ish mix. */
  private def pixels(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val v = (seed * 2654435761L + i * 40503L) & 0xFFFFFF
      v.toInt
    }

  private def png(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", out))
    out.toByteArray
  }

  test("PNG round-trip: ImageIO decode reproduces the raw-pixel stats") {
    // PNG is lossless, so the decode must land on EXACTLY the stats of
    // the pixels that went in — same kernel, byte-identical values
    for ((w, h, seed) <- Seq((8, 8, 1), (16, 8, 2), (40, 24, 3), (7, 5, 4))) {
      val px = pixels(w, h, seed)
      val expected = ImageCore.stats(w, h, px)
      val decoded = ImageCore.decodeImage(png(w, h, px))
      assert(decoded.contains(expected), s"${w}x$h seed=$seed")
    }
  }

  test("image_stats expression: decode in a projection, null on junk") {
    val px = pixels(16, 16, 7)
    val rows = Seq(
      (1L, png(16, 16, px)),
      (2L, Array[Byte](1, 2, 3, 4)),             // not an image
      (3L, null.asInstanceOf[Array[Byte]]))      // null payload
      .toDF("id", "payload")
    val out = rows.select(col("id"),
        MultimodalOps.imageStats(col("payload")).as("s"))
      .select(col("id"), col("s.width"), col("s.height"), col("s.mean_r"),
        col("s.ahash"), col("s").isNull.as("failed"))
      .orderBy("id").collect()
    val expected = ImageCore.stats(16, 16, px)
    assert(out(0).getInt(1) == 16 && out(0).getInt(2) == 16)
    assert(out(0).getDouble(3) == expected.meanR)
    assert(out(0).getLong(4) == expected.ahash64)
    assert(out(1).getBoolean(5) && out(2).getBoolean(5)) // junk+null -> NULL
  }

  test("rgb_frame_stats matches the kernel and is ASCII-codepoint exact") {
    // 8x8 frame needs 192 chars; channel value = codepoint % 256
    val text = (0 until 192).map(i => (' ' + (i * 7) % 95).toChar).mkString
    val cps = text.map(_.toInt).toArray
    val px = Array.tabulate(64)(i =>
      ((cps(3 * i) & 0xFF) << 16) | ((cps(3 * i + 1) & 0xFF) << 8) |
        (cps(3 * i + 2) & 0xFF))
    val expected = ImageCore.stats(8, 8, px)
    val row = Seq(Tuple1(text)).toDF("text")
      .select(MultimodalOps.rgbFrameStats(col("text"), 8, 8).as("s"))
      .select("s.width", "s.mean_r", "s.mean_g", "s.mean_b",
        "s.ahash_lo", "s.ahash_hi").collect().head
    assert(row.getInt(0) == 8)
    assert(row.getDouble(1) == expected.meanR)
    assert(row.getDouble(2) == expected.meanG)
    assert(row.getDouble(3) == expected.meanB)
    assert(row.getLong(4) == expected.ahashLo)
    assert(row.getLong(5) == expected.ahashHi)
    // short input -> NULL, not a throw
    val short = Seq(Tuple1("abc")).toDF("text")
      .select(MultimodalOps.rgbFrameStats(col("text"), 8, 8).as("s"))
      .collect().head
    assert(short.isNullAt(0))
  }

  test("split aHash recombines to the packed one (lo/hi non-negative)") {
    val s = ImageCore.stats(8, 8, pixels(8, 8, 11))
    assert(s.ahashLo >= 0 && s.ahashLo < (1L << 32))
    assert(s.ahashHi >= 0 && s.ahashHi < (1L << 32))
    assert((s.ahashLo | (s.ahashHi << 32)) == s.ahash64)
  }

  test("aHash feeds the Hamming screen: perturbation ~ distance") {
    val base = pixels(64, 64, 21)
    // brightness-preserving tweak of a few pixels: tiny Hamming movement
    val near = base.clone()
    for (i <- 0 until 16) near(i) = base(i) ^ 0x010101
    // photometric negative: the grid flips nearly everywhere
    val far = base.map(p => ~p & 0xFFFFFF)
    val h0 = ImageCore.stats(64, 64, base).ahash64
    val hNear = ImageCore.stats(64, 64, near).ahash64
    val hFar = ImageCore.stats(64, 64, far).ahash64
    val rows = Seq(("near", hNear), ("far", hFar)).toDF("which", "sig")
    val d = rows.select(col("which"),
        BinaryQuantize.hamming(lit(h0), col("sig")).as("d"))
      .as[(String, Long)].collect().toMap
    assert(d("near") <= 8, s"near image drifted: ${d("near")}")
    assert(d("far") >= 48, s"negative not far: ${d("far")}")
  }

  test("equal-cell aHash uses the integer rule the SQL oracle replays") {
    // construct a frame where a cell's gray mean EQUALS the global mean:
    // strict > means the bit must be 0 (ties excluded on both engines)
    val px = Array.fill(64)(0x101010) // all equal -> every 64*s_j == total
    val s = ImageCore.stats(8, 8, px)
    assert(s.ahashLo == 0L && s.ahashHi == 0L)
  }

  // ------------------------------------------------------------- audio

  /** Hand-built canonical 44-byte-header PCM16 mono WAV. */
  private def wav16(samples: Array[Int], rate: Int = 8000,
      channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  test("WAV decode recovers format facts and the exact PCM kernel stats") {
    val samples = Array(1000, -1000, 2000, -2000, 0, 3000, -32768, 32767)
    val info = AudioCore.decodeWav(wav16(samples, rate = 16000)).get
    assert(info.channels === 1 && info.sampleRate === 16000 &&
      info.bitsPerSample === 16)
    assert(info.nFrames === 8L && info.durationMs === 0.5)
    assert(info.stats === AudioCore.pcmStats(samples))
    // strict sign changes: 1000→-1000→2000→-2000 (3), the 0 breaks the
    // -2000→0→3000 run (no crossing), then 3000→-32768→32767 (2 more)
    assert(info.stats.zeroCrossings === 5L)
  }

  test("stereo frames divide samples by channel count; junk/truncated -> None") {
    val st = AudioCore.decodeWav(
      wav16(Array(1, 2, 3, 4, 5, 6), channels = 2)).get
    assert(st.channels === 2 && st.nFrames === 3L)
    // stats are de-interleaved channel 0 (1, 3, 5) — NOT the raw
    // interleaved stream, whose cross-channel sign flips would corrupt
    // zero_crossings and whose mixed channels would corrupt rms
    assert(st.stats === AudioCore.pcmStats(Array(1, 3, 5)))
    val loud = AudioCore.decodeWav(
      wav16(Array(1000, -9999, -1000, -9999, 1000, -9999), channels = 2)).get
    // channel 0 = (1000, -1000, 1000): 2 true crossings; the interleaved
    // stream would have counted 5
    assert(loud.stats.zeroCrossings === 2L)
    assert(loud.stats.rms === 1000.0)
    assert(AudioCore.decodeWav("not a wav at all".getBytes).isEmpty)
    val truncated = wav16(Array(1, 2, 3, 4)).dropRight(3)
    assert(AudioCore.decodeWav(truncated).isEmpty)
  }

  test("audio_stats expression decodes blobs columnar; synthetic twin matches kernel") {
    val good = wav16(Array(100, -100, 200))
    val rows = Seq(("ok", good), ("bad", Array[Byte](1, 2, 3)))
      .toDF("tag", "blob")
      .select(col("tag"), AudioExpr.audio_stats(col("blob")).as("a"))
      .select(col("tag"), col("a.n_samples"), col("a.zero_crossings"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    assert(rows("ok").contains((3L, 2L)))
    assert(rows("bad").isEmpty)
    // synthetic twin: expression == driver-side kernel on the same text
    val txt = "hello audio world, enough codepoints here."
    val viaExpr = Seq(txt).toDF("t")
      .select(AudioExpr.pcm_frame_stats(col("t"), 16).as("a"))
      .select("a.rms", "a.zero_crossings")
      .as[(Double, Long)].head()
    val direct = AudioCore.statsFromText(txt, 16).get
    assert(viaExpr === ((direct.rms, direct.zeroCrossings)))
  }

  // ------------------------------------------------------------- video

  /** Hand-built AVI: RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh,
    * strf}} + LIST(movi){frame chunks}. strh/strf declare the codec the
    * way real muxers do — biBitCount/biCompression for DIB, the 'MJPG'
    * fourcc for Motion-JPEG. */
  private def aviContainer(w: Int, h: Int, usPerFrame: Int, nFrames: Int,
      frameChunks: Seq[(String, Array[Byte])], bitCount: Int,
      compression: Int, handler: String): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
        .putInt(nFrames).putInt(0).putInt(1).putInt(0)
        .putInt(w).putInt(h) // remaining 16 bytes stay zero
      bb.array()
    }
    val strh = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("US-ASCII"))
        .put(handler.getBytes("US-ASCII")) // fccHandler; rest zero
      bb.array()
    }
    val strf = { // BITMAPINFOHEADER
      val bb = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w).putInt(h).putShort(1)
        .putShort(bitCount.toShort).putInt(compression)
      bb.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++
        chunk("strf", strf)))
    val movi = list("movi",
      frameChunks.toArray.flatMap { case (id, body) => chunk(id, body) })
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    bb.array()
  }

  private def dib(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val stride = ((3 * w + 3) / 4) * 4
    val out = new Array[Byte](stride * h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = px(y * w + x)
      val row = (h - 1 - y) * stride // bottom-up
      out(row + 3 * x) = (p & 0xFF).toByte          // B
      out(row + 3 * x + 1) = ((p >> 8) & 0xFF).toByte  // G
      out(row + 3 * x + 2) = ((p >> 16) & 0xFF).toByte // R
    }
    out
  }

  /** Uncompressed 24-bpp DIB AVI — the original fixture shape. */
  private def avi(w: Int, h: Int, usPerFrame: Int,
      frames: Seq[Array[Int]]): Array[Byte] =
    aviContainer(w, h, usPerFrame, frames.length,
      frames.map(f => ("00db", dib(f, w, h))),
      bitCount = 24, compression = 0, handler = "DIB ")

  test("AVI decode: container facts + first frame through the IMAGE kernel") {
    val f0 = Array.tabulate(64)(i => (i * 3 << 16) | (i * 2 << 8) | i)
    val f1 = f0.map(_ ^ 0xFFFFFF)
    val info = VideoCore.decodeAvi(avi(8, 8, 40000, Seq(f0, f1))).get
    assert(info.width === 8 && info.height === 8)
    assert(info.usPerFrame === 40000 && info.nFrames === 2)
    assert(info.codec === VideoCore.CodecRgb24)
    assert(info.nRawFrames === 2)
    // the first frame's stats are EXACTLY the image kernel's on f0 —
    // one signature semantics across stills and video frames
    assert(info.firstFrame.get === ImageCore.stats(8, 8, f0))
  }

  test("AVI: junk, non-AVI RIFF, and truncated frames degrade safely") {
    assert(VideoCore.decodeAvi("garbage".getBytes).isEmpty)
    // a valid WAV is RIFF but not AVI
    assert(VideoCore.decodeAvi(wav16(Array(1, 2, 3))).isEmpty)
    // truncated frame chunk: container parses, frame does not
    val good = avi(8, 8, 40000, Seq(Array.fill(64)(0x102030)))
    val cut = good.dropRight(60)
    val info = VideoCore.decodeAvi(cut)
    assert(info.isEmpty || info.get.firstFrame.isEmpty)
  }

  test("odd widths honor the 4-byte DIB row padding") {
    val w = 5; val h = 2
    val px = Array.tabulate(w * h)(i => i * 0x010101)
    val info = VideoCore.decodeAvi(avi(w, h, 1000, Seq(px))).get
    assert(info.firstFrame.get === ImageCore.stats(w, h, px))
  }

  test("MJPEG frames decode through the SAME ImageIO kernel as stills") {
    val w = 16; val h = 16
    def jpeg(px: Array[Int]): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, w, h, px, 0, w)
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "jpg", out))
      out.toByteArray
    }
    val j0 = jpeg(pixels(w, h, 31))
    val j1 = jpeg(pixels(w, h, 32))
    val blob = aviContainer(w, h, 33367, 2,
      Seq(("00dc", j0), ("00dc", j1)),
      bitCount = 24, compression = 0x47504A4D, handler = "MJPG")
    val info = VideoCore.decodeAvi(blob).get
    assert(info.codec === VideoCore.CodecMjpeg)
    assert(info.nFrames === 2 && info.nRawFrames === 2)
    // the frame's stats are EXACTLY what the still-image path yields on
    // the same JPEG bytes — one signature semantics across modalities
    assert(info.firstFrame === ImageCore.decodeImage(j0))
    assert(info.firstFrame.isDefined)
    // fourcc in the handler alone (strf says BI_RGB-style zero) is
    // enough: some muxers only set one of the two
    val handlerOnly = aviContainer(w, h, 33367, 1, Seq(("00dc", j0)),
      bitCount = 24, compression = 0, handler = "mjpg")
    assert(VideoCore.decodeAvi(handlerOnly).get.codec === VideoCore.CodecMjpeg)
  }

  test("16/32-bpp or compressed strf refuses DIB decode instead of garbage") {
    val w = 8; val h = 8
    val px = Array.fill(w * h)(0x102030)
    // declared 32-bpp: a 24-bpp-stride length check alone would have
    // "decoded" the chunk into garbage stats — the strf gate refuses
    val wrongBpp = aviContainer(w, h, 1000, 1,
      Seq(("00db", dib(px, w, h) ++ new Array[Byte](64))),
      bitCount = 32, compression = 0, handler = "DIB ")
    val info = VideoCore.decodeAvi(wrongBpp).get
    assert(info.codec === "bpp32/comp0")
    assert(info.nRawFrames === 0 && info.firstFrame.isEmpty)
    // no strl/strf at all (stripped header): nothing declares the pixel
    // format, so nothing is safe to decode
    val noStrf = {
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer
          .allocate(8 + body.length + (body.length & 1))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
        bb.array()
      }
      val avih = {
        val bb = java.nio.ByteBuffer.allocate(56)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(1000).putInt(0).putInt(0).putInt(0).putInt(1)
          .putInt(0).putInt(1).putInt(0).putInt(w).putInt(h)
        bb.array()
      }
      val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++
        chunk("avih", avih))
      val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
        chunk("00db", dib(px, w, h)))
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    val stripped = VideoCore.decodeAvi(noStrf).get
    assert(stripped.codec === VideoCore.CodecNone)
    assert(stripped.nRawFrames === 0 && stripped.firstFrame.isEmpty)
  }

  test("two video streams: handler+strf latch together; other stream's chunks skipped") {
    val w = 8; val h = 8
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    def strh(handler: String): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("US-ASCII")).put(handler.getBytes("US-ASCII"))
      bb.array()
    }
    def strf(bitCount: Int, compression: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w).putInt(h).putShort(1)
        .putShort(bitCount.toShort).putInt(compression)
      bb.array()
    }
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1000).putInt(0).putInt(0).putInt(0).putInt(1)
        .putInt(0).putInt(2).putInt(0).putInt(w).putInt(h)
      bb.array()
    }
    val px = Array.tabulate(w * h)(i => i * 0x010101)
    // stream 0: uncompressed DIB; stream 1: MJPG whose '01dc' chunk is
    // NOT a JPEG — decoding it under either codec would be garbage
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh("DIB ")) ++ chunk("strf", strf(24, 0))) ++
      list("strl", chunk("strh", strh("MJPG")) ++
        chunk("strf", strf(24, 0x47504A4D))))
    val movi = list("movi",
      chunk("00db", dib(px, w, h)) ++ chunk("01dc", Array.fill(32)(0x55.toByte)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    val info = VideoCore.decodeAvi(bb.array()).get
    // the FIRST video stream's handler+format stick: rgb24, not mjpeg
    assert(info.codec === VideoCore.CodecRgb24)
    // only stream 0's frame chunk counts and decodes
    assert(info.nRawFrames === 1)
    assert(info.firstFrame.get === ImageCore.stats(w, h, px))
  }

  test("resizeNearest is pixel-exact integer index arithmetic") {
    // 4x4 -> 2x2: dst(x,y) <- src(x*4/2, y*4/2) = src(2x, 2y)
    val px = (0 until 16).toArray
    val out = ImageCore.resizeNearest(4, 4, px, 2, 2)
    assert(out.toSeq === Seq(0, 2, 8, 10))
    // 3x3 -> 2x2: src indices floor(x*3/2) in {0, 1} -> px(0,1,3,4)
    val out2 = ImageCore.resizeNearest(3, 3, (0 until 9).toArray, 2, 2)
    assert(out2.toSeq === Seq(0, 1, 3, 4))
    // identity when dims match
    assert(ImageCore.resizeNearest(4, 4, px, 4, 4).toSeq === px.toSeq)
  }

  test("fitBox preserves aspect, never upscales, never collapses to 0") {
    assert(ImageCore.fitBox(100, 50, 64, 64) === ((64, 32)))
    assert(ImageCore.fitBox(50, 100, 64, 64) === ((32, 64)))
    assert(ImageCore.fitBox(10, 10, 64, 64) === ((10, 10))) // no upscale
    assert(ImageCore.fitBox(1000, 3, 10, 10) === ((10, 1))) // clamp >= 1
  }

  test("resizeImage round-trips: decoded thumbnail has the fitted dims and NN pixels") {
    val (w, h) = (16, 8)
    val px = pixels(w, h, 7)
    val bytes = png(w, h, px)
    val Some(thumb) = ImageCore.resizeImage(bytes, 8, 8)
    val Some(st) = ImageCore.decodeImage(thumb)
    assert(st.width === 8 && st.height === 4) // aspect fit of 16x8 in 8x8
    // PNG is lossless: the thumbnail's stats equal the NN kernel's
    val expect = ImageCore.stats(8, 4, ImageCore.resizeNearest(w, h, px, 8, 4))
    assert(st === expect)
    // garbage bytes degrade to None
    assert(ImageCore.resizeImage("not an image".getBytes, 8, 8).isEmpty)
  }

  test("image_resize expression transforms payloads in a pure projection") {
    val (w, h) = (12, 12)
    val good = png(w, h, pixels(w, h, 3))
    val rows = Seq((1L, good), (2L, "junk".getBytes)).toDF("id", "payload")
    val out = rows
      .withColumn("thumb", graft.multimodal.ImageExpr.image_resize(
        org.apache.spark.sql.functions.col("payload"), 6, 6))
      .withColumn("st", graft.multimodal.ImageExpr.image_stats(
        org.apache.spark.sql.functions.col("thumb")))
      .select("id", "st.width", "st.height")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_ => (r.getInt(1), r.getInt(2)))).toMap
    assert(out(1L) === Some((6, 6)))
    assert(out(2L) === None)
  }

  test("cropCenter is exact: centered offsets, clamping, pixel identity") {
    // 4x4 -> 2x2: offsets (1,1) -> px(5,6,9,10)
    val px = (0 until 16).toArray
    val (dw, dh, out) = ImageCore.cropCenter(4, 4, px, 2, 2)
    assert((dw, dh) === ((2, 2)) && out.toSeq === Seq(5, 6, 9, 10))
    // crop box larger than the image clamps to the image
    val (cw2, ch2, out2) = ImageCore.cropCenter(2, 2, Array(1, 2, 3, 4), 10, 10)
    assert((cw2, ch2) === ((2, 2)) && out2.toSeq === Seq(1, 2, 3, 4))
    // odd remainder floors the offset: 5 wide -> crop 2 starts at 1
    val (cw3, _, out3) = ImageCore.cropCenter(5, 1, (0 until 5).toArray, 2, 1)
    assert(cw3 === 2 && out3.toSeq === Seq(1, 2))
  }

  test("cropImage round-trips losslessly through PNG") {
    val (w, h) = (10, 6)
    val px = pixels(w, h, 13)
    val Some(cropped) = ImageCore.cropImage(png(w, h, px), 4, 4)
    val Some(st) = ImageCore.decodeImage(cropped)
    val (dw, dh, expectPx) = ImageCore.cropCenter(w, h, px, 4, 4)
    assert(st === ImageCore.stats(dw, dh, expectPx))
    assert(ImageCore.cropImage("garbage".getBytes, 4, 4).isEmpty)
  }
}
