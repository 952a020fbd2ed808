package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import scala.util.control.NonFatal

/** Executor-side image statistics kernel — plain JVM math shared by the
  * raw-RGB-frame expression (oracle-replayable) and the real
  * `javax.imageio` decode (JDK-only: PNG/JPEG/BMP/GIF/WBMP), so the one
  * code path the DuckDB oracle gates is the same code path decoded
  * images flow through.
  *
  * Per image: width/height, per-channel means, and a 64-bit average
  * hash (aHash): gray the image, average-pool to an 8×8 grid, set bit
  * j (row-major) iff cell j's gray mean exceeds the global mean of the
  * 64 cell means. When width and height are multiples of 8 every cell
  * has equal pixel count and the comparison is evaluated with INTEGER
  * arithmetic — bit j iff `64·graySum_j > totalGraySum` (gray = r+g+b,
  * undivided) — which is the exact rule a SQL oracle can replay with
  * BIGINT math, no float rounding anywhere. The hash is exposed split
  * (lo = bits 0..31, hi = bits 32..63, both non-negative) so oracles
  * never need a 64-bit shift, plus packed for
  * [[graft.similarity.BinaryQuantize.hamming]] screens.
  */
object ImageCore {

  /** Pixel stats: channel means over all pixels, aHash split lo/hi. */
  final case class Stats(width: Int, height: Int, meanR: Double,
      meanG: Double, meanB: Double, ahashLo: Long, ahashHi: Long) {
    /** Packed 64-bit aHash (bit 63 may set the sign — Hamming via
      * xor/bit_count is sign-agnostic). */
    def ahash64: Long = ahashLo | (ahashHi << 32)
  }

  /** Stats from packed 0xRRGGBB pixels, row-major. Upper bits (alpha in
    * ARGB) are ignored, so BufferedImage.getRGB output feeds directly. */
  def stats(w: Int, h: Int, px: Array[Int]): Stats = {
    require(w > 0 && h > 0 && px.length == w * h,
      s"expected $w*$h=${w * h} pixels, got ${px.length}")
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < px.length) {
      val p = px(i)
      sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
      i += 1
    }
    val n = (w.toLong * h).toDouble
    val (lo, hi) = ahashBits(w, h, px)
    Stats(w, h, sr / n, sg / n, sb / n, lo, hi)
  }

  private def ahashBits(w: Int, h: Int, px: Array[Int]): (Long, Long) = {
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h // always < 8; images under 8px leave empty cells
      var x = 0
      while (x < w) {
        val cx = x * 8 / w
        val p = px(y * w + x)
        val j = cy * 8 + cx
        sums(j) += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
        counts(j) += 1
        x += 1
      }
      y += 1
    }
    var lo = 0L; var hi = 0L
    def set(j: Int): Unit =
      if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
    if (w % 8 == 0 && h % 8 == 0) {
      // equal-sized cells: the integer-exact rule the SQL oracle replays
      var total = 0L; var j = 0
      while (j < 64) { total += sums(j); j += 1 }
      j = 0
      while (j < 64) { if (64L * sums(j) > total) set(j); j += 1 }
    } else {
      // ragged cells (empty ones on sub-8px images read as mean 0):
      // cell means are rationals with unequal denominators — double
      // math, fine because this branch is spec-gated, never
      // oracle-compared
      var j = 0; var m = 0.0
      val means = new Array[Double](64)
      while (j < 64) {
        means(j) = if (counts(j) == 0) 0.0 else sums(j).toDouble / counts(j)
        m += means(j); j += 1
      }
      m /= 64.0
      j = 0
      while (j < 64) { if (means(j) > m) set(j); j += 1 }
    }
    (lo, hi)
  }

  /** Stats over a synthetic frame read from text: the first `w*h*3`
    * codepoints (mod 256) are the R,G,B channels of `w*h` row-major
    * pixels. None when the text is too short. This is the
    * oracle-replayable entry: DuckDB computes the identical values with
    * `ord(substr(...)) % 256` + BIGINT aggregation. */
  def statsFromText(s: String, w: Int, h: Int): Option[Stats] = {
    val need = w * h * 3
    val cps = s.codePoints().limit(need).toArray
    if (cps.length < need) None
    else {
      val px = new Array[Int](w * h)
      var i = 0
      while (i < px.length) {
        px(i) = ((cps(3 * i) & 0xFF) << 16) |
          ((cps(3 * i + 1) & 0xFF) << 8) | (cps(3 * i + 2) & 0xFF)
        i += 1
      }
      Some(stats(w, h, px))
    }
  }

  /** Text frame → NN thumbnail → stats: the resize kernel's
    * oracle-replayable path (same pixel synthesis as [[statsFromText]],
    * same [[resizeNearest]] index arithmetic a SQL oracle replays). */
  def thumbStatsFromText(s: String, w: Int, h: Int, dw: Int,
      dh: Int): Option[Stats] = {
    val need = w * h * 3
    val cps = s.codePoints().limit(need).toArray
    if (cps.length < need) None
    else {
      val px = new Array[Int](w * h)
      var i = 0
      while (i < px.length) {
        px(i) = ((cps(3 * i) & 0xFF) << 16) |
          ((cps(3 * i + 1) & 0xFF) << 8) | (cps(3 * i + 2) & 0xFF)
        i += 1
      }
      Some(stats(dw, dh, resizeNearest(w, h, px, dw, dh)))
    }
  }

  /** Center-crop of packed 0xRRGGBB pixels to (cw, ch), clamped to the
    * source dims; offsets are floor((src-dst)/2) — the standard vision
    * preprocessing companion to [[resizeNearest]], same integer-exact
    * contract. */
  def cropCenter(w: Int, h: Int, px: Array[Int], cw: Int,
      ch: Int): (Int, Int, Array[Int]) = {
    require(w > 0 && h > 0 && cw > 0 && ch > 0 && px.length == w * h,
      s"bad crop ${w}x$h -> ${cw}x$ch over ${px.length} px")
    val dw = math.min(cw, w)
    val dh = math.min(ch, h)
    val ox = (w - dw) / 2
    val oy = (h - dh) / 2
    val out = new Array[Int](dw * dh)
    var y = 0
    while (y < dh) {
      System.arraycopy(px, (oy + y) * w + ox, out, y * dw, dw)
      y += 1
    }
    (dw, dh, out)
  }

  /** Text frame → center-crop → stats: the crop kernel's
    * oracle-replayable path (same pixel synthesis as [[statsFromText]],
    * same [[cropCenter]] offset arithmetic a SQL oracle replays). */
  def cropStatsFromText(s: String, w: Int, h: Int, cw: Int,
      ch: Int): Option[Stats] = {
    val need = w * h * 3
    val cps = s.codePoints().limit(need).toArray
    if (cps.length < need) None
    else {
      val px = new Array[Int](w * h)
      var i = 0
      while (i < px.length) {
        px(i) = ((cps(3 * i) & 0xFF) << 16) |
          ((cps(3 * i + 1) & 0xFF) << 8) | (cps(3 * i + 2) & 0xFF)
        i += 1
      }
      val (dw, dh, cropped) = cropCenter(w, h, px, cw, ch)
      Some(stats(dw, dh, cropped))
    }
  }

  /** Nearest-neighbour downsample of packed 0xRRGGBB pixels — pure
    * integer index arithmetic (src = (x·sw) div dw, (y·sh) div dh), so
    * the result is deterministic across JVMs and replayable by integer
    * SQL. NN, not bilinear, on purpose: the downstream consumers (aHash
    * screens, channel stats, thumbnail export) need determinism more
    * than smoothing, and bilinear's float blends would break the
    * engine-exact contract the rest of this kernel keeps. */
  def resizeNearest(w: Int, h: Int, px: Array[Int], dw: Int,
      dh: Int): Array[Int] = {
    require(w > 0 && h > 0 && dw > 0 && dh > 0 && px.length == w * h,
      s"bad resize ${w}x$h -> ${dw}x$dh over ${px.length} px")
    val out = new Array[Int](dw * dh)
    var y = 0
    while (y < dh) {
      val sy = (y.toLong * h / dh).toInt
      var x = 0
      while (x < dw) {
        out(y * dw + x) = px(sy * w + (x.toLong * w / dw).toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Aspect-preserving fit of (w, h) into (maxW, maxH), never
    * upscaling, never collapsing below 1px — the same floor(scale)
    * arithmetic the metadata path publishes. */
  def fitBox(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    require(w > 0 && h > 0 && maxW > 0 && maxH > 0, s"bad fit $w $h")
    val scale = math.min(1.0,
      math.min(maxW.toDouble / w, maxH.toDouble / h))
    (math.max(1, math.floor(w * scale).toInt),
      math.max(1, math.floor(h * scale).toInt))
  }

  /** REAL center-crop: ImageIO decode → [[cropCenter]] → PNG re-encode;
    * None on undecodable input, same degradation as [[decodeImage]]. */
  def cropImage(bytes: Array[Byte], cw: Int,
      ch: Int): Option[Array[Byte]] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Int](w * h)
        img.getRGB(0, 0, w, h, px, 0, w)
        val (dw, dh, cropped) = cropCenter(w, h, px, cw, ch)
        val out = new java.awt.image.BufferedImage(dw, dh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        out.setRGB(0, 0, dw, dh, cropped, 0, dw)
        val bos = new java.io.ByteArrayOutputStream()
        if (!ImageIO.write(out, "png", bos)) None else Some(bos.toByteArray)
      }
    } catch { case NonFatal(_) => None }

  /** REAL resize: ImageIO decode → [[resizeNearest]] into the
    * aspect-fit box → PNG re-encode (JDK writer; PNG because it is the
    * one lossless format every JDK ships). None on undecodable input —
    * same honest degradation as [[decodeImage]]. */
  def resizeImage(bytes: Array[Byte], maxW: Int,
      maxH: Int): Option[Array[Byte]] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Int](w * h)
        img.getRGB(0, 0, w, h, px, 0, w)
        val (dw, dh) = fitBox(w, h, maxW, maxH)
        val small = resizeNearest(w, h, px, dw, dh)
        val out = new java.awt.image.BufferedImage(dw, dh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        out.setRGB(0, 0, dw, dh, small, 0, dw)
        val bos = new java.io.ByteArrayOutputStream()
        if (!ImageIO.write(out, "png", bos)) None else Some(bos.toByteArray)
      }
    } catch { case NonFatal(_) => None }

  /** Real decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF/WBMP — no
    * external codec dependency). None on unrecognized or corrupt bytes
    * — a 100 TB media crawl always contains undecodable blobs, and a
    * throw here would kill the whole task, so the row degrades to NULL
    * and quarantine routing happens relationally downstream. */
  def decodeImage(bytes: Array[Byte]): Option[Stats] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Int](w * h)
        img.getRGB(0, 0, w, h, px, 0, w)
        Some(stats(w, h, px))
      }
    } catch { case NonFatal(_) => None }
}
