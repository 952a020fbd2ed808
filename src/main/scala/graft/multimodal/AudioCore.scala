package graft.multimodal

/** Audio kernels: a REAL RIFF/WAVE (PCM) decoder plus the
  * oracle-replayable synthetic-PCM twin — the audio mirror of
  * [[ImageCore]]'s ImageIO / raw-frame pair.
  *
  * The WAV container is a public spec (RIFF chunks; canonical layout in
  * the Microsoft/IBM 1991 Multimedia Programming Interface reference):
  * "RIFF" + size + "WAVE", then tagged chunks of which `fmt ` carries
  * (audioFormat, channels, sampleRate, bitsPerSample) and `data`
  * carries little-endian interleaved samples. Only integer PCM
  * (format 1) at 8 or 16 bits is decoded — the formats a pipeline's
  * own exports produce; anything else degrades to None (quarantine
  * relationally downstream, never kill the task — the ImageCore rule).
  *
  * The signal features are the standard cheap audio screens: RMS
  * energy (silence/clipping detection) and zero-crossing count (a
  * crude voicedness/noisiness proxy) — both exact-integer sums with
  * one closing double division, so the whole row replays bit-exactly
  * in SQL over the synthetic twin.
  */
object AudioCore {

  /** Signal features over a PCM16 sample array. sumSq and sumAbs stay
    * in Long (max 192k samples × 32768² fits 2^53 exactly — the double
    * renderings are exact), so rms/mean_amp are single correctly-
    * rounded divisions. */
  final case class PcmStats(
      nSamples: Long, rms: Double, meanAmp: Double, zeroCrossings: Long)

  /** Full decode result: container facts + signal features. `stats`
    * are computed over CHANNEL 0 after de-interleaving (nSamples ==
    * nFrames): running the kernel over the raw interleaved stream would
    * count sign flips between adjacent samples of DIFFERENT channels as
    * zero crossings and mix channels into rms/mean — meaningless for
    * stereo. Mono is unaffected. */
  final case class WavInfo(
      channels: Int, sampleRate: Int, bitsPerSample: Int,
      nFrames: Long, durationMs: Double, stats: PcmStats)

  /** Shared kernel: exact integer sums over int16 samples. A zero
    * crossing is a STRICT sign change between consecutive samples
    * (s_i·s_{i−1} < 0 — zeros break runs without counting). */
  def pcmStats(samples: Array[Int]): PcmStats = {
    var sumSq = 0L
    var sumAbs = 0L
    var zc = 0L
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toLong
      sumSq += s * s
      sumAbs += math.abs(s)
      if (i > 0 && samples(i - 1).toLong * s < 0) zc += 1
      i += 1
    }
    val n = samples.length
    PcmStats(n,
      if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n.toDouble),
      if (n == 0) 0.0 else sumAbs.toDouble / n.toDouble,
      zc)
  }

  /** Synthetic twin: the string's first `n` codepoints as int16 samples
    * `(cp & 0xFF − 128) · 256`. None when the text is too short. Same
    * codepoint convention as [[ImageCore.statsFromText]], so the DuckDB
    * oracle reconstructs the identical samples with
    * `(ord(substr(f,i,1)) % 256 − 128) * 256`. */
  def statsFromText(s: String, n: Int): Option[PcmStats] = {
    val cps = s.codePoints().limit(n).toArray
    if (cps.length < n) None
    else Some(pcmStats(cps.map(cp => ((cp & 0xFF) - 128) * 256)))
  }

  /** Real RIFF/WAVE decode. None on anything that is not a well-formed
    * integer-PCM WAV (bad magic, truncated chunks, float/compressed
    * formats, bit depths other than 8/16). */
  def decodeWav(bytes: Array[Byte]): Option[WavInfo] = {
    def u16(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int) = (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
      ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return None
    // walk the chunk list for fmt and data
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // format, ch, rate, bits
    var data: Option[(Int, Int)] = None          // offset, length
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val len = u32(off + 4).toInt
      val body = off + 8
      if (len < 0 || body + len > bytes.length) return None
      if (id == "fmt " && len >= 16)
        fmt = Some((u16(body), u16(body + 2), u32(body + 4).toInt,
          u16(body + 14)))
      if (id == "data") data = Some((body, len))
      off = body + len + (len & 1) // chunks are word-aligned
    }
    for {
      (format, ch, rate, bits) <- fmt
      if format == 1 && ch > 0 && rate > 0 && (bits == 8 || bits == 16)
      (dOff, dLen) <- data
    } yield {
      val bytesPerSample = bits / 8
      val frameBytes = bytesPerSample * ch
      val frames = dLen / frameBytes
      // de-interleave channel 0: one sample per frame, skipping the
      // other channels' bytes
      val samples = new Array[Int](frames)
      var i = 0
      while (i < frames) {
        val o = dOff + i * frameBytes
        samples(i) =
          if (bits == 8) ((bytes(o) & 0xFF) - 128) * 256
          else (bytes(o + 1) << 8) | (bytes(o) & 0xFF) // LE signed 16-bit
        i += 1
      }
      WavInfo(ch, rate, bits, frames.toLong,
        frames.toDouble * 1000.0 / rate.toDouble, pcmStats(samples))
    }
  }
}
