package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions over [[AudioCore]] — the audio twins of
  * [[ImageExpr]]'s pair: a real WAV decode and an oracle-replayable
  * synthetic-PCM form. CodegenFallback by design (decode cost dwarfs
  * interpreted-call overhead); staying expressions preserves column
  * pruning and lets them ride inside any projection. */
object AudioExpr {

  val pcmStatsType: StructType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("mean_amp", DoubleType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false)))

  val wavType: StructType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", DoubleType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("mean_amp", DoubleType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false)))

  private[multimodal] def toRow(s: AudioCore.PcmStats): InternalRow =
    InternalRow(s.nSamples, s.rms, s.meanAmp, s.zeroCrossings)

  private[multimodal] def toRow(w: AudioCore.WavInfo): InternalRow =
    InternalRow(w.channels, w.sampleRate, w.bitsPerSample, w.nFrames,
      w.durationMs, w.stats.nSamples, w.stats.rms, w.stats.meanAmp,
      w.stats.zeroCrossings)

  /** Synthetic-PCM stats over the string's first `n` codepoints. */
  def pcm_frame_stats(c: Column, n: Int): Column =
    GraftShim.columnOf(PcmFrameStats(GraftShim.expressionOf(c), n))

  /** Real RIFF/WAVE decode of an audio blob. NULL on undecodable. */
  def audio_stats(c: Column): Column =
    GraftShim.columnOf(AudioStats(GraftShim.expressionOf(c)))
}

/** `pcm_frame_stats(text, n)` — deterministic synthetic int16 signal
  * from a string; the oracle-replayable twin of [[AudioStats]] (same
  * [[AudioCore.pcmStats]] kernel, input DuckDB can reconstruct). */
case class PcmFrameStats(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, s"sample count must be positive, got $n")

  override def dataType: DataType = AudioExpr.pcmStatsType
  override def nullable: Boolean = true // short input -> null
  override def prettyName: String = "pcm_frame_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_frame_stats expects a STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    AudioCore.statsFromText(v.asInstanceOf[UTF8String].toString, n)
      .map(AudioExpr.toRow).orNull

  override protected def withNewChildInternal(
      newChild: Expression): PcmFrameStats = copy(child = newChild)
}

/** `audio_stats(binary)` — real executor-side RIFF/WAVE decode;
  * undecodable blobs degrade to NULL (quarantine relationally
  * downstream, never kill the task). */
case class AudioStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = AudioExpr.wavType
  override def nullable: Boolean = true // failed decode -> null
  override def prettyName: String = "audio_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"audio_stats expects a BINARY input, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    AudioCore.decodeWav(v.asInstanceOf[Array[Byte]])
      .map(AudioExpr.toRow).orNull

  override protected def withNewChildInternal(
      newChild: Expression): AudioStats = copy(child = newChild)
}
