package graft.operators

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable quantile-sketch state tables (DataSketches KLL) — the
  * rank/percentile member of the incremental-state family beside
  * [[SketchState]] (distinct counts) and [[HeavyHitters]] (frequent
  * items): quantiles are not algebraic, so `IncrementalAgg`'s
  * sum/count partials cannot answer "p99 latency per service per day"
  * over continuously ingested data without re-scanning history. A
  * per-(key, period) KLL sketch persisted at ingest time can — KLL
  * merge is associative and lossless in guarantees, so batch-built
  * state unions into exactly the error envelope a full rebuild has.
  *
  * Exactness regime (the HLL treatment): a KLL sketch that has never
  * compacted — fewer updates than its capacity (k = 200 holds ≥ 200
  * items) — retains EVERY item, so quantile queries are exact order
  * statistics and deterministic; that is the regime the driver oracle
  * checks. Past capacity, compaction engages the library's internal
  * randomness: results are approximate within the published ~1.65/k^0.86
  * rank error but NOT bit-reproducible across runs — the spec gates
  * that regime by rank-error bound instead of equality (the one sketch
  * in this library whose scale regime is bounded, not replayed).
  *
  * Buffers ride Java serialization with explicit sketch hooks (the
  * library's own compact binary form travels, not object internals).
  */
object QuantileSketch {

  /** Serializable carrier for a heap KLL sketch. */
  final class Wrap(var k: Int) extends Serializable {
    @transient private var sk: KllDoublesSketch = _
    def sketch: KllDoublesSketch = {
      if (sk == null) sk = KllDoublesSketch.newHeapInstance(k)
      sk
    }
    def absorb(bytes: Array[Byte]): Unit =
      sketch.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))

    @throws[IOException]
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.writeInt(k)
      val b = sketch.toByteArray
      out.writeInt(b.length)
      out.write(b)
    }
    @throws[IOException]
    private def readObject(in: ObjectInputStream): Unit = {
      k = in.readInt()
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      sk = KllDoublesSketch.newHeapInstance(k)
      sk.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
    }
  }

  private abstract class WrapAgg[IN](k: Int)
      extends Aggregator[IN, Wrap, Array[Byte]] {
    def zero: Wrap = new Wrap(k)
    def merge(a: Wrap, b: Wrap): Wrap = { a.sketch.merge(b.sketch); a }
    def finish(b: Wrap): Array[Byte] = b.sketch.toByteArray
    def bufferEncoder: Encoder[Wrap] = Encoders.javaSerialization[Wrap]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private final class BuildAgg(k: Int) extends WrapAgg[java.lang.Double](k) {
    def reduce(b: Wrap, v: java.lang.Double): Wrap = {
      if (v != null) b.sketch.update(v.doubleValue()); b
    }
  }

  private final class UnionAgg(k: Int) extends WrapAgg[Array[Byte]](k) {
    def reduce(b: Wrap, bytes: Array[Byte]): Wrap = {
      if (bytes != null) b.absorb(bytes); b
    }
  }

  /** Union to one sketch per group, then read the requested quantiles
    * (INCLUSIVE search: the value at 1-based rank ⌈q·n⌉). */
  private final class QuantAgg(k: Int, qs: Seq[Double])
      extends Aggregator[Array[Byte], Wrap, Seq[Double]] {
    def zero: Wrap = new Wrap(k)
    def reduce(b: Wrap, bytes: Array[Byte]): Wrap = {
      if (bytes != null) b.absorb(bytes); b
    }
    def merge(a: Wrap, b: Wrap): Wrap = { a.sketch.merge(b.sketch); a }
    def finish(b: Wrap): Seq[Double] =
      if (b.sketch.isEmpty) Seq.fill(qs.length)(Double.NaN)
      else qs.map(q => b.sketch.getQuantile(q))
    def bufferEncoder: Encoder[Wrap] = Encoders.javaSerialization[Wrap]
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Build (or rebuild for one ingest batch) the state: one row per key
    * tuple with a binary KLL `qsketch` over `valueCol` (nulls skipped). */
  def build(df: DataFrame, keyCols: Seq[String], valueCol: String,
      k: Int = 200): DataFrame = {
    val agg = udaf(new BuildAgg(k))
    df.groupBy(keyCols.map(col): _*)
      .agg(agg(col(valueCol).cast("double")).as("qsketch"))
  }

  /** Fold a batch's state into stored state: same keys merge by sketch
    * union, new keys pass through — key-sized shuffle of binaries. */
  def merge(stored: DataFrame, batch: DataFrame, keyCols: Seq[String],
      k: Int = 200): DataFrame = {
    val agg = udaf(new UnionAgg(k))
    stored.unionByName(batch)
      .groupBy(keyCols.map(col): _*)
      .agg(agg(col("qsketch")).as("qsketch"))
  }

  /** Roll the state up to `groupCols` (⊆ build keys) and read quantiles:
    * (groupCols…, q, value) — one output row per group × quantile. */
  def quantiles(state: DataFrame, groupCols: Seq[String], qs: Seq[Double],
      k: Int = 200): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile ranks must be in (0, 1], got $qs")
    val agg = udaf(new QuantAgg(k, qs))
    val grouped = state.groupBy(groupCols.map(col): _*)
      .agg(agg(col("qsketch")).as("__qv"))
    grouped
      .select(groupCols.map(col) :+
        posexplode(col("__qv")).as(Seq("__pos", "value")): _*)
      .select(groupCols.map(col) ++ Seq(
        element_at(array(qs.map(lit): _*), col("__pos") + 1).as("q"),
        col("value")): _*)
  }
}
