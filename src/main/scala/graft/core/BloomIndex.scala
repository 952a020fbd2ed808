package graft.core

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** File-level Bloom index for point lookups on a non-clustered key.
  *
  * Parquet min-max stats prune beautifully on the SORT key and not at
  * all on any other: a point lookup on a secondary key scans every
  * file. A few KB of Bloom filter per file fixes that — the index maps
  * each data file to a membership sketch of its key values; a lookup
  * consults the (file-count-sized) index first and reads only the files
  * that *might* contain the key. False positives cost one wasted file
  * read; false negatives are impossible, so the pruned lookup returns
  * exactly what the full scan would (asserted in BloomIndexSpec).
  *
  * This is the DIY form of parquet's own bloom_filter column option,
  * kept engine-side so it works on data written by anyone, composes
  * with [[Snapshots]] versioned dirs, and can be rebuilt without
  * rewriting data.
  *
  * Scale shape: the build is one pass over the table — per-file partial
  * filters are merged map-side by the Aggregator, so only bloom
  * bitmaps (not rows) cross the shuffle, one row per file lands in the
  * index. Lookups read the tiny index, test the key driver-side, and
  * scan only the surviving files.
  */
object BloomIndex {

  /** Serializable Bloom buffer (BloomFilterImpl is Externalizable, so
    * plain Java serialization of the wrapper works for the partial-agg
    * shuffle). */
  final class Buf(var bf: BloomFilter) extends Serializable

  private final class BuildAgg(expected: Long, fpp: Double)
      extends Aggregator[java.lang.Long, Buf, Array[Byte]] {
    def zero: Buf = new Buf(BloomFilter.create(expected, fpp))
    def reduce(b: Buf, v: java.lang.Long): Buf = {
      if (v != null) b.bf.putLong(v.longValue()); b
    }
    def merge(a: Buf, b: Buf): Buf = { a.bf.mergeInPlace(b.bf); a }
    def finish(b: Buf): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      b.bf.writeTo(bos)
      bos.toByteArray
    }
    def bufferEncoder: Encoder[Buf] = Encoders.javaSerialization[Buf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build the index over a parquet table: one row per data file with
    * (file, n_rows, bloom). `expectedItemsPerFile` sizes each filter
    * (overshoot is wasted KBs, undershoot inflates the fpp). */
  def build(spark: SparkSession, tableDir: String, keyCol: String,
      expectedItemsPerFile: Long, fpp: Double = 0.01): DataFrame = {
    val agg = udaf(new BuildAgg(expectedItemsPerFile, fpp))
    spark.read.parquet(tableDir)
      .select(input_file_name().as("file"), col(keyCol).cast("long").as("k"))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n_rows"), agg(col("k")).as("bloom"))
  }

  /** Files that may contain ANY of `keys` (driver-side test over the
    * per-file index — the index has one row per file, so collecting it
    * is bounded by file count, not data size). */
  def candidateFiles(index: DataFrame, keys: Seq[Long]): Seq[String] =
    index.select(col("file"), col("bloom")).collect().toSeq
      .filter { r =>
        val bf = BloomFilter.readFrom(
          new ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
        keys.exists(bf.mightContainLong)
      }
      .map(_.getString(0))

  /** Point lookup through the index: read only candidate files, then
    * apply the exact predicate. Returns exactly what the full scan
    * would (Bloom false negatives are impossible). */
  def lookup(spark: SparkSession, index: DataFrame, keyCol: String,
      keys: Seq[Long]): DataFrame = {
    val files = candidateFiles(index, keys)
    if (files.isEmpty) {
      // no file can contain the keys: empty frame with the right schema
      // (cheapest source of truth: scan the index's first file's schema
      // would still read a footer — an impossible filter on one file is
      // simpler and prunes to zero row groups)
      val any = index.select(col("file")).limit(1).collect()
      require(any.nonEmpty, "empty index")
      spark.read.parquet(any.head.getString(0)).filter(lit(false))
    } else {
      spark.read.parquet(files: _*)
        .filter(col(keyCol).isin(keys: _*))
    }
  }
}
