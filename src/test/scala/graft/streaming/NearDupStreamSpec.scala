package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.HyperplaneLSH

class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed pairs equal the batch operator over the full corpus") {
    implicit val sqlCtx = spark.sqlContext
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val dir = Files.createTempDirectory("graft_neardup_stream").toString
    val (buckets, pairs, ckpt) =
      (s"$dir/buckets", s"$dir/pairs", s"$dir/ckpt")

    val mem = MemoryStream[(Long, Array[Float])]
    val q = NearDupStream.start(
      mem.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", nBits = 8, seed = 11L, threshold = 0.3,
      bucketsPath = buckets, pairsPath = pairs, checkpointDir = ckpt,
      // AvailableNow would stop before the addData loop below feeds it
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    e.grouped(170).foreach { g => mem.addData(g); q.processAllAvailable() }
    q.stop()

    def norm(p: (Long, Long)) = if (p._1 < p._2) p else p.swap
    val streamed = spark.read.parquet(pairs)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSeq
    // every pair completes exactly once — in the batch where its second
    // member arrives — so the union over batches IS the full pair set
    assert(streamed.length == streamed.toSet.size, "pair emitted twice")
    val full = HyperplaneLSH.nearDupPairs(
        graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings"),
        "vec_id", "embedding", nBits = 8, seed = 11L, threshold = 0.3)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(streamed.map(norm).toSet == full.map(norm))
    assert(full.nonEmpty)
    // the grown bucket table is the batch artifact, usable directly
    assert(spark.read.parquet(buckets).count() == e.length)

    // restart safety: replaying the LAST batch is a no-op (dynamic
    // partition overwrite + the pre-batch corpus filter)
    val lastBatch = spark.createDataset(e.takeRight(e.length % 170 match {
      case 0 => 170
      case r => r
    })).toDF("vec_id", "embedding")
    // buckets (not pairs) are written by EVERY batch, so their newest
    // partition is always the true last batch
    val lastId = spark.read.parquet(buckets)
      .select(max(col("__batch_id")).cast("long")).head().getLong(0)
    NearDupStream.processBatch(lastBatch, lastId,
      "vec_id", "embedding", nBits = 8, seed = 11L, threshold = 0.3,
      bucketsPath = buckets, pairsPath = pairs)
    val replayed = spark.read.parquet(pairs)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSeq
    assert(replayed.map(norm).toSet == full.map(norm))
    assert(replayed.length == replayed.toSet.size)
    assert(spark.read.parquet(buckets).count() == e.length)

    // lost-checkpoint guard: a batch id behind the stored table must
    // fail loudly instead of hiding the corpus and clobbering partitions
    val boom = intercept[IllegalArgumentException] {
      NearDupStream.processBatch(lastBatch, 0L,
        "vec_id", "embedding", nBits = 8, seed = 11L, threshold = 0.3,
        bucketsPath = buckets, pairsPath = pairs)
    }
    assert(boom.getMessage.contains("behind the stored bucket table"))

    // plane-family guard: different (nBits, seed, dims) against the
    // same stored table must refuse, not silently find nothing
    val mismatch = intercept[IllegalArgumentException] {
      NearDupStream.processBatch(lastBatch, lastId + 1,
        "vec_id", "embedding", nBits = 8, seed = 99L, threshold = 0.3,
        bucketsPath = buckets, pairsPath = pairs)
    }
    assert(mismatch.getMessage.contains("plane family"))

    // gap guard: a batch id that skips past the stored table means the
    // intervening batches' vectors are missing — refuse loudly
    val gap = intercept[IllegalArgumentException] {
      NearDupStream.processBatch(lastBatch, lastId + 5,
        "vec_id", "embedding", nBits = 8, seed = 11L, threshold = 0.3,
        bucketsPath = buckets, pairsPath = pairs)
    }
    assert(gap.getMessage.contains("skips past the stored bucket table"))
  }

  test("3-batch ingest with a kill/restart between every batch equals the single-batch run") {
    // The continuous-ingest contract end-to-end: each batch arrives AFTER
    // the previous streaming query was stopped, so a brand-new query
    // (same checkpoint) must resume from the stored bucket table + offsets
    // and still complete every cross-batch pair exactly once. This is the
    // composition the incremental dedup families claim — state lives in
    // the parquet bucket table, not in any in-memory structure that dies
    // with the query.
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val dir = Files.createTempDirectory("graft_neardup_restart").toString
    val (in, buckets, pairs, ckpt) =
      (s"$dir/in", s"$dir/buckets", s"$dir/pairs", s"$dir/ckpt")
    val schema = spark.createDataset(e.take(1)).toDF("vec_id", "embedding")
      .schema
    val thirds = e.grouped((e.length + 2) / 3).toSeq
    assert(thirds.length == 3)
    thirds.zipWithIndex.foreach { case (third, i) =>
      // the batch lands as a new file AFTER the previous query died
      spark.createDataset(third).toDF("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(in)
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val q = NearDupStream.start(src, "vec_id", "embedding",
        nBits = 8, seed = 11L, threshold = 0.3,
        bucketsPath = buckets, pairsPath = pairs, checkpointDir = ckpt)
      q.awaitTermination() // AvailableNow: drains the new file, then dies
      assert(!q.isActive, s"query $i should have terminated")
    }
    def norm(p: (Long, Long)) = if (p._1 < p._2) p else p.swap
    val streamed = spark.read.parquet(pairs)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSeq
    assert(streamed.length == streamed.toSet.size, "pair emitted twice")
    val full = HyperplaneLSH.nearDupPairs(
        graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings"),
        "vec_id", "embedding", nBits = 8, seed = 11L, threshold = 0.3)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(full.nonEmpty)
    assert(streamed.map(norm).toSet == full.map(norm))
    assert(spark.read.parquet(buckets).count() == e.length)
  }

  test("a torn or empty bucket directory reads as an empty corpus") {
    val dir = Files.createTempDirectory("graft_neardup_torn").toString
    val (buckets, pairs) = (s"$dir/buckets", s"$dir/pairs")
    // simulate a torn first write: the directory exists with no data
    Files.createDirectories(java.nio.file.Paths.get(buckets))
    Files.write(java.nio.file.Paths.get(s"$buckets/_SUCCESS"),
      Array.empty[Byte])
    val batch = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.05f)))
      .toDF("vec_id", "embedding")
    NearDupStream.processBatch(batch, 0L, "vec_id", "embedding",
      nBits = 4, seed = 3L, threshold = 0.9,
      bucketsPath = buckets, pairsPath = pairs, dims = 2)
    // within-batch pair found; no crash loop on schema inference
    val got = spark.read.parquet(pairs)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
    assert(spark.read.parquet(buckets).count() == 2)
  }
}
