package graft.streaming

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Snapshots
import graft.operators.Divergence

/** The composite exactly-once contract: ONE pipeline chaining every
  * streaming rail — file ingest → [[DedupStream.dedupForever]] (stateful
  * dropDuplicates riding the checkpoint) → [[SnapshotSink]] (tagged
  * versioned commits) AND [[StateStream]] PSI bin counters — killed and
  * resumed between every micro-batch, must produce the IDENTICAL
  * per-batch drift series, snapshot versions, and deduped fingerprint
  * set as the uninterrupted run. The per-component kill/restart specs
  * (StateStreamSpec, SnapshotSinkSpec, DedupStreamSpec) prove each rail
  * alone; this proves their COMPOSITION — the at-least-once foreachBatch
  * replay window hits two idempotent sinks plus engine dedup state in
  * one transaction-free chain (VERDICT r11 item 7).
  */
class DriftChainSpec extends SparkSpec {
  import spark.implicits._

  // slice 0: docs 0..19; slice 1: docs 20..39 PLUS exact duplicates of
  // three slice-0 texts under new ids (cross-batch dups — only survive
  // dedup if the fp state survives the kill); slice 2: docs 40..59.
  private def slices: Seq[DataFrame] = {
    def doc(i: Int) = (i.toLong, s"document body number $i " + ("x" * (i % 7)))
    val s0 = (0 until 20).map(doc)
    val s1 = (20 until 40).map(doc) ++
      Seq(100L -> doc(3)._2, 101L -> doc(7)._2, 102L -> doc(11)._2)
    val s2 = (40 until 60).map(doc)
    Seq(s0, s1, s2).map(_.toDF("doc_id", "text"))
  }

  /** Runs the full chain over the 3 slices; `killBetween` restarts the
    * query (fresh process-equivalent: new query object, same checkpoint)
    * after every slice. Returns (psi series, committed versions,
    * fingerprints in the snapshot table). */
  private def runChain(dir: String, killBetween: Boolean)
      : (Seq[(Long, Double)], Seq[Long], Set[String]) = {
    val (in, ckpt, state, table) =
      (s"$dir/in", s"$dir/ckpt", s"$dir/state", s"$dir/table")
    val model = StateStream.binCountModel("bin")
    // frozen expected distribution: slice 0's bins (the training ref)
    val expected = Divergence.binCounts(
      slices.head.withColumn("bin", length(col("text")) % 5), "bin")
      .localCheckpoint()
    val series = ArrayBuffer.empty[(Long, Double)]
    def startQuery() = {
      val src = spark.readStream
        .schema(slices.head.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val deduped = DedupStream.dedupForever(src, "text")
      deduped.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          val binned = b.withColumn("bin", length(col("text")) % 5)
          SnapshotSink.processBatch(
            binned.select("doc_id", "text", "fp", "bin"), id, table)
          StateStream.processBatch(binned, id, model, state)
          val psi = Divergence.psiFromCounts(
              StateStream.current(spark, binned, model, state), expected)
            .select("psi").as[Double].head()
          series += ((id, psi))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    slices.zipWithIndex.foreach { case (s, i) =>
      s.coalesce(1).write.mode("append").parquet(in)
      Thread.sleep(120) // distinct mtimes -> stable batch order
      if (killBetween || i == slices.size - 1) {
        val q = startQuery()
        q.awaitTermination()
        assert(!q.isActive)
      }
    }
    val versions = Snapshots.versions(spark, table)
    // each micro-batch committed ONE version; the table is their union
    val fps = versions.map(v => Snapshots.read(spark, table, Some(v)))
      .reduce(_ unionByName _)
      .select("fp").as[String].collect().toSet
    (series.toSeq, versions, fps)
  }

  test("kill/resume of the ingest->dedup->PSI->snapshot chain replays " +
    "to the identical drift series and table") {
    val base = Files.createTempDirectory("graft_chain").toString
    val (sKill, vKill, fpKill) = runChain(s"$base/killed", killBetween = true)
    val (sRun, vRun, fpRun) = runChain(s"$base/clean", killBetween = false)
    // the drift series is bit-identical batch by batch
    assert(sKill === sRun)
    assert(sKill.map(_._1) === Seq(0L, 1L, 2L))
    // PSI moves as drifted slices land (non-degenerate series)
    assert(sKill.map(_._2).forall(p => p >= 0.0 && !p.isNaN))
    // one committed version per micro-batch, both runs
    assert(vKill.size === 3 && vRun.size === 3)
    // dedup state survived the kills: the three cross-batch duplicate
    // texts were dropped, so both tables hold the 60 unique fps
    assert(fpKill === fpRun)
    assert(fpKill.size === 60)
  }
}
