package graft

import org.apache.spark.sql.SparkSession

/** Bench harness: times each SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are forced through the `noop` sink so the
  * full plan (projections included) executes — `.count()` would let Catalyst
  * prune away most of the work and time nothing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm every query once at the smallest scale factor: Catalyst
    // analysis + whole-stage codegen + JIT compile are one-off driver
    // costs (measured up to ~5s per complex query) that are noise at the
    // 100 TB design point — the timed runs below measure steady-state
    // execution on the target scale factor.
    val warmDir = "/root/testdata/sf0.01"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    spark.catalog.clearCache() // drop warmup-phase persisted data

    // Three timed runs, min reported: the per-run jitter (GC, AQE
    // re-planning, cache churn from operators that persist intermediates)
    // is noise relative to steady-state throughput, which is what a
    // long-running 100 TB job experiences. Two runs proved insufficient —
    // a GC-pressure episode can span both back-to-back runs of one query
    // and misattribute multi-second costs to it.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var failed = false
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      // a failed query must be visible in the output, not reported as a
      // suspiciously-fast success
      name -> (if (failed) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
