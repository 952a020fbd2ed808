package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Poisson bootstrap: weights verified against an independent
  * from-scratch md5 replay, replicate means against a hand-computed
  * weighted mean, and the SE against the analytic sd/√n it estimates. */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private val Thresholds = Seq(1580030168L, 3160060337L, 3950075421L,
    4213413783L, 4279248373L, 4292415291L, 4294609777L, 4294923276L,
    4294962463L)

  /** From-scratch weight: md5 via MessageDigest, same thresholds. */
  private def refWeight(id: String, rep: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$id:$rep".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.take(8), 16)
    Thresholds.indexWhere(h < _) match {
      case -1 => 9
      case k => k
    }
  }

  test("poissonWeight matches the independent replay; mean weight ~ 1") {
    val df = (1 to 500).map(_.toLong).toDF("id")
      .select(col("id"), explode(sequence(lit(0), lit(7))).as("rep"))
      .withColumn("w", Bootstrap.poissonWeight(col("id"), col("rep")))
    val got = df.as[(Long, Int, Int)].collect()
    got.foreach { case (id, rep, w) =>
      assert(w === refWeight(id.toString, rep), s"id=$id rep=$rep")
    }
    val mean = got.map(_._3).sum.toDouble / got.length
    assert(math.abs(mean - 1.0) < 0.05, s"Poisson(1) mean drifted: $mean")
  }

  test("replicate means equal the hand-computed weighted means") {
    val rows = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
    val df = rows.toDF("id", "v")
    val got = Bootstrap.replicateMeans(df, "id", "v", Nil, 4)
      .filter(col("mean_r").isNotNull)
      .select(col("rep"), col("mean_r").cast("double"))
      .as[(Int, Double)].collect().toMap
    (0 until 4).foreach { rep =>
      val ws = rows.map { case (id, _) => refWeight(id.toString, rep) }
      val wsum = ws.sum
      if (wsum > 0) {
        val want = rows.zip(ws).map { case ((_, v), w) => w * v }.sum /
          wsum.toDouble
        assert(math.abs(got(rep) - want) < 1e-9, s"rep=$rep")
      } else assert(!got.contains(rep))
    }
  }

  test("se_boot tracks the analytic standard error of an iid mean") {
    // deterministic pseudo-uniform values in [0,100): sd = 100/sqrt(12)
    val n = 4000
    val df = (1 to n).map(_.toLong).toDF("id")
      .withColumn("v",
        pmod(conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(10000L)).cast("double") / 100.0)
    val r = Bootstrap.groupedMeanSe(df, "id", "v", Nil, 32)
      .select(col("n"), col("mean_val"), col("se_boot"))
      .as[(Long, Double, Double)].head()
    val (cnt, mean, se) = r
    assert(cnt === n.toLong)
    assert(math.abs(mean - 50.0) < 2.0)
    val analytic = (100.0 / math.sqrt(12.0)) / math.sqrt(n.toDouble)
    assert(se > 0.6 * analytic && se < 1.6 * analytic,
      s"se=$se vs analytic=$analytic")
  }

  test("null values are excluded; n counts non-null rows") {
    val df = Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
      .toDF("id", "v")
    val r = Bootstrap.groupedMeanSe(df, "id", "v", Nil, 4)
      .select("n").as[Long].head()
    assert(r === 2L)
  }
}
