package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Periodogram seasonality detection — the spectral companion of the
  * time-domain family ([[AutoCorr]]'s ACF, the seasonal decomposition):
  * at each CANDIDATE period P, the squared magnitude of the series'
  * correlation with the period-P harmonic,
  * power(P) = (Σ xₜ·cos(2πtₚ/P))² + (Σ xₜ·sin(2πtₚ/P))², tₚ = t mod P.
  * A genuine weekly cycle spikes power at P = 7; white noise spreads
  * it flat — the one-readout "does this metric have a rhythm?" probe.
  *
  * Engine-exactness: values quantize to cents and the two trig factors
  * to integral micro-units via floor(1e6·cos/sin) — the trig calls run
  * on the BOUNDED distinct domain t mod P ∈ [0, P) (the ln-waypoint
  * contract, applied to libm trig), so each corpus-sized reduction is
  * an exact integer sum and only the closing power formula is doubles
  * through the 2^53 hi/lo split.
  *
  * Scale shape: the candidate-period explode is a bounded ×|periods|
  * multiplier on ONE scan, collapsed map-side to (key, period) rows —
  * no join, no window, no second pass. */
object Spectral {

  private def i38(c: Column) = c.cast("decimal(38,0)")
  private def dv(c: Column) = LinearModel.intMomentToDouble(c, 1.0)

  /** Per-(key, period) spectral power of `valueCol` over the integer
    * time index `tCol` (0-based; gaps allowed — missing slots simply
    * contribute nothing). `power` is amplitude-squared per row,
    * (Σx·cos)² + (Σx·sin)² normalized by n² — comparable across keys
    * of different lengths. Output: key, period, n, power. */
  def periodogram(df: DataFrame, keyCol: String, tCol: String,
      valueCol: String, periods: Seq[Int]): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2),
      s"periods must all be >= 2, got $periods")
    val vm = (col(valueCol).cast("decimal(18,2)") * 100).cast("long")
    val tau = lit(2.0 * math.Pi)
    val tmod = col(tCol).cast("long") % col("period")
    val arg = tau * tmod.cast("double") / col("period").cast("double")
    val c6 = floor(cos(arg) * lit(1e6)).cast("long")
    val s6 = floor(sin(arg) * lit(1e6)).cast("long")
    val agg = df
      .filter(col(valueCol).isNotNull && col(tCol).isNotNull)
      .select(col(keyCol), col(tCol), vm.as("vm"))
      .withColumn("period", explode(array(periods.map(lit): _*)))
      .groupBy(col(keyCol), col("period"))
      .agg(count(lit(1)).as("n"),
        sum(i38(col("vm")) * c6).as("sc"),
        sum(i38(col("vm")) * s6).as("ss"))
    val nD = col("n").cast("double")
    // cents·micro → natural units: /1e8 per component, then /n each
    val re = dv(col("sc")) / lit(1.0e8) / nD
    val im = dv(col("ss")) / lit(1.0e8) / nD
    agg.select(col(keyCol), col("period"), col("n"),
      (re * re + im * im).as("power"))
  }
}
