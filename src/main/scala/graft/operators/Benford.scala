package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benford's-law first-digit audit — the classic screen for fabricated or
  * truncated numeric data (amounts, counts, measurements): in many
  * natural multi-scale distributions the leading significant digit d
  * appears with frequency log10(1 + 1/d). Large deviation per digit is a
  * red flag for a data-quality investigation (it is NOT a verdict).
  *
  * One aggregation pass: leading digit per row → 9 count rows → observed
  * frequency vs expected. Engine-exactness choices:
  *
  *  - the leading digit comes from the INTEGER rendering of
  *    `round(|v| * 10^scale)` (exact cents-style units), because
  *    integer→string is identical everywhere while float→string and
  *    log10-based digit extraction are not;
  *  - the 9 expected frequencies are compile-time decimal-string
  *    literals (17 significant digits — enough that parsing reproduces
  *    the exact double), NOT runtime log10 calls: libm log10 is not
  *    guaranteed correctly rounded, so two engines may disagree in the
  *    last ulp; parsing a decimal literal IS correctly rounded in both.
  */
object Benford {

  /** (digit, n, freq, expected, deviation) for digits 1-9; zero-valued
    * rows are excluded (no leading significant digit). `scale` shifts the
    * value into exact integer units first (2 for money). Digits with no
    * rows are absent (inner aggregation) — deviation is vs the digits
    * present. */
  def firstDigit(df: DataFrame, valueCol: String, scale: Int = 2): DataFrame = {
    val units = abs(col(valueCol)) * pow(lit(10.0), lit(scale))
    val digit = substring(round(units).cast("long").cast("string"), 1, 1)
      .cast("int")
    val counts = df
      .filter(col(valueCol).isNotNull)
      .withColumn("digit", digit)
      .filter(col("digit") >= 1)
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    val expected = expectedFreqs.foldLeft(lit(null).cast("double")) {
      case (acc, (d, e)) => when(col("digit") === d, lit(e)).otherwise(acc)
    }
    counts
      .withColumn("total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("freq", col("n").cast("double") / col("total").cast("double"))
      .withColumn("expected", expected)
      .withColumn("deviation", col("freq") - col("expected"))
      .drop("total")
  }

  /** log10(1 + 1/d) computed ONCE here; consumers (including oracle SQL
    * builders) embed these exact doubles as shortest-round-trip decimal
    * literals, which every engine parses back to the identical bits. */
  val expectedFreqs: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))
}
