package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Encoding-anomaly screen — the corpus-hygiene pass every web-text
  * pipeline runs before training (C4/CCNet drop or re-decode these):
  *
  *  - n_replacement: U+FFFD replacement characters (a decoder already
  *    gave up once upstream);
  *  - n_ctrl: control characters outside \t \n \r (C0, DEL, C1 —
  *    binary junk or wrong-charset reads);
  *  - n_moji: UTF-8-read-as-Latin-1/cp1252 digraphs — a head byte
  *    char (Â Ã â) followed by a continuation-range char or its
  *    cp1252 remapping (€ ™ ' " … etc.). Legitimate accented text
  *    never matches: the follower class contains no ASCII, so
  *    'SÃO'/'pâte' pass while 'SÃ£o'/'â€™' flag.
  *
  * Counting is exact and engine-portable: single chars count via the
  * translate length-difference identity; the digraph count is one
  * regexp count whose class is generated from shared code points
  * (rendered as \uXXXX for Java regex, \x{XXXX} for RE2 — the two
  * engines' only syntactic divergence). */
object EncodingScreen {

  /** cp1252 remappings of the 0x80-0x9F continuation bytes (the chars
    * mojibake actually shows when UTF-8 is read as Windows-1252). */
  private val Cp1252: Seq[Int] = Seq(0x20AC, 0x201A, 0x0192, 0x201E,
    0x2026, 0x2020, 0x2021, 0x02C6, 0x2030, 0x0160, 0x2039, 0x0152,
    0x017D, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x017E, 0x0178)

  private val MojiHeads: Seq[Int] = Seq(0x00C2, 0x00C3, 0x00E2)
  private val MojiTails: Seq[Int] = (0x80 to 0xBF) ++ Cp1252

  /** Java-regex rendering of the digraph pattern (Spark side). */
  val mojiPatternJava: String =
    MojiHeads.map(c => f"\\u$c%04X").mkString("[", "", "]") +
      MojiTails.map(c => f"\\u$c%04X").mkString("[", "", "]")

  /** RE2 rendering of the same pattern (DuckDB side). */
  val mojiPatternRe2: String =
    MojiHeads.map(c => f"\\x{$c%04X}").mkString("[", "", "]") +
      MojiTails.map(c => f"\\x{$c%04X}").mkString("[", "", "]")

  /** Control-char class minus \t \n \r — plain \xhh escapes parse
    * identically in Java regex and RE2, so ONE string serves both. */
  val ctrlPattern: String =
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]"

  private def charCount(text: Column, ch: String): Column =
    length(text) - length(translate(text, ch, ""))

  /** (doc id, n_replacement, n_ctrl, n_moji, is_suspect) per document. */
  def screen(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
        charCount(t, "\uFFFD").cast("long").as("n_replacement"),
        regexp_count(t, lit(ctrlPattern)).cast("long").as("n_ctrl"),
        regexp_count(t, lit(mojiPatternJava)).cast("long").as("n_moji"))
      .withColumn("is_suspect",
        col("n_replacement") > 0 || col("n_ctrl") > 0 || col("n_moji") > 0)
  }
}
