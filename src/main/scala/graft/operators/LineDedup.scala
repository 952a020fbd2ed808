package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.functions.TextFunctions

/** Line-level corpus deduplication — the web-curation step popularized
  * by the C4/RefinedWeb/CCNet pipelines (public papers): a line that
  * recurs across many documents is boilerplate (navigation, cookie
  * banners, license footers) and is removed from every document, while
  * the documents themselves survive. Complements document-level dedup
  * (`graft.dedup.Dedup`): there the unit is the document, here it is the
  * repeated fragment inside otherwise-unique documents.
  *
  * Documents without newline structure (or with over-long lines) are
  * chunked into fixed-width pseudo-lines of `wordsPerLine` whitespace
  * tokens — pure array expressions, so the only shuffles are the
  * line-fingerprint aggregation and the per-document re-assembly, both
  * keyed shuffles that scale linearly with corpus size. Fingerprints
  * (md5) keep the shuffled rows small regardless of line length.
  */
object LineDedup {

  /** (id, line_no, line) — the chunked line table. No shuffle: chunking
    * is array arithmetic inside the scan projection. */
  def lines(docs: DataFrame, idCol: String, textCol: String,
      wordsPerLine: Int): DataFrame = {
    require(wordsPerLine >= 1, s"wordsPerLine must be >= 1, got $wordsPerLine")
    val w = wordsPerLine
    docs
      .withColumn("__toks", split(TextFunctions.collapseWs(col(textCol)), " "))
      .select(col(idCol), posexplode(expr(
        s"""transform(
           |  sequence(0, int(ceil(size(__toks) / CAST($w AS DOUBLE))) - 1),
           |  i -> array_join(slice(__toks, i * $w + 1, $w), ' '))""".stripMargin))
        .as(Seq("line_no", "line")))
  }

  /** Per-document duplication profile: total lines, lines whose corpus
    * occurrence count exceeds `dupThreshold`, and the duplicate share in
    * ppm (integer-exact). */
  def stats(docs: DataFrame, idCol: String, textCol: String,
      wordsPerLine: Int, dupThreshold: Long = 1L,
      scope: CacheScope = CacheScope.session): DataFrame = {
    // the line table feeds BOTH the occurrence aggregation and the join
    // probe — retained so the scan+chunk pipeline runs once
    val l = scope.retain(lines(docs, idCol, textCol, wordsPerLine)
      .withColumn("fp", md5(col("line"))))
    val lineDf = l.groupBy(col("fp")).agg(count(lit(1)).as("line_df"))
    l.join(lineDf, Seq("fp"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("line_df") > dupThreshold, 1L).otherwise(0L))
          .as("n_dup_lines"))
      .withColumn("dup_ppm",
        expr("CAST(n_dup_lines * 1000000 DIV n_lines AS BIGINT)"))
  }

  /** Per-document reassembly of surviving (idCol, line_no, line) rows:
    * (idCol, cleaned_text, n_lines_kept). Original line order is kept
    * via an in-group sort of (line_no, line) structs — deterministic
    * regardless of partitioning. Shared by [[removeCommonLines]] and
    * [[QualityFilter.cleanLines]] (one keyed shuffle each). */
  private[operators] def reassemble(keptLines: DataFrame,
      idCol: String): DataFrame =
    keptLines
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("line_no"), col("line"))).as("__kept"))
      .select(col(idCol),
        expr("array_join(transform(array_sort(__kept), x -> x.line), ' ')")
          .as("cleaned_text"),
        size(col("__kept")).as("n_lines_kept"))

  /** Documents with their over-represented lines removed (every copy of
    * a line whose corpus count exceeds `dupThreshold` is dropped, the
    * RefinedWeb treatment). */
  def removeCommonLines(docs: DataFrame, idCol: String, textCol: String,
      wordsPerLine: Int, dupThreshold: Long = 1L,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val l = scope.retain(lines(docs, idCol, textCol, wordsPerLine)
      .withColumn("fp", md5(col("line"))))
    val lineDf = l.groupBy(col("fp")).agg(count(lit(1)).as("line_df"))
    reassemble(
      l.join(lineDf, Seq("fp")).filter(col("line_df") <= dupThreshold),
      idCol)
  }
}
