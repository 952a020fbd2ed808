package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions

/** Domain-level curation over a crawl corpus: registrable-domain rollup,
  * blocklist exclusion, and per-domain document quotas.
  *
  * These are the three levers every web-scale training-data pipeline
  * pulls first (C4, Gopher/MassiveWeb, RefinedWeb all document them):
  * count what each domain contributes, drop domains on a deny list, and
  * cap any single domain's share so one boilerplate-heavy site cannot
  * dominate the training mix.
  *
  * Scale shapes: the blocklist is tiny by construction (thousands of
  * rows) so exclusion is a broadcast LEFT ANTI join — no shuffle of the
  * corpus; the rollup is one partial-aggregated groupBy; the quota cap
  * is one window ranked by a deterministic tiebreak, i.e. a single
  * shuffle on the domain key. Nothing here touches the driver.
  */
object DomainOps {

  /** Attach `host` and registrable `domain` columns derived from
    * `urlCol` (codegen'd built-ins only — see [[UrlFunctions]]). */
  def withDomain(df: DataFrame, urlCol: String): DataFrame = {
    val h = UrlFunctions.host(col(urlCol))
    df.withColumn("host", h)
      .withColumn("domain", UrlFunctions.registrableDomain(h))
  }

  /** [[withDomain]] against a DATA-DRIVEN public-suffix table: the full
    * publicsuffix.org snapshot (~9k multi-label rules) loads as a
    * DataFrame with one `suffix` row per rule ("co.uk",
    * "pvt.k12.ma.us") — production crawls swap
    * [[UrlFunctions.DefaultMultiPartSuffixes]]'s compiled-in subset for
    * the real list WITHOUT a rebuild, and the list stays data (refresh
    * = reload, not redeploy).
    *
    * Mechanism: for k = 2..`maxSuffixLabels` the host's last-k-label
    * candidate broadcast-LEFT-joins the (deduplicated) suffix table;
    * the longest match wins and the registrable domain is that suffix
    * plus one preceding label; no match falls back to the last two
    * labels — the PSL's implicit single-label-TLD rule, identical to
    * [[UrlFunctions.registrableDomain]]'s fallback. All joins are
    * broadcast, so the corpus is annotated map-side with ZERO shuffle.
    * PSL wildcard ("*.ck") and exception ("!www.ck") rules are out of
    * scope — expand them into plain rows when loading the list. */
  def withDomainFromSuffixes(df: DataFrame, urlCol: String,
      suffixes: DataFrame, maxSuffixLabels: Int = 4): DataFrame = {
    require(maxSuffixLabels >= 2 && maxSuffixLabels <= 8,
      s"maxSuffixLabels out of range: $maxSuffixLabels")
    val labels = col("__labels")
    def lastLabels(m: Int) = concat_ws(".", slice(labels, -m, m))
    val base = df
      .withColumn("host", UrlFunctions.host(col(urlCol)))
      .withColumn("__labels", split(col("host"), "\\."))
    val ks = (2 to maxSuffixLabels).reverse // longest candidate first
    val joined = ks.foldLeft(base) { (acc, k) =>
      val sfx = suffixes.select(col("suffix").as(s"__sfx$k")).distinct()
      // candidate needs k suffix labels PLUS one registrable label
      val cand = when(size(labels) >= k + 1, lastLabels(k))
      acc.join(broadcast(sfx), cand === col(s"__sfx$k"), "left")
    }
    // Fold ASCENDING so the largest-k `when` ends up OUTERMOST: the
    // longest matched suffix must win (PSL prevailing-rule semantics),
    // e.g. 'school.pvt.k12.ma.us' with rules {ma.us, pvt.k12.ma.us}
    // yields 'school.pvt.k12.ma.us', not 'k12.ma.us'.
    val domain = (2 to maxSuffixLabels).foldLeft(
      // fallback: implicit single-label TLD -> last two labels
      when(size(labels) >= 2, lastLabels(2)).otherwise(lit(""))) {
      (fallback, k) =>
        when(col(s"__sfx$k").isNotNull, lastLabels(k + 1)).otherwise(fallback)
    }
    joined.withColumn("domain", domain)
      .drop("__labels" +: ks.map(k => s"__sfx$k"): _*)
  }

  /** Drop rows whose `domainCol` is on the blocklist. The blocklist is
    * broadcast (it is a curated deny list, small by nature), so the
    * corpus is filtered map-side with zero shuffle. */
  def blocklistFilter(
      df: DataFrame, domainCol: String, blocked: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val deny = blocked.toDF(domainCol)
    df.join(broadcast(deny), Seq(domainCol), "left_anti")
  }

  /** Per-domain contribution rollup: document count and total
    * characters. One partial-agg shuffle on the domain key. */
  def domainStats(
      df: DataFrame, domainCol: String, charsCol: String): DataFrame =
    df.groupBy(col(domainCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(charsCol)).cast("long").as("sum_chars"))

  /** Cap each domain at `maxDocs` documents, keeping the TOP `maxDocs`
    * by `orderCol` DESCENDING (highest score/longest first;
    * deterministic ascending tiebreak on `idCol`). One window shuffle
    * on the domain key; no global sort. */
  def domainQuota(
      df: DataFrame, domainCol: String, maxDocs: Int,
      orderCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(orderCol).desc, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxDocs)
      .drop("__rn")
  }
}
