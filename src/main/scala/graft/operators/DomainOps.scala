package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    *
    * All three PSL rule classes are supported in the one `suffix`
    * column, in the list's own syntax:
    *   - plain rules ("co.uk"): the suffix is public; registrable =
    *     suffix + one label;
    *   - wildcard rules ("*.ck"): ANY label in the starred position is
    *     public (effective rule length = base + 1); registrable =
    *     base + two labels;
    *   - exception rules ("!www.ck"): the named domain is registrable
    *     ITSELF, overriding any wildcard/plain rule it matches.
    * Prevailing-rule order (publicsuffix.org algorithm): exception
    * first, then the LONGEST effective match, then the implicit
    * single-label-TLD fallback. */
  def withDomainFromSuffixes(df: DataFrame, urlCol: String,
      suffixes: DataFrame, maxSuffixLabels: Int = 4): DataFrame = {
    require(maxSuffixLabels >= 2 && maxSuffixLabels <= 8,
      s"maxSuffixLabels out of range: $maxSuffixLabels")
    val labels = col("__labels")
    def lastLabels(m: Int) = concat_ws(".", slice(labels, -m, m))
    def nLabels(c: Column) = size(split(c, "\\."))
    val rules = suffixes.select(col("suffix").cast("string").as("suffix"))
    val base = df
      .withColumn("host", UrlFunctions.host(col(urlCol)))
      .withColumn("__labels", split(col("host"), "\\."))
    val ks = 2 to maxSuffixLabels          // plain rule lengths
    val ws = 1 until maxSuffixLabels       // wildcard BASE lengths
    val withPlain = ks.foldLeft(base) { (acc, k) =>
      val sfx = rules
        .filter(!col("suffix").startsWith("*.") &&
          !col("suffix").startsWith("!") && nLabels(col("suffix")) === k)
        .select(col("suffix").as(s"__sfx$k")).distinct()
      // candidate needs k suffix labels PLUS one registrable label
      val cand = when(size(labels) >= k + 1, lastLabels(k))
      acc.join(broadcast(sfx), cand === col(s"__sfx$k"), "left")
    }
    val withWild = ws.foldLeft(withPlain) { (acc, m) =>
      val wld = rules.filter(col("suffix").startsWith("*."))
        .select(expr("substring(suffix, 3)").as(s"__wld$m"))
        .filter(nLabels(col(s"__wld$m")) === m).distinct()
      // base m labels + the wildcard label + one registrable label
      val cand = when(size(labels) >= m + 2, lastLabels(m))
      acc.join(broadcast(wld), cand === col(s"__wld$m"), "left")
    }
    val joined = ks.foldLeft(withWild) { (acc, e) =>
      val exc = rules.filter(col("suffix").startsWith("!"))
        .select(expr("substring(suffix, 2)").as(s"__exc$e"))
        .filter(nLabels(col(s"__exc$e")) === e).distinct()
      // the exception rule itself is registrable — no extra label needed
      val cand = when(size(labels) >= e, lastLabels(e))
      acc.join(broadcast(exc), cand === col(s"__exc$e"), "left")
    }
    // Fold ASCENDING by EFFECTIVE rule length so the longest match ends
    // up OUTERMOST (PSL prevailing-rule semantics): a plain rule of k
    // labels and a wildcard of base k-1 have the same effective length k
    // and, when both match, the same registrable answer. Exceptions go
    // on top of everything.
    val byLength = (2 to maxSuffixLabels).foldLeft(
      // fallback: implicit single-label TLD -> last two labels
      when(size(labels) >= 2, lastLabels(2)).otherwise(lit(""))) {
      (fallback, len) =>
        val plainHit = col(s"__sfx$len").isNotNull
        val wildHit = col(s"__wld${len - 1}").isNotNull
        when(plainHit || wildHit, lastLabels(len + 1)).otherwise(fallback)
    }
    val domain = ks.foldLeft(byLength) { (inner, e) =>
      when(col(s"__exc$e").isNotNull, lastLabels(e)).otherwise(inner)
    }
    joined.withColumn("domain", domain)
      .drop("__labels" +: (ks.map(k => s"__sfx$k") ++
        ws.map(m => s"__wld$m") ++ ks.map(e => s"__exc$e")): _*)
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
