package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multinomial Naive Bayes over whitespace tokens: the classical
  * trainable text classifier, as two corpus passes — the quality-score
  * and routing workhorse of LLM-data curation (FastText-style lang/
  * quality gates are NB-shaped linear models over token counts).
  * Tokenization matches [[NgramLm]]/[[TfIdf]] (collapse whitespace,
  * lowercase, split on space) so models compose across the text
  * family.
  *
  * Exactness: every per-token log-likelihood ln((c+1)/(n_l+V)) and
  * each class prior ln(d_l/d) is ONE libm call on a fixed-shape double
  * ratio of exact integers, rounded into DECIMAL(20,12) (the
  * [[NgramLm]] discipline) — so document scores are exact decimal sums
  * (order-independent) and the argmax is a comparison of exact
  * decimals with a deterministic label tie-break.
  *
  * Scale shape: training is one token-keyed aggregation; the smoothed
  * (token, label) grid is vocabulary×classes — built by a BROADCAST of
  * the class-total row set onto the distinct-token table, never a
  * corpus-sized cross. Scoring joins doc tokens to the grid ON THE
  * TOKEN KEY (vocabulary-sized side → shuffle hash join, never
  * broadcast — the TfIdf rule), multiplying rows by |classes| (small,
  * bounded). Unseen tokens at inference fall back to the class's
  * smoothing floor via the left join's coalesce. */
object NaiveBayes {

  private def toks(df: DataFrame, idCols: Seq[String], textCol: String) =
    df.filter(col(textCol).isNotNull)
      .select(idCols.map(col) :+
        explode(split(TextFunctions.normalize(col(textCol)), " "))
          .as("__w"): _*)
      .filter(col("__w") =!= "")

  /** Smoothed per-(token, label) log-likelihood grid: (token, label,
    * lp DECIMAL(20,12)), plus the label priors and smoothing floors as
    * companion frames. Exposed for reuse; most callers want
    * [[classify]]. */
  def model(docs: DataFrame, labelCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val base = docs.filter(col(labelCol).isNotNull &&
      col(textCol).isNotNull)
    modelFromTokens(base, toks(base, Seq(labelCol), textCol),
      labelCol)
  }

  /** Model from an ALREADY-TOKENIZED frame — the one-tokenization path
    * [[classify]] uses so train and score share a single (cached)
    * explode of the corpus instead of re-scanning it. `docs` supplies
    * only the pruned document counts for the priors. */
  private def modelFromTokens(docs: DataFrame, tokAll: DataFrame,
      labelCol: String): (DataFrame, DataFrame) = {
    val base = docs
    val tok = tokAll.filter(col(labelCol).isNotNull)
    val classTok = tok.groupBy(col(labelCol), col("__w"))
      .agg(count(lit(1)).as("__c"))
    val classTot = classTok.groupBy(col(labelCol))
      .agg(sum(col("__c")).cast("long").as("__nl"))
    val vocab = classTok.select(col("__w")).distinct()
    val v = vocab.agg(count(lit(1)).as("__v"))
    // priors from DOCUMENT counts (multinomial NB convention)
    val docsPerClass = base.groupBy(col(labelCol))
      .agg(count(lit(1)).as("__dl"))
    val docsTotal = base.agg(count(lit(1)).as("__d"))
    val priors = docsPerClass.crossJoin(broadcast(docsTotal))
      .select(col(labelCol),
        log(col("__dl").cast("double") / col("__d").cast("double"))
          .cast("decimal(20,12)").as("prior"),
        col("__dl"))
    val grid = vocab
      .crossJoin(broadcast(classTot))
      .crossJoin(broadcast(v)) // one row — a broadcast scalar, fully lazy
      .join(classTok, Seq("__w", labelCol), "left")
      .select(col("__w").as("token"), col(labelCol),
        log((coalesce(col("__c"), lit(0L)) + 1).cast("double") /
          (col("__nl") + col("__v")).cast("double"))
          .cast("decimal(20,12)").as("lp"),
        log(lit(1.0) /
          (col("__nl") + col("__v")).cast("double"))
          .cast("decimal(20,12)").as("lp_unseen"))
    (grid, priors)
  }

  /** Self-train on `docs` (labelCol) and classify every row with text:
    * (id columns…, label, pred, score, n_tokens). `score` is the
    * winning class's exact decimal log-posterior rendered as double.
    * Ties break toward the LARGER label (exact-decimal struct max —
    * deterministic, oracle-replayable). */
  def classify(docs: DataFrame, idCol: String, labelCol: String,
      textCol: String,
      scope: graft.core.CacheScope = graft.core.CacheScope.session)
      : DataFrame = {
    // ONE tokenization of the corpus, cached: the training counts and
    // the scoring join both read it (the plan otherwise re-explodes
    // the text for every derived aggregate — 7 corpus scans at sf, a
    // non-starter at 100 TB).
    val tok = scope.retain(toks(docs, Seq(idCol, labelCol), textCol))
    val (grid, priors) = modelFromTokens(
      docs.filter(col(labelCol).isNotNull && col(textCol).isNotNull),
      tok, labelCol)
    val gridL = grid.withColumnRenamed(labelCol, "__label")
    val priorsL = priors.withColumnRenamed(labelCol, "__label")
    val scored = tok
      .join(gridL.select(col("token"), col("__label"), col("lp")),
        tok("__w") === gridL("token"))
      .groupBy(col(idCol), col(labelCol), col("__label"))
      .agg(sum(col("lp")).as("__sum"), count(lit(1)).as("__nt"))
      .join(broadcast(priorsL.select(col("__label"), col("prior"))),
        Seq("__label"))
      .select(col(idCol), col(labelCol), col("__label"), col("__nt"),
        (col("prior") + col("__sum")).as("__score"))
    scored.groupBy(col(idCol), col(labelCol))
      .agg(max(struct(col("__score"), col("__label"), col("__nt")))
        .as("__best"))
      .select(col(idCol), col(labelCol),
        col("__best.__label").as("pred"),
        col("__best.__score").cast("double").as("score"),
        col("__best.__nt").cast("long").as("n_tokens"))
  }
}
