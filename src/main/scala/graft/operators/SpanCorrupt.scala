package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** T5-style span corruption — the denoising-objective prep step: mask
  * contiguous token spans, replace each masked run with a numbered
  * sentinel in the input, and emit the (sentinel, original tokens)
  * sequence as the target. Public recipe (Raffel et al., "Exploring the
  * Limits of Transfer Learning", §3.1.4), re-expressed relationally:
  *
  *  - span STARTS are chosen deterministically — a token index starts a
  *    span iff the md5 fold of (doc_id, index) falls under the start
  *    rate. No RNG state: the corruption replays identically across
  *    runs, partitionings, and engines (the md5-decision idiom the
  *    sampling family uses);
  *  - a token is masked iff a start fell within the last `spanLen`
  *    indices — ONE running-max window per doc (overlapping spans merge
  *    into longer runs, exactly like the reference implementation);
  *  - runs are numbered by a cumulative sum of run-opening flags over
  *    the same sort, and both output strings reassemble with an
  *    order-pinned in-row array fold.
  *
  * Work: tokenize → one per-doc window sort → one groupBy. Nothing is
  * corpus-global, so the operator scales with documents.
  */
object SpanCorrupt {

  /** BERT-style masked-language-model corruption (Devlin et al.): ~15%
    * of tokens are selected; of those, 80% become `[MASK]`, 10% are
    * replaced by a random token, 10% stay unchanged — every choice an
    * md5 draw on (doc, position), so the corruption replays identically
    * on any engine/partitioning. The "random" replacement draws from
    * the DOCUMENT'S OWN token array (in-row — a corpus-global vocabulary
    * draw would turn a map-only transform into a join; doc-local
    * replacement is the standard practical compromise and keeps this
    * zero-shuffle). Output: (id, masked, labels, n_tokens, n_selected) —
    * `labels` is the original tokens at selected positions in order. */
  def mlm(docs: DataFrame, idCol: String, textCol: String,
      selectPct: Int = 15): DataFrame = {
    require(selectPct >= 1 && selectPct <= 100, s"bad selectPct=$selectPct")
    val base = docs
      .select(col(idCol),
        split(TextFunctions.normalize(col(textCol)), " ").as("ws"))
      .filter(size(col("ws")) > 0 && element_at(col("ws"), 1) =!= "")
      .withColumn("n", size(col("ws")).cast("long"))
    def fold(tag: String, i: Column): Column =
      conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
        lit(tag), lit(":"), i.cast("string"))), 1, 6), 16, 10).cast("long")
    def sel(i: Column): Column = fold("m1", i) % 100 < selectPct
    val withArrays = base
      .withColumn("masked_arr",
        zip_with(col("ws"), sequence(lit(0L), col("n") - 1L), (tok, i) =>
          when(sel(i),
            when(fold("m2", i) % 10 <= 7, lit("[MASK]"))
              .when(fold("m2", i) % 10 === 8,
                element_at(col("ws"), (fold("m3", i) % col("n") + 1).cast("int")))
              .otherwise(tok))
            .otherwise(tok)))
      .withColumn("label_arr",
        filter(zip_with(col("ws"), sequence(lit(0L), col("n") - 1L),
          (tok, i) => when(sel(i), tok)), t => t.isNotNull))
    withArrays.select(col(idCol),
      array_join(col("masked_arr"), " ").as("masked"),
      array_join(col("label_arr"), " ").as("labels"),
      col("n").as("n_tokens"),
      size(col("label_arr")).cast("long").as("n_selected"))
  }

  /** Fill-in-the-middle transform (Bavarian et al., "Efficient Training
    * of Language Models to Fill in the Middle"): split each document's
    * token stream at two deterministic md5-drawn cut points and emit the
    * PSM rendering `<PRE> prefix <SUF> suffix <MID> middle`. Entirely
    * map-side — in-row array slicing, no window, no shuffle — so it
    * composes freely after curation at any scale. Cut draws:
    * c1 uniform on [0, n], c2 uniform on [c1, n] (empty prefix, middle,
    * or suffix are all legal, as in the reference recipe). Documents
    * whose normalized text is empty are dropped. */
  def fim(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def fold(tag: String): Column =
      conv(substring(md5(concat(col(idCol).cast("string"), lit(tag))),
        1, 6), 16, 10).cast("long")
    val base = docs
      .select(col(idCol),
        split(TextFunctions.normalize(col(textCol)), " ").as("ws"))
      .filter(size(col("ws")) > 0 && element_at(col("ws"), 1) =!= "")
      .withColumn("n", size(col("ws")).cast("long"))
      .withColumn("c1", fold(":f1") % (col("n") + 1))
      .withColumn("c2", col("c1") + fold(":f2") % (col("n") - col("c1") + 1))
    base.select(col(idCol), col("n").as("n_tokens"), col("c1"), col("c2"),
      concat(lit("<PRE> "),
        array_join(slice(col("ws"), lit(1), col("c1").cast("int")), " "),
        lit(" <SUF> "),
        array_join(slice(col("ws"), (col("c2") + 1).cast("int"),
          (col("n") - col("c2")).cast("int")), " "),
        lit(" <MID> "),
        array_join(slice(col("ws"), (col("c1") + 1).cast("int"),
          (col("c2") - col("c1")).cast("int")), " ")).as("fim"))
  }

  /** (doc_id, corrupted, target, n_tokens, n_masked) per document.
    * `startDenom`: a span starts at ~1/startDenom of token positions
    * (default 20 → 5% starts × spanLen 3 ≈ 15% masked). Sentinels
    * render as `<extra_id_K>`, K 0-based per document. */
  def corrupt(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 3, startDenom: Int = 20): DataFrame = {
    require(spanLen >= 1 && startDenom >= 1,
      s"bad spanLen=$spanLen startDenom=$startDenom")
    val toks = docs.select(col(idCol),
        posexplode(split(TextFunctions.normalize(col(textCol)), " "))
          .as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val fold = conv(substring(md5(
        concat(col(idCol).cast("string"), lit(":"), col("pos").cast("string"))),
      1, 6), 16, 10).cast("long")
    val isStart = (fold % startDenom === 0).cast("int")
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val nearWin = byDoc.rowsBetween(-(spanLen - 1), Window.currentRow)
    val runWin = byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = toks
      .withColumn("start", isStart)
      // token positions are dense (posexplode), so the ROWS frame is
      // exactly the last spanLen indices
      .withColumn("masked", max(col("start")).over(nearWin) === 1)
      .withColumn("opens",
        (col("masked") &&
          coalesce(!lag(col("masked"), 1).over(byDoc), lit(true))).cast("int"))
      .withColumn("k", sum(col("opens")).over(runWin) - 1)
    val sentinel = concat(lit("<extra_id_"), col("k").cast("string"), lit(">"))
    val srcPiece = when(!col("masked"), col("tok"))
      .when(col("opens") === 1, sentinel)
    val tgtPiece = when(col("opens") === 1, concat(sentinel, lit(" "), col("tok")))
      .when(col("masked"), col("tok"))
    def assemble(piece: Column): Column =
      concat_ws(" ", filter(
        transform(array_sort(collect_list(struct(col("pos"), piece.as("p")))),
          x => x.getField("p")),
        p => p.isNotNull))
    flagged.groupBy(col(idCol))
      .agg(assemble(srcPiece).as("corrupted"),
        assemble(tgtPiece).as("target"),
        count(lit(1)).as("n_tokens"),
        count_if(col("masked")).as("n_masked"))
  }
}
