package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.Quantize

/** LineDedup, RareTokens, and Quantize — the curation-signal operators
  * beyond the driver oracles: removal semantics, ordering determinism,
  * quantization error bounds. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // docs 1 and 2 share their first 3-word line (boilerplate); doc 3 is
    // unique; doc 4 repeats a line INSIDE itself
    (1L, "all rights reserved alpha beta gamma"),
    (2L, "all rights reserved delta epsilon zeta"),
    (3L, "eta theta iota kappa lambda mu"),
    (4L, "nu xi omicron nu xi omicron")
  ).toDF("doc_id", "text")

  test("LineDedup.lines chunks the token stream with a partial last line") {
    val l = LineDedup.lines(docs.filter($"doc_id" === 1), "doc_id", "text", 4)
      .orderBy("line_no").select("line").as[String].collect().toSeq
    assert(l == Seq("all rights reserved alpha", "beta gamma"))
  }

  test("LineDedup.stats counts corpus-repeated lines per document") {
    val s = LineDedup.stats(docs, "doc_id", "text", 3)
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_dup_lines").as[(Long, Long, Long)]
      .collect().toSeq
    // 3-word lines: docs 1/2 share "all rights reserved"; doc 4's two
    // lines are copies of each other (within-doc duplication counts too)
    assert(s == Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 0L), (4L, 2L, 2L)))
  }

  test("LineDedup.removeCommonLines drops every copy, keeps line order") {
    val cleaned = LineDedup.removeCommonLines(docs, "doc_id", "text", 3)
      .orderBy("doc_id")
      .select("doc_id", "cleaned_text").as[(Long, String)].collect().toSeq
    assert(cleaned == Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta"),
      (3L, "eta theta iota kappa lambda mu")))
    // doc 4 loses every line -> absent from the grouped result (a caller
    // left-joins to keep empty documents)
  }

  test("RepeatedSpans merges consecutive duplicated shingles into maximal spans") {
    // docs 1 and 2 share the 6-word run "one two three four five six" at
    // different offsets; with 3-gram shingles that is 4 consecutive
    // duplicated starts -> one span of 6 words each. The surrounding
    // words are unique, so no other span appears.
    val d = Seq(
      (1L, "one two three four five six p q r s"),
      (2L, "x y one two three four five six z w")
    ).toDF("doc_id", "text")
    val s = RepeatedSpans.spans(d, "doc_id", "text", n = 3, minWords = 4)
      .orderBy("doc_id")
      .select("doc_id", "span_start", "span_words")
      .as[(Long, Int, Long)].collect().toSeq
    assert(s == Seq((1L, 0, 6L), (2L, 2, 6L)))
    // a higher floor filters the span out entirely
    assert(RepeatedSpans.spans(d, "doc_id", "text", n = 3, minWords = 7)
      .count() == 0)
  }

  test("RepeatedSpans counts within-document repetition as duplication") {
    val d = Seq((1L, "a b c a b c z")).toDF("doc_id", "text")
    // 3-gram "a b c" occurs at pos 0 and 3 in the same doc -> both are
    // duplicated starts but NOT consecutive, so two 3-word spans
    val s = RepeatedSpans.spans(d, "doc_id", "text", n = 3, minWords = 3)
      .orderBy("span_start")
      .select("span_start", "span_words").as[(Int, Long)].collect().toSeq
    assert(s == Seq((0, 3L), (3, 3L)))
  }

  test("RepeatedSpans.removeSpans excises span words, keeps every document") {
    val d = Seq(
      (1L, "one two three four five six p q r s"),
      (2L, "x y one two three four five six z w"),
      (3L, "totally unique words only here"),
      (4L, "one two three four five six"),  // fully covered by its span
      (5L, null.asInstanceOf[String])       // null text
    ).toDF("doc_id", "text")
    val cleaned = RepeatedSpans.exciseSpans(d, "doc_id", "text",
        n = 3, minWords = 4)
      .orderBy("doc_id")
      .select("doc_id", "cleaned_text", "n_words_kept")
      .as[(Long, String, Long)].collect().toSeq
    assert(cleaned == Seq(
      (1L, "p q r s", 4L),
      (2L, "x y z w", 4L),
      (3L, "totally unique words only here", 5L),
      (4L, "", 0L),    // fully-excised doc survives as an empty string
      (5L, "", 0L)))   // as does a null-text doc
  }

  test("RepeatedSpans.removeSpans handles overlapping spans") {
    val d = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val spans = Seq((1L, 0, 3L), (1L, 2, 3L)).toDF(
      "doc_id", "span_start", "span_words")
    val cleaned = RepeatedSpans.removeSpans(d, "doc_id", "text", spans)
      .select("cleaned_text", "n_words_kept")
      .as[(String, Long)].collect().toSeq
    // positions 0-2 and 2-4 covered -> only "f" (pos 5) survives
    assert(cleaned == Seq(("f", 1L)))
  }

  test("RareTokens.rarity matches a hand computation") {
    val tiny = Seq(
      (1L, "a a b"),   // a x2, b
      (2L, "a c")      // a, c
    ).toDF("doc_id", "text")
    // corpus counts: a=3, b=1, c=1
    val r = RareTokens.rarity(tiny, "doc_id", "text", rareBelow = 2L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "sum_df", "min_df", "n_rare")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, 3L, 7L, 1L, 1L),  // 3+3+1; min 1; b is rare
      (2L, 2L, 4L, 1L, 1L))) // 3+1; min 1; c is rare
  }

  test("int8 quantization: values bounded, dequantization error bounded") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(100)
    val q = Quantize.int8(e, "vec_id", "embedding")
    val checked = q.select(
      expr("aggregate(quant, TRUE, (ok, v) -> ok AND abs(v) <= 127)")
        .as("bounded"),
      // |x - q*amax/127| <= amax/254 + eps (half-step rounding bound)
      expr("""aggregate(zip_with(embedding, quant,
             |  (x, v) -> abs(CAST(x AS DOUBLE) - v * amax / 127.0)
             |            <= amax / 254.0 + 1e-12),
             |TRUE, (ok, b) -> ok AND b)""".stripMargin).as("tight"))
    assert(checked.filter(!col("bounded") || !col("tight")).count() == 0)
  }

  test("quantized dot product approximates the exact cosine ranking") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = Quantize.int8(e, "vec_id", "embedding")
    val a = q.filter($"vec_id" < 5)
      .select($"vec_id".as("qa_id"), $"quant".as("qa"), $"amax".as("sa"),
        $"embedding".as("va"))
    val b = q.filter($"vec_id" >= 5 && $"vec_id" < 55)
      .select($"vec_id".as("qb_id"), $"quant".as("qb"), $"amax".as("sb"),
        $"embedding".as("vb"))
    val pairs = a.crossJoin(b).select(
      Quantize.dequantizedDot($"qa", $"qb", $"sa", $"sb").as("approx"),
      expr("""aggregate(zip_with(va, vb,
             |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
             |CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
        .as("exact"))
    // int8 keeps absolute dot error within the quantization-noise bound
    // for unit-ish vectors; 0.05 is loose but catches sign/scale bugs
    val bad = pairs.filter(abs($"approx" - $"exact") > 0.05).count()
    assert(bad == 0)
  }
}
