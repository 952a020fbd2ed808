package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class SpanCorruptSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables
    .load(spark, "/root/testdata/sf0.001", "documents", parallelize = false)
    .limit(60).cache()

  /** Substitute each sentinel in `corrupted` with its span from
    * `target` — must reproduce the normalized original. */
  private def reconstruct(corrupted: String, target: String): String = {
    val spans = target.split("<extra_id_\\d+> ").toSeq
      .filter(_.nonEmpty).map(_.trim)
    var k = 0
    corrupted.split(" ").flatMap { tok =>
      if (tok.matches("<extra_id_\\d+>")) {
        val out = spans(k).split(" ").toSeq; k += 1; out
      } else Seq(tok)
    }.mkString(" ")
  }

  test("sentinel substitution reconstructs the normalized original") {
    val out = SpanCorrupt.corrupt(docs, "doc_id", "text")
      .select("doc_id", "corrupted", "target")
      .as[(Long, String, String)].collect()
    val originals = docs
      .select(col("doc_id"), TextFunctions.normalize(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(out.nonEmpty)
    out.foreach { case (id, corr, tgt) =>
      assert(reconstruct(corr, tgt) == originals(id), s"doc $id")
    }
  }

  test("sentinels number densely from 0 and match between sides") {
    val out = SpanCorrupt.corrupt(docs, "doc_id", "text")
      .select("corrupted", "target").as[(String, String)].collect()
    val re = "<extra_id_(\\d+)>".r
    out.foreach { case (corr, tgt) =>
      val a = re.findAllMatchIn(corr).map(_.group(1).toInt).toSeq
      val b = re.findAllMatchIn(tgt).map(_.group(1).toInt).toSeq
      assert(a == b)
      assert(a == a.indices.toSeq, s"not dense: $a")
    }
  }

  test("fim: PSM parts reassemble to the original; cuts in bounds; " +
    "map-side only") {
    val out = SpanCorrupt.fim(docs, "doc_id", "text")
    val rows = out.select("doc_id", "n_tokens", "c1", "c2", "fim")
      .as[(Long, Long, Long, Long, String)].collect()
    val originals = docs
      .select(col("doc_id"), TextFunctions.normalize(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, c1, c2, fim) =>
      assert(0 <= c1 && c1 <= c2 && c2 <= n, s"doc $id cuts $c1/$c2/$n")
      val m = "(?s)<PRE> (.*) <SUF> (.*) <MID> (.*)".r
      fim match {
        case m(pre, suf, mid) =>
          val joined = Seq(pre, mid, suf).filter(_.nonEmpty).mkString(" ")
          assert(joined == originals(id), s"doc $id")
        case _ => fail(s"bad fim shape for doc $id: $fim")
      }
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"fim must stay map-side:\n$plan")
  }

  test("mlm: token counts align, unselected tokens unchanged, action " +
    "mix near 80/10/10, zero-shuffle plan") {
    val out = SpanCorrupt.mlm(docs, "doc_id", "text")
    val rows = out
      .select("doc_id", "masked", "labels", "n_tokens", "n_selected")
      .as[(Long, String, String, Long, Long)].collect()
    val originals = docs
      .select(col("doc_id"), TextFunctions.normalize(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    var masks = 0L; var changedNonMask = 0L; var selected = 0L
    rows.foreach { case (id, masked, labels, n, nSel) =>
      val orig = originals(id).split(" ")
      val out = masked.split(" ")
      assert(out.length == n && orig.length == n, s"doc $id token count")
      assert(labels.split(" ").count(_.nonEmpty) <= nSel)
      selected += nSel
      orig.zip(out).foreach { case (o, m) =>
        if (m == "[MASK]") masks += 1
        else if (m != o) changedNonMask += 1
      }
    }
    val total = rows.map(_._4).sum
    assert(selected > total * 8 / 100 && selected < total * 25 / 100,
      s"selected $selected of $total")
    // [MASK] ≈ 80% of selections; random-changed ≤ the 10% arm (same-
    // token draws leave it below)
    assert(masks > selected * 6 / 10, s"masks $masks of $selected")
    assert(changedNonMask < selected * 2 / 10,
      s"random-changed $changedNonMask of $selected")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"mlm must stay map-side:\n$plan")
  }

  test("masked fraction sits near the configured rate and is " +
    "partitioning-invariant") {
    val one = SpanCorrupt.corrupt(docs, "doc_id", "text")
      .agg(sum("n_masked").cast("double") / sum("n_tokens").cast("double"))
      .as[Double].collect().head
    assert(one > 0.05 && one < 0.4, s"masked fraction $one")
    val redistributed = SpanCorrupt.corrupt(
        docs.repartition(7), "doc_id", "text")
      .select("doc_id", "corrupted").as[(Long, String)].collect().toMap
    val base = SpanCorrupt.corrupt(docs, "doc_id", "text")
      .select("doc_id", "corrupted").as[(Long, String)].collect().toMap
    assert(redistributed == base)
  }
}
