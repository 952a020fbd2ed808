package graft.operators

import graft.SparkSpec

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("hub words outrank peripheral ones") {
    // "data" is adjacent to many distinct words; "unique" to one
    val docs = Seq(
      "data quality", "data pipeline", "data model", "data lake",
      "quality pipeline", "unique data").toDF("text")
    val out = TextRank.keywords(docs, "text", iters = 4, topK = 10)
      .select("token", "pos").as[(String, Long)].collect().toMap
    assert(out("data") === 1L, s"hub must rank first: $out")
    assert(out("unique") > out("quality"))
  }

  test("self-loops and blanks never enter the graph") {
    val docs = Seq("echo echo echo", "   ", "a b").toDF("text")
    val out = TextRank.keywords(docs, "text", iters = 2, topK = 10)
      .select("token").as[String].collect().toSet
    // "echo echo" bigrams are self-loops → dropped; echo is isolated
    assert(out === Set("a", "b"))
  }

  test("topK truncation is deterministic under rank ties") {
    // a-b and c-d are isomorphic components → identical ranks; the
    // token tie-break must order them alphabetically
    val docs = Seq("a b", "c d").toDF("text")
    val out = TextRank.keywords(docs, "text", iters = 3, topK = 3)
      .select("pos", "token").as[(Long, String)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq === Seq("a", "b", "c"))
  }
}
