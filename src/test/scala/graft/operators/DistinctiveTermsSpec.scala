package graft.operators

import graft.SparkSpec

class DistinctiveTermsSpec extends SparkSpec {
  import spark.implicits._

  test("terms unique to a group outrank shared vocabulary") {
    val docs = Seq(
      ("pt", "ola mundo imposto imposto"),
      ("pt", "imposto mundo"),
      ("en", "hello world tax"),
      ("en", "world common mundo"))
      .toDF("lang", "text")
    val out = DistinctiveTerms.topTerms(docs, "lang", "text", k = 2)
      .select("lang", "term", "rank").as[(String, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // pt: "imposto" tf=3 unique (score 3*2/1=6) beats shared "mundo"
    // (tf=2, gf=2 -> 2); en: "hello"/"tax"/"common" unique tf=1 score 2,
    // "world" tf=2 gf=1 -> 4 tops
    assert(out("pt").head == "imposto")
    assert(out("en").head == "world")
  }

  test("rank is dense per group, capped at k, ties broken by term") {
    val docs = Seq(("g1", "aaa bbb ccc ddd"), ("g2", "zzz"))
      .toDF("lang", "text")
    val out = DistinctiveTerms.topTerms(docs, "lang", "text", k = 3)
      .select("lang", "term", "rank").as[(String, String, Int)].collect()
    val g1 = out.filter(_._1 == "g1").sortBy(_._3)
    assert(g1.map(_._3).toSeq == Seq(1, 2, 3))
    // all four terms tie on score (tf=1, gf=1): alphabetical wins
    assert(g1.map(_._2).toSeq == Seq("aaa", "bbb", "ccc"))
  }

  test("short tokens and null rows are excluded") {
    val docs = Seq(
      ("g", Some("a bb ccc dddd")), ("g", None),
      (null.asInstanceOf[String], Some("xxxx xxxx")))
      .toDF("lang", "text")
    val out = DistinctiveTerms.topTerms(docs, "lang", "text", k = 10)
      .select("term").as[String].collect().toSet
    assert(out == Set("ccc", "dddd"))
  }

  test("normalization collapses case and whitespace before counting") {
    val docs = Seq(("g", "Foo  FOO\tfoo"), ("h", "bar")).toDF("lang", "text")
    val out = DistinctiveTerms.topTerms(docs, "lang", "text", k = 1)
      .select("lang", "term", "tf").as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("g") == (("foo", 3L)))
  }
}
