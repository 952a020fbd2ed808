package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.DomainOps

class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(url: String, c: org.apache.spark.sql.Column): String = {
    val r = Seq(url).toDF("url").select(c.as("v")).collect().head
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("host extracts and lower-cases the authority") {
    assert(one("https://WWW.Example.COM/a?b=1",
      UrlFunctions.host(col("url"))) === "www.example.com")
    assert(one("http://site.co.uk", UrlFunctions.host(col("url"))) === "site.co.uk")
  }

  test("path and query split at the right boundaries") {
    assert(one("https://h.com/a/b?q=1#f",
      UrlFunctions.path(col("url"))) === "/a/b")
    assert(one("https://h.com/a/b?q=1#f",
      UrlFunctions.query(col("url"))) === "q=1")
    assert(one("https://h.com", UrlFunctions.path(col("url"))) === "")
  }

  test("registrableDomain keeps three labels on multi-part suffixes, two otherwise") {
    def dom(h: String) = {
      val r = Seq(h).toDF("h")
        .select(UrlFunctions.registrableDomain(col("h")).as("v"))
        .collect().head
      r.getString(0)
    }
    assert(dom("www.bbc.co.uk") === "bbc.co.uk")
    assert(dom("a.b.site.gov.br") === "site.gov.br")
    assert(dom("deep.sub.example.com") === "example.com")
    assert(dom("example.org") === "example.org")
    assert(dom("localhost") === "")            // no registrable boundary
  }

  test("stripTracking drops utm/gclid/fbclid wherever they sit") {
    val s = (u: String) => one(u, UrlFunctions.stripTracking(col("url")))
    // leading tracking param: '?' survives for the kept param
    assert(s("https://h.com/p?utm_source=x&id=5") === "https://h.com/p?id=5")
    // trailing tracking param
    assert(s("https://h.com/p?id=5&utm_medium=y") === "https://h.com/p?id=5")
    // tracking-only query: separator disappears entirely
    assert(s("https://h.com/p?utm_a=1&utm_b=2") === "https://h.com/p")
    // before a fragment: fragment preserved, separators tidied
    assert(s("https://h.com/p?utm_a=1#sec") === "https://h.com/p#sec")
    // gclid / fbclid variants
    assert(s("https://h.com/p?gclid=abc&x=1&fbclid=z") === "https://h.com/p?x=1")
    // nothing to strip: unchanged
    assert(s("https://h.com/p?x=1&y=2") === "https://h.com/p?x=1&y=2")
    // anchored: a param merely CONTAINING "utm_" is not touched
    assert(s("https://h.com/p?myutm_foo=1&utm_a=2") ===
      "https://h.com/p?myutm_foo=1")
    // leading run of tracking params with a survivor at the end
    assert(s("https://h.com/p?utm_a=1&utm_b=2&id=3") ===
      "https://h.com/p?id=3")
    // idempotent on every vector above
    for (u <- Seq(
        "https://h.com/p?myutm_foo=1&utm_a=2",
        "https://h.com/p?utm_a=1&utm_b=2&id=3",
        "https://h.com/p?utm_source=x&id=5",
        "https://h.com/p?id=5&utm_medium=y",
        "https://h.com/p?utm_a=1&utm_b=2",
        "https://h.com/p?utm_a=1#sec",
        "https://h.com/p?gclid=abc&x=1&fbclid=z",
        "https://h.com/p?x=1&y=2"))
      assert(s(s(u)) === s(u), s"stripTracking not idempotent on $u")
  }

  test("domainQuota keeps exactly maxDocs per domain with deterministic ties") {
    val df = Seq(
      ("a.com", 1L, 10L), ("a.com", 2L, 10L), ("a.com", 3L, 30L),
      ("b.org", 4L, 5L)).toDF("domain", "doc_id", "n_chars")
    val kept = DomainOps.domainQuota(df, "domain", maxDocs = 2,
      orderCol = "n_chars", idCol = "doc_id")
      .select("doc_id").as[Long].collect().toSet
    // a.com: 30-char doc 3 first, then the n_chars tie broken by doc_id -> 1
    assert(kept === Set(3L, 1L, 4L))
  }

  test("blocklistFilter removes exactly the denied domains") {
    val df = Seq(("a.com", 1L), ("b.org", 2L), ("c.net", 3L))
      .toDF("domain", "doc_id")
    val kept = DomainOps.blocklistFilter(df, "domain", Seq("b.org"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
  }
}
