package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[DomainOps.withDomainFromSuffixes]]' PSL prevailing-rule
  * semantics: among the candidate suffixes a host matches, the LONGEST
  * one wins, and the registrable domain is that suffix plus one label.
  */
class DomainOpsSpec extends SparkSpec {
  import spark.implicits._

  private val suffixes = Seq(
    "co.uk", "blogspot.co.uk", "ma.us", "k12.ma.us", "pvt.k12.ma.us",
    "gov.br").toDF("suffix")

  private def domains(urls: String*): Map[String, String] = {
    val df = urls.toDF("url")
    DomainOps.withDomainFromSuffixes(df, "url", suffixes, maxSuffixLabels = 4)
      .select(col("url"), col("domain"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
  }

  test("longest matched suffix wins over nested shorter rules") {
    val d = domains(
      "https://school.pvt.k12.ma.us/page",
      "https://cityhall.ma.us/page",
      "https://district.k12.ma.us/page")
    // pvt.k12.ma.us (4 labels) must beat k12.ma.us and ma.us
    assert(d("https://school.pvt.k12.ma.us/page") === "school.pvt.k12.ma.us")
    assert(d("https://cityhall.ma.us/page") === "cityhall.ma.us")
    assert(d("https://district.k12.ma.us/page") === "district.k12.ma.us")
  }

  test("private-registry style rule beats its parent suffix") {
    val d = domains(
      "https://myblog.blogspot.co.uk/post",
      "https://www.myblog.blogspot.co.uk/post",
      "https://example.co.uk/page")
    assert(d("https://myblog.blogspot.co.uk/post") === "myblog.blogspot.co.uk")
    // an extra label still resolves to suffix + one label
    assert(d("https://www.myblog.blogspot.co.uk/post") === "myblog.blogspot.co.uk")
    assert(d("https://example.co.uk/page") === "example.co.uk")
  }

  test("host that IS a public suffix falls back to the last two labels") {
    // documented contract: identical to registrableDomain's fallback
    // (no null registrable domain; the last-2-label heuristic applies)
    val d = domains("https://co.uk/", "https://pvt.k12.ma.us/")
    assert(d("https://co.uk/") === "co.uk")
    // 4-label host cannot supply suffix(4)+1 labels; longest match with
    // room for a registrable label is k12.ma.us -> pvt.k12.ma.us
    assert(d("https://pvt.k12.ma.us/") === "pvt.k12.ma.us")
  }

  test("single-label TLD falls back to last two labels; short hosts to empty") {
    val d = domains(
      "https://deep.sub.example.com/a",
      "https://example.org/",
      "https://localhost/")
    assert(d("https://deep.sub.example.com/a") === "example.com")
    assert(d("https://example.org/") === "example.org")
    assert(d("https://localhost/") === "")
  }

  test("wildcard rules: any label in the starred position is public") {
    val rules = Seq("*.ck", "co.uk").toDF("suffix")
    val df = Seq(
      "https://www.site.bar.ck/x",   // *.ck -> bar.ck public -> site.bar.ck
      "https://foo.bar.ck/x",        // foo.bar.ck registrable
      "https://bar.ck/x",            // IS a wildcard public suffix -> fallback
      "https://a.b.example.co.uk/x") // plain rule still wins its own hosts
      .toDF("url")
    val got = DomainOps.withDomainFromSuffixes(df, "url", rules)
      .select("url", "domain").as[(String, String)].collect().toMap
    assert(got("https://www.site.bar.ck/x") === "site.bar.ck")
    assert(got("https://foo.bar.ck/x") === "foo.bar.ck")
    assert(got("https://bar.ck/x") === "bar.ck") // documented last-2 fallback
    assert(got("https://a.b.example.co.uk/x") === "example.co.uk")
  }

  test("exception rules override wildcards: the named domain is registrable") {
    val rules = Seq("*.ck", "!www.ck").toDF("suffix")
    val got = DomainOps.withDomainFromSuffixes(
      Seq("https://www.ck/x", "https://sub.www.ck/x", "https://foo.bar.ck/x")
        .toDF("url"), "url", rules)
      .select("url", "domain").as[(String, String)].collect().toMap
    // !www.ck: www.ck is registrable ITSELF, wherever it matches
    assert(got("https://www.ck/x") === "www.ck")
    assert(got("https://sub.www.ck/x") === "www.ck")
    // hosts the exception does NOT match still follow the wildcard
    assert(got("https://foo.bar.ck/x") === "foo.bar.ck")
  }

  test("wildcard and plain rules of equal effective length agree") {
    // *.ck (effective length 2) and plain co.ck both match x.co.ck and
    // must yield the same registrable domain
    val rules = Seq("*.ck", "co.ck").toDF("suffix")
    val got = DomainOps.withDomainFromSuffixes(
      Seq("https://x.co.ck/").toDF("url"), "url", rules)
      .select("domain").as[String].head()
    assert(got === "x.co.ck")
  }

  test("matches compiled-in registrableDomain on its own suffix subset") {
    val compiled = graft.functions.UrlFunctions.DefaultMultiPartSuffixes
      .toDF("suffix")
    val df = Seq(
      "https://www.bbc.co.uk/news",
      "https://a.b.site.gov.br/x",
      "https://deep.sub.example.com/y").toDF("url")
    val got = DomainOps
      .withDomainFromSuffixes(df, "url", compiled, maxSuffixLabels = 2)
      .select("url", "domain").as[(String, String)].collect().toMap
    assert(got("https://www.bbc.co.uk/news") === "bbc.co.uk")
    assert(got("https://a.b.site.gov.br/x") === "site.gov.br")
    assert(got("https://deep.sub.example.com/y") === "example.com")
  }
}
