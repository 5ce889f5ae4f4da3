package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {

  private def canonOf(urls: String*): Seq[(String, String, String)] = {
    import spark.implicits._
    urls.toDF("url")
      .withColumn("canon", UrlOps.canonicalize(col("url")))
      .withColumn("host", UrlOps.host(col("url")))
      .withColumn("rd", UrlOps.registeredDomain(col("host")))
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3))).toSeq
  }

  test("canonicalize: case, default port, fragment, trailing slash, query sort") {
    val Seq((c1, h1, _)) =
      canonOf("HTTP://WWW.Example.COM:80/Articles/9/?utm=x&a=1#top")
    assert(c1 == "http://www.example.com/Articles/9?a=1&utm=x") // path case KEPT
    assert(h1 == "www.example.com")
    // https default port stripped; params already sorted stay put
    assert(canonOf("https://cdn.ex.co.uk:443/a/b/c?a=1&b=2").head._1 ==
      "https://cdn.ex.co.uk/a/b/c?a=1&b=2")
    // non-default port KEPT; multiple trailing slashes stripped
    assert(canonOf("HTTPS://Blog.Example.ORG:8443/x//").head._1 ==
      "https://blog.example.org:8443/x")
    // empty path -> "/"; root path with query keeps "/"
    assert(canonOf("https://a.example.com").head._1 == "https://a.example.com/")
    assert(canonOf("http://a.example.com:8080/?q=3#f").head._1 ==
      "http://a.example.com:8080/?q=3")
    // empty query params dropped; "?" dropped when query empties out
    assert(canonOf("http://a.example.com/p?&&").head._1 == "http://a.example.com/p")
    // port 80 on https is NOT default -> kept (and vice versa)
    assert(canonOf("https://a.example.com:80/").head._1 == "https://a.example.com:80/")
    assert(canonOf("http://a.example.com:443/").head._1 == "http://a.example.com:443/")
  }

  test("registeredDomain: plain, two-level suffix, bare host passthrough") {
    assert(canonOf("http://www.example.com/").head._3 == "example.com")
    assert(canonOf("http://deep.cdn.example.co.uk/").head._3 == "example.co.uk")
    // exactly a 2-label host that IS a two-level suffix string: size<3 -> last2
    assert(canonOf("http://co.uk/").head._3 == "co.uk")
    assert(canonOf("http://localhost/").head._3 == "localhost")
    assert(canonOf("http://example.org/").head._3 == "example.org")
  }

  test("syntheticUrl lattice covers all six variants and canonicalizes stably") {
    import spark.implicits._
    val d = (0L to 11L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val out = d.select(col("doc_id"),
        UrlOps.syntheticUrl(col("doc_id"), col("source")).as("url"))
      .withColumn("canon", UrlOps.canonicalize(col("url")))
      .withColumn("host", UrlOps.host(col("url")))
      .withColumn("rd", UrlOps.registeredDomain(col("host")))
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(4))).toMap2
    assert(out(0L) == ("http://www.example.com/Articles/0?a=1&utm=x", "example.com"))
    assert(out(1L) == ("https://cdn.src1.example.co.uk/a/b/c?a=1&b=2&z=9", "example.co.uk"))
    assert(out(2L) == ("http://src2.example.com/path/2", "example.com"))
    assert(out(3L) == ("https://blog.src0.example.org:8443/x", "example.org"))
    assert(out(4L) == ("http://src1.example.com:8080/?q=4", "example.com"))
    assert(out(5L) == ("https://src2.example.com/", "example.com"))
    // variants repeat with the id/source baked in
    assert(out(6L)._1 == "http://www.example.com/Articles/6?a=1&utm=x")
  }

  test("domainLinkGraph: mixed-case schemes extracted, domains resolved, counts right") {
    import spark.implicits._
    val d = Seq(
      (1L, "word HTTP://WWW.Example.COM:80/a word https://cdn.x.example.co.uk/b trailing"),
      (2L, "no links here at all"),
      (3L, "https://a.example.org/x and https://b.example.org/y"))
      .toDF("doc_id", "text")
    val out = UrlOps.domainLinkGraph(d, lit("self.com")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      ("self.com", "example.com") -> ((1L, 1L)),     // the UPPERCASE-scheme link
      ("self.com", "example.co.uk") -> ((1L, 1L)),   // two-level public suffix
      ("self.com", "example.org") -> ((2L, 1L))))    // two links, one doc
  }

  private implicit class ToMap2(rows: Array[(Long, String, String)]) {
    def toMap2: Map[Long, (String, String)] =
      rows.map { case (k, a, b) => k -> ((a, b)) }.toMap
  }
}
