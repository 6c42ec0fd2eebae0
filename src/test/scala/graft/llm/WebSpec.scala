package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WebSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(Web.urlNormalize($"u")).head.getString(0)

  test("urlNormalize: case folds scheme+host only, strips www/query/fragment/slash") {
    assert(norm("HTTPS://WWW.Site5.Example.com/Page/5/?utm_id=5#frag")
      === "https://site5.example.com/Page/5")
    assert(norm("http://example.org/a") === "http://example.org/a")
    // path case preserved, host case folded
    assert(norm("HTTP://HOST.COM/CaseSensitive") === "http://host.com/CaseSensitive")
    // fragment without query
    assert(norm("https://h.com/x#y") === "https://h.com/x")
    // bare host: trailing slash strips, no path remains
    assert(norm("https://www.h.com/") === "https://h.com")
    // malformed (no authority): passes through un-lowered, never throws
    assert(norm("NotAUrl") === "NotAUrl")
  }

  test("urlDomain extracts the host of a normalized URL; empty when malformed") {
    val d = Seq("https://site1.example.com/Page/1", "oops").toDF("u")
      .select(Web.urlDomain($"u")).collect().map(_.getString(0)).toSeq
    assert(d === Seq("site1.example.com", ""))
  }

  test("capPerDomain keeps at most k per domain, deterministically") {
    val docs = (0L until 40L).map(i => (i, s"d${i % 3}")).toDF("doc_id", "domain")
    val kept = Web.capPerDomain(docs, "doc_id", "domain", k = 4, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.groupBy(_._2).forall(_._2.length === 4), "exactly k=4 per domain")
    val kept2 = Web.capPerDomain(docs.repartition(7), "doc_id", "domain", 4, 7L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSet === kept2.toSet, "winners are a pure function of (id, seed)")
    // a domain under the cap keeps everything
    val small = Web.capPerDomain(docs.filter($"doc_id" < 3), "doc_id", "domain", 4, 7L)
    assert(small.count() === 3)
  }
}
