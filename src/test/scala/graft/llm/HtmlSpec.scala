package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, minWords: Int = 3,
                      maxLinkDensity: Double = 0.33): String =
    Seq(html).toDF("h")
      .select(Html.extractText(col("h"), minWords, maxLinkDensity).as("t"))
      .collect().head.getString(0)

  test("extractText: full page — head/script/style/comments drop, nav and footer " +
    "drop by link density, content blocks survive in order") {
    val html =
      "<html><head><title>T</title><style>body{color:red}</style></head>" +
        "<body><script type='text/javascript'>var x = '<p>not a block</p>';</script>" +
        "<!-- hidden <p>comment</p> -->" +
        "<nav><a href='/'>Home</a> <a href='/a'>About</a> <a href='/b'>More</a></nav>" +
        "<h1>Main heading right here</h1>" +
        "<p>First paragraph with plenty of words to keep.</p>" +
        "<p>Second paragraph also has enough words.</p>" +
        "<div class='footer'><a href='/c'>Contact</a> <a href='/d'>Terms</a></div>" +
        "</body></html>"
    assert(extract(html) ===
      "Main heading right here\n" +
        "First paragraph with plenty of words to keep.\n" +
        "Second paragraph also has enough words.")
  }

  test("extractText: minWords drops stubs; inline anchors inside a long block are fine") {
    val html = "<p>ok</p><p>a longer block with an inline <a href='/x'>link</a> stays</p>"
    // stub "ok" = 1 word < 3 → dropped; anchor mass 4 over text length 39 → kept
    assert(extract(html) === "a longer block with an inline link stays")
  }

  test("extractText: entities decode AFTER tag-stripping, &amp; last (no double decode)") {
    val html = "<p>5 &amp; 10 &lt;tags&gt; &quot;q&quot; &amp;lt; stays &nbsp;x</p>"
    assert(extract(html) === "5 & 10 <tags> \"q\" &lt; stays x")
  }

  test("extractText: malformed input degrades — plain text is its own block, " +
    "stray angle brackets survive") {
    assert(extract("just some plain words here") === "just some plain words here")
    // a paired <…> span IS a tag to the pinned grammar (stripped); a lone
    // `<` with no closing `>` cannot match and survives as text
    assert(extract("a < b and c > d words") === "a d words")
    assert(extract("price < 10 here words", minWords = 0) === "price < 10 here words")
    assert(extract("", minWords = 0) === "")
    assert(extract("two words") === "") // below minWords, nothing survives
  }

  test("extractText: whitespace collapses inside a block; br splits blocks") {
    val html = "<p>spaced   out\t\twords here</p><p>one two three<br>four five six</p>"
    assert(extract(html) ===
      "spaced out words here\none two three\nfour five six")
  }

  test("extractText: link density threshold is inclusive arithmetic on exact counts") {
    // anchor mass 3 ("abc"), text "abc def ghi" length 11 → 3/11 < 0.33 keep;
    // at maxLinkDensity 0.2 → 3 > 0.2*11 = 2.2 drop
    val html = "<p><a href='/'>abc</a> def ghi</p>"
    assert(extract(html) === "abc def ghi")
    assert(extract(html, maxLinkDensity = 0.2) === "")
  }

  test("extractText: tags merely STARTING with 'a' (abbr/aside/audio) are not " +
    "anchors — their text never counts as anchor mass") {
    // old defect: `<a[^>]*>` matched `<abbr>` too, so everything from it to
    // the real `</a>` was counted as anchor text, inflating link density
    // and dropping the whole content block
    val html = "<p><abbr>HTML</abbr> is a markup language with many words " +
      "<a href='/x'>ref</a> here</p>"
    assert(extract(html) === "HTML is a markup language with many words ref here")
    // same guard inside links(): an <abbr>…</a>-less page yields no edges
    assert(Seq("<p><abbr>SQL</abbr> text</p>").toDF("h")
      .select(size(Html.links(col("h")))).collect().head.getInt(0) === 0)
  }

  test("links: single-quoted and unquoted hrefs extract like double-quoted ones") {
    val html = "<p><a href='/sq'>single</a> <a href=/uq>unquoted</a> " +
      "<a HREF=\"/dq\">double</a></p>"
    val out = Seq(html).toDF("h")
      .select(explode(Html.links(col("h"))).as("l"))
      .select("l.href", "l.text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq === Seq(("/sq", "single"), ("/uq", "unquoted"), ("/dq", "double")))
  }

  test("blockDiagnostics agrees with extractText (kept blocks == extracted lines)") {
    val html =
      "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
        "<h1>A real heading block</h1><p>body text with words</p>"
    val df = Seq(html).toDF("h")
    val blocks = df.select(explode(Html.blockDiagnostics(col("h"))).as("b"))
      .select("b.text", "b.kept").collect()
    val kept = blocks.filter(_.getBoolean(1)).map(_.getString(0)).mkString("\n")
    assert(kept === extract(html))
    val nav = blocks.map(_.getString(0)).find(_.contains("Home"))
    assert(nav.isDefined) // nav block measured, judged, dropped
  }

  test("links: page-order (href, text) pairs; missing hrefs empty; nested tags and " +
    "entities resolve through the shared text measure") {
    val html = "<p><a href=\"/x\">First <b>bold</b> link</a> and " +
      "<a class='c'>no href &amp; entity</a></p><div><a href=\"/y\">Second</a></div>"
    val out = Seq(html).toDF("h")
      .select(explode(Html.links(col("h"))).as("l"))
      .select("l.href", "l.text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq === Seq(
      ("/x", "First bold link"),
      ("", "no href & entity"),
      ("/y", "Second")))
    // a page with no anchors yields an empty edge list, never null
    assert(Seq("<p>plain</p>").toDF("h")
      .select(size(Html.links(col("h")))).collect().head.getInt(0) === 0)
  }

  test("cleanCorpus fromHtml: stage-0 extraction feeds the funnel — an HTML page " +
    "whose extracted text passes yields the same row as the pre-extracted text") {
    val text = "the quick brown fox jumps over the lazy dog again and again " * 3
    val html = s"<html><head><title>x</title></head><body>" +
      s"<nav><a href='/'>Home</a> <a href='/b'>About</a></nav><p>${text.trim}</p></body></html>"
    val docsHtml = Seq((1L, html)).toDF("doc_id", "text")
    val docsTxt = Seq((1L, text.trim)).toDF("doc_id", "text")
    val bench = Seq.empty[String].toDF("text")
    val a = Pipeline.cleanCorpus(docsHtml, bench, "doc_id", "text", fromHtml = true)
      .collect()
    val b = Pipeline.cleanCorpus(docsTxt, bench, "doc_id", "text").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 1)
  }
}
