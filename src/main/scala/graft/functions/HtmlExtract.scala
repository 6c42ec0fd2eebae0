package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass HTML→text extraction — the imperative twin of
  * [[graft.llm.Html.extractText]]'s pinned declarative pipeline, built
  * because the funnel head is the hot path of every crawl-fed corpus
  * (text_extract / pipe_clean_html) and the declarative form pays ~6
  * regex-engine passes per page. The SEMANTICS are the declarative
  * pipeline's, bit-for-bit (NativeEquivalenceSpec pins native ==
  * declarative on generated HTML): every scan below reproduces the
  * exact Java-regex behavior of its declarative counterpart, including
  * the edge rules —
  *
  *   - container strip (`(?is)<script[^>]*>.*?</script>|<style…|
  *     <head…|<!--.*?-->`): leftmost opener wins, the opener needs a
  *     later `>`, the branch needs its OWN literal closer
  *     (case-insensitive), an unclosed opener survives as text, and
  *     `<head` also prefixes `<header` (matching only if a literal
  *     `</head>` follows — the regex's own behavior, kept);
  *   - block-tag split (`(?i)</?(p|div|h[1-6]|…)(\s[^>]*)?/?>`): the
  *     alternation+backtracking semantics reduce to "known tag name
  *     followed by `>`, `/>` or whitespace-attrs-`>`" — `<ph>`,
  *     `<h1-x>` are NOT block tags, `<td x=1>`, `<br/>` are;
  *   - per block: tag strip to a space (`<[^>]*>` — a `<` without `>`
  *     survives), entity decode in the pinned order (`&amp;` LAST,
  *     `&`-probed), `\s+` collapse (the ASCII Java-regex `\s` class),
  *     trim;
  *   - anchor mass: `(?is)<a(\s[^>]*)?>(.*?)</a>` inner text length by
  *     the same measure, non-overlapping, resuming after each closer;
  *   - keep: words ≥ minWords AND mass ≤ maxLinkDensity × text length
  *     — lengths in CODEPOINTS (Spark's `length`), not UTF-16 units.
  *
  * CodegenFallback: per-row interpreted dispatch is noise next to the
  * per-character scans inside each row (the TermHits precedent).
  */
case class HtmlExtract(child: Expression, minWords: Int, maxLinkDensity: Double)
    extends UnaryExpression with CodegenFallback {

  require(minWords >= 0, "graft_html_extract: minWords must be >= 0")
  require(maxLinkDensity >= 0 && maxLinkDensity <= 1,
    "graft_html_extract: maxLinkDensity must be in [0, 1]")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_html_extract expects string, got $t")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_extract"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      HtmlExtract.extract(input.asInstanceOf[UTF8String].toString,
        minWords, maxLinkDensity))

  override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
    copy(child = newChild)
}

object HtmlExtract {

  private val BlockNames: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "br", "hr", "section", "article", "header",
    "footer", "nav", "blockquote", "pre", "form")

  // the Java-regex default \s class (ASCII), NOT Unicode whitespace
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def ciStartsWith(s: String, i: Int, pat: String): Boolean = {
    if (i + pat.length > s.length) return false
    var k = 0
    while (k < pat.length) {
      if (Character.toLowerCase(s.charAt(i + k)) != pat.charAt(k)) return false
      k += 1
    }
    true
  }

  private def ciIndexOf(s: String, from: Int, pat: String): Int = {
    var i = math.max(from, 0)
    val last = s.length - pat.length
    while (i <= last) {
      if (ciStartsWith(s, i, pat)) return i
      i += 1
    }
    -1
  }

  /** Pinned step 1: container strip (leftmost opener wins, consumes to
    * its own closer, replaced by one space).
    */
  private def stripContainers(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      var consumed = -1
      if (s.charAt(i) == '<') {
        // `<tag[^>]*>.*?</tag>` — opener ends at the next '>', the body
        // runs to the first case-insensitive literal closer
        def paired(open: String, close: String): Int = {
          if (!ciStartsWith(s, i, open)) return -1
          val gt = s.indexOf('>', i + open.length)
          if (gt < 0) return -1
          val cl = ciIndexOf(s, gt + 1, close)
          if (cl < 0) -1 else cl + close.length
        }
        consumed = paired("<script", "</script>")
        if (consumed < 0) consumed = paired("<style", "</style>")
        if (consumed < 0) consumed = paired("<head", "</head>")
        if (consumed < 0 && ciStartsWith(s, i, "<!--")) {
          val cl = s.indexOf("-->", i + 4)
          consumed = if (cl < 0) -1 else cl + 3
        }
      }
      if (consumed >= 0) { out.append(' '); i = consumed }
      else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** Match a block-level tag at `i` (s(i) == '<'); returns the index
    * one past the closing '>' or -1. Reduces the regex
    * `(?i)</?(NAME)(\s[^>]*)?/?>` with backtracking to: optional '/',
    * a maximal alphanumeric name in the block set, then `>`, `/>`, or
    * whitespace + non-'>' attrs + '>'.
    */
  private def blockTagEnd(s: String, i: Int): Int = {
    var j = i + 1
    if (j < s.length && s.charAt(j) == '/') j += 1
    val nameStart = j
    while (j < s.length && (Character.isLetterOrDigit(s.charAt(j)) &&
      s.charAt(j) < 128)) j += 1
    if (j == nameStart) return -1
    val name = s.substring(nameStart, j).toLowerCase
    if (!BlockNames.contains(name)) return -1
    if (j >= s.length) return -1
    val c = s.charAt(j)
    if (c == '>') j + 1
    else if (c == '/' && j + 1 < s.length && s.charAt(j + 1) == '>') j + 2
    else if (isWs(c)) {
      val gt = s.indexOf('>', j)
      if (gt < 0) -1 else gt + 1
    } else -1
  }

  /** Pinned step 2: block-level tags (open/close/self-closed) become the
    * block separator '\n'.
    */
  private def splitBlockTags(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      var end = -1
      if (s.charAt(i) == '<') end = blockTagEnd(s, i)
      if (end >= 0) { out.append('\n'); i = end }
      else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** Pinned step 3a: every `<…>` span (any content but '>') becomes one
    * space; a '<' with no later '>' survives.
    */
  private def stripTags(s: String): String = {
    if (s.indexOf('<') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<') {
        val gt = s.indexOf('>', i + 1)
        if (gt >= 0) { out.append(' '); i = gt + 1 }
        else { out.append('<'); i += 1 }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** Pinned step 3b: the five core entities then `&amp;` LAST, literal
    * global left-to-right replaces, probed on '&'.
    */
  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")
  }

  /** Pinned step 3c: `\s+` → one space, then trim of ' ' (after the
    * collapse every boundary run is a single space, so trimming spaces
    * is exactly Spark's trim).
    */
  private def collapseWs(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    var inRun = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) { if (!inRun) { out.append(' '); inRun = true } }
      else { out.append(c); inRun = false }
      i += 1
    }
    var lo = 0
    var hi = out.length
    if (hi > lo && out.charAt(lo) == ' ') lo += 1
    if (hi > lo && out.charAt(hi - 1) == ' ') hi -= 1
    out.substring(lo, hi)
  }

  /** A block's visible text (steps 3a-3c). */
  private def blockText(b: String): String =
    collapseWs(decodeEntities(stripTags(b)))

  /** A block's anchor mass: Σ codepoint-length of the visible text of
    * each `(?is)<a(\s[^>]*)?>(.*?)</a>` inner group, non-overlapping.
    */
  private def anchorMass(b: String): Long = {
    var mass = 0L
    var i = 0
    while (i < b.length - 1) {
      if (b.charAt(i) == '<' &&
          Character.toLowerCase(b.charAt(i + 1)) == 'a') {
        var openEnd = -1
        val j = i + 2
        if (j < b.length) {
          if (b.charAt(j) == '>') openEnd = j + 1
          else if (isWs(b.charAt(j))) {
            val gt = b.indexOf('>', j)
            if (gt >= 0) openEnd = gt + 1
          }
        }
        if (openEnd >= 0) {
          val cl = ciIndexOf(b, openEnd, "</a>")
          if (cl >= 0) {
            val inner = blockText(b.substring(openEnd, cl))
            mass += inner.codePointCount(0, inner.length)
            i = cl + 4
          } else i += 1
        } else i += 1
      } else i += 1
    }
    mass
  }

  /** The full pinned pipeline — see [[graft.llm.Html.extractText]] for
    * the contract prose.
    */
  def extract(html: String, minWords: Int, maxLinkDensity: Double): String = {
    val s5 = splitBlockTags(stripContainers(html))
    val blocks = s5.split("\n", -1)
    val kept = new scala.collection.mutable.ArrayBuffer[String](blocks.length)
    blocks.foreach { b =>
      val t = blockText(b)
      val words = if (t.isEmpty) 0 else {
        var n = 1
        var i = 0
        while (i < t.length) { if (t.charAt(i) == ' ') n += 1; i += 1 }
        n
      }
      if (words >= minWords) {
        val am = anchorMass(b)
        if (am.toDouble <= maxLinkDensity * t.codePointCount(0, t.length).toDouble)
          kept += t
      }
    }
    kept.mkString("\n")
  }
}
