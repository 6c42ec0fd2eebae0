package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DataTypes}
import org.apache.spark.unsafe.types.UTF8String

/** Native count of characters from a literal ASCII set — the closed
  * form of `regexp_count(text, "[<set>]")` for a plain character class
  * (no ranges-with-semantics, no backtracking: each match is exactly
  * one character, so the count is a set-membership scan). Used for the
  * quality-signal punctuation/digit ratios, where the regex engine was
  * pure overhead.
  */
case class CharSetCount(child: Expression, chars: String)
    extends UnaryExpression with CodegenFallback {

  require(chars.nonEmpty && chars.forall(_ < 128),
    "graft_charset_count: chars must be non-empty ASCII")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DataTypes.StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_charset_count expects string, got $t")
    }

  override def dataType: DataType = DataTypes.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_charset_count"

  @transient private lazy val inSet: Array[Boolean] = {
    val a = new Array[Boolean](128)
    chars.foreach(c => a(c) = true)
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var i = 0
    var n = 0L
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 128 && inSet(c)) n += 1
      i += 1
    }
    n
  }

  override protected def withNewChildInternal(newChild: Expression): CharSetCount =
    copy(child = newChild)
}

/** Native count of `\b(w1|w2|…)\b` matches over literal words — the
  * closed form of the stopword-hit regex (quality signals, language
  * ID): at each position with a word boundary BEFORE it, the
  * alternatives are tried IN ORDER and the first whose literal matches
  * and has a boundary AFTER wins (exactly Java's leftmost-first
  * alternation with the boundary backtrack); matches are
  * non-overlapping. Boundaries use the JDK's UNICODE word class — the
  * `\b`-vs-`\w` quirk documented on [[PiiScan]]. Words must be
  * non-empty; matching is case-sensitive (lower the column upstream,
  * exactly like the declarative `matchCount(lower(text), …)`).
  */
case class WordSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(words.nonEmpty && words.forall(_.nonEmpty),
    "graft_word_count: words must be non-empty")
  // The \b-emulation (and equivalence with the regex twin) only holds
  // for words made of word codepoints: a word ending/starting on a
  // non-word char inverts real \b semantics, and the declarative twin
  // would additionally interpret regex metacharacters. Reject such
  // word lists at construction instead of diverging silently.
  require(words.forall(w => w.codePoints().allMatch(cp => PiiScan.isWordCp(cp))),
    "graft_word_count: words must consist of word codepoints only")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DataTypes.StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_word_count expects string, got $t")
    }

  override def dataType: DataType = DataTypes.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_word_count"

  // first-char dispatch: at a boundary only the words sharing the
  // position's first char can match (their relative alternation order
  // preserved) — most positions fail on one array lookup
  @transient private lazy val byFirst: Array[Array[String]] = {
    val m = new Array[Array[String]](128)
    words.foreach { w =>
      val c = w.charAt(0)
      if (c < 128) m(c) = (Option(m(c)).getOrElse(Array.empty[String]) :+ w)
    }
    m
  }
  @transient private lazy val nonAsciiFirst: Array[String] =
    words.filter(_.charAt(0) >= 128).toArray

  private def isWordAt(s: String, i: Int): Boolean = {
    val c = s.charAt(i)
    if (c < 128) (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'
    else if (Character.isLowSurrogate(c) && i > 0 &&
      Character.isHighSurrogate(s.charAt(i - 1)))
      // the position after a surrogate PAIR sees the pair's codepoint
      // class (a supplementary-plane letter suppresses the boundary)
      PiiScan.isWordCp(Character.codePointAt(s, i - 1))
    else PiiScan.isWordCp(Character.codePointAt(s, i))
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var i = 0
    var n = 0L
    // tracked incrementally: whether the char before position i is a
    // word codepoint (low surrogates ride on their pair's class via the
    // per-char isWordAt, which is only consulted one char at a time)
    var prevWord = false
    while (i < s.length) {
      var len = 0
      if (!prevWord) {
        val c = s.charAt(i)
        val cand: Array[String] =
          if (c < 128) byFirst(c)
          else if (nonAsciiFirst.nonEmpty) nonAsciiFirst
          else null
        if (cand != null) {
          var w = 0
          while (len == 0 && w < cand.length) {
            val word = cand(w)
            if (s.regionMatches(i, word, 0, word.length) &&
                (i + word.length == s.length ||
                  !PiiScan.isWordCp(Character.codePointAt(s, i + word.length))))
              len = word.length
            w += 1
          }
        }
      }
      if (len > 0) {
        n += 1
        i += len
        prevWord = true // every word ends in a word char (boundary checked)
      } else {
        prevWord = isWordAt(s, i)
        i += 1
      }
    }
    n
  }

  override protected def withNewChildInternal(newChild: Expression): WordSetCount =
    copy(child = newChild)
}
