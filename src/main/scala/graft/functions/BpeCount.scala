package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DataTypes}
import org.apache.spark.unsafe.types.UTF8String

/** Native count of [[graft.llm.TextAnalysis.BpePattern]] matches — the
  * BPE-ish pre-tokenizer segment count as one character scan instead of
  * a per-character regex-alternation evaluation (the pattern's seven
  * contraction branches plus three ` ?class+` branches made
  * `regexp_count` the dominant cost of text_tokens at scale).
  *
  * The scan is the CLOSED FORM of the pattern's leftmost-first
  * alternation (spec-pinned equal on generated text,
  * NativeEquivalenceSpec):
  *
  *   - at `'`: the contraction branches (`'s 't 're 've 'm 'll 'd`) in
  *     order; no other branch can start with an apostrophe, so a lone
  *     `'x` advances one char unmatched;
  *   - otherwise ` ?[A-Za-z]+`, ` ?[0-9]+`, ` ?[^A-Za-z0-9\s']+` in
  *     order: an optional single leading space, then a maximal run of
  *     the class — the optional space can never be "given back" usefully
  *     (a space is in `\s`, excluded from every class), so the cascade
  *     needs no backtracking. Classes are ASCII; every non-ASCII
  *     codepoint (including each half of a surrogate pair) falls into
  *     the "other" run, which merges exactly like the regex's
  *     codepoint-level negated class.
  *
  * CodegenFallback (TermHits precedent).
  */
case class BpeCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DataTypes.StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_count expects string, got $t")
    }

  override def dataType: DataType = DataTypes.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_count"

  override def nullSafeEval(input: Any): Any =
    BpeCount.count(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

object BpeCount {

  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  private def isOther(c: Char): Boolean =
    !isAlpha(c) && !isDigit(c) && !isAsciiWs(c) && c != '\''

  /** Length of the match starting exactly at `i`, or 0. */
  private def matchLen(s: String, i: Int): Int = {
    val c = s.charAt(i)
    if (c == '\'') {
      val n = s.length - i
      def at(k: Int) = s.charAt(i + k)
      if (n >= 2 && (at(1) == 's' || at(1) == 't')) 2
      else if (n >= 3 && at(1) == 'r' && at(2) == 'e') 3
      else if (n >= 3 && at(1) == 'v' && at(2) == 'e') 3
      else if (n >= 2 && at(1) == 'm') 2
      else if (n >= 3 && at(1) == 'l' && at(2) == 'l') 3
      else if (n >= 2 && at(1) == 'd') 2
      else 0
    } else {
      val sp = if (c == ' ') 1 else 0
      val j = i + sp
      if (j >= s.length) return 0
      val d = s.charAt(j)
      val cls: Char => Boolean =
        if (isAlpha(d)) isAlpha
        else if (isDigit(d)) isDigit
        else if (isOther(d)) isOther
        else return 0
      var k = j
      while (k < s.length && cls(s.charAt(k))) k += 1
      k - i
    }
  }

  private[functions] def count(s: String): Long = {
    var i = 0
    var n = 0L
    while (i < s.length) {
      val m = matchLen(s, i)
      if (m > 0) { n += 1; i += m } else i += 1
    }
    n
  }
}
