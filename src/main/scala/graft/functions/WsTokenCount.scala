package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DataTypes}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace token count — one scan implementing EXACTLY
  * `when(length(trim(t)) = 0, 0).otherwise(size(split(trim(t), "\s+")))`
  * (the [[graft.llm.TextAnalysis.tokenCount]] contract), including the
  * split quirks an approximation would miss: `trim` strips only the
  * SPACE character, and `split(_, "\s+", -1)` emits a leading empty
  * segment when the (space-trimmed) text starts with other whitespace
  * and a trailing empty segment when it ends with one — so `"\ta b"`
  * counts 3 and a non-empty all-tabs string counts 2. Those are the
  * pinned semantics (the DuckDB oracle replays them), so the scan
  * reproduces them rather than "fixing" them.
  *
  * Count = non-whitespace runs + (starts with `\s` ? 1) + (ends with
  * `\s` ? 1), over the space-trimmed text; the Java-regex ASCII `\s`
  * class. CodegenFallback (TermHits precedent).
  */
case class WsTokenCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DataTypes.StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_ws_count expects string, got $t")
    }

  override def dataType: DataType = DataTypes.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ws_count"

  override def nullSafeEval(input: Any): Any =
    WsTokenCount.count(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}

object WsTokenCount {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private[functions] def count(s: String): Long = {
    // trim strips spaces ONLY (Spark's trim), not the regex \s class
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    if (lo == hi) return 0L
    var runs = 0L
    var inRun = false
    var i = lo
    while (i < hi) {
      if (!isWs(s.charAt(i))) { if (!inRun) { runs += 1; inRun = true } }
      else inRun = false
      i += 1
    }
    runs + (if (isWs(s.charAt(lo))) 1L else 0L) +
      (if (isWs(s.charAt(hi - 1))) 1L else 0L)
  }
}
