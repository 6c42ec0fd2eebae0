package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused multi-language stopword scoring — ALL language stopword
  * regexes (`\b(w1|…)\b` each) counted in ONE scan of the text, where
  * [[WordSetCount]] would pay one scan per language. Each language's
  * count emulates its own independent non-overlapping matcher via a
  * per-language resume cursor: a match for language l at position i
  * suppresses l's candidates until i+len (Java's find() resumes at the
  * match end) without affecting any other language — positions are
  * otherwise shared, as is the boundary state. Boundary semantics,
  * alternation order, and the surrogate-pair rule are exactly
  * [[WordSetCount]]'s (spec-pinned equal to the per-language scans).
  * Returns `array<long>` in `langs` order; lower the column upstream.
  */
case class LangScores(child: Expression, langs: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  require(langs.nonEmpty && langs.forall(ws => ws.nonEmpty && ws.forall(_.nonEmpty)),
    "graft_lang_scores: every language needs non-empty words")
  // Same precondition as [[WordSetCount]]: \b-equivalence with the
  // per-language regex twins holds only for word-codepoint-only words.
  require(langs.forall(_.forall(w => w.codePoints().allMatch(cp => PiiScan.isWordCp(cp)))),
    "graft_lang_scores: words must consist of word codepoints only")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_lang_scores expects string, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lang_scores"

  // per language: first-char dispatch table (ASCII) + non-ASCII-first list
  @transient private lazy val byFirst: Array[Array[Array[String]]] =
    langs.map { ws =>
      val m = new Array[Array[String]](128)
      ws.foreach { w =>
        val c = w.charAt(0)
        if (c < 128) m(c) = Option(m(c)).getOrElse(Array.empty[String]) :+ w
      }
      m
    }.toArray
  @transient private lazy val nonAsciiFirst: Array[Array[String]] =
    langs.map(_.filter(_.charAt(0) >= 128).toArray).toArray

  private def isWordAt(s: String, i: Int): Boolean = {
    val c = s.charAt(i)
    if (c < 128) (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'
    else if (Character.isLowSurrogate(c) && i > 0 &&
      Character.isHighSurrogate(s.charAt(i - 1)))
      PiiScan.isWordCp(Character.codePointAt(s, i - 1))
    else PiiScan.isWordCp(Character.codePointAt(s, i))
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(countScores(
      input.asInstanceOf[UTF8String].toString).map(c => c: Any))

  /** The one-scan counting core, shared with [[LangBest]]. */
  private[functions] def countScores(s: String): Array[Long] = {
    val nl = langs.length
    val counts = new Array[Long](nl)
    val resume = new Array[Int](nl)
    var prevWord = false
    var i = 0
    while (i < s.length) {
      if (!prevWord) {
        val c = s.charAt(i)
        var l = 0
        while (l < nl) {
          if (resume(l) <= i) {
            val cand: Array[String] =
              if (c < 128) byFirst(l)(c)
              else if (nonAsciiFirst(l).nonEmpty) nonAsciiFirst(l)
              else null
            if (cand != null) {
              var w = 0
              var len = 0
              while (len == 0 && w < cand.length) {
                val word = cand(w)
                if (s.regionMatches(i, word, 0, word.length) &&
                    (i + word.length == s.length ||
                      !PiiScan.isWordCp(Character.codePointAt(s, i + word.length))))
                  len = word.length
                w += 1
              }
              if (len > 0) { counts(l) += 1; resume(l) = i + len }
            }
          }
          l += 1
        }
      }
      prevWord = isWordAt(s, i)
      i += 1
    }
    counts
  }

  override protected def withNewChildInternal(newChild: Expression): LangScores =
    copy(child = newChild)
}

/** [[LangScores]] with the language-ID argmax FUSED into the same scan:
  * `struct(scores: array<long>, best: int)` where `best` is the index of
  * the highest score (first-listed tie-break, matching
  * `TextAnalysis.langIdFromScores`) and −1 when every score is zero
  * ("und"). One expression evaluation per row replaces the scores scan
  * plus a greatest/when-chain projection — the whole language-ID row
  * becomes a single aliased native call plus constant-time field reads.
  */
case class LangBest(child: Expression, langs: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  require(langs.nonEmpty && langs.forall(ws => ws.nonEmpty && ws.forall(_.nonEmpty)),
    "graft_lang_best: every language needs non-empty words")
  require(langs.forall(_.forall(w => w.codePoints().allMatch(cp => PiiScan.isWordCp(cp)))),
    "graft_lang_best: words must consist of word codepoints only")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_lang_best expects string, got $t")
    }

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("scores",
        ArrayType(LongType, containsNull = false), nullable = false),
      org.apache.spark.sql.types.StructField("best",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lang_best"

  @transient private lazy val scorer = LangScores(child, langs)

  override def nullSafeEval(input: Any): Any = {
    val counts = scorer.countScores(input.asInstanceOf[UTF8String].toString)
    var best = -1
    var bestC = 0L
    var l = 0
    while (l < counts.length) {
      if (counts(l) > bestC) { bestC = counts(l); best = l }
      l += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(counts.map(c => c: Any)), best))
  }

  override protected def withNewChildInternal(newChild: Expression): LangBest =
    copy(child = newChild)
}
