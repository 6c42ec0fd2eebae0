package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document term-frequency probe for a LITERAL term list:
  * `struct(dl: long, tf: array<long>)` — the document's total token
  * count and, aligned with the input term order, how often each term
  * occurs. This is the entire per-document work of a BM25 scan, fused:
  * the declarative form tokenizes the corpus once for the corpus stats
  * and AGAIN for the hits, exploding every token of every document
  * through an `isin` filter and a (doc, term) count aggregation — all
  * to recover exactly these numbers (measured ~2× of the whole
  * `text_bm25` query at sf10).
  *
  * Tokenizer is the exact `Dedup.tokens` convention: trim, split on
  * ASCII whitespace runs (Java regex `\s` without UNICODE_CHARACTER_CLASS
  * matches only `[ \t\n\x0B\f\r]`, so the boundary scan is a byte test —
  * multi-byte UTF-8 chars never contain ASCII bytes), drop empties,
  * compare LOWERCASED (callers pass lowercase terms). `dl` counts every
  * token; `tf(i)` counts tokens equal to `terms(i)`. NULL text → NULL.
  *
  * CodegenFallback: per-row interpreted dispatch is noise next to the
  * per-token work inside each row (the [[GramCounts]] precedent).
  */
case class TermHits(child: Expression, terms: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(terms.nonEmpty, "TermHits: at least one term")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_term_hits expects string, got $t")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("tf", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_term_hits"

  @transient private lazy val termIndex: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.size * 2)
    terms.zipWithIndex.foreach { case (t, i) =>
      m.put(UTF8String.fromString(t), Integer.valueOf(i))
    }
    m
  }

  private def isAsciiSpace(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val bytes = text.getBytes
    val n = bytes.length
    var dl = 0L
    val tf = new Array[Long](terms.size)
    var i = 0
    while (i < n) {
      while (i < n && isAsciiSpace(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isAsciiSpace(bytes(i))) i += 1
        dl += 1
        val tok = UTF8String.fromBytes(bytes, start, i - start).toLowerCase
        val idx = termIndex.get(tok)
        if (idx != null) tf(idx.intValue()) += 1
      }
    }
    new GenericInternalRow(Array[Any](dl, new GenericArrayData(tf)))
  }

  override protected def withNewChildInternal(newChild: Expression): TermHits =
    copy(child = newChild)
}
