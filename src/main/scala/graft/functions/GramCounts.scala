package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document unigram AND adjacent-bigram counts in ONE hash-map pass:
  * `array<struct<g: string, c: long>>` with bigrams emitted as
  * `"w1 w2"` (unambiguous — tokens cannot contain whitespace). The
  * per-document pre-aggregation is the point: the declarative twin
  * explodes one row per gram INSTANCE (n unigrams + n−1 bigrams per
  * document) before the count aggregation can combine anything, while
  * this emits one row per DISTINCT gram per document — on Zipf-shaped
  * text the explode volume drops by the in-document repetition factor
  * before it ever reaches the aggregation (measured 1.6× end-to-end on
  * the collocation scan at 500k docs, 10.1 → 6.3 s warm).
  *
  * Tokenizer is the exact [[WordNgramHashes]]/`Dedup.tokens` convention
  * (lowercase, trim, split `\s+`, drop empties). NULL text → NULL
  * (dropped by `explode`); a document with no tokens → empty array.
  * Output order is insertion order, deterministic per document — though
  * every consumer immediately re-aggregates, so order never surfaces.
  *
  * CodegenFallback: per-row interpreted dispatch is noise next to the
  * per-token map operations inside each row (the [[RepetitionStats]]
  * precedent).
  */
case class GramCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_gram_counts expects string, got $t")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("g", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gram_counts"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val toks = v.asInstanceOf[UTF8String].toLowerCase.trim()
      .toString.split("\\s+", -1).filter(_.nonEmpty)
    val n = toks.length
    val m = new java.util.LinkedHashMap[String, Long](n * 3)
    var i = 0
    while (i < n) {
      m.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      m.merge(toks(i) + " " + toks(i + 1), 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GramCounts =
    copy(child = newChild)
}
