package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocab-driven subword tokenization — greedy longest-match encode
  * (the WordPiece/tokenizers-library inference rule, public knowledge):
  * split the text into words on ASCII-whitespace runs (the exact
  * [[TermHits]]/`Dedup.tokens` convention), then per word, repeatedly
  * emit the LONGEST vocab entry that prefixes the remaining suffix and
  * advance past it; a position no entry matches consumes ONE codepoint
  * as the unknown token, id −1 (codepoint, not byte: multi-byte UTF-8
  * unknowns emit one −1 each, matching any char-indexed replay). Output: `array<int>` of vocab indices
  * in reading order (the `-1`s interleaved where they occurred). NULL
  * text → NULL; empty/whitespace-only text → empty array.
  *
  * The rule is a PINNED pure function of (text, vocab) — an independent
  * engine replays it step-for-step (the oracle unrolls "longest prefix
  * at the cursor" as bounded iteration), and a training pipeline gets
  * REAL token budgets for packing/chunking instead of regex
  * approximations. Matching is byte-exact and case-sensitive: vocabs
  * own their casing convention (lowercase first if yours is lowercase);
  * entries must be non-empty and UNIQUE. Greedy longest-match is the
  * standard deterministic inference for a merges-trained vocab — this
  * expression does not TRAIN the vocab (training is offline; any
  * merges/wordpiece list drops in as `vocab`).
  *
  * One pass per row over a byte-level TRIE of the vocab (built once per
  * expression instance, shared across rows): cost O(chars × max match
  * attempt depth), no per-row allocation beyond the output buffer.
  * CodegenFallback: per-row interpreted dispatch is noise next to the
  * per-character trie walk inside each row (the [[TermHits]] precedent).
  */
case class SubwordEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(vocab.nonEmpty, "SubwordEncode: vocab must be non-empty")
  require(vocab.forall(_.nonEmpty), "SubwordEncode: vocab entries must be non-empty")
  require(vocab.distinct.size == vocab.size, "SubwordEncode: vocab entries must be unique")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_subword_encode expects string, got $t")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_subword_encode"

  /** Byte-level trie: flat node arrays (child table 256-wide per node,
    * acceptance = vocab id or −1). Vocab sizes here are tokenizer-scale
    * (≤ ~100k entries, bounded total bytes), so the table stays small;
    * byte-level means multi-byte UTF-8 vocab entries match exactly.
    */
  @transient private lazy val trie: (Array[Array[Int]], Array[Int]) = {
    val children = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val accept = scala.collection.mutable.ArrayBuffer(-1)
    vocab.zipWithIndex.foreach { case (w, id) =>
      var node = 0
      w.getBytes("UTF-8").foreach { b =>
        val c = b & 0xff
        if (children(node)(c) == -1) {
          children(node)(c) = children.size
          children += Array.fill(256)(-1)
          accept += -1
        }
        node = children(node)(c)
      }
      accept(node) = id
    }
    (children.toArray, accept.toArray)
  }

  private def isAsciiSpace(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  override def nullSafeEval(input: Any): Any = {
    val (children, accept) = trie
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      while (i < n && isAsciiSpace(bytes(i))) i += 1
      if (i < n) {
        val end = { var j = i; while (j < n && !isAsciiSpace(bytes(j))) j += 1; j }
        while (i < end) {
          // walk the trie from i, remember the LAST accepting depth
          var node = 0
          var j = i
          var bestId = -1
          var bestEnd = i
          while (j < end && node != -1) {
            node = children(node)(bytes(j) & 0xff)
            if (node != -1) {
              j += 1
              if (accept(node) != -1) { bestId = accept(node); bestEnd = j }
            }
          }
          if (bestId != -1) { out += bestId; i = bestEnd }
          else {
            // unknown: consume one CODEPOINT (UTF-8 lead byte gives the
            // width; clamp to the word end for malformed tails)
            out += -1
            val b = bytes(i) & 0xff
            val step = if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4
            i = math.min(end, i + step)
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordEncode =
    copy(child = newChild)
}
