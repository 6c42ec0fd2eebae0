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

  /** Byte-level trie in a flattened CSR layout: per-node edge RANGES
    * into two flat arrays (sorted edge byte, target node) plus an
    * acceptance array (vocab id or −1). Memory is O(nodes + edges) —
    * ~9 bytes per trie edge — so a 100k-entry tokenizer vocab with
    * little prefix sharing costs single-digit MB per expression
    * instance, not the hundreds of MB a dense 256-wide child table per
    * node would (advisor, round 14). Lookup is a binary search over the
    * node's edge range (tokenizer fan-outs are small — typically < 8 —
    * so this is 2-3 probes). Byte-level means multi-byte UTF-8 vocab
    * entries match exactly.
    */
  @transient private lazy val trie: (Array[Int], Array[Byte], Array[Int], Array[Int]) = {
    // build phase: one sorted map per node (cheap, vocab-sized)
    val edges = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Int, Int])
    val acceptB = scala.collection.mutable.ArrayBuffer(-1)
    vocab.zipWithIndex.foreach { case (w, id) =>
      var node = 0
      w.getBytes("UTF-8").foreach { b =>
        val c = b & 0xff
        node = edges(node).getOrElse(c, {
          val nn = edges.size
          edges(node).update(c, nn)
          edges += scala.collection.mutable.TreeMap.empty[Int, Int]
          acceptB += -1
          nn
        })
      }
      acceptB(node) = id
    }
    // freeze phase: flatten to CSR (start offsets, sorted bytes, targets)
    val nNodes = edges.size
    val start = new Array[Int](nNodes + 1)
    var total = 0
    var n = 0
    while (n < nNodes) { start(n) = total; total += edges(n).size; n += 1 }
    start(nNodes) = total
    val eByte = new Array[Byte](total)
    val eNode = new Array[Int](total)
    n = 0
    while (n < nNodes) {
      var k = start(n)
      edges(n).foreach { case (c, t) => eByte(k) = c.toByte; eNode(k) = t; k += 1 }
      n += 1
    }
    (start, eByte, eNode, acceptB.toArray)
  }

  /** Target of the edge labelled `c` (unsigned byte) out of `node`, or
    * −1 — binary search over the node's sorted CSR edge range.
    */
  private def step(start: Array[Int], eByte: Array[Byte], eNode: Array[Int],
                   node: Int, c: Int): Int = {
    var lo = start(node)
    var hi = start(node + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = eByte(mid) & 0xff
      if (mc == c) return eNode(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  private def isAsciiSpace(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  override def nullSafeEval(input: Any): Any = {
    val (start, eByte, eNode, accept) = trie
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
            node = step(start, eByte, eNode, node, bytes(j) & 0xff)
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
