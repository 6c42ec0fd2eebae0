package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Tokenize-once chunk emitter — the entire per-document work of
  * `Pipeline.chunk` as ONE pass over the text:
  * `array<struct<start_tok, n_tokens, chunk_hash>>`, one element per
  * sliding window of `chunkTokens` tokens advancing by `stride`
  * (element index = `chunk_id`; callers `posexplode`). The declarative
  * plan materializes the token array, then per CHUNK re-slices it,
  * re-joins it into a string, and md5s that string through generic
  * expression evaluation — with `chunkTokens/stride` overlap every
  * token is copied and hashed multiple times through interpreted
  * dispatch (measured ~2.8× of DuckDB at docs×100; the same
  * tokenize-once shape took `text_pii` from 7.6× to 0.89×). Here the
  * text is lowercased and tokenized ONCE and each chunk's digest is fed
  * straight from the lowered byte buffer — token slices interleaved
  * with single `0x20` bytes, which is byte-identical to
  * `md5(concat_ws(' ', slice(tokens, …)))` because tokens are UTF-8
  * slices and the joiner is one ASCII space.
  *
  * Semantics pinned to `Pipeline.chunk` exactly (spec-enforced):
  * tokens are the non-empty ASCII-whitespace-separated runs of
  * `lower(text)` (`Dedup.tokens`; Java `\s` without
  * UNICODE_CHARACTER_CLASS is ASCII-only, and multi-byte UTF-8 chars
  * contain no ASCII bytes, so the boundary scan is a byte test);
  * chunk count is `1 + ceil(max(n - chunkTokens, 0) / stride)`;
  * `start_tok = chunk_id * stride`; `n_tokens = min(chunkTokens,
  * n - start_tok)`; `chunk_hash` is the digest's first 4 bytes
  * big-endian unsigned (= `conv(substring(md5, 1, 8), 16, 10)`).
  * No tokens (or NULL text) → empty array: the declarative plan's
  * `filter(_n > 0)` emits no chunk rows, and `explode` of an empty
  * array likewise emits nothing.
  *
  * CodegenFallback: per-row interpreted dispatch is noise next to the
  * per-token hashing inside each row (the [[ShingleHashes]] precedent).
  */
case class ChunkHashes(child: Expression, chunkTokens: Int, stride: Int)
    extends UnaryExpression with CodegenFallback {

  require(chunkTokens > 0, s"graft_chunks: chunkTokens must be positive, got $chunkTokens")
  require(stride > 0 && stride <= chunkTokens,
    s"graft_chunks: stride must be in [1, chunkTokens], got $stride")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_chunks expects string, got $t")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start_tok", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("chunk_hash", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_chunks"

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  private def isAsciiSpace(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val bytes = v.asInstanceOf[UTF8String].toLowerCase.getBytes
    // token boundaries in the LOWERED buffer (lowercasing never maps a
    // non-whitespace codepoint to whitespace, so boundaries match
    // split(lower(text)) exactly)
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && isAsciiSpace(bytes(i))) i += 1
      if (i < bytes.length) {
        starts += i
        while (i < bytes.length && !isAsciiSpace(bytes(i))) i += 1
        ends += i
      }
    }
    val n = starts.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nChunks = 1 + (math.max(n - chunkTokens, 0) + stride - 1) / stride
    val out = new Array[Any](nChunks)
    var c = 0
    while (c < nChunks) {
      val from = c * stride
      val until = math.min(from + chunkTokens, n)
      md.reset()
      var t = from
      while (t < until) {
        if (t > from) md.update(0x20.toByte)
        md.update(bytes, starts(t), ends(t) - starts(t))
        t += 1
      }
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      out(c) = new GenericInternalRow(Array[Any](from.toLong, (until - from).toLong, h))
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkHashes =
    copy(child = newChild)
}
