package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashing-trick document embedding in ONE text pass: a dense
  * `int[dim]` where every word-n-gram INSTANCE adds ±1 to one bucket —
  * the fastText/feature-hashing sentence-vector recipe (Joulin et al.
  * 2016; Weinberger et al. 2009) with every step pinned so an ANSI SQL
  * engine replays the integers exactly:
  *
  *   h      = md5-prefix-32 of the gram (the [[GramBuckets]] hash)
  *   bucket = h % dim
  *   sign   = +1 if (h / dim) % 2 == 0 else -1
  *
  * The sign bit comes from the quotient, so for dim = 2^k it is
  * bit k — DISJOINT from the bucket's low bits (a sign derived from the
  * bucket alone would make colliding grams always reinforce, losing the
  * hashing trick's collision cancellation).
  *
  * Tokenization and the fewer-than-n / empty / null conventions match
  * [[GramBuckets]] exactly (null text folds the empty-string gram once
  * per n — `nullable = false`, a deterministic vector for every row).
  * Spec-pinned bit-equal to a declarative md5 twin over generated text
  * (NativeEquivalenceSpec).
  */
case class HashEmbed(child: Expression, ns: Seq[Int], dim: Int)
    extends UnaryExpression with CodegenFallback {

  require(ns.nonEmpty && ns.forall(_ >= 1),
    s"graft_hash_embed: ns must be non-empty positive, got $ns")
  require(dim >= 1, s"graft_hash_embed: dim must be >= 1, got $dim")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_hash_embed expects string, got $t")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hash_embed"

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val toks: Array[String] =
      if (v == null) Array.empty[String]
      else v.asInstanceOf[UTF8String].toLowerCase.trim()
        .toString.split("\\s+", -1).filter(_.nonEmpty)
    val acc = new Array[Int](dim)
    ns.foreach { n =>
      val positions = math.max(toks.length - (n - 1), 1)
      var p = 0
      while (p < positions) {
        val gram = toks.slice(p, math.min(p + n, toks.length)).mkString(" ")
        md.reset()
        val d = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val b = (h % dim).toInt
        acc(b) += (if ((h / dim) % 2 == 0) 1 else -1)
        p += 1
      }
    }
    new GenericArrayData(acc)
  }

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}
