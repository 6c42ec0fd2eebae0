package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

object MinhashSigs {
  /** The MinHash modulus: smallest prime > 2^32. */
  val P = 4294967311L

  /** Deterministic (a, b) for permutation `k` — the LCG every SQL oracle
    * reproduces ([[graft.llm.Dedup.minhashCoeff]] delegates here, so the
    * native and declarative signature paths share one derivation).
    * `a < 2^31` so `h * a + b` never overflows a signed long (h < 2^32).
    */
  def coeff(k: Int): (Long, Long) = {
    def lcg(x: Long): Long = (x * 6364136223846793005L + 1442695040888963407L) >>> 33
    (lcg(2L * k + 1) % 2147483646L + 1L, lcg(2L * k + 2) % 2147483647L)
  }
}

/** All `numHashes` MinHash signature values over a shingle-hash array in
  * ONE pass — the fused form of the K-column declarative chain
  * `sig_k = array_min(transform(sh, h => (h * a_k + b_k) % P))`, which
  * walks (and allocates an intermediate array over) the whole shingle
  * array once PER permutation through generic HOF evaluation. The
  * auto-banded configs run dozens of permutations (52 at the 50k-doc
  * test shape), so the declarative form pays dozens of interpreted
  * array passes per document; here the array is walked once and every
  * permutation's running minimum updates in a primitive `long[]`.
  *
  * Element `k` (1-based position `k+1`) equals the declarative `sig_k`
  * exactly: null input elements are skipped (`transform` maps them to
  * null, `array_min` ignores nulls), and an empty or all-null input
  * yields all-null elements (`array_min` of nothing is null). A null
  * input array yields null (the declarative chain's `transform` →
  * `array_min` null chain) via default null propagation.
  *
  * CodegenFallback: the per-row interpreted dispatch is noise next to
  * the |shingles| × numHashes multiply-mod loop inside each row.
  */
case class MinhashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1, s"graft_minhash_sigs: numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_minhash_sigs expects array<long>, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_sigs"

  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(k => MinhashSigs.coeff(k)._1)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(k => MinhashSigs.coeff(k)._2)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[Long](numHashes)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var k = 0
        if (!seen) {
          while (k < numHashes) { mins(k) = (h * as(k) + bs(k)) % MinhashSigs.P; k += 1 }
          seen = true
        } else {
          while (k < numHashes) {
            val x = (h * as(k) + bs(k)) % MinhashSigs.P
            if (x < mins(k)) mins(k) = x
            k += 1
          }
        }
      }
      i += 1
    }
    if (seen) new GenericArrayData(mins)
    else new GenericArrayData(new Array[Any](numHashes)) // all-null elements
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}
