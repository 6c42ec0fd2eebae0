package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd PQ sub-code assignment: the index of the codeword in
  * `book` nearest (squared L2, in 1e6 ticks) to the `book(0).length`-dim
  * slice of the input vector starting at `offset` — the hot inner loop of
  * PQ ENCODE, which touches every corpus row once per subspace, and of
  * codebook training, which touches every sample row per subspace per
  * Lloyd iteration.
  *
  * The higher-order-function formulation
  * (`element_at(array_sort(zip_with(transform(book…, aggregate(zip_with(
  * slice…)))…)), 1)`) evaluates fully interpreted — lambda functions are
  * CodegenFallback, and the per-(row, subspace, codeword) array
  * allocations dominate the encode scan at corpus scale (measured ~7× of
  * the whole ann_pq query at sf1). This expression is the identical
  * arithmetic as one tight generated loop.
  *
  * Bit-compat contract with the HOF twin (pinned by
  * NativeEquivalenceSpec): per codeword, squared differences accumulate
  * LEFT TO RIGHT in doubles; the tick is
  * `BigDecimal.valueOf(acc * 1e6).setScale(0, HALF_UP).longValue()` —
  * exactly Spark's `round(x)` on DoubleType; ties pick the LOWEST
  * codeword index (the array_sort on (tick, index) structs). NULL when
  * the input vector is null, shorter than `offset + d`, or carries a
  * null element in the slice (the vector contract everywhere in
  * graft.llm.Similarity).
  */
case class PqSubCode(child: Expression, book: Array[Array[Double]], offset: Int)
  extends UnaryExpression {

  require(book.nonEmpty && book.forall(_.length == book(0).length) &&
    book(0).nonEmpty, "PqSubCode: book must be a non-empty rectangular matrix")
  require(offset >= 0, "PqSubCode: offset must be >= 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_code expects array<double>, got $t")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_code"

  private def d = book(0).length

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() < offset + d) return null
    var best = Long.MaxValue
    var bestC = -1
    var c = 0
    while (c < book.length) {
      var acc = 0.0
      var i = 0
      while (i < d) {
        if (v.isNullAt(offset + i)) return null
        val diff = v.getDouble(offset + i) - book(c)(i)
        acc += diff * diff
        i += 1
      }
      val t = java.math.BigDecimal.valueOf(acc * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      if (t < best) { best = t; bestC = c }
      c += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", book, "double[][]")
    nullSafeCodeGen(ctx, ev, va => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val outer = ctx.freshName("outer")
      s"""
         |if ($va.numElements() < ${offset + d}) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $best = Long.MAX_VALUE;
         |  int $bestC = -1;
         |  $outer:
         |  for (int $c = 0; $c < ${book.length}; $c++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $d; $i++) {
         |      if ($va.isNullAt($offset + $i)) { ${ev.isNull} = true; break $outer; }
         |      double $diff = $va.getDouble($offset + $i) - $bookRef[$c][$i];
         |      $acc += $diff * $diff;
         |    }
         |    long $t = java.math.BigDecimal.valueOf($acc * 1.0E6)
         |      .setScale(0, java.math.RoundingMode.HALF_UP).longValue();
         |    if ($t < $best) { $best = $t; $bestC = $c; }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $bestC; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqSubCode =
    copy(child = newChild)
}
