package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string's ASCII projection:
  * `h = fold(ascii_bytes, 0)((a, b) => (a*31 + b) mod m)`, bytes ≥ 0x80
  * (all bytes of multi-byte UTF-8 sequences) skipped.
  *
  * Replaces the HOF formulation `aggregate(transform(split(text, '')...))`
  * — interpreted, one substring allocation per character — with a single
  * codegen'd pass over the UTF8String's bytes. Because UTF-8 multi-byte
  * sequences use only bytes ≥ 0x80, the byte-level ASCII projection equals
  * the codepoint-level one, so a SQL oracle folding `ord()` over the
  * regex-stripped text computes the identical value.
  */
case class AsciiRollingHash(child: Expression, mod: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_fingerprint expects string, got $t")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0) h = (h * 31 + b) % mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |final byte[] $bytes = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  if ($bytes[$i] >= 0) { $h = ($h * 31L + $bytes[$i]) % ${mod}L; }
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AsciiRollingHash =
    copy(child = newChild)
}
