package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native PII scan — counts AND redaction of the three
  * [[graft.llm.TextAnalysis.PiiPatterns]] kinds in five memory-speed
  * character scans (counts over the ORIGINAL text like the declarative
  * `piiCols`; redaction as the sequential email→phone→IP replace
  * chain), instead of the declarative form's SIX regex-engine passes.
  * Returns `struct<n_email, n_phone, n_ip: long, redacted: string>`.
  *
  * Each scanner is the CLOSED FORM of its Java-regex pattern's
  * backtracking (spec-pinned equal on generated adversarial text,
  * NativeEquivalenceSpec):
  *
  *   - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`: the
  *     local part is a maximal class run that must be followed by `@`
  *     (backtracking can never re-place the `@` inside the run); the
  *     domain backtracks to the LAST dot inside its maximal run that
  *     has ≥ 2 letters after it, and the match ends where the letter
  *     run ends. A failed start skips to just past the `@` (every
  *     suffix of the run fails identically).
  *   - phone `\+[0-9]{1,3} [0-9]{3} [0-9]{3} [0-9]{3}`: the {1,3}
  *     group only matches when the digit run is ≤ 3 and space-followed
  *     (a longer run leaves no split — digits are not spaces); the
  *     {3} groups are exact.
  *   - ip `\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b`: each
  *     interior group matches iff its digit run is ≤ 3 (the dot can
  *     only sit at the run's end); the last group additionally needs
  *     the run to end at a word boundary (so a 4th digit — or any
  *     word char — kills the match, exactly the `\b` behavior).
  *
  * CodegenFallback (TermHits precedent); alias the struct ONCE and
  * getField from the alias — the SubwordEncode CSE rule.
  */
case class PiiScan(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"graft_pii_scan expects string, got $t")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_email", LongType, nullable = false),
    StructField("n_phone", LongType, nullable = false),
    StructField("n_ip", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pii_scan"

  override def nullSafeEval(input: Any): Any = {
    val s0 = input.asInstanceOf[UTF8String].toString
    // counts run on the ORIGINAL text (the declarative piiCols do), while
    // redaction is the SEQUENTIAL chain — they can diverge when an email
    // match swallows the tail of a phone/IP (the phone still counts, but
    // the email placeholder breaks its redaction match), so the phone/IP
    // counting scans cannot reuse the redaction scans' inputs
    val (e, s1) = PiiScan.scanEmails(s0)
    val p = PiiScan.scanPhones(s0)._1
    val q = PiiScan.scanIps(s0)._1
    val s2 = PiiScan.scanPhones(s1)._2
    val s3 = PiiScan.scanIps(s2)._2
    InternalRow(e, p, q, UTF8String.fromString(s3))
  }

  override protected def withNewChildInternal(newChild: Expression): PiiScan =
    copy(child = newChild)
}

object PiiScan {

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  /** Java-regex `\b` word codepoint — the quirk that matters: `\b` is
    * UNICODE-aware in java.util.regex even while `\w` stays ASCII, so
    * a CJK letter suppresses the boundary. The class is the JDK's
    * UnicodeProp.WORD: alphabetic, digits, marks, connector
    * punctuation, join controls.
    */
  private[functions] def isWordCp(cp: Int): Boolean =
    Character.isAlphabetic(cp) || Character.isDigit(cp) || cp == 0x200C ||
      cp == 0x200D || {
        val t = Character.getType(cp)
        t == Character.NON_SPACING_MARK || t == Character.ENCLOSING_MARK ||
          t == Character.COMBINING_SPACING_MARK ||
          t == Character.CONNECTOR_PUNCTUATION
      }
  private def isLocal(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '_' || c == '%' || c == '+' || c == '-'
  private def isDomain(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '-'

  /** (count, redacted) for the email pattern. */
  private[functions] def scanEmails(s: String): (Long, String) = {
    if (s.indexOf('@') < 0) return (0L, s)
    val out = new java.lang.StringBuilder(s.length)
    var count = 0L
    var i = 0
    while (i < s.length) {
      if (isLocal(s.charAt(i))) {
        var j = i
        while (j < s.length && isLocal(s.charAt(j))) j += 1
        if (j < s.length && s.charAt(j) == '@') {
          // maximal domain run after '@'
          val k = j + 1
          var m = k
          while (m < s.length && isDomain(s.charAt(m))) m += 1
          // last dot with >= 1 domain char before it and >= 2 letters after
          var end = -1
          var d = m - 1
          while (end < 0 && d >= k + 1) {
            if (s.charAt(d) == '.') {
              var a = d + 1
              while (a < s.length && isAlpha(s.charAt(a))) a += 1
              if (a - (d + 1) >= 2) end = a
            }
            d -= 1
          }
          if (end >= 0) {
            out.append("<EMAIL>")
            count += 1
            i = end
          } else {
            // every suffix of the run fails the same way: copy through '@'
            out.append(s, i, j + 1)
            i = j + 1
          }
        } else {
          out.append(s, i, j)
          i = j
        }
      } else {
        out.append(s.charAt(i))
        i += 1
      }
    }
    (count, out.toString)
  }

  /** (count, redacted) for the phone pattern. */
  private[functions] def scanPhones(s: String): (Long, String) = {
    if (s.indexOf('+') < 0) return (0L, s)
    val out = new java.lang.StringBuilder(s.length)
    var count = 0L
    var i = 0
    while (i < s.length) {
      var end = -1
      if (s.charAt(i) == '+') {
        var r = i + 1
        while (r < s.length && isDigit(s.charAt(r))) r += 1
        val run = r - (i + 1)
        if (run >= 1 && run <= 3 && r < s.length && s.charAt(r) == ' ') {
          // three exact [0-9]{3} groups, space-separated
          var p = r + 1
          var g = 0
          var ok = true
          while (ok && g < 3) {
            if (p + 3 <= s.length && isDigit(s.charAt(p)) &&
                isDigit(s.charAt(p + 1)) && isDigit(s.charAt(p + 2))) {
              p += 3
              if (g < 2) {
                if (p < s.length && s.charAt(p) == ' ') p += 1 else ok = false
              }
            } else ok = false
            g += 1
          }
          if (ok) end = p
        }
      }
      if (end >= 0) { out.append("<PHONE>"); count += 1; i = end }
      else { out.append(s.charAt(i)); i += 1 }
    }
    (count, out.toString)
  }

  /** (count, redacted) for the IP pattern. */
  private[functions] def scanIps(s: String): (Long, String) = {
    val out = new java.lang.StringBuilder(s.length)
    var count = 0L
    var i = 0
    while (i < s.length) {
      var end = -1
      if (isDigit(s.charAt(i)) &&
          (i == 0 || !isWordCp(Character.codePointBefore(s, i)))) {
        var p = i
        var ok = true
        var g = 0
        while (ok && g < 4) {
          var r = p
          while (r < s.length && isDigit(s.charAt(r))) r += 1
          val run = r - p
          if (run >= 1 && run <= 3) {
            if (g < 3) {
              if (r < s.length && s.charAt(r) == '.') p = r + 1 else ok = false
            } else {
              // trailing \b: the run must end at a non-word codepoint or EOS
              if (r == s.length || !isWordCp(Character.codePointAt(s, r))) p = r
              else ok = false
            }
          } else ok = false
          g += 1
        }
        if (ok) end = p
      }
      if (end >= 0) { out.append("<IP>"); count += 1; i = end }
      else { out.append(s.charAt(i)); i += 1 }
    }
    (count, out.toString)
  }
}
