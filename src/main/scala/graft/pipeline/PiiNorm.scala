package graft.pipeline

import org.apache.spark.unsafe.types.UTF8String

/** Luhn-validated credit/debit-card redaction — the row-local helper
  * behind [[graft.functions.ScrubCreditCards]]. Pattern-only card
  * detection drowns in false positives (order ids, timestamps); the
  * industry-standard filter is pattern + Luhn mod-10 check, which this
  * implements in one left-to-right scan:
  *
  *  - a candidate is a maximal run of digits, spaces and dashes that
  *    starts and ends with a digit and contains 13-19 digits (PAN
  *    lengths) with at most single separators between digit groups;
  *  - the digit string must pass the Luhn checksum;
  *  - valid candidates replace with `<CC>`; everything else (too
  *    short/long, failed checksum, phone shapes) passes through
  *    byte-identical.
  */
object PiiNorm {

  val CcToken = "<CC>"

  /** Luhn mod-10 over a digit string. */
  def luhnValid(digits: String): Boolean = {
    if (digits.isEmpty) return false
    var sum = 0
    var alt = false
    var i = digits.length - 1
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (alt) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      alt = !alt
      i -= 1
    }
    sum % 10 == 0
  }

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isSep(c: Char): Boolean = c == ' ' || c == '-'

  /** Redact Luhn-valid 13-19 digit card numbers (plain, spaced or
    * dashed) with [[CcToken]]. Returns the input REFERENCE when nothing
    * matches — the common no-PII row allocates nothing.
    */
  def scrubCc(s: String): String = {
    if (s == null) return null
    var out: java.lang.StringBuilder = null
    var i = 0
    var emitted = 0 // chars of s already appended to out
    while (i < s.length) {
      if (isDigit(s.charAt(i)) && (i == 0 || !isDigit(s.charAt(i - 1)))) {
        // scan the maximal digit[+sep]digit run from i
        val digits = new java.lang.StringBuilder(20)
        var j = i
        var end = i // exclusive end of the last digit seen
        while (j < s.length && digits.length() <= 19 &&
            (isDigit(s.charAt(j)) ||
              (isSep(s.charAt(j)) && j + 1 < s.length && isDigit(s.charAt(j + 1)) &&
                j > i && isDigit(s.charAt(j - 1))))) {
          if (isDigit(s.charAt(j))) { digits.append(s.charAt(j)); end = j + 1 }
          j += 1
        }
        val n = digits.length()
        if (n >= 13 && n <= 19 && luhnValid(digits.toString)) {
          if (out == null) out = new java.lang.StringBuilder(s.length)
          out.append(s, emitted, i).append(CcToken)
          emitted = end
          i = end
        } else {
          i = end // skip the whole run — no partial re-matching
          if (n > 19) {
            // the scan stopped on the 20-digit budget, not the run's end:
            // consume the rest of the PHYSICAL run (digits and embedded
            // single separators) so no sub-candidate can start inside one
            // overlong run — a 36-digit serial with a dash in it is not a
            // card with a preamble
            while (i < s.length && (isDigit(s.charAt(i)) ||
                (isSep(s.charAt(i)) && i + 1 < s.length &&
                  isDigit(s.charAt(i + 1)) && isDigit(s.charAt(i - 1)))))
              i += 1
          }
        }
      } else i += 1
    }
    if (out == null) s
    else { out.append(s, emitted, s.length); out.toString }
  }

  /** Codegen hot path. */
  def scrubCc(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    val r = scrubCc(str)
    if (r eq str) s else UTF8String.fromString(r)
  }
}
