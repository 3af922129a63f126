package graft.pipeline

import org.apache.spark.unsafe.types.UTF8String

/** Row-local URL normalization helpers behind the codegen'd expressions
  * [[graft.functions.IdnAscii]] / [[graft.functions.PercentNormalize]] —
  * static JVM methods so the generated code stays a single call, zero
  * shuffle, no UDF wrapper.
  */
object UrlNorm {

  /** IDN → punycode host mapping (RFC 3490 ToASCII via the JDK's
    * `java.net.IDN`): `bücher.example` ≡ `xn--bcher-kva.example`, so
    * PSL/domain grouping sees ONE key per internationalized host. The
    * result is lowercased (pure-ASCII labels skip nameprep, which would
    * otherwise leave their case alone); a host ToASCII refuses (empty
    * label, oversize label) passes through lowercased rather than
    * nulling — grouping keeps the raw key instead of losing the row.
    */
  def idnAscii(host: String): String = {
    if (host == null) return null
    val mapped =
      try java.net.IDN.toASCII(host)
      catch { case _: IllegalArgumentException => host }
    var i = 0
    var hasUpper = false
    while (i < mapped.length && !hasUpper) {
      val c = mapped.charAt(i)
      if (c >= 'A' && c <= 'Z') hasUpper = true
      i += 1
    }
    if (hasUpper) mapped.toLowerCase(java.util.Locale.ROOT) else mapped
  }

  /** Codegen hot path for [[idnAscii]]. */
  def idnAscii(host: UTF8String): UTF8String = {
    if (host == null) return null
    val s = host.toString
    // fast path: pure printable ASCII with no uppercase needs no mapping
    var i = 0
    var ascii = true
    while (i < s.length && ascii) {
      val c = s.charAt(i)
      if (c >= 128 || (c >= 'A' && c <= 'Z')) ascii = false
      i += 1
    }
    if (ascii) host else UTF8String.fromString(idnAscii(s))
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** RFC 3986 §6.2.2 percent-encoding normalization: hex digits of
    * escapes UPPERCASE (`%2f` ≡ `%2F`), escapes of UNRESERVED characters
    * decode (`%7E` ≡ `~`, `%41` ≡ `A`) — the two rules that make
    * syntactically-different encodings of the same URL compare equal.
    * Reserved escapes (`%2F`) stay encoded: decoding them would change
    * the URL's structure. Malformed `%` sequences pass through verbatim.
    */
  def percentNormalize(s: String): String = {
    if (s == null) return null
    var i = s.indexOf('%')
    if (i < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    b.append(s, 0, i)
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = (hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) b.append(v.toChar)
        else {
          b.append('%')
          b.append(Character.toUpperCase(s.charAt(i + 1)))
          b.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Codegen hot path for [[percentNormalize]]. */
  def percentNormalize(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    val out = percentNormalize(str)
    if (out eq str) s else UTF8String.fromString(out)
  }
}
