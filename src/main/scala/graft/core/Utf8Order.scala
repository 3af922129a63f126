package graft.core

import org.apache.spark.unsafe.types.UTF8String

/** Unsigned-UTF-8-byte string ordering — the collation parquet footers use
  * for BINARY min/max stats (parquet-mr orders BinaryStatistics by unsigned
  * lexicographic bytes) and the order Spark SQL itself sorts UTF8_BINARY
  * strings in. JVM `String.compareTo` compares UTF-16 code units instead,
  * and the two orders INVERT for supplementary-plane characters: the UTF-16
  * surrogate range 0xD800–0xDFFF sorts below U+E000, but the UTF-8 bytes of
  * U+10000+ sort above it. Every comparison of footer-derived string
  * min/max against a predicate literal or an incoming key must therefore go
  * through this object, never `<=` on `String` — otherwise a file whose
  * recorded range brackets a non-BMP value can be pruned while containing
  * matches (wrong answers on reads, duplicate keys on upserts).
  *
  * Reference behavior: hudi compares the raw footer `Binary` without ever
  * decoding to UTF-16 (hudi-client-common
  * ParquetUtils.readMinMaxRecordKeys + SparkHoodieBloomIndex.java:165-191).
  */
object Utf8Order extends Serializable {
  def compare(a: String, b: String): Int =
    UTF8String.fromString(a).binaryCompare(UTF8String.fromString(b))

  def lteq(a: String, b: String): Boolean = compare(a, b) <= 0
  def lt(a: String, b: String): Boolean = compare(a, b) < 0
  def gteq(a: String, b: String): Boolean = compare(a, b) >= 0
  def gt(a: String, b: String): Boolean = compare(a, b) > 0

  /** [lo, hi] overlaps [lo2, hi2] in byte order. */
  def rangesOverlap(lo: String, hi: String, lo2: String, hi2: String): Boolean =
    lteq(lo, hi2) && gteq(hi, lo2)

  /** Comparable wrapper so heterogeneous `Comparable[Any]` min/max folds
    * (e.g. the cross-row-group footer-stats fold) order strings by UTF-8
    * bytes while numerics keep their natural order. `toString` returns the
    * raw string so downstream stat maps are unchanged.
    */
  final case class Str(s: String) extends Comparable[Str] {
    override def compareTo(o: Str): Int = Utf8Order.compare(s, o.s)
    override def toString: String = s
  }
}
