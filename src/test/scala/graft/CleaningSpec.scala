package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Cleaning

class CleaningSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(Cleaning.scrubPii(col("t"))).first().getString(0)

  test("PII scrubbing: emails, IPs, dotted/dashed phones, clean text") {
    assert(scrub("mail a.b+c@ex-1.co.uk or x@y.io now") === "mail <EMAIL> or <EMAIL> now")
    assert(scrub("host 192.168.0.1:8080 up") === "host <IP>:8080 up")
    assert(scrub("call 555-123-4567 or 555.987.6543") === "call <PHONE> or <PHONE>")
    // an email containing dotted digits is ONE email, not email+IP
    assert(scrub("v1.2.3.4@example.com") === "<EMAIL>")
    assert(scrub("no pii here, just 3.14 and v2.0") === "no pii here, just 3.14 and v2.0")
    val counted = Seq("a@b.co and 10.0.0.1 and 555-123-4567").toDF("t")
      .select(Cleaning.piiCount(col("t"))).first().getInt(0)
    assert(counted === 3)
  }

  test("credit-card scrub: Luhn gate, formats, near-misses untouched") {
    def cc(s: String): String =
      Seq(s).toDF("t").select(Cleaning.scrubCreditCards(col("t"))).first().getString(0)
    // the three classic test PANs, three formats
    assert(cc("pay 4111111111111111 now") === "pay <CC> now")
    assert(cc("pay 4111-1111-1111-1111 now") === "pay <CC> now")
    assert(cc("pay 4111 1111 1111 1111 now") === "pay <CC> now")
    assert(cc("amex 378282246310005 ok") === "amex <CC> ok")
    // checksum failure: one digit off passes through byte-identical
    assert(cc("ref 4111111111111112 x") === "ref 4111111111111112 x")
    // length window: 12 digits too short, 20 too long
    assert(cc("id 411111111111 x") === "id 411111111111 x")
    assert(cc("id 41111111111111111118 x") === "id 41111111111111111118 x")
    // phone shapes never reach the PAN window
    assert(cc("call 555-123-4567 now") === "call 555-123-4567 now")
    // double separators break the run (not a PAN shape)
    assert(cc("a 4111 - 1111 - 1111 - 1111 b") === "a 4111 - 1111 - 1111 - 1111 b")
    // two cards in one text both redact; surrounding text survives
    assert(cc("a 4111111111111111 b 378282246310005 c") === "a <CC> b <CC> c")
    // overlong runs: a 21-digit run is untouched END TO END — the scan
    // skips to the run's true end, never restarting inside it
    assert(cc("sn 411111111111111111111 x") === "sn 411111111111111111111 x")
    // pinned: a valid card embedded in one physical run behind a >19-digit
    // preamble does NOT redact — the whole run is one overlong candidate
    // (a 36-digit dashed serial is not a card with a prefix)
    assert(cc("sn 11111111111111111111-4532015112830366 x") ===
      "sn 11111111111111111111-4532015112830366 x")
    // but the same card in its OWN run (comma breaks the run — spaces and
    // dashes between digits do NOT, they are PAN separators) still redacts
    assert(cc("sn 11111111111111111111, 4532015112830366 x") ===
      "sn 11111111111111111111, <CC> x")
    // composition: the full pass scrubs everything in one chain
    val all = Seq("m a@b.co ip 10.0.0.1 tel 555-123-4567 cc 4111111111111111 .")
      .toDF("t").select(Cleaning.scrubPiiAll(col("t"))).first().getString(0)
    assert(all === "m <EMAIL> ip <IP> tel <PHONE> cc <CC> .")
  }

  test("HTML extraction: scripts/styles/comments drop, tags strip, entities decode") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      (1L, "<html><body><p>Hello <b>world</b>!</p></body></html>", "Hello world !"),
      // script payload containing a tag and a newline disappears whole
      (2L, "<p>keep</p><script type=\"x\">\nvar s = \"<p>no</p>\";\n</script><p>also</p>",
        "keep also"),
      (3L, "<style>h1 { font-size: 2em }</style>plain", "plain"),
      (4L, "a<!-- hidden\ntext -->b", "a b"),
      (5L, "Tom &amp; Jerry &lt;3 &quot;quoted&quot; &#39;q&#39;&nbsp;end",
        "Tom & Jerry <3 \"quoted\" 'q' end"),
      (6L, "  lots   of\n\twhitespace  ", "lots of whitespace"),
      (7L, "no markup at all.", "no markup at all."),
      // author-ESCAPED entities single-decode: &amp; applies LAST, so
      // &amp;lt;b&amp;gt; is the literal text "&lt;b&gt;", not "<b>"
      (8L, "&amp;lt;b&amp;gt; and &amp;amp; stay escaped", "&lt;b&gt; and &amp; stay escaped"),
      (9L, "mixed &lt;real&gt; vs &amp;lt;escaped&amp;gt;", "mixed <real> vs &lt;escaped&gt;"))
    val got = cases.toDF("id", "html", "want")
      .select(col("id"), graft.pipeline.Cleaning.htmlToText(col("html")).as("got"),
        col("want"))
      .collect()
    got.foreach(r => assert(r.getString(1) === r.getString(2), s"case ${r.getLong(0)}"))
  }

  test("in-document line dedup: first occurrence kept in order") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      (1L, "a\nb\na\nc\nb", "a\nb\nc"),
      (2L, "only one line", "only one line"),
      (3L, "x\nx\nx", "x"),
      // blank lines dedup like any other line (one survives, first slot)
      (4L, "p\n\nq\n\np", "p\n\nq"),
      // long document: 50k lines over 1k distinct values finishes in the
      // hash-set pass (first occurrence of each value, in order)
      (5L, (0 until 50000).map(i => s"line-${i % 1000}").mkString("\n"),
        (0 until 1000).map(i => s"line-$i").mkString("\n")))
    cases.toDF("id", "txt", "want")
      .select(col("id"), graft.pipeline.Cleaning.dedupLinesWithin(col("txt")).as("got"),
        col("want"))
      .collect()
      .foreach(r => assert(r.getString(1) === r.getString(2), s"case ${r.getLong(0)}"))
  }

  test("unicode normalization: controls, zero-width, spaces, quotes, dashes, ellipsis") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      (1L, "“hi” and ‘lo’", "\"hi\" and 'lo'"),
      (2L, "a\u00A0b\u2003c\u3000d", "a b c d"),
      (3L, "zero\u200Bwidth\u200D\uFEFFgone", "zerowidthgone"),
      (4L, "bell\u0007 del\u007F tab\t\ttab", "bell del tab tab"),
      (5L, "en–dash em—dash minus−sign", "en-dash em-dash minus-sign"),
      (6L, "wait… more", "wait... more"),
      // newlines SURVIVE (line structure feeds C4 + line dedup), only
      // space/tab runs collapse
      (7L, "line one  \t\nline\ttwo", "line one \nline two"),
      // CRLF and bare CR unify to \n FIRST, so split("\n") stages never
      // see \r-polluted lines
      (9L, "win\r\nline\rmac\nunix", "win\nline\nmac\nunix"),
      (8L, "plain ascii stays.", "plain ascii stays."))
    cases.toDF("id", "txt", "want")
      .select(col("id"), graft.pipeline.Cleaning.normalizeText(col("txt")).as("got"),
        col("want"))
      .collect()
      .foreach(r => assert(r.getString(1) === r.getString(2), s"case ${r.getLong(0)}"))
  }

  test("NFKC mode: full-width, ligatures, combining marks, compat chars") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // full-width forms fold to ASCII
      (1L, "Ｇｒａｆｔ １２３", "Graft 123"),
      // ligatures expand
      (2L, "ﬁle ﬂy", "file fly"),
      // combining acute composes (e + U+0301 -> U+00E9), NOT stripped
      (3L, "cafe\u0301", "caf\u00E9"),
      // compatibility chars decompose: superscript, roman numeral, unit
      (4L, "x² Ⅻ ㎞", "x2 XII km"),
      // the ASCII chain still runs after the fold (NBSP + curly quotes)
      (5L, "“hi” there", "\"hi\" there"),
      // plain ASCII passes through untouched
      (6L, "plain ascii stays.", "plain ascii stays."))
    cases.toDF("id", "txt", "want")
      .select(col("id"),
        graft.pipeline.Cleaning.normalizeText(col("txt"), "NFKC").as("got"),
        col("want"))
      .collect()
      .foreach(r => assert(r.getString(1) === r.getString(2), s"case ${r.getLong(0)}"))
    // unknown forms refuse at construction
    intercept[IllegalArgumentException] {
      graft.pipeline.Cleaning.normalizeText(col("txt"), "NFZZ")
    }
  }

  test("C4 line rule: punctuation, word count, javascript marker") {
    def keep(s: String): Boolean =
      Seq(s).toDF("l").select(Cleaning.c4KeepLine(col("l"))).first().getBoolean(0)
    assert(keep("this line has enough words and ends well."))
    assert(keep("he said it was \"done and proven right here\""))
    assert(keep("is this a question with enough words?"))
    assert(!keep("four words not enough."))
    assert(!keep("no terminal punctuation despite having many words here"))
    assert(!keep("please enable JavaScript to view the comments."))
  }

  test("C4 doc rules: lorem ipsum, braces, min surviving lines") {
    val df = Seq(
      (1L, "a good first line with enough words here.\nanother good line with plenty of words too.\na third fine line to clear the minimum bar."),
      (2L, "a good first line with enough words here.\nshort one.\nanother good line with plenty of words too."), // 2 survive < 3
      (3L, "lorem ipsum dolor sit amet consectetur adipiscing elit.\nmore good words in a second line right here.\na third fine line to clear the minimum bar."),
      (4L, "function f() { return 1; } with extra words here.\nmore good words in a second line right here.\na third fine line to clear the minimum bar.")
    ).toDF("doc_id", "text")
    val out = Cleaning.c4Clean(df).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    assert(out.head.getInt(2) === 3)
    assert(out.head.getString(1).linesIterator.size === 3)
  }

  test("line dedup: cross-corpus boilerplate drops, order survives, empty docs survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "banner\nunique one\nbanner\nclosing a"),
      (2L, "banner\nunique two\nclosing b"),
      (3L, "banner\nunique three\nclosing c"),
      (4L, "banner")).toDF("doc_id", "text")
    val out = graft.pipeline.Cleaning.lineDedup(docs, maxDocFreq = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // "banner" is in 4 distinct docs -> dropped everywhere (BOTH copies in
    // doc 1); unique + closing lines keep their original relative order
    assert(out(0) === ((1L, "unique one\nclosing a", 2L)))
    assert(out(1) === ((2L, "unique two\nclosing b", 1L)))
    assert(out(2) === ((3L, "unique three\nclosing c", 1L)))
    // a doc that was ALL boilerplate survives as an empty row, not a drop
    assert(out(3) === ((4L, "", 1L)))
  }

  test("exact-substring span dedup: duplicated windows cut everywhere, overlaps merge") {
    import spark.implicits._
    // shared passage "p q r s" rides inside two otherwise-distinct docs;
    // doc 3 repeats a window INTERNALLY ("x y z w x y z w" with k=4 has
    // "x y z w" twice via overlapping starts 0 and 4)
    val docs = Seq(
      (1L, "a b c p q r s d e"),
      (2L, "f g p q r s h"),
      (3L, "x y z w x y z w"),
      (4L, "unique words only here")).toDF("doc_id", "text")
    val out = graft.pipeline.Dedup.exactSpanDedup(docs, k = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // doc 1: duplicated 4-window is "p q r s" (the only window text shared
    // with doc 2) -> those 4 tokens drop, prefix/suffix survive in order
    assert(out(0) === ((1L, "a b c d e", 4L)))
    assert(out(1) === ((2L, "f g h", 4L)))
    // doc 3: windows at starts 0..4; "x y z w" (0 and 4) duplicated ->
    // covered positions 0-3 and 4-7: the whole doc is duplicated spans
    assert(out(2) === ((3L, "", 8L)))
    // doc 4 is untouched (no window occurs twice)
    assert(out(3) === ((4L, "unique words only here", 0L)))
  }
}
