package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus cleaning for LLM training data: C4-style line/document filters
  * (the public rules from "Exploring the Limits of Transfer Learning with
  * a Unified Text-to-Text Transformer", §2.2 — terminal-punctuation lines,
  * minimum word counts, boilerplate and code markers) and PII scrubbing
  * (the standard email/IP/phone redaction pass corpora like The Pile and
  * RefinedWeb document publicly).
  *
  * Everything here is a row-local codegen'd expression — no shuffle, no
  * UDF — so cleaning 100 TB is one map-shaped scan that fuses into
  * whatever reads or writes surround it.
  */
object Cleaning {

  // ------------------------------------------------------------------ PII

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Redact emails, IPv4 addresses and NNN-NNN-NNNN phone numbers with
    * typed placeholder tokens. Order matters: emails first (an address
    * can contain digit runs), then IPs (dotted digits would otherwise
    * half-match the phone pattern), then phones.
    */
  def scrubPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    regexp_replace(noIp, PhoneRe, "<PHONE>")
  }

  /** Count of PII matches (pre-scrub), for audit reporting. */
  def piiCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0))) +
      size(regexp_extract_all(text, lit(Ipv4Re), lit(0))) +
      size(regexp_extract_all(text, lit(PhoneRe), lit(0)))

  /** Redact Luhn-valid credit/debit card numbers (13-19 digits, plain or
    * single-space/dash separated) with `<CC>` — the checksum gate keeps
    * order ids and timestamps out, which a bare digit-run regex cannot
    * (see [[graft.pipeline.PiiNorm]]); a native codegen'd expression,
    * not a UDF, and the no-match row passes through by reference.
    */
  def scrubCreditCards(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.ScrubCreditCards(
        org.apache.spark.sql.GraftSqlBridge.expressionOf(text)))

  /** The full redaction pass: emails, IPs, phones, then Luhn-valid card
    * numbers (cards LAST — `<EMAIL>`/`<IP>` tokens carry no digits, and
    * phone shapes are too short for the PAN window).
    */
  def scrubPiiAll(text: Column): Column = scrubCreditCards(scrubPii(text))

  // -------------------------------------------------- HTML text extraction

  /** HTML → text: drop script/style payloads, strip tags, decode the six
    * common entities, collapse whitespace — the boilerplate-extraction
    * front end of a web-corpus pipeline (the regex tier of tools like
    * jusText/trafilatura; DOM-aware density scoring is a model choice
    * layered above, this is the deterministic base every pipeline runs).
    *
    * Still a row-local codegen'd expression chain: extraction of 100 TB
    * of crawl HTML is one map-shaped scan. Patterns deliberately avoid
    * backreferences so the SAME regexes replay on RE2-based engines
    * (DuckDB/Go) — the oracle runs them verbatim.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    // block-level closers read as line breaks so words don't fuse
    val noTag = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    // `&amp;` decodes LAST (standard entity-decode order): author-escaped
    // entities like `&amp;lt;` must come out as the literal `&lt;`, not
    // double-decode to `<`.
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTag) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  // ------------------------------------------------- text normalization

  /** Unicode text normalization — the pre-tokenization cleanup every
    * corpus pipeline runs before counting, hashing or training: control
    * chars drop, zero-width chars drop, unicode spaces unify to ASCII
    * space, curly quotes/dashes/ellipsis unify to their ASCII forms, and
    * runs of spaces/tabs collapse (NEWLINES are preserved — line
    * structure feeds the C4 rules and in-document line dedup downstream;
    * CRLF/bare-CR line endings unify to `\n` FIRST, so downstream
    * `split("\n")` stages never see `\r`-polluted lines).
    * A row-local codegen'd regex chain, zero shuffle; character classes
    * use `\x{...}` escapes, which parse identically under java.util.regex
    * and RE2 — the oracle replays the chain verbatim.
    */
  def normalizeText(text: Column): Column = {
    val nl = regexp_replace(text, "\\r\\n?", "\n")
    val noCtl = regexp_replace(nl,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val noZw = regexp_replace(noCtl, "[\\x{200B}-\\x{200D}\\x{FEFF}]", "")
    val sp = regexp_replace(noZw,
      "[\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]", " ")
    val q1 = regexp_replace(sp, "[\\x{2018}\\x{2019}\\x{201A}\\x{201B}]", "'")
    val q2 = regexp_replace(q1, "[\\x{201C}\\x{201D}\\x{201E}\\x{201F}]", "\"")
    val dash = regexp_replace(q2, "[\\x{2010}-\\x{2015}\\x{2212}]", "-")
    val ell = regexp_replace(dash, "\\x{2026}", "...")
    regexp_replace(ell, "[ \\t]+", " ")
  }

  /** [[normalizeText]] preceded by a Unicode normalization pass
    * (`java.text.Normalizer`, form ∈ NFC/NFD/NFKC/NFKD — NFKC is the
    * corpus-pipeline standard: full-width forms `Ａ１`→`A1`, ligatures
    * `ﬁ`→`fi`, combining sequences composed, so one spelling survives
    * into counting/hashing/dedup). The Unicode pass runs FIRST: NFKC
    * maps compatibility characters the ASCII chain then unifies (e.g.
    * U+2025 two-dot leader) and composes combining marks before the
    * space/quote classes match. Still row-local and codegen'd — the
    * normalizer is a native expression, not a UDF.
    */
  def normalizeText(text: Column, form: String): Column =
    normalizeText(org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.UnicodeNormalize(
        org.apache.spark.sql.GraftSqlBridge.expressionOf(text), form)))

  /** Remove repeated lines WITHIN one document, keeping each line's first
    * occurrence in order — the in-document half of boilerplate removal
    * (nav bars and footers repeating inside a page), complementing the
    * cross-corpus [[lineDedup]]. Pure array expressions (split →
    * `array_distinct` → join), row-local, zero shuffle. `array_distinct`
    * keeps each element's FIRST occurrence in order and runs on a hash
    * set, so the per-document cost is O(lines) — a 50k-line pathological
    * page is 50k hash probes in one task, not 1.25B compares.
    */
  def dedupLinesWithin(text: Column): Column =
    array_join(array_distinct(split(text, "\n")), "\n")

  // ------------------------------------------------------- C4 line rules

  /** Does one line survive C4's line filters? Ends in terminal
    * punctuation (`.`, `!`, `?`, `"`), has at least `minWords` words, and
    * carries no javascript boilerplate marker.
    */
  def c4KeepLine(line: Column, minWords: Int = 5): Column = {
    val t = trim(line)
    t.rlike("[.!?\"]$") &&
      size(split(t, "\\s+")) >= minWords &&
      !lower(t).contains("javascript")
  }

  /** Apply C4's cleaning to `textCol`: drop failing lines; drop the whole
    * document when it contains a blocklist marker (`lorem ipsum`, `{`) or
    * fewer than `minLines` lines survive. The cleaned text replaces
    * `textCol`; surviving line count is exposed as `n_lines`.
    */
  def c4Clean(df: DataFrame, textCol: String = "text",
      minWords: Int = 5, minLines: Int = 3): DataFrame = {
    val kept = filter(split(col(textCol), "\n"),
      l => c4KeepLine(l, minWords))
    df.withColumn("_c4_kept", kept)
      .filter(!lower(col(textCol)).contains("lorem ipsum") &&
        !col(textCol).contains("{") &&
        size(col("_c4_kept")) >= minLines)
      .withColumn(textCol, array_join(transform(col("_c4_kept"), trim(_)), "\n"))
      .withColumn("n_lines", size(col("_c4_kept")))
      .drop("_c4_kept")
  }

  /** Corpus-wide exact LINE dedup (RefinedWeb §"line-wise corrections" /
    * C4's repeated-span rule, applied at line grain across the WHOLE
    * corpus): a line appearing in more than `maxDocFreq` distinct
    * documents is boilerplate (nav bars, cookie banners, signatures) and
    * is dropped from every document; each document is reassembled in
    * original line order. Returns (idCol, textCol deduped, n_dropped).
    *
    * Scale shape: one posexplode (row-local), one aggregation keyed by
    * the line's md5 FINGERPRINT (32-hex shuffle keys, not line bodies;
    * md5 so the oracle can replay the exact grouping), one equi-join of
    * lines against the boilerplate-fingerprint set, one per-document
    * re-aggregation. No pairwise comparisons anywhere; the heavy shuffle
    * carries fingerprints + surviving lines only.
    */
  def lineDedup(df: DataFrame, maxDocFreq: Long = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val lines = df.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("_ld_pos", "_ld_line")))
      .withColumn("_ld_fp", md5(col("_ld_line")))
    // boilerplate = fingerprints whose DISTINCT-document frequency is high
    val boiler = lines.groupBy(col("_ld_fp"))
      .agg(countDistinct(col(idCol)).as("_ld_df"))
      .filter(col("_ld_df") > maxDocFreq)
      .select(col("_ld_fp"))
    val kept = lines.join(boiler, Seq("_ld_fp"), "left_anti")
    val total = lines.groupBy(col(idCol)).agg(count(lit(1)).as("_ld_total"))
    kept.groupBy(col(idCol))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("_ld_pos"), col("_ld_line")))),
          s => s.getField("_ld_line")), "\n").as(textCol),
        count(lit(1)).as("_ld_kept"))
      .join(total, Seq(idCol), "right_outer") // docs losing EVERY line survive, empty
      .select(col(idCol),
        coalesce(col(textCol), lit("")).as(textCol),
        (col("_ld_total") - coalesce(col("_ld_kept"), lit(0L))).as("n_dropped"))
  }
}
