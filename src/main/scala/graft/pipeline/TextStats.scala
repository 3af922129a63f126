package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language id, fingerprinting. Everything is built from
  * codegen'd Spark SQL functions (no UDFs), so the operators stream
  * through whole-stage codegen and scale linearly with executors — no
  * shuffle at all for the per-document columns.
  */
object TextStats {

  /** One-pass native featurization (counts + language) — every ratio
    * below reads a field of this struct instead of re-scanning the text
    * with interpreted higher-order passes (see
    * [[graft.functions.TextFeatures]]); the ratio arithmetic itself stays
    * declarative, so result doubles are unchanged.
    */
  private def feats(text: Column): Column =
    graft.functions.TextFeatures.textFeatures(text)

  /** Whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = feats(text).getField("n_tokens")

  /** BPE-ish subword count: alphanumeric runs + punctuation runs — the
    * usual cheap proxy for tokenizer length (≈ GPT-2 regex family's
    * word/number/punct pieces). Run extraction, not boundary splitting:
    * the same definition replays in any regex engine (RE2 included).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("""[\p{L}\p{N}]+"""), lit(0))) +
      size(regexp_extract_all(text, lit("""[^\p{L}\p{N}\s]+"""), lit(0)))

  def charCount(text: Column): Column = length(text)

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      feats(text).getField("n_punct").cast("double") / length(text))

  def digitRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      feats(text).getField("n_digit").cast("double") / length(text))

  def upperRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      feats(text).getField("n_upper").cast("double") / length(text))

  def avgWordLen(text: Column): Column =
    when(tokenCount(text) === 0, 0.0).otherwise(
      feats(text).getField("sum_word_len").cast("double") / tokenCount(text))

  private val enStop = Seq("the", "of", "and", "to", "in", "a", "is", "that", "it", "was",
    "for", "on", "are", "as", "with", "at", "be", "this", "have", "or")

  /** Custom stopword lists fall back to the declarative form; the default
    * list reads the native count.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String] = enStop): Column =
    when(tokenCount(text) === 0, 0.0).otherwise(
      (if (stopwords == enStop) feats(text).getField("n_stop")
       else size(filter(tokens(lower(text)), t => t.isin(stopwords.map(lit): _*))))
        .cast("double") / tokenCount(text))

  /** Composite quality score in [0,1] — the C4/Gopher-style heuristic mix:
    * reasonable length, word shape, some stopwords, not mostly
    * punctuation/digits.
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(charCount(text).between(50, 100000), 1.0)
      .when(charCount(text) < 50, charCount(text) / 50.0).otherwise(0.5)
    val wordOk = when(avgWordLen(text).between(3.0, 12.0), 1.0).otherwise(0.4)
    val stopOk = when(stopwordRatio(text) > 0.05, 1.0)
      .otherwise(stopwordRatio(text) / 0.05 * 0.5 + 0.5)
    val punctOk = when(punctRatio(text) < 0.2, 1.0)
      .otherwise(greatest(lit(0.0), lit(1.0) - (punctRatio(text) - 0.2) * 2))
    val digitOk = when(digitRatio(text) < 0.3, 1.0)
      .otherwise(greatest(lit(0.0), lit(1.0) - digitRatio(text)))
    round((lenOk * 0.25 + wordOk * 0.2 + stopOk * 0.2 + punctOk * 0.2 + digitOk * 0.15), 4)
  }

  /** Stopword-profile language id over a fixed language set — the
    * classic cheap n-gram/wordlist heuristic. Returns the language code
    * with the highest stopword-hit count, 'und' when nothing matches.
    */
  def langId(text: Column): Column = feats(text).getField("lang_pred")

  /** The Unicode scripts the profile reports, with their java.util.regex
    * script-class names. A multilingual web corpus routes per-language
    * processing (tokenizer choice, quality thresholds, mixture weights)
    * off these ratios — the SCRIPT layer is deterministic where n-gram
    * language ID is statistical, and catches mixed-script spam (latin
    * body + CJK keyword stuffing) that per-language models miss.
    */
  val Scripts: Seq[String] = Seq(
    "Latin", "Cyrillic", "Arabic", "Han", "Hangul", "Hiragana",
    "Katakana", "Devanagari", "Greek", "Hebrew", "Thai")

  /** Per-script character ratios over the text's LETTERS: a struct of
    * `n_letters` plus one `<script>` fraction per [[Scripts]] entry
    * (0.0 when the text has no letters). Pure codegen'd `regexp_count`
    * passes — row-local, zero shuffle; ratios divide exact integer
    * counts, so an oracle replaying the counts gets bit-equal doubles.
    */
  def scriptProfile(text: Column): Column = {
    val letters = regexp_count(text, lit("\\p{L}"))
    val fracs = Scripts.map { s =>
      when(letters === 0, lit(0.0))
        .otherwise(regexp_count(text, lit(s"\\p{Is$s}")).cast("double") /
          letters.cast("double"))
        .as(s.toLowerCase)
    }
    struct((letters.cast("long").as("n_letters") +: fracs): _*)
  }

  /** Dominant script of the text: the [[Scripts]] entry with the highest
    * letter share, lowercased; `und` (undetermined) when no listed
    * script reaches `minShare` of the letters or the text has no
    * letters. Ties break to the later script name (array_max orders by
    * share then name) — deterministic either way.
    */
  def dominantScript(text: Column, minShare: Double = 0.5): Column = {
    val p = scriptProfile(text)
    val best = array_max(array(Scripts.map(s =>
      struct(p.getField(s.toLowerCase).as("share"),
        lit(s.toLowerCase).as("name"))): _*))
    when(best.getField("share") >= minShare, best.getField("name"))
      .otherwise(lit("und"))
  }

  /** Document fingerprint: 64-bit hash of whitespace/case-normalized text —
    * the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Portable fingerprint: md5 hex of the normalized text. Same dedup
    * semantics as [[fingerprint]] but reproducible by any engine with md5
    * (the DuckDB oracle computes the identical value).
    */
  def fingerprintHex(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Normalization-aware fingerprint (OPT-IN — default behavior above is
    * unchanged): a `java.text.Normalizer` pass (NFKC is the corpus
    * standard) plus the [[Cleaning.normalizeText]] cleanup chain run
    * BEFORE the case/whitespace fold, so full-width (`ｆｉｎ`→`fin`) and
    * ligature (`ﬁ`→`fi`) spellings of one document land in the SAME
    * exact-dedup group. Still a row-local codegen'd expression chain.
    */
  def fingerprint(text: Column, unicodeForm: String): Column =
    fingerprint(Cleaning.normalizeText(text, unicodeForm))

  /** Portable-hex twin of the normalization-aware [[fingerprint]]. */
  def fingerprintHex(text: Column, unicodeForm: String): Column =
    fingerprintHex(Cleaning.normalizeText(text, unicodeForm))

  /** Convenience: annotate a documents frame with the full stat set. */
  def annotate(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_tokens_bpe", bpeishTokenCount(t))
      .withColumn("n_chars_m", charCount(t))
      .withColumn("punct_ratio", round(punctRatio(t), 4))
      .withColumn("digit_ratio", round(digitRatio(t), 4))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 4))
      .withColumn("avg_word_len", round(avgWordLen(t), 4))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_id", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
