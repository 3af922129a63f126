package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/C4-style repetition signals — the standard "too much repeated
  * content" filters a training-data pipeline applies on top of the shape
  * heuristics in [[TextStats]] (Rae et al. 2021 §A1.1: fraction of
  * characters in the most frequent word n-gram, fraction of characters in
  * duplicated n-grams; C4's repeated-content drops).
  *
  * Scale design: every signal is row-local — tokens, n-grams, and run
  * statistics are pure expression trees over the text column, so the
  * whole annotation is a single narrow projection with NO shuffle at any
  * corpus size. Per-row cost is O(g log g) in the document's gram count
  * (one array_sort + linear run scans), not O(g²): gram frequencies come
  * from run lengths of the SORTED gram list, never a nested
  * count-each-gram loop — the difference between linear and quadratic on
  * 100k-token documents.
  *
  * Every arithmetic step (sort order on lowercase tokens is plain binary,
  * integer char counts, one double division, round(…,4)) is replayed
  * bit-for-bit by the DuckDB oracle.
  */
object Repetition {

  /** Whitespace tokens of the lowercased text, multiplicity preserved
    * ([[Dedup.shingles]] dedups; repetition signals need the counts).
    */
  def tokens(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => length(t) > 0)

  /** All word `n`-grams (space-joined, with multiplicity). Fewer than `n`
    * tokens → empty (a short text has no repetition evidence at width n).
    */
  private def gramsOf(tk: Column, n: Int): Column =
    when(size(tk) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(tk) - (n - 1)),
        i => array_join(slice(tk, i, lit(n)), " ")))

  /** Run statistics over the sorted gram list:
    * `struct(top_cov, dup_cov)` — the max character mass covered by any
    * single gram value (count × gram length) and the total character mass
    * of gram values occurring more than once.
    *
    * Shape matters for interpreted higher-order-function eval: a lambda
    * body that references another COMPUTED array re-evaluates that whole
    * expression per element (an index-based runs formulation here went
    * super-quadratic per row — 10+ minutes for 500 short docs). This is
    * one `aggregate` scan over the sorted list whose lambdas touch only
    * the accumulator and the element: O(g log g) sort + O(g) fold, the
    * classic run-length pass with the open run finalized in the
    * aggregate's finish function.
    */
  private def runCoverage(grams: Column): Column = {
    val s = array_sort(grams)
    val zero = struct(lit(null).cast("string").as("prev"), lit(0).as("rl"),
      lit(0).as("top"), lit(0).as("dup"))
    // coverage of the run the accumulator is about to close (0 before any)
    def closedCov(acc: Column): Column =
      when(acc.getField("prev").isNull, lit(0))
        .otherwise(acc.getField("rl") * length(acc.getField("prev")))
    aggregate(s, zero,
      (acc, x) => {
        val same = acc.getField("prev").isNotNull && (acc.getField("prev") === x)
        val cov = closedCov(acc)
        struct(
          x.as("prev"),
          when(same, acc.getField("rl") + lit(1)).otherwise(lit(1)).as("rl"),
          when(same, acc.getField("top"))
            .otherwise(greatest(acc.getField("top"), cov)).as("top"),
          when(same, acc.getField("dup"))
            .otherwise(acc.getField("dup") +
              when(acc.getField("rl") > lit(1), cov).otherwise(lit(0))).as("dup"))
      },
      acc => {
        val cov = closedCov(acc)
        struct(
          greatest(acc.getField("top"), cov).as("top_cov"),
          (acc.getField("dup") +
            when(acc.getField("rl") > lit(1), cov).otherwise(lit(0))).as("dup_cov"))
      })
  }

  /** All signals from a MATERIALIZED token-array column — annotate
    * through this (tokenizing once) rather than per-signal calls that
    * each re-run the split regex. Fields, each rounded to 4 decimals:
    *  - `uniq_word_ratio`: distinct / total tokens (low = repetitive)
    *  - `top2_frac`, `top3_frac`: chars covered by the most frequent
    *    word 2-/3-gram ÷ normalized chars (Gopher drops > 0.20 / 0.18)
    *  - `dup5_frac`: chars in duplicated 5-grams ÷ normalized chars,
    *    clamped to 1 (overlapping grams over-count; Gopher drops > 0.15)
    * Normalized chars = single-space-joined token length, so the
    * denominator matches the gram strings' own alphabet.
    */
  def signalsFromTokens(tk: Column): Column = {
    val nc = length(array_join(tk, " "))
    def frac(cov: Column): Column =
      when(nc === lit(0), lit(0.0))
        .otherwise(least(lit(1.0), cov.cast("double") / nc))
    // empty gram list folds to (0, 0) — no special-casing needed
    def covOf(n: Int): Column = runCoverage(gramsOf(tk, n))
    val c2 = covOf(2); val c3 = covOf(3); val c5 = covOf(5)
    def topFrac(c: Column): Column = frac(c.getField("top_cov"))
    def dupFrac(c: Column): Column = frac(c.getField("dup_cov"))
    val uniq = when(size(tk) === lit(0), lit(0.0))
      .otherwise(size(array_distinct(tk)).cast("double") / size(tk))
    struct(
      round(uniq, 4).as("uniq_word_ratio"),
      round(topFrac(c2), 4).as("top2_frac"),
      round(topFrac(c3), 4).as("top3_frac"),
      round(dupFrac(c5), 4).as("dup5_frac"))
  }

  /** Single-column form: the NATIVE one-pass expression
    * ([[graft.functions.RepSignals]] — all four signals from one
    * tokenization, ~6× the declarative fold). [[signalsFromTokens]] above
    * is the declarative reference semantics; RepetitionSpec asserts the
    * two agree value-for-value.
    */
  def signals(text: Column): Column = graft.functions.RepSignals.repSignals(text)

  /** Gopher-style keep/drop verdict from the (rounded) signals. */
  def repetitionOk(sig: Column): Column =
    sig.getField("top2_frac") <= lit(0.2) &&
      sig.getField("top3_frac") <= lit(0.18) &&
      sig.getField("dup5_frac") <= lit(0.15)

  /** Annotate a documents frame with the repetition signal set (native
    * one-pass expression).
    */
  def annotate(df: DataFrame, textCol: String = "text"): DataFrame = {
    df.withColumn("_rep_sig", signals(col(textCol)))
      .withColumn("uniq_word_ratio", col("_rep_sig.uniq_word_ratio"))
      .withColumn("top2_frac", col("_rep_sig.top2_frac"))
      .withColumn("top3_frac", col("_rep_sig.top3_frac"))
      .withColumn("dup5_frac", col("_rep_sig.dup5_frac"))
      .withColumn("rep_ok", repetitionOk(col("_rep_sig")))
      .drop("_rep_sig")
  }
}
