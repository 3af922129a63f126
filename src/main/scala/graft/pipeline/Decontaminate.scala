package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: drop training documents that share word
  * n-grams with an evaluation/benchmark set — the standard guard against
  * test-set leakage in LLM training corpora (n-gram overlap checks, n
  * around 8-13 words).
  *
  * Scale shape: both sides explode to (shingle, id) pairs and meet in ONE
  * equi-join on the shingle string — shuffle volume is O(total shingles),
  * never a doc×doc comparison. The contaminated-id set then drops train
  * rows via a left-anti join. The benchmark side is usually small enough
  * that Catalyst/AQE broadcasts it; nothing in the shape requires it.
  */
object Decontaminate {

  /** Training rows whose text shares at least one word `n`-gram with any
    * benchmark text are removed. Uses [[Dedup.shingles]] (distinct word
    * n-grams; texts shorter than `n` words collapse to one whole-text
    * shingle, so exact short-text copies still match).
    */
  def decontaminate(train: DataFrame, benchmark: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 8): DataFrame = {
    // spread shingle computation across the cluster before exploding — a
    // few-file source would otherwise run the whole tokenize+gram pass in
    // as many tasks as input splits (same shape as the dedup operators)
    val trainShingles = train
      .select(col(idCol).as("_dc_id"), col(textCol).as("_dc_t"))
      .repartition(col("_dc_id"))
      .select(col("_dc_id"),
        explode(Dedup.shingles(col("_dc_t"), n)).as("_dc_s"))
    val benchShingles = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("_dc_s"))
      .distinct()
    val contaminated = trainShingles
      .join(benchShingles, Seq("_dc_s"))
      .select(col("_dc_id")).distinct()
    train.join(contaminated, col(idCol) === col("_dc_id"), "left_anti")
  }

  /** Graded variant: per-train-doc overlap REPORT instead of a hard drop —
    * `(id, n_shingles, n_hits, contamination = hits/shingles)` over the
    * doc's DISTINCT word n-grams. Real pipelines threshold this score per
    * eval suite (and audit near-misses); [[decontaminate]] is the
    * `contamination > 0` special case. Same one-equi-join shape: the only
    * additions are two count aggregations keyed by doc id.
    */
  def contaminationScore(train: DataFrame, benchmark: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 8): DataFrame = {
    val trainShingles = train
      .select(col(idCol).as("_dc_id"), col(textCol).as("_dc_t"))
      .repartition(col("_dc_id"))
      .select(col("_dc_id"),
        explode(Dedup.shingles(col("_dc_t"), n)).as("_dc_s"))
    val benchShingles = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("_dc_s"))
      .distinct()
    val totals = trainShingles.groupBy(col("_dc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val hits = trainShingles.join(benchShingles, Seq("_dc_s"))
      .groupBy(col("_dc_id")).agg(count(lit(1)).as("n_hits"))
    totals.join(hits, Seq("_dc_id"), "left")
      .select(col("_dc_id").as(idCol), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_shingles"), 4)
          .as("contamination"))
  }
}
