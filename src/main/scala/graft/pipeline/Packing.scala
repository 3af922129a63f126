package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to ~`maxTokensPerBin`-token bins —
  * the batch-shaping step before concatenating documents into training
  * context windows.
  *
  * Deterministic and distributed: documents are first spread across
  * `buckets` by their stable md5 bucket (same family as [[Sampling]]), and
  * packed WITHIN a bucket by a running token total in id order — bin k of
  * a bucket holds the docs whose cumulative token count starts in
  * [k·max, (k+1)·max). One shuffle on the bucket column; each bucket
  * packs independently, so parallelism = `buckets` regardless of corpus
  * size. The cumulative-start rule is the standard SQL-replayable
  * approximation of greedy sequential fill: a bin's total may overrun
  * `maxTokensPerBin` by at most one document (the one straddling the
  * boundary), and a document longer than the bin size gets a bin of its
  * own.
  */
object Packing {

  /** Adds `bucket`, `bin_id` (= "bucket/k") and the doc's token count. */
  def packIntoBins(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxTokensPerBin: Long = 2048,
      buckets: Int = 64): DataFrame = {
    val nTok = TextStats.tokenCount(col(textCol)).cast("long")
    val bucket = pmod(Sampling.hashBucket(col(idCol)), lit(buckets.toLong))
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", nTok)
      .withColumn("bucket", bucket)
      .withColumn("_pk_cum", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin_id",
        concat(col("bucket"), lit("/"), (col("_pk_cum") / maxTokensPerBin).cast("long")))
      .drop("_pk_cum")
  }

  /** Per-bin rollup: doc count and token total (diagnostics / writer
    * input). Bins whose total exceeds `maxTokensPerBin` by more than one
    * straddling doc indicate a tokenizer mismatch upstream.
    */
  def binStats(packed: DataFrame): DataFrame =
    packed.groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
}
