package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking: split each document into overlapping token windows —
  * the context-window shaping step before embedding or training on long
  * documents (every RAG/pretraining pipeline carries one).
  *
  * Deterministic and row-local: chunk starts are a fixed-stride arithmetic
  * sequence over the document's own token array, so the operator is one
  * narrow `explode` projection — no shuffle, no state, and chunk identity
  * `(id, chunk_idx)` is stable under re-runs and partition layout. At
  * 100 TB the output is a constant factor of the input (≈ tokens ×
  * chunk/(chunk−overlap)); downstream operators see an ordinary table
  * keyed by (id, chunk_idx).
  */
object Chunking {

  /** Explode `df` into `(…, chunk_idx, chunk_text, chunk_tokens)` rows:
    * window `k` covers tokens `[1 + k·stride, …+chunkTokens]` with
    * `stride = chunkTokens − overlap`; the final window may be short, and
    * a window never STARTS past the token count (an empty/short text
    * yields exactly one chunk, possibly empty — every input row survives).
    */
  def chunk(df: DataFrame, textCol: String = "text", chunkTokens: Int = 64,
      overlap: Int = 16): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got chunkTokens=$chunkTokens overlap=$overlap")
    val stride = chunkTokens - overlap
    // case-PRESERVING whitespace tokens: chunk text feeds embedding or
    // training downstream, so unlike the dedup/repetition token streams it
    // must not normalize away the original casing
    val tk = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    df.withColumn("_ch_tk", tk)
      .withColumn("_ch_start",
        explode(sequence(lit(1), greatest(size(col("_ch_tk")), lit(1)), lit(stride))))
      .withColumn("chunk_idx", ((col("_ch_start") - 1) / stride).cast("int"))
      .withColumn("chunk_text",
        array_join(slice(col("_ch_tk"), col("_ch_start"), lit(chunkTokens)), " "))
      .withColumn("chunk_tokens",
        size(slice(col("_ch_tk"), col("_ch_start"), lit(chunkTokens))))
      .drop("_ch_tk", "_ch_start")
  }
}
