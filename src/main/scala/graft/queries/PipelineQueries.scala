package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline._

/** LLM-data-pipeline catalog: dedup family, similarity search, text
  * analysis, multimodal plumbing over the `documents`/`embeddings` tables.
  * SQL-expressible operators carry DuckDB oracles; the probabilistic ones
  * (MinHash/SimHash/LSH/IVF) are declared without oracles — the driver
  * records a rows-only check for those, and their exact-arithmetic parts
  * are covered by the ScalaTest suite.
  */
object PipelineQueries {
  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")
  private def embs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/embeddings.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: planted byte-identical copies must vanish, originals stay
    "p_dedup_exact" -> ((s, d) => {
      val base = docs(s, d)
      val planted = base.filter(col("doc_id") % 3 === 0)
        .withColumn("doc_id", col("doc_id") + 10000000L)
      Dedup.exact(base.unionByName(planted))
    }),

    "p_dedup_minhash" -> ((s, d) =>
      Dedup.minhashDedup(docs(s, d), threshold = 0.6)),

    "p_dedup_simhash" -> ((s, d) =>
      Dedup.simhashDedup(docs(s, d), maxDistance = 2)),

    "p_dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardDedup(docs(s, d), threshold = 0.8)),

    "p_dedup_embedding" -> ((s, d) => {
      val base = embs(s, d)
      val planted = base.filter(col("vec_id") % 5 === 0)
        .withColumn("vec_id", col("vec_id") + 10000000L)
      // project the array column out of the result: the gate's pandas
      // row-sort can't hash ndarrays (round-1 checker crash)
      Dedup.embeddingDedup(base.unionByName(planted), threshold = 0.999)
        .select(col("vec_id"), col("label"))
    }),

    // text stats with exact SQL twins
    "p_text_stats" -> ((s, d) => {
      val t = col("text")
      docs(s, d).select(
        col("doc_id"),
        TextStats.tokenCount(t).as("n_tokens"),
        TextStats.charCount(t).as("n_chars_m"),
        round(TextStats.digitRatio(t), 4).as("digit_ratio"),
        round(TextStats.avgWordLen(t), 4).as("avg_word_len"))
    }),

    // heuristic scores: declared without oracle (rows-only check)
    "p_text_quality_lang" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        TextStats.qualityScore(col("text")).as("quality"),
        TextStats.langId(col("text")).as("lang_pred"),
        TextStats.fingerprint(col("text")).as("fingerprint"))),

    // exact ANN baseline: cosine top-k for three fixed query vectors
    "p_ann_bruteforce" -> ((s, d) => {
      val all = embs(s, d)
        .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      val queries = all.filter(col("vec_id") < 3)
      Similarity.bruteForceTopK(all, queries, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    "p_ann_lsh" -> ((s, d) => {
      val all = embs(s, d)
      Similarity.lshTopK(all, all.filter(col("vec_id") < 3), k = 10,
          planes = 8, probeBits = 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    "p_ann_ivf" -> ((s, d) => {
      val all = embs(s, d)
      val (assignments, centroids) = Similarity.ivfBuild(all, nlist = 16)
      Similarity.ivfTopK(assignments, centroids, all.filter(col("vec_id") < 3),
          k = 10, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    // multimodal plumbing: schema-correct decode over binary columns
    "p_multimodal_decode" -> ((s, d) => {
      val blobs = Multimodal.withFakeBinary(docs(s, d), "doc_id")
      Multimodal.decodeImages(blobs).toDF()
        .select(col("id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.format").as("format"),
          col("byteLen").as("byte_len"))
    }))

  val oracles: Map[String, String] = Map(
    "p_dedup_exact" -> "SELECT * FROM documents",
    // ground truth = brute-force cosine dedup (ours is hyperplane-LSH
    // accelerated; exact copies hash to the same bucket, and the data has
    // no natural pair above 0.51 cosine, so recall is exact here)
    "p_dedup_embedding" ->
      """WITH u AS (
        |  SELECT vec_id, embedding, label FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000000, embedding, label FROM embeddings WHERE vec_id % 5 = 0)
        |SELECT vec_id, label FROM u a WHERE NOT EXISTS (
        |  SELECT 1 FROM u b WHERE b.vec_id < a.vec_id
        |  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.999)""".stripMargin,
    "p_text_stats" ->
      raw"""SELECT doc_id,
           |len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS n_tokens,
           |length(text) AS n_chars_m,
           |round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
           |  / length(text), 4) AS digit_ratio,
           |round(list_sum(list_transform(list_filter(string_split_regex(trim(text), '\s+'),
           |    x -> len(x) > 0), x -> len(x)))::DOUBLE
           |  / len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)), 4)
           |  AS avg_word_len
           |FROM documents""".stripMargin,
    "p_ann_bruteforce" ->
      """SELECT query_id, neighbor_id, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 3 AND q.vec_id <> c.vec_id)
        |WHERE rank <= 10""".stripMargin)
}
