package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier (the fastText-style
  * count-based doc classifier of data-pipeline lore — language ID,
  * source attribution, quality tiers) trained and applied fully
  * distributed, with EXACT oracle-replayable arithmetic.
  *
  * Training is three count aggregations (docs per class, word×class
  * counts, tokens per class) — all map-side-combining, shuffle keys
  * bounded by vocabulary×classes. Scoring joins the test term counts to
  * the model per class; per-term log-probabilities are Laplace-smoothed
  * `ln((cnt+1)/(tok_c+V))`, rounded to 8 decimals and cast DECIMAL so
  * the per-doc sum is aggregation-order independent (same discipline as
  * TextSearch.bm25TopK) — which is what lets DuckDB replay the scores
  * bit-for-bit. Ties argmax to the lexicographically first class.
  *
  * Scale shape: the model is vocabulary×classes rows — broadcast when it
  * fits (the common case: ≤ a few million rows), and the join degrades
  * to a word-keyed shuffle above that. Docs with no recognized tokens
  * score prior-only rather than dropping out.
  */
object NbClassify {

  private def words(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[^a-z]+"), w => length(w) > 0)

  /** Train on `train` (labelCol ~ textCol), predict `test` rows.
    * Returns (idCol, predicted, score) with score the winning class's
    * total log-probability as DOUBLE (exactly derived from the decimal
    * sum).
    */
  def trainPredict(train: DataFrame, test: DataFrame, labelCol: String,
      textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val trw = train.select(col(labelCol).as("_nb_c"),
      explode(words(col(textCol))).as("_nb_w"))
    val wc = trw.groupBy("_nb_c", "_nb_w").agg(count(lit(1)).as("_nb_cnt"))
    val tok = wc.groupBy("_nb_c").agg(sum(col("_nb_cnt")).as("_nb_tok"))
    // exact scalars: vocabulary size and training doc count (one tiny job)
    val Array(vocab, nTrain) = {
      val r = trw.agg(countDistinct(col("_nb_w"))).first().getLong(0)
      Array(r, train.count())
    }
    val dec = "decimal(18,8)"
    val priors = train.groupBy(col(labelCol).as("_nb_c"))
      .agg(count(lit(1)).as("_nb_nd"))
      .withColumn("_nb_prior",
        round(log(col("_nb_nd").cast("double") / nTrain), 8).cast(dec))
      .select("_nb_c", "_nb_prior")
    val dflt = tok.withColumn("_nb_d",
        round(log(lit(1.0) / (col("_nb_tok") + vocab).cast("double")), 8).cast(dec))
      .select("_nb_c", "_nb_d")
    val model = wc.join(tok, "_nb_c")
      .withColumn("_nb_lnp",
        round(log((col("_nb_cnt") + 1).cast("double") /
          (col("_nb_tok") + vocab).cast("double")), 8).cast(dec))
      .select("_nb_c", "_nb_w", "_nb_lnp")

    val tew = test.select(col(idCol), explode(words(col(textCol))).as("_nb_w"))
      .groupBy(idCol, "_nb_w").agg(count(lit(1)).as("_nb_n"))
    // per (doc, class) word-sum: classes are broadcast-small; the model
    // broadcast is the vocabulary×classes table (see scaladoc)
    val wordSums = tew
      .crossJoin(broadcast(dflt))
      .join(broadcast(model), Seq("_nb_c", "_nb_w"), "left_outer")
      // bound the decimal widths explicitly: a bare long×decimal(18,8)
      // hits Spark's precision cap and silently drops scale to 6 —
      // (12,0)×(18,8) = (31,8) stays exact, its sum stays scale-8, and
      // the (28,8) downcast keeps the final + prior under precision 38
      .withColumn("_nb_term",
        col("_nb_n").cast("decimal(12,0)") *
          coalesce(col("_nb_lnp"), col("_nb_d")))
      .groupBy(col(idCol), col("_nb_c"))
      .agg(sum(col("_nb_term")).cast("decimal(28,8)").as("_nb_ws"))
    val scored = test.select(col(idCol)).distinct()
      .crossJoin(broadcast(priors))
      .join(wordSums, Seq(idCol, "_nb_c"), "left_outer")
      .withColumn("_nb_score",
        col("_nb_prior") + coalesce(col("_nb_ws"), lit(0).cast(dec)))
    scored
      .withColumn("_nb_rk", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("_nb_score").desc, col("_nb_c"))))
      .filter(col("_nb_rk") === 1)
      .select(col(idCol), col("_nb_c").as("predicted"),
        col("_nb_score").cast("double").as("score"))
  }
}
