package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Sketch-accelerated EXACT heavy hitters — the "which tokens / URLs /
  * shingles dominate the corpus" question a training-data pipeline asks
  * before building vocabularies or down-weighting boilerplate.
  *
  * The naive answer (`GROUP BY word HAVING count >= T`) shuffles the
  * ENTIRE token stream — at 100 TB that is the biggest exchange in the
  * pipeline for an answer whose output is a handful of rows. The sketch
  * route:
  *
  *  1. one pass folds every token into a count-min sketch via Spark's
  *     native `count_min_sketch` aggregate (partial-aggregated per
  *     partition, merged by sketch addition — the only thing that
  *     shuffles is the sketch itself, a few hundred KB);
  *  2. the merged sketch broadcasts back, and a second pass keeps only
  *     tokens whose ESTIMATE reaches the threshold. Count-min never
  *     underestimates, so no true heavy hitter is lost;
  *  3. the exact `GROUP BY` + `HAVING` then runs over the surviving
  *     candidates only — the false positives the sketch admitted are
  *     eliminated, and only candidate tokens ever shuffle.
  *
  * The output is therefore EXACT (identical to the naive plan), which is
  * what makes it DuckDB-oracle-able; the sketch only bounds the shuffle.
  * cf. Cormode & Muthukrishnan, "An Improved Data Stream Summary: the
  * Count-Min Sketch and its Applications" (J. Algorithms 2005).
  */
object Sketches {

  /** Tokens of `textCol` with exact global count >= `minCount`, ordered
    * by count desc. `eps`/`confidence` size the sketch (width 2/eps,
    * depth ln(1/(1-confidence))): eps should be well under
    * minCount/totalTokens so the candidate pass admits few false
    * positives.
    */
  def heavyHitters(df: DataFrame, textCol: String, minCount: Long,
      eps: Double = 1e-4, confidence: Double = 0.99): DataFrame = {
    val words = df.select(explode(Repetition.tokens(col(textCol))).as("word"))
    val bytes = words
      .agg(count_min_sketch(col("word"), lit(eps), lit(confidence), lit(42))
        .as("sk"))
      .head().getAs[Array[Byte]](0)
    val sketch = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    val bc = df.sparkSession.sparkContext.broadcast(sketch)
    val mayBeHeavy = udf((w: String) => bc.value.estimateCount(w) >= minCount)
    words.filter(mayBeHeavy(col("word")))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("word"))
  }
}
