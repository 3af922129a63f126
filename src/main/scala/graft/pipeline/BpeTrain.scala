package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge-rule training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — learn the
  * first k merge rules of a byte-pair-encoding tokenizer over a corpus.
  *
  * Scale shape (the reason BPE training belongs in the engine): the
  * corpus collapses to a WORD-FREQUENCY table in one shuffle (vocabulary
  * is sub-linear in corpus size — millions of rows at 100 TB, not
  * trillions), and every one of the k iterations is then
  * O(vocabulary): one adjacent-pair count (row-local explode + one
  * aggregation whose key space is the pair alphabet), one driver argmax
  * of a single row, one row-local merge projection. No pass ever
  * re-reads the corpus; iterations persist/unpersist so each argmax
  * executes one stage, not the whole chain.
  *
  * Token state rides as a ``-joined string and the merge is a
  * left-fold: `acc` ends with the left symbol and `x` is the right
  * symbol → append `x` WITHOUT a separator (the pair fuses), else append
  * with one. The fold IS canonical greedy left-to-right non-overlapping
  * merging: a fused token `l+r` can never equal `l` (lengths differ), so
  * a merge never cascades within the same rule application. Ties on
  * pair count break (count DESC, left ASC, right ASC) — fully
  * deterministic, which is what makes the op exactly oracle-replayable.
  */
object BpeTrain {

  val Sep = ""

  /** Learn `steps` merge rules from `textCol`. Words are maximal
    * `[a-z]+` runs of the lowercased text (the classic whitespace+punct
    * pre-tokenizer, ASCII-folded so ordering ties are collation-free).
    * Returns one row per rule: (step, lhs, rhs, merged, pair_count).
    */
  def trainMerges(docs: DataFrame, textCol: String, steps: Int): DataFrame = {
    require(steps >= 1, s"steps must be positive, got $steps")
    val spark = docs.sparkSession
    var words = docs
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("toks", rtrim(regexp_replace(col("w"), "(.)", "$1" + Sep), Sep))
      .drop("w")
      .persist()
    words.count()

    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    try {
      for (step <- 1 to steps) {
        val top = words
          .withColumn("a", split(col("toks"), Sep))
          .filter(size(col("a")) >= 2)
          .select(col("cnt"), explode(expr(
            "transform(sequence(1, size(a) - 1), " +
              "j -> struct(element_at(a, j) AS lhs, element_at(a, j + 1) AS rhs))"))
            .as("p"))
          .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("lhs"), col("rhs"))
          .limit(1).collect()
        if (top.nonEmpty) {
          val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((step, l, r, l + r, c))
          // l/r are [a-z]+ by construction — safe to inline in the lambda
          val next = words.withColumn("toks", expr(
            s"""aggregate(split(toks, '$Sep'), '', (acc, x) ->
               |  CASE WHEN acc = '' THEN x
               |       WHEN (acc = '$l' OR endswith(acc, '$Sep$l')) AND x = '$r'
               |         THEN concat(acc, x)
               |       ELSE concat(acc, '$Sep', x) END)""".stripMargin))
            .persist()
          next.count()
          words.unpersist()
          words = next
        }
      }
    } finally words.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("step", "lhs", "rhs", "merged", "pair_count")
  }

  /** Apply learned rules to a text column: per-word greedy merges in rule
    * order — the encode side of [[trainMerges]], row-local end to end
    * (one projection, no shuffle; rules ride in the closure like a
    * broadcast tokenizer file). Emits the tokenized form as an array
    * column.
    */
  def encode(docs: DataFrame, textCol: String,
      rules: Seq[(String, String)], out: String = "bpe_tokens"): DataFrame = {
    // one rebound column per rule keeps the expression tree linear in
    // |rules| with no nested-lambda name capture
    var frame = docs.withColumn("_bpe_words",
      filter(split(lower(col(textCol)), "[^a-z]+"), w => length(w) > 0))
    frame = frame.withColumn("_bpe_toks", transform(col("_bpe_words"),
      w => rtrim(regexp_replace(w, "(.)", "$1" + Sep), Sep)))
    rules.foreach { case (l, r) =>
      frame = frame.withColumn("_bpe_toks", expr(
        s"""transform(_bpe_toks, s -> aggregate(split(s, '$Sep'), '', (acc, x) ->
           |  CASE WHEN acc = '' THEN x
           |       WHEN (acc = '$l' OR endswith(acc, '$Sep$l')) AND x = '$r'
           |         THEN concat(acc, x)
           |       ELSE concat(acc, '$Sep', x) END))""".stripMargin))
    }
    frame
      .withColumn(out, expr(s"flatten(transform(_bpe_toks, s -> split(s, '$Sep')))"))
      .drop("_bpe_words", "_bpe_toks")
    // `merged` above is unused by design — see the rebinding comment
  }
}
