package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank (Page et al. 1999) over an edge list — the
  * entity-importance primitive of web-scale data curation (domain
  * authority for crawl prioritization, account importance in event
  * graphs).
  *
  * Scale shape: each iteration is one join of the edge list with the
  * current rank vector (shuffle keyed by src), one aggregation keyed by
  * dst, and a scalar dangling-mass fold — the textbook sparse
  * matrix-vector product; no adjacency ever materializes per node, and
  * iterations persist/unpersist so the lineage stays one stage deep.
  *
  * Exactness (what makes the gate oracle-replayable): ranks ride as
  * DECIMAL(20,12). Per-edge contributions and the recurrence evaluate in
  * double with a FIXED expression tree (IEEE ops are bit-deterministic;
  * only aggregation ORDER is not), then quantize back to 12 decimals
  * before every sum — so the aggregations are order-independent exact
  * decimal sums, and the dangling mass folds the same way.
  */
object Graph {

  private val Dec = "decimal(20,12)"

  /** `edges` must have columns (src, dst) — duplicates are collapsed;
    * the vertex set is the union of endpoints. Returns (node, rank)
    * with rank DECIMAL(20,12) summing to ~1.
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val e = edges.select(col("src").cast("string"), col("dst").cast("string"))
      .distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("_pr_deg")).persist()
    outDeg.count()

    // uniform start, computed the way the oracle does: one double
    // division, then half-up quantization to 12 decimals
    var ranks = nodes.withColumn("r",
      lit(BigDecimal(1.0 / n).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .cast(Dec)).persist()
    ranks.count()
    try {
      for (_ <- 1 to iters) {
        // dangling mass: exact decimal sum of no-out-edge ranks, cast to
        // double ONCE (deterministic), divided by N inside the fixed tree
        val dangling = ranks.join(outDeg,
            ranks("node") === outDeg("src"), "left_anti")
          .agg(coalesce(sum(col("r")), lit(0).cast(Dec)).cast("double"))
          .first().getDouble(0)
        val contribs = e
          .join(ranks, e("src") === ranks("node"))
          .join(outDeg, "src")
          .withColumn("_pr_c",
            round(col("r").cast("double") / col("_pr_deg"), 12).cast(Dec))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("_pr_c")).as("_pr_inc"))
        val next = nodes
          .join(contribs, Seq("node"), "left_outer")
          .withColumn("r",
            round(lit((1.0 - damping) / n) +
              lit(damping) * (coalesce(col("_pr_inc"), lit(0).cast(Dec))
                .cast("double") + lit(dangling / n)), 12).cast(Dec))
          .select("node", "r")
          .persist()
        next.count()
        ranks.unpersist()
        ranks = next
      }
      // the final iteration's frame stays cached — downstream reads hit
      // the materialization, not a k-iteration recomputation
      ranks.select("node", "r")
    } finally {
      e.unpersist(); nodes.unpersist(); outDeg.unpersist()
    }
  }
}
