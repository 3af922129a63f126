package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handled equi-joins — the classic production fix for a hot key
  * that AQE's runtime skew splitting can't always reach (AQE splits
  * sort-merge join partitions only: a bucketed/co-located join, a join
  * feeding a same-key aggregate, or a session with AQE disabled still
  * serializes the hot key through one task). Both forms are pure
  * DataFrame composition — Catalyst plans, AQE still applies on top.
  *
  * Correctness contract (what the oracle checks): output ≡ the plain
  * join, bit-for-bit, for `inner` and `left` joins. Right/full joins are
  * refused — the dim side is REPLICATED `salts` ways, so dim-preserving
  * semantics would multiply unmatched dim rows.
  *
  * Reference scope: uber/hoodie leaves relational execution to the
  * engine; this is part of the training-data-pipeline extension surface
  * (SURVEY §2.8) — fact-to-dim joins over web-scale corpora (doc→domain,
  * event→user) are exactly where one hot domain melts a stage.
  */
object Skew {

  private val SaltCol = "_graft_salt"
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Salted join: every fact row gets a salt in [0, salts) and the dim
    * side replicates once per salt value, so a hot key's rows spread
    * over `salts` tasks instead of one. Dim-side cost is `salts ×` its
    * size — size `salts` to the observed skew (8-32), not the partition
    * count. The salt hashes EVERY fact column (hashing only the key
    * would put the hot key back in one task), optionally plus a
    * caller-supplied `tiebreaker` column: byte-identical duplicate fact
    * rows — common in pre-dedup web corpora — all hash to ONE salt, so
    * when duplicates can carry the hot key, pass the row's unique id
    * (event id, doc id, file offset) as the tiebreaker to spread them.
    * The salt is a pure VALUE function of the row (+ tiebreaker), so it
    * is stable under task retries and stage recomputation even when the
    * fact side sits downstream of a shuffle — never derived from row
    * POSITION (`monotonically_increasing_id`), whose reduce-side fetch
    * order can differ between a retried map task and outputs already
    * consumed, silently duplicating or dropping rows in the join. Fact
    * columns must be hashable — project `MapType` columns away or to a
    * stable encoding first.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner",
      tiebreaker: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"salted join preserves the FACT side only (dim is replicated): got $joinType")
    val sf = fact.withColumn(SaltCol,
      pmod(xxhash64(fact.columns.toIndexedSeq.map(col)
        ++ tiebreaker.toSeq: _*), lit(salts.toLong)))
    val sd = dim.withColumn(SaltCol,
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    sf.join(sd, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Adaptive form: salt ONLY the hot keys. One partial-aggregated count
    * pass finds keys above `hotThreshold` (skew-safe itself — map-side
    * combine collapses the hot key before the shuffle); the hot slice
    * joins salted, the cold slice joins plain, results union. The hot-key
    * set broadcasts — it is bounded by `fact.count / hotThreshold`, tiny
    * by construction.
    */
  def skewJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int = 16, hotThreshold: Long = 1000000L,
      joinType: String = "inner",
      tiebreaker: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    if (tiebreaker.isEmpty) {
      // The salt is a value hash of the full fact row, so byte-identical
      // duplicate fact rows all land on ONE salt: in a pre-dedup corpus
      // whose hot key IS a mass-duplicated row, the spread collapses and
      // the hot key re-serializes through a single task. Callers who can
      // hit that shape must pass a unique id (event id, doc id, file
      // offset) as the tiebreaker — warn loudly so the mitigation isn't
      // lost without noticing (cheaper than a runtime collapse detector,
      // which would cost an extra aggregation over the hot slice).
      log.warn("skewJoin called without a tiebreaker: byte-identical " +
        "duplicate fact rows hash to one salt and will not spread — pass " +
        "tiebreaker=Some(uniqueIdCol) if the fact side may contain " +
        "mass-duplicated rows on the hot key")
    }
    val hot = broadcast(
      fact.groupBy(keys.map(col): _*).count()
        .filter(col("count") > hotThreshold)
        .select(keys.map(col): _*))
    val cold = fact.join(hot, keys, "left_anti")
      .join(dim, keys, joinType)
    val hotJoin = saltedJoin(
      fact.join(hot, keys, "left_semi"),
      dim.join(hot, keys, "left_semi"), keys, salts, joinType, tiebreaker)
    cold.unionByName(hotJoin)
  }
}
