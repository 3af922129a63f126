package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Skew

/** Skew-handled joins: exact parity with the plain join (the whole
  * contract), hot-key spreading, and dim-preserving refusals.
  */
class SkewSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  // 900 rows on hot key 0, a sprinkle on 1..50, plus a key with no dim row
  private lazy val fact = spark.range(1000).select(
    when(col("id") < 900, 0L).otherwise(col("id") % 50 + 1).as("k"),
    (col("id") * 3 % 101).as("v"))
    .union(Seq((999L, 7L)).toDF("k", "v"))
  private lazy val dim = spark.range(51).select(
    col("id").as("k"), concat(lit("seg"), col("id") % 5).as("seg"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("salted inner and left joins equal the plain join exactly") {
    val plainInner = fact.join(dim, Seq("k"), "inner").select("k", "v", "seg")
    val saltedInner = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8)
      .select("k", "v", "seg")
    assert(canon(saltedInner) === canon(plainInner))

    val plainLeft = fact.join(dim, Seq("k"), "left").select("k", "v", "seg")
    val saltedLeft = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8, joinType = "left")
      .select("k", "v", "seg")
    assert(canon(saltedLeft) === canon(plainLeft))
    // the no-dim key survived the left join with a null seg
    assert(saltedLeft.filter(col("k") === 999L && col("seg").isNull).count() === 1)
  }

  test("the hot key's rows spread across many salts") {
    // reproduce the internal salt assignment to observe the spread
    val salted = fact.withColumn("_s",
      pmod(xxhash64(col("k"), col("v")), lit(8L)))
    val spread = salted.filter(col("k") === 0L).select("_s").distinct().count()
    assert(spread >= 6, s"hot key spread over only $spread of 8 salts")
  }

  test("the salt is a pure value function — stable under recomputation") {
    // the salt must not depend on row POSITION (partition id / fetch
    // order): recompute the same frame under a different partitioning and
    // the per-row salt must not move (a retried map task after a fetch
    // failure is exactly a recomputation under possibly-different order)
    def salts(parts: Int) = fact.repartition(parts)
      .withColumn("_s", pmod(xxhash64(col("k"), col("v")), lit(8L)))
      .select("k", "v", "_s").collect().map(_.mkString("|")).sorted.toSeq
    assert(salts(4) === salts(13))
  }

  test("byte-identical duplicate fact rows spread via a caller tiebreaker") {
    // pre-dedup corpora repeat whole rows: hashing only the column values
    // collapses every duplicate onto ONE salt. The deterministic spread
    // is a caller-provided unique id (event id, doc id, file offset) —
    // position-derived ids would break retry determinism, so the operator
    // never synthesizes one itself
    val dupFact = spark.range(800)
      .select(col("id").as("rid"), lit(0L).as("k"), lit(42L).as("v"))
    val salted = dupFact.withColumn("_s",
      pmod(xxhash64(col("rid"), col("k"), col("v")), lit(8L)))
    val spread = salted.select("_s").distinct().count()
    assert(spread >= 6, s"duplicate rows spread over only $spread of 8 salts")
    // and the joined result keeps exact duplicate multiplicity
    val plain = dupFact.join(dim, Seq("k"), "inner").select("k", "v", "seg")
    val viaSalt = Skew.saltedJoin(dupFact, dim, Seq("k"), salts = 8,
        tiebreaker = Some(col("rid")))
      .select("k", "v", "seg")
    assert(canon(viaSalt) === canon(plain))
    assert(viaSalt.count() === 800)
  }

  test("skewJoin (adaptive) equals the plain join; dim-preserving types refuse") {
    val plain = fact.join(dim, Seq("k"), "inner").select("k", "v", "seg")
    // threshold 100 makes ONLY key 0 hot — cold keys take the plain path
    val adaptive = Skew.skewJoin(fact, dim, Seq("k"), salts = 8, hotThreshold = 100)
      .select("k", "v", "seg")
    assert(canon(adaptive) === canon(plain))
    // no hot keys at a huge threshold: degenerates to the plain join
    val allCold = Skew.skewJoin(fact, dim, Seq("k"), salts = 8, hotThreshold = 1000000)
      .select("k", "v", "seg")
    assert(canon(allCold) === canon(plain))
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, Seq("k"), salts = 8, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, Seq("k"), salts = 0)
    }
  }

  test("plan shape: hot-key set broadcasts, no cartesian product") {
    val plan = Skew.skewJoin(fact, dim, Seq("k"), salts = 8, hotThreshold = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"hot-key set did not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in the salted join:\n$plan")
  }
}
