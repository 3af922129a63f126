package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.{AsofJoin, Sampling, Sessions}

class SessionsSamplingSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def ev(id: Long, user: Long, sec: Long): (Long, java.sql.Timestamp, Long, Double) =
    (id, new java.sql.Timestamp(sec * 1000L), user, 1.0)

  test("sessionize: gap splits, order is per-entity") {
    // user 1: events at 0s, 10s, [gap] 4000s; user 2: one event
    val df = Seq(ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 4000), ev(10, 2, 5))
      .toDF("event_id", "ts", "user_id", "value")
    val out = Sessions.sessionize(df, maxGapSeconds = 1800)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(out(1) === 1L && out(2) === 1L)
    assert(out(3) === 2L) // past the gap → new session
    assert(out(10) === 1L)
    val stats = Sessions.sessionStats(df, maxGapSeconds = 1800)
    val s11 = stats.filter($"user_id" === 1 && $"session_seq" === 1).collect().head
    assert(s11.getAs[Long]("n_events") === 2L)
    assert(s11.getAs[Long]("duration_s") === 10L)
  }

  test("asofJoin: inclusive <=, latest-right wins, unmatched survive") {
    val left = Seq((1L, 100L, 10L), (2L, 100L, 25L), (3L, 200L, 5L))
      .map { case (id, u, s) => (id, u, new java.sql.Timestamp(s * 1000L)) }
      .toDF("id", "user_id", "ts")
    val right = Seq((50L, 100L, 10L, "a"), (51L, 100L, 20L, "b"), (52L, 300L, 1L, "c"))
      .map { case (id, u, s, v) => (id, u, new java.sql.Timestamp(s * 1000L), v) }
      .toDF("rid", "user_id", "rts", "tag")
    val out = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "rts",
        rightCols = Seq("rid", "tag"), tieBreak = Seq("rid"))
      .select("id", "rid", "tag").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L) === (Some(50L), Some("a"))) // equal ts matches (inclusive)
    assert(out(2L) === (Some(51L), Some("b"))) // latest right ≤ 25
    assert(out(3L) === (None, None))           // no right rows for user 200
  }

  test("sampling: deterministic, growth-stable, stratified rates hold") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val s1 = Sampling.sample(docs, "doc_id", 0.3).select("doc_id").collect().toSet
    val s2 = Sampling.sample(docs, "doc_id", 0.3).select("doc_id").collect().toSet
    assert(s1 === s2) // same membership every run
    // raising the rate only ADDS rows (bucket membership is stable)
    val s3 = Sampling.sample(docs, "doc_id", 0.5).select("doc_id").collect().toSet
    assert(s1.subsetOf(s3))
    // split tags partition the table and are disjoint from each other
    val split = Sampling.trainTestSplit(docs, "doc_id", 0.2, 0.2)
    assert(split.count() === docs.count())
    val byTag = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byTag.keySet === Set("train", "valid", "test"))
    // 500 docs, 20% bands: binomial bounds loose enough to never flake
    assert(byTag("test") > 50 && byTag("test") < 150)
    // stratified: a 0-rate stratum vanishes, a 1-rate stratum is complete
    val strat = Sampling.stratifiedSample(docs, "source", "doc_id",
      rates = Map("src0" -> 0.0, "src1" -> 1.0), defaultRate = 0.0)
    assert(strat.filter($"source" === "src0").count() === 0)
    assert(strat.filter($"source" === "src1").count() ===
      docs.filter($"source" === "src1").count())
  }

  test("capPerGroup: keeps exactly the best N per group, deterministic ties") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val capped = Sampling.capPerGroup(docs, "source", 3,
      Seq($"n_chars".desc, $"doc_id"))
    val per = capped.groupBy("source").count().as[(String, Long)].collect()
    assert(per.forall(_._2 <= 3))
    assert(per.length === docs.select("source").distinct().count())
    // the kept set is the top-3 by the declared order — verify one group
    val src = "src0"
    val want = docs.filter($"source" === src)
      .orderBy($"n_chars".desc, $"doc_id").limit(3)
      .select("doc_id").as[Long].collect().toSet
    val got = capped.filter($"source" === src)
      .select("doc_id").as[Long].collect().toSet
    assert(got === want)
    // idempotent: capping the capped output is a no-op
    assert(Sampling.capPerGroup(capped, "source", 3,
      Seq($"n_chars".desc, $"doc_id")).count() === capped.count())
  }

  test("weightedSample: deterministic, sized, monotone in weight") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val s1 = Sampling.weightedSample(docs, "doc_id", "n_chars", 100)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.size === 100)
    val s2 = Sampling.weightedSample(docs, "doc_id", "n_chars", 100)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2)
    // raising ONE kept doc's weight cannot evict it (its key only grows)
    val kept = s1.head
    val boosted = docs.withColumn("n_chars",
      when($"doc_id" === kept, $"n_chars" * 100).otherwise($"n_chars"))
    assert(Sampling.weightedSample(boosted, "doc_id", "n_chars", 100)
      .filter($"doc_id" === kept).count() === 1)
  }

  test("topPaths: ordered per-entity n-grams, global top-k") {
    import java.sql.Timestamp
    val ev = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 00:00:01"), "A"),
      (2L, 1L, Timestamp.valueOf("2024-01-01 00:00:02"), "B"),
      (3L, 1L, Timestamp.valueOf("2024-01-01 00:00:03"), "C"),
      (4L, 1L, Timestamp.valueOf("2024-01-01 00:00:04"), "B"),
      (5L, 1L, Timestamp.valueOf("2024-01-01 00:00:05"), "C"),
      (6L, 2L, Timestamp.valueOf("2024-01-01 00:00:01"), "A"),
      (7L, 2L, Timestamp.valueOf("2024-01-01 00:00:02"), "B"),
      (8L, 2L, Timestamp.valueOf("2024-01-01 00:00:03"), "C"),
      (9L, 3L, Timestamp.valueOf("2024-01-01 00:00:01"), "X")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = graft.pipeline.Sessions.topPaths(ev)
      .as[(String, Long)].collect().toSeq
    assert(got.head === (("A>B>C", 2L)))
    assert(got.toMap === Map("A>B>C" -> 2L, "B>C>B" -> 1L, "C>B>C" -> 1L))
  }

  test("decontaminate: overlapping docs dropped, clean docs survive") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "totally unrelated content with no overlap whatsoever here now"))
      .toDF("doc_id", "text")
    val bench = Seq(
      // shares the 8-gram "one two ... eight" with doc 2
      (100L, "zero one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val out = graft.pipeline.Decontaminate.decontaminate(train, bench, n = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 3L))
    // short texts: whole-text shingle still catches exact copies
    val shortTrain = Seq((10L, "tiny doc"), (11L, "other doc")).toDF("doc_id", "text")
    val shortBench = Seq((200L, "tiny doc")).toDF("doc_id", "text")
    val out2 = graft.pipeline.Decontaminate.decontaminate(shortTrain, shortBench, n = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out2 === Set(11L))
  }

  test("packIntoBins: bins respect the cumulative-start rule") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val packed = graft.pipeline.Packing.packIntoBins(docs,
      maxTokensPerBin = 500, buckets = 4)
    assert(packed.count() === docs.count())
    val stats = graft.pipeline.Packing.binStats(packed)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every bin's START obeys the rule, so total ≤ max + one straddling doc
    val maxDoc = packed.agg(max("n_tokens")).head.getLong(0)
    assert(stats.forall { case (_, _, total) => total <= 500 + maxDoc })
    // deterministic: same input → same bins
    val again = graft.pipeline.Packing.packIntoBins(docs,
      maxTokensPerBin = 500, buckets = 4)
      .select("doc_id", "bin_id").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === packed.select("doc_id", "bin_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("mixToWeights: output proportions approach targets") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .filter($"source".isin("src0", "src1", "src2"))
    val out = Sampling.mixToWeights(docs, "source", "doc_id",
      weights = Map("src0" -> 2.0, "src1" -> 1.0))
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("src2")) // unweighted stratum dropped
    // src0 should outnumber src1 roughly 2:1 (hash-rounding tolerance)
    assert(counts("src0") > counts.getOrElse("src1", 0L))
  }

  test("temperatureMix: alpha=1 natural, alpha<1 flattens, budget targets size") {
    // skewed synthetic strata: a=640, b=160, c=40 (16:4:1)
    val df = ((1 to 640).map(i => (i.toLong, "a")) ++
        (1001 to 1160).map(i => (i.toLong, "b")) ++
        (2001 to 2040).map(i => (i.toLong, "c")))
      .toDF("doc_id", "src")
    // alpha = 1: proportions already natural — every rate is 1, all kept
    assert(Sampling.temperatureMix(df, "src", "doc_id", alpha = 1.0).count() === 840L)
    // alpha = 0.5: smallest stratum binds at rate 1; kept counts flatten
    // toward sqrt proportions (expected rates: c=1, b=0.5, a=0.25)
    val mixed = Sampling.temperatureMix(df, "src", "doc_id", alpha = 0.5)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(mixed("c") === 40L) // binding stratum fully kept
    // hash sampling is approximate: expect ~160 of a (rate .25), ~80 of b
    assert(mixed("a") > 100L && mixed("a") < 220L)
    assert(mixed("b") > 50L && mixed("b") < 110L)
    // flattening: the a:c ratio drops from 16:1 toward 4:1
    assert(mixed("a").toDouble / mixed("c") < 8.0)
    // budget mode: ask for ~84 rows (a tenth) — strata hold sqrt proportions
    val small = Sampling.temperatureMix(df, "src", "doc_id", alpha = 0.5, budget = 84)
    val n = small.count()
    assert(n > 40L && n < 130L)
    // determinism + growth-stability: membership is a fixed id set
    val m1 = Sampling.temperatureMix(df, "src", "doc_id", alpha = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val m2 = Sampling.temperatureMix(df, "src", "doc_id", alpha = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(m1 === m2)
  }

  test("globalShuffle: dense total order, seed-sensitive, no global window") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").select("doc_id")
    val ep1 = Sampling.globalShuffle(docs, "doc_id", seed = "ep1", buckets = 16)
    val n = docs.count()
    // dense permutation of [0, n)
    val poss = ep1.select("pos").as[Long].collect().sorted
    assert(poss.toSeq === (0L until n).toSeq)
    // reproducible; a different seed produces a different permutation
    val again = Sampling.globalShuffle(docs, "doc_id", seed = "ep1", buckets = 16)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val ep2 = Sampling.globalShuffle(docs, "doc_id", seed = "ep2", buckets = 16)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val ep1m = ep1.select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(again === ep1m)
    assert(ep2 !== ep1m)
    // bucket count doesn't change the permutation (pure parallelism knob)
    val wide = Sampling.globalShuffle(docs, "doc_id", seed = "ep1", buckets = 256)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(wide === ep1m)
    // scale shape: every window in the plan is PARTITIONED — a bare
    // row_number() OVER (ORDER BY …) would funnel the corpus through one
    // partition
    val windows = ep1.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty))
  }

  test("heavyHitters: exact counts, sketch never drops a true hitter") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val exact = docs
      .select(explode(graft.pipeline.Repetition.tokens($"text")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .filter($"n" >= 80).as[(String, Long)].collect().toSet
    val hh = graft.pipeline.Sketches.heavyHitters(docs, "text", minCount = 80)
      .as[(String, Long)].collect().toSet
    assert(hh === exact)
    assert(hh.nonEmpty)
  }
}
