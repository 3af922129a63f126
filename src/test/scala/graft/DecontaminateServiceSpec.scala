package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.pipeline.{Decontaminate, DecontaminateService}
import graft.read.Readers
import graft.table.GraftTable

/** Incremental decontamination service: per-tick probe of the persisted
  * benchmark shingle index must equal the batch operator under ANY tick
  * order, a new benchmark suite applies from registration on, and an
  * unchanged source is a no-op.
  */
class DecontaminateServiceSpec extends AnyFunSuite {
  import SparkTestBase._

  private def docsCfg(name: String) =
    TableConfig(name, TableType.CopyOnWrite, Seq("doc_id"), "", "")

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("unordered ticks equal the batch decontaminate; no-op on unchanged source") {
    val root = tmpDir("decon_svc").toString
    val srcT = GraftTable.create(spark, s"$root/source", docsCfg("src"))
    val cleanT = GraftTable.create(spark, s"$root/clean", docsCfg("clean"))
    val idx = DecontaminateService.openIndex(spark, s"$root/index", n = 8)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    DecontaminateService.updateBenchmark(idx, bench)
    // registering the same suite again is idempotent (keyed upsert)
    DecontaminateService.updateBenchmark(idx, bench)
    val mx = train.agg(max("doc_id")).head().getLong(0)
    for (tick <- Seq( // out of id order on purpose
        train.filter(col("doc_id") > mx / 2),
        train.filter(col("doc_id") <= mx / 2))) {
      srcT.upsert(tick)
      assert(DecontaminateService.sync(srcT, cleanT, idx).nonEmpty)
    }
    assert(DecontaminateService.sync(srcT, cleanT, idx).isEmpty) // drained
    val got = Readers.snapshot(cleanT).select("doc_id").orderBy("doc_id").collect()
    val want = Decontaminate.decontaminate(train, bench, n = 8)
      .select("doc_id").orderBy("doc_id").collect()
    assert(got.sameElements(want), "incremental != batch decontaminate")
    assert(got.length < train.count(), "nothing was ever contaminated — weak fixture")
  }

  test("a benchmark suite added later guards later ticks only") {
    val root = tmpDir("decon_svc2").toString
    val srcT = GraftTable.create(spark, s"$root/source", docsCfg("src"))
    val cleanT = GraftTable.create(spark, s"$root/clean", docsCfg("clean"))
    val idx = DecontaminateService.openIndex(spark, s"$root/index", n = 8)
    import spark.implicits._
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val textB = "one two three four five six seven eight nine ten"
    DecontaminateService.updateBenchmark(idx,
      Seq((900L, textA)).toDF("doc_id", "text"))
    srcT.upsert(Seq((1L, textA), (2L, "clean unique content " + textB))
      .toDF("doc_id", "text"))
    DecontaminateService.sync(srcT, cleanT, idx)
    // doc 1 leaked suite A and dropped; doc 2 published
    assert(Readers.snapshot(cleanT).select("doc_id").as[Long].collect().toSet === Set(2L))
    // suite B registers AFTER doc 2 was published: not retroactive, but a
    // later arrival carrying suite B text is cut
    DecontaminateService.updateBenchmark(idx, Seq((901L, textB)).toDF("doc_id", "text"))
    srcT.upsert(Seq((3L, textB), (4L, "wholly unrelated words here again ok"))
      .toDF("doc_id", "text"))
    DecontaminateService.sync(srcT, cleanT, idx)
    assert(Readers.snapshot(cleanT).select("doc_id").as[Long].collect().toSet ===
      Set(2L, 4L))
  }

  test("source rollback wipes clean (not the benchmark index) and rebuilds") {
    val root = tmpDir("decon_svc3").toString
    val srcT = GraftTable.create(spark, s"$root/source", docsCfg("src"))
    val cleanT = GraftTable.create(spark, s"$root/clean", docsCfg("clean"))
    val idx = DecontaminateService.openIndex(spark, s"$root/index", n = 8)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val train = docs.filter(col("doc_id") % 97 =!= 0).filter(col("doc_id") < 300)
    DecontaminateService.updateBenchmark(idx, bench)
    srcT.bulkInsert(train)
    DecontaminateService.sync(srcT, cleanT, idx)
    val benchRows = Readers.snapshot(idx).count()
    // a bad batch lands and is rolled back — the service must rebuild
    val bad = srcT.upsert(train.limit(50)
      .withColumn("doc_id", col("doc_id") + 5000000L))
    graft.table.Services.rollback(srcT, bad)
    DecontaminateService.sync(srcT, cleanT, idx)
    val got = Readers.snapshot(cleanT).select("doc_id").orderBy("doc_id").collect()
    val want = Decontaminate.decontaminate(train, bench, n = 8)
      .select("doc_id").orderBy("doc_id").collect()
    assert(got.sameElements(want), "post-rollback rebuild diverged")
    // the benchmark index is source-independent and survived untouched
    assert(Readers.snapshot(idx).count() === benchRows)
  }

  test("graded thresholds match the batch contaminationScore rule per suite") {
    val root = tmpDir("decon_svc4").toString
    val srcT = GraftTable.create(spark, s"$root/source", docsCfg("src"))
    val cleanT = GraftTable.create(spark, s"$root/clean", docsCfg("clean"))
    val idx = DecontaminateService.openIndex(spark, s"$root/index", n = 8)
    import spark.implicits._
    val easy = (1 to 12).map(i => s"zqe$i").mkString(" ")
    val strict = (1 to 10).map(i => s"zqs$i").mkString(" ")
    DecontaminateService.updateBenchmark(idx, Seq(easy).toDF("text"), suite = "easy")
    DecontaminateService.updateBenchmark(idx, Seq(strict).toDF("text"), suite = "strict")
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      (1L, easy), // 100% easy > 0.6 → dropped
      (2L, filler + " " + easy), // small easy fraction → kept
      (3L, filler + " " + strict), // ANY strict hit (thr 0) → dropped
      (4L, filler)) // untouched → kept
    srcT.upsert(rows.toDF("doc_id", "text"))
    DecontaminateService.sync(srcT, cleanT, idx,
      thresholds = Map("easy" -> 0.6, "strict" -> 0.0))
    assert(Readers.snapshot(cleanT).select("doc_id").as[Long].collect().toSet ===
      Set(2L, 4L))
    // the batch graded operator agrees: contaminationScore over the same
    // rows thresholds to the same survivor set
    val scoreEasy = Decontaminate.contaminationScore(
      rows.toDF("doc_id", "text"), Seq(easy).toDF("text"), n = 8)
    val scoreStrict = Decontaminate.contaminationScore(
      rows.toDF("doc_id", "text"), Seq(strict).toDF("text"), n = 8)
    val badBatch =
      scoreEasy.filter(col("contamination") > 0.6).select("doc_id").as[Long].collect().toSet ++
        scoreStrict.filter(col("n_hits") > 0).select("doc_id").as[Long].collect().toSet
    assert(badBatch === Set(1L, 3L))
    // a source rollback rebuilds through the SAME graded rule
    val bad = srcT.upsert(Seq((9L, easy)).toDF("doc_id", "text"))
    graft.table.Services.rollback(srcT, bad)
    DecontaminateService.sync(srcT, cleanT, idx,
      thresholds = Map("easy" -> 0.6, "strict" -> 0.0))
    assert(Readers.snapshot(cleanT).select("doc_id").as[Long].collect().toSet ===
      Set(2L, 4L))
  }

  test("a legacy shingle-only index refuses with a rebuild instruction") {
    import spark.implicits._
    val root = tmpDir("decon_legacy").toString
    // an index created BEFORE graded mode: keyed by the shingle alone,
    // no suite column — silently upserting suite-tagged rows into it
    // would collapse suites sharing a shingle
    GraftTable.create(spark, s"$root/index", TableConfig(
      "decon_shingles", TableType.CopyOnWrite, Seq("s"),
      "concat('p=', cast(pmod(abs(xxhash64(s)), 64) as string))", "",
      Map("graft.decon.fp.partitions" -> "64", "graft.decon.shingle.n" -> "8")))
    val eOpen = intercept[IllegalArgumentException] {
      DecontaminateService.openIndex(spark, s"$root/index", n = 8)
    }
    assert(eOpen.getMessage.contains("legacy decontamination index"))
    assert(eOpen.getMessage.contains("Rebuild"))
    // direct handles hit the same wall at update and sync time
    val legacy = GraftTable.load(spark, s"$root/index")
    intercept[IllegalArgumentException] {
      DecontaminateService.updateBenchmark(legacy, Seq("abc").toDF("text"))
    }
    val srcT = GraftTable.create(spark, s"$root/source", docsCfg("src"))
    val cleanT = GraftTable.create(spark, s"$root/clean", docsCfg("clean"))
    srcT.upsert(Seq((1L, "t")).toDF("doc_id", "text"))
    intercept[IllegalArgumentException] {
      DecontaminateService.sync(srcT, cleanT, legacy)
    }
  }
}
