package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.pipeline.{HashDedupService, ImageHash}
import graft.read.Readers
import graft.table.GraftTable

/** Randomized tick splits of an id-ordered corpus must always converge to
  * the from-scratch pairwise dedup: doc kept iff no LOWER-id doc sits
  * within Hamming maxDist of it. The model is computed directly from the
  * hashes in local Scala — independent of every Spark code path under
  * test (banding, index probe, checkpointing).
  */
class HashDedupFuzzSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private val N = 96
  private val Fams = 8
  private val MaxDist = 3

  private val imageHash: DataFrame => DataFrame = df =>
    ImageHash.phashImages(ImageHash.withSyntheticPng(df, fams = Fams))
      .withColumnRenamed("phash", "hash")

  // ground truth: pairwise from-scratch over the REAL hashes
  private lazy val expectedKept: Set[Long] = {
    val h = (0L until N).map(id =>
      id -> ImageHash.phash64(ImageHash.syntheticPng(id, Fams)).get).toMap
    (0L until N).filter { id =>
      (0L until id).forall(lo =>
        java.lang.Long.bitCount(h(lo) ^ h(id)) > MaxDist)
    }.toSet
  }

  test("random id-ordered tick splits all converge to the pairwise model") {
    val rnd = new scala.util.Random(12012)
    for (trial <- 1 to 4) {
      val root = tmpDir(s"hash_fuzz_$trial").toString
      val cfg = TableConfig("src", TableType.CopyOnWrite, Seq("doc_id"), "", "")
      val srcT = GraftTable.create(spark, s"$root/source", cfg)
      val cleanT = GraftTable.create(spark, s"$root/clean",
        cfg.copy(tableName = "clean"))
      val idx = HashDedupService.openIndex(spark, s"$root/index",
        maxDist = MaxDist)
      // contiguous random split points → nondecreasing id arrival
      val cuts = (Seq(0, N) ++ Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(N)))
        .distinct.sorted
      val ticks = cuts.sliding(2).map { case Seq(a, b) =>
        spark.range(a, b).select(col("id").as("doc_id")) }.toSeq
      for (t <- ticks if t.count() > 0) {
        srcT.upsert(t)
        HashDedupService.sync(srcT, cleanT, idx, imageHash)
      }
      val got = Readers.snapshot(cleanT).select("doc_id").as[Long].collect().toSet
      assert(got === expectedKept,
        s"trial $trial cuts $cuts: extra=${got -- expectedKept} missing=${expectedKept -- got}")
    }
  }

  test("out-of-order id arrival stays near-dup-free (first-seen-wins)") {
    // r12 ADVICE: a late arrival with a LOWER id than its already-indexed
    // near-dup used to slip past the l < r probe filter and leave a
    // near-dup pair in clean. Model: a doc is dropped iff an EARLIER-TICK
    // doc (kept or dropped — every seen doc vetoes) or a lower-id
    // same-tick doc sits within maxDist.
    val rnd = new scala.util.Random(77013)
    val h = (0L until N).map(id =>
      id -> ImageHash.phash64(ImageHash.syntheticPng(id, Fams)).get).toMap
    for (trial <- 1 to 3) {
      val root = tmpDir(s"hash_fuzz_ooo_$trial").toString
      val cfg = TableConfig("src", TableType.CopyOnWrite, Seq("doc_id"), "", "")
      val srcT = GraftTable.create(spark, s"$root/source", cfg)
      val cleanT = GraftTable.create(spark, s"$root/clean",
        cfg.copy(tableName = "clean"))
      val idx = HashDedupService.openIndex(spark, s"$root/index",
        maxDist = MaxDist)
      // contiguous slices fed in SHUFFLED order → later ticks carry ids
      // below already-indexed ones
      val cuts = (Seq(0, N) ++ Seq.fill(2 + rnd.nextInt(3))(rnd.nextInt(N)))
        .distinct.sorted
      val ticks = rnd.shuffle(
        cuts.sliding(2).map { case Seq(a, b) => (a.toLong, b.toLong) }.toSeq)
      val seen = scala.collection.mutable.ArrayBuffer.empty[Long] // all indexed ids
      val model = scala.collection.mutable.Set.empty[Long]
      for ((a, b) <- ticks) {
        srcT.upsert(spark.range(a, b).select(col("id").as("doc_id")))
        HashDedupService.sync(srcT, cleanT, idx, imageHash)
        for (id <- a until b) {
          val vetoed =
            seen.exists(lo => java.lang.Long.bitCount(h(lo) ^ h(id)) <= MaxDist) ||
            (a until id).exists(lo =>
              java.lang.Long.bitCount(h(lo) ^ h(id)) <= MaxDist)
          if (!vetoed) model += id
        }
        seen ++= (a until b)
      }
      val got = Readers.snapshot(cleanT).select("doc_id").as[Long].collect().toSet
      assert(got === model.toSet,
        s"trial $trial ticks $ticks: extra=${got -- model} missing=${model -- got}")
      // the headline invariant, asserted directly: no kept pair near-dups
      val kept = got.toSeq.sorted
      for (i <- kept.indices; j <- 0 until i)
        assert(java.lang.Long.bitCount(h(kept(j)) ^ h(kept(i))) > MaxDist,
          s"near-dup pair survived in clean: ${kept(j)} / ${kept(i)}")
    }
  }

  test("crash replay: re-syncing the same checkpoint changes nothing") {
    val root = tmpDir("hash_fuzz_replay").toString
    val cfg = TableConfig("src", TableType.CopyOnWrite, Seq("doc_id"), "", "")
    val srcT = GraftTable.create(spark, s"$root/source", cfg)
    val cleanT = GraftTable.create(spark, s"$root/clean", cfg.copy(tableName = "clean"))
    val idx = HashDedupService.openIndex(spark, s"$root/index", maxDist = MaxDist)
    srcT.bulkInsert(spark.range(N / 2).select(col("id").as("doc_id")))
    HashDedupService.sync(srcT, cleanT, idx, imageHash)
    // simulate the crash window: index rows landed but the clean commit's
    // checkpoint did not → the tick REPLAYS against a poisoned index
    // (duplicate band rows) and must reach the same answer
    srcT.upsert(spark.range(N / 2, N).select(col("id").as("doc_id")))
    val before = HashDedupService.lastCheckpoint(cleanT)
    // first attempt: manually append this tick's band rows, as a crashed
    // run would have
    val pulled = Readers.incremental(srcT, before.get)
    val hashed = imageHash(pulled.select("doc_id"))
    val slices = array((0 until 4).map(i =>
      shiftrightunsigned(col("hash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)
    idx.bands.insert(hashed.select(col("doc_id"), col("hash"),
        posexplode(slices).as(Seq("band", "bucket")))
      .select(col("band"), col("bucket"), col("doc_id"), col("hash")))
    // replayed tick over the duplicated postings
    HashDedupService.sync(srcT, cleanT, idx, imageHash)
    val got = Readers.snapshot(cleanT).select("doc_id").as[Long].collect().toSet
    assert(got === expectedKept, "crash replay diverged from the model")
  }
}
