package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.core._
import graft.read.Readers
import graft.table.GraftTable

/** Supplementary-plane (non-BMP) string collation: parquet footers order
  * BINARY min/max by unsigned UTF-8 bytes, where the surrogate-encoded
  * U+10000+ range sorts ABOVE U+E000; JVM String.compareTo (UTF-16 code
  * units) inverts that. Range pruning must compare in the footer's
  * collation or files bracketing non-BMP values get mis-pruned: a read
  * silently returns no rows, an upsert misses the existing key and lands a
  * duplicate. These tests pin the byte-order comparison end to end.
  */
class Utf8OrderSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private val PrivateUse = "" // U+E000, 3 UTF-8 bytes EE 80 80
  private val Emoji = "😀" // U+1F600, 4 UTF-8 bytes F0 9F 98 80

  test("Utf8Order sorts supplementary-plane chars above U+E000 (UTF-16 inverts)") {
    // the raw JVM order is the trap: surrogate D83D < E000
    assert(PrivateUse.compareTo(Emoji) > 0, "JVM UTF-16 order (the wrong one)")
    // byte order matches the parquet footer and Spark SQL sort order
    assert(Utf8Order.compare(PrivateUse, Emoji) < 0)
    assert(Utf8Order.lteq("a", PrivateUse) && Utf8Order.lteq(PrivateUse, Emoji))
    assert(Utf8Order.rangesOverlap("a", Emoji, PrivateUse, PrivateUse))
    // the fold wrapper orders the same way and unwraps cleanly
    assert(Utf8Order.Str(PrivateUse).compareTo(Utf8Order.Str(Emoji)) < 0)
    assert(Utf8Order.Str(Emoji).toString === Emoji)
  }

  private def listedFor(df: org.apache.spark.sql.DataFrame): Int = {
    val scan = df.queryExecution.executedPlan
      .collectFirst { case f: FileSourceScanExec => f }.get
    scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files).size
  }

  test("data skipping keeps a file whose byte-order range brackets a non-BMP predicate") {
    val dir = tmpDir("utf8_skip")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "u8", TableType.CopyOnWrite, Seq("id"), "", "ver"))
    // one file: footer min="alpha", max=emoji in BYTE order; UTF-16 order
    // would call PrivateUse > max and prune the file
    t.bulkInsert(Seq((1L, 1L, "alpha"), (2L, 1L, PrivateUse), (3L, 1L, Emoji))
      .toDF("id", "ver", "v"))

    val ge = Readers.snapshot(t).filter($"v" >= PrivateUse)
    assert(listedFor(ge) === 1, "file must not be mis-pruned for v >= U+E000")
    assert(ge.count() === 2)

    val eq = Readers.snapshot(t).filter($"v" === PrivateUse)
    assert(eq.count() === 1)

    val gtEmoji = Readers.snapshot(t).filter($"v" >= Emoji)
    assert(gtEmoji.count() === 1)
  }

  test("upsert finds an existing non-BMP record key (no duplicate from range skip)") {
    val dir = tmpDir("utf8_upsert")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "u8k", TableType.CopyOnWrite, Seq("k"), "", "ver"))
    // file key range [alpha, emoji] in byte order
    t.bulkInsert(Seq(("alpha", 1L, 10), (PrivateUse, 1L, 20), (Emoji, 1L, 30))
      .toDF("k", "ver", "amount"))

    // incoming range is [U+E000, U+E000]; UTF-16 overlap vs [alpha, emoji]
    // is FALSE (emoji < U+E000 in UTF-16) -> old code skipped the file,
    // tagged the key as new, and landed a duplicate
    t.upsert(Seq((PrivateUse, 2L, 99)).toDF("k", "ver", "amount"))

    val out = Readers.snapshot(t).select("k", "amount")
      .as[(String, Int)].collect().toMap
    assert(out.size === 3, s"duplicate key landed: ${out.size} rows")
    assert(out(PrivateUse) === 99)
    assert(out("alpha") === 10 && out(Emoji) === 30)
  }

  test("stats-answered min/max is exact over non-ASCII strings (zero jobs)") {
    val dir = tmpDir("utf8_stats")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "u8s", TableType.CopyOnWrite, Seq("id"), "", "ver"))
    // two files so the cross-file fold runs; byte-order max is the emoji
    t.bulkInsert(Seq((1L, 1L, "alpha"), (2L, 1L, PrivateUse)).toDF("id", "ver", "v"))
    t.insert(Seq((3L, 1L, Emoji), (4L, 1L, "zebra")).toDF("id", "ver", "v"))
    var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = Readers.snapshot(t)
        .agg(org.apache.spark.sql.functions.min("v"),
          org.apache.spark.sql.functions.max("v")).head()
      Thread.sleep(800) // async listener bus drain
      assert(r.getString(0) === "alpha" && r.getString(1) === Emoji,
        s"got (${r.getString(0)}, ${r.getString(1)})")
      assert(jobs === 0, s"stats-answered min/max ran $jobs jobs")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("non-BMP record keys round-trip through delete") {
    val dir = tmpDir("utf8_del")
    val t = GraftTable.create(spark, dir.toString, TableConfig(
      "u8d", TableType.CopyOnWrite, Seq("k"), "", "ver"))
    t.bulkInsert(Seq(("alpha", 1L), (PrivateUse, 1L), (Emoji, 1L)).toDF("k", "ver"))
    t.delete(Seq((PrivateUse, 2L)).toDF("k", "ver"))
    val left = Readers.snapshot(t).select("k").as[String].collect().toSet
    assert(left === Set("alpha", Emoji))
  }
}
