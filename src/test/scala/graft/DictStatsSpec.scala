package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.Readers
import graft.table.{GraftTable, WritePipeline}

/** Dictionary value-set stat collection cost control: the footer
  * dictionary-page reads are skippable per table
  * (`graft.stats.dictionary=false`), and a column a commit proves
  * ineligible (high cardinality / plain-page fallback) is carried in the
  * table config so later commits spend zero dictionary IO on it.
  */
class DictStatsSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def lastStats(t: GraftTable) = CommitMetadata.fromJson(
    t.timeline.readContent(t.timeline.completedDataInstants().last)).writeStats

  test("graft.stats.dictionary=false records no value sets and reads no pages") {
    val dir = tmpDir("dict_off").toString + "/t"
    val t = GraftTable.create(spark, dir, TableConfig(
      "doff", TableType.CopyOnWrite, Seq("id"), "", "ver",
      Map(ConfigKeys.DictionaryStats -> "false")))
    val col = "cat_doff_col"
    val before = Option(WritePipeline.dictPageReads.get(col)).map(_.toLong).getOrElse(0L)
    t.bulkInsert((1L to 40L).map(i => (i, 1L, s"cat${i % 3}"))
      .toDF("id", "ver", col))
    assert(lastStats(t).forall(_.colValues.isEmpty))
    val after = Option(WritePipeline.dictPageReads.get(col)).map(_.toLong).getOrElse(0L)
    assert(after === before, "dictionary pages were read with stats disabled")
    // min/max stats are unaffected
    assert(lastStats(t).exists(_.colMin.contains(col)))
  }

  test("a high-cardinality column poisons once, then costs zero dictionary IO") {
    val dir = tmpDir("dict_poison").toString + "/t"
    val t = GraftTable.create(spark, dir, TableConfig(
      "dpo", TableType.CopyOnWrite, Seq("id"), "", "ver"))
    val col = "hc_dpo_col" // unique per suite: the IO counter is global
    def reads: Long =
      Option(WritePipeline.dictPageReads.get(col)).map(_.toLong).getOrElse(0L)

    // 50 distinct values (> DictValuesCap=32), each repeated: parquet
    // dictionary-encodes, so the first commit pays the page read and
    // poisons on cardinality
    t.bulkInsert((1L to 200L).map(i => (i, 1L, s"val${i % 50}")).toDF("id", "ver", col))
    assert(reads > 0, "first commit should have read the dictionary page")
    assert(lastStats(t).forall(s => !s.colValues.contains(col)))
    assert(lastStats(t).exists(_.colDictPoisoned.contains(col)))
    // the poison is persisted in the table config
    val persisted = TableConfig.load(t.basePath)
      .prop(ConfigKeys.DictionaryPoisoned, "")
    assert(WritePipeline.DictStats.parsePoisoned(persisted).contains(col))

    // next commit (same handle): ZERO dictionary reads for the column
    val mark = reads
    t.upsert((1L to 200L).map(i => (i, 2L, s"neu${i % 50}")).toDF("id", "ver", col))
    assert(reads === mark, "poisoned column paid dictionary IO again")
    assert(lastStats(t).forall(_.colDictPoisoned.isEmpty))

    // and a FRESH handle picks the poison up from the config
    val t2 = GraftTable.load(spark, dir)
    t2.upsert((1L to 200L).map(i => (i, 3L, s"drei${i % 50}")).toDF("id", "ver", col))
    assert(reads === mark, "reloaded handle re-read a poisoned column's pages")

    // correctness unaffected: range stats still prune/read fine
    assert(Readers.snapshot(t2).count() === 200)
  }

  test("a low-cardinality column keeps its value sets alongside a poisoned one") {
    val dir = tmpDir("dict_mixed").toString + "/t"
    val t = GraftTable.create(spark, dir, TableConfig(
      "dmx", TableType.CopyOnWrite, Seq("id"), "", "ver"))
    t.bulkInsert((1L to 100L).map(i => (i, 1L, s"u$i", s"cat${i % 3}"))
      .toDF("id", "ver", "hc_dmx_col", "lc_dmx_col"))
    t.upsert((1L to 10L).map(i => (i, 2L, s"u$i", s"cat${i % 3}"))
      .toDF("id", "ver", "hc_dmx_col", "lc_dmx_col"))
    val s = lastStats(t)
    assert(s.exists(_.colValues.get("lc_dmx_col").exists(_.nonEmpty)))
    assert(s.forall(st => !st.colValues.contains("hc_dmx_col")))
    // equality pruning on the kept set still answers correctly
    assert(Readers.snapshot(t).filter($"lc_dmx_col" === "cat1").count() === 34)
  }
}
