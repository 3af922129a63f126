package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core._
import graft.table.{GraftTable, Services}
import graft.read.Readers

/** Negative-path probes at the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val out = "/tmp/graft_probe"
    graft.table.WritePipeline.deleteRecursively(java.nio.file.Paths.get(out))
    val cfg = TableConfig("p", TableType.CopyOnWrite, Seq("id"), "", "v")
    val t = GraftTable.create(spark, out, cfg)
    val c1 = t.bulkInsert(Seq((1L, 1L), (2L, 1L)).toDF("id", "v"))
    val c2 = t.upsert(Seq((1L, 2L)).toDF("id", "v"))

    // probe 1: create over existing table
    try { GraftTable.create(spark, out, cfg); println("[probe] create-existing: NO ERROR (bad)") }
    catch { case e: IllegalArgumentException => println(s"[probe] create-existing: ${e.getMessage}") }

    // probe 2: rollback of non-latest instant
    try { Services.rollback(t, c1); println("[probe] rollback-nonlatest: NO ERROR (bad)") }
    catch { case e: IllegalArgumentException => println(s"[probe] rollback-nonlatest: ${e.getMessage}") }

    // probe 3: load nonexistent table
    try { GraftTable.load(spark, "/tmp/graft_nope"); println("[probe] load-missing: NO ERROR (bad)") }
    catch { case e: Throwable => println(s"[probe] load-missing: ${e.getClass.getSimpleName}") }

    // probe 4: upsert empty batch
    val c3 = t.upsert(Seq.empty[(Long, Long)].toDF("id", "v"))
    println(s"[probe] empty-upsert: commit=$c3 snapshot=${Readers.snapshot(t).count()}")

    // probe 5: incremental range with no commits
    println(s"[probe] incremental-empty: rows=${Readers.incremental(t, "99999999999999999").count()}")

    // probe 6: concurrent-ish double delete of same keys (idempotence)
    t.delete(Seq((1L, 0L)).toDF("id", "v")); t.delete(Seq((1L, 0L)).toDF("id", "v"))
    println(s"[probe] double-delete: snapshot=${Readers.snapshot(t).count()} (expect 1)")
    // probe 7: truncate then write again
    t.truncate()
    println(s"[probe] truncate: snapshot=${Readers.snapshot(t).count()} (expect 0)")
    t.upsert(Seq((7L, 1L)).toDF("id", "v"))
    println(s"[probe] post-truncate-write: snapshot=${Readers.snapshot(t).count()} (expect 1)")

    // probe 8: reentrant lock — MOR inline compaction runs inside the
    // commit's lock scope (deltacommit -> postCommit -> compact)
    val morDir = "/tmp/graft_probe_mor"
    graft.table.WritePipeline.deleteRecursively(java.nio.file.Paths.get(morDir))
    val mor = GraftTable.create(spark, morDir, TableConfig("pm", TableType.MergeOnRead,
      Seq("id"), "", "v", Map(ConfigKeys.CompactDeltaCommits -> "1")))
    mor.bulkInsert(Seq((1L, 1L), (2L, 1L)).toDF("id", "v"))
    mor.upsert(Seq((1L, 2L)).toDF("id", "v")) // triggers inline compact under held lock
    println(s"[probe] reentrant-lock-inline-compact: compactions=${mor.timeline.completedInstants().count(_.action == Action.Compaction)} snapshot=${Readers.snapshot(mor).count()}")
    spark.stop()
    println("[probe] DONE")
  }
}
