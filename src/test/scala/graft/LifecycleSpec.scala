package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{Action, ConfigKeys, TableConfig, TableType}
import graft.table.GraftTable

/** Long-lived-table integration: 30 commits with post-commit auto-clean
  * and timeline archival active together. This exercises the
  * interactions no single-service spec covers: cleans folding into the
  * file-system view, the archive-time index snapshot baking those
  * subtractions in, and the post-archive refold reseating on the
  * snapshot — the steady state a week-long ingest job actually runs in.
  */
class LifecycleSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("30-commit lifecycle with auto-clean + archive: exact reads, bounded state") {
    val dir = tmpDir("lifecycle").toString + "/t"
    val t = GraftTable.create(spark, dir, TableConfig(
      "lifecycle", TableType.CopyOnWrite, Seq("id"), "pmod(id, 4)", "ver",
      Map(ConfigKeys.AutoClean -> "true",
        ConfigKeys.CleanerCommitsRetained -> "3",
        ConfigKeys.ArchiveMinCommits -> "6",
        ConfigKeys.ArchiveMaxCommits -> "10")))

    val n = 200
    t.bulkInsert((1 to n).map(i => (i.toLong, 0L, 0.0)).toDF("id", "ver", "price"))
    // tick k rewrites residue class k%5 with price = k; replay the same
    // rule driver-side for the expected final state
    val lastTick = Array.fill(n + 1)(0)
    (1 to 30).foreach { k =>
      val touched = (1 to n).filter(_ % 5 == k % 5)
      touched.foreach(i => lastTick(i) = k)
      t.upsert(touched.map(i => (i.toLong, k.toLong, k.toDouble))
        .toDF("id", "ver", "price"))
    }

    val got = graft.read.Readers.snapshot(t)
      .select("id", "price").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size === n)
    (1 to n).foreach(i => assert(got(i.toLong) === lastTick(i).toDouble,
      s"row $i diverged"))

    // auto-clean ran and the fold subtracted its deletions: the view's
    // entry state is bounded by live + retained files, not 31 versions
    val st = t.view.allEntries()
    val liveGroups = t.view.fileSlices(None).size
    assert(st.entries.size <= liveGroups * 5,
      s"entry state unbounded: ${st.entries.size} entries for $liveGroups groups")
    // every tracked file physically exists (nothing points at a cleaned path)
    st.entries.foreach { e =>
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir).resolve(e.relPath)), s"dangling ${e.relPath}")
    }

    // archive kept the active timeline bounded
    val active = t.timeline.completedInstants()
    assert(active.size <= 12, s"active timeline unbounded: ${active.size}")
    assert(active.exists(_.action == Action.Clean) ||
      t.timeline.completedInstants().nonEmpty)

    // the table keeps working after the whole history: one more write+read
    t.upsert(Seq((1L, 99L, 99.0)).toDF("id", "ver", "price"))
    assert(graft.read.Readers.snapshot(t)
      .filter(col("id") === 1).select("price").first().getDouble(0) === 99.0)
  }
}
