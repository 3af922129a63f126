package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.streaming.{IngestJob, JdbcSource}
import graft.table.{GraftTable, WritePipeline}

/** JdbcSource against embedded Derby (on the Spark classpath): full and
  * incremental checkpointed ingest, checkpoint riding in commit metadata.
  */
class JdbcIngestSpec extends AnyFunSuite {
  import SparkTestBase._

  private def freshDb(name: String): String = {
    // Derby boots once per JVM and logs to user.dir unless redirected
    System.setProperty("derby.stream.error.file",
      s"${sys.props("java.io.tmpdir")}/derby_test.log")
    val dir = s"${tmpDir("derby").toString}/$name"
    s"jdbc:derby:$dir;create=true"
  }

  test("incremental JDBC ingest advances the checkpoint per tick") {
    val url = freshDb("incr")
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE src (id BIGINT NOT NULL, v DOUBLE, tag VARCHAR(10))")
    (1 to 6).foreach(i => st.execute(s"INSERT INTO src VALUES ($i, ${i * 1.5}, 'a')"))

    val root = tmpDir("jdbc_dst").toString + "/t"
    WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(root))
    val dst = GraftTable.create(spark, root, TableConfig(
      "jdbc_t", TableType.CopyOnWrite, Seq("id"), "", ""))
    // raw-DDL Derby tables store unquoted identifiers uppercase; the
    // incremental column is passed exactly as stored
    val src = new JdbcSource(url, "src", Some("ID"))

    assert(IngestJob.syncOnce(spark, src, dst).isDefined)
    assert(IngestJob.lastCheckpoint(dst) === Some("6"))
    assert(graft.read.Readers.snapshot(dst).count() === 6)

    // nothing new: no commit, checkpoint unchanged
    assert(IngestJob.syncOnce(spark, src, dst).isEmpty)
    assert(IngestJob.lastCheckpoint(dst) === Some("6"))

    // late tick sees only rows past the checkpoint
    (7 to 9).foreach(i => st.execute(s"INSERT INTO src VALUES ($i, ${i * 1.5}, 'b')"))
    assert(IngestJob.syncOnce(spark, src, dst).isDefined)
    assert(IngestJob.lastCheckpoint(dst) === Some("9"))
    val snap = graft.read.Readers.snapshot(dst)
    assert(snap.count() === 9)
    assert(snap.filter(col("tag") === "b").count() === 3)
    st.close(); conn.close()
  }

  test("timestamp incremental column checkpoints across ticks") {
    val url = freshDb("ts")
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE src_ts (id BIGINT NOT NULL, evt TIMESTAMP)")
    st.execute("INSERT INTO src_ts VALUES (1, TIMESTAMP('2026-01-01 10:00:00'))")
    st.execute("INSERT INTO src_ts VALUES (2, TIMESTAMP('2026-01-01 11:30:00'))")
    val src = new JdbcSource(url, "src_ts", Some("EVT"))
    val Some((b1, c1)) = src.fetchNext(spark, None)
    assert(b1.count() === 2)
    // the string checkpoint must round-trip through the SQL literal
    st.execute("INSERT INTO src_ts VALUES (3, TIMESTAMP('2026-01-01 12:00:00'))")
    val Some((b2, c2)) = src.fetchNext(spark, Some(c1))
    assert(b2.count() === 1)
    assert(b2.select("ID").first().getLong(0) === 3L)
    assert(c2 > c1)
    assert(src.fetchNext(spark, Some(c2)).isEmpty)
    st.close(); conn.close()
  }

  test("full-refresh mode re-pulls the table each tick") {
    val url = freshDb("full")
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE src2 (id BIGINT NOT NULL, v DOUBLE)")
    st.execute("INSERT INTO src2 VALUES (1, 1.0), (2, 2.0)")

    val src = new JdbcSource(url, "src2")
    val Some((b1, c1)) = src.fetchNext(spark, None)
    assert(b1.count() === 2 && c1 === "0")
    st.execute("UPDATE src2 SET v = 9.0 WHERE id = 2")
    val Some((b2, c2)) = src.fetchNext(spark, Some(c1))
    assert(c2 === "1")
    assert(b2.filter(col("id") === 2).first().getDouble(1) === 9.0)
    st.close(); conn.close()
  }
}
