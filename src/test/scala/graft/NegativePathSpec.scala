package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.Readers
import graft.table.{GraftTable, Services}

/** Negative/edge paths at the library surface: error contracts on misuse,
  * idempotence of destructive ops, and lock re-entrancy. Mirrors the
  * reference's guard behavior (e.g. HoodieTableMetaClient refuses re-init
  * of an existing table; rollback validates the instant is latest —
  * reference hudi-client-common/.../BaseHoodieWriteClient.java).
  */
class NegativePathSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def cfg(name: String) =
    TableConfig(name, TableType.CopyOnWrite, Seq("id"), "", "v")

  test("create over an existing table refuses") {
    val dir = tmpDir("neg_create").toString
    GraftTable.create(spark, dir, cfg("neg1"))
    intercept[IllegalArgumentException] { GraftTable.create(spark, dir, cfg("neg1")) }
  }

  test("layout version: stamped at create, future version refuses, up/downgrade round-trips") {
    import graft.table.TableAdmin
    val dir = tmpDir("neg_ver").toString
    val t = GraftTable.create(spark, dir, cfg("neg_ver"))
    assert(t.cfg.propLong(ConfigKeys.TableVersion, -1L) ===
      ConfigKeys.CurrentTableVersion)
    // a pre-versioning table (no field) still opens
    val cfg0 = TableConfig.load(t.basePath)
    TableConfig.save(t.basePath,
      cfg0.copy(props = cfg0.props - ConfigKeys.TableVersion))
    assert(GraftTable.load(spark, dir).cfg
      .propLong(ConfigKeys.TableVersion, 1L) === 1L)
    // a FUTURE layout refuses to open instead of misreading it
    TableConfig.save(t.basePath, cfg0.copy(props =
      cfg0.props + (ConfigKeys.TableVersion -> "999")))
    val e = intercept[IllegalArgumentException] { GraftTable.load(spark, dir) }
    assert(e.getMessage.contains("layout version 999"))
    // upgrade re-stamps current; downgrade validates the target
    TableAdmin.upgradeTable(t)
    assert(GraftTable.load(spark, dir).cfg
      .propLong(ConfigKeys.TableVersion, -1L) === ConfigKeys.CurrentTableVersion)
    assert(TableAdmin.downgradeTable(t, 1L) === 1L)
    intercept[IllegalArgumentException] { TableAdmin.downgradeTable(t, 999L) }
  }

  test("rollback of a non-latest instant refuses") {
    val dir = tmpDir("neg_rb").toString
    val t = GraftTable.create(spark, dir, cfg("neg2"))
    val c1 = t.bulkInsert(Seq((1L, 1L), (2L, 1L)).toDF("id", "v"))
    t.upsert(Seq((1L, 2L)).toDF("id", "v"))
    intercept[IllegalArgumentException] { Services.rollback(t, c1) }
  }

  test("loading a nonexistent table throws") {
    intercept[Throwable] { GraftTable.load(spark, tmpDir("neg_nope").toString + "/absent") }
  }

  test("empty upsert commits and leaves the snapshot unchanged") {
    val dir = tmpDir("neg_empty").toString
    val t = GraftTable.create(spark, dir, cfg("neg3"))
    t.bulkInsert(Seq((1L, 1L), (2L, 1L)).toDF("id", "v"))
    t.upsert(Seq.empty[(Long, Long)].toDF("id", "v"))
    assert(Readers.snapshot(t).count() === 2)
  }

  test("incremental read past the last commit is empty") {
    val dir = tmpDir("neg_incr").toString
    val t = GraftTable.create(spark, dir, cfg("neg4"))
    t.bulkInsert(Seq((1L, 1L)).toDF("id", "v"))
    assert(Readers.incremental(t, "99999999999999999").count() === 0)
  }

  test("double delete of the same key is idempotent") {
    val dir = tmpDir("neg_dd").toString
    val t = GraftTable.create(spark, dir, cfg("neg5"))
    t.bulkInsert(Seq((1L, 1L), (2L, 1L)).toDF("id", "v"))
    t.delete(Seq((1L, 0L)).toDF("id", "v"))
    t.delete(Seq((1L, 0L)).toDF("id", "v"))
    assert(Readers.snapshot(t).count() === 1)
  }

  test("truncate empties the table and the table stays writable") {
    val dir = tmpDir("neg_tr").toString
    val t = GraftTable.create(spark, dir, cfg("neg6"))
    t.bulkInsert(Seq((1L, 1L), (2L, 1L)).toDF("id", "v"))
    t.truncate()
    assert(Readers.snapshot(t).count() === 0)
    t.upsert(Seq((7L, 1L)).toDF("id", "v"))
    assert(Readers.snapshot(t).count() === 1)
  }

  test("nested DDL refuses the unsupported forms with the path named") {
    import org.apache.spark.sql.functions.{col, struct, lit}
    val dir = tmpDir("neg_nested_ddl").toString
    val t = GraftTable.create(spark, dir, cfg("neg_nd"))
    t.bulkInsert(Seq((1L, 1L), (2L, 1L)).toDF("id", "v")
      .withColumn("meta", struct(lit("a").as("st"))))
    import org.apache.spark.sql.types.{StructField, StringType, LongType, IntegerType}
    // path through a non-struct leaf
    val e1 = intercept[IllegalArgumentException](
      t.addColumns(Seq(StructField("v.x", StringType))))
    assert(e1.getMessage.contains("not a struct"))
    // unknown intermediate segment
    val e2 = intercept[IllegalArgumentException](
      t.addColumns(Seq(StructField("meta.inner.x", StringType))))
    assert(e2.getMessage.contains("inner"))
    // unknown root column
    intercept[IllegalArgumentException](
      t.addColumns(Seq(StructField("nope.x", StringType))))
    // meta-column root refuses
    intercept[IllegalArgumentException](
      t.addColumns(Seq(StructField(MetaCols.RecordKey + ".x", StringType))))
    // narrowing a nested leaf refuses; dropping the only field refuses
    t.addColumns(Seq(StructField("meta.n", LongType)))
    intercept[IllegalArgumentException](t.changeColumn("meta.n", IntegerType))
    t.dropColumn("meta.n")
    val e3 = intercept[IllegalArgumentException](t.dropColumn("meta.st"))
    assert(e3.getMessage.contains("only field"))
  }

  test("inline MOR compaction re-enters the commit lock without deadlock") {
    val dir = tmpDir("neg_lock").toString
    val t = GraftTable.create(spark, dir, TableConfig("neg7", TableType.MergeOnRead,
      Seq("id"), "", "v", Map(ConfigKeys.CompactDeltaCommits -> "1")))
    t.bulkInsert(Seq((1L, 1L), (2L, 1L)).toDF("id", "v"))
    t.upsert(Seq((1L, 2L)).toDF("id", "v")) // deltacommit -> postCommit -> inline compact
    assert(t.timeline.completedInstants().count(_.action == Action.Compaction) === 1)
    assert(Readers.snapshot(t).count() === 2)
  }
}
