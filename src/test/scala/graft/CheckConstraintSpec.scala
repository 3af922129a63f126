package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{MetaCols, TableConfig, TableType}
import graft.read.Readers
import graft.table.GraftTable

/** ANSI CHECK constraints: persisted in table config, validated against
  * existing rows on ADD, enforced atomically on every write entry point
  * (one aggregation pass; refusal happens BEFORE an instant exists),
  * ANSI UNKNOWN-passes semantics, delete images exempt.
  */
class CheckConstraintSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def mk(name: String, tt: String = TableType.CopyOnWrite): GraftTable =
    GraftTable.create(spark, tmpDir(name).toString, TableConfig(
      name, tt, Seq("o_orderkey"), "date_format(o_orderdate, 'yyyy')",
      "o_orderdate"))

  private def src(n: Int) = {
    val df = spark.read.parquet(s"$sf001/orders.parquet").limit(n).cache()
    df.count(); df
  }

  test("add persists across reload; violating batch refused with no instant") {
    val t0 = mk("cc_basic")
    val s = src(200)
    t0.bulkInsert(s)
    t0.addCheckConstraint("price_pos", "o_totalprice > 0")
    // the constraint lives in table config, not the handle
    val t = GraftTable.load(spark, t0.basePath.toString)
    assert(t.checkConstraints === Seq(("price_pos", "o_totalprice > 0")))
    val before = t.timeline.completedInstants().size
    val e = intercept[IllegalArgumentException] {
      t.upsert(s.limit(30).withColumn("o_totalprice", lit(-1.0)))
    }
    assert(e.getMessage.contains("price_pos"))
    assert(e.getMessage.contains("30 row(s)"))
    assert(t.timeline.completedInstants().size === before)
    // a clean batch still lands
    t.upsert(s.limit(10).withColumn("o_totalprice", lit(5.0)))
    assert(Readers.snapshot(t).filter(col("o_totalprice") === 5.0).count() === 10)
  }

  test("CHECK over a NESTED struct field enforces and refuses") {
    val t0 = mk("cc_nested")
    val s = src(100).withColumn("meta",
      struct(col("o_totalprice").as("price"), col("o_orderstatus").as("st")))
    t0.bulkInsert(s)
    val t = t0.addCheckConstraint("nested_price_pos", "meta.price > 0")
    val before = t.timeline.completedInstants().size
    val e = intercept[IllegalArgumentException] {
      t.upsert(s.limit(10).withColumn("meta",
        struct(lit(-9.0).as("price"), col("o_orderstatus").as("st"))))
    }
    assert(e.getMessage.contains("nested_price_pos"))
    assert(t.timeline.completedInstants().size === before)
    // a clean batch still lands; UNKNOWN (null struct) passes ANSI
    t.upsert(s.limit(5).withColumn("meta",
      lit(null).cast(s.schema("meta").dataType)))
    assert(Readers.snapshot(t).filter(col("meta").isNull).count() === 5)
  }

  test("add refuses when existing rows violate; drop stops enforcement") {
    val t = mk("cc_existing")
    val s = src(100)
    t.bulkInsert(s.withColumn("o_totalprice",
      when(col("o_orderkey") % 10 === 0, lit(-2.0)).otherwise(col("o_totalprice"))))
    val e = intercept[IllegalArgumentException] {
      t.addCheckConstraint("price_pos", "o_totalprice > 0")
    }
    assert(e.getMessage.contains("existing rows"))
    val t2 = t.addCheckConstraint("price_cap", "o_totalprice < 1e9")
    intercept[IllegalArgumentException] {
      t2.upsert(s.limit(5).withColumn("o_totalprice", lit(2e9)))
    }
    val t3 = t2.dropCheckConstraint("price_cap")
    assert(t3.checkConstraints.isEmpty)
    t3.upsert(s.limit(5).withColumn("o_totalprice", lit(2e9))) // now admitted
    assert(Readers.snapshot(t3).filter(col("o_totalprice") === 2e9).count() === 5)
  }

  test("ANSI semantics: UNKNOWN (null) passes, only FALSE violates") {
    val t0 = mk("cc_null")
    val s = src(50)
    t0.bulkInsert(s)
    val t = t0.addCheckConstraint("status_known",
      "o_orderstatus IN ('O', 'F', 'P')")
    // null status -> predicate UNKNOWN -> passes
    t.upsert(s.limit(5).withColumn("o_orderstatus", lit(null).cast("string")))
    intercept[IllegalArgumentException] {
      t.upsert(s.limit(5).withColumn("o_orderstatus", lit("X")))
    }
  }

  test("delete images are exempt: marker upserts and cdc deletes pass") {
    val t0 = mk("cc_delete")
    val s = src(60)
    t0.bulkInsert(s)
    val t = t0.addCheckConstraint("price_pos", "o_totalprice > 0")
    // delete-marker rows carry arbitrary column values; they remove data
    t.upsert(s.limit(10).withColumn("o_totalprice", lit(-1.0))
      .withColumn(MetaCols.DeleteFlag, lit(true)))
    assert(Readers.snapshot(t).count() === 50)
    // CDC apply: D images exempt, I images checked
    t.applyCdc(s.limit(55).filter(col("o_orderkey").isNotNull).limit(5)
      .withColumn("Op", lit("D")).withColumn("o_totalprice", lit(-9.0)))
    intercept[IllegalArgumentException] {
      t.applyCdc(s.limit(5).withColumn("Op", lit("I"))
        .withColumn("o_totalprice", lit(-9.0)))
    }
  }

  test("MERGE INTO and SQL UPDATE route through enforcement") {
    val t0 = mk("cc_merge")
    val s = src(80)
    t0.bulkInsert(s)
    val t = t0.addCheckConstraint("price_pos", "o_totalprice > 0")
    spark.read.format("graft").load(t.basePath.toString)
      .createOrReplaceTempView("cc_merge_t")
    s.limit(20).withColumn("o_totalprice", -col("o_totalprice"))
      .createOrReplaceTempView("cc_merge_src")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO cc_merge_t t USING cc_merge_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice""".stripMargin)
    }
    assert(e.getMessage.contains("price_pos"))
    val e2 = intercept[Exception] {
      spark.sql("UPDATE cc_merge_t SET o_totalprice = -5 WHERE o_orderkey % 2 = 0")
    }
    assert(e2.getMessage.contains("price_pos"))
    // SQL DELETE is a removal — never constraint-checked
    spark.sql("DELETE FROM cc_merge_t WHERE o_orderkey % 2 = 0")
    assert(Readers.snapshot(GraftTable.load(spark, t.basePath.toString))
      .filter(col("o_orderkey") % 2 === 0).count() === 0)
  }

  test("SQL ALTER forms; several violated constraints all named") {
    val t0 = mk("cc_sql")
    val s = src(100)
    t0.bulkInsert(s)
    spark.read.format("graft").load(t0.basePath.toString)
      .createOrReplaceTempView("cc_sql_t")
    spark.sql("ALTER TABLE cc_sql_t ADD CONSTRAINT price_pos CHECK (o_totalprice > 0)")
    val listed = spark.sql(
      "ALTER TABLE cc_sql_t ADD CONSTRAINT key_pos CHECK (o_orderkey >= 0)")
      .collect().head.getString(0)
    assert(listed.contains("price_pos") && listed.contains("key_pos"))
    val t = GraftTable.load(spark, t0.basePath.toString)
    val e = intercept[IllegalArgumentException] {
      t.upsert(s.limit(10).withColumn("o_totalprice", lit(-1.0))
        .withColumn("o_orderkey", -col("o_orderkey") - 1))
    }
    assert(e.getMessage.contains("price_pos") && e.getMessage.contains("key_pos"))
    spark.sql("ALTER TABLE cc_sql_t DROP CONSTRAINT price_pos")
    assert(GraftTable.load(spark, t0.basePath.toString).checkConstraints
      .map(_._1) === Seq("key_pos"))
    // a non-graft name is NOT intercepted: Spark's own ALTER handling runs
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("cc_plain_view")
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE cc_plain_view ADD CONSTRAINT c1 CHECK (a > 0)")
    }
    assert(!e3.getMessage.contains("graft"))
  }
}
