package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{TableConfig, TableType}
import graft.read.Readers
import graft.table.{GraftTable, SchemaEvolution, Services}

/** Nested-struct additive schema evolution (reference
  * TableSchemaResolver.java:71-165 / TestCOWDataSource.scala:707): a
  * batch whose struct column gained a nested field widens the table
  * schema; old rows surface typed nulls; a narrow batch written AFTER
  * evolution pads instead of regressing the commit schema; MOR deltas
  * and compaction carry the evolved shape; non-additive changes refuse
  * with a named error.
  */
class SchemaEvolutionNestedSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def cfg(name: String, tt: String, props: Map[String, String] = Map.empty) =
    TableConfig(name, tt, Seq("id"), "", "v", props)

  private def wide(rows: Seq[(Long, Long, String, String)]) =
    rows.toDF("id", "v", "st", "pri")
      .select(col("id"), col("v"),
        struct(col("st"), col("pri")).as("meta"))

  private def narrow(rows: Seq[(Long, Long, String)]) =
    rows.toDF("id", "v", "st")
      .select(col("id"), col("v"), struct(col("st")).as("meta"))

  private def flat(t: GraftTable): Set[(Long, Long, String, String)] =
    Readers.snapshot(t)
      .select(col("id"), col("v"), col("meta.st"), col("meta.pri"))
      .as[(Long, Long, String, String)].collect().toSet

  test("COW: a nested ADD widens the schema; old rows read null") {
    val dir = tmpDir("evo_nested_cow").toString + "/t"
    val t = GraftTable.create(spark, dir, cfg("evo", TableType.CopyOnWrite))
    t.bulkInsert(narrow(Seq((1L, 1L, "A"), (2L, 1L, "B"))))
    // the evolving batch: meta gains `pri`
    t.upsert(wide(Seq((2L, 2L, "B2", "HI"), (3L, 1L, "C", "LO"))))
    val metaType = t.dataSchema.get("meta").dataType.asInstanceOf[StructType]
    assert(metaType.fieldNames.toSeq === Seq("st", "pri"),
      "table nested fields keep table-first order")
    assert(metaType.fields.forall(_.nullable))
    assert(flat(t) === Set(
      (1L, 1L, "A", null), (2L, 2L, "B2", "HI"), (3L, 1L, "C", "LO")))
  }

  test("COW: a NARROW batch after evolution pads nested nulls (no schema regression)") {
    val dir = tmpDir("evo_nested_pad").toString + "/t"
    val t = GraftTable.create(spark, dir, cfg("evo", TableType.CopyOnWrite))
    t.bulkInsert(wide(Seq((1L, 1L, "A", "HI"), (2L, 1L, "B", "MID"))))
    // an old-shape writer still sends the pre-evolution struct
    t.upsert(narrow(Seq((2L, 2L, "B2"), (3L, 1L, "C"))))
    // the commit schema KEEPS pri — the narrow batch must not shrink it
    val metaType = t.dataSchema.get("meta").dataType.asInstanceOf[StructType]
    assert(metaType.fieldNames.toSeq === Seq("st", "pri"))
    assert(flat(t) === Set(
      (1L, 1L, "A", "HI"), (2L, 2L, "B2", null), (3L, 1L, "C", null)))
  }

  test("MOR: nested add flows through deltas and survives compaction") {
    val dir = tmpDir("evo_nested_mor").toString + "/t"
    val t = GraftTable.create(spark, dir,
      cfg("evo", TableType.MergeOnRead, Map("graft.compact.inline" -> "false")))
    t.bulkInsert(narrow(Seq((1L, 1L, "A"), (2L, 1L, "B"))))
    t.upsert(wide(Seq((2L, 2L, "B2", "HI"))))     // delta with the wide shape
    t.upsert(narrow(Seq((1L, 2L, "A2"))))          // delta with the narrow shape
    val expect = Set((1L, 2L, "A2", null: String), (2L, 2L, "B2", "HI"))
    assert(flat(t) === expect, "snapshot merge aligns narrow base + mixed deltas")
    val metaType = t.dataSchema.get("meta").dataType.asInstanceOf[StructType]
    assert(metaType.fieldNames.toSeq === Seq("st", "pri"),
      "the narrow delta commit must not regress the evolved schema")
    Services.compact(t)
    assert(flat(t) === expect, "compaction preserves the evolved rows")
    assert(t.dataSchema.get("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("st", "pri"))
  }

  test("array-of-struct elements evolve too") {
    val dir = tmpDir("evo_nested_arr").toString + "/t"
    val t = GraftTable.create(spark, dir, cfg("evo", TableType.CopyOnWrite))
    val v1 = Seq((1L, 1L)).toDF("id", "v")
      .select(col("id"), col("v"),
        array(struct(lit("a").as("tag"))).as("items"))
    t.bulkInsert(v1)
    val v2 = Seq((2L, 1L)).toDF("id", "v")
      .select(col("id"), col("v"),
        array(struct(lit("b").as("tag"), lit(7L).as("n"))).as("items"))
    t.upsert(v2)
    val rows = Readers.snapshot(t)
      .select(col("id"), explode(col("items")).as("it"))
      .select(col("id"), col("it.tag"), col("it.n"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2)))).toSet
    assert(rows === Set((1L, "a", null), (2L, "b", java.lang.Long.valueOf(7L))))
  }

  test("lossless nested upcasts evolve; conflicts refuse with the nested path named") {
    val dir = tmpDir("evo_nested_bad").toString + "/t"
    val t = GraftTable.create(spark, dir, cfg("evo", TableType.CopyOnWrite))
    t.bulkInsert(Seq((1L, 1L)).toDF("id", "v")
      .select(col("id"), col("v"),
        struct(lit(5L).as("n"), lit("x").as("s")).as("meta")))
    // int → long inside the struct upcasts losslessly
    t.upsert(Seq((2L, 1L)).toDF("id", "v")
      .select(col("id"), col("v"),
        struct(lit(6).cast("int").as("n"), lit("y").as("s")).as("meta")))
    assert(Readers.snapshot(t).select(col("meta.n")).as[Long].collect().toSet ===
      Set(5L, 6L))
    // string → long inside the struct is a CONFLICT: named error, nested path
    val e = intercept[IllegalArgumentException] {
      t.upsert(Seq((3L, 1L)).toDF("id", "v")
        .select(col("id"), col("v"),
          struct(lit("oops").as("n"), lit("z").as("s")).as("meta")))
    }
    assert(e.getMessage.contains("incompatible schema evolution"))
    assert(e.getMessage.contains("meta.n"))
    // struct vs scalar at the column root refuses the same way
    val e2 = intercept[IllegalArgumentException] {
      t.upsert(Seq((3L, 1L, "flat")).toDF("id", "v", "meta"))
    }
    assert(e2.getMessage.contains("incompatible schema evolution"))
  }

  test("MERGE INTO evolves nested struct shapes on both join sides") {
    val dir = tmpDir("evo_nested_merge").toString + "/t"
    val t = GraftTable.create(spark, dir, cfg("evo", TableType.CopyOnWrite))
    t.bulkInsert(narrow(Seq((1L, 1L, "A"), (2L, 1L, "B"))))
    // source carries the WIDE struct: matched star-update + insert
    t.mergeInto(wide(Seq((2L, 2L, "B2", "HI"), (3L, 1L, "C", "LO"))))
      .whenMatchedUpdate()
      .whenNotMatchedInsert()
      .execute()
    assert(flat(t) === Set(
      (1L, 1L, "A", null), (2L, 2L, "B2", "HI"), (3L, 1L, "C", "LO")))
    assert(t.dataSchema.get("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("st", "pri"))
    // and the NARROW direction: an old-shape source merges into the
    // evolved table, its missing nested field padding null
    t.mergeInto(narrow(Seq((1L, 2L, "A2"))))
      .whenMatchedUpdate()
      .execute()
    assert(flat(t) === Set(
      (1L, 2L, "A2", null), (2L, 2L, "B2", "HI"), (3L, 1L, "C", "LO")))
    // non-additive drift refuses with the named error, not a cast failure
    val e = intercept[IllegalArgumentException] {
      t.mergeInto(Seq((1L, 3L, 9L)).toDF("id", "v", "meta"))
        .whenMatchedUpdate().execute()
    }
    assert(e.getMessage.contains("incompatible schema evolution"))
  }

  test("mergeEvolvedType unit rules: order, extras, maps") {
    val tbl = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val in = StructType(Seq(
      StructField("b", StringType), StructField("c", DoubleType)))
    val m = SchemaEvolution.mergeEvolvedType("x", tbl, in).asInstanceOf[StructType]
    assert(m.fieldNames.toSeq === Seq("a", "b", "c"))
    assert(m.fields.forall(_.nullable))
    val mm = SchemaEvolution.mergeEvolvedType("x",
      MapType(StringType, tbl), MapType(StringType, in))
      .asInstanceOf[MapType]
    assert(mm.valueType.asInstanceOf[StructType].fieldNames.toSeq === Seq("a", "b", "c"))
    // a non-upcastable map KEY change never evolves (string keys can't
    // losslessly become long keys)
    intercept[IllegalArgumentException] {
      SchemaEvolution.mergeEvolvedType("x",
        MapType(LongType, LongType), MapType(StringType, LongType))
    }
  }
}
