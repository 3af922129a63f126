package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core._
import graft.read.Readers
import graft.table.GraftTable

/** Model-based fuzz of the NESTED schema lifecycle: random interleavings
  * of wide/narrow upserts (additive evolution), nested ALTER ADD/DROP
  * (schema-only commits), and nested UPDATE assignments (withField
  * rewrites) against an exact in-memory model of (declared fields, per-id
  * field values). The surfaces under test are the r16 nested additions —
  * each is individually pinned elsewhere; THIS spec pins their
  * interleavings, where the historical bugs live (a drop followed by a
  * narrow upsert, an update on a field only some files physically carry,
  * evolution over a shape an ALTER pre-declared).
  *
  * Batches are generated from the MODEL's declared fields, so a dropped
  * field never rides back in on a batch (documented resurrection
  * semantics are pinned separately in AlterIngestSpec).
  */
class NestedLifecycleFuzzSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  test("random nested DDL/DML sequences match an exact model") {
    Seq(101L, 202L).foreach(run)
  }

  private def run(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = tmpDir(s"nested_fuzz_$seed").toString
    val t = GraftTable.create(spark, dir, TableConfig(
      s"nf$seed", TableType.CopyOnWrite, Seq("id"), "", "ver"))

    // model: declared nested fields in order + per-id field values
    var fields: Vector[String] = Vector("f0", "f1")
    var nextField = 2
    val rows = scala.collection.mutable.Map[Long, Map[String, String]]()
    var ver = 0L

    def value(f: String, id: Long, op: Int) = s"${f}_${id}_$op"

    def batch(ids: Seq[Long], batchFields: Seq[String], op: Int): DataFrame = {
      ver += 1
      ids.map(i => (i, ver)).toDF("id", "ver")
        .withColumn("meta", struct(batchFields.map(f =>
          concat_ws("_", lit(f), col("id"), lit(op)).as(f)): _*))
    }

    def verify(op: Int): Unit = {
      val snap = Readers.snapshot(GraftTable.load(spark, dir))
      val st = snap.schema("meta").dataType.asInstanceOf[StructType]
      assert(st.fieldNames.toSeq === fields,
        s"seed=$seed op=$op declared fields diverged")
      val got = snap.select(col("id") +:
          fields.map(f => col(s"meta.$f").as(f)): _*)
        .collect().map(r => r.getLong(0) ->
          fields.zipWithIndex.map { case (f, i) =>
            f -> (if (r.isNullAt(i + 1)) null else r.getString(i + 1))
          }.toMap).toMap
      assert(got.keySet === rows.keySet, s"seed=$seed op=$op id set diverged")
      got.foreach { case (id, m) =>
        // the model never records fields beyond the declared set
        val want = fields.map(f => f -> rows(id).getOrElse(f, null)).toMap
        assert(m === want, s"seed=$seed op=$op id=$id: got $m want $want")
      }
    }

    // seed rows 0..19 with the initial two fields
    t.bulkInsert(batch(0L to 19L, fields, op = 0))
    (0L to 19L).foreach(i => rows(i) = fields.map(f => f -> value(f, i, 0)).toMap)

    val handle = GraftTable.load(spark, dir)
    for (op <- 1 to 22) {
      rnd.nextInt(4) match {
        case 0 => // upsert: random ids, random declared-field subset, maybe a brand-new field
          val ids = (0L to 25L).filter(_ => rnd.nextBoolean())
          if (ids.nonEmpty) {
            var bf = fields.filter(_ => rnd.nextBoolean())
            if (bf.isEmpty) bf = Vector(fields(rnd.nextInt(fields.size)))
            if (rnd.nextInt(3) == 0) { // wide batch evolves a new field
              val nf = s"f$nextField"; nextField += 1
              bf = bf :+ nf
              fields = fields :+ nf
            }
            // batch field ORDER follows the declared order + new at end —
            // matching the additive merge's table-first contract
            val ordered = fields.filter(bf.contains)
            GraftTable.load(spark, dir).upsert(batch(ids, ordered, op))
            ids.foreach(i => rows(i) =
              fields.map(f => f -> (if (ordered.contains(f)) value(f, i, op) else null)).toMap)
          }
        case 1 => // ALTER ADD a nested field (schema-only; everyone reads null)
          val nf = s"f$nextField"; nextField += 1
          GraftTable.load(spark, dir).addColumns(Seq(StructField(s"meta.$nf", StringType)))
          fields = fields :+ nf
        case 2 if fields.size > 1 => // ALTER DROP a nested field (plan-time vanish)
          val f = fields(rnd.nextInt(fields.size))
          GraftTable.load(spark, dir).dropColumn(s"meta.$f")
          fields = fields.filterNot(_ == f)
          rows.keys.foreach(i => rows(i) = rows(i) - f)
        case _ => // nested UPDATE on an id slice
          val f = fields(rnd.nextInt(fields.size))
          val m = 2 + rnd.nextInt(3)
          val r = rnd.nextInt(m)
          GraftTable.load(spark, dir).update(s"id % $m = $r", Map(s"meta.$f" -> s"'U$op'"))
          rows.keys.filter(i => i % m == r)
            .foreach(i => rows(i) = rows(i) + (f -> s"U$op"))
      }
      if (op % 5 == 0) verify(op)
    }
    verify(99)
  }
}
