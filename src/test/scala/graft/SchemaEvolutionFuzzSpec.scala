package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{TableConfig, TableType}
import graft.read.Readers
import graft.table.{GraftTable, Services}

/** Model-based fuzz over struct-shape DRIFT: a random sequence of upsert
  * batches, each written by a randomly-versioned "writer" whose struct
  * carries a random PREFIX of the full nested field set (old writers) or
  * the full set (new writers) — mirroring a fleet upgrading out of
  * order. After every batch the snapshot must equal a driver-side model
  * where the whole struct is last-write-wins per key and fields the
  * writing batch's shape lacked read null. Runs against COW and MOR
  * (aggressive inline compaction), which must be observationally
  * identical — the permanent pin for the narrow-batch schema-regression
  * class.
  */
class SchemaEvolutionFuzzSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  // the full nested field set, in evolution order: a shape is a prefix
  private val AllFields = Seq("st", "pri", "score")

  private case class Rec(id: Long, ver: Long, st: String, pri: String, score: String)
  private case class Batch(shape: Int, rows: Seq[Rec])

  private val recGen: Gen[Rec] = for {
    id <- Gen.choose(1L, 25L)
    v <- Gen.alphaStr.map(_.take(3))
  } yield Rec(id, 0L, s"s$v", s"p$v", s"q$v")

  private val batchGen: Gen[Batch] = for {
    shape <- Gen.choose(1, AllFields.size)
    rows <- Gen.listOfN(8, recGen)
  } yield Batch(shape, rows.groupBy(_.id).values.map(_.head).toSeq)

  private def batches(seed: Long, n: Int): Seq[Batch] =
    (0 until n).map { i =>
      val b = batchGen.pureApply(Gen.Parameters.default, Seed(seed * 977 + i))
      // monotone versions make precombine order match batch order
      b.copy(rows = b.rows.map(_.copy(ver = i.toLong)))
    }

  private def df(b: Batch): DataFrame = {
    val base = b.rows.map(r => (r.id, r.ver, r.st, r.pri, r.score))
      .toDF("id", "ver", "st", "pri", "score")
    val fields = AllFields.take(b.shape).map(col)
    base.select(col("id"), col("ver"), struct(fields: _*).as("meta"))
  }

  /** Model: whole-struct last-write-wins; absent fields are null. */
  private def apply(model: Map[Long, (Long, String, String, String)], b: Batch) =
    b.rows.foldLeft(model) { (m, r) =>
      val next = (r.ver,
        r.st,
        if (b.shape >= 2) r.pri else null,
        if (b.shape >= 3) r.score else null)
      m.get(r.id) match {
        case Some((v, _, _, _)) if v > r.ver => m
        case _ => m + (r.id -> next)
      }
    }

  private def snap(t: GraftTable): Map[Long, (String, String, String)] = {
    val df0 = Readers.snapshot(t)
    // before the first wide batch the table schema legitimately lacks
    // the later fields — absent nested fields read as null
    val present = df0.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    def f(n: String) =
      if (present.contains(n)) col(s"meta.$n") else lit(null).cast("string")
    df0.select(col("id"), f("st"), f("pri"), f("score"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap
  }

  private def run(seed: Long, tt: String, extra: Map[String, String]): Unit = {
    val dir = tmpDir(s"evo_fuzz_${tt}_$seed").toString + "/t"
    val t = GraftTable.create(spark, dir,
      TableConfig("evo_fuzz", tt, Seq("id"), "", "ver", extra))
    var model = Map.empty[Long, (Long, String, String, String)]
    for ((b, i) <- batches(seed, 10).zipWithIndex) {
      t.upsert(df(b))
      model = apply(model, b)
      val want = model.map { case (k, (_, s, p, q)) => k -> ((s, p, q)) }
      assert(snap(t) === want, s"seed=$seed $tt diverged after batch $i (shape=${b.shape})")
    }
    // services over the drifted history keep the snapshot identical
    Services.compact(t)
    Services.clean(t, retainCommits = 2)
    val want = model.map { case (k, (_, s, p, q)) => k -> ((s, p, q)) }
    assert(snap(t) === want, s"seed=$seed $tt diverged after compact+clean")
  }

  test("COW: random shape-drift sequences match the model (3 seeds)") {
    for (seed <- Seq(11L, 12L, 13L)) run(seed, TableType.CopyOnWrite, Map.empty)
  }

  test("MOR: the same drift through deltas + inline compaction (3 seeds)") {
    for (seed <- Seq(11L, 12L, 13L))
      run(seed, TableType.MergeOnRead, Map("graft.compact.delta.commits" -> "3"))
  }
}
