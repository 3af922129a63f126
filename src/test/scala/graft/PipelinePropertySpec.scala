package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline._

/** Property-style invariants for the pipeline operators, ScalaCheck-
  * generated from fixed seeds (deterministic runs, small sizes — every
  * case runs real Spark jobs).
  */
class PipelinePropertySpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def gen[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // -------- binned range join == naive theta join, any bin width --------

  private val evGen: Gen[(Long, Long, Long, String)] = for {
    id <- Gen.choose(1L, 100000L)
    user <- Gen.choose(1L, 8L)           // few users -> hot keys on purpose
    tsSec <- Gen.choose(0L, 48L * 3600)  // two days
    kind <- Gen.oneOf("click", "view")
  } yield (id, user, tsSec, kind)

  test("range join equals naive theta join on random data, any bin width") {
    for (trial <- 1 to 3) {
      val rows = gen(Gen.listOfN(120, evGen), 1000L + trial)
        .distinctBy(_._1)
        .map { case (id, u, sec, k) => (id, u, new java.sql.Timestamp(sec * 1000L), k) }
      val ev = rows.toDF("event_id", "user_id", "ts", "event_type")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id", $"ts".as("hi"))
        .withColumn("lo", $"hi" - expr("INTERVAL 45 MINUTES"))
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"event_id".as("view_id"), $"ts".as("pt"))
      val naive = views.join(clicks, Seq("user_id"))
        .where($"pt" >= $"lo" && $"pt" <= $"hi")
        .select($"click_id", $"view_id").as[(Long, Long)].collect().toSet
      for (binSec <- Seq(60L, 1800L, 7200L, 100000L)) {
        val binned = RangeJoin.pointsInIntervals(views, clicks, Seq("user_id"),
            "pt", "lo", "hi", binSeconds = binSec)
          .select($"click_id", $"view_id").as[(Long, Long)].collect().toSet
        assert(binned === naive, s"trial=$trial binSeconds=$binSec")
      }
    }
  }

  // -------- packing: one bin per doc, bounded overrun ------------------

  private val docGen: Gen[(Long, String)] = for {
    id <- Gen.choose(1L, 100000L)
    nw <- Gen.choose(0, 120)
    ws <- Gen.listOfN(nw, Gen.oneOf("alpha", "be", "gamma", "delta", "ee"))
  } yield (id, ws.mkString(" "))

  test("packing: every doc in exactly one bin; overrun bounded by the straddler") {
    val max = 64L
    for (trial <- 1 to 3) {
      val docs = gen(Gen.listOfN(80, docGen), 2000L + trial)
        .distinctBy(_._1).toDF("doc_id", "text")
      val packed = Packing.packIntoBins(docs, maxTokensPerBin = max, buckets = 4)
      assert(packed.count() === docs.count())           // no loss, no dup
      val stats = Packing.binStats(packed)
        .join(packed.groupBy("bin_id").agg(
          max_by(col("n_tokens"), col("n_tokens")).as("biggest")), Seq("bin_id"))
        .select($"bin_id", $"n_docs", $"total_tokens", $"biggest")
        .collect()
      for (r <- stats) {
        val (nDocs, total, biggest) =
          (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"), r.getAs[Long]("biggest"))
        // cumulative-start rule: a bin exceeds max only via its last
        // straddling doc (or a single oversized doc in its own bin)
        assert(nDocs == 1L || total - biggest < max,
          s"bin ${r.getAs[String]("bin_id")}: total=$total biggest=$biggest")
      }
    }
  }

  // -------- chunking: overlap-stripped chunks reconstruct the stream ---

  test("chunking: dropping the overlap from chunks 1.. reconstructs the tokens") {
    val (chunkT, overlap) = (16, 4)
    for (trial <- 1 to 3) {
      val docs = gen(Gen.listOfN(40, docGen), 3000L + trial)
        .distinctBy(_._1).toDF("doc_id", "text")
      val chunks = Chunking.chunk(docs, chunkTokens = chunkT, overlap = overlap)
        .select($"doc_id", $"chunk_idx", $"chunk_text")
        .as[(Long, Int, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
      val originals = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
      for ((id, parts) <- chunks) {
        val toks = originals(id).trim.split("\\s+").filter(_.nonEmpty).toList
        val rebuilt = parts.zipWithIndex.flatMap { case (p, i) =>
          val t = p.split(" ").filter(_.nonEmpty).toList
          if (i == 0) t else t.drop(overlap min t.length)
        }
        // trailing windows fully covered by the previous chunk may only
        // repeat tokens; the rebuilt PREFIX must equal the token stream
        assert(rebuilt.take(toks.length) === toks, s"doc $id")
      }
    }
  }

  // -------- fd hygiene: repeated table ops must not leak handles -------

  test("file descriptors stay flat across repeated table lifecycles") {
    import graft.core.{TableConfig, TableType}
    import graft.table.{GraftTable, WritePipeline}
    def openFds(): Int = new java.io.File("/proc/self/fd").list().length
    val rows = (1L to 50L).map(i => (i, i % 5, s"v$i")).toDF("id", "p", "v")
    val upd = (1L to 10L).map(i => (i, i % 5, s"u$i")).toDF("id", "p", "v")
    def cycle(i: Int): Unit = {
      val dir = tmpDir(s"prop_fd_$i").toString
      val t = GraftTable.create(spark, dir,
        TableConfig("fd", TableType.CopyOnWrite, Seq("id"), "p", ""))
      t.bulkInsert(rows)
      t.upsert(upd)
      graft.read.Readers.snapshot(t).count()
      WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(dir))
    }
    cycle(0) // warm lazy pools before measuring
    val before = openFds()
    (1 to 12).foreach(cycle)
    val after = openFds()
    // pre-PathIO, each lifecycle leaked dozens of directory handles; with
    // deterministic closing the count stays flat modulo JVM noise
    assert(after - before < 40, s"fd growth $before -> $after")
  }

  // -------- streaming scale4 == Spark's decimal(18,4) cast -------------

  test("scale4 matches Spark's DECIMAL(18,4) cast for arbitrary doubles") {
    val vs = gen(Gen.listOfN(300,
      Gen.choose(-1000000.0, 1000000.0)), 4000L)
    val viaSpark = vs.toDF("v")
      .select((col("v").cast("decimal(18,4)") * 10000).cast("long").as("s"))
      .as[Long].collect().toSeq
    val viaScala = vs.map(graft.streaming.StatefulSessions.scale4)
    assert(viaSpark === viaScala)
  }
}
