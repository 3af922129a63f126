package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.table.GraftTable

/** Property-style invariants over randomized write sequences (SURVEY §5:
  * upsert idempotence, preCombine commutativity, replay determinism).
  * Cases are ScalaCheck-generated from fixed seeds so runs are
  * deterministic; sizes stay small because every case runs real Spark
  * jobs.
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private val recGen: Gen[(Long, Long, String)] = for {
    id <- Gen.choose(1L, 40L)
    ver <- Gen.choose(1L, 9L)
    v <- Gen.alphaStr.map(_.take(6))
  } yield (id, ver, v)

  private def batches(seed: Long, nBatches: Int): Seq[Seq[(Long, Long, String)]] =
    (0 until nBatches).map { b =>
      Gen.listOfN(15, recGen)
        .pureApply(Gen.Parameters.default, Seed(seed * 100 + b))
    }

  private def df(rows: Seq[(Long, Long, String)]): DataFrame =
    rows.toDF("id", "ver", "v")

  private def mk(name: String): GraftTable =
    GraftTable.create(spark, tmpDir(name).toString,
      TableConfig(name, TableType.CopyOnWrite, Seq("id"), "", "ver"))

  private def snap(t: GraftTable): Set[(Long, Long, String)] =
    Readers.snapshot(t).select("id", "ver", "v")
      .as[(Long, Long, String)].collect().toSet

  test("upsert is idempotent: replaying a batch does not change the table") {
    (1 to 3).foreach { trial =>
      val bs = batches(trial.toLong, 2)
      val t = mk(s"prop_idem_$trial")
      t.bulkInsert(df(bs.head))
      t.upsert(df(bs(1)))
      val once = snap(t)
      t.upsert(df(bs(1))) // replay
      assert(snap(t) === once, s"trial $trial")
    }
  }

  test("within-batch precombine is row-order independent (max version wins)") {
    // NOTE cross-batch semantics are last-commit-wins (the reference's
    // default OverwriteWithLatest payload): a later upsert replaces the
    // stored row even with a lower precombine value. Commutativity holds
    // WITHIN a batch, where preCombine collapses duplicates by max ver.
    (1 to 3).foreach { trial =>
      val bs = batches(100L + trial, 2)
      val combined = bs.head ++ bs(1)
      val ta = mk(s"prop_comm_a_$trial")
      val tb = mk(s"prop_comm_b_$trial")
      ta.upsert(df(combined))
      tb.upsert(df(scala.util.Random.javaRandomToRandom(
        new java.util.Random(trial)).shuffle(combined)))
      val expected = combined.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val va = snap(ta).map(r => r._1 -> r._2).toMap
      assert(va === expected, s"trial $trial: batch dedup must keep max ver")
      assert(snap(tb).map(r => r._1 -> r._2).toMap === expected, s"trial $trial shuffled")
    }
  }

  test("replaying an identical op sequence yields an identical snapshot") {
    (1 to 2).foreach { trial =>
      val bs = batches(200L + trial, 3)
      def run(name: String): Set[(Long, Long, String)] = {
        val t = mk(name)
        t.bulkInsert(df(bs.head))
        t.upsert(df(bs(1)))
        t.delete(df(bs(2).take(5)))
        t.upsert(df(bs(2).drop(5)))
        snap(t)
      }
      assert(run(s"prop_replay_a_$trial") === run(s"prop_replay_b_$trial"),
        s"trial $trial")
    }
  }

  /** Fuzz for the incremental/time-travel contract (SURVEY §7 hard part:
    * begin-exclusive end-inclusive ranges over random write sequences):
    *
    *  - time travel at every commit equals a driver-side model replay
    *  - for EVERY instant pair i<j, overlaying incremental(ts_i, ts_j]
    *    onto snapshot@ts_i reconstructs snapshot@ts_j (upsert sequences —
    *    this is exactly how an incremental consumer maintains a replica)
    *  - a deletion is visible to the range containing it: the key is
    *    absent from the incremental output AND from the reconstruction
    */
  test("EVENT_TIME payload: upserts commute — arrival order cannot change the table") {
    // value is a pure function of (id, ver), so even ordering ties pick
    // identical rows; with event-time ranking above commit order the final
    // state must then be invariant under ANY batch arrival permutation —
    // the late-data guarantee DefaultHoodieRecordPayload exists for.
    (1 to 3).foreach { trial =>
      val bs = batches(trial + 50L, 3)
        .map(_.map { case (id, ver, _) => (id, ver, s"$id-$ver") })
      def run(order: Seq[Int]): Set[(Long, Long, String)] = {
        val t = GraftTable.create(spark,
          tmpDir(s"prop_evt_${trial}_${order.mkString}").toString,
          TableConfig("prop_evt", TableType.CopyOnWrite, Seq("id"), "", "ver",
            Map(ConfigKeys.Payload -> graft.table.Payload.EventTime)))
        order.foreach(i => t.upsert(df(bs(i))))
        snap(t)
      }
      val a = run(Seq(0, 1, 2))
      assert(a === run(Seq(2, 1, 0)), s"trial $trial: reversed order diverged")
      assert(a === run(Seq(1, 2, 0)), s"trial $trial: rotated order diverged")
      // and the winner per id is the maximum event time seen anywhere
      val want = bs.flatten.groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }.toSet
      assert(a === want, s"trial $trial: winners are not the max event time")
    }
  }

  test("PARTIAL_UPDATE: column-split upserts converge to the full-row upsert") {
    // sending each column in its own batch must stitch to the same table
    // as sending full rows — the contract partial updates exist for
    (1 to 2).foreach { trial =>
      val rows = batches(trial + 90L, 1).head
        .map { case (id, ver, _) => (id, ver, s"v-$id") }.distinctBy(_._1)
      def mk(name: String) = GraftTable.create(spark,
        tmpDir(name).toString,
        TableConfig("prop_pu", TableType.CopyOnWrite, Seq("id"), "", "",
          Map(ConfigKeys.Payload -> graft.table.Payload.PartialUpdate)))
      val full = mk(s"pu_full_$trial")
      full.upsert(rows.toDF("id", "ver", "v"))
      val split = mk(s"pu_split_$trial")
      split.upsert(rows.toDF("id", "ver", "v")
        .withColumn("v", lit(null).cast("string")))   // column ver first
      split.upsert(rows.toDF("id", "ver", "v")
        .withColumn("ver", lit(null).cast("long")))   // column v second
      assert(snap(full) === snap(split), s"trial $trial: split-column upserts diverged")
      // replaying a partial batch is a no-op
      val before = snap(split)
      split.upsert(rows.toDF("id", "ver", "v").withColumn("ver", lit(null).cast("long")))
      assert(snap(split) === before, s"trial $trial: partial replay changed the table")
    }
  }

  test("fuzz: incremental ranges compose between arbitrary instants") {
    (1 to 2).foreach { trial =>
      // batches made unique per id up front: a within-batch precombine TIE
      // (same id, same ver, different value) resolves by write seqno —
      // deterministic in the engine but not worth modeling here, and
      // bulk_insert intentionally never combines (reference semantics)
      def uniq(rows: Seq[(Long, Long, String)]): Seq[(Long, Long, String)] =
        rows.groupBy(_._1).values.map(_.maxBy(v => (v._2, v._3))).toSeq
      val bs = batches(300L + trial, 5).map(uniq)
      val t = mk(s"prop_incr_$trial")
      // model replay: each batch overlays the map
      var model = Map.empty[Long, (Long, String)]
      var states = Vector.empty[(String, Map[Long, (Long, String)])]
      def apply(rows: Seq[(Long, Long, String)], ts: String): Unit = {
        rows.foreach { case (id, ver, v) => model = model.updated(id, (ver, v)) }
        states :+= (ts -> model)
      }
      apply(bs.head, t.bulkInsert(df(bs.head)))
      (1 until 5).foreach(i => apply(bs(i), t.upsert(df(bs(i)))))

      // time travel at each commit equals the model at that point
      states.foreach { case (ts, m) =>
        val got = Readers.timeTravel(t, ts).select("id", "ver", "v")
          .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got === m, s"trial $trial time travel @$ts")
      }

      // overlay composition for every instant pair
      for (i <- states.indices; j <- (i + 1) until states.size) {
        val (tsI, mI) = states(i); val (tsJ, mJ) = states(j)
        val delta = Readers.incremental(t, tsI, Some(tsJ))
          .select("id", "ver", "v")
          .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
        assert(mI ++ delta === mJ, s"trial $trial overlay ($tsI, $tsJ]")
      }

      // delete visibility: remove some keys, check the spanning range
      val victims = model.keys.take(3).toSeq
      val preDeleteTs = states.last._1
      t.delete(victims.map(id => (id, 99L, "")).toDF("id", "ver", "v"))
      val afterDelete = Readers.incremental(t, preDeleteTs, None)
        .select("id").as[Long].collect().toSet
      assert(victims.forall(v => !afterDelete.contains(v)),
        s"trial $trial: deleted keys must not appear in the incremental range")
      val snapNow = snap(t).map(_._1)
      assert(victims.forall(v => !snapNow.contains(v)), s"trial $trial: delete applied")
    }
  }
}
