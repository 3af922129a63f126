package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

import graft.core._
import graft.read.Readers
import graft.table.{GraftTable, Services}

/** Model-based fuzz over MIXED write-op sequences — SURVEY §7's "fuzz with
  * random write sequences" mitigation, extended beyond upserts: random
  * interleavings of upsert / delete / insert_overwrite / delete_partition
  * / rollback / restore with inline services, applied in parallel to the
  * table and to a driver-side reference model, with snapshot equality
  * asserted after EVERY op. Runs the same sequences against COW and MOR
  * (with aggressive inline compaction) — the two table types must be
  * observationally identical.
  */
class OpSequenceFuzzSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  // keys partition by id % 3 via an explicit partition column
  private type Row3 = (Long, Long, String)
  private def partOf(id: Long): String = (id % 3).toString

  private val rowGen: Gen[Row3] = for {
    id <- Gen.choose(1L, 30L)
    ver <- Gen.choose(1L, 9L)
    v <- Gen.alphaStr.map(_.take(4))
  } yield (id, ver, v)

  private sealed trait Op
  private case class Upsert(rows: Seq[Row3]) extends Op
  private case class Delete(ids: Seq[Long]) extends Op
  // one batch carrying BOTH updates and _graft_is_deleted=true markers
  private case class MarkerUpsert(rows: Seq[Row3], dels: Seq[Long]) extends Op
  private case class Overwrite(rows: Seq[Row3]) extends Op
  private case class DropPartition(p: String) extends Op
  private case object Rollback extends Op
  private case object Restore extends Op
  private case class Rescale(n: Int) extends Op

  // within-batch key-uniqueness: ties on (id) resolve by precombine in the
  // engine; keep model trivial by pre-combining here (max (ver, v) wins)
  private def uniq(rows: Seq[Row3]): Seq[Row3] =
    rows.groupBy(_._1).values.map(_.maxBy(r => (r._2, r._3))).toSeq

  private val markerGen: Gen[Op] = for {
    rs <- Gen.listOfN(8, rowGen)
    ds <- Gen.listOfN(3, Gen.choose(1L, 30L))
  } yield {
    val ups = uniq(rs)
    // update/delete keys disjoint: a same-key pair's winner would be a
    // precombine coin-flip, which the flat model can't express
    MarkerUpsert(ups, ds.distinct.filterNot(ups.map(_._1).toSet))
  }

  private val opGen: Gen[Op] = Gen.frequency(
    5 -> Gen.listOfN(10, rowGen).map(rs => Upsert(uniq(rs))),
    2 -> Gen.listOfN(4, Gen.choose(1L, 30L)).map(ids => Delete(ids.distinct)),
    2 -> markerGen,
    2 -> Gen.listOfN(8, rowGen).map(rs => Overwrite(uniq(rs))),
    1 -> Gen.choose(0L, 2L).map(p => DropPartition(p.toString)),
    1 -> Gen.const(Rollback),
    1 -> Gen.const(Restore),
    1 -> Gen.oneOf(3, 5, 7).map(Rescale(_)))

  private def ops(seed: Long, n: Int): Seq[Op] =
    (0 until n).map(i => opGen.pureApply(Gen.Parameters.default, Seed(seed * 1000 + i)))

  private def df(rows: Seq[Row3]): DataFrame = rows.toDF("id", "ver", "v")

  private def snap(t: GraftTable): Map[Long, (Long, String)] =
    Readers.snapshot(t).select("id", "ver", "v")
      .as[Row3].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  private def run(tableType: String, props: Map[String, String], seed: Long): Unit = {
    val eventTime = props.get(ConfigKeys.Payload).contains("EVENT_TIME")
    val name = s"fuzz_${tableType.take(3)}_$seed".toLowerCase
    val dir = tmpDir(name).toString
    var t = GraftTable.create(spark, dir,
      TableConfig(name, tableType, Seq("id"), "id % 3", "ver", props))
    val bucketed = props.get(ConfigKeys.IndexType).contains("BUCKET")
    val consistent = bucketed &&
      props.get(ConfigKeys.BucketIndexEngine).contains("CONSISTENT")

    var model = Map.empty[Long, (Long, String)]
    // rollback/restore target the model history: states BY COMMIT TS
    var history = Vector.empty[(String, Map[Long, (Long, String)])]
    def record(ts: String): Unit = history :+= (ts -> model)

    // materialized-view probe: a view over the mutating column `v` (so
    // updates are group moves) folds the same chaos — incremental syncs
    // spanning several ops, rollback/restore windows (the rewind-recovery
    // path), layout-only rescales (CDC-silent, nothing to fold) — and
    // must equal the model's from-scratch aggregate after every sync
    import graft.table.{MaterializedView => MV}
    val view = MV.create(spark, tmpDir(s"${name}_mv").toString, t,
      Seq("grp" -> "v"),
      Seq(MV.ViewAgg("cnt", "count", "*"), MV.ViewAgg("sv", "sum", "ver"),
        MV.ViewAgg("lo", "min", "ver")))
    def mvCheck(tag: String): Unit = {
      MV.sync(view, t)
      val got = MV.read(view)
        .select($"grp", $"cnt", $"sv".cast("long"), $"lo")
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = model.groupBy(_._2._2).view.mapValues { rows =>
        val vers = rows.values.map(_._1)
        (rows.size.toLong, vers.sum, vers.min)
      }.toMap
      assert(got === want, s"$tableType seed=$seed materialized view diverged $tag")
    }

    // STAR-view probe: the same chaos folded through a dim join (the
    // "band" of `ver`, a bounded 1..9 key so the inner join always
    // matches); deterministic dim FLIPS in the op loop exercise the
    // dim-drift rebuild path interleaved with rollback/restore windows
    var dimMap: Map[Long, String] = (1L to 9L).map(k =>
      k -> (if (k <= 3) "low" else if (k <= 6) "mid" else "high")).toMap
    val dimT = GraftTable.create(spark, tmpDir(s"${name}_dim").toString,
      TableConfig(s"${name}_dim", TableType.CopyOnWrite, Seq("vk"), "", ""))
    dimT.bulkInsert(dimMap.toSeq.toDF("vk", "band"))
    val starView = MV.create(spark, tmpDir(s"${name}_smv").toString, t,
      Seq("band" -> "dm.band"),
      Seq(MV.ViewAgg("cnt", "count", "*"), MV.ViewAgg("sv", "sum", "f.ver")),
      dims = Seq(MV.DimJoin("dm", dimT, "f.ver = dm.vk")))
    def starCheck(tag: String): Unit = {
      MV.sync(starView, t)
      val got = MV.read(starView).select($"band", $"cnt", $"sv".cast("long"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val want = model.groupBy { case (_, (ver, _)) => dimMap(ver) }
        .view.mapValues(rs => (rs.size.toLong, rs.values.map(_._1).sum)).toMap
      assert(got === want, s"$tableType seed=$seed star view diverged $tag")
    }

    val init = uniq(Gen.listOfN(20, rowGen)
      .pureApply(Gen.Parameters.default, Seed(seed)))
    record(t.bulkInsert(df(init)))
    model = init.map(r => r._1 -> ((r._2, r._3))).toMap
    history = Vector(history.head._1 -> model) // model after init

    // CDC oracle: the change feed over the op's window must equal the
    // model diff. The engine MAY additionally report identity updates
    // (same value rewritten under a new commit stamp — e.g. an upsert
    // replaying the current value); those are correct change records the
    // value-diff model can't see, so they're tolerated when
    // before == after == the current value.
    def checkCdc(prevTs: String, prevModel: Map[Long, (Long, String)]): Unit = {
      val got = Readers.incrementalChanges(t, prevTs)
        .select("id", "ver", "v", Readers.ChangeTypeCol)
        .as[(Long, Long, String, String)].collect()
      val byKind = got.groupBy(_._4).view.mapValues(
        _.map(r => r._1 -> ((r._2, r._3))).toMap).toMap
      val dels = byKind.getOrElse("delete", Map.empty)
      val ins = byKind.getOrElse("insert", Map.empty)
      val updB = byKind.getOrElse("update_before", Map.empty)
      val updA = byKind.getOrElse("update_after", Map.empty)
      val expDel = prevModel.filter { case (k, _) => !model.contains(k) }
      val expIns = model.filter { case (k, _) => !prevModel.contains(k) }
      assert(dels === expDel, s"cdc deletes diverged after $prevTs")
      assert(ins === expIns, s"cdc inserts diverged after $prevTs")
      assert(updB.keySet === updA.keySet, "cdc update images unpaired")
      updA.foreach { case (k, after) =>
        assert(model.get(k).contains(after), s"cdc update_after wrong for $k")
        val before = updB(k)
        // either a genuine change (before = previous value) or a
        // tolerated identity rewrite (before == after == current value)
        assert(prevModel.get(k).contains(before) || before == after,
          s"cdc update_before wrong for $k: $before")
      }
      // every genuine value change must be reported
      prevModel.foreach { case (k, old) =>
        model.get(k).foreach { cur =>
          if (cur != old) assert(updA.get(k).contains(cur),
            s"cdc missed update for $k: $old -> $cur")
        }
      }
    }

    ops(seed, 18).zipWithIndex.foreach { case (op, i) =>
      val prevTs = history.last._1
      val prevModel = model
      op match {
        case Upsert(rows) =>
          // default payload = overwrite-with-latest ARRIVAL (new row wins
          // across commits); EVENT_TIME payload = the precombine value
          // outranks arrival, so a LATE row (lower ver) never clobbers
          record(t.upsert(df(rows)))
          rows.foreach { case (id, ver, v) =>
            val wins = !eventTime || model.get(id).forall(old => ver >= old._1)
            if (wins) model = model.updated(id, (ver, v))
          }
          history = history.init :+ (history.last._1 -> model)
        case Delete(_) if eventTime && t.cfg.isMor =>
          // EVENT_TIME MOR: a tombstone's ordering value OUTRANKS later
          // lower-ordered upserts (documented DefaultHoodieRecordPayload
          // semantics, PayloadSpec's directed tombstone test) — and COW
          // cannot retain tombstones, so the two types legitimately
          // diverge on delete-then-late-upsert. The flat model can't
          // express either; keep this variant's chaos to upserts.
          ()
        case Delete(ids) =>
          record(t.delete(df(ids.map(id => (id, 99L, "")))))
          model = model.removedAll(ids)
          history = history.init :+ (history.last._1 -> model)
        case MarkerUpsert(_, _) if eventTime && t.cfg.isMor =>
          () // marker deletes are deletes — same divergence as Delete above
        case MarkerUpsert(rows, dels) =>
          import org.apache.spark.sql.functions.lit
          val batch = df(rows).withColumn(MetaCols.DeleteFlag, lit(false))
            .unionByName(df(dels.map(id => (id, 99L, "")))
              .withColumn(MetaCols.DeleteFlag, lit(true)))
          record(t.upsert(batch))
          rows.foreach { case (id, ver, v) =>
            val wins = !eventTime || model.get(id).forall(old => ver >= old._1)
            if (wins) model = model.updated(id, (ver, v))
          }
          model = model.removedAll(dels)
          history = history.init :+ (history.last._1 -> model)
        case Overwrite(rows) =>
          // replaces the CONTENT of every partition the batch touches
          record(t.insertOverwrite(df(rows)))
          val touched = rows.map(r => partOf(r._1)).toSet
          model = model.filterNot { case (id, _) => touched(partOf(id)) } ++
            rows.map(r => r._1 -> ((r._2, r._3)))
          history = history.init :+ (history.last._1 -> model)
        case DropPartition(p) =>
          record(t.deletePartitions(Seq(p)))
          model = model.filterNot { case (id, _) => partOf(id) == p }
          history = history.init :+ (history.last._1 -> model)
        case Rollback if history.size >= 2 &&
            t.timeline.completedInstants().lastOption.exists(_.ts == history.last._1) =>
          // only when the last data commit is still the table's latest
          // instant — the engine (correctly) refuses to roll back under a
          // later inline compaction, whose base file subsumed the deltas
          Services.rollback(t, history.last._1)
          history = history.init
          model = history.last._2
        case Restore if history.size >= 3 =>
          val target = history(history.size - 3)
          Services.restore(t, target._1)
          history = history.take(history.size - 2)
          model = history.last._2
          // restore may have undone bucket rescales, flipping the
          // persisted routing count back — reload so this handle routes
          // like any writer opening the table now would
          if (bucketed) t = GraftTable.load(spark, dir)
        case Rescale(n0) if consistent =>
          // consistent engine: the layout change is a single-bucket split
          // (hottest live group) or a full cold-sibling merge-back —
          // layout-only either way, model unchanged, CDC must stay silent
          if (n0 % 2 == 1)
            Services.mergeColdBuckets(t, Some(Long.MaxValue))
          else {
            val slices = t.view.fileSlices(None)
            if (slices.nonEmpty) {
              val s = slices.maxBy(x =>
                (x.allFiles.map(_.sizeBytes).sum, x.partitionPath, x.fileId))
              if (graft.table.ConsistentBuckets.Node.parse(s.fileId)
                  .exists(_.d < graft.table.ConsistentBuckets.MaxDepth))
                t.splitBucket(s.partitionPath, s.fileId)
            }
          }
        case Rescale(n0) if bucketed =>
          // layout-only: model unchanged, CDC must stay silent, and the
          // new count governs every subsequent op in the sequence
          val cur = graft.table.BucketIndex.numBuckets(t.cfg)
          t = t.rescaleBuckets(if (n0 == cur) n0 + 1 else n0)
        case _ => () // rollback/restore/rescale not applicable: no-op
      }
      assert(snap(t) === model,
        s"$tableType seed=$seed diverged after op #$i: $op")
      // point-lookup probe: every fourth op, the index-driven lookup path
      // (SIMPLE scan / BLOOM sidecars / RECORD mapping table / BUCKET
      // hash / CONSISTENT covers — whichever this variant runs) must
      // agree with the model for present AND absent keys
      if (i % 4 == 1) {
        val probeIds = Seq(1L, 15L, 30L, 999L)
        val got = t.lookup(probeIds.map(_.toString))
          .select("id", "ver", "v").as[Row3].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got === model.filter { case (k, _) => probeIds.contains(k) },
          s"$tableType seed=$seed lookup diverged after op #$i: $op")
      }
      // time-travel probe: every third op, replay a deterministic PAST
      // state from the model history — as-of reads must hold under the
      // same chaos (rewrites, layout ops, revivals), not just the head
      if (i % 3 == 0 && history.size >= 2) {
        val (pastTs, pastModel) = history(i % (history.size - 1))
        val got = Readers.timeTravel(t, pastTs).select("id", "ver", "v")
          .as[Row3].collect().map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got === pastModel,
          s"$tableType seed=$seed time travel to $pastTs diverged after op #$i: $op")
      }
      // stats-answer probe: unfiltered count/count(col)/min/max and a
      // DISTINCT over the snapshot must equal the model whether the plan
      // collapsed to the stats LocalRelation or fell back to the scan —
      // catches any stale footer stat a rewrite/layout op could leave
      if (i % 4 == 3) {
        val a = Readers.snapshot(t).agg(
          F.count(F.lit(1)).as("n"), F.count(F.col("v")).as("nv"),
          F.min(F.col("ver")).as("lo"), F.max(F.col("ver")).as("hi"),
          F.min(F.col("v")).as("lov"), F.max(F.col("v")).as("hiv")).head()
        assert(a.getLong(0) === model.size.toLong,
          s"$tableType seed=$seed stats count diverged after op #$i: $op")
        if (model.nonEmpty) {
          assert(a.getLong(1) === model.size.toLong)
          assert(a.getLong(2) === model.values.map(_._1).min &&
            a.getLong(3) === model.values.map(_._1).max,
            s"$tableType seed=$seed stats min/max(ver) diverged after op #$i: $op")
          assert(a.getString(4) === model.values.map(_._2).min &&
            a.getString(5) === model.values.map(_._2).max,
            s"$tableType seed=$seed stats min/max(v) diverged after op #$i: $op")
        }
        val dist = Readers.snapshot(t).select("v").distinct()
          .as[String].collect().toSet
        assert(dist === model.values.map(_._2).toSet,
          s"$tableType seed=$seed DISTINCT diverged after op #$i: $op")
      }
      op match {
        case Upsert(_) | Delete(_) | MarkerUpsert(_, _) | Overwrite(_) | DropPartition(_) =>
          checkCdc(prevTs, prevModel)
        case Rescale(_) if bucketed =>
          // a layout-only rewrite must keep the change feed SILENT
          checkCdc(prevTs, prevModel)
        case _ => () // rollback/restore rewrite the window itself
      }
      if (i % 5 == 2) mvCheck(s"after op #$i: $op")
      // deterministic dim flip: moves one ver-band mapping, then the next
      // starCheck's sync must detect the drift and rebuild
      if (i % 7 == 3) {
        val k = (i % 9) + 1L
        val nb = if (dimMap(k) == "low") "high" else "low"
        dimMap += k -> nb
        dimT.upsert(Seq((k, nb)).toDF("vk", "band"))
      }
      if (i % 5 == 4) starCheck(s"after op #$i: $op")
    }
    // end-state services must not change the observable table
    Services.clean(t)
    if (t.cfg.isMor)
      Services.scheduleCompaction(t).foreach(ts => Services.runCompaction(t, ts))
    assert(snap(t) === model, s"$tableType seed=$seed diverged after services")
    mvCheck("at end state")
    starCheck("at end state")
  }

  test("COW: random mixed op sequences match the model at every step") {
    Seq(11L, 12L).foreach(run(TableType.CopyOnWrite, Map.empty, _))
  }

  test("MOR with aggressive inline compaction: same sequences, same states") {
    Seq(11L, 12L).foreach(run(TableType.MergeOnRead,
      Map(ConfigKeys.CompactDeltaCommits -> "3"), _))
  }

  test("COW + BLOOM index: tagging stays correct under the same chaos") {
    run(TableType.CopyOnWrite, Map(ConfigKeys.IndexType -> "BLOOM"), 13L)
  }

  test("MOR + RECORD index: index catch-up survives rollback/restore") {
    run(TableType.MergeOnRead, Map(
      ConfigKeys.IndexType -> "RECORD",
      ConfigKeys.CompactDeltaCommits -> "3"), 13L)
  }

  test("COW + BUCKET index: stable-id revival under the same chaos") {
    // DropPartition + later writes to the same partition force constant
    // group-id revival — the replacement-history view semantics under
    // arbitrary interleavings with overwrite/rollback/restore
    Seq(11L, 12L).foreach(seed => run(TableType.CopyOnWrite, Map(
      ConfigKeys.IndexType -> "BUCKET",
      ConfigKeys.BucketIndexNumBuckets -> "4"), seed))
  }

  test("MOR + BUCKET index with inline compaction: same sequences, same states") {
    run(TableType.MergeOnRead, Map(
      ConfigKeys.IndexType -> "BUCKET",
      ConfigKeys.BucketIndexNumBuckets -> "4",
      ConfigKeys.CompactDeltaCommits -> "3"), 13L)
  }

  test("COW + CONSISTENT buckets: split/merge chaos keeps covers exact") {
    // splits/merges interleave with overwrite/drop/rollback/restore —
    // cover replay (incl. the rewind cache invalidation) must route every
    // subsequent write exactly, and the change feed must stay silent
    // across layout ops
    Seq(11L, 12L).foreach(seed => run(TableType.CopyOnWrite, Map(
      ConfigKeys.IndexType -> "BUCKET",
      ConfigKeys.BucketIndexEngine -> "CONSISTENT",
      ConfigKeys.BucketIndexNumBuckets -> "4"), seed))
  }

  test("MOR + CONSISTENT buckets with inline compaction: same chaos") {
    run(TableType.MergeOnRead, Map(
      ConfigKeys.IndexType -> "BUCKET",
      ConfigKeys.BucketIndexEngine -> "CONSISTENT",
      ConfigKeys.BucketIndexNumBuckets -> "4",
      ConfigKeys.CompactDeltaCommits -> "3"), 13L)
  }

  test("EVENT_TIME payload: late rows never clobber, under the same chaos") {
    Seq(14L, 15L).foreach(seed => run(TableType.CopyOnWrite,
      Map(ConfigKeys.Payload -> "EVENT_TIME"), seed))
    run(TableType.MergeOnRead, Map(
      ConfigKeys.Payload -> "EVENT_TIME",
      ConfigKeys.CompactDeltaCommits -> "3"), 14L)
  }

  /** Partition-evolution chaos: upserts / deletes / marker batches with
    * the layout flipped mid-sequence (twice). The flat key→value model is
    * layout-blind, so snapshot equality proves the global tagging finds
    * every key across MIXED layouts and never duplicates a migrated row.
    * (CDC is not asserted here: a migration legitimately reports
    * delete+insert where the value-diff model would say update.)
    */
  private def runEvolve(tableType: String, seed: Long): Unit = {
    import org.apache.spark.sql.functions.lit
    val name = s"fuzzev_${tableType.take(3)}_$seed".toLowerCase
    val dir = tmpDir(name).toString
    var t = GraftTable.create(spark, dir,
      TableConfig(name, tableType, Seq("id"), "id % 3", "ver",
        Map(ConfigKeys.CompactDeltaCommits -> "3")))
    val init = uniq(Gen.listOfN(20, rowGen)
      .pureApply(Gen.Parameters.default, Seed(seed)))
    t.bulkInsert(df(init))
    var model: Map[Long, (Long, String)] =
      init.map(r => r._1 -> ((r._2, r._3))).toMap

    val miniGen: Gen[Op] = Gen.frequency(
      5 -> Gen.listOfN(8, rowGen).map(rs => Upsert(uniq(rs))),
      2 -> Gen.listOfN(4, Gen.choose(1L, 30L)).map(ids => Delete(ids.distinct)),
      2 -> markerGen)
    val layouts = Iterator("id % 4", "concat('p', id % 2)")
    (0 until 14).foreach { i =>
      if (i == 4 || i == 9) t = t.alterPartitionExpr(layouts.next())
      else miniGen.pureApply(Gen.Parameters.default, Seed(seed * 777 + i)) match {
        case Upsert(rows) =>
          t.upsert(df(rows))
          rows.foreach { case (id, ver, v) => model = model.updated(id, (ver, v)) }
        case Delete(ids) =>
          t.delete(df(ids.map(id => (id, 99L, ""))))
          model = model.removedAll(ids)
        case MarkerUpsert(rows, dels) =>
          t.upsert(df(rows).withColumn(MetaCols.DeleteFlag, lit(false))
            .unionByName(df(dels.map(id => (id, 99L, "")))
              .withColumn(MetaCols.DeleteFlag, lit(true))))
          rows.foreach { case (id, ver, v) => model = model.updated(id, (ver, v)) }
          model = model.removedAll(dels)
        case other => fail(s"unexpected op $other")
      }
      assert(snap(t) === model,
        s"$tableType seed=$seed diverged after evolve-op #$i")
    }
    // both layouts must actually coexist by the end
    val parts = Readers.snapshot(t)
      .select(MetaCols.PartitionPath).distinct()
      .as[String].collect().toSet
    assert(parts.exists(_.startsWith("p")) && parts.exists(!_.startsWith("p")),
      s"expected mixed layouts, got $parts")
  }

  test("partition evolution chaos: COW and MOR match the model across layout flips") {
    runEvolve(TableType.CopyOnWrite, 21L)
    runEvolve(TableType.MergeOnRead, 21L)
  }
}
