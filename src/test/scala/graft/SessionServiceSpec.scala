package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core._
import graft.pipeline.{SessionService, Sessions}
import graft.read.Readers
import graft.table.GraftTable

class SessionServiceSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private val Buckets = 8

  private def ev(id: Long, user: Long, sec: Long): (Long, java.sql.Timestamp, Long, Double) =
    (id, new java.sql.Timestamp(sec * 1000L), user, 1.0)

  private def eventsTable(name: String): GraftTable =
    GraftTable.create(spark, tmpDir(name).toString, TableConfig(
      name, TableType.CopyOnWrite, Seq("event_id"),
      s"pmod(user_id, $Buckets)", ""))

  private def sessionsTable(name: String): GraftTable =
    GraftTable.create(spark, tmpDir(name).toString, TableConfig(
      name, TableType.CopyOnWrite, Seq("user_id", "session_seq"),
      s"pmod(user_id, $Buckets)", ""))

  private def expected(events: GraftTable) =
    Sessions.sessionStats(
        Readers.snapshot(events).select("event_id", "ts", "user_id", "value"),
        maxGapSeconds = 600)
      .select("user_id", "session_seq", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  private def actual(sessions: GraftTable) =
    Readers.snapshot(sessions)
      .select("user_id", "session_seq", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("incremental sessionization: bounded recompute, exact result") {
    val events = eventsTable("ss_events")
    val sessions = sessionsTable("ss_sessions")

    // batch 1: 20 users, two sessions each (events at t, t+30, gap, t+5000)
    val batch1 = (1L to 20L).flatMap(u =>
      Seq(ev(u * 100, u, u), ev(u * 100 + 1, u, u + 30), ev(u * 100 + 2, u, u + 5000)))
    events.bulkInsert(batch1.toDF("event_id", "ts", "user_id", "value"))

    val c1 = SessionService.sync(events, sessions, maxGapSeconds = 600, buckets = Buckets)
    assert(c1.isDefined)
    assert(actual(sessions) === expected(events))

    // batch 2: late events for users 1..3 only — extends session 2 and
    // opens a session 3
    val batch2 = (1L to 3L).flatMap(u =>
      Seq(ev(u * 100 + 3, u, u + 5030), ev(u * 100 + 4, u, u + 99000)))
    events.upsert(batch2.toDF("event_id", "ts", "user_id", "value"))

    val c2 = SessionService.sync(events, sessions, maxGapSeconds = 600, buckets = Buckets)
    assert(c2.isDefined)
    assert(actual(sessions) === expected(events))

    // the second tick replaced ONLY the affected buckets (users 1..3)
    val affectedBuckets = (1L to 3L).map(u => (u % Buckets).toString).toSet
    val md = CommitMetadata.fromJson(sessions.timeline.readContent(
      sessions.timeline.completedDataInstants().last))
    val touched = md.writeStats.map(_.partitionPath).toSet ++ md.replacedFileIds.keySet
    assert(touched.nonEmpty && touched.subsetOf(affectedBuckets))

    // nothing new → no commit
    assert(SessionService.sync(events, sessions, maxGapSeconds = 600,
      buckets = Buckets).isEmpty)

    // time travel pins the pre-batch-2 sessionization
    val old = Readers.timeTravel(sessions, c1.get)
      .select("user_id").distinct().count()
    assert(old === 20L)
  }

  test("events rollback: the next tick recomputes every bucket once") {
    val events = eventsTable("ssrb_events")
    val sessions = sessionsTable("ssrb_sessions")
    events.bulkInsert((1L to 8L).flatMap(u =>
      Seq(ev(u * 10, u, u), ev(u * 10 + 1, u, u + 30)))
      .toDF("event_id", "ts", "user_id", "value"))
    SessionService.sync(events, sessions, maxGapSeconds = 600, buckets = Buckets)
    // user 99's ONLY events arrive, get sessionized, then roll back — the
    // incremental pull never surfaces the removal, so without the rewind
    // check their sessions would linger forever
    val c2 = events.upsert(Seq(ev(990, 99L, 5), ev(991, 99L, 20))
      .toDF("event_id", "ts", "user_id", "value"))
    SessionService.sync(events, sessions, maxGapSeconds = 600, buckets = Buckets)
    assert(actual(sessions).exists(_._1 == 99L))
    graft.table.Services.rollback(events, c2)
    assert(SessionService.sync(events, sessions, maxGapSeconds = 600,
      buckets = Buckets).isDefined)
    assert(actual(sessions) === expected(events))
    assert(!actual(sessions).exists(_._1 == 99L), "rolled-back user lingers")
    // one recovery, then back to incremental no-ops
    assert(SessionService.sync(events, sessions, maxGapSeconds = 600,
      buckets = Buckets).isEmpty)
  }
}
