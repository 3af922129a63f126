package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.Ev

/** Streaming sessionization: cross-batch open-session state, in-batch
  * ordering, sentinel close-out, exact scaled-decimal sums.
  */
class StatefulSessionsSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private def run(batches: Seq[Seq[Ev]], gapSeconds: Long = 1800L) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val sink = s"sess_spec_${java.util.UUID.randomUUID.toString.take(8)}"
    val q = StatefulSessions.sessionize(ms.toDS(), gapSeconds)
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(sink).as[StatefulSessions.SessionOut].collect().toSeq
  }

  private val S = 1000000L // 1s in micros

  test("session spanning a batch boundary stays one session") {
    val out = run(Seq(
      Seq(Ev(1L, 1L, 0L, 1.5)),
      // out of order WITHIN the batch + continues the open session
      Seq(Ev(1L, 3L, 4000 * S, 3.0), Ev(1L, 2L, 10 * S, 2.25)),
      Seq(Ev(1L, -1L, 1000000 * S, 0.0)))) // sentinel
    assert(out.map(_.session_seq).sorted === Seq(1L, 2L))
    val s1 = out.find(_.session_seq == 1L).get
    assert(s1.n_events === 2L)
    assert(s1.start_us === 0L && s1.end_us === 10 * S)
    assert(s1.total_scaled === 37500L) // 1.5000 + 2.2500 scaled by 1e4
    val s2 = out.find(_.session_seq == 2L).get
    assert(s2.n_events === 1L && s2.total_scaled === 30000L)
  }

  test("streaming dedup: within-batch min wins, later duplicates suppressed") {
    import graft.streaming.StreamingDedup
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[StreamingDedup.Keyed]
    val sink = s"dedup_spec_${java.util.UUID.randomUUID.toString.take(8)}"
    val q = StreamingDedup.dedupStream(ms.toDS()).toDF("doc_id")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      // batch 1: fp "a" arrives twice (ids 5, 2) -> min 2 wins; fp "b" -> 7
      ms.addData(Seq(StreamingDedup.Keyed(5L, "a"), StreamingDedup.Keyed(2L, "a"),
        StreamingDedup.Keyed(7L, "b")))
      q.processAllAvailable()
      // batch 2: late duplicates of "a"/"b" suppressed; new fp "c" emits
      ms.addData(Seq(StreamingDedup.Keyed(9L, "a"), StreamingDedup.Keyed(1L, "b"),
        StreamingDedup.Keyed(11L, "c")))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(sink).as[Long].collect().sorted.toSeq
    assert(out === Seq(2L, 7L, 11L))
  }

  test("watermarked dedup: state evicts past the horizon, exact within it") {
    import graft.streaming.StreamingDedup
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // event times start well above 0: the initial watermark IS 0 and the
    // stateful-operator late filter drops rows at or below it
    def ev(id: Long, fp: String, sec: Long) =
      StreamingDedup.KeyedEvent(id, fp, new java.sql.Timestamp((1000 + sec) * 1000L))
    val ms = MemoryStream[StreamingDedup.KeyedEvent]
    val sink = s"wmdedup_${java.util.UUID.randomUUID.toString.take(8)}"
    val q = StreamingDedup
      .dedupStreamWithinWatermark(ms.toDS(), java.time.Duration.ofSeconds(10))
      .toDF("doc_id")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      ms.addData(Seq(ev(5, "a", 0), ev(3, "a", 1))); q.processAllAvailable()
      // within the horizon: duplicate of "a" suppressed
      ms.addData(Seq(ev(9, "a", 5), ev(7, "b", 6))); q.processAllAvailable()
      // advance event time far past a's horizon (watermark = maxTs - 10s)
      ms.addData(Seq(ev(11, "c", 100))); q.processAllAvailable()
      // next batch processes a's timeout (watermark 90s > 11s): state gone,
      // so a re-arrival past the horizon re-emits — the documented trade
      ms.addData(Seq(ev(13, "d", 101))); q.processAllAvailable()
      ms.addData(Seq(ev(15, "a", 102))); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(sink).as[Long].collect().sorted.toSeq
    assert(out === Seq(3L, 7L, 11L, 13L, 15L))
  }

  test("watermarked near-dup: vetoes within the horizon, ages out past it") {
    import graft.streaming.StreamingDedup
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, hash: Long, sec: Long) =
      StreamingDedup.HashKeyedEvent(id, hash, new java.sql.Timestamp((1000 + sec) * 1000L))
    val hA = 0x1234567890ABCDEFL // family A
    val hB = ~hA // family B, ~64 bits from A
    val ms = MemoryStream[StreamingDedup.HashKeyedEvent]
    val sink = s"wmnear_${java.util.UUID.randomUUID.toString.take(8)}"
    val q = StreamingDedup
      .nearDupStreamWithinWatermark(ms.toDS(), java.time.Duration.ofSeconds(10))
      .toDF("doc_id")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      ms.addData(Seq(ev(1, hA, 0))); q.processAllAvailable()
      // near-dup within the horizon: flagged; unrelated family: clean
      ms.addData(Seq(ev(2, hA ^ 0x3L, 4), ev(3, hB, 4))); q.processAllAvailable()
      // jump event time: family A's entries (seen 0-4s) fall behind the
      // watermark; doc 4 near-dups the STILL-FRESH doc 3 and is flagged
      ms.addData(Seq(ev(4, hB ^ 0x1L, 200))); q.processAllAvailable()
      ms.addData(Seq(ev(5, 0x0F0F0F0F0F0F0F0FL, 201))); q.processAllAvailable()
      // a late near-dup of hA past the horizon is NOT vetoed (aged out)
      ms.addData(Seq(ev(6, hA ^ 0x1L, 202))); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(sink).as[Long].collect().toSet
    assert(out.contains(2L), "in-horizon near-dup missed")
    assert(!out.contains(3L), "unrelated family flagged")
    assert(out.contains(4L), "fresh near-dup missed after time jump")
    assert(!out.contains(5L), "unrelated hash flagged")
    assert(!out.contains(6L), "aged-out doc still vetoed a late arrival")
  }

  test("streaming near-dup: banded state matches the pairwise hash model") {
    import graft.streaming.StreamingDedup
    import graft.pipeline.ImageHash
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val n = 48
    val hashes = (0L until n).map(id =>
      id -> ImageHash.phash64(ImageHash.syntheticPng(id, 8)).get)
    // ground truth, independent of every streaming path under test
    val expectedDups = hashes.collect { case (id, h)
      if hashes.exists { case (lo, lh) =>
        lo < id && java.lang.Long.bitCount(lh ^ h) <= 3 } => id }.toSet
    assert(expectedDups.nonEmpty && expectedDups.size < n)
    val ms = MemoryStream[StreamingDedup.HashKeyed]
    val sink = s"neardup_spec_${java.util.UUID.randomUUID.toString.take(8)}"
    val q = StreamingDedup.nearDupStream(ms.toDS()).toDF("doc_id")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      // three id-ordered batches with a non-family-aligned split
      val keyed = hashes.map { case (id, h) => StreamingDedup.HashKeyed(id, h) }
      Seq(keyed.take(17), keyed.slice(17, 30), keyed.drop(30)).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    // at-least-once per dup: read as a set
    val got = spark.table(sink).as[Long].collect().toSet
    assert(got === expectedDups,
      s"extra=${got -- expectedDups} missing=${expectedDups -- got}")
  }

  test("sentinel session is never emitted; per-user isolation holds") {
    val out = run(Seq(
      Seq(Ev(1L, 1L, 0L, 1.0), Ev(2L, 2L, 5 * S, 4.0)),
      Seq(Ev(1L, -1L, 1000000 * S, 9.9), Ev(2L, -2L, 1000000 * S, 9.9))))
    // one real session per user; sentinel values never reach an emitted sum
    assert(out.size === 2)
    assert(out.map(_.user_id).sorted === Seq(1L, 2L))
    assert(out.forall(_.total_scaled < 90000L))
  }
}
