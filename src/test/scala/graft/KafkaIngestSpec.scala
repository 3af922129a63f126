package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.read.Readers
import graft.streaming._
import graft.table.GraftTable

/** In-memory cluster binding for [[KafkaClusterClient]]: per-partition
  * append-only message logs with a retention watermark, like the
  * reference's KafkaTestUtils-backed tests (reference
  * hudi-utilities/.../TestKafkaOffsetGen.java).
  */
final class FakeKafkaCluster extends KafkaClusterClient {
  // topic -> partition -> (beginningOffset, messages from that offset)
  private var topics = Map.empty[String, Map[Int, (Long, Vector[(String, String)])]]

  def createTopic(topic: String, partitions: Int): Unit =
    topics += topic -> (0 until partitions).map(_ -> (0L, Vector.empty[(String, String)])).toMap

  def send(topic: String, partition: Int, key: String, value: String): Unit = {
    val parts = topics(topic)
    val (begin, msgs) = parts(partition)
    topics += topic -> (parts + (partition -> (begin, msgs :+ (key, value))))
  }

  /** Advance the retention watermark: drop everything below `offset`. */
  def expireTo(topic: String, partition: Int, offset: Long): Unit = {
    val parts = topics(topic)
    val (begin, msgs) = parts(partition)
    val drop = (offset - begin).toInt
    topics += topic -> (parts + (partition -> (offset, msgs.drop(drop))))
  }

  def addPartition(topic: String): Unit = {
    val parts = topics(topic)
    topics += topic -> (parts + (parts.size -> (0L, Vector.empty[(String, String)])))
  }

  private var committed = Map.empty[(String, String, Int), Long]
  def commitGroupOffset(topic: String, groupId: String, partition: Int, offset: Long): Unit =
    committed += (topic, groupId, partition) -> offset

  override def commitGroupOffsets(topic: String, groupId: String,
      offsets: Map[Int, Long]): Unit =
    offsets.foreach { case (p, o) => commitGroupOffset(topic, groupId, p, o) }

  override def topicExists(topic: String): Boolean = topics.contains(topic)
  override def partitionsFor(topic: String): Seq[Int] = topics(topic).keys.toSeq.sorted
  override def beginningOffsets(topic: String): Map[Int, Long] =
    topics(topic).map { case (p, (b, _)) => p -> b }
  override def endOffsets(topic: String): Map[Int, Long] =
    topics(topic).map { case (p, (b, m)) => p -> (b + m.size) }
  override def groupOffsets(topic: String, groupId: String): Map[Int, Long] =
    committed.collect { case ((t, g, p), o) if t == topic && g == groupId => p -> o }

  override def read(spark: SparkSession, topic: String,
      ranges: Seq[KafkaOffsetRange]): DataFrame = {
    import spark.implicits._
    val rows = ranges.flatMap { r =>
      val (begin, msgs) = topics(topic)(r.partition)
      (r.fromOffset until r.untilOffset).map { o =>
        val (k, v) = msgs((o - begin).toInt)
        (r.partition, o, k, v)
      }
    }
    // one slice per range ≈ one task per range, like a real ranged read
    spark.createDataset(rows).toDF("partition", "offset", "key", "value")
      .repartition(math.max(1, ranges.size))
  }
}

class KafkaIngestSpec extends AnyFunSuite {
  import SparkTestBase._
  import KafkaCheckpoints._

  test("real-client adapter: availability probe and empty-range read shape") {
    // zero-egress sandbox: kafka-clients jars are absent, so the adapter
    // must report unavailable (callers then bind the stub) without throwing
    assert(!graft.streaming.SparkKafkaClusterClient.available)
    // the ranged read contract: empty ranges yield an empty, correctly
    // typed frame without touching any broker or kafka class
    val client = new graft.streaming.SparkKafkaClusterClient("broker:9092")
    val df = client.read(spark, "t", Seq.empty)
    assert(df.isEmpty)
    assert(df.schema === graft.streaming.SparkKafkaClusterClient.ReadSchema)
    val df2 = client.read(spark, "t",
      Seq(graft.streaming.KafkaOffsetRange(0, 5L, 5L))) // zero-count range
    assert(df2.isEmpty)
  }

  test("checkpoint string round-trips topic and per-partition offsets") {
    val s = "t1,0:100,1:250,2:0"
    val (topic, offs) = strToOffsets(s)
    assert(topic === "t1")
    assert(offs === Map(0 -> 100L, 1 -> 250L, 2 -> 0L))
    val back = offsetsToStr("t1", Seq(
      KafkaOffsetRange(1, 0, 250), KafkaOffsetRange(0, 0, 100), KafkaOffsetRange(2, 0, 0)))
    assert(back === s)
  }

  test("range allocation: equal split, skew spill-over, exact budget") {
    // even: 300 budget over 3 partitions with plenty available
    val even = computeOffsetRanges(Map(0 -> 0L, 1 -> 0L, 2 -> 0L),
      Map(0 -> 1000L, 1 -> 1000L, 2 -> 1000L), 300)
    assert(even.map(_.count) === Seq(100L, 100L, 100L))
    // skew: an exhausted partition releases budget to the busy ones
    val skew = computeOffsetRanges(Map(0 -> 0L, 1 -> 0L, 2 -> 0L),
      Map(0 -> 10L, 1 -> 1000L, 2 -> 1000L), 300)
    assert(skew.find(_.partition == 0).get.count === 10L)
    assert(totalNewMessages(skew) === 300L)
    // budget larger than available: read everything, no overshoot
    val all = computeOffsetRanges(Map(0 -> 5L), Map(0 -> 20L), 1000)
    assert(all === Seq(KafkaOffsetRange(0, 5, 20)))
    // uneven budget: total never exceeds numEvents
    val odd = computeOffsetRanges(Map(0 -> 0L, 1 -> 0L, 2 -> 0L),
      Map(0 -> 1000L, 1 -> 1000L, 2 -> 1000L), 100)
    assert(totalNewMessages(odd) === 100L)
  }

  test("new partitions start from offset 0") {
    val r = computeOffsetRanges(Map(0 -> 50L), Map(0 -> 60L, 1 -> 40L), 1000)
    assert(r === Seq(KafkaOffsetRange(0, 50, 60), KafkaOffsetRange(1, 0, 40)))
  }

  private def mkCluster(msgsPerPartition: Int = 10): FakeKafkaCluster = {
    val c = new FakeKafkaCluster
    c.createTopic("events", 3)
    for (p <- 0 until 3; i <- 0 until msgsPerPartition)
      c.send("events", p, s"k$p-$i", s"""{"id":${p * 1000 + i},"v":$i}""")
    c
  }

  test("earliest reset reads from the beginning; next tick is incremental") {
    val c = mkCluster()
    val src = new KafkaSource(c, "events", KafkaSource.Earliest)
    val Some((b1, ck1)) = src.fetchNext(spark, None)
    assert(b1.count() === 30)
    assert(ck1 === "events,0:10,1:10,2:10")
    assert(src.fetchNext(spark, Some(ck1)).isEmpty) // caught up
    c.send("events", 1, "k", """{"id":9999,"v":1}""")
    val Some((b2, ck2)) = src.fetchNext(spark, Some(ck1))
    assert(b2.count() === 1)
    assert(ck2 === "events,0:10,1:11,2:10")
  }

  test("latest reset pins 'now' on the first tick without reading") {
    val c = mkCluster()
    val src = new KafkaSource(c, "events", KafkaSource.Latest)
    val Some((b1, ck1)) = src.fetchNext(spark, None)
    assert(b1.count() === 0) // nothing read, but the position is pinned
    assert(ck1 === "events,0:10,1:10,2:10")
    c.send("events", 0, "k", """{"id":123,"v":7}""")
    val Some((b2, _)) = src.fetchNext(spark, Some(ck1))
    assert(b2.count() === 1)
  }

  test("group reset resumes from committed offsets, LATEST for uncommitted") {
    val c = mkCluster()
    c.commitGroupOffset("events", "g1", 0, 4)
    val src = new KafkaSource(c, "events", KafkaSource.Group("g1"))
    val Some((b1, ck1)) = src.fetchNext(spark, None)
    assert(b1.count() === 6) // partition 0 from 4→10; 1 and 2 start at latest
    assert(ck1 === "events,0:10,1:10,2:10")
  }

  test("checkpoint behind retention resets the read to earliest") {
    val c = mkCluster()
    c.expireTo("events", 0, 6) // offsets 0-5 aged out
    val src = new KafkaSource(c, "events", KafkaSource.Earliest)
    val Some((b, ck)) = src.fetchNext(spark, Some("events,0:2,1:10,2:10"))
    // stored 0:2 < earliest 6 → whole read restarts from earliest
    assert(ck === "events,0:10,1:10,2:10")
    assert(b.count() === 4 + 10 + 10)
  }

  test("maxEvents caps a tick; the checkpoint resumes mid-stream") {
    val c = mkCluster(100)
    val src = new KafkaSource(c, "events", KafkaSource.Earliest, maxEvents = 90)
    val Some((b1, ck1)) = src.fetchNext(spark, None)
    assert(b1.count() === 90)
    assert(ck1 === "events,0:30,1:30,2:30")
    val Some((b2, ck2)) = src.fetchNext(spark, Some(ck1))
    assert(b2.count() === 90)
    assert(ck2 === "events,0:60,1:60,2:60")
  }

  test("missing topic and sub-partition budget are refused") {
    val c = mkCluster()
    intercept[IllegalArgumentException] {
      new KafkaSource(c, "nope").fetchNext(spark, None)
    }
    intercept[IllegalArgumentException] {
      new KafkaSource(c, "events", KafkaSource.Earliest, maxEvents = 2)
        .fetchNext(spark, None)
    }
  }

  test("onCommit publishes group offsets AFTER the table commit; Group reset resumes there") {
    val c = mkCluster()
    val src = new KafkaSource(c, "events", KafkaSource.Earliest,
      commitOffsetsToGroup = Some("g2"))
    assert(c.groupOffsets("events", "g2").isEmpty) // nothing before a commit
    val dir = tmpDir("kafka_grp").toString
    val t = GraftTable.create(spark, dir, TableConfig(
      "kfkg", TableType.CopyOnWrite, Seq("id"), "", "v"))
    val parse = (df: DataFrame) => df.select(
      get_json_object(col("value"), "$.id").cast("long").as("id"),
      get_json_object(col("value"), "$.v").cast("long").as("v"))
    IngestJob.syncOnce(spark, src, t, parse)
    assert(c.groupOffsets("events", "g2") === Map(0 -> 10L, 1 -> 10L, 2 -> 10L))
    // a FRESH consumer with Group reset picks up exactly where g2 stands
    c.send("events", 1, "k", """{"id":7777,"v":1}""")
    val resumed = new KafkaSource(c, "events", KafkaSource.Group("g2"))
    val Some((b, _)) = resumed.fetchNext(spark, None)
    assert(b.count() === 1)
  }

  test("end-to-end: kafka → IngestJob → graft table, checkpoint in commit") {
    val c = mkCluster()
    val src = new KafkaSource(c, "events", KafkaSource.Earliest)
    val dir = tmpDir("kafka_ingest").toString
    val t = GraftTable.create(spark, dir, TableConfig(
      "kfk", TableType.CopyOnWrite, Seq("id"), "", "v"))
    val parse = (df: DataFrame) => df.select(
      get_json_object(col("value"), "$.id").cast("long").as("id"),
      get_json_object(col("value"), "$.v").cast("long").as("v"))
    assert(IngestJob.syncOnce(spark, src, t, parse).isDefined)
    assert(Readers.snapshot(t).count() === 30)
    assert(IngestJob.lastCheckpoint(t) === Some("events,0:10,1:10,2:10"))
    // quiet tick: no new commit
    assert(IngestJob.syncOnce(spark, src, t, parse).isEmpty)
    // new messages picked up incrementally, upserted by key
    c.send("events", 2, "k", """{"id":2000,"v":42}""") // dup key of p2-i0... id 2000 exists
    assert(IngestJob.syncOnce(spark, src, t, parse).isDefined)
    val snap = Readers.snapshot(t)
    assert(snap.count() === 30) // id 2000 upserted in place
    assert(snap.filter(col("id") === 2000 && col("v") === 42).count() === 1)
  }
}
