package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka-shaped incremental ingest — the offset-generation half of the
  * reference's Kafka sources (reference hudi-utilities/.../sources/helpers/
  * KafkaOffsetGen.java:57-147, JsonKafkaSource.java:62-77), re-expressed
  * against a pluggable cluster client. The zero-egress sandbox has no
  * broker and no kafka-clients jar, so the wire protocol is behind
  * [[KafkaClusterClient]]; everything the reference's correctness rests
  * on — the checkpoint string format, per-partition offset-range
  * allocation under a max-events budget, auto-reset strategies, and
  * out-of-range checkpoint recovery — is implemented and tested here.
  *
  * Scale: offset planning is driver-side O(partitions) metadata work
  * (exactly as the reference's consumer calls are); the data read fans
  * out one task per offset range, so a 1000-partition topic reads with
  * 1000-way parallelism regardless of how many events the budget allots.
  */

/** One contiguous read per topic-partition: [fromOffset, untilOffset). */
final case class KafkaOffsetRange(partition: Int, fromOffset: Long, untilOffset: Long) {
  def count: Long = untilOffset - fromOffset
}

/** Checkpoint codec + range allocation (reference KafkaOffsetGen.java
  * CheckpointUtils:68-148). Checkpoint format: `topic,p:offset,p:offset,…`
  * where each offset is the NEXT offset to read (exclusive until).
  */
object KafkaCheckpoints {
  private val CkptPattern = ".*,.*:.*".r

  def isKafkaCheckpoint(s: String): Boolean = CkptPattern.matches(s)

  def strToOffsets(s: String): (String, Map[Int, Long]) = {
    val splits = s.split(",")
    val topic = splits.head
    val offsets = splits.tail.map { part =>
      val Array(p, o) = part.split(":")
      p.toInt -> o.toLong
    }.toMap
    (topic, offsets)
  }

  def offsetsToStr(topic: String, ranges: Seq[KafkaOffsetRange]): String =
    topic + "," + ranges.sortBy(_.partition)
      .map(r => s"${r.partition}:${r.untilOffset}").mkString(",")

  /** Allocate up to `numEvents` across partitions: repeatedly hand each
    * non-exhausted partition an equal ceil-share of the remaining budget,
    * so skewed partitions never starve quiet ones and a partition that
    * hits its end offset releases its share back to the pool (reference
    * CheckpointUtils.computeOffsetRanges:101-144). Partitions present in
    * `to` but absent from `from` (newly added) start at offset 0.
    */
  def computeOffsetRanges(from: Map[Int, Long], to: Map[Int, Long],
      numEvents: Long): Seq[KafkaOffsetRange] = {
    var ranges = to.keys.toSeq.sorted.map { p =>
      val f = from.getOrElse(p, 0L)
      KafkaOffsetRange(p, f, f)
    }
    var alloced = 0L
    var exhausted = ranges.iterator.filter(r => r.untilOffset >= to(r.partition))
      .map(_.partition).toSet
    while (alloced < numEvents && exhausted.size < ranges.size) {
      val remaining = numEvents - alloced
      val perPartition = math.ceil(remaining.toDouble / (ranges.size - exhausted.size)).toLong
      ranges = ranges.map { r =>
        if (exhausted.contains(r.partition)) r
        else {
          val toMax = to(r.partition)
          var until = math.min(toMax, r.untilOffset + perPartition)
          if (until == toMax) exhausted += r.partition
          alloced += until - r.untilOffset
          if (alloced > numEvents) { // clawback past the budget
            until = math.max(r.untilOffset, until - (alloced - numEvents))
            alloced = numEvents
            if (until < toMax) exhausted += r.partition // budget spent
          }
          r.copy(untilOffset = until)
        }
      }
    }
    ranges
  }

  def totalNewMessages(ranges: Seq[KafkaOffsetRange]): Long = ranges.map(_.count).sum
}

/** The cluster surface the source needs — a strict subset of KafkaConsumer
  * plus the ranged read. A production binding would delegate to
  * kafka-clients + a per-range executor read; tests bind an in-memory
  * cluster. `read` must return one row per message in the given ranges
  * with columns (partition INT, offset LONG, key STRING, value STRING),
  * parallelized at least one task per range.
  */
trait KafkaClusterClient {
  def topicExists(topic: String): Boolean
  def partitionsFor(topic: String): Seq[Int]
  def beginningOffsets(topic: String): Map[Int, Long]
  def endOffsets(topic: String): Map[Int, Long]
  /** Committed group offsets; partitions with no commit are absent. */
  def groupOffsets(topic: String, groupId: String): Map[Int, Long]
  /** Commit consumer-group offsets (reference KafkaOffsetGen
    * commitOffsetToKafka — called only after the TABLE commit is durable).
    */
  def commitGroupOffsets(topic: String, groupId: String,
      offsets: Map[Int, Long]): Unit
  def read(spark: SparkSession, topic: String, ranges: Seq[KafkaOffsetRange]): DataFrame
}

object KafkaSource {
  /** Where to start when there is no (usable) checkpoint — reference
    * KafkaOffsetGen.KafkaResetOffsetStrategies (LATEST default).
    */
  sealed trait AutoReset
  case object Earliest extends AutoReset
  case object Latest extends AutoReset
  final case class Group(groupId: String) extends AutoReset

  val DefaultMaxEvents: Long = 5000000L
}

/** Incremental Kafka source for [[IngestJob]]: each tick reads at most
  * `maxEvents` new messages spread across partitions and advances the
  * `topic,p:o,…` checkpoint that rides in the destination table's commit
  * metadata. A checkpoint that fell behind the broker's retention (any
  * partition's stored offset < earliest available) resets the whole read
  * to earliest rather than throwing mid-pipeline (reference
  * KafkaOffsetGen.fetchValidOffsets:265-273).
  */
final class KafkaSource(
    client: KafkaClusterClient,
    topic: String,
    autoReset: KafkaSource.AutoReset = KafkaSource.Latest,
    maxEvents: Long = KafkaSource.DefaultMaxEvents,
    commitOffsetsToGroup: Option[String] = None) extends IngestSource {
  import KafkaSource._

  /** Publish the durable checkpoint back as consumer-group offsets
    * (reference ENABLE_KAFKA_COMMIT_OFFSET; lag monitors then see the
    * table's true position). IngestJob calls this post-commit.
    */
  override def onCommit(checkpoint: String): Unit =
    commitOffsetsToGroup.foreach { gid =>
      val (t, offsets) = KafkaCheckpoints.strToOffsets(checkpoint)
      client.commitGroupOffsets(t, gid, offsets)
    }

  override def fetchNext(spark: SparkSession, checkpoint: Option[String])
      : Option[(DataFrame, String)] = {
    require(client.topicExists(topic), s"Kafka topic:$topic does not exist")
    val partitions = client.partitionsFor(topic)
    require(maxEvents >= partitions.size,
      "maxEvents should not be less than the number of kafka partitions")

    val from: Map[Int, Long] = checkpoint
      .filter(s => s.nonEmpty && KafkaCheckpoints.isKafkaCheckpoint(s)) match {
      case Some(ckpt) =>
        val (_, stored) = KafkaCheckpoints.strToOffsets(ckpt)
        val earliest = client.beginningOffsets(topic)
        val fellBehindRetention = stored.exists { case (p, o) =>
          o < earliest.getOrElse(p, 0L)
        }
        if (fellBehindRetention) earliest else stored
      case None => autoReset match {
        case Earliest => client.beginningOffsets(topic)
        case Latest => client.endOffsets(topic)
        case Group(gid) =>
          val committed = client.groupOffsets(topic, gid)
          // partitions the group never committed fall back to the default
          // reset (LATEST), matching the reference's consumer behavior
          val latest = client.endOffsets(topic)
          latest.map { case (p, end) => p -> committed.getOrElse(p, end) }
      }
    }
    val to = client.endOffsets(topic)
    val ranges = KafkaCheckpoints.computeOffsetRanges(from, to, maxEvents)
    val newCkpt = KafkaCheckpoints.offsetsToStr(topic, ranges)
    if (KafkaCheckpoints.totalNewMessages(ranges) <= 0) {
      // nothing to read; still surface a checkpoint change (first tick
      // under LATEST pins "now" so the next tick is incremental from here)
      if (checkpoint.contains(newCkpt)) None
      else Some((client.read(spark, topic, Seq.empty), newCkpt))
    } else Some((client.read(spark, topic, ranges), newCkpt))
  }
}
