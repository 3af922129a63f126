package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.types.StructType

import graft.core.CommitMetadata
import graft.read.Readers
import graft.table.GraftTable

/** Commit-timestamp offset for the streaming source. Serialized verbatim
  * (the fixed-width yyyyMMddHHmmssSSS format orders lexicographically).
  */
final case class GraftOffset(ts: String) extends Offset {
  override def json: String = ts
}

/** Structured-Streaming source over a graft table: offsets are commit
  * timestamps and each micro-batch is the incremental read between them —
  * the same offset model as the reference's HoodieStreamSource
  * (reference hudi-spark/.../streaming/HoodieStreamSource.scala:104-169,
  * HoodieSourceOffset.scala). Combined with the graft sink this gives
  * table-to-table continuous pipelines entirely inside Structured
  * Streaming (`readStream.format("graft") ... writeStream.format("graft")`).
  */
final class GraftStreamSource(
    spark: SparkSession,
    table: GraftTable,
    override val schema: StructType,
    maxCommitsPerTrigger: Int = Int.MaxValue,
    changeFeed: Boolean = false,
    maxBytesPerTrigger: Long = Long.MaxValue) extends Source {

  private def tsOf(o: Offset): String = o match {
    case GraftOffset(ts) => ts
    case other => other.json // SerializedOffset round trip from the offset log
  }

  // Rate limiting follows the V1 FileStreamSource pattern: the source
  // CAPS the offset it reports, advancing at most N data commits past
  // what it last planned. A huge ingest backlog then replays as bounded
  // micro-batches instead of one batch spanning months of commits.
  // `lastPlanned` re-seeds from the recovery getBatch after a restart.
  private var lastPlanned: Option[String] = None

  override def getOffset: Option[Offset] = {
    val latest = table.timeline.lastCompleted().map(_.ts)
    val capped =
      if (maxCommitsPerTrigger == Int.MaxValue && maxBytesPerTrigger == Long.MaxValue)
        latest
      else {
        val base = lastPlanned.getOrElse("0")
        val pending = table.timeline.completedDataInstants()
          .filter(_.ts > base)
        if (pending.isEmpty) latest.filter(_ => lastPlanned.isEmpty)
        else {
          // byte budget from COMMIT METADATA (no file IO): commits vary
          // wildly in size, so a volume cap bounds executor memory where
          // a commit-count cap alone cannot; always admit at least one
          // commit so the stream can never stall on an oversized commit
          var budget = maxBytesPerTrigger
          val byBytes = pending.takeWhile { i =>
            val sz = CommitMetadata.fromJson(table.timeline.readContent(i))
              .writeStats.map(_.fileSizeInBytes).sum
            val ok = budget >= sz; if (ok) budget -= sz; ok
          }.map(_.ts)
          val admitted =
            (if (byBytes.isEmpty) pending.take(1).map(_.ts) else byBytes)
              .take(maxCommitsPerTrigger)
          Some(admitted.last)
        }
      }
    capped.foreach(ts => lastPlanned = Some(ts))
    capped.orElse(lastPlanned).map(GraftOffset)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val begin = start.map(tsOf).getOrElse("0")
    val endTs = tsOf(end)
    if (lastPlanned.forall(_ < endTs)) lastPlanned = Some(endTs)
    // change-feed mode streams full before/after change images instead of
    // latest states (the rate-limited offsets and checkpoint recovery are
    // identical — only the per-window read differs)
    val batch =
      (if (changeFeed) Readers.incrementalChanges(table, begin, Some(endTs))
       else Readers.incremental(table, begin, Some(endTs)))
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    org.apache.spark.sql.GraftSqlBridge.asStreamingBatch(batch)
  }

  override def stop(): Unit = ()
}
