package graft.streaming

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.core.CommitMetadata
import graft.table.GraftTable

/** Batch ingest sources — the DeltaStreamer source family
  * (reference hudi-utilities/.../sources: {Json,Csv,Parquet}DFSSource with
  * DFSPathSelector, SqlSource), minus external services (Kafka/JDBC/
  * schema-registry are out of scope — zero-egress environment).
  *
  * A source returns `(batch, newCheckpoint)` given the last checkpoint;
  * the checkpoint string rides in the destination table's commit metadata
  * (reference CHECKPOINT_KEY, DeltaSync.java:311-355), so ingest is
  * effectively-once: a crash between write and checkpoint is impossible
  * because they are the same atomic commit.
  */
trait IngestSource {
  /** Fetch everything new since `checkpoint` (None ⇒ from the beginning).
    * Returns None when there is nothing new.
    */
  def fetchNext(spark: SparkSession, checkpoint: Option[String])
      : Option[(DataFrame, String)]
}

/** File-drop source over a directory tree: selects files whose modification
  * time is strictly newer than the checkpoint, like the reference's
  * DFSPathSelector (reference sources/helpers/DFSPathSelector.java:62-105 —
  * checkpoint = max mod-time of consumed files). Listing happens on the
  * driver (one directory walk); reading is a normal distributed scan of
  * exactly the selected files, so no executor ever re-reads an old file.
  *
  * At scale the walk is O(files in the drop zone) — the operational
  * contract (as in the reference) is that ingested drops are pruned or
  * date-bucketed by the producer; selection itself never opens a file.
  */
final class DfsSource(
    rootPath: String,
    format: String = "parquet",
    schema: Option[StructType] = None,
    options: Map[String, String] = Map.empty) extends IngestSource {

  private val exts: Set[String] = format match {
    case "parquet" => Set(".parquet")
    case "json" => Set(".json", ".jsonl")
    case "csv" => Set(".csv")
    case other => throw new IllegalArgumentException(s"unsupported format '$other'")
  }

  private def listNewer(ckpt: Long): Seq[(Path, Long)] = {
    val root = Paths.get(rootPath)
    if (!Files.isDirectory(root)) return Seq.empty
    graft.core.PathIO.walk(root)
      .filter(p => Files.isRegularFile(p))
      .filter(p => exts.exists(p.getFileName.toString.endsWith(_)))
      .filterNot(p => p.getFileName.toString.startsWith(".") ||
        p.getFileName.toString.startsWith("_"))
      .map(p => p -> Files.getLastModifiedTime(p).toMillis)
      .filter(_._2 > ckpt)
      .toSeq.sortBy(x => (x._2, x._1.toString))
  }

  override def fetchNext(spark: SparkSession, checkpoint: Option[String])
      : Option[(DataFrame, String)] = {
    val ckpt = checkpoint.map(_.toLong).getOrElse(Long.MinValue)
    val selected = listNewer(ckpt)
    if (selected.isEmpty) return None
    val reader0 = spark.read.options(options)
    val reader = schema.map(reader0.schema).getOrElse(reader0)
    val paths = selected.map(_._1.toString)
    val df = format match {
      case "parquet" => reader.parquet(paths: _*)
      case "json" => reader.json(paths: _*)
      case "csv" => reader.csv(paths: _*)
    }
    Some((df, selected.map(_._2).max.toString))
  }
}

/** SQL source (reference sources/SqlSource.java): a fixed query evaluated
  * each tick — checkpointing is the caller's concern (the reference uses it
  * for backfills where re-reads are acceptable). The "checkpoint" advances
  * by tick count purely so `IngestJob` can tell "ran" from "new data".
  */
final class SqlSource(sql: String) extends IngestSource {
  override def fetchNext(spark: SparkSession, checkpoint: Option[String])
      : Option[(DataFrame, String)] = {
    val tick = checkpoint.map(_.toLong + 1).getOrElse(0L)
    Some((spark.sql(sql), tick.toString))
  }
}

/** Source → transform → upsert ingest driver over any [[IngestSource]] —
  * the generic half of the DeltaStreamer analog (table-to-table incremental
  * ingest lives in [[Streaming.syncOnce]]). The source checkpoint is read
  * from and written to the destination's commit metadata atomically with
  * the data.
  */
object IngestJob {
  val CheckpointKey: String = Streaming.CheckpointKey

  def lastCheckpoint(dst: GraftTable): Option[String] =
    dst.timeline.completedDataInstants().reverse.iterator
      .map(i => CommitMetadata.fromJson(dst.timeline.readContent(i)))
      .flatMap(_.extraMetadata.get(CheckpointKey))
      .take(1).toSeq.headOption

  /** One ingest tick: fetch-new → transform → upsert. Returns the commit
    * ts, or None when the source had nothing new.
    */
  def syncOnce(spark: SparkSession, source: IngestSource, dst: GraftTable,
      transform: DataFrame => DataFrame = identity): Option[String] =
    source.fetchNext(spark, lastCheckpoint(dst)).map { case (batch, ckpt) =>
      dst.upsert(transform(batch), extraMetadata = Map(CheckpointKey -> ckpt))
    }
}
