package graft.read

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{FileEntry, MetaCols}

/** Metadata-driven `FileIndex` over a set of committed base files — the
  * analog of the reference's HoodieFileIndex
  * (reference hudi-spark/.../HoodieFileIndex.scala:68-137,199-229), built
  * from commit metadata instead of directory listing.
  *
  * `_hoodie_partition_path` is exposed as the partition column, so
  * Catalyst prunes partitions from WHERE clauses at plan time
  * (`listFiles(partitionFilters, …)` evaluates the predicates against the
  * partition values — zero IO), and parquet predicate pushdown / column
  * pruning come free from the HadoopFsRelation machinery. At 100 TB this
  * is the read path: a query touching one partition opens one partition's
  * files, however many the table has.
  */
final class GraftFileIndex(
    spark: SparkSession,
    tableBase: java.nio.file.Path,
    entries: Seq[FileEntry]) extends FileIndex {

  private val byPartition: Map[String, Seq[FileEntry]] = entries.groupBy(_.partitionPath)

  override val partitionSchema: StructType =
    StructType(Seq(StructField(MetaCols.PartitionPath, StringType, nullable = false)))

  override def rootPaths: Seq[HPath] = Seq(new HPath(tableBase.toUri))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // bind the partition-column attribute to slot 0 and evaluate per
    // partition value (the HoodieFileIndex.prunePartition approach)
    val predicate = partitionFilters.reduceOption(
      org.apache.spark.sql.catalyst.expressions.And).map { f =>
      Predicate.createInterpreted(f.transform {
        case a: Attribute if a.name == MetaCols.PartitionPath =>
          BoundReference(0, StringType, nullable = false)
      })
    }
    byPartition.toSeq.sortBy(_._1).flatMap { case (part, files) =>
      val row = InternalRow(UTF8String.fromString(part))
      if (predicate.forall(_.eval(row)))
        Some(PartitionDirectory(row, files.map(toStatus).toArray))
      else None
    }
  }

  private def toStatus(e: FileEntry): FileStatus =
    new FileStatus(e.sizeBytes, false, 1, 128L * 1024 * 1024, 0L,
      new HPath(tableBase.resolve(e.relPath).toUri))

  override def inputFiles: Array[String] =
    entries.map(e => tableBase.resolve(e.relPath).toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = entries.map(_.sizeBytes).sum
}
