package graft.core

import org.apache.hadoop.fs.Path

import graft.core.Storage.PathOps

/** Table-level configuration persisted as `<base>/.graft/table.json` —
  * the analog of the reference's `.hoodie/hoodie.properties`
  * (reference hudi-common/.../table/HoodieTableConfig.java:60-124).
  *
  * @param tableName          logical name
  * @param tableType          "COPY_ON_WRITE" | "MERGE_ON_READ"
  * @param recordKeyFields    columns forming the record key
  * @param partitionPathExpr  Spark SQL expression producing the partition
  *                           path string (empty ⇒ non-partitioned). Pure
  *                           Catalyst expression — the keygen analog
  *                           (reference keygen package) with no UDFs.
  * @param precombineField    ordering column for dedup/merge (empty ⇒ none;
  *                           arrival order wins via commit time)
  */
final case class TableConfig(
    tableName: String,
    tableType: String,
    recordKeyFields: Seq[String],
    partitionPathExpr: String,
    precombineField: String,
    props: Map[String, String] = Map.empty) {

  def isMor: Boolean = tableType == TableType.MergeOnRead

  def prop(key: String, default: String): String = props.getOrElse(key, default)
  def propLong(key: String, default: Long): Long =
    props.get(key).map(_.toLong).getOrElse(default)

  /** Base-file format: "parquet" (default) or "orc" — the reference's
    * HoodieFileFormat choice (reference model/HoodieFileFormat.java,
    * DefaultSource.scala:199-200; HFILE is out of scope). MOR delta files
    * stay parquet regardless, like the reference's log format being
    * independent of the base format.
    */
  def baseFormat: String = prop(ConfigKeys.BaseFormat, "parquet")
}

object TableType {
  val CopyOnWrite = "COPY_ON_WRITE"
  val MergeOnRead = "MERGE_ON_READ"
}

/** Tunables with the reference's defaults (BASELINE.md). */
object ConfigKeys {
  val MaxFileSize = "graft.parquet.max.file.size"           // 120 MB
  val SmallFileLimit = "graft.parquet.small.file.limit"     // 100 MB
  val RecordSizeEstimate = "graft.record.size.estimate"     // 1024 B seed
  val CleanerCommitsRetained = "graft.cleaner.commits.retained" // 10
  val CompactDeltaCommits = "graft.compact.max.delta.commits"   // 5
  val ArchiveMinCommits = "graft.archive.min.commits"       // 20
  val ArchiveMaxCommits = "graft.archive.max.commits"       // 30
  val IndexType = "graft.index.type"                 // SIMPLE | BLOOM | RECORD | BUCKET
  val Payload = "graft.payload.class"  // OVERWRITE_LATEST | EVENT_TIME | PARTIAL_UPDATE
  val FailedWritesPolicy = "graft.failed.writes.policy"     // EAGER | LAZY | NEVER
  val FailedWritesStaleMs = "graft.failed.writes.stale.ms"  // LAZY staleness window
  val ClusterInline = "graft.cluster.inline"                // false
  val ClusterInlineMaxCommits = "graft.cluster.inline.max.commits" // 4
  val ClusterSortColumns = "graft.cluster.sort.columns"     // comma-separated
  val ClusterZOrderColumns = "graft.cluster.zorder.columns" // comma-separated
  val ClusterCurve = "graft.cluster.curve"                  // morton | hilbert
  val BaseFormat = "graft.base.format"                      // parquet | orc
  val DictionaryStats = "graft.stats.dictionary"            // default true
  // declared CREATE TABLE schema (json) — answers reads before first write
  val CreateSchema = "graft.create.schema"
  // columns proven dictionary-ineligible by a past commit (high
  // cardinality / plain-page fallback): later commits skip their pages
  val DictionaryPoisoned = "graft.stats.dictionary.poisoned"
  val BloomNumEntries = "graft.index.bloom.num.entries"     // 60000
  val BloomFpp = "graft.index.bloom.fpp"                    // 1e-9
  val RecordIndexBuckets = "graft.index.record.buckets"     // explicit count (else auto)
  val RecordIndexKeysPerBucket = "graft.index.record.keys.per.bucket" // auto-scale target
  // non-key columns kept point-queryable via value → file-group index
  // tables (comma-separated); see table/SecondaryIndex.scala
  val SecondaryIndexColumns = "graft.index.secondary.columns"
  val SecondaryIndexBuckets = "graft.index.secondary.buckets" // explicit (else auto)
  // EXPRESSION (functional) indexes: `name:<spark sql expr>` entries
  // separated by `;` (e.g. "od_year:year(o_orderdate);clerk_lc:lower(o_clerk)").
  // Each maintains a value → file-group table like a secondary column
  // index, keyed by the EXPRESSION's value; see table/SecondaryIndex.scala
  val SecondaryIndexExpressions = "graft.index.expressions"
  // file groups per partition under the BUCKET index — immutable for the
  // table's lifetime; size ≈ expected-partition-bytes / max-file-size
  val BucketIndexNumBuckets = "graft.index.bucket.num"
  // FIXED (default): `hash mod num` with full-rewrite rescale.
  // CONSISTENT: extendible-hash covers with single-bucket split/merge
  // (see graft.table.ConsistentBuckets) — `num` must be a power of two
  val BucketIndexEngine = "graft.index.bucket.engine"
  // CONSISTENT engine: a live group whose bytes exceed this splits under
  // Services.splitHotBuckets (default 1.5x max file size, the reference's
  // hoodie.bucket.index.split.threshold discipline)
  val BucketSplitBytes = "graft.index.bucket.split.bytes"
  // opt-in: run splitHotBuckets after every data commit (CONSISTENT only)
  val BucketSplitAuto = "graft.index.bucket.split.auto"
  // opt-in automatic partition TTL: keep only the newest N partition
  // paths after each data commit (Services.expirePartitions keepLast)
  val PartitionTtlKeepLast = "graft.partition.ttl.keep.last"
  // opt-in automatic RECORD-level TTL after each data commit: expire rows
  // whose `ttl.column` event time is more than `ttl.keep.days` behind the
  // table's newest (Services.expireRecords — data-derived watermark)
  val RecordTtlColumn = "graft.record.ttl.column"
  val RecordTtlKeepDays = "graft.record.ttl.keep.days"
  val LockProvider = "graft.lock.provider"                  // os | lease
  val AutoClean = "graft.clean.automatic"                   // false (reference: true)
  // CHECK constraints: `name:<spark sql boolean expr>` entries separated
  // by `;` (expr may contain ':' — parsing splits on the FIRST colon,
  // like SecondaryIndexExpressions). Enforced on every write entry point;
  // see GraftTable.addCheckConstraint
  val CheckConstraints = "graft.constraints"
  val UrlEncodePartitions = "graft.partitionpath.urlencode" // false
  // hive-style `name=value` partition directories (reference
  // hoodie.datasource.write.hive_style_partitioning) — external engines'
  // partition discovery understands the layout natively
  val HiveStylePartitioning = "graft.hive.style.partitioning" // false
  // the `name` used by hive-style paths; defaults to the partition
  // expression when it is a bare column reference, else "partition"
  val PartitionName = "graft.partition.name"
  // multi-COLUMN identity layouts under hive-style naming prefix EVERY
  // level (`yr=1995/region=eu`) when true (default — the reference's
  // MultiPartKeysValueExtractor shape). BREAKING-LAYOUT NOTE: builds
  // before this option wrote PLAIN level values (`1995/eu`) for the same
  // config; a pre-existing multi-column hive-style table must set this
  // to false so new writes keep landing in its established layout
  // (otherwise upserts of existing keys would move partitions and
  // path-addressed ops like delete_partition stop matching old paths)
  val HiveStyleMultiLevel = "graft.hive.style.partitioning.multilevel" // true
  // set once alterPartitionExpr runs: stored partition values may not be
  // recomputable from rows, so key-addressed writes must tag globally
  val PartitionEvolved = "graft.partition.evolved"
  val CleanPolicy = "graft.clean.policy" // KEEP_LATEST_COMMITS | _FILE_VERSIONS | _BY_HOURS
  // entry count above which files-index snapshots switch from one JSON
  // blob to a parquet index table (distributed, partition-prunable)
  val FilesIndexParquetThreshold = "graft.files.index.parquet.threshold"
  // on-disk LAYOUT version (the reference's hoodie.table.version /
  // UpgradeOrDowngradeCommand protocol): stamped at create, checked at
  // load — a table written by a NEWER layout refuses to open instead of
  // misreading it; absent means version 1 (pre-versioning tables).
  // There is one layout so far; the field future-proofs the format.
  val TableVersion = "graft.table.version"

  val DefaultMaxFileSize: Long = 120L * 1024 * 1024
  val DefaultSmallFileLimit: Long = 100L * 1024 * 1024
  val DefaultRecordSize: Long = 1024L
  val DefaultCleanerRetained = 10
  val DefaultCompactDeltaCommits = 5
  val DefaultBloomNumEntries: Long = 60000L
  val DefaultBloomFpp = "1.0E-9"
  val DefaultRecordIndexBuckets: Long = 16L      // floor for the auto-scale
  val DefaultRecordIndexKeysPerBucket: Long = 1000000L
  val MaxRecordIndexBuckets: Long = 65536L
  // reference HoodieIndexConfig BUCKET_INDEX_NUM_BUCKETS defaults 256;
  // 16 suits the local test scale — real tables size this at creation
  val DefaultBucketIndexNumBuckets: Long = 16L
  val CurrentTableVersion: Long = 1L
}

object TableConfig {
  def path(base: Path): Path = base.resolve(".graft").resolve("table.json")

  def save(base: Path, cfg: TableConfig): Unit = {
    Storage.mkdirs(base.resolve(".graft"))
    Storage.writeString(path(base), Json.writePretty(cfg))
  }

  def load(base: Path): TableConfig =
    Json.read[TableConfig](Storage.readString(path(base)))

  def exists(base: Path): Boolean = Storage.exists(path(base))
}
