package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{ConfigKeys, MetaCols, TableConfig}

/** Opt-in BUCKET index (`graft.index.type=BUCKET`) — the hash-bucketed
  * file-group layout the reference line later shipped as
  * HoodieBucketIndex/HoodieSimpleBucketLayout: each partition holds a
  * FIXED set of `graft.index.bucket.num` file groups with stable ids
  * (`bkt<i>`), and a record's group is `xxhash64(recordKey) mod buckets`.
  *
  * Why it exists: every other index pays per-write lookup IO — SIMPLE
  * scans range-surviving keys, BLOOM probes sidecars, RECORD probes the
  * persisted mapping table. BUCKET tagging is a pure row-local hash: NO
  * key scan, NO probe, NO index maintenance, which makes it the
  * highest-throughput upsert path at 100 TB when keys are uniformly
  * distributed. The trade: no small-file packing (file sizing is the
  * bucket count's job — size `bucket.num` ≈ partition-size /
  * max-file-size at table creation), and the bucket count only changes
  * through an explicit full-rewrite rescale
  * (GraftTable.rescaleBuckets — one replacecommit re-routing every row,
  * then a config flip; an in-place count change would strand existing
  * rows in groups new hashes never route to).
  *
  * Layout invariant: EVERY write path routes rows to their bucket's
  * group id — upsert/delete (tag), insert / MERGE inserts / global-index
  * migrations (routeInserts), bulk_insert, insert_overwrite — so a
  * partition never grows a second family of file groups that could hold
  * the same key twice. Group ids survive replacement: delete_partition /
  * truncate kill a bucket's files, and a later write to the same bucket
  * REVIVES the id (FileSystemView replacement history makes the revived
  * generation visible; pre-revival files stay dead).
  *
  * Non-goals, refused loudly: clustering (rewrites groups under fresh
  * ids, breaking the hash → group invariant; re-bulk_insert into a new
  * table to re-bucket) and bootstrap adoption (external files are not
  * bucket-routed). Reference: hudi-client-common/.../index/bucket/
  * HoodieBucketIndex.java (tag = hash, no IO) and its
  * SparkBucketIndexPartitioner.
  */
object BucketIndex {

  def enabled(cfg: TableConfig): Boolean =
    cfg.prop(ConfigKeys.IndexType, "SIMPLE") == "BUCKET"

  def numBuckets(cfg: TableConfig): Int = {
    val n = cfg.propLong(ConfigKeys.BucketIndexNumBuckets,
      ConfigKeys.DefaultBucketIndexNumBuckets).toInt
    require(n > 0, s"${ConfigKeys.BucketIndexNumBuckets} must be positive, got $n")
    n
  }

  /** The stable group id for a record key: `bkt<hash mod n>`. `_`-free by
    * construction (file names are `<fileId>_<token>_<instant>`).
    */
  def fileIdCol(cfg: TableConfig, key: Column): Column =
    fileIdColFor(numBuckets(cfg), key)

  /** Same routing under an EXPLICIT bucket count — the rescale rewrite
    * routes against its TARGET count while the table config still records
    * the old one (GraftTable.rescaleBuckets flips the config only after
    * the replacecommit publishes).
    */
  def fileIdColFor(n: Int, key: Column): Column =
    concat(lit("bkt"), pmod(abs(xxhash64(key)), lit(n.toLong)).cast("string"))

  /** Tagging is a row-local projection — the whole point of the index. */
  def tag(cfg: TableConfig, keyed: DataFrame): DataFrame =
    keyed.withColumn(WritePipeline.FileIdCol,
      fileIdCol(cfg, col(MetaCols.RecordKey)))

  /** Driver-side twin of [[fileIdCol]] for a known key string — point
    * lookups and plan-time pruning derive a key's group with NO job and
    * NO index: the hash IS the location. Evaluates the same Catalyst
    * XxHash64 (seed 42, the `xxhash64` SQL function's) then replicates
    * `pmod(abs(h), n)` exactly (abs(Long.MinValue) stays negative with
    * ANSI off; pmod normalizes) — parity is pinned in BucketIndexSpec.
    */
  def bucketIdOf(cfg: TableConfig, keyString: String): String = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h = XxHash64(Seq(Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(keyString))), 42L)
      .eval(null).asInstanceOf[Long]
    val n = numBuckets(cfg).toLong
    val m = ((math.abs(h) % n) + n) % n
    s"bkt$m"
  }

  /** Plan-time pruning hook for [[graft.read.GraftFileIndex]]: defined
    * only when a pushed equality on the (single) record-key field can be
    * translated to its bucket's file id — the value's string cast IS the
    * key string for single-field simple keys.
    */
  def keyFieldPruner(cfg: TableConfig): Option[(String, String => String)] =
    if (enabled(cfg) && cfg.recordKeyFields.size == 1)
      Some((cfg.recordKeyFields.head, (s: String) => bucketIdOf(cfg, s)))
    else None
}
