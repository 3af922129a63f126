package graft.table

import java.io.ByteArrayOutputStream

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.core._
import graft.core.Storage.PathOps

/** Opt-in BLOOM index (`graft.index.type=BLOOM`) — the analog of the
  * reference's bloom-filter record index (reference
  * hudi-client/hudi-spark-client/.../index/bloom/SparkHoodieBloomIndex.java
  * :70-133; filter sizing HoodieIndexConfig.java:56-80).
  *
  * Every base-file write stores a sidecar bloom filter over the file's
  * record keys under `.graft/blooms/` (the reference embeds them in
  * parquet footer metadata; a sidecar keeps us off custom footer writes
  * while costing the same one-footer-sized read). Upsert tagging then
  * runs a probe pass: each incoming key is tested against the filters of
  * the candidate files whose [minKey, maxKey] range covers it, and only
  * files with at least one probable hit are scanned for the index join —
  * on tables whose key ranges overlap across files (random-key layouts,
  * PARTITION_SORT/NONE loads) this prunes the files the range check
  * cannot. False positives are harmless: the join against the file's
  * actual keys is the verification (the reference verifies with
  * HoodieKeyLookupHandle the same way).
  *
  * Scale shape — NO filter bytes ever sit on the driver:
  *  - build: one distributed pass over the just-written keys; each task
  *    serializes its file's filter and publishes the sidecar itself
  *    (atomic tmp+rename), the driver only triggers the job.
  *  - probe: the driver broadcasts only NARROW candidate metadata
  *    (partition, key range, sidecar path — ~100 bytes/file); executors
  *    explode range-surviving (file, key) pairs, shuffle them by file, and
  *    each group task reads that one sidecar and short-circuits on the
  *    first probable hit. This is the reference's explode +
  *    repartitionAndSortWithinPartitions + per-file lazy-load shape
  *    (SparkHoodieBloomIndex.java:230-299, HoodieBloomIndexCheckFunction
  *    .java:42-96) — a 100 TB table's ~10^6 filters would be hundreds of
  *    GB, so a broadcast-the-filters design cannot scale past toy tables.
  *
  * Executor-side sidecar IO goes through Hadoop's FileSystem API resolved
  * from the sidecar URI — on a cluster the same code targets whatever
  * store backs the table path (hdfs://, s3a://, ...); locally it resolves
  * to the file:// implementation. Tasks rebuild the driver's Hadoop
  * configuration from shipped properties (never a bare
  * `new Configuration()`, which would lose `spark.hadoop.*` credentials). Publication is create-temp + rename
  * (atomic on HDFS and local FS; object stores get last-writer-wins
  * semantics, which is safe here because sidecars are content-addressed
  * by base-file path and thus written exactly once per file).
  */
object BloomIndex {

  def enabled(cfg: TableConfig): Boolean =
    cfg.prop(ConfigKeys.IndexType, "SIMPLE") == "BLOOM"

  private def bloomDir(base: Path): Path = base.resolve(".graft").resolve("blooms")

  private def sidecarName(relPath: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(relPath.getBytes("UTF-8")).map("%02x".format(_)).mkString + ".bloom"

  /** Sidecar path for a base file, keyed by its table-relative path (so a
    * rewritten file group's new base gets a new sidecar and stale ones are
    * simply never referenced again).
    */
  def sidecarPath(base: Path, relPath: String): Path =
    bloomDir(base).resolve(sidecarName(relPath))

  // -- executor-side sidecar IO: Hadoop FileSystem resolved per-URI, so the
  //    same tasks run against file://, hdfs://, s3a://, ... (never java.nio,
  //    which only reaches a driver-local or shared-POSIX path). The driver's
  //    Hadoop configuration ships into the tasks as plain properties — a
  //    bare executor-side `new Configuration()` would drop `spark.hadoop.*`
  //    overrides (object-store credentials) and re-parse XML per sidecar.

  private def hPath(baseUri: String, relPath: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      s"$baseUri/.graft/blooms/${sidecarName(relPath)}")

  private def writeSidecar(baseUri: String, relPath: String, bf: BloomFilter,
      hadoopProps: Map[String, String]): Unit = {
    val target = hPath(baseUri, relPath)
    val conf = Services.executorHadoopConf(hadoopProps)
    val fs = target.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(
      target.toString + "." + java.util.UUID.randomUUID + ".tmp")
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val out = fs.create(tmp, true)
    try out.write(bos.toByteArray) finally out.close()
    // atomic publish on HDFS/local; an existing target (idempotent replay
    // of the same write) is replaced
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target)) { fs.delete(tmp, false) }
  }

  private def readSidecar(baseUri: String, relPath: String,
      hadoopProps: Map[String, String]): BloomFilter = {
    val p = hPath(baseUri, relPath)
    val fs = p.getFileSystem(Services.executorHadoopConf(hadoopProps))
    val in = fs.open(p)
    try BloomFilter.readFrom(in) finally in.close()
  }

  /** Build + persist one bloom sidecar per freshly-written base file, in a
    * single distributed pass (key column + file name only). Sized by
    * config like the reference (60k entries, fpp 1e-9), not by a count
    * pass. Each executor task writes its own sidecar (tmp + atomic move) —
    * the filter bytes never travel to the driver.
    */
  def buildSidecars(spark: SparkSession, base: Path, stats: Seq[WriteStat],
      cfg: TableConfig): Unit = {
    val baseStats = stats.filterNot(_.isDelta).filter(_.numWrites > 0)
    if (baseStats.isEmpty) return
    val entries = cfg.propLong(ConfigKeys.BloomNumEntries, ConfigKeys.DefaultBloomNumEntries)
    val fpp = cfg.prop(ConfigKeys.BloomFpp, ConfigKeys.DefaultBloomFpp).toDouble
    // map the scan's file URI back to the table-relative path
    val byUri = baseStats.map { ws =>
      base.resolve(ws.path).toUri.getPath -> ws.path
    }.toMap
    val paths = baseStats.map(ws => base.resolve(ws.path).toString)
    val baseUri = Storage.qualified(base).toString.stripSuffix("/")
    // pre-create through the table's FileSystem (not java.nio: the bloom
    // dir must exist on whatever store backs the table), so executor
    // tasks only ever create files
    val dirPath = new org.apache.hadoop.fs.Path(s"$baseUri/.graft/blooms")
    dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(dirPath)
    val hProps = Services.shippedHadoopProps(spark)
    val bcByUri = spark.sparkContext.broadcast(byUri)
    import spark.implicits._
    // one write's base files share a format; read key column natively.
    // _metadata.file_path (not input_file_name) keeps this scan immune to
    // CacheManager substitution of a user-cached scan of the same files
    spark.read.format(WritePipeline.formatOf(baseStats.head.path)).load(paths: _*)
      .select(col(MetaCols.RecordKey).as[String],
        // strip scheme://authority so the key matches toUri.getPath on any
        // store; "file:/x" (no authority) collapses to "/x"
        regexp_replace(regexp_replace(col("_metadata.file_path"),
          "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""), "^file:/+", "/").as[String])
      .groupByKey(_._2)
      .mapGroups { (file, it) =>
        val bf = BloomFilter.create(entries, fpp)
        it.foreach(r => bf.putString(r._1))
        bcByUri.value.get(file).foreach(rel => writeSidecar(baseUri, rel, bf, hProps))
        1
      }
      .count() // action: triggers the distributed build+publish
    bcByUri.destroy()
  }

  /** Prune range-surviving candidate files by probing incoming keys
    * against their bloom sidecars. Files without a sidecar (pre-BLOOM
    * commits, bootstrap-adopted externals) are kept unconditionally.
    * `global = true` is the GLOBAL_BLOOM analog (reference
    * SparkHoodieGlobalBloomIndex): keys are probed against EVERY
    * partition's filters, not just their own partition's.
    * Returns the candidates worth scanning for the index join.
    */
  def prune(spark: SparkSession, base: Path, incoming: DataFrame,
      candidates: Seq[FileEntry], global: Boolean = false): Seq[FileEntry] = {
    if (candidates.isEmpty) return candidates
    // one FileSystem listing of the bloom dir (not a per-candidate exists
    // probe — 10^6 candidates would mean 10^6 store RPCs), through the
    // Hadoop FS so the same driver code runs against any backing store
    val baseUri0 = Storage.qualified(base).toString.stripSuffix("/")
    val dirPath = new org.apache.hadoop.fs.Path(s"$baseUri0/.graft/blooms")
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val present: Set[String] =
      if (!fs.exists(dirPath)) Set.empty
      else fs.listStatus(dirPath).iterator.map(_.getPath.getName).toSet
    val (withBloom, without) = candidates.partition(e =>
      present.contains(sidecarName(e.relPath)))
    if (withBloom.isEmpty) return candidates
    // narrow metadata only: (partition, minKey, maxKey, sidecar rel path)
    val meta = withBloom.map(e => (e.partitionPath, e.minKey, e.maxKey, e.relPath))
    val bc = spark.sparkContext.broadcast(meta)
    val baseUri = Storage.qualified(base).toString.stripSuffix("/")
    val hProps = Services.shippedHadoopProps(spark)
    import spark.implicits._
    val isGlobal = global // stable local for the closure
    val keyed =
      if (global)
        incoming.select(lit("").as[String], col(MetaCols.RecordKey).as[String])
      else
        incoming.select(col(MetaCols.PartitionPath).as[String],
          col(MetaCols.RecordKey).as[String])
    // explode candidate (sidecar, key) pairs after the range check — the
    // same candidate explosion the reference performs; pairs are two short
    // strings, so the shuffle stays proportional to keys × avg overlap
    val pairs = keyed.mapPartitions { it =>
      val all = bc.value
      val byPart = all.groupBy(_._1)
      it.flatMap { case (p, k) =>
        val cands = if (isGlobal) all else byPart.getOrElse(p, Seq.empty)
        cands.iterator
          .filter { case (_, mn, mx, _) =>
            mn.isEmpty || mx.isEmpty ||
              (graft.core.Utf8Order.lteq(mn, k) && graft.core.Utf8Order.lteq(k, mx))
          }
          .map { case (_, _, _, rel) => (rel, k) }
      }
    }
    // one sidecar load per file, executor-side, any-hit short-circuit
    val hitRels = pairs
      .groupByKey(_._1)
      .flatMapGroups { (rel, it) =>
        val bf = readSidecar(baseUri, rel, hProps)
        if (it.exists(t => bf.mightContainString(t._2))) Iterator.single(rel)
        else Iterator.empty
      }
      .collect().toSet
    bc.destroy()
    withBloom.filter(e => hitRels.contains(e.relPath)) ++ without
  }
}
