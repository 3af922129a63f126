package graft.pipeline

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{CommitMetadata, TableConfig, TableType}
import graft.read.Readers
import graft.table.GraftTable

/** INCREMENTAL MinHash-LSH deduplication as a table service: maintain a
  * near-dup-free `clean` table from an append-shaped `source` documents
  * table, with per-tick cost proportional to the NEW data — the shape a
  * 100 TB training-data dedup actually runs as (a from-scratch
  * [[Dedup.minhashDedup]] over the corpus per arrival batch would be
  * O(corpus) per tick).
  *
  * The LSH state persists in two graft tables under `indexPath`:
  *
  *  - `bands` (band, bucket, doc_id) — every band row of every doc EVER
  *    SEEN (kept and dropped: from-scratch semantics drop a doc that
  *    near-dups ANY lower-id doc, surviving or not, so dropped docs keep
  *    vetoing their later near-dups). PARTITIONED BY `pmod(bucket, P)`:
  *    a tick's probe computes its distinct bucket hashes and reads ONLY
  *    the matching partitions — plan-time pruning bounds probe IO by the
  *    tick's band fan-out, not the corpus.
  *  - `sigs` (doc_id, sig) — signatures for candidate verification,
  *    partitioned by `pmod(doc_id, SP)` for the same pruned lookup of
  *    the candidate ids' signatures.
  *
  * Each tick: incremental-pull new docs since the checkpoint → candidate
  * pairs from (a) an in-batch band self-join and (b) a pruned probe of
  * the persisted band index → signature-similarity verification → losers
  * dropped, survivors upserted into `clean` with the source checkpoint in
  * the SAME commit metadata (crash-atomic), and all pulled docs' band
  * rows + signatures appended to the index.
  *
  * Crash safety: index appends land BEFORE the clean commit; a replayed
  * tick re-pulls the same range (checkpoint unchanged), and duplicate
  * band/sig rows are harmless — candidate pairs dedup before
  * verification, replayed self-postings are anti-joined out of the index
  * probe, in-batch `l < r` excludes self-pairs, and the clean upsert is
  * keyed. So the service is effectively-once without multi-table
  * transactions.
  *
  * Result contract: when batches arrive in nondecreasing `idCol` order
  * (the natural contract for monotonic ingest ids), the clean table is
  * BIT-IDENTICAL to a from-scratch `Dedup.minhashDedup` of the full
  * corpus — verified by the DuckDB oracle. Out-of-order arrival is
  * first-seen-wins: an already-indexed doc vetoes any later near-dup
  * arrival regardless of id order (stored postings are anti-joined
  * against the batch's own ids first, keeping crash replay idempotent),
  * so the clean table stays near-dup-free either way.
  */
object DedupService {

  val CheckpointKey = "graft.dedup.source.checkpoint"
  private val BucketPartsKey = "graft.dedup.bucket.partitions"
  private val SigPartsKey = "graft.dedup.sig.partitions"
  private val ThresholdKey = "graft.dedup.threshold"
  private val NumHashesKey = "graft.dedup.num.hashes"
  private val BandsKey = "graft.dedup.bands"
  private val ShingleKey = "graft.dedup.shingle.n"

  final case class DedupIndex(bands: GraftTable, sigs: GraftTable) {
    def bucketParts: Int = bands.cfg.propLong(BucketPartsKey, 64L).toInt
    def sigParts: Int = sigs.cfg.propLong(SigPartsKey, 32L).toInt
    def threshold: Double = bands.cfg.prop(ThresholdKey, "0.7").toDouble
    def numHashes: Int = bands.cfg.propLong(NumHashesKey, 64L).toInt
    def numBands: Int = bands.cfg.propLong(BandsKey, 16L).toInt
    def shingleN: Int = bands.cfg.propLong(ShingleKey, 3L).toInt
  }

  /** Create (or load) the persisted LSH index tables under `indexPath`.
    * ALL matching parameters persist as index-table properties and every
    * tick reads them back — old ticks' signatures and band rows were
    * computed with them, so a drifting per-call parameter would silently
    * corrupt results. Loading an existing index ignores the arguments and
    * returns the stored parameters.
    */
  def openIndex(spark: SparkSession, indexPath: String,
      bucketParts: Int = 64, sigParts: Int = 32,
      threshold: Double = 0.7, numHashes: Int = 64, bands: Int = 16,
      shingleN: Int = 3): DedupIndex = {
    val bandsT = GraftTable.createOrLoad(spark, s"$indexPath/bands", TableConfig(
      "dedup_bands", TableType.CopyOnWrite,
      Seq("band", "bucket", "doc_id"),
      s"concat('p=', cast(pmod(bucket, $bucketParts) as string))", "",
      Map(BucketPartsKey -> bucketParts.toString,
        ThresholdKey -> threshold.toString, NumHashesKey -> numHashes.toString,
        BandsKey -> bands.toString, ShingleKey -> shingleN.toString)))
    val sigsT = GraftTable.createOrLoad(spark, s"$indexPath/sigs", TableConfig(
      "dedup_sigs", TableType.CopyOnWrite,
      Seq("doc_id"),
      s"concat('s=', cast(pmod(doc_id, $sigParts) as string))", "",
      Map(SigPartsKey -> sigParts.toString)))
    DedupIndex(bandsT, sigsT)
  }

  /** Newest source rollback/restore instant observed at sync time. */
  val RewindSeenKey = "graft.dedup.source.rewind.seen"

  def lastCheckpoint(clean: GraftTable): Option[String] = syncMarks(clean)._1

  private def syncMarks(clean: GraftTable): (Option[String], String) =
    clean.timeline.completedDataInstants().reverse.iterator
      .map(i => CommitMetadata.fromJson(clean.timeline.readContent(i)).extraMetadata)
      .collectFirst { case m if m.contains(CheckpointKey) =>
        (m.get(CheckpointKey), m.getOrElse(RewindSeenKey, "")) }
      .getOrElse((None, ""))

  /** One tick. Returns the clean-table commit ts, or None when the source
    * has nothing new. Matching parameters come from the INDEX (persisted
    * at openIndex), so they cannot drift between ticks.
    */
  def sync(source: GraftTable, clean: GraftTable, index: DedupIndex,
      textCol: String = "text", idCol: String = "doc_id"): Option[String] = {
    val (threshold, numHashes, bands, shingleN) =
      (index.threshold, index.numHashes, index.numBands, index.shingleN)
    val spark = source.spark
    val head = source.timeline.completedDataInstants().lastOption.map(_.ts)
      .getOrElse(return None)
    val (ckpt0, rewindSeen) = syncMarks(clean)
    val rewindNow = graft.table.MaterializedView.lastRewind(source, includeArchived = true)
    val rewound = rewindNow > rewindSeen
    if (ckpt0.contains(head) && !rewound) return None
    // rollback recovery: ghost postings would mark new docs as dups of
    // rolled-back docs, and the clean table keeps their outputs — wipe
    // index + clean once and rebuild from the surviving snapshot. A crash
    // mid-recovery re-enters here (marks only publish with the rebuild's
    // clean commit), so the wipe is replay-safe.
    val ckpt = if (rewound && ckpt0.isDefined) {
      Seq(clean, index.bands, index.sigs)
        .filter(_.timeline.completedDataInstants().nonEmpty)
        .foreach(_.truncate())
      None
    } else ckpt0
    val marks = Map(CheckpointKey -> head, RewindSeenKey -> rewindNow)
    val rows = numHashes / bands

    val pulledRaw = ckpt match {
      case None => Readers.snapshot(source, asOf = Some(head))
      case Some(b) => Readers.incremental(source, b, Some(head))
    }
    val dataCols = pulledRaw.columns.filterNot(graft.core.MetaCols.All.contains)
    val pulled = pulledRaw.select(dataCols.toIndexedSeq.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // signatures once per doc (native expression), band rows id-only —
      // the same shuffle discipline as Dedup.minhashDupPairs
      val sig = pulled
        .select(col(idCol).as("_d_id"), col(textCol).as("_d_t"))
        .repartition(col("_d_id"))
        .select(col("_d_id"),
          graft.functions.MinHashSig.minhashSig(col("_d_t"), numHashes, shingleN).as("_d_sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bandRows = sig.select(col("_d_id"),
          explode(Dedup.lshBands(col("_d_sig"), bands, rows)).as("_d_band"))
        .select(col("_d_id"),
          col("_d_band.band").as("band"), col("_d_band.bucket").as("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // (a) in-batch candidates: band equi-self-join, each pair once
        val l = bandRows.select(col("band"), col("bucket"), col("_d_id").as("_l_id"))
        val r = bandRows.select(col("band"), col("bucket"), col("_d_id").as("_r_id"))
        val batchPairs = l.join(r, Seq("band", "bucket"))
          .filter(col("_l_id") < col("_r_id"))
          .select("_l_id", "_r_id")

        // (b) corpus candidates: probe ONLY the index partitions this
        // tick's buckets hash into (plan-time pruning). Postings whose
        // doc_id is in the CURRENT batch are anti-joined away first —
        // they exist only when a crashed tick's index append replays, and
        // without the exclusion a replayed doc would veto itself (and its
        // same-batch companions, in both directions). With self-postings
        // gone, a stored doc vetoes a new arrival REGARDLESS of id order
        // (no l < r here): first-seen-wins, so a late arrival with a
        // lower id than its already-indexed near-dup still drops and the
        // clean table stays near-dup-free. In-batch ties keep min-id via (a).
        val indexPairs =
          if (index.bands.timeline.completedDataInstants().isEmpty) None
          else {
            val parts = bandRows
              .select(pmod(col("bucket"), lit(index.bucketParts.toLong)).as("p"))
              .distinct().collect().map(x => s"p=${x.getLong(0)}").toSeq
            val batchIds = sig.select(col("_d_id").as("doc_id")).distinct()
            val stored = Readers.snapshot(index.bands, partitions = Some(parts))
              .join(batchIds, Seq("doc_id"), "left_anti")
              .select(col("band"), col("bucket"), col("doc_id").as("_l_id"))
            Some(stored.join(
                bandRows.select(col("band"), col("bucket"), col("_d_id").as("_r_id")),
                Seq("band", "bucket"))
              .select("_l_id", "_r_id"))
          }
        val pairs = indexPairs.map(batchPairs.unionByName(_)).getOrElse(batchPairs)
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

        // l-side signatures: from the batch, else from the sigs table
        // pruned to the candidate ids' partitions
        val dups = try {
          val lIds = pairs.select(col("_l_id")).distinct()
          val missing = lIds.join(sig.select(col("_d_id").as("_l_id")), Seq("_l_id"), "left_anti")
            .select(pmod(col("_l_id"), lit(index.sigParts.toLong)).as("p"))
            .distinct().collect().map(x => s"s=${x.getLong(0)}").toSeq
          val storedSigs =
            if (missing.isEmpty || index.sigs.timeline.completedDataInstants().isEmpty)
              sig.select(col("_d_id"), col("_d_sig"))
            else Readers.snapshot(index.sigs, partitions = Some(missing))
              .select(col("doc_id").as("_d_id"), col("sig").as("_d_sig"))
              .unionByName(sig.select(col("_d_id"), col("_d_sig")))
          pairs
            .join(storedSigs.select(col("_d_id").as("_l_id"), col("_d_sig").as("_l_sig")), Seq("_l_id"))
            .join(sig.select(col("_d_id").as("_r_id"), col("_d_sig").as("_r_sig")), Seq("_r_id"))
            .filter(Dedup.signatureSimilarity(col("_l_sig"), col("_r_sig")) >= threshold)
            .select(col("_r_id").as("_dup_id")).distinct()
            .localCheckpoint(eager = true)
        } finally pairs.unpersist()

        val survivors = pulled.join(dups, col(idCol) === col("_dup_id"), "left_anti")

        // index appends FIRST (crash-replay safe — see scaladoc), then the
        // clean commit carries the checkpoint
        index.bands.insert(bandRows.select(
          col("band"), col("bucket"), col("_d_id").as("doc_id")))
        index.sigs.insert(sig.select(col("_d_id").as("doc_id"), col("_d_sig").as("sig")))
        Some(clean.upsert(survivors, extraMetadata = marks))
      } finally { bandRows.unpersist(); sig.unpersist() }
    } finally pulled.unpersist()
  }
}
