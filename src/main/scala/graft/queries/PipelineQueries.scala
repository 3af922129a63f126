package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline._

/** LLM-data-pipeline catalog: dedup family, similarity search, text
  * analysis, multimodal plumbing over the `documents`/`embeddings` tables.
  * EVERY entry carries a DuckDB oracle — including the probabilistic
  * operators: their hashing is portable arithmetic (FNV-1a64 / md5), so
  * the oracle replays signatures, band membership, hyperplanes and IVF
  * seeding exactly rather than settling for a rows-only check.
  */
object PipelineQueries {
  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")
  private def embs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/embeddings.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: planted byte-identical copies must vanish, originals stay
    "p_dedup_exact" -> ((s, d) => {
      val base = docs(s, d)
      val planted = base.filter(col("doc_id") % 3 === 0)
        .withColumn("doc_id", col("doc_id") + 10000000L)
      Dedup.exact(base.unionByName(planted))
    }),

    "p_dedup_minhash" -> ((s, d) =>
      Dedup.minhashDedup(docs(s, d), threshold = 0.6)),

    // transitive clustering over the same near-dup pair graph: connected
    // components by min-label propagation, (doc_id, cluster_id = min id)
    "p_dedup_cluster" -> ((s, d) =>
      Dedup.minhashClusters(docs(s, d), threshold = 0.6)),

    // INCREMENTAL dedup service: the corpus arrives in three id-ordered
    // batches; each tick probes the persisted LSH band index (pruned to
    // the tick's bucket partitions) instead of re-scanning the corpus.
    // The final clean table must be BIT-IDENTICAL to the from-scratch
    // minhash dedup — same oracle as p_dedup_minhash.
    "p_dedup_incremental" -> ((s, d) => {
      import graft.core.{TableConfig, TableType}
      import graft.table.{GraftTable, WritePipeline}
      val base = docs(s, d)
      val root = s"/tmp/graft_q/dedup_incr_${Integer.toHexString(d.hashCode)}"
      WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(root))
      val docsCfg = TableConfig("docs_src", TableType.CopyOnWrite, Seq("doc_id"), "", "")
      val srcT = GraftTable.create(s, s"$root/source", docsCfg)
      val cleanT = GraftTable.create(s, s"$root/clean", docsCfg.copy(tableName = "docs_clean"))
      val idx = DedupService.openIndex(s, s"$root/index", threshold = 0.6)
      val mx = base.agg(max("doc_id")).head().getLong(0)
      val ticks = Seq(
        base.filter(col("doc_id") <= mx / 3),
        base.filter(col("doc_id") > mx / 3 && col("doc_id") <= 2 * mx / 3),
        base.filter(col("doc_id") > 2 * mx / 3))
      for (tick <- ticks) {
        srcT.bulkInsert(tick)
        DedupService.sync(srcT, cleanT, idx)
      }
      graft.read.Readers.snapshot(cleanT)
        .select("doc_id", "text", "lang", "source", "n_chars")
    }),

    // incremental IMAGE dedup SERVICE: pHash variant of the minhash
    // service — per-tick banded-index probe, checkpoint-in-commit,
    // first-seen-wins. Families arrive whole (family f lands in the tick
    // of f % 4), so the steady state equals from-scratch: exactly the 16
    // family-minimum docs survive — which is pure doc_id arithmetic for
    // the oracle
    "p_image_dedup_incremental" -> ((s, d) => {
      import graft.core.{TableConfig, TableType}
      import graft.table.{GraftTable, WritePipeline}
      val base = docs(s, d).select("doc_id", "lang", "source")
      val root = s"/tmp/graft_q/img_dedup_svc_${Integer.toHexString(d.hashCode)}"
      WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(root))
      val cfgT = TableConfig("img_src", TableType.CopyOnWrite, Seq("doc_id"), "", "")
      val srcT = GraftTable.create(s, s"$root/source", cfgT)
      val cleanT = GraftTable.create(s, s"$root/clean", cfgT.copy(tableName = "img_clean"))
      val idx = HashDedupService.openIndex(s, s"$root/index")
      val hashOf = (df: org.apache.spark.sql.DataFrame) =>
        ImageHash.phashImages(ImageHash.withSyntheticPng(df, fams = 16))
          .withColumnRenamed("phash", "hash")
      for (tick <- Seq(base.filter(col("doc_id") % 4 =!= 0),
          base.filter(col("doc_id") % 4 === 0))) {
        srcT.upsert(tick)
        HashDedupService.sync(srcT, cleanT, idx, hashOf)
      }
      graft.read.Readers.snapshot(cleanT).select("doc_id", "lang", "source")
    }),

    // best-copy selection: one representative per near-dup cluster, by
    // quality score (ties to lowest id) — what a training pipeline keeps
    "p_dedup_representatives" -> ((s, d) =>
      Dedup.clusterRepresentatives(docs(s, d),
        TextStats.qualityScore(col("text")), threshold = 0.6)),

    "p_dedup_simhash" -> ((s, d) =>
      Dedup.simhashDedup(docs(s, d), maxDistance = 2)),

    "p_dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardDedup(docs(s, d), threshold = 0.8)),

    "p_dedup_embedding" -> ((s, d) => {
      val base = embs(s, d)
      val planted = base.filter(col("vec_id") % 5 === 0)
        .withColumn("vec_id", col("vec_id") + 10000000L)
      // project the array column out of the result: the gate's pandas
      // row-sort can't hash ndarrays (round-1 checker crash)
      Dedup.embeddingDedup(base.unionByName(planted), threshold = 0.999)
        .select(col("vec_id"), col("label"))
    }),

    // text stats with exact SQL twins
    "p_text_stats" -> ((s, d) => {
      val t = col("text")
      docs(s, d).select(
        col("doc_id"),
        TextStats.tokenCount(t).as("n_tokens"),
        TextStats.bpeishTokenCount(t).cast("long").as("n_bpeish"),
        TextStats.charCount(t).as("n_chars_m"),
        round(TextStats.digitRatio(t), 4).as("digit_ratio"),
        round(TextStats.avgWordLen(t), 4).as("avg_word_len"))
    }),

    // heuristic scores — deterministic arithmetic, oracled in full SQL
    "p_text_quality_lang" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        TextStats.qualityScore(col("text")).as("quality"),
        TextStats.langId(col("text")).as("lang_pred"),
        TextStats.fingerprintHex(col("text")).as("fingerprint"))),

    // Unicode script profiling: per-script letter shares over planted
    // multilingual snippets (Cyrillic / Han / Arabic appended to the
    // ASCII doc body) — counts replay in DuckDB via RE2 script classes;
    // the dominant script of the planted snippet is stated literally
    "p_text_scripts" -> ((s, d) => {
      val snippet = when(col("doc_id") % 4 === 0,
          lit(" \u043F\u0440\u0438\u0432\u0435\u0442 \u043C\u0438\u0440"))
        .when(col("doc_id") % 4 === 1, lit(" \u4F60\u597D\u4E16\u754C"))
        .when(col("doc_id") % 4 === 2,
          lit(" \u0645\u0631\u062D\u0628\u0627 " +
            "\u0628\u0627\u0644\u0639\u0627\u0644\u0645"))
        .otherwise(lit(""))
      val p = TextStats.scriptProfile(concat(col("text"), snippet))
      docs(s, d).select(col("doc_id"),
        p.getField("n_letters").as("n_letters"),
        p.getField("latin").as("latin_frac"),
        p.getField("cyrillic").as("cyr_frac"),
        p.getField("han").as("han_frac"),
        p.getField("arabic").as("arab_frac"),
        TextStats.dominantScript(snippet).as("dom_planted"))
    }),

    // exact ANN baseline: cosine top-k for three fixed query vectors
    "p_ann_bruteforce" -> ((s, d) => {
      val all = embs(s, d)
        .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      val queries = all.filter(col("vec_id") < 3)
      Similarity.bruteForceTopK(all, queries, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    // embedding covariance matrix (the corpus-sized pass under PCA):
    // upper-triangle (i, j, cov) from decimal-quantized product sums —
    // aggregation-order independent, the oracle replays every entry.
    // The d×d result is dimension-bounded, never corpus-bounded; the
    // eigensolve on top is Pca.fit (PcaSpec)
    "p_embed_covariance" -> ((s, d) =>
      Pca.covarianceExact(embs(s, d))),

    // int8 scalar quantization of the embedding corpus: per-vector
    // parameters + integer code stats (exact) — the stored-index shape
    // that cuts first-pass ANN scan bytes 4×
    "p_embed_quantize" -> ((s, d) => {
      val all = embs(s, d)
        .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      val q = Similarity.quantize(col("embedding"))
      all.select(
        col("vec_id"),
        q.getField("lo").as("lo"),
        q.getField("step").as("step"),
        aggregate(q.getField("codes"), lit(0L), (acc, c) => acc + c).as("code_sum"),
        array_min(q.getField("codes")).as("code_min"),
        array_max(q.getField("codes")).as("code_max"))
    }),

    // two-stage quantized ANN: coarse top-40 on dequantized int8 codes,
    // exact rescore to top-10
    "p_ann_quantized" -> ((s, d) => {
      val all = embs(s, d)
        .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      Similarity.quantizedTopK(all, all.filter(col("vec_id") < 3), k = 10, oversample = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    // double math end-to-end (like the brute-force baseline) so the
    // DuckDB oracle's IEEE arithmetic matches bit for bit
    "p_ann_lsh" -> ((s, d) => {
      val all = embs(s, d)
        .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      Similarity.lshTopK(all, all.filter(col("vec_id") < 3), k = 10,
          planes = 8, probeBits = 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    "p_ann_ivf" -> ((s, d) => {
      val all = embs(s, d)
        .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      val (assignments, centroids) = Similarity.ivfBuild(all, nlist = 16)
      Similarity.ivfTopK(assignments, centroids, all.filter(col("vec_id") < 3),
          k = 10, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    // index-as-a-table: same IVF math, but the index persists in graft
    // tables (assignments partitioned by centroid — searches prune to the
    // probed partitions) and the search runs against the stored snapshot
    "p_ann_ivf_table" -> ((s, d) => {
      val all = embs(s, d)
        .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      val p = s"/tmp/graft_q/ann_ivf_idx_${Integer.toHexString(d.hashCode)}"
      graft.table.WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(p))
      val idx = VectorIndex.buildIvf(s, p, all, nlist = 16)
      VectorIndex.ivfSearch(idx, all.filter(col("vec_id") < 3), k = 10, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    // product quantization: 8 subspaces × 32 codewords over the 64-dim
    // corpus (32× storage compression at float32); ADC top-10 for three
    // queries — every codeword pick, per-subspace assignment and
    // decimal-quantized distance sum replays in the oracle
    "p_ann_pq" -> ((s, d) => {
      val all = embs(s, d)
        .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      val books = Similarity.pqTrain(all, m = 8, ksub = 32)
      val codes = Similarity.pqEncode(all, books, m = 8)
      Similarity.pqTopK(codes, books, all.filter(col("vec_id") < 3), k = 10, m = 8)
        .select(col("query_id"), col("neighbor_id"), col("adist"), col("rank"))
    }),

    // IVF-PQ composition (the FAISS IVFPQ layout): coarse probes prune to
    // 4 of 16 clusters, ADC scans only their byte codes — the
    // billion-scale shape where query IO is nprobe/nlist of the codes,
    // never the floats
    "p_ann_ivfpq" -> ((s, d) => {
      val all = embs(s, d)
        .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      val (assignments, centroids) = Similarity.ivfBuild(all, nlist = 16)
      val books = Similarity.pqTrain(all, m = 8, ksub = 32)
      val codes = Similarity.pqEncode(all, books, m = 8)
      Similarity.ivfPqTopK(assignments, centroids, codes, books,
          all.filter(col("vec_id") < 3), k = 10, m = 8, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("adist"), col("rank"))
    }),

    // ANN quality metric: per-query recall@10 of the nprobe=2 IVF probe
    // against the exact cosine baseline — the tuning loop for
    // nprobe/planes/ksub runs as a corpus-size-independent query
    "p_ann_recall" -> ((s, d) => {
      val all = embs(s, d)
        .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      val (assignments, centroids) = Similarity.ivfBuild(all, nlist = 16)
      val approx = Similarity.ivfTopK(assignments, centroids,
        all.filter(col("vec_id") < 3), k = 10, nprobe = 2)
      val exact = Similarity.bruteForceTopK(all, all.filter(col("vec_id") < 3), k = 10)
      Similarity.recallAtK(approx, exact, 10)
    }),

    // image near-dup dedup: REAL PNG render → javax.imageio decode →
    // 32×32 DCT pHash → banded Hamming join → transitive clusters. The
    // images are deterministic: doc_id % 16 picks a noise family (~32-bit
    // cross-family pHash distance), doc_id/16 % 3 a small edit (≤2-3 bit
    // within-family distance), so the cluster representative provably
    // equals min(doc_id) within the family — which is what the oracle
    // recomputes from doc_id arithmetic alone
    "p_image_phash_dedup" -> ((s, d) => {
      val imgs = ImageHash.withSyntheticPng(docs(s, d), fams = 16)
      ImageHash.phashClusters(imgs)
        .select(col("doc_id"), col("cluster_id").as("rep_id"))
    }),

    // audio near-dup dedup: REAL RIFF/WAVE PCM render → javax.sound
    // decode → 64-bit energy-contour fingerprint → banded Hamming join →
    // transitive clusters; family/variant construction and oracle shape
    // as p_image_phash_dedup (doc_id % 12 families)
    "p_audio_fp_dedup" -> ((s, d) => {
      val clips = AudioHash.withSyntheticWav(docs(s, d), fams = 12)
      AudioHash.audioClusters(clips)
        .select(col("doc_id"), col("cluster_id").as("rep_id"))
    }),

    // video container metadata: REAL ISO-BMFF (MP4) box parsing — the
    // blobs are valid ftyp+moov trees built from doc_id arithmetic, so
    // the oracle recomputes duration/dimensions without touching bytes
    "p_video_meta" -> ((s, d) => {
      import s.implicits._
      val blobs = docs(s, d).select(col("doc_id").cast("long")).as[Long]
        // pinned count (REPARTITION_BY_NUM): a bare repartition(col) is an
        // AQE coalescing candidate sized by the shuffle's BYTES — a few KB
        // of ids — so the whole downstream codec pass ran in ONE task
        // (measured 4.4s -> 0.9s at sf0.1); defaultParallelism scales with
        // the cluster instead of hard-coding a local figure
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .mapPartitions(it => it.map { id =>
          (id, Multimodal.syntheticMp4(1000L + (id % 977L) * 10L,
            (320 + (id % 7) * 16).toInt, (240 + (id % 5) * 16).toInt))
        }).toDF("doc_id", "content")
      Multimodal.videoMeta(blobs).toDF()
        .select(col("id").as("doc_id"), col("durationMs").as("duration_ms"),
          col("width"), col("height"),
          col("videoTracks").as("video_tracks"), col("brand"))
    }),

    // REAL video frame decode: deterministic MJPEG-AVI blobs (2 + id%4
    // JPEG noise frames at a doc_id-derived square size, 25 fps) → RIFF
    // movi walk → ImageIO JPEG decode; the oracle recomputes frame
    // count / timestamps / decoded dimensions from doc_id arithmetic —
    // an exact end-to-end check of container walk + pixel decode
    "p_video_frames" -> ((s, d) => {
      import s.implicits._
      val blobs = docs(s, d).select(col("doc_id").cast("long")).as[Long]
        // pinned count (REPARTITION_BY_NUM): a bare repartition(col) is an
        // AQE coalescing candidate sized by the shuffle's BYTES — a few KB
        // of ids — so the whole downstream codec pass ran in ONE task
        // (measured 4.4s -> 0.9s at sf0.1); defaultParallelism scales with
        // the cluster instead of hard-coding a local figure
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .mapPartitions(it => it.map { id =>
          val n = (2 + id % 4).toInt
          val sz = (48 + (id % 4) * 16).toInt
          (id, Multimodal.syntheticMjpegAvi(
            (0 until n).map(i => Multimodal.syntheticJpegFrame(id, i, sz)),
            sz, sz))
        }).toDF("doc_id", "content")
      Multimodal.videoFrames(blobs).toDF()
        .select(col("id").as("doc_id"), col("frameIdx").as("frame_idx"),
          col("tsMillis").as("ts_ms"), col("width"), col("height"))
    }),

    // multimodal plumbing: schema-correct decode over binary columns
    "p_multimodal_decode" -> ((s, d) => {
      val blobs = Multimodal.withFakeBinary(docs(s, d), "doc_id")
      Multimodal.decodeImages(blobs).toDF()
        .select(col("id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.format").as("format"),
          col("byteLen").as("byte_len"))
    }),

    // incremental sessionization SERVICE: events land in a bucket-
    // partitioned graft table in two batches; each sync incrementally
    // pulls new commits, recomputes ONLY the affected entity buckets from
    // the pruned snapshot, and publishes one partition-replacing commit.
    // The final sessions table must equal a from-scratch sessionization —
    // the oracle replays exactly that
    "p_sessionize_incremental" -> ((s, d) => {
      import graft.core.{TableConfig, TableType}
      import graft.table.{GraftTable, WritePipeline}
      val ev = QUtil.events(s, d).select("event_id", "ts", "user_id", "value")
      val root = s"/tmp/graft_q/sess_svc_${Integer.toHexString(d.hashCode)}"
      WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(root))
      val evT = GraftTable.create(s, s"$root/events", TableConfig(
        "sess_events", TableType.CopyOnWrite, Seq("event_id"), "pmod(user_id, 16)", ""))
      val ssT = GraftTable.create(s, s"$root/sessions", TableConfig(
        "sessions", TableType.CopyOnWrite, Seq("user_id", "session_seq"),
        "pmod(user_id, 16)", ""))
      evT.bulkInsert(ev.filter(col("event_id") % 4 =!= 0))
      SessionService.sync(evT, ssT, buckets = 16)
      evT.upsert(ev.filter(col("event_id") % 4 === 0))
      SessionService.sync(evT, ssT, buckets = 16)
      graft.read.Readers.snapshot(ssT)
        .select(col("user_id"), col("session_seq"), col("n_events"),
          date_format(col("start_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("start_s"),
          date_format(col("end_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_s"),
          col("total_value"), col("duration_s"))
    }),

    // time-series gap-fill: per-user daily aggregates with EXPLICIT zero
    // rows for silent days inside the user's activity span — the dense
    // axis generates distributed from a row-local sequence() explode
    "p_gap_fill_daily" -> ((s, d) =>
      Resample.gapFillDaily(QUtil.events(s, d))
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_events"), col("sum_value"))),

    // gap-based sessionization: one shuffle on user, shared-sort windows
    "p_sessionize" -> ((s, d) =>
      Sessions.sessionStats(QUtil.events(s, d), maxGapSeconds = 1800)
        .select(col("user_id"), col("session_seq"),
          col("n_events"),
          date_format(col("start_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("start_s"),
          date_format(col("end_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_s"),
          col("total_value"), col("duration_s"))),

    // STREAMING exact dedup: first-seen-wins over a fingerprint-keyed
    // stream; with id-ordered batches the winners equal the batch exact
    // dedup (min id per fingerprint) — oracled as such
    "p_dedup_streaming" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StreamingDedup
      val all = docs(s, d)
      val keyed = all.select(col("doc_id"),
          TextStats.fingerprintHex(col("text")).as("fp"))
        .as[StreamingDedup.Keyed].collect().sortBy(_.doc_id)
      val n = keyed.length
      val (b1, rest) = keyed.splitAt(n / 3)
      val (b2, b3) = rest.splitAt(n / 3)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ms = MemoryStream[StreamingDedup.Keyed]
      val sink = s"dedup_stream_${java.util.UUID.randomUUID.toString.take(8)}"
      val q = StreamingDedup.dedupStream(ms.toDS())
        .toDF("doc_id")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        Seq(b1.toSeq, b2.toSeq, b3.toSeq).foreach { b =>
          ms.addData(b); q.processAllAvailable()
        }
      } finally q.stop()
      all.join(s.table(sink), Seq("doc_id"), "left_semi")
        .select("doc_id", "text", "lang", "source", "n_chars")
    }),

    // STREAMING image near-dup guard: banded-Hamming keyed state over the
    // pHash stream; with id-ordered batches the surviving docs equal the
    // batch answer — the 16 family minima (same construction and oracle
    // as the batch/incremental image gates). The collect is the replay
    // HARNESS feeding MemoryStream; the operator shuffles on (band,
    // slice) and keeps per-bucket state
    "p_image_dedup_streaming" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StreamingDedup
      val all = docs(s, d)
      val keyed = ImageHash.phashImages(ImageHash.withSyntheticPng(all, fams = 16))
        .select(col("doc_id"), col("phash").as("hash"))
        .as[StreamingDedup.HashKeyed].collect().sortBy(_.doc_id)
      val (b1, b2) = keyed.splitAt(keyed.length / 2)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ms = MemoryStream[StreamingDedup.HashKeyed]
      val sink = s"img_dedup_stream_${java.util.UUID.randomUUID.toString.take(8)}"
      val q = StreamingDedup.nearDupStream(ms.toDS())
        .toDF("doc_id")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        Seq(b1.toSeq, b2.toSeq).foreach { b => ms.addData(b); q.processAllAvailable() }
      } finally q.stop()
      all.join(s.table(sink), Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "source")
    }),

    // STATEFUL STREAMING sessionization: flatMapGroupsWithState over a
    // bounded replay (three event-time-ordered micro-batches + per-user
    // sentinel) must converge to the batch answer — same oracle as
    // p_sessionize. The driver-side collect is the replay HARNESS feeding
    // MemoryStream, not the operator: the sessionizer itself shuffles
    // only on user_id and keeps O(active users) state.
    "p_sessionize_streaming" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StatefulSessions
      import graft.streaming.StatefulSessions.Ev
      val evs = QUtil.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .as[Ev].collect().sortBy(e => (e.ts_us, e.event_id))
      val n = evs.length
      val (b1, rest) = evs.splitAt(n / 3)
      val (b2, b3) = rest.splitAt(n / 3)
      val sentinelTs = evs.map(_.ts_us).max + 86400000000L // +1 day >> gap
      val sentinels = evs.map(_.user_id).distinct
        .map(u => Ev(u, -1L, sentinelTs, 0.0)).toSeq
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ms = MemoryStream[Ev]
      val sink = s"sess_stream_${java.util.UUID.randomUUID.toString.take(8)}"
      val q = StatefulSessions.sessionize(ms.toDS(), gapSeconds = 1800L)
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        Seq(b1.toSeq, b2.toSeq, b3.toSeq, sentinels).foreach { b =>
          ms.addData(b); q.processAllAvailable()
        }
      } finally q.stop()
      s.table(sink).select(
        col("user_id"), col("session_seq"), col("n_events"),
        date_format(timestamp_micros(col("start_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("start_s"),
        date_format(timestamp_micros(col("end_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_s"),
        (col("total_scaled").cast("double") / 10000.0).as("total_value"),
        expr("CAST((end_us - start_us) DIV 1000000 AS BIGINT)").as("duration_s"))
    }),

    // STREAMING windowed aggregation: watermark + 1h tumbling windows in
    // append mode — finalized windows must equal the batch hourly rollup
    // (q13's oracle). A single far-future sentinel advances the watermark
    // past every real window; its own window never finalizes.
    "p_stream_windowed_agg" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val evs = QUtil.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_type"), col("value"))
        .as[(Long, Long, String, Double)].collect().sortBy(e => (e._2, e._1))
      val n = evs.length
      val (b1, rest) = evs.splitAt(n / 3)
      val (b2, b3) = rest.splitAt(n / 3)
      val sentinel = Seq((-1L, evs.map(_._2).max + 7200000000L, "zz_sentinel", 0.0))
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ms = MemoryStream[(Long, Long, String, Double)]
      val agg = ms.toDS().toDF("event_id", "ts_us", "event_type", "value")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:00:00").as("hour"),
          col("event_type"), col("n"), col("total_value"))
      val sink = s"win_stream_${java.util.UUID.randomUUID.toString.take(8)}"
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        Seq(b1.toSeq, b2.toSeq, b3.toSeq, sentinel).foreach { b =>
          ms.addData(b); q.processAllAvailable()
        }
      } finally q.stop()
      s.table(sink)
    }),

    // STREAM-STREAM interval self-join: views ⋈ clicks of the same user
    // within 30 minutes, both sides of one watermarked stream — the
    // time-range predicate bounds join state (Spark evicts rows older
    // than watermark - 30 min), so state is O(events in flight), not
    // O(stream). Append-mode inner join drained to equality with the
    // batch oracle by a far-future sentinel
    "p_stream_stream_join" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val evs = QUtil.events(s, d)
        .filter(col("event_type").isin("view", "click"))
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"))
        .as[(Long, Long, Long, String)].collect().sortBy(e => (e._2, e._1))
      val n = evs.length
      val (b1, rest) = evs.splitAt(n / 2)
      val sentinel = Seq((-1L, evs.map(_._2).max + 7200000000L, -1L, "zz_sentinel"))
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ms = MemoryStream[(Long, Long, Long, String)]
      val df = ms.toDS().toDF("event_id", "ts_us", "user_id", "event_type")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts", "0 seconds")
      val views = df.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
      val clicks = df.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("click_ts"))
      val joined = views.join(clicks,
          col("user_id") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("view_id"), col("click_id"), col("user_id"),
          (unix_micros(col("click_ts")) - unix_micros(col("view_ts"))).as("delay_us"))
      val sink = s"ssj_stream_${java.util.UUID.randomUUID.toString.take(8)}"
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        Seq(b1.toSeq, rest.toSeq, sentinel).foreach { b =>
          ms.addData(b); q.processAllAvailable()
        }
      } finally q.stop()
      s.table(sink)
    }),

    // as-of join (attribution): each click picks up the latest same-user
    // view at or before it — union + one ordered window, no range explosion
    "p_asof_join" -> ((s, d) => {
      val ev = QUtil.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("view_ts"))
      AsofJoin.asofJoin(clicks, views, Seq("user_id"), "ts", "view_ts",
          rightCols = Seq("view_id", "view_ts"), tieBreak = Seq("view_id"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
          col("view_id"),
          date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("view_ts_s"))
    }),

    // deterministic stratified sample: portable md5 bucket vs per-source
    // keep rates — membership replays row-for-row in any engine
    "p_sample_stratified" -> ((s, d) =>
      Sampling.stratifiedSample(docs(s, d), "source", "doc_id",
        rates = Map("src0" -> 0.25, "src1" -> 0.5, "src2" -> 0.75),
        defaultRate = 1.0)),

    // weight-targeted source mixing: keep rates derived so the output hits
    // the target proportions at the largest achievable size
    "p_sample_mix" -> ((s, d) =>
      Sampling.mixToWeights(docs(s, d), "source", "doc_id",
        weights = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25))),

    // temperature-scaled language mixing (mC4's alpha rule): alpha = 0.5
    // flattens the en-heavy language proportions toward uniform (the
    // smallest language binds at rate 1, the head downsamples to
    // sqrt-proportional) — rates derive from one count aggregation and
    // membership replays row-for-row
    "p_sample_temperature" -> ((s, d) =>
      Sampling.temperatureMix(docs(s, d), "lang", "doc_id", alpha = 0.5)),

    // content-stable train/valid/test split tags
    "p_train_test_split" -> ((s, d) =>
      Sampling.trainTestSplit(docs(s, d), "doc_id", testFrac = 0.1, validFrac = 0.1)
        .select(col("doc_id"), col("source"), col("split"))),

    // deterministic global corpus shuffle: dense epoch position from
    // md5(id, seed) — hex-prefix-bucketed total order, so no window ever
    // sees more than ~N/buckets rows (a bare row_number() OVER (ORDER BY)
    // would funnel the corpus through one partition)
    "p_corpus_shuffle" -> ((s, d) =>
      Sampling.globalShuffle(docs(s, d).select("doc_id"), "doc_id", seed = "ep1")
        .select(col("doc_id"), col("pos"))),

    // exact heavy hitters, sketch-bounded shuffle: a count-min pass
    // admits candidate tokens (never missing a true one), the exact
    // GROUP BY runs over candidates only
    "p_heavy_hitters" -> ((s, d) =>
      Sketches.heavyHitters(docs(s, d), "text", minCount = 900L)),

    // benchmark decontamination: docs sharing an 8-word-gram with the
    // held-out set (doc_id % 97 == 0) are dropped from the training side
    "p_decontaminate" -> ((s, d) => {
      val all = docs(s, d)
      Decontaminate.decontaminate(
        all.filter(col("doc_id") % 97 =!= 0),
        all.filter(col("doc_id") % 97 === 0), n = 8)
    }),

    // incremental decontamination SERVICE: benchmark shingles persist in
    // a hash-partitioned index, each tick probes only its new docs (and
    // only the matching index partitions). Contamination is order-
    // independent, so ticks are fed OUT of id order and the final clean
    // table must still equal the batch operator exactly — same oracle
    "p_decontaminate_incremental" -> ((s, d) => {
      import graft.core.{TableConfig, TableType}
      import graft.table.{GraftTable, WritePipeline}
      val all = docs(s, d)
      val root = s"/tmp/graft_q/decon_incr_${Integer.toHexString(d.hashCode)}"
      WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(root))
      val docsCfg = TableConfig("docs_src", TableType.CopyOnWrite, Seq("doc_id"), "", "")
      val srcT = GraftTable.create(s, s"$root/source", docsCfg)
      val cleanT = GraftTable.create(s, s"$root/clean", docsCfg.copy(tableName = "docs_clean"))
      val idx = DecontaminateService.openIndex(s, s"$root/index", n = 8)
      DecontaminateService.updateBenchmark(idx, all.filter(col("doc_id") % 97 === 0))
      val train = all.filter(col("doc_id") % 97 =!= 0)
      val mx = train.agg(max("doc_id")).head().getLong(0)
      val ticks = Seq( // deliberately unordered
        train.filter(col("doc_id") > mx / 3 && col("doc_id") <= 2 * mx / 3),
        train.filter(col("doc_id") > 2 * mx / 3),
        train.filter(col("doc_id") <= mx / 3))
      for (tick <- ticks) {
        srcT.upsert(tick)
        DecontaminateService.sync(srcT, cleanT, idx)
      }
      graft.read.Readers.snapshot(cleanT)
        .select(all.columns.toIndexedSeq.map(col): _*)
    }),

    // GRADED incremental decontamination: two suites with different
    // thresholds over planted marker passages — a doc whose text IS the
    // easy passage (contamination 1.0 > 0.6) drops, a doc that merely
    // APPENDS it (small fraction) survives, while ANY strict-suite
    // shingle drops (threshold 0). Out-of-order ticks; the oracle
    // restates the batch graded rule independently
    "p_decontaminate_graded_incremental" -> ((s, d) => {
      import graft.core.{TableConfig, TableType}
      import graft.table.{GraftTable, WritePipeline}
      import s.implicits._
      val easy = (1 to 12).map(i => s"zqe$i").mkString(" ")
      val strict = (1 to 10).map(i => s"zqs$i").mkString(" ")
      val all = docs(s, d)
      val train = all.withColumn("text",
        when(col("doc_id") % 11 === 0, lit(easy))
          .when(col("doc_id") % 7 === 0, concat(col("text"), lit(" " + strict)))
          .when(col("doc_id") % 3 === 0, concat(col("text"), lit(" " + easy)))
          .otherwise(col("text")))
      val root = s"/tmp/graft_q/decon_graded_${Integer.toHexString(d.hashCode)}"
      WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(root))
      val docsCfg = TableConfig("docs_src", TableType.CopyOnWrite, Seq("doc_id"), "", "")
      val srcT = GraftTable.create(s, s"$root/source", docsCfg)
      val cleanT = GraftTable.create(s, s"$root/clean", docsCfg.copy(tableName = "docs_clean"))
      val idx = DecontaminateService.openIndex(s, s"$root/index", n = 8)
      DecontaminateService.updateBenchmark(idx, Seq(easy).toDF("text"), suite = "easy")
      DecontaminateService.updateBenchmark(idx, Seq(strict).toDF("text"), suite = "strict")
      val thr = Map("easy" -> 0.6, "strict" -> 0.0)
      val mx = train.agg(max("doc_id")).head().getLong(0)
      val ticks = Seq( // deliberately unordered
        train.filter(col("doc_id") > mx / 2),
        train.filter(col("doc_id") <= mx / 2))
      for (tick <- ticks) {
        srcT.upsert(tick)
        DecontaminateService.sync(srcT, cleanT, idx, thresholds = thr)
      }
      graft.read.Readers.snapshot(cleanT)
        .select(all.columns.toIndexedSeq.map(col): _*)
    }),

    // sequence packing: ~2048-token bins within stable hash buckets
    "p_pack_bins" -> ((s, d) =>
      Packing.packIntoBins(docs(s, d), maxTokensPerBin = 2048, buckets = 16)
        .select(col("doc_id"), col("n_tokens"), col("bucket"), col("bin_id"))),

    // bin materialization: concatenate each bin's docs (id-ordered, EOS-
    // separated) into the training sequence — array_sort on (id, text)
    // structs makes the in-bin order deterministic under any shuffle
    "p_pack_concat" -> ((s, d) => {
      val packed = Packing.packIntoBins(docs(s, d), maxTokensPerBin = 2048, buckets = 16)
      packed.groupBy("bin_id").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
            st => st.getField("text")),
          " <eos> ").as("packed_text"))
    }),

    // Gopher/C4 repetition signals: native one-pass expression,
    // arithmetic replayed exactly by the oracle
    "p_quality_repetition" -> ((s, d) => {
      val withSig = docs(s, d)
        .withColumn("_sig", Repetition.signals(col("text")))
      withSig.select(col("doc_id"),
        col("_sig.uniq_word_ratio").as("uniq_word_ratio"),
        col("_sig.top2_frac").as("top2_frac"),
        col("_sig.top3_frac").as("top3_frac"),
        col("_sig.dup5_frac").as("dup5_frac"),
        Repetition.repetitionOk(col("_sig")).as("rep_ok"))
    }),

    // binned range join (attribution window): views within the 30 min
    // BEFORE each click — candidates meet on (user, time-bin), never a
    // per-user cross product
    // URL host + registrable domain over synthetic crawl urls (userinfo,
    // ports, mixed case, multi-level TLDs) — parse_url + label logic must
    // read back exactly what the doc_id arithmetic constructed
    "p_url_domains" -> ((s, d) => {
      val url = concat(lit("https://"),
        when(col("doc_id") % 4 === 1, lit("user@")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit("Example.com"))
          .when(col("doc_id") % 4 === 1, lit("sub.news.example.co.uk"))
          .when(col("doc_id") % 4 === 2,
            concat(lit("a"), (col("doc_id") % 7).cast("string"), lit(".blog.org")))
          .otherwise(lit("cdn.example.net")),
        when(col("doc_id") % 3 === 0, lit(":8080")).otherwise(lit("")),
        lit("/p/"), col("doc_id").cast("string"))
      docs(s, d).select(col("doc_id"),
        graft.pipeline.Urls.urlHost(url).as("host"),
        graft.pipeline.Urls.registrableDomain(url).as("domain"))
    }),

    // URL canonicalization (the dedup-by-canonical-URL pass): tracking
    // params out, surviving params sorted, www/trailing-slash/fragment
    // normalized, DEFAULT ports (:80 http / :443 443) dropped while a
    // non-default :8080 SURVIVES, and percent-encodings normalized per
    // RFC 3986 §6.2.2 (unreserved escapes decode, reserved escape hex
    // uppercases) — exact read-back of doc_id shapes
    "p_url_canonical" -> ((s, d) => {
      val k = (col("doc_id") % 11).cast("string")
      val m = (col("doc_id") % 5).cast("string")
      val n = (col("doc_id") % 7).cast("string")
      val url = when(col("doc_id") % 5 === 0,
          concat(lit("http://www.site"), k, lit(".com:80/a/"), m,
            lit("/?utm_source=x&q="), n, lit("&b=1#f")))
        .when(col("doc_id") % 5 === 1,
          concat(lit("https://site"), k, lit(".com/a/"), m))
        .when(col("doc_id") % 5 === 2,
          concat(lit("https://Sub.site"), k, lit(".co.uk:443/p?gclid=2")))
        .when(col("doc_id") % 5 === 3,
          concat(lit("http://site"), k, lit(".com:8080/a")))
        .otherwise( // %41→A and %7e→~ decode; %2f/%2F stay, hex uppercased
          concat(lit("https://site"), k, lit(".com/p%41th%7e/x%2Fy?n%61me=v%2f1")))
      docs(s, d).select(col("doc_id"),
        graft.pipeline.Urls.canonicalUrl(url).as("canonical"))
    }),

    // PSL registrable domains: hosts exercising a private-section suffix
    // (github.io), multi-level ICANN suffixes (com.au, co.jp), the
    // wildcard *.ck, its exception !www.ck, and an unlisted TLD falling
    // to the implicit * rule — the oracle states the expected grouping
    // independently from the doc_id arithmetic
    "p_url_psl" -> ((s, d) => {
      val j = (col("doc_id") % 7).cast("string")
      val url = when(col("doc_id") % 6 === 0,
          concat(lit("https://blog.alpha"), j, lit(".github.io/x")))
        .when(col("doc_id") % 6 === 1,
          concat(lit("http://www.shop"), j, lit(".com.au/x")))
        .when(col("doc_id") % 6 === 2,
          concat(lit("https://news.corp"), j, lit(".co.jp/x")))
        .when(col("doc_id") % 6 === 3,
          concat(lit("https://deep.sub.site"), j, lit(".example.ck/x")))
        .when(col("doc_id") % 6 === 4,
          lit("https://user@www.ck:8080/x"))
        .otherwise(concat(lit("https://a"), j, lit(".b.example/x")))
      docs(s, d).select(col("doc_id"),
        graft.pipeline.Urls.registrableDomainPsl(url).as("domain"))
    }),

    // unicode normalization: docs wrapped in deterministic messy framing
    // (curly quotes, em dash, NBSP, zero-width, BEL control, ellipsis,
    // tab) must come back ASCII-normalized — the chain replays verbatim
    // under RE2
    "p_text_normalize" -> ((s, d) => {
      // explicit \u escapes keep the planted chars reviewable: curly
      // quotes, NBSP, em dash, ellipsis, zero-width space, BEL, tab
      val messy = concat(
        lit("\u201Cstart\u201D\u00A0"), col("text"),
        lit(" \u2014 tail\u2026 \u2018q\u2019\u200Bz\u0007 end\tok\r\nnl \rcr"))
      docs(s, d).select(col("doc_id"),
          graft.pipeline.Cleaning.normalizeText(messy).as("text_out"))
        .withColumn("n_chars_out", length(col("text_out")).cast("long"))
    }),

    // IDN host mapping: the unicode spelling, its xn-- punycode twin
    // and a plain ASCII host — the first two must group as ONE key; the
    // oracle states the punycode literally (DuckDB has no IDN)
    "p_url_idn" -> ((s, d) => {
      val j = (col("doc_id") % 5).cast("string")
      val url = when(col("doc_id") % 3 === 0,
          concat(lit("https://b"), j, lit(".bücher.example/x")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("https://b"), j, lit(".xn--bcher-kva.example/x")))
        .otherwise(concat(lit("https://plain"), j, lit(".example/x")))
      docs(s, d).select(col("doc_id"),
        graft.pipeline.Urls.urlHostAscii(url).as("host"))
    }),

    // NFKC + ASCII normalization: full-width forms, ligatures, a
    // superscript, a Roman-numeral compatibility char and a combining
    // sequence planted around each doc must fold to their canonical
    // spellings — the oracle states the folded framing as LITERALS
    // (DuckDB has no NFKC), with only the ASCII chain replayed
    "p_text_nfkc" -> ((s, d) => {
      // explicit \u escapes keep the planted chars reviewable:
      // full-width Graft123, fi/fl ligatures, x-superscript-2, roman
      // numeral XII, e+combining-acute (composes to U+00E9), square km
      val messy = concat(
        lit("\uFF27\uFF52\uFF41\uFF46\uFF54\uFF11\uFF12\uFF13 \uFB01le " +
          "x\u00B2 \u216B e\u0301 "),
        col("text"),
        lit(" \uFB02y \u339E done"))
      docs(s, d).select(col("doc_id"),
          graft.pipeline.Cleaning.normalizeText(messy, "NFKC").as("text_out"))
        .withColumn("n_chars_out", length(col("text_out")).cast("long"))
    }),

    // normalization-aware exact dedup (opt-in NFKC fingerprints): each
    // base doc gets a FULL-WIDTH twin (+100000) and a LIGATURE twin
    // (+200000). Default fingerprints keep all three distinct (asserted
    // per family); the NFKC-aware Dedup.exact collapses each family to
    // its lowest id — survivors are exactly the base ids. Oracle is a
    // literal restatement (DuckDB lacks NFKC).
    "p_dedup_nfkc" -> ((s, d) => {
      val base = docs(s, d).filter(col("doc_id") < 50)
        .select(col("doc_id"), concat(col("text"), lit(" final fix")).as("text"))
      val full = base.select((col("doc_id") + 100000).as("doc_id"),
        translate(lower(col("text")),
          "abcdefghijklmnopqrstuvwxyz",
          "ａｂｃｄｅｆｇｈｉｊ" +
            "ｋｌｍｎｏｐｑｒｓｔ" +
            "ｕｖｗｘｙｚ").as("text"))
      val liga = docs(s, d).filter(col("doc_id") < 50)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" ﬁnal ﬁx")).as("text"))
      val all = base.unionByName(full).unionByName(liga)
      val survivors = graft.pipeline.Dedup.exact(all, "text", "doc_id",
        unicodeForm = Some("NFKC"))
      val fam = all.withColumn("family", col("doc_id") % 100000)
        .groupBy("family")
        .agg(countDistinct(TextStats.fingerprint(col("text"))).as("n_fp_default"))
      survivors.select(col("doc_id"))
        .join(fam, col("doc_id") === col("family"))
        .select(col("doc_id"), col("n_fp_default"))
    }),

    // in-document line dedup: a synthetic nav/footer line planted around
    // each doc's text (and the text's own first line repeated at the end)
    // must collapse to first occurrences in order
    "p_line_dedup_within" -> ((s, d) => {
      val nl = lit("\n")
      val planted = concat(lit("NAV MENU"), nl, col("text"), nl,
        lit("NAV MENU"), nl, element_at(split(col("text"), "\n"), 1), nl,
        lit("(c) footer"), nl, lit("(c) footer"))
      docs(s, d).select(col("doc_id"),
        graft.pipeline.Cleaning.dedupLinesWithin(planted).as("text_out"))
    }),

    // HTML → text extraction: docs wrapped in a deterministic page shell
    // (head/style/script, headings, comments, entities) must come back as
    // title + body text + decoded footer — the regex chain is
    // backreference-free so the oracle replays it VERBATIM under RE2
    "p_html_extract" -> ((s, d) => {
      val html = concat(
        lit("<html><head><title>t</title><style>p { color: red }</style>" +
          "<script>var x = \"<p>\";</script></head><body><h1>Title</h1><p>"),
        col("text"),
        lit("</p><!-- trailing comment --><footer>&amp; &lt;fin&gt;&nbsp;ok " +
          "&amp;lt;esc&amp;gt;</footer></body></html>"))
      docs(s, d).select(col("doc_id"),
          graft.pipeline.Cleaning.htmlToText(html).as("text_out"))
        .withColumn("n_chars_out", length(col("text_out")))
    }),

    // skew-handled fact-to-dim join: a synthetic hot key (a third of all
    // events collapse onto user 0) goes through the adaptive salted join
    // — hot keys salted 8 ways, cold keys plain — and the result must
    // equal the plain join exactly (aggregated for a stable oracle)
    "p_salted_join" -> ((s, d) => {
      val ev = QUtil.events(s, d).select("event_id", "user_id", "value")
      val fact = ev.withColumn("user_id",
        when(col("event_id") % 3 === 0, lit(0L)).otherwise(col("user_id")))
      val dim = fact.select("user_id").distinct()
        .withColumn("segment", pmod(col("user_id"), lit(7L)))
      Skew.skewJoin(fact, dim, Seq("user_id"), salts = 8, hotThreshold = 500)
        .groupBy("segment")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
    }),

    "p_range_join" -> ((s, d) => {
      val ev = QUtil.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
        .withColumn("_lo", col("click_ts") - expr("INTERVAL 30 MINUTES"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      val pairs = RangeJoin.pointsInIntervals(views, clicks, Seq("user_id"),
        "view_ts", "_lo", "click_ts", binSeconds = 1800L)
      val perClick = pairs.groupBy("click_id")
        .agg(count(lit(1)).as("n_views"),
          max(unix_micros(col("view_ts"))).as("last_view_us"))
      clicks.join(perClick, Seq("click_id"), "left")
        .select(col("click_id"), col("user_id"),
          unix_micros(col("click_ts")).as("click_us"),
          coalesce(col("n_views"), lit(0L)).as("n_views"),
          col("last_view_us"))
    }),

    // TEXT similarity search: top-10 by exact n-gram Jaccard, candidates
    // from MinHash band collisions — the text analog of the ANN queries.
    // The query set is planted: 80%-token prefixes of docs 0-2 under
    // offset ids, so band collisions provably occur at gate scale (the
    // corpus's natural max query↔corpus Jaccard is ~0.026, below any
    // sane banding threshold — an unplanted gate passes vacuously at 0
    // rows). Each query must find its source doc at rank 1.
    "p_similar_docs" -> ((s, d) => {
      val all = docs(s, d)
      val base = all.filter(col("doc_id") < 3)
        .select(col("doc_id"), Repetition.tokens(col("text")).as("_tk"))
      val cut = greatest(lit(1),
        floor((size(col("_tk")) * 4 + 4) / lit(5)).cast("int"))
      val qs = base.select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(col("_tk"), lit(1), cut), " ").as("text"))
      Similarity.textTopK(all, qs, k = 10)
        .withColumn("query_id", col("query_id") - 1000000L)
    }),

    // END-TO-END corpus build: the operators compose — quality filter ->
    // exact dedup -> exact decontamination vs a held-out eval slice ->
    // per-domain cap -> stratified language mix, each stage the library
    // op a real pipeline would call, the whole chain replayed in one
    // oracle. Plan-wise: filters push to the scan, dedup is the min-id
    // aggregation + semi-join, decontamination a fingerprint anti-join,
    // cap one group window, mix a row-local hash filter — no stage
    // materializes, Catalyst fuses the lot.
    "p_corpus_pipeline" -> ((s, d) => {
      val all = docs(s, d)
      val corpus = all.filter(col("doc_id") % 97 =!= 0 && col("n_chars") >= 50)
      val eval = all.filter(col("doc_id") % 97 === 0)
      val deduped = Dedup.exact(corpus)
      val decont = deduped
        .withColumn("_fp", TextStats.fingerprintHex(col("text")))
        .join(eval.select(TextStats.fingerprintHex(col("text")).as("_fp"))
          .distinct(), Seq("_fp"), "left_anti")
        .drop("_fp")
      val capped = Sampling.capPerGroup(decont, "source", 5,
        Seq(col("n_chars").desc, col("doc_id")))
      Sampling.stratifiedSample(capped, "lang", "doc_id",
          Map("en" -> 1.0), defaultRate = 0.6)
        .select("doc_id", "source", "lang", "n_chars")
    }),

    // distribution-drift monitor: PSI per feature between two event
    // slices (the odd slice's value is shifted 1.3x, its categories are
    // not) — exact bin counts, 0.5-smoothed proportions, per-bin terms
    // decimal-quantized before summing
    "p_drift_psi" -> ((s, d) => {
      val e = s.read.parquet(s"$d/events.parquet")
      val base = e.filter(col("event_id") % 2 === 0)
      val cur = e.filter(col("event_id") % 2 === 1)
        .withColumn("value", col("value") * 1.3)
      Drift.report(base, cur, numeric = Seq("value"),
        categorical = Seq("event_type"))
    }),

    // single-pass per-column corpus profile (cardinality / nulls / range
    // / decimal-folded sums) with planted nulls; exact distinct at
    // verification scale — the default approx (HLL) mode is spec-tested
    "p_profile" -> ((s, d) => {
      val base = docs(s, d).withColumn("lang",
        when(col("doc_id") % 17 === 0, lit(null)).otherwise(col("lang")))
      Profile.profile(base, Seq("doc_id", "lang", "source", "n_chars"),
        exactDistinct = true)
    }),

    // declarative data-quality constraints (Deequ-style): plant
    // deterministic violations (nulls, out-of-range, bad enum, bad
    // format, duplicate keys, dangling FK), then verify every rule's
    // violation count in ONE aggregation pass + one anti-join per FK
    "p_data_quality" -> ((s, d) => {
      val o = s.read.parquet(s"$d/orders.parquet")
      val cust = s.read.parquet(s"$d/customer.parquet")
      val a = o.filter(col("o_orderkey") % 1000 === 1)
        .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(90000000L))
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("o_totalprice", lit(-1.0))
        .withColumn("o_orderdate", lit(null).cast("timestamp"))
        .withColumn("o_orderpriority", lit("9-BOGUS"))
      val b = o.filter(col("o_orderkey") % 1000 === 2)
      Constraints.check(o.unionByName(a).unionByName(b), Seq(
        Constraints.NotNull("o_orderdate"),
        Constraints.InRange("o_totalprice", 0, 1000000),
        Constraints.InSet("o_orderstatus", Seq("O", "F", "P")),
        Constraints.MatchesRegex("o_orderpriority", "^[1-5]-"),
        Constraints.Unique(Seq("o_orderkey")),
        Constraints.ForeignKey("o_custkey", cust, "c_custkey")))
    }),

    // distributed PageRank over the customer<->supplier interaction graph
    // (edges from orders JOIN lineitem, both directions): 5 sparse
    // matvec iterations, ranks as DECIMAL(20,12) with per-edge
    // contributions quantized before every sum — aggregation-order
    // independent, so all 5 iterations replay exactly
    "p_pagerank" -> ((s, d) => {
      val o = s.read.parquet(s"$d/orders.parquet")
      val l = s.read.parquet(s"$d/lineitem.parquet")
      val base = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("c"),
          concat(lit("s"), col("l_suppkey")).as("s"))
      val edges = base.select(col("c").as("src"), col("s").as("dst"))
        .union(base.select(col("s").as("src"), col("c").as("dst")))
      Graph.pageRank(edges, 5)
        .orderBy(col("r").desc, col("node")).limit(50)
        .select(col("node"), col("r").cast("double").as("rank"))
    }),

    // multinomial Naive Bayes classifier (fastText-style count-based doc
    // classifier): train on doc_id%5!=0 labeled by lang, predict the
    // rest. Three count aggs to train; decimal-quantized log sums make
    // every score aggregation-order independent and exactly replayable.
    "p_nb_classify" -> ((s, d) => {
      val all = docs(s, d)
      NbClassify.trainPredict(
        all.filter(col("doc_id") % 5 =!= 0),
        all.filter(col("doc_id") % 5 === 0),
        "lang", "text", "doc_id")
    }),

    // top event PATHS: per-user ordered event-type 3-grams, global top-20
    // — one sequence-assembly shuffle + row-local n-gram explosion
    "p_event_paths" -> ((s, d) =>
      Sessions.topPaths(s.read.parquet(s"$d/events.parquet"))),

    // weighted sample WITHOUT replacement (Efraimidis-Spirakis A-Res):
    // 200 docs drawn by length weight — content-stable uniforms from the
    // id hash, one top-k (no global sort), quantized keys + id tie-break
    "p_weighted_sample" -> ((s, d) =>
      Sampling.weightedSample(docs(s, d), "doc_id", "n_chars", 200)
        .select("doc_id", "source", "n_chars")),

    // RefinedWeb-style per-domain cap: each source contributes at most 5
    // docs, the best by (n_chars DESC, doc_id) — one group shuffle +
    // streamed per-group row_number, O(1) state per group
    "p_domain_cap" -> ((s, d) =>
      Sampling.capPerGroup(docs(s, d), "source", 5,
        Seq(col("n_chars").desc, col("doc_id")))
        .select("doc_id", "source", "n_chars")),

    // the same cap keyed by the REAL PSL registrable domain: github.io
    // subdomains group per-site (private suffix), com.au shops per-shop
    // (multi-level ICANN suffix) — the zero-shuffle domain expression
    // feeds the one group shuffle the cap needs
    "p_domain_cap_psl" -> ((s, d) => {
      val j = (col("doc_id") % 5).cast("string")
      val url = when(col("doc_id") % 2 === 0,
          concat(lit("https://u"), (col("doc_id") % 13).cast("string"),
            lit(".site"), j, lit(".github.io/p")))
        .otherwise(concat(lit("https://www.shop"), j, lit(".com.au/p")))
      val withDom = docs(s, d).withColumn("domain",
        graft.pipeline.Urls.registrableDomainPsl(url))
      Sampling.capPerGroup(withDom, "domain", 3,
        Seq(col("n_chars").desc, col("doc_id")))
        .select("doc_id", "domain", "n_chars")
    }),

    // distributed BPE merge-rule training (Sennrich 2016): the corpus
    // collapses ONCE into a word-frequency table, then every iteration is
    // O(vocabulary) — pair count, one-row argmax, row-local merge fold.
    // Deterministic tie-breaks (count DESC, pair ASC over ASCII words)
    // make all 6 learned rules exactly oracle-replayable.
    "p_bpe_train" -> ((s, d) => BpeTrain.trainMerges(docs(s, d), "text", 6)),

    // the encode side at corpus scale: apply the 6 learned rules to every
    // doc (row-local projections) and count the resulting subword tokens
    "p_bpe_encode" -> ((s, d) => {
      val all = docs(s, d)
      val rules = BpeTrain.trainMerges(all, "text", 6)
        .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
      BpeTrain.encode(all, "text", rules)
        .select(col("doc_id"), size(col("bpe_tokens")).cast("long").as("n_bpe"))
    }),

    // corpus vocabulary: global token counts, top-k — partial (map-side)
    // aggregation does the heavy lifting; only distinct words shuffle
    "p_vocab_topk" -> ((s, d) =>
      docs(s, d).select(explode(Repetition.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(100)),

    // BM25 ranked retrieval over the corpus posting lists. Queries are
    // planted 8-token prefixes of docs 0-2 (query_id = source doc_id), so
    // each query's source doc must surface; scores sum DECIMAL-quantized
    // per-term parts → aggregation-order independent, oracle-replayable
    "p_bm25_topk" -> ((s, d) => {
      val all = docs(s, d)
      val qs = all.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(Repetition.tokens(col("text")), 1, 8), " ").as("text"))
      TextSearch.bm25TopK(all, qs, k = 10)
    }),

    // TF-IDF keyword extraction: top-3 most characteristic terms per doc
    "p_tfidf_keywords" -> ((s, d) =>
      TextSearch.tfidfKeywords(docs(s, d), topK = 3)),

    // HYBRID retrieval: BM25 lexical top-20 fused with brute-force
    // cosine vector top-20 by reciprocal-rank fusion (1/(60+rank) per
    // list, decimal-quantized) — the RAG-stack retrieval combiner;
    // queries are docs 0-2 (text prefix) with their embeddings
    "p_hybrid_retrieval" -> ((s, d) => {
      val all = docs(s, d)
      val qs = all.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(Repetition.tokens(col("text")), 1, 8), " ").as("text"))
      val lex = TextSearch.bm25TopK(all, qs, k = 20)
        .select("query_id", "doc_id", "rank")
      val vecs = embs(s, d)
        .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      val vec = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") < 3), k = 20)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      TextSearch.rrfFuse(Seq(lex, vec), k = 10)
    }),

    // INCREMENTAL rollup service (materialized-view maintenance): a
    // per-customer aggregate table is kept in sync with a keyed source
    // through insert + delete + update ticks — each sync re-aggregates
    // only the groups the CDC feed touched, and the final rollup must
    // equal a from-scratch GROUP BY of the final source state
    "p_rollup_incremental" -> ((s, d) => {
      import graft.core.{TableConfig, TableType}
      import graft.table.GraftTable
      val dir = java.nio.file.Files.createTempDirectory("rollup_svc").toString
      val src = GraftTable.create(s, s"$dir/src", TableConfig(
        "rollup_src", TableType.CopyOnWrite, Seq("o_orderkey"), "", ""))
      val rollup = GraftTable.create(s, s"$dir/rollup", TableConfig(
        "rollup_dst", TableType.CopyOnWrite, Seq("o_custkey"), "", ""))
      val orders = s.read.parquet(s"$d/orders.parquet")
      val aggs = Seq(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total"))
      src.bulkInsert(orders)
      RollupService.sync(src, rollup, Seq("o_custkey"), aggs)
      src.delete(orders.filter(col("o_orderkey") % 7 === 0))
      RollupService.sync(src, rollup, Seq("o_custkey"), aggs)
      src.upsert(orders.filter(col("o_orderkey") % 5 === 0 && col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1))
      RollupService.sync(src, rollup, Seq("o_custkey"), aggs)
      graft.read.Readers.snapshot(rollup)
        .select(col("o_custkey"), col("n_orders"), col("total"))
    }),

    // PERSISTED BM25 index: same queries as p_bm25_topk, answered from
    // the term-bucket-partitioned postings table built in two increments
    // (corpus split at doc_id 250 + append) — persistence and incremental
    // maintenance must not change a single score vs the in-memory oracle
    "p_bm25_index_table" -> ((s, d) => {
      val all = docs(s, d)
      val dir = java.nio.file.Files.createTempDirectory("bm25_idx").toString
      TextIndex.build(s, dir, all.filter(col("doc_id") < 250))
      val idx = TextIndex.append(s, dir, all.filter(col("doc_id") >= 250))
      val qs = all.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          array_join(slice(Repetition.tokens(col("text")), 1, 8), " ").as("text"))
      TextIndex.search(idx, qs, k = 10)
    }),

    // corpus-frequency commonness score (unigram-LM-lite): per doc, the
    // mean corpus frequency of its tokens. All sums are exact LONGs (one
    // double division at the end), so no float-order sensitivity; the
    // vocab side is an aggregated broadcast, the doc side one shuffle
    "p_doc_commonness" -> ((s, d) => {
      val toks = docs(s, d).select(col("doc_id"),
        explode(Repetition.tokens(col("text"))).as("word"))
      val vocab = toks.groupBy("word").agg(count(lit(1)).as("wc"))
      val total = toks.agg(count(lit(1)).as("total_tokens"))
      toks.join(broadcast(vocab), Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("wc")).as("sum_wc"))
        .crossJoin(broadcast(total))
        .select(col("doc_id"), col("n_tokens"), col("sum_wc"),
          round(col("sum_wc").cast("double") / (col("n_tokens") * col("total_tokens")), 6)
            .as("commonness"))
    }),

    // per-dimension embedding stats (the feature-normalization pre-pass):
    // decimal-cast sums keep the mean order-independent across partitions
    "p_embed_stats" -> ((s, d) => {
      val all = embs(s, d)
        .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      all.select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("dim").agg(
          count(col("v")).as("n"),
          (sum(col("v").cast("decimal(28,10)")).cast("double") / count(col("v")))
            .as("mean"),
          min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    }),

    // graded contamination report: per-doc eval-set n-gram overlap
    "p_contamination" -> ((s, d) => {
      val all = docs(s, d)
      Decontaminate.contaminationScore(
        all.filter(col("doc_id") % 97 =!= 0),
        all.filter(col("doc_id") % 97 === 0), n = 8)
    }),

    // DSIR importance weighting: hashed-unigram log ratio of a target
    // slice (docs % 5 == 0) vs the raw rest — the "select crawl that
    // looks like my target domain" scorer; md5 feature hash + ln replay
    // exactly in the oracle
    "p_dsir_weights" -> ((s, d) => {
      val all = docs(s, d)
      Dsir.importanceWeights(
        all.filter(col("doc_id") % 5 =!= 0),
        all.filter(col("doc_id") % 5 === 0), buckets = 1024)
        .select(col("doc_id"), round(col("dsir_logw"), 4).as("dsir_logw"))
    }),

    // CCNet-style LM quality scoring: bigram model trained on the 80%
    // "trusted" slice, every doc scored by Laplace-smoothed mean token
    // log-prob — counts, joins and ln all replayed exactly by the oracle
    "p_lm_perplexity" -> ((s, d) => {
      val all = docs(s, d)
      val (bi, uni, v) = LmScore.train(all.filter(col("doc_id") % 5 =!= 0))
      LmScore.score(all, bi, uni, v)
        .select(col("doc_id"), round(col("avg_logp"), 4).as("avg_logp"))
    }),

    // PII scrubbing: plant a deterministic email/IP/phone mix per doc
    // (email on even ids, phone on ids % 3 == 0, IP always), redact, and
    // report the pre-scrub match count — one codegen'd map pass
    // Luhn-validated card redaction: three VALID test PANs (plain,
    // dashed, 15-digit amex) redact; an invalid-checksum twin and a
    // phone-length run pass through byte-identical — the oracle states
    // the redacted suffix literally (SQL cannot express the mod-10 gate)
    // the scrubbed column is FULLY planted (doc_id + literals, never the
    // corpus text) so a regenerated sf0.01 can't desync the literal
    // oracle with an accidental card-shaped digit run in a document
    "p_pii_cc" -> ((s, d) => {
      val planted = concat(lit("doc "), col("doc_id"),
        lit(" pay 4111111111111111 or 4111-1111-1111-1111 amex 378282246310005"),
        lit(" bad 4111111111111112 ref 555-123-4567 end"))
      docs(s, d).select(col("doc_id"),
        Cleaning.scrubCreditCards(planted).as("text_out"))
    }),

    "p_pii_scrub" -> ((s, d) => {
      val planted = docs(s, d).select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 2 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com please")))
          .otherwise(lit("")),
        concat(lit(" node 10.0."), col("doc_id") % 200, lit(".7 up")),
        when(col("doc_id") % 3 === 0, lit(" call 555-123-4567 now"))
          .otherwise(lit(""))).as("text"))
      planted.select(col("doc_id"),
        Cleaning.scrubPii(col("text")).as("clean_text"),
        Cleaning.piiCount(col("text")).as("n_pii"))
    }),

    // C4 line/document cleaning over deterministically structured docs:
    // per-line terminal-punctuation / min-words / javascript rules, whole-
    // doc lorem-ipsum and min-surviving-lines rules
    "p_c4_clean" -> ((s, d) => {
      val lines = array(
        concat(lit("the quick brown fox jumps over dock "), col("doc_id"), lit(".")),
        lit("too short."),
        lit("no terminal punctuation here at all"),
        lit("please enable javascript to view this page."),
        when(col("doc_id") % 3 =!= 0, lit("a second good line stays right here."))
          .otherwise(lit("short one.")),
        lit("the third good line survives the cleaning pass."))
      val text = when(col("doc_id") % 7 === 0,
        concat(array_join(lines, "\n"), lit("\nlorem ipsum dolor sit amet.")))
        .otherwise(array_join(lines, "\n"))
      Cleaning.c4Clean(docs(s, d).select(col("doc_id"), text.as("text")))
    }),

    // corpus-wide exact line dedup: planted boilerplate (every-doc banner,
    // quarter-corpus cookie line) is dropped from every document; unique
    // body and per-doc closing lines survive in original order
    "p_line_dedup" -> ((s, d) => {
      val text = concat_ws("\n",
        lit("subscribe to our newsletter today"),
        col("text"),
        when(col("doc_id") % 4 === 0, lit("cookie policy applies here"))
          .otherwise(concat(lit("closing line for "), col("doc_id"))),
        lit("copyright acme corp"))
      Cleaning.lineDedup(docs(s, d).select(col("doc_id"), text.as("text")),
          maxDocFreq = 2)
        .select(col("doc_id"), col("n_dropped"), md5(col("text")).as("clean_fp"))
    }),

    // INCREMENTAL span dedup service: three ticks through the persisted
    // fingerprint index; in-tick duplicates cut everywhere, cross-tick
    // occurrences lose to the tick that introduced the passage. The
    // final clean table must equal the tick-ordered replay in SQL.
    "p_dedup_spans_incremental" -> ((s, d) => {
      import graft.core.{TableConfig, TableType}
      import graft.table.{GraftTable, WritePipeline}
      val base = docs(s, d)
      val root = s"/tmp/graft_q/span_incr_${Integer.toHexString(d.hashCode)}"
      WritePipeline.deleteRecursively(new org.apache.hadoop.fs.Path(root))
      val docsCfg = TableConfig("docs_src", TableType.CopyOnWrite, Seq("doc_id"), "", "")
      val srcT = GraftTable.create(s, s"$root/source", docsCfg)
      val cleanT = GraftTable.create(s, s"$root/clean", docsCfg.copy(tableName = "docs_clean"))
      val idx = SpanDedupService.openIndex(s, s"$root/index", k = 20)
      val mx = base.agg(max("doc_id")).head().getLong(0)
      val ticks = Seq(
        base.filter(col("doc_id") <= mx / 3),
        base.filter(col("doc_id") > mx / 3 && col("doc_id") <= 2 * mx / 3),
        base.filter(col("doc_id") > 2 * mx / 3))
      for (tick <- ticks) {
        srcT.bulkInsert(tick)
        SpanDedupService.sync(srcT, cleanT, idx)
      }
      graft.read.Readers.snapshot(cleanT)
        .select(col("doc_id"), md5(col("text")).as("clean_fp"))
    }),

    // ExactSubstr span dedup (Lee et al. 2022): any 20-token window whose
    // exact text occurs twice+ corpus-wide is cut from EVERY document
    // carrying it — passage-level removal where doc-level dedup keeps a
    // copy (45 of the 500 sf0.01 docs carry duplicated spans)
    "p_dedup_spans" -> ((s, d) => {
      Dedup.exactSpanDedup(docs(s, d).select(col("doc_id"), col("text")), k = 20)
        .select(col("doc_id"), col("n_dropped"), md5(col("text")).as("clean_fp"))
    }),

    // overlapping token-window chunking: stride-24 windows of 32 tokens
    "p_chunk_docs" -> ((s, d) =>
      Chunking.chunk(docs(s, d), chunkTokens = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens"),
          col("chunk_text"))),

    // SemDeDup: cluster-partitioned semantic dedup — planted exact copies
    // vanish; candidate pairs never leave their coarse cluster
    "p_dedup_semantic" -> ((s, d) => {
      val base = embs(s, d)
        .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      val planted = base.filter(col("vec_id") % 5 === 0)
        .withColumn("vec_id", col("vec_id") + 10000000L)
      Dedup.semanticDedup(base.unionByName(planted), nlist = 64, threshold = 0.999)
        .select(col("vec_id"), col("label"))
    }))

  // ---- portable-hash SQL fragments for the dedup oracles --------------
  //
  // MinHashSig (graft.functions.MinHashSig) uses FNV-1a64 + the
  // Kirsch–Mitzenmacher two-hash family — pure 64-bit arithmetic, so the
  // DuckDB oracle replays it exactly (mod-2^64 via HUGEINT, signed-min via
  // explicit wrap). Band membership is replayed as direct slice equality
  // (two docs share an LSH bucket iff their band values are equal).
  private def sigCtes(src: String): String =
    raw"""toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS tk
         |  FROM $src
         |), shp AS (
         |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
         |    THEN list_transform(generate_series(1, len(tk)-2), i -> array_to_string(list_slice(tk, i, i+2), ' '))
         |    ELSE [array_to_string(tk, ' ')] END) AS s
         |  FROM toks
         |), hs AS (
         |  SELECT doc_id,
         |    list_reduce(list_prepend(14695981039346656037::UBIGINT, codes),
         |      (acc,x) -> ((xor(acc,x)::HUGEINT * 1099511628211) % 18446744073709551616)::UBIGINT) AS h1,
         |    (list_reduce(list_prepend(9521211207457086692::UBIGINT, codes),
         |      (acc,x) -> ((xor(acc,x)::HUGEINT * 1099511628211) % 18446744073709551616)::UBIGINT) | 1::UBIGINT) AS h2
         |  FROM (SELECT doc_id, list_transform(generate_series(1, length(s)), i -> unicode(substr(s,i,1))::UBIGINT) AS codes FROM shp)
         |), mh AS (
         |  SELECT doc_id, i,
         |    min(CASE WHEN m >= 9223372036854775808::HUGEINT THEN (m - 18446744073709551616::HUGEINT)::BIGINT ELSE m::BIGINT END) AS sigv
         |  FROM (SELECT doc_id, i, ((h1::HUGEINT + i * h2::HUGEINT) % 18446744073709551616::HUGEINT) AS m
         |        FROM hs, (SELECT unnest(generate_series(0,63)) AS i))
         |  GROUP BY doc_id, i
         |), sig AS (SELECT doc_id, list(sigv ORDER BY i) AS sg FROM mh GROUP BY doc_id)""".stripMargin

  private val fnvSigCtes: String = sigCtes("documents")

  private val bandEq: String = (0 until 16)
    .map(b => s"list_slice(l.sg, ${4 * b + 1}, ${4 * b + 4}) = list_slice(r.sg, ${4 * b + 1}, ${4 * b + 4})")
    .mkString("(", "\n     OR ", ")")

  private val minhashOracle: String =
    s"""WITH $fnvSigCtes,
       |dup AS (
       |  SELECT DISTINCT r.doc_id AS dup_id
       |  FROM sig l JOIN sig r ON l.doc_id < r.doc_id
       |   AND $bandEq
       |  WHERE len(list_filter(list_transform(generate_series(1,64), j -> l.sg[j] = r.sg[j]), x -> x))::DOUBLE / 64 >= 0.6
       |)
       |SELECT d.* FROM documents d WHERE NOT EXISTS (SELECT 1 FROM dup WHERE dup_id = d.doc_id)""".stripMargin

  private val ngramJaccardOracle: String =
    s"""WITH $fnvSigCtes,
       |shs AS (
       |  SELECT doc_id, CASE WHEN len(tk) >= 3
       |    THEN list_distinct(list_transform(generate_series(1, len(tk)-2), i -> array_to_string(list_slice(tk, i, i+2), ' ')))
       |    ELSE [array_to_string(tk, ' ')] END AS ss
       |  FROM toks
       |),
       |dup AS (
       |  SELECT DISTINCT r.doc_id AS dup_id
       |  FROM sig l JOIN sig r ON l.doc_id < r.doc_id
       |   AND $bandEq
       |  JOIN shs sl ON sl.doc_id = l.doc_id
       |  JOIN shs sr ON sr.doc_id = r.doc_id
       |  WHERE CASE WHEN len(list_distinct(list_concat(sl.ss, sr.ss))) = 0 THEN 0.0
       |    ELSE len(list_intersect(sl.ss, sr.ss))::DOUBLE / len(list_distinct(list_concat(sl.ss, sr.ss))) END >= 0.8
       |)
       |SELECT d.* FROM documents d WHERE NOT EXISTS (SELECT 1 FROM dup WHERE dup_id = d.doc_id)""".stripMargin

  // SQL fragments mirroring Similarity's expression trees exactly: left
  // folds seeded at 0.0 match list_reduce's first-element seeding because
  // 0.0 + x == x for finite doubles.
  private def sqlDot(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> $a[i]*$b[i]), (x,y) -> x+y)"
  private def sqlNorm(a: String): String =
    s"sqrt(list_reduce(list_transform($a, x -> x*x), (x,y) -> x+y))"
  private def sqlCosine(a: String, b: String): String =
    s"""CASE WHEN ${sqlNorm(a)} * ${sqlNorm(b)} = 0 THEN 0.0
       |      ELSE ${sqlDot(a, b)} / (${sqlNorm(a)} * ${sqlNorm(b)}) END""".stripMargin
  private def sqlL2(a: String, b: String): String =
    s"sqrt(list_reduce(list_transform(generate_series(1, len($a)), i -> ($a[i]-$b[i])*($a[i]-$b[i])), (x,y) -> x+y))"

  private val lshOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |sigs AS (
       |  SELECT vec_id, emb,
       |    list_sum(list_transform(generate_series(0, 7), p ->
       |      CASE WHEN list_reduce(
       |          list_transform(generate_series(1, len(emb)), i ->
       |            emb[i] * ((('0x'||substr(md5((i-1)::VARCHAR || '_' || p::VARCHAR),1,15))::BIGINT % 2001 - 1000)::DOUBLE / 1000.0)),
       |          (x,y) -> x+y) > 0
       |        THEN (1::BIGINT << p) ELSE 0 END))::BIGINT AS sig
       |  FROM e
       |),
       |probes AS (
       |  SELECT vec_id AS query_id, unnest([sig, xor(sig,1), xor(sig,2), xor(sig,4)]) AS b
       |  FROM sigs WHERE vec_id < 3
       |),
       |cand AS (
       |  SELECT DISTINCT p.query_id, s.vec_id AS neighbor_id
       |  FROM probes p JOIN sigs s ON s.sig = p.b AND s.vec_id <> p.query_id
       |),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${sqlCosine("q.emb", "n.emb")} AS score
       |  FROM cand c JOIN e q ON q.vec_id = c.query_id JOIN e n ON n.vec_id = c.neighbor_id
       |)
       |SELECT query_id, neighbor_id, rank FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
       |  FROM scored)
       |WHERE rank <= 10""".stripMargin

  // IVF pipeline as reusable CTEs (nprobe parameterized): seeds → coarse
  // assignment → per-query probes → probed-cluster cosine scores
  private def ivfCtes(nprobe: Int): String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |cent AS (
       |  SELECT row_number() OVER (ORDER BY h, svid) - 1 AS centroid_id, cv FROM (
       |    SELECT md5(vec_id::VARCHAR) AS h, vec_id AS svid, emb AS cv FROM e ORDER BY 1, 2 LIMIT 16)
       |),
       |assign AS (
       |  SELECT vec_id, emb, centroid_id FROM (
       |    SELECT a.vec_id, a.emb, c.centroid_id,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${sqlL2("a.emb", "c.cv")}, c.centroid_id) AS rn
       |    FROM e a CROSS JOIN cent c)
       |  WHERE rn = 1
       |),
       |probes AS (
       |  SELECT query_id, centroid_id FROM (
       |    SELECT q.vec_id AS query_id, c.centroid_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${sqlL2("q.emb", "c.cv")}, c.centroid_id) AS rn
       |    FROM e q CROSS JOIN cent c WHERE q.vec_id < 3)
       |  WHERE rn <= $nprobe
       |),
       |scored AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    ${sqlCosine("q.emb", "a.emb")} AS score
       |  FROM probes p
       |  JOIN assign a ON a.centroid_id = p.centroid_id AND a.vec_id <> p.query_id
       |  JOIN e q ON q.vec_id = p.query_id
       |)""".stripMargin

  private val ivfOracle: String =
    s"""WITH ${ivfCtes(4)}
       |SELECT query_id, neighbor_id, rank FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
       |  FROM scored)
       |WHERE rank <= 10""".stripMargin

  // IVF-PQ: coarse probes (nprobe=4) restrict the ADC scan to the probed
  // clusters' members; PQ assignment/table math identical to annPqOracle
  private val annIvfPqOracle: String = {
    val l2sv = sqlL2("s.sv", "b.cw")
    val l2q = sqlL2("q.sv", "b.cw")
    s"""WITH ${ivfCtes(4)},
       |seeds AS (
       |  SELECT row_number() OVER (ORDER BY h, svid) - 1 AS code_id, sv FROM (
       |    SELECT md5(vec_id::VARCHAR) AS h, vec_id AS svid, emb AS sv FROM e ORDER BY 1, 2 LIMIT 32)
       |),
       |books AS (
       |  SELECT j AS subspace, code_id, list_slice(sv, j*8+1, j*8+8) AS cw
       |  FROM seeds, UNNEST(generate_series(0, 7)) AS g(j)
       |),
       |sub AS (
       |  SELECT vec_id, j AS subspace, list_slice(emb, j*8+1, j*8+8) AS sv
       |  FROM e, UNNEST(generate_series(0, 7)) AS g(j)
       |),
       |pqa AS (
       |  SELECT vec_id, subspace, code_id FROM (
       |    SELECT s.vec_id, s.subspace, b.code_id,
       |      row_number() OVER (PARTITION BY s.vec_id, s.subspace
       |        ORDER BY $l2sv, b.code_id) AS rn
       |    FROM sub s JOIN books b ON s.subspace = b.subspace)
       |  WHERE rn = 1
       |),
       |tbl AS (
       |  SELECT q.vec_id AS query_id, b.subspace, b.code_id,
       |    CAST(round($l2q * $l2q, 9) AS DECIMAL(28,9)) AS dist
       |  FROM sub q JOIN books b ON q.subspace = b.subspace
       |  WHERE q.vec_id < 3
       |),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS cid
       |  FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
       |  WHERE a.vec_id <> p.query_id
       |),
       |adc AS (
       |  SELECT c.query_id, c.cid AS neighbor_id, CAST(sum(t.dist) AS DOUBLE) AS adist
       |  FROM cand c
       |  JOIN pqa a ON a.vec_id = c.cid
       |  JOIN tbl t ON t.query_id = c.query_id
       |    AND t.subspace = a.subspace AND t.code_id = a.code_id
       |  GROUP BY 1, 2
       |)
       |SELECT query_id, neighbor_id, adist, rank FROM (
       |  SELECT query_id, neighbor_id, adist,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
       |  FROM adc)
       |WHERE rank <= 10""".stripMargin
  }

  // recall@10 of the nprobe=2 IVF pass vs the exact cosine top-10
  private val annRecallOracle: String =
    s"""WITH ${ivfCtes(2)},
       |apx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
       |    FROM scored)
       |  WHERE rank <= 10
       |),
       |ext AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${sqlCosine("q.emb", "c.emb")} DESC, c.vec_id) AS rank
       |    FROM e q JOIN e c ON q.vec_id < 3 AND q.vec_id <> c.vec_id)
       |  WHERE rank <= 10
       |)
       |SELECT x.query_id, CAST(count(a.neighbor_id) AS BIGINT) AS hits,
       |  count(a.neighbor_id)::DOUBLE / 10 AS recall
       |FROM ext x LEFT JOIN apx a
       |  ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
       |GROUP BY 1""".stripMargin

  // PQ: 32 hash-ordered seed vectors sliced into 8 subspaces of 8 dims;
  // per-(vector, subspace) nearest codeword; ADC = decimal-quantized sum
  // of the query's per-subspace squared distances to the chosen codewords
  private val annPqOracle: String = {
    val l2sv = sqlL2("s.sv", "b.cw")
    val l2q = sqlL2("q.sv", "b.cw")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |seeds AS (
       |  SELECT row_number() OVER (ORDER BY h, svid) - 1 AS code_id, sv FROM (
       |    SELECT md5(vec_id::VARCHAR) AS h, vec_id AS svid, emb AS sv FROM e ORDER BY 1, 2 LIMIT 32)
       |),
       |books AS (
       |  SELECT j AS subspace, code_id, list_slice(sv, j*8+1, j*8+8) AS cw
       |  FROM seeds, UNNEST(generate_series(0, 7)) AS g(j)
       |),
       |sub AS (
       |  SELECT vec_id, j AS subspace, list_slice(emb, j*8+1, j*8+8) AS sv
       |  FROM e, UNNEST(generate_series(0, 7)) AS g(j)
       |),
       |assign AS (
       |  SELECT vec_id, subspace, code_id FROM (
       |    SELECT s.vec_id, s.subspace, b.code_id,
       |      row_number() OVER (PARTITION BY s.vec_id, s.subspace
       |        ORDER BY $l2sv, b.code_id) AS rn
       |    FROM sub s JOIN books b ON s.subspace = b.subspace)
       |  WHERE rn = 1
       |),
       |tbl AS (
       |  SELECT q.vec_id AS query_id, b.subspace, b.code_id,
       |    CAST(round($l2q * $l2q, 9) AS DECIMAL(28,9)) AS dist
       |  FROM sub q JOIN books b ON q.subspace = b.subspace
       |  WHERE q.vec_id < 3
       |),
       |adc AS (
       |  SELECT t.query_id, a.vec_id AS neighbor_id, CAST(sum(t.dist) AS DOUBLE) AS adist
       |  FROM assign a JOIN tbl t ON t.subspace = a.subspace AND t.code_id = a.code_id
       |  WHERE t.query_id <> a.vec_id
       |  GROUP BY 1, 2
       |)
       |SELECT query_id, neighbor_id, adist, rank FROM (
       |  SELECT query_id, neighbor_id, adist,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
       |  FROM adc)
       |WHERE rank <= 10""".stripMargin
  }

  private val simhashChunkEq: String = (0 until 4)
    .map(c => s"((l.s >> ${15 * c}) & 32767) = ((r.s >> ${15 * c}) & 32767)")
    .mkString("(", " OR ", ")")

  private val simhashOracle: String =
    raw"""WITH toksd AS (
         |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS tk
         |  FROM documents
         |), hsd AS (
         |  SELECT doc_id, list_transform(tk, t -> ('0x' || substr(md5(t),1,15))::BIGINT) AS hs FROM toksd
         |), sh AS (
         |  SELECT doc_id,
         |    list_sum(list_transform(generate_series(0,59), j ->
         |      CASE WHEN 2*len(list_filter(hs, h -> ((h >> j) & 1) = 1)) - len(hs) > 0
         |        THEN (1::BIGINT << j) ELSE 0 END))::BIGINT AS s
         |  FROM hsd
         |),
         |dup AS (
         |  SELECT DISTINCT r.doc_id AS dup_id
         |  FROM sh l JOIN sh r ON l.doc_id < r.doc_id
         |   AND $simhashChunkEq
         |  WHERE bit_count(xor(l.s, r.s)) <= 2
         |)
         |SELECT d.* FROM documents d WHERE NOT EXISTS (SELECT 1 FROM dup WHERE dup_id = d.doc_id)""".stripMargin

  // connected components replayed in SQL: the verified pair graph (same
  // band + similarity machinery as the dedup oracle), closed transitively
  // with a recursive CTE — (id, label) pairs are finite and UNION dedups,
  // so the fixpoint is exactly min-reachable-id per node
  private val clusterOracle: String =
    s"""WITH RECURSIVE $fnvSigCtes,
       |pr AS (
       |  SELECT l.doc_id AS a, r.doc_id AS b
       |  FROM sig l JOIN sig r ON l.doc_id < r.doc_id
       |   AND $bandEq
       |  WHERE len(list_filter(list_transform(generate_series(1,64), j -> l.sg[j] = r.sg[j]), x -> x))::DOUBLE / 64 >= 0.6
       |),
       |edges AS (SELECT a AS s, b AS d FROM pr UNION ALL SELECT b AS s, a AS d FROM pr),
       |cc AS (
       |  SELECT doc_id AS id, doc_id AS label FROM documents
       |  UNION
       |  SELECT e.d AS id, cc.label FROM cc JOIN edges e ON e.s = cc.id
       |)
       |SELECT id AS doc_id, min(label) AS cluster_id FROM cc GROUP BY id""".stripMargin

  private val sessionizeOracle: String =
    """WITH o AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |      THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      |  SELECT user_id, ts, value,
      |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |  FROM o
      |)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_s,
      |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_s,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
      |  (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_s
      |FROM s GROUP BY user_id, session_seq""".stripMargin

  private val asofOracle: String =
    """SELECT c.event_id, c.user_id,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
      |  v.event_id AS view_id,
      |  strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts_s
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id AND v.ts <= c.ts""".stripMargin

  private val stratifiedOracle: String =
    """SELECT * FROM documents
      |WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000) <
      |  CAST(10000 * (CASE source WHEN 'src0' THEN 0.25 WHEN 'src1' THEN 0.5
      |    WHEN 'src2' THEN 0.75 ELSE 1.0 END) AS BIGINT)""".stripMargin

  private val splitOracle: String =
    """SELECT doc_id, source,
      |  CASE WHEN b < 1000 THEN 'test' WHEN b < 2000 THEN 'valid'
      |    ELSE 'train' END AS split
      |FROM (SELECT doc_id, source,
      |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 AS b
      |  FROM documents)""".stripMargin

  private val decontaminateOracle: String =
    raw"""WITH tkd AS (
         |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS tk
         |  FROM documents
         |), sh AS (
         |  SELECT doc_id, CASE WHEN len(tk) >= 8
         |    THEN list_distinct(list_transform(generate_series(1, len(tk)-7), i -> array_to_string(list_slice(tk, i, i+7), ' ')))
         |    ELSE [array_to_string(tk, ' ')] END AS ss
         |  FROM tkd
         |), bench AS (
         |  SELECT DISTINCT unnest(ss) AS s FROM sh WHERE doc_id % 97 = 0
         |), bad AS (
         |  SELECT DISTINCT t.doc_id
         |  FROM (SELECT doc_id, unnest(ss) AS s FROM sh WHERE doc_id % 97 <> 0) t
         |  JOIN bench b ON t.s = b.s
         |)
         |SELECT d.* FROM documents d WHERE d.doc_id % 97 <> 0
         |  AND NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = d.doc_id)""".stripMargin

  private val packBinsOracle: String =
    raw"""WITH t AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0))::BIGINT AS n_tokens,
         |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000) % 16 AS bucket
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, n_tokens, bucket,
         |    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) - n_tokens AS cum
         |  FROM t
         |)
         |SELECT doc_id, n_tokens, bucket,
         |  bucket || '/' || CAST(CAST(floor(cum / 2048.0) AS BIGINT) AS VARCHAR) AS bin_id
         |FROM c""".stripMargin

  // ---- repetition-signal replay --------------------------------------
  // the oracle replays VALUES, not shape: per-distinct-gram char coverage
  // (count × gram length) via unnest + group-by equals the sorted-run
  // fold the Spark expression performs row-locally
  private def sqlGrams(n: Int): String =
    s"CASE WHEN len(tk) >= $n THEN list_transform(" +
      s"generate_series(1, len(tk)-${n - 1}), i -> array_to_string(list_slice(tk, i, i+${n - 1}), ' ')) " +
      "ELSE [] END"

  private val repetitionOracle: String = {
    def covAgg(n: Int): String =
      s"""g$n AS (SELECT doc_id, unnest(s$n) AS gr FROM b),
         |cnt$n AS (SELECT doc_id, gr, count(*) AS c FROM g$n GROUP BY doc_id, gr),
         |agg$n AS (
         |  SELECT doc_id, max(c * len(gr)) AS top_cov,
         |    sum(CASE WHEN c > 1 THEN c * len(gr) ELSE 0 END) AS dup_cov
         |  FROM cnt$n GROUP BY doc_id)""".stripMargin
    raw"""WITH tkd AS (
         |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS tk
         |  FROM documents
         |), b AS (
         |  SELECT doc_id, tk, len(array_to_string(tk, ' '))::BIGINT AS nc,
         |    ${sqlGrams(2)} AS s2, ${sqlGrams(3)} AS s3, ${sqlGrams(5)} AS s5
         |  FROM tkd
         |),
         |${covAgg(2)},
         |${covAgg(3)},
         |${covAgg(5)},
         |f AS (
         |  SELECT b.doc_id,
         |    round(CASE WHEN len(b.tk) = 0 THEN 0.0 ELSE len(list_distinct(b.tk))::DOUBLE / len(b.tk) END, 4) AS uniq_word_ratio,
         |    round(CASE WHEN b.nc = 0 THEN 0.0 ELSE least(1.0, coalesce(a2.top_cov, 0)::DOUBLE / b.nc) END, 4) AS top2_frac,
         |    round(CASE WHEN b.nc = 0 THEN 0.0 ELSE least(1.0, coalesce(a3.top_cov, 0)::DOUBLE / b.nc) END, 4) AS top3_frac,
         |    round(CASE WHEN b.nc = 0 THEN 0.0 ELSE least(1.0, coalesce(a5.dup_cov, 0)::DOUBLE / b.nc) END, 4) AS dup5_frac
         |  FROM b
         |  LEFT JOIN agg2 a2 ON a2.doc_id = b.doc_id
         |  LEFT JOIN agg3 a3 ON a3.doc_id = b.doc_id
         |  LEFT JOIN agg5 a5 ON a5.doc_id = b.doc_id
         |)
         |SELECT doc_id, uniq_word_ratio, top2_frac, top3_frac, dup5_frac,
         |  (top2_frac <= 0.2 AND top3_frac <= 0.18 AND dup5_frac <= 0.15) AS rep_ok
         |FROM f""".stripMargin
  }

  /** Table-service form: rows surviving the rep_ok verdict (used by
    * TableOps' `t_repetition_filter`).
    */
  private[queries] def repetitionFilterOracle: String =
    s"""SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
       |FROM documents d JOIN (
       |$repetitionOracle
       |) r ON r.doc_id = d.doc_id
       |WHERE r.rep_ok""".stripMargin

  private val rangeJoinOracle: String =
    """WITH c AS (
      |  SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'
      |), v AS (
      |  SELECT user_id, ts FROM events WHERE event_type = 'view'
      |), pr AS (
      |  SELECT c.click_id, v.ts AS vts
      |  FROM c JOIN v ON v.user_id = c.user_id
      |   AND v.ts >= c.ts - INTERVAL 30 MINUTE AND v.ts <= c.ts
      |), ag AS (
      |  SELECT click_id, count(*) AS n_views, max(epoch_us(vts)) AS last_view_us
      |  FROM pr GROUP BY click_id
      |)
      |SELECT c.click_id, c.user_id, epoch_us(c.ts) AS click_us,
      |  coalesce(ag.n_views, 0) AS n_views, ag.last_view_us
      |FROM c LEFT JOIN ag USING (click_id)""".stripMargin

  // SemDeDup replay: same planted union, same hash-seeded centroids and
  // nearest-centroid assignment as the IVF oracle, pairwise cosine only
  // within a cluster
  private val semanticDedupOracle: String =
    s"""WITH u AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS emb, label FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 10000000, embedding::DOUBLE[] AS emb, label
       |  FROM embeddings WHERE vec_id % 5 = 0
       |),
       |cent AS (
       |  SELECT row_number() OVER (ORDER BY h, svid) - 1 AS centroid_id, cv FROM (
       |    SELECT md5(vec_id::VARCHAR) AS h, vec_id AS svid, emb AS cv FROM u ORDER BY 1, 2 LIMIT 64)
       |),
       |assign AS (
       |  SELECT vec_id, emb, centroid_id FROM (
       |    SELECT a.vec_id, a.emb, c.centroid_id,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${sqlL2("a.emb", "c.cv")}, c.centroid_id) AS rn
       |    FROM u a CROSS JOIN cent c)
       |  WHERE rn = 1
       |),
       |dup AS (
       |  SELECT DISTINCT r.vec_id AS dup_id
       |  FROM assign l JOIN assign r
       |    ON l.centroid_id = r.centroid_id AND l.vec_id < r.vec_id
       |  WHERE ${sqlCosine("l.emb", "r.emb")} >= 0.999
       |)
       |SELECT vec_id, label FROM u
       |WHERE NOT EXISTS (SELECT 1 FROM dup WHERE dup_id = u.vec_id)""".stripMargin

  // graded contamination: same shingle CTEs as the drop variant, counts
  // instead of an existence filter
  private val contaminationOracle: String =
    raw"""WITH tkd AS (
         |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS tk
         |  FROM documents
         |), sh AS (
         |  SELECT doc_id, CASE WHEN len(tk) >= 8
         |    THEN list_distinct(list_transform(generate_series(1, len(tk)-7), i -> array_to_string(list_slice(tk, i, i+7), ' ')))
         |    ELSE [array_to_string(tk, ' ')] END AS ss
         |  FROM tkd
         |), bench AS (
         |  SELECT DISTINCT unnest(ss) AS s FROM sh WHERE doc_id % 97 = 0
         |), tr AS (
         |  SELECT doc_id, unnest(ss) AS s FROM sh WHERE doc_id % 97 <> 0
         |), tot AS (
         |  SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id
         |), h AS (
         |  SELECT tr.doc_id, count(*) AS n_hits FROM tr JOIN bench b ON tr.s = b.s GROUP BY tr.doc_id
         |)
         |SELECT t.doc_id, t.n_shingles, coalesce(h.n_hits, 0) AS n_hits,
         |  round(coalesce(h.n_hits, 0)::DOUBLE / t.n_shingles, 4) AS contamination
         |FROM tot t LEFT JOIN h ON h.doc_id = t.doc_id""".stripMargin

  // stride-24 windows of 32 tokens; final window short; every doc yields
  // at least one (possibly empty) chunk. Case-preserving tokens (chunk
  // text feeds downstream models, not a dedup key)
  private val chunkOracle: String =
    raw"""WITH tkd AS (
         |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS tk
         |  FROM documents
         |), st AS (
         |  SELECT doc_id, tk, unnest(generate_series(1, greatest(len(tk), 1), 24)) AS s FROM tkd
         |)
         |SELECT doc_id, ((s - 1) // 24) AS chunk_idx,
         |  len(list_slice(tk, s, s + 31)) AS chunk_tokens,
         |  array_to_string(list_slice(tk, s, s + 31), ' ') AS chunk_text
         |FROM st""".stripMargin

  /** Exact dedup replayed semantically (min doc_id per normalized-text
    * fingerprint over the planted union) — robust to NATURAL duplicate
    * texts in the corpus, which exist at sf0.1; a `SELECT * FROM
    * documents` shortcut is only valid when every text is unique.
    */
  private[queries] val exactDedupOracle: String =
    raw"""WITH u AS (
         |  SELECT doc_id, text, lang, source, n_chars FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000000, text, lang, source, n_chars
         |  FROM documents WHERE doc_id % 3 = 0
         |), f AS (
         |  SELECT *, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM u
         |), keep AS (SELECT fp, min(doc_id) AS k FROM f GROUP BY fp)
         |SELECT doc_id, text, lang, source, n_chars
         |FROM f JOIN keep ON f.fp = keep.fp AND f.doc_id = keep.k""".stripMargin

  private val packConcatOracle: String =
    raw"""WITH t AS (
         |  SELECT doc_id, text,
         |    len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0))::BIGINT AS n_tokens,
         |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000) % 16 AS bucket
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, text, n_tokens, bucket,
         |    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) - n_tokens AS cum
         |  FROM t
         |), p AS (
         |  SELECT doc_id, text, n_tokens,
         |    bucket || '/' || CAST(CAST(floor(cum / 2048.0) AS BIGINT) AS VARCHAR) AS bin_id
         |  FROM c
         |)
         |SELECT bin_id, count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,
         |  string_agg(text, ' <eos> ' ORDER BY doc_id) AS packed_text
         |FROM p GROUP BY bin_id""".stripMargin

  private val bm25Oracle =
    raw"""WITH tkd AS (
           |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS tk
           |  FROM documents
           |), dl AS (SELECT doc_id, len(tk)::BIGINT AS dl FROM tkd),
           |w AS (SELECT doc_id, unnest(tk) AS term FROM tkd),
           |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM w GROUP BY 1, 2),
           |stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM dl),
           |q AS (
           |  SELECT doc_id AS query_id, unnest(list_distinct(tk[1:8])) AS term
           |  FROM tkd WHERE doc_id < 3
           |), matched AS (
           |  SELECT tf.* FROM tf JOIN (SELECT DISTINCT term FROM q) qt USING (term)
           |), dfreq AS (SELECT term, count(*)::BIGINT AS dfreq FROM matched GROUP BY 1),
           |ts AS (
           |  SELECT q.query_id, m.doc_id,
           |    CAST(round(
           |      ln((s.n_docs - f.dfreq + 0.5) / (f.dfreq + 0.5) + 1.0)
           |      * (m.tf * 2.2) / (m.tf + (d.dl / (s.sum_dl::DOUBLE / s.n_docs) * 0.75 + 0.25) * 1.2), 8)
           |      AS DECIMAL(18,8)) AS ts
           |  FROM matched m
           |  JOIN q ON m.term = q.term
           |  JOIN dfreq f ON m.term = f.term
           |  JOIN dl d ON m.doc_id = d.doc_id
           |  CROSS JOIN stats s
           |), sc AS (
           |  SELECT query_id, doc_id, round(CAST(sum(ts) AS DOUBLE), 4) AS score
           |  FROM ts GROUP BY 1, 2
           |), r AS (
           |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
           |  FROM sc
           |)
           |SELECT query_id, doc_id, score, rank FROM r WHERE rank <= 10""".stripMargin

  /** Unrolled DuckDB replay of [[BpeTrain.trainMerges]]: k CTE stages of
    * (pair count → argmax → list_reduce merge fold), bit-identical to the
    * engine's iteration because both sides share the same fold semantics
    * and tie-break order.
    */
  /** The shared k-stage CTE prefix (pair count → argmax → merge fold);
    * each `t$i` carries (w, toks, cnt) so both the train and the encode
    * oracle can build on the final token state.
    */
  private def bpeStages(k: Int): String = {
    val stages = (1 to k).map { i =>
      val prev = s"t${i - 1}"
      s"""p$i AS (SELECT p['l'] AS lhs, p['r'] AS rhs, sum(cnt)::BIGINT AS c FROM (
         |  SELECT unnest(list_transform(range(1, len(a)), j -> {'l': a[j], 'r': a[j+1]})) AS p, cnt
         |  FROM (SELECT string_split(toks, chr(31)) AS a, cnt FROM $prev)) GROUP BY 1, 2),
         |m$i AS (SELECT $i AS step, lhs, rhs, lhs || rhs AS merged, c AS pair_count
         |  FROM p$i ORDER BY c DESC, lhs, rhs LIMIT 1),
         |t$i AS (SELECT t.w, list_reduce(list_prepend('', string_split(t.toks, chr(31))), (acc, x) ->
         |  CASE WHEN acc = '' THEN x
         |       WHEN (acc = m.lhs OR ends_with(acc, chr(31) || m.lhs)) AND x = m.rhs THEN acc || x
         |       ELSE acc || chr(31) || x END) AS toks, t.cnt
         |  FROM $prev t, m$i m)""".stripMargin
    }.mkString(",\n")
    raw"""w AS (SELECT w, count(*) AS cnt FROM (
         |  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w FROM documents)
         |  WHERE w <> '' GROUP BY 1),
         |t0 AS (SELECT w, rtrim(regexp_replace(w, '(.)', '\1' || chr(31), 'g'), chr(31)) AS toks, cnt FROM w),
         |$stages""".stripMargin
  }

  private def bpeOracle(k: Int): String =
    s"""WITH ${bpeStages(k)}
       |SELECT * FROM (${(1 to k).map(i => s"SELECT * FROM m$i").mkString(" UNION ALL ")})
       |ORDER BY step""".stripMargin

  private def bpeEncodeOracle(k: Int): String =
    s"""WITH ${bpeStages(k)},
       |docw AS (SELECT doc_id, w FROM (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
       |  FROM documents) WHERE w <> ''),
       |per AS (SELECT d.doc_id, sum(len(string_split(t.toks, chr(31))))::BIGINT AS n
       |  FROM docw d JOIN t$k t ON d.w = t.w GROUP BY 1)
       |SELECT doc.doc_id, coalesce(per.n, 0)::BIGINT AS n_bpe
       |FROM documents doc LEFT JOIN per ON per.doc_id = doc.doc_id""".stripMargin

  /** Unrolled DuckDB replay of [[Graph.pageRank]] over the
    * customer<->supplier graph: k stages of (dangling fold, quantized
    * contribution sum, recurrence) with the recurrence's double
    * expression tree written exactly as the engine computes it.
    */
  private def pageRankOracle(k: Int): String = {
    val stages = (1 to k).map { i =>
      val prev = s"r${i - 1}"
      s"""d$i AS (SELECT coalesce(sum(r.r), 0)::DOUBLE AS dang FROM $prev r
         |  LEFT JOIN od ON od.src = r.node WHERE od.src IS NULL),
         |c$i AS (SELECT e.dst AS node,
         |    sum(round(r.r::DOUBLE / od.deg, 12)::DECIMAL(20,12)) AS inc
         |  FROM edges e JOIN $prev r ON e.src = r.node
         |  JOIN od ON od.src = e.src GROUP BY 1),
         |r$i AS (SELECT n.node,
         |    round((1.0 - 0.85) / nn.n + 0.85 * (
         |      coalesce(c.inc, 0::DECIMAL(20,12))::DOUBLE + d.dang / nn.n),
         |      12)::DECIMAL(20,12) AS r
         |  FROM nodes n CROSS JOIN nn CROSS JOIN d$i d
         |  LEFT JOIN c$i c ON c.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH eb AS (SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS src, s AS dst FROM eb UNION SELECT s, c FROM eb),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
       |od AS (SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
       |r0 AS (SELECT node, round(1.0 / nn.n, 12)::DECIMAL(20,12) AS r
       |  FROM nodes CROSS JOIN nn),
       |$stages
       |SELECT node, r::DOUBLE AS rank FROM r$k
       |ORDER BY r DESC, node LIMIT 50""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "p_bpe_train" -> bpeOracle(6),
    "p_bpe_encode" -> bpeEncodeOracle(6),
    "p_pagerank" -> pageRankOracle(5),
    "p_corpus_pipeline" ->
      raw"""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 97 <> 0 AND n_chars >= 50),
           |ev AS (SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
           |  FROM documents WHERE doc_id % 97 = 0),
           |fp AS (SELECT *, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM corpus),
           |dd AS (SELECT f.* FROM fp f
           |  JOIN (SELECT fp, min(doc_id) AS keep FROM fp GROUP BY 1) k
           |  ON f.fp = k.fp AND f.doc_id = k.keep),
           |dc AS (SELECT * FROM dd WHERE fp NOT IN (SELECT fp FROM ev)),
           |cap AS (SELECT * FROM (SELECT *,
           |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
           |  FROM dc) WHERE rk <= 5)
           |SELECT doc_id, source, lang, n_chars FROM cap
           |WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000) <
           |  CAST(10000 * (CASE lang WHEN 'en' THEN 1.0 ELSE 0.6 END) AS BIGINT)""".stripMargin,
    "p_drift_psi" ->
      """WITH b AS (SELECT * FROM events WHERE event_id % 2 = 0),
        |c AS (SELECT event_id, ts, user_id, event_type, value * 1.3 AS value, props
        |  FROM events WHERE event_id % 2 = 1),
        |st AS (SELECT min(value)::DOUBLE AS mn, max(value)::DOUBLE AS mx
        |  FROM b WHERE value IS NOT NULL),
        |bh AS (SELECT least(greatest(floor((value::DOUBLE - st.mn) / ((st.mx - st.mn) / 10)), 0), 9)::BIGINT AS bin,
        |    count(*)::BIGINT AS n FROM b, st WHERE value IS NOT NULL GROUP BY 1),
        |ch AS (SELECT least(greatest(floor((value::DOUBLE - st.mn) / ((st.mx - st.mn) / 10)), 0), 9)::BIGINT AS bin,
        |    count(*)::BIGINT AS n FROM c, st WHERE value IS NOT NULL GROUP BY 1),
        |tb AS (SELECT count(*)::BIGINT AS t FROM b WHERE value IS NOT NULL),
        |tc AS (SELECT count(*)::BIGINT AS t FROM c WHERE value IS NOT NULL),
        |bins AS (SELECT unnest(range(0, 10))::BIGINT AS bin),
        |vterms AS (SELECT round(
        |    ((coalesce(bh.n, 0) + 0.5) / (tb.t + 0.5 * 10)
        |      - (coalesce(ch.n, 0) + 0.5) / (tc.t + 0.5 * 10))
        |    * ln(((coalesce(bh.n, 0) + 0.5) / (tb.t + 0.5 * 10))
        |      / ((coalesce(ch.n, 0) + 0.5) / (tc.t + 0.5 * 10))), 10)::DECIMAL(22,10) AS term
        |  FROM bins LEFT JOIN bh USING (bin) LEFT JOIN ch USING (bin), tb, tc),
        |vpsi AS (SELECT 'value' AS feature, 'numeric' AS kind, sum(term)::DOUBLE AS psi FROM vterms),
        |cats AS (SELECT event_type AS k FROM b UNION SELECT event_type FROM c),
        |kk AS (SELECT count(*)::BIGINT AS k FROM cats),
        |bc AS (SELECT event_type AS k, count(*)::BIGINT AS n FROM b GROUP BY 1),
        |cc AS (SELECT event_type AS k, count(*)::BIGINT AS n FROM c GROUP BY 1),
        |tbc AS (SELECT count(*)::BIGINT AS t FROM b),
        |tcc AS (SELECT count(*)::BIGINT AS t FROM c),
        |cterms AS (SELECT round(
        |    ((coalesce(bc.n, 0) + 0.5) / (tbc.t + 0.5 * kk.k)
        |      - (coalesce(cc.n, 0) + 0.5) / (tcc.t + 0.5 * kk.k))
        |    * ln(((coalesce(bc.n, 0) + 0.5) / (tbc.t + 0.5 * kk.k))
        |      / ((coalesce(cc.n, 0) + 0.5) / (tcc.t + 0.5 * kk.k))), 10)::DECIMAL(22,10) AS term
        |  FROM cats LEFT JOIN bc USING (k) LEFT JOIN cc USING (k), kk, tbc, tcc),
        |cpsi AS (SELECT 'event_type' AS feature, 'categorical' AS kind, sum(term)::DOUBLE AS psi FROM cterms)
        |SELECT feature, kind, psi, psi > 0.2 AS drifted
        |FROM (SELECT * FROM vpsi UNION ALL SELECT * FROM cpsi)""".stripMargin,
    "p_profile" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 0 THEN NULL ELSE lang END AS lang,
        |    source, n_chars FROM documents)
        |SELECT 'doc_id' AS col_name, count(doc_id)::BIGINT AS non_null,
        |  (count(*) - count(doc_id))::BIGINT AS nulls,
        |  count(DISTINCT doc_id)::BIGINT AS ndv,
        |  CAST(min(doc_id) AS DOUBLE) AS min_num,
        |  CAST(max(doc_id) AS DOUBLE) AS max_num,
        |  CAST(sum(CAST(doc_id AS DECIMAL(28,8))) AS DOUBLE) AS sum_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |FROM d
        |UNION ALL
        |SELECT 'lang', count(lang)::BIGINT, (count(*) - count(lang))::BIGINT,
        |  count(DISTINCT lang)::BIGINT, CAST(NULL AS DOUBLE),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min(lang), max(lang)
        |FROM d
        |UNION ALL
        |SELECT 'source', count(source)::BIGINT, (count(*) - count(source))::BIGINT,
        |  count(DISTINCT source)::BIGINT, CAST(NULL AS DOUBLE),
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min(source), max(source)
        |FROM d
        |UNION ALL
        |SELECT 'n_chars', count(n_chars)::BIGINT, (count(*) - count(n_chars))::BIGINT,
        |  count(DISTINCT n_chars)::BIGINT, CAST(min(n_chars) AS DOUBLE),
        |  CAST(max(n_chars) AS DOUBLE),
        |  CAST(sum(CAST(n_chars AS DECIMAL(28,8))) AS DOUBLE),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |FROM d""".stripMargin,
    "p_data_quality" ->
      """WITH a AS (SELECT o_orderkey + 1000000000 AS o_orderkey,
        |    o_custkey + 90000000 AS o_custkey, 'X' AS o_orderstatus,
        |    -1.0 AS o_totalprice, NULL::TIMESTAMP AS o_orderdate,
        |    '9-BOGUS' AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 1000 = 1),
        |b AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority FROM orders WHERE o_orderkey % 1000 = 2),
        |src AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, o_orderpriority FROM orders
        |  UNION ALL SELECT * FROM a UNION ALL SELECT * FROM b),
        |t AS (SELECT count(*)::BIGINT AS total FROM src),
        |r AS (
        |  SELECT 'not_null(o_orderdate)' AS rule,
        |    (SELECT count(*) FROM src WHERE o_orderdate IS NULL)::BIGINT AS violations,
        |    t.total AS checked FROM t
        |  UNION ALL SELECT 'in_range(o_totalprice,0.0,1000000.0)',
        |    (SELECT count(*) FROM src WHERE o_totalprice IS NOT NULL
        |      AND (o_totalprice < 0 OR o_totalprice > 1000000))::BIGINT, t.total FROM t
        |  UNION ALL SELECT 'in_set(o_orderstatus)',
        |    (SELECT count(*) FROM src WHERE o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('O', 'F', 'P'))::BIGINT, t.total FROM t
        |  UNION ALL SELECT 'matches_regex(o_orderpriority)',
        |    (SELECT count(*) FROM src WHERE o_orderpriority IS NOT NULL
        |      AND NOT regexp_matches(o_orderpriority, '^[1-5]-'))::BIGINT, t.total FROM t
        |  UNION ALL SELECT 'unique(o_orderkey)',
        |    (SELECT count(*) - count(DISTINCT o_orderkey) FROM src)::BIGINT, t.total FROM t
        |  UNION ALL SELECT 'foreign_key(o_custkey)',
        |    (SELECT count(*) FROM src WHERE o_custkey IS NOT NULL
        |      AND o_custkey NOT IN (SELECT c_custkey FROM customer))::BIGINT, t.total FROM t)
        |SELECT rule, violations, checked, violations = 0 AS pass FROM r""".stripMargin,
    "p_nb_classify" ->
      raw"""WITH tr AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
           |te AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
           |trw AS (SELECT lang, w FROM (
           |  SELECT lang, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w FROM tr)
           |  WHERE w <> ''),
           |wc AS (SELECT lang, w, count(*)::BIGINT AS cnt FROM trw GROUP BY 1, 2),
           |tok AS (SELECT lang, sum(cnt)::BIGINT AS tok FROM wc GROUP BY 1),
           |v AS (SELECT count(DISTINCT w)::BIGINT AS v FROM trw),
           |nt AS (SELECT count(*)::BIGINT AS n FROM tr),
           |pri AS (SELECT lang, round(ln(count(*)::DOUBLE / nt.n), 8)::DECIMAL(18,8) AS prior
           |  FROM tr, nt GROUP BY lang, nt.n),
           |model AS (SELECT wc.lang, wc.w,
           |    round(ln((cnt + 1)::DOUBLE / (tok + v.v)::DOUBLE), 8)::DECIMAL(18,8) AS lnp
           |  FROM wc JOIN tok ON wc.lang = tok.lang CROSS JOIN v),
           |dflt AS (SELECT lang, round(ln(1.0 / (tok + v.v)::DOUBLE), 8)::DECIMAL(18,8) AS d
           |  FROM tok CROSS JOIN v),
           |tew AS (SELECT doc_id, w, count(*)::BIGINT AS n FROM (
           |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w FROM te)
           |  WHERE w <> '' GROUP BY 1, 2),
           |ws AS (SELECT t.doc_id, d.lang, sum(t.n * coalesce(m.lnp, d.d)) AS wsum
           |  FROM tew t CROSS JOIN dflt d
           |  LEFT JOIN model m ON m.lang = d.lang AND m.w = t.w
           |  GROUP BY 1, 2),
           |sc AS (SELECT te.doc_id, p.lang,
           |    p.prior + coalesce(ws.wsum, 0::DECIMAL(18,8)) AS score
           |  FROM te CROSS JOIN pri p
           |  LEFT JOIN ws ON ws.doc_id = te.doc_id AND ws.lang = p.lang),
           |rk AS (SELECT doc_id, lang, score,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rk
           |  FROM sc)
           |SELECT doc_id, lang AS predicted, score::DOUBLE AS score
           |FROM rk WHERE rk = 1""".stripMargin,
    "p_event_paths" ->
      """WITH s AS (SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
        |  FROM events GROUP BY 1),
        |g AS (SELECT unnest(list_transform(range(1, len(types) - 1),
        |    i -> types[i] || '>' || types[i+1] || '>' || types[i+2])) AS path
        |  FROM s WHERE len(types) >= 3)
        |SELECT path, count(*)::BIGINT AS n FROM g GROUP BY 1
        |ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "p_weighted_sample" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    round(pow(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000)::DOUBLE + 0.5) / 10000.0,
        |      1.0 / n_chars::DOUBLE), 9)::DECIMAL(12,9) AS k
        |  FROM documents)
        |ORDER BY k DESC, doc_id LIMIT 200""".stripMargin,
    "p_domain_cap" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents) WHERE rk <= 5""".stripMargin,
    // the oracle restates the PSL grouping directly (u*.siteJ.github.io
    // groups per siteJ.github.io, www.shopJ.com.au per shopJ.com.au)
    "p_domain_cap_psl" ->
      """SELECT doc_id, domain, n_chars FROM (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN 'site' || CAST(doc_id % 5 AS VARCHAR) || '.github.io'
        |      ELSE 'shop' || CAST(doc_id % 5 AS VARCHAR) || '.com.au' END AS domain,
        |    row_number() OVER (PARTITION BY (CASE WHEN doc_id % 2 = 0
        |      THEN 'site' || CAST(doc_id % 5 AS VARCHAR) || '.github.io'
        |      ELSE 'shop' || CAST(doc_id % 5 AS VARCHAR) || '.com.au' END)
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents) WHERE rk <= 3""".stripMargin,
    "p_hybrid_retrieval" ->
      raw"""WITH tkd AS (
         |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS tk
         |  FROM documents
         |), dl AS (SELECT doc_id, len(tk)::BIGINT AS dl FROM tkd),
         |w AS (SELECT doc_id, unnest(tk) AS term FROM tkd),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM w GROUP BY 1, 2),
         |stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM dl),
         |q AS (
         |  SELECT doc_id AS query_id, unnest(list_distinct(tk[1:8])) AS term
         |  FROM tkd WHERE doc_id < 3
         |), matched AS (
         |  SELECT tf.* FROM tf JOIN (SELECT DISTINCT term FROM q) qt USING (term)
         |), dfreq AS (SELECT term, count(*)::BIGINT AS dfreq FROM matched GROUP BY 1),
         |ts AS (
         |  SELECT q.query_id, m.doc_id,
         |    CAST(round(
         |      ln((s.n_docs - f.dfreq + 0.5) / (f.dfreq + 0.5) + 1.0)
         |      * (m.tf * 2.2) / (m.tf + (d.dl / (s.sum_dl::DOUBLE / s.n_docs) * 0.75 + 0.25) * 1.2), 8)
         |      AS DECIMAL(18,8)) AS ts
         |  FROM matched m
         |  JOIN q ON m.term = q.term
         |  JOIN dfreq f ON m.term = f.term
         |  JOIN dl d ON m.doc_id = d.doc_id
         |  CROSS JOIN stats s
         |), sc AS (
         |  SELECT query_id, doc_id, round(CAST(sum(ts) AS DOUBLE), 4) AS score
         |  FROM ts GROUP BY 1, 2
         |), lex AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
         |    FROM sc) WHERE rank <= 20
         |), vec AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT qe.vec_id AS query_id, c.vec_id AS doc_id,
         |      row_number() OVER (PARTITION BY qe.vec_id
         |        ORDER BY list_cosine_similarity(qe.embedding, c.embedding) DESC, c.vec_id) AS rank
         |    FROM embeddings qe JOIN embeddings c ON qe.vec_id < 3 AND qe.vec_id <> c.vec_id)
         |  WHERE rank <= 20
         |), parts AS (
         |  SELECT query_id, doc_id, CAST(round(1.0 / (rank + 60), 8) AS DECIMAL(18,8)) AS rr FROM lex
         |  UNION ALL
         |  SELECT query_id, doc_id, CAST(round(1.0 / (rank + 60), 8) AS DECIMAL(18,8)) AS rr FROM vec
         |), fused AS (
         |  SELECT query_id, doc_id, round(CAST(sum(rr) AS DOUBLE), 6) AS rrf_score
         |  FROM parts GROUP BY 1, 2)
         |SELECT query_id, doc_id, rrf_score, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
         |  FROM fused) WHERE rank <= 10""".stripMargin,
    "p_dsir_weights" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0)) AS w
         |  FROM documents),
         |tb AS (
         |  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT % 1024 AS b FROM tok),
         |tgt AS (SELECT b, count(*) AS c FROM tb WHERE doc_id % 5 = 0 GROUP BY 1),
         |raww AS (SELECT b, count(*) AS c FROM tb WHERE doc_id % 5 <> 0 GROUP BY 1),
         |tot AS (SELECT
         |  (SELECT coalesce(sum(c), 0) FROM tgt) AS tt,
         |  (SELECT coalesce(sum(c), 0) FROM raww) AS rt),
         |llr AS (
         |  SELECT bs.b,
         |    ln((coalesce(tgt.c, 0) + 1)::DOUBLE / (tot.tt + 1024)::DOUBLE)
         |  - ln((coalesce(raww.c, 0) + 1)::DOUBLE / (tot.rt + 1024)::DOUBLE) AS lw
         |  FROM (SELECT unnest(range(0, 1024)) AS b) bs
         |  LEFT JOIN tgt ON bs.b = tgt.b
         |  LEFT JOIN raww ON bs.b = raww.b
         |  CROSS JOIN tot),
         |sc AS (
         |  SELECT tb.doc_id, sum(llr.lw) AS w
         |  FROM tb JOIN llr ON tb.b = llr.b
         |  WHERE tb.doc_id % 5 <> 0 GROUP BY 1)
         |SELECT d.doc_id, round(coalesce(sc.w, 0.0), 4) AS dsir_logw
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         |WHERE d.doc_id % 5 <> 0""".stripMargin,
    "p_lm_perplexity" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS t
         |  FROM documents),
         |pairs AS (
         |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
         |  FROM tok, UNNEST(range(1, CASE WHEN len(t) > 1 THEN len(t) ELSE 1 END)) AS r(i)),
         |tpairs AS (SELECT * FROM pairs WHERE doc_id % 5 <> 0),
         |bi AS (SELECT w1, w2, count(*) AS c2 FROM tpairs GROUP BY 1, 2),
         |uni AS (SELECT w1, count(*) AS c1 FROM tpairs GROUP BY 1),
         |voc AS (
         |  SELECT count(DISTINCT w) AS v FROM (
         |    SELECT unnest(t) AS w FROM tok WHERE doc_id % 5 <> 0)),
         |sc AS (
         |  SELECT p.doc_id,
         |    avg(ln((coalesce(bi.c2, 0) + 1)::DOUBLE / (coalesce(uni.c1, 0) + voc.v)::DOUBLE)) AS avg_logp
         |  FROM pairs p
         |  LEFT JOIN bi ON p.w1 = bi.w1 AND p.w2 = bi.w2
         |  LEFT JOIN uni ON p.w1 = uni.w1
         |  CROSS JOIN voc
         |  GROUP BY p.doc_id)
         |SELECT d.doc_id, round(coalesce(sc.avg_logp, ln(1.0 / voc.v)), 4) AS avg_logp
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id CROSS JOIN voc""".stripMargin,
    "p_pii_cc" ->
      """SELECT doc_id, 'doc ' || doc_id ||
        | ' pay <CC> or <CC> amex <CC> bad 4111111111111112 ref 555-123-4567 end'
        | AS text_out FROM documents""".stripMargin,
    "p_pii_scrub" ->
      s"""WITH planted AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % 2 = 0
         |         THEN ' contact user' || doc_id || '@example.com please' ELSE '' END
         |    || ' node 10.0.' || (doc_id % 200) || '.7 up'
         |    || CASE WHEN doc_id % 3 = 0 THEN ' call 555-123-4567 now' ELSE '' END
         |    AS text
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
         |    '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g') AS clean_text,
         |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END + 1
         |     + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INTEGER) AS n_pii
         |FROM planted""".stripMargin,
    "p_c4_clean" ->
      s"""SELECT doc_id,
         |  'the quick brown fox jumps over dock ' || doc_id || '.' || chr(10) ||
         |  'a second good line stays right here.' || chr(10) ||
         |  'the third good line survives the cleaning pass.' AS text,
         |  CAST(3 AS INTEGER) AS n_lines
         |FROM documents WHERE doc_id % 7 <> 0 AND doc_id % 3 <> 0""".stripMargin,
    "p_line_dedup" ->
      s"""WITH d AS (SELECT doc_id,
         |  'subscribe to our newsletter today' || chr(10) || text || chr(10) ||
         |  (CASE WHEN doc_id % 4 = 0 THEN 'cookie policy applies here'
         |        ELSE 'closing line for ' || doc_id END) ||
         |  chr(10) || 'copyright acme corp' AS txt FROM documents),
         |l AS (SELECT doc_id,
         |  unnest(string_split(txt, chr(10))) AS line,
         |  generate_subscripts(string_split(txt, chr(10)), 1) AS pos FROM d),
         |f AS (SELECT md5(line) AS fp, count(DISTINCT doc_id) AS df FROM l GROUP BY 1),
         |k AS (SELECT l.doc_id, l.pos, l.line FROM l
         |      LEFT JOIN (SELECT fp FROM f WHERE df > 2) b ON md5(l.line) = b.fp
         |      WHERE b.fp IS NULL),
         |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS txt,
         |        count(*) AS kept FROM k GROUP BY 1),
         |tot AS (SELECT doc_id, count(*) AS total FROM l GROUP BY 1)
         |SELECT t.doc_id, t.total - COALESCE(a.kept, 0) AS n_dropped,
         |       md5(COALESCE(a.txt, '')) AS clean_fp
         |FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id""".stripMargin,
    "p_dedup_spans" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |w AS (SELECT doc_id, ts,
         |  unnest(generate_series(1, greatest(len(ts) - 19, 0))) AS s FROM toks),
         |wins AS (SELECT doc_id, s,
         |  md5(array_to_string(ts[s:s+19], ' ')) AS fp FROM w),
         |dup AS (SELECT fp FROM wins GROUP BY fp HAVING count(*) >= 2),
         |ds AS (SELECT doc_id, s FROM wins JOIN dup USING (fp)),
         |p AS (SELECT doc_id, unnest(ts) AS tok,
         |  generate_subscripts(ts, 1) AS pos FROM toks),
         |kept AS (SELECT p.doc_id, p.tok, p.pos FROM p
         |  WHERE NOT EXISTS (SELECT 1 FROM ds
         |    WHERE ds.doc_id = p.doc_id AND ds.s <= p.pos AND p.pos < ds.s + 20)),
         |a AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
         |  count(*) AS n_kept FROM kept GROUP BY doc_id),
         |t AS (SELECT doc_id, len(ts) AS n FROM toks)
         |SELECT t.doc_id, CAST(t.n - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped,
         |  md5(COALESCE(a.text, '')) AS clean_fp
         |FROM t LEFT JOIN a USING (doc_id)""".stripMargin,
    "p_dedup_spans_incremental" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts,
         |  CASE WHEN doc_id <= (SELECT max(doc_id) FROM documents) // 3 THEN 1
         |       WHEN doc_id <= (2 * (SELECT max(doc_id) FROM documents)) // 3 THEN 2
         |       ELSE 3 END AS tick
         |  FROM documents),
         |w AS (SELECT doc_id, tick, ts,
         |  unnest(generate_series(1, greatest(len(ts) - 19, 0))) AS s FROM toks),
         |wins AS (SELECT doc_id, tick, s,
         |  md5(array_to_string(ts[s:s+19], ' ')) AS fp FROM w),
         |tickcnt AS (SELECT tick, fp, count(*) AS c FROM wins GROUP BY 1, 2),
         |firsttick AS (SELECT fp, min(tick) AS mt FROM wins GROUP BY 1),
         |ds AS (SELECT w.doc_id, w.s FROM wins w
         |  JOIN tickcnt tc ON tc.tick = w.tick AND tc.fp = w.fp
         |  JOIN firsttick ft ON ft.fp = w.fp
         |  WHERE tc.c >= 2 OR ft.mt < w.tick),
         |p AS (SELECT doc_id, unnest(ts) AS tok,
         |  generate_subscripts(ts, 1) AS pos FROM toks),
         |kept AS (SELECT p.doc_id, p.tok, p.pos FROM p
         |  WHERE NOT EXISTS (SELECT 1 FROM ds
         |    WHERE ds.doc_id = p.doc_id AND ds.s <= p.pos AND p.pos < ds.s + 20)),
         |a AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, md5(COALESCE(a.text, '')) AS clean_fp
         |FROM toks t LEFT JOIN a USING (doc_id)""".stripMargin,
    "p_decontaminate" -> decontaminateOracle,
    // incremental == batch (contamination is order-independent)
    "p_decontaminate_incremental" -> decontaminateOracle,
    // graded per-suite thresholds: easy drops only past 0.6 of the doc's
    // distinct shingles, strict drops on ANY hit — independent
    // restatement of the batch contaminationScore rule over the same
    // planted marker passages
    "p_decontaminate_graded_incremental" -> {
      val easy = (1 to 12).map(i => s"zqe$i").mkString(" ")
      val strict = (1 to 10).map(i => s"zqs$i").mkString(" ")
      raw"""WITH planted AS (
           |  SELECT * REPLACE (CASE
           |    WHEN doc_id % 11 = 0 THEN '$easy'
           |    WHEN doc_id % 7 = 0 THEN text || ' $strict'
           |    WHEN doc_id % 3 = 0 THEN text || ' $easy'
           |    ELSE text END AS text)
           |  FROM documents),
           |tkd AS (SELECT doc_id, list_filter(
           |  string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS tk
           |  FROM planted),
           |sh AS (SELECT doc_id, CASE WHEN len(tk) >= 8
           |  THEN list_distinct(list_transform(generate_series(1, len(tk)-7),
           |    i -> array_to_string(list_slice(tk, i, i+7), ' ')))
           |  ELSE [array_to_string(tk, ' ')] END AS ss FROM tkd),
           |bs AS (
           |  SELECT 'easy' AS suite, unnest(list_transform(generate_series(1, 5),
           |    i -> array_to_string(list_slice(string_split('$easy', ' '), i, i+7), ' '))) AS s
           |  UNION ALL
           |  SELECT 'strict' AS suite, unnest(list_transform(generate_series(1, 3),
           |    i -> array_to_string(list_slice(string_split('$strict', ' '), i, i+7), ' '))) AS s),
           |tot AS (SELECT doc_id, len(ss) AS tot FROM sh),
           |hits AS (SELECT e.doc_id, b.suite, count(*) AS h
           |  FROM (SELECT doc_id, unnest(ss) AS s FROM sh) e
           |  JOIN bs b ON e.s = b.s GROUP BY 1, 2),
           |bad AS (SELECT DISTINCT h.doc_id FROM hits h JOIN tot t USING (doc_id)
           |  WHERE (h.suite = 'easy' AND CAST(h.h AS DOUBLE) / t.tot > 0.6)
           |     OR (h.suite = 'strict' AND h.h > 0))
           |SELECT p.* FROM planted p
           |WHERE NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = p.doc_id)""".stripMargin
    },
    "p_pack_bins" -> packBinsOracle,
    "p_pack_concat" -> packConcatOracle,
    "p_quality_repetition" -> repetitionOracle,
    // host/path/query via regex (DuckDB has no parse_url), then the same
    // strip-filter-sort-join pipeline. The percent-encoded arm (%5=4) is
    // restated as its expected LITERAL normalized form (unreserved %41/%7e
    // decoded, reserved %2f kept with uppercased hex) rather than
    // replaying the RFC 3986 machinery
    "p_url_canonical" ->
      raw"""WITH u AS (SELECT doc_id, CASE CAST(doc_id % 5 AS INTEGER)
           |  WHEN 0 THEN 'http://www.site' || CAST(doc_id % 11 AS VARCHAR) || '.com:80/a/' ||
           |    CAST(doc_id % 5 AS VARCHAR) || '/?utm_source=x&q=' ||
           |    CAST(doc_id % 7 AS VARCHAR) || '&b=1#f'
           |  WHEN 1 THEN 'https://site' || CAST(doc_id % 11 AS VARCHAR) || '.com/a/' ||
           |    CAST(doc_id % 5 AS VARCHAR)
           |  WHEN 2 THEN 'https://Sub.site' || CAST(doc_id % 11 AS VARCHAR) || '.co.uk:443/p?gclid=2'
           |  WHEN 3 THEN 'http://site' || CAST(doc_id % 11 AS VARCHAR) || '.com:8080/a'
           |  ELSE 'https://site' || CAST(doc_id % 11 AS VARCHAR) || '.com/pAth~/x%2Fy?name=v%2F1'
           |  END AS url FROM documents),
           |h AS (SELECT doc_id,
           |  regexp_replace(lower(regexp_extract(url,
           |    '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)), '^www\.', '') AS host,
           |  lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
           |  regexp_extract(regexp_extract(url,
           |    '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1), ':(\d+)$$', 1) AS port,
           |  regexp_replace(regexp_extract(url,
           |    '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/$$', '') AS path,
           |  coalesce(regexp_extract(url, '^[^?#]*\?([^#]*)', 1), '') AS q FROM u),
           |k AS (SELECT doc_id, host,
           |  CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
           |         OR (scheme = 'https' AND port = '443') THEN ''
           |       ELSE ':' || port END AS portsfx,
           |  path, coalesce(array_to_string(list_sort(
           |  list_filter(string_split(q, '&'), p -> NOT (starts_with(p, 'utm_')
           |    OR starts_with(p, 'fbclid=') OR starts_with(p, 'gclid=') OR p = ''))),
           |  '&'), '') AS query FROM h)
           |SELECT doc_id, host || portsfx || path ||
           |  CASE WHEN query = '' THEN '' ELSE '?' || query END AS canonical
           |FROM k""".stripMargin,
    // the oracle states the EXPECTED registrable grouping per PSL rule
    // class directly (the fixture hosts are deterministic in doc_id), an
    // independent restatement rather than a replay of the rule machinery
    "p_url_psl" ->
      """SELECT doc_id, CASE CAST(doc_id % 6 AS INTEGER)
        |  WHEN 0 THEN 'alpha' || CAST(doc_id % 7 AS VARCHAR) || '.github.io'
        |  WHEN 1 THEN 'shop' || CAST(doc_id % 7 AS VARCHAR) || '.com.au'
        |  WHEN 2 THEN 'corp' || CAST(doc_id % 7 AS VARCHAR) || '.co.jp'
        |  WHEN 3 THEN 'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.ck'
        |  WHEN 4 THEN 'www.ck'
        |  ELSE 'b.example' END AS domain
        |FROM documents""".stripMargin,
    // host via regex (DuckDB has no parse_url), domain via the same
    // label rules
    "p_url_domains" ->
      raw"""WITH u AS (SELECT doc_id,
           |  'https://' || CASE WHEN doc_id % 4 = 1 THEN 'user@' ELSE '' END ||
           |  CASE doc_id % 4 WHEN 0 THEN 'Example.com'
           |    WHEN 1 THEN 'sub.news.example.co.uk'
           |    WHEN 2 THEN 'a' || CAST(doc_id % 7 AS VARCHAR) || '.blog.org'
           |    ELSE 'cdn.example.net' END ||
           |  CASE WHEN doc_id % 3 = 0 THEN ':8080' ELSE '' END ||
           |  '/p/' || CAST(doc_id AS VARCHAR) AS url FROM documents),
           |h AS (SELECT doc_id,
           |  lower(regexp_extract(url,
           |    '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)) AS host
           |  FROM u),
           |d AS (SELECT doc_id, host, string_split(host, '.') AS ls FROM h)
           |SELECT doc_id, host,
           |  CASE WHEN len(ls) <= 2 THEN host
           |       WHEN ls[len(ls)-1] IN ('co','com','net','org','gov','edu','ac')
           |         THEN ls[len(ls)-2] || '.' || ls[len(ls)-1] || '.' || ls[len(ls)]
           |       ELSE ls[len(ls)-1] || '.' || ls[len(ls)] END AS domain
           |FROM d""".stripMargin,
    // the SAME \x{...} character-class chain replayed under RE2; the
    // planted framing is rebuilt from chr() code points
    "p_text_normalize" ->
      raw"""WITH m AS (SELECT doc_id,
           |  chr(8220) || 'start' || chr(8221) || chr(160) || text ||
           |  ' ' || chr(8212) || ' tail' || chr(8230) || ' ' || chr(8216) ||
           |  'q' || chr(8217) || chr(8203) || 'z' || chr(7) || ' end' ||
           |  chr(9) || 'ok' || chr(13) || chr(10) || 'nl ' || chr(13) || 'cr' AS t FROM documents),
           |n0 AS (SELECT doc_id, regexp_replace(t, '\r\n?', chr(10), 'g') AS t FROM m),
           |n1 AS (SELECT doc_id, regexp_replace(t, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g') AS t FROM n0),
           |n2 AS (SELECT doc_id, regexp_replace(t, '[\x{200B}-\x{200D}\x{FEFF}]', '', 'g') AS t FROM n1),
           |n3 AS (SELECT doc_id, regexp_replace(t, '[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]', ' ', 'g') AS t FROM n2),
           |n4 AS (SELECT doc_id, regexp_replace(t, '[\x{2018}\x{2019}\x{201A}\x{201B}]', chr(39), 'g') AS t FROM n3),
           |n5 AS (SELECT doc_id, regexp_replace(t, '[\x{201C}\x{201D}\x{201E}\x{201F}]', '"', 'g') AS t FROM n4),
           |n6 AS (SELECT doc_id, regexp_replace(t, '[\x{2010}-\x{2015}\x{2212}]', '-', 'g') AS t FROM n5),
           |n7 AS (SELECT doc_id, regexp_replace(t, '\x{2026}', '...', 'g') AS t FROM n6),
           |n8 AS (SELECT doc_id, regexp_replace(t, '[ \t]+', ' ', 'g') AS t FROM n7)
           |SELECT doc_id, t AS text_out, length(t)::BIGINT AS n_chars_out FROM n8""".stripMargin,
    // the expected punycode mapping stated as a LITERAL (xn--bcher-kva
    // is the RFC 3492 encoding of 'bücher') — an independent
    // restatement, DuckDB has no IDN machinery
    "p_url_idn" ->
      """SELECT doc_id, CASE CAST(doc_id % 3 AS INTEGER)
        |  WHEN 0 THEN 'b' || CAST(doc_id % 5 AS VARCHAR) || '.xn--bcher-kva.example'
        |  WHEN 1 THEN 'b' || CAST(doc_id % 5 AS VARCHAR) || '.xn--bcher-kva.example'
        |  ELSE 'plain' || CAST(doc_id % 5 AS VARCHAR) || '.example' END AS host
        |FROM documents""".stripMargin,
    // the NFKC foldings are stated as LITERALS (full-width → ASCII,
    // ligatures expanded, superscript/roman/unit decomposed, combining
    // acute composed to chr(233)) — DuckDB lacks NFKC, so this is an
    // independent restatement, not a replay; only the ASCII chain (the
    // same one as p_text_normalize) replays over the doc text
    "p_text_nfkc" ->
      raw"""WITH m AS (SELECT doc_id,
           |  'Graft123 file x2 XII ' || chr(233) || ' ' || text ||
           |  ' fly km done' AS t FROM documents),
           |n0 AS (SELECT doc_id, regexp_replace(t, '\r\n?', chr(10), 'g') AS t FROM m),
           |n1 AS (SELECT doc_id, regexp_replace(t, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g') AS t FROM n0),
           |n2 AS (SELECT doc_id, regexp_replace(t, '[\x{200B}-\x{200D}\x{FEFF}]', '', 'g') AS t FROM n1),
           |n3 AS (SELECT doc_id, regexp_replace(t, '[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]', ' ', 'g') AS t FROM n2),
           |n4 AS (SELECT doc_id, regexp_replace(t, '[\x{2018}\x{2019}\x{201A}\x{201B}]', chr(39), 'g') AS t FROM n3),
           |n5 AS (SELECT doc_id, regexp_replace(t, '[\x{201C}\x{201D}\x{201E}\x{201F}]', '"', 'g') AS t FROM n4),
           |n6 AS (SELECT doc_id, regexp_replace(t, '[\x{2010}-\x{2015}\x{2212}]', '-', 'g') AS t FROM n5),
           |n7 AS (SELECT doc_id, regexp_replace(t, '\x{2026}', '...', 'g') AS t FROM n6),
           |n8 AS (SELECT doc_id, regexp_replace(t, '[ \t]+', ' ', 'g') AS t FROM n7)
           |SELECT doc_id, t AS text_out, length(t)::BIGINT AS n_chars_out FROM n8""".stripMargin,
    // literal restatement: NFKC collapses each 3-variant family to its
    // base id (min wins) while default fingerprints keep all 3 distinct
    "p_dedup_nfkc" ->
      """SELECT doc_id, 3 AS n_fp_default FROM documents
        | WHERE doc_id < 50""".stripMargin,
    // first-occurrence filter replayed with DuckDB's 1-based indexed
    // lambda (Spark's filter index is 0-based — both compare against the
    // 1-based list_position/array_position)
    "p_line_dedup_within" ->
      raw"""WITH planted AS (SELECT doc_id,
           |  'NAV MENU' || chr(10) || text || chr(10) || 'NAV MENU' || chr(10)
           |  || string_split(text, chr(10))[1] || chr(10)
           |  || '(c) footer' || chr(10) || '(c) footer' AS t FROM documents)
           |SELECT doc_id, array_to_string(
           |  list_filter(string_split(t, chr(10)),
           |    (x, i) -> list_position(string_split(t, chr(10)), x) = i),
           |  chr(10)) AS text_out
           |FROM planted""".stripMargin,
    // the SAME regex chain, replayed verbatim under DuckDB's RE2 (the
    // patterns avoid backreferences for exactly this portability)
    "p_html_extract" ->
      raw"""WITH h AS (SELECT doc_id,
           |  '<html><head><title>t</title><style>p { color: red }</style><script>var x = "<p>";</script></head><body><h1>Title</h1><p>'
           |  || text ||
           |  '</p><!-- trailing comment --><footer>&amp; &lt;fin&gt;&nbsp;ok &amp;lt;esc&amp;gt;</footer></body></html>' AS t
           |  FROM documents),
           |s1 AS (SELECT doc_id, regexp_replace(t, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
           |s2 AS (SELECT doc_id, regexp_replace(t, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
           |s3 AS (SELECT doc_id, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
           |s4 AS (SELECT doc_id, regexp_replace(t, '(?s)<[^>]*>', ' ', 'g') AS t FROM s3),
           |s5 AS (SELECT doc_id,
           |  replace(replace(replace(replace(replace(replace(t,
           |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
           |    '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS t FROM s4),
           |s6 AS (SELECT doc_id, trim(regexp_replace(t, '\s+', ' ', 'g')) AS text_out FROM s5)
           |SELECT doc_id, text_out, CAST(length(text_out) AS INTEGER) AS n_chars_out FROM s6""".stripMargin,
    // the salted join must be invisible in the answer: oracle is the
    // PLAIN join (dim = distinct fact keys, so inner join keeps all rows)
    "p_salted_join" ->
      """WITH fact AS (SELECT CASE WHEN event_id % 3 = 0 THEN 0
        |  ELSE user_id END AS user_id, value FROM events)
        |SELECT user_id % 7 AS segment, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM fact GROUP BY 1""".stripMargin,
    "p_range_join" -> rangeJoinOracle,
    "p_dedup_semantic" -> semanticDedupOracle,
    "p_contamination" -> contaminationOracle,
    "p_chunk_docs" -> chunkOracle,
    // band membership + exact jaccard replayed over the corpus UNION the
    // planted 80%-prefix queries (offset ids); rank ties break on id
    "p_similar_docs" ->
      s"""WITH qd AS (
         |  SELECT doc_id + 1000000 AS doc_id,
         |    array_to_string(list_slice(tk, 1, greatest(1, (len(tk)*4+4)//5)), ' ') AS text
         |  FROM (SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> len(x) > 0) AS tk
         |        FROM documents WHERE doc_id < 3)
         |), ad AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id, text FROM qd),
         |${sigCtes("ad")},
         |shs AS (
         |  SELECT doc_id, CASE WHEN len(tk) >= 3
         |    THEN list_distinct(list_transform(generate_series(1, len(tk)-2), i -> array_to_string(list_slice(tk, i, i+2), ' ')))
         |    ELSE [array_to_string(tk, ' ')] END AS ss
         |  FROM toks
         |),
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS qid, r.doc_id AS cid
         |  FROM sig l JOIN sig r ON l.doc_id >= 1000000 AND r.doc_id < 1000000
         |   AND $bandEq
         |),
         |scored AS (
         |  SELECT c.qid, c.cid,
         |    CASE WHEN len(list_distinct(list_concat(sq.ss, sc.ss))) = 0 THEN 0.0
         |      ELSE len(list_intersect(sq.ss, sc.ss))::DOUBLE / len(list_distinct(list_concat(sq.ss, sc.ss))) END AS jac
         |  FROM cand c JOIN shs sq ON sq.doc_id = c.qid JOIN shs sc ON sc.doc_id = c.cid
         |)
         |SELECT query_id - 1000000 AS query_id, neighbor_id, jaccard, rank FROM (
         |  SELECT qid AS query_id, cid AS neighbor_id, round(jac, 4) AS jaccard,
         |    row_number() OVER (PARTITION BY qid ORDER BY jac DESC, cid) AS rank
         |  FROM scored)
         |WHERE rank <= 10""".stripMargin,
    "p_doc_commonness" ->
      raw"""WITH tkd AS (
           |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS tk
           |  FROM documents
           |), w AS (SELECT doc_id, unnest(tk) AS word FROM tkd),
           |v AS (SELECT word, count(*) AS wc FROM w GROUP BY word),
           |tot AS (SELECT count(*) AS total FROM w),
           |agg AS (
           |  SELECT w.doc_id, count(*) AS n_tokens, sum(v.wc)::BIGINT AS sum_wc
           |  FROM w JOIN v USING (word) GROUP BY w.doc_id
           |)
           |SELECT doc_id, n_tokens, sum_wc,
           |  round(sum_wc::DOUBLE / (n_tokens * (SELECT total FROM tot)), 6) AS commonness
           |FROM agg""".stripMargin,
    "p_bm25_topk" -> bm25Oracle,
    "p_bm25_index_table" -> bm25Oracle,
    "p_rollup_incremental" ->
      """WITH src AS (
        |  SELECT o_custkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 7 <> 0
        |)
        |SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM src GROUP BY 1""".stripMargin,
    "p_tfidf_keywords" ->
      raw"""WITH tkd AS (
           |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS tk
           |  FROM documents
           |), w AS (SELECT doc_id, unnest(tk) AS term FROM tkd),
           |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM w GROUP BY 1, 2),
           |stats AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
           |dfreq AS (SELECT term, count(*)::BIGINT AS dfreq FROM tf GROUP BY 1),
           |sc AS (
           |  SELECT tf.doc_id, tf.term,
           |    round(tf.tf * ln(s.n_docs::DOUBLE / f.dfreq), 4) AS score
           |  FROM tf JOIN dfreq f USING (term) CROSS JOIN stats s
           |), r AS (
           |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
           |  FROM sc
           |)
           |SELECT doc_id, term, score, rank FROM r WHERE rank <= 3""".stripMargin,
    "p_vocab_topk" ->
      raw"""WITH tkd AS (
           |  SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS tk
           |  FROM documents
           |), w AS (SELECT unnest(tk) AS word FROM tkd)
           |SELECT word, count(*) AS n FROM w GROUP BY word
           |ORDER BY n DESC, word LIMIT 100""".stripMargin,
    "p_embed_stats" ->
      """WITH e AS (SELECT embedding::DOUBLE[] AS emb FROM embeddings),
        |dims AS (SELECT unnest(generate_series(0, (SELECT max(len(emb)) FROM e) - 1)) AS dim)
        |SELECT d.dim, count(e.emb[d.dim + 1]) AS n,
        |  CAST(sum(CAST(e.emb[d.dim + 1] AS DECIMAL(28,10))) AS DOUBLE) / count(e.emb[d.dim + 1]) AS mean,
        |  min(e.emb[d.dim + 1]) AS vmin, max(e.emb[d.dim + 1]) AS vmax
        |FROM e CROSS JOIN dims d GROUP BY d.dim""".stripMargin,
    "p_gap_fill_daily" ->
      s"""WITH sparse AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events,
         |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         |  FROM events GROUP BY 1, 2),
         |spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1
         |  FROM sparse GROUP BY 1),
         |dense AS (SELECT user_id,
         |  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
         |    INTERVAL 1 DAY)) AS DATE) AS day FROM spans)
         |SELECT d.user_id, strftime(d.day, '%Y-%m-%d') AS day,
         |  COALESCE(s.n_events, 0) AS n_events,
         |  COALESCE(s.sum_value, 0.0) AS sum_value
         |FROM dense d LEFT JOIN sparse s
         |  ON s.user_id = d.user_id AND s.day = d.day""".stripMargin,
    "p_sessionize" -> sessionizeOracle,
    // the incremental service must converge to the from-scratch answer
    "p_sessionize_incremental" -> sessionizeOracle,
    // streaming flatMapGroupsWithState must converge to the batch answer
    "p_sessionize_streaming" -> sessionizeOracle,
    // streaming first-seen dedup over id-ordered batches == min id per
    // normalized-text fingerprint (no planted union — the corpus's own
    // natural duplicates are the test)
    "p_dedup_streaming" ->
      raw"""WITH f AS (
           |  SELECT *, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM documents
           |), keep AS (SELECT fp, min(doc_id) AS k FROM f GROUP BY fp)
           |SELECT doc_id, text, lang, source, n_chars
           |FROM f JOIN keep ON f.fp = keep.fp AND f.doc_id = keep.k""".stripMargin,
    // finalized streaming windows == the batch hourly rollup
    "p_stream_windowed_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, event_type,
        |count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "p_stream_stream_join" ->
      """SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
        |  epoch_us(c.ts) - epoch_us(v.ts) AS delay_us
        |FROM events v JOIN events c
        |  ON v.user_id = c.user_id AND v.event_type = 'view' AND c.event_type = 'click'
        |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE""".stripMargin,
    "p_asof_join" -> asofOracle,
    "p_sample_stratified" -> stratifiedOracle,
    // replays the rate derivation: N = min(count/weight) over strata,
    // rate = min(1, N*w/count); floor matches Spark's long-cast truncation
    "p_sample_mix" ->
      """WITH counts AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
        |w(s, wt) AS (VALUES ('src0', 0.5), ('src1', 0.25), ('src2', 0.25)),
        |n AS (SELECT min(c / wt) AS nv FROM counts JOIN w ON source = s),
        |rates AS (SELECT s, least(1.0, (SELECT nv FROM n) * wt / c) AS rate
        |          FROM w JOIN counts ON source = s)
        |SELECT d.* FROM documents d JOIN rates r ON d.source = r.s
        |WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000) <
        |  CAST(floor(r.rate * 10000) AS BIGINT)""".stripMargin,
    // the alpha rule replayed in double math with the engine's 9-decimal
    // rate quantization (pow's last-ulp drift is absorbed by the round)
    "p_sample_temperature" ->
      """WITH counts AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
        |p AS (SELECT lang, c, pow(c::DOUBLE, 0.5) AS pw FROM counts),
        |z AS (SELECT sum(pw) AS zv FROM p),
        |n AS (SELECT min(c::DOUBLE * (SELECT zv FROM z) / pw) AS nv FROM p),
        |rates AS (SELECT lang,
        |  round(least(1.0::DOUBLE, (SELECT nv FROM n) * (pw / (SELECT zv FROM z)) / c::DOUBLE), 9) AS rate
        |  FROM p)
        |SELECT d.* FROM documents d JOIN rates r USING (lang)
        |WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000) <
        |  CAST(floor(r.rate * 10000) AS BIGINT)""".stripMargin,
    "p_train_test_split" -> splitOracle,
    "p_corpus_shuffle" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ' ep1'), doc_id) AS BIGINT) - 1 AS pos
        |FROM documents""".stripMargin,
    "p_heavy_hitters" ->
      raw"""WITH tkd AS (
           |  SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS tk
           |  FROM documents
           |), w AS (SELECT unnest(tk) AS word FROM tkd)
           |SELECT word, count(*) AS n FROM w GROUP BY word
           |HAVING n >= 900 ORDER BY n DESC, word""".stripMargin,
    "p_dedup_exact" -> exactDedupOracle,
    "p_dedup_minhash" -> minhashOracle,
    // incremental service must converge to the from-scratch answer
    "p_dedup_incremental" -> minhashOracle,
    // every doc near-dups its family minimum (same pHash construction as
    // p_image_phash_dedup), so the incremental service's steady state is
    // exactly the 16 family minima
    "p_image_dedup_incremental" ->
      "SELECT doc_id, lang, source FROM documents WHERE doc_id < 16",
    // id-ordered streaming replay must converge to the same 16 minima
    "p_image_dedup_streaming" ->
      "SELECT doc_id, lang, source FROM documents WHERE doc_id < 16",
    // cluster closure + quality argmax, both replayed exactly
    "p_dedup_representatives" ->
      raw"""WITH RECURSIVE $fnvSigCtes,
           |pr AS (
           |  SELECT l.doc_id AS a, r.doc_id AS b
           |  FROM sig l JOIN sig r ON l.doc_id < r.doc_id
           |   AND $bandEq
           |  WHERE len(list_filter(list_transform(generate_series(1,64), j -> l.sg[j] = r.sg[j]), x -> x))::DOUBLE / 64 >= 0.6
           |),
           |edges AS (SELECT a AS s, b AS d FROM pr UNION ALL SELECT b AS s, a AS d FROM pr),
           |cc AS (
           |  SELECT doc_id AS id, doc_id AS label FROM documents
           |  UNION
           |  SELECT e.d AS id, cc.label FROM cc JOIN edges e ON e.s = cc.id
           |),
           |clusters AS (SELECT id AS doc_id, min(label) AS cluster_id FROM cc GROUP BY id),
           |qs0 AS (
           |  SELECT doc_id, text, length(text) AS nch,
           |    list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS qtoks,
           |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS qltoks
           |  FROM documents
           |), qm AS (
           |  SELECT doc_id, nch,
           |    CASE WHEN len(qtoks)=0 THEN 0.0
           |      ELSE list_sum(list_transform(qtoks, x -> len(x)))::DOUBLE / len(qtoks) END AS awl,
           |    CASE WHEN nch=0 THEN 0.0
           |      ELSE (nch - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')))::DOUBLE / nch END AS pr2,
           |    CASE WHEN nch=0 THEN 0.0
           |      ELSE (nch - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / nch END AS dr,
           |    CASE WHEN len(qtoks)=0 THEN 0.0
           |      ELSE len(list_filter(qltoks,
           |        x -> list_contains(['the','of','and','to','in','a','is','that','it','was','for','on','are','as','with','at','be','this','have','or'], x)))::DOUBLE
           |        / len(qtoks) END AS sr
           |  FROM qs0
           |), qq AS (
           |  SELECT doc_id, round(
           |    (CASE WHEN nch BETWEEN 50 AND 100000 THEN 1.0 WHEN nch < 50 THEN nch/50.0 ELSE 0.5 END) * 0.25
           |    + (CASE WHEN awl BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.4 END) * 0.2
           |    + (CASE WHEN sr > 0.05 THEN 1.0 ELSE sr/0.05*0.5 + 0.5 END) * 0.2
           |    + (CASE WHEN pr2 < 0.2 THEN 1.0 ELSE greatest(0.0, 1.0 - (pr2 - 0.2)*2) END) * 0.2
           |    + (CASE WHEN dr < 0.3 THEN 1.0 ELSE greatest(0.0, 1.0 - dr) END) * 0.15, 4) AS quality
           |  FROM qm
           |)
           |SELECT cluster_id, doc_id AS rep_id, quality AS rep_score FROM (
           |  SELECT c.cluster_id, c.doc_id, q.quality,
           |    row_number() OVER (PARTITION BY c.cluster_id
           |      ORDER BY q.quality DESC, c.doc_id) AS rn
           |  FROM clusters c JOIN qq q USING (doc_id))
           |WHERE rn = 1""".stripMargin,
    "p_dedup_cluster" -> clusterOracle,
    "p_dedup_ngram_jaccard" -> ngramJaccardOracle,
    "p_dedup_simhash" -> simhashOracle,
    "p_ann_lsh" -> lshOracle,
    "p_ann_ivf" -> ivfOracle,
    // identical math to p_ann_ivf — persistence must not change results
    "p_ann_ivf_table" -> ivfOracle,
    "p_ann_pq" -> annPqOracle,
    "p_ann_ivfpq" -> annIvfPqOracle,
    "p_ann_recall" -> annRecallOracle,
    // ground truth = brute-force cosine dedup (ours is hyperplane-LSH
    // accelerated; exact copies hash to the same bucket, and the data has
    // no natural pair above 0.51 cosine, so recall is exact here)
    "p_dedup_embedding" ->
      """WITH u AS (
        |  SELECT vec_id, embedding, label FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000000, embedding, label FROM embeddings WHERE vec_id % 5 = 0)
        |SELECT vec_id, label FROM u a WHERE NOT EXISTS (
        |  SELECT 1 FROM u b WHERE b.vec_id < a.vec_id
        |  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.999)""".stripMargin,
    "p_text_stats" ->
      raw"""SELECT doc_id,
           |len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS n_tokens,
           |len(regexp_extract_all(text, '[\pL\pN]+'))
           |  + len(regexp_extract_all(text, '[^\pL\pN\s]+')) AS n_bpeish,
           |length(text) AS n_chars_m,
           |round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
           |  / length(text), 4) AS digit_ratio,
           |round(list_sum(list_transform(list_filter(string_split_regex(trim(text), '\s+'),
           |    x -> len(x) > 0), x -> len(x)))::DOUBLE
           |  / len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)), 4)
           |  AS avg_word_len
           |FROM documents""".stripMargin,
    // exact SQL twin of TextStats.qualityScore / langId / fingerprintHex
    // letter counts via RE2 script classes (length-diff after deleting
    // the class); planted snippets rebuilt from chr() code points; the
    // dominant script of each snippet stated literally
    "p_text_scripts" ->
      raw"""WITH m AS (SELECT doc_id, text ||
           |  CASE CAST(doc_id % 4 AS INTEGER)
           |  WHEN 0 THEN ' ' || chr(1087)||chr(1088)||chr(1080)||chr(1074)||chr(1077)||chr(1090)
           |    ||' '||chr(1084)||chr(1080)||chr(1088)
           |  WHEN 1 THEN ' ' || chr(20320)||chr(22909)||chr(19990)||chr(30028)
           |  WHEN 2 THEN ' ' || chr(1605)||chr(1585)||chr(1581)||chr(1576)||chr(1575)
           |    ||' '||chr(1576)||chr(1575)||chr(1604)||chr(1593)||chr(1575)||chr(1604)||chr(1605)
           |  ELSE '' END AS t FROM documents),
           |c AS (SELECT doc_id,
           |  length(t) - length(regexp_replace(t, '\p{L}', '', 'g')) AS lets,
           |  length(t) - length(regexp_replace(t, '\p{Latin}', '', 'g')) AS lat,
           |  length(t) - length(regexp_replace(t, '\p{Cyrillic}', '', 'g')) AS cyr,
           |  length(t) - length(regexp_replace(t, '\p{Han}', '', 'g')) AS han,
           |  length(t) - length(regexp_replace(t, '\p{Arabic}', '', 'g')) AS ara FROM m)
           |SELECT doc_id, CAST(lets AS BIGINT) AS n_letters,
           |  CASE WHEN lets = 0 THEN 0.0 ELSE CAST(lat AS DOUBLE)/lets END AS latin_frac,
           |  CASE WHEN lets = 0 THEN 0.0 ELSE CAST(cyr AS DOUBLE)/lets END AS cyr_frac,
           |  CASE WHEN lets = 0 THEN 0.0 ELSE CAST(han AS DOUBLE)/lets END AS han_frac,
           |  CASE WHEN lets = 0 THEN 0.0 ELSE CAST(ara AS DOUBLE)/lets END AS arab_frac,
           |  CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'cyrillic'
           |    WHEN 1 THEN 'han' WHEN 2 THEN 'arabic' ELSE 'und' END AS dom_planted
           |FROM c""".stripMargin,
    "p_text_quality_lang" ->
      raw"""WITH s AS (
           |  SELECT doc_id, text, length(text) AS nch,
           |    list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS toks,
           |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS ltoks
           |  FROM documents
           |), m AS (
           |  SELECT doc_id, text, nch, ltoks, len(toks) AS ntok,
           |    CASE WHEN len(toks)=0 THEN 0.0
           |      ELSE list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks) END AS awl,
           |    CASE WHEN nch=0 THEN 0.0
           |      ELSE (nch - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')))::DOUBLE / nch END AS pr,
           |    CASE WHEN nch=0 THEN 0.0
           |      ELSE (nch - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / nch END AS dr,
           |    CASE WHEN len(toks)=0 THEN 0.0
           |      ELSE len(list_filter(ltoks,
           |        x -> list_contains(['the','of','and','to','in','a','is','that','it','was','for','on','are','as','with','at','be','this','have','or'], x)))::DOUBLE
           |        / len(toks) END AS sr
           |  FROM s
           |)
           |SELECT doc_id,
           |  round(
           |    (CASE WHEN nch BETWEEN 50 AND 100000 THEN 1.0 WHEN nch < 50 THEN nch/50.0 ELSE 0.5 END) * 0.25
           |    + (CASE WHEN awl BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.4 END) * 0.2
           |    + (CASE WHEN sr > 0.05 THEN 1.0 ELSE sr/0.05*0.5 + 0.5 END) * 0.2
           |    + (CASE WHEN pr < 0.2 THEN 1.0 ELSE greatest(0.0, 1.0 - (pr - 0.2)*2) END) * 0.2
           |    + (CASE WHEN dr < 0.3 THEN 1.0 ELSE greatest(0.0, 1.0 - dr) END) * 0.15, 4) AS quality,
           |  CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END AS lang_pred,
           |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
           |FROM (
           |  SELECT *, list_max([
           |    {'hits': len(list_intersect(ltoks, ['the','and','of','to','in','is','that','it','was','for'])), 'lang': 'en'},
           |    {'hits': len(list_intersect(ltoks, ['der','die','das','und','ist','nicht','mit','ein','zu','den'])), 'lang': 'de'},
           |    {'hits': len(list_intersect(ltoks, ['le','la','les','et','est','pas','pour','que','une','dans'])), 'lang': 'fr'},
           |    {'hits': len(list_intersect(ltoks, ['el','la','los','y','es','no','por','que','una','para'])), 'lang': 'es'},
           |    {'hits': len(list_intersect(ltoks, ['il','la','di','e','che','non','per','una','sono','con'])), 'lang': 'it'},
           |    {'hits': len(list_intersect(ltoks, ['o','a','de','e','que','do','da','em','um','para'])), 'lang': 'pt'},
           |    {'hits': len(list_intersect(ltoks, ['de','het','een','en','van','is','dat','op','te','niet'])), 'lang': 'nl'}
           |  ]) AS best FROM m
           |)""".stripMargin,
    // the image families are constructed so pHash clustering lands each
    // doc with the lowest doc_id of its doc_id%16 family — the oracle is
    // that arithmetic invariant, making this a REAL end-to-end check of
    // render → decode → DCT → banding → CC against an exact answer
    "p_image_phash_dedup" ->
      """SELECT doc_id,
        |  min(doc_id) OVER (PARTITION BY doc_id % 16) AS rep_id
        |FROM documents""".stripMargin,
    // same construction as the image gate: energy-contour fingerprint
    // clustering provably lands each clip on its doc_id%12 family minimum
    "p_audio_fp_dedup" ->
      """SELECT doc_id,
        |  min(doc_id) OVER (PARTITION BY doc_id % 12) AS rep_id
        |FROM documents""".stripMargin,
    // the MP4 blobs encode doc_id-derived mvhd/tkhd values; the real box
    // parser must read back exactly what the arithmetic put in
    "p_video_meta" ->
      """SELECT doc_id,
        |  CAST(1000 + (doc_id % 977) * 10 AS BIGINT) AS duration_ms,
        |  CAST(320 + (doc_id % 7) * 16 AS BIGINT) AS width,
        |  CAST(240 + (doc_id % 5) * 16 AS BIGINT) AS height,
        |  CAST(1 AS BIGINT) AS video_tracks,
        |  'isom' AS brand
        |FROM documents""".stripMargin,
    // the AVI blobs carry doc_id-derived frame counts/sizes at 25 fps; the
    // real demux + JPEG decode must read back exactly that arithmetic
    "p_video_frames" ->
      """SELECT doc_id,
        |  CAST(i AS INTEGER) AS frame_idx,
        |  CAST(i * 40 AS BIGINT) AS ts_ms,
        |  CAST(48 + (doc_id % 4) * 16 AS INTEGER) AS width,
        |  CAST(48 + (doc_id % 4) * 16 AS INTEGER) AS height
        |FROM (SELECT doc_id, unnest(range(0, 2 + doc_id % 4)) AS i
        |      FROM documents)""".stripMargin,
    // the fake codec derives metadata from the first 7 content bytes, and
    // the content is unhex(repeat(md5(doc_id))) — so the oracle recomputes
    // h straight from md5(doc_id)
    "p_multimodal_decode" ->
      """SELECT doc_id AS id,
        |  CAST(64 + (h % 1024) AS BIGINT) AS width,
        |  CAST(64 + ((h // 7) % 1024) AS BIGINT) AS height,
        |  CASE WHEN h % 2 = 0 THEN 'jpeg' ELSE 'png' END AS format,
        |  CAST(256 AS BIGINT) AS byte_len
        |FROM (SELECT doc_id,
        |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 14))::BIGINT AS h
        |  FROM documents)""".stripMargin,
    "p_ann_bruteforce" ->
      """SELECT query_id, neighbor_id, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 3 AND q.vec_id <> c.vec_id)
        |WHERE rank <= 10""".stripMargin,
    "p_embed_covariance" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), n AS (SELECT count(*)::BIGINT AS n FROM e),
        |x AS (
        |  SELECT vec_id, i::BIGINT - 1 AS i, v[i] AS val
        |  FROM e, UNNEST(range(1, len(v) + 1)) AS r(i)
        |), si AS (
        |  SELECT i, CAST(sum(CAST(round(val, 8) AS DECIMAL(18,8))) AS DOUBLE) AS s
        |  FROM x GROUP BY 1
        |), sp AS (
        |  SELECT a.i AS i, b.i AS j,
        |    CAST(sum(CAST(round(a.val * b.val, 8) AS DECIMAL(18,8))) AS DOUBLE) AS sp
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2)
        |SELECT sp.i, sp.j, round((sp.sp - si.s * sj.s / n.n) / n.n, 8) AS cov
        |FROM sp
        |JOIN si ON sp.i = si.i
        |JOIN si sj ON sp.j = sj.i
        |CROSS JOIN n""".stripMargin,
    // exact SQL twin of Similarity.quantize: lo/step are single IEEE ops on
    // the (double-cast) inputs, codes are integers — all hash-exact
    "p_embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), p AS (
        |  SELECT vec_id, v, list_min(v) AS lo, (list_max(v) - list_min(v)) / 255.0 AS step
        |  FROM e
        |), c AS (
        |  SELECT vec_id, lo, step,
        |    CASE WHEN step = 0 THEN list_transform(v, x -> 0)
        |      ELSE list_transform(v, x -> CAST(round((x - lo) / step) AS INTEGER)) END AS codes
        |  FROM p
        |)
        |SELECT vec_id, lo, step,
        |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
        |  list_min(codes) AS code_min, list_max(codes) AS code_max
        |FROM c""".stripMargin,
    // two-stage replay: coarse rank on dequantized codes, exact rescore
    "p_ann_quantized" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), p AS (
        |  SELECT vec_id, v, list_min(v) AS lo, (list_max(v) - list_min(v)) / 255.0 AS step
        |  FROM e
        |), dq AS (
        |  SELECT vec_id, v,
        |    CASE WHEN step = 0 THEN list_transform(v, x -> lo)
        |      ELSE list_transform(v, x -> lo + CAST(CAST(round((x - lo) / step) AS INTEGER) AS DOUBLE) * step)
        |      END AS deq
        |  FROM p
        |), coarse AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.v AS cv, q.v AS qv,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.v, c.deq) DESC, c.vec_id) AS crank
        |  FROM e q JOIN dq c ON q.vec_id < 3 AND q.vec_id <> c.vec_id
        |)
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id) AS rank
        |  FROM coarse WHERE crank <= 40)
        |WHERE rank <= 10""".stripMargin)

  /** Documents surviving a quality threshold — the SQL twin of
    * `TextStats.qualityScore(text) >= thr` for the quality-filter table
    * service oracle.
    */
  def qualityFilterOracle(thr: Double): String =
    raw"""WITH s AS (
         |  SELECT doc_id, text, length(text) AS nch,
         |    list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS toks,
         |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0) AS ltoks
         |  FROM documents
         |), m AS (
         |  SELECT doc_id, nch,
         |    CASE WHEN len(toks)=0 THEN 0.0
         |      ELSE list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks) END AS awl,
         |    CASE WHEN nch=0 THEN 0.0
         |      ELSE (nch - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')))::DOUBLE / nch END AS pr,
         |    CASE WHEN nch=0 THEN 0.0
         |      ELSE (nch - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / nch END AS dr,
         |    CASE WHEN len(toks)=0 THEN 0.0
         |      ELSE len(list_filter(ltoks,
         |        x -> list_contains(['the','of','and','to','in','a','is','that','it','was','for','on','are','as','with','at','be','this','have','or'], x)))::DOUBLE
         |        / len(toks) END AS sr
         |  FROM s
         |), q AS (
         |  SELECT doc_id, round(
         |    (CASE WHEN nch BETWEEN 50 AND 100000 THEN 1.0 WHEN nch < 50 THEN nch/50.0 ELSE 0.5 END) * 0.25
         |    + (CASE WHEN awl BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.4 END) * 0.2
         |    + (CASE WHEN sr > 0.05 THEN 1.0 ELSE sr/0.05*0.5 + 0.5 END) * 0.2
         |    + (CASE WHEN pr < 0.2 THEN 1.0 ELSE greatest(0.0, 1.0 - (pr - 0.2)*2) END) * 0.2
         |    + (CASE WHEN dr < 0.3 THEN 1.0 ELSE greatest(0.0, 1.0 - dr) END) * 0.15, 4) AS quality
         |  FROM m
         |)
         |SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
         |FROM documents d JOIN q ON d.doc_id = q.doc_id
         |WHERE q.quality >= $thr""".stripMargin
}
