package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines. Five families:
  * exact (hash), MinHash+LSH (Jaccard near-dup), SimHash (Hamming
  * near-dup), n-gram Jaccard verification, and embedding-cosine near-dup.
  *
  * Scale design: every operator is shuffle-bounded — signatures are
  * computed row-local with higher-order functions (codegen'd, no UDFs);
  * candidate generation is a band/bucket equi-join (shuffle on bucket id,
  * never a cross join); winners resolve with one aggregation. Nothing is
  * collected to the driver.
  */
object Dedup {

  /** Exact dedup on a normalized-text hash: keep the lowest `idCol` per
    * fingerprint group (deterministic winner). The aggregation buffer is a
    * single long (`min(id)`), so it stays in codegen'd HashAggregate with
    * map-side partials; a `min_by(struct(*))` shape would carry the full
    * row (text included) in an ObjectHashAggregate buffer, which falls
    * back to sort-based aggregation past 128 groups per partition —
    * catastrophic when nearly every fingerprint is unique. Winners then
    * rejoin by (fingerprint, id) semi-join, a plain shuffled equi-join.
    *
    * Contract: `idCol` must be unique across rows (a record key). The
    * winner is identified by (fingerprint, id), so duplicate ids sharing
    * the winning value would all survive the semi-join — exactly one row
    * per fingerprint is only guaranteed for unique ids.
    */
  def exact(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      unicodeForm: Option[String] = None): DataFrame = {
    // materialize the fingerprint ONCE per row: the normalization regex is
    // the expensive part on real documents, and referencing the raw
    // expression in both the winner aggregation and the join condition
    // would evaluate it twice per row. unicodeForm (e.g. Some("NFKC"))
    // opts into normalization-aware fingerprints — full-width/ligature
    // variants of one document collapse to one group; default unchanged
    val fp = unicodeForm match {
      case Some(f) => TextStats.fingerprint(col(textCol), f)
      case None => TextStats.fingerprint(col(textCol))
    }
    val tagged = df.withColumn("_ddup_fp", fp)
    val keep = tagged
      .select(col("_ddup_fp").as("_ddup_fp2"), col(idCol).as("_ddup_keep"))
      .groupBy("_ddup_fp2").agg(min(col("_ddup_keep")).as("_ddup_keep"))
    tagged.join(keep,
        col("_ddup_fp") === col("_ddup_fp2") && col(idCol) === col("_ddup_keep"),
        "left_semi")
      .drop("_ddup_fp")
  }

  /** Word n-gram shingles, deduplicated. Word grams (not char grams) keep
    * the element count linear in tokens — a char-gram variant re-runs the
    * normalization regex per element, which is O(len²) per document.
    * Texts shorter than n words collapse to a single whole-text shingle.
    * Backed by the native [[graft.functions.WordGrams]] expression (the
    * equivalent higher-order-function tree evaluates interpreted and
    * copies a token sub-array per gram — ~10x slower per document).
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.WordGrams.wordGrams(text, n)

  /** Normalization-aware shingles (OPT-IN): the Unicode + cleanup pass
    * ([[Cleaning.normalizeText]] with a Normalizer form, NFKC standard)
    * runs before tokenization, so full-width/ligature token spellings
    * shingle identically and near-dup variants actually band together.
    */
  def shingles(text: Column, n: Int, unicodeForm: String): Column =
    graft.functions.WordGrams.wordGrams(Cleaning.normalizeText(text, unicodeForm), n)

  /** MinHash signature over a MATERIALIZED shingle-array column. Hash
    * family h_i(s) = xxhash64(s || '#' || i) — pure expression tree.
    * Callers must materialize the shingle array first (projection +
    * shuffle boundary — see minhashDedup); referencing `shingles(...)`
    * here directly would re-evaluate the array once per hash function.
    */
  def minhashSignatureFromShingles(sh: Column, numHashes: Int = 64): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      coalesce(
        aggregate(sh, lit(Long.MaxValue),
          (acc, s) => least(acc, xxhash64(concat(s, lit("#"), i)))),
        lit(Long.MaxValue)))

  /** Convenience form for ad-hoc use/tests (inline shingles — fine for
    * single evaluations, not for the 64-hash pipelines).
    */
  def minhashSignature(text: Column, numHashes: Int = 64, shingleN: Int = 3): Column =
    minhashSignatureFromShingles(shingles(text, shingleN), numHashes)

  /** LSH band ids from a minhash signature: signature split into `bands`
    * bands of rows hashed together; two docs sharing any band id are
    * candidates (standard banding: P[candidate] ≈ 1-(1-j^r)^b).
    */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        xxhash64(concat_ws(",",
          slice(signature, b * rowsPerBand + lit(1), lit(rowsPerBand))), b).as("bucket")))

  /** Estimated Jaccard similarity between two equal-length signatures:
    * fraction of agreeing minhashes.
    */
  def signatureSimilarity(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), p => p))
      .cast("double") / size(a)

  /** Verified near-dup pairs (`_l_id < _r_id`) from MinHash-LSH banding:
    * the shared candidate engine behind [[minhashDedup]] and
    * [[minhashClusters]]. One shuffle for banding, one band-equi-join
    * (AQE handles hot buckets), pair-dedup BEFORE the signature-similarity
    * verification so each pair is verified exactly once.
    */
  private[graft] def minhashDupPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double, numHashes: Int, bands: Int, shingleN: Int,
      maxBucketSize: Option[Int] = None,
      unicodeForm: Option[String] = None): DataFrame = {
    val rows = numHashes / bands
    // opt-in normalization-aware tokenization: the codegen'd Unicode +
    // cleanup pass rewrites the text BEFORE the native signature
    // expression, so the whole chain stays in one codegen stage
    val textExpr = unicodeForm match {
      case Some(f) => Cleaning.normalizeText(col(textCol), f)
      case None => col(textCol)
    }
    // repartition spreads signature computation across the cluster (a
    // single parquet file would otherwise pin it to one task); the
    // signature itself is the native MinHashSig expression — one tight
    // loop per row instead of 64 interpreted array aggregates.
    // signatures once per doc; band rows carry only (id, band, bucket) so
    // the 16-way explode never duplicates the signature arrays through
    // the shuffle
    val sig = df
      .select(col(idCol).as("_d_id"), textExpr.as("_d_t"))
      .repartition(col("_d_id"))
      .select(col("_d_id"),
        graft.functions.MinHashSig.minhashSig(col("_d_t"), numHashes, shingleN).as("_d_sig"))
    val banded0 = sig.select(col("_d_id"),
        explode(lshBands(col("_d_sig"), bands, rows)).as("_d_band"))
      .select(col("_d_id"),
        col("_d_band.band").as("_d_b"), col("_d_band.bucket").as("_d_k"))
    // optional scale guard: the self-join is quadratic in bucket width, so
    // one degenerate bucket (e.g. 10k byte-identical docs — run exact
    // dedup first) would emit ~10^8 pairs. Capping drops oversized buckets
    // entirely (bounded recall loss, the standard production-LSH
    // tradeoff); default off so results replay exactly in the oracle.
    val banded = maxBucketSize match {
      case None => banded0
      case Some(cap) =>
        val small = banded0.groupBy("_d_b", "_d_k").count()
          .filter(col("count") <= cap).drop("count")
        banded0.join(small, Seq("_d_b", "_d_k"), "left_semi")
    }
    val pairs = banded.select(col("_d_b"), col("_d_k"), col("_d_id").as("_l_id"))
      .join(banded.select(col("_d_b"), col("_d_k"), col("_d_id").as("_r_id")),
        Seq("_d_b", "_d_k"))
      .filter(col("_l_id") < col("_r_id"))
      .select("_l_id", "_r_id").distinct()
    pairs
      .join(sig.select(col("_d_id").as("_l_id"), col("_d_sig").as("_l_sig")), Seq("_l_id"))
      .join(sig.select(col("_d_id").as("_r_id"), col("_d_sig").as("_r_sig")), Seq("_r_id"))
      .filter(signatureSimilarity(col("_l_sig"), col("_r_sig")) >= threshold)
      .select("_l_id", "_r_id")
  }

  /** MinHash-LSH near-duplicate removal: docs whose estimated Jaccard with
    * a lower-id doc ≥ `threshold` are dropped.
    */
  def minhashDedup(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      threshold: Double = 0.7, numHashes: Int = 64, bands: Int = 16,
      shingleN: Int = 3, maxBucketSize: Option[Int] = None,
      unicodeForm: Option[String] = None): DataFrame = {
    val dupIds = minhashDupPairs(df, textCol, idCol, threshold, numHashes, bands,
        shingleN, maxBucketSize, unicodeForm)
      .select(col("_r_id").as("_dup_id")).distinct()
    df.join(dupIds, col(idCol) === col("_dup_id"), "left_anti")
  }

  /** Transitive duplicate clustering: connected components over the
    * MinHash-LSH near-dup pair graph, as (id, cluster_id = min id in the
    * component). Pairwise dedup is NOT transitive (A≈B and B≈C may hold
    * while A≉C); training-data pipelines cluster first and then pick one
    * representative per cluster.
    *
    * Shape: min-label propagation WITH pointer doubling — labels start at
    * self and each round every node takes the min label among itself, its
    * neighbors' labels, and its label's label (label chasing). The chase
    * halves the remaining distance to the component minimum each round,
    * so convergence is O(log diameter) rounds, not O(diameter): the
    * default maxIters=20 covers components of diameter ~2^20, i.e. any
    * real corpus. (A label is always the id of a node reachable from the
    * holder, so chasing preserves the reachability invariant and the
    * fixpoint is exactly min-reachable-id.) Each round is two equi-joins
    * + one aggregation (shuffle-bounded, nothing driver-side but the
    * convergence count); non-convergence at the cap throws rather than
    * returning partial labels. This is the standard large-graph CC shape
    * (cf. the large-star/small-star family), expressed on DataFrames so
    * AQE handles the skewed-bucket joins.
    */
  def minhashClusters(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      threshold: Double = 0.7, numHashes: Int = 64, bands: Int = 16,
      shingleN: Int = 3, maxIters: Int = 20,
      maxBucketSize: Option[Int] = None): DataFrame = {
    val pairs = minhashDupPairs(df, textCol, idCol, threshold, numHashes, bands,
      shingleN, maxBucketSize)
    labelComponents(df.select(col(idCol)), pairs, maxIters, idCol)
  }

  /** Connected-component labeling over an arbitrary near-dup pair graph
    * (the CC core of [[minhashClusters]], reusable by any pair producer —
    * image pHash, SimHash, embedding buckets). `nodes` carries one id
    * column, `pairs` carries `_l_id`/`_r_id`; returns (idCol, cluster_id
    * = min id in the component). Shape and convergence contract as
    * documented above.
    */
  def labelComponents(nodes: DataFrame, pairs: DataFrame, maxIters: Int = 20,
      idCol: String = "doc_id"): DataFrame = {
    val edges = pairs.select(col("_l_id").as("_cc_src"), col("_r_id").as("_cc_dst"))
      .unionByName(pairs.select(col("_r_id").as("_cc_src"), col("_l_id").as("_cc_dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint (not persist) per round: the pointer-doubling chase
    // references the label frame twice, so without lineage truncation the
    // logical plan would grow ~3x per round and blow planning/tree-string
    // stacks; an eager checkpoint keeps every round's plan constant-size
    val nodeId = col(nodes.columns.head)
    var labels = nodes.select(nodeId.as("_cc_id"), nodeId.as("_cc_label"))
      .localCheckpoint(eager = true)
    try {
      // convergence check: labels only ever DECREASE (every update takes a
      // min over candidates that include the current label), so "no label
      // changed" ⇔ "sum of labels unchanged" — one single-stage aggregate
      // on the just-checkpointed frame instead of a full next-vs-old join
      // per round. Decimal sum: exact at any id magnitude × row count.
      def labelSum(df: DataFrame): java.math.BigDecimal =
        Option(df.agg(sum(col("_cc_label").cast("decimal(38,0)"))).head().getDecimal(0))
          .getOrElse(java.math.BigDecimal.ZERO) // empty node set
      var prevSum = labelSum(labels)
      var converged = false
      var iter = 0
      while (!converged && iter < maxIters) {
        val fromNeighbors = edges
          .join(labels, col("_cc_src") === col("_cc_id"))
          .select(col("_cc_dst").as("_cc_id"), col("_cc_label"))
        // pointer doubling: chase label -> label(label); labels are node
        // ids, so this is a self-join of the label frame on (label = id)
        val chased = labels.select(col("_cc_id"), col("_cc_label").as("_cc_via"))
          .join(labels.select(col("_cc_id").as("_cc_via"), col("_cc_label")),
            Seq("_cc_via"))
          .select(col("_cc_id"), col("_cc_label"))
        val next = labels.unionByName(fromNeighbors).unionByName(chased)
          .groupBy("_cc_id").agg(min("_cc_label").as("_cc_label"))
          .localCheckpoint(eager = true)
        val nextSum = labelSum(next)
        labels = next
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        iter += 1
      }
      // a component wider than maxIters hops would exit with partially
      // propagated labels — wrong cluster_ids with no signal; fail loudly
      if (!converged)
        throw new IllegalStateException(
          s"labelComponents did not converge after $maxIters rounds: a " +
            "connected component's diameter exceeds ~2^maxIters, so labels " +
            "are only partially propagated. Raise maxIters (pointer doubling " +
            "needs ~log2(component diameter) rounds).")
      labels.select(col("_cc_id").as(idCol), col("_cc_label").as("cluster_id"))
        // materialize before the persisted frames unpersist in finally
        .localCheckpoint(eager = true)
    } finally { edges.unpersist(); labels.unpersist() }
  }

  /** One REPRESENTATIVE per near-dup cluster, chosen by a caller-supplied
    * score (highest wins; ties break to the lowest id) — production
    * pipelines keep the best copy of a duplicate cluster (longest /
    * highest-quality / most recent), not the lowest-id one. Composes
    * [[minhashClusters]] with one scoring projection and a per-cluster
    * window: cost = clustering + one shuffle on cluster_id.
    */
  def clusterRepresentatives(df: DataFrame, score: Column,
      textCol: String = "text", idCol: String = "doc_id",
      threshold: Double = 0.7, numHashes: Int = 64, bands: Int = 16,
      shingleN: Int = 3, maxIters: Int = 20): DataFrame = {
    val clusters = minhashClusters(df, textCol, idCol, threshold, numHashes,
      bands, shingleN, maxIters)
    val scored = df.select(col(idCol), score.as("_rep_score"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("_rep_score").desc, col(idCol).asc)
    clusters.join(scored, Seq(idCol))
      .withColumn("_rep_rn", row_number().over(w))
      .filter(col("_rep_rn") === 1)
      .select(col("cluster_id"), col(idCol).as("rep_id"),
        col("_rep_score").as("rep_score"))
  }

  /** 60-bit portable token hash: the top 15 hex chars of md5 parsed as an
    * integer. md5 is bit-identical in every engine (the DuckDB oracle
    * recomputes it), and 60 bits keeps values positive in signed-64 SQL.
    */
  def tokenHash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** 60-bit SimHash over whitespace tokens: bit j is the sign of the sum
    * of ±1 votes from each token's hash bit j. Pure expression tree.
    */
  def simhash(text: Column): Column =
    simhashFromHashes(transform(TextStats.tokens(lower(text)), t => tokenHash60(t)))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash from a materialized token-hash array (see simhash for the
    * bit-vote construction). 60 bits, positive in a signed long.
    */
  def simhashFromHashes(hashes: Column): Column =
    aggregate(
      sequence(lit(0), lit(59)),
      lit(0L),
      (acc, j) => {
        val vote = aggregate(hashes, lit(0L),
          (a, h) => a + when(call_function("shiftright", h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        acc + when(vote > 0, call_function("shiftleft", lit(1L), j)).otherwise(0L)
      })

  /** SimHash near-dup removal: candidates share one of 4 15-bit chunks
    * (any pair within Hamming distance 3 must agree on ≥1 chunk —
    * pigeonhole), verified by full Hamming distance ≤ `maxDistance`.
    */
  def simhashDedup(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      maxDistance: Int = 3): DataFrame = {
    // materialize token hashes through the shuffle (parallelism + avoids
    // 60 re-evaluations of the tokenize+hash array — one per bit)
    val prepared = df
      .select(col(idCol).as("_s_id"),
        transform(TextStats.tokens(lower(col(textCol))), t => tokenHash60(t)).as("_s_th"))
      .repartition(col("_s_id"))
    // native bit-vote expression: one JVM loop per row instead of 60
    // interpreted per-token aggregates (22s -> sub-second at sf0.1)
    val sh = prepared.select(col("_s_id"),
      graft.functions.SimHash60.simhash60(col("_s_th")).as("_s_sh"))
    val chunked = sh.select(col("_s_id"), col("_s_sh"),
      explode(transform(sequence(lit(0), lit(3)), c =>
        struct(c.as("c"), call_function("shiftright", col("_s_sh"), c * 15).bitwiseAND(0x7FFFL).as("v")))).as("_s_ch"))
      .select(col("_s_id"), col("_s_sh"), col("_s_ch.c").as("_s_c"), col("_s_ch.v").as("_s_v"))
    val l = chunked.select(col("_s_c"), col("_s_v"), col("_s_id").as("_l_id"), col("_s_sh").as("_l_sh"))
    val r = chunked.select(col("_s_c"), col("_s_v"), col("_s_id").as("_r_id"), col("_s_sh").as("_r_sh"))
    val dupIds = l.join(r, Seq("_s_c", "_s_v"))
      .filter(col("_l_id") < col("_r_id"))
      .filter(hamming(col("_l_sh"), col("_r_sh")) <= maxDistance)
      .select(col("_r_id").as("_dup_id")).distinct()
    df.join(dupIds, col(idCol) === col("_dup_id"), "left_anti")
  }

  /** Exact n-gram Jaccard between two text columns (verification metric
    * for candidate pairs).
    */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val sa = shingles(a, n); val sb = shingles(b, n)
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** Near-dup removal with MinHash-LSH candidates verified by EXACT n-gram
    * Jaccard (two-phase: cheap probabilistic recall, exact precision).
    */
  def ngramJaccardDedup(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      threshold: Double = 0.8, n: Int = 3): DataFrame = {
    // candidates via the native MinHashSig (same FNV family as
    // minhashDedup — one tight loop per row, and portable enough for the
    // DuckDB oracle to replicate band membership exactly); shingle SETS
    // are materialized once per doc so the exact-jaccard verification
    // compares arrays instead of re-tokenizing text per candidate pair
    // band rows carry ids only; candidate pairs dedup BEFORE the exact
    // jaccard verify, then shingle sets join back in by id — no arrays
    // ride the 16-way explode, and each pair is verified exactly once
    val keyedSrc = df
      .select(col(idCol).as("_d_id"), col(textCol).as("_d_text"))
      .repartition(col("_d_id"))
    val sig = keyedSrc.select(col("_d_id"),
      graft.functions.MinHashSig.minhashSig(col("_d_text"), 64, n).as("_d_sig"))
    val shs = keyedSrc.select(col("_d_id"), shingles(col("_d_text"), n).as("_d_sh"))
    val banded = sig.select(col("_d_id"),
        explode(lshBands(col("_d_sig"), 16, 4)).as("_d_band"))
      .select(col("_d_id"),
        col("_d_band.band").as("_d_b"), col("_d_band.bucket").as("_d_k"))
    val pairs = banded.select(col("_d_b"), col("_d_k"), col("_d_id").as("_l_id"))
      .join(banded.select(col("_d_b"), col("_d_k"), col("_d_id").as("_r_id")),
        Seq("_d_b", "_d_k"))
      .filter(col("_l_id") < col("_r_id"))
      .select("_l_id", "_r_id").distinct()
    val inter = size(array_intersect(col("_l_sh"), col("_r_sh"))).cast("double")
    val union = size(array_union(col("_l_sh"), col("_r_sh"))).cast("double")
    val jac = when(union === 0, 0.0).otherwise(inter / union)
    val dupIds = pairs
      .join(shs.select(col("_d_id").as("_l_id"), col("_d_sh").as("_l_sh")), Seq("_l_id"))
      .join(shs.select(col("_d_id").as("_r_id"), col("_d_sh").as("_r_sh")), Seq("_r_id"))
      .filter(jac >= threshold)
      .select(col("_r_id").as("_dup_id")).distinct()
    df.join(dupIds, col(idCol) === col("_dup_id"), "left_anti")
  }

  /** Embedding near-dup removal: candidates from random-hyperplane LSH
    * buckets (sign signature of `planes` pseudo-random projections),
    * verified by exact cosine ≥ `threshold`. The hyperplanes are generated
    * from a hash of (dimension, plane) — deterministic, nothing broadcast.
    */
  def embeddingDedup(df: DataFrame, vecCol: String = "embedding", idCol: String = "vec_id",
      threshold: Double = 0.95, planes: Int = 16): DataFrame = {
    val sigCol = Similarity.hyperplaneSignature(col(vecCol), planes)
    val sig = df.select(col(idCol).as("_e_id"), col(vecCol).as("_e_v"), sigCol.as("_e_sig"))
    val l = sig.select(col("_e_sig"), col("_e_id").as("_l_id"), col("_e_v").as("_l_v"))
    val r = sig.select(col("_e_sig"), col("_e_id").as("_r_id"), col("_e_v").as("_r_v"))
    val dupIds = l.join(r, Seq("_e_sig"))
      .filter(col("_l_id") < col("_r_id"))
      .filter(Similarity.cosine(col("_l_v"), col("_r_v")) >= threshold)
      .select(col("_r_id").as("_dup_id")).distinct()
    df.join(dupIds, col(idCol) === col("_dup_id"), "left_anti")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): partition the
    * corpus by k-means-style coarse clusters ([[Similarity.ivfBuild]] —
    * deterministic hash-seeded centroids, nearest-centroid assignment),
    * then compare cosine ONLY within a cluster and drop the higher id of
    * every pair at or above `threshold`.
    *
    * Versus [[embeddingDedup]]'s hyperplane-LSH buckets: LSH candidates
    * are recall-exact for identical vectors but bucket occupancy is
    * data-independent, while the cluster partition adapts to the corpus
    * geometry — the published SemDeDup shape for web-scale corpora. The
    * pairwise stage is an equi-join on `centroid_id`, so per-task work is
    * bounded by cluster population (choose `nlist` ≈ corpus/50k to bound
    * the quadratic term; AQE splits skewed clusters). Identical vectors
    * always share a centroid (the assignment's distance + centroid-id
    * tie-break is deterministic), so exact copies are never missed.
    *
    * The default `nlist <= 0` auto-scales to ~√N clusters
    * ([[Similarity.autoNlist]]): a fixed cluster count silently
    * degenerates toward all-pairs as the corpus grows (N²/nlist pairs).
    * Pass an explicit positive `nlist` to pin the partition (the oracled
    * gates do, for replayability).
    */
  def semanticDedup(df: DataFrame, vecCol: String = "embedding", idCol: String = "vec_id",
      nlist: Int = 0, threshold: Double = 0.95): DataFrame = {
    val (assignments, _) = Similarity.ivfBuild(df, nlist, idCol, vecCol)
    val l = assignments.select(col("centroid_id"),
      col(idCol).as("_l_id"), col(vecCol).as("_l_v"))
    val r = assignments.select(col("centroid_id"),
      col(idCol).as("_r_id"), col(vecCol).as("_r_v"))
    val dupIds = l.join(r, Seq("centroid_id"))
      .filter(col("_l_id") < col("_r_id"))
      .filter(graft.functions.VecMath.cosineNative(col("_l_v"), col("_r_v")) >= threshold)
      .select(col("_r_id").as("_dup_id")).distinct()
    df.join(dupIds, col(idCol) === col("_dup_id"), "left_anti")
  }

  /** EXACT-SUBSTRING span dedup (the ExactSubstr operator of Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better" —
    * the suffix-array dedup the big corpora actually ship with): any
    * `k`-token window whose exact text occurs `minCount`+ times in the
    * WHOLE corpus (across documents or repeated within one) is a
    * duplicated span, and every occurrence is cut from its document.
    * Document-level dedup (exact/minhash) keeps one copy of a duplicated
    * PASSAGE per near-dup cluster but leaves boilerplate passages that
    * ride inside otherwise-distinct documents; this removes the passage
    * itself, everywhere. Returns (idCol, textCol cleaned, n_dropped).
    *
    * Distributed shape — no suffix array, same result for fixed k:
    *  1. per document, fingerprint every k-token window (row-local
    *     higher-order functions; md5 so the grouping is replayable by
    *     the oracle). O(n·k) chars hashed per doc, only 32-hex
    *     fingerprints + int starts leave the row.
    *  2. ONE shuffle keyed by fingerprint: a window count over the
    *     fingerprint partition tags every occurrence with its global
    *     count in the same exchange that would otherwise be needed just
    *     to join the counts back — the windows relation (the big one)
    *     moves exactly once.
    *  3. collect the surviving (count ≥ minCount) starts per doc
    *     (bounded by the doc's own window count).
    *  4. row-local span surgery: a token at position p is dropped when
    *     any duplicated window start s covers it (s ≤ p < s+k) —
    *     overlapping spans merge for free.
    * Nothing is pairwise; the one shuffle carries fingerprints, never
    * window text. Skewed fingerprints (a boilerplate span repeated
    * millions of times) are a count aggregation, not a join fan-out.
    */
  /** SQL expr over a `_sd_ts` tokens column: the md5 fingerprint of every
    * k-token window, indexed by 0-based start (shared by the batch
    * operator and [[SpanDedupService]] — both sides MUST hash windows
    * identically or the service would not converge).
    */
  private[pipeline] def windowFpsExpr(k: Int): String =
    s"""CASE WHEN size(_sd_ts) >= $k
       |THEN transform(sequence(0, size(_sd_ts) - $k),
       |  s -> md5(array_join(slice(_sd_ts, s + 1, $k), ' ')))
       |ELSE array() END""".stripMargin

  /** SQL expr cutting tokens covered by any start in `_sd_starts` out of
    * `_sd_ts` — overlapping spans merge for free.
    */
  private[pipeline] def cutSpansExpr(k: Int): String =
    s"""filter(transform(_sd_ts,
       |  (t, p) -> IF(exists(_sd_starts, s -> s <= p AND p < s + $k), NULL, t)),
       |  t -> t IS NOT NULL)""".stripMargin

  def exactSpanDedup(df: DataFrame, k: Int = 20, minCount: Long = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, s"window must span at least 2 tokens, got $k")
    val toks = df.select(col(idCol), split(col(textCol), " ").as("_sd_ts"))
    val wins = toks.select(col(idCol),
      posexplode(expr(windowFpsExpr(k))).as(Seq("_sd_s", "_sd_fp")))
    val dstarts = wins
      .withColumn("_sd_n", count(lit(1)).over(Window.partitionBy(col("_sd_fp"))))
      .filter(col("_sd_n") >= minCount)
      .groupBy(col(idCol)).agg(collect_set(col("_sd_s")).as("_sd_starts"))
    toks.join(dstarts, Seq(idCol), "left_outer")
      .withColumn("_sd_starts",
        coalesce(col("_sd_starts"), expr("array()").cast("array<int>")))
      .withColumn("_sd_kept", expr(cutSpansExpr(k)))
      .select(col(idCol),
        array_join(col("_sd_kept"), " ").as(textCol),
        (size(col("_sd_ts")) - size(col("_sd_kept"))).cast("long").as("n_dropped"))
  }
}
