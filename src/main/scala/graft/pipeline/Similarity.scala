package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: random
  * hyperplane LSH bucketing (sublinear candidates) and an IVF variant
  * (coarse quantizer via sampled centroids + cluster-pruned probe).
  * Hot-path vector math is the native [[graft.functions.VecMath]]
  * expressions (one tight loop per pair — HOF folds evaluate
  * interpreted); the declarative [[dot]]/[[cosine]]/[[l2Distance]]
  * remain the reference semantics, bit-identical by fold order.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = {
    val d = l2Norm(a) * l2Norm(b)
    when(d === 0, 0.0).otherwise(dot(a, b) / d)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v))

  /** Sign signature of `planes` pseudo-random hyperplane projections.
    * Plane p's component for dimension i is a deterministic hash-derived
    * value in [-1,1] — no stored model, identical across executors.
    * The component hash is md5-based (top 15 hex chars as an integer), so
    * any engine with md5 reproduces the exact same hyperplanes — the
    * DuckDB oracle replays the whole signature.
    */
  def hyperplaneSignature(vec: Column, planes: Int = 16): Column =
    graft.functions.HyperplaneSig.hyperplaneSig(vec, planes)

  /** The declarative formulation the native expression replaces —
    * bit-identical, kept for documentation/tests (evaluates dims×planes
    * md5 expressions per row, so don't use it on a hot path).
    */
  def hyperplaneSignatureHof(vec: Column, planes: Int = 16): Column =
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (v, i) => v * (pmod(conv(substring(md5(concat(i, lit("_"), p)), 1, 15), 16, 10)
              .cast("long"), lit(2001L)) - 1000L).cast("double") / 1000.0),
          lit(0.0d), (a, v) => a + v)
        acc + when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(0L)
      })

  /** Exact brute-force top-k neighbors for every query row:
    * `queries × corpus` broadcast join scored by cosine, per-query window
    * top-k. Correct at any scale where queries fit in a broadcast
    * (the corpus side streams — never collected).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "vec_id", queryVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("_q_v"))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("_c_v"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", graft.functions.VecMath.cosineNative(col("_q_v"), col("_c_v")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** Approximate top-k via hyperplane-LSH: only corpus vectors sharing the
    * query's bucket are scored. Multi-probe: `probeBits` one-bit
    * perturbations of the query signature widen recall. Candidates shrink
    * by ~2^planes relative to brute force — the 100 TB path.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
      probeBits: Int = 2,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "vec_id", queryVec: String = "embedding"): DataFrame = {
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("_c_v"),
      hyperplaneSignature(col(corpusVec), planes).as("_bucket"))
    // query probes: own bucket + single-bit flips (multi-probe LSH)
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("_q_v"),
        hyperplaneSignature(col(queryVec), planes).as("_sig"))
      .withColumn("_bucket", explode(concat(
        array(col("_sig")),
        slice(transform(sequence(lit(0), lit(planes - 1)),
          b => col("_sig").bitwiseXOR(call_function("shiftleft", lit(1L), b))), 1, probeBits))))
    val scored = c.join(broadcast(q), Seq("_bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", graft.functions.VecMath.cosineNative(col("_q_v"), col("_c_v")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.groupBy("query_id", "neighbor_id", "score").agg(first("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** Corpus-proportional cluster count for callers that don't pick one:
    * ~√N, clamped to [16, 65536]. √N balances the two costs that move in
    * opposite directions with nlist — the within-cluster quadratic term
    * of cluster-pruned pair generation (O(N²/nlist) candidate pairs →
    * O(N^1.5) at √N, sublinear per row) and the broadcast centroid table
    * (O(nlist) rows shipped to every task). A FIXED nlist is the 100 TB
    * trap: 16 clusters over 10^9 vectors puts ~6×10^7 rows in each
    * cluster and the pair join degenerates toward all-pairs.
    */
  def autoNlist(n: Long): Int =
    math.max(16L, math.min(65536L,
      math.ceil(math.sqrt(math.max(0L, n).toDouble)).toLong)).toInt

  /** IVF index build: pick `nlist` corpus rows as coarse centroids
    * (deterministic hash-ordered sample — a k-means seeding analog), then
    * assign every vector to its nearest centroid. Returns
    * (assignments, centroids); persist both for repeated queries.
    * `nlist <= 0` means auto: [[autoNlist]] of the corpus count (one
    * count() pass at build time).
    */
  def ivfBuild(corpus: DataFrame, nlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    val k = if (nlist > 0) nlist else autoNlist(corpus.count())
    ivfBuildK(corpus, k, idCol, vecCol)
  }

  private def ivfBuildK(corpus: DataFrame, nlist: Int,
      idCol: String, vecCol: String): (DataFrame, DataFrame) = {
    // md5-ordered sample + row_number ids: fully deterministic and
    // reproducible by the oracle (monotonically_increasing_id would depend
    // on partition layout)
    val centroids = corpus
      .select(col(idCol).as("_seed_id"), col(vecCol).as("_ct_v"),
        md5(col(idCol).cast("string")).as("_seed_h"))
      .orderBy(col("_seed_h"), col("_seed_id"))
      .limit(nlist)
      // unpartitioned window (WindowExec warns "No Partition Defined"):
      // benign here — the frame is the .limit(nlist) output, bounded to
      // nlist rows on one task at any corpus size
      .withColumn("centroid_id", row_number().over(
        Window.orderBy(col("_seed_h"), col("_seed_id"))) - 1)
      .select(col("centroid_id"), col("_ct_v"))
    val assigned = corpus.crossJoin(broadcast(centroids))
      .withColumn("_d", graft.functions.VecMath.l2Native(col(vecCol), col("_ct_v")))
    // centroid_id tiebreak keeps equidistant assignments deterministic
    val w = Window.partitionBy(col(idCol)).orderBy(col("_d"), col("centroid_id"))
    val assignments = assigned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
    (assignments, centroids)
  }

  /** IVF query: score only vectors in the `nprobe` closest clusters to
    * each query — the standard inverted-file pruning.
    */
  def ivfTopK(assignments: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int = 4,
      queryId: String = "vec_id", queryVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("_q_v"))
    val qProbes = q.crossJoin(broadcast(centroids))
      .withColumn("_d", graft.functions.VecMath.l2Native(col("_q_v"), col("_ct_v")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("_d"), col("centroid_id"))
    val probes = qProbes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= nprobe)
      .select(col("query_id"), col("_q_v"), col("centroid_id"))
    val cand = assignments.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col(assignments.columns.head))
    val scored = cand.withColumn("score",
      graft.functions.VecMath.cosineNative(col("_q_v"), col(assignments.columns(1))))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(assignments.columns.head))
    scored.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(assignments.columns.head).as("neighbor_id"),
        col("score"), col("rank"))
  }

  // -------------------------------------------------- int8 quantization

  /** Per-vector int8 scalar quantization: `struct(lo, step, codes)` with
    * `code_i = round((x_i - lo) / step)` ∈ [0, 255], `lo = min(vec)`,
    * `step = (max - min) / 255`. A 100 TB float32 corpus stores as
    * ~25 TB of codes + two doubles per vector — the standard 4× scan
    * reduction for first-pass candidate scoring. Constant vectors
    * (step = 0) encode as all-zero codes. Pure expression tree, every
    * arithmetic step replayable bit-for-bit by the DuckDB oracle (inputs
    * should be cast to double first; round() is half-away-from-zero on
    * the non-negative operand in both engines).
    */
  def quantize(vec: Column): Column = {
    val lo = array_min(vec)
    val step = (array_max(vec) - lo) / 255.0d
    struct(
      lo.as("lo"),
      step.as("step"),
      when(step === 0, transform(vec, _ => lit(0)))
        .otherwise(transform(vec, x => round((x - lo) / step).cast("int")))
        .as("codes"))
  }

  /** Inverse of [[quantize]]: `lo + code * step` per element (doubles). */
  def dequantize(q: Column): Column =
    transform(q.getField("codes"),
      c => q.getField("lo") + c.cast("double") * q.getField("step"))

  /** Two-stage quantized top-k: coarse scores against the DEQUANTIZED
    * corpus (at scale, read from a stored int8 index — 4× less IO than
    * full precision), exact cosine rescoring of the `k × oversample`
    * survivors against the full vectors. Queries stay full precision
    * (asymmetric quantization — no query-side error). Deterministic
    * tiebreaks at both stages keep results oracle-replayable.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      oversample: Int = 4,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "vec_id", queryVec: String = "embedding"): DataFrame = {
    val qz = quantize(col(corpusVec))
    val c = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).as("_c_full"), dequantize(qz).as("_c_deq"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("_q_v"))
    val coarse = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("_coarse", graft.functions.VecMath.cosineNative(col("_q_v"), col("_c_deq")))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("_coarse").desc, col("neighbor_id"))
    val survivors = coarse.withColumn("_crank", row_number().over(wc))
      .filter(col("_crank") <= k * oversample)
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    survivors.withColumn("score", graft.functions.VecMath.cosineNative(col("_q_v"), col("_c_full")))
      .withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  // ------------------------------------------------- text similarity search

  /** TEXT similarity search: top-k corpus documents per query document by
    * EXACT word n-gram Jaccard, with MinHash-LSH band collisions
    * generating the candidates — the text analog of [[lshTopK]]:
    * probabilistic recall, exact rescoring. Candidate generation is a
    * band-bucket equi-join, O(collisions) — never corpus × queries — and
    * shingle arrays join back in by id AFTER pair dedup, so nothing wide
    * rides the band explode. Signature/banding reuses [[Dedup]]'s
    * portable FNV machinery, so the DuckDB oracle replays band
    * membership and the exact Jaccard bit-for-bit.
    */
  def textTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      textCol: String = "text", idCol: String = "doc_id",
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands): a " +
        "remainder would silently drop signature tail entries from banding")
    val rows = numHashes / bands
    def prep(df: DataFrame, tag: String): (DataFrame, DataFrame) = {
      val id = s"_${tag}_id"
      val keyed = df.select(col(idCol).as(id), col(textCol).as("_t"))
        .repartition(col(id))
      val sig = keyed.select(col(id),
        graft.functions.MinHashSig.minhashSig(col("_t"), numHashes, shingleN).as("_sig"))
      val sh = keyed.select(col(id), Dedup.shingles(col("_t"), shingleN).as(s"_${tag}_sh"))
      val banded = sig.select(col(id),
          explode(Dedup.lshBands(col("_sig"), bands, rows)).as("_band"))
        .select(col(id), col("_band.band").as("_b"), col("_band.bucket").as("_k"))
      (banded, sh)
    }
    val (cb, csh) = prep(corpus, "c")
    val (qb, qsh) = prep(queries, "q")
    val cand = qb.join(cb, Seq("_b", "_k"))
      .filter(col("_q_id") =!= col("_c_id"))
      .select("_q_id", "_c_id").distinct()
    val inter = size(array_intersect(col("_q_sh"), col("_c_sh"))).cast("double")
    val union = size(array_union(col("_q_sh"), col("_c_sh"))).cast("double")
    val jac = when(union === 0, 0.0).otherwise(inter / union)
    val w = Window.partitionBy(col("_q_id")).orderBy(col("_jac").desc, col("_c_id"))
    cand.join(qsh, Seq("_q_id")).join(csh, Seq("_c_id"))
      .withColumn("_jac", jac)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_q_id").as("query_id"), col("_c_id").as("neighbor_id"),
        round(col("_jac"), 4).as("jaccard"), col("rank"))
  }

  // ------------------------------------------- product quantization (PQ)

  /** Split a d-dim vector into `m` contiguous subvectors: array of `m`
    * arrays of d/m elements (d must be divisible by m — a ragged tail
    * would silently skew the last subspace's distances).
    */
  def subVectors(vec: Column, m: Int): Column = {
    val dsub = (size(vec) / m).cast("int")
    transform(sequence(lit(0), lit(m - 1)),
      j => slice(vec, j * dsub + 1, dsub))
  }

  /** PQ codebook training (Jégou et al. 2011): per subspace, `ksub`
    * codewords taken as a deterministic hash-ordered sample of the
    * corpus — the same k-means-seeding analog as [[ivfBuild]]'s coarse
    * centroids (and like there, reproducible by the oracle; iterative
    * Lloyd refinement would buy quality at the cost of replayability).
    * The `ksub` seed vectors are ONE TakeOrdered top-k at any corpus
    * size; slicing them into `m × ksub` codewords is row-local.
    * Returns `(subspace, code_id, codeword)`.
    */
  def pqTrain(corpus: DataFrame, m: Int, ksub: Int = 256,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m > 0 && ksub > 0, s"m and ksub must be positive, got m=$m ksub=$ksub")
    val seeds = corpus
      .select(col(idCol).as("_sid"), col(vecCol).as("_sv"),
        md5(col(idCol).cast("string")).as("_h"))
      .orderBy(col("_h"), col("_sid"))
      .limit(ksub)
      // unpartitioned window: bounded — the frame is the ksub-row limit
      .withColumn("code_id",
        row_number().over(Window.orderBy(col("_h"), col("_sid"))) - 1)
    seeds.select(col("code_id"),
        posexplode(subVectors(col("_sv"), m)).as(Seq("subspace", "codeword")))
      .select(col("subspace"), col("code_id"), col("codeword"))
  }

  /** PQ encoding: each vector becomes `m` one-byte-scale codes — the
    * nearest codeword per subspace (L2, code_id tie-break). A 100 TB
    * float32 corpus stores as ~m bytes/vector (d·4/m× compression, 32×
    * at d=64 m=8). Shape: row-local explode to `m·N` subvector rows, a
    * broadcast codebook join, and two map-side-combining aggregations
    * keyed (id, subspace) then (id) — per-key state is one running min /
    * one m-length list, never the scored candidates.
    */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, m: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sub = corpus.select(col(idCol),
      posexplode(subVectors(col(vecCol), m)).as(Seq("subspace", "_sv")))
    val scored = sub.join(broadcast(codebooks), Seq("subspace"))
      .withColumn("_d", graft.functions.VecMath.l2Native(col("_sv"), col("codeword")))
    val best = scored.groupBy(col(idCol), col("subspace"))
      .agg(min(struct(col("_d"), col("code_id"))).as("_best"))
      .select(col(idCol), col("subspace"), col("_best.code_id").as("code_id"))
    best.groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("subspace"), col("code_id")))),
        s => s.getField("code_id")).as("codes"))
  }

  /** PQ asymmetric-distance (ADC) top-k: per query, ONE distance table of
    * `m × ksub` exact query-subvector-to-codeword distances broadcasts;
    * each database vector's approximate squared L2 is then `m` table
    * lookups summed — the scan touches only the byte codes, never the
    * floats. Per-subspace squared distances are DECIMAL-quantized before
    * the sum, so scores are aggregation-order independent (and the
    * DuckDB oracle replays them bit-for-bit). Self-matches are excluded
    * like [[ivfTopK]]. Compose with IVF for sublinear scans: filter
    * `codes` to the probed clusters' vectors first — this is the
    * IVF-ADC layout FAISS calls IVFPQ.
    */
  def pqTopK(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
      k: Int, m: Int,
      queryId: String = "vec_id", queryVec: String = "embedding"): DataFrame = {
    val idCol = codes.columns.head
    val qsub = queries.select(col(queryId).as("query_id"),
      posexplode(subVectors(col(queryVec), m)).as(Seq("subspace", "_qv")))
    val dsub = graft.functions.VecMath.l2Native(col("_qv"), col("codeword"))
    val table = qsub.join(codebooks, Seq("subspace"))
      .select(col("query_id"), col("subspace"), col("code_id"),
        round(dsub * dsub, 9).cast("decimal(28,9)").as("_dist"))
    val cand = codes
      .select(col(idCol).as("_cid"), posexplode(col("codes")).as(Seq("subspace", "code_id")))
      .join(broadcast(table), Seq("subspace", "code_id"))
      .filter(col("query_id") =!= col("_cid"))
    val scored = cand.groupBy(col("query_id"), col("_cid"))
      .agg(sum(col("_dist")).as("_adist"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("_adist"), col("_cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("_cid").as("neighbor_id"),
        col("_adist").cast("double").as("adist"), col("rank"))
  }

  /** IVF-PQ (the FAISS IVFPQ layout — the standard billion-scale ANN
    * shape): the coarse quantizer prunes to each query's `nprobe`
    * nearest clusters, and only THOSE clusters' byte codes are ADC
    * scanned — scan work is `(nprobe / nlist) · N · m` byte lookups, and
    * the float vectors are never touched at query time. Same
    * decimal-quantized distance sums and tie-breaks as [[pqTopK]].
    */
  def ivfPqTopK(assignments: DataFrame, centroids: DataFrame,
      codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
      k: Int, m: Int, nprobe: Int = 4,
      queryId: String = "vec_id", queryVec: String = "embedding"): DataFrame = {
    val idCol = codes.columns.head
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("_q_v"))
    val qProbes = q.crossJoin(broadcast(centroids))
      .withColumn("_d", graft.functions.VecMath.l2Native(col("_q_v"), col("_ct_v")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("_d"), col("centroid_id"))
    val probes = qProbes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= nprobe)
      .select(col("query_id"), col("centroid_id"))
    // candidate (query, vector) pairs: the probed clusters' members
    val cand = assignments
      .select(col(assignments.columns.head).as("_cid"), col("centroid_id"))
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("_cid"))
      .select(col("query_id"), col("_cid"))
    val qsub = queries.select(col(queryId).as("query_id"),
      posexplode(subVectors(col(queryVec), m)).as(Seq("subspace", "_qv")))
    val dsub = graft.functions.VecMath.l2Native(col("_qv"), col("codeword"))
    val table = qsub.join(codebooks, Seq("subspace"))
      .select(col("query_id"), col("subspace"), col("code_id"),
        round(dsub * dsub, 9).cast("decimal(28,9)").as("_dist"))
    val scored = cand.join(codes, cand("_cid") === codes(idCol))
      .select(col("query_id"), col("_cid"),
        posexplode(col("codes")).as(Seq("subspace", "code_id")))
      .join(broadcast(table), Seq("query_id", "subspace", "code_id"))
      .groupBy(col("query_id"), col("_cid"))
      .agg(sum(col("_dist")).as("_adist"))
    val w2 = Window.partitionBy(col("query_id")).orderBy(col("_adist"), col("_cid"))
    scored.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("_cid").as("neighbor_id"),
        col("_adist").cast("double").as("adist"), col("rank"))
  }

  // ------------------------------------------------------ quality metric

  /** Recall@k of an approximate ANN result against an exact baseline —
    * the operational metric for tuning nprobe/planes/ksub. Both inputs
    * are `(query_id, neighbor_id, rank)` frames (the shape every topK
    * here returns); output is per-query `(hits, recall)`. Queries the
    * approximate pass missed entirely still appear (recall 0). Work is
    * |queries|·k rows — metric cost never scales with the corpus.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val a = approx.filter(col("rank") <= k).select(col("query_id"), col("neighbor_id"))
    val e = exact.filter(col("rank") <= k).select(col("query_id"), col("neighbor_id"))
    val hits = a.join(e, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("_hits"))
    e.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("_hits"), lit(0L)).as("hits"),
        (coalesce(col("_hits"), lit(0L)) / lit(k.toDouble)).as("recall"))
  }
}
