package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual image hashing + near-duplicate detection over binary image
  * columns — the image-side analog of MinHash text dedup. The hash is the
  * classic DCT pHash (decode → 32×32 grayscale → 2D DCT-II → sign of the
  * 8×8 low-frequency block vs its median → 64 bits); visually identical
  * or lightly edited images land within a few Hamming bits of each other
  * while unrelated images differ by ~32 bits.
  *
  * Scale design mirrors [[Dedup]]: hashing is row-local (one
  * `mapPartitions` decode pass, cost ∝ pixels of each image, nothing held
  * across rows); candidate generation splits the 64-bit hash into
  * `bands` fixed bit-slices and equi-joins on (slice index, slice value) —
  * by pigeonhole any pair within Hamming distance < bands shares at least
  * one identical slice, so recall is EXACT for maxDist ≤ bands-1, with no
  * image×image pass; verification is one codegen'd
  * `bit_count(l ^ r) <= maxDist` filter on the banded candidates.
  * Clustering reuses [[Dedup.labelComponents]] (pointer-doubling min-label
  * CC). Reference scope: uber/hoodie has no image operators — this is
  * part of the training-data-pipeline extension surface (SURVEY §2.8).
  */
object ImageHash {

  private val HashBits = 64
  private val DctSize = 32 // downsample edge; DCT input is DctSize×DctSize
  private val LowFreq = 8  // keep the top-left LowFreq×LowFreq coefficients

  // ImageIO's default stream cache is a TEMP FILE per encode/decode —
  // at corpus scale that is two disk round trips and a registry
  // synchronization per image (measured ~19 ms/image CPU; memory-cached
  // streams cut the hash pass ~an order of magnitude). Runs once per JVM
  // when the first partition touches this object (executors included).
  // NOTE: this is a deliberate JVM-GLOBAL flip — every other ImageIO user
  // in the process (driver included) switches to memory-backed streams
  // too. That trade is strictly faster for in-memory byte-array codecs
  // like ours; an embedding application that streams huge images from
  // disk through ImageIO and relies on file-backed caching should flip it
  // back AFTER the hash pass, or not share the JVM.
  javax.imageio.ImageIO.setUseCache(false)

  // Per-thread PNG codec instances (same rationale as Multimodal.Jpeg):
  // the ImageIO convenience entry points re-scan the plugin registry per
  // CALL, which at corpus scale rivals the pixel work on 64×64 frames.
  // PNG-magic bytes decode through a reused reader; other containers
  // (JPEG/GIF/BMP) keep the generic path — they only appear in
  // user-supplied corpora where decode cost dominates anyway. A decode
  // failure discards the instance (plugin state after a throw is
  // undefined) and the row drops, exactly as before.
  private val pngReader = new ThreadLocal[javax.imageio.ImageReader]()
  private val pngWriter = new ThreadLocal[javax.imageio.ImageWriter]()

  private def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    // drop-the-row contract enforced locally: a null/short blob must never
    // throw out of the magic-byte probe below (phash64 pre-checks length,
    // but this helper must stay safe for any caller)
    if (bytes == null || bytes.length < 2) return null
    val isPng = bytes(0) == 0x89.toByte && bytes(1) == 'P'
    if (!isPng)
      return try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    var r = pngReader.get()
    if (r == null) {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("png")
      if (!it.hasNext) return null
      r = it.next(); pngReader.set(r)
    }
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try { r.setInput(iis, true, true); r.read(0) }
    catch { case scala.util.control.NonFatal(_) =>
      r.dispose(); pngReader.remove(); null
    } finally iis.close()
  }

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    var w = pngWriter.get()
    if (w == null) {
      w = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      pngWriter.set(w)
    }
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    // mirror the decode path: a writer that threw mid-write is in an
    // undefined plugin state — discard it so the next encode on this
    // thread starts clean
    try { w.setOutput(ios); w.write(img) }
    catch { case e: Throwable => w.dispose(); pngWriter.remove(); throw e }
    finally ios.close()
    out.toByteArray
  }

  // DCT-II basis table: cos((2x+1) u π / 2N) for x,u < N — precomputed
  // once per JVM, shared by every partition's hash loop
  private lazy val cosTable: Array[Array[Double]] = {
    val t = Array.ofDim[Double](DctSize, DctSize)
    for (u <- 0 until DctSize; x <- 0 until DctSize)
      t(u)(x) = math.cos((2 * x + 1) * u * math.Pi / (2.0 * DctSize))
    t
  }

  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 8 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** 64-bit DCT perceptual hash of one image; None when the bytes carry no
    * JDK-decodable container. Bit i (row-major over the 8×8 low-frequency
    * DCT block, DC forced to 0) is set when that coefficient exceeds the
    * block median, so the hash is invariant to brightness/contrast scaling
    * and stable under small local edits.
    */
  def phash64(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || !looksLikeImage(bytes)) return None
    // NonFatal, not just IOException: JDK image plugins throw runtime
    // exceptions (ArrayIndexOutOfBounds, IllegalArgument, CMMException)
    // on corrupt/truncated bytes that pass the magic-byte check — one bad
    // blob in a 100 TB corpus must drop the row, not fail the job
    // (matching Multimodal's decode paths)
    val src = decodeImage(bytes)
    if (src == null) return None
    // grayscale downsample: TYPE_BYTE_GRAY target + bilinear resample
    val gray = new java.awt.image.BufferedImage(DctSize, DctSize,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = gray.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, DctSize, DctSize, null)
    } finally g.dispose()
    val px = Array.ofDim[Double](DctSize, DctSize)
    val raster = gray.getRaster
    for (y <- 0 until DctSize; x <- 0 until DctSize)
      px(y)(x) = raster.getSample(x, y, 0).toDouble
    // separable 2D DCT-II, evaluated only for the LowFreq×LowFreq block:
    // rows first (LowFreq coefficients per row), then columns
    val rowPass = Array.ofDim[Double](DctSize, LowFreq)
    for (y <- 0 until DctSize; u <- 0 until LowFreq) {
      var s = 0.0
      var x = 0
      while (x < DctSize) { s += px(y)(x) * cosTable(u)(x); x += 1 }
      rowPass(y)(u) = s
    }
    val coeffs = new Array[Double](LowFreq * LowFreq)
    for (v <- 0 until LowFreq; u <- 0 until LowFreq) {
      var s = 0.0
      var y = 0
      while (y < DctSize) { s += rowPass(y)(u) * cosTable(v)(y); y += 1 }
      coeffs(v * LowFreq + u) = s
    }
    // median over the block EXCLUDING the DC term (pure brightness)
    val ac = coeffs.drop(1).sorted
    val median = (ac(ac.length / 2 - 1) + ac(ac.length / 2)) / 2.0
    var h = 0L
    var i = 1 // DC bit stays 0
    while (i < HashBits) {
      if (coeffs(i) > median) h |= (1L << i)
      i += 1
    }
    Some(h)
  }

  /** Hash every image: one iterator-to-iterator decode pass →
    * (idCol, phash). Rows whose bytes don't decode are dropped — callers
    * that must keep them join back on idCol.
    */
  def phashImages(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        phash64(bytes).map(h => (id, h))
      })
      .toDF(idCol, "phash")
  }

  /** Near-duplicate image pairs from a (id, phash) frame: banded-slice
    * candidate join + exact Hamming verify. Returns distinct
    * (_l_id, _r_id) with _l_id < _r_id — [[Dedup.labelComponents]]'s edge
    * shape. Recall is exact while `maxDist < bands`; the default (3, 4)
    * keeps that guarantee. Cost: one shuffle on (slice idx, slice value);
    * candidates per bucket ∝ images sharing a 16-bit slice, never all
    * pairs.
    */
  def nearDupPairs(hashes: DataFrame, idCol: String = "doc_id",
      hashCol: String = "phash", maxDist: Int = 3, bands: Int = 4): DataFrame = {
    require(HashBits % bands == 0, s"bands must divide $HashBits")
    require(maxDist < bands,
      s"banded recall is only exact for maxDist < bands (got $maxDist, $bands)")
    val width = HashBits / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val slices = array((0 until bands).map(i =>
      shiftrightunsigned(col(hashCol), i * width).bitwiseAND(lit(mask))): _*)
    val banded = hashes
      .select(col(idCol).as("_ih_id"), col(hashCol).as("_ih_hash"),
        posexplode(slices).as(Seq("_ih_band", "_ih_val")))
    banded.alias("l")
      .join(banded.alias("r"), Seq("_ih_band", "_ih_val"))
      .filter(col("l._ih_id") < col("r._ih_id"))
      .filter(bit_count(col("l._ih_hash").bitwiseXOR(col("r._ih_hash"))) <= maxDist)
      .select(col("l._ih_id").as("_l_id"), col("r._ih_id").as("_r_id"))
      .distinct()
  }

  /** Transitive pHash near-dup clusters: (idCol, cluster_id = min id in
    * the connected component). Composes hash pass → exact-hash collapse →
    * banded pairs → [[Dedup.labelComponents]] → label broadcast-back.
    */
  def phashClusters(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "content", maxDist: Int = 3, bands: Int = 4,
      maxIters: Int = 20): DataFrame = {
    // persist the hash pass: it feeds the collapse, the banded self-join
    // and the final label join — without the cache the decode+DCT scan
    // would run three times (decode is the expensive part, not the joins)
    val hashes = phashImages(df, idCol, binCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try clustersFromHashes(hashes, idCol, "phash", maxDist, bands, maxIters)
    finally hashes.unpersist()
  }

  /** Cluster a (id, 64-bit hash) frame. Dup-heavy corpora are the NORM in
    * dedup workloads — k byte-identical copies of one item would put k
    * rows in every banded bucket (O(k²) candidate pairs per clique, ~800k
    * edges on the 5k-doc gate corpus alone), so exact-duplicate hashes
    * first COLLAPSE to one representative (min id per hash value), the
    * banded join + CC run over distinct hashes only, and the component
    * label (min of the reps = global min id) broadcasts back to all rows
    * through one hash equi-join. Returns (idCol, cluster_id),
    * materialized (safe to unpersist inputs after).
    */
  private[pipeline] def clustersFromHashes(hashes: DataFrame, idCol: String,
      hashCol: String, maxDist: Int, bands: Int, maxIters: Int): DataFrame = {
    val reps = hashes.groupBy(col(hashCol)).agg(min(col(idCol)).as(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val pairs = nearDupPairs(reps, idCol, hashCol, maxDist, bands)
      val labels = Dedup.labelComponents(reps.select(col(idCol)), pairs,
        maxIters, idCol)
      hashes.select(col(idCol).as("_hc_id"), col(hashCol))
        .join(reps.select(col(hashCol), col(idCol).as("_hc_rep")), Seq(hashCol))
        .join(labels.select(col(idCol).as("_hc_rep"), col("cluster_id")),
          Seq("_hc_rep"))
        .select(col("_hc_id").as(idCol), col("cluster_id"))
        // materialize before the callers' finally-unpersist pulls the
        // cached inputs out from under this plan
        .localCheckpoint(eager = true)
    } finally reps.unpersist()
  }

  /** Deterministic synthetic PNGs for gates/specs: family `id % fams`
    * picks an 8×8-block noise pattern (independent noise per family →
    * cross-family pHash distance ~32 bits), variant `(id / fams) % 3`
    * applies either nothing, a small corner edit, or a small center edit
    * (tiny fraction of pixel energy → within-family distance ≤ 2-3 bits).
    * Real PNG bytes, rendered and encoded row-local — the downstream
    * decode path is the production one.
    */
  def withSyntheticPng(df: DataFrame, idCol: String = "doc_id", fams: Int = 16,
      out: String = "content"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      // the id frame usually arrives as one tiny split; codec work is
      // row-local, so spread it across the session's shuffle partitions
      // (real corpora arrive over many parquet splits and skip this)
      .repartition(col(idCol))
      .mapPartitions(it => it.map(id => (id, syntheticPng(id, fams))))
      .toDF(idCol, out)
  }

  /** One 64×64 grayscale PNG for (id, fams) — see [[withSyntheticPng]]. */
  def syntheticPng(id: Long, fams: Int): Array[Byte] = {
    val fam = (id % fams).toInt
    val variant = ((id / fams) % 3).toInt
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until 64; x <- 0 until 64) {
      // integer hash mix over (family, 8×8 block coords): deterministic
      // blocky noise, unique texture per family
      var m = fam * 0x9E3779B9L + (x >> 3) * 0x85EBCA6BL + (y >> 3) * 0xC2B2AE35L
      m ^= m >>> 16; m *= 0x27D4EB2FL; m ^= m >>> 13
      var v = (m & 0xFF).toInt
      if (variant == 1 && x < 2 && y < 2) v = math.min(255, v + 12)
      if (variant == 2 && x >= 31 && x <= 32 && y >= 31 && y <= 32)
        v = math.min(255, v + 12)
      raster.setSample(x, y, 0, v)
    }
    encodePng(img) // cached per-thread writer, memory-backed stream
  }
}
