package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal.AudioCodec

/** Acoustic fingerprinting + near-duplicate detection over binary audio
  * columns — the audio analog of [[ImageHash]]. The fingerprint is a
  * 64-bit energy-contour hash (Haitsma-Kalker shape without the FFT
  * dependency): decode PCM → 65 equal RMS windows → bit i = window i+1
  * louder than window i. Re-encoded/level-shifted copies keep the contour
  * (comparisons are scale-invariant under uniform gain) while unrelated
  * clips share ~32 random bits.
  *
  * Candidate generation and clustering reuse the generic banded-Hamming
  * machinery ([[ImageHash.nearDupPairs]], [[Dedup.labelComponents]]):
  * exact recall for maxDist < bands, one slice-keyed shuffle, no
  * clip×clip pass.
  */
object AudioHash {

  private val Windows = 65 // 64 adjacent comparisons = 64 bits

  /** 64-bit energy-contour fingerprint; None for non-PCM-WAV bytes. */
  def fingerprint64(bytes: Array[Byte]): Option[Long] =
    AudioCodec.decode(bytes).map { case (_, samples) =>
      val e = AudioCodec.bandEnergies(samples, Windows)
      var h = 0L
      var i = 0
      while (i < Windows - 1) {
        if (e(i + 1) > e(i)) h |= (1L << i)
        i += 1
      }
      h
    }

  /** Fingerprint every clip: one iterator-to-iterator decode pass →
    * (idCol, afp). Undecodable rows are dropped.
    */
  def fingerprintAudio(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        fingerprint64(bytes).map(h => (id, h))
      })
      .toDF(idCol, "afp")
  }

  /** Transitive audio near-dup clusters: (idCol, cluster_id = min id in
    * the connected component).
    */
  def audioClusters(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "content", maxDist: Int = 3, bands: Int = 4,
      maxIters: Int = 20): DataFrame = {
    // cache the decode pass, collapse exact-duplicate fingerprints, CC
    // over representatives — as in [[ImageHash.phashClusters]]
    val fps = fingerprintAudio(df, idCol, binCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try ImageHash.clustersFromHashes(fps, idCol, "afp", maxDist, bands, maxIters)
    finally fps.unpersist()
  }

  /** Deterministic synthetic PCM WAVs for gates/specs: family `id % fams`
    * picks a 65-window amplitude contour from integer hash noise
    * (independent per family → ~32-bit cross-family distance), variant
    * `(id / fams) % 3` bumps one window's amplitude (affects at most the
    * two adjacent contour comparisons → within-family distance ≤ 2).
    * Real RIFF/WAVE 16-bit PCM bytes, decoded by the production codec.
    */
  def withSyntheticWav(df: DataFrame, idCol: String = "doc_id", fams: Int = 12,
      out: String = "content"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      // one tiny input split would serialize the render+decode loop —
      // spread row-local codec work like [[ImageHash.withSyntheticPng]]
      .repartition(col(idCol))
      .mapPartitions(it => it.map(id => (id, syntheticWav(id, fams))))
      .toDF(idCol, out)
  }

  /** One mono 16-bit 8 kHz WAV for (id, fams) — see [[withSyntheticWav]].
    * Each of the 65 windows holds 64 samples alternating ±A_w, so the
    * decoded window RMS is exactly A_w/32768 and the fingerprint reduces
    * to integer amplitude comparisons — bit-stable across JVMs.
    */
  def syntheticWav(id: Long, fams: Int): Array[Byte] = {
    val fam = (id % fams).toInt
    val variant = ((id / fams) % 3).toInt
    val perWindow = 64
    val n = Windows * perWindow
    val amps = Array.tabulate(Windows) { w =>
      var m = fam * 0x9E3779B9L + w * 0x85EBCA6BL + 0xC2B2AE35L
      m ^= m >>> 16; m *= 0x27D4EB2FL; m ^= m >>> 13
      1000 + (m & 0x3FFF).toInt // 1000..17383, no clipping
    }
    if (variant == 1) amps(3) += 700
    if (variant == 2) amps(40) += 700
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val a = amps(i / perWindow)
      val s = (if ((i & 1) == 0) a else -a).toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    // RIFF/WAVE container: 44-byte canonical PCM header, little-endian
    val sampleRate = 8000
    val byteRate = sampleRate * 2
    val dataLen = pcm.length
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(1.toShort) // mono
      .putInt(sampleRate).putInt(byteRate)
      .putShort(2.toShort) // block align
      .putShort(16.toShort) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
      .put(pcm)
    bb.array()
  }
}
