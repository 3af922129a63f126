package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.AudioHash

class AudioHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("fingerprint is deterministic; variants stay within threshold") {
    for (fam <- 0 until 12) {
      val base = AudioHash.fingerprint64(AudioHash.syntheticWav(fam.toLong, 12)).get
      val again = AudioHash.fingerprint64(AudioHash.syntheticWav(fam.toLong, 12)).get
      assert(base == again, s"non-deterministic fingerprint for fam $fam")
      val v1 = AudioHash.fingerprint64(AudioHash.syntheticWav(fam.toLong + 12, 12)).get
      val v2 = AudioHash.fingerprint64(AudioHash.syntheticWav(fam.toLong + 24, 12)).get
      assert(dist(base, v1) <= 2, s"fam $fam v1 drifted ${dist(base, v1)} bits")
      assert(dist(base, v2) <= 2, s"fam $fam v2 drifted ${dist(base, v2)} bits")
    }
    val bases = (0 until 12).map(f =>
      AudioHash.fingerprint64(AudioHash.syntheticWav(f.toLong, 12)).get)
    for (i <- bases.indices; j <- bases.indices if i < j)
      assert(dist(bases(i), bases(j)) > 12,
        s"families $i and $j only ${dist(bases(i), bases(j))} bits apart")
  }

  test("non-wav bytes fingerprint to None") {
    assert(AudioHash.fingerprint64("not audio".getBytes).isEmpty)
    assert(AudioHash.fingerprint64(
      graft.pipeline.ImageHash.syntheticPng(3L, 16)).isEmpty)
  }

  test("gain scaling preserves the fingerprint (contour invariance)") {
    // halve every amplitude by rewriting the PCM payload: comparisons are
    // unchanged, so the fingerprint must be identical
    val wav = AudioHash.syntheticWav(5L, 12)
    val scaled = wav.clone()
    var off = 44
    while (off + 1 < scaled.length) {
      val lo = scaled(off) & 0xFF
      val hi = scaled(off + 1)
      val s = (((hi << 8) | lo).toShort / 2).toShort
      scaled(off) = (s & 0xFF).toByte
      scaled(off + 1) = ((s >> 8) & 0xFF).toByte
      off += 2
    }
    assert(AudioHash.fingerprint64(wav).get == AudioHash.fingerprint64(scaled).get)
  }

  test("audioClusters labels every clip with its family minimum") {
    val n = 108
    val fams = 9
    val clips = AudioHash.withSyntheticWav(
      spark.range(n).select(col("id").as("doc_id")), fams = fams)
    val got = AudioHash.audioClusters(clips)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == n)
    for ((id, rep) <- got) assert(rep == id % fams,
      s"clip $id labeled $rep, expected family min ${id % fams}")
  }
}
