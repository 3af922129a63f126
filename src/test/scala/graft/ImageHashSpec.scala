package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.ImageHash

class ImageHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("phash is deterministic and invariant contracts hold per family") {
    for (fam <- 0 until 16) {
      val base = ImageHash.phash64(ImageHash.syntheticPng(fam.toLong, 16)).get
      val again = ImageHash.phash64(ImageHash.syntheticPng(fam.toLong, 16)).get
      assert(base == again, s"non-deterministic hash for fam $fam")
      // the three variants of one family must sit within the gate's
      // banded verify threshold (3) OF THE BASE — with margin: the CC
      // only needs the base edges, but pin them tight so a codec change
      // that drifts the DCT shows up here, not as an oracle mismatch
      val v1 = ImageHash.phash64(ImageHash.syntheticPng(fam.toLong + 16, 16)).get
      val v2 = ImageHash.phash64(ImageHash.syntheticPng(fam.toLong + 32, 16)).get
      assert(dist(base, v1) <= 2, s"fam $fam corner edit drifted ${dist(base, v1)} bits")
      assert(dist(base, v2) <= 2, s"fam $fam center edit drifted ${dist(base, v2)} bits")
    }
    // cross-family hashes are far apart: no pair of family bases within
    // 4x the match threshold, so banding can never bridge families
    val bases = (0 until 16).map(f =>
      ImageHash.phash64(ImageHash.syntheticPng(f.toLong, 16)).get)
    for (i <- bases.indices; j <- bases.indices if i < j)
      assert(dist(bases(i), bases(j)) > 12,
        s"families $i and $j only ${dist(bases(i), bases(j))} bits apart")
  }

  test("non-image bytes hash to None; real png decodes") {
    assert(ImageHash.phash64("not an image".getBytes).isEmpty)
    assert(ImageHash.phash64(ImageHash.syntheticPng(7L, 16)).isDefined)
  }

  test("degenerate blobs drop the row, never fail the job") {
    // null / empty / 1-byte / magic-only-truncated blobs must all hash to
    // None (the drop-the-row contract) — including an 8-byte PNG-magic
    // prefix that passes the magic check but reaches the codec truncated
    assert(ImageHash.phash64(null).isEmpty)
    assert(ImageHash.phash64(Array.emptyByteArray).isEmpty)
    assert(ImageHash.phash64(Array[Byte](0x89.toByte)).isEmpty)
    val pngMagicOnly = Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0D, 0x0A, 0x1A, 0x0A)
    assert(ImageHash.phash64(pngMagicOnly).isEmpty)
    // and through the DataFrame pass: bad rows drop, good rows survive
    val rows = Seq(
      (1L, ImageHash.syntheticPng(1L, 16)),
      (2L, Array.emptyByteArray),
      (3L, Array[Byte](0x89.toByte)),
      (4L, pngMagicOnly),
      (5L, null.asInstanceOf[Array[Byte]]))
    val out = ImageHash.phashImages(rows.toDF("doc_id", "content")).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
  }

  test("banded pairs equal brute-force pairs within threshold") {
    val n = 96
    val imgs = ImageHash.withSyntheticPng(
      spark.range(n).select(col("id").as("doc_id")), fams = 8)
    val hashes = ImageHash.phashImages(imgs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hashes.length == n, "every synthetic png must decode")
    val brute = (for {
      (li, lh) <- hashes; (ri, rh) <- hashes
      if li < ri && dist(lh, rh) <= 3
    } yield (li, ri)).toSet
    val banded = ImageHash.nearDupPairs(
        ImageHash.phashImages(imgs), maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute,
      s"banded ${banded.size} pairs vs brute ${brute.size}")
    assert(brute.nonEmpty, "test corpus must actually contain near-dups")
  }

  test("phashClusters labels every doc with its family minimum") {
    val n = 120
    val fams = 12
    val imgs = ImageHash.withSyntheticPng(
      spark.range(n).select(col("id").as("doc_id")), fams = fams)
    val got = ImageHash.phashClusters(imgs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == n)
    for ((id, rep) <- got) assert(rep == id % fams,
      s"doc $id labeled $rep, expected family min ${id % fams}")
  }

  test("pair generation is a single banded shuffle, no cartesian") {
    val imgs = ImageHash.withSyntheticPng(
      spark.range(64).select(col("id").as("doc_id")), fams = 8)
    val plan = ImageHash.nearDupPairs(ImageHash.phashImages(imgs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
