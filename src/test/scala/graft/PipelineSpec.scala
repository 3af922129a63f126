package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline._

class PipelineSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  lazy val docs = spark.read.parquet(s"$sf001/documents.parquet").cache()
  lazy val embs = spark.read.parquet(s"$sf001/embeddings.parquet").cache()

  test("exact dedup keeps lowest id per duplicate text") {
    val df = Seq((1L, "hello  world"), (2L, "Hello World"), (3L, "different"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df)
    assert(out.count() === 2)
    assert(out.filter($"doc_id" === 1L).count() === 1) // min id wins
    assert(out.filter($"doc_id" === 2L).count() === 0)
  }

  test("NFKC-aware exact dedup unifies full-width/ligature variants (opt-in)") {
    val df = Seq(
      (1L, "the final fix works"),
      (2L, "ｔｈｅ ｆｉｎａｌ ｆｉｘ ｗｏｒｋｓ"), // full-width twin
      (3L, "the ﬁnal ﬁx works"), // ligature twin
      (4L, "something else entirely")).toDF("doc_id", "text")
    // default behavior unchanged: no variant collides
    assert(Dedup.exact(df).count() === 4)
    // opt-in NFKC: the three spellings are one group, min id survives
    val out = Dedup.exact(df, unicodeForm = Some("NFKC"))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 4L))
    // same opt-in on the minhash tokenizer: the full-width twin of a long
    // doc bands with its ascii original only under NFKC
    val long1 = "the quick brown fox jumps over the lazy dog and runs far away home"
    val wide = long1.map(c => if (c >= 'a' && c <= 'z') (c - 'a' + 0xFF41).toChar else c)
    val pair = Seq((10L, long1), (11L, wide)).toDF("doc_id", "text")
    assert(Dedup.minhashDedup(pair, threshold = 0.7).count() === 2)
    assert(Dedup.minhashDedup(pair, threshold = 0.7,
      unicodeForm = Some("NFKC")).count() === 1)
  }

  test("minhash signature similarity tracks jaccard") {
    val near = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (2L, "the quick brown fox jumps over the lazy dog and runs far away from home"),
      (3L, "completely unrelated text about apache spark catalyst optimizer internals"))
      .toDF("doc_id", "text")
    val sigs = near.select($"doc_id", Dedup.minhashSignature($"text").as("sig"))
    val s12 = sigs.as("a").join(sigs.as("b"), $"a.doc_id" === 1 && $"b.doc_id" === 2)
      .select(Dedup.signatureSimilarity($"a.sig", $"b.sig")).first().getDouble(0)
    val s13 = sigs.as("a").join(sigs.as("b"), $"a.doc_id" === 1 && $"b.doc_id" === 3)
      .select(Dedup.signatureSimilarity($"a.sig", $"b.sig")).first().getDouble(0)
    assert(s12 > 0.6, s"near-dup pair similarity $s12")
    assert(s13 < 0.2, s"unrelated pair similarity $s13")
  }

  // note: the synthetic docs are drawn from a tiny vocabulary, so distinct
  // doc_ids can genuinely be near-duplicates of each other — self-dedup the
  // base first, then plant dups and check only they get removed.
  test("minhash dedup drops planted near-duplicates from real documents") {
    val base = Dedup.minhashDedup(docs.limit(200), threshold = 0.5).cache()
    val planted = base.limit(20)
      .withColumn("doc_id", $"doc_id" + 1000000L)
      .withColumn("text", concat($"text", lit(" extra")))
    val out = Dedup.minhashDedup(base.unionByName(planted), threshold = 0.5)
    assert(out.filter($"doc_id" >= 1000000L).count() === 0) // planted dups gone
    assert(out.filter($"doc_id" < 1000000L).count() === base.count()) // base kept
    base.unpersist()
  }

  test("minhash clusters: transitive components, min-id labels") {
    // A≈B, B≈C chain (one-word steps) plus an isolated doc: the cluster
    // must close transitively even if A and C alone would not pair
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val df = Seq(
      (10L, base),
      (11L, base + " one"),
      (12L, base + " one two"),
      (99L, "completely unrelated text about catalyst optimizer rule injection"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashClusters(df, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) === 10L)
    assert(out(11L) === 10L)
    assert(out(12L) === 10L) // transitive: via 11
    assert(out(99L) === 99L) // singleton labels itself
    // agreement with pairwise dedup: every dropped doc is a non-representative
    val kept = Dedup.minhashDedup(df, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val reps = out.filter { case (id, label) => id == label }.keySet
    assert(reps.subsetOf(kept))
  }

  test("minhash clusters: >20-hop chain converges within default maxIters") {
    // sliding-window docs: doc i = tokens 2i..2i+39, so consecutive docs
    // are near-dups (shingle Jaccard ~0.9) while the signature threshold
    // kills spans beyond ~5 windows — the 150-doc chain's component
    // diameter is >20 hops. Plain min-label propagation needs a round per
    // hop and would blow the default maxIters=20; pointer doubling
    // converges in O(log diameter).
    val n = 150
    val words = (0 until 2 * n + 40).map(i => s"tok$i")
    val df = (0 until n)
      .map(i => (i.toLong, words.slice(2 * i, 2 * i + 40).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.minhashClusters(df, threshold = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === n)
    assert(out.values.toSet === Set(0L)) // one component, min-id label
  }

  test("minhash bucket cap bounds degenerate buckets (recall tradeoff)") {
    // 40 byte-identical docs land in the same bucket of every band; a cap
    // below 40 drops those buckets so no pairs are generated for them,
    // while normal-width buckets still pair
    val identical = (1L to 40L).map(i => (i, "same exact text repeated in every document here"))
    val pairDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today and yesterday"),
      (101L, "the quick brown fox jumps over the lazy dog today and tomorrow"))
    val df = (identical ++ pairDocs).toDF("doc_id", "text")
    val capped = Dedup.minhashDedup(df, threshold = 0.5, maxBucketSize = Some(10))
    assert(capped.filter($"doc_id" <= 40L).count() === 40) // cap skipped them
    assert(capped.filter($"doc_id" >= 100L).count() === 1) // normal pair deduped
    val uncapped = Dedup.minhashDedup(df, threshold = 0.5)
    assert(uncapped.filter($"doc_id" <= 40L).count() === 1) // default: exact behavior
  }

  test("simhash dedup catches small edits") {
    val base = Dedup.simhashDedup(docs.limit(200), maxDistance = 3).cache()
    val planted = base.limit(15)
      .withColumn("doc_id", $"doc_id" + 2000000L) // identical text, new id
    val out = Dedup.simhashDedup(base.unionByName(planted), maxDistance = 3)
    assert(out.filter($"doc_id" >= 2000000L).count() === 0)
    assert(out.filter($"doc_id" < 2000000L).count() === base.count())
    base.unpersist()
  }

  test("ngram jaccard: exact verification works") {
    val j = Seq((1L)).toDF("x").select(
      Dedup.ngramJaccard(lit("abcdefgh"), lit("abcdefgh"), 3).as("same"),
      Dedup.ngramJaccard(lit("abcdefgh"), lit("zzzzzzzz"), 3).as("diff"))
      .first()
    assert(j.getDouble(0) === 1.0)
    assert(j.getDouble(1) === 0.0)
  }

  test("embedding dedup drops duplicated vectors") {
    val base = embs.limit(200)
    val planted = base.limit(10).withColumn("vec_id", $"vec_id" + 5000000L)
    val out = Dedup.embeddingDedup(base.unionByName(planted), threshold = 0.999)
    assert(out.filter($"vec_id" >= 5000000L).count() === 0)
  }

  test("brute-force topK finds the planted nearest neighbor") {
    val corpus = embs.limit(500)
    val q = corpus.filter($"vec_id" === corpus.select(min("vec_id")).first().getLong(0))
    // plant an identical vector under a new id: must rank #1 with score ~1
    val qid = q.first().getLong(0)
    val planted = q.withColumn("vec_id", lit(7777777L))
    val res = Similarity.bruteForceTopK(corpus.unionByName(planted), q, k = 5)
    val top = res.filter($"rank" === 1).first()
    assert(top.getLong(1) === 7777777L)
    assert(top.getDouble(2) > 0.999)
  }

  test("LSH topK finds planted close neighbors (same-bucket guarantee)") {
    // random vectors have no close neighbors, so test the property LSH
    // actually provides: a near-identical vector lands in the same bucket
    val corpus = embs.limit(300).cache()
    val queries = corpus.limit(8)
    val planted = queries.withColumn("vec_id", $"vec_id" + 7000000L) // exact copies
    val res = Similarity.lshTopK(corpus.unionByName(planted), queries, 5,
      planes = 8, probeBits = 2)
    val hits = res.filter($"neighbor_id" >= 7000000L && $"rank" === 1).count()
    assert(hits === 8, s"planted copy ranked #1 for $hits/8 queries")
    corpus.unpersist()
  }

  test("int8 quantization: codes in range, reconstruction error within step/2") {
    val v = embs.limit(200)
      .withColumn("embedding", transform($"embedding", x => x.cast("double")))
      .withColumn("q", Similarity.quantize($"embedding"))
    val checked = v.select(
      array_min($"q.codes").as("cmin"), array_max($"q.codes").as("cmax"),
      // max |x - dequant(x)| must be ≤ step/2 (round-to-nearest)
      aggregate(
        zip_with($"embedding", Similarity.dequantize($"q"), (x, y) => abs(x - y)),
        lit(0.0d), (acc, e) => greatest(acc, e)).as("maxerr"),
      ($"q.step" / 2 + lit(1e-12)).as("bound")).cache()
    assert(checked.filter($"cmin" < 0 || $"cmax" > 255).count() === 0)
    assert(checked.filter($"maxerr" > $"bound").count() === 0)
    checked.unpersist()
  }

  test("quantized topK: planted exact copy ranks #1 after rescore") {
    val corpus = embs.limit(400)
      .withColumn("embedding", transform($"embedding", x => x.cast("double")))
    val queries = corpus.limit(4)
    val planted = queries.withColumn("vec_id", $"vec_id" + 8000000L)
    val res = Similarity.quantizedTopK(corpus.unionByName(planted), queries, k = 5)
    val hits = res.filter($"neighbor_id" >= 8000000L && $"rank" === 1)
    assert(hits.count() === 4)
    assert(hits.filter($"score" < 0.999).count() === 0)
  }

  test("IVF topK returns sane neighbors") {
    val corpus = embs.limit(300)
    val (assignments, centroids) = Similarity.ivfBuild(corpus, nlist = 8)
    assert(assignments.count() === 300)
    val queries = corpus.limit(3)
    val res = Similarity.ivfTopK(assignments, centroids, queries, k = 5, nprobe = 4)
    assert(res.groupBy("query_id").count().filter($"count" =!= 5).count() === 0)
    assert(res.filter($"score" > 1.0001).count() === 0)
  }

  test("text stats annotate: sane ranges on real docs") {
    val out = TextStats.annotate(docs.limit(300)).cache()
    assert(out.filter($"n_tokens" <= 0).count() === 0)
    assert(out.filter($"quality" < 0 || $"quality" > 1).count() === 0)
    assert(out.filter($"punct_ratio" < 0 || $"punct_ratio" > 1).count() === 0)
    // fingerprint is stable: identical normalized text → same fingerprint
    val fp = Seq(("a  b", 1), ("A b ", 2)).toDF("text", "i")
      .select(TextStats.fingerprint($"text").as("f")).distinct()
    assert(fp.count() === 1)
    out.unpersist()
  }

  test("langId identifies stopword-bearing sentences") {
    // the synthetic docs' lang labels don't correlate with their (English
    // token soup) text — use real sentences per language instead
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy with the sun"),
      ("de", "der hund ist nicht mit der katze und das ist ein problem"),
      ("fr", "le chat est dans la maison et il ne mange pas pour une heure"),
      ("es", "el perro no es una amenaza para los gatos y por eso que"),
      ("und", "xyzzy plugh quux")).toDF("expected", "text")
    val got = samples.withColumn("pred", TextStats.langId($"text"))
    assert(got.filter($"pred" =!= $"expected").count() === 0)
    // the synthetic token soup carries almost no stopwords: predictions
    // must stay within {en (the), pt (a), und} — never a confident wrong hit
    val docsPred = docs.limit(200).withColumn("pred", TextStats.langId($"text"))
    assert(docsPred.filter(!$"pred".isin("en", "pt", "und")).count() === 0)
  }

  test("script profile + dominant script across mixed-script texts") {
    val samples = Seq(
      (1L, "hello plain latin text here"),
      (2L, "привет мир как дела"),
      (3L, "你好世界今天天气很好"),
      (4L, "mixed latin и кириллица half and half"),
      (5L, "12345 ... !!!")).toDF("id", "text")
    val got = samples.select($"id",
      TextStats.scriptProfile($"text").as("p"),
      TextStats.dominantScript($"text").as("dom"))
    val rows = got.select($"id", $"p.n_letters", $"p.latin", $"p.cyrillic",
        $"p.han", $"dom").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getString(5)))).toMap
    assert(rows(1L)._2 === 1.0 && rows(1L)._5 === "latin")
    assert(rows(2L)._3 === 1.0 && rows(2L)._5 === "cyrillic")
    assert(rows(3L)._4 === 1.0 && rows(3L)._5 === "han")
    // mixed-script spam shape: both scripts clearly present (the latin
    // majority still carries the dominant label)
    assert(rows(4L)._2 > 0.5 && rows(4L)._3 > 0.2 && rows(4L)._5 === "latin")
    // no letters at all: zero shares, undetermined
    assert(rows(5L)._1 === 0L && rows(5L)._5 === "und")
    // SQL surface parity
    samples.createOrReplaceTempView("scripts_v")
    val viaSql = spark.sql(
      "SELECT id, graft_dominant_script(text) AS d FROM scripts_v ORDER BY id")
      .collect().map(_.getString(1)).toSeq
    assert(viaSql === Seq("latin", "cyrillic", "han", viaSql(3), "und"))
  }

  test("text search: bm25 ranks the matching doc first; tfidf surfaces the rare term") {
    val corpus = Seq(
      (1L, "spark catalyst optimizer rules rewrite logical plans"),
      (2L, "the lazy dog sleeps in the sun all day long"),
      (3L, "catalyst converters and the dog park"),
      (4L, "sun and sand and sea")).toDF("doc_id", "text")
    val qs = Seq((100L, "catalyst optimizer")).toDF("query_id", "text")
    val hits = TextSearch.bm25TopK(corpus, qs, k = 3).orderBy("rank").collect()
    // doc 1 has BOTH query terms (one of them corpus-unique) → rank 1;
    // doc 3 shares only "catalyst" → ranked below; docs 2/4 absent
    assert(hits.map(_.getLong(1)).toSeq === Seq(1L, 3L))
    assert(hits.head.getInt(3) === 1)
    assert(hits.head.getDouble(2) > hits(1).getDouble(2))
    val kws = TextSearch.tfidfKeywords(corpus, topK = 2)
    val d1 = kws.filter($"doc_id" === 1L && $"rank" === 1).collect().head
    // doc 1's corpus-unique terms tie at tf·ln(4); the deterministic
    // (score DESC, term) order picks the alphabetically first one
    assert(d1.getAs[String]("term") === "logical")
    assert(d1.getDouble(2) === math.rint(math.log(4.0) * 1e4) / 1e4)
    assert(kws.filter($"rank" > 2).count() === 0)
  }

  test("multimodal: decode, resize, frame-sample, audio plumbing") {
    val blobs = Multimodal.withFakeBinary(docs.limit(50), "doc_id")
    val decoded = Multimodal.decodeImages(blobs)
    assert(decoded.count() === 50)
    assert(decoded.filter(d => d.meta.width < 64 || d.meta.channels != 3).count() === 0)
    val resized = Multimodal.resizeImages(blobs, 224, 224)
    assert(resized.columns.toSeq === Seq("doc_id", "content_resized", "width", "height"))
    assert(resized.filter($"width" =!= 224).count() === 0)
    val frames = Multimodal.sampleFrames(blobs.limit(10), n = 4)
    assert(frames.count() === 40)
    assert(frames.filter(_.tsMillis > 3000).count() === 0)
    val audio = Multimodal.audioFeatures(blobs.limit(10))
    assert(audio.filter(_.features.length != 13).count() === 0)
  }

  test("multimodal: real PCM WAV bytes decode through javax.sound.sampled") {
    // a 0.5 s 8 kHz mono 16-bit 440 Hz sine, encoded in-test: the real
    // path must report the true sample rate/duration and an RMS energy
    // near a full-scale sine's 1/sqrt(2) in EVERY band; the stub path
    // (non-WAV bytes) keeps its deterministic vector
    val sr = 8000
    val n = sr / 2
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * 440 * i / sr) * 0.8 * 32767).toInt
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val df = Seq((1L, wav), (2L, Array.fill[Byte](64)(0x5a))).toDF("doc_id", "content")
    val out = Multimodal.audioFeatures(df, coeffs = 4).collect().sortBy(_.id)
    val real = out(0)
    assert(real.sampleRate === sr)
    assert(real.durationMs === 500L)
    val want = 0.8 / math.sqrt(2.0)
    assert(real.features.length === 4)
    real.features.foreach(e => assert(math.abs(e - want) < 0.01, s"band rms $e"))
    val stub = out(1)
    assert(stub.sampleRate === 16000 && stub.features.length === 4)
  }

  test("multimodal: real PNG/JPEG bytes decode through javax.imageio") {
    // a real 37x23 RGB PNG and an 11x7 JPEG, encoded in-test — the decode
    // path must return the true container dims/format, not stub metadata
    def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, encode(37, 23, "png")),
      (2L, encode(11, 7, "jpg")),
      (3L, Array.fill[Byte](64)(0x5a))) // not an image -> stub path
      .toDF("doc_id", "content")
    val out = Multimodal.decodeImages(df).collect()
      .map(d => d.id -> d.meta).toMap
    assert(out(1L).width === 37 && out(1L).height === 23)
    assert(out(1L).format === "png" && out(1L).channels === 3)
    assert(out(2L).width === 11 && out(2L).height === 7)
    assert(out(2L).format.startsWith("jp")) // "jpeg"
    assert(out(3L) === Multimodal.FakeCodec.imageMeta(Array.fill[Byte](64)(0x5a)))
  }

  test("multimodal: direct RIFF PCM walk is bit-identical to javax.sound") {
    import graft.pipeline.Multimodal.AudioCodec
    // mono 16-bit (the synthetic fingerprint corpus), stereo 16-bit and
    // 8-bit unsigned (encoded through javax.sound itself), all must
    // decode identically through both paths
    def encode(fmt: javax.sound.sampled.AudioFormat, frames: Int): Array[Byte] = {
      val bytes = new Array[Byte](frames * fmt.getFrameSize)
      (bytes.indices).foreach(i => bytes(i) = ((i * 31 + 7) & 0xff).toByte)
      val bais = new java.io.ByteArrayInputStream(bytes)
      val ais = new javax.sound.sampled.AudioInputStream(bais, fmt, frames)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val cases = Seq(
      graft.pipeline.AudioHash.syntheticWav(9L, 12),
      encode(new javax.sound.sampled.AudioFormat(22050f, 16, 2, true, false), 333),
      encode(new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false), 137))
    for ((wav, i) <- cases.zipWithIndex) {
      val direct = AudioCodec.decode(wav)
      val spi = AudioCodec.decodeViaJavaSound(wav)
      assert(direct.isDefined && spi.isDefined, s"case $i failed to decode")
      assert(direct.get._1 === spi.get._1, s"case $i sample rate")
      assert(direct.get._2.sameElements(spi.get._2), s"case $i samples diverge")
    }
    // truncated header: neither path may throw
    assert(AudioCodec.decode(cases.head.take(30)).isEmpty)
  }

  test("multimodal: real ISO-BMFF container metadata parse") {
    // v0 round trip through the synthetic builder
    val mp4 = Multimodal.syntheticMp4(durationMs = 12340, width = 640, height = 360)
    assert(Multimodal.VideoCodec.videoMeta(mp4)
      === Some((12340L, 640, 360, 1, "isom")))
    // a 64-bit-time (version 1) mvhd, built by hand: long clips use it
    val mvhd1 = {
      val b = java.nio.ByteBuffer.allocate(8 + 112)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(8 + 112).put("mvhd".getBytes("US-ASCII"))
      b.putInt(0x01000000) // version 1
      b.putLong(0).putLong(0) // 64-bit ctime, mtime
      b.putInt(90000) // timescale
      b.putLong(90000L * 7200) // 2h duration in units
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      b.putInt(0).putInt(0)
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(b.putInt)
      (1 to 6).foreach(_ => b.putInt(0))
      b.putInt(2)
      b.array()
    }
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", "mp42".getBytes("US-ASCII") ++ Array.fill[Byte](4)(0))
    val longClip = ftyp ++ box("moov", mvhd1)
    assert(Multimodal.VideoCodec.videoMeta(longClip)
      === Some((7200000L, 0, 0, 0, "mp42")))
    // non-BMFF bytes refuse (caller falls to the stub path)
    assert(Multimodal.VideoCodec.videoMeta("not a video".getBytes).isEmpty)
    assert(Multimodal.VideoCodec.videoMeta(
      graft.pipeline.ImageHash.syntheticPng(1L, 4)).isEmpty)
    // the Dataset operator: real parse for MP4 rows, stub for garbage
    val df = Seq((1L, mp4), (2L, Array.fill[Byte](32)(0x11))).toDF("doc_id", "content")
    val out = Multimodal.videoMeta(df).collect().map(v => v.id -> v).toMap
    assert(out(1L).durationMs === 12340L && out(1L).width === 640 &&
      out(1L).videoTracks === 1 && out(1L).brand === "isom")
    assert(out(2L).brand === "fake")
  }

  test("multimodal: real MJPEG-AVI frame extraction and decode") {
    import Multimodal.VideoCodec
    val jpegs = (0 until 3).map(i => Multimodal.syntheticJpegFrame(42L, i, 64))
    val avi = Multimodal.syntheticMjpegAvi(jpegs, 64, 64, microSecPerFrame = 33333L)
    // byte-identical frame round trip + the container frame rate
    val Some((uspf, got)) = VideoCodec.aviMjpegFrames(avi)
    assert(uspf === 33333L)
    assert(got.length === 3)
    got.zip(jpegs).foreach { case (a, b) => assert(a.sameElements(b)) }
    // odd-length JPEG payloads stay aligned (RIFF pads to word boundary)
    assert(jpegs.exists(_.length % 2 == 1) || {
      val odd = jpegs.map(j => j :+ 0xD9.toByte) // force odd somewhere
      VideoCodec.aviMjpegFrames(
        Multimodal.syntheticMjpegAvi(odd, 64, 64)).exists(_._2.length == 3)
    })
    // non-AVI / truncated bytes refuse cleanly
    assert(VideoCodec.aviMjpegFrames("not a video".getBytes).isEmpty)
    assert(VideoCodec.aviMjpegFrames(avi.take(30)).isEmpty)
    assert(VideoCodec.aviMjpegFrames(
      graft.pipeline.AudioHash.syntheticWav(1L, 4)).isEmpty)

    // the Dataset operators: videoFrames decodes real dims + timestamps
    val df = Seq((7L, avi)).toDF("doc_id", "content")
    val frames = Multimodal.videoFrames(df).collect().sortBy(_.frameIdx)
    assert(frames.map(f => (f.frameIdx, f.tsMillis, f.width, f.height)).toSeq ===
      Seq((0, 0L, 64, 64), (1, 33L, 64, 64), (2, 66L, 64, 64)))
    // sampleFrames rides the REAL frames for AVI bytes (bit-identical
    // payloads), evenly sampled when n < frame count
    val sampled = Multimodal.sampleFrames(df, n = 2).collect().sortBy(_.frameIdx)
    assert(sampled.length === 2)
    assert(sampled(0).frame.sameElements(jpegs(0)))
    assert(sampled.forall(f => f.tsMillis === f.frameIdx * 33333L / 1000L))
    // frameIdx is the DENSE output index even when sampling skips
    // container frames: 5 frames sampled to 2 yields idx 0,1 with the
    // CONTAINER position (0 and 2) surviving only in the timestamp
    val jpegs5 = (0 until 5).map(i => Multimodal.syntheticJpegFrame(43L, i, 64))
    val avi5 = Multimodal.syntheticMjpegAvi(jpegs5, 64, 64, microSecPerFrame = 40000L)
    val sampled5 = Multimodal.sampleFrames(Seq((9L, avi5)).toDF("doc_id", "content"),
      n = 2).collect().sortBy(_.frameIdx)
    assert(sampled5.map(_.frameIdx).toSeq === Seq(0, 1))
    assert(sampled5.map(_.tsMillis).toSeq === Seq(0L, 2 * 40000L / 1000L))
    assert(sampled5(1).frame.sameElements(jpegs5(2)))
    // …and still stubs for non-AVI bytes
    val stub = Multimodal.sampleFrames(
      Seq((8L, Array.fill[Byte](64)(0x22))).toDF("doc_id", "content"), n = 4)
    assert(stub.count() === 4)
  }

  test("multimodal: real PNG resize re-encodes at the target dims") {
    def encodePng(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 7 + y * 13) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val notImage = Array.fill[Byte](64)(0x5a)
    val df = Seq((1L, encodePng(64, 32)), (2L, notImage)).toDF("doc_id", "content")
    val out = Multimodal.resizeImages(df, 16, 16).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("content_resized")).toMap
    // the real image came back as a REAL 16x16 PNG
    val meta = Multimodal.ImageCodec.imageMeta(out(1L))
    assert(meta.exists(m => m.width == 16 && m.height == 16 && m.format == "png"))
    // non-image bytes keep the deterministic stub (truncation)
    assert(out(2L).toSeq === notImage.take(16).toSeq)
  }

  test("repetition signals: hand-computed gram coverage") {
    val df = Seq(
      (1L, "a b a b a b"),                       // heavy 2-gram repetition
      (2L, "spam spam spam spam spam spam"),     // one repeated word
      (3L, "ab cd ef gh ij kl mn op qr st uv wx yz aa bb cc dd ee ff gg"))  // all distinct
      .toDF("doc_id", "text")
    val out = Repetition.annotate(df).collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: tk=[a,b]*3, nc=11; top 2-gram "a b"×3 → 9/11; 3-gram "a b a"×2 → 10/11;
    // 5-grams both unique → dup5 = 0
    assert(out(1L).getAs[Double]("uniq_word_ratio") === 0.3333)
    assert(out(1L).getAs[Double]("top2_frac") === math.rint(9.0 / 11 * 10000) / 10000)
    assert(out(1L).getAs[Double]("top3_frac") === math.rint(10.0 / 11 * 10000) / 10000)
    assert(out(1L).getAs[Double]("dup5_frac") === 0.0)
    assert(!out(1L).getAs[Boolean]("rep_ok"))
    // doc 2: every gram duplicated; coverage clamps to 1
    assert(out(2L).getAs[Double]("top2_frac") === 1.0)
    assert(out(2L).getAs[Double]("dup5_frac") === 1.0)
    assert(!out(2L).getAs[Boolean]("rep_ok"))
    // doc 3: all words distinct, long enough that no single gram dominates
    assert(out(3L).getAs[Double]("uniq_word_ratio") === 1.0)
    assert(out(3L).getAs[Double]("dup5_frac") === 0.0)
    assert(out(3L).getAs[Boolean]("rep_ok"))
  }

  test("repetition signals: native expression == declarative fold on real docs") {
    val native = docs.limit(300).select($"doc_id",
      Repetition.signals($"text").as("s")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getStruct(1).toSeq).toMap
    val declarative = docs.limit(300)
      .withColumn("_tk", Repetition.tokens($"text"))
      .select($"doc_id", Repetition.signalsFromTokens($"_tk").as("s")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getStruct(1).toSeq).toMap
    assert(native === declarative)
  }

  test("repetition signals: in range on real docs, no shuffle in the plan") {
    val out = Repetition.annotate(docs.limit(200))
    val bad = out.filter(
      $"uniq_word_ratio" < 0 || $"uniq_word_ratio" > 1 ||
        $"top2_frac" < 0 || $"top2_frac" > 1 ||
        $"top3_frac" < 0 || $"top3_frac" > 1 ||
        $"dup5_frac" < 0 || $"dup5_frac" > 1)
    assert(bad.count() === 0)
    // row-local: the annotation plan must not contain an exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition annotate shuffled:\n$plan")
  }

  test("binned range join equals the naive theta join") {
    val ev = graft.queries.QUtil.events(spark, sf001)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
      .withColumn("lo", $"click_ts" - expr("INTERVAL 30 MINUTES"))
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
    val binned = RangeJoin.pointsInIntervals(views, clicks, Seq("user_id"),
        "view_ts", "lo", "click_ts", binSeconds = 1800L)
      .select($"click_id", $"view_id")
    val naive = views.join(clicks, Seq("user_id"))
      .where($"view_ts" >= $"lo" && $"view_ts" <= $"click_ts")
      .select($"click_id", $"view_id")
    assert(binned.count() > 0, "no pairs matched — test data assumption broke")
    assert(binned.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(binned).count() === 0)
    // a coarser bin must not change the result (more residual filtering)
    val coarse = RangeJoin.pointsInIntervals(views, clicks, Seq("user_id"),
        "view_ts", "lo", "click_ts", binSeconds = 86400L)
      .select($"click_id", $"view_id")
    assert(coarse.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(coarse).count() === 0)
  }

  test("contamination score: graded overlap, zero for clean docs") {
    val bench = Seq((100L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val train = Seq(
      // 9 tokens -> 2 distinct 8-grams, one of which is the benchmark's
      (1L, "one two three four five six seven eight nine"),
      (2L, "totally clean words that never appear in the benchmark text"))
      .toDF("doc_id", "text")
    val out = Decontaminate.contaminationScore(train, bench, n = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_shingles") === 2L)
    assert(out(1L).getAs[Long]("n_hits") === 1L)
    assert(out(1L).getAs[Double]("contamination") === 0.5)
    assert(out(2L).getAs[Long]("n_hits") === 0L)
    assert(out(2L).getAs[Double]("contamination") === 0.0)
    // the hard-drop operator is the contamination > 0 special case
    val kept = Decontaminate.decontaminate(train, bench, n = 8)
    assert(kept.select("doc_id").as[Long].collect().toSet === Set(2L))
  }

  test("chunking: stride windows, short tail, empty doc survives") {
    val seventy = (1 to 70).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, seventy), (2L, "short text"), (3L, ""))
      .toDF("doc_id", "text")
    val out = Chunking.chunk(df, chunkTokens = 32, overlap = 8)
    val byDoc = out.collect().groupBy(_.getAs[Long]("doc_id"))
    // 70 tokens, stride 24 -> starts 1, 25, 49
    assert(byDoc(1L).map(_.getAs[Int]("chunk_idx")).sorted.toSeq === Seq(0, 1, 2))
    assert(byDoc(1L).sortBy(_.getAs[Int]("chunk_idx"))
      .map(_.getAs[Int]("chunk_tokens")).toSeq === Seq(32, 32, 22))
    // overlap: chunk 1 starts at token 25
    val c1 = byDoc(1L).find(_.getAs[Int]("chunk_idx") == 1).get
    assert(c1.getAs[String]("chunk_text").startsWith("w25 w26"))
    assert(byDoc(2L).length === 1)
    assert(byDoc(2L).head.getAs[Int]("chunk_tokens") === 2)
    assert(byDoc(3L).length === 1)
    assert(byDoc(3L).head.getAs[Int]("chunk_tokens") === 0)
  }

  test("text topK: planted near-identical doc ranks #1") {
    val base = docs.limit(200)
    val q = base.filter($"doc_id" === base.select(min("doc_id")).first().getLong(0))
    val planted = q.withColumn("doc_id", $"doc_id" + 7000000L)
    val out = Similarity.textTopK(base.unionByName(planted), q, k = 5)
      .collect()
    assert(out.nonEmpty)
    val top = out.find(_.getAs[Int]("rank") == 1).get
    assert(top.getAs[Long]("neighbor_id") === q.first().getAs[Long]("doc_id") + 7000000L)
    assert(top.getAs[Double]("jaccard") === 1.0)
  }

  test("vocab and embedding stats: exact on hand data") {
    val df = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val vocab = df.select(explode(Repetition.tokens($"text")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    val e = Seq((1L, Array(1.0, 3.0)), (2L, Array(3.0, 5.0)))
      .toDF("vec_id", "embedding")
    val stats = e.select(posexplode($"embedding").as(Seq("dim", "v")))
      .groupBy("dim")
      .agg((sum($"v".cast("decimal(28,10)")).cast("double") / count($"v")).as("mean"),
        min($"v").as("vmin"), max($"v").as("vmax"))
      .collect().map(r => r.getAs[Int]("dim") -> r).toMap
    assert(stats(0).getAs[Double]("mean") === 2.0)
    assert(stats(1).getAs[Double]("mean") === 4.0)
    assert(stats(1).getAs[Double]("vmax") === 5.0)
  }

  test("semantic dedup drops planted copies, keeps originals") {
    val base = embs.limit(200)
      .withColumn("embedding", transform($"embedding", x => x.cast("double")))
    val planted = base.limit(10).withColumn("vec_id", $"vec_id" + 5000000L)
    val out = Dedup.semanticDedup(base.unionByName(planted),
      nlist = 8, threshold = 0.999)
    assert(out.filter($"vec_id" >= 5000000L).count() === 0)
    assert(out.count() === base.count())
  }

  test("nlist auto-scales with corpus size; auto semantic dedup still exact") {
    // a fixed nlist makes within-cluster pairs O(N²/nlist) — the auto
    // default must grow with N so per-cluster population stays ~√N
    assert(Similarity.autoNlist(100) === 16)          // clamp floor
    assert(Similarity.autoNlist(1000000) === 1000)    // √N
    assert(Similarity.autoNlist(4000000) === 2000)    // grows with N
    assert(Similarity.autoNlist(Long.MaxValue) === 65536) // clamp ceiling
    // end-to-end through the auto path (nlist unspecified): exact copies
    // still share a centroid and get dropped
    val base = embs.limit(120)
      .withColumn("embedding", transform($"embedding", x => x.cast("double")))
    val planted = base.limit(6).withColumn("vec_id", $"vec_id" + 6000000L)
    val out = Dedup.semanticDedup(base.unionByName(planted), threshold = 0.999)
    assert(out.filter($"vec_id" >= 6000000L).count() === 0)
    assert(out.count() === base.count())
  }

  test("gap-fill: silent days emit explicit zero rows inside each key's span") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 2.0),
      (1L, "2024-01-01 11:00:00", 3.0),
      (1L, "2024-01-04 09:00:00", 5.0), // Jan 2 + 3 silent
      (2L, "2024-02-10 00:00:00", 1.0)) // single-day span: one row
      .toDF("user_id", "s", "value")
      .withColumn("ts", to_timestamp($"s")).drop("s")
    val out = graft.pipeline.Resample.gapFillDaily(ev)
      .orderBy("user_id", "day").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, "2024-01-01", 2L, 5.0),
      (1L, "2024-01-02", 0L, 0.0),
      (1L, "2024-01-03", 0L, 0.0),
      (1L, "2024-01-04", 1L, 5.0),
      (2L, "2024-02-10", 1L, 1.0)))
  }
}
