package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Similarity, TextStats}

/** SQL registrations of the pipeline operators (GraftFunctions): each
  * SQL invocation must agree with its DataFrame-API twin.
  */
class SqlFunctionsSpec extends AnyFunSuite {
  import SparkTestBase._
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the bank"),
    (3L, "numbers 123 456 789 0 and punctuation !!! ??? ..."),
    (4L, "der hund ist nicht mit der katze und das haus"))
    .toDF("id", "text")

  test("native signature functions: sql == dataframe") {
    docs.createOrReplaceTempView("fdocs")
    val viaSql = spark.sql(
      """SELECT id, graft_minhash_sig(text) AS mh, graft_minhash_sig(text, 16, 2) AS mh16,
        |graft_simhash(text) AS sh FROM fdocs""".stripMargin)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2), r.getLong(3)))).toMap
    val viaDf = docs.select(col("id"),
        graft.functions.MinHashSig.minhashSig(col("text")).as("mh"),
        graft.functions.MinHashSig.minhashSig(col("text"), 16, 2).as("mh16"),
        Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2), r.getLong(3)))).toMap
    assert(viaSql === viaDf)
    // identical docs agree, distinct docs do not
    val bySig = spark.sql("SELECT graft_minhash_sig(text) AS s FROM fdocs")
      .collect().map(_.getSeq[Long](0))
    assert(bySig(0) === bySig(1))
    assert(bySig(0) !== bySig(2))
  }

  test("text-stat functions: sql == dataframe") {
    docs.createOrReplaceTempView("fdocs2")
    val viaSql = spark.sql(
      """SELECT id, graft_token_count(text) AS tc, graft_quality_score(text) AS q,
        |graft_lang_id(text) AS lang, graft_fingerprint_hex(text) AS fp
        |FROM fdocs2 ORDER BY id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3), r.getString(4)))
    val viaDf = docs.select(col("id"),
        TextStats.tokenCount(col("text")).as("tc"),
        TextStats.qualityScore(col("text")).as("q"),
        TextStats.langId(col("text")).as("lang"),
        TextStats.fingerprintHex(col("text")).as("fp"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3), r.getString(4)))
    assert(viaSql === viaDf)
    assert(viaSql.find(_._1 == 4L).get._4 === "de")
    assert(viaSql.find(_._1 == 1L).get._4 === "en")
  }

  test("NFKC fingerprint functions: variants collide only under NFKC") {
    Seq((1L, "the final fix"), (2L, "the ﬁnal ﬁx"),
      (3L, "ｔｈｅ ｆｉｎａｌ ｆｉｘ"))
      .toDF("id", "text").createOrReplaceTempView("fnfkc")
    val plain = spark.sql(
      "SELECT count(DISTINCT graft_fingerprint(text)), " +
        "count(DISTINCT graft_fingerprint_nfkc(text)), " +
        "count(DISTINCT graft_fingerprint_hex_nfkc(text)) FROM fnfkc").first()
    assert(plain.getLong(0) === 3L) // default: all distinct
    assert(plain.getLong(1) === 1L) // NFKC: one group
    assert(plain.getLong(2) === 1L)
    // sql == dataframe
    val viaSql = spark.sql(
      "SELECT id, graft_fingerprint_nfkc(text) AS f FROM fnfkc ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaDf = spark.table("fnfkc").select(col("id"),
        TextStats.fingerprint(col("text"), "NFKC").as("f"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql === viaDf)
  }

  test("similarity functions") {
    val vecs = Seq(
      (1L, Array(1.0, 0.0, 0.0), Array(1.0, 0.0, 0.0)),
      (2L, Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)))
      .toDF("id", "a", "b")
    vecs.createOrReplaceTempView("fvecs")
    val got = spark.sql(
      "SELECT id, graft_cosine(a, b) AS c, graft_hyperplane_sig(a) AS hs FROM fvecs ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(math.abs(got(0)._2 - 1.0) < 1e-12)
    assert(math.abs(got(1)._2) < 1e-12)
    // hyperplane sig from SQL matches the DataFrame expression
    val sqlSig = spark.sql("SELECT graft_hyperplane_sig(a, 8) FROM fvecs WHERE id = 1")
      .first().getLong(0)
    val dfSig = vecs.filter($"id" === 1)
      .select(Similarity.hyperplaneSignature(col("a"), 8)).first().getLong(0)
    assert(sqlSig === dfSig)

    val j = spark.sql(
      """SELECT graft_ngram_jaccard('a b c d', 'a b c d') AS same,
        |graft_ngram_jaccard('a b c d', 'x y z w') AS diff,
        |graft_hamming(7, 1) AS h""".stripMargin).first()
    assert(j.getDouble(0) === 1.0)
    assert(j.getDouble(1) === 0.0)
    assert(j.getInt(2) === 2)
  }

  test("graft_word_grams: sql == dataframe shingles") {
    docs.createOrReplaceTempView("fdocs")
    val viaSql = spark.sql("SELECT id, graft_word_grams(text, 3) AS g FROM fdocs")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val viaDf = docs.select(col("id"), Dedup.shingles(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(viaSql === viaDf)
    assert(viaSql(1L).contains("the quick brown"))
  }

  test("graft_hash_bucket: sql == dataframe, usable as sampling predicate") {
    docs.createOrReplaceTempView("fdocs")
    val viaSql = spark.sql("SELECT id, graft_hash_bucket(id) AS b FROM fdocs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDf = docs.select(col("id"),
        graft.pipeline.Sampling.hashBucket(col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql === viaDf)
    assert(viaSql.values.forall(b => b >= 0 && b < 10000))
    // predicate form selects the same rows as Sampling.sample
    val viaPred = spark.sql("SELECT id FROM fdocs WHERE graft_hash_bucket(id) < 5000")
      .collect().map(_.getLong(0)).toSet
    val viaOp = graft.pipeline.Sampling.sample(docs, "id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaPred === viaOp)
  }

  test("graft_rep_signals / graft_quantize / graft_dequantize: sql == dataframe") {
    docs.createOrReplaceTempView("fdocs")
    val viaSql = spark.sql(
      "SELECT id, graft_rep_signals(text).top2_frac AS t2 FROM fdocs")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaDf = docs.select(col("id"),
        graft.pipeline.Repetition.signals(col("text")).getField("top2_frac").as("t2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql === viaDf)
    val vecs = Seq((1L, Array(0.1, 0.9, 0.5)), (2L, Array(-1.0, 0.0, 1.0)))
      .toDF("id", "v")
    vecs.createOrReplaceTempView("fvecs")
    val qSql = spark.sql(
      """SELECT id, graft_quantize(v).codes AS codes,
        |graft_dequantize(graft_quantize(v)) AS back FROM fvecs""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getSeq[Double](2))).toList
    val qDf = vecs.select(col("id"),
        Similarity.quantize(col("v")).getField("codes").as("codes"),
        Similarity.dequantize(Similarity.quantize(col("v"))).as("back"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getSeq[Double](2))).toList
    assert(qSql === qDf)
  }

  test("media hash functions: real bytes hash, garbage is NULL") {
    import graft.pipeline.{AudioHash, ImageHash, Multimodal}
    val rows = Seq(
      (1L, ImageHash.syntheticPng(5L, 16), AudioHash.syntheticWav(5L, 12),
        Multimodal.syntheticMp4(4500, 640, 360)),
      (2L, "nope".getBytes, "nope".getBytes, "nope".getBytes))
      .toDF("id", "img", "wav", "mp4")
    rows.createOrReplaceTempView("fmedia")
    val got = spark.sql("""
      SELECT id, graft_phash(img) AS p, graft_audio_fp(wav) AS a,
             graft_video_duration_ms(mp4) AS v FROM fmedia""")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(1L)._1.contains(ImageHash.phash64(ImageHash.syntheticPng(5L, 16)).get))
    assert(got(1L)._2.contains(AudioHash.fingerprint64(AudioHash.syntheticWav(5L, 12)).get))
    assert(got(1L)._3.contains(4500L))
    assert(got(2L) === ((None, None, None)))
  }

  test("web text/url functions: sql == dataframe") {
    val rows = Seq(
      (1L, "<p>Hello &amp; bye</p><script>x</script>", "a\nb\na",
        "https://user@Sub.example.co.uk:8080/p"),
      (2L, "plain", "solo", "junk"))
      .toDF("id", "html", "txt", "url")
    rows.createOrReplaceTempView("fweb")
    val sql = spark.sql("""
      SELECT id, graft_html_text(html) AS h, graft_dedup_lines(txt) AS l,
             graft_url_host(url) AS uh, graft_url_domain(url) AS ud
      FROM fweb ORDER BY id""").collect()
    import org.apache.spark.sql.functions.col
    val df = rows.select(col("id"),
        graft.pipeline.Cleaning.htmlToText(col("html")),
        graft.pipeline.Cleaning.dedupLinesWithin(col("txt")),
        graft.pipeline.Urls.urlHost(col("url")),
        graft.pipeline.Urls.registrableDomain(col("url")))
      .orderBy("id").collect()
    assert(sql.map(_.toSeq).toSeq === df.map(_.toSeq).toSeq)
    assert(sql(0).getString(1) === "Hello & bye")
    assert(sql(0).getString(3) === "sub.example.co.uk" &&
      sql(0).getString(4) === "example.co.uk")
    assert(sql(1).isNullAt(3))
  }

  test("round-14 functions: canonical url, PSL domain (incl. custom path), normalize") {
    val f = java.nio.file.Files.createTempFile("psl_sqlfn", ".dat")
    java.nio.file.Files.writeString(f, "my.zone\n")
    Seq((1L, "http://www.X.com:80/a/?utm_source=t&b=2&a=1#f",
        "https://blog.alpha.github.io/p", "“q” — ok…"),
      (2L, "https://x.com:8080/a", "https://a.b.my.zone/p", "plain"))
      .toDF("id", "url", "url2", "txt").createOrReplaceTempView("f14")
    val got = spark.sql(s"""
      SELECT id, graft_url_canonical(url) AS c,
             graft_url_domain_psl(url2) AS d,
             graft_url_domain_psl(url2, '${f.toString}') AS dc,
             graft_text_normalize(txt) AS n
      FROM f14 ORDER BY id""").collect()
    assert(got(0).getString(1) === "x.com/a?a=1&b=2")
    assert(got(1).getString(1) === "x.com:8080/a") // non-default port survives
    assert(got(0).getString(2) === "alpha.github.io") // bundled PSL
    assert(got(1).getString(3) === "b.my.zone") // custom rule file
    assert(got(0).getString(4) === "\"q\" - ok...")
  }

  test("round-15 functions: NFKC fold, IDN host, percent normalization") {
    Seq((1L, "https://bücher.example/x", "Ｇｒａｆｔ ﬁle", "p%41th%7e/x%2fy"),
      (2L, "https://xn--bcher-kva.example/y", "plain ascii.", "no escapes"))
      .toDF("id", "url", "txt", "pct").createOrReplaceTempView("f15")
    val got = spark.sql("""
      SELECT id, graft_url_host_ascii(url) AS h,
             graft_text_nfkc(txt) AS n,
             graft_percent_normalize(pct) AS p
      FROM f15 ORDER BY id""").collect()
    // both IDN spellings map to one punycode key
    assert(got(0).getString(1) === "xn--bcher-kva.example")
    assert(got(1).getString(1) === "xn--bcher-kva.example")
    assert(got(0).getString(2) === "Graft file")
    assert(got(1).getString(2) === "plain ascii.")
    assert(got(0).getString(3) === "pAth~/x%2Fy")
    assert(got(1).getString(3) === "no escapes")
    // parity with the column API
    import org.apache.spark.sql.functions.col
    val viaCols = spark.table("f15")
      .select(graft.pipeline.Urls.urlHostAscii(col("url"))).collect()
      .map(_.getString(0)).toSet
    assert(viaCols === Set("xn--bcher-kva.example"))
  }

  test("graft_video_frames demuxes MJPEG-AVI in SQL; non-AVI is NULL") {
    import graft.pipeline.Multimodal
    val jpegs = (0 until 3).map(i => Multimodal.syntheticJpegFrame(9L, i, 48))
    Seq((1L, Multimodal.syntheticMjpegAvi(jpegs, 48, 48)),
        (2L, "nope".getBytes))
      .toDF("id", "avi").createOrReplaceTempView("favi")
    val got = spark.sql(
      "SELECT id, graft_video_frames(avi) AS fs FROM favi ORDER BY id").collect()
    val fs = got(0).getSeq[Array[Byte]](1)
    assert(fs.length === 3 && fs(1).sameElements(jpegs(1)))
    assert(got(1).isNullAt(1))
  }
}
