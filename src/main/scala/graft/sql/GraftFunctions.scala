package graft.sql

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{HyperplaneSig, MinHashSig, SimHash60, WordGrams}
import graft.pipeline.{Dedup, Similarity, TextStats}

/** SQL registrations for the LLM-pipeline operators — installed by
  * [[GraftSparkExtensions]], so `SELECT graft_quality_score(text) FROM
  * docs` works anywhere the extension is active. The native expressions
  * (minhash / simhash / hyperplane signatures) register directly; the
  * Column-composed operators (text stats, cosine, jaccard) register
  * through the Column↔Expression bridge and resolve to the same codegen'd
  * built-in trees the DataFrame API produces. The reference has no SQL
  * scalar surface of its own (its extension only injects DML rules —
  * HoodieSparkSessionExtension.scala:29-44); this is part of the
  * training-data-pipeline layer our engine adds on top.
  */
object GraftFunctions {
  type FnDef = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case Literal(v: Short, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def fromColumns(name: String, arity: Int, doc: String)
      (f: Seq[Column] => Column): FnDef =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.sql.GraftFunctions", name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity argument(s), got ${args.length}")
        GraftSqlBridge.expressionOf(f(args.map(GraftSqlBridge.column)))
      })

  val all: Seq[FnDef] = Seq(
    // native signature expressions (variadic int config via literals)
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => MinHashSig(t, 64, 3)
        case Seq(t, n, s) => MinHashSig(t,
          intLit(n, "graft_minhash_sig", "numHashes"),
          intLit(s, "graft_minhash_sig", "shingleN"))
        case _ => throw new IllegalArgumentException(
          "graft_minhash_sig(text[, numHashes, shingleN])")
      }),
    (FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash60"),
      (args: Seq[Expression]) => args match {
        case Seq(h) => SimHash60(h)
        case _ => throw new IllegalArgumentException("graft_simhash60(tokenHashes)")
      }),
    (FunctionIdentifier("graft_word_grams"),
      new ExpressionInfo(classOf[WordGrams].getName, "graft_word_grams"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => WordGrams(t, 3)
        case Seq(t, n) => WordGrams(t, intLit(n, "graft_word_grams", "n"))
        case _ => throw new IllegalArgumentException("graft_word_grams(text[, n])")
      }),
    (FunctionIdentifier("graft_hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "graft_hyperplane_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(v) => HyperplaneSig(v, 16)
        case Seq(v, p) => HyperplaneSig(v, intLit(p, "graft_hyperplane_sig", "planes"))
        case _ => throw new IllegalArgumentException("graft_hyperplane_sig(vec[, planes])")
      }),

    // text analysis (Column-composed, resolve to codegen'd built-ins)
    fromColumns("graft_token_count", 1,
      "whitespace token count")(a => TextStats.tokenCount(a.head)),
    fromColumns("graft_token_count_bpe", 1,
      "BPE-ish subword count")(a => TextStats.bpeishTokenCount(a.head)),
    fromColumns("graft_quality_score", 1,
      "composite [0,1] quality heuristic")(a => TextStats.qualityScore(a.head)),
    fromColumns("graft_lang_id", 1,
      "stopword-profile language id")(a => TextStats.langId(a.head)),
    fromColumns("graft_fingerprint", 1,
      "64-bit normalized-text hash")(a => TextStats.fingerprint(a.head)),
    fromColumns("graft_fingerprint_hex", 1,
      "md5 hex of normalized text")(a => TextStats.fingerprintHex(a.head)),
    fromColumns("graft_fingerprint_nfkc", 1,
      "64-bit hash after NFKC + cleanup normalization (full-width/ligature " +
        "variants collide)")(a => TextStats.fingerprint(a.head, "NFKC")),
    fromColumns("graft_fingerprint_hex_nfkc", 1,
      "md5 hex after NFKC + cleanup normalization")(
      a => TextStats.fingerprintHex(a.head, "NFKC")),
    fromColumns("graft_simhash", 1,
      "60-bit simhash of text")(a => Dedup.simhash(a.head)),

    // similarity
    fromColumns("graft_cosine", 2,
      "cosine similarity of two numeric arrays")(a => Similarity.cosine(a(0), a(1))),
    fromColumns("graft_ngram_jaccard", 2,
      "exact 3-gram jaccard of two texts")(a => Dedup.ngramJaccard(a(0), a(1))),
    fromColumns("graft_hamming", 2,
      "hamming distance of two 64-bit hashes")(a => Dedup.hamming(a(0), a(1))),

    // deterministic sampling (portable md5 bucket in [0,10000) — membership
    // replays in any engine; `WHERE graft_hash_bucket(id) < 2500` is a
    // stable 25% sample)
    fromColumns("graft_hash_bucket", 1,
      "stable sampling bucket in [0,10000) from an id")(
      a => graft.pipeline.Sampling.hashBucket(a.head)),

    // repetition / quantization (round-7 operators)
    fromColumns("graft_rep_signals", 1,
      "Gopher repetition signal struct (uniq_word_ratio, top2/top3/dup5 fracs)")(
      a => graft.pipeline.Repetition.signals(a.head)),
    fromColumns("graft_quantize", 1,
      "int8 scalar quantization struct (lo, step, codes) of a numeric array")(
      a => Similarity.quantize(a.head)),
    fromColumns("graft_dequantize", 1,
      "reconstruct doubles from a graft_quantize struct")(
      a => Similarity.dequantize(a.head)),

    // web-corpus text/url ops (round-13 operators) — pure expression
    // chains, codegen'd like the rest
    fromColumns("graft_html_text", 1,
      "HTML to text: script/style/comment payloads drop, tags strip, entities decode")(
      a => graft.pipeline.Cleaning.htmlToText(a.head)),
    fromColumns("graft_dedup_lines", 1,
      "remove repeated lines within one text, keeping first occurrences in order")(
      a => graft.pipeline.Cleaning.dedupLinesWithin(a.head)),
    fromColumns("graft_url_host", 1,
      "lowercased hostname of a url (NULL on garbage)")(
      a => graft.pipeline.Urls.urlHost(a.head)),
    fromColumns("graft_url_domain", 1,
      "registrable domain of a url (multi-level-TLD aware heuristic)")(
      a => graft.pipeline.Urls.registrableDomain(a.head)),
    fromColumns("graft_url_canonical", 1,
      "canonical url for URL-level dedup (scheme/www/fragment/default-port " +
        "normalized, tracking params dropped, params sorted)")(
      a => graft.pipeline.Urls.canonicalUrl(a.head)),
    // round-14: PSL registrable domain — 1-arg bundled snapshot, 2-arg
    // custom rule-file path (string literal)
    (FunctionIdentifier("graft_url_domain_psl"),
      new ExpressionInfo(classOf[graft.functions.RegistrableDomainPsl].getName,
        "graft_url_domain_psl"),
      (args: Seq[Expression]) => args match {
        case Seq(u) => GraftSqlBridge.expressionOf(
          graft.pipeline.Urls.registrableDomainPsl(GraftSqlBridge.column(u)))
        case Seq(u, Literal(p: org.apache.spark.unsafe.types.UTF8String, _)) =>
          GraftSqlBridge.expressionOf(graft.pipeline.Urls.registrableDomainPsl(
            GraftSqlBridge.column(u), p.toString))
        case _ => throw new IllegalArgumentException(
          "graft_url_domain_psl(url[, rulesPath literal])")
      }),
    fromColumns("graft_text_normalize", 1,
      "unicode normalization: controls/zero-width drop, spaces/quotes/" +
        "dashes/ellipsis unify, space runs collapse (newlines kept)")(
      a => graft.pipeline.Cleaning.normalizeText(a.head)),
    // round-15: NFKC text fold, IDN/punycode host mapping, RFC 3986
    // percent normalization
    fromColumns("graft_text_nfkc", 1,
      "NFKC unicode fold (full-width/ligature/combining) + the " +
        "graft_text_normalize ASCII chain")(
      a => graft.pipeline.Cleaning.normalizeText(a.head, "NFKC")),
    fromColumns("graft_url_host_ascii", 1,
      "lowercased punycode/ASCII hostname of a url (IDN mapped via RFC 3490)")(
      a => graft.pipeline.Urls.urlHostAscii(a.head)),
    fromColumns("graft_percent_normalize", 1,
      "RFC 3986 §6.2.2 percent-encoding normalization: escape hex " +
        "uppercased, unreserved escapes decoded")(
      a => org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.PercentNormalize(
          org.apache.spark.sql.GraftSqlBridge.expressionOf(a.head)))),
    fromColumns("graft_script_profile", 1,
      "per-Unicode-script letter shares (n_letters + one fraction per " +
        "script: latin/cyrillic/arabic/han/...)")(
      a => graft.pipeline.TextStats.scriptProfile(a.head)),
    fromColumns("graft_dominant_script", 1,
      "dominant Unicode script of the text's letters ('und' below half share)")(
      a => graft.pipeline.TextStats.dominantScript(a.head)),
    fromColumns("graft_scrub_cc", 1,
      "redact Luhn-valid 13-19 digit card numbers (plain/spaced/dashed) with <CC>")(
      a => graft.pipeline.Cleaning.scrubCreditCards(a.head)),
    fromColumns("graft_scrub_pii_all", 1,
      "full PII redaction: emails, IPv4s, phones, then Luhn-valid card numbers")(
      a => graft.pipeline.Cleaning.scrubPiiAll(a.head)),

    // media hashes (round-12 operators): codec work can never codegen, so
    // a Scala UDF is the honest tier — same row-local cost as the
    // mapPartitions pipeline ops, NULL for undecodable bytes
    fromColumns("graft_phash", 1,
      "64-bit DCT perceptual hash of image bytes (NULL when undecodable)")(
      a => phashUdf(a.head)),
    fromColumns("graft_audio_fp", 1,
      "64-bit energy-contour fingerprint of PCM WAV bytes (NULL when undecodable)")(
      a => audioFpUdf(a.head)),
    fromColumns("graft_video_duration_ms", 1,
      "container duration in ms from ISO-BMFF bytes (NULL when not MP4)")(
      a => videoDurationUdf(a.head)),
    fromColumns("graft_video_frames", 1,
      "array of JPEG frame payloads demuxed from MJPEG-AVI bytes (NULL otherwise)")(
      a => videoFramesUdf(a.head)))

  private lazy val phashUdf = org.apache.spark.sql.functions.udf(
    (b: Array[Byte]) => if (b == null) None else graft.pipeline.ImageHash.phash64(b))
  private lazy val audioFpUdf = org.apache.spark.sql.functions.udf(
    (b: Array[Byte]) => if (b == null) None else graft.pipeline.AudioHash.fingerprint64(b))
  private lazy val videoDurationUdf = org.apache.spark.sql.functions.udf(
    (b: Array[Byte]) => if (b == null) None
      else graft.pipeline.Multimodal.VideoCodec.videoMeta(b).map(_._1))
  private lazy val videoFramesUdf = org.apache.spark.sql.functions.udf(
    (b: Array[Byte]) => if (b == null) None
      else graft.pipeline.Multimodal.VideoCodec.aviMjpegFrames(b).map(_._2))
}
