package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video ride along as opaque
  * `binary` columns with typed metadata structs; decode/feature steps are
  * iterator-to-iterator `mapPartitions` transforms over typed Datasets —
  * the Scala analog of `mapInPandas` batch UDFs (per-partition streaming,
  * constant memory, schema declared up front).
  *
  * Image decode is REAL for the formats the JDK ships readers for
  * (PNG/JPEG/GIF/BMP via javax.imageio — header-only reads, no pixel
  * decode): [[ImageCodec]] sniffs the magic bytes and reads
  * width/height/channels/format from the container. Bytes that are not a
  * recognized image (and the audio/video paths, which have no JDK codec)
  * fall back to the deterministic `FakeCodec` stub so synthetic-blob
  * pipelines stay replayable. The Spark-side plumbing — schemas, batch
  * iteration, partitioning, explode shapes — is what matters at 100 TB:
  * decode parallelism scales with partitions, and binary payloads never
  * pass through a shuffle unless the caller asks for one.
  */
object Multimodal {

  /** Hot-path JPEG codec plumbing: ImageIO's convenience entry points pay
    * a reader/writer SPI scan per CALL plus (by default) a temp-FILE-backed
    * stream cache per image — at corpus scale that dwarfs the actual
    * Huffman work on small frames. This helper pins memory-backed streams
    * (same JVM-global flip as ImageHash) and reuses one reader/writer per
    * thread. Readers/writers are not thread-safe → ThreadLocal; a decode
    * failure discards the instance (plugin state after an exception is
    * undefined) and the row just drops, as before.
    */
  private object Jpeg {
    javax.imageio.ImageIO.setUseCache(false)
    private val reader = new ThreadLocal[javax.imageio.ImageReader]()
    private val writer = new ThreadLocal[javax.imageio.ImageWriter]()

    def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      if (bytes == null || bytes.length < 2) return null // drop, never throw
      var r = reader.get()
      if (r == null) {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg")
        if (!it.hasNext) return null
        r = it.next(); reader.set(r)
      }
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try { r.setInput(iis, true, true); r.read(0) }
      catch { case scala.util.control.NonFatal(_) =>
        r.dispose(); reader.remove(); null
      } finally iis.close()
    }

    def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
      var w = writer.get()
      if (w == null) {
        w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
        writer.set(w)
      }
      val out = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      // a writer that threw mid-write is in an undefined plugin state —
      // discard it (mirrors the decode path) so later encodes start clean
      try { w.setOutput(ios); w.write(img) }
      catch { case e: Throwable => w.dispose(); writer.remove(); throw e }
      finally ios.close()
      out.toByteArray
    }
  }

  final case class ImageMeta(width: Int, height: Int, channels: Int, format: String)
  final case class DecodedImage(id: Long, meta: ImageMeta, byteLen: Long)
  final case class Frame(id: Long, frameIdx: Int, tsMillis: Long, frame: Array[Byte])
  final case class AudioFeatures(id: Long, sampleRate: Int, durationMs: Long,
      features: Array[Float])

  /** Real JDK image decode (javax.imageio). Header-only: width/height/
    * component count come from the reader's metadata path, so cost per
    * blob is a few hundred header bytes regardless of pixel count —
    * safe inside a 100 TB scan. Only bytes carrying a known container
    * magic are handed to ImageIO at all: the JDK's WBMP reader accepts
    * near-arbitrary bytes, which would make decode of synthetic blobs
    * nondeterministic across JDKs.
    */
  object ImageCodec {
    private def looksLikeImage(b: Array[Byte]): Boolean =
      b.length >= 8 && (
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
        (b(0) == 'B' && b(1) == 'M'))

    /** Full pixel decode → bilinear resample → PNG re-encode, for bytes
      * the JDK ships a reader for; None otherwise (caller falls back to
      * the stub). Row-local: cost ∝ pixel count of the one image, no
      * state across rows — safe in a mapPartitions over any partitioning.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
      if (!looksLikeImage(bytes)) return None
      try {
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (src == null) return None
        val dst = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", out)
        Some(out.toByteArray)
      } catch { case _: java.io.IOException => None }
    }

    /** Some(meta) for real PNG/JPEG/GIF/BMP bytes; None otherwise. */
    def imageMeta(bytes: Array[Byte]): Option[ImageMeta] = {
      if (!looksLikeImage(bytes)) return None
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            val w = r.getWidth(0)
            val h = r.getHeight(0)
            val types = r.getImageTypes(0)
            val channels =
              if (types.hasNext) types.next().getNumComponents else 3
            Some(ImageMeta(w, h, channels, r.getFormatName.toLowerCase))
          } finally r.dispose()
        }
      } catch { case _: java.io.IOException => None }
      finally if (iis != null) iis.close()
    }
  }

  /** STUB decode for blobs with no JDK codec (audio/video; non-image
    * binary). Deterministic so tests are stable.
    */
  object FakeCodec {
    def imageMeta(bytes: Array[Byte]): ImageMeta = {
      // 56-bit unsigned big-endian of the first 7 bytes: positive, and
      // portable — any engine can recompute it from the hex of the bytes
      var h = 0L
      bytes.take(7).foreach(b => h = (h << 8) | (b & 0xffL))
      ImageMeta(
        width = 64 + (h % 1024).toInt,
        height = 64 + ((h / 7) % 1024).toInt,
        channels = 3,
        format = if (h % 2 == 0) "jpeg" else "png")
    }
    def frames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val step = math.max(1, bytes.length / math.max(n, 1))
      (0 until n).map(i => bytes.slice(i * step, math.min((i + 1) * step, bytes.length)))
    }
    def mfcc(bytes: Array[Byte], coeffs: Int): Array[Float] = {
      val h = java.util.Arrays.hashCode(bytes)
      Array.tabulate(coeffs)(i => ((h * (i + 1)) % 1000) / 1000.0f)
    }
  }

  /** Synthesize a binary content column from any seed column —
    * deterministic stand-in for reading blobs off object storage.
    */
  def withFakeBinary(df: DataFrame, seedCol: String, sizeBytes: Int = 256,
      out: String = "content"): DataFrame =
    df.withColumn(out,
      // repeat a hash-derived hex string and cut to size: cheap, codegen'd
      unhex(substring(repeat(md5(col(seedCol).cast("string")), sizeBytes / 8), 1, sizeBytes * 2)))

  /** Decode image metadata: batched per-partition pass over (id, bytes).
    * Output schema is declared via the case-class encoder. Real
    * PNG/JPEG/GIF/BMP bytes decode through [[ImageCodec]] (javax.imageio,
    * header-only); anything else gets the deterministic stub metadata.
    */
  def decodeImages(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "content"): Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // iterator-to-iterator: the whole partition streams through the
        // codec in one batch pipeline, never materialized
        it.map { case (id, bytes) =>
          val meta = ImageCodec.imageMeta(bytes)
            .getOrElse(FakeCodec.imageMeta(bytes))
          DecodedImage(id, meta, bytes.length.toLong)
        }
      }
  }

  /** Image resize: real pixel resample + PNG re-encode through
    * javax.imageio for decodable bytes ([[ImageCodec.resize]]); synthetic
    * blobs keep the deterministic truncation stub so oracle runs stay
    * replayable. Same iterator-to-iterator batch shape either way.
    */
  def resizeImages(df: DataFrame, w: Int, h: Int, idCol: String = "doc_id",
      binCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val resized = ImageCodec.resize(bytes, w, h)
            .getOrElse(bytes.take(math.max(16, bytes.length / 4))) // stub resample
          (id, resized, w, h)
        }
      }.toDF(idCol, "content_resized", "width", "height")
  }

  /** Frame sampling for video blobs: one input row explodes to n frame
    * rows with timestamps — the shape a caption/embedding stage consumes.
    * MJPEG-in-AVI bytes yield REAL frames (the container's own JPEG
    * chunks, evenly sampled, timestamped from the AVI frame rate —
    * [[VideoCodec.aviMjpegFrames]]); other bytes keep the deterministic
    * stub (no JDK codec for inter-frame formats).
    */
  def sampleFrames(df: DataFrame, n: Int, frameIntervalMs: Long = 1000L,
      idCol: String = "doc_id", binCol: String = "content"): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        VideoCodec.aviMjpegFrames(bytes) match {
          case Some((uspf, jpegs)) =>
            val picks =
              if (jpegs.length <= n) jpegs.indices
              else (0 until n).map(i => i * jpegs.length / n)
            // frameIdx is always the DENSE output index 0..k-1 (matching
            // the stub path and the non-sampled case), so consumers key
            // consistently whether or not sampling kicked in; the
            // CONTAINER frame number survives only inside the timestamp
            picks.zipWithIndex.map { case (src, out) =>
              Frame(id, out, src * uspf / 1000L, jpegs(src))
            }
          case None =>
            FakeCodec.frames(bytes, n).zipWithIndex.map { case (fb, i) =>
              Frame(id, i, i * frameIntervalMs, fb)
            }
        }
      }
  }

  final case class DecodedFrame(id: Long, frameIdx: Int, tsMillis: Long,
      width: Int, height: Int)

  /** REAL video frame decode for MJPEG-AVI blobs: RIFF walk → `movi`
    * JPEG chunks → ImageIO decode, one row per frame with its container
    * timestamp and decoded dimensions. Rows whose bytes are not
    * MJPEG-AVI (or whose frames don't decode) are dropped — callers keep
    * them via [[sampleFrames]]' stub path instead. Iterator-to-iterator,
    * cost ∝ pixels of the one blob.
    */
  def videoFrames(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "content"): Dataset[DecodedFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        VideoCodec.aviMjpegFrames(bytes).toSeq.flatMap { case (uspf, jpegs) =>
          jpegs.zipWithIndex.flatMap { case (jb, i) =>
            val img = Jpeg.decode(jb) // cached per-thread reader, memory streams
            if (img == null) None
            else Some(DecodedFrame(id, i, i * uspf / 1000L,
              img.getWidth, img.getHeight))
          }
        }
      }
  }

  /** Real JDK audio decode (javax.sound.sampled): RIFF/WAVE PCM bytes →
    * mono samples in [-1, 1]. PCM decode is exact integer arithmetic, so
    * features derived from it are bit-deterministic across JVMs — unlike
    * lossy codecs, which is why only PCM containers take this path.
    */
  object AudioCodec {
    import javax.sound.sampled.{AudioFormat, AudioSystem}

    private def looksLikeWav(b: Array[Byte]): Boolean =
      b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    /** (sampleRate, mono samples) for PCM WAV bytes; None otherwise.
      * Supports the two layouts real WAV files use: 16-bit signed
      * (little- or big-endian) and 8-bit unsigned. Row-local cost
      * ∝ the one blob — safe inside a full-corpus mapPartitions.
      *
      * Canonical little-endian PCM (format tag 1, the overwhelming
      * majority of real WAV files) decodes through a direct RIFF chunk
      * walk — javax.sound's per-call SPI lookup + stream plumbing costs
      * ~10-15 ms per clip, which at corpus scale dominates the actual
      * sample math by an order of magnitude. Anything non-canonical
      * (extensible fmt, odd chunk layout, big-endian AIFF-style data)
      * falls back to javax.sound, so coverage is unchanged and both
      * paths produce bit-identical samples (exact integer arithmetic).
      */
    def decode(bytes: Array[Byte]): Option[(Int, Array[Double])] =
      decodeRiffPcm(bytes).orElse(decodeViaJavaSound(bytes))

    private def decodeRiffPcm(b: Array[Byte]): Option[(Int, Array[Double])] = {
      if (!looksLikeWav(b) || b.length < 44) return None
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var off = 12
      var fmtTag, channels, sampleRate, bits = -1
      var dataStart, dataLen = -1
      while (off + 8 <= b.length && (fmtTag < 0 || dataStart < 0)) {
        val id = new String(b, off, 4, "US-ASCII")
        val sz = bb.getInt(off + 4)
        if (sz < 0 || off + 8 + sz > b.length) return None // malformed → SPI path
        id match {
          case "fmt " if sz >= 16 =>
            fmtTag = bb.getShort(off + 8) & 0xFFFF
            channels = bb.getShort(off + 10) & 0xFFFF
            sampleRate = bb.getInt(off + 12)
            bits = bb.getShort(off + 22) & 0xFFFF
          case "data" => dataStart = off + 8; dataLen = sz
          case _ => // LIST/fact/cue … skipped
        }
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      if (fmtTag != 1 || dataStart < 0 || channels < 1 || sampleRate <= 0 ||
          (bits != 8 && bits != 16)) return None
      val bps = bits / 8
      val n = dataLen / (bps * channels)
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        var acc = 0.0
        var c = 0
        while (c < channels) {
          val o = dataStart + (i * channels + c) * bps
          acc += (if (bits == 8) ((b(o) & 0xff) - 128) / 128.0
            else (((b(o + 1) << 8) | (b(o) & 0xff)).toShort / 32768.0))
          c += 1
        }
        out(i) = acc / channels
        i += 1
      }
      Some((sampleRate, out))
    }

    private[graft] def decodeViaJavaSound(bytes: Array[Byte]): Option[(Int, Array[Double])] = {
      if (!looksLikeWav(bytes)) return None
      try {
        val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val bits = fmt.getSampleSizeInBits
          val ch = fmt.getChannels
          val ok = (fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED && bits == 16) ||
            (fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
          if (!ok || ch < 1) return None
          val raw = in.readAllBytes()
          val bps = bits / 8
          val n = raw.length / (bps * ch)
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val off = (i * ch + c) * bps
              acc += (if (bits == 8) ((raw(off) & 0xff) - 128) / 128.0
                else {
                  val lo = raw(off + (if (fmt.isBigEndian) 1 else 0)) & 0xff
                  val hi = raw(off + (if (fmt.isBigEndian) 0 else 1))
                  ((hi << 8) | lo).toShort / 32768.0
                })
              c += 1
            }
            out(i) = acc / ch
            i += 1
          }
          Some((fmt.getSampleRate.toInt, out))
        } finally in.close()
      } catch { case _: Exception => None }
    }

    /** Fixed-length energy envelope: RMS of `bands` equal time windows —
      * the deterministic real-signal analog of an MFCC front end (no FFT
      * dependency in this container).
      */
    def bandEnergies(samples: Array[Double], bands: Int): Array[Float] =
      Array.tabulate(bands) { b =>
        val lo = (samples.length.toLong * b / bands).toInt
        val hi = (samples.length.toLong * (b + 1) / bands).toInt
        if (hi <= lo) 0f
        else {
          var s = 0.0
          var i = lo
          while (i < hi) { s += samples(i) * samples(i); i += 1 }
          math.sqrt(s / (hi - lo)).toFloat
        }
      }
  }

  /** Audio feature extraction: REAL decode + per-window RMS energies for
    * PCM WAV blobs ([[AudioCodec]]); synthetic/non-WAV blobs keep the
    * deterministic stub vector so oracle runs stay replayable. Same
    * iterator-to-iterator batch shape either way.
    */
  def audioFeatures(df: DataFrame, coeffs: Int = 13, idCol: String = "doc_id",
      binCol: String = "content"): Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          AudioCodec.decode(bytes) match {
            case Some((sr, samples)) =>
              AudioFeatures(id, sr, samples.length * 1000L / math.max(sr, 1),
                AudioCodec.bandEnergies(samples, coeffs))
            case None =>
              AudioFeatures(id, 16000, bytes.length * 10L, FakeCodec.mfcc(bytes, coeffs))
          }
        }
      }
  }

  final case class VideoMeta(id: Long, durationMs: Long, width: Int,
      height: Int, videoTracks: Int, brand: String)

  /** Real ISO-BMFF (MP4/MOV) CONTAINER parsing — duration, dimensions,
    * track count straight from the `moov` box tree (`mvhd` timescale +
    * duration, `tkhd` 16.16-fixed width/height). Pure byte walking, no
    * codec: this is the metadata half of video handling (what a catalog/
    * filter stage needs — "drop clips under 2 s", "bucket by resolution").
    * PIXELS are real for ONE honest format: MJPEG-in-AVI, whose frames
    * are standalone JPEGs the JDK can decode ([[aviMjpegFrames]]); every
    * inter-frame codec (no JDK decoder, zero-egress) keeps the
    * deterministic stub in [[Multimodal.sampleFrames]].
    */
  object VideoCodec {
    private def looksLikeMp4(b: Array[Byte]): Boolean =
      b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

    private def looksLikeAvi(b: Array[Byte]): Boolean =
      b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

    /** MJPEG-in-AVI frame extraction: (microSecPerFrame, JPEG frame
      * chunks) for AVI bytes whose `movi` list carries JPEG-compressed
      * frames, None otherwise. AVI is a RIFF container (the same chunk
      * grammar as WAV — id, LE size, word-aligned payload): the `hdrl`
      * LIST's `avih` chunk leads with the frame interval in µs, the
      * `movi` LIST holds one `##dc`/`##db` chunk per frame whose payload
      * for MJPEG IS a standalone JPEG — so "decoding" the video is a byte
      * walk plus the JDK's own JPEG codec, no inter-frame state. This is
      * the one honest zero-dependency path to real pixels; non-MJPEG
      * codecs stay stubbed.
      */
    def aviMjpegFrames(b: Array[Byte]): Option[(Long, IndexedSeq[Array[Byte]])] = {
      if (!looksLikeAvi(b)) return None
      try {
        val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var uspf = 0L
        val frames = IndexedSeq.newBuilder[Array[Byte]]
        def walk(start: Int, end: Int): Unit = {
          var off = start
          while (off + 8 <= end) {
            val id = new String(b, off, 4, "US-ASCII")
            val sz = bb.getInt(off + 4)
            if (sz < 0 || off + 8 + sz > end) return // truncated → stop clean
            id match {
              case "LIST" if sz >= 4 =>
                val listType = new String(b, off + 8, 4, "US-ASCII")
                // descend only where our reads live; other lists (strl,
                // odml …) are skipped whole, keeping the walk O(frames)
                if (listType == "hdrl" || listType == "movi" || listType == "rec ")
                  walk(off + 12, off + 8 + sz)
              case "avih" if sz >= 4 => uspf = bb.getInt(off + 8).toLong & 0xFFFFFFFFL
              case _ if id.length == 4 && id(0).isDigit && id(1).isDigit &&
                  (id.endsWith("dc") || id.endsWith("db")) && sz >= 3 &&
                  b(off + 8) == 0xFF.toByte && b(off + 9) == 0xD8.toByte &&
                  b(off + 10) == 0xFF.toByte => // a JPEG frame chunk
                frames += java.util.Arrays.copyOfRange(b, off + 8, off + 8 + sz)
              case _ => // idx1 / strh / strf / junk … skipped
            }
            off += 8 + sz + (sz & 1) // word alignment, as in WAV
          }
        }
        walk(12, b.length)
        val fs = frames.result()
        if (fs.isEmpty) None else Some((if (uspf > 0) uspf else 40000L, fs))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Some(meta-less tuple) for ISO-BMFF bytes; None otherwise. */
    def videoMeta(bytes: Array[Byte]): Option[(Long, Int, Int, Int, String)] = {
      if (!looksLikeMp4(bytes)) return None
      try {
        val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
        val brand = new String(bytes, 8, 4, "US-ASCII").trim
        var timescale = 0L
        var duration = 0L
        var width = 0
        var height = 0
        var tracks = 0
        // depth-first walk; descend only into the container boxes that
        // can hold what we read (moov/trak/mdia pathing keeps the walk
        // O(header bytes) even on a multi-GB clip — callers should pass
        // the leading bytes, not the whole blob)
        def walk(start: Int, end: Int): Unit = {
          var off = start
          while (off + 8 <= end) {
            val size0 = bb.getInt(off).toLong & 0xFFFFFFFFL
            val typ = new String(bytes, off + 4, 4, "US-ASCII")
            val (payload, size) =
              if (size0 == 1 && off + 16 <= end) (off + 16, bb.getLong(off + 8))
              else (off + 8, size0)
            if (size < 8 || off + size > end) return // truncated/garbage box
            typ match {
              case "moov" | "trak" => walk(payload, off + size.toInt)
              case "mvhd" if payload + 4 <= end =>
                val version = bytes(payload) & 0xFF
                if (version == 1 && payload + 32 <= end) {
                  timescale = bb.getInt(payload + 20).toLong & 0xFFFFFFFFL
                  duration = bb.getLong(payload + 24)
                } else if (payload + 24 <= end) {
                  timescale = bb.getInt(payload + 12).toLong & 0xFFFFFFFFL
                  duration = bb.getInt(payload + 16).toLong & 0xFFFFFFFFL
                }
              case "tkhd" =>
                // width/height are the LAST 8 payload bytes (16.16 fixed)
                // in both box versions
                val tail = off + size.toInt
                if (tail - 8 >= payload + 4) {
                  val w = bb.getInt(tail - 8) >>> 16
                  val h = bb.getInt(tail - 4) >>> 16
                  if (w > 0 && h > 0) { // video track (audio tracks are 0×0)
                    tracks += 1
                    if (width == 0) { width = w; height = h }
                  }
                }
              case _ => // leaf we don't read; skip
            }
            off += size.toInt
          }
        }
        walk(0, bytes.length)
        if (timescale <= 0) None
        else Some((duration * 1000L / timescale, width, height, tracks, brand))
      } catch { case _: Exception => None }
    }
  }

  /** Video container metadata: REAL for ISO-BMFF bytes ([[VideoCodec]]),
    * deterministic stub otherwise (same fake-metadata convention as the
    * image/audio paths). Iterator-to-iterator, header-bytes cost per row.
    */
  def videoMeta(df: DataFrame, idCol: String = "doc_id",
      binCol: String = "content"): Dataset[VideoMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          VideoCodec.videoMeta(bytes) match {
            case Some((durMs, w, h, tracks, brand)) =>
              VideoMeta(id, durMs, w, h, tracks, brand)
            case None =>
              val m = FakeCodec.imageMeta(bytes)
              VideoMeta(id, bytes.length * 40L, m.width, m.height, 1, "fake")
          }
        }
      }
  }

  /** A minimal VALID one-video-track MP4 (ftyp + moov{mvhd, trak{tkhd}})
    * for specs/gates: real box structure, parseable by any ISO-BMFF
    * reader. Duration in mvhd units of `timescale`; width/height land in
    * tkhd as 16.16 fixed point.
    */
  def syntheticMp4(durationMs: Long, width: Int, height: Int,
      timescale: Long = 1000L): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(8)
      .put("isom".getBytes("US-ASCII")).putInt(0x200).array())
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100).order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(0) // version 0 + flags
      b.putInt(0).putInt(0) // ctime, mtime
      b.putInt(timescale.toInt)
      b.putInt((durationMs * timescale / 1000L).toInt)
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, rsvd
      b.putInt(0).putInt(0) // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt) // identity matrix
      (1 to 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(2) // next_track_id
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84).order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(7) // version 0 + flags (enabled|in movie|in preview)
      b.putInt(0).putInt(0) // ctime, mtime
      b.putInt(1).putInt(0) // track id, reserved
      b.putInt((durationMs * timescale / 1000L).toInt)
      b.putInt(0).putInt(0) // reserved
      b.putShort(0).putShort(0).putShort(0).putShort(0) // layer, group, volume, rsvd
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt)
      b.putInt(width << 16).putInt(height << 16) // 16.16 fixed
      box("tkhd", b.array())
    }
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ moov
  }

  /** A minimal VALID MJPEG-in-AVI clip for specs/gates: real RIFF
    * structure (`hdrl`/`avih` with the frame rate, `movi` with one
    * `00dc` JPEG chunk per frame), readable by any AVI demuxer. The
    * frames are the caller's JPEG bytes verbatim.
    */
  def syntheticMjpegAvi(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
      microSecPerFrame: Long = 40000L): Array[Byte] = {
    def le(i: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le(payload.length) ++ payload ++ pad
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      "LIST".getBytes("US-ASCII") ++ le(4 + body.length) ++
        listType.getBytes("US-ASCII") ++ body
    val avih = {
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(microSecPerFrame.toInt)
      b.putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, flags
      b.putInt(jpegFrames.length) // totalFrames
      b.putInt(0).putInt(1) // initialFrames, streams
      b.putInt(jpegFrames.map(_.length).maxOption.getOrElse(0)) // bufferSize
      b.putInt(width).putInt(height)
      // 4 reserved ints remain zero
      chunk("avih", b.array())
    }
    val movi = list("movi", jpegFrames.map(chunk("00dc", _)).fold(Array.empty[Byte])(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ list("hdrl", avih) ++ movi
    "RIFF".getBytes("US-ASCII") ++ le(body.length) ++ body
  }

  /** One deterministic JPEG frame for (seed, frameIdx): a seeded noise
    * field (JPEG-encodes to visibly distinct frames per seed) — real
    * ImageIO JPEG bytes for the MJPEG-AVI builder.
    */
  def syntheticJpegFrame(seed: Long, frameIdx: Int, size: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(size, size,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new java.util.Random(seed * 7919L + frameIdx)
    // direct fill of the gray raster's backing byte array: index y*size+x
    // visits pixels in the same (y, x) order as the setSample loop it
    // replaces, so the Random sequence — and the image — are unchanged,
    // without a per-pixel SampleModel round trip
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var i = 0
    while (i < data.length) { data(i) = rnd.nextInt(256).toByte; i += 1 }
    Jpeg.encode(img) // cached per-thread writer, memory-backed stream
  }
}
