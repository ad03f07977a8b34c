package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque BINARY columns
 * with typed metadata, plus a batched decode/feature-extract stage.
 *
 * The Spark-side shape is real and tested — schema, partitioning, batch
 * iteration via `mapPartitions` (the Scala analogue of `mapInPandas`:
 * one iterator per partition, decode amortized across the batch).
 *
 * IMAGES are decoded for real: `decodeImage` runs the in-JDK
 * `javax.imageio` PNG/BMP codec and features come from actual decoded
 * pixels. AUDIO is decoded for real too: `decodeWav` runs the in-JDK
 * `javax.sound.sampled` WAV/PCM codec. Only VIDEO decode remains
 * STUBBED (`stubDecode`) — no video demuxer ships in the JDK; swapping
 * one in is a one-function change and nothing in the plan changes.
 *
 * Scale notes: binary payloads ride the normal columnar path (parquet
 * BINARY), decode is embarrassingly parallel per partition, and feature
 * vectors come out as ARRAY<FLOAT> ready for [[graft.ml.Similarity]].
 */
object Multimodal {

  // javax.imageio defaults to useCache=true: every ImageIO.read/write
  // on a non-file stream spools through a TEMP FILE in java.io.tmpdir
  // (FileCache(In|Out)putStream) — one disk create/write/delete per
  // image. For a corpus of small in-memory payloads that is pure
  // per-row disk I/O priced by tmpdir state, not by the codec
  // (measured: the three PNG queries at sf0.1 swung 0.3 ↔ 3.5 s with
  // ZERO code change when the host's tmp went cold). In-memory streams
  // are strictly correct here — payloads are bounded (KB-scale tiles),
  // executors decode thousands per partition. JVM-global by imageio
  // design; set once when the library loads, on every executor via
  // the task closure touching this object.
  ImageIO.setUseCache(false)

  case class MediaItem(
      media_id: Long,
      media_type: String,   // "image" | "audio" | "video"
      payload: Array[Byte], // opaque encoded bytes
      width: Int,
      height: Int)

  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      feature: Array[Float])

  /** Deterministic fake decode for AUDIO/VIDEO (no demuxer in this
    * environment): byte histogram moments. A real decoder replaces ONLY
    * this function. Images do not go through here — see
    * [[decodeImage]]. */
  def stubDecode(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** REAL image decode via the in-JDK `javax.imageio` codec (PNG/BMP/
    * JPEG…): payload bytes → decoded 8-bit gray samples, row-major.
    * Throws on undecodable bytes — a corrupt image should fail loudly,
    * not produce silent garbage features. */
  def decodeImage(payload: Array[Byte]): Array[Int] = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "javax.imageio could not decode image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    out
  }

  /** Gray-value histogram of REAL decoded pixels: `dims` equi-width
    * buckets over [0, 256). Integer counts (exactly representable as
    * Float), so the feature is reproducible across engines given the
    * same pixels — the property the oracle checks. */
  def imageHistogram(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    val px = decodeImage(payload)
    var i = 0
    while (i < px.length) { out(px(i) * dims / 256) += 1.0f; i += 1 }
    out
  }

  /** Batched decode stage: one decoder instance per partition, streamed
    * over the iterator — the mapInPandas-equivalent shape. Images run
    * the REAL `javax.imageio` decode; audio/video run the stub. */
  def extractFeatures(items: Dataset[MediaItem], dims: Int = 8): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition decoder init would go here (model load, codec ctx)
      it.map { m =>
        val feat = m.media_type match {
          case "image" => imageHistogram(m.payload, dims)
          case _       => stubDecode(m.payload, dims)
        }
        MediaFeatures(m.media_id, m.media_type, m.payload.length.toLong, feat)
      }
    }
  }

  case class Frame(
      media_id: Long,
      frame_idx: Long,
      payload: Array[Byte])

  /**
   * Frame sampling (video → every `everyN`-th frame): the one-to-many
   * decode shape. Frames here are fixed-size payload chunks (the stub
   * codec); a real demuxer replaces only the chunking. `flatMap` keeps
   * it fully parallel and lets downstream per-frame decode fan out.
   */
  def frameSample(items: Dataset[MediaItem], frameBytes: Int, everyN: Int): Dataset[Frame] = {
    import items.sparkSession.implicits._
    items.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex.collect {
        case (bytes, i) if i % everyN == 0 => Frame(m.media_id, i.toLong, bytes)
      }
    }
  }

  /** REAL image resize: decode via the actual codec, nearest-neighbor
    * sample (own integer loop — no AWT filtering nondeterminism:
    * out(x,y) = in(x·w/w2, y·h/h2), floor division), re-encode as PNG.
    * Deterministic pixel-for-pixel, so the oracle reproduces the
    * resized image from the pixel formula alone. */
  def resizeImageNn(payload: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "javax.imageio could not decode image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        out(y * w2 + x) = img.getRaster.getSample(x * w / w2, y * h / h2, 0)
        x += 1
      }
      y += 1
    }
    encodePng(out, w2, h2)
  }

  /** Resize stub for OPAQUE payloads (audio/video byte budgets):
    * metadata transform + deterministic payload rewrite (truncate/pad
    * to the target byte budget). Images go through the REAL
    * [[resizeImageNn]] codec path instead. */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.map { m =>
      if (m.media_type == "image") {
        MediaItem(m.media_id, m.media_type, resizeImageNn(m.payload, w, h), w, h)
      } else {
        val budget = math.max(1, w * h / 64)
        val p = if (m.payload.length >= budget) m.payload.take(budget)
                else m.payload ++ Array.fill[Byte](budget - m.payload.length)(0)
        MediaItem(m.media_id, m.media_type, p, w, h)
      }
    }
  }

  /** Demo corpus: documents' text bytes standing in for encoded media.
    * Typed "video" — an un-decodable opaque stream is exactly what the
    * audio/video stub path and the frame sampler model; real images come
    * from [[fromDocumentsPng]]. */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        lit("video").as("media_type"),
        col("text").cast("binary").as("payload"),
        lit(64).as("width"),
        lit(64).as("height"))
      .as[MediaItem]
  }

  /** Deterministic 16-bit PCM samples for a doc: sample i is
    * ((ascii(md5hex[i mod 32]) * 997 + i * 131) mod 65536) − 32768 —
    * pure ASCII-hex arithmetic both engines replicate exactly, with the
    * multipliers chosen so the wrap mixes signs (zero crossings are
    * non-vacuous). */
  def docSamples(text: String, n: Int): Array[Short] = {
    val h = md5Hex(text)
    Array.tabulate(n)(i =>
      (((h.charAt(i % 32).toInt * 997 + i * 131) % 65536) - 32768).toShort)
  }

  /** Encode samples as a REAL WAV (RIFF container, 16-bit PCM LE mono)
    * via the in-JDK `javax.sound.sampled` writer. PCM is lossless, so
    * decode(encode(s)) == s — the invariant `q_multimodal_audio`'s
    * oracle leans on. */
  def encodeWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    import javax.sound.sampled._
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** REAL audio decode via `javax.sound.sampled`: WAV payload → PCM
    * 16-bit samples. Throws on undecodable bytes — corrupt audio fails
    * loudly, like [[decodeImage]]. */
  def decodeWav(payload: Array[Byte]): Array[Short] = {
    import javax.sound.sampled._
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian, s"expected 16-bit mono LE PCM, got $fmt")
    val bytes = ais.readAllBytes()
    Array.tabulate(bytes.length / 2)(i =>
      ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort)
  }

  /** Audio corpus: one real WAV per document, samples derived from the
    * doc's md5 so the oracle can reproduce them codec-free. */
  def fromDocumentsWav(spark: SparkSession, dir: String, n: Int = 256): Dataset[MediaItem] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      // spread the codec work: the documents table is one parquet split
      // at small SF, which would serialize the embarrassingly-parallel
      // encode/decode stages onto one core
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .map { case (id, text) =>
        MediaItem(id, "audio", encodeWav(docSamples(text, n)), n, 1)
      }
  }

  /** Zero-crossing counts per `segs` equal segments of the REAL decoded
    * audio — the classic cheap audio activity feature. A crossing at
    * sample i (i ≥ 1, sign(s_i) ≠ sign(s_{i−1}) with 0 counted
    * nonnegative) lands in segment i·segs/n. Exact integer counts. */
  def audioZeroCrossings(items: Dataset[MediaItem], segs: Int = 8): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val s = decodeWav(m.payload)
        val out = new Array[Long](segs)
        var i = 1
        while (i < s.length) {
          if ((s(i) < 0) != (s(i - 1) < 0)) out(i * segs / s.length) += 1L
          i += 1
        }
        (m.media_id, out)
      }
    }.toDF("media_id", "crossings")
  }

  /** Deterministic gray pixels for frame `f` of a doc's video: pixel i
    * is `(ascii(md5hex[(i+f) mod 32]) * 31 + f * 7) mod 256`. */
  def docFramePixels(text: String, side: Int, frame: Int): Array[Int] = {
    val h = md5Hex(text)
    Array.tabulate(side * side)(i =>
      (h.charAt((i + frame) % 32).toInt * 31 + frame * 7) % 256)
  }

  /** Encode gray frames as a REAL YUV4MPEG2 (Y4M) stream — the plain
    * uncompressed video container of mjpegtools/ffmpeg (`Cmono` = luma
    * plane only): textual stream header, then `FRAME\n` + raw plane per
    * frame. Raw planes are lossless, so decode(encode(fs)) == fs. */
  def encodeY4m(frames: Seq[Array[Int]], w: Int, h: Int): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    baos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 Cmono\n".getBytes("ASCII"))
    frames.foreach { f =>
      baos.write("FRAME\n".getBytes("ASCII"))
      f.foreach(p => baos.write(p & 0xff))
    }
    baos.toByteArray
  }

  /** REAL video demux: parse the Y4M stream header (magic, W/H tags)
    * and FRAME markers, returning the decoded gray planes. Throws on
    * anything that is not a mono Y4M stream — corrupt video fails
    * loudly, like [[decodeImage]] / [[decodeWav]]. */
  def decodeY4m(payload: Array[Byte]): (Int, Int, Seq[Array[Int]]) = {
    val nl = payload.indexOf('\n'.toByte)
    require(nl > 0, "missing Y4M stream header")
    val header = new String(payload, 0, nl, "ASCII")
    val tags = header.split(" ")
    require(tags(0) == "YUV4MPEG2", s"not a Y4M stream: $header")
    val w = tags.collectFirst { case t if t.startsWith("W") => t.tail.toInt }
      .getOrElse(sys.error("Y4M header missing W tag"))
    val h = tags.collectFirst { case t if t.startsWith("H") => t.tail.toInt }
      .getOrElse(sys.error("Y4M header missing H tag"))
    require(tags.contains("Cmono"), "only mono (luma-plane) Y4M supported")
    val frameBytes = w * h
    val frames = Seq.newBuilder[Array[Int]]
    var pos = nl + 1
    while (pos < payload.length) {
      val fnl = payload.indexOf('\n'.toByte, pos)
      require(fnl > 0 && new String(payload, pos, fnl - pos, "ASCII")
        .startsWith("FRAME"), "expected FRAME marker")
      require(payload.length >= fnl + 1 + frameBytes, "truncated frame")
      frames += Array.tabulate(frameBytes)(i => payload(fnl + 1 + i) & 0xff)
      pos = fnl + 1 + frameBytes
    }
    (w, h, frames.result())
  }

  /** Video corpus: one real Y4M stream per document (`nFrames` mono
    * frames), pixels derived from the doc's md5 so the oracle can
    * reproduce them container-free. */
  def fromDocumentsY4m(spark: SparkSession, dir: String, side: Int = 16,
      nFrames: Int = 4): Dataset[MediaItem] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      // spread the codec work: the documents table is one parquet split
      // at small SF, which would serialize the embarrassingly-parallel
      // encode/decode stages onto one core
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .map { case (id, text) =>
        MediaItem(id, "video",
          encodeY4m((0 until nFrames).map(docFramePixels(text, side, _)),
            side, side), side, side)
      }
  }

  /** Per-frame luma mass of the REAL demuxed video — the cheap scene /
    * brightness profile. Exact integer sums of actual decoded planes,
    * one row per (media_id, frame_idx). */
  def videoFrameLuma(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.flatMap { m =>
      val (_, _, frames) = decodeY4m(m.payload)
      frames.zipWithIndex.map { case (f, i) =>
        (m.media_id, i.toLong, f.foldLeft(0L)(_ + _))
      }
    }.toDF("media_id", "frame_idx", "sum_luma")
  }

  /**
   * Average-hash perceptual fingerprint of a REAL decoded image
   * (pHash family, average variant): decode via the actual codec,
   * mean = floor(Σpx / n), bit i = px(i) > mean, packed 32 bits per
   * Long word (32, not 64, so the packed values stay non-negative and
   * band keys / xor arithmetic are sign-free in BOTH engines). All
   * integer ops — the oracle reproduces the hash pixel-for-pixel.
   * Identical images hash identically (hamming 0); the image-corpus
   * near-dup primitive at any scale.
   */
  def averageHashWords(payload: Array[Byte]): Array[Long] = {
    val px = decodeImage(payload)
    var sum = 0L
    var i = 0
    while (i < px.length) { sum += px(i); i += 1 }
    val mean = sum / px.length
    val out = new Array[Long]((px.length + 31) / 32)
    i = 0
    while (i < px.length) {
      if (px(i) > mean) out(i / 32) |= 1L << (i % 32)
      i += 1
    }
    out
  }

  /** (media_id, w, v): the image's average-hash as one row per 32-bit
    * word — the banded layout the near-dup bucket join consumes
    * directly (band key = (w, v)). */
  def phashWords(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.flatMap { m =>
      averageHashWords(m.payload).zipWithIndex.map {
        case (v, w) => (m.media_id, w.toLong, v)
      }
    }.toDF("media_id", "w", "v")
  }

  /** Lowercase-hex md5, identical to DuckDB's `md5(text)`. */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic gray pixels for a doc: pixel i of a `side`×`side`
    * image is `(ascii(md5hex[i mod 32]) * 7) % 256` — pure ASCII-hex
    * arithmetic both engines replicate exactly. */
  def docPixels(text: String, side: Int): Array[Int] = {
    val h = md5Hex(text)
    Array.tabulate(side * side)(i => (h.charAt(i % 32).toInt * 7) % 256)
  }

  /** Encode gray pixels as a REAL PNG via `javax.imageio`. PNG is
    * lossless for 8-bit gray, so decode(encode(px)) == px — the
    * invariant `q_multimodal_decode`'s oracle leans on. */
  def encodePng(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.getRaster.setSample(x, y, 0, pixels(y * w + x)); x += 1 }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Image corpus variant for the NEAR-DUP path: pixels derived from
    * the md5 of the document's LEAD `lead` characters (a thumbnail of
    * the opening content) — documents sharing a lead produce
    * byte-identical images, so perceptual-hash dedup has real positives
    * on the fixture corpus (22 shared-lead groups at sf0.01 vs zero
    * full-text-identical docs). DuckDB mirror: `md5(substr(text,1,64))`
    * — byte-exact because the fixture text is ASCII (a production
    * corpus would slice by code points on both sides). */
  def fromDocumentsPngLead(spark: SparkSession, dir: String, side: Int = 16,
      lead: Int = 64): Dataset[MediaItem] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .map { case (id, text) =>
        MediaItem(id, "image",
          encodePng(docPixels(text.take(lead), side), side, side), side, side)
      }
  }

  /** Image corpus: one real PNG per document, pixels derived from the
    * doc's md5 so the oracle can reproduce them without a codec. The
    * payload column carries genuine encoded-image bytes — everything
    * downstream (decode, features) exercises the real codec path. */
  def fromDocumentsPng(spark: SparkSession, dir: String, side: Int = 16): Dataset[MediaItem] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      // spread the codec work: the documents table is one parquet split
      // at small SF, which would serialize the embarrassingly-parallel
      // encode/decode stages onto one core
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .map { case (id, text) =>
        MediaItem(id, "image", encodePng(docPixels(text, side), side, side),
          side, side)
      }
  }
}
