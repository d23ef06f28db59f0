package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column operators for a training-data pipeline: media
  * payloads ride as opaque `binary` columns with typed metadata;
  * decode / feature-extract / resize / frame-sample run as batched
  * mapPartitions stages (the Scala analog of Python's mapInPandas:
  * per-partition batch amortization, columnar in/out).
  *
  * Codec status (this container has no external media libraries, so
  * everything here uses JDK built-ins only):
  *  - images: REAL — payloads are genuine PNG/BMP files; decode +
  *    pixel features + resize go through javax.imageio / BufferedImage
  *    (JPEG decode works too; fixtures generate PNG/BMP because they
  *    are lossless, keeping pixel features bit-deterministic);
  *  - audio: REAL — payloads are genuine RIFF/WAVE PCM16 files; the
  *    header parser and sample-level features are hand-rolled (no
  *    AudioSystem dependency, deterministic everywhere);
  *  - video: STUB — no video codec exists in the JDK; payloads use the
  *    disclosed "GRFT" fake container and frame sampling reads fake
  *    frame bytes. Swap `decodeVideoStub` for an ffmpeg binding at
  *    deployment; nothing else changes.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      source_url: String
  )

  /** Unified decoded-metadata row. Field meaning is per-modality
    * (documented columns beat three separate tables at this stage):
    *  - image: width × height pixels, n_frames = 1
    *  - audio: width = sample rate (Hz), height = channels,
    *    n_frames = PCM sample count per channel
    *  - video (stub): width × height, n_frames = frame count
    */
  final case class DecodedMeta(
      media_id: Long,
      modality: String,
      width: Int,
      height: Int,
      n_frames: Int,
      format: String,
      n_bytes: Long
  )

  // ---------- real image codec (JDK javax.imageio) ----------

  def encodeImage(img: java.awt.image.BufferedImage, format: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Deterministic RGB test image for a media id (gradient + id-keyed
    * xor texture — every pixel is a pure function of (i, x, y)).
    */
  def genImage(i: Long, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = x * 255 / math.max(w - 1, 1)
        val g = y * 255 / math.max(h - 1, 1)
        val b = (x ^ y ^ i.toInt) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  // every sniffer is null-safe: media columns are nullable and all
  // stages (decode, features, thumbnails, frames) must pass/drop null
  // payloads instead of throwing
  private def isPng(p: Array[Byte]) =
    p != null && p.length > 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G'
  private def isJpeg(p: Array[Byte]) =
    p != null && p.length > 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8
  private def isBmp(p: Array[Byte]) = p != null && p.length > 2 && p(0) == 'B' && p(1) == 'M'
  private def isWav(p: Array[Byte]) =
    p != null && p.length > 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'
  private def isFakeVideo(p: Array[Byte]) =
    p != null && p.length >= 11 && p(0) == 'G' && p(1) == 'R' && p(2) == 'F' && p(3) == 'T'

  /** REAL image decode via ImageIO (PNG/BMP/JPEG — all in the JDK). */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }

  // ---------- real audio codec (RIFF/WAVE PCM, hand-rolled) ----------

  private def le16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Genuine RIFF/WAVE file: PCM16 little-endian, one fmt + one data
    * chunk — readable by any audio tool.
    */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putLe32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def putLe16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(16, 16) // PCM fmt chunk size
    putLe16(20, 1) // audio format = PCM
    putLe16(22, channels)
    putLe32(24, sampleRate)
    putLe32(28, sampleRate * channels * 2) // byte rate
    putLe16(32, channels * 2) // block align
    putLe16(34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = samples(i).toByte
      out(44 + 2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    out
  }

  final case class WavMeta(sampleRate: Int, channels: Int, nSamples: Int, dataOffset: Int)

  /** Parse the RIFF header + fmt/data chunk walk (real format, real
    * parse; rejects non-PCM and truncated files like a real decoder).
    */
  def decodeWav(p: Array[Byte]): Option[WavMeta] = {
    if (!isWav(p)) return None
    var o = 12
    var fmt: Option[(Int, Int, Int)] = None // (sampleRate, channels, bitsPerSample)
    while (o + 8 <= p.length) {
      val id = new String(p, o, 4, "US-ASCII")
      val len = le32(p, o + 4)
      // a corrupt negative chunk length would stall the walk (o stops
      // advancing) or yield a negative sample count — reject the file
      // like a real decoder
      if (len < 0) return None
      // a huge positive length would Int-overflow the offset advance
      // below (o wraps negative → String ctor throws in the executor
      // instead of this row dropping); do the bound check in Long
      val next = o.toLong + 8L + len.toLong + (len & 1)
      if (id == "fmt " && o + 8 + 16 <= p.length) {
        val audioFormat = le16(p, o + 8)
        if (audioFormat != 1) return None // PCM only
        fmt = Some((le32(p, o + 12), le16(p, o + 10), le16(p, o + 22)))
      } else if (id == "data") {
        return fmt.flatMap { case (rate, ch, bits) =>
          if (bits != 16 || ch < 1) None
          else {
            val avail = math.min(len, p.length - o - 8)
            Some(WavMeta(rate, ch, avail / (2 * ch), o + 8))
          }
        }
      }
      // chunks are word-aligned; a non-data chunk claiming to run past
      // the end of the payload is corrupt — drop the file (the data
      // branch above already tolerates a truncated final data chunk)
      if (next > p.length) return None
      o = next.toInt
    }
    None
  }

  /** PCM16 samples of channel 0 (deinterleaved). */
  def wavSamples(p: Array[Byte], meta: WavMeta): Array[Short] = {
    val out = new Array[Short](meta.nSamples)
    var i = 0
    while (i < meta.nSamples) {
      out(i) = le16(p, meta.dataOffset + i * 2 * meta.channels).toShort
      i += 1
    }
    out
  }

  // ---------- video stub (no video codec in the JDK — disclosed) ----------

  /** Fake video container (generator + stub agree): bytes 0-3 magic
    * "GRFT", byte 4 format code, bytes 5-6 width, 7-8 height,
    * 9-10 frame count, rest = one byte per frame.
    */
  def encodeFakeMedia(format: Int, width: Int, height: Int, frames: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](11 + body.length)
    out(0) = 'G'; out(1) = 'R'; out(2) = 'F'; out(3) = 'T'
    out(4) = format.toByte
    out(5) = (width >> 8).toByte; out(6) = width.toByte
    out(7) = (height >> 8).toByte; out(8) = height.toByte
    out(9) = (frames >> 8).toByte; out(10) = frames.toByte
    System.arraycopy(body, 0, out, 11, body.length)
    out
  }

  /** STUB video decode: parses the fake header. A real deployment
    * replaces this with an ffmpeg/jcodec binding (??? marker); images
    * and audio above already use real codecs.
    */
  def decodeVideoStub(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!isFakeVideo(payload)) return None
    // ??? real video codec goes here
    val w = ((payload(5) & 0xff) << 8) | (payload(6) & 0xff)
    val h = ((payload(7) & 0xff) << 8) | (payload(8) & 0xff)
    val f = ((payload(9) & 0xff) << 8) | (payload(10) & 0xff)
    Some((w, h, f))
  }

  // ---------- unified decode stage ----------

  /** Decode one payload by sniffing its real magic bytes. */
  def decodeOne(m: MediaRow): Option[DecodedMeta] = {
    val p = m.payload
    if (p == null || p.length < 4) None
    else if (isPng(p) || isBmp(p) || isJpeg(p)) {
      val fmt = if (isPng(p)) "png" else if (isBmp(p)) "bmp" else "jpeg"
      decodeImage(p).map(img =>
        DecodedMeta(m.media_id, m.modality, img.getWidth, img.getHeight, 1, fmt, p.length.toLong))
    } else if (isWav(p))
      decodeWav(p).map(wm =>
        DecodedMeta(m.media_id, m.modality, wm.sampleRate, wm.channels, wm.nSamples, "wav", p.length.toLong))
    else
      decodeVideoStub(p).map { case (w, h, f) =>
        DecodedMeta(m.media_id, m.modality, w, h, f, "fakevideo", p.length.toLong)
      }
  }

  /** Decode stage: batched per-partition; undecodable payloads drop
    * (the same semantics a decoder-failure filter has in a real
    * training-data pipeline).
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(it => it.flatMap(decodeOne))
  }

  // ---------- feature extraction ----------

  /** 16-bin L1-normalized feature histogram from DECODED content:
    * image = luminance histogram over real pixels; audio = |amplitude|
    * histogram over real PCM samples; video (stub) = fake-frame-byte
    * histogram. Fixed dim — the batch contract of an embedding stage.
    */
  def features(m: MediaRow): Array[Float] = {
    val hist = new Array[Float](16)
    val p = m.payload
    if (p == null) return hist
    var n = 0
    if (isPng(p) || isBmp(p) || isJpeg(p)) {
      decodeImage(p).foreach { img =>
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            hist(lum / 16) += 1f
            n += 1
            x += 1
          }
          y += 1
        }
      }
    } else if (isWav(p)) {
      decodeWav(p).foreach { wm =>
        val samples = wavSamples(p, wm)
        var i = 0
        while (i < samples.length) {
          hist(math.min(math.abs(samples(i).toInt) / 2048, 15)) += 1f
          n += 1
          i += 1
        }
      }
    } else if (isFakeVideo(p) && p.length > 11) {
      var i = 11
      while (i < p.length) { hist((p(i) & 0xff) / 16) += 1f; n += 1; i += 1 }
    }
    if (n > 0) { var j = 0; while (j < 16) { hist(j) /= n; j += 1 } }
    hist
  }

  def withFeatures(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(it => it.map(m => (m.media_id, m.modality, features(m))))
      .toDF("media_id", "modality", "features")
  }

  // ---------- real image resize ----------

  /** REAL resize via Graphics2D (JDK): scaled PNG thumbnail bytes per
    * image row; non-images pass through as null (typed left-outer
    * semantics of a modality-specific stage).
    */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decodeImage(payload).map { img =>
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      encodeImage(out, "png")
    }

  def withThumbnails(media: Dataset[MediaRow], w: Int = 8, h: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val thumb = if (isPng(m.payload) || isBmp(m.payload) || isJpeg(m.payload))
          resizeImage(m.payload, w, h).orNull
        else null
        (m.media_id, m.modality, thumb)
      }
    }.toDF("media_id", "modality", "thumb_png")
  }

  /** Frame sampling: video-ish payloads only (stub frames — the real
    * version is a decoder frame seek). Keeps the explode shape of a
    * real frame table.
    */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      decodeVideoStub(m.payload).toSeq.flatMap { case (_, _, frames) =>
        (0 until frames by everyK).map(fi => (m.media_id, fi,
          if (11 + fi < m.payload.length) m.payload(11 + fi).toInt & 0xff else 0))
      }
    }.toDF("media_id", "frame_idx", "frame_byte")
  }

  /** Deterministic media generator (keyed by id): REAL PNG or BMP bytes
    * for images, REAL RIFF/WAVE PCM16 for audio (id-keyed sine), the
    * disclosed fake container for video.
    */
  def genMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism).map { i =>
      val h = scala.util.hashing.MurmurHash3.stringHash(s"media:$i", 99)
      val modality = Seq("image", "audio", "video")(math.abs(h) % 3)
      val payload = modality match {
        case "image" =>
          val w = 16 + math.abs(h / 5) % 48
          val ht = 16 + math.abs(h / 7) % 48
          encodeImage(genImage(i, w, ht), if (math.abs(h) % 2 == 0) "png" else "bmp")
        case "audio" =>
          val rate = 8000
          val freq = 100 + math.abs(h / 11) % 900
          val nSamples = 256 + math.abs(h / 13) % 1024
          val samples = Array.tabulate[Short](nSamples)(j =>
            (math.sin(2 * math.Pi * freq * j / rate) * 12000).toShort)
          encodeWavPcm16(samples, rate)
        case _ =>
          val w = 64 + math.abs(h / 5) % 512
          val ht = 64 + math.abs(h / 7) % 512
          val frames = 1 + math.abs(h / 11) % 64
          val body = Array.tabulate[Byte](64 + (math.abs(h) % 128))(j =>
            ((h + j * 31) & 0xff).toByte)
          encodeFakeMedia(math.abs(h) % 5, w, ht, frames, body)
      }
      MediaRow(i, modality, payload, f"https://synth.example/media/$i%06d")
    }
  }
}
