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
  *  - video: REAL — payloads are genuine MJPEG-in-AVI files (the one
  *    mainstream video format decodable with JDK primitives alone):
  *    hand-rolled RIFF/AVI container walk — the same chunk discipline
  *    as the WAV parser — plus ImageIO JPEG decode per frame. A
  *    deployment wanting H.264 would swap `decodeAvi`/`aviFrame` for an
  *    ffmpeg binding; nothing else changes.
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
    *  - video: width × height pixels, n_frames = counted '00dc' chunks
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
  private def isAvi(p: Array[Byte]) =
    p != null && p.length > 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' '

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

  // ---------- real video codec: MJPEG-in-AVI (RIFF walk + ImageIO) ----------

  /** Genuine RIFF/AVI file carrying an MJPEG video stream: the standard
    * hdrl LIST (avih main header + strl with 'vids'/'MJPG' strh and a
    * BITMAPINFOHEADER strf) followed by a movi LIST of '00dc' chunks,
    * each a complete JPEG. Playable by any MJPEG-capable player; the
    * JPEGs themselves come from the same ImageIO path as the image
    * fixtures.
    */
  def encodeAviMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def fourcc(s: String): Unit = { var i = 0; while (i < 4) { bos.write(s.charAt(i)); i += 1 } }
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val moviSize = 4 + moviBody
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    fourcc("RIFF"); le32(riffSize); fourcc("AVI ")
    fourcc("LIST"); le32(hdrlSize); fourcc("hdrl")
    fourcc("avih"); le32(56)
    le32(1000000 / fps) // dwMicroSecPerFrame
    le32(maxFrame * fps) // dwMaxBytesPerSec
    le32(0) // dwPaddingGranularity
    le32(0x10) // dwFlags: AVIF_HASINDEX off, AVIF_WASCAPTUREFILE-ish
    le32(frames.length) // dwTotalFrames
    le32(0) // dwInitialFrames
    le32(1) // dwStreams
    le32(maxFrame) // dwSuggestedBufferSize
    le32(width); le32(height)
    le32(0); le32(0); le32(0); le32(0) // dwReserved
    fourcc("LIST"); le32(strlSize); fourcc("strl")
    fourcc("strh"); le32(56)
    fourcc("vids"); fourcc("MJPG")
    le32(0); le16(0); le16(0) // dwFlags, wPriority, wLanguage
    le32(0) // dwInitialFrames
    le32(1); le32(fps) // dwScale / dwRate
    le32(0); le32(frames.length) // dwStart / dwLength
    le32(maxFrame) // dwSuggestedBufferSize
    le32(-1) // dwQuality
    le32(0) // dwSampleSize
    le16(0); le16(0); le16(width); le16(height) // rcFrame
    fourcc("strf"); le32(40)
    le32(40) // biSize
    le32(width); le32(height)
    le16(1); le16(24) // biPlanes / biBitCount
    fourcc("MJPG") // biCompression
    le32(width * height * 3) // biSizeImage
    le32(0); le32(0); le32(0); le32(0) // resolution / clr fields
    fourcc("LIST"); le32(moviSize); fourcc("movi")
    frames.foreach { f =>
      fourcc("00dc"); le32(f.length)
      bos.write(f, 0, f.length)
      if ((f.length & 1) == 1) bos.write(0) // chunks are word-aligned
    }
    bos.toByteArray
  }

  final case class AviMeta(width: Int, height: Int, nFrames: Int,
      frameChunks: Array[(Int, Int)]) // (offset, len) of each JPEG

  /** REAL AVI parse: the same defensive RIFF chunk walk as `decodeWav`
    * (Long-guarded offsets, corrupt lengths reject the file), descending
    * into LIST chunks to find the strf BITMAPINFOHEADER (authoritative
    * stream dimensions) and collecting every video-data ('##dc'/'##db')
    * chunk in the movi LIST. Frame count is the COUNTED chunk list —
    * cross-checked against the strh dwLength so a truncated movi body
    * drops the file instead of under-reporting.
    */
  def decodeAvi(p: Array[Byte]): Option[AviMeta] = {
    if (p == null || p.length < 24 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' ||
      p(3) != 'F' || p(8) != 'A' || p(9) != 'V' || p(10) != 'I' || p(11) != ' ')
      return None
    var width = -1; var height = -1; var declFrames = -1
    val chunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    // iterative walk with an explicit region stack (LIST bodies nest)
    var regions = List((12, p.length))
    while (regions.nonEmpty) {
      var (o, end) = regions.head
      regions = regions.tail
      while (o + 8 <= end) {
        val id = new String(p, o, 4, "US-ASCII")
        val len = le32(p, o + 4)
        if (len < 0) return None
        val next = o.toLong + 8L + len.toLong + (len & 1)
        // every body read below is bounds-checked against the PHYSICAL
        // region end first — a declared len only promises bytes, it
        // does not make them exist; a header truncated mid-body rejects
        // the file (None) rather than throwing in the executor
        if (id == "LIST" && len >= 4) {
          if (o + 12 > end) return None // truncated LIST type tag
          val listType = new String(p, o + 8, 4, "US-ASCII")
          val bodyEnd = math.min(o.toLong + 8L + len.toLong, end.toLong).toInt
          if (listType == "hdrl" || listType == "strl" || listType == "movi")
            regions = (o + 12, bodyEnd) :: regions
        } else if (id == "strh" && len >= 36) {
          if (o + 8 + 36 > end) return None // truncated stream header
          // only the video stream header's dwLength counts
          if (new String(p, o + 8, 4, "US-ASCII") == "vids")
            declFrames = le32(p, o + 8 + 32)
        } else if (id == "strf" && len >= 12 && width < 0) {
          if (o + 8 + 12 > end) return None // truncated BITMAPINFOHEADER
          width = le32(p, o + 8 + 4)
          height = le32(p, o + 8 + 8)
        } else if (id.endsWith("dc") || id.endsWith("db")) {
          if (o.toLong + 8L + len.toLong > p.length) return None // truncated frame
          chunks += ((o + 8, len))
        }
        if (next > end) {
          if (id == "LIST") () else return None // corrupt non-LIST chunk
          o = end
        } else o = next.toInt
      }
    }
    if (width <= 0 || height <= 0 || chunks.isEmpty) None
    else if (declFrames >= 0 && declFrames != chunks.length) None // truncated movi
    else Some(AviMeta(width, height, chunks.length, chunks.toArray))
  }

  /** Decode one frame of an AVI as a BufferedImage (real ImageIO JPEG
    * decode of the '00dc' chunk bytes).
    */
  def aviFrame(p: Array[Byte], meta: AviMeta, idx: Int): Option[java.awt.image.BufferedImage] = {
    if (idx < 0 || idx >= meta.frameChunks.length) return None
    val (off, len) = meta.frameChunks(idx)
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(p, off, len)))
    catch { case _: java.io.IOException => None }
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
    else if (isAvi(p))
      // real container walk + a real ImageIO decode of frame 0: header
      // dims must match the decoded pixels or the row drops like any
      // other corrupt payload
      decodeAvi(p).flatMap { am =>
        aviFrame(p, am, 0).filter(img =>
          img.getWidth == am.width && img.getHeight == am.height)
          .map(_ => DecodedMeta(m.media_id, m.modality, am.width, am.height,
            am.nFrames, "avi", p.length.toLong))
      }
    else None
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
    * histogram over real PCM samples; video = luminance histogram over
    * the decoded first frame. Fixed dim — the batch contract of an
    * embedding stage.
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
    } else if (isAvi(p)) {
      // real luminance histogram over the decoded first frame
      decodeAvi(p).flatMap(am => aviFrame(p, am, 0)).foreach { img =>
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

  /** Frame sampling over REAL video: every k-th '00dc' chunk of an AVI
    * is ImageIO-JPEG-decoded and its actual pixel dimensions emitted —
    * a decoder frame seek, exploded to the frame-table shape a
    * training-data pipeline consumes. (frame_w, frame_h) come from the
    * DECODED image, so the DuckDB oracle parsing the container header
    * out of the raw payload cross-checks that every sampled frame
    * really decodes.
    */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      decodeAvi(m.payload).toSeq.flatMap { am =>
        (0 until am.nFrames by everyK).flatMap { fi =>
          aviFrame(m.payload, am, fi).map(img =>
            (m.media_id, fi, img.getWidth, img.getHeight))
        }
      }
    }.toDF("media_id", "frame_idx", "frame_w", "frame_h")
  }

  /** Deterministic media generator (keyed by id): REAL PNG or BMP bytes
    * for images, REAL RIFF/WAVE PCM16 for audio (id-keyed sine), REAL
    * MJPEG-in-AVI for video (id-keyed gradient frames through the same
    * ImageIO JPEG path a camera pipeline would use).
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
          val w = 16 + math.abs(h / 5) % 48
          val ht = 16 + math.abs(h / 7) % 48
          val nFrames = 1 + math.abs(h / 11) % 24
          val frames = (0 until nFrames).map(f =>
            encodeImage(genImage(i * 1000 + f, w, ht), "jpeg"))
          encodeAviMjpeg(frames, w, ht)
      }
      MediaRow(i, modality, payload, f"https://synth.example/media/$i%06d")
    }
  }

  /** PNG IHDR dimensions (big-endian width/height at bytes 16/20) —
    * used to project the thumbnail stage's output to oracle-checkable
    * integers.
    */
  def pngSize(p: Array[Byte]): Option[(Int, Int)] = {
    if (!isPng(p) || p.length < 24) return None
    def be32(o: Int): Int =
      ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) | ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
    Some((be32(16), be32(20)))
  }
}
