package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads ride as opaque `binary` columns with typed metadata;
  * decode / feature-extract / frame-sample run as batched
  * mapPartitions stages (the Scala analog of Python's mapInPandas:
  * per-partition batch amortization, columnar in/out).
  *
  * The actual codec work is STUBBED (this container has no image/audio
  * libraries): `decodeStub` parses a deterministic fake header instead
  * of calling a real decoder — the Spark-side plumbing (schema, batch
  * shape, partitioning, null passthrough) is real and tested
  * (MultimodalSpec). Swap `decodeStub`/`featuresStub` for real codecs
  * at deployment; nothing else changes.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      source_url: String
  )

  final case class DecodedMeta(
      media_id: Long,
      modality: String,
      width: Int,
      height: Int,
      n_frames: Int,
      format: String,
      n_bytes: Long
  )

  /** Fake header layout (generator + stub agree): bytes 0-3 magic
    * "GRFT", byte 4 format code, bytes 5-6 width, 7-8 height,
    * 9-10 frame count, rest = payload body.
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

  private val FormatNames = Array("raw", "jpegish", "pngish", "wavish", "mp4ish")

  /** STUB decode: parses the fake header. A real deployment replaces
    * the body of this function with an actual codec call (??? marker).
    */
  def decodeStub(payload: Array[Byte]): Option[(Int, Int, Int, String)] = {
    if (payload == null || payload.length < 11) return None
    if (payload(0) != 'G' || payload(1) != 'R' || payload(2) != 'F' || payload(3) != 'T') return None
    // ??? real codec goes here (e.g. ImageIO / ffmpeg binding)
    val fmt = FormatNames(math.min(payload(4).toInt & 0xff, FormatNames.length - 1))
    val w = ((payload(5) & 0xff) << 8) | (payload(6) & 0xff)
    val h = ((payload(7) & 0xff) << 8) | (payload(8) & 0xff)
    val f = ((payload(9) & 0xff) << 8) | (payload(10) & 0xff)
    Some((w, h, f, fmt))
  }

  /** Decode stage: batched per-partition; malformed payloads drop (with
    * the same semantics a real decoder-failure filter would have).
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodeStub(m.payload).map { case (w, h, f, fmt) =>
          DecodedMeta(m.media_id, m.modality, w, h, f, fmt,
            if (m.payload == null) 0L else m.payload.length.toLong)
        }
      }
    }
  }

  /** STUB feature extraction: 16-bin byte histogram of the payload body,
    * L1-normalized — the real version would be an image embedding. The
    * batch shape (one Array[Float] per row, fixed dim) is the real
    * contract.
    */
  def featuresStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (payload != null && payload.length > 11) {
      var i = 11
      while (i < payload.length) { hist((payload(i) & 0xff) / 16) += 1f; i += 1 }
      val total = payload.length - 11
      var j = 0
      while (j < 16) { hist(j) /= total; j += 1 }
    }
    hist
  }

  def withFeatures(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map(m => (m.media_id, m.modality, featuresStub(m.payload)))
    }.toDF("media_id", "modality", "features")
  }

  /** Frame sampling for video-ish payloads: every k-th body byte stands
    * in for every k-th frame (real version: decoder frame seek). Keeps
    * the explode/posexplode shape of a real frame table.
    */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      decodeStub(m.payload).toSeq.flatMap { case (_, _, frames, _) =>
        (0 until frames by everyK).map(fi => (m.media_id, fi,
          if (11 + fi < m.payload.length) m.payload(11 + fi).toInt & 0xff else 0))
      }
    }.toDF("media_id", "frame_idx", "frame_byte")
  }

  /** Deterministic fake media generator (keyed by id) for tests/bench. */
  def genMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism).map { i =>
      val h = scala.util.hashing.MurmurHash3.stringHash(s"media:$i", 99)
      val fmt = math.abs(h) % 5
      val w = 64 + math.abs(h / 5) % 512
      val ht = 64 + math.abs(h / 7) % 512
      val frames = 1 + math.abs(h / 11) % 64
      val body = Array.tabulate[Byte](64 + (math.abs(h) % 128))(j =>
        ((h + j * 31) & 0xff).toByte)
      val modality = Seq("image", "audio", "video")(math.abs(h) % 3)
      MediaRow(i, modality, encodeFakeMedia(fmt, w, ht, frames, body),
        f"https://synth.example/media/$i%06d")
    }
  }
}
