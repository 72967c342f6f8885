package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns beyond images: audio and video as OPAQUE binary
  * columns with typed metadata, plus the per-row transforms a training
  * pipeline needs (decode, feature extraction, frame sampling).
  *
  * STUB NOTICE: no audio/video codec libraries ship in this container, so
  * `decodeAudioPcm` and `decodeFrame` are DETERMINISTIC FAKES (a seeded
  * synthesis from the payload bytes, clearly marked below) standing in for
  * a real codec call. Everything around them — schemas, typed Datasets,
  * partitioning, batch shapes, windowed feature extraction — is real Spark
  * plumbing and is tested; swapping in a real decoder changes only the two
  * marked functions. Images, by contrast, use a REAL codec path
  * (javax.imageio in graft.sources.Images).
  */
object Multimodal {

  final case class MediaMeta(w: Int, h: Int, n_frames: Int,
                             sample_rate: Int, duration_ms: Long)
  final case class MediaRow(media_id: String, kind: String, bytes: Array[Byte],
                            caption: String, meta: MediaMeta)
  final case class AudioFeatureRow(media_id: String, window_ix: Int,
                                   energy: Double, zero_crossings: Long)
  final case class FrameRow(media_id: String, frame_ix: Int, frame_bytes: Array[Byte])

  /** Deterministic synthetic media table: n/2 audio + n/2 video rows with
    * opaque payloads and honest metadata.
    */
  def table(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { boxed =>
      val id = boxed.longValue
      val rng = new scala.util.Random(0xAD10 ^ (id * 0x9E3779B97F4A7C15L))
      val kind = if (id % 2 == 0) "audio" else "video"
      val payload = new Array[Byte](256 + rng.nextInt(768))
      rng.nextBytes(payload)
      val meta =
        if (kind == "audio") MediaMeta(0, 0, 0, 16000, 1000L + (id % 9000))
        else MediaMeta(320, 240, 25 * (1 + (id % 10)).toInt, 0, (1 + (id % 10)) * 1000L)
      MediaRow(f"med-$id%08d", kind, payload, s"media caption $id", meta)
    })
  }

  /** ====== DETERMINISTIC FAKE (stands in for a real audio codec) ======
    * Synthesises `nSamples` PCM samples from a rolling hash of the payload
    * — same bytes always produce the same samples. A real implementation
    * would hand `bytes` to a decoder and return its PCM output.
    */
  def decodeAudioPcm(bytes: Array[Byte], nSamples: Int): Array[Double] = {
    val out = new Array[Double](nSamples)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var k = 0
    while (k < nSamples) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(k) = (h >> 20).toDouble / (1L << 43).toDouble // [-1, 1)
      k += 1
    }
    out
  }

  /** ====== DETERMINISTIC FAKE (stands in for a real video codec) ======
    * "Extracts" frame `ix` as a small byte tile derived from payload+ix.
    */
  def decodeFrame(bytes: Array[Byte], ix: Int): Array[Byte] = {
    val out = new Array[Byte](64)
    var h = 0x9E3779B9L ^ ix.toLong
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var k = 0
    while (k < 64) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(k) = (h >> 32).toByte
      k += 1
    }
    out
  }

  /** Windowed audio features: decode (stubbed) -> fixed 160-sample windows
    * -> per-window energy + zero-crossing count. Pure per-row fan-out (no
    * shuffle); the batch shape — one task decodes a batch of rows, emits
    * window rows — is exactly what a real DSP pipeline needs.
    */
  def audioFeatures(media: Dataset[MediaRow], windows: Int = 8): Dataset[AudioFeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").flatMap { m =>
      val pcm = decodeAudioPcm(m.bytes, windows * 160)
      (0 until windows).map { wix =>
        var energy = 0.0
        var zc = 0L
        var i = wix * 160
        while (i < (wix + 1) * 160) {
          energy += pcm(i) * pcm(i)
          if (i > wix * 160 && (pcm(i) >= 0) != (pcm(i - 1) >= 0)) zc += 1
          i += 1
        }
        AudioFeatureRow(m.media_id, wix, energy, zc)
      }
    }
  }

  /** Sample every `everyN`-th frame of each video (stubbed frame decode);
    * rows explode inside the task, shuffle-free.
    */
  def frameSample(media: Dataset[MediaRow], everyN: Int): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      (0 until m.meta.n_frames by everyN).map { ix =>
        FrameRow(m.media_id, ix, decodeFrame(m.bytes, ix))
      }
    }
  }

  /** Cross-modal join shape: media captions deduplicated against the
    * documents table by exact caption text (the multimodal side of the
    * training-data dedup story).
    */
  def captionJoin(media: Dataset[MediaRow], docs: DataFrame): DataFrame =
    media.toDF.select(col("media_id"), col("caption"))
      .join(docs.select(col("doc_id"), col("text")),
        col("caption") === col("text"), "left")
}
