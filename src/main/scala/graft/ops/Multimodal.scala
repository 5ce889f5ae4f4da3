package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract run per
  * partition over iterator batches (the Scala analog of `mapInPandas` —
  * streaming through rows without materializing a partition).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` parses a deterministic fake header we also
  * write, so the Spark-side plumbing — schema, batching, partitioning,
  * null/corrupt handling — is real and tested end-to-end, and a production
  * codec drops in by replacing ONE function.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, kind: String, valid: Boolean,
      width: Int, height: Int, n_bytes: Long, checksum: Long)

  /** Deterministic fake media payload: 12-byte header [kind(2) w(2) h(2)
    * pad(6)] + pseudo-random body. Stands in for JPEG/WAV bytes.
    */
  def fakePayload(id: Long, kind: String, w: Int, h: Int): Array[Byte] = {
    val body = new Array[Byte](12 + 64)
    body(0) = kind.charAt(0).toByte; body(1) = kind.charAt(1).toByte
    body(2) = (w >> 8).toByte; body(3) = w.toByte
    body(4) = (h >> 8).toByte; body(5) = h.toByte
    var s = id * 0x9E3779B97F4A7C15L
    var i = 12
    while (i < body.length) { s = s * 6364136223846793005L + 1442695040888963407L; body(i) = (s >>> 56).toByte; i += 1 }
    body
  }

  /** THE stub seam: replace with a real codec (JPEG decode, ffmpeg frame
    * sample, …) in production. Returns (valid, width, height).
    */
  def decodeStub(payload: Array[Byte]): (Boolean, Int, Int) = {
    if (payload == null || payload.length < 12) (false, 0, 0)
    else {
      val w = ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
      val h = ((payload(4) & 0xff) << 8) | (payload(5) & 0xff)
      (w > 0 && h > 0, w, h)
    }
  }

  /** Feature extraction over binary payloads — mapPartitions so a real codec
    * can amortize per-batch init (model load, JNI context) exactly like a
    * Pandas UDF would; rows stream through without full materialization.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here
      it.map { m =>
        val (valid, w, h) = decodeStub(m.payload)
        val checksum = if (m.payload == null) 0L
          else m.payload.foldLeft(1469598103934665603L)((a, b) => (a ^ (b & 0xff)) * 1099511628211L)
        MediaFeatures(m.media_id, m.kind, valid, w, h,
          if (m.payload == null) 0L else m.payload.length.toLong, checksum)
      }
    }
  }

  /** Synthetic media table derived from an id range (deterministic). */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = if (i % 3 == 0) "im" else if (i % 3 == 1) "au" else "vi"
      // every 17th payload is corrupt (too short) to exercise the error path
      val payload = if (i % 17 == 0) Array[Byte](1, 2, 3)
        else fakePayload(i, kind, 64 + (i % 512).toInt, 48 + (i % 256).toInt)
      MediaRow(i, kind, payload)
    }
  }

  /** Summary over extracted features (valid rate, byte volume per kind). */
  def featureSummary(features: DataFrame): DataFrame =
    features.groupBy("kind").agg(
      count(lit(1)).as("n"),
      sum(when(col("valid"), 1L).otherwise(0L)).as("n_valid"),
      sum("n_bytes").as("total_bytes"),
      max("width").as("max_width"))
}
