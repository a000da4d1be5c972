package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: images/audio/video as opaque `binary` columns with
  * typed metadata, processed by batched per-partition functions — the
  * Scala analogue of `mapInPandas` plumbing (Iterator-of-batches in,
  * Iterator-of-batches out, constant memory per partition).
  *
  * The actual media decode is STUBBED (this environment ships no image/
  * audio codecs): [[DecodeStub.decode]] is a deterministic fake keyed on
  * the byte content. Everything around it — binary schema, encoders,
  * batch iteration, partition-parallel execution, feature schema — is
  * real and oracle-tested (the fake is pure integer/hash math both
  * engines can compute).
  *
  * Scale: assets read as binary parquet columns stay off-heap in the
  * vectorized reader; `mapPartitions` keeps one decode buffer per
  * partition rather than per row; downstream features are plain columns
  * for predicate pushdown.
  */
object Multimodal {

  /** An opaque media asset. */
  final case class Asset(asset_id: Long, kind: String, bytes: Array[Byte])

  /** Extracted (stub-)features; the shape a real decoder would produce. */
  final case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Int,
                                 sha: String, width: Int, height: Int,
                                 n_frames: Int)

  object DecodeStub {
    /** Deterministic fake decode: dimensions derived from content length.
      * A real build replaces this body with an image/audio codec call —
      * the signature (bytes in, dims out) is the integration point.
      */
    def decode(bytes: Array[Byte]): (Int, Int) =
      (bytes.length % 640, (bytes.length * 7) % 480)

    /** Fake frame sampling: one frame per 32 bytes, capped at 16. */
    def frameCount(bytes: Array[Byte]): Int =
      math.min(bytes.length / 32, 16)
  }

  /** Derive a deterministic asset table from `documents` (the testdata
    * has no real media, so document text bytes stand in for payloads).
    */
  def assets(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("bytes"))
      .as[Asset]
  }

  /** Batched per-partition feature extraction (mapInPandas-shaped). */
  def extractFeatures(assetsDs: Dataset[Asset]): Dataset[AssetFeatures] = {
    val spark = assetsDs.sparkSession
    import spark.implicits._
    assetsDs.mapPartitions { batch: Iterator[Asset] =>
      // one digest instance per partition, reused across the batch
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { a =>
        md.reset()
        val sha = md.digest(a.bytes).map("%02x".format(_)).mkString
        val (w, h) = DecodeStub.decode(a.bytes)
        AssetFeatures(a.asset_id, a.kind, a.bytes.length, sha, w, h,
          DecodeStub.frameCount(a.bytes))
      }
    }
  }

  /** Resize stub: recompute dims at a scale factor (metadata-only — a
    * real implementation transforms the payload).
    */
  def resize(features: Dataset[AssetFeatures], scalePct: Int): DataFrame =
    features.toDF().select(
      col("asset_id"), col("kind"),
      (col("width") * scalePct / 100).cast("int").as("width"),
      (col("height") * scalePct / 100).cast("int").as("height"))
}
