package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: media payloads ride as opaque BinaryType
 * columns with a typed metadata struct; decode / feature-extraction runs as
 * a per-partition batch pipeline over the binary payloads.
 *
 * The actual media decode is STUBBED (no image/audio libs in this
 * environment): `decodeStub` derives deterministic fake features (byte
 * length, content digest, fake dimensions) so the Spark-side plumbing —
 * schema, partitioning, batch iteration, typed Encoders — is real and
 * testable. Swap `decodeStub` for a real codec (e.g. JNI/FFI decode) without
 * touching the pipeline shape.
 */
object Multimodal {

  /** One media payload row (binary + typed metadata). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  /** Extracted features per payload. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, head_md5: String,
      fake_width: Int, fake_height: Int)

  /** Attach a binary payload column (here: the UTF-8 text bytes standing in
    * for an image/audio blob) + metadata struct. */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      octet_length(col(textCol)).cast(LongType).as("n_bytes"))

  /** STUB decode: deterministic features from the payload bytes. Replace the
    * body with a real decoder; the mapPartitions shape (per-partition batch
    * loop, typed Encoders, no driver collect) is the production plumbing. */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // One digest instance per partition — the "open codec once per batch"
      // pattern a real decoder needs.
      val md = MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val head = r.payload.take(32)
        val digest = md.digest(head).map("%02x".format(_)).mkString
        // Fake dimensions derived from content so they are deterministic.
        val w = 16 + (math.floorMod(r.n_bytes, 64L)).toInt
        MediaFeatures(r.doc_id, r.payload.length.toLong, digest, w, w / 2)
      }
    }
  }
}
