package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decode/feature-extract as partition-wise
  * batch operations.
  *
  * The container ships no codecs, so the decode kernel is a clearly
  * marked deterministic STUB — everything around it (schema, batch
  * shape, partitioning, frame explosion) is the real distributed
  * plumbing a codec would drop into. In PySpark the kernel would be a
  * pandas-batch `mapInPandas` UDF; the Scala-native equivalent is
  * `mapPartitions` over a typed Dataset, which gives the same
  * batch-per-partition call shape without a Python worker hop.
  */
object Multimodal {

  /** One decoded media asset. In production width/height/frames come
    * from the codec; `digest` keys downstream exact-dedup. */
  final case class DecodedMedia(
      media_id: Long, media_type: String, n_bytes: Int,
      digest: String, width: Int, height: Int, n_frames: Int)

  /** Attach an opaque binary payload + metadata struct. Here the bytes
    * are fabricated from a text column (no real media in the fixtures);
    * with real data this is a `binaryFile` read or a blob-store fetch. */
  def attachBinary(df: DataFrame, id: String, textCol: String,
                   mediaType: String): DataFrame =
    df.select(
      col(id).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(textCol).cast("binary").as("content"))

  /** Partition-wise batch decode. The iterator-in/iterator-out shape is
    * what matters at scale: one codec context per partition, streaming
    * through rows without materializing the partition. */
  def decodeStub(binary: DataFrame)(implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    binary.select("media_id", "media_type", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "codec" init — a real decoder allocates here
        val md = MessageDigest.getInstance("SHA-256")
        rows.map { case (id, mtype, bytes) =>
          md.reset()
          val digest = md.digest(bytes).map("%02x".format(_)).mkString
          // ---- STUB decode: deterministic fake dimensions ------------
          // A real implementation hands `bytes` to the codec and reads
          // the true geometry; the fakes keep the pipeline testable.
          val w = bytes.length % 640
          val h = bytes.length * 7 % 480
          val frames = bytes.length % 24 + 1
          // -------------------------------------------------------------
          DecodedMedia(id, mtype, bytes.length, digest, w, h, frames)
        }
      }
  }

  /** Frame sampling: every `everyN`-th frame index per asset, exploded to
    * one row per sampled frame — the fan-out stage a video feature
    * extractor consumes. Narrow op (explode), no shuffle. */
  def sampleFrames(decoded: Dataset[DecodedMedia], everyN: Int)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    decoded.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))))
      .select($"media_id", $"frame_idx", $"width", $"height")
  }

  /** Resize planning (metadata-only op): target geometry preserving
    * aspect, computed relationally so it composes with any decode. */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded.withColumn("scale",
        least(lit(maxSide) / greatest(col("width"), lit(1)),
              lit(maxSide) / greatest(col("height"), lit(1)), lit(1.0)))
      .withColumn("target_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("target_h", floor(col("height") * col("scale")).cast("int"))
}
