package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decode/feature-extract as partition-wise
  * batch operations.
  *
  * The decode surface has two legs. PNG is decoded for REAL through
  * `javax.imageio` (pure JVM, no native codecs needed) —
  * [[encodePngs]]/[[decodePngStats]] run the actual codec round-trip on
  * executors and q175 oracles the decoded geometry and exact pixel
  * sums. For formats the container cannot decode (JPEG-with-native-
  * turbo, audio, video), [[decodeStub]] keeps the clearly-marked
  * deterministic STUB with the real distributed plumbing around it
  * (schema, batch shape, partitioning, frame explosion). In PySpark the
  * kernel would be a pandas-batch `mapInPandas` UDF; the Scala-native
  * equivalent is `mapPartitions` over a typed Dataset — the same
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

  /** One decoded image's exact pixel statistics: geometry + per-channel
    * pixel SUMS (sums, not means, so the values stay integral and an
    * external oracle can reproduce them exactly). */
  final case class PngStats(media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Deterministic PNG fixtures, encoded with the REAL `javax.imageio`
    * codec on the executors (pure JVM — no native libraries): for id n,
    * a (n%13+4) × (n%7+3) image filled with RGB (n, 7n, 13n) mod 256,
    * except pixel (0,0) which carries the channel-inverted color — so a
    * decoder that only pretends to read pixels (returning the fill
    * constant) produces wrong sums. Partition-wise batch shape: one
    * encoder context per partition, streaming through rows. The PNG
    * BYTES are not canonical across encoder versions (compression may
    * differ) — only the decoded geometry/pixels are, which is what
    * [[decodePngStats]] extracts and q175 oracles. */
  def encodePngs(df: DataFrame, id: String)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(id).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { mid =>
        val w = (mid % 13 + 4).toInt
        val h = (mid % 7 + 3).toInt
        val (r, g, b) = ((mid % 256).toInt, (mid * 7 % 256).toInt,
          (mid * 13 % 256).toInt)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val fill = (r << 16) | (g << 8) | b
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, fill); x += 1 }
          y += 1
        }
        img.setRGB(0, 0, ((255 - r) << 16) | ((255 - g) << 8) | (255 - b))
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (mid, bos.toByteArray)
      }
    }.toDF("media_id", "content")
  }

  /** REAL decode leg: `javax.imageio.ImageIO.read` on the binary column,
    * per-partition batch iteration, exact per-channel pixel sums. This
    * replaces the fake-geometry stub for the one format the JVM decodes
    * natively — the same mapPartitions slot a native image/audio codec
    * drops into (see [[decodeStub]] for the declared-stub shape kept for
    * formats the container cannot decode). */
  def decodePngStats(binary: DataFrame)(implicit spark: SparkSession): Dataset[PngStats] = {
    import spark.implicits._
    binary.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (mid, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"media_id=$mid: not a decodable image")
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          PngStats(mid, img.getWidth, img.getHeight, sr, sg, sb)
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
