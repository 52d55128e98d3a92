package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  // ------------------------------------------------------------------
  // Perceptual hashing (dHash) — the multimodal leg of the dedup family.
  // ------------------------------------------------------------------

  /** Deterministic grayscale value for the variant-PNG fixture at pixel
    * (px,py): source `s` draws a Knuth-mixed pseudo-texture (well-spread
    * dHash bits — a plain gradient collapses cross-source Hamming
    * distances), variant `p` perturbs it perceptually:
    * p=0 pristine; p=1 uniform +8 brightness (a monotone per-pixel map,
    * which dHash is invariant to BY THEOREM — adjacent-pixel comparisons
    * are unchanged); p=2 a 3×3 white block at the origin (a local edit
    * that flips only the few hash bits sampled near it). Base values top
    * out at 239+8 < 255, so the brightness shift never clips (clipping
    * would break the invariance the spec pins). All arithmetic is
    * non-negative Long — exactly replayable in DuckDB BIGINT CTEs. */
  def variantGray(s: Long, p: Long, px: Int, py: Int): Int =
    if (p == 2 && px < 3 && py < 3) 255
    else {
      val v = (s * 7919L + px * 104729L + py * 130363L) * 2654435761L
      (((v % 2147483648L) >> 16) % 240 + (if (p == 1) 8 else 0)).toInt
    }

  /** Variant-PNG fixture encoder: for each id, source s = id/3 and
    * variant p = id%3 select a (s%6+12) × (s%5+10) grayscale image via
    * [[variantGray]], encoded with the REAL `javax.imageio` PNG codec on
    * the executors (r=g=b, so integer luma recovers the gray exactly).
    * Same partition-wise batch shape as [[encodePngs]]: one encoder
    * context per partition, no shuffle. The image COUNT tracks the
    * input row count — replicating the corpus ×k yields ×k images, so
    * the scale sweep measures a genuinely data-proportional workload. */
  def encodeVariantPngs(df: DataFrame, id: String)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // spread BEFORE the per-row codec work: a single-file parquet scan
    // (or an AQE-coalesced advisory repartition) would otherwise feed
    // the whole corpus to one encoder thread (the q246/q42 lesson)
    graft.operators.Relational.spread(df.select(col(id).cast("long").as(id)), col(id))
      .as[Long].mapPartitions { ids =>
      ids.map { mid =>
        val (s, p) = (mid / 3, mid % 3)
        val w = (s % 6 + 12).toInt
        val h = (s % 5 + 10).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = variantGray(s, p, x, y)
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (mid, bos.toByteArray)
      }
    }.toDF("media_id", "content")
  }

  /** Decode + nearest-neighbor downsample to a `gw`×`gh` gray grid: the
    * codec-slot half of dHash. ImageIO decodes on the executors
    * (partition-wise batch, one codec context per partition); sample
    * (x,y) reads pixel (x·W/gw, y·H/gh) — integer positions, so an
    * external oracle can replay the sampling exactly — and gray is the
    * integer luma (299r+587g+114b)/1000, exact for r=g=b. Emits the grid
    * row-major as one small array column so the HASH half
    * ([[dhashChunks]]) stays a pure codegen'd expression — the split
    * keeps mapPartitions confined to the codec, the house rule for
    * multimodal ops. */
  def sampleGrayGrid(binary: DataFrame, gw: Int = 9, gh: Int = 8)
                    (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    binary.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (mid, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"media_id=$mid: not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          require(w >= gw && h >= gh,
            s"media_id=$mid: $w x $h smaller than the $gw x $gh sample grid")
          val grays = new Array[Int](gw * gh)
          var y = 0
          while (y < gh) {
            var x = 0
            while (x < gw) {
              val p = img.getRGB(x * w / gw, y * h / gh)
              grays(y * gw + x) =
                (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff)
                  + 114 * (p & 0xff)) / 1000
              x += 1
            }
            y += 1
          }
          (mid, w, h, grays)
        }
      }.toDF("media_id", "width", "height", "grays")
  }

  /** dHash from the sampled gray grid, as four 16-bit chunk columns
    * c0..c3 (the [[graft.operators.Dedup.simhashChunks]] house
    * representation — chunked sketches stay non-negative INT32, so both
    * Hamming popcounts and the DuckDB oracle avoid BIGINT bit-63
    * overflow, which DuckDB rejects). Bit i (= y·8+x) of the 64-bit hash
    * is [grid(y, x+1) > grid(y, x)] — the classic horizontal-gradient
    * hash (Krawetz 2013): invariant to any monotone brightness map,
    * sensitive to structure. Built as a literal 64-term when() expression
    * tree, fully inside whole-stage codegen (no UDF, no higher-order
    * function). */
  def dhashChunks(grays: Column, gw: Int = 9): Seq[Column] =
    (0 until 4).map { k =>
      (16 * k until 16 * k + 16).map { i =>
        val (y, x) = (i / 8, i % 8)
        when(element_at(grays, y * gw + x + 2) > element_at(grays, y * gw + x + 1),
          lit(1 << (i % 16))).otherwise(lit(0))
      }.reduce(_ + _).cast("int").as(s"c$k")
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
