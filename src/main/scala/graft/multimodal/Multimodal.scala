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

  /** Executor-side ImageIO config, applied once per codec partition:
    * the platform DEFAULT wraps every `ImageIO.read`/`write` in a
    * disk-backed cache stream — one temp-file create/write/delete per
    * image under java.io.tmpdir, even when both ends are in-memory
    * byte arrays. At executor concurrency that turns the pure-memory
    * codec path into small-file I/O whose cost tracks tmp-filesystem
    * aging (measured on this box: q254's 5k-image pass degraded
    * 0.97 → ~3.5 s between rounds with no code change on the path;
    * cache off restores the memory path). Static JVM flag, idempotent
    * — called at every codec `mapPartitions` entry so executors get
    * it no matter which operator runs first. */
  private def imageCodecInit(): Unit = javax.imageio.ImageIO.setUseCache(false)

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
      imageCodecInit()
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
        imageCodecInit()
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
    * non-negative Long — exactly replayable in DuckDB BIGINT CTEs.
    * The Knuth multiply is STAGED MODULAR: the affine mix is reduced
    * mod 2³¹ BEFORE the 2654435761 multiply, so every intermediate
    * stays < 2⁶³ (the product of a < 2³¹ residue and a < 2³² constant)
    * and the value equals the ideal unbounded arithmetic for every
    * admissible s — the unstaged form silently wrapped past
    * s ≈ 4.4×10⁵ (Int64 overflow on s·7919·2654435761), breaking the
    * non-negativity and DuckDB-replay claims exactly where the ×100
    * replica's frame ids live (round-14 ADVICE). The residual envelope
    * (s·7919 itself) is pinned loudly at s < 2⁵⁰. */
  def variantGray(s: Long, p: Long, px: Int, py: Int): Int = {
    require(s >= 0 && s < (1L << 50),
      s"variantGray source id $s outside [0, 2^50): s*7919 would overflow Int64")
    if (p == 2 && px < 3 && py < 3) 255
    else {
      val m = (s * 7919L + px * 104729L + py * 130363L) % 2147483648L
      val v = m * 2654435761L
      (((v % 2147483648L) >> 16) % 240 + (if (p == 1) 8 else 0)).toInt
    }
  }

  /** Variant-PNG fixture encoder: for each id, source s = id/3 and
    * variant p = id%3 select a (s%6+wBase) × (s%5+hBase) grayscale
    * image via
    * [[variantGray]], encoded with the REAL `javax.imageio` PNG codec on
    * the executors (r=g=b, so integer luma recovers the gray exactly).
    * Same partition-wise batch shape as [[encodePngs]]: one encoder
    * context per partition, no shuffle. The image COUNT tracks the
    * input row count — replicating the corpus ×k yields ×k images, so
    * the scale sweep measures a genuinely data-proportional workload.
    * The default (12×10 base) feeds the 9×8 dHash-64 family; the wide
    * 256-bit family (q266) uses 20×18 so every image covers its 17×16
    * sample grid. */
  def encodeVariantPngs(df: DataFrame, id: String, wBase: Int = 12,
                        hBase: Int = 10)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // spread BEFORE the per-row codec work: a single-file parquet scan
    // (or an AQE-coalesced advisory repartition) would otherwise feed
    // the whole corpus to one encoder thread (the q246/q42 lesson)
    graft.operators.Relational.spread(df.select(col(id).cast("long").as(id)), col(id))
      .as[Long].mapPartitions { ids =>
      imageCodecInit()
      ids.map { mid =>
        val (s, p) = (mid / 3, mid % 3)
        val w = (s % 6 + wBase).toInt
        val h = (s % 5 + hBase).toInt
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
        imageCodecInit()
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

  /** [[dhashChunks]] generalized to any sample grid: bit i (row-major,
    * gw−1 horizontal comparisons per row × gh rows) is
    * [grid(y, x+1) > grid(y, x)], packed into ⌈(gw−1)·gh / 16⌉ 16-bit
    * chunk columns c0..cN — the house sketch shape at any width. The
    * 17×16 grid yields the 256-bit dHash (16 chunks) that recovers the
    * d ≤ 15 recall range at corpus density: 16 bands of 16 bits keep
    * bucket occupancy sparse (the q261 argument) while the pigeonhole
    * guarantee d < nChunks now COVERS the full perceptual edit band the
    * 64-bit hash's wide regime had to surrender (d ≤ 3). Still a pure
    * codegen'd expression tree — (gw−1)·gh when() terms, no UDF. */
  def dhashChunksGrid(grays: Column, gw: Int, gh: Int): Seq[Column] = {
    val bits = (gw - 1) * gh
    require(bits % 16 == 0, s"grid ${gw}x$gh: ${bits} comparison bits not 16-aligned")
    (0 until bits / 16).map { k =>
      (16 * k until 16 * k + 16).map { i =>
        val (y, x) = (i / (gw - 1), i % (gw - 1))
        when(element_at(grays, y * gw + x + 2) > element_at(grays, y * gw + x + 1),
          lit(1 << (i % 16))).otherwise(lit(0))
      }.reduce(_ + _).cast("int").as(s"c$k")
    }
  }

  // ------------------------------------------------------------------
  // Audio fingerprinting — the dedup family's second real-codec modality.
  // ------------------------------------------------------------------

  /** Deterministic 16-bit PCM sample for the variant-WAV fixture: source
    * `s` draws a QUADRATIC congruential texture (v² mixing — an
    * arithmetic-progression mixer leaves frame energies slowly-varying
    * and collapses cross-source Hamming distances, measured before this
    * form was chosen), variant `p` perturbs it perceptually: p=0
    * pristine; p=1 amplitude ×2 (a linear gain, which the energy-
    * comparison fingerprint is invariant to BY THEOREM — every frame
    * energy scales by exactly 4, preserving every comparison); p=2 a
    * 3-frame constant burst at the start (a local edit). Samples stay
    * in [−4096, 4094] ⊂ int16, so the gain never clips. All arithmetic
    * is non-negative-modulus Long — exactly replayable in DuckDB.
    * The quadratic mix is STAGED MODULAR like [[variantGray]]'s: the
    * affine seed is reduced mod 2³¹ before squaring (v ≡ v₀ mod 2³¹ ⇒
    * v²+3v ≡ v₀²+3v₀ mod 2³¹, and the reduced square stays < 2⁶²), so
    * the value equals the ideal unbounded arithmetic for every
    * admissible s — the unstaged v₀² wrapped past s ≈ 3.8×10⁵, only
    * ~7× above the ×100 replica's id range (round-14 ADVICE). The
    * residual envelope (s·7919) is pinned loudly at s < 2⁵⁰. */
  def audioSample(s: Long, p: Long, i: Int): Int = {
    require(s >= 0 && s < (1L << 50),
      s"audioSample source id $s outside [0, 2^50): s*7919 would overflow Int64")
    if (p == 2 && i < 72) 2047
    else {
      val v = (s * 7919L + i * 104729L + 12345L) % 2147483648L
      val b = ((((v * v + 3 * v) % 2147483648L) >> 12) % 4096 - 2048).toInt
      if (p == 1) b * 2 else b
    }
  }

  /** Variant-WAV fixture encoder: for each id, source s = id/3 and
    * variant p = id%3 select a 65-frame × 24-sample mono 16-bit PCM
    * clip via [[audioSample]], encoded with the REAL `javax.sound`
    * WAV codec on the executors (AudioSystem.write emits the RIFF
    * container; pure JVM). Partition-wise batch shape, image-encoder
    * discipline ([[encodeVariantPngs]]). */
  def encodeVariantWavs(df: DataFrame, id: String)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.operators.Relational.spread(df.select(col(id).cast("long").as(id)), col(id))
      .as[Long].mapPartitions { ids =>
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        // resolve the platform WAVE writer ONCE per partition: the
        // `AudioSystem.write` convenience path re-runs the provider
        // lookup per call behind a shared lock, which under 32 executor
        // threads serialized the whole encode (measured 1.65 s for 5k
        // clips vs 0.43 s single-threaded — anti-scaling); the SPI
        // handle is the same codec without the per-call registry trip
        val writer: javax.sound.sampled.spi.AudioFileWriter = {
          val it = java.util.ServiceLoader
            .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
          var w: javax.sound.sampled.spi.AudioFileWriter = null
          while (it.hasNext && w == null) {
            val c = it.next()
            if (c.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
              w = c
          }
          require(w != null, "no WAVE AudioFileWriter provider on this JVM")
          w
        }
        ids.map { mid =>
          val (s, p) = (mid / 3, mid % 3)
          val n = 65 * 24
          val bytes = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = audioSample(s, p, i)
            bytes(2 * i) = (v & 0xff).toByte
            bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (mid, bos.toByteArray)
        }
      }.toDF("media_id", "content")
  }

  /** Chunk-walking RIFF/WAVE parser: validates the container tags,
    * walks word-aligned chunks to `fmt ` (mono 16-bit LE PCM required,
    * loudly) and `data`, and returns (sampleRate, pcmBytes). This is
    * the decode hot path INSTEAD of `AudioSystem.getAudioInputStream`
    * because the platform reader serializes on its provider registry:
    * measured 0.31 s single-threaded but 0.90 s across 32 threads for
    * 5k clips (3× ANTI-scaling) vs 0.11 s for this parser — at
    * executor thread counts the lock dominates the work. The platform
    * codec is not abandoned: the encoder above IS the platform writer,
    * and MultimodalSpec cross-validates this parser byte-for-byte
    * against `AudioSystem`'s reader on the same files (both
    * directions: platform-written → here, and the canonical header →
    * platform reader). */
  def parseWavPcm(bytes: Array[Byte]): (Int, Array[Byte]) = {
    def le32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def le16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"not a RIFF/WAVE container (${bytes.length} bytes)")
    var off = 12
    var rate = -1
    var fmtOk = false
    var pcm: Array[Byte] = null
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val sz = le32(off + 4)
      require(sz >= 0 && off + 8 + sz <= bytes.length, s"truncated $id chunk")
      if (id == "fmt ") {
        require(le16(off + 8) == 1, "not integer PCM")
        require(le16(off + 10) == 1, "not mono")
        rate = le32(off + 12)
        require(le16(off + 22) == 16, "not 16-bit")
        fmtOk = true
      } else if (id == "data") {
        pcm = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + sz)
      }
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    require(fmtOk && pcm != null, "missing fmt /data chunk")
    (rate, pcm)
  }

  /** Decode a WAV binary column back to per-frame ENERGIES (sum of
    * sample squares over `frameLen`-sample frames) — the codec-slot
    * half of the audio fingerprint, mirroring [[sampleGrayGrid]]. The
    * hot-path container parse is [[parseWavPcm]], NOT the platform
    * reader (which serializes on its provider registry — measured
    * numbers in that method's doc); the REAL platform codec still
    * participates on the ENCODE side ([[encodeVariantWavs]] writes
    * through the JDK's WAVE writer) and MultimodalSpec cross-validates
    * the parser byte-for-byte against `AudioSystem`'s reader. PCM
    * geometry is validated loudly, and the emitted energy array is
    * small and integral so the HASH half stays a pure codegen'd
    * expression and an external oracle can replay it exactly (energies
    * of int16 samples fit comfortably in long: 24 · 4094² < 2³¹). */
  def decodeFrameEnergies(binary: DataFrame, frameLen: Int = 24,
                          nFrames: Int = 65)
                         (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    binary.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (mid, bytes) =>
          // lock-free chunk-walking parse — see [[parseWavPcm]] for the
          // measured platform-reader anti-scaling that motivates it
          val data = try parseWavPcm(bytes)._2 catch {
            case e: IllegalArgumentException =>
              throw new IllegalArgumentException(s"media_id=$mid: ${e.getMessage}")
          }
          require(data.length == frameLen * nFrames * 2,
            s"media_id=$mid: ${data.length} PCM bytes, " +
              s"expected ${frameLen * nFrames * 2}")
          val energies = new Array[Long](nFrames)
          var f = 0
          while (f < nFrames) {
            var e = 0L
            var j = 0
            while (j < frameLen) {
              val i = f * frameLen + j
              val v = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
              e += v * v
              j += 1
            }
            energies(f) = e
            f += 1
          }
          (mid, energies)
        }
      }.toDF("media_id", "energies")
  }

  /** 64-bit adjacent-comparison hash over any numeric array column, as
    * the house 4×16-bit chunks: bit i is [arr(i+1) > arr(i)] (0-based).
    * The audio fingerprint applies it to frame energies (invariant to
    * any monotone per-sample gain); the same shape serves any ordered
    * feature sequence. Pure codegen'd 64-term expression tree, like
    * [[dhashChunks]]. */
  def adjacentHashChunks(arr: Column): Seq[Column] =
    (0 until 4).map { k =>
      (16 * k until 16 * k + 16).map { i =>
        when(element_at(arr, i + 2) > element_at(arr, i + 1),
          lit(1 << (i % 16))).otherwise(lit(0))
      }.reduce(_ + _).cast("int").as(s"c$k")
    }

  // ------------------------------------------------------------------
  // Spectral audio fingerprint — the frequency-domain upgrade of the
  // energy hash (round-14 verdict #5): frame ENERGY is blind to any
  // energy-preserving edit (Parseval: a within-frame sample PERMUTATION
  // keeps Σx² exactly), so the energy fingerprint calls spectrally
  // different content a duplicate. Per-frame band POWERS at fixed DFT
  // bins discriminate exactly there — the integer-arithmetic analogue
  // of a chromaprint's band energies (Haitsma & Kalker, "A Highly
  // Robust Audio Fingerprint System", ISMIR 2002).
  // ------------------------------------------------------------------

  /** Variant-WAV fixture encoder for the SPECTRAL fingerprint: for each
    * id, source s = id/3 and variant p = id%3 select a 65-frame ×
    * 24-sample clip of [[audioSample]]'s pristine (p=0) texture, with
    * p=1 amplitude ×2 (a linear gain — invariant for BOTH fingerprints
    * by theorem: energies scale ×4, every DFT coefficient ×2, so every
    * power comparison is preserved) and p=2 each frame's samples SORTED
    * ascending (the discriminating edit: a permutation preserves every
    * frame energy EXACTLY — the energy hash sees distance 0 — while the
    * quarter-wave band powers change completely; measured spectral
    * distances 28–41 vs cross-source mean ~33). Encoded through the
    * REAL platform WAV writer like [[encodeVariantWavs]]. */
  def encodeSpectralWavs(df: DataFrame, id: String)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.operators.Relational.spread(df.select(col(id).cast("long").as(id)), col(id))
      .as[Long].mapPartitions { ids =>
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val writer: javax.sound.sampled.spi.AudioFileWriter = {
          val it = java.util.ServiceLoader
            .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
          var w: javax.sound.sampled.spi.AudioFileWriter = null
          while (it.hasNext && w == null) {
            val c = it.next()
            if (c.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
              w = c
          }
          require(w != null, "no WAVE AudioFileWriter provider on this JVM")
          w
        }
        ids.map { mid =>
          val (s, p) = (mid / 3, mid % 3)
          val n = 65 * 24
          val pristine = Array.tabulate(n)(i => audioSample(s, 0, i))
          val xs = p match {
            case 0L => pristine
            case 1L => pristine.map(_ * 2) // ±4096 still fits int16
            case _ => // frame-local ascending sort: energy-invariant
              val out = new Array[Int](n)
              var f = 0
              while (f < 65) {
                val fr = java.util.Arrays.copyOfRange(pristine, f * 24, f * 24 + 24)
                java.util.Arrays.sort(fr)
                System.arraycopy(fr, 0, out, f * 24, 24)
                f += 1
              }
              out
          }
          val bytes = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            bytes(2 * i) = (xs(i) & 0xff).toByte
            bytes(2 * i + 1) = ((xs(i) >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (mid, bos.toByteArray)
        }
      }.toDF("media_id", "content")
  }

  /** Decode a WAV binary column to per-frame BAND POWERS at the two
    * exactly-integer DFT bins of a 24-sample frame — the codec-slot
    * half of the spectral fingerprint, mirroring [[decodeFrameEnergies]]
    * (same lock-free [[parseWavPcm]] hot path, same loud geometry
    * validation). Bin k=6 (quarter wave: phase πj/2 walks the pattern
    * cos ∈ {1,0,−1,0}, sin ∈ {0,1,0,−1}) and bin k=12 (Nyquist:
    * cos = (−1)^j) are the ONLY nontrivial bins of N=24 whose
    * coefficients are exact integers, so the powers re² + im² are
    * exact Longs an external oracle replays digit-for-digit — the
    * integer-Goertzel discipline without a single float. Emits
    * (media_id, p6: array<long>, p12: array<long>); sizes are bounded
    * (|re| ≤ 12·4096 ⇒ power ≤ ~4.8×10⁹ ≪ 2⁶³). */
  def decodeFrameSpectra(binary: DataFrame, frameLen: Int = 24,
                         nFrames: Int = 65)
                        (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(frameLen % 4 == 0, s"frameLen=$frameLen: quarter-wave bins need a multiple of 4")
    binary.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (mid, bytes) =>
          val data = try parseWavPcm(bytes)._2 catch {
            case e: IllegalArgumentException =>
              throw new IllegalArgumentException(s"media_id=$mid: ${e.getMessage}")
          }
          require(data.length == frameLen * nFrames * 2,
            s"media_id=$mid: ${data.length} PCM bytes, " +
              s"expected ${frameLen * nFrames * 2}")
          val p6 = new Array[Long](nFrames)
          val p12 = new Array[Long](nFrames)
          var f = 0
          while (f < nFrames) {
            var (re6, im6, re12) = (0L, 0L, 0L)
            var j = 0
            while (j < frameLen) {
              val i = f * frameLen + j
              val v = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
              (j % 4: @unchecked) match {
                case 0 => re6 += v
                case 1 => im6 += v
                case 2 => re6 -= v
                case 3 => im6 -= v
              }
              if (j % 2 == 0) re12 += v else re12 -= v
              j += 1
            }
            p6(f) = re6 * re6 + im6 * im6
            p12(f) = re12 * re12
            f += 1
          }
          (mid, p6, p12)
        }
      }.toDF("media_id", "p6", "p12")
  }

  /** Combined 64-bit spectral hash from the two band-power arrays, in
    * the house 4×16-bit chunk shape: bits 0..31 (c0, c1) compare
    * adjacent bin-6 powers over frames 0..32, bits 32..63 (c2, c3)
    * compare adjacent bin-12 powers over frames 32..64 — both bands
    * contribute, every frame participates in one of them, and each bit
    * is the [[adjacentHashChunks]] comparison on its band (gain-
    * invariant per band by theorem). Pure codegen'd 64-term expression
    * tree like [[dhashChunks]]. */
  def spectralHashChunks(p6: Column, p12: Column): Seq[Column] =
    (0 until 4).map { k =>
      val src = if (k < 2) p6 else p12
      (16 * k until 16 * k + 16).map { i =>
        when(element_at(src, i + 2) > element_at(src, i + 1),
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
