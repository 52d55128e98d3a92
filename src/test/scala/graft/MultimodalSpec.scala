package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "some fake image bytes"),
    (1L, "other fake image payload content")
  ).toDF("doc_id", "text")

  test("attachBinary produces opaque bytes preserving content") {
    val bin = Multimodal.attachBinary(docs, "doc_id", "text", "image/fake")
    assert(bin.schema("content").dataType.typeName == "binary")
    val bytes = bin.filter($"media_id" === 0).select($"content").as[Array[Byte]].collect()(0)
    assert(new String(bytes, "UTF-8") == "some fake image bytes")
  }

  test("decode stub runs partition-wise and is deterministic") {
    implicit val s = spark
    val decoded = Multimodal.decodeStub(
      Multimodal.attachBinary(docs, "doc_id", "text", "image/fake").repartition(3))
    val rows = decoded.collect().sortBy(_.media_id)
    assert(rows.length == 2)
    assert(rows(0).n_bytes == 21 && rows(0).digest.length == 64)
    val again = Multimodal.decodeStub(
      Multimodal.attachBinary(docs, "doc_id", "text", "image/fake")).collect().sortBy(_.media_id)
    assert(rows.toSeq == again.toSeq)
  }

  test("frame sampling explodes every Nth frame index") {
    implicit val s = spark
    val decoded = Multimodal.decodeStub(
      Multimodal.attachBinary(docs, "doc_id", "text", "image/fake"))
    val frames = Multimodal.sampleFrames(decoded, everyN = 3)
    val n0 = decoded.filter(_.media_id == 0).collect()(0).n_frames
    val got = frames.filter($"media_id" === 0).count()
    assert(got == (0 until n0 by 3).size)
  }

  test("PNG encode → ImageIO decode round-trips exact geometry and pixel sums") {
    implicit val s = spark
    val ids = Seq(0L, 1L, 12L, 255L, 256L, 1000L).toDF("doc_id")
    val stats = Multimodal.decodePngStats(
      Multimodal.encodePngs(ids.repartition(3), "doc_id"))
      .collect().map(p => p.media_id -> p).toMap
    ids.as[Long].collect().foreach { n =>
      val (w, h) = ((n % 13 + 4).toInt, (n % 7 + 3).toInt)
      val (r, g, b) = ((n % 256).toInt, (n * 7 % 256).toInt, (n * 13 % 256).toInt)
      val p = stats(n)
      assert(p.width == w && p.height == h, s"id=$n geometry: $p")
      // fill color everywhere except the channel-inverted (0,0) pixel
      assert(p.sum_r == r.toLong * (w * h - 1) + (255 - r), s"id=$n sum_r: $p")
      assert(p.sum_g == g.toLong * (w * h - 1) + (255 - g), s"id=$n sum_g: $p")
      assert(p.sum_b == b.toLong * (w * h - 1) + (255 - b), s"id=$n sum_b: $p")
    }
  }

  test("PNG decode fails loudly on undecodable bytes, never fabricates stats") {
    implicit val s = spark
    val junk = Seq((7L, "not a png".getBytes("UTF-8"))).toDF("media_id", "content")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodePngStats(junk).collect()
    }
    assert(e.getMessage != null)
  }

  // -------------------------------------------------- dHash pins

  /** Full codec-path dHash sketch for ids [0, n): encode → decode →
    * sample → chunk, the exact q254 pipeline. */
  private def dhashSketch(n: Int) = {
    implicit val s = spark
    val ids = spark.range(n).toDF("doc_id")
    val grid = Multimodal.sampleGrayGrid(
      Multimodal.encodeVariantPngs(ids.repartition(4), "doc_id"))
    grid.select($"media_id" +: Multimodal.dhashChunks($"grays"): _*)
  }

  test("dHash literal pin: hand-carried chunk values via the real codec") {
    // Literal expected chunks computed OUTSIDE the JVM (an independent
    // Python replay of the closed-form pixel arithmetic) — pins both the
    // codec round-trip and the bit packing, so a silent change to either
    // (sampling order, chunk endianness, luma rounding) fails here even
    // if Spark and the registered oracle drift together.
    val got = dhashSketch(6).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(got(0L) == ((27607, 43990, 54955, 54957)))
    assert(got(1L) == ((27607, 43990, 54955, 54957)))
    assert(got(2L) == ((26832, 43984, 54955, 54957)))
    assert(got(3L) == ((43577, 13625, 13739, 43829)))
    assert(got(5L) == ((43064, 13624, 13739, 43829)))
  }

  test("dHash brightness invariance: a monotone pixel map never flips a bit") {
    // THEOREM, not a formula mirror: dHash bit i is [p(x+1) > p(x)], and
    // v ↦ v+8 (no clipping — base tops out at 247) preserves every
    // comparison, so the p=1 variant of EVERY source must hash
    // identically to its pristine p=0 sibling.
    val h = dhashSketch(240).collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    (0 until 80).foreach { s =>
      assert(h(3L * s) == h(3L * s + 1), s"source $s: brightness shift flipped a bit")
    }
  }

  test("dHash local edit lands in the near-dup band, never at zero") {
    // The p=2 variant whites a 3×3 corner: a LOCAL edit must flip at
    // least one sampled comparison (the corner is always sampled — grid
    // position (0,0) reads pixel (0,0)) but stay within the 8-band
    // guarantee range d ≤ 7 on this fixture.
    def popcount(a: Seq[Int], b: Seq[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val h = dhashSketch(240).collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    (0 until 80).foreach { s =>
      val d = popcount(h(3L * s), h(3L * s + 2))
      assert(d >= 1 && d <= 7, s"source $s: p0-p2 distance $d outside [1,7]")
    }
  }

  test("Hamming-banded pairs == exact all-pairs on the fixture (pigeonhole recall)") {
    // Independent identity: the banded operator (8×8-bit band equi-join
    // + stop-bucket cap + verify) must equal the exact theta-join ground
    // truth computed here in the driver — d ≤ 7 < 8 bands means some
    // band agrees exactly, and no fixture bucket can overflow cap 200,
    // so the two constructions coincide EXACTLY, not approximately.
    val sk = dhashSketch(300)
    val rows = sk.collect().map(r =>
      r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    val exact = (for {
      (ia, ca) <- rows; (ib, cb) <- rows if ia < ib
      d = ca.zip(cb).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      if d <= 7
    } yield (ia, ib, d)).toSet
    val banded = graft.operators.Dedup
      .hammingBandedPairs(sk, "media_id", maxDist = 7, nBands = 8, maxBucket = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == exact, s"banded ${banded.size} vs exact ${exact.size}")
    assert(exact.nonEmpty)
  }

  test("stop-bucket cap drops overflowing buckets; pigeonhole bound is enforced") {
    // three identical sketches: every band bucket holds exactly 3
    // members, so maxBucket = 2 drops every bucket → zero candidates
    // even though all three pairs sit at Hamming distance 0
    val tri = Seq((1L, 7, 8, 9, 10), (2L, 7, 8, 9, 10), (3L, 7, 8, 9, 10))
      .toDF("media_id", "c0", "c1", "c2", "c3")
    assert(graft.operators.Dedup
      .hammingBandedPairs(tri, "media_id", maxDist = 7, nBands = 8, maxBucket = 2)
      .isEmpty)
    // d ≥ nBands has no recall guarantee — must refuse, not silently miss
    val sk = dhashSketch(60)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.hammingBandedPairs(sk, "media_id", maxDist = 8, nBands = 8)
    }
    assert(e.getMessage.contains("pigeonhole"))
    // maxBucket < 2 CANNOT emit a pair — the operator must refuse loudly
    // instead of silently reporting zero recall (round-14 ADVICE)
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Dedup.hammingBandedPairs(sk, "media_id", maxDist = 7,
        nBands = 8, maxBucket = 1)
    }
    assert(e2.getMessage.contains("maxBucket"))
  }

  test("banding refuses a NULL chunk loudly (silent pigeonhole void otherwise)") {
    // concat_ws SKIPS nulls, so grouped bands would value (null, 5) and
    // (5, null) identically; per-chunk bands drop the null band value
    // from the equi-join — either way recall silently degrades for that
    // sketch (round-16 advice) — the house convention is a raise
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString(" | ")
    val sk = Seq((1L, Some(3L), 4L, 5L, 6L), (2L, Option.empty[Long], 4L, 5L, 6L))
      .toDF("media_id", "c0", "c1", "c2", "c3")
    // grouped bands (2 chunks/band)
    val tG = intercept[Exception] {
      graft.operators.Dedup.hammingBandedPairsChunks(sk, "media_id",
        maxDist = 1, nChunks = 4, chunksPerBand = 2).collect()
    }
    assert(chain(tG).contains("NULL chunk"), chain(tG))
    // per-chunk bands
    val tP = intercept[Exception] {
      graft.operators.Dedup.hammingBandedPairsChunks(sk, "media_id",
        maxDist = 3, nChunks = 4).collect()
    }
    assert(chain(tP).contains("NULL chunk"), chain(tP))
    // the banded k-NN twin
    val tK = intercept[Exception] {
      graft.operators.Similarity.hammingTopKBanded(
        sk.filter($"media_id" === 1L), sk, "media_id",
        k = 1, radius = 3, nBands = 4, nChunks = 4).collect()
    }
    assert(chain(tK).contains("NULL chunk"), chain(tK))
  }

  test("fixture mixers match ideal unbounded arithmetic far past the old wrap point") {
    // The staged-modular forms (round-14 ADVICE) must equal the IDEAL
    // unbounded integer arithmetic — computed here through BigInt, which
    // cannot wrap — including deep in the regime where the unstaged
    // Long forms overflowed (variantGray past s ≈ 4.4e5, audioSample
    // past s ≈ 3.8e5; the ×100 replica's frame ids reach s ≈ 1.3e6).
    val M = BigInt(2147483648L)
    val bigS = Seq(0L, 439803L, 1300000L, 7L << 40, (1L << 50) - 1)
    for (s <- bigS; px <- Seq(0, 8); py <- Seq(0, 7)) {
      val ideal = ((((BigInt(s) * 7919 + px * 104729 + py * 130363)
        * BigInt(2654435761L)) mod M) >> 16) % 240
      val got = Multimodal.variantGray(s, 0, px, py)
      assert(got == ideal.toInt, s"variantGray(s=$s,$px,$py): $got vs $ideal")
      assert(got >= 0 && got <= 239, s"variantGray range: $got")
    }
    for (s <- bigS; i <- Seq(0, 100, 1559)) {
      val v = BigInt(s) * 7919 + i * 104729 + 12345
      val ideal = (((v * v + 3 * v) mod M) >> 12) % 4096 - 2048
      val got = Multimodal.audioSample(s, 0, i)
      assert(got == ideal.toInt, s"audioSample(s=$s,$i): $got vs $ideal")
      assert(got >= -2048 && got <= 2047, s"audioSample range: $got")
    }
    // the residual s*7919 envelope is pinned loudly at 2^50
    val eg = intercept[IllegalArgumentException] {
      Multimodal.variantGray(1L << 50, 0, 0, 0)
    }
    assert(eg.getMessage.contains("2^50"))
    val ea = intercept[IllegalArgumentException] {
      Multimodal.audioSample(1L << 50, 0, 0)
    }
    assert(ea.getMessage.contains("2^50"))
  }

  // ------------------------------------------- 256-bit dHash pins

  /** Full codec-path 256-bit sketch for ids [0, n): wide 20×18-base
    * fixture, 17×16 sample grid, 16 chunk columns — the q266 pipeline. */
  private def dhash256Sketch(n: Int) = {
    implicit val s = spark
    val ids = spark.range(n).toDF("doc_id")
    val grid = Multimodal.sampleGrayGrid(
      Multimodal.encodeVariantPngs(ids.repartition(4), "doc_id",
        wBase = 20, hBase = 18), gw = 17, gh = 16)
    grid.select($"media_id" +: Multimodal.dhashChunksGrid($"grays", 17, 16): _*)
  }

  test("256-bit dHash: banded pairs == exact all-pairs at d<=15; edits inside the recovered band") {
    // The wide-SKETCH completion of the density story: the generalized
    // 16-chunk banding must equal the exact theta-join ground truth at
    // the full d <= 15 pigeonhole range, and the fixture's p=2 edits
    // must land INSIDE it (measured 4..8 on this hash) — i.e. inside
    // the band the 64-bit wide regime (q261, d <= 3) surrenders.
    val sk = dhash256Sketch(120)
    val rows = sk.collect().map(r =>
      r.getLong(0) -> (1 to 16).map(r.getInt))
    def dist(a: Seq[Int], b: Seq[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val exact = (for {
      (ia, ca) <- rows; (ib, cb) <- rows if ia < ib
      d = dist(ca, cb) if d <= 15
    } yield (ia, ib, d)).toSet
    val banded = graft.operators.Dedup
      .hammingBandedPairsChunks(sk, "media_id", maxDist = 15, nChunks = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == exact, s"banded ${banded.size} vs exact ${exact.size}")
    val h = rows.toMap
    (0 until 40).foreach { s =>
      assert(dist(h(3L * s), h(3L * s + 1)) == 0,
        s"source $s: 256-bit hash must be brightness-invariant")
      val d2 = dist(h(3L * s), h(3L * s + 2))
      assert(d2 >= 1 && d2 <= 15,
        s"source $s: p2 edit must land inside the d<=15 band, got $d2")
    }
    // every p=1 twin pair must therefore be IN the banded result
    (0 until 40).foreach { s =>
      assert(banded.contains((3L * s, 3L * s + 1, 0)),
        s"source $s: twin pair missing from banded output")
    }
    // guard parity with the 4-chunk operator
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.hammingBandedPairsChunks(sk, "media_id",
        maxDist = 16, nChunks = 16)
    }
    assert(e.getMessage.contains("pigeonhole"))
    // grouped banding (round-16): 8 bands of 2 chunks must equal the
    // exact theta-join filtered to its d <= 7 per-GROUP pigeonhole
    val grouped = graft.operators.Dedup
      .hammingBandedPairsChunks(sk, "media_id", maxDist = 7, nChunks = 16,
        chunksPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(grouped == exact.filter(_._3 <= 7),
      s"grouped ${grouped.size} vs exact-within-7 ${exact.count(_._3 <= 7)}")
    // a non-divisor grouping must refuse loudly
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Dedup.hammingBandedPairsChunks(sk, "media_id",
        maxDist = 4, nChunks = 16, chunksPerBand = 3)
    }
    assert(e2.getMessage.contains("must divide"))
    // grouping everything into one band leaves no pigeonhole
    val e3 = intercept[IllegalArgumentException] {
      graft.operators.Dedup.hammingBandedPairsChunks(sk, "media_id",
        maxDist = 0, nChunks = 16, chunksPerBand = 16)
    }
    assert(e3.getMessage.contains("fewer than 2 bands"))
  }

  // --------------------------------------- spectral fingerprint pins

  test("spectral fingerprint separates the edit the energy fingerprint confuses") {
    // The round-14 verdict #5 discrimination, pinned on the REAL codec
    // path: the spectral fixture's p=2 variant sorts each frame's
    // samples — a permutation preserves every frame energy EXACTLY
    // (Parseval), so the ENERGY hash must sit at distance 0 (confused:
    // it would merge spectrally different content), while the quarter-
    // wave band powers change and the SPECTRAL hash must separate it
    // far beyond any near-dup threshold. The p=1 gain variant stays at
    // distance 0 for BOTH — linear gain scales every energy ×4 and
    // every DFT power ×4, preserving all comparisons by theorem.
    implicit val s = spark
    val ids = (0L until 30L).toDF("doc_id")
    val wavs = Multimodal.encodeSpectralWavs(ids, "doc_id").localCheckpoint()
    def hashes(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Int]] =
      df.collect().map(r => r.getLong(0) ->
        Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val spec = Multimodal.decodeFrameSpectra(wavs)
    val sh = hashes(spec.select($"media_id" +:
      Multimodal.spectralHashChunks($"p6", $"p12"): _*))
    val en = Multimodal.decodeFrameEnergies(wavs)
    val eh = hashes(en.select($"media_id" +:
      Multimodal.adjacentHashChunks($"energies"): _*))
    def d(a: Seq[Int], b: Seq[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    (0 until 10).foreach { src =>
      val (p0, p1, p2) = (3L * src, 3L * src + 1, 3L * src + 2)
      assert(d(eh(p0), eh(p1)) == 0, s"source $src: energy hash must be gain-invariant")
      assert(d(sh(p0), sh(p1)) == 0, s"source $src: spectral hash must be gain-invariant")
      assert(d(eh(p0), eh(p2)) == 0,
        s"source $src: the sorted frame is energy-IDENTICAL — " +
          s"a nonzero distance means the fixture's permutation leaked into energies")
      val ds = d(sh(p0), sh(p2))
      assert(ds >= 8, s"source $src: spectral hash must separate the sorted " +
        s"frame far beyond any near-dup threshold, got $ds")
    }
  }

  // -------------------------------------------------- WAV fingerprint pins

  /** Full codec-path audio fingerprint for ids [0, n): WAV encode →
    * RIFF parse → frame energies → chunks, the exact q258 pipeline. */
  private def wavSketch(n: Int) = {
    implicit val s = spark
    val ids = spark.range(n).toDF("doc_id")
    val en = Multimodal.decodeFrameEnergies(
      Multimodal.encodeVariantWavs(ids.repartition(4), "doc_id"))
    en.select($"media_id" +: Multimodal.adjacentHashChunks($"energies"): _*)
  }

  test("WAV fingerprint literal pin via the real codec") {
    // Expected chunks computed outside the JVM (independent Python
    // replay of the closed-form PCM arithmetic) — pins the RIFF
    // round-trip, the little-endian int16 decode, the frame-energy
    // fold, and the bit packing together.
    val got = wavSketch(3).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(got(0L) == ((18674, 9107, 37015, 25521)))
    assert(got(1L) == ((18674, 9107, 37015, 25521)))
  }

  test("audio gain invariance: a linear amplitude map never flips a bit") {
    // THEOREM: fingerprint bit f is [E(f+1) > E(f)] and amplitude ×2
    // scales every frame energy by exactly 4 (no clipping — samples
    // stay inside int16), preserving every comparison; so the p=1 gain
    // variant of EVERY source must fingerprint identically to p=0.
    val h = wavSketch(240).collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    (0 until 80).foreach { s =>
      assert(h(3L * s) == h(3L * s + 1), s"source $s: gain flipped a bit")
    }
  }

  test("audio burst edit stays inside the near-dup band; some bursts flip bits") {
    def popcount(a: Seq[Int], b: Seq[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val h = wavSketch(240).collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val ds = (0 until 80).map(s => popcount(h(3L * s), h(3L * s + 2)))
    // a 3-frame burst only touches comparisons at frames 0..3, so the
    // distance is structurally ≤ 4 — and unlike the image block it CAN
    // be invisible (the burst's forced comparison pattern may match the
    // base), so the pin is the band plus a nonzero flip count overall
    assert(ds.forall(d => d >= 0 && d <= 4), s"burst distances escaped [0,4]: $ds")
    assert(ds.count(_ > 0) > 40, s"fixture sanity: most bursts should flip bits, got ${ds.count(_ > 0)}")
  }

  test("chunk-walk WAV parser == platform codec, both directions") {
    // The decode hot path is the lock-free chunk walker (the platform
    // reader serializes under executor threads — see parseWavPcm's
    // doc); this pins it byte-for-byte against the REAL codec: PCM
    // parsed from platform-writer files must equal what
    // AudioSystem.getAudioInputStream extracts from the same bytes.
    implicit val s = spark
    val wavs = Multimodal.encodeVariantWavs(
      spark.range(60).toDF("doc_id"), "doc_id")
      .as[(Long, Array[Byte])].collect()
    wavs.foreach { case (mid, bytes) =>
      val (rate, pcm) = Multimodal.parseWavPcm(bytes)
      assert(rate == 8000, s"id=$mid rate $rate")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian)
      val ref = ais.readAllBytes()
      assert(java.util.Arrays.equals(pcm, ref),
        s"id=$mid: chunk-walk PCM diverged from the platform reader")
    }
  }

  test("video near-dup: clip and brightness variants land at their theorem Jaccards") {
    // The q260 composition on the spec fixture dir: for every complete
    // video triple, the brightness-edited sibling (p=2, frame-0 dHash
    // invariant) must sit at Jaccard EXACTLY 1.0 with its source, and
    // the clipped sibling (p=1, one of four sampled frames gone) at
    // EXACTLY 0.75 — literal values forced by the invariance theorem
    // and the sample arithmetic, not read off the implementation.
    val jac = graft.queries.Registry.queries("q260_video_neardup")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // sources with all three variants present in the fixture
    val complete = (0 until 160).filter(s =>
      jac.contains((3L * s, 3L * s + 1)) && jac.contains((3L * s, 3L * s + 2)))
    assert(complete.size > 100, s"fixture sanity: ${complete.size} complete triples")
    complete.foreach { s =>
      assert(jac((3L * s, 3L * s + 2)) == 1.0,
        s"source $s: brightness edit must be Jaccard 1.0")
      assert(jac((3L * s, 3L * s + 1)) == 0.75,
        s"source $s: one clipped frame of four must be Jaccard 0.75")
    }
  }

  test("WAV decode fails loudly on junk bytes and on geometry drift") {
    implicit val s = spark
    val junk = Seq((7L, "not a wav".getBytes("UTF-8"))).toDF("media_id", "content")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFrameEnergies(junk).collect()
    }
    // a clip with the wrong sample count must refuse, not mis-frame
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFrameEnergies(
        Multimodal.encodeVariantWavs(Seq(1L).toDF("doc_id"), "doc_id"),
        frameLen = 24, nFrames = 64).collect()
    }
  }

  test("resize plan preserves aspect ratio and caps the long side") {
    implicit val s = spark
    val decoded = Multimodal.decodeStub(
      Multimodal.attachBinary(docs, "doc_id", "text", "image/fake")).toDF()
    val planned = Multimodal.resizePlan(decoded, maxSide = 100)
    planned.select($"width", $"height", $"target_w", $"target_h").collect().foreach { r =>
      assert(r.getInt(2) <= 100 && r.getInt(3) <= 100)
    }
  }
}
