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
    val sk = dhashSketch(60)
    // every band bucket holds ≥ 2 members (each p0/p1 twin shares all 8
    // bands), so maxBucket = 1 drops every bucket → zero candidates
    assert(graft.operators.Dedup
      .hammingBandedPairs(sk, "media_id", maxDist = 7, nBands = 8, maxBucket = 1)
      .isEmpty)
    // d ≥ nBands has no recall guarantee — must refuse, not silently miss
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.hammingBandedPairs(sk, "media_id", maxDist = 8, nBands = 8)
    }
    assert(e.getMessage.contains("pigeonhole"))
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
