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
