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
