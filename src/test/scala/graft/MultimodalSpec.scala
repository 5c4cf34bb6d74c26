package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def docs = Seq((1L, "hello"), (2L, "worlds!")).toDF("doc_id", "text")

  test("fromDocuments builds binary payload + typed metadata struct") {
    val m = Multimodal.fromDocuments(docs)
    assert(m.schema("payload").dataType.typeName == "binary")
    val meta = m.select($"meta.format").as[String].collect()
    assert(meta.forall(_ == "text/plain"))
  }

  test("extractFeatures: mapPartitions decode produces fixed-dim features") {
    val f = Multimodal.extractFeatures(Multimodal.fromDocuments(docs))
    val rows = f.orderBy("media_id")
      .as[(Long, Long, String, Seq[Double])].collect()
    assert(rows(0)._2 == 5L && rows(1)._2 == 7L) // byte lengths
    assert(rows.forall(_._4.length == 8))        // fixed feature dim
    // deterministic fake: histogram mass equals byte count
    assert(rows(0)._4.sum == 5.0 && rows(1)._4.sum == 7.0)
  }

  test("resize: exact target size, metadata updated, deterministic") {
    val r = Multimodal.resize(Multimodal.fromDocuments(docs), 4, 3)
    val rows = r.orderBy("media_id").collect()
    assert(rows.forall(_.getAs[Array[Byte]]("payload").length == 12))
    assert(rows.forall(_.getStruct(2).getInt(1) == 4))
    val again = Multimodal.resize(Multimodal.fromDocuments(docs), 4, 3)
      .orderBy("media_id").collect()
    assert(rows.map(_.getAs[Array[Byte]]("payload").toSeq).toSeq ==
      again.map(_.getAs[Array[Byte]]("payload").toSeq).toSeq)
  }

  test("frame sampling: every Nth fixed-size chunk, indexed") {
    // payload "worlds!" = 7 bytes, frames of 2 -> idx 0..3, everyN=2 -> 0,2
    val f = Multimodal.sampleFrames(Multimodal.fromDocuments(docs), 2, 2)
    val byDoc = f.collect().groupBy(_.getLong(0))
    assert(byDoc(2L).map(_.getInt(1)).sorted.toSeq == Seq(0, 2))
    assert(new String(byDoc(2L).minBy(_.getInt(1)).getAs[Array[Byte]]("frame")) == "wo")
  }

  test("frame sampling: trailing partial chunk is never emitted as a frame") {
    // "worlds!" = 7 bytes, frames of 2, everyN=1: chunk idx 3 is 1 byte
    // and must be dropped — every emitted frame is exactly frameBytes
    val f = Multimodal.sampleFrames(Multimodal.fromDocuments(docs), 2, 1)
    val frames = f.filter($"media_id" === 2L).collect()
    assert(frames.map(_.getInt(1)).sorted.toSeq == Seq(0, 1, 2))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 2))
  }

  test("frame sampling validates its arguments on the driver") {
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(Multimodal.fromDocuments(docs), 2, 0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(Multimodal.fromDocuments(docs), 0, 1)
    }
  }

  test("resize preserves missing payloads instead of faking a black image") {
    import org.apache.spark.sql.functions._
    val withNull = Multimodal.fromDocuments(docs)
      .withColumn("payload",
        when($"media_id" === 1L, lit(null).cast("binary")).otherwise($"payload"))
    val rows = Multimodal.resize(withNull, 4, 3).orderBy("media_id").collect()
    assert(rows(0).isNullAt(1), "null payload must stay null")
    assert(rows(1).getAs[Array[Byte]]("payload").length == 12)
  }

  test("byte-histogram fallback featurizer is deterministic") {
    val b = "same bytes".getBytes("UTF-8")
    assert(Multimodal.byteHistogram(b).toSeq == Multimodal.byteHistogram(b).toSeq)
    assert(Multimodal.byteHistogram(null).toSeq == Seq.fill(8)(0.0))
  }

  test("BMP roundtrip: encode then REAL ImageIO decode recovers exact pixels") {
    val id = 41L // w = 4 + 41%13 = 4+2 = 6, h = 3 + 41%7 = 3+6 = 9
    val img = Multimodal.decodeImage(Multimodal.encodeBmp(id))
      .getOrElse(fail("BMP did not decode"))
    assert(img.getWidth == 6 && img.getHeight == 9)
    // pixel (x,y): r = 41%200 + x, g = 41%180 + y, b = 41%120 + x + y
    def rgb(x: Int, y: Int) = {
      val p = img.getRGB(x, y)
      ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    }
    assert(rgb(0, 0) == ((41, 41, 41)))
    assert(rgb(5, 8) == ((46, 49, 54)))
    assert(rgb(3, 2) == ((44, 43, 46)))
  }

  test("direct BMP writer decodes pixel-identically to the ImageIO encoder") {
    // the fixture writer builds BMP bytes directly; this pins it against
    // the JVM's own encoder for a spread of ids covering every (w, h)
    // residue and the padding variants (w*3 % 4 = 0..3)
    for (id <- Seq(0L, 1L, 2L, 3L, 41L, 77L, 123456L, 999999L)) {
      val a = Multimodal.decodeImage(Multimodal.encodeBmp(id))
        .getOrElse(fail(s"direct BMP for id=$id did not decode"))
      val b = Multimodal.decodeImage(Multimodal.encodeBmpViaImageIO(id))
        .getOrElse(fail(s"ImageIO BMP for id=$id did not decode"))
      assert(a.getWidth == b.getWidth && a.getHeight == b.getHeight, s"id=$id dims")
      for (y <- 0 until a.getHeight; x <- 0 until a.getWidth)
        assert((a.getRGB(x, y) & 0xffffff) == (b.getRGB(x, y) & 0xffffff),
          s"id=$id pixel ($x,$y)")
    }
  }

  test("imageStats decodes real bytes and matches the closed-form sums") {
    val media = Multimodal.bmpFromDocuments(
      Seq((0L, "a"), (41L, "b"), (123456L, "c")).toDF("doc_id", "text"))
    val rows = Multimodal.imageStats(media).orderBy("media_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    def expect(id: Long) = {
      val w = 4 + (id % 13); val h = 3 + (id % 7)
      val (br, bg, bb) = (id % 200, id % 180, id % 120)
      (id, w, h, w * h,
        h * (w * br + w * (w - 1) / 2),
        w * (h * bg + h * (h - 1) / 2),
        w * h * bb + h * (w * (w - 1) / 2) + w * (h * (h - 1) / 2))
    }
    assert(rows.toSeq == Seq(expect(0L), expect(41L), expect(123456L)))
  }

  test("imageStats drops undecodable payloads instead of faking stats") {
    val mixed = Multimodal.fromDocuments(docs) // text/plain payloads
      .union(Multimodal.bmpFromDocuments(Seq((9L, "x")).toDF("doc_id", "text")))
    val rows = Multimodal.imageStats(mixed).select("media_id").as[Long].collect()
    assert(rows.toSeq == Seq(9L), "only the real image row survives")
  }

  test("extractFeatures: real decode for images, histogram fallback for opaque") {
    val media = Multimodal.bmpFromDocuments(Seq((41L, "x")).toDF("doc_id", "text"))
    val f = Multimodal.extractFeatures(media)
      .as[(Long, Long, String, Seq[Double])].collect().head
    assert(f._3 == "image/bmp")
    assert(f._4.take(2) == Seq(6.0, 9.0)) // real decoded dimensions
    // mean_r = (sum over x,y of 41+x) / 54 = 41 + (0+..+5)*9/54 = 43.5
    assert(math.abs(f._4(2) - 43.5) < 1e-12)
  }

  test("resize on a real image: nearest-neighbor resample, re-encoded BMP") {
    val media = Multimodal.bmpFromDocuments(Seq((41L, "x")).toDF("doc_id", "text"))
    val out = Multimodal.resize(media, 3, 3).collect().head
    val img = Multimodal.decodeImage(out.getAs[Array[Byte]]("payload"))
      .getOrElse(fail("resized payload is not a decodable BMP"))
    assert(img.getWidth == 3 && img.getHeight == 3)
    // nearest-neighbor from 6x9: dst(1,1) samples src(2,3) = (43, 44, 46)
    val p = img.getRGB(1, 1)
    assert((((p >> 16) & 0xff), ((p >> 8) & 0xff), (p & 0xff)) == ((43, 44, 46)))
    assert(out.getStruct(2).getInt(1) == 3 && out.getStruct(2).getInt(2) == 3)
  }
}
