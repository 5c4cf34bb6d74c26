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

  test("decode stub is deterministic") {
    val b = "same bytes".getBytes("UTF-8")
    assert(Multimodal.decodeStub(b).toSeq == Multimodal.decodeStub(b).toSeq)
    assert(Multimodal.decodeStub(null).toSeq == Seq.fill(8)(0.0))
  }
}
