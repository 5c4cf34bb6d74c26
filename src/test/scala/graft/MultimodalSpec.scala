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

  test("decode stub is deterministic") {
    val b = "same bytes".getBytes("UTF-8")
    assert(Multimodal.decodeStub(b).toSeq == Multimodal.decodeStub(b).toSeq)
    assert(Multimodal.decodeStub(null).toSeq == Seq.fill(8)(0.0))
  }
}
