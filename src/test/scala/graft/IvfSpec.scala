package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{LlmOps, Tables}

class IvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  def embedded = Tables.embeddings(spark, d)
    .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    .withColumn("nrm", LlmOps.norm(col("v")))

  def queries(e: org.apache.spark.sql.DataFrame) = e
    .filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))

  def bruteForce(e: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    queries(e).crossJoin(e.select(col("vec_id"), col("v").as("cv"), col("nrm").as("cn")))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_r", round(LlmOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos_r").desc, col("vec_id").asc)))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("rn"), col("vec_id").as("cand"), col("cos_r"))
  }

  test("full-probe IVF (nprobe=k) is exactly brute force") {
    val e = embedded
    val (assigned, centroids) = LlmOps.ivfAssign(e, k = 4)
    val ivf = LlmOps.ivfSearch(assigned, centroids, queries(e), topK = 5, nprobe = 4)
      .orderBy("qid", "rn").collect().toSeq
    val bf = bruteForce(e).orderBy("qid", "rn").collect().toSeq
    assert(ivf == bf)
  }

  test("partial probe returns valid ranked results with bounded candidates") {
    val e = embedded
    val (assigned, centroids) = LlmOps.ivfAssign(e, k = 8)
    val out = LlmOps.ivfSearch(assigned, centroids, queries(e), topK = 5, nprobe = 2)
    val perQ = out.groupBy("qid").count().collect()
    assert(perQ.forall(_.getLong(1) <= 5))
    // ranks are 1..n contiguous per query
    val ranks = out.orderBy("qid", "rn").collect()
      .groupBy(_.getLong(0)).values.map(_.map(_.getInt(1)).toSeq)
    assert(ranks.forall(r => r == (1 to r.size)))
  }

  test("assignment is deterministic under the fixed seed") {
    val e = embedded
    val a1 = LlmOps.ivfAssign(e, k = 4)._1.select("vec_id", "cell")
      .orderBy("vec_id").collect().toSeq
    val a2 = LlmOps.ivfAssign(e, k = 4)._1.select("vec_id", "cell")
      .orderBy("vec_id").collect().toSeq
    assert(a1 == a2)
  }
}
