package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{LlmOps, Tables}

/** Scratch driver: measure the IVF recall/nprobe curve at verify + bench
  * scale (the dial documentation behind IvfSpec's recall gates).
  * Run: sbt "Test/runMain graft.DriveIvfProbe" */
object DriveIvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", LlmOps.norm(col("v")))
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      val bf = q.crossJoin(e.select(col("vec_id"), col("v").as("cv"), col("nrm").as("cn")))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos_r", round(LlmOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cos_r").desc, col("vec_id").asc)))
        .filter(col("rn") <= 5).select(col("qid"), col("vec_id").as("cand"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (k <- Seq(8, 16); np <- Seq(2, 3, 4)) {
        val (assigned, centroids) = LlmOps.ivfAssign(e, k = k)
        val ivf = LlmOps.ivfSearch(assigned, centroids, q, topK = 5, nprobe = np)
          .select("qid", "cand").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"IVFPROBE $d k=$k nprobe=$np recall=${ivf.intersect(bf).size.toDouble / bf.size}%.3f of ${bf.size}")
      }
    }
    spark.stop()
  }
}
