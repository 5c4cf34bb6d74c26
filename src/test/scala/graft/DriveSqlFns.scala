package graft

/** Manual drive: native expressions through plain spark.sql on real data. */
object DriveSqlFns {
  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.native.registerAll(s)
    s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs")
    s.sql("""SELECT vec_id, round(graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
              CAST(embedding AS ARRAY<DOUBLE>)), 4) AS sq_norm
             FROM emb ORDER BY vec_id LIMIT 3""").show()
    s.sql("SELECT doc_id, min_rolling_hash(text, 8) AS fp FROM docs ORDER BY doc_id LIMIT 3").show()
    s.stop()
  }
}
