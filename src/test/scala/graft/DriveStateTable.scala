package graft

import org.apache.spark.sql.functions._
import graft.ops.{Queue, StateTable, Tables}

/** Manual drive: persistent queue state over real orders data. */
object DriveStateTable {
  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    val t = new StateTable(s,
      java.nio.file.Files.createTempDirectory("qstate").toString, Seq("id"))
    val q = Tables.orders(s, "/root/testdata/sf0.001").select(
      col("o_orderkey").as("id"),
      when(col("o_orderstatus") === "O", 0).otherwise(1).as("status"),
      (lit(6) - substring(col("o_orderpriority"), 1, 1).cast("int")).as("priority"),
      unix_timestamp(col("o_orderdate")).as("submit_time"))
    t.upsert(q)                                     // initial enqueue
    t.upsert(q.withColumn("status", lit(0)))        // re-enqueue: must not clobber
    val head = Queue.poll(t.read().get, 0, 3).collect()
    println("VERSIONS=" + t.versions.mkString(","))
    println("HEAD=" + head.map(_.getLong(0)).mkString(","))
    t.update(df => df.withColumn("status",
      when(col("id") === head.head.getLong(0), 2).otherwise(col("status"))))
    println("PROCESSING=" + t.read().get.filter(col("status") === 2).count())
    s.stop()
  }
}
