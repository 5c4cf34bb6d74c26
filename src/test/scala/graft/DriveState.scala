package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Manual drive: runningUserTotals through a real AvailableNow stream. */
object DriveState {
  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    val events = graft.ops.Tables.events(s, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("ev").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ck").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = s.readStream.schema(s.read.parquet(dir).schema).parquet(dir)
    val q = graft.streaming.Streamy.runningUserTotals(stream).writeStream
      .format("memory").queryName("totals").outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    println("STATE_ROWS=" + s.table("totals").count())
    s.table("totals").orderBy(desc("n")).show(3)
    s.stop()
  }
}
