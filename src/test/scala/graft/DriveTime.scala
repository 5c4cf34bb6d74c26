package graft

import org.apache.spark.sql.functions.{col, xxhash64, expr}

/** Manual drive: warm + time named queries with the bench's hash action. */
object DriveTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    def run(n: String): Unit = {
      val df = SparkEntry.queries(n)(s, sfDir)
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).head(): Unit
    }
    names.foreach(run) // warm
    names.foreach { n =>
      val t0 = System.nanoTime(); run(n)
      println(f"timed $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    s.stop()
  }
}
