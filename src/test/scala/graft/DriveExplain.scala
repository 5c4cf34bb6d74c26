package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: print a registered query's formatted physical plan —
  * the `.explain("formatted")` iteration loop the build guidance asks
  * for, runnable per query name without a console session. */
object DriveExplain {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "merge_wide"
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(q)(s, d)
    df.explain("formatted")
    println("ROWS=" + df.count())
    s.stop()
  }
}
