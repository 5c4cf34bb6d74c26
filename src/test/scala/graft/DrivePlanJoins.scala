package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: print the join/exchange skeleton of named queries' final
  * plans — the quick audit tool for estimate-driven join strategies (see
  * SCALE.md's LogicalRDD-stats lesson).
  * Usage: Test/runMain graft.DrivePlanJoins <sfDir> <q1> <q2> ... */
object DrivePlanJoins {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      val p = SparkEntry.queries(q)(s, d).queryExecution.executedPlan.toString
      println(s"=== $q ===")
      p.split("\n")
        .filter(l => l.contains("Join") || l.contains("Exchange hash"))
        .foreach(l => println("  " + l.trim.take(150)))
    }
    s.stop()
  }
}
