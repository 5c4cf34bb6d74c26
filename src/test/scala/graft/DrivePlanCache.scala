package graft

import org.apache.spark.sql.functions._
import graft.ops.{Extracts, Tables}
import graft.plans.PlanCache

/** Manual drive: optimizer-level memoization on real sf0.01 data. */
object DrivePlanCache {
  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val pc = PlanCache.install(s, java.nio.file.Files.createTempDirectory("pc").toString)
    def run(): (Long, Double) = {
      val t0 = System.nanoTime
      val n = Extracts.extract(Tables.pixels(s, d), "weighted_mean").count()
      (n, (System.nanoTime - t0) / 1e9)
    }
    val (n1, t1) = run()
    pc.materialize("wm", Extracts.extract(Tables.pixels(s, d), "weighted_mean"))
    pc.enable()
    val (n2, t2) = run()
    println(f"COLD rows=$n1 ${t1}%.2fs  REWRITTEN rows=$n2 ${t2}%.2fs")
    println("PLAN=" + Extracts.extract(Tables.pixels(s, d), "weighted_mean")
      .queryExecution.optimizedPlan.toString.linesIterator.next())
    s.stop()
  }
}
