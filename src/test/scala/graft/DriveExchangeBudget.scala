package graft

/** Regenerates `src/test/resources/exchange_budget.txt` — the recorded
  * shuffle count (Exchange hash/range partitioning nodes in the initial
  * physical plan) per registered query at sf0.001 under the TestSpark
  * session config. PlanSpec's corpus-wide audit asserts every query's
  * live count EQUALS its recorded row, so any change to a query's
  * shuffle structure — an accidental extra exchange from a refactor, or
  * a deliberate plan improvement — fails the suite until this main is
  * re-run and the diff is reviewed/committed alongside the change.
  *
  * Usage: Test/runMain graft.DriveExchangeBudget
  */
object DriveExchangeBudget {
  val ResourcePath = "src/test/resources/exchange_budget.txt"
  val Pattern = "Exchange (hash|range)partitioning".r

  def count(p: org.apache.spark.sql.execution.SparkPlan): Int =
    Pattern.findAllIn(p.toString).length

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val n = count(fn(spark, d).queryExecution.executedPlan)
      println(f"$name%-28s $n")
      s"$name $n"
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(ResourcePath),
      (rows.mkString("\n") + "\n").getBytes("UTF-8"))
    println(s"wrote ${rows.size} rows to $ResourcePath")
    spark.stop()
  }
}
