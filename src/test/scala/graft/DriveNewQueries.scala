package graft

/** Manual drive: dump a subset of queries + oracle SQL to a dir so
  * tools/oracle_check.py can compare just them (fast inner loop while
  * adding operators). Usage: Test/runMain graft.DriveNewQueries <sfDir>
  * <outDir> <name1> <name2> ... */
object DriveNewQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    val oracles = SparkEntry.oracleSql
    names.foreach { n =>
      val t0 = System.nanoTime()
      qs(n)(s, sfDir).write.mode("overwrite").parquet(s"$outDir/$n")
      println(f"dumped $n in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val json = names.filter(oracles.contains).map { n =>
      val sql = oracles(n).replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n")
      s""""$n": "$sql""""
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    s.stop()
  }
}
