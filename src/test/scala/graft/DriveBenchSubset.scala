package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, xxhash64}

/** Scratch main: bench ONLY the named queries at a given sf dir with the
  * hash-all-columns protocol from [[Bench]] (warm-up + two measured passes,
  * slower-of-two reported). For BASELINE.md row timing without a full run.
  */
object DriveBenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(n: String): Unit = {
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).head(): Unit
    }
    // warm-up (timed and printed as the COLD row: first-touch cost in a
    // fresh session — what a memo-family query pays before its label
    // frame is materialized; BASELINE.md records memo rows cold AND warm)
    names.foreach { n =>
      val t0 = System.nanoTime()
      run(n)
      println(f"cold  $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (pass <- 1 to 2) {
      names.foreach { n =>
        val t0 = System.nanoTime()
        run(n)
        println(f"pass$pass $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
