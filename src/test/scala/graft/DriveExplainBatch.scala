package graft
import org.apache.spark.sql.SparkSession

/** Scratch main: dump `.explain("formatted")` for many registered
  * queries into <outDir>/<query>_<suffix>.txt in one session.
  * Usage: Test/runMain graft.DriveExplainBatch <outDir> <suffix> <q1,q2,...> [sfDir]
  */
object DriveExplainBatch {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val suffix = args(1)
    val names = args(2).split(",").toSeq
    val d = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { q =>
      val df = SparkEntry.queries(q)(s, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${q}_$suffix.txt"), txt)
      println(s"wrote $q")
    }
    s.stop()
  }
}
