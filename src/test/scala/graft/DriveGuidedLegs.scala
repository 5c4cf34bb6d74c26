package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Ckpt._

/** Scratch main: time the guided-quantile engine's legs in isolation —
  * GK bracket scan, window-count scan, select tail — to locate the cost
  * center before touching anything (guide §1).
  */
object DriveGuidedLegs {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"  $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val px = ops.Tables.pixels(s, d).select(col("asdf_id"), col("value"))
    // warm everything once
    noop(px)
    val ps9 = (1 to 9).map(_ / 10.0)
    for (round <- 1 to 3) {
      println(s"-- round $round")
      time("scan px (noop)") { noop(px) }
      time("count+min+max per zone") {
        noop(px.groupBy("asdf_id").agg(count("value"), min("value"), max("value")))
      }
      time("gk_bracket 1 fraction (median)") {
        noop(px.groupBy("asdf_id").agg(
          graft.functions.native.gk_bracket(col("value"),
            Seq(0.497, 0.503), 1000)))
      }
      time("gk_bracket 9 fractions (tiles)") {
        noop(px.groupBy("asdf_id").agg(
          graft.functions.native.gk_bracket(col("value"),
            ps9.map(_ - 0.003) ++ ps9.map(_ + 0.003), 1000)))
      }
      time("guidedQuantiles median full") {
        noop(ops.Extracts.guidedQuantiles(px, Seq(0.5), Seq("med")))
      }
      time("guidedTileBounds 10 full") {
        noop(ops.Extracts.guidedTileBounds(px, 10))
      }
      // manual reconstruction of the internal legs (median, 1 fraction)
      val acc = 1000
      val bounds1 = px.groupBy("asdf_id").agg(
          count(col("value")).as("__g_n"),
          min(col("value")).as("__g_min"), max(col("value")).as("__g_max"),
          graft.functions.native.gk_bracket(col("value"),
            Seq(0.497, 0.503), acc).as("__g_pa"))
        .select(col("asdf_id"), col("__g_n"),
          when(col("__g_n") <= 2L * acc, col("__g_min"))
            .otherwise(element_at(col("__g_pa"), 1)).as("__g_lo_0"),
          when(col("__g_n") <= 2L * acc, col("__g_max"))
            .otherwise(element_at(col("__g_pa"), 2)).as("__g_hi_0"))
      time("leg: bounds (no ckpt, noop)") { noop(bounds1) }
      val bl = bounds1.smallCheckpointLazy()
      time("leg: bounds smallCheckpointLazy + noop") { noop(bl) }
      val gRaw = ops.Extracts.joinOnZone(px, bl, "asdf_id")
        .groupBy(col("asdf_id"),
          when(col("value").between(col("__g_lo_0"), col("__g_hi_0")),
            col("value")).as("__g_wv"))
        .agg(count(lit(1)).as("__g_c"),
          sum(when(col("value") < col("__g_lo_0"), 1L).otherwise(0L)).as("__g_b_0"))
      time("leg: count pass g (no ckpt, noop)") { noop(gRaw) }
      time("leg: count pass g diskCkptLazy + noop") { noop(gRaw.diskCheckpointLazy()) }
      // tile-bounds legs (k=10 → 9 interior fractions)
      val k = 10
      val acc2 = 1000
      val e2 = 3.0 / acc2
      val pls2 = (1 until k).map(j => math.max(0.0, j.toDouble / k - e2))
      val phs2 = (1 until k).map(j => math.min(1.0, j.toDouble / k + e2))
      val widen2 = col("__t_n") <= (acc2.toLong * (k + 3)) / 2
      val tb = px.groupBy(col("asdf_id")).agg(
          count(col("value")).as("__t_n"),
          min(col("value")).as("__t_mn"), max(col("value")).as("__t_mx"),
          graft.functions.native.gk_bracket(col("value"), pls2 ++ phs2, acc2)
            .as("__t_pa"))
        .select(Seq(col("asdf_id"), col("__t_n"), col("__t_mn"), col("__t_mx")) ++
          (1 until k).flatMap { j =>
            Seq(when(widen2, col("__t_mn"))
                  .otherwise(element_at(col("__t_pa"), j)).as(s"__t_lo_$j"),
                when(widen2, col("__t_mx"))
                  .otherwise(element_at(col("__t_pa"), k - 1 + j)).as(s"__t_hi_$j"))
          }: _*)
      time("tleg: bounds (no ckpt, noop)") { noop(tb) }
      val tbc = tb.smallCheckpointLazy()
      time("tleg: bounds ckpt materialize") { noop(tbc) }
      def inWin2(j: Int) = col("value").between(col(s"__t_lo_$j"), col(s"__t_hi_$j"))
      val tg = ops.Extracts.joinOnZone(px, tbc, "asdf_id")
        .groupBy(col("asdf_id"),
          when((1 until k).map(inWin2).reduce(_ || _), col("value")).as("__t_wv"))
        .agg(count(lit(1)).as("__t_c"),
          (1 until k).map(j => sum(when(col("value") < col(s"__t_lo_$j"), 1L)
            .otherwise(0L)).as(s"__t_b_$j")): _*)
      time("tleg: count pass g (no ckpt)") { noop(tg) }
      time("tleg: count pass g + diskCkpt") { noop(tg.diskCheckpointLazy()) }
    }
    s.stop()
  }
}
