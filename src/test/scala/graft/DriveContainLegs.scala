package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{LlmOps, Tables}
import graft.ops.Ckpt._

/** Scratch main: leg timing for dedup_containment (guide §1) —
  * reconstructs the query's internal frames and noops each. */
object DriveContainLegs {
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
      println(f"  $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val docsDf = Tables.documents(s, d)
    noop(docsDf)
    for (rnd <- 1 to 3) {
      println(s"-- round $rnd")
      val base = docsDf.repartition(LlmOps.spreadWidth(docsDf))
        .withColumn("norm", substring(LlmOps.normText(col("text")), 1, 512))
        .select(col("doc_id"), col("norm"))
      val corpus = base.unionByName(
        base.filter(col("doc_id") % 7 === 0)
          .select((-col("doc_id") - 1L).as("doc_id"),
            expr("substring(norm, 11, 120)").as("norm")))
      val shE = array_distinct(
        graft.functions.native.char_ngrams(col("norm"), 8))
      val fil = corpus.filter(length(col("norm")) >= 8)
      time("shArr build+diskCheckpoint (eager)") {
        val _ = fil.withColumn("s", shE).select(col("doc_id"), col("s"))
          .diskCheckpoint()
      }
      val shArr = fil.withColumn("s", shE)
        .select(col("doc_id"), col("s"))
        .diskCheckpoint()
      val idx = shArr.select(col("doc_id").as("doc_b"),
        explode(col("s")).as("w"))
      time("idx explode (noop)") { noop(idx) }
      val df = idx.groupBy(col("w")).agg(count(lit(1)).as("df"))
      time("df vocab agg (noop)") { noop(df) }
      val wRare = Window.partitionBy(col("doc_b")).orderBy(col("df"), col("w"))
      val sig = idx.join(df.hint("merge"), Seq("w"))
        .withColumn("rk", row_number().over(wRare))
        .filter(col("rk") <= 2)
        .select(col("doc_b").as("doc_a"), col("w"))
      time("sig idx-join-df + top2 window (noop)") { noop(sig) }
      val sigC = sig.diskCheckpoint()
      val cand = sigC.join(idx.hint("merge"), Seq("w"))
        .filter(col("doc_a") =!= col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      time("cand sig-join-idx + distinct (noop)") { noop(cand) }
      val candC = cand.diskCheckpoint()
      time("final: attach arrays + intersect (noop)") {
        noop(candC
          .join(shArr.select(col("doc_id").as("doc_a"), col("s").as("sa"))
            .hint("merge"), Seq("doc_a"))
          .join(shArr.select(col("doc_id").as("doc_b"), col("s").as("sb"))
            .hint("merge"), Seq("doc_b"))
          .withColumn("n_a", size(col("sa")).cast("long"))
          .withColumn("n_inter",
            size(array_intersect(col("sa"), col("sb"))).cast("long"))
          .filter(col("n_a") >= 20 && col("n_inter") * 2 >= col("n_a"))
          .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_inter"),
            round(col("n_inter").cast("double") / col("n_a"), 6).as("containment")))
      }
      time("FULL registered query (noop)") {
        noop(SparkEntry.queries("dedup_containment")(s, d))
      }
    }
    s.stop()
  }
}
