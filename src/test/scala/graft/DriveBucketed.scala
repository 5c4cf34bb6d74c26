package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.ops.{Cache, Tables}

/** Manual drive: bucketed pipeline on sf0.001 real data. */
object DriveBucketed {
  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val p = new Pipeline(s,
      new Cache(s, java.nio.file.Files.createTempDirectory("bp").toString),
      bucketed = true, buckets = 4)
    val req = Request(id = "r1", boundary = Boundary("nga_adm0_gadm28"),
      release_data = Seq(ReleaseSelection(dataset = "nigeriaaims")),
      raster_data = Seq(RasterSelection(name = "udel_precip_v401",
        extract_types = Seq("mean", "max"),
        files = Seq(RasterFile("udel_precip_v401_1995")))))
    val base = Tables.nation(s, d).select(col("n_nationkey").as("asdf_id"), col("n_name"))
    val locs = Tables.locations(s, d)
      .withColumn("asdf_id", col("cell_id") % 25)
      .withColumn("alloc", col("amount") * lit(0.9))
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (out, _) = p.buildOutput(req, base, Tables.pixels(s, d), locs)
    println("ROWS=" + out.count() + " COLS=" + out.columns.length)
    println("EXCHANGES=" + "Exchange hashpartitioning".r
      .findAllIn(out.queryExecution.executedPlan.toString).length)
    s.stop()
  }
}
