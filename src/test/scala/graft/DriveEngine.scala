package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.ops.Tables

/** Manual drive: full engine lifecycle on sf0.001 real data. */
object DriveEngine {
  def main(args: Array[String]): Unit = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val e = new Engine(s, java.nio.file.Files.createTempDirectory("eng").toString)
    e.submit(Request(id = "r-hi", priority = 5, boundary = Boundary("nga"),
      raster_data = Seq(RasterSelection("udel_precip_v401", Seq("mean", "sum"),
        Seq(RasterFile("udel_precip_v401_1995"))))))
    e.submit(Request(id = "r-lo", boundary = Boundary("nga"),
      release_data = Seq(ReleaseSelection("nigeriaaims", filters = Map("donors" -> Seq("AFDB"))))))
    val base = Tables.nation(s, d).select(col("n_nationkey").as("asdf_id"), col("n_name"))
    val locs = Tables.locations(s, d)
      .withColumn("asdf_id", col("cell_id") % 25)
      .withColumn("alloc", col("amount") * lit(0.9))
      .withColumn("donors", lit("AFDB"))
    println("OUTCOMES=" + e.tick(base, Tables.pixels(s, d), locs))
    println("STATUS=" + e.status("r-hi") + "," + e.status("r-lo"))
    println("COLS=" + e.results("r-hi").get.columns.mkString(","))
    val zip = java.nio.file.Files.createTempDirectory("z").resolve("b.zip")
    e.bundle("r-hi", zip.toString)
    println("ZIP_BYTES=" + java.nio.file.Files.size(zip))
    println("TICK2=" + e.tick(base, Tables.pixels(s, d), locs))
    s.stop()
  }
}
