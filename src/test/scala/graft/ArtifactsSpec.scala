package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Artifacts, Naming}

class ArtifactsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CSV sink: dotted display names, header, empty-string nulls (S5)") {
    val dir = Files.createTempDirectory("graft_art").toString
    val df = Seq((1, Some(1.5), "x"), (2, None, "y"))
      .toDF("asdf_id", Naming.col("ds", "1998", "mean"), "name")
    Artifacts.writeCsv(df, s"$dir/out")
    val csv = Files.list(Paths.get(s"$dir/out")).toArray
      .map(_.toString).filter(_.endsWith(".csv")).head
    val lines = Files.readAllLines(Paths.get(csv))
    assert(lines.get(0) == "asdf_id,ds.1998.mean,name")
    assert(lines.contains("2,,y")) // null → empty string
  }

  test("request JSON echo is canonical (S6)") {
    val p = Files.createTempDirectory("graft_art").resolve("req.json")
    Artifacts.writeRequestJson(Map("b" -> 1, "a" -> "x"), p.toString)
    assert(Files.readString(p) == """{"a": "x", "b": 1}""")
  }

  test("raw-data copy: per-selection CSVs land in raw_aid_data, missing sources skipped") {
    val dataRoot = Files.createTempDirectory("graft_dataroot")
    val srcDir = dataRoot.resolve("msr/done/worldbank/abc1234")
    Files.createDirectories(srcDir)
    Files.writeString(srcDir.resolve("project_locations.csv"), "project_id,lat\n1,2.0")
    val bundle = Files.createTempDirectory("graft_bundle")
    val copied = Artifacts.copyRawData(dataRoot.toString, bundle.toString,
      Seq("worldbank" -> "abc1234", "missing_ds" -> "deadbee"))
    assert(copied == 1)
    val out = bundle.resolve("raw_aid_data/worldbank_abc1234.csv")
    assert(Files.readString(out) == "project_id,lat\n1,2.0")
    assert(!Files.exists(bundle.resolve("raw_aid_data/missing_ds_deadbee.csv")))
  }

  test("zip bundle contains every file with relative paths (S9)") {
    val dir = Files.createTempDirectory("graft_art")
    Files.writeString(dir.resolve("results.csv"), "a,b\n1,2")
    Files.createDirectory(dir.resolve("sub"))
    Files.writeString(dir.resolve("sub/request.json"), "{}")
    val zip = Files.createTempDirectory("graft_zip").resolve("bundle.zip")
    Artifacts.zipDir(dir.toString, zip.toString)
    val zf = new java.util.zip.ZipFile(zip.toFile)
    try {
      val names = zf.entries().asIterator().asScala.map(_.getName).toSet
      assert(names == Set("results.csv", "sub/request.json"))
    } finally zf.close()
  }

  implicit class IterAdapter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }
}
