package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Msr

class MsrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("filter normalization drops All/None/null entries (P1)") {
    val f = Map(
      "donors" -> Seq("AFDB"),
      "sectors" -> Seq("All"),
      "years" -> Seq("1998", "None"),
      "status" -> Seq(null.asInstanceOf[String]))
    assert(Msr.normalizeFilters(f) == Map("donors" -> Seq("AFDB")))
  }

  test("normalization is idempotent") {
    val f = Map("donors" -> Seq("AFDB"), "sectors" -> Seq("All"))
    assert(Msr.normalizeFilters(Msr.normalizeFilters(f)) == Msr.normalizeFilters(f))
  }

  test("even-split allocation: sum vs potential vs reliability (A12)") {
    // project 10: amount 100 over cells c1,c2; project 20: amount 60 on c1
    val locs = Seq(
      (10L, "c1", 100.0), (10L, "c2", 100.0), (20L, "c1", 60.0)
    ).toDF("project_id", "cell_id", "amount")
    val r = Msr.surface(locs).collect().map(x => x.getString(0) -> x).toMap
    assert(r("c1").getAs[Double]("sum") == 50.0 + 60.0)
    assert(r("c1").getAs[Double]("potential") == 160.0)
    assert(r("c1").getAs[Double]("reliability") == 110.0 / 160.0)
    assert(r("c2").getAs[Double]("sum") == 50.0)
    assert(r("c2").getAs[Double]("reliability") == 0.5)
  }

  test("applyFilters is an AND of IN-lists after normalization (P2)") {
    val locs = Seq(
      (1L, "c1", 10.0, "AFDB", "edu"),
      (2L, "c1", 20.0, "AFDB", "health"),
      (3L, "c1", 30.0, "WB", "edu")
    ).toDF("project_id", "cell_id", "amount", "donor", "sector")
    val out = Msr.applyFilters(locs, Map(
      "donor" -> Seq("AFDB"), "sector" -> Seq("edu"), "ignored" -> Seq("All")))
      .select("project_id").as[Long].collect().toSet
    assert(out == Set(1L))
  }
}
