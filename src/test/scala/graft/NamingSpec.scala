package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Naming

class NamingSpec extends AnyFunSuite {

  test("column grammar <dataset>.<filter>.<method>") {
    assert(Naming.col("udel_precip_v401_min", "1998", "mean")
      == "udel_precip_v401_min__1998__mean")
    assert(Naming.display(Naming.col("udel_precip_v401_min", "1998", "mean"))
      == "udel_precip_v401_min.1998.mean")
  }

  test("categorical column per class") {
    assert(Naming.display(Naming.categorical("esa_landcover", "2010", "forest"))
      == "esa_landcover.2010.categorical_forest")
  }

  test("msr columns use hash7 and the sum/potential/reliability triple") {
    val h = "0123456789abcdef0123456789abcdef01234567"
    assert(Naming.msrCols("nigeriaaims", h).map(Naming.display) == Seq(
      "nigeriaaims.0123456.sum",
      "nigeriaaims.0123456.potential",
      "nigeriaaims.0123456.reliability"))
  }

  test("worldbank datasets emit only sum (queue/request_tools.py:412-414)") {
    assert(Naming.msrMethods("worldbank_wdi") == Seq("sum"))
    assert(Naming.msrMethods("nigeriaaims") == Seq("sum", "potential", "reliability"))
  }

  test("display/physical round-trip") {
    val p = Naming.col("a_b", "none", "weighted_mean")
    assert(Naming.physical(Naming.display(p)) == p)
  }
}
