package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Merge, Naming}

class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val c1 = Naming.col("ds1", "1998", "mean")
  val c2 = Naming.col("ds2", "none", "sum")

  def base = Seq((1, "A"), (2, "B"), (3, "C")).toDF("asdf_id", "name")
  def e1 = Seq((1, 1.5), (2, 2.5)).toDF("asdf_id", c1)
  def e2 = Seq((3, 9.0), (1, 7.0)).toDF("asdf_id", c2)

  test("wide merge: key column first, extract cols, then passthrough attrs (P9)") {
    val m = Merge.wide(base, Seq(e1, e2))
    assert(m.columns.toSeq == Seq("asdf_id", c1, c2, "name"))
  }

  test("left semantics: zones with no extract rows get nulls") {
    val m = Merge.wide(base, Seq(e1, e2)).orderBy("asdf_id").collect()
    assert(m.length == 3)
    assert(m(2).isNullAt(1)) // zone 3 absent from e1
    assert(m(2).getDouble(2) == 9.0)
  }

  test("merge is row-order independent (upgrade over pandas index-align, §7.5.2)") {
    val shuffled = e1.orderBy(org.apache.spark.sql.functions.rand(7))
    val a = Merge.wide(base, Seq(e1, e2)).orderBy("asdf_id").collect().toSeq
    val b = Merge.wide(base, Seq(shuffled, e2)).orderBy("asdf_id").collect().toSeq
    assert(a == b)
  }

  test("dropExFields removes exfield_* columns (P7)") {
    val df = Seq((1, 2.0, "x")).toDF("asdf_id", "exfield_0", "attr")
    assert(Merge.dropExFields(df).columns.toSeq == Seq("asdf_id", "attr"))
  }

  test("displayNames renders the dotted reference grammar at the edge") {
    val m = Merge.displayNames(Merge.wide(base, Seq(e1)))
    assert(m.columns.toSeq == Seq("asdf_id", "ds1.1998.mean", "name"))
  }
}
