package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.{HashKey, Msr}
import graft.ops.HashKey._

/** Property-based invariants (SURVEY.md §5.4) — plain ScalaCheck driven
  * from ScalaTest (no scalatestplus bridge in the offline cache). */
class PropertySpec extends AnyFunSuite {

  def holds(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  val scalarGen: Gen[JVal] = Gen.oneOf(
    Gen.alphaNumStr.map(JStr(_)),
    Gen.chooseNum(-1000000L, 1000000L).map(JInt(_)),
    Gen.chooseNum(-1e6, 1e6).map(JFloat(_)),
    Gen.oneOf(JBool(true), JBool(false), JNull))

  val objGen: Gen[JObj] = for {
    n <- Gen.chooseNum(0, 8)
    keys <- Gen.listOfN(n, Gen.identifier)
    vals <- Gen.listOfN(n, scalarGen)
  } yield JObj(keys.distinct.zip(vals))

  test("hash is stable under key permutation (F1)") {
    holds(Prop.forAll(objGen) { obj =>
      val shuffled = JObj(scala.util.Random.shuffle(obj.v))
      HashKey.keyOf(obj) == HashKey.keyOf(shuffled)
    })
  }

  test("adding a key always changes the canonical JSON") {
    holds(Prop.forAll(objGen, scalarGen) { (obj, v) =>
      val extended = JObj(obj.v :+ ("zz_new" -> v))
      render(extended) != render(obj)
    })
  }

  test("float repr round-trips through Java parsing") {
    holds(Prop.forAll(Gen.chooseNum(-1e12, 1e12)) { (d: Double) =>
      java.lang.Double.parseDouble(pyFloatRepr(d)) == d
    })
  }

  test("filter normalization is idempotent, shrinking, value-preserving (P1)") {
    val filtersGen = Gen.mapOf(Gen.zip(Gen.identifier,
      Gen.listOf(Gen.oneOf(Gen.alphaStr, Gen.const("All"), Gen.const("None")))))
    holds(Prop.forAll(filtersGen) { f =>
      val once = Msr.normalizeFilters(f)
      Msr.normalizeFilters(once) == once &&
        once.keySet.subsetOf(f.keySet) &&
        once.forall { case (k, vs) => f(k) == vs }
    })
  }

  test("escape emits pure ASCII for any input string") {
    holds(Prop.forAll { (s: String) =>
      HashKey.escape(s).forall(c => c >= ' ' && c <= '~')
    })
  }

  test("two-phase rank equals the global window on random queues (incl. nulls)") {
    // the banded implementation must be VALUE-identical to the naive
    // row_number() OVER (ORDER BY priority DESC, submit ASC, id ASC) for
    // any priority/submit distribution, null patterns included — fewer,
    // larger random frames (Spark jobs are the cost, not the rows)
    lazy val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rowGen = for {
      id <- Gen.chooseNum(0L, 5000L)
      pri <- Gen.option(Gen.chooseNum(0, 4))
      sub <- Gen.option(Gen.chooseNum(0L, 400000L))
    } yield (id, pri, sub)
    val queueGen = Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, rowGen))
    val p = Prop.forAll(queueGen) { rows =>
      val q = rows.distinctBy(_._1).toDF("id", "priority", "submit_time")
      val banded = graft.ops.Queue.rank(q).select($"id", $"rank")
        .as[(Long, Int)].collect().toMap
      val global = q.withColumn("rank", row_number().over(
          Window.orderBy($"priority".desc, $"submit_time".asc, $"id".asc)))
        .select($"id", $"rank").as[(Long, Int)].collect().toMap
      banded == global
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(r.passed, r.status.toString)
  }
}
