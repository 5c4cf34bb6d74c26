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

  // ---- nested / unicode canonical-JSON edge set (SURVEY §5.4) ----------

  /** Strings over the FULL code-point range: controls, BMP, astral plane
    * (surrogate pairs in UTF-16) — the inputs where ensure_ascii escaping
    * and code-point key ordering actually differ from naive Java string
    * handling. */
  val uniStrGen: Gen[String] = Gen.chooseNum(0, 12).flatMap(n =>
    Gen.listOfN(n, Gen.frequency(
      4 -> Gen.chooseNum(0x20, 0x7e),
      2 -> Gen.chooseNum(0x00, 0x1f),
      3 -> Gen.chooseNum(0x80, 0xd7ff),
      1 -> Gen.chooseNum(0xe000, 0xffff),
      2 -> Gen.chooseNum(0x10000, 0x10ffff)))
      .map(cps => new String(cps.toArray, 0, cps.length)))

  /** Doubles drawn from raw BITS — covers subnormals, extreme exponents,
    * negative zero; the domain where shortest-round-trip repr is hard. */
  val doubleBitsGen: Gen[Double] = Gen.chooseNum(Long.MinValue, Long.MaxValue)
    .map(java.lang.Double.longBitsToDouble).suchThat(d => !d.isNaN)

  val uniScalarGen: Gen[JVal] = Gen.oneOf(
    uniStrGen.map(JStr(_)),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(JInt(_)),
    doubleBitsGen.suchThat(d => !d.isInfinity).map(JFloat(_)),
    Gen.oneOf(JBool(true), JBool(false), JNull))

  def jvalGen(depth: Int): Gen[JVal] =
    if (depth <= 0) uniScalarGen
    else Gen.frequency(
      3 -> uniScalarGen,
      1 -> Gen.chooseNum(0, 4).flatMap(n =>
        Gen.listOfN(n, jvalGen(depth - 1)).map(JArr(_))),
      2 -> (for {
        n <- Gen.chooseNum(0, 5)
        ks <- Gen.listOfN(n, uniStrGen)
        vs <- Gen.listOfN(n, jvalGen(depth - 1))
      } yield JObj(ks.distinct.zip(vs))))

  def deepShuffle(v: JVal): JVal = v match {
    case JObj(kvs) =>
      JObj(scala.util.Random.shuffle(kvs.map { case (k, x) => k -> deepShuffle(x) }))
    case JArr(xs) => JArr(xs.map(deepShuffle)) // array order is semantic: keep
    case x => x
  }

  test("hash is stable under DEEP key permutation of nested unicode objects") {
    holds(Prop.forAll(jvalGen(3)) { v =>
      HashKey.keyOf(deepShuffle(v)) == HashKey.keyOf(v)
    })
  }

  test("canonical render is pure ASCII for any nested value (ensure_ascii)") {
    holds(Prop.forAll(jvalGen(3)) { v =>
      render(v).forall(c => c >= ' ' && c <= '~')
    })
  }

  test("two renders of a deep-shuffled object are byte-identical") {
    // byte equality, not just hash equality: a hash collision can't
    // mask a serializer divergence here
    holds(Prop.forAll(jvalGen(3)) { v =>
      render(deepShuffle(v)).getBytes("UTF-8")
        .sameElements(render(v).getBytes("UTF-8"))
    })
  }

  test("float repr round-trips over the FULL double domain (bit-pattern gen)") {
    holds(Prop.forAll(doubleBitsGen) { d =>
      d.isInfinity || java.lang.Double.parseDouble(pyFloatRepr(d)) == d
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

  test("as-of join equals the per-row brute force on random frames (incl. NULL values)") {
    // the one-shuffle window formulation must be ROW-identical to "for each
    // left row, take the latest right row with the same key and ts <= left
    // ts, nulls included" for any key/ts distribution
    lazy val spark = TestSpark.spark
    import spark.implicits._
    val leftGen = for {
      id <- Gen.chooseNum(0L, 10000L)
      k <- Gen.chooseNum(0L, 5L)
      ts <- Gen.chooseNum(0L, 100L)
    } yield (id, k, ts)
    val rightGen = for {
      k <- Gen.chooseNum(0L, 5L)
      ts <- Gen.chooseNum(0L, 100L)
      v <- Gen.option(Gen.chooseNum(-100.0, 100.0))
      sid <- Gen.chooseNum(0L, 10000L)
    } yield (k, ts, v, sid)
    val frameGen = for {
      nl <- Gen.chooseNum(1, 40)
      nr <- Gen.chooseNum(0, 40)
      ls <- Gen.listOfN(nl, leftGen)
      rs <- Gen.listOfN(nr, rightGen)
    } yield (ls.distinctBy(_._1), rs.distinctBy(r => (r._1, r._2)))
    val p = Prop.forAll(frameGen) { case (ls, rs) =>
      val l = ls.toDF("event_id", "k", "ts")
      val r = rs.toDF("k", "ts", "sv", "sid")
      val got = graft.ops.AsOf.join(l, r, "k", "ts", Seq("sv", "sid"))
        .select($"event_id", $"sv", $"sid")
        .as[(Long, Option[Double], Option[Long])].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      val expect = ls.map { case (id, k, ts) =>
        val best = rs.filter(r => r._1 == k && r._2 <= ts)
          .sortBy(_._2).lastOption
        id -> ((best.flatMap(_._3), best.map(_._4)))
      }.toMap
      got.size == ls.size && got == expect.map { case (k, (v, s)) => k -> ((v, s)) }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(r.passed, r.status.toString)
  }

  test("sessionFlush (batch) equals a brute-force sessionizer on random event logs (T8)") {
    // the hand-written FSM fold must reproduce "sort by (ts, id); split at
    // gap >= 30 min; aggregate (start, end, n, cents)" for ANY arrival
    // pattern — duplicate timestamps, singleton users, negative values
    lazy val spark = TestSpark.spark
    import spark.implicits._
    val evGen = for {
      id <- Gen.chooseNum(0L, 100000L)
      u <- Gen.chooseNum(0L, 4L)
      sec <- Gen.chooseNum(0L, 7200L)
      v <- Gen.chooseNum(-100.0, 100.0)
    } yield (id, u, sec, v)
    val logGen = Gen.chooseNum(1, 50).flatMap(n => Gen.listOfN(n, evGen))
      .map(_.distinctBy(_._1))
    val gapUs = 30 * 60L * 1000000L
    val p = Prop.forAll(logGen) { evs =>
      val df = evs.map { case (id, u, sec, v) =>
        (id, u, "view", new java.sql.Timestamp(sec * 1000L), v)
      }.toDF("event_id", "user_id", "event_type", "ts", "value")
      val got = graft.streaming.Streamy.sessionFlush(df).toDF()
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val expect = evs.groupBy(_._2).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._3, e._1))
          .map(e => (e._3 * 1000000L, math.floor(e._4 * 100 + 0.5).toLong))
        val sessions = sorted.tail.foldLeft(
          Vector(Vector(sorted.head))) { (acc, e) =>
          if (e._1 - acc.last.last._1 < gapUs) acc.init :+ (acc.last :+ e)
          else acc :+ Vector(e)
        }
        sessions.map(ss =>
          (u, ss.head._1, ss.last._1, ss.length.toLong, ss.map(_._2).sum))
      }.toSet
      got == expect
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(r.passed, r.status.toString)
  }

  test("interval bin blocking is lossless and collision-free for ANY bin width (X66)") {
    // the range_join construction: an interval explodes to the bins it
    // covers, a point maps to its single bin, pairs meet on bin equality
    // + the exact BETWEEN. For EVERY bin width: no qualifying pair is
    // missed (an interval containing a point always covers the point's
    // bin), and no pair meets twice (a point has one bin) — so the
    // blocked join needs no dedup pass and equals the brute force.
    val ivGen = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, for {
      s <- Gen.chooseNum(0L, 10000L); len <- Gen.chooseNum(0L, 500L)
    } yield (s, s + len)))
    val ptGen = Gen.chooseNum(0, 50).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 11000L)))
    val binGen = Gen.chooseNum(1L, 700L)
    holds(Prop.forAll(ivGen, ptGen, binGen) { (ivs, pts, b) =>
      pts.forall { p =>
        val brute = ivs.count(iv => iv._1 <= p && p <= iv._2)
        val meets = ivs.map(iv =>
          (((iv._1 / b) to (iv._2 / b)).count(_ == p / b), iv))
        val atMostOnce = meets.forall(_._1 <= 1)
        val blocked = meets.map { case (m, iv) =>
          if (m == 1 && iv._1 <= p && p <= iv._2) 1 else 0
        }.sum
        atMostOnce && blocked == brute
      }
    })
  }

  test("zorder interleave is injective, and aligned key blocks pin the length octile (X70)") {
    // Scala mirror of zorder_key's bit algebra: bit i of x -> 2i+1,
    // bit (i mod 3) of y -> 2i. Injective over the full (0..255, 0..4)
    // domain, and any aligned 64-key block fixes x's high bits — the
    // row-group min/max pruning claim: a file of consecutive keys covers
    // ONE length octile, so a length filter can skip it.
    def z(zx: Int, zy: Int): Long =
      (0 until 8).map(i => (((zx >> i) & 1).toLong << (2 * i + 1)) |
        (((zy >> (i % 3)) & 1).toLong << (2 * i))).reduce(_ | _)
    val xg = Gen.chooseNum(0, 255); val yg = Gen.chooseNum(0, 4)
    holds(Prop.forAll(xg, yg, xg, yg) { (x1, y1, x2, y2) =>
      val injective = (z(x1, y1) == z(x2, y2)) == (x1 == x2 && y1 == y2)
      val octilePinned = z(x1, y1) / 64 != z(x2, y2) / 64 || x1 / 8 == x2 / 8
      injective && octilePinned
    })
  }

  // ---- X89 waterfill: the closed-form prefix rule IS the fixpoint ------

  /** Reference implementation: the textbook ITERATIVE waterfill — cap
    * languages below the equal-share water level, re-split the leftover
    * over the rest, repeat to fixpoint; then deal the integer remainder
    * to the smallest-supply uncapped languages (the query's tie rule). */
  private def iterativeWaterfill(sup: Seq[(String, Long)], budget: Long): Map[String, Long] = {
    val sorted = sup.sortBy { case (l, v) => (v, l) }
    var capped = Set.empty[String]
    var changed = true
    while (changed) {
      changed = false
      val rest = sorted.filterNot(x => capped(x._1))
      if (rest.nonEmpty) {
        val remaining = budget - sorted.filter(x => capped(x._1)).map(_._2).sum
        rest.foreach { case (l, v) =>
          // capped iff supply <= its equal share of the remaining budget
          if (!capped(l) && v * rest.size <= remaining) {
            capped += l; changed = true
          }
        }
      }
    }
    val rest = sorted.filterNot(x => capped(x._1))
    if (rest.isEmpty) sorted.map { case (l, v) => l -> v }.toMap
    else {
      val remaining = budget - sorted.filter(x => capped(x._1)).map(_._2).sum
      val q = remaining / rest.size
      val extra = remaining % rest.size
      val base = sorted.filter(x => capped(x._1)).map { case (l, v) => l -> v }
      (base ++ rest.zipWithIndex.map { case ((l, _), i) =>
        l -> (q + (if (i < extra) 1L else 0L)) }).toMap
    }
  }

  /** The query's closed-form rule in pure Scala: capped = the sorted
    * prefix where sup_i * (k - i) <= budget - cum_{i-1} (0-based i). */
  private def closedFormWaterfill(sup: Seq[(String, Long)], budget: Long): Map[String, Long] = {
    val sorted = sup.sortBy { case (l, v) => (v, l) }
    val k = sorted.size
    var cum = 0L
    val capped = sorted.zipWithIndex.map { case ((l, v), i) =>
      val rem = budget - cum
      cum += v
      (l, v, v * (k - i) <= rem)
    }
    val capSum = capped.filter(_._3).map(_._2).sum
    val m = capped.count(!_._3)
    if (m == 0) capped.map { case (l, v, _) => l -> v }.toMap
    else {
      val rstar = budget - capSum
      val q = rstar / m
      val extra = rstar % m
      var seen = 0
      capped.map { case (l, v, isCapped) =>
        if (isCapped) l -> v
        else { seen += 1; l -> (q + (if (seen <= extra) 1L else 0L)) }
      }.toMap
    }
  }

  val supplyGen: Gen[Seq[(String, Long)]] = for {
    n <- Gen.chooseNum(1, 12)
    sups <- Gen.listOfN(n, Gen.chooseNum(0L, 100000L))
  } yield sups.zipWithIndex.map { case (v, i) => (s"l$i", v) }

  test("waterfill: the closed-form prefix rule equals the iterative fixpoint (X89)") {
    holds(Prop.forAll(supplyGen, Gen.chooseNum(0L, 500000L)) { (sup, budget) =>
      closedFormWaterfill(sup, budget) == iterativeWaterfill(sup, budget)
    })
  }

  test("waterfill: conservation, caps, and evenness hold for all inputs (X89)") {
    holds(Prop.forAll(supplyGen, Gen.chooseNum(0L, 500000L)) { (sup, budget) =>
      val alloc = closedFormWaterfill(sup, budget)
      val bySup = sup.toMap
      val total = sup.map(_._2).sum
      val spendsAll = alloc.values.sum == math.min(budget, total)
      val withinSupply = alloc.forall { case (l, a) => a >= 0 && a <= bySup(l) }
      val uncapped = alloc.filter { case (l, a) => a < bySup(l) }.values
      val even = uncapped.isEmpty || (uncapped.max - uncapped.min <= 1)
      spendsAll && withinSupply && even
    })
  }
}
