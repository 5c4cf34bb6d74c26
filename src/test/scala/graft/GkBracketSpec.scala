package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{GkSketch, native}

/** Differential gate for the primitive-array GK bracket sketch (round-13
  * verdict #5): the guided quantile engine's coverage proof rests on the
  * rank guarantee |rank(query(p)) − ceil(p·n)| ≤ n/accuracy — these tests
  * pin it empirically against EXACT ranks on adversarial shapes (uniform,
  * heavy ties, sorted, constant), through the full Spark aggregation path
  * (update → serialize → merge across partitions → eval), plus the
  * engine-level equivalence: guided percentiles stay EXACTLY equal to the
  * buffering `percentile` with the new bracket underneath. */
class GkBracketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Exact rank window of a value in a sorted multiset: [first, last]
    * 1-based positions where it (or its insertion point) lies. */
  private def rankWindow(sorted: Array[Double], v: Double): (Long, Long) = {
    // lowest rank: count of values strictly below + 1; highest: count <= v
    val below = sorted.count(_ < v).toLong
    val atOrBelow = sorted.count(_ <= v).toLong
    (below + 1, math.max(atOrBelow, below + 1))
  }

  private def checkGuarantee(data: Seq[Double], accuracy: Int,
      parts: Int, label: String): Unit = {
    val fracs = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
    val out = data.toDF("v").repartition(parts)
      .agg(native.gk_bracket(col("v"), fracs, accuracy).as("b"))
      .head().getSeq[Double](0)
    val sorted = data.toArray.sorted
    val n = data.size.toLong
    val eps = n.toDouble / accuracy
    fracs.zip(out).foreach { case (p, got) =>
      val target = math.ceil(p * n).toLong
      val (lo, hi) = rankWindow(sorted, got)
      // some rank of the returned value must lie within target ± eps
      assert(lo <= target + eps && hi >= target - eps,
        f"$label: frac $p returned $got with rank window [$lo,$hi], " +
          f"target $target ± $eps%.1f (n=$n, accuracy=$accuracy)")
    }
  }

  test("rank guarantee holds through partial aggregation: uniform data") {
    val rng = new scala.util.Random(42)
    checkGuarantee(Seq.fill(120000)(rng.nextDouble() * 1000), 100, 16, "uniform")
  }

  test("rank guarantee holds: heavy ties (90% one value)") {
    val rng = new scala.util.Random(7)
    val data = Seq.fill(80000)(if (rng.nextDouble() < 0.9) 5.0 else rng.nextDouble() * 10)
    checkGuarantee(data, 100, 8, "ties")
  }

  test("rank guarantee holds: pre-sorted and reverse-sorted input") {
    val asc = (1 to 70000).map(_.toDouble)
    checkGuarantee(asc, 100, 4, "sorted")
    checkGuarantee(asc.reverse, 100, 4, "reverse")
  }

  test("rank guarantee holds at the engine's default accuracy on small groups") {
    val rng = new scala.util.Random(11)
    checkGuarantee(Seq.fill(3000)(rng.nextGaussian()), 1000, 8, "small-n")
  }

  test("empty and all-null groups yield NULL, like percentile_approx") {
    val out = Seq[(Int, Option[Double])]((1, None), (1, None))
      .toDF("g", "v").groupBy("g")
      .agg(native.gk_bracket(col("v"), Seq(0.5), 100).as("b"))
      .head()
    assert(out.isNullAt(1), "all-null group must yield NULL")
  }

  test("GkSketch unit: merge of disjoint halves brackets the global median") {
    val a = new GkSketch(0.01)
    val b = new GkSketch(0.01)
    (1 to 50000).foreach(i => a.insert(i.toDouble))
    (50001 to 100000).foreach(i => b.insert(i.toDouble))
    val m = a.merge(b)
    val got = m.query(0.5)
    assert(math.abs(got - 50000) <= 2000, s"merged median $got too far from 50000")
    // serialize round-trip preserves the answer
    val rt = GkSketch.deserialize(m.serialize())
    assert(rt.query(0.5) == got)
  }

  test("guided acceptance criterion: query(p±3ε) brackets cover the " +
      "interpolation ranks across n × accuracy × distribution × fan-in") {
    // The round-14 regression class: the sketch honored its rank bound on
    // the shapes above yet the GUIDED ENGINE's acceptance criterion —
    // query(p−3ε)/query(p+3ε) must bracket the values at interpolation
    // ranks ⌊r⌋/⌈r⌉, r = 1+p(n−1) (ops/Extracts.scala's runtime guard) —
    // failed at misaligned n (3704 @ accuracy 1000: every tuple carried
    // g+Δ = ⌊2εn⌋+1 > 2εn, zero query hits, fall-through to the zone
    // max). This sweep asserts that exact predicate, plus the g+Δ ≤ 2εn
    // invariant it rests on, through the full aggregate shape: partition
    // fan-in, per-partition sketches, serialize round-trips, fold merge.
    val ns = Seq(2500, 3704, 5000, 12000, 35000, 100000, 200000)
    val accuracies = Seq(100, 1000, 10000)
    // 1 and 32 bound the fan-in behavior (no merge at all vs. deepest
    // fold + most serde edges); the interior points added tens of
    // seconds of CI for no extra coverage (round-15 advisor)
    val fanIns = Seq(1, 32)
    val ps = Seq(0.05, 0.5, 0.95, 0.99)
    def dists(n: Int, seed: Int): Seq[(String, Array[Double])] = {
      val rng = new scala.util.Random(seed)
      Seq(
        "uniform"   -> Array.fill(n)(rng.nextDouble() * 1e6),
        "ties"      -> Array.fill(n)(if (rng.nextDouble() < 0.8)
                         rng.nextInt(5).toDouble else rng.nextDouble() * 10),
        "sorted"    -> Array.tabulate(n)(_.toDouble),
        "lognormal" -> Array.fill(n)(math.exp(rng.nextGaussian() * 2)))
    }
    for {
      n <- ns
      acc <- accuracies
      if n > 2 * acc // below this the engine widens to [min,max] — GK unused
      (label, data) <- dists(n, n ^ acc)
      parts <- fanIns
    } {
      val eps = 1.0 / acc
      val chunkSize = math.max(1, (n + parts - 1) / parts)
      val m = data.grouped(chunkSize).map { c =>
        val s = new GkSketch(eps)
        c.foreach(s.insert)
        GkSketch.deserialize(s.serialize()) // the shuffle's serde edge
      }.reduce(_ merge _)
      val ctx = s"n=$n acc=$acc dist=$label parts=$parts"
      assert(m.maxTupleUncertainty <= 2 * eps * n,
        s"$ctx: GK invariant violated — max(g+Δ)=${m.maxTupleUncertainty}" +
          f" > 2εn=${2 * eps * n}%.3f")
      val sorted = data.sorted
      ps.foreach { p =>
        val e = 3.0 / acc
        // mirror the engine exactly: clamped fractions use exact min/max
        val lo = if (p - e <= 0.0) sorted.head else m.query(p - e)
        val hi = if (p + e >= 1.0) sorted.last else m.query(p + e)
        val r = 1.0 + p * (n - 1)
        val kLo = math.floor(r).toInt
        val kHi = math.ceil(r).toInt
        assert(lo <= sorted(kLo - 1) && sorted(kHi - 1) <= hi,
          s"$ctx p=$p: bracket [$lo,$hi] misses interpolation values " +
            s"${sorted(kLo - 1)}/${sorted(kHi - 1)} at ranks $kLo/$kHi")
      }
    }
  }

  test("merge into an empty sketch copies, never aliases, the other's arrays") {
    val a = new GkSketch(0.01)
    val b = new GkSketch(0.01)
    (1 to 5000).foreach(i => b.insert(i.toDouble))
    val m = a.merge(b) // merge flushes both, then hits the empty-this path
    val before = b.query(0.5)
    // mutating the adopter must not corrupt the donor
    (5001 to 20000).foreach(i => m.insert(i.toDouble))
    m.query(0.9)
    assert(b.query(0.5) == before,
      "donor sketch changed after the adopting sketch was mutated — " +
        "merge aliased the arrays instead of copying")
  }

  test("engine equivalence: guided percentiles stay EXACT over the new bracket") {
    // the whole point of the swap — exactness never depended on the
    // bracket source, only on its rank guarantee. Compare the registered
    // guided forms against Spark's exact percentile on real fixture data.
    val d = "/root/testdata/sf0.001"
    val px = graft.ops.Tables.pixels(spark, d)
    val guided = graft.ops.Extracts.guidedQuantiles(px,
        Seq(0.5, 0.9), Seq("g50", "g90"))
      .orderBy("asdf_id").collect()
    val exact = px.groupBy("asdf_id")
      .agg(expr("percentile(value, 0.5)").as("e50"),
        expr("percentile(value, 0.9)").as("e90"))
      .orderBy("asdf_id").collect()
    assert(guided.length == exact.length)
    // Spark's `percentile` associates the interpolation differently than
    // the guided engine's fixed formula (one-ulp differences like
    // 95373.097 vs 95373.09700000001 predate the bracket swap) — the
    // binding contract is the DuckDB oracle gate's 1e-6 relative
    // tolerance, which is what this pins
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-6 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    guided.zip(exact).foreach { case (g, e) =>
      assert(close(g.getDouble(1), e.getDouble(1)) && close(g.getDouble(2), e.getDouble(2)),
        s"guided percentile diverged at zone ${g.get(0)}: " +
          s"(${g.getDouble(1)}, ${g.getDouble(2)}) vs (${e.getDouble(1)}, ${e.getDouble(2)})")
    }
  }

  test("devBracket covers the deviation-median interpolation ranks " +
      "(adversarial distributions × accuracy × fan-in)") {
    // the r17 mad engine derives the deviation window from the VALUE
    // sketch (no second GK scan): pin lo ≤ d_(kLo) ∧ hi ≥ d_(kHi)
    // against exact deviation order statistics, through the full Spark
    // aggregation path (update → serialize → merge → eval), with the
    // exact interpolated median as the center — precisely how
    // Extracts.guidedMedianMad drives it.
    val rnd = new scala.util.Random(41)
    def exactMedian(sorted: Array[Double]): Double = {
      val n = sorted.length
      val r = 1.0 + 0.5 * (n - 1)
      val lo = sorted(math.floor(r).toInt - 1)
      val hi = sorted(math.ceil(r).toInt - 1)
      lo + (r - math.floor(r)) * (hi - lo)
    }
    val dists: Seq[(String, Array[Double])] = Seq(
      "uniform" -> Array.fill(30000)(rnd.nextDouble() * 1e6),
      "heavy_ties" -> Array.fill(30000)(
        if (rnd.nextDouble() < 0.9) 42.0 else rnd.nextDouble() * 100),
      "exp_skew" -> Array.fill(30000)(math.pow(rnd.nextDouble(), 8) * 1e9),
      "bimodal_far" -> Array.fill(30000)(
        if (rnd.nextBoolean()) rnd.nextDouble() else 1e8 + rnd.nextDouble()),
      "sorted" -> Array.tabulate(30000)(_.toDouble),
      "constant" -> Array.fill(5000)(7.0),
      "tiny" -> Array.fill(37)(rnd.nextDouble() * 10),
      "negatives" -> Array.fill(30000)(rnd.nextGaussian() * 1e3 - 5e2))
    for ((label, data) <- dists; accuracy <- Seq(100, 1000);
         parts <- Seq(1, 7)) {
      val row = data.toSeq.toDF("v").repartition(parts)
        .agg(native.gk_bracket_state(col("v"), Seq(0.5), accuracy).as("b"))
        .select(col("b.state")).head()
      val sk = GkSketch.deserialize(row.getAs[Array[Byte]](0))
      val sorted = data.sorted
      val med = exactMedian(sorted)
      val (lo, hi) = sk.devBracket(med)
      val devs = data.map(x => math.abs(x - med)).sorted
      val n = data.length.toLong
      val kLo = ((n + 1) / 2).toInt
      val kHi = ((n + 2) / 2).toInt
      assert(lo <= devs(kLo - 1) && hi >= devs(kHi - 1),
        f"$label acc=$accuracy parts=$parts: window [$lo,$hi] misses " +
          f"deviation ranks $kLo/$kHi = ${devs(kLo - 1)}/${devs(kHi - 1)}")
      // state-bound sanity (tightness, not correctness): the selection
      // pass aggregates at (zone, DISTINCT value) grain — tie runs
      // compress to one row — so the state metric is DISTINCT deviations
      // in the window, O(n/accuracy) on the narrow path (bound slack
      // ≤ ~4εn per side plus one inter-tuple gap crossing per side;
      // generous 40× headroom so distribution shape can never flake)
      if (n > 2L * accuracy) {
        val distinctIn = devs.filter(dv => dv >= lo && dv <= hi)
          .distinct.length.toLong
        assert(distinctIn <= 40L * n / accuracy + 8,
          s"$label acc=$accuracy parts=$parts: window holds " +
            s"$distinctIn distinct deviations of $n rows")
      }
    }
  }

  test("guidedMedianMad equals buffering median/mad exactly on fixture data") {
    val d = "/root/testdata/sf0.001"
    val px = graft.ops.Tables.pixels(spark, d)
    val got = graft.ops.Extracts.guidedMedianMad(px, "asdf_id", "value")
      .orderBy("asdf_id").collect()
    val exact = px.groupBy("asdf_id")
      .agg(expr("median(value)").as("m"))
      .join(px, Seq("asdf_id"))
      .groupBy(col("asdf_id"), col("m"))
      .agg(expr("median(abs(value - m))").as("md"))
      .orderBy("asdf_id").collect()
    assert(got.length == exact.length)
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-6 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    got.zip(exact).foreach { case (g, e) =>
      assert(close(g.getDouble(1), e.getDouble(1)) &&
        close(g.getDouble(2), e.getDouble(2)),
        s"median/mad diverged at zone ${g.get(0)}: " +
          s"(${g.getDouble(1)}, ${g.getDouble(2)}) vs " +
          s"(${e.getDouble(1)}, ${e.getDouble(2)})")
    }
  }
}
