package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** End-to-end pins for the round-9 128-bit promotions (the integer-overflow
  * class the decade oracle gates caught): the registered queries run on a
  * WHALE-CENTS fixture whose exact-integer intermediates exceed Long —
  * Σy² ≈ 2.8·10²⁰ per day-of-week, Σsc² ≈ 7·10²¹ per arm — and the emitted
  * values are asserted against BigInt-first-principles references computed
  * with the queries' own documented IEEE op order. Before the promotions
  * (DECIMAL(19,0)² → DECIMAL(38,0); closed-form products in DECIMAL(38,0)
  * with integral-divide back to Long) these inputs threw
  * ARITHMETIC_OVERFLOW under ANSI mode; the 100× corpora that originally
  * proved the fixes live in /tmp and vanish, so this spec is the durable
  * regression gate.
  */
class OverflowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 14 days × 4 users, every event ≈ $42M: per-day cents ≈ 1.68·10¹⁰
  // (squares past Long), per-user 14-day totals ≈ 5.9·10¹⁰ (squares past
  // Long AND past double-exact 2⁵³ — the decimal path must carry them).
  // Values are offset by (day + u) so no group degenerates to var = 0.
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_overflow").toString
    val rows = for {
      day <- 0 until 14
      u <- 0 until 4
    } yield (day.toLong * 4 + u,
      java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"),
      u.toLong, "purchase", 4.2e7 + day + u, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  /** cents(value) for this fixture, exactly (the doubles involved are
    * integers below 2⁵³, so floor(v·100 + 0.5) is exact). */
  private def cents(day: Int, u: Int): BigInt =
    BigInt(4200000000L) + 100 * (day + u)

  test("seasonal_anomaly carries day-of-week Σy² past Long (128-bit path)") {
    val got = SparkEntry.queries("seasonal_anomaly")(spark, dir)
      .select("day", "y", "z_r", "is_anom")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDouble(2), r.getBoolean(3)))
    assert(got.length == 14)
    // reference: per-day y, grouped by (epochDay % 7), n = 2 per dow
    val y = (0 until 14).map(d => (0 until 4).map(u => cents(d, u)).sum)
    assert(y.forall(v => v * v > BigInt(Long.MaxValue)),
      "fixture must force the per-day square past Long")
    val byDow = (0 until 14).groupBy(d => (19723 + d) % 7)
    val expected = (0 until 14).map { d =>
      val grp = byDow((19723 + d) % 7)
      val s1 = grp.map(y).sum
      val s2 = grp.map(g => y(g) * y(g)).sum
      val n = grp.size.toDouble
      val v = (s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1.0)
      val z = if (grp.size == 1 || v <= 0.0) 0.0
        else BigDecimal((y(d).toDouble - s1.toDouble / n) / math.sqrt(v))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (f"2024-01-${d + 1}%02d", y(d).toLong, z, math.abs(z) > 2.0)
    }
    assert(got.toSeq == expected)
  }

  test("ab_test carries per-arm Σsc² past Long and past 2^53 (128-bit path)") {
    val row = SparkEntry.queries("ab_test")(spark, dir)
      .select("n0", "n1", "mean0_r", "mean1_r", "lift_r", "t_r")
      .collect().head
    // reference: per-user 14-day totals, arms by user parity
    val sc = (0 until 4).map(u => (0 until 14).map(d => cents(d, u)).sum)
    assert(sc.forall(v => v * v > BigInt(Long.MaxValue)))
    def arm(a: Int) = Seq(a, a + 2).map(sc)
    def stats(a: Int) = {
      val s1 = arm(a).sum; val s2 = arm(a).map(v => v * v).sum
      val n = 2.0
      val mean = s1.toDouble / n
      val v = (s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1.0)
      (mean, v)
    }
    val ((m0, v0), (m1, v1)) = (stats(0), stats(1))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val se = math.sqrt(v0 / 2.0 + v1 / 2.0)
    assert(row.getLong(0) == 2 && row.getLong(1) == 2)
    assert(row.getDouble(2) == r6(m0) && row.getDouble(3) == r6(m1))
    assert(row.getDouble(4) == r6(m1 - m0))
    assert(row.getDouble(5) == (if (se == 0.0) 0.0 else r6((m1 - m0) / se)))
  }

  test("triangle closed forms: DECIMAL product, integral-divide back to Long") {
    import spark.implicits._
    // a 3M-doc megacluster: m(m−1)(m−2) ≈ 2.7·10¹⁹ overflows Long while
    // the triangle count C(m,3) = 4.5·10¹⁸ still fits — exactly the
    // intermediate-before-output gap the promotion closes
    val m = 3000000L
    val got = Seq(m).toDF("m")
      .select(expr("cast(m as decimal(38,0)) * (m - 1) * (m - 2) div 6")
        .as("t"))
      .collect().head.getLong(0)
    val want = BigInt(m) * (m - 1) * (m - 2) / 6
    assert(BigInt(m) * (m - 1) * (m - 2) > BigInt(Long.MaxValue))
    assert(want <= BigInt(Long.MaxValue) && BigInt(got) == want)
  }
}
