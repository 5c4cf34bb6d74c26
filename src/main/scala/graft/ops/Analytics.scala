package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] batch event analytics (SURVEY.md §2.11): ordered-funnel stage
  * resolution and weekly cohort retention over the batch view of `events`.
  * No reference citation — these are the event-log counterparts of the
  * streaming windows in [[graft.streaming.Streamy]], specified against the
  * driver's `events` fixture.
  */
object Analytics {

  /** Ordered funnel: for each user, the earliest `stages(0)` event, then the
    * earliest `stages(1)` strictly after it, and so on. One row per user
    * that reached stage 1, with nullable `t1..tN` timestamps and `stage` =
    * deepest stage reached (1-based).
    *
    * Scale shape: every step is a `user_id`-keyed aggregate or join, so the
    * whole chain sits on ONE hash partitioning that Spark's exchange reuse
    * carries across stages, and the stage frames shrink monotonically
    * (stage i+1's users are a subset of stage i's). No windows and no
    * range cross-join: at 100 TB this is k passes over an ever-smaller
    * keyed set, each with map-side partial `min`.
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "funnel needs at least two stages")
    val e = events.select(col("user_id"), col("event_type"), col("ts"))
    val first = e.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("ts").as("t1"))
    val full = stages.zipWithIndex.tail.foldLeft(first) { case (prev, (st, i)) =>
      val reached = e.filter(col("event_type") === st)
        .join(prev.select(col("user_id"), col(s"t$i")), Seq("user_id"))
        .filter(col("ts") > col(s"t$i"))
        .groupBy("user_id").agg(min("ts").as(s"t${i + 1}"))
      prev.join(reached, Seq("user_id"), "left")
    }
    val depth = (2 to stages.size).foldLeft(lit(1)) { (acc, i) =>
      acc + when(col(s"t$i").isNotNull, 1).otherwise(0)
    }
    full.withColumn("stage", depth)
  }

  /** Weekly cohort retention: users are bucketed by first-seen day (UTC);
    * activity is counted as distinct users per (cohort day, whole weeks
    * since first seen). Day arithmetic is integer (`datediff / 7` floored),
    * so both engines make identical bucket decisions — no timestamp math.
    *
    * Scale shape: the cohort frame is one `user_id` aggregate; the join
    * back reuses that partitioning; the final rollup shuffles only
    * (cohort_day, week_off) — a frame bounded by days × weeks, not by
    * event volume. `countDistinct` keeps its partial aggregation.
    */
  def retention(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = e.groupBy("user_id").agg(min("day").as("cohort_day"))
    e.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"),
        floor(datediff(col("day"), col("cohort_day")) / 7).cast("long").as("week_off"))
      .agg(countDistinct(col("user_id")).as("users"))
  }

  /** Binned two-sample Kolmogorov-Smirnov D — the exact `ks_drift`
    * query's BOUNDED-STATE degrade path (X73). The exact form collapses
    * each zone to its distinct-value support before the CDF window; a
    * zone whose support is itself data-sized (continuous measurements,
    * no ties) would serialize that support into one window task. This
    * form first quantizes values onto a fixed `bins`-cell grid between
    * the GLOBAL integer-cent bounds (one 1-row broadcast), so per-zone
    * CDF state is ≤ `bins` rows NO MATTER the support — the price is
    * resolution: binned D underestimates exact D by at most the largest
    * in-bin CDF mass (≈ the densest cell's share). All grid arithmetic
    * is integer (`(c − lo)·bins div (hi − lo + 1)` — monotone,
    * tie-preserving, overflow-safe to ~3·10¹⁶ cent-range·bins), so both
    * engines bin identically and the only floats are the two final CDF
    * divisions, rounded before the max (round-before-rank rule).
    *
    * Input: one row per observation with `zone`, integer-cent value `c`,
    * and indicator columns `a`/`b` (1 for membership in each sample).
    * Output: (zone, n_a, n_b, ks_d). */
  def ksBinned(samples: DataFrame, zone: String = "asdf_id",
      bins: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = samples.agg(min("c").as("glo"), max("c").as("ghi"))
    val g = samples.crossJoin(broadcast(bounds))
      .select(col(zone),
        expr(s"((c - glo) * $bins) div (ghi - glo + 1)").as("bin"),
        col("a"), col("b"))
      .groupBy(col(zone), col("bin"))
      .agg(sum("a").as("ca"), sum("b").as("cb"))
    val w = Window.partitionBy(zone).orderBy("bin")
    val tot = Window.partitionBy(zone)
    g.withColumn("cuma", sum("ca").over(w))
      .withColumn("cumb", sum("cb").over(w))
      .withColumn("na", sum("ca").over(tot))
      .withColumn("nb", sum("cb").over(tot))
      .groupBy(col(zone))
      .agg(max("na").as("n_a"), max("nb").as("n_b"),
        max(round(abs(col("cuma").cast("double") / col("na")
          - col("cumb").cast("double") / col("nb")), 6)).as("ks_d"))
  }
}
