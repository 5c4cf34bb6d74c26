package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Ckpt._

/** The zonal-statistics aggregation catalog (SURVEY.md §2.4; reference
  * `extract_options`, `queue/extract_check.py:27-52`): group pixel/point
  * values by boundary feature (`asdf_id`), optional coverage-fraction
  * weight. Includes the reference's declared-future methods (`std, median,
  * majority, minority, unique, range, percentile, var, mode` — commented in
  * the reference catalog).
  *
  * Every method is a single-shuffle `HashAggregateExec` over built-in,
  * codegen'd aggregates (no UDAFs): partial aggregation happens map-side, so
  * at 100 TB each method moves only one partial-agg row per (zone ×
  * partition) through the exchange. `majority`/`minority`/`mode` pre-reduce
  * on (zone, class) first — two shuffles, but the second input is already
  * |zones|×|classes| rows, tiny at any scale.
  */
object Extracts {

  val methods: Seq[String] = Seq(
    "mean", "count", "sum", "min", "max",
    "weighted_mean", "weighted_count", "weighted_sum",
    "categorical", "reliability",
    "std", "median", "majority", "minority", "unique", "range",
    "percentile", "var", "mode",
    // [EXT] robust/ratio statistics beyond the reference catalog — the
    // screens a training-data pipeline layers on top of zonal stats
    "mad", "geomean", "harmonic",
    // [EXT] the 100 TB percentile: a mergeable sketch with bounded
    // reducer memory, where exact `percentile`/`median` buffer the whole
    // per-zone value set on one reducer (SCALE.md's holistic-aggregate
    // caveat, made an operator)
    "percentile_sketch",
    // [EXT] the 100 TB distinct count: HyperLogLog++ — O(registers) state
    // per zone where exact `unique` keeps the full per-zone value set in
    // the distinct aggregate's hash map
    "unique_sketch")

  /** Zonal aggregate of `value` (weighted by `weight` where applicable),
    * grouped by `zone`. Output column is named `method` (aliased by callers
    * via [[Naming]]). Deterministic: no order-dependent aggregates.
    *
    * @param classes  explicit pivot class list for `categorical`
    *                 (determinism rule — FIXTURES.md).
    * @param p        percentile fraction for `percentile`/`percentile_sketch`.
    * @param accuracy sketch accuracy for `percentile_sketch`: rank error is
    *                 bounded by n/accuracy per zone, state by O(accuracy).
    * @param rsd      relative standard deviation for `unique_sketch`
    *                 (HyperLogLog++ register budget).
    */
  def extract(
      pixels: DataFrame,
      method: String,
      zone: String = "asdf_id",
      value: String = "value",
      weight: String = "weight",
      cls: String = "cls",
      classes: Seq[String] = Nil,
      p: Double = 0.95,
      accuracy: Int = 10000,
      rsd: Double = 0.05): DataFrame = {
    val z = col(zone)
    val v = col(value)
    val w = col(weight)
    def agg1(c: Column): DataFrame = pixels.groupBy(z).agg(c.as(method))
    method match {
      case "mean"           => agg1(avg(v))
      case "count"          => agg1(count(v))
      case "sum"            => agg1(sum(v))
      case "min"            => agg1(min(v))
      case "max"            => agg1(max(v))
      case "weighted_mean"  => agg1(sum(v * w) / sum(w))
      case "weighted_count" => agg1(sum(w))
      case "weighted_sum"   => agg1(sum(v * w))
      case "std"            => agg1(stddev_samp(v))
      case "var"            => agg1(var_samp(v))
      case "median"         => agg1(median(v))
      case "percentile"     => agg1(percentile(v, lit(p)))
      case "percentile_sketch" =>
        // [EXT] sketch percentile (Greenwald-Khanna via percentile_approx):
        // partial sketches merge map-side, so a hot zone with 10⁹ values
        // costs O(accuracy) reducer state instead of buffering the value
        // set (what exact `percentile` does). Returns a VALUE FROM THE
        // DATASET whose rank r satisfies |r − p·n| ≤ n/accuracy — the
        // contract extract_percentile_sketch's oracle gate pins.
        agg1(percentile_approx(v, lit(p), lit(accuracy)))
      case "unique"         => agg1(count_distinct(v))
      case "unique_sketch"  =>
        // [EXT] HLL++ distinct (approx_count_distinct): register-array
        // partials merge map-side (register-wise max — order-independent,
        // so the estimate is DETERMINISTIC for a given multiset); a zone
        // with 10⁹ distinct values costs O(1/rsd²) state instead of a
        // distinct hash map. Standard error ≤ rsd·n; the
        // extract_unique_sketch oracle gate pins a 3·rsd band.
        agg1(approx_count_distinct(v, rsd))
      case "range"          => agg1(max(v) - min(v))
      case "categorical" =>
        // one column per class: <cls>-count pivot with an explicit class
        // list so the plan (and the oracle) has a stable schema
        // (`queue/templates/field_names.txt:27-32`).
        val pivoted = pixels.groupBy(z).pivot(cls, classes).count()
        classes.foldLeft(pivoted) { (df, c) =>
          df.withColumn(s"categorical_$c", coalesce(col(s"`$c`"), lit(0L)))
            .drop(c)
        }
      case "mode" =>
        // most frequent value; ties broken by smallest value (deterministic,
        // unlike the built-in `mode`): min(struct(-cnt, value)).
        pixels.groupBy(z, v).agg(count(lit(1)).as("cnt"))
          .groupBy(z)
          .agg(min(struct((-col("cnt")).as("neg"), v.as("pick"))).as("m"))
          .select(z, col("m.pick").as(method))
      case "majority" =>
        // most frequent class, ties → lexicographically smallest class
        // (SURVEY.md §2.5 W3 tie-break).
        pixels.groupBy(z, col(cls)).agg(count(lit(1)).as("cnt"))
          .groupBy(z)
          .agg(min(struct((-col("cnt")).as("neg"), col(cls).as("pick"))).as("m"))
          .select(z, col("m.pick").as(method))
      case "minority" =>
        pixels.groupBy(z, col(cls)).agg(count(lit(1)).as("cnt"))
          .groupBy(z)
          .agg(min(struct(col("cnt"), col(cls).as("pick"))).as("m"))
          .select(z, col("m.pick").as(method))
      case "mad" =>
        // [EXT] median absolute deviation — the robust dispersion screen
        // (outlier-insensitive, unlike std). Two stages: per-zone exact
        // median (|zones| rows), broadcast back over the pixel stream, then
        // a second exact median of |v - med|. The broadcast side is
        // aggregate output — tiny at any scale — so the fact table never
        // shuffles for the join; the two median aggregates are the only
        // exchanges. Matches DuckDB's mad() (interpolated, DOUBLE input).
        // Both median passes scan the same (zone, value) projection, so
        // checkpoint it once: the second pass reads the materialized
        // blocks instead of re-deriving the join/scan. DISK_ONLY, not
        // MEMORY_AND_DISK — a corpus-sized block set in the unified pool
        // strangles downstream execution under memory pressure (see
        // [[Ckpt]]); the ContextCleaner frees the blocks once the frame
        // is unreachable. LAZY, not eager: this constructor is reachable
        // from Cache.getOrCompute(dryRun = true), whose contract is
        // probe-only — an eager checkpoint here would scan the corpus
        // during a shadow probe.
        val medC = "__graft_mad_med"
        val pv = pixels.select(z, v)
          .diskCheckpointLazy()
        val med = pv.groupBy(z).agg(median(v).as(medC))
        pv.join(broadcast(med), zone)
          .groupBy(z).agg(median(abs(v - col(medC))).as(method))
      case "geomean" =>
        // [EXT] geometric mean via exp(avg(ln v)) — identical formulation
        // on the oracle side; value > 0 in this relation by construction
        agg1(exp(avg(log(v))))
      case "harmonic" =>
        // [EXT] harmonic mean = n / Σ(1/v) — rate-style averaging
        agg1(count(v) / sum(lit(1.0) / v))
      case "reliability" =>
        // sum / potential ratio (`queue/templates/field_names.txt:17-22`):
        // here `value` = realized amount, `weight` column = potential amount.
        pixels.groupBy(z)
          .agg(sum(v).as("sum"), sum(w).as("potential"))
          .withColumn(method, col("sum") / col("potential"))
      case other => throw new IllegalArgumentException(s"unknown extract method: $other")
    }
  }
}
