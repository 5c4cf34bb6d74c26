package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient zonal aggregation (SURVEY.md §4 physical notes): a hot
  * zone (one boundary feature covering a large share of all pixels — think
  * "Russia ADM0" against a 0.05° grid) concentrates its whole partial
  * aggregate on one reducer. AQE's skew-join split does not help *aggregations*,
  * so for the algebraic methods we salt: phase 1 aggregates on
  * (zone, salt) — spreading a hot zone over `salts` reducers — and phase 2
  * combines the per-salt partials. Both phases are map-side-combinable hash
  * aggregates; correctness is exact for algebraic aggregates.
  */
object Skew {

  /** Salted equivalent of [[Extracts.extract]] for the algebraic methods.
    * Result is bit-identical grouping-wise to the unsalted version (double
    * summation order may differ — same caveat as any distributed sum).
    *
    * `saltCols` picks the stable columns the salt hashes — NOT
    * monotonically_increasing_id(), which a re-executed stage (fetch
    * failure, speculative retry) reassigns, moving rows between salt
    * buckets across attempts. Pass row-identity columns (record keys,
    * cell ids) when you have them: hashing only (value, weight) collapses
    * constant-valued rows — the nodata/zero-fill raster case — into ONE
    * bucket, reinstating the very straggler the salt exists to break.
    * The default falls back to (value, weight) for frames with no
    * identity columns; callers with constant fills must supply ids. */
  def extractSalted(pixels: DataFrame, method: String, salts: Int = 16,
      zone: String = "asdf_id", value: String = "value",
      weight: String = "weight",
      saltCols: Seq[String] = Seq.empty): DataFrame = {
    val z = col(zone)
    val v = col(value)
    val w = col(weight)
    val saltFrom =
      if (saltCols.nonEmpty) saltCols.map(col) else Seq(v, w)
    val salted = pixels.withColumn("__salt",
      pmod(hash(saltFrom: _*), lit(salts)))
    def twoPhase(phase1: Seq[Column], combine: Seq[Column], finalize: Column): DataFrame =
      salted.groupBy(z, col("__salt")).agg(phase1.head, phase1.tail: _*)
        .groupBy(z).agg(combine.head, combine.tail: _*)
        .select(z, finalize.as(method))
    method match {
      case "sum"   => twoPhase(Seq(sum(v).as("p")), Seq(sum("p").as("c")), col("c"))
      case "count" => twoPhase(Seq(count(v).as("p")), Seq(sum("p").as("c")), col("c"))
      case "min"   => twoPhase(Seq(min(v).as("p")), Seq(min("p").as("c")), col("c"))
      case "max"   => twoPhase(Seq(max(v).as("p")), Seq(max("p").as("c")), col("c"))
      case "mean" =>
        twoPhase(Seq(sum(v).as("s"), count(v).as("n")),
          Seq(sum("s").as("ss"), sum("n").as("nn")), col("ss") / col("nn"))
      case "weighted_mean" =>
        twoPhase(Seq(sum(v * w).as("vw"), sum(w).as("ww")),
          Seq(sum("vw").as("svw"), sum("ww").as("sww")), col("svw") / col("sww"))
      case "weighted_sum" =>
        twoPhase(Seq(sum(v * w).as("p")), Seq(sum("p").as("c")), col("c"))
      case "weighted_count" =>
        twoPhase(Seq(sum(w).as("p")), Seq(sum("p").as("c")), col("c"))
      case other =>
        throw new IllegalArgumentException(
          s"method $other is not algebraic; use Extracts.extract (holistic aggregates don't salt)")
    }
  }
}
