package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The "mean surface raster" path (SURVEY.md §2.4 A12; reference
  * `queue/request_tools.py:362-447`): filter a project-location point set by
  * attribute filters, allocate each project's monetary value evenly across
  * its surviving locations, then sum per grid cell. Per cell the output is
  * the `sum` / `potential` / `reliability` triple
  * (`queue/templates/field_names.txt:17-22`):
  *   - `sum`       = Σ amount/n_locations  (even-split allocation)
  *   - `potential` = Σ amount              (full value at every location)
  *   - `reliability` = sum / potential
  *
  * Scale: the per-project location count is a window over `project_id` — at
  * 100 TB this is one shuffle on `project_id` followed by one hash-agg
  * shuffle on `cell_id` (the 0.05° global grid is ~25.9M cells,
  * `queue/request_tools.py:65` — comfortably hash-aggregable). AQE handles
  * cell-level skew.
  */
object Msr {

  /** The DET filter algebra (SURVEY.md §2.2 P1-P4) applied to a locations
    * relation: each map entry `field -> values` is `field IN (values)`,
    * AND-ed; entries whose value list contains "All"/"None"/null are dropped
    * before application (`queue/request_tools.py:362-369`).
    */
  def normalizeFilters(filters: Map[String, Seq[String]]): Map[String, Seq[String]] =
    filters.filter { case (_, vs) =>
      !vs.exists(v => v == null || v == "All" || v == "None")
    }

  def applyFilters(locations: DataFrame, filters: Map[String, Seq[String]]): DataFrame =
    normalizeFilters(filters).foldLeft(locations) { case (df, (field, vs)) =>
      df.filter(col(field).isin(vs: _*))
    }

  /** Build the surface: `(cell_id, sum, potential, reliability)`. */
  def surface(locations: DataFrame,
              project: String = "project_id",
              cell: String = "cell_id",
              amount: String = "amount"): DataFrame = {
    val perProject = Window.partitionBy(col(project))
    locations
      .withColumn("alloc", col(amount) / count(lit(1)).over(perProject))
      .groupBy(col(cell))
      .agg(sum(col("alloc")).as("sum"), sum(col(amount)).as("potential"))
      .withColumn("reliability", col("sum") / col("potential"))
  }
}
