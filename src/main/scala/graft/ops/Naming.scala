package graft.ops

/** The reference's output column-name grammar (SURVEY.md §1.3):
  * `<dataset>.<filter>.<method>` where `<filter>` is a year, `"none"`, or a
  * 7-char hash prefix (reference: `queue/request_tools.py:659-686`,
  * `queue/templates/field_names.txt:5-12`). Categorical columns:
  * `<dataset>.<temporal>.categorical_<class>`
  * (`queue/request_tools.py:670-673`). MSR (aid) columns:
  * `<dataset>.<hash7>.{sum|potential|reliability}`
  * (`queue/request_tools.py:675-681`), except `worldbank*` datasets emit only
  * `sum` (`queue/request_tools.py:413-414`).
  *
  * Physical column names are sanitized with `__` (dots break Parquet/Spark
  * attribute resolution ergonomics — SURVEY.md §7.5.3); [[display]] renders
  * the reference's dotted form at the CSV edge.
  */
object Naming {
  val Sep = "__"

  /** Physical (sanitized) column name. */
  def col(dataset: String, filter: String, method: String): String =
    s"$dataset$Sep$filter$Sep$method"

  /** Categorical per-class column: `<dataset>.<temporal>.categorical_<class>`. */
  def categorical(dataset: String, temporal: String, cls: String): String =
    col(dataset, temporal, s"categorical_$cls")

  /** 7-char hash prefix used as the filter segment for msr columns
    * (`queue/request_tools.py:679`). */
  def hash7(hash: String): String = hash.take(7)

  /** The msr method triple for a dataset: `worldbank*` datasets only get
    * `sum` (`queue/request_tools.py:412-414`). */
  def msrMethods(dataset: String): Seq[String] =
    if (dataset.startsWith("worldbank")) Seq("sum")
    else Seq("sum", "potential", "reliability")

  def msrCols(dataset: String, hash: String): Seq[String] =
    msrMethods(dataset).map(m => col(dataset, hash7(hash), m))

  /** Reference-faithful dotted display name for the CSV edge. */
  def display(physical: String): String = physical.replace(Sep, ".")

  /** Inverse of [[display]] for reading reference-shaped CSV back. */
  def physical(displayName: String): String = displayName.replace(".", Sep)
}
