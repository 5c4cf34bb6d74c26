package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in [[QueriesCore]] (reference operators, SURVEY.md §2) and
  * [[QueriesExt]] (streaming + LLM-pipeline [EXT] operators, §2.10-§2.11).
  */
object SparkEntry {
  private lazy val registry: Map[String, Q] = (QueriesCore.all ++ QueriesExt.all).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full spine (SURVEY.md §7.3 M0): scan → broadcast zone join →
    * extract aggregations → naming grammar → wide merge → ordered result. */
  def entry(spark: SparkSession): DataFrame =
    registry("merge_wide").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }

  /** Memoized derived substrates (see [[QueriesExt.substrates]]): the
    * bench forces and times each build up front so the shared-frame
    * cost is visible in the artifact instead of hiding in whichever
    * consumer's warm-up runs first. */
  def substrates: Seq[(String, (SparkSession, String) => DataFrame)] =
    QueriesExt.substrates

  /** Scale-gate oracle overrides (10×/100× adversarial gates): group-grain
    * quotient rewrites for the queries whose registered node-grain oracles
    * are DuckDB-infeasible on megacluster corpora. Proven row-identical to
    * the registered forms at sf0.001/sf0.01; consumed by
    * `tools/oracle_check.py --scale` via Verify's `oracle_sql_scale.json`. */
  def oracleSqlScale: Map[String, String] = QueriesExt.scaleOracleSql
}
