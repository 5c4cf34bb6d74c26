package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] As-of (nearest-earlier) join — the canonical temporal operator
  * Spark's built-in joins lack: for every left row, attach the latest right
  * row with the same key and `right.ts <= left.ts` (e.g. stamp each event
  * with the most recent per-user snapshot).
  *
  * Implementation is the scale-safe union trick, not a range join: both
  * sides union with a tag, ONE hash shuffle on the key, and a running
  * last-non-null window carries each key's most recent right values forward
  * into the left rows. The window frame is running (unbounded preceding →
  * current row), so WindowExec streams it with O(1) carried state per
  * partition — no per-key loop, no range cross-join whose candidate count
  * depends on timestamp density, and the right side is never broadcast (it
  * may be fact-sized).
  *
  * Tie semantics: at equal (key, ts) the right row sorts BEFORE the left
  * row (tag order), so an exactly-simultaneous snapshot attaches — the
  * standard `<=` as-of bound. The caller must ensure (key, ts) is unique
  * WITHIN the right side; duplicate right timestamps per key would make
  * "latest" ambiguous. A NULL in a right value column is treated as absent
  * (last-non-null looks past it) — the SQL-standard gaps-and-islands fill.
  */
object AsOf {

  /** Left rows with `valueCols` from the latest right row at or before the
    * left row's `tsCol` (per `key`); left rows with no earlier right match
    * keep NULLs. `left` must carry `key` + `tsCol`; `right` must carry
    * `key` + `tsCol` + `valueCols`, with value column names disjoint from
    * the left schema. */
  def join(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "as-of join needs at least one value column")
    val clash = valueCols.filter(left.columns.contains)
    require(clash.isEmpty, s"right value columns collide with left: $clash")
    val payload = left.columns.filterNot(c => c == key || c == tsCol).toSeq
    val lSide = left.select(Seq(col(key), col(tsCol)) ++ payload.map(col) ++
      valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
      lit(1).as("__tag"): _*)
    val rSide = right.select(Seq(col(key), col(tsCol)) ++
      payload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      valueCols.map(col) :+ lit(0).as("__tag"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = valueCols.foldLeft(lSide.unionByName(rSide)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    attached.filter(col("__tag") === 1).drop("__tag")
  }
}
