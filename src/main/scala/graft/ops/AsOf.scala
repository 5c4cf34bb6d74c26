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
  * "latest" ambiguous. The latest right row attaches AS A UNIT: its value
  * columns travel together in one struct through the window, so a NULL
  * value in that row stays NULL in the output (native ASOF semantics) —
  * per-column independent fill would stitch together a row that never
  * existed on the right side.
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
    val reserved = Seq("__tag", "__vals")
    val taken = reserved.filter(r =>
      left.columns.contains(r) || right.columns.contains(r))
    require(taken.isEmpty, s"column names reserved by the as-of join: $taken")
    val payload = left.columns.filterNot(c => c == key || c == tsCol).toSeq
    val valsType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)))
    val lSide = left.select(Seq(col(key), col(tsCol)) ++ payload.map(col) :+
      lit(null).cast(valsType).as("__vals") :+ lit(1).as("__tag"): _*)
    val rSide = right.select(Seq(col(key), col(tsCol)) ++
      payload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
      struct(valueCols.map(col): _*).as("__vals") :+ lit(0).as("__tag"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(Seq(col(key), col(tsCol)) ++ payload.map(col) ++
        valueCols.map(c => col(s"__vals.$c").as(c)): _*)
  }
}
