package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-contract register itself (round-14 verdict #3/#4): a
  * round where queries crash OR silently vanish from the register must
  * fail HERE, in CI, not read as a shorter-but-green correctness file.
  * The count moves only with a deliberate edit of this spec — that is
  * the point. */
class RegisterSpec extends AnyFunSuite {

  /** The authoritative register size. Update this number IN THE SAME
    * COMMIT that adds or retires a query, never to silence a failure. */
  val PinnedSize = 205 // r16: +dedup_spans, +dedup_spans_cut, +dsir_weights

  test("query register size is pinned — silent shrinkage fails the build") {
    assert(SparkEntry.queries.size == PinnedSize,
      s"register holds ${SparkEntry.queries.size} queries, pinned " +
        s"$PinnedSize — if this change is deliberate, update PinnedSize " +
        "in the same commit; if not, a query was silently dropped")
  }

  test("core and ext registries collide on no key (toMap would silently drop one)") {
    val core = QueriesCore.all.map(_._1)
    val ext = QueriesExt.all.map(_._1)
    val dupCore = core.diff(core.distinct).distinct
    val dupExt = ext.diff(ext.distinct).distinct
    val overlap = core.toSet.intersect(ext.toSet)
    assert(dupCore.isEmpty, s"duplicate keys in QueriesCore: $dupCore")
    assert(dupExt.isEmpty, s"duplicate keys in QueriesExt: $dupExt")
    assert(overlap.isEmpty, s"keys registered in BOTH registries: $overlap")
  }

  test("every registered query carries a DuckDB oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without an oracle (driver degrades them to a weaker " +
        s"rows-only check): ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("scale-oracle overrides only name registered queries") {
    val stray = SparkEntry.oracleSqlScale.keySet -- SparkEntry.queries.keySet
    assert(stray.isEmpty, s"scale oracles for unknown queries: $stray")
  }
}
