package graft.plans

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Cross-query subplan memoization as a Catalyst optimizer rule — the
  * optimizer-level form of the reference's content-addressed cache
  * (SURVEY.md §4 "optional later: a Rule[LogicalPlan] that rewrites subtrees
  * matching cached keys").
  *
  * [[PlanCache.materialize]] persists a computation to Parquet and registers
  * its analyzed logical plan. The injected rule then walks every subsequent
  * query plan bottom-up; any subtree that [[LogicalPlan.sameResult]]-matches
  * a registered computation is replaced by a scan of the materialized
  * Parquet (with an aliasing Project so downstream attribute references keep
  * their expression ids). The effect: a query that *recomputes* a cached
  * extract silently becomes a query that *reads* it — pushdown-able,
  * pruneable, and at 100 TB the difference between a full fact-table pass
  * and a |zones|-row scan.
  *
  * Attach per-session via [[PlanCache.enable]] (uses
  * `spark.experimental.extraOptimizations`) or cluster-wide via
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
final class PlanCache(spark: SparkSession, root: String,
    maxEntries: Int = 64) {

  /** (registered plan, parquet path, analyzed scan-leaf of that path). The
    * leaf is captured at registration so [[RewriteRule.isCacheScan]] can
    * recognize "this subtree already reads the cache" structurally —
    * relation toString contains only the format name, never the path, so a
    * string match can not. */
  private val entries =
    mutable.ArrayBuffer.empty[(LogicalPlan, String, LogicalPlan)]

  private def dir(key: String) = s"$root/$key"

  /** Persist `df` under `key` and register its plan for rewriting. The
    * OPTIMIZED plan is registered: user-provided rules run after the main
    * optimizer batches, so incoming subtrees arrive in optimized form and
    * must be matched shape-for-shape (sameResult handles expr-id renaming,
    * not pushdown differences).
    *
    * The registry is bounded: beyond `maxEntries` the OLDEST registration
    * is evicted (FIFO — registrations are reusable artifacts, not hot
    * cache lines, so recency tracking inside the rule would buy little and
    * cost a write per optimizer invocation). Eviction only stops the rule
    * from rewriting to that artifact; the Parquet itself stays on disk. */
  def materialize(key: String, df: DataFrame): Unit = {
    val path = dir(key)
    // deregister the key's previous entry BEFORE writing: (a) a stale
    // (oldPlan -> samePath) registration would silently serve the new
    // key's data to queries matching the old computation; (b) with the
    // rule enabled, the overwrite's own input plan could otherwise be
    // rewritten to scan the very path mode("overwrite") is about to
    // delete, destroying the artifact mid-write
    entries.synchronized { entries.filterInPlace(_._2 != path) }
    df.write.mode("overwrite").parquet(path)
    val scanLeaf =
      spark.read.parquet(path).queryExecution.analyzed.collectLeaves().head
    entries.synchronized {
      entries += ((df.queryExecution.optimizedPlan, path, scanLeaf))
      if (entries.size > maxEntries) entries.remove(0, entries.size - maxEntries)
    }
  }

  def registered: Int = entries.synchronized(entries.size)

  /** The rewrite rule. `transformUp` so the largest cached subtree wins
    * after its children have been considered.
    *
    * The rule can run concurrently with [[materialize]] (it is installed
    * session- or cluster-wide), so it never reads the live buffer: it takes
    * one immutable snapshot under the same lock materialize writes under,
    * and matches against that. A materialize racing a query optimization is
    * then only ever invisible to that one optimization, never torn. */
  object RewriteRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val snap = entries.synchronized(entries.toList)
      if (snap.isEmpty) return plan
      plan.transformUp {
        case sub =>
          snap.find(_._1.sameResult(sub)) match {
            case Some((_, path, scanLeaf)) if !isCacheScan(sub, scanLeaf) =>
              val scan = spark.read.parquet(path).queryExecution.analyzed
              // remap the scan's fresh attributes onto the subtree's
              // expression ids so parent operators resolve unchanged;
              // sameResult guarantees positional output compatibility
              val aliases = sub.output.zip(scan.output).map { case (o, n) =>
                Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
              }
              Project(aliases, scan)
            case _ => sub
          }
      }
    }
    /** Structural "already reads this cache artifact" check: relation
      * toString carries only the format name (verified against Spark
      * 4.1.2), so the leaf is compared by sameResult against the scan
      * leaf captured at registration — without this the fixed-point
      * optimizer batch would re-wrap an already-rewritten subtree on
      * every iteration. */
    private def isCacheScan(plan: LogicalPlan, scanLeaf: LogicalPlan): Boolean =
      plan.collectLeaves().exists(_.sameResult(scanLeaf))
  }

  /** Attach to the live session. Idempotent. */
  def enable(): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRule

  def disable(): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteRule)
}

object PlanCache {
  /** Session-global registry used by the [[GraftExtensions]] injection path. */
  @volatile private[plans] var shared: Option[PlanCache] = None
  def install(spark: SparkSession, root: String): PlanCache = {
    val pc = new PlanCache(spark, root)
    shared = Some(pc)
    pc
  }
}

/** `spark.sql.extensions`-compatible injection point: the PlanCache rewrite
  * rule plus SQL names for the engine's native expressions
  * (`graft_dot`, `min_rolling_hash`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule { session =>
      new Rule[LogicalPlan] {
        override def apply(plan: LogicalPlan): LogicalPlan =
          PlanCache.shared.map(_.RewriteRule(plan)).getOrElse(plan)
      }
    }
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "graft_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DotProduct(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("min_rolling_hash"),
      new ExpressionInfo(classOf[graft.functions.MinRollingHash].getName, "min_rolling_hash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.MinRollingHash(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("walsh_sign_bits"),
      new ExpressionInfo(classOf[graft.functions.WalshSignBits].getName, "walsh_sign_bits"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.WalshSignBits(args(0), args(1))))
  }
}
