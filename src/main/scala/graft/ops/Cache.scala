package graft.ops

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-addressed result memoization — the reference's signature
  * workload-level optimization (SURVEY.md §4): every unit of work is keyed by
  * SHA-1 of its canonical-JSON descriptor ([[HashKey]]); completed work is
  * reused across requests, missing work is computed (or enqueued) once
  * (`queue/request_tools.py:37-45,383-447`).
  *
  * Layout mirrors the reference's partition-pruned cache tree
  * (`extracts/<version>/<boundary>/cache/<dataset>/...`,
  * `queue/extract_check.py:92-98`): one Parquet dir per key under `root`.
  * Probe = dir exists AND `_SUCCESS` marker present AND non-empty — the
  * reference's belt-and-suspenders artifact check
  * (`queue/extract_check.py:104`, `queue/msr_check.py:47-51`).
  */
final class Cache(spark: SparkSession, root: String, version: String = "v1") {
  private def dir(key: String) = s"$root/$version/$key"

  /** Catalog table names must be scoped to THIS cache instance (root +
    * version) — the session catalog is global, and an unscoped name would
    * let one cache's bucketed tables satisfy another cache's probe. */
  private val rootTag =
    HashKey.sha1Hex(root).take(8)
  private def bucketTable(key: String) = s"graft_cache_${rootTag}_${version}_$key"

  private def probePlain(key: String): Boolean = {
    val p = Paths.get(dir(key))
    Files.exists(p.resolve("_SUCCESS")) && {
      val files = p.toFile.listFiles()
      files != null && files.exists(f => f.getName.endsWith(".parquet") && f.length > 0)
    }
  }

  /** Q3 completion probe: present and non-empty — either layout (plain
    * key dir or bucketed catalog table). */
  def probe(key: String): Boolean =
    probePlain(key) || spark.catalog.tableExists(bucketTable(key))

  /** Memoized compute: return the cached frame if the probe passes, else
    * compute, persist (bucket-friendly single write), and read back. Reading
    * back (rather than returning `compute` directly) means downstream plans
    * see a plain Parquet scan — prunable and reusable. */
  def getOrCompute(key: String, dryRun: Boolean = false)(compute: => DataFrame): DataFrame = {
    if (probePlain(key)) spark.read.parquet(dir(key))
    else if (spark.catalog.tableExists(bucketTable(key)))
      spark.table(bucketTable(key)) // entry materialized in the bucketed layout
    else if (dryRun) compute
    else {
      compute.write.mode("overwrite").parquet(dir(key))
      spark.read.parquet(dir(key))
    }
  }

  /** Anti-join miss detection over a descriptor frame carrying a `key`
    * column: which work units are not yet materialized (J4 / A13). The
    * driver collects only distinct keys (one row per work unit — the
    * filesystem probe is inherently driver-side), and the done set flows
    * back as a broadcast anti-join rather than one giant `isin` expression,
    * which stops planning from degenerating at 10⁵ work items. */
  def misses(descriptors: DataFrame, keyCol: String = "key"): DataFrame = {
    val keys = descriptors.select(col(keyCol)).distinct().collect().map(_.getString(0))
    val done = keys.filter(probe).toSeq
    if (done.isEmpty) descriptors
    else {
      import spark.implicits._
      descriptors.join(broadcast(done.toDF(keyCol)), Seq(keyCol), "left_anti")
    }
  }

  /** Bucketed materialization (SURVEY.md §4 physical notes): extracts are
    * |zones|-keyed frames that get fold-joined on `asdf_id` at merge time;
    * persisting them bucketed by the merge key makes every downstream merge
    * join shuffle-free — the decisive layout at 100 TB, where the extract
    * cache is consulted by every request. Requires a session catalog
    * (embedded metastore locally; any HMS-compatible catalog on a cluster).
    */
  def getOrComputeBucketed(key: String, buckets: Int = 32,
      bucketCol: String = "asdf_id")(compute: => DataFrame): DataFrame = {
    val table = bucketTable(key)
    if (!spark.catalog.tableExists(table)) {
      compute.write
        .bucketBy(buckets, bucketCol)
        .sortBy(bucketCol)
        .option("path", dir(s"bucketed_$key"))
        .saveAsTable(table)
    }
    spark.table(table)
  }

  def invalidate(key: String): Unit = {
    Seq(Paths.get(dir(key)), Paths.get(dir(s"bucketed_$key"))).foreach { d =>
      if (Files.exists(d)) {
        d.toFile.listFiles().foreach(_.delete())
        Files.delete(d)
      }
    }
    if (spark.catalog.tableExists(bucketTable(key)))
      spark.sql(s"DROP TABLE `${bucketTable(key)}`")
  }
}
