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

  /** Done-set state table (`_done/` under the version root): the set of
    * materialized keys, maintained at write/invalidate time so set-level
    * miss detection is one distributed anti-join instead of a per-key
    * filesystem probe loop — the reference's J4 likewise asks the *db*
    * for listings and touches the FS only per item
    * (`queue/extract_check.py:92-104`).
    *
    * Marks are BUFFERED and flushed in batches (on [[misses]], at 1024
    * pending, or via [[flushDone]]): a snapshot rewrite per materialized
    * key would make N fills O(N²) in done-set IO. Crash-safety comes from
    * the artifact tree staying authoritative: an artifact whose mark died
    * with the buffer is re-queued the next time [[getOrCompute]] probe-hits
    * it, so the set self-heals instead of diverging. At true 10⁶+ work
    * items the same layout maps onto a transactional table (Delta/Iceberg
    * MERGE) — this is the offline stand-in. */
  private lazy val doneSet = new StateTable(spark, dir("_done"), Seq("key"))
  private val pendingMarks = scala.collection.mutable.LinkedHashSet.empty[String]
  private val flushedMarks = scala.collection.mutable.HashSet.empty[String]

  private def queueMark(key: String): Unit = pendingMarks.synchronized {
    if (!flushedMarks.contains(key)) {
      pendingMarks += key
      if (pendingMarks.size >= 1024) flushLocked()
    }
  }

  private def flushLocked(): Unit =
    if (pendingMarks.nonEmpty) {
      import spark.implicits._
      doneSet.upsert(pendingMarks.toSeq.toDF("key"))
      doneSet.vacuum(keep = 16)
      flushedMarks ++= pendingMarks
      pendingMarks.clear()
    }

  /** Flush buffered marks to the done-set table now. */
  def flushDone(): Unit = pendingMarks.synchronized(flushLocked())

  /** Record keys as materialized (bulk; also callable by external writers
    * that populate the artifact tree out-of-band). One MERGE for the whole
    * frame; old done-set versions vacuum so a long-lived cache keeps O(1)
    * snapshot dirs. */
  def markDone(keys: DataFrame): Unit = {
    doneSet.upsert(keys.toDF("key"))
    doneSet.vacuum(keep = 16)
  }

  /** Rebuild the done set from ONE listing of the artifact tree (seeds
    * caches populated before the done set existed, or by writers that
    * bypassed [[markDone]]). Cost: one directory listing plus a `_SUCCESS`
    * check per *materialized* artifact — bounded by what exists, not by
    * the descriptor stream. */
  def reconcile(): Long = {
    import spark.implicits._
    val plain = Option(Paths.get(s"$root/$version").toFile.listFiles())
      .getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("bucketed_"))
      .filter(probePlain).toSeq
    val prefix = s"graft_cache_${rootTag}_${version}_"
    val bucketed = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith(prefix)).map(_.drop(prefix.length)).toSeq
    doneSet.commit((plain ++ bucketed).distinct.toDF("key"))
  }

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
    if (probePlain(key)) {
      // probe-hits re-queue the mark: an artifact whose original mark was
      // lost (crash between write and flush) heals here instead of being
      // recomputed forever
      queueMark(key)
      spark.read.parquet(dir(key))
    } else if (spark.catalog.tableExists(bucketTable(key))) {
      queueMark(key)
      spark.table(bucketTable(key)) // entry materialized in the bucketed layout
    } else if (dryRun) Ckpt.planOnly(compute) // probe-only: no checkpoint
    // materialization — under AQE even a lazy localCheckpoint would run
    // every upstream stage during frame CONSTRUCTION (see Ckpt.planOnly)
    else {
      compute.write.mode("overwrite").parquet(dir(key))
      queueMark(key)
      spark.read.parquet(dir(key))
    }
  }

  /** Anti-join miss detection over a descriptor frame carrying a `key`
    * column: which work units are not yet materialized (J4 / A13).
    *
    * Fully distributed: the done set lives in a [[StateTable]] maintained
    * at write time, so this is one `LEFT ANTI` join — no driver-side
    * collect of descriptor keys and no per-key filesystem probe loop,
    * which was a driver bottleneck at 10⁵+ work items. A cache populated
    * before the done set existed is seeded lazily via one [[reconcile]]
    * listing. AQE picks the join strategy (broadcast while the done set
    * is small, shuffle once it is not). The per-key FS probe survives
    * only on the single-item path ([[probe]]). */
  def misses(descriptors: DataFrame, keyCol: String = "key"): DataFrame = {
    flushDone()
    // NOTE: the returned frame is lazy and reads the done-set version
    // current NOW; execute it before many further cache mutations — each
    // flush commits a new version and vacuums old ones (keep=16), so a
    // frame held across 16+ later commits reads a deleted snapshot dir.
    val done = doneSet.read().orElse { reconcile(); doneSet.read() }
    done match {
      case Some(d) =>
        descriptors.join(d.withColumnRenamed("key", keyCol), Seq(keyCol), "left_anti")
      case None => descriptors
    }
  }

  /** Fill MANY missing keys with ONE Spark job (the batch side of
    * incremental view maintenance): write `df` partitioned by `partCol`
    * (whose values name the keys via `keyFor`), then promote each
    * partition directory to a plain cache key dir, stamping the
    * `_SUCCESS` marker the probe contract requires, and batch-mark the
    * done set. A per-key `getOrCompute` loop runs N sequential jobs where
    * this runs one — at 10⁵ partition-days the loop serializes on the
    * driver while this stays one distributed write.
    *
    * `partCol` is dropped from the data files by `partitionBy` (standard
    * Hive layout), so callers keep any needed copy of the value as a
    * separate data column. Returns the filled keys. */
  def fillManyPartitioned(df: DataFrame, partCol: String,
      keyFor: String => String): Seq[String] = {
    // reap staging dirs orphaned by crashed fills (UUID-named, so a retry
    // never reuses them) — but only stale ones, never a concurrent call's
    // active staging. Staleness checks the NEWEST mtime in the whole
    // subtree, not the root's: a long distributed write touches files
    // deep under _temporary/ without refreshing the staging root, so a
    // root-mtime check would reap an ACTIVE >1h write mid-job (the walk
    // only runs for dirs whose root already looks stale).
    val cutoff = System.currentTimeMillis() - 60 * 60 * 1000L
    // never FOLLOW symlinks (cycle → StackOverflowError); the link's own
    // mtime still counts via `f.lastModified` at the parent level
    def newestMtime(f: java.io.File): Long = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty)
        .filterNot(k => Files.isSymbolicLink(k.toPath))
      (f.lastModified +: kids.map(newestMtime).toSeq).max
    }
    Option(Paths.get(dir("")).toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("_staging_")
        && f.lastModified < cutoff && newestMtime(f) < cutoff)
      .foreach { d =>
        Files.walk(d.toPath).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.delete(f))
      }
    // per-call staging dir: two concurrent fills against one cache must
    // not interleave partition dirs in a shared staging root (the promote
    // loop would move a sibling's half-written output)
    val staging = Paths.get(dir(
      s"_staging_${java.util.UUID.randomUUID().toString.take(8)}"))
    df.write.mode("overwrite").partitionBy(partCol).parquet(staging.toString)
    val parts = Option(staging.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(s"$partCol="))
      .sortBy(_.getName)
    val partKeys = parts.map(p => p -> keyFor(p.getName.drop(partCol.length + 1)))
    // overwrite discipline (same ordering contract as [[invalidate]]):
    // delete-then-move is not atomic, so any key about to be overwritten
    // is UN-marked first — a crash mid-swap must leave "not done +
    // artifact torn" (misses() re-queues, refill overwrites — safe),
    // never "done + artifact gone" (readMany fails forever, because the
    // batch path's miss detection trusts the done set, not an FS probe)
    val overwrites = partKeys.collect {
      case (_, k) if Files.exists(Paths.get(dir(k))) => k
    }
    if (overwrites.nonEmpty) {
      pendingMarks.synchronized {
        pendingMarks --= overwrites; flushedMarks --= overwrites
      }
      doneSet.update(_.filter(!col("key").isin(overwrites.toIndexedSeq: _*)))
    }
    val keys = partKeys.map { case (p, key) =>
      val target = Paths.get(dir(key))
      if (Files.exists(target)) {
        target.toFile.listFiles().foreach(_.delete())
        Files.delete(target)
      }
      Files.move(p.toPath, target)
      Files.createFile(target.resolve("_SUCCESS"))
      queueMark(key)
      key
    }.toSeq
    // clear the staging root (only the top-level _SUCCESS remains)
    Option(staging.toFile.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    Files.deleteIfExists(staging)
    keys
  }

  /** Read MANY materialized plain-layout keys as ONE multi-path parquet
    * scan — the combine step of incremental view maintenance reads every
    * partial; N separate scans unioned cost N plan nodes + N directory
    * listings where one scan with N root paths costs one. Caller
    * guarantees the keys are materialized (e.g. via [[getOrCompute]],
    * whose write is eager) and share a schema. */
  def readMany(keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "readMany needs at least one key")
    spark.read.parquet(keys.map(dir): _*)
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
    // hit AND fill paths both queue the mark — the self-heal contract
    // (a mark lost before flush re-queues on next touch) must hold for
    // the engine's default bucketed layout too, not just plain dirs
    queueMark(key)
    spark.table(table)
  }

  def invalidate(key: String): Unit = {
    // un-mark FIRST: a crash mid-invalidate must leave "not done + artifact
    // still present" (recompute overwrites — safe), never "done + artifact
    // gone" (missed forever, downstream reads fail)
    pendingMarks.synchronized { pendingMarks -= key; flushedMarks -= key }
    doneSet.update(_.filter(col("key") =!= key))
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

object Cache {
  /** A content-fingerprinted cache root for memoizing derived partials of a
    * source table: mixes the table's file listing (names, sizes, mtimes)
    * into the key so a fixture regenerated AT THE SAME PATH versions the
    * cache instead of probe-hitting stale partials. Shared by the
    * incremental-maintenance query and its spec — the root derivation is a
    * contract, not an implementation detail. */
  def contentRoot(prefix: String, sfDir: String, table: String): String = {
    val src = new java.io.File(s"$sfDir/$table.parquet")
    // the fixture may be a single parquet FILE or a directory of parts —
    // fingerprint whichever exists (listFiles() is null for a plain file)
    val files =
      if (src.isFile) Array(src)
      else Option(src.listFiles()).getOrElse(Array.empty).filter(_.isFile)
    val fp = files.sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    s"${sys.props("java.io.tmpdir")}/${prefix}_" +
      HashKey.sha1Hex(s"$sfDir|$fp").take(12)
  }
}
