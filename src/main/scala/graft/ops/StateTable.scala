package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned Parquet state table — the offline stand-in for the reference's
  * mutable Mongo collections (`asdf.det` / `asdf.extracts` / `asdf.msr`,
  * SURVEY.md §1.1): reads always see one consistent committed version;
  * writes produce a new immutable version directory and atomically swap a
  * pointer file (write-temp + atomic move). Old versions are retained —
  * cheap history/debugging, bounded by [[vacuum]].
  *
  * This is deliberately a miniature of the transactional-table pattern
  * (Delta/Iceberg-style) built only on the filesystem primitives available
  * offline; on a cluster the same layout works on any HDFS-compatible FS
  * with atomic rename.
  */
final class StateTable(spark: SparkSession, dir: String, keys: Seq[String],
    leaseMs: Long = 10 * 60 * 1000L) {
  private val root = Paths.get(dir)
  private val pointer = root.resolve("_CURRENT")
  Files.createDirectories(root)

  private def currentVersion: Option[Long] =
    if (Files.exists(pointer)) Some(Files.readString(pointer).trim.toLong) else None

  /** Current committed snapshot (None before the first commit). */
  def read(): Option[DataFrame] =
    currentVersion.map(v => spark.read.parquet(root.resolve(s"v$v").toString))

  // ---- single-writer lease ---------------------------------------------
  // The table is SINGLE-WRITER by contract (the Mongo reference got
  // per-document atomicity for free; a snapshot table cannot): every
  // mutating entry point (commit / upsert / update / compact / vacuum /
  // consolidateArchive) runs under an exclusive lease held in `_LOCK`,
  // acquired with CREATE_NEW — the one atomic test-and-set a plain
  // filesystem offers — and a second writer FAILS LOUDLY with
  // ConcurrentModificationException instead of silently losing the other
  // writer's read-modify-write (two upserts that both read v_N would both
  // commit a v_{N+1}-style successor; one merge vanished). A lease left
  // by a CRASHED writer is stolen once it is older than `leaseMs`
  // (10 min default — an order of magnitude above any tick's
  // commit time; CronTick's crash-orphan healing period has the same
  // role queue-side). Residual windows, documented rather than hidden:
  // two stealers of the same stale lock can interleave delete/create
  // (loser's create fails loudly — safe — but the loser may first delete
  // the winner's fresh lock in a sub-millisecond window), and a writer
  // PAUSED past its whole lease (not crashed) can be stolen from — the
  // pointer-swap guard below re-checks lease ownership immediately
  // before the commit's atomic move, shrinking that window to the move
  // itself. This is the standard advisory-lease trade on a FS without
  // compare-and-swap file content; on HDFS-compatible stores the same
  // CREATE_NEW discipline holds.
  private val lockFile = root.resolve("_LOCK")
  private val leaseToken = java.util.UUID.randomUUID().toString
  private var leaseDepth = 0 // guarded by `synchronized` in withWriterLease

  private def contention(holder: String): Nothing =
    throw new java.util.ConcurrentModificationException(
      s"StateTable at $root is being written by another writer ($holder); " +
        "the table is single-writer — serialize writers or let the stale " +
        s"lease expire (leaseMs=$leaseMs)")

  private def tryLock(): Boolean =
    try {
      Files.writeString(lockFile,
        s"$leaseToken ${System.currentTimeMillis()}",
        java.nio.file.StandardOpenOption.CREATE_NEW)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }

  private def acquireLease(): Unit =
    if (!tryLock()) {
      val held = try Files.readString(lockFile) catch { case _: Exception => "" }
      val stale = held.split(" ") match {
        case Array(_, ts) =>
          try System.currentTimeMillis() - ts.toLong > leaseMs
          catch { case _: NumberFormatException => true }
        case _ => true // vanished or unparseable: treat as stale, retry once
      }
      if (!stale) contention(held.takeWhile(_ != ' '))
      // delete ONLY if the lock still holds the exact content we judged
      // stale — a fresh lock written by a concurrent stealer in between
      // survives (shrinks the documented delete/create window to the
      // re-read-to-delete gap; commit's staging-dir rename makes even
      // that residue write-write safe)
      try {
        val now = try Files.readString(lockFile) catch { case _: Exception => "" }
        if (now == held) Files.deleteIfExists(lockFile)
      } catch { case _: Exception => () }
      if (!tryLock()) contention("concurrent steal")
    }

  private def releaseLease(): Unit =
    try {
      if (Files.exists(lockFile)
          && Files.readString(lockFile).startsWith(leaseToken))
        Files.delete(lockFile)
    } catch { case _: Exception => () }

  private def withWriterLease[T](f: => T): T = synchronized {
    if (leaseDepth > 0) { leaseDepth += 1; try f finally leaseDepth -= 1 }
    else {
      acquireLease()
      leaseDepth = 1
      try f finally { leaseDepth = 0; releaseLease() }
    }
  }

  /** Commit a full new snapshot: write a uniquely-named staging dir, then
    * atomically rename it to `v{N+1}/` and atomically swap the pointer.
    * Readers only ever follow the pointer, so a crashed writer leaves
    * garbage data but never a torn table. Writer-exclusive: runs under
    * the single-writer lease (see above), and re-checks lease ownership
    * immediately before the version rename + pointer swap so a stolen
    * lease aborts loudly instead of clobbering the stealer's commit.
    *
    * The per-attempt-unique staging dir (not `overwrite` into `v$next`
    * directly) closes the one write-write hazard the advisory lease
    * leaves open: two writers racing through the vanished-lock steal
    * window could both believe they hold the lease and both compute the
    * same `next` — with a shared target path they would interleave part
    * files inside one version dir; with staging dirs the loser fails the
    * ownership re-check (or the rename) loudly and retries, and no
    * version dir is ever written by two writers. */
  def commit(df: DataFrame): Long = withWriterLease {
    val next = currentVersion.getOrElse(-1L) + 1
    val stage = root.resolve(
      s".tmpv_${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      df.write.mode("overwrite").parquet(stage.toString)
      val tmp = root.resolve(s"_CURRENT.tmp$next")
      Files.writeString(tmp, next.toString)
      // Ownership + progress re-check IMMEDIATELY before the destructive
      // step. A v$next left by a commit that crashed between its rename
      // and its pointer swap is unreferenced garbage — but a v$next that
      // is ALSO referenced by an advanced pointer is a stealer's live
      // commit, so an advanced pointer (>= next) aborts even if the lock
      // file momentarily carries our token again. Like acquireLease, a
      // window remains between these checks and deleteTree in which a
      // double-held lease can still collide; it is now one instruction
      // wide instead of spanning the tmp-pointer write.
      def ownedStill: Boolean =
        try Files.readString(lockFile).startsWith(leaseToken)
        catch { case _: Exception => false }
      if (!ownedStill) { Files.deleteIfExists(tmp); contention("lease stolen") }
      if (currentVersion.exists(_ >= next)) {
        Files.deleteIfExists(tmp)
        contention(s"pointer advanced past v$next — lease was stolen and re-committed")
      }
      val target = root.resolve(s"v$next")
      if (Files.exists(target)) {
        if (!ownedStill) { Files.deleteIfExists(tmp); contention("lease stolen") }
        deleteTree(target)
      }
      Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE)
      // Final narrowing: a stealer that completed its own rename +
      // pointer-swap inside the window between the checks above and our
      // deleteTree/move would have had its live v$next replaced by OUR
      // data. Re-read the pointer once more after the stage→target move:
      // if it advanced to >= next, the stealer won the version — abort
      // before REPLACE_EXISTING re-points it at a version dir that now
      // holds our rows (target stays behind; at the same version number
      // it IS the data the advanced pointer references, so readers stay
      // coherent either way).
      if (currentVersion.exists(_ >= next)) {
        Files.deleteIfExists(tmp)
        contention(s"pointer advanced to v$next during commit — aborting pointer swap")
      }
      Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      next
    } finally deleteTree(stage) // no-op on success (already renamed away)
  }

  /** MERGE: existing rows win, new rows insert; first commit just inserts.
    * `refreshCols` defaults EMPTY here — a generic state table keeps strict
    * insert-only MERGE semantics regardless of its schema; callers wanting
    * the queue's `$set {classification, priority, update_time}` refresh
    * (Q2) opt in explicitly. The lease spans the read AND the commit —
    * the whole read-modify-write is writer-exclusive, which is exactly
    * the lost-update window a commit-only lock would leave open. */
  def upsert(incoming: DataFrame, refreshCols: Seq[String] = Seq.empty): Long =
    withWriterLease {
      commit(read().map(Queue.upsert(_, incoming, keys, refreshCols))
        .getOrElse(incoming))
    }

  /** Apply a whole-table transformation transactionally (e.g. a Q1 status
    * transition). No-op (and no new version) before the first commit.
    * Lease spans read + commit (see [[upsert]]). */
  def update(f: DataFrame => DataFrame): Option[Long] =
    withWriterLease { read().map(f).map(commit) }

  private val archiveRoot = root.resolve("_archive")
  // names of batch dirs already merged into a combined batch, awaiting
  // their deferred sweep (see [[consolidateArchive]])
  private val doomedMarker = archiveRoot.resolve("_doomed.txt")

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))

  private def doomedNames: Set[String] =
    if (Files.exists(doomedMarker))
      Files.readString(doomedMarker).split("\n").filter(_.nonEmpty).toSet
    else Set.empty

  /** Reap `.tmp_*` write-staging dirs abandoned by crashed
    * compact/consolidate attempts: per-attempt-unique names mean no retry
    * ever overwrites them, so without this they accumulate forever (a
    * consolidation tmp alone is a full archive copy). Same discipline as
    * the Cache staging reaper — only subtrees whose NEWEST mtime is
    * stale, never an in-flight write. */
  private def reapStaleTmp(): Unit = {
    val cutoff = System.currentTimeMillis() - 3600 * 1000L
    // never FOLLOW symlinks: a cycle (dir symlink pointing at an
    // ancestor) would recurse to StackOverflowError; the link's own
    // mtime still counts via `f.lastModified` at the parent level
    def newest(f: java.io.File): Long = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty)
        .filterNot(k => Files.isSymbolicLink(k.toPath))
      (f.lastModified +: kids.map(newest).toSeq).max
    }
    Option(archiveRoot.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(".tmp_")
        && f.lastModified < cutoff && newest(f) < cutoff)
      .foreach(f => deleteTree(f.toPath))
  }

  /** Archived (terminal-history) rows, if any — one append-only batch per
    * [[compact]] call, read back as ONE multi-path scan, deduped by key:
    * archived rows are terminal (their content never changes), so a key
    * transiently present in two batches — a [[consolidateArchive]] that
    * crashed between its atomic move and the old-dir sweep — yields one
    * row, not duplicates, for every reader. The winner is DETERMINISTIC:
    * max (numeric batch version, batch name) per key — the version is
    * PARSED out of the `b<version>_<uuid>` name rather than compared
    * lexicographically, because unpadded names invert at ten (`"b10_x"`
    * sorts below `"b2_y"` as strings, which would hand the win to the
    * OLDER batch). Not dropDuplicates' arbitrary pick — so even if a
    * future writer ever violated terminal-immutability across batches,
    * every reader would still agree on the newest row rather than
    * diverge run-to-run. */
  def archive(): Option[DataFrame] = {
    val doomed = doomedNames
    val batches = Option(archiveRoot.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("b")
        && !doomed(f.getName))
      .map(_.toString).sorted
    if (batches.isEmpty) None
    else {
      import org.apache.spark.sql.functions._
      val df = spark.read.parquet(batches.toSeq: _*)
      val others = df.columns.filterNot(keys.contains).toSeq
      if (others.isEmpty) Some(df.dropDuplicates(keys))
      else Some(df
        .withColumn("_b", regexp_extract(input_file_name(), "/(b[^/]+)/[^/]+$", 1))
        .withColumn("_bv", regexp_extract(col("_b"), "^b(\\d+)", 1).cast("long"))
        .groupBy(keys.map(col): _*)
        .agg(max_by(struct(others.map(col): _*),
          struct(col("_bv"), col("_b"))).as("_w"))
        // restore the original column order and names
        .select(df.columns.toSeq.map(n =>
          if (keys.contains(n)) col(n) else col("_w").getField(n).as(n)): _*))
    }
  }

  /** Bound the archive's DIRECTORY count: [[compact]] appends one batch
    * dir per call, and an every-tick consumer (the submit-idempotence
    * anti-join, the orphan heal) would otherwise pay a multi-path scan
    * over thousands of tiny dirs after months of ticks. Above
    * `maxBatches`, merge everything into ONE combined batch under the
    * same write-temp + atomic-move discipline.
    *
    * The merged dirs are NOT deleted immediately: they go on a doomed
    * list ([[archive]] skips them) and are swept at the NEXT call — a
    * reader that listed the batch dirs before the merge keeps resolvable
    * paths for at least one full cycle, the same grace [[vacuum]]'s
    * version slack gives live readers (an immediate sweep made any held
    * lazy archive frame fail with FileNotFound mid-tick). Crash windows:
    * dying after the combined move but before the doomed write leaves
    * old + combined visible together — identical terminal content, so
    * [[archive]]'s key-dedup hides it and the next call re-merges; dying
    * mid-sweep leaves doomed entries whose dirs are already gone —
    * [[deleteTree]] is a no-op on missing paths. */
  def consolidateArchive(maxBatches: Int = 16): Unit = withWriterLease {
    reapStaleTmp()
    // phase 2 of the PREVIOUS consolidation: sweep what it doomed
    doomedNames.foreach(n => deleteTree(archiveRoot.resolve(n)))
    if (Files.exists(doomedMarker)) Files.delete(doomedMarker)
    val batches = Option(archiveRoot.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("b")).sortBy(_.getName)
    if (batches.length > maxBatches) {
      val combined = spark.read.parquet(batches.map(_.toString).toSeq: _*)
        .dropDuplicates(keys)
      val name = s"b${currentVersion.getOrElse(0L)}_c" +
        java.util.UUID.randomUUID().toString.take(8)
      val tmp = archiveRoot.resolve(s".tmp_$name")
      combined.write.mode("overwrite").parquet(tmp.toString)
      Files.move(tmp, archiveRoot.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      // phase 1: doom the merged dirs (write-temp + atomic move)
      val markerTmp = archiveRoot.resolve(".tmp_doomed")
      Files.writeString(markerTmp, batches.map(_.getName).mkString("\n"))
      Files.move(markerTmp, doomedMarker, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Live ∪ archive — the full-history view ([[read]] is the live view).
    * Live wins on key overlap: a compaction that archived rows but
    * crashed before committing their removal leaves the same key on both
    * sides until the retry — this view must not show it twice. */
  def readAll(): Option[DataFrame] = (read(), archive()) match {
    case (Some(l), Some(a)) =>
      val keyCols = keys.map(org.apache.spark.sql.functions.col)
      Some(l.unionByName(a.join(l.select(keyCols: _*), keys, "left_anti")))
    case (l, a) => l.orElse(a)
  }

  /** Terminal-state compaction: `doomed` selects rows that are finished
    * (terminal status, aged out, …); they move from the live snapshot into
    * an append-only archive batch. [[vacuum]] bounds VERSIONS — this
    * bounds live ROWS, so a scan of the live table stays proportional to
    * in-flight work even after millions of completed rows. History stays
    * durable and queryable through [[archive]]/[[readAll]].
    *
    * Crash safety: rows already present in the archive are excluded from
    * the new batch (one anti-join), so a compaction that died between the
    * archive write and the commit cannot double-archive its rows on retry
    * — even when unrelated commits bumped the version in between (batch
    * dirs are never assumed re-runnable in place). If everything doomed
    * was already archived by such a crashed attempt, the batch write is
    * skipped but the live removal still commits. Returns the new live
    * version, or None when nothing matched. */
  def compact(doomed: DataFrame => DataFrame): Option[Long] =
    withWriterLease { read().flatMap { df =>
      val keyCols = keys.map(org.apache.spark.sql.functions.col)
      val dead = doomed(df)
      if (dead.isEmpty) None
      else {
        val unarchived = archive() match {
          case Some(a) => dead.join(a.select(keyCols: _*), keys, "left_anti")
          case None => dead
        }
        if (!unarchived.isEmpty) {
          Files.createDirectories(archiveRoot)
          reapStaleTmp()
          // write-temp + ATOMIC move under a per-attempt unique name:
          // [[archive]] has no _SUCCESS gate, so a torn direct write at a
          // version-derived path would (a) be read back as real rows and
          // (b) be OVERWRITTEN by a same-version retry — whose anti-join
          // excluded the torn rows — permanently losing the partially
          // archived rows from both live and archive. Dot-prefixed tmp
          // dirs are invisible to archive(); an abandoned tmp from a
          // crashed attempt is dead weight, never data.
          val batch = s"b${currentVersion.get}_" +
            java.util.UUID.randomUUID().toString.take(8)
          val tmp = archiveRoot.resolve(s".tmp_$batch")
          unarchived.write.mode("overwrite").parquet(tmp.toString)
          Files.move(tmp, archiveRoot.resolve(batch),
            StandardCopyOption.ATOMIC_MOVE)
        }
        Some(commit(df.join(dead.select(keyCols: _*), keys, "left_anti")))
      }
    } }

  def versions: Seq[Long] =
    if (!Files.exists(root)) Seq.empty
    else root.toFile.listFiles.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .map(_.getName.drop(1).toLong).sorted

  /** Drop all but the newest `keep` versions. */
  def vacuum(keep: Int = 2): Unit = withWriterLease {
    val cur = currentVersion.getOrElse(return)
    versions.filter(_ <= cur).dropRight(keep)
      .foreach(v => deleteTree(root.resolve(s"v$v")))
  }
}
