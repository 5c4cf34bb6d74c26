package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.StateTable

class StateTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def fresh() = new StateTable(spark,
    Files.createTempDirectory("graft_state").toString, Seq("id"))

  test("empty before first commit; snapshot after") {
    val t = fresh()
    assert(t.read().isEmpty)
    t.commit(Seq((1L, 0)).toDF("id", "status"))
    assert(t.read().get.count() == 1)
  }

  test("upsert merges with existing-wins semantics across versions") {
    val t = fresh()
    t.upsert(Seq((1L, 1), (2L, 2)).toDF("id", "status"))
    t.upsert(Seq((2L, 0), (3L, 0)).toDF("id", "status"))
    val out = t.read().get.as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1, 2L -> 2, 3L -> 0)) // 2 kept its state
    assert(t.versions == Seq(0L, 1L))
  }

  test("update applies a transactional transition (Q1)") {
    val t = fresh()
    t.commit(Seq((1L, 0), (2L, 0)).toDF("id", "status"))
    t.update(df => df.withColumn("status",
      when(col("id") === 2L, 2).otherwise(col("status"))))
    val out = t.read().get.as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 2))
  }

  test("old versions remain readable until vacuum") {
    val t = fresh()
    (0 until 4).foreach(i => t.commit(Seq((i.toLong, i)).toDF("id", "status")))
    assert(t.versions.size == 4)
    t.vacuum(keep = 2)
    assert(t.versions.size == 2)
    assert(t.read().get.as[(Long, Int)].collect().head == ((3L, 3)))
  }

  test("compact moves terminal rows to the archive; live stays bounded") {
    val t = fresh()
    t.commit(Seq((1L, 1), (2L, 0), (3L, -2), (4L, -1)).toDF("id", "status"))
    assert(t.compact(_.filter(col("status").isin(1, -2))).isDefined)
    // live = in-flight only
    assert(t.read().get.as[(Long, Int)].collect().toMap == Map(2L -> 0, 4L -> -1))
    // archive holds the terminal history; readAll is the union
    assert(t.archive().get.as[(Long, Int)].collect().toMap == Map(1L -> 1, 3L -> -2))
    assert(t.readAll().get.count() == 4)
    // nothing terminal left: no new version, no empty archive batch
    val vBefore = t.versions.size
    assert(t.compact(_.filter(col("status").isin(1, -2))).isEmpty)
    assert(t.versions.size == vBefore)
    // later completions append a second batch; both batches stay readable
    t.update(df => df.withColumn("status",
      when(col("id") === 2L, 1).otherwise(col("status"))))
    t.compact(_.filter(col("status").isin(1, -2)))
    assert(t.read().get.as[(Long, Int)].collect().toMap == Map(4L -> -1))
    assert(t.archive().get.count() == 3)
    assert(t.readAll().get.count() == 4)
  }

  test("compact retry after a crash between archive write and commit") {
    val dir = Files.createTempDirectory("graft_state").toString
    val t = new StateTable(spark, dir, Seq("id"))
    t.commit(Seq((1L, 1), (2L, 0)).toDF("id", "status"))
    // simulate the crashed first attempt: the archive batch landed (with
    // the then-live status), but the live-removal commit was lost
    Seq((1L, 99)).toDF("id", "status")
      .write.parquet(s"$dir/_archive/b999")
    // overlap window: key 1 is on both sides — readAll shows it ONCE,
    // live value winning
    assert(t.readAll().get.count() == 2)
    assert(t.readAll().get.filter(col("id") === 1L)
      .as[(Long, Int)].collect().toSeq == Seq((1L, 1)))
    // retry: must not double-archive key 1, but must still remove it live
    assert(t.compact(_.filter(col("status") === 1)).isDefined)
    assert(t.read().get.as[(Long, Int)].collect().toMap == Map(2L -> 0))
    assert(t.archive().get.filter(col("id") === 1L).count() == 1)
    assert(t.readAll().get.count() == 2)
  }

  test("consolidateArchive merges batch dirs two-phase; readers keep one cycle of grace") {
    val dir = Files.createTempDirectory("graft_state").toString
    val t = new StateTable(spark, dir, Seq("id"))
    // 6 compacting rounds -> 6 archive batch dirs
    t.commit((1L to 6L).map(i => (i, 0)).toDF("id", "status"))
    (1L to 6L).foreach { i =>
      t.update(df => df.withColumn("status",
        when(col("id") === i, 1).otherwise(col("status"))))
      t.compact(_.filter(col("status") === 1))
    }
    def batchDirs = Option(new java.io.File(s"$dir/_archive").listFiles())
      .getOrElse(Array.empty).filter(f => f.isDirectory && f.getName.startsWith("b"))
    assert(batchDirs.length == 6)
    assert(t.archive().get.count() == 6)
    // below the threshold: no-op
    t.consolidateArchive(maxBatches = 16)
    assert(batchDirs.length == 6)
    // above the threshold, PHASE 1: combined batch written, old dirs
    // doomed but STILL ON DISK (a reader that listed them mid-tick keeps
    // resolvable paths), archive() already excludes them
    t.consolidateArchive(maxBatches = 4)
    assert(batchDirs.length == 7, "old dirs must survive one cycle")
    assert(t.archive().get.count() == 6)
    assert(t.archive().get.as[(Long, Int)].collect().toMap ==
      (1L to 6L).map(_ -> 1).toMap)
    // PHASE 2 (the next call): doomed dirs swept
    t.consolidateArchive(maxBatches = 16)
    assert(batchDirs.length == 1, s"expected 1 combined dir, got ${batchDirs.length}")
    assert(t.archive().get.count() == 6)
    // crash-between-move-and-doom simulation: an old-content batch dir
    // sits next to the combined one -- key-dedup hides it from readers
    t.archive().get.filter(col("id") === 3L)
      .write.parquet(s"$dir/_archive/b0_leftover")
    assert(batchDirs.length == 2)
    assert(t.archive().get.count() == 6, "key-dedup must hide the leftover")
    assert(t.readAll().get.count() == 6)
    // a full consolidation cycle absorbs and then sweeps it
    t.consolidateArchive(maxBatches = 1)
    t.consolidateArchive(maxBatches = 1)
    assert(batchDirs.length == 1 && t.archive().get.count() == 6)
  }

  test("archive winner parses the numeric batch version: b10 beats b2 " +
    "despite sorting below it lexicographically") {
    // Batch names are unpadded (b<version>_<uuid>), so string max inverts
    // at ten: "b10_x" < "b2_y". The winner must come from the NEWEST
    // version; a lexicographic pick would deterministically hand every
    // cross-batch rewrite to the stale row once a table reaches v10.
    val dir = Files.createTempDirectory("graft_state").toString
    val t = new StateTable(spark, dir, Seq("id"))
    Seq((1L, 2)).toDF("id", "status").write.parquet(s"$dir/_archive/b2_old")
    Seq((1L, 10)).toDF("id", "status").write.parquet(s"$dir/_archive/b10_new")
    assert(t.archive().get.as[(Long, Int)].collect().toMap == Map(1L -> 10))
    // and the consolidated-batch name form (b<version>_c<uuid>) parses too
    Seq((1L, 11)).toDF("id", "status").write.parquet(s"$dir/_archive/b11_cabc")
    assert(t.archive().get.as[(Long, Int)].collect().toMap == Map(1L -> 11))
  }

  // ---- single-writer lease (the concurrency contract) -------------------
  // The Mongo reference got per-document write atomicity for free; a
  // snapshot table cannot, so StateTable is single-writer by contract and
  // a second concurrent writer must FAIL LOUDLY rather than silently lose
  // the other writer's read-modify-write. These tests fail on the
  // pre-lease implementation (any interleaving of two upserts lost one).

  test("lease: a held foreign lease makes every mutator fail loudly; " +
    "reads stay live and nothing is clobbered") {
    val dir = Files.createTempDirectory("graft_lease").toString
    val t = new StateTable(spark, dir, Seq("id"))
    t.commit(Seq((1L, 0)).toDF("id", "status"))
    // a FRESH lease held by another writer
    val lock = java.nio.file.Paths.get(dir, "_LOCK")
    Files.writeString(lock, s"other-writer ${System.currentTimeMillis()}")
    intercept[java.util.ConcurrentModificationException] {
      t.upsert(Seq((2L, 0)).toDF("id", "status"))
    }
    intercept[java.util.ConcurrentModificationException] {
      t.update(_.withColumn("status", lit(9)))
    }
    intercept[java.util.ConcurrentModificationException] {
      t.compact(_.filter(col("status") === 0))
    }
    intercept[java.util.ConcurrentModificationException] { t.vacuum() }
    // readers are never blocked or corrupted by a held lease
    assert(t.read().get.as[(Long, Int)].collect().toSeq == Seq((1L, 0)))
    assert(t.versions == Seq(0L))
    // once the other writer releases, this writer proceeds (and releases
    // its own lease afterwards — a second mutation also succeeds)
    Files.delete(lock)
    t.upsert(Seq((2L, 0)).toDF("id", "status"))
    t.update(_.withColumn("status", col("status") + 1))
    assert(t.read().get.count() == 2)
    assert(!Files.exists(lock), "lease must be released after the mutation")
  }

  test("lease: a stale lease from a crashed writer is stolen; an " +
    "unparseable lock is treated as stale") {
    val dir = Files.createTempDirectory("graft_lease").toString
    val t = new StateTable(spark, dir, Seq("id"), leaseMs = 50L)
    val lock = java.nio.file.Paths.get(dir, "_LOCK")
    Files.writeString(lock,
      s"crashed-writer ${System.currentTimeMillis() - 1000L}")
    t.commit(Seq((1L, 0)).toDF("id", "status")) // steal succeeds
    assert(t.read().get.count() == 1)
    Files.writeString(lock, "garbage-without-timestamp")
    t.upsert(Seq((2L, 0)).toDF("id", "status"))
    assert(t.read().get.count() == 2)
  }

  test("lease: stolen mid-commit aborts BEFORE the pointer swap — the " +
    "stealer's table is never clobbered by the paused loser") {
    val dir = Files.createTempDirectory("graft_lease").toString
    val t = new StateTable(spark, dir, Seq("id"))
    t.commit(Seq((1L, 0)).toDF("id", "status"))
    // A writer paused past its whole lease: simulate the steal happening
    // DURING the snapshot write by evaluating a side-effecting expression
    // inside the committed frame (local mode: executor == this JVM/FS).
    val lock = java.nio.file.Paths.get(dir, "_LOCK")
    val steal = udf { (x: Long) =>
      Files.writeString(lock, s"thief ${System.currentTimeMillis()}"); x
    }
    intercept[java.util.ConcurrentModificationException] {
      t.commit(Seq((2L, 7)).toDF("id", "status")
        .withColumn("id", steal(col("id"))))
    }
    // the pointer is untouched: readers still see the pre-commit snapshot
    assert(t.read().get.as[(Long, Int)].collect().toSeq == Seq((1L, 0)))
    // and the thief's lease survives (the loser must not release it)
    assert(Files.readString(lock).startsWith("thief"))
  }

  test("lease: an ADVANCED POINTER aborts the commit even when the lock " +
    "still carries our token — the stealer's version dir survives") {
    // The r11-advisor window: a writer paused past its lease between the
    // ownership re-check and deleteTree could delete a stealer's live,
    // pointer-referenced v$next. The commit now also aborts when the
    // pointer has advanced to >= next — an advanced pointer proves a
    // stolen lease re-committed, regardless of what the lock says.
    val dir = Files.createTempDirectory("graft_leaseadv").toString
    val t = new StateTable(spark, dir, Seq("id"))
    t.commit(Seq((1L, 0)).toDF("id", "status"))
    // simulate the thief's COMPLETED commit (v1 + pointer swap) landing
    // while the loser's snapshot write is in flight, with the lock left
    // holding the LOSER's token (the double-hold shape where ownedStill
    // alone is satisfied and only the pointer tells the truth)
    val adv = udf { (x: Long) =>
      val v1 = java.nio.file.Paths.get(dir, "v1")
      Files.createDirectories(v1)
      Files.writeString(v1.resolve("_THIEF_MARKER"), "thief")
      val tmp = java.nio.file.Paths.get(dir, "_CURRENT.thief")
      Files.writeString(tmp, "1")
      Files.move(tmp, java.nio.file.Paths.get(dir, "_CURRENT"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      x
    }
    intercept[java.util.ConcurrentModificationException] {
      t.commit(Seq((2L, 7)).toDF("id", "status")
        .withColumn("id", adv(col("id"))))
    }
    // the stealer's version dir was NOT deleted and the pointer still
    // references it
    assert(Files.exists(java.nio.file.Paths.get(dir, "v1", "_THIEF_MARKER")),
      "loser deleted the stealer's committed version dir")
    assert(Files.readString(java.nio.file.Paths.get(dir, "_CURRENT")).trim == "1")
  }

  test("race: concurrent writers with retry-on-contention lose no update " +
    "(pre-lease, interleaved read-modify-writes silently dropped keys)") {
    val dir = Files.createTempDirectory("graft_race").toString
    val writers = 4; val perWriter = 5
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        try {
          val mine = new StateTable(spark, dir, Seq("id"))
          for (i <- 0 until perWriter) {
            var done = false
            while (!done) {
              try {
                mine.upsert(Seq((w * 100L + i, w)).toDF("id", "status"))
                done = true
              } catch {
                case _: java.util.ConcurrentModificationException =>
                  Thread.sleep(5) // contention is the CONTRACT; retry
              }
            }
          }
        } catch { case e: Throwable => failures.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"unexpected: ${failures.peek()}")
    val t = new StateTable(spark, dir, Seq("id"))
    val got = t.read().get.as[(Long, Int)].collect().toMap
    val want = (for (w <- 0 until writers; i <- 0 until perWriter)
      yield (w * 100L + i) -> w).toMap
    assert(got == want, "a concurrent read-modify-write was lost")
    assert(!Files.exists(java.nio.file.Paths.get(dir, "_LOCK")))
  }

  test("fuzz: 100 random upsert/update/compact/consolidate/restart " +
    "schedules match an in-memory model (no lost key, live∪archive " +
    "partition, live stays bounded)") {
    // The crash-path hardening (archive grace, doomed sweeps, anti-join
    // re-archive guards) accumulated piecemeal over rounds 4-5; this
    // model-checks the LAYER'S contract under arbitrary interleavings:
    //  - upsert is existing-wins MERGE against LIVE rows only (an
    //    archived id re-enters live — the Engine's archive anti-join is
    //    the layer above that prevents it; here it must merely not
    //    corrupt reads: readAll shows live winning);
    //  - compact moves terminal live rows to the archive, but an id
    //    ALREADY archived keeps its first archived status (the
    //    re-archive anti-join) while still leaving the live table;
    //  - consolidateArchive/restart/stale-tmp litter never change what
    //    any reader sees.
    for (seed <- 0 until 100) {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft_stfuzz$seed").toString
      var t = new StateTable(spark, dir, Seq("id"))
      val liveM = scala.collection.mutable.Map[Long, Int]()
      val archM = scala.collection.mutable.Map[Long, Int]()
      var n = 0L
      for (_ <- 0 until 4 + rnd.nextInt(4)) {
        rnd.nextInt(8) match {
          case 0 | 1 | 2 => // upsert: new ids + clobber attempts + re-entries
            // MERGE sources must be key-unique (the Engine dedups its
            // batches the same way) — keep the first row per id
            val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
              if ((liveM.nonEmpty || archM.nonEmpty) && rnd.nextInt(3) == 0) {
                val pool = (liveM.keySet ++ archM.keySet).toSeq.sorted
                (pool(rnd.nextInt(pool.size)), rnd.nextInt(4) - 2)
              } else { n += 1; (n, -1) }
            }.toList.distinctBy(_._1)
            t.upsert(rows.toDF("id", "status"))
            rows.foreach { case (id, st) =>
              if (!liveM.contains(id)) liveM(id) = st }
          case 3 => // transition: -1 -> 0 -> terminal (random terminal)
            val term = if (rnd.nextBoolean()) 1 else -2
            t.update(df => df.withColumn("status",
              when(col("status") === -1, 0)
                .when(col("status") === 0, term)
                .otherwise(col("status"))))
            liveM.mapValuesInPlace((_, s) =>
              if (s == -1) 0 else if (s == 0) term else s)
          case 4 => // terminal-state compaction
            t.compact(_.filter(col("status").isin(1, -2)))
            liveM.filterInPlace { (id, st) =>
              val terminal = st == 1 || st == -2
              if (terminal && !archM.contains(id)) archM(id) = st
              !terminal
            }
          case 5 => // archive-dir bound (semantics-free)
            t.consolidateArchive(maxBatches = 1 + rnd.nextInt(3))
          case 6 => // crash + restart
            t = new StateTable(spark, dir, Seq("id"))
          case 7 => // abandoned write-staging litter from a crashed attempt
            val tmp = java.nio.file.Paths.get(dir, "_archive",
              s".tmp_crashed${rnd.nextInt(100)}")
            java.nio.file.Files.createDirectories(tmp)
            tmp.toFile.setLastModified(
              System.currentTimeMillis() - 2 * 3600 * 1000L): Unit
        }
        // live view must equal the live model EVERY step
        val live = t.read().map(_.as[(Long, Int)].collect().toMap)
          .getOrElse(Map.empty)
        assert(live == liveM.toMap, s"seed=$seed live diverged")
      }
      // full-history view: live wins, archive fills in, nothing lost
      val expectAll = archM.toMap ++ liveM.toMap
      val all = t.readAll().map(_.as[(Long, Int)].collect()).getOrElse(Array.empty)
      assert(all.map(_._1).distinct.length == all.length,
        s"seed=$seed readAll must be key-unique")
      assert(all.toMap == expectAll, s"seed=$seed history diverged")
      // the archive holds only terminal statuses
      t.archive().foreach { a =>
        val bad = a.filter(!col("status").isin(1, -2)).count()
        assert(bad == 0, s"seed=$seed non-terminal rows in the archive")
      }
    }
  }

  // ---- O(batch) delta ingest (round-13 verdict #2) ------------------------

  def deltaDirs(dir: String): Seq[String] = {
    val d = new java.io.File(dir, "_delta")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("d"))
      .map(_.getName).sorted.toSeq
  }

  test("delta: appends are visible to read() with insert-only MERGE semantics") {
    val dir = Files.createTempDirectory("graft_delta").toString
    val t = new StateTable(spark, dir, Seq("id"))
    // delta-only table (no snapshot yet)
    t.appendDelta(Seq((1L, -1)).toDF("id", "status"))
    assert(t.read().get.as[(Long, Int)].collect().toMap == Map(1L -> -1))
    // snapshot wins on key overlap; earliest delta batch wins across batches
    t.commit(Seq((1L, 5)).toDF("id", "status"))
    t.appendDelta(Seq((2L, -1)).toDF("id", "status"))
    Thread.sleep(5) // distinct batch-name millis
    t.appendDelta(Seq((2L, 99), (3L, -1)).toDF("id", "status"))
    val out = t.read().get.as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 5, 2L -> -1, 3L -> -1),
      s"snapshot/earliest-wins merge broken: $out")
  }

  test("delta: a full commit folds batches into the snapshot; dirs sweep one cycle later") {
    val dir = Files.createTempDirectory("graft_deltafold").toString
    val t = new StateTable(spark, dir, Seq("id"))
    t.commit(Seq((1L, 0)).toDF("id", "status"))
    t.appendDelta(Seq((2L, -1)).toDF("id", "status"))
    val before = deltaDirs(dir)
    assert(before.size == 1)
    // the fold: an upsert derives from read() (snapshot + delta) and commits
    t.upsert(Seq((3L, -1)).toDF("id", "status"))
    assert(t.read().get.as[(Long, Int)].collect().toMap ==
      Map(1L -> 0, 2L -> -1, 3L -> -1))
    // the folded dir survives ONE cycle (grace for readers holding the old
    // lazy view), then sweeps at the next commit
    assert(deltaDirs(dir) == before, "folded delta swept without grace")
    t.commit(t.read().get)
    assert(deltaDirs(dir).isEmpty, "folded delta not swept at the next commit")
  }

  test("delta: a compacted key never resurrects from a folded-but-unswept batch") {
    val dir = Files.createTempDirectory("graft_deltares").toString
    val t = new StateTable(spark, dir, Seq("id"))
    t.commit(Seq((1L, 0)).toDF("id", "status"))
    t.appendDelta(Seq((2L, 1)).toDF("id", "status"))
    // fold the delta, then compact the delta-born key to the archive
    t.update(identity)
    t.compact(_.filter(col("id") === 2L))
    // the delta dir may still exist on disk (one-cycle grace) — the live
    // view must NOT resurrect id=2 from it
    val live = t.read().get.as[(Long, Int)].collect().toMap
    assert(live == Map(1L -> 0), s"compacted key resurrected: $live")
    // full-history view still serves it from the archive
    val all = t.readAll().get.as[(Long, Int)].collect().toMap
    assert(all == Map(1L -> 0, 2L -> 1))
  }

  test("delta: crash before the pointer swap leaves batches live (no lost rows)") {
    // a commit that wrote its version dir (with _FOLDED) but died before
    // the pointer swap must leave the deltas VISIBLE — the folded list is
    // only authoritative through the pointer
    val dir = Files.createTempDirectory("graft_deltacrash").toString
    val t = new StateTable(spark, dir, Seq("id"))
    t.commit(Seq((1L, 0)).toDF("id", "status"))
    t.appendDelta(Seq((2L, -1)).toDF("id", "status"))
    val batch = deltaDirs(dir).head
    // simulate the crashed commit: unreferenced v1_dead dir dooming the batch
    val dead = java.nio.file.Paths.get(dir, "v1_deadbeef")
    Files.createDirectories(dead)
    Files.writeString(dead.resolve("_FOLDED"), batch)
    val out = t.read().get.as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> -1),
      s"delta rows lost to an unreferenced _FOLDED list: $out")
  }

  test("vacuum reaps a same-number twin of the current version (loser garbage)") {
    val dir = Files.createTempDirectory("graft_twin").toString
    val t = new StateTable(spark, dir, Seq("id"))
    t.commit(Seq((1L, 0)).toDF("id", "status"))
    t.commit(Seq((1L, 1)).toDF("id", "status"))
    // a losing writer's unreferenced dir at the current version number
    val twin = java.nio.file.Paths.get(dir, "v1_loser000")
    Files.createDirectories(twin)
    Files.writeString(twin.resolve("junk"), "x")
    t.vacuum(keep = 2)
    assert(!Files.exists(twin), "same-number twin survived vacuum")
    // the real current version is untouched
    assert(t.read().get.as[(Long, Int)].collect().toMap == Map(1L -> 1))
  }

  test("vacuum race: a lease-stealer's commit landing after the pointer " +
      "read deletes nothing current (round-15 advisor double-read fix)") {
    // The pre-fix shape: vacuum read the pointer TWICE (number, then
    // name). A stealer's commit between the reads made `cur` the old
    // number and `curName` the new name, so the REAL current-version dir
    // matched the same-number-twin rule and was deleted. The hook fires
    // at exactly the historical window — after vacuum's (now single)
    // pointer read, before any delete — and a zero-lease stealer commits
    // there. The stolen writer's version and data must survive.
    val dir = Files.createTempDirectory("graft_vrace").toString
    val t = new StateTable(spark, dir, Seq("id"))
    t.commit(Seq((1L, 0)).toDF("id", "status")) // v0
    t.commit(Seq((1L, 1)).toDF("id", "status")) // v1 (current at read time)
    t.onVacuumAfterPointerRead = () => {
      // leaseMs = -1 makes ANY held lease stale to the stealer —
      // deterministic steal, no sleep in the test
      val stealer = new StateTable(spark, dir, Seq("id"), leaseMs = -1L)
      stealer.commit(Seq((1L, 2)).toDF("id", "status")) // v2, steals _LOCK
    }
    t.vacuum(keep = 1)
    val back = new StateTable(spark, dir, Seq("id"))
    assert(back.read().get.as[(Long, Int)].collect().toMap == Map(1L -> 2),
      "the lease-stealer's committed version was damaged by vacuum")
    // retention math stays relative to the version vacuum READ: v1 kept
    // (keep=1 of versions <= cur), v0 reaped, v2 untouched
    val names = new java.io.File(dir).listFiles.map(_.getName).toSet
    assert(!names.exists(_.startsWith("v0_")), "v0 should be vacuumed")
    assert(names.exists(_.startsWith("v2_")), "stolen-commit v2 must survive")
  }
}
