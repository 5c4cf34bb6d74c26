package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model._
import graft.ops.{Artifacts, Cache, StateTable}
import org.apache.spark.sql.functions._

/** The engine facade — the reference's cron driver
  * (`queue/processing.py:113-221`) as a library API. A user of the
  * reference maps directly: submit a request document, tick the queue (one
  * cron pass), fetch results/artifacts; every underlying capability
  * (extract catalog, msr, merge grammar, memoized cache, state machine) is
  * also available à la carte through the `ops` / `streaming` / `functions`
  * packages.
  *
  * State: requests live in a versioned [[StateTable]] (the `asdf.det`
  * stand-in); completed work lives in the content-addressed [[Cache]].
  */
final class Engine(
    val spark: SparkSession,
    workDir: String,
    bucketed: Boolean = true) {

  val cache = new Cache(spark, s"$workDir/cache")
  val pipeline = new Pipeline(spark, cache, bucketed = bucketed)
  private val states = new StateTable(spark, s"$workDir/state", Seq("id"))
  /** Durable request documents (the `asdf.det` body store): full typed
    * [[Request]] rows in a versioned state table, so a restarted engine
    * still holds every submitted body — the reference's requests survive
    * driver restarts in Mongo, and losing them here would strand pending
    * queue rows with no body to process. */
  private val requestStore = new StateTable(spark, s"$workDir/requests", Seq("id"))
  private val outDir = s"$workDir/out"

  import spark.implicits._

  private def now(): Long = System.currentTimeMillis() / 1000

  /** Submit (status -1 "new", submit stage stamped —
    * `queue/request_tools.py:153-161`). Idempotent on id — the request
    * store's MERGE keeps the first body, like the queue row. */
  def submit(req: Request): String = { submitAll(Seq(req)); req.id }

  /** Batch submit: ONE request-store MERGE and ONE queue-row MERGE for the
    * whole batch (a JSONL drop file submits hundreds of documents — one
    * snapshot rewrite per document would make ingest O(N²)). Both stores
    * vacuum to a bounded version count on every commit. */
  def submitAll(reqs: Seq[Request]): Seq[String] = {
    if (reqs.isEmpty) return Seq.empty
    val ts = now()
    val stamped = reqs.map(r =>
      r.copy(status = -1, stage = Seq(StageTime("submit", ts))))
    // MERGE sources must be key-unique: keep the first body per id
    val unique = stamped.groupBy(_.id).map(_._2.head).toSeq
    // idempotence must span the ARCHIVE too: the state MERGE's
    // existing-wins rule only sees live rows, so without this anti-join a
    // re-submitted id whose row was compacted to the archive would
    // re-enter the queue as new and reprocess — the reference's
    // find-then-insert runs against the full collection, which never
    // forgets a completed id
    val fresh = states.archive() match {
      case Some(arch) =>
        val archived = unique.map(_.id).toDF("id")
          .join(arch.select(col("id")), Seq("id"), "left_semi")
          .collect().map(_.getString(0)).toSet
        unique.filterNot(r => archived.contains(r.id))
      case None => unique
    }
    if (fresh.nonEmpty) {
      requestStore.upsert(fresh.toDS().toDF())
      requestStore.vacuum(keep = 4)
      states.upsert(fresh.map(r => (r.id, -1, ts)).toDF("id", "status", "submit_time"))
      states.vacuum(keep = 4)
    }
    reqs.map(_.id)
  }

  /** Status lookup spans live + archived rows: a compacted (terminal)
    * request still answers with its final status. */
  def status(id: String): Option[Int] =
    states.readAll().flatMap(df =>
      df.filter(col("id") === id).select("status")
        .collect().headOption.map(_.getInt(0)))

  /** One cron pass: drain new/waiting requests in priority order, process
    * each end-to-end, persist results + status transitions (1 complete /
    * -2 error), write the CSV + JSON echo artifacts. One state read up
    * front and ONE committed state version per tick; artifact writes are
    * per-request fault-contained (the result DataFrame is lazy — a runtime
    * failure surfaces here, not in Pipeline.tick's plan-time catch, and
    * must demote that request to -2 without aborting the batch). */
  def tick(base: DataFrame, pixels: DataFrame, locations: DataFrame): Map[String, Int] = {
    // heal submit-crash orphans first: a crash between the request-store
    // commit and the queue-row commit leaves a durable body with no queue
    // row — invisible to the pending filter forever. One queue-scale
    // anti-join re-inserts the missing rows each tick. The state side is
    // the FULL history view: a body whose state row was compacted to the
    // archive is finished work, not an orphan.
    (states.readAll(), requestStore.read()) match {
      case (Some(st), Some(bodies)) =>
        val orphans = bodies.select(col("id")).join(st.select(col("id")), Seq("id"), "left_anti")
          .collect().map(_.getString(0))
        if (orphans.nonEmpty)
          states.upsert(orphans.toSeq.map(id => (id, -1, now()))
            .toDF("id", "status", "submit_time"))
      case (None, Some(bodies)) =>
        // bootstrap crash window: bodies committed, state table never
        // created at all — seed it whole
        states.commit(bodies.select(col("id")).collect().map(_.getString(0)).toSeq
          .map(id => (id, -1, now())).toDF("id", "status", "submit_time"))
      case _ => ()
    }
    // only pending work reaches the driver, and only per tick: the status
    // predicate is pushed into the state scan and the request BODIES are
    // loaded by a semi-join against those pending ids — the driver heap
    // holds the live queue head, never the full (ever-growing) request
    // history. Bodies are durable in the request store; holding them in a
    // process-lifetime map would pin a multi-million-request backlog on
    // the driver for no reason. Drain order (stage[0] stamp, then id)
    // matches what a restarted engine reloads.
    val pending: Seq[Request] = (states.read(), requestStore.read()) match {
      case (Some(st), Some(bodies)) =>
        val ids = st.filter(col("status").isin(-1, 0)).select("id")
        bodies.join(ids, Seq("id"), "left_semi").as[Request].collect()
          .sortBy(r => (r.stage.headOption.map(_.time).getOrElse(0L), r.id))
          .toSeq
      case _ => Seq.empty
    }
    val outcomes = pipeline.tick(pending, base, pixels, locations).map {
      case (id, 1, result) =>
        try {
          result.write.mode("overwrite").parquet(s"$outDir/$id/results")
          Artifacts.writeCsv(result, s"$outDir/$id/results_csv")
          new java.io.File(s"$outDir/$id").mkdirs()
          Artifacts.writeRequestJson(
            Map("id" -> id, "complete_time" -> now()), s"$outDir/$id/request.json")
          id -> 1
        } catch { case scala.util.control.NonFatal(_) =>
          // a failure AFTER the results-parquet commit (CSV/JSON write)
          // must not leave a -2 request serving a complete-looking
          // result: results() keys on _SUCCESS, so drop the marker
          new java.io.File(s"$outDir/$id/results/_SUCCESS").delete()
          id -> -2
        }
      case (id, st, _) => id -> st
    }
    if (outcomes.nonEmpty) {
      val oDF = outcomes.toDF("id", "new_status")
      // update commits a version when the table exists; the bootstrap
      // branch above guarantees it does whenever anything was pending,
      // so outcomes can never be silently dropped
      states.update(df => df.join(oDF, Seq("id"), "left")
        .withColumn("status", coalesce(col("new_status"), col("status")))
        .drop("new_status"))
      // the drain path commits versions too — keep them bounded like the
      // submit path does, or a submit-then-drain workload grows one full
      // snapshot per tick forever
      states.vacuum(keep = 4)
    }
    // terminal-state compaction: finished rows (1 complete / -2 error)
    // leave the live queue table — and their bodies the live request
    // store — for the append-only archive, so the per-tick pending scan
    // and the orphan anti-join stay bounded by LIVE work even after
    // millions of completed requests. vacuum bounds versions; this bounds
    // rows. status()/history stay served via readAll().
    states.compact(_.filter(col("status").isin(1, -2))).foreach { _ =>
      states.vacuum(keep = 4)
    }
    // the BODY compaction keys off the archive unconditionally, not off
    // whether THIS tick archived anything: a crash between the two
    // compacts would otherwise strand terminal bodies in the live request
    // store until some unrelated request completed (states.compact
    // returns None on later ticks — nothing terminal is live anymore —
    // and the foreach body would never run again). compact() itself
    // no-ops when nothing matches, so the steady-state cost is one
    // semi-join over live bodies.
    states.archive().map(_.select("id")).foreach { terminalIds =>
      requestStore.compact(_.join(terminalIds, Seq("id"), "left_semi"))
        .foreach { _ => requestStore.vacuum(keep = 4) }
    }
    // bound the archive DIRECTORY count too (one batch lands per
    // compacting tick): submit idempotence and the orphan heal scan the
    // archive every tick, and a months-old engine would otherwise pay a
    // thousands-of-tiny-dirs multi-path scan on the submit hot path
    states.consolidateArchive()
    requestStore.consolidateArchive()
    // persist buffered done-set marks before the pass ends: a cron-driven
    // engine exits after each tick, and marks held only in memory would be
    // rediscovered one probe-hit at a time instead of surviving the exit
    cache.flushDone()
    outcomes.toMap
  }

  /** Completed merged result for a request, if any. Requires the write
    * marker — a crashed artifact write leaves a directory but no _SUCCESS,
    * and must not surface a torn result against a -2 status. */
  def results(id: String): Option[DataFrame] = {
    val p = s"$outDir/$id/results"
    if (new java.io.File(s"$p/_SUCCESS").exists()) Some(spark.read.parquet(p))
    else None
  }

  /** Bundle a completed request's artifacts (S9). */
  def bundle(id: String, zipPath: String): Unit =
    Artifacts.zipDir(s"$outDir/$id", zipPath)
}
