package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Ckpt._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** [EXT] Structured-Streaming operators (SURVEY.md §2.10). The reference's
  * only streaming construct is the cron micro-batch queue drain
  * (`queue/processing.py:1-3,121-130`); its Spark analog is a
  * `Trigger.AvailableNow` stream over the queue directory. The window
  * operators below take a plain DataFrame so the SAME code path serves both
  * `readStream` sources and batch verification (SURVEY.md §7.5.6).
  */
object Streamy {

  /** T2: tumbling event-time window aggregation (with watermark — a no-op on
    * batch frames, late-data bound on streams). */
  def tumbling(events: DataFrame, gap: String = "1 hour"): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), gap), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("total"))

  /** T2 sliding variant: 1-hour windows every 30 minutes (each event lands
    * in 2 windows). */
  def sliding(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("total"))

  /** T2 sketch variant [EXT]: windowed distribution monitoring with
    * BOUNDED per-window state — the GK percentile sketch and the HLL
    * distinct sketch INSIDE a tumbling event-time window. Both are
    * mergeable imperative aggregates, so a window's streaming state is
    * O(accuracy + 1/rsd²) regardless of event volume, where an exact
    * windowed percentile would buffer the window's entire value set in
    * the state store — the difference between a drift monitor that runs
    * forever and one that OOMs on the first hot week. Same call site
    * serves batch frames (`stream_drift`'s contract oracle). */
  def driftSketch(events: DataFrame, win: String = "7 days",
      accuracy: Int = 1000, rsd: Double = 0.05): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), win))
      .agg(count(lit(1)).as("n"),
        percentile_approx(col("value"), lit(0.5), lit(accuracy)).as("p50_sk"),
        percentile_approx(col("value"), lit(0.95), lit(accuracy)).as("p95_sk"),
        approx_count_distinct(col("user_id"), rsd).as("uniq_sk"))
      .select(col("window.start").as("wstart"), col("n"),
        col("p50_sk"), col("p95_sk"), col("uniq_sk"))

  /** T2 top-k variant [EXT]: windowed heavy hitters, streaming half.
    * The per-window state is one counter per (window, key) — bounded by
    * the key cardinality and watermark-evicted, never by event volume.
    * Ranking is deliberately NOT here: an append-mode stream cannot rank
    * within a still-open window, so the contract is counts-on-the-stream,
    * [[windowTopk]]-on-the-sink (each trigger re-ranks the tiny count
    * table); a batch frame runs both halves in one plan, which is what
    * the `stream_topk` oracle pins. */
  def windowCounts(events: DataFrame, win: String = "1 hour"): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), win), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))

  /** Rank-and-filter finalize over [[windowCounts]] output (batch side of
    * the top-k split). Deterministic tiebreak: (n desc, key asc). The
    * window partitions by wstart — |windows| independent partitions, each
    * |keys| rows tall. */
  def windowTopk(counts: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("wstart").orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** T3: session windows per user with a 30-minute inactivity gap. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("session_window.start").as("sstart"), col("user_id"), col("n"), col("total"))

  /** Per-user running aggregate carried across micro-batches. */
  case class UserState(user_id: Long, n: Long, total: Double)

  /** Custom keyed state via `mapGroupsWithState` (the Structured-Streaming
    * analog of the reference's long-lived per-request state rows, SURVEY.md
    * §2.8): a per-user running (count, sum) that survives across
    * micro-batches, with a processing-time timeout evicting idle users —
    * the pattern a real training-data pipeline uses for per-source quotas
    * or rate accounting. Works identically on batch `Dataset`s (single
    * "batch" of state).
    *
    * Drain caveat (measured, see test-tree `StreamProbe`): pending
    * processing-time timers keep an `AvailableNow` run scheduling empty
    * batches forever after the source is exhausted, so a backlog drain
    * through this operator must stop on source exhaustion rather than
    * `awaitTermination` — or use the batch path, which is the right tool
    * for a bounded backlog anyway. Continuous streams (this operator's
    * scale posture) are unaffected: the timer batches ARE the eviction
    * mechanism there. */
  def runningUserTotals(events: DataFrame,
      timeout: String = "1 hour"): org.apache.spark.sql.Dataset[UserState] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import events.sparkSession.implicits._
    val typed = events.select(col("user_id").as[Long](org.apache.spark.sql.Encoders.scalaLong),
      col("value")).as[(Long, Double)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[UserState, UserState](
        GroupStateTimeout.ProcessingTimeTimeout) {
        case (uid, rows, state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            s
          } else {
            val prev = state.getOption.getOrElse(UserState(uid, 0L, 0.0))
            var n = prev.n
            var total = prev.total
            rows.foreach { case (_, v) => n += 1; total += v }
            val next = UserState(uid, n, total)
            state.update(next)
            state.setTimeoutDuration(timeout)
            next
          }
      }
  }

  /** Ingest-side exact dedup on an id column: on a stream this is
    * `dropDuplicatesWithinWatermark` — per-key state is EVICTED once the
    * watermark passes the key's event time, so state is bounded by
    * (watermark span × arrival rate), not stream length (the standard
    * at-least-once → exactly-once ingest repair for a training-data feed);
    * on a batch frame the same call site degrades to a plain
    * `dropDuplicates` (full-input dedup, no watermark needed). */
  def dedupeById(events: DataFrame, idCol: String = "event_id",
      watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(idCol)
    else events.dropDuplicates(idCol)

  /** Stream-stream event-time interval join [EXT]: attach to each event
    * every later event by the SAME user within `(ts, ts + upper]` — the
    * attribution/follow-on join a training-data ingest uses to stitch
    * related records. On streams both sides carry a watermark and the
    * time-range predicate bounds join state to (watermark + upper) per
    * side — Spark evicts older rows, so state never grows with stream
    * length; on batch frames the same call site is a plain range join
    * (AQE picks the strategy). Self-join safe: column names are
    * disambiguated before the join. */
  def intervalJoin(left: DataFrame, right: DataFrame, upper: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    def wm(df: DataFrame) =
      if (df.isStreaming) df.withWatermark("ts", watermark) else df
    val l = wm(left).select(col("user_id"), col("event_id").as("src_id"),
      col("ts").as("src_ts"))
    val r = wm(right).select(col("user_id").as("__ruser"),
      col("event_id").as("dst_id"), col("ts").as("dst_ts"),
      col("event_type").as("dst_type"))
    l.join(r, col("user_id") === col("__ruser") &&
        col("dst_ts") > col("src_ts") &&
        col("dst_ts") <= col("src_ts") + expr(s"INTERVAL $upper"))
      .select(col("user_id"), col("src_id"), col("dst_id"), col("dst_type"),
        (unix_micros(col("dst_ts")) - unix_micros(col("src_ts"))).as("gap_us"))
  }

  case class FunnelStamps(t1: Option[Long], t2: Option[Long], t3: Option[Long])
  case class FunnelRow(user_id: Long, t1_us: Option[Long], t2_us: Option[Long],
    t3_us: Option[Long], stage: Int)

  /** T7: per-user ordered-funnel progression as custom keyed state — the
    * streaming counterpart of [[graft.ops.Analytics.funnel]]. State is
    * three optional epoch-micro stamps per user (O(1), no event history;
    * at 100 TB the state store holds 24 bytes a user, not their clickstream).
    * Each invocation folds its rows in event-time order, so a batch frame
    * reproduces the batch funnel exactly (one invocation sees the whole
    * user), and a stream carries the stamps across micro-batches under the
    * standard funnel-tracker contract that a user's events arrive in
    * event-time order ACROSS batches — a stamp never moves backward, so a
    * late earlier event is ignored rather than rewriting history (the
    * in-batch sort absorbs intra-batch disorder). Emits the refreshed
    * state row per user per batch (stream side runs in update mode).
    *
    * Batch-path caveat: on a plain DataFrame one invocation receives a
    * user's ENTIRE history and sorts it in one task — fine for
    * verification corpora, but a pathologically hot key (bot traffic) is
    * a per-task memory exposure the 24-byte state figure does not cover.
    * For corpus-scale BATCH funnels use [[graft.ops.Analytics.funnel]]
    * (aggregate-only, skew-safe); this operator's scale posture is the
    * STREAM path, where an invocation sees one micro-batch slice. */
  def funnelProgress(events: DataFrame, s1: String = "view",
      s2: String = "click", s3: String = "purchase"): org.apache.spark.sql.Dataset[FunnelRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import events.sparkSession.implicits._
    val typed = events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[FunnelStamps, FunnelRow](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[FunnelStamps]) =>
          val prev = state.getOption.getOrElse(FunnelStamps(None, None, None))
          var st = prev
          // restore event-time order within the invocation; the sorted seq
          // is one user's slice of one micro-batch, not the corpus
          rows.toSeq.sortBy(_._3).foreach { case (_, tpe, us) =>
            if (tpe == s1) { if (st.t1.isEmpty) st = st.copy(t1 = Some(us)) }
            else if (tpe == s2) {
              if (st.t2.isEmpty && st.t1.exists(_ < us)) st = st.copy(t2 = Some(us))
            } else if (tpe == s3) {
              if (st.t3.isEmpty && st.t2.exists(_ < us)) st = st.copy(t3 = Some(us))
            }
          }
          // persist only real progress: a no-view user must not grow the
          // state store, and an unchanged user must not rewrite its entry
          if (st != prev && st.t1.nonEmpty) state.update(st)
          FunnelRow(uid, st.t1, st.t2, st.t3,
            st.t1.size + st.t2.size + st.t3.size)
      }
  }

  /** Open-session accumulator: 32 bytes per active user — no event history. */
  case class SessionAcc(start_us: Long, last_us: Long, n: Long, cents: Long)
  case class SessionRow(user_id: Long, sstart_us: Long, send_us: Long,
    n: Long, cents: Long)

  /** T8: gap sessionization as custom keyed state (`flatMapGroupsWithState`
    * with EVENT-TIME TIMEOUT) — the third state-store pattern after
    * mapGroupsWithState (T7) and dropDuplicatesWithinWatermark (T5), and
    * the one real session pipelines need: a session closes either when a
    * later event arrives past the gap (emitted immediately, append mode)
    * or when the WATERMARK passes `last event + gap` with no successor —
    * the state store evicts the idle user and emits the finished session,
    * so state is bounded by ACTIVE users, not ever-seen users.
    *
    * Split rule is `gap >= 30 min`, identical to the batch sessionizer
    * (X34) and session_window's half-open semantics, and spend is per-row
    * integer cents — so the stream path, the batch path, and the SQL
    * oracle agree exactly UNDER THE SAME CONTRACT AS [[funnelProgress]]:
    * a user's events arrive in event-time order across micro-batches
    * (the in-batch sort absorbs intra-batch disorder). A late-but-
    * admissible event (above the watermark, at or before the open
    * session's tail) merges conservatively — start extends backward,
    * never an inverted or double-counted interval — because a forward
    * FSM cannot split retroactively. On a batch frame there is no
    * watermark: the input is complete, so the trailing open session of
    * each user is flushed too and the output equals X34's session set.
    *
    * Batch-path caveat (same as [[funnelProgress]]): one invocation sees a
    * user's whole history; corpus-scale BATCH sessionization should use
    * the window formulation (X34) — this operator's scale posture is the
    * stream path, where an invocation sees one micro-batch slice. */
  def sessionFlush(events: DataFrame, gapMinutes: Int = 30): org.apache.spark.sql.Dataset[SessionRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", s"$gapMinutes minutes") else events
    val typed = src.select(col("user_id"), col("ts"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      .as[(Long, java.sql.Timestamp, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no successor: the session is
            // finished; emit it and evict the user from the store
            val s = state.get
            state.remove()
            Iterator.single(SessionRow(uid, s.start_us, s.last_us, s.n, s.cents))
          } else {
            var open = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
            // event-time order within the invocation (one micro-batch slice
            // on streams, the full — complete — history on batch)
            rows.toSeq.sortBy(_._3).foreach { case (_, _, us, c) =>
              open match {
                case Some(s) if us <= s.last_us =>
                  // late-but-admissible (above the watermark, at or before
                  // the open session's tail — only possible across
                  // micro-batches): merge conservatively, extending the
                  // start backward if needed. A retroactive SPLIT is
                  // impossible in a forward FSM, so exact batch parity
                  // holds under the same contract as [[funnelProgress]]:
                  // a user's events arrive in event-time order ACROSS
                  // batches (the in-batch sort absorbs intra-batch
                  // disorder); disorder degrades to this conservative
                  // merge instead of emitting inverted intervals
                  open = Some(SessionAcc(math.min(s.start_us, us), s.last_us,
                    s.n + 1, s.cents + c))
                case Some(s) if us - s.last_us < gapUs =>
                  open = Some(SessionAcc(s.start_us, us, s.n + 1, s.cents + c))
                case Some(s) =>
                  out += SessionRow(uid, s.start_us, s.last_us, s.n, s.cents)
                  open = Some(SessionAcc(us, us, 1L, c))
                case None =>
                  open = Some(SessionAcc(us, us, 1L, c))
              }
            }
            if (streaming) {
              open.foreach { s =>
                state.update(s)
                // ceiling division: truncating last_us/1000 would place the
                // eviction boundary up to 999µs BEFORE last_event + gap,
                // flushing a session marginally earlier than the gap rule
                state.setTimeoutTimestamp((s.last_us + 999L) / 1000L + gapMinutes * 60L * 1000L)
              }
              out.iterator
            } else {
              // complete input: the trailing open session is final too
              (out ++ open.map(s =>
                SessionRow(uid, s.start_us, s.last_us, s.n, s.cents))).iterator
            }
          }
      }
  }

  /** T9: stream-static enrichment join — the third canonical streaming
    * join shape after stream-stream (T6) and keyed state (T7/T8): a
    * static dimension attaches to a stream without ANY state store,
    * because the static side is (re)broadcast per micro-batch. On a
    * batch frame the same call site is a plain broadcast join. The
    * dimension is explicitly broadcast: at any scale the event side
    * never shuffles for an enrichment. */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String): DataFrame = {
    // same contract as AsOf.join: a dim column shadowing an event column
    // would surface later as an ambiguous-reference error at some distant
    // select — fail here with the offending names instead
    val clash = dim.columns.filter(_ != dimKey).toSet
      .intersect(events.columns.toSet)
    require(clash.isEmpty,
      s"enrich: dim columns ${clash.mkString(", ")} clash with event columns; rename the dim side")
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")
      .drop(dimKey)
  }

  /** Newest row per key — the reduction shared by the T11 upsert sink and
    * its batch-path query (`stream_upsert`), so the streaming table and
    * the batch oracle can never diverge on ordering: ONE map-side
    * combinable max-struct per key, ordered (us, event_id, cents). */
  def latestPerKey(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"))
      .agg(max(struct(col("us"), col("event_id"), col("cents"))).as("m"))
      .select(col("user_id"), col("m.us").as("us"),
        col("m.event_id").as("event_id"), col("m.cents").as("cents"))

  /** T11: streaming keyed UPSERT into a versioned [[graft.ops.StateTable]]
    * via foreachBatch — the "stream maintains a serving table" sink. Each
    * micro-batch first reduces to its newest row per key
    * ([[latestPerKey]]), then merges newest-wins against the committed
    * snapshot: untouched keys pass through by ONE anti-join (no
    * re-aggregation of the standing table), only the batch's keys
    * re-reduce. That makes the whole sink STATE-CONVERGENT: foreachBatch
    * is only at-least-once under checkpoint recovery, but replaying any
    * batch — or redelivering the entire stream — re-applies a max that
    * has already won, so the table converges to the same rows regardless
    * of duplication or batch boundaries. No stream-side state store at
    * all; the table IS the state. Honest per-batch cost: one
    * |table|-scan merge + a full snapshot rewrite (the StateTable commit
    * contract — a format with row-level merge would pay |batch| instead),
    * with [[graft.ops.StateTable.vacuum]] bounding retained versions so a
    * long stream cannot grow disk without bound. Caller sets the
    * checkpoint and starts (queueDrain contract). */
  def upsertLatest(events: DataFrame, tableDir: String): DataStreamWriter[Row] = {
    val spark = events.sparkSession
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val st = new graft.ops.StateTable(spark, tableDir, Seq("user_id"))
        // checkpoint the batch reduction ONCE: three consumers below (two
        // join-key probes + the final union) would each re-run the
        // aggregation otherwise. NO broadcast hint on the key frame — a
        // recovery/backlog batch can carry millions of keys (AvailableNow
        // puts the whole backlog in one batch), and forcing it through
        // the driver would hit the broadcast limit; AQE broadcasts the
        // common small-batch case on its own.
        val latest = latestPerKey(batch).diskCheckpoint()
        val keys = latest.select("user_id")
        st.read() match {
          case None => st.commit(latest)
          case Some(cur) =>
            val untouched = cur.join(keys, Seq("user_id"), "left_anti")
            val competing = cur.join(keys, Seq("user_id"), "left_semi")
            st.commit(untouched.unionByName(
              latestPerKey(competing.unionByName(latest))))
        }
        st.vacuum()
        ()
      }
  }

  /** T1: the reference's cron queue drain as an AvailableNow micro-batch
    * stream over a Parquet queue directory — processes everything pending,
    * then stops, exactly like one cron tick.
    *
    * A cold queue (missing or still-empty directory — the first tick
    * before any file lands) cannot have its schema inferred; pass
    * `schema` explicitly to make that tick a zero-row no-op instead of an
    * AnalysisException. With files present the schema is inferred as
    * before. */
  def queueDrain(spark: SparkSession, queueDir: String, checkpoint: String,
      schema: org.apache.spark.sql.types.StructType = null)(
      process: DataFrame => DataFrame): DataStreamWriter[Row] = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(queueDir))
    val sch = Option(schema).getOrElse {
      val hasData = Option(new java.io.File(queueDir).listFiles())
        .exists(_.exists(f => f.isFile && f.getName.endsWith(".parquet")))
      require(hasData, s"queue dir $queueDir is empty/cold: pass an " +
        "explicit schema to drain it as a no-op")
      spark.read.parquet(queueDir).schema
    }
    val stream = spark.readStream.schema(sch).parquet(queueDir)
    process(stream).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
  }
}
