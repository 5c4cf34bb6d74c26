package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Queue / state-machine operators (SURVEY.md §2.8; reference
  * `queue/processing.py:137-216`, `queue/request_tools.py:110-190`).
  *
  * Status codes (`queue/request_tools.py:153-159`): -2 error, -1 new,
  * 0 waiting, 1 complete, 2 processing (+3 extract-only).
  */
object Queue {

  /** Queue poll (S3/O1-O3): `find({status}).sort(priority desc,
    * submit_time asc).limit(n)` (`queue/request_tools.py:120-129`).
    * `limit <= 0` means unbounded drain (`queue/request_tools.py:110`).
    * A final unique-key sort term keeps the head deterministic. */
  def poll(queue: DataFrame, status: Any, limit: Int,
           statusCol: String = "status", priorityCol: String = "priority",
           submitCol: String = "submit_time", keyCol: String = "id"): DataFrame = {
    val ordered = queue
      .filter(col(statusCol) === lit(status))
      .orderBy(col(priorityCol).desc, col(submitCol).asc, col(keyCol).asc)
    if (limit > 0) ordered.limit(limit) else ordered
  }

  /** Two-phase poll: new requests (status -1) drain before waiting ones
    * (status 0) (`queue/processing.py:121-123`). `phase` disambiguates. */
  def pollTwoPhase(queue: DataFrame, first: Any, second: Any, limit: Int,
                   statusCol: String = "status", priorityCol: String = "priority",
                   submitCol: String = "submit_time", keyCol: String = "id"): DataFrame = {
    val tagged = queue
      .filter(col(statusCol).isin(first, second))
      .withColumn("phase", when(col(statusCol) === lit(first), lit(0)).otherwise(lit(1)))
      .orderBy(col("phase").asc, col(priorityCol).desc, col(submitCol).asc, col(keyCol).asc)
    if (limit > 0) tagged.limit(limit) else tagged
  }

  /** Scheduling order as an explicit rank (SURVEY.md §2.5 W2).
    *
    * Two-phase, partition-safe: a bare `row_number() OVER (ORDER BY …)`
    * moves the whole queue to one task. Instead rows are banded by
    * content — `(priority, floor(submit_time / bandSeconds))` — which is
    * monotone in the global order, ranked *within* each band in parallel,
    * and each band's cumulative offset (a frame with one row per band,
    * metadata-scale by construction) is broadcast back. Rank values are
    * identical to the global window's and deterministic under retries
    * (bands derive from row content, not partition ids). */
  def rank(queue: DataFrame, priorityCol: String = "priority",
           submitCol: String = "submit_time", keyCol: String = "id",
           bandSeconds: Long = 86400L): DataFrame = {
    // `rank` is replaced like the old withColumn("rank", ...) would; the
    // internal working columns are namespaced so a caller's frame can
    // never collide with them
    val in = queue.drop("rank")
    val bandC = "__graft_rank_band"; val withinC = "__graft_rank_within"
    val offC = "__graft_rank_off"
    val band = floor(col(submitCol) / bandSeconds)
    val banded = in.withColumn(bandC, band)
      .withColumn(withinC, row_number().over(
        Window.partitionBy(col(priorityCol), col(bandC))
          .orderBy(col(submitCol).asc, col(keyCol).asc)))
    val offsets = banded.groupBy(col(priorityCol), col(bandC))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn(offC, coalesce(
        sum("__cnt").over(Window
          .orderBy(col(priorityCol).desc, col(bandC).asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(priorityCol).as("__op"), col(bandC).as("__ob"), col(offC))
    // null-safe join keys: a NULL priority or submit_time must still rank
    // (the global window ranked them; a null-unsafe equi-join would
    // silently drop the row). <=> keys still plan as a hash join.
    banded.join(broadcast(offsets),
        col(priorityCol) <=> col("__op") && col(bandC) <=> col("__ob"))
      .withColumn("rank", (col(offC) + col(withinC)).cast("int"))
      .select(in.columns.toIndexedSeq.map(col) :+ col("rank"): _*)
  }

  /** Status transition (Q1, `queue/request_tools.py:150-190`): set the new
    * status on matching rows and stamp the stage timestamp column the
    * reference maps that status to (`valid_stages`: 2 → stage.2.time here
    * `process_time`, 1 → stage.3.time here `complete_time`). `isPrep`
    * mirrors the reference's `is_prep` flag, which additionally stamps
    * `stage.1.time` (`prep_time`) on the same update. */
  def transition(queue: DataFrame, id: Any, newStatus: Int, now: Long,
                 keyCol: String = "id", statusCol: String = "status",
                 isPrep: Boolean = false): DataFrame = {
    val hit = col(keyCol) === lit(id)
    val stamped = queue.withColumn(statusCol,
      when(hit, lit(newStatus)).otherwise(col(statusCol)))
    val tsCols = (newStatus match {
      case 2 => Seq("process_time")
      case 1 => Seq("complete_time")
      case _ => Seq.empty
    }) ++ (if (isPrep) Seq("prep_time") else Seq.empty)
    tsCols.foldLeft(stamped) { (df, c) =>
      val base = if (df.columns.contains(c)) col(c) else lit(null).cast("long")
      df.withColumn(c, when(hit, lit(now)).otherwise(base))
    }
  }

  /** Idempotent enqueue / MERGE (Q2, `queue/extract_check.py:146-184`,
    * `queue/msr_check.py:96-133`). Reference semantics: a matched row is
    * `$set` the incoming `details` — `{classification, priority,
    * update_time}` by default — while every other field (notably `status`
    * and `submit_time`) keeps its existing state; unmatched incoming rows
    * insert whole. A re-submit with a bumped priority therefore takes
    * effect without re-entering the queue. Join + anti-join + union — the
    * offline stand-in for a Delta MERGE WHEN MATCHED THEN UPDATE SET ...
    * WHEN NOT MATCHED THEN INSERT.
    *
    * `incoming` is assumed key-unique (the reference enqueues one work
    * document per call); callers batching multiple submissions dedupe on
    * `keys` first, exactly as a MERGE source must be key-unique. */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             refreshCols: Seq[String] = Seq("classification", "priority", "update_time")): DataFrame = {
    val refresh = refreshCols.filter(c =>
      existing.columns.contains(c) && incoming.columns.contains(c))
    val updated =
      if (refresh.isEmpty) existing
      else {
        // matched rows take the incoming refresh values; the marker column
        // distinguishes "no match" from "incoming value is NULL"
        val probe = refresh.foldLeft(
            incoming.select((keys ++ refresh).map(col): _*)
              .withColumn("__hit", lit(1))) {
          (df, c) => df.withColumnRenamed(c, s"__in_$c")
        }
        existing.join(probe, keys, "left")
          .select(existing.columns.toSeq.map { c =>
            if (refresh.contains(c))
              when(col("__hit").isNotNull,
                  col(s"__in_$c").cast(existing.schema(c).dataType))
                .otherwise(col(c)).as(c)
            else col(c)
          }: _*)
      }
    val newRows = incoming.join(existing, keys, "left_anti")
    val aligned = existing.columns.toSeq.map { c =>
      if (incoming.columns.contains(c)) col(c).cast(existing.schema(c).dataType).as(c)
      else lit(null).cast(existing.schema(c).dataType).as(c)
    }
    updated.unionByName(newRows.select(aligned: _*))
  }
}
