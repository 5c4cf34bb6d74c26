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

  /** Scheduling order as an explicit rank (SURVEY.md §2.5 W2). */
  def rank(queue: DataFrame, priorityCol: String = "priority",
           submitCol: String = "submit_time", keyCol: String = "id"): DataFrame =
    queue.withColumn("rank",
      row_number().over(Window.orderBy(col(priorityCol).desc, col(submitCol).asc, col(keyCol).asc)))

  /** Status transition (Q1, `queue/request_tools.py:150-190`): set the new
    * status on matching rows and stamp the stage timestamp column the
    * reference maps that status to (2 → process_time, 1 → complete_time,
    * "prep" handled by caller as prep_time). */
  def transition(queue: DataFrame, id: Any, newStatus: Int, now: Long,
                 keyCol: String = "id", statusCol: String = "status"): DataFrame = {
    val hit = col(keyCol) === lit(id)
    val stamped = queue.withColumn(statusCol,
      when(hit, lit(newStatus)).otherwise(col(statusCol)))
    val tsCol = newStatus match {
      case 2 => Some("process_time")
      case 1 => Some("complete_time")
      case _ => None
    }
    tsCol.fold(stamped) { c =>
      val base = if (stamped.columns.contains(c)) col(c) else lit(null).cast("long")
      stamped.withColumn(c, when(hit, lit(now)).otherwise(base))
    }
  }

  /** Idempotent enqueue / MERGE (Q2, `queue/extract_check.py:146-184`,
    * `queue/msr_check.py:96-133`): rows already present keep their ENTIRE
    * state (a NULL field like an unset `complete_time` is state too — a
    * per-column coalesce would let an incoming value overwrite it); new
    * rows insert. Anti-join + union — the offline stand-in for a Delta
    * MERGE WHEN NOT MATCHED THEN INSERT. */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val newRows = incoming.join(existing, keys, "left_anti")
    val aligned = existing.columns.toSeq.map { c =>
      if (incoming.columns.contains(c)) col(c).cast(existing.schema(c).dataType).as(c)
      else lit(null).cast(existing.schema(c).dataType).as(c)
    }
    existing.unionByName(newRows.select(aligned: _*))
  }
}
