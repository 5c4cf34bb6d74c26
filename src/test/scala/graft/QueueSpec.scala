package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Queue

class QueueSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, status, priority, submit_time)
  def q = Seq(
    (1L, 0, 0, 100L), (2L, 0, 5, 300L), (3L, 0, 5, 200L),
    (4L, 1, 9, 100L), (5L, -1, 0, 50L)
  ).toDF("id", "status", "priority", "submit_time")

  test("poll: priority desc then submit asc (S3/O1)") {
    val ids = Queue.poll(q, 0, 10).select("id").as[Long].collect().toSeq
    assert(ids == Seq(3L, 2L, 1L))
  }

  test("poll: limit<=0 drains everything (queue/request_tools.py:110)") {
    assert(Queue.poll(q, 0, 0).count() == 3)
    assert(Queue.poll(q, 0, 2).count() == 2)
  }

  test("two-phase poll: new (-1) before waiting (0) regardless of priority") {
    val ids = Queue.pollTwoPhase(q, -1, 0, 10).select("id").as[Long].collect().toSeq
    assert(ids == Seq(5L, 3L, 2L, 1L))
  }

  test("rank mirrors poll order (W2)") {
    val r = Queue.rank(q).select("id", "rank").as[(Long, Int)].collect().toMap
    assert(r(4L) == 1 && r(3L) == 2 && r(2L) == 3)
  }

  test("rank keeps and orders NULL priority / submit rows like the global window") {
    val withNulls = Seq(
      (1L, Some(5), Some(100L)), (2L, None, Some(200L)),
      (3L, Some(5), None), (4L, None, None)
    ).toDF("id", "priority", "submit_time")
    val r = Queue.rank(withNulls).select("id", "rank")
      .as[(Long, Int)].collect().toMap
    assert(r.size == 4, "no row may be dropped by the band join")
    // global order: priority DESC (nulls last), submit ASC (nulls first):
    // (5, null) < (5, 100) < (null, null) < (null, 200)
    assert(r(3L) == 1 && r(1L) == 2 && r(4L) == 3 && r(2L) == 4)
  }

  test("re-ranking a frame that already has a rank column replaces it") {
    val once = Queue.rank(q)
    val twice = Queue.rank(once)
    assert(twice.columns.count(_ == "rank") == 1)
    assert(twice.select("id", "rank").as[(Long, Int)].collect().toMap ==
      once.select("id", "rank").as[(Long, Int)].collect().toMap)
  }

  test("transition sets status and stamps the mapped stage time (Q1)") {
    val out = Queue.transition(q, 2L, 2, 777L)
      .select("id", "status", "process_time").as[(Long, Int, Option[Long])]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(2L) == (2, Some(777L)))
    assert(out(1L) == (0, None)) // untouched rows keep status, no stamp
    val done = Queue.transition(q, 3L, 1, 888L)
      .filter($"id" === 3L).select("complete_time").as[Option[Long]].collect().head
    assert(done == Some(888L))
  }

  test("upsert: existing rows win, new rows insert (Q2 idempotent enqueue)") {
    val existing = Seq((1L, 1, 100L), (2L, 2, 200L)).toDF("id", "status", "submit_time")
    val incoming = Seq((2L, 0, 999L), (9L, 0, 900L)).toDF("id", "status", "submit_time")
    val out = Queue.upsert(existing, incoming, Seq("id"))
      .as[(Long, Int, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(2L) == (2, 200L)) // no double-enqueue: existing state kept
    assert(out(9L) == (0, 900L)) // inserted
    assert(out(1L) == (1, 100L))
    assert(out.size == 3)
  }

  test("transition with isPrep stamps prep_time too (queue/request_tools.py:170-175)") {
    val out = Queue.transition(q, 2L, 2, 777L, isPrep = true)
      .select("id", "status", "process_time", "prep_time")
      .as[(Long, Int, Option[Long], Option[Long])]
      .collect().map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(out(2L) == (2, Some(777L), Some(777L)))
    assert(out(1L) == (0, None, None))
  }

  test("upsert refreshes priority/classification/update_time on match " +
      "(queue/extract_check.py:170-176)") {
    val existing = Seq((1L, 0, 100L, 0, "old", 10L), (2L, 1, 200L, 0, "old", 10L))
      .toDF("id", "status", "submit_time", "priority", "classification", "update_time")
    val incoming = Seq((2L, 0, 999L, 5, "det", 777L), (9L, 0, 900L, 0, "det", 777L))
      .toDF("id", "status", "submit_time", "priority", "classification", "update_time")
    val out = Queue.upsert(existing, incoming, Seq("id"))
      .as[(Long, Int, Long, Int, String, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
    // matched: status/submit_time preserved, details refreshed ($set)
    assert(out(2L) == ((1, 200L, 5, "det", 777L)))
    // untouched existing row keeps everything
    assert(out(1L) == ((0, 100L, 0, "old", 10L)))
    // new row inserts whole
    assert(out(9L) == ((0, 900L, 0, "det", 777L)))
    assert(out.size == 3)
  }

  test("upsert refreshes only the detail columns both frames carry") {
    // incoming lacks classification/update_time: priority still refreshes,
    // the absent details keep existing state (no null overwrite)
    val existing = Seq((1L, 1, 100L, 0, "old")).toDF(
      "id", "status", "submit_time", "priority", "classification")
    val incoming = Seq((1L, 0, 999L, 7)).toDF("id", "status", "submit_time", "priority")
    val out = Queue.upsert(existing, incoming, Seq("id"))
      .as[(Long, Int, Long, Int, String)].collect().head
    assert(out == ((1L, 1, 100L, 7, "old")))
  }

  test("upsert is idempotent") {
    val existing = Seq((1L, 1, 100L)).toDF("id", "status", "submit_time")
    val once = Queue.upsert(existing, existing, Seq("id"))
    assert(once.count() == 1)
  }
}
