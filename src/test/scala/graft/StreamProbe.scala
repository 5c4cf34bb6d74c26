package graft

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryProgress}

/** Drain-to-exhaustion driver for static-source streaming queries.
  *
  * `Trigger.AvailableNow` + `awaitTermination` is NOT a sufficient drain
  * protocol for every stateful operator: under `mapGroupsWithState` with
  * `ProcessingTimeTimeout`, pending state timers keep the query scheduling
  * batches forever after the source is exhausted (measured: 99 empty
  * batches in 60 s on [[graft.streaming.Streamy.runningUserTotals]] over 3
  * files). A drain driver must therefore ALSO watch for source exhaustion
  * — three consecutive completed batches with zero input rows — and stop
  * the query itself. Harmless for operators whose AvailableNow run
  * terminates on its own (the await wins first).
  */
object StreamProbe {
  def drain(q: StreamingQuery, timeoutMs: Long = 600000): Array[StreamingQueryProgress] = {
    val t0 = System.nanoTime()
    var finished = false
    var zeroBatches = 0
    var lastBatch = -1L
    while (!finished && zeroBatches < 3 &&
        (System.nanoTime() - t0) / 1e6 < timeoutMs) {
      finished = q.awaitTermination(1500)
      if (!finished) {
        val lp = q.lastProgress
        if (lp != null && lp.batchId != lastBatch) { // a NEW completed batch
          lastBatch = lp.batchId
          if (lp.numInputRows == 0) zeroBatches += 1 else zeroBatches = 0
        }
      }
    }
    // capture + stop BEFORE asserting: a timeout assert with the query
    // still running would leak a live stream into the shared session,
    // polluting every later streaming test's timing
    val progress = q.recentProgress
    if (!finished) q.stop()
    assert(finished || zeroBatches >= 3,
      s"stream neither terminated nor exhausted within ${timeoutMs} ms")
    progress
  }
}
