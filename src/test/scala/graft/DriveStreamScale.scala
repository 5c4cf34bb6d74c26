package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streamy

/** Measured scale posture for the STREAMING family — the stateful analog of
  * [[DriveScale10x]]. SCALE.md claims every streaming operator's state is
  * bounded by (key cardinality × watermark span), not stream LENGTH; this
  * drive makes that a measurement instead of an analysis.
  *
  * Protocol: synthesize a file stream (one parquet file per 10-minute
  * event-time slice, written in event-time order — the same contract the
  * operators document), drive each stateful operator as a REAL stream
  * (`maxFilesPerTrigger=1`, AvailableNow, noop sink) at 1× and 10× the
  * number of slices with IDENTICAL per-slice rate and user cardinality,
  * and read the state-store row counts off `StreamingQueryProgress`.
  * Growing the stream 10× while holding rate and keys constant isolates
  * the claim: a state store bounded by keys/watermark stays flat
  * (exponent ≈ 0 over stream length); one that accumulates history grows
  * linearly (exponent ≈ 1).
  *
  * Expected shape per operator:
  *  - dedupeById: rows within the 1 h watermark — flat.
  *  - windowCounts: open (window × type) groups inside the watermark — flat.
  *  - sessionFlush: users active inside the session gap — flat (event-time
  *    timeout evicts idle users).
  *  - runningUserTotals: live users (processing-time timeout can't fire
  *    inside a fast drain) — flat at |users|, NOT at |events|.
  *  - funnelProgress: users that made funnel progress — flat at |users|
  *    by design (NoTimeout is the operator's documented posture: funnel
  *    stamps are 24 bytes per converting user, bounded by the user
  *    population, never the clickstream).
  *  - intervalJoin: both sides' rows inside (watermark + interval) — flat.
  */
object DriveStreamScale {
  private def genSlices(spark: SparkSession, dir: String, nSlices: Int,
      perSlice: Int, nUsers: Int): Unit = {
    import spark.implicits._
    // deterministic synthetic clickstream: slice s covers
    // [s*10min, (s+1)*10min); within a slice, rows are event-time ordered
    // and each user's events are strictly increasing — sessionFlush's
    // documented cross-batch ordering contract. A multiplicative hash
    // spreads users; every 7th event repeats the previous event_id to
    // exercise dedupe state with real duplicates.
    val types = Array("view", "click", "purchase")
    (0 until nSlices).foreach { s =>
      val rows = (0 until perSlice).map { j =>
        val g = s.toLong * perSlice + j
        val id = if (j % 7 == 3) g - 1 else g
        val uid = ((g * 2654435761L) >>> 7) % nUsers
        val usInSlice = (j.toLong * 600000000L) / perSlice // 10 min in µs
        val ts = new java.sql.Timestamp(
          1704067200000L + s * 600000L + usInSlice / 1000L)
        val tpe = types(((g * 40503L) % 3L).toInt)
        (id, ts, uid, tpe, ((g % 100) + 1).toDouble / 10.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      rows.coalesce(1).write.mode("append").parquet(dir)
    }
  }

  private case class Run(name: String, events: Long, wallSec: Double,
    maxStateRows: Long, maxStateBytes: Long)

  private def drive(spark: SparkSession, dir: String, name: String,
      mode: String, xform: DataFrame => DataFrame): Run = {
    val schema = spark.read.parquet(dir).schema
    val nEvents = spark.read.parquet(dir).count()
    val ckpt = Files.createTempDirectory(s"graft_ss_$name").toString
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val t0 = System.nanoTime()
    val q = xform(stream).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("noop").outputMode(mode).start()
    // drain via StreamProbe: AvailableNow alone never terminates under
    // ProcessingTimeTimeout operators (timer batches keep the query alive)
    val progress = StreamProbe.drain(q)
    val wall = (System.nanoTime() - t0) / 1e9
    // retention raised to 1000 in the session conf — the 10x run's data +
    // watermark/timer batches overflow the default 100-entry window
    val states = progress.flatMap(p => Option(p.stateOperators).toSeq.flatten)
    val rows = if (states.isEmpty) 0L else states.map(_.numRowsTotal).max
    val bytes = if (states.isEmpty) 0L else states.map(_.memoryUsedBytes).max
    Run(name, nEvents, wall, rows, bytes)
  }

  // (name, required sink output mode, transform) — flatMapGroupsWithState
  // declares Append, mapGroupsWithState requires Update
  private def ops(dim: DataFrame): Seq[(String, String, DataFrame => DataFrame)] = Seq(
    ("dedupeById", "append", df => Streamy.dedupeById(df)),
    ("windowCounts", "update", df => Streamy.windowCounts(df)),
    ("sessionFlush", "append", df => Streamy.sessionFlush(df).toDF),
    ("runningUserTotals", "update", df => Streamy.runningUserTotals(df).toDF),
    ("funnelProgress", "update", df => Streamy.funnelProgress(df, "view", "click", "purchase").toDF),
    ("intervalJoin", "append", df => Streamy.intervalJoin(df, df)),
    ("enrich", "append", df => Streamy.enrich(df, dim, "user_id", "k")))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // the 10x run produces >100 progress updates (100 data batches plus
      // watermark/timer batches); the default 100-entry retention would
      // silently truncate the max-state window to a suffix of the run
      .config("spark.sql.streaming.numRecentProgressUpdates", "1000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dim = (0L until 5000L).map(k => (k, s"seg_${k % 17}")).toDF("k", "seg")

    val (perSlice, nUsers) = (20000, 5000)
    def corpus(nSlices: Int): String = {
      val dir = Files.createTempDirectory(s"graft_ss_src_$nSlices").toString
      genSlices(spark, dir, nSlices, perSlice, nUsers); dir
    }
    val d1 = corpus(10)   // 200k events over 100 min of event time
    val d10 = corpus(100) // 2M events over 1000 min — same rate, same users

    println(f"${"operator"}%-18s ${"ev1x"}%8s ${"ev10x"}%9s ${"st1x"}%8s ${"st10x"}%8s ${"exp"}%6s ${"evps1x"}%9s ${"evps10x"}%9s")
    ops(dim).foreach { case (name, mode, fn) =>
      val r1 = drive(spark, d1, name, mode, fn)
      val r10 = drive(spark, d10, name, mode, fn)
      val exp =
        if (r1.maxStateRows <= 0 || r10.maxStateRows <= 0) Double.NaN
        else math.log10(r10.maxStateRows.toDouble / r1.maxStateRows) // /log10(10)=1
      println(f"$name%-18s ${r1.events}%8d ${r10.events}%9d ${r1.maxStateRows}%8d ${r10.maxStateRows}%8d $exp%6.2f ${r1.events / r1.wallSec}%9.0f ${r10.events / r10.wallSec}%9.0f")
    }
    spark.stop()
  }
}
