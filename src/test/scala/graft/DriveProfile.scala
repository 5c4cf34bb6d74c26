package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, xxhash64}
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicLong, AtomicInteger}

/** Scratch main: decompose where a registered query's wall-clock goes —
  * driver-side (planning + scheduling gaps) vs executor task time — with
  * per-query job/stage/task counts. The queries are warmed once (JIT,
  * codegen, memo frames) so the measured pass isolates steady-state cost,
  * matching the Bench protocol's warmed rows.
  *
  * Usage: Test/runMain graft.DriveProfile <sfDir> <query...>
  */
object DriveProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val taskTime = new AtomicLong(0)      // ms of executor run time
    val gcTime = new AtomicLong(0)
    val taskCount = new AtomicInteger(0)
    val stageCount = new AtomicInteger(0)
    val jobCount = new AtomicInteger(0)
    val shuffleRead = new AtomicLong(0)
    val shuffleWrite = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) {
          taskTime.addAndGet(t.taskMetrics.executorRunTime)
          gcTime.addAndGet(t.taskMetrics.jvmGCTime)
          shuffleRead.addAndGet(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
        taskCount.incrementAndGet(): Unit
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stageCount.incrementAndGet(): Unit }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        { jobCount.incrementAndGet(): Unit }
    })
    val verbose = sys.env.contains("GRAFT_PROFILE_JOBS")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    if (verbose) spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .map(_.getProperty("callSite.short", "?")).getOrElse("?")
        jobStart.put(j.jobId, (j.time, site)): Unit
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobStart.get(j.jobId)).foreach { case (t0, site) =>
          println(f"  job ${j.jobId}%4d ${(j.time - t0) / 1e3}%7.3f s  $site")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val run = i.taskMetrics.executorRunTime / 1e3
        println(f"    stage ${i.stageId}%4d tasks=${i.numTasks}%3d run=$run%6.2f s  ${i.name.take(90)}")
      }
    })
    def run(n: String): Unit = {
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).head(): Unit
    }
    // warm-up
    names.foreach(n => run(n))
    println(f"${"query"}%-28s ${"wall_s"}%8s ${"task_s"}%8s ${"gc_s"}%6s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"shR_MB"}%7s ${"shW_MB"}%7s")
    names.foreach { n =>
      taskTime.set(0); gcTime.set(0); taskCount.set(0)
      stageCount.set(0); jobCount.set(0); shuffleRead.set(0); shuffleWrite.set(0)
      val t0 = System.nanoTime()
      run(n)
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async: give it a beat to drain before reading
      Thread.sleep(300)
      println(f"$n%-28s $wall%8.2f ${taskTime.get / 1e3}%8.2f ${gcTime.get / 1e3}%6.2f ${jobCount.get}%5d ${stageCount.get}%7d ${taskCount.get}%6d ${shuffleRead.get / 1e6}%7.1f ${shuffleWrite.get / 1e6}%7.1f")
    }
    spark.stop()
  }
}
