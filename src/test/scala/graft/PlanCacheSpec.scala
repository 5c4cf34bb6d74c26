package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Extracts, Tables}
import graft.plans.PlanCache

class PlanCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  def freshCache() = new PlanCache(spark,
    Files.createTempDirectory("graft_plancache").toString)

  test("re-planned query scans the materialized cache instead of recomputing") {
    val pc = freshCache()
    try {
      val extract = Extracts.extract(Tables.pixels(spark, d), "sum")
      pc.materialize("extract_sum", extract)
      pc.enable()
      // the SAME computation, built independently from scratch
      val again = Extracts.extract(Tables.pixels(spark, d), "sum")
      val plan = again.queryExecution.optimizedPlan.toString
      assert(!plan.toLowerCase.contains("join"),
        s"zone join should be gone after rewrite:\n$plan")
      assert(!plan.contains("Aggregate"), s"aggregate should be gone:\n$plan")
      // physical plan scans the materialized cache path, no aggregation left
      val phys = again.queryExecution.executedPlan.toString
      assert(phys.contains("graft_plancache"), s"expected cache scan:\n$phys")
      assert(!phys.contains("HashAggregate"), s"no aggregation expected:\n$phys")
    } finally pc.disable()
  }

  test("rewrite preserves results and composes under downstream operators") {
    val pc = freshCache()
    try {
      val plain = Extracts.extract(Tables.pixels(spark, d), "mean")
        .orderBy("asdf_id").collect().toSeq
      pc.materialize("extract_mean", Extracts.extract(Tables.pixels(spark, d), "mean"))
      pc.enable()
      val rewritten = Extracts.extract(Tables.pixels(spark, d), "mean")
        .filter(col("asdf_id") >= 0).orderBy("asdf_id").collect().toSeq
      assert(rewritten == plain)
    } finally pc.disable()
  }

  test("non-matching plans are left alone") {
    val pc = freshCache()
    try {
      pc.materialize("extract_sum", Extracts.extract(Tables.pixels(spark, d), "sum"))
      pc.enable()
      val other = Extracts.extract(Tables.pixels(spark, d), "max")
      assert(!other.queryExecution.optimizedPlan.toString.contains("graft_plancache"))
    } finally pc.disable()
  }

  test("registry is bounded: oldest registration evicts beyond maxEntries") {
    val pc = new PlanCache(spark,
      Files.createTempDirectory("graft_plancache").toString, maxEntries = 2)
    try {
      pc.materialize("e_sum", Extracts.extract(Tables.pixels(spark, d), "sum"))
      pc.materialize("e_mean", Extracts.extract(Tables.pixels(spark, d), "mean"))
      pc.materialize("e_max", Extracts.extract(Tables.pixels(spark, d), "max"))
      assert(pc.registered == 2)
      pc.enable()
      // evicted: the sum plan no longer rewrites (aggregate still present)...
      val sum = Extracts.extract(Tables.pixels(spark, d), "sum")
      assert(sum.queryExecution.optimizedPlan.toString.contains("Aggregate"))
      // ...while the newest registrations still rewrite to a plain scan
      val max = Extracts.extract(Tables.pixels(spark, d), "max")
      assert(!max.queryExecution.optimizedPlan.toString.contains("Aggregate"))
      assert(max.queryExecution.executedPlan.toString.contains("graft_plancache"))
    } finally pc.disable()
  }

  test("re-materializing a key is safe with the rule live and drops the stale registration") {
    val pc = freshCache()
    try {
      pc.enable()
      pc.materialize("k", Extracts.extract(Tables.pixels(spark, d), "sum"))
      // same computation again: without pre-write deregistration the
      // write's own input would be rewritten to scan the very directory
      // mode(overwrite) is deleting — destroying the artifact mid-write
      pc.materialize("k", Extracts.extract(Tables.pixels(spark, d), "sum"))
      assert(pc.registered == 1)
      val again = Extracts.extract(Tables.pixels(spark, d), "sum")
      assert(again.queryExecution.executedPlan.toString.contains("graft_plancache"))
      assert(again.collect().nonEmpty, "artifact must survive the refresh")
      // refresh the key with a DIFFERENT computation: a query matching the
      // OLD plan must recompute, not silently read the new key's data
      pc.materialize("k", Extracts.extract(Tables.pixels(spark, d), "mean"))
      val stale = Extracts.extract(Tables.pixels(spark, d), "sum")
        .queryExecution.optimizedPlan.toString
      assert(stale.contains("Aggregate"),
        s"old computation must not be rewritten to the refreshed artifact:\n$stale")
    } finally pc.disable()
  }

  test("concurrent materialize + optimization never tears the registry") {
    // pins the snapshot-under-lock contract: optimizing queries while
    // another thread materializes (including FIFO eviction shifting the
    // buffer) must never throw or corrupt a rewrite
    val pc = new PlanCache(spark,
      Files.createTempDirectory("graft_plancache").toString, maxEntries = 4)
    try {
      pc.enable()
      import spark.implicits._
      val writer = new Thread(() => {
        for (i <- 1 to 12)
          pc.materialize(s"k$i", Seq((i, i * 2)).toDF("a", "b").groupBy($"a").count())
      })
      writer.start()
      val errors = new java.util.concurrent.atomic.AtomicInteger(0)
      val readers = (1 to 4).map(t => new Thread(() => {
        try {
          for (j <- 1 to 25) {
            // force a fresh analyze+optimize pass through the rule
            Seq((t, j)).toDF("a", "b").groupBy($"a").count()
              .queryExecution.optimizedPlan
          }
        } catch { case _: Throwable => errors.incrementAndGet() }
      }))
      readers.foreach(_.start())
      writer.join(); readers.foreach(_.join())
      assert(errors.get() == 0, "rule application raced the registry")
      assert(pc.registered <= 4)
    } finally pc.disable()
  }

  test("disable detaches the rule") {
    val pc = freshCache()
    pc.materialize("extract_sum", Extracts.extract(Tables.pixels(spark, d), "sum"))
    pc.enable()
    pc.disable()
    val again = Extracts.extract(Tables.pixels(spark, d), "sum")
    assert(!again.queryExecution.optimizedPlan.toString.contains("graft_plancache"))
  }
}
