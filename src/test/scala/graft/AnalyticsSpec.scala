package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Analytics

/** Batch event analytics (X20/X21) + the indexing/quality queries'
  * invariants that the DuckDB oracle can't express structurally. */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: strict ordering, partial stages, pre-stage events ignored") {
    val events = Seq(
      // u1: full ordered funnel
      (7L, "view", ts("2024-01-01 00:00:00")),
      (7L, "click", ts("2024-01-01 01:00:00")),
      (7L, "purchase", ts("2024-01-01 02:00:00")),
      // u2: click BEFORE first view -> never reaches stage 2
      (8L, "click", ts("2024-01-01 00:30:00")),
      (8L, "view", ts("2024-01-01 01:00:00")),
      // u3: purchase before click -> stage 2 only
      (9L, "view", ts("2024-01-01 00:00:00")),
      (9L, "purchase", ts("2024-01-01 00:30:00")),
      (9L, "click", ts("2024-01-01 01:00:00")),
      // u4: never views -> absent from output
      (10L, "click", ts("2024-01-01 00:00:00")),
      // u5: simultaneous click (strict > excludes the tie)
      (11L, "view", ts("2024-01-01 00:00:00")),
      (11L, "click", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(events, Seq("view", "click", "purchase"))
      .select($"user_id", $"stage").as[(Long, Int)].collect().toMap
    assert(out == Map(7L -> 3, 8L -> 1, 9L -> 2, 11L -> 1))
  }

  test("funnel matches a per-user brute force on random event logs") {
    val rnd = new scala.util.Random(42)
    val types = Seq("view", "click", "purchase", "other")
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(25).toLong, types(rnd.nextInt(types.size)),
        new Timestamp(1704067200000L + rnd.nextInt(1000000) * 1000L))
    }
    val df = rows.toDF("user_id", "event_type", "ts")
    val got = Analytics.funnel(df, Seq("view", "click", "purchase"))
      .select($"user_id", $"stage").as[(Long, Int)].collect().toMap

    val expect = rows.groupBy(_._1).flatMap { case (u, es) =>
      def nextAfter(t: String, after: Option[Long]): Option[Long] = {
        val c = es.filter(e => e._2 == t &&
          after.forall(a => e._3.getTime > a)).map(_._3.getTime)
        if (c.isEmpty) None else Some(c.min)
      }
      nextAfter("view", None).map { t1 =>
        val t2 = nextAfter("click", Some(t1))
        val t3 = t2.flatMap(t => nextAfter("purchase", Some(t)))
        u -> (1 + t2.size + t3.size)
      }
    }
    assert(got == expect)
  }

  test("retention: cohort day from first event, week offsets floored") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort 2024-01-01
      (1L, ts("2024-01-07 23:00:00")), // day 6 -> week 0
      (1L, ts("2024-01-08 00:00:00")), // day 7 -> week 1
      (1L, ts("2024-01-20 00:00:00")), // day 19 -> week 2
      (2L, ts("2024-01-08 01:00:00")), // cohort 2024-01-08
      (2L, ts("2024-01-16 00:00:00"))  // day 8 -> week 1
    ).toDF("user_id", "ts").withColumn("event_type", lit("view"))
    val got = Analytics.retention(events)
      .select($"cohort_day".cast("string"), $"week_off", $"users")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("group_sample keeps exactly min(5, stratum size) rows, deterministically") {
    val d = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("group_sample")
    val a = q(spark, d).collect()
    val b = q(spark, d).collect()
    assert(a.toSeq == b.toSeq, "sample must be stable across runs")
    val sizes = q(spark, d).groupBy("lang", "source").count()
      .select($"count").as[Long].collect()
    assert(sizes.nonEmpty && sizes.forall(_ <= 5))
    val strata = graft.ops.Tables.documents(spark, d)
      .groupBy("lang", "source").count()
      .select(least(lit(5L), $"count")).as[Long].collect().sum
    assert(sizes.sum == strata, "each stratum contributes min(5, size) rows")
  }

  test("index_postings bounds the posting payload at 8 sorted ids") {
    val out = SparkEntry.queries("index_postings")(spark, "/root/testdata/sf0.001")
      .select($"df", $"postings").as[(Long, String)].collect()
    assert(out.nonEmpty && out.length <= 100)
    out.foreach { case (df, p) =>
      val ids = p.split(",").map(_.toLong)
      assert(ids.length == math.min(df, 8L), "postings hold min(df, 8) ids")
      assert(ids.sameElements(ids.sorted), "postings are ascending")
    }
  }

  test("text_entropy: uniform tokens hit ln(k), single token hits 0") {
    // constructed directly over the operator's algebra using a local frame
    val docs = Seq(
      (1L, "a b c d"),   // 4 distinct tokens once each -> H = ln(4)
      (2L, "x x x x")    // one token -> H = 0, ttr = 0.25
    ).toDF("doc_id", "text")
    val tf = docs.select($"doc_id",
        explode(split(graft.ops.LlmOps.normText($"text"), " ")).as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n"), count(lit(1)).as("u"),
        sum($"c".cast("double") * log($"c".cast("double"))).as("s"))
      .select($"doc_id",
        round(log($"n".cast("double")) - $"s" / $"n", 6).as("h"),
        round($"u".cast("double") / $"n", 6).as("ttr"))
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(math.abs(tf(1L)._1 - math.log(4)) < 1e-6 && tf(1L)._2 == 1.0)
    assert(tf(2L)._1 == 0.0 && tf(2L)._2 == 0.25)
  }

  test("tfidf: corpus-wide tokens score 0, rarer tokens rank first") {
    val out = SparkEntry.queries("tfidf_top")(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"df", $"score_r", $"rk").as[(Long, Long, Double, Long)]
      .collect()
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_._1)
    byDoc.values.foreach { rows =>
      assert(rows.length <= 3)
      val ordered = rows.sortBy(_._4).map(_._3)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
        "rank order follows rounded score desc")
    }
  }
}
