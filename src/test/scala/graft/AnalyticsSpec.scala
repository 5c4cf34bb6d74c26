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
      .select($"user_id", $"t1", $"t2", $"t3", $"stage")
      .collect().map { r =>
        def t(i: Int) = if (r.isNullAt(i)) None else Some(r.getTimestamp(i).getTime)
        r.getLong(0) -> ((t(1), t(2), t(3), r.getInt(4)))
      }.toMap

    val expect = rows.groupBy(_._1).flatMap { case (u, es) =>
      def nextAfter(t: String, after: Option[Long]): Option[Long] = {
        val c = es.filter(e => e._2 == t &&
          after.forall(a => e._3.getTime > a)).map(_._3.getTime)
        if (c.isEmpty) None else Some(c.min)
      }
      nextAfter("view", None).map { t1 =>
        val t2 = nextAfter("click", Some(t1))
        val t3 = t2.flatMap(t => nextAfter("purchase", Some(t)))
        u -> ((Some(t1): Option[Long], t2, t3, 1 + t2.size + t3.size))
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

  test("retention matches a per-user brute force on random event logs") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { _ =>
      (rnd.nextInt(40).toLong,
        new Timestamp(1704067200000L + rnd.nextInt(60) * 86400000L +
          rnd.nextInt(86400) * 1000L))
    }
    val df = rows.toDF("user_id", "ts")
    val got = Analytics.retention(df)
      .select($"cohort_day".cast("string"), $"week_off", $"users")
      .as[(String, Long, Long)].collect().toSet

    val dayMs = 86400000L
    def utcDay(t: Timestamp): Long = t.getTime / dayMs // epoch is UTC-midnight-aligned
    val cohort = rows.groupBy(_._1).view.mapValues(es => es.map(e => utcDay(e._2)).min)
    val expect = rows
      .map { case (u, t) => (cohort(u), (utcDay(t) - cohort(u)) / 7, u) }
      .groupBy(p => (p._1, p._2))
      .map { case ((cd, w), us) =>
        (java.time.LocalDate.ofEpochDay(cd).toString, w, us.map(_._3).distinct.size.toLong)
      }.toSet
    assert(got == expect)
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

  test("doc_chunks tiles every document: stride-24 starts, full coverage, 8-token overlap") {
    val out = SparkEntry.queries("doc_chunks")(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"chunk_idx", $"start", $"chunk_len")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).values.foreach { chunks =>
      val sorted = chunks.sortBy(_._2)
      // every chunk ends at min(start + 32, n); recover n from the furthest end
      val n = sorted.map(c => c._3 + c._4).max
      sorted.zipWithIndex.foreach { case ((_, idx, start, len), i) =>
        assert(idx == i && start == 24L * i, "stride-24 starts, dense chunk_idx")
        assert(len == math.min(32L, n - start), "window-clamped length")
        assert(len >= 1, "no empty chunk")
      }
      assert(sorted.head._3 == 0L && sorted.last._3 < n, "tiling covers [0, n)")
    }
  }

  test("pmi_bigrams: support floor holds and ranking follows rounded PMI") {
    val out = SparkEntry.queries("pmi_bigrams")(spark, "/root/testdata/sf0.001")
      .select($"bigram", $"n_ab", $"pmi_r").as[(String, Long, Double)].collect()
    assert(out.nonEmpty && out.length <= 50)
    assert(out.forall(_._2 >= 5), "support >= 5")
    val scores = out.map(_._3)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "pmi desc")
  }

  test("corpus_card totals reconcile with the raw documents table") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("corpus_card")(spark, d)
      .select($"n_docs", $"total_chars").as[(Long, Long)].collect()
    val docsDf = graft.ops.Tables.documents(spark, d)
    assert(out.map(_._1).sum == docsDf.count(), "every doc belongs to one source row")
    assert(out.map(_._2).sum ==
      docsDf.agg(sum($"n_chars")).as[Long].collect().head)
  }

  test("quality_tiles: per-language tiles are population-balanced (sizes differ by <= 1)") {
    val out = SparkEntry.queries("quality_tiles")(spark, "/root/testdata/sf0.001")
      .select($"lang", $"tile", $"n_docs", $"min_chars", $"max_chars")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).values.foreach { tiles =>
      val sizes = tiles.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"ntile must balance: ${tiles.toSeq}")
      // tiles are ordered ranges: tile k's max <= tile k+1's min
      val sorted = tiles.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case (a, b) => assert(a._5 <= b._4) }
    }
  }

  test("sessionize_events: sessions match a per-user brute force (30-min gap)") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("sessionize_events")(spark, d)
      .select($"user_id", $"session_id", $"n_events", $"dur_s")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val raw = graft.ops.Tables.events(spark, d)
      .select($"user_id", unix_micros($"ts"), $"event_id")
      .as[(Long, Long, Long)].collect()
    val want = raw.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.map(e => (e._2, e._3)).sorted
      // split wherever the gap reaches 30 min (>=, session_window parity)
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
        case (acc @ cur :: rest, e) =>
          if (e._1 - cur.head._1 >= 1800000000L) List(e) :: acc
          else (e :: cur) :: rest
        case (Nil, _) => Nil // unreachable
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (ss, i) =>
        (u, i + 1L, ss.size.toLong, (ss.last._1 - ss.head._1) / 1000000L)
      }
    }.sorted
    assert(got == want)
  }

  test("rolling_activity: hour-frame counts match a per-user brute force") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("rolling_activity")(spark, d)
      .select($"user_id", $"event_id", $"n_1h", $"cents_1h")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val raw = graft.ops.Tables.events(spark, d)
      .select($"user_id", $"event_id", (unix_micros($"ts") / 1000000L).cast("long"),
        floor($"value" * 100 + 0.5).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    val want = raw.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      es.map { e =>
        val frame = es.filter(o => o._3 >= e._3 - 3600 && o._3 <= e._3)
        (u, e._2, frame.size.toLong, frame.map(_._4).sum)
      }
    }.sorted
    assert(got == want)
  }

  test("top_paths: matches a per-user brute force (first 8 events by time)") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("top_paths")(spark, d)
      .select($"path", $"n_users").as[(String, Long)].collect().toSeq
    assert(got.nonEmpty && got.length <= 20)
    val raw = graft.ops.Tables.events(spark, d)
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val want = raw.groupBy(_._1).toSeq
      .map { case (_, es) =>
        es.map(e => (e._2, e._3, e._4)).sorted.take(8).map(_._3).mkString(">")
      }
      .groupBy(identity).map { case (p, us) => (p, us.size.toLong) }.toSeq
      .sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got == want)
  }

  test("rollup_report: subtotal levels are consistent (nations sum to regions " +
    "sum to grand total)") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("rollup_report")(spark, d)
      .select($"region", $"nation", $"n_cust", $"cents", $"lvl")
      .as[(Option[String], Option[String], Long, Long, Int)].collect()
    val leaves = rows.filter(_._5 == 0)
    val regions = rows.filter(_._5 == 1)
    val grand = rows.filter(_._5 == 3)
    assert(grand.length == 1)
    assert(grand.head._3 == leaves.map(_._3).sum)
    assert(grand.head._4 == leaves.map(_._4).sum)
    regions.foreach { r =>
      val mine = leaves.filter(_._1 == r._1)
      assert(mine.map(_._3).sum == r._3 && mine.map(_._4).sum == r._4, r)
    }
    // rolled-up keys are NULL, real keys are not (lvl disambiguates)
    assert(regions.forall(r => r._1.isDefined && r._2.isEmpty))
    assert(leaves.forall(r => r._1.isDefined && r._2.isDefined))
  }

  test("set_ops_users: intersect/except tags match a per-user brute force") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("set_ops_users")(spark, d)
      .select($"tag", $"user_id").as[(String, Long)].collect().toSeq.sorted
    val raw = graft.ops.Tables.events(spark, d)
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val viewers = raw.filter(_._2 == "view").map(_._1).toSet
    val buyers = raw.filter(_._2 == "purchase").map(_._1).toSet
    val want = (viewers.intersect(buyers).toSeq.map(("both", _)) ++
      viewers.diff(buyers).toSeq.map(("view_only", _))).sorted
    assert(got == want)
  }

  /** Spark's round() is HALF_UP on the BigDecimal form — mirror it exactly
    * (math.rint is half-even and can differ at an exact .5 boundary). */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rank_percentile: percent_rank/cume_dist match exact integer ratios") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("rank_percentile")(spark, d)
      .select($"doc_id", $"lang", $"n_chars", $"pr_r", $"cd_r")
      .as[(Long, String, Long, Double, Double)].collect().toSeq
    val byLang = got.groupBy(_._2)
    byLang.values.foreach { rows =>
      val n = rows.length.toDouble
      val sorted = rows.sortBy(_._3)
      sorted.foreach { r =>
        val below = sorted.count(_._3 < r._3).toDouble
        val atOrBelow = sorted.count(_._3 <= r._3).toDouble
        val pr = if (n == 1) 0.0 else below / (n - 1)
        assert(r._4 == round6(pr), r)
        assert(r._5 == round6(atOrBelow / n), r)
      }
    }
  }

  test("outlier_zscore: flags match a per-zone brute force") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("outlier_zscore")(spark, d)
      .select($"asdf_id", $"n", $"n_out").as[(Long, Long, Long)].collect().toSeq.sorted
    val raw = graft.ops.Tables.pixels(spark, d)
      .select($"asdf_id", $"value").as[(Long, Double)].collect()
    val want = raw.groupBy(_._1).toSeq.map { case (z, vs) =>
      val xs = vs.map(_._2); val n = xs.length
      val mu = xs.sum / n
      val sd = if (n < 2) 0.0
        else math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (n - 1))
      val nOut = if (sd == 0) 0L
        else xs.count(x => math.abs(round6((x - mu) / sd)) > 2).toLong
      (z, n.toLong, nOut)
    }.sorted
    assert(got == want)
  }

  test("daily_spine: contiguous calendar, zero-filled, cumulative exact") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("daily_spine")(spark, d)
      .select($"day".cast("string"), $"n", $"cum_n")
      .as[(String, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    val days = got.map(r => java.time.LocalDate.parse(r._1))
    days.sliding(2).foreach {
      case Seq(a, b) => assert(a.plusDays(1) == b, s"gap in spine: $a -> $b")
      case _ =>
    }
    assert(got.map(_._2).sum == got.last._3)
    got.foldLeft(0L) { case (acc, (_, n, cum)) =>
      assert(n >= 0 && cum == acc + n); cum
    }
    val total = graft.ops.Tables.events(spark, d).count()
    assert(got.last._3 == total)
  }

  test("text_entropy: the production query matches a per-doc brute force") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("text_entropy")(spark, d)
      .select($"doc_id", $"n_tokens", $"n_unique", $"entropy_r", $"ttr_r")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val raw = graft.ops.Tables.documents(spark, d)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(raw.nonEmpty && got.size == raw.length)
    raw.foreach { case (id, text) =>
      // exact normText mirror: Spark trim strips ONLY ASCII spaces (Java
      // String.trim would also eat \t/\n and change the edge-token count)
      val spaceTrimmed = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val toks = spaceTrimmed.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
      val counts = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = toks.length.toLong
      val s = counts.values.map(c => c.toDouble * math.log(c.toDouble)).sum
      val (gn, gu, gh, gt) = got(id)
      assert(gn == n && gu == counts.size.toLong, s"doc $id token counts")
      assert(math.abs(gh - round6(math.log(n.toDouble) - s / n)) < 1e-9, s"doc $id entropy")
      assert(math.abs(gt - round6(counts.size.toDouble / n)) < 1e-9, s"doc $id ttr")
    }
  }

  test("tfidf: scores equal tf*ln(N/df) recomputed, corpus-wide tokens score 0") {
    val d = "/root/testdata/sf0.001"
    val nDocs = graft.ops.Tables.documents(spark, d).count()
    val out = SparkEntry.queries("tfidf_top")(spark, d)
      .select($"doc_id", $"tf", $"df", $"score_r", $"rk")
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (doc, tf, df, score, _) =>
      val expect = round6(tf * math.log(nDocs.toDouble / df))
      assert(math.abs(score - expect) < 1e-9,
        s"doc $doc: score $score != tf*ln(N/df) $expect (tf=$tf df=$df)")
      if (df == nDocs) assert(score == 0.0, "ubiquitous token must score 0")
    }
    val byDoc = out.groupBy(_._1)
    byDoc.values.foreach { rows =>
      assert(rows.length <= 3)
      val ordered = rows.sortBy(_._5).map(_._4)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
        "rank order follows rounded score desc")
    }
  }

  test("bm25_top: scores recompute from the output's own tf/df/dl (X45)") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.ops.Tables.documents(spark, d)
    val nDocs = docs.count().toDouble
    val avgdl = docs
      .select(size(split(graft.ops.LlmOps.normText($"text"), " ")).as("dl"))
      .agg(avg($"dl")).as[Double].head()
    val out = SparkEntry.queries("bm25_top")(spark, d)
      .as[(Long, String, Long, Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (doc, tok, tf, df, dl, score, _) =>
      val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
      val expect = round6(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
      assert(math.abs(score - expect) < 1e-9,
        s"doc $doc '$tok': $score != $expect (tf=$tf df=$df dl=$dl)")
    }
    out.groupBy(_._1).values.foreach { rows =>
      assert(rows.length <= 3)
      val ordered = rows.sortBy(_._7).map(_._6)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
    }
  }

  test("type2_history: intervals equal a per-user brute-force compaction (X47)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("type2_history")(spark, d)
      .as[(Long, Long, String, Long, Option[Long])].collect().toSeq
    val brute = graft.ops.Tables.events(spark, d)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
        val sorted = evs.sortBy(e => (e._4, e._2))
        val changes = sorted.foldLeft(Vector.empty[(String, Long)]) { (acc, e) =>
          if (acc.isEmpty || acc.last._1 != e._3) acc :+ (e._3, e._4) else acc
        }
        changes.zipWithIndex.map { case ((st, from), i) =>
          (uid, (i + 1).toLong, st, from,
            changes.lift(i + 1).map(_._2))
        }
      }
    assert(out.toSet == brute.toSet && out.nonEmpty)
    // intervals tile: valid_to of version v = valid_from of v+1, state changes
    out.groupBy(_._1).values.foreach { rows =>
      val byV = rows.sortBy(_._2)
      assert(byV.map(_._2) == (1L to byV.length).toSeq)
      byV.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5.contains(b._4)); assert(a._3 != b._3)
        case _ =>
      }
      assert(byV.last._5.isEmpty)
    }
  }

  test("weighted_sample: md5-derived A-Res keys recompute exactly in plain Scala (X50)") {
    val d = "/root/testdata/sf0.001"
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.ops.Tables.documents(spark, d)
      .select($"doc_id", $"lang", $"n_chars").as[(Long, String, Long)].collect()
    val brute = docs.map { case (id, lang, n) =>
      val u6 = md5hex(id.toString).take(6).foldLeft(0L)((a, c) =>
        a * 16 + "0123456789abcdef".indexOf(c))
      val key = BigDecimal(math.log((u6 + 1.0) / 16777217.0) / n)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, lang, n, key)
    }.sortBy(r => (-r._4, r._1)).take(20).toSeq
    val out = SparkEntry.queries("weighted_sample")(spark, d)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out == brute)
  }

  test("debounce_events: lag-gap filter equals a per-key brute force (X49)") {
    val d = "/root/testdata/sf0.001"
    val raw = graft.ops.Tables.events(spark, d)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
      .as[(Long, Long, String, Long)].collect()
    val brute = raw.groupBy(e => (e._1, e._3)).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._4, e._2)).toSeq
      sorted.head +: sorted.sliding(2).collect {
        case Seq(a, b) if b._4 - a._4 >= 3600000000L => b
      }.toSeq
    }.map(e => (e._1, e._3, e._2, e._4)).toSet
    val out = SparkEntry.queries("debounce_events")(spark, d)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out == brute && out.size < raw.length,
      "debounce must actually drop something on the fixture")
  }

  test("json_props: extraction conserves event counts; bounds are consistent (X48)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("json_props")(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum == graft.ops.Tables.events(spark, d).count())
    out.foreach { case (t, n, sum, uniq, mn, mx) =>
      assert(mn <= mx && uniq >= 1 && uniq <= n)
      assert(sum >= n * mn && sum <= n * mx, s"$t: sum out of bounds")
    }
  }

  test("session_attribution: as-of construction equals brute-force interval containment (X52)") {
    val d = "/root/testdata/sf0.001"
    val evs = graft.ops.Tables.events(spark, d)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
      .as[(Long, Long, String, Long)].collect()
    // brute: sessionize per user, then containment-scan every purchase
    val brute = evs.groupBy(_._1).flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._4, e._2)).toSeq
      var sid = 0L; var last = Option.empty[Long]
      val tagged = sorted.map { e =>
        if (last.forall(l => e._4 - l >= 1800000000L)) sid += 1
        last = Some(e._4)
        (e, sid)
      }
      val sess = tagged.groupBy(_._2).map { case (s, rs) =>
        s -> ((rs.map(_._1._4).min, rs.map(_._1._4).max)) }
      tagged.filter(_._1._3 == "purchase").flatMap { case (p, _) =>
        sess.collect { case (s, (lo, hi)) if p._4 >= lo && p._4 <= hi =>
          (uid, p._2, s, lo, hi) }
      }
    }.toSet
    val out = SparkEntry.queries("session_attribution")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == brute && out.nonEmpty)
  }

  test("cumulative_users: final total equals global distinct; never decreases (X53)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("cumulative_users")(spark, d)
      .as[(java.sql.Date, Long, Long)].collect()
    val total = graft.ops.Tables.events(spark, d)
      .select($"user_id").distinct().count()
    assert(out.last._3 == total, "final cumulative must equal global distinct users")
    assert(out.map(_._2).sum == total, "every user counts exactly once")
    out.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._3 + b._2, "running sum consistent")
      case _ =>
    }
  }

  test("snapshot_diff: statuses partition the key universe consistently (X55)") {
    val d = "/root/testdata/sf0.001"
    val px = graft.ops.Tables.pixels(spark, d)
    def keys(y: Int) = px.filter($"temporal" === y)
      .select($"l_partkey").distinct().as[Long].collect().toSet
    val k95 = keys(1995); val k96 = keys(1996)
    val out = SparkEntry.queries("snapshot_diff")(spark, d)
      .as[(Long, String, Option[Double], Option[Double])].collect()
    assert(out.map(_._1).toSet == (k95 ++ k96))
    val byStatus = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byStatus.getOrElse("added", Set()) == k96 -- k95)
    assert(byStatus.getOrElse("removed", Set()) == k95 -- k96)
    assert((byStatus.getOrElse("changed", Set()) ++
      byStatus.getOrElse("unchanged", Set())) == (k95 & k96))
    out.foreach {
      case (_, "added", o, n) => assert(o.isEmpty && n.nonEmpty)
      case (_, "removed", o, n) => assert(o.nonEmpty && n.isEmpty)
      case (_, "unchanged", o, n) => assert(o == n)
      case (_, "changed", o, n) => assert(o.nonEmpty && n.nonEmpty && o != n)
      case (_, s, _, _) => fail(s"unknown status $s")
    }
  }

  test("outlier_robust: modified z recomputes from per-zone medians (X56)") {
    val d = "/root/testdata/sf0.001"
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val px = graft.ops.Tables.pixels(spark, d)
      .select($"asdf_id", $"value").as[(Long, Double)].collect()
    val expect = px.groupBy(_._1).map { case (z, vs) =>
      val values = vs.map(_._2).toSeq
      val med = median(values)
      val mad = median(values.map(v => math.abs(v - med)))
      val rz = values.map(v => if (mad == 0) 0.0 else round6(0.6745 * (v - med) / mad))
      (z, values.size.toLong, rz.count(r => math.abs(r) > 3.5).toLong,
        rz.map(math.abs).max)
    }.toSet
    val out = SparkEntry.queries("outlier_robust")(spark, d)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == expect)
  }

  test("data_constraints: healthy fixture is clean; injected violations fire every rule (X62)") {
    val d = "/root/testdata/sf0.001"
    val healthy = SparkEntry.queries("data_constraints")(spark, d)
      .as[(String, Long)].collect().toMap
    assert(healthy.size == 5 && healthy.values.forall(_ == 0L),
      s"fixture should satisfy all constraints: $healthy")
    // corrupt copy: one duplicated pk row that also breaks domain+range,
    // one lineitem row with an orphan FK and a negative quantity
    val tmp = java.nio.file.Files.createTempDirectory("graft_dq").toString
    val o = graft.ops.Tables.orders(spark, d)
    o.unionByName(o.limit(1)
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("o_totalprice", lit(-5.0)))
      .write.parquet(s"$tmp/orders.parquet")
    val li = graft.ops.Tables.lineitem(spark, d)
    li.unionByName(li.limit(1)
        .withColumn("l_orderkey", lit(-999L))
        .withColumn("l_quantity", lit(-3.0)))
      .write.parquet(s"$tmp/lineitem.parquet")
    val fired = SparkEntry.queries("data_constraints")(spark, tmp)
      .as[(String, Long)].collect().toMap
    assert(fired == Map(
      "pk_unique_o_orderkey" -> 1L, "fk_lineitem_orders" -> 1L,
      "domain_o_orderstatus" -> 1L, "range_o_totalprice" -> 1L,
      "nonneg_l_quantity" -> 1L), s"rules must fire exactly once each: $fired")
  }

  test("profile_table: profile recomputes from direct per-column queries (X61)") {
    val d = "/root/testdata/sf0.001"
    val o = graft.ops.Tables.orders(spark, d)
    val out = SparkEntry.queries("profile_table")(spark, d)
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderpriority"))
    out.values.foreach(r => assert(r._2 == 0L, s"${r._1}: unexpected nulls"))
    assert(out("o_orderkey")._3 == o.select($"o_orderkey").distinct().count())
    assert(out("o_orderkey")._4.toLong == o.agg(min($"o_orderkey")).as[Long].head())
    val maxCents = o.agg(max(floor($"o_totalprice" * 100 + 0.5).cast("long")))
      .as[Long].head()
    assert(out("o_totalprice")._5.toLong ==
      o.agg(floor(max($"o_totalprice") * 100 + 0.5).cast("long")).as[Long].head())
    assert(out("o_totalprice")._5.toLong == maxCents)
  }

  test("assoc_rules: metrics recompute from a brute-force basket build (X63)") {
    val d = "/root/testdata/sf0.001"
    val evs = graft.ops.Tables.events(spark, d)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
      .as[(Long, Long, String, Long)].collect()
    // brute baskets: same 30-min gap fold as the attribution test
    val baskets = evs.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._4, e._2)).toSeq
      var sid = 0L; var last = Option.empty[Long]
      sorted.map { e =>
        if (last.forall(l => e._4 - l >= 1800000000L)) sid += 1
        last = Some(e._4)
        ((uid, sid), e._3)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).values.toSeq
    val n = baskets.size.toDouble
    val singles = baskets.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val types = singles.keys.toSeq
    val expect = (for {
      a <- types; b <- types if a != b
      nab = baskets.count(bk => bk.contains(a) && bk.contains(b)) if nab > 0
    } yield (a, b, nab.toLong, round6(nab / n), round6(nab.toDouble / singles(a)),
        round6(nab * n / (singles(a).toDouble * singles(b))))).toSet
    val out = SparkEntry.queries("assoc_rules")(spark, d)
      .as[(String, String, Long, Double, Double, Double)].collect().toSet
    assert(out == expect && out.nonEmpty)
  }

  test("incremental_daily: cached-partial combine equals direct rollup; second run reads the cache (X64)") {
    val d = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("incremental_daily")
    val first = q(spark, d).as[(java.sql.Date, String, Long, Long)].collect().toSeq
    val direct = graft.ops.Tables.events(spark, d)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(floor($"value" * 100 + 0.5).cast("long")).as("cents_sum"))
      .orderBy("day", "event_type")
      .as[(java.sql.Date, String, Long, Long)].collect().toSeq
    assert(first == direct)
    // the per-day partials are now materialized: a re-run must return the
    // same view from the cache (and the cache must actually hold the days)
    val cache = new graft.ops.Cache(spark,
      graft.ops.Cache.contentRoot("graft_incr", d, "events"))
    val day0 = first.head._1.toString.replace("-", "")
    assert(cache.probe(s"daily_$day0"), s"day partition daily_$day0 not materialized")
    assert(q(spark, d).as[(java.sql.Date, String, Long, Long)].collect().toSeq == direct)
  }

  test("drift_bands: volume conserves and bands order (X65)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("drift_bands")(spark, d)
      .as[(java.sql.Date, Long, Double, Double)].collect()
    assert(out.map(_._2).sum == graft.ops.Tables.events(spark, d).count())
    out.foreach { case (wk, n, p50, p95) =>
      assert(p50 <= p95, s"week $wk: p50 $p50 > p95 $p95")
      assert(n >= 1)
    }
  }

  test("dup_cluster_sizes: histogram conserves documents and clusters (X60)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dup_cluster_sizes")(spark, d)
      .as[(Long, Long)].collect()
    val nDocs = graft.ops.Tables.documents(spark, d).count()
    val nClusters = SparkEntry.queries("dedup_clusters")(spark, d)
      .select($"rep").distinct().count()
    assert(out.map(r => r._1 * r._2).sum == nDocs, "every doc in exactly one cluster")
    assert(out.map(_._2).sum == nClusters)
  }

  test("dup_graph_degree: histogram conserves edges and documents (X57)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dup_graph_degree")(spark, d)
      .as[(Long, Long)].collect()
    val nDocs = graft.ops.Tables.documents(spark, d).count()
    val nPairs = graft.ops.LlmOps.minhashPairs(
      graft.ops.Tables.documents(spark, d)).count()
    assert(out.map(_._2).sum == nDocs, "every doc lands in exactly one degree bucket")
    assert(out.map(r => r._1 * r._2).sum == 2 * nPairs, "handshake lemma")
  }

  test("skyline_users: running-max construction equals brute-force dominance (X43)") {
    val d = "/root/testdata/sf0.001"
    val u = graft.ops.Tables.events(spark, d)
      .select($"user_id", floor($"value" * 100 + lit(0.5)).cast("long").as("c"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"c").as("cents"))
      .as[(Long, Long, Long)].collect()
    val brute = u.filter(a => !u.exists(b =>
        b._2 >= a._2 && b._3 >= a._3 && (b._2 > a._2 || b._3 > a._3)))
      .map(r => (r._1, r._2, r._3)).toSet
    val out = SparkEntry.queries("skyline_users")(spark, d)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == brute && out.nonEmpty)
    // frontier is an antichain: no member dominates another
    out.foreach(a => out.foreach(b =>
      assert(!(b._2 >= a._2 && b._3 >= a._3 && (b._2 > a._2 || b._3 > a._3)))))
  }

  test("path_transitions: rows conserve transitions and per-source probability sums to 1") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("path_transitions")(spark, d)
      .as[(String, String, Long, Double)].collect()
    val e = graft.ops.Tables.events(spark, d)
    val total = e.count()
    val users = e.select($"user_id").distinct().count()
    // Σ transition counts = Σ_user (n_u - 1) = N - |users|
    assert(out.map(_._3).sum == total - users)
    out.groupBy(_._1).values.foreach { rows =>
      val p = rows.map(_._4).sum
      assert(math.abs(p - 1.0) < 1e-4, s"per-source probabilities sum to $p")
    }
  }

  test("range_join: bin-blocked equi-join equals brute-force interval overlap") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("range_join")(spark, d)
      .as[(Long, Long)].collect().toMap
    // brute force: sessionize per user by the 30-min gap rule in Scala,
    // then count containing sessions per error event with a full scan
    val ev = graft.ops.Tables.events(spark, d)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
      .as[(Long, Long, String, Long)].collect()
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      val ivs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = -1L; var prev = -1L
      sorted.foreach { r =>
        if (start < 0 || r._4 - prev >= 1800000000L) {
          if (start >= 0) ivs += ((start, prev))
          start = r._4
        }
        prev = r._4
      }
      if (start >= 0) ivs += ((start, prev))
      ivs
    }.toArray
    val brute = ev.filter(_._3 == "error").map { p =>
      p._2 -> sessions.count(iv => iv._1 <= p._4 && p._4 <= iv._2).toLong
    }.toMap
    assert(out == brute && out.nonEmpty)
    // every error event is inside its own user's session
    assert(out.values.forall(_ >= 1))
  }

  test("dup_pagerank: integer-micropoint iteration equals a Scala recompute; mass never exceeds 10^6") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dup_pagerank")(spark, d)
      .as[(Long, Long)].collect().toMap
    val pairs = graft.ops.LlmOps.minhashPairs(graft.ops.Tables.documents(spark, d))
      .as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture must yield LSH candidate pairs")
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val n = adj.size.toLong
    var r: Map[Long, Long] = adj.keys.map(_ -> 1000000L / n).toMap
    for (_ <- 1 to 3) {
      r = adj.map { case (v, _) =>
        val sc = adj(v).map(u => r(u) / adj(u).length).sum
        v -> (150000L / n + 85L * sc / 100L)
      }
    }
    assert(out == r)
    // floor division only sheds mass — total rank stays under the budget
    assert(out.values.sum <= 1000000L && out.values.forall(_ > 0))
  }

  test("bootstrap_ci: equals a Scala replay of the Poisson bootstrap; CI brackets the exact mean (X71)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("bootstrap_ci")(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val ev = graft.ops.Tables.events(spark, d)
      .select($"event_type", $"event_id",
        floor($"value" * 100 + lit(0.5)).cast("long").as("c"))
      .as[(String, Long, Long)].collect()
    val mdig = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long, b: Int): Int = {
      val hex = mdig.digest(s"${id}_$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      Integer.parseInt(hex, 16)
    }
    def w(v: Int): Long =
      if (v < 24109) 0L else if (v < 48218) 1L else if (v < 60273) 2L
      else if (v < 64291) 3L else 4L
    val expect = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
      val n = rows.length.toLong
      val mean = rows.map(_._3).sum * 1000000L / n
      val means = (0 until 32).map { b =>
        val ws = rows.map(r => (w(h(r._2, b)), r._3))
        val wn = ws.map(_._1).sum
        val uc = if (wn == 0) 0L else ws.map(x => x._1 * x._2).sum * 1000000L / wn
        (uc, b)
      }.sorted
      (t, n, mean, means(1)._1, means(30)._1)
    }
    assert(out == expect && out.nonEmpty)
    out.foreach { case (t, _, mean, lo, hi) =>
      assert(lo <= mean && mean <= hi, s"$t: CI [$lo, $hi] misses mean $mean")
      assert(lo < hi, s"$t: degenerate CI")
    }
  }

  test("triangle_count: equals a brute-force enumeration; clustering is 3T/wedges (X57c)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("triangle_count")(spark, d)
      .as[(Long, Long, Long, Double)].collect().head
    val pairs = graft.ops.LlmOps.minhashPairs(graft.ops.Tables.documents(spark, d))
      .as[(Long, Long)].collect().toSet
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nEdges = pairs.size.toLong
    val nWedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    // brute force: enumerate id-ordered vertex triples over the edge set
    val tri = pairs.toSeq.map { case (a, b) =>
      adj(a).count(c => c > b && adj(b).contains(c)).toLong
    }.sum
    assert(out == ((nEdges, nWedges, tri,
      if (nWedges == 0) 0.0 else math.rint(3.0 * tri / nWedges * 1e6) / 1e6)))
    assert(3 * out._3 <= out._2, "closed wedges cannot exceed all wedges")
    assert(out._3 > 0, "fixture must contain near-clique triangles")
  }

  test("vocab_heavy_sketch: top-20 equals brute force; CMS law holds for EVERY corpus token in a Scala rebuild") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("vocab_heavy_sketch")(spark, d)
      .as[(String, Long, Boolean)].collect()
    assert(out.length == 20 && out.forall(_._3), "every sketch estimate within bound")
    // brute-force token counts
    val toks = graft.ops.Tables.documents(spark, d)
      .select(explode(split(graft.ops.LlmOps.normText($"text"), " ")).as("t"))
      .as[String].collect()
    val cnt = toks.groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    val expectTop = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    assert(out.map(r => (r._1, r._2)).toSeq == expectTop)
    // rebuild the CMS in Scala with the query's exact hash (md5 hex window
    // → bucket) and check the law for EVERY token, not just the top 20:
    // min-row estimate never undercounts, and overshoot stays under the
    // N/256 margin the query pins
    val mdig = java.security.MessageDigest.getInstance("MD5")
    def bucket(row: Int, t: String): Int = {
      val hex = mdig.digest(s"$row|$t".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % 4096).toInt
    }
    val sketch = Array.fill(4, 4096)(0L)
    toks.foreach(t => (0 until 4).foreach(r => sketch(r)(bucket(r, t)) += 1))
    val n = toks.length.toLong
    cnt.foreach { case (t, c) =>
      val est = (0 until 4).map(r => sketch(r)(bucket(r, t))).min
      assert(est >= c, s"CMS undercounted '$t': $est < $c")
      assert(est <= c + n / 256, s"CMS overshot '$t': $est > $c + ${n / 256}")
    }
  }

  test("gap_fill_locf: LOCF law holds — filled equals most recent observed, leading gap stays null, spine is dense") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("gap_fill_locf")(spark, d)
      .select($"event_type", $"h".cast("string"), $"v_filled", $"observed")
      .as[(String, String, Option[Double], Int)].collect()
    assert(rows.exists(_._4 == 0), "fixture must have unobserved hours at hour grain")
    val nHours = rows.map(_._2).distinct.length
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length == nHours, "every type covers the full hourly spine")
      var lastObs: Option[Double] = None
      g.sortBy(_._2).foreach { case (_, _, v, obs) =>
        if (obs == 1) { assert(v.isDefined, "observed hour must carry its value"); lastObs = v }
        else assert(v == lastObs, "gap hour must carry the last observed value")
      }
    }
  }

  test("zone_trend: integer co-moment OLS equals a Scala closed-form recompute (X72)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("zone_trend")(spark, d)
      .as[(Int, Long, Option[Double], Option[Double])].collect().toSeq
    val px = graft.ops.Tables.pixels(spark, d)
      .select($"asdf_id", ($"temporal" - 1998).cast("long"),
        floor($"value" * 100 + lit(0.5)).cast("long"))
      .as[(Int, Long, Long)].collect()
    val expect = px.groupBy(_._1).toSeq.sortBy(_._1).map { case (z, rows) =>
      val n = rows.length.toLong
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxy = rows.map(r => r._2 * r._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val den = n * sxx - sx * sx
      def r6(x: Double) = math.rint(x * 1e6) / 1e6
      if (den == 0) (z, n, None, None)
      else (z, n, Some(r6((n * sxy - sx * sy).toDouble / den)),
        Some(r6((sy * sxx - sx * sxy).toDouble / den)))
    }
    assert(out == expect && out.nonEmpty)
    // the fixture trends are finite and the intercept sits near the price
    // scale (sanity against a swapped numerator)
    out.foreach { case (z, n, sl, ic) =>
      assert(n > 0 && sl.isDefined && ic.isDefined, s"zone $z degenerate")
      assert(math.abs(ic.get) > 1e5, s"zone $z intercept not in cents scale")
    }
  }

  test("ks_drift: windowed CDF distance equals a brute-force two-sample KS (X73)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("ks_drift")(spark, d)
      .as[(Int, Long, Long, Double)].collect().toSeq
    val px = graft.ops.Tables.pixels(spark, d)
      .filter($"temporal".isin(1996, 2000))
      .select($"asdf_id", $"value", $"temporal")
      .as[(Int, Double, Int)].collect()
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val expect = px.groupBy(_._1).toSeq.sortBy(_._1).map { case (z, rows) =>
      val a = rows.filter(_._3 == 1996).map(_._2).sorted
      val b = rows.filter(_._3 == 2000).map(_._2).sorted
      val support = (a ++ b).distinct.sorted
      val dMax = support.map { v =>
        r6(math.abs(a.count(_ <= v).toDouble / a.length
          - b.count(_ <= v).toDouble / b.length))
      }.max
      (z, a.length.toLong, b.length.toLong, dMax)
    }
    assert(out == expect && out.nonEmpty)
    out.foreach { case (z, na, nb, ksd) =>
      assert(na > 0 && nb > 0, s"zone $z missing a sample")
      assert(ksd >= 0.0 && ksd <= 1.0, s"zone $z D out of [0,1]")
    }
  }

  test("benford_audit: digit distribution equals a Scala recompute; probabilities conserve (X74)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("benford_audit")(spark, d)
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    val cents = graft.ops.Tables.pixels(spark, d)
      .select(floor($"value" * 100 + lit(0.5)).cast("long"))
      .as[Long].collect().filter(_ > 0)
    val total = cents.length.toLong
    val counts = cents.groupBy(_.toString.head.asDigit).view.mapValues(_.length.toLong)
    assert(out.map(_._1) == counts.keys.toSeq.sorted, "one row per observed digit")
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    out.foreach { case (dg, nObs, pObs, pExp, chi) =>
      assert(nObs == counts(dg))
      assert(pObs == r6(nObs.toDouble / total))
      assert(chi == r6(math.pow(nObs.toDouble - total * pExp, 2) / (total * pExp)))
    }
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-4, "Benford literals must sum to 1")
    assert(out.map(_._2).sum == total, "digit counts conserve the row count")
  }

  test("survival_km: product-limit curve equals a Scala KM recompute; survival laws hold (X76)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("survival_km")(spark, d)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val days = graft.ops.Tables.events(spark, d)
      .select($"user_id", datediff(to_date($"ts"), lit("1970-01-01")).cast("long"))
      .as[(Long, Long)].collect()
    val users = days.groupBy(_._1).toSeq.map { case (_, g) =>
      (g.map(_._2).min, g.map(_._2).max) }
    val m = users.map(_._2).max
    val lifet = users.map { case (f, l) => (l - f, if (l < m - 7) 1L else 0L) }
    val n = lifet.size.toLong
    var atRisk = n; var surv = 1.0
    val expect = lifet.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
      val a = g.size.toLong; val dd = g.map(_._2).sum
      val row = {
        if (dd > 0 && dd < atRisk) surv *= 1.0 - dd.toDouble / atRisk
        else if (dd == atRisk) surv = 0.0
        (t, atRisk, dd, a - dd, math.rint(surv * 1e6) / 1e6)
      }
      atRisk -= a
      row
    }
    assert(out == expect && out.nonEmpty)
    // survival laws: monotone non-increasing, in [0,1], risk set conserves
    assert(out.map(_._5) == out.map(_._5).sorted.reverse, "S(t) must not increase")
    assert(out.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
    assert(out.head._2 == n, "first risk set is every user")
    assert(out.map(r => r._3 + r._4).sum == n, "deaths+censored conserve users")
  }

  test("gini_spend: two-phase banded rank equals a direct global-sort Gini (X77)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("gini_spend")(spark, d)
      .as[(Long, Long, Double, Double)].collect().head
    val sp = graft.ops.Tables.events(spark, d)
      .select($"user_id", floor($"value" * 100 + lit(0.5)).cast("long").as("c"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (u, g) => (u, g.map(_._2).sum) }.toSeq
    val ranked = sp.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((_, s), i) => (i + 1L, s) }
    val n = ranked.size.toLong; val tot = ranked.map(_._2).sum
    val t1 = ranked.map { case (i, s) => i * s }.sum
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val gini = r6(2.0 * t1 / (n.toDouble * tot) - (n + 1.0) / n)
    val topSum = ranked.filter(_._1 > n - n / 10).map(_._2).sum
    assert(out == ((n, tot, gini, r6(topSum.toDouble / tot))))
    assert(out._3 >= 0.0 && out._3 < 1.0, "Gini must sit in [0, 1)")
    assert(out._4 >= (n / 10).toDouble / n - 1e-9,
      "the top spenders cannot hold less than their head count's uniform share")
  }

  test("ab_test: Welch t equals a direct Scala recompute; arms partition users (X79)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("ab_test")(spark, d)
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    val sp = graft.ops.Tables.events(spark, d)
      .select($"user_id", floor($"value" * 100 + lit(0.5)).cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).toSeq.map { case (u, g) => (u % 2, g.map(_._2).sum) }
    def stats(arm: Long) = {
      val xs = sp.filter(_._1 == arm).map(_._2)
      (xs.size.toLong, xs.sum, xs.map(x => x * x).sum)
    }
    val (n0, s10, s20) = stats(0); val (n1, s11, s21) = stats(1)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    def mean(s1: Long, n: Long) = s1.toDouble / n.toDouble
    def varr(s2: Long, s1: Long, n: Long) =
      (s2.toDouble - s1.toDouble * s1.toDouble / n.toDouble) / (n.toDouble - 1.0)
    val se = math.sqrt(
      varr(s20, s10, n0) / n0.toDouble + varr(s21, s11, n1) / n1.toDouble)
    val t = if (se == 0.0) 0.0 else r6((mean(s11, n1) - mean(s10, n0)) / se)
    assert(out == ((n0, n1, r6(mean(s10, n0)), r6(mean(s11, n1)),
      r6(mean(s11, n1) - mean(s10, n0)), t)))
    assert(n0 + n1 == sp.size, "arms partition the user population")
    assert(varr(s20, s10, n0) > 0 && varr(s21, s11, n1) > 0,
      "the metric must be non-degenerate (why this is spend, not conversion)")
  }

  test("centroid_confusion: matrix equals a Scala nearest-centroid recompute " +
    "and conserves the test half (X78)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("centroid_confusion")(spark, d)
      .as[(String, String, Long)].collect().toSeq
    val vecs = graft.ops.Tables.embeddings(spark, d)
      .select($"vec_id", $"label", $"embedding".cast("array<double>"))
      .as[(Long, String, Seq[Double])].collect()
    def q(x: Double) = math.floor(x * 1000000 + 0.5).toLong + 1000000L
    val train = vecs.filter(_._1 % 2 == 0)
    val test = vecs.filter(_._1 % 2 != 0)
    val cents = train.groupBy(_._2).map { case (lab, g) =>
      lab -> g.head._3.indices.map { i =>
        val xs = g.map(v => q(v._3(i))); xs.sum / xs.size // positive: / == div
      }
    }
    val expect = test.map { case (_, lab, v) =>
      val pred = cents.map { case (cl, mu) =>
        (v.indices.map(i => { val dd = q(v(i)) - mu(i); dd * dd }).sum, cl)
      }.min._2
      (lab, pred)
    }.groupBy(identity).map { case ((t, p), g) => (t, p, g.size.toLong) }
      .toSeq.sorted
    assert(out.sorted == expect && out.nonEmpty)
    assert(out.map(_._3).sum == test.size, "every test vector lands in one cell")
    val trainLabels = cents.keySet
    assert(out.forall(r => trainLabels.contains(r._2)),
      "predictions only ever name train-half centroids")
  }

  test("classifier_metrics: margins derive from the confusion matrix; F1 is " +
    "the harmonic mean; micro-averages close (X80)") {
    val d = "/root/testdata/sf0.001"
    val cm = SparkEntry.queries("centroid_confusion")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    val out = SparkEntry.queries("classifier_metrics")(spark, d)
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val labels = (cm.map(_._1) ++ cm.map(_._2)).distinct.sorted
    val expect = labels.map { l =>
      val support = cm.filter(_._1 == l).map(_._3).sum
      val predicted = cm.filter(_._2 == l).map(_._3).sum
      val tp = cm.filter(r => r._1 == l && r._2 == l).map(_._3).sum
      (l, support, predicted, tp,
        if (predicted == 0) 0.0 else r6(tp.toDouble / predicted),
        if (support == 0) 0.0 else r6(tp.toDouble / support),
        if (support + predicted == 0) 0.0
        else r6(2.0 * tp / (support + predicted)))
    }
    assert(out == expect && out.nonEmpty)
    // harmonic-mean identity (2tp/(s+p) == 2PR/(P+R)) up to double rounding
    out.filter(r => r._5 > 0 && r._6 > 0).foreach { r =>
      assert(math.abs(r._7 - 2 * r._5 * r._6 / (r._5 + r._6)) < 1e-5)
    }
    val n = cm.map(_._3).sum
    assert(out.map(_._2).sum == n && out.map(_._3).sum == n,
      "support and predicted margins both conserve the test population")
  }

  test("funnel_latency: banded-rank order statistics equal a direct Scala " +
    "recompute and are monotone (X81)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("funnel_latency")(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val ev = graft.ops.Tables.events(spark, d)
      .select($"user_id", $"event_type", unix_micros($"ts"))
      .as[(Long, String, Long)].collect().toSeq
    val lats = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val views = g.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val fv = views.min
        val ps = g.filter(e => e._2 == "purchase" && e._3 >= fv).map(_._3)
        if (ps.isEmpty) None else Some((ps.min - fv) / 1000000L)
      }
    }.sorted
    val n = lats.size.toLong
    def at(r: Long) = lats((r - 1).toInt)
    assert(out == ((n, lats.min, lats.max, at((n + 1) / 2), at((9 * n + 9) / 10))))
    assert(out._2 <= out._4 && out._4 <= out._5 && out._5 <= out._3,
      "min <= p50 <= p90 <= max")
  }

  test("novelty_curve: per-batch new-shingle fractions equal a Scala " +
    "recompute; the first batch is all-new and counts conserve (X82)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("novelty_curve")(spark, d)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val docsL = graft.ops.Tables.documents(spark, d)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val mx = docsL.map(_._1).max
    val bs = docsL.flatMap { case (id, text) =>
      val w = text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
      val shs = if (w.length > 1) w.sliding(2).map(_.mkString(" ")).toSeq
                else Seq.empty
      shs.map(sh => ((id * 10) / (mx + 1), sh))
    }.distinct
    val totals = bs.groupBy(_._1).map { case (b, g) => (b, g.size.toLong) }
    val news = bs.groupBy(_._2).toSeq.map { case (sh, g) => (g.map(_._1).min, sh) }
      .groupBy(_._1).map { case (b, g) => (b, g.size.toLong) }
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val expect = totals.toSeq.sortBy(_._1).map { case (b, t) =>
      val nn = news.getOrElse(b, 0L)
      (b, t, nn, r6(nn.toDouble / t))
    }
    assert(out == expect && out.nonEmpty)
    assert(out.head._4 == 1.0, "every shingle in the first batch is new")
    assert(out.map(_._3).sum == bs.map(_._2).distinct.size.toLong,
      "new counts across batches conserve the distinct shingle universe")
  }

  test("lang_mixture: per-doc foreign-line fraction equals a Scala recompute " +
    "of the X4b marker vote over the X15 line split (X83)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("lang_mixture")(spark, d)
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    val docsL = graft.ops.Tables.documents(spark, d)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
    def vote(line: String): String = {
      val t = line.split(" ")
      def sc(m: Set[String]) = t.count(m)
      val (de, en, es, fr) = (sc(Set("der", "die", "und")),
        sc(Set("the", "and", "of")), sc(Set("el", "los", "y")),
        sc(Set("le", "la", "et")))
      if (de >= en && de >= es && de >= fr) "de"
      else if (en >= es && en >= fr) "en"
      else if (es >= fr) "es" else "fr"
    }
    val expect = docsL.toSeq.flatMap { case (id, lang, text) =>
      val w = text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
      val lines = w.grouped(12).map(_.mkString(" ")).toSeq
      if (lines.isEmpty) None
      else {
        val nf = lines.count(l => vote(l) != lang)
        Some((id, lang, lines.size.toLong, nf.toLong,
          math.rint(nf.toDouble / lines.size * 1e6) / 1e6))
      }
    }.sortBy(_._1)
    assert(out == expect && out.nonEmpty)
    assert(out.forall(r => r._4 <= r._3 && r._5 >= 0.0 && r._5 <= 1.0))
  }

  test("ewma_smooth: quantized-weight EWMA equals an exact Scala long-arithmetic recompute (X84)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("ewma_smooth")(spark, d)
      .as[(java.sql.Date, Long, Double)].collect().toSeq
    val byDay = graft.ops.Tables.events(spark, d)
      .select(org.apache.spark.sql.functions.to_date($"ts").as("day"), $"value")
      .as[(java.sql.Date, Double)].collect()
      .groupBy(_._1).toSeq
      .map { case (day, g) =>
        (day, g.map(r => math.floor(r._2 * 100 + 0.5).toLong).sum)
      }
      .sortBy(_._1.toLocalDate.toEpochDay)
    val ws = Seq(250000L, 187500L, 140625L, 105469L, 79102L, 59326L,
      44495L, 33371L, 25028L, 18771L, 14078L, 10559L, 7919L, 5939L,
      4454L, 3341L)
    val ys = byDay.map(_._2)
    val expect = byDay.zipWithIndex.map { case ((day, y), i) =>
      // exact long sums: numerator over present lags, denominator
      // renormalizes over the same set — one double division closes
      val num = ws.zipWithIndex.map { case (w, j) =>
        if (i - j >= 0) ys(i - j) * w else 0L }.sum
      val den = ws.zipWithIndex.map { case (w, j) =>
        if (i - j >= 0) w else 0L }.sum
      (day, y, math.rint(num.toDouble / den.toDouble * 1e6) / 1e6)
    }
    assert(out == expect && out.nonEmpty)
    // the series head has no history: row 0's EWMA is exactly its own value
    assert(out.head._3 == math.rint(out.head._2.toDouble * 1e6) / 1e6)
  }

  test("seasonal_anomaly: dow-baseline z equals a Scala recompute; the flag is the rounded z (X85)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("seasonal_anomaly")(spark, d)
      .as[(java.sql.Date, Long, Long, Double, Boolean)].collect().toSeq
    val byDay = graft.ops.Tables.events(spark, d)
      .select(org.apache.spark.sql.functions.to_date($"ts").as("day"), $"value")
      .as[(java.sql.Date, Double)].collect()
      .groupBy(_._1).toSeq
      .map { case (day, g) =>
        (day, g.map(r => math.floor(r._2 * 100 + 0.5).toLong).sum) }
      .sortBy(_._1.toLocalDate.toEpochDay)
    val withDow = byDay.map { case (day, y) =>
      (day, y, ((day.toLocalDate.toEpochDay % 7) + 7) % 7) }
    val st = withDow.groupBy(_._3).map { case (dow, g) =>
      val n = g.size.toLong
      val s1 = g.map(_._2).sum
      val s2 = g.map(r => r._2 * r._2).sum
      (dow, (n, s1, s2))
    }
    val expect = withDow.map { case (day, y, dow) =>
      val (n, s1, s2) = st(dow)
      val nD = n.toDouble
      val v = (s2.toDouble - s1.toDouble * s1.toDouble / nD) / (nD - 1.0)
      val z = if (n == 1 || v <= 0.0) 0.0
        else math.rint((y.toDouble - s1.toDouble / nD) / math.sqrt(v) * 1e6) / 1e6
      (day, y, dow, z, math.abs(z) > 2.0)
    }
    assert(out == expect && out.nonEmpty)
    assert(out.exists(!_._5), "a typical day must not be anomalous")
  }

  test("cluster_balanced_sample: rows conserve the corpus; singletons always keep; kept <= docs (X86)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("cluster_balanced_sample")(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val nDocs = graft.ops.Tables.documents(spark, d).count()
    assert(out.map(_._3).sum == nDocs, "per-size doc counts conserve the corpus")
    out.foreach { case (sz, nc, nd, nk) =>
      assert(nd == nc * sz, s"size-$sz row must hold exactly sz docs per cluster")
      assert(nk <= nd, s"size-$sz kept exceeds docs")
    }
    // b in 0..255 so b*1 < 256 always: every singleton survives the sampler
    out.find(_._1 == 1L).foreach { case (_, _, nd, nk) =>
      assert(nk == nd, "singleton clusters must keep every doc")
    }
    assert(out.map(_._1) == out.map(_._1).sorted && out.nonEmpty)
  }

  test("shard_balance: snake-packed shards equal a direct Scala deal; tokens conserve (X87)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("shard_balance")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    val nt = graft.ops.Tables.documents(spark, d)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .map { case (id, text) =>
        (id, text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ").length.toLong) }
    val dealt = nt.sortBy { case (id, n) => (-n, -id) }.zipWithIndex
      .map { case ((_, n), i) =>
        val pos = i % 16
        val shard = if (pos < 8) pos.toLong else 15L - pos
        (shard, n)
      }
    val expect = dealt.groupBy(_._1).toSeq.map { case (sh, g) =>
      (sh, g.size.toLong, g.map(_._2).sum) }.sortBy(_._1)
    assert(out == expect && out.map(_._1) == (0L to 7L))
    assert(out.map(_._3).sum == nt.map(_._2).sum, "token mass conserves")
    val totals = out.map(_._3)
    assert(totals.max - totals.min <= 2 * nt.map(_._2).max,
      s"snake deal must bound shard skew: $totals")
  }

  test("chi2_tokens: per-lang top-5 equals a brute-force chi-square recompute (X88)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("chi2_tokens")(spark, d)
      .as[(String, String, Long, Double, Long)].collect().toSeq
    val docsL = graft.ops.Tables.documents(spark, d)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
    val tl = docsL.toSeq.flatMap { case (_, lang, text) =>
      text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
        .map(tok => (tok, lang))
    }.groupBy(identity).map { case ((tok, lang), g) => (tok, lang, g.size.toLong) }.toSeq
    val ta = tl.groupBy(_._1).map { case (t, g) => (t, g.map(_._3).sum) }
    val la = tl.groupBy(_._2).map { case (l, g) => (l, g.map(_._3).sum) }
    val nn = tl.map(_._3).sum
    val expect = tl.map { case (tok, lang, a) =>
      val (taV, laV) = (ta(tok), la(lang))
      val chi2 =
        if (taV == nn || laV == nn) 0.0
        else {
          val det = a.toDouble * (nn - taV - laV + a).toDouble -
            (taV - a).toDouble * (laV - a).toDouble
          val den = taV.toDouble * (nn - taV).toDouble *
            laV.toDouble * (nn - laV).toDouble
          math.rint(nn.toDouble * det * det / den * 1e6) / 1e6
        }
      (lang, tok, a, chi2)
    }.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy(r => (-r._4, r._2)).take(5).zipWithIndex
        .map { case ((l, t, a, c), i) => (l, t, a, c, i + 1L) }
    }.sortBy(r => (r._1, r._5))
    assert(out == expect && out.nonEmpty)
    out.groupBy(_._1).foreach { case (l, g) =>
      assert(g.map(_._5) == (1L to 5L), s"lang $l must carry ranks 1..5")
    }
  }

  test("hist_equidepth: tiles are depth-balanced within one row, ordered, and conserve counts (X75)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("hist_equidepth")(spark, d)
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    val nPx = graft.ops.Tables.pixels(spark, d).count()
    assert(out.map(_._3).sum == nPx, "tiles conserve the row count")
    out.groupBy(_._1).foreach { case (z, tiles) =>
      assert(tiles.map(_._2).sorted == (1L to 10L), s"zone $z must have tiles 1..10")
      val ns = tiles.map(_._3)
      assert(ns.max - ns.min <= 1, s"zone $z not depth-balanced: $ns")
      val ordered = tiles.sortBy(_._2)
      ordered.foreach { t => assert(t._4 <= t._5, s"zone $z tile ${t._2} lo>hi") }
      ordered.sliding(2).foreach {
        case Seq(p, q) => assert(p._5 <= q._4 + 1e-12,
          s"zone $z tiles ${p._2}->${q._2} overlap beyond a boundary tie")
        case _ =>
      }
    }
  }

  test("mix_waterfill: budget conserves exactly, caps respected, uncapped even (X89)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("mix_waterfill")(spark, d)
      .as[(String, Long, Long, Boolean, Long)].collect().toSeq
    assert(out.nonEmpty)
    val budget = out.head._3
    assert(out.forall(_._3 == budget), "budget is a single global scalar")
    val tot = out.map(_._2).sum
    assert(budget == tot * 2 / 5, "budget = 40% of supply, integer floor")
    out.foreach { case (l, sup, _, capped, alloc) =>
      assert(alloc <= sup, s"$l allocated beyond supply")
      assert(alloc >= 0, s"$l negative allocation")
      if (capped) assert(alloc == sup, s"$l capped but not at supply")
    }
    val uncapped = out.filter(!_._4).map(_._5)
    if (uncapped.nonEmpty) {
      assert(out.map(_._5).sum == budget,
        "with any uncapped language the waterfill must spend the budget exactly")
      assert(uncapped.max - uncapped.min <= 1,
        s"uncapped allocations must be even within 1: $uncapped")
      // water level: every uncapped share is >= every capped supply
      val cappedSup = out.filter(_._4).map(_._2)
      if (cappedSup.nonEmpty)
        assert(uncapped.min >= cappedSup.max,
          "a capped language cannot sit above the water level")
    } else assert(out.map(_._5).sum == tot, "all capped -> allocate everything")
  }

  test("dedup_containment: constructed excerpts are all found at containment 1 (X2h)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dedup_containment")(spark, d)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (a, b, na, ni, c) =>
      assert(a != b && ni <= na && na >= 20, s"pair ($a,$b) malformed")
      assert(c >= 0.5 && c <= 1.0, s"pair ($a,$b) containment $c out of range")
    }
    // recall-1 guarantee for full containment: every excerpt row that met
    // the 20-shingle floor MUST be caught against its parent with C = 1
    // (all its shingles, including its two signature minima, are in the
    // parent's set by construction)
    val expected = graft.ops.Tables.documents(spark, d)
      .filter($"doc_id" % 7 === 0)
      .withColumn("norm", graft.ops.LlmOps.normText($"text"))
      .withColumn("ex", expr("substring(norm, 11, 120)"))
      .filter(length($"ex") >= 8)
      .withColumn("s", expr(
        "array_distinct(transform(sequence(1, length(ex)-7), i -> substring(ex, i, 8)))"))
      .filter(size($"s") >= 20)
      .select((-$"doc_id" - 1L).as("a"), $"doc_id".as("b"))
      .as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture must yield at least one excerpt")
    val got = out.map(t => (t._1, t._2)).toSet
    expected.foreach { pr =>
      assert(got.contains(pr), s"excerpt pair $pr missed (recall-1 violated)") }
    out.filter(t => expected.contains((t._1, t._2))).foreach {
      case (a, b, na, ni, c) =>
        assert(ni == na && c == 1.0, s"excerpt ($a,$b) not fully contained")
    }
  }

  test("pii_audit: rollup reconciles with the documents table (X8b)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("pii_audit")(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val byLang = graft.ops.Tables.documents(spark, d)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n"),
        sum(when($"doc_id" % 3 === 0, 1L).otherwise(0L)).as("stressed"))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out.map(_._1).toSet == byLang.keySet, "every language reported")
    out.foreach { case (lang, nDocs, flagged, e, u, m) =>
      val (n, stressed) = byLang(lang)
      assert(nDocs == n, s"$lang doc count")
      assert(flagged >= stressed && flagged <= nDocs,
        s"$lang: each stressed doc carries an email+url+num, so flagged >= $stressed")
      // the dirty prefix contributes exactly one of each per stressed doc
      assert(e >= stressed && u >= stressed && m >= stressed,
        s"$lang: per-type counts must cover the stressed docs")
    }
  }

  test("kappa_agreement: kappa recomputes exactly from the shared langid vote (X91)") {
    val d = "/root/testdata/sf0.001"
    val Array((n, agree, peNum, kappaR)) =
      SparkEntry.queries("kappa_agreement")(spark, d)
        .as[(Long, Long, Long, Double)].collect()
    // recompute from text_langid, which consumes the SAME shared rule
    val votes = SparkEntry.queries("text_langid")(spark, d)
      .select($"lang", $"pred").as[(String, String)].collect().toSeq
    assert(n == votes.size)
    assert(agree == votes.count(v => v._1 == v._2))
    val rows = votes.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cols = votes.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pe = (rows.keySet ++ cols.keySet).toSeq
      .map(l => rows.getOrElse(l, 0L) * cols.getOrElse(l, 0L)).sum
    assert(peNum == pe, "chance-agreement numerator from exact margins")
    val want =
      if (n * n == pe) 0.0
      else BigDecimal((n * agree - pe).toDouble / (n * n - pe).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(kappaR == want, s"kappa $kappaR != recomputed $want")
    assert(kappaR >= -1.0 && kappaR <= 1.0)
  }

  test("rfm_scores: scores recompute from a brute-force global rank (X92)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("rfm_scores")(spark, d)
      .as[(Long, Long, Long, Long, Int, Int, Int, Int)].collect().toSeq
    val ev = graft.ops.Tables.events(spark, d)
      .select($"user_id", to_date($"ts").as("day"),
        floor($"value" * 100 + 0.5).cast("long").as("c"))
      .as[(Long, java.sql.Date, Long)].collect()
    val users = ev.groupBy(_._1).toSeq.map { case (u, es) =>
      (u, es.size.toLong, es.map(_._3).sum, es.map(_._2.toLocalDate).max(
        Ordering.by((x: java.time.LocalDate) => x.toEpochDay)))
    }
    val gmax = users.map(_._4.toEpochDay).max
    val nu = users.size.toLong
    def score(rank: Long): Int = (5L - (5L * (rank - 1)) / nu).toInt
    val m = users.map { case (u, ne, cents, last) =>
      (u, gmax - last.toEpochDay, ne, cents) }
    val rr = m.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val rf = m.sortBy(t => (-t._3, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val rm = m.sortBy(t => (-t._4, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val want = m.map { case (u, rd, ne, cents) =>
      val (r, f, mo) = (score(rr(u)), score(rf(u)), score(rm(u)))
      (u, rd, ne, cents, r, f, mo, r * 100 + f * 10 + mo)
    }.sortBy(_._1)
    assert(out == want && out.nonEmpty)
    out.foreach { case (_, _, _, _, r, f, mo, _) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && mo >= 1 && mo <= 5)
    }
  }

  test("woe_bins: tiles balance and order; WOE recomputes exactly from the integer margins (X93)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("woe_bins")(spark, d)
      .as[(Int, Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._1) == (1 to 10), "bins 1..10, each non-empty")
    val nDocs = graft.ops.Tables.documents(spark, d).count()
    assert(out.map(_._2).sum == nDocs, "bins conserve the corpus")
    assert(out.map(_._2).max - out.map(_._2).min <= 1, "cume-tile balance within 1")
    // label totals reconcile with the shared gate rule via quality_gate
    val gTot = SparkEntry.queries("quality_gate")(spark, d)
      .agg(sum($"pass")).as[Long].collect().head
    assert(out.map(_._3).sum == gTot, "good counts conserve the gate passes")
    out.foreach { case (_, n, good, bad, lo, hi, _, _) =>
      assert(good + bad == n && lo <= hi)
    }
    // non-overlapping ordered length ranges (boundary ties impossible:
    // the rank orders by n_chars first)
    out.sliding(2).foreach {
      case Seq(a, b) => assert(a._6 <= b._5, s"bins ${a._1}->${b._1} overlap")
      case _ =>
    }
    // WOE/IV close exactly from the integer margins with the same IEEE ops
    val (nTot, gAll) = (out.map(_._2).sum, out.map(_._3).sum)
    val bAll = nTot - gAll
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { case (bin, _, good, bad, _, _, woeR, ivR) =>
      val gr = (good + 0.5) / (gAll + 5.0)
      val br = (bad + 0.5) / (bAll + 5.0)
      assert(woeR == r6(math.log(gr / br)), s"bin $bin woe")
      assert(ivR == r6((gr - br) * math.log(gr / br)), s"bin $bin iv term")
    }
    // the gate passes longer docs: WOE must not be flat across bins
    assert(out.map(_._7).distinct.size > 1, "degenerate WOE profile")
  }

  test("user_entropy: entropy recomputes from per-user type counts and respects bounds (X94)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("user_entropy")(spark, d)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val ev = graft.ops.Tables.events(spark, d)
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    assert(out.map(_._2).sum == ev.length, "per-user counts conserve events")
    val byUser = ev.groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
    out.foreach { case (u, n, k, h) =>
      val counts = byUser(u)
      assert(k == counts.size && n == counts.values.sum)
      val want = -counts.values.map { c =>
        (c.toDouble / n) * math.log(c.toDouble / n) }.sum + 0.0
      assert(math.abs(h - want) <= 2e-6, s"user $u entropy $h vs $want")
      assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-9,
        s"user $u entropy out of [0, ln(k)]")
    }
  }

  test("holt_trend: forecast closes from level+trend; the windowed recursion replays to quantization precision (X96)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("holt_trend")(spark, d)
      .as[(java.sql.Date, Long, Double, Double, Double)].collect().toSeq
    val byDay = graft.ops.Tables.events(spark, d)
      .select(to_date($"ts").as("day"), floor($"value" * 100 + 0.5).cast("long").as("c"))
      .groupBy("day").agg(sum($"c").as("y"))
      .orderBy("day").as[(java.sql.Date, Long)].collect().toSeq
    assert(out.size == byDay.size - 15, "rows without all 16 lags are dropped")
    out.foreach { case (_, _, l, b, f) =>
      assert(math.abs(f - (l + 7 * b)) <= 2e-5, "forecast7 = level + 7*trend")
    }
    // replay the EXACT 16-step re-initialized recursion per window:
    // the only divergence allowed is the micro-unit weight quantization
    // (|q/1e6 - w| <= 5e-7 each, 16 terms) plus the round(_, 6) output
    val (alpha, beta) = (0.3, 0.2)
    val ys = byDay.map(_._2.toDouble)
    val idx = byDay.map(_._1).zipWithIndex.toMap
    val tol = 16 * 5e-7 * ys.map(math.abs).max + 1e-5
    out.foreach { case (day, _, level, trend, _) =>
      val t = idx(day)
      val win = ys.slice(t - 15, t + 1)
      var l = win.head; var b = 0.0
      win.tail.foreach { y =>
        val l1 = alpha * y + (1 - alpha) * (l + b)
        b = beta * (l1 - l) + (1 - beta) * b
        l = l1
      }
      assert(math.abs(level - l) <= tol, s"$day: level $level vs exact $l")
      assert(math.abs(trend - b) <= tol, s"$day: trend $trend vs exact $b")
    }
  }

  test("mix_temperature: weights flatten the distribution and conserve mass (X97)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("mix_temperature")(spark, d)
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(out.nonEmpty)
    val tot = out.map(_._2).sum
    assert(math.abs(out.map(_._3).sum - 1.0) <= 1e-4, "p sums to 1")
    assert(math.abs(out.map(_._4).sum - 1.0) <= 1e-4, "w sums to 1")
    // temperature < 1 exponent flattens: the scarcest language gains
    // share, the richest loses share (strictly, unless already uniform)
    val bysup = out.sortBy(_._2)
    if (bysup.head._2 != bysup.last._2) {
      assert(bysup.head._4 > bysup.head._3, "low-resource lang upsampled")
      assert(bysup.last._4 < bysup.last._3, "high-resource lang downsampled")
    }
    out.foreach { case (lang, sup, p, w, target) =>
      val w6 = math.round(w * 1e6)
      assert(target == w6 * tot / 1000000L, s"$lang target from integer micro-units")
      assert(sup > 0 && p > 0 && w > 0)
    }
  }

  test("public bandedRank equals a plain global row_number for any band " +
    "edge set (adversarial: 95% of keys tied in one clump)") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(13)
    // 95% of the population in one value clump — the shape where a bad
    // banding rule (non-monotone, or tie-splitting) would mis-rank
    val rows = (0 until 2000).map { i =>
      val v = if (rnd.nextInt(20) != 0) 500L else rnd.nextInt(100000).toLong
      (i.toLong, v)
    }
    val df = rows.toDF("id", "v")
    for (asc <- Seq(true, false)) {
      val got = Analytics.bandedRank(df, "v", "id", asc, "r")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val ord = if (asc) Seq(col("v").asc, col("id").asc)
                else Seq(col("v").desc, col("id").asc)
      val want = df.withColumn("r",
          row_number().over(Window.orderBy(ord: _*)).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == want, s"asc=$asc banded ranks diverge from global sort")
    }
  }

  test("public zonedNtile equals ntile() for every k on skewed zones " +
    "(one hot zone, tiny zones, heavy ties)") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(17)
    val rows: Seq[(String, Long, Long)] = (0 until 3000).map { i =>
      val z = if (rnd.nextInt(10) != 0) "hot" else s"z${rnd.nextInt(5)}"
      val v = if (rnd.nextInt(3) == 0) 42L else rnd.nextInt(1000).toLong
      (z, v, i.toLong)
    } :+ (("solo", 7L, 99999L)) :+ // n=1 zone: ntile(k) of one row is 1
      // NULL zone group: groupBy/ntile both keep it — every attach in
      // zonedNtile must be null-safe or these rows silently vanish
      ((null: String, 3L, 99998L)) :+ ((null: String, 9L, 99997L)) :+
      ((null: String, 5L, 99996L))
    val df = rows.toDF("zone", "v", "id")
    for (k <- Seq(2, 4, 10)) {
      val got = Analytics.zonedNtile(df, "zone", "v", Seq("id"), k, "tile")
        .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3)).toMap
      val w = Window.partitionBy("zone").orderBy(col("v"), col("id"))
      val want = df.withColumn("tile", ntile(k).over(w).cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getLong(3)).toMap
      assert(got == want, s"k=$k tiles diverge from ntile")
    }
  }

  test("adaptive band count: ranks/tiles identical for ANY rows-per-band " +
    "target and grid resolution (k=1 degenerate, mid, clamped at maxBands)") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(29)
    // ties + a hot clump so band boundaries land inside tie runs
    val rows = (0 until 2500).map { i =>
      val v = if (rnd.nextInt(4) == 0) 77L else rnd.nextInt(500).toLong
      (i.toLong, v, if (rnd.nextInt(5) != 0) "hot" else s"z${rnd.nextInt(3)}")
    }
    val df = rows.toDF("id", "v", "zone")
    val wantRank = df.withColumn("r",
        row_number().over(Window.orderBy(col("v").asc, col("id").asc)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val wNt = Window.partitionBy("zone").orderBy(col("v"), col("id"))
    val wantTile = df.withColumn("t", ntile(7).over(wNt).cast("long"))
      .collect().map(r => (r.getString(2), r.getLong(0)) -> r.getLong(3)).toMap
    // (target, maxBands): default-budget degenerate single band; a mid
    // setting where k = ceil(n/target) is adaptive; target=1 where k
    // CLAMPS at maxBands (every fine cell its own band); tiny grid
    for ((tgt, mb) <- Seq((1L << 16, 4096), (256L, 4096), (1L, 64), (64L, 16))) {
      val gotR = Analytics.bandedRank(df, "v", "id", asc = true, "r",
          target = tgt, maxBands = mb)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(gotR == wantRank, s"bandedRank diverges at target=$tgt maxBands=$mb")
      val gotT = Analytics.zonedNtile(df, "zone", "v", Seq("id"), 7, "t",
          target = tgt, maxBands = mb)
        .collect().map(r => (r.getString(2), r.getLong(0)) -> r.getLong(3)).toMap
      assert(gotT == wantTile, s"zonedNtile diverges at target=$tgt maxBands=$mb")
    }
    // the descent requires a power-of-two grid — reject loudly
    val ex = intercept[IllegalArgumentException] {
      Analytics.bandedRank(df, "v", "id", asc = true, "r", maxBands = 48)
    }
    assert(ex.getMessage.contains("power of two"))
  }
}
