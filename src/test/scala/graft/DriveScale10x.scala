package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{LlmOps, Tables}

/** Scale stress-drive (round-6 verdict #1): measure how the most expensive
  * operators actually scale from sf0.1 to a synthetic 10× (sf1-equivalent)
  * corpus, instead of extrapolating SCALE.md from sf0.1 plans alone.
  *
  * The amplified corpus is ADVERSARIAL, not a clean replica:
  * - `documents` ×10 with each copy's text alphabet-rotated (copies are
  *   disjoint in shingle space — near-dup candidate growth stays honest),
  *   PLUS a boilerplate MEGACLUSTER: 2% of every copy's docs share one
  *   literal text (~1,000 identical docs — the worst case for any
  *   band-bucketed dedup, a single quadratic bucket).
  * - `events` ×10 with copies' users disjoint EXCEPT whales: users with
  *   `user_id % 997 == 0` keep their id in every copy and get 30 extra
  *   copies (×40 event skew on ~0.1% of users).
  * - `lineitem` ×10, plus 30 extra copies of every row sold by a
  *   nation-0 supplier — one zone holds ~14% of all pixels (hot-zone skew
  *   for the exact holistic extracts).
  * - `embeddings` ×10 (ids shifted; each copy keeps the %50 query
  *   density, so the registered ANN row's workload grows WITH the corpus
  *   — the fixed-|Q| variant below separates workload growth from
  *   operator growth).
  *
  * Protocol per (op, scale): one unmeasured warm run, one measured run,
  * hash-every-output-column action (the Bench protocol). The scaling
  * exponent is log10(t_10x / t_1x) — 1.0 = perfectly linear, >1
  * super-linear. Results land in SCALE.md's measured-exponent table.
  *
  * Usage: Test/runMain graft.DriveScale10x [bigDir] [op1 op2 ...]
  */
object DriveScale10x {
  val COPIES = 10
  val EXTRA = 30 // additional skew copies for hot suppliers / whale users

  val ops = Seq(
    "dedup_containment", "repeated_ngrams", "dedup_simhash_pairs",
    "multimodal_resize", "extract_mad", "tfidf_top", "dedup_ngram_jaccard",
    "sim_topk_ivf_kmeans", "rfm_scores", "incremental_daily")

  /** Second-tier drive (`--tier2`): the next-most-expensive families —
    * exact holistic extracts vs their sketch forms, the LSH/CC cluster
    * chain on the megacluster graph, bloom decontamination, and the
    * banded-rank statistics. */
  val ops2 = Seq(
    "extract_percentile", "extract_percentile_sketch",
    "extract_unique", "extract_unique_sketch",
    "dedup_minhash", "dedup_clusters", "dup_pagerank",
    "decontaminate_bloom", "bm25_top", "sessionize_events",
    "gini_spend", "woe_bins")

  def main(args: Array[String]): Unit = {
    // bench-shaped session (NOT TestSpark's local[4]): exponents are only
    // comparable to BASELINE.md/BENCH rows if the parallelism matches.
    // Run with SPARK_DRIVER_MEM=24g — the 10x corpus holds several
    // corpus-sized checkpoints at once during the dedup families.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // decade-3 partition-sizing experiments: shuffle partitions sized to
    // the DATA (the production rule), overriding the bench default of
    // one-per-core — at 100M+ rows, 32 partitions means multi-million-row
    // sort partitions and the measurement reads spill, not the operator
    val shufP = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufP)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val base = "/root/testdata/sf0.1"
    val big = if (args.nonEmpty) args(0) else "/tmp/graft_scale10x"
    val chosen =
      if (args.length > 1 && (args(1) == "--tier2" || args(1) == "--x100")) ops2
      else if (args.length > 1) args.drop(1).toSeq
      else ops
    // generate the full multi-table 10x corpus ONLY for the tiers that
    // read it (default ops, --tier2, --x100's 10x leg, --x100events's
    // 10x leg); the lineitem-only tiers build their own corpora
    val needsBig = args.length <= 1 ||
      !Set("--x100extracts", "--x100robust", "--x10bandskew",
        "--x100bandskew", "--x100hotzone", "--x1000ev", "--x1000docs",
        "--x1000cc", "--x1000li", "--x1000sim", "--x1000mm",
        "--limedian", "--simsweep", "--simcache", "--x10000ev",
        "--x10000docs", "--x10000li").contains(args(1))
    if (needsBig &&
        !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big/_READY")))
      generate(s, base, big)

    // timing INCLUDES query construction: several builders localCheckpoint
    // eagerly, and that materialization is part of the operator's cost
    def run(name: String, d: String): Double = {
      // reclaim the PREVIOUS run's shuffle/spill files before timing this
      // one: ContextCleaner frees them only when the driver-side shuffle
      // refs are GC'd, which lags whole passes on a large heap — the
      // round-15 decade-4 "warm slower than cold" inversion was the next
      // pass contending with a near-full scratch disk (round 16 re-run
      // hit ENOSPC at the same spot before this settle)
      System.gc()
      Thread.sleep(2000)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(s, d)
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).head()
      (System.nanoTime() - t0) / 1e9
    }

    // --x100: SECOND decade (1x -> 10x -> 100x documents) for the
    // vocabulary-output document operators — ops whose result cardinality
    // is token/gram-grain, so the measurement tracks the OPERATOR's
    // scaling, not output growth (pair-listing ops are excluded by
    // design: the 100x megacluster is 10,000 identical docs and a pair
    // LISTING over it is quadratic by semantics, already root-caused in
    // SCALE.md). A one-decade exponent can hide a lurking n·log n or a
    // constant floor; agreement across two decades cannot.
    if (args.length > 1 && args(1) == "--x100") {
      val big100 = if (args.length > 2) args(2) else "/tmp/graft_scale100x"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big100/_READY")))
        generateDocs(s, base, big100, 100)
      val docOps = Seq("dedup_exact", "repeated_ngrams", "tfidf_top",
        "bm25_top", "vocab_top")
      docOps.foreach { op =>
        run(op, base); val t1 = run(op, base)
        run(op, big); val t10 = run(op, big)
        run(op, big100); val t100 = run(op, big100)
        val e1 = math.log(t10 / t1) / math.log(10.0)
        val e2 = math.log(t100 / t10) / math.log(10.0)
        println(f"$op%-18s 1x=$t1%6.2f s  10x=$t10%7.2f s  100x=$t100%8.2f s" +
          f"  exp[1x->10x]=$e1%5.2f  exp[10x->100x]=$e2%5.2f")
      }
      s.stop(); return
    }
    // --x100extracts: SECOND decade for the exact-vs-sketch holistic
    // extracts on a 100× lineitem corpus (same hot-zone skew ratio as the
    // 10× tier: nation-0 rows get 4× the copy count, so ONE zone holds
    // ~14% of all pixels at every scale). The claim under test is the
    // sketch family's reason to exist: the exact forms buffer per-zone
    // value sets (cost tracks the largest zone), the sketch forms carry
    // bounded state — two decades of agreement separate a real growth law
    // from a one-decade accident.
    if (args.length > 1 && args(1) == "--x100extracts") {
      // BOTH decades use the perturbed-value corpus family (values made
      // distinct per copy), so the two exponents measure the same thing —
      // mixing the unperturbed 10x corpus in would compare compressed
      // buffers against grown ones across the decades.
      //
      // Measured frames are the PURE OPERATOR forms (Extracts.extract over
      // Tables.pixels), not the registered queries: the registered sketch
      // rows are contract-oracle queries that ALSO compute the exact
      // percentile/distinct and a rank/band check (three pixel passes) —
      // measured first and worth recording: the contract query's 100x cost
      // tracked its embedded EXACT side (81.9 s vs exact's 72.2 s), saying
      // nothing about the sketch. `mean` rides along as the linear
      // control: a codegen'd sum/count whose exponent IS the scan+shuffle
      // floor at each scale.
      val big10li = "/tmp/graft_scale10li"
      val big100 = if (args.length > 2) args(2) else "/tmp/graft_scale100li"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big10li/_READY")))
        generateLineitem(s, base, big10li, 10)
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big100/_READY")))
        generateLineitem(s, base, big100, 100)
      def runOp1(method: String, d: String): Double = {
        val t0 = System.nanoTime()
        val df = graft.ops.Extracts.extract(Tables.pixels(s, d), method)
        df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).head()
        (System.nanoTime() - t0) / 1e9
      }
      // warm + best-of-2 measured: the QuantileSummaries path is
      // JIT-sensitive (verify-skill lesson — first runs 3-4× slower;
      // re-measured this round: a cold 100× guided median runs 16.6 s,
      // steady state 4.6-4.7 s). One warm run is NOT steady state when
      // an op lands on the big corpus with little prior JIT traffic, and
      // the resulting exponent is a JIT artifact, not a growth law.
      def runOp(method: String, d: String): Double = {
        runOp1(method, d)
        math.min(runOp1(method, d), runOp1(method, d))
      }
      // `median`/`mad`/`percentile` are the REGISTERED catalog names —
      // since round 7 they run the guided engine, so their exponents here
      // are what a catalog user actually gets; the `*_buffer` rows are
      // the retired per-zone value-buffering forms, kept as the
      // super-linear "before" baseline this table originally condemned
      val exOps = Seq("mean", "median", "mad", "percentile",
        "median_buffer", "mad_buffer", "percentile_buffer",
        "percentile_sketch", "unique", "unique_sketch")
      exOps.foreach { op =>
        val t1 = runOp(op, base)
        val t10 = runOp(op, big10li)
        val t100 = runOp(op, big100)
        val e1 = math.log(t10 / t1) / math.log(10.0)
        val e2 = math.log(t100 / t10) / math.log(10.0)
        println(f"$op%-18s 1x=$t1%6.2f s  10x=$t10%7.2f s  100x=$t100%8.2f s" +
          f"  exp[1x->10x]=$e1%5.2f  exp[10x->100x]=$e2%5.2f")
      }
      s.stop(); return
    }
    // --x100robust: the two REGISTERED robust-statistics queries that were
    // rebuilt on sketch-guided exact selection (extract_winsor,
    // outlier_robust) across the same two lineitem decades — the before
    // numbers are the buffering forms' rows in the --x100extracts table
    if (args.length > 1 && args(1) == "--x100robust") {
      val big10li = "/tmp/graft_scale10li"
      val big100 = if (args.length > 2) args(2) else "/tmp/graft_scale100li"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big10li/_READY")))
        generateLineitem(s, base, big10li, 10)
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big100/_READY")))
        generateLineitem(s, base, big100, 100)
      Seq("extract_winsor", "outlier_robust").foreach { op =>
        run(op, base); val t1 = run(op, base)
        run(op, big10li); val t10 = run(op, big10li)
        run(op, big100); val t100 = run(op, big100)
        val e1 = math.log(t10 / t1) / math.log(10.0)
        val e2 = math.log(t100 / t10) / math.log(10.0)
        println(f"$op%-18s 1x=$t1%6.2f s  10x=$t10%7.2f s  100x=$t100%8.2f s" +
          f"  exp[1x->10x]=$e1%5.2f  exp[10x->100x]=$e2%5.2f")
      }
      s.stop(); return
    }
    // --x100events: SECOND decade for the event-grain operators on a 100×
    // events corpus (whale users keep the 10× tier's 4× copy ratio). The
    // 10× leg reuses the main amplified corpus — its events transform is
    // IDENTICAL to generateEvents at copies=10 (disjoint users per copy
    // except whales, second-shifted timestamps), so both decades measure
    // the same corpus family. Ops chosen for bounded-or-proportional
    // output at user/session/band grain; all run banded two-phase ranks
    // or per-user windows — the shapes whose skew behavior the whale
    // users exist to stress.
    if (args.length > 1 && args(1) == "--x100events") {
      val big100 = if (args.length > 2) args(2) else "/tmp/graft_scale100ev"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big100/_READY")))
        generateEvents(s, base, big100, 100)
      val evOps = Seq("sessionize_events", "rfm_scores", "funnel_latency",
        "retention_cohorts", "top_paths", "user_entropy")
      evOps.foreach { op =>
        run(op, base); val t1 = run(op, base)
        run(op, big); val t10 = run(op, big)
        run(op, big100); val t100 = run(op, big100)
        val e1 = math.log(t10 / t1) / math.log(10.0)
        val e2 = math.log(t100 / t10) / math.log(10.0)
        println(f"$op%-22s 1x=$t1%6.2f s  10x=$t10%7.2f s  100x=$t100%8.2f s" +
          f"  exp[1x->10x]=$e1%5.2f  exp[10x->100x]=$e2%5.2f")
      }
      s.stop(); return
    }
    // --x100cc: SECOND decade for the duplicate-GRAPH family (round-7
    // verdict #5) — the operators that consume the signature/identity
    // QUOTIENT (CC labels, degree histogram, triangle closed forms,
    // group-grain PageRank, embed CC). The ×100 documents corpus carries
    // a 10,000-doc identical-text megacluster and the ×100 embeddings
    // corpus duplicates every vector 100× — the shapes whose ALL-PAIRS
    // forms are quadratic (10⁸ pair rows in one bucket); the quotient
    // forms must hold near the scan floor instead. CC round budget is
    // enforced in-plan (connectedComponents throws past maxIter; the
    // ⌈log d⌉ chain bound is pinned by LlmOpsSpec), so a completed run
    // IS the round-count evidence. Per-scale Tables.memo keys mean each
    // leg re-derives its full pipeline (memo-cold protocol — the honest
    // operator cost).
    if (args.length > 1 && args(1) == "--x100cc") {
      val doc10 = "/tmp/graft_scale10doc"
      val doc100 = "/tmp/graft_scale100x"
      val emb100 = "/tmp/graft_scale100emb"
      for ((dd, c) <- Seq((doc10, 10), (doc100, 100)))
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dd/_READY")))
          generateDocs(s, base, dd, c)
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big/_READY")))
        generate(s, base, big)
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$emb100/_READY")))
        generateEmb(s, base, emb100, 100)
      // COLD first touch = the full quotient pipeline (the honest operator
      // cost; per-scale memo keys make it once per (op-family, scale));
      // warm = the consumer path over the memoized label/edge frames.
      // Exponents are computed on the cold rows.
      def row(op: String, d1: String, d10: String, d100: String): Unit = {
        val c1 = run(op, d1); val w1 = run(op, d1)
        val c10 = run(op, d10); val w10 = run(op, d10)
        val c100 = run(op, d100); val w100 = run(op, d100)
        val e1 = math.log(c10 / c1) / math.log(10.0)
        val e2 = math.log(c100 / c10) / math.log(10.0)
        println(f"$op%-22s cold 1x=$c1%6.2f s 10x=$c10%7.2f s 100x=$c100%8.2f s" +
          f"  exp[1x->10x]=$e1%5.2f exp[10x->100x]=$e2%5.2f" +
          f"  (warm $w1%5.2f/$w10%5.2f/$w100%5.2f s)")
      }
      Seq("dedup_clusters", "dup_graph_degree", "triangle_count",
        "dup_pagerank").foreach(row(_, base, doc10, doc100))
      row("dedup_embed_clusters", base, big, emb100)
      s.stop(); return
    }
    // --x1000cc: THIRD decade for the duplicate-graph family — 5M docs
    // with a 100,000-doc identical-text megacluster (10¹⁰ implicit pairs
    // in one bucket; the quotient forms must stay group-grain-linear).
    // Same cold/warm protocol as --x100cc, decades 10×/100×/1000×.
    if (args.length > 1 && args(1) == "--x1000cc") {
      val doc10 = "/tmp/graft_scale10doc"
      val doc100 = "/tmp/graft_scale100x"
      val doc1000 = "/tmp/graft_scale1000doc"
      for ((dd, c) <- Seq((doc10, 10), (doc100, 100), (doc1000, 1000)))
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dd/_READY")))
          generateDocs(s, base, dd, c)
      def row3(op: String): Unit = {
        val c10 = run(op, doc10); val w10 = run(op, doc10)
        val c100 = run(op, doc100); val w100 = run(op, doc100)
        val c1000 = run(op, doc1000); val w1000 = run(op, doc1000)
        val e2 = math.log(c100 / c10) / math.log(10.0)
        val e3 = math.log(c1000 / c100) / math.log(10.0)
        println(f"$op%-22s cold 10x=$c10%6.2f s 100x=$c100%7.2f s" +
          f" 1000x=$c1000%8.2f s  exp[10x->100x]=$e2%5.2f" +
          f" exp[100x->1000x]=$e3%5.2f" +
          f"  (warm $w10%5.2f/$w100%5.2f/$w1000%5.2f s)")
      }
      val ccOps = if (args.length > 2) args.drop(2).toSeq
        else Seq("dedup_clusters", "dup_graph_degree", "triangle_count",
          "dup_pagerank")
      ccOps.foreach(row3)
      s.stop(); return
    }
    // --x1000ev: THIRD decade for the overflow-prone and banded event
    // families (round-9 verdict #3) — ~100M events, whale users at the
    // same 4× copy ratio as every earlier decade. Each of the last two
    // decade pushes surfaced a real defect class (Long overflow at 100×,
    // ORDER-BY key collisions at 10×); this measures the rows whose
    // "bounded by corpus mass ≤ ~10¹⁸" overflow adjudications have only
    // been argued, one decade further. All three legs are events-only
    // corpora from the same amplifier, so the two printed exponents
    // compare like for like.
    if (args.length > 1 && args(1) == "--x1000ev") {
      val ev10 = "/tmp/graft_scale10ev"
      val ev100 = "/tmp/graft_scale100ev"
      val ev1000 = "/tmp/graft_scale1000ev"
      for ((d, c) <- Seq((ev10, 10), (ev100, 100), (ev1000, 1000)))
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/_READY")))
          generateEvents(s, base, d, c)
      val evOps = if (args.length > 2) args.drop(2).toSeq
        else Seq("gini_spend", "rfm_scores", "funnel_latency",
          "ab_test", "seasonal_anomaly", "retention_cohorts",
          "sessionize_events", "ks_drift", "ks_drift_binned")
      // substrate control: the full-corpus user-keyed shuffle + in-
      // partition sort + hash, no operator logic — the floor every
      // ordered-event window op (sessionize, rolling_activity) pays
      // before its own work starts. Run as `--x1000ev ctl`.
      if (evOps == Seq("ctl")) {
        def ctl(d: String): Double = {
          val t0 = System.nanoTime()
          val e = Tables.events(s, d)
            .select(col("user_id"), col("event_id"), col("event_type"),
              unix_micros(col("ts")).as("us"))
            .repartition(col("user_id"))
            .sortWithinPartitions(col("user_id"), col("us"), col("event_id"))
          e.select(xxhash64(e.columns.map(col): _*).as("h"))
            .agg(expr("bit_xor(h)")).head()
          (System.nanoTime() - t0) / 1e9
        }
        Seq(ev10, ev100, ev1000).foreach { d =>
          ctl(d); val t = math.min(ctl(d), ctl(d))
          println(f"shuffle_sort_ctl $d $t%8.2f s")
        }
        s.stop(); return
      }
      // cold AND warm printed like --x1000cc's row3 (exponents on the
      // cold rows) so cross-tier exponent comparisons stay like-for-like
      evOps.foreach { op =>
        val c10 = run(op, ev10); val w10 = run(op, ev10)
        val c100 = run(op, ev100); val w100 = run(op, ev100)
        val c1000 = run(op, ev1000); val w1000 = run(op, ev1000)
        val e2 = math.log(c100 / c10) / math.log(10.0)
        val e3 = math.log(c1000 / c100) / math.log(10.0)
        println(f"$op%-20s cold 10x=$c10%6.2f s 100x=$c100%7.2f s" +
          f" 1000x=$c1000%8.2f s  exp[10x->100x]=$e2%5.2f" +
          f"  exp[100x->1000x]=$e3%5.2f" +
          f"  (warm $w10%5.2f/$w100%5.2f/$w1000%5.2f s)")
      }
      s.stop(); return
    }
    // --x10000ev: FOURTH decade for the event families (round-13 verdict
    // #7) — ~10⁹ events (~20 GB parquet), the cheapest fact family by
    // disk budget. The state table already has a decade-4 row; this
    // gives the FACT side one: the banded two-phase ranks, the 128-bit
    // integer promotions, and the map-combining aggregates at a volume
    // where any residual super-linear term or overflow class would have
    // to show. Decade-3 → decade-4 exponents on cold rows, warm printed
    // alongside, same whale-skew ratio as every earlier leg.
    if (args.length > 1 && args(1) == "--x10000ev") {
      val ev1000 = "/tmp/graft_scale1000ev"
      val ev10000 = "/tmp/graft_scale10000ev"
      for ((d, c) <- Seq((ev1000, 1000), (ev10000, 10000)))
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/_READY")))
          generateEvents(s, base, d, c)
      val evOps = if (args.length > 2) args.drop(2).toSeq
        else Seq("gini_spend", "rfm_scores", "funnel_latency",
          "ab_test", "seasonal_anomaly", "ks_drift_binned")
      evOps.foreach { op =>
        val c3 = run(op, ev1000); val w3 = run(op, ev1000)
        val c4 = run(op, ev10000); val w4 = run(op, ev10000)
        val e4 = math.log(c4 / c3) / math.log(10.0)
        println(f"$op%-20s cold 1000x=$c3%8.2f s 10000x=$c4%9.2f s" +
          f"  exp[1000x->10000x]=$e4%5.2f  (warm $w3%7.2f/$w4%8.2f s)")
      }
      s.stop(); return
    }
    // --x10000docs: FOURTH decade for the documents family (round-14
    // verdict #6) — 50M documents (~7 GB parquet), the cheapest decade-4
    // tier after events. The adversarial shape scales with it: the
    // boilerplate megacluster grows to ~1M identical docs (2% of every
    // copy), so dedup_lines' line-quotient and text_quality_lm's
    // per-doc scoring meet a megacluster 100× the decade-3 one, and
    // vocab_top's token explode runs at ~10¹⁰ exploded rows. Cold
    // decade-3 → decade-4 exponents (warm alongside), local[32].
    if (args.length > 1 && args(1) == "--x10000docs") {
      val doc1000 = "/tmp/graft_scale1000doc"
      val doc10000 = "/tmp/graft_scale10000doc"
      for ((d, c) <- Seq((doc1000, 1000), (doc10000, 10000)))
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/_READY")))
          generateDocs(s, base, d, c)
      val docOps = if (args.length > 2) args.drop(2).toSeq
        else Seq("vocab_top", "dedup_lines", "text_quality_lm")
      docOps.foreach { op =>
        val c3 = run(op, doc1000); val w3 = run(op, doc1000)
        val c4 = run(op, doc10000); val w4 = run(op, doc10000)
        val e4 = math.log(c4 / c3) / math.log(10.0)
        println(f"$op%-20s cold 1000x=$c3%8.2f s 10000x=$c4%9.2f s" +
          f"  exp[1000x->10000x]=$e4%5.2f  (warm $w3%7.2f/$w4%8.2f s)")
      }
      s.stop(); return
    }
    // --x1000docs: THIRD decade for the vocabulary family (round-9
    // verdict #7) — 5M documents, the token-explode shuffle at ~10⁹
    // exploded rows. The explode-width heuristic (LlmOps.spreadWidth)
    // has only been exercised to 500k docs; decade 3 is where its 8×
    // cap would first bind.
    if (args.length > 1 && args(1) == "--x1000docs") {
      val doc10 = "/tmp/graft_scale10doc"
      val doc100 = "/tmp/graft_scale100x"
      val doc1000 = "/tmp/graft_scale1000doc"
      for ((d, c) <- Seq((doc10, 10), (doc100, 100), (doc1000, 1000)))
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/_READY")))
          generateDocs(s, base, d, c)
      val docOps = if (args.length > 2) args.drop(2).toSeq
        else Seq("vocab_top", "tfidf_top", "bm25_top", "zipf_fit",
          "pmi_bigrams", "chi2_tokens")
      // cold AND warm printed like --x1000cc's row3 (exponents on the
      // cold rows) so cross-tier exponent comparisons stay like-for-like
      docOps.foreach { op =>
        val c10 = run(op, doc10); val w10 = run(op, doc10)
        val c100 = run(op, doc100); val w100 = run(op, doc100)
        val c1000 = run(op, doc1000); val w1000 = run(op, doc1000)
        val e2 = math.log(c100 / c10) / math.log(10.0)
        val e3 = math.log(c1000 / c100) / math.log(10.0)
        println(f"$op%-20s cold 10x=$c10%6.2f s 100x=$c100%7.2f s" +
          f" 1000x=$c1000%8.2f s  exp[10x->100x]=$e2%5.2f" +
          f"  exp[100x->1000x]=$e3%5.2f" +
          f"  (warm $w10%5.2f/$w100%5.2f/$w1000%5.2f s)")
      }
      s.stop(); return
    }
    // --simsweep [dir]: nprobe sweep at the decade-3 ANN operating point
    // (k=1024, default the 10M perturbed corpus). The round-13 tier
    // measured the crossover thinner under per-vector jitter (IVF 217 s
    // vs brute 262 s end-to-end) with recall SATURATED at 1.000 — i.e.
    // probe mass to spare. This prints the recall/cost dial: brute once
    // (truth set), ONE fit+assign, then search-only wall per nprobe —
    // the marginal-cost shape a production deployment tunes, separated
    // from the amortized one-off fit.
    if (args.length > 1 && args(1) == "--simsweep") {
      import org.apache.spark.sql.expressions.Window
      val dd = if (args.length > 2) args(2) else "/tmp/graft_scale5000sim"
      require(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dd/_READY")),
        s"$dd not generated — run --x1000sim first")
      val e = Tables.embeddings(s, dd)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", LlmOps.norm(col("v")))
      val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 10000000L)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("qid"), col("cand")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      def topk(scored: org.apache.spark.sql.DataFrame) = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("cos_r").desc, col("vec_id").asc)))
        .filter(col("rn") <= 5).select(col("qid"), col("vec_id").as("cand"))
      val n = e.count()
      val k = LlmOps.ivfCells(n)
      var t0 = System.nanoTime()
      val bf = pairs(topk(q.join(e, col("vec_id") =!= col("qid"))
        .withColumn("cos_r", round(
          LlmOps.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6))))
      println(f"brute N=$n k=$k  ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      t0 = System.nanoTime()
      val (assigned0, centroids) =
        LlmOps.ivfAssign(e, k = k, fitFraction = math.min(1.0, 50.0 * k / n))
      // materialize the assignment ONCE (disk checkpoint) so per-nprobe
      // walls are search-only — the marginal cost a deployment pays
      import graft.ops.Ckpt.DiskCheckpoint
      val assigned = assigned0.diskCheckpoint()
      println(f"fit+assign (one-off)  ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      Seq(8, 16, 32, 64).foreach { np =>
        t0 = System.nanoTime()
        val got = pairs(LlmOps.ivfSearch(assigned, centroids, q, topK = 5, nprobe = np))
        val rc = got.intersect(bf).size.toDouble / bf.size
        println(f"nprobe=$np%3d  search=${(System.nanoTime() - t0) / 1e9}%7.2f s  recall@5=$rc%.3f")
      }
      s.stop(); return
    }
    // --limedian <dir> [op] [runs]: instrumented repeat-runner for the
    // extract_median decade-3 WARM anomaly (round-12 verdict #1: 92.3 s
    // warm vs 33.7 s cold at 688M rows — the only warm ≫ cold row in any
    // tier; hypotheses on record, page-cache eviction + GK-sketch GC
    // debt, were unverified). Runs the op K times in one JVM and prints,
    // per run: wall, driver GC count/time delta, task-side
    // executorRunTime / jvmGcTime / spill / shuffle bytes, and peak heap
    // — enough to tell allocation debt (jvmGcTime climbs run-over-run)
    // from host page-cache effects (wall climbs, GC flat).
    if (args.length > 1 && args(1) == "--limedian") {
      val dir = if (args.length > 2) args(2) else "/tmp/graft_scale1000li"
      val op = if (args.length > 3) args(3) else "extract_median"
      val runs = if (args.length > 4) args(4).toInt else 4
      import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
      val exRun = new java.util.concurrent.atomic.AtomicLong
      val exGc = new java.util.concurrent.atomic.AtomicLong
      val spillD = new java.util.concurrent.atomic.AtomicLong
      val shRead = new java.util.concurrent.atomic.AtomicLong
      s.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          Option(t.taskMetrics).foreach { m =>
            exRun.addAndGet(m.executorRunTime); exGc.addAndGet(m.jvmGCTime)
            spillD.addAndGet(m.diskBytesSpilled)
            shRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          }
      })
      def gcStats(): (Long, Long) = {
        import scala.jdk.CollectionConverters._
        val beans = java.lang.management.ManagementFactory
          .getGarbageCollectorMXBeans.asScala
        (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
      }
      (1 to runs).foreach { i =>
        val (gc0, gt0) = gcStats()
        Seq(exRun, exGc, spillD, shRead).foreach(_.set(0L))
        val t = run(op, dir)
        Thread.sleep(1000) // listener drain
        val (gc1, gt1) = gcStats()
        val heap = (Runtime.getRuntime.totalMemory()
          - Runtime.getRuntime.freeMemory()) >> 20
        println(f"$op run$i wall=$t%7.2f s  driverGC=${gc1 - gc0}%4d/" +
          f"${(gt1 - gt0) / 1000.0}%6.2f s  taskRun=${exRun.get / 1000.0}%8.1f s" +
          f"  taskGC=${exGc.get / 1000.0}%7.2f s  spillDisk=${spillD.get >> 20}%6d MB" +
          f"  shufRead=${shRead.get >> 20}%6d MB  heapUsed=$heap%6d MB")
      }
      s.stop(); return
    }
    // --x1000mm: THIRD decade for the multimodal family (round-12
    // verdict #3) — the javax.imageio codec path at 500k / 5M images
    // (BMP fixtures derived per doc_id; rides the same documents corpora
    // as --x1000docs, so a completed docs tier reuses its parquet).
    // Row-grain by semantics — the honest expectation is exponent → 1.0
    // as the corpus swamps the per-partition codec-session floor; what
    // decade 3 must prove is the cost stays per-ROW: no shuffle, no
    // state growth, no temp-file or codec-cache debt compounding at 5M
    // encode→decode roundtrips (the ImageIO temp-file class the r9 fix
    // closed at decade 2). Cold AND warm per leg (exponents on cold).
    if (args.length > 1 && args(1) == "--x1000mm") {
      val doc10 = "/tmp/graft_scale10doc"
      val doc100 = "/tmp/graft_scale100x"
      val doc1000 = "/tmp/graft_scale1000doc"
      for ((d, c) <- Seq((doc10, 10), (doc100, 100), (doc1000, 1000)))
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/_READY")))
          generateDocs(s, base, d, c)
      val mmOps = if (args.length > 2) args.drop(2).toSeq
        else Seq("multimodal_meta", "multimodal_decode", "multimodal_resize")
      mmOps.foreach { op =>
        val c10 = run(op, doc10); val w10 = run(op, doc10)
        val c100 = run(op, doc100); val w100 = run(op, doc100)
        val c1000 = run(op, doc1000); val w1000 = run(op, doc1000)
        val e2 = math.log(c100 / c10) / math.log(10.0)
        val e3 = math.log(c1000 / c100) / math.log(10.0)
        println(f"$op%-20s cold 10x=$c10%6.2f s 100x=$c100%7.2f s" +
          f" 1000x=$c1000%8.2f s  exp[10x->100x]=$e2%5.2f" +
          f"  exp[100x->1000x]=$e3%5.2f" +
          f"  (warm $w10%5.2f/$w100%5.2f/$w1000%5.2f s)")
      }
      s.stop(); return
    }
    // --x1000li: THIRD decade for the lineitem/extract family (round-11
    // verdict #1) — ~670M pixel rows with the hot-zone skew ratio
    // preserved (nation-0 suppliers at 4000× copies, ONE zone still holds
    // ~14% of all pixels) and per-copy value perturbation so the guided
    // quantile engines see distinct values, not compressed buffers. The
    // ops are the REGISTERED catalog rows a user gets: the guided
    // median/percentile/mad engines, the winsor/robust rebuilds, the
    // flagship merge and the msr window — with extract_mean riding along
    // as the linear scan-floor control. Decades 10×/100×/1000×; cold AND
    // warm printed like --x1000cc's row3 (exponents on the cold rows).
    if (args.length > 1 && args(1) == "--x1000li") {
      val li10 = "/tmp/graft_scale10li"
      val li100 = "/tmp/graft_scale100li"
      val li1000 = "/tmp/graft_scale1000li"
      for ((d, c) <- Seq((li10, 10), (li100, 100), (li1000, 1000)))
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/_READY")))
          generateLineitem(s, base, d, c)
      val liOps = if (args.length > 2) args.drop(2).toSeq
        else Seq("extract_mean", "extract_median", "extract_percentile",
          "extract_mad", "extract_winsor", "outlier_robust",
          "merge_wide", "msr_surface")
      liOps.foreach { op =>
        val c10 = run(op, li10); val w10 = run(op, li10)
        val c100 = run(op, li100); val w100 = run(op, li100)
        val c1000 = run(op, li1000); val w1000 = run(op, li1000)
        val e2 = math.log(c100 / c10) / math.log(10.0)
        val e3 = math.log(c1000 / c100) / math.log(10.0)
        println(f"$op%-20s cold 10x=$c10%6.2f s 100x=$c100%7.2f s" +
          f" 1000x=$c1000%8.2f s  exp[10x->100x]=$e2%5.2f" +
          f"  exp[100x->1000x]=$e3%5.2f" +
          f"  (warm $w10%5.2f/$w100%5.2f/$w1000%5.2f s)")
      }
      s.stop(); return
    }
    // --x10000li: FOURTH decade for the guided-extract family (round-15
    // verdict #6) — ~6.9B pixel rows. A materialized decade-4 lineitem
    // parquet is ~77 GB (the 1000x corpus is 7.7 GB; per-copy value
    // perturbation defeats dictionary compression) and exceeds the
    // host's scratch budget, so this tier READ-AMPLIFIES the decade-3
    // corpus in-plan: an inline explode of a `copies`-element sequence
    // per scanned row, with per-copy value perturbation on a FINER grid
    // (+copy·1e-7) than the materialized amplifiers' 1e-4 step so no
    // in-plan copy collides with a materialized one — distinct values
    // keep the guided (zone, value) count state honest (the round-6
    // holistic-amplification rule). What this measures: the guided
    // engines' GK-bracket + windowed-count passes at 6.9B rows —
    // everything downstream of the scan. What it under-counts: scan IO
    // (7.7 GB read stands in for 77 GB of logical rows) — the same
    // documented trade as the fixed-|Q| sim tiers. The explode child is
    // an inline complex generator, so InferFiltersFromGenerate cannot
    // push the sequence into the scan (the round-5 trap).
    if (args.length > 1 && args(1) == "--x10000li") {
      val li1000 = "/tmp/graft_scale1000li"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$li1000/_READY")))
        generateLineitem(s, base, li1000, 1000)
      def pixels4(copies: Int) = {
        val p = Tables.pixels(s, li1000)
        if (copies <= 1) p
        else p
          .withColumn("__c", explode(sequence(lit(1), lit(copies))))
          .withColumn("value", col("value") + col("__c") * lit(1e-7))
          .drop("__c")
      }
      def runOp4(method: String, copies: Int): Double = {
        System.gc(); Thread.sleep(2000)
        val t0 = System.nanoTime()
        val df = graft.ops.Extracts.extract(pixels4(copies), method)
        df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).head()
        (System.nanoTime() - t0) / 1e9
      }
      val liOps = if (args.length > 2) args.drop(2).toSeq
        else Seq("mean", "median", "percentile", "mad")
      liOps.foreach { op =>
        val c3 = runOp4(op, 1); val w3 = runOp4(op, 1)
        val c4 = runOp4(op, 10); val w4 = runOp4(op, 10)
        val e4 = math.log(c4 / c3) / math.log(10.0)
        println(f"extract_$op%-12s cold 1000x=$c3%8.2f s 10000x=$c4%9.2f s" +
          f"  exp[1000x->10000x]=$e4%5.2f  (warm $w3%7.2f/$w4%8.2f s)")
      }
      s.stop(); return
    }
    // --x10hotzone: the round-7 zonedNtile rewires under their motivating
    // adversarial shape — hist_equidepth on the hot-zone lineitem corpus
    // (nation-0 suppliers at 4× copies: ONE zone holds ~14% of all
    // pixels) and quality_tiles on the 10× documents corpus (|langs| is
    // fixed, so every language partition grows 10× — the "giant
    // language" case). Before the rewire both rows ran ntile over one
    // window partition per zone/lang, so a hot partition serialized into
    // one task; the equi-depth banded rank must hold the exponent at the
    // scan floor instead.
    if (args.length > 1 && args(1) == "--x10hotzone") {
      val big10li = "/tmp/graft_scale10li"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big10li/_READY")))
        generateLineitem(s, base, big10li, 10)
      Seq(("hist_equidepth", big10li), ("quality_tiles", big)).foreach {
        case (op, dir) =>
          run(op, base); val t1 = run(op, base)
          run(op, dir); val t10 = run(op, dir)
          val e = math.log(t10 / t1) / math.log(10.0)
          println(f"$op%-18s 1x=$t1%6.2f s  10x=$t10%7.2f s  exponent=$e%5.2f")
      }
      s.stop(); return
    }
    // --x100sim: SECOND decade for the ANN family at FIXED |Q| (the
    // registered rows' query set is a corpus fraction, so their cost is
    // workload growth by definition; holding Q at the copy-0 set
    // isolates the operator). Two contrasting rows: brute-force cosine
    // top-k (declared O(|Q|·N) — the honest linear baseline, exponent
    // expected → 1.0) and the KMeans-IVF path (cell-probe candidate
    // cutting — must grow strictly slower than brute force; its fit is
    // sampled + iteration-capped so the decade-2 exponent stays < 1).
    if (args.length > 1 && args(1) == "--x100sim") {
      val emb100 = "/tmp/graft_scale100emb"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$emb100/_READY")))
        generateEmb(s, base, emb100, 100)
      def embQ(d: String) = {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v"))
          .withColumn("nrm", LlmOps.norm(col("v")))
        val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 10000000L)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
        (e, q)
      }
      def brute(d: String): Double = {
        val t0 = System.nanoTime()
        val (e, q) = embQ(d)
        import org.apache.spark.sql.expressions.Window
        val r = q.join(e, col("vec_id") =!= col("qid"))
          .withColumn("cos_r",
            round(LlmOps.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("cos_r").desc, col("vec_id").asc)))
          .filter(col("rn") <= 5)
        r.select(xxhash64(r.columns.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).head()
        (System.nanoTime() - t0) / 1e9
      }
      def ivf(d: String): Double = {
        val t0 = System.nanoTime()
        val (e, q) = embQ(d)
        val (assigned, centroids) = LlmOps.ivfAssign(e)
        val r = LlmOps.ivfSearch(assigned, centroids, q, topK = 5, nprobe = 4)
        r.select(xxhash64(r.columns.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).head()
        (System.nanoTime() - t0) / 1e9
      }
      Seq(("sim_brute_fixedQ", brute _), ("sim_ivf_fixedQ", ivf _))
        .foreach { case (nm, f) =>
          f(base); val t1 = f(base)
          f(big); val t10 = f(big)
          f(emb100); val t100 = f(emb100)
          val e1 = math.log(t10 / t1) / math.log(10.0)
          val e2 = math.log(t100 / t10) / math.log(10.0)
          println(f"$nm%-18s 1x=$t1%6.2f s  10x=$t10%7.2f s  100x=$t100%8.2f s" +
            f"  exp[1x->10x]=$e1%5.2f  exp[10x->100x]=$e2%5.2f")
        }
      s.stop(); return
    }
    // --simcache [dir]: the content-addressed IVF index cache at the
    // decade-3 operating point (round-13 verdict #1). --simsweep showed
    // the 10M end-to-end splits ~104 s one-off fit+assign vs 7-16 s
    // marginal search; this measures the DEPLOYMENT shape: a COLD
    // invocation (cache wiped) pays fit+assign+persist once, a fresh HIT
    // invocation probes the content fingerprint and pays search-only —
    // and must return the identical result set.
    if (args.length > 1 && args(1) == "--simcache") {
      val dd = if (args.length > 2) args(2) else "/tmp/graft_scale5000sim"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dd/_READY")))
        generateEmbPerturbed(s, base, dd, 5000)
      val e = Tables.embeddings(s, dd)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", LlmOps.norm(col("v")))
      val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 10000000L)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      val n = e.count()
      val k = LlmOps.ivfCells(n)
      val np = LlmOps.ivfProbes(k)
      val ff = math.min(1.0, 50.0 * k / n)
      val root = java.nio.file.Paths.get(graft.ops.IvfIndex.cacheRoot(dd, "embeddings"))
      if (java.nio.file.Files.exists(root))
        java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.delete(f))
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("qid"), col("cand")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      var t0 = System.nanoTime()
      val (a1, c1) = graft.ops.IvfIndex.cachedAssign(e, dd, k = k, fitFraction = ff)
      println(f"cold fill (fit+assign+persist) N=$n k=$k  ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      t0 = System.nanoTime()
      val missSide = pairs(LlmOps.ivfSearch(a1, c1, q, topK = 5, nprobe = np))
      println(f"search after fill (nprobe=$np)          ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      t0 = System.nanoTime()
      val (a2, c2) = graft.ops.IvfIndex.cachedAssign(e, dd, k = k, fitFraction = ff)
      val tProbe = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val hitSide = pairs(LlmOps.ivfSearch(a2, c2, q, topK = 5, nprobe = np))
      println(f"HIT invocation: probe=$tProbe%7.2f s  search=${(System.nanoTime() - t0) / 1e9}%7.2f s")
      require(hitSide == missSide,
        "cached-index search returned a different result set than the fill-side search")
      s.stop(); return
    }
    // --x1000sim: THIRD decade for ANN at fixed |Q| (round-11 verdict
    // #5) — 100k / 1M / 10M PERTURBED vectors (near-dup clouds, not
    // identical clones; see generateEmbPerturbed). The thing under test
    // is the cell budget finally growing with √N: k = LlmOps.ivfCells(N)
    // (√N/2 clamped [8, 1024] → 158 / 500 / 1024 across the decades) with
    // nprobe = LlmOps.ivfProbes(k), assignment running the native
    // codegen'd NearestCentroid pass — the plan shape that replaces the
    // k=8 fixture constant at corpus scale. Rows: brute-force cosine
    // top-5 (linear baseline AND the recall truth set), KMeans-IVF at
    // the heuristic operating point, walsh-IVF with ⌈log₂ k⌉ sign bits.
    // recall@5 vs brute prints per scale; the KMeans row REQUIREs
    // recall ≥ 0.8 at every scale (round-12 verdict #5 raised the floor
    // from 0.6 after the small-N leg measured 0.69 at 4 probes — the
    // k<256 probe ramp in LlmOps.ivfProbes is what buys the margin).
    if (args.length > 1 && args(1) == "--x1000sim") {
      import org.apache.spark.sql.expressions.Window
      val tiers = Seq(("/tmp/graft_scale50sim", 50),
        ("/tmp/graft_scale500sim", 500), ("/tmp/graft_scale5000sim", 5000))
      tiers.foreach { case (dd, c) =>
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dd/_READY")))
          generateEmbPerturbed(s, base, dd, c)
      }
      def embQ(d: String) = {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v"))
          .withColumn("nrm", LlmOps.norm(col("v")))
        val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 10000000L)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
        (e, q)
      }
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("qid"), col("cand")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      def topk(scored: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        scored
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("cos_r").desc, col("vec_id").asc)))
          .filter(col("rn") <= 5)
          .select(col("qid"), col("vec_id").as("cand"))
      def timed(f: => Set[(Long, Long)]): (Double, Set[(Long, Long)]) = {
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      tiers.foreach { case (dd, copies) =>
        val n = copies.toLong * 2000
        val k = LlmOps.ivfCells(n)
        val nprobe = LlmOps.ivfProbes(k)
        val bits = math.min(10, math.max(3,
          math.ceil(math.log(k.toDouble) / math.log(2.0)).toInt))
        val (tB, bf) = timed {
          val (e, q) = embQ(dd)
          pairs(topk(q.join(e, col("vec_id") =!= col("qid"))
            .withColumn("cos_r", round(
              LlmOps.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6))))
        }
        val (tK, kvf) = timed {
          val (e, q) = embQ(dd)
          val (assigned, centroids) =
            LlmOps.ivfAssign(e, k = k,
              fitFraction = math.min(1.0, 50.0 * k / n))
          pairs(LlmOps.ivfSearch(assigned, centroids, q,
            topK = 5, nprobe = nprobe))
        }
        val (tW, wvf) = timed {
          val (e, q) = embQ(dd)
          val assigned = e.withColumn("cell",
            graft.functions.native.walsh_sign_bits(col("v"), bits))
          val cent = assigned
            .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
            .groupBy(col("cell"), col("i")).agg(avg(col("x")).as("m"))
            .groupBy(col("cell"))
            .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("sm"))
            .select(col("cell"), expr("transform(sm, s -> s.m)").as("cvec"))
          pairs(LlmOps.ivfSearch(assigned, cent, q,
            topK = 5, nprobe = LlmOps.ivfProbes(1 << bits)))
        }
        val rK = kvf.intersect(bf).size.toDouble / bf.size
        val rW = wvf.intersect(bf).size.toDouble / bf.size
        println(f"N=$n%8d k=$k%4d nprobe=$nprobe%3d bits=$bits%2d  " +
          f"brute=$tB%7.2f s  kmeans_ivf=$tK%7.2f s (recall@5=$rK%.3f)  " +
          f"walsh_ivf=$tW%7.2f s (recall@5=$rW%.3f)")
        require(rK >= 0.8,
          f"kmeans IVF recall@5=$rK%.3f fell below the 0.8 floor at N=$n " +
            "— adjust ivfCells/ivfProbes")
      }
      s.stop(); return
    }
    // --x100mm: SECOND decade for the multimodal family — the per-row
    // javax.imageio codec path (partition-amortized mapPartitions, the
    // repo's one sanctioned non-Catalyst site). Row-grain by semantics,
    // so the honest expectation is exponent → 1.0 as the corpus swamps
    // the fixed session floor; what the tier must prove is that the cost
    // stays per-ROW (no shuffle, no state growth — the plan is
    // scan → mapPartitions → project at every scale), i.e. the decade-2
    // exponent must not EXCEED ~1.0.
    if (args.length > 1 && args(1) == "--x100mm") {
      val big100 = "/tmp/graft_scale100x"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big100/_READY")))
        generateDocs(s, base, big100, 100)
      Seq("multimodal_meta", "multimodal_decode", "multimodal_resize")
        .foreach { op =>
          run(op, base); val t1 = run(op, base)
          run(op, big); val t10 = run(op, big)
          run(op, big100); val t100 = run(op, big100)
          val e1 = math.log(t10 / t1) / math.log(10.0)
          val e2 = math.log(t100 / t10) / math.log(10.0)
          println(f"$op%-18s 1x=$t1%6.2f s  10x=$t10%7.2f s  100x=$t100%8.2f s" +
            f"  exp[1x->10x]=$e1%5.2f  exp[10x->100x]=$e2%5.2f")
        }
      s.stop(); return
    }
    // --x100hotzone: SECOND decade for the equi-depth histogram tile
    // builder (guidedTileBounds) on the hot-zone lineitem corpora — the
    // one tile query whose decade-2 behavior wasn't already covered by
    // --x100bandskew (quality_tiles rode the documents decades there).
    // At 100× the nation-0 hot zone holds ~10^8 pixels; the builder's
    // state is ≤ accuracy·(k+3)/2 distinct values per zone regardless,
    // so the exponent must stay at the scan floor across BOTH decades.
    if (args.length > 1 && args(1) == "--x100hotzone") {
      val big10li = "/tmp/graft_scale10li"
      val big100li = "/tmp/graft_scale100li"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big10li/_READY")))
        generateLineitem(s, base, big10li, 10)
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big100li/_READY")))
        generateLineitem(s, base, big100li, 100)
      Seq("hist_equidepth").foreach { op =>
        run(op, base); val t1 = run(op, base)
        run(op, big10li); val t10 = run(op, big10li)
        run(op, big100li); val t100 = run(op, big100li)
        val e1 = math.log(t10 / t1) / math.log(10.0)
        val e2 = math.log(t100 / t10) / math.log(10.0)
        println(f"$op%-18s 1x=$t1%6.2f s  10x=$t10%7.2f s  100x=$t100%8.2f s" +
          f"  exp[1x->10x]=$e1%5.2f  exp[10x->100x]=$e2%5.2f")
      }
      s.stop(); return
    }
    // --x10bandskew: the round-7 equi-depth bandedRank edges under the
    // adversarial spend distribution SCALE.md's old fixed-width bands
    // admitted degrading on — 90% of users' event values ×0.001, so
    // under the retired $10k content bands ~90% of the population landed
    // in ONE band (the near-naive-sort case). Both decades carry the
    // same squash and the same 4× whale ratio, so the exponent isolates
    // the banded rank's own growth; oracle parity is untouched because
    // banding never moves a rank.
    if (args.length > 1 && args(1) == "--x10bandskew") {
      val sk1 = "/tmp/graft_skew1ev"
      val sk10 = "/tmp/graft_skew10ev"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$sk1/_READY")))
        generateEventsSkewed(s, base, sk1, 1)
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$sk10/_READY")))
        generateEventsSkewed(s, base, sk10, 10)
      Seq("gini_spend", "rfm_scores", "funnel_latency").foreach { op =>
        run(op, sk1); val t1 = run(op, sk1)
        run(op, sk10); val t10 = run(op, sk10)
        val e = math.log(t10 / t1) / math.log(10.0)
        println(f"$op%-18s skew1x=$t1%6.2f s  skew10x=$t10%7.2f s  exponent=$e%5.2f")
      }
      s.stop(); return
    }
    // --x100bandskew: SECOND decade for the banded-rank family (round-8
    // verdict #1 — the adaptive rows-per-band budget replacing the
    // hard-coded 64/32 band counts). Event-grain ranked ops run on the
    // spend-skew corpus at ×1/×10/×100 (same 90%-one-content-band squash
    // and 4× whale ratio at every scale); the doc-grain banded ops
    // (shard_balance token bands, quality_tiles per-language ntile) run
    // across the documents decades. At ×100 the user population crosses
    // the 64k rows-per-band target, so the measurement exercises the
    // ADAPTIVE k = ⌈n/target⌉ path, not just a wider constant.
    if (args.length > 1 && args(1) == "--x100bandskew") {
      val sk1 = "/tmp/graft_skew1ev"
      val sk10 = "/tmp/graft_skew10ev"
      val sk100 = "/tmp/graft_skew100ev"
      val doc10 = "/tmp/graft_scale10doc"
      val doc100 = "/tmp/graft_scale100x"
      for ((d, c) <- Seq((sk1, 1), (sk10, 10), (sk100, 100)))
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/_READY")))
          generateEventsSkewed(s, base, d, c)
      for ((d, c) <- Seq((doc10, 10), (doc100, 100)))
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/_READY")))
          generateDocs(s, base, d, c)
      def row(op: String, d1: String, d10: String, d100: String): Unit = {
        run(op, d1); val t1 = run(op, d1)
        run(op, d10); val t10 = run(op, d10)
        run(op, d100); val t100 = run(op, d100)
        val e1 = math.log(t10 / t1) / math.log(10.0)
        val e2 = math.log(t100 / t10) / math.log(10.0)
        println(f"$op%-18s 1x=$t1%6.2f s  10x=$t10%7.2f s  100x=$t100%8.2f s" +
          f"  exp[1x->10x]=$e1%5.2f  exp[10x->100x]=$e2%5.2f")
      }
      Seq("gini_spend", "rfm_scores", "funnel_latency")
        .foreach(row(_, sk1, sk10, sk100))
      Seq("shard_balance", "quality_tiles")
        .foreach(row(_, base, doc10, doc100))
      s.stop(); return
    }
    val rows = chosen.map { op =>
      run(op, base); val tSmall = run(op, base)
      run(op, big); val tBig = run(op, big)
      val exp = math.log(tBig / tSmall) / math.log(10.0)
      println(f"$op%-24s sf0.1=$tSmall%7.2f s  10x=$tBig%8.2f s  exponent=$exp%5.2f")
      (op, tSmall, tBig, exp)
    }
    // fixed-|Q| ANN variant: the registered row's query set is a corpus
    // FRACTION (vec_id % 50), so its cost model is |Q|·probed ≈ N²/500 —
    // workload growth, not operator growth. Holding |Q| at the sf0.1
    // query set (copy-0 ids only) isolates the operator's own scaling.
    if (chosen.contains("sim_topk_ivf_kmeans")) {
      def ivfFixedQ(d: String): Double = {
        val t0 = System.nanoTime()
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v"))
          .withColumn("nrm", LlmOps.norm(col("v")))
        val (assigned, centroids) = LlmOps.ivfAssign(e)
        val q = e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 10000000L)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
        val r = LlmOps.ivfSearch(assigned, centroids, q, topK = 5, nprobe = 4)
        r.select(xxhash64(r.columns.map(col): _*).as("h"))
          .agg(expr("bit_xor(h)")).head()
        (System.nanoTime() - t0) / 1e9
      }
      ivfFixedQ(base); val tS = ivfFixedQ(base)
      ivfFixedQ(big); val tB = ivfFixedQ(big)
      val exp = math.log(tB / tS) / math.log(10.0)
      println(f"sim_topk_ivf_fixedQ      sf0.1=$tS%7.2f s  10x=$tB%8.2f s  exponent=$exp%5.2f")
    }
    println("rows=" + rows.size)
    s.stop()
  }

  /** Rotated-copy documents amplification: copies are disjoint in shingle
    * space modulo the 26-letter rotation cycle, and 2% of every copy is
    * the literal boilerplate megacluster (10,000 identical docs at 100×). */
  def writeDocs(s: SparkSession, base: String, out: String, copies: Int): Unit = {
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rot(i: Int) = { val k = (i * 3) % 26; alpha.drop(k) + alpha.take(k) }
    val boiler = ("the quarterly portfolio navigation footer repeats across " +
      "every published revision of this document set ") * 5
    // repartition the SMALL base BEFORE the explode (the decade-4 events
    // lesson, amplifyEvents above): a post-explode repartition
    // materializes the whole amplified corpus as shuffle files — at the
    // 10⁴× docs tier that is ~75 GB of transient shuffle for a ~7 GB
    // output. Shuffling the ~5k-row base costs ~2 MB; each task explodes
    // and writes its slice directly. Part cap 2048 (the events cap
    // rationale at decade 4) leaves every earlier tier's layout unchanged
    // (1000× = 1600 parts < cap).
    val parts = (16 * (copies / 10).max(1)).min(2048)
    val docs = s.read.parquet(s"$base/documents.parquet").repartition(parts)
    // rotation depends only on copy % 26 (rot(0) is the identity, matching
    // copy 0's raw text), so the CASE chain is 26 branches regardless of
    // the copy count — a branch per copy blew past Catalyst's comfortable
    // expression size at the 1000× tier while producing identical text
    val rotText = (1 until 26).foldLeft(
      when(col("__copy") % 26 === 0, col("text"))) { (acc, i) =>
      acc.when(col("__copy") % 26 === i, translate(col("text"), alpha, rot(i)))
    }
    docs.select(col("*"),
        explode(sequence(lit(0), lit(copies - 1))).as("__copy"))
      .select(
        (col("doc_id") + col("__copy") * lit(10000000L)).as("doc_id"),
        when(col("doc_id") % 50 === 7, lit(boiler)).otherwise(rotText).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  private val AllTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** 1× copies of every base table except the one(s) being amplified —
    * the amplified-corpus scaffolding shared by every single-table tier. */
  private def copyOthers(base: String, out: String,
      except: Set[String]): java.nio.file.Path = {
    val P = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(P)
    for (t <- AllTables if !except(t)) {
      val src = java.nio.file.Paths.get(s"$base/$t.parquet")
      if (java.nio.file.Files.isRegularFile(src))
        java.nio.file.Files.copy(src, P.resolve(s"$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    P
  }

  /** Events amplification: disjoint users per copy EXCEPT whales
    * (`user_id % 997`), who keep their id in every copy and get
    * `whaleCopies` total copies — the event-skew injection shared by the
    * 10× corpus (10/40) and the --x100events corpus (100/400; same 4×
    * skew ratio, so the decades compare like for like). */
  private def amplifyEvents(s: SparkSession, base: String, out: String,
      copies: Int, whaleCopies: Int, parts: Int): Unit = {
    val whale = col("user_id") % 997 === 0
    // repartition the SMALL base BEFORE the explode: a post-explode
    // repartition materializes the whole amplified corpus as shuffle
    // files (measured: the 10⁴× leg wrote ~50 GB of shuffle and filled
    // the disk before the 20 GB output started). Shuffling ~100k base
    // rows costs ~2 MB and each of the `parts` tasks explodes and
    // writes its own slice directly — same rows, no corpus-sized
    // intermediate. Round-robin spread keeps whale rows (×4 fan-out)
    // evenly distributed across tasks.
    val ev = s.read.parquet(s"$base/events.parquet").repartition(parts)
    ev.select(col("*"),
        explode(sequence(lit(0),
          when(whale, lit(whaleCopies - 1)).otherwise(lit(copies - 1))))
          .as("__copy"))
      .select(
        (col("event_id") + col("__copy") * lit(100000000L)).as("event_id"),
        (col("ts") + expr("make_interval(0,0,0,0,0,0, __copy)")).as("ts"),
        when(whale, col("user_id"))
          .otherwise(col("user_id") + col("__copy") * lit(10000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  /** Lineitem amplification: ×copies everywhere, ×hotCopies for nation-0
    * suppliers (the hot zone). `perturb` adds +copy·1e-4 to the value so
    * exact percentile's (value → count) buffers cannot compress duplicate
    * copies — ON for the extract-decade corpora (the buffer growth is the
    * thing under test), OFF for the main 10× corpus (its recorded drive
    * hashes and exponents predate the perturbation and must stay stable). */
  private def amplifyLineitem(s: SparkSession, base: String, out: String,
      copies: Int, hotCopies: Int, parts: Int, perturb: Boolean): Unit = {
    val hotSupp = s.read.parquet(s"$base/supplier.parquet")
      .filter(col("s_nationkey") === 0)
      .select("s_suppkey").collect().map(_.getLong(0))
    // pre-explode repartition (the decade-4 events lesson, amplifyEvents):
    // a post-explode repartition materialized the whole amplified corpus
    // as shuffle files — ~58 GB of transient disk for the 15 GB 1000×
    // output, nearly the whole free budget on this host. Shuffling the
    // ~690k-row base costs ~60 MB; each task explodes and writes its own
    // slice. Hashes are unaffected (all consumers compare order-free);
    // round-robin spread keeps hot-supplier rows (×4 fan-out) even.
    val li = s.read.parquet(s"$base/lineitem.parquet").repartition(parts)
    val hot = col("l_suppkey").isin(hotSupp.toSeq: _*)
    val price =
      if (perturb) (col("l_extendedprice") + col("__copy") * lit(1e-4))
        .as("l_extendedprice")
      else col("l_extendedprice")
    li.select(col("*"),
        explode(sequence(lit(0),
          when(hot, lit(hotCopies - 1)).otherwise(lit(copies - 1))))
          .as("__copy"))
      .select(
        (col("l_orderkey") + col("__copy") * lit(100000000L)).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), price, col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
  }

  /** Documents-only amplified corpus for the --x100 tier: documents at
    * `copies`×, every other table a 1× copy from base (the doc ops read
    * only `documents`; the copies keep incidental table reads working). */
  def generateDocs(s: SparkSession, base: String, out: String, copies: Int): Unit = {
    println(s"generating ${copies}x documents corpus at $out ...")
    val P = copyOthers(base, out, Set("documents"))
    writeDocs(s, base, out, copies)
    java.nio.file.Files.writeString(P.resolve("_READY"), "ok")
    println(s"  documents: " +
      s.read.parquet(s"$out/documents.parquet").count() + " rows")
  }

  /** Lineitem-only amplified corpus for the --x100extracts/--x100robust
    * tiers: lineitem at `copies`× with the 10× corpus's hot-zone skew
    * ratio and per-copy value perturbation, every other table 1×. */
  def generateLineitem(s: SparkSession, base: String, out: String,
      copies: Int): Unit = {
    println(s"generating ${copies}x lineitem corpus at $out ...")
    val P = copyOthers(base, out, Set("lineitem"))
    amplifyLineitem(s, base, out, copies, copies * 4,
      (copies * 12 / 10).max(16), perturb = true)
    java.nio.file.Files.writeString(P.resolve("_READY"), "ok")
    println(s"  lineitem: " +
      s.read.parquet(s"$out/lineitem.parquet").count() + " rows")
  }

  /** Spend-skew events corpus for the --x10bandskew tier: 90% of users'
    * values ×0.001 (user_id % 10 != 0) BEFORE amplification, so under
    * the retired fixed $10k content bands ~90% of per-user spend totals
    * landed in band 0; both decades (copies = 1 and 10) carry the same
    * squash and the same 4× whale ratio. */
  def generateEventsSkewed(s: SparkSession, base: String, out: String,
      copies: Int): Unit = {
    println(s"generating ${copies}x spend-skew events corpus at $out ...")
    val P = copyOthers(base, out, Set("events"))
    val tmp = s"$out/__squashbase"
    s.read.parquet(s"$base/events.parquet")
      .withColumn("value",
        when(col("user_id") % 10 =!= 0, col("value") * 0.001)
          .otherwise(col("value")))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    amplifyEvents(s, tmp, out, copies, copies * 4, (copies * 16 / 10).max(16))
    // drop the full-size squashed base copy — only the amplified output
    // belongs in the corpus dir
    import scala.jdk.CollectionConverters._
    val tmpP = java.nio.file.Paths.get(tmp)
    java.nio.file.Files.walk(tmpP).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
    java.nio.file.Files.writeString(P.resolve("_READY"), "ok")
    println(s"  events: " +
      s.read.parquet(s"$out/events.parquet").count() + " rows")
  }

  /** Events-only amplified corpus for the --x100events tier: events at
    * `copies`× with the 10× corpus's whale-skew ratio, every other table
    * 1×. */
  def generateEvents(s: SparkSession, base: String, out: String,
      copies: Int): Unit = {
    println(s"generating ${copies}x events corpus at $out ...")
    val P = copyOthers(base, out, Set("events"))
    // parts cap: the heuristic is rows-tracking, but 16k part files at
    // 10^4x is pure file-count overhead on a single host — 4096 keeps
    // ~5 MB parts at decade 4 and leaves every earlier tier unchanged
    amplifyEvents(s, base, out, copies, copies * 4,
      (copies * 16 / 10).max(16).min(4096))
    java.nio.file.Files.writeString(P.resolve("_READY"), "ok")
    println(s"  events: " +
      s.read.parquet(s"$out/events.parquet").count() + " rows")
  }

  /** Embeddings-only PERTURBED corpus for the --x1000sim tier: embeddings
    * at `copies`× with ids shifted and every copied component nudged by a
    * deterministic per-(copy, dim) jitter in (−0.1, 0.1). Identical
    * duplicates (the --x100cc shape) are degenerate for ANN — every
    * query's true top-k would be its exact clones in its own cell, so
    * recall measures nothing; the jitter turns each base vector into a
    * near-dup CLOUD whose members straddle cell boundaries, which is
    * exactly what the nprobe dial exists for. Copy 0 is unperturbed, so
    * the fixed-|Q| query set (`vec_id < 10M, % 50 == 0`) is scale-stable.
    * The jitter mixes vec_id, not just (copy, dim): with (copy, dim)
    * only, every copy is ONE rigid translation of the whole base set —
    * all vectors in a copy share the same offset, a perfectly-correlated
    * (and therefore gentler) ANN workload. Per-vector mixing makes each
    * cloud member independently displaced, the adversarial shape. */
  def generateEmbPerturbed(s: SparkSession, base: String, out: String,
      copies: Int): Unit = {
    println(s"generating ${copies}x perturbed embeddings corpus at $out ...")
    val P = copyOthers(base, out, Set("embeddings"))
    s.read.parquet(s"$base/embeddings.parquet")
      .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("__copy"))
      .select((col("vec_id") + col("__copy") * lit(10000000L)).as("vec_id"),
        expr("""transform(embedding, (x, i) ->
          CAST(x + (CASE WHEN __copy = 0 THEN 0.0
                    ELSE (pmod(vec_id * 7919 + __copy * 131 + i * 17, 199) - 99) * 1.0e-3 END)
               AS FLOAT))""").as("embedding"),
        col("label"))
      .repartition((copies * 8 / 10).max(8))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    java.nio.file.Files.writeString(P.resolve("_READY"), "ok")
    println(s"  embeddings: " +
      s.read.parquet(s"$out/embeddings.parquet").count() + " rows")
  }

  /** Embeddings-only amplified corpus for the --x100cc tier: embeddings at
    * `copies`× with ids shifted and vectors IDENTICAL (each base vector
    * becomes an identity group of `copies` members — the degenerate worst
    * case for any pair-grain form and the exact shape the identity
    * quotient collapses), every other table 1×. */
  def generateEmb(s: SparkSession, base: String, out: String,
      copies: Int): Unit = {
    println(s"generating ${copies}x embeddings corpus at $out ...")
    val P = copyOthers(base, out, Set("embeddings"))
    s.read.parquet(s"$base/embeddings.parquet")
      .select(col("*"), explode(sequence(lit(0), lit(copies - 1))).as("__copy"))
      .select((col("vec_id") + col("__copy") * lit(10000000L)).as("vec_id"),
        col("embedding"), col("label"))
      .repartition((copies * 8 / 10).max(8))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    java.nio.file.Files.writeString(P.resolve("_READY"), "ok")
    println(s"  embeddings: " +
      s.read.parquet(s"$out/embeddings.parquet").count() + " rows")
  }

  /** Deterministic 10× amplification with injected skew (no RNG: copy
    * indices and id arithmetic only, so the corpus is reproducible). */
  def generate(s: SparkSession, base: String, big: String): Unit = {
    println(s"generating 10x corpus at $big ...")
    val P = java.nio.file.Paths.get(big)
    java.nio.file.Files.createDirectories(P)
    // untouched dimensions: byte-for-byte copies
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders")) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$base/$t.parquet"), P.resolve(s"$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    writeDocs(s, base, big, COPIES)
    // events: disjoint users per copy except whales (kept + 30 extra
    // copies); lineitem: ×10 everywhere, ×40 for nation-0 suppliers (hot
    // zone) — UNPERTURBED values (recorded drive hashes depend on them)
    amplifyEvents(s, base, big, COPIES, COPIES + EXTRA, 16)
    amplifyLineitem(s, base, big, COPIES, COPIES + EXTRA, 32,
      perturb = false)

    // embeddings: ×10, ids shifted (vectors identical — distance work is
    // what's being measured, and identical points are the degenerate
    // worst case for the quantizer, not a shortcut)
    s.read.parquet(s"$base/embeddings.parquet")
      .select(col("*"), explode(sequence(lit(0), lit(COPIES - 1))).as("__copy"))
      .select((col("vec_id") + col("__copy") * lit(10000000L)).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")

    java.nio.file.Files.writeString(P.resolve("_READY"), "ok")
    for (t <- Seq("documents", "events", "lineitem", "embeddings"))
      println(s"  $t: " + s.read.parquet(s"$big/$t.parquet").count() + " rows")
  }
}
