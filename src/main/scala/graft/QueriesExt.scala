package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import graft.ops.Ckpt._
import graft.streaming.Streamy

/** [EXT] operator queries (SURVEY.md §2.10-§2.11): streaming windows over
  * `events`, dedup / similarity / text analysis over `documents` and
  * `embeddings`. Oracle parity notes: DuckDB lists are 1-based, Spark arrays
  * 0-based; md5-hex-string ordering is used for portable MinHash; cosine
  * values are rounded to 6 decimals before any ranking/thresholding so both
  * engines make identical decisions.
  */
object QueriesExt {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  /** The shared (doc_id, token) explode used by every word-token operator
    * (vocab build, TF-IDF, entropy, inverted index) — ONE tokenization
    * definition mirrored by `string_split($normSql, ' ')` on the oracle
    * side, so a delimiter or spread change can never desynchronize them. */
  private def tokens(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
    base.repartition(LlmOps.spreadWidth(base))
      .select(col("doc_id"),
        explode(split(LlmOps.normText(col("text")), " ")).as("token"))
  }
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", LlmOps.norm(col("v"))) // once per vector, not per pair
  private val embSql =
    "SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"

  /** Fixed side-dump path for the IVF centroid table: the ONE artifact of
    * the KMeans fit a DuckDB oracle can't recompute. `sim_topk_ivf_list`
    * overwrites it on every execution; the oracle parquet_scans it and
    * recomputes assignment/probe/rank from source embeddings. The path is
    * a compile-time constant because oracle SQL is static text. */
  private[graft] val ivfCentroidDump = "/tmp/graft_aux/ivf_centroids"

  /** Nearest-centroid confusion matrix (X78), shared by the matrix listing
    * (`centroid_confusion`) and the derived per-label P/R/F1
    * (`classifier_metrics`). Train/test split by vec_id parity; integer
    * micro-unit coordinates (+10⁶ shift keeps `div` in the positive
    * domain); centroids broadcast (labels×dims rows); the distance join
    * fans test rows ×|labels| and partial-aggregates straight back — no
    * test×train pairwise frame at any scale. */
  private def confusionDf(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("v")).as(Seq("dim", "x")))
      .withColumn("xq",
        (floor(col("x") * 1000000 + lit(0.5)) + 1000000L).cast("long"))
    val cent = e.filter(col("vec_id") % 2 === 0)
      .groupBy(col("label").as("clabel"), col("dim"))
      .agg(expr("sum(xq) div count(1)").as("muq"))
    val test = e.filter(col("vec_id") % 2 =!= 0)
    val d2 = test.join(broadcast(cent), Seq("dim"))
      .groupBy(col("vec_id"), col("label"), col("clabel"))
      .agg(sum((col("xq") - col("muq")) * (col("xq") - col("muq"))).as("d2"))
    d2.groupBy(col("vec_id"), col("label"))
      .agg(min(struct(col("d2"), col("clabel"))).as("m"))
      .select(col("label").as("true_label"), col("m.clabel").as("pred_label"))
      .groupBy("true_label", "pred_label").agg(count(lit(1)).as("n"))
  }

  /** Oracle mirror of [[confusionDf]] — CTE chain ending in
    * `conf(true_label, pred_label, n)`. */
  private val confusionCtes: String =
    s"""cemb AS ($embSql),
      ce AS (SELECT vec_id, label,
          CAST(unnest(range(len(v))) AS INT) AS dim,
          CAST(floor(unnest(v) * 1000000 + 0.5) AS BIGINT) + 1000000 AS xq
        FROM cemb),
      cent AS (SELECT label AS clabel, dim,
          CAST(CAST(sum(xq) AS BIGINT) // count(*) AS BIGINT) AS muq
        FROM ce WHERE vec_id % 2 = 0 GROUP BY 1, 2),
      ctest AS (SELECT * FROM ce WHERE vec_id % 2 <> 0),
      cd2 AS (SELECT t.vec_id, t.label, c.clabel,
          CAST(sum((t.xq - c.muq) * (t.xq - c.muq)) AS BIGINT) AS d2
        FROM ctest t JOIN cent c ON t.dim = c.dim GROUP BY 1, 2, 3),
      cpick AS (SELECT vec_id, label AS true_label, clabel AS pred_label,
          row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
        FROM cd2),
      conf AS (SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
        FROM cpick WHERE rn = 1 GROUP BY 1, 2)"""
  private val normSql =
    """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""

  /** Shared PII regex family (X8/X8b): one Scala constant per pattern
    * feeds both the Spark Column tree (via the String-typed `regexp_*`
    * functions — no SQL-literal escaping layer) and the oracle SQL text,
    * so the scrub (`text_clean`) and the audit (`pii_audit`) can never
    * disagree on what counts as PII. All three are RE2-safe, so Java
    * regex and DuckDB's RE2 compile them identically. */
  private val urlRe = "https?://\\S+"
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val numRe = "[0-9]{6,}"
  /** Deterministic dirty stress prefix — the fixture documents are
    * synthetic and clean, so PII-bearing input is constructed, not found. */
  private val dirtyPrefix =
    "contact bob.smith+x@example.org via https://eval.example.org/run?id=9 ref 123456789 "

  /** Shared language-ID vote (X4b) as oracle CTEs: marker-token scores +
    * argmax with the de>en>es>fr tie order. Consumed by `text_langid`
    * (the per-doc listing) and `kappa_agreement` (the rater-agreement
    * audit) — one definition on each engine side so the two surfaces can
    * never validate against diverged rules. */
  private val langidCtes: String =
    s"""lid_t AS (SELECT doc_id, lang, string_split($normSql, ' ') AS tokens
        FROM documents),
      lid_sc AS (SELECT doc_id, lang,
        CAST(len(list_filter(tokens, x -> x IN ('der','die','und'))) AS INT) AS sc_de,
        CAST(len(list_filter(tokens, x -> x IN ('the','and','of'))) AS INT) AS sc_en,
        CAST(len(list_filter(tokens, x -> x IN ('el','los','y'))) AS INT) AS sc_es,
        CAST(len(list_filter(tokens, x -> x IN ('le','la','et'))) AS INT) AS sc_fr
      FROM lid_t),
      lid_pred AS (SELECT doc_id, lang, sc_de, sc_en, sc_es, sc_fr,
        CASE WHEN sc_de >= sc_en AND sc_de >= sc_es AND sc_de >= sc_fr THEN 'de'
             WHEN sc_en >= sc_es AND sc_en >= sc_fr THEN 'en'
             WHEN sc_es >= sc_fr THEN 'es'
             ELSE 'fr' END AS pred
      FROM lid_sc)"""

  /** Shared C4-style quality gate (X17) as oracle CTEs — consumed by
    * `quality_gate` (the per-doc listing) and `woe_bins` (the
    * weight-of-evidence readout over the gate's label), one definition
    * per engine side so the gate rule cannot fork. `qg_pass` exposes
    * (doc_id, n_chars, wc, mean_wlen, stop_ratio, digit_ratio, pass). */
  private val gateCtes: String =
    s"""qg_t AS (SELECT doc_id, n_chars, $normSql AS norm,
        string_split($normSql, ' ') AS w FROM documents),
      qg_m AS (SELECT doc_id, n_chars,
        CAST(len(w) AS BIGINT) AS wc,
        CAST(length(norm) - (len(w) - 1) AS DOUBLE) / len(w) AS mean_wlen,
        CAST(len(list_filter(w, x -> x IN ('the','a','of','to','and','in','is','on'))) AS DOUBLE)
          / len(w) AS stop_ratio,
        CAST(length(norm) - length(regexp_replace(norm, '[0-9]', '', 'g')) AS DOUBLE)
          / length(norm) AS digit_ratio
      FROM qg_t),
      qg_pass AS (SELECT doc_id, n_chars, wc, mean_wlen, stop_ratio, digit_ratio,
        CASE WHEN wc >= 40 AND mean_wlen >= 3 AND mean_wlen <= 8
          AND stop_ratio >= 0.01 AND digit_ratio <= 0.2 THEN 1 ELSE 0 END AS pass
      FROM qg_m)"""

  /** The Spark side of [[gateCtes]]: same ratios and gate decision as a
    * Column tree (un-rounded — consumers round for display). */
  private def gateFrame(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("__norm", LlmOps.normText(col("text")))
      .withColumn("__w", split(col("__norm"), " "))
      .withColumn("wc", size(col("__w")).cast("long"))
      .withColumn("mean_wlen",
        (length(col("__norm")) - (col("wc") - 1)).cast("double") / col("wc"))
      .withColumn("stop_ratio", expr(
        "size(filter(__w, x -> x IN ('the','a','of','to','and','in','is','on')))")
        .cast("double") / col("wc"))
      .withColumn("digit_ratio",
        (length(col("__norm")) - length(regexp_replace(col("__norm"), "[0-9]", "")))
          .cast("double") / length(col("__norm")))
      .withColumn("pass",
        when(col("wc") >= 40 && col("mean_wlen") >= 3.0 && col("mean_wlen") <= 8.0
          && col("stop_ratio") >= 0.01 && col("digit_ratio") <= 0.2, 1)
        .otherwise(0))
      .select(col("doc_id"), col("n_chars"), col("wc"), col("mean_wlen"),
        col("stop_ratio"), col("digit_ratio"), col("pass"))

  /** The Spark side of [[langidCtes]] — the same scores and argmax as a
    * Column tree over the documents table. */
  private def langidFrame(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("tokens", split(LlmOps.normText(col("text")), " "))
      .withColumn("sc_de", expr("size(filter(tokens, t -> t IN ('der','die','und')))"))
      .withColumn("sc_en", expr("size(filter(tokens, t -> t IN ('the','and','of')))"))
      .withColumn("sc_es", expr("size(filter(tokens, t -> t IN ('el','los','y')))"))
      .withColumn("sc_fr", expr("size(filter(tokens, t -> t IN ('le','la','et')))"))
      .withColumn("pred",
        when(col("sc_de") >= col("sc_en") && col("sc_de") >= col("sc_es")
          && col("sc_de") >= col("sc_fr"), "de")
        .when(col("sc_en") >= col("sc_es") && col("sc_en") >= col("sc_fr"), "en")
        .when(col("sc_es") >= col("sc_fr"), "es")
        .otherwise("fr"))
      .select(col("doc_id"), col("lang"), col("sc_de"), col("sc_en"),
        col("sc_es"), col("sc_fr"), col("pred"))

  /** Scale-safe global rank / per-zone ntile — public API in
    * [[graft.ops.Analytics]] since round 7 (a library user wanting a
    * corpus-wide rank or grouped exact ntile without a single-task sort
    * reaches them there); these thin wrappers keep the query builders
    * unchanged. */
  private def bandedRank(df: DataFrame, key: String, tie: String,
      asc: Boolean, out: String): DataFrame =
    Analytics.bandedRank(df, key, tie, asc, out)

  private def zonedNtile(df: DataFrame, zone: String, key: String,
      ties: Seq[String], k: Int, out: String): DataFrame =
    Analytics.zonedNtile(df, zone, key, ties, k, out)

  /** Value of one md5 hex digit (0-15) — the engine-portable bucket
    * primitive shared by the deterministic sampling/split/budget ops
    * (DuckDB mirror: `strpos('0123456789abcdef', c) - 1`). */
  private def hexv(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    instr(lit("0123456789abcdef"), c) - 1

  /** The memoized derived substrates — in-session equivalents of frames
    * a real deployment materializes once ([[Tables.memo]] callers) —
    * with display names, exposed so the bench can FORCE and TIME each
    * build up front and emit the seconds in its artifact (`substrates`
    * map). Under the bench's one-JVM protocol these builds were paid in
    * whichever consumer's unmeasured warm-up ran first, so the artifact
    * showed the five sessionize consumers (for example) without the
    * user-window pass appearing anywhere — bench-flattering by
    * construction (r16 verdict "What's wrong"). Ordered so dependents
    * follow their prerequisites (mh_groups builds on mh_grouped). */
  val substrates: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    ("minhash_pairs", (s: SparkSession, d: String) => dupPairs(s, d)),
    ("mh_grouped", (s: SparkSession, d: String) => mhGrouped(s, d)),
    ("mh_groups", (s: SparkSession, d: String) => mhGroups(s, d)),
    ("mh_qedges", (s: SparkSession, d: String) => mhQEdges(s, d)),
    ("dup_clusters", (s: SparkSession, d: String) => dupClusters(s, d)),
    ("embed_clusters", (s: SparkSession, d: String) => embedClusters(s, d)),
    ("sessionized_events",
      (s: SparkSession, d: String) => sessionizedEvents(s, d)))

  /** LSH candidate pairs, memoized per (session, sf dir) with a lazy
    * localCheckpoint: the three independent consumers (pair listing,
    * connected components, degree histogram) each trigger the full
    * shingle→signature→band pipeline otherwise — a real deployment
    * materializes the pair list once and every downstream op reads it. */
  private def dupPairs(s: SparkSession, d: String): DataFrame =
    Tables.memo(s, s"derived:minhash_pairs:$d") {
      LlmOps.minhashPairs(docs(s, d)).diskCheckpointLazy()
    }

  /** Signature-grouped MinHash frame `(doc_id, s0..s7, gid)` — the
    * quotient substrate shared by every duplicate-GRAPH operator (CC,
    * degree, triangles, PageRank). Docs with identical full signatures
    * are automorphic in the pair graph ([[LlmOps.minhashGrouped]]), so
    * those consumers compute at group grain and a boilerplate
    * megacluster of k identical docs costs O(k), not O(k²) — the pair
    * LISTING (`dedup_minhash`) keeps [[dupPairs]] because its declared
    * output IS the quadratic pair set. Memoized like the pair list: one
    * signature pipeline feeds four registered queries. */
  private def mhGrouped(s: SparkSession, d: String): DataFrame =
    Tables.memo(s, s"derived:mh_grouped:$d") {
      LlmOps.minhashGrouped(docs(s, d)).diskCheckpointLazy()
    }

  /** Shared X15d substrate: `(w, spans)` — the normalized word arrays
    * and the maximal duplicated word spans (algorithm + md5-bin16
    * identity rationale at the `dedup_spans` registration). Recomputed
    * per consumer like the X15c pipeline (the two consumers are
    * alternative output shapes, not a fan-out worth a checkpoint).
    *
    * Positions carry the 16-byte md5 of the gram, not the gram string:
    * the frequency aggregate and the join-back only need gram IDENTITY,
    * and md5 equality is the house exactness bar (dedup_exact keys on
    * sha2(norm) — collision odds at 10¹⁰ grams are ~2⁻⁶⁴
    * birthday-adjusted). On the dense synthetic corpus where ~every
    * position is duplicated this shrinks the two per-position shuffles
    * ~40% (measured: the decade-4 tier ENOSPC'd the host's scratch
    * with string keys). */
  private def spanFrames(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val base = docs(s, d)
    // ONE normalized projection below ONE spread exchange (r17, advisor
    // finding): both returned frames derive from `nf`, so their
    // identical scan→normalize→repartition subtrees share the exchange
    // at runtime (guide §2.4) — the r16 shape repartitioned `base`
    // twice and evaluated normText once per frame.
    val nf = base
      .select(col("doc_id"), LlmOps.normText(col("text")).as("__t"))
      .repartition(LlmOps.spreadWidth(base))
    val w = nf.select(col("doc_id"), split(col("__t"), " ").as("__w"))
    // native O(len) 5-gram walk (r16): word_ngrams' empty array on
    // sub-5-word docs makes posexplode drop exactly the rows the old
    // size(__w) >= 5 filter did; positions are the same 0-based i. The
    // walk reads the normalized STRING directly (byte-equivalent to the
    // old array_join(slice(__w,…)) grams — WordNgramsSpec pins the
    // split/join round trip) and is far cheaper than the interpreted
    // slice/join lambda it replaced.
    val g = nf
      .select(col("doc_id"), posexplode(graft.functions.native
        .word_ngrams(col("__t"), 5)))
      .toDF("doc_id", "pos", "gram")
      .select(col("doc_id"), col("pos"), unhex(md5(col("gram"))).as("h"))
    val dupGrams = g.groupBy(col("h"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
      .select(col("h"))
    val dup = g.join(dupGrams, Seq("h")).select(col("doc_id"), col("pos"))
    val spans = dup
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .groupBy(col("doc_id"), (col("pos") - col("rn")).as("__isl"))
      .agg(min(col("pos")).as("start_word"),
        (max(col("pos")) - min(col("pos")) + lit(5)).as("len_words"))
    (w, spans)
  }

  /** DuckDB mirror of [[spanFrames]] (string-keyed — the oracle's plan
    * is its own business; md5 identity on the Spark side is exact
    * modulo 2⁻¹²⁸ collisions). */
  private val spansCtes =
    s"""n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
      g AS (SELECT doc_id, CAST(i AS INT) AS pos,
          array_to_string(w[i+1:i+5], ' ') AS gram
        FROM n, unnest(range(greatest(len(w) - 4, 0))) AS u(i)),
      occ AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
      dup AS (SELECT doc_id, pos FROM g JOIN occ USING (gram)),
      isl AS (SELECT doc_id, pos,
          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM dup),
      sp AS (SELECT doc_id, min(pos) AS start_word,
          max(pos) - min(pos) + 5 AS len_words
        FROM isl GROUP BY doc_id, grp)"""

  /** Signature groups `(gid, m, s0..s7)`, memoized (see [[mhGrouped]]). */
  private def mhGroups(s: SparkSession, d: String): DataFrame =
    Tables.memo(s, s"derived:mh_groups:$d") {
      LlmOps.signatureGroups(mhGrouped(s, d)).diskCheckpointLazy()
    }

  /** Quotient candidate edges `(ga, gb)`, memoized (see [[mhGrouped]]). */
  private def mhQEdges(s: SparkSession, d: String): DataFrame =
    Tables.memo(s, s"derived:mh_qedges:$d") {
      LlmOps.quotientEdges(mhGroups(s, d)).diskCheckpointLazy()
    }

  /** Per-group duplicate-graph degree `(gid, m, degree)`: every member of
    * group `a` has exactly `(m_a - 1) + Σ_{b~a} m_b` pair-graph neighbors
    * (its own group minus itself, plus every member of each quotient-
    * adjacent group) — the automorphism argument that lets the degree,
    * wedge, and PageRank math run at group grain with EXACT integer
    * equality to the node-grain forms (the DuckDB oracles still compute
    * the all-pairs node-grain construction, so every correctness pass
    * re-proves the quotient identity). */
  private def mhGroupDegrees(s: SparkSession, d: String): DataFrame = {
    val g = mhGroups(s, d).select(col("gid"), col("m"))
    val qe = mhQEdges(s, d)
    val nmass = qe.select(col("ga").as("gid"), col("gb").as("nb"))
      .unionAll(qe.select(col("gb"), col("ga")))
      .join(g.select(col("gid").as("nb"), col("m").as("nm"))
        .hint("shuffle_hash"), Seq("nb"))
      .groupBy(col("gid")).agg(sum(col("nm")).as("nmass"))
    // both sides are checkpoint/aggregate-lineage (estimate stats) —
    // hint so the planner never broadcasts a group-proportional frame
    g.join(nmass.hint("shuffle_hash"), Seq("gid"), "left")
      .select(col("gid"), col("m"),
        (col("m") - 1 + coalesce(col("nmass"), lit(0L))).as("degree"))
  }

  /** Duplicate-cluster labels `(node, rep)` for the corpus at `d`, memoized
    * per session. Four independent operators (cluster listing, min-id
    * purge, quality-aware retention, size histogram) consume the same
    * LSH + connected-components result; a real deployment materializes
    * that intermediate once and every downstream op joins against it —
    * [[Tables.memo]] is the in-session equivalent (the CC output is
    * already checkpoint-backed, so reuse costs a block read, not a
    * recompute).
    *
    * Components run over the signature QUOTIENT (star edges gid→member
    * within each group, plus [[mhQEdges]] between groups), which has
    * exactly the pair graph's connectivity: within a group the star and
    * the clique connect the same member set, two groups' members are
    * pair-adjacent iff the groups share a band (adjacency is a function
    * of the signature alone), and min-label reps agree because gid is
    * the group minimum. LlmOpsSpec proves label-for-label equality
    * against CC over [[LlmOps.minhashPairs]], megacluster included. */
  private def dupClusters(s: SparkSession, d: String): DataFrame =
    Tables.memo(s, s"derived:dup_clusters:$d") {
      val nodes = docs(s, d).select(col("doc_id").as("node"))
      val star = mhGrouped(s, d).filter(col("doc_id") =!= col("gid"))
        .select(col("gid").as("doc_a"), col("doc_id").as("doc_b"))
      // checkpoint the FINAL label frame: the memo's consumers (sizes,
      // purge, keep-best, balanced sample) otherwise re-run the isolated-
      // node union branch per execution — one block read beats four
      // anti-join recomputes
      LlmOps.connectedComponents(nodes,
          star.unionAll(mhQEdges(s, d).toDF("doc_a", "doc_b")))
        .diskCheckpointLazy()
    }

  /** Embedding duplicate-cluster labels `(vec_id, rep)` — the embed-side
    * twin of [[dupClusters]], memoized per (session, dir) through
    * [[Tables.memo]] (r7 verdict task #6): a real deployment
    * materializes the sign-LSH → cosine-gate → connected-components
    * label frame ONCE and every purge/retention consumer joins against
    * it; the memo is the in-session equivalent, and the CC output is
    * already checkpoint-backed so reuse costs a block read, not a
    * pipeline re-derivation (BASELINE.md records the cold and warm rows
    * separately).
    *
    * Like [[dupClusters]], the components run over an identity QUOTIENT:
    * vectors with the same `(label, v)` are automorphic in the gated
    * candidate graph (cells and cosines are functions of the values
    * alone), so the gated pair pipeline runs over one representative per
    * identity group and star edges gid→member supply the intra-group
    * connectivity — a corpus duplicated k× collapses its candidate
    * work to the distinct-vector set instead of k² bucket pairs. The
    * star is unconditional, mirroring the pair pipeline's own gate on
    * identical vectors (cosine 1 for any nonzero vector; the degenerate
    * all-zero vector hits the same 0/0 path the pair form hits, so
    * connectivity is unchanged there too). LlmOpsSpec proves
    * label-for-label equality against CC over the ungrouped pair
    * pipeline, duplicated corpus included. */
  private def embedClusters(s: SparkSession, d: String): DataFrame =
    Tables.memo(s, s"derived:embed_clusters:$d") {
      import org.apache.spark.sql.expressions.Window
      val mem = emb(s, d).withColumn("gid",
          min(col("vec_id")).over(Window.partitionBy(col("label"), col("v"))))
        .diskCheckpointLazy()
      val reps = mem.filter(col("vec_id") === col("gid"))
        .select(col("vec_id"), col("label"), col("v"), col("nrm"))
      val star = mem.filter(col("vec_id") =!= col("gid"))
        .select(col("gid").as("doc_a"), col("vec_id").as("doc_b"))
      val nodes = emb(s, d).select(col("vec_id").as("node"))
      LlmOps.connectedComponents(nodes,
          star.unionAll(embedDupPairsFrom(reps)
            .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))))
        .select(col("node").as("vec_id"), col("rep"))
        .diskCheckpointLazy() // one block read per memo hit (see dupClusters)
    }

  /** Character-trigram Jaccard pair pipeline — the shared BUILDER behind
    * the pair listing (dedup_ngram_jaccard) and its bounded top-k
    * companion (dedup_ngram_jaccard_topk). Scale-safe EXACT blocking: the
    * semantic length gate |na-nb| <= 3 implies floor(na/4) and
    * floor(nb/4) differ by at most 1, so the length band joins as an
    * equi-key — (lang, band) buckets replace a lang-only join (~4
    * distinct values → N²/4 candidate pairs). One side probes its band
    * ±1; each qualifying pair meets in exactly one (probe band = build
    * band) bucket, so no distinct is needed and the output is
    * byte-identical to the unbanded join.
    *
    * No checkpoint: materializing shingle arrays is a ~3×-corpus-size
    * spill at scale. The ±1 probe side stays SLIM (no shingle array —
    * Catalyst prunes the shingle transform out of that branch entirely),
    * the build side computes its arrays in one pass, and the probe
    * side's array attaches to the surviving candidates by one id-keyed
    * join (a second shingle pass over the corpus — recompute beats
    * corpus-sized materialization). */
  private def ngramJaccardPairs(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d)
    val withSh = base.repartition(LlmOps.spreadWidth(base))
      .withColumn("norm", LlmOps.normText(col("text")))
      // native O(len) shingling: the lambda substring form is O(len²)
      // per doc (see functions.CharNgrams)
      .withColumn("sh", array_distinct(
        graft.functions.native.char_ngrams(col("norm"), 3)))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("sh"),
        floor(col("n_chars") / 4).as("band"))
    // packed sorted sets ride the band join instead of raw shingle
    // arrays (r16, functions.PackedSet): fewer bytes per candidate row
    // and a zero-allocation linear-merge intersect per pair — identical
    // values (full-byte identity; set sizes taken from the array before
    // packing)
    val withPk = withSh
      .withColumn("pk", graft.functions.native.pack_sorted_set(col("sh")))
      .withColumn("ns", size(col("sh")))
    val a = withPk.select(col("doc_id").as("doc_a"), col("lang"),
      col("n_chars").as("na"),
      explode(array(col("band") - 1, col("band"), col("band") + 1)).as("jband"))
    val b = withPk.select(col("doc_id").as("doc_b"), col("lang"),
      col("n_chars").as("nb"), col("pk").as("pkb"), col("ns").as("nsb"),
      col("band").as("jband"))
    val sha = withPk.select(col("doc_id").as("doc_a"), col("pk").as("pka"),
      col("ns").as("nsa"))
    a.join(b, Seq("lang", "jband"))
      .filter(col("doc_a") < col("doc_b") && abs(col("na") - col("nb")) <= 3)
      .join(sha, Seq("doc_a"))
      .withColumn("inter", graft.functions.native
        .packed_intersect_count(col("pka"), col("pkb")))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") /
          (col("nsa") + col("nsb") - col("inter")), 6).as("jaccard"))
  }

  /** Oracle CTE chain mirroring [[ngramJaccardPairs]] — ends in
    * `jpairs(doc_a, doc_b, jaccard)`. The oracle keeps the semantic
    * (lang, |len diff| <= 3) join rather than replaying the band
    * mechanics: the banding is proven output-identical by construction
    * (every qualifying pair meets in exactly one bucket). */
  private val ngramJaccardCtes: String =
    s"""n AS (SELECT doc_id, lang, n_chars,
          list_distinct(list_transform(range(length($normSql)-2),
            i -> substring($normSql, i+1, 3))) AS sh
        FROM documents),
      jpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
            (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
        FROM n a JOIN n b ON a.lang = b.lang AND a.doc_id < b.doc_id
          AND abs(a.n_chars - b.n_chars) <= 3)"""

  /** Embedding near-dup candidate pairs (vec_a, vec_b, cos_r) — the
    * shared BUILDER behind the pair listing (dedup_embed_cosine) and the
    * bounded-output cluster resolution (dedup_embed_clusters); each
    * caller constructs its own pipeline (see the NOT-memoized note
    * below). Random-hyperplane
    * (sign) LSH banding: each vector gets 6 deterministic sign bits
    * against Walsh/Hadamard hyperplanes (plane j flips sign with index
    * bit j — mutually orthogonal, engine-portable integer construction),
    * grouped into 3 bands × 2 bits; candidates are pairs sharing
    * (label, band, cell) — a bucketed equi-join whose bucket sizes bound
    * the pair space — then the exact rounded cosine >= 0.3 gate.
    * Standard LSH candidate generation: recall < 1 by design (same trade
    * as MinHash banding, X2); the DuckDB oracle mirrors the identical
    * construction ([[embedPairCtes]]). NOT memoized (unlike [[dupPairs]]):
    * each consumer pays its own pipeline, so bench rows stay
    * order-independent and the candidate join stays visible in every
    * consumer's plan (PlanSpec pins its (label, band, cell) key). */
  private def embedDupPairs(s: SparkSession, d: String): DataFrame =
    embedDupPairsFrom(emb(s, d))

  private def embedDupPairsFrom(e: DataFrame): DataFrame = {
      // the checkpointed banding frame is SLIM — ids and cell keys only,
      // never the vector payloads (materializing corpus-sized vectors is
      // the 100 TB anti-pattern); candidate pairs are deduped across
      // bands first, then the two vectors attach by id-keyed joins and
      // the exact cosine runs once per unique pair
      val cells = e
        .withColumn("bc", explode(LlmOps.signLshCells(col("v"))))
        .select(col("vec_id"), col("label"), col("bc.band"), col("bc.cell"))
        .diskCheckpoint()
      // the checkpointed cell frame is corpus-proportional with ESTIMATE
      // stats — hint the self-join so the planner never broadcasts it
      // (SCALE.md LogicalRDD-stats lesson). The vector attaches below
      // are deliberately UNhinted: their build side is the parquet scan,
      // whose stats grow accurately with file size, so broadcast is
      // correct at fixture scale and self-corrects to a shuffle at 100 TB.
      val pairs = cells.toDF("vec_a", "label", "band", "cell")
        .join(cells.toDF("vec_b", "label", "band", "cell")
          .hint("shuffle_hash"), Seq("label", "band", "cell"))
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b")).distinct()
      val vecs = e.select(col("vec_id"), col("v"), col("nrm"))
      pairs
        .join(vecs.toDF("vec_a", "va", "na"), Seq("vec_a"))
        .join(vecs.toDF("vec_b", "vb", "nb"), Seq("vec_b"))
        .withColumn("cos_r",
          round(LlmOps.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
        .filter(col("cos_r") >= 0.3)
        .select(col("vec_a"), col("vec_b"), col("cos_r"))
  }

  /** Oracle CTE chain mirroring [[embedDupPairs]]: embeddings → Walsh
    * sign bits → 3 LSH band cells → distinct cosine-gated pairs
    * (`epairs(vec_a, vec_b, cos_r)`). */
  private val embedPairCtes: String =
    s"""e AS ($embSql),
      ebits AS (SELECT vec_id, label, v,
        CASE WHEN list_sum(list_transform(range(len(v)), i -> v[i+1] * (1 - 2*((i // 1) % 2)))) >= 0 THEN 1 ELSE 0 END AS b0,
        CASE WHEN list_sum(list_transform(range(len(v)), i -> v[i+1] * (1 - 2*((i // 2) % 2)))) >= 0 THEN 1 ELSE 0 END AS b1,
        CASE WHEN list_sum(list_transform(range(len(v)), i -> v[i+1] * (1 - 2*((i // 4) % 2)))) >= 0 THEN 1 ELSE 0 END AS b2,
        CASE WHEN list_sum(list_transform(range(len(v)), i -> v[i+1] * (1 - 2*((i // 8) % 2)))) >= 0 THEN 1 ELSE 0 END AS b3,
        CASE WHEN list_sum(list_transform(range(len(v)), i -> v[i+1] * (1 - 2*((i // 16) % 2)))) >= 0 THEN 1 ELSE 0 END AS b4,
        CASE WHEN list_sum(list_transform(range(len(v)), i -> v[i+1] * (1 - 2*((i // 32) % 2)))) >= 0 THEN 1 ELSE 0 END AS b5
      FROM e),
      ecells AS (SELECT vec_id, label, v,
        unnest([0, 1, 2]) AS band,
        unnest([b0*2+b1, b2*2+b3, b4*2+b5]) AS cell
      FROM ebits),
      epairs AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
        round(list_sum(list_transform(range(len(a.v)), i -> a.v[i+1]*b.v[i+1])) /
          (sqrt(list_sum(list_transform(a.v, x -> x*x))) *
           sqrt(list_sum(list_transform(b.v, x -> x*x)))), 6) AS cos_r
      FROM ecells a JOIN ecells b
        ON a.label = b.label AND a.band = b.band AND a.cell = b.cell
        AND a.vec_id < b.vec_id
      WHERE round(list_sum(list_transform(range(len(a.v)), i -> a.v[i+1]*b.v[i+1])) /
          (sqrt(list_sum(list_transform(a.v, x -> x*x))) *
           sqrt(list_sum(list_transform(b.v, x -> x*x)))), 6) >= 0.3)"""

  private def walshBitsSql(src: String): String = (0 until 6).map(k =>
    s"CASE WHEN list_sum(list_transform(range(len($src)), i -> $src[i+1] * (1 - 2*((i // ${1 << k}) % 2)))) >= 0 THEN 1 ELSE 0 END AS b$k")
    .mkString(",\n        ")
  private def cosSql(a: String, b: String): String =
    s"""round(list_sum(list_transform(range(len($a)), i -> $a[i+1]*$b[i+1])) /
          (sqrt(list_sum(list_transform($a, x -> x*x))) *
           sqrt(list_sum(list_transform($b, x -> x*x)))), 6)"""

  /** Embedding-side quotient chain — the vector-identity twin of
    * [[quotientCcCtes]], mirroring [[embedClusters]]' Spark construction:
    * vectors with identical `(label, v)` are automorphic in the
    * (label, band, cell) candidate graph (cells are functions of `v`
    * alone, the cosine of identical non-zero vectors is 1 ≥ 0.3), so the
    * gated pair join and the recursive walk both run at group grain —
    * |distinct vectors| nodes no matter how duplicated the corpus is —
    * and labels expand back by membership. `elab(node, rep)` is
    * row-identical to the node-grain `ewalk` label frame on any corpus
    * without all-zero vectors (the fixtures have none: an all-zero
    * duplicate pair's gate is NaN ≥ 0.3 node-grain but unconditional
    * membership here). */
  private val embedQuotientCtes: String =
    s"""e AS ($embSql),
      egrp AS (SELECT min(vec_id) AS gid, CAST(count(*) AS BIGINT) AS m, label, v
        FROM e GROUP BY label, v),
      egbits AS (SELECT gid, label, v,
        ${walshBitsSql("v")}
      FROM egrp),
      egcells AS (SELECT gid, label, v,
        unnest([0, 1, 2]) AS band,
        unnest([b0*2+b1, b2*2+b3, b4*2+b5]) AS cell
      FROM egbits),
      eq AS (SELECT DISTINCT a.gid AS ga, b.gid AS gb
        FROM egcells a JOIN egcells b
          ON a.label = b.label AND a.band = b.band AND a.cell = b.cell
          AND a.gid < b.gid
        WHERE ${cosSql("a.v", "b.v")} >= 0.3),
      eqedges AS (SELECT ga AS src, gb AS dst FROM eq
                  UNION ALL SELECT gb, ga FROM eq),
      eqwalk(node, rep) AS (
        SELECT gid, gid FROM egrp
        UNION
        SELECT x.src, w.rep FROM eqedges x JOIN eqwalk w ON x.dst = w.node),
      eqlab AS (SELECT node AS gid, min(rep) AS grep FROM eqwalk GROUP BY node),
      elab AS (SELECT e.vec_id AS node, ql.grep AS rep
        FROM e JOIN egrp g ON e.label = g.label AND e.v = g.v
        JOIN eqlab ql ON ql.gid = g.gid)"""

  /** Shared oracle CTE chain: documents → bigram shingles → 8 MinHash
    * signatures (4 per md5 digest via disjoint hex windows) → 2 LSH bands →
    * distinct candidate pairs. Mirrors [[LlmOps.minhashPairs]]. */
  /** documents → per-doc 8-permutation MinHash signature (`sig`), the
    * prefix shared by the node-grain pair chain ([[minhashPairCtes]]) and
    * the group-grain quotient chain ([[quotientCcCtes]]). */
  private val minhashSigCtes: String =
    s"""n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
      sh AS (SELECT doc_id,
        list_transform(range(greatest(len(w)-1, 0)), i -> w[i+1] || ' ' || w[i+2]) AS shingles
      FROM n),
      sig AS (SELECT doc_id,
        list_min(list_transform(shingles, x -> substring(md5(x), 1, 8))) AS s0,
        list_min(list_transform(shingles, x -> substring(md5(x), 9, 8))) AS s1,
        list_min(list_transform(shingles, x -> substring(md5(x), 17, 8))) AS s2,
        list_min(list_transform(shingles, x -> substring(md5(x), 25, 8))) AS s3,
        list_min(list_transform(shingles, x -> substring(md5('|' || x), 1, 8))) AS s4,
        list_min(list_transform(shingles, x -> substring(md5('|' || x), 9, 8))) AS s5,
        list_min(list_transform(shingles, x -> substring(md5('|' || x), 17, 8))) AS s6,
        list_min(list_transform(shingles, x -> substring(md5('|' || x), 25, 8))) AS s7
      FROM sh)"""

  private val minhashPairCtes: String =
    s"""$minhashSigCtes,
      bands AS (
        SELECT doc_id, 0 AS band, md5(s0 || s1 || s2 || s3) AS bk FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band, md5(s4 || s5 || s6 || s7) AS bk FROM sig),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk
          AND a.doc_id < b.doc_id)"""

  /** Group-grain (signature-quotient) oracle chain — the 10×-feasible
    * twin of the node-grain recursive-CTE walk. Docs sharing the full
    * 8-permutation signature are AUTOMORPHIC in the band-join candidate
    * graph (band keys are functions of the signature alone, so same
    * signature ⇒ same buckets ⇒ mutually adjacent and adjacent to exactly
    * the same outside groups): connected components run on the GROUP
    * quotient — whose walk is |distinct signatures| nodes, megacluster-
    * proof — and labels expand back by membership. `lab(node, rep)` is
    * row-identical to the node-grain `walk`-based label frame (proven by
    * direct DuckDB-vs-DuckDB comparison at sf0.001/sf0.01, where both
    * forms are feasible, and by LlmOpsSpec's quotient-equality cases on
    * the Spark side). gid = min doc id of its group, so the component
    * min over gids IS the component min doc id. Docs with no shingles
    * (no signature row) rejoin as their own singletons. */
  private val quotientCcCtes: String =
    s"""$minhashSigCtes,
      grp AS (SELECT min(doc_id) AS gid, CAST(count(*) AS BIGINT) AS m,
          s0, s1, s2, s3, s4, s5, s6, s7
        FROM sig WHERE s0 IS NOT NULL
        GROUP BY s0, s1, s2, s3, s4, s5, s6, s7),
      gmem AS (SELECT s.doc_id, g.gid FROM sig s JOIN grp g
        ON s.s0 = g.s0 AND s.s1 = g.s1 AND s.s2 = g.s2 AND s.s3 = g.s3
       AND s.s4 = g.s4 AND s.s5 = g.s5 AND s.s6 = g.s6 AND s.s7 = g.s7),
      gbands AS (
        SELECT gid, 0 AS band, md5(s0 || s1 || s2 || s3) AS bk FROM grp
        UNION ALL
        SELECT gid, 1 AS band, md5(s4 || s5 || s6 || s7) AS bk FROM grp),
      qpairs AS (
        SELECT DISTINCT a.gid AS ga, b.gid AS gb
        FROM gbands a JOIN gbands b ON a.band = b.band AND a.bk = b.bk
          AND a.gid < b.gid),
      qedges AS (SELECT ga AS src, gb AS dst FROM qpairs
                 UNION ALL SELECT gb, ga FROM qpairs),
      qwalk(node, rep) AS (
        SELECT gid, gid FROM grp
        UNION
        SELECT e.src, w.rep FROM qedges e JOIN qwalk w ON e.dst = w.node),
      qlab AS (SELECT node AS gid, min(rep) AS grep FROM qwalk GROUP BY node),
      lab AS (
        SELECT gm.doc_id AS node, ql.grep AS rep
        FROM gmem gm JOIN qlab ql USING (gid)
        UNION ALL
        SELECT d.doc_id, d.doc_id FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM gmem WHERE gmem.doc_id = d.doc_id))"""

  /** Group-grain degree `(gid, m, degree)` on top of [[quotientCcCtes]]:
    * every member of group g has exactly `(m_g − 1) + Σ_{h~g} m_h`
    * pair-graph neighbors (the [[mhGroupDegrees]] identity, in SQL). */
  private val quotientDegCtes: String =
    """nmass AS (SELECT e.src AS gid, sum(g.m) AS nmass
        FROM qedges e JOIN grp g ON g.gid = e.dst GROUP BY e.src),
      gdeg AS (SELECT g.gid, g.m, g.m - 1 + coalesce(n.nmass, 0) AS degree
        FROM grp g LEFT JOIN nmass n USING (gid))"""

  /** Staged (multi-statement) materialization of the quotient substrate
    * for the two oracles that stack heavy consumers on top of it
    * (`dup_pagerank`'s three unrolled iterations, `triangle_count`'s
    * wedge join). The monolithic `WITH RECURSIVE` forms re-derive the
    * full corpus minhash signature inside one statement and exhaust
    * DuckDB 1.0's allocator at 5M docs (round-12 adjudication); staged,
    * the signature table materializes ONCE as a temp table (spillable
    * via temp_directory) and each downstream table is |quotient|-grain.
    * `;---STAGE---` separators are executed one statement at a time by
    * tools/oracle_check.py; `IF NOT EXISTS` lets the second oracle in a
    * run reuse the first's materialization (same corpus per run by
    * construction). Neither consumer needs the recursive walk at all —
    * the recursion only ever produced `lab`, which pagerank/triangle
    * don't read — so the staged forms are recursion-free. */
  private val quotientStageCtes: String =
    s"""CREATE TEMP TABLE IF NOT EXISTS t_sig AS
        WITH $minhashSigCtes SELECT * FROM sig
      ;---STAGE---
      CREATE TEMP TABLE IF NOT EXISTS t_grp AS
        SELECT min(doc_id) AS gid, CAST(count(*) AS BIGINT) AS m,
          s0, s1, s2, s3, s4, s5, s6, s7
        FROM t_sig WHERE s0 IS NOT NULL
        GROUP BY s0, s1, s2, s3, s4, s5, s6, s7
      ;---STAGE---
      CREATE TEMP TABLE IF NOT EXISTS t_gmem AS
        SELECT s.doc_id, g.gid FROM t_sig s JOIN t_grp g
        ON s.s0 = g.s0 AND s.s1 = g.s1 AND s.s2 = g.s2 AND s.s3 = g.s3
       AND s.s4 = g.s4 AND s.s5 = g.s5 AND s.s6 = g.s6 AND s.s7 = g.s7
      ;---STAGE---
      CREATE TEMP TABLE IF NOT EXISTS t_qpairs AS
        WITH gbands AS (
          SELECT gid, 0 AS band, md5(s0 || s1 || s2 || s3) AS bk FROM t_grp
          UNION ALL
          SELECT gid, 1 AS band, md5(s4 || s5 || s6 || s7) AS bk FROM t_grp)
        SELECT DISTINCT a.gid AS ga, b.gid AS gb
        FROM gbands a JOIN gbands b ON a.band = b.band AND a.bk = b.bk
          AND a.gid < b.gid
      ;---STAGE---
      CREATE TEMP TABLE IF NOT EXISTS t_qedges AS
        SELECT ga AS src, gb AS dst FROM t_qpairs
        UNION ALL SELECT gb, ga FROM t_qpairs
      ;---STAGE---
      CREATE TEMP TABLE IF NOT EXISTS t_gdeg AS
        WITH nmass AS (SELECT e.src AS gid, sum(g.m) AS nmass
          FROM t_qedges e JOIN t_grp g ON g.gid = e.dst GROUP BY e.src)
        SELECT g.gid, g.m, g.m - 1 + coalesce(n.nmass, 0) AS degree
        FROM t_grp g LEFT JOIN nmass n USING (gid)
      ;---STAGE---"""

  /** One unrolled group-grain PageRank iteration (exact integer
    * micro-points, `//` before the multiply — the [[mhGroupDegrees]]
    * recurrence in SQL): sc_g = (m_g−1)·(r_g // d_g) + Σ_{h~g} m_h·(r_h // d_h). */
  private def qprIterSql(i: Int, edges: String = "qedges"): String = {
    val prev = s"c${i - 1}"
    s"""x$i AS (SELECT e.src AS gid, sum(c.m * c.c) AS xm
        FROM $edges e JOIN $prev c ON c.gid = e.dst GROUP BY e.src),
      r$i AS (SELECT c.gid, c.m, c.degree,
        150000 // n_nodes + (85 * ((c.m - 1) * c.c + coalesce(x.xm, 0))) // 100 AS r
        FROM $prev c LEFT JOIN x$i x USING (gid), nn),
      c$i AS (SELECT gid, m, degree, r // degree AS c FROM r$i)"""
  }

  /** Scale-gate oracle overrides: group-grain (signature-quotient)
    * rewrites of the CC/cluster-family oracles, used by the 10×/100×
    * adversarial gates where the registered node-grain recursive-CTE
    * forms are oracle-side infeasible (a k-doc megacluster's pair walk is
    * O(k²) rows). The REGISTERED oracles stay node-grain all-pairs, so
    * every driver correctness pass at sf0.01 still re-proves the quotient
    * identity cross-form; these overrides re-prove the same outputs at
    * the scales only the quotient can reach. Every override was verified
    * row-identical to its registered form by direct DuckDB-vs-DuckDB
    * comparison at sf0.001 and sf0.01 (tools/oracle_check.py --scale
    * consumes them via Verify's oracle_sql_scale.json dump). */
  private[graft] lazy val scaleOracleSql: Map[String, String] = {
    val keepTail = """lab2 AS (SELECT doc_id, lang, n_chars, rep
        FROM documents JOIN lab ON doc_id = node),
      rk AS (SELECT doc_id, lang, n_chars,
        row_number() OVER (PARTITION BY rep ORDER BY n_chars DESC, doc_id ASC) AS rn,
        count(*) OVER (PARTITION BY rep) AS dups FROM lab2)
      SELECT doc_id, lang, n_chars, dups FROM rk WHERE rn = 1 ORDER BY doc_id"""
    val sampTail = """cl AS (SELECT rep, CAST(count(*) AS BIGINT) AS sz FROM lab GROUP BY rep),
      k AS (SELECT lab.node, lab.rep, sz,
          CAST((strpos('0123456789abcdef',
              substring(md5(CAST(node AS VARCHAR)), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef',
              substring(md5(CAST(node AS VARCHAR)), 2, 1)) - 1)
            AS BIGINT) AS b
        FROM lab JOIN cl ON lab.rep = cl.rep)
      SELECT sz, CAST(count(DISTINCT rep) AS BIGINT) AS n_clusters,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN b * sz < 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM k GROUP BY sz ORDER BY sz"""
    Map(
      "dedup_clusters" -> s"""WITH RECURSIVE $quotientCcCtes
        SELECT node AS doc_id, rep FROM lab ORDER BY doc_id""",
      "dedup_purge" -> s"""WITH RECURSIVE $quotientCcCtes
        SELECT doc_id, lang, n_chars FROM documents JOIN lab ON doc_id = node
        WHERE rep = node ORDER BY doc_id""",
      "dedup_keep_best" -> s"WITH RECURSIVE $quotientCcCtes, $keepTail",
      "dup_cluster_sizes" -> s"""WITH RECURSIVE $quotientCcCtes,
        cl AS (SELECT rep, CAST(count(*) AS BIGINT) AS sz FROM lab GROUP BY rep)
        SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters
        FROM cl GROUP BY sz ORDER BY sz""",
      "cluster_balanced_sample" -> s"WITH RECURSIVE $quotientCcCtes, $sampTail",
      "dup_graph_degree" -> s"""WITH RECURSIVE $quotientCcCtes, $quotientDegCtes,
        hist0 AS (SELECT CAST(degree AS BIGINT) AS degree,
            CAST(sum(m) AS BIGINT) AS cnt FROM gdeg GROUP BY degree),
        zero AS (SELECT CAST(0 AS BIGINT) AS degree, CAST(count(*) AS BIGINT) AS cnt
          FROM documents d
          WHERE NOT EXISTS (SELECT 1 FROM gmem WHERE gmem.doc_id = d.doc_id))
        SELECT degree, CAST(sum(cnt) AS BIGINT) AS n_docs FROM (
          SELECT * FROM hist0 UNION ALL SELECT * FROM zero)
        GROUP BY degree HAVING sum(cnt) > 0 ORDER BY degree""",
      "dup_pagerank" -> s"""$quotientStageCtes
        WITH pdeg AS (SELECT * FROM t_gdeg WHERE degree > 0),
        nn AS (SELECT CAST(sum(m) AS BIGINT) AS n_nodes FROM pdeg),
        r0 AS (SELECT gid, m, degree, 1000000 // n_nodes AS r FROM pdeg, nn),
        c0 AS (SELECT gid, m, degree, r // degree AS c FROM r0),
        ${qprIterSql(1, "t_qedges")}, ${qprIterSql(2, "t_qedges")},
        ${qprIterSql(3, "t_qedges")}
        SELECT gm.doc_id, CAST(r.r AS BIGINT) AS rank_upts
        FROM t_gmem gm JOIN r3 r USING (gid) ORDER BY doc_id""",
      "triangle_count" -> s"""$quotientStageCtes
        WITH ns AS (SELECT
            coalesce(sum(CAST(m AS HUGEINT) * (m - 1) // 2), 0) AS e_in,
            coalesce(sum(CAST(m AS HUGEINT)
              * (CAST(degree AS HUGEINT) * (degree - 1) // 2)), 0) AS n_wedges,
            coalesce(sum(CAST(m AS HUGEINT) * (m - 1) * (m - 2) // 6), 0) AS t_in
          FROM t_gdeg),
        es AS (SELECT
            coalesce(sum(CAST(a.m AS HUGEINT) * b.m), 0) AS e_x,
            coalesce(sum((CAST(a.m AS HUGEINT) * (a.m - 1) // 2) * b.m
              + (CAST(b.m AS HUGEINT) * (b.m - 1) // 2) * a.m), 0) AS t_mixed
          FROM t_qpairs JOIN t_grp a ON a.gid = ga JOIN t_grp b ON b.gid = gb),
        qd AS (SELECT src AS u, count(*) AS qdv FROM t_qedges GROUP BY src),
        o AS (SELECT e.src, e.dst
          FROM t_qedges e JOIN qd a ON e.src = a.u JOIN qd b ON e.dst = b.u
          WHERE a.qdv < b.qdv OR (a.qdv = b.qdv AND e.src < e.dst)),
        w AS (SELECT e1.src, e1.dst AS w1, e2.dst AS w2
          FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst < e2.dst),
        tq AS (SELECT coalesce(sum(CAST(gs.m AS HUGEINT) * g1.m * g2.m), 0) AS t_q
          FROM w JOIN t_qpairs p ON w.w1 = p.ga AND w.w2 = p.gb
          JOIN t_grp gs ON gs.gid = w.src
          JOIN t_grp g1 ON g1.gid = w.w1 JOIN t_grp g2 ON g2.gid = w.w2)
        SELECT CAST(e_in + e_x AS BIGINT) AS n_edges,
          CAST(n_wedges AS BIGINT) AS n_wedges,
          CAST(t_in + t_mixed + t_q AS BIGINT) AS n_triangles,
          CASE WHEN n_wedges = 0 THEN 0.0
            ELSE round(3.0 * CAST(t_in + t_mixed + t_q AS DOUBLE)
              / CAST(n_wedges AS DOUBLE), 6) END AS global_clustering
        FROM ns, es, tq""",
      "dedup_embed_clusters" -> s"""WITH RECURSIVE $embedQuotientCtes
        SELECT node AS vec_id, rep FROM elab ORDER BY vec_id""")
  }

  /** Shared gap-sessionization pieces (30-min split, half-open semantics,
    * (us, event_id) full-key order) — ONE definition consumed by the batch
    * sessionizer (X34), the session-FSM oracle (T8), and the attribution
    * join (X52), so the split rule can never desynchronize across them.
    * The oracle CTE chain `e → f → g` leaves every event tagged with its
    * `sid`; the Spark mirror [[sessionizedEvents]] returns the same frame. */
  private val sessionCtes: String =
    """e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
          CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
      f AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
            OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
          ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM f)"""

  /** The event stream in the shape every ordered-event operator consumes:
    * (user_id, event_id, event_type, exact epoch-micros) — ONE definition
    * of the (us, event_id) full-key ordering base. */
  private def eventsUs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))

  /** Integer-cents projection of a monetary double — the file-header
    * float-parity rule (`floor(x*100+0.5)`), shared by every spend rollup. */
  private def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 100 + lit(0.5)).cast("long")

  /** Spark mirror of [[sessionCtes]]'s `g`: every event tagged with its
    * per-user session ordinal. One user-keyed window shuffle serves the
    * lag, the running sum, and (via exchange reuse) downstream rollups.
    * Memoized per (session, dir) with a lazy DISK_ONLY checkpoint (r16,
    * same rationale as [[dupPairs]]): five registered queries
    * (sessionize_events, assoc_rules, session_attribution, range_join,
    * top_paths' family) consume this frame — a real deployment
    * materializes the sessionized log once and every downstream op
    * reads it, instead of re-running the user-window per query. */
  private def sessionizedEvents(s: SparkSession, d: String): DataFrame =
    Tables.memo(s, s"derived:sessionized_events:$d") {
      sessionizedEventsRaw(s, d).diskCheckpointLazy()
    }

  /** The un-memoized construction — exposed so PlanSpec can keep pinning
    * the one-exchange/one-sort window shape the checkpoint otherwise
    * hides behind a Scan ExistingRDD. */
  private[graft] def sessionizedEventsRaw(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eventsUs(s, d)
      .withColumn("new_s",
        when(lag(col("us"), 1).over(ord).isNull ||
          col("us") - lag(col("us"), 1).over(ord) >= lit(1800000000L), 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(run))
  }

  // ---- §2.10 streaming windows (batch-verifiable, same code path) ------
  private val streamQueries: Seq[(String, Q)] = Seq(
    "stream_tumbling" -> Q(
      (s, d) => Streamy.tumbling(Tables.events(s, d)).orderBy("wstart", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS wstart, event_type,
          count(*) AS n, sum(value) AS total
        FROM events GROUP BY 1,2 ORDER BY wstart, event_type""")),
    "stream_sliding" -> Q(
      (s, d) => Streamy.sliding(Tables.events(s, d)).orderBy("wstart", "event_type"),
      Some("""SELECT time_bucket(INTERVAL '30 minutes', ts) - k.k * INTERVAL '30 minutes' AS wstart,
          event_type, count(*) AS n, sum(value) AS total
        FROM events CROSS JOIN (VALUES (0),(1)) k(k)
        GROUP BY 1,2 ORDER BY wstart, event_type""")),
    "stream_topk" -> Q(
      // T10 [EXT]: windowed heavy hitters — hourly top-3 event types.
      // Streaming half = windowCounts (bounded per-window state);
      // finalize = windowTopk rank over the count table. Batch runs both
      // in one plan; StreamySpec drives the count half on a REAL stream
      // and applies the same finalize to the sink.
      (s, d) => Streamy.windowTopk(Streamy.windowCounts(Tables.events(s, d)))
        .orderBy("wstart", "rk"),
      Some("""WITH c AS (SELECT date_trunc('hour', ts) AS wstart, event_type,
            CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
          r AS (SELECT wstart, event_type, n,
            CAST(row_number() OVER (PARTITION BY wstart
              ORDER BY n DESC, event_type) AS BIGINT) AS rk FROM c)
        SELECT wstart, event_type, n, rk FROM r WHERE rk <= 3
        ORDER BY wstart, rk""")),
    "stream_session" -> Q(
      (s, d) => Streamy.sessions(Tables.events(s, d)).orderBy("user_id", "sstart"),
      Some("""WITH o AS (SELECT user_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        sess AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
          ROWS UNBOUNDED PRECEDING) AS sid FROM o)
        SELECT min(ts) AS sstart, user_id, count(*) AS n, sum(value) AS total
        FROM sess GROUP BY user_id, sid ORDER BY user_id, sstart""")),
    "stream_dedup" -> Q(
      // ingest exact-dedup (at-least-once repair): the doubled input must
      // collapse back to the original rows; the duplicate rows are
      // identical, so the per-key pick is deterministic. The stream path
      // (dropDuplicatesWithinWatermark, bounded state) is exercised with
      // real duplicates in StreamySpec.
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        Streamy.dedupeById(e.unionAll(e)).orderBy("event_id")
      },
      Some("""SELECT DISTINCT event_id, ts, event_type, value FROM events
        ORDER BY event_id""")),
    "state_totals" -> Q(
      // custom keyed state (mapGroupsWithState) exercised through the same
      // batch-verifiable path as the window operators; the running total is
      // rounded post-aggregation so per-group iteration order can't leak
      // into the hash compare
      (s, d) => Streamy.runningUserTotals(Tables.events(s, d)).toDF()
        .select(col("user_id"), col("n"), round(col("total"), 6).as("total_r"))
        .orderBy("user_id"),
      Some("""SELECT user_id, count(*) AS n, round(sum(value), 6) AS total_r
        FROM events GROUP BY user_id ORDER BY user_id""")),
    "session_state" -> Q(
      // T8 sessionization FSM exercised through the shared batch path
      // (complete input → trailing sessions flush); the stream path —
      // event-time timeout eviction across real micro-batches — runs in
      // StreamySpec. Oracle is the X34 window formulation, so the FSM's
      // session set is pinned to the declarative sessionizer exactly.
      (s, d) => Streamy.sessionFlush(Tables.events(s, d)).toDF()
        .select(col("user_id"), col("sstart_us"), col("send_us"),
          col("n"), col("cents"))
        .orderBy("user_id", "sstart_us"),
      Some(s"""WITH $sessionCtes
        SELECT user_id, min(us) AS sstart_us, max(us) AS send_us,
          CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS cents
        FROM g GROUP BY user_id, sid ORDER BY user_id, sstart_us""")),
    "stream_enrich" -> Q(
      // T9 stream-static enrichment through the shared batch path: events
      // enriched with a zone dimension (user → nation) and rolled up per
      // zone name. The streaming path — the same join broadcast per
      // micro-batch, no state store — runs in StreamySpec on a real
      // stream. Integer cents keep the rollup exact.
      (s, d) => {
        val dim = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
        val e = Tables.events(s, d)
          .select(col("user_id"), cents(col("value")).as("c"))
        Streamy.enrich(e, dim, "user_id", "n_nationkey")
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("cents"))
          .orderBy(col("n_name").asc_nulls_first)
      },
      Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM events LEFT JOIN nation ON user_id = n_nationkey
        GROUP BY n_name ORDER BY n_name NULLS FIRST""")),
    "stream_drift" -> Q(
      // T2-sketch: the drift monitor as a STREAMING operator — GK
      // percentile + HLL distinct sketches inside tumbling 7-day windows
      // (bounded per-window state; StreamySpec runs it on a real stream).
      // Batch path contract-oracled like the other sketch queries: exact
      // n / percentiles / distinct count are value-compared, and the
      // oracle asserts TRUE for the sketches' error bounds, measured by
      // Spark against the same stream. Window key is the epoch-aligned
      // 7-day bucket index (integer — no timezone surface on either
      // engine).
      (s, d) => {
        val acc = 1000; val rsd = 0.05
        val ev = Tables.events(s, d)
        val sk = Streamy.driftSketch(ev, accuracy = acc, rsd = rsd)
          .withColumn("wk_idx",
            (unix_timestamp(col("wstart")) / 604800L).cast("long"))
        val base = ev.select(
          floor(unix_timestamp(col("ts")) / 604800L).cast("long").as("wk_idx"),
          col("value"), col("user_id"))
        // exact side via guided selection (identical values, bounded
        // state) — a week's value buffer is the same wall as a zone's
        val exact = Extracts.joinOnZone(
            base.groupBy(col("wk_idx"))
              .agg(count_distinct(col("user_id")).as("uniq_users")),
            Extracts.guidedQuantiles(
              base.select(col("wk_idx"), col("value")), Seq(0.5, 0.95),
              Seq("q50", "q95"), zone = "wk_idx"), "wk_idx")
          .select(col("wk_idx"), round(col("q50"), 6).as("p50_r"),
            round(col("q95"), 6).as("p95_r"), col("uniq_users"))
        val ranks = base
          .join(broadcast(sk.select("wk_idx", "p50_sk", "p95_sk")), "wk_idx")
          .groupBy(col("wk_idx"))
          .agg(sum(when(col("value") <= col("p50_sk"), 1L).otherwise(0L)).as("le50"),
            sum(when(col("value") < col("p50_sk"), 1L).otherwise(0L)).as("lt50"),
            sum(when(col("value") <= col("p95_sk"), 1L).otherwise(0L)).as("le95"),
            sum(when(col("value") < col("p95_sk"), 1L).otherwise(0L)).as("lt95"))
        val accD = lit(acc.toDouble)
        sk.join(exact, "wk_idx").join(ranks, "wk_idx")
          .select(col("wk_idx"), col("n"), col("p50_r"), col("p95_r"),
            col("uniq_users"),
            (col("le50") >= floor(lit(0.5) * col("n") - col("n") / accD) &&
              col("lt50") <= ceil(lit(0.5) * col("n") + col("n") / accD) &&
              col("le95") >= floor(lit(0.95) * col("n") - col("n") / accD) &&
              col("lt95") <= ceil(lit(0.95) * col("n") + col("n") / accD) &&
              abs(col("uniq_sk") - col("uniq_users")) <= lit(3 * rsd) * col("uniq_users"))
              .as("within_bound"))
          .orderBy("wk_idx")
      },
      Some("""SELECT CAST(floor(epoch(ts)/604800) AS BIGINT) AS wk_idx,
          CAST(count(*) AS BIGINT) AS n,
          round(quantile_cont(value, 0.5), 6) AS p50_r,
          round(quantile_cont(value, 0.95), 6) AS p95_r,
          CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users,
          TRUE AS within_bound
        FROM events GROUP BY 1 ORDER BY wk_idx""")),
    "stream_interval_join" -> Q(
      // stream-stream interval join (same-user follow-on events within an
      // hour), verified through the shared batch path; the streaming path
      // (watermarked state, bounded by watermark + interval) runs in
      // StreamySpec with real micro-batches
      (s, d) => {
        val e = Tables.events(s, d)
        Streamy.intervalJoin(e, e).orderBy("src_id", "dst_id")
      },
      Some("""SELECT a.user_id, a.event_id AS src_id, b.event_id AS dst_id,
          b.event_type AS dst_type,
          epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        FROM events a JOIN events b ON a.user_id = b.user_id
          AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        ORDER BY src_id, dst_id""")),
    "asof_join" -> Q(
      // as-of join (X18): stamp every non-signup event with the user's most
      // recent signup at or before it. Spark side is the one-shuffle union +
      // running last-non-null window ([[AsOf.join]]); the oracle is DuckDB's
      // NATIVE ASOF JOIN — a genuinely independent formulation, so the
      // semantics (not just the construction) are what's pinned.
      (s, d) => {
        val e = Tables.events(s, d)
        val snaps = e.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"),
            col("value").as("snap_value"), col("event_id").as("snap_id"))
        val lefts = e.filter(col("event_type") =!= "signup")
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        AsOf.join(lefts, snaps, "user_id", "ts", Seq("snap_value", "snap_id"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("snap_id"), col("snap_value"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, l.user_id, l.event_type,
          s.snap_id, s.snap_value
        FROM (SELECT event_id, user_id, ts, event_type FROM events
              WHERE event_type <> 'signup') l
        ASOF LEFT JOIN (SELECT user_id, ts, value AS snap_value,
              event_id AS snap_id FROM events WHERE event_type = 'signup') s
          ON l.user_id = s.user_id AND l.ts >= s.ts
        ORDER BY event_id""")))

  // ---- §2.11 dedup family ---------------------------------------------
  private val dedupQueries: Seq[(String, Q)] = Seq(
    "dedup_exact" -> Q(
      (s, d) => LlmOps.dedupExact(docs(s, d)).orderBy("doc_id"),
      Some(s"""SELECT sha256($normSql) AS h, min(doc_id) AS doc_id,
          count(*) AS n_copies
        FROM documents GROUP BY h ORDER BY doc_id""")),
    "dedup_incremental" -> Q(
      // Incremental line-level dedup (X15b) — the batch-over-batch shape
      // a real ingest runs: yesterday's corpus is NOT re-deduped; its
      // line-fingerprint set lives materialized in the content-addressed
      // [[Cache]] (built once, probe-hit ever after — the X64 IVM
      // machinery applied to the C4 line rule), and today's batch checks
      // (a) the store with one join and (b) itself with one first-seen
      // window over the non-store lines. Stand-in split: even doc_ids are
      // "already ingested", odd are "today" (the fixture has line-grain
      // cross-batch duplication; doc-grain exact dups don't exist in it).
      // At 100 TB the store carries distinct lines (or their 16-byte
      // digests) and the daily cost is |batch| work, not |corpus|; the
      // oracle recomputes both counters from scratch, so what's pinned is
      // incremental == full, same invariant as X64.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val cache = new Cache(s, Cache.contentRoot("graft_dstore", d, "documents"))
        val ls = LlmOps.lines(docs(s, d))
        val store = cache.getOrCompute("line_store") {
          ls.filter(col("doc_id") % 2 === 0).select(col("line")).distinct()
        }
        val w = Window.partitionBy(col("line")).orderBy(col("doc_id"), col("idx"))
        ls.filter(col("doc_id") % 2 === 1)
          .join(store.withColumn("in_store", lit(1)), Seq("line"), "left")
          .withColumn("rn", row_number().over(w))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_lines"),
            sum(when(col("in_store") === 1, 1L).otherwise(0L)).as("n_dup_store"),
            sum(when(col("in_store").isNull && col("rn") > 1, 1L).otherwise(0L))
              .as("n_dup_batch"))
          .orderBy("doc_id")
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
          l AS (SELECT doc_id, CAST(i AS INT) AS idx,
              array_to_string(w[i*12+1 : i*12+12], ' ') AS line
            FROM n, unnest(range(CAST(ceil(len(w)/12.0) AS INT))) AS u(i)),
          store AS (SELECT DISTINCT line FROM l WHERE doc_id % 2 = 0),
          b AS (SELECT l.doc_id, l.idx, l.line, store.line IS NOT NULL AS hit
            FROM l LEFT JOIN store USING (line) WHERE l.doc_id % 2 = 1),
          r AS (SELECT doc_id, idx, hit,
              row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
            FROM b)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
          CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_store,
          CAST(sum(CASE WHEN NOT hit AND rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_dup_batch
        FROM r GROUP BY doc_id ORDER BY doc_id""")),
    "dedup_levenshtein" -> Q(
      // Edit-distance near-dup pairs (X2f): levenshtein(norm_a, norm_b)
      // <= 5 — the character-level complement to the token-level Jaccard
      // family (catches typo-variants that shingle sets miss). EXACT
      // blocking, same construction as dedup_ngram_jaccard: dist <= 5
      // forces |len_a - len_b| <= 5 < 8, so floor(len/8) bands differ by
      // at most 1; (lang, band) is an equi-key, one side probes ±1, and
      // each qualifying pair meets in exactly one bucket — byte-identical
      // to the unbanded join (LlmOpsSpec pins this). The probe side stays
      // slim (no text payload); norm text attaches to survivors by one
      // id-keyed join. The DP itself is the THRESHOLDED Spark builtin
      // (O(len·5) band DP, -1 when exceeded), not the O(len²) full matrix.
      (s, d) => {
        val base = docs(s, d)
          .withColumn("norm", LlmOps.normText(col("text")))
          .select(col("doc_id"), col("lang"), col("norm"),
            length(col("norm")).as("ln"))
          .withColumn("band", floor(col("ln") / 8))
        val a = base.select(col("doc_id").as("doc_a"), col("lang"),
          col("ln").as("la"),
          explode(array(col("band") - 1, col("band"), col("band") + 1)).as("lband"))
        val b = base.select(col("doc_id").as("doc_b"), col("lang"),
          col("ln").as("lb"), col("norm").as("nb"), col("band").as("lband"))
        val na = base.select(col("doc_id").as("doc_a"), col("norm").as("na"))
        a.join(b, Seq("lang", "lband"))
          .filter(col("doc_a") < col("doc_b") && abs(col("la") - col("lb")) <= 5)
          .join(na, Seq("doc_a"))
          // the DP is CPU-bound at ~bytes-free rows, and AQE's coalesce
          // targets serialized BYTES — it handed the whole candidate set
          // to 4 tasks at sf0.1 (1.2 s of DP wall on a 32-core pool).
          // Spread by the house width rule before the expensive per-row
          // op (no-op once the source is already wide at cluster scale).
          .repartition(LlmOps.spreadWidth(docs(s, d)))
          .withColumn("dist", levenshtein(col("na"), col("nb"), 5))
          .filter(col("dist") =!= -1)
          .select(col("doc_a"), col("doc_b"), col("dist").cast("long").as("dist"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH n AS (SELECT doc_id, lang, $normSql AS norm FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          levenshtein(a.norm, b.norm) AS dist
        FROM n a JOIN n b ON a.lang = b.lang AND a.doc_id < b.doc_id
          AND abs(length(a.norm) - length(b.norm)) <= 5
        WHERE levenshtein(a.norm, b.norm) <= 5
        ORDER BY doc_a, doc_b""")),
    "dedup_minhash" -> Q(
      // MinHash over word-bigram shingles; 8 permutations, 2 bands × 4 —
      // candidate pairs share a full 4-signature band.
      (s, d) => dupPairs(s, d).orderBy("doc_a", "doc_b"),
      Some(s"""WITH $minhashPairCtes
        SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""")),
    "dedup_clusters" -> Q(
      // duplicate-cluster resolution: connected components over the LSH
      // candidate pairs; every doc labelled with its cluster keeper (min id)
      (s, d) => dupClusters(s, d)
        .select(col("node").as("doc_id"), col("rep"))
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $minhashPairCtes,
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION ALL SELECT doc_b, doc_a FROM pairs),
        walk(node, rep) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.src, w.rep FROM edges e JOIN walk w ON e.dst = w.node)
        SELECT node AS doc_id, min(rep) AS rep FROM walk
        GROUP BY node ORDER BY doc_id""")),
    "dup_cluster_sizes" -> Q(
      // Duplicate-cluster size histogram (X60): how many clusters have k
      // members — with the degree histogram (X57), the pair of corpus-
      // health signals that distinguishes "many small dup pairs" from
      // "one boilerplate megacluster" (identical dedup rate, opposite
      // remediation). Reads the memoized CC labels; everything after is
      // aggregate-cardinality (|clusters|, then |sizes| rows).
      (s, d) => dupClusters(s, d)
        .groupBy(col("rep")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
        .orderBy("sz"),
      Some(s"""WITH RECURSIVE $minhashPairCtes,
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION ALL SELECT doc_b, doc_a FROM pairs),
        walk(node, rep) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.src, w.rep FROM edges e JOIN walk w ON e.dst = w.node),
        lab AS (SELECT node, min(rep) AS rep FROM walk GROUP BY node),
        cl AS (SELECT rep, CAST(count(*) AS BIGINT) AS sz FROM lab GROUP BY rep)
        SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters
        FROM cl GROUP BY sz ORDER BY sz""")),
    "profile_table" -> Q(
      // Table profiling (X61): per-column null count, distinct count, and
      // min/max (string-rendered) for the orders table — the schema-wide
      // health snapshot a pipeline runs before trusting an input drop
      // (what Deequ/dbt tests compute). The profile is GENERATED from the
      // column list: one aggregate row per table in a single pass (all
      // columns' aggregates fused into one HashAggregate), then a
      // stack/melt to long form — no per-column scans. Double min/max
      // render as integer CENTS (the house float-parity rule) — double→
      // string rendering is the one thing the two engines format
      // differently, so floats never render directly.
      (s, d) => {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderpriority")
        val o = Tables.orders(s, d)
        def render(c: String) = o.schema(c).dataType match {
          case org.apache.spark.sql.types.DoubleType =>
            (x: org.apache.spark.sql.Column) => cents(x).cast("string")
          case _ => (x: org.apache.spark.sql.Column) => x.cast("string")
        }
        // pass 1: every non-distinct aggregate fused into ONE map-side-
        // combinable row (N distinct aggregates fused globally instead
        // plan an Expand whose every copy funnels into a single group —
        // measured 8 s at sf0.1, the wrong shape)
        val simpleAggs = cols.flatMap { c =>
          val r = render(c)
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
            r(min(col(c))).as(s"${c}__min"), r(max(col(c))).as(s"${c}__max"))
        }
        val one = o.agg(simpleAggs.head, simpleAggs.tail: _*)
        val stacked = cols.map(c =>
          s"'$c', `${c}__nulls`, `${c}__min`, `${c}__max`").mkString(", ")
        val simple = one.selectExpr(
          s"stack(${cols.length}, $stacked) AS (col_name, n_nulls, min_s, max_s)")
        // pass 2: distinct counts over the melted (col_name, value) frame —
        // the col_name grouping key keeps the distinct aggregation
        // partitioned instead of global. The distinct is of the RENDERED
        // value — for doubles that is distinct CENTS, the profile's
        // declared semantic (raw-double distinct would hinge on sub-cent
        // noise) — and the oracle mirrors the same rendering.
        val long = cols.map(c =>
            o.select(lit(c).as("col_name"), render(c)(col(c)).as("v")))
          .reduce(_.unionByName(_))
        val distincts = long.groupBy(col("col_name"))
          .agg(count_distinct(col("v")).as("n_distinct"))
        simple.join(distincts, Seq("col_name"))
          .select(col("col_name"), col("n_nulls"), col("n_distinct"),
            col("min_s"), col("max_s"))
          .orderBy("col_name")
      },
      Some("""WITH a AS (SELECT
            CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_n,
            CAST(count(DISTINCT o_orderkey) AS BIGINT) AS k_d,
            CAST(min(o_orderkey) AS VARCHAR) AS k_mn, CAST(max(o_orderkey) AS VARCHAR) AS k_mx,
            CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_n,
            CAST(count(DISTINCT o_custkey) AS BIGINT) AS c_d,
            CAST(min(o_custkey) AS VARCHAR) AS c_mn, CAST(max(o_custkey) AS VARCHAR) AS c_mx,
            CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_n,
            CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS s_d,
            min(o_orderstatus) AS s_mn, max(o_orderstatus) AS s_mx,
            CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t_n,
            CAST(count(DISTINCT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS t_d,
            CAST(CAST(floor(min(o_totalprice) * 100 + 0.5) AS BIGINT) AS VARCHAR) AS t_mn,
            CAST(CAST(floor(max(o_totalprice) * 100 + 0.5) AS BIGINT) AS VARCHAR) AS t_mx,
            CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_n,
            CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS p_d,
            min(o_orderpriority) AS p_mn, max(o_orderpriority) AS p_mx
          FROM orders)
        SELECT 'o_custkey' AS col_name, c_n AS n_nulls, c_d AS n_distinct, c_mn AS min_s, c_mx AS max_s FROM a
        UNION ALL SELECT 'o_orderkey', k_n, k_d, k_mn, k_mx FROM a
        UNION ALL SELECT 'o_orderpriority', p_n, p_d, p_mn, p_mx FROM a
        UNION ALL SELECT 'o_orderstatus', s_n, s_d, s_mn, s_mx FROM a
        UNION ALL SELECT 'o_totalprice', t_n, t_d, t_mn, t_mx FROM a
        ORDER BY col_name""")),
    "data_constraints" -> Q(
      // Constraint audit (X62): Deequ-style rule evaluation — each rule
      // yields (rule, n_violations) and the frame is the audit report a
      // pipeline gates a drop on. Rules: primary-key uniqueness,
      // referential integrity (lineitem→orders), domain membership,
      // value range, non-negativity. Each rule is one aggregate (or one
      // anti-join for the FK) over a shared scan; outputs are exact
      // integers; zero rows violated = healthy fixture, and the spec
      // injects violations to prove the rules actually fire.
      (s, d) => {
        val o = Tables.orders(s, d); val li = Tables.lineitem(s, d)
        val pkDup = o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
          .filter(col("n") > 1).agg(count(lit(1)).as("v"))
        // NULL-safe on both sides: the rule audits NON-NULL keys without a
        // parent (NULL keys are the nullability rule's business, and
        // DuckDB's NOT IN would silently zero the count if any NULL crept
        // into either column — the oracle uses NOT EXISTS for the same
        // reason)
        val fkOrphans = li.select(col("l_orderkey"))
          .filter(col("l_orderkey").isNotNull)
          .join(o.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("v"))
        val domain = o.agg(sum(when(
          !col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L)).as("v"))
        val range = o.agg(sum(when(
          col("o_totalprice") <= 0 || col("o_totalprice") > 1000000, 1L)
          .otherwise(0L)).as("v"))
        val nonneg = li.agg(sum(when(col("l_quantity") < 0, 1L).otherwise(0L)).as("v"))
        def tag(df: DataFrame, rule: String) =
          df.select(lit(rule).as("rule"), col("v").cast("long").as("n_violations"))
        tag(pkDup, "pk_unique_o_orderkey")
          .unionByName(tag(fkOrphans, "fk_lineitem_orders"))
          .unionByName(tag(domain, "domain_o_orderstatus"))
          .unionByName(tag(range, "range_o_totalprice"))
          .unionByName(tag(nonneg, "nonneg_l_quantity"))
          .orderBy("rule")
      },
      Some("""SELECT 'domain_o_orderstatus' AS rule,
          CAST((SELECT sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END)
            FROM orders) AS BIGINT) AS n_violations
        UNION ALL SELECT 'fk_lineitem_orders',
          CAST((SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
        UNION ALL SELECT 'nonneg_l_quantity',
          CAST((SELECT sum(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END)
            FROM lineitem) AS BIGINT)
        UNION ALL SELECT 'pk_unique_o_orderkey',
          CAST((SELECT count(*) FROM (SELECT o_orderkey FROM orders
            GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT)
        UNION ALL SELECT 'range_o_totalprice',
          CAST((SELECT sum(CASE WHEN o_totalprice <= 0 OR o_totalprice > 1000000
            THEN 1 ELSE 0 END) FROM orders) AS BIGINT)
        ORDER BY rule""")),
    "dedup_simhash" -> Q(
      (s, d) => LlmOps.simhash16(docs(s, d), "doc_id", "text").orderBy("doc_id"),
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        tok AS (SELECT doc_id, word FROM n, unnest(w) AS t(word)),
        bits AS (SELECT doc_id, j,
          CASE WHEN ((strpos('0123456789abcdef',
              substring(md5(word), 1 + CAST(floor(j/4) AS INT), 1)) - 1) >> (j % 4)) & 1 = 1
            THEN 1 ELSE -1 END AS contrib
        FROM tok, unnest(range(16)) AS b(j)),
        perbit AS (SELECT doc_id, j,
          CASE WHEN sum(contrib) >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
        FROM bits GROUP BY doc_id, j)
        SELECT doc_id, CAST(sum(bit << j) AS BIGINT) AS simhash
        FROM perbit GROUP BY doc_id ORDER BY doc_id""")),
    "dedup_simhash_pairs" -> Q(
      // SimHash near-dup PAIRS (X2b completed as an actual dedup): a
      // 60-bit token-vote simhash (sign-safe in a 64-bit long on both
      // engines) banded 4 × 15 bits for LSH candidates — by pigeonhole,
      // any pair within hamming distance 3 leaves at least one of the 4
      // bands untouched, so recall is EXACTLY 1 at the hd ≤ 3 gate (not
      // probabilistic like MinHash banding); the exact confirm is
      // bit_count(xor) on the full hashes. Candidate fan per band cell is
      // bounded by the 2¹⁵-bucket hash space. The |docs|-row hash frame
      // is localCheckpointed — its three consumers (band explode, both
      // pair-side attaches) would each re-run the token × bit explode
      // otherwise.
      (s, d) => {
        val sh = LlmOps.simhashBits(docs(s, d), "doc_id", "text", 60)
          .diskCheckpoint()
        val banded = sh.select(col("doc_id"), explode(expr(
            """transform(sequence(0, 3), k -> named_struct(
               'band', k, 'cell', shiftright(simhash, k * 15) & 32767))"""))
            .as("bc"))
          .select(col("doc_id"), col("bc.band").as("band"), col("bc.cell").as("cell"))
        // every join side below derives from the CHECKPOINTED hash frame,
        // whose LogicalRDD stats are per-row ESTIMATES — corpus-
        // proportional frames (|docs| and |docs|×4 rows) that the planner
        // would otherwise broadcast (measured BuildRight at sf0.1; a
        // 16 GB broadcast at 10⁹ docs). shuffle_hash encodes the
        // no-broadcast decision; see SCALE.md's LogicalRDD-stats lesson.
        val cand = banded.select(col("doc_id").as("doc_a"), col("band"), col("cell"))
          .join(banded.select(col("doc_id").as("doc_b"), col("band"), col("cell"))
            .hint("shuffle_hash"), Seq("band", "cell"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct()
        cand
          .join(sh.select(col("doc_id").as("doc_a"), col("simhash").as("ha"))
            .hint("shuffle_hash"), Seq("doc_a"))
          .join(sh.select(col("doc_id").as("doc_b"), col("simhash").as("hb"))
            .hint("shuffle_hash"), Seq("doc_b"))
          .withColumn("hd", expr("bit_count(ha ^ hb)").cast("int"))
          .filter(col("hd") <= 3)
          .select(col("doc_a"), col("doc_b"), col("hd"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
          tok AS (SELECT doc_id, word FROM n, unnest(w) AS t(word)),
          bits AS (SELECT doc_id, j,
            CASE WHEN ((strpos('0123456789abcdef',
                substring(md5(word), 1 + CAST(floor(j/4) AS INT), 1)) - 1) >> (j % 4)) & 1 = 1
              THEN 1 ELSE -1 END AS contrib
          FROM tok, unnest(range(60)) AS b(j)),
          perbit AS (SELECT doc_id, j,
            CASE WHEN sum(contrib) >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
          FROM bits GROUP BY doc_id, j),
          sh AS (SELECT doc_id, CAST(sum(bit << j) AS BIGINT) AS simhash
            FROM perbit GROUP BY doc_id),
          banded AS (SELECT doc_id, k AS band,
              (simhash >> (k * 15)) & 32767 AS cell
            FROM sh, unnest(range(4)) AS kk(k)),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.cell = b.cell AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
          CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hd
        FROM cand
          JOIN sh sa ON sa.doc_id = cand.doc_a
          JOIN sh sb ON sb.doc_id = cand.doc_b
        WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
        ORDER BY doc_a, doc_b""")),
    "dedup_ngram_jaccard" -> Q(
      (s, d) => ngramJaccardPairs(s, d).orderBy("doc_a", "doc_b"),
      Some(s"""WITH $ngramJaccardCtes
        SELECT doc_a, doc_b, jaccard FROM jpairs ORDER BY doc_a, doc_b""")),
    "dedup_ngram_jaccard_topk" -> Q(
      // Bounded-output companion to the pair LISTING above (round-13
      // verdict #4): per-doc top-3 most-similar neighbors by character-
      // trigram Jaccard. Candidate generation is the identical
      // (lang, length-band) blocked join ([[ngramJaccardPairs]]); the
      // OUTPUT is <= 3 rows per doc at ANY duplication factor — the
      // WindowGroupLimit rank pattern (hard_negatives), which is what
      // lets the 10x oracle gate run where the raw listing's output is
      // quadratic by semantics. Pairs symmetrize first (each doc ranks
      // neighbors from BOTH sides of the a<b listing); ties break on
      // neighbor id for cross-engine determinism.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val p = ngramJaccardPairs(s, d)
        val sym = p.select(col("doc_a").as("doc_id"), col("doc_b").as("nbr"),
            col("jaccard"))
          .unionAll(p.select(col("doc_b").as("doc_id"), col("doc_a").as("nbr"),
            col("jaccard")))
        sym.withColumn("rn", row_number().over(
            Window.partitionBy(col("doc_id"))
              .orderBy(col("jaccard").desc, col("nbr").asc)).cast("int"))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("rn"), col("nbr"), col("jaccard"))
          .orderBy("doc_id", "rn")
      },
      Some(s"""WITH $ngramJaccardCtes,
        jsym AS (SELECT doc_a AS doc_id, doc_b AS nbr, jaccard FROM jpairs
                 UNION ALL
                 SELECT doc_b, doc_a, jaccard FROM jpairs)
        SELECT doc_id, CAST(rn AS INT) AS rn, nbr, jaccard FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY jaccard DESC, nbr ASC) AS rn FROM jsym) t
        WHERE rn <= 3 ORDER BY doc_id, rn""")),
    "dedup_embed_cosine" -> Q(
      // Embedding near-dup pair LISTING over [[embedDupPairs]] (sign-LSH
      // banding + exact cosine gate). NB output semantics: a duplicated
      // corpus lists pairs quadratically in the duplication factor —
      // that's the measured 1.25 exponent in SCALE.md, a property of the
      // LISTING, not the candidate generation; the bounded-output
      // companion is dedup_embed_clusters below (CC labels, |vectors|
      // rows at any duplication).
      (s, d) => embedDupPairs(s, d).orderBy("vec_a", "vec_b"),
      Some(s"""WITH $embedPairCtes
        SELECT vec_a, vec_b, cos_r FROM epairs ORDER BY vec_a, vec_b""")),
    "dedup_embed_cosine_topk" -> Q(
      // Bounded-output companion to the embedding pair LISTING (round-13
      // verdict #4): per-vector top-3 nearest near-dup neighbors from the
      // same sign-LSH + cosine-gate candidate pairs. Output is <= 3 rows
      // per vector at ANY duplication factor (WindowGroupLimit rank, like
      // dedup_ngram_jaccard_topk), so this row is 10x-gateable where the
      // raw listing's output is quadratic by semantics. Symmetrize, rank
      // by cosine desc with neighbor-id tie-break.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val p = embedDupPairs(s, d)
        val sym = p.select(col("vec_a").as("vec_id"), col("vec_b").as("nbr"),
            col("cos_r"))
          .unionAll(p.select(col("vec_b").as("vec_id"), col("vec_a").as("nbr"),
            col("cos_r")))
        sym.withColumn("rn", row_number().over(
            Window.partitionBy(col("vec_id"))
              .orderBy(col("cos_r").desc, col("nbr").asc)).cast("int"))
          .filter(col("rn") <= 3)
          .select(col("vec_id"), col("rn"), col("nbr"), col("cos_r"))
          .orderBy("vec_id", "rn")
      },
      Some(s"""WITH $embedPairCtes,
        esym AS (SELECT vec_a AS vec_id, vec_b AS nbr, cos_r FROM epairs
                 UNION ALL
                 SELECT vec_b, vec_a, cos_r FROM epairs)
        SELECT vec_id, CAST(rn AS INT) AS rn, nbr, cos_r FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY cos_r DESC, nbr ASC) AS rn FROM esym) t
        WHERE rn <= 3 ORDER BY vec_id, rn""")),
    "dedup_embed_clusters" -> Q(
      // Bounded-output embedding dedup (r6 verdict task #9): the same
      // sign-LSH + cosine-gate candidate pairs, resolved to duplicate-
      // cluster labels by pointer-jumping connected components — output
      // is ONE row per vector (node → min-id keeper) no matter how
      // duplicated the corpus is, which is what a purge/retention
      // pipeline actually consumes (the SCALE.md recommendation for the
      // pair listing's 1.25 output exponent, previously advice-only,
      // now a wired path mirroring the text-side dedup_clusters —
      // including its label-frame memo, [[embedClusters]]).
      (s, d) => embedClusters(s, d).orderBy("vec_id"),
      Some(s"""WITH RECURSIVE $embedPairCtes,
        eedges AS (SELECT vec_a AS src, vec_b AS dst FROM epairs
                   UNION ALL SELECT vec_b, vec_a FROM epairs),
        ewalk(node, rep) AS (
          SELECT vec_id, vec_id FROM embeddings
          UNION
          SELECT e.src, w.rep FROM eedges e JOIN ewalk w ON e.dst = w.node)
        SELECT node AS vec_id, min(rep) AS rep FROM ewalk
        GROUP BY node ORDER BY vec_id""")),
    "dedup_lines" -> Q(
      // X15 corpus-wide line-level exact dedup (the C4 rule): first
      // occurrence in (doc, position) order keeps each 12-word line, all
      // later occurrences — cross-doc or within-doc — are dropped; the
      // surviving text is re-joined in document order. One shuffle on line
      // content, one regroup on doc id ([[LlmOps.lineDedup]]).
      (s, d) => LlmOps.lineDedup(docs(s, d)).orderBy("doc_id"),
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        l AS (SELECT doc_id, CAST(i AS INT) AS idx,
            array_to_string(w[i*12+1 : i*12+12], ' ') AS line
          FROM n, unnest(range(CAST(ceil(len(w)/12.0) AS INT))) AS u(i)),
        k AS (SELECT doc_id, idx, line,
            row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) = 1 AS kept
          FROM l)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
          CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          coalesce(string_agg(CASE WHEN kept THEN line END, ' ' ORDER BY idx), '')
            AS kept_text
        FROM k GROUP BY doc_id ORDER BY doc_id""")),
    "dedup_spans" -> Q(
      // X15d ExactSubstr-style duplicated-SPAN extraction (the output
      // shape of suffix-array substring dedup — "Deduplicating Training
      // Data Makes Language Models Better", Lee et al. 2022;
      // Spark-shaped): [[repeated_ngrams]] (X15c) reports the
      // duplication *fraction* per doc; this op emits the actual maximal
      // word spans a cutting pass would remove. A 5-word sliding gram is
      // duplicated when it occurs ≥ 2 times corpus-wide (total
      // occurrences, so within-doc repeats count — ExactSubstr's
      // "appears more than once in the corpus"); runs of consecutive
      // duplicated gram positions merge into maximal spans via
      // gaps-and-islands (pos − row_number per doc), re-textualized from
      // the doc's own word array. Scale shape: one (doc, pos, gram)
      // explode (linear in corpus tokens), one gram-frequency aggregate
      // (vocabulary-grain, map-side combinable — NOT (gram, doc) grain,
      // the vocab_top decade-4 lesson), one join back of only the
      // duplicated positions, one per-doc window (state bounded by doc
      // length) and one doc-grain join for the span text — nothing
      // corpus-squared, output bounded by input positions.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val (w, spans) = spanFrames(s, d)
        spans.join(w, Seq("doc_id"))
          .withColumn("span_idx", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("start_word"))).cast("int"))
          .select(col("doc_id"), col("span_idx"),
            col("start_word").cast("int").as("start_word"),
            col("len_words").cast("int").as("len_words"),
            expr("array_join(slice(__w, start_word + 1, len_words), ' ')")
              .as("span_text"))
          .orderBy("doc_id", "span_idx")
      },
      Some(s"""WITH $spansCtes
        SELECT sp.doc_id,
          CAST(row_number() OVER (PARTITION BY sp.doc_id ORDER BY start_word) AS INT)
            AS span_idx,
          CAST(start_word AS INT) AS start_word,
          CAST(len_words AS INT) AS len_words,
          array_to_string(w[start_word + 1 : start_word + len_words], ' ')
            AS span_text
        FROM sp JOIN n ON sp.doc_id = n.doc_id
        ORDER BY sp.doc_id, span_idx""")),
    "dedup_spans_cut" -> Q(
      // X15e: the ExactSubstr ACTION — cut every duplicated span
      // ([[spanFrames]]) and emit the surviving text, the dedup_lines
      // kept_text shape at span grain. The cut is doc-local: the doc's
      // own span list (bounded by doc length) gathers in one doc-grain
      // aggregate, and a per-row array filter drops the covered word
      // positions — no per-position shuffle beyond the substrate's.
      (s, d) => {
        val (w, spans) = spanFrames(s, d)
        val agg = spans.groupBy(col("doc_id")).agg(
          count(lit(1)).as("n_spans"),
          collect_list(struct(col("start_word").as("s"),
            col("len_words").as("l"))).as("__sp"))
        w.join(agg, Seq("doc_id"), "left")
          .withColumn("__kept", expr(
            """CASE WHEN __w IS NULL THEN array()
               ELSE filter(sequence(0, size(__w) - 1),
                 i -> isnull(__sp) OR NOT exists(__sp,
                   p -> i >= p.s AND i < p.s + p.l)) END"""))
          .select(col("doc_id"),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"),
            expr("CAST(CASE WHEN __w IS NULL THEN 0 ELSE size(__w) END AS BIGINT)")
              .as("n_words"),
            expr("""CAST(CASE WHEN __w IS NULL THEN 0 ELSE size(__w) END
                    - size(__kept) AS BIGINT)""").as("n_cut_words"),
            expr("array_join(transform(__kept, i -> element_at(__w, i + 1)), ' ')")
              .as("kept_text"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $spansCtes,
          cov AS (SELECT doc_id, start_word + j AS pos
            FROM sp, unnest(range(len_words)) AS u(j)),
          spc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
            FROM sp GROUP BY 1),
          posn AS (SELECT n.doc_id, CAST(i AS INT) AS pos, w[i+1] AS word
            FROM n, unnest(range(coalesce(len(w), 0))) AS u(i)),
          kept AS (SELECT p.doc_id, p.pos, p.word FROM posn p
            LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.pos = c.pos
            WHERE c.pos IS NULL),
          ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
              coalesce(string_agg(word, ' ' ORDER BY pos), '') AS kept_text
            FROM kept GROUP BY doc_id)
        SELECT n.doc_id,
          coalesce(spc.n_spans, 0) AS n_spans,
          CAST(coalesce(len(n.w), 0) AS BIGINT) AS n_words,
          CAST(coalesce(len(n.w), 0) AS BIGINT) - coalesce(ka.n_kept, 0)
            AS n_cut_words,
          coalesce(ka.kept_text, '') AS kept_text
        FROM n LEFT JOIN spc USING (doc_id) LEFT JOIN ka USING (doc_id)
        ORDER BY n.doc_id""")),
    "repeated_ngrams" -> Q(
      // Sliding-window repeated-substring signal (X15c, the Spark-shaped
      // stand-in for suffix-array substring dedup): fraction of a doc's
      // DISTINCT 5-word grams that occur in ≥2 docs corpus-wide. The
      // sliding window catches duplication the fixed 12-word line
      // chunking (X15) misses when repeats don't align to chunk
      // boundaries. Scale shape: one distinct (doc, gram) explode
      // (bounded ~len row amplification), one gram-frequency aggregate
      // (map-side combinable, gram-vocabulary-sized shuffle), one join
      // back — nothing corpus-squared; doc-frequency ≥ 2 is computed on
      // the DISTINCT pairs so a within-doc repeat never self-counts.
      (s, d) => {
        val base = docs(s, d)
        // native O(len) 5-gram walk (r16): the interpreted transform/
        // slice/array_join lambda allocated a fresh array + string build
        // per gram; word_ngrams emits zero-copy byte slices (sub-5-word
        // docs yield array() in both forms, so the explode row set is
        // unchanged)
        val g = base.repartition(LlmOps.spreadWidth(base))
          .select(col("doc_id"), explode(graft.functions.native
            .word_ngrams(LlmOps.normText(col("text")), 5)).as("gram"))
          .distinct()
          // two consumers (df rollup + join back) re-ran the explode +
          // distinct without this sever: lazy DISK_ONLY per the corpus-
          // sized shared-frame policy (r16; same rationale as tfidf's tf)
          .diskCheckpointLazy()
        val dfc = g.groupBy(col("gram")).agg(count(lit(1)).as("df"))
        val per = g.join(dfc, Seq("gram"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_rep"))
        base.select(col("doc_id")).join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_grams"), lit(0L)).as("n_grams"),
            coalesce(col("n_rep"), lit(0L)).as("n_rep"))
          .withColumn("rep_frac",
            when(col("n_grams") === 0, lit(0.0))
              .otherwise(round(col("n_rep").cast("double") / col("n_grams"), 6)))
          .orderBy("doc_id")
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
          sh AS (SELECT DISTINCT doc_id, array_to_string(w[i+1:i+5], ' ') AS gram
            FROM n, unnest(range(greatest(len(w) - 4, 0))) AS u(i)),
          dfc AS (SELECT gram, count(*) AS df FROM sh GROUP BY 1),
          per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
              CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rep
            FROM sh JOIN dfc USING (gram) GROUP BY doc_id)
        SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
          coalesce(n_rep, 0) AS n_rep,
          CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0
            ELSE round(CAST(n_rep AS DOUBLE) / n_grams, 6) END AS rep_frac
        FROM documents d LEFT JOIN per USING (doc_id)
        ORDER BY doc_id""")))

  // ---- §2.11 similarity search ----------------------------------------
  /** Candidate scope: "all" = brute force over the corpus, "same" = the
    * query's own IVF cell (same label), "diff" = OTHER labels only (the
    * hard-negative mining scope — nearest vectors that are NOT the
    * query's class). */
  private def topkDf(s: SparkSession, d: String, scope: String): DataFrame = {
    val e = emb(s, d)
    val q = e.filter(col("vec_id") % 50 === 0).toDF("qid", "qlabel", "qv", "qn")
    val joined = scope match {
      case "same" => q.join(e, col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
      case "diff" => q.join(e, col("label") =!= col("qlabel"))
      case _ => q.join(e, col("vec_id") =!= col("qid"))
    }
    import org.apache.spark.sql.expressions.Window
    joined
      .withColumn("cos_r",
        round(LlmOps.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos_r").desc, col("vec_id").asc)))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("rn"), col("vec_id").as("cand"), col("cos_r"))
      .orderBy("qid", "rn")
  }
  private def topkSql(joinCond: String): String =
    s"""WITH e AS ($embSql),
      q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e WHERE vec_id % 50 = 0),
      sims AS (SELECT q.qid, c.vec_id AS cand,
        round(list_sum(list_transform(range(len(q.qv)), i -> q.qv[i+1]*c.v[i+1])) /
          (sqrt(list_sum(list_transform(q.qv, x -> x*x))) *
           sqrt(list_sum(list_transform(c.v, x -> x*x)))), 6) AS cos_r
        FROM q JOIN e c ON $joinCond)
      SELECT qid, CAST(rn AS INT) AS rn, cand, cos_r FROM (
        SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cand ASC) AS rn
        FROM sims) t
      WHERE rn <= 5 ORDER BY qid, rn"""

  private val simQueries: Seq[(String, Q)] = Seq(
    "sim_rrf" -> Q(
      // Reciprocal-rank fusion (X46): fuse two retrievers — cosine and
      // Euclidean top-10 — by RRF (Σ 1/(60+rank)), the standard hybrid-
      // search combiner. Both rankings derive from ONE dot-product pass
      // (L2² = |q|²+|c|²−2·dot reuses the norms and the dot), so the
      // marginal cost over sim_topk is two rank windows on the same
      // partitioning (Spark plans one sort per ordering, same exchange).
      // Brute O(Q·N) candidate generation — the declared baseline, like
      // sim_topk; the IVF family is the scale path for candidates. Both
      // distances round to 6 decimals BEFORE ranking, the fused score
      // rounds before the final rank, ties break on candidate id — so
      // both engines make identical decisions at every stage.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = emb(s, d)
        val q = e.filter(col("vec_id") % 50 === 0).toDF("qid", "qlabel", "qv", "qn")
        val pairs = q.join(e, col("vec_id") =!= col("qid"))
          .withColumn("dot", LlmOps.dot(col("qv"), col("v")))
          .withColumn("cos_r", round(col("dot") / (col("qn") * col("nrm")), 6))
          .withColumn("l2_r", round(
            col("qn") * col("qn") + col("nrm") * col("nrm") - lit(2.0) * col("dot"), 6))
        val wc = Window.partitionBy(col("qid")).orderBy(col("cos_r").desc, col("vec_id").asc)
        val wl = Window.partitionBy(col("qid")).orderBy(col("l2_r").asc, col("vec_id").asc)
        val wf = Window.partitionBy(col("qid")).orderBy(col("rrf_r").desc, col("vec_id").asc)
        pairs
          .withColumn("rc", row_number().over(wc))
          .withColumn("rl", row_number().over(wl))
          .filter(col("rc") <= 10 || col("rl") <= 10)
          .withColumn("rrf_r", round(
            when(col("rc") <= 10, lit(1.0) / (col("rc") + 60)).otherwise(lit(0.0)) +
            when(col("rl") <= 10, lit(1.0) / (col("rl") + 60)).otherwise(lit(0.0)), 6))
          .withColumn("rk", row_number().over(wf).cast("long"))
          .filter(col("rk") <= 5)
          .select(col("qid"), col("rk"), col("vec_id").as("cand"), col("rrf_r"))
          .orderBy("qid", "rk")
      },
      Some(s"""WITH e AS ($embSql),
          q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 50 = 0),
          p AS (SELECT q.qid, c.vec_id AS cand,
              list_sum(list_transform(range(len(q.qv)), i -> q.qv[i+1]*c.v[i+1])) AS dot,
              sqrt(list_sum(list_transform(q.qv, x -> x*x))) AS qn,
              sqrt(list_sum(list_transform(c.v, x -> x*x))) AS cn
            FROM q JOIN e c ON c.vec_id != q.qid),
          r AS (SELECT qid, cand, round(dot / (qn*cn), 6) AS cos_r,
              round(qn*qn + cn*cn - CAST(2.0 AS DOUBLE)*dot, 6) AS l2_r FROM p),
          rnk AS (SELECT qid, cand,
              row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cand ASC) AS rc,
              row_number() OVER (PARTITION BY qid ORDER BY l2_r ASC, cand ASC) AS rl
            FROM r),
          f AS (SELECT qid, cand,
              round(CASE WHEN rc <= 10 THEN CAST(1.0 AS DOUBLE)/(rc+60) ELSE 0 END +
                    CASE WHEN rl <= 10 THEN CAST(1.0 AS DOUBLE)/(rl+60) ELSE 0 END, 6) AS rrf_r
            FROM rnk WHERE rc <= 10 OR rl <= 10)
        SELECT qid, rk, cand, rrf_r FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY qid
              ORDER BY rrf_r DESC, cand ASC) AS BIGINT) AS rk FROM f) t
        WHERE rk <= 5 ORDER BY qid, rk""")),
    "sim_topk" -> Q(
      (s, d) => topkDf(s, d, "all"),
      Some(topkSql("c.vec_id != q.qid"))),
    "sim_topk_ivf" -> Q(
      (s, d) => topkDf(s, d, "same"),
      Some(topkSql("c.label = q.qlabel AND c.vec_id != q.qid"))),
    "hard_negatives" -> Q(
      // Hard-negative mining (X3e) — contrastive-training data prep: for
      // each query vector, the top-5 MOST similar vectors of a DIFFERENT
      // class. Same declared-O(Q·N) baseline shape as sim_topk (native
      // codegen'd dot product, WindowGroupLimit rank); at scale the IVF
      // family applies unchanged — probe the nearest cells, drop same-
      // label candidates at the cell list (the label filter composes with
      // any candidate generator because it's a per-pair predicate).
      (s, d) => topkDf(s, d, "diff"),
      Some(topkSql("c.label != q.qlabel"))),
    "sim_topk_ivf_walsh" -> Q(
      // Full IVF mechanics with a DETERMINISTIC, SQL-expressible coarse
      // quantizer: cells = 3 Walsh sign bits (8 cells), centroids = the
      // per-cell mean vector, search ranks cells per query by (rounded)
      // L2 centroid distance and probes the best 2 — i.e. exactly the
      // ivfSearch shape whose KMeans sibling can't be oracled. Centroid
      // build is dimension-exploded aggregation (one shuffle); the 8-row
      // centroid table broadcasts.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // no checkpoint: the cell assignment is one native codegen'd pass
        // over the scan, so the three consumers (centroid build, query
        // side, probe join) re-derive it from pruned parquet scans —
        // at corpus scale re-scanning beats materializing vector payloads
        val assigned = emb(s, d)
          .withColumn("cell", graft.functions.native.walsh_sign_bits(col("v"), 3))
        val cent = assigned
          .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
          .groupBy(col("cell"), col("i")).agg(avg(col("x")).as("m"))
          .groupBy(col("cell"))
          .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("sm"))
          .select(col("cell"), expr("transform(sm, s -> s.m)").as("cvec"))
        val q = assigned.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
        val probe = q.crossJoin(broadcast(cent))
          .withColumn("d_r", round(expr(
            """aggregate(zip_with(qv, cvec, (a, b) -> (a - b) * (a - b)),
               CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"""), 6))
          .withColumn("crn", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("d_r").asc, col("cell").asc)))
          .filter(col("crn") <= 2)
          .select(col("qid"), col("qv"), col("qn"), col("cell"))
        probe.join(assigned, Seq("cell"))
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("cos_r",
            round(LlmOps.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("cos_r").desc, col("vec_id").asc)))
          .filter(col("rn") <= 5)
          .select(col("qid"), col("rn"), col("vec_id").as("cand"), col("cos_r"))
          .orderBy("qid", "rn")
      },
      Some(s"""WITH e AS ($embSql),
        a AS (SELECT vec_id, v,
            (CASE WHEN list_sum(list_transform(range(len(v)), i -> v[i+1] * (1 - 2*((i // 1) % 2)))) >= 0 THEN 1 ELSE 0 END)
          + (CASE WHEN list_sum(list_transform(range(len(v)), i -> v[i+1] * (1 - 2*((i // 2) % 2)))) >= 0 THEN 2 ELSE 0 END)
          + (CASE WHEN list_sum(list_transform(range(len(v)), i -> v[i+1] * (1 - 2*((i // 4) % 2)))) >= 0 THEN 4 ELSE 0 END) AS cell
        FROM e),
        dims AS (SELECT cell, i, avg(val) AS m
          FROM (SELECT cell, unnest(range(len(v))) AS i, unnest(v) AS val
                FROM a)
          GROUP BY cell, i),
        cent AS (SELECT cell, list(m ORDER BY i) AS cvec FROM dims GROUP BY cell),
        qd AS (SELECT q.vec_id AS qid, q.v AS qv, c.cell,
            round(list_sum(list_transform(range(len(q.v)),
              i -> (q.v[i+1] - c.cvec[i+1]) * (q.v[i+1] - c.cvec[i+1]))), 6) AS d_r
          FROM a q CROSS JOIN cent c WHERE q.vec_id % 50 = 0),
        probe AS (SELECT qid, qv, cell FROM (
          SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d_r ASC, cell ASC) AS crn
          FROM qd) t WHERE crn <= 2),
        sims AS (SELECT p.qid, c.vec_id AS cand,
            round(list_sum(list_transform(range(len(p.qv)), i -> p.qv[i+1]*c.v[i+1])) /
              (sqrt(list_sum(list_transform(p.qv, x -> x*x))) *
               sqrt(list_sum(list_transform(c.v, x -> x*x)))), 6) AS cos_r
          FROM probe p JOIN a c ON c.cell = p.cell AND c.vec_id != p.qid)
        SELECT qid, CAST(rn AS INT) AS rn, cand, cos_r FROM (
          SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cand ASC) AS rn
          FROM sims) t
        WHERE rn <= 5 ORDER BY qid, rn""")),
    // Contract oracle for the KMeans IVF pipeline (the one query family
    // KMeans keeps out of DuckDB): whatever candidate set IVF emits, its
    // VALUES are exactly recomputable — so run the real pipeline, join
    // the emitted (qid, cand) pairs back to a FRESH read of the
    // embeddings parquet (pipeline-independent columns), and assert per
    // query: all 5 slots filled, every emitted cos_r equal to the
    // source-recomputed cosine, and ranks 1..n contiguous with
    // non-increasing cosine. The oracle recomputes the query-id set
    // (vec_id % 50) and asserts the three contract booleans TRUE — a
    // Spark-side false (or a short/dup qid list) hash-mismatches.
    // Ranking QUALITY stays covered by the IvfSpec recall gates
    // (recall@5 ≥ 0.6 at THIS 4-of-8-probe setting at sf0.001 AND
    // sf0.01; DriveIvfProbe's curve shows probe fraction, not corpus
    // size, governs recall). Same sketch-family pattern as
    // extract_percentile_sketch's bound gate (ops/Extracts.scala).
    //
    // Since round 7 the registered `sim_topk_ivf_kmeans` row ITSELF
    // emits this contract output (r6 verdict task #8: zero `no_oracle`
    // rows in CORRECTNESS); the raw top-k listing API remains
    // LlmOps.ivfSearch, exercised by IvfSpec and by this builder, and
    // `sim_topk_ivf_check` stays registered as the historical alias.
    "sim_topk_ivf_kmeans" -> ivfKmeansContractQ,
    "sim_topk_ivf_check" -> ivfKmeansContractQ,
    // The actual NEIGHBOR LISTING from the KMeans IVF pipeline, kept
    // registered so the capability the name family promises — top-k
    // results per query — is reachable through the catalog (round-7
    // advice: folding the listing into the contract row made the real
    // similarity-search output unreachable for catalog consumers).
    // VALUE-ORACLED since round 10 (the round-9 verdict task #2): the
    // KMeans FIT is the one step DuckDB can't express, so the query
    // side-dumps the |cells|-row centroid table to parquet
    // ([[ivfCentroidDump]]) and the oracle recomputes EVERYTHING ELSE
    // from source — cell assignment (argmin of the rounded direct-sum
    // L2, ties to the lowest cell — the exact arithmetic
    // [[LlmOps.ivfAssign]] runs), the nprobe cell ranking, and the
    // per-cell cosine top-k — so only the 8 centroid vectors are
    // trusted, and those are pinned separately by IvfSpec's recall
    // gates plus the `sim_topk_ivf_kmeans` contract row. Protocol: the
    // oracle must run after the Spark dump on the SAME corpus (the
    // verify-then-check order both the driver and the scale gates
    // already use).
    "sim_topk_ivf_list" -> Q(
      (s, d) => {
        val e = emb(s, d)
        // content-addressed index reuse (round-13 verdict #1): the trained
        // quantizer + assignment come from the IVF index cache — a hit is
        // two parquet reads, search-only cost; the oracle stays sound
        // because it recomputes assignment/probe/rank from source against
        // the dumped centroids, wherever the engine got them
        val (assigned, centroids) = IvfIndex.cachedAssign(e, d)
        centroids.coalesce(1).write.mode("overwrite").parquet(ivfCentroidDump)
        val q = e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
        LlmOps.ivfSearch(assigned, centroids, q, topK = 5, nprobe = 4)
          .orderBy("qid", "rn")
      },
      Some(s"""WITH e AS ($embSql),
        cent AS (SELECT cell, cvec
          FROM parquet_scan('$ivfCentroidDump/*.parquet')),
        asg AS (SELECT vec_id, v, cell FROM (
          SELECT e.vec_id, e.v, c.cell, row_number() OVER (PARTITION BY e.vec_id
              ORDER BY round(list_sum(list_transform(range(len(e.v)),
                i -> (e.v[i+1] - c.cvec[i+1]) * (e.v[i+1] - c.cvec[i+1]))), 6) ASC,
              c.cell ASC) AS arn
          FROM e CROSS JOIN cent c) t WHERE arn = 1),
        q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 50 = 0),
        probe AS (SELECT qid, qv, cell FROM (
          SELECT q.qid, q.qv, c.cell, row_number() OVER (PARTITION BY q.qid
              ORDER BY round(list_sum(list_transform(range(len(q.qv)),
                i -> (q.qv[i+1] - c.cvec[i+1]) * (q.qv[i+1] - c.cvec[i+1]))), 6) ASC,
              c.cell ASC) AS crn
          FROM q CROSS JOIN cent c) t WHERE crn <= 4),
        sims AS (SELECT p.qid, a.vec_id AS cand,
            round(CASE WHEN sqrt(list_sum(list_transform(p.qv, x -> x*x)))
                  * sqrt(list_sum(list_transform(a.v, x -> x*x))) = 0 THEN 0.0
              ELSE list_sum(list_transform(range(len(p.qv)), i -> p.qv[i+1]*a.v[i+1]))
                / (sqrt(list_sum(list_transform(p.qv, x -> x*x)))
                  * sqrt(list_sum(list_transform(a.v, x -> x*x)))) END, 6) AS cos_r
          FROM probe p JOIN asg a ON a.cell = p.cell AND a.vec_id != p.qid)
        SELECT qid, CAST(rn AS INT) AS rn, cand, cos_r FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY cos_r DESC, cand ASC) AS rn FROM sims) t
        WHERE rn <= 5 ORDER BY qid, rn""")))

  private lazy val ivfKmeansContractQ: Q = Q(
      (s, d) => {
        val e = emb(s, d)
        // cached index (see sim_topk_ivf_list): the contract recompute
        // below reads the SOURCE parquet fresh, so a stale-cache bug
        // would hash-mismatch rather than self-confirm
        val (assigned, centroids) = IvfIndex.cachedAssign(e, d)
        val q = e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
        val res = LlmOps.ivfSearch(assigned, centroids, q, topK = 5, nprobe = 4)
        // fresh source read — deliberately NOT the memoized emb() frame,
        // so the recompute shares no column lineage with the pipeline
        val src = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
          .withColumn("n0", LlmOps.norm(col("v0")))
        val qs = src.select(col("vec_id").as("qid"),
          col("v0").as("qv0"), col("n0").as("qn0"))
        val cs = src.select(col("vec_id").as("cand"),
          col("v0").as("cv0"), col("n0").as("cn0"))
        res.join(qs, Seq("qid")).join(cs, Seq("cand"))
          .withColumn("cos2", round(
            when(col("qn0") * col("cn0") === 0, lit(0.0))
              .otherwise(LlmOps.dot(col("qv0"), col("cv0"))
                / (col("qn0") * col("cn0"))), 6))
          .groupBy(col("qid"))
          .agg(count(lit(1)).as("n_cands"),
            bool_and(col("cos_r") === col("cos2")).as("cos_ok"),
            array_sort(collect_list(struct(col("rn"), col("cos_r")))).as("lst"))
          .withColumn("rank_ok", expr(
            """size(lst) > 0 AND lst[0].rn = 1 AND
               forall(sequence(0, size(lst)-2),
                 i -> lst[i+1].rn = lst[i].rn + 1
                   AND lst[i].cos_r >= lst[i+1].cos_r)"""))
          .select(col("qid"), col("n_cands"), col("cos_ok"), col("rank_ok"))
          .orderBy("qid")
      },
      Some("""SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_cands,
          TRUE AS cos_ok, TRUE AS rank_ok
        FROM embeddings WHERE vec_id % 50 = 0 ORDER BY qid"""))

  // ---- §2.11 text analysis --------------------------------------------
  private val textQueries: Seq[(String, Q)] = Seq(
    "text_stats" -> Q(
      (s, d) => docs(s, d)
        .withColumn("norm", LlmOps.normText(col("text")))
        .withColumn("tokens", split(col("norm"), " "))
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("len"),
          size(col("tokens")).cast("long").as("n_tokens"),
          expr("size(filter(tokens, t -> t IN ('the','a','key','value')))")
            .cast("long").as("stop_cnt"))
        .withColumn("stop_ratio",
          round(col("stop_cnt").cast("double") / col("n_tokens"), 6))
        .withColumn("quality",
          round(col("stop_cnt").cast("double") / col("n_tokens")
            + least(col("n_tokens"), lit(50L)) / lit(50.0), 6))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, text, string_split($normSql, ' ') AS tokens
        FROM documents)
        SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
          CAST(len(tokens) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(tokens, x -> x IN ('the','a','key','value'))) AS BIGINT) AS stop_cnt,
          round(CAST(len(list_filter(tokens, x -> x IN ('the','a','key','value'))) AS DOUBLE)
            / len(tokens), 6) AS stop_ratio,
          round(CAST(len(list_filter(tokens, x -> x IN ('the','a','key','value'))) AS DOUBLE)
            / len(tokens) + least(len(tokens), 50) / 50.0, 6) AS quality
        FROM t ORDER BY doc_id""")),
    "text_langid" -> Q(
      // Shared rule: [[langidFrame]] / [[langidCtes]] — also consumed by
      // kappa_agreement, so listing and audit can't fork.
      (s, d) => langidFrame(s, d).orderBy("doc_id"),
      Some(s"""WITH $langidCtes
        SELECT doc_id, lang, sc_de, sc_en, sc_es, sc_fr, pred
        FROM lid_pred ORDER BY doc_id""")),
    "text_tokens" -> Q(
      (s, d) => docs(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_ws"),
          expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))")
            .cast("long").as("n_bpe"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
          CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe
        FROM documents ORDER BY doc_id""")),
    "text_fingerprint" -> Q(
      // ~250 md5 calls per doc: spread the few source file-partitions
      // across cores before the row-local hash storm (same fix as the
      // shingle explodes — the source is 1-2 files, the work is ×250).
      (s, d) => docs(s, d)
        .repartition(LlmOps.spreadWidth(docs(s, d)))
        .withColumn("norm", LlmOps.normText(col("text")))
        .withColumn("pre", expr("substring(norm, 1, 256)"))
        .select(col("doc_id"),
          expr("""CASE WHEN length(pre) >= 8
                  THEN array_min(transform(sequence(1, length(pre)-7), i -> md5(substring(pre, i, 8))))
                  ELSE NULL END""")
            .as("fingerprint"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, substring($normSql, 1, 256) AS pre FROM documents)
        SELECT doc_id,
          list_min(list_transform(range(length(pre)-7), i -> md5(substring(pre, i+1, 8)))) AS fingerprint
        FROM t ORDER BY doc_id""")),
    "text_quality_lm" -> Q(
      // quality scoring against a corpus language model: char-trigram
      // counts over the whole corpus, per-doc mean log-probability
      // (self-perplexity proxy — low scores = out-of-distribution docs)
      (s, d) => {
        // Two corpus passes, NOTHING corpus-sized ever materialized or
        // shuffled (round-15/16 decade-4 lessons): pass 1 explodes native
        // O(len) trigrams into an alphabet³-bounded count aggregate
        // (normText's lowercase grain — tens of KB at ANY corpus size;
        // that bound is what makes the driver-side collect here the same
        // class as broadcasting it, NOT a collect/driver-loop
        // anti-pattern). Pass 2 scores each document in ONE native
        // expression walk (functions.LmTrigramScore): per-window map
        // probe at tens of ns, sum in document order, round(avg, 6)
        // inline. This replaces the former explode → broadcast-hash
        // joinOnZone probe (~3.4-4 µs per trigram ROW, 15× the
        // counts-build pass; ~190 s at the decade-3 tier, DriveLmProbe)
        // → corpus-grain groupBy(doc_id) chain: no second explode, no
        // probe leg, no doc-grain shuffle. A doc with no scored trigrams
        // (NULL/short text) yields NULL and is filtered — the joined+
        // grouped form omitted those doc_ids (inner join), so the
        // result set is identical; summation order matches the exploded
        // stream's partial-agg order, so values are bit-identical.
        val cRows = docs(s, d)
          .repartition(LlmOps.spreadWidth(docs(s, d))) // single-partition source, ~300x explode
          .withColumn("norm", LlmOps.normText(col("text")))
          // native O(len) trigrams — the lambda substring form is O(len²)
          // per doc and burned 17+ min/pass at the 50M-doc tier
          .select(explode(
            graft.functions.native.char_ngrams(col("norm"), 3)).as("g"))
          .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
          .collect()
        val tot = { var t = 0L; cRows.foreach(t += _.getLong(1)); t.toDouble }
        val grams = cRows.map(_.getString(0))
        val logps = cRows.map(r => math.log(r.getLong(1) / tot))
        // explode(array(score)) is a deliberate pushdown barrier, not
        // decoration: written as select(score).filter(isNotNull),
        // PushPredicateThroughNonJoin substitutes the alias and sinks
        // `isnotnull(lm_trigram_score(...))` below the Project AND the
        // spread repartition — the probe pass runs TWICE per row, on the
        // unspread source partitions (verified in the formatted plan).
        // As a generator output the score attribute originates at the
        // Generate, so the filter cannot sink, the expression evaluates
        // ONCE, and the inferred-generator-filter trap doesn't bite: the
        // child is an inline complex generator (the vocab_top lesson),
        // and even inferred, isnotnull/size of a CreateArray const-folds.
        val base = docs(s, d)
        base.repartition(LlmOps.spreadWidth(base))
          .select(col("doc_id"), explode(array(
            graft.functions.native.lm_trigram_score(
              LlmOps.normText(col("text")), grams, logps))).as("lm_score"))
          .filter(col("lm_score").isNotNull)
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $normSql AS norm FROM documents),
        tri AS (SELECT doc_id, g
          FROM t, unnest(list_transform(range(length(norm)-2),
            i -> substring(norm, CAST(i+1 AS INT), 3))) AS u(g)),
        counts AS (SELECT g, count(*) AS cnt FROM tri GROUP BY g),
        total AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM counts)
        SELECT doc_id, round(avg(ln(cnt / tot)), 6) AS lm_score
        FROM tri JOIN counts USING (g) CROSS JOIN total
        GROUP BY doc_id ORDER BY doc_id""")),
    "text_fingerprint_rolling" -> Q(
      // O(n) Rabin–Karp min-fingerprint via the native MinRollingHash
      // expression; oracle recomputes every window O(n·k) — identical exact
      // 64-bit integers (base 31, k=8, no modulus needed)
      (s, d) => docs(s, d)
        .withColumn("pre", expr(s"substring(${"regexp_replace(lower(trim(text)), '\\\\s+', ' ')"}, 1, 256)"))
        .select(col("doc_id"),
          graft.functions.native.min_rolling_hash(col("pre"), 8).as("fp"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, substring($normSql, 1, 256) AS pre FROM documents)
        SELECT doc_id,
          CAST(list_min(list_transform(range(length(pre)-7), i ->
            CAST(list_sum(list_transform(range(8), j ->
              ascii(substring(pre, CAST(i+j+1 AS INT), 1)) *
              ([27512614111, 887503681, 28629151, 923521, 29791, 961, 31, 1])[j+1])) AS BIGINT)
          )) AS BIGINT) AS fp
        FROM t ORDER BY doc_id""")),
    "dsir_weights" -> Q(
      // Data Selection via Importance Resampling weights ("Data
      // Selection for Language Models via Importance Resampling", Xie
      // et al. 2023): score every document by how much its
      // hashed-bigram distribution looks like a TARGET exemplar set
      // (here lang = 'en') vs the raw corpus — the standard
      // train-data-curation importance weight log p_target(x)/p_raw(x)
      // under two hashed-feature unigram-of-bigrams models. Features:
      // word bigrams hashed to 4096 buckets via the engine-portable md5
      // 3-hex-digit primitive ([[hexv]]); add-1 smoothing over the
      // bucket space. Arithmetic is integer MICRO-log throughout
      // (floor(x·1e6 + 0.5), the r9 overflow-sweep house rule): per-doc
      // sums are order-independent Long adds, so Spark and DuckDB agree
      // bit-for-bit regardless of partial-agg order.
      //
      // Scale shape (the [[text_quality_lm]] pattern): pass 1 explodes
      // bigram buckets into a 4096-group aggregate (map-side combinable,
      // state bounded by the bucket space at ANY corpus size) and
      // collects it — bounded, the broadcast-equivalent class, not a
      // driver-loop anti-pattern. Pass 2 scores each doc in ONE fused
      // native walk ([[graft.functions.DsirScore]]) probing a 4096-long
      // weight array literal riding the task binary. No join, no probe
      // leg (the r15 ~4 µs/row BHJ lesson), no doc-grain shuffle;
      // per-doc state is one Long. Both passes use the native
      // [[graft.functions.DsirBigram]] walker — the SQL-lambda
      // formulation (transform + md5/substring/instr per gram +
      // aggregate probe) is CodegenFallback and interpreted `Md5` buys
      // a MessageDigest per call: 7.5 s for the sf0.1 scoring pass vs
      // ~1 s fused (measured r16).
      (s, d) => {
        val base = docs(s, d)
        val spread = base.repartition(LlmOps.spreadWidth(base))
        val cRows = spread
          .select(col("lang"), explode(graft.functions.native
            .dsir_buckets(LlmOps.normText(col("text")))).as("bkt"))
          .groupBy(col("bkt")).agg(
            sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t"),
            count(lit(1)).as("r"))
          .collect()
        var tTot = 0L; var rTot = 0L
        cRows.foreach { r => tTot += r.getLong(1); rTot += r.getLong(2) }
        val micro = new Array[Long](4096)
        val defW = math.floor((math.log(1.0 / (tTot + 4096.0)) -
          math.log(1.0 / (rTot + 4096.0))) * 1e6 + 0.5).toLong
        java.util.Arrays.fill(micro, defW) // never-seen buckets (unprobed
        // by construction — every doc gram's bucket has a count row — but
        // filled deterministically)
        cRows.foreach { row =>
          val b = row.getInt(0)
          micro(b) = math.floor((math.log((row.getLong(1) + 1.0) / (tTot + 4096.0)) -
            math.log((row.getLong(2) + 1.0) / (rTot + 4096.0))) * 1e6 + 0.5).toLong
        }
        // explode(array(..)) is the deliberate generator barrier (the
        // text_quality_lm pattern): as a plain projection, CollapseProject
        // would substitute the walk into every consuming alias and
        // evaluate it once per output column
        spread.select(col("doc_id"), explode(array(graft.functions.native
            .dsir_score(LlmOps.normText(col("text")), micro))).as("__s"))
          .select(col("doc_id"),
            col("__s").getItem(0).as("n_grams"),
            // micro/1e6 is exact (integer micro-units): no round needed,
            // and round(_, 6) must NOT be used here — Spark's round goes
            // through BigDecimal.valueOf (shortest-decimal repr, HALF_UP)
            // while DuckDB rounds the BINARY double, and a .5-boundary
            // quotient diverged at the 10× gate (0.003994 vs 0.003993).
            // floor(x·1e6 + 0.5)/1e6 is pure IEEE arithmetic — identical
            // on any engine (the established cross-engine rule).
            (col("__s").getItem(1) / lit(1e6)).as("dsir_sum"),
            when(col("__s").getItem(0) === 0, lit(null).cast("double"))
              .otherwise(floor(col("__s").getItem(1) / lit(1e6) /
                col("__s").getItem(0) * lit(1e6) + lit(0.5)) / lit(1e6))
              .as("dsir_avg"))
          .orderBy("doc_id")
      },
      Some(s"""WITH n AS (SELECT doc_id, lang,
              coalesce(string_split($normSql, ' '), ['']) AS w FROM documents),
          g AS (SELECT doc_id, lang, w[i+1] || ' ' || w[i+2] AS gram
            FROM n, unnest(range(greatest(len(w) - 1, 0))) AS u(i)),
          b AS (SELECT doc_id, lang,
              (strpos('0123456789abcdef', substring(md5(gram), 1, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substring(md5(gram), 2, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substring(md5(gram), 3, 1)) - 1) AS bkt
            FROM g),
          c AS (SELECT bkt, sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t,
              count(*) AS r FROM b GROUP BY 1),
          tot AS (SELECT sum(t) AS tt, sum(r) AS rr FROM c),
          wts AS (SELECT bkt, CAST(floor((ln((t + 1) / (tt + 4096.0)) -
              ln((r + 1) / (rr + 4096.0))) * 1000000 + 0.5) AS BIGINT) AS wm
            FROM c CROSS JOIN tot),
          per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
              sum(wm) AS micro FROM b JOIN wts USING (bkt) GROUP BY doc_id)
        SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
          coalesce(micro, 0) / 1000000.0 AS dsir_sum,
          CASE WHEN coalesce(n_grams, 0) = 0 THEN NULL
            ELSE floor(micro / 1000000.0 / n_grams * 1000000 + 0.5) / 1000000.0
            END AS dsir_avg
        FROM documents d LEFT JOIN per USING (doc_id)
        ORDER BY doc_id""")),
    "vocab_top" -> Q(
      // document-frequency vocabulary build (tokenizer prep): token →
      // (docs containing it, total occurrences), top 50 by df. Scale
      // shape (round-15 rework): BOTH aggregates run at VOCABULARY grain —
      // tf from a plain token count, df by exploding the per-row
      // array_distinct (first-occurrence identity is closed-form inside
      // one row, no cross-row state). The previous (token, doc_id)
      // pre-aggregate materialized ~|corpus| groups — measured at the
      // 50M-doc decade-4 tier as a sort-fallback in the partial agg and
      // exponent 1.18; two cheap corpus scans with O(|vocab|) state beat
      // one scan with O(|corpus|) state at every decade. Global top-k
      // stays TakeOrdered — never a full sort of the vocab. Both explodes
      // are INLINE complex generators so InferFiltersFromGenerate skips
      // them (the round-5 scan-pushdown trap).
      (s, d) => {
        val base = docs(s, d)
        val spread = base.repartition(LlmOps.spreadWidth(base))
        val tf = spread
          .select(explode(split(LlmOps.normText(col("text")), " ")).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("tf"))
        val df = spread
          .select(explode(array_distinct(
            split(LlmOps.normText(col("text")), " "))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("df"))
        df.join(tf, Seq("token"))
          .orderBy(col("df").desc, col("tf").desc, col("token").asc)
          .limit(50)
          .select(col("token"), col("df"), col("tf"))
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        tok AS (SELECT doc_id, token FROM n, unnest(w) AS u(token)),
        per AS (SELECT token, doc_id, count(*) AS tfd FROM tok GROUP BY 1, 2),
        v AS (SELECT token, CAST(count(*) AS BIGINT) AS df,
                CAST(sum(tfd) AS BIGINT) AS tf FROM per GROUP BY token)
        SELECT token, df, tf FROM v
        ORDER BY df DESC, tf DESC, token ASC LIMIT 50""")),
    "zipf_fit" -> Q(
      // Zipf-law fit (X4j) — the corpus-card statistic that summarizes a
      // token distribution in two numbers: OLS of ln(frequency) on
      // ln(rank) over the top-1000 tokens (slope ≈ −1 for natural text;
      // a flat slope flags synthetic/templated corpora, a steep one
      // flags boilerplate domination). Scale shape: the rollup is the
      // vocab_top pipeline (one vocabulary-sized shuffle); the fit set
      // is top-k via TakeOrdered (never a full vocab sort), so the
      // single-partition ranking window holds ≤ 1000 rows at ANY corpus
      // size, and the closing float arithmetic applies the same IEEE op
      // sequence to the same ≤1000 doubles on both engines.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // checkpoint the vocabulary rollup ONCE: n_vocab and the top-1000
        // fit set both read it, and without the sever each consumer
        // re-runs the full tokens→explode→groupBy corpus pass (r9 advice)
        val tf = tokens(s, d).groupBy(col("token"))
          .agg(count(lit(1)).as("tf"))
          .diskCheckpointLazy()
        val nv = tf.agg(count(lit(1)).as("n_vocab"))
        val rk = tf.orderBy(col("tf").desc, col("token").asc).limit(1000)
          .withColumn("r", row_number().over(
            Window.orderBy(col("tf").desc, col("token").asc)))
          .select(log(col("r").cast("double")).as("x"),
            log(col("tf").cast("double")).as("y"))
        val f = rk.agg(count(lit(1)).as("n_fit"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        val nD = col("n_fit").cast("double")
        val den = nD * col("sxx") - col("sx") * col("sx")
        val slope = (nD * col("sxy") - col("sx") * col("sy")) / den
        val denY = nD * col("syy") - col("sy") * col("sy")
        f.crossJoin(broadcast(nv))
          .select(col("n_vocab"), col("n_fit"),
            when(den === 0.0, lit(null)).otherwise(round(slope, 6))
              .as("slope_r"),
            when(den === 0.0, lit(null))
              .otherwise(round((col("sy") - slope * col("sx")) / nD, 6))
              .as("icept_r"),
            when(den === 0.0 || denY === 0.0, lit(null))
              .otherwise(round(pow(nD * col("sxy") - col("sx") * col("sy"),
                lit(2.0)) / (den * denY), 6)).as("r2_r"))
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        tok AS (SELECT doc_id, token FROM n, unnest(w) AS u(token)),
        v AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1),
        nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab FROM v),
        top AS (SELECT tf, token FROM v ORDER BY tf DESC, token ASC LIMIT 1000),
        rk AS (SELECT ln(CAST(row_number() OVER (ORDER BY tf DESC, token ASC)
                 AS DOUBLE)) AS x, ln(CAST(tf AS DOUBLE)) AS y FROM top),
        f AS (SELECT CAST(count(*) AS BIGINT) AS n_fit,
                sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
                sum(x*x) AS sxx, sum(y*y) AS syy FROM rk)
        SELECT n_vocab, n_fit,
          CASE WHEN n_fit*sxx - sx*sx = 0.0 THEN NULL
            ELSE round((n_fit*sxy - sx*sy) / (n_fit*sxx - sx*sx), 6) END
            AS slope_r,
          CASE WHEN n_fit*sxx - sx*sx = 0.0 THEN NULL
            ELSE round((sy - (n_fit*sxy - sx*sy) / (n_fit*sxx - sx*sx) * sx)
              / n_fit, 6) END AS icept_r,
          CASE WHEN n_fit*sxx - sx*sx = 0.0 OR n_fit*syy - sy*sy = 0.0
            THEN NULL
            ELSE round(pow(n_fit*sxy - sx*sy, 2)
              / ((n_fit*sxx - sx*sx) * (n_fit*syy - sy*sy)), 6) END AS r2_r
        FROM f CROSS JOIN nv""")),
    "vocab_heavy_sketch" -> Q(
      // The 100 TB heavy-hitters path (count-min sketch), completing the
      // sketch family: GK percentiles, HLL distinct counts, CMS
      // frequencies. At 100 TB the exact token rollup's shuffle is
      // vocabulary-sized (fine) but a STREAMING or multi-tenant counter
      // can't afford it — CMS is the fixed-memory answer, and here it is
      // built DECLARATIVELY: row i of the sketch is just
      // groupBy(h_i(token) % w).count(), so the d×w counter table falls
      // out of one partial-aggregated shuffle of at most d·w rows per
      // partition, and estimates are a broadcast join + min over d rows.
      // Merge is integer addition — order-independent, so the estimate is
      // DETERMINISTIC (unlike GK) — but not DuckDB-expressible, so the
      // contract-oracle pattern applies: the top-20 exact counts are
      // value-oracled, and `within_bound` pins the CMS law
      // (est ≥ true always; est ≤ true + N/256 — 16× the expected
      // collision mass at w=4096 — measured, deterministic, and asserted
      // TRUE by the oracle). The estimate value never feeds the compare.
      (s, d) => {
        val wBuckets = 4096; val dRows = 4
        // three consumers (sketch build, total count, exact top-20) —
        // localCheckpoint the one-column token projection so each reads
        // the materialized blocks instead of re-running the scan +
        // tokenization. localCheckpoint, not persist: checkpointed
        // blocks are freed by the ContextCleaner once the frame is
        // unreachable, where an un-unpersisted cache would pin blocks
        // for the rest of a 190-query Verify run.
        val toks = tokens(s, d).select(col("token"))
          .diskCheckpoint()
        // ONE md5 per token (r17, VERDICT r16 #4): the 128-bit digest is
        // sliced into four 32-bit words, one CMS row per word — replacing
        // four per-(row,token) digests (the 4×md5 bucket explode was ~7 s
        // of this query's ~8.9 s executor time at sf0.1; guide §1.2
        // per-task work). The CMS law is hash-family independent
        // (est ≥ true for ANY buckets; the within_bound slack stays 16×
        // the expected collision mass at w=4096, measured and asserted
        // TRUE by the oracle at sf0.01/sf0.1), and the declared output
        // (token, cnt, within_bound) never carries a bucket value, so
        // the hash swap cannot move a compared cell.
        val buckets = array((0 until dRows).map(i =>
          expr(s"cast(conv(substring(__h, ${1 + 8 * i}, 8), 16, 10) as bigint)" +
            s" % $wBuckets")): _*)
        val sketch = toks.withColumn("__h", md5(col("token")))
          .select(posexplode(buckets).as(Seq("row", "bucket")))
          .groupBy(col("row"), col("bucket")).agg(count(lit(1)).as("c"))
        val totals = toks.agg(count(lit(1)).as("total"))
        val top = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("token")).limit(20)
        // broadcast the 1-row totals explicitly: every other 1-row attach
        // in this file spells crossJoin(broadcast(...)) so no build side
        // ever rests on stats ESTIMATES (the LogicalRDD broadcast-cliff
        // lesson) — this one was the odd bare site out
        top.crossJoin(broadcast(totals))
          .withColumn("__h", md5(col("token")))
          .select(col("token"), col("cnt"), col("total"),
            posexplode(buckets).as(Seq("row", "bucket")))
          .join(broadcast(sketch), Seq("row", "bucket"))
          .groupBy(col("token"), col("cnt"), col("total"))
          .agg(min(col("c")).as("est"))
          .select(col("token"), col("cnt"),
            (col("est") >= col("cnt") &&
              col("est") <= col("cnt") + expr("total div 256")).as("within_bound"))
          .orderBy(col("cnt").desc, col("token"))
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        tok AS (SELECT token FROM n, unnest(w) AS u(token)),
        c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1)
        SELECT token, cnt, TRUE AS within_bound
        FROM c ORDER BY cnt DESC, token LIMIT 20""")),
    "quality_gate" -> Q(
      // C4-style rule-chain quality filter: word count, mean word length,
      // stopword ratio, digit ratio → hard pass/fail gate. Stateless
      // per-row map (ratios are exact integer arithmetic divided once, so
      // both engines branch identically); thresholds chosen to split the
      // synthetic corpus. Shared rule: [[gateFrame]]/[[gateCtes]] — also
      // consumed by woe_bins, so listing and readout can't fork.
      (s, d) => gateFrame(s, d)
        .select(col("doc_id"), col("wc"),
          round(col("mean_wlen"), 6).as("mean_wlen_r"),
          round(col("stop_ratio"), 6).as("stop_ratio_r"),
          round(col("digit_ratio"), 6).as("digit_ratio_r"),
          col("pass"))
        .orderBy("doc_id"),
      Some(s"""WITH $gateCtes
        SELECT doc_id, wc, round(mean_wlen, 6) AS mean_wlen_r,
          round(stop_ratio, 6) AS stop_ratio_r,
          round(digit_ratio, 6) AS digit_ratio_r, pass
        FROM qg_pass ORDER BY doc_id""")),
    "multimodal_meta" -> Q(
      (s, d) => docs(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("byte_len"),
          md5(col("payload")).as("content_hash"))
        .withColumn("width", (col("byte_len") % 64 + 16).cast("long"))
        .withColumn("height", (col("byte_len") % 48 + 16).cast("long"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
          CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
          md5(text) AS content_hash,
          CAST(octet_length(encode(text)) % 64 + 16 AS BIGINT) AS width,
          CAST(octet_length(encode(text)) % 48 + 16 AS BIGINT) AS height
        FROM documents ORDER BY doc_id""")),
    "multimodal_decode" -> Q(
      // REAL multimodal decode (X5, no longer design-only): the engine's
      // binary fixture — a deterministic closed-form BMP per doc_id — is
      // encoded and then ACTUALLY decoded through javax.imageio in a
      // per-partition pass; the emitted integer pixel statistics are what
      // the oracle can verify, because the fixture's generation formulas
      // (Multimodal.scala fixture notes: w=4+id%13, h=3+id%7, r=id%200+x,
      // g=id%180+y, b=id%120+x+y, no channel wrap) have closed-form sums.
      // What's pinned is the full encode→decode roundtrip through a real
      // codec, not the formula: a decoder that dropped a row, flipped
      // channels, or mis-read padding would hash-mismatch.
      (s, d) => Multimodal.imageStats(Multimodal.bmpFromDocuments(docs(s, d)))
        .orderBy("media_id"),
      Some("""WITH p AS (SELECT doc_id,
            4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h,
            doc_id % 200 AS br, doc_id % 180 AS bg, doc_id % 120 AS bb
          FROM documents)
        SELECT doc_id AS media_id,
          CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
          CAST(w * h AS BIGINT) AS n_px,
          CAST(h * (w * br + (w * (w - 1)) // 2) AS BIGINT) AS sum_r,
          CAST(w * (h * bg + (h * (h - 1)) // 2) AS BIGINT) AS sum_g,
          CAST(w * h * bb + h * ((w * (w - 1)) // 2)
            + w * ((h * (h - 1)) // 2) AS BIGINT) AS sum_b
        FROM p ORDER BY media_id""")),
    "multimodal_resize" -> Q(
      // REAL multimodal resample (X5c): the full media path — encode the
      // fixture BMP, decode it, nearest-neighbor resample to 8×6,
      // re-encode as BMP, decode AGAIN, and emit integer pixel sums. The
      // oracle recomputes the expected sums closed-form: nearest-neighbor
      // source index is sx = (x·w) div 8 / sy = (y·h) div 6 (exactly the
      // integer arithmetic in Multimodal.resizeImage), so
      // sum_r = 48·br + 6·Σsx, sum_g = 48·bg + 8·Σsy,
      // sum_b = 48·bb + 6·Σsx + 8·Σsy. Two independent codec passes per
      // row — a resampler that rounded instead of flooring, swapped axes,
      // or re-encoded with channel drift would hash-mismatch.
      (s, d) => Multimodal.imageStats(
          Multimodal.resize(Multimodal.bmpFromDocuments(docs(s, d)), 8, 6))
        .orderBy("media_id"),
      Some("""WITH m AS (SELECT doc_id AS media_id,
            4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h,
            doc_id % 200 AS br, doc_id % 180 AS bg, doc_id % 120 AS bb
          FROM documents),
          g AS (SELECT media_id, br, bg, bb,
            CAST(list_aggregate(list_transform(range(8),
              x -> (x * w) // 8), 'sum') AS BIGINT) AS sxx,
            CAST(list_aggregate(list_transform(range(6),
              y -> (y * h) // 6), 'sum') AS BIGINT) AS syy
          FROM m)
        SELECT media_id, CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
          CAST(48 AS BIGINT) AS n_px,
          CAST(48 * br + 6 * sxx AS BIGINT) AS sum_r,
          CAST(48 * bg + 8 * syy AS BIGINT) AS sum_g,
          CAST(48 * bb + 6 * sxx + 8 * syy AS BIGINT) AS sum_b
        FROM g ORDER BY media_id""")))

  /** Shared X7 decontamination oracle — `decontaminate` and its bloom
    * variant must return the SAME rows (the bloom pre-filter is a pure
    * shuffle-volume optimization; the confirm join restores exactness),
    * so they verify against one SQL text. */
  private val decontamOracle: String =
    s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
        sh AS (SELECT doc_id, g
          FROM n, unnest(list_transform(range(greatest(len(w)-1, 0)),
            i -> w[i+1] || ' ' || w[i+2])) AS u(g)),
        ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % 100 = 0),
        hit AS (SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (g))
        SELECT d.doc_id,
          CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END AS contaminated
        FROM documents d LEFT JOIN hit ON d.doc_id = hit.doc_id
        ORDER BY d.doc_id"""

  // ---- §2.11 training-data pipeline composites -------------------------
  private val pipelineQueries: Seq[(String, Q)] = Seq(
    "dedup_purge" -> Q(
      // End-to-end near-dup REMOVAL — the op a training pipeline actually
      // runs: LSH candidates → connected components → keep only each
      // cluster's keeper (min doc_id). Composes X2 + X2e; at scale the
      // final step is one semi-join of the corpus against the keeper set.
      (s, d) => {
        val keepers = dupClusters(s, d)
          .filter(col("node") === col("rep"))
          .select(col("node").as("doc_id"))
        docs(s, d).join(keepers, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $minhashPairCtes,
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION ALL SELECT doc_b, doc_a FROM pairs),
        walk(node, rep) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.src, w.rep FROM edges e JOIN walk w ON e.dst = w.node),
        reps AS (SELECT node, min(rep) AS rep FROM walk GROUP BY node)
        SELECT doc_id, lang, n_chars FROM documents
        JOIN reps ON doc_id = node
        WHERE rep = node ORDER BY doc_id""")),
    "decontaminate" -> Q(
      // Benchmark decontamination: flag corpus docs sharing any shingle
      // with a held-out eval set (stand-in: every 100th doc). Scale shape:
      // the eval shingle set is small and broadcasts; the corpus side is
      // one explode + semi-join — never an all-pairs comparison. (Real
      // systems use 8-13-token shingles; the 2-word shingle here reuses
      // the X2 shingle machinery and keeps the oracle shared.)
      (s, d) => {
        def grams(df: DataFrame) = df
          .repartition(LlmOps.spreadWidth(df))
          .withColumn("__norm", LlmOps.normText(col("text")))
          .select(col("doc_id"), explode(LlmOps.bigramShingles("__norm")).as("g"))
        val evalGrams = grams(docs(s, d).filter(col("doc_id") % 100 === 0))
          .select(col("g")).distinct()
        val contaminated = grams(docs(s, d))
          .join(broadcast(evalGrams), Seq("g"), "left_semi")
          .select(col("doc_id")).distinct()
          .withColumn("contaminated", lit(1))
        docs(s, d).join(contaminated, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("contaminated"), lit(0)).as("contaminated"))
          .orderBy("doc_id")
      },
      Some(decontamOracle)),
    "decontaminate_bloom" -> Q(
      // X7 at the 100 TB shape: `decontaminate` broadcasts the eval
      // shingle set as a hash relation — fine while the eval suite is
      // thousands of docs, dead at 10^9 shingles × ~30 B of strings. The
      // BITS of that set still fit: one aggregate builds a Bloom filter
      // over the eval shingles (~1.2 GB at 10^9 keys / 1% fpp), it ships
      // to every task once, and the corpus explode is pre-filtered BEFORE
      // anything shuffles. The exact confirm semi-join then removes the
      // false positives, so the result is bit-identical to X7 (shared
      // oracle proves it) — the filter only bounds what reaches the
      // shuffle: |true hits| + ~1% noise instead of every corpus shingle.
      // The confirm join is deliberately NOT broadcast-hinted (the premise
      // is an eval set too big for that); AQE keeps it broadcast at test
      // scale, and at cluster scale it degrades to a shuffle join whose
      // probe side the bloom already decimated.
      (s, d) => {
        def grams(df: DataFrame) = df
          .repartition(LlmOps.spreadWidth(df))
          .withColumn("__norm", LlmOps.normText(col("text")))
          .select(col("doc_id"), explode(LlmOps.bigramShingles("__norm")).as("g"))
        val evalGrams = grams(docs(s, d).filter(col("doc_id") % 100 === 0))
          .select(col("g")).distinct()
        val bf = evalGrams.stat.bloomFilter("g", 100000L, 0.01)
        val mightContain = udf((g: String) => g != null && bf.mightContain(g))
        val contaminated = grams(docs(s, d))
          .filter(mightContain(col("g")))
          .join(evalGrams, Seq("g"), "left_semi")
          .select(col("doc_id")).distinct()
          .withColumn("contaminated", lit(1))
        docs(s, d).join(contaminated, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("contaminated"), lit(0)).as("contaminated"))
          .orderBy("doc_id")
      },
      Some(decontamOracle)),
    "contamination_frac" -> Q(
      // Graded decontamination (X59): not just the X7 boolean flag but the
      // OVERLAP FRACTION — matched distinct shingles / total distinct
      // shingles per doc — so a pipeline can threshold at 80% (drop) vs
      // 5% (keep) instead of nuking every doc sharing one common phrase.
      // Same scale shape as X7: the eval shingle set broadcasts, the
      // corpus side is one explode + two doc-keyed aggregates; the
      // fraction is an exact integer ratio rounded at output. Sub-2-word
      // docs (no shingles) score 0 by definition in both engines.
      (s, d) => {
        def grams(df: DataFrame) = df
          .repartition(LlmOps.spreadWidth(df))
          .withColumn("__norm", LlmOps.normText(col("text")))
          .select(col("doc_id"), explode(LlmOps.bigramShingles("__norm")).as("g"))
        val evalGrams = grams(docs(s, d).filter(col("doc_id") % 100 === 0))
          .select(col("g")).distinct()
        val perDoc = grams(docs(s, d)).distinct()
          .join(broadcast(evalGrams.withColumn("hit", lit(1L))), Seq("g"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        docs(s, d).select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"))
          .withColumn("frac",
            when(col("n_shingles") === 0, lit(0.0))
              .otherwise(round(col("n_hit").cast("double") / col("n_shingles"), 6)))
          .orderBy("doc_id")
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
          sh AS (SELECT DISTINCT doc_id, g
            FROM n, unnest(list_transform(range(greatest(len(w)-1, 0)),
              i -> w[i+1] || ' ' || w[i+2])) AS u(g)),
          ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % 100 = 0),
          agg AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
              CAST(sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
            FROM sh LEFT JOIN ev ON sh.g = ev.g GROUP BY sh.doc_id)
        SELECT d.doc_id,
          COALESCE(n_shingles, 0) AS n_shingles, COALESCE(n_hit, 0) AS n_hit,
          CASE WHEN COALESCE(n_shingles, 0) = 0 THEN 0.0
            ELSE round(CAST(COALESCE(n_hit, 0) AS DOUBLE) / n_shingles, 6) END AS frac
        FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        ORDER BY d.doc_id""")),
    "doc_quality_composite" -> Q(
      // Composite quality score (X58): the multi-signal blend a curation
      // pipeline actually thresholds on — token volume (saturating),
      // stopword density, word-length shape (peaked at ~5 chars), digit
      // pollution — one weighted score per doc, every component an exact
      // ratio computed in a single stateless pass (no shuffle at all
      // before the output sort). Weights are policy, not physics; the
      // score is emitted in integer MICRO-POINTS (floor(x·1e6+0.5) — the
      // engine-portable rule; fractional round() tie-breaks diverge
      // cross-engine at an exactly-representable .5 boundary, which
      // sf0.1 actually hit) and each component is emitted so a
      // recalibration can re-rank without recomputation.
      (s, d) => {
        val base = docs(s, d)
          .withColumn("tokens", split(LlmOps.normText(col("text")), " "))
          .select(col("doc_id"),
            size(col("tokens")).cast("long").as("n_tokens"),
            expr("aggregate(tokens, 0L, (a, t) -> a + length(t))").as("tok_chars"),
            expr("size(filter(tokens, t -> t IN ('the','a','key','value')))")
              .cast("long").as("stop_cnt"),
            length(col("text")).cast("long").as("n_chars"),
            length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("n_digits"))
        base
          .withColumn("vol", least(col("n_tokens"), lit(50L)) / lit(50.0))
          .withColumn("stop_frac",
            col("stop_cnt").cast("double") / col("n_tokens"))
          .withColumn("len_shape", greatest(lit(0.0),
            lit(1.0) - abs(col("tok_chars").cast("double") / col("n_tokens") - lit(5.0)) / lit(5.0)))
          // empty-text guard: 0/0 is NaN in Spark but errors/diverges in a
          // DuckDB NaN→BIGINT cast — an empty doc scores the digit
          // component as unpolluted (frac 0), mirroring contamination_frac's
          // n_shingles = 0 handling
          .withColumn("digit_frac",
            when(col("n_chars") === 0, lit(0.0))
              .otherwise(col("n_digits").cast("double") / col("n_chars")))
          .withColumn("score_u", floor(
            (lit(0.4) * col("vol") + lit(0.3) * col("stop_frac")
              + lit(0.2) * col("len_shape") + lit(0.1) * (lit(1.0) - col("digit_frac")))
              * 1000000 + lit(0.5)).cast("long"))
          .select(col("doc_id"), col("n_tokens"), col("stop_cnt"),
            col("n_digits"), col("score_u"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, text, string_split($normSql, ' ') AS tokens
          FROM documents),
          c AS (SELECT doc_id,
              CAST(len(tokens) AS BIGINT) AS n_tokens,
              CAST(list_sum(list_transform(tokens, x -> length(x))) AS BIGINT) AS tok_chars,
              CAST(len(list_filter(tokens, x -> x IN ('the','a','key','value'))) AS BIGINT) AS stop_cnt,
              CAST(length(text) AS BIGINT) AS n_chars,
              CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits
            FROM t)
        SELECT doc_id, n_tokens, stop_cnt, n_digits,
          CAST(floor((CAST(0.4 AS DOUBLE) * (least(n_tokens, 50) / CAST(50.0 AS DOUBLE))
            + CAST(0.3 AS DOUBLE) * (CAST(stop_cnt AS DOUBLE) / n_tokens)
            + CAST(0.2 AS DOUBLE) * greatest(CAST(0.0 AS DOUBLE),
                CAST(1.0 AS DOUBLE) - abs(CAST(tok_chars AS DOUBLE) / n_tokens
                  - CAST(5.0 AS DOUBLE)) / CAST(5.0 AS DOUBLE))
            + CAST(0.1 AS DOUBLE) * (CAST(1.0 AS DOUBLE)
                - CASE WHEN n_chars = 0 THEN CAST(0.0 AS DOUBLE)
                  ELSE CAST(n_digits AS DOUBLE) / n_chars END)) * 1000000
            + CAST(0.5 AS DOUBLE)) AS BIGINT) AS score_u
        FROM c ORDER BY doc_id""")),
    "text_clean" -> Q(
      // PII / boilerplate scrubbing — URL, email, and long digit runs
      // replaced by typed placeholders (the standard pre-training scrub).
      // Test documents are synthetic and clean, so the input is stressed
      // with a deterministic dirty prefix; patterns are RE2-safe so both
      // engines compile them identically.
      (s, d) => {
        val raw = concat(lit(dirtyPrefix), expr("substring(text, 1, 60)"))
        val cleaned =
          regexp_replace(
            regexp_replace(
              regexp_replace(raw, urlRe, "<URL>"),
              emailRe, "<EMAIL>"),
            numRe, "<NUM>")
        docs(s, d).select(col("doc_id"), cleaned.as("cleaned"))
          .withColumn("n_url", size(split(col("cleaned"), "<URL>", -1)) - 1)
          .withColumn("n_email", size(split(col("cleaned"), "<EMAIL>", -1)) - 1)
          .withColumn("n_num", size(split(col("cleaned"), "<NUM>", -1)) - 1)
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id,
          '$dirtyPrefix' || substring(text, 1, 60) AS raw FROM documents),
        c AS (SELECT doc_id,
          regexp_replace(
            regexp_replace(
              regexp_replace(raw, '$urlRe', '<URL>', 'g'),
              '$emailRe', '<EMAIL>', 'g'),
            '$numRe', '<NUM>', 'g') AS cleaned
        FROM t)
        SELECT doc_id, cleaned,
          CAST(len(string_split(cleaned, '<URL>')) - 1 AS INT) AS n_url,
          CAST(len(string_split(cleaned, '<EMAIL>')) - 1 AS INT) AS n_email,
          CAST(len(string_split(cleaned, '<NUM>')) - 1 AS INT) AS n_num
        FROM c ORDER BY doc_id""")),
    "pack_sequences" -> Q(
      // Sequence packing for training: each doc's token stream chunked
      // into fixed 32-token windows (doc-bounded — no cross-doc bleed),
      // one row per chunk with its length and first token. Pure per-row
      // explode: embarrassingly parallel, no shuffle until the output sort.
      (s, d) => docs(s, d)
        .withColumn("tokens", split(LlmOps.normText(col("text")), " "))
        .withColumn("n_tok", size(col("tokens")))
        .withColumn("chunk_idx",
          explode(expr("sequence(0, CAST((n_tok - 1) div 32 AS INT))")))
        .select(col("doc_id"), col("chunk_idx"),
          least(lit(32), col("n_tok") - col("chunk_idx") * 32).as("chunk_len"),
          element_at(col("tokens"), col("chunk_idx") * 32 + 1).as("first_tok"))
        .orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH t AS (SELECT doc_id, string_split($normSql, ' ') AS tokens FROM documents),
        c AS (SELECT doc_id, tokens, len(tokens) AS n_tok,
                unnest(range(CAST(floor((len(tokens) - 1) / 32) AS INT) + 1)) AS chunk_idx
              FROM t)
        SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
          CAST(least(32, n_tok - chunk_idx * 32) AS INT) AS chunk_len,
          tokens[CAST(chunk_idx * 32 + 1 AS INT)] AS first_tok
        FROM c ORDER BY doc_id, chunk_idx""")))

  // ---- §2.11 curation signals & corpus shaping -------------------------
  private val curationQueries: Seq[(String, Q)] = Seq(
    "text_repetition" -> Q(
      // Repetition signal (the Gopher/FineWeb-style duplicate-n-gram
      // fraction): 1 − distinct/total character trigrams. Pure per-row
      // array work — no shuffle before the verify sort, but the ~len-sized
      // trigram array per row is heavy enough to spread off the 1-2
      // source file-partitions first.
      (s, d) => docs(s, d)
        .repartition(LlmOps.spreadWidth(docs(s, d)))
        .withColumn("norm", LlmOps.normText(col("text")))
        // native O(len) trigrams (see functions.CharNgrams)
        .withColumn("tris",
          graft.functions.native.char_ngrams(col("norm"), 3))
        .select(col("doc_id"),
          size(col("tris")).as("n_tri"),
          when(size(col("tris")) > 0,
            round(lit(1.0) -
              size(array_distinct(col("tris"))).cast("double") / size(col("tris")), 6))
            .as("dup_frac"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id,
          list_transform(range(greatest(length($normSql) - 2, 0)),
            i -> substring($normSql, CAST(i + 1 AS INT), 3)) AS tris
        FROM documents)
        SELECT doc_id, CAST(len(tris) AS INT) AS n_tri,
          CASE WHEN len(tris) > 0
            THEN round(1.0 - CAST(len(list_distinct(tris)) AS DOUBLE) / len(tris), 6)
          END AS dup_frac
        FROM t ORDER BY doc_id""")),
    "sample_mix" -> Q(
      // Deterministic mixture sampling — per-source keep rates applied via
      // an md5 bucket (engine-portable, reproducible across runs and
      // engines, no RNG state): source srcN keeps (N%4+1)/4 of its docs.
      // The standard way a pipeline applies domain-mixing weights; scales
      // as a stateless map, no shuffle.
      (s, d) => {
        val h = md5(concat(lit("mix:"), col("doc_id").cast("string")))
        val bucket = hexv(substring(h, 1, 1)) * 16 + hexv(substring(h, 2, 1))
        val rate = (substring(col("source"), 4, 10).cast("int") % 4 + 1) * 64
        docs(s, d)
          .filter(bucket < rate)
          .select(col("doc_id"), col("source"))
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id, source,
          (strpos('0123456789abcdef', substring(md5('mix:' || doc_id), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substring(md5('mix:' || doc_id), 2, 1)) - 1) AS bucket,
          (CAST(substring(source, 4) AS INT) % 4 + 1) * 64 AS rate
        FROM documents)
        SELECT doc_id, source FROM b WHERE bucket < rate ORDER BY doc_id""")),
    "quantize_embed" -> Q(
      // Per-vector int8 min-max quantization (embedding storage shrink):
      // q_i = floor((v_i - lo) * 255 / (hi - lo) + 0.5). floor(x + 0.5) is
      // used instead of round() so both engines share one rounding rule.
      // Emits scalar summary columns (bounds, first quantized values,
      // checksum) — stateless map work.
      (s, d) => {
        val e = emb(s, d)
        def q(i: Int) = expr(
          s"""CAST(CASE WHEN hi > lo
              THEN floor((element_at(v, $i) - lo) * 255.0 / (hi - lo) + 0.5)
              ELSE 0 END AS INT)""").as(s"q${i - 1}")
        e.withColumn("lo", array_min(col("v")))
          .withColumn("hi", array_max(col("v")))
          .select(col("vec_id"), round(col("lo"), 6).as("lo_r"),
            round(col("hi"), 6).as("hi_r"), q(1), q(2), q(3), q(4),
            expr("""CAST(aggregate(transform(v, x ->
                CASE WHEN hi > lo
                  THEN CAST(floor((x - lo) * 255.0 / (hi - lo) + 0.5) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END),
              CAST(0 AS BIGINT), (a, x) -> a + x) AS BIGINT)""").as("qsum"))
          .orderBy("vec_id")
      },
      Some(s"""WITH e AS ($embSql),
        b AS (SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM e)
        SELECT vec_id, round(lo, 6) AS lo_r, round(hi, 6) AS hi_r,
          CAST(CASE WHEN hi > lo THEN floor((v[1] - lo) * 255.0 / (hi - lo) + 0.5) ELSE 0 END AS INT) AS q0,
          CAST(CASE WHEN hi > lo THEN floor((v[2] - lo) * 255.0 / (hi - lo) + 0.5) ELSE 0 END AS INT) AS q1,
          CAST(CASE WHEN hi > lo THEN floor((v[3] - lo) * 255.0 / (hi - lo) + 0.5) ELSE 0 END AS INT) AS q2,
          CAST(CASE WHEN hi > lo THEN floor((v[4] - lo) * 255.0 / (hi - lo) + 0.5) ELSE 0 END AS INT) AS q3,
          CAST(list_sum(list_transform(v, x ->
            CASE WHEN hi > lo THEN CAST(floor((x - lo) * 255.0 / (hi - lo) + 0.5) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS qsum
        FROM b ORDER BY vec_id""")),
    "project_embed" -> Q(
      // X19 random-projection dimensionality reduction: each embedding's
      // float projections onto the first 4 Walsh/Hadamard hyperplanes
      // (plane j flips sign with index bit j — the same deterministic,
      // mutually-orthogonal construction WalshSignBits quantizes to signs;
      // here the raw projection VALUES are the reduced features). Stateless
      // per-row map; both engines sum left-to-right so the rounded doubles
      // match exactly.
      (s, d) => {
        def proj(j: Int) = {
          val pow = 1 << j
          round(expr(s"""aggregate(transform(sequence(0, size(v)-1),
              i -> element_at(v, i+1) * (1 - 2 * ((i div $pow) % 2))),
            cast(0.0 as double), (a, x) -> a + x)"""), 6).as(s"p$j")
        }
        emb(s, d).select(col("vec_id"), proj(0), proj(1), proj(2), proj(3))
          .orderBy("vec_id")
      },
      Some(s"""WITH e AS ($embSql)
        SELECT vec_id,
          round(list_sum(list_transform(range(len(v)), i -> v[i+1] * (1 - 2*((i // 1) % 2)))), 6) AS p0,
          round(list_sum(list_transform(range(len(v)), i -> v[i+1] * (1 - 2*((i // 2) % 2)))), 6) AS p1,
          round(list_sum(list_transform(range(len(v)), i -> v[i+1] * (1 - 2*((i // 4) % 2)))), 6) AS p2,
          round(list_sum(list_transform(range(len(v)), i -> v[i+1] * (1 - 2*((i // 8) % 2)))), 6) AS p3
        FROM e ORDER BY vec_id""")),
    "dedup_keep_best" -> Q(
      // Quality-aware dedup retention: instead of X6's keep-min-id purge,
      // keep each duplicate cluster's BEST document (longest text, ties to
      // the smaller id) — the retention policy real pipelines prefer, since
      // near-dup clusters usually contain one full document and several
      // truncated copies. Scale shape: clusters from the one-job-per-round
      // CC, then a per-cluster window (partitioned by rep — parallel) picks
      // the keeper; `dups` carries the cluster size for downstream stats.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val clusters = dupClusters(s, d)
        docs(s, d).join(clusters, col("doc_id") === col("node"))
          .select(col("doc_id"), col("lang"), col("n_chars"), col("rep"))
          .withColumn("rn", row_number().over(Window.partitionBy(col("rep"))
            .orderBy(col("n_chars").desc, col("doc_id").asc)))
          .withColumn("dups", count(lit(1)).over(Window.partitionBy(col("rep"))))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("lang"), col("n_chars"), col("dups"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $minhashPairCtes,
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION ALL SELECT doc_b, doc_a FROM pairs),
        walk(node, rep) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.src, w.rep FROM edges e JOIN walk w ON e.dst = w.node),
        reps AS (SELECT node, min(rep) AS rep FROM walk GROUP BY node),
        lab AS (SELECT doc_id, lang, n_chars, rep
                FROM documents JOIN reps ON doc_id = node),
        rk AS (SELECT doc_id, lang, n_chars,
          row_number() OVER (PARTITION BY rep ORDER BY n_chars DESC, doc_id ASC) AS rn,
          count(*) OVER (PARTITION BY rep) AS dups FROM lab)
        SELECT doc_id, lang, n_chars, dups FROM rk WHERE rn = 1
        ORDER BY doc_id""")),
    "split_assign" -> Q(
      // Deterministic stratified train/val/test assignment: an md5 bucket
      // per doc (engine-portable, no RNG state) cut at 230/243 of 256 —
      // ~90/5/5. Uniform hashing makes the proportions hold inside every
      // stratum (language, source) without a per-stratum pass; rerunning
      // the pipeline or re-sharding the corpus can never move a document
      // across splits. Stateless map, no shuffle.
      (s, d) => {
        val h = md5(concat(lit("split:"), col("doc_id").cast("string")))
        val bucket = hexv(substring(h, 1, 1)) * 16 + hexv(substring(h, 2, 1))
        docs(s, d).select(col("doc_id"), col("lang"),
            when(bucket < 230, lit("train")).when(bucket < 243, lit("val"))
              .otherwise(lit("test")).as("split"))
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id, lang,
          (strpos('0123456789abcdef', substring(md5('split:' || doc_id), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substring(md5('split:' || doc_id), 2, 1)) - 1) AS bucket
        FROM documents)
        SELECT doc_id, lang,
          CASE WHEN bucket < 230 THEN 'train'
               WHEN bucket < 243 THEN 'val' ELSE 'test' END AS split
        FROM b ORDER BY doc_id""")),
    "select_budget" -> Q(
      // Token-budget selection: take documents in deterministic-random
      // order (md5 key) until a global 50k-char budget is exhausted — how
      // a pipeline cuts a corpus down to a target token count. The global
      // running total is TWO-PHASE (same pattern as Queue.rank): documents
      // band by their key's first hex digit (16 ordered bands, monotone in
      // the selection order), the running sum within each band is a
      // partitioned window, and per-band offsets (a 16-row aggregate)
      // broadcast back — no single-task whole-corpus window.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = docs(s, d).select(col("doc_id"), col("lang"), col("n_chars"),
          md5(concat(lit("sel:"), col("doc_id").cast("string"))).as("hkey"))
        val banded = base.withColumn("band", hexv(substring(col("hkey"), 1, 1)))
          .withColumn("cum_in", sum(col("n_chars")).over(
            Window.partitionBy(col("band"))
              .orderBy(col("hkey").asc, col("doc_id").asc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val offsets = banded.groupBy(col("band"))
          .agg(sum(col("n_chars")).as("btot"))
          .withColumn("off", coalesce(
            sum("btot").over(Window.orderBy(col("band").asc)
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("band"), col("off"))
        banded.join(broadcast(offsets), Seq("band"))
          .withColumn("cum", col("off") + col("cum_in"))
          .filter(col("cum") <= 50000)
          .select(col("doc_id"), col("lang"), col("n_chars"), col("cum"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (SELECT doc_id, lang, n_chars,
          md5('sel:' || doc_id) AS hkey FROM documents),
        c AS (SELECT doc_id, lang, n_chars,
          CAST(sum(n_chars) OVER (ORDER BY hkey, doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM h)
        SELECT doc_id, lang, n_chars, cum FROM c WHERE cum <= 50000
        ORDER BY doc_id""")),
    "group_sample" -> Q(
      // Exact-N stratified sample (X25): within each (lang, source) stratum
      // keep the 5 docs with the smallest salted-md5 rank — deterministic,
      // engine-portable (same md5 string ordering both sides), and exact
      // per-stratum counts (unlike the rate-based sample_mix). The rk <= 5
      // filter lets the optimizer insert WindowGroupLimit, so each task
      // keeps a 5-row heap per stratum instead of sorting whole strata —
      // the shape that survives billion-row strata.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang"), col("source"))
          .orderBy(md5(concat(lit("smp:"), col("doc_id").cast("string"))), col("doc_id"))
        docs(s, d).select(col("doc_id"), col("lang"), col("source"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 5)
          .orderBy("lang", "source", "rk")
      },
      Some("""SELECT doc_id, lang, source, rk FROM (
          SELECT doc_id, lang, source,
            CAST(row_number() OVER (PARTITION BY lang, source
              ORDER BY md5('smp:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
          FROM documents)
        WHERE rk <= 5 ORDER BY lang, source, rk""")))

  /** The ordered-funnel oracle, shared verbatim by `funnel_stages`
    * (declarative chain) and `funnel_state` (keyed-state FSM) — one
    * definition so the two implementations can never validate against
    * diverged semantics. */
  private val funnelOracleSql: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1),
          s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
            JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
          s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
            JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
        SELECT s1.user_id, t1, t2, t3,
          CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
                 + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS INT) AS stage
        FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
          LEFT JOIN s3 ON s2.user_id = s3.user_id
        ORDER BY s1.user_id"""

  // ---- §2.11 batch event analytics + retrieval index build (X20-X24) ---
  private val analyticsQueries: Seq[(String, Q)] = Seq(
    "funnel_stages" -> Q(
      // Ordered funnel (X20): earliest view → first click after it → first
      // purchase after that, per user, plus the deepest stage reached.
      // Every step shares the user_id partitioning (see Analytics.funnel's
      // scale note); the oracle re-derives the chain with sequential CTEs.
      (s, d) => Analytics.funnel(Tables.events(s, d), Seq("view", "click", "purchase"))
        .select(col("user_id"), col("t1"), col("t2"), col("t3"), col("stage"))
        .orderBy("user_id"),
      Some(funnelOracleSql)),
    "funnel_state" -> Q(
      // T7: the SAME funnel semantics as funnel_stages, but computed by the
      // keyed-state operator (mapGroupsWithState) through its batch path —
      // the oracle is identical, so the state machine's fold is pinned
      // against the declarative chain. The stream path (state carried
      // across real micro-batches) runs in StreamySpec.
      (s, d) => Streamy.funnelProgress(Tables.events(s, d)).toDF()
        .filter(col("t1_us").isNotNull)
        .select(col("user_id"),
          timestamp_micros(col("t1_us")).as("t1"),
          timestamp_micros(col("t2_us")).as("t2"),
          timestamp_micros(col("t3_us")).as("t3"),
          col("stage"))
        .orderBy("user_id"),
      Some(funnelOracleSql)),
    "retention_cohorts" -> Q(
      // Weekly cohort retention (X21): distinct active users per
      // (first-seen day, whole weeks since). Integer day arithmetic only —
      // both engines floor datediff/7 on identical ints.
      (s, d) => Analytics.retention(Tables.events(s, d))
        .orderBy("cohort_day", "week_off"),
      Some("""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
          c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
        SELECT cohort_day,
          CAST(floor(date_diff('day', cohort_day, day) / 7) AS BIGINT) AS week_off,
          count(DISTINCT e.user_id) AS users
        FROM e JOIN c ON e.user_id = c.user_id
        GROUP BY 1, 2 ORDER BY cohort_day, week_off""")),
    "tfidf_top" -> Q(
      // TF-IDF top terms (X22): per-document top-3 tokens by
      // tf · ln(N/df). The score is rounded to 6 decimals BEFORE ranking so
      // both engines make identical ordering decisions (the file-header
      // float-parity rule); ties break on token. Scale shape: two
      // token-keyed aggregates + one token equi-join (vocabulary-sized
      // build side, AQE decides broadcast), then a per-doc rank window the
      // optimizer caps with WindowGroupLimit — no vocab-wide sort, no
      // driver-side N (the corpus count rides in as a broadcast 1-row
      // cross join).
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = tokens(s, d)
        // (doc, token) grain is shared by the df rollup and the scored
        // join: LAZY DISK_ONLY checkpoint per the corpus-sized
        // shared-frame policy (Ckpt) — un-severed, each consumer re-ran
        // the tokenize + partial aggregate (no exchange reuse across the
        // subtrees; measured ~2.2 s per recompute at sf0.1). A
        // window-count df over the same frame was tried and REJECTED:
        // a hot token ("the") puts ~n_docs rows in one window partition
        // — a single-task wall at corpus scale that the map-side-partial
        // vocab aggregate + join shape never has.
        val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
          .diskCheckpointLazy()
        val dfq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        val nDocs = docs(s, d).agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score_r").desc, col("token").asc)
        tf.join(dfq, Seq("token"))
          .crossJoin(broadcast(nDocs))
          .withColumn("score_r",
            round(col("tf") * log(col("n_docs") / col("df")), 6))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("token"), col("tf"), col("df"),
            col("score_r"), col("rk"))
          .orderBy("doc_id", "rk")
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
          tok AS (SELECT doc_id, token FROM n, unnest(w) AS u(token)),
          tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
            FROM tok GROUP BY 1, 2),
          dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
          nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          sc AS (SELECT doc_id, tf.token AS token, tf, df,
              round(tf * ln(n_docs / df), 6) AS score_r
            FROM tf JOIN dfq ON tf.token = dfq.token CROSS JOIN nd),
          rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY score_r DESC, token ASC) AS BIGINT) AS rk FROM sc)
        SELECT doc_id, token, tf, df, score_r, rk FROM rk
        WHERE rk <= 3 ORDER BY doc_id, rk""")),
    "bm25_top" -> Q(
      // BM25 top terms (X45): per-document top-3 tokens by the Okapi BM25
      // weight (k1=1.2, b=0.75) — the retrieval scorer a curation pipeline
      // uses where TF-IDF saturates on long documents. Same scale shape as
      // tfidf_top plus one doc-keyed length join: token aggregates, a
      // vocabulary-sized df join (AQE decides broadcast), 1-row n/avgdl
      // frames broadcast, WindowGroupLimit caps the rank window. Scores
      // round to 6 decimals BEFORE ranking (house float-parity rule);
      // every decimal literal is forced to DOUBLE on the oracle side so
      // no DECIMAL intermediate can truncate differently.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = tokens(s, d)
        // shared (doc, token) grain, three consumers (dl, dfq, scored
        // join): lazy DISK_ONLY checkpoint — same rationale as tfidf_top
        val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
          .diskCheckpointLazy()
        val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
        val dfq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        val nDocs = docs(s, d).agg(count(lit(1)).as("n_docs"))
        val avgdl = dl.agg(avg(col("dl")).as("avgdl"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score_r").desc, col("token").asc)
        tf.join(dfq, Seq("token"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(nDocs))
          .crossJoin(broadcast(avgdl))
          .withColumn("idf",
            log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
          .withColumn("score_r", round(
            col("idf") * (col("tf") * lit(2.2)) /
              (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))), 6))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("token"), col("tf"), col("df"),
            col("dl"), col("score_r"), col("rk"))
          .orderBy("doc_id", "rk")
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
          tok AS (SELECT doc_id, token FROM n, unnest(w) AS u(token)),
          tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
            FROM tok GROUP BY 1, 2),
          dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
          dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
          nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          ad AS (SELECT avg(dl) AS avgdl FROM dl),
          sc AS (SELECT tf.doc_id AS doc_id, tf.token AS token, tf, df, dl.dl AS dl,
              round(ln((CAST(n_docs AS DOUBLE) - df + CAST(0.5 AS DOUBLE))
                  / (df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
                * (tf * CAST(2.2 AS DOUBLE))
                / (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
                   + CAST(0.75 AS DOUBLE) * dl.dl / avgdl)), 6) AS score_r
            FROM tf JOIN dfq ON tf.token = dfq.token
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN nd CROSS JOIN ad),
          rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY score_r DESC, token ASC) AS BIGINT) AS rk FROM sc)
        SELECT doc_id, token, tf, df, dl, score_r, rk FROM rk
        WHERE rk <= 3 ORDER BY doc_id, rk""")),
    "text_entropy" -> Q(
      // Token-entropy quality signal (X23): unigram Shannon entropy via the
      // summation-stable rearrangement H = ln(n) − Σ c·ln(c) / n, plus
      // type-token ratio. Σ c·ln(c) sums ≤ |vocab per doc| terms, so
      // partial-agg order noise is ~1e-13 — far under the 6-decimal round.
      // Two map-side-combinable aggregates, no window, no join.
      (s, d) => {
        val tok = tokens(s, d)
        tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_unique"),
            sum(col("c").cast("double") * log(col("c").cast("double"))).as("s"))
          .select(col("doc_id"), col("n_tokens"), col("n_unique"),
            round(log(col("n_tokens").cast("double")) - col("s") / col("n_tokens"), 6)
              .as("entropy_r"),
            round(col("n_unique").cast("double") / col("n_tokens"), 6).as("ttr_r"))
          .orderBy("doc_id")
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
          tok AS (SELECT doc_id, token FROM n, unnest(w) AS u(token)),
          tf AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
          a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
              CAST(count(*) AS BIGINT) AS n_unique,
              sum(c * ln(c)) AS s FROM tf GROUP BY doc_id)
        SELECT doc_id, n_tokens, n_unique,
          round(ln(n_tokens) - s / n_tokens, 6) AS entropy_r,
          round(CAST(n_unique AS DOUBLE) / n_tokens, 6) AS ttr_r
        FROM a ORDER BY doc_id""")),
    "index_postings" -> Q(
      // Inverted-index build (X24): token → document frequency + the first
      // 8 doc ids, for the 100 highest-df tokens. The posting list is
      // BOUNDED before collection: a per-token rank window (optimizer caps
      // it with WindowGroupLimit, so no full per-token sort) keeps 8 rows
      // per token, and only those are collect_list'd — the payload per
      // token is O(8) regardless of corpus size. df and postings share the
      // token partitioning; the top-100 is TakeOrdered, not a global sort.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = tokens(s, d)
        val perDoc = tok.select(col("token"), col("doc_id")).distinct()
        val dfq = perDoc.groupBy(col("token")).agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("token")).orderBy(col("doc_id"))
        val heads = perDoc
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 8)
          .groupBy(col("token"))
          .agg(array_join(
            transform(array_sort(collect_list(col("doc_id"))), _.cast("string")),
            ",").as("postings"))
        dfq.join(heads, Seq("token"))
          .orderBy(col("df").desc, col("token").asc)
          .limit(100)
          .select(col("token"), col("df"), col("postings"))
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
          tok AS (SELECT doc_id, token FROM n, unnest(w) AS u(token)),
          per AS (SELECT DISTINCT token, doc_id FROM tok),
          v AS (SELECT token, CAST(count(*) AS BIGINT) AS df,
              array_to_string(list_transform(list_slice(list_sort(list(doc_id)), 1, 8),
                x -> CAST(x AS VARCHAR)), ',') AS postings
            FROM per GROUP BY token)
        SELECT token, df, postings FROM v
        ORDER BY df DESC, token ASC LIMIT 100""")),
    "hist_values" -> Q(
      // Fixed-width value histogram (X26): 20 equal buckets between the
      // global min/max. The bounds ride in as a broadcast 1-row cross join
      // (no driver collect); the bucket id is pure per-row IEEE arithmetic
      // (identical cross-engine), and the per-bucket stats are exact
      // (count/min/max — no order-sensitive float sums). One
      // map-side-combinable aggregate after a stateless map.
      (s, d) => {
        val px = Tables.pixels(s, d).select(col("value"))
        val bounds = px.agg(min("value").as("lo"), max("value").as("hi"))
        px.crossJoin(broadcast(bounds))
          // degenerate hi == lo would divide 0/0: Spark floors NaN to 0
          // while DuckDB's NaN ranks above 19 in least() — guard explicitly
          // so both engines agree on single-value data
          .select(when(col("hi") === col("lo"), lit(0))
            .otherwise(least(lit(19), floor((col("value") - col("lo")) /
              ((col("hi") - col("lo")) / 20))).cast("int")).as("bucket"),
            col("value"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"), min("value").as("lo_v"), max("value").as("hi_v"))
          .orderBy("bucket")
      },
      Some(s"""WITH pixels AS (${Tables.pixelsSql}),
          b AS (SELECT min(value) AS lo, max(value) AS hi FROM pixels)
        SELECT CASE WHEN hi = lo THEN 0
            ELSE CAST(least(19, floor((value - lo) / ((hi - lo) / 20))) AS INT)
          END AS bucket,
          count(*) AS n, min(value) AS lo_v, max(value) AS hi_v
        FROM pixels CROSS JOIN b
        GROUP BY 1 ORDER BY bucket""")),
    "embed_centroids" -> Q(
      // Per-label centroid (X27): mean embedding per class, one row per
      // (label, dimension). posexplode → (label, dim)-keyed partial-avg —
      // a single shuffle whose cardinality is labels × dims, independent
      // of corpus size. The oracle zips DuckDB's parallel unnest of the
      // vector with its index range.
      (s, d) => {
        val e = Tables.embeddings(s, d).select(col("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
        e.groupBy(col("label"), col("dim"))
          .agg(round(avg("v"), 6).as("mean_r"), count(lit(1)).as("n"))
          .orderBy("label", "dim")
      },
      Some("""WITH x AS (SELECT label,
            CAST(unnest(range(len(embedding))) AS INT) AS dim,
            unnest(CAST(embedding AS DOUBLE[])) AS v
          FROM embeddings)
        SELECT label, dim, round(avg(v), 6) AS mean_r, count(*) AS n
        FROM x GROUP BY 1, 2 ORDER BY label, dim""")),
    "extract_winsor" -> Q(
      // Winsorized zone mean (X28): values clamped to the zone's
      // [p05, p95] before averaging — the robust-statistics companion to
      // the A-catalog mean. Both exact percentiles come from ONE
      // sketch-guided selection pass (Extracts.guidedQuantiles — same
      // values as the buffering percentile aggregate, bounded state;
      // measured rationale in SCALE.md --x100extracts), so the query is
      // three cheap column-pruned scans with no corpus-sized checkpoint
      // and no per-zone value buffer at any scale.
      (s, d) => {
        val px = Tables.pixels(s, d).select(col("asdf_id"), col("value"))
        val qs = Extracts.guidedQuantiles(px, Seq(0.05, 0.95),
          Seq("p05", "p95"))
        Extracts.joinOnZone(px, qs, "asdf_id")
          .select(col("asdf_id"),
            greatest(col("p05"), least(col("p95"), col("value"))).as("wv"))
          .groupBy("asdf_id")
          .agg(round(avg("wv"), 6).as("winsor_mean"), count(lit(1)).as("n"))
          .orderBy("asdf_id")
      },
      Some(s"""WITH pixels AS (${Tables.pixelsSql}),
          q AS (SELECT asdf_id, quantile_cont(value, 0.05) AS p05,
              quantile_cont(value, 0.95) AS p95
            FROM pixels GROUP BY asdf_id)
        SELECT pixels.asdf_id,
          round(avg(greatest(p05, least(p95, value))), 6) AS winsor_mean,
          count(*) AS n
        FROM pixels JOIN q ON pixels.asdf_id = q.asdf_id
        GROUP BY 1 ORDER BY pixels.asdf_id""")),
    "zone_corr" -> Q(
      // Per-zone correlation/covariance (X29): Pearson corr and sample
      // covariance of (value, weight) — the bivariate extension of the
      // std/var extracts. Single map-side-combinable aggregate; both
      // engines use the standard co-moment formulas, and the result is
      // rounded to 6 decimals like every cross-engine float decision.
      (s, d) => Tables.pixels(s, d)
        .groupBy("asdf_id")
        .agg(round(corr(col("value"), col("weight")), 6).as("corr_r"),
          round(covar_samp(col("value"), col("weight")), 6).as("covar_r"),
          count(lit(1)).as("n"))
        .orderBy("asdf_id"),
      Some(s"""WITH pixels AS (${Tables.pixelsSql})
        SELECT asdf_id, round(corr(value, weight), 6) AS corr_r,
          round(covar_samp(value, weight), 6) AS covar_r, count(*) AS n
        FROM pixels GROUP BY asdf_id ORDER BY asdf_id""")),
    "doc_chunks" -> Q(
      // Overlapping retrieval chunking (X30): 32-token windows every 24
      // tokens (8-token overlap) — the RAG-prep sibling of the
      // non-overlapping pack_sequences. Starts are a per-row integer
      // sequence (explode amplification ≤ n/stride per doc, bounded by doc
      // length); no shuffle before the verify sort.
      (s, d) => {
        val winSize = 32; val stride = 24
        docs(s, d)
          .select(col("doc_id"), split(LlmOps.normText(col("text")), " ").as("w"))
          .withColumn("n", size(col("w")))
          .select(col("doc_id"), col("w"), col("n"),
            explode(sequence(lit(0), greatest(col("n") - 1, lit(0)), lit(stride)))
              .as("start"))
          .select(col("doc_id"),
            (col("start") / stride).cast("long").as("chunk_idx"),
            col("start").cast("long").as("start"),
            least(lit(winSize), col("n") - col("start")).cast("long").as("chunk_len"),
            array_join(slice(col("w"), col("start") + 1, lit(winSize)), " ")
              .as("chunk_text"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
          st AS (SELECT doc_id, w, len(w) AS n, unnest(range(0, greatest(len(w), 1), 24)) AS start
            FROM n)
        SELECT doc_id, CAST(start / 24 AS BIGINT) AS chunk_idx,
          CAST(start AS BIGINT) AS start,
          CAST(least(32, n - start) AS BIGINT) AS chunk_len,
          array_to_string(w[start + 1 : start + 32], ' ') AS chunk_text
        FROM st ORDER BY doc_id, chunk_idx""")),
    "pmi_bigrams" -> Q(
      // PMI collocations (X31): pointwise mutual information of adjacent
      // token pairs, ln((n_ab/B) / ((n_a/T)(n_b/T))), support ≥ 5, top 50.
      // Scale shape: bigram + unigram counts are map-side-combinable
      // token-keyed aggregates; the two unigram attach joins are
      // vocabulary-sized (AQE broadcasts while small); T and B ride in as
      // broadcast 1-row frames; the PMI score is rounded to 6 decimals
      // BEFORE ranking (file-header float-parity rule) and the top-50 is
      // TakeOrdered, never a global sort.
      (s, d) => {
        // bigrams via the GUARDED shingle helper (Spark sequence(a, b)
        // counts DOWN when b < a — a one-token doc must contribute zero
        // bigrams, exactly like the oracle's empty range). Tokens never
        // contain spaces, so the pair splits back out unambiguously.
        val base = docs(s, d)
        val bi = base
          .repartition(LlmOps.spreadWidth(base))
          .withColumn("norm", LlmOps.normText(col("text")))
          .select(explode(LlmOps.bigramShingles("norm")).as("bg"))
          .select(substring_index(col("bg"), " ", 1).as("w1"),
            substring_index(col("bg"), " ", -1).as("w2"))
        // checkpoint BOTH rollups once (the zipf_fit lesson, r9 advice):
        // nab feeds the total-B aggregate AND the scored join chain, uni
        // feeds total-T AND two attach joins — without the sever each
        // consumer re-runs its full explode→groupBy corpus pass (measured
        // at the 5M-doc decade-3 tier: the query cost ~2× its single-pass
        // floor). DISK_ONLY: both frames are vocabulary-sized. The attach
        // joins are shuffle_hash-hinted because a checkpointed LogicalRDD
        // carries estimate stats — the r6 broadcast-cliff trap — and the
        // build rows here are short fixed-shape (token, count) pairs that
        // track the partition target ~1:1.
        val nab = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
          .diskCheckpointLazy()
        val uni = tokens(s, d).groupBy(col("token")).agg(count(lit(1)).as("n_u"))
          .diskCheckpointLazy()
        val totT = uni.agg(sum(col("n_u")).as("t_tok"))
        val totB = nab.agg(sum(col("n_ab")).as("b_tok"))
        nab.filter(col("n_ab") >= 5)
          .join(uni.withColumnRenamed("token", "w1").withColumnRenamed("n_u", "n_a")
            .hint("shuffle_hash"), Seq("w1"))
          .join(uni.withColumnRenamed("token", "w2").withColumnRenamed("n_u", "n_b")
            .hint("shuffle_hash"), Seq("w2"))
          .crossJoin(broadcast(totT)).crossJoin(broadcast(totB))
          .select(concat(col("w1"), lit(" "), col("w2")).as("bigram"),
            col("n_ab"),
            round(log((col("n_ab") / col("b_tok")) /
              ((col("n_a") / col("t_tok")) * (col("n_b") / col("t_tok")))), 6)
              .as("pmi_r"))
          .orderBy(col("pmi_r").desc, col("bigram").asc)
          .limit(50)
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
          bi AS (SELECT list_transform(range(greatest(len(w) - 1, 0)),
              i -> struct_pack(w1 := w[i+1], w2 := w[i+2])) AS bs FROM n),
          b AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM bi, unnest(bs) AS u(b)),
          nab AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_ab FROM b GROUP BY 1, 2),
          tok AS (SELECT token FROM n, unnest(w) AS u(token)),
          uni AS (SELECT token, CAST(count(*) AS BIGINT) AS n_u FROM tok GROUP BY 1),
          tt AS (SELECT CAST(sum(n_u) AS BIGINT) AS t_tok FROM uni),
          tb AS (SELECT CAST(sum(n_ab) AS BIGINT) AS b_tok FROM nab)
        SELECT nab.w1 || ' ' || nab.w2 AS bigram, n_ab,
          round(ln((n_ab / b_tok) / ((a.n_u / t_tok) * (c.n_u / t_tok))), 6) AS pmi_r
        FROM nab JOIN uni a ON nab.w1 = a.token JOIN uni c ON nab.w2 = c.token
        CROSS JOIN tt CROSS JOIN tb
        WHERE n_ab >= 5
        ORDER BY pmi_r DESC, bigram ASC LIMIT 50""")),
    "corpus_card" -> Q(
      // Corpus report card (X32): per-source dataset documentation rollup —
      // docs, languages, characters, token volume and vocabulary breadth.
      // The token frame joins doc metadata on the doc key (one shuffle),
      // then one map-side-combinable aggregate per source; output is
      // |sources|-sized.
      (s, d) => {
        val meta = docs(s, d).select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        val docStats = meta.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"))
        val tokStats = tokens(s, d)
          .join(meta.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy(col("source")).agg(
            count(lit(1)).as("total_tokens"),
            countDistinct(col("token")).as("vocab"))
        docStats.join(tokStats, Seq("source"))
          .orderBy("source")
      },
      Some(s"""WITH n AS (SELECT doc_id, source, lang, n_chars,
            string_split($normSql, ' ') AS w FROM documents),
          ds AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              count(DISTINCT lang) AS n_langs,
              CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM n GROUP BY 1),
          tok AS (SELECT doc_id, source, token FROM n, unnest(w) AS u(token)),
          ts AS (SELECT source, CAST(count(*) AS BIGINT) AS total_tokens,
              count(DISTINCT token) AS vocab FROM tok GROUP BY 1)
        SELECT ds.source AS source, n_docs, n_langs, total_chars, total_tokens, vocab
        FROM ds JOIN ts ON ds.source = ts.source
        ORDER BY source""")),
    "quality_tiles" -> Q(
      // Quantile binning (X33): per-language size quartiles with ntile
      // semantics — the distribution companion to the histogram
      // (equal-POPULATION buckets instead of equal-width). Deterministic
      // full-key ordering (n_chars, doc_id) makes both engines cut
      // identical tiles; the rollup is exact integer arithmetic. Since
      // round 7 the tile rides [[zonedNtile]] (per-language equi-depth
      // banded rank), so one giant language never serializes into a
      // single window task — the hot-zone escape SCALE.md X33 used to
      // leave as prose; the exact-ntile oracle is unchanged.
      (s, d) => {
        zonedNtile(docs(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
          "lang", "n_chars", Seq("doc_id"), 4, "tile")
          .groupBy(col("lang"), col("tile"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy("lang", "tile")
      },
      Some("""WITH t AS (SELECT lang, n_chars,
            CAST(ntile(4) OVER (PARTITION BY lang
              ORDER BY n_chars, doc_id) AS BIGINT) AS tile
          FROM documents)
        SELECT lang, tile, CAST(count(*) AS BIGINT) AS n_docs,
          min(n_chars) AS min_chars, max(n_chars) AS max_chars,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM t GROUP BY 1, 2 ORDER BY lang, tile""")),
    "sessionize_events" -> Q(
      // Batch gap sessionization (X34): a new session starts when a user's
      // inter-event gap reaches 30 min — the BATCH counterpart of the
      // streaming session window (T3), which at 100 TB is how historical
      // backfills run while T3 handles the live tail. The split rule is
      // gap >= 30 min, matching session_window's half-open [ts, ts+gap)
      // semantics exactly (an event landing exactly on the boundary opens
      // a new session in both paths). One window shuffle on user_id
      // serves both the lag and the running session counter (same
      // partitioning, same ordering — Spark plans a single sort); the
      // rollup reuses it too. All arithmetic is exact epoch-micros
      // integers; the (ts, event_id) full-key ordering makes the ROWS
      // running sum identical in both engines.
      (s, d) => sessionizedEvents(s, d)
        .withColumnRenamed("sid", "session_id")
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          timestamp_micros(min(col("us"))).as("start_ts"),
          timestamp_micros(max(col("us"))).as("end_ts"),
          ((max(col("us")) - min(col("us"))) / lit(1000000L)).cast("long").as("dur_s"))
        .orderBy("user_id", "session_id"),
      Some(s"""WITH $sessionCtes
        SELECT user_id, CAST(sid AS BIGINT) AS session_id,
          CAST(count(*) AS BIGINT) AS n_events,
          make_timestamp(min(us)) AS start_ts, make_timestamp(max(us)) AS end_ts,
          CAST(floor((max(us) - min(us)) / 1000000) AS BIGINT) AS dur_s
        FROM g GROUP BY user_id, sid ORDER BY user_id, session_id""")),
    "rolling_activity" -> Q(
      // Rolling time-range activity (X35): per event, the user's event
      // count and spend over the PRECEDING HOUR — a RANGE frame on epoch
      // seconds, the load-signal primitive behind rate limiting and
      // engagement scoring. One window shuffle on user_id; the frame is
      // evaluated incrementally (sliding min/max bounds over the sorted
      // run), never re-scanned per row. Spend is summed in exact integer
      // cents (floor(x*100+0.5) — the file-header float-parity rule)
      // because range-frame float summation order differs across engines
      // (DuckDB segment tree vs Spark running frame).
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hour = Window.partitionBy(col("user_id")).orderBy(col("sec"))
          .rangeBetween(-3600L, 0L)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"),
            // floor, not cast-truncate: exact mirror of the oracle's
            // floor(epoch_us/1e6) for pre-1970 timestamps too
            floor(unix_micros(col("ts")) / lit(1000000L)).cast("long").as("sec"),
            floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
          .select(col("user_id"), col("event_id"), col("ts"),
            count(lit(1)).over(hour).as("n_1h"),
            sum(col("cents")).over(hour).as("cents_1h"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, ts,
            CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS sec,
            CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT user_id, event_id, ts,
          count(*) OVER w AS n_1h,
          CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec
          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id""")),
    "top_paths" -> Q(
      // Top event paths (X36): each user's first-8-event type sequence,
      // ranked by how many users share it — the sequence-mining companion
      // to the funnel. The rank filter after row_number compiles to
      // WindowGroupLimit (per-partition top-8 kept map-side, like
      // group_sample/tfidf_top); the path build is one user-keyed
      // aggregate whose output cardinality is |users|, then a path-keyed
      // count and a TakeOrdered top-20 — no global sort.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ord = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("rn", row_number().over(ord))
          .filter(col("rn") <= 8)
          .groupBy(col("user_id"))
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("us"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
          .groupBy(col("path"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path"))
          .limit(20)
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
            row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events),
          p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY us, event_id) AS path
            FROM e WHERE rn <= 8 GROUP BY 1)
        SELECT path, CAST(count(*) AS BIGINT) AS n_users
        FROM p GROUP BY 1 ORDER BY n_users DESC, path LIMIT 20""")),
    "rollup_report" -> Q(
      // Hierarchical rollup (X37): customer counts and balances at
      // (region, nation), per-region subtotal, and grand-total levels in
      // ONE pass — Spark expands ROLLUP to grouping sets inside a single
      // partial/final aggregate instead of three scans + union. Balances
      // sum in exact integer cents; `lvl` (grouping_id) disambiguates a
      // real NULL key from a rolled-up one. The two dimension joins
      // broadcast (25-row nation, 5-row region). DuckDB sorts NULLs last
      // by default — Spark's asc is NULLS FIRST, so the oracle pins
      // NULLS FIRST explicitly.
      (s, d) => Tables.t(s, d, "customer")
        .join(broadcast(Tables.t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("region"), col("n_name").as("nation"),
          floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("cents"))
        .rollup(col("region"), col("nation"))
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("cents"),
          (grouping(col("region")) * 2 + grouping(col("nation"))).cast("int").as("lvl"))
        .orderBy(col("lvl"), col("region"), col("nation")),
      Some("""SELECT r_name AS region, n_name AS nation,
          CAST(count(*) AS BIGINT) AS n_cust,
          CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
          CAST(grouping(r_name) * 2 + grouping(n_name) AS INT) AS lvl
        FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY lvl, region NULLS FIRST, nation NULLS FIRST""")),
    "set_ops_users" -> Q(
      // Set algebra (X38): INTERSECT (viewed AND purchased) and EXCEPT
      // (viewed but never purchased) in one tagged frame — the audience
      // segmentation primitive. Spark plans both as hash aggregates over
      // a user_id shuffle (set semantics = dedup built in); the two
      // branches share the same scan via exchange reuse. Output
      // cardinality is |users| — never event-scale.
      (s, d) => {
        val e = Tables.events(s, d)
        def ids(t: String) = e.filter(col("event_type") === t).select(col("user_id"))
        val v = ids("view"); val p = ids("purchase")
        v.intersect(p).withColumn("tag", lit("both"))
          .unionByName(v.except(p).withColumn("tag", lit("view_only")))
          .select(col("tag"), col("user_id"))
          .orderBy("tag", "user_id")
      },
      Some("""SELECT 'both' AS tag, user_id FROM (
          SELECT user_id FROM events WHERE event_type = 'view'
          INTERSECT
          SELECT user_id FROM events WHERE event_type = 'purchase')
        UNION ALL
        SELECT 'view_only' AS tag, user_id FROM (
          SELECT user_id FROM events WHERE event_type = 'view'
          EXCEPT
          SELECT user_id FROM events WHERE event_type = 'purchase')
        ORDER BY tag, user_id""")),
    "rank_percentile" -> Q(
      // Distribution position (X39): percent_rank and cume_dist of each
      // document's size within its language — the per-row companion to
      // the quantile tiles. Both are exact integer-ratio windows
      // ((rank-1)/(n-1), peers/n) so cross-engine parity is exact; the
      // 6-decimal rounding is the house float-output rule, not a
      // decision boundary. One window shuffle on lang.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
        docs(s, d).select(col("doc_id"), col("lang"), col("n_chars"))
          .withColumn("pr_r", round(percent_rank().over(w), 6))
          .withColumn("cd_r", round(cume_dist().over(w), 6))
          .orderBy("lang", "n_chars", "doc_id")
      },
      Some("""SELECT doc_id, lang, n_chars,
          round(percent_rank() OVER w, 6) AS pr_r,
          round(cume_dist() OVER w, 6) AS cd_r
        FROM documents
        WINDOW w AS (PARTITION BY lang ORDER BY n_chars)
        ORDER BY lang, n_chars, doc_id""")),
    "outlier_zscore" -> Q(
      // Z-score outlier screen (X40): per-zone standard scores, rolled up
      // to (zone, n, n_out, max |z|) — the anomaly-detection companion to
      // the std/var extracts. The stats frame is |zones|-sized and joins
      // back under AQE as a broadcast; z is rounded to 6 decimals BEFORE
      // the |z| > 2 decision so both engines flag identical rows (the
      // tfidf round-before-rank rule). Degenerate zones (constant or
      // single-row → sd 0/NULL) score 0 by definition in both engines.
      (s, d) => {
        val px = Tables.pixels(s, d).select(col("asdf_id"), col("value"))
        val st = px.groupBy("asdf_id").agg(
          avg("value").as("mu"), stddev_samp(col("value")).as("sd"))
        px.join(st, Seq("asdf_id"))
          .select(col("asdf_id"),
            when(col("sd").isNull || col("sd") === 0, lit(0.0))
              .otherwise(round((col("value") - col("mu")) / col("sd"), 6))
              .as("z_r"))
          .groupBy("asdf_id")
          .agg(count(lit(1)).as("n"),
            sum(when(abs(col("z_r")) > 2, 1L).otherwise(0L)).as("n_out"),
            max(abs(col("z_r"))).as("max_z"))
          .orderBy("asdf_id")
      },
      Some(s"""WITH pixels AS (${Tables.pixelsSql}),
          st AS (SELECT asdf_id, avg(value) AS mu, stddev_samp(value) AS sd
            FROM pixels GROUP BY asdf_id),
          z AS (SELECT pixels.asdf_id,
              CASE WHEN sd IS NULL OR sd = 0 THEN 0.0
                ELSE round((value - mu) / sd, 6) END AS z_r
            FROM pixels JOIN st ON pixels.asdf_id = st.asdf_id)
        SELECT asdf_id, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN abs(z_r) > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
          max(abs(z_r)) AS max_z
        FROM z GROUP BY asdf_id ORDER BY asdf_id""")),
    "daily_spine" -> Q(
      // Gap-filled daily series (X41): a generated date spine left-joined
      // to per-day counts, zero-filled, with a running total — the
      // time-series regularization step every downstream charting/model
      // feed needs. The spine derives from the data's own min/max day
      // (one 1-row aggregate), the join is broadcast (spine = |days|
      // rows), and the running sum's unpartitioned window is BOUNDED BY
      // THE CALENDAR — days, not events — so the single-task sort is a
      // non-issue at any corpus size (same argument as queue_rank, but
      // structural: the frame is already |days| long before the window).
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d).select(to_date(col("ts")).as("day"))
        val byDay = ev.groupBy(col("day")).agg(count(lit(1)).as("n"))
        val spine = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("interval 1 day"))).as("day"))
        val run = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(byDay, Seq("day"), "left")
          .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
          .withColumn("cum_n", sum(col("n")).over(run))
          .orderBy("day")
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
            CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
          b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
          s AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
              CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM b)
        SELECT s.day AS day, COALESCE(n, 0) AS n,
          CAST(sum(COALESCE(n, 0)) OVER (ORDER BY s.day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
        FROM s LEFT JOIN d ON s.day = d.day
        ORDER BY day""")),
    "path_transitions" -> Q(
      // Markov transition matrix (X42): consecutive event-type pairs per
      // user ordered by (ts, event_id), rolled up to (src, dst, count,
      // probability) — the sequence-model input next to top_paths' literal
      // prefixes. One window shuffle on user_id (the same partitioning the
      // session family uses), then a |types|²-row aggregate, so the
      // exchange after the window moves almost nothing. The probability is
      // an exact integer ratio; the 6-decimal rounding is the house
      // float-output rule, not a decision boundary.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ord = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val nxt = eventsUs(s, d)
          .withColumn("dst", lead(col("event_type"), 1).over(ord))
          .filter(col("dst").isNotNull)
        val counts = nxt.groupBy(col("event_type").as("src"), col("dst"))
          .agg(count(lit(1)).as("n"))
        // per-source totals: |types| rows — window over the tiny aggregate,
        // not over the event stream
        val bySrc = Window.partitionBy(col("src"))
        counts.withColumn("p_r", round(col("n") / sum(col("n")).over(bySrc), 6))
          .orderBy("src", "dst")
      },
      Some("""WITH nxt AS (SELECT event_type AS src,
            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
          FROM events),
          c AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM nxt
            WHERE dst IS NOT NULL GROUP BY src, dst)
        SELECT src, dst, n, round(n / sum(n) OVER (PARTITION BY src), 6) AS p_r
        FROM c ORDER BY src, dst""")),
    "skyline_users" -> Q(
      // Pareto frontier (X43): users not strictly dominated on (event
      // count, total spend) — the multi-objective "best" screen (data
      // curation uses the same shape for quality-vs-coverage corpus
      // picks). The naive formulation is an N² self-join; the scale path
      // here is: per-user aggregate (one shuffle), max-spend per distinct
      // count (|counts| rows), a running max over the DISTINCT counts
      // descending — a window bounded by |distinct x|, not users — then
      // one join back to keep frontier rows. Spend is per-row integer
      // cents (floor(x*100+0.5)) summed exactly, so the dominance
      // decisions are integer-exact in both engines. The oracle is the
      // independent NOT EXISTS dominance formulation, so the semantics —
      // not the construction — are what's pinned.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val u = Tables.events(s, d)
          .select(col("user_id"), cents(col("value")).as("c"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), sum(col("c")).as("cents"))
        val ymax = u.groupBy(col("n_events")).agg(max(col("cents")).as("ymax"))
        // running max of ymax over STRICTLY greater counts; frame length =
        // distinct event-counts (bounded, nowhere near user cardinality)
        val above = Window.orderBy(col("n_events").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val frontier = ymax
          .withColumn("best_above", max(col("ymax")).over(above))
          .filter(col("best_above").isNull || col("ymax") > col("best_above"))
        u.join(frontier.select(col("n_events"), col("ymax")), Seq("n_events"))
          .filter(col("cents") === col("ymax"))
          .select(col("user_id"), col("n_events"), col("cents"))
          .orderBy("n_events", "user_id")
      },
      Some("""WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
            CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
          FROM events GROUP BY user_id)
        SELECT user_id, n_events, cents FROM u a
        WHERE NOT EXISTS (SELECT 1 FROM u b
          WHERE b.n_events >= a.n_events AND b.cents >= a.cents
            AND (b.n_events > a.n_events OR b.cents > a.cents))
        ORDER BY n_events, user_id""")),
    "type2_history" -> Q(
      // SCD Type-2 change history (X47): compact each user's event-type
      // stream into validity intervals — keep only CHANGE rows (first
      // event or type ≠ previous), stamp valid_from = change time,
      // valid_to = next change time (NULL = current), version = change
      // ordinal. The dimension-table build step every warehouse feed
      // needs. Both windows share one user-keyed sort (lag on the full
      // stream, lead/row_number on the compacted rows — Spark reuses the
      // exchange, adds one re-sort over the much smaller change set).
      // All values are exact integers; (us, event_id) full-key ordering
      // makes the lag decisions identical in both engines.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ord = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val changes = eventsUs(s, d)
          .withColumn("prev", lag(col("event_type"), 1).over(ord))
          .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        changes
          .withColumn("valid_to", lead(col("us"), 1).over(ord))
          .withColumn("version", row_number().over(ord).cast("long"))
          .select(col("user_id"), col("version"), col("event_type").as("state"),
            col("us").as("valid_from"), col("valid_to"))
          .orderBy("user_id", "version")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
            FROM events),
          f AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
              ORDER BY us, event_id) AS prev FROM e),
          g AS (SELECT * FROM f WHERE prev IS NULL OR prev <> event_type)
        SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version,
          event_type AS state, us AS valid_from, lead(us) OVER w AS valid_to
        FROM g WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ORDER BY user_id, version""")),
    "assoc_rules" -> Q(
      // Association rules (X63): market-basket mining over sessions —
      // baskets are the gap-sessions (shared [[sessionCtes]] rule), items
      // are event types, and each ordered type pair (a ≠ b) gets
      // support(a,b), confidence(a→b) and lift — the cross-sell /
      // next-event signal. Scale shape: distinct (session, type) first
      // (collapses event volume to ≤ |sessions|·|types| rows), the pair
      // join blocks on session id (baskets are tiny — bounded by
      // |types|, so never quadratic in events), and every ratio is an
      // exact integer quotient rounded at output. The basket universe
      // (|sessions|) rides in as a broadcast 1-row frame.
      (s, d) => {
        // four consumers (basket count, singles, both pair sides) re-ran
        // the sessionize window + distinct without this sever: DISK_ONLY
        // per the corpus-sized shared-frame policy (r16)
        val items = sessionizedEvents(s, d)
          .select(col("user_id"), col("sid"), col("event_type")).distinct()
          .diskCheckpointLazy()
        val nBaskets = items.select(col("user_id"), col("sid")).distinct()
          .agg(count(lit(1)).as("n_baskets"))
        val single = items.groupBy(col("event_type")).agg(count(lit(1)).as("n_a"))
        // the self-join sides are the CHECKPOINTED corpus-proportional
        // frame — LogicalRDD estimate stats must never pick a broadcast
        // build here (the r6 cliff; DriveBroadcastAudit flags it), so
        // the join strategy is pinned merge: basket-keyed sort streams
        // through a spillable sorter at any scale
        val pairs = items.toDF("user_id", "sid", "a")
          .join(items.toDF("user_id", "sid", "b").hint("merge"),
            Seq("user_id", "sid"))
          .filter(col("a") =!= col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
        pairs
          .join(single.toDF("a", "n_a"), Seq("a"))
          .join(single.toDF("b", "n_b"), Seq("b"))
          .crossJoin(broadcast(nBaskets))
          .select(col("a"), col("b"), col("n_ab"),
            round(col("n_ab") / col("n_baskets"), 6).as("support_r"),
            round(col("n_ab") / col("n_a"), 6).as("confidence_r"),
            round(col("n_ab") * col("n_baskets") /
              (col("n_a") * col("n_b")), 6).as("lift_r"))
          .orderBy("a", "b")
      },
      Some(s"""WITH $sessionCtes,
          items AS (SELECT DISTINCT user_id, sid, event_type FROM g),
          nb AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets FROM
            (SELECT DISTINCT user_id, sid FROM items)),
          single AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
            FROM items GROUP BY 1),
          pairs AS (SELECT x.event_type AS a, y.event_type AS b,
              CAST(count(*) AS BIGINT) AS n_ab
            FROM items x JOIN items y ON x.user_id = y.user_id
              AND x.sid = y.sid AND x.event_type <> y.event_type
            GROUP BY 1, 2)
        SELECT a, b, n_ab,
          round(CAST(n_ab AS DOUBLE) / n_baskets, 6) AS support_r,
          round(CAST(n_ab AS DOUBLE) / sa.n, 6) AS confidence_r,
          round(CAST(n_ab AS DOUBLE) * n_baskets / (sa.n * sb.n), 6) AS lift_r
        FROM pairs JOIN single sa ON pairs.a = sa.event_type
          JOIN single sb ON pairs.b = sb.event_type
          CROSS JOIN nb
        ORDER BY a, b""")),
    "drift_bands" -> Q(
      // Distribution-drift bands (X65): weekly exact p50/p95 of the value
      // stream plus volume — the monitoring feed that catches an input
      // distribution shifting under a model (the temporal companion to
      // the per-zone percentile extract). One |weeks|-keyed aggregate;
      // exact interpolated percentiles in both engines; the band values
      // round at output only (house rule), never feeding a decision.
      (s, d) => {
        val wk = Tables.events(s, d)
          .select(to_date(date_trunc("week", col("ts"))).as("wk"), col("value"))
        // guided selection for the weekly percentiles: same values as the
        // buffering aggregate with bounded state per week
        Extracts.joinOnZone(
            wk.groupBy(col("wk")).agg(count(lit(1)).as("n")),
            Extracts.guidedQuantiles(
              wk, Seq(0.5, 0.95), Seq("q50", "q95"), zone = "wk"), "wk")
          .select(col("wk"), col("n"), round(col("q50"), 6).as("p50_r"),
            round(col("q95"), 6).as("p95_r"))
          .orderBy("wk")
      },
      Some("""SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
          CAST(count(*) AS BIGINT) AS n,
          round(quantile_cont(value, 0.5), 6) AS p50_r,
          round(quantile_cont(value, 0.95), 6) AS p95_r
        FROM events GROUP BY 1 ORDER BY wk""")),
    "drift_bands_sketch" -> Q(
      // drift_bands' 100 TB variant: weekly p50/p95 via the mergeable GK
      // sketch (percentile_approx — O(accuracy) reducer state instead of
      // buffering each week's value set), gated exactly like
      // extract_percentile_sketch: the exact bands stay value-oracled,
      // and the oracle asserts TRUE for the sketch's rank-error bounds,
      // measured by Spark against the same stream.
      (s, d) => {
        val acc = 1000
        val wk = Tables.events(s, d)
          .select(to_date(date_trunc("week", col("ts"))).as("wk"), col("value"))
        // the exact bands ride guided selection (bounded state); only the
        // GK sketch under test stays in the main aggregate. joinOnZone =
        // null-safe attach (a NULL week group must survive, as groupBy
        // keeps it)
        val agg = Extracts.joinOnZone(
            wk.groupBy(col("wk"))
              .agg(count(lit(1)).as("n"),
                percentile_approx(col("value"), array(lit(0.5), lit(0.95)),
                  lit(acc)).as("pa"))
              .select(col("wk"), col("n"),
                element_at(col("pa"), 1).as("a50"),
                element_at(col("pa"), 2).as("a95")),
            Extracts.guidedQuantiles(
              wk, Seq(0.5, 0.95), Seq("q50", "q95"), zone = "wk"), "wk")
          .select(col("wk"), col("n"), round(col("q50"), 6).as("p50_r"),
            round(col("q95"), 6).as("p95_r"), col("a50"), col("a95"))
          // |weeks|-row frame referenced twice (rank-check broadcast +
          // final join) whose lineage includes the whole sketch + guided
          // pipeline: lazy small checkpoint, or both passes run twice
          // (r17 — the same double-reference the engine severs everywhere)
          .smallCheckpointLazy()
        val ranks = wk.join(broadcast(agg.select("wk", "a50", "a95")), "wk")
          .groupBy(col("wk"))
          .agg(sum(when(col("value") <= col("a50"), 1L).otherwise(0L)).as("le50"),
            sum(when(col("value") < col("a50"), 1L).otherwise(0L)).as("lt50"),
            sum(when(col("value") <= col("a95"), 1L).otherwise(0L)).as("le95"),
            sum(when(col("value") < col("a95"), 1L).otherwise(0L)).as("lt95"))
        val accD = lit(acc.toDouble)
        agg.join(ranks, "wk")
          .select(col("wk"), col("n"), col("p50_r"), col("p95_r"),
            (col("le50") >= floor(lit(0.5) * col("n") - col("n") / accD) &&
              col("lt50") <= ceil(lit(0.5) * col("n") + col("n") / accD) &&
              col("le95") >= floor(lit(0.95) * col("n") - col("n") / accD) &&
              col("lt95") <= ceil(lit(0.95) * col("n") + col("n") / accD))
              .as("within_bound"))
          .orderBy("wk")
      },
      Some("""SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
          CAST(count(*) AS BIGINT) AS n,
          round(quantile_cont(value, 0.5), 6) AS p50_r,
          round(quantile_cont(value, 0.95), 6) AS p95_r,
          TRUE AS within_bound
        FROM events GROUP BY 1 ORDER BY wk""")),
    "incremental_daily" -> Q(
      // Incremental view maintenance (X64): the daily rollup maintained
      // the way a 100 TB deployment actually maintains it — per-day
      // partial aggregates memoized in the content-addressed [[Cache]]
      // (the engine's own layer, here inside an oracled query), combined
      // algebraically into the serving view. A new day's arrival costs
      // ONE partition's aggregation + the |days|-sized combine; history
      // never recomputes. The oracle is the from-scratch GROUP BY, so
      // what's pinned is exactly the invariant that matters: incremental
      // == full recompute. The day list is a 1-aggregate collect
      // (calendar-bounded, metadata scale); per-day partials are
      // count/cents pairs — algebraic, so the combine is a sum.
      (s, d) => {
        import s.implicits._
        // the cache root mixes a CONTENT fingerprint of the events table
        // (file names+sizes+mtimes) into the key: a fixture regenerated at
        // the same path must version the cache, not probe-hit stale
        // partials — silently combining them would break the operator's
        // own "incremental == full recompute" invariant. Two concurrent
        // runs over different data at one path separate the same way.
        val cache = new Cache(s, Cache.contentRoot("graft_incr", d, "events"))
        val e = Tables.events(s, d)
          .select(to_date(col("ts")).as("day"), col("event_type"),
            cents(col("value")).as("c"))
        // keys must stay catalog-identifier-safe (the bucketed-layout
        // probe parses them as table names): dashless day
        def keyOf(day: String) = s"daily_${day.replace("-", "")}"
        val days = e.select(col("day")).distinct()
          .orderBy("day").collect().map(_.getDate(0).toString)
        // set-level miss detection (ONE anti-join over the done set), then
        // ONE grouped job fills every missing day via a partitioned write —
        // never a per-day sequential compute loop, which serializes on the
        // driver at 10⁵ partition-days. The collected frames are calendar-
        // bounded (|days|), metadata scale.
        val missingDays = cache.misses(
            days.map(dd => (keyOf(dd), dd)).toSeq.toDF("key", "day_str"))
          .select("day_str").as[String].collect().sorted
        if (missingDays.nonEmpty) {
          val partials = e.filter(col("day")
              .isin(missingDays.map(java.sql.Date.valueOf).toSeq: _*))
            .groupBy(col("day"), col("event_type"))
            .agg(count(lit(1)).as("n"), sum(col("c")).as("cents_sum"))
            .withColumn("day_part", date_format(col("day"), "yyyyMMdd"))
          cache.fillManyPartitioned(partials, "day_part", v => s"daily_$v")
        }
        cache.flushDone()
        // ONE multi-path scan over all day partials, not an N-way union
        cache.readMany(days.map(keyOf).toSeq)
          .groupBy(col("day"), col("event_type"))
          .agg(sum(col("n")).as("n"), sum(col("cents_sum")).as("cents_sum"))
          .orderBy("day", "event_type")
      },
      Some("""SELECT CAST(ts AS DATE) AS day, event_type,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents_sum
        FROM events GROUP BY 1, 2 ORDER BY day, event_type""")),
    "json_props" -> Q(
      // Semi-structured extraction (X48): parse the `props` JSON column
      // with an explicit schema (`from_json` — typed schema-on-read, the
      // Spark idiom for event-property bags) and aggregate the extracted
      // field per event type. The parse is a per-row codegen'd projection;
      // the rollup is one |types|-row hash aggregate; all outputs are
      // exact integers. Oracle uses DuckDB's native json_extract — an
      // independent JSON parser, so the extraction semantics (not the
      // construction) are what's pinned.
      (s, d) => {
        import org.apache.spark.sql.types.{StructType, StructField, LongType}
        val sch = StructType(Seq(StructField("k", LongType)))
        Tables.events(s, d)
          .withColumn("k", from_json(col("props"), sch).getField("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
            count_distinct(col("k")).as("uniq_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          CAST(count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS uniq_k,
          CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
          CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type""")),
    "debounce_events" -> Q(
      // Throttle/debounce (X49): drop repeat (user, type) events arriving
      // within 1 h of their PREDECESSOR — the per-source rate limit an
      // ingest feed applies (threshold is a parameter; 1 h makes the rule
      // bite at the fixture's arrival rate). Burst-LEADER flavor (a chain
      // of sub-gap-spaced events collapses to its first event):
      // one lag per (user_id, event_type) and a gap filter, exact integer
      // micros, one window shuffle. The survivor-gap flavor ("keep when
      // ≥5 s since the last KEPT event") is inherently sequential — that
      // is [[Streamy]] FSM territory, not a window — so the declarative
      // op pins the flavor both engines can compute identically.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ord = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("us"), col("event_id"))
        eventsUs(s, d)
          .withColumn("gap", col("us") - lag(col("us"), 1).over(ord))
          .filter(col("gap").isNull || col("gap") >= lit(3600000000L))
          .select(col("user_id"), col("event_type"), col("event_id"), col("us"))
          .orderBy("user_id", "event_type", "us")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
            FROM events),
          f AS (SELECT *, us - lag(us) OVER (PARTITION BY user_id, event_type
              ORDER BY us, event_id) AS gap FROM e)
        SELECT user_id, event_type, event_id, us FROM f
        WHERE gap IS NULL OR gap >= 3600000000
        ORDER BY user_id, event_type, us""")),
    "weighted_sample" -> Q(
      // Deterministic weighted sampling without replacement (X50):
      // Efraimidis-Spirakis A-Res — key = ln(u)/w with u a deterministic
      // md5-derived uniform and w = n_chars; the global top-20 by key is
      // an exact-size weighted sample, reproducible across engines and
      // runs (the property a training-mix builder needs for audits).
      // u = (first 6 md5 hex digits + 1) / (16^6 + 1) ∈ (0,1] exactly in
      // both engines; the key rounds to 12 decimals BEFORE ranking (key
      // magnitudes are ~1e-3·1/w, so 6 house decimals would quantize the
      // order away; 12 keeps ~1e-12 boundaries against ~1e-19 cross-engine
      // noise), ties break on doc_id. Scale shape: stateless per-row key
      // + one TakeOrdered(20) — no shuffle at all beyond the final gather.
      (s, d) => {
        // value of md5(doc_id)'s first 6 hex digits as an integer — one
        // md5 + one base-16 parse (the oracle mirrors it digit-by-digit
        // via the shared hexv contract; DuckDB 1.0 has no conv())
        val u6 = conv(substring(md5(col("doc_id").cast("string")), 1, 6),
          16, 10).cast("long")
        docs(s, d)
          .withColumn("u", (u6 + lit(1.0)) / lit(16777217.0))
          .withColumn("key_r", round(log(col("u")) / col("n_chars"), 12))
          .select(col("doc_id"), col("lang"), col("n_chars"), col("key_r"))
          .orderBy(col("key_r").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH k AS (SELECT doc_id, lang, n_chars,
            (CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT) * 1048576 +
             (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 65536 +
             (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 4096 +
             (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * 256 +
             (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * 16 +
             (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 6, 1)) - 1)) AS u6
          FROM documents)
        SELECT doc_id, lang, n_chars,
          round(ln((u6 + CAST(1.0 AS DOUBLE)) / CAST(16777217.0 AS DOUBLE)) / n_chars, 12) AS key_r
        FROM k ORDER BY key_r DESC, doc_id LIMIT 20""")),
    "session_attribution" -> Q(
      // Point-in-interval attribution (X52): attach each purchase to the
      // session CONTAINING it. The naive formulation is a range join
      // (purchases × sessions with BETWEEN — O(P·S) per user); the scale
      // path here reuses the as-of machinery: sessions are per-user
      // non-overlapping and ordered, so "the latest session starting at
      // or before the purchase" IS the containing session — one union +
      // one running last-non-null window ([[graft.ops.AsOf]]), no range
      // join anywhere. The containment bound survives as an explicit
      // filter (structurally always true here because a purchase is an
      // event of its own session; it guards the general contract where
      // intervals need not cover the points). The oracle is the
      // independent BETWEEN-join formulation, so the semantics — not the
      // construction — are what's pinned.
      (s, d) => {
        val sess = sessionizedEvents(s, d).groupBy(col("user_id"), col("sid"))
          .agg(min(col("us")).as("sstart_us"), max(col("us")).as("send_us"))
          .select(col("user_id"), col("sstart_us").as("us"),
            col("sid"), col("sstart_us"), col("send_us"))
        // purchases come in INTERVAL-BLIND (no session tag) — the point
        // of the operator is attaching membership from the intervals
        // alone, the shape that holds when the intervals come from
        // elsewhere (a prior job, another table)
        val purchases = eventsUs(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("us"), col("event_id"))
        AsOf.join(purchases, sess, "user_id", "us",
            Seq("sid", "sstart_us", "send_us"))
          .filter(col("us") <= col("send_us"))
          .select(col("user_id"), col("event_id"), col("sid"),
            col("sstart_us"), col("send_us"))
          .orderBy("user_id", "event_id")
      },
      Some(s"""WITH $sessionCtes,
          sess AS (SELECT user_id, sid, min(us) AS sstart_us, max(us) AS send_us
            FROM g GROUP BY 1, 2),
          p AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'purchase')
        SELECT p.user_id, p.event_id, CAST(sess.sid AS BIGINT) AS sid,
          sess.sstart_us, sess.send_us
        FROM p JOIN sess ON p.user_id = sess.user_id
          AND p.us BETWEEN sess.sstart_us AND sess.send_us
        ORDER BY p.user_id, p.event_id""")),
    "cumulative_users" -> Q(
      // Exact cumulative distinct users (X53): a running COUNT(DISTINCT)
      // is holistic — per-day distinct state grows with history and no
      // window computes it exactly. The first-occurrence trick makes it
      // algebraic: a user contributes to distinct-growth exactly once, on
      // their FIRST day — so min(day) per user, count per day, running
      // sum. Two map-side-combinable aggregates and a |days|-bounded
      // window (the daily_spine argument); no distinct state anywhere.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val firstSeen = e.groupBy(col("user_id")).agg(min(col("day")).as("day"))
        val newBy = firstSeen.groupBy(col("day")).agg(count(lit(1)).as("n_new"))
        val run = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.select(col("day")).distinct()
          .join(newBy, Seq("day"), "left")
          .select(col("day"), coalesce(col("n_new"), lit(0L)).as("n_new"))
          .withColumn("cum_users", sum(col("n_new")).over(run))
          .orderBy("day")
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
          f AS (SELECT user_id, min(day) AS day FROM e GROUP BY 1),
          nb AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM f GROUP BY 1),
          ds AS (SELECT DISTINCT day FROM e)
        SELECT ds.day AS day, COALESCE(n_new, 0) AS n_new,
          CAST(sum(COALESCE(n_new, 0)) OVER (ORDER BY ds.day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        FROM ds LEFT JOIN nb ON ds.day = nb.day ORDER BY day""")),
    "wow_growth" -> Q(
      // Week-over-week growth (X54): weekly rollup (integer cents), lag,
      // exact-ratio percent change rounded at output. The lag window is
      // CALENDAR-bounded (|weeks| rows) like the spine; both engines
      // truncate weeks to Monday. First week (no predecessor) and a zero
      // base yield NULL growth in both engines.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wk = Tables.events(s, d)
          .select(to_date(date_trunc("week", col("ts"))).as("wk"),
            cents(col("value")).as("c"))
          .groupBy(col("wk"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("cents"))
        val w = Window.orderBy(col("wk"))
        wk.withColumn("prev_cents", lag(col("cents"), 1).over(w))
          .withColumn("wow_r",
            when(col("prev_cents").isNull || col("prev_cents") === 0, lit(null))
              .otherwise(round((col("cents") - col("prev_cents")) /
                col("prev_cents").cast("double"), 6)))
          .select(col("wk"), col("n"), col("cents"), col("wow_r"))
          .orderBy("wk")
      },
      Some("""WITH wk AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
          FROM events GROUP BY 1),
          l AS (SELECT *, lag(cents) OVER (ORDER BY wk) AS prev_cents FROM wk)
        SELECT wk, n, cents,
          CASE WHEN prev_cents IS NULL OR prev_cents = 0 THEN NULL
            ELSE round((cents - prev_cents) / CAST(prev_cents AS DOUBLE), 6) END AS wow_r
        FROM l ORDER BY wk""")),
    "snapshot_diff" -> Q(
      // Snapshot diff (X55): the cache-audit primitive — compare two
      // versions of a derived table (per-part mean price, 1995 vs 1996)
      // and classify every key as added / removed / changed / unchanged.
      // One full-outer join of two aggregate frames (both key-partitioned,
      // AQE decides the strategy); values round to 6 decimals BEFORE the
      // equality decision so both engines classify identically. This is
      // what invalidation tooling runs against the content-addressed
      // cache when an upstream dataset re-versions.
      (s, d) => {
        // ONE scan, one shuffle: conditional aggregation computes both
        // versions in a single groupBy (avg ignores the other year's
        // nulls), replacing the two-scan + full-outer-join formulation —
        // the oracle keeps the join form, so both shapes stay pinned
        Tables.pixels(s, d)
          .filter(col("temporal").isin(1995, 1996))
          .groupBy(col("l_partkey"))
          .agg(
            round(avg(when(col("temporal") === 1995, col("value"))), 6).as("v1995"),
            round(avg(when(col("temporal") === 1996, col("value"))), 6).as("v1996"))
          .select(col("l_partkey"),
            when(col("v1995").isNull, lit("added"))
              .when(col("v1996").isNull, lit("removed"))
              .when(col("v1995") === col("v1996"), lit("unchanged"))
              .otherwise(lit("changed")).as("status"),
            col("v1995"), col("v1996"))
          .orderBy("l_partkey")
      },
      Some(s"""WITH pixels AS (${Tables.pixelsSql}),
          a AS (SELECT l_partkey, round(avg(value), 6) AS v1995 FROM pixels
            WHERE temporal = 1995 GROUP BY 1),
          b AS (SELECT l_partkey, round(avg(value), 6) AS v1996 FROM pixels
            WHERE temporal = 1996 GROUP BY 1)
        SELECT COALESCE(a.l_partkey, b.l_partkey) AS l_partkey,
          CASE WHEN v1995 IS NULL THEN 'added'
               WHEN v1996 IS NULL THEN 'removed'
               WHEN v1995 = v1996 THEN 'unchanged'
               ELSE 'changed' END AS status,
          v1995, v1996
        FROM a FULL OUTER JOIN b ON a.l_partkey = b.l_partkey
        ORDER BY l_partkey""")),
    "outlier_robust" -> Q(
      // Robust outlier screen (X56): modified z-score 0.6745·(x−med)/MAD
      // (Iglewicz-Hoaglin) — the screen that survives the very outliers
      // it hunts, unlike the mean/std z (X40). Same scale shape as
      // extract_mad: the per-zone (median, MAD) frame is aggregate output
      // and broadcasts back over the pixel stream; the score rounds to 6
      // decimals BEFORE the |rz| > 3.5 decision; degenerate zones
      // (MAD = 0) score 0 by definition in both engines.
      (s, d) => {
        // (median, MAD) via the shared three-scan guided engine
        // (Extracts.guidedMedianMad, r17): one GK bracket scan whose
        // sketch also yields the deviation bracket, one median window
        // scan, one deviation window scan, then the scoring pass — four
        // pruned 2-column scans where the r16 shape paid five (the
        // deviation bracket scan is derived, not run). Same exact
        // values, bounded state everywhere — this query was the r6
        // spill drive's fatality (its MEMORY_AND_DISK checkpoint held
        // the whole unified pool) and the buffering median measured
        // super-linear at 100x (SCALE.md).
        val px = Tables.pixels(s, d).select(col("asdf_id"), col("value"))
        val stats = Extracts.guidedMedianMad(px, "asdf_id", "value",
          "med", "mad")
        Extracts.joinOnZone(px, stats, "asdf_id")
          .select(col("asdf_id"),
            when(col("mad") === 0, lit(0.0))
              .otherwise(round(lit(0.6745) * (col("value") - col("med")) / col("mad"), 6))
              .as("rz"))
          .groupBy(col("asdf_id"))
          .agg(count(lit(1)).as("n"),
            sum(when(abs(col("rz")) > 3.5, 1L).otherwise(0L)).as("n_out"),
            max(abs(col("rz"))).as("max_rz"))
          .orderBy("asdf_id")
      },
      Some(s"""WITH pixels AS (${Tables.pixelsSql}),
          st AS (SELECT asdf_id, median(value) AS med, mad(value) AS mad
            FROM pixels GROUP BY 1),
          z AS (SELECT pixels.asdf_id,
              CASE WHEN mad = 0 THEN 0.0
                ELSE round(CAST(0.6745 AS DOUBLE) * (value - med) / mad, 6) END AS rz
            FROM pixels JOIN st ON pixels.asdf_id = st.asdf_id)
        SELECT asdf_id, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN abs(rz) > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
          max(abs(rz)) AS max_rz
        FROM z GROUP BY asdf_id ORDER BY asdf_id""")),
    "dup_graph_degree" -> Q(
      // Duplicate-graph degree histogram (X57): how many docs have k
      // LSH-candidate neighbors — the corpus-health signal that catches
      // boilerplate storms (one template yielding a near-clique) before
      // the connected-components pass walks it. Computed at signature-
      // group grain ([[mhGroupDegrees]]): every member of a group shares
      // one degree, so the histogram weighs each group row by its
      // multiplicity instead of exploding a megacluster's O(k²) pair
      // endpoints — exact by the automorphism argument, and the oracle
      // below still computes the node-grain all-pairs form. Docs with no
      // shingles (no signature row) are the remaining degree-0 mass.
      (s, d) => {
        val shingleless = docs(s, d).select(col("doc_id"))
          .join(mhGrouped(s, d).select(col("doc_id")).hint("shuffle_hash"),
            Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("cnt"))
          .select(lit(0L).as("degree"), col("cnt"))
        mhGroupDegrees(s, d)
          .groupBy(col("degree")).agg(sum(col("m")).as("cnt"))
          .unionByName(shingleless)
          .groupBy(col("degree")).agg(sum(col("cnt")).as("n_docs"))
          .filter(col("n_docs") > 0)
          .orderBy("degree")
      },
      Some(s"""WITH $minhashPairCtes,
          deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM (
              SELECT doc_a AS doc_id FROM pairs
              UNION ALL SELECT doc_b FROM pairs) GROUP BY 1),
          alldocs AS (SELECT d.doc_id, COALESCE(deg.degree, 0) AS degree
            FROM documents d LEFT JOIN deg ON d.doc_id = deg.doc_id)
        SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
        FROM alldocs GROUP BY degree ORDER BY degree""")),
    "bootstrap_ci" -> Q(
      // Poisson bootstrap CI (X71) — THE scale-out resampling method
      // (per-row independent Poisson(1) weights instead of multinomial
      // draws, so a replicate never needs a global sample pass): 32
      // deterministic replicates per event_type, each one partial-agg
      // shuffle row; the 90% CI is the 2nd-smallest/2nd-largest replicate
      // mean. Determinism discipline: weights come from md5(event_id, b)
      // hex thresholds at the Poisson(1) CDF, and every mean is INTEGER
      // MICRO-CENTS ((Σw·c)·10⁶ div Σw) — order-independent integer
      // sums, so the result is bit-identical on any engine or partition
      // count (long headroom: Σw·c ≲ 8·10⁷ here; a 100 TB run promotes
      // the product to DECIMAL). The B× row explode partial-aggregates
      // map-side to B rows per (type, partition) — B bounds state, not
      // data.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val B = 32
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("event_id"), cents(col("value")).as("c"))
        val exact = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            expr("(sum(c) * 1000000) div count(1)").as("mean_ucents"))
        val reps = ev
          // ×B row explode with an md5 per replicate row off a 1-file
          // source: spread across cores before the hash storm
          .repartition(LlmOps.spreadWidth(ev))
          .select(col("event_type"), col("event_id"), col("c"),
            explode(array((0 until B).map(lit): _*)).as("b"))
          .withColumn("h", expr(
            "cast(conv(substring(md5(concat(cast(event_id as string), '_', cast(b as string))), 1, 4), 16, 10) as int)"))
          // Poisson(1) CDF over [0, 65536): 0.3679 / 0.7358 / 0.9197 / 0.9810
          .withColumn("w",
            when(col("h") < 24109, 0L).when(col("h") < 48218, 1L)
              .when(col("h") < 60273, 2L).when(col("h") < 64291, 3L)
              .otherwise(4L))
          .groupBy(col("event_type"), col("b"))
          .agg(sum(col("w") * col("c")).as("wc"), sum(col("w")).as("wn"))
          .withColumn("mean_uc",
            when(col("wn") === 0, lit(0L))
              .otherwise(expr("(wc * 1000000) div wn")))
        val rk = Window.partitionBy(col("event_type"))
          .orderBy(col("mean_uc"), col("b"))
        val ci = reps.withColumn("rn", row_number().over(rk))
          .groupBy(col("event_type"))
          .agg(max(when(col("rn") === 2, col("mean_uc"))).as("ci_lo_ucents"),
            max(when(col("rn") === B - 1, col("mean_uc"))).as("ci_hi_ucents"))
        exact.join(ci, Seq("event_type"))
          .select(col("event_type"), col("n"), col("mean_ucents"),
            col("ci_lo_ucents"), col("ci_hi_ucents"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type, event_id,
            CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
          exact AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              CAST((sum(c) * 1000000) // count(*) AS BIGINT) AS mean_ucents
            FROM ev GROUP BY 1),
          r AS (SELECT event_type, event_id, c, CAST(b AS INT) AS b,
              md5(CAST(event_id AS VARCHAR) || '_' || CAST(b AS VARCHAR)) AS hx
            FROM ev, unnest(range(32)) AS u(b)),
          hw AS (SELECT event_type, b, c,
              (strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 4096 +
              (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) * 256 +
              (strpos('0123456789abcdef', substring(hx, 3, 1)) - 1) * 16 +
              (strpos('0123456789abcdef', substring(hx, 4, 1)) - 1) AS h
            FROM r),
          w AS (SELECT event_type, b, c,
              CASE WHEN h < 24109 THEN 0 WHEN h < 48218 THEN 1
                WHEN h < 60273 THEN 2 WHEN h < 64291 THEN 3 ELSE 4 END AS w
            FROM hw),
          reps AS (SELECT event_type, b, sum(w * c) AS wc, sum(w) AS wn
            FROM w GROUP BY 1, 2),
          means AS (SELECT event_type, b,
              CASE WHEN wn = 0 THEN 0
                ELSE (wc * 1000000) // wn END AS mean_uc,
              row_number() OVER (PARTITION BY event_type
                ORDER BY CASE WHEN wn = 0 THEN 0
                  ELSE (wc * 1000000) // wn END, b) AS rn
            FROM reps),
          ci AS (SELECT event_type,
              CAST(max(CASE WHEN rn = 2 THEN mean_uc END) AS BIGINT) AS ci_lo_ucents,
              CAST(max(CASE WHEN rn = 31 THEN mean_uc END) AS BIGINT) AS ci_hi_ucents
            FROM means GROUP BY 1)
        SELECT exact.event_type, n, mean_ucents, ci_lo_ucents, ci_hi_ucents
        FROM exact JOIN ci USING (event_type)
        ORDER BY event_type""")),
    "triangle_count" -> Q(
      // Distributed triangle count + global clustering coefficient over
      // the duplicate graph (X57c) — near-clique boilerplate shows up as
      // triangle density long before connected components walks it. The
      // classic degree-ordered orientation: each undirected edge points
      // from the lower (deg, id) endpoint to the higher, so every node's
      // OUT-degree is O(√E) on any graph; wedges come from one
      // self-join of the oriented edges on their source, and a wedge
      // closes iff its (id-ordered) endpoint pair is an edge — one more
      // equi-join against the canonical pair list. Each triangle is
      // counted exactly once (its minimum-(deg,id) vertex owns it).
      // Wedge total Σ C(deg,2) is an integer aggregate; the coefficient
      // rounds at output.
      // Computed at signature-group grain (the automorphism argument,
      // [[mhGroupDegrees]]): a group of m identical-signature docs is an
      // internal m-clique whose closed forms are C(m,2) edges, C(m,3)
      // triangles, and m·C(deg,2) wedges (one shared degree); a quotient
      // edge (a,b) contributes m_a·m_b cross edges and
      // C(m_a,2)·m_b + C(m_b,2)·m_a mixed triangles; only triangles with
      // all three corners in DISTINCT groups need enumeration, and that
      // runs the degree-ordered orientation over the QUOTIENT graph — so
      // a k-doc megacluster costs O(1) group rows here instead of O(k³)
      // wedge enumeration. Exact integers throughout: the closed-form
      // PRODUCTS larger than their own term — m(m−1)(m−2) is 6× the
      // triangle term, m(m−1) and deg(deg−1) are 2× theirs — compute in
      // DECIMAL(38,0) and integral-divide back to Long (the r9 overflow
      // promotion: a ~3M-doc megacluster's m³ ≈ 2.7·10¹⁹ overflowed the
      // intermediate while the true count 4.5·10¹⁸ still fit the output
      // type). Per-term values and their sums are bounded by the emitted
      // counts, so Long is exact wherever the OUTPUT itself fits — and
      // past that inherent int64 limit the ANSI cast fails loud. The
      // oracle still computes the node-grain all-pairs form, re-proving
      // the identity every correctness pass.
      (s, d) => {
        val g = mhGroups(s, d).select(col("gid"), col("m"))
        val qe = mhQEdges(s, d).diskCheckpointLazy()
        // coalesce each closed-form sum to 0: on a corpus with NO shingled
        // docs the group set is empty and bare sums would emit NULLs,
        // diverging from the (0, 0, 0, 0.0) row a pairless-but-shingled
        // corpus produces — one degenerate contract for both shapes, and
        // the oracle coalesces identically (r9 advice; LlmOpsSpec pins
        // the no-pair corpus)
        val nodeStats = mhGroupDegrees(s, d).agg(
          coalesce(sum(expr("cast(m as decimal(38,0)) * (m - 1) div 2")),
            lit(0L)).as("e_in"),
          coalesce(sum(expr(
            "m * (cast(degree as decimal(38,0)) * (degree - 1) div 2)")),
            lit(0L)).as("n_wedges"),
          coalesce(sum(expr("cast(m as decimal(38,0)) * (m - 1) * (m - 2) div 6")),
            lit(0L)).as("t_in"))
        val edgeStats = qe
          .join(g.toDF("ga", "ma").hint("shuffle_hash"), Seq("ga"))
          .join(g.toDF("gb", "mb").hint("shuffle_hash"), Seq("gb"))
          .agg(coalesce(sum(col("ma") * col("mb")), lit(0L)).as("e_x"),
            coalesce(sum(expr(
              "(cast(ma as decimal(38,0)) * (ma - 1) div 2) * mb " +
                "+ (cast(mb as decimal(38,0)) * (mb - 1) div 2) * ma")),
              lit(0L)).as("t_mixed"))
        val qsym = qe.select(col("ga").as("u"), col("gb").as("v"))
          .unionAll(qe.select(col("gb"), col("ga")))
        val qdeg = qsym.groupBy(col("u")).agg(count(lit(1)).as("qd"))
        val o = qsym.join(qdeg.hint("shuffle_hash"), Seq("u"))
          .join(qdeg.toDF("v", "qdv").hint("shuffle_hash"), Seq("v"))
          .filter(col("qd") < col("qdv") ||
            (col("qd") === col("qdv") && col("u") < col("v")))
          .select(col("u").as("src"), col("v").as("dst"))
          .diskCheckpointLazy()
        val wedges = o.toDF("src", "w1")
          .join(o.toDF("src", "w2"), Seq("src"))
          .filter(col("w1") < col("w2"))
        val tQ = wedges.join(qe.hint("shuffle_hash"),
            wedges("w1") === qe("ga") && wedges("w2") === qe("gb"), "left_semi")
          .join(g.toDF("src", "ms").hint("shuffle_hash"), Seq("src"))
          .join(g.toDF("w1", "m1").hint("shuffle_hash"), Seq("w1"))
          .join(g.toDF("w2", "m2").hint("shuffle_hash"), Seq("w2"))
          .agg(coalesce(sum(col("ms") * col("m1") * col("m2")), lit(0L))
            .as("t_q"))
        // broadcast the 1-row totals explicitly (estimate-proof build
        // side, same rule as every other 1-row attach in the file)
        nodeStats.crossJoin(broadcast(edgeStats)).crossJoin(broadcast(tQ))
          .select((col("e_in") + col("e_x")).as("n_edges"), col("n_wedges"),
            (col("t_in") + col("t_mixed") + col("t_q")).as("n_triangles"))
          .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
            when(col("n_wedges") === 0, lit(0.0))
              .otherwise(round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
              .as("global_clustering"))
      },
      Some(s"""WITH $minhashPairCtes,
          edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                    UNION ALL SELECT doc_b, doc_a FROM pairs),
          deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
          o AS (SELECT e.u AS src, e.v AS dst
            FROM edges e JOIN deg a ON e.u = a.u JOIN deg b ON e.v = b.u
            WHERE a.deg < b.deg OR (a.deg = b.deg AND e.u < e.v)),
          w AS (SELECT e1.src, e1.dst AS w1, e2.dst AS w2
            FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst < e2.dst),
          tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM w JOIN pairs p ON w.w1 = p.doc_a AND w.w2 = p.doc_b),
          st AS (SELECT coalesce(CAST(sum(deg) / 2 AS BIGINT), 0) AS n_edges,
              coalesce(CAST(sum(deg * (deg - 1) // 2) AS BIGINT), 0) AS n_wedges
            FROM deg)
        SELECT n_edges, n_wedges, n_triangles,
          CASE WHEN n_wedges = 0 THEN 0.0
            ELSE round(3.0 * n_triangles / n_wedges, 6) END AS global_clustering
        FROM st, tri""")),
    "zone_trend" -> Q(
      // Per-zone OLS trend (X72): slope/intercept of value-in-cents over
      // the (centered) ship year — the drift DIRECTION companion to the
      // drift-bands screens, computed the float-proof way: x is the year
      // centered at 1998 (|x| ≤ 3 hides two overflow decades), y is
      // integer cents, and ALL five co-moments (n, Σx, Σy, Σxy, Σx²) are
      // exact integer sums — order-independent under any partitioning, so
      // both engines divide the SAME two integers (closed-form normal
      // equations) and round once. One map-side-combinable aggregate.
      // The closed-form PRODUCTS are promoted to 128-bit integers
      // (Spark DECIMAL(38,0) / DuckDB HUGEINT): the round-9 10× oracle
      // pass measured Σy·Σx² ≈ 5·10¹⁹ on the hot-zone corpus — past
      // Long — and both promotions are exact for any corpus ≤ ~10³⁰
      // pixel-cents, so the engines still divide identical integers and
      // the double rounds once from the same value.
      // Degenerate single-year zones (denominator 0) emit NULL in both.
      (s, d) => {
        val px = Tables.pixels(s, d).select(col("asdf_id"),
          (col("temporal") - 1998).cast("long").as("x"), cents(col("value")).as("y"))
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val den = dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))
        px.groupBy("asdf_id")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("asdf_id"), col("n"),
            when(den === 0, lit(null)).otherwise(
              round((dec(col("n")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sy"))).cast("double")
                / den.cast("double"), 6)).as("slope_cents"),
            when(den === 0, lit(null)).otherwise(
              round((dec(col("sy")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sxy"))).cast("double")
                / den.cast("double"), 6)).as("icept_cents"))
          .orderBy("asdf_id")
      },
      Some(s"""WITH pixels AS (${Tables.pixelsSql}),
          b AS (SELECT asdf_id, CAST(temporal - 1998 AS BIGINT) AS x,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS y FROM pixels),
          a AS (SELECT asdf_id, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * y) AS BIGINT) AS sxy,
              CAST(sum(x * x) AS BIGINT) AS sxx
            FROM b GROUP BY 1)
        SELECT asdf_id, n,
          CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx = 0 THEN NULL
            ELSE round(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
              / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE), 6) END AS slope_cents,
          CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx = 0 THEN NULL
            ELSE round(CAST(CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy AS DOUBLE)
              / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE), 6) END AS icept_cents
        FROM a ORDER BY asdf_id""")),
    "ks_drift" -> Q(
      // Two-sample Kolmogorov-Smirnov drift test (X73): per zone, the KS
      // D statistic between the 1996 and 2000 value distributions — the
      // nonparametric drift detector that needs no binning choice (the
      // drift-bands screens compare histograms; this compares whole
      // CDFs). Shape: one (zone, value)-grain COUNT aggregate collapses
      // the data to its distinct support, then ONE zone-partitioned
      // window computes both running CDFs in a single sort — integer
      // cumulative counts, so the only float is the final two divisions,
      // rounded BEFORE the max (round-before-rank rule). Parallel across
      // zones; per-zone state is the distinct-value support, never raw
      // rows.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val px = Tables.pixels(s, d)
          .filter(col("temporal").isin(1996, 2000))
          .select(col("asdf_id"), col("value"),
            when(col("temporal") === 1996, 1L).otherwise(0L).as("a"),
            when(col("temporal") === 2000, 1L).otherwise(0L).as("b"))
        val g = px.groupBy(col("asdf_id"), col("value"))
          .agg(sum("a").as("ca"), sum("b").as("cb"))
        val w = Window.partitionBy("asdf_id").orderBy("value")
        val tot = Window.partitionBy("asdf_id")
        g.withColumn("cuma", sum("ca").over(w))
          .withColumn("cumb", sum("cb").over(w))
          .withColumn("na", sum("ca").over(tot))
          .withColumn("nb", sum("cb").over(tot))
          .groupBy(col("asdf_id"))
          .agg(max("na").as("n_a"), max("nb").as("n_b"),
            max(round(abs(col("cuma").cast("double") / col("na")
              - col("cumb").cast("double") / col("nb")), 6)).as("ks_d"))
          .orderBy("asdf_id")
      },
      Some(s"""WITH pixels AS (${Tables.pixelsSql}),
          f AS (SELECT asdf_id, value,
              CASE WHEN temporal = 1996 THEN 1 ELSE 0 END AS a,
              CASE WHEN temporal = 2000 THEN 1 ELSE 0 END AS b
            FROM pixels WHERE temporal IN (1996, 2000)),
          g AS (SELECT asdf_id, value, CAST(sum(a) AS BIGINT) AS ca,
              CAST(sum(b) AS BIGINT) AS cb
            FROM f GROUP BY 1, 2),
          c AS (SELECT asdf_id,
              sum(ca) OVER (PARTITION BY asdf_id ORDER BY value) AS cuma,
              sum(cb) OVER (PARTITION BY asdf_id ORDER BY value) AS cumb,
              sum(ca) OVER (PARTITION BY asdf_id) AS na,
              sum(cb) OVER (PARTITION BY asdf_id) AS nb
            FROM g)
        SELECT asdf_id, CAST(max(na) AS BIGINT) AS n_a,
          CAST(max(nb) AS BIGINT) AS n_b,
          max(round(abs(CAST(cuma AS DOUBLE) / na
            - CAST(cumb AS DOUBLE) / nb), 6)) AS ks_d
        FROM c GROUP BY asdf_id ORDER BY asdf_id""")),
    "ks_drift_binned" -> Q(
      // X73's degrade path, made code (r6 verdict task #4): the exact
      // ks_drift keeps each zone's DISTINCT-VALUE support as its window
      // state — fine for quantized measurements, data-sized for a
      // continuous tie-free stream, where one hot zone's support would
      // serialize into a single window task. This row runs the same KS
      // over [[Analytics.ksBinned]]'s fixed 256-cell integer-cent grid:
      // per-zone state is ≤ 256 rows at ANY scale (the wide-support
      // ScaleSpec case pins the bound), and the oracle mirrors the
      // integer grid arithmetic exactly — what's pinned is the binned
      // statistic's own deterministic value, with the resolution loss
      // (≤ densest cell's CDF mass) documented rather than hidden.
      (s, d) => {
        val px = Tables.pixels(s, d)
          .filter(col("temporal").isin(1996, 2000))
          .select(col("asdf_id"), cents(col("value")).as("c"),
            when(col("temporal") === 1996, 1L).otherwise(0L).as("a"),
            when(col("temporal") === 2000, 1L).otherwise(0L).as("b"))
        Analytics.ksBinned(px, "asdf_id", 256).orderBy("asdf_id")
      },
      Some(s"""WITH pixels AS (${Tables.pixelsSql}),
          f AS (SELECT asdf_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
              CASE WHEN temporal = 1996 THEN 1 ELSE 0 END AS a,
              CASE WHEN temporal = 2000 THEN 1 ELSE 0 END AS b
            FROM pixels WHERE temporal IN (1996, 2000)),
          bd AS (SELECT min(c) AS glo, max(c) AS ghi FROM f),
          bn AS (SELECT asdf_id, ((c - glo) * 256) // (ghi - glo + 1) AS bin,
              a, b FROM f, bd),
          g AS (SELECT asdf_id, bin, CAST(sum(a) AS BIGINT) AS ca,
              CAST(sum(b) AS BIGINT) AS cb FROM bn GROUP BY 1, 2),
          c AS (SELECT asdf_id,
              sum(ca) OVER (PARTITION BY asdf_id ORDER BY bin) AS cuma,
              sum(cb) OVER (PARTITION BY asdf_id ORDER BY bin) AS cumb,
              sum(ca) OVER (PARTITION BY asdf_id) AS na,
              sum(cb) OVER (PARTITION BY asdf_id) AS nb
            FROM g)
        SELECT asdf_id, CAST(max(na) AS BIGINT) AS n_a,
          CAST(max(nb) AS BIGINT) AS n_b,
          max(round(abs(CAST(cuma AS DOUBLE) / na
            - CAST(cumb AS DOUBLE) / nb), 6)) AS ks_d
        FROM c GROUP BY asdf_id ORDER BY asdf_id""")),
    "benford_audit" -> Q(
      // Benford first-digit audit (X74): leading-digit distribution of
      // the monetary column vs Benford's law, with per-digit chi-square
      // contributions — the fabricated-data screen auditors run. The
      // leading digit comes from the INTEGER cents rendered as a string
      // (same significand as the raw value; no float log10 whose last
      // ulp could split engines), and the expected probabilities are
      // 6-decimal LITERALS — identical constants on both sides, so the
      // only arithmetic is exact-count minus literal-product. One
      // stateless map + a 9-row aggregate + a broadcast 1-row total.
      (s, d) => {
        val pb = Map(1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939,
          4 -> 0.096910, 5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992,
          8 -> 0.051153, 9 -> 0.045757)
        val pExp = pb.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
          when(col("digit") === k, lit(v)).otherwise(acc) }
        val dg = Tables.pixels(s, d).select(cents(col("value")).as("c"))
          .filter(col("c") > 0)
          .select(substring(col("c").cast("string"), 1, 1).cast("int").as("digit"))
        val counts = dg.groupBy("digit").agg(count(lit(1)).as("n_obs"))
        val total = dg.agg(count(lit(1)).as("n_total"))
        counts.crossJoin(broadcast(total))
          .select(col("digit"), col("n_obs"),
            round(col("n_obs").cast("double") / col("n_total"), 6).as("p_obs_r"),
            pExp.as("p_benford"),
            round(pow(col("n_obs").cast("double") - col("n_total") * pExp, 2)
              / (col("n_total") * pExp), 6).as("chi_r"))
          .orderBy("digit")
      },
      Some(s"""WITH pixels AS (${Tables.pixelsSql}),
          d AS (SELECT CAST(substring(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
                AS VARCHAR), 1, 1) AS INT) AS digit
            FROM pixels WHERE floor(value * 100 + 0.5) > 0),
          c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
          t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM d),
          e AS (SELECT digit, n_obs, n_total,
              CASE digit WHEN 1 THEN CAST(0.301030 AS DOUBLE)
                WHEN 2 THEN CAST(0.176091 AS DOUBLE)
                WHEN 3 THEN CAST(0.124939 AS DOUBLE)
                WHEN 4 THEN CAST(0.096910 AS DOUBLE)
                WHEN 5 THEN CAST(0.079181 AS DOUBLE)
                WHEN 6 THEN CAST(0.066947 AS DOUBLE)
                WHEN 7 THEN CAST(0.057992 AS DOUBLE)
                WHEN 8 THEN CAST(0.051153 AS DOUBLE)
                ELSE CAST(0.045757 AS DOUBLE) END AS pe
            FROM c CROSS JOIN t)
        SELECT digit, n_obs,
          round(CAST(n_obs AS DOUBLE) / n_total, 6) AS p_obs_r,
          pe AS p_benford,
          round(pow(CAST(n_obs AS DOUBLE) - n_total * pe, 2)
            / (n_total * pe), 6) AS chi_r
        FROM e ORDER BY digit""")),
    "hist_equidepth" -> Q(
      // Equi-depth histogram (X75): 10 per-zone tiles with (within one
      // row) equal population — the selectivity-estimation histogram,
      // complementing the equal-WIDTH hist_values. Tiles follow ntile(10)
      // semantics over a fully-tiebroken per-zone sort; tile bounds +
      // counts are exact integer/min/max output. Since round 7 the tile
      // SUMMARY comes straight from [[Extracts.guidedTileBounds]]: tile
      // counts are closed-form from n, and each tile edge is the dataset
      // value at an integer boundary rank (tie-break independent), so
      // the whole histogram is TWO aggregate passes — no per-row rank,
      // no window sort, and a hot zone never serializes into one task.
      // The exact-ntile oracle is unchanged; row-level tile assignment
      // (when a caller needs it) is [[Analytics.zonedNtile]], which
      // quality_tiles exercises.
      (s, d) => {
        Extracts.guidedTileBounds(
          Tables.pixels(s, d).select(col("asdf_id"), col("value")), 10)
          .orderBy("asdf_id", "tile")
      },
      Some(s"""WITH pixels AS (${Tables.pixelsSql}),
          t AS (SELECT asdf_id, value,
              ntile(10) OVER (PARTITION BY asdf_id
                ORDER BY value, l_orderkey, l_linenumber) AS tile
            FROM pixels)
        SELECT asdf_id, tile, CAST(count(*) AS BIGINT) AS n,
          min(value) AS lo_v, max(value) AS hi_v
        FROM t GROUP BY 1, 2 ORDER BY asdf_id, tile""")),
    "survival_km" -> Q(
      // Kaplan-Meier user-retention curve (X76): the product-limit
      // survival estimator over user lifetimes (duration = last−first
      // active day; churned if silent for >7 days before the corpus
      // end, else right-censored). Scale shape: one user-grain aggregate
      // (the only data-sized shuffle), then everything is
      // |durations|-bounded — the at-risk counts come from ONE running
      // window over the duration frame (the daily_spine argument), and
      // the product limit is exp(Σ ln(1−d/n)) so both engines sum the
      // SAME logs in the SAME order (no product aggregate dependency);
      // a d = n_risk step (everyone at risk dies) zeroes the curve via
      // an integer flag rather than ln(0), which Spark nulls and DuckDB
      // -infs — the one cross-engine split this formulation forbids.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.events(s, d).select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
        val u = e.groupBy("user_id").agg(min("day").as("f"), max("day").as("l"))
        val g = u.agg(max("l").as("m"), count(lit(1)).as("n_users"))
        val lab = u.crossJoin(broadcast(g))
          .select((col("l") - col("f")).as("t"),
            when(col("l") < col("m") - 7, 1L).otherwise(0L).as("churn"),
            col("n_users"))
        val byT = lab.groupBy("t").agg(count(lit(1)).as("a"),
          sum("churn").as("dd"), max("n_users").as("n_users"))
        val wPrev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
        val wRun = Window.orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byT
          .withColumn("n_risk",
            col("n_users") - coalesce(sum("a").over(wPrev), lit(0L)))
          .withColumn("lnf", when(col("dd") === 0 || col("dd") === col("n_risk"), lit(0.0))
            .otherwise(log(lit(1.0) - col("dd").cast("double") / col("n_risk"))))
          .withColumn("z", when(col("dd") === col("n_risk"), 1L).otherwise(0L))
          .withColumn("surv_r", when(sum("z").over(wRun) > 0, lit(0.0))
            .otherwise(round(exp(sum("lnf").over(wRun)), 6)))
          .select(col("t"), col("n_risk"), col("dd").as("n_deaths"),
            (col("a") - col("dd")).as("n_censored"), col("surv_r"))
          .orderBy("t")
      },
      Some("""WITH e AS (SELECT user_id,
            CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
          FROM events),
          u AS (SELECT user_id, min(day) AS f, max(day) AS l FROM e GROUP BY 1),
          g AS (SELECT max(l) AS m, CAST(count(*) AS BIGINT) AS n_users FROM u),
          lab AS (SELECT l - f AS t,
              CASE WHEN l < m - 7 THEN 1 ELSE 0 END AS churn, n_users
            FROM u CROSS JOIN g),
          bt AS (SELECT t, CAST(count(*) AS BIGINT) AS a,
              CAST(sum(churn) AS BIGINT) AS dd, max(n_users) AS n_users
            FROM lab GROUP BY 1),
          r AS (SELECT t, a, dd, CAST(n_users - COALESCE(sum(a) OVER
              (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_risk
            FROM bt),
          sfr AS (SELECT t, n_risk, dd, a,
              CASE WHEN dd = 0 OR dd = n_risk THEN 0.0
                ELSE ln(1.0 - CAST(dd AS DOUBLE) / n_risk) END AS lnf,
              CASE WHEN dd = n_risk THEN 1 ELSE 0 END AS z
            FROM r)
        SELECT t, n_risk, dd AS n_deaths, a - dd AS n_censored,
          CASE WHEN sum(z) OVER w > 0 THEN 0.0
            ELSE round(exp(sum(lnf) OVER w), 6) END AS surv_r
        FROM sfr
        WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY t""")),
    "gini_spend" -> Q(
      // Spend-concentration audit (X77): Gini coefficient + top-10% share
      // of per-user spend — the inequality screen for "is this corpus/
      // revenue dominated by a few whales". Float-proof: spend is integer
      // cents, the Gini comes from the ranked-sum identity
      // G = 2·Σ(i·sᵢ)/(n·Σs) − (n+1)/n whose every sum is an exact
      // integer, and ranks are GLOBAL without a global sort — the
      // queue_rank two-phase trick (rank within an EQUI-DEPTH spend band
      // via a band-partitioned window, plus per-band offsets from a
      // |bands|-row running sum, broadcast back). The ranked sum Σi·sᵢ
      // and the denominator n·Σs ride 128-bit integers (the zone_trend
      // promotion): at 10⁹ users × 10¹⁵ total cents they reach ~10²⁴ —
      // far past Long — while DECIMAL(38,0)/HUGEINT stay exact to
      // ~10³⁸, so both engines still divide identical integers and
      // round once.
      (s, d) => {
        val sp = Tables.events(s, d)
          .select(col("user_id"), cents(col("value")).as("c"))
          .groupBy("user_id").agg(sum("c").as("sc"))
        val nt = sp.agg(count(lit(1)).as("n"), sum("sc").as("tot"))
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
        bandedRank(sp, "sc", "user_id", asc = true, "i")
          .crossJoin(broadcast(nt))
          .agg(max("n").as("n_users"), max("tot").as("total_cents"),
            sum(dec(col("i")) * dec(col("sc"))).as("t1"),
            sum(when(col("i") > col("n") - expr("n div 10"), col("sc"))
              .otherwise(0L)).as("topsum"))
          .select(col("n_users"), col("total_cents"),
            when(col("total_cents") === 0, lit(0.0)).otherwise(
              round(lit(2.0) * col("t1").cast("double")
                / (dec(col("n_users")) * dec(col("total_cents"))).cast("double")
                - (col("n_users") + lit(1.0)) / col("n_users"), 6)).as("gini_r"),
            when(col("total_cents") === 0, lit(0.0)).otherwise(
              round(col("topsum").cast("double") / col("total_cents"), 6))
              .as("top10_share_r"))
          // a user-free input must yield ZERO rows like the oracle's
          // GROUP BY over an empty set — Spark's grand aggregate would
          // emit one all-null row instead
          .where(col("n_users").isNotNull)
      },
      Some("""WITH sp AS (SELECT user_id,
            CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
          FROM events GROUP BY 1),
          r AS (SELECT sc, CAST(row_number() OVER (ORDER BY sc, user_id)
            AS BIGINT) AS i FROM sp),
          nt AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(sc) AS BIGINT) AS tot FROM sp)
        SELECT n AS n_users, tot AS total_cents,
          CASE WHEN tot = 0 THEN 0.0 ELSE
            round(2.0 * CAST(sum(CAST(i AS HUGEINT) * sc) AS DOUBLE)
              / CAST(CAST(n AS HUGEINT) * tot AS DOUBLE)
              - (n + 1.0) / n, 6) END AS gini_r,
          CASE WHEN tot = 0 THEN 0.0 ELSE
            round(CAST(sum(CASE WHEN i > n - n // 10 THEN sc ELSE 0 END)
              AS DOUBLE) / tot, 6) END AS top10_share_r
        FROM r CROSS JOIN nt GROUP BY n, tot""")),
    "ab_test" -> Q(
      // Welch's t-test on revenue per user (X79): the A/B readout —
      // deterministic arms (user_id parity), metric = per-user total
      // spend in INTEGER cents, unequal-variance t statistic. (A
      // two-proportion test on "ever purchased" is degenerate here:
      // every fixture user converts, zeroing the pooled variance.)
      // Each arm reduces to three exact integers (n, Σs, Σs²) via one
      // user-grain aggregate + a 2-row rollup; the closing float
      // arithmetic applies the SAME IEEE op sequence to the SAME exact
      // integers on both engines, and se = 0 (an all-identical arm) is
      // guarded to t = 0 rather than dividing by zero under ANSI mode.
      // Σs² rides 128-bit (the seasonal_anomaly/zone_trend promotion):
      // per-user cents square past Long for whale users at corpus scale.
      (s, d) => {
        val u = Tables.events(s, d)
          .select(col("user_id"), cents(col("value")).as("c"))
          .groupBy("user_id").agg(sum("c").as("sc"))
          .withColumn("arm", (col("user_id") % 2).cast("long"))
        val a = u.groupBy("arm").agg(count(lit(1)).as("n"),
          sum("sc").as("s1"),
          sum(col("sc").cast("decimal(19,0)")
            * col("sc").cast("decimal(19,0)")).as("s2"))
        def pick(k: String, arm: Int) =
          max(when(col("arm") === arm, col(k))).as(s"$k$arm")
        val w = a.agg(pick("n", 0), pick("s1", 0), pick("s2", 0),
          pick("n", 1), pick("s1", 1), pick("s2", 1))
        def mean(i: Int) =
          col(s"s1$i").cast("double") / col(s"n$i").cast("double")
        def varr(i: Int) =
          (col(s"s2$i").cast("double") - col(s"s1$i").cast("double")
            * col(s"s1$i").cast("double") / col(s"n$i").cast("double")) /
            (col(s"n$i").cast("double") - lit(1.0))
        val se = sqrt(varr(0) / col("n0").cast("double")
          + varr(1) / col("n1").cast("double"))
        w.select(col("n0"), col("n1"),
          round(mean(0), 6).as("mean0_r"), round(mean(1), 6).as("mean1_r"),
          round(mean(1) - mean(0), 6).as("lift_r"),
          when(se === 0.0, lit(0.0))
            .otherwise(round((mean(1) - mean(0)) / se, 6)).as("t_r"))
      },
      Some("""WITH u AS (SELECT user_id,
            CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
          FROM events GROUP BY 1),
          a AS (SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(sc) AS BIGINT) AS s1,
            sum(CAST(sc AS HUGEINT) * sc) AS s2
          FROM u GROUP BY 1),
          w AS (SELECT
            max(CASE WHEN arm = 0 THEN n END) AS n0,
            max(CASE WHEN arm = 0 THEN s1 END) AS s10,
            max(CASE WHEN arm = 0 THEN s2 END) AS s20,
            max(CASE WHEN arm = 1 THEN n END) AS n1,
            max(CASE WHEN arm = 1 THEN s1 END) AS s11,
            max(CASE WHEN arm = 1 THEN s2 END) AS s21 FROM a)
        SELECT n0, n1,
          round(CAST(s10 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS mean0_r,
          round(CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS mean1_r,
          round(CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(s10 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS lift_r,
          CASE WHEN sqrt(
              ((CAST(s20 AS DOUBLE) - CAST(s10 AS DOUBLE) * CAST(s10 AS DOUBLE)
                / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0))
                / CAST(n0 AS DOUBLE)
              + ((CAST(s21 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s11 AS DOUBLE)
                / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0))
                / CAST(n1 AS DOUBLE)) = 0.0 THEN 0.0
            ELSE round((CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(s10 AS DOUBLE) / CAST(n0 AS DOUBLE)) / sqrt(
              ((CAST(s20 AS DOUBLE) - CAST(s10 AS DOUBLE) * CAST(s10 AS DOUBLE)
                / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0))
                / CAST(n0 AS DOUBLE)
              + ((CAST(s21 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s11 AS DOUBLE)
                / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0))
                / CAST(n1 AS DOUBLE)), 6) END AS t_r
        FROM w""")),
    "centroid_confusion" -> Q(
      // Nearest-centroid classifier eval (X78): train/test split by
      // vec_id parity, per-label centroids from the train half, test
      // half assigned to the nearest centroid, output = the confusion
      // matrix — the eval harness for "are these embedding labels even
      // separable". INTEGER end to end: coordinates quantize to POSITIVE
      // micro-units (the +10⁶ shift keeps every integer division in the
      // positive domain, where truncating and flooring engines agree),
      // centroids are exact integer-mean micro-units, distances are
      // exact Σ(Δ²) longs — argmin and matrix are engine-independent by
      // construction. Scale: the centroid frame is labels × dims rows
      // (broadcast); the distance join fans test rows out ×|labels| then
      // partial-aggregates back — never a pairwise test×train join.
      (s, d) => confusionDf(s, d).orderBy("true_label", "pred_label"),
      Some(s"""WITH $confusionCtes
        SELECT true_label, pred_label, n FROM conf
        ORDER BY true_label, pred_label""")),
    "classifier_metrics" -> Q(
      // Per-label precision/recall/F1 (X80) derived from the X78
      // confusion matrix — same pipeline, one extra |labels|-sized
      // reshape. F1 closes as 2·tp/(support+predicted) — ONE division
      // over three exact integers — rather than the harmonic mean of two
      // already-divided doubles, so each metric rounds exactly once on
      // both engines. Labels missing from either margin (never predicted
      // / no support) guard their ratio to 0 instead of dividing by zero.
      (s, d) => {
        // |labels|²-row frame consumed 3× below (support / predicted /
        // diagonal): key-bounded small frame → lazy local checkpoint per
        // the Ckpt policy — one centroid pipeline run instead of three
        // (r16). The checkpoint lives HERE, not inside confusionDf:
        // centroid_confusion consumes the same builder once and keeps
        // its full pinned plan (PlanSpec).
        val cm = confusionDf(s, d).smallCheckpointLazy()
        val sup = cm.groupBy(col("true_label").as("label"))
          .agg(sum("n").as("support"))
        val prd = cm.groupBy(col("pred_label").as("label"))
          .agg(sum("n").as("predicted"))
        val diag = cm.filter(col("true_label") === col("pred_label"))
          .select(col("true_label").as("label"), col("n").as("tp"))
        sup.join(prd, Seq("label"), "full_outer")
          .join(diag, Seq("label"), "left")
          .select(col("label"),
            coalesce(col("support"), lit(0L)).as("support"),
            coalesce(col("predicted"), lit(0L)).as("predicted"),
            coalesce(col("tp"), lit(0L)).as("tp"))
          .withColumn("precision_r", when(col("predicted") === 0, lit(0.0))
            .otherwise(round(col("tp").cast("double") / col("predicted"), 6)))
          .withColumn("recall_r", when(col("support") === 0, lit(0.0))
            .otherwise(round(col("tp").cast("double") / col("support"), 6)))
          .withColumn("f1_r",
            when(col("support") + col("predicted") === 0, lit(0.0))
              .otherwise(round(lit(2.0) * col("tp").cast("double")
                / (col("support") + col("predicted")).cast("double"), 6)))
          .orderBy("label")
      },
      Some(s"""WITH $confusionCtes,
          sup AS (SELECT true_label AS label, CAST(sum(n) AS BIGINT) AS support
            FROM conf GROUP BY 1),
          prd AS (SELECT pred_label AS label, CAST(sum(n) AS BIGINT) AS predicted
            FROM conf GROUP BY 1),
          diag AS (SELECT true_label AS label, n AS tp FROM conf
            WHERE true_label = pred_label),
          j AS (SELECT COALESCE(sup.label, prd.label) AS label,
              COALESCE(support, 0) AS support,
              COALESCE(predicted, 0) AS predicted
            FROM sup FULL OUTER JOIN prd ON sup.label = prd.label)
        SELECT j.label, support, predicted, COALESCE(tp, 0) AS tp,
          CASE WHEN predicted = 0 THEN 0.0
            ELSE round(CAST(COALESCE(tp, 0) AS DOUBLE) / predicted, 6)
            END AS precision_r,
          CASE WHEN support = 0 THEN 0.0
            ELSE round(CAST(COALESCE(tp, 0) AS DOUBLE) / support, 6)
            END AS recall_r,
          CASE WHEN support + predicted = 0 THEN 0.0
            ELSE round(2.0 * CAST(COALESCE(tp, 0) AS DOUBLE)
              / (support + predicted), 6) END AS f1_r
        FROM j LEFT JOIN diag ON j.label = diag.label
        ORDER BY j.label""")),
    "funnel_latency" -> Q(
      // Time-to-convert distribution (X81): per-user latency from the
      // first view to the first purchase at-or-after it, closed into
      // exact order statistics — lower-rank p50/p90 selected by GLOBAL
      // row index, computed with the gini_spend two-phase banded rank
      // (equi-depth latency bands sort independently; offsets are a
      // |bands|-row broadcast) so no single-partition sort exists at any
      // scale. Latency truncates to whole seconds (integer `div`), so
      // every emitted value is an exact long.
      (s, d) => {
        val e = eventsUs(s, d)
        val fv = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("us").as("fv"))
        val lat = e.filter(col("event_type") === "purchase")
          .join(fv, Seq("user_id"))
          .filter(col("us") >= col("fv"))
          .groupBy("user_id").agg(min(col("us") - col("fv")).as("lat_us"))
          .select(col("user_id"), expr("lat_us div 1000000").as("lat_s"))
        val tot = lat.agg(count(lit(1)).as("n_conv"),
          min("lat_s").as("min_s"), max("lat_s").as("max_s"))
        bandedRank(lat, "lat_s", "user_id", asc = true, "i")
          .crossJoin(broadcast(tot))
          .agg(max("n_conv").as("n_conv"),
            max("min_s").as("min_s"), max("max_s").as("max_s"),
            max(when(col("i") === expr("(n_conv + 1) div 2"), col("lat_s")))
              .as("p50_s"),
            max(when(col("i") === expr("(9 * n_conv + 9) div 10"), col("lat_s")))
              .as("p90_s"))
          // a conversion-free input must yield ZERO rows like the oracle's
          // GROUP BY over an empty set — Spark's grand aggregate would
          // emit one all-null row instead
          .where(col("n_conv").isNotNull)
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
            FROM events),
          fv AS (SELECT user_id, min(us) AS fv FROM e
            WHERE event_type = 'view' GROUP BY 1),
          fp AS (SELECT e.user_id,
              CAST(min(e.us - fv.fv) AS BIGINT) // 1000000 AS lat_s
            FROM e JOIN fv ON e.user_id = fv.user_id
            WHERE e.event_type = 'purchase' AND e.us >= fv.fv GROUP BY 1),
          r AS (SELECT lat_s,
              CAST(row_number() OVER (ORDER BY lat_s, user_id) AS BIGINT) AS i
            FROM fp),
          t AS (SELECT CAST(count(*) AS BIGINT) AS n_conv,
              min(lat_s) AS min_s, max(lat_s) AS max_s FROM fp)
        SELECT n_conv, min_s, max_s,
          max(CASE WHEN i = (n_conv + 1) // 2 THEN lat_s END) AS p50_s,
          max(CASE WHEN i = (9 * n_conv + 9) // 10 THEN lat_s END) AS p90_s
        FROM r CROSS JOIN t GROUP BY n_conv, min_s, max_s""")),
    "novelty_curve" -> Q(
      // Corpus novelty decay (X82): the corpus in 10 monotone arrival
      // batches (doc_id scaled against a broadcast max — no global
      // window), per batch the distinct word-bigram shingles it contains
      // and how many are NEW (this batch is the shingle's min batch).
      // The LLM-data signal behind "is the crawl saturating" — novelty
      // falling toward 0 means new batches re-state the corpus. One
      // shingle-grain distinct + two bounded aggregates; the shingle
      // explode spreads ahead of the shuffle like every doc pipeline.
      (s, d) => {
        val base = docs(s, d)
        val mx = base.agg(max("doc_id").as("mx"))
        val sh = base.repartition(LlmOps.spreadWidth(base))
          .withColumn("w", split(LlmOps.normText(col("text")), " "))
          .select(col("doc_id"), explode(expr(
            """CASE WHEN size(w) > 1
               THEN transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))
               ELSE array() END""")).as("sh"))
        val bs = sh.crossJoin(broadcast(mx))
          .select(expr("(doc_id * 10) div (mx + 1)").as("batch"), col("sh"))
          .distinct()
        val totals = bs.groupBy("batch").agg(count(lit(1)).as("n_shingles"))
        val news = bs.groupBy("sh").agg(min("batch").as("batch"))
          .groupBy("batch").agg(count(lit(1)).as("n_new"))
        totals.join(news, Seq("batch"), "left")
          .select(col("batch"), col("n_shingles"),
            coalesce(col("n_new"), lit(0L)).as("n_new"),
            round(coalesce(col("n_new"), lit(0L)).cast("double")
              / col("n_shingles"), 6).as("novelty_r"))
          .orderBy("batch")
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w
            FROM documents),
          mx AS (SELECT max(doc_id) AS mx FROM documents),
          s AS (SELECT DISTINCT
              CAST((doc_id * 10) // (mx + 1) AS BIGINT) AS batch, sh
            FROM n, mx, unnest(list_transform(range(greatest(len(w)-1, 0)),
              i -> w[i+1] || ' ' || w[i+2])) AS u(sh)),
          t AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_shingles
            FROM s GROUP BY 1),
          nw AS (SELECT sh, min(batch) AS batch FROM s GROUP BY 1),
          nn AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_new
            FROM nw GROUP BY 1)
        SELECT t.batch, n_shingles, COALESCE(n_new, 0) AS n_new,
          round(CAST(COALESCE(n_new, 0) AS DOUBLE) / n_shingles, 6) AS novelty_r
        FROM t LEFT JOIN nn ON t.batch = nn.batch ORDER BY t.batch""")),
    "lang_mixture" -> Q(
      // Language-mixture screen (X83): fraction of a document's 12-word
      // lines whose marker-token language vote disagrees with the
      // document's declared lang — the mixed-language detector that
      // catches code-switched or mis-tagged crawl docs a doc-level
      // langid (X4b) averages away. Reuses the ONE line split
      // (LlmOps.lines ≡ the dedup_lines oracle CTE) and the X4b marker
      // vote verbatim, so neither rule can fork. Stateless per line; one
      // doc-grain aggregate.
      (s, d) => {
        val scored = LlmOps.lines(docs(s, d))
          .withColumn("t", split(col("line"), " "))
          .withColumn("sc_de", expr("size(filter(t, x -> x IN ('der','die','und')))"))
          .withColumn("sc_en", expr("size(filter(t, x -> x IN ('the','and','of')))"))
          .withColumn("sc_es", expr("size(filter(t, x -> x IN ('el','los','y')))"))
          .withColumn("sc_fr", expr("size(filter(t, x -> x IN ('le','la','et')))"))
          .withColumn("pred",
            when(col("sc_de") >= col("sc_en") && col("sc_de") >= col("sc_es")
              && col("sc_de") >= col("sc_fr"), "de")
            .when(col("sc_en") >= col("sc_es") && col("sc_en") >= col("sc_fr"), "en")
            .when(col("sc_es") >= col("sc_fr"), "es")
            .otherwise("fr"))
        scored.join(docs(s, d).select(col("doc_id"), col("lang")), Seq("doc_id"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_lines"),
            sum(when(col("pred") =!= col("lang"), 1L).otherwise(0L))
              .as("n_foreign"))
          .withColumn("mix_r",
            round(col("n_foreign").cast("double") / col("n_lines"), 6))
          .orderBy("doc_id")
      },
      Some(s"""WITH n AS (SELECT doc_id, string_split($normSql, ' ') AS w
            FROM documents),
          l AS (SELECT doc_id, CAST(i AS INT) AS idx,
              array_to_string(w[i*12+1 : i*12+12], ' ') AS line
            FROM n, unnest(range(CAST(ceil(len(w)/12.0) AS INT))) AS u(i)),
          sc AS (SELECT doc_id, string_split(line, ' ') AS t FROM l),
          p AS (SELECT doc_id,
              CAST(len(list_filter(t, x -> x IN ('der','die','und'))) AS INT) AS sc_de,
              CAST(len(list_filter(t, x -> x IN ('the','and','of'))) AS INT) AS sc_en,
              CAST(len(list_filter(t, x -> x IN ('el','los','y'))) AS INT) AS sc_es,
              CAST(len(list_filter(t, x -> x IN ('le','la','et'))) AS INT) AS sc_fr
            FROM sc),
          v AS (SELECT doc_id,
              CASE WHEN sc_de >= sc_en AND sc_de >= sc_es AND sc_de >= sc_fr THEN 'de'
                   WHEN sc_en >= sc_es AND sc_en >= sc_fr THEN 'en'
                   WHEN sc_es >= sc_fr THEN 'es'
                   ELSE 'fr' END AS pred
            FROM p)
        SELECT d.doc_id, d.lang, CAST(count(*) AS BIGINT) AS n_lines,
          CAST(sum(CASE WHEN pred <> d.lang THEN 1 ELSE 0 END) AS BIGINT)
            AS n_foreign,
          round(CAST(sum(CASE WHEN pred <> d.lang THEN 1 ELSE 0 END) AS DOUBLE)
            / count(*), 6) AS mix_r
        FROM v JOIN documents d ON v.doc_id = d.doc_id
        GROUP BY d.doc_id, d.lang ORDER BY d.doc_id""")),
    "ewma_smooth" -> {
      // Quantized EWMA weights (α = 0.25, 16 lags): W_j =
      // round(250000·0.75^j). ONE Scala list generates BOTH the Column
      // expression and the oracle SQL text, so the weights cannot fork.
      val ws = Seq(250000L, 187500L, 140625L, 105469L, 79102L, 59326L,
        44495L, 33371L, 25028L, 18771L, 14078L, 10559L, 7919L, 5939L,
        4454L, 3341L)
      val numSql = ws.zipWithIndex
        .map { case (w, j) => s"COALESCE(lag(y, $j) OVER w, 0) * $w" }
        .mkString(" + ")
      val denSql = ws.zipWithIndex
        .map { case (w, j) =>
          s"CASE WHEN lag(y, $j) OVER w IS NOT NULL THEN $w ELSE 0 END" }
        .mkString(" + ")
      Q(
        // EWMA-smoothed daily spend (X84): exponentially weighted moving
        // average over the last 16 observed days — the trend line every
        // monitoring feed draws. Float-proof by construction: the weights
        // are INTEGER micro-units (quantized once, above), the daily
        // series is integer cents, so numerator and denominator are exact
        // long sums renormalized over the lags actually present (the
        // series head uses fewer); ONE double division closes each row.
        // The unpartitioned window is bounded by the CALENDAR (|days|
        // rows after the day-grain aggregate) — the daily_spine argument.
        (s, d) => {
          import org.apache.spark.sql.expressions.Window
          val byDay = Tables.events(s, d)
            .select(to_date(col("ts")).as("day"), cents(col("value")).as("c"))
            .groupBy("day").agg(sum("c").as("y"))
          val w = Window.orderBy("day")
          val num = ws.zipWithIndex.map { case (wj, j) =>
            coalesce(lag(col("y"), j).over(w), lit(0L)) * wj
          }.reduce(_ + _)
          val den = ws.zipWithIndex.map { case (wj, j) =>
            when(lag(col("y"), j).over(w).isNotNull, lit(wj)).otherwise(0L)
          }.reduce(_ + _)
          byDay
            .withColumn("ewma_r",
              round(num.cast("double") / den.cast("double"), 6))
            .orderBy("day")
        },
        Some(s"""WITH byday AS (SELECT CAST(ts AS DATE) AS day,
              CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
            FROM events GROUP BY 1)
          SELECT day, y,
            round(CAST($numSql AS DOUBLE) / CAST($denSql AS DOUBLE), 6) AS ewma_r
          FROM byday WINDOW w AS (ORDER BY day) ORDER BY day"""))
    },
    "holt_trend" -> {
      // Holt's linear-trend smoothing (X96), the forecasting step above
      // X84's EWMA: level l_k = αy_k + (1−α)(l_{k−1}+b_{k−1}), trend
      // b_k = β(l_k−l_{k−1}) + (1−β)b_{k−1}, RE-INITIALIZED over each
      // day's trailing 16-observation window (l₁ = y₁, b₁ = 0) — the
      // windowed form is chosen deliberately: a steady-state lag
      // truncation of the infinite recursion is NOT self-consistent (its
      // truncated level mass sums to 1.055 because the trend-coupled
      // weights oscillate — measured 7% off the true recursion), while
      // the windowed recursion is an EXACT linear function of its 16
      // inputs. The 16 level/trend coefficients are derived below by
      // running the recursion symbolically (α=0.3, β=0.2) and quantized
      // once to integer micro-units: one Scala list emits both the
      // Column tree and the oracle SQL, both engines sum the same exact
      // longs, and the spec replays the 16-step recursion to quantization
      // precision. Rows without all 16 lags are not emitted.
      val (alpha, beta, lags) = (0.3, 0.2, 16)
      val (lw, bw) = {
        // symbolic recursion: cl(k)(i) = coefficient of y_i in l_k
        var cl = Array.tabulate(lags)(i => if (i == 0) 1.0 else 0.0)
        var cb = Array.fill(lags)(0.0)
        for (k <- 1 until lags) {
          val nl = Array.tabulate(lags) { i =>
            (if (i == k) alpha else 0.0) + (1 - alpha) * (cl(i) + cb(i))
          }
          val nb = Array.tabulate(lags)(i =>
            beta * (nl(i) - cl(i)) + (1 - beta) * cb(i))
          cl = nl; cb = nb
        }
        // cl(i) weights y at window position i (i = 0 oldest); lag j of
        // day t is window position 15 − j
        (Array.tabulate(lags)(j => math.round(cl(lags - 1 - j) * 1000000)),
         Array.tabulate(lags)(j => math.round(cb(lags - 1 - j) * 1000000)))
      }
      def sumSql(ws: Array[Long]) = ws.zipWithIndex
        .map { case (w, j) => s"lag(y, $j) OVER w * ($w)" }.mkString(" + ")
      Q(
        (s, d) => {
          import org.apache.spark.sql.expressions.Window
          val byDay = Tables.events(s, d)
            .select(to_date(col("ts")).as("day"), cents(col("value")).as("c"))
            .groupBy("day").agg(sum("c").as("y"))
          // unpartitioned window bounded by the CALENDAR (|days| rows
          // after the day-grain aggregate) — the daily_spine argument
          val w = Window.orderBy("day")
          def wsum(ws: Array[Long]) = ws.zipWithIndex.map { case (wj, j) =>
            lag(col("y"), j).over(w) * wj
          }.reduce(_ + _)
          byDay
            .withColumn("lsum", wsum(lw))
            .withColumn("bsum", wsum(bw))
            .filter(col("lsum").isNotNull) // all 16 lags present
            .select(col("day"), col("y"),
              round(col("lsum").cast("double") / 1e6, 6).as("level_r"),
              round(col("bsum").cast("double") / 1e6, 6).as("trend_r"),
              round((col("lsum") + lit(7L) * col("bsum")).cast("double") / 1e6, 6)
                .as("forecast7_r"))
            .orderBy("day")
        },
        Some(s"""WITH byday AS (SELECT CAST(ts AS DATE) AS day,
              CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
            FROM events GROUP BY 1),
          sm AS (SELECT day, y,
              ${sumSql(lw)} AS lsum,
              ${sumSql(bw)} AS bsum
            FROM byday WINDOW w AS (ORDER BY day))
          SELECT day, y,
            round(CAST(lsum AS DOUBLE) / 1e6, 6) AS level_r,
            round(CAST(bsum AS DOUBLE) / 1e6, 6) AS trend_r,
            round(CAST(lsum + 7 * bsum AS DOUBLE) / 1e6, 6) AS forecast7_r
          FROM sm WHERE lsum IS NOT NULL ORDER BY day"""))
    },
    "seasonal_anomaly" -> Q(
      // Seasonal anomaly screen (X85): daily spend vs its day-of-week
      // baseline, flagged when the residual z-score clears 2 — the
      // weekly-rhythm-aware outlier detector (a quiet Sunday is normal;
      // the same total on a Tuesday is not). Day-of-week is (epoch-day
      // mod 7) — pure integer, immune to the Sun=0/Sun=1 split between
      // engines' dayofweek(). Each dow's baseline comes from exact
      // integer moments (n, Σy, Σy²); the 7-row stats frame broadcasts
      // back onto the |days| series. z rounds BEFORE the flag compare so
      // both engines make the identical threshold decision.
      (s, d) => {
        val byDay = Tables.events(s, d)
          .select(to_date(col("ts")).as("day"), cents(col("value")).as("c"))
          .groupBy("day").agg(sum("c").as("y"))
          .withColumn("dow",
            datediff(col("day"), lit("1970-01-01")).cast("long") % 7)
        // Σy² rides 128-bit integers (the zone_trend promotion): daily
        // cents square past Long at the 100× corpus (y² ≈ 1.6·10¹⁹) —
        // DECIMAL(19,0)² → DECIMAL(38,0) is exact to ~10¹⁸ cents/day
        val st = byDay.groupBy("dow").agg(count(lit(1)).as("n"),
          sum("y").as("s1"),
          sum(col("y").cast("decimal(19,0)")
            * col("y").cast("decimal(19,0)")).as("s2"))
        val nD = col("n").cast("double")
        val varr = (col("s2").cast("double")
          - col("s1").cast("double") * col("s1").cast("double") / nD) /
          (nD - lit(1.0))
        byDay.join(broadcast(st), Seq("dow"))
          .withColumn("z_r",
            when(col("n") === 1 || varr <= 0.0, lit(0.0))
              .otherwise(round((col("y").cast("double")
                - col("s1").cast("double") / nD) / sqrt(varr), 6)))
          .select(col("day"), col("y"), col("dow"), col("z_r"),
            (abs(col("z_r")) > 2.0).as("is_anom"))
          .orderBy("day")
      },
      Some("""WITH byday AS (SELECT CAST(ts AS DATE) AS day,
              CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
            FROM events GROUP BY 1),
          dd AS (SELECT day, y,
              CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) % 7 AS dow
            FROM byday),
          st AS (SELECT dow, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(y) AS BIGINT) AS s1,
              sum(CAST(y AS HUGEINT) * y) AS s2
            FROM dd GROUP BY 1),
          j AS (SELECT day, y, dd.dow AS dow, n, s1, s2,
              (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v
            FROM dd JOIN st ON dd.dow = st.dow)
        SELECT day, y, dow,
          CASE WHEN n = 1 OR v <= 0.0 THEN 0.0
            ELSE round((CAST(y AS DOUBLE) - CAST(s1 AS DOUBLE)
              / CAST(n AS DOUBLE)) / sqrt(v), 6) END AS z_r,
          abs(CASE WHEN n = 1 OR v <= 0.0 THEN 0.0
            ELSE round((CAST(y AS DOUBLE) - CAST(s1 AS DOUBLE)
              / CAST(n AS DOUBLE)) / sqrt(v), 6) END) > 2.0 AS is_anom
        FROM j ORDER BY day""")),
    "cluster_balanced_sample" -> Q(
      // Duplicate-aware sampling (X86): keep each document with
      // probability ~1/|its dup cluster| so a boilerplate megacluster
      // contributes ~one representative — the dedup-aware sampler that
      // flattens duplication without a hard purge. Deterministic and
      // engine-portable: the keep decision is "value of the first two
      // md5 hex digits of the doc id × cluster size < 256" (the X13
      // strpos bucket primitive, two digits for 1/256 granularity).
      // Reads the memoized CC labels; output is the per-size audit
      // (clusters, docs, kept) that proves the flattening.
      (s, d) => {
        val sz = dupClusters(s, d)
          .groupBy(col("rep")).agg(count(lit(1)).as("sz"))
        val keep = dupClusters(s, d).join(sz, Seq("rep"))
          .withColumn("h", md5(col("node").cast("string")))
          .withColumn("b",
            hexv(substring(col("h"), 1, 1)) * 16
              + hexv(substring(col("h"), 2, 1)))
          .withColumn("kept", col("b").cast("long") * col("sz") < 256)
        keep.groupBy(col("sz"))
          .agg(countDistinct(col("rep")).as("n_clusters"),
            count(lit(1)).as("n_docs"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
          .orderBy("sz")
      },
      Some(s"""WITH RECURSIVE $minhashPairCtes,
          edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                    UNION ALL SELECT doc_b, doc_a FROM pairs),
          walk(node, rep) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.src, w.rep FROM edges e JOIN walk w ON e.dst = w.node),
          lab AS (SELECT node, min(rep) AS rep FROM walk GROUP BY node),
          cl AS (SELECT rep, CAST(count(*) AS BIGINT) AS sz FROM lab
            GROUP BY rep),
          k AS (SELECT lab.node, lab.rep, sz,
              CAST((strpos('0123456789abcdef',
                  substring(md5(CAST(node AS VARCHAR)), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef',
                  substring(md5(CAST(node AS VARCHAR)), 2, 1)) - 1)
                AS BIGINT) AS b
            FROM lab JOIN cl ON lab.rep = cl.rep)
        SELECT sz, CAST(count(DISTINCT rep) AS BIGINT) AS n_clusters,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN b * sz < 256 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_kept
        FROM k GROUP BY sz ORDER BY sz""")),
    "shard_balance" -> Q(
      // Token-balanced sharding (X87): snake-pack documents into 8
      // training shards by token count — rank docs largest-first, deal
      // ranks 1..16 boustrophedon (0..7 then 7..0), repeat — the greedy
      // layout that bounds shard skew without a driver-side loop. The
      // global rank uses the gini two-phase banded trick (equi-depth
      // token bands sort independently, offsets broadcast); the descending index is
      // n+1−i so the banded ascending rank serves directly. Everything
      // is integer; the output is the 8-row shard audit.
      (s, d) => {
        val nt = docs(s, d).select(col("doc_id"),
          size(split(LlmOps.normText(col("text")), " ")).cast("long").as("n_tok"))
        val tot = nt.agg(count(lit(1)).as("nn"))
        bandedRank(nt, "n_tok", "doc_id", asc = true, "i")
          .crossJoin(broadcast(tot))
          .withColumn("idesc", col("nn") + 1 - col("i"))
          .withColumn("pos", (col("idesc") - 1) % 16)
          .withColumn("shard",
            when(col("pos") < 8, col("pos")).otherwise(lit(15L) - col("pos")))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("total_tokens"))
          .orderBy("shard")
      },
      Some(s"""WITH nt AS (SELECT doc_id,
              CAST(len(string_split($normSql, ' ')) AS BIGINT) AS n_tok
            FROM documents),
          r AS (SELECT n_tok,
              CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id DESC)
                AS BIGINT) AS idesc
            FROM nt),
          p AS (SELECT n_tok, (idesc - 1) % 16 AS pos FROM r)
        SELECT CASE WHEN pos < 8 THEN pos ELSE 15 - pos END AS shard,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_tok) AS BIGINT) AS total_tokens
        FROM p GROUP BY 1 ORDER BY shard""")),
    "chi2_tokens" -> Q(
      // χ² feature selection (X88): the 5 most language-discriminative
      // tokens per lang by the 2×2 chi-square statistic — the classical
      // "which features identify this class" screen. Every margin
      // (a, ta, la, N) is an exact integer count; the statistic applies
      // one canonical IEEE op order to those integers on both engines
      // and rounds to 6 BEFORE ranking (ties broken by token), so the
      // top-5 cut is engine-independent. Degenerate margins (token or
      // lang covering the whole corpus) guard to 0. Plan shape: the
      // token-grain equi-join shuffles once; the 4-row lang margin and
      // the 1-row total broadcast; the per-lang cut is a WindowGroupLimit.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // four consumers (token margin, lang margin, total, scored join)
        // re-ran the tokenize + join + aggregate: DISK_ONLY per the
        // corpus-sized shared-frame policy (r16; (token, lang) grain is
        // vocabulary-proportional)
        val tl = tokens(s, d)
          .join(docs(s, d).select(col("doc_id"), col("lang")), Seq("doc_id"))
          .groupBy(col("token"), col("lang")).agg(count(lit(1)).as("a"))
          .diskCheckpointLazy()
        val ta = tl.groupBy("token").agg(sum("a").as("ta"))
        val la = tl.groupBy("lang").agg(sum("a").as("la"))
        val nn = tl.agg(sum("a").as("nn"))
        val aD = col("a").cast("double")
        val bD = (col("ta") - col("a")).cast("double")
        val cD = (col("la") - col("a")).cast("double")
        val dD = (col("nn") - col("ta") - col("la") + col("a")).cast("double")
        val det = aD * dD - bD * cD
        val den = col("ta").cast("double") * (col("nn") - col("ta")).cast("double") *
          col("la").cast("double") * (col("nn") - col("la")).cast("double")
        val scored = tl.join(ta, Seq("token"))
          .join(broadcast(la), Seq("lang"))
          .crossJoin(broadcast(nn))
          .withColumn("chi2_r",
            when(col("ta") === col("nn") || col("la") === col("nn"), lit(0.0))
              .otherwise(round(col("nn").cast("double") * det * det / den, 6)))
        val w = Window.partitionBy("lang").orderBy(col("chi2_r").desc, col("token"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("lang"), col("token"), col("a"),
            col("chi2_r"), col("rn").cast("long").as("rn"))
          .orderBy("lang", "rn")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(string_split($normSql, ' '))
              AS token FROM documents),
          tl AS (SELECT token, lang, CAST(count(*) AS BIGINT) AS a
            FROM tok JOIN documents USING (doc_id) GROUP BY 1, 2),
          ta AS (SELECT token, CAST(sum(a) AS BIGINT) AS ta FROM tl GROUP BY 1),
          lm AS (SELECT lang, CAST(sum(a) AS BIGINT) AS la FROM tl GROUP BY 1),
          nt AS (SELECT CAST(sum(a) AS BIGINT) AS nn FROM tl),
          sc AS (SELECT tl.lang, tl.token, a,
              CASE WHEN ta = nn OR la = nn THEN 0.0
                ELSE round(CAST(nn AS DOUBLE)
                  * (CAST(a AS DOUBLE) * CAST(nn - ta - la + a AS DOUBLE)
                    - CAST(ta - a AS DOUBLE) * CAST(la - a AS DOUBLE))
                  * (CAST(a AS DOUBLE) * CAST(nn - ta - la + a AS DOUBLE)
                    - CAST(ta - a AS DOUBLE) * CAST(la - a AS DOUBLE))
                  / (CAST(ta AS DOUBLE) * CAST(nn - ta AS DOUBLE)
                    * CAST(la AS DOUBLE) * CAST(nn - la AS DOUBLE)), 6)
                END AS chi2_r
            FROM tl JOIN ta USING (token) JOIN lm USING (lang) CROSS JOIN nt),
          rk AS (SELECT lang, token, a, chi2_r,
              CAST(row_number() OVER (PARTITION BY lang
                ORDER BY chi2_r DESC, token) AS BIGINT) AS rn
            FROM sc)
        SELECT lang, token, a, chi2_r, rn FROM rk WHERE rn <= 5
        ORDER BY lang, rn""")),
    "zorder_key" -> Q(
      // Z-order (Morton) clustering key (X70) — the data-LAYOUT operator
      // (Delta/Iceberg ZORDER analog): interleave the bits of two scan
      // dimensions so one sort co-locates BOTH, and parquet row-group
      // min/max pruning works for filters on either dimension. Here:
      // x = length bucket (floor(n_chars/4), 8 bits), y = language
      // ordinal (3 bits, repeated into the interleave). Pure codegen'd
      // integer bit algebra — no UDF, no shuffle beyond the final
      // deterministic sort; at 100 TB this runs as the projection feeding
      // a sortWithinPartitions/write, and the key (not this query's
      // ORDER BY) is what clusters the files. PropertySpec pins the
      // bit-exact Scala mirror and the quadrant-recursive locality law.
      (s, d) => {
        val langOrd = when(col("lang") === "de", 0).when(col("lang") === "en", 1)
          .when(col("lang") === "es", 2).when(col("lang") === "fr", 3)
          .otherwise(4)
        val zx = least(floor(col("n_chars") / 4).cast("int"), lit(255))
        // interleave: bit i of x → bit 2i+1, bit (i mod 3) of y → bit 2i
        val zkey = (0 until 8).map { i =>
          (shiftleft(shiftright(col("zx"), i).bitwiseAND(lit(1)), 2 * i + 1)
            .bitwiseOR(shiftleft(shiftright(col("zy"), i % 3).bitwiseAND(lit(1)), 2 * i)))
        }.reduce(_ bitwiseOR _)
        docs(s, d)
          .select(col("doc_id"), zx.as("zx"), langOrd.as("zy"))
          .withColumn("zkey", zkey.cast("long"))
          .orderBy("zkey", "doc_id")
      },
      Some("""WITH b AS (SELECT doc_id,
            CAST(least(floor(n_chars / 4), 255) AS INT) AS zx,
            CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2
              WHEN 'fr' THEN 3 ELSE 4 END AS zy
          FROM documents)
        SELECT doc_id, zx, zy, CAST(
          ((zx >> 0) & 1) * 2 + ((zy >> 0) & 1) * 1 +
          ((zx >> 1) & 1) * 8 + ((zy >> 1) & 1) * 4 +
          ((zx >> 2) & 1) * 32 + ((zy >> 2) & 1) * 16 +
          ((zx >> 3) & 1) * 128 + ((zy >> 0) & 1) * 64 +
          ((zx >> 4) & 1) * 512 + ((zy >> 1) & 1) * 256 +
          ((zx >> 5) & 1) * 2048 + ((zy >> 2) & 1) * 1024 +
          ((zx >> 6) & 1) * 8192 + ((zy >> 0) & 1) * 4096 +
          ((zx >> 7) & 1) * 32768 + ((zy >> 1) & 1) * 16384
          AS BIGINT) AS zkey
        FROM b ORDER BY zkey, doc_id""")),
    "dup_pagerank" -> Q(
      // PageRank over the duplicate graph (X57 companion): rank ≈ how
      // central a doc is in its near-dup neighborhood — boilerplate hubs
      // score high, incidental pairs stay near the floor. Same scale
      // discipline as connected components: K fixed iterations, each ONE
      // join + ONE aggregate over the (bounded) LSH edge list, no
      // driver-side graph state; the shared pair memo feeds it. Ranks are
      // integer MICRO-POINTS (mass 10^6, contributions by exact integer
      // division `div`), so every engine sums the same integers in any
      // order — cross-engine float drift is structurally impossible
      // (doc_quality_composite's trick, applied to an iterative op).
      // Iterated at signature-group grain (the automorphism argument):
      // all members of a group have the same neighbor multiset shape —
      // (m-1) in-group peers plus every member of each quotient-adjacent
      // group — so they carry ONE common integer rank per iteration, and
      // the group recurrence sc_a = (m_a-1)·(r_a div d_a) +
      // Σ_{b~a} m_b·(r_b div d_b) reproduces the node-grain integer
      // arithmetic EXACTLY (multiplying by a count is repeated exact
      // addition; `div` happens before the multiply in both forms). A
      // megacluster contributes one group row per iteration instead of
      // O(k²) contribution edges; the oracle still iterates the
      // node-grain all-pairs form.
      (s, d) => {
        // graph nodes = docs with ≥1 pair edge ⇔ members of groups with
        // degree > 0 (m ≥ 2 or any quotient neighbor)
        val deg = mhGroupDegrees(s, d).filter(col("degree") > 0)
          .diskCheckpointLazy()
        val qe = mhQEdges(s, d)
        val sym = qe.select(col("ga").as("gid"), col("gb").as("nb"))
          .unionAll(qe.select(col("gb"), col("ga")))
        val nDf = deg.agg(sum(col("m")).as("n_nodes"))
        // broadcast the 1-row node count explicitly (estimate-proof build
        // side — same rule as every other scalar attach)
        var r = deg.crossJoin(broadcast(nDf))
          .select(col("gid"), col("m"), col("degree"),
            expr("1000000 div n_nodes").as("r"))
        for (_ <- 1 to 3) {
          // every frame in the loop is group-proportional with
          // estimate-only stats (memo/aggregate lineage) — hint so no
          // iteration broadcasts the graph (SCALE.md LogicalRDD-stats
          // lesson)
          val c = r.select(col("gid"), col("m"), col("degree"),
            expr("r div degree").as("c"))
          val xmass = sym.join(c.select(col("gid").as("nb"),
              col("m").as("nm"), col("c").as("nc")).hint("shuffle_hash"),
              Seq("nb"))
            .groupBy(col("gid")).agg(sum(col("nm") * col("nc")).as("xm"))
          r = c.join(xmass.hint("shuffle_hash"), Seq("gid"), "left")
            .crossJoin(broadcast(nDf))
            .select(col("gid"), col("m"), col("degree"),
              (expr("150000 div n_nodes") +
                expr("(85 * ((m - 1) * c + coalesce(xm, 0))) div 100")).as("r"))
        }
        mhGrouped(s, d).select(col("doc_id"), col("gid"))
          .join(r.select(col("gid"), col("r")).hint("shuffle_hash"), Seq("gid"))
          .select(col("doc_id"), col("r").cast("long").as("rank_upts"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $minhashPairCtes,
          edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                    UNION ALL SELECT doc_b, doc_a FROM pairs),
          deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
          nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
          nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
          r0 AS (SELECT doc_id, 1000000 // n_nodes AS r FROM nodes, nn),
          s1 AS (SELECT dst, sum(r0.r // deg.deg) AS sc
            FROM edges e JOIN deg USING (src) JOIN r0 ON e.src = r0.doc_id
            GROUP BY dst),
          r1 AS (SELECT dst AS doc_id,
            150000 // n_nodes + (85 * sc) // 100 AS r FROM s1, nn),
          s2 AS (SELECT dst, sum(r1.r // deg.deg) AS sc
            FROM edges e JOIN deg USING (src) JOIN r1 ON e.src = r1.doc_id
            GROUP BY dst),
          r2 AS (SELECT dst AS doc_id,
            150000 // n_nodes + (85 * sc) // 100 AS r FROM s2, nn),
          s3 AS (SELECT dst, sum(r2.r // deg.deg) AS sc
            FROM edges e JOIN deg USING (src) JOIN r2 ON e.src = r2.doc_id
            GROUP BY dst),
          r3 AS (SELECT dst AS doc_id,
            150000 // n_nodes + (85 * sc) // 100 AS r FROM s3, nn)
        SELECT doc_id, CAST(r AS BIGINT) AS rank_upts
        FROM r3 ORDER BY doc_id""")),
    "range_join" -> Q(
      // Interval-overlap join (point-in-interval), the operator Spark has
      // no native form of: for every `error` event, how many sessions —
      // ANY user's — were active at that instant (concurrency under
      // incident). The naive form is a cross join with a BETWEEN filter
      // (O(points × intervals), a BroadcastNestedLoopJoin Spark would
      // happily produce); this plans it as an EQUI-join by time-bin
      // blocking: each session explodes to the hour-bins it covers, each
      // point maps to its single bin, the join key is the bin, and the
      // exact BETWEEN runs post-join. A point lives in exactly one bin,
      // so each (session, point) pair meets at most once — no dedup pass.
      // Bin fan-out is bounded by interval length (30-min-gap sessions
      // span few hours); PlanSpec pins the no-nested-loop shape. Exact
      // epoch-micro arithmetic uses `div`, never double division.
      (s, d) => {
        val sess = sessionizedEvents(s, d)
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
        val binned = sess.withColumn("bin",
          explode(sequence(expr("s_us div 3600000000"), expr("e_us div 3600000000"))))
        val pts = eventsUs(s, d).filter(col("event_type") === "error")
          .withColumn("bin", expr("us div 3600000000"))
        pts.join(binned,
            Seq("bin").map(k => pts(k) === binned(k)).reduce(_ && _)
              && col("us").between(col("s_us"), col("e_us")), "left")
          .groupBy(col("event_id"))
          .agg(count(col("s_us")).as("n_active"))
          .orderBy("event_id")
      },
      Some(s"""WITH $sessionCtes,
          sess AS (SELECT user_id, sid, min(us) AS s_us, max(us) AS e_us
            FROM g GROUP BY 1, 2),
          pts AS (SELECT event_id, us FROM e WHERE event_type = 'error')
        SELECT p.event_id, CAST(count(s.s_us) AS BIGINT) AS n_active
        FROM pts p LEFT JOIN sess s ON p.us BETWEEN s.s_us AND s.e_us
        GROUP BY p.event_id ORDER BY p.event_id""")),
    "gap_fill_locf" -> Q(
      // Forward-fill (last-observation-carried-forward) over an HOURLY
      // spine (X41 companion): per event_type, hours with no observations
      // inherit the most recent observed hourly mean — the imputation
      // step a model feed needs where daily_spine's zero-fill would lie
      // (a missing sensor hour is not a zero reading). Hour grain is
      // deliberate: the fixture's daily series has no gaps at any SF, so
      // only the hourly series actually exercises the fill. Spine =
      // |types|×|hours| rows (calendar-bounded, same argument as
      // daily_spine); the fill is one per-type window, partitioned so no
      // single-task global sort exists. Observed means round to 6dp
      // BEFORE the fill, so the carried value is the same literal both
      // engines propagate; hours before a type's first observation stay
      // NULL by LOCF law.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
            col("value"))
        val byHour = ev.groupBy(col("event_type"), col("h"))
          .agg(round(avg(col("value")), 6).as("v_obs"))
        val hours = ev.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("interval 1 hour"))).as("h"))
        val types = ev.select(col("event_type")).distinct()
        val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // spine = hours × types: stream the hour spine (it grows with the
        // covered time range), hint-broadcast the |event_types| side (a
        // handful of rows at any corpus size) — a bare crossJoin left the
        // build-side choice to stats estimates
        hours.crossJoin(broadcast(types))
          .join(byHour, Seq("event_type", "h"), "left")
          .select(col("event_type"), col("h"),
            last(col("v_obs"), ignoreNulls = true).over(w).as("v_filled"),
            when(col("v_obs").isNotNull, 1).otherwise(0).as("observed"))
          .orderBy("event_type", "h")
      },
      Some("""WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h, value
            FROM events),
          byhour AS (SELECT event_type, h, round(avg(value), 6) AS v_obs
            FROM ev GROUP BY 1, 2),
          b AS (SELECT min(h) AS lo, max(h) AS hi FROM ev),
          hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM b),
          types AS (SELECT DISTINCT event_type FROM ev),
          spine AS (SELECT event_type, h FROM types, hours)
        SELECT s.event_type, s.h,
          last_value(v_obs IGNORE NULLS) OVER (PARTITION BY s.event_type
            ORDER BY s.h ROWS UNBOUNDED PRECEDING) AS v_filled,
          CASE WHEN v_obs IS NOT NULL THEN 1 ELSE 0 END AS observed
        FROM spine s LEFT JOIN byhour USING (event_type, h)
        ORDER BY event_type, h""")))

  // ---- §2.11 wave 3: corpus governance & audit ops ---------------------
  private val governanceQueries: Seq[(String, Q)] = Seq(
    "mix_waterfill" -> Q(
      // Training-mix waterfill (X89): allocate a global character budget
      // (40% of total supply) across languages with EQUAL target shares,
      // capped by per-language supply — the data-mixing step that decides
      // how much of each language a training run actually takes. Exact
      // integer arithmetic throughout. The capped set is found closed-form,
      // not iteratively: sorting languages by supply ascending,
      // f(i) = B − cum_{i−1} − sup_i·(k−i+1) is non-increasing
      // (f(i+1)−f(i) = (k−i)(sup_i − sup_{i+1}) ≤ 0), so "capped" is a
      // PREFIX of the sort and one window pass decides it. The leftover
      // budget splits evenly over uncapped languages, remainder dealt to
      // the smallest-supply uncapped ones — fully deterministic. Every
      // frame after the first aggregate is |langs|-sized, so the
      // unpartitioned windows run over a handful of rows at any corpus
      // scale; the only corpus-sized work is ONE map-side-combinable
      // supply aggregate.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val sup = docs(s, d).groupBy(col("lang"))
          .agg(sum(col("n_chars")).as("sup"))
        val tot = sup.agg(sum(col("sup")).as("tot"),
          count(lit(1)).as("k"))
        val w = Window.orderBy(col("sup").asc, col("lang").asc) // |langs| rows
        val ranked = sup.crossJoin(broadcast(tot))
          .withColumn("budget", expr("(tot * 2) div 5"))
          .withColumn("idx", row_number().over(w).cast("long"))
          .withColumn("cum", sum(col("sup")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rem", col("budget") - (col("cum") - col("sup")))
          .withColumn("capped",
            col("sup") * (col("k") - col("idx") + 1) <= col("rem"))
        val cagg = ranked.agg(
          sum(when(col("capped"), col("sup")).otherwise(0L)).as("cap_sum"),
          sum(when(col("capped"), 1L).otherwise(0L)).as("n_capped"))
        ranked.crossJoin(broadcast(cagg))
          .withColumn("alloc",
            when(col("capped"), col("sup")).otherwise(
              expr("(budget - cap_sum) div (k - n_capped)") +
                when(col("idx") - col("n_capped") <=
                  (col("budget") - col("cap_sum")) % (col("k") - col("n_capped")),
                  1L).otherwise(0L)))
          .select(col("lang"), col("sup"), col("budget"), col("capped"),
            col("alloc"))
          .orderBy("lang")
      },
      Some("""WITH sup AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS sup
            FROM documents GROUP BY 1),
          t AS (SELECT CAST(sum(sup) AS BIGINT) AS tot,
            CAST(count(*) AS BIGINT) AS k FROM sup),
          r AS (SELECT lang, sup, tot, k, (tot * 2) // 5 AS budget,
            CAST(row_number() OVER (ORDER BY sup, lang) AS BIGINT) AS idx,
            CAST(sum(sup) OVER (ORDER BY sup, lang ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum
          FROM sup, t),
          c AS (SELECT *, budget - (cum - sup) AS rem,
            sup * (k - idx + 1) <= budget - (cum - sup) AS capped FROM r),
          agg AS (SELECT
            CAST(sum(CASE WHEN capped THEN sup ELSE 0 END) AS BIGINT) AS cap_sum,
            CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS n_capped
          FROM c)
        SELECT lang, sup, CAST(budget AS BIGINT) AS budget, capped,
          CAST(CASE WHEN capped THEN sup ELSE
            (budget - cap_sum) // (k - n_capped) +
              (CASE WHEN idx - n_capped <=
                 (budget - cap_sum) % (k - n_capped) THEN 1 ELSE 0 END)
          END AS BIGINT) AS alloc
        FROM c, agg ORDER BY lang""")),
    "mix_temperature" -> Q(
      // Temperature-scaled language mixing (X97): reweight natural
      // language proportions p_l by p^(1/T) with T ≈ 1.43 (exponent 0.7)
      // and renormalize — the standard multilingual up/down-sampling rule
      // (low-resource languages gain mass as T rises). Complements X89's
      // budget waterfill: waterfill answers "how much fits", temperature
      // answers "what the target proportions should be". One map-side
      // combinable supply aggregate; everything after is |langs|-row.
      // The pow/sum/divide floats run in one identical op order on both
      // engines and round to 6; supplies and allocations stay integer.
      (s, d) => {
        val sup = docs(s, d).groupBy(col("lang"))
          .agg(sum(col("n_chars")).as("sup"))
        val tot = sup.agg(sum(col("sup")).as("tot"),
          sum(pow(col("sup").cast("double"), lit(0.7))).as("z"))
        // target_chars derives INTEGER-ONLY from the rounded micro-unit
        // weight (w6 · tot div 10⁶): a float floor at an integer
        // boundary is exactly the cross-engine tie class the r4
        // composite-quality bug came from
        sup.crossJoin(broadcast(tot))
          .withColumn("w6",
            floor(pow(col("sup").cast("double"), lit(0.7)) / col("z")
              * 1000000 + lit(0.5)).cast("long"))
          .select(col("lang"), col("sup"),
            round(col("sup").cast("double") / col("tot"), 6).as("p_r"),
            (col("w6").cast("double") / 1e6).as("w_r"),
            // split multiply: (w6·tot) div 10⁶ directly overflows a long
            // once tot ≥ ~9.2e12 chars (far below the 100 TB operating
            // point; Spark would wrap silently, DuckDB would raise); with
            // tot = q·10⁶ + r the identity w6·q + (w6·r) div 10⁶ is exact
            // and every product stays ≤ tot
            expr("w6 * (tot div 1000000) + (w6 * (tot % 1000000)) div 1000000")
              .as("target_chars"))
          .orderBy("lang")
      },
      Some("""WITH sup AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS sup
            FROM documents GROUP BY 1),
          t AS (SELECT CAST(sum(sup) AS BIGINT) AS tot,
            sum(pow(CAST(sup AS DOUBLE), 0.7)) AS z FROM sup),
          w AS (SELECT lang, sup, tot,
            CAST(floor(pow(CAST(sup AS DOUBLE), 0.7) / z * 1000000 + 0.5)
              AS BIGINT) AS w6
          FROM sup, t)
        SELECT lang, sup,
          round(CAST(sup AS DOUBLE) / tot, 6) AS p_r,
          CAST(w6 AS DOUBLE) / 1e6 AS w_r,
          w6 * (tot // 1000000) + (w6 * (tot % 1000000)) // 1000000
            AS target_chars
        FROM w ORDER BY lang""")),
    "dedup_containment" -> Q(
      // Asymmetric containment dedup (X2h): C(A,B) = |sh(A)∩sh(B)| / |sh(A)|
      // over distinct 8-char shingles — catches "doc A is an excerpt of
      // doc B", which symmetric Jaccard structurally misses (a 120-char
      // excerpt of a 3000-char doc has tiny Jaccard but containment 1).
      // The fixture is synthetic with no real excerpts, so the query
      // CONSTRUCTS them (text_clean's stress-input pattern): every
      // doc_id % 7 == 0 document contributes a derived excerpt row
      // (id -(doc_id+1), chars 11..130 of the normalized text).
      // Excerpt ids live in the NEGATIVE id space (-(doc_id + 1)) — an
      // additive offset would collide with real doc_ids on a large
      // corpus (doc_id + 10⁶ meets document 10⁶), silently corrupting
      // every id-keyed join downstream, identically on both engines.
      // Shingles come from a FIXED 512-char window of the normalized text
      // — the same bounded-per-doc-state trade text_fingerprint makes
      // (full-text containment is this plan with the window removed, at
      // cost linear in corpus bytes). Candidates come from PREFIX
      // FILTERING (PPJoin family): each doc probes with its 2 globally
      // RAREST shingles (smallest document frequency, shingle tie-break)
      // against the (doc, shingle) index — a shingle-keyed equi-join
      // whose fan per probe IS the probed shingle's document frequency,
      // which the rarest-first pick makes ~1-2, never a doc×doc cross.
      // (A hash-min signature pick correlates across docs: one common
      // shingle that hashes low becomes HALF the corpus's signature and
      // its candidate fan goes quadratic — measured 40 s vs 2 s at
      // sf0.1.) The df build and per-doc pick are one shingle-grain
      // aggregate + a WindowGroupLimit top-2. Full containment (θ=1) has
      // recall 1 by construction — EVERY shingle of A, including its 2
      // rarest, is in B; partial containment is probabilistic (LSH-style
      // trade, like X2/X2d).
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = docs(s, d).repartition(LlmOps.spreadWidth(docs(s, d)))
          .withColumn("norm", substring(LlmOps.normText(col("text")), 1, 512))
          .select(col("doc_id"), col("norm"))
        val corpus = base.unionByName(
          base.filter(col("doc_id") % 7 === 0)
            .select((-col("doc_id") - 1L).as("doc_id"),
              expr("substring(norm, 11, 120)").as("norm")))
        // native O(len) 8-gram shingles (norm is capped at 512 chars, so
        // the lambda form was only O(512²)-bounded, but the native walk
        // is strictly cheaper and keeps the shingling idiom uniform)
        val shE = array_distinct(
          graft.functions.native.char_ngrams(col("norm"), 8))
        val fil = corpus.filter(length(col("norm")) >= 8)
        // build each doc's shingle array ONCE and checkpoint the
        // (doc_id, s) frame — DISK_ONLY (Ckpt): corpus-sized blocks in
        // the unified pool starve downstream execution; the
        // ContextCleaner frees them once the query's frames are
        // unreachable, where an un-unpersisted cache would pin them for
        // the rest of a 190-query Verify run. Every consumer — the
        // exploded index with its df / signature / candidate /
        // per-doc-count readers, and the two set sides of the final
        // intersect — reads the materialized blocks. Without them each
        // consumer re-runs the scan + array build, and worse:
        // InferFiltersFromGenerate infers `size(s) > 0 AND isnotnull(s)`
        // from `explode(s)` and pushes the WHOLE array construction into
        // the parquet scan's row-level DataFilters, rebuilding every
        // doc's array twice more per row in interpreted mode (measured
        // 18 s vs 3 s for the explode alone at sf0.1). Over the
        // checkpoint the same inferred predicates are cheap size checks
        // on materialized arrays.
        // The checkpointed LogicalRDD carries the optimizer's per-row
        // SIZE ESTIMATE, which badly undercounts shingle arrays (~500
        // strings/doc) — left to stats, the planner BROADCASTS this
        // corpus-sized frame into its consumers (measured: OOM at the
        // 10x stress scale; fatal at 100 TB). Every join that carries
        // the array payload is therefore explicitly hinted `merge`
        // below: the no-broadcast decision is encoded in the plan, not
        // left to an estimate that degrades with corpus size.
        val shArr = fil.withColumn("s", shE)
          .select(col("doc_id"), col("s"))
          .diskCheckpoint()
        val idx = shArr.select(col("doc_id").as("doc_b"),
          explode(col("s")).as("w"))
        val df = idx.groupBy(col("w")).agg(count(lit(1)).as("df"))
        val wRare = Window.partitionBy(col("doc_b")).orderBy(col("df"), col("w"))
        // df's group key is the 8-char shingle VOCABULARY — corpus-
        // proportional, unlike the 36³-bounded trigram counts the jaccard
        // query leaves to AQE. Its size estimate still derives from the
        // checkpointed LogicalRDD (the estimate-stats cliff, laundered
        // through an aggregate), so left unhinted the planner broadcasts
        // it — measured dying at the r6 spill drive's 2 GiB driver on the
        // 10x corpus; unbuildable at 100 TB. merge, not shuffle_hash: a
        // shuffled-hash build is memory-RIGID (UnsafeHashedRelation
        // cannot spill), and AQE's coalescing targets SERIALIZED bytes
        // (~64 MB advisory), so the deserialized per-partition build
        // lands 3-5x over the target — the starved drive measured the
        // hash build dying at every partition count while sort-merge
        // spills through the same squeeze. Slim (w, df) rows sort cheap.
        val sig = idx.join(df.hint("merge"), Seq("w"))
          .withColumn("rk", row_number().over(wRare))
          .filter(col("rk") <= 2)
          .select(col("doc_b").as("doc_a"), col("w"))
        val cand = sig.join(idx.hint("merge"), Seq("w"))
          .filter(col("doc_a") =!= col("doc_b"))
          .select("doc_a", "doc_b").distinct()
        // the intersection CO-LOCATES whole shingle sets: each candidate
        // pair pulls both docs' cached arrays by id-keyed join and
        // intersects them in one project — the payload that shuffles is
        // |candidate docs| arrays, NOT the Σ n_a row expansion a
        // relational intersect (pair × shingle × index join) shuffles
        // (measured: the expansion form moves ~20 M rows through an extra
        // exchange and runs 4 s slower at sf0.1). All predicates here are
        // integer-only over cached columns, so nothing re-derives arrays.
        // merge, not shuffle_hash, for the array attaches too: a
        // LongHashedRelation build over array rows is memory-rigid, and
        // AQE coalesce (serialized-byte target) can hand one task a
        // deserialized build several times the per-task pool — the r6
        // starved drive killed the build at every partition count, while
        // sort-merge streams array rows through a spillable sorter. The
        // sort key is one long (doc id); the array payload just rides.
        // the pair sides carry the PACKED sorted set (r16,
        // functions.PackedSet) instead of the raw array<string>: same
        // full-byte identity (no hashing), ~2-4× fewer bytes through the
        // two merge-join sorters, and the per-pair intersection is a
        // linear memcmp merge with zero allocation instead of
        // array_intersect's per-row hash-set build. n_a is taken from
        // the array BEFORE packing (identical value: s is distinct).
        val shPack = shArr.select(col("doc_id"),
          graft.functions.native.pack_sorted_set(col("s")).as("p"),
          size(col("s")).cast("long").as("n"))
          // r17: pack ONCE — the two attach projections previously each
          // re-ran pack_sorted_set over every doc's array; DISK_ONLY per
          // the corpus-sized shared-frame policy. The projections below
          // are column-identical, but the exchanges do NOT unify
          // (verified in plans/r17 + shuffle-byte counts): the optimizer
          // pushes the query's final n_a >= 20 filter below the pa
          // projection only — which is the better outcome, since it
          // prunes the pa attach input at the scan instead of after the
          // join (the "length-floor before the attach" the r16 verdict
          // asked for, done by pushdown).
          .diskCheckpointLazy()
        cand
          // r17: build side flipped to the CANDIDATE PAIRS (two longs,
          // |pairs| rows) via shuffle_hash — fixed-width long rows are
          // the one shape the r6 starved drills cleared for rigid hash
          // builds — so the packed-blob side STREAMS as probe instead of
          // sorting through the merge sorter. The pb attach keeps merge:
          // its left side already carries pa blobs, and a blob-side hash
          // build is exactly the r6 fatality. Both shPack sides stay
          // broadcast-proof (build/merge pinned in the plan, never left
          // to LogicalRDD estimate stats). Gated by DriveSpill --starved
          // and the 10x exponent re-run (SCALE.md r17).
          .hint("shuffle_hash")
          .join(shPack.select(col("doc_id").as("doc_a"), col("p").as("pa"),
            col("n").as("n_a")), Seq("doc_a"))
          .join(shPack.select(col("doc_id").as("doc_b"), col("p").as("pb"),
            col("n").as("__n_b")).hint("merge"), Seq("doc_b"))
          .drop("__n_b")
          .withColumn("n_inter", graft.functions.native
            .packed_intersect_count(col("pa"), col("pb")).cast("long"))
          // 20-shingle floor and integer C >= 0.5 threshold: both engines
          // make the identical cut with no float compare
          .filter(col("n_a") >= 20 && col("n_inter") * 2 >= col("n_a"))
          .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_inter"),
            round(col("n_inter").cast("double") / col("n_a"), 6).as("containment"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH base AS (SELECT doc_id,
            substring($normSql, 1, 512) AS norm FROM documents),
          corpus AS (SELECT doc_id, norm FROM base
            UNION ALL
            SELECT -doc_id - 1, substring(norm, 11, 120) FROM base
            WHERE doc_id % 7 = 0),
          sh AS (SELECT doc_id,
            list_distinct(list_transform(range(length(norm)-7),
              i -> substring(norm, i+1, 8))) AS s
          FROM corpus WHERE length(norm) >= 8),
          idx AS (SELECT doc_id AS doc_b, unnest(s) AS w FROM sh),
          df AS (SELECT w, count(*) AS df FROM idx GROUP BY 1),
          sig AS (SELECT doc_b AS doc_a, w FROM (
            SELECT i.doc_b, i.w,
              row_number() OVER (PARTITION BY i.doc_b ORDER BY df.df, i.w) AS rk
            FROM idx i JOIN df ON i.w = df.w) WHERE rk <= 2),
          cand AS (SELECT DISTINCT doc_a, doc_b
            FROM sig JOIN idx USING (w) WHERE doc_a <> doc_b),
          j AS (SELECT doc_a, doc_b,
              CAST(len(sa.s) AS BIGINT) AS n_a,
              CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS n_inter
            FROM cand
            JOIN sh sa ON sa.doc_id = cand.doc_a
            JOIN sh sb ON sb.doc_id = cand.doc_b)
        SELECT doc_a, doc_b, n_a, n_inter,
          round(CAST(n_inter AS DOUBLE) / n_a, 6) AS containment
        FROM j WHERE n_a >= 20 AND n_inter * 2 >= n_a
        ORDER BY doc_a, doc_b""")),
    "pii_audit" -> Q(
      // PII exposure audit (X8b): per-language counts of email / URL /
      // long-digit-run matches — the governance report that decides
      // whether a source needs scrubbing before release. Shares the exact
      // regex family with text_clean ([[urlRe]]/[[emailRe]]/[[numRe]]),
      // and stresses a deterministic THIRD of the corpus (doc_id % 3 == 0)
      // with the dirty prefix so flagged/unflagged both occur. Stateless
      // per-row extraction + ONE map-side-combinable |langs|-row
      // aggregate — no join, no window, one shuffle at any corpus size.
      (s, d) => {
        val perDoc = docs(s, d)
          .withColumn("raw",
            when(col("doc_id") % 3 === 0,
              concat(lit(dirtyPrefix), expr("substring(text, 1, 60)")))
            .otherwise(expr("substring(text, 1, 60)")))
          .select(col("lang"),
            size(regexp_extract_all(col("raw"), lit(emailRe), lit(0)))
              .cast("long").as("e"),
            size(regexp_extract_all(col("raw"), lit(urlRe), lit(0)))
              .cast("long").as("u"),
            size(regexp_extract_all(col("raw"), lit(numRe), lit(0)))
              .cast("long").as("m"))
        perDoc.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("e") + col("u") + col("m") > 0, 1L).otherwise(0L))
              .as("docs_flagged"),
            sum(col("e")).as("n_email"),
            sum(col("u")).as("n_url"),
            sum(col("m")).as("n_num"))
          .orderBy("lang")
      },
      Some(s"""WITH t AS (SELECT lang, CASE WHEN doc_id % 3 = 0
            THEN '$dirtyPrefix' || substring(text, 1, 60)
            ELSE substring(text, 1, 60) END AS raw FROM documents),
          c AS (SELECT lang,
            CAST(len(regexp_extract_all(raw, '$emailRe')) AS BIGINT) AS e,
            CAST(len(regexp_extract_all(raw, '$urlRe')) AS BIGINT) AS u,
            CAST(len(regexp_extract_all(raw, '$numRe')) AS BIGINT) AS m
          FROM t)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN e + u + m > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS docs_flagged,
          CAST(sum(e) AS BIGINT) AS n_email,
          CAST(sum(u) AS BIGINT) AS n_url,
          CAST(sum(m) AS BIGINT) AS n_num
        FROM c GROUP BY lang ORDER BY lang""")),
    "pii_redact" -> Q(
      // PII redaction transform (X8c) — pii_audit's companion: the audit
      // DECIDES whether a source needs scrubbing, this op PRODUCES the
      // scrubbed corpus (masked text + per-doc counts, the shape a
      // release pipeline writes back). Same regex family and dirty-third
      // stress as the audit; masks apply in a fixed order (URL → email →
      // long-digit-run) so a digit inside a URL is consumed by the URL
      // mask on both engines, and counts are extracted from the RAW text
      // BEFORE masking (replacement-order-independent). Stateless
      // per-row regex work — no join, no aggregate, no shuffle beyond
      // the determinism sort; trivially row-parallel at any corpus size.
      (s, d) => {
        val raw = when(col("doc_id") % 3 === 0,
            concat(lit(dirtyPrefix), expr("substring(text, 1, 60)")))
          .otherwise(expr("substring(text, 1, 60)"))
        docs(s, d)
          .withColumn("raw", raw)
          .select(col("doc_id"),
            size(regexp_extract_all(col("raw"), lit(emailRe), lit(0)))
              .cast("long").as("n_email"),
            size(regexp_extract_all(col("raw"), lit(urlRe), lit(0)))
              .cast("long").as("n_url"),
            size(regexp_extract_all(col("raw"), lit(numRe), lit(0)))
              .cast("long").as("n_num"),
            regexp_replace(regexp_replace(regexp_replace(col("raw"),
              urlRe, "<URL>"), emailRe, "<EMAIL>"), numRe, "<NUM>")
              .as("redacted"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0
            THEN '$dirtyPrefix' || substring(text, 1, 60)
            ELSE substring(text, 1, 60) END AS raw FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(raw, '$emailRe')) AS BIGINT) AS n_email,
          CAST(len(regexp_extract_all(raw, '$urlRe')) AS BIGINT) AS n_url,
          CAST(len(regexp_extract_all(raw, '$numRe')) AS BIGINT) AS n_num,
          regexp_replace(regexp_replace(regexp_replace(raw,
            '$urlRe', '<URL>', 'g'), '$emailRe', '<EMAIL>', 'g'),
            '$numRe', '<NUM>', 'g') AS redacted
        FROM t ORDER BY doc_id""")),
    "kappa_agreement" -> Q(
      // Cohen's kappa (X91): chance-corrected agreement between the
      // DECLARED language label and the X4b language-ID vote — the
      // inter-annotator-agreement readout for "how much do my labeler and
      // my heuristic actually agree". Shares [[langidFrame]]/[[langidCtes]]
      // with text_langid, so the rater rule cannot fork. Every margin is
      // an exact integer (N, diagonal, per-label row/col counts);
      // κ = (N·agree − Σ row_l·col_l) / (N² − Σ row_l·col_l) closes with
      // ONE division of exact longs (N² at sf0.1 ≈ 10⁸ ≪ 2⁵³), rounded
      // to 6; the all-one-class degenerate case (N² = Σ) guards to 0.
      // Shapes: ONE doc-grain scan collapses to the ≤|langs|²-row
      // confusion frame (localCheckpointed — its four margin consumers
      // would each re-run the corpus vote otherwise); every margin
      // derives from that tiny frame.
      (s, d) => {
        // smallCheckpointLazy (Ckpt helper), not a raw eager
        // localCheckpoint: registers the ≤|langs|²-row frame with the
        // broadcast audit and keeps CONSTRUCTION job-free (an eager
        // checkpoint here ran the corpus vote during plan-only drives)
        val conf = langidFrame(s, d)
          .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("cnt"))
          .smallCheckpointLazy()
        // empty-input guard (the gini_spend class): Spark's grand
        // aggregate over an empty confusion frame yields NULL sums where
        // the oracle's count(*) yields 0 — coalesce every margin to 0 on
        // BOTH sides so the single output row is (0, 0, 0, 0.0) for an
        // empty corpus (the n² = pe_num degenerate guard then fires).
        val t = conf.agg(coalesce(sum(col("cnt")), lit(0L)).as("n"),
          coalesce(sum(when(col("lang") === col("pred"), col("cnt"))
            .otherwise(0L)), lit(0L)).as("n_agree"))
        val r = conf.groupBy(col("lang").as("lbl")).agg(sum(col("cnt")).as("rc"))
        val c = conf.groupBy(col("pred").as("lbl")).agg(sum(col("cnt")).as("cc"))
        val pe = r.join(c, Seq("lbl"), "full_outer")
          .agg(coalesce(
            sum(coalesce(col("rc"), lit(0L)) * coalesce(col("cc"), lit(0L))),
            lit(0L)).as("pe_num"))
        t.crossJoin(broadcast(pe))
          .select(col("n"), col("n_agree"), col("pe_num"),
            when(col("n") * col("n") === col("pe_num"), lit(0.0))
              .otherwise(round(
                (col("n") * col("n_agree") - col("pe_num")).cast("double") /
                (col("n") * col("n") - col("pe_num")).cast("double"), 6))
              .as("kappa_r"))
      },
      Some(s"""WITH $langidCtes,
          t AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(COALESCE(sum(CASE WHEN lang = pred THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_agree
          FROM lid_pred),
          r AS (SELECT lang AS lbl, count(*) AS rc FROM lid_pred GROUP BY 1),
          c AS (SELECT pred AS lbl, count(*) AS cc FROM lid_pred GROUP BY 1),
          m AS (SELECT CAST(COALESCE(
              sum(COALESCE(rc, 0) * COALESCE(cc, 0)), 0) AS BIGINT) AS pe_num
            FROM r FULL OUTER JOIN c USING (lbl))
        SELECT n, n_agree, pe_num,
          CASE WHEN n * n = pe_num THEN 0.0 ELSE
            round(CAST(n * n_agree - pe_num AS DOUBLE) /
              CAST(n * n - pe_num AS DOUBLE), 6) END AS kappa_r
        FROM t, m""")),
    "rfm_scores" -> Q(
      // RFM segmentation (X92): per-user Recency / Frequency / Monetary
      // quintile scores — the classic CRM cut, all-integer. Recency is
      // days from the user's last event to the global max day; frequency
      // is the event count; monetary is exact cents. Each score is
      // 5 − (5·(rank−1)) div n over the GLOBAL rank by (metric, user_id)
      // — the cume-based tile (deterministic, engine-portable; ntile's
      // remainder rule is NOT mirrored, the formula is, on both sides).
      // Global ranks come from the shared [[bandedRank]] helper (the
      // gini_spend two-phase shape), one per metric: a band-partitioned
      // row_number + |bands|-row broadcast offsets — never a single-task
      // whole-population sort; bands are each metric's own equi-depth
      // quantile edges (see [[bandedRank]]).
      (s, d) => {
        val u = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            cents(col("value")).as("c"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), sum("c").as("cents"),
            max("day").as("last_day"))
        val g = u.agg(max("last_day").as("gmax"), count(lit(1)).as("nu"))
        val m = u.crossJoin(broadcast(g))
          .withColumn("r_days", datediff(col("gmax"), col("last_day")).cast("long"))
          .select("user_id", "r_days", "n_events", "cents", "nu")
        // one shared bandedRanks pass (r16): the chained single-key form
        // checkpointed the same user-grain frame three times and ran
        // three edges aggregates — see Analytics.bandedRanks
        val ranked = Analytics.bandedRanks(m, Seq(
          ("r_days", "user_id", true, "rr"),
          ("n_events", "user_id", false, "rf"),
          ("cents", "user_id", false, "rm")))
        ranked
          .withColumn("r_s", (lit(5) - expr("(5*(rr-1)) div nu")).cast("int"))
          .withColumn("f_s", (lit(5) - expr("(5*(rf-1)) div nu")).cast("int"))
          .withColumn("m_s", (lit(5) - expr("(5*(rm-1)) div nu")).cast("int"))
          .withColumn("rfm",
            (col("r_s") * 100 + col("f_s") * 10 + col("m_s")).cast("int"))
          .select("user_id", "r_days", "n_events", "cents",
            "r_s", "f_s", "m_s", "rfm")
          .orderBy("user_id")
      },
      Some("""WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
            CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
              AS cents,
            max(CAST(ts AS DATE)) AS last_day
          FROM events GROUP BY 1),
          g AS (SELECT max(last_day) AS gmax,
            CAST(count(*) AS BIGINT) AS nu FROM u),
          m AS (SELECT user_id, n_events, cents,
            CAST(date_diff('day', last_day, gmax) AS BIGINT) AS r_days, nu
          FROM u, g),
          rk AS (SELECT *,
            CAST(row_number() OVER (ORDER BY r_days, user_id) AS BIGINT) AS rr,
            CAST(row_number() OVER (ORDER BY n_events DESC, user_id)
              AS BIGINT) AS rf,
            CAST(row_number() OVER (ORDER BY cents DESC, user_id)
              AS BIGINT) AS rm
          FROM m)
        SELECT user_id, r_days, n_events, cents,
          CAST(5 - (5*(rr-1)) // nu AS INT) AS r_s,
          CAST(5 - (5*(rf-1)) // nu AS INT) AS f_s,
          CAST(5 - (5*(rm-1)) // nu AS INT) AS m_s,
          CAST((5 - (5*(rr-1)) // nu) * 100 + (5 - (5*(rf-1)) // nu) * 10
            + (5 - (5*(rm-1)) // nu) AS INT) AS rfm
        FROM rk ORDER BY user_id""")),
    "woe_bins" -> Q(
      // Weight-of-evidence binning (X93): document-length deciles scored
      // against the X17 quality-gate label — "which length bands survive
      // curation", the feature-screening readout (WOE/IV) done the
      // credit-scoring way. Shares [[gateFrame]]/[[gateCtes]] so the
      // label rule cannot fork. Deciles come from the cume-tile formula
      // over a GLOBAL (n_chars, doc_id) rank built with the banded
      // two-phase window (200-char bands) — never a single-task corpus
      // sort. Counts are exact integers; the closing WOE/IV floats apply
      // Laplace smoothing (+0.5 per class, +0.5·10 per total — no
      // ln(0)/÷0 anywhere, ANSI-safe) in the IDENTICAL IEEE op order on
      // both engines, rounded to 6.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val p = gateFrame(s, d).select(col("doc_id"), col("n_chars"), col("pass"))
        val banded = p.withColumn("band", expr("n_chars div 200"))
        val wIn = Window.partitionBy("band").orderBy(col("n_chars"), col("doc_id"))
        // ONE band-grain aggregate feeds BOTH the rank offsets and the
        // global totals (localCheckpointed |bands|-row frame) — a
        // separate corpus-grain totals aggregate would re-run the gate's
        // text pipeline a third full time
        // smallCheckpointLazy, not a raw localCheckpoint: the Ckpt helper
        // REGISTERS the |bands|-row frame as a small checkpoint (the
        // tightened broadcast audit exempts by registered RDD id, not by
        // marker column) and stays job-free under planOnly dry runs
        val bagg = banded.groupBy("band")
          .agg(count(lit(1)).as("bn"), sum(col("pass")).cast("long").as("bg"))
          .smallCheckpointLazy()
        val offs = bagg
          .withColumn("off", coalesce(sum("bn").over(
            Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .select("band", "off")
        val nt = bagg.agg(sum(col("bn")).as("n"), sum(col("bg")).as("g"))
        val gr = (col("n_good") + 0.5) / (col("g_tot") + 5.0)
        val br = (col("n_bad") + 0.5) / (col("b_tot") + 5.0)
        // joinOnZone, not a bare broadcast join: the checkpointed offs
        // frame's HashAggregate lineage is severed, so the (now
        // AQE-descending) broadcast audit would flag a raw broadcast of
        // it — the |bands|-row attach is exactly the class joinOnZone
        // marks as legitimate (and it keeps the long-key fast path)
        Extracts.joinOnZone(
            banded.withColumn("wi", row_number().over(wIn).cast("long")),
            offs, "band")
          .crossJoin(broadcast(nt))
          .withColumn("bin", (expr("(10*(off+wi-1)) div n") + 1).cast("int"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("pass")).cast("long").as("n_good"),
            min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"),
            max(col("n")).as("n_tot"), max(col("g")).as("g_tot"))
          .withColumn("n_bad", col("n_docs") - col("n_good"))
          .withColumn("b_tot", col("n_tot") - col("g_tot"))
          .select(col("bin"), col("n_docs"), col("n_good"), col("n_bad"),
            col("lo"), col("hi"),
            round(log(gr / br), 6).as("woe_r"),
            round((gr - br) * log(gr / br), 6).as("iv_term_r"))
          .orderBy("bin")
      },
      Some(s"""WITH $gateCtes,
          p AS (SELECT doc_id, n_chars, pass FROM qg_pass),
          nt AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(pass) AS BIGINT) AS g FROM p),
          r AS (SELECT n_chars, pass,
            CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rk
          FROM p),
          b AS (SELECT n_chars, pass, n, g,
            CAST((10*(rk-1)) // n + 1 AS INT) AS bin FROM r, nt),
          a AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(pass) AS BIGINT) AS n_good,
            CAST(min(n_chars) AS BIGINT) AS lo, CAST(max(n_chars) AS BIGINT) AS hi,
            CAST(max(n) AS BIGINT) AS n_tot, CAST(max(g) AS BIGINT) AS g_tot
          FROM b GROUP BY 1)
        SELECT bin, n_docs, n_good, n_docs - n_good AS n_bad, lo, hi,
          round(ln(((n_good + 0.5)/(g_tot + 5.0))
            / ((n_docs - n_good + 0.5)/(n_tot - g_tot + 5.0))), 6) AS woe_r,
          round((((n_good + 0.5)/(g_tot + 5.0))
              - ((n_docs - n_good + 0.5)/(n_tot - g_tot + 5.0)))
            * ln(((n_good + 0.5)/(g_tot + 5.0))
              / ((n_docs - n_good + 0.5)/(n_tot - g_tot + 5.0))), 6) AS iv_term_r
        FROM a ORDER BY bin""")),
    "user_entropy" -> Q(
      // Behavioral diversity (X94): Shannon entropy of each user's
      // event-type mix — the engagement-breadth feature (0 = one-note
      // user, ln(k) = uniform over k types). Two map-side-combinable
      // aggregates: (user, type) counts collapse the event stream, then
      // a |users|-row rollup closes the entropy from exact integer
      // counts; ≤ |types| float terms per user rounded at 6 (the
      // text_entropy precedent). `+ 0.0` normalizes the -0.0 a
      // single-type user's -sum(0) yields (a -0.0/-0.0 hash split
      // between engines otherwise).
      (s, d) => {
        val ct = Tables.events(s, d)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("c"))
        val tot = ct.groupBy(col("user_id"))
          .agg(sum(col("c")).as("n"), count(lit(1)).as("k"))
        ct.join(tot, Seq("user_id"))
          .groupBy(col("user_id"))
          .agg(max(col("n")).as("n_events"), max(col("k")).as("n_types"),
            round(-sum((col("c").cast("double") / col("n"))
              * log(col("c").cast("double") / col("n"))) + 0.0, 6).as("entropy_r"))
          .orderBy("user_id")
      },
      Some("""WITH ct AS (SELECT user_id, event_type,
            CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
          tot AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
            CAST(count(*) AS BIGINT) AS k FROM ct GROUP BY 1)
        SELECT ct.user_id, n AS n_events, k AS n_types,
          round(-sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)) + 0.0, 6)
            AS entropy_r
        FROM ct JOIN tot ON ct.user_id = tot.user_id
        GROUP BY ct.user_id, n, k ORDER BY ct.user_id""")),
    "stream_upsert" -> Q(
      // T11 batch path: the newest event per user IS the table the
      // streaming upsert sink converges to — [[Streamy.latestPerKey]] is
      // the SHARED reduction (StreamySpec pins stream ≡ batch on a real
      // AvailableNow run, including duplicate delivery and a full-stream
      // replay, both no-ops by state convergence). One map-side
      // combinable max-struct per user; no window, no join.
      (s, d) => Streamy.latestPerKey(
          Tables.events(s, d).select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), cents(col("value")).as("cents")))
        .orderBy("user_id"),
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
            CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
          r AS (SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY us DESC, event_id DESC, cents DESC) AS rn FROM e)
        SELECT user_id, us, event_id, cents FROM r WHERE rn = 1
        ORDER BY user_id""")))

  val all: Seq[(String, Q)] =
    streamQueries ++ dedupQueries ++ simQueries ++ textQueries ++
      pipelineQueries ++ curationQueries ++ analyticsQueries ++
      governanceQueries
}
