package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Ckpt._

/** [EXT] LLM-training-data pipeline operators (SURVEY.md §2.11): exact and
  * near-duplicate detection, similarity search, and text analysis. All pure
  * `Column` builders over built-in codegen'd functions — no UDFs — so every
  * operator stays inside whole-stage codegen and scales linearly with
  * executors.
  *
  * Scale notes:
  *  - Exact dedup is one hash-shuffle on the content digest.
  *  - MinHash/LSH dedup shuffles once on band keys; candidate-pair output is
  *    bounded by bucket sizes, never the full N² pair space.
  *  - Brute-force cosine top-k is O(|queries|·N) — the baseline; the IVF
  *    variant probes one coarse cell (precomputed assignment column),
  *    cutting candidates by the cell count, the standard ANN scale path.
  */
object LlmOps {

  /** Whitespace/case normalization applied before hashing or shingling. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Repartition width for explode-heavy stages: spread a few fat source
    * partitions across cores, but never wider than 8× the source partition
    * count — at small inputs a full-`defaultParallelism` shuffle costs more
    * in task overhead than the explode saves, and at cluster scale the
    * source is already wide so the cap is a no-op. */
  def spreadWidth(df: DataFrame): Int = {
    val src = math.max(1, df.rdd.getNumPartitions)
    math.max(1, math.min(df.sparkSession.sparkContext.defaultParallelism, src * 8))
  }

  /** Content digest for exact dedup (X1). */
  def contentHash(c: Column): Column = sha2(normText(c), 256)

  /** Exact dedup: keep the smallest id per digest, count copies. */
  def dedupExact(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.withColumn("h", contentHash(col(text)))
      .groupBy(col("h"))
      .agg(min(col(id)).as(id), count(lit(1)).as("n_copies"))

  /** Word bigram shingles of a normalized text column — the native
    * O(len) byte-slice walk ([[graft.functions.WordNgramsExpr]]).
    * The r15 SQL-lambda form (`transform(sequence(...), i ->
    * concat(split($textCol,' ')[i], ' ', split(...)[i+1]))`) re-split
    * the whole text per element in interpreted mode — O(len²) per doc,
    * and the dominant cost of the decontaminate/minhash family
    * (measured ~9 s of executor time in `decontaminate` alone at
    * sf0.1). Output identical including the null/one-word → empty-array
    * CASE arm (WordNgramsSpec pins parity against the lambda form). */
  def bigramShingles(textCol: String): Column =
    graft.functions.native.word_ngrams(col(textCol), 2)

  /** Per-permutation shingle hash: 4 permutations share one md5 call via
    * non-overlapping 8-hex-char windows (md5 mixes uniformly, so disjoint
    * windows act as independent hash functions); every 4th permutation adds
    * a salt prefix for a fresh digest. 8-hex strings min-compare portably in
    * any engine. */
  def permHash(x: Column, perm: Int): Column = {
    val salt = "|" * (perm / 4)
    val digest = if (salt.isEmpty) md5(x) else md5(concat(lit(salt), x))
    substring(digest, 1 + 8 * (perm % 4), 8)
  }

  /** One MinHash signature over a shingle array column. */
  def minhashSig(shingles: Column, perm: Int): Column =
    array_min(transform(shingles, x => permHash(x, perm)))

  /** Full MinHash signature table `(id, s0..s{perms-1})`. Shingles are
    * exploded so the md5 + min run through codegen'd hash aggregation
    * (higher-order array lambdas are interpreted in Spark — evaluating
    * [[minhashSig]] per permutation costs ~perms× the codegen path at
    * scale), and each md5 digest feeds 4 permutations. Single shuffle. */
  def minhashSignatures(docs: DataFrame, id: String, textCol: String,
      perms: Int = 8): DataFrame = {
    // documents often arrive as few fat partitions (one parquet row group);
    // the explode multiplies rows ~50x, so spread BEFORE the hash work —
    // a cheap shuffle of raw docs buys full-core parallelism downstream
    val spread = docs.repartition(spreadWidth(docs))
    val shingleRows = spread
      .withColumn("__norm", normText(col(textCol)))
      .select(col(id), explode(bigramShingles("__norm")).as("__x"))
    val aggs = (0 until perms).map(k => min(permHash(col("__x"), k)).as(s"s$k"))
    shingleRows.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band key over a contiguous signature slice. */
  def bandKey(sigs: Seq[Column]): Column = md5(concat(sigs: _*))

  /** Dot product of two `array<double>` columns — the native codegen'd
    * [[graft.functions.DotProduct]] expression (sequential primitive loop:
    * deterministic float association order, no intermediate array, stays
    * inside whole-stage codegen). */
  def dot(x: Column, y: Column): Column = graft.functions.native.dot_product(x, y)

  /** Interpreted reference formulation (kept for differential testing). */
  def dotHof(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm — precompute this once per vector before any pairwise
    * stage: array lambdas are interpreted, and recomputing both norms per
    * candidate pair triples the dominant cost of brute-force search. */
  def norm(x: Column): Column = sqrt(dot(x, x))

  /** Cosine similarity between two `array<double>` columns. A zero-norm
    * vector scores 0 against everything: the raw division gives NaN, and
    * Spark orders NaN ABOVE every real double, so one all-zero embedding
    * would otherwise outrank every genuine match in a descending top-k. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** LSH band key over a full signature table: candidate pairs are ids
    * sharing any complete band. Returns distinct `(doc_a, doc_b)` with
    * `doc_a < doc_b`. */
  def minhashPairs(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sigs = minhashSignatures(docs, id, textCol, 8)
    val bands = sigs.select(col(id), explode(array(
      struct(lit(0).as("band"), bandKey(Seq(col("s0"), col("s1"), col("s2"), col("s3"))).as("bk")),
      struct(lit(1).as("band"), bandKey(Seq(col("s4"), col("s5"), col("s6"), col("s7"))).as("bk")))).as("b"))
      .select(col(id), col("b.band"), col("b.bk"))
      // tiny (2 rows/doc); materialize once so the self-join doesn't run the
      // signature pipeline twice. localCheckpoint (not cache): checkpointed
      // storage is released by the ContextCleaner when unreachable, whereas
      // CacheManager entries leak per invocation for the session lifetime
      .diskCheckpoint()
    val a = bands.toDF("doc_a", "band", "bk")
    val b = bands.toDF("doc_b", "band", "bk")
    a.join(b, Seq("band", "bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** Signature-grouped MinHash table: every shingled doc with its full
    * 8-permutation signature and `gid` = the smallest doc id sharing that
    * EXACT signature. Docs with identical signatures are AUTOMORPHIC in
    * the LSH candidate-pair graph — band keys are functions of the
    * signature alone, so same signature ⇒ same buckets ⇒ pairwise
    * adjacent AND adjacent to exactly the same outside neighbors. That
    * symmetry is what the quotient consumers (CC star edges, group-grain
    * degree/triangle/PageRank) exploit: a boilerplate megacluster of k
    * identical docs collapses to ONE group of multiplicity k instead of a
    * k-clique of C(k,2) materialized pairs — the difference between a
    * linear and a quadratic duplicate-graph pass on template-heavy
    * corpora. One window shuffle on the signature; docs with no shingles
    * (0/1-word texts) have no signature row and are handled as isolated
    * singletons by each consumer. */
  def minhashGrouped(docs: DataFrame, id: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sigCols = (0 until 8).map(k => col(s"s$k"))
    minhashSignatures(docs, id, textCol, 8)
      .withColumn("gid", min(col(id)).over(Window.partitionBy(sigCols: _*)))
  }

  /** Signature groups `(gid, m, s0..s7)` from a [[minhashGrouped]] frame:
    * one row per DISTINCT signature, `m` = member count. */
  def signatureGroups(grouped: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("m") +:
      (0 until 8).map(k => min(col(s"s$k")).as(s"s$k"))
    grouped.groupBy(col("gid")).agg(aggs.head, aggs.tail: _*)
  }

  /** Quotient edges `(ga, gb)`, `ga < gb`: signature groups sharing any
    * complete LSH band — the image of [[minhashPairs]]' candidate graph
    * under the signature quotient. The self-join's bucket sizes are
    * bounded by DISTINCT signatures per band key (the honest LSH
    * candidate cost), never by duplicate multiplicity. */
  def quotientEdges(groups: DataFrame): DataFrame = {
    val bands = groups.select(col("gid"), explode(array(
        struct(lit(0).as("band"), bandKey(Seq(col("s0"), col("s1"), col("s2"), col("s3"))).as("bk")),
        struct(lit(1).as("band"), bandKey(Seq(col("s4"), col("s5"), col("s6"), col("s7"))).as("bk")))).as("b"))
      .select(col("gid"), col("b.band"), col("b.bk"))
      .diskCheckpointLazy()
    val a = bands.toDF("ga", "band", "bk")
    val b = bands.toDF("gb", "band", "bk")
    // checkpointed frame ⇒ estimate-only stats: hint so no planner ever
    // broadcasts a corpus-proportional band table (SCALE.md lesson)
    a.join(b.hint("shuffle_hash"), Seq("band", "bk"))
      .filter(col("ga") < col("gb"))
      .select(col("ga"), col("gb")).distinct()
  }

  /** Connected components over an undirected edge list by iterative
    * min-label propagation to fixpoint: every node ends labelled with the
    * smallest id reachable from it — the canonical "keeper" of its
    * duplicate cluster. Each round combines ONE edge-hop (min over
    * neighbours' labels) with ONE pointer jump (label := label of label —
    * the shortcutting step of Shiloach-Vishkin-style CC), so the distance
    * a label still has to travel HALVES per round on top of the hop:
    * convergence is O(log diameter) rounds, not O(diameter). LSH
    * near-cliques still settle in 2-3 rounds as before, and a CHAIN-shaped
    * dup graph (paragraph-overlap chains — the adversarial case for pure
    * propagation) needs ~log₂(len) rounds: LlmOpsSpec pins a 100-link
    * chain inside a 12-round budget. Lineage is truncated per round so
    * plans stay flat at scale. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    // materialize the edge list once — the propagation loop joins it every
    // round, and recomputing an LSH pair pipeline per round would dominate.
    // Width is capped like [[spreadWidth]]: at small inputs a 32-way loop
    // body is pure task overhead, at scale the input is already wide.
    val w = spreadWidth(edges)
    val sym = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b"), col("doc_a")))
      .repartition(w)
      .diskCheckpoint()
    // Only edge ENDPOINTS can ever move off their self-label, so the
    // propagation loop runs over them alone — on a healthy corpus that
    // is a small fraction of |nodes| (most docs/vectors appear in no
    // candidate pair), and every per-round join then scales with the
    // duplicate-involved subgraph rather than the whole corpus. The
    // isolated nodes rejoin as their own reps after the loop — output
    // identical to propagating over the full node set (an isolated
    // node's min reachable label is itself, round after round).
    val endpoints = sym.select(col("src").as("node")).distinct()
      .repartition(w).diskCheckpoint()
    var labels = nodes
      .join(endpoints.hint("shuffle_hash"), Seq("node"), "left_semi")
      .select(col("node"), col("node").as("rep"))
      .repartition(w).diskCheckpoint()
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      // ONE Spark job per round: hop, jump, and the changed-flag are all
      // computed in the same plan (no second pass over the old labels),
      // the eager localCheckpoint is the round's only full computation,
      // and the convergence probe below scans the checkpointed blocks —
      // not the lineage
      // every frame in the loop (sym, labels, hop) is graph-proportional
      // with checkpoint-ESTIMATE stats — hint shuffle_hash so no round
      // ever broadcasts a |nodes|/|edges|-sized side (the SCALE.md
      // LogicalRDD-stats lesson; a broadcast here is per-ROUND, so the
      // cliff would multiply by the iteration count)
      val prop = sym.join(labels.hint("shuffle_hash"),
          sym("dst") === labels("node"))
        .groupBy(col("src")).agg(min(col("rep")).as("nrep"))
      val hop = labels.join(prop.hint("shuffle_hash"),
          labels("node") === prop("src"), "left")
        .select(col("node"), col("rep").as("prev"),
          least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep1"))
      // pointer jump: rep ← rep1(rep1(node)). Labels are node ids, so the
      // lookup is a self-join against the hopped frame; a label already at
      // its component min maps to itself and the coalesce is a no-op. This
      // halves the remaining min-label distance every round — the step
      // that turns a 100-link chain from 100 rounds into ~7. The hopped
      // subtree is evaluated twice inside the round's one job (both sides
      // of the self-join); that doubles per-round join work in exchange
      // for exponentially fewer rounds — the right trade at every scale,
      // since each round's fixed cost (job launch + checkpoint) dominates
      // exactly when components are small and data-cost parity holds when
      // they are not.
      val jump = hop.select(col("node").as("jn"), col("rep1").as("jrep"))
      val next = hop.join(jump.hint("shuffle_hash"), hop("rep1") === jump("jn"), "left")
        .select(col("node"),
          least(col("rep1"), coalesce(col("jrep"), col("rep1"))).as("rep"),
          col("prev"))
        .withColumn("changed", col("rep") < col("prev"))
        .diskCheckpoint()
      converged = next.filter(col("changed")).isEmpty
      labels = next.select(col("node"), col("rep"))
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(component min-label distance exceeds the bound); raise maxIter")
    labels.union(
      nodes.join(endpoints.hint("shuffle_hash"), Seq("node"), "left_anti")
        .select(col("node"), col("node").as("rep")))
  }

  /** IVF cell budget for an N-vector corpus: k ≈ √N/2 clamped to [8, 1024].
    * √N balances assignment cost (N·k·d) against per-cell candidate cost
    * (|Q|·nprobe·N/k·d); the /2 and the 1024 cap price the single-node
    * constants — the KMeans fit sees ~50·k sampled points and the
    * centroid matrix travels as plan literals (1024×dim doubles ≈ 0.5 MB,
    * still free to broadcast; past that the right structure is a
    * two-level quantizer, not more flat cells). Registered fixture-scale
    * queries pin k=8 explicitly so their oracles are stable; this is the
    * default a corpus-scale caller should use (measured through three
    * decades in SCALE.md's `--x1000sim` tier). */
  def ivfCells(n: Long): Int =
    math.max(8, math.min(1024, math.round(math.sqrt(n.toDouble) / 2).toInt))

  /** Probe budget companion. Two regimes, both clamped to [1, k]:
    *  - k ≥ 256: ~3% of cells (k/32), floor 16 — at k=1024 a 32-cell
    *    probe keeps per-query candidates ≈ 32·N/k, and the measured
    *    `--x1000sim` recall@5 at that point is ≥ 0.95.
    *  - k < 256 (small corpora, where ivfCells = √N/2 gives few cells):
    *    ~6% of cells (k/16), floor 8. The flat k/32-floor-4 rule gave
    *    only 4 probes at k=158 (N=100k) and measured recall@5 0.69 —
    *    barely over the 0.6 floor while walsh at the same scale reached
    *    0.88. Probe FRACTION is the recall dial (IvfSpec's measured
    *    curve), and at small k the fixed fraction is cheap: doubling
    *    probes at N=100k costs ~2× of an already-sub-brute search. */
  def ivfProbes(k: Int): Int = {
    // the 16-floor on the large-k branch makes the curve monotone across
    // the regime boundary (k=255 → 15, k=256 → 16)
    val p = if (k < 256) math.max(8, k / 16) else math.max(16, k / 32)
    math.min(k, p)
  }

  /** IVF coarse quantization (X3 scale path): KMeans centroids as inverted-
    * file cells. Returns (assignments with a `cell` column, centroid table).
    * At scale the assignment is a one-pass map (broadcast centroids); search
    * probes `nprobe` cells instead of the full corpus — the standard ANN
    * recall/cost dial. */
  def ivfAssign(emb: DataFrame, vCol: String = "v", k: Int = 8,
      seed: Long = 42, fitFraction: Double = 0.1): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = emb.withColumn("__feat", array_to_vector(col(vCol)))
    // The fit sees only a `fitFraction` sample: every KMeans iteration is
    // an MLlib job over its input, and at corpus scale the standard move
    // is fitting the quantizer on a sample and assigning everything in
    // one broadcast pass — so iteration count and init quality are priced
    // against the SAMPLE, not the corpus. That makes the better quantizer
    // affordable: k-means|| init + enough iterations to settle (a poor
    // random init measurably costs recall at fixed nprobe — the sf0.01
    // gate in IvfSpec caught exactly that at 0.44 vs the 0.6 floor). The
    // sample is seeded (deterministic); below 16·k sampled points the
    // centroids get thin enough to cost recall, so a small corpus falls
    // back to a full fit — sampling only pays off at the scale where it
    // matters anyway.
    val sampled = feat.sample(withReplacement = false, fitFraction, seed)
    // the probe cap must exceed the threshold it feeds, or large k could
    // never pass the gate and every fit would silently run on the corpus
    val probeCap = math.max(8192, k * 16)
    val fitOn = if (fitFraction >= 1.0) feat
      else sampled.limit(probeCap).count() match {
        case n if n >= k * 16 => sampled
        case _ => feat // fixture-scale corpus: sample too thin, fit on all
      }
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(20)
      .setInitMode("k-means||")
      .setFeaturesCol("__feat").setPredictionCol("cell").fit(fitOn)
    // Assignment is NOT model.transform: MLlib's fastSquaredDistance takes
    // a precision-dependent |a|²+|b|²−2ab shortcut, which no other engine
    // can reproduce bit-for-bit. Instead the k centroids embed as plan
    // LITERAL matrix and the nearest cell is ONE native codegen'd argmin
    // pass per row ([[graft.functions.NearestCentroid]]) — identical
    // semantics to the HOF fold it replaced (nearest centroid by
    // ROUNDED-to-6dp squared L2, ties to the lowest cell — the exact
    // arithmetic shape a DuckDB oracle replays from the dumped centroid
    // table; the walsh IVF row established cross-engine parity of this
    // form), but a primitive N·k·dim loop nest instead of an interpreted
    // per-(row,centroid) struct fold — the difference between k=8 and
    // the k ~ √N cell budget a 10M-vector corpus wants. Zero shuffle:
    // one projection over the scan, k×dim literal doubles travel with
    // the plan for free.
    val centMatrix = array(model.clusterCenters.map(c =>
      array(c.toArray.toIndexedSeq.map(lit): _*)).toSeq: _*)
    val assigned = emb.withColumn("cell",
      graft.functions.native.nearest_centroid(col(vCol), centMatrix))
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }.toDF("cell", "cvec")
    (assigned, centroids)
  }

  /** IVF top-k search: rank cells per query by L2 distance to centroid
    * (KMeans' metric), probe the best `nprobe`, brute-force cosine inside.
    * With `nprobe == k` this degrades exactly to brute force — the
    * correctness anchor the spec pins. */
  def ivfSearch(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
      topK: Int = 5, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cdist = queries.crossJoin(broadcast(centroids))
      // rounded like the assignment distance: cell ranking is then a pure
      // function of (qv, centroids) in arithmetic both engines share, so
      // an oracle can replay the probe set from the dumped centroid table
      .withColumn("__d",
        round(aggregate(zip_with(col("qv"), col("cvec"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x), 6))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("__d").asc, col("cell").asc)))
      .filter(col("__rn") <= nprobe)
      .select(col("qid"), col("qv"), col("qn"), col("cell"))
    cdist.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      // zero-norm guard: NaN orders above every real double in Spark, so
      // an all-zero vector would rank #1 for every query probing its cell
      .withColumn("cos_r", round(
        when(col("qn") * col("nrm") === 0, lit(0.0))
          .otherwise(dot(col("qv"), col("v")) / (col("qn") * col("nrm"))), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos_r").desc, col("vec_id").asc)))
      .filter(col("rn") <= topK)
      .select(col("qid"), col("rn"), col("vec_id").as("cand"), col("cos_r"))
  }

  /** Sign-hyperplane LSH cells for embedding near-dup banding: `bands`
    * bands of `bitsPerBand` Walsh sign bits each, as an array of
    * `struct(band, cell)` ready to explode into blocking keys. The bit
    * vector is ONE native codegen'd expression
    * ([[graft.functions.WalshSignBits]]) — one primitive loop nest per
    * vector instead of bands×bits interpreted HOF passes. */
  def signLshCells(v: Column, bands: Int = 3, bitsPerBand: Int = 2): Column = {
    val packed = graft.functions.native.walsh_sign_bits(v, bands * bitsPerBand)
    def bit(j: Int): Column = shiftright(packed, j).bitwiseAND(lit(1))
    array((0 until bands).map { k =>
      val cell = (0 until bitsPerBand)
        .map(b => bit(k * bitsPerBand + b) * lit(1 << (bitsPerBand - 1 - b)))
        .reduce(_ + _)
      struct(lit(k).as("band"), cell.as("cell"))
    }: _*)
  }

  /** Deterministic line explode shared by [[lineDedup]] and the
    * incremental line-dedup query: one row per `wordsPerLine`-word chunk
    * of the normalized text, positioned by `idx`. Bounded
    * ~len/wordsPerLine row amplification; empty docs yield no rows. */
  def lines(docs: DataFrame, wordsPerLine: Int = 12, id: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = lit(wordsPerLine)
    docs.repartition(spreadWidth(docs))
      .withColumn("__w", split(normText(col(textCol)), " "))
      .withColumn("__nl", ceil(size(col("__w")) / w.cast("double")).cast("int"))
      .withColumn("idx", explode(expr(
        "CASE WHEN __nl > 0 THEN sequence(0, __nl - 1) ELSE array() END")))
      .withColumn("line", array_join(slice(col("__w"), col("idx") * w + 1, w), " "))
      .select(col(id), col("idx"), col("line"))
  }

  /** Corpus-wide line-level exact dedup (X15, the C4 rule "discard any
    * line seen elsewhere in the corpus, keep the first occurrence"). The
    * synthetic corpus has no newlines, so a "line" is a deterministic
    * `wordsPerLine`-word chunk of the normalized text — the chunking is the
    * stand-in; the dedup machinery is the real thing. Returns one row per
    * doc: total/kept line counts plus the surviving text re-joined in
    * original order.
    *
    * Scale shape: explode to lines (bounded ~len/wordsPerLine row
    * amplification), ONE shuffle on the line content for the first-owner
    * window (partitioned by line — parallel, never global), one regroup on
    * the doc id. Nothing corpus-squared, no driver state. */
  def lineDedup(docs: DataFrame, wordsPerLine: Int = 12, id: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = this.lines(docs, wordsPerLine, id, textCol)
      // first occurrence in (doc, position) order owns the line; every
      // other occurrence corpus-wide (including a repeat INSIDE the same
      // doc) is dropped — exactly the C4 rule
      .withColumn("kept", row_number().over(
        Window.partitionBy(col("line")).orderBy(col(id), col("idx"))) === 1)
    lines.groupBy(col(id))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list drops the nulls `when` leaves on non-kept rows;
        // array_sort on struct(idx, line) restores document order
        array_join(transform(
          array_sort(collect_list(when(col("kept"), struct(col("idx"), col("line"))))),
          x => x.getField("line")), " ").as("kept_text"))
  }

  /** 16-bit SimHash of the word multiset of `textCol`: per bit j, sum +1/-1
    * over tokens by bit j of md5(token); sign → bit (X-family near-dup). */
  def simhash16(docs: DataFrame, id: String, textCol: String): DataFrame =
    simhashBits(docs, id, textCol, 16)

  /** Token-vote SimHash with `nBits` bits (≤ 60 keeps every value and
    * every band cell positive in a signed 64-bit long on BOTH engines —
    * bit 63 would flip DuckDB's BIGINT sign under `<<`). Bit j's vote
    * comes from bit (j mod 4) of md5 hex digit (j div 4) of each token —
    * the same engine-portable digit primitive as the 16-bit form, which
    * is this with nBits = 16. */
  def simhashBits(docs: DataFrame, id: String, textCol: String,
      nBits: Int): DataFrame = {
    require(nBits > 0 && nBits <= 60, s"nBits must be in (0, 60], got $nBits")
    // one native walk per document ([[graft.functions.SimhashVotesExpr]]):
    // one md5 per token feeding all nBits vote counters. The round-15
    // relational form exploded tokens × bits (~1000× row amplification,
    // with md5(w) re-evaluated per (token, bit) row — 60 digests per
    // token for the pairs query) through two aggregate shuffles; it
    // measured ~8 s of executor time at sf0.1 where this walk is
    // milliseconds, bit-identical (SimhashParitySpec pins the two forms
    // against each other). The spread keeps the per-doc hash work off a
    // single fat parquet partition; the null filter mirrors the old
    // explode dropping NULL-text docs (null norm → no token rows → no
    // group).
    docs.repartition(spreadWidth(docs))
      .select(col(id), graft.functions.native
        .simhash_votes(normText(col(textCol)), nBits).as("simhash"))
      .filter(col("simhash").isNotNull)
  }
}
