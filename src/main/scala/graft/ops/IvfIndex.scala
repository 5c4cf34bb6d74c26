package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Content-addressed IVF index cache — the ANN family's deployment shape
  * (round-13 verdict #1): the trained coarse quantizer (centroid table)
  * and the materialized cell assignment are keyed by the CORPUS CONTENT
  * fingerprint and reused across invocations, exactly like every other
  * unit of completed work in the engine (the reference's signature
  * memoization, SURVEY.md §4, `queue/request_tools.py:37-45,383`).
  *
  * Why this matters at scale: `--simsweep` (SCALE.md) decomposed the 10M-
  * vector end-to-end IVF cost as ~104 s one-off fit+assign vs 7–16 s
  * MARGINAL search per 40-query batch at recall 1.000. An engine that
  * re-derives the quantizer per query batch pays the one-off every time
  * and the crossover vs brute force stays thin; with the index cached the
  * steady-state cost is search-only — 20–46× under brute at the measured
  * operating point.
  *
  * Probe-before-fit, like the extract cache's Q3 `exists()` check: a hit
  * is two plain parquet reads (downstream plans see prunable scans); a
  * miss runs ONE seeded KMeans fit + one codegen'd NearestCentroid
  * assignment pass ([[LlmOps.ivfAssign]]) and persists both. The content
  * fingerprint ([[Cache.contentRoot]]: file names, sizes, mtimes) versions
  * the index — a corpus regenerated at the same path re-fits instead of
  * probe-hitting stale cells, and the oracle gate stays sound because it
  * recomputes everything from source regardless of where the engine got
  * its assignment.
  */
object IvfIndex {

  /** Cache root + key for a given corpus/parameter combination (shared
    * with the spec so the addressing is a contract, not an accident). */
  def cacheRoot(sfDir: String, table: String): String =
    Cache.contentRoot("graft_ivf", sfDir, table)
  def keyTag(k: Int, seed: Long, fitFraction: Double): String =
    s"k${k}_s${seed}_f${math.round(fitFraction * 10000)}"

  /** Memoized [[LlmOps.ivfAssign]]: returns (assignment, centroids) for
    * `emb` — which the caller derived from `sfDir/table.parquet`, the
    * source the cache key fingerprints. On a hit neither KMeans nor the
    * assignment pass runs (the fit thunk is lazy and both artifacts read
    * back as parquet scans); on a miss the fit runs ONCE even when both
    * artifacts are missing. A torn cache (one artifact present after a
    * crash) heals by recomputing the deterministic seeded fit for the
    * missing side only — same centroids, consistent pair. */
  def cachedAssign(emb: DataFrame, sfDir: String, table: String = "embeddings",
      vCol: String = "v", k: Int = 8, seed: Long = 42,
      fitFraction: Double = 0.1): (DataFrame, DataFrame) = {
    val spark: SparkSession = emb.sparkSession
    val cache = new Cache(spark, cacheRoot(sfDir, table))
    val tag = keyTag(k, seed, fitFraction)
    lazy val fit = LlmOps.ivfAssign(emb, vCol, k, seed, fitFraction)
    val centroids = cache.getOrCompute(s"ivf_cent_$tag")(fit._2)
    val assigned = cache.getOrCompute(s"ivf_assign_$tag")(fit._1)
    (assigned, centroids)
  }
}
