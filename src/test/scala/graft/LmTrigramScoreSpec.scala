package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.native
import graft.ops.LlmOps

/** Differential gate for the native one-pass [[graft.functions.LmTrigramScore]]
  * against the composed pipeline it replaces (explode trigrams →
  * inner-join counts → groupBy(doc_id) → round(avg(log p), 6)) — the
  * replacement is only sound if per-doc values AND the omitted-doc set
  * are identical, including NULL/short/unicode documents and grams
  * absent from the table (inner-join row drop). */
class LmTrigramScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docsSeq: Seq[(Long, Option[String])] = Seq(
    1L -> Some("the quick brown fox jumps over the lazy dog"),
    2L -> Some("the the the the"),
    3L -> None,                    // NULL text: omitted by both forms
    4L -> Some(""),                // empty: omitted
    5L -> Some("ab"),              // < 3 chars: omitted
    6L -> Some("abc"),             // exactly one trigram
    7L -> Some("café au lait"),    // 2-byte UTF-8
    8L -> Some("世界 世界 世界"),    // 3-byte UTF-8
    9L -> Some("x😀y😀z"),          // surrogate pairs
    10L -> Some("  spaced   out  ")) // normText collapse/trim

  private def docsDf: DataFrame = docsSeq.toDF("doc_id", "text")

  /** The composed reference pipeline over an arbitrary counts table. */
  private def joined(counts: DataFrame): DataFrame = {
    val tri = docsDf
      .withColumn("norm", LlmOps.normText(col("text")))
      .select(col("doc_id"),
        explode(native.char_ngrams(col("norm"), 3)).as("g"))
    val total = counts.agg(sum(col("cnt")).cast("double").as("tot"))
    tri.join(counts, Seq("g"))
      .crossJoin(total)
      .groupBy(col("doc_id"))
      .agg(round(avg(log(col("cnt") / col("tot"))), 6).as("lm_score"))
  }

  private def nativeForm(counts: DataFrame): DataFrame = {
    val rows = counts.collect()
    val tot = rows.map(_.getLong(1)).sum.toDouble
    val grams = rows.map(_.getString(0))
    val logps = rows.map(r => math.log(r.getLong(1) / tot))
    docsDf
      .select(col("doc_id"), explode(array(native.lm_trigram_score(
        LlmOps.normText(col("text")), grams, logps))).as("lm_score"))
      .filter(col("lm_score").isNotNull)
  }

  private def asMap(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def corpusCounts: DataFrame = docsDf
    .withColumn("norm", LlmOps.normText(col("text")))
    .select(explode(native.char_ngrams(col("norm"), 3)).as("g"))
    .groupBy(col("g")).agg(count(lit(1)).as("cnt"))

  test("native score is value-identical to the joined pipeline, " +
      "same-corpus counts (the text_quality_lm shape)") {
    val counts = corpusCounts.cache()
    try {
      val want = asMap(joined(counts))
      val got = asMap(nativeForm(counts))
      assert(got == want, s"per-doc scores diverge:\n got=$got\nwant=$want")
      // the omission contract: NULL/empty/short docs absent from BOTH
      assert(!got.keySet.exists(Set(3L, 4L, 5L)), s"omitted docs leaked: $got")
      assert(got.contains(6L) && got.contains(9L))
    } finally counts.unpersist()
  }

  test("grams absent from the table are skipped like inner-join row " +
      "drops; a doc with ZERO scored trigrams is omitted") {
    // keep only grams containing a space — doc 2 ("the the...") retains
    // some, doc 6 ("abc") loses its only trigram and must vanish
    val partial = corpusCounts.filter(col("g").contains(" ")).cache()
    try {
      val want = asMap(joined(partial))
      val got = asMap(nativeForm(partial))
      assert(got == want, s"partial-table scores diverge:\n got=$got\nwant=$want")
      assert(!got.contains(6L), "doc with no scored trigrams must be omitted")
    } finally partial.unpersist()
  }

  test("interpreted eval (NO_CODEGEN) matches the codegen path") {
    val counts = corpusCounts.cache()
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    try {
      val gen = asMap(nativeForm(counts))
      spark.conf.set(key, "NO_CODEGEN")
      val interp = asMap(nativeForm(counts))
      assert(interp == gen, s"interpreted/codegen divergence: $interp vs $gen")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      counts.unpersist()
    }
  }
}
