package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LlmOps

/** Differential gate for the native one-walk SimHash
  * ([[graft.functions.SimhashVotesExpr]]) against the round-15
  * relational formulation it replaced (token × bit explode, md5 per
  * (token, bit) row, two aggregates) — the exact SQL chain the DuckDB
  * oracle mirrors. Any divergence here is an oracle break, so the sweep
  * covers the full edge surface: NULL text (row must DROP), empty text
  * (single empty token votes), single token, repeated tokens (multiset
  * votes), multi-byte UTF-8 tokens, vote ties (sc = 0 → bit 1), and
  * both registered widths (16, 60). */
class SimhashParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The replaced relational pipeline, verbatim (modulo naming). */
  private def relational(docs: DataFrame, nBits: Int): DataFrame = {
    val tokens = docs.select(col("doc_id"),
      explode(split(LlmOps.normText(col("text")), " ")).as("w"))
    val bits = tokens
      .withColumn("j", explode(sequence(lit(0), lit(nBits - 1))))
      .withColumn("hexd",
        expr("instr('0123456789abcdef', substring(md5(w), 1 + CAST(floor(j/4) AS INT), 1)) - 1"))
      .withColumn("contrib",
        when(expr("(hexd >> (j % 4)) & 1") === 1, lit(1)).otherwise(lit(-1)))
    bits.groupBy(col("doc_id"), col("j"))
      .agg(sum(col("contrib")).as("sc"))
      .withColumn("bit", when(col("sc") >= 0, lit(1L)).otherwise(lit(0L)))
      .groupBy(col("doc_id"))
      .agg(sum(expr("bit << j")).as("simhash"))
  }

  private def corpus: DataFrame = {
    val rnd = new scala.util.Random(41)
    val words = Vector("alpha", "beta", "gamma", "delta", "wörld", "héllo",
      "x", "データ", "the", "of")
    val gen = (1 to 60).map { i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ =>
        words(rnd.nextInt(words.length))).mkString(" "))
    }
    val edge = Seq(
      (1001L, null.asInstanceOf[String]), // must DROP from the result
      (1002L, ""),                        // single empty token
      (1003L, "   "),                     // trim → "" → single empty token
      (1004L, "one"),
      (1005L, "tie tie tie tie"),         // heavy multiset repetition
      (1006L, "Mixed   CASE\t\twhitespace\nrun"))
    (gen ++ edge).toDF("doc_id", "text")
  }

  for (nBits <- Seq(16, 60))
    test(s"native simhash_votes == relational token-vote chain, nBits=$nBits") {
      val native = LlmOps.simhashBits(corpus, "doc_id", "text", nBits)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val rel = relational(corpus, nBits)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(native.length == rel.length, "row sets differ (null-text drop?)")
      assert(!native.map(_._1).contains(1001L), "null-text doc must drop")
      assert(native.sameElements(rel))
    }
}
