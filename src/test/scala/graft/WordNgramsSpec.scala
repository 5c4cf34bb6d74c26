package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity gate for the native word n-gram walk
  * ([[graft.functions.WordNgramsExpr]]) against BOTH interpreted HOF
  * idioms it replaced: the bigram form that re-split the text per
  * element, and the pre-split transform/slice/array_join k-gram form.
  * Sweep covers NULL (both CASE forms yield array()), empty string
  * (one empty token), single token, consecutive/trailing spaces (empty
  * tokens — split limit=-1 semantics), and multi-byte UTF-8. */
class WordNgramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val texts = Seq(
    null.asInstanceOf[String], "", " ", "one", "a b", "a b c",
    "a  b", "a b ", " a b", "héllo wörld προς データ flow",
    "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
    (1 to 40).map(i => s"tok$i").mkString(" "))

  test("word_ngrams(s, 2) == re-splitting bigram lambda (incl. CASE arms)") {
    val df = texts.toDF("t")
    val rows = df.select(
      graft.functions.native.word_ngrams(col("t"), 2).as("nat"),
      expr("""CASE WHEN size(split(t, ' ')) >= 2
              THEN transform(sequence(0, size(split(t, ' ')) - 2),
                   i -> concat(split(t, ' ')[i], ' ', split(t, ' ')[i+1]))
              ELSE array() END""").as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("word_ngrams(s, 5) == pre-split transform/slice/array_join lambda") {
    val df = texts.toDF("t")
    val rows = df
      .withColumn("__w", split(col("t"), " "))
      .select(
        graft.functions.native.word_ngrams(col("t"), 5).as("nat"),
        expr("""CASE WHEN size(__w) >= 5
                THEN transform(sequence(0, size(__w) - 5),
                  i -> array_join(slice(__w, i + 1, 5), ' '))
                ELSE array() END""").as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("split/join round trip: reading the normalized string directly " +
      "is byte-equivalent to the old array_join(slice(__w,…)) grams") {
    // spanFrames feeds the native walk the normalized STRING, while its
    // word frame is split(norm, ' ') — the r15 gram form rebuilt the
    // text as array_join(slice(__w,…), ' '). The two agree iff
    // array_join(split(t, ' '), ' ') == t byte-for-byte (including
    // empty tokens from runs of delimiters), which this pins.
    val df = texts.filter(_ != null).toDF("t")
    val rows = df.select(col("t"),
      array_join(split(col("t"), " "), " ").as("rt")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }
}
