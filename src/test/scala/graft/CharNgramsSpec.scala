package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.native

/** Parity gate for the native O(len) [[graft.functions.CharNgrams]]
  * against the SQL-lambda formulation it replaces — the replacement is
  * only sound if the outputs are IDENTICAL, including UTF-8 multi-byte
  * character semantics (`substring` counts characters, not bytes) and
  * the shorter-than-n → empty-array guard the call sites used to spell
  * with CASE WHEN. */
class CharNgramsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lambdaForm(n: Int) = expr(
    s"""CASE WHEN length(s) >= $n
        THEN transform(sequence(1, length(s)-${n - 1}), i -> substring(s, i, $n))
        ELSE array() END""")

  test("char_ngrams matches the lambda substring form on adversarial strings") {
    val rng = new scala.util.Random(19)
    val alphabet = "ab cdé世界😀xyz.!" // ascii + 2-byte + 3-byte + surrogate pair
    // None is load-bearing: the CASE's NULL condition falls to ELSE, so a
    // NULL string must yield array(), not null (round-15 advisor)
    val cases: Seq[Option[String]] =
      (Seq("", "a", "ab", "abc", "abcd", "  ", "世界世",
        "😀😁😂😃") ++
        (1 to 200).map(_ => (0 until rng.nextInt(60))
          .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString))
        .map(Option(_)) :+ None
    for (n <- Seq(1, 2, 3, 8)) {
      val df = cases.toDF("s")
        .select(col("s"), lambdaForm(n).as("want"),
          native.char_ngrams(col("s"), n).as("got"))
      df.collect().foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n mismatch on '${if (r.isNullAt(0)) "NULL" else r.getString(0)}': " +
            s"want=${r.getSeq[String](1)} got=${r.getSeq[String](2)}")
      }
    }
  }

  test("char_ngrams yields array() for NULL input (the lambda-CASE ELSE arm) " +
      "and handles a long document linearly") {
    val out = Seq[Option[String]](None, Some("x" * 100000)).toDF("s")
      .select(native.char_ngrams(col("s"), 3).as("g"))
      .collect()
    assert(!out(0).isNullAt(0) && out(0).getSeq[String](0).isEmpty,
      "null input must yield the empty array, matching the lambda-CASE form")
    assert(out(1).getSeq[String](0).length == 99998)
  }
}
