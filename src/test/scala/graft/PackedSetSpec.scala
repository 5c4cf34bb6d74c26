package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity gate for the packed sorted-set carrier
  * ([[graft.functions.PackedSet]]): `packed_intersect_count(pack(a),
  * pack(b))` must equal `size(array_intersect(a, b))` for ALL inputs —
  * duplicates (distinct-match semantics), empty arrays, empty strings,
  * multi-byte UTF-8 (unsigned byte order = UTF8String order), and
  * unsorted inputs. Any divergence is an oracle break for
  * dedup_containment / dedup_ngram_jaccard*. */
class PackedSetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packed_intersect_count == size(array_intersect) on a random sweep") {
    val rnd = new scala.util.Random(43)
    val alphabet = Vector("", "a", "ab", "abc", "abd", "b", "ba", "héllo",
      "wörld", "データ", "ab", "zz", "z", "0", "00", "000")
    def arr(): Seq[String] =
      (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
    val pairs = (1 to 300).map(_ => (arr(), arr())) ++ Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a", "a", "a"), Seq("a")),
      (Seq("a", "b", "a"), Seq("b", "b", "a")),
      (Seq(""), Seq("", "")))
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      graft.functions.native.packed_intersect_count(
        graft.functions.native.pack_sorted_set(col("a")),
        graft.functions.native.pack_sorted_set(col("b"))).as("nat"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
