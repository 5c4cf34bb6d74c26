package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.LlmOps

class LlmOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 2.0)),
      (Seq(1.0, 2.0), Seq(-1.0, -2.0))
    ).toDF("a", "b").select(LlmOps.cosine($"a", $"b").as("c"))
    val cs = df.as[Double].collect()
    assert(math.abs(cs(0) - 1.0) < 1e-12)
    assert(math.abs(cs(1)) < 1e-12)
    assert(math.abs(cs(2) + 1.0) < 1e-12)
  }

  test("cosine: zero-norm vector scores 0, never NaN (NaN outranks everything)") {
    val df = Seq(
      (Seq(0.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 0.0))
    ).toDF("a", "b").select(LlmOps.cosine($"a", $"b").as("c"))
    df.as[Double].collect().foreach(c => assert(c == 0.0))
  }

  test("native DotProduct: ragged pair yields NULL like the HOF formulation") {
    val df = Seq((Seq(1.0), Seq(1.0, 5.0))).toDF("a", "b").select(
      LlmOps.dot($"a", $"b").as("native"),
      LlmOps.dotHof($"a", $"b").as("hof"))
    val r = df.collect().head
    assert(r.isNullAt(0), "native must not truncate to the shorter vector")
    assert(r.isNullAt(1), "zip_with pads nulls that poison the sum")
  }

  test("min_rolling_hash: bad window literals fail at analysis time") {
    val df = Seq("hello world").toDF("s")
    Seq(0, 10, -1).foreach { w =>
      val e = intercept[Exception] {
        df.select(graft.functions.native.min_rolling_hash($"s", w)).collect()
      }
      assert(e.getMessage.contains("window"), s"w=$w: ${e.getMessage}")
    }
  }

  test("native DotProduct equals the interpreted HOF formulation exactly") {
    val e = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val both = e.select(
      LlmOps.dot($"v", $"v").as("native"),
      LlmOps.dotHof($"v", $"v").as("hof"))
    // bit-identical: same sequential association order
    assert(both.filter($"native" =!= $"hof").count() == 0)
  }

  test("native DotProduct participates in whole-stage codegen") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(LlmOps.dot($"a", $"b").as("d"))
    assert(df.as[Double].collect().head == 11.0)
    // a parquet-backed frame (literals constant-fold to LocalTableScan)
    val e = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"embedding".cast("array<double>").as("v"))
      .select(LlmOps.dot($"v", $"v").as("d"))
    // "*(n)" prefixes mark whole-stage-codegen stages in the compact plan
    val plan = e.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"), plan)
  }

  test("WalshSignBits: equals the interpreted formulation, codegen") {
    import org.apache.spark.sql.functions._
    val e = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    def proj(p: Int) =
      s"""aggregate(transform(sequence(0, size(v)-1),
           i -> element_at(v, i+1) * CAST(1 - 2 * ((i div $p) % 2) AS DOUBLE)),
           CAST(0.0 AS DOUBLE), (a, x) -> a + x)"""
    val interp = (0 until 6)
      .map(j => expr(s"CASE WHEN ${proj(1 << j)} >= 0 THEN ${1 << j} ELSE 0 END"))
      .reduce(_ + _)
    val cmp = e.select($"vec_id",
      graft.functions.native.walsh_sign_bits($"v", 6).as("nat"),
      interp.as("ref"))
    assert(cmp.filter($"nat" =!= $"ref").isEmpty, "native != interpreted bits")
    val plan = e.select(graft.functions.native.walsh_sign_bits($"v", 6).as("b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [walsh_sign_bits"), plan)
  }

  test("signLshCells: bands x cells cover the packed bits in order") {
    import org.apache.spark.sql.functions._
    val e = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val out = e.select($"vec_id",
        graft.functions.native.walsh_sign_bits($"v", 6).as("bits"),
        graft.ops.LlmOps.signLshCells($"v").as("cells"))
      .select($"vec_id", $"bits", explode($"cells").as("bc"))
      .select($"vec_id", $"bits", $"bc.band", $"bc.cell")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val bits = r.getInt(1); val band = r.getInt(2); val cell = r.getInt(3)
      val expect = (((bits >> (2 * band)) & 1) << 1) | ((bits >> (2 * band + 1)) & 1)
      assert(cell == expect, s"band $band of bits $bits: $cell != $expect")
    }
  }

  test("MinRollingHash: known value, null under window, codegen") {
    import graft.functions.native.min_rolling_hash
    val df = Seq("hello world rolling hash", "short").toDF("s")
      .select(min_rolling_hash($"s", 8).as("fp"))
    val out = df.as[Option[Long]].collect()
    assert(out(0).contains(984859969061L)) // python-verified golden value
    assert(out(1).isEmpty)                 // len < window -> null
    val e = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(min_rolling_hash($"text", 8).as("fp"))
    assert(e.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(e.filter($"fp".isNull).count() == 0)
  }

  test("dedupExact collapses case/whitespace variants, keeps smallest id") {
    val docs = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "  HELLO WORLD  "),
      (9L, "unique text")
    ).toDF("doc_id", "text")
    val out = LlmOps.dedupExact(docs).select("doc_id", "n_copies")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 9L -> 1L))
  }

  test("dedup_incremental: counters match a brute-force replay; the line store materializes once and probe-hits after") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dedup_incremental")(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // brute force: replay the store/batch split over the same line explode
    val ls = LlmOps.lines(graft.ops.Tables.documents(spark, d))
      .as[(Long, Int, String)].collect()
    val store = ls.filter(_._1 % 2 == 0).map(_._3).toSet
    val seen = scala.collection.mutable.Set.empty[String]
    val expect = ls.filter(_._1 % 2 == 1).sortBy(r => (r._1, r._2))
      .map { case (id, _, line) =>
        val hit = store.contains(line)
        val inBatch = !hit && seen.contains(line)
        if (!hit) seen += line
        (id, hit, inBatch)
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (id, rows) =>
        (id, rows.length.toLong, rows.count(_._2).toLong, rows.count(_._3).toLong)
      }
    assert(out == expect && out.nonEmpty)
    assert(out.exists(_._3 > 0),
      "fixture must contain cross-batch line duplication or the store check is vacuous")
    // the store is a materialized cache artifact: the same root probe-hits
    // (root derivation is the shared contract — covers both the plain-file
    // and directory-of-parts fixture layouts)
    val root = graft.ops.Cache.contentRoot("graft_dstore", d, "documents")
    assert(new graft.ops.Cache(spark, root).probe("line_store"),
      "second run must find the line store already materialized")
  }

  test("bigram shingles: n-1 shingles in order; one-token and empty text yield NONE") {
    val df = Seq("a b c d", "solo", "").toDF("norm")
      .select(LlmOps.bigramShingles("norm").as("sh"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) == Seq("a b", "b c", "c d"))
    // the sequence(a, b) counts-DOWN trap: one token must mean zero bigrams
    assert(rows(1) == Seq.empty && rows(2) == Seq.empty)
  }

  test("minhash signature is deterministic and permutation-sensitive") {
    val df = Seq("a b c d", "a b c d", "x y z w").toDF("norm")
      .select(LlmOps.minhashSig(LlmOps.bigramShingles("norm"), 0).as("s0"),
        LlmOps.minhashSig(LlmOps.bigramShingles("norm"), 1).as("s1"))
    val rows = df.collect()
    assert(rows(0) == rows(1))           // same text, same signature
    assert(rows(0) != rows(2))           // different text differs
    assert(rows(0).getString(0) != rows(0).getString(1)) // perms differ
  }

  test("minhashSignatures (codegen path) equals per-column minhashSig") {
    val docs = Seq((1L, "spark query engine fast"), (2L, "a b c d e f"))
      .toDF("doc_id", "text")
    val fast = LlmOps.minhashSignatures(docs, "doc_id", "text", 4)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val slow = {
      val n = docs.withColumn("norm", LlmOps.normText($"text"))
        .withColumn("sh", LlmOps.bigramShingles("norm"))
      n.select($"doc_id" +: (0 until 4).map(k =>
        LlmOps.minhashSig($"sh", k).as(s"s$k")): _*)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    }
    assert(fast == slow)
  }

  test("connectedComponents: chain propagates min label across hops") {
    // 1-2, 2-3, 3-4 chain plus isolated 9: all of 1..4 -> rep 1
    val nodes = Seq(1L, 2L, 3L, 4L, 9L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val out = LlmOps.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 9L))
  }

  test("connectedComponents: 100-link chain converges within a 12-round " +
    "budget (pointer-jump O(log d), not O(d) propagation)") {
    // the adversarial shape for pure min-label propagation: a paragraph-
    // overlap chain 100 edges long, worst-case oriented (labels must flow
    // from the LOW end, so node ids ascend along the chain). Pure hop
    // propagation needs ~100 rounds; hop+jump needs ~log2(100) ≈ 7. The
    // 12-round maxIter is the budget pin: exceeding it throws.
    val n = 101
    val nodes = (0 until n).map(_.toLong).toDF("node")
    val edges = (0 until n - 1).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")
    val out = LlmOps.connectedComponents(nodes, edges, maxIter = 12)
      .as[(Long, Long)].collect()
    assert(out.length == n && out.forall(_._2 == 0L),
      "every chain node must label to the chain minimum")
  }

  test("simhash16: identical docs share hash; hash is within 16 bits") {
    val docs = Seq((1L, "spark query engine"), (2L, "spark query engine"),
      (3L, "totally different words here")).toDF("doc_id", "text")
    val out = LlmOps.simhash16(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == out(2L))
    assert(out.values.forall(h => h >= 0 && h < 65536))
  }

  test("lineDedup: C4 line rule — first corpus occurrence owns each line") {
    // 4-word "lines"; lineA = "a b c d", lineB = "e f g h"
    val corpus = Seq(
      (1L, "a b c d e f g h"),  // both lines first-seen -> kept
      (2L, "a b c d e f g h"),  // exact dup of doc 1 -> everything drops
      (3L, "x y z w a b c d"),  // own line kept, shared lineA drops
      (4L, "p q r s p q r s"),  // within-doc repeat: second copy drops
      (5L, "m n o")             // short doc: one partial line, kept
    ).toDF("doc_id", "text")
    val out = LlmOps.lineDedup(corpus, wordsPerLine = 4)
      .select($"doc_id", $"n_lines", $"n_kept", $"kept_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, 2L, "a b c d e f g h")))
    assert(out(2L) == ((2L, 0L, "")))
    assert(out(3L) == ((2L, 1L, "x y z w")))
    assert(out(4L) == ((2L, 1L, "p q r s")))
    assert(out(5L) == ((1L, 1L, "m n o")))
  }

  test("dedup_levenshtein: length-banded blocking equals the unbanded join (X2f)") {
    // the oracle already pins this via SQL; this is the Scala-side witness
    // that the ±1 band probe drops no qualifying pair and duplicates none
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dedup_levenshtein")(spark, d)
      .as[(Long, Long, Long)].collect().toSet
    val base = graft.ops.Tables.documents(spark, d)
      .withColumn("norm", LlmOps.normText($"text"))
      .select($"doc_id", $"lang", $"norm")
    val brute = base.select($"doc_id".as("doc_a"), $"lang", $"norm".as("na"))
      .join(base.select($"doc_id".as("doc_b"), $"lang".as("langb"), $"norm".as("nb")),
        $"lang" === $"langb" && $"doc_a" < $"doc_b")
      .withColumn("dist", levenshtein($"na", $"nb"))
      .filter($"dist" <= 5)
      .select($"doc_a", $"doc_b", $"dist".cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    info(s"pairs at sf0.001: ${out.size}")
    assert(out == brute)
  }

  test("hard_negatives: top-5 other-label equals a Scala brute force; no same-label candidate survives (X3e)") {
    val d = "/root/testdata/sf0.001"
    val vecs = graft.ops.Tables.embeddings(spark, d)
      .select($"vec_id", $"label", $"embedding".cast("array<double>"))
      .as[(Long, Int, Seq[Double])].collect()
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val labels = vecs.map(v => v._1 -> v._2).toMap
    val brute = vecs.filter(_._1 % 50 == 0).flatMap { case (qid, ql, qv) =>
      val qn = math.sqrt(qv.map(x => x * x).sum)
      vecs.filter(_._2 != ql).map { case (cid, _, cv) =>
        val dot = qv.zip(cv).map { case (a, b) => a * b }.sum
        (cid, r6(dot / (qn * math.sqrt(cv.map(x => x * x).sum))))
      }.sortBy { case (c, s) => (-s, c) }.take(5).zipWithIndex
        .map { case ((c, s), i) => (qid, (i + 1).toLong, c, s) }
    }.toSet
    val out = SparkEntry.queries("hard_negatives")(spark, d)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == brute && out.nonEmpty)
    out.foreach { case (qid, _, cand, _) =>
      assert(labels(cand) != labels(qid), s"same-label candidate $cand for query $qid")
    }
  }

  test("repeated_ngrams: per-doc counters equal a Scala brute force; sliding grams catch cross-chunk repeats (X15c)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("repeated_ngrams")(spark, d)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val docs = graft.ops.Tables.documents(spark, d)
      .select($"doc_id", LlmOps.normText($"text").as("n"))
      .as[(Long, String)].collect()
    val grams = docs.map { case (id, n) =>
      val w = n.split(" ")
      id -> (if (w.length >= 5) w.sliding(5).map(_.mkString(" ")).toSet
             else Set.empty[String])
    }
    val df = grams.flatMap(_._2).groupBy(identity).map { case (g, v) => g -> v.length }
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val expect = grams.sortBy(_._1).map { case (id, gs) =>
      val rep = gs.count(g => df(g) >= 2).toLong
      (id, gs.size.toLong, rep,
        if (gs.isEmpty) 0.0 else r6(rep.toDouble / gs.size))
    }.toSeq
    assert(out == expect && out.nonEmpty)
    assert(out.exists(r => r._4 > 0.0),
      "fixture must contain cross-doc 5-gram repetition or the signal is vacuous")
  }

  test("dedup_spans: maximal duplicated word spans equal a Scala brute force (X15d)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dedup_spans")(spark, d)
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    val docs = graft.ops.Tables.documents(spark, d)
      .select($"doc_id", LlmOps.normText($"text").as("n"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    // total-occurrence counts (within-doc repeats count: ExactSubstr's
    // "appears more than once in the corpus")
    val words = docs.map { case (id, n) => id -> n.split(" ").toSeq }
    val allGrams = words.flatMap { case (_, w) =>
      if (w.length >= 5) w.sliding(5).map(_.mkString(" ")).toSeq else Seq.empty
    }
    val occ = allGrams.groupBy(identity).map { case (g, v) => g -> v.length }
    val expect = words.flatMap { case (id, w) =>
      val dupPos =
        if (w.length < 5) Seq.empty[Int]
        else (0 to w.length - 5).filter(i => occ(w.slice(i, i + 5).mkString(" ")) >= 2)
      // merge runs of consecutive duplicated positions into maximal spans
      val spans = dupPos.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.reverse
      spans.zipWithIndex.map { case ((s, e), i) =>
        (id, i + 1, s, e - s + 5, w.slice(s, e - s + 5 + s).mkString(" "))
      }
    }
    assert(out == expect && out.nonEmpty)
    // the fixture must actually exercise span MERGING (a >5-word span =
    // at least two overlapping duplicated grams fused) or X15d collapses
    // into X15c's per-gram signal
    assert(out.exists(_._4 > 5), "no merged span in fixture — vacuous")
  }

  test("dsir_weights: hashed-bigram importance weights equal a Scala brute force (X16)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dsir_weights")(spark, d)
      .as[(Long, Long, Double, Option[Double])].collect().toSeq
    val docs = graft.ops.Tables.documents(spark, d)
      .select($"doc_id", $"lang", LlmOps.normText($"text").as("n"))
      .as[(Long, Option[String], Option[String])].collect().toSeq.sortBy(_._1)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(g: String): Int = {
      val h = md.digest(g.getBytes("UTF-8")).take(2)
      // first 3 hex digits = 12 bits
      ((h(0) & 0xff) << 4) | ((h(1) & 0xff) >> 4)
    }
    val perDoc = docs.map { case (id, lang, n) =>
      val w = n.getOrElse("").split(" ").toSeq
      val bs = if (w.length >= 2) w.sliding(2).map(_.mkString(" ")).map(bucket).toSeq
               else Seq.empty[Int]
      (id, lang.contains("en"), bs)
    }
    val t = new Array[Long](4096); val r = new Array[Long](4096)
    perDoc.foreach { case (_, en, bs) =>
      bs.foreach { b => r(b) += 1; if (en) t(b) += 1 }
    }
    val tT = t.sum.toDouble + 4096.0; val rT = r.sum.toDouble + 4096.0
    def wm(b: Int): Long =
      math.floor((math.log((t(b) + 1.0) / tT) - math.log((r(b) + 1.0) / rT)) * 1e6 + 0.5).toLong
    // engine-identical arithmetic, not BigDecimal: dsir_sum is the plain
    // long→double quotient, dsir_avg the floor(x·1e6+0.5)/1e6 IEEE form
    // (Spark round(_,6) goes through shortest-decimal HALF_UP and
    // diverged from DuckDB's binary rounding at the 10× gate)
    val expect = perDoc.map { case (id, _, bs) =>
      val micro = bs.map(wm).sum
      (id, bs.size.toLong, micro / 1e6,
        if (bs.isEmpty) None
        else Some(math.floor(micro / 1e6 / bs.size * 1e6 + 0.5) / 1e6))
    }
    assert(out == expect && out.nonEmpty)
    // the weights must discriminate: target-language docs score higher
    // on average than the rest (that is DSIR's whole point)
    val (en, rest) = out.zip(perDoc).partition(_._2._2)
    val enAvg = en.flatMap(_._1._4); val restAvg = rest.flatMap(_._1._4)
    assert(enAvg.nonEmpty && restAvg.nonEmpty)
    assert(enAvg.sum / enAvg.size > restAvg.sum / restAvg.size,
      "en exemplar docs must out-score the raw rest on average")
  }

  test("dedup_spans_cut: surviving text equals a Scala brute-force span cut (X15e)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dedup_spans_cut")(spark, d)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    val docs = graft.ops.Tables.documents(spark, d)
      .select($"doc_id", LlmOps.normText($"text").as("n"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val words = docs.map { case (id, n) => id -> n.split(" ").toSeq }
    val allGrams = words.flatMap { case (_, w) =>
      if (w.length >= 5) w.sliding(5).map(_.mkString(" ")).toSeq else Seq.empty
    }
    val occ = allGrams.groupBy(identity).map { case (g, v) => g -> v.length }
    val expect = words.map { case (id, w) =>
      val dupPos =
        if (w.length < 5) Seq.empty[Int]
        else (0 to w.length - 5).filter(i => occ(w.slice(i, i + 5).mkString(" ")) >= 2)
      val spans = dupPos.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.reverse
      val covered = spans.flatMap { case (s, e) => s until (e + 5) }.toSet
      val kept = w.indices.filterNot(covered)
      (id, spans.size.toLong, w.size.toLong, covered.size.toLong,
        kept.map(w).mkString(" "))
    }
    assert(out == expect && out.nonEmpty)
    assert(out.exists(_._4 > 0), "fixture must cut something — vacuous otherwise")
    assert(out.exists(r => r._4 > 0 && r._5.nonEmpty),
      "a doc must survive PARTIALLY cut (not only full kills) — vacuous otherwise")
  }

  test("native DsirBigram: split-semantics brute-force parity on adversarial strings; interpreted == codegen") {
    val strs: Seq[String] = Seq(null, "", "one", "a b", "a  b", " lead",
      "trail ", "a b c d a b", "übergröße zh 中文 字 中文 字")
    val df = strs.map(Tuple1(_)).toDF("s")
    val micro = Array.tabulate(4096)(i => (i * 2654435761L) % 1000 - 500)
    def outDf = df.select(
      graft.functions.native.dsir_buckets($"s").as("b"),
      graft.functions.native.dsir_score($"s", micro).as("r"))
    def brute(s: String): (Seq[Int], Long) =
      if (s == null) (Seq.empty, 0L)
      else {
        // Spark split(col, " ") = Java split with limit -1 (trailing
        // empty tokens kept) — the contract the byte walk must match
        val w = s.split(" ", -1)
        if (w.length < 2) (Seq.empty, 0L)
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val bs = w.sliding(2).map(_.mkString(" ")).map { g =>
            val h = md.digest(g.getBytes("UTF-8"))
            ((h(0) & 0xff) << 4) | ((h(1) & 0xff) >> 4)
          }.toSeq
          (bs, bs.map(micro(_)).sum)
        }
      }
    val got = outDf.as[(Seq[Int], Seq[Long])].collect().toSeq
    strs.zip(got).foreach { case (s, (bs, r)) =>
      val (eb, em) = brute(s)
      assert(bs == eb && r == Seq(eb.size.toLong, em), s"mismatch for <$s>")
    }
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "NO_CODEGEN")
      assert(outDf.as[(Seq[Int], Seq[Long])].collect().toSeq == got,
        "interpreted/codegen divergence")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("sim_rrf: fusion equals a Scala brute-force RRF over both rankings (X46)") {
    val d = "/root/testdata/sf0.001"
    val vecs = graft.ops.Tables.embeddings(spark, d)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val brute = vecs.keys.filter(_ % 50 == 0).flatMap { qid =>
      val qv = vecs(qid)
      val qn = math.sqrt(qv.map(x => x * x).sum)
      val scored = (vecs - qid).toSeq.map { case (cid, cv) =>
        val dot = qv.zip(cv).map { case (a, b) => a * b }.sum
        val cn = math.sqrt(cv.map(x => x * x).sum)
        (cid, r6(dot / (qn * cn)), r6(qn * qn + cn * cn - 2.0 * dot))
      }
      val rc = scored.sortBy(s => (-s._2, s._1)).zipWithIndex
        .map { case (s, i) => s._1 -> (i + 1) }.toMap
      val rl = scored.sortBy(s => (s._3, s._1)).zipWithIndex
        .map { case (s, i) => s._1 -> (i + 1) }.toMap
      scored.map(_._1)
        .filter(c => rc(c) <= 10 || rl(c) <= 10)
        .map { c =>
          val f = (if (rc(c) <= 10) 1.0 / (rc(c) + 60) else 0.0) +
            (if (rl(c) <= 10) 1.0 / (rl(c) + 60) else 0.0)
          (c, r6(f))
        }
        .sortBy { case (c, f) => (-f, c) }.take(5).zipWithIndex
        .map { case ((c, f), i) => (qid, (i + 1).toLong, c, f) }
    }.toSet
    val out = SparkEntry.queries("sim_rrf")(spark, d)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == brute && out.nonEmpty)
  }

  test("simhash pairs: banded candidates equal brute-force hd<=3 (pigeonhole recall 1) (X2b)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dedup_simhash_pairs")(spark, d)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    // brute force: all pairs over the collected 60-bit hashes
    val hashes = graft.ops.LlmOps.simhashBits(
        graft.ops.Tables.documents(spark, d), "doc_id", "text", 60)
      .as[(Long, Long)].collect().sortBy(_._1)
    val want = (for {
      i <- hashes.indices; j <- (i + 1) until hashes.length
      hd = java.lang.Long.bitCount(hashes(i)._2 ^ hashes(j)._2)
      if hd <= 3
    } yield (hashes(i)._1, hashes(j)._1, hd)).toSeq.sorted
    assert(out == want, s"banded pairs must equal brute force (got ${out.size}, want ${want.size})")
    assert(out.nonEmpty, "fixture must contain at least one near-dup pair")
  }

  /** Adversarial quotient corpus: the sf0.001 docs, PLUS a 60-doc
    * identical-text megacluster (one signature group of multiplicity 60 —
    * the shape whose all-pairs form is quadratic), PLUS shingle-less docs
    * (empty/one-word — no signature row at all). Written once per suite. */
  private lazy val quotDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_quot").toString
    val base = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
    val boiler = Seq.fill(5)("the quarterly portfolio navigation footer " +
      "repeats across every published revision").mkString(" ")
    val extra = ((10000L until 10060L).map(i => (i, boiler)) ++
        Seq((20000L, ""), (20001L, "word"), (20002L, "  ")))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("synthetic").as("source"), length($"text").cast("long").as("n_chars"))
    base.unionByName(extra).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  /** Node-grain all-pairs duplicate graph over the quotient corpus — the
    * independent reference every quotient consumer is checked against
    * (this is the pre-quotient registered formulation, kept here as the
    * differential baseline; the DuckDB oracles pin the same form at
    * sf0.01 every correctness pass). */
  private lazy val refPairs = LlmOps.minhashPairs(
    graft.ops.Tables.documents(spark, quotDir)).cache()

  test("quotient CC equals all-pairs CC (megacluster + shingle-less docs)") {
    val docs = graft.ops.Tables.documents(spark, quotDir)
    val want = LlmOps.connectedComponents(
        docs.select($"doc_id".as("node")), refPairs)
      .as[(Long, Long)].collect().toSet
    val got = SparkEntry.queries("dedup_clusters")(spark, quotDir)
      .as[(Long, Long)].collect().toSet
    assert(got == want, s"quotient CC diverged: ${got.size} vs ${want.size} labels")
    // the megacluster must resolve to ONE component with >= 60 members
    val rep0 = got.find(_._1 == 10000L).get._2
    assert(got.count(_._2 == rep0) >= 60)
  }

  test("quotient degree histogram equals the node-grain all-pairs form") {
    val docs = graft.ops.Tables.documents(spark, quotDir)
    val deg = refPairs.select($"doc_a".as("doc_id"))
      .unionAll(refPairs.select($"doc_b".as("doc_id")))
      .groupBy($"doc_id").agg(count(lit(1)).as("degree"))
    val want = docs.select($"doc_id").join(deg, Seq("doc_id"), "left")
      .select(coalesce($"degree", lit(0L)).as("degree"))
      .groupBy($"degree").agg(count(lit(1)).as("n_docs"))
      .as[(Long, Long)].collect().toSet
    val got = SparkEntry.queries("dup_graph_degree")(spark, quotDir)
      .as[(Long, Long)].collect().toSet
    assert(got == want, s"degree histogram diverged")
    // megacluster members have degree >= 59; shingle-less docs land on 0
    assert(want.exists(_._1 == 0L))
  }

  test("quotient triangle count equals the node-grain all-pairs form") {
    val edges = refPairs.select($"doc_a".as("u"), $"doc_b".as("v"))
      .unionAll(refPairs.select($"doc_b", $"doc_a"))
    val deg = edges.groupBy($"u").agg(count(lit(1)).as("deg"))
    val o = edges.join(deg, Seq("u"))
      .join(deg.select($"u".as("v"), $"deg".as("degv")), Seq("v"))
      .filter($"deg" < $"degv" || ($"deg" === $"degv" && $"u" < $"v"))
      .select($"u".as("src"), $"v".as("dst"))
    val wedges = o.select($"src", $"dst".as("w1"))
      .join(o.select($"src", $"dst".as("w2")), Seq("src"))
      .filter($"w1" < $"w2")
    val tri = wedges.join(refPairs,
        wedges("w1") === refPairs("doc_a") && wedges("w2") === refPairs("doc_b"),
        "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val want = deg.agg(
        (sum($"deg") / 2).cast("long").as("n_edges"),
        sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
      .crossJoin(tri)
      .select($"n_edges", $"n_wedges", $"n_triangles",
        when($"n_wedges" === 0, lit(0.0))
          .otherwise(round(lit(3.0) * $"n_triangles" / $"n_wedges", 6))
          .as("global_clustering"))
      .as[(Long, Long, Long, Double)].collect().head
    val got = SparkEntry.queries("triangle_count")(spark, quotDir)
      .as[(Long, Long, Long, Double)].collect().head
    assert(got == want, s"triangle stats diverged: got $got want $want")
    // the 60-clique alone contributes C(60,3) = 34,220 triangles
    assert(got._3 >= 34220L)
  }

  test("triangle_count on a pairless corpus emits the zero row (not NULLs)") {
    // shingled docs, ZERO candidate pairs: per-doc disjoint token
    // vocabularies => disjoint shingle sets => distinct signatures and
    // band keys. Degenerate contract (r9 advice): the closed-form sums
    // coalesce to an explicit (0, 0, 0, 0.0) row — matching the oracle's
    // coalesced aggregates — rather than NULLs from an empty group set.
    val dir = java.nio.file.Files.createTempDirectory("graft_nopair").toString
    (0L until 20L).map(i =>
        (i, (0 until 6).map(j => s"tok${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("synthetic").as("source"), length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("triangle_count")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((0L, 0L, 0L, 0.0)),
      s"pairless corpus must emit the zero row, got ${got.toSeq}")
  }

  test("quotient PageRank equals the node-grain form, integer-exact") {
    val edges = refPairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
      .unionAll(refPairs.select($"doc_b", $"doc_a"))
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val nodes = edges.select($"src".as("doc_id")).distinct()
    val nDf = nodes.agg(count(lit(1)).as("n_nodes"))
    val withDeg = edges.join(deg, Seq("src"))
    var r = nodes.crossJoin(nDf)
      .select($"doc_id", expr("1000000 div n_nodes").as("r"))
    for (_ <- 1 to 3) {
      val contrib = withDeg.join(r, col("src") === col("doc_id"))
        .select($"dst", expr("r div deg").as("c"))
      r = contrib.groupBy($"dst").agg(sum($"c").as("sc"))
        .crossJoin(nDf)
        .select($"dst".as("doc_id"),
          (expr("150000 div n_nodes") + expr("(85 * sc) div 100")).as("r"))
    }
    val want = r.select($"doc_id", $"r".cast("long")).as[(Long, Long)]
      .collect().toMap
    val got = SparkEntry.queries("dup_pagerank")(spark, quotDir)
      .as[(Long, Long)].collect().toMap
    assert(got == want, "group-grain PageRank must be integer-identical " +
      s"(${got.size} vs ${want.size} nodes)")
    assert(got.contains(10000L) && !got.contains(20000L),
      "megacluster in, shingle-less out")
  }

  test("identity-quotient embed CC equals the ungrouped gated CC on a duplicated corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_equot").toString
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    (0 until 3).map(c => base.select(
        ($"vec_id" + c * 100000L).as("vec_id"), $"embedding", $"label"))
      .reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // ungrouped reference: the pre-quotient pair pipeline, inline
    val e = graft.ops.Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", LlmOps.norm($"v"))
    val cells = e.withColumn("bc", explode(LlmOps.signLshCells($"v")))
      .select($"vec_id", $"label", $"bc.band", $"bc.cell")
    val cand = cells.toDF("vec_a", "label", "band", "cell")
      .join(cells.toDF("vec_b", "label", "band", "cell"),
        Seq("label", "band", "cell"))
      .filter($"vec_a" < $"vec_b").select($"vec_a", $"vec_b").distinct()
    val pairs = cand
      .join(e.select($"vec_id".as("vec_a"), $"v".as("va"), $"nrm".as("na")), Seq("vec_a"))
      .join(e.select($"vec_id".as("vec_b"), $"v".as("vb"), $"nrm".as("nb")), Seq("vec_b"))
      .filter(round(LlmOps.dot($"va", $"vb") / ($"na" * $"nb"), 6) >= 0.3)
      .select($"vec_a".as("doc_a"), $"vec_b".as("doc_b"))
    val want = LlmOps.connectedComponents(
        e.select($"vec_id".as("node")), pairs)
      .as[(Long, Long)].collect().toSet
    val got = SparkEntry.queries("dedup_embed_clusters")(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(got == want, s"embed quotient CC diverged: ${got.size} vs ${want.size}")
    // every triplicated vector must label with its copy-0 twin
    assert(got.count { case (n, rep) => n != rep } >= base.count())
  }
}
