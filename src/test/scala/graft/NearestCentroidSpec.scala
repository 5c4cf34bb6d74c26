package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.native

/** [[graft.functions.NearestCentroid]] — the native codegen'd IVF
  * assignment pass. Differential-tested against the interpreted HOF fold
  * it replaced (argmin over per-centroid `round(Σ(a-b)², 6)` with strict
  * `<` — first/lowest cell wins ties), the same formulation the DuckDB
  * centroid side-dump oracles replay.
  */
class NearestCentroidSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  import org.apache.spark.sql.{Column, DataFrame}

  /** The retired fold, verbatim semantics. */
  private def foldAssign(v: Column, cents: Seq[Array[Double]]): Column = {
    val centLits = cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cell"), array(c.map(lit).toSeq: _*).as("cvec"))
    }
    aggregate(
      array(centLits: _*),
      struct(lit(Double.MaxValue).as("d"), lit(-1).as("cell")),
      (acc, cEl) => {
        val dist = round(aggregate(
          zip_with(v, cEl.getField("cvec"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (x, y) => x + y), 6)
        when(dist < acc.getField("d"),
          struct(dist.as("d"), cEl.getField("cell").as("cell")))
          .otherwise(acc)
      }).getField("cell")
  }

  private def centMatrix(cents: Seq[Array[Double]]): Column =
    array(cents.map(c => array(c.map(lit).toSeq: _*)): _*)

  private def vectors(n: Int, dim: Int, seed: Long): DataFrame = {
    // deterministic pseudo-random doubles in [-1, 1] via a hash mix —
    // no Math.random, reproducible across runs
    s.range(n.toLong).select(col("id"),
      expr(s"""transform(sequence(0, ${dim - 1}), i ->
        CAST(pmod(xxhash64(id * 1000 + i + $seed), 20001) - 10000 AS DOUBLE)
          / 10000.0D)""")
        .as("v"))
  }

  test("differential vs the HOF fold: 2000 vectors x 17 centroids agree exactly") {
    val cents = (0 until 17).map(j =>
      Array.tabulate(8)(i => ((j * 31 + i * 7) % 19 - 9) / 10.0))
    val df = vectors(2000, 8, seed = 42)
      .withColumn("native", native.nearest_centroid(col("v"), centMatrix(cents)))
      .withColumn("fold", foldAssign(col("v"), cents))
    assert(df.filter(col("native") =!= col("fold")).count() == 0)
    // and the assignment actually uses >1 cell (non-degenerate input)
    assert(df.select(countDistinct(col("native"))).head().getLong(0) > 1)
  }

  test("rounding-band tie goes to the LOWEST cell, like the fold") {
    // two centroids at identical distance from v: raw and rounded ties
    val cents = Seq(Array(1.0, 0.0), Array(-1.0, 0.0), Array(0.0, 5.0))
    val df = s.sql("SELECT array(0.0d, 0.0d) AS v")
      .withColumn("native", native.nearest_centroid(col("v"), centMatrix(cents)))
      .withColumn("fold", foldAssign(col("v"), cents))
    val r = df.head()
    assert(r.getAs[Int]("native") == 0)
    assert(r.getAs[Int]("fold") == 0)
  }

  test("rounding-band adversarial inputs: native agrees with the fold " +
    "when raw distances differ by less than the 6dp grid") {
    // centroids packed at 1e-7 spacing around 1.0: many (v, centroid)
    // distances land inside one rounding bucket, where the fold's
    // strict-< keeps the FIRST cell whose rounded distance hits the
    // bucket even when a later cell is raw-closer — the exact edge the
    // native pass re-derives via the monotone-rounding argument
    val cents = (0 until 9).map(j => Array(1.0 + (8 - j) * 1e-7))
    val df = vectors(500, 1, seed = 99)
      .withColumn("native", native.nearest_centroid(col("v"), centMatrix(cents)))
      .withColumn("fold", foldAssign(col("v"), cents))
    assert(df.filter(col("native") =!= col("fold")).count() == 0)
    // sanity: the packed centroids really do produce rounded ties for
    // some rows (the winner is not always the raw argmin)
    val rawArgmin = (v: Column) => {
      val centLits = cents.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("cell"), array(c.map(lit).toSeq: _*).as("cvec"))
      }
      aggregate(array(centLits: _*),
        struct(lit(Double.MaxValue).as("d"), lit(-1).as("cell")),
        (acc, cEl) => {
          val dist = aggregate(
            zip_with(v, cEl.getField("cvec"), (a, b) => (a - b) * (a - b)),
            lit(0.0), (x, y) => x + y)
          when(dist < acc.getField("d"),
            struct(dist.as("d"), cEl.getField("cell").as("cell")))
            .otherwise(acc)
        }).getField("cell")
    }
    val diverging = vectors(500, 1, seed = 99)
      .withColumn("rounded", native.nearest_centroid(col("v"), centMatrix(cents)))
      .withColumn("raw", rawArgmin(col("v")))
      .filter(col("rounded") =!= col("raw")).count()
    assert(diverging > 0, "fixture never exercised the rounding band")
  }

  test("ragged centroid never wins; all-ragged yields -1 (fold's initial acc)") {
    val mixed = Seq(Array(5.0, 5.0, 5.0), Array(0.0, 0.0))
    val df1 = s.sql("SELECT array(0.0d, 0.0d) AS v")
      .withColumn("native", native.nearest_centroid(col("v"), centMatrix(mixed)))
    assert(df1.head().getAs[Int]("native") == 1)
    val ragged = Seq(Array(1.0, 2.0, 3.0))
    val df2 = s.sql("SELECT array(0.0d, 0.0d) AS v")
      .withColumn("native", native.nearest_centroid(col("v"), centMatrix(ragged)))
      .withColumn("fold", foldAssign(col("v"), ragged))
    val r2 = df2.head()
    assert(r2.getAs[Int]("native") == -1 && r2.getAs[Int]("fold") == -1)
  }

  test("null vector yields null (null-safe wrapper)") {
    val cents = Seq(Array(0.0))
    val df = s.sql("SELECT CAST(NULL AS array<double>) AS v")
      .withColumn("native", native.nearest_centroid(col("v"), centMatrix(cents)))
    assert(df.head().isNullAt(1))
  }

  test("interpreted eval path agrees with codegen") {
    val cents = (0 until 5).map(j => Array.tabulate(4)(i => (j + i).toDouble))
    val df = vectors(200, 4, seed = 7)
    val cg = df.withColumn("c", native.nearest_centroid(col("v"), centMatrix(cents)))
      .select("id", "c").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // force the interpreted path by evaluating through a filter on a
    // non-codegen context: re-evaluate via RDD map over collected rows
    val rows = df.select("id", "v").collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val expect = cents.zipWithIndex.map { case (c, i) =>
        val raw = v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        (BigDecimal(java.math.BigDecimal.valueOf(raw)
          .setScale(6, java.math.RoundingMode.HALF_UP)), i)
      }.minBy(identity)._2
      assert(cg(r.getLong(0)) == expect, s"id=${r.getLong(0)}")
    }
  }
}
