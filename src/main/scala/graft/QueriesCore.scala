package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import graft.ops.Ckpt._
import graft.ops.HashKey._

/** A registered operator query: the Spark implementation plus (where
  * SQL-expressible) the DuckDB oracle the driver hash-compares against. */
final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

/** Core operator queries — one per SURVEY.md §2 row (reference semantics).
  * Determinism rules (FIXTURES.md): full-key ORDER BY everywhere, explicit
  * pivot lists, no order-dependent aggregates; aggregate aliases match
  * between Spark and oracle SQL exactly.
  */
object QueriesCore {
  import Tables.{pixelsSql, locationsSql}

  /** MSR descriptor hash for the flagship merge — computed with the
    * reference-faithful canonical-JSON SHA-1 (`queue/request_tools.py:37-45`). */
  val msrHash: String = keyOf(JObj(Seq(
    "dataset" -> JStr("nigeriaaims"),
    "filters" -> JObj(Seq("donors" -> JArr(Seq(JStr("AFDB"))))))))
  val msrH7: String = Naming.hash7(msrHash)

  // ---- §2.4 extract catalog -------------------------------------------
  private def exQ(method: String, sqlAgg: String): (String, Q) =
    s"extract_$method" -> Q(
      (s, d) => Extracts.extract(Tables.pixels(s, d), method).orderBy("asdf_id"),
      Some(s"""WITH pixels AS ($pixelsSql) SELECT asdf_id, $sqlAgg FROM pixels GROUP BY asdf_id ORDER BY asdf_id"""))

  private val extractQueries: Seq[(String, Q)] = Seq(
    exQ("mean", """avg(value) AS "mean""""),
    exQ("count", """count(value) AS "count""""),
    exQ("sum", """sum(value) AS "sum""""),
    exQ("min", """min(value) AS "min""""),
    exQ("max", """max(value) AS "max""""),
    exQ("weighted_mean", """sum(value*weight)/sum(weight) AS "weighted_mean""""),
    exQ("weighted_count", """sum(weight) AS "weighted_count""""),
    exQ("weighted_sum", """sum(value*weight) AS "weighted_sum""""),
    exQ("std", """stddev_samp(value) AS "std""""),
    exQ("var", """var_samp(value) AS "var""""),
    exQ("median", """quantile_cont(value, 0.5) AS "median""""),
    exQ("percentile", """quantile_cont(value, 0.95) AS "percentile""""),
    exQ("unique", """count(DISTINCT value) AS "unique""""),
    exQ("range", """max(value)-min(value) AS "range""""),
    // [EXT] robust/ratio statistics: DuckDB's native mad() is a genuinely
    // independent formulation of the two-stage median-of-deviations
    exQ("mad", """mad(value) AS "mad""""),
    exQ("geomean", """exp(avg(ln(value))) AS "geomean""""),
    exQ("harmonic", """count(value)/sum(1.0/value) AS "harmonic""""),
    // [EXT] sketch-guided EXACT holistic forms (ops/Extracts.scala
    // guidedPercentile): same values as the buffering exact aggregates —
    // the oracle IS the exact quantile/mad — with bounded state at scale
    // (SCALE.md --x100extracts: exact exponents 1.22-1.38 at 100x; these
    // replace the per-zone value buffer with a GK bracket + windowed
    // count aggregate). Since round 7 the catalog names extract_median /
    // extract_percentile / extract_mad above run this SAME guided engine
    // (the r6 verdict's top task: the registered default a user gets must
    // be the bounded-state plan); these _guided keys remain as aliases,
    // and the old buffering forms survive only as `*_buffer` test
    // baselines (ExtractsSpec parity fuzz).
    exQ("percentile_guided", """quantile_cont(value, 0.95) AS "percentile_guided""""),
    exQ("median_guided", """quantile_cont(value, 0.5) AS "median_guided""""),
    exQ("mad_guided", """mad(value) AS "mad_guided""""),
    "extract_categorical" -> Q(
      (s, d) => Extracts.extract(Tables.pixels(s, d), "categorical",
        classes = Seq("A", "N", "R")).orderBy("asdf_id"),
      Some(s"""WITH pixels AS ($pixelsSql)
        SELECT asdf_id,
          CAST(sum(CASE WHEN cls='A' THEN 1 ELSE 0 END) AS BIGINT) AS categorical_A,
          CAST(sum(CASE WHEN cls='N' THEN 1 ELSE 0 END) AS BIGINT) AS categorical_N,
          CAST(sum(CASE WHEN cls='R' THEN 1 ELSE 0 END) AS BIGINT) AS categorical_R
        FROM pixels GROUP BY asdf_id ORDER BY asdf_id""")),
    "extract_reliability" -> Q(
      (s, d) => {
        val px = Tables.pixels(s, d)
          .withColumn("realized", col("value") * (lit(1.0) - col("l_discount")))
        Extracts.extract(px, "reliability", value = "realized", weight = "value")
          .orderBy("asdf_id")
      },
      Some(s"""WITH pixels AS ($pixelsSql)
        SELECT asdf_id, sum(value*(1-l_discount)) AS "sum",
          sum(value) AS potential,
          sum(value*(1-l_discount))/sum(value) AS reliability
        FROM pixels GROUP BY asdf_id ORDER BY asdf_id""")),
    "extract_count_salted" -> Q(
      // A14/skew path: the salted two-phase aggregate must be value-
      // identical to the plain single-shuffle extract (count is integer-
      // exact, so the oracle is the same as extract_count's — the float
      // methods are equivalence-tested in ScaleSpec instead, where the
      // comparison can be tolerant of summation order)
      (s, d) => Skew.extractSalted(Tables.pixels(s, d), "count",
        saltCols = Seq("l_orderkey", "l_linenumber")).orderBy("asdf_id"),
      Some(s"""WITH pixels AS ($pixelsSql)
        SELECT asdf_id, CAST(count(value) AS BIGINT) AS "count"
        FROM pixels GROUP BY asdf_id ORDER BY asdf_id""")),
    "extract_mode" -> Q(
      (s, d) => Extracts.extract(Tables.pixels(s, d), "mode").orderBy("asdf_id"),
      Some(s"""WITH pixels AS ($pixelsSql),
        c AS (SELECT asdf_id, value, count(*) AS cnt FROM pixels GROUP BY 1,2)
        SELECT asdf_id, pick AS "mode" FROM (
          SELECT asdf_id, value AS pick,
            row_number() OVER (PARTITION BY asdf_id ORDER BY cnt DESC, value ASC) AS rn
          FROM c) t WHERE rn=1 ORDER BY asdf_id""")),
    "extract_majority" -> Q(
      (s, d) => Extracts.extract(Tables.pixels(s, d), "majority").orderBy("asdf_id"),
      Some(s"""WITH pixels AS ($pixelsSql),
        c AS (SELECT asdf_id, cls, count(*) AS cnt FROM pixels GROUP BY 1,2)
        SELECT asdf_id, pick AS majority FROM (
          SELECT asdf_id, cls AS pick,
            row_number() OVER (PARTITION BY asdf_id ORDER BY cnt DESC, cls ASC) AS rn
          FROM c) t WHERE rn=1 ORDER BY asdf_id""")),
    "extract_minority" -> Q(
      (s, d) => Extracts.extract(Tables.pixels(s, d), "minority").orderBy("asdf_id"),
      Some(s"""WITH pixels AS ($pixelsSql),
        c AS (SELECT asdf_id, cls, count(*) AS cnt FROM pixels GROUP BY 1,2)
        SELECT asdf_id, pick AS minority FROM (
          SELECT asdf_id, cls AS pick,
            row_number() OVER (PARTITION BY asdf_id ORDER BY cnt ASC, cls ASC) AS rn
          FROM c) t WHERE rn=1 ORDER BY asdf_id""")),
    "extract_percentile_sketch" -> Q(
      // The 100 TB percentile path (SCALE.md's holistic-aggregate swap,
      // made an operator), oracled by CONTRACT rather than by value: a
      // GK sketch's output can depend on partial-merge order, so the
      // query emits (a) the exact interpolated percentile — value-oracled
      // like extract_percentile — and (b) `within_bound`, Spark's own
      // measurement of the sketch's rank-error guarantee
      // |rank(approx) − p·n| ≤ n/accuracy, which the oracle asserts TRUE.
      // A sketch that broke its bound hash-mismatches the gate; the
      // sketch value itself never feeds the compare. The rank check is
      // one broadcast-back of the |zones|-row sketch frame over the
      // pixel stream — no extra fact shuffle.
      (s, d) => {
        val p = 0.95; val acc = 1000
        val px = Tables.pixels(s, d)
        // ONE aggregate provides the sketch value AND the exact row
        // count (r17: the count previously ran as its own corpus pass —
        // five scans where four carry the same information). The frame
        // is |zones| rows referenced twice (exact attach + rank-check
        // broadcast): lazy small checkpoint, or each reference re-runs
        // the sketch pass.
        val sk = px.groupBy(col("asdf_id"))
          .agg(percentile_approx(col("value"), lit(p), lit(acc)).as("approx"),
            count(lit(1)).as("n"))
          .smallCheckpointLazy()
        // the exact side rides the guided selection (same values as the
        // buffering percentile, bounded state) so the CONTRACT query
        // itself scales — measured 81.9 s at 100x when this side buffered
        val exact = Extracts.joinOnZone(
            sk.select(col("asdf_id"), col("n")),
            Extracts.guidedQuantiles(
              px.select(col("asdf_id"), col("value")), Seq(p), Seq("pg")),
            "asdf_id")
          .select(col("asdf_id"), col("n"), round(col("pg"), 6).as("p95_r"))
        val ranks = px.join(
            broadcast(sk.select(col("asdf_id"), col("approx"))), "asdf_id")
          .groupBy(col("asdf_id"))
          .agg(sum(when(col("value") <= col("approx"), 1L).otherwise(0L)).as("cnt_le"),
            sum(when(col("value") < col("approx"), 1L).otherwise(0L)).as("cnt_lt"))
        exact.join(ranks, "asdf_id")
          .select(col("asdf_id"), col("n"), col("p95_r"),
            (col("cnt_le") >= floor(lit(p) * col("n") - col("n") / lit(acc.toDouble)) &&
              col("cnt_lt") <= ceil(lit(p) * col("n") + col("n") / lit(acc.toDouble)))
              .as("within_bound"))
          .orderBy("asdf_id")
      },
      Some(s"""WITH pixels AS ($pixelsSql)
        SELECT asdf_id, CAST(count(*) AS BIGINT) AS n,
          round(quantile_cont(value, 0.95), 6) AS p95_r,
          TRUE AS within_bound
        FROM pixels GROUP BY asdf_id ORDER BY asdf_id""")),
    "extract_unique_sketch" -> Q(
      // The 100 TB distinct count (HyperLogLog++), contract-oracled like
      // extract_percentile_sketch: the exact distinct count is
      // value-oracled, and `within_bound` — Spark's own check that the
      // HLL estimate sits inside the 3·rsd error band — is asserted TRUE
      // by the oracle. The estimate is deterministic (register-wise max
      // merge is order-independent) but not DuckDB-reproducible, so the
      // CONTRACT is what's pinned, never the estimate value.
      (s, d) => {
        val rsd = 0.05
        val px = Tables.pixels(s, d)
        val sk = Extracts.extract(px, "unique_sketch", rsd = rsd)
          .withColumnRenamed("unique_sketch", "approx")
        val exact = px.groupBy(col("asdf_id"))
          .agg(count_distinct(col("value")).as("unique"))
        exact.join(sk, "asdf_id")
          .select(col("asdf_id"), col("unique"),
            (abs(col("approx") - col("unique")) <= lit(3 * rsd) * col("unique"))
              .as("within_bound"))
          .orderBy("asdf_id")
      },
      Some(s"""WITH pixels AS ($pixelsSql)
        SELECT asdf_id, CAST(count(DISTINCT value) AS BIGINT) AS "unique",
          TRUE AS within_bound
        FROM pixels GROUP BY asdf_id ORDER BY asdf_id""")))

  // ---- §2.3 joins ------------------------------------------------------
  private val joinQueries: Seq[(String, Q)] = Seq(
    "zone_join" -> Q(
      (s, d) => Tables.pixels(s, d)
        .select(col("asdf_id"), col("l_orderkey"), col("l_linenumber"), col("value"))
        // total order over the output: an amplified corpus duplicates the
        // (orderkey, linenumber) key across zone copies (see scan_csv)
        .orderBy("l_orderkey", "l_linenumber", "asdf_id", "value"),
      Some(s"""WITH pixels AS ($pixelsSql)
        SELECT asdf_id, l_orderkey, l_linenumber, value FROM pixels
        ORDER BY l_orderkey, l_linenumber, asdf_id, value""")),
    "unpivot_wide" -> Q(
      // Wide→long melt (X51): the inverse of the merge/naming grammar —
      // a wide per-zone extract frame unpivoted to (zone, field, value)
      // rows, the shape a charting/indicator feed consumes. Spark's
      // native `unpivot` plans as Expand: a map-side row multiplication
      // with NO shuffle (the only exchanges are the upstream aggregate
      // and the deterministic output sort). The oracle is an independent
      // UNION ALL formulation, so the melt semantics are pinned, not the
      // construction.
      (s, d) => {
        val wide = Tables.pixels(s, d).groupBy(col("asdf_id")).agg(
          avg(col("value")).as("mean"), sum(col("value")).as("sum"),
          max(col("value")).as("max"))
        wide.unpivot(Array(col("asdf_id")),
            Array(col("mean"), col("sum"), col("max")), "field", "value")
          .orderBy("asdf_id", "field")
      },
      Some(s"""WITH pixels AS ($pixelsSql),
          w AS (SELECT asdf_id, avg(value) AS mean, sum(value) AS sum,
                max(value) AS max FROM pixels GROUP BY asdf_id)
        SELECT asdf_id, 'mean' AS field, mean AS value FROM w
        UNION ALL SELECT asdf_id, 'sum', sum FROM w
        UNION ALL SELECT asdf_id, 'max', max FROM w
        ORDER BY asdf_id, field""")),
    "merge_wide" -> Q(
      (s, d) => {
        val px = Tables.pixels(s, d)
        val e1 = Extracts.extract(px.filter(col("temporal") === 1995), "mean")
          .select(col("asdf_id"), col("mean").as(Naming.col("udel_precip_v401", "1995", "mean")))
        val e2 = Extracts.extract(px.filter(col("temporal") === 1996), "sum")
          .select(col("asdf_id"), col("sum").as(Naming.col("udel_precip_v401", "1996", "sum")))
        val rel = Extracts.extract(
            px.withColumn("realized", col("value") * (lit(1.0) - col("l_discount"))),
            "reliability", value = "realized", weight = "value")
          .select(col("asdf_id"),
            col("sum").as(Naming.col("nigeriaaims", msrH7, "sum")),
            col("potential").as(Naming.col("nigeriaaims", msrH7, "potential")),
            col("reliability").as(Naming.col("nigeriaaims", msrH7, "reliability")))
        val base = Tables.nation(s, d)
          .select(col("n_nationkey").as("asdf_id"), col("n_name"))
        Merge.wide(base, Seq(e1, e2, rel)).orderBy("asdf_id")
      },
      Some(s"""WITH pixels AS ($pixelsSql),
        e1 AS (SELECT asdf_id, avg(value) AS v FROM pixels WHERE temporal=1995 GROUP BY asdf_id),
        e2 AS (SELECT asdf_id, sum(value) AS v FROM pixels WHERE temporal=1996 GROUP BY asdf_id),
        e3 AS (SELECT asdf_id, sum(value*(1-l_discount)) AS s, sum(value) AS p,
                      sum(value*(1-l_discount))/sum(value) AS r
               FROM pixels GROUP BY asdf_id)
        SELECT n_nationkey AS asdf_id,
          e1.v AS "udel_precip_v401__1995__mean",
          e2.v AS "udel_precip_v401__1996__sum",
          e3.s AS "nigeriaaims__${msrH7}__sum",
          e3.p AS "nigeriaaims__${msrH7}__potential",
          e3.r AS "nigeriaaims__${msrH7}__reliability",
          n_name
        FROM nation
        LEFT JOIN e1 ON n_nationkey = e1.asdf_id
        LEFT JOIN e2 ON n_nationkey = e2.asdf_id
        LEFT JOIN e3 ON n_nationkey = e3.asdf_id
        ORDER BY asdf_id""")),
    "doc_overview" -> Q(
      // the documentation "overview" derivation (S7 data part,
      // `queue/documentation_tool.py:203-339`): per dataset, the desc-sorted
      // temporal list rendered as a string (O4+F13), file count, and the
      // newest column name via the grammar (F8)
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("dataset"), year(col("l_shipdate")).as("yr"))
        .groupBy(col("dataset"))
        .agg(
          countDistinct(col("yr")).as("n_files"),
          array_join(reverse(array_sort(collect_set(col("yr")))), ", ").as("temporal_list"),
          concat_ws(".", col("dataset"), max(col("yr")), lit("mean")).as("newest_col"))
        .orderBy("dataset"),
      Some("""WITH y AS (SELECT DISTINCT p_brand AS dataset, year(l_shipdate) AS yr
          FROM lineitem JOIN part ON l_partkey = p_partkey)
        SELECT dataset, count(*) AS n_files,
          string_agg(CAST(yr AS VARCHAR), ', ' ORDER BY yr DESC) AS temporal_list,
          concat_ws('.', dataset, CAST(max(yr) AS VARCHAR), 'mean') AS newest_col
        FROM y GROUP BY dataset ORDER BY dataset""")),
    "doc_meta" -> Q(
      (s, d) => {
        val sel = Tables.lineitem(s, d).select(col("l_partkey").as("pk")).distinct()
        val j = sel.join(broadcast(Tables.part(s, d)), col("pk") === col("p_partkey"), "left")
          .select(col("pk"), col("p_name"), col("p_brand"), col("p_type"))
        import org.apache.spark.sql.expressions.Window
        j.withColumn("rn", row_number().over(
            Window.partitionBy(col("p_brand")).orderBy(col("pk"))))
          .filter(col("rn") === 1).drop("rn")
          .select(col("p_brand"), col("pk"), col("p_name"), col("p_type"))
          .orderBy("p_brand")
      },
      Some("""WITH sel AS (SELECT DISTINCT l_partkey AS pk FROM lineitem),
        j AS (SELECT pk, p_name, p_brand, p_type FROM sel LEFT JOIN part ON pk = p_partkey)
        SELECT p_brand, pk, p_name, p_type FROM (
          SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY pk) AS rn FROM j) t
        WHERE rn=1 ORDER BY p_brand""")),
    "cache_probe" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val items = li.filter(year(col("l_shipdate")) === 1997)
          .select(col("l_partkey").as("item")).distinct()
        val done = li.filter(year(col("l_shipdate")) <= 1996)
          .select(col("l_partkey").as("done_item")).distinct()
        items.join(done, col("item") === col("done_item"), "left")
          .select(col("item"),
            when(col("done_item").isNotNull, lit(1)).otherwise(lit(0)).as("status"))
          .orderBy("item")
      },
      Some("""WITH items AS (SELECT DISTINCT l_partkey AS item FROM lineitem WHERE year(l_shipdate)=1997),
        done AS (SELECT DISTINCT l_partkey AS done_item FROM lineitem WHERE year(l_shipdate)<=1996)
        SELECT item, CASE WHEN done_item IS NOT NULL THEN 1 ELSE 0 END AS status
        FROM items LEFT JOIN done ON item = done_item ORDER BY item""")),
    "cache_misses" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val items = li.filter(year(col("l_shipdate")) === 1997)
          .select(col("l_partkey").as("item")).distinct()
        val done = li.filter(year(col("l_shipdate")) <= 1996)
          .select(col("l_partkey").as("item")).distinct()
        items.join(done, Seq("item"), "left_anti")
          .join(broadcast(Tables.part(s, d)), col("item") === col("p_partkey"))
          .groupBy(col("p_brand")).agg(count(lit(1)).as("missing"))
          .orderBy("p_brand")
      },
      Some("""WITH items AS (SELECT DISTINCT l_partkey AS item FROM lineitem WHERE year(l_shipdate)=1997),
        done AS (SELECT DISTINCT l_partkey AS item FROM lineitem WHERE year(l_shipdate)<=1996)
        SELECT p_brand, count(*) AS missing FROM items JOIN part ON item = p_partkey
        WHERE item NOT IN (SELECT item FROM done)
        GROUP BY p_brand ORDER BY p_brand"""))
  )

  // ---- §2.4 A12 msr surface -------------------------------------------
  private val msrQueries: Seq[(String, Q)] = Seq(
    "msr_surface" -> Q(
      (s, d) => {
        val locs = Msr.applyFilters(Tables.locations(s, d), Map(
          "donor" -> Seq("1-URGENT", "2-HIGH"), "status" -> Seq("O", "F"),
          "ignored" -> Seq("All")))
        Msr.surface(locs).orderBy("cell_id")
      },
      Some(s"""WITH locs AS (SELECT * FROM ($locationsSql) l
          WHERE donor IN ('1-URGENT','2-HIGH') AND status IN ('O','F')),
        a AS (SELECT cell_id, amount,
                amount / (count(*) OVER (PARTITION BY project_id)) AS alloc
              FROM locs)
        SELECT cell_id, sum(alloc) AS "sum", sum(amount) AS potential,
          sum(alloc)/sum(amount) AS reliability
        FROM a GROUP BY cell_id ORDER BY cell_id""")))

  // ---- §2.2 filters ----------------------------------------------------
  private val filterQueries: Seq[(String, Q)] = Seq(
    "filter_in" -> Q(
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")
          && col("o_orderstatus").isin("O", "F"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        AND o_orderstatus IN ('O','F') ORDER BY o_orderkey""")),
    "filter_range" -> Q(
      (s, d) => Tables.orders(s, d)
        .filter(col("o_totalprice").cast("double").between(50000.0, 150000.0))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        WHERE CAST(o_totalprice AS DOUBLE) BETWEEN 50000.0 AND 150000.0
        ORDER BY o_orderkey""")),
    "filter_year_overlap" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("okey"))
        .agg(min(year(col("l_shipdate"))).as("start_year"),
          max(year(col("l_shipdate"))).as("end_year"))
        .filter(col("start_year") <= 1997 && col("end_year") >= 1997)
        .orderBy("okey"),
      Some("""WITH spans AS (SELECT l_orderkey AS okey,
          CAST(min(year(l_shipdate)) AS INT) AS start_year,
          CAST(max(year(l_shipdate)) AS INT) AS end_year
        FROM lineitem GROUP BY 1)
        SELECT okey, start_year, end_year FROM spans
        WHERE start_year <= 1997 AND end_year >= 1997 ORDER BY okey""")),
    "filter_normalize" -> Q(
      (s, d) => {
        // P1 (`queue/request_tools.py:362-369`): entries whose value list
        // contains 'All'/'None'/null are dropped. Same literal fixture on
        // both sides; the DuckDB oracle runs the identical map algebra
        // (map_keys/map_values parallel unnest + list_filter).
        import s.implicits._
        val reqs = Seq(
          (1L, Map("donors" -> Seq("AFDB", "World Bank"), "sectors" -> Seq("All"))),
          (2L, Map("donors" -> Seq("None"), "years" -> Seq("1998", "1999"))),
          (3L, Map("status" -> Seq(null.asInstanceOf[String]), "donors" -> Seq("AFDB")))
        ).toDF("request_id", "filters")
        reqs.withColumn("filters",
            map_filter(col("filters"), (_, v) =>
              !exists(v, x => x.isNull || x.isin("All", "None"))))
          .select(col("request_id"), explode(col("filters")).as(Seq("field", "vals")))
          .select(col("request_id"), col("field"), array_join(col("vals"), "|").as("vals"))
          .orderBy("request_id", "field")
      },
      Some("""WITH reqs(request_id, filters) AS (VALUES
          (CAST(1 AS BIGINT), MAP(['donors','sectors'], [['AFDB','World Bank'],['All']])),
          (CAST(2 AS BIGINT), MAP(['donors','years'], [['None'],['1998','1999']])),
          (CAST(3 AS BIGINT), MAP(['status','donors'], [[NULL],['AFDB']]))),
        kv AS (SELECT request_id, unnest(map_keys(filters)) AS field,
                 unnest(map_values(filters)) AS vals FROM reqs)
        SELECT request_id, field, array_to_string(vals, '|') AS vals
        FROM kv
        WHERE len(list_filter(vals, x -> x IS NULL OR x IN ('All','None'))) = 0
        ORDER BY request_id, field""")),
    "validate_request" -> Q(
      (s, d) => {
        // P6 (`queue/processing.py:144-147`): reject requests with no
        // boundary or no data selections. Nested array-of-struct — non-SQL.
        // selections built from pre-aggregated lineitem (collect_list over
        // ints after a map-side-combinable count — far cheaper than
        // collecting structs of the raw fact rows)
        val sel = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(collect_list(col("l_linenumber")).as("release_data"))
        val reqs = Tables.orders(s, d)
          .join(sel, col("o_orderkey") === col("l_orderkey"))
          .withColumn("boundary",
            when(col("o_orderstatus") === "F", lit(null)).otherwise(lit("nga_adm0_gadm28")))
          .withColumn("raster_data", expr("array()"))
        reqs.filter(col("boundary").isNotNull
            && (size(col("release_data")) > 0 || size(col("raster_data")) > 0))
          .select(col("o_orderkey"), col("boundary"), size(col("release_data")).as("n_selections"))
          .orderBy("o_orderkey")
      },
      // the validation predicate collapses relationally: boundary is null
      // iff o_orderstatus = 'F'; release_data nonempty iff the order has
      // lineitems (inner join); raster_data is always empty
      Some("""WITH sel AS (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey)
        SELECT o_orderkey, 'nga_adm0_gadm28' AS boundary, CAST(n AS INT) AS n_selections
        FROM orders JOIN sel ON o_orderkey = l_orderkey
        WHERE o_orderstatus != 'F'
        ORDER BY o_orderkey""")))

  // ---- §2.1/§2.6/§2.8 queue + state -----------------------------------
  /** Orders-as-queue mapping (FIXTURES.md): numeric priority derived from
    * `o_orderpriority` ("1-URGENT" → 5 … "5-LOW" → 1, higher = sooner). */
  private val prioritySql = "6 - CAST(substring(o_orderpriority,1,1) AS INT)"
  private def queueDf(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey").as("id"),
      col("o_orderstatus").as("status"),
      (lit(6) - substring(col("o_orderpriority"), 1, 1).cast("int")).as("priority"),
      unix_timestamp(col("o_orderdate")).as("submit_time"))
  private val queueSql =
    s"""SELECT o_orderkey AS id, o_orderstatus AS status,
       | $prioritySql AS priority,
       | CAST(floor(epoch(o_orderdate)) AS BIGINT) AS submit_time FROM orders""".stripMargin.replace("\n", "")

  private val queueQueries: Seq[(String, Q)] = Seq(
    "queue_poll" -> Q(
      (s, d) => Queue.poll(queueDf(s, d), "O", 50),
      Some(s"""WITH q AS ($queueSql)
        SELECT * FROM q WHERE status='O'
        ORDER BY priority DESC, submit_time ASC, id ASC LIMIT 50""")),
    "queue_poll_two_phase" -> Q(
      (s, d) => Queue.pollTwoPhase(queueDf(s, d), "P", "O", 100),
      Some(s"""WITH q AS ($queueSql),
        t AS (SELECT *, CASE WHEN status='P' THEN 0 ELSE 1 END AS phase
              FROM q WHERE status IN ('P','O'))
        SELECT id, status, priority, submit_time, phase FROM t
        ORDER BY phase ASC, priority DESC, submit_time ASC, id ASC LIMIT 100""")),
    "queue_rank" -> Q(
      (s, d) => Queue.rank(queueDf(s, d)).select(col("id"), col("rank")).orderBy("id"),
      Some(s"""WITH q AS ($queueSql)
        SELECT id, CAST(row_number() OVER (ORDER BY priority DESC, submit_time ASC, id ASC) AS INT) AS rank
        FROM q ORDER BY id""")),
    "point_lookup" -> Q(
      (s, d) => Tables.orders(s, d).filter(col("o_orderkey") === 42).limit(1),
      Some("SELECT * FROM orders WHERE o_orderkey = 42 LIMIT 1")),
    "status_transition" -> Q(
      (s, d) => {
        val q = queueDf(s, d).withColumn("status",
          when(col("status") === "O", 0).when(col("status") === "P", 2).otherwise(1))
        Queue.transition(q, 42, 2, 1700000000L)
          .select(col("id"), col("status"), col("process_time")).orderBy("id")
      },
      Some(s"""WITH q AS ($queueSql)
        SELECT id,
          CASE WHEN id=42 THEN 2
               ELSE (CASE WHEN status='O' THEN 0 WHEN status='P' THEN 2 ELSE 1 END) END AS status,
          CASE WHEN id=42 THEN CAST(1700000000 AS BIGINT) ELSE CAST(NULL AS BIGINT) END AS process_time
        FROM q ORDER BY id""")),
    "queue_upsert" -> Q(
      // Q2 reference semantics (`queue/extract_check.py:170-176`,
      // `queue/msr_check.py:117-123`): matched rows are $set the incoming
      // details {classification, priority, update_time} while status and
      // submit_time keep their existing state; unmatched incoming rows
      // insert whole. The oracle below encodes the MongoDB update/insert
      // branches directly (left-join coalesce = $set; anti-join = insert).
      (s, d) => {
        val q = queueDf(s, d)
        val existing = q.filter(col("id") % 3 === 0)
          .select(col("id"), lit(1).as("status"), col("submit_time"),
            col("priority"), lit("old").as("classification"),
            lit(100L).as("update_time"))
        val incoming = q.filter(col("id") % 2 === 0)
          .select(col("id"), lit(0).as("status"),
            lit(1700000000L).as("submit_time"),
            (col("priority") + 1).as("priority"),
            lit("det").as("classification"),
            lit(1700000000L).as("update_time"))
        Queue.upsert(existing, incoming, Seq("id")).orderBy("id")
      },
      Some(s"""WITH q AS ($queueSql),
        e AS (SELECT id, 1 AS status, submit_time, priority,
                'old' AS classification, CAST(100 AS BIGINT) AS update_time
              FROM q WHERE id % 3 = 0),
        i AS (SELECT id, 0 AS status, CAST(1700000000 AS BIGINT) AS submit_time,
                priority + 1 AS priority, 'det' AS classification,
                CAST(1700000000 AS BIGINT) AS update_time
              FROM q WHERE id % 2 = 0)
        SELECT e.id, e.status, e.submit_time,
          coalesce(i.priority, e.priority) AS priority,
          coalesce(i.classification, e.classification) AS classification,
          coalesce(i.update_time, e.update_time) AS update_time
        FROM e LEFT JOIN i ON e.id = i.id
        UNION ALL
        SELECT id, status, submit_time, priority, classification, update_time
        FROM i WHERE id NOT IN (SELECT id FROM e)
        ORDER BY id""")),
    "email_content" -> Q(
      // S8 notification-content derivation (`queue/request_tools.py:254-272`):
      // subject "AidData geo(query) - Request {rid[:7]}.. Received" plus the
      // status / requests URLs. SMTP transport is out of scope (SURVEY §2.1);
      // the derivable content is pure F2/F8 string work. Request id = hex
      // digest of the canonical-JSON request descriptor (the reference's
      // Mongo ObjectId stand-in); server host is a fixed config literal.
      // no broadcast hint: customer is user-scale (grows with the tenant
      // base, unlike the part/supplier dimensions) — the join key is an
      // equi-key, so AQE broadcasts while small and shuffles at scale
      (s, d) => Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .withColumn("rid",
          sha2(canonicalJson(struct(col("o_orderkey").cast("string").as("id"))), 256))
        .withColumn("mail_to",
          concat(regexp_replace(lower(col("c_name")), "[^a-z0-9]+", "."),
            lit("@example.org")))
        .select(col("o_orderkey"), col("mail_to"),
          concat(lit("AidData geo(query) - Request "),
            substring(col("rid"), 1, 7), lit(".. Received")).as("subject"),
          concat(lit("http://download.example.org/query/#!/status/"),
            col("rid")).as("status_url"),
          concat(lit("http://download.example.org/query/#!/requests/"),
            col("mail_to")).as("requests_url"))
        .orderBy("o_orderkey"),
      Some("""WITH j AS (SELECT o_orderkey,
          regexp_replace(lower(c_name), '[^a-z0-9]+', '.', 'g') || '@example.org' AS mail_to,
          sha256('{"id": "' || o_orderkey || '"}') AS rid
        FROM orders JOIN customer ON o_custkey = c_custkey)
        SELECT o_orderkey, mail_to,
          'AidData geo(query) - Request ' || substring(rid, 1, 7) || '.. Received' AS subject,
          'http://download.example.org/query/#!/status/' || rid AS status_url,
          'http://download.example.org/query/#!/requests/' || mail_to AS requests_url
        FROM j ORDER BY o_orderkey""")),
    "email_content_completed" -> Q(
      // S8b completion-notification derivation (`queue/request_tools.py:
      // 281-322`, notify_completed): the lifecycle's SECOND email, sent once
      // a request finishes. Derivable parts: the status-conditional subject
      // "Request {rid[:7]}.. Completed" and the direct, always-available
      // zip-download URL "http://{server}/data/geoquery_results/{id}/{id}
      // .zip" — survey link / citation block are fixed boilerplate, SMTP
      // transport out of scope (SURVEY §2.1). The F12 `when` conditional
      // dispatches the subject on completion status (finished 'F' =>
      // Completed, in-flight => Received), so one scan derives the whole
      // two-email lifecycle; zip_url exists only for completed requests
      // (the reference only ever renders it from notify_completed).
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("O", "F"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .withColumn("rid",
          sha2(canonicalJson(struct(col("o_orderkey").cast("string").as("id"))), 256))
        .withColumn("mail_to",
          concat(regexp_replace(lower(col("c_name")), "[^a-z0-9]+", "."),
            lit("@example.org")))
        .select(col("o_orderkey"), col("mail_to"),
          concat(lit("AidData geo(query) - Request "),
            substring(col("rid"), 1, 7),
            when(col("o_orderstatus") === "F", lit(".. Completed"))
              .otherwise(lit(".. Received"))).as("subject"),
          concat(lit("http://download.example.org/query/#!/status/"),
            col("rid")).as("status_url"),
          when(col("o_orderstatus") === "F",
            concat(lit("http://download.example.org/data/geoquery_results/"),
              col("rid"), lit("/"), col("rid"), lit(".zip"))).as("zip_url"),
          concat(lit("http://download.example.org/query/#!/requests/"),
            col("mail_to")).as("requests_url"))
        .orderBy("o_orderkey"),
      Some("""WITH j AS (SELECT o_orderkey, o_orderstatus,
          regexp_replace(lower(c_name), '[^a-z0-9]+', '.', 'g') || '@example.org' AS mail_to,
          sha256('{"id": "' || o_orderkey || '"}') AS rid
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus IN ('O','F'))
        SELECT o_orderkey, mail_to,
          'AidData geo(query) - Request ' || substring(rid, 1, 7) ||
            (CASE WHEN o_orderstatus = 'F' THEN '.. Completed' ELSE '.. Received' END) AS subject,
          'http://download.example.org/query/#!/status/' || rid AS status_url,
          CASE WHEN o_orderstatus = 'F'
            THEN 'http://download.example.org/data/geoquery_results/' || rid || '/' || rid || '.zip'
          END AS zip_url,
          'http://download.example.org/query/#!/requests/' || mail_to AS requests_url
        FROM j ORDER BY o_orderkey""")),
    "doc_timeline" -> Q(
      // S7 processing-timeline derivation (`queue/documentation_tool.py:
      // 145-167`): per request, the ordered stage table [(name, rendered
      // time)] — stages 0-2 render their stored stamp with the `time_str`
      // zero/invalid → "---" rule (`documentation_tool.py:55-64`); stage 3
      // ("complete") always renders the doc-build instant (`int(time.
      // time())` in the reference; a fixed instant here for determinism).
      // Stage stamps derive from the queue frame: prep exists once the
      // request left status new ('O'), process once finished ('F'), else 0
      // (unstamped). One explode per request — 4 rows each, no shuffle
      // until the final presentation sort.
      (s, d) => {
        val now = 1700000000L
        val q = queueDf(s, d)
          .withColumn("prep_t", when(col("status") === "O", lit(0L))
            .otherwise(col("submit_time") + 120))
          .withColumn("process_t", when(col("status") === "F",
            col("submit_time") + 240).otherwise(lit(0L)))
        q.select(col("id"), posexplode(array(
            struct(lit("submit").as("stage"), col("submit_time").as("t")),
            struct(lit("prep").as("stage"), col("prep_t").as("t")),
            struct(lit("process").as("stage"), col("process_t").as("t")),
            struct(lit("complete").as("stage"), lit(now).as("t")))))
          .select(col("id"), col("pos").cast("int").as("pos"),
            col("col.stage").as("stage"),
            when(col("col.t") === 0, lit("---"))
              .otherwise(concat(
                from_unixtime(col("col.t"), "yyyy-MM-dd HH:mm:ss"),
                lit(" (UTC)"))).as("rendered"))
          .orderBy("id", "pos")
      },
      Some(s"""WITH q AS ($queueSql),
        s AS (SELECT id, submit_time,
          CASE WHEN status='O' THEN 0 ELSE submit_time + 120 END AS prep_t,
          CASE WHEN status='F' THEN submit_time + 240 ELSE 0 END AS process_t
          FROM q),
        tl AS (
          SELECT id, 0 AS pos, 'submit' AS stage, submit_time AS t FROM s
          UNION ALL SELECT id, 1, 'prep', prep_t FROM s
          UNION ALL SELECT id, 2, 'process', process_t FROM s
          UNION ALL SELECT id, 3, 'complete', 1700000000 FROM s)
        SELECT id, CAST(pos AS INT) AS pos, stage,
          CASE WHEN t=0 THEN '---'
            ELSE strftime(make_timestamp(CAST(t AS BIGINT)*1000000),
                   '%Y-%m-%d %H:%M:%S') || ' (UTC)' END AS rendered
        FROM tl ORDER BY id, pos""")))

  // ---- §2.6 sorts / dedup / union -------------------------------------
  private val sortQueries: Seq[(String, Q)] = Seq(
    "temporal_sort" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("dataset"),
          concat_ws("_", col("p_brand"), year(col("l_shipdate"))).as("fname"))
        .select(col("dataset"),
          element_at(split(col("fname"), "_"), -1).cast("int").as("yr"))
        .distinct()
        .orderBy(col("dataset").asc, col("yr").desc),
      Some("""SELECT DISTINCT p_brand AS dataset,
          CAST((string_split(p_brand || '_' || CAST(year(l_shipdate) AS VARCHAR), '_'))[-1] AS INT) AS yr
        FROM lineitem JOIN part ON l_partkey = p_partkey
        ORDER BY dataset ASC, yr DESC""")),
    "dedup_datasets" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        Tables.part(s, d)
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("p_brand")).orderBy(col("p_partkey"))))
          .filter(col("rn") === 1)
          .select(col("p_brand"), col("p_partkey"), col("p_name"))
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, p_partkey, p_name FROM (
          SELECT p_brand, p_partkey, p_name,
            row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rn
          FROM part) t WHERE rn=1 ORDER BY p_brand""")),
    "union_selections" -> Q(
      (s, d) => {
        val release = Tables.orders(s, d).select(
          lit("release").as("kind"), col("o_orderkey").as("key"),
          col("o_totalprice").as("amount"))
        val raster = Tables.lineitem(s, d).select(
          lit("raster").as("kind"), col("l_orderkey").as("key"),
          col("l_linenumber").as("file"))
        release.unionByName(raster, allowMissingColumns = true)
          .orderBy(col("kind").asc, col("key").asc, col("file").asc_nulls_first)
      },
      Some("""SELECT * FROM (
          SELECT 'release' AS kind, o_orderkey AS key, o_totalprice AS amount,
            CAST(NULL AS INT) AS file FROM orders
          UNION ALL
          SELECT 'raster', l_orderkey, CAST(NULL AS DOUBLE), l_linenumber FROM lineitem) t
        ORDER BY kind ASC, key ASC, file ASC NULLS FIRST""")),
    "explode_selections" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_linenumber"))).as("files"))
        .withColumn("file", explode(col("files")))
        .withColumn("method", explode(array(lit("max"), lit("mean"))))
        .select(col("l_orderkey"), col("file"), col("method"))
        .orderBy("l_orderkey", "file", "method"),
      Some("""SELECT l_orderkey, l_linenumber AS file, m.method
        FROM lineitem CROSS JOIN (VALUES ('max'),('mean')) m(method)
        ORDER BY l_orderkey, file, method""")))

  // ---- §2.7 scalar functions ------------------------------------------
  private val fnQueries: Seq[(String, Q)] = Seq(
    "hash_key" -> Q(
      (s, d) => Tables.orders(s, d)
        .withColumn("canon", canonicalJson(struct(
          col("o_orderpriority").as("priority"), col("o_orderstatus").as("status"))))
        .select(col("o_orderkey"), col("canon"), sha2(col("canon"), 256).as("h"))
        .orderBy("o_orderkey"),
      Some("""WITH c AS (SELECT o_orderkey,
          '{"priority": "' || o_orderpriority || '", "status": "' || o_orderstatus || '"}' AS canon
        FROM orders)
        SELECT o_orderkey, canon, sha256(canon) AS h FROM c ORDER BY o_orderkey""")),
    "hash_prefix" -> Q(
      (s, d) => Tables.orders(s, d)
        .withColumn("canon", canonicalJson(struct(
          col("o_orderpriority").as("priority"), col("o_orderstatus").as("status"))))
        .select(col("o_orderkey"), substring(sha2(col("canon"), 256), 1, 7).as("h7"))
        .orderBy("o_orderkey"),
      Some("""WITH c AS (SELECT o_orderkey,
          '{"priority": "' || o_orderpriority || '", "status": "' || o_orderstatus || '"}' AS canon
        FROM orders)
        SELECT o_orderkey, substring(sha256(canon),1,7) AS h7 FROM c ORDER BY o_orderkey""")),
    "fn_string" -> Q(
      (s, d) => Tables.part(s, d).selectExpr(
        "p_partkey",
        "startswith(p_name, 'worldbank') AS is_wb",
        "endswith(p_type, 'd') AS ends_d",
        "element_at(split(p_type, ' '), -1) AS last_word",
        "substring(p_name, 6) AS sliced",
        "replace(p_type, ' ', '_') AS replaced")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
          starts_with(p_name, 'worldbank') AS is_wb,
          ends_with(p_type, 'd') AS ends_d,
          (string_split(p_type, ' '))[-1] AS last_word,
          substring(p_name, 6) AS sliced,
          replace(p_type, ' ', '_') AS replaced
        FROM part ORDER BY p_partkey""")),
    "fn_concat" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("dataset"), year(col("l_shipdate")).as("yr"))
        .distinct()
        .select(col("dataset"), col("yr"),
          concat_ws(".", col("dataset"), col("yr"), lit("mean")).as("colname"))
        .orderBy("dataset", "yr"),
      Some("""SELECT DISTINCT p_brand AS dataset, CAST(year(l_shipdate) AS INT) AS yr,
          concat_ws('.', p_brand, CAST(year(l_shipdate) AS VARCHAR), 'mean') AS colname
        FROM lineitem JOIN part ON l_partkey = p_partkey
        ORDER BY dataset, yr""")),
    "fn_time" -> Q(
      (s, d) => Tables.events(s, d)
        .withColumn("t", when(col("event_type") === "error", lit(0L))
          .otherwise(unix_timestamp(col("ts"))))
        .select(col("event_id"), col("t"),
          when(col("t") === 0, lit("---"))
            .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("disp"))
        .orderBy("event_id"),
      Some("""WITH e AS (SELECT event_id, ts, event_type,
          CASE WHEN event_type='error' THEN 0
               ELSE CAST(floor(epoch(ts)) AS BIGINT) END AS t FROM events)
        SELECT event_id, t,
          CASE WHEN t=0 THEN '---' ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS disp
        FROM e ORDER BY event_id""")),
    "fn_cond" -> Q(
      (s, d) => Tables.part(s, d)
        .withColumn("dsname", when(col("p_partkey") % 5 === 0,
          concat(lit("worldbank_"), col("p_name"))).otherwise(col("p_name")))
        .select(col("p_partkey"), col("dsname"),
          when(col("dsname").startsWith("worldbank"), lit("sum"))
            .otherwise(lit("reliability")).as("method"))
        .orderBy("p_partkey"),
      Some("""WITH t AS (SELECT p_partkey,
          CASE WHEN p_partkey % 5 = 0 THEN 'worldbank_' || p_name ELSE p_name END AS dsname
        FROM part)
        SELECT p_partkey, dsname,
          CASE WHEN starts_with(dsname, 'worldbank') THEN 'sum' ELSE 'reliability' END AS method
        FROM t ORDER BY p_partkey""")),
    "doc_render" -> Q(
      // F14 word-wrap + F17 html-ify. Test documents have no 80+-char words
      // or newlines, so the wrap input is stressed deterministically: the
      // first 120 chars with spaces collapsed form one long token that must
      // chunk at 80, followed by a normal tail.
      (s, d) => {
        val raw = concat_ws(" ",
          regexp_replace(expr("substring(text, 1, 120)"), " ", "_"),
          expr("substring(text, 1, 40)"))
        // wrap once, derive html from the wrapped column — the transform
        // pipeline is interpreted (higher-order functions don't codegen),
        // so evaluating it twice per row doubles the dominant cost
        Tables.documents(s, d)
          .select(col("doc_id"), Render.wordWrap(raw).as("wrapped"))
          .withColumn("html", Render.htmlify(col("wrapped")))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
          replace(substring(text, 1, 120), ' ', '_') || ' ' || substring(text, 1, 40) AS raw
        FROM documents),
        w AS (SELECT doc_id,
          array_to_string(list_transform(string_split(raw, ' '), w ->
            CASE WHEN length(w) > 80
              THEN array_to_string(list_transform(range(CAST(floor((length(w)-1)/80) AS INT) + 1),
                   i -> substring(w, CAST(i*80 + 1 AS INT), 80)), chr(10))
              ELSE w END), ' ') AS wrapped
        FROM t)
        SELECT doc_id, wrapped, replace(wrapped, chr(10), '<br/>') AS html
        FROM w ORDER BY doc_id""")),
    "fn_array" -> Q(
      (s, d) => Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ", ").as("segments"))
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey,
          array_to_string(list_sort(list(DISTINCT c_mktsegment)), ', ') AS segments
        FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")))

  // ---- §2.1 sources ----------------------------------------------------
  private val sourceQueries: Seq[(String, Q)] = Seq(
    "scan_csv" -> Q(
      (s, d) => {
        // Reference CSV semantics (S1, `queue/request_tools.py:645-646`):
        // quotechar `"`, only the empty string is null. Round-trip a
        // snapshot through CSV with those options and read it back.
        // tmp dir keyed by (pid, input path, CONTENT fingerprint of the
        // source table): two drivers — or two datasets sharing a basename
        // — must never overwrite each other's round-trip dir mid-read, and
        // a fixture regenerated at the same path must version the memo
        // rather than serve the previous dataset's CSV (same hazard class
        // the incremental_daily cache root guards against)
        // shared root derivation ([[Cache.contentRoot]] — also fixes the
        // single-file fixture case, where a raw listFiles() fingerprint
        // silently came up empty)
        val tmp = Cache.contentRoot(
          s"graft_csv_${ProcessHandle.current().pid()}", d, "lineitem")
        // the operator under test is the CSV SCAN semantics; the setup
        // write is memoized per (pid, dataset, content) — the snapshot is
        // a pure function of the input files, and rewriting ~60 MB of
        // CSV per bench pass measured host I/O contention (a 0.6 s query
        // spiked to 14 s on a contended pass), not the scan
        if (!new java.io.File(s"$tmp/_SUCCESS").exists()) {
          val snap = Tables.lineitem(s, d).select(
            col("l_orderkey"), col("l_linenumber"),
            when(col("l_returnflag") === "N", lit(null)).otherwise(col("l_returnflag")).as("flag"),
            col("l_quantity"))
          snap.write.mode("overwrite").option("header", "true").csv(tmp)
        }
        s.read
          .option("header", "true").option("quote", "\"").option("nullValue", "")
          .schema("l_orderkey LONG, l_linenumber INT, flag STRING, l_quantity DOUBLE")
          .csv(tmp)
          // total order over the OUTPUT columns: (orderkey, linenumber) is
          // a primary key on real data, but an amplified corpus duplicates
          // it — the determinism contract must not lean on key uniqueness
          .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
            col("flag").asc_nulls_first, col("l_quantity").asc)
      },
      Some("""SELECT l_orderkey, l_linenumber,
          CASE WHEN l_returnflag='N' THEN NULL ELSE l_returnflag END AS flag,
          l_quantity
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, flag NULLS FIRST, l_quantity""")),
    "scan_jsonl" -> Q(
      // [EXT] JSONL ingest (S1b) — the de-facto interchange format of
      // training-data pipelines. Round-trips the documents table through
      // Spark's JSON writer and reads it back with an explicit schema;
      // the oracle is the ORIGINAL table, so what's pinned is byte-exact
      // round-trip identity through the codec (string escaping, unicode,
      // nulls, 64-bit ids). Same memoized setup-write discipline as
      // scan_csv: the snapshot is a pure function of the input files
      // (content-fingerprinted root), so bench passes measure the SCAN,
      // not repeated setup I/O. A doc whose text survives
      // JSON-encode/decode differently on either side hash-mismatches.
      (s, d) => {
        val tmp = Cache.contentRoot(
          s"graft_jsonl_${ProcessHandle.current().pid()}", d, "documents")
        if (!new java.io.File(s"$tmp/_SUCCESS").exists()) {
          Tables.documents(s, d)
            .select(col("doc_id"), col("lang"), col("source"),
              col("n_chars"), col("text"))
            .write.mode("overwrite").json(tmp)
        }
        s.read
          .schema("doc_id LONG, lang STRING, source STRING, n_chars LONG, text STRING")
          .json(tmp)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, source, n_chars, text
        FROM documents ORDER BY doc_id""")))

  val all: Seq[(String, Q)] =
    extractQueries ++ joinQueries ++ msrQueries ++ filterQueries ++
      queueQueries ++ sortQueries ++ fnQueries ++ sourceQueries
}
