package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.{Canon, GraftQuery, QueryModule}
import graft.api.Canon.Oracle

/** Aggregation surface: distinct aggs, rollup/cube/grouping sets, HAVING,
  * stat aggregates, exact percentile, ordered string_agg (MySQL
  * `group_concat` semantics re-expressed). SURVEY.md §2B "Aggregations".
  * All money maths follows Canon (exact decimal pre-cast).
  */
object AggregateQueries extends QueryModule {
  import Canon._

  def queries: Seq[GraftQuery] = Seq(

    // COUNT(DISTINCT) + SUM(DISTINCT) (distinct set cast exact before sum).
    q("q21_agg_distinct",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  ROUND(CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_dist_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          round(sum_distinct(dec4($"l_quantity")).cast(DoubleType), 4)
            .as("sum_dist_qty"))
        .orderBy($"l_returnflag")
    },

    // ROLLUP with grouping indicators; NULLS FIRST pinned on both engines.
    q("q22_rollup",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
         |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
         |  ${Oracle.sum4("l_quantity")} AS sum_qty,
         |  COUNT(*) AS n
         |FROM lineitem
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(
          grouping($"l_returnflag").cast(IntegerType).as("g_flag"),
          grouping($"l_linestatus").cast(IntegerType).as("g_status"),
          sum4($"l_quantity").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // CUBE.
    q("q23_cube",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
         |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
         |  COUNT(*) AS n
         |FROM lineitem
         |GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(
          grouping($"l_returnflag").cast(IntegerType).as("g_flag"),
          grouping($"l_linestatus").cast(IntegerType).as("g_status"),
          // composite bitmask, first grouping column = MSB (SQL standard,
          // same convention in DuckDB's multi-arg GROUPING)
          grouping_id().cast(IntegerType).as("gid"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // GROUPING SETS (explicit set list).
    q("q24_grouping_sets",
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${Oracle.sum4("l_extendedprice")} AS total
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { spark =>
      spark.sql(
        s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           |  ${Oracle.sum4("l_extendedprice")} AS total
           |FROM lineitem
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    },

    // HAVING (post-aggregation filter).
    q("q25_having",
      s"""SELECT l_partkey, COUNT(*) AS n, ${Oracle.sum4("l_quantity")} AS qty
         |FROM lineitem
         |GROUP BY l_partkey
         |HAVING COUNT(*) >= 40
         |ORDER BY l_partkey""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("lineitem")
        .groupBy($"l_partkey")
        .agg(count(lit(1)).as("n"), sum4($"l_quantity").as("qty"))
        .filter($"n" >= 40)
        .orderBy($"l_partkey")
    },

    // Stat aggregates on small-magnitude columns (rounded far above the
    // merge-order error bound — SURVEY.md §7.4 hazard 1).
    q("q26_stats",
      """SELECT l_returnflag,
        |  ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
        |  ROUND(VAR_SAMP(l_discount), 8) AS var_disc,
        |  ROUND(CORR(l_quantity, l_discount), 6) AS corr_qd,
        |  ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) + 0 AS slope,
        |  ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) + 0 AS icept,
        |  ROUND(COVAR_SAMP(l_quantity, l_discount), 8) + 0 AS covar_qd,
        |  ROUND(MIN(l_quantity), 2) AS min_q, ROUND(MAX(l_quantity), 2) AS max_q
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(stddev_samp($"l_quantity"), 6).as("sd_qty"),
          round(var_samp($"l_discount"), 8).as("var_disc"),
          round(corr($"l_quantity", $"l_discount"), 6).as("corr_qd"),
          (round(regr_slope($"l_extendedprice", $"l_quantity"), 6) + 0).as("slope"),
          (round(regr_intercept($"l_extendedprice", $"l_quantity"), 4) + 0).as("icept"),
          (round(covar_samp($"l_quantity", $"l_discount"), 8) + 0).as("covar_qd"),
          round(min($"l_quantity"), 2).as("min_q"),
          round(max($"l_quantity"), 2).as("max_q"))
        .orderBy($"l_returnflag")
    },

    // Exact percentile (interpolated median & p90 over integral quantities).
    q("q27_percentile",
      """SELECT l_returnflag,
        |  ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS median_qty,
        |  ROUND(QUANTILE_CONT(l_quantity, 0.9), 4) AS p90_qty,
        |  ROUND(QUANTILE_DISC(l_quantity, 0.5), 4) AS median_disc
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("lineitem")
        .groupBy($"l_returnflag")
        .agg(
          // Spark `percentile` is the exact interpolated quantile — same
          // semantics as DuckDB QUANTILE_CONT (not percentile_approx).
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
          round(expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)"), 4)
            .as("median_disc"))
        .orderBy($"l_returnflag")
    },

    // MySQL group_concat re-expressed deterministically: ordered string agg.
    q("q28_group_concat",
      """SELECT c_nationkey, STRING_AGG(c_name, ',' ORDER BY c_name) AS names
        |FROM customer
        |WHERE c_custkey <= 200
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("customer")
        .filter($"c_custkey" <= 200)
        .groupBy($"c_nationkey")
        .agg(concat_ws(",", sort_array(collect_list($"c_name"))).as("names"))
        .orderBy($"c_nationkey")
    },

    // GROUP BY ALL (the dialect shorthand both engines share: every
    // non-aggregated select item becomes a grouping key) — same SQL text
    // runs on Spark and DuckDB.
    q("q25b_group_by_all",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ALL
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { spark =>
      spark.sql(
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
          |FROM lineitem
          |GROUP BY ALL
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    },

    // Boolean + arg-extrema aggregates: every/any (DuckDB bool_and/bool_or),
    // count_if, and max_by/min_by (DuckDB arg_max/arg_min) — deterministic
    // because o_orderkey orders o_totalprice ties uniquely in the fixture
    // (prices are distinct per status at these SFs; tiebreak guarded by
    // taking extrema of the unique key itself for the _by columns).
    q("q26b_bool_arg_aggs",
      """SELECT o_orderstatus,
        |  bool_and(o_totalprice > 0) AS all_pos,
        |  bool_or(o_totalprice > 400000) AS any_big,
        |  CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
        |  arg_max(o_orderkey, o_totalprice) AS key_of_max,
        |  arg_min(o_orderkey, o_totalprice) AS key_of_min,
        |  ROUND(MAX(o_totalprice), 2) AS max_price
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("orders")
        .groupBy($"o_orderstatus")
        .agg(
          every($"o_totalprice" > 0).as("all_pos"),
          some($"o_totalprice" > 400000).as("any_big"),
          count_if($"o_totalprice" > 100000).as("n_big"),
          max_by($"o_orderkey", $"o_totalprice").as("key_of_max"),
          min_by($"o_orderkey", $"o_totalprice").as("key_of_min"),
          round(max($"o_totalprice"), 2).as("max_price"))
        .orderBy($"o_orderstatus")
    },

    // Bitwise aggregates — exact, order-independent by construction.
    q("q26c_bit_aggs",
      """SELECT event_type,
        |  CAST(bit_and(event_id) AS BIGINT) AS band,
        |  CAST(bit_or(event_id) AS BIGINT) AS bor,
        |  CAST(bit_xor(event_id) AS BIGINT) AS bxor
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("events")
        .groupBy($"event_type")
        .agg(bit_and($"event_id").as("band"),
          bit_or($"event_id").as("bor"),
          bit_xor($"event_id").as("bxor"))
        .orderBy($"event_type")
    },

    // Approx distinct: non-exact → rows-only gate; spec asserts error bound.
    qRowsOnly("q29_approx_distinct") { spark =>
      import spark.implicits._
      spark.table("lineitem")
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
          countDistinct($"l_partkey").as("exact_parts"))
        .orderBy($"l_returnflag")
    },

    // Approx percentile (Greenwald-Khanna sketch): non-exact → rows-only
    // gate, same contract as q29; QueriesSmokeSpec asserts the rank-error
    // bound (approx value within the exact [φ−ε, φ+ε] quantile window,
    // ε = 1/accuracy). The sketch is the 100 TB path: one mergeable
    // fixed-size buffer per group with map-side combine, where q27's exact
    // percentile materializes each group's full value multiset.
    qRowsOnly("q27b_approx_percentile") { spark =>
      import spark.implicits._
      spark.table("lineitem")
        .groupBy($"l_returnflag")
        .agg(
          percentile_approx($"l_extendedprice", lit(0.5), lit(10000))
            .as("approx_p50"),
          percentile_approx($"l_extendedprice", lit(0.95), lit(10000))
            .as("approx_p95"),
          expr("percentile(l_extendedprice, 0.5D)").as("exact_p50"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },

    // Mergeable histogram-quantile sketch — the QUANTILE member of the
    // sketch family (q161 HLL cardinality, q151 Count-Min frequency, q108
    // Misra-Gries heavy hitters, q166 MinHash similarity, q168 bitmaps):
    // a fixed 256-bucket equi-width histogram per group is the whole
    // sketch state — integer counts, map-side combinable, trivially
    // mergeable by cell-wise addition — and any quantile is answered by
    // walking the cumulative histogram and interpolating inside the
    // crossing bucket. Unlike q27b's GK sketch (library state, rows-only),
    // every step here is SQL-expressible, so the sketch path is FULLY
    // hash-checked against the oracle, with the exact interpolated
    // percentile alongside as the validator column (q161's
    // sketch-plus-exact surface). Determinism: bucket ids and counts are
    // exact integers; the estimate divides doubles derived from them with
    // one spelling per engine; free doubles surface via floor-round.
    // Scale: the only corpus-sized stage is the (flag, bucket) rollup;
    // the cumulative walk and target selection run on ≤ |groups|×256
    // cells. The exact percentile beside it is the validator, not the
    // operator — at 100 TB only the histogram runs.
    q("q178_histogram_quantile",
      """WITH h AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(FLOOR(l_extendedprice / 500) AS BIGINT) AS b,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |n AS (SELECT flag, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY flag),
        |cum AS (
        |  SELECT flag, b, c,
        |    CAST(SUM(c) OVER (PARTITION BY flag ORDER BY b
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cm
        |  FROM h),
        |t AS (SELECT * FROM (VALUES (0.5), (0.95)) AS t(p)),
        |x AS (
        |  SELECT cum.flag, t.p,
        |    cum.b * 500 + 500 * (t.p * n.n - (cum.cm - cum.c)) / cum.c
        |      AS est
        |  FROM cum CROSS JOIN t JOIN n ON n.flag = cum.flag
        |  WHERE cum.cm >= t.p * n.n AND cum.cm - cum.c < t.p * n.n),
        |e AS (
        |  SELECT l_returnflag AS flag,
        |    QUANTILE_CONT(l_extendedprice, 0.5) AS x50,
        |    QUANTILE_CONT(l_extendedprice, 0.95) AS x95
        |  FROM lineitem GROUP BY 1)
        |SELECT x.flag AS flag, n.n AS n_rows,
        |  floor(MAX(CASE WHEN x.p = 0.5 THEN x.est END) * 10000 + 0.5)
        |    / 10000 AS est_p50,
        |  floor(MAX(e.x50) * 10000 + 0.5) / 10000 AS exact_p50,
        |  floor(MAX(CASE WHEN x.p = 0.95 THEN x.est END) * 10000 + 0.5)
        |    / 10000 AS est_p95,
        |  floor(MAX(e.x95) * 10000 + 0.5) / 10000 AS exact_p95
        |FROM x JOIN n ON n.flag = x.flag JOIN e ON e.flag = x.flag
        |GROUP BY x.flag, n.n
        |ORDER BY flag""".stripMargin) { spark =>
      import spark.implicits._
      val h = spark.table("lineitem")
        .select($"l_returnflag".as("flag"),
          floor($"l_extendedprice" / 500).cast(LongType).as("b"))
        .groupBy($"flag", $"b").agg(count(lit(1)).cast(LongType).as("c"))
        // the 256-cell sketch feeds the totals AND the cumulative walk
        .localCheckpoint()
      val n = h.groupBy($"flag").agg(sum($"c").cast(LongType).as("n"))
      val w = Window.partitionBy($"flag").orderBy($"b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = h.withColumn("cm", sum($"c").over(w).cast(LongType))
      val t = Seq(0.5, 0.95).toDF("p")
      val x = cum.crossJoin(broadcast(t))
        .join(broadcast(n), Seq("flag"))
        .filter($"cm" >= $"p" * $"n" && $"cm" - $"c" < $"p" * $"n")
        .select($"flag", $"p",
          ($"b" * 500 + lit(500) * ($"p" * $"n" - ($"cm" - $"c")) / $"c")
            .as("est"))
      val e = spark.table("lineitem")
        .groupBy($"l_returnflag".as("flag"))
        .agg(expr("percentile(l_extendedprice, 0.5D)").as("x50"),
          expr("percentile(l_extendedprice, 0.95D)").as("x95"))
      x.join(broadcast(n), Seq("flag")).join(broadcast(e), Seq("flag"))
        .groupBy($"flag", $"n".as("n_rows"))
        .agg(
          (floor(max(when($"p" === 0.5, $"est")) * 10000 + 0.5) / 10000)
            .as("est_p50"),
          (floor(max($"x50") * 10000 + 0.5) / 10000).as("exact_p50"),
          (floor(max(when($"p" === 0.95, $"est")) * 10000 + 0.5) / 10000)
            .as("est_p95"),
          (floor(max($"x95") * 10000 + 0.5) / 10000).as("exact_p95"))
        .orderBy($"flag")
    },

    // PIVOT: one column per l_linestatus value. The Spark pivot() API and
    // the oracle's conditional aggregation are the same plan shape (a single
    // hash aggregate with per-bucket conditional sums); pivot values are
    // declared explicitly — never discovered with a driver-side pass.
    q("q38_pivot",
      """SELECT l_returnflag,
        |       ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F'
        |                THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE), 4) AS F,
        |       ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O'
        |                THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE), 4) AS O
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("lineitem")
        .groupBy($"l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum($"l_quantity".cast("decimal(18,4)")).cast(DoubleType), 4))
        .orderBy($"l_returnflag")
    },

    // Unpivot (stack): the inverse of q38 — wide per-status columns back to
    // (key, status, value) rows via the stack generator; oracle spells it
    // as a UNION ALL of column selects.
    q("q40_unpivot",
      """WITH wide AS (
        |  SELECT l_returnflag,
        |         ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F'
        |                  THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE), 4) AS qf,
        |         ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O'
        |                  THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE), 4) AS qo
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, status, qty FROM (
        |  SELECT l_returnflag, 'F' AS status, qf AS qty FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'O' AS status, qo AS qty FROM wide) u
        |WHERE qty IS NOT NULL
        |ORDER BY l_returnflag, status""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("lineitem")
        .groupBy($"l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum($"l_quantity".cast("decimal(18,4)")).cast(DoubleType), 4))
        .selectExpr("l_returnflag",
          "stack(2, 'F', F, 'O', O) AS (status, qty)")
        .filter($"qty".isNotNull)
        .orderBy($"l_returnflag", $"status")
    },

    // Deterministic MODE per group — spelled as count + rank rather than the
    // engines' built-in mode() because neither engine documents its
    // tie-break: here the SMALLEST most-frequent value wins, identically on
    // both sides. Two shuffles, both benign at any scale: the (flag, qty)
    // count is map-side combinable over a bounded key space (distinct
    // quantities × flags), and the rank window partitions on flag over that
    // already-tiny count relation. The share ratio divides two exact counts
    // (free double, floor-rounded).
    q("q146_mode",
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, l_quantity),
        |r AS (
        |  SELECT l_returnflag, l_quantity, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                       ORDER BY cnt DESC, l_quantity) AS rn,
        |    SUM(cnt) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty,
        |       CAST(cnt AS BIGINT) AS cnt,
        |       floor(CAST(cnt AS DOUBLE) / tot * 1000000 + 0.5) / 1000000
        |         AS share
        |FROM r WHERE rn = 1
        |ORDER BY l_returnflag""".stripMargin) { spark =>
      import spark.implicits._
      val wr = Window.partitionBy($"l_returnflag")
        .orderBy($"cnt".desc, $"l_quantity")
      val wt = Window.partitionBy($"l_returnflag")
      spark.table("lineitem")
        .groupBy($"l_returnflag", $"l_quantity")
        .agg(count(lit(1)).as("cnt"))
        .select($"l_returnflag", $"l_quantity", $"cnt",
          row_number().over(wr).as("rn"),
          sum($"cnt").over(wt).as("tot"))
        .filter($"rn" === 1)
        .select($"l_returnflag", $"l_quantity".as("mode_qty"), $"cnt",
          Canon.r6($"cnt".cast(DoubleType) / $"tot").as("share"))
        .orderBy($"l_returnflag")
    },

    // Per-group OLS regression (regr_slope/intercept/r2 re-expressed) — the
    // five moment sums are EXACT decimal aggregates (both measures carry
    // ≤2 decimals; products stay inside DECIMAL(25,4)), so the closed-form
    // slope/intercept/r² divisions see bit-equal double inputs on both
    // engines under one shared spelling — deterministic where the built-in
    // regr_* over raw doubles is association-order-dependent. One
    // map-side-combinable shuffle on the group key; at 100 TB this is the
    // same plan as any sum rollup.
    q("q148_group_ols",
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) *
        |             CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) *
        |             CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag),
        |s2 AS (
        |  SELECT l_returnflag, n, sx, sy, sxy, syy, sxx,
        |         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
        |  FROM s)
        |SELECT l_returnflag, n,
        |  floor(slope * 1000000 + 0.5) / 1000000 AS slope,
        |  floor((sy - slope * sx) / n * 1000000 + 0.5) / 1000000 AS intercept,
        |  floor((n * sxy - sx * sy) * (n * sxy - sx * sy) /
        |        ((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1000000 + 0.5)
        |    / 1000000 AS r2
        |FROM s2
        |ORDER BY l_returnflag""".stripMargin) { spark =>
      import spark.implicits._
      val d122 = DecimalType(12, 2)
      val (x, y) = ($"l_quantity".cast(d122), $"l_extendedprice".cast(d122))
      val s = spark.table("lineitem")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(x).cast(DoubleType).as("sx"), sum(y).cast(DoubleType).as("sy"),
          sum(x * x).cast(DoubleType).as("sxx"),
          sum(x * y).cast(DoubleType).as("sxy"),
          sum(y * y).cast(DoubleType).as("syy"))
      val slope = ($"n" * $"sxy" - $"sx" * $"sy") /
        ($"n" * $"sxx" - $"sx" * $"sx")
      s.select($"l_returnflag", $"n",
        Canon.r6(slope).as("slope"),
        Canon.r6(($"sy" - slope * $"sx") / $"n").as("intercept"),
        Canon.r6(($"n" * $"sxy" - $"sx" * $"sy") * ($"n" * $"sxy" - $"sx" * $"sy") /
          (($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"syy" - $"sy" * $"sy")))
          .as("r2"))
        .orderBy($"l_returnflag")
    })
}
