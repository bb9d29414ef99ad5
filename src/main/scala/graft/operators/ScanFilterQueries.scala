package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.{Canon, GraftQuery, QueryModule}
import graft.api.Canon.Oracle

/** Scans, projections, filters, predicates, DISTINCT, subquery predicates,
  * sort/limit/top-k — SURVEY.md §2B tables "Scans", "Projections / filters",
  * "Sorts / limits". Grounding: the reference relays this whole surface
  * opaquely (/root/reference/gateway/relay.go:47-99); Spark's Catalyst does
  * the pushdown/pruning (§4.2), which `PlanShapeSpec` asserts.
  */
object ScanFilterQueries extends QueryModule {
  import Canon._

  def queries: Seq[GraftQuery] = Seq(

    // Flagship: TPC-H-Q1-style pricing summary. Filter → partial/final hash
    // agg → sort; at 100 TB this is a scan + map-side combine + tiny shuffle
    // (4 groups), the canonical Spark-friendly shape.
    q("q01_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Oracle.sum4("l_quantity")} AS sum_qty,
         |  ${Oracle.sum4("l_extendedprice")} AS sum_base_price,
         |  ${Oracle.sum6("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${Oracle.sum6("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${Oracle.avg6("l_quantity")} AS avg_qty,
         |  ${Oracle.avg6("l_extendedprice")} AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("lineitem")
        .filter($"l_shipdate" <= lit("1998-09-01 00:00:00").cast(TimestampType))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum4($"l_quantity").as("sum_qty"),
          sum4($"l_extendedprice").as("sum_base_price"),
          sum6($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
          sum6($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).as("sum_charge"),
          avg6($"l_quantity").as("avg_qty"),
          avg6($"l_extendedprice").as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // Projection + expression eval; column pruning reaches the parquet scan.
    q("q02_project_expr",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS BIGINT) AS qty,
        |  ROUND(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
        |             AS DOUBLE), 6) AS net_price
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, qty, net_price""".stripMargin) { spark =>
      // (l_orderkey, l_linenumber) is NOT unique in the fixture data — row-level
      // lineitem queries must ORDER BY every output column for a total order.
      import spark.implicits._
      spark.table("lineitem")
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast(LongType).as("qty"),
          round(dec6($"l_extendedprice" * (lit(1) - $"l_discount"))
            .cast(DoubleType), 6).as("net_price"))
        .orderBy($"l_orderkey", $"l_linenumber", $"qty", $"net_price")
    },

    // Predicate surface: AND/OR/NOT, BETWEEN, IN(list), LIKE, comparison.
    q("q03_filter_predicates",
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |  AND l_returnflag IN ('A', 'R')
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND (l_discount > 0.05 OR l_tax = 0.0)
        |  AND NOT (l_linestatus LIKE 'O%')
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_shipdate""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("lineitem")
        .filter($"l_quantity".between(10, 20)
          && $"l_returnflag".isin("A", "R")
          && $"l_shipdate" >= lit("1996-01-01 00:00:00").cast(TimestampType)
          && ($"l_discount" > 0.05 || $"l_tax" === 0.0)
          && !$"l_linestatus".like("O%"))
        .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_shipdate")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_shipdate")
    },

    // CASE WHEN conditional buckets.
    q("q04_case_when",
      """SELECT
        |  CASE WHEN l_quantity < 10 THEN 'low'
        |       WHEN l_quantity < 30 THEN 'mid'
        |       ELSE 'high' END AS qty_bucket,
        |  COUNT(*) AS n,
        |  """.stripMargin + Oracle.sum4("l_extendedprice") + """ AS total
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY qty_bucket""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("lineitem")
        .select(
          when($"l_quantity" < 10, "low")
            .when($"l_quantity" < 30, "mid")
            .otherwise("high").as("qty_bucket"),
          $"l_extendedprice")
        .groupBy($"qty_bucket")
        .agg(count(lit(1)).as("n"), sum4($"l_extendedprice").as("total"))
        .orderBy($"qty_bucket")
    },

    // DISTINCT (shuffle-dedup; at scale a partial-distinct combine runs map-side).
    q("q05_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("lineitem")
        .select($"l_returnflag", $"l_linestatus").distinct()
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // IN (subquery) → Catalyst rewrites to left-semi join.
    q("q06_in_subquery",
      """SELECT l_returnflag, COUNT(*) AS n
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { spark =>
      spark.sql(
        """SELECT l_returnflag, COUNT(*) AS n
          |FROM lineitem
          |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    },

    // Scalar subquery threshold: exact decimal sum → double division keeps the
    // threshold bit-identical across engines (Canon).
    q("q07_scalar_subquery",
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
        |FROM orders
        |WHERE o_totalprice > 2 * (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin) { spark =>
      spark.sql(
        """SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
          |FROM orders
          |WHERE o_totalprice > 2 * (
          |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          |  FROM orders)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // LIMIT/OFFSET over a total order.
    q("q08_limit_offset",
      """SELECT o_orderkey, o_orderstatus
        |FROM orders
        |ORDER BY o_orderkey
        |LIMIT 100 OFFSET 50""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("orders")
        .select($"o_orderkey", $"o_orderstatus")
        .orderBy($"o_orderkey")
        .offset(50).limit(100)
    },

    // Top-k: Catalyst plans TakeOrderedAndProject — no global sort at scale.
    q("q09_topk",
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("orders")
        .select($"o_orderkey", round($"o_totalprice", 2).as("price"), $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100)
        .select($"o_orderkey", $"price")
    },

    // Multi-key sort with explicit null placement (nulls synthesized via NULLIF).
    q("q10_sort_nulls",
      """SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS st
        |FROM orders
        |ORDER BY st DESC NULLS LAST, o_orderkey
        |LIMIT 500""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("orders")
        .select($"o_orderkey", nullif($"o_orderstatus", lit("O")).as("st"))
        .orderBy($"st".desc_nulls_last, $"o_orderkey")
        .limit(500)
    },

    // LATERAL correlated subquery (top-1 order per customer): Catalyst
    // decorrelates the per-row ORDER BY…LIMIT into a ranked join — the same
    // SQL text runs on both engines.
    q("q06b_lateral_join",
      """SELECT c_custkey, o_orderkey, price
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
        |  FROM orders WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
        |WHERE c_custkey < 200
        |ORDER BY c_custkey""".stripMargin) { spark =>
      spark.sql(
        """SELECT c_custkey, o_orderkey, price
          |FROM customer c, LATERAL (
          |  SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
          |  FROM orders WHERE o_custkey = c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
          |WHERE c_custkey < 200
          |ORDER BY c_custkey""".stripMargin)
    },

    // Recursive CTE (WITH RECURSIVE, Spark 4's UnionLoop): generate the
    // dense 0–23 hour series recursively, left-join the event hour
    // histogram so silent hours surface as zero — same SQL both engines.
    q("q07c_recursive_cte",
      """WITH RECURSIVE hours(h) AS (
        |  SELECT 0
        |  UNION ALL
        |  SELECT h + 1 FROM hours WHERE h < 23)
        |SELECT h, CAST(COALESCE(n, 0) AS BIGINT) AS n_events
        |FROM hours
        |LEFT JOIN (SELECT CAST(hour(ts) AS INT) AS eh, COUNT(*) AS n
        |           FROM events GROUP BY 1) e ON eh = h
        |ORDER BY h""".stripMargin) { spark =>
      spark.sql(
        """WITH RECURSIVE hours(h) AS (
          |  SELECT 0
          |  UNION ALL
          |  SELECT h + 1 FROM hours WHERE h < 23)
          |SELECT h, CAST(COALESCE(n, 0) AS BIGINT) AS n_events
          |FROM hours
          |LEFT JOIN (SELECT CAST(hour(ts) AS INT) AS eh, COUNT(*) AS n
          |           FROM events GROUP BY 1) e ON eh = h
          |ORDER BY h""".stripMargin)
    },

    // Correlated scalar subquery in SELECT — Catalyst decorrelates
    // (RewriteCorrelatedScalarSubquery) into a left outer aggregate join;
    // MAX is order-insensitive so no decimal cast is needed.
    q("q07b_correlated_subquery",
      """SELECT c_custkey, c_name,
        |  (SELECT MAX(o_totalprice) FROM orders
        |   WHERE o_custkey = c_custkey) AS max_order
        |FROM customer
        |ORDER BY c_custkey""".stripMargin) { spark =>
      spark.sql(
        """SELECT c_custkey, c_name,
          |  (SELECT MAX(o_totalprice) FROM orders
          |   WHERE o_custkey = c_custkey) AS max_order
          |FROM customer
          |ORDER BY c_custkey""".stripMargin)
    })
}
