package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.{GraftQuery, QueryModule}
import graft.sources.Tables

/** Scale-hardening patterns as first-class, oracle-checked operators
  * (SURVEY.md §2C "100 TB design rule", §7.2 P10). Each query demonstrates a
  * technique the engine applies when data or keys outgrow a naive plan —
  * with results provably identical to the naive formulation, which is what
  * the DuckDB oracle checks.
  */
object ScaleQueries extends QueryModule {

  def queries: Seq[GraftQuery] = Seq(

    // Salted two-phase aggregation: l_returnflag has 3 distinct values, so a
    // direct groupBy funnels the table through 3 reducers. Phase 1 spreads
    // each hot key across 16 salted sub-keys (deterministic salt from the
    // row key) and pre-aggregates; phase 2 combines 3×16 tiny partials.
    // Identical result to the plain GROUP BY the oracle runs.
    q("q30_salted_agg",
      """SELECT l_returnflag, COUNT(*) AS n,
        |       SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty,
        |       MAX(CAST(l_extendedprice AS DECIMAL(18,4))) AS max_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { spark =>
      import spark.implicits._
      val salted = spark.table("lineitem")
        .withColumn("salt", pmod(xxhash64($"l_orderkey", $"l_linenumber"), lit(16)))
        .groupBy($"l_returnflag", $"salt")
        .agg(count(lit(1)).as("pn"),
          sum($"l_quantity".cast("decimal(18,4)")).as("pq"),
          max($"l_extendedprice".cast("decimal(18,4)")).as("pm"))
      salted.groupBy($"l_returnflag")
        .agg(sum($"pn").as("n"), sum($"pq").as("sum_qty"), max($"pm").as("max_price"))
        .orderBy($"l_returnflag")
    },

    // MySQL dialect surface end-to-end through SQL text (the spellings the
    // reference's clients send over the wire and the gateway relays,
    // /root/reference/gateway/relay.go:17): ifnull / instr / if are Spark
    // built-ins; group_concat is injected by GraftExtensions.
    q("q50_mysql_dialect",
      """SELECT r_regionkey,
        |       COALESCE(NULLIF(MIN(n_name), ''), 'none') AS first_nation,
        |       STRPOS(MIN(n_name), 'A') AS a_pos,
        |       CASE WHEN COUNT(*) > 4 THEN 'big' ELSE 'small' END AS size_class,
        |       STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_regionkey
        |ORDER BY r_regionkey""".stripMargin) { spark =>
      spark.sql(
        """SELECT r_regionkey,
          |       ifnull(nullif(MIN(n_name), ''), 'none') AS first_nation,
          |       instr(MIN(n_name), 'A') AS a_pos,
          |       if(COUNT(*) > 4, 'big', 'small') AS size_class,
          |       group_concat(n_name) AS nations
          |FROM nation JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_regionkey
          |ORDER BY r_regionkey""".stripMargin)
    },

    // Partition-pruned layout: re-write events partitioned by event date
    // (the layout a 100 TB events table would ship with), then aggregate a
    // one-week slice — the scan must touch only 7 of ~30 partitions
    // (asserted in PlanSpec). Oracle runs the same slice on the flat table.
    qDir("q93_partitioned_events",
      """SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
        |GROUP BY 1, 2
        |ORDER BY d, event_type""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val outDir = Files.createTempDirectory("graft_part_").toString + "/events"
      Tables.table(spark, dir, "events")
        .withColumn("event_date", $"ts".cast("date"))
        .write.mode("overwrite").partitionBy("event_date").parquet(outDir)
      spark.read.parquet(outDir)
        .filter($"event_date".between("2024-01-08", "2024-01-14"))
        .groupBy($"event_date".as("d"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy($"d", $"event_type")
    })
}
