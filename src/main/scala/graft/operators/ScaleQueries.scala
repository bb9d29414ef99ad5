package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.api.{Canon, GraftQuery, QueryModule}
import graft.api.Canon.Oracle
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
        |       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
        |       ROUND(MAX(l_extendedprice), 4) AS max_price
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
        .agg(sum($"pn").as("n"),
          round(sum($"pq").cast("double"), 4).as("sum_qty"),
          round(max($"pm").cast("double"), 4).as("max_price"))
        .orderBy($"l_returnflag")
    },

    // Distributed histogram: width_bucket binning + single groupBy — the
    // constant-memory profile/statistics pass a pipeline runs before
    // choosing partition bounds at scale.
    q("q86_histogram",
      """SELECT CAST(FLOOR(o_totalprice / 50000) AS INT) + 1 AS bucket,
        |       COUNT(*) AS n,
        |       ROUND(MIN(o_totalprice), 2) AS lo,
        |       ROUND(MAX(o_totalprice), 2) AS hi
        |FROM orders
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("orders")
        .groupBy(width_bucket($"o_totalprice", lit(0), lit(600000), lit(12))
          .as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min($"o_totalprice"), 2).as("lo"),
          round(max($"o_totalprice"), 2).as("hi"))
        .orderBy($"bucket")
    },

    // Outer generator: explode_outer keeps rows whose array is empty (docs
    // with no tokens after a restrictive split) — LEFT JOIN semantics for
    // generators, spelled with an outer unnest-join in the oracle.
    q("q87_explode_outer",
      """SELECT d.doc_id, t.token
        |FROM (SELECT doc_id,
        |        list_filter(string_split(lower(text), ' '),
        |                    w -> w = 'zzz-never-present') AS toks
        |      FROM documents WHERE doc_id < 20) d
        |LEFT JOIN (SELECT doc_id, unnest(toks) AS token
        |           FROM (SELECT doc_id,
        |                   list_filter(string_split(lower(text), ' '),
        |                               w -> w = 'zzz-never-present') AS toks
        |                 FROM documents WHERE doc_id < 20) x) t
        |  ON d.doc_id = t.doc_id
        |ORDER BY d.doc_id""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("documents").filter($"doc_id" < 20)
        .select($"doc_id",
          filter(split(lower($"text"), " "), w => w === "zzz-never-present")
            .as("toks"))
        .select($"doc_id", explode_outer($"toks").as("token"))
        .orderBy($"doc_id")
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

    // Bucketed co-located join: write BOTH join sides bucketed (and
    // bucket-sorted) on the join key, then join the bucketed tables — the
    // scan-to-scan co-partitioning that removes the per-query shuffle of a
    // repeated big-big join at 100 TB (pay the shuffle once at layout time,
    // never per query). repartition(nBuckets, key) before the write gives
    // exactly one file per bucket, so the bucketed SMJ needs neither
    // exchange nor sort (asserted in PlanSpec). Oracle runs the plain join
    // on the flat tables: hash-match ⇒ the relayout is semantics-preserving.
    qDir("q88_bucketed_join",
      s"""SELECT o_orderstatus, COUNT(*) AS n,
         |       ${Oracle.sum4("l_quantity")} AS qty
         |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val (ordersT, lineitemT) = bucketedJoinTables(spark, dir)
      spark.table(ordersT)
        .join(spark.table(lineitemT), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), Canon.sum4($"l_quantity").as("qty"))
        .orderBy($"o_orderstatus")
    },

    // Contiguous global id assignment WITHOUT a single-reducer window:
    // range-partition on the key, sort within partitions, then RDD
    // zipWithIndex (which adds per-partition offsets from a lightweight
    // count job — the distributed two-phase pattern). Result provably
    // equals ROW_NUMBER() OVER (ORDER BY doc_id) - 1, which is what the
    // oracle runs; at 100 TB the window formulation funnels the table
    // through one reducer, this shape never does.
    q("q59g_global_ids",
      """SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS gid
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val sorted = spark.table("documents").select($"doc_id").as[Long]
        .repartitionByRange(8, $"doc_id")
        .sortWithinPartitions($"doc_id")
      sorted.rdd.zipWithIndex()
        .map { case (d, i) => (d, i) }
        .toDF("doc_id", "gid")
        .orderBy($"doc_id")
    },

    // Second MySQL-dialect slice: substring_index / repeat / reverse / elt —
    // spellings Spark ships natively (the client-facing dialect the gateway
    // relays); the oracle re-expresses substring_index and elt with DuckDB
    // list ops.
    q("q50b_mysql_dialect2",
      """SELECT c_custkey,
        |  array_to_string((string_split(c_name, '0'))[1:2], '0') AS before_second_zero,
        |  repeat(c_mktsegment, 2) AS seg2,
        |  reverse(c_name) AS rev_name,
        |  (['alpha', 'beta', 'gamma'])[CAST(c_custkey % 3 + 1 AS INT)] AS elt_pick,
        |  length(c_name) AS clen
        |FROM customer
        |WHERE c_custkey <= 500
        |ORDER BY c_custkey""".stripMargin) { spark =>
      spark.sql(
        """SELECT c_custkey,
          |  substring_index(c_name, '0', 2) AS before_second_zero,
          |  repeat(c_mktsegment, 2) AS seg2,
          |  reverse(c_name) AS rev_name,
          |  elt(CAST(c_custkey % 3 + 1 AS INT), 'alpha', 'beta', 'gamma') AS elt_pick,
          |  char_length(c_name) AS clen
          |FROM customer
          |WHERE c_custkey <= 500
          |ORDER BY c_custkey""".stripMargin)
    },

    // MySQL comma-LIMIT: `LIMIT offset, count` is the dialect spelling
    // Spark's parser rejects — Engine.translateMySql rewrites it token-
    // safely (strings/comments untouched) to LIMIT … OFFSET …, keeping the
    // reference's relay-transparency contract for MySQL clients. The oracle
    // is the standard spelling directly.
    q("q50c_mysql_limit",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 5""".stripMargin) { spark =>
      spark.sql(graft.Engine.translateMySql(
        """SELECT o_orderkey, o_totalprice
          |FROM orders # MySQL-style comment
          |ORDER BY o_totalprice DESC, o_orderkey
          |LIMIT 5, 10""".stripMargin))
    },

    // MySQL DATE_FORMAT %-patterns: the dialect's formatter spelling,
    // rewritten by Engine.translateMySql to Spark's date_format with the
    // Java pattern equivalent (%i minutes vs %M month-name is where MySQL
    // and C strftime diverge — the oracle uses DuckDB's strftime spelling
    // of the same bucketing). Same hour-level truncation, both engines.
    q("q50d_mysql_date_format",
      """SELECT strftime(ts, '%Y-%m-%d %H:00') AS bucket, event_type,
        |       COUNT(*) AS n
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket, event_type""".stripMargin) { spark =>
      spark.sql(graft.Engine.translateMySql(
        """SELECT DATE_FORMAT(ts, '%Y-%m-%d %H:00') AS bucket, event_type,
          |       COUNT(*) AS n
          |FROM events
          |GROUP BY 1, 2
          |ORDER BY bucket, event_type""".stripMargin))
    },

    // Case-insensitive collation (the most-used non-default MySQL collation
    // surface — SET NAMES … COLLATE utf8mb4_general_ci maps onto Spark 4's
    // native UTF8_LCASE via Engine.sparkCollation). GROUP BY a collated key
    // merges case variants WITHOUT rewriting the data; the group
    // representative is surfaced through lower() (deterministic — every
    // member of a CI group lowers to the same string, while "which member"
    // is partition-order dependent). Oracle replays with DuckDB lower()
    // twins. The mixed-case input column is derived deterministically so
    // both engines see identical data. Collation is comparison METADATA:
    // the scan, shuffle and agg plan is the plain string plan (CollationKey
    // substitutes for the raw bytes as the hash/sort key).
    q("q113_collation_group",
      """WITH m AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
        |              ELSE lower(c_mktsegment) END AS seg,
        |         c_acctbal
        |  FROM customer)
        |SELECT lower(seg) AS seg_ci, COUNT(*) AS n,
        |       CAST(MIN(c_custkey) AS BIGINT) AS min_key,
        |       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS bal
        |FROM m
        |GROUP BY lower(seg)
        |ORDER BY seg_ci""".stripMargin) { spark =>
      import spark.implicits._
      val m = spark.table("customer")
        .select($"c_custkey",
          when($"c_custkey" % 2 === 0, upper($"c_mktsegment"))
            .otherwise(lower($"c_mktsegment")).as("seg"),
          $"c_acctbal")
      m.groupBy(collate($"seg", "UTF8_LCASE").as("k"))
        .agg(count(lit(1)).as("n"),
          min($"c_custkey").cast("bigint").as("min_key"),
          Canon.sum4($"c_acctbal").as("bal"))
        .select(lower($"k").cast("string").as("seg_ci"), $"n", $"min_key",
          $"bal")
        .orderBy($"seg_ci")
    },

    // Collated equality + ORDER BY: a CI filter matches both case variants
    // of the literal, and a CI sort interleaves them (unique c_custkey
    // tiebreaker keeps the order total). UTF8_LCASE sorts like the binary
    // order of the lowercased key for ASCII data — exactly DuckDB's
    // lower() twin.
    q("q113b_collation_filter_order",
      """WITH m AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
        |              ELSE lower(c_mktsegment) END AS seg
        |  FROM customer)
        |SELECT c_custkey, seg FROM m
        |WHERE lower(seg) = 'automobile' AND c_custkey <= 200
        |ORDER BY lower(seg), c_custkey""".stripMargin) { spark =>
      import spark.implicits._
      val m = spark.table("customer")
        .select($"c_custkey",
          when($"c_custkey" % 2 === 0, upper($"c_mktsegment"))
            .otherwise(lower($"c_mktsegment")).as("seg"))
      m.filter(collate($"seg", "UTF8_LCASE") === "automobile"
          && $"c_custkey" <= 200)
        .orderBy(collate($"seg", "UTF8_LCASE"), $"c_custkey")
        .select($"c_custkey", $"seg".cast("string").as("seg"))
    },

    // Partition-pruned layout: re-write events partitioned by event date
    // (the layout a 100 TB events table would ship with), then aggregate a
    // one-week slice — the scan must touch only 7 of ~30 partitions
    // (asserted in PlanSpec). Oracle runs the same slice on the flat table.
    // Z-order clustered layout: write lineitem ordered along a Morton curve
    // over (l_partkey, l_suppkey) so every file covers a small BOX in the
    // 2-d key space instead of a full-range stripe — at 100 TB, parquet
    // footer min/max stats then skip the files/row-groups outside a 2-d
    // box predicate on EITHER key (a single-column sort only helps its own
    // column). The zvalue is pure codegen'd builtins (shift/and/or — no
    // UDF); the write is repartitionByRange + sortWithinPartitions on it.
    // Observable result = the box aggregate, identical on any layout (the
    // oracle replays it on the unclustered table); the skipping evidence —
    // z-files intersecting the box ≪ linear files — is PlanSpec's
    // per-file min/max assertion.
    qDir("q107_zorder_layout",
      """SELECT l_returnflag, COUNT(*) AS n,
        |       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS qty
        |FROM lineitem
        |WHERE l_partkey BETWEEN 40 AND 120 AND l_suppkey BETWEEN 2 AND 6
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      spark.read.parquet(zorderLayout(spark, dir))
        .filter($"l_partkey".between(40, 120) && $"l_suppkey".between(2, 6))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), Canon.sum4($"l_quantity").as("qty"))
        .orderBy($"l_returnflag")
    },

    qDir("q93_partitioned_events",
      """SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
        |GROUP BY 1, 2
        |ORDER BY d, event_type""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      spark.read.parquet(partitionedEventsLayout(spark, dir))
        .filter($"event_date".between("2024-01-08", "2024-01-14"))
        .groupBy($"event_date".as("d"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy($"d", $"event_type")
    },

    // Training-shard assignment + manifest — the last step of a data
    // pipeline before the trainer reads it: every doc goes to shard
    // h(doc_id) mod S (content-independent, so re-runs and incremental
    // appends land docs in the SAME shard), and the manifest reports the
    // per-shard doc/token footprint the shard writer would use to size
    // output files. md5-based hash (first 8 hex as uint32 — the proven
    // cross-engine idiom from q120/q59c) keys the shuffle uniformly:
    // shards stay balanced at any corpus size by construction, which the
    // ShardSpec balance assert pins. One map-side projection + one
    // S-key aggregate — nothing else, the 100 TB shard-writer plan.
    q("q123_shard_manifest",
      s"""WITH s AS (
         |  SELECT doc_id,
         |         len(string_split(lower(text), ' ')) AS toks,
         |         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |                   AS UBIGINT) % 16 AS BIGINT) AS shard
         |  FROM documents)
         |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS total_tokens,
         |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         |FROM s GROUP BY shard
         |ORDER BY shard""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("documents")
        .select($"doc_id",
          size(split(lower($"text"), " ")).as("toks"),
          (conv(substring(md5($"doc_id".cast("string").cast("binary")),
            1, 8), 16, 10).cast("long") % 16).as("shard"))
        .groupBy($"shard")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum($"toks").cast("long").as("total_tokens"),
          min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
        .orderBy($"shard")
    },

    // Rendezvous (highest-random-weight) sharding with the MIGRATION-COST
    // readout that justifies it over q123's mod-S manifest (Thaler &
    // Ravishankar, IEEE/ACM ToN 1998; the consistent-placement family
    // memcached/Ceph use): each doc lands on argmax over shards of
    // md5(shard, doc) — when the fleet grows 8 → 9 shards, ONLY the docs
    // whose new shard wins move (≈ 1/9), where mod-S reshuffles ≈ 8/9 of
    // the corpus. Output is the 9-row shard table (counts under both
    // fleets, HRW inflow per shard) with the two measured global moved
    // shares attached — the elastic-rescale readout itself. Scale: the
    // argmax explodes a |shards|-bounded grid per doc (17 rows/doc),
    // map-side max_by, two bounded rollups; the hex keys compare as ASCII
    // on both engines, and md5 uniqueness makes the argmax tie-free.
    q("q240_rendezvous_sharding",
      """WITH docs AS (SELECT doc_id FROM documents),
        |a8 AS (SELECT doc_id, arg_max(s, md5('hrw:' || s || ':' || doc_id))
        |         AS sh
        |       FROM docs, (SELECT unnest(range(0, 8)) AS s) g
        |       GROUP BY doc_id),
        |a9 AS (SELECT doc_id, arg_max(s, md5('hrw:' || s || ':' || doc_id))
        |         AS sh
        |       FROM docs, (SELECT unnest(range(0, 9)) AS s) g
        |       GROUP BY doc_id),
        |j AS (SELECT a9.doc_id, a8.sh AS s8, a9.sh AS s9
        |      FROM a8 JOIN a9 USING (doc_id)),
        |gshare AS (
        |  SELECT CAST(SUM(CASE WHEN s8 != s9 THEN 1 ELSE 0 END) AS DOUBLE)
        |           / COUNT(*) AS hrw_moved,
        |         (SELECT CAST(SUM(CASE WHEN doc_id % 8 != doc_id % 9
        |                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
        |          FROM docs) AS mod_moved
        |  FROM j),
        |grid AS (SELECT unnest(range(0, 9)) AS shard)
        |SELECT CAST(grid.shard AS BIGINT) AS shard,
        |  CAST(coalesce(n8.n, 0) AS BIGINT) AS n_docs_8,
        |  CAST(coalesce(n9.n, 0) AS BIGINT) AS n_docs_9,
        |  CAST(coalesce(infl.n, 0) AS BIGINT) AS hrw_inflow,
        |  floor(gshare.hrw_moved * 1000000 + 0.5) / 1000000 AS hrw_moved_share,
        |  floor(gshare.mod_moved * 1000000 + 0.5) / 1000000 AS mod_moved_share
        |FROM grid
        |LEFT JOIN (SELECT s8 AS shard, COUNT(*) AS n FROM j GROUP BY 1) n8
        |  ON n8.shard = grid.shard
        |LEFT JOIN (SELECT s9 AS shard, COUNT(*) AS n FROM j GROUP BY 1) n9
        |  ON n9.shard = grid.shard
        |LEFT JOIN (SELECT s9 AS shard, COUNT(*) AS n FROM j
        |           WHERE s8 != s9 GROUP BY 1) infl
        |  ON infl.shard = grid.shard
        |CROSS JOIN gshare
        |ORDER BY shard""".stripMargin) { spark =>
      import spark.implicits._
      val docs = spark.table("documents").select($"doc_id")
      def hrw(nShards: Int): org.apache.spark.sql.DataFrame = docs
        .select($"doc_id",
          explode(sequence(lit(0L), lit(nShards - 1L))).as("s"))
        .select($"doc_id", $"s",
          md5(concat(lit("hrw:"), $"s".cast("string"), lit(":"),
            $"doc_id".cast("string")).cast("binary")).as("k"))
        .groupBy($"doc_id").agg(max_by($"s", $"k").as("sh"))
      val j = hrw(8).withColumnRenamed("sh", "s8")
        .join(hrw(9).withColumnRenamed("sh", "s9"), "doc_id")
        .localCheckpoint() // feeds glob + three shard rollups
      val glob = j
        .agg((sum(when($"s8" =!= $"s9", 1).otherwise(0)).cast("double")
          / count(lit(1))).as("hrw_moved"))
        .crossJoin(docs.agg((sum(when($"doc_id" % 8 =!= $"doc_id" % 9, 1)
          .otherwise(0)).cast("double") / count(lit(1))).as("mod_moved")))
      val grid = spark.range(9).select($"id".as("shard"))
      val n8 = j.groupBy($"s8".as("shard")).agg(count(lit(1)).as("n8"))
      val n9 = j.groupBy($"s9".as("shard")).agg(count(lit(1)).as("n9"))
      val infl = j.filter($"s8" =!= $"s9")
        .groupBy($"s9".as("shard")).agg(count(lit(1)).as("ni"))
      grid.join(broadcast(n8), Seq("shard"), "left")
        .join(broadcast(n9), Seq("shard"), "left")
        .join(broadcast(infl), Seq("shard"), "left")
        .crossJoin(broadcast(glob))
        .select($"shard",
          coalesce($"n8", lit(0L)).cast("long").as("n_docs_8"),
          coalesce($"n9", lit(0L)).cast("long").as("n_docs_9"),
          coalesce($"ni", lit(0L)).cast("long").as("hrw_inflow"),
          (floor($"hrw_moved" * 1000000 + 0.5) / 1000000)
            .as("hrw_moved_share"),
          (floor($"mod_moved" * 1000000 + 0.5) / 1000000)
            .as("mod_moved_share"))
        .orderBy($"shard")
    },

    // Sequence packing (the pretraining step between dedup and sharding:
    // bin documents into fixed token-budget contexts so no GPU step pads
    // against a short doc). Greedy first-fit in doc_id order WITHIN
    // 64-doc blocks: a new pack opens when the doc doesn't fit (an
    // oversize doc spills alone into its own pack — the standard rule).
    // The block bound is the scale design: packing state is a ≤64-doc
    // fold regardless of corpus size, blocks pack embarrassingly parallel,
    // and pack identity is (blk, pack_id) — no cross-block coordination.
    // The data-dependent fold runs as a Spark `aggregate` HOF per block;
    // the oracle spells the SAME iteration as a recursive CTE (immutable
    // rows) because DuckDB's list_reduce corrupts conditional folds
    // (CLAUDE.md invariant, found r09). All-integer output → fully
    // hash-checked.
    q("q223_sequence_packing",
      s"""WITH RECURSIVE t AS (
         |  SELECT doc_id, doc_id // 64 AS blk,
         |         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id // 64
         |                            ORDER BY doc_id) AS rn
         |  FROM documents),
         |s AS (
         |  SELECT blk, rn, doc_id, n,
         |         CAST(1 AS BIGINT) AS pack, n AS fill,
         |         CAST(1 AS BIGINT) AS pos
         |  FROM t WHERE rn = 1
         |  UNION ALL
         |  SELECT t.blk, t.rn, t.doc_id, t.n,
         |    CASE WHEN s.fill + t.n > $packBudget THEN s.pack + 1
         |         ELSE s.pack END,
         |    CASE WHEN s.fill + t.n > $packBudget THEN t.n
         |         ELSE s.fill + t.n END,
         |    CASE WHEN s.fill + t.n > $packBudget THEN CAST(1 AS BIGINT)
         |         ELSE s.pos + 1 END
         |  FROM s JOIN t ON t.blk = s.blk AND t.rn = s.rn + 1)
         |SELECT doc_id, blk, pack AS pack_id, pos AS pack_pos,
         |       n AS n_tokens
         |FROM s ORDER BY doc_id""".stripMargin) { spark =>
      sequencePacking(spark).orderBy("doc_id")
    },

    // Packing-efficiency readout (the monitor a pipeline runs on q223's
    // output before burning GPU-hours: how many contexts, how much
    // padding, where do oversize docs spill): per 64-doc block — packs,
    // docs, tokens, oversize spills (single docs beyond the budget),
    // padded slots Σ max(budget − fill, 0), and the fill ratio
    // tokens/(packs·budget) as a floor-r4 free double over exact
    // integers. Shares q223's memoized packing relation; the rollup is
    // one map-side-combinable aggregate over it.
    q("q224_packing_efficiency",
      s"""WITH RECURSIVE t AS (
         |  SELECT doc_id, doc_id // 64 AS blk,
         |         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id // 64
         |                            ORDER BY doc_id) AS rn
         |  FROM documents),
         |s AS (
         |  SELECT blk, rn, doc_id, n,
         |         CAST(1 AS BIGINT) AS pack, n AS fill,
         |         CAST(1 AS BIGINT) AS pos
         |  FROM t WHERE rn = 1
         |  UNION ALL
         |  SELECT t.blk, t.rn, t.doc_id, t.n,
         |    CASE WHEN s.fill + t.n > $packBudget THEN s.pack + 1
         |         ELSE s.pack END,
         |    CASE WHEN s.fill + t.n > $packBudget THEN t.n
         |         ELSE s.fill + t.n END,
         |    CASE WHEN s.fill + t.n > $packBudget THEN CAST(1 AS BIGINT)
         |         ELSE s.pos + 1 END
         |  FROM s JOIN t ON t.blk = s.blk AND t.rn = s.rn + 1),
         |packs AS (
         |  SELECT blk, pack, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(n) AS BIGINT) AS fill
         |  FROM s GROUP BY blk, pack)
         |SELECT blk, CAST(COUNT(*) AS BIGINT) AS n_packs,
         |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
         |  CAST(SUM(fill) AS BIGINT) AS total_tokens,
         |  CAST(SUM(CASE WHEN fill > $packBudget THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_oversize,
         |  CAST(SUM(CASE WHEN fill <= $packBudget
         |                THEN $packBudget - fill ELSE 0 END) AS BIGINT)
         |    AS padded_slots,
         |  floor(CAST(SUM(fill) AS DOUBLE)
         |        / (COUNT(*) * $packBudget) * 10000 + 0.5) / 10000
         |    AS fill_ratio
         |FROM packs GROUP BY blk
         |ORDER BY blk""".stripMargin) { spark =>
      import spark.implicits._
      import org.apache.spark.sql.types._
      val packs = sequencePacking(spark)
        .groupBy($"blk", $"pack_id")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum($"n_tokens").cast(LongType).as("fill"))
      packs.groupBy($"blk")
        .agg(count(lit(1)).cast(LongType).as("n_packs"),
          sum($"n_docs").cast(LongType).as("n_docs"),
          sum($"fill").cast(LongType).as("total_tokens"),
          sum(when($"fill" > packBudget, 1L).otherwise(0L))
            .cast(LongType).as("n_oversize"),
          sum(when($"fill" <= packBudget, lit(packBudget) - $"fill")
            .otherwise(0L)).cast(LongType).as("padded_slots"),
          (floor(sum($"fill").cast(DoubleType)
            / (count(lit(1)) * packBudget) * 10000 + 0.5) / 10000)
            .as("fill_ratio"))
        .orderBy($"blk")
    },

    // Tokenizer-TRUE sequence packing (VERDICT r11 #6): q223/q232/q233
    // budget in whitespace tokens, but real context budgets are TOKENIZER
    // tokens — so this op re-counts every document in q192's learned BPE
    // units (the memoized bpeShared merge chain, shared with q192/q200 —
    // trained ONCE per session/fixture) and runs the identical greedy
    // first-fit block packing on those counts. Per-doc count = one
    // vocab-sized join (word → |syms| after the learned merges) + one
    // map-side rollup; the packing fold is q223's bounded 64-doc block
    // state with a BPE-scaled budget. All-integer → fully hash-checked.
    q("q245_bpe_packing",
      s"""WITH RECURSIVE ${TextQueries.bpeCtes(TextQueries.bpeRounds)},
         |pd AS (
         |  SELECT doc_id, word FROM
         |    (SELECT doc_id, unnest(${TextQueries.tokSql}) AS word
         |     FROM documents) x
         |  WHERE len(word) > 0),
         |cnt AS (
         |  SELECT pd.doc_id,
         |         CAST(SUM(len(w${TextQueries.bpeRounds}.syms)) AS BIGINT)
         |           AS n
         |  FROM pd JOIN w${TextQueries.bpeRounds}
         |    ON w${TextQueries.bpeRounds}.word = pd.word
         |  GROUP BY pd.doc_id),
         |t AS (
         |  SELECT d.doc_id, d.doc_id // $packBlock AS blk,
         |         COALESCE(cnt.n, 0) AS n,
         |         ROW_NUMBER() OVER (PARTITION BY d.doc_id // $packBlock
         |                            ORDER BY d.doc_id) AS rn
         |  FROM documents d LEFT JOIN cnt USING (doc_id)),
         |s AS (
         |  SELECT blk, rn, doc_id, n,
         |         CAST(1 AS BIGINT) AS pack, n AS fill,
         |         CAST(1 AS BIGINT) AS pos
         |  FROM t WHERE rn = 1
         |  UNION ALL
         |  SELECT t.blk, t.rn, t.doc_id, t.n,
         |    CASE WHEN s.fill + t.n > $bpePackBudget THEN s.pack + 1
         |         ELSE s.pack END,
         |    CASE WHEN s.fill + t.n > $bpePackBudget THEN t.n
         |         ELSE s.fill + t.n END,
         |    CASE WHEN s.fill + t.n > $bpePackBudget THEN CAST(1 AS BIGINT)
         |         ELSE s.pos + 1 END
         |  FROM s JOIN t ON t.blk = s.blk AND t.rn = s.rn + 1)
         |SELECT doc_id, blk, pack AS pack_id, pos AS pack_pos,
         |       n AS n_bpe_tokens
         |FROM s ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      import org.apache.spark.sql.types._
      val (_, fw) = TextQueries.bpeShared(spark)
      val pd = spark.table("documents")
        .select($"doc_id", explode(split(lower($"text"), " ")).as("word"))
        .filter(length($"word") > 0)
      val cnt = pd
        .join(fw.select($"word", size($"syms").cast(LongType).as("sl")),
          Seq("word"))
        .groupBy($"doc_id").agg(sum($"sl").cast(LongType).as("n"))
      val counts = spark.table("documents").select($"doc_id")
        .join(cnt, Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"n", lit(0L)).as("n"))
      packCounts(counts, bpePackBudget)
        .select($"doc_id", $"blk", $"pack_id", $"pack_pos",
          $"n_tokens".as("n_bpe_tokens"))
        .orderBy($"doc_id")
    },

    // Table profiling (the SUMMARIZE / ANALYZE surface): per-column row,
    // null, and EXACT distinct counts over `orders`. Shape: one branch per
    // column, each a global aggregate over a scan pruned to THAT column —
    // at 100 TB each branch reads one parquet column chunk, runs its own
    // exact count-distinct shuffle, and the 6 branches parallelize
    // independently (profiling N columns costs N column scans, not N full
    // table scans — the columnar-format payoff, asserted in PlanSpec).
    q("q149_profile",
      """SELECT col, n_rows, n_null, n_distinct FROM (
        |  SELECT 'o_orderkey' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(COUNT(*) FILTER (o_orderkey IS NULL) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) FILTER (o_orderstatus IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) FILTER (o_totalprice IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) FILTER (o_orderdate IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) FILTER (o_orderpriority IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders) u
        |ORDER BY col""".stripMargin) { spark =>
      import spark.implicits._
      def prof(c: String) = spark.table("orders")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          count(when(col(c).isNull, lit(1))).cast("long").as("n_null"),
          countDistinct(col(c)).cast("long").as("n_distinct"))
        .select(lit(c).as("col"), $"n_rows", $"n_null", $"n_distinct")
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
        .map(prof).reduce(_ unionAll _)
        .orderBy($"col")
    },

    // Small-file compaction — the table-maintenance pass every 100 TB lake
    // runs continuously: streaming ingest and per-partition writers leave
    // thousands of tiny files whose per-file open/footer cost dominates
    // scans, so the layout is periodically rewritten into
    // target-size files. Here the fixture is deliberately shattered into
    // 64 fragments, compacted back to 4 (repartition → even file sizes —
    // coalesce would just glue input splits and keep the skew), and the
    // surfaced aggregate is computed FROM THE COMPACTED FILES while the
    // oracle reads the original table: hash equality proves the rewrite
    // lossless, the q88/q99b layout-change-is-semantics-preserving
    // contract. CompactionSpec asserts the 64→4 file counts directly.
    qDir("q179_compaction",
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY source
        |ORDER BY source""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val (frag, compact) = compactedLayout(spark, dir)
      spark.read.parquet(compact)
        .groupBy($"source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum($"n_chars").cast("long").as("total_chars"))
        .orderBy($"source")
    },

    // RFM customer segmentation (recency / frequency / monetary) — the
    // classic marketing rollup a warehouse serves from the orders fact.
    // Determinism without floats: recency is INTEGER days from integer
    // micros (the house epoch idiom), frequency an integer count, monetary
    // an EXACT DECIMAL sum compared against integer thresholds — the
    // score CASEs never touch IEEE; segment revenue surfaces via the Canon
    // sum-of-exact-sums rule. Thresholds are fixed knobs (quantile-based
    // scoring would be q127's tertile pattern). Scale: one map-side-
    // combinable o_custkey rollup (max date, count, decimal sum), the
    // global anchor date a 1-row broadcast, score mapping map-side, and a
    // ≤27-cell segment rollup. No window, no join of the fact table.
    q("q172_rfm_segments",
      """WITH g AS (
        |  SELECT MAX(epoch_ns(o_orderdate) // 1000) AS gmax FROM orders),
        |c AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS f,
        |         MAX(epoch_ns(o_orderdate) // 1000) AS last,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS m
        |  FROM orders GROUP BY o_custkey),
        |sc AS (
        |  SELECT CASE WHEN (gmax - last) // 86400000000 <= 90 THEN 3
        |              WHEN (gmax - last) // 86400000000 <= 250 THEN 2
        |              ELSE 1 END AS r_score,
        |         CASE WHEN f >= 12 THEN 3 WHEN f >= 9 THEN 2 ELSE 1 END
        |           AS f_score,
        |         CASE WHEN m >= 3000000 THEN 3 WHEN m >= 2200000 THEN 2
        |              ELSE 1 END AS m_score,
        |         m
        |  FROM c CROSS JOIN g)
        |SELECT r_score, f_score, m_score,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  ROUND(CAST(SUM(m) AS DOUBLE), 4) AS revenue
        |FROM sc GROUP BY r_score, f_score, m_score
        |ORDER BY r_score, f_score, m_score""".stripMargin) { spark =>
      import spark.implicits._
      val dayUs = 86400000000L
      val c = spark.table("orders")
        .select($"o_custkey", unix_micros($"o_orderdate").as("ous"),
          $"o_totalprice")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).cast("long").as("f"),
          max($"ous").as("last"),
          sum(Canon.dec4($"o_totalprice")).as("m"))
      val g = spark.table("orders")
        .agg(max(unix_micros($"o_orderdate")).as("gmax"))
      c.crossJoin(broadcast(g))
        .select(
          when(expr(s"(gmax - last) div $dayUs") <= 90, 3)
            .when(expr(s"(gmax - last) div $dayUs") <= 250, 2)
            .otherwise(1).as("r_score"),
          when($"f" >= 12, 3).when($"f" >= 9, 2).otherwise(1).as("f_score"),
          when($"m" >= 3000000, 3).when($"m" >= 2200000, 2)
            .otherwise(1).as("m_score"),
          $"m")
        .groupBy($"r_score", $"f_score", $"m_score")
        .agg(count(lit(1)).cast("long").as("n_customers"),
          round(sum($"m").cast("double"), 4).as("revenue"))
        .orderBy($"r_score", $"f_score", $"m_score")
    },

    // Deterministic epoch shuffling + fixed-size batch manifests (the
    // training-loader op: each epoch is a reproducible permutation of the
    // corpus, cut into 32-doc batches). The permutation key is
    // md5(epoch:doc_id); the global sequence comes from q59g's
    // range-partition + sortWithinPartitions + zipWithIndex shape — NEVER a
    // single-reducer ORDER BY window (zipWithIndex indexes the total order
    // exactly regardless of where the range boundaries land, so the result
    // provably equals the oracle's ROW_NUMBER). Per (epoch, batch):
    // doc/token counts and an order-insensitive XOR membership digest (the
    // q175 checksum), so the manifest check covers WHICH docs landed in
    // each batch, not just how many. All-integer output.
    q("q203_epoch_shuffle",
      """WITH d AS (
        |  SELECT doc_id, len(string_split(lower(text), ' ')) AS n_toks
        |  FROM documents),
        |e AS (
        |  SELECT epoch, doc_id, n_toks,
        |    ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY
        |      md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)),
        |      doc_id) - 1 AS seq
        |  FROM d CROSS JOIN (SELECT unnest([0, 1]) AS epoch) ep)
        |SELECT epoch, seq // 32 AS batch,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS tokens,
        |  CAST(bit_xor(CAST(CAST(('0x' ||
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
        |    AS BIGINT)) AS BIGINT) AS member_digest
        |FROM e
        |GROUP BY epoch, seq // 32
        |ORDER BY epoch, batch""".stripMargin) { spark =>
      import spark.implicits._
      val d = spark.table("documents")
        .select($"doc_id", size(split(lower($"text"), " ")).as("n_toks"))
        .localCheckpoint() // feeds both epoch permutations
      val perEpoch = (0 to 1).map { ep =>
        val keyed = d
          .select(md5(concat(lit(s"$ep:"), $"doc_id".cast("string"))
            .cast("binary")).as("h"), $"doc_id", $"n_toks")
          .as[(String, Long, Long)]
          .repartitionByRange(8, $"h", $"doc_id")
          .sortWithinPartitions($"h", $"doc_id")
        keyed.rdd.zipWithIndex()
          .map { case ((_, id, nt), seq) => (ep, id, nt, seq) }
          .toDF("epoch", "doc_id", "n_toks", "seq")
      }
      val digest = conv(substring(md5($"doc_id".cast("string")
        .cast("binary")), 1, 15), 16, 10).cast("long")
      perEpoch.reduce(_ unionByName _)
        .groupBy($"epoch", expr("seq div 32").as("batch"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum($"n_toks").cast("long").as("tokens"),
          bit_xor(digest).cast("long").as("member_digest"))
        .orderBy($"epoch", $"batch")
    })

  /** q179's shatter-then-compact pipeline: writes the documents fixture as
    * 64 fragment files, rewrites them as 4 evenly-sized files, and returns
    * both layout paths (exposed for CompactionSpec's file-count asserts).
    * The layout is memoized per fixture dir within the JVM — bench reps,
    * Verify, and the specs reuse one materialization instead of writing a
    * fresh 68-file fixture copy per call (ADVICE r06) — and the temp dir is
    * registered for deletion on JVM exit. */
  private val compactedLayouts =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]
  private[graft] def compactedLayout(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) =
    compactedLayouts.computeIfAbsent(dir, { _ =>
      val base = tempLayoutDir("graft_compact_")
      val frag = s"$base/fragmented"
      val compact = s"$base/compacted"
      graft.sources.Tables.table(spark, dir, "documents")
        .repartition(64).write.mode("overwrite").parquet(frag)
      spark.read.parquet(frag)
        .repartition(4).write.mode("overwrite").parquet(compact)
      (frag, compact)
    })

  /** Temp layout root registered for recursive deletion on JVM exit — the
    * shared plumbing of the four layout memos. */
  private def tempLayoutDir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    }
    p.toString
  }

  /** q88's bucketed join sides, memoized per (JVM, fixture dir) like
    * [[compactedLayout]] (bench reps 2-3, Verify, and the specs reuse ONE
    * materialization instead of re-writing both tables per call). Catalog
    * table names carry a per-dir suffix — the catalog is JVM-shared, so two
    * fixture dirs must not collide; data lives in a shutdown-cleaned temp
    * dir. Relayout once, join co-located forever — exactly the 100 TB
    * bucketing economics the query demonstrates. */
  private val bucketedJoinTabs =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]
  private def bucketedJoinTables(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) =
    bucketedJoinTabs.computeIfAbsent(dir, { _ =>
      val wh = tempLayoutDir("graft_bucket_")
      val suffix = java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(dir) & Int.MaxValue)
      Seq(("orders", "o_orderkey"), ("lineitem", "l_orderkey")).foreach {
        case (t, k) =>
          graft.sources.Tables.table(spark, dir, t).repartition(16, col(k))
            .write.mode("overwrite")
            .bucketBy(16, k).sortBy(k)
            .option("path", s"$wh/$t")
            .saveAsTable(s"graft_${t}_bucketed_$suffix")
      }
      (s"graft_orders_bucketed_$suffix", s"graft_lineitem_bucketed_$suffix")
    })

  /** q107's z-ordered lineitem layout, memoized per (JVM, fixture dir). */
  private val zorderLayouts =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private def zorderLayout(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    zorderLayouts.computeIfAbsent(dir, { _ =>
      import spark.implicits._
      val outDir = tempLayoutDir("graft_zorder_") + "/li"
      graft.sources.Tables.table(spark, dir, "lineitem")
        .withColumn("zv", zval($"l_partkey", $"l_suppkey"))
        .repartitionByRange(16, $"zv")
        .sortWithinPartitions($"zv")
        .write.mode("overwrite").parquet(outDir)
      outDir
    })

  /** q93's date-partitioned events layout, memoized per (JVM, fixture dir). */
  private val partitionedEventsLayouts =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private def partitionedEventsLayout(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    partitionedEventsLayouts.computeIfAbsent(dir, { _ =>
      import spark.implicits._
      val outDir = tempLayoutDir("graft_part_") + "/events"
      graft.sources.Tables.table(spark, dir, "events")
        .withColumn("event_date", $"ts".cast("date"))
        .write.mode("overwrite").partitionBy("event_date").parquet(outDir)
      outDir
    })

  /** q223's token budget per packed context. Small enough that fixture
    * packs hold several ~40-80-token docs, large enough that oversize
    * spills stay rare — the operator's knob, mirrored in the oracle. */
  private[graft] val packBudget = 128L

  /** q223's packing block width: greedy state never exceeds this many
    * docs, so the per-block fold is bounded at any corpus size. */
  private[graft] val packBlock = 64L

  /** q245's token budget in BPE units — after only [[TextQueries.bpeRounds]]
    * merges a symbol is ≈ one character, so the BPE-true budget sits near
    * the character scale the way q223's sits at the whitespace scale. */
  private[graft] val bpePackBudget = 1024L

  /** q223/q224's shared packing relation over the fixture corpus,
    * memoized per (session, fixture dir) ([[Memo.cached]]). */
  private def sequencePacking(
      spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame =
    Memo.cached(spark, "seq-packing")(
      sequencePackingOf(spark.table("documents")))

  /** Greedy first-fit sequence packing over any (doc_id, text) frame —
    * (doc_id, blk, pack_id, pack_pos, n_tokens); see the q223 declaration
    * for semantics. Exposed private[graft] for the PipelineOpsSpec
    * brute-force replay. */
  private[graft] def sequencePackingOf(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.types._
    packCounts(docs.select($"doc_id",
      size(split(lower($"text"), " ")).cast(LongType).as("n")), packBudget)
  }

  /** The packing fold itself over any (doc_id, n) count relation — q223
    * feeds whitespace counts, q245 feeds BPE symbol counts (a budget is a
    * TOKENIZER-true number there); same greedy first-fit per 64-doc block,
    * same bounded state. */
  private[graft] def packCounts(counts: org.apache.spark.sql.DataFrame,
      budget: Long): org.apache.spark.sql.DataFrame = {
    import counts.sparkSession.implicits._
    import org.apache.spark.sql.types._
    val toks = counts.select($"doc_id",
      expr(s"doc_id div $packBlock").as("blk"), $"n")
    val outT = ArrayType(StructType(Seq(
      StructField("doc_id", LongType), StructField("pack", LongType),
      StructField("pos", LongType), StructField("n", LongType))))
    val folded = toks
      .groupBy($"blk")
      .agg(sort_array(collect_list(struct($"doc_id", $"n"))).as("l"))
      .select($"blk", aggregate($"l",
        struct(lit(0L).as("pack"), lit(0L).as("fill"), lit(0L).as("pos"),
          array().cast(outT).as("out")),
        (acc, x) => {
          val n = x.getField("n")
          val newPack = acc.getField("pack") === 0L ||
            acc.getField("fill") + n > budget
          val pack = when(newPack, acc.getField("pack") + 1L)
            .otherwise(acc.getField("pack"))
          val pos = when(newPack, lit(1L)).otherwise(acc.getField("pos") + 1L)
          struct(pack.as("pack"),
            when(newPack, n).otherwise(acc.getField("fill") + n).as("fill"),
            pos.as("pos"),
            concat(acc.getField("out"), array(struct(
              x.getField("doc_id").as("doc_id"), pack.as("pack"),
              pos.as("pos"), n.as("n")))).as("out"))
        }).getField("out").as("out"))
    folded.select($"blk", explode($"out").as("o"))
      .select($"o.doc_id".as("doc_id"), $"blk",
        $"o.pack".as("pack_id"), $"o.pos".as("pack_pos"),
        $"o.n".as("n_tokens"))
  }

  /** 64-bit Morton (Z-order) value of two non-negative 32-bit keys: bit i
    * of `a` lands at bit 2i, bit i of `b` at 2i+1, so curve-contiguous rows
    * are close in BOTH dimensions. The classic 5-step mask-spread, entirely
    * in codegen'd builtin long ops. */
  private[graft] def zval(a: Column, b: Column): Column = {
    def spread(x: Column): Column = {
      val masks = Seq(
        16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
        4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
        1 -> 0x5555555555555555L)
      masks.foldLeft(x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
        case (acc, (s, m)) =>
          acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
      }
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }
}
