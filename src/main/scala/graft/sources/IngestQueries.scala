package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.{Canon, GraftQuery, QueryModule}

/** Ingest + sink surface (SURVEY.md §2B scans/sources/sinks): the engine-side
  * analogs of the capabilities the gateway advertises —
  * `LOAD DATA LOCAL INFILE` bulk CSV ingest (ClientLocalFiles,
  * /root/reference/mysql/constants.go:48), INSERT/CTAS sinks, and
  * multi-statement batches (ClientMultiStatements/ClientMultiResults,
  * /root/reference/mysql/constants.go:57-58) relayed opaquely by
  * /root/reference/gateway/relay.go:47-99.
  *
  * Round-trip checks write under a per-query temp dir and read back with a
  * declared schema — distributed writers (one file per partition), no
  * driver materialization.
  */
object IngestQueries extends QueryModule {

  /** Per-call temp sink root, registered for recursive deletion on JVM
    * exit. Write-path queries re-materialize per call BY DESIGN (the write
    * is the measured operator), but must not leak fixture copies across
    * runs — bench reps × Verify × specs were accumulating ~80 undeleted
    * sink dirs per family. */
  private def tempSinkDir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    }
    p.toString
  }

  def queries: Seq[GraftQuery] = Seq(

    // CSV bulk ingest round-trip: export `customer` to headered CSV with
    // explicit timestamp format, re-read with the declared schema (never
    // inferred — fixed-schema model §1.3), prove content equality by
    // re-aggregating the re-read side. Oracle runs the same aggregate on
    // the original table: hash-match ⇒ lossless round trip.
    q("q98_csv_ingest_roundtrip",
      """SELECT c_mktsegment, COUNT(*) AS n,
        |       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS bal
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { spark =>
      import spark.implicits._
      val dir = tempSinkDir("graft_csv_")
      spark.table("customer").write.mode("overwrite")
        .option("header", "true").csv(dir)
      spark.read.schema(Tables.customer)
        .option("header", "true").csv(dir)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"),
          round(sum($"c_acctbal".cast("decimal(18,4)")).cast("double"), 4).as("bal"))
        .orderBy($"c_mktsegment")
    },

    // INSERT-sink round-trip (CTAS + INSERT INTO … SELECT): write orders
    // twice into a parquet sink (append mode = the INSERT path), read back,
    // verify the doubled multiset. Oracle doubles via UNION ALL.
    q("q99_insert_select_roundtrip",
      """SELECT o_orderstatus, COUNT(*) AS n,
        |       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS total
        |FROM (SELECT * FROM orders UNION ALL SELECT * FROM orders) t
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { spark =>
      import spark.implicits._
      val dir = tempSinkDir("graft_ins_") + "/orders"
      val orders = spark.table("orders")
      orders.write.mode("overwrite").parquet(dir) // CTAS
      orders.write.mode("append").parquet(dir)    // INSERT INTO … SELECT
      spark.read.schema(Tables.orders).parquet(dir)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum($"o_totalprice".cast("decimal(18,4)")).cast("double"), 4).as("total"))
        .orderBy($"o_orderstatus")
    },

    // Dynamic partition overwrite — the batch-correction pattern at scale:
    // rewrite exactly ONE date partition of the partitioned events layout
    // (drop that day's 'click' rows), leaving every other partition's files
    // untouched (partitionOverwriteMode=dynamic replaces only partitions
    // present in the incoming batch). Oracle applies the same correction to
    // the flat table: hash-match ⇒ the targeted rewrite touched nothing else.
    qDir("q99b_partition_overwrite",
      """SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
        |FROM events
        |WHERE NOT (CAST(ts AS DATE) = DATE '2024-01-10' AND event_type = 'click')
        |  AND CAST(ts AS DATE) BETWEEN DATE '2024-01-09' AND DATE '2024-01-11'
        |GROUP BY 1
        |ORDER BY d""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val outDir = tempSinkDir("graft_dpo_") + "/events"
      val ev = Tables.table(spark, dir, "events")
        .withColumn("event_date", $"ts".cast("date"))
      ev.repartition($"event_date")
        .write.mode("overwrite").partitionBy("event_date").parquet(outDir)
      val prev = spark.conf
        .getOption("spark.sql.sources.partitionOverwriteMode").getOrElse("STATIC")
      try {
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        ev.filter($"event_date" === "2024-01-10" && $"event_type" =!= "click")
          .write.mode("overwrite").partitionBy("event_date").parquet(outDir)
      } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
      spark.read.parquet(outDir)
        .filter($"event_date".between("2024-01-09", "2024-01-11"))
        .groupBy($"event_date".as("d"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"d")
    },

    // MERGE INTO analog — the transactional targeted-correction pattern
    // behind the gateway's ClientTransactions capability
    // (/root/reference/mysql/constants.go:7-11): upsert a corrections batch
    // (updates keyed on o_orderkey + brand-new rows) into a month-partitioned
    // orders layout, touching ONLY the partitions the batch lands in.
    // WHEN MATCHED THEN UPDATE ∪ WHEN NOT MATCHED THEN INSERT becomes
    // corrections ∪ (affected-partition survivors anti-joined on the key),
    // staged then swapped via dynamic partition overwrite (upsertPartitioned
    // below). Oracle replays the merge as plain SQL over the source table.
    qDir("q99c_merge_upsert",
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         o_totalprice + 10.0 AS o_totalprice, o_orderdate,
        |         'CORRECTED' AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 = 0),
        |ins AS (
        |  SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
        |         'N' AS o_orderstatus, o_totalprice, o_orderdate,
        |         o_orderpriority
        |  FROM orders WHERE o_orderkey % 89 = 0),
        |corr AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
        |merged AS (
        |  SELECT * FROM corr
        |  UNION ALL
        |  SELECT o.* FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM corr c WHERE c.o_orderkey = o.o_orderkey))
        |SELECT strftime(o_orderdate, '%Y-%m') AS om, o_orderstatus,
        |       COUNT(*) AS n,
        |       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS total
        |FROM merged
        |GROUP BY 1, 2
        |ORDER BY om, o_orderstatus""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val base = tempSinkDir("graft_merge_")
      val layout = base + "/orders"
      val orders = Tables.table(spark, dir, "orders")
      val withMonth = orders.withColumn("om", date_format($"o_orderdate", "yyyy-MM"))
      // cluster rows by partition value before the partitioned write: one
      // task owns each month → one file per partition, not tasks×months
      // tiny files (the small-files discipline any partitioned layout needs)
      withMonth.repartition($"om")
        .write.mode("overwrite").partitionBy("om").parquet(layout)
      val corrections = withMonth.filter($"o_orderkey" % 97 === 0)
        .withColumn("o_totalprice", $"o_totalprice" + 10.0)
        .withColumn("o_orderpriority", lit("CORRECTED"))
        .unionByName(withMonth.filter($"o_orderkey" % 89 === 0)
          .withColumn("o_orderkey", $"o_orderkey" + 100000000L)
          .withColumn("o_orderstatus", lit("N")))
        // the batch feeds three consumers inside the upsert (affected-
        // partition list, superseding-key broadcast, the union itself) —
        // materialize its ~2% of orders once instead of re-scanning the
        // source per consumer (multi-consumer rule)
        .localCheckpoint()
      upsertPartitioned(spark, layout, base + "/staging", corrections,
        keyCol = "o_orderkey", partCol = "om")
      spark.read.parquet(layout)
        .groupBy($"om", $"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum($"o_totalprice".cast("decimal(18,4)")).cast("double"), 4).as("total"))
        .orderBy($"om", $"o_orderstatus")
    },

    // Multi-statement batch: several ';'-separated statements, several
    // result sets, last one returned (ClientMultiStatements contract).
    // Statement splitting lives in graft.Engine.sqlBatch.
    q("q100_multi_statement",
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""") { spark =>
      val batch = graft.Engine.sqlBatch(spark,
        """SELECT COUNT(*) AS n FROM nation;
          |SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""".stripMargin)
      batch.last
    },

    // JSON-lines ingest round-trip — the interchange format crawl/training
    // pipelines actually exchange (one JSON object per line): export
    // `documents` to JSONL, re-read with the DECLARED schema (never
    // inferred — the fixed-schema model §1.3 — and inference would cost an
    // extra full scan at 100 TB), prove losslessness by re-aggregating
    // per-source counts and token totals against the original table.
    // Distributed writers/readers, one file per partition, no driver hop.
    q("q132_jsonl_ingest_roundtrip",
      s"""SELECT source, COUNT(*) AS n,
         |       CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
         |         AS n_tokens,
         |       CAST(SUM(n_chars) AS BIGINT) AS n_chars
         |FROM documents
         |GROUP BY source
         |ORDER BY source""".stripMargin) { spark =>
      import spark.implicits._
      val dir = tempSinkDir("graft_jsonl_") + "/docs"
      spark.table("documents").write.mode("overwrite").json(dir)
      spark.read.schema(Tables.documents).json(dir)
        .groupBy($"source")
        .agg(count(lit(1)).as("n"),
          sum(size(split(lower($"text"), " "))).cast("bigint").as("n_tokens"),
          sum($"n_chars").cast("bigint").as("n_chars"))
        .orderBy($"source")
    },

    // ORC sink/source round-trip — the second columnar format a
    // Spark-native engine supports out of the box (predicate pushdown +
    // column pruning work the same as parquet's): lineitem aggregates must
    // survive the format change bit-for-bit, money summed exactly via the
    // Canon decimal pre-cast on the re-read side.
    q("q133_orc_roundtrip",
      """SELECT l_returnflag, COUNT(*) AS n,
        |       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4)
        |         AS total
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { spark =>
      import spark.implicits._
      val dir = tempSinkDir("graft_orc_") + "/lineitem"
      spark.table("lineitem").write.mode("overwrite").orc(dir)
      spark.read.orc(dir)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum($"l_extendedprice".cast("decimal(18,4)")).cast("double"), 4)
            .as("total"))
        .orderBy($"l_returnflag")
    },

    // Corpus snapshot diff — the accounting step of an incremental corpus
    // update (what changed between crawl N and crawl N+1, before q121
    // dedups the additions): two snapshots are derived deterministically
    // from the fixture (old drops doc_id % 7 == 0, new drops % 5 == 0 and
    // rewrites % 3 == 0), then compared by CONTENT DIGEST over a full
    // outer join on doc_id. Scale shape: the join carries (doc_id, source,
    // 64-hex sha256) — never the text — so the shuffle width is ~100 bytes
    // a row regardless of document size, the digests are computed map-side
    // in each snapshot's scan, and the per-(source, status) rollup is
    // map-side combinable. Statuses: added / removed / changed / unchanged.
    q("q128_corpus_diff",
      """WITH snap_a AS (
        |  SELECT doc_id, source, sha256(text) AS h
        |  FROM documents WHERE doc_id % 7 <> 0),
        |snap_b AS (
        |  SELECT doc_id, source,
        |         sha256(CASE WHEN doc_id % 3 = 0
        |                     THEN text || ' v2' ELSE text END) AS h
        |  FROM documents WHERE doc_id % 5 <> 0),
        |d AS (
        |  SELECT COALESCE(o.source, n.source) AS source,
        |         CASE WHEN o.h IS NULL THEN 'added'
        |              WHEN n.h IS NULL THEN 'removed'
        |              WHEN o.h <> n.h THEN 'changed'
        |              ELSE 'unchanged' END AS status
        |  FROM snap_a o FULL OUTER JOIN snap_b n USING (doc_id))
        |SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM d GROUP BY source, status
        |ORDER BY source, status""".stripMargin) { spark =>
      import spark.implicits._
      val docs = spark.table("documents")
      val old = docs.filter($"doc_id" % 7 =!= 0)
        .select($"doc_id", $"source",
          sha2($"text".cast(org.apache.spark.sql.types.BinaryType), 256)
            .as("h"))
      val nw = docs.filter($"doc_id" % 5 =!= 0)
        .select($"doc_id", $"source",
          sha2(when($"doc_id" % 3 === 0, concat($"text", lit(" v2")))
            .otherwise($"text")
            .cast(org.apache.spark.sql.types.BinaryType), 256).as("h"))
      old.as("o").join(nw.as("n"), Seq("doc_id"), "full_outer")
        .select(coalesce($"o.source", $"n.source").as("source"),
          when($"o.h".isNull, "added")
            .when($"n.h".isNull, "removed")
            .when($"o.h" =!= $"n.h", "changed")
            .otherwise("unchanged").as("status"))
        .groupBy($"source", $"status")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy($"source", $"status")
    },

    // Order-insensitive corpus checksum (anti-entropy verification): the
    // integrity digest two replicas of a 100 TB corpus exchange to prove
    // they hold the same documents WITHOUT moving data — per-source XOR of
    // per-row 60-bit md5 words. bit_xor is commutative, associative, and
    // self-inverse, so the fold is map-side combinable in any partition
    // order, a replica diff localizes to the sources whose cells differ
    // (pair with q128's row-level diff to drill in), and ingesting the
    // same doc twice cancels — which is exactly the multiset semantics a
    // content digest wants. All-integer; the digest keys on (doc_id, text)
    // so a payload edit flips the cell. 60 bits (15 hex chars) keeps the
    // word positive in both engines' signed BIGINT.
    q("q175_corpus_checksum",
      """WITH h AS (
        |  SELECT source,
        |    CAST(CAST(('0x' || substr(
        |           md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))
        |         AS UBIGINT) AS BIGINT) AS w
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       bit_xor(w) AS checksum
        |FROM h GROUP BY source
        |ORDER BY source""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("documents")
        .select($"source",
          conv(substring(md5(concat($"doc_id".cast("string"), lit(":"),
            $"text").cast(org.apache.spark.sql.types.BinaryType)), 1, 15),
            16, 10).cast("long").as("w"))
        .groupBy($"source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          expr("bit_xor(w)").as("checksum"))
        .orderBy($"source")
    },

    // Incremental aggregate maintenance (materialized-view upkeep): a
    // warehouse's per-(event_type, day) summary is refreshed by merging
    // the standing summary's PARTIAL aggregates with the late-arriving
    // delta batch's partials — sum-of-sums over exact DECIMAL revenue and
    // counts — never by re-scanning the base facts. Here the fact table is
    // split 80/20 on event_id (the delta lands inside already-summarized
    // days, so the merge genuinely combines partials per group), each side
    // is aggregated independently, and the union of partials is re-reduced.
    // The oracle IS the full single-pass recompute: the hash match is the
    // algebraic proof that the merge equals recomputation (decimal sums
    // are associative — the Canon exactness rule is what makes the
    // incremental path byte-reproducible at all). Scale: refresh cost is
    // summary rows + delta rows; the base facts are never re-read.
    q("q159_incremental_agg",
      """WITH e AS (
        |  SELECT event_type, (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |         CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       ROUND(CAST(SUM(v) AS DOUBLE), 4) AS revenue
        |FROM e GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin) { spark =>
      import spark.implicits._
      val e = spark.table("events").select($"event_type",
        expr("unix_micros(ts) div 86400000000").as("day"),
        $"value".cast(Canon.dec184).as("v"), $"event_id")
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy($"event_type", $"day")
          .agg(count(lit(1)).as("pn"), sum($"v").as("pv"))
      partial(e.filter($"event_id" % 5 =!= 0))
        .unionAll(partial(e.filter($"event_id" % 5 === 0)))
        .groupBy($"event_type", $"day")
        .agg(sum($"pn").cast(org.apache.spark.sql.types.LongType)
            .as("n_events"),
          round(sum($"pv").cast(org.apache.spark.sql.types.DoubleType), 4)
            .as("revenue"))
        .select($"event_type", $"day".cast(org.apache.spark.sql.types.LongType)
          .as("day"), $"n_events", $"revenue")
        .orderBy($"event_type", $"day")
    })

  /** Partition-scoped upsert (the MERGE INTO engine analog): apply a
    * corrections batch to a partitioned parquet layout in place, rewriting
    * ONLY the partitions the batch touches.
    *
    * Scale shape (100 TB): the corrections batch is the small side by
    * nature, so both join inputs that matter are broadcast — the affected
    * partition list prunes the existing-side scan (left-semi on the
    * partition column over a partitioned layout ⇒ partition pruning), and
    * the key anti-join drops superseded rows without shuffling the corpus.
    * The merged affected partitions are STAGED to a sibling directory, then
    * COMMITTED by a per-partition directory move (r19, guide §6: the swap
    * used to be a second full distributed read+shuffle+write of the staged
    * bytes through dynamic partition overwrite — pure duplicated I/O, since
    * dynamic overwrite's own commit is exactly this file-level swap). The
    * affected-partition list is discovered from staging's directory names —
    * driver-side METADATA only, bounded by the partition count; no row ever
    * reaches the driver. Untouched partitions' files are never opened
    * (MergeSpec asserts their files survive byte-identical). */
  private[graft] def upsertPartitioned(spark: org.apache.spark.sql.SparkSession,
      layout: String, staging: String, corrections: org.apache.spark.sql.DataFrame,
      keyCol: String, partCol: String): Unit = {
    val existing = spark.read.parquet(layout)
    val affected = corrections.select(partCol).distinct()
    val survivors = existing
      .join(broadcast(affected), Seq(partCol), "left_semi")
      .join(broadcast(corrections.select(keyCol)), Seq(keyCol), "left_anti")
    corrections.select(existing.columns.map(col): _*)
      .unionByName(survivors.select(existing.columns.map(col): _*))
      .repartition(col(partCol)) // one writer task per affected partition
      .write.mode("overwrite").partitionBy(partCol).parquet(staging)
    // commit: swap each staged partition directory into the layout (the
    // file-level operation dynamic partition overwrite performs internally)
    val hconf = spark.sparkContext.hadoopConfiguration
    val stPath = new org.apache.hadoop.fs.Path(staging)
    val fs = stPath.getFileSystem(hconf)
    fs.listStatus(stPath).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith(partCol + "=")) {
        val dst = new org.apache.hadoop.fs.Path(layout, st.getPath.getName)
        fs.delete(dst, true)
        if (!fs.rename(st.getPath, dst))
          throw new java.io.IOException(
            s"upsertPartitioned: failed to move ${st.getPath} -> $dst")
      }
    }
  }
}
