package graft

/** Session façade behavior — mirrors the reference's routing unit cases
  * (SURVEY.md §5.2.6: username split, case-insensitive cluster lookup,
  * unknown id, /root/reference/gateway/gateway.go:253-267) plus the
  * multi-statement batch contract. */
class EngineSpec extends SparkSpec {

  private val backends = Map("prod" -> sf, "Staging" -> sf)

  test("connect routes case-insensitively like the reference") {
    val s = Engine.connect(spark, "PROD", backends)
    assert(s.clusterId == "PROD")
    assert(s.sql("SELECT COUNT(*) n FROM region").head().getLong(0) == 5)
    val s2 = Engine.connect(spark, "staging", backends)
    assert(s2.table("nation").count() == 25)
  }

  test("connect-with-db binds the named namespace; use() rebinds it") {
    // ClientConnectWithDB analog: the sf0.01 "database" has 150 customers
    // vs sf0.001's 15, so the binding is observable through row counts
    val dbs = Map("tiny" -> sf, "small" -> "/root/testdata/sf0.01")
    val s = Engine.connect(spark, "prod", backends, db = Some("SMALL"),
      databases = dbs)
    val nSmall = s.sql("SELECT COUNT(*) n FROM customer").head().getLong(0)
    val s2 = Engine.connect(spark, "prod", backends)
    val nTiny = s2.sql("SELECT COUNT(*) n FROM customer").head().getLong(0)
    assert(nSmall > nTiny, s"$nSmall vs $nTiny")
    // COM_INIT_DB / USE analog on a live session
    s.use("tiny", dbs)
    assert(s.sql("SELECT COUNT(*) n FROM customer").head().getLong(0) == nTiny)
    // the text `USE db` STATEMENT (dump files / script replay) resolves
    // through the same bound map — backticked and bare spellings both
    s.sql("USE `small`")
    assert(s.sql("SELECT COUNT(*) n FROM customer").head().getLong(0) ==
      nSmall)
    s.sql("use TINY;")
    assert(s.sql("SELECT COUNT(*) n FROM customer").head().getLong(0) ==
      nTiny)
    val eUse = intercept[Engine.EngineError](s.sql("USE nodb"))
    assert(eUse.code == 1105 && eUse.getMessage.contains("nodb"))
    // SHOW TABLES FROM the CURRENT binding lists the live catalog
    // (session-created views included); another namespace lists its
    // declared fixture set (code-review r14)
    s.sql("CREATE OR REPLACE TEMPORARY VIEW _from_probe AS SELECT 1 AS x")
    assert(s.sql("SHOW TABLES FROM tiny").collect()
      .exists(_.getString(0) == "_from_probe"))
    assert(!s.sql("SHOW TABLES FROM small").collect()
      .exists(_.getString(0) == "_from_probe"))
    // unknown database: same structured error contract as cluster routing
    val e = intercept[Engine.EngineError] {
      Engine.connect(spark, "prod", backends, Some("nodb"), dbs)
    }
    assert(e.code == 1105 && e.getMessage.contains("nodb"))
  }

  test("unknown cluster id raises the structured engine error") {
    val e = intercept[Engine.EngineError] {
      Engine.connect(spark, "nope", backends)
    }
    assert(e.code == 1105 && e.sqlState == "08S01")
    assert(e.getMessage.contains("nope"))
  }

  test("sessions are isolated namespaces over one SparkContext") {
    val a = Engine.connect(spark, "prod", backends)
    a.spark.sql("CREATE OR REPLACE TEMP VIEW scratch AS SELECT 1 AS x")
    val b = Engine.connect(spark, "prod", backends)
    assert(a.spark.sparkContext eq b.spark.sparkContext)
    intercept[Exception] { b.sql("SELECT * FROM scratch").collect() }
  }

  test("stream delivers rows incrementally without driver materialization") {
    val s = Engine.connect(spark, "prod", backends)
    val it = s.stream("SELECT n_nationkey FROM nation ORDER BY n_nationkey")
    assert(it.take(3).map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    assert(it.hasNext) // remaining rows still pending, not collected
  }

  test("sqlBatch splits statements, respecting quotes") {
    graft.sources.Tables.register(spark, sf)
    val res = Engine.sqlBatch(spark,
      "SELECT ';' AS semi; SELECT COUNT(*) AS n FROM region;  ")
    assert(res.size == 2)
    assert(res.head.head().getString(0) == ";")
    assert(res.last.head().getLong(0) == 5)
  }

  test("sqlBatch single statement and trailing semicolon") {
    assert(Engine.sqlBatch(spark, "SELECT 1 AS x;").size == 1)
    assert(Engine.sqlBatch(spark, "SELECT 1 AS x").size == 1)
  }

  test("sqlBatch never splits on ';' inside comments") {
    // -- line comment: ';' inert, comment passes through to Spark's parser
    val dash = Engine.sqlBatch(spark,
      "SELECT 1 AS x; -- trailing; not a split\nSELECT 2 AS y")
    assert(dash.size == 2)
    assert(dash.last.head().getInt(0) == 2)
    // /* block */ with ';' inside, plus a real split after it
    val block = Engine.sqlBatch(spark,
      "SELECT /* one; two; three */ 3 AS z; SELECT 4 AS w")
    assert(block.size == 2)
    assert(block.head.head().getInt(0) == 3)
    // MySQL '#' comment: stripped (Spark's parser rejects '#'), ';' inert
    val hash = Engine.sqlBatch(spark,
      "SELECT 5 # tail; comment\n+ 1 AS v;SELECT 6 AS u")
    assert(hash.size == 2)
    assert(hash.head.head().getInt(0) == 6)
    assert(hash.last.head().getInt(0) == 6)
  }

  test("sqlBatch keeps optimizer hints and comment-lookalike literals") {
    // a hint is a block comment — it must survive verbatim, not be split on
    val hinted = Engine.sqlBatch(spark,
      "SELECT /*+ REPARTITION(2) */ 1 AS a; SELECT 2 AS b")
    assert(hinted.size == 2 && hinted.head.head().getInt(0) == 1)
    // '--' and '#' inside quotes are data, not comments
    val quoted = Engine.sqlBatch(spark,
      "SELECT '--; #not a comment' AS s; SELECT ';' AS t")
    assert(quoted.size == 2)
    assert(quoted.head.head().getString(0) == "--; #not a comment")
    // multi-line block comment spanning a would-be boundary
    val multi = Engine.sqlBatch(spark,
      "SELECT 1 AS a /* first;\nsecond; */; SELECT 2 AS b")
    assert(multi.size == 2 && multi.last.head().getInt(0) == 2)
  }

  test("introspection statements relay through the session (SHOW/DESCRIBE/EXPLAIN)") {
    val s = Engine.connect(spark, "prod", backends)
    val shown = s.sql("SHOW TABLES").collect().map(_.getString(0)).toSet
    assert(Set("region", "nation", "lineitem", "events").subsetOf(shown), shown)
    val cols = s.sql("DESCRIBE region").collect().map(_.getString(0)).toSet
    assert(cols.contains("r_regionkey") && cols.contains("r_name"), cols)
    val plan = s.sql("EXPLAIN SELECT COUNT(*) FROM region").head().getString(0)
    assert(plan.contains("Physical Plan"), plan)
  }

  test("SHOW CREATE TABLE synthesizes MySQL's 2-column DDL response") {
    val s = Engine.connect(spark, "prod", backends)
    val row = s.sql("SHOW CREATE TABLE region").collect()
    assert(row.length == 1)
    assert(row.head.schema.fieldNames.toSeq == Seq("Table", "Create Table"))
    val ddl = row.head.getString(1)
    assert(row.head.getString(0) == "region" &&
      ddl.startsWith("CREATE TABLE `region`") &&
      ddl.contains("`r_name` STRING"), ddl)
    // mysqldump's backtick-quoted spelling must hit the same interception
    val quoted = s.sql("SHOW CREATE TABLE `region`").head().getString(1)
    assert(quoted == ddl, quoted)
    // unknown table signals MySQL error 1146 like the rest of the surface
    val e = intercept[Engine.EngineError](s.sql("SHOW CREATE TABLE nope_t"))
    assert(e.code == 1146)
  }

  test("DDL relays through the session: CTAS, INSERT INTO, VIEW, DROP") {
    val s = Engine.connect(spark, "prod", backends)
    val loc = tempDir("graft_ddl_")
    s.sql("DROP TABLE IF EXISTS graft_ddl_t")
    s.sql(s"""CREATE TABLE graft_ddl_t USING parquet LOCATION '$loc/t'
             |AS SELECT r_regionkey, r_name FROM region""".stripMargin)
    s.sql("INSERT INTO graft_ddl_t VALUES (99, 'NOWHERE')")
    assert(s.sql("SELECT COUNT(*) AS n FROM graft_ddl_t").head().getLong(0) == 6)
    s.sql("CREATE OR REPLACE TEMP VIEW graft_ddl_v AS " +
      "SELECT r_name FROM graft_ddl_t WHERE r_regionkey < 50")
    assert(s.sql("SELECT COUNT(*) AS n FROM graft_ddl_v").head().getLong(0) == 5)
    s.sql("DROP VIEW graft_ddl_v")
    s.sql("DROP TABLE graft_ddl_t")
    intercept[Engine.EngineError] { s.sql("SELECT * FROM graft_ddl_t") }
  }

  test("storage-level compression stands in for the wire compressed protocol (A13)") {
    // the gateway's zlib wire compression (/root/reference/mysql/
    // compress.go:36-153) maps to parquet codec config: the same table
    // written under snappy and zstd carries the codec in every column
    // chunk's file footer, and both layouts read back to the identical
    // aggregate — compression changes bytes on disk/wire, never results
    import scala.jdk.CollectionConverters._
    val s = Engine.connect(spark, "prod", backends)
    def footerCodecs(dir: String): Set[String] = {
      val conf = spark.sessionState.newHadoopConf()
      new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet"))
        .flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter.getBlocks.asScala
            .flatMap(_.getColumns.asScala).map(_.getCodec.toString)
          finally r.close()
        }.toSet
    }
    val base = tempDir("graft_codec_")
    Seq("snappy", "zstd").foreach { codec =>
      s.table("nation").write.mode("overwrite")
        .option("compression", codec).parquet(s"$base/$codec")
      assert(footerCodecs(s"$base/$codec") == Set(codec.toUpperCase),
        s"$codec footer mismatch")
    }
    val agg = Seq("snappy", "zstd").map { c =>
      spark.read.parquet(s"$base/$c")
        .agg(org.apache.spark.sql.functions.count_distinct(
          org.apache.spark.sql.functions.col("n_nationkey")),
          org.apache.spark.sql.functions.sum("n_regionkey"))
        .head().toSeq
    }
    assert(agg.head == agg.last && spark.read.parquet(s"$base/zstd").count() == 25,
      agg.toString)
  }

  test("analysis failures surface as the structured engine error (ERR packet analog)") {
    val s = Engine.connect(spark, "prod", backends)
    val e = intercept[Engine.EngineError] { s.sql("SELECT * FROM no_such_table") }
    assert(e.code == 1105 && e.sqlState == "08S01")
    val e2 = intercept[Engine.EngineError] { s.sql("SELEKT 1") }
    assert(e2.code == 1105)
  }

  test("concurrent sessions execute in parallel over one SparkContext") {
    // the gateway's connection-per-goroutine model (gateway.go:63-64):
    // N clients, one shared engine, isolated namespaces, no interference
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(Future.sequence((1 to 4).map { i =>
      Future {
        val s = Engine.connect(spark, "prod", backends)
        s.sql(s"SELECT COUNT(*) AS n FROM nation WHERE n_nationkey < ${i * 5}")
          .head().getLong(0)
      }
    }), 2.minutes)
    assert(results == Seq(5L, 10L, 15L, 20L), results)
  }

  test("MySQL dialect translation: LIMIT a,b rewrites; strings survive") {
    val s = Engine.connect(spark, "prod", backends)
    val rows = s.sqlMySql(
      "SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 5, 3")
      .collect().map(_.getAs[Number](0).intValue).toSeq
    assert(rows == Seq(5, 6, 7), rows)
    // '#' comment stripped; LIMIT-lookalike inside a string untouched
    assert(s.sqlMySql("SELECT 'LIMIT 1, 2' AS s # tail comment")
      .head().getString(0) == "LIMIT 1, 2")
    // subquery LIMITs rewrite too; plain LIMIT n unchanged
    assert(s.sqlMySql(
      """SELECT COUNT(*) AS n FROM (
        |SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 2, 4) t
        |LIMIT 1""".stripMargin).head().getLong(0) == 4)
  }

  test("native expressions reach the SQL surface through the extensions") {
    val s = Engine.connect(spark, "prod", backends)
    // graft_hexpack16: md5('x') = 9dd4e461268c8034..., first 16 nibbles
    assert(s.sql("SELECT graft_hexpack16(md5('x')) AS v").head().getLong(0) ==
      java.lang.Long.parseUnsignedLong("9dd4e461268c8034", 16))
    assert(s.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0) == 11.0)
    // the short-input guard raises instead of reading out of bounds
    val e = intercept[Exception] {
      s.sql("SELECT graft_hexpack16('abc') AS v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("at least 16 hex chars")), e.toString)
    // graft_nfc: decomposed e+U+0301 composes to U+00E9; NFC is idempotent;
    // already-normalized ASCII passes through; NULL stays NULL
    val nfc = s.sql("SELECT graft_nfc('caf' || 'e\u0301') AS v").head().getString(0)
    assert(nfc == "caf\u00e9", nfc.map(_.toInt.toHexString))
    assert(s.sql("SELECT graft_nfc(graft_nfc('caf\u00e9')) AS v")
      .head().getString(0) == "caf\u00e9")
    assert(s.sql("SELECT graft_nfc('plain ascii') AS v")
      .head().getString(0) == "plain ascii")
    assert(s.sql("SELECT graft_nfc(CAST(NULL AS STRING)) AS v").head().isNullAt(0))
  }

  test("SHOW STATUS / COM_STATISTICS: counters track statements and connections") {
    val s = Engine.connect(spark, "prod", backends)
    def status(): Map[String, String] = s.sql("SHOW STATUS").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val st0 = status()
    assert(st0.keySet == Set("Uptime", "Questions", "Slow_queries",
      "Threads_connected", "Max_used_connections", "Connections"), st0)
    assert(st0("Max_used_connections").toLong >=
      st0("Threads_connected").toLong,
      "the peak must dominate the live count")
    val q0 = st0("Questions").toLong
    s.sql("SELECT 1 AS x").collect()
    s.sql("SELECT 2 AS y").collect()
    val st1 = status()
    // the SHOW STATUS statements count themselves (MySQL semantics):
    // two SELECTs + this SHOW = +3 since the q0 reading
    assert(st1("Questions").toLong == q0 + 3, s"$st0 -> $st1")
    assert(st1("Threads_connected").toLong >= 1)
    assert(st1("Connections").toLong >= st1("Threads_connected").toLong)
    assert(st1("Uptime").toLong >= 0)
    // LIKE filtering matches the SHOW VARIABLES semantics
    val like = s.sql("SHOW STATUS LIKE 'Quest%'").collect()
    assert(like.length == 1 && like.head.getString(0) == "Questions")
    // counters are per-connection where MySQL's are (Questions), shared
    // where MySQL's are global (Connections)
    val s2 = Engine.connect(spark, "prod", backends)
    val other = s2.sql("SHOW STATUS LIKE 'Questions'")
      .head().getString(1).toLong
    assert(other < st1("Questions").toLong, s"fresh session at $other")
    // the COM_STATISTICS one-liner carries the same counters
    val line = s.statistics
    assert(line.matches("""Uptime: \d+  Threads: \d+  Questions: \d+"""), line)
  }

  test("GUI/ORM introspection surface: SHOW COLLATION/CHARSET/INDEX/ENGINES " +
      "and information_schema tables/columns/schemata") {
    // r14 conformance: the statements DBeaver-class tools and ORMs send
    // at connect/refresh. information_schema is emulated as metadata-sized
    // session views with a token-safe name rewrite, so ARBITRARY SQL over
    // it (predicates, joins, aggregates) runs through Spark unchanged.
    val s = Engine.connect(spark, "prod", backends)
    // SHOW COLLATION serves the full 220-entry registry; the engine
    // default (utf8mb4_bin, id 46) is the one marked Default
    val coll = s.sql("SHOW COLLATION").collect()
    assert(coll.length == Collations.byId.size)
    val defaults = coll.filter(_.getString(3) == "Yes")
    assert(defaults.map(_.getString(0)).toSeq == Seq("utf8mb4_bin"))
    assert(s.sql("SHOW COLLATION LIKE 'utf8mb4%'").collect()
      .forall(_.getString(1) == "utf8mb4"))
    // SHOW CHARACTER SET: utf8mb4 is 4-byte with the engine default
    val cs = s.sql("SHOW CHARACTER SET LIKE 'utf8mb4'").collect()
    assert(cs.length == 1 && cs(0).getLong(3) == 4 &&
      cs(0).getString(2) == "utf8mb4_bin", cs.toSeq)
    // SHOW INDEX: empty result with MySQL's column shape; unknown → 1146
    val idx = s.sql("SHOW INDEX FROM region")
    assert(idx.columns.length == 13 && idx.count() == 0)
    assert(idx.columns.take(3).toSeq == Seq("Table", "Non_unique", "Key_name"))
    val e = intercept[Engine.EngineError](s.sql("SHOW KEYS FROM no_such"))
    assert(e.code == 1146)
    assert(s.sql("SHOW ENGINES").collect().map(_.getString(1)).toSeq ==
      Seq("DEFAULT"))
    // SHOW TABLE STATUS: MySQL's 18-column shape, typed-NULL counters
    val ts = s.sql("SHOW TABLE STATUS LIKE 'region'")
    assert(ts.columns.length == 18 && ts.columns.take(2).toSeq ==
      Seq("Name", "Engine"))
    val tsRow = ts.head()
    assert(tsRow.getString(0) == "region" && tsRow.getString(1) == "graft" &&
      tsRow.isNullAt(4) && tsRow.getString(14) == "utf8mb4_bin")
    // information_schema.tables with the filter every tool sends
    val tbls = s.sql("SELECT table_name FROM information_schema.tables " +
      "WHERE table_schema = DATABASE() ORDER BY table_name")
      .collect().map(_.getString(0)).toSet
    Seq("region", "nation", "documents").foreach(t =>
      assert(tbls.contains(t), s"information_schema.tables missing $t"))
    assert(!tbls.exists(_.startsWith("graft_is_")),
      "helper views must not list themselves")
    // columns: names, MySQL-ish types, 1-based ordinals
    val cols = s.sql("SELECT column_name, data_type, ordinal_position " +
      "FROM information_schema.columns WHERE table_name = 'region' " +
      "ORDER BY ordinal_position").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(cols.head == (("r_regionkey", "int", 1L)), cols.toSeq)
    assert(cols.map(_._3).toSeq == (1L to cols.length).toSeq)
    // arbitrary SQL over the emulation: a join + aggregate
    val joined = s.sql(
      "SELECT t.table_name, COUNT(*) AS n FROM information_schema.tables t " +
      "JOIN information_schema.columns c ON c.table_name = t.table_name " +
      "WHERE t.table_name IN ('region','nation') GROUP BY t.table_name " +
      "ORDER BY t.table_name").collect()
    assert(joined.length == 2 && joined.forall(_.getLong(1) >= 2))
    // schemata: one row, the engine's charset identity
    val sch = s.sql("SELECT default_character_set_name, " +
      "default_collation_name FROM information_schema.schemata").collect()
    assert(sch.toSeq.map(r => (r.getString(0), r.getString(1))) ==
      Seq(("utf8mb4", "utf8mb4_bin")))
    // token-safety: the name inside a string literal stays a literal
    assert(s.sql("SELECT 'information_schema.tables' AS lit")
      .head().getString(0) == "information_schema.tables")
    // the backticked spelling GUI tools emit rewrites too
    assert(s.sql("SELECT COUNT(*) AS n FROM " +
      "`information_schema`.`tables` WHERE table_name = 'region'")
      .head().getLong(0) == 1)
    // FK/index discovery relations: correctly empty, right shape (the
    // JDBC getImportedKeys / getIndexInfo queries must parse, not error)
    assert(s.sql("SELECT column_name FROM " +
      "information_schema.key_column_usage WHERE table_name = 'region' " +
      "AND referenced_table_name IS NOT NULL").count() == 0)
    assert(s.sql("SELECT index_name, seq_in_index FROM " +
      "information_schema.statistics WHERE table_schema = DATABASE() " +
      "AND table_name = 'region' ORDER BY seq_in_index").count() == 0)
    assert(s.sql("SELECT constraint_name FROM " +
      "information_schema.referential_constraints").count() == 0)
  }

  test("every SHOW DATABASES row round-trips: information_schema and the " +
      "empty-map current database answer the qualified SHOW family and USE") {
    // code-review r15: the tree walk DBeaver/connector-j run enumerates
    // SHOW DATABASES and then issues SHOW FULL TABLES FROM / SHOW TABLE
    // STATUS FROM / USE against every advertised row — each row must
    // resolve, including information_schema (never a bound namespace) and,
    // on a session routed WITHOUT a databases map, the advertised current
    // database itself.
    val s = Engine.connect(spark, "prod", backends)
    val advertised = s.sql("SHOW DATABASES").collect().map(_.getString(0))
    assert(advertised.contains("information_schema"), advertised.toSeq)
    for (db <- advertised) {
      assert(s.sql(s"SHOW FULL TABLES FROM `$db`").count() > 0, db)
      assert(s.sql(s"SHOW TABLE STATUS FROM `$db`").count() > 0, db)
    }
    // information_schema lists its metadata views as SYSTEM VIEW with the
    // MySQL column name, engine NULL in TABLE STATUS
    val ist = s.sql("SHOW FULL TABLES FROM information_schema").collect()
    assert(ist.map(_.getString(0)).toSet ==
      Set("COLUMNS", "KEY_COLUMN_USAGE", "REFERENTIAL_CONSTRAINTS",
        "SCHEMATA", "STATISTICS", "TABLES"))
    assert(ist.forall(_.getString(1) == "SYSTEM VIEW"))
    val isSt = s.sql("SHOW TABLE STATUS FROM information_schema").collect()
    assert(isSt.forall(_.isNullAt(1)), "system views carry Engine NULL")
    // SHOW COLUMNS against an information_schema table describes the
    // backing metadata view (name lookup case-insensitive, like MySQL)
    val isCols = s.sql("SHOW COLUMNS FROM tables FROM information_schema")
      .collect().map(_.getString(0)).toSet
    assert(isCols.contains("table_name") && isCols.contains("table_schema"),
      isCols)
    assert(intercept[Engine.EngineError](
      s.sql("SHOW COLUMNS FROM nope FROM information_schema")).code == 1146)
    // USE information_schema flips DATABASE() and the unqualified listing
    // without touching the data binding; USE back restores it
    val current = s.sql("SELECT DATABASE() AS d").head().getString(0)
    s.sql("USE information_schema")
    assert(s.sql("SELECT DATABASE() AS d").head().getString(0) ==
      "information_schema")
    assert(s.sql("SHOW TABLES").collect().map(_.getString(0)).toSet
      .contains("TABLES"))
    // bare refs resolve in the metadata schema like any default db —
    // the mysql-CLI browse flow (SELECT ... FROM TABLES unqualified);
    // strings/comments stay untouched, SHOW keeps its own logic
    assert(s.sql("SELECT COUNT(*) AS n FROM TABLES").head().getLong(0) > 0)
    assert(s.sql("SELECT t.table_name FROM tables t " +
      "JOIN columns USING (table_name) WHERE t.table_name = 'region' " +
      "LIMIT 1").head().getString(0) == "region")
    assert(s.sql("SELECT 'from tables' AS lit").head().getString(0) ==
      "from tables")
    // the backtick-quoted spelling resolves identically (quote-always
    // clients); CTE names SHADOW the metadata views, MySQL's scoping rule
    assert(s.sql("SELECT COUNT(*) AS n FROM `TABLES`").head().getLong(0) > 0)
    assert(s.sql("WITH tables AS (SELECT 42 AS n) SELECT n FROM tables")
      .head().getInt(0) == 42)
    // DESC follows the default schema: metadata views describe, data
    // tables answer 1146 here (they do not exist in information_schema)
    assert(s.sql("DESC tables").collect().map(_.getString(0)).toSet
      .contains("table_name"))
    assert(intercept[Engine.EngineError](s.sql("DESC region")).code == 1146)
    // ...and bare SELECT agrees with DESC (ADVICE r15): a data table does
    // not exist in information_schema, so the unqualified read answers the
    // same 1146 MySQL does — in both spellings — while non-table FROM
    // shapes (derived tables, VALUES) keep working
    assert(intercept[Engine.EngineError](
      s.sql("SELECT * FROM region")).code == 1146)
    assert(intercept[Engine.EngineError](
      s.sql("SELECT * FROM `region`")).code == 1146)
    assert(intercept[Engine.EngineError](
      s.sql("SELECT * FROM `no such table`")).code == 1146)
    assert(s.sql("SELECT n FROM (SELECT 7 AS n) d").head().getInt(0) == 7)
    assert(s.sql("SELECT x FROM VALUES (1), (2) AS v(x) ORDER BY x LIMIT 1")
      .head().getInt(0) == 1)
    // a backticked NON-qualifying ref must become prevWord (ADVICE r15):
    // a bare alias that collides with a metadata-view name after it is an
    // alias, never a table ref to be rewritten onto information_schema
    assert(s.sql("WITH t AS (SELECT 42 AS n) " +
      "SELECT columns.n FROM `t` columns").head().getInt(0) == 42)
    // expression-level FROM (EXTRACT/TRIM/SUBSTRING) is an argument
    // separator, never a table position (code-review r16 #1)
    assert(s.sql("SELECT table_name, EXTRACT(YEAR FROM CAST('2024-01-02' " +
      "AS DATE)) AS y FROM tables LIMIT 1").head().getInt(1) == 2024)
    assert(s.sql("SELECT TRIM(BOTH 'x' FROM 'xax') AS t")
      .head().getString(0) == "a")
    assert(s.sql("SELECT SUBSTRING('abcdef' FROM 2 FOR 3) AS t")
      .head().getString(0) == "bcd")
    // commented-out text never looks like a table ref (code-review r16 #2)
    assert(s.sql("SELECT COUNT(*) AS n FROM tables # report from yesterday")
      .head().getLong(0) > 0)
    // dots recognize through whitespace: the spaced qualified spelling
    // stays qualified (code-review r16 #3)
    assert(s.sql("SELECT COUNT(*) AS n FROM information_schema . tables")
      .head().getLong(0) > 0)
    // a derived table opening with WITH is not a table ref (r16 #4)
    assert(s.sql("SELECT d.n FROM (WITH t AS (SELECT 5 AS n) " +
      "SELECT n FROM t) d").head().getInt(0) == 5)
    // info-schema identifiers match LIKE case-insensitively (manual
    // §9.2.3), unlike data-namespace table names under l_c_t_n=0
    assert(s.sql("SHOW TABLES LIKE 'tables'").count() == 1)
    assert(s.sql("SHOW TABLES FROM information_schema LIKE 'Columns'")
      .count() == 1)
    // a FAILED USE leaves the default schema untouched, like MySQL
    assert(intercept[Engine.EngineError](s.sql("USE nope_db")).code == 1105)
    assert(s.sql("SELECT DATABASE() AS d").head().getString(0) ==
      "information_schema")
    s.sql(s"USE `$current`")
    assert(s.sql("SELECT DATABASE() AS d").head().getString(0) == current)
    assert(s.sql("SELECT COUNT(*) AS n FROM region").head().getLong(0) == 5)
  }

  test("USE rebind invalidates the info-schema columns memo: a shadowed " +
      "schema never outlives the binding that created it") {
    // code-review r15 #1: the DDL-only schema generation must also see a
    // REBIND, which swaps every fixture-named view back to its declared
    // schema under an unchanged name set
    val dbs = Map("tiny" -> sf, "small" -> "/root/testdata/sf0.01")
    val s = Engine.connect(spark, "prod", backends, db = Some("tiny"),
      databases = dbs)
    def regionCols(): Seq[String] =
      s.sql("SELECT column_name FROM information_schema.columns " +
        "WHERE table_name = 'region' ORDER BY ordinal_position")
        .collect().map(_.getString(0)).toSeq
    assert(regionCols() == Seq("r_regionkey", "r_name"))
    s.sql("DROP TABLE region")
    s.sql("CREATE TABLE region (shadow_col bigint)")
    assert(regionCols() == Seq("shadow_col"), "shadow schema visible")
    s.use("small", dbs) // rebind restores the fixture views
    assert(regionCols() == Seq("r_regionkey", "r_name"),
      "memo served the departed shadow schema across a USE rebind")
  }

  test("cross-namespace SHOW COLUMNS reports the SURFACED schema: events " +
      "ts is timestamp in every namespace, never the raw declared bigint") {
    // code-review r15: the declared StructType for events carries the
    // pre-conversion nanos Long, but Tables.table always surfaces ts as
    // TimestampType — qualified introspection must describe what a reader
    // of that namespace actually gets
    val dbs = Map("tiny" -> sf, "small" -> "/root/testdata/sf0.01")
    val s = Engine.connect(spark, "prod", backends, db = Some("tiny"),
      databases = dbs)
    val qualified = s.sql("SHOW COLUMNS FROM events FROM small").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(qualified("ts") == "timestamp", qualified.toString)
    s.use("small", dbs)
    val live = s.sql("SHOW COLUMNS FROM events").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(live("ts") == "timestamp", live.toString)
  }

  test("JDBC DatabaseMetaData burst: getCatalogs/getTables/getColumns/" +
      "getPrimaryKeys statement shapes answer JDBC's column names") {
    // r15 conformance (VERDICT r14 #4): connector-j's DatabaseMetaData
    // (useInformationSchema, the 8.0.3+ default) builds its JDBC result
    // sets IN SQL — info-schema columns aliased to the JDBC spec names,
    // DATABASE() in the predicate, CASE over TABLE_TYPE — so the engine
    // must run these shapes verbatim and answer the exact column names a
    // client reads via ResultSet.getString("TABLE_CAT").
    val s = Engine.connect(spark, "prod", backends)
    // getCatalogs → SHOW DATABASES, MySQL's one-column `Database` shape
    val cats = s.sql("SHOW DATABASES")
    assert(cats.columns.toSeq == Seq("Database"), cats.columns.toSeq)
    assert(cats.collect().map(_.getString(0)).contains("information_schema"))
    // getTables — the info-schema query shape with JDBC's 10 columns
    val tables = s.sql(
      "SELECT TABLE_SCHEMA AS TABLE_CAT, NULL AS TABLE_SCHEM, TABLE_NAME, " +
      "CASE WHEN TABLE_TYPE='BASE TABLE' THEN CASE WHEN TABLE_SCHEMA = " +
      "'mysql' OR TABLE_SCHEMA = 'performance_schema' THEN 'SYSTEM TABLE' " +
      "ELSE 'TABLE' END WHEN TABLE_TYPE='TEMPORARY' THEN 'LOCAL TEMPORARY' " +
      "ELSE TABLE_TYPE END AS TABLE_TYPE, TABLE_COMMENT AS REMARKS, " +
      "NULL AS TYPE_CAT, NULL AS TYPE_SCHEM, NULL AS TYPE_NAME, " +
      "NULL AS SELF_REFERENCING_COL_NAME, NULL AS REF_GENERATION " +
      "FROM INFORMATION_SCHEMA.TABLES " +
      "WHERE TABLE_SCHEMA = DATABASE() AND TABLE_NAME LIKE 'nat%' " +
      "ORDER BY TABLE_TYPE, TABLE_SCHEMA, TABLE_NAME")
    assert(tables.columns.toSeq == Seq("TABLE_CAT", "TABLE_SCHEM",
      "TABLE_NAME", "TABLE_TYPE", "REMARKS", "TYPE_CAT", "TYPE_SCHEM",
      "TYPE_NAME", "SELF_REFERENCING_COL_NAME", "REF_GENERATION"))
    val tRows = tables.collect()
    assert(tRows.length == 1 && tRows(0).getString(2) == "nation" &&
      tRows(0).getString(3) == "TABLE", tRows.toSeq)
    // getColumns — aliases over the full MySQL COLUMNS metadata
    val gc = s.sql(
      "SELECT TABLE_SCHEMA AS TABLE_CAT, NULL AS TABLE_SCHEM, TABLE_NAME, " +
      "COLUMN_NAME, UPPER(DATA_TYPE) AS TYPE_NAME, " +
      "CHARACTER_MAXIMUM_LENGTH AS COLUMN_SIZE, " +
      "NUMERIC_SCALE AS DECIMAL_DIGITS, NUMERIC_PRECISION, " +
      "DATETIME_PRECISION, COLUMN_DEFAULT AS COLUMN_DEF, IS_NULLABLE, " +
      "ORDINAL_POSITION, CHARACTER_SET_NAME, COLLATION_NAME, COLUMN_KEY, " +
      "EXTRA, COLUMN_COMMENT AS REMARKS " +
      "FROM INFORMATION_SCHEMA.COLUMNS " +
      "WHERE TABLE_SCHEMA = DATABASE() AND TABLE_NAME = 'nation' " +
      "ORDER BY TABLE_NAME, ORDINAL_POSITION").collect()
    assert(gc.length == 3, gc.mkString("; "))
    val byName = gc.map(r => r.getString(3) ->
      (r.getString(4), Option(r.get(5)), Option(r.get(7)))).toMap
    assert(byName("n_name") == (("VARCHAR", Some(65535L), None)),
      byName.toString) // string: COLUMN_SIZE from char max, no precision
    assert(byName("n_nationkey")._1 == "INT" &&
      byName("n_nationkey")._3 == Some(10L), byName.toString)
    // getPrimaryKeys (info-schema path) — parses and answers empty
    // (parquet carries no PK structures; same contract as getIndexInfo)
    val pk = s.sql(
      "SELECT TABLE_SCHEMA AS TABLE_CAT, NULL AS TABLE_SCHEM, TABLE_NAME, " +
      "COLUMN_NAME, SEQ_IN_INDEX AS KEY_SEQ, 'PRIMARY' AS PK_NAME " +
      "FROM INFORMATION_SCHEMA.STATISTICS " +
      "WHERE TABLE_SCHEMA = DATABASE() AND TABLE_NAME = 'nation' " +
      "AND INDEX_NAME = 'PRIMARY' " +
      "ORDER BY TABLE_NAME, INDEX_NAME, SEQ_IN_INDEX")
    assert(pk.columns.toSeq == Seq("TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME",
      "COLUMN_NAME", "KEY_SEQ", "PK_NAME"))
    assert(pk.count() == 0)
    // getPrimaryKeys (SHOW path, pre-8.0.3 and DBeaver's fallback)
    val keys = s.sql("SHOW KEYS FROM `nation`")
    assert(keys.columns.length == 13 && keys.count() == 0)
    // getTables on TABLE_ROWS/TABLE_COLLATION (DBeaver's tree columns):
    // typed NULL rows, the engine collation
    val meta = s.sql("SELECT TABLE_ROWS, TABLE_COLLATION FROM " +
      "information_schema.tables WHERE table_name = 'nation'").head()
    assert(meta.isNullAt(0) && meta.getString(1) == "utf8mb4_bin")
  }

  test("SQLAlchemy connect burst: dialect initialization statements " +
      "round-trip (differs from connector-j's)") {
    // r15 conformance (VERDICT r14 #4): SQLAlchemy's MySQL dialect opens
    // with a DIFFERENT burst than connector-j — individual SHOW VARIABLES
    // probes, SELECT DATABASE(), and two CAST round-trip canaries the
    // dialect uses to detect broken charset handling. Each statement in
    // the dialect's own spelling.
    val s = Engine.connect(spark, "prod", backends)
    // dialect._get_server_version_info → SELECT VERSION()
    assert(s.sql("SELECT VERSION()").head().getString(0)
      .startsWith("8.0.11"))
    // dialect initialize(): sql_mode probe decides ANSI-quote handling
    val mode = s.sql("SHOW VARIABLES LIKE 'sql_mode'").collect()
    assert(mode.length == 1 && mode(0).getString(0) == "sql_mode")
    val lct = s.sql("SHOW VARIABLES LIKE 'lower_case_table_names'").collect()
    assert(lct.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("lower_case_table_names", "0")))
    // default schema name
    assert(s.sql("SELECT DATABASE()").count() == 1)
    // the two returns-canaries (sqlalchemy engine/default.py): a dialect
    // that can't round-trip these marks the connection unusable
    val plain = s.sql(
      "SELECT CAST('test plain returns' AS CHAR(60)) AS anon_1").head()
    assert(plain.getString(0) == "test plain returns")
    val uni = s.sql(
      "SELECT CAST('test unicode returns' AS CHAR(60)) AS anon_1").head()
    assert(uni.getString(0) == "test unicode returns")
    // has_table() probe: DESCRIBE inside a try — present table answers,
    // absent table raises the 1146 the dialect catches
    assert(s.sql("DESCRIBE `nation`").count() == 3)
    assert(intercept[Engine.EngineError](
      s.sql("DESCRIBE `no_such_table`")).code == 1146)
    // reflection reads SHOW CREATE TABLE's 2-column shape
    val sct = s.sql("SHOW CREATE TABLE `nation`")
    assert(sct.columns.toSeq == Seq("Table", "Create Table"))
    assert(sct.head().getString(1).startsWith("CREATE TABLE `nation`"))
    // pool reset between checkouts
    s.sql("ROLLBACK")
    assert(s.sql("SELECT 1 AS ping").head().get(0) == 1)
  }

  test("PyMySQL and mysql-connector-python connect bursts round-trip " +
      "(differ from connector-j's and SQLAlchemy's)") {
    // r16 conformance (VERDICT r15 #5). PyMySQL (pymysql/connections.py
    // connect()): the charset rides the handshake — no SET NAMES — then
    // the optional sql_mode, the init_command followed by COMMIT, and
    // autocommit(False): PyMySQL's default differs from the server's ON,
    // so it always sends SET AUTOCOMMIT = 0 on a stock connect.
    val s = Engine.connect(spark, "prod", backends)
    s.sql("SET sql_mode = 'STRICT_TRANS_TABLES'")
    assert(s.sql("SHOW VARIABLES LIKE 'sql_mode'").head().getString(1) ==
      "STRICT_TRANS_TABLES")
    s.sql("SET @init_done = 1") // init_command stand-in
    s.sql("COMMIT")
    s.sql("SET AUTOCOMMIT = 0")
    assert((s.statusFlags & Engine.Status.Autocommit) == 0,
      "status word must track PyMySQL's autocommit probe")
    // get_autocommit() reads the OK status word; the text probe agrees
    assert(s.sql("SELECT @@autocommit AS a").head().get(0) == 0)
    s.sql("SET AUTOCOMMIT = 1")
    assert((s.statusFlags & Engine.Status.Autocommit) != 0)
    // show_warnings() — sent whenever an OK reports warnings (ours never
    // do, but the statement must answer MySQL's 3-column shape)
    val w = s.sql("SHOW WARNINGS")
    assert(w.columns.toSeq == Seq("Level", "Code", "Message"))
    assert(w.count() == 0)
    assert(s.sql("SHOW COUNT(*) WARNINGS").columns.toSeq ==
      Seq("@@session.warning_count"))
    // mysql-connector-python _post_connection(): set_charset_collation →
    // an explicit SET NAMES ... COLLATE, then the autocommit property
    // setter's @@session spelling, then optional time_zone
    s.sql("SET NAMES 'utf8mb4' COLLATE 'utf8mb4_general_ci'")
    assert(s.sql("SHOW VARIABLES LIKE 'collation_connection'")
      .head().getString(1) == "utf8mb4_general_ci")
    s.sql("SET @@session.autocommit = OFF")
    assert(s.sql("SELECT @@autocommit AS a").head().get(0) == 0)
    s.sql("SET @@session.autocommit = ON")
    s.sql("SET @@session.time_zone = '+00:00'")
    assert(s.sql("SHOW VARIABLES LIKE 'time_zone'").head().getString(1) ==
      "+00:00")
    s.sql("SET NAMES utf8mb4") // restore the engine default collation
  }

  test("DBeaver tree expansion: SHOW DATABASES -> SHOW TABLE STATUS -> " +
      "SHOW FULL COLUMNS chain in DBeaver's backticked spellings") {
    // r16 conformance (VERDICT r15 #5): DBeaver expands its database tree
    // with native SHOW statements (not JDBC metadata), reading several
    // answers by POSITION — the column ORDER is part of the contract.
    val dbs = Map("small" -> sf)
    val s = Engine.connect(spark, "prod", backends, databases = dbs)
    val dblist = s.sql("SHOW DATABASES").collect().map(_.getString(0))
    assert(dblist.contains("small"), dblist.toSeq)
    val st = s.sql("SHOW TABLE STATUS FROM `small`")
    assert(st.columns.take(5).toSeq ==
      Seq("Name", "Engine", "Version", "Row_format", "Rows"))
    assert(st.collect().map(_.getString(0)).contains("region"))
    val fc = s.sql("SHOW FULL COLUMNS FROM `region` FROM `small`")
    // MySQL's FULL order (manual §15.7.7.6): Collation sits right after
    // Type — DBeaver renders its column labels positionally
    assert(fc.columns.toSeq == Seq("Field", "Type", "Collation", "Null",
      "Key", "Default", "Extra", "Privileges", "Comment"))
    val rName = fc.collect().find(_.getString(0) == "r_name").get
    assert(rName.getString(2) == "utf8mb4_bin") // a string column collates
    // the config panes probe engines/charsets, the editor polls warnings
    assert(s.sql("SHOW ENGINES").count() >= 1)
    assert(s.sql("SHOW CHARSET").count() >= 1)
    assert(s.sql("SHOW WARNINGS LIMIT 1").count() == 0)
  }

  test("go-sql-driver and PHP PDO connect bursts: the remaining flavor " +
      "statement shapes round-trip; the replay corpus is saturated") {
    // r17 conformance (VERDICT r16 #6). go-sql-driver/mysql: the charset
    // rides the handshake; with maxAllowedPacket=0 in the DSN the driver
    // probes `SELECT @@max_allowed_packet` and reads the value BY
    // POSITION (the value, not the column name, is its contract); then
    // handleParams() joins every remaining DSN param into ONE combined
    // SET statement; queries default to the binary prepared path (the
    // COM_STMT specs). Liveness is COM_PING (wire-level, pinned in
    // MySqlServerSpec).
    val s = Engine.connect(spark, "prod", backends)
    assert(s.sql("SELECT @@max_allowed_packet").head().get(0).toString ==
      "67108864")
    s.sql("SET sql_mode='STRICT_TRANS_TABLES,NO_ENGINE_SUBSTITUTION', " +
      "time_zone='+00:00'")
    assert(s.sql("SHOW VARIABLES LIKE 'sql_mode'").head().getString(1) ==
      "STRICT_TRANS_TABLES,NO_ENGINE_SUBSTITUTION")
    assert(s.sql("SHOW VARIABLES LIKE 'time_zone'").head().getString(1) ==
      "+00:00")
    s.sql("SET NAMES utf8mb4") // the charset DSN param's spelling
    // PHP PDO (mysqlnd): the handshake carries the charset; the only
    // statement a stock connect adds is MYSQL_ATTR_INIT_COMMAND
    // (conventionally SET NAMES); ATTR_SERVER_INFO maps to COM_STATISTICS
    // (wire-level, pinned in MySqlServerSpec); emulated prepares — PDO's
    // default — send plain COM_QUERY text with backslash-escaped
    // client-quoted literals.
    s.sql("SET NAMES utf8mb4") // PDO init_command stand-in
    assert(s.sql("SELECT 'pdo\\'quoted' AS v").head().getString(0) ==
      "pdo'quoted")
    // Corpus saturation: seven flavors are now replayed verbatim
    // (connector-j, SQLAlchemy, PyMySQL, connector-python, DBeaver,
    // go-sql-driver, PDO/mysqlnd) — their union covers handshake-charset,
    // SET NAMES (plain and COLLATE), sysvar probes (SELECT @@x, SHOW
    // VARIABLES LIKE), combined SET lists, autocommit (both spellings),
    // init commands, and the JDBC/metadata chains; a further client
    // flavor recombines these shapes rather than adding one.
  }

  test("dump RESTORE: a mysqldump table section replays end-to-end " +
      "(DROP/CREATE/LOCK/INSERT with MySQL types and escapes)") {
    // r14: the restore direction of the dump round-trip — the exact
    // statement shapes mysqldump 8.0 emits for one table, fed through the
    // session as a batch the way a client replays a dump file.
    val s = Engine.connect(spark, "prod", backends)
    val dump =
      """DROP TABLE IF EXISTS `t_dump`;
        |/*!40101 SET @saved_cs_client = @@character_set_client */;
        |/*!50503 SET character_set_client = utf8mb4 */;
        |CREATE TABLE `t_dump` (
        |  `id` int(11) NOT NULL AUTO_INCREMENT,
        |  `name` varchar(64) COLLATE utf8mb4_bin NOT NULL,
        |  `bal` decimal(12,2) DEFAULT NULL,
        |  `note` text,
        |  `kind` enum('a','b') DEFAULT 'a',
        |  `created` datetime DEFAULT NULL,
        |  `payload` blob,
        |  `n_u` int(10) unsigned DEFAULT NULL,
        |  `big_u` bigint(20) unsigned DEFAULT NULL,
        |  PRIMARY KEY (`id`),
        |  UNIQUE KEY `uq_name` (`name`),
        |  KEY `ix_kind` (`kind`,`created`)
        |) ENGINE=InnoDB AUTO_INCREMENT=4 DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_bin;
        |/*!40101 SET character_set_client = @saved_cs_client */;
        |LOCK TABLES `t_dump` WRITE;
        |/*!40000 ALTER TABLE `t_dump` DISABLE KEYS */;
        |INSERT INTO `t_dump` VALUES (1,'alice',10.50,'first, (note)','a','2024-01-02 03:04:05',NULL,7,18446744073709551615),(2,'bob\'s',NULL,'it\'s',NULL,NULL,NULL,NULL,NULL);
        |/*!40000 ALTER TABLE `t_dump` ENABLE KEYS */;
        |UNLOCK TABLES;""".stripMargin
    s.sqlBatch(dump)
    // the restored table is a first-class session relation
    assert(s.sql("SHOW TABLES LIKE 't_dump'").count() == 1)
    // JDBC metadata escapes wildcards: \_ must match a LITERAL underscore
    assert(s.sql("SHOW TABLES LIKE 't\\_dump'").count() == 1)
    assert(s.sql("SHOW TABLES LIKE 'tXdump'").count() == 0)
    val types = s.sql("DESCRIBE t_dump").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(types("id") == "int" && types("name") == "varchar" &&
      types("bal") == "decimal" && types("created") == "timestamp" &&
      types("payload") == "blob", types.toString)
    // unsigned widening: int unsigned → bigint, bigint unsigned → decimal
    assert(types("n_u") == "bigint" && types("big_u") == "decimal", types)
    val rows = s.sql("SELECT id, name, note, CAST(bal AS STRING) AS bal, " +
      "CAST(big_u AS STRING) AS bu FROM t_dump ORDER BY id").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "alice" &&
      rows(0).getString(3) == "10.50" &&
      rows(0).getString(4) == "18446744073709551615")
    // MySQL's backslash escapes survive the literal path
    assert(rows(1).getString(1) == "bob's" && rows(1).getString(2) == "it's")
    // column-subset INSERT fills the rest with typed NULLs
    s.sql("INSERT INTO t_dump (id, name) VALUES (3, 'carol')")
    val carol = s.sql("SELECT bal, kind FROM t_dump WHERE id = 3").head()
    assert(carol.isNullAt(0) && carol.isNullAt(1))
    // INSERT … SELECT appends through the same path
    s.sql("INSERT INTO t_dump (id, name) SELECT 4, 'dave'")
    assert(s.sql("SELECT COUNT(*) AS n FROM t_dump").head().getLong(0) == 4)
    // MySQL error contract: 1050 duplicate CREATE (IF NOT EXISTS is OK),
    // 1051 unknown DROP, 1054 unknown column, 1136 arity
    assert(intercept[Engine.EngineError](
      s.sql("CREATE TABLE t_dump (x int)")).code == 1050)
    s.sql("CREATE TABLE IF NOT EXISTS t_dump (x int)") // absorbed, no-op
    assert(intercept[Engine.EngineError](
      s.sql("DROP TABLE no_such_t")).code == 1051)
    assert(intercept[Engine.EngineError](
      s.sql("INSERT INTO t_dump (nope) VALUES (1)")).code == 1054)
    assert(intercept[Engine.EngineError](
      s.sql("INSERT INTO t_dump (id, name) VALUES (9)")).code == 1136)
    // a Spark-dialect CREATE with USING relays untouched (not intercepted:
    // Spark itself rejects the unknown format — its error class, not ours,
    // proves the statement reached the relay)
    intercept[Exception](
      s.sql("CREATE TABLE t_spark (a int) USING nosuchformat OPTIONS (x 'y')"))
    assert(s.sql("SHOW TABLES LIKE 't_spark'").count() == 0)
    s.sql("DROP TABLE t_dump")
    assert(s.sql("SHOW TABLES LIKE 't_dump'").count() == 0)
  }

  test("skip-extended-insert restore: 1000 single-row INSERTs stay O(K) " +
      "per statement (append-chain compaction, VERDICT r14 #1)") {
    // a --skip-extended-insert dump emits one INSERT per row; before r15
    // each statement stacked one UNION ALL arm, so the analyzer re-walked
    // an ever-deeper plan — O(N²) total and an eventual planner stack
    // overflow. swapAppendedView compacts through localCheckpoint every
    // appendCompactEvery statements, so the ANALYZED PLAN SIZE (the direct
    // driver of per-statement analyzer cost) stays bounded by K, not N.
    val s = Engine.connect(spark, "prod", backends)
    s.sql("DROP TABLE IF EXISTS t_flat")
    s.sql("CREATE TABLE t_flat (id int, v varchar(32))")
    val n = 1000
    var planSizeMax = 0
    (1 to n).foreach { i =>
      s.sql(s"INSERT INTO t_flat VALUES ($i, 'row$i')")
      if (i % 100 == 0) {
        val size = s.spark.table("t_flat").queryExecution.analyzed.collect {
          case p => p }.size
        planSizeMax = planSizeMax.max(size)
      }
    }
    // plan size bounded by the compaction window, not the statement count:
    // each un-compacted arm is ~7 nodes (Union + alignment Projects +
    // LocalRelation), so the ceiling is ~7K ≈ 450 — vs ~7000 nodes
    // uncompacted at N=1000
    val bound = Engine.appendCompactEvery * 8
    assert(planSizeMax <= bound,
      s"analyzed plan grew to $planSizeMax nodes (bound $bound) — " +
        "append compaction is not firing")
    // a checkpoint actually happened: the view's lineage was truncated to
    // a materialized leaf (LogicalRDD / scan-of-checkpoint), so the plan
    // no longer contains the CREATE-time empty LocalRelation root
    val leafy = s.spark.table("t_flat").queryExecution.analyzed
    assert(leafy.collectLeaves().exists(
      _.getClass.getSimpleName.contains("LogicalRDD")),
      s"expected a checkpointed leaf, got ${leafy.collectLeaves()}")
    // correctness across every checkpoint boundary: nothing lost, nothing
    // doubled, values intact
    val agg = s.sql("SELECT COUNT(*) AS c, CAST(SUM(id) AS BIGINT) AS t " +
      "FROM t_flat").head()
    assert(agg.getLong(0) == n && agg.getLong(1) == n.toLong * (n + 1) / 2)
    assert(s.sql("SELECT v FROM t_flat WHERE id = 1").head()
      .getString(0) == "row1")
    assert(s.sql("SELECT v FROM t_flat WHERE id = 937").head()
      .getString(0) == "row937")
    // DROP + same-name CREATE resets the arm counter AND information_schema
    // serves the NEW schema (the memo is generation-keyed, ADVICE r14)
    s.sql("SELECT table_name FROM information_schema.tables " +
      "WHERE table_name = 't_flat'") // warm the memo on the old schema
    s.sql("DROP TABLE t_flat")
    s.sql("CREATE TABLE t_flat (other_col bigint)")
    val cols = s.sql("SELECT column_name FROM information_schema.columns " +
      "WHERE table_name = 't_flat' ORDER BY ordinal_position").collect()
      .map(_.getString(0)).toSeq
    assert(cols == Seq("other_col"),
      s"information_schema served a stale schema: $cols")
    s.sql("DROP TABLE t_flat")
  }

  test("mysqldump session replay: versioned comments, TX isolation, " +
      "save/restore via user vars, LOCK/FLUSH no-ops") {
    // r14 conformance: the exact statement sequence mysqldump 8.0 sends
    // (opening with --single-transaction, table bracketing without it,
    // and the closing restore) — each line verbatim from a real dump run.
    val s = Engine.connect(spark, "prod", backends)
    // opening burst: whole-statement version-conditional comments EXECUTE
    s.sql("/*!40100 SET @@SQL_MODE='' */")
    assert(s.variable("sql_mode").contains(""), "SQL_MODE must be set empty")
    s.sql("/*!40103 SET @OLD_TIME_ZONE=@@TIME_ZONE */")
    s.sql("/*!40103 SET TIME_ZONE='+00:00' */")
    assert(s.variable("time_zone").contains("+00:00"))
    // flip isolation first so the explicit SET is observable
    s.sql("SET SESSION TRANSACTION ISOLATION LEVEL READ COMMITTED")
    assert(s.variable("transaction_isolation").contains("READ-COMMITTED"))
    assert(s.variable("tx_isolation").contains("READ-COMMITTED"))
    s.sql("SET SESSION TRANSACTION ISOLATION LEVEL REPEATABLE READ")
    assert(s.variable("transaction_isolation").contains("REPEATABLE-READ"))
    // START TRANSACTION with the inline versioned comment is absorbed
    s.sql("START TRANSACTION /*!40100 WITH CONSISTENT SNAPSHOT */")
    // probe mysqldump runs against NDB — must answer an EMPTY set, not ERR
    assert(s.sql("SHOW VARIABLES LIKE 'ndbinfo_version'").count() == 0)
    // the per-table dump pair still works inside the transaction
    assert(s.sql("SHOW CREATE TABLE region").count() == 1)
    assert(s.sql(
      "SELECT /*!40001 SQL_NO_CACHE */ * FROM region").count() == 5)
    s.sql("COMMIT")
    // table bracketing (no --single-transaction): all no-op OKs
    s.sql("LOCK TABLES `region` READ /*!32311 LOCAL */")
    s.sql("UNLOCK TABLES")
    s.sql("FLUSH TABLES")
    s.sql("ALTER TABLE region DISABLE KEYS")
    s.sql("ALTER TABLE region ENABLE KEYS")
    // closing restore: RHS user-var reference resolves to the SAVED value
    s.sql("/*!40103 SET TIME_ZONE=@OLD_TIME_ZONE */")
    assert(s.variable("time_zone").contains("UTC"),
      s"restore must read @OLD_TIME_ZONE back, got ${s.variable("time_zone")}")
    // a version gate ABOVE the engine's compat level is a comment → the
    // statement is empty → MySQL's ER 1065
    val e = intercept[Engine.EngineError](s.sql("/*!990000 SELECT 1 */"))
    assert(e.code == 1065, s"above-version comment must be 1065, got $e")
    // ...but the gate must agree with the ADVERTISED version: a server
    // greeting 8.0.11 executes a /*!80011 …*/ body (ADVICE r14)
    assert(Engine.effectiveMysqlVersion ==
      Engine.version.takeWhile(c => c.isDigit || c == '.')
        .split('.').map(_.toInt).reduceLeft(_ * 100 + _),
      "effectiveMysqlVersion must equal the numeric prefix of the greeting")
    assert(s.sql("/*!80011 SELECT 1 AS one */").count() == 1)
    // SET time_zone = NULL answers 1231 and leaves the session healthy
    // (storing the sentinel would poison spark.sql.session.timeZone)
    val eTz = intercept[Engine.EngineError](s.sql("SET time_zone = NULL"))
    assert(eTz.code == 1231, eTz.toString)
    assert(s.sql("SELECT CAST(TIMESTAMP '2024-01-01 00:00:00' AS STRING) " +
      "AS t").head().getString(0).startsWith("2024-01-01"))
    // a MULTI-segment versioned statement (trigger/routine blocks) must
    // NOT stitch into garbage — it relays untouched and fails loudly
    intercept[Exception](s.sql(
      "/*!50003 CREATE*/ /*!50017 DEFINER=`u`@`h`*/ /*!50003 TRIGGER x */"))
    // quoted RHS stays a literal string, never a reference
    s.sql("SET @lit = '@@time_zone'")
    assert(s.sql("SELECT @lit AS v").head().getString(0) == "@@time_zone")
    // unknown characteristics stay MySQL-shaped errors
    val e2 = intercept[Engine.EngineError](
      s.sql("SET SESSION TRANSACTION ISOLATION LEVEL CHAOS"))
    assert(e2.code == 1064)
  }

  test("mysql-CLI handshake sequence: version_comment, SET NAMES, SHOW VARIABLES") {
    val s = Engine.connect(spark, "prod", backends)
    // the mysql CLI's literal first statement after connecting
    assert(s.sql("select @@version_comment limit 1").head().getString(0) ==
      "graft Spark engine")
    assert(s.sql("SELECT @@version AS v").head().getString(0) == Engine.version)
    s.sql("SET NAMES utf8mb4 COLLATE utf8mb4_bin") // absorbed, empty OK result
    val vars = s.sql("SHOW VARIABLES LIKE 'character_set_%'")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(vars("character_set_client") == "utf8mb4", vars)
    // client/connection/results (the SET NAMES trio) + the server/database
    // charsets a stock connector reads at connect (r14)
    assert(vars.size == 5, vars)
    // full listing contains the seeded defaults
    assert(s.sql("SHOW VARIABLES").count() >= 15)
  }

  test("SET NAMES … COLLATE maps onto the session's Spark collation") {
    val s = Engine.connect(spark, "prod", backends)
    // reference default: utf8mb4_bin (constants.go:6) → binary comparison
    assert(s.variable("collation_connection").contains("utf8mb4_bin"))
    assert(s.sparkCollation == "UTF8_BINARY")
    assert(!s.sql("SELECT 'ABC' COLLATE UTF8_BINARY = 'abc' AS eq")
      .head().getBoolean(0))
    // the most common client collation: case-insensitive
    s.sql("SET NAMES utf8mb4 COLLATE utf8mb4_general_ci")
    assert(s.variable("collation_connection").contains("utf8mb4_general_ci"))
    assert(s.sparkCollation == "UTF8_LCASE")
    assert(s.sql(s"SELECT 'ABC' COLLATE ${s.sparkCollation} = 'abc' AS eq")
      .head().getBoolean(0))
    // MySQL 8's default and an accent/case-sensitive one
    s.sql("SET NAMES utf8mb4 COLLATE utf8mb4_0900_ai_ci")
    assert(s.sparkCollation == "UTF8_LCASE")
    s.sql("SET NAMES utf8mb4 COLLATE utf8mb4_0900_as_cs")
    assert(s.sparkCollation == "UTF8_BINARY")
    // SET NAMES without COLLATE resets to the engine default
    s.sql("SET NAMES utf8mb4")
    assert(s.variable("collation_connection").contains("utf8mb4_bin"))
  }

  test("system variables: SET forms, typed read-back, unknown-variable error") {
    val s = Engine.connect(spark, "prod", backends)
    s.sql("SET autocommit = OFF")
    assert(s.sql("SELECT @@autocommit AS a").head().getInt(0) == 0)
    s.sql("SET @@session.autocommit = 1, @@sql_mode = 'ANSI_QUOTES'")
    assert(s.sql("SELECT @@autocommit AS a").head().getInt(0) == 1)
    assert(s.sql("SELECT @@session.sql_mode AS m").head().getString(0) ==
      "ANSI_QUOTES")
    val e = intercept[Engine.EngineError] { s.sql("SELECT @@no_such_var") }
    assert(e.code == 1193, e.toString)
    // '@@' inside a string literal is data, not a variable reference
    assert(s.sql("SELECT '@@autocommit' AS s").head().getString(0) ==
      "@@autocommit")
  }

  test("SET time_zone maps onto the Spark session time zone, per session") {
    val s = Engine.connect(spark, "prod", backends)
    val other = Engine.connect(spark, "prod", backends)
    s.sql("SET time_zone = '+02:00'")
    assert(s.sql("SELECT hour(timestamp'2026-01-01 00:00:00Z') AS h")
      .head().getInt(0) == 2)
    // isolation: the second session still evaluates in UTC
    assert(other.sql("SELECT hour(timestamp'2026-01-01 00:00:00Z') AS h")
      .head().getInt(0) == 0)
    s.sql("SET time_zone = SYSTEM")
    assert(s.variable("time_zone").contains("UTC"))
  }

  test("user variables: SET @x, read-back, unset reads as NULL") {
    val s = Engine.connect(spark, "prod", backends)
    s.sql("SET @k = 3, @name = 'AFRICA'")
    assert(s.sql("SELECT @k + 1 AS y").head().getInt(0) == 4)
    assert(s.sql("SELECT r_regionkey FROM region WHERE r_name = @name")
      .head().getAs[Number](0).intValue == 0)
    assert(s.sql("SELECT @never_set AS v").head().isNullAt(0))
  }

  test("Spark conf SET statements relay untouched (shared SET syntax)") {
    val s = Engine.connect(spark, "prod", backends)
    s.sql("SET spark.sql.shuffle.partitions=7")
    assert(s.spark.conf.get("spark.sql.shuffle.partitions") == "7")
    s.sql("SET spark.sql.shuffle.partitions=4")
    // a handshake-style batch accumulates state through the session
    val out = s.sqlBatch(
      "SET NAMES utf8; SET autocommit=1; SELECT @@character_set_client AS c")
    assert(out.last.head().getString(0) == "utf8")
  }

  test("ping reports backend liveness (COM_PING analog)") {
    val s = Engine.connect(spark, "prod", backends)
    assert(s.ping())
  }

  test("EXPLAIN relays through the session and returns the plan text") {
    val s = Engine.connect(spark, "prod", backends)
    val plan = s.sql("EXPLAIN SELECT r_name FROM region WHERE r_regionkey = 1")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.contains("Physical Plan"), plan.take(200))
    assert(plan.toLowerCase.contains("region"))
    // EXPLAIN EXTENDED carries the analyzed/optimized sections too
    val ext = s.sql("EXPLAIN EXTENDED SELECT COUNT(*) FROM nation")
      .collect().map(_.getString(0)).mkString("\n")
    assert(ext.contains("== Optimized Logical Plan =="), ext.take(200))
  }

  test("malformed CSV rows: DROPMALFORMED skips, PERMISSIVE surfaces them") {
    // ingest robustness — a 100 TB bulk load always contains broken lines;
    // the engine must be able to either drop or quarantine them without
    // failing the job
    import org.apache.spark.sql.types._
    val f = java.nio.file.Files.createTempFile("graft_bad_", ".csv")
    java.nio.file.Files.writeString(f, "1,a\nnot_an_int,b\n3,c\n4\n")
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("tag", StringType)))
    val dropped = spark.read.schema(schema).option("mode", "DROPMALFORMED")
      .csv(f.toString).collect()
    assert(dropped.map(_.getInt(0)).sorted.toSeq == Seq(1, 3),
      "only the two well-formed rows survive DROPMALFORMED")
    val quarantineSchema = schema.add("_corrupt_record", StringType)
    val kept = spark.read.schema(quarantineSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(f.toString).collect()
    assert(kept.length == 4)
    val corrupt = kept.filter(!_.isNullAt(2)).map(_.getString(2)).toSet
    assert(corrupt == Set("not_an_int,b", "4"),
      s"both broken lines must land in the quarantine column, got $corrupt")
  }

  test("LOAD DATA INFILE appends a delimited file into a session table") {
    val s = Engine.connect(spark, "prod", backends)
    s.sql("CREATE OR REPLACE TEMPORARY VIEW stage AS " +
      "SELECT r_regionkey, r_name FROM region WHERE 1 = 0")
    val f = java.nio.file.Files.createTempFile("graft_load_", ".csv")
    java.nio.file.Files.writeString(f, "7,mars\n8,venus\n")
    s.sql(s"LOAD DATA INFILE '$f' INTO TABLE stage " +
      "FIELDS TERMINATED BY ','")
    assert(s.sql("SELECT COUNT(*) AS n FROM stage").head().getLong(0) == 2)
    // a second load APPENDS (MySQL semantics), schema comes from the table
    s.sql(s"LOAD DATA INFILE '$f' INTO TABLE stage " +
      "FIELDS TERMINATED BY ','")
    val rows = s.sql("SELECT r_regionkey, r_name FROM stage ORDER BY 1, 2")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == Seq((7, "mars"), (7, "mars"), (8, "venus"), (8, "venus")))
    // unknown target table → MySQL error 1146
    assert(intercept[Engine.EngineError] {
      s.sql(s"LOAD DATA INFILE '$f' INTO TABLE nope")
    }.code == 1146)
    // the LOCAL form is EXCLUSIVELY the capability-gated wire flow: on the
    // statement/embedded path (no client file stream) it must refuse with
    // MySQL's 1148 rather than read the CLIENT's filename as a SERVER path
    // (ADVICE r11)
    assert(intercept[Engine.EngineError] {
      s.sql(s"LOAD DATA LOCAL INFILE '$f' INTO TABLE stage " +
        "FIELDS TERMINATED BY ','")
    }.code == 1148)
    // ... and the refusal must not have appended anything
    assert(s.sql("SELECT COUNT(*) AS n FROM stage").head().getLong(0) == 4)
  }

  test("connect attrs surface in SHOW PROCESSLIST's Program column") {
    val s = Engine.connect(spark, "prod", backends,
      attrs = Map("program_name" -> "mysqldump", "_client_version" -> "8.0"))
    assert(s.attrs("_client_version") == "8.0")
    val row = s.sql("SHOW PROCESSLIST").collect()
      .find(_.getLong(0) == s.connectionId).get
    assert(row.getString(4) == "mysqldump", row)
    // a session with no attrs shows an empty Program
    val bare = Engine.connect(spark, "prod", backends)
    val bareRow = bare.sql("SHOW PROCESSLIST").collect()
      .find(_.getLong(0) == bare.connectionId).get
    assert(bareRow.getString(4) == "")
    s.close(); bare.close()
  }

  test("processlist prunes registry entries for sessions GC'd without close") {
    var s = Engine.connect(spark, "prod", backends)
    val id = s.connectionId
    assert(Engine.processList.exists(_._1 == id))
    s = null // abandon without close(); the weak ref clears on GC
    var pruned = false
    var attempts = 0
    while (!pruned && attempts < 40) {
      System.gc(); Thread.sleep(25)
      pruned = !Engine.processList.exists(_._1 == id)
      attempts += 1
    }
    assert(pruned, s"registry entry for $id survived $attempts GC attempts")
  }

  test("user variables keep switch words verbatim; system variables map to 1/0") {
    val s = Engine.connect(spark, "prod", backends)
    s.sql("SET @sw = 'ON', @swb = 'FALSE'")
    assert(s.sql("SELECT @sw AS v").head().getString(0) == "ON")
    assert(s.sql("SELECT @swb AS v").head().getString(0) == "FALSE")
    s.sql("SET autocommit = ON")
    assert(s.sql("SELECT @@autocommit AS a").head().getInt(0) == 1)
  }

  test("EXECUTE ignores ? placeholders inside comments") {
    val s = Engine.connect(spark, "prod", backends)
    s.sql("SET @x = 7")
    s.sql("PREPARE pc FROM 'SELECT ? /* not ? a param */ AS v -- ? neither\n'")
    // one real placeholder: a single USING arg must bind cleanly (the
    // unskipped scan consumed args for the commented ?s → spurious 1210)
    assert(s.sql("EXECUTE pc USING @x").head().get(0).toString == "7")
    intercept[Engine.EngineError] { s.sql("EXECUTE pc USING @x, @x") }
  }

  test("streamBatch delivers per-statement result sets lazily and in order") {
    val s = Engine.connect(spark, "prod", backends)
    val it = s.streamBatch(
      "SET NAMES utf8; SELECT @@character_set_client AS c; SELECT bogus syntax")
    // statement boundaries: each element is (index, row iterator)
    val (i0, r0) = it.next()
    assert(i0 == 0 && r0.isEmpty) // SET produces an empty OK result
    val (i1, r1) = it.next()
    // in-order execution: the second statement observes the first's state
    assert(i1 == 1 && r1.next().getString(0) == "utf8")
    // lazy: the malformed third statement only fails when reached
    intercept[Engine.EngineError] { it.next() }
    s.close()
  }

  test("server status bits track session state (constants.go:22-37)") {
    val s = Engine.connect(spark, "prod", backends)
    import Engine.Status._
    assert((s.statusFlags & Autocommit) != 0)
    assert((s.statusFlags & InTrans) == 0)
    s.sql("BEGIN")
    assert((s.statusFlags & InTrans) != 0)
    s.sql("COMMIT")
    assert((s.statusFlags & InTrans) == 0)
    s.sql("SET autocommit = OFF")
    assert((s.statusFlags & Autocommit) == 0)
    s.sql("SET autocommit = ON")
    // cursor bits follow the last stream(): EXISTS while rows remain,
    // LAST_ROW_SENT once drained
    val it = s.stream("SELECT n_nationkey FROM nation")
    assert((s.statusFlags & CursorExists) != 0)
    assert((s.statusFlags & LastRowSent) == 0)
    while (it.hasNext) it.next()
    assert((s.statusFlags & LastRowSent) != 0)
    assert((s.statusFlags & CursorExists) == 0)
    // MORE_RESULTS_EXISTS is up exactly between streamBatch result sets
    val b = s.streamBatch("SELECT 1 AS a; SELECT 2 AS b")
    b.next()
    assert((s.statusFlags & MoreResultsExists) != 0)
    b.next()
    assert((s.statusFlags & MoreResultsExists) == 0)
    // PS_OUT_PARAMS is mapped but never originated (no stored procedures)
    assert(PsOutParams == 0x1000 && (s.statusFlags & PsOutParams) == 0)
    s.close()
  }

  test("session close() leaves the processlist (COM_QUIT)") {
    val s = Engine.connect(spark, "prod", backends)
    val listed = () => Engine.processList.exists(_._1 == s.connectionId)
    assert(listed())
    s.close()
    assert(!listed())
  }

  test("SHOW PROCESSLIST lists live connections with their state") {
    val a = Engine.login(spark, "prod.alice", backends)
    val b = Engine.login(spark, "staging.bob", backends)
    b.sql("BEGIN")
    val rows = a.sql("SHOW PROCESSLIST").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(a.connectionId) == ((a.connectionId, "alice", "prod", "idle")))
    assert(byId(b.connectionId) ==
      ((b.connectionId, "bob", "staging", "in transaction")))
    b.sql("ROLLBACK")
    // the processlist feeds KILL: ids listed are valid cancel targets
    assert(a.sql(s"KILL QUERY ${b.connectionId}").collect().isEmpty)
  }

  test("text-protocol PREPARE/EXECUTE USING/DEALLOCATE round-trips") {
    val s = Engine.connect(spark, "prod", backends)
    s.sql("PREPARE topn FROM 'SELECT o_orderkey FROM orders WHERE " +
      "o_totalprice > ? ORDER BY o_orderkey LIMIT ?'")
    s.sql("SET @p = 100000, @n = 3")
    val rows = s.sql("EXECUTE topn USING @p, @n").collect()
    assert(rows.length == 3)
    // rebind with different values on the SAME handle
    s.sql("SET @n = 1")
    assert(s.sql("EXECUTE topn USING @p, @n").collect().length == 1)
    // a '?' inside a string literal is data, not a placeholder
    s.sql("PREPARE q FROM 'SELECT ''a?b'' AS v, ? AS w'")
    val r = s.sql("EXECUTE q USING @n").head()
    assert(r.getString(0) == "a?b" && r.getInt(1) == 1)
    // string values bind escaped (injection-shaped input stays a literal)
    s.sql("SET @s = 'x'' OR ''1''=''1'")
    s.sql("PREPARE inj FROM 'SELECT ? AS v'")
    assert(s.sql("EXECUTE inj USING @s").head().getString(0) == "x' OR '1'='1")
    // arity mismatch and unknown handles raise MySQL-coded errors
    assert(intercept[Engine.EngineError] {
      s.sql("EXECUTE topn USING @p")
    }.code == 1210)
    s.sql("DEALLOCATE PREPARE topn")
    assert(intercept[Engine.EngineError] {
      s.sql("EXECUTE topn USING @p, @n")
    }.code == 1243)
    // handles are per-session, like the temp-view namespace
    val s2 = Engine.connect(spark, "prod", backends)
    assert(intercept[Engine.EngineError] {
      s2.sql("EXECUTE q USING @n")
    }.code == 1243)
  }

  test("binary prepared statement: typed params round-trip incl. NULL and timestamp") {
    val s = Engine.connect(spark, "prod", backends)
    // COM_STMT_PREPARE analog: handle carries the token-safe param count
    val ps = s.prepareStatement(
      "SELECT ? AS i, ? AS l, ? AS d, ? AS str, ? AS ts, ? AS nul")
    assert(ps.paramCount == 6)
    val when = java.sql.Timestamp.valueOf("2024-03-01 12:30:45")
    val r = ps.execute(7, 8L, 1.5, "x", when, null).head()
    // the binary protocol's typed columns: each value keeps its JVM type
    assert(r.getInt(0) == 7 && r.getLong(1) == 8L && r.getDouble(2) == 1.5)
    assert(r.getString(3) == "x" && r.getTimestamp(4) == when)
    assert(r.isNullAt(5)) // the null-bitmap analog: a typed NULL, not "NULL"
    // rebind on the same handle, different types per execution are fine
    assert(ps.execute(1, 2L, 0.5, "y", when, "set").head().getString(5) == "set")
    // arity mismatch raises MySQL's 1210 like the text protocol
    assert(intercept[Engine.EngineError] { ps.execute(1) }.code == 1210)
    // typed-row iterator per execute: rows stream, types survive
    val ps2 = s.prepareStatement(
      "SELECT o_orderkey FROM orders WHERE o_totalprice > ? ORDER BY o_orderkey")
    val it = ps2.executeRows(100000.0)
    assert(it.next().get(0).isInstanceOf[Number])
    // '?' inside strings/comments is data, not a parameter
    assert(Engine.countParams("SELECT 'a?b', ? -- not this ?\n, ?") == 2)
    assert(Engine.countParams("SELECT /* ? */ ? FROM t") == 1)
    ps.close(); ps2.close()
    s.close()
  }

  test("binary protocol prepares session statements: @@vars, SHOW, " +
      "information_schema — evaluated at EXECUTE time") {
    // r14: connector-j with useServerPrepStmts=true PREPAREs the same
    // statements it otherwise sends as text; the binary path must apply
    // the identical preprocessing (session state read at EXECUTE, per
    // MySQL — prepare once, observe later SETs).
    val s = Engine.connect(spark, "prod", backends)
    val psVar = s.prepareStatement("SELECT @@sql_mode AS m")
    assert(psVar.execute().head().getString(0) == "STRICT_TRANS_TABLES")
    s.sql("SET sql_mode='ANSI_QUOTES'")
    // the SAME handle sees the new session state on re-execute
    assert(psVar.execute().head().getString(0) == "ANSI_QUOTES")
    // SHOW through the binary path answers the interception result set
    val psShow = s.prepareStatement("SHOW VARIABLES LIKE 'autocommit'")
    assert(psShow.execute().collect().map(_.getString(1)).toSeq == Seq("1"))
    // information_schema reads prepare + execute (JDBC metadata calls)
    val psIs = s.prepareStatement("SELECT COUNT(*) AS n FROM " +
      "information_schema.columns WHERE table_name = ? ")
    assert(psIs.execute("region").head().getLong(0) >= 2)
    // client-identity functions substitute per-execute too
    val psId = s.prepareStatement("SELECT CONNECTION_ID() AS cid")
    assert(psId.execute().head().get(0).toString == s.connectionId.toString)
    // session-command-shaped statements WITH parameters: the bound value
    // must reach the command, never the literal '?' (code-review r14)
    val psSet = s.prepareStatement("SET @bound = ?")
    psSet.execute("from-binary")
    assert(s.sql("SELECT @bound AS v").head().getString(0) == "from-binary",
      "prepared SET must bind the typed value, not the marker")
    // the canonical JDBC restore pattern: prepared INSERT into a session
    // table created through the dump-DDL path
    s.sql("CREATE TABLE t_ps_ins (id int, name varchar(16))")
    val psIns = s.prepareStatement("INSERT INTO t_ps_ins VALUES (?, ?)")
    psIns.execute(1, "a")
    psIns.execute(2, "b'quoted")
    val got = s.sql("SELECT id, name FROM t_ps_ins ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((1, "a"), (2, "b'quoted")), got.toString)
    s.sql("DROP TABLE t_ps_ins")
    psVar.close(); psShow.close(); psIs.close(); psId.close()
    psSet.close(); psIns.close()
    s.close()
  }

  test("typed binds never touch the SQL text (injection-proof by construction)") {
    val s = Engine.connect(spark, "prod", backends)
    val ps = s.prepareStatement(
      "SELECT COUNT(*) AS n FROM nation WHERE n_name = ?")
    // the classic payload: if it were spliced into the text, the OR would
    // match every row; as a typed literal it matches zero nation names
    val payload = "x' OR '1'='1"
    assert(ps.execute(payload).head().getLong(0) == 0L)
    // the handle's SQL text is immutable — binding happened in the plan,
    // not the string
    assert(ps.query.contains("?") && !ps.query.contains("OR"))
    // and the payload round-trips byte-identical as a value
    val echo = s.prepareStatement("SELECT ? AS v")
    assert(echo.execute(payload).head().getString(0) == payload)
    ps.close(); echo.close()
    s.close()
  }

  test("long-data chunks bind as one typed parameter (COM_STMT_SEND_LONG_DATA analog)") {
    val s = Engine.connect(spark, "prod", backends)
    val ps = s.prepareStatement(
      "SELECT ? AS tag, length(?) AS len, CAST(? AS STRING) AS body")
    assert(ps.paramCount == 3)
    // a parameter streamed in three chunks, interleaved with scalar binds:
    // the execute's placeholder at that index is ignored (the wire EXECUTE
    // ignores streamed params' null-bitmap/type slots)
    val text = "the quick brown fox jumps over the lazy dog"
    val (a, b, c) = (text.substring(0, 10), text.substring(10, 30),
      text.substring(30))
    ps.sendLongData(2, a.getBytes("UTF-8"))
    ps.sendLongData(2, b.getBytes("UTF-8"))
    ps.sendLongData(2, c.getBytes("UTF-8"))
    val r = ps.execute("t1", "xyz", null).head()
    assert(r.getString(0) == "t1" && r.getInt(1) == 3)
    assert(r.getString(2) == text) // chunks concatenated in send order
    // protocol: the server discards long data when execution completes —
    // a re-execute without re-sending uses the plain (typed NULL) bind
    assert(ps.execute("t2", "xyz", null).head().isNullAt(2))
    // two long-data params accumulate independently
    ps.sendLongData(1, Array[Byte](1, 2))
    ps.sendLongData(2, "ab".getBytes("UTF-8"))
    val r2 = ps.execute("t3", null, null).head()
    assert(r2.getInt(1) == 2 && r2.getString(2) == "ab")
    // COM_STMT_RESET analog: discard without executing
    ps.sendLongData(2, "junk".getBytes("UTF-8"))
    ps.reset()
    assert(ps.execute("t4", "xyz", null).head().isNullAt(2))
    // out-of-range index is MySQL's 1210, same as an arity mismatch
    assert(intercept[Engine.EngineError] {
      ps.sendLongData(3, Array[Byte](0))
    }.code == 1210)
    ps.close()
    // a FAILED execute must RETAIN the streamed chunks: a client that fixes
    // a transient analysis failure (view created late) and re-executes gets
    // the streamed parameter, not a silent NULL (ADVICE r08)
    val late = s.prepareStatement(
      "SELECT CAST(? AS STRING) AS body FROM graft_late_view")
    late.sendLongData(0, "payload".getBytes("UTF-8"))
    assert(intercept[Engine.EngineError] { late.execute(null) }.code == 1105)
    // the view appears in the CONNECTION's isolated namespace (s.spark)
    s.spark.sql("SELECT 1 AS one").createOrReplaceTempView("graft_late_view")
    assert(late.execute(null).head().getString(0) == "payload")
    // ...and the SUCCESSFUL execute then freed it
    assert(late.execute(null).head().isNullAt(0))
    s.spark.catalog.dropTempView("graft_late_view")
    late.close()
    s.close()
  }

  test("cursor fetch pages a held result to exhaustion (COM_STMT_FETCH analog)") {
    val s = Engine.connect(spark, "prod", backends)
    import Engine.Status._
    val ps = s.prepareStatement(
      "SELECT n_nationkey FROM nation WHERE n_nationkey < ? ORDER BY n_nationkey")
    // no cursor yet: fetch is a sequence error
    intercept[Engine.EngineError] { s.fetch(ps.statementId, 5) }
    // CURSOR_TYPE_READ_ONLY execute: result held server-side, nothing sent
    ps.executeCursor(25)
    assert((s.statusFlags & CursorExists) != 0)
    assert((s.statusFlags & LastRowSent) == 0)
    // 3-batch walk to exhaustion: 10 + 10 + 5, bits transition per batch
    val b1 = s.fetch(ps.statementId, 10)
    assert(b1.map(_.getInt(0)) == (0 until 10))
    assert((s.statusFlags & CursorExists) != 0)
    val b2 = s.fetch(ps.statementId, 10)
    assert(b2.map(_.getInt(0)) == (10 until 20))
    assert((s.statusFlags & CursorExists) != 0)
    val b3 = s.fetch(ps.statementId, 10)
    assert(b3.map(_.getInt(0)) == (20 until 25)) // final partial batch
    assert((s.statusFlags & LastRowSent) != 0)
    assert((s.statusFlags & CursorExists) == 0)
    // fetching past the end yields an empty batch, not an error (the
    // LAST_ROW_SENT state is sticky until the next execute)
    assert(s.fetch(ps.statementId, 10).isEmpty)
    // re-execute re-opens the cursor from the top
    ps.executeCursor(3)
    assert(s.fetch(ps.statementId, 10).map(_.getInt(0)) == (0 until 3))
    // close drops the held cursor with the handle
    ps.close()
    intercept[Engine.EngineError] { s.fetch(ps.statementId, 1) }
    s.close()
  }

  test("collation registry: every reference id/name resolves, split is exhaustive") {
    // the reference ships 220 id↔name rows (constants.go:77-298, :301-522);
    // enumerate the WHOLE table, not a sample
    assert(Collations.byId.size == 220)
    assert(Collations.byName.size == 220) // names are unique → exact inverse
    Collations.byId.foreach { case (id, name) =>
      assert(Collations.byName(name) == id)
      // no fall-through: every name lands in a family BY ITS OWN SUFFIX —
      // the default branch of family() is never what classifies it
      val explicit =
        if (name == "binary" || name.endsWith("_bin") || name.endsWith("_cs"))
          Some("UTF8_BINARY")
        else if (name.endsWith("_ci")) Some("UTF8_LCASE")
        else None
      assert(explicit.contains(Collations.family(name)),
        s"collation $id '$name' escaped the suffix families")
      assert(Collations.familyById(id).contains(Collations.family(name)))
    }
    // family counts pin the split (174 _ci; 39 _bin + 6 _cs + binary = 46)
    val fams = Collations.byId.values.groupBy(Collations.family)
    assert(fams("UTF8_LCASE").size == 174 && fams("UTF8_BINARY").size == 46)
    // the reference default (id 46, constants.go:6) is utf8mb4_bin
    assert(Collations.byId(Collations.defaultId) == "utf8mb4_bin")
    assert(Collations.familyById(Collations.defaultId).contains("UTF8_BINARY"))
    // session plumbing: a named 520_ci collation maps case-insensitive...
    val s = Engine.connect(spark, "prod", backends)
    s.sql("SET NAMES utf8mb4 COLLATE utf8mb4_unicode_520_ci")
    assert(s.sparkCollation == "UTF8_LCASE")
    // ...and a name OUTSIDE the registry is MySQL's ER_UNKNOWN_COLLATION
    assert(intercept[Engine.EngineError] {
      s.sql("SET NAMES utf8mb4 COLLATE utf8mb4_not_a_collation")
    }.code == 1273)
    s.close()
  }

  test("DATE_FORMAT translation maps %-codes token-safely") {
    // pattern mapping incl. the MySQL-vs-strftime divergence (%i = minutes)
    assert(Engine.translateMySql("SELECT DATE_FORMAT(ts, '%Y-%m-%d %H:%i:%s') FROM t")
      == "SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ss') FROM t")
    // literal letters are quoted as ONE run (adjacent quotes would escape)
    assert(Engine.mysqlDateFmtToJava("%Y at %H") == "yyyy 'at' HH")
    assert(Engine.mysqlDateFmtToJava("%%") == "%")
    // nested expr argument is itself translated; second-arg non-literals relay
    assert(Engine.translateMySql(
      "SELECT DATE_FORMAT(f(a, b), '%Y')") == "SELECT date_format(f(a, b), 'yyyy')")
    assert(Engine.translateMySql("SELECT DATE_FORMAT(ts, fmt) FROM t")
      == "SELECT DATE_FORMAT(ts, fmt) FROM t")
    // string-literal immunity: DATE_FORMAT as data must not rewrite
    assert(Engine.translateMySql("SELECT 'DATE_FORMAT(ts, x)' AS s")
      == "SELECT 'DATE_FORMAT(ts, x)' AS s")
    // end-to-end through the session relay
    val s = Engine.connect(spark, "prod", backends)
    val buckets = s.sqlMySql(
      "SELECT DATE_FORMAT(ts, '%Y-%m') AS ym, COUNT(*) AS n FROM events " +
        "GROUP BY 1 ORDER BY 1").collect()
    assert(buckets.nonEmpty && buckets.forall(_.getString(0).matches("\\d{4}-\\d{2}")))
  }

  test("KILL QUERY <connection_id> cancels the target session's running job") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val victim = Engine.connect(spark, "prod", backends)
    val killer = Engine.connect(spark, "prod", backends)
    // a deliberately huge scan the victim thread blocks on; its jobs carry
    // the session's job group (set in Session.sql on the calling thread)
    val running = Future {
      victim.sql("SELECT SUM(a.id * b.id) AS s FROM range(3000000) a, " +
        "range(3000000) b").head()
    }
    val tracker = spark.sparkContext.statusTracker
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (tracker.getJobIdsForGroup(victim.jobGroup).isEmpty &&
        System.nanoTime() < deadline) Thread.sleep(50)
    assert(tracker.getJobIdsForGroup(victim.jobGroup).nonEmpty,
      "victim job never started")
    killer.sql(s"KILL QUERY ${victim.connectionId}")
    val err = intercept[Exception] { Await.result(running, 60.seconds) }
    assert(err.getMessage != null && err.getMessage.toLowerCase
      .contains("cancel"), s"expected cancellation, got: ${err.getMessage}")
    // the killer's own session stays healthy
    assert(killer.sql("SELECT 1 AS x").head().getInt(0) == 1)
  }

  test("metadata surface answers MySQL shapes: SHOW [FULL] TABLES / " +
      "SHOW [FULL] COLUMNS / DESCRIBE / SHOW GRANTS") {
    // The statements a MySQL client fires right after connect. The
    // reference's clients see its MySQL-compatible backend's shapes
    // (gateway relays byte-transparently, relay.go:17) — so the engine
    // answers MySQL's column shapes, not Spark's (r14; Spark's 3-column
    // SHOW TABLES broke tools reading `Tables_in_<db>` by name).
    val s = Engine.connect(spark, "prod", backends)
    val st = s.sql("SHOW TABLES")
    assert(st.columns.length == 1 && st.columns.head.startsWith("Tables_in_"),
      st.columns.toSeq)
    val tables = st.collect().map(_.getString(0)).toSet
    for (t <- Seq("lineitem", "orders", "documents", "embeddings", "events"))
      assert(tables.contains(t), s"SHOW TABLES missing $t in $tables")
    // FULL adds Table_type; LIKE filters with MySQL wildcard semantics
    val ft = s.sql("SHOW FULL TABLES LIKE 'l%'").collect()
    assert(ft.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("lineitem", "BASE TABLE")))
    // database/table identifier LIKE is CASE-SENSITIVE under
    // lower_case_table_names=0 + utf8mb4_bin, matching the advertised
    // server (ADVICE r14); COLUMN names are case-INsensitive on every
    // MySQL platform regardless of those settings (manual §9.2.3 —
    // code-review r15), and variable / collation / charset names stay
    // case-insensitive like MySQL's
    assert(s.sql("SHOW TABLES LIKE 'REGION'").count() == 0)
    assert(s.sql("SHOW TABLE STATUS LIKE 'Lineitem'").count() == 0)
    assert(s.sql("SHOW COLUMNS FROM nation LIKE 'N\\_NAME'").count() == 1)
    assert(s.sql("SHOW COLUMNS FROM nation LIKE 'n\\_name'").count() == 1)
    assert(s.sql("SHOW VARIABLES LIKE 'MAX_ALLOWED_PACKET'").count() == 1)
    assert(s.sql("SHOW COLLATION LIKE 'UTF8MB4\\_BIN'").count() == 1)
    val cols = s.sql("SHOW COLUMNS FROM lineitem")
    assert(cols.columns.toSeq ==
      Seq("Field", "Type", "Null", "Key", "Default", "Extra"))
    assert(cols.collect().map(_.getString(0)).toSet ==
      Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"))
    // FULL order: Collation right after Type, MySQL §15.7.7.6 (r16)
    val fullCols = s.sql("SHOW FULL COLUMNS FROM nation").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(fullCols("n_name") == "utf8mb4_bin", // string cols carry collation
      fullCols.toString)
    val desc = s.sql("DESCRIBE orders").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("o_orderkey") == "bigint" && desc("o_orderdate") == "timestamp")
    assert(intercept[Engine.EngineError](
      s.sql("SHOW COLUMNS FROM no_such")).code == 1146)
    // SHOW GRANTS: the one all-privileges row a root-like account sees
    val g = s.sql("SHOW GRANTS").collect()
    assert(g.length == 1 && g(0).getString(0).startsWith("GRANT ALL"))
    // the two sessions' namespaces stay isolated: a view created in one
    // must not appear in the other's SHOW TABLES
    val s2 = Engine.connect(spark, "staging", backends)
    s2.sql("CREATE OR REPLACE TEMPORARY VIEW _scratch AS SELECT 1 AS x")
    assert(s2.sql("SHOW TABLES").collect().exists(_.getString(0) == "_scratch"))
    assert(!s.sql("SHOW TABLES").collect().exists(_.getString(0) == "_scratch"))
  }

  test("transaction statements flip the in-trans status bit (SERVER_STATUS_IN_TRANS)") {
    val s = Engine.connect(spark, "prod", backends)
    assert(!s.inTransaction)
    s.sql("BEGIN")
    assert(s.inTransaction)
    s.sql("COMMIT")
    assert(!s.inTransaction)
    // the batch a transactional client actually sends
    s.sqlBatch("START TRANSACTION READ ONLY; SELECT 1 AS x; ROLLBACK")
    assert(!s.inTransaction)
    // 'begin' as data never trips it
    s.sql("SELECT 'BEGIN' AS w")
    assert(!s.inTransaction)
  }

  test("login splits the handshake username at the first dot (gateway.go:253)") {
    val s = Engine.login(spark, "prod.alice", backends)
    assert(s.clusterId == "prod" && s.user == "alice")
    assert(s.sql("SELECT USER() AS u").head().getString(0) == "alice@prod")
    // the remainder keeps ITS dots (SplitN(…, 2)); case-insensitive routing
    val s2 = Engine.login(spark, "STAGING.svc.batch", backends)
    assert(s2.user == "svc.batch")
    // dot-less username: all cluster id, empty backend user
    val s3 = Engine.login(spark, "prod", backends)
    assert(s3.user == "")
    // unknown cluster: same structured error as connect
    intercept[Engine.EngineError] { Engine.login(spark, "nope.alice", backends) }
  }

  test("client-identity functions substitute per session") {
    val a = Engine.login(spark, "prod.alice", backends)
    val b = Engine.login(spark, "prod.bob", backends)
    assert(a.sql("SELECT CURRENT_USER() AS u").head().getString(0) == "alice@prod")
    assert(b.sql("select user() AS u").head().getString(0) == "bob@prod")
    // distinct monotone connection ids
    val ca = a.sql("SELECT CONNECTION_ID() AS c").head().getAs[Number](0).longValue
    val cb = b.sql("SELECT CONNECTION_ID() AS c").head().getAs[Number](0).longValue
    assert(ca != cb)
    assert(a.sql("SELECT DATABASE() AS d").head().getString(0) == "default")
    // inside a string it is data; with arguments it is not the MySQL form
    assert(a.sql("SELECT 'USER()' AS s").head().getString(0) == "USER()")
    // a genuine column named user survives (word used without parens)
    assert(a.sql("SELECT 1 AS user").head().getInt(0) == 1)
  }

  test("prepared statement binds named parameters per execution") {
    val s = Engine.connect(spark, "prod", backends)
    val stmt = s.prepare(
      "SELECT n_name FROM nation WHERE n_nationkey = :k ORDER BY n_name")
    val first = stmt(Map("k" -> 0)).collect().map(_.getString(0)).toSeq
    val second = stmt(Map("k" -> 3)).collect().map(_.getString(0)).toSeq
    assert(first.size == 1 && second.size == 1 && first != second)
    // literals bind too (scalar expression, no table)
    assert(s.prepare("SELECT :x + 1 AS y")(Map("x" -> 41)).head().getInt(0) == 42)
  }

  test("long_query_time governs the Slow_queries status counter") {
    val s = Engine.connect(spark, "prod", backends)
    def slow(): Long = s.sql("SHOW STATUS LIKE 'Slow_queries'")
      .collect().head.getString(1).toLong
    assert(slow() == 0, "a fresh session starts with Slow_queries = 0")
    // threshold 0: every measured action now counts as slow. Spark
    // delivers QueryExecutionListener callbacks asynchronously on the
    // listener bus, so the counter is eventually consistent — poll.
    s.sql("SET long_query_time = 0")
    s.sql("SELECT COUNT(*) AS n FROM nation").collect()
    var tries = 0
    while (slow() < 1 && tries < 100) { Thread.sleep(50); tries += 1 }
    assert(slow() >= 1, "an action past the threshold must bump Slow_queries")
    // back at the 10 s default nothing in this test is slow; let the
    // in-flight threshold-0 callbacks land first
    s.sql("SET long_query_time = 10")
    Thread.sleep(300)
    val before = slow()
    s.sql("SELECT 1 AS x").collect()
    Thread.sleep(300)
    assert(slow() == before,
      "fast actions must not count at the default threshold")
    s.close()
  }

  test("Slow_queries is global under SHOW GLOBAL STATUS; bad " +
      "long_query_time answers 1232") {
    // ADVICE r12: MySQL's Slow_queries is a GLOBAL status counter —
    // monitoring reading SHOW GLOBAL STATUS must see the process-wide
    // count, not this connection's. SESSION scope keeps the per-connection
    // counter.
    val s = Engine.connect(spark, "prod", backends)
    val s2 = Engine.connect(spark, "prod", backends)
    def read(sess: Engine.Session, scope: String): Long =
      sess.sql(s"SHOW $scope STATUS LIKE 'Slow_queries'")
        .collect().head.getString(1).toLong
    val g0 = read(s2, "GLOBAL")
    s.sql("SET long_query_time = 0")
    s.sql("SELECT COUNT(*) AS n FROM nation").collect()
    var tries = 0
    while (read(s, "SESSION") < 1 && tries < 100) {
      Thread.sleep(50); tries += 1
    }
    assert(read(s, "SESSION") >= 1)
    // the OTHER connection's GLOBAL read sees the bump; its SESSION
    // counter stays untouched
    assert(read(s2, "GLOBAL") > g0,
      "GLOBAL Slow_queries must aggregate across connections")
    assert(read(s2, "SESSION") == 0,
      "SESSION Slow_queries stays per-connection")
    // a non-numeric SET must error (MySQL 1232), never silently diverge
    // the visible variable from the active threshold (ADVICE r12)
    val e = intercept[Engine.EngineError] {
      s.sql("SET long_query_time = 'banana'")
    }
    assert(e.code == 1232, e)
    assert(s.variable("long_query_time").contains("0"),
      "a rejected SET must leave the stored value untouched")
    s.close(); s2.close()
  }

  test("max_allowed_packet: default, clamped SET, 1232 on junk, and the " +
      "long-data accumulation bound (1153 at EXECUTE)") {
    val s = Engine.connect(spark, "prod", backends)
    assert(s.variable("max_allowed_packet").contains("67108864"),
      "MySQL's 64 MiB default")
    // MySQL clamps a SET into [1 KiB, 1 GiB] and stores the clamp — the
    // stored value IS the active bound, so they can never disagree
    s.sql("SET max_allowed_packet = 1")
    assert(s.variable("max_allowed_packet").contains("1024"))
    assert(s.maxAllowedPacketSnapshot == 1024L)
    val e = intercept[Engine.EngineError] {
      s.sql("SET max_allowed_packet = 'lots'")
    }
    assert(e.code == 1232, e)
    // long-data accumulation past the bound: chunks are DROPPED (memory
    // stays bounded) and the next EXECUTE answers MySQL's 1153
    val ps = s.prepareStatement("SELECT length(?) AS n")
    ps.sendLongData(0, new Array[Byte](800))
    ps.sendLongData(0, new Array[Byte](800)) // 1600 > 1024 → overflow
    val oe = intercept[Engine.EngineError] { ps.execute(null) }
    assert(oe.code == 1153, oe)
    // the failed EXECUTE discarded the partial chunks; the statement
    // itself stays usable
    ps.sendLongData(0, "abc".getBytes("UTF-8"))
    assert(ps.execute(null).head().getInt(0) == 3)
    s.close()
  }

  test("lifecycle hook observes connect, slow queries, and close") {
    import scala.jdk.CollectionConverters._
    val events =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String)]
    Engine.lifecycleHook = (e, id, d) => events.add((e, id, d))
    try {
      val s = Engine.connect(spark, "prod", backends, user = "hooked")
      assert(events.asScala.exists { case (e, id, d) =>
        e == "connect" && id == s.connectionId &&
          d.contains("cluster=prod") && d.contains("user=hooked")
      }, s"connect event missing: ${events.asScala.mkString(", ")}")
      s.sql("SET long_query_time = 0")
      s.sql("SELECT COUNT(*) AS n FROM region").collect()
      var tries = 0
      def sawSlow() = events.asScala.exists { case (e, id, _) =>
        e == "slow_query" && id == s.connectionId
      }
      while (!sawSlow() && tries < 100) { Thread.sleep(50); tries += 1 }
      assert(sawSlow(), "slow_query event must flow through the hook")
      s.close()
      assert(events.asScala.exists { case (e, id, _) =>
        e == "close" && id == s.connectionId
      }, "close event must flow through the hook")
    } finally Engine.lifecycleHook = null
  }

  test("close() releases a session's memoized relations and binding") {
    val s = Engine.connect(spark, "prod", backends)
    val sub = s.spark
    operators.DedupQueries.lshPairs(sub).count()
    assert(operators.Memo.entriesFor(sub) > 0)
    assert(sources.Tables.boundDir(sub) == sf)
    s.close()
    assert(operators.Memo.entriesFor(sub) == 0,
      "close() must drop the session's memo entries")
    assert(sources.Tables.boundDir(sub).isEmpty,
      "close() must drop the session's fixture binding")
  }

  test("abandoned sessions (no close) are released by the registry sweep") {
    // VERDICT r10 "what's wrong" #1: a client that drops its Session
    // without close() must not pin the SparkSession (and its checkpointed
    // memo frames) forever. The Session wrapper is weak in the registry;
    // once GC collects it, a sweep releases the caches through the
    // still-pinned SparkSession.
    def leak(): (java.lang.ref.WeakReference[Engine.Session],
        org.apache.spark.sql.SparkSession) = {
      val s = Engine.connect(spark, "prod", backends)
      val sub = s.spark
      // touch a memoized relation: the memo now strongly pins `sub`
      operators.DedupQueries.lshPairs(sub).count()
      (new java.lang.ref.WeakReference(s), sub)
    }
    val (ref, sub) = leak()
    assert(operators.Memo.entriesFor(sub) > 0)
    var tries = 0
    while (ref.get != null && tries < 100) {
      System.gc(); Thread.sleep(50); tries += 1
    }
    if (ref.get != null)
      cancel("JVM did not collect the abandoned Session wrapper")
    Engine.sweepRegistry()
    assert(operators.Memo.entriesFor(sub) == 0,
      "sweep must release an abandoned session's memo entries")
    assert(sources.Tables.boundDir(sub).isEmpty,
      "sweep must release an abandoned session's fixture binding")
  }
}
