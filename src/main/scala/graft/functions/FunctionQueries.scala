package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.{GraftQuery, QueryModule}

/** Scalar-function families (SURVEY.md §2B "Scalar functions"): string,
  * date/time, math, conditional/null (incl. the MySQL dialect spellings
  * IFNULL/NVL the reference's clients would use), cast, json, array (incl.
  * higher-order), map. Each family is one declared query pair; the oracle
  * side uses the documented DuckDB spelling deltas (instr→strpos,
  * split→string_split, explode→unnest, dayofweek 1-based→0-based, …).
  *
  * All functions here are Spark built-ins → whole-stage-codegen'd; no UDFs
  * in any hot path (100 TB rule).
  */
object FunctionQueries extends QueryModule {

  def queries: Seq[GraftQuery] = Seq(

    q("q51_string_funcs",
      """SELECT c_custkey,
        |  CONCAT(c_mktsegment, ':', c_name) AS tagged,
        |  SUBSTRING(c_name, 10, 5) AS sub5,
        |  LENGTH(c_name) AS name_len,
        |  LOWER(c_name) AS lo, UPPER(c_mktsegment) AS up,
        |  TRIM(RPAD(c_name, 25, ' ')) AS trimmed,
        |  LTRIM('  ' || c_name) AS lt, RTRIM(c_name || '  ') AS rt,
        |  REPLACE(c_name, 'Customer#', 'C') AS short_name,
        |  LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  STRPOS(c_name, '#') AS hash_pos,
        |  LEFT(c_name, 8) AS l8, RIGHT(c_name, 4) AS r4,
        |  array_to_string(string_split(c_name, '#'), '|') AS parts,
        |  REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits,
        |  REGEXP_REPLACE(c_name, '0+', '0', 'g') AS squeezed,
        |  (c_name LIKE 'Customer%') AS is_cust,
        |  (c_name ILIKE 'CUSTOMER%') AS is_cust_i
        |FROM customer
        |ORDER BY c_custkey""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("customer").select(
        $"c_custkey",
        concat($"c_mktsegment", lit(":"), $"c_name").as("tagged"),
        substring($"c_name", 10, 5).as("sub5"),
        length($"c_name").as("name_len"),
        lower($"c_name").as("lo"), upper($"c_mktsegment").as("up"),
        trim(rpad($"c_name", 25, " ")).as("trimmed"),
        ltrim(concat(lit("  "), $"c_name")).as("lt"),
        rtrim(concat($"c_name", lit("  "))).as("rt"),
        regexp_replace($"c_name", lit("Customer#"), lit("C")).as("short_name"),
        lpad($"c_custkey".cast(StringType), 8, "0").as("padded"),
        instr($"c_name", "#").as("hash_pos"),
        expr("left(c_name, 8)").as("l8"), expr("right(c_name, 4)").as("r4"),
        // joined to a scalar: the driver's comparator can't sort/hash a raw
        // array column (r01 q51 oracle error)
        concat_ws("|", split($"c_name", "#")).as("parts"),
        regexp_extract($"c_name", "([0-9]+)", 1).as("digits"),
        regexp_replace($"c_name", "0+", "0").as("squeezed"),
        $"c_name".like("Customer%").as("is_cust"),
        $"c_name".ilike("CUSTOMER%").as("is_cust_i"))
        .orderBy($"c_custkey")
    },

    // Date/time family. DuckDB's dayofweek is 0-based (Sunday=0); Spark's is
    // 1-based (Sunday=1) — oracle adds 1. date_add result pinned to DATE.
    q("q52_date_funcs",
      """SELECT o_orderkey,
        |  YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m, DAY(o_orderdate) AS d,
        |  QUARTER(o_orderdate) AS q,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
        |  CAST(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS DATE) AS minus7,
        |  date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec,
        |  CAST(o_orderdate AS DATE) AS as_date
        |FROM orders
        |WHERE o_orderkey < 1000
        |ORDER BY o_orderkey""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("orders")
        .filter($"o_orderkey" < 1000)
        .select(
          $"o_orderkey",
          year($"o_orderdate").as("y"), month($"o_orderdate").as("m"),
          dayofmonth($"o_orderdate").as("d"),
          quarter($"o_orderdate").as("q"),
          dayofweek($"o_orderdate").as("dow"),
          date_trunc("month", $"o_orderdate").as("month_start"),
          date_add(to_date($"o_orderdate"), 30).as("plus30"),
          date_sub(to_date($"o_orderdate"), 7).as("minus7"),
          datediff($"o_orderdate", lit("1995-01-01 00:00:00").cast(TimestampType))
            .cast(LongType).as("days_since"),
          last_day(to_date($"o_orderdate")).as("month_end"),
          unix_timestamp($"o_orderdate").as("unix_sec"),
          to_date($"o_orderdate").as("as_date"))
        .orderBy($"o_orderkey")
    },

    // Time-of-day family over the event stream (orders timestamps sit at
    // midnight, so hour/minute/second need `events.ts`). DuckDB's hour()
    // returns BIGINT → both sides pinned to INT; epoch_ms floors ns→ms the
    // same way Spark's unix_millis floors the µs-truncated timestamp.
    q("q52b_time_funcs",
      """SELECT event_id,
        |  CAST(hour(ts) AS INT) AS h,
        |  CAST(minute(ts) AS INT) AS mi,
        |  CAST(second(ts) AS INT) AS s,
        |  CAST(extract(hour FROM ts) AS INT) AS ext_h,
        |  CAST(epoch_ms(ts) AS BIGINT) AS ms,
        |  CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute_start
        |FROM events
        |WHERE event_id < 2000
        |ORDER BY event_id""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("events")
        .filter($"event_id" < 2000)
        .select($"event_id",
          hour($"ts").as("h"),
          minute($"ts").as("mi"),
          second($"ts").as("s"),
          expr("extract(hour FROM ts)").cast(IntegerType).as("ext_h"),
          unix_millis($"ts").as("ms"),
          date_trunc("minute", $"ts").as("minute_start"))
        .orderBy($"event_id")
    },

    // Math family. Transcendentals (exp/ln/log10/power) rounded at 6 — far
    // above any libm last-ulp divergence between JVM and DuckDB.
    q("q53_math_funcs",
      """SELECT p_partkey,
        |  ABS(p_size - 25) AS dist25,
        |  CAST(CEIL(p_retailprice / 100) AS BIGINT) AS price_ceil,
        |  CAST(FLOOR(p_retailprice / 100) AS BIGINT) AS price_floor,
        |  ROUND(p_retailprice / 7, 2) AS price_div,
        |  ROUND(POWER(p_size, 2), 6) AS size_sq,
        |  ROUND(SQRT(p_size), 6) AS size_sqrt,
        |  ROUND(EXP(p_size / 10.0), 6) AS e_pow,
        |  ROUND(LN(p_retailprice), 6) AS log_price,
        |  ROUND(LOG10(p_retailprice), 6) AS log10_price,
        |  p_partkey % 7 AS key_mod,
        |  CAST(SIGN(p_size - 25) AS INT) AS size_sign,
        |  GREATEST(p_size, 10) AS g10, LEAST(p_size, 40) AS l40,
        |  ROUND(SIN(p_size / 10.0), 6) + 0 AS sin_v,
        |  ROUND(COS(p_size / 10.0), 6) + 0 AS cos_v,
        |  ROUND(ATAN2(p_size, 25), 6) AS atan2_v,
        |  CAST(bit_count(p_partkey) AS INT) AS popcount
        |FROM part
        |ORDER BY p_partkey""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("part").select(
        $"p_partkey",
        abs($"p_size" - 25).as("dist25"),
        ceil($"p_retailprice" / 100).as("price_ceil"),
        floor($"p_retailprice" / 100).as("price_floor"),
        round($"p_retailprice" / 7, 2).as("price_div"),
        round(pow($"p_size", 2), 6).as("size_sq"),
        round(sqrt($"p_size"), 6).as("size_sqrt"),
        round(exp($"p_size" / 10.0), 6).as("e_pow"),
        round(log($"p_retailprice"), 6).as("log_price"),
        round(log10($"p_retailprice"), 6).as("log10_price"),
        ($"p_partkey" % 7).as("key_mod"),
        signum($"p_size" - 25).cast(IntegerType).as("size_sign"),
        greatest($"p_size", lit(10)).as("g10"),
        least($"p_size", lit(40)).as("l40"),
        (round(sin($"p_size" / 10.0), 6) + 0).as("sin_v"),
        (round(cos($"p_size" / 10.0), 6) + 0).as("cos_v"),
        round(atan2($"p_size".cast(DoubleType), lit(25.0)), 6).as("atan2_v"),
        bit_count($"p_partkey").cast(IntegerType).as("popcount"))
        .orderBy($"p_partkey")
    },

    // Conditional / null family — exercised through the MySQL dialect
    // spellings Spark carries natively (IFNULL, NVL, IF); DuckDB oracle uses
    // the ANSI spellings (COALESCE, CASE WHEN).
    q("q54_cond_null",
      """SELECT c_custkey,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), c_name) AS ifnull_demo,
        |  COALESCE(NULLIF(c_mktsegment, 'AUTOMOBILE'), 'fallback') AS nvl_demo,
        |  CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'credit' END AS if_demo,
        |  (NULLIF(c_mktsegment, 'BUILDING') IS NULL) AS was_building,
        |  (NULLIF(c_mktsegment, 'BUILDING') IS NOT NULL) AS not_building
        |FROM customer
        |ORDER BY c_custkey""".stripMargin) { spark =>
      // Spark SQL natively accepts the MySQL spellings — declared here as the
      // dialect-compat surface (SURVEY.md §7.3 "dialect shims").
      spark.sql(
        """SELECT c_custkey,
          |  IFNULL(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
          |  IFNULL(NULLIF(c_mktsegment, 'BUILDING'), c_name) AS ifnull_demo,
          |  NVL(NULLIF(c_mktsegment, 'AUTOMOBILE'), 'fallback') AS nvl_demo,
          |  IF(c_acctbal < 0, 'debt', 'credit') AS if_demo,
          |  ISNULL(NULLIF(c_mktsegment, 'BUILDING')) AS was_building,
          |  ISNOTNULL(NULLIF(c_mktsegment, 'BUILDING')) AS not_building
          |FROM customer
          |ORDER BY c_custkey""".stripMargin)
    },

    // CAST across the §1.3 type lattice.
    q("q55_casts",
      """SELECT s_suppkey,
        |  CAST(s_suppkey AS VARCHAR) AS key_str,
        |  CAST(CAST(s_suppkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
        |  ROUND(CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE), 2) AS bal_dec,
        |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal_back,
        |  CAST(s_suppkey AS SMALLINT) AS key_i16,
        |  CAST(s_suppkey AS INT) AS key_i32,
        |  CAST(s_suppkey % 2 AS BOOLEAN) AS key_odd,
        |  CAST('1996-03-15' AS DATE) AS lit_date,
        |  CAST('1996-03-15 12:30:00' AS TIMESTAMP) AS lit_ts,
        |  TRY_CAST(CAST(s_suppkey AS VARCHAR) || 'x' AS BIGINT) AS try_bad,
        |  TRY_CAST(CAST(s_suppkey AS VARCHAR) AS BIGINT) AS try_good
        |FROM supplier
        |ORDER BY s_suppkey""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("supplier").select(
        $"s_suppkey",
        $"s_suppkey".cast(StringType).as("key_str"),
        $"s_suppkey".cast(StringType).cast(LongType).as("key_roundtrip"),
        round($"s_acctbal".cast(DecimalType(18, 2)).cast(DoubleType), 2)
          .as("bal_dec"),
        $"s_acctbal".cast(DecimalType(18, 2)).cast(DoubleType).as("bal_back"),
        $"s_suppkey".cast(ShortType).as("key_i16"),
        $"s_suppkey".cast(IntegerType).as("key_i32"),
        ($"s_suppkey" % 2).cast(BooleanType).as("key_odd"),
        lit("1996-03-15").cast(DateType).as("lit_date"),
        lit("1996-03-15 12:30:00").cast(TimestampType).as("lit_ts"),
        expr("try_cast(concat(cast(s_suppkey AS string), 'x') AS bigint)")
          .as("try_bad"),
        expr("try_cast(cast(s_suppkey AS string) AS bigint)").as("try_good"))
        .orderBy($"s_suppkey")
    },

    // JSON family over events.props (TiDB JSON column analog, SURVEY.md §1.3).
    q("q56_json",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        |  (CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS k_big,
        |  json_extract_string(props, '$.missing') AS absent
        |FROM events
        |ORDER BY event_id""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("events").select(
        $"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        get_json_object($"props", "$.k").cast(LongType).as("k_int"),
        (get_json_object($"props", "$.k").cast(LongType) > 50).as("k_big"),
        get_json_object($"props", "$.missing").as("absent"))
        .orderBy($"event_id")
    },

    // from_json with a declared schema → typed struct field access.
    q("q56b_from_json_schema",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) BETWEEN 10 AND 20
        |ORDER BY event_id""".stripMargin) { spark =>
      import spark.implicits._
      val schema = StructType(Seq(StructField("k", LongType)))
      spark.table("events")
        .select($"event_id", from_json($"props", schema).getField("k").as("k"))
        .filter($"k".between(10, 20))
        .orderBy($"event_id")
    },

    // Array family incl. higher-order functions, over the embedding vectors.
    // Element maths forced to DOUBLE before folding; fold is left-to-right in
    // both engines; rounded at 5 (values ~N(0,0.1), error bound ~1e-13).
    q("q57_array_funcs",
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  ROUND(CAST(embedding[1] AS DOUBLE), 6) + 0 AS first_val,
        |  ROUND(CAST(embedding[len(embedding)] AS DOUBLE), 6) + 0 AS last_val,
        |  ROUND(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                    (a, b) -> a + b), 5) + 0 AS vec_sum,
        |  ROUND(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
        |                    (a, b) -> a + b), 5) + 0 AS vec_sumsq,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |  ROUND(list_reduce(list_transform(embedding[3:6], x -> CAST(x AS DOUBLE)),
        |                    (a, b) -> a + b), 5) + 0 AS slice_sum,
        |  ROUND(CAST(list_sort(embedding)[1] AS DOUBLE), 6) + 0 AS min_elem
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("embeddings").select(
        $"vec_id",
        size($"embedding").as("dim"),
        // "+ 0" after every round: IEEE -0.0 + 0 = +0.0 on both engines —
        // Spark's BigDecimal round can't produce -0.0 but DuckDB's can
        (round(element_at($"embedding", 1).cast(DoubleType), 6) + 0).as("first_val"),
        (round(element_at($"embedding", -1).cast(DoubleType), 6) + 0).as("last_val"),
        (round(aggregate($"embedding", lit(0.0),
          (acc, x) => acc + x.cast(DoubleType)), 5) + 0).as("vec_sum"),
        (round(aggregate($"embedding", lit(0.0),
          (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)), 5) + 0).as("vec_sumsq"),
        size(filter($"embedding", x => x > 0f)).as("n_pos"),
        (round(aggregate(slice($"embedding", 3, 4), lit(0.0),
          (acc, x) => acc + x.cast(DoubleType)), 5) + 0).as("slice_sum"),
        (round(element_at(sort_array($"embedding"), 1).cast(DoubleType), 6) + 0).as("min_elem"))
        .orderBy($"vec_id")
    },

    // Array set operations (union / intersect / except) between each
    // document's head and tail token sets — compared by cardinality, which
    // is engine-order-independent (Spark and DuckDB order set-op results
    // differently; the set sizes are identical).
    q("q57b_array_setops",
      """SELECT doc_id,
        |  len(list_distinct(list_cat(a, b))) AS n_union,
        |  len(list_intersect(list_distinct(a), list_distinct(b))) AS n_inter,
        |  len(list_filter(list_distinct(a), x -> NOT list_contains(b, x))) AS n_except
        |FROM (
        |  SELECT doc_id,
        |         string_split(lower(substring(text, 1, 100)), ' ') AS a,
        |         string_split(lower(substring(text, greatest(length(text) - 99, 1), 100)), ' ') AS b
        |  FROM documents) t
        |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("documents")
        .select($"doc_id",
          split(lower(substring($"text", 1, 100)), " ").as("a"),
          split(lower(substring($"text",
            greatest(length($"text") - 99, lit(1)), lit(100))), " ").as("b"))
        .select($"doc_id",
          size(array_union($"a", $"b")).as("n_union"),
          size(array_intersect($"a", $"b")).as("n_inter"),
          size(array_except($"a", $"b")).as("n_except"))
        .orderBy($"doc_id")
    },

    // explode / posexplode (UNNEST): vector → element rows.
    q("q58_explode",
      """SELECT vec_id, pos, ROUND(CAST(val AS DOUBLE), 6) + 0 AS val
        |FROM (
        |  SELECT vec_id,
        |    generate_subscripts(embedding, 1) - 1 AS pos,
        |    unnest(embedding) AS val
        |  FROM embeddings
        |  WHERE vec_id < 20) t
        |ORDER BY vec_id, pos""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("embeddings")
        .filter($"vec_id" < 20)
        .select($"vec_id", posexplode($"embedding").as(Seq("pos", "v")))
        .select($"vec_id", $"pos", (round($"v".cast(DoubleType), 6) + 0).as("val"))
        .orderBy($"vec_id", $"pos")
    },

    // Map family: construction, key/value extraction (scalars out — map
    // column renderings differ across engines, values don't).
    q("q59_map_funcs",
      """SELECT c_custkey,
        |  map(['seg', 'name'], [c_mktsegment, c_name])['seg'][1] AS seg_val,
        |  len(map_keys(map(['seg', 'name'], [c_mktsegment, c_name]))) AS n_keys
        |FROM customer
        |WHERE c_custkey < 100
        |ORDER BY c_custkey""".stripMargin) { spark =>
      import spark.implicits._
      val m = map(lit("seg"), $"c_mktsegment", lit("name"), $"c_name")
      spark.table("customer")
        .filter($"c_custkey" < 100)
        .select($"c_custkey",
          element_at(m, "seg").as("seg_val"),
          size(map_keys(m)).as("n_keys"))
        .orderBy($"c_custkey")
    },

    // Remaining declared spellings: to_timestamp, array_contains,
    // arrays_zip, map_values, to_json (SURVEY §2B scalar families).
    q("q68_more_funcs",
      """SELECT doc_id,
        |  list_contains(string_split(lower(text), ' '), 'the') AS has_the,
        |  len(list_zip(string_split(text, ' '), string_split(lower(text), ' '))) AS zip_len,
        |  map_values(map(['lang', 'src'], [lang, source]))[1] AS first_val,
        |  CAST('2024-01-01 00:00:0' || CAST(doc_id % 10 AS VARCHAR) AS TIMESTAMP) AS ts10,
        |  CAST(to_json(struct_pack(lang := lang)) AS VARCHAR) AS lang_json
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("documents").select(
        $"doc_id",
        array_contains(split(lower($"text"), " "), "the").as("has_the"),
        size(arrays_zip(split($"text", " "), split(lower($"text"), " "))).as("zip_len"),
        element_at(map_values(map(lit("lang"), $"lang", lit("src"), $"source")), 1)
          .as("first_val"),
        to_timestamp(concat(lit("2024-01-01 00:00:0"), ($"doc_id" % 10))).as("ts10"),
        to_json(struct($"lang".as("lang"))).as("lang_json"))
        .orderBy($"doc_id")
    },

    // json_tuple generator spelling (multi-path JSON extraction in one call).
    q("q69_json_tuple",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k,
        |  json_extract_string(props, '$.source') AS src
        |FROM events
        |ORDER BY event_id""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("events")
        .selectExpr("event_id", "json_tuple(props, 'k', 'source') AS (k, src)")
        .orderBy($"event_id")
    },

    // Unicode NFC normalization — the ingestion canonicalization pass that
    // keeps exact dedup / shingles / vocab from fracturing on combining-mark
    // vs precomposed spellings of the same grapheme. Spark has no builtin;
    // `graft_nfc` is a native codegen'd Expression (TextExpressions.scala)
    // against DuckDB's `nfc_normalize`. The fixture corpus is pure ASCII, so
    // odd doc_ids get a deterministic decomposed suffix ("e" + U+0301
    // combining acute — spelled chr(101)||chr(769) in the oracle and as the
    // explicit "e\\u0301" escape here, since Spark's chr() is mod-256
    // ASCII-only and a bare source literal could silently precompose) and
    // even ids a precomposed control suffix: NFC must compose the former
    // (len −1, changed = 1) and fix the latter (changed = 0). The md5
    // fingerprint hashes the normalized UTF-8 bytes on both engines — a
    // content check, not just a length check. Map-side only; no shuffle
    // until the final ORDER BY.
    q("q188_nfc_normalize",
      """WITH m AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 2 = 1
        |              THEN text || ' caf' || chr(101) || chr(769)
        |              ELSE text || ' cafe' END AS marked
        |  FROM documents),
        |n AS (SELECT doc_id, marked, nfc_normalize(marked) AS norm FROM m)
        |SELECT doc_id,
        |  CAST(length(marked) AS BIGINT) AS len_raw,
        |  CAST(length(norm) AS BIGINT) AS len_nfc,
        |  substr(md5(norm), 1, 8) AS fp,
        |  CASE WHEN norm = marked THEN 0 ELSE 1 END AS changed
        |FROM n
        |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val marked = spark.table("documents")
        .select($"doc_id",
          when($"doc_id" % 2 === 1,
            concat($"text", lit(" caf"), lit("e\u0301")))
            .otherwise(concat($"text", lit(" cafe"))).as("marked"))
      marked
        .withColumn("norm", TextExpressions.nfc($"marked"))
        .select($"doc_id",
          length($"marked").cast(LongType).as("len_raw"),
          length($"norm").cast(LongType).as("len_nfc"),
          substring(md5($"norm".cast(BinaryType)), 1, 8).as("fp"),
          when($"norm" === $"marked", 0).otherwise(1).as("changed"))
        .orderBy($"doc_id")
    })
}
