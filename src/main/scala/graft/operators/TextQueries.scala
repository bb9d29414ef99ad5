package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.{Canon, GraftQuery, QueryModule}
import graft.sources.Tables

/** Text-analysis surface over the `documents` fixture (SURVEY.md §2C):
  * tokenization/normalization, term/document frequencies, n-gram counts,
  * n-gram-heuristic language scoring, quality scoring, token counting
  * (whitespace + BPE-ish regex), canonical document fingerprinting, and
  * lexicon-based sentiment (EDBT 2016 pattern, PAPERS.md).
  *
  * Scale design: every query is explode → shuffle-on-key → aggregate, the
  * shape that partitions cleanly at 100 TB (tokens shuffle by token/doc key;
  * no driver-side materialization). All expressions are Spark built-ins →
  * whole-stage codegen; the only join (sentiment lexicon) is a broadcast of
  * a constant ~10-row table.
  */
object TextQueries extends QueryModule {

  /** Whitespace tokenizer both engines spell identically. */
  private[graft] val tokSql = "string_split(lower(text), ' ')"

  /** q139/q217's fixed lexical query. */
  private val bm25Terms = Seq("join", "vector", "fast")

  /** BM25 (k1 = 1.2, b = 0.75) scores for [[bm25Terms]] — the ONE scoring
    * relation q139 surfaces and q217 fuses (shared so the two can only
    * change together). Per-term contributions pivot into FIXED columns and
    * add in spelled order (no aggregation-order dependence); the free
    * double is floor-rounded to 4 decimals. */
  private def bm25Scores(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val tok = spark.table("documents")
      .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
    val dl = tok.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val st = dl.agg(count(lit(1)).cast(DoubleType).as("n"),
      (sum($"dl").cast(DoubleType) / count(lit(1))).as("avgdl"))
    val tf = tok.filter($"token".isin(bm25Terms: _*))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val f = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val s = tf.join(broadcast(f), "token").join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .select($"doc_id", $"token",
        (log(($"n" - $"df" + 0.5) / ($"df" + 0.5) + 1) *
          ($"tf" * 2.2) /
          ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / $"avgdl")))
          .as("c"))
    val pivots = bm25Terms.zipWithIndex.map { case (t, i) =>
      max(when($"token" === t, $"c")).as(s"c${i + 1}")
    }
    s.groupBy($"doc_id").agg(pivots.head, pivots.tail: _*)
      .select($"doc_id", (floor((coalesce($"c1", lit(0.0)) +
        coalesce($"c2", lit(0.0)) + coalesce($"c3", lit(0.0)))
        * 10000 + 0.5) / 10000).as("bm25"))
  }

  /** Oracle twin of [[bm25Scores]] + the top-50 cut: CTE chain ending in
    * `bm25lex`(doc_id, bm25) — the 50 highest by (bm25 DESC, doc_id). */
  private def bm25LexCtes: String = {
    val pivots = bm25Terms.zipWithIndex.map { case (t, i) =>
      s"MAX(CASE WHEN token = '$t' THEN c END) AS c${i + 1}"
    }.mkString(",\n        ")
    s"""tok AS (SELECT doc_id, unnest($tokSql) AS token FROM documents),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
       |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |              CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
       |       WHERE token IN (${bm25Terms.map("'" + _ + "'").mkString(", ")})
       |       GROUP BY doc_id, token),
       |f AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
       |s AS (SELECT t.doc_id, t.token,
       |        ln((st.n - f.df + 0.5) / (f.df + 0.5) + 1) *
       |        (t.tf * 2.2) /
       |        (t.tf + 1.2 * (0.25 + 0.75 * d.dl / st.avgdl)) AS c
       |      FROM tf t
       |      JOIN f USING (token)
       |      JOIN dl d USING (doc_id)
       |      CROSS JOIN st),
       |p AS (SELECT doc_id,
       |        $pivots
       |      FROM s GROUP BY doc_id),
       |bm25lex AS (
       |  SELECT doc_id,
       |    floor((COALESCE(c1, 0) + COALESCE(c2, 0) + COALESCE(c3, 0))
       |      * 10000 + 0.5) / 10000 AS bm25
       |  FROM p
       |  ORDER BY bm25 DESC, doc_id
       |  LIMIT 50)""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(

    // Tokenize + normalize: doc → (doc_id, pos, token) rows. posexplode is
    // 0-based; DuckDB generate_subscripts is 1-based → -1.
    q("q60_tokenize",
      s"""SELECT doc_id, pos, token FROM (
         |  SELECT doc_id,
         |    generate_subscripts($tokSql, 1) - 1 AS pos,
         |    unnest($tokSql) AS token
         |  FROM documents
         |  WHERE doc_id < 60) t
         |ORDER BY doc_id, pos""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("documents")
        .filter($"doc_id" < 60)
        .select($"doc_id", posexplode(split(lower($"text"), " ")).as(Seq("pos", "token")))
        .orderBy($"doc_id", $"pos")
    },

    // Term statistics: corpus-wide term frequency + document frequency.
    // Classic map-side-combinable groupBy(token) — the 100 TB shape.
    q("q61_term_stats",
      s"""SELECT token,
         |  COUNT(*) AS tf,
         |  COUNT(DISTINCT doc_id) AS df
         |FROM (SELECT doc_id, unnest($tokSql) AS token FROM documents) t
         |GROUP BY token
         |ORDER BY tf DESC, token""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("documents")
        .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
        .groupBy($"token")
        .agg(count(lit(1)).as("tf"), countDistinct($"doc_id").as("df"))
        .orderBy($"tf".desc, $"token")
    },

    // Bigram counts via higher-order functions (no UDF): consecutive-token
    // pairs built per-row, then exploded and counted.
    q("q62_ngram_counts",
      s"""SELECT bigram, COUNT(*) AS n
         |FROM (
         |  SELECT unnest(list_transform(range(1, len(toks)),
         |                i -> toks[i] || ' ' || toks[i + 1])) AS bigram
         |  FROM (SELECT $tokSql AS toks FROM documents) t1) t2
         |GROUP BY bigram
         |HAVING COUNT(*) >= 20
         |ORDER BY n DESC, bigram""".stripMargin) { spark =>
      import spark.implicits._
      // tokenize in its own projection: interpreted HOF lambdas get no CSE,
      // so inlining split() here would re-evaluate it per reference
      spark.table("documents")
        .select(split(lower($"text"), " ").as("toks"))
        .select(explode(transform(Canon.seq1(size($"toks") - 1),
          i => concat(element_at($"toks", i), lit(" "), element_at($"toks", i + 1))))
          .as("bigram"))
        .groupBy($"bigram").agg(count(lit(1)).as("n"))
        .filter($"n" >= 20)
        .orderBy($"n".desc, $"bigram")
    },

    // Language-ID heuristic: count marker-token occurrences (substring-count
    // expressed as length arithmetic — identical spelling both engines), then
    // argmax with a fixed precedence order. A real lang-id would use char
    // n-gram profiles; the operator shape (per-row scoring, no shuffle) is
    // what matters at scale.
    q("q63_lang_id", {
      def cnt(m: String) =
        s"(length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', '$m', ''))) / ${m.length}"
      s"""SELECT doc_id, lang,
         |  CAST(${cnt(" the ")} AS BIGINT) AS en_score,
         |  CAST(${cnt(" a ")} AS BIGINT) AS art_score,
         |  CASE WHEN ${cnt(" the ")} > 0 THEN 'en' ELSE 'unknown' END AS lang_guess
         |FROM documents
         |ORDER BY doc_id""".stripMargin
    }) { spark =>
      import spark.implicits._
      def cnt(m: String) = {
        val padded = concat(lit(" "), lower($"text"), lit(" "))
        ((length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(m), ""))) / m.length)
          .cast(LongType)
      }
      spark.table("documents")
        .select($"doc_id", $"lang",
          cnt(" the ").as("en_score"),
          cnt(" a ").as("art_score"),
          when(cnt(" the ") > 0, "en").otherwise("unknown").as("lang_guess"))
        .orderBy($"doc_id")
    },

    // Quality scoring: length / punctuation / stopword / word-length stats →
    // composite score. Pure per-row arithmetic (no shuffle) + final sort.
    q("q64_quality_score",
      s"""SELECT doc_id,
         |  n_chars,
         |  len($tokSql) AS n_words,
         |  ROUND(CAST(length(text) AS DOUBLE) / len($tokSql), 4) AS avg_word_len,
         |  len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
         |  len(list_filter($tokSql,
         |      w -> w IN ('the', 'a', 'of', 'and', 'is'))) AS n_stop,
         |  ROUND(CAST(len(list_filter($tokSql,
         |      w -> w IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
         |    / len($tokSql), 4) AS stop_ratio,
         |  (length(text) BETWEEN 100 AND 500
         |    AND len($tokSql) >= 20) AS passes_filter
         |FROM documents
         |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val stops = filter($"toks", w => w.isin("the", "a", "of", "and", "is"))
      spark.table("documents")
        .select($"doc_id", $"n_chars", $"text",
          split(lower($"text"), " ").as("toks"))
        .select($"doc_id", $"n_chars",
          size($"toks").as("n_words"),
          round(length($"text").cast(DoubleType) / size($"toks"), 4).as("avg_word_len"),
          size(regexp_extract_all($"text", lit("[^a-z0-9 ]"), lit(0))).as("n_punct"),
          size(stops).as("n_stop"),
          round(size(stops).cast(DoubleType) / size($"toks"), 4).as("stop_ratio"),
          (length($"text").between(100, 500) && size($"toks") >= 20).as("passes_filter"))
        .orderBy($"doc_id")
    },

    // Exact-periodicity loop detector — the degenerate-GENERATION failure
    // mode ("ab ab ab ab…", k-token copy loops) that q118's fuzzy dup-gram
    // fractions and q64b's token-share both under-report: for each period
    // p ≤ 8, the fraction of positions with t[i] == t[i+p]; the best
    // (highest-fraction, smallest-p tiebreak) period gates at ≥ 0.9.
    // Determinism: match counts are exact integers; frac = count/(n−p) is
    // one integer-derived double division with identical bits cross-engine
    // (ranked raw, surfaced r4-floored). p ranges only over 1..min(8, n−1)
    // so n ≤ 1 docs have NO candidate rows — the left join keeps them with
    // the (0, 0, not-loopy) default instead of dropping them (the q202
    // degenerate-corpus rule). Scale: O(8·n) map-side work per doc, one
    // doc_id-partitioned rank window, one left join back.
    q("q222_periodicity",
      s"""WITH tk AS (
         |  SELECT doc_id, $tokSql AS toks,
         |         CAST(len($tokSql) AS BIGINT) AS n
         |  FROM documents),
         |pf AS (
         |  SELECT doc_id, n, unnest(range(1, least(8, n - 1) + 1)) AS p
         |  FROM tk),
         |fr AS (
         |  SELECT f.doc_id, f.p,
         |    CAST(len(list_filter(range(1, f.n - f.p + 1),
         |           i -> t.toks[CAST(i AS INT)] =
         |                t.toks[CAST(i + f.p AS INT)])) AS DOUBLE)
         |      / (f.n - f.p) AS frac
         |  FROM pf f JOIN tk t USING (doc_id)),
         |best AS (
         |  SELECT doc_id, p, frac,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id
         |                            ORDER BY frac DESC, p) AS rn
         |  FROM fr)
         |SELECT d.doc_id,
         |  CAST(COALESCE(b.p, 0) AS BIGINT) AS best_period,
         |  floor(COALESCE(b.frac, 0e0) * 10000 + 0.5) / 10000
         |    AS period_frac,
         |  CAST(CASE WHEN COALESCE(b.frac, 0e0) >= 0.9e0 THEN 1 ELSE 0 END
         |       AS INT) AS is_loopy
         |FROM documents d
         |LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
         |ORDER BY d.doc_id""".stripMargin) { spark =>
      import spark.implicits._
      periodicityOf(spark.table("documents")).orderBy($"doc_id")
    },

    // Repetition quality filter: most-frequent-token share per document —
    // the boilerplate/degenerate-text detector that complements q64's
    // length/stopword heuristics. explode → per-(doc, token) count →
    // per-doc max/total, all map-side-combinable.
    q("q64b_repetition",
      s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS token FROM documents),
         |tc AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
         |agg AS (SELECT doc_id, MAX(c) AS mr, SUM(c) AS total FROM tc
         |        GROUP BY doc_id)
         |SELECT doc_id, CAST(mr AS BIGINT) AS max_rep,
         |       ROUND(CAST(mr AS DOUBLE) / total, 4) AS rep_ratio,
         |       (CAST(mr AS DOUBLE) / total > 0.2) AS is_repetitive
         |FROM agg
         |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val tc = spark.table("documents")
        .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
        .groupBy($"doc_id", $"token").agg(count(lit(1)).as("c"))
      tc.groupBy($"doc_id")
        .agg(max($"c").as("max_rep"), sum($"c").as("total"))
        .select($"doc_id", $"max_rep",
          round($"max_rep".cast(DoubleType) / $"total", 4).as("rep_ratio"),
          ($"max_rep".cast(DoubleType) / $"total" > 0.2).as("is_repetitive"))
        .orderBy($"doc_id")
    },

    // Readability scoring (Flesch reading-ease + Flesch-Kincaid grade —
    // the classic corpus-filtering quality features): sentences = non-blank
    // '.'-splits (floored at 1), words = the repo's whitespace-token
    // convention, syllables = vowel-group count over the lowered text (the
    // standard heuristic; [aeiouy]+ is greedy and identical on both regex
    // engines). Every ratio divides EXACT integers, the linear combos use
    // identical double literals left-to-right (e0-typed in the oracle so
    // DuckDB doesn't promote to DECIMAL), and both surfaced scores are
    // free doubles → IEEE floor-round, with the readability flag comparing
    // the ROUNDED value so the threshold can't straddle a half boundary.
    // Map-side only; no shuffle until the ORDER BY.
    q("q225_readability",
      """SELECT doc_id,
        |  CAST(greatest(1, len(list_filter(string_split(text, '.'),
        |    s -> trim(s) <> ''))) AS BIGINT) AS n_sentences,
        |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |    AS n_syllables,
        |  floor((206.835e0
        |    - 1.015e0 * (CAST(len(string_split(lower(text), ' ')) AS DOUBLE)
        |      / greatest(1, len(list_filter(string_split(text, '.'),
        |          s -> trim(s) <> ''))))
        |    - 84.6e0 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |        AS DOUBLE) / len(string_split(lower(text), ' '))))
        |    * 10000 + 0.5) / 10000 AS flesch,
        |  floor((0.39e0 * (CAST(len(string_split(lower(text), ' ')) AS DOUBLE)
        |      / greatest(1, len(list_filter(string_split(text, '.'),
        |          s -> trim(s) <> ''))))
        |    + 11.8e0 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |        AS DOUBLE) / len(string_split(lower(text), ' ')))
        |    - 15.59e0) * 10000 + 0.5) / 10000 AS fk_grade,
        |  CAST(CASE WHEN floor((206.835e0
        |    - 1.015e0 * (CAST(len(string_split(lower(text), ' ')) AS DOUBLE)
        |      / greatest(1, len(list_filter(string_split(text, '.'),
        |          s -> trim(s) <> ''))))
        |    - 84.6e0 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |        AS DOUBLE) / len(string_split(lower(text), ' '))))
        |    * 10000 + 0.5) / 10000 >= 60e0 THEN 1 ELSE 0 END AS INT)
        |    AS is_easy
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val base = spark.table("documents").select($"doc_id",
        greatest(lit(1),
          size(filter(split($"text", "\\."), s => trim(s) =!= "")))
          .cast(LongType).as("n_sentences"),
        size(split(lower($"text"), " ")).cast(LongType).as("n_words"),
        size(regexp_extract_all(lower($"text"), lit("[aeiouy]+"), lit(0)))
          .cast(LongType).as("n_syllables"))
      val wps = $"n_words".cast(DoubleType) / $"n_sentences"
      val spw = $"n_syllables".cast(DoubleType) / $"n_words"
      val flesch =
        floor((lit(206.835) - lit(1.015) * wps - lit(84.6) * spw)
          * 10000 + 0.5) / 10000
      base.select($"doc_id", $"n_sentences", $"n_words", $"n_syllables",
          flesch.as("flesch"),
          (floor((lit(0.39) * wps + lit(11.8) * spw - lit(15.59))
            * 10000 + 0.5) / 10000).as("fk_grade"),
          when(flesch >= 60.0, 1).otherwise(0).cast(IntegerType)
            .as("is_easy"))
        .orderBy($"doc_id")
    },

    // Span-corruption mask manifest (T5/UL2 denoising pretraining: ~15% of
    // tokens masked in ~mean-3 spans). Deterministic "randomness" via the
    // repo's md5-draw idiom (q59 family): the doc is cut into k = max(1,
    // ⌊0.15·n⌋ div 3) equal strata and each stratum places one span at
    // lo + (draw mod (len − sl + 1)) — spans provably stay inside their
    // stratum, so they never overlap and the manifest is stable across
    // engines, runs, and partitionings. Docs under 7 tokens emit no spans
    // (mask budget 0). All-integer output, one generator + map-side
    // arithmetic — no shuffle until the ORDER BY.
    q("q226_span_corruption",
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n
        |  FROM documents),
        |p AS (SELECT doc_id, n, (n * 15) // 100 AS m FROM t),
        |kk AS (SELECT doc_id, n, greatest(1, m // 3) AS k
        |       FROM p WHERE m >= 1),
        |sp AS (SELECT doc_id, n, k, unnest(range(1, k + 1)) AS i FROM kk),
        |g AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS span_idx, n,
        |         (i - 1) * n // k + 1 AS lo, i * n // k AS hi
        |  FROM sp),
        |d AS (
        |  SELECT doc_id, span_idx, n, lo, hi - lo + 1 AS len,
        |         least(3, hi - lo + 1) AS sl,
        |         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |             || ':' || CAST(span_idx AS VARCHAR)), 1, 8))
        |           AS UBIGINT) AS BIGINT) AS draw
        |  FROM g)
        |SELECT doc_id, span_idx,
        |       lo + (draw % (len - sl + 1)) AS start_tok,
        |       sl AS span_len, n AS n_tokens
        |FROM d
        |ORDER BY doc_id, span_idx""".stripMargin) { spark =>
      import spark.implicits._
      spanCorruptionOf(spark.table("documents"))
        .orderBy($"doc_id", $"span_idx")
    },

    // Character-entropy quality score: Shannon entropy (nats) of the
    // per-document character distribution — low entropy flags degenerate /
    // repetitive text, high flags noise. Sorted-bin fold + floor-round keep
    // the FP maths identical across engines (ln differs ≤ 1 ulp per term;
    // the 1e-4 rounding margin dwarfs the accumulated error).
    q("q64c_char_entropy",
      """WITH chars AS (
        |  SELECT doc_id, substring(text, CAST(i AS INT), 1) AS ch
        |  FROM (SELECT doc_id, text,
        |          unnest(range(1, length(text) + 1)) AS i FROM documents) t),
        |cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2),
        |tot AS (SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY doc_id),
        |parts AS (
        |  SELECT c.doc_id,
        |         list_sort(list(struct_pack(ch := c.ch, c := c.c))) AS bc,
        |         MAX(t.n) AS n
        |  FROM cnt c JOIN tot t USING (doc_id) GROUP BY c.doc_id)
        |SELECT doc_id,
        |       floor(list_reduce(
        |         list_transform(bc, x -> -(CAST(x.c AS DOUBLE) / n) *
        |                                  ln(CAST(x.c AS DOUBLE) / n)),
        |         (a, b) -> a + b) * 10000 + 0.5) / 10000 AS entropy
        |FROM parts
        |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val cnt = spark.table("documents")
        .select($"doc_id", $"text",
          explode(Canon.seq1(length($"text"))).as("i"))
        .select($"doc_id", substring($"text", $"i", lit(1)).as("ch"))
        .groupBy($"doc_id", $"ch").agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy($"doc_id").agg(sum($"c").as("n"))
      cnt.groupBy($"doc_id")
        .agg(sort_array(collect_list(struct($"ch", $"c"))).as("bc"))
        .join(tot, "doc_id")
        .select($"doc_id",
          (floor(aggregate($"bc", lit(0.0), (acc, x) => {
            val p = x.getField("c").cast(DoubleType) / $"n"
            acc - p * log(p)
          }) * 10000 + 0.5) / 10000).as("entropy"))
        .orderBy($"doc_id")
    },

    // Token counting: whitespace tokens + a BPE-ish regex segmentation
    // (letter runs / digit runs / single other chars) — the tokenizer-cost
    // estimate a training pipeline budgets by.
    q("q65_token_count",
      s"""SELECT doc_id,
         |  len($tokSql) AS ws_tokens,
         |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens,
         |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_estimate
         |FROM documents
         |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("documents")
        .select($"doc_id",
          size(split(lower($"text"), " ")).as("ws_tokens"),
          size(regexp_extract_all(lower($"text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .as("bpe_ish_tokens"),
          ceil(length($"text") / 4.0).cast(LongType).as("byte_estimate"))
        .orderBy($"doc_id")
    },

    // Document chunking: fixed 200-char windows with 50-char overlap
    // (stride 150) — the context-window prep op (RAG / pretraining
    // chunking). Per-row generator (explode over chunk starts) + substring
    // slices, all codegen'd; no shuffle at all until the final ORDER BY.
    q("q65b_chunking",
      """WITH idx AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, CAST(ceil(greatest(length(text) - 50, 1)
        |                                   / 150.0) AS INT))) AS i
        |  FROM documents)
        |SELECT doc_id, i AS chunk_idx,
        |       length(substring(text, CAST(i * 150 + 1 AS INT), 200)) AS chunk_len,
        |       md5(substring(text, CAST(i * 150 + 1 AS INT), 200)) AS chunk_md5
        |FROM idx
        |ORDER BY doc_id, chunk_idx""".stripMargin) { spark =>
      import spark.implicits._
      val nChunks = ceil(greatest(length($"text") - 50, lit(1))
        .cast(DoubleType) / 150.0).cast(IntegerType)
      spark.table("documents")
        .select($"doc_id", $"text",
          explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
        .select($"doc_id", $"chunk_idx",
          substring($"text", $"chunk_idx" * 150 + 1, lit(200)).as("chunk"))
        .select($"doc_id", $"chunk_idx",
          length($"chunk").as("chunk_len"),
          md5($"chunk".cast(BinaryType)).as("chunk_md5"))
        .orderBy($"doc_id", $"chunk_idx")
    },

    // Semantic (topic-shift) chunking — the RAG-era VARIABLE-boundary
    // segmenter, vs q65b's fixed 150-char stride: a boundary is cut after
    // token i where the Jaccard distance between the adjacent 5-token
    // windows is ≥ 0.9 (cohesive/repetitive spans score low and stay
    // uncut), subject to a greedy 20-token minimum chunk length — the
    // TextTiling-family lexical-cohesion recipe as a relational operator.
    // Determinism: window sets are exact (distinct-token intersections/
    // unions — integer sizes, one double division, identical spelling both
    // engines); greedy keep is an ascending left fold. ORACLE HAZARD
    // (new CLAUDE.md entry): DuckDB 1.0 list_reduce with a DATA-DEPENDENT
    // passthrough lambda (CASE … ELSE acc) over variable-length lists is
    // corrupted under vectorized multi-row evaluation — the same row folds
    // correctly alone and wrongly in a batch, for VARCHAR, struct, and
    // even plain BIGINT accumulators (8/500 rows wrong here; the repo's
    // safe uses are unconditional arithmetic folds or equal-length
    // lists). The oracle therefore spells the greedy selection as the
    // q198-style RECURSIVE CTE (immutable rows: each round keeps the
    // minimal candidate ≥ last + gap via NOT EXISTS); the Spark side
    // keeps the clean single-pass struct fold (functional, no hazard).
    // Scale: everything is per-doc bounded map-side work (O(n·w) per
    // doc), one ×chunks explode; no shuffle except the output sort.
    q("q219_semantic_chunking",
      """WITH RECURSIVE tk AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks,
        |         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n
        |  FROM documents),
        |cd AS (
        |  SELECT doc_id, n,
        |    list_filter(list_transform(range(1, n - 9 + 1), j -> j + 4),
        |      i -> 1e0 -
        |        CAST(len(list_intersect(list_distinct(toks[i-4:i]),
        |                                list_distinct(toks[i+1:i+5])))
        |             AS DOUBLE) /
        |        len(list_distinct(list_concat(list_distinct(toks[i-4:i]),
        |                                      list_distinct(toks[i+1:i+5]))))
        |        >= 0.9e0) AS cands
        |  FROM tk),
        |cl AS (SELECT doc_id, unnest(cands) AS i FROM cd),
        |sel AS (
        |  SELECT c.doc_id, c.i AS k FROM cl c
        |  WHERE c.i >= 20 AND NOT EXISTS (
        |    SELECT 1 FROM cl c2
        |    WHERE c2.doc_id = c.doc_id AND c2.i >= 20 AND c2.i < c.i)
        |  UNION ALL
        |  SELECT c.doc_id, c.i FROM sel s JOIN cl c
        |    ON c.doc_id = s.doc_id AND c.i >= s.k + 20
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM cl c2
        |    WHERE c2.doc_id = c.doc_id AND c2.i >= s.k + 20 AND c2.i < c.i)),
        |kk AS (SELECT doc_id, list_sort(list(k)) AS ks FROM sel
        |       GROUP BY doc_id),
        |ks AS (
        |  SELECT cd.doc_id, cd.n,
        |         COALESCE(kk.ks, CAST([] AS BIGINT[])) AS ks
        |  FROM cd LEFT JOIN kk ON kk.doc_id = cd.doc_id),
        |ch AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(ks) + 2),
        |      ci -> struct_pack(
        |        ci := CAST(ci AS BIGINT),
        |        s := CASE WHEN ci = 1 THEN CAST(1 AS BIGINT)
        |                  ELSE ks[CAST(ci AS INT) - 1] + 1 END,
        |        e := CASE WHEN ci = len(ks) + 1 THEN n
        |                  ELSE ks[CAST(ci AS INT)] END))) AS c
        |  FROM ks)
        |SELECT doc_id, c.ci AS chunk_idx, c.s AS start_tok, c.e AS end_tok,
        |       CAST(c.e - c.s + 1 AS BIGINT) AS n_toks
        |FROM ch
        |ORDER BY doc_id, chunk_idx""".stripMargin) { spark =>
      import spark.implicits._
      semanticChunkRowsOf(spark.table("documents"))
        .orderBy($"doc_id", $"chunk_idx")
    },

    // Document fingerprinting: raw md5 + an order/multiplicity-insensitive
    // canonical fingerprint (md5 of the sorted distinct token set — the
    // OpenRefine "fingerprint" method). md5 spells identically both engines.
    q("q66_fingerprint",
      s"""SELECT doc_id,
         |  md5(text) AS raw_fp,
         |  md5(array_to_string(list_sort(list_distinct($tokSql)), ' ')) AS canon_fp
         |FROM documents
         |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("documents")
        .select($"doc_id",
          md5($"text".cast(BinaryType)).as("raw_fp"),
          md5(concat_ws(" ", array_sort(array_distinct(split(lower($"text"), " "))))
            .cast(BinaryType)).as("canon_fp"))
        .orderBy($"doc_id")
    },

    // Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    // MOSS algorithm): hash every POSITIONAL 3-shingle, slide a w=4 window
    // over the hash sequence and keep each window's minimum — guarantees a
    // shared fingerprint for any match ≥ w+k−1 tokens while storing ~2/(w+1)
    // of the hashes. Output = per-doc fingerprint-set digest (sorted-concat
    // md5 — a single string, the comparator-safe spelling of a set) +
    // count. Window min is order-insensitive ⇒ deterministic under any
    // partitioning; the windowed MIN shuffles once on doc_id.
    q("q66b_winnowing",
      s"""WITH g AS (
         |  SELECT doc_id,
         |         generate_subscripts(gs, 1) - 1 AS pos,
         |         md5(unnest(gs)) AS h,
         |         len(gs) AS cnt
         |  FROM (SELECT doc_id,
         |          list_transform(range(1, len($tokSql) - 1),
         |            i -> $tokSql[i] || ' ' || $tokSql[i + 1] || ' ' ||
         |                 $tokSql[i + 2]) AS gs
         |        FROM documents) t),
         |w AS (
         |  SELECT doc_id, pos, cnt,
         |         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
         |  FROM g),
         |s AS (SELECT DISTINCT doc_id, sel FROM w WHERE pos + 4 <= cnt)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp,
         |       md5(string_agg(sel, '' ORDER BY sel)) AS fp
         |FROM s GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      // collect_set folds the dedup into the groupBy, and the groupBy key
      // equals the selection window's partition key, so the whole
      // select-dedup-digest tail runs on ONE doc_id exchange
      winnowedDistinct(spark)
        .groupBy($"doc_id")
        .agg(sort_array(collect_set($"sel")).as("sels"))
        .select($"doc_id", size($"sels").cast(LongType).as("n_fp"),
          md5(concat_ws("", $"sels").cast(BinaryType)).as("fp"))
        .orderBy($"doc_id")
    },

    // MOSS match detection — what the winnowed fingerprints are FOR: two
    // docs sharing selected fingerprints share a ≥ w+k−1-token span
    // (winnowing's guarantee), so pairing on the fingerprint key finds
    // plagiarism/reuse candidates with q92b's bucket-join shape — pair
    // volume scales with actual sharing, never corpus². Fingerprints
    // selected by more than [[matchDfCap]] documents are boilerplate (min
    // selection makes shared boilerplate MORE likely to win windows, so hot
    // keys are winnowing's native degenerate-bucket risk) and are dropped
    // before the self-join on BOTH engines — each join bucket then holds
    // ≤ cap members. No-op at sf0.01 (max fingerprint df 7), genuinely
    // truncating at sf0.1 (80 keys > 16), oracle replays the threshold.
    // Emits pairs sharing ≥ 2 surviving fingerprints with the shared count.
    q("q66c_winnowing_matches",
      s"""WITH g AS (
         |  SELECT doc_id,
         |         generate_subscripts(gs, 1) - 1 AS pos,
         |         md5(unnest(gs)) AS h,
         |         len(gs) AS cnt
         |  FROM (SELECT doc_id,
         |          list_transform(range(1, len($tokSql) - 1),
         |            i -> $tokSql[i] || ' ' || $tokSql[i + 1] || ' ' ||
         |                 $tokSql[i + 2]) AS gs
         |        FROM documents) t),
         |w AS (
         |  SELECT doc_id, pos, cnt,
         |         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
         |  FROM g),
         |s AS (SELECT DISTINCT doc_id, sel FROM w WHERE pos + 4 <= cnt),
         |hot AS (SELECT sel FROM s GROUP BY sel HAVING COUNT(*) > $matchDfCap),
         |sf AS (SELECT doc_id, sel FROM s
         |       WHERE sel NOT IN (SELECT sel FROM hot))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(COUNT(*) AS BIGINT) AS shared_fps
         |FROM sf a JOIN sf b ON a.sel = b.sel AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |HAVING COUNT(*) >= 2
         |ORDER BY id_a, id_b""".stripMargin) { spark =>
      winnowedMatchesFrom(winnowedDistinct(spark), matchDfCap)
    },

    // TF-IDF: the canonical corpus-weighting op. One token explode feeds
    // both the per-(doc, term) TF and, via a second groupBy, the DF side;
    // idf joins back on term (shuffle key = term, uniform); top-3 terms per
    // doc via bounded window. At 100 TB the df table is tiny relative to
    // the corpus and broadcast-joins back.
    q("q59b_tfidf_top_terms",
      s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term,
         |         ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
         |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
         |SELECT doc_id, term, tfidf FROM (
         |  SELECT doc_id, term, tfidf,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id
         |             ORDER BY tfidf DESC, term) AS rn
         |  FROM scored) t
         |WHERE rn <= 3
         |ORDER BY doc_id, term""".stripMargin) { spark =>
      import spark.implicits._
      val tok = spark.table("documents")
        .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
      val tf = tok.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      // df derives from tf (one row per (doc, term) ⇒ COUNT(*) per term ==
      // COUNT(DISTINCT doc_id) over raw tokens) — saves a second full
      // explode+shuffle pass over the corpus
      val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val n = spark.table("documents").count() // scalar, driver-safe
      val scored = tf.join(df, "term")
        .select($"doc_id", $"term",
          round($"tf" * log(lit(n.toDouble) / $"df"), 6).as("tfidf"))
      val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"term")
      scored.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
        .select($"doc_id", $"term", $"tfidf")
        .orderBy($"doc_id", $"term")
    },

    // Deterministic hash sampling — the reproducible distributed sampling
    // idiom (TABLESAMPLE is nondeterministic across engines): keep a doc iff
    // its content-hash prefix falls under the rate threshold. Portable
    // md5-hex comparison, identical sample both engines.
    q("q59c_hash_sample",
      """SELECT lang, COUNT(*) AS n_sampled
        |FROM documents
        |WHERE substr(md5(text), 1, 2) < '10'
        |GROUP BY lang
        |ORDER BY lang""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("documents")
        .filter(substring(md5($"text".cast(BinaryType)), 1, 2) < "10")
        .groupBy($"lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy($"lang")
    },

    // Stratified deterministic sampling: per-language rates (domain mixing —
    // upsample en, downsample the tail) via the same md5-prefix idiom as
    // q59c; reproducible across engines and runs, no RNG.
    q("q59d_stratified_sample",
      """SELECT lang, COUNT(*) AS n_sampled
        |FROM documents
        |WHERE substr(md5(text), 1, 2) <
        |      (CASE lang WHEN 'en' THEN '20' WHEN 'de' THEN '10' ELSE '08' END)
        |GROUP BY lang
        |ORDER BY lang""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("documents")
        .filter(substring(md5($"text".cast(BinaryType)), 1, 2) <
          when($"lang" === "en", "20").when($"lang" === "de", "10")
            .otherwise("08"))
        .groupBy($"lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy($"lang")
    },

    // Deterministic train/val/test split (~80/10/10): content-hash bucketing
    // so the assignment is a pure function of the text — stable across
    // reshards, engines, and pipeline reruns (the property random split
    // lacks).
    q("q59e_hash_split",
      """SELECT split, COUNT(*) AS n FROM (
        |  SELECT CASE WHEN h < 'cc' THEN 'train'
        |              WHEN h < 'e6' THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM (SELECT substr(md5(text), 1, 2) AS h FROM documents) t) s
        |GROUP BY split
        |ORDER BY split""".stripMargin) { spark =>
      import spark.implicits._
      val h = substring(md5($"text".cast(BinaryType)), 1, 2)
      spark.table("documents")
        .select(when(h < "cc", "train").when(h < "e6", "val")
          .otherwise("test").as("split"))
        .groupBy($"split").agg(count(lit(1)).as("n"))
        .orderBy($"split")
    },

    // Sequence packing: next-fit pack documents into 4096-token context
    // bins per language (bin = floor(running-start / 4096) over a
    // deterministic doc order) — the batch-shaping op a training pipeline
    // runs last. The oracle keeps the one-window SQL spelling; the Spark
    // side computes the identical prefix sum with the TWO-PHASE shape (see
    // [[packBins]]) because PARTITION BY lang alone is one task per
    // language — with ~3 languages that is 3 tasks total no matter how big
    // the corpus (VERDICT r05 §wrong-3).
    q("q59f_pack_bins",
      s"""WITH t AS (SELECT doc_id, lang, len($tokSql) AS toks FROM documents),
         |c AS (SELECT doc_id, lang, toks,
         |             SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
         |                             ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM t)
         |SELECT lang,
         |       CAST(floor(CAST(cum - toks AS DOUBLE) / 4096.0) AS INT) AS bin,
         |       COUNT(*) AS n_docs,
         |       CAST(SUM(toks) AS BIGINT) AS bin_tokens
         |FROM c
         |GROUP BY lang, bin
         |ORDER BY lang, bin""".stripMargin) { spark =>
      packBins(spark.table("documents"))
    },

    // Lexicon sentiment (PAPERS.md, EDBT 2016 pattern): tokens × constant
    // lexicon → per-doc weight sum. The lexicon is a literal inline table →
    // Spark broadcasts it (asserted in PlanShapeSpec); docs with no hits kept
    // via left join, scored 0.
    q("q67_sentiment",
      s"""SELECT d.doc_id,
         |  CAST(COALESCE(SUM(lex.weight), 0) AS BIGINT) AS sentiment,
         |  COUNT(lex.word) AS n_hits
         |FROM (SELECT doc_id, unnest($tokSql) AS token FROM documents) d
         |LEFT JOIN (
         |  SELECT * FROM (VALUES
         |    ('fast', 2), ('big', 1), ('value', 1), ('merge', 1),
         |    ('slow', -2), ('small', -1)) AS v(word, weight)) lex
         |  ON d.token = lex.word
         |GROUP BY d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val lexicon = Seq(
        ("fast", 2), ("big", 1), ("value", 1), ("merge", 1),
        ("slow", -2), ("small", -1)).toDF("word", "weight")
      spark.table("documents")
        .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
        .join(broadcast(lexicon), $"token" === $"word", "left")
        .groupBy($"doc_id")
        .agg(
          coalesce(sum($"weight"), lit(0)).cast(LongType).as("sentiment"),
          count($"word").as("n_hits"))
        .orderBy($"doc_id")
    },

    // Boilerplate detection (the C4-style line-dedup analog at shingle
    // granularity): a 3-shingle appearing in ≥ 5 distinct documents is
    // boilerplate; each document reports its distinct-shingle count, how
    // many are boilerplate, and the ratio. Plan: one explode → one
    // shuffle-by-shingle for document frequencies → the (Zipf-small)
    // boilerplate set broadcast back onto the shingle stream — the corpus
    // is scanned twice but never shuffled on doc_id until the final
    // per-doc aggregate. Ratio = exact-int division, IEEE-identical both
    // engines, surfaced through the floor-round pattern.
    q("q103_boilerplate",
      """WITH sh AS (
        |  SELECT doc_id,
        |         unnest(list_distinct(list_transform(
        |           range(1, len(string_split(lower(text), ' ')) - 1),
        |           i -> string_split(lower(text), ' ')[i] || ' ' ||
        |                string_split(lower(text), ' ')[i + 1] || ' ' ||
        |                string_split(lower(text), ' ')[i + 2]))) AS s
        |  FROM documents),
        |boiler AS (
        |  SELECT s FROM sh GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 5)
        |SELECT sh.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |  CAST(COUNT(b.s) AS BIGINT) AS n_boiler,
        |  floor(COUNT(b.s) * 10000.0 / COUNT(*) + 0.5) / 10000 AS boiler_ratio
        |FROM sh LEFT JOIN boiler b ON sh.s = b.s
        |GROUP BY sh.doc_id
        |ORDER BY sh.doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val sh = spark.table("documents")
        .select($"doc_id", split(lower($"text"), " ").as("toks"))
        .select($"doc_id", explode(array_distinct(transform(
          Canon.seq1(size($"toks") - 2),
          i => concat_ws(" ", element_at($"toks", i),
            element_at($"toks", i + 1), element_at($"toks", i + 2))))).as("s"))
      val boiler = sh.groupBy($"s")
        .agg(countDistinct($"doc_id").as("df"))
        .filter($"df" >= 5).select($"s", lit(1).as("b"))
      sh.join(broadcast(boiler), Seq("s"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).cast(LongType).as("n_shingles"),
          count($"b").cast(LongType).as("n_boiler"),
          (floor(count($"b") * 10000.0 / count(lit(1)) + 0.5) / 10000)
            .as("boiler_ratio"))
        .orderBy($"doc_id")
    },

    // PII redaction — the scrub pass every training-data pipeline runs
    // before using a corpus. The fixture text carries no PII, so each doc is
    // augmented with a deterministic contact line (same expression both
    // engines), then emails, URLs and phone numbers are masked by chained
    // regexp_replace. Patterns stay in the RE2∩Java dialect subset (explicit
    // character classes, no lookaround); DuckDB needs the 'g' flag to match
    // Spark's replace-all default. The redaction is verified in aggregate:
    // per-tag hit counts plus total post-redaction chars (a checksum any
    // divergent replacement would break). Map-side only — no shuffle until
    // the final 1-row aggregate: the 100 TB shape of a scrub pass.
    q("q102_pii_redact",
      """WITH aug AS (
        |  SELECT doc_id,
        |         text || ' contact u' || doc_id ||
        |         '@example.com or https://ex.org/p/' || doc_id ||
        |         ' call 555-867-5309' AS t
        |  FROM documents),
        |red AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(t,
        |          '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |        'https?://[^ ]+', '<URL>', 'g'),
        |      '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |  FROM aug)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN redacted LIKE '%<EMAIL>%' THEN 1 ELSE 0 END) AS BIGINT) AS with_email,
        |  CAST(SUM(CASE WHEN redacted LIKE '%<URL>%' THEN 1 ELSE 0 END) AS BIGINT) AS with_url,
        |  CAST(SUM(CASE WHEN redacted LIKE '%<PHONE>%' THEN 1 ELSE 0 END) AS BIGINT) AS with_phone,
        |  CAST(SUM(len(redacted)) AS BIGINT) AS total_chars
        |FROM red""".stripMargin) { spark =>
      import spark.implicits._
      val aug = spark.table("documents").select($"doc_id",
        concat($"text", lit(" contact u"), $"doc_id",
          lit("@example.com or https://ex.org/p/"), $"doc_id",
          lit(" call 555-867-5309")).as("t"))
      val redacted = regexp_replace(
        regexp_replace(
          regexp_replace($"t",
            "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
          "https?://[^ ]+", "<URL>"),
        "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>")
      aug.select($"doc_id", redacted.as("redacted"))
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum(when($"redacted".contains("<EMAIL>"), 1).otherwise(0))
            .cast(LongType).as("with_email"),
          sum(when($"redacted".contains("<URL>"), 1).otherwise(0))
            .cast(LongType).as("with_url"),
          sum(when($"redacted".contains("<PHONE>"), 1).otherwise(0))
            .cast(LongType).as("with_phone"),
          sum(length($"redacted")).cast(LongType).as("total_chars"))
    },

    // Bigram conditional LM score — q109's unigram NLL upgraded to
    // transition likelihood: avg over a doc's bigram INSTANCES of
    // −ln(c(w1 w2) / c(w1 ·)), with both counts trained on the corpus
    // itself. Flags token-order scrambles that unigram stats cannot see
    // (same words, impossible transitions ⇒ high score). Same determinism
    // contract as q109: per-doc sorted struct fold, identical 0-seeded
    // left fold, floor-rounded free double. Scale: two bigram-keyed
    // shuffles (counts + the count join) and one doc_id shuffle.
    q("q109b_bigram_lm_score",
      s"""WITH bg AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, len($tokSql)),
         |                i -> $tokSql[i] || ' ' || $tokSql[i + 1])) AS bigram
         |  FROM documents),
         |c12 AS (SELECT bigram, COUNT(*) AS n12 FROM bg GROUP BY bigram),
         |c1 AS (SELECT string_split(bigram, ' ')[1] AS w1, COUNT(*) AS n1
         |       FROM bg GROUP BY 1),
         |d AS (
         |  SELECT bg.doc_id,
         |         list_sort(list(struct_pack(bigram := bg.bigram,
         |                                    n12 := c12.n12,
         |                                    n1 := c1.n1))) AS tl
         |  FROM bg
         |  JOIN c12 USING (bigram)
         |  JOIN c1 ON c1.w1 = string_split(bg.bigram, ' ')[1]
         |  GROUP BY bg.doc_id)
         |SELECT doc_id, CAST(len(tl) AS BIGINT) AS n_bigrams,
         |  floor((list_reduce(list_transform(tl,
         |           x -> ln(CAST(x.n1 AS DOUBLE)) - ln(CAST(x.n12 AS DOUBLE))),
         |         (a, b) -> a + b) / len(tl)) * 10000 + 0.5) / 10000 AS nll
         |FROM d ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val bg = Tables.spread(spark.table("documents"))
        .select($"doc_id", split(lower($"text"), " ").as("toks"))
        .select($"doc_id", explode(transform(
          Canon.seq1(size($"toks") - 1),
          i => concat_ws(" ", element_at($"toks", i), element_at($"toks", i + 1))))
          .as("bigram"))
      // r19 single-pass shape: the bigram explode used to run THREE times
      // (both count trainings + the scoring join) and the counts were
      // sort-merge-joined back onto every instance. Now ONE explode pass
      // feeds a (doc_id)-repartitioned per-(doc, bigram) count — the
      // exchange both aggregation levels AND the final per-doc collect
      // share (hash(doc_id) clusters them all) — checkpointed once
      // (multi-consumer rule; it feeds both trainings + the score), with
      // vocab²-bounded c12/c1 derived FROM it as sums of c and broadcast.
      // The fold replays the per-INSTANCE double sequence exactly: the
      // instance-sorted list groups equal bigrams adjacently, so folding
      // each distinct bigram's term c times left-to-right is the identical
      // arithmetic (LogRatioFold's repeat loop).
      val dd = bg.repartition($"doc_id")
        .groupBy($"doc_id", $"bigram").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val c12 = dd.groupBy($"bigram").agg(sum($"c").as("n12"))
      val c1 = dd.select(split($"bigram", " ").getItem(0).as("w1"), $"c")
        .groupBy($"w1").agg(sum($"c").as("n1"))
      dd.join(broadcast(c12), "bigram")
        .join(broadcast(c1), split(dd("bigram"), " ").getItem(0) === c1("w1"))
        .groupBy($"doc_id")
        .agg(sort_array(collect_list(
          struct($"bigram", $"c", $"n12", $"n1"))).as("tl"),
          sum($"c").cast(LongType).as("n_bigrams"))
        .select($"doc_id", $"n_bigrams",
          (floor((graft.functions.VectorExpressions.logRatioFold($"tl")
            / $"n_bigrams") * 10000 + 0.5) / 10000).as("nll"))
        .orderBy($"doc_id")
    },

    // Heavy hitters via a Misra-Gries sketch (functions/MisraGries.scala):
    // one map-side-combinable pass with ≤ k−1 counters per partition finds
    // the CANDIDATE set (guaranteed ⊇ every token with freq > n/k); a
    // bounded exact recount of just those candidates then filters on the
    // true threshold. The sketch's run-to-run candidate variance cancels —
    // the recounted, thresholded answer is exact, which is why a sketch
    // query can be hash-checked at all (vs q29/q27b's rows-only contract).
    // At 100 TB this avoids ever shuffling the full token cardinality: the
    // wide groupBy runs on candidate tokens only (the sketch row fetched to
    // the driver is ≤ k−1 strings — control flow, not data, same contract
    // as the components() fixpoint probe).
    // Unigram language-model score — the "perplexity filter" of a training
    // pipeline: train token frequencies on the corpus itself (one groupBy),
    // score each document by its average negative log-likelihood
    // ln(N) − avg(ln(tf)). High nll = rare-token soup (drop candidates),
    // low = common boilerplate. Determinism: per-doc ln terms are folded in
    // sorted (token, tf) order from an identical 0-seeded left fold on both
    // engines, and the free-double result is floor-rounded (the q64c
    // pattern). Scale: tokens shuffle once on token (the tf join) and once
    // on doc_id; the corpus-wide total is a 1-row broadcast.
    // BM25 ranked retrieval (Robertson-Spärck Jones probabilistic model,
    // k1 = 1.2, b = 0.75) for a fixed 3-term query — the relevance scoring
    // an engine-side search surface runs: one corpus statistics pass
    // (doc lengths, avgdl — a 1-row broadcast), term frequencies for the
    // query terms only (the IN filter prunes the token stream BEFORE the
    // per-(doc, term) aggregate — at 100 TB the tf relation is |terms|-
    // bounded per doc, never the full inverted index), document frequencies
    // as a |terms|-row broadcast, then per-doc scoring. Determinism: the
    // per-term contributions are pivoted into FIXED columns and added in
    // spelled order c1 + c2 + c3 (no aggregation-order dependence), every
    // input to the IEEE expression is integer-derived, and the free-double
    // score is floor-rounded before the ORDER BY (doc_id tiebreaks the
    // rounded ties, so the top-50 cut is total-ordered on both engines).
    q("q139_bm25",
      s"""WITH $bm25LexCtes
         |SELECT doc_id, bm25 FROM bm25lex
         |ORDER BY bm25 DESC, doc_id""".stripMargin) { spark =>
      import spark.implicits._
      bm25Scores(spark)
        .orderBy($"bm25".desc, $"doc_id")
        .limit(50)
    },

    // Hybrid retrieval via reciprocal rank fusion (RRF, Cormack et al.
    // SIGIR'09 — the standard lexical+dense ensemble of modern retrieval
    // stacks): fuse q139's BM25 top-50 (lexical signal, the fixed 3-term
    // query) with an exact-cosine top-50 against probe vector 0 over the
    // doc-aligned embeddings (dense signal, q80's scoring idiom) as
    // Σ_s 1/(60 + rank_s). Rank fusion needs only INTEGER ranks from each
    // signal's total order (rounded score desc, id tiebreak — both signals
    // already order totally), so the fused score is a two-term double sum
    // in spelled order: bit-identical cross-engine, floor-rounded at the
    // surface. Missing-from-a-list contributes 0 (the standard convention);
    // absent ranks surface as 0. Scale: each signal is its own bounded
    // top-k (TakeOrdered, never a corpus-wide rank window); the rank
    // windows and the full-outer fuse run on ≤50-row relations.
    q("q217_rrf_fusion",
      s"""WITH $bm25LexCtes,
         |lexr AS (
         |  SELECT doc_id,
         |         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS ra
         |  FROM bm25lex),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |      FROM embeddings),
         |pr AS (SELECT emb AS pemb FROM e WHERE vec_id = 0),
         |cosd AS (
         |  SELECT e.vec_id AS doc_id,
         |         ${graft.api.Canon.Oracle.r4(
                     "(list_dot_product(e.emb, pr.pemb) / " +
                       "(sqrt(list_dot_product(e.emb, e.emb)) * " +
                       "sqrt(list_dot_product(pr.pemb, pr.pemb))))")} AS cos
         |  FROM e CROSS JOIN pr WHERE e.vec_id <> 0),
         |densetop AS (
         |  SELECT doc_id, cos FROM cosd ORDER BY cos DESC, doc_id LIMIT 50),
         |denser AS (
         |  SELECT doc_id,
         |         ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rb
         |  FROM densetop),
         |fused AS (
         |  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, l.ra, d.rb
         |  FROM lexr l FULL OUTER JOIN denser d ON l.doc_id = d.doc_id)
         |SELECT doc_id,
         |  CAST(COALESCE(ra, 0) AS BIGINT) AS lex_rank,
         |  CAST(COALESCE(rb, 0) AS BIGINT) AS dense_rank,
         |  floor((COALESCE(1e0 / (60 + ra), 0e0) +
         |         COALESCE(1e0 / (60 + rb), 0e0)) * 1000000 + 0.5) / 1000000
         |    AS rrf
         |FROM fused
         |ORDER BY rrf DESC, doc_id
         |LIMIT 20""".stripMargin) { spark =>
      import spark.implicits._
      val wl = Window.orderBy($"bm25".desc, $"doc_id")
      val lexr = bm25Scores(spark)
        .orderBy($"bm25".desc, $"doc_id").limit(50)
        .withColumn("ra", row_number().over(wl))
        .select($"doc_id", $"ra")
      val e = spark.table("embeddings")
        .select($"vec_id", transform($"embedding", _.cast(DoubleType)).as("emb"))
      val pr = e.filter($"vec_id" === 0).select($"emb".as("pemb"))
      def dotd(a: Column, b: Column): Column =
        graft.functions.VectorExpressions.dotd(a, b)
      val wd = Window.orderBy($"cos".desc, $"doc_id")
      val denser = Tables.spread(e).filter($"vec_id" =!= 0)
        .crossJoin(broadcast(pr))
        .select($"vec_id".as("doc_id"),
          graft.api.Canon.r4(dotd($"emb", $"pemb") /
            (sqrt(dotd($"emb", $"emb")) * sqrt(dotd($"pemb", $"pemb"))))
            .as("cos"))
        .orderBy($"cos".desc, $"doc_id").limit(50)
        .withColumn("rb", row_number().over(wd))
        .select($"doc_id", $"rb")
      lexr.join(denser, Seq("doc_id"), "full_outer")
        .select($"doc_id",
          coalesce($"ra", lit(0)).cast(LongType).as("lex_rank"),
          coalesce($"rb", lit(0)).cast(LongType).as("dense_rank"),
          (floor((coalesce(lit(1.0) / (lit(60) + $"ra"), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + $"rb"), lit(0.0)))
            * 1000000 + 0.5) / 1000000).as("rrf"))
        .orderBy($"rrf".desc, $"doc_id")
        .limit(20)
    },

    q("q109_lm_score",
      s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS token FROM documents),
         |f AS (SELECT token, COUNT(*) AS tf FROM t GROUP BY token),
         |tot AS (SELECT COUNT(*) AS n FROM t),
         |d AS (SELECT t.doc_id,
         |        list_sort(list(struct_pack(token := t.token, tf := f.tf))) AS tl
         |      FROM t JOIN f USING (token) GROUP BY t.doc_id)
         |SELECT doc_id, CAST(len(tl) AS BIGINT) AS n_toks,
         |  floor((ln(CAST((SELECT n FROM tot) AS DOUBLE)) -
         |         list_reduce(list_transform(tl, x -> ln(CAST(x.tf AS DOUBLE))),
         |                     (a, b) -> a + b) / len(tl))
         |        * 10000 + 0.5) / 10000 AS nll
         |FROM d ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val toks = spark.table("documents")
        .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
      val freq = toks.groupBy($"token").agg(count(lit(1)).as("tf"))
      val tot = toks.agg(count(lit(1)).as("n"))
      toks.join(freq, "token")
        .groupBy($"doc_id")
        .agg(sort_array(collect_list(struct($"token", $"tf"))).as("tl"))
        .join(broadcast(tot)) // 1-row broadcast
        .select($"doc_id", size($"tl").cast(LongType).as("n_toks"),
          (floor((log($"n".cast(DoubleType)) -
            aggregate($"tl", lit(0.0), (acc, x) =>
              acc + log(x.getField("tf").cast(DoubleType))) / size($"tl"))
            * 10000 + 0.5) / 10000).as("nll"))
        .orderBy($"doc_id")
    },

    // Token-distribution drift between corpus snapshots (the data-drift
    // monitor a training pipeline runs per ingest batch): the q128 snapshot
    // pair's unigram distributions compared by KL divergence in BOTH
    // directions plus total variation distance, with add-one smoothing
    // over the union vocabulary so zero-count tokens stay finite. Bit
    // determinism across engines needs a FIXED summation association, but
    // one corpus-wide sorted fold would collect the whole vocabulary onto a
    // single row (VERDICT r06 #3) — so the fold is two-level: tokens fold
    // sorted WITHIN md5-mod-64 buckets (each bucket |V|/64 rows, scaling
    // out with the vocabulary), then the 64 bucket partials — a constant-
    // size array — fold sorted by bucket id. Both engines spell the exact
    // same (bucket, token) association, so IEEE sums agree bit-for-bit
    // (ln through the r4 margin per the q122/q134 precedent). TV distance
    // is |p−q| — pure rational arithmetic. Scale: two corpus-sized
    // map-side-combinable token rollups, one |vocab|-row join, one bounded
    // 64-key fold; nothing quadratic, nothing single-task.
    q("q184_token_drift",
      s"""WITH snap_a AS (
         |  SELECT text FROM documents WHERE doc_id % 7 <> 0),
         |snap_b AS (
         |  SELECT CASE WHEN doc_id % 3 = 0 THEN text || ' drifted'
         |              ELSE text END AS text
         |  FROM documents WHERE doc_id % 5 <> 0),
         |ta AS (SELECT unnest(string_split(lower(text), ' ')) AS token
         |       FROM snap_a),
         |tb AS (SELECT unnest(string_split(lower(text), ' ')) AS token
         |       FROM snap_b),
         |ca AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM ta
         |       GROUP BY token),
         |cb AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tb
         |       GROUP BY token),
         |v AS (
         |  SELECT COALESCE(ca.token, cb.token) AS token,
         |         COALESCE(ca.c, 0) AS a, COALESCE(cb.c, 0) AS b
         |  FROM ca FULL OUTER JOIN cb ON ca.token = cb.token),
         |tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na,
         |               CAST(SUM(b) AS BIGINT) AS nb,
         |               CAST(COUNT(*) AS BIGINT) AS vsz FROM v),
         |bkt AS (
         |  SELECT CAST(CAST(('0x' || substr(md5(token), 1, 8)) AS UBIGINT)
         |              % 64 AS BIGINT) AS bucket, token, a, b
         |  FROM v),
         |barr AS (
         |  SELECT bucket, list_sort(list(struct_pack(token := token, a := a,
         |                                            b := b))) AS l
         |  FROM bkt GROUP BY bucket),
         |bpart AS (
         |  SELECT bucket,
         |    list_reduce(list_prepend(0.0, list_transform(barr.l, x ->
         |      (CAST(x.b + 1 AS DOUBLE) / (tot.nb + tot.vsz)) *
         |      ln((CAST(x.b + 1 AS DOUBLE) / (tot.nb + tot.vsz)) /
         |         (CAST(x.a + 1 AS DOUBLE) / (tot.na + tot.vsz))))),
         |      (p, q) -> p + q) AS kb,
         |    list_reduce(list_prepend(0.0, list_transform(barr.l, x ->
         |      (CAST(x.a + 1 AS DOUBLE) / (tot.na + tot.vsz)) *
         |      ln((CAST(x.a + 1 AS DOUBLE) / (tot.na + tot.vsz)) /
         |         (CAST(x.b + 1 AS DOUBLE) / (tot.nb + tot.vsz))))),
         |      (p, q) -> p + q) AS ka,
         |    list_reduce(list_prepend(0.0, list_transform(barr.l, x ->
         |      abs(CAST(x.a AS DOUBLE) / tot.na -
         |          CAST(x.b AS DOUBLE) / tot.nb))),
         |      (p, q) -> p + q) AS tv
         |  FROM barr CROSS JOIN tot),
         |parr AS (
         |  SELECT list_sort(list(struct_pack(bucket := bucket, kb := kb,
         |                                    ka := ka, tv := tv))) AS pl
         |  FROM bpart)
         |SELECT tot.na AS tokens_a, tot.nb AS tokens_b, tot.vsz AS vocab,
         |  floor(list_reduce(list_prepend(0.0,
         |      list_transform(parr.pl, x -> x.kb)), (p, q) -> p + q)
         |    * 10000 + 0.5) / 10000 AS kl_b_from_a,
         |  floor(list_reduce(list_prepend(0.0,
         |      list_transform(parr.pl, x -> x.ka)), (p, q) -> p + q)
         |    * 10000 + 0.5) / 10000 AS kl_a_from_b,
         |  floor(list_reduce(list_prepend(0.0,
         |      list_transform(parr.pl, x -> x.tv)), (p, q) -> p + q)
         |    / 2 * 10000 + 0.5) / 10000 AS tv_dist
         |FROM parr CROSS JOIN tot""".stripMargin) { spark =>
      import spark.implicits._
      val docs = spark.table("documents")
      val ta = docs.filter($"doc_id" % 7 =!= 0)
        .select(explode(split(lower($"text"), " ")).as("token"))
      val tb = docs.filter($"doc_id" % 5 =!= 0)
        .select(when($"doc_id" % 3 === 0, concat($"text", lit(" drifted")))
          .otherwise($"text").as("text"))
        .select(explode(split(lower($"text"), " ")).as("token"))
      val ca = ta.groupBy($"token").agg(count(lit(1)).as("c"))
      val cb = tb.groupBy($"token").agg(count(lit(1)).as("c"))
      val v = ca.as("ca").join(cb.as("cb"), Seq("token"), "full_outer")
        .select($"token", coalesce($"ca.c", lit(0L)).as("a"),
          coalesce($"cb.c", lit(0L)).as("b"))
        .localCheckpoint() // feeds the totals AND the bucketed folds
      val tot = v.agg(sum($"a").cast(LongType).as("na"),
        sum($"b").cast(LongType).as("nb"),
        count(lit(1)).cast(LongType).as("vsz"))
      def pb(x: Column) = (x.getField("b") + 1).cast(DoubleType) /
        ($"nb" + $"vsz")
      def pa(x: Column) = (x.getField("a") + 1).cast(DoubleType) /
        ($"na" + $"vsz")
      val barr = v
        .withColumn("bucket", (conv(substring(md5($"token".cast(BinaryType)),
          1, 8), 16, 10).cast(LongType) % 64))
        .groupBy($"bucket")
        .agg(sort_array(collect_list(struct($"token", $"a", $"b"))).as("l"))
      val bpart = barr.crossJoin(broadcast(tot)).select($"bucket",
        aggregate($"l", lit(0.0), (acc, x) =>
          acc + pb(x) * log(pb(x) / pa(x))).as("kb"),
        aggregate($"l", lit(0.0), (acc, x) =>
          acc + pa(x) * log(pa(x) / pb(x))).as("ka"),
        aggregate($"l", lit(0.0), (acc, x) =>
          acc + abs(x.getField("a").cast(DoubleType) / $"na" -
            x.getField("b").cast(DoubleType) / $"nb")).as("tv"))
      val parr = bpart.agg(sort_array(collect_list(
        struct($"bucket", $"kb", $"ka", $"tv"))).as("pl"))
      parr.crossJoin(broadcast(tot))
        .select($"na".as("tokens_a"), $"nb".as("tokens_b"),
          $"vsz".as("vocab"),
          (floor(aggregate($"pl", lit(0.0), (acc, x) =>
            acc + x.getField("kb")) * 10000 + 0.5) / 10000)
            .as("kl_b_from_a"),
          (floor(aggregate($"pl", lit(0.0), (acc, x) =>
            acc + x.getField("ka")) * 10000 + 0.5) / 10000)
            .as("kl_a_from_b"),
          (floor(aggregate($"pl", lit(0.0), (acc, x) =>
            acc + x.getField("tv")) / 2 * 10000 + 0.5) / 10000)
            .as("tv_dist"))
    },

    q("q108_heavy_hitters",
      s"""WITH t AS (SELECT unnest($tokSql) AS token FROM documents)
         |SELECT token, COUNT(*) AS n_tok
         |FROM t
         |GROUP BY token
         |HAVING COUNT(*) * 200 > (SELECT COUNT(*) FROM t)
         |ORDER BY n_tok DESC, token""".stripMargin) { spark =>
      import spark.implicits._
      val k = 200
      val toks = spark.table("documents")
        .select(explode(split(lower($"text"), " ")).as("token"))
      val mg = udaf(new graft.functions.MisraGries(k),
        org.apache.spark.sql.Encoders.STRING)
      // the ≤ k−1 Misra-Gries candidates stay a DataFrame (no .head() driver
      // round-trip) and broadcast-semi-join the token stream for exact counts
      val cands = toks.agg(mg($"token").as("cands"))
        .select(explode($"cands").as("token"))
      val counts = toks.join(broadcast(cands), Seq("token"), "left_semi")
        .groupBy($"token").agg(count(lit(1)).as("n_tok"))
      val total = toks.agg(count(lit(1)).as("_total"))
      counts.join(broadcast(total)) // 1-row broadcast, not a cartesian
        .filter($"n_tok" * k > $"_total")
        .select($"token", $"n_tok")
        .orderBy($"n_tok".desc, $"token")
    },

    // Vocabulary build + corpus encoding — the tokenizer-construction op a
    // training pipeline runs once per corpus: vocab = top-V tokens by
    // frequency (deterministic tiebreak), ids assigned in rank order; the
    // corpus is then encoded against it and each doc reports its
    // out-of-vocabulary profile (the signal that drives vocab-size/quality
    // decisions). V = 16 here so the fixture genuinely produces OOV tokens.
    // Scale shape: one token-keyed count shuffle; the RANKED relation is
    // the distinct vocabulary (≪ corpus, the only place a global order
    // appears); encoding is a broadcast left join — map-side over the
    // corpus. id_sum is an order-free checksum of the assignment so the
    // oracle validates every id, not just the OOV counts.
    q("q116_vocab_encode",
      s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS token FROM documents),
         |cnt AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
         |vocab AS (
         |  SELECT token, ROW_NUMBER() OVER (ORDER BY n DESC, token) - 1 AS id
         |  FROM cnt ORDER BY n DESC, token LIMIT 16),
         |enc AS (SELECT t.doc_id, v.id FROM tok t LEFT JOIN vocab v USING (token))
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
         |  CAST(SUM(CASE WHEN id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |  floor(SUM(CASE WHEN id IS NULL THEN 1 ELSE 0 END) * 10000.0
         |        / COUNT(*) + 0.5) / 10000 AS oov_rate,
         |  CAST(SUM(COALESCE(id, 0)) AS BIGINT) AS id_sum
         |FROM enc GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val tok = spark.table("documents")
        .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
      val cnt = tok.groupBy($"token").agg(count(lit(1)).as("n"))
      val vocab = cnt.orderBy($"n".desc, $"token").limit(16)
        .withColumn("id",
          row_number().over(Window.orderBy($"n".desc, $"token")) - 1)
        .select($"token", $"id")
      tok.join(broadcast(vocab), Seq("token"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).cast("bigint").as("n_toks"),
          sum(when($"id".isNull, 1).otherwise(0)).cast("bigint").as("n_oov"),
          (floor(sum(when($"id".isNull, 1).otherwise(0)) * 10000.0
            / count(lit(1)) + 0.5) / 10000).as("oov_rate"),
          sum(coalesce($"id", lit(0))).cast("bigint").as("id_sum"))
        .orderBy($"doc_id")
    },

    // Gopher-style repetition filters (Rae et al. 2021 appendix A, the
    // repeated-content gates every LLM-ingest pipeline runs, PAPERS.md):
    // per-document duplicate-token fraction, most-common-unigram fraction,
    // and top-bigram fraction, composed into the keep/drop decision. The
    // fixture text is single-line so the line/paragraph variants of the
    // rule collapse onto the token forms. Scale shape: two (doc_id, gram)-
    // keyed count shuffles (map-side combinable, key cardinality ≈ corpus
    // tokens), each collapsing to a ≪-corpus per-doc stat relation, then a
    // doc_id-keyed join of those two relations — no corpus-sized join, no
    // window. Ratios are free doubles → IEEE floor rounding (Canon.r4
    // spelling); thresholds chosen to genuinely split this corpus
    // (dup-frac median 0.83, top-uni median 0.093, top-bi median 0.033).
    q("q118_repetition_stats",
      s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS token FROM documents),
         |uc AS (SELECT doc_id, token, COUNT(*) AS c
         |       FROM tok GROUP BY doc_id, token),
         |u AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |             CAST(MAX(c) AS BIGINT) AS top_uni,
         |             CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
         |               AS dup_toks
         |      FROM uc GROUP BY doc_id),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |                i -> toks[i] || ' ' || toks[i + 1])) AS bigram
         |       FROM (SELECT doc_id, $tokSql AS toks FROM documents) t),
         |bc AS (SELECT doc_id, bigram, COUNT(*) AS c
         |       FROM bg GROUP BY doc_id, bigram),
         |b AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bi,
         |             CAST(SUM(c) AS BIGINT) AS n_bigrams
         |      FROM bc GROUP BY doc_id)
         |SELECT u.doc_id, u.n_tokens,
         |  floor(CAST(u.dup_toks AS DOUBLE) * 10000 / u.n_tokens + 0.5)
         |    / 10000 AS dup_token_frac,
         |  floor(CAST(u.top_uni AS DOUBLE) * 10000 / u.n_tokens + 0.5)
         |    / 10000 AS top_unigram_frac,
         |  floor(COALESCE(CAST(b.top_bi AS DOUBLE) / b.n_bigrams, 0.0)
         |    * 10000 + 0.5) / 10000 AS top_bigram_frac,
         |  CAST(CASE WHEN CAST(u.dup_toks AS DOUBLE) / u.n_tokens <= 0.85
         |             AND CAST(u.top_uni AS DOUBLE) / u.n_tokens <= 0.11
         |             AND COALESCE(CAST(b.top_bi AS DOUBLE) / b.n_bigrams, 0.0)
         |                 <= 0.05
         |        THEN 1 ELSE 0 END AS INT) AS keep
         |FROM u LEFT JOIN b USING (doc_id)
         |ORDER BY u.doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val dupR = $"dup_toks".cast("double") / $"n_tokens"
      val uniR = $"top_uni".cast("double") / $"n_tokens"
      val biR = coalesce($"top_bi".cast("double") / $"n_bigrams", lit(0.0))
      repetitionJoined(spark)
        .select($"doc_id", $"n_tokens",
          (floor($"dup_toks".cast("double") * 10000 / $"n_tokens" + 0.5)
            / 10000).as("dup_token_frac"),
          (floor($"top_uni".cast("double") * 10000 / $"n_tokens" + 0.5)
            / 10000).as("top_unigram_frac"),
          (floor(biR * 10000 + 0.5) / 10000).as("top_bigram_frac"),
          when(dupR <= 0.85 && uniR <= 0.11 && biR <= 0.05, 1)
            .otherwise(0).cast("int").as("keep"))
        .orderBy($"doc_id")
    },

    // Source-weighted data mixing with EPOCH upsampling — the step that
    // turns per-source mixing weights into an actual training mix: a doc
    // from a source with rate r is emitted floor(r) times plus once more
    // for a deterministic u < frac(r) hash draw (so rate 1.5 = every doc
    // once, the md5-selected half twice), and the per-source token budget
    // is accounted after mixing. Extends q59d (which only FILTERS at
    // rate ≤ 1): weights live in a broadcast dim table with a default,
    // and u comes from the same content-hash idiom (first 8 md5 hex as a
    // uint32 fraction — conv() on the Spark side, UBIGINT cast in DuckDB,
    // identical 32-bit values). Map-side per doc; one source-keyed agg.
    q("q120_source_mixing",
      s"""WITH w(source, rate) AS (VALUES
         |    ('src0', 2.0), ('src1', 1.5), ('src2', 1.25), ('src3', 1.0)),
         |d AS (
         |  SELECT t.source, COALESCE(w.rate, 0.4) AS rate,
         |         len($tokSql) AS toks,
         |         CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT)
         |           / 4294967296.0 AS u
         |  FROM documents t LEFT JOIN w USING (source)),
         |c AS (
         |  SELECT source, rate, toks,
         |         CAST(floor(rate) AS BIGINT) +
         |         (CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END)
         |           AS copies
         |  FROM d)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(copies) AS BIGINT) AS n_copies,
         |  CAST(SUM(copies * toks) AS BIGINT) AS mixed_tokens,
         |  floor(CAST(SUM(copies) AS DOUBLE) * 10000 / COUNT(*) + 0.5)
         |    / 10000 AS achieved_epochs,
         |  MIN(rate) AS target_epochs
         |FROM c GROUP BY source
         |ORDER BY source""".stripMargin) { spark =>
      import spark.implicits._
      val w = Seq(("src0", 2.0), ("src1", 1.5), ("src2", 1.25),
        ("src3", 1.0)).toDF("source", "rate")
      val d = spark.table("documents")
        .join(broadcast(w), Seq("source"), "left")
        .select($"source", coalesce($"rate", lit(0.4)).as("rate"),
          size(split(lower($"text"), " ")).as("toks"),
          (conv(substring(md5($"text".cast(BinaryType)), 1, 8), 16, 10)
            .cast(LongType) / lit(4294967296.0)).as("u"))
      d.select($"source", $"rate", $"toks",
          (floor($"rate").cast(LongType) +
            when($"u" < $"rate" - floor($"rate"), 1L).otherwise(0L))
            .as("copies"))
        .groupBy($"source")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum($"copies").cast(LongType).as("n_copies"),
          sum($"copies" * $"toks").cast(LongType).as("mixed_tokens"),
          (floor(sum($"copies").cast(DoubleType) * 10000 / count(lit(1))
            + 0.5) / 10000).as("achieved_epochs"),
          min($"rate").as("target_epochs"))
        .orderBy($"source")
    },

    // DSIR-style importance weights (Xie et al., NeurIPS 2023: "Data
    // Selection for Language Models via Importance Resampling"): score each
    // raw doc by how target-like its token distribution is, log w(x) =
    // avg over token instances of ln p_target(tok) − ln p_raw(tok), with
    // the lang='en' slice standing in for the target domain and add-one
    // smoothing over the raw vocabulary so target-absent tokens stay
    // finite. The constant ln(N_raw) − ln(N_tgt + V) is pulled out of the
    // fold, so the per-token fold is exactly q109's proven shape: sorted
    // struct list, identical 0-seeded left fold of ln's of exact integer
    // counts, floor-rounded free double. Scale: two token-keyed count
    // shuffles, one token-keyed probability join, one doc_id shuffle;
    // the three scalar totals are 1-row broadcasts. High logw = resample
    // into the training mix; the downstream sampler is q120's.
    q("q122_dsir_weights",
      s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS token FROM documents),
         |tg AS (SELECT unnest($tokSql) AS token FROM documents
         |       WHERE lang = 'en'),
         |craw AS (SELECT token, COUNT(*) AS cr FROM t GROUP BY token),
         |ctgt AS (SELECT token, COUNT(*) AS ct FROM tg GROUP BY token),
         |nraw AS (SELECT COUNT(*) AS nr FROM t),
         |ntgt AS (SELECT COUNT(*) AS nt FROM tg),
         |vocab AS (SELECT COUNT(*) AS v FROM craw),
         |d AS (
         |  SELECT t.doc_id,
         |         list_sort(list(struct_pack(token := t.token,
         |                                    cr := craw.cr,
         |                                    ct := COALESCE(ctgt.ct, 0)))) AS tl
         |  FROM t JOIN craw USING (token) LEFT JOIN ctgt USING (token)
         |  GROUP BY t.doc_id)
         |SELECT doc_id, CAST(len(tl) AS BIGINT) AS n_toks,
         |  floor((list_reduce(list_transform(tl,
         |           x -> ln(CAST(x.ct + 1 AS DOUBLE)) -
         |                ln(CAST(x.cr AS DOUBLE))),
         |         (a, b) -> a + b) / len(tl)
         |       + ln(CAST((SELECT nr FROM nraw) AS DOUBLE))
         |       - ln(CAST((SELECT nt FROM ntgt) +
         |                 (SELECT v FROM vocab) AS DOUBLE)))
         |    * 10000 + 0.5) / 10000 AS logw
         |FROM d ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val toks = spark.table("documents")
        .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
      val tgtToks = spark.table("documents").filter($"lang" === "en")
        .select(explode(split(lower($"text"), " ")).as("token"))
      val craw = toks.groupBy($"token").agg(count(lit(1)).as("cr"))
      val ctgt = tgtToks.groupBy($"token").agg(count(lit(1)).as("ct"))
      val nraw = toks.agg(count(lit(1)).as("nr"))
      val ntgt = tgtToks.agg(count(lit(1)).as("nt"))
      val vocab = craw.agg(count(lit(1)).as("v"))
      toks.join(craw, "token")
        .join(ctgt, Seq("token"), "left")
        .groupBy($"doc_id")
        .agg(sort_array(collect_list(struct($"token", $"cr",
          coalesce($"ct", lit(0L)).as("ct")))).as("tl"))
        .join(broadcast(nraw)).join(broadcast(ntgt)).join(broadcast(vocab))
        .select($"doc_id", size($"tl").cast(LongType).as("n_toks"),
          (floor((aggregate($"tl", lit(0.0), (acc, x) =>
            acc + log((x.getField("ct") + 1).cast(DoubleType)) -
              log(x.getField("cr").cast(DoubleType))) / size($"tl")
            + log($"nr".cast(DoubleType))
            - log(($"nt" + $"v").cast(DoubleType)))
            * 10000 + 0.5) / 10000).as("logw"))
        .orderBy($"doc_id")
    },

    // Collocation mining via pointwise mutual information — the statistical
    // phrase detector (word2vec's phrase pass, Mikolov et al. 2013): for
    // each frequent bigram, PMI = ln(p(ab) / (p(a)·p(b))) under corpus
    // unigram/bigram distributions. High PMI = tokens that co-occur far
    // more than independence predicts (a multiword expression). Shapes:
    // one token explode + one bigram explode, counts map-side-combinable,
    // the unigram table and the 1-row totals broadcast back. ln is
    // error-bounded (≤1 ulp per term) → r4 floor rounding is safe, and the
    // DESC ordering runs on the ROUNDED value (identical on both engines)
    // with the bigram as tiebreak.
    q("q134_bigram_pmi",
      s"""WITH tok AS (SELECT unnest($tokSql) AS w FROM documents),
         |uni AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
         |t1 AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
         |bg AS (SELECT unnest(list_transform(range(1, len(toks)),
         |         i -> toks[i] || ' ' || toks[i + 1])) AS bigram
         |       FROM (SELECT $tokSql AS toks FROM documents) t),
         |bc AS (SELECT bigram, COUNT(*) AS cab FROM bg GROUP BY bigram
         |       HAVING COUNT(*) >= 20),
         |t2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM bg),
         |p AS (
         |  SELECT b.bigram, b.cab,
         |         ln((CAST(b.cab AS DOUBLE) / t2.m) /
         |            ((CAST(ua.c AS DOUBLE) / t1.n) *
         |             (CAST(ub.c AS DOUBLE) / t1.n))) AS pmi
         |  FROM bc b
         |  JOIN uni ua ON ua.w = string_split(b.bigram, ' ')[1]
         |  JOIN uni ub ON ub.w = string_split(b.bigram, ' ')[2]
         |  CROSS JOIN t1 CROSS JOIN t2)
         |SELECT bigram, CAST(cab AS BIGINT) AS cab,
         |       floor(pmi * 10000 + 0.5) / 10000 AS pmi
         |FROM p
         |ORDER BY floor(pmi * 10000 + 0.5) / 10000 DESC, bigram""".stripMargin) { spark =>
      import spark.implicits._
      val tok = spark.table("documents")
        .select(explode(split(lower($"text"), " ")).as("w"))
      val uni = tok.groupBy($"w").agg(count(lit(1)).as("c"))
      val t1 = uni.agg(sum($"c").cast("bigint").as("n"))
      val bg = spark.table("documents")
        .select(split(lower($"text"), " ").as("toks"))
        .select(explode(transform(Canon.seq1(size($"toks") - 1),
          i => concat(element_at($"toks", i), lit(" "),
            element_at($"toks", i + 1)))).as("bigram"))
      val bc = bg.groupBy($"bigram").agg(count(lit(1)).as("cab"))
        .filter($"cab" >= 20)
      val t2 = bg.agg(count(lit(1)).cast("bigint").as("m"))
      val pmi = log(($"cab".cast("double") / $"m") /
        (($"ua_c".cast("double") / $"n") * ($"ub_c".cast("double") / $"n")))
      val rounded = floor($"pmi" * 10000 + 0.5) / 10000
      bc
        .join(broadcast(uni.select($"w".as("wa"), $"c".as("ua_c"))),
          element_at(split($"bigram", " "), 1) === $"wa")
        .join(broadcast(uni.select($"w".as("wb"), $"c".as("ub_c"))),
          element_at(split($"bigram", " "), 2) === $"wb")
        .join(broadcast(t1)).join(broadcast(t2)) // 1-row broadcasts
        .select($"bigram", $"cab", pmi.as("pmi"))
        .select($"bigram", $"cab", rounded.as("pmi"))
        .orderBy($"pmi".desc, $"bigram")
    },

    // Model-based quality gate — fastText-classifier inference as an
    // operator (the CCNet/RefinedWeb "quality classifier" step, distinct
    // from q64's hand rules): a FIXED-weight linear model over three
    // exact-rational features (stopword ratio, repeated-token share,
    // chars-per-word), scored map-side against in-code weights. Every
    // feature is a ratio of integers and the weighted sum is spelled in the
    // identical association order on both engines, so the score — unlike a
    // sigmoid/ln formulation — is bit-deterministic and the keep gate fully
    // hash-checked (classification is threshold-on-linear-score; the
    // monotone sigmoid would add nothing but cross-engine exp() risk).
    // Scale: one token-count shuffle (rep share) + map-side everything
    // else; weights would come from a trained model file at 100 TB, loaded
    // as literals/broadcast exactly like this.
    q("q126_quality_classifier",
      s"""WITH t AS (SELECT doc_id, n_chars, $tokSql AS toks FROM documents),
         |f AS (SELECT doc_id,
         |        CAST(len(list_filter(toks,
         |            w -> w IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
         |          / len(toks) AS stop_ratio,
         |        CAST(n_chars AS DOUBLE) / len(toks) AS cpw
         |      FROM t),
         |tc AS (SELECT doc_id, token, COUNT(*) AS c
         |       FROM (SELECT doc_id, unnest($tokSql) AS token
         |             FROM documents) x
         |       GROUP BY doc_id, token),
         |rr AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS rep
         |       FROM tc GROUP BY doc_id),
         |s AS (SELECT f.doc_id,
         |        ((8.0 * stop_ratio - 6.0 * rep) + 0.5 * (cpw - 5.5)) + 0.1
         |          AS score
         |      FROM f JOIN rr USING (doc_id))
         |SELECT doc_id, floor(score * 10000 + 0.5) / 10000 AS score,
         |       CAST(CASE WHEN score > 0 THEN 1 ELSE 0 END AS INT) AS keep
         |FROM s ORDER BY doc_id""".stripMargin) { spark =>
      classifierScores(spark)
        .select(col("doc_id"),
          (floor(col("score") * 10000 + 0.5) / 10000).as("score"),
          when(col("score") > 0, 1).otherwise(0).cast(IntegerType).as("keep"))
        .orderBy(col("doc_id"))
    },

    // Quality-tertile bucketing — CCNet's head/middle/tail corpus split,
    // re-based on q126's exact-rational classifier score (CCNet buckets on
    // LM perplexity; the MACHINERY — sampled per-language thresholds +
    // map-side labeling — is identical, and the exact score keeps the
    // boundary comparisons bit-deterministic where a ln-based perplexity
    // could flip a doc whose score sits within ulps of a threshold).
    // Thresholds are per-language tertiles over the md5(doc_id) pre-sample
    // (q115's idiom: the one-reducer exact quantile buffers the SAMPLE, so
    // at 100 TB you bound the sample, not the corpus), broadcast back;
    // every doc labels map-side. Output: per (lang, bucket) doc/token
    // totals + the thresholds that defined them.
    q("q127_quality_buckets",
      s"""WITH t AS (SELECT doc_id, lang, n_chars, $tokSql AS toks
         |           FROM documents),
         |f AS (SELECT doc_id, lang, len(toks) AS ntok,
         |        CAST(len(list_filter(toks,
         |            w -> w IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
         |          / len(toks) AS stop_ratio,
         |        CAST(n_chars AS DOUBLE) / len(toks) AS cpw
         |      FROM t),
         |tc AS (SELECT doc_id, token, COUNT(*) AS c
         |       FROM (SELECT doc_id, unnest($tokSql) AS token
         |             FROM documents) x
         |       GROUP BY doc_id, token),
         |rr AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS rep
         |       FROM tc GROUP BY doc_id),
         |s AS (SELECT f.doc_id, f.lang, f.ntok,
         |        ((8.0 * stop_ratio - 6.0 * rep) + 0.5 * (cpw - 5.5)) + 0.1
         |          AS score
         |      FROM f JOIN rr USING (doc_id)),
         |thr AS (SELECT lang,
         |          QUANTILE_CONT(score, 0.3333333333333333) AS t1,
         |          QUANTILE_CONT(score, 0.6666666666666666) AS t2
         |        FROM s
         |        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'
         |        GROUP BY lang),
         |lab AS (SELECT s.lang,
         |          CASE WHEN score >= t2 THEN 'head'
         |               WHEN score >= t1 THEN 'middle'
         |               ELSE 'tail' END AS bucket,
         |          ntok, t1, t2
         |        FROM s JOIN thr USING (lang))
         |SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(ntok) AS BIGINT) AS n_tokens,
         |       floor(MIN(t1) * 10000 + 0.5) / 10000 AS t1,
         |       floor(MIN(t2) * 10000 + 0.5) / 10000 AS t2
         |FROM lab
         |GROUP BY lang, bucket
         |ORDER BY lang, bucket""".stripMargin) { spark =>
      import spark.implicits._
      val s = classifierScores(spark)
      val thr = s
        .filter(substring(md5($"doc_id".cast("string").cast(BinaryType)),
          1, 1) < "4")
        .groupBy($"lang")
        .agg(call_function("percentile", $"score",
            lit(0.3333333333333333)).as("t1"),
          call_function("percentile", $"score",
            lit(0.6666666666666666)).as("t2"))
      s.join(broadcast(thr), "lang")
        .select($"lang",
          when($"score" >= $"t2", "head")
            .when($"score" >= $"t1", "middle")
            .otherwise("tail").as("bucket"),
          $"ntok", $"t1", $"t2")
        .groupBy($"lang", $"bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum($"ntok").cast(LongType).as("n_tokens"),
          (floor(min($"t1") * 10000 + 0.5) / 10000).as("t1"),
          (floor(min($"t2") * 10000 + 0.5) / 10000).as("t2"))
        .orderBy($"lang", $"bucket")
    },

    // Pipeline capstone v2 — the round-6 operators composed into the
    // C4/Gopher/Dolma-shaped flow a pretraining corpus actually runs:
    // repetition gates (q118) ∧ duplicate-span gate (q124) ∧ classifier
    // gate (q126) → surviving docs → training-shard manifest (q123).
    // Complements q101 (quality → LSH near-dup → decontamination): that
    // capstone's gates are broadcast drop-sets; these are per-doc stat
    // relations joined on doc_id (uniform key, each ≪ corpus wide). Every
    // stage reuses the exact committed spelling of its standalone query,
    // so the composite stays hash-checked end-to-end.
    q("q136_pipeline_shards",
      s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS token FROM documents),
         |uc AS (SELECT doc_id, token, COUNT(*) AS c
         |       FROM tok GROUP BY doc_id, token),
         |u AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |             CAST(MAX(c) AS BIGINT) AS top_uni,
         |             CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
         |               AS dup_toks
         |      FROM uc GROUP BY doc_id),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |                i -> toks[i] || ' ' || toks[i + 1])) AS bigram
         |       FROM (SELECT doc_id, $tokSql AS toks FROM documents) t),
         |bc AS (SELECT doc_id, bigram, COUNT(*) AS c
         |       FROM bg GROUP BY doc_id, bigram),
         |b AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bi,
         |             CAST(SUM(c) AS BIGINT) AS n_bigrams
         |      FROM bc GROUP BY doc_id),
         |rep AS (
         |  SELECT u.doc_id, u.n_tokens
         |  FROM u LEFT JOIN b USING (doc_id)
         |  WHERE CAST(u.dup_toks AS DOUBLE) / u.n_tokens <= 0.85
         |    AND CAST(u.top_uni AS DOUBLE) / u.n_tokens <= 0.11
         |    AND COALESCE(CAST(b.top_bi AS DOUBLE) / b.n_bigrams, 0.0)
         |        <= 0.05),
         |dt AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
         |       FROM documents),
         |occ AS (
         |  SELECT doc_id, generate_subscripts(gs, 1) AS pos, unnest(gs) AS h
         |  FROM (SELECT doc_id,
         |          list_transform(range(1, len(toks) - 6),
         |            i -> md5(array_to_string(toks[i:i+7], ' '))) AS gs
         |        FROM dt) g),
         |dc AS (SELECT h, COUNT(*) AS cnt FROM occ GROUP BY h),
         |ddup AS (SELECT o.doc_id, o.pos
         |         FROM occ o JOIN dc ON dc.h = o.h AND dc.cnt >= 2),
         |dcov AS (SELECT DISTINCT doc_id, p
         |         FROM ddup, UNNEST(range(pos, pos + 8)) AS un(p)),
         |dagg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS covered
         |         FROM dcov GROUP BY doc_id),
         |span AS (
         |  SELECT dt.doc_id FROM dt LEFT JOIN dagg USING (doc_id)
         |  WHERE COALESCE(CAST(dagg.covered AS DOUBLE) / len(dt.toks), 0.0)
         |        <= 0.5),
         |cf AS (SELECT doc_id,
         |        CAST(len(list_filter(toks,
         |            w -> w IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
         |          / len(toks) AS stop_ratio,
         |        CAST(n_chars AS DOUBLE) / len(toks) AS cpw
         |      FROM (SELECT doc_id, n_chars, $tokSql AS toks
         |            FROM documents) x),
         |crr AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS rep
         |        FROM uc GROUP BY doc_id),
         |cls AS (
         |  SELECT cf.doc_id FROM cf JOIN crr USING (doc_id)
         |  WHERE ((8.0 * stop_ratio - 6.0 * rep) + 0.5 * (cpw - 5.5)) + 0.1
         |        > 0),
         |surv AS (
         |  SELECT r.doc_id, r.n_tokens FROM rep r
         |  JOIN span USING (doc_id)
         |  JOIN cls USING (doc_id))
         |SELECT CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |            AS UBIGINT) % 16 AS BIGINT) AS shard,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |FROM surv
         |GROUP BY shard
         |ORDER BY shard""".stripMargin) { spark =>
      import spark.implicits._
      val dupR = $"dup_toks".cast("double") / $"n_tokens"
      val uniR = $"top_uni".cast("double") / $"n_tokens"
      val biR = coalesce($"top_bi".cast("double") / $"n_bigrams", lit(0.0))
      val rep = repetitionJoined(spark)
        .filter(dupR <= 0.85 && uniR <= 0.11 && biR <= 0.05)
        .select($"doc_id", $"n_tokens")
      val span = DedupQueries.dupspanCoreShared(spark) // memoized gate
        .select($"doc_id", $"keep")
        .filter($"keep" === 1).select($"doc_id")
      val cls = classifierScores(spark)
        .filter($"score" > 0).select($"doc_id")
      rep
        .join(span, Seq("doc_id"), "left_semi")
        .join(cls, Seq("doc_id"), "left_semi")
        .select($"n_tokens",
          (conv(substring(md5($"doc_id".cast("string").cast(BinaryType)),
            1, 8), 16, 10).cast(LongType) % 16).as("shard"))
        .groupBy($"shard")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum($"n_tokens").cast(LongType).as("total_tokens"))
        .orderBy($"shard")
    },

    // Char-trigram language ID — the Cavnar-Trenkle rank-profile method
    // ("N-Gram-Based Text Categorization", SDAIR'94), the real classifier
    // behind q63's marker heuristic: per-language top-K trigram profiles
    // learned from the labeled corpus, docs classified by weighted profile
    // overlap (weight = K+1 − profile rank; integer throughout → fully
    // hash-checked, no float fold). On this synthetic fixture the labels
    // are random so predictions hover at the majority class — the OPERATOR
    // SHAPE is the deliverable: profile counts shuffle to a key space
    // bounded by |Σ|³ per language (map-side combinable to a fixed-size
    // relation regardless of corpus size), the learned profile broadcasts
    // (nlangs × K rows), scoring is one doc_id-keyed aggregate, and both
    // rank windows partition over bounded sets (per-lang vocab; ≤ nlangs
    // candidate rows per doc) — nothing grows super-linearly at 100 TB.
    q("q150_langid_trigram",
      s"""$langidOracleSql
         |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      langidPredictions(spark).orderBy($"doc_id")
    },

    // WITHIN-doc language consistency (code-switch detection — the
    // cleaning step after whole-doc language ID: a doc whose SPANS vote
    // for different languages is mixed-language content that a doc-level
    // label silently mislabels; pipelines split or drop it): the doc's
    // characters split into three equal spans, each span scored against
    // the SAME whole-doc trigram profiles q150 trains, per-doc readout =
    // majority span vote + distinct-vote count + mixed flag. Distinct
    // from q150/q206 (whole-doc prediction / label confusion): the unit
    // of classification here is the span, the readout the DISAGREEMENT.
    // Scale: 3× q150's trigram volume, same broadcast-profile join, all
    // rollups |doc|- or |langs|-bounded; all-integer output → fully
    // hash-checked.
    q("q241_mixed_language",
      """WITH docs AS (
        |  SELECT doc_id, lang, lower(text) AS txt FROM documents),
        |tg AS (
        |  SELECT doc_id, lang, substr(txt, i, 3) AS tg
        |  FROM (SELECT doc_id, lang, txt,
        |          unnest(range(1, greatest(length(txt) - 1, 1))) AS i
        |        FROM docs) t),
        |prof AS (
        |  SELECT plang, tg, 41 - rk AS w FROM (
        |    SELECT lang AS plang, tg,
        |           row_number() OVER (PARTITION BY lang
        |                              ORDER BY COUNT(*) DESC, tg ASC) AS rk
        |    FROM tg GROUP BY lang, tg) p
        |  WHERE rk <= 40),
        |spans AS (
        |  SELECT doc_id, lang, g.s,
        |         substr(txt, g.s * (length(txt) // 3) + 1,
        |                CASE WHEN g.s = 2 THEN length(txt)
        |                     ELSE length(txt) // 3 END) AS seg
        |  FROM docs, (SELECT unnest(range(0, 3)) AS s) g),
        |stg AS (
        |  SELECT DISTINCT doc_id, s, substr(seg, i, 3) AS tg
        |  FROM (SELECT *, unnest(range(1, greatest(length(seg) - 1, 1)))
        |          AS i
        |        FROM spans) t),
        |sc AS (
        |  SELECT stg.doc_id, stg.s, p.plang, SUM(p.w) AS score
        |  FROM stg JOIN prof p USING (tg)
        |  GROUP BY 1, 2, 3),
        |best AS (
        |  SELECT doc_id, s, plang FROM (
        |    SELECT doc_id, s, plang,
        |           row_number() OVER (PARTITION BY doc_id, s
        |                              ORDER BY score DESC, plang ASC) AS rn
        |    FROM sc) b
        |  WHERE rn = 1),
        |votes AS (
        |  SELECT sp.doc_id, sp.lang, coalesce(b.plang, 'unknown') AS pred
        |  FROM spans sp LEFT JOIN best b
        |    ON b.doc_id = sp.doc_id AND b.s = sp.s),
        |vc AS (SELECT doc_id, lang, pred, COUNT(*) AS nv
        |       FROM votes GROUP BY 1, 2, 3),
        |major AS (
        |  SELECT doc_id, lang, pred AS major_pred FROM (
        |    SELECT doc_id, lang, pred,
        |           row_number() OVER (PARTITION BY doc_id
        |                              ORDER BY nv DESC, pred ASC) AS rn
        |    FROM vc) m
        |  WHERE rn = 1),
        |nl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_span_langs
        |       FROM vc GROUP BY doc_id)
        |SELECT m.doc_id, m.lang, m.major_pred, nl.n_span_langs,
        |  CAST(CASE WHEN nl.n_span_langs > 1 THEN 1 ELSE 0 END AS INT)
        |    AS is_mixed
        |FROM major m JOIN nl USING (doc_id)
        |ORDER BY m.doc_id""".stripMargin) { spark =>
      import spark.implicits._
      // the (doc, lang, pred, nv) vote relation feeds the majority rank
      // AND the distinct-vote count — memoized like every 2-consumer
      // deterministic relation (memo == fresh pinned in DedupSpec)
      val vc = Memo.cached(spark, "mixedlang-votes")(
        mixedLanguageVotesFresh(spark))
      val wMaj = Window.partitionBy($"doc_id").orderBy($"nv".desc, $"pred")
      val major = vc.withColumn("rn", row_number().over(wMaj))
        .filter($"rn" === 1).select($"doc_id", $"lang",
          $"pred".as("major_pred"))
      val nl = vc.groupBy($"doc_id")
        .agg(count(lit(1)).cast(LongType).as("n_span_langs"))
      major.join(nl, "doc_id")
        .select($"doc_id", $"lang", $"major_pred", $"n_span_langs",
          when($"n_span_langs" > 1, 1).otherwise(0).cast("int")
            .as("is_mixed"))
        .orderBy($"doc_id")
    },

    // Classifier CALIBRATION curve (reliability diagram) for the q150
    // language-ID scores — the trust audit behind every score-thresholded
    // gate: bucket predictions by confidence (score div 100) and compare
    // each bucket's EMPIRICAL accuracy against its mean score; a
    // well-ordered curve (accuracy rising with score) is what licenses
    // using the score as a filter knob. Integer counts and integer score
    // sums; the two surfaced ratios are floor-r4 over exact integers —
    // fully hash-checked. Scale: q150's shapes plus one |bins|-bounded
    // rollup.
    q("q220_langid_calibration",
      s"""WITH pred AS ($langidOracleSql)
         |SELECT score // 100 AS score_bin,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  floor(CAST(SUM(score) AS DOUBLE) / COUNT(*) * 10000 + 0.5)
         |    / 10000 AS mean_score,
         |  floor(CAST(SUM(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END)
         |             AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000
         |    AS accuracy
         |FROM pred
         |GROUP BY score_bin
         |ORDER BY score_bin""".stripMargin) { spark =>
      import spark.implicits._
      langidPredictions(spark)
        .groupBy(expr("score div 100").as("score_bin"))
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          (floor(sum($"score").cast(DoubleType) / count(lit(1))
            * 10000 + 0.5) / 10000).as("mean_score"),
          (floor(sum(when($"lang_pred" === $"lang", 1).otherwise(0))
            .cast(DoubleType) / count(lit(1)) * 10000 + 0.5) / 10000)
            .as("accuracy"))
        .orderBy($"score_bin")
    },

    // Language-ID confusion matrix (the label-quality audit: where does
    // the q150 classifier disagree with the labeled lang, and is the
    // label or the classifier wrong?). Exactly q150's prediction relation
    // rolled up per (label, prediction) with per-label accuracy — integer
    // counts plus one r4 ratio, fully hash-checked. Scale: q150's shapes
    // plus one |langs|²-bounded rollup.
    q("q206_lang_confusion",
      s"""WITH pred AS ($langidOracleSql),
         |m AS (SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
         |      FROM pred GROUP BY lang, lang_pred),
         |t AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS lang_total
         |      FROM m GROUP BY lang)
         |SELECT m.lang AS lang, m.lang_pred, m.n_docs,
         |  floor(CAST(m.n_docs AS DOUBLE) / t.lang_total * 10000 + 0.5)
         |    / 10000 AS row_share
         |FROM m JOIN t ON t.lang = m.lang
         |ORDER BY lang, lang_pred""".stripMargin) { spark =>
      import spark.implicits._
      val m = langidPredictions(spark)
        .groupBy($"lang", $"lang_pred")
        .agg(count(lit(1)).cast(LongType).as("n_docs"))
        .localCheckpoint() // feeds the totals AND the share rows
      val t = m.groupBy($"lang")
        .agg(sum($"n_docs").cast(LongType).as("lang_total"))
      m.join(broadcast(t), Seq("lang"))
        .select($"lang", $"lang_pred", $"n_docs",
          Canon.r4($"n_docs".cast(DoubleType) / $"lang_total")
            .as("row_share"))
        .orderBy($"lang", $"lang_pred")
    },

    // Negative sampling (word2vec's unigram^0.75 noise distribution,
    // Mikolov NeurIPS'13 — the contrastive-pair generator every embedding
    // trainer needs): token weights w = c^0.75 (spelled exp(0.75·ln c) on
    // both engines, the q186 temperature idiom) become cumulative [lo, hi)
    // intervals; each (center, j) draw maps a deterministic md5-uniform
    // (the q120 idiom) into the interval containing u·W — a range lookup
    // against the broadcast vocab table. The report compares observed vs
    // expected shares on the top-20 sampled tokens, so the oracle checks
    // the SAMPLER, not just the weights. The cumulative weights build with
    // the q155 two-phase chunked prefix sum (chunk = 2-char token prefix,
    // monotone in token order, so per-chunk cumsum + chunk-offset fold IS
    // the global left fold re-associated identically on both engines) —
    // never a vocab-global single-task window; the interval lookup assigns
    // each draw its chunk against the tiny offsets table, then equi-joins
    // the chunk key against the interval relation — never a vocab-sized
    // broadcast. IEEE sums share one association, r6 margins on the shares.
    q("q214_negative_sampling",
      s"""WITH c AS (
         |  SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM
         |    (SELECT unnest($tokSql) AS token FROM documents) t
         |  GROUP BY token),
         |w AS (SELECT token, n, exp(0.75 * ln(CAST(n AS DOUBLE))) AS wt
         |      FROM c),
         |lc AS (
         |  SELECT token, wt, substr(token, 1, 2) AS chunk,
         |    SUM(wt) OVER (PARTITION BY substr(token, 1, 2) ORDER BY token
         |                  ROWS UNBOUNDED PRECEDING) AS lcum
         |  FROM w),
         |ctt AS (SELECT chunk, arg_max(lcum, token) AS ctot
         |        FROM lc GROUP BY chunk),
         |offs AS (
         |  SELECT chunk,
         |    COALESCE(SUM(ctot) OVER (ORDER BY chunk
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
         |      AS off,
         |    COALESCE(SUM(ctot) OVER (ORDER BY chunk
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
         |      + ctot AS hi_off
         |  FROM ctt),
         |cum AS (
         |  SELECT lc.token, lc.chunk,
         |         offs.off + lc.lcum - lc.wt AS lo,
         |         offs.off + lc.lcum AS hi
         |  FROM lc JOIN offs USING (chunk)),
         |tot AS (SELECT MAX(hi_off) AS tw FROM offs),
         |centers AS (
         |  SELECT doc_id, generate_subscripts($tokSql, 1) - 1 AS pos
         |  FROM documents WHERE doc_id < 50),
         |draws AS (
         |  SELECT doc_id, pos, j,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
         |      CAST(pos AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8))
         |      AS UBIGINT) / 4294967296.0 AS u
         |  FROM centers CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js),
         |dv AS (SELECT d.u * t.tw AS v FROM draws d CROSS JOIN tot t),
         |asg AS (
         |  SELECT dv.v, o.chunk FROM dv
         |  JOIN offs o ON dv.v >= o.off AND dv.v < o.hi_off),
         |hit AS (
         |  SELECT cum.token FROM asg JOIN cum
         |    ON cum.chunk = asg.chunk
         |   AND asg.v >= cum.lo AND asg.v < cum.hi),
         |agg AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_draws
         |        FROM hit GROUP BY token),
         |tot2 AS (SELECT CAST(SUM(n_draws) AS BIGINT) AS nd FROM agg),
         |top AS (SELECT token, n_draws FROM agg
         |        ORDER BY n_draws DESC, token LIMIT 20)
         |SELECT t.token AS token, t.n_draws AS n_draws,
         |  floor(w.wt / tot.tw * 1000000 + 0.5) / 1000000
         |    AS expected_share,
         |  floor(CAST(t.n_draws AS DOUBLE) / tot2.nd * 1000000 + 0.5)
         |    / 1000000 AS observed_share
         |FROM top t
         |JOIN w ON w.token = t.token
         |CROSS JOIN tot CROSS JOIN tot2
         |ORDER BY t.n_draws DESC, t.token""".stripMargin) { spark =>
      import spark.implicits._
      val c = spark.table("documents")
        .select(explode(split(lower($"text"), " ")).as("token"))
        .groupBy($"token").agg(count(lit(1)).cast(LongType).as("n"))
      val w = c.withColumn("wt", exp(lit(0.75) * log($"n".cast(DoubleType))))
        .localCheckpoint() // feeds the cum table AND the share join
      val (offsets, cum) = negSampleIntervals(w)
      val tot = offsets.agg(max($"hi_off").as("tw"))
      val centers = spark.table("documents").filter($"doc_id" < 50)
        .select($"doc_id", posexplode(split(lower($"text"), " "))
          .as(Seq("pos", "ctok")))
        .select($"doc_id", $"pos")
      val draws = centers
        .crossJoin(broadcast(Seq(0, 1, 2, 3).toDF("j")))
        .select($"doc_id", $"pos", $"j",
          (conv(substring(md5(concat($"doc_id".cast(StringType), lit(":"),
            $"pos".cast(StringType), lit(":"), $"j".cast(StringType))
            .cast(BinaryType)), 1, 8), 16, 10).cast(DoubleType) /
            4294967296.0).as("u"))
      // chunk assignment against the tiny offsets table, then a chunk-keyed
      // equi-join with the interval relation (co-partitioned on chunk) —
      // the vocab-sized relation is never broadcast
      val hit = draws.crossJoin(broadcast(tot))
        .withColumn("v", $"u" * $"tw")
        .join(broadcast(offsets), $"v" >= $"off" && $"v" < $"hi_off")
        .select($"chunk", $"v")
        .join(cum, Seq("chunk"))
        .filter($"v" >= $"lo" && $"v" < $"hi")
        .select($"token")
      val agg0 = hit.groupBy($"token")
        .agg(count(lit(1)).cast(LongType).as("n_draws"))
        .localCheckpoint() // feeds the total AND the top-20
      val tot2 = agg0.agg(sum($"n_draws").cast(LongType).as("nd"))
      agg0.orderBy($"n_draws".desc, $"token").limit(20)
        .join(w.select($"token", $"wt"), Seq("token"))
        .crossJoin(broadcast(tot))
        .crossJoin(broadcast(tot2))
        .select($"token", $"n_draws",
          Canon.r6($"wt" / $"tw").as("expected_share"),
          Canon.r6($"n_draws".cast(DoubleType) / $"nd").as("observed_share"))
        .orderBy($"n_draws".desc, $"token")
    },

    // k-anonymity audit (the governance gate before releasing a corpus
    // with metadata: a document whose quasi-identifier combination —
    // (lang, source, length bucket) here — is shared by fewer than k
    // others is re-identifiable). Group sizes are one map-side-combinable
    // rollup on the QI key; each doc joins its group size back (the QI
    // relation is ≪ corpus) and sources report their at-risk share plus
    // the smallest group they expose. All-integer + one r4 ratio.
    q("q212_k_anonymity",
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |         CAST(n_chars // 100 AS BIGINT) AS lb
        |  FROM documents),
        |g AS (SELECT lang, source, lb, CAST(COUNT(*) AS BIGINT) AS gsz
        |      FROM d GROUP BY lang, source, lb),
        |j AS (SELECT d.source, g.gsz FROM d
        |      JOIN g ON g.lang = d.lang AND g.source = d.source
        |            AND g.lb = d.lb)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN gsz < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_risky,
        |  floor(CAST(SUM(CASE WHEN gsz < 5 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*) * 10000 + 0.5) / 10000 AS risk_share,
        |  CAST(MIN(gsz) AS BIGINT) AS min_group
        |FROM j GROUP BY source
        |ORDER BY source""".stripMargin) { spark =>
      import spark.implicits._
      // field-wise QI grouping — never a separator-joined key (the q183
      // concat hazard, ADVICE r06)
      val d = spark.table("documents")
        .select($"doc_id", $"lang", $"source",
          expr("n_chars div 100").cast(LongType).as("lb"))
      val g = d.groupBy($"lang", $"source", $"lb")
        .agg(count(lit(1)).cast(LongType).as("gsz"))
      d.join(g, Seq("lang", "source", "lb"))
        .groupBy($"source")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum(when($"gsz" < 5, 1).otherwise(0)).cast(LongType).as("n_risky"),
          min($"gsz").cast(LongType).as("min_group"))
        .select($"source", $"n_docs", $"n_risky",
          Canon.r4($"n_risky".cast(DoubleType) / $"n_docs").as("risk_share"),
          $"min_group")
        .orderBy($"source")
    },

    // Differentially-private statistics release (Dwork et al., TCC'06 —
    // the mechanism, distinct from q212's k-anonymity SUPPRESSION: q212
    // filters risky rows, this RELEASES noisy aggregates with an explicit
    // privacy budget): per-lang doc counts (sensitivity 1) and CLIPPED
    // per-lang token sums (each doc's contribution capped at 500 tokens —
    // the standard clip that bounds an otherwise-unbounded sensitivity),
    // each perturbed with Laplace(Δ/ε) noise via the inverse CDF and
    // post-process-clamped at 0. Disjoint lang cells compose in parallel,
    // so the whole release costs ONE ε per statistic. The Laplace draw is
    // a DETERMINISTIC md5-seeded uniform — replayable noise for the gate
    // and for release-approval reruns; a production release swaps in a
    // real RNG at this one seam (same honesty contract as the stubbed
    // media decode). Scale: one map-side-combinable rollup + |langs| rows
    // of noise arithmetic.
    q("q239_dp_release",
      s"""WITH agg AS (
         |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(least(len($tokSql), 500)) AS BIGINT) AS toks_clipped
         |  FROM documents GROUP BY lang),
         |u AS (
         |  SELECT lang, n_docs, toks_clipped,
         |    (CAST(('0x' || substr(md5('dp:docs:' || lang), 1, 8))
         |        AS UBIGINT) + 0.5) / 4294967296.0 AS ud,
         |    (CAST(('0x' || substr(md5('dp:toks:' || lang), 1, 8))
         |        AS UBIGINT) + 0.5) / 4294967296.0 AS ut
         |  FROM agg)
         |SELECT lang, CAST(0.5 AS DOUBLE) AS epsilon,
         |  floor(greatest(0.0, n_docs
         |      - (1.0 / 0.5) * sign(ud - 0.5) * ln(1 - 2 * abs(ud - 0.5)))
         |    * 10000 + 0.5) / 10000 AS dp_docs,
         |  floor(greatest(0.0, toks_clipped
         |      - (500.0 / 0.5) * sign(ut - 0.5) * ln(1 - 2 * abs(ut - 0.5)))
         |    * 10000 + 0.5) / 10000 AS dp_tokens
         |FROM u ORDER BY lang""".stripMargin) { spark =>
      import spark.implicits._
      def unif(tag: String): Column =
        (conv(substring(md5(concat(lit(tag), $"lang").cast(BinaryType)),
          1, 8), 16, 10).cast(DoubleType) + 0.5) / 4294967296.0
      def lap(u: Column, b: Double): Column =
        lit(-b) * signum(u - 0.5) * log(lit(1) - lit(2) * abs(u - 0.5))
      spark.table("documents")
        .groupBy($"lang")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum(least(size(split(lower($"text"), " ")), lit(500)))
            .cast(LongType).as("toks_clipped"))
        .select($"lang", lit(0.5).as("epsilon"),
          (floor(greatest(lit(0.0),
            $"n_docs" + lap(unif("dp:docs:"), 1.0 / 0.5))
            * 10000 + 0.5) / 10000).as("dp_docs"),
          (floor(greatest(lit(0.0),
            $"toks_clipped" + lap(unif("dp:toks:"), 500.0 / 0.5))
            * 10000 + 0.5) / 10000).as("dp_tokens"))
        .orderBy($"lang")
    },

    // Stratified k-fold assignment (cross-validation splits that preserve
    // per-source proportions — q59e's hash split is IID, this one is
    // BALANCED: within every source the folds differ by at most one doc).
    // fold = (per-source md5-order rank) mod 5: the rank window partitions
    // by source (never global), the md5 order is the deterministic shuffle,
    // and the mod-k assignment is exactly balanced by construction. Output
    // is the |sources|×k fold manifest with an order-insensitive XOR
    // membership digest per cell (the q175/q203 pattern) — all-integer,
    // fully hash-checked.
    q("q208_stratified_kfold",
      """WITH r AS (
        |  SELECT source, doc_id,
        |         ROW_NUMBER() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rk
        |  FROM documents),
        |f AS (SELECT source, doc_id, rk % 5 AS fold FROM r)
        |SELECT source, fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(bit_xor(CAST(CAST(('0x' ||
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
        |    AS BIGINT)) AS BIGINT) AS member_digest
        |FROM f GROUP BY source, fold
        |ORDER BY source, fold""".stripMargin) { spark =>
      import spark.implicits._
      val w = Window.partitionBy($"source")
        .orderBy(md5($"doc_id".cast(StringType).cast(BinaryType)), $"doc_id")
      val digest = conv(substring(md5($"doc_id".cast(StringType)
        .cast(BinaryType)), 1, 15), 16, 10).cast(LongType)
      spark.table("documents")
        .select($"source", $"doc_id")
        .withColumn("fold", (row_number().over(w) - 1) % 5)
        .groupBy($"source", $"fold")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          bit_xor(digest).cast(LongType).as("member_digest"))
        .orderBy($"source", $"fold")
    },

    // Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05) over the token
    // stream — the point-query complement to q108's Misra-Gries top-k: d=4
    // rows × w=64 buckets, bucket_j(token) = md5(token∥'#'∥j) mod w (the
    // repo's cross-engine hash idiom), estimate = min over rows. Verified
    // against EXACT counts on the 10 most frequent tokens: over ≥ 0 always
    // (the one-sided CMS guarantee, assertable in SQL). All-integer → fully
    // hash-checked. Scale: the sketch build is a 256-key map-side-combinable
    // aggregate — CONSTANT state regardless of corpus size (the reason CMS
    // exists); probe lookup is a broadcast join of 40 cells. The d×w
    // literals would widen with the true token cardinality at 100 TB
    // (w ≈ e/ε), changing only two constants, not the plan.
    q("q151_count_min_sketch",
      s"""WITH tok AS (SELECT unnest($tokSql) AS token FROM documents),
         |jr AS (SELECT unnest([0, 1, 2, 3]) AS j),
         |cells AS (
         |  SELECT j,
         |    CAST(CAST(('0x' || substr(md5(token || '#' || CAST(j AS VARCHAR)),
         |                       1, 8)) AS UBIGINT) % 64 AS BIGINT) AS b,
         |    COUNT(*) AS c
         |  FROM tok CROSS JOIN jr GROUP BY 1, 2),
         |ex AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
         |probes AS (
         |  SELECT token, n FROM (
         |    SELECT token, n,
         |           row_number() OVER (ORDER BY n DESC, token ASC) AS rk
         |    FROM ex) r
         |  WHERE rk <= 10),
         |est AS (
         |  SELECT p.token, p.n, MIN(c.c) AS est
         |  FROM probes p
         |  JOIN jr ON true
         |  JOIN cells c ON c.j = jr.j AND c.b =
         |    CAST(CAST(('0x' || substr(md5(p.token || '#' || CAST(jr.j AS VARCHAR)),
         |                       1, 8)) AS UBIGINT) % 64 AS BIGINT)
         |  GROUP BY p.token, p.n)
         |SELECT token, CAST(n AS BIGINT) AS exact_n, CAST(est AS BIGINT) AS cms_est,
         |       CAST(est - n AS BIGINT) AS overcount
         |FROM est
         |ORDER BY token""".stripMargin) { spark =>
      import spark.implicits._
      val cmsW = 64
      def bucket(token: Column, j: Column): Column =
        conv(substring(md5(concat(token, lit("#"), j.cast("string"))
          .cast(BinaryType)), 1, 8), 16, 10).cast(LongType) % cmsW
      // r19: the sketch used to hash every token OCCURRENCE ×4 rows (16M
      // md5+conv at sf0.1, inside the unspread scan task). A CMS cell
      // count is Σ over tokens in the bucket of that token's exact count,
      // so build the cells from the per-token count relation instead —
      // md5 per DISTINCT token ×4 (the corpus vocabulary), not per
      // occurrence; the corpus-sized pass is ONE spread groupBy(token).
      // sum(n) over the bucket == the occurrence count(*) exactly (long
      // integers), so the oracle's per-occurrence spelling is unchanged.
      val tok = Tables.spread(spark.table("documents"))
        .select(explode(split(lower($"text"), " ")).as("token"))
      val ex = tok.groupBy($"token").agg(count(lit(1)).as("n"))
        .localCheckpoint() // vocabulary-sized; feeds cells AND the probes
      val cells = ex.select($"token", $"n",
          explode(array(lit(0), lit(1), lit(2), lit(3))).as("j"))
        .groupBy($"j", bucket($"token", $"j").as("b"))
        .agg(sum($"n").as("c"))
      // Probe selection must never rank the whole vocabulary through an
      // unpartitioned window (single task over 10⁸⁺ distinct tokens at
      // 100 TB): orderBy+limit is TakeOrdered — per-partition top-10, merge
      // of 10·P rows — the q116 spelling. Same top-10 set as the oracle's
      // rank ≤ 10 (the (n DESC, token) order is total).
      val probes = ex.orderBy($"n".desc, $"token").limit(10)
        .select($"token", $"n")
      val probeCells = probes
        .select($"token", $"n",
          explode(array(lit(0), lit(1), lit(2), lit(3))).as("j"))
        .withColumn("b", bucket($"token", $"j"))
      probeCells
        .join(broadcast(cells), Seq("j", "b"))
        .groupBy($"token", $"n")
        .agg(min($"c").as("est"))
        .select($"token", $"n".cast(LongType).as("exact_n"),
          $"est".cast(LongType).as("cms_est"),
          ($"est" - $"n").cast(LongType).as("overcount"))
        .orderBy($"token")
    },

    // Weighted sampling WITHOUT replacement — Efraimidis-Spirakis
    // exponential races (IPL 2006), the one-pass distributed shape for
    // "sample k docs proportional to weight" (here weight = n_chars, the
    // data-selection knob a curriculum/mixing pipeline turns): each doc
    // draws key = ln(u)/w from a deterministic md5 uint32 fraction
    // (u ∈ (0,1] via (h+1)/2³², so ln never sees 0 — Spark yields NULL and
    // DuckDB -inf there, the one spelling that diverges); the k largest
    // keys ARE a weighted sample without replacement. Scale: orderBy+limit
    // is TakeOrdered (per-partition top-k, merge of k·P rows) — never a
    // global sort; the rank window runs on the 20 survivors. Only integer
    // columns are surfaced, so a last-ULP libm ln() divergence can't flip
    // the hash unless it reorders two keys — adjacent fixture keys differ
    // by ≫ ULP (the q122/q134 ln-agreement precedent).
    q("q154_weighted_sample",
      """WITH s AS (
        |  SELECT doc_id, n_chars,
        |    ln((CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) + 1)
        |       / 4294967296.0)
        |      / greatest(n_chars, 1) AS key
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, n_chars,
        |         row_number() OVER (ORDER BY key DESC, doc_id ASC) AS rank
        |  FROM s)
        |SELECT CAST(rank AS BIGINT) AS rank, doc_id, n_chars
        |FROM t WHERE rank <= 20
        |ORDER BY rank""".stripMargin) { spark =>
      import spark.implicits._
      val key = (log((conv(substring(md5($"text".cast(BinaryType)), 1, 8),
        16, 10).cast(LongType) + 1) / lit(4294967296.0)) /
        greatest($"n_chars", lit(1))).as("key")
      val top = spark.table("documents")
        .select($"doc_id", $"n_chars", key)
        .orderBy($"key".desc, $"doc_id")
        .limit(20)
      top
        .withColumn("rank",
          row_number().over(Window.orderBy($"key".desc, $"doc_id")))
        .select($"rank".cast(LongType).as("rank"), $"doc_id", $"n_chars")
        .orderBy($"rank")
    },

    // Substring search through a character-trigram inverted index (the
    // pg_trgm / code-search pattern): a LIKE '%needle%' scan reads every
    // byte of the corpus; the index path explodes each document ONCE into
    // its distinct character 3-grams, then answers any needle by
    // intersecting the needle's own trigram posting lists — a document can
    // contain the needle only if it contains ALL the needle's trigrams
    // (lossless filter for needles ≥ 3 chars), so candidates = docs whose
    // matched-trigram count equals the needle's distinct-trigram count,
    // and an exact contains() verify on just the candidates removes false
    // positives. The oracle deliberately spells the NAIVE full scan — the
    // equality of the two is the correctness proof of the index. Scale:
    // needle trigrams and counts broadcast; the candidate aggregate is
    // bounded by docs × needles, so one boilerplate trigram ('the')
    // inflates a posting list but never a join bucket (the groupBy key is
    // the document, not the trigram).
    q("q157_trigram_search",
      """SELECT needle, doc_id
        |FROM documents d
        |JOIN (VALUES ('spark'), ('window'), ('batch batch'))
        |  AS n(needle)
        |  ON contains(lower(d.text), n.needle)
        |ORDER BY needle, doc_id""".stripMargin) { spark =>
      import spark.implicits._
      trigramCandidates(spark.table("documents"),
          Seq("spark", "window", "batch batch"))
        .join(spark.table("documents"), "doc_id")
        .filter(contains(lower($"text"), $"needle"))
        .select($"needle", $"doc_id")
        .orderBy($"needle", $"doc_id")
    },

    // Chi-square independence test over the (lang × source) contingency
    // table — the corpus-health check behind "is language balanced across
    // sources?" (a skewed crawl shows up as a large χ² long before eyeball
    // inspection). Observed counts and row/column totals are exact
    // integers; each cell's expected value e = r·c/N and its
    // (o−e)²/e term use ONE spelling on both engines, and the cell terms
    // are summed by a sorted fold over the |langs|·|sources|-bounded cell
    // array (the q64c determinism pattern — the contingency table is
    // metadata-sized at any corpus scale). Cells with zero observed count
    // are omitted identically on both engines. One shuffle builds the
    // table; totals broadcast back.
    q("q160_chisq_independence",
      s"""WITH o AS (
         |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
         |  FROM documents GROUP BY lang, source),
         |r AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM o GROUP BY lang),
         |c AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c
         |      FROM o GROUP BY source),
         |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM o),
         |cells AS (
         |  SELECT o.lang, o.source,
         |    (CAST(o.o AS DOUBLE) - CAST(r.r * c.c AS DOUBLE) / nn.n)
         |    * (CAST(o.o AS DOUBLE) - CAST(r.r * c.c AS DOUBLE) / nn.n)
         |    / (CAST(r.r * c.c AS DOUBLE) / nn.n) AS t
         |  FROM o JOIN r USING (lang) JOIN c USING (source) CROSS JOIN nn),
         |agg AS (
         |  SELECT list_reduce(list_transform(list_sort(list(struct_pack(
         |           l := lang, s := source, t := t))), x -> x.t),
         |         (a, b) -> a + b) AS chi2,
         |         CAST(COUNT(*) AS BIGINT) AS n_cells
         |  FROM cells),
         |d AS (SELECT CAST((COUNT(DISTINCT lang) - 1)
         |             * (COUNT(DISTINCT source) - 1) AS BIGINT) AS dof
         |      FROM documents)
         |SELECT ${Canon.Oracle.r4("agg.chi2")} AS chi2, agg.n_cells, d.dof
         |FROM agg CROSS JOIN d""".stripMargin) { spark =>
      import spark.implicits._
      // the contingency table feeds four consumers (row/col/grand totals
      // and the cell join) and is metadata-sized — materialize it once
      val o = spark.table("documents")
        .groupBy($"lang", $"source").agg(count(lit(1)).cast(LongType).as("o"))
        .localCheckpoint()
      val r = o.groupBy($"lang").agg(sum($"o").cast(LongType).as("r"))
      val c = o.groupBy($"source").agg(sum($"o").cast(LongType).as("c"))
      val nn = o.agg(sum($"o").cast(LongType).as("n"))
      val e = ($"r" * $"c").cast(DoubleType) / $"n"
      val term = ($"o".cast(DoubleType) - e) * ($"o".cast(DoubleType) - e) / e
      val agg = o.join(broadcast(r), "lang").join(broadcast(c), "source")
        .crossJoin(broadcast(nn))
        .select($"lang", $"source", term.as("t"))
        .agg(aggregate(sort_array(collect_list(struct($"lang".as("l"),
            $"source".as("s"), $"t"))), lit(0.0),
            (a, x) => a + x.getField("t")).as("chi2"),
          count(lit(1)).cast(LongType).as("n_cells"))
      // dof from the (already-materialized) table's distinct keys — every
      // document lands in exactly one cell, so o's key sets equal the
      // corpus's distinct lang/source sets; no fifth documents scan
      val d = o
        .agg(((countDistinct($"lang") - 1) * (countDistinct($"source") - 1))
          .cast(LongType).as("dof"))
      agg.crossJoin(broadcast(d))
        .select(Canon.r4($"chi2").as("chi2"), $"n_cells", $"dof")
    },

    // Per-document TF-IDF keyword extraction — the metadata-enrichment op
    // a curation pipeline runs to tag every document with its most
    // discriminative terms (search facets, topic routing, dedup
    // explanations). tf·ln(N/df) weights rank per-doc tokens; the top 3
    // (ties broken by token, the q140 determinism pattern: both engines
    // evaluate ln on identical integer-ratio inputs, used here only for
    // ORDERING, never summed) surface as a comma-joined string per the
    // no-array-outputs invariant. Scale: tf is one map-side-combinable
    // (doc_id, token) rollup, df one token rollup; the tf⋈df weight join
    // shuffles on token; the per-doc top-3 window partitions on doc_id —
    // parallelism scales with the corpus on every stage.
    q("q165_doc_keywords",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |wgt AS (
        |  SELECT tf.doc_id, tf.token,
        |         tf.tf * ln(CAST(n AS DOUBLE) / df.df) AS w
        |  FROM tf JOIN df ON df.token = tf.token CROSS JOIN nn),
        |rk AS (
        |  SELECT doc_id, token,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY w DESC, token) AS rn
        |  FROM wgt)
        |SELECT doc_id, string_agg(token, ',' ORDER BY rn) AS keywords
        |FROM rk WHERE rn <= 3 GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      // tf feeds both the df rollup and the weight join — materialize once
      val tf = Tables.spread(spark.table("documents"))
        .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
        .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val dfr = tf.groupBy($"token").agg(count(lit(1)).as("df"))
      val nn = spark.table("documents").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"doc_id").orderBy($"w".desc, $"token")
      tf.join(dfr, "token").crossJoin(broadcast(nn))
        .select($"doc_id", $"token",
          ($"tf" * log($"n".cast(DoubleType) / $"df")).as("w"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .groupBy($"doc_id")
        .agg(array_join(transform(
          sort_array(collect_list(struct($"rn", $"token"))),
          x => x.getField("token")), ",").as("keywords"))
        .orderBy($"doc_id")
    },

    // Phrase-blocklist filtering with per-source accounting — the C4-style
    // "bad phrase" gate (boilerplate banners, policy text, lorem-ipsum)
    // every corpus pipeline runs before training. The blocklist is a
    // BUILD-TIME literal (embedded identically in both engines), so the
    // whole gate is a map-side predicate over the scan — zero corpus
    // shuffle, one metadata-sized per-source rollup. At a real blocklist's
    // scale (10⁴⁺ phrases) the same accounting runs over q157's trigram
    // inverted index or an Aho-Corasick mapPartitions pass instead of a
    // contains() chain; the per-source drop-rate contract is unchanged.
    q("q169_phrase_blocklist",
      s"""WITH f AS (
         |  SELECT source,
         |    CASE WHEN ${blockPhrases.map(p =>
                s"contains(lower(text), '$p')").mkString(" OR ")}
         |    THEN 1 ELSE 0 END AS hit
         |  FROM documents)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(hit) AS BIGINT) AS n_dropped,
         |  CAST(COUNT(*) - SUM(hit) AS BIGINT) AS n_kept,
         |  ${Canon.Oracle.r6("CAST(SUM(hit) AS DOUBLE) / COUNT(*)")}
         |    AS drop_rate
         |FROM f GROUP BY source ORDER BY source""".stripMargin) { spark =>
      import spark.implicits._
      val hit = blockPhrases
        .map(p => lower($"text").contains(p))
        .reduce(_ || _)
      spark.table("documents")
        .select($"source", when(hit, 1).otherwise(0).as("hit"))
        .groupBy($"source")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum($"hit").cast(LongType).as("n_dropped"),
          (count(lit(1)) - sum($"hit")).cast(LongType).as("n_kept"),
          Canon.r6(sum($"hit").cast(DoubleType) / count(lit(1)))
            .as("drop_rate"))
        .orderBy($"source")
    },

    // Compression-ratio quality gate (the Gopher-family "too compressible =
    // machine-generated/repetitive" heuristic): each document is deflated
    // (zlib level 6, JDK Deflater) and sources are profiled by exact BYTE
    // sums — the per-source ratio divides two exact integer sums, so the
    // result is partition-order-invariant even though deflate itself is
    // opaque to SQL. Rows-only in the driver gate (no DuckDB deflate);
    // PipelineOpsSpec replays the identical Deflater per doc, and the
    // QueriesSmoke partition-invariance sweep covers the fold. Scale:
    // mapPartitions with ONE reused Deflater per partition (the q91
    // opaque-codec seam — payload bytes never shuffle, never reach the
    // driver), then a map-side-combinable per-source integer rollup.
    qRowsOnly("q176_compression_quality") { spark =>
      import spark.implicits._
      val sized = spark.table("documents")
        .select($"source", $"text").as[(String, String)]
        .mapPartitions { rows =>
          val defl = new java.util.zip.Deflater(6)
          val out = rows.map { case (src, text) =>
            val raw = text.getBytes("UTF-8")
            (src, raw.length.toLong, deflatedSize(raw, defl))
          }
          // exhaust before end(): mapPartitions iterators are lazy
          val done = out.toVector
          defl.end()
          done.iterator
        }
        .toDF("source", "raw_bytes", "defl_bytes")
      sized
        .groupBy($"source")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum($"raw_bytes").cast(LongType).as("raw_bytes"),
          sum($"defl_bytes").cast(LongType).as("defl_bytes"),
          sum(when($"defl_bytes".cast(DoubleType) / $"raw_bytes" <
            repetitiveRatio, 1).otherwise(0)).cast(LongType)
            .as("n_repetitive"))
        .select($"source", $"n_docs", $"raw_bytes", $"defl_bytes",
          Canon.r6($"defl_bytes".cast(DoubleType) / $"raw_bytes")
            .as("compression_ratio"),
          $"n_repetitive")
        .orderBy($"source")
    },

    // Temperature-scaled source mixing (the XLM-R / mC4 α-sampling rule):
    // source sampling shares p_s ∝ tokens_s^α with α = 0.3, which upsamples
    // small sources relative to proportional sampling without letting them
    // dominate. tokens^α is spelled exp(α·ln t) IDENTICALLY on both engines
    // and every share is surfaced through the r4/r6 floor-round margin (the
    // q122/q134 ln precedent). The share denominator Σ w_s is a sorted fold
    // over the |sources|-element collected array — bounded by the source
    // count (metadata-sized), never by the corpus. Scale: one map-side-
    // combinable per-source token rollup; everything after runs on
    // |sources| rows.
    q("q186_temperature_mixing",
      s"""WITH d AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(len($tokSql)) AS BIGINT) AS toks
         |  FROM documents GROUP BY source),
         |w AS (
         |  SELECT source, n_docs, toks,
         |         exp(0.3 * ln(CAST(toks AS DOUBLE))) AS w
         |  FROM d),
         |t AS (
         |  SELECT list_reduce(list_prepend(0.0,
         |    list_transform(list_sort(list(struct_pack(source := source,
         |                                              w := w))),
         |                   x -> x.w)), (p, q) -> p + q) AS wsum
         |  FROM w)
         |SELECT source, n_docs, toks,
         |  floor(w / wsum * 1000000 + 0.5) / 1000000 AS p_share,
         |  floor(w / wsum * 1000000.0 * 10000 + 0.5) / 10000 AS alloc_tokens,
         |  floor(w / wsum * 1000000.0 / CAST(toks AS DOUBLE) * 10000 + 0.5)
         |    / 10000 AS epochs
         |FROM w CROSS JOIN t
         |ORDER BY source""".stripMargin) { spark =>
      import spark.implicits._
      val per = spark.table("documents")
        .groupBy($"source")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum(size(split(lower($"text"), " ")).cast(LongType))
            .cast(LongType).as("toks"))
        .withColumn("w", exp(lit(0.3) * log($"toks".cast(DoubleType))))
      val wsum = per
        .agg(sort_array(collect_list(struct($"source", $"w"))).as("l"))
        .select(aggregate($"l", lit(0.0),
          (acc, x) => acc + x.getField("w")).as("wsum"))
      per.crossJoin(broadcast(wsum))
        .select($"source", $"n_docs", $"toks",
          Canon.r6($"w" / $"wsum").as("p_share"),
          Canon.r4($"w" / $"wsum" * lit(1000000.0)).as("alloc_tokens"),
          Canon.r4($"w" / $"wsum" * lit(1000000.0) /
            $"toks".cast(DoubleType)).as("epochs"))
        .orderBy($"source")
    },

    // Mixing-temperature sweep (the knob readout run before committing an
    // α — q213's threshold-curve pattern applied to q186's α-sampling):
    // for each α in the grid, the mixture's concentration (largest source
    // share), oversampling risk (max per-source epochs at a 1M-token
    // allocation), and diversity (share entropy). max is taken over the
    // FLOOR-ROUNDED per-source values so both engines max over identical
    // numbers; the entropy fold runs source-sorted (the q186/q64c
    // error-bounded class, surfaced r4). Scale: one per-source token
    // rollup + a |sources|×|αs| broadcast grid — metadata-sized after the
    // first aggregate.
    q("q229_mixing_sweep",
      s"""WITH d AS (
         |  SELECT source, CAST(SUM(len($tokSql)) AS BIGINT) AS toks
         |  FROM documents GROUP BY source),
         |a AS (SELECT unnest([0.2e0, 0.3e0, 0.5e0, 0.7e0, 1.0e0])
         |        AS alpha),
         |g AS (
         |  SELECT alpha, source, toks,
         |         exp(alpha * ln(CAST(toks AS DOUBLE))) AS w
         |  FROM d CROSS JOIN a),
         |t AS (
         |  SELECT alpha, list_reduce(list_prepend(0.0e0,
         |    list_transform(list_sort(list(struct_pack(source := source,
         |                                              w := w))),
         |                   x -> x.w)), (p, q) -> p + q) AS wsum
         |  FROM g GROUP BY alpha),
         |sc AS (
         |  SELECT g.alpha, g.source, g.w / t.wsum AS p,
         |         floor(g.w / t.wsum * 1000000 + 0.5) / 1000000 AS share_r6,
         |         floor(g.w / t.wsum * 1000000.0 / CAST(g.toks AS DOUBLE)
         |               * 10000 + 0.5) / 10000 AS ep_r4
         |  FROM g JOIN t ON t.alpha = g.alpha)
         |SELECT alpha, MAX(share_r6) AS top_share,
         |  MAX(ep_r4) AS max_epochs,
         |  floor(-list_reduce(list_prepend(0.0e0,
         |      list_transform(list_sort(list(struct_pack(source := source,
         |                                                p := p))),
         |                     x -> x.p * ln(x.p))), (p, q) -> p + q)
         |    * 10000 + 0.5) / 10000 AS share_entropy
         |FROM sc GROUP BY alpha
         |ORDER BY alpha""".stripMargin) { spark =>
      import spark.implicits._
      val per = spark.table("documents")
        .groupBy($"source")
        .agg(sum(size(split(lower($"text"), " ")).cast(LongType))
          .cast(LongType).as("toks"))
      val alphas = Seq(0.2, 0.3, 0.5, 0.7, 1.0).toDF("alpha")
      val grid = per.crossJoin(broadcast(alphas))
        .withColumn("w", exp($"alpha" * log($"toks".cast(DoubleType))))
      val wsums = grid.groupBy($"alpha")
        .agg(sort_array(collect_list(struct($"source", $"w"))).as("l"))
        .select($"alpha", aggregate($"l", lit(0.0),
          (acc, x) => acc + x.getField("w")).as("wsum"))
      val sc = grid.join(broadcast(wsums), Seq("alpha"))
        .select($"alpha", $"source",
          ($"w" / $"wsum").as("p"),
          Canon.r6($"w" / $"wsum").as("share_r6"),
          Canon.r4($"w" / $"wsum" * lit(1000000.0) /
            $"toks".cast(DoubleType)).as("ep_r4"))
      sc.groupBy($"alpha")
        .agg(sort_array(collect_list(struct($"source", $"p"))).as("l"),
          max($"share_r6").as("top_share"),
          max($"ep_r4").as("max_epochs"))
        .select($"alpha", $"top_share", $"max_epochs",
          Canon.r4(-aggregate($"l", lit(0.0),
            (acc, x) => acc + x.getField("p") * log(x.getField("p"))))
            .as("share_entropy"))
        .orderBy($"alpha")
    },

    // STRATIFIED weighted sampling without replacement — q154's
    // Efraimidis-Spirakis A-Res run per language stratum instead of
    // globally ("sample k docs from EACH language proportional to weight",
    // the quota-sampling shape a multilingual curation pass needs so a
    // dominant language can't crowd out the rest). Same key = ln(u)/w
    // score from a md5-uniform (u via +0.5 so ln never sees 0), but the
    // distributed shape is genuinely different from q154's global
    // TakeOrdered: the per-lang top-k is a rank window whose
    // WindowGroupLimit prunes to ≤k rows per lang MAP-SIDE before the one
    // lang exchange (PlanSpec-pinned), so at 100 TB each task forwards k
    // rows per stratum, never the corpus. Unlike q154 the rounded score is
    // surfaced (floor-r6 with the `+ 0` tiny-negative guard); md5 draws
    // keep adjacent order-statistic gaps ≫ ULP so a libm ln() divergence
    // can't flip membership (the q122/q134 ln-agreement precedent).
    q("q230_weighted_sample",
      """WITH s AS (
        |  SELECT doc_id, lang, n_chars,
        |    ln((CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)),
        |                             1, 8)) AS UBIGINT) + 0.5)
        |       / 4294967296.0) / CAST(n_chars AS DOUBLE) AS key
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id, n_chars, key,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |                       ORDER BY key DESC, doc_id) AS rnk
        |  FROM s)
        |SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars,
        |  floor(key * 1000000 + 0.5) / 1000000 + 0 AS score
        |FROM r WHERE rnk <= 25
        |ORDER BY lang, rnk""".stripMargin) { spark =>
      import spark.implicits._
      aresTopPerStratum(spark.table("documents"), 25)
        .select($"lang", $"rnk", $"doc_id", $"n_chars",
          (floor($"key" * 1000000 + 0.5) / 1000000 + lit(0)).as("score"))
        .orderBy($"lang", $"rnk")
    },

    // Vocabulary-coverage / OOV curve (the readout behind "how big a vocab
    // does this corpus need": token share covered by the top-V types for a
    // V grid — Zipf's law made actionable for tokenizer sizing). Scale: the
    // only corpus-sized stages are the token-count rollup (map-side
    // partial) and a TakeOrdered top-Vmax — never a vocab-global sort; the
    // rank window runs on the POST-LIMIT 3000-row relation (bounded by
    // construction, the limit-16-vocab precedent), and the grid join is a
    // broadcast non-equi over 3000×4 rows. Covered counts are exact BIGINT
    // sums (no IEEE fold anywhere); only the surfaced shares divide.
    q("q231_vocab_coverage",
      s"""WITH c AS (
         |  SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM
         |    (SELECT unnest($tokSql) AS token FROM documents) t
         |  GROUP BY token),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_tokens,
         |               CAST(COUNT(*) AS BIGINT) AS vocab_size FROM c),
         |top AS (SELECT token, n,
         |          ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk
         |        FROM c ORDER BY n DESC, token LIMIT 3000),
         |v AS (SELECT unnest([100, 300, 1000, 3000]) AS v_size),
         |cov AS (SELECT v.v_size, CAST(SUM(top.n) AS BIGINT)
         |          AS covered_tokens
         |        FROM v JOIN top ON top.rnk <= v.v_size GROUP BY v.v_size)
         |SELECT CAST(cov.v_size AS BIGINT) AS v_size, tot.vocab_size,
         |  cov.covered_tokens, tot.total_tokens,
         |  floor(CAST(cov.covered_tokens AS DOUBLE) / tot.total_tokens
         |        * 1000000 + 0.5) / 1000000 AS coverage_share,
         |  floor(CAST(tot.total_tokens - cov.covered_tokens AS DOUBLE)
         |        / tot.total_tokens * 1000000 + 0.5) / 1000000 AS oov_share
         |FROM cov CROSS JOIN tot ORDER BY v_size""".stripMargin) { spark =>
      import spark.implicits._
      val c = spark.table("documents")
        .select(explode(split(lower($"text"), " ")).as("token"))
        .groupBy($"token").agg(count(lit(1)).cast(LongType).as("n"))
        .localCheckpoint() // feeds the totals AND the top-Vmax rank
      val tot = c.agg(sum($"n").cast(LongType).as("total_tokens"),
        count(lit(1)).cast(LongType).as("vocab_size"))
      val ranked = c.orderBy($"n".desc, $"token").limit(3000)
        .withColumn("rnk", row_number()
          .over(Window.orderBy($"n".desc, $"token")).cast(LongType))
      val grid = Seq(100, 300, 1000, 3000).toDF("v_size")
      ranked.join(broadcast(grid), $"rnk" <= $"v_size")
        .groupBy($"v_size")
        .agg(sum($"n").cast(LongType).as("covered_tokens"))
        .crossJoin(broadcast(tot))
        .select($"v_size".cast(LongType).as("v_size"), $"vocab_size",
          $"covered_tokens", $"total_tokens",
          (floor($"covered_tokens".cast(DoubleType) / $"total_tokens"
            * 1000000 + 0.5) / 1000000).as("coverage_share"),
          (floor(($"total_tokens" - $"covered_tokens").cast(DoubleType)
            / $"total_tokens" * 1000000 + 0.5) / 1000000).as("oov_share"))
        .orderBy($"v_size")
    },

    // Context-window truncation waste (the sizing readout run before
    // committing a training sequence length: per candidate context L, how
    // many docs overflow and what token share a hard truncation throws
    // away — the complement of q223's packing efficiency). Scale: one
    // map-side per-doc token length, a ×|L-grid| broadcast cross (4×, then
    // immediately partial-aggregated), all-integer sums; only the surfaced
    // share divides.
    q("q232_truncation_waste",
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($tokSql) AS BIGINT) AS toks
         |  FROM documents),
         |l AS (SELECT unnest([128, 256, 512, 1024]) AS l_ctx),
         |g AS (SELECT l.l_ctx, d.toks FROM d CROSS JOIN l)
         |SELECT CAST(l_ctx AS BIGINT) AS l_ctx,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN toks > l_ctx THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_truncated,
         |  CAST(SUM(toks) AS BIGINT) AS total_tokens,
         |  CAST(SUM(CASE WHEN toks > l_ctx THEN toks - l_ctx ELSE 0 END)
         |    AS BIGINT) AS tokens_lost,
         |  floor(CAST(SUM(CASE WHEN toks > l_ctx THEN toks - l_ctx
         |                      ELSE 0 END) AS DOUBLE)
         |        / SUM(toks) * 1000000 + 0.5) / 1000000 AS lost_share
         |FROM g GROUP BY l_ctx ORDER BY l_ctx""".stripMargin) { spark =>
      import spark.implicits._
      val lens = spark.table("documents")
        .select($"doc_id",
          size(split(lower($"text"), " ")).cast(LongType).as("toks"))
      val grid = Seq(128, 256, 512, 1024).toDF("l_ctx")
      lens.crossJoin(broadcast(grid))
        .groupBy($"l_ctx")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum(when($"toks" > $"l_ctx", lit(1L)).otherwise(lit(0L)))
            .cast(LongType).as("docs_truncated"),
          sum($"toks").cast(LongType).as("total_tokens"),
          sum(when($"toks" > $"l_ctx", $"toks" - $"l_ctx")
            .otherwise(lit(0L))).cast(LongType).as("tokens_lost"))
        .select($"l_ctx".cast(LongType).as("l_ctx"), $"n_docs",
          $"docs_truncated", $"total_tokens", $"tokens_lost",
          (floor($"tokens_lost".cast(DoubleType) / $"total_tokens"
            * 1000000 + 0.5) / 1000000).as("lost_share"))
        .orderBy($"l_ctx")
    },

    // Token-budget water-filling (the allocation step after q229 picks a
    // temperature: give each language stratum alloc = min(capacity, λ·w)
    // with λ chosen so the allocations exactly exhaust a global budget B —
    // the capped-proportional allocator every mixture trainer runs when a
    // stratum is too small to fill its proportional share). B = 90% of
    // corpus tokens and the flattening weight w = toks^0.25 (the q186
    // exp/ln spelling) put BOTH regimes live on the fixture: the small
    // languages saturate at capacity, the dominant one takes the
    // remainder. λ solves exactly over the sorted saturation boundaries:
    // strata sorted by r = cap/w; boundary j-1 saturates rows 1..j-1, so
    // λ_j = (B − csum_{j−1}) / (total_w − wsum_{j−1}), valid iff
    // r_{j−1} ≤ λ_j ≤ r_j — unique for B < total capacity, picked as the
    // min-j valid row. Every post-rollup relation is |langs| rows
    // (bounded — the sources-grid window precedent); prefix folds run in
    // (r, lang) order as identical sequential IEEE left folds on both
    // engines, suffix sums are total − prefix (never a FOLLOWING frame,
    // whose in-frame accumulation order the engines need not share).
    q("q233_budget_waterfill",
      s"""WITH per AS (
         |  SELECT lang, CAST(SUM(len($tokSql)) AS BIGINT) AS toks
         |  FROM documents GROUP BY lang),
         |tot AS (SELECT (CAST(SUM(toks) AS BIGINT) * 9) // 10 AS b
         |        FROM per),
         |wr AS (
         |  SELECT lang, toks, exp(0.25 * ln(CAST(toks AS DOUBLE))) AS w,
         |    CAST(toks AS DOUBLE) / exp(0.25 * ln(CAST(toks AS DOUBLE)))
         |      AS r
         |  FROM per),
         |srt AS (
         |  SELECT lang, toks, w, r,
         |    CAST(ROW_NUMBER() OVER (ORDER BY r, lang) AS BIGINT) AS i,
         |    CAST(SUM(toks) OVER (ORDER BY r, lang
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pc,
         |    SUM(w) OVER (ORDER BY r, lang ROWS UNBOUNDED PRECEDING)
         |      AS pw,
         |    lag(r) OVER (ORDER BY r, lang) AS r_prev
         |  FROM wr),
         |tw AS (SELECT pw AS total_w FROM srt
         |       WHERE i = (SELECT MAX(i) FROM srt)),
         |cand AS (
         |  SELECT srt.i, srt.r, srt.r_prev,
         |    (CAST(tot.b AS DOUBLE) - CAST(srt.pc - srt.toks AS DOUBLE))
         |      / (tw.total_w - (srt.pw - srt.w)) AS lam
         |  FROM srt CROSS JOIN tot CROSS JOIN tw),
         |sel AS (
         |  SELECT lam FROM cand
         |  WHERE (i = 1 OR r_prev <= lam) AND lam <= r
         |  ORDER BY i LIMIT 1)
         |SELECT wr.lang AS lang, wr.toks AS toks,
         |  wr.r <= sel.lam AS saturated,
         |  floor(CASE WHEN wr.r <= sel.lam THEN CAST(wr.toks AS DOUBLE)
         |             ELSE sel.lam * wr.w END * 10000 + 0.5) / 10000
         |    AS alloc_tokens,
         |  floor(CASE WHEN wr.r <= sel.lam THEN CAST(wr.toks AS DOUBLE)
         |             ELSE sel.lam * wr.w END / CAST(tot.b AS DOUBLE)
         |        * 1000000 + 0.5) / 1000000 AS budget_share
         |FROM wr CROSS JOIN sel CROSS JOIN tot
         |ORDER BY lang""".stripMargin) { spark =>
      import spark.implicits._
      val per = spark.table("documents")
        .groupBy($"lang")
        .agg(sum(size(split(lower($"text"), " ")).cast(LongType))
          .cast(LongType).as("toks"))
        .localCheckpoint() // feeds the budget scalar AND the fold
      val tot = per.agg(sum($"toks").cast(LongType).as("total_toks"))
        .select(expr("(total_toks * 9) div 10").as("b"))
      val wr = per
        .withColumn("w", exp(lit(0.25) * log($"toks".cast(DoubleType))))
        .withColumn("r", $"toks".cast(DoubleType) / $"w")
      // |langs|-row relation: the unpartitioned windows are bounded
      val ord = Window.orderBy($"r", $"lang")
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val srt = wr
        .withColumn("i", row_number().over(ord).cast(LongType))
        .withColumn("pc", sum($"toks").over(run).cast(LongType))
        .withColumn("pw", sum($"w").over(run))
        .withColumn("r_prev", lag($"r", 1).over(ord))
        .localCheckpoint() // feeds total_w AND the candidate grid
      val n = srt.agg(max($"i").as("mi"))
      val tw = srt.join(broadcast(n), $"i" === $"mi")
        .select($"pw".as("total_w"))
      val cand = srt.crossJoin(broadcast(tot)).crossJoin(broadcast(tw))
        .select($"i", $"r", $"r_prev",
          (($"b".cast(DoubleType) - ($"pc" - $"toks").cast(DoubleType)) /
            ($"total_w" - ($"pw" - $"w"))).as("lam"))
      val sel = cand
        .filter(($"i" === 1 || $"r_prev" <= $"lam") && $"lam" <= $"r")
        .orderBy($"i").limit(1).select($"lam")
      val alloc = when($"r" <= $"lam", $"toks".cast(DoubleType))
        .otherwise($"lam" * $"w")
      wr.crossJoin(broadcast(sel)).crossJoin(broadcast(tot))
        .select($"lang", $"toks",
          ($"r" <= $"lam").as("saturated"),
          (floor(alloc * 10000 + 0.5) / 10000).as("alloc_tokens"),
          (floor(alloc / $"b".cast(DoubleType) * 1000000 + 0.5) / 1000000)
            .as("budget_share"))
        .orderBy($"lang")
    },

    // Per-source length-percentile gate (the "trim the tails" pre-filter a
    // pipeline runs before quality scoring): token-length p05/p95 per source
    // via the exact interpolated percentile both engines share
    // (`percentile` ↔ QUANTILE_CONT, the q177 precedent), then a broadcast
    // stats join flags each doc short/long/kept. The exact percentile
    // collects per-group values — the |source|-group fixture path; at 100 TB
    // the same contract runs on q178's mergeable histogram-quantile sketch
    // (cell-addable state) with this query as its validator. Integer counts
    // + interpolated bounds through the free-double floor-round.
    q("q187_length_gate",
      s"""WITH d AS (
         |  SELECT source, doc_id, len($tokSql) AS n_toks FROM documents),
         |s AS (
         |  SELECT source, QUANTILE_CONT(n_toks, 0.05) AS lo,
         |         QUANTILE_CONT(n_toks, 0.95) AS hi
         |  FROM d GROUP BY source)
         |SELECT d.source AS source,
         |  floor(s.lo * 10000 + 0.5) / 10000 AS p05,
         |  floor(s.hi * 10000 + 0.5) / 10000 AS p95,
         |  CAST(SUM(CASE WHEN d.n_toks < s.lo THEN 1 ELSE 0 END) AS BIGINT)
         |    AS drop_short,
         |  CAST(SUM(CASE WHEN d.n_toks > s.hi THEN 1 ELSE 0 END) AS BIGINT)
         |    AS drop_long,
         |  CAST(SUM(CASE WHEN d.n_toks >= s.lo AND d.n_toks <= s.hi
         |                THEN 1 ELSE 0 END) AS BIGINT) AS kept
         |FROM d JOIN s ON d.source = s.source
         |GROUP BY d.source, s.lo, s.hi
         |ORDER BY source""".stripMargin) { spark =>
      import spark.implicits._
      val d = spark.table("documents")
        .select($"source", size(split(lower($"text"), " ")).as("n_toks"))
      val s = d.groupBy($"source")
        .agg(expr("percentile(n_toks, 0.05)").as("lo"),
          expr("percentile(n_toks, 0.95)").as("hi"))
      d.join(broadcast(s), Seq("source"))
        .groupBy($"source", $"lo", $"hi")
        .agg(
          sum(when($"n_toks" < $"lo", 1).otherwise(0)).cast(LongType)
            .as("drop_short"),
          sum(when($"n_toks" > $"hi", 1).otherwise(0)).cast(LongType)
            .as("drop_long"),
          sum(when($"n_toks" >= $"lo" && $"n_toks" <= $"hi", 1).otherwise(0))
            .cast(LongType).as("kept"))
        .select($"source", Canon.r4($"lo").as("p05"), Canon.r4($"hi").as("p95"),
          $"drop_short", $"drop_long", $"kept")
        .orderBy($"source")
    },

    // Zipf rank-frequency fit (corpus-health monitor: natural text shows a
    // log-log slope near −1; a drifting slope flags boilerplate floods or
    // tokenizer breakage). Top-100 tokens via TakeOrdered (orderBy+limit —
    // the q116 spelling, never a full-vocab rank window), ranks assigned on
    // the ≤100-row survivor relation, then OLS on (ln rank, ln count) with
    // all five moment sums computed by sorted folds over the single bounded
    // collected array — one fixed IEEE association shared by both engines
    // (the q190 family determinism pattern). Output is one row.
    // Denominator (r08 audit): n·Σx²−(Σx)² = 0 iff every ln-rank is equal
    // ⇔ the corpus has ONE distinct token; the numerator is then the same
    // exact 0 and 0/0 is the identical IEEE NaN on both engines.
    q("q190_zipf_slope",
      s"""WITH t AS (SELECT unnest($tokSql) AS token FROM documents),
         |c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM t
         |      GROUP BY token),
         |top AS (SELECT token, n FROM c ORDER BY n DESC, token LIMIT 100),
         |r AS (SELECT token, n,
         |        ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rk FROM top),
         |arr AS (SELECT list_sort(list(struct_pack(rk := rk,
         |          x := ln(CAST(rk AS DOUBLE)),
         |          y := ln(CAST(n AS DOUBLE))))) AS l FROM r),
         |m AS (SELECT
         |  CAST(len(l) AS DOUBLE) AS cnt,
         |  list_reduce(list_prepend(0.0, list_transform(l, e -> e.x)),
         |              (p, q) -> p + q) AS sx,
         |  list_reduce(list_prepend(0.0, list_transform(l, e -> e.y)),
         |              (p, q) -> p + q) AS sy,
         |  list_reduce(list_prepend(0.0, list_transform(l, e -> e.x * e.x)),
         |              (p, q) -> p + q) AS sxx,
         |  list_reduce(list_prepend(0.0, list_transform(l, e -> e.x * e.y)),
         |              (p, q) -> p + q) AS sxy,
         |  list_reduce(list_prepend(0.0, list_transform(l, e -> e.y * e.y)),
         |              (p, q) -> p + q) AS syy
         |  FROM arr)
         |SELECT CAST(cnt AS BIGINT) AS n_top,
         |  floor((cnt * sxy - sx * sy) / (cnt * sxx - sx * sx) * 10000 + 0.5)
         |    / 10000 AS zipf_slope,
         |  floor((sy - (cnt * sxy - sx * sy) / (cnt * sxx - sx * sx) * sx)
         |        / cnt * 10000 + 0.5) / 10000 AS intercept,
         |  floor((cnt * sxy - sx * sy) * (cnt * sxy - sx * sy)
         |        / ((cnt * sxx - sx * sx) * (cnt * syy - sy * sy))
         |        * 10000 + 0.5) / 10000 AS r2
         |FROM m""".stripMargin) { spark =>
      import spark.implicits._
      val toks = spark.table("documents")
        .select(explode(split(lower($"text"), " ")).as("token"))
      val c = toks.groupBy($"token").agg(count(lit(1)).cast(LongType).as("n"))
      val top = c.orderBy($"n".desc, $"token").limit(100)
      val r = top.withColumn("rk",
        row_number().over(Window.orderBy($"n".desc, $"token")))
      val arr = r.agg(sort_array(collect_list(struct($"rk",
        log($"rk".cast(DoubleType)).as("x"),
        log($"n".cast(DoubleType)).as("y")))).as("l"))
      def fold(f: Column => Column): Column =
        aggregate($"l", lit(0.0), (acc, e) => acc + f(e))
      val m = arr.select(size($"l").cast(DoubleType).as("cnt"),
        fold(_.getField("x")).as("sx"), fold(_.getField("y")).as("sy"),
        fold(e => e.getField("x") * e.getField("x")).as("sxx"),
        fold(e => e.getField("x") * e.getField("y")).as("sxy"),
        fold(e => e.getField("y") * e.getField("y")).as("syy"))
      val num = $"cnt" * $"sxy" - $"sx" * $"sy"
      val den = $"cnt" * $"sxx" - $"sx" * $"sx"
      m.select($"cnt".cast(LongType).as("n_top"),
        Canon.r4(num / den).as("zipf_slope"),
        Canon.r4(($"sy" - num / den * $"sx") / $"cnt").as("intercept"),
        Canon.r4(num * num /
          (den * ($"cnt" * $"syy" - $"sy" * $"sy"))).as("r2"))
    },

    // Heaps-law vocabulary growth curve (the "is more data still adding new
    // types?" curation signal): docs are split into 10 ingest-order buckets
    // by doc_id, each distinct token is credited to the bucket where it
    // FIRST appears (map-side-combinable MIN — the q173 first-seen shape,
    // never a cumulative distinct rescan), and the cumulative vocabulary is
    // a window over the 10-row bucket grid. All-integer → fully
    // hash-checked; nothing bigger than the token rollup shuffles.
    q("q191_vocab_growth",
      s"""WITH mx AS (SELECT MAX(doc_id) + 1 AS nd FROM documents),
         |tok AS (SELECT CAST(doc_id * 10 // mx.nd AS BIGINT) AS bucket,
         |               unnest($tokSql) AS token
         |        FROM documents CROSS JOIN mx),
         |firstb AS (SELECT token, MIN(bucket) AS fb FROM tok GROUP BY token),
         |occ AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS bucket_tokens
         |        FROM tok GROUP BY bucket),
         |nw AS (SELECT fb AS bucket, CAST(COUNT(*) AS BIGINT) AS new_types
         |       FROM firstb GROUP BY fb)
         |SELECT o.bucket AS bucket, o.bucket_tokens,
         |  COALESCE(nw.new_types, 0) AS new_types,
         |  CAST(SUM(COALESCE(nw.new_types, 0)) OVER (ORDER BY o.bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_vocab,
         |  CAST(SUM(o.bucket_tokens) OVER (ORDER BY o.bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_tokens
         |FROM occ o LEFT JOIN nw ON nw.bucket = o.bucket
         |ORDER BY bucket""".stripMargin) { spark =>
      import spark.implicits._
      val nd = spark.table("documents")
        .agg((max($"doc_id") + 1).as("nd"))
      val tok = spark.table("documents").crossJoin(broadcast(nd))
        .select(expr("doc_id * 10 div nd").cast(LongType).as("bucket"),
          explode(split(lower($"text"), " ")).as("token"))
      val firstb = tok.groupBy($"token").agg(min($"bucket").as("fb"))
      val occ = tok.groupBy($"bucket")
        .agg(count(lit(1)).cast(LongType).as("bucket_tokens"))
      val nw = firstb.groupBy($"fb".as("bucket"))
        .agg(count(lit(1)).cast(LongType).as("new_types"))
      val w = Window.orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      occ.join(nw, Seq("bucket"), "left")
        .select($"bucket", $"bucket_tokens",
          coalesce($"new_types", lit(0L)).as("new_types"))
        .withColumn("cum_vocab", sum($"new_types").over(w).cast(LongType))
        .withColumn("cum_tokens", sum($"bucket_tokens").over(w).cast(LongType))
        .orderBy($"bucket")
    },

    // BPE merge training (Sennrich ACL'16) — the first 3 merge rounds of
    // byte-pair-encoding vocabulary construction, the tokenizer-training
    // op itself (q116 builds a WORD vocab; this learns SUBWORD units).
    // Each round: adjacent-symbol pair counts weighted by word frequency →
    // argmax pair by (count DESC, a, b) via TakeOrdered → greedy
    // leftmost-first merge of that pair inside every word, spelled as the
    // SAME left fold on both engines (Spark `aggregate` with an array
    // accumulator; DuckDB `list_reduce` over singleton lists — its
    // accumulator must share the element type). The fold state is one
    // word's symbol array (bounded by word length); the per-round rollup
    // is the map-side-combinable (a, b) count. All-integer/string output →
    // fully hash-checked. Scale: rounds iterate over the DISTINCT-word
    // relation (vocab-sized, not corpus-sized) with the corpus touched
    // once for word counts; each round's relation is localCheckpoint'ed —
    // the fixpoint materialization rule (q189's 2.8× lesson).
    q("q192_bpe_merges",
      s"""WITH ${bpeCtes(bpeRounds)}
         |SELECT * FROM (
         |  SELECT 1 AS merge_rank, a AS sym_a, b AS sym_b, n AS pair_count
         |  FROM m1
         |  UNION ALL
         |  SELECT 2, a, b, n FROM m2
         |  UNION ALL
         |  SELECT 3, a, b, n FROM m3)
         |ORDER BY merge_rank""".stripMargin) { spark =>
      import spark.implicits._
      val (merges, _) = bpeShared(spark) // memoized, shared with q200
      merges.orderBy($"merge_rank")
    },

    // BPE corpus encoding — q192's counterpart: APPLY the learned merges
    // to re-tokenize every word occurrence and report the per-source
    // compression the subword vocabulary buys (symbols after / characters
    // before). The merge table is corpus-global; each source joins its own
    // (source, word) counts against the final word→symbols relation, so
    // the encode step is a vocab-sized broadcast-shaped join plus one
    // map-side-combinable rollup. All-integer sums, one r4 ratio.
    q("q200_bpe_encode",
      s"""WITH ${bpeCtes(bpeRounds)},
         |ps AS (
         |  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c FROM
         |    (SELECT source, unnest($tokSql) AS word FROM documents) t
         |  WHERE len(word) > 0 GROUP BY source, word),
         |enc AS (
         |  SELECT ps.source, ps.c, len(ps.word) AS wl,
         |         len(w$bpeRounds.syms) AS sl
         |  FROM ps JOIN w$bpeRounds ON w$bpeRounds.word = ps.word)
         |SELECT source, CAST(SUM(c) AS BIGINT) AS ws_tokens,
         |  CAST(SUM(c * wl) AS BIGINT) AS chars,
         |  CAST(SUM(c * sl) AS BIGINT) AS symbols,
         |  floor(CAST(SUM(c * sl) AS DOUBLE) / CAST(SUM(c * wl) AS DOUBLE)
         |        * 10000 + 0.5) / 10000 AS compression
         |FROM enc GROUP BY source
         |ORDER BY source""".stripMargin) { spark =>
      import spark.implicits._
      val (_, fw) = bpeShared(spark) // memoized, shared with q192
      val ps = spark.table("documents")
        .select($"source", explode(split(lower($"text"), " ")).as("word"))
        .filter(length($"word") > 0)
        .groupBy($"source", $"word")
        .agg(count(lit(1)).cast(LongType).as("c"))
      val enc = ps.join(fw.select($"word", length($"word").as("wl"),
        size($"syms").as("sl")), Seq("word"))
      enc.groupBy($"source")
        .agg(sum($"c").cast(LongType).as("ws_tokens"),
          sum($"c" * $"wl").cast(LongType).as("chars"),
          sum($"c" * $"sl").cast(LongType).as("symbols"))
        .select($"source", $"ws_tokens", $"chars", $"symbols",
          Canon.r4($"symbols".cast(DoubleType) / $"chars".cast(DoubleType))
            .as("compression"))
        .orderBy($"source")
    },

    // Distinctive-term source profiling (χ² keyword extraction, the
    // c-TF-IDF/log-likelihood-ratio family): which tokens characterize a
    // source AGAINST the rest of the corpus? Per (source, token) the 2×2
    // contingency (in-source vs elsewhere × this-token vs others) scores
    // χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)); every margin is an exact
    // integer, the statistic is one fixed double spelling (products stay
    // < 2⁵³ until the final square — identically rounded on both
    // engines), and ranking uses the r4-ROUNDED value with the token as
    // tiebreak (the q134 pattern) so the per-source top-5 hash-checks.
    // Scale: one (source, token) rollup, token totals joined by token key,
    // broadcast source totals, rank window partitioned by source.
    q("q201_source_keywords",
      s"""WITH st AS (
         |  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n_st FROM
         |    (SELECT source, unnest($tokSql) AS token FROM documents) t
         |  GROUP BY source, token),
         |tt AS (SELECT token, CAST(SUM(n_st) AS BIGINT) AS n_t FROM st
         |       GROUP BY token),
         |ss AS (SELECT source, CAST(SUM(n_st) AS BIGINT) AS n_s FROM st
         |       GROUP BY source),
         |nn AS (SELECT CAST(SUM(n_st) AS BIGINT) AS n FROM st),
         |x AS (
         |  SELECT st.source, st.token, st.n_st,
         |    CAST(nn.n AS DOUBLE)
         |      * (CAST(st.n_st AS DOUBLE)
         |           * (nn.n - tt.n_t - ss.n_s + st.n_st)
         |         - CAST(tt.n_t - st.n_st AS DOUBLE) * (ss.n_s - st.n_st))
         |      * (CAST(st.n_st AS DOUBLE)
         |           * (nn.n - tt.n_t - ss.n_s + st.n_st)
         |         - CAST(tt.n_t - st.n_st AS DOUBLE) * (ss.n_s - st.n_st))
         |      / (CAST(tt.n_t AS DOUBLE) * (nn.n - tt.n_t)
         |         * ss.n_s * (nn.n - ss.n_s)) AS chi2
         |  FROM st
         |  JOIN tt ON tt.token = st.token
         |  JOIN ss ON ss.source = st.source
         |  CROSS JOIN nn
         |  WHERE st.n_st >= $keywordMinCount),
         |rk AS (
         |  SELECT source, token, n_st,
         |         floor(chi2 * 10000 + 0.5) / 10000 AS chi2,
         |         ROW_NUMBER() OVER (PARTITION BY source
         |           ORDER BY floor(chi2 * 10000 + 0.5) / 10000 DESC, token)
         |           AS kw_rank
         |  FROM x)
         |SELECT source, kw_rank, token, n_st, chi2 FROM rk
         |WHERE kw_rank <= 5
         |ORDER BY source, kw_rank""".stripMargin) { spark =>
      import spark.implicits._
      val st = spark.table("documents")
        .select($"source", explode(split(lower($"text"), " ")).as("token"))
        .groupBy($"source", $"token")
        .agg(count(lit(1)).cast(LongType).as("n_st"))
        .localCheckpoint() // feeds token totals, source totals, and scoring
      val tt = st.groupBy($"token").agg(sum($"n_st").cast(LongType).as("n_t"))
      val ss = st.groupBy($"source").agg(sum($"n_st").cast(LongType).as("n_s"))
      val nn = st.agg(sum($"n_st").cast(LongType).as("n"))
      val d = ($"n_st".cast(DoubleType) *
        ($"n" - $"n_t" - $"n_s" + $"n_st")) -
        (($"n_t" - $"n_st").cast(DoubleType) * ($"n_s" - $"n_st"))
      val chi2 = $"n".cast(DoubleType) * d * d /
        ($"n_t".cast(DoubleType) * ($"n" - $"n_t") * $"n_s" *
          ($"n" - $"n_s"))
      val x = st.filter($"n_st" >= keywordMinCount)
        .join(tt, Seq("token"))
        .join(broadcast(ss), Seq("source"))
        .crossJoin(broadcast(nn))
        .select($"source", $"token", $"n_st", Canon.r4(chi2).as("chi2"))
      val w = Window.partitionBy($"source").orderBy($"chi2".desc, $"token")
      x.withColumn("kw_rank", row_number().over(w))
        .filter($"kw_rank" <= 5)
        .select($"source", $"kw_rank", $"token", $"n_st", $"chi2")
        .orderBy($"source", $"kw_rank")
    },

    // Character-entropy quality gate (Shannon H over each doc's char
    // distribution — the cheap detector for base64 blobs, key-mash, and
    // repeated-char padding that survives token-level gates): H =
    // −Σ (c/n)·log₂(c/n) folded in CHAR-SORTED order over the per-doc
    // histogram (≤|charset| cells — the q184 determinism idiom at
    // per-doc scale), compared at the r4-ROUNDED value so both engines
    // gate identically at the boundary (q213's threshold rule; fixture
    // range 3.68–4.23, gate keeps [4.0, 5.5] ⇒ ~10% drop). Per-source
    // accounting surfaces mean H via the exact-DECIMAL sum of the
    // r4-rounded per-doc values (the Canon.sum4 pattern — never a raw
    // double sum). Scale: chars explode map-side, the histogram is a
    // map-side-combinable (doc, char) rollup, the fold is per-doc
    // bounded, one |sources|-key rollup — nothing corpus-held.
    q("q216_char_entropy",
      """WITH ch AS (
        |  SELECT doc_id, source,
        |         unnest(list_transform(range(1, len(text) + 1),
        |                               i -> substr(text, i, 1))) AS c
        |  FROM documents),
        |hist AS (SELECT doc_id, source, c, CAST(COUNT(*) AS BIGINT) AS cnt
        |         FROM ch GROUP BY doc_id, source, c),
        |arr AS (
        |  SELECT doc_id, source,
        |         CAST(SUM(cnt) AS BIGINT) AS n,
        |         list_sort(list(struct_pack(c := c, cnt := cnt))) AS l
        |  FROM hist GROUP BY doc_id, source),
        |h AS (
        |  SELECT doc_id, source,
        |    floor(-list_reduce(list_prepend(0.0, list_transform(arr.l, x ->
        |        (CAST(x.cnt AS DOUBLE) / arr.n) *
        |        (ln(CAST(x.cnt AS DOUBLE) / arr.n) / ln(2.0)))),
        |        (p, q) -> p + q) * 10000 + 0.5) / 10000 AS h4
        |  FROM arr)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN h4 >= 4.0 AND h4 <= 5.5 THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_kept,
        |  floor(CAST(SUM(CAST(h4 AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |        * 10000 + 0.5) / 10000 AS mean_h
        |FROM h
        |GROUP BY source
        |ORDER BY source""".stripMargin) { spark =>
      import spark.implicits._
      // chars iterate CODE POINTS via substr(text, i, 1) — the oracle's
      // substr loop exactly. split(text, "") yields [""] for empty text
      // while the oracle emits no rows, so any empty doc would diverge
      // (ADVICE r08; r10 re-measured the rest — split-by-empty is
      // code-point-based on Spark 4.1.2, see TextRobustnessSpec). seq1
      // guards the empty doc to an
      // empty array = the oracle's empty range. Base spread: per-char
      // explode is the heaviest generator in the repo and the fixture
      // is one row group (CLAUDE.md invariant).
      val hist = Tables.spread(spark.table("documents"))
        .select($"doc_id", $"source",
          explode(transform(Canon.seq1(char_length($"text")),
            i => $"text".substr(i, lit(1)))).as("c"))
        .groupBy($"doc_id", $"source", $"c")
        .agg(count(lit(1)).cast(LongType).as("cnt"))
      val arr = hist.groupBy($"doc_id", $"source")
        .agg(sum($"cnt").cast(LongType).as("n"),
          sort_array(collect_list(struct($"c", $"cnt"))).as("l"))
      val h = arr.select($"doc_id", $"source",
        (floor(-aggregate($"l", lit(0.0), (acc, x) =>
          acc + (x.getField("cnt").cast(DoubleType) / $"n") *
            (log(x.getField("cnt").cast(DoubleType) / $"n") / log(lit(2.0))))
          * 10000 + 0.5) / 10000).as("h4"))
      h.groupBy($"source")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          sum(when($"h4" >= 4.0 && $"h4" <= 5.5, 1).otherwise(0))
            .cast(LongType).as("n_kept"),
          (floor(sum($"h4".cast(DecimalType(18, 4))).cast(DoubleType)
            / count(lit(1)) * 10000 + 0.5) / 10000).as("mean_h"))
        .orderBy($"source")
    },

    // Encoding repair / mojibake gate (VERDICT r12 "what's missing" #2):
    // the cleaning stage real web pipelines run right after NFC — detect
    // CP1252-in-UTF8 double-encoding ("â€™" where ’ was meant) and
    // replacement-char (U+FFFD) density, repair via the fixed translate
    // map, report per-source repair rates + a keep gate. The fixture text
    // is ASCII-clean, so corruption is PLANTED deterministically from
    // md5(doc_id): classes 0-2 insert a double-encoded token (+ a second
    // one when reps ≥ 2), class 3 inserts 1-3 replacement chars, classes
    // 4-9 stay clean controls — every detector sees planted positives AND
    // clean negatives at every SF. All-integer outputs (counts + the
    // integer keep gate repl_ct·100 ≤ len) → fully hash-checkable.
    // Scale: pure map-side string ops + one |sources|-key rollup — no
    // join, no shuffle beyond the final aggregation; at 100 TB this is
    // the cheapest possible shape (embarrassingly parallel scan).
    q("q248_mojibake_repair",
      mojiQuerySql(
        "md5('moji:' || doc_id)",
        off => s"CAST(CAST(('0x' || substr(h, $off, 2)) AS UBIGINT) AS BIGINT)")) {
      spark =>
        spark.sql(mojiQuerySql(
          "md5(concat('moji:', CAST(doc_id AS STRING)))",
          off => s"CAST(conv(substring(h, $off, 2), 16, 10) AS BIGINT)"))
    })

  // ---- q248 encoding repair / mojibake -------------------------------------

  /** CP1252 mojibake tokens (the UTF-8 byte sequence of the intended
    * character, each byte re-read as CP1252) paired with their repairs.
    * UTF-8 source literals are safe in this build (TextRobustnessSpec's
    * 'aé😀' fixtures compile and pass); the same Scala strings feed both
    * dialects, and Verify escapes them to pure-ASCII \\uXXXX JSON for the
    * DuckDB side. Repair order matters: repairing "â€œ" → U+201C before
    * "â€“" (whose third char IS U+201C) could synthesize a fresh en-dash
    * match on adversarial input, so the en-dash token repairs first. */
  private[graft] val mojiPairs: Seq[(String, String)] = Seq(
    // RIGHT SINGLE QUOTE U+2019 shipped as â€™ (E2 80 99 via CP1252)
    "â€™" -> "’",
    // EN DASH U+2013 shipped as â€“ (E2 80 93; 93 is CP1252 “)
    "â€“" -> "–",
    // LEFT DOUBLE QUOTE U+201C shipped as â€œ (E2 80 9C; 9C is CP1252 œ)
    "â€œ" -> "“",
    // e-acute U+00E9 shipped as Ã© (C3 A9)
    "Ã©" -> "é")
  private[graft] val replChar = "�"

  /** The repair chain as SQL (identical in both dialects — nested
    * `replace` in [[mojiPairs]] order). */
  private def mojiFixExpr(col: String): String =
    mojiPairs.foldLeft(col) { case (acc, (bad, good)) =>
      s"replace($acc, '$bad', '$good')"
    }

  /** Detect/repair scoring over any relation carrying (…, raw) — shared
    * verbatim by both engines (pure string ops) and exposed so the spec
    * drives the exact production chain on planted adversarial strings.
    * Adds `fixed`, `len_raw`, `moji_chars` (code points recovered by the
    * repair map: each 3→1 repair counts 2, each 2→1 counts 1) and
    * `repl_ct` (U+FFFD occurrences). */
  private[graft] def mojiScoreSql(src: String): String =
    s"""SELECT *,
       |  length(raw) AS len_raw,
       |  length(raw) - length(fixed) AS moji_chars,
       |  length(raw) - length(replace(raw, '$replChar', '')) AS repl_ct
       |FROM (SELECT *, ${mojiFixExpr("raw")} AS fixed FROM $src) f0""".stripMargin

  /** Full q248 SQL for one dialect: `mdfive` = the doc-keyed md5 spelling,
    * `hx(off)` = hex-pair-at-offset → BIGINT. Synthesis plants corruption
    * into ~40% of docs (30% double-encoded, 10% replacement chars) keyed
    * on the hash; the rollup reports per-source detection/repair rates and
    * the keep gate (replacement density ≤ 1%, the integer spelling
    * repl_ct·100 ≤ len). */
  private def mojiQuerySql(mdfive: String, hx: Int => String): String = {
    val m = mojiPairs.map(_._1)
    s"""WITH h0 AS (
       |  SELECT doc_id, source, text, $mdfive AS h FROM documents),
       |syn AS (
       |  SELECT doc_id, source, text,
       |         ${hx(1)} % 10 AS cls,
       |         1 + ${hx(3)} % 3 AS reps
       |  FROM h0),
       |planted AS (
       |  SELECT doc_id, source, cls,
       |    CASE
       |      WHEN cls <= 2 THEN
       |        concat(left(text, 40),
       |               CASE WHEN cls = 0 THEN '${m(0)}'
       |                    WHEN cls = 1 THEN '${m(2)}'
       |                    ELSE '${m(3)}' END,
       |               substring(text, 41, 60),
       |               CASE WHEN reps >= 2 THEN '${m(1)}' ELSE '' END,
       |               substring(text, 101))
       |      WHEN cls = 3 THEN
       |        concat(left(text, 25),
       |               repeat('$replChar', CAST(reps AS INT)),
       |               substring(text, 26))
       |      ELSE text END AS raw
       |  FROM syn),
       |sc AS (${mojiScoreSql("planted")})
       |SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS docs,
       |  CAST(SUM(CASE WHEN moji_chars > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS moji_docs,
       |  CAST(SUM(moji_chars) AS BIGINT) AS repaired_chars,
       |  CAST(SUM(CASE WHEN repl_ct > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS repl_docs,
       |  CAST(SUM(CASE WHEN repl_ct * 100 > len_raw THEN 1 ELSE 0 END)
       |       AS BIGINT) AS dropped_docs,
       |  CAST(SUM(CASE WHEN repl_ct * 100 <= len_raw THEN 1 ELSE 0 END)
       |       AS BIGINT) AS kept_docs
       |FROM sc GROUP BY source ORDER BY source""".stripMargin
  }

  /** q222's periodicity report over any (doc_id, text) frame — exposed so
    * the spec can prove the gate FIRES on synthetic loops (the fixture's
    * natural text never trips it). */
  private[graft] def periodicityOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val tk = Tables.spread(docs)
      .select($"doc_id", split(lower($"text"), " ").as("toks"))
      .select($"doc_id", $"toks", size($"toks").as("n"))
    val fr = tk
      .select($"doc_id", $"toks", $"n",
        explode(Canon.seq1(least(lit(8), $"n" - 1))).as("p"))
      .select($"doc_id", $"p",
        (size(filter(Canon.seq1($"n" - $"p"), i =>
          element_at($"toks", i) === element_at($"toks", i + $"p")))
          .cast(DoubleType) / ($"n" - $"p")).as("frac"))
    val w = Window.partitionBy($"doc_id").orderBy($"frac".desc, $"p".asc)
    val best = fr.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"doc_id", $"p", $"frac")
    docs.select($"doc_id")
      .join(best, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"p", lit(0)).cast(LongType).as("best_period"),
        (floor(coalesce($"frac", lit(0.0)) * 10000 + 0.5) / 10000)
          .as("period_frac"),
        when(coalesce($"frac", lit(0.0)) >= 0.9, 1).otherwise(0)
          .cast(IntegerType).as("is_loopy"))
  }

  /** q150/q206's shared prediction relation (doc_id, lang, lang_pred,
    * score): Cavnar-Trenkle rank profiles (top-40 trigrams per language,
    * weight 41−rank) scored by distinct-trigram overlap, argmax per doc.
    * Scale notes live at the q150 declaration. */
  /** q230's A-Res scoring + per-stratum top-k prune over any
    * (doc_id, lang, n_chars) frame: Efraimidis-Spirakis keys
    * ln(u)/weight with the md5-hash uniform draw, ranked per lang and
    * pruned to k — the WindowGroupLimit plan shape the query pins.
    * Output (lang, rnk, doc_id, n_chars, key); exposed private[graft] so
    * ScaleProbe measures the pruned-row volume of the exact production
    * shape (expected ~|langs|·k, constant in corpus size). */
  private[graft] def aresTopPerStratum(docs: DataFrame, k: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val scored = docs
      .select($"doc_id", $"lang", $"n_chars",
        (log((conv(substring(md5(concat(lit("ws:"),
          $"doc_id".cast(StringType)).cast(BinaryType)), 1, 8), 16, 10)
          .cast(DoubleType) + 0.5) / 4294967296.0) /
          $"n_chars".cast(DoubleType)).as("key"))
    val byLang = Window.partitionBy($"lang")
      .orderBy($"key".desc, $"doc_id")
    scored
      .withColumn("rnk", row_number().over(byLang).cast(LongType))
      .filter($"rnk" <= k)
  }

  private[graft] def langidPredictions(spark: SparkSession): DataFrame =
    Memo.cached(spark, "langid-pred")(langidPredictionsFresh(spark))

  /** Un-memoized q150 build (see [[langidPredictions]]; deterministic —
    * rank ties break on (count desc, trigram) and (score desc, plang)). */
  /** q241's per-doc span-vote counts (doc_id, lang, pred, nv): three equal
    * char spans scored against [[langidProfiles]], per-span argmax, votes
    * rolled up per doc. */
  private[graft] def mixedLanguageVotesFresh(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val base = Tables.spread(spark.table("documents"))
      .select($"doc_id", $"lang", lower($"text").as("txt"))
    val third = (length($"txt") / lit(3)).cast(IntegerType)
    val spans = base
      .select($"doc_id", $"lang", $"txt",
        explode(sequence(lit(0), lit(2))).as("s"))
      .select($"doc_id", $"lang", $"s",
        $"txt".substr($"s" * third + 1,
          when($"s" === 2, length($"txt")).otherwise(third)).as("seg"))
    val stg = spans
      .select($"doc_id", $"s", explode(array_distinct(
        transform(Canon.seq1(length($"seg") - 2),
          i => $"seg".substr(i, lit(3))))).as("tg"))
    val sc = stg.join(broadcast(langidProfiles(spark)), "tg")
      .groupBy($"doc_id", $"s", $"plang")
      .agg(sum($"w").as("score"))
    val wBest = Window.partitionBy($"doc_id", $"s")
      .orderBy($"score".desc, $"plang")
    val best = sc.withColumn("rn", row_number().over(wBest))
      .filter($"rn" === 1).select($"doc_id", $"s", $"plang")
    spans.as("sp")
      .join(best.as("b"),
        $"b.doc_id" === $"sp.doc_id" && $"b.s" === $"sp.s", "left")
      .select($"sp.doc_id".as("doc_id"), $"sp.lang".as("lang"),
        coalesce($"b.plang", lit("unknown")).as("pred"))
      .groupBy($"doc_id", $"lang", $"pred")
      .agg(count(lit(1)).as("nv"))
  }

  /** q150/q241's shared per-lang trigram profile (plang, tg, w): top-40
    * whole-doc trigrams per labeled lang, rank-weighted. Memoized —
    * consumed by the whole-doc prediction build AND the span-vote build. */
  private[graft] def langidProfiles(spark: SparkSession): DataFrame =
    Memo.cached(spark, "langid-prof")(langidProfilesFresh(spark))

  private[graft] def langidProfilesFresh(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val profileK = 40
    val tg = Tables.spread(spark.table("documents"))
      .select($"doc_id", $"lang", lower($"text").as("txt"))
      .select($"doc_id", $"lang", $"txt",
        explode(Canon.seq1(length($"txt") - 2)).as("i"))
      .select($"doc_id", $"lang", $"txt".substr($"i", lit(3)).as("tg"))
    val wProf = Window.partitionBy($"plang").orderBy($"c".desc, $"tg")
    tg.groupBy($"lang".as("plang"), $"tg")
      .agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(wProf))
      .filter($"rk" <= profileK)
      .select($"plang", $"tg", (lit(profileK + 1) - $"rk").as("w"))
  }

  private[graft] def langidPredictionsFresh(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val prof = langidProfiles(spark)
    // per-doc DISTINCT trigrams via a map-side array_distinct (not a
    // corpus-wide (doc_id, tg) distinct shuffle); the broadcast-profile
    // join then prunes to ≤ nlangs·K trigram keys, so the only scoring
    // shuffle carries matched rows
    val dtg = Tables.spread(spark.table("documents"))
      .select($"doc_id", lower($"text").as("txt"))
      .select($"doc_id", explode(array_distinct(
        transform(Canon.seq1(length($"txt") - 2),
          i => $"txt".substr(i, lit(3))))).as("tg"))
    val sc = dtg
      .join(broadcast(prof), "tg")
      .groupBy($"doc_id", $"plang")
      .agg(sum($"w").as("score"))
    val wBest = Window.partitionBy($"doc_id").orderBy($"score".desc, $"plang")
    val best = sc.withColumn("rn", row_number().over(wBest))
      .filter($"rn" === 1).select($"doc_id", $"plang", $"score")
    spark.table("documents").select($"doc_id", $"lang")
      .join(best, Seq("doc_id"), "left")
      .select($"doc_id", $"lang",
        coalesce($"plang", lit("unknown")).as("lang_pred"),
        coalesce($"score", lit(0L)).cast(LongType).as("score"))
  }

  /** The prediction relation's oracle twin (no ORDER BY — q150 appends its
    * own; q206 wraps it as a CTE). */
  private[graft] val langidOracleSql: String =
    """WITH tg AS (
      |  SELECT doc_id, lang, substr(txt, i, 3) AS tg
      |  FROM (SELECT doc_id, lang, lower(text) AS txt,
      |          unnest(range(1, greatest(length(text) - 1, 1))) AS i
      |        FROM documents) t),
      |prof AS (
      |  SELECT plang, tg, 41 - rk AS w FROM (
      |    SELECT lang AS plang, tg,
      |           row_number() OVER (PARTITION BY lang
      |                              ORDER BY COUNT(*) DESC, tg ASC) AS rk
      |    FROM tg GROUP BY lang, tg) p
      |  WHERE rk <= 40),
      |dtg AS (SELECT DISTINCT doc_id, tg FROM tg),
      |sc AS (
      |  SELECT d.doc_id, p.plang, SUM(p.w) AS score
      |  FROM dtg d JOIN prof p USING (tg)
      |  GROUP BY d.doc_id, p.plang),
      |best AS (
      |  SELECT doc_id, plang, score FROM (
      |    SELECT doc_id, plang, score,
      |           row_number() OVER (PARTITION BY doc_id
      |                              ORDER BY score DESC, plang ASC) AS rn
      |    FROM sc) b
      |  WHERE rn = 1)
      |SELECT d.doc_id AS doc_id, d.lang AS lang,
      |       coalesce(b.plang, 'unknown') AS lang_pred,
      |       CAST(coalesce(b.score, 0) AS BIGINT) AS score
      |FROM documents d LEFT JOIN best b USING (doc_id)""".stripMargin

  /** Learned-merge count for q192/q200. */
  private[graft] val bpeRounds = 3

  /** q201's minimum in-source count for a keyword candidate. */
  private[graft] val keywordMinCount = 5

  /** The shared BPE oracle CTE chain: w0 (distinct words as char arrays) +
    * per-round pair counts pcR, argmax mR, merged words wR. Unreferenced
    * tail CTEs are pruned by DuckDB, so q192 (merges only) and q200 (the
    * final w$rounds) share one spelling. */
  private[graft] def bpeCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""px$r AS (SELECT c, syms, unnest(range(1, len(syms))) AS i
         |        FROM w${r - 1}),
         |pc$r AS (SELECT syms[i] AS a, syms[i + 1] AS b,
         |               CAST(SUM(c) AS BIGINT) AS n
         |        FROM px$r GROUP BY 1, 2),
         |m$r AS (SELECT a, b, n FROM pc$r ORDER BY n DESC, a, b LIMIT 1),
         |w$r AS (SELECT w.word, w.c,
         |        list_reduce(list_transform(w.syms, s -> [s]),
         |          (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.a
         |                                AND x[1] = m.b
         |                      THEN list_append(array_pop_back(acc),
         |                                       m.a || m.b)
         |                      ELSE list_concat(acc, x) END) AS syms
         |       FROM w${r - 1} w CROSS JOIN m$r m)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS c,
       |         list_transform(range(1, len(word) + 1),
       |                        i -> substr(word, i, 1)) AS syms
       |  FROM (SELECT unnest($tokSql) AS word FROM documents)
       |  WHERE len(word) > 0 GROUP BY word),
       |$roundCtes""".stripMargin
  }

  /** Learn `rounds` BPE merges over the corpus's distinct-word relation.
    * Returns (merge rows: merge_rank/sym_a/sym_b/pair_count, final words:
    * word/c/syms). The greedy leftmost merge is the q192 fold — NOTE the
    * fold is single-state (one array), safe from the DuckDB in-place
    * aliasing hazard (CLAUDE.md). Rounds localCheckpoint per the fixpoint
    * materialization rule; the final merged-word relation is skipped
    * unless requested (it costs one extra pass). */
  /** q192/q200's shared BPE training run over the fixture corpus — ONE
    * [[bpeLearn]] (with final words materialized) feeding both consumers,
    * each half memoized per (session, fixture dir). The tuple builder is
    * lazy so memo hits never re-train; the flag-off variant q192 used to
    * call produces the identical merge table (the flag only skips the
    * final-words materialization), which DedupSpec pins. */
  private[graft] def bpeShared(spark: SparkSession): (DataFrame, DataFrame) = {
    lazy val built =
      bpeLearn(spark.table("documents"), bpeRounds, needFinalWords = true)
    (Memo.cached(spark, "bpe-merges")(built._1),
      Memo.cached(spark, "bpe-words")(built._2))
  }

  private[graft] def bpeLearn(docs: DataFrame, rounds: Int,
      needFinalWords: Boolean): (DataFrame, DataFrame) = {
    import docs.sparkSession.implicits._
    val words0 = docs
      .select(explode(split(lower($"text"), " ")).as("word"))
      .filter(length($"word") > 0)
      .groupBy($"word").agg(count(lit(1)).cast(LongType).as("c"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .localCheckpoint()
    def pairCounts(w: DataFrame): DataFrame = w
      .select($"c", $"syms",
        explode(Canon.seq1(size($"syms") - 1)).as("i"))
      .select(element_at($"syms", $"i").as("a"),
        element_at($"syms", $"i" + 1).as("b"), $"c")
      .groupBy($"a", $"b").agg(sum($"c").cast(LongType).as("n"))
    val mergeFold =
      """aggregate(syms, cast(array() as array<string>),
        |  (acc, s) -> CASE WHEN size(acc) > 0
        |                        AND element_at(acc, -1) = a AND s = b
        |              THEN concat(slice(acc, 1, size(acc) - 1),
        |                          array(concat(a, b)))
        |              ELSE concat(acc, array(s)) END)""".stripMargin
    var w = words0
    var out: DataFrame = null
    for (r <- 1 to rounds) {
      val m = pairCounts(w).orderBy($"n".desc, $"a", $"b").limit(1)
        .localCheckpoint()
      val row = m.select(lit(r).as("merge_rank"), $"a".as("sym_a"),
        $"b".as("sym_b"), $"n".as("pair_count"))
      out = if (out == null) row else out.unionByName(row)
      if (r < rounds || needFinalWords)
        w = w.crossJoin(broadcast(m))
          .select($"word", $"c", expr(mergeFold).as("syms"))
          .localCheckpoint()
    }
    (out, w)
  }

  /** q169's build-time phrase blocklist (lowercase; single quotes would
    * need escaping in the SQL twin — none used). */
  private[graft] val blockPhrases = Seq(
    "table value", "batch window", "slow fast", "merge batch",
    "key scan", "data query")

  /** q176's per-doc deflate measurement: (raw_bytes, deflated_bytes) with
    * one Deflater reused (reset) per partition — zlib output is a pure
    * function of (input, level, strategy), so reuse and partitioning don't
    * change a single byte. Level 6 = zlib default. */
  private[graft] def deflatedSize(bytes: Array[Byte],
      defl: java.util.zip.Deflater): Long = {
    defl.reset()
    defl.setInput(bytes)
    defl.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!defl.finished()) total += defl.deflate(buf)
    total
  }

  /** Per-doc compression-ratio threshold below which q176 flags a document
    * as machine-repetitive (Gopher/C4-class heuristic: natural text
    * deflates to ~0.35–0.6 of raw; templated/looping text goes far lower).
    * The fixture's word-salad corpus clusters tightly at 0.47–0.52, so the
    * committed knob sits inside that band to keep BOTH branches of the
    * gate live under test — production would set it from a corpus
    * percentile (the q127 pattern). */
  private[graft] val repetitiveRatio = 0.48

  /** q157's trigram-index candidate stage: (doc_id, needle) pairs whose
    * distinct-trigram intersection covers the whole needle — a lossless
    * superset of the true contains() matches for needles ≥ 3 chars.
    * Exposed private[graft] for ScaleProbe's candidate-growth line. */
  private[graft] def trigramCandidates(docs: DataFrame,
      needles: Seq[String]): DataFrame = {
    // the losslessness argument (doc ⊇ needle ⇒ doc trigrams ⊇ needle
    // trigrams) holds only for needles of at least one full trigram: a
    // shorter needle's sliding(3) yields the needle itself, which no true
    // 3-char posting ever equals, silently under-matching
    require(needles.forall(_.length >= 3),
      s"trigram index needs needles >= 3 chars: $needles")
    import docs.sparkSession.implicits._
    val ntriDf = needles
      .flatMap(nd => nd.sliding(3).toSeq.distinct.map(t => (nd, t)))
      .toDF("needle", "tri")
    val ncnt = needles.map(nd => (nd, nd.sliding(3).toSeq.distinct.size))
      .toDF("needle", "ntri")
    val docTri = Tables.spread(docs)
      .select($"doc_id", lower($"text").as("lt"))
      .select($"doc_id", explode(array_distinct(
        transform(Canon.seq1(length($"lt") - 2),
          i => $"lt".substr(i, lit(3))))).as("tri"))
    docTri.join(broadcast(ntriDf), "tri")
      .groupBy($"doc_id", $"needle").agg(count(lit(1)).as("nmatch"))
      .join(broadcast(ncnt), "needle")
      .filter($"nmatch" === $"ntri")
      .select($"doc_id", $"needle")
  }

  /** q226's deterministic span-corruption manifest for any (doc_id, text)
    * corpus — (doc_id, span_idx, start_tok, span_len, n_tokens); see the
    * q226 declaration for the strata/draw scheme. Exposed private[graft]
    * for the PipelineOpsSpec invariant replay (in-stratum containment ⇒
    * non-overlap, mask-budget tracking). */
  private[graft] def spanCorruptionOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val base = docs
      .select($"doc_id",
        size(split(lower($"text"), " ")).cast(LongType).as("n"))
      .withColumn("m", expr("n * 15 div 100"))
      .filter($"m" >= 1)
      .withColumn("k", greatest(lit(1L), expr("m div 3")))
      .select($"doc_id", $"n", $"k",
        explode(Canon.seq1($"k".cast(IntegerType))).as("i"))
    base
      .withColumn("lo", expr("(i - 1) * n div k + 1"))
      .withColumn("hi", expr("i * n div k"))
      .withColumn("len", $"hi" - $"lo" + 1)
      .withColumn("sl", least(lit(3L), $"len"))
      .withColumn("draw", conv(substring(md5(
          concat($"doc_id".cast(StringType), lit(":"),
            $"i".cast(StringType)).cast(BinaryType)), 1, 8), 16, 10)
        .cast(LongType))
      .select($"doc_id", $"i".cast(LongType).as("span_idx"),
        ($"lo" + pmod($"draw", $"len" - $"sl" + 1)).as("start_tok"),
        $"sl".as("span_len"), $"n".as("n_tokens"))
  }

  /** q219's semantic chunk rows for any (doc_id, text) corpus: boundary
    * candidates where adjacent w=5 token windows' Jaccard dissimilarity
    * crosses 0.9, greedily thinned to ≥ 20-token chunks by a left fold, then
    * exploded into (chunk_idx, start_tok, end_tok, n_toks) rows. Exposed
    * private[graft] so ScaleProbe can measure cut-count growth on synthetic
    * corpora — cuts per doc are bounded by n_tokens/gap, so total chunk
    * rows track corpus size (≈ linear), never its square. */
  private[graft] def semanticChunkRowsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val w = 5
    val gap = 20
    val base = Tables.spread(docs)
      .select($"doc_id", split(lower($"text"), " ").as("toks"))
      .select($"doc_id", $"toks", size($"toks").as("n"))
    val cands = base.select($"doc_id", $"n",
      filter(
        transform(Canon.seq1($"n" - (2 * w - 1)), j => j + (w - 1)),
        i => {
          val prev = array_distinct(slice($"toks", i - (w - 1), lit(w)))
          val nxt = array_distinct(slice($"toks", i + 1, lit(w)))
          (lit(1.0) -
            size(array_intersect(prev, nxt)).cast(DoubleType) /
              size(array_union(prev, nxt))) >= lit(0.9)
        }).as("cands"))
    val kept = cands.select($"doc_id", $"n",
      aggregate($"cands",
        struct(lit(0).as("last"),
          array().cast(ArrayType(IntegerType)).as("ks")),
        (acc, i) => {
          val keep = i - acc.getField("last") >= gap
          struct(
            when(keep, i).otherwise(acc.getField("last")).as("last"),
            when(keep, concat(acc.getField("ks"), array(i)))
              .otherwise(acc.getField("ks")).as("ks"))
        }).getField("ks").as("ks"))
    kept.select($"doc_id",
        posexplode(zip_with(
          concat(array(lit(1)), transform($"ks", k => k + 1)),
          concat($"ks", array($"n")),
          (s, e) => struct(s.as("s"), e.as("e")))).as(Seq("ci", "c")))
      .select($"doc_id", ($"ci" + 1).cast(LongType).as("chunk_idx"),
        $"c.s".cast(LongType).as("start_tok"),
        $"c.e".cast(LongType).as("end_tok"),
        ($"c.e" - $"c.s" + 1).cast(LongType).as("n_toks"))
  }

  /** q214's chunked cumulative-weight intervals over a (token, wt) vocab —
    * the q155 two-phase prefix-sum shape: chunk = 2-char token prefix
    * (monotone in token order, so per-chunk running sum + chunk-offset
    * fold IS one global left fold re-associated identically on both
    * engines), offsets fold over the prefix-alphabet-sized relation.
    * Returns (offsets(chunk, off, hi_off), cum(token, chunk, lo, hi)).
    * `pin` materializes the two multi-consumer stages (localCheckpoint in
    * the query; identity in PlanSpec, which asserts the window shapes on
    * the un-truncated lineage). */
  private[graft] def negSampleIntervals(w: DataFrame,
      pin: DataFrame => DataFrame = _.localCheckpoint())
      : (DataFrame, DataFrame) = {
    import w.sparkSession.implicits._
    val localW = Window.partitionBy($"chunk").orderBy($"token")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lc = pin(w.withColumn("chunk", substring($"token", 1, 2))
      .withColumn("lcum", sum($"wt").over(localW)))
    val chunkOrd = Window.orderBy($"chunk") // prefix-alphabet-sized
    val offsets = pin(lc.groupBy($"chunk")
      .agg(max_by($"lcum", $"token").as("ctot"))
      .withColumn("off", coalesce(sum($"ctot").over(
        chunkOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .select($"chunk", $"off", ($"off" + $"ctot").as("hi_off")))
    val cum = lc.join(broadcast(offsets.select($"chunk", $"off")),
        Seq("chunk"))
      .withColumn("hi", $"off" + $"lcum")
      .select($"token", $"chunk", ($"hi" - $"wt").as("lo"), $"hi")
    (offsets, cum)
  }

  /** q118's per-doc unigram/bigram repetition relation (u ⋈ b), shared
    * with the q136 pipeline capstone: doc_id, n_tokens, top_uni, dup_toks,
    * top_bi, n_bigrams. */
  private def repetitionJoined(spark: SparkSession): DataFrame =
    Memo.cached(spark, "repetition")(repetitionJoinedFresh(spark))

  private def repetitionJoinedFresh(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val u = spark.table("documents")
      .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").cast("bigint").as("n_tokens"),
        max($"c").cast("bigint").as("top_uni"),
        sum(when($"c" > 1, $"c").otherwise(0)).cast("bigint").as("dup_toks"))
    val b = spark.table("documents")
      .select($"doc_id", split(lower($"text"), " ").as("toks"))
      .select($"doc_id", explode(transform(Canon.seq1(size($"toks") - 1),
        i => concat(element_at($"toks", i), lit(" "),
          element_at($"toks", i + 1)))).as("bigram"))
      .groupBy($"doc_id", $"bigram").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(max($"c").cast("bigint").as("top_bi"),
        sum($"c").cast("bigint").as("n_bigrams"))
    u.join(b, Seq("doc_id"), "left")
  }

  /** q126/q127's shared linear-classifier inference: (doc_id, lang, ntok,
    * score) with score = w·(stop_ratio, rep_share, cpw) + b over
    * exact-rational features, association order mirrored in the oracles. */
  private def classifierScores(spark: SparkSession): DataFrame =
    Memo.cached(spark, "clf-scores")(classifierScoresFresh(spark))

  private def classifierScoresFresh(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val f = spark.table("documents")
      .select($"doc_id", $"lang", $"n_chars",
        split(lower($"text"), " ").as("toks"))
      .select($"doc_id", $"lang", size($"toks").cast(LongType).as("ntok"),
        (size(filter($"toks", w => w.isin("the", "a", "of", "and", "is")))
          .cast(DoubleType) / size($"toks")).as("stop_ratio"),
        ($"n_chars".cast(DoubleType) / size($"toks")).as("cpw"))
    val rr = spark.table("documents")
      .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg((max($"c").cast(DoubleType) / sum($"c")).as("rep"))
    f.join(rr, "doc_id")
      .select($"doc_id", $"lang", $"ntok",
        (((lit(8.0) * $"stop_ratio" - lit(6.0) * $"rep")
          + lit(0.5) * ($"cpw" - 5.5)) + 0.1).as("score"))
  }

  /** Winnowing selection stage shared by q66b/q66c: (doc_id, pos, sel)
    * rows, one per valid w=4 window, BEFORE dedup (q66b dedupes inside its
    * collect_set, q66c with a distinct ahead of the pair join).
    *
    * Explodes a cheap INDEX sequence and builds each shingle AFTER the
    * Generate from the carried token array — exploding the shingle array
    * itself makes InferFiltersFromGenerate push a filter containing the
    * fully-inlined interpreted transform (with split() re-evaluated per
    * element_at) into the scan: measured 4.5 s vs 0.34 s at sf0.1 for the
    * same 260k rows. */
  /** q66b/q66c's shared DISTINCT (doc_id, sel) fingerprint relation,
    * memoized: the windowed-min selection is the expensive stage and
    * feeds q66b's digest rollup, q66c's hot-set aggregate, AND both of
    * q66c's join sides (memo == fresh pinned in DedupSpec; the
    * partition-invariance smoke rebuilds it cold). */
  private def winnowedDistinct(spark: SparkSession): DataFrame =
    Memo.cached(spark, "winnow-sels")(
      winnowedDistinctOf(spark.table("documents")))

  private[graft] def winnowedDistinctOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    winnowedSelectionsOf(docs).select($"doc_id", $"sel").distinct()
  }

  private[graft] def winnowedSelectionsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val g = Tables.spread(docs)
      .select($"doc_id", split(lower($"text"), " ").as("toks"))
      .select($"doc_id", $"toks",
        explode(Canon.seq1(size($"toks") - 2)).as("i"))
      .select($"doc_id", ($"i" - 1).as("pos"), (size($"toks") - 2).as("cnt"),
        md5(concat_ws(" ", element_at($"toks", $"i"),
          element_at($"toks", $"i" + 1), element_at($"toks", $"i" + 2))
          .cast(BinaryType)).as("h"))
    val win = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.currentRow, 3)
    g.withColumn("sel", min($"h").over(win))
      .filter($"pos" + 4 <= $"cnt")
      .select($"doc_id", $"pos", $"sel")
  }

  /** Scale-safe per-language sequence packing (q59f): a distributed prefix
    * sum in two phases instead of one `PARTITION BY lang` window (whose
    * parallelism equals the number of languages — ~3 tasks at any corpus
    * size). Phase 1: chunk each language by doc_id range (chunk =
    * doc_id / chunkW, monotone in the pack order) and run the running sum
    * inside each ≤chunkW-row (lang, chunk) window — parallelism now scales
    * with corpus / chunkW. Phase 2: per-chunk token totals (a groupBy that
    * reuses phase 1's (lang, chunk) partitioning) are prefix-summed into
    * exclusive offsets — a window over only n/chunkW metadata rows — and
    * broadcast-joined back; global cum = chunk offset + local cum, provably
    * equal to the single-window formulation because chunk order extends
    * doc_id order. The oracle keeps the window spelling: same bins. */
  private[graft] def packBins(docs: DataFrame, binSize: Int = 4096,
      chunkW: Int = 512): DataFrame = {
    import docs.sparkSession.implicits._
    val t = docs.select($"doc_id", $"lang",
      size(split(lower($"text"), " ")).as("toks"),
      floor($"doc_id" / chunkW).as("chunk"))
    val local = Window.partitionBy($"lang", $"chunk").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prior = Window.partitionBy($"lang").orderBy($"chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy($"lang", $"chunk").agg(sum($"toks").as("ctot"))
      .withColumn("off", coalesce(sum($"ctot").over(prior), lit(0L)))
      .select($"lang", $"chunk", $"off")
    t.withColumn("lcum", sum($"toks").over(local))
      .join(broadcast(offsets), Seq("lang", "chunk"))
      .select($"lang",
        floor(($"off" + $"lcum" - $"toks").cast(DoubleType) / binSize)
          .cast(IntegerType).as("bin"),
        $"toks")
      .groupBy($"lang", $"bin")
      .agg(count(lit(1)).as("n_docs"),
        sum($"toks").cast(LongType).as("bin_tokens"))
      .orderBy($"lang", $"bin")
  }

  /** Document-frequency cap for the MOSS match stage (q66c): a winnowed
    * fingerprint selected by more than this many documents is boilerplate
    * and is dropped before the pair join — same degenerate-bucket class as
    * DedupQueries.hotShingleDfCap, and winnowing AMPLIFIES it (a shared
    * boilerplate span's minimum hash wins its window in every doc that
    * contains it). */
  private[graft] val matchDfCap = 16

  /** MOSS match pairs over df-capped winnowed fingerprints (q66c; exposed
    * private[graft] for DedupSpec's degenerate-corpus case and ScaleProbe's
    * candidate-growth measurement). The hot set is Zipf-small → broadcast
    * anti-join; every surviving fingerprint bucket holds ≤ dfCap docs, so
    * pair volume is ≤ df·cap/2 per key — linear in corpus at fixed cap. */
  private[graft] def winnowedMatches(docs: DataFrame, dfCap: Int): DataFrame =
    // The windowed-min selection is the expensive stage and feeds the hot-set
    // aggregate plus both join sides of sf (up to 4 consumers): materialize it
    // once (same multi-consumer rule as q183's pairs, DedupQueries.scala:1295).
    winnowedMatchesFrom(winnowedDistinctOf(docs).localCheckpoint(), dfCap)

  /** Pair scoring over a prebuilt distinct fingerprint relation. */
  private[graft] def winnowedMatchesFrom(sels: DataFrame,
      dfCap: Int): DataFrame = {
    import sels.sparkSession.implicits._
    val hot = sels.groupBy($"sel").agg(count(lit(1)).as("df"))
      .filter($"df" > dfCap).select($"sel")
    val sf = sels.join(broadcast(hot), Seq("sel"), "left_anti")
    sf.as("a").join(sf.as("b"),
        $"a.sel" === $"b.sel" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .agg(count(lit(1)).cast(LongType).as("shared_fps"))
      .filter($"shared_fps" >= 2)
      .orderBy($"id_a", $"id_b")
  }
}
