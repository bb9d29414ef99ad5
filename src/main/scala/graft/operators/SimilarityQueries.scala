package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.{GraftQuery, QueryModule}
import graft.sources.Tables

/** Similarity search over `embeddings` (SURVEY.md §2C): exact cosine top-k
  * (the ground-truth baseline), exact threshold similarity join, banded
  * random-hyperplane LSH ANN (the 100 TB path), and IVF-style partition
  * probing.
  *
  * The reference gateway relays whatever vector workload its TiDB backends
  * speak without interpreting it (/root/reference/gateway/relay.go:12-30);
  * this module is the driver-mandated Layer-C surface built Spark-first.
  *
  * Determinism: dot products fold left-to-right over the array in BOTH
  * engines (Spark `aggregate` HOF; DuckDB `list_dot_product` over DOUBLE[]),
  * and every scored query rounds to 4 decimals before ranking, so exact
  * variants are fully oracle-checkable. LSH hyperplanes come from a fixed
  * in-code LCG (no RNG at runtime) — ANN variants are rows-only + recall
  * property tests (SimilaritySpec).
  *
  * Scale design: query side is always the small side → `broadcast()`; the
  * corpus scan stays partition-parallel with no shuffle until the final
  * per-query top-k (shuffle key = query id). The LSH variant replaces the
  * all-pairs product with equi-joins on (band, bucket) — candidate count is
  * per-bucket quadratic only, which is the linear-shuffle ANN plan.
  */
object SimilarityQueries extends QueryModule {

  /** Array[Float] column → Array[Double] (cosine math in double precision,
    * matching the oracle's CAST(embedding AS DOUBLE[])). */
  private def toD(c: Column): Column = transform(c, _.cast(DoubleType))

  /** Left-to-right fold dot product — same association order as DuckDB's
    * list_dot_product, so results agree bitwise before rounding. Native
    * codegen'd expression (graft.functions.VectorExpressions.DotProduct);
    * the interpreted HOF equivalent `aggregate(zip_with(a,b,_*_),0d,_+_)`
    * computes the identical value ~10× slower. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotd(a, b)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Pre-normalized corpus (q85's Spark-ML path only — the ML VectorUDT
    * conversion boxes anyway). The exact-scoring queries below do NOT use
    * this: r02 fed the BNLJ `transform()`-built boxed arrays and regressed
    * q81 6.6× (VERDICT r02 §wrong-1). */
  private def normalized(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Tables.spread(embeddingsD(spark))
      .withColumn("n", sqrt(dot($"emb", $"emb")))
      .select($"vec_id", transform($"emb", x => x / $"n").as("emb"))
  }

  /** The exact-scoring hot-path shape: RAW parquet `array<float>` vectors
    * (primitive UnsafeArrayData straight off the scan — graft_dot widens
    * each element to double, an exact conversion) plus the norm precomputed
    * ONCE per vector as a scalar column. Cosine of a pair is then a single
    * codegen'd dot + one multiply/divide: `dot(a,b) / (na*nb)`. */
  private def withNorm(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Tables.spread(spark.table("embeddings"))
      .select($"vec_id", $"embedding",
        sqrt(dot($"embedding", $"embedding")).as("n"))
  }

  private val withNormSql =
    """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
      |       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                             CAST(embedding AS DOUBLE[]))) AS n
      |FROM embeddings""".stripMargin

  /** Input to the exact all-pairs validators (q81/q89): the full corpus by
    * default (fixture scale), or a deterministic 1-in-`oneIn` hash sample —
    * a scan-parallel xxhash64 filter, no shuffle, no RNG — so at 100 TB the
    * quadratic pair stage runs over a bounded slice and stays a VALIDATOR
    * for the LSH prod paths (q82/q75) instead of a corpus-scale job.
    * SimilarityDedupSpec asserts the sampled pair set is the restriction of
    * the full one. */
  private[graft] def pairStage(spark: SparkSession, oneIn: Int = 1): DataFrame = {
    import spark.implicits._
    val e = withNorm(spark)
    if (oneIn <= 1) e else e.filter(pmod(xxhash64($"vec_id"), lit(oneIn)) === 0)
  }

  /** 16 fixed hyperplanes × 64 dims from a seeded LCG (build-time constant —
    * the deterministic stand-in for the usual Gaussian draws). */
  private val numPlanes = 16
  private val dims = 64
  private lazy val planes: Array[Array[Double]] = {
    var s = 42L
    Array.fill(numPlanes, dims) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
  }

  /** Sign-bucket id for band `b` (4 planes per band): 4 sign bits packed. */
  private def bandBucket(emb: Column, band: Int): Column =
    (0 until 4).map { r =>
      val p = planes(band * 4 + r)
      val planeLit = array(p.map(lit): _*)
      when(dot(emb, planeLit) > 0d, lit(1 << r)).otherwise(lit(0))
    }.reduce(_ + _)

  private def embeddingsD(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.table("embeddings").select($"vec_id", toD($"embedding").as("emb"))
  }

  /** Exact cosine top-5 per probe WITH the rank column (qid, cid, cos, rn)
    * — q80 surfaces it, q218's recall eval consumes the ranks. Probe side
    * broadcast; corpus scanned once map-side; the only shuffle is the
    * per-probe top-k. */
  private def exactTop5Ranked(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val e = withNorm(spark)
    val probes = e.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qemb"), $"n".as("qn"))
    val scored = e.join(broadcast(probes), $"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("cid"),
        graft.api.Canon.r4(dot($"qemb", $"embedding") / ($"qn" * $"n")).as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid".asc)
    scored.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
  }

  /** Banded sign-LSH ANN top-5 per probe WITH the rank column — q82's
    * pipeline (equi-join candidates, never a product), shared with q218. */
  private def annTop5Ranked(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cands = annCandidatesOf(embeddingsD(spark))
    val scored = cands.select($"qid", $"cid",
      (round(cosine($"qemb", $"cemb"), 4) + 0).as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid".asc)
    scored.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
  }

  /** Exact cosine top-5 per probe — shared by q80 (window formulation) and
    * q84 (UDAF formulation): identical rounding, ranking and tiebreak, so
    * both hash-match this one oracle. Cosine is a free double → rounded with
    * the IEEE floor pattern on both engines (CLAUDE.md ROUND invariant). */
  private val exactTopCtes =
    s"""e AS ($withNormSql),
       |s AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS cid,
       |         ${graft.api.Canon.Oracle.r4("(list_dot_product(a.emb, b.emb) / (a.n * b.n))")} AS cos
       |  FROM e a JOIN e b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < 10),
       |exranked AS (
       |  SELECT qid, cid, cos,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) rn
       |  FROM s)""".stripMargin

  private val topkOracleSql =
    s"""WITH $exactTopCtes
       |SELECT qid, cid, cos FROM exranked
       |WHERE rn <= 5
       |ORDER BY qid, cid""".stripMargin

  /** Oracle CTE chain replaying the whole banded sign-LSH ANN pipeline,
    * ending `annranked`(qid, cid, cos, rn) — shared by q82 and the q218
    * recall eval (the SQL twin embeds the plane literals; Double.toString
    * round-trips exactly). CTE names are `a`-prefixed so the chain composes
    * with [[exactTopCtes]] in one WITH. */
  private def annTopCtes: String = {
    def planeLit(i: Int): String =
      planes(i).map(_.toString).mkString("[", ", ", "]")
    def bucketSql(i0: Int): String = (0 until 4).map { r =>
      s"(CASE WHEN list_dot_product(aemb, ${planeLit(i0 + r)}) > 0 THEN ${1 << r} ELSE 0 END)"
    }.mkString(" + ")
    val corpusSelects = (0 until 4).map { b =>
      s"SELECT vec_id, aemb, $b AS band, ${bucketSql(b * 4)} AS bucket FROM ae"
    }.mkString("\nUNION ALL\n")
    s"""ae AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS aemb FROM embeddings),
       |banded AS (
       |$corpusSelects),
       |aprobes AS (
       |  SELECT vec_id AS qid, aemb AS qemb, band, xor(bucket, p.x) AS bucket
       |  FROM banded, (SELECT unnest([0, 1, 2, 4, 8]) AS x) p
       |  WHERE vec_id < 10),
       |acands AS (
       |  SELECT DISTINCT p.qid, c.vec_id AS cid, p.qemb, c.aemb AS cemb
       |  FROM banded c JOIN aprobes p
       |    ON c.band = p.band AND c.bucket = p.bucket AND c.vec_id <> p.qid),
       |ascored AS (
       |  SELECT qid, cid,
       |         ROUND(list_dot_product(qemb, cemb) /
       |               (sqrt(list_dot_product(qemb, qemb)) *
       |                sqrt(list_dot_product(cemb, cemb))), 4) + 0 AS cos
       |  FROM acands),
       |annranked AS (
       |  SELECT qid, cid, cos,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) rn
       |  FROM ascored)""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(

    // Exact cosine top-5 neighbors for each of 10 probe vectors — the
    // ground-truth ANN baseline. Probe side broadcast; corpus scanned once,
    // map-side scored; the only shuffle is the per-probe top-k (key = qid).
    q("q80_cosine_topk", topkOracleSql) { spark =>
      import spark.implicits._
      exactTop5Ranked(spark)
        .select($"qid", $"cid", $"cos")
        .orderBy($"qid", $"cid")
    },

    // Exact similarity join: all pairs with cosine ≥ 0.4 — the quadratic
    // ground truth the LSH join approximates. pairStage bounds the input:
    // full corpus at fixture scale, a deterministic hash sample at 100 TB
    // (q82 is the prod path; this stays a validator).
    q("q81_cosine_pairs",
      s"""WITH e AS ($withNormSql),
         |s AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${graft.api.Canon.Oracle.r4("(list_dot_product(a.emb, b.emb) / (a.n * b.n))")} AS cos
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cos FROM s WHERE cos >= 0.4
         |ORDER BY id_a, id_b""".stripMargin) { spark =>
      import spark.implicits._
      val e = pairStage(spark)
      val a = e.select($"vec_id".as("id_a"), $"embedding".as("ea"), $"n".as("na"))
      val b = e.select($"vec_id".as("id_b"), $"embedding".as("eb"), $"n".as("nb"))
      a.join(b, $"id_a" < $"id_b")
        .select($"id_a", $"id_b",
          graft.api.Canon.r4(dot($"ea", $"eb") / ($"na" * $"nb")).as("cos"))
        .filter($"cos" >= 0.4)
        .orderBy($"id_a", $"id_b")
    },

    // ANN top-5 via banded sign-LSH: 4 bands × 4 hyperplane sign bits, with
    // multiprobe on the query side (each probe also searches the 4
    // Hamming-1 neighbor buckets per band — near-misses on one hyperplane
    // are the dominant loss mode). Candidates come from equi-joins on
    // (band, bucket) — no all-pairs product; recall vs q80 is
    // property-tested in SimilaritySpec. The hyperplanes are fixed in-code
    // constants and the sign/bucket math is exact double arithmetic shared
    // by both engines, so the whole ANN pipeline is oracle-checked (the SQL
    // twin embeds the plane literals — Double.toString round-trips exactly).
    q("q82_ann_lsh_topk",
      s"""WITH $annTopCtes
         |SELECT qid, cid, cos FROM annranked
         |WHERE rn <= 5
         |ORDER BY qid, cid""".stripMargin) { spark =>
      import spark.implicits._
      annTop5Ranked(spark)
        .select($"qid", $"cid", $"cos")
        .orderBy($"qid", $"cid")
    },

    // ANN quality eval AS AN OPERATOR (the q202 pattern for the vector
    // path): recall@5 and reciprocal rank of the banded sign-LSH ANN (q82)
    // against the exact cosine baseline (q80), per probe. Both rankings
    // are deterministic (fixed in-code hyperplanes, rounded scores, cid
    // tiebreaks), so unlike the usual randomized-ANN rows-only contract
    // this eval is FULLY oracle-checked — DuckDB replays both pipelines
    // and the same join/rollup. rr = 1/first-relevant-rank (0 when the ANN
    // top-5 misses all true neighbors); recall/rr are exact small-integer
    // ratios, floor-surfaced. Scale: both sides are the production top-k
    // pipelines; the eval itself joins two ≤5·|probes|-row relations.
    q("q218_ann_recall_eval",
      s"""WITH $exactTopCtes,
         |$annTopCtes,
         |ex AS (SELECT qid, cid FROM exranked WHERE rn <= 5),
         |an AS (SELECT qid, cid, rn AS rb FROM annranked WHERE rn <= 5),
         |j AS (
         |  SELECT an.qid, an.rb,
         |         CASE WHEN ex.cid IS NOT NULL THEN 1 ELSE 0 END AS rel
         |  FROM an LEFT JOIN ex ON ex.qid = an.qid AND ex.cid = an.cid),
         |per AS (
         |  SELECT qid, CAST(SUM(rel) AS BIGINT) AS n_hits,
         |         MIN(CASE WHEN rel = 1 THEN rb END) AS fr
         |  FROM j GROUP BY qid),
         |qs AS (SELECT DISTINCT qid FROM ex)
         |SELECT q.qid,
         |  CAST(COALESCE(p.n_hits, 0) AS BIGINT) AS n_hits,
         |  floor(CAST(COALESCE(p.n_hits, 0) AS DOUBLE) * 10000 / 5 + 0.5)
         |    / 10000 AS recall5,
         |  CAST(COALESCE(p.fr, 0) AS BIGINT) AS first_rel_rank,
         |  CASE WHEN p.fr IS NULL THEN 0e0
         |       ELSE floor(1e0 / p.fr * 1000000 + 0.5) / 1000000 END AS rr
         |FROM qs q LEFT JOIN per p ON p.qid = q.qid
         |ORDER BY q.qid""".stripMargin) { spark =>
      import spark.implicits._
      val ex = exactTop5Ranked(spark).select($"qid", $"cid", lit(1).as("rel"))
      val an = annTop5Ranked(spark).select($"qid", $"cid", $"rn".as("rb"))
      val per = an.join(ex, Seq("qid", "cid"), "left")
        .select($"qid", $"rb", coalesce($"rel", lit(0)).as("rel"))
        .groupBy($"qid")
        .agg(sum($"rel").cast(LongType).as("n_hits"),
          min(when($"rel" === 1, $"rb")).as("fr"))
      ex.select($"qid").distinct()
        .join(per, Seq("qid"), "left")
        .select($"qid",
          coalesce($"n_hits", lit(0L)).cast(LongType).as("n_hits"),
          (floor(coalesce($"n_hits", lit(0L)).cast(DoubleType) * 10000 / 5
            + 0.5) / 10000).as("recall5"),
          coalesce($"fr", lit(0)).cast(LongType).as("first_rel_rank"),
          when($"fr".isNull, lit(0.0))
            .otherwise(floor(lit(1.0) / $"fr" * 1000000 + 0.5) / 1000000)
            .as("rr"))
        .orderBy($"qid")
    },

    // Exact top-5 again, but through the typed Aggregator UDAF instead of a
    // window sort: partial buffers hold ≤ k candidates, combine map-side,
    // and shuffle k rows per probe — the aggregation-based top-k that
    // replaces "sort the whole partition" at 100 TB. Same rounding/tiebreak
    // as q80 → shares q80's oracle (upgraded from rows-only in r01);
    // equality with q80 also asserted in SimilarityDedupSpec.
    q("q84_topk_udaf", topkOracleSql) { spark =>
      import spark.implicits._
      val topk = udaf(new graft.functions.TopKByScore(5))
      val e = withNorm(spark)
      val probes = e.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qemb"), $"n".as("qn"))
      e.join(broadcast(probes), $"vec_id" =!= $"qid")
        .select($"qid", $"vec_id".as("cid"),
          graft.api.Canon.r4(dot($"qemb", $"embedding") / ($"qn" * $"n")).as("cos"))
        .groupBy($"qid").agg(topk($"cid", $"cos").as("top"))
        .select($"qid", explode($"top").as("p"))
        .select($"qid", $"p._1".as("cid"), $"p._2".as("cos"))
        .orderBy($"qid", $"cid")
    },

    // Spark ML BucketedRandomProjectionLSH variant (SURVEY.md §2C): on
    // unit-normalized vectors, cosine ≥ 0.4 ⇔ Euclidean distance ≤
    // sqrt(2 − 2·0.4) ≈ 1.0954, so the seeded BRP similarity join
    // approximates exactly the q81 pair set — recall measured in
    // SimilarityDedupSpec. Randomized-but-seeded → rows-only in the gate.
    qRowsOnly("q85_ml_brp_pairs") { spark =>
      import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
      import org.apache.spark.ml.linalg.Vectors
      import spark.implicits._
      val toVec = udf((xs: Seq[Double]) => Vectors.dense(xs.toArray))
      // cache: the normalize pipeline would otherwise run once per join side
      val vecs = normalized(spark)
        .select($"vec_id", toVec($"emb").as("features")).cache()
      try {
        // bucketLength tuned small: unit-vector projections have std ≈ 1/√d,
        // so 0.25 splits the corpus into enough buckets that candidate volume
        // stays near-linear while the 5 OR'd tables keep recall high
        val lsh = new BucketedRandomProjectionLSH()
          .setInputCol("features").setOutputCol("hashes")
          .setBucketLength(0.25).setNumHashTables(5).setSeed(42L)
        val model = lsh.fit(vecs)
        model.approxSimilarityJoin(vecs, vecs, 1.0954, "dist")
          .select($"datasetA.vec_id".as("id_a"), $"datasetB.vec_id".as("id_b"),
            round(lit(1.0d) - $"dist" * $"dist" / 2.0d, 4).as("cos"))
          .filter($"id_a" < $"id_b")
          .orderBy($"id_a", $"id_b")
          .localCheckpoint() // materialize (small pair set), then drop caches
      } finally vecs.unpersist()
    },

    // Embedding-cosine near-dup dedup: the dedup-by-meaning end of the
    // similarity family — drop the larger id of every pair with cosine ≥
    // 0.45 (the fixture's max pairwise cosine is ~0.51, so the threshold
    // genuinely drops rows), keep the rest. Exact pair scoring here (the
    // oracle-checkable baseline) over the pairStage-bounded input; at
    // 100 TB the pair stage swaps to the banded-LSH candidates (q82
    // machinery) with identical downstream anti-join semantics.
    q("q89_cosine_neardup_dedup",
      s"""WITH e AS ($withNormSql),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id
         |  WHERE ${graft.api.Canon.Oracle.r4("(list_dot_product(a.emb, b.emb) / (a.n * b.n))")} >= 0.45)
         |SELECT v.vec_id, v.label
         |FROM embeddings v
         |WHERE v.vec_id NOT IN (SELECT id_b FROM pairs)
         |ORDER BY v.vec_id""".stripMargin) { spark =>
      import spark.implicits._
      val e = pairStage(spark)
      val a = e.select($"vec_id".as("id_a"), $"embedding".as("ea"), $"n".as("na"))
      val b = e.select($"vec_id".as("id_b"), $"embedding".as("eb"), $"n".as("nb"))
      val dropped = a.join(b, $"id_a" < $"id_b")
        .filter(graft.api.Canon.r4(dot($"ea", $"eb") / ($"na" * $"nb")) >= 0.45)
        .select($"id_b".as("vec_id")).distinct()
      spark.table("embeddings")
        .join(dropped, Seq("vec_id"), "left_anti")
        .select($"vec_id", $"label")
        .orderBy($"vec_id")
    },

    // IVF ANN with REAL learned centroids: deterministic k-means (k = 10;
    // init = first k vectors in md5(vec_id) order — a seeded shuffle both
    // engines replay; 3 fixed Lloyd iterations) coarse-quantizes the corpus
    // into inverted lists; each probe searches its 3 nearest lists. Every
    // floating-point step is association-order-pinned so DuckDB replays the
    // whole training run bit-for-bit: assignments rank an IEEE-floor-rounded
    // cosine (Canon.r6) with centroid-id tiebreak, and centroid means fold
    // SORTED per-dimension value lists (at 100 TB you'd use plain avg() —
    // order-dependent but statistically identical; the sorted fold is what
    // makes the pipeline hash-checkable). Per iteration: one corpus pass
    // against k broadcast centroids + one k×d-row shuffle for the means —
    // the textbook distributed-k-means shape. localCheckpoint pins each
    // round's 10-row centroid table (same device as components(): keeps the
    // loop's plan linear, never materializes corpus data on the driver).
    q("q83_ivf_topk", {
      s"""WITH $ivfListsCtes,
         |probes AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 10),
         |probed AS (
         |  SELECT qid, qemb, cl FROM (
         |    SELECT p.qid, p.qemb, c.cl,
         |           ROW_NUMBER() OVER (PARTITION BY p.qid ORDER BY
         |             ${graft.api.Canon.Oracle.r6(ivfCosSql("p.qemb", "c.cemb"))} DESC,
         |             c.cl) AS rn
         |    FROM probes p, cent$ivfIters c) t
         |  WHERE rn <= 3),
         |scored AS (
         |  SELECT p.qid, l.vec_id AS cid,
         |         ${graft.api.Canon.Oracle.r4(ivfCosSql("p.qemb", "l.emb"))} AS cos
         |  FROM lists l JOIN probed p ON l.cl = p.cl AND l.vec_id <> p.qid)
         |SELECT qid, cid, cos FROM (
         |  SELECT qid, cid, cos,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) rn
         |  FROM scored) t
         |WHERE rn <= 5
         |ORDER BY qid, cid""".stripMargin
    }) { spark =>
      import spark.implicits._
      val cent = ivfCentroids(spark)
      val lists = ivfAssign(spark, cent)
      val probes = embeddingsD(spark).filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"emb".as("qemb"))
      val wq = Window.partitionBy($"qid").orderBy($"ccos".desc, $"cl".asc)
      val probed = broadcast(probes).crossJoin(broadcast(cent))
        .select($"qid", $"qemb", $"cl",
          graft.api.Canon.r6(cosine($"qemb", $"cemb")).as("ccos"))
        .withColumn("rn", row_number().over(wq)).filter($"rn" <= 3)
        .select($"qid", $"qemb", $"cl")
      val scored = lists.join(broadcast(probed), Seq("cl"))
        .filter($"vec_id" =!= $"qid")
        .select($"qid", $"vec_id".as("cid"),
          graft.api.Canon.r4(cosine($"qemb", $"emb")).as("cos"))
      val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid".asc)
      scored.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
        .select($"qid", $"cid", $"cos")
        .orderBy($"qid", $"cid")
    },

    // Int8 embedding quantization — the storage-reduction pass an embedding
    // pipeline runs before serving/packing: per-vector symmetric scale
    // (127 / max|x|), values floor-rounded to int8 range. Every step is
    // order-pinned IEEE maths (abs-max fold, scale division, floor(x·s+0.5)
    // per element, index-ordered reconstruction-error fold), so DuckDB
    // replays the whole quantize→dequantize round trip bit-for-bit. Purely
    // map-side per vector — no shuffle at any corpus size.
    q("q104_embedding_quantize",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |s AS (
         |  SELECT vec_id, emb,
         |         127.0 / list_reduce(list_transform(emb, x -> abs(x)),
         |                             (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS scale
         |  FROM e),
         |qz AS (
         |  SELECT vec_id, emb, scale,
         |         list_transform(emb, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS q
         |  FROM s)
         |SELECT vec_id,
         |  CAST(list_reduce(q, (a, b) -> CASE WHEN b < a THEN b ELSE a END) AS BIGINT) AS qmin,
         |  CAST(list_reduce(q, (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS BIGINT) AS qmax,
         |  CAST(list_reduce(q, (a, b) -> a + b) AS BIGINT) AS qsum,
         |  ${graft.api.Canon.Oracle.r6(
             "list_reduce(list_transform(range(1, len(emb) + 1), " +
               "i -> (emb[i] - q[i] / scale) * (emb[i] - q[i] / scale)), (a, b) -> a + b)")} AS mse
         |FROM qz
         |ORDER BY vec_id""".stripMargin) { spark =>
      import spark.implicits._
      val e = embeddingsD(spark)
      val s = e.withColumn("scale",
        lit(127.0) / aggregate(transform($"emb", abs(_)), lit(0.0),
          (a, b) => greatest(a, b)))
      val qz = s.withColumn("q",
        transform($"emb", x => floor(x * $"scale" + 0.5).cast(LongType)))
      qz.select($"vec_id",
          aggregate($"q", element_at($"q", 1), (a, b) => least(a, b)).as("qmin"),
          aggregate($"q", element_at($"q", 1), (a, b) => greatest(a, b)).as("qmax"),
          aggregate($"q", lit(0L), (a, b) => a + b).as("qsum"),
          graft.api.Canon.r6(aggregate(
            zip_with($"emb", $"q", (x, qq) =>
              (x - qq / $"scale") * (x - qq / $"scale")),
            lit(0.0), (a, b) => a + b)).as("mse"))
        .orderBy($"vec_id")
    },

    // Product quantization (Jégou/Douze/Schmid, PAMI 2011): train K=8
    // Euclidean centroids per 16-dim SUBSPACE (deterministic k-means, q83's
    // machinery) and encode each vector as 4 one-byte codes — 64 doubles →
    // 4 bytes, the memory-bound ANN compression at 100 TB (codebooks train
    // on a sample; encoding is a broadcast-join scan). The oracle replays
    // the full training run per subspace; distances are three bit-identical
    // dot products and assignment ranks on the r6-rounded distance, so
    // codes AND per-vector reconstruction error hash-match.
    q("q104b_pq_codes", {
      val unions = (0 until pqM)
        .map(m => s"SELECT vec_id, $m AS m, code, cdist FROM f$m")
        .mkString("\nUNION ALL\n")
      s"""WITH $pqTrainSql,
         |allc AS (
         |$unions),
         |g AS (SELECT vec_id,
         |        list_sort(list(struct_pack(m := m, code := code,
         |                                   cdist := cdist))) AS cs
         |      FROM allc GROUP BY vec_id)
         |SELECT vec_id,
         |  array_to_string(list_transform(cs, c -> CAST(c.code AS VARCHAR)), ',')
         |    AS codes,
         |  floor((list_reduce(list_transform(cs, c -> c.cdist),
         |           (a, b) -> a + b) / 64) * 1000000 + 0.5) / 1000000 AS mse
         |FROM g ORDER BY vec_id""".stripMargin
    }) { spark =>
      import spark.implicits._
      pqAssignAll(pqSlices(spark), pqCodebooks(spark))
        .select($"vec_id", $"m", $"code", $"cdist")
        .groupBy($"vec_id")
        .agg(array_sort(collect_list(struct($"m", $"code", $"cdist"))).as("cs"))
        .select($"vec_id",
          concat_ws(",", transform($"cs", c => c("code").cast("string")))
            .as("codes"),
          (floor((aggregate($"cs", lit(0.0), (acc, c) => acc + c("cdist"))
            / lit(64.0)) * 1000000 + 0.5) / 1000000).as("mse"))
        .orderBy($"vec_id")
    },

    // PQ asymmetric-distance search with exact re-rank (ADC — what the
    // codes are FOR): per probe, precompute the 4×8 table of subspace
    // distances to every centroid (tiny, broadcast), score the WHOLE
    // corpus by code lookup (M table hits + a 4-element sorted fold per
    // vector — the corpus-wide pass reads 4-byte codes, not 64-double
    // embeddings: the 64× read-volume cut of the memory-bound ANN regime),
    // take an ADC SHORTLIST of 50, then re-rank just the shortlist with
    // the exact distance — the standard two-stage PQ recipe: on this
    // fixture's isotropic vectors raw ADC rank is noise-limited (recall
    // 0.06) while shortlist+re-rank recovers the true neighbours
    // (SimilarityDedupSpec measures the recall floor). Oracle replays
    // training + table + lookup + re-rank identically.
    q("q104c_pq_ann", {
      val distTable = (0 until pqM).map(m =>
        s"""SELECT p.qid, $m AS m, c.code,
           |       ${graft.api.Canon.Oracle.r6(
          pqDistSql(pqSubSql("p.qemb", m), "c.cemb"))} AS pdist
           |FROM probes p, cent$m$pqIters c""".stripMargin)
        .mkString("\nUNION ALL\n")
      val codeUnions = (0 until pqM)
        .map(m => s"SELECT vec_id, $m AS m, code FROM f$m")
        .mkString("\nUNION ALL\n")
      s"""WITH $pqTrainSql,
         |probes AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 10),
         |dt AS (
         |$distTable),
         |codes AS (
         |$codeUnions),
         |scored AS (
         |  SELECT d.qid, c.vec_id AS cid,
         |         list_sort(list(struct_pack(m := d.m, pd := d.pdist))) AS ps
         |  FROM codes c JOIN dt d ON d.m = c.m AND d.code = c.code
         |  WHERE c.vec_id <> d.qid
         |  GROUP BY d.qid, c.vec_id),
         |ranked AS (
         |  SELECT qid, cid,
         |         floor(list_reduce(list_transform(ps, x -> x.pd),
         |                 (a, b) -> a + b) * 1000000 + 0.5) / 1000000 AS adist
         |  FROM scored),
         |shortlist AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |           ROW_NUMBER() OVER (PARTITION BY qid
         |                              ORDER BY adist ASC, cid) AS rn
         |    FROM ranked) t
         |  WHERE rn <= 50),
         |rescored AS (
         |  SELECT s.qid, s.cid,
         |         ${graft.api.Canon.Oracle.r6(pqDistSql("p.qemb", "c.emb"))} AS edist
         |  FROM shortlist s
         |  JOIN probes p ON p.qid = s.qid
         |  JOIN e c ON c.vec_id = s.cid)
         |SELECT qid, cid, edist FROM (
         |  SELECT qid, cid, edist,
         |         ROW_NUMBER() OVER (PARTITION BY qid
         |                            ORDER BY edist ASC, cid) AS rn
         |  FROM rescored) t
         |WHERE rn <= 5
         |ORDER BY qid, cid""".stripMargin
    }) { spark =>
      import spark.implicits._
      val slices = pqSlices(spark)
      val books = pqCodebooks(spark)
      val codes = pqAssignAll(slices, books)
        .select($"vec_id", $"m", $"code")
      val dt = slices.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"m", $"sub".as("qsub"))
        .join(broadcast(books), "m")
        .select($"qid", $"m", $"code",
          graft.api.Canon.r6(pqDist($"qsub", $"cemb")).as("pdist"))
      val wa = Window.partitionBy($"qid").orderBy($"adist".asc, $"cid".asc)
      val shortlist = codes.join(broadcast(dt), Seq("m", "code"))
        .filter($"vec_id" =!= $"qid")
        .groupBy($"qid", $"vec_id".as("cid"))
        .agg(sort_array(collect_list(struct($"m", $"pdist".as("pd")))).as("ps"))
        .select($"qid", $"cid",
          (floor(aggregate($"ps", lit(0.0), (acc, x) =>
            acc + x.getField("pd")) * 1000000 + 0.5) / 1000000).as("adist"))
        .withColumn("rn", row_number().over(wa)).filter($"rn" <= 50)
        .select($"qid", $"cid")
      val e = embeddingsD(spark)
      val we = Window.partitionBy($"qid").orderBy($"edist".asc, $"cid".asc)
      shortlist
        .join(e.select($"vec_id".as("qid"), $"emb".as("qemb")), "qid")
        .join(e.select($"vec_id".as("cid"), $"emb".as("cemb")), "cid")
        .select($"qid", $"cid",
          graft.api.Canon.r6(pqDist($"qemb", $"cemb")).as("edist"))
        .withColumn("rn", row_number().over(we)).filter($"rn" <= 5)
        .select($"qid", $"cid", $"edist")
        .orderBy($"qid", $"cid")
    },

    // Hard-negative mining — the contrastive-training data op: for each
    // probe, the top-3 most-cosine-similar vectors carrying a DIFFERENT
    // label (the "looks like X, isn't X" pairs a retrieval/embedding
    // trainer feeds back as negatives). Same exact-scoring hot path as q80
    // (raw float arrays + precomputed norms + codegen'd graft_dot), with
    // the label inequality fused into the broadcast join condition so
    // same-label pairs never materialize. Corpus scanned once map-side;
    // the only shuffle is the per-probe top-k.
    q("q117_hard_negatives",
      s"""WITH e AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
         |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                               CAST(embedding AS DOUBLE[]))) AS n
         |  FROM embeddings),
         |s AS (
         |  SELECT a.vec_id AS qid, a.label AS qlabel,
         |         b.vec_id AS cid, b.label AS clabel,
         |         ${graft.api.Canon.Oracle.r4(
                     "(list_dot_product(a.emb, b.emb) / (a.n * b.n))")} AS cos
         |  FROM e a JOIN e b ON a.label <> b.label
         |  WHERE a.vec_id < 10)
         |SELECT qid, qlabel, cid, clabel, cos FROM (
         |  SELECT qid, qlabel, cid, clabel, cos,
         |         ROW_NUMBER() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, cid) AS rn
         |  FROM s) t
         |WHERE rn <= 3
         |ORDER BY qid, cid""".stripMargin) { spark =>
      import spark.implicits._
      val e = Tables.spread(spark.table("embeddings"))
        .select($"vec_id", $"label", $"embedding",
          sqrt(dot($"embedding", $"embedding")).as("n"))
      val probes = e.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"label".as("qlabel"),
          $"embedding".as("qemb"), $"n".as("qn"))
      val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid".asc)
      e.join(broadcast(probes), $"label" =!= $"qlabel")
        .select($"qid", $"qlabel", $"vec_id".as("cid"), $"label".as("clabel"),
          graft.api.Canon.r4(dot($"qemb", $"embedding") / ($"qn" * $"n"))
            .as("cos"))
        .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
        .select($"qid", $"qlabel", $"cid", $"clabel", $"cos")
        .orderBy($"qid", $"cid")
    },

    // SemDeDup-style semantic dedup (cluster-then-dedup, the embedding
    // near-dup pass LLM pipelines run corpus-wide): k-means-cluster the
    // corpus, then compare pairs ONLY within a cluster — the move that
    // turns the all-pairs quadratic scan into cluster-local equi-joins
    // (at 100 TB k grows with the corpus so cluster width stays bounded;
    // the pair stage shuffles on cl, never a product — vs q89, which is
    // the brute-force/whole-corpus variant of the same decision). Reuses
    // q83's deterministic k-means verbatim (md5-order init, sorted-fold
    // Lloyd rounds, Canon.r6-ranked assignment), so DuckDB replays
    // training + dedup end-to-end bit-for-bit. Drop rule: a vector is
    // dropped iff some smaller-id cluster-mate has r4-cosine ≥ 0.4; its
    // keeper is the smallest such id (q70's keep-min rule).
    q("q119_semantic_dedup",
      s"""WITH $ivfListsCtes,
         |p AS (
         |  SELECT a.cl, a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${graft.api.Canon.Oracle.r4(ivfCosSql("a.emb", "b.emb"))} AS cos
         |  FROM lists a JOIN lists b
         |    ON a.cl = b.cl AND a.vec_id < b.vec_id),
         |h AS (SELECT * FROM p WHERE cos >= 0.4)
         |SELECT id_b AS dropped, id_a AS keeper, cl, cos FROM (
         |  SELECT cl, id_a, id_b, cos,
         |         ROW_NUMBER() OVER (PARTITION BY id_b ORDER BY id_a) AS rn
         |  FROM h) t
         |WHERE rn = 1
         |ORDER BY dropped""".stripMargin) { spark =>
      import spark.implicits._
      val lists = ivfAssign(spark, ivfCentroids(spark))
      val a = lists.select($"cl", $"vec_id".as("id_a"), $"emb".as("ea"))
      val b = lists.select($"cl".as("clb"), $"vec_id".as("id_b"),
        $"emb".as("eb"))
      val h = a.join(b, $"cl" === $"clb" && $"id_a" < $"id_b")
        .select($"cl", $"id_a", $"id_b",
          graft.api.Canon.r4(cosine($"ea", $"eb")).as("cos"))
        .filter($"cos" >= 0.4)
      val w = Window.partitionBy($"id_b").orderBy($"id_a".asc)
      h.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"id_b".as("dropped"), $"id_a".as("keeper"), $"cl", $"cos")
        .orderBy($"dropped")
    },

    // Contrastive triplet mining (anchor, positive, hard negative — the
    // training-data op behind embedding-model fine-tuning: easy negatives
    // teach nothing, so the negative comes from the anchor's OWN cluster,
    // just below the near-dup bar). Positives are q119's semantic
    // near-dups (within-cluster r4 cosine ≥ 0.4, argmax per anchor);
    // the hard negative is the highest-cosine same-cluster vector BELOW
    // the bar. Both ranks order on the r4-ROUNDED cosine with the id as
    // tiebreak (the committed pair-surface value), so the triplets are
    // fully hash-checked. Scale: within-cluster pairs only — the q119
    // shape, cluster-bounded, never corpus²; training memoized.
    q("q227_contrastive_triplets",
      s"""WITH $ivfListsCtes,
         |p AS (
         |  SELECT a.vec_id AS anchor, b.vec_id AS other,
         |         ${graft.api.Canon.Oracle.r4(
                     ivfCosSql("a.emb", "b.emb"))} AS cos
         |  FROM lists a JOIN lists b
         |    ON a.cl = b.cl AND a.vec_id <> b.vec_id),
         |pos AS (
         |  SELECT anchor, other AS positive, cos AS pos_cos FROM (
         |    SELECT anchor, other, cos,
         |           ROW_NUMBER() OVER (PARTITION BY anchor
         |             ORDER BY cos DESC, other) AS rn
         |    FROM p WHERE cos >= 0.4e0) t WHERE rn = 1),
         |neg AS (
         |  SELECT anchor, other AS negative, cos AS neg_cos FROM (
         |    SELECT anchor, other, cos,
         |           ROW_NUMBER() OVER (PARTITION BY anchor
         |             ORDER BY cos DESC, other) AS rn
         |    FROM p WHERE cos < 0.4e0) t WHERE rn = 1)
         |SELECT pos.anchor, positive, pos_cos, negative, neg_cos
         |FROM pos JOIN neg ON neg.anchor = pos.anchor
         |ORDER BY pos.anchor""".stripMargin) { spark =>
      import spark.implicits._
      val lists = ivfAssign(spark, ivfCentroids(spark))
      val a = lists.select($"cl", $"vec_id".as("anchor"), $"emb".as("ea"))
      val b = lists.select($"cl".as("clb"), $"vec_id".as("other"),
        $"emb".as("eb"))
      // within-cluster pair surface feeds BOTH ranks — materialize once
      val pairs = a.join(b, $"cl" === $"clb" && $"anchor" =!= $"other")
        .select($"anchor", $"other",
          graft.api.Canon.r4(cosine($"ea", $"eb")).as("cos"))
        .localCheckpoint()
      val w = Window.partitionBy($"anchor").orderBy($"cos".desc, $"other")
      val pos = pairs.filter($"cos" >= 0.4)
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"anchor", $"other".as("positive"), $"cos".as("pos_cos"))
      val neg = pairs.filter($"cos" < 0.4)
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"anchor".as("na"), $"other".as("negative"),
          $"cos".as("neg_cos"))
      pos.join(neg, $"anchor" === $"na")
        .select($"anchor", $"positive", $"pos_cos", $"negative", $"neg_cos")
        .orderBy($"anchor")
    },

    // Nearest-class-mean (prototype) classification — embedding-model
    // inference as an operator (Rocchio/NCM; the supervised sibling of
    // q83's unsupervised k-means): one prototype per label = the class
    // mean, every probe classified to its most-cosine-similar prototype.
    // Means reuse centroidsOf's two-level bucketed fold (meanFold): members
    // bucket by md5(vec_id) inside each (label, dim), value-sorted fold per
    // bucket, bucket-ordered fold of the 64 partials — the IEEE order is
    // fixed under any partitioning, DuckDB replays it exactly, and no
    // buffer holds a class-sized array. Classification is the assignOf shape: 10
    // prototypes broadcast against the probe scan, ranked by r6 cosine
    // with the label as tiebreak.
    q("q135_prototype_classify",
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
         |           FROM embeddings),
         |${meanFoldSql("", "e", "emb", Seq("label"))},
         |proto AS (
         |  SELECT label AS plabel,
         |         list_transform(
         |           list_sort(list(struct_pack(dim := dim, cx := cx))),
         |           p -> p.cx) AS pemb
         |  FROM ct GROUP BY label),
         |probes AS (SELECT vec_id, label, emb FROM e WHERE vec_id < 50),
         |scored AS (
         |  SELECT p.vec_id, p.label, pr.plabel,
         |         ${graft.api.Canon.Oracle.r6(
                     ivfCosSql("p.emb", "pr.pemb"))} AS pcos,
         |         ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |           ${graft.api.Canon.Oracle.r6(
                       ivfCosSql("p.emb", "pr.pemb"))} DESC,
         |           pr.plabel) AS rn
         |  FROM probes p, proto pr)
         |SELECT vec_id, label AS true_label, plabel AS pred_label,
         |       pcos AS cos,
         |       CAST(CASE WHEN label = plabel THEN 1 ELSE 0 END AS INT)
         |         AS correct
         |FROM scored WHERE rn = 1
         |ORDER BY vec_id""".stripMargin) { spark =>
      import spark.implicits._
      val e = Tables.spread(spark.table("embeddings"))
        .select($"vec_id", $"label", toD($"embedding").as("emb"))
      val proto = classPrototypes(spark)
      val w = Window.partitionBy($"vec_id").orderBy($"pcos".desc, $"plabel".asc)
      e.filter($"vec_id" < 50)
        .crossJoin(broadcast(proto))
        .select($"vec_id", $"label", $"plabel",
          graft.api.Canon.r6(cosine($"emb", $"pemb")).as("pcos"))
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"vec_id", $"label".as("true_label"),
          $"plabel".as("pred_label"), $"pcos".as("cos"),
          when($"label" === $"plabel", 1).otherwise(0).cast("int")
            .as("correct"))
        .orderBy($"vec_id")
    },

    // Binary sign-quantization ANN (the Faiss binary-index pattern): each
    // 64-dim vector compresses to two packed 32-bit sign words (16 bytes vs
    // 256 — the whole corpus index is 16× smaller than the floats), probes
    // scan the corpus with INTEGER xor+popcount Hamming distance, and only
    // the 64-deep Hamming shortlist pays an exact-cosine re-rank. All
    // integer math + the shared r4 cosine → fully hash-checked (unlike the
    // randomized ANN rows-only paths). Corpus scanned once map-side
    // (broadcast probes); shuffles are the two per-probe top-k windows over
    // ≤ 64·|probes| rows. Recall vs exact q80 asserted in
    // SimilarityDedupSpec.
    q("q125_hamming_ann", {
      def packSql(off: Int): String =
        s"""CAST(list_sum(list_transform(range(1, 33),
           |    i -> CASE WHEN embedding[i + $off] > 0
           |              THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END))
           |  AS BIGINT)""".stripMargin
      s"""WITH e AS ($withNormSql),
         |codes AS (
         |  SELECT vec_id, ${packSql(0)} AS lo, ${packSql(32)} AS hi
         |  FROM embeddings),
         |p AS (SELECT vec_id AS qid, lo AS qlo, hi AS qhi
         |      FROM codes WHERE vec_id < 10),
         |s AS (
         |  SELECT p.qid, c.vec_id AS cid,
         |         CAST(bit_count(xor(c.lo, p.qlo))
         |            + bit_count(xor(c.hi, p.qhi)) AS BIGINT) AS ham
         |  FROM codes c JOIN p ON c.vec_id <> p.qid),
         |short AS (
         |  SELECT qid, cid, ham FROM (
         |    SELECT qid, cid, ham,
         |           ROW_NUMBER() OVER (PARTITION BY qid
         |                              ORDER BY ham, cid) AS rn
         |    FROM s) t
         |  WHERE rn <= $hammingShortlist),
         |r AS (
         |  SELECT sh.qid, sh.cid, sh.ham,
         |         ${graft.api.Canon.Oracle.r4(
                     "(list_dot_product(a.emb, b.emb) / (a.n * b.n))")} AS cos
         |  FROM short sh
         |  JOIN e a ON a.vec_id = sh.qid
         |  JOIN e b ON b.vec_id = sh.cid)
         |SELECT qid, cid, ham, cos FROM (
         |  SELECT qid, cid, ham, cos,
         |         ROW_NUMBER() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, cid) AS rn
         |  FROM r) t
         |WHERE rn <= 5
         |ORDER BY qid, cid""".stripMargin
    }) { spark =>
      import spark.implicits._
      val codes = signCodes(spark)
      val probes = codes.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"lo".as("qlo"), $"hi".as("qhi"))
      val scored = codes.join(broadcast(probes), $"vec_id" =!= $"qid")
        .select($"qid", $"vec_id".as("cid"),
          (bit_count($"lo".bitwiseXOR($"qlo"))
            + bit_count($"hi".bitwiseXOR($"qhi"))).cast(LongType).as("ham"))
      val wh = Window.partitionBy($"qid").orderBy($"ham".asc, $"cid".asc)
      val short = scored.withColumn("rn", row_number().over(wh))
        .filter($"rn" <= hammingShortlist).select($"qid", $"cid", $"ham")
      val e = withNorm(spark)
      val qe = e.select($"vec_id".as("qid"), $"embedding".as("qemb"),
        $"n".as("qn"))
      val rer = short
        .join(broadcast(qe), Seq("qid"))
        .join(e, $"vec_id" === $"cid")
        .select($"qid", $"cid", $"ham",
          graft.api.Canon.r4(dot($"qemb", $"embedding") / ($"qn" * $"n"))
            .as("cos"))
      val wc = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid".asc)
      rer.withColumn("rn", row_number().over(wc)).filter($"rn" <= 5)
        .select($"qid", $"cid", $"ham", $"cos")
        .orderBy($"qid", $"cid")
    },

    // Johnson-Lindenstrauss random projection (Achlioptas'01 database-
    // friendly ±1 variant): 64-dim float embeddings → 16-dim sketch via a
    // FIXED sign matrix derived from md5 at plan-build time and embedded
    // as literals in BOTH engines (the q82 plane-literal pattern — no RNG
    // anywhere, fully hash-checked). y_j = ⟨x, s_j⟩ / √16; the 1/√r = 1/4
    // scale is an exact power of two, so the only IEEE work is the shared
    // left-fold dot (graft_dot ≡ DuckDB list_dot_product association
    // order). E‖y_a − y_b‖² = ‖x_a − x_b‖² (unbiased, var ∝ 2/r) —
    // SimilarityDedupSpec measures the preservation on sampled pairs.
    // Scale: pure map-side (one projection per scan row, no shuffle until
    // the final ORDER BY); at 100 TB this is the cheap pre-filter that
    // shrinks every downstream pair computation 4× in bytes, the same role
    // as q104's int8 and q125's 1-bit codes on the quantization axis.
    q("q141_jl_projection", {
      val colsSql = (0 until jlDims).map { j =>
        val arr = jlSigns(j).map(s => if (s > 0) "1.0" else "-1.0")
          .mkString(", ")
        s"""floor(list_dot_product(CAST(embedding AS DOUBLE[]),
           |    [$arr]) / 4 * 10000 + 0.5) / 10000 AS y$j""".stripMargin
      }.mkString(",\n  ")
      s"""SELECT vec_id,
         |  $colsSql
         |FROM embeddings
         |ORDER BY vec_id""".stripMargin
    }) { spark =>
      import spark.implicits._
      jlProject(spark).select(
        $"vec_id" +: (0 until jlDims).map(j =>
          (floor(col(s"y$j") * 10000 + 0.5) / 10000).as(s"y$j")): _*)
        .orderBy($"vec_id")
    },

    // Embedding-space benchmark decontamination — the SEMANTIC complement
    // of q79b's shingle-overlap decontaminate: an eval example leaks into
    // the training corpus even when paraphrased, so the gate flags corpus
    // vectors whose max cosine against the held-out benchmark set
    // (vec_id < 16, the q117 broadcast-side pattern) reaches τ = 0.30
    // (p90 of the fixture's max-cosine distribution — the gate's knob).
    // Scale: the benchmark side is metadata-sized and BROADCAST (16×64
    // floats), scoring is a map-side BroadcastNestedLoopJoin over the raw
    // float arrays + codegen'd graft_dot — the corpus never shuffles for
    // scoring; the per-vector max and per-label rollup combine map-side.
    // Cross-engine determinism: identical left-fold dot products, MAX of
    // bit-identical doubles, τ-compare on the same bits, free-double
    // floor-round per the q91 invariant.
    q("q170_embedding_decontaminate",
      s"""WITH e AS ($withNormSql),
         |b AS (SELECT * FROM e WHERE vec_id < 16),
         |c AS (SELECT * FROM e WHERE vec_id >= 16),
         |m AS (
         |  SELECT c.vec_id,
         |         MAX(list_dot_product(c.emb, b.emb) / (c.n * b.n)) AS mc
         |  FROM c CROSS JOIN b GROUP BY c.vec_id),
         |l AS (SELECT vec_id, label FROM embeddings WHERE vec_id >= 16)
         |SELECT l.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |  CAST(SUM(CASE WHEN m.mc >= 0.30 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_contaminated,
         |  ${graft.api.Canon.Oracle.r4("MAX(m.mc)")} AS max_cos
         |FROM m JOIN l ON l.vec_id = m.vec_id
         |GROUP BY l.label ORDER BY l.label""".stripMargin) { spark =>
      import spark.implicits._
      val e = pairStage(spark)
      val bench = e.filter($"vec_id" < 16)
        .select($"embedding".as("be"), $"n".as("bn"))
      val m = e.filter($"vec_id" >= 16)
        .join(broadcast(bench))
        .select($"vec_id",
          (dot($"embedding", $"be") / ($"n" * $"bn")).as("cos"))
        .groupBy($"vec_id").agg(max($"cos").as("mc"))
      val l = spark.table("embeddings").filter($"vec_id" >= 16)
        .select($"vec_id", $"label")
      m.join(l, Seq("vec_id"))
        .groupBy($"label")
        .agg(count(lit(1)).cast(LongType).as("n_vecs"),
          sum(when($"mc" >= 0.30, 1).otherwise(0)).cast(LongType)
            .as("n_contaminated"),
          max($"mc").as("m0"))
        .select($"label", $"n_vecs", $"n_contaminated",
          graft.api.Canon.r4($"m0").as("max_cos"))
        .orderBy($"label")
    },

    // Maximal-marginal-relevance diverse top-k (Carbonell-Goldstein SIGIR'98
    // — the diversity-aware sampling a curation pipeline uses where plain
    // top-k returns five near-copies): per probe, take the top-16 cosine
    // candidates, then greedily select 5 maximizing
    // 0.7·rel − 0.3·max_sim_to_selected. The greedy is 5 UNROLLED relational
    // rounds — identical CTEs on both engines — over the bounded candidate
    // set; every rel/sim is rounded r4 BEFORE selection (the cosine
    // invariant), so the argmax compares identical doubles and the whole
    // sequential algorithm is hash-checkable. Scale: the corpus-sized stage
    // is exactly q80's broadcast-probe scoring scan + per-qid top-k; the
    // greedy runs on |probes|·16 rows and |probes|·16·15 pair rows,
    // localCheckpoint'ed once each (multi-consumer rule) — candidate-set
    // bounded, never corpus-quadratic.
    q("q189_mmr_diverse", mmrOracleSql) { spark =>
      import spark.implicits._
      val e = withNorm(spark)
      val probes = e.filter($"vec_id" < 3)
        .select($"vec_id".as("qid"), $"embedding".as("qemb"), $"n".as("qn"))
      val sc = e.join(broadcast(probes), $"vec_id" =!= $"qid")
        .select($"qid", $"vec_id".as("cid"), $"embedding".as("emb"), $"n",
          graft.api.Canon.r4(dot($"qemb", $"embedding") / ($"qn" * $"n"))
            .as("rel"))
      val wTop = Window.partitionBy($"qid").orderBy($"rel".desc, $"cid".asc)
      val cands = sc.withColumn("rn", row_number().over(wTop))
        .filter($"rn" <= 16)
        .select($"qid", $"cid", $"emb", $"n", $"rel")
        .localCheckpoint() // one corpus scoring pass; feeds pairs + greedy
      val pairs = cands.as("x").join(cands.as("y"),
          $"x.qid" === $"y.qid" && $"x.cid" =!= $"y.cid")
        .select($"x.qid".as("qid"), $"x.cid".as("a"), $"y.cid".as("b"),
          graft.api.Canon.r4(dot($"x.emb", $"y.emb") / ($"x.n" * $"y.n"))
            .as("sim"))
      // r19 (the q197/q247 in-row technique): the k greedy rounds used to
      // run as k checkpointed Spark rounds (window + anti-join + max-join
      // each) over ≤ |probes|·16 rows — pure fixed cost. The bounded
      // candidate/pair arrays now collect per probe and the compiled
      // MmrGreedy replays the identical unrolled greedy (same r4-rounded
      // rel/sim inputs, same 0.7·rel − 0.3·max_sim doubles, same
      // (sc DESC, cid ASC) pick) in one expression eval.
      val candsG = cands.groupBy($"qid")
        .agg(sort_array(collect_list(struct($"cid", $"rel"))).as("cs"))
      val pairsG = pairs.groupBy($"qid")
        .agg(collect_list(struct($"a", $"b", $"sim")).as("ps"))
      candsG.join(pairsG, Seq("qid"))
        .select($"qid", explode(graft.functions.VectorExpressions
          .mmrGreedy($"cs", $"ps", lit(mmrK))).as("g"))
        .select($"qid", $"g.sel_rank".as("sel_rank"), $"g.cid".as("cid"),
          graft.api.Canon.r4($"g.sc").as("mmr_score"))
        .orderBy($"qid", $"sel_rank")
    },

    // Clustering-quality report over q83's trained IVF k-means (the
    // monitoring read a pipeline runs after every (re)train: is the
    // partitioning still tight, did a cluster collapse?): per-cluster size,
    // mean intra-cluster cosine distance (inertia), and the SIMPLIFIED
    // silhouette — distances to centroids, not pairwise members, the
    // standard O(n·k) scalable variant of the O(n²) silhouette. The oracle
    // replays the identical training run via the shared k-means CTE chain
    // (q83/q119 precedent), every cosine goes through the Canon.r6 margin
    // before any arithmetic, and per-cluster means are vec_id-sorted folds
    // (the means-stage determinism pattern). Scale: one corpus×k broadcast
    // scoring pass + a per-cluster rollup; nothing pairwise.
    q("q193_cluster_quality", clusterQualityOracleSql) { spark =>
      import spark.implicits._
      val e = embeddingsD(spark)
      val cent = ivfCentroids(spark) // memoized checkpoint feeds assign + dists
      val lists = assignOf(e, cent)
        .select($"vec_id", $"emb", $"cl".as("own"))
      val alldist = lists.crossJoin(broadcast(cent))
        .select($"vec_id", $"own", $"cl".as("cc"),
          (lit(1.0) - graft.api.Canon.r6(cosine($"emb", $"cemb"))).as("d"))
      val per = alldist.groupBy($"vec_id", $"own")
        .agg(max(when($"cc" === $"own", $"d")).as("a"),
          min(when($"cc" =!= $"own", $"d")).as("b"))
      val sil = per.select($"vec_id", $"own", $"a", $"b",
        (($"b" - $"a") / when($"a" >= $"b", $"a").otherwise($"b")).as("s"))
      val arr = sil.groupBy($"own".as("cl"))
        .agg(sort_array(collect_list(struct($"vec_id", $"a", $"s"))).as("l"))
      arr.select($"cl", size($"l").cast(LongType).as("n_vecs"),
          graft.api.Canon.r4(aggregate($"l", lit(0.0),
            (acc, x) => acc + x.getField("a")) / size($"l")).as("mean_intra"),
          graft.api.Canon.r4(aggregate($"l", lit(0.0),
            (acc, x) => acc + x.getField("s")) / size($"l"))
            .as("mean_silhouette"))
        .orderBy($"cl")
    },

    // k-center greedy coreset (Gonzalez'85 farthest-point traversal, the
    // 2-approximation behind embedding-space coreset selection — q210's
    // metric twin): seed = min vec_id, then each round adds the point
    // FARTHEST from its nearest chosen center (cosine distance, r4-rounded
    // before any comparison so both engines argmax identical doubles; ties
    // by vec_id). The picked distance IS the covering radius, which the
    // k-center property drives non-increasing — spec'd. Scale: per round
    // one corpus scan against the ≤k-row broadcast center table, a
    // per-point MIN, and a TakeOrdered — linear per round, pairwise
    // nothing.
    q("q211_kcenter_coreset", kcenterOracleSql) { spark =>
      kcenterCoresetOf(withNorm(spark), kcenterRounds)
        .orderBy(col("sel_round"))
    },

    // Per-source embedding centroid similarity (the "are these two crawls
    // the same distribution" readout in EMBEDDING space — the semantic
    // companion of q184's token KL and q162's shared-shingle matrix; near-1
    // centroid cosine between sources flags redundant acquisitions before
    // mixing): deterministic per-source mean vector via the q184/k-means
    // two-level md5-bucketed fold (no aggregation buffer ever holds a
    // source-sized array; both levels order-pinned, so the oracle replays
    // the identical IEEE association), then the ≤C(|src|,2)-row pairwise
    // cosine matrix on broadcast centroids. Output bounded by |sources|²
    // at any corpus scale; the corpus-sized work is ONE exploded-dim
    // rollup.
    q("q238_source_centroid_sim",
      s"""WITH e AS (
         |  SELECT e.vec_id, d.source, CAST(e.embedding AS DOUBLE[]) AS emb
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
         |${meanFoldSql("", "e", "emb", Seq("source"))},
         |cent AS (
         |  SELECT source, list_transform(list_sort(list(
         |           struct_pack(dim := dim, cx := cx))), p -> p.cx) AS cemb
         |  FROM ct GROUP BY source)
         |SELECT a.source AS src_a, b.source AS src_b,
         |  floor(list_dot_product(a.cemb, b.cemb) /
         |        (sqrt(list_dot_product(a.cemb, a.cemb)) *
         |         sqrt(list_dot_product(b.cemb, b.cemb)))
         |        * 10000 + 0.5) / 10000 AS cos
         |FROM cent a JOIN cent b ON a.source < b.source
         |ORDER BY src_a, src_b""".stripMargin) { spark =>
      import spark.implicits._
      val e = Tables.spread(spark.table("embeddings"))
        .select($"vec_id", toD($"embedding").as("emb"))
        .join(spark.table("documents").select($"doc_id", $"source"),
          $"vec_id" === $"doc_id")
      // deliberately NOT checkpointed (ADVICE r11 suggested it): the
      // broadcast and probe sides duplicate only the final ≤|sources|-row
      // aggregation — the corpus-sized exploded-dim shuffles underneath
      // are IDENTICAL exchanges and ReuseExchange dedupes them, so the
      // corpus is scanned once either way. Measured solo min-of-4 at
      // sf0.1 (r12): unmaterialized 0.62 s vs localCheckpoint 0.88 s —
      // if the rollup really ran twice the unmaterialized plan could not
      // beat the checkpointed one.
      val cent = meanFold(
        e.select($"source", $"vec_id", posexplode($"emb").as(Seq("dim", "x"))),
        Seq("source"))
        .groupBy($"source")
        .agg(array_sort(collect_list(struct($"dim", $"cx"))).as("pairs"))
        .select($"source", transform($"pairs", p => p("cx")).as("cemb"))
      cent.as("a")
        .join(broadcast(cent.as("b")), $"a.source" < $"b.source")
        .select($"a.source".as("src_a"), $"b.source".as("src_b"),
          (floor(cosine($"a.cemb", $"b.cemb") * 10000 + 0.5) / 10000)
            .as("cos"))
        .orderBy($"src_a", $"src_b")
    },

    // Embedding-space anisotropy / collapse diagnostics (Mu & Viswanath
    // ICLR'18 "All-but-the-Top", Ethayarajh EMNLP'19): the
    // representation-quality readout a pipeline runs before trusting
    // cosine-based dedup/retrieval — a collapsed embedding space (one
    // dominant direction, large common mean) makes every cosine look high.
    // Computed on a DETERMINISTIC BOUNDED SAMPLE (TakeOrdered 512 by
    // (md5(vec_id), vec_id) — the standard PCA-diagnostic practice, and
    // the scale design: one corpus pass selects the sample + counts, and
    // every downstream cost is O(sample·d²) REGARDLESS of corpus size):
    // sample mean, centered d² covariance via single-level vec-ordered
    // folds (the bounded sample caps every fold buffer, so no bucketing
    // needed), the top eigenvalue via 4 deterministic power-iteration
    // rounds (all-ones start, ordered-fold matvec — no convergence
    // tolerance, both engines replay the exact double sequence), PC1's
    // variance share, ‖μ‖², and the mean-offset share ‖μ‖²/E‖x‖². On the
    // isotropic fixture var_explained sits at the 1/d floor and
    // anisotropy near 0 — collapsed real embeddings spike both
    // (spec-planted); the OPERATOR is the deliverable.
    q("q247_embedding_anisotropy", {
      def fold(listExpr: String): String =
        s"list_reduce(list_prepend(0.0, $listExpr), (p, q) -> p + q)"
      def vfold(structList: String, field: String): String =
        fold(s"list_transform(list_sort($structList), q -> q.$field)")
      def round(r: Int, prev: String): String =
        s"""w$r AS (
           |  SELECT i, list_sort(list(struct_pack(j := j, p := c * vj)))
           |           AS ps
           |  FROM cov JOIN $prev USING (j) GROUP BY i),
           |ws$r AS (SELECT i, ${fold("list_transform(ps, q -> q.p)")} AS w
           |         FROM w$r),
           |nr$r AS (SELECT sqrt(${fold(
                "list_transform(list_sort(list(struct_pack(i := i, " +
                  "p := w * w))), q -> q.p)")}) AS nrm
           |         FROM ws$r),
           |v$r AS (SELECT i AS j, w / (SELECT nrm FROM nr$r) AS vj
           |        FROM ws$r)""".stripMargin
      s"""WITH eall AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |  FROM embeddings),
         |smp AS (
         |  SELECT vec_id, emb FROM eall
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         |  LIMIT $anisotropySample),
         |ex AS (SELECT vec_id, generate_subscripts(emb, 1) - 1 AS dim,
         |              unnest(emb) AS x FROM smp),
         |mu AS (
         |  SELECT dim AS md,
         |    ${vfold("list(struct_pack(v := vec_id, x := x))", "x")}
         |      / CAST(COUNT(*) AS BIGINT) AS m
         |  FROM ex GROUP BY dim),
         |cent AS (SELECT vec_id, dim, x - m AS cx
         |         FROM ex JOIN mu ON dim = md),
         |pr AS (SELECT a.dim AS i, b.dim AS j, a.vec_id AS vec_id,
         |              a.cx * b.cx AS x
         |       FROM cent a JOIN cent b ON a.vec_id = b.vec_id),
         |cov AS (
         |  SELECT i, j,
         |    ${vfold("list(struct_pack(v := vec_id, x := x))", "x")}
         |      / CAST(COUNT(*) AS BIGINT) AS c
         |  FROM pr GROUP BY i, j),
         |v0 AS (SELECT DISTINCT i AS j, CAST(1 AS DOUBLE) AS vj FROM cov),
         |${round(1, "v0")},
         |${round(2, "v1")},
         |${round(3, "v2")},
         |${round(4, "v3")},
         |tr AS (SELECT ${fold(
              "list_transform(list_sort(list(struct_pack(i := i, " +
                "c := c))), q -> q.c)")} AS tr
         |       FROM cov WHERE i = j),
         |mu2 AS (SELECT ${fold(
              "list_transform(list_sort(list(struct_pack(md := md, " +
                "p := m * m))), q -> q.p)")} AS mu2
         |        FROM mu),
         |cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM eall),
         |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sample FROM smp)
         |SELECT n_corpus, n_sample,
         |  floor(tr * 1000000 + 0.5) / 1000000 AS trace_var,
         |  floor(nrm * 1000000 + 0.5) / 1000000 AS lambda1,
         |  floor(nrm / tr * 10000 + 0.5) / 10000 AS var_explained,
         |  floor(mu2 * 1000000 + 0.5) / 1000000 AS mean_sq_norm,
         |  floor(mu2 / (tr + mu2) * 10000 + 0.5) / 10000 AS anisotropy
         |FROM cnt, ns, tr, nr4, mu2""".stripMargin
    }) { spark =>
      import spark.implicits._
      // raw float[] straight into the sampler: AnisotropyDiag widens
      // float→double exactly AFTER sampling, so the per-corpus-row toD
      // cast (and the spread shuffle that parallelized it) are gone — the
      // corpus pass is now just md5(vec_id) + a bounded TakeOrdered.
      anisotropyOf(spark.table("embeddings")
        .select($"vec_id", $"embedding".as("emb")))
    },

    // Matryoshka truncation-fidelity eval (Kusupati et al., NeurIPS'22 —
    // the storage/serving question behind MRL embeddings: can the FIRST d
    // dims stand in for all 64?): rank the probe set by truncated cosine
    // at d ∈ {8, 16, 32} and measure top-5 recall against the exact
    // 64-dim ranking. ONE corpus×probes pass computes all four cosines
    // (the prefix slices share the scan — at 100 TB this is the read;
    // a production index would materialize the d-dim prefix column), the
    // four rank windows share the qid partitioning over probe-bounded
    // relations, and recall is exact integer counting over r4-ranked
    // tops with cid tiebreaks — fully hash-checked, unlike the
    // randomized-ANN rows-only paths. On isotropic fixture vectors the
    // curve is the noise floor (recall rises with d); real MRL-trained
    // embeddings would saturate early — the OPERATOR is the deliverable.
    q("q215_matryoshka_eval", matryoshkaOracleSql) { spark =>
      import spark.implicits._
      val e = embeddingsD(spark)
      val probes = e.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"emb".as("qemb"))
      def cosAt(d: Int): Column = graft.api.Canon.r4(
        cosine(slice($"qemb", 1, d), slice($"emb", 1, d)))
      val scored = e.join(broadcast(probes), $"vec_id" =!= $"qid")
        .select($"qid" +: $"vec_id".as("cid") +:
          matryoshkaDims.map(d => cosAt(d).as(s"cos$d")): _*)
        .localCheckpoint() // one scan feeds all four rankings
      def top5(d: Int): DataFrame = {
        val w = Window.partitionBy($"qid")
          .orderBy(col(s"cos$d").desc, $"cid".asc)
        scored.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
          .select($"qid", $"cid")
      }
      val full = top5(64).localCheckpoint() // joined by every truncation
      val fullN = full.agg(count(lit(1)).cast(LongType).as("n_full"))
      matryoshkaDims.filter(_ != 64).map { d =>
        top5(d).join(full, Seq("qid", "cid"), "left_semi")
          .agg(count(lit(1)).cast(LongType).as("n_matches"))
          .select(lit(d).as("dims"), $"n_matches")
      }.reduce(_ unionByName _)
        .crossJoin(broadcast(fullN))
        .select($"dims", $"n_matches", $"n_full",
          (floor($"n_matches".cast(DoubleType) / $"n_full" * 10000 + 0.5)
            / 10000).as("recall_at5"))
        .orderBy($"dims")
    })

  /** q215's truncation grid (64 = the exact reference ranking). */
  private[graft] val matryoshkaDims = Seq(8, 16, 32, 64)

  /** q215's oracle: identical one-pass truncated cosines, identical
    * r4-ranked top-5s, exact integer recall counting. */
  private lazy val matryoshkaOracleSql: String = {
    def cosD(d: Int) = graft.api.Canon.Oracle.r4(
      ivfCosSql(s"p.qemb[1:$d]", s"e.emb[1:$d]"))
    val cosCols = matryoshkaDims.map(d => s"${cosD(d)} AS cos$d")
      .mkString(",\n         ")
    val tops = matryoshkaDims.map(d =>
      s"""t$d AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |           ROW_NUMBER() OVER (PARTITION BY qid
         |                              ORDER BY cos$d DESC, cid) AS rn
         |    FROM sc) r
         |  WHERE rn <= 5)""".stripMargin).mkString(",\n")
    val unions = matryoshkaDims.filter(_ != 64).map(d =>
      s"""SELECT $d AS dims, CAST(COUNT(*) AS BIGINT) AS n_matches
         |FROM t$d JOIN t64 USING (qid, cid)""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |           FROM embeddings),
       |p AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 10),
       |sc AS (
       |  SELECT p.qid, e.vec_id AS cid,
       |         $cosCols
       |  FROM e JOIN p ON e.vec_id <> p.qid),
       |$tops,
       |nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_full FROM t64),
       |m AS (
       |$unions)
       |SELECT CAST(dims AS INT) AS dims, n_matches, nf.n_full,
       |  floor(CAST(n_matches AS DOUBLE) / nf.n_full * 10000 + 0.5) / 10000
       |    AS recall_at5
       |FROM m CROSS JOIN nf
       |ORDER BY dims""".stripMargin
  }

  /** MMR selection depth (q189). */
  private[graft] val mmrK = 5

  /** q211's expansion rounds (6 centers total with the seed). */
  private[graft] val kcenterRounds = 5

  /** q211's Gonzalez k-center rounds over any (vec_id, embedding, n) frame
    * — (sel_round, vec_id, radius), unordered. Exposed private[graft] so
    * ScaleProbe times the exact production shape. */
  private[graft] def kcenterCoresetOf(normed: DataFrame,
      rounds: Int): DataFrame = {
    import normed.sparkSession.implicits._
    val e = normed.localCheckpoint() // feeds the seed pick + the state init
    val seed = e.orderBy($"vec_id").limit(1)
      .select($"vec_id".as("cid"), $"embedding".as("cemb"), $"n".as("cn"))
      .localCheckpoint() // feeds the state init AND the exclusion list
    // Gonzalez incremental form (r18): carry each point's running min
    // distance to the chosen centers and score only the NEW center per
    // round — O(k·n) distance evals instead of O(k²·n), and no per-round
    // corpus exchange (the old shape exploded corpus×centers rows into a
    // groupBy(vec_id)). Bit-identical to the unrolled oracle: per-center
    // distances are r4-rounded before the min on both engines, and min
    // over a set equals the running pairwise min exactly (no accumulation
    // error in MIN). Center points stay in the state with d(x,x) = 0 —
    // they are excluded at pick time by the anti-join, exactly like the
    // oracle's NOT EXISTS, so the argmax trajectory cannot diverge even
    // on a degenerate all-ties corpus.
    def dTo(cemb: Column, cn: Column): Column =
      lit(1.0) - graft.api.Canon.r4(dot($"embedding", cemb) / ($"n" * cn))
    var state = e.crossJoin(broadcast(seed))
      .select($"vec_id", $"embedding", $"n",
        dTo($"cemb", $"cn").as("dmin"))
      .localCheckpoint() // feeds the pick AND the next round's update
    var centIds = seed.select($"cid")
    var out: DataFrame = null
    for (r <- 1 to rounds) {
      val m = state
        .join(broadcast(centIds.select($"cid".as("xcid"))),
          $"vec_id" === $"xcid", "left_anti")
        .orderBy($"dmin".desc, $"vec_id").limit(1)
        .localCheckpoint() // feeds the output row AND the state update
      val row = m.select(lit(r).as("sel_round"), $"vec_id",
        graft.api.Canon.r4($"dmin").as("radius"))
      out = if (out == null) row else out.unionByName(row)
      centIds = centIds.unionByName(m.select($"vec_id".as("cid")))
      if (r < rounds) // the last winner needs no state refresh
        state = state
          .crossJoin(broadcast(m.select($"embedding".as("cemb"),
            $"n".as("cn"))))
          .select($"vec_id", $"embedding", $"n",
            least($"dmin", dTo($"cemb", $"cn")).as("dmin"))
          .localCheckpoint() // feeds the pick AND the next update
    }
    out
  }

  /** q211's oracle: the identical farthest-point rounds, generated. */
  private lazy val kcenterOracleSql: String = {
    val cos = graft.api.Canon.Oracle
      .r4("(list_dot_product(v.emb, c.emb) / (v.n * c.n))")
    val rounds = (1 to kcenterRounds).map { r =>
      s"""sc$r AS (
         |  SELECT v.vec_id, MIN(1.0 - $cos) AS dmin
         |  FROM e v JOIN e c
         |    ON c.vec_id IN (SELECT cid FROM cents${r - 1})
         |   AND v.vec_id <> c.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM cents${r - 1} x
         |                    WHERE x.cid = v.vec_id)
         |  GROUP BY v.vec_id),
         |m$r AS (SELECT vec_id, dmin FROM sc$r
         |        ORDER BY dmin DESC, vec_id LIMIT 1),
         |sel$r AS (SELECT vec_id, dmin, $r AS sel_round FROM m$r
         |          UNION ALL SELECT vec_id, dmin, sel_round FROM sel${r - 1}),
         |cents$r AS (SELECT cid FROM cents${r - 1}
         |            UNION ALL SELECT vec_id FROM m$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS ($withNormSql),
       |cents0 AS (SELECT MIN(vec_id) AS cid FROM e),
       |sel0 AS (SELECT CAST(NULL AS BIGINT) AS vec_id,
       |                CAST(NULL AS DOUBLE) AS dmin,
       |                CAST(NULL AS INT) AS sel_round WHERE 1 = 0),
       |$rounds
       |SELECT sel_round, vec_id,
       |  ${graft.api.Canon.Oracle.r4("dmin")} AS radius
       |FROM sel$kcenterRounds
       |ORDER BY sel_round""".stripMargin
  }

  /** q193's oracle: the shared k-means replay (identical training run to
    * q83/q119) + centroid-distance silhouette, same r6/r4 margins and
    * vec_id-sorted folds as the Spark side. */
  private lazy val clusterQualityOracleSql: String = {
    val fold = (f: String) =>
      s"list_reduce(list_prepend(0.0, list_transform(l, x -> x.$f)), " +
        "(p, q) -> p + q) / len(l)"
    s"""WITH $ivfListsCtes,
       |ad AS (
       |  SELECT l.vec_id, l.cl AS own, c.cl AS cc,
       |         1.0 - ${graft.api.Canon.Oracle.r6(ivfCosSql("l.emb", "c.cemb"))} AS d
       |  FROM lists l, cent$ivfIters c),
       |per AS (
       |  SELECT vec_id, own,
       |         MAX(CASE WHEN cc = own THEN d END) AS a,
       |         MIN(CASE WHEN cc <> own THEN d END) AS b
       |  FROM ad GROUP BY vec_id, own),
       |sil AS (SELECT vec_id, own, a, b,
       |        (b - a) / (CASE WHEN a >= b THEN a ELSE b END) AS s FROM per),
       |arr AS (SELECT own AS cl,
       |        list_sort(list(struct_pack(v := vec_id, a := a, s := s))) AS l
       |        FROM sil GROUP BY own)
       |SELECT cl, CAST(len(l) AS BIGINT) AS n_vecs,
       |  ${graft.api.Canon.Oracle.r4(fold("a"))} AS mean_intra,
       |  ${graft.api.Canon.Oracle.r4(fold("s"))} AS mean_silhouette
       |FROM arr ORDER BY cl""".stripMargin
  }

  /** q189's oracle: the identical 5-round greedy unrolled as CTEs. Rounds
    * are generated, not hand-copied, so the Spark loop and the SQL agree by
    * construction: round t scores the not-yet-selected candidates
    * 0.7·rel − 0.3·MAX(sim to sel_{t−1}) and picks the (sc DESC, cid) head
    * per qid. */
  private lazy val mmrOracleSql: String = {
    val rounds = (2 to mmrK).map { t =>
      s"""r$t AS (
         |  SELECT c.qid, c.cid,
         |         0.7 * c.rel - 0.3 * (
         |           SELECT MAX(p.sim) FROM pairs p
         |           WHERE p.qid = c.qid AND p.a = c.cid
         |             AND p.b IN (SELECT s.cid FROM sel${t - 1} s
         |                         WHERE s.qid = c.qid)) AS sc
         |  FROM cands c
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} s
         |                    WHERE s.qid = c.qid AND s.cid = c.cid)),
         |p$t AS (SELECT qid, cid, sc, ROW_NUMBER() OVER (
         |          PARTITION BY qid ORDER BY sc DESC, cid) rn FROM r$t),
         |sel$t AS (SELECT * FROM sel${t - 1} UNION ALL
         |          SELECT qid, cid, sc, $t AS sel_rank FROM p$t
         |          WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS ($withNormSql),
       |sc AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS cid, b.emb AS emb, b.n AS n,
       |         ${graft.api.Canon.Oracle.r4("(list_dot_product(a.emb, b.emb) / (a.n * b.n))")} AS rel
       |  FROM e a JOIN e b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < 3),
       |cands AS (
       |  SELECT qid, cid, emb, n, rel FROM (
       |    SELECT qid, cid, emb, n, rel,
       |           ROW_NUMBER() OVER (PARTITION BY qid
       |                              ORDER BY rel DESC, cid) rn
       |    FROM sc) t WHERE rn <= 16),
       |pairs AS (
       |  SELECT x.qid AS qid, x.cid AS a, y.cid AS b,
       |         ${graft.api.Canon.Oracle.r4("(list_dot_product(x.emb, y.emb) / (x.n * y.n))")} AS sim
       |  FROM cands x JOIN cands y ON x.qid = y.qid AND x.cid <> y.cid),
       |r1 AS (SELECT qid, cid, 0.7 * rel - 0.3 * 0.0 AS sc FROM cands),
       |p1 AS (SELECT qid, cid, sc, ROW_NUMBER() OVER (
       |         PARTITION BY qid ORDER BY sc DESC, cid) rn FROM r1),
       |sel1 AS (SELECT qid, cid, sc, 1 AS sel_rank FROM p1 WHERE rn = 1),
       |$rounds
       |SELECT qid, sel_rank, cid,
       |  ${graft.api.Canon.Oracle.r4("sc")} AS mmr_score
       |FROM sel$mmrK
       |ORDER BY qid, sel_rank""".stripMargin
  }

  /** JL sketch width (projected dimensionality). */
  private[graft] val jlDims = 16

  /** Fixed ±1 projection matrix: sign j,i from the top bit of
    * md5("jl_<j>_<i>") — deterministic at build time, identical literals
    * embedded in the Spark plan and the oracle SQL. */
  private[graft] lazy val jlSigns: Array[Array[Double]] =
    Array.tabulate(jlDims, dims) { (j, i) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl_${j}_$i".getBytes("UTF-8"))
      if ((d(0) & 0x80) == 0) 1.0 else -1.0
    }

  /** UNROUNDED projected vectors (vec_id, y0..y15) — q141 rounds at the
    * surface; SimilarityDedupSpec measures distance preservation on the
    * raw values. */
  private[graft] def jlProject(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Tables.spread(spark.table("embeddings")).select(
      $"vec_id" +: (0 until jlDims).map { j =>
        val arr = array(jlSigns(j).map(lit(_)): _*)
        (dot($"embedding", arr) / 4).as(s"y$j")
      }: _*)
  }

  /** Hamming-shortlist depth: candidates per probe that pay the exact
    * re-rank. 64 ⇒ measured recall 0.86 vs exact top-5 on the fixture
    * (32 ⇒ 0.56, 96 ⇒ 0.96 — the knob trades re-rank volume for recall;
    * re-rank cost is shortlist·|probes| rows, trivial at any depth). */
  private val hammingShortlist = 64

  /** Sign-quantized codes: vec_id → two packed 32-bit sign words (`lo` =
    * dims 1–32, `hi` = dims 33–64; dim j carries weight 2^(j−1) within its
    * word). Packing runs through the codegen'd `graft_signpack32`
    * expression — one primitive loop per word over the scan's
    * UnsafeArrayData, where the equivalent interpreted
    * `aggregate(sequence(…))` fold pays per-row lambda interpretation in
    * the code-build scan (the DotProduct move, applied to quantization;
    * equality with the fold asserted in SimilarityDedupSpec). The oracle
    * sums 1<<(i−1) terms — different spelling, identical integers (exact
    * math, no IEEE concern). Codes are what a 100 TB deployment
    * materializes as the search index: 16 bytes/vector. */
  private[graft] def signCodes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    def pack(off: Int): Column =
      graft.functions.VectorExpressions.signPack32($"embedding", lit(off))
    Tables.spread(spark.table("embeddings"))
      .select($"vec_id", pack(0).as("lo"), pack(32).as("hi"))
  }

  /** q82's candidate stage over any (vec_id, emb) corpus: banded sign-LSH
    * equi-join with Hamming-1 multiprobe on the query side (probes =
    * vec_id < 10), distinct (qid, cid, qemb, cemb) out. Shared by q82's
    * scoring and ScaleProbe's candidate-volume measurement, so the probe
    * measures the real production path. `probeBits` is the multiprobe
    * knob: how many single-bit bucket perturbations each query probes in
    * addition to its exact bucket (0 = exact-bucket only; 4 = all
    * Hamming-1 neighbors, the q82 default). More probes buy recall with
    * linearly more candidate volume and NO extra corpus-side work — the
    * perturbed buckets exist only on the tiny broadcast side
    * (SimilarityDedupSpec asserts the monotone-candidates contract). */
  private[graft] def annCandidatesOf(e: DataFrame,
      probeBits: Int = 4): DataFrame = {
    import e.sparkSession.implicits._
    def banded(df: DataFrame, idAs: String, embAs: String): DataFrame =
      (0 until 4).map { bnd =>
        df.select(col("vec_id").as(idAs), col("emb").as(embAs),
          lit(bnd).as("band"), bandBucket(col("emb"), bnd).as("bucket"))
      }.reduce(_ unionAll _)
    val corpus = banded(e, "cid", "cemb")
    // multiprobe: exact bucket + `probeBits` single-bit perturbations
    val probes = banded(e.filter($"vec_id" < 10), "qid", "qemb")
      .select($"qid", $"qemb", $"band", explode(array(
        ($"bucket" :: (0 until probeBits).map(r =>
          $"bucket".bitwiseXOR(lit(1 << r))).toList): _*)).as("bucket"))
    corpus.join(broadcast(probes),
        Seq("band", "bucket")).filter($"cid" =!= $"qid")
      .select($"qid", $"cid", $"qemb", $"cemb").distinct()
  }

  private[graft] val ivfK = 10
  private[graft] val ivfIters = 3

  /** k-means init pre-sample bound: only vectors whose md5 hex prefix is
    * below this enter the init ranking window (~4/16 of the corpus here —
    * the init only needs k rows, so at 100 TB you lengthen the compared
    * prefix until the rank window sees O(k·10³) rows instead of the whole
    * corpus; the training loop itself is already scan + broadcast).
    * q59c's reproducible-sampling idiom, spelled identically in the
    * oracles, so the sampled init stays fully hash-checked. */
  private val initSampleLt = "4"

  /** DuckDB cosine spelling shared by every IVF oracle — same association
    * order as the Spark [[cosine]] helper (left-fold dot products). */
  private def ivfCosSql(a: String, b: String): String =
    s"(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * " +
      s"sqrt(list_dot_product($b, $b))))"

  /** The full deterministic-k-means CTE chain, ending in
    * `lists(vec_id, emb, cl)` — the oracle twin of
    * [[ivfCentroids]]+[[ivfAssign]], shared by q83 and q119 so both replay
    * the identical training run (md5-order init over the hash pre-sample,
    * [[ivfIters]] sorted-fold Lloyd rounds, Canon.r6-ranked assignment). */
  private def ivfListsCtes: String = {
    def asgnSql(name: String, cent: String): String =
      s"""$name AS (
         |  SELECT vec_id, emb, cl FROM (
         |    SELECT e.vec_id, e.emb, c.cl,
         |           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |             ${graft.api.Canon.Oracle.r6(ivfCosSql("e.emb", "c.cemb"))} DESC,
         |             c.cl) AS rn
         |    FROM e, $cent c) t
         |  WHERE rn = 1)""".stripMargin
    def meansSql(i: Int): String =
      s"""${meanFoldSql(i.toString, s"asgn$i", "emb", Seq("cl"))},
         |cent${i + 1} AS (
         |  SELECT cl, list_transform(
         |           list_sort(list(struct_pack(dim := dim, cx := cx))),
         |           p -> p.cx) AS cemb
         |  FROM ct$i GROUP BY cl)""".stripMargin
    val iterCtes = (0 until ivfIters)
      .map(i => asgnSql(s"asgn$i", s"cent$i") + ",\n" + meansSql(i))
      .mkString(",\n")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |cent0 AS (
       |  SELECT cl, cemb FROM (
       |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cl,
       |           emb AS cemb
       |    FROM e
       |    WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '$initSampleLt') t
       |  WHERE cl < $ivfK),
       |$iterCtes,
       |${asgnSql("lists", s"cent$ivfIters")}""".stripMargin
  }

  /** One Lloyd assignment pass: nearest centroid per vector by IEEE-floor-
    * rounded cosine (Canon.r6), centroid-id tiebreak → (vec_id, emb, cl).
    * One corpus scan against the broadcast centroid table; the row_number
    * window partitions by vec_id, so the "shuffle" is k rows per vector. */
  // --- Product quantization (q104b): M=4 subspaces × K=8 centroids ---
  private val pqM = 4
  private val pqK = 8
  private val pqIters = 2
  private val pqSub = 16 // 64 dims / 4 subspaces

  /** Squared Euclidean via three bit-identical dot products. */
  private def pqDist(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  private def pqSubSql(src: String, m: Int) =
    s"$src[${m * pqSub + 1}:${(m + 1) * pqSub}]"
  private def pqDistSql(a: String, b: String) =
    s"(list_dot_product($a, $a) - 2 * list_dot_product($a, $b)" +
      s" + list_dot_product($b, $b))"

  /** Oracle WITH-body replaying the full PQ training run: defines `e`
    * (double vectors), per-subspace `v$m`, `cent$m$i` codebooks, and the
    * final per-subspace assignments `f$m` (vec_id, sub, code, cdist) plus
    * trained codebooks `cent$m$pqIters`. Shared by q104b/q104c. */
  private def pqTrainSql: String = {
    def asgn(name: String, vm: String, cent: String, keepDist: Boolean) = {
      val cols = if (keepDist) "vec_id, sub, code, cdist"
        else "vec_id, sub, code"
      s"""$name AS (
         |  SELECT $cols FROM (
         |    SELECT v.vec_id, v.sub, c.code,
         |           ${graft.api.Canon.Oracle.r6(pqDistSql("v.sub", "c.cemb"))} AS cdist,
         |           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |             ${graft.api.Canon.Oracle.r6(pqDistSql("v.sub", "c.cemb"))} ASC,
         |             c.code) AS rn
         |    FROM $vm v, $cent c) t
         |  WHERE rn = 1)""".stripMargin
    }
    def means(m: Int, i: Int) =
      s"""${meanFoldSql(s"$m$i", s"am$m$i", "sub", Seq("code"))},
         |cent$m${i + 1} AS (
         |  SELECT code, list_transform(
         |           list_sort(list(struct_pack(dim := dim, cx := cx))),
         |           p -> p.cx) AS cemb
         |  FROM ct$m$i GROUP BY code)""".stripMargin
    val perM = (0 until pqM).map { m =>
      val vm = s"v$m"
      val init =
        s"""$vm AS (SELECT vec_id, ${pqSubSql("emb", m)} AS sub FROM e),
           |cent${m}0 AS (
           |  SELECT code, cemb FROM (
           |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
           |             vec_id) - 1 AS code,
           |           sub AS cemb
           |    FROM $vm
           |    WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '$initSampleLt') t
           |  WHERE code < $pqK)""".stripMargin
      val iters = (0 until pqIters).map(i =>
        asgn(s"am$m$i", vm, s"cent$m$i", keepDist = false) + ",\n" +
          means(m, i)).mkString(",\n")
      s"$init,\n$iters,\n" +
        asgn(s"f$m", vm, s"cent$m$pqIters", keepDist = true)
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |$perM""".stripMargin
  }

  /** (vec_id, m, sub): the m-th 16-dim slice of every vector. */
  private def pqSlices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    embeddingsD(spark)
      .select($"vec_id", $"emb",
        explode(array((0 until pqM).map(lit): _*)).as("m"))
      .select($"vec_id", $"m",
        slice($"emb", $"m" * pqSub + 1, lit(pqSub)).as("sub"))
  }

  /** Nearest-centroid assignment across ALL subspaces at once: vecs
    * (vec_id, m, sub) join the (m, code, cemb) codebooks on m, rank by
    * (r6 distance, code) within (m, vec_id) — the rounding keeps the rank
    * identical cross-engine. */
  private def pqAssignAll(vecs: DataFrame, cent: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    val w = Window.partitionBy($"m", $"vec_id").orderBy($"cdist".asc, $"code".asc)
    vecs.join(broadcast(cent), "m")
      .select($"m", $"vec_id", $"sub", $"code",
        graft.api.Canon.r6(pqDist($"sub", $"cemb")).as("cdist"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"m", $"vec_id", $"sub", $"code", $"cdist")
  }

  /** Deterministic codebooks for ALL subspaces trained jointly — one
    * DataFrame keyed by m, so the 4 trainings share every job instead of
    * running 4 serial loops (init = first-K slices per m in md5(vec_id)
    * order over the [[initSampleLt]] hash pre-sample, so the per-subspace
    * rank window sees a bounded sample, never the corpus; `pqIters` Lloyd
    * rounds with two-level bucketed means ([[meanFold]] — the q83 pattern,
    * Euclidean instead of cosine). The quantization pass itself is one
    * broadcast-join scan. Memoized per (session, fixture dir) — see
    * [[trainedMemo]]. */
  private def pqCodebooks(spark: SparkSession): DataFrame =
    memoTrained(spark, "pq")(pqCodebooksFresh(spark))

  private[graft] def pqCodebooksFresh(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val vecs = pqSlices(spark)
    var cent = vecs
      .withColumn("h", md5($"vec_id".cast("string").cast("binary")))
      .filter(substring($"h", 1, 1) < initSampleLt)
      .withColumn("code", row_number().over(
        Window.partitionBy($"m").orderBy($"h", $"vec_id")) - 1)
      .filter($"code" < pqK).select($"m", $"code", $"sub".as("cemb"))
      .localCheckpoint()
    for (_ <- 1 to pqIters) {
      cent = meanFold(
        pqAssignAll(vecs, cent)
          .select($"m", $"code", $"vec_id",
            posexplode($"sub").as(Seq("dim", "x"))),
        Seq("m", "code"))
        .groupBy($"m", $"code")
        .agg(array_sort(collect_list(struct($"dim", $"cx"))).as("ps"))
        .select($"m", $"code", transform($"ps", p => p("cx")).as("cemb"))
        .localCheckpoint()
    }
    cent
  }

  private[graft] def ivfAssign(spark: SparkSession, cent: DataFrame): DataFrame =
    assignOf(embeddingsD(spark), cent)

  /** q135's per-label class means (plabel, pemb) via the two-level bucketed
    * [[meanFold]] — a trained artifact like the k-means centroids, memoized
    * per (session, fixture dir) ([[trainedMemo]]). */
  private[graft] def classPrototypes(spark: SparkSession): DataFrame =
    memoTrained(spark, "proto") {
      import spark.implicits._
      val e = Tables.spread(spark.table("embeddings"))
        .select($"vec_id", $"label", toD($"embedding").as("emb"))
      meanFold(
        e.select($"label", $"vec_id", posexplode($"emb").as(Seq("dim", "x"))),
        Seq("label"))
        .groupBy($"label")
        .agg(array_sort(collect_list(struct($"dim", $"cx"))).as("pairs"))
        .select($"label".as("plabel"),
          transform($"pairs", p => p("cx")).as("pemb"))
    }

  private[graft] def assignOf(e: DataFrame, cent: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val w = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cl".asc)
    e.crossJoin(broadcast(cent))
      .select($"vec_id", $"emb", $"cl",
        graft.api.Canon.r6(cosine($"emb", $"cemb")).as("ccos"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"vec_id", $"emb", $"cl")
  }

  /** Trained-artifact memo — [[Memo.cached]] under a `trained:` kind
    * prefix: q83/q119/q193/q104b/q104c/q135 each consume the IDENTICAL
    * deterministic training run (fixed init order, fixed iteration count,
    * order-pinned folds), so bench reps, Verify, and the specs train once
    * per (JVM session, dir) and share the ≤ k·M-row localCheckpoint'ed
    * result instead of replaying Lloyd rounds per query (r08: the five
    * k-means-family bench regressions were exactly this cost ×5). The
    * oracle replays training from the same constants either way, so
    * memoization cannot change any result — SimilarityDedupSpec asserts
    * memo == fresh training bit-for-bit. Keying/lifecycle contract
    * (register-bound views only, generation bump on rebind, release on
    * session close — ADVICE r09) lives with [[Memo]]. */
  private def memoTrained(spark: SparkSession, kind: String)(
      train: => DataFrame): DataFrame =
    Memo.cached(spark, s"trained:$kind")(train)

  /** Deterministic k-means centroids (cl, cemb): md5-order init over the
    * [[initSampleLt]] hash pre-sample + ivfIters Lloyd rounds with
    * two-level bucketed means ([[meanFold]]). The init's global row_number
    * window ranks only the deterministic sample (the init needs just k
    * rows — tune the sample bound, not the window, as the corpus grows);
    * the training loop is scan + broadcast + bounded-buffer mean folds —
    * no aggregation buffer is ever cluster-sized. Memoized per
    * (session, fixture dir) — see [[trainedMemo]]. */
  private[graft] def ivfCentroids(spark: SparkSession): DataFrame =
    memoTrained(spark, "ivf")(centroidsOf(embeddingsD(spark), ivfK))

  private[graft] def centroidsOf(e: DataFrame, k: Int): DataFrame = {
    import e.sparkSession.implicits._
    val init = e
      .withColumn("h", md5($"vec_id".cast("string").cast("binary")))
      .filter(substring($"h", 1, 1) < initSampleLt)
      .withColumn("cl", row_number().over(Window.orderBy($"h", $"vec_id")) - 1)
      .filter($"cl" < k).select($"cl", $"emb".as("cemb"))
    var cent = init.localCheckpoint()
    for (_ <- 1 to ivfIters) {
      val means = meanFold(
        assignOf(e, cent)
          .select($"cl", $"vec_id", posexplode($"emb").as(Seq("dim", "x"))),
        Seq("cl"))
        .groupBy($"cl")
        .agg(array_sort(collect_list(struct($"dim", $"cx"))).as("pairs"))
        .select($"cl", transform($"pairs", p => p("cx")).as("cemb"))
      cent = means.localCheckpoint()
    }
    cent
  }

  /** Bucket count of the two-level mean fold — with the §2C rule that k
    * grows with the corpus (bounded cluster width), the per-bucket member
    * array is bounded by width/B, independent of corpus size (ScaleProbe's
    * meanfold line measures it). */
  private[graft] val meanFoldBuckets = 64

  /** Scale-safe "mean of x per (keys, dim)" — the q184 two-level bucketed
    * fold: members bucket by md5(vec_id) % [[meanFoldBuckets]] inside each
    * (keys, dim) cell, each bucket folds its VALUE-sorted members (so no
    * aggregation buffer ever holds a cluster-sized array — the flat
    * sorted-fold spelling collected ~cluster/k values into ONE buffer,
    * an OOM at 10¹⁰ vectors), then the B partials fold in bucket order.
    * Both levels are order-pinned, so every oracle replays the identical
    * IEEE association ([[meanFoldSql]]). Input carries (keys…, vec_id,
    * dim, x); output is (keys…, dim, cx). */

  private def meanFold(exploded: DataFrame, keys: Seq[String]): DataFrame = {
    import exploded.sparkSession.implicits._
    val kd = (keys :+ "dim").map(col)
    exploded
      .withColumn("bkt",
        conv(substring(md5($"vec_id".cast("string").cast("binary")), 1, 8),
          16, 10).cast(LongType) % meanFoldBuckets)
      .groupBy(kd :+ $"bkt": _*)
      .agg(sort_array(collect_list($"x")).as("xs"))
      .select(kd ++ Seq($"bkt",
        aggregate($"xs", lit(0.0), _ + _).as("s"),
        size($"xs").cast(LongType).as("n")): _*)
      .groupBy(kd: _*)
      .agg(sort_array(collect_list(struct($"bkt", $"s"))).as("ps"),
        sum($"n").as("n"))
      .select(kd :+ ((aggregate($"ps", lit(0.0),
        (acc, p) => acc + p.getField("s")) / $"n").as("cx")): _*)
  }

  /** Oracle twin of [[meanFold]]: the CTE chain `ex/bk/cd/cp/cg/ct$prefix`
    * from `src` (carrying `keys`, vec_id, and array column `arrCol`) to
    * `ct$prefix`(keys…, dim, cx) — same bucketing (first 8 md5 hex chars of
    * the vec_id string as uint32, mod [[meanFoldBuckets]]), same per-bucket
    * value-sorted fold, same bucket-ordered fold of partials. */
  private def meanFoldSql(prefix: String, src: String, arrCol: String,
      keys: Seq[String]): String = {
    val k = keys.mkString(", ")
    s"""ex$prefix AS (SELECT $k, vec_id,
       |                generate_subscripts($arrCol, 1) - 1 AS dim,
       |                unnest($arrCol) AS x FROM $src),
       |bk$prefix AS (SELECT $k, dim,
       |                CAST(CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
       |                                          1, 8))
       |                          AS UBIGINT) % $meanFoldBuckets AS BIGINT)
       |                  AS bkt, x
       |              FROM ex$prefix),
       |cd$prefix AS (SELECT $k, dim, bkt, list_sort(list(x)) AS xs
       |              FROM bk$prefix GROUP BY $k, dim, bkt),
       |cp$prefix AS (SELECT $k, dim, bkt,
       |                list_reduce(list_prepend(0.0, xs), (p, q) -> p + q)
       |                  AS s,
       |                CAST(len(xs) AS BIGINT) AS n
       |              FROM cd$prefix),
       |cg$prefix AS (SELECT $k, dim,
       |                list_sort(list(struct_pack(bkt := bkt, s := s))) AS ps,
       |                CAST(SUM(n) AS BIGINT) AS n
       |              FROM cp$prefix GROUP BY $k, dim),
       |ct$prefix AS (SELECT $k, dim,
       |                list_reduce(list_prepend(0.0,
       |                  list_transform(ps, p -> p.s)), (p, q) -> p + q) / n
       |                  AS cx
       |              FROM cg$prefix)""".stripMargin
  }

  /** q247's sample cap: diagnostics run on the TakeOrdered-by-hash top
    * [[anisotropySample]] vectors, so every downstream fold buffer and the
    * d²-cell covariance cost are corpus-independent. */
  private[graft] val anisotropySample = 512

  /** q247's full computation over any (vec_id, emb double[]|float[])
    * corpus — deterministic bounded sample, then the ENTIRE diagnostic
    * (sample mean, centered d² covariance, 4 power-iteration rounds,
    * trace/‖μ‖²) as ONE compiled fold over the collected vec-sorted sample
    * ([[graft.functions.VectorExpressions.AnisotropyDiag]], r19 — the q197
    * in-row technique; every double sequence matches the oracle's sorted
    * left folds exactly, see the expression's scaladoc). Replaces the
    * r12-r18 shape of 5 localCheckpoints + 4 rounds × 2 jobs (~15 Spark
    * jobs, 4.6 s at sf0.1) with 2 jobs: the TakeOrdered sample+collect and
    * the corpus count. The sample is bounded at [[anisotropySample]]×d, so
    * the single-row fold is corpus-independent by design. Exposed for the
    * planted-collapse liveness spec (the fixture is isotropic, so the
    * spiking direction needs crafted vectors). */
  private[graft] def anisotropyOf(eall: DataFrame): DataFrame = {
    import eall.sparkSession.implicits._
    // one corpus pass: the TakeOrdered hash sample (bounded at any scale)
    val smp = eall
      .withColumn("h", md5($"vec_id".cast("string").cast(BinaryType)))
      .orderBy($"h", $"vec_id").limit(anisotropySample)
      .select($"vec_id", $"emb")
    val diag = smp
      .agg(sort_array(collect_list(struct($"vec_id", $"emb"))).as("rows"))
      .select(size($"rows").cast(LongType).as("n_sample"),
        graft.functions.VectorExpressions.anisotropyDiag($"rows").as("g"))
    eall.agg(count(lit(1)).cast(LongType).as("n_corpus"))
      .crossJoin(broadcast(diag))
      .select($"n_corpus", $"n_sample",
        (floor($"g.tr" * 1000000 + 0.5) / 1000000).as("trace_var"),
        (floor($"g.nrm" * 1000000 + 0.5) / 1000000).as("lambda1"),
        (floor($"g.nrm" / $"g.tr" * 10000 + 0.5) / 10000)
          .as("var_explained"),
        (floor($"g.mu2" * 1000000 + 0.5) / 1000000).as("mean_sq_norm"),
        (floor($"g.mu2" / ($"g.tr" + $"g.mu2") * 10000 + 0.5) / 10000)
          .as("anisotropy"))
  }

  /** Mean-fold cell sizes (cl, dim, bkt, n) of a trained k-means run over
    * `e` — ScaleProbe's boundedness line for the k-means family: with the
    * §2C rule that k grows with the corpus, the largest aggregation buffer
    * the two-level training fold ever sorts is cluster/B ≈ corpus/(k·B),
    * CONSTANT as the corpus grows (the flat fold's corpus/k buffer is what
    * it replaces). */
  private[graft] def meanFoldBucketSizes(e: DataFrame, k: Int): DataFrame = {
    import e.sparkSession.implicits._
    assignOf(e, centroidsOf(e, k))
      .select($"cl", $"vec_id", posexplode($"emb").as(Seq("dim", "x")))
      .withColumn("bkt",
        conv(substring(md5($"vec_id".cast("string").cast("binary")), 1, 8),
          16, 10).cast(LongType) % meanFoldBuckets)
      .groupBy($"cl", $"dim", $"bkt").agg(count(lit(1)).as("n"))
  }

  /** q119's candidate stage over any (vec_id, emb) corpus: all within-
    * cluster pairs of a k-means assignment — the join volume SemDeDup pays
    * BEFORE the cosine threshold. The §2C design rule says k grows with the
    * corpus (bounded cluster width ⇒ pair volume ∝ n·width); ScaleProbe
    * measures exactly that by scaling k with n. */
  private[graft] def semdedupCandidatesOf(e: DataFrame, k: Int): DataFrame = {
    import e.sparkSession.implicits._
    val lists = assignOf(e, centroidsOf(e, k)).select($"vec_id", $"cl")
    lists.select($"cl", $"vec_id".as("id_a"))
      .join(lists.select($"cl".as("clb"), $"vec_id".as("id_b")),
        $"cl" === $"clb" && $"id_a" < $"id_b")
      .select($"id_a", $"id_b")
  }

  /** k ceiling for [[semdedupCandidatesAtScale]]: Lloyd training +
    * assignment cost is n·k cosines per round, so the §2C "k grows with
    * the corpus" rule — which keeps PAIR volume linear — makes the
    * DISTANCE work quadratic once k rides n. ScaleProbe r11 measured it:
    * 45× wall-time at a 16× corpus for the flat shape, against 16× for
    * every capped family. */
  private[graft] val semdedupKMax = 256

  /** SemDeDup candidates in the at-scale shape: k capped at
    * [[semdedupKMax]] (training + assignment stay O(n·kMax) — linear in
    * the corpus) and within-cluster enumeration routed through the salted
    * hot-bucket cap exactly like q73's LSH buckets, so a wider-than-cap
    * cluster contributes ≤ C(cap, 2) pairs per salt chunk instead of
    * C(width, 2), with the same dropped-pair accounting story as q73c.
    * IDENTICAL to [[semdedupCandidatesOf]] whenever k ≤ kMax and no
    * cluster exceeds the cap — the fixture regime, spec-pinned in
    * SimilarityDedupSpec; beyond the cap the recall trade is explicit,
    * and the banded sign-LSH route (q82) remains the recall-accounted
    * alternative. ScaleProbe times THIS shape at 16×. */
  private[graft] def semdedupCandidatesAtScale(e: DataFrame, k: Int,
      cap: Int = DedupQueries.defaultBucketCap): DataFrame = {
    import e.sparkSession.implicits._
    val lists = assignOf(e, centroidsOf(e, math.min(k, semdedupKMax)))
      .select($"vec_id", $"cl")
    DedupQueries.saltedBucketPairs(
      lists.select(lit(0).as("band"), $"cl".cast("string").as("bh"),
        $"vec_id".as("doc_id")),
      cap)
      .select($"id_a", $"id_b")
  }
}
