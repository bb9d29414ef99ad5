package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.{GraftQuery, QueryModule}

/** Multimodal columns (SURVEY.md §2C): image/audio/video payloads modeled as
  * opaque `BinaryType` columns alongside a typed metadata struct, exactly the
  * way the reference treats its payloads as opaque bytes it frames but never
  * interprets (/root/reference/gateway/relay.go:12-30,
  * /root/reference/mysql/conn.go:177-199).
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic stub ([[MultimodalQueries.decodeStub]]);
  * everything around it — schema, binary handling, per-partition batch
  * iteration, frame slicing, feature vectors — is real Spark plumbing that a
  * codec drop-in would inherit unchanged.
  *
  * The media "table" derives deterministically from `documents` (payload =
  * UTF-8 bytes of `text`), so metadata queries stay oracle-checkable in
  * DuckDB (octet_length over the same derivation).
  *
  * Scale design: payloads never reach the driver; feature extraction is
  * mapPartitions (one JVM pass per parquet split, no shuffle); frame
  * sampling is a per-row generator (explode) feeding a groupBy keyed on
  * doc_id — uniform keys, clean shuffle.
  */
object MultimodalQueries extends QueryModule {

  /** Typed media row: opaque payload + declared metadata (the §1.3 model:
    * BLOB column + fixed-schema struct). */
  final case class Media(doc_id: Long, format: String, width: Int,
      height: Int, payload: Array[Byte])

  /** === STUB === Real deployments decode payload bytes with an image/audio
    * codec here (not present in this container). The stub derives a
    * deterministic 16-bin byte histogram "feature vector" from the raw
    * payload instead — same signature, same batch shape, drop-in
    * replaceable. Double precision throughout so the DuckDB oracle replays
    * the identical IEEE divisions/squares (q91 is hash-checked). */
  private def decodeStub(m: Media): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < m.payload.length) {
      hist((m.payload(i) & 0xff) >> 4) += 1d
      i += 1
    }
    val n = math.max(1, m.payload.length).toDouble
    hist.map(_ / n)
  }

  /** documents → media table: payload = text bytes; metadata derived
    * deterministically from doc_id (same expressions in the oracle). */
  private def media(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.table("documents").select(
      $"doc_id",
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          ($"doc_id" % 3 + 1).cast(IntegerType)).as("format"),
        (lit(64) + ($"doc_id" % 7) * 32).cast(IntegerType).as("width"),
        (lit(64) + ($"doc_id" % 5) * 32).cast(IntegerType).as("height")).as("meta"),
      $"text".cast(BinaryType).as("payload"))
  }

  /** q246's cut threshold: a scene cut is a step of ≥ this many of the 64
    * aHash bits between consecutive frames — far above near-dup noise
    * (q244 verifies at ≤ 3), far below the 32-bit expectation of unrelated
    * content. */
  private[graft] val sceneCutBits = 16

  /** q244/q246's shared fingerprint relation over the fixture corpus,
    * memoized per (session, fixture dir) — the standard multi-consumer
    * promotion (two queries would otherwise rebuild the frame explode +
    * ahash pass each; deterministic, so memo == fresh is spec-pinned in
    * PipelineOpsSpec). */
  private[graft] def frameSigs(spark: SparkSession): DataFrame =
    Memo.cached(spark, "frame-ahash")( // cached() does the ONE checkpoint
      frameAhashSigsRaw(spark.table("documents")))

  /** The q244/q246 oracle's shared frame-fingerprint chain: 256-byte frames
    * of `documents.text`, 64 integer cell sums each, aHash = 16 hex chars
    * (bit = cell·64 > frame total). This interpreted spelling IS the
    * semantic definition; the Spark side computes it with the codegen'd
    * `graft_ahash16` (bit-identical on the fixture's ASCII contract). */
  private val ahashSigCtes: String =
    """idx AS (
      |  SELECT doc_id, text,
      |         unnest(range(0, greatest(
      |           CAST(ceil(length(text) / 256.0) AS INT), 1))) AS i
      |  FROM documents),
      |fr AS (
      |  SELECT doc_id, i,
      |         substring(text, CAST(i * 256 + 1 AS INT), 256) AS frame
      |  FROM idx),
      |cel AS (
      |  SELECT doc_id, i,
      |    list_transform(range(1, 65), c ->
      |      ascii(substr(frame, CAST(c * 4 - 3 AS INT), 1)) +
      |      ascii(substr(frame, CAST(c * 4 - 2 AS INT), 1)) +
      |      ascii(substr(frame, CAST(c * 4 - 1 AS INT), 1)) +
      |      ascii(substr(frame, CAST(c * 4 AS INT), 1))) AS cells
      |  FROM fr),
      |tot AS (SELECT doc_id, i, cells,
      |        list_reduce(cells, (a, b) -> a + b) AS total FROM cel),
      |sig AS (
      |  SELECT doc_id, i, doc_id * 4096 + i AS fid,
      |    array_to_string(list_transform(range(1, 17), j ->
      |      substr('0123456789abcdef',
      |        (CASE WHEN cells[4 * j - 3] * 64 > total THEN 8 ELSE 0 END) +
      |        (CASE WHEN cells[4 * j - 2] * 64 > total THEN 4 ELSE 0 END) +
      |        (CASE WHEN cells[4 * j - 1] * 64 > total THEN 2 ELSE 0 END) +
      |        (CASE WHEN cells[4 * j] * 64 > total THEN 1 ELSE 0 END) + 1,
      |        1)), '') AS ahash
      |  FROM tot)""".stripMargin

  def queries: Seq[GraftQuery] = Seq(

    // Metadata-plane query: group by format, count + payload byte volume +
    // dimension stats. Binary column is scanned but never interpreted —
    // the opaque-payload contract.
    q("q90_media_meta",
      """SELECT format, COUNT(*) AS n_media,
        |       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
        |       MIN(width) AS min_w, MAX(width) AS max_w,
        |       MIN(height) AS min_h, MAX(height) AS max_h
        |FROM (
        |  SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
        |              WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
        |         CAST(64 + (doc_id % 7) * 32 AS INT) AS width,
        |         CAST(64 + (doc_id % 5) * 32 AS INT) AS height,
        |         octet_length(CAST(text AS BLOB)) AS bytes
        |  FROM documents) m
        |GROUP BY format
        |ORDER BY format""".stripMargin) { spark =>
      import spark.implicits._
      media(spark)
        .groupBy($"meta.format".as("format"))
        .agg(count(lit(1)).as("n_media"),
          sum(length($"payload").cast(LongType)).as("total_bytes"),
          min($"meta.width").as("min_w"), max($"meta.width").as("max_w"),
          min($"meta.height").as("min_h"), max($"meta.height").as("max_h"))
        .orderBy($"format")
    },

    // Decode + feature-extract over typed Dataset[Media] via mapPartitions:
    // the real 100 TB shape (per-partition batch, zero shuffle, payloads
    // stay on executors). Decode itself is the marked stub above — whose
    // byte-histogram maths the oracle replays bin-by-bin (ascii >> 4 over
    // the same ASCII bytes, same double divisions, same 0..15 fold order),
    // so even the stub pipeline is hash-checked end to end.
    q("q91_feature_extract",
      """WITH chars AS (
        |  SELECT doc_id, (ascii(substring(text, i, 1)) >> 4) AS bin
        |  FROM (SELECT doc_id, text,
        |          unnest(range(1, length(text) + 1)) AS i FROM documents) t),
        |bins AS (SELECT doc_id, bin, COUNT(*) AS c FROM chars GROUP BY 1, 2),
        |tot AS (SELECT doc_id, SUM(c) AS n FROM bins GROUP BY doc_id),
        |parts AS (
        |  SELECT b.doc_id,
        |         list_sort(list(struct_pack(bin := b.bin, c := b.c))) AS bc,
        |         MAX(t.n) AS n
        |  FROM bins b JOIN tot t USING (doc_id) GROUP BY b.doc_id)
        |SELECT p.doc_id,
        |       CASE CAST(p.doc_id % 3 AS INT) WHEN 0 THEN 'png'
        |            WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
        |       floor(list_reduce(
        |         list_transform(bc, x -> (CAST(x.c AS DOUBLE) / p.n) *
        |                                 (CAST(x.c AS DOUBLE) / p.n)),
        |         (a, b) -> a + b) * 10000 + 0.5) / 10000 AS norm_sq
        |FROM parts p
        |ORDER BY p.doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val feats = media(spark)
        .select($"doc_id", $"meta.format".as("format"), $"meta.width".as("width"),
          $"meta.height".as("height"), $"payload")
        .as[Media]
        .mapPartitions { batch =>
          batch.map { m =>
            val f = decodeStub(m)
            (m.doc_id, m.format, f, f.map(x => x * x).sum)
          }
        }
        .toDF("doc_id", "format", "features", "feat_norm_sq")
      feats.filter(size($"features") === 16)
        // explicit floor-based round: Spark's round() rounds the double's
        // SHORTEST DECIMAL repr while DuckDB rounds the binary value - they
        // disagree when the shortest repr lands on a half boundary (hit at
        // sf0.1). floor(x*1e4 + 0.5)/1e4 is identical IEEE maths on both.
        .select($"doc_id", $"format",
          (floor($"feat_norm_sq" * 10000 + 0.5) / 10000).as("norm_sq"))
        .orderBy($"doc_id")
    },

    // Frame sampling: treat the payload as a frame container (256-byte
    // frames), keep every 4th frame, fingerprint each kept frame. The
    // slice→explode generator runs per-row in codegen; downstream agg
    // shuffles on doc_id only. Frame fingerprints use md5 (byte-identical
    // in DuckDB over the same BLOB slices) → the whole sampling pipeline is
    // oracle-checked (upgraded from rows-only in r01).
    q("q92_frame_sample",
      // the fixture text is pure ASCII at every SF (octet_length == length,
      // asserted over all SFs), so the oracle's VARCHAR substring slices the
      // same bytes Spark's binary substring does
      """WITH idx AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, greatest(
        |           CAST(ceil(length(text) / 256.0) AS INT), 1))) AS i
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, i AS frame_idx,
        |         substring(text, CAST(i * 256 + 1 AS INT), 256) AS frame
        |  FROM idx
        |  WHERE i % 4 = 0)
        |SELECT doc_id, COUNT(*) AS n_sampled,
        |       CAST(SUM(length(frame)) AS BIGINT) AS sampled_bytes,
        |       md5(array_to_string(list_sort(list(md5(frame))), ',')) AS content_sig
        |FROM fr
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { spark =>
      import spark.implicits._
      val frameSize = 256
      val nFrames = ceil(length($"payload") / lit(frameSize.toDouble))
        .cast(IntegerType)
      val frames = media(spark)
        .select($"doc_id", $"payload",
          explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))).as("frame_idx"))
        .filter($"frame_idx" % 4 === 0) // sample every 4th frame
        .select($"doc_id", $"frame_idx",
          substring($"payload", $"frame_idx" * frameSize + 1, lit(frameSize))
            .as("frame"))
      frames.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_sampled"),
          sum(length($"frame").cast(LongType)).as("sampled_bytes"),
          md5(concat_ws(",", sort_array(collect_list(md5($"frame"))))
            .cast(BinaryType)).as("content_sig"))
        .orderBy($"doc_id")
    },

    // Cross-video duplicate-frame detection — multimodal dedup: fingerprint
    // every fixed-size frame (md5 of the payload block) and find video
    // pairs sharing frames. Same bucket-join shape as the LSH text path:
    // pairs come from an equi-join on the fingerprint (never all-pairs), so
    // candidate volume scales with duplication, not corpus². Catches
    // re-uploads and shared intros/outros that metadata comparison misses.
    q("q92b_frame_dedup",
      """WITH idx AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, greatest(
        |           CAST(ceil(length(text) / 256.0) AS INT), 1))) AS i
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id,
        |         md5(substring(text, CAST(i * 256 + 1 AS INT), 256)) AS fp
        |  FROM idx)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(COUNT(DISTINCT a.fp) AS BIGINT) AS shared_frames
        |FROM fr a JOIN fr b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id
        |ORDER BY id_a, id_b""".stripMargin) { spark =>
      import spark.implicits._
      val frameSize = 256
      val nFrames = ceil(length($"payload") / lit(frameSize.toDouble))
        .cast(IntegerType)
      val fr = media(spark)
        .select($"doc_id", $"payload",
          explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))).as("i"))
        .select($"doc_id",
          md5(substring($"payload", $"i" * frameSize + 1, lit(frameSize)))
            .as("fp"))
      fr.as("a").join(fr.as("b"),
          $"a.fp" === $"b.fp" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
        .agg(countDistinct($"a.fp").cast(LongType).as("shared_frames"))
        .orderBy($"id_a", $"id_b")
    },

    // PERCEPTUAL frame near-dup (VERDICT r11 #5): q92b's md5 fingerprint is
    // defeated by a one-byte change; this is the aHash move image dedup
    // actually uses — per frame, 64 cell "brightnesses" (4-byte sums over
    // the stub-decode seam's raw bytes; a codec drop-in would feed pixel
    // blocks through the identical shape), bit i = cell_i above the frame
    // mean (all-integer: cell·64 > total), packed into 16 hex chars. Pairs:
    // 4-band Hamming-bucket join (a ≤3-bit difference leaves ≥1 band
    // intact — pigeonhole, so recall at the τ = 3 verify bar is exact
    // WITHIN a salt chunk; once a hot bucket overflows the q73 salted cap,
    // cross-chunk pairs are traded away exactly like every capped family —
    // q78b's bucket-stats machinery is the quantification pattern) then
    // the q78c packed-xor/popcount verify. Cross-video rollup only. Scale: the
    // fingerprint pass is map-side; pairs come from bucket equi-joins —
    // never all-pairs — and the verify join touches candidates only.
    q("q244_frame_perceptual_dedup", {
      val bandSelects = (0 until 4).map { b =>
        s"SELECT fid AS doc_id, $b AS band, substr(ahash, ${4 * b + 1}, 4) AS bh FROM sig"
      }.mkString("\nUNION ALL\n")
      s"""WITH $ahashSigCtes,
         |bands AS (
         |$bandSelects),
         |ranked AS (
         |  SELECT band, bh, doc_id,
         |         (ROW_NUMBER() OVER (PARTITION BY band, bh ORDER BY doc_id)
         |          - 1) // ${DedupQueries.defaultBucketCap} AS salt
         |  FROM bands),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS fa, b.doc_id AS fb
         |  FROM ranked a JOIN ranked b
         |    ON a.band = b.band AND a.bh = b.bh AND a.salt = b.salt
         |    AND a.doc_id < b.doc_id),
         |ver AS (
         |  SELECT c.fa // 4096 AS id_a, c.fb // 4096 AS id_b,
         |    CAST(bit_count(xor(('0x' || sa.ahash)::UBIGINT,
         |                       ('0x' || sb.ahash)::UBIGINT)) AS INT)
         |      AS hamming
         |  FROM cand c
         |  JOIN sig sa ON sa.fid = c.fa
         |  JOIN sig sb ON sb.fid = c.fb
         |  WHERE bit_count(xor(('0x' || sa.ahash)::UBIGINT,
         |                      ('0x' || sb.ahash)::UBIGINT)) <= 3
         |    AND c.fa // 4096 <> c.fb // 4096)
         |SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_near_frames,
         |       MIN(hamming) AS min_hamming
         |FROM ver GROUP BY id_a, id_b
         |ORDER BY id_a, id_b""".stripMargin
    }) { spark =>
      frameAhashPairsFromSigs(frameSigs(spark))
    },

    // Scene-cut detection (temporal segmentation — the other use of the
    // q244 perceptual fingerprint): a cut is a LARGE Hamming step between
    // CONSECUTIVE frames of the same video (τ_cut = 16 of 64 bits — well
    // above near-dup noise), segments are the runs between cuts — the
    // per-shot structure frame-sampling pipelines key on (sample per shot,
    // not per fixed stride). Per video: frame count, cuts, segments, the
    // longest segment, and the maximum step. All integer; the lag/step
    // windows partition by doc_id only — one shuffle, linear at any
    // corpus size (temporal comparison is per-video by construction,
    // no cross-video work at all).
    q("q246_scene_cuts",
      s"""WITH $ahashSigCtes,
         |pk AS (
         |  SELECT doc_id, i, ('0x' || ahash)::UBIGINT AS v FROM sig),
         |step AS (
         |  SELECT doc_id, i,
         |    CAST(bit_count(xor(v, lag(v) OVER
         |      (PARTITION BY doc_id ORDER BY i))) AS INT) AS ham
         |  FROM pk),
         |cut AS (
         |  SELECT doc_id, i,
         |    CASE WHEN ham >= $sceneCutBits THEN 1 ELSE 0 END AS is_cut,
         |    ham
         |  FROM step),
         |seg AS (
         |  SELECT doc_id, i, ham, is_cut,
         |    SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY i) AS seg_id
         |  FROM cut),
         |segs AS (
         |  SELECT doc_id, seg_id, CAST(COUNT(*) AS BIGINT) AS seg_len
         |  FROM seg GROUP BY doc_id, seg_id)
         |SELECT s.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_frames,
         |  CAST(SUM(s.is_cut) AS BIGINT) AS n_cuts,
         |  CAST(SUM(s.is_cut) + 1 AS BIGINT) AS n_segments,
         |  CAST(MAX(g.mx) AS BIGINT) AS longest_segment,
         |  CAST(COALESCE(MAX(s.ham), 0) AS INT) AS max_step
         |FROM seg s JOIN (SELECT doc_id, MAX(seg_len) AS mx FROM segs
         |                 GROUP BY doc_id) g ON g.doc_id = s.doc_id
         |GROUP BY s.doc_id
         |ORDER BY s.doc_id""".stripMargin) { spark =>
      sceneCutsFromSigs(frameSigs(spark))
    },

    // Content-defined chunking dedup (the FastCDC/rsync family — storage-
    // level dedup for media payloads): a rolling hash cuts each payload at
    // content-determined boundaries (min 16 / mask 6 bits / max 128
    // bytes), so a payload duplicated at a DIFFERENT byte offset still
    // yields identical chunk digests after the first boundary — the
    // property fixed-size blocks (q92's frames) lack, and the reason
    // backup/dedup systems chunk this way. Chunking runs in mapPartitions
    // (the q91/q176 opaque-byte seam; payload bytes never shuffle — only
    // (digest, len) rows do); duplicate instances are those whose digest's
    // global first occurrence (lexicographic min of (doc_id, idx) — a
    // struct min, safe at any chunks-per-payload count) is elsewhere.
    // Rows-only by contract (no rolling hash in the oracle engine);
    // PipelineOpsSpec replays the chunker byte-for-byte and proves the
    // shift-invariance property.
    qRowsOnly("q207_cdc_chunk_dedup") { spark =>
      import spark.implicits._
      val chunks = cdcChunkRowsOf(media(spark).select($"doc_id", $"payload"))
        .localCheckpoint() // feeds the first-occurrence index and the join
      val firstOwner = chunks.groupBy($"digest")
        .agg(min(struct($"doc_id", $"idx")).as("first_occ"))
      val flagged = chunks.join(firstOwner, Seq("digest"))
        .withColumn("is_dup",
          when(struct($"doc_id", $"idx") =!= $"first_occ", 1L)
            .otherwise(0L))
      val src = spark.table("documents").select($"doc_id", $"source")
      flagged.join(src, Seq("doc_id"))
        .groupBy($"source")
        .agg(count(lit(1)).cast(LongType).as("n_chunks"),
          sum($"clen").cast(LongType).as("n_bytes"),
          sum($"is_dup").cast(LongType).as("dup_chunks"),
          sum($"is_dup" * $"clen").cast(LongType).as("dup_bytes"))
        .orderBy($"source")
    },

    // Cross-modal consistency gate (VERDICT r12 "what's missing" #3 — the
    // multimodal analog of q170's embedding decontamination): join each
    // video's q244 frame-signature profile (visual modality: set-bit rate
    // of the per-frame aHashes) to its document's embedding profile (text
    // modality: mean embedding coordinate), then flag docs that are a
    // >2.5σ outlier within their label group in EXACTLY ONE modality —
    // the caption/content-mismatch candidates (an outlier in BOTH is
    // plain corruption, an outlier in NEITHER is consistent). The outlier
    // test is the integer-exact spelling (n·x − Σx)²·(n−1)·100 >
    // 625·n·(n·Σx² − (Σx)²) over exact BIGINT sums, every factor cast
    // to DOUBLE before any product (no BIGINT overflow at any scale,
    // no accumulation-order dependence anywhere) — fully hash-checkable.
    // Scale: per-doc profiles are one-pass rollups (frame sigs memoized,
    // shared with q244/q246), label stats are a |labels|-row broadcast —
    // no pair space, no corpus-sized state.
    q("q249_crossmodal_consistency",
      s"""WITH $ahashSigCtes,
         |prof AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
         |         CAST(SUM(bit_count(('0x' || ahash)::UBIGINT)) AS BIGINT)
         |           AS pop_total
         |  FROM sig GROUP BY doc_id),
         |pr AS (
         |  SELECT doc_id,
         |    CAST(floor(pop_total * 10000.0 / (64.0 * n_frames) + 0.5)
         |         AS BIGINT) AS r
         |  FROM prof),
         |em AS (
         |  SELECT vec_id AS doc_id, CAST(label AS BIGINT) AS label,
         |    CAST(floor(list_reduce(list_prepend(0.0,
         |           list_transform(embedding, x -> CAST(x AS DOUBLE))),
         |           (a, b) -> a + b) / 64.0 * 10000 + 0.5) AS BIGINT) AS e
         |  FROM embeddings),
         |j AS (
         |  SELECT pr.doc_id, em.label, pr.r, em.e
         |  FROM pr JOIN em ON em.doc_id = pr.doc_id),
         |st AS (
         |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(r) AS BIGINT) AS sum_r,
         |         CAST(SUM(r * r) AS BIGINT) AS ssq_r,
         |         CAST(SUM(e) AS BIGINT) AS sum_e,
         |         CAST(SUM(e * e) AS BIGINT) AS ssq_e
         |  FROM j GROUP BY label),
         |fl AS (
         |  SELECT j.doc_id, j.label,
         |    CASE WHEN n >= 8 AND
         |      (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) - CAST(sum_r AS DOUBLE))
         |        * (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)
         |           - CAST(sum_r AS DOUBLE))
         |        * CAST(n - 1 AS DOUBLE) * 100.0 >
         |      625.0 * CAST(n AS DOUBLE)
         |        * (CAST(n AS DOUBLE) * CAST(ssq_r AS DOUBLE)
         |           - CAST(sum_r AS DOUBLE) * CAST(sum_r AS DOUBLE))
         |      THEN 1 ELSE 0 END AS vis_out,
         |    CASE WHEN n >= 8 AND
         |      (CAST(n AS DOUBLE) * CAST(e AS DOUBLE) - CAST(sum_e AS DOUBLE))
         |        * (CAST(n AS DOUBLE) * CAST(e AS DOUBLE)
         |           - CAST(sum_e AS DOUBLE))
         |        * CAST(n - 1 AS DOUBLE) * 100.0 >
         |      625.0 * CAST(n AS DOUBLE)
         |        * (CAST(n AS DOUBLE) * CAST(ssq_e AS DOUBLE)
         |           - CAST(sum_e AS DOUBLE) * CAST(sum_e AS DOUBLE))
         |      THEN 1 ELSE 0 END AS emb_out
         |  FROM j JOIN st ON st.label = j.label)
         |SELECT label,
         |  CAST(COUNT(*) AS BIGINT) AS docs,
         |  CAST(SUM(vis_out) AS BIGINT) AS vis_outliers,
         |  CAST(SUM(emb_out) AS BIGINT) AS emb_outliers,
         |  CAST(SUM(CASE WHEN vis_out + emb_out = 1 THEN 1 ELSE 0 END)
         |       AS BIGINT) AS mismatch_docs,
         |  CAST(SUM(CASE WHEN vis_out + emb_out = 2 THEN 1 ELSE 0 END)
         |       AS BIGINT) AS both_docs,
         |  COALESCE(MIN(CASE WHEN vis_out + emb_out = 1 THEN doc_id END), -1)
         |    AS first_mismatch
         |FROM fl GROUP BY label ORDER BY label""".stripMargin) { spark =>
      crossModalOf(frameSigs(spark), spark.table("embeddings"))
    })

  /** q249's full cross-modal pipeline over any signature relation
    * (doc_id, ahash) and embedding relation (vec_id, embedding, label) —
    * exposed private[graft] so the planted-mismatch liveness spec drives
    * exactly the production chain on crafted frames/embeddings. Outlier
    * spelling: (n·x − Σx)²·(n−1)·100 > 625·n·(n·Σx² − (Σx)²) — the
    * 2.5σ sample-variance test over exact BIGINT sums with EVERY factor
    * cast to DOUBLE before any product (identical IEEE multiply order on
    * both engines; in-BIGINT products would overflow at ~3e5 docs per
    * label group — ADVICE r13). */
  private[graft] def crossModalOf(sig: DataFrame,
      embeddings: DataFrame): DataFrame = {
    import sig.sparkSession.implicits._
    val prof = sig.groupBy($"doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_frames"),
        sum(bit_count(graft.functions.VectorExpressions.hexPack16($"ahash")))
          .cast(LongType).as("pop_total"))
    val pr = prof.select($"doc_id",
      floor($"pop_total" * 10000.0 / (lit(64.0) * $"n_frames") + 0.5)
        .cast(LongType).as("r"))
    val em = embeddings.select($"vec_id".as("doc_id"),
      $"label".cast(LongType).as("label"),
      floor(aggregate($"embedding", lit(0.0),
        (a, x) => a + x.cast(DoubleType)) / 64.0 * 10000 + 0.5)
        .cast(LongType).as("e"))
    val j = pr.join(em, "doc_id")
    val st = j.groupBy($"label").agg(
      count(lit(1)).cast(LongType).as("n"),
      sum($"r").cast(LongType).as("sum_r"),
      sum($"r" * $"r").cast(LongType).as("ssq_r"),
      sum($"e").cast(LongType).as("sum_e"),
      sum($"e" * $"e").cast(LongType).as("ssq_e"))
    def outlier(x: Column, sx: Column, ssq: Column): Column = {
      // every factor cast to DOUBLE BEFORE any product (ADVICE r13):
      // n·ssq and sum² in BIGINT overflow at ~3e5 docs/label — Spark
      // (ANSI off) would wrap silently where DuckDB raises. The IEEE
      // products are identical on both engines and exact (< 2^53) at
      // every fixture SF, so hash results are unchanged.
      val nD = $"n".cast(DoubleType)
      val dd = nD * x.cast(DoubleType) - sx.cast(DoubleType)
      ($"n" >= 8) &&
        (dd * dd * ($"n" - 1).cast(DoubleType) * 100.0 >
          lit(625.0) * nD *
            (nD * ssq.cast(DoubleType) -
              sx.cast(DoubleType) * sx.cast(DoubleType)))
    }
    val fl = j.join(broadcast(st), "label").select($"doc_id", $"label",
      when(outlier($"r", $"sum_r", $"ssq_r"), 1).otherwise(0).as("vis_out"),
      when(outlier($"e", $"sum_e", $"ssq_e"), 1).otherwise(0).as("emb_out"))
    fl.groupBy($"label").agg(
      count(lit(1)).cast(LongType).as("docs"),
      sum($"vis_out").cast(LongType).as("vis_outliers"),
      sum($"emb_out").cast(LongType).as("emb_outliers"),
      sum(when($"vis_out" + $"emb_out" === 1, 1).otherwise(0))
        .cast(LongType).as("mismatch_docs"),
      sum(when($"vis_out" + $"emb_out" === 2, 1).otherwise(0))
        .cast(LongType).as("both_docs"),
      coalesce(min(when($"vis_out" + $"emb_out" === 1, $"doc_id")),
        lit(-1L)).as("first_mismatch"))
      .orderBy($"label")
  }

  /** q207's chunk relation (doc_id, idx, clen, digest) over any
    * (doc_id, payload) frame — [[cdcChunks]] run in mapPartitions (payload
    * bytes never shuffle; only digest rows do). Shared with ScaleProbe so
    * the probe's chunk-count growth line measures exactly the production
    * chunker: chunk count tracks total payload BYTES (mean chunk size is a
    * constant of the mask/min/max knobs), never the corpus pair space. */
  private[graft] def cdcChunkRowsOf(payloads: DataFrame): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          MultimodalQueries.cdcChunks(payload).zipWithIndex.map {
            case ((off, len), idx) =>
              val md = java.security.MessageDigest.getInstance("MD5")
              md.update(payload, off, len)
              (id, idx.toLong, len.toLong,
                md.digest().map("%02x".format(_)).mkString)
          }
        }
      }
      .toDF("doc_id", "idx", "clen", "digest")
  }

  /** q244's perceptual frame fingerprints over any (doc_id, text) corpus:
    * (doc_id, i, fid, ahash) — one 16-hex-char aHash per 256-byte frame
    * (64 integer cell sums, bit = cell above frame mean via cell·64 >
    * total; no doubles anywhere). `fid = doc_id·4096 + i` packs the frame
    * identity for the shared pair machinery (fixture frames per doc ≪
    * 4096; a production key stays a struct). Checkpointed: the relation
    * feeds both the band explode and the packed-XOR verify join
    * (multi-consumer rule). */
  private[graft] def frameAhashSigs(docs: DataFrame): DataFrame =
    frameAhashSigsRaw(docs).localCheckpoint()

  private[graft] def frameAhashSigsRaw(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val frameSize = 256
    val nFrames = ceil(length($"text") / lit(frameSize.toDouble))
      .cast(IntegerType)
    val frames = graft.sources.Tables.spread(docs.select($"doc_id", $"text"))
      .select($"doc_id", $"text",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))).as("i"))
      .select($"doc_id", $"i",
        substring($"text", $"i" * frameSize + 1, lit(frameSize)).as("frame"))
    // the fingerprint itself is the native codegen'd expression — the
    // interpreted-HOF spelling (64 cell lambdas × 4 ascii/substring each,
    // plus the 16-nibble CASE build) measured 3.1 s at sf0.1; the oracle
    // keeps that spelling as the semantic definition and Ahash16 is
    // bit-identical to it on the fixture's ASCII contract
    // fid packing guard (ADVICE r12): a document with ≥ 4096 frames would
    // silently collide packed frame identities — assert_true raises ON THE
    // EXECUTORS (no driver action, no silent filter) the moment an
    // out-of-contract corpus shows up; for in-contract data the coalesce
    // adds a constant 0
    frames
      .select($"doc_id", $"i",
        ($"doc_id" * 4096 + $"i" + coalesce(assert_true($"i" < 4096,
          lit("fid packing requires < 4096 frames per document"))
          .cast("bigint"), lit(0L))).as("fid"),
        graft.functions.VectorExpressions.ahash16($"frame").as("ahash"))
  }

  /** q244's (band, bh, fid-as-doc_id) Hamming-bucket rows from a signature
    * relation — split out so ScaleProbe's growth line counts exactly the
    * production candidate stage. */
  private[graft] def frameAhashBandRows(sig: DataFrame): DataFrame = {
    import sig.sparkSession.implicits._
    sig.select($"fid".as("doc_id"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          substring($"ahash", 4 * b + 1, 4).as("bh"))): _*)).as("s"))
      .select($"s.band".as("band"), $"s.bh".as("bh"), $"doc_id")
  }

  /** q244's full pair pipeline over any (doc_id, text) corpus — banded
    * Hamming buckets through the q73 salted cap, q78c packed-xor/popcount
    * verify at τ = 3, cross-doc rollup. Exposed for the planted-near-dup
    * liveness spec (the spec feeds crafted frames through exactly this). */
  private[graft] def frameAhashPairs(docs: DataFrame): DataFrame =
    frameAhashPairsFromSigs(frameAhashSigs(docs))

  private[graft] def frameAhashPairsFromSigs(sig: DataFrame): DataFrame = {
    import sig.sparkSession.implicits._
    // The r18 shape enumerated EVERY in-bucket pair (1.24M at sf0.1 — the
    // word-soup corpus has a 3702-frame hot band bucket), pushed them
    // through a distinct exchange and two verify joins back to the packed
    // signatures, and only then applied the ≤3-bit filter. r19: carry the
    // packed signature INTO the salt chunk and verify in-bucket with the
    // compiled HammingClosePairs loop — only true near-dup pairs are ever
    // materialized, so the distinct and the two joins operate on the
    // handful of survivors instead of 1.24M candidates. Same salted cap
    // (identical window → identical chunks → identical dropped-pair
    // accounting), same id_a < id_b order (members sorted by fid), same
    // hamming value — the pair SET is provably unchanged because hamming
    // is a function of the pair and distinct commutes with the filter.
    val cap = DedupQueries.defaultBucketCap
    val bandsPk = sig.select($"fid",
      graft.functions.VectorExpressions.hexPack16($"ahash").as("pk"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          substring($"ahash", 4 * b + 1, 4).as("bh"))): _*)).as("s"))
      .select($"s.band".as("band"), $"s.bh".as("bh"), $"fid", $"pk")
    val w = Window.partitionBy($"band", $"bh").orderBy($"fid")
    bandsPk
      .withColumn("salt",
        floor((row_number().over(w) - 1) / lit(cap)).cast(IntegerType))
      .groupBy($"band", $"bh", $"salt")
      .agg(sort_array(collect_list(struct($"fid", $"pk"))).as("ms"))
      .filter(size($"ms") > 1)
      .select(explode(graft.functions.VectorExpressions
        .hammingClosePairs($"ms", lit(3))).as("p"))
      .select($"p.id_a", $"p.id_b", $"p.hamming")
      // fid = doc_id·4096 + i with i < 4096 asserted at build time, so
      // shiftright 12 is the oracle's `fid // 4096` on these nonnegative ids
      .filter(shiftright($"id_a", 12) =!= shiftright($"id_b", 12))
      .distinct()
      .groupBy(shiftright($"id_a", 12).as("id_a"),
        shiftright($"id_b", 12).as("id_b"))
      .agg(count(lit(1)).cast(LongType).as("n_near_frames"),
        min($"hamming").as("min_hamming"))
      .orderBy($"id_a", $"id_b")
  }

  /** q246's full scene-cut pipeline over any (doc_id, text) corpus —
    * consecutive-frame Hamming steps on the q244 fingerprints, cuts at
    * [[sceneCutBits]], per-video segment accounting. Exposed for the
    * planted-cut liveness spec (the fixture's word-soup frames always cut,
    * so the no-cut direction needs crafted frames). */
  private[graft] def sceneCutsOf(docs: DataFrame): DataFrame =
    sceneCutsFromSigs(frameAhashSigs(docs))

  private[graft] def sceneCutsFromSigs(sig: DataFrame): DataFrame = {
    import sig.sparkSession.implicits._
    val pk = sig.select($"doc_id", $"i",
      graft.functions.VectorExpressions.hexPack16($"ahash").as("v"))
    val wOrd = Window.partitionBy($"doc_id").orderBy($"i")
    val seg = pk
      .withColumn("ham",
        bit_count($"v".bitwiseXOR(lag($"v", 1).over(wOrd)))
          .cast(IntegerType))
      .withColumn("is_cut",
        when($"ham" >= sceneCutBits, 1).otherwise(0))
      .withColumn("seg_id", sum($"is_cut").over(wOrd))
    val longest = seg.groupBy($"doc_id", $"seg_id")
      .agg(count(lit(1)).cast(LongType).as("seg_len"))
      .groupBy($"doc_id").agg(max($"seg_len").as("mx"))
    seg.groupBy($"doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_frames"),
        sum($"is_cut").cast(LongType).as("n_cuts"),
        (sum($"is_cut") + 1).cast(LongType).as("n_segments"),
        coalesce(max($"ham"), lit(0)).cast(IntegerType).as("max_step"))
      .join(longest, Seq("doc_id"))
      .select($"doc_id", $"n_frames", $"n_cuts", $"n_segments",
        $"mx".cast(LongType).as("longest_segment"), $"max_step")
      .orderBy($"doc_id")
  }

  /** The gear rolling-hash table: a deterministic Knuth-multiplicative
    * value per byte (no RNG, same on every JVM). */
  private val gear: Array[Int] =
    Array.tabulate(256)(b => (b + 1) * 0x9E3779B1)

  /** The content-defined chunker (FastCDC/gear family): h ← (h << 1) +
    * gear(byte), boundary when the TOP 6 bits vanish past the 16-byte
    * minimum, hard cap 128. The left shift expires each byte's influence
    * after 32 steps — boundary decisions depend only on the trailing
    * 32-byte window, which is what makes the chunking SHIFT-INVARIANT
    * (duplicated content at a different offset re-syncs to identical
    * chunks; the spec proves it). Pure function of the bytes. */
  private[graft] def cdcChunks(payload: Array[Byte]): Seq[(Int, Int)] = {
    val MinLen = 16; val MaxLen = 128; val Mask = 0xFC000000
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = 0
    var h = 0
    var i = 0
    while (i < payload.length) {
      h = (h << 1) + gear(payload(i) & 0xff)
      val len = i - start + 1
      if ((len >= MinLen && (h & Mask) == 0) || len >= MaxLen) {
        out += ((start, len)); start = i + 1; h = 0
      }
      i += 1
    }
    if (start < payload.length) out += ((start, payload.length - start))
    out.toSeq
  }
}
