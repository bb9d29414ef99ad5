package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.api.{GraftQuery, QueryModule}
import graft.sources.Tables

/** Event-time windowing over `events` (SURVEY.md §2B streaming). The same
  * `window`/`session_window` expressions drive Structured Streaming
  * (`readStream` + watermark — exercised in StreamingSpec with MemoryStream);
  * here they run in batch mode so results stay deterministic and
  * oracle-checkable — the SURVEY §5.2.3 "streaming-vs-batch equivalence"
  * strategy: the oracle expresses the identical bucketing in portable SQL.
  *
  * Money-sum columns cast to DECIMAL(18,4) before SUM (float-sum hazard,
  * SURVEY.md §7.4). Scale: all three are single-shuffle hash aggregates on
  * (window, key); sliding windows fan out ×(size/slide) at the map side
  * before the shuffle — the standard cost, no driver involvement.
  */
object StreamingQueries extends QueryModule {

  def queries: Seq[GraftQuery] = Seq(

    // Tumbling 1-hour windows per event_type.
    q("q95_tumbling_window",
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |       COUNT(*) AS n,
        |       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS total
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY ws, event_type""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("events")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          round(sum($"value".cast("decimal(18,4)")).cast("double"), 4).as("total"))
        .select($"window.start".as("ws"), $"event_type", $"n", $"total")
        .orderBy($"ws", $"event_type")
    },

    // Sliding 1-hour windows every 30 minutes: each event lands in 2
    // windows. Oracle = union of the two aligned tumbling grids.
    q("q96_sliding_window",
      """WITH grid AS (
        |  SELECT '1970-01-01'::TIMESTAMP +
        |           INTERVAL (floor((epoch(ts) - off) / 3600) * 3600 + off) SECOND AS ws,
        |         value
        |  FROM events, (SELECT unnest([0, 1800]) AS off) offs)
        |SELECT ws, COUNT(*) AS n,
        |       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS total
        |FROM grid
        |GROUP BY ws
        |ORDER BY ws""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("events")
        .groupBy(window($"ts", "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"),
          round(sum($"value".cast("decimal(18,4)")).cast("double"), 4).as("total"))
        .select($"window.start".as("ws"), $"n", $"total")
        .orderBy($"ws")
    },

    // Real readStream ingest: the events parquet consumed as a file-source
    // stream (declared schema, ns→µs conversion as in batch), aggregated
    // with Trigger.AvailableNow into a memory sink. Complete-mode counts are
    // exactly the batch answer — which is what the oracle asserts.
    qDir("q94_stream_ingest",
      """SELECT event_type, COUNT(*) AS n,
        |       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS total
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // the file source needs a directory; select just the events file
      val stream = Tables.eventsStream(spark, dir)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(18,4)")).as("total"))
      val q = stream.writeStream.format("memory").queryName("graft_stream_ingest")
        .outputMode(OutputMode.Complete).trigger(Trigger.AvailableNow).start()
      try q.awaitTermination() finally q.stop()
      spark.table("graft_stream_ingest")
        .select($"event_type", $"n",
          round($"total".cast("double"), 4).as("total"))
        .orderBy($"event_type")
    },

    // Session windows: 10-minute inactivity gap per user. Oracle =
    // gaps-and-islands (new session when gap ≥ 10 min — Spark's session
    // window [ts, ts+gap) does NOT merge an event at exactly prev+gap).
    q("q97_session_window",
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, new_s DESC
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        |FROM sess
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("events")
        .groupBy(session_window($"ts", "10 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", $"session_window.start".as("session_start"),
          $"n_events")
        .orderBy($"user_id", $"session_start")
    },

    // Streaming exact dedup with a DETERMINISTIC keep rule: the documents
    // parquet consumed as a file-source stream, one stateful aggregate per
    // content hash keeping the min-doc_id owner's lang (min_by is
    // order-insensitive where dropDuplicates' "first seen" is not — that
    // nondeterminism is why the streaming-dedup row was unit-only until
    // now). Complete-mode state = one row per distinct content hash; the
    // oracle replays the identical keep rule in batch SQL.
    qDir("q111_stream_dedup",
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_unique
        |FROM (
        |  SELECT md5(text) AS h, arg_min(lang, doc_id) AS lang
        |  FROM documents GROUP BY md5(text))
        |GROUP BY lang
        |ORDER BY lang""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val stream = spark.readStream.schema(Tables.documents)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir)
        .select(md5($"text".cast("binary")).as("h"), $"lang", $"doc_id")
        .groupBy($"h")
        .agg(min_by($"lang", $"doc_id").as("lang"))
      val q = stream.writeStream.format("memory").queryName("graft_stream_dedup")
        .outputMode(OutputMode.Complete).trigger(Trigger.AvailableNow).start()
      try q.awaitTermination() finally q.stop()
      spark.table("graft_stream_dedup")
        .groupBy($"lang").agg(count(lit(1)).as("n_unique"))
        .orderBy($"lang")
    })

  /** Streaming incremental LSH candidate pairs: dedup an ARRIVING corpus
    * against everything seen so far — the training-pipeline shape where
    * crawl batches land continuously and each new document must be checked
    * against the full history without rescanning it.
    *
    * Input is the banded signature stream (band, bh, doc_id) — the same
    * rows the batch path buckets (DedupQueries.minhashBandRowsOf); state is
    * per-(band, bh) bucket: the ids seen in that bucket, CAPPED at `cap`
    * exactly like the batch hot-bucket guard (a degenerate bucket keeps its
    * first `cap` members; a new doc in a full bucket still pairs against
    * those members, so work per arrival is O(cap), never O(bucket)). Each
    * arriving doc emits one candidate pair per stored earlier member —
    * incremental cost O(cap · bands) per doc, state size O(buckets · cap),
    * both independent of corpus age. Within a micro-batch, rows are
    * processed in doc_id order so stream == batch on ordered replays
    * (StreamingSpec asserts set equality with saltedBucketPairs).
    *
    * flatMapGroupsWithState (not dropDuplicates) because the semantics are
    * "emit the COLLISION", not "drop the row" — the pair feeds the same
    * downstream components/keep-best machinery as the batch path. */
  private[graft] def incrementalBandPairs(
      bands: org.apache.spark.sql.Dataset[(Int, String, Long)],
      cap: Int): org.apache.spark.sql.Dataset[(Long, Long)] = {
    import bands.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    bands.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Seq[Long], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          var seen = state.getOption.getOrElse(Seq.empty[Long])
          val out = Seq.newBuilder[(Long, Long)]
          rows.map(_._3).toSeq.sorted.foreach { id =>
            if (!seen.contains(id)) {
              seen.foreach(prev =>
                out += ((math.min(prev, id), math.max(prev, id))))
              if (seen.size < cap) seen = seen :+ id
            }
          }
          state.update(seen)
          out.result().iterator
      }
  }

  /** q198's Holt level/trend recursion as STREAMING per-key state: daily
    * counts arrive per (series key, day, count) in event-time order (the
    * operator's contract — upstream is the watermarked daily rollup, which
    * emits days in order once the watermark passes) and each arrival
    * advances the (t, l, b) state by exactly one textbook step. Emits the
    * state after every update; the LAST emission per key must equal the
    * batch fold — StreamingSpec asserts bit equality against q198's maths.
    * State is 3 numbers per series: O(keys) memory at any scale. */
  private[graft] def holtStreamingState(
      rows: org.apache.spark.sql.Dataset[(String, Long, Long)],
      alpha: Double, beta: Double)
      : org.apache.spark.sql.Dataset[(String, Long, Double, Double)] = {
    import rows.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double, Double),
        (String, Long, Double, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, batch, state) =>
          var (t, l, b) = state.getOption.getOrElse((0L, 0.0, 0.0))
          // within a micro-batch, apply strictly in day order
          batch.toSeq.sortBy(_._2).foreach { case (_, _, c) =>
            val y = c.toDouble
            if (t == 0L) { t = 1L; l = y; b = 0.0 }
            else if (t == 1L) { t = 2L; b = y - l; l = y }
            else {
              val l2 = alpha * y + (1 - alpha) * (l + b)
              b = beta * (l2 - l) + (1 - beta) * b
              l = l2
              t += 1
            }
          }
          state.update((t, l, b))
          Iterator((key, t, l, b))
      }
  }

  /** q112's per-user EWMA recursion as STREAMING state — the unbounded-user
    * regime the batch query's BOUND note points here: where the batch fold
    * holds one array per user sized by that user's event count, this holds
    * TWO fixed-width values (count, running ewma) per user, O(1) at any
    * event volume. Built on Spark 4's `transformWithState`
    * StatefulProcessor API (the arbitrary-state successor of
    * flatMapGroupsWithState; requires the RocksDB state store provider).
    * Rows apply in (tus, event_id) order within a micro-batch — the same
    * event-time contract as [[holtStreamingState]] — and the update is the
    * identical non-reassociated IEEE sequence α·v + (1−α)·acc, so the last
    * emission per user equals q112's batch fold bit-for-bit (StreamingSpec
    * asserts equality across a micro-batch boundary). */
  private[graft] class EwmaProcessor(alpha: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long, Double), (Long, Long, Double)] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("ewma",
        org.apache.spark.sql.Encoders.product[(Long, Double)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, Long, Double)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Double)] = {
      var (n, e) = if (st.exists()) st.get() else (0L, 0.0)
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
        e = if (n == 0L) r._4 else alpha * r._4 + (1 - alpha) * e
        n += 1
      }
      st.update((n, e))
      Iterator((user, n, e))
    }
  }

  /** (user_id, tus, event_id, value) stream → per-user (user_id, n_events,
    * ewma) updates via [[EwmaProcessor]]. */
  private[graft] def ewmaStreamingState(
      rows: org.apache.spark.sql.Dataset[(Long, Long, Long, Double)],
      alpha: Double): org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .transformWithState(new EwmaProcessor(alpha),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }

  /** q163's CUSUM drift monitor as STREAMING per-key state — the shape a
    * pipeline actually deploys it in (daily ingest volumes arrive as the
    * watermarked rollup closes each day; the monitor must not rescan
    * history). Where the batch query computes the closed form S_t = P_t −
    * min(0, min_{j≤t} P_j) with two windows, the stream runs the textbook
    * Page recursion S_t = max(0, S_{t−1} + x_t − c) directly — the two are
    * the same fold (the closed form IS the recursion unrolled), and every
    * quantity is an INTEGER, so stream == batch is exact equality, not an
    * epsilon (StreamingSpec asserts it across a micro-batch boundary).
    * State per key is four Longs — O(1) at any event volume, vs the batch
    * window's O(days) partition. The reference `c` is a training-time
    * constant (the batch query derives it from the corpus mean; a deployed
    * monitor pins it from the training window). */
  private[graft] class CusumProcessor(c: Long, alarmAt: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long), (Long, Long, Long, Long)] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[
      (Long, Long, Long, Long)] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long, Long)]("cusum",
        org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long, Long)] = {
      var (s, mx, nDays, nAlarm) =
        if (st.exists()) st.get() else (0L, 0L, 0L, 0L)
      // within a micro-batch, apply strictly in day order (the event-time
      // contract shared with Holt/EWMA: upstream emits closed days in order)
      rows.toSeq.sortBy(_._2).foreach { case (_, _, cnt) =>
        s = math.max(0L, s + cnt - c)
        mx = math.max(mx, s)
        nDays += 1
        if (s >= alarmAt) nAlarm += 1
      }
      st.update((s, mx, nDays, nAlarm))
      Iterator((user, nDays, mx, nAlarm))
    }
  }

  /** (user_id, day, cnt) stream → per-user (user_id, n_days, max_cusum,
    * n_alarm_days) updates via [[CusumProcessor]] — the streaming twin of
    * q163's output columns. */
  private[graft] def cusumStreamingState(
      rows: org.apache.spark.sql.Dataset[(Long, Long, Long)],
      c: Long, alarmAt: Long)
      : org.apache.spark.sql.Dataset[(Long, Long, Long, Long)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .transformWithState(new CusumProcessor(c, alarmAt),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }

  /** q223's sequence packing as STREAMING per-block state — the continuous
    * ingestion shape: documents arrive in doc_id order per block (the
    * operator's contract, like the Holt/EWMA/CUSUM event-time rule) and
    * each arrival either extends the block's open pack or seals it and
    * opens the next. State per block is three Longs (open pack id, fill,
    * position) — O(1) at any corpus size, and a block never reopens a
    * sealed pack, so emissions are FINAL on arrival (append semantics in
    * spirit, though emitted through the Update sink like the other twins).
    * Every quantity is an integer, so stream == batch is exact equality
    * with q223's oracle-checked rows (StreamingSpec, across a micro-batch
    * boundary). */
  private[graft] class PackingProcessor(budget: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long), (Long, Long, Long, Long, Long)] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[
      (Long, Long, Long)] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("pack",
        org.apache.spark.sql.Encoders.product[(Long, Long, Long)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(blk: Long,
        rows: Iterator[(Long, Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long, Long, Long)] = {
      var (pack, fill, pos) =
        if (st.exists()) st.get() else (0L, 0L, 0L)
      val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
      rows.toSeq.sortBy(_._2).foreach { case (_, docId, n) =>
        if (pack == 0L || fill + n > budget) { pack += 1; fill = n; pos = 1 }
        else { fill += n; pos += 1 }
        out += ((docId, blk, pack, pos, n))
      }
      st.update((pack, fill, pos))
      out.result().iterator
    }
  }

  /** (blk, doc_id, n_tokens) stream → (doc_id, blk, pack_id, pack_pos,
    * n_tokens) assignments via [[PackingProcessor]]. */
  private[graft] def packingStreamingState(
      rows: org.apache.spark.sql.Dataset[(Long, Long, Long)],
      budget: Long)
      : org.apache.spark.sql.Dataset[(Long, Long, Long, Long, Long)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .transformWithState(new PackingProcessor(budget),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }

  /** q161's HLL distinct-count sketch as STREAMING per-key state — the
    * mergeable-sketch-at-ingestion shape (a monitor keeps "distinct users
    * per event type" live without storing user ids): state is the 64-byte
    * register array itself, and the register update is MAX — commutative,
    * associative, idempotent — so stream == batch is EXACT register
    * equality whatever the arrival order or micro-batch split, with no
    * ordering contract at all (unlike the fold twins). The per-batch
    * emission carries the same register checksum and estimate q161
    * surfaces; the estimate's Σ 1/2^m is a sum of dyadic rationals, exact
    * in a double in ANY order (q161's partition-invariance argument), so
    * the last emission matches the oracle-checked batch rows bit-for-bit
    * after the shared r4 floor-round. State per key: 64 bytes, O(1) at any
    * event volume. The bucket/rho derivation replays q161's md5 split
    * independently in Scala (first 8 hex → bucket mod 64, next 8 →
    * 33 − bitlength). */
  private[graft] class HllProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long), (String, Long, Double)] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[Array[Byte]] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[Array[Byte]]("hll",
        org.apache.spark.sql.Encoders.BINARY,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(eventType: String,
        rows: Iterator[(String, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(String, Long, Double)] = {
      val reg = if (st.exists()) st.get() else new Array[Byte](64)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.foreach { case (_, userId) =>
        md.reset()
        val hex = md.digest(userId.toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        val bucket = (java.lang.Long.parseLong(hex.substring(0, 8), 16)
          % 64).toInt
        val w = java.lang.Long.parseLong(hex.substring(8, 16), 16)
        val rho =
          (if (w == 0L) 33
           else 33 - java.lang.Long.toBinaryString(w).length).toByte
        if (rho > reg(bucket)) reg(bucket) = rho
      }
      st.update(reg)
      var checksum = 0L
      var s = 0.0
      var b = 0
      while (b < 64) {
        checksum += reg(b).toLong * (b + 1)
        s += 1.0 / (1L << reg(b)).toDouble
        b += 1
      }
      Iterator((eventType, checksum, 0.709 * 4096 / s))
    }
  }

  /** (event_type, user_id) stream → per-type (event_type, reg_checksum,
    * estimate) sketch updates via [[HllProcessor]]. */
  private[graft] def hllStreamingState(
      rows: org.apache.spark.sql.Dataset[(String, Long)])
      : org.apache.spark.sql.Dataset[(String, Long, Double)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .transformWithState(new HllProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }

  /** Independent Scala replay of q118's Gopher repetition keep rule — the
    * SAME tokenization (`split(lower(text), " ")` semantics: -1 limit keeps
    * trailing empties, an empty doc is one empty token) and the SAME IEEE
    * double divisions/literals as the batch Catalyst expressions, so the
    * per-doc verdict is bit-identical, not merely close. */
  private[graft] object RepetitionGate {
    def keep(text: String): Boolean = {
      val toks = text.toLowerCase.split(" ", -1)
      val n = toks.length.toLong
      val uc = toks.groupBy(identity).map(_._2.length.toLong)
      val topUni = uc.max
      val dupToks = uc.filter(_ > 1L).sum
      val (topBi, nBi) =
        if (toks.length < 2) (0L, 0L)
        else {
          val bc = (0 until toks.length - 1)
            .map(i => toks(i) + " " + toks(i + 1))
            .groupBy(identity).map(_._2.size.toLong)
          (bc.max, bc.sum)
        }
      val dupR = dupToks.toDouble / n
      val uniR = topUni.toDouble / n
      val biR = if (nBi == 0L) 0.0 else topBi.toDouble / nBi
      dupR <= 0.85 && uniR <= 0.11 && biR <= 0.05
    }
  }

  /** q118's repetition gate as STREAMING per-lang state — the ingest-time
    * deployment the quality-gate family is FOR (gates run as documents
    * arrive, not as a post-hoc batch pass). Per-doc scoring is STATELESS
    * ([[RepetitionGate.keep]], an independent replay of the batch
    * expressions); what the stream keeps is the per-lang admission monitor
    * a pipeline watches at ingestion: (n_docs, n_keep) — two Longs per
    * lang, O(1) state at any corpus size. All quantities are integers, so
    * stream == batch is EXACT equality with the oracle-checked q118 rows
    * rolled up per lang (StreamingSpec, across a micro-batch boundary). */
  private[graft] class RepetitionGateProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, String), (String, Long, Long)] {
    @transient private var st:
        org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("gate",
        org.apache.spark.sql.Encoders.product[(Long, Long)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(lang: String,
        rows: Iterator[(String, Long, String)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(String, Long, Long)] = {
      var (nDocs, nKeep) = if (st.exists()) st.get() else (0L, 0L)
      // doc_id order within a micro-batch — the shared event-time contract
      rows.toSeq.sortBy(_._2).foreach { case (_, _, text) =>
        nDocs += 1
        if (RepetitionGate.keep(text)) nKeep += 1
      }
      st.update((nDocs, nKeep))
      Iterator((lang, nDocs, nKeep))
    }
  }

  /** (lang, doc_id, text) stream → per-lang (lang, n_docs, n_keep) gate
    * monitor updates via [[RepetitionGateProcessor]]. */
  private[graft] def repetitionGateStreamingState(
      rows: org.apache.spark.sql.Dataset[(String, Long, String)])
      : org.apache.spark.sql.Dataset[(String, Long, Long)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .transformWithState(new RepetitionGateProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }

  // ---- incremental semantic dedup (q119's ingestion twin, VERDICT r11 #7)

  /** Exact replica of the batch scoring chain: the codegen'd
    * `graft_dot` left fold (s += a(i)·b(i) in index order), the same
    * division shape `dot/(√dot·√dot)`, then the Canon floor-round — so a
    * streaming cosine equals the batch column bit-for-bit. */
  private[graft] def cosScala(a: Array[Double], b: Array[Double],
      scale: Double): Double = {
    def dot(x: Array[Double], y: Array[Double]): Double = {
      val n = math.min(x.length, y.length)
      var s = 0.0d; var i = 0
      while (i < n) { s += x(i) * y(i); i += 1 }
      s
    }
    math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      * scale + 0.5) / scale
  }

  /** The FROZEN-cluster assignment an arriving embedding gets — the same
    * argmax the batch `assignOf` computes (r6-rounded cosine DESC, cluster
    * id ASC) against the memoized, already-trained centroids. Incremental
    * ingestion never re-trains: the cluster structure is the trained
    * artifact, new vectors only route through it. */
  private[graft] def semdedupAssign(emb: Array[Double],
      cents: Seq[(Int, Array[Double])]): Int =
    cents.map { case (cl, cemb) => (cl, cosScala(emb, cemb, 1e6)) }
      .sortBy { case (cl, c) => (-c, cl) }.head._1

  /** q119's drop rule as per-cluster streaming state: each arriving
    * embedding compares against every ALREADY-ARRIVED member of its
    * cluster with a lower id (kept or dropped — the batch pair surface
    * conditions only on id order), emits a drop row (dropped, keeper =
    * lowest matching id, cluster, that pair's r4 cosine) when any r4
    * cosine clears τ, then joins the cluster state itself. State is the
    * cluster's member list — bounded by cluster width, the same bound the
    * batch per-cluster pair join rides; rows apply in vec_id order within
    * a micro-batch and the ingestion contract is id-ordered arrival (the
    * event-time contract every twin here shares). */
  private[graft] class SemdedupProcessor(tau: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Int, (Int, Long, Array[Double]), (Long, Long, Int, Double)] {
    @transient private var st: org.apache.spark.sql.streaming.ListState[
      (Long, Array[Double])] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getListState[(Long, Array[Double])]("members",
        org.apache.spark.sql.Encoders.product[(Long, Array[Double])],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(cl: Int,
        rows: Iterator[(Int, Long, Array[Double])],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Int, Double)] = {
      val members = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Array[Double])]
      members ++= st.get()
      val out = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Int, Double)]
      rows.toSeq.sortBy(_._2).foreach { case (_, id, emb) =>
        val hits = members.iterator
          .filter { case (ida, _) => ida < id }
          .map { case (ida, ea) => (ida, cosScala(ea, emb, 1e4)) }
          .filter { case (_, c) => c >= tau }
        if (hits.hasNext) {
          val (keeper, cos) = hits.minBy(_._1)
          out += ((id, keeper, cl, cos))
        }
        members += ((id, emb))
        st.appendValue((id, emb))
      }
      out.iterator
    }
  }

  /** (cl, vec_id, emb) stream → (dropped, keeper, cl, cos) drop rows via
    * [[SemdedupProcessor]] at q119's τ = 0.4. */
  private[graft] def semdedupStreamingState(
      rows: org.apache.spark.sql.Dataset[(Int, Long, Array[Double])])
      : org.apache.spark.sql.Dataset[(Long, Long, Int, Double)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .transformWithState(new SemdedupProcessor(0.4),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }
}
