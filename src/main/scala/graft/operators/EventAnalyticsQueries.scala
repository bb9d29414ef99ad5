package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.{Canon, GraftQuery, QueryModule}

/** Event-stream analytics over `events` — the funnel / retention queries a
  * TiDB-class HTAP backend serves its product-analytics clients (the
  * reference relays this whole query class opaquely,
  * /root/reference/gateway/relay.go:12-30; the engine executes it).
  *
  * Cross-engine determinism: every time comparison runs on INTEGER
  * MICROSECONDS (`unix_micros` in Spark after Tables.scala's ns→µs floor,
  * `epoch_ns // 1000` in DuckDB) — never on timestamp values, whose
  * sub-micro semantics differ between the engines' ns/µs representations.
  *
  * Scale design: both queries shuffle on `user_id` exactly once; the funnel's
  * four stage computations are consecutive window functions over the SAME
  * partitioning key, so Catalyst plans a single Exchange feeding four Window
  * operators (asserted in PlanSpec). No collect, no join back to the fact
  * table.
  */
object EventAnalyticsQueries extends QueryModule {

  private val funnelStages = Seq("signup", "view", "click", "purchase")

  /** q130's session-break silence threshold: 6 h in micros — near the
    * fixture's median inter-event gap (~7.3 h), so users genuinely split
    * into many sessions at every SF. */
  private[graft] val sessionGapUs = 21600000000L

  /** q168's bitmap relation: per-(event_type, word) 62-bit membership words
    * folded straight from raw events — bit_or is idempotent, so the rollup
    * is map-side combinable with NO distinct pass (exposed uncheckpointed
    * for PlanSpec's partial-aggregation assert). */
  private[graft] def bitmapWordsOf(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select($"event_type", expr("user_id div 62").as("word"),
        expr("shiftleft(cast(1 as bigint), cast(user_id % 62 as int))")
          .as("bit"))
      .groupBy($"event_type", $"word")
      .agg(expr("bit_or(bit)").as("w"))
  }

  /** q161/q171's shared HLL register relation: per-(event_type, bucket)
    * register MAX (m = 64 md5 buckets, rho from bin() length — see q161's
    * determinism scaladoc), with absent buckets floored to 0 by unioning an
    * exploded grid and re-taking MAX — never a join. Map-side combinable;
    * 512 bytes of state per event_type at any corpus size. */
  private[graft] def hllRegistersOf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val md5hex = md5($"user_id".cast(StringType).cast(BinaryType))
    val h = spark.table("events")
      .select($"event_type", $"user_id")
      .select($"event_type",
        (conv(substring(md5hex, 1, 8), 16, 10).cast(LongType) % 64)
          .as("bucket"),
        conv(substring(md5hex, 9, 8), 16, 10).cast(LongType).as("w"))
    val r = h.groupBy($"event_type", $"bucket")
      .agg(max(when($"w" === 0, 33)
        .otherwise(lit(33) - length(bin($"w")))).as("rho"))
    val grid = spark.table("events").select($"event_type").distinct()
      .select($"event_type",
        explode(sequence(lit(0L), lit(63L))).as("bucket"),
        lit(0).as("rho"))
    r.unionByName(grid)
      .groupBy($"event_type", $"bucket").agg(max($"rho").as("m"))
  }

  /** Events as (user_id, event_type, tus = integer micros). */
  private def ev(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.table("events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("tus"))
  }

  def queries: Seq[GraftQuery] = Seq(

    // Ordered funnel: a user reaches stage k iff events of types
    // stage1..stagek exist at strictly increasing times (min-completion-time
    // chaining: s1 = min signup, s2 = min view AFTER s1, ...). One shuffle:
    // all four stage columns are windows over the same user_id partitioning.
    q("q105_funnel",
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tus FROM events),
        |s1 AS (SELECT user_id, MIN(tus) AS t FROM e
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.tus) AS t FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.tus > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.tus) AS t FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.tus > s2.t GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, MIN(e.tus) AS t FROM e JOIN s3 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.tus > s3.t GROUP BY e.user_id)
        |SELECT stage_idx, stage, n_users FROM (
        |  SELECT 1 AS stage_idx, 'signup' AS stage, COUNT(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'view', COUNT(*) FROM s2
        |  UNION ALL SELECT 3, 'click', COUNT(*) FROM s3
        |  UNION ALL SELECT 4, 'purchase', COUNT(*) FROM s4) f
        |ORDER BY stage_idx""".stripMargin) { spark =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id")
      def stageMin(stage: String, after: Option[Column]): Column =
        min(when($"event_type" === stage &&
          after.map($"tus" > _).getOrElse(lit(true)), $"tus")).over(w)
      val staged = ev(spark)
        .withColumn("s1", stageMin("signup", None))
        .withColumn("s2", stageMin("view", Some($"s1")))
        .withColumn("s3", stageMin("click", Some($"s2")))
        .withColumn("s4", stageMin("purchase", Some($"s3")))
        .groupBy($"user_id")
        .agg(max($"s1").as("s1"), max($"s2").as("s2"),
          max($"s3").as("s3"), max($"s4").as("s4"))
      val counts = staged.agg(
        count($"s1").as("c1"), count($"s2").as("c2"),
        count($"s3").as("c3"), count($"s4").as("c4"))
      val stages = explode(array(funnelStages.zipWithIndex.map {
        case (name, i) =>
          struct(lit(i + 1).as("stage_idx"), lit(name).as("stage"),
            col(s"c${i + 1}").as("n_users"))
      }: _*)).as("f")
      counts.select(stages)
        .select($"f.stage_idx", $"f.stage", $"f.n_users")
        .orderBy($"stage_idx")
    },

    // Funnel time-to-convert — q105's latency complement: the same
    // chained-min stage relation, but surfacing HOW LONG each surviving
    // user took between consecutive stages (median / p90 seconds). The
    // deltas are integer micros scaled by 1e6 once; quantiles are the
    // exact interpolated QUANTILE_CONT both engines share (q27 precedent),
    // surfaced through the free-double floor-round since an interpolation
    // midpoint can land on a ROUND half boundary (q91 invariant). Scale:
    // the stage relation is the q105 single user_id exchange; the deltas
    // are ≤3 rows per converted user; the quantile rollup groups 3 keys.
    q("q177_funnel_latency",
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tus FROM events),
        |s1 AS (SELECT user_id, MIN(tus) AS t FROM e
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.tus) AS t FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.tus > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.tus) AS t FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.tus > s2.t GROUP BY e.user_id),
        |s4 AS (SELECT e.user_id, MIN(e.tus) AS t FROM e JOIN s3 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.tus > s3.t
        |       GROUP BY e.user_id),
        |d AS (
        |  SELECT 1 AS stage_idx, 'signup>view' AS transition,
        |         (s2.t - s1.t) / 1000000.0 AS dt
        |  FROM s1 JOIN s2 USING (user_id)
        |  UNION ALL
        |  SELECT 2, 'view>click', (s3.t - s2.t) / 1000000.0
        |  FROM s2 JOIN s3 USING (user_id)
        |  UNION ALL
        |  SELECT 3, 'click>purchase', (s4.t - s3.t) / 1000000.0
        |  FROM s3 JOIN s4 USING (user_id))
        |SELECT stage_idx, transition, CAST(COUNT(*) AS BIGINT) AS n_converted,
        |  floor(QUANTILE_CONT(dt, 0.5) * 10000 + 0.5) / 10000 AS median_s,
        |  floor(QUANTILE_CONT(dt, 0.9) * 10000 + 0.5) / 10000 AS p90_s
        |FROM d GROUP BY stage_idx, transition
        |ORDER BY stage_idx""".stripMargin) { spark =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id")
      def stageMin(stage: String, after: Option[Column]): Column =
        min(when($"event_type" === stage &&
          after.map($"tus" > _).getOrElse(lit(true)), $"tus")).over(w)
      val staged = ev(spark)
        .withColumn("s1", stageMin("signup", None))
        .withColumn("s2", stageMin("view", Some($"s1")))
        .withColumn("s3", stageMin("click", Some($"s2")))
        .withColumn("s4", stageMin("purchase", Some($"s3")))
        .groupBy($"user_id")
        .agg(max($"s1").as("s1"), max($"s2").as("s2"),
          max($"s3").as("s3"), max($"s4").as("s4"))
        // feeds the three per-transition delta selects
        .localCheckpoint()
      def delta(idx: Int, name: String, a: Column, b: Column) =
        staged.filter(a.isNotNull && b.isNotNull)
          .select(lit(idx).as("stage_idx"), lit(name).as("transition"),
            ((b - a) / 1000000.0).as("dt"))
      delta(1, "signup>view", $"s1", $"s2")
        .unionAll(delta(2, "view>click", $"s2", $"s3"))
        .unionAll(delta(3, "click>purchase", $"s3", $"s4"))
        .groupBy($"stage_idx", $"transition")
        .agg(count(lit(1)).cast(LongType).as("n_converted"),
          (floor(expr("percentile(dt, 0.5)") * 10000 + 0.5) / 10000)
            .as("median_s"),
          (floor(expr("percentile(dt, 0.9)") * 10000 + 0.5) / 10000)
            .as("p90_s"))
        .orderBy($"stage_idx")
    },

    // Retention cohorts: cohort = a user's first active epoch-week (integer
    // week index — pure int arithmetic, identical in both engines);
    // n_active = distinct users from that cohort active at each week offset.
    // Offset 0 row per cohort doubles as cohort size. One shuffle on
    // user_id collects each user's (bounded: one entry per corpus week)
    // distinct-week set with a map-side-combinable collect_set, then the
    // final two-key aggregation — no separate distinct or window pass.
    q("q106_retention_cohorts",
      """WITH e AS (
        |  SELECT DISTINCT user_id,
        |         (epoch_ns(ts) // 1000) // 604800000000 AS week
        |  FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id)
        |SELECT c.cohort_week, e.week - c.cohort_week AS week_offset,
        |       COUNT(*) AS n_active
        |FROM e JOIN c USING (user_id)
        |GROUP BY c.cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin) { spark =>
      import spark.implicits._
      ev(spark)
        .select($"user_id", expr("tus div 604800000000").as("week"))
        .groupBy($"user_id")
        .agg(collect_set($"week").as("weeks"))
        .select(array_min($"weeks").as("cohort_week"),
          explode($"weeks").as("week"))
        .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy($"cohort_week", $"week_offset")
    },

    // Per-user EWMA (α = 0.2) over the event-value series — the stateful
    // SCAN shape (each output depends on the whole ordered prefix) that no
    // plain window aggregate expresses. Computed as a sorted left fold per
    // user: both engines run the identical non-reassociated IEEE sequence
    // 0.2·v + 0.8·acc over the (tus, event_id)-sorted values, so the result
    // is bit-deterministic and only floor-rounded at the surface. One
    // user_id shuffle; per-user state is one double — the same O(1)-state
    // scan a streaming `transformWithState` would run incrementally.
    // BOUND: the sorted fold holds ONE array per user sized by that user's
    // event count — inherently sequential per user, fine while per-user
    // counts stay bounded (the events fixture holds ~67 events/user, max
    // <100, at EVERY SF because users scale with the corpus; asserted in
    // PipelineOpsSpec). A pathological single user is unbounded — that
    // regime belongs to the streaming twin, which folds the same recursion
    // incrementally with O(1) state per user.
    q("q112_ewma",
      """WITH e AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000) AS tus, event_id, value
        |  FROM events),
        |d AS (SELECT user_id,
        |        list_sort(list(struct_pack(tus := tus, event_id := event_id,
        |                                   v := value))) AS xs
        |      FROM e GROUP BY user_id)
        |SELECT user_id, CAST(len(xs) AS BIGINT) AS n_events,
        |  floor(list_reduce(list_transform(xs, x -> x.v),
        |          (a, b) -> 0.2 * b + 0.8 * a) * 10000 + 0.5) / 10000 AS ewma
        |FROM d ORDER BY user_id""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("events")
        .select($"user_id", unix_micros($"ts").as("tus"), $"event_id", $"value")
        .groupBy($"user_id")
        .agg(sort_array(collect_list(struct($"tus", $"event_id",
          $"value".as("v")))).as("xs"))
        .select($"user_id", size($"xs").cast("long").as("n_events"),
          (floor(aggregate($"xs", lit(null).cast("double"), (acc, x) =>
            coalesce(lit(0.2) * x.getField("v") + lit(0.8) * acc,
              x.getField("v"))) * 10000 + 0.5) / 10000).as("ewma"))
        .orderBy($"user_id")
    },

    // Batch gap-based sessionization — q97's streaming session_window
    // re-expressed as the batch backfill job (the two must coexist in a
    // lambda-style pipeline): a session breaks after a >6 h silence, the
    // session index is the running count of breaks. All integer micros
    // (q112's epoch-micros idiom), so the window chain is exact — LAG for
    // the gap flag, running SUM for the index, then one grouped rollup
    // that reuses the same (user_id) partitioning. One user_id exchange
    // total; per-user state is a scalar, any corpus of users parallelizes.
    q("q130_sessionize",
      s"""WITH e AS (
         |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id
         |  FROM events),
         |g AS (
         |  SELECT user_id, tus, event_id,
         |    CASE WHEN LAG(tus) OVER (PARTITION BY user_id
         |                             ORDER BY tus, event_id) IS NULL
         |           OR tus - LAG(tus) OVER (PARTITION BY user_id
         |                                   ORDER BY tus, event_id)
         |              >= $sessionGapUs
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM e),
         |s AS (
         |  SELECT user_id, tus,
         |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |                     ROWS UNBOUNDED PRECEDING) AS session_idx
         |  FROM g)
         |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         |       CAST(COUNT(*) AS BIGINT) AS n_events,
         |       CAST(MIN(tus) AS BIGINT) AS start_us,
         |       CAST(MAX(tus) AS BIGINT) AS end_us,
         |       CAST(MAX(tus) - MIN(tus) AS BIGINT) AS duration_us
         |FROM s GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin) { spark =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      val lagT = lag($"tus", 1).over(w)
      spark.table("events")
        .select($"user_id", unix_micros($"ts").as("tus"), $"event_id")
        .withColumn("new_s",
          when(lagT.isNull || $"tus" - lagT >= sessionGapUs, 1).otherwise(0))
        .withColumn("session_idx",
          sum($"new_s").over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).cast("long"))
        .groupBy($"user_id", $"session_idx")
        .agg(count(lit(1)).as("n_events"),
          min($"tus").as("start_us"), max($"tus").as("end_us"),
          (max($"tus") - min($"tus")).as("duration_us"))
        .orderBy($"user_id", $"session_idx")
    },

    // Event-transition matrix — the Markov-chain summary of user journeys
    // (which event follows which, with conditional probabilities): LEAD
    // over each user's exact event order pairs every event with its
    // successor, then two tiny aggregations build counts and per-source
    // totals. The probability is an integer ratio → IEEE floor rounding.
    // Same single user_id exchange as q130; the matrix itself is
    // |event types|² rows — driver-safe at any corpus size.
    q("q131_event_transitions",
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tus, event_id
        |  FROM events),
        |p AS (
        |  SELECT event_type AS from_type,
        |         LEAD(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY tus, event_id) AS to_type
        |  FROM e),
        |c AS (SELECT from_type, to_type, COUNT(*) AS n
        |      FROM p WHERE to_type IS NOT NULL
        |      GROUP BY from_type, to_type),
        |t AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY from_type)
        |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
        |       floor(CAST(c.n AS DOUBLE) * 10000 / t.tot + 0.5) / 10000 AS p
        |FROM c JOIN t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin) { spark =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      val c = spark.table("events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("tus"),
          $"event_id")
        .select($"event_type".as("from_type"),
          lead($"event_type", 1).over(w).as("to_type"))
        .filter($"to_type".isNotNull)
        .groupBy($"from_type", $"to_type").agg(count(lit(1)).as("n"))
      val t = c.groupBy($"from_type").agg(sum($"n").as("tot"))
      c.join(t, "from_type")
        .select($"from_type", $"to_type", $"n",
          (floor($"n".cast("double") * 10000 / $"tot" + 0.5) / 10000)
            .as("p"))
        .orderBy($"from_type", $"to_type")
    },

    // Robust outlier detection (median/MAD, the data-quality gate a metric
    // pipeline runs before training on event values): an event is an
    // outlier iff |value − median| > 3·MAD of its type. Mean/stddev would
    // let the outliers drag their own threshold; the median/MAD pair is
    // breakdown-resistant. Scale shape: the robust statistics come from a
    // deterministic md5 pre-sample (q59c idiom — exact per-type quantiles
    // buffer a whole type in one reducer, so at 100 TB you bound the
    // sample, not the corpus; q27b's GK sketch is the streaming
    // alternative), then every event scores against the broadcast
    // (type, med, mad) table map-side — one tiny-key aggregation total.
    // The oracle replays the same sample, so the exact quantile
    // interpolation (identical lo + (hi−lo)·frac in both engines, proven
    // by q27) keeps the outlier predicate bit-identical.
    q("q115_robust_outliers",
      """WITH s AS (
        |  SELECT event_type, value FROM events
        |  WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '4'),
        |med AS (SELECT event_type, QUANTILE_CONT(value, 0.5) AS med
        |        FROM s GROUP BY event_type),
        |mad AS (SELECT s.event_type,
        |               QUANTILE_CONT(abs(s.value - m.med), 0.5) AS mad
        |        FROM s JOIN med m USING (event_type)
        |        GROUP BY s.event_type),
        |scored AS (
        |  SELECT e.event_type, m.med, d.mad,
        |         abs(e.value - m.med) > 3 * d.mad AS is_out
        |  FROM events e
        |  JOIN med m USING (event_type)
        |  JOIN mad d USING (event_type))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CASE WHEN is_out THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       floor(MIN(med) * 10000 + 0.5) / 10000 AS med,
        |       floor(MIN(mad) * 10000 + 0.5) / 10000 AS mad
        |FROM scored
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { spark =>
      import spark.implicits._
      val sample = spark.table("events")
        .filter(substring(md5($"event_id".cast("string").cast("binary")),
          1, 1) < "4")
        .select($"event_type", $"value")
      val med = sample.groupBy($"event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val mad = sample.join(broadcast(med), "event_type")
        .groupBy($"event_type")
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      spark.table("events")
        .join(broadcast(med), "event_type")
        .join(broadcast(mad), "event_type")
        .select($"event_type", $"med", $"mad",
          (abs($"value" - $"med") > lit(3) * $"mad").as("is_out"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when($"is_out", 1).otherwise(0)).cast("bigint").as("n_outliers"),
          Canon.r4(min($"med")).as("med"),
          Canon.r4(min($"mad")).as("mad"))
        .orderBy($"event_type")
    },

    // Time-series gap fill + linear interpolation — the densify step every
    // metrics/feature pipeline runs before a model sees a regular series:
    // per-user DAILY value totals (integer day index = micros div 86.4e9,
    // exact in both engines), a dense day grid spanning each user's
    // observed range (explode of a bounded per-user sequence — never a
    // calendar cross join), and linear interpolation across the gaps:
    //   v(day) = pv + (nv − pv) · (day − pd) / (nd − pd)
    // where (pd, pv) / (nd, nv) are the nearest observed days before/after
    // (last_value/first_value IGNORE NULLS — deterministic because `day` is
    // a unique sort key within user). Grid edges carry no nulls by
    // construction (span endpoints are observed), but the nearest-side
    // fallback keeps the operator total anyway. Daily totals are exact
    // decimal sums (Canon.sum4); the interpolated value is a free double →
    // IEEE floor-round on both engines. Scale: the grid join keys on
    // (user_id, day) and the fill windows on user_id — two bounded
    // exchanges of the same user-keyed family; per-user state is the day
    // span, never the corpus. Output rows = Σ user spans (~31 days/user at
    // every SF), linear in users.
    q("q137_gap_fill",
      s"""WITH e AS (
         |  SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day,
         |         value
         |  FROM events),
         |d AS (SELECT user_id, day, ${Canon.Oracle.sum4("value")} AS v
         |      FROM e GROUP BY user_id, day),
         |span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
         |         FROM d GROUP BY user_id),
         |grid AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day
         |         FROM span),
         |j AS (SELECT g.user_id, g.day, d.v
         |      FROM grid g LEFT JOIN d
         |        ON d.user_id = g.user_id AND d.day = g.day),
         |w AS (
         |  SELECT user_id, day, v,
         |    last_value(v IGNORE NULLS) OVER pw AS pv,
         |    max(CASE WHEN v IS NOT NULL THEN day END) OVER pw AS pd,
         |    first_value(v IGNORE NULLS) OVER fw AS nv,
         |    min(CASE WHEN v IS NOT NULL THEN day END) OVER fw AS nd
         |  FROM j
         |  WINDOW pw AS (PARTITION BY user_id ORDER BY day
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         fw AS (PARTITION BY user_id ORDER BY day
         |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT user_id, CAST(day AS BIGINT) AS day,
         |  CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS gap,
         |  CASE WHEN v IS NOT NULL THEN v
         |       WHEN pv IS NULL THEN nv
         |       WHEN nv IS NULL THEN pv
         |       ELSE ${Canon.Oracle.r4(
                  "(pv + (nv - pv) * CAST(day - pd AS DOUBLE) / (nd - pd))")}
         |  END AS filled
         |FROM w ORDER BY user_id, day""".stripMargin) { spark =>
      import spark.implicits._
      val d = spark.table("events")
        .select($"user_id", expr("unix_micros(ts) div 86400000000").as("day"),
          $"value")
        .groupBy($"user_id", $"day").agg(Canon.sum4($"value").as("v"))
      val grid = d.groupBy($"user_id")
        .agg(min($"day").as("d0"), max($"day").as("d1"))
        .select($"user_id", explode(sequence($"d0", $"d1")).as("day"))
      val pw = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fw = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(d, Seq("user_id", "day"), "left")
        .select($"user_id", $"day", $"v",
          last($"v", ignoreNulls = true).over(pw).as("pv"),
          max(when($"v".isNotNull, $"day")).over(pw).as("pd"),
          first($"v", ignoreNulls = true).over(fw).as("nv"),
          min(when($"v".isNotNull, $"day")).over(fw).as("nd"))
        .select($"user_id", $"day",
          when($"v".isNotNull, 0).otherwise(1).as("gap"),
          when($"v".isNotNull, $"v")
            .when($"pv".isNull, $"nv")
            .when($"nv".isNull, $"pv")
            .otherwise(Canon.r4($"pv" + ($"nv" - $"pv") *
              ($"day" - $"pd").cast("double") / ($"nd" - $"pd")))
            .as("filled"))
        .orderBy($"user_id", $"day")
    },

    // OHLC downsampling — the lossy resample every metrics store runs
    // (candlestick/rollup tables): per (user, day), the first and last
    // value in exact event order plus the min/max. Open/close are
    // deterministic because the order key (tus, event_id) is UNIQUE —
    // min/max over a struct with the value in trailing position picks the
    // boundary event identically in both engines (integer micros compare,
    // no IEEE involvement); high/low compare raw doubles (exact values off
    // the scan, no accumulation). One user_id-family exchange, map-side
    // combinable min/max aggregates — the canonical 100 TB rollup shape.
    q("q142_ohlc_downsample",
      """WITH e AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |         epoch_ns(ts) // 1000 AS tus, event_id, value
        |  FROM events)
        |SELECT user_id, CAST(day AS BIGINT) AS day,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(struct_pack(tus := tus, event_id := event_id,
        |                  v := value)).v AS open,
        |  MAX(value) AS high,
        |  MIN(value) AS low,
        |  MAX(struct_pack(tus := tus, event_id := event_id,
        |                  v := value)).v AS close
        |FROM e GROUP BY user_id, day
        |ORDER BY user_id, day""".stripMargin) { spark =>
      import spark.implicits._
      spark.table("events")
        .select($"user_id", expr("unix_micros(ts) div 86400000000").as("day"),
          unix_micros($"ts").as("tus"), $"event_id", $"value")
        .groupBy($"user_id", $"day")
        .agg(count(lit(1)).as("n"),
          min(struct($"tus", $"event_id", $"value".as("v")))
            .getField("v").as("open"),
          max($"value").as("high"),
          min($"value").as("low"),
          max(struct($"tus", $"event_id", $"value".as("v")))
            .getField("v").as("close"))
        .orderBy($"user_id", $"day")
    },

    // Last-touch attribution — the revenue-credit query every marketing
    // warehouse runs: each purchase is credited to the user's most recent
    // prior touchpoint (view/click), or 'direct' when none precedes it.
    // The touch lookup is a conditional MAX over the same (tus, event_id)
    // unique-struct trick as q142's open/close — deterministic boundary
    // selection with pure integer comparison, the event_type riding in
    // trailing position. One user_id exchange for the window (same key
    // family as funnel/retention/EWMA — at 100 TB this whole query class
    // shares one shuffle of the fact table), then a 3-row aggregate.
    q("q143_attribution",
      s"""WITH e AS (
         |  SELECT user_id, event_type, value,
         |         epoch_ns(ts) // 1000 AS tus, event_id
         |  FROM events),
         |t AS (
         |  SELECT user_id, event_type, value,
         |    MAX(CASE WHEN event_type IN ('view', 'click')
         |             THEN struct_pack(tus := tus, event_id := event_id,
         |                              t := event_type) END)
         |      OVER (PARTITION BY user_id ORDER BY tus, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS touch
         |  FROM e)
         |SELECT COALESCE(touch.t, 'direct') AS channel,
         |       CAST(COUNT(*) AS BIGINT) AS n_purchases,
         |       ${Canon.Oracle.sum4("value")} AS revenue
         |FROM t WHERE event_type = 'purchase'
         |GROUP BY channel
         |ORDER BY channel""".stripMargin) { spark =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      spark.table("events")
        .select($"user_id", $"event_type", $"value",
          unix_micros($"ts").as("tus"), $"event_id")
        .withColumn("touch",
          max(when($"event_type".isin("view", "click"),
            struct($"tus", $"event_id", $"event_type".as("t")))).over(w))
        .filter($"event_type" === "purchase")
        .groupBy(coalesce($"touch".getField("t"), lit("direct")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"), Canon.sum4($"value").as("revenue"))
        .orderBy($"channel")
    },

    // A/B lift with a Welch z-score — experiment readout as a relational
    // operator. Arms split by the engine's standard md5 hash-sample idiom
    // (deterministic, content-independent); per-arm moments come from EXACT
    // decimal sums (value has 2 decimals, its square 4 — both inside
    // DECIMAL range), so mean/variance/z are IEEE-identical across engines:
    // every division and the sqrt see bit-equal double inputs under an
    // identical spelling, and only the surfaced columns get the free-double
    // floor round. One scan, one map-side-combinable global aggregate —
    // no shuffle wider than the 2-group combine at any corpus size.
    // Denominators (r08 audit): an empty arm makes its SUM NULL before its
    // COUNT hits 0, so every ratio NULL-propagates identically on both
    // engines — a finite-x/0 is unreachable; na=1 ⇒ (na−1)=0 hits the same
    // IEEE double Inf/NaN path under the identical spelling on both sides.
    q("q145_ab_lift",
      """WITH p AS (
        |  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |              THEN 1 ELSE 0 END AS arm_a, value
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT
        |    CAST(COUNT(*) FILTER (arm_a = 1) AS BIGINT) AS na,
        |    CAST(COUNT(*) FILTER (arm_a = 0) AS BIGINT) AS nb,
        |    CAST(SUM(CAST(value AS DECIMAL(9,2))) FILTER (arm_a = 1)
        |         AS DOUBLE) AS sa,
        |    CAST(SUM(CAST(value AS DECIMAL(9,2))) FILTER (arm_a = 0)
        |         AS DOUBLE) AS sb,
        |    CAST(SUM(CAST(value AS DECIMAL(9,2)) * CAST(value AS DECIMAL(9,2)))
        |         FILTER (arm_a = 1) AS DOUBLE) AS qa,
        |    CAST(SUM(CAST(value AS DECIMAL(9,2)) * CAST(value AS DECIMAL(9,2)))
        |         FILTER (arm_a = 0) AS DOUBLE) AS qb
        |  FROM p)
        |SELECT na, nb,
        |  floor(sa / na * 1000000 + 0.5) / 1000000 AS mean_a,
        |  floor(sb / nb * 1000000 + 0.5) / 1000000 AS mean_b,
        |  floor((sa / na - sb / nb) / (sb / nb) * 1000000 + 0.5) / 1000000
        |    AS lift,
        |  floor((sa / na - sb / nb) /
        |        sqrt(((qa - sa * sa / na) / (na - 1)) / na +
        |             ((qb - sb * sb / nb) / (nb - 1)) / nb) * 10000 + 0.5)
        |    / 10000 AS z
        |FROM m""".stripMargin) { spark =>
      import spark.implicits._
      val d92 = DecimalType(9, 2)
      val armA = (substring(md5($"user_id".cast("string").cast(BinaryType)),
        1, 1) < "8").cast(IntegerType)
      val vDec = $"value".cast(d92)
      def fsum(c: Column, arm: Int): Column =
        sum(when($"arm_a" === arm, c)).cast(DoubleType)
      val m = spark.table("events")
        .filter($"event_type" === "purchase")
        .select(armA.as("arm_a"), $"value")
        .agg(
          count(when($"arm_a" === 1, lit(1))).as("na"),
          count(when($"arm_a" === 0, lit(1))).as("nb"),
          fsum(vDec, 1).as("sa"), fsum(vDec, 0).as("sb"),
          fsum(vDec * vDec, 1).as("qa"), fsum(vDec * vDec, 0).as("qb"))
      val (na, nb) = ($"na".cast(DoubleType), $"nb".cast(DoubleType))
      val ma = $"sa" / na
      val mb = $"sb" / nb
      val va = ($"qa" - $"sa" * $"sa" / na) / (na - 1)
      val vb = ($"qb" - $"sb" * $"sb" / nb) / (nb - 1)
      m.select($"na", $"nb",
        Canon.r6(ma).as("mean_a"), Canon.r6(mb).as("mean_b"),
        Canon.r6((ma - mb) / mb).as("lift"),
        Canon.r4((ma - mb) / sqrt(va / na + vb / nb)).as("z"))
    },

    // Rolling 7-day active users (DAU/WAU + stickiness) — the dashboard
    // query behind every engagement metric. The naive shape is a per-day
    // sliding-window COUNT(DISTINCT) (a range join or a 7-day window scan
    // per day); the scale shape used here inverts it: each distinct
    // (day, user) row CONTRIBUTES to the 7 target days it covers via a
    // bounded generator explode, then ONE day-keyed exact distinct — 7×
    // linear rows, no range join, no per-day rescan, and the upstream
    // (day, user) distinct is map-side combinable. Target days are
    // restricted to observed days by a semi-join (broadcast-sized: days,
    // not rows). Stickiness = dau/wau, a free-double ratio → floor
    // spelling on both engines per the repo rounding invariant.
    q("q152_active_users",
      """WITH e AS (
        |  SELECT DISTINCT (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |         user_id
        |  FROM events),
        |contrib AS (
        |  SELECT e.day + r.i AS day, e.user_id
        |  FROM e CROSS JOIN (SELECT unnest(range(0, 7)) AS i) r),
        |wau AS (
        |  SELECT c.day, COUNT(DISTINCT c.user_id) AS wau
        |  FROM contrib c
        |  WHERE c.day IN (SELECT day FROM e)
        |  GROUP BY c.day),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM e GROUP BY day)
        |SELECT CAST(day AS BIGINT) AS day, CAST(dau AS BIGINT) AS dau,
        |       CAST(wau AS BIGINT) AS wau,
        |       floor(CAST(dau AS DOUBLE) / wau * 10000 + 0.5) / 10000
        |         AS stickiness
        |FROM dau JOIN wau USING (day)
        |ORDER BY day""".stripMargin) { spark =>
      import spark.implicits._
      val e = spark.table("events")
        .select(expr("unix_micros(ts) div 86400000000").as("day"), $"user_id")
        .distinct()
      val days = e.select($"day").distinct()
      val wau = e
        .select(explode(sequence($"day", $"day" + 6)).as("day"), $"user_id")
        .join(days, Seq("day"), "left_semi")
        .groupBy($"day")
        .agg(countDistinct($"user_id").as("wau"))
      val dau = e.groupBy($"day").agg(countDistinct($"user_id").as("dau"))
      dau.join(wau, "day")
        .select($"day".cast(LongType).as("day"),
          $"dau".cast(LongType).as("dau"), $"wau".cast(LongType).as("wau"),
          Canon.r4($"dau".cast(DoubleType) / $"wau").as("stickiness"))
        .orderBy($"day")
    },

    // Poisson bootstrap CI for the purchase mean — the bootstrap that
    // actually runs at 100 TB (Chamandy et al., "Estimating Uncertainty for
    // Massive Data Streams", Google 2012): classical resampling needs the
    // row count up front and a per-resample shuffle; the Poisson bootstrap
    // gives each row an INDEPENDENT Poisson(1) multiplicity per resample,
    // so all B=20 resamples stream map-side in one pass and reduce to a
    // 20-key aggregate. Multiplicities are deterministic here: u =
    // md5(event_id∥'#'∥b) as a uint32 fraction (exact in both engines —
    // uint32/2^32 is an exact double), cut at the Poisson(1) CDF literals
    // spelled identically. Resample means divide an exact-decimal sum by
    // an integer count → bit-equal doubles; the CI takes order statistics
    // 2 and 19 of the 20 means (a 20-row window). One row out, all floors
    // on free doubles per the rounding invariant.
    q("q153_poisson_bootstrap_ci",
      """WITH p AS (
        |  SELECT event_id, CAST(value AS DECIMAL(9,2)) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |mres AS (
        |  SELECT b,
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |         WHEN u < 0.7357588823428847 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.9810118431238462 THEN 3
        |         ELSE 4 END AS m,
        |    v
        |  FROM (
        |    SELECT p.v, r.b,
        |      CAST(('0x' || substr(md5(CAST(p.event_id AS VARCHAR) || '#' ||
        |                               CAST(r.b AS VARCHAR)), 1, 8))
        |           AS UBIGINT) / 4294967296.0 AS u
        |    FROM p CROSS JOIN (SELECT unnest(range(0, 20)) AS b) r) t),
        |ms AS (
        |  SELECT b, CAST(SUM(m) AS BIGINT) AS nb,
        |         CAST(SUM(v * m) AS DOUBLE) AS sb
        |  FROM mres GROUP BY b),
        |rk AS (
        |  SELECT sb / nb AS mu,
        |         row_number() OVER (ORDER BY sb / nb ASC, b ASC) AS rn
        |  FROM ms),
        |base AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS DOUBLE) AS s
        |  FROM p)
        |SELECT n,
        |  floor(s / n * 1000000 + 0.5) / 1000000 AS mean,
        |  (SELECT floor(mu * 1000000 + 0.5) / 1000000 FROM rk WHERE rn = 2)
        |    AS ci_lo,
        |  (SELECT floor(mu * 1000000 + 0.5) / 1000000 FROM rk WHERE rn = 19)
        |    AS ci_hi
        |FROM base""".stripMargin) { spark =>
      import spark.implicits._
      val d92 = DecimalType(9, 2)
      val p = spark.table("events")
        .filter($"event_type" === "purchase")
        .select($"event_id", $"value".cast(d92).as("v"))
      val u = (conv(substring(md5(concat($"event_id".cast("string"), lit("#"),
        $"b".cast("string")).cast(BinaryType)), 1, 8), 16, 10)
        .cast(LongType) / lit(4294967296.0)).as("u")
      val m = when($"u" < 0.36787944117144233, 0)
        .when($"u" < 0.7357588823428847, 1)
        .when($"u" < 0.9196986029286058, 2)
        .when($"u" < 0.9810118431238462, 3)
        .otherwise(4)
      val ms = p
        .select($"event_id", $"v", explode(sequence(lit(0), lit(19))).as("b"))
        .select($"v", $"b", u)
        .select($"b", m.as("m"), $"v")
        .groupBy($"b")
        .agg(sum($"m").cast(LongType).as("nb"),
          sum($"v" * $"m").cast(DoubleType).as("sb"))
      val rk = ms
        .select(($"sb" / $"nb").as("mu"), $"b")
        .withColumn("rn", row_number().over(Window.orderBy($"mu".asc, $"b".asc)))
      val lo = rk.filter($"rn" === 2).select(Canon.r6($"mu").as("ci_lo"))
      val hi = rk.filter($"rn" === 19).select(Canon.r6($"mu").as("ci_hi"))
      p.agg(count(lit(1)).cast(LongType).as("n"),
          sum($"v").cast(DoubleType).as("s"))
        .select($"n", Canon.r6($"s" / $"n").as("mean"))
        .join(broadcast(lo)).join(broadcast(hi)) // 1-row broadcasts
        .select($"n", $"mean", $"ci_lo", $"ci_hi")
    },

    // Concurrency profile (interval sweep line): how much wall-clock time
    // the system spends at each level of simultaneously-open user sessions
    // — the capacity-planning readout behind "peak concurrent users".
    // Sessions are q130's 6-h-gap intervals treated half-open [start, end);
    // each contributes a +1/−1 endpoint, endpoint deltas are pre-summed per
    // DISTINCT instant (the running sum's sort key is then unique, so the
    // prefix sum is fully deterministic with no tie rule), and the
    // piecewise-constant level holds from each instant to the next.
    // Zero-width segments (ties, single-event sessions) carry dur = 0 and
    // are filtered identically on both engines. Integer-only output.
    // Scale: the global running sum is NOT one ORDER BY t window (one
    // reducer at any corpus size) — phase 1 cumsums within day-sized time
    // chunks, phase 2 prefix-sums the per-chunk net totals (a
    // metadata-sized relation: one row per observed day) and broadcasts
    // the exclusive offsets back, the q59f/packBins two-phase pattern;
    // chunk = floor(t/day) is monotone in t, so chunk-then-t order IS
    // global t order and off + lcum equals the one-window prefix sum.
    // Cross-chunk LEAD comes from the next chunk's min-t (same broadcast
    // family). Parallelism scales with the observed time span.
    q("q155_concurrency_profile",
      s"""WITH e AS (
         |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id
         |  FROM events),
         |g AS (
         |  SELECT user_id, tus, event_id,
         |    CASE WHEN LAG(tus) OVER (PARTITION BY user_id
         |                             ORDER BY tus, event_id) IS NULL
         |           OR tus - LAG(tus) OVER (PARTITION BY user_id
         |                                   ORDER BY tus, event_id)
         |              >= $sessionGapUs
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM e),
         |s AS (
         |  SELECT user_id, tus,
         |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |                     ROWS UNBOUNDED PRECEDING) AS si
         |  FROM g),
         |iv AS (SELECT MIN(tus) AS s_us, MAX(tus) AS e_us
         |       FROM s GROUP BY user_id, si),
         |ep AS (
         |  SELECT s_us AS t, 1 AS d FROM iv
         |  UNION ALL SELECT e_us AS t, -1 AS d FROM iv),
         |net AS (SELECT t, SUM(d) AS nd FROM ep GROUP BY t),
         |lv AS (
         |  SELECT SUM(nd) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
         |           AS level,
         |         LEAD(t) OVER (ORDER BY t) - t AS dur
         |  FROM net)
         |SELECT CAST(level AS BIGINT) AS level,
         |       CAST(SUM(dur) AS BIGINT) AS total_us,
         |       CAST(COUNT(*) AS BIGINT) AS n_segments
         |FROM lv WHERE dur IS NOT NULL AND dur > 0
         |GROUP BY level
         |ORDER BY level""".stripMargin) { spark =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      val lagT = lag($"tus", 1).over(w)
      val iv = spark.table("events")
        .select($"user_id", unix_micros($"ts").as("tus"), $"event_id")
        .withColumn("new_s",
          when(lagT.isNull || $"tus" - lagT >= sessionGapUs, 1).otherwise(0))
        .withColumn("si", sum($"new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"si")
        .agg(min($"tus").as("s_us"), max($"tus").as("e_us"))
        // both unionAll branches read the session relation, and net feeds
        // both the offsets build and the cumsum path — materialize each
        // once (the q156/q140 multi-consumer idiom; both are endpoint-sized)
        .localCheckpoint()
      val ep = iv.select($"s_us".as("t"), lit(1).as("d"))
        .unionAll(iv.select($"e_us".as("t"), lit(-1).as("d")))
      val dayUs = 86400000000L
      val net = ep.groupBy($"t").agg(sum($"d").as("nd"))
        .withColumn("chunk", floor($"t" / dayUs))
        .localCheckpoint()
      val local = Window.partitionBy($"chunk").orderBy($"t")
      // metadata-sized windows (one row per observed day) — the explicit
      // single-partition global order is bounded by the time span, never
      // the corpus (same shape as packBins' per-chunk offset window)
      val chunkOrd = Window.orderBy($"chunk")
      val offsets = net.groupBy($"chunk").agg(sum($"nd").as("ctot"),
          min($"t").as("cmin"))
        .withColumn("off", coalesce(sum($"ctot").over(
          chunkOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("nstart", lead($"cmin", 1).over(chunkOrd))
        .select($"chunk", $"off", $"nstart")
      net
        .withColumn("lcum", sum($"nd").over(
          local.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nt", lead($"t", 1).over(local))
        .join(broadcast(offsets), Seq("chunk"))
        .select(($"off" + $"lcum").cast(LongType).as("level"),
          (coalesce($"nt", $"nstart") - $"t").as("dur"))
        .filter($"dur".isNotNull && $"dur" > 0)
        .groupBy($"level")
        .agg(sum($"dur").cast(LongType).as("total_us"),
          count(lit(1)).cast(LongType).as("n_segments"))
        .orderBy($"level")
    },

    // SCD Type-2 state history — the warehouse dimension-build pattern:
    // compress each user's event-type sequence into validity intervals
    // (state, valid_from, valid_to) with a version number, keeping only
    // CHANGE points (consecutive equal states merge into one row; the
    // Kimball "type 2 slowly changing dimension" shape every incremental
    // dimension load materializes). The open current row carries
    // valid_to = −1 — a sentinel instead of NULL so the surfaced column
    // stays a plain BIGINT on both engines. All three windows (change
    // detection LAG, interval-close LEAD, version ROW_NUMBER) partition by
    // user_id → Catalyst plans ONE user_id Exchange feeding the window
    // chain; per-user state is the change count, never the event count.
    q("q158_scd2_state",
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tus, event_id
        |  FROM events),
        |o AS (
        |  SELECT user_id, event_type, tus, event_id,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY tus, event_id) AS prev_t
        |  FROM e),
        |ch AS (
        |  SELECT user_id, event_type, tus, event_id FROM o
        |  WHERE prev_t IS NULL OR prev_t <> event_type),
        |v AS (
        |  SELECT user_id, event_type AS state, tus AS valid_from_us,
        |    COALESCE(LEAD(tus) OVER (PARTITION BY user_id
        |                             ORDER BY tus, event_id), -1)
        |      AS valid_to_us,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY tus, event_id) AS version
        |  FROM ch)
        |SELECT user_id, CAST(version AS BIGINT) AS version, state,
        |       valid_from_us, valid_to_us
        |FROM v
        |ORDER BY user_id, version""".stripMargin) { spark =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      spark.table("events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("tus"),
          $"event_id")
        .withColumn("prev_t", lag($"event_type", 1).over(w))
        .filter($"prev_t".isNull || $"prev_t" =!= $"event_type")
        .withColumn("valid_to_us", coalesce(lead($"tus", 1).over(w), lit(-1L)))
        .withColumn("version", row_number().over(w).cast(LongType))
        .select($"user_id", $"version", $"event_type".as("state"),
          $"tus".as("valid_from_us"), $"valid_to_us")
        .orderBy($"user_id", $"version")
    },

    // HyperLogLog distinct-user sketch per event_type (Flajolet et al.
    // AofA'07) — the mergeable cardinality register set behind every
    // APPROX_COUNT_DISTINCT, materialized openly so the oracle can replay
    // it: m = 64 buckets from md5 bits 1-8, rank rho = leading-zero count
    // of md5 bits 9-16 as a 32-bit word (+1), register = MAX(rho) per
    // bucket. Both engines spell rho via length(bin(w)) — bin() drops
    // leading zeros identically in Spark and DuckDB — so the registers are
    // exact integers and the raw estimate alpha*m^2 / sum(2^-M_j) divides
    // two bit-identical quantities: the sum's terms are exact binary
    // fractions spanning 39 bits < one double mantissa, so ANY association
    // order yields the same double (the q151 Count-Min determinism idea,
    // upgraded from integers to exact dyadic rationals). No ln-based
    // small-range correction on purpose: linear counting would put a
    // transcendental between the engines (libm vs StrictMath last-ulp);
    // production would add it downstream of the surfaced registers.
    // Scale: groupBy(event_type, bucket) MAX is map-side combinable with
    // 64-row state per group — the register array IS the shuffle payload
    // (512 bytes/group at any corpus size), the canonical sketch shape.
    q("q161_hll_distinct",
      """WITH u AS (SELECT event_type, user_id FROM events),
        |h AS (
        |  SELECT event_type,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |         AS UBIGINT) % 64 AS bucket,
        |    CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8))
        |              AS UBIGINT) AS BIGINT) AS w
        |  FROM u),
        |r AS (
        |  SELECT event_type, bucket,
        |    MAX(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END) AS rho
        |  FROM h GROUP BY event_type, bucket),
        |grid AS (
        |  SELECT t.event_type, g.b
        |  FROM (SELECT DISTINCT event_type FROM events) t,
        |       (SELECT unnest(range(0, 64)) AS b) g),
        |reg AS (
        |  SELECT grid.event_type, grid.b AS bucket, COALESCE(r.rho, 0) AS m
        |  FROM grid LEFT JOIN r ON r.event_type = grid.event_type
        |                       AND r.bucket = grid.b),
        |est AS (
        |  SELECT event_type,
        |    CAST(SUM(m * (bucket + 1)) AS BIGINT) AS reg_checksum,
        |    0.709 * 4096 / SUM(1.0 / CAST(CAST(1 AS BIGINT) << m AS DOUBLE))
        |      AS e
        |  FROM reg GROUP BY event_type),
        |ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |         AS n_exact
        |       FROM u GROUP BY event_type)
        |SELECT ex.event_type AS event_type, n_exact, reg_checksum,
        |  floor(e * 10000 + 0.5) / 10000 AS hll_est,
        |  floor((e - n_exact) / n_exact * 1000000 + 0.5) / 1000000 AS rel_err
        |FROM ex JOIN est ON est.event_type = ex.event_type
        |ORDER BY event_type""".stripMargin) { spark =>
      import spark.implicits._
      val reg = hllRegistersOf(spark)
      val est = reg.groupBy($"event_type")
        .agg(sum($"m" * ($"bucket" + 1)).cast(LongType).as("reg_checksum"),
          sum(expr("1.0 / cast(shiftleft(cast(1 as bigint), m) as double)"))
            .as("s"))
        .select($"event_type", $"reg_checksum",
          (lit(0.709) * 4096 / $"s").as("e"))
      val ex = spark.table("events").groupBy($"event_type")
        .agg(countDistinct($"user_id").cast(LongType).as("n_exact"))
      ex.join(broadcast(est), Seq("event_type"))
        .select($"event_type", $"n_exact", $"reg_checksum",
          Canon.r4($"e").as("hll_est"),
          Canon.r6(($"e" - $"n_exact") / $"n_exact").as("rel_err"))
        .orderBy($"event_type")
    },

    // CUSUM change-point detection over per-user daily activity (Page,
    // Biometrika 1954) — the drift monitor a data pipeline runs on its
    // ingest volumes. The textbook recursion S_t = max(0, S_{t-1} + x_t - c)
    // is order-dependent, but its CLOSED FORM S_t = P_t - min(0, min_{j<=t}
    // P_j) (P = prefix sum of excesses) needs only a running sum and a
    // running min — plain windows over ONE user_id exchange, no sequential
    // fold, and every quantity is an INTEGER (daily counts, integer
    // reference c = floor-mean + 1), so the result hashes exactly with no
    // IEEE choreography at all (contrast q112's EWMA, which needs the
    // bit-exact sorted fold). Scale: the daily rollup is map-side
    // combinable; the global (nd, tot) reference is a 1-row broadcast; the
    // window chain shuffles once on user_id; per-user state is O(days).
    q("q163_cusum_changepoint",
      """WITH e AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |         COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |base AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
        |                CAST(SUM(cnt) AS BIGINT) AS tot FROM e),
        |p AS (
        |  SELECT user_id, day,
        |    SUM(cnt - (tot // nd + 1)) OVER (PARTITION BY user_id
        |      ORDER BY day ROWS UNBOUNDED PRECEDING) AS pre
        |  FROM e CROSS JOIN base),
        |s AS (
        |  SELECT user_id,
        |    pre - LEAST(MIN(pre) OVER (PARTITION BY user_id ORDER BY day
        |                               ROWS UNBOUNDED PRECEDING), 0) AS cu
        |  FROM p)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(MAX(cu) AS BIGINT) AS max_cusum,
        |  CAST(SUM(CASE WHEN cu >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alarm_days
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin) { spark =>
      import spark.implicits._
      val dayUs = 86400000000L
      val e = spark.table("events")
        .select($"user_id", unix_micros($"ts").as("tus"))
        .select($"user_id", expr(s"tus div $dayUs").as("day"))
        .groupBy($"user_id", $"day").agg(count(lit(1)).as("cnt"))
      val base = e.agg(count(lit(1)).cast(LongType).as("nd"),
        sum($"cnt").cast(LongType).as("tot"))
      val w = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.crossJoin(broadcast(base))
        .withColumn("pre",
          sum($"cnt" - (expr("tot div nd") + 1)).over(w))
        .withColumn("cu", $"pre" - least(min($"pre").over(w), lit(0L)))
        .groupBy($"user_id")
        .agg(count(lit(1)).cast(LongType).as("n_days"),
          max($"cu").cast(LongType).as("max_cusum"),
          sum(when($"cu" >= 3, 1).otherwise(0)).cast(LongType)
            .as("n_alarm_days"))
        .orderBy($"user_id")
    },

    // Weekday-seasonal volume anomaly detection — the monitoring complement
    // of q163's drift CUSUM: same-weekday daily volumes form the baseline
    // (Monday compares to Mondays), a day is anomalous when it leaves the
    // mean ± 1.5σ band of its weekday cell (a tight band on purpose: the
    // fixture's synthetic volumes are low-dispersion, and the band is the
    // operator's knob). Determinism without decimals: daily counts are
    // INTEGERS, so the (n, Σc, Σc²) moments are exact and mean/σ are one
    // division and one sqrt from exact integers — sqrt is IEEE
    // correctly-rounded in BOTH engines (unlike ln/exp, which get no such
    // guarantee; the q148 moment idiom, integer edition). Scale: the daily
    // rollup is the only corpus-sized shuffle (map-side combinable); the
    // weekday stats and flag join run on the metadata-sized day grid.
    q("q164_seasonal_anomaly",
      """WITH e AS (
        |  SELECT event_type, (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |         COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, c, day % 7 AS wd FROM e),
        |st AS (
        |  SELECT event_type, wd,
        |    CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(c) AS BIGINT) AS sc,
        |    CAST(SUM(c * c) AS BIGINT) AS scc
        |  FROM w GROUP BY 1, 2),
        |fl AS (
        |  SELECT w.event_type, w.wd, w.c, st.n_days,
        |    CAST(st.sc AS DOUBLE) / st.n_days AS mean,
        |    sqrt(CAST(st.n_days * st.scc - st.sc * st.sc AS DOUBLE)
        |         / (st.n_days * (st.n_days - 1))) AS sd
        |  FROM w JOIN st ON st.event_type = w.event_type AND st.wd = w.wd
        |  WHERE st.n_days > 1),
        |an AS (
        |  SELECT event_type, wd, CAST(COUNT(*) AS BIGINT) AS n_anomalies
        |  FROM fl WHERE abs(c - mean) > 1.5 * sd GROUP BY 1, 2),
        |stats AS (
        |  SELECT DISTINCT event_type, wd, n_days, mean, sd FROM fl)
        |SELECT s.event_type AS event_type, s.wd AS weekday, s.n_days,
        |  floor(s.mean * 1000000 + 0.5) / 1000000 AS mean_daily,
        |  floor(s.sd * 1000000 + 0.5) / 1000000 AS sd_daily,
        |  COALESCE(an.n_anomalies, 0) AS n_anomalies
        |FROM stats s LEFT JOIN an ON an.event_type = s.event_type
        |                         AND an.wd = s.wd
        |ORDER BY event_type, weekday""".stripMargin) { spark =>
      import spark.implicits._
      val dayUs = 86400000000L
      val daily = spark.table("events")
        .select($"event_type", unix_micros($"ts").as("tus"))
        .select($"event_type", expr(s"tus div $dayUs").as("day"))
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("c"))
        .withColumn("wd", $"day" % 7)
      val st = daily.groupBy($"event_type", $"wd")
        .agg(count(lit(1)).cast(LongType).as("n_days"),
          sum($"c").cast(LongType).as("sc"),
          sum($"c" * $"c").cast(LongType).as("scc"))
        .filter($"n_days" > 1)
        .withColumn("mean", $"sc".cast(DoubleType) / $"n_days")
        .withColumn("sd",
          sqrt(($"n_days" * $"scc" - $"sc" * $"sc").cast(DoubleType) /
            ($"n_days" * ($"n_days" - 1))))
        // stats feed both the flag join and the surfaced rows
        .localCheckpoint()
      val an = daily.join(st, Seq("event_type", "wd"))
        .filter(abs($"c" - $"mean") > lit(1.5) * $"sd")
        .groupBy($"event_type", $"wd")
        .agg(count(lit(1)).cast(LongType).as("n_anomalies"))
      st.join(an, Seq("event_type", "wd"), "left")
        .select($"event_type", $"wd".as("weekday"), $"n_days",
          Canon.r6($"mean").as("mean_daily"),
          Canon.r6($"sd").as("sd_daily"),
          coalesce($"n_anomalies", lit(0L)).as("n_anomalies"))
        .orderBy($"event_type", $"weekday")
    },

    // Top user-journey paths (Sankey / path analysis) — "what do users
    // actually do first": each user's first 3 events form a '>'-joined path
    // string; paths are counted across users and the 20 most common
    // surfaced. Determinism: events are ordered by (tus, event_id) — the
    // unique tiebreaker that pins a path even when two events share a
    // microsecond — and the top-20 boundary is totally ordered by
    // (n_users DESC, path). Scale: the per-user sequence assembly runs on
    // ONE user_id exchange (the q105 funnel shape — window rank + grouped
    // collect share the same partitioning); the path rollup is map-side
    // combinable (journey prefixes are Zipf-concentrated, so partial
    // aggregation collapses most rows before the shuffle); the final
    // top-20 is a TakeOrdered, never a global sort. The path surfaces as a
    // joined STRING per the no-array-output invariant.
    q("q167_event_paths",
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_ns(ts), event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path,
        |         CAST(COUNT(*) AS BIGINT) AS n_steps
        |  FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, n_steps, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM p GROUP BY path, n_steps
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin) { spark =>
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      val firstK = spark.table("events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("tus"),
          $"event_id")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
      firstK.groupBy($"user_id")
        .agg(sort_array(collect_list(struct($"rn", $"event_type"))).as("s"))
        .select(
          array_join(transform($"s", x => x("event_type")), ">").as("path"),
          size($"s").cast(LongType).as("n_steps"))
        .groupBy($"path", $"n_steps")
        .agg(count(lit(1)).cast(LongType).as("n_users"))
        .orderBy($"n_users".desc, $"path")
        .limit(20)
    },

    // Audience-overlap matrix via packed bitmap indexes (the roaring-bitmap
    // technique): exact distinct-user intersections between event types
    // with NO distinct pass and NO user-level pair join. bit_or is
    // idempotent, so raw events fold straight into per-(type, word) 62-bit
    // membership words (62, not 64 — DuckDB's `<<` raises on shifts that
    // reach the BIGINT sign bit, and the twin spellings must agree) in ONE
    // map-side-combinable rollup; duplicate events never shuffle, the q166
    // min-signature trick with OR instead of MIN. All pair math then runs
    // on |types| × ⌈user_space/62⌉ bitmap cells: distinct counts are
    // popcount sums, intersections AND + popcount. The oracle IS the naive
    // DISTINCT + user-level self-join — hash equality proves the bitmap
    // path exact (the q157 lossless-index pattern).
    q("q168_bitmap_overlap",
      s"""WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
         |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
         |      FROM u GROUP BY 1),
         |c AS (
         |  SELECT a.event_type AS type_a, b.event_type AS type_b,
         |         CAST(COUNT(*) AS BIGINT) AS n_common
         |  FROM u a JOIN u b
         |    ON a.user_id = b.user_id AND a.event_type < b.event_type
         |  GROUP BY 1, 2)
         |SELECT c.type_a, c.type_b, sa.n AS n_a, sb.n AS n_b, c.n_common,
         |  ${Canon.Oracle.r6(
              "CAST(c.n_common AS DOUBLE) / (sa.n + sb.n - c.n_common)")}
         |    AS jaccard
         |FROM c
         |JOIN s sa ON sa.event_type = c.type_a
         |JOIN s sb ON sb.event_type = c.type_b
         |ORDER BY type_a, type_b""".stripMargin) { spark =>
      import spark.implicits._
      // feeds the size rollup and both sides of the pair join
      val bm = bitmapWordsOf(spark.table("events")).localCheckpoint()
      val sizes = bm.groupBy($"event_type")
        .agg(sum(expr("bit_count(w)")).cast(LongType).as("n"))
      val a = bm.select($"event_type".as("type_a"), $"word", $"w".as("wa"))
      val b = bm.select($"event_type".as("type_b"), $"word", $"w".as("wb"))
      val common = a.join(b, Seq("word"))
        .filter($"type_a" < $"type_b")
        .groupBy($"type_a", $"type_b")
        .agg(sum(expr("bit_count(wa & wb)")).cast(LongType).as("n_common"))
        .filter($"n_common" > 0)
      common
        .join(broadcast(sizes.select($"event_type".as("type_a"),
          $"n".as("n_a"))), Seq("type_a"))
        .join(broadcast(sizes.select($"event_type".as("type_b"),
          $"n".as("n_b"))), Seq("type_b"))
        .select($"type_a", $"type_b", $"n_a", $"n_b", $"n_common",
          Canon.r6($"n_common".cast(DoubleType) /
            ($"n_a" + $"n_b" - $"n_common")).as("jaccard"))
        .orderBy($"type_a", $"type_b")
    },

    // Linear multi-touch attribution — q143's last-touch sibling: each
    // purchase's revenue is split EQUALLY across the user's view/click
    // touches in the preceding 7 days (no touches → 'direct'). Exactness
    // without decimals: revenue converts once to integer CENTS
    // (floor(v·100 + 0.5) — the fixture carries exactly 2 decimals), each
    // touch gets cents div n, and the cents mod n remainder goes to the
    // EARLIEST touches (rank by (tus, event_id)) — so credit conserves to
    // the cent by construction (spec-asserted) and every quantity the
    // engines compare is an integer. Scale: the purchase×touch match is a
    // user-keyed join with a bounded time predicate (never a corpus cross
    // product); the rank/count windows partition by purchase id; the
    // channel rollup is 3 rows.
    q("q182_linear_attribution",
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tus,
        |         event_id, value
        |  FROM events),
        |p AS (
        |  SELECT user_id, tus, event_id,
        |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_type, tus, event_id FROM e
        |      WHERE event_type IN ('view', 'click')),
        |m AS (
        |  SELECT p.event_id AS pid, p.cents, t.event_type,
        |         t.tus AS ttus, t.event_id AS tid
        |  FROM p JOIN t ON t.user_id = p.user_id
        |    AND t.tus >= p.tus - 604800000000 AND t.tus < p.tus),
        |r AS (
        |  SELECT pid, cents, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ttus, tid) AS rk,
        |    COUNT(*) OVER (PARTITION BY pid) AS n
        |  FROM m),
        |credit AS (
        |  SELECT event_type,
        |         cents // n + CASE WHEN rk <= cents % n THEN 1 ELSE 0 END
        |           AS c
        |  FROM r
        |  UNION ALL
        |  SELECT 'direct', cents FROM p
        |  WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.pid = p.event_id))
        |SELECT event_type AS channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
        |  floor(CAST(SUM(c) AS DOUBLE) / 100 * 100 + 0.5) / 100
        |    AS credited
        |FROM credit GROUP BY event_type
        |ORDER BY channel""".stripMargin) { spark =>
      import spark.implicits._
      val e = spark.table("events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("tus"),
          $"event_id", $"value")
      val p = e.filter($"event_type" === "purchase")
        .select($"user_id", $"tus", $"event_id",
          floor($"value" * 100 + 0.5).cast(LongType).as("cents"))
        .localCheckpoint() // feeds the match AND the direct anti-join
      val t = e.filter($"event_type".isin("view", "click"))
        .select($"user_id", $"event_type", $"tus".as("ttus"),
          $"event_id".as("tid"))
      val m = p.select($"user_id", $"tus", $"event_id".as("pid"), $"cents")
        .join(t, Seq("user_id"))
        .filter($"ttus" >= $"tus" - 604800000000L && $"ttus" < $"tus")
        .localCheckpoint() // feeds the credit split AND the direct filter
      val wRank = Window.partitionBy($"pid").orderBy($"ttus", $"tid")
      val wN = Window.partitionBy($"pid")
      val touches = m
        .withColumn("rk", row_number().over(wRank))
        .withColumn("n", count(lit(1)).over(wN))
        .select($"event_type",
          (expr("cents div n") +
            when($"rk" <= $"cents" % $"n", 1).otherwise(0)).as("c"))
      val direct = p
        .join(m.select($"pid"), $"event_id" === $"pid", "left_anti")
        .select(lit("direct").as("event_type"), $"cents".as("c"))
      touches.unionAll(direct)
        .groupBy($"event_type".as("channel"))
        .agg(count(lit(1)).cast(LongType).as("n_credits"),
          (floor(sum($"c").cast(DoubleType) / 100 * 100 + 0.5) / 100)
            .as("credited"))
        .orderBy($"channel")
    },

    // HLL set algebra — the property that makes cardinality sketches the
    // 100 TB distinct-count tool: registers MERGE (union = per-bucket MAX),
    // so |A∪B| needs only the two 512-byte sketches q161 already
    // materialized, never the raw sets, and |A∩B| follows by
    // inclusion-exclusion (can dip negative within sketch error — surfaced
    // as-is; q168 is the exact-bitmap counterpart when ids are packable).
    // Every union register is an exact integer, the estimate divides exact
    // dyadic-fraction sums (q161's determinism argument verbatim), and the
    // exact-union validator column replays na + nb − ncommon from the
    // distinct relation — the sketch math never touches it. Scale: sketch
    // side runs on |types| × 64 register cells; the exact side is the
    // validator, not the operator.
    q("q171_hll_union",
      """WITH u AS (SELECT event_type, user_id FROM events),
        |h AS (
        |  SELECT event_type,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |         AS UBIGINT) % 64 AS bucket,
        |    CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8))
        |              AS UBIGINT) AS BIGINT) AS w
        |  FROM u),
        |r AS (
        |  SELECT event_type, bucket,
        |    MAX(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END) AS rho
        |  FROM h GROUP BY event_type, bucket),
        |grid AS (
        |  SELECT t.event_type, g.b
        |  FROM (SELECT DISTINCT event_type FROM events) t,
        |       (SELECT unnest(range(0, 64)) AS b) g),
        |reg AS (
        |  SELECT grid.event_type, grid.b AS bucket, COALESCE(r.rho, 0) AS m
        |  FROM grid LEFT JOIN r ON r.event_type = grid.event_type
        |                       AND r.bucket = grid.b),
        |sing AS (
        |  SELECT event_type,
        |    0.709 * 4096 / SUM(1.0 / CAST(CAST(1 AS BIGINT) << m AS DOUBLE))
        |      AS e
        |  FROM reg GROUP BY event_type),
        |pr AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, a.bucket,
        |         CASE WHEN a.m >= b.m THEN a.m ELSE b.m END AS m
        |  FROM reg a JOIN reg b ON a.bucket = b.bucket
        |                       AND a.event_type < b.event_type),
        |uest AS (
        |  SELECT type_a, type_b,
        |    CAST(SUM(m * (bucket + 1)) AS BIGINT) AS union_checksum,
        |    0.709 * 4096 / SUM(1.0 / CAST(CAST(1 AS BIGINT) << m AS DOUBLE))
        |      AS ue
        |  FROM pr GROUP BY type_a, type_b),
        |du AS (SELECT DISTINCT event_type, user_id FROM events),
        |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM du GROUP BY 1),
        |c AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |         CAST(COUNT(*) AS BIGINT) AS nc
        |  FROM du a JOIN du b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT e.type_a AS type_a, e.type_b AS type_b, e.union_checksum,
        |  floor(e.ue * 10000 + 0.5) / 10000 AS union_est,
        |  floor((ea.e + eb.e - e.ue) * 10000 + 0.5) / 10000 AS inter_est,
        |  sa.n + sb.n - COALESCE(c.nc, 0) AS n_union_exact,
        |  floor((e.ue - (sa.n + sb.n - COALESCE(c.nc, 0)))
        |        / (sa.n + sb.n - COALESCE(c.nc, 0)) * 1000000 + 0.5)
        |    / 1000000 AS union_rel_err
        |FROM uest e
        |JOIN sing ea ON ea.event_type = e.type_a
        |JOIN sing eb ON eb.event_type = e.type_b
        |JOIN s sa ON sa.event_type = e.type_a
        |JOIN s sb ON sb.event_type = e.type_b
        |LEFT JOIN c ON c.ta = e.type_a AND c.tb = e.type_b
        |ORDER BY type_a, type_b""".stripMargin) { spark =>
      import spark.implicits._
      // registers feed the single-type estimates AND both pair sides
      val reg = hllRegistersOf(spark).localCheckpoint()
      val dyadic = expr("1.0 / cast(shiftleft(cast(1 as bigint), m) as double)")
      val sing = reg.groupBy($"event_type")
        .agg(sum(dyadic).as("s"))
        .select($"event_type", (lit(0.709) * 4096 / $"s").as("e"))
      val pr = reg.as("a").join(reg.as("b"),
          $"a.bucket" === $"b.bucket" && $"a.event_type" < $"b.event_type")
        .select($"a.event_type".as("type_a"), $"b.event_type".as("type_b"),
          $"a.bucket".as("bucket"), greatest($"a.m", $"b.m").as("m"))
      val uest = pr.groupBy($"type_a", $"type_b")
        .agg(sum($"m" * ($"bucket" + 1)).cast(LongType).as("union_checksum"),
          sum(dyadic).as("s"))
        .select($"type_a", $"type_b", $"union_checksum",
          (lit(0.709) * 4096 / $"s").as("ue"))
      val du = spark.table("events")
        .select($"event_type", $"user_id").distinct().localCheckpoint()
      val sizes = du.groupBy($"event_type")
        .agg(count(lit(1)).cast(LongType).as("n"))
      val common = du.as("a").join(du.as("b"),
          $"a.user_id" === $"b.user_id" &&
            $"a.event_type" < $"b.event_type")
        .groupBy($"a.event_type".as("ta"), $"b.event_type".as("tb"))
        .agg(count(lit(1)).cast(LongType).as("nc"))
      val exact = $"n_a" + $"n_b" - coalesce($"nc", lit(0L))
      uest
        .join(broadcast(sing.select($"event_type".as("type_a"),
          $"e".as("ea"))), Seq("type_a"))
        .join(broadcast(sing.select($"event_type".as("type_b"),
          $"e".as("eb"))), Seq("type_b"))
        .join(broadcast(sizes.select($"event_type".as("type_a"),
          $"n".as("n_a"))), Seq("type_a"))
        .join(broadcast(sizes.select($"event_type".as("type_b"),
          $"n".as("n_b"))), Seq("type_b"))
        .join(broadcast(common), $"type_a" === $"ta" && $"type_b" === $"tb",
          "left")
        .select($"type_a", $"type_b", $"union_checksum",
          Canon.r4($"ue").as("union_est"),
          Canon.r4($"ea" + $"eb" - $"ue").as("inter_est"),
          exact.as("n_union_exact"),
          Canon.r6(($"ue" - exact) / exact).as("union_rel_err"))
        .orderBy($"type_a", $"type_b")
    },

    // Hourly conversion rate with Wilson 95% score intervals (the
    // experiment-dashboard readout: the Wilson bound stays honest at small
    // n where the naive normal interval collapses). Inputs are EXACT
    // integers (events / purchases per hour-of-day); the interval is one
    // fixed IEEE expression — z spelled 1.96·1.96, sqrt correctly rounded
    // on both engines — surfaced through the r6 floor-round margin. Scale:
    // a single 24-key map-side-combinable rollup; partials are constant
    // size, so the exchange carries 24 rows per mapper regardless of
    // corpus scale.
    q("q185_wilson_ci",
      """WITH e AS (
        |  SELECT CAST(hour(ts) AS INT) AS h,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        |  FROM events),
        |a AS (
        |  SELECT h, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(conv) AS BIGINT) AS x
        |  FROM e GROUP BY h),
        |d AS (
        |  SELECT h, n, x,
        |         CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p,
        |         CAST(n AS DOUBLE) AS nd
        |  FROM a)
        |SELECT h, n, x,
        |  floor(p * 1000000 + 0.5) / 1000000 AS cvr,
        |  floor((p + (1.96 * 1.96) / (nd * 2)
        |         - 1.96 * sqrt(p * (1.0 - p) / nd
        |                       + (1.96 * 1.96) / (nd * nd * 4)))
        |        / (1.0 + (1.96 * 1.96) / nd) * 1000000 + 0.5) / 1000000
        |    AS wilson_lo,
        |  floor((p + (1.96 * 1.96) / (nd * 2)
        |         + 1.96 * sqrt(p * (1.0 - p) / nd
        |                       + (1.96 * 1.96) / (nd * nd * 4)))
        |        / (1.0 + (1.96 * 1.96) / nd) * 1000000 + 0.5) / 1000000
        |    AS wilson_hi
        |FROM d
        |ORDER BY h""".stripMargin) { spark =>
      import spark.implicits._
      val agg = spark.table("events")
        .select(hour($"ts").as("h"),
          when($"event_type" === "purchase", 1L).otherwise(0L).as("conv"))
        .groupBy($"h")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum($"conv").cast(LongType).as("x"))
      val p = $"x".cast(DoubleType) / $"n".cast(DoubleType)
      val nd = $"n".cast(DoubleType)
      val z2 = lit(1.96) * lit(1.96)
      val center = p + z2 / (nd * 2)
      val marg = lit(1.96) * sqrt(p * (lit(1.0) - p) / nd + z2 / (nd * nd * 4))
      val denom = lit(1.0) + z2 / nd
      agg.select($"h", $"n", $"x", Canon.r6(p).as("cvr"),
          Canon.r6((center - marg) / denom).as("wilson_lo"),
          Canon.r6((center + marg) / denom).as("wilson_hi"))
        .orderBy($"h")
    },

    // Population-stability-index drift monitor (the credit-scoring PSI,
    // the numeric-feature counterpart to q184's token-KL): decile bins are
    // FIXED from snapshot A's exact interpolated quantiles, both snapshots
    // are histogrammed into them (bin = |{cuts ≤ v}| via the same
    // filter-HOF on both engines), and PSI = Σ (p_b − p_a)·ln(p_b/p_a)
    // with add-one smoothing so empty bins stay finite. Snapshot B carries
    // a deterministic synthetic drift (every user_id%3==0 value rescales)
    // — the q184 synthesize-then-detect pattern. Bin counts are exact
    // integers; probabilities and contributions go through the r6
    // floor-round margin; the PSI total is a bin-sorted fold over the
    // 10-row array. Scale: two map-side binning scans + a 10-key rollup;
    // the quantile train is snapshot-A-sized (q178's sketch is the
    // documented 100 TB path, as in q187).
    q("q195_psi_drift",
      """WITH a AS (
        |  SELECT value AS v FROM events WHERE event_id % 2 = 0),
        |b AS (
        |  SELECT CASE WHEN user_id % 3 = 0 THEN value * 1.25 + 2.0
        |              ELSE value END AS v
        |  FROM events WHERE event_id % 2 = 1),
        |c AS (SELECT quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5,
        |                               0.6, 0.7, 0.8, 0.9]) AS cuts FROM a),
        |ba AS (SELECT len(list_filter(c.cuts, x -> a.v >= x)) AS bin
        |       FROM a CROSS JOIN c),
        |bb AS (SELECT len(list_filter(c.cuts, x -> b.v >= x)) AS bin
        |       FROM b CROSS JOIN c),
        |ga AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM ba GROUP BY bin),
        |gb AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM bb GROUP BY bin),
        |grid AS (SELECT unnest(range(0, 10)) AS bin),
        |j AS (SELECT g.bin AS bin, COALESCE(ga.n, 0) AS na,
        |             COALESCE(gb.n, 0) AS nb
        |      FROM grid g LEFT JOIN ga ON ga.bin = g.bin
        |                  LEFT JOIN gb ON gb.bin = g.bin),
        |t AS (SELECT CAST(SUM(na) AS BIGINT) AS ta,
        |             CAST(SUM(nb) AS BIGINT) AS tb FROM j),
        |p AS (SELECT bin, na, nb,
        |             CAST(na + 1 AS DOUBLE) / (t.ta + 10) AS pa,
        |             CAST(nb + 1 AS DOUBLE) / (t.tb + 10) AS pb
        |      FROM j CROSS JOIN t),
        |con AS (SELECT bin, na, nb, pa, pb,
        |               (pb - pa) * ln(pb / pa) AS contrib FROM p),
        |tot AS (SELECT list_reduce(list_prepend(0.0, list_transform(
        |          list_sort(list(struct_pack(bin := bin, c := contrib))),
        |          x -> x.c)), (p, q) -> p + q) AS psi FROM con)
        |SELECT con.bin AS bin, con.na AS n_a, con.nb AS n_b,
        |  floor(con.pa * 1000000 + 0.5) / 1000000 AS p_a,
        |  floor(con.pb * 1000000 + 0.5) / 1000000 AS p_b,
        |  floor(con.contrib * 1000000 + 0.5) / 1000000 AS contrib,
        |  floor(tot.psi * 1000000 + 0.5) / 1000000 AS psi_total
        |FROM con CROSS JOIN tot
        |ORDER BY bin""".stripMargin) { spark =>
      import spark.implicits._
      val ev = spark.table("events")
      val a = ev.filter($"event_id" % 2 === 0).select($"value".as("v"))
      val b = ev.filter($"event_id" % 2 === 1)
        .select(when($"user_id" % 3 === 0, $"value" * 1.25 + 2.0)
          .otherwise($"value").as("v"))
      val cuts = a.agg(expr(
        "percentile(v, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("cuts"))
      def binned(df: DataFrame): DataFrame =
        df.crossJoin(broadcast(cuts))
          .select(size(filter($"cuts", x => $"v" >= x)).cast(LongType).as("bin"))
      val ga = binned(a).groupBy($"bin").agg(count(lit(1)).cast(LongType).as("na"))
      val gb = binned(b).groupBy($"bin").agg(count(lit(1)).cast(LongType).as("nb"))
      val grid = spark.range(0, 10).select($"id".as("bin"))
      val j = grid.join(ga, Seq("bin"), "left").join(gb, Seq("bin"), "left")
        .select($"bin", coalesce($"na", lit(0L)).as("na"),
          coalesce($"nb", lit(0L)).as("nb"))
      val t = j.agg(sum($"na").cast(LongType).as("ta"),
        sum($"nb").cast(LongType).as("tb"))
      val p = j.crossJoin(broadcast(t))
        .select($"bin", $"na", $"nb",
          (($"na" + 1).cast(DoubleType) / ($"ta" + 10)).as("pa"),
          (($"nb" + 1).cast(DoubleType) / ($"tb" + 10)).as("pb"))
      val con = p.select($"bin", $"na", $"nb", $"pa", $"pb",
          (($"pb" - $"pa") * log($"pb" / $"pa")).as("contrib"))
        .localCheckpoint() // feeds the rows AND the total fold
      val tot = con
        .agg(sort_array(collect_list(struct($"bin", $"contrib".as("c")))).as("l"))
        .select(aggregate($"l", lit(0.0),
          (acc, x) => acc + x.getField("c")).as("psi"))
      con.crossJoin(broadcast(tot))
        .select($"bin", $"na".as("n_a"), $"nb".as("n_b"),
          Canon.r6($"pa").as("p_a"), Canon.r6($"pb").as("p_b"),
          Canon.r6($"contrib").as("contrib"),
          Canon.r6($"psi").as("psi_total"))
        .orderBy($"bin")
    },

    // Seasonal-naive forecast backtest (the capacity-planning baseline
    // every volume forecast must beat): per event type, the last 20% of
    // days form the test window and each test day's prediction is the
    // actual at lag 7 (same weekday last week). Absolute-error sums are
    // EXACT integers (daily counts), MAE is one integer-ratio division,
    // and MAPE — a sum of per-day rationals — is a day-sorted fold (the
    // q184 determinism pattern). Scale: one map-side-combinable
    // (type, day) rollup; the backtest join and folds run on the
    // day-grid-sized relation, never the raw stream.
    q("q196_seasonal_backtest",
      """WITH e AS (
        |  SELECT event_type, (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM e),
        |cut AS (SELECT d0 + (d1 - d0 + 1) * 8 // 10 AS dc FROM rng),
        |te AS (SELECT e.event_type, e.day, e.c FROM e CROSS JOIN cut
        |       WHERE e.day >= cut.dc),
        |pred AS (
        |  SELECT t.event_type, t.day, t.c AS y, COALESCE(p.c, 0) AS yhat
        |  FROM te t LEFT JOIN e p ON p.event_type = t.event_type
        |                         AND p.day = t.day - 7),
        |arr AS (SELECT event_type,
        |          list_sort(list(struct_pack(day := day, y := y,
        |                                     yhat := yhat))) AS l
        |        FROM pred GROUP BY event_type),
        |s1 AS (SELECT event_type, CAST(len(l) AS BIGINT) AS n_test_days,
        |         CAST(list_reduce(list_prepend(0, list_transform(l,
        |           x -> abs(x.y - x.yhat))), (p, q) -> p + q) AS BIGINT)
        |           AS abs_err_sum,
        |         list_reduce(list_prepend(0.0, list_transform(l,
        |           x -> CAST(abs(x.y - x.yhat) AS DOUBLE) / x.y)),
        |           (p, q) -> p + q) AS mape_sum
        |       FROM arr)
        |SELECT event_type, n_test_days, abs_err_sum,
        |  floor(CAST(abs_err_sum AS DOUBLE) / n_test_days * 10000 + 0.5)
        |    / 10000 AS mae,
        |  floor(mape_sum / n_test_days * 1000000 + 0.5) / 1000000 AS mape
        |FROM s1
        |ORDER BY event_type""".stripMargin) { spark =>
      import spark.implicits._
      val dayUs = 86400000000L
      val daily = spark.table("events")
        .select($"event_type", unix_micros($"ts").as("tus"))
        .select($"event_type", expr(s"tus div $dayUs").as("day"))
        .groupBy($"event_type", $"day")
        .agg(count(lit(1)).cast(LongType).as("c"))
        .localCheckpoint() // feeds the range, the test slice, and the lag join
      val cut = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
        .select(expr("d0 + (d1 - d0 + 1) * 8 div 10").as("dc"))
      val te = daily.crossJoin(broadcast(cut)).filter($"day" >= $"dc")
      val pred = te.as("t").join(daily.as("p"),
          $"p.event_type" === $"t.event_type" && $"p.day" === $"t.day" - 7,
          "left")
        .select($"t.event_type".as("event_type"), $"t.day".as("day"),
          $"t.c".as("y"), coalesce($"p.c", lit(0L)).as("yhat"))
      val arr = pred.groupBy($"event_type")
        .agg(sort_array(collect_list(struct($"day", $"y", $"yhat"))).as("l"))
      val s1 = arr.select($"event_type",
        size($"l").cast(LongType).as("n_test_days"),
        aggregate($"l", lit(0L), (acc, x) =>
          acc + abs(x.getField("y") - x.getField("yhat")))
          .cast(LongType).as("abs_err_sum"),
        aggregate($"l", lit(0.0), (acc, x) =>
          acc + abs(x.getField("y") - x.getField("yhat")).cast(DoubleType) /
            x.getField("y")).as("mape_sum"))
      s1.select($"event_type", $"n_test_days", $"abs_err_sum",
          Canon.r4($"abs_err_sum".cast(DoubleType) / $"n_test_days").as("mae"),
          Canon.r6($"mape_sum" / $"n_test_days").as("mape"))
        .orderBy($"event_type")
    },

    // Markov-chain multi-touch attribution by removal effect (Anderl et al.
    // 2016 — the data-driven model that q143's last-touch and q182's
    // linear split bracket): user journeys truncated at first purchase
    // build a transition-count matrix (start → channels → conv/null);
    // channel credit = the relative drop in START's 8-STEP conversion
    // probability when that channel absorbs into null. The k-step horizon
    // makes the iteration exactly reproducible — both engines run the
    // SAME 8 value-iteration rounds (per-(chain, state) successor folds
    // sorted by dst), so no convergence tolerance is needed. All FIVE
    // chains (base + 4 removals) iterate together as one chain-tagged
    // relation — 8 joint rounds, not 40, each over a ≤35-row matrix
    // (localCheckpoint per round: the fixpoint materialization rule).
    // Scale: one user_id exchange builds journeys; transition counts are
    // map-side-combinable integers; everything after runs on the
    // |states|²-bounded matrix.
    q("q197_markov_attribution", markovOracleSql) { spark =>
      import spark.implicits._
      val r = spark.table("events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("tus"),
          $"event_id")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id").orderBy($"tus", $"event_id")))
      val rp = r.filter($"event_type" === "purchase")
        .groupBy($"user_id").agg(min($"rn").as("prn"))
      val sq = r.join(rp, Seq("user_id"), "left")
        .filter($"prn".isNull || $"rn" < $"prn")
        .withColumn("conv", $"prn".isNotNull)
        .withColumn("nxt", lead($"event_type", 1).over(
          Window.partitionBy($"user_id").orderBy($"rn")))
        .localCheckpoint() // feeds steps/starts/ends
      val steps = sq.filter($"nxt".isNotNull)
        .select($"event_type".as("src"), $"nxt".as("dst"))
      val starts = sq.filter($"rn" === 1)
        .select(lit("start").as("src"), $"event_type".as("dst"))
      val ends = sq.filter($"nxt".isNull)
        .select($"event_type".as("src"),
          when($"conv", "conv").otherwise("null").as("dst"))
      val direct = rp.filter($"prn" === 1)
        .select(lit("start").as("src"), lit("conv").as("dst"))
      val trans = steps.unionByName(starts).unionByName(ends)
        .unionByName(direct)
        .groupBy($"src", $"dst").agg(count(lit(1)).cast(LongType).as("n"))
      val chains = markovChains.toDF("chain")
      // removal redirects IN COUNT SPACE (integer merge, no double sums):
      // chain c sends every transition into c to the null sink
      val tc = trans.crossJoin(broadcast(chains))
        .select($"chain", $"src",
          when($"dst" === $"chain", "null").otherwise($"dst").as("dst"), $"n")
        .groupBy($"chain", $"src", $"dst")
        .agg(sum($"n").cast(LongType).as("n"))
      val ni = tc.groupBy($"chain", $"src")
        .agg(sum($"n").cast(LongType).as("ntot"))
      val p = tc.join(ni, Seq("chain", "src"))
        .select($"chain", $"src", $"dst",
          ($"n".cast(DoubleType) / $"ntot").as("p"))
      // r18: the 8 value-iteration rounds run INSIDE one row per chain.
      // The ≤35-row matrix collapses to a per-chain (src → sorted successor
      // list) map and each round becomes one projection over the 5 chain
      // rows — zero exchanges and zero joins per round, where the old shape
      // paid a join + groupBy exchange per round (8 extra plan stages;
      // measured 2.8 → ~1 s at sf0.1). Bit-identical to the relational
      // rounds: the successor fold still runs in dst order (succ is
      // sort_array'd and dst is unique per (chain, src), exactly the order
      // the oracle's list_sort fixes), same 0.0 seed, same a + p·v step,
      // and dst values absent from the previous round's value map are
      // dropped from the fold exactly like the oracle's join.
      // Per-round withColumn keeps each round's map a named attribute —
      // referenced 2× per state by the next round — so CollapseProject
      // cannot inline the rounds into one exploded expression (the
      // HOF-no-CSE rule).
      val statesArr = array(markovStates.map(lit(_)): _*)
      var it = p.groupBy($"chain", $"src")
        .agg(sort_array(collect_list(struct($"dst", $"p"))).as("succ"))
        .groupBy($"chain")
        .agg(map_from_entries(collect_list(struct($"src", $"succ")))
          .as("adj"))
        .withColumn("v0", map_from_entries(transform(statesArr, s =>
          struct(s, when(s === "conv", lit(1.0)).otherwise(lit(0.0))))))
      for (r <- 1 to markovRounds) {
        val prev = col(s"v${r - 1}")
        it = it.withColumn(s"v$r", map_from_entries(transform(statesArr,
          s => struct(s,
            when(s === "conv", lit(1.0))
              .when(s === "null", lit(0.0))
              .otherwise(coalesce(
                aggregate(
                  filter(element_at($"adj", s),
                    x => map_contains_key(prev, x.getField("dst"))),
                  lit(0.0),
                  (a, x) => a + x.getField("p") *
                    element_at(prev, x.getField("dst"))),
                lit(0.0)))))))
      }
      // the finished iteration feeds both the base row and the channel rows
      val sv = it.select($"chain",
          element_at(col(s"v$markovRounds"), lit("start")).as("v"))
        .localCheckpoint()
      val vb = sv.filter($"chain" === "base").select($"v".as("vb"))
      val re = sv.filter($"chain" =!= "base")
        .select($"chain".as("channel"), $"v".as("vc"))
        .crossJoin(broadcast(vb))
        .withColumn("re", ($"vb" - $"vc") / $"vb")
        .localCheckpoint() // feeds the rows AND the share denominator
      val tot = re
        .agg(sort_array(collect_list(struct($"channel", $"re".as("r")))).as("l"))
        .select(aggregate($"l", lit(0.0),
          (a, x) => a + x.getField("r")).as("retot"))
      re.crossJoin(broadcast(tot))
        .select($"channel", Canon.r6($"vb").as("conv_base"),
          Canon.r6($"vc").as("conv_removed"),
          Canon.r6($"re").as("removal_effect"),
          Canon.r6($"re" / $"retot").as("attribution_share"))
        .orderBy($"channel")
    },

    // Kolmogorov-Smirnov two-sample test (the distribution-level drift
    // verdict PSI's binned view approximates): D = max |F_A − F_B| over
    // the merged support, computed from EXACT integer cumulative counts.
    // The oracle's cumsum is a plain global window; the Spark side is the
    // SCALE shape — 64 value-range chunks, per-chunk partitioned windows,
    // broadcast chunk offsets (q155's two-phase prefix sum) — and the two
    // provably agree because the prefix sums are pure integer arithmetic.
    // The same planted drift as q195; rejection at α=0.05 via the
    // 1.358·√((n+m)/nm) critical value. Output is one row.
    q("q204_ks_test",
      """WITH a AS (
        |  SELECT value AS v FROM events WHERE event_id % 2 = 0),
        |b AS (
        |  SELECT CASE WHEN user_id % 3 = 0 THEN value * 1.25 + 2.0
        |              ELSE value END AS v
        |  FROM events WHERE event_id % 2 = 1),
        |g AS (
        |  SELECT v, CAST(SUM(ia) AS BIGINT) AS na,
        |         CAST(SUM(ib) AS BIGINT) AS nb FROM
        |    (SELECT v, 1 AS ia, 0 AS ib FROM a
        |     UNION ALL SELECT v, 0, 1 FROM b) t
        |  GROUP BY v),
        |t AS (SELECT CAST(SUM(na) AS BIGINT) AS tna,
        |             CAST(SUM(nb) AS BIGINT) AS tnb FROM g),
        |c AS (SELECT v,
        |        SUM(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
        |        SUM(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
        |      FROM g),
        |d AS (SELECT v, abs(CAST(ca AS DOUBLE) / t.tna
        |                    - CAST(cb AS DOUBLE) / t.tnb) AS d
        |      FROM c CROSS JOIN t),
        |m AS (SELECT MAX(d) AS d_stat FROM d),
        |l AS (SELECT MIN(v) AS d_at FROM d JOIN m ON d.d = m.d_stat)
        |SELECT t.tna AS n_a, t.tnb AS n_b,
        |  floor(m.d_stat * 1000000 + 0.5) / 1000000 AS d_stat,
        |  l.d_at AS d_at_value,
        |  CASE WHEN m.d_stat > 1.358 * sqrt(CAST(t.tna + t.tnb AS DOUBLE)
        |                                    / (t.tna * t.tnb))
        |       THEN 1 ELSE 0 END AS reject_05
        |FROM t CROSS JOIN m CROSS JOIN l""".stripMargin) { spark =>
      import spark.implicits._
      val ev = spark.table("events")
      val a = ev.filter($"event_id" % 2 === 0).select($"value".as("v"))
      val b = ev.filter($"event_id" % 2 === 1)
        .select(when($"user_id" % 3 === 0, $"value" * 1.25 + 2.0)
          .otherwise($"value").as("v"))
      val g = a.select($"v", lit(1).as("ia"), lit(0).as("ib"))
        .unionByName(b.select($"v", lit(0).as("ia"), lit(1).as("ib")))
        .groupBy($"v")
        .agg(sum($"ia").cast(LongType).as("na"),
          sum($"ib").cast(LongType).as("nb"))
        .localCheckpoint() // feeds bounds, chunk totals, and local cums
      val bounds = g.agg(min($"v").as("mn"), max($"v").as("mx"),
        sum($"na").cast(LongType).as("tna"),
        sum($"nb").cast(LongType).as("tnb")).localCheckpoint()
      val ch = g.crossJoin(broadcast(bounds))
        .withColumn("chunk", when($"mx" === $"mn", lit(0)).otherwise(
          least(lit(63),
            floor(($"v" - $"mn") / (($"mx" - $"mn") / 64)).cast("int"))))
      val woff = Window.orderBy($"chunk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offsets = ch.groupBy($"chunk")
        .agg(sum($"na").as("ta"), sum($"nb").as("tb"))
        .withColumn("offa", sum($"ta").over(woff) - $"ta")
        .withColumn("offb", sum($"tb").over(woff) - $"tb")
        .select($"chunk", $"offa", $"offb")
      val local = Window.partitionBy($"chunk").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val d = ch
        .withColumn("la", sum($"na").over(local))
        .withColumn("lb", sum($"nb").over(local))
        .join(broadcast(offsets), Seq("chunk"))
        .select($"v", abs(($"offa" + $"la").cast(DoubleType) / $"tna" -
          ($"offb" + $"lb").cast(DoubleType) / $"tnb").as("d"))
        .localCheckpoint() // feeds the max AND the argmax lookup
      val m = d.agg(max($"d").as("d_stat"))
      val loc = d.join(broadcast(m), $"d" === $"d_stat")
        .agg(min($"v").as("d_at"))
      bounds.crossJoin(broadcast(m)).crossJoin(broadcast(loc))
        .select($"tna".as("n_a"), $"tnb".as("n_b"),
          Canon.r6($"d_stat").as("d_stat"),
          $"d_at".as("d_at_value"),
          when($"d_stat" > lit(1.358) *
            sqrt(($"tna" + $"tnb").cast(DoubleType) / ($"tna" * $"tnb")),
            1).otherwise(0).as("reject_05"))
    },

    // Inter-arrival burstiness per user (the bot/automation signal: humans
    // have irregular gaps, scripts metronomic ones): per-user inter-event
    // gaps in EXACT integer micros → (n, Σg, Σg²) integer moments → CV =
    // sd/mean and the Goh-Barabási burstiness B = (sd−mean)/(sd+mean) in
    // one fixed IEEE spelling (sqrt correctly rounded both engines — the
    // q164 moment pattern). Users bucketed by B into a bounded histogram.
    // Scale: the LAG window and the moment rollup share ONE user_id
    // exchange; everything after runs on the per-user relation.
    q("q209_burstiness",
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id
        |  FROM events),
        |g AS (
        |  SELECT user_id,
        |         (tus - LAG(tus) OVER (PARTITION BY user_id
        |                               ORDER BY tus, event_id)) // 1000000
        |           AS gap
        |  FROM e),
        |m AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(gap) AS BIGINT) AS s1,
        |         CAST(SUM(gap * gap) AS BIGINT) AS s2
        |  FROM g WHERE gap IS NOT NULL
        |  GROUP BY user_id HAVING COUNT(*) >= 5 AND SUM(gap) > 0),
        |b AS (
        |  SELECT user_id, n,
        |    (sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n)
        |     - CAST(s1 AS DOUBLE) / n)
        |    / (sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n)
        |       + CAST(s1 AS DOUBLE) / n) AS burst
        |  FROM m)
        |SELECT CAST(floor((burst + 1.0) * 5) AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(n) AS BIGINT) AS n_gaps,
        |  floor(MIN(burst) * 10000 + 0.5) / 10000 AS min_burst,
        |  floor(MAX(burst) * 10000 + 0.5) / 10000 AS max_burst
        |FROM b GROUP BY 1
        |ORDER BY bucket""".stripMargin) { spark =>
      import spark.implicits._
      // gaps in integer SECONDS: Σgap² of raw micros would overflow BIGINT
      // on month-long gaps; second granularity keeps the moments exact
      val g = spark.table("events")
        .select($"user_id", unix_micros($"ts").as("tus"), $"event_id")
        .withColumn("gap", expr("(tus - lag(tus, 1) over " +
          "(partition by user_id order by tus, event_id)) div 1000000"))
        .filter($"gap".isNotNull)
      val m = g.groupBy($"user_id")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum($"gap").cast(LongType).as("s1"),
          sum($"gap" * $"gap").cast(LongType).as("s2"))
        .filter($"n" >= 5 && $"s1" > 0) // all-equal-zero gaps → undefined B
      val sd = sqrt(($"s2".cast(DoubleType) -
        $"s1".cast(DoubleType) * $"s1" / $"n") / $"n")
      val mean = $"s1".cast(DoubleType) / $"n"
      val b = m.select($"user_id", $"n",
        ((sd - mean) / (sd + mean)).as("burst"))
      b.groupBy(floor(($"burst" + 1.0) * 5).cast(LongType).as("bucket"))
        .agg(count(lit(1)).cast(LongType).as("n_users"),
          sum($"n").cast(LongType).as("n_gaps"),
          Canon.r4(min($"burst")).as("min_burst"),
          Canon.r4(max($"burst")).as("max_burst"))
        .orderBy($"bucket")
    },

    // Gini concentration index over customer revenue (the "how skewed is
    // our revenue base" readout; also the Lorenz-curve summary used for
    // data-source balance audits). G = Σ(2i − n − 1)·xᵢ / (n·Σx) over
    // revenue-sorted customers — EVERYTHING through the final division is
    // exact integers: revenue in cents, the global rank i from the q155
    // two-phase prefix (64 revenue-range chunks, per-chunk partitioned
    // rank, broadcast offsets — never one reducer), unique tiebreak by
    // custkey inside equal revenues via the (cents, custkey) order. One
    // free-double division at the end, r6-surfaced. Denominator (r08
    // audit): n·total = 0 only on an all-zero-revenue corpus, where num is
    // the exact-integer 0 too — 0/0 follows the same IEEE NaN path in both
    // engines' identical double spelling.
    q("q205_gini_revenue",
      """WITH r AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)) * 100)
        |              AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |             CAST(SUM(cents) AS BIGINT) AS total FROM r),
        |rk AS (SELECT o_custkey, cents,
        |         ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i
        |       FROM r),
        |s AS (SELECT CAST(SUM((2 * i - t.n - 1) * cents) AS BIGINT) AS num
        |      FROM rk CROSS JOIN t)
        |SELECT t.n AS n_customers, t.total AS total_cents,
        |  floor(CAST(s.num AS DOUBLE) / (CAST(t.n AS DOUBLE) * t.total)
        |        * 1000000 + 0.5) / 1000000 AS gini
        |FROM s CROSS JOIN t""".stripMargin) { spark =>
      import spark.implicits._
      val r = spark.table("orders")
        .groupBy($"o_custkey")
        .agg(sum($"o_totalprice".cast(DecimalType(18, 4)) * 100)
          .cast(LongType).as("cents"))
        .localCheckpoint() // feeds totals, chunk offsets, and local ranks
      val t = r.agg(count(lit(1)).cast(LongType).as("n"),
        sum($"cents").cast(LongType).as("total"),
        min($"cents").as("mn"), max($"cents").as("mx")).localCheckpoint()
      val ch = r.crossJoin(broadcast(t))
        .withColumn("chunk", when($"mx" === $"mn", lit(0)).otherwise(
          least(lit(63),
            (($"cents" - $"mn") * 64 / ($"mx" - $"mn" + 1)).cast("int"))))
      val woff = Window.orderBy($"chunk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offsets = ch.groupBy($"chunk").agg(count(lit(1)).as("cn"))
        .withColumn("off", sum($"cn").over(woff) - $"cn")
        .select($"chunk", $"off")
      val local = Window.partitionBy($"chunk").orderBy($"cents", $"o_custkey")
      val num = ch
        .withColumn("li", row_number().over(local))
        .join(broadcast(offsets), Seq("chunk"))
        .select(((($"off" + $"li") * 2 - $"n" - 1) * $"cents").as("term"))
        .agg(sum($"term").cast(LongType).as("num"))
      num.crossJoin(broadcast(t))
        .select($"n".as("n_customers"), $"total".as("total_cents"),
          Canon.r6($"num".cast(DoubleType) /
            ($"n".cast(DoubleType) * $"total")).as("gini"))
    },

    // Holt linear-trend forecast (double exponential smoothing — the
    // trended upgrade of q112's EWMA, paired with q196's seasonal-naive
    // backtest): per event type, the daily-count series folds through the
    // textbook two-state recursion l_t = α·y_t + (1−α)(l+b),
    // b_t = β(l_t − l) + (1−β)b with l₂=y₂, b₂=y₂−y₁ init. The recursion
    // is inherently sequential → ONE day-sorted fold per type with a
    // struct accumulator; DuckDB's list_reduce requires accumulator ≡
    // element type, so elements are pre-lifted to the (t, l, b) state
    // shape (the q192 singleton trick) — both engines then execute the
    // bit-identical IEEE sequence. Scale: series length = the day grid,
    // bounded; the corpus is touched once by the daily rollup.
    // NOTE the oracle is a recursive CTE, NOT a list_reduce struct fold:
    // DuckDB 1.0's list_reduce mutates the accumulator struct IN PLACE
    // field-by-field, so a two-state update reading acc.l in the b-field
    // formula sees the freshly-written l (measured: b drifted -2.2412 →
    // -2.20604 on the first 4-element prefix). Recursive-CTE rows are
    // immutable, so both states update simultaneously — the q77/q183
    // oracle pattern for iterations.
    q("q198_holt_forecast",
      s"""WITH RECURSIVE e AS (
         |  SELECT event_type, (epoch_ns(ts) // 1000) // 86400000000 AS day,
         |         CAST(COUNT(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |sq AS (SELECT event_type, CAST(c AS DOUBLE) AS y,
         |         ROW_NUMBER() OVER (PARTITION BY event_type
         |                            ORDER BY day) AS rn
         |       FROM e),
         |nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM sq
         |       GROUP BY event_type),
         |it AS (
         |  SELECT s2.event_type, CAST(2 AS BIGINT) AS t, s2.y AS l,
         |         s2.y - s1.y AS b
         |  FROM sq s2 JOIN sq s1 ON s1.event_type = s2.event_type
         |                       AND s1.rn = 1
         |  WHERE s2.rn = 2
         |  UNION ALL
         |  SELECT it.event_type, it.t + 1,
         |    ${holtAlpha}e0 * e.y + ${1 - holtAlpha}e0 * (it.l + it.b),
         |    ${holtBeta}e0 * (${holtAlpha}e0 * e.y
         |        + ${1 - holtAlpha}e0 * (it.l + it.b) - it.l)
         |      + ${1 - holtBeta}e0 * it.b
         |  FROM it JOIN sq e ON e.event_type = it.event_type
         |                   AND e.rn = it.t + 1),
         |fin AS (SELECT it.event_type, nd.n AS n_days, it.l, it.b
         |        FROM it JOIN nd ON nd.event_type = it.event_type
         |        WHERE it.t = nd.n)
         |SELECT event_type, n_days,
         |  floor(l * 10000 + 0.5) / 10000 AS level,
         |  floor(b * 10000 + 0.5) / 10000 AS trend,
         |  floor((l + 1 * b) * 10000 + 0.5) / 10000 AS fcst_1,
         |  floor((l + 7 * b) * 10000 + 0.5) / 10000 AS fcst_7
         |FROM fin
         |ORDER BY event_type""".stripMargin) { spark =>
      import spark.implicits._
      val dayUs = 86400000000L
      val daily = spark.table("events")
        .select($"event_type", unix_micros($"ts").as("tus"))
        .select($"event_type", expr(s"tus div $dayUs").as("day"))
        .groupBy($"event_type", $"day")
        .agg(count(lit(1)).cast(LongType).as("c"))
      val arr = daily.groupBy($"event_type")
        .agg(sort_array(collect_list(struct($"day", $"c".as("y")))).as("l"))
      def holtState(l: Column): Column = {
        val zero = struct(lit(0L).as("t"), lit(0.0).as("l"), lit(0.0).as("b"))
        aggregate(l, zero, (acc, p) => {
          val y = p.getField("y").cast(DoubleType)
          val lNew = lit(holtAlpha) * y +
            lit(1 - holtAlpha) * (acc.getField("l") + acc.getField("b"))
          when(acc.getField("t") === 0,
            struct(lit(1L).as("t"), y.as("l"), lit(0.0).as("b")))
            .when(acc.getField("t") === 1,
              struct((acc.getField("t") + 1).as("t"), y.as("l"),
                (y - acc.getField("l")).as("b")))
            .otherwise(struct((acc.getField("t") + 1).as("t"), lNew.as("l"),
              (lit(holtBeta) * (lNew - acc.getField("l")) +
                lit(1 - holtBeta) * acc.getField("b")).as("b")))
        })
      }
      arr.select($"event_type", size($"l").cast(LongType).as("n_days"),
          holtState($"l").as("s"))
        // the oracle's recursion initializes at rn=2 and emits only t=n rows,
        // so a single-day series produces NO oracle row — Holt needs two
        // points to define a trend; both engines agree on degenerate series
        .filter($"n_days" >= 2)
        .select($"event_type", $"n_days",
          Canon.r4($"s.l").as("level"), Canon.r4($"s.b").as("trend"),
          Canon.r4($"s.l" + lit(1) * $"s.b").as("fcst_1"),
          Canon.r4($"s.l" + lit(7) * $"s.b").as("fcst_7"))
        .orderBy($"event_type")
    })

  /** q198's smoothing constants (Holt linear / double exponential). */
  private val holtAlpha = 0.3
  private val holtBeta = 0.1

  /** q197's transient channels (every chain label but "base" is also the
    * removed channel) and the full state space. */
  private val markovChains = Seq("base", "view", "click", "signup", "error")
  private val markovStates =
    Seq("start", "view", "click", "signup", "error", "conv", "null")
  private val markovRounds = 8

  /** q197's oracle: the identical journey build, chain-tagged count-space
    * removal redirect, and 8 generated value-iteration rounds. */
  private lazy val markovOracleSql: String = {
    val rounds = (1 to markovRounds).map { t =>
      s"""f$t AS (
         |  SELECT p.chain, p.src AS state,
         |    list_reduce(list_prepend(0.0, list_transform(
         |      list_sort(list(struct_pack(dst := p.dst, t := p.p * v.v))),
         |      x -> x.t)), (a, b) -> a + b) AS val
         |  FROM p JOIN v${t - 1} v ON v.chain = p.chain AND v.state = p.dst
         |  GROUP BY p.chain, p.src),
         |v$t AS (
         |  SELECT g.chain, g.state,
         |    CASE WHEN g.state = 'conv' THEN 1.0
         |         WHEN g.state = 'null' THEN 0.0
         |         ELSE COALESCE(f.val, 0.0) END AS v
         |  FROM grid g LEFT JOIN f$t f ON f.chain = g.chain
         |                             AND f.state = g.state)""".stripMargin
    }.mkString(",\n")
    val chainList = markovChains.map(c => s"'$c'").mkString(", ")
    val stateList = markovStates.map(s => s"'$s'").mkString(", ")
    s"""WITH ev AS (
       |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tus, event_id
       |  FROM events),
       |r AS (SELECT user_id, event_type,
       |        ROW_NUMBER() OVER (PARTITION BY user_id
       |                           ORDER BY tus, event_id) AS rn
       |      FROM ev),
       |rp AS (SELECT user_id, MIN(rn) AS prn FROM r
       |       WHERE event_type = 'purchase' GROUP BY user_id),
       |sq AS (
       |  SELECT r.user_id, r.event_type, r.rn, rp.prn IS NOT NULL AS conv,
       |    LEAD(r.event_type) OVER (PARTITION BY r.user_id
       |                             ORDER BY r.rn) AS nxt
       |  FROM r LEFT JOIN rp ON rp.user_id = r.user_id
       |  WHERE rp.prn IS NULL OR r.rn < rp.prn),
       |trans AS (
       |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n FROM (
       |    SELECT event_type AS src, nxt AS dst FROM sq WHERE nxt IS NOT NULL
       |    UNION ALL
       |    SELECT 'start', event_type FROM sq WHERE rn = 1
       |    UNION ALL
       |    SELECT event_type, CASE WHEN conv THEN 'conv' ELSE 'null' END
       |    FROM sq WHERE nxt IS NULL
       |    UNION ALL
       |    SELECT 'start', 'conv' FROM rp WHERE prn = 1) t
       |  GROUP BY 1, 2),
       |chains AS (SELECT unnest([$chainList]) AS chain),
       |tc AS (SELECT c.chain, t.src,
       |         CASE WHEN t.dst = c.chain THEN 'null' ELSE t.dst END AS dst,
       |         CAST(SUM(t.n) AS BIGINT) AS n
       |       FROM trans t CROSS JOIN chains c GROUP BY 1, 2, 3),
       |ni AS (SELECT chain, src, CAST(SUM(n) AS BIGINT) AS ntot
       |       FROM tc GROUP BY 1, 2),
       |p AS (SELECT tc.chain, tc.src, tc.dst,
       |        CAST(tc.n AS DOUBLE) / ni.ntot AS p
       |      FROM tc JOIN ni ON ni.chain = tc.chain AND ni.src = tc.src),
       |states AS (SELECT unnest([$stateList]) AS state),
       |grid AS (SELECT c.chain, s.state FROM chains c CROSS JOIN states s),
       |v0 AS (SELECT chain, state,
       |         CASE WHEN state = 'conv' THEN 1.0 ELSE 0.0 END AS v
       |       FROM grid),
       |$rounds,
       |sv AS (SELECT chain, v FROM v$markovRounds WHERE state = 'start'),
       |vb AS (SELECT v AS vb FROM sv WHERE chain = 'base'),
       |re AS (SELECT chain AS channel, v AS vc, vb, (vb - v) / vb AS re
       |       FROM sv CROSS JOIN vb WHERE chain <> 'base'),
       |tot AS (SELECT list_reduce(list_prepend(0.0, list_transform(
       |          list_sort(list(struct_pack(channel := channel, r := re))),
       |          x -> x.r)), (a, b) -> a + b) AS retot FROM re)
       |SELECT channel,
       |  floor(vb * 1000000 + 0.5) / 1000000 AS conv_base,
       |  floor(vc * 1000000 + 0.5) / 1000000 AS conv_removed,
       |  floor(re * 1000000 + 0.5) / 1000000 AS removal_effect,
       |  floor(re / tot.retot * 1000000 + 0.5) / 1000000
       |    AS attribution_share
       |FROM re CROSS JOIN tot
       |ORDER BY channel""".stripMargin
  }
}
