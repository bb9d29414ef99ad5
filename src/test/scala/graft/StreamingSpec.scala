package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Spark 4 arbitrary-state processor for the transformWithState case below:
  * per-key (max, count) in a typed ValueState. Top-level class — serialized
  * to executors, must not capture the suite. */
class RunningMaxCount
    extends StatefulProcessor[String, (String, Int), (String, Int, Long)] {
  @transient private var st: ValueState[(Int, Long)] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Int, Long)]("agg",
      Encoders.product[(Int, Long)], TTLConfig.NONE)
  override def handleInputRows(key: String, rows: Iterator[(String, Int)],
      timers: TimerValues): Iterator[(String, Int, Long)] = {
    var (m, c) = if (st.exists()) st.get() else (Int.MinValue, 0L)
    rows.foreach { r => m = math.max(m, r._2); c += 1 }
    st.update((m, c))
    Iterator((key, m, c))
  }
}

/** Structured Streaming semantics (SURVEY.md §2B streaming, §5.2.3):
  * streaming windowed aggregates must equal the batch expression of the same
  * logic on the same data; stateful dedup and arbitrary per-key state run
  * deterministically on a controlled MemoryStream (the analog of the
  * reference's hermetic io.Pipe transport mock,
  * /root/reference/mysql/conn_test.go:100-135). */
class StreamingSpec extends SparkSpec {

  private def sampleEvents(n: Int): Seq[(Timestamp, String, Double)] = {
    graft.sources.Tables.table(spark, sf, "events")
      .select(col("ts"), col("event_type"), col("value"))
      .limit(n).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2))).toSeq
  }

  test("streaming tumbling window agg equals the batch computation") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val data = sampleEvents(300)
    val ms = MemoryStream[(Timestamp, String, Double)]
    ms.addData(data: _*)
    val agg = ms.toDF().toDF("ts", "event_type", "value")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(18,4)")).as("total"))
    val q = agg.writeStream.format("memory").queryName("t_tumbling")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("t_tumbling")
      .select($"window.start".as("ws"), $"event_type", $"n", $"total")
      .collect().map(_.toSeq).toSet
    val batch = data.toDF("ts", "event_type", "value")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(18,4)")).as("total"))
      .select($"window.start".as("ws"), $"event_type", $"n", $"total")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("watermarked stateful dedup drops within-watermark duplicates") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    val ms = MemoryStream[(Long, Timestamp)]
    val deduped = ms.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.format("memory").queryName("t_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      ms.addData((1L, at(0)), (1L, at(1)), (2L, at(2)))
      q.processAllAvailable()
      ms.addData((1L, at(3)), (2L, at(4)), (3L, at(5)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("t_dedup").select($"id").collect().map(_.getLong(0))
    assert(ids.sorted.toSeq == Seq(1L, 2L, 3L), ids.mkString(","))
  }

  test("flatMapGroupsWithState maintains per-key running counts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Int)]
    val counted = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Int)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          Iterator((key, total))
      }
    val q = counted.toDF("key", "running").writeStream.format("memory")
      .queryName("t_state").outputMode(OutputMode.Update).start()
    try {
      ms.addData(("a", 1), ("a", 2), ("b", 1))
      q.processAllAvailable()
      ms.addData(("a", 3), ("b", 2))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("t_state").groupBy($"key")
      .agg(max($"running").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last == Map("a" -> 3L, "b" -> 2L), last.toString)
  }

  test("streaming Misra-Gries: incremental candidates cover heavy hitters") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the q108 batch sketch run INCREMENTALLY: the Aggregator's bounded
    // counter map (≤ k−1 entries) becomes the streaming aggregation state,
    // so a token stream of any length holds O(k) state — the streaming
    // twin of the batch heavy-hitter contract (candidates ⊇ every token
    // with freq > n/k; the exact recount makes the final answer exact)
    val k = 4
    val batch1 = Seq.fill(30)("hot") ++ Seq("a", "b", "c", "d", "e")
    val batch2 = Seq.fill(20)("warm") ++ Seq("f", "g", "h") ++
      Seq.fill(10)("hot")
    val all = batch1 ++ batch2
    val mg = new graft.functions.MisraGries(k)
    val ms = MemoryStream[String]
    val agg = ms.toDS().groupByKey(_ => 0).agg(mg.toColumn.name("cands"))
    val q = agg.toDF("g", "cands").writeStream.format("memory")
      .queryName("t_mg").outputMode(OutputMode.Update).start()
    try {
      ms.addData(batch1: _*); q.processAllAvailable()
      ms.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("t_mg").collect().map(_.getSeq[String](1).toSet)
    assert(rows.length == 2, s"one update row per trigger: ${rows.length}")
    // 'warm' never occurs in batch 1 → the row containing it IS the final
    // state (no reliance on memory-sink row order)
    val fin = rows.find(_.contains("warm"))
      .getOrElse(fail(s"no row holds the batch-2 heavy hitter: $rows"))
    val freq = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val heavy = freq.collect {
      case (t, c) if c > all.size.toLong / k => t
    }.toSet
    assert(heavy == Set("hot", "warm"), s"fixture sanity: $heavy")
    assert(heavy.subsetOf(fin), s"guarantee violated: $heavy vs $fin")
    // exact-recount agreement with the one-shot batch sketch (candidate
    // sets may differ by merge order; the recounted answer may not)
    val batchCands = all.toDS().select(mg.toColumn).head().toSet
    def recount(c: Set[String]) =
      c.filter(t => freq.getOrElse(t, 0L) > all.size.toLong / k)
    assert(recount(fin) == recount(batchCands),
      s"stream vs batch recounted answers differ: $fin vs $batchCands")
  }

  test("transformWithState maintains typed per-key state (Spark 4 API)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(String, Int)]
      val out = ms.toDS().groupByKey(_._1)
        .transformWithState(new RunningMaxCount, TimeMode.None(),
          OutputMode.Update())
      val q = out.toDF("key", "max", "n").writeStream.format("memory")
        .queryName("t_tws").outputMode(OutputMode.Update).start()
      try {
        ms.addData(("a", 3), ("a", 1), ("b", 7))
        q.processAllAvailable()
        ms.addData(("a", 5), ("b", 2))
        q.processAllAvailable()
      } finally q.stop()
      val last = spark.table("t_tws")
        .groupBy($"key").agg(max($"max").as("m"), max($"n").as("n")).collect()
        .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
      // state carried across micro-batches: a saw 3 rows (max 5), b saw 2 (max 7)
      assert(last == Map("a" -> (5, 3L), "b" -> (7, 2L)), last.toString)
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("append mode emits a window only after the watermark passes its end") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    val ms = MemoryStream[(Timestamp, Double)]
    val agg = ms.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("t_append")
      .outputMode(OutputMode.Append).start()
    try {
      ms.addData((at(0), 1.0), (at(5), 1.0), (at(12), 1.0))
      q.processAllAvailable() // watermark after batch: 00:02 — nothing closed
      assert(spark.table("t_append").count() == 0)
      ms.addData((at(25), 1.0))
      q.processAllAvailable() // watermark 00:15 after this batch
      ms.addData((at(26), 1.0))
      q.processAllAvailable() // batch starts at wm 00:15 ≥ 00:10 → emit
      val emitted = spark.table("t_append")
        .select($"window.start".as("s"), $"n").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toSet
      assert(emitted == Set((at(0), 2L)), emitted)
    } finally q.stop()
  }

  test("streaming sliding window agg equals the batch computation") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val data = sampleEvents(300)
    val ms = MemoryStream[(Timestamp, String, Double)]
    ms.addData(data: _*)
    def slide(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window($"ts", "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("ws"), $"n")
    val q = slide(ms.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("t_sliding")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("t_sliding").collect().map(_.toSeq).toSet
    val batch = slide(data.toDF("ts", "event_type", "value"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("foreachBatch sink applies custom batch logic per micro-batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val out = tempDir("graft_feb_")
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "tag").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // the streaming-upsert idiom: arbitrary per-batch logic (dedupe,
        // merge, re-partition) with exactly-once file output per batch id
        batch.select($"id", $"tag", lit(batchId).as("bid"))
          .write.mode("append").parquet(s"$out/data")
      }
      .option("checkpointLocation", s"$out/chk").start()
    try {
      ms.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      ms.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.parquet(s"$out/data")
    assert(back.count() == 3)
    assert(back.select($"bid").distinct().count() == 2) // two micro-batches
  }

  test("stream-stream interval join emits exactly the in-window matches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    val clicks = MemoryStream[(Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp)]
    val cl = clicks.toDF().toDF("id", "cts").withWatermark("cts", "10 minutes")
    val vw = views.toDF().toDF("vid", "vts").withWatermark("vts", "10 minutes")
    val joined = cl.join(vw,
      expr("id = vid AND vts BETWEEN cts AND cts + INTERVAL 10 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("t_ssjoin")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData((1L, at(1)), (2L, at(3)), (1L, at(20)))
      clicks.addData((1L, at(0)), (2L, at(2)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_ssjoin").select($"id", $"cts", $"vts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    // (1, at(20)) falls outside click@0 + 10 min → excluded
    assert(got == Set((1L, at(0), at(1)), (2L, at(2), at(3))), got)
  }

  test("left-outer interval join emits null matches only after the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    val clicks = MemoryStream[(Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp)]
    val cl = clicks.toDF().toDF("id", "cts").withWatermark("cts", "5 minutes")
    val vw = views.toDF().toDF("vid", "vts").withWatermark("vts", "5 minutes")
    val joined = cl.join(vw,
      expr("id = vid AND vts BETWEEN cts AND cts + INTERVAL 10 MINUTES"),
      "leftOuter")
    val q = joined.writeStream.format("memory").queryName("t_ssleft")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((1L, at(0)), (2L, at(0))) // 2 never gets a view
      views.addData((1L, at(4)))
      q.processAllAvailable()
      // unmatched click 2 cannot be emitted yet: its join window is open
      val early = spark.table("t_ssleft").collect()
        .map(r => (r.getLong(0), Option(r.get(2)))).toSet
      assert(early == Set((1L, Some(1L))),
        s"click 2 must be withheld until the watermark passes, got $early")
      // advance both watermarks past click@0 + 10 min + 5 min delay
      clicks.addData((9L, at(40)))
      views.addData((9L, at(40)))
      q.processAllAvailable()
      clicks.addData((8L, at(41))) // one more batch so the outer row flushes
      views.addData((8L, at(41)))
      q.processAllAvailable()
    } finally q.stop()
    val byId = spark.table("t_ssleft").collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(byId(1L) == Some(1L))
    assert(byId.contains(2L) && byId(2L).isEmpty,
      s"click 2 must surface with a NULL view after the watermark, got $byId")
  }

  test("parquet streaming sink round-trips the stream (append + checkpoint)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val out = tempDir("graft_ssink_")
    val ms = MemoryStream[(Long, String)]
    ms.addData((1L, "a"), (2L, "b"), (3L, "a"))
    val q = ms.toDF().toDF("id", "tag").writeStream
      .format("parquet").option("path", s"$out/data")
      .option("checkpointLocation", s"$out/chk")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      ms.addData((4L, "b"))
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.parquet(s"$out/data")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "a"), (2L, "b"), (3L, "a"), (4L, "b")), back)
  }

  test("streaming session windows equal the batch session computation") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    // two sessions for user 1 (gap ≥ 10 min), one for user 2
    val data = Seq((1L, at(0)), (1L, at(5)), (1L, at(30)), (2L, at(7)))
    val ms = MemoryStream[(Long, Timestamp)]
    ms.addData(data: _*)
    val agg = ms.toDF().toDF("user_id", "ts")
      .groupBy(session_window($"ts", "10 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("t_sessions")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("t_sessions")
      .select($"user_id", $"session_window.start".as("s"), $"n")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(got == Set((1L, at(0), 2L), (1L, at(30), 1L), (2L, at(7), 1L)), got)
  }

  test("streaming drift bins equal q195's batch histogram after two batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.sources.Tables.register(spark, sf)
    // reference cuts = snapshot A's exact deciles (the q195 bin rule)
    val cuts = spark.table("events").filter(col("event_id") % 2 === 0)
      .selectExpr(
        "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9)) AS c")
      .head().getSeq[Double](0).toArray
    // snapshot B (drifted) arrives as a stream in two micro-batches; the
    // running per-bin counts are plain streaming aggregation state
    val bVals = spark.table("events").filter(col("event_id") % 2 === 1)
      .select(col("user_id"), col("value")).collect()
      .map(r => if (r.getLong(0) % 3 == 0) r.getDouble(1) * 1.25 + 2.0
        else r.getDouble(1))
    val (h1, h2) = bVals.splitAt(bVals.length / 2)
    val ms = MemoryStream[Double]
    val binned = ms.toDS()
      .map(v => cuts.count(v >= _))
      .groupBy(col("value").as("bin")).count()
    val q = binned.writeStream.format("memory").queryName("t_drift")
      .outputMode(OutputMode.Complete).start()
    try {
      ms.addData(h1.toSeq: _*)
      q.processAllAvailable()
      ms.addData(h2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_drift").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // must equal the batch monitor's raw per-bin counts (q195's n_b)
    val expect = SparkEntry.queries("q195_psi_drift")(spark, sf).collect()
      .map(r => r.getAs[Long]("bin").toInt -> r.getAs[Long]("n_b"))
      .filter(_._2 > 0).toMap
    assert(got == expect, s"$got vs $expect")
  }

  test("streaming Holt state equals the batch recursion after two batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the REAL fixture daily series per event type, split mid-series into
    // two micro-batches — state must carry across the batch boundary
    val daily = graft.sources.Tables.table(spark, sf, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day")).count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    val (first, second) = daily.splitAt(daily.length / 2)
    val ms = MemoryStream[(String, Long, Long)]
    val out = graft.streaming.StreamingQueries
      .holtStreamingState(ms.toDS(), alpha = 0.3, beta = 0.1)
    val q = out.toDF("key", "t", "l", "b").writeStream.format("memory")
      .queryName("t_holt").outputMode(OutputMode.Update).start()
    try {
      ms.addData(first: _*)
      q.processAllAvailable()
      ms.addData(second: _*)
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("t_holt")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
          .orderBy(col("t").desc)))
      .filter(col("rn") === 1).collect()
      .map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("t"), r.getAs[Double]("l"), r.getAs[Double]("b"))))
      .toMap
    // reference: the q198 textbook fold on the same series
    val expect = daily.groupBy(_._1).map { case (k, xs) =>
      val ys = xs.sortBy(_._2).map(_._3.toDouble)
      var (t, l, b) = (0L, 0.0, 0.0)
      ys.foreach { y =>
        if (t == 0L) { t = 1; l = y; b = 0.0 }
        else if (t == 1L) { t = 2; b = y - l; l = y }
        else {
          val l2 = 0.3 * y + 0.7 * (l + b)
          b = 0.1 * (l2 - l) + 0.9 * b
          l = l2
          t += 1
        }
      }
      k -> ((t, l, b))
    }
    assert(last == expect, s"$last vs $expect")
  }

  test("streaming EWMA state equals the batch fold bit-for-bit across a batch boundary") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the REAL fixture event stream in event-time order, split mid-stream
    // into two micro-batches — per-user state must carry across the boundary
    val evs = graft.sources.Tables.table(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("tus"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._2, x._3)).toSeq
    val (first, second) = evs.splitAt(evs.length / 2)
    val ms = MemoryStream[(Long, Long, Long, Double)]
    val out = graft.streaming.StreamingQueries
      .ewmaStreamingState(ms.toDS(), alpha = 0.2)
    // transformWithState runs on the RocksDB state store only — set it for
    // this query and restore the session default after
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val q = out.toDF("user_id", "n_events", "ewma").writeStream
      .format("memory").queryName("t_ewma")
      .outputMode(OutputMode.Update).start()
    try {
      ms.addData(first: _*)
      q.processAllAvailable()
      ms.addData(second: _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
    val last = spark.table("t_ewma")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("n_events").desc)))
      .filter(col("rn") === 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // reference: q112's fold spelled with the batch literals — BIT equality
    val expect = evs.groupBy(_._1).map { case (u, xs) =>
      val vs = xs.sortBy(x => (x._2, x._3)).map(_._4)
      u -> ((vs.length.toLong,
        vs.tail.foldLeft(vs.head)((acc, v) => 0.2 * v + 0.8 * acc)))
    }
    assert(last == expect)
    // and the floor-rounded last states equal the oracle-checked q112 rows
    val q112 = SparkEntry.queries("q112_ewma")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val rounded = last.view.mapValues { case (n, e) =>
      (n, math.floor(e * 10000 + 0.5) / 10000)
    }.toMap
    assert(rounded == q112)
  }

  test("streaming CUSUM state equals q163's batch closed form across a batch boundary") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.sources.Tables.register(spark, sf)
    // the fixture's per-user daily rollup in day order, split mid-stream —
    // per-user (S, max, n_days, n_alarms) state must carry the boundary
    val dayUs = 86400000000L
    val daily = spark.table("events")
      .select(col("user_id"), expr(s"unix_micros(ts) div $dayUs").as("day"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._2, x._1)).toSeq
    // the batch query's integer reference c = tot div nd + 1
    val nd = daily.length.toLong
    val tot = daily.map(_._3).sum
    val c = tot / nd + 1
    val (first, second) = daily.splitAt(daily.length / 2)
    val ms = MemoryStream[(Long, Long, Long)]
    val out = graft.streaming.StreamingQueries
      .cusumStreamingState(ms.toDS(), c, alarmAt = 3L)
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val q = out.toDF("user_id", "n_days", "max_cusum", "n_alarm_days")
      .writeStream.format("memory").queryName("t_cusum")
      .outputMode(OutputMode.Update).start()
    try {
      ms.addData(first: _*)
      q.processAllAvailable()
      ms.addData(second: _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
    val last = spark.table("t_cusum")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("n_days").desc)))
      .filter(col("rn") === 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // all-integer recursion vs all-integer closed form: EXACT equality
    // with the oracle-checked q163 rows, no rounding anywhere
    val q163 = SparkEntry.queries("q163_cusum_changepoint")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(last == q163)
    assert(q163.values.exists(_._3 > 0), "fixture must trigger some alarms")
  }

  test("streaming sequence packing equals q223's batch fold across a batch boundary") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.sources.Tables.register(spark, sf)
    // the per-block (blk, doc_id, n_tokens) arrival stream in doc order,
    // split mid-stream — the open pack's (pack, fill, pos) state must
    // carry the boundary so a pack can straddle two micro-batches
    val arrivals = spark.table("documents")
      .select(expr("doc_id div 64").as("blk"), col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._2).toSeq
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val ms = MemoryStream[(Long, Long, Long)]
    val out = graft.streaming.StreamingQueries
      .packingStreamingState(ms.toDS(), budget = 128L)
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val q = out.toDF("doc_id", "blk", "pack_id", "pack_pos", "n_tokens")
      .writeStream.format("memory").queryName("t_pack")
      .outputMode(OutputMode.Update).start()
    try {
      ms.addData(first: _*)
      q.processAllAvailable()
      ms.addData(second: _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
    // each doc is assigned exactly once, on arrival — the union of both
    // micro-batches' emissions IS the assignment; all integers → exact
    // equality with the oracle-checked batch rows
    val got = spark.table("t_pack").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1).toSeq
    val batch = SparkEntry.queries("q223_sequence_packing")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1).toSeq
    assert(got == batch)
    assert(got.map(_._1).distinct.length == got.length,
      "every doc must be assigned exactly once")
  }

  test("streaming repetition gate equals q118's batch keep rollup across a batch boundary") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.sources.Tables.register(spark, sf)
    // the ingest arrival stream (lang, doc_id, text) in doc order, split
    // mid-stream — per-lang (n_docs, n_keep) state must carry the boundary
    val arrivals = spark.table("documents")
      .select(col("lang"), col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._2).toSeq
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val ms = MemoryStream[(String, Long, String)]
    val out = graft.streaming.StreamingQueries
      .repetitionGateStreamingState(ms.toDS())
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val q = out.toDF("lang", "n_docs", "n_keep")
      .writeStream.format("memory").queryName("t_repgate")
      .outputMode(OutputMode.Update).start()
    try {
      ms.addData(first: _*)
      q.processAllAvailable()
      ms.addData(second: _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
    val last = spark.table("t_repgate")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("n_docs").desc)))
      .filter(col("rn") === 1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the Scala per-doc replay vs the Catalyst batch expressions, rolled
    // up per lang from the oracle-checked q118 rows — all integers, EXACT
    val keepByDoc = SparkEntry.queries("q118_repetition_stats")(spark, sf)
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = arrivals.groupBy(_._1).view.mapValues { docs =>
      (docs.length.toLong, docs.map(d => keepByDoc(d._2).toLong).sum)
    }.toMap
    assert(last == batch)
    assert(batch.values.exists(v => v._2 < v._1),
      "fixture must contain repetition-gate failures")
    assert(batch.values.exists(_._2 > 0),
      "fixture must contain repetition-gate passes")
  }

  test("streaming HLL sketch state equals q161's batch registers across a batch boundary") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.sources.Tables.register(spark, sf)
    // NO ordering contract: register max-merge is commutative/associative/
    // idempotent, so arrivals stream in an adversarial order (reversed,
    // with duplicates across the boundary) and must still converge to the
    // batch registers exactly
    val arrivals = spark.table("events")
      .select(col("event_type"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .reverse.toSeq
    val (first, second) = arrivals.splitAt(arrivals.length / 3)
    val ms = MemoryStream[(String, Long)]
    val out = graft.streaming.StreamingQueries.hllStreamingState(ms.toDS())
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val q = out.toDF("event_type", "reg_checksum", "est")
      .writeStream.format("memory").queryName("t_hll")
      .outputMode(OutputMode.Update).start()
    try {
      ms.addData(first: _*)
      q.processAllAvailable()
      // re-send some already-seen users too: idempotence across batches
      ms.addData((second ++ first.take(50)): _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
    // the LAST emission per type carries the converged registers; compare
    // checksum exactly and the estimate at q161's r4 floor-round
    val got = spark.table("t_hll")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
          .orderBy(col("reg_checksum").desc)))
      .collect().groupBy(_.getString(0)).view.mapValues { rows =>
        // checksum is monotone under max-merge: the max checksum row is
        // the final state
        val last = rows.maxBy(_.getLong(1))
        (last.getLong(1),
          math.floor(last.getDouble(2) * 10000 + 0.5) / 10000)
      }.toMap
    val batch = SparkEntry.queries("q161_hll_distinct")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("reg_checksum"), r.getAs[Double]("hll_est")))).toMap
    assert(got == batch,
      s"stream registers diverged: got $got vs batch $batch")
  }

  test("streaming incremental LSH pairs equal the batch candidate set") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.sources.Tables.register(spark, sf)
    import graft.operators.DedupQueries
    // banded MinHash rows for the first 120 fixture docs, computed once in
    // batch; the stream replays them as two "crawl batches" split by doc_id
    val docs = spark.table("documents").filter($"doc_id" < 120)
    val bandRows = DedupQueries.minhashBandRowsOf(docs)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val batchPairs = DedupQueries
      .saltedBucketPairs(DedupQueries.minhashBandRowsOf(docs),
        DedupQueries.defaultBucketCap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (early, late) = bandRows.partition(_._3 < 60)
    val ms = MemoryStream[(Int, String, Long)]
    val paired = graft.streaming.StreamingQueries.incrementalBandPairs(ms.toDS(),
      DedupQueries.defaultBucketCap)
    val q = paired.toDF("id_a", "id_b").writeStream.format("memory")
      .queryName("t_inc_pairs").outputMode(OutputMode.Append).start()
    try {
      ms.addData(early.toSeq: _*)
      q.processAllAvailable()
      ms.addData(late.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_inc_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == batchPairs,
      s"stream-only: ${(got -- batchPairs).take(5)}; " +
        s"batch-only: ${(batchPairs -- got).take(5)}")
    assert(batchPairs.nonEmpty, "fixture must contain planted near-dups")
  }

  test("streaming semantic dedup equals q119's batch drop set across a " +
      "batch boundary") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.sources.Tables.register(spark, sf)
    import graft.operators.SimilarityQueries
    // frozen trained artifact: the memoized centroids — incremental
    // ingestion routes new vectors through them, never re-trains
    val centFrame = SimilarityQueries.ivfCentroids(spark)
    val cents = centFrame.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
      .sortBy(_._1)
    val assigned = SimilarityQueries.ivfAssign(spark, centFrame)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
      .sortBy(_._1)
    // the twin's frozen-cluster argmax must equal the batch assignment for
    // every fixture vector (same r6 cosine, same tie rule)
    assigned.foreach { case (id, emb, cl) =>
      assert(graft.streaming.StreamingQueries.semdedupAssign(emb, cents)
        == cl, s"assignment diverged for vec $id")
    }
    // id-ordered arrival split mid-stream: a cluster's member state must
    // carry the micro-batch boundary (late vectors compare against early
    // arrivals held in RocksDB state)
    val arrivals = assigned.map { case (id, emb, cl) => (cl, id, emb) }
    val (first, second) = arrivals.splitAt(arrivals.length / 2)
    val ms = MemoryStream[(Int, Long, Array[Double])]
    val out = graft.streaming.StreamingQueries
      .semdedupStreamingState(ms.toDS())
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val q = out.toDF("dropped", "keeper", "cl", "cos")
      .writeStream.format("memory").queryName("t_semdedup")
      .outputMode(OutputMode.Update).start()
    try {
      ms.addData(first: _*)
      q.processAllAvailable()
      ms.addData(second: _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
    // drop decisions are final on arrival; the union of both batches'
    // emissions is the drop set. Cosines are the identical IEEE fold +
    // r4 floor-round on both paths → EXACT equality, doubles included.
    val got = spark.table("t_semdedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    val batch = SparkEntry.queries("q119_semantic_dedup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(got == batch,
      s"stream-only: ${(got.toSet -- batch.toSet).take(3)}; " +
        s"batch-only: ${(batch.toSet -- got.toSet).take(3)}")
    assert(batch.nonEmpty, "fixture must contain semantic near-dups")
  }

  test("streaming bitmap distinct state equals the batch popcounts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.sources.Tables.register(spark, sf)
    // q168's membership-word fold as STREAMING aggregation state: bit_or is
    // idempotent AND commutative, so the per-(type, word) running OR is a
    // mergeable sketch — exactly-once distinct counting with O(words)
    // state and no per-user dedup state, replayed here against the batch
    // fold over the same fixture rows, split into two "arrival" batches
    val rows = spark.table("events").select($"event_type", $"user_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val batch = graft.operators.EventAnalyticsQueries
      .bitmapWordsOf(spark.table("events"))
      .groupBy($"event_type").agg(sum(expr("bit_count(w)")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (early, late) = rows.partition(_._2 % 2 == 0)
    val ms = MemoryStream[(String, Long)]
    val agg = graft.operators.EventAnalyticsQueries
      .bitmapWordsOf(ms.toDF().toDF("event_type", "user_id"))
    val q = agg.writeStream.format("memory").queryName("t_bitmap")
      .outputMode(OutputMode.Complete).start()
    try {
      ms.addData(early.toSeq: _*)
      q.processAllAvailable()
      ms.addData(late.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_bitmap")
      .groupBy($"event_type").agg(sum(expr("bit_count(w)")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == batch, s"$got vs $batch")
    assert(batch.values.sum > 0)
  }

  test("streaming foreachBatch upsert maintains the partitioned table") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the streaming-CDC shape: micro-batches of corrections land in a
    // partitioned table through the SAME dynamic-partition upsert the
    // batch MERGE analog (q99c) uses inside foreachBatch — the final table
    // must equal applying all corrections at once in batch
    val base = tempDir("graft_supsert_")
    Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30), (4L, "c", 40))
      .toDF("k", "part", "v")
      .write.partitionBy("part").parquet(s"$base/layout")
    val ms = MemoryStream[(Long, String, Int)]
    val q = ms.toDF().toDF("k", "part", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.sources.IngestQueries.upsertPartitioned(spark,
          s"$base/layout", s"$base/stage_$id", batch, "k", "part")
      }
      .outputMode(OutputMode.Append).start()
    try {
      ms.addData((2L, "a", 21), (5L, "a", 50)) // update + insert, batch 0
      q.processAllAvailable()
      ms.addData((3L, "b", 31)) // update in another partition, batch 1
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$base/layout")
      .select($"k", $"part", $"v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set((1L, "a", 10), (2L, "a", 21), (3L, "b", 31),
      (4L, "c", 40), (5L, "a", 50)), got)
  }

  test("q130 batch gap sessionization equals session_window on the fixture") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    // the batch LAG/SUM formulation and Spark's session_window use the
    // same boundary rule (an event extends its session to [ts, ts+gap)),
    // so per-(user, session-start) event counts must agree exactly
    val gapUs = graft.operators.EventAnalyticsQueries.sessionGapUs
    val got = SparkEntry.queries("q130_sessionize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(2))).toSet
    val sw = spark.table("events")
      .groupBy(session_window($"ts", s"${gapUs / 1000000} seconds"),
        $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", unix_micros($"session_window.start").as("start_us"),
        $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == sw,
      s"batch-only: ${(got -- sw).take(3)}; sw-only: ${(sw -- got).take(3)}")
    assert(got.size > spark.table("events")
      .select($"user_id").distinct().count(),
      "gap must genuinely split users into multiple sessions")
  }
}
