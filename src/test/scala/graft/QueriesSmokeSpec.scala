package graft

/** Every declared operator runs end-to-end on sf0.001 (the t1 smoke,
  * SURVEY.md §5.2.5): plan builds, executes, and returns rows. Result
  * *values* are covered by the DuckDB oracle gate (Verify + tools/check.py);
  * this spec guards plan regressions per operator.
  */
class QueriesSmokeSpec extends SparkSpec {

  /** Queries whose result can legitimately be empty at sf0.001 (similarity /
    * near-dup thresholds over ~50-row fixtures). */
  private val mayBeEmpty = Set(
    "q16_join_anti", // all sf0.001 customers have orders
    "q71_shingle_jaccard", "q73_minhash_band_pairs", "q76_ml_minhash",
    "q81_cosine_pairs")

  test("entry returns rows (driver t1 contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    assert(qs.size == SparkEntry.allQueries.size, "duplicate query names")
  }

  SparkEntry.allQueries.foreach { gq =>
    test(s"${gq.name} executes on sf0.001") {
      val n = gq.run(spark, sf).count()
      if (mayBeEmpty(gq.name)) assert(n >= 0) else assert(n > 0)
    }
  }

  /** Queries whose body performs writes / starts streams — their plans are
    * validated by their own execution above, not re-built here. */
  private val sideEffecting =
    Set("q93_partitioned_events", "q107_zorder_layout", "q94_stream_ingest",
      "q111_stream_dedup",
      "q98_csv_ingest_roundtrip", "q99_insert_select_roundtrip",
      "q99b_partition_overwrite",
      "q88_bucketed_join") // write-path queries

  test("approximate statistics stay within documented error bounds") {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.register(spark, sf)
    val r = spark.table("lineitem").agg(
      approx_count_distinct(col("l_partkey")).as("a"),
      countDistinct(col("l_partkey")).as("e")).head()
    val (a, e) = (r.getLong(0), r.getLong(1))
    // default HLL++ rsd is 5% — assert a generous 2× envelope
    assert(math.abs(a - e).toDouble / e < 0.10, s"approx $a vs exact $e")
    val exact = spark.table("lineitem")
      .selectExpr("percentile(l_quantity, 0.5)").head().getDouble(0)
    val approx = spark.table("lineitem").stat
      .approxQuantile("l_quantity", Array(0.5), 0.01).head
    assert(math.abs(approx - exact) <= 2.0, s"approxQuantile $approx vs $exact")
  }

  test("q27b approx percentile lands inside the GK rank window per group") {
    graft.sources.Tables.register(spark, sf)
    // Greenwald-Khanna guarantee at accuracy 10000: the result is an ACTUAL
    // element of the group whose rank is within ε·n (ε = 1e-4) of the
    // target rank — assert exactly that, on the group's sorted multiset
    // (test-side collect of the tiny sf0.001 fixture only).
    val eps = 1e-4
    val groups = spark.table("lineitem")
      .select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    val rows = SparkEntry.queries("q27b_approx_percentile")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val a = r.getAs[Double]("approx_p50")
      val vs = groups(flag)
      val n = vs.length
      val (first, last) = (vs.indexWhere(_ == a), vs.lastIndexWhere(_ == a))
      assert(first >= 0, s"$flag: approx p50 $a is not an element of the group")
      val target = 0.5 * n
      val tol = eps * n + 1 // ε·n rank error + 1 for the rank convention
      assert(first - tol <= target && target <= last + tol,
        s"$flag: rank window [$first, $last] of $a too far from $target (n=$n)")
    }
  }

  test("fold/sketch queries are invariant to the shuffle-partition count") {
    // the queries whose determinism rests on an argument (sorted 0-seeded
    // folds, sketch-then-exact-recount, distributed fixpoints) must prove
    // it: identical rows under a different partitioning, not just one
    // lucky layout. (The driver's oracle gate runs at one partition count;
    // this is the second.)
    val sensitive = Seq("q108_heavy_hitters", "q109_lm_score",
      "q109b_bigram_lm_score", "q110_ppjoin", "q77_dedup_components",
      "q64c_char_entropy", "q112_ewma", "q66c_winnowing_matches",
      // q161: estimate rests on dyadic partial sums being order-exact;
      // q162: pair counts survive collect_set's arbitrary set order
      "q161_hll_distinct", "q162_source_overlap",
      // q171: merged-register dyadic sums, same argument as q161;
      // q175: XOR fold must cancel identically under any partitioning;
      // q176: per-source ratio divides partition-order-exact integer sums;
      // q167: path assembly rests on sort_array, not collect order
      "q171_hll_union", "q175_corpus_checksum", "q176_compression_quality",
      "q167_event_paths",
      // q178/q180: sketch-cell integer rollups (histogram, AGMS signs);
      // q181: bloom word OR + probe; q182: integer cent-split remainders
      "q178_histogram_quantile", "q180_join_size_sketch",
      "q181_bloom_decontaminate", "q182_linear_attribution",
      // q184: two-level bucketed KL/TV fold — sorted within md5-mod-64
      // buckets, then sorted over the 64 bucket partials;
      // q183: per-chunk union-find over sorted member arrays
      "q184_token_drift", "q183_golden_record",
      // q186: share denominator is a sorted fold over the source array;
      // q190: all five OLS moment sums are sorted folds over the top-100
      // collected array
      "q186_temperature_mixing", "q190_zipf_slope",
      // q192: per-round argmax over integer pair counts + per-word folds
      "q192_bpe_merges",
      // q198: day-sorted sequential two-state fold per event type
      "q198_holt_forecast",
      // q204/q205: chunked two-phase prefix ranks must match the global
      // order under any partitioning; q203: zipWithIndex global sequence
      "q204_ks_test", "q205_gini_revenue", "q203_epoch_shuffle",
      // r09 additions with fold/rank arguments: q217/q218 integer rank
      // fusion over two TakeOrdered cuts; q219 per-doc greedy fold;
      // q221 diagonal islands over digest joins
      "q217_rrf_fusion", "q218_ann_recall_eval", "q219_semantic_chunking",
      "q221_dupspan_align",
      // r10: q223's per-block greedy packing fold (sort_array-pinned
      // member order, conditional accumulator); q229's source-sorted
      // entropy fold + rounded-maxima grid
      "q223_sequence_packing", "q229_mixing_sweep",
      // r11: q238's two-level md5-bucketed centroid mean fold; q241's
      // span-vote majority over the memoized vote relation
      "q238_source_centroid_sim", "q241_mixed_language")
    val conf = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(conf)
    sensitive.foreach { name =>
      val base = SparkEntry.queries(name)(spark, sf).collect().map(_.toString)
      try {
        spark.conf.set(conf, "7")
        // bump the memo generation so memo-backed queries REBUILD their
        // shared relations under the 7-partition config — otherwise the
        // sweep compares a cached frame to itself and proves nothing for
        // them (r10, after the shared-relation memo landed)
        graft.sources.Tables.noteViewSwap(spark)
        val alt = SparkEntry.queries(name)(spark, sf).collect().map(_.toString)
        assert(base.sameElements(alt),
          s"$name differs at 7 shuffle partitions (n=${base.length} vs ${alt.length})")
      } finally {
        spark.conf.set(conf, before)
        // drop the sweep's per-name cold generation builds again
        graft.sources.Tables.noteViewSwap(spark)
      }
    }
  }

  test("no query plan degenerates to an unpartitioned CartesianProduct") {
    val offenders = SparkEntry.allQueries
      .filterNot(q => sideEffecting(q.name) || q.name == "q17_join_cross")
      .filter { gq =>
        gq.run(spark, sf).queryExecution.executedPlan.toString
          .contains("CartesianProduct")
      }.map(_.name)
    assert(offenders.isEmpty, s"cartesian plans: $offenders")
  }
}
