package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DedupQueries, TextQueries}

/** Hot-bucket guard behavior (DedupQueries.saltedBucketPairs): the fixture's
  * LSH buckets never exceed 4 members, so these cases build SYNTHETIC
  * degenerate buckets to drive the salt/overflow branch the real corpora at
  * 100 TB would hit — the cap must bound per-group work, emit the exact
  * chunked pair count, stay a subset of the uncapped enumeration, and be
  * deterministic.
  */
class DedupSpec extends SparkSpec {

  private def bucket(band: Int, bh: String, ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map(id => (band, bh, id)).toDF("band", "bh", "doc_id")
  }

  private def pairs(df: DataFrame, cap: Int): Set[(Long, Long)] =
    DedupQueries.saltedBucketPairs(df, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** f full chunks of `cap` + one remainder chunk. */
  private def chunkedCount(n: Int, cap: Int): Long = {
    val full = n / cap
    val rem = n % cap
    full.toLong * cap * (cap - 1) / 2 + rem.toLong * (rem - 1) / 2
  }

  test("degenerate bucket beyond the cap: chunked count, subset, ordering") {
    val n = 600 // > 2 × defaultBucketCap → salt values 0, 1, 2 all occur
    val cap = DedupQueries.defaultBucketCap
    assert(n > 2 * cap)
    val b = bucket(0, "hot", (1L to n).map(3 * _)) // non-contiguous ids
    val capped = pairs(b, cap)
    val uncapped = pairs(b, n + 1)
    assert(uncapped.size == n.toLong * (n - 1) / 2)
    assert(capped.size == chunkedCount(n, cap))
    assert(capped.subsetOf(uncapped), "capped pairs must be ⊆ uncapped")
    assert(capped.forall { case (a, c) => a < c }, "id_a < id_b invariant")
    // salting chunks by doc_id rank, so the first `cap` ids form a complete
    // clique in the capped output while cross-chunk pairs are dropped
    val firstChunkTop = 3L * cap
    assert(capped.contains((3L, firstChunkTop)))
    assert(!capped.contains((3L, firstChunkTop + 3)),
      "pair spanning two salt chunks must be dropped")
  }

  test("buckets at or below the cap are enumerated exhaustively") {
    val cap = DedupQueries.defaultBucketCap
    val small = bucket(0, "a", Seq(5L, 1L, 9L))
      .unionAll(bucket(1, "b", (1L to cap).toSeq))
      .unionAll(bucket(2, "c", Seq(7L))) // singleton: no pairs
    val got = pairs(small, cap)
    val cliqueA = Set((1L, 5L), (1L, 9L), (5L, 9L))
    val cliqueB = (for {
      a <- 1L to cap; b <- (a + 1) to cap
    } yield (a, b)).toSet
    assert(got == cliqueA ++ cliqueB)
  }

  test("salted enumeration is deterministic across runs and repartitioning") {
    val cap = 16
    val ids = (1L to 100L).map(7 * _)
    val b = bucket(0, "hot", ids)
    val r1 = pairs(b, cap)
    val r2 = pairs(b.repartition(8), cap)
    assert(r1 == r2, "pair set must not depend on physical partitioning")
    assert(r1.size == chunkedCount(100, cap))
  }

  test("a doc in two band buckets pairs per-bucket, deduplicated") {
    val cap = DedupQueries.defaultBucketCap
    val twoBands = bucket(0, "x", Seq(1L, 2L)).unionAll(bucket(1, "y", Seq(1L, 2L)))
    assert(pairs(twoBands, cap) == Set((1L, 2L)))
  }

  test("q73c bucket stats: fixture far below cap, dropped identically zero") {
    val stats = SparkEntry.queries("q73c_lsh_bucket_stats")(spark, sf).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(r.getAs[Long]("bucket_size") <= DedupQueries.defaultBucketCap)
      assert(r.getAs[Long]("pairs_dropped") == 0L)
      assert(r.getAs[Long]("pairs_capped") == r.getAs[Long]("pairs_uncapped"))
    }
    // histogram accounting: Σ size·buckets = total band rows (4 per doc)
    val totalRows = stats.map(r =>
      r.getAs[Long]("bucket_size") * r.getAs[Long]("n_buckets")).sum
    val nDocs = spark.table("documents").count()
    assert(totalRows == 4 * nDocs)
    // pair accounting: Σ pairs_uncapped ≥ distinct q73 pairs (multi-band
    // co-occurrence makes the per-bucket sum an overcount, never an under)
    val q73 = SparkEntry.queries("q73_minhash_band_pairs")(spark, sf).count()
    assert(stats.map(_.getAs[Long]("pairs_uncapped")).sum >= q73)
  }

  test("pointer-doubling components: 300-deep chain converges in O(log d) rounds") {
    // A path graph 0-1-2-…-300 has diameter 300: pure min-label propagation
    // needs ~300 rounds (the pre-r05 loop capped out at 64), while the
    // pointer-doubling jump halves the remaining distance each round. This
    // is the 100 TB shape — near-dup chains (A≈B≈C≈…) grow with corpus size.
    import spark.implicits._
    val n = 300L
    val nodes = (0L to n).toDF("doc_id")
    val fwd = (0L until n).map(i => (i, i + 1)).toDF("a", "b")
    val edges = fwd.unionAll(fwd.select($"b".as("a"), $"a".as("b")))
    val (labels, rounds) = DedupQueries.propagateComponents(nodes, edges)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == n + 1 && got.values.forall(_ == 0L),
      "every chain node must resolve to component 0")
    assert(rounds <= 16, s"expected O(log 300) ≈ ≤16 rounds, took $rounds")
  }

  test("pointer-doubling components match per-component min on a mixed graph") {
    // Two components + isolated nodes; labels must equal each component's
    // min doc_id and singletons must keep their own id.
    import spark.implicits._
    val nodes = (1L to 12L).toDF("doc_id")
    val undirected = Seq((3L, 7L), (7L, 11L), (2L, 10L), (10L, 4L), (4L, 2L))
    val edges = undirected.toDF("a", "b")
      .unionAll(undirected.map(_.swap).toDF("a", "b"))
    val (labels, _) = DedupQueries.propagateComponents(nodes, edges)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = Map(3L -> 3L, 7L -> 3L, 11L -> 3L, 2L -> 2L, 10L -> 2L,
      4L -> 2L) ++ Seq(1L, 5L, 6L, 8L, 9L, 12L).map(i => i -> i)
    assert(got == expected)
  }

  /** Boilerplate corpus for the df-cap guards: every doc opens with the same
    * 16-word header (hot shingles/fingerprints, df = n ≫ cap) followed by
    * doc-unique words; doc 1 is fully contained in doc 0 (same header +
    * unique span, doc 0 carries extra trailing words). */
  private def boilerplateDocs(n: Int): DataFrame = {
    import spark.implicits._
    val header = (1 to 16).map(i => s"h$i").mkString(" ")
    (0 until n).map { i =>
      val unique =
        if (i == 0) (1 to 12).map(j => s"share$j").mkString(" ") + " x1 x2 x3 x4"
        else if (i == 1) (1 to 12).map(j => s"share$j").mkString(" ")
        else (1 to 12).map(j => s"u${i}w$j").mkString(" ")
      (i.toLong, s"$header $unique")
    }.toDF("doc_id", "text")
  }

  test("containment df-cap: hot boilerplate shingles can't explode the join") {
    val docs = boilerplateDocs(100)
    val cap = DedupQueries.hotShingleDfCap
    // candidate volume (tau = 0 keeps every intersecting pair): the header
    // shingles alone would make ALL 100·99 ordered pairs intersect; with the
    // hot set dropped, only genuinely-shared rare shingles pair up
    val cands = DedupQueries.containmentPairs(docs, cap, 0.0).count()
    val uncapped = DedupQueries.containmentPairs(docs, 101, 0.0).count()
    assert(uncapped == 100L * 99, "header makes every ordered pair intersect")
    assert(cands < 50, s"guarded candidates must stay near-planted, got $cands")
    // the planted containment survives the guard: doc 1's surviving shingle
    // set is entirely inside doc 0's
    val found = DedupQueries.containmentPairs(docs, cap, 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((1L, 0L)), s"planted pair lost, got $found")
  }

  test("winnowing match df-cap: hot fingerprints dropped, planted match kept") {
    val docs = boilerplateDocs(100)
    val cap = TextQueries.matchDfCap
    val got = TextQueries.winnowedMatches(docs, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // boilerplate-only pairs (any pair among docs 2..99) share ONLY hot
    // fingerprints → no match rows; the planted shared span still matches
    assert(got == Set((0L, 1L)), s"expected only the planted pair, got $got")
    val uncapped = TextQueries.winnowedMatches(docs, 101).count()
    assert(uncapped > 1000, "without the cap the boilerplate pairs all match")
  }

  test("record-linkage (name, type) blocks keep headroom under the salt cap") {
    import spark.implicits._
    // q147/q183's oracle joins blocks UNCAPPED (unlike q71c, whose HAVING
    // replays the cap): the two sides agree only while every (name, type)
    // block fits in one salt chunk. Assert the fixture's largest block sits
    // well under the cap, so a future fixture/SF change that grows a block
    // past it fails HERE, loudly, instead of silently dropping pairs
    // (ADVICE r06).
    graft.sources.Tables.register(spark, sf)
    val maxBlock = spark.table("part")
      .groupBy($"p_name", $"p_type").count()
      .agg(max($"count")).head().getLong(0)
    val cap = DedupQueries.defaultBucketCap
    assert(maxBlock <= cap / 2,
      s"largest (name, type) block $maxBlock is within 2x of the salt cap " +
        s"$cap — the q147/q183 oracles assume uncapped blocks")
    // and the '|' separator can never appear inside either block field
    val sep = spark.table("part")
      .filter($"p_name".contains("|") || $"p_type".contains("|")).count()
    assert(sep == 0, "block fields contain the concat_ws separator")
  }

  test("linkage components: chunk closure matches the distributed fixpoint") {
    import spark.implicits._
    import graft.functions.LinkageComponents
    // one chunk: ids 1..8; sizes chain 10,11,12,… so adjacent ids match
    // (|Δsize| = 1) but distant ones don't — transitivity must chain them;
    // id 100 is a singleton (size far away) and must NOT appear
    val members = (1 to 8).map(i => (i.toLong, 9 + i, 50.0)) :+ (100L, 99, 50.0)
    val df = members.toDF("id", "size", "price")
      .agg(sort_array(collect_list(struct($"id", $"size", $"price")))
        .as("members"))
      .select(explode(LinkageComponents($"members", 1, 0.05)).as("m"))
      .select($"m.id", $"m.component")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (1 to 8).map(i => (i.toLong, 1L)).toSet,
      s"size chain must close transitively into one cluster, got $got")
    // the price rule gates matches exactly like the SQL spelling: 5% of
    // the larger price, inclusive boundary
    val pr = Seq((1L, 5, 100.0), (2L, 5, 95.0), (3L, 5, 90.24))
      .toDF("id", "size", "price")
      .agg(sort_array(collect_list(struct($"id", $"size", $"price")))
        .as("members"))
      .select(explode(LinkageComponents($"members", 1, 0.05)).as("m"))
      .select($"m.id", $"m.component")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 100→95 matches (5/100 = 0.05 exactly); 95→90.24 fails
    // (4.76/95 > 0.05); transitivity still links 3? No — no edge to 3.
    assert(pr == Set((1L, 1L), (2L, 1L)), s"got $pr")
    // equivalence with the fixpoint on the same edge set: same synthetic
    // block, labels from propagateComponents over the enumerated pairs
    val base = members.toDF("id", "size", "price")
    val a = base.select($"id".as("id_a"), $"size".as("size_a"),
      $"price".as("price_a"))
    val b = base.select($"id".as("id_b"), $"size".as("size_b"),
      $"price".as("price_b"))
    val pairs = a.crossJoin(b).filter($"id_a" < $"id_b" &&
      abs($"size_a" - $"size_b") <= 1 &&
      abs($"price_a" - $"price_b") /
        greatest($"price_a", $"price_b") <= 0.05)
      .select($"id_a", $"id_b")
    val edges = pairs.select($"id_a".as("a"), $"id_b".as("b"))
      .unionAll(pairs.select($"id_b".as("a"), $"id_a".as("b")))
    val nodes = pairs.select($"id_a".as("doc_id"))
      .unionAll(pairs.select($"id_b".as("doc_id"))).distinct()
    val (labels, _) = DedupQueries.propagateComponents(nodes, edges)
    val viaFixpoint = labels.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == viaFixpoint,
      s"chunk union-find and fixpoint disagree: $got vs $viaFixpoint")
  }

  test("seq1 n-gram guard: sub-width docs yield no rows instead of throwing") {
    import spark.implicits._
    // 1- and 2-token docs make sequence(1, size-2) DESCEND ([1, 0]) without
    // the guard → element_at(toks, 0) ANSI error (ADVICE r05); the oracle's
    // range() yields no rows, so the guarded Spark side must agree
    val docs = Seq((0L, "only"), (1L, "two words"),
      (2L, "a full three word document here")).toDF("doc_id", "text")
    val conts = DedupQueries.containmentPairs(docs, 16, 0.0).count()
    assert(conts == 0)
    val sels = TextQueries.winnowedSelectionsOf(docs)
      .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(sels == Set(2L), "short docs drop out; the 7-token doc winnows")
  }

  /** Plain-Scala replay of the q124/q124b duplicate-span semantics. */
  private def bruteDupspan(docs: Seq[(Long, String)], cap: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    val n = DedupQueries.dupspanN
    val toks = docs.map { case (d, t) => d -> t.toLowerCase.split(" ").toSeq }
    val occ = for {
      (d, ts) <- toks
      i <- 0 to ts.length - n
    } yield (d, i + 1, ts.slice(i, i + n).mkString(" "))
    val cnt = occ.groupBy(_._3).map { case (g, os) => g -> os.size }
    val dup = occ.filter(o => cnt(o._3) >= 2)
    val covered = dup.flatMap { case (d, p, _) =>
      (p until p + n).map(d -> _) }.toSet
    val firsts = dup.groupBy(_._3).collect {
      case (g, os) if cnt(g) <= cap => os.minBy(o => (o._1, o._2))
    }.toSet
    val keptCover = firsts.flatMap { case (d, p, _) =>
      (p until p + n).map(d -> _) }
    val removed = covered -- keptCover
    (covered.groupBy(_._1).map { case (d, ps) => d -> ps.size.toLong },
      removed.groupBy(_._1).map { case (d, ps) => d -> ps.size.toLong })
  }

  /** 6 docs share one boilerplate 8-gram (count 6 > keeper cap), docs 0/1
    * share one planted 8-gram span (count 2 → keeper-ranked), everything
    * else unique — boundary windows straddle segments so they stay unique. */
  private def dupspanDocs: Seq[(Long, String)] = {
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    def uniq(tag: Int) = (1 to 10).map(j => s"u${tag}w$j").mkString(" ")
    (0L until 8L).map { d =>
      val mid = if (d < 2) span else uniq(10 + d.toInt)
      val tail = if (d < 6) boiler else uniq(20 + d.toInt)
      (d, s"${uniq(d.toInt)} $mid $tail")
    }
  }

  test("dupspan stats/removal: brute-force replay incl. the no-keeper branch") {
    import spark.implicits._
    val docs = dupspanDocs
    val df = docs.toDF("doc_id", "text")
    val cap = DedupQueries.dupspanKeeperCap
    val (expCov, expRem) = bruteDupspan(docs, cap)
    val stats = DedupQueries.dupspanStatsOf(df).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap.filter(_._2 > 0)
    assert(stats == expCov, s"covered mismatch: $stats vs $expCov")
    val rem = DedupQueries.dupspanRemovalOf(df, cap).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap.filter(_._2 > 0)
    assert(rem == expRem, s"removal mismatch: $rem vs $expRem")
    // boilerplate branch really fired: the 6-occurrence 8-gram kept NO
    // copy under the cap, but keeps exactly one with the cap lifted
    val (_, expRemUncapped) = bruteDupspan(docs, 100)
    val remUncapped = DedupQueries.dupspanRemovalOf(df, 100).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap.filter(_._2 > 0)
    assert(remUncapped == expRemUncapped)
    assert(rem.values.sum > remUncapped.values.sum,
      "the no-keeper branch strictly increases removal")
    // with ranking uncapped every keeper lands in doc 0, so it loses nothing
    assert(expRemUncapped.getOrElse(0L, 0L) == 0L,
      "doc 0 holds every keeper when ranking is uncapped")
  }

  test("graph rank equals the dense power-iteration replay on a mixed graph") {
    import spark.implicits._
    // star hub 0 with leaves {1,2,3} + symmetric pair 4-5 + isolated 6:
    // the hub concentrates rank (each leaf sends its whole share), the
    // regular pair stays at 1.0, the isolated node sits at the damping
    // floor — a degree-regular graph would keep rank uniform and prove
    // nothing (first version of this test did exactly that)
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (4L, 5L))
      .toDF("id_a", "id_b")
    val nodes = (0L to 6L).toDF("doc_id")
    val got = DedupQueries.graphRankOf(nodes, pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // dense replay, contributions folded in ascending-neighbor order like
    // the engine's sorted fold
    val adj = Map(0L -> Seq(1L, 2L, 3L), 1L -> Seq(0L), 2L -> Seq(0L),
      3L -> Seq(0L), 4L -> Seq(5L), 5L -> Seq(4L))
    var r = (0L to 6L).map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      r = (0L to 6L).map { v =>
        val in = adj.toSeq.filter(_._2.contains(v)).map(_._1).sorted
          .map(u => r(u) / adj(u).size)
        v -> (0.15 + 0.85 * in.foldLeft(0.0)(_ + _))
      }.toMap
    }
    val expect = r.map { case (v, x) =>
      v -> ((adj.get(v).map(_.size.toLong).getOrElse(0L),
        math.floor(x * 10000 + 0.5) / 10000))
    }
    assert(got == expect)
    assert(got(6L)._2 == 0.15, s"isolated node off the floor: $got")
    assert(got(0L)._2 > got(4L)._2 && got(4L)._2 > got(1L)._2,
      s"hub > regular pair > leaf ordering broken: $got")
  }

  test("triangle count matches the brute-force replay on a mixed graph") {
    import spark.implicits._
    // K4 on {0,1,2,3} (4 triangles, every node in 3) + a triangle-free
    // path 4-5-6 (wedge at 5 must NOT close) + pendant 7 off node 0:
    // exercises multi-triangle nodes, open wedges, and deg-1 coefficient
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (4L, 5L), (5L, 6L), (0L, 7L)).toDF("id_a", "id_b")
    val got = DedupQueries.trianglesOf(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // brute force over all ordered triples
    val es = Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (4L, 5L), (5L, 6L), (0L, 7L))
    def e(a: Long, b: Long) = es(if (a < b) (a, b) else (b, a))
    val nodes = 0L to 7L
    val tris = for {
      a <- nodes; b <- nodes if a < b; c <- nodes if b < c
      if e(a, b) && e(b, c) && e(a, c)
    } yield (a, b, c)
    assert(tris.size == 4, s"K4 must hold 4 triangles: $tris")
    val expect = nodes.flatMap { v =>
      val deg = nodes.count(u => u != v && e(u, v)).toLong
      val nt = tris.count(t => t._1 == v || t._2 == v || t._3 == v).toLong
      if (deg == 0) None
      else Some(v -> ((deg, nt,
        if (deg >= 2) math.floor(2.0 * nt / (deg * (deg - 1)) * 10000 + 0.5)
          / 10000
        else 0.0)))
    }.toMap
    assert(got == expect, s"got $got\nexpect $expect")
    assert(got(5L)._2 == 0L, "open wedge at 5 must not count")
    assert(got(7L) == ((1L, 0L, 0.0)), "pendant: deg 1, coefficient 0")
    assert(got(1L) == ((3L, 3L, 1.0)),
      s"pure K4 node: every neighbor pair closed: ${got(1L)}")
    assert(got(0L) == ((4L, 3L, 0.5)),
      s"K4 node + pendant: 2*3/(4*3) = 0.5: ${got(0L)}")
  }

  test("dupspan sub-width docs: no occurrence rows, full-stats row survives") {
    import spark.implicits._
    val df = Seq((0L, "just three tokens"),
      (1L, (1 to 12).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val stats = DedupQueries.dupspanStatsOf(df).collect()
    assert(stats.length == 2, "short doc still reported (left join)")
    val short = stats.find(_.getLong(0) == 0L).get
    assert(short.getLong(1) == 3 && short.getLong(3) == 0 &&
      short.getInt(5) == 1, "3-token doc: zero coverage, kept")
  }

  test("dupspan degenerate corpora: empty slice, empty text, total duplication") {
    import spark.implicits._
    // r08 audit spec: the ratio surfaces must stay well-defined (no NaN/Inf,
    // no crash) on corpora a real pipeline CAN produce — an empty input
    // slice, zero-length documents, and a corpus that is one giant dup
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(DedupQueries.dupspanStatsOf(empty).collect().isEmpty)
    assert(DedupQueries.dupspanKeepOf(empty).collect().isEmpty)
    // empty text: split("", " ") = [""] → n_tokens 1, zero coverage, kept
    val blank = Seq((0L, ""), (1L, "")).toDF("doc_id", "text")
    val bs = DedupQueries.dupspanStatsOf(blank).collect()
    assert(bs.forall(r => r.getLong(1) == 1 && r.getLong(3) == 0 &&
      r.getDouble(4) == 0.0 && r.getInt(5) == 1))
    // total duplication: identical width-8 docs → dup_frac exactly 1.0,
    // keep 0 — the gate's far boundary, finite on both surfaces
    val text = (1 to 8).map(i => s"d$i").mkString(" ")
    val dup = (0L until 3L).map(d => (d, text)).toDF("doc_id", "text")
    val ds = DedupQueries.dupspanStatsOf(dup).collect()
    assert(ds.forall(r => r.getDouble(4) == 1.0 && r.getInt(5) == 0))
    // the shared-core refactor: keepOf IS statsOf's keep column
    val keep = DedupQueries.dupspanKeepOf(dup).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(keep == ds.map(r => r.getLong(0) -> r.getInt(5)).toMap)
  }

  test("memoized pair relations equal a fresh build bit-for-bit") {
    // the Memo promotion of the r09 trainedMemo pattern to the shared
    // q73/q110 pair relations: a pure cache — the second call returns the
    // SAME checkpointed plan, and rows equal an un-memoized replay
    graft.sources.Tables.register(spark, sf)
    val docs = spark.table("documents")
    def pairRows(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toList
    val lsh1 = DedupQueries.lshPairs(spark)
    val lsh2 = DedupQueries.lshPairs(spark)
    assert(lsh1 eq lsh2, "second call must hit the (session, dir) memo")
    val lshFresh = DedupQueries.saltedBucketPairs(
      DedupQueries.minhashBandRowsOf(docs), DedupQueries.defaultBucketCap)
    assert(pairRows(lsh1) == pairRows(lshFresh),
      "memoized LSH pairs diverged from a fresh deterministic build")
    val pp1 = DedupQueries.ppjoinPairsShared(spark, 0.6)
    val pp2 = DedupQueries.ppjoinPairsShared(spark, 0.6)
    assert(pp1 eq pp2, "second call must hit the (session, dir, τ) memo")
    assert(pp1 ne DedupQueries.ppjoinPairsShared(spark, 0.5),
      "distinct thresholds must memoize separately")
    val ppFresh = DedupQueries.ppjoinPairs(docs, 0.6)
    def ppRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toList
    assert(ppRows(pp1) == ppRows(ppFresh),
      "memoized PPJoin pairs diverged from a fresh deterministic build")
  }

  test("memoized tfidf postings and containment shingles equal fresh builds") {
    // the r11 drift fix (q140/q71c): same Memo contract as lshPairs —
    // second call is the SAME checkpointed frame, rows equal an
    // un-memoized deterministic replay
    graft.sources.Tables.register(spark, sf)
    val docs = spark.table("documents")
    val w1 = DedupQueries.tfidfPostingsShared(spark)
    assert(w1 eq DedupQueries.tfidfPostingsShared(spark),
      "second call must hit the (session, dir) memo")
    def postRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sorted.toList
    val wFresh = DedupQueries.tfidfPostings(
      graft.sources.Tables.spread(docs), DedupQueries.hotShingleDfCap)
    assert(postRows(w1) == postRows(wFresh),
      "memoized tfidf postings diverged from a fresh build")
    val s1 = DedupQueries.containmentShinglesShared(spark)
    assert(s1 eq DedupQueries.containmentShinglesShared(spark),
      "second call must hit the (session, dir) memo")
    def shRows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "shingle").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toList
    val sFresh = DedupQueries.containmentShingles(docs,
      DedupQueries.hotShingleDfCap)
    assert(shRows(s1) == shRows(sFresh),
      "memoized containment shingles diverged from a fresh build")
    // r11: the langid trigram profiles (q150 ⋈ q241 shared) and q241's
    // span-vote relation under the same contract
    val p1 = TextQueries.langidProfiles(spark)
    assert(p1 eq TextQueries.langidProfiles(spark))
    def profRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
        .sorted.toList
    assert(profRows(p1) == profRows(TextQueries.langidProfilesFresh(spark)),
      "memoized langid profiles diverged from a fresh build")
    val v1 = graft.operators.Memo.cached(spark, "mixedlang-votes")(
      TextQueries.mixedLanguageVotesFresh(spark))
    assert(v1 eq graft.operators.Memo.cached(spark, "mixedlang-votes")(
      TextQueries.mixedLanguageVotesFresh(spark)))
    def voteRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).sorted.toList
    assert(voteRows(v1) == voteRows(
      TextQueries.mixedLanguageVotesFresh(spark)),
      "memoized span votes diverged from a fresh build")
    // r11: q66b/q66c's shared winnowed fingerprint relation
    val f1 = graft.operators.Memo.cached(spark, "winnow-sels")(
      TextQueries.winnowedDistinctOf(docs))
    assert(f1 eq graft.operators.Memo.cached(spark, "winnow-sels")(
      TextQueries.winnowedDistinctOf(docs)))
    def fpRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toList
    assert(fpRows(f1) == fpRows(TextQueries.winnowedDistinctOf(docs)),
      "memoized winnow fingerprints diverged from a fresh build")
    // r11: q121's shared band rows + raw shingle rows
    val b1 = graft.operators.Memo.cached(spark, "minhash-band-rows")(
      DedupQueries.minhashBandRowsOf(docs))
    assert(b1 eq graft.operators.Memo.cached(spark, "minhash-band-rows")(
      DedupQueries.minhashBandRowsOf(docs)))
    def bandRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
        .sorted.toList
    assert(bandRows(b1) == bandRows(DedupQueries.minhashBandRowsOf(docs)),
      "memoized band rows diverged from a fresh build")
    val sr1 = graft.operators.Memo.cached(spark, "shingle-rows")(
      DedupQueries.shingleRowsOf(docs))
    assert(sr1 eq graft.operators.Memo.cached(spark, "shingle-rows")(
      DedupQueries.shingleRowsOf(docs)))
    assert(shRows(sr1) == shRows(DedupQueries.shingleRowsOf(docs)),
      "memoized shingle rows diverged from a fresh build")
  }

  test("memoized components, simhashes, and langid equal fresh builds") {
    graft.sources.Tables.register(spark, sf)
    val docs = spark.table("documents")
    // components: memo hit + equality against an un-memoized fixpoint
    val c1 = DedupQueries.components(spark)
    assert(c1 eq DedupQueries.components(spark))
    val pairs = DedupQueries.lshPairs(spark)
    import org.apache.spark.sql.functions.col
    val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionAll(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
    val (freshLabels, _) = DedupQueries.propagateComponents(
      docs.select(col("doc_id")), edges)
    def labelRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toList
    assert(labelRows(c1) == labelRows(freshLabels),
      "memoized components diverged from a fresh fixpoint")
    // simhash signatures: memo hit + equality against the Of build
    val s1 = DedupQueries.simhashes(spark)
    assert(s1 eq DedupQueries.simhashes(spark))
    def sigRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toList
    assert(sigRows(s1) == sigRows(DedupQueries.simhashesOf(docs)),
      "memoized simhashes diverged from a fresh build")
    // langid predictions: memo hit + equality against the fresh build
    val l1 = TextQueries.langidPredictions(spark)
    assert(l1 eq TextQueries.langidPredictions(spark))
    def predRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).sorted.toList
    assert(predRows(l1) == predRows(TextQueries.langidPredictionsFresh(spark)),
      "memoized langid predictions diverged from a fresh build")
    // basket pair support (q156/q174/q199's shared relation)
    import graft.operators.JoinQueries
    val bp1 = JoinQueries.basketSupport(spark)
    assert(bp1 eq JoinQueries.basketSupport(spark))
    val itemsFresh = spark.table("lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val bpFresh = JoinQueries.basketPairSupport(itemsFresh)
      .filter(col("support") >= 2)
    def supRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toList
    assert(supRows(bp1) == supRows(bpFresh),
      "memoized basket support diverged from a fresh build")
    // BPE: the shared (needFinalWords = true) training's merge table must
    // equal the flag-off run q192 used to make — the flag only skips the
    // final-words materialization
    val (merges, fw) = TextQueries.bpeShared(spark)
    assert(merges eq TextQueries.bpeShared(spark)._1)
    assert(fw eq TextQueries.bpeShared(spark)._2)
    val (mFresh, _) = TextQueries.bpeLearn(spark.table("documents"),
      rounds = TextQueries.bpeRounds, needFinalWords = false)
    def mergeRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
        .sorted.toList
    assert(mergeRows(merges) == mergeRows(mFresh),
      "memoized BPE merges diverged from the flag-off training")
  }

  test("wider SimHash bands produce a subset of the 16-bit pair set") {
    // a 32-bit band is the concatenation of two 16-bit bands: agreement on
    // it implies agreement on both halves, so the scale-mode candidate set
    // (hexPerBand = 8, the >10⁵-doc regime) can only shrink the default set
    graft.sources.Tables.register(spark, sf)
    val docs = spark.table("documents")
    val cap = DedupQueries.defaultBucketCap
    val p16 = pairs(DedupQueries.simhashBandsOf(docs), cap)
    val p32 = pairs(DedupQueries.simhashBandsOf(docs, hexPerBand = 8), cap)
    assert(p32.subsetOf(p16), s"${(p32 -- p16).take(5)} not in 16-bit set")
    assert(p16.nonEmpty)
  }

  test("memo races: concurrent cold builds converge to one cached frame") {
    // the get-then-putIfAbsent pattern (recursion fix) allows two racing
    // threads to both run a build; both are deterministic and later calls
    // must settle on ONE cached frame with the same rows
    graft.sources.Tables.register(spark, sf)
    graft.sources.Tables.noteViewSwap(spark) // fresh generation: cold memo
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val builds = Await.result(
      Future.sequence((1 to 4).map(_ =>
        Future(DedupQueries.lshPairs(spark)))), 120.seconds)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toList
    val expect = rows(builds.head)
    builds.tail.foreach(b => assert(rows(b) == expect))
    val settled = DedupQueries.lshPairs(spark)
    assert(builds.exists(_ eq settled),
      "post-race call must return one of the raced frames (the cached one)")
    assert(settled eq DedupQueries.lshPairs(spark))
  }

  test("URL canonicalization: adversarial forms through the production SQL") {
    import spark.implicits._
    // each case pins one rule of q243's canonicalizer (urlCanonSpark IS the
    // production SQL — the spec drives the same string, not a re-spelling)
    val cases = Seq(
      // every rule at once: scheme+host case, default port, trailing slash,
      // tracking param stripped (real param kept), fragment dropped
      (1L, "HTTP://WWW.Ex.COM:80/a/?utm_source=x&id=1#frag",
        "http://www.ex.com/a?id=1", 1L, 1L),
      // root path: the lone trailing slash is NOT stripped
      (2L, "https://ex.com:443/", "https://ex.com/", 0L, 0L),
      // all params tracking → no '?' in canonical form
      (3L, "http://ex.com/a?utm_source=1&utm_medium=2",
        "http://ex.com/a", 2L, 0L),
      // non-default port survives
      (4L, "http://ex.com:8080/a", "http://ex.com:8080/a", 0L, 0L),
      // MISMATCHED default port (http's :80 on https) survives
      (5L, "https://ex.com:80/a", "https://ex.com:80/a", 0L, 0L),
      // fbclid + gclid stripped, param order of the rest preserved
      (6L, "http://ex.com/a?fbclid=z&gclid=y&id=2&b=3",
        "http://ex.com/a?id=2&b=3", 2L, 0L),
      // path case PRESERVED (only scheme + host lowercase)
      (7L, "HtTpS://A.B.C/Path", "https://a.b.c/Path", 0L, 0L),
      // 'utm_' is a PREFIX match, 'idx' is not 'id' but is kept (not utm)
      (8L, "http://ex.com/a?idx=1&utm_x=2", "http://ex.com/a?idx=1", 1L, 0L),
      // no path at all: empty canonical path, no slash invented
      (9L, "http://EX.com", "http://ex.com", 0L, 0L))
    cases.map { case (id, url, _, _, _) => (id, url) }
      .toDF("doc_id", "url").createOrReplaceTempView("raw_urls_spec")
    val out = spark.sql(DedupQueries.urlCanonSpark("raw_urls_spec"))
      .select($"doc_id", $"canon", $"stripped_ct", $"had_frag")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getInt(3).toLong))).toMap
    cases.foreach { case (id, url, canon, stripped, frag) =>
      assert(out(id) == ((canon, stripped, frag)),
        s"url $url → expected ($canon, $stripped, $frag), got ${out(id)}")
    }
  }

  test("robots gate: every RFC 9309 decision branch through the production SQL") {
    import spark.implicits._
    // robotsDecision IS q250's per-URL decision (same string, not a
    // re-spelling); each case pins one branch against the production
    // rule table. best = 2·prefix_len + is_allow; allowed ⇔ best IS NULL
    // (no matching rule) or best is odd (longest match is an Allow).
    // expected = (n_rules for the host, best or -1 for NULL, category)
    val cases = Seq(
      // longest-match win: Allow /p/1 (len4→9) beats Disallow /p/ (len3→6)
      (1L, "www.site1.com", "/p/1", 4L, 9L, "allowed"),
      // only the shorter Disallow matches → blocked
      (2L, "www.site1.com", "/p/5", 4L, 6L, "blocked"),
      // equal-length tie: /p/3 has Disallow(8) AND Allow(9) → Allow wins
      (3L, "www.site1.com", "/p/3", 4L, 9L, "allowed"),
      // open host: zero rules → NULL best, counted as no_rule
      (4L, "www.site0.com", "/p/0", 0L, -1L, "no_rule"),
      // scoped host: rules exist but none match → NULL best, unmatched
      (5L, "www.site6.com", "/p/9", 1L, -1L, "unmatched"),
      // ...and the same host's rule still blocks where it does match
      (6L, "www.site6.com", "/admin/x", 1L, 14L, "blocked"),
      // closed host: Disallow / (len1→2) blocks everything...
      (7L, "www.site2.com", "/x", 2L, 2L, "blocked"),
      // ...except the Allow /p/2 re-allow (len4→9)
      (8L, "www.site2.com", "/p/2", 2L, 9L, "allowed"),
      // prefix is a PREFIX: /p/1 carve-out also re-allows /p/10/deep
      (9L, "www.site1.com", "/p/10/deep", 4L, 9L, "allowed"),
      // left()-compare strictness: '/pX1' shares 3 chars with '/p/'
      // only positionally — no rule matches → unmatched (guarded host)
      (10L, "www.site1.com", "/pX1", 4L, -1L, "unmatched"),
      // unknown host: LEFT JOIN keeps the URL; zero rules → no_rule
      (11L, "www.other.com", "/p/1", 0L, -1L, "no_rule"))
    cases.map { case (id, h, p, _, _, _) => (id, "s", h, p) }
      .toDF("doc_id", "source", "host", "path0")
      .createOrReplaceTempView("robots_urls_spec")
    val out = spark.sql(DedupQueries.robotsDecision("robots_urls_spec"))
      .collect().map { r =>
        // n_rules is COUNT (long); best is INT arithmetic over length()
        val best = if (r.isNullAt(3)) -1L else r.getAs[Number](3).longValue
        r.getLong(0) -> ((r.getAs[Number](2).longValue, best))
      }.toMap
    assert(out.size == cases.size, "one decision row per URL")
    cases.foreach { case (id, h, p, nRules, best, cat) =>
      assert(out(id) == ((nRules, best)),
        s"$h$p → expected (n_rules=$nRules, best=$best), got ${out(id)}")
      // the rollup's categorization, re-derived from the pinned values
      val derived =
        if (best >= 0 && best % 2 == 0) "blocked"
        else if (best >= 0) "allowed"
        else if (nRules == 0) "no_rule"
        else "unmatched"
      assert(derived == cat, s"$h$p category: $derived != $cat")
    }
  }
}
