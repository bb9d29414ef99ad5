package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Driver-side brute-force replays of the deterministic LLM-pipeline gate
  * operators (SURVEY.md §2C): the repetition filter (q118) and the mixing
  * sampler (q120) are pure per-document functions, so a Scala recomputation
  * over the collected fixture must match the distributed result exactly —
  * including the IEEE floor-rounding and hash-draw spellings. */
class PipelineOpsSpec extends SparkSpec {

  private def queries = SparkEntry.queries

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.split(" ", -1).toSeq

  private def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  test("q118 repetition stats equal a per-document Scala recomputation") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val got = queries("q118_repetition_stats")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getInt(5)))).toMap
    val docs = spark.table("documents").select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(docs.length == got.size)
    docs.foreach { case (id, text) =>
      val toks = tokens(text)
      val n = toks.size
      val uc = toks.groupBy(identity).map(_._2.size)
      val dup = uc.filter(_ > 1).sum
      val topU = uc.max
      val bis = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val topB = if (bis.isEmpty) 0.0
        else bis.groupBy(identity).map(_._2.size).max.toDouble / bis.size
      val keep = if (dup.toDouble / n <= 0.85 && topU.toDouble / n <= 0.11 &&
        topB <= 0.05) 1 else 0
      val expect = (n.toLong,
        math.floor(dup.toDouble * 10000 / n + 0.5) / 10000,
        math.floor(topU.toDouble * 10000 / n + 0.5) / 10000,
        r4(topB), keep)
      assert(got(id) == expect, s"doc $id: got ${got(id)}, expect $expect")
    }
  }

  test("q216 char entropy equals a per-document Scala recomputation") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val got = queries("q216_char_entropy")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val docs = spark.table("documents").select($"source", $"text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1)
    assert(bySource.size == got.size)
    bySource.foreach { case (src, ds0) =>
      // both engines iterate code points via substr(text, i, 1) and emit NO
      // rows for an empty doc (it drops out of n_docs) — mirror exactly
      val ds = ds0.filter(_._2.nonEmpty)
      val h4s = ds.map { case (_, text) =>
        val cps = text.codePoints().toArray // code points, not UTF-16 units
        val n = cps.length.toDouble
        // code-point-sorted fold (= both engines' UTF-8 binary struct
        // sort of single-char strings), 0-seeded — the committed IEEE order
        val acc = cps.groupBy(identity).view.mapValues(_.length)
          .toSeq.sortBy(_._1)
          .foldLeft(0.0) { case (a, (_, c)) =>
            a + (c / n) * (math.log(c / n) / math.log(2.0))
          }
        math.floor(-acc * 10000 + 0.5) / 10000
      }
      val kept = h4s.count(h => h >= 4.0 && h <= 5.5)
      // mean over the exact-decimal sum of the r4 values
      val sum4 = h4s.map(h => BigDecimal(h)
        .setScale(4, BigDecimal.RoundingMode.HALF_EVEN)).sum
      val mean = math.floor(sum4.toDouble / ds.length * 10000 + 0.5) / 10000
      val (gn, gk, gm) = got(src)
      assert(gn == ds.length && gk == kept,
        s"$src: got ($gn, $gk), expect (${ds.length}, $kept)")
      assert(math.abs(gm - mean) < 1e-9, s"$src: mean $gm vs $mean")
    }
  }

  test("q219 semantic chunks partition every doc and respect the min length") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val got = queries("q219_semantic_chunking")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val docs = spark.table("documents").select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(docs.length == got.size, "every doc must chunk")
    docs.foreach { case (d, text) =>
      val toks = text.toLowerCase.split(" ", -1)
      val n = toks.length
      // brute-force replay of the boundary rule + greedy keep
      val cands = (5 to n - 5).filter { i =>
        val prev = toks.slice(i - 5, i).toSet
        val nxt = toks.slice(i, i + 5).toSet
        1.0 - prev.intersect(nxt).size.toDouble / prev.union(nxt).size >= 0.9
      }
      var last = 0L
      val kept = cands.foldLeft(Vector.empty[Long]) { (ks, i) =>
        if (i - last >= 20) { last = i; ks :+ i.toLong } else ks
      }
      val expect = (1L +: kept.map(_ + 1))
        .zip(kept :+ n.toLong)
        .zipWithIndex
        .map { case ((s, e), ci) => (d, ci + 1L, s, e, e - s + 1) }
      assert(got(d).toSeq == expect, s"doc $d: ${got(d).toSeq} vs $expect")
      // invariants: chunks PARTITION [1..n]; interior chunks ≥ 20 tokens
      val ch = got(d).toSeq
      assert(ch.head._3 == 1 && ch.last._4 == n)
      ch.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 == a._4 + 1, s"gap in doc $d")
        case _ => ()
      }
      ch.dropRight(1).foreach(c => assert(c._5 >= 20, s"short interior chunk in $d"))
    }
  }

  test("q222 periodicity gate fires on synthetic loops, stays quiet on noise") {
    import spark.implicits._
    import graft.operators.TextQueries
    val docs = Seq(
      (0L, Seq.fill(30)("ab cd").mkString(" ")), // pure period-2 loop
      (1L, (1 to 60).map(i => s"w$i").mkString(" ")), // all-distinct noise
      (2L, ("x " * 40).trim), // period-1 loop
      (3L, "solo"), // n = 1: no candidate periods → default row
      (4L, (Seq.fill(27)("r s t").mkString(" ") + " q q q q q q q q q"))
    ).toDF("doc_id", "text")
    val got = TextQueries.periodicityOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3))))
      .toMap
    assert(got(0L) == ((2L, 1.0, 1)), s"period-2 loop: ${got(0L)}")
    assert(got(2L) == ((1L, 1.0, 1)), s"period-1 loop: ${got(2L)}")
    assert(got(1L)._3 == 0 && got(1L)._2 == 0.0, s"noise: ${got(1L)}")
    assert(got(3L) == ((0L, 0.0, 0)), "single-token doc keeps the default row")
    // doc 4 is period-3 up front with a tail — loopy but not perfect
    assert(got(4L)._1 == 3L && got(4L)._2 > 0.8, s"mixed: ${got(4L)}")
    assert(got.size == 5)
  }

  test("q112 fold-bound regime: fixture per-user event counts stay modest") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    // q112's EWMA fold holds one array per user sized by that user's event
    // count (EventAnalyticsQueries BOUND note) — the rationale assumes the
    // fixture regime where users scale with the corpus, so per-user counts
    // are SF-invariant. Pin it: a regenerated fixture that concentrates
    // events on few users must fail here, not OOM in the fold.
    val mx = spark.table("events").groupBy($"user_id")
      .agg(count(lit(1)).as("c"))
      .agg(max($"c")).head().getLong(0)
    assert(mx < 10000, s"max events/user $mx — q112's per-user array " +
      "rationale no longer holds; chunk the fold (see the BOUND note)")
  }

  test("q120 mixing: per-source counts equal the deterministic hash replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val rates = Map("src0" -> 2.0, "src1" -> 1.5, "src2" -> 1.25,
      "src3" -> 1.0).withDefaultValue(0.4)
    def u(text: String): Double = {
      val d = MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val docs = spark.table("documents").select($"source", $"text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val rate = rates(src)
      val copies = ds.map { case (_, t) =>
        math.floor(rate).toLong + (if (u(t) < rate - math.floor(rate)) 1L
                                   else 0L)
      }
      val toks = ds.map { case (_, t) => tokens(t).size.toLong }
      src -> ((ds.length.toLong, copies.sum,
        copies.zip(toks).map { case (c, t) => c * t }.sum,
        math.floor(copies.sum.toDouble * 10000 / ds.length + 0.5) / 10000,
        rate))
    }
    val got = queries("q120_source_mixing")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got == expect,
      s"diff: ${(expect.toSet -- got.toSet).take(3)} vs ${(got.toSet -- expect.toSet).take(3)}")
    // rate-2.0 sources have zero fractional draw: exactly 2 copies per doc
    assert(got("src0")._2 == 2 * got("src0")._1)
  }

  test("q122 DSIR log-weights equal the sorted-fold Scala replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val docs = spark.table("documents")
      .select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val all = docs.flatMap { case (id, _, t) => tokens(t).map(id -> _) }
    val craw = all.groupBy(_._2).map { case (tk, xs) => tk -> xs.length.toLong }
    val tgt = docs.filter(_._2 == "en").flatMap(d => tokens(d._3))
    val ctgt = tgt.groupBy(identity).map { case (tk, xs) => tk -> xs.length.toLong }
    val nraw = all.length.toDouble
    val ntgtV = tgt.length.toDouble + craw.size
    val expect = all.groupBy(_._1).map { case (id, xs) =>
      // fold in the same token-sorted order as the distributed sort_array
      val terms = xs.map(_._2).sorted.map(tk =>
        math.log(ctgt.getOrElse(tk, 0L).toDouble + 1) - math.log(craw(tk).toDouble))
      val s = terms.foldLeft(0.0)(_ + _)
      id -> ((xs.length.toLong,
        r4(s / xs.length + math.log(nraw) - math.log(ntgtV))))
    }
    val got = queries("q122_dsir_weights")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expect,
      s"diff: ${(expect.toSet -- got.toSet).take(3)} vs ${(got.toSet -- expect.toSet).take(3)}")
    // the en target slice must score itself higher on average than the rest
    val byLang = docs.map { case (id, lang, _) => lang -> got(id)._2 }
    def avg(xs: Array[Double]) = xs.sum / xs.length
    assert(avg(byLang.filter(_._1 == "en").map(_._2)) >
      avg(byLang.filter(_._1 != "en").map(_._2)))
  }

  test("q123 shard manifest equals the md5 replay and stays balanced") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def shard(id: Long): Long = {
      val d = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % 16
    }
    val docs = spark.table("documents").select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), tokens(r.getString(1)).size.toLong))
    val expect = docs.groupBy(d => shard(d._1)).map { case (s, ds) =>
      s -> ((ds.length.toLong, ds.map(_._2).sum,
        ds.map(_._1).min, ds.map(_._1).max))
    }
    val got = queries("q123_shard_manifest")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
    assert(got.values.map(_._1).sum == docs.length)
    // md5 keys shard uniformly: even this 50-doc fixture spreads over most
    // shards with no shard holding a disproportionate share
    assert(got.size >= 12, s"only ${got.size} shards hit")
    assert(got.values.map(_._1).max <= docs.length / 4)
  }

  /** q126's fixed linear model, replayed per doc in plain Scala (same
    * association order as both engine spellings). */
  private def classifierScore(text: String, nChars: Long): Double = {
    val toks = tokens(text)
    val stopSet = Set("the", "a", "of", "and", "is")
    val stopRatio = toks.count(stopSet).toDouble / toks.size
    val cpw = nChars.toDouble / toks.size
    val uc = toks.groupBy(identity).map(_._2.size)
    val rep = uc.max.toDouble / toks.size
    ((8.0 * stopRatio - 6.0 * rep) + 0.5 * (cpw - 5.5)) + 0.1
  }

  test("q126 classifier scores equal the per-document linear-model replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val docs = spark.table("documents")
      .select($"doc_id", $"text", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = docs.map { case (id, text, nc) =>
      val s = classifierScore(text, nc)
      id -> ((r4(s), if (s > 0) 1 else 0))
    }.toMap
    val got = queries("q126_quality_classifier")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    assert(got == expect)
    val kept = got.values.count(_._2 == 1)
    assert(kept > 0 && kept < got.size, "gate must genuinely split the corpus")
  }

  test("q128 corpus diff equals the per-document snapshot replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val docs = spark.table("documents").select($"doc_id", $"source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.flatMap { case (id, src) =>
      val inOld = id % 7 != 0
      val inNew = id % 5 != 0
      val changed = id % 3 == 0 // new snapshot rewrites these
      val status =
        if (!inOld && !inNew) None
        else if (!inOld) Some("added")
        else if (!inNew) Some("removed")
        else if (changed) Some("changed")
        else Some("unchanged")
      status.map(s => (src, s))
    }.groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }
    val got = queries("q128_corpus_diff")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expect)
    assert(got.keys.map(_._2).toSet ==
      Set("added", "removed", "changed", "unchanged"))
  }

  test("q136 shard manifest equals the composition of its three gate queries") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def keepSet(name: String, keepIdx: Int, idIdx: Int = 0): Set[Long] =
      queries(name)(spark, sf).collect()
        .filter(_.getInt(keepIdx) == 1).map(_.getLong(idIdx)).toSet
    val rep = keepSet("q118_repetition_stats", 5)
    val span = keepSet("q124_dupspan_stats", 5)
    val cls = keepSet("q126_quality_classifier", 2)
    val ntok = queries("q118_repetition_stats")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val surv = rep intersect span intersect cls
    def shard(id: Long): Long = {
      val d = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % 16
    }
    val expect = surv.groupBy(shard).map { case (s, ids) =>
      s -> ((ids.size.toLong, ids.toSeq.map(ntok).sum))
    }
    val got = queries("q136_pipeline_shards")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
    assert(surv.nonEmpty && surv.size < ntok.size,
      "gates must drop some docs and keep some")
  }

  test("q127 buckets are per-lang tertiles: head >= middle >= tail scores") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val rows = queries("q127_quality_buckets")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5)))
    val langs = rows.map(_._1).distinct
    assert(langs.length >= 3, "every fixture language bucketed")
    langs.foreach { l =>
      val bs = rows.filter(_._1 == l).map(b => b._2 -> b._3).toMap
      assert(bs.keySet.subsetOf(Set("head", "middle", "tail")))
      assert(bs.values.sum ==
        spark.table("documents").filter($"lang" === l).count())
      val (t1, t2) = rows.filter(_._1 == l).map(r => (r._4, r._5)).head
      assert(t1 <= t2, s"tertile order broken for $l")
    }
  }

  test("q150 langid equals the Cavnar-Trenkle profile replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val docs = spark.table("documents")
      .select($"doc_id", $"lang", lower($"text").as("t")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def trigrams(t: String): Seq[String] =
      if (t.length < 3) Seq.empty
      else (0 to t.length - 3).map(i => t.substring(i, i + 3))
    // top-40 rank profile per language: count desc, trigram asc
    val prof: Map[String, Map[String, Int]] = docs.groupBy(_._2).map {
      case (lang, ds) =>
        val counts = ds.flatMap(d => trigrams(d._3))
          .groupBy(identity).map { case (tg, xs) => (tg, xs.size) }
        val ranked = counts.toSeq.sortBy { case (tg, c) => (-c, tg) }.take(40)
        lang -> ranked.zipWithIndex.map { case ((tg, _), i) =>
          tg -> (40 - i) // weight = K+1 − rank, rank = i+1
        }.toMap
    }
    val expect = docs.map { case (id, lang, t) =>
      val dtg = trigrams(t).distinct
      val scores = prof.map { case (pl, w) =>
        pl -> dtg.flatMap(w.get).map(_.toLong).sum
      }.filter(_._2 > 0)
      val (pred, s) = if (scores.isEmpty) ("unknown", 0L)
        else scores.toSeq.minBy { case (pl, sc) => (-sc, pl) }
      id -> ((lang, pred, s))
    }.toMap
    val got = queries("q150_langid_trigram")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(got == expect,
      s"diff: ${(expect.toSet -- got.toSet).take(3)} vs ${(got.toSet -- expect.toSet).take(3)}")
  }

  test("q151 CMS estimates equal the sketch replay and never undercount") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def bucket(token: String, j: Int): Long = {
      val d = MessageDigest.getInstance("MD5")
        .digest(s"$token#$j".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % 64
    }
    val toks = spark.table("documents").select($"text").collect()
      .flatMap(r => tokens(r.getString(0)))
    val exact = toks.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    val cells: Map[(Int, Long), Long] = (0 until 4).flatMap { j =>
      toks.groupBy(bucket(_, j)).map { case (b, xs) => (j, b) -> xs.size.toLong }
    }.toMap
    val rows = queries("q151_count_min_sketch")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (t, n, est, over) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n == exact(t), s"exact count for $t")
      val replay = (0 until 4).map(j => cells((j, bucket(t, j)))).min
      assert(est == replay, s"CMS estimate for $t: $est vs $replay")
      assert(over == est - n && over >= 0, s"CMS one-sided bound broken for $t")
    }
  }

  test("q152 WAU equals the naive per-day sliding-window replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val dayUser = spark.table("events")
      .select(expr("unix_micros(ts) div 86400000000").as("d"), $"user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val days = dayUser.map(_._1).distinct.sorted
    val expect = days.map { d =>
      val dau = dayUser.filter(_._1 == d).map(_._2).distinct.size.toLong
      val wau = dayUser.filter(x => x._1 >= d - 6 && x._1 <= d)
        .map(_._2).distinct.size.toLong
      d -> ((dau, wau,
        math.floor(dau.toDouble / wau * 10000 + 0.5) / 10000))
    }.toMap
    val got = queries("q152_active_users")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expect,
      s"diff: ${(expect.toSet -- got.toSet).take(3)} vs ${(got.toSet -- expect.toSet).take(3)}")
  }

  test("q153 bootstrap CI equals the Poisson-multiplicity replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def u(id: Long, b: Int): Double = {
      val d = MessageDigest.getInstance("MD5")
        .digest(s"$id#$b".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(x => f"$x%02x").mkString, 16)
        .toDouble / 4294967296.0
    }
    def mult(id: Long, b: Int): Int = {
      val x = u(id, b)
      if (x < 0.36787944117144233) 0
      else if (x < 0.7357588823428847) 1
      else if (x < 0.9196986029286058) 2
      else if (x < 0.9810118431238462) 3
      else 4
    }
    val p = spark.table("events").filter($"event_type" === "purchase")
      .select($"event_id", $"value".cast("decimal(9,2)")).collect()
      .map(r => (r.getLong(0), r.getDecimal(1)))
    def r6(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000
    val means = (0 until 20).map { b =>
      val (n, s) = p.foldLeft((0L, java.math.BigDecimal.ZERO)) {
        case ((n0, s0), (id, v)) =>
          val m = mult(id, b)
          (n0 + m, s0.add(v.multiply(java.math.BigDecimal.valueOf(m.toLong))))
      }
      (s.doubleValue / n, b)
    }.sortBy { case (mu, b) => (mu, b) }
    val baseSum = p.map(_._2).foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    val expect = (p.length.toLong, r6(baseSum.doubleValue / p.length),
      r6(means(1)._1), r6(means(18)._1))
    val r = queries("q153_poisson_bootstrap_ci")(spark, sf).collect().head
    val got = (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(got == expect, s"got $got, expect $expect")
    // order statistics are ordered, and the resample spread is non-trivial
    assert(got._3 <= got._4, s"CI ordering: $got")
    assert(got._3 < got._4, s"degenerate CI (all resample means equal): $got")
  }

  test("q154 weighted sample equals the exponential-races replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def u(text: String): Double = {
      val d = MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8"))
      (java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
        + 1).toDouble / 4294967296.0
    }
    val docs = spark.table("documents")
      .select($"doc_id", $"text", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = docs
      .map { case (id, t, nc) => (id, nc, math.log(u(t)) / nc.max(1L)) }
      .sortBy { case (id, _, k) => (-k, id) }
      .take(20).zipWithIndex
      .map { case ((id, nc, _), i) => (i + 1L, id, nc) }.toSeq
    val got = queries("q154_weighted_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"got ${got.take(3)}…, expect ${expect.take(3)}…")
    // heavier docs win races more often: the sample's mean n_chars sits
    // above the corpus mean (weighting is live, not uniform)
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    val sampleMean = got.map(_._3).sum.toDouble / got.length
    assert(sampleMean > corpusMean, s"$sampleMean !> $corpusMean")
  }

  test("q157 trigram-index search equals the naive contains scan") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val needles = Seq("spark", "window", "batch batch")
    val docs = spark.table("documents").select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase))
    // the correctness claim of the inverted index: identical rows to a
    // full LIKE scan (trigram prefilter lossless + exact verify)
    val expect = (for {
      nd <- needles
      (id, t) <- docs
      if t.contains(nd)
    } yield (nd, id)).sortBy(identity)
    val got = queries("q157_trigram_search")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect, s"${got.size} vs ${expect.size}")
    assert(got.nonEmpty)
  }

  test("q156 basket pairs equal the per-order pair recount") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val items = spark.table("lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.distinct
    val cnt = items.groupBy(_._2).map { case (pk, xs) => pk -> xs.length.toLong }
    val support = items.groupBy(_._1).toSeq.flatMap { case (_, its) =>
      val pks = its.map(_._2).sorted
      for { a <- pks; b <- pks if a < b } yield (a, b)
    }.groupBy(identity).collect { case ((a, b), xs) =>
      (a, b, xs.length.toLong) }.filter(_._3 >= 2).toSeq
    val expect = support
      .map { case (a, b, s) => (a, b, s, cnt(a), cnt(b)) }
      .sortBy { case (a, b, s, _, _) => (-s, a, b) }.take(500)
    val got = queries("q156_basket_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect, s"${got.take(3)} vs ${expect.take(3)}")
  }

  test("q155 concurrency profile equals the sequential sweep replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val gapUs = graft.operators.EventAnalyticsQueries.sessionGapUs
    val ev = spark.table("events")
      .select($"user_id", (unix_micros($"ts")).as("tus"), $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // sessions: per user, 6-h-gap split over (tus, event_id) order
    val ivs = ev.groupBy(_._1).values.flatMap { es =>
      val ts = es.sortBy(e => (e._2, e._3)).map(_._2)
      val cuts = ts.zip(ts.head +: ts.dropRight(1)).zipWithIndex
        .collect { case ((t, p), i) if i == 0 || t - p >= gapUs => i }
      (cuts :+ ts.length).sliding(2).collect {
        case Seq(a, b) if b > a => (ts(a), ts(b - 1)) }.toSeq
    }.toSeq
    val net = ivs.flatMap { case (s, e) => Seq((s, 1L), (e, -1L)) }
      .groupBy(_._1).map { case (t, ds) => (t, ds.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val levels = net.scanLeft(0L) { case (acc, (_, d)) => acc + d }.drop(1)
    val expect = net.map(_._1).zip(levels).sliding(2).collect {
      case Seq((t1, l), (t2, _)) if t2 > t1 => (l, t2 - t1)
    }.toSeq.groupBy(_._1).map { case (l, xs) =>
      (l, xs.map(_._2).sum, xs.length.toLong) }
      .toSeq.sortBy(_._1)
    val got = queries("q155_concurrency_profile")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"${got.take(4)} vs ${expect.take(4)}")
  }

  test("q160 chi-square equals the contingency-table replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val docs = spark.table("documents").select($"lang", $"source").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val o = docs.groupBy(identity).map { case ((l, s), xs) =>
      (l, s, xs.length.toLong) }.toSeq
    val rTot = o.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._3).sum }
    val cTot = o.groupBy(_._2).map { case (s, xs) => s -> xs.map(_._3).sum }
    val n = o.map(_._3).sum
    val chi2 = o.sortBy(c => (c._1, c._2)).foldLeft(0.0) {
      case (acc, (l, s, obs)) =>
        val e = (rTot(l) * cTot(s)).toDouble / n
        acc + (obs.toDouble - e) * (obs.toDouble - e) / e
    }
    val row = queries("q160_chisq_independence")(spark, sf).head()
    assert(row.getDouble(0) == math.floor(chi2 * 10000 + 0.5) / 10000)
    assert(row.getLong(1) == o.size &&
      row.getLong(2) == (rTot.size - 1L) * (cTot.size - 1L))
  }

  test("q159 incremental merge equals a direct single-pass aggregate") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val direct = spark.table("events")
      .select($"event_type", expr("unix_micros(ts) div 86400000000").as("day"),
        $"value".cast(graft.api.Canon.dec184).as("v"))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).cast("long").as("n_events"),
        round(sum($"v").cast("double"), 4).as("revenue"))
      .orderBy($"event_type", $"day").collect().toSeq
    val merged = queries("q159_incremental_agg")(spark, sf).collect().toSeq
    assert(merged.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))) ==
      direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))))
  }

  test("q158 SCD2 intervals tile each user's event range without overlap") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val rows = queries("q158_scd2_state")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq
    rows.groupBy(_._1).values.foreach { vs =>
      val s = vs.sortBy(_._2)
      // versions are 1..n; consecutive states differ; each interval closes
      // exactly where the next opens; only the last row is open (-1)
      assert(s.map(_._2) == (1L to s.length).toSeq)
      s.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._3 != b._3, s"uncompressed run: $a -> $b")
          assert(a._5 == b._4, s"gap/overlap: $a -> $b")
        case _ =>
      }
      assert(s.last._5 == -1L && s.init.forall(_._5 != -1L))
    }
    assert(rows.nonEmpty)
  }

  test("q161 HLL registers, checksum, and estimate equal a Scala replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val ev = spark.table("events").select($"event_type", $"user_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expect = ev.groupBy(_._1).map { case (t, xs) =>
      val regs = Array.fill(64)(0)
      xs.map(_._2).distinct.foreach { uid =>
        val h = md5hex(uid.toString)
        val bucket = (java.lang.Long.parseLong(h.substring(0, 8), 16) % 64).toInt
        val w = java.lang.Long.parseLong(h.substring(8, 16), 16)
        val rho = if (w == 0) 33 else 33 - w.toBinaryString.length
        regs(bucket) = math.max(regs(bucket), rho)
      }
      val checksum = regs.zipWithIndex.map { case (m, b) => m.toLong * (b + 1) }.sum
      val s = regs.map(m => 1.0 / (1L << m)).sum
      val e = 0.709 * 4096 / s
      val nExact = xs.map(_._2).distinct.length.toLong
      t -> ((nExact, checksum, r4(e),
        math.floor((e - nExact) / nExact * 1000000 + 0.5) / 1000000))
    }
    val got = queries("q161_hll_distinct")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == expect, s"$got vs $expect")
  }

  test("q163 CUSUM closed form equals the textbook recursion replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val dayUs = 86400000000L
    val ev = spark.table("events")
      .select($"user_id", unix_micros($"ts").as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / dayUs)).toSeq
    val daily = ev.groupBy(identity).map { case ((u, d), xs) =>
      (u, d, xs.length.toLong) }.toSeq
    val c = daily.map(_._3).sum / daily.length + 1
    val expect = daily.groupBy(_._1).map { case (u, xs) =>
      // S_t = max(0, S_{t-1} + x_t - c) — the sequential recursion the
      // windowed closed form must reproduce exactly
      val ss = xs.sortBy(_._2).map(_._3)
        .scanLeft(0L) { case (s, x) => math.max(0L, s + x - c) }.drop(1)
      u -> ((xs.length.toLong, ss.max, ss.count(_ >= 3).toLong))
    }
    val got = queries("q163_cusum_changepoint")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect, s"${got.toSeq.take(3)} vs ${expect.toSeq.take(3)}")
  }

  test("q164 seasonal anomaly equals the integer-moment replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val dayUs = 86400000000L
    val ev = spark.table("events")
      .select($"event_type", unix_micros($"ts").as("tus"))
      .collect().map(r => (r.getString(0), r.getLong(1) / dayUs)).toSeq
    val daily = ev.groupBy(identity).map { case ((t, d), xs) =>
      (t, d, xs.length.toLong) }.toSeq
    val expect = daily.groupBy(c => (c._1, c._2 % 7)).collect {
      case ((t, wd), xs) if xs.length > 1 =>
        val n = xs.length.toLong
        val sc = xs.map(_._3).sum
        val scc = xs.map(c => c._3 * c._3).sum
        val mean = sc.toDouble / n
        val sd = math.sqrt((n * scc - sc * sc).toDouble / (n * (n - 1)))
        val anom = xs.count(c => math.abs(c._3 - mean) > 1.5 * sd).toLong
        (t, wd, n, math.floor(mean * 1000000 + 0.5) / 1000000,
          math.floor(sd * 1000000 + 0.5) / 1000000, anom)
    }.toSeq.sortBy(c => (c._1, c._2))
    val got = queries("q164_seasonal_anomaly")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))).toSeq
    assert(got == expect, s"${got.take(3)} vs ${expect.take(3)}")
    // the alert branch must be LIVE on the fixture, not vacuously green
    assert(got.map(_._6).sum > 0, "no anomaly fired — band too loose")
  }

  test("q165 doc keywords equal the TF-IDF ranking replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val docs = spark.table("documents").select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val n = docs.length
    val tf = docs.flatMap { case (id, text) =>
      tokens(text).groupBy(identity).map { case (t, xs) =>
        (id, t, xs.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val expect = tf.groupBy(_._1).map { case (id, xs) =>
      val top = xs.map { case (_, t, c) =>
        (t, c * math.log(n.toDouble / df(t))) }
        .sortBy { case (t, w) => (-w, t) }.take(3).map(_._1)
      id -> top.mkString(",")
    }
    val got = queries("q165_doc_keywords")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expect,
      s"${got.toSeq.sortBy(_._1).take(3)} vs ${expect.toSeq.sortBy(_._1).take(3)}")
  }

  test("q162 source overlap equals the set-intersection replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val docs = spark.table("documents").select($"source", $"text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val sets = docs.groupBy(_._1).map { case (src, xs) =>
      src -> xs.flatMap { case (_, text) =>
        tokens(text).sliding(3).filter(_.length == 3).map(_.mkString(" "))
      }.toSet
    }
    val expect = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
      i = (sa & sb).size.toLong if i > 0
    } yield (a, b, sa.size.toLong, i, r4(i.toDouble / sa.size)))
      .sortBy(t => (t._1, t._2))
    val got = queries("q162_source_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expect, s"${got.take(3)} vs ${expect.take(3)}")
  }

  test("q167 event paths equal the per-user sequence replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val ev = spark.table("events")
      .select($"user_id", $"event_type", unix_micros($"ts"), $"event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val expect = ev.groupBy(_._1).toSeq.map { case (_, xs) =>
      val path = xs.sortBy(x => (x._3, x._4)).take(3).map(_._2)
      (path.mkString(">"), path.length.toLong)
    }.groupBy(identity).toSeq
      .map { case ((p, s), xs) => (p, s, xs.length.toLong) }
      .sortBy(t => (-t._3, t._1)).take(20)
    val got = queries("q167_event_paths")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"${got.take(3)} vs ${expect.take(3)}")
    // the fixture must genuinely rank paths, not count singletons only
    assert(got.exists(_._3 > 1), "every path unique — rollup vacuous")
  }

  test("q168 bitmap overlap equals the naive distinct-set replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def r6(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000
    val ev = spark.table("events").select($"event_type", $"user_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sets = ev.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val expect = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a < b
      i = (sa & sb).size.toLong if i > 0
    } yield (a, b, sa.size.toLong, sb.size.toLong, i,
      r6(i.toDouble / (sa.size + sb.size - i))))
      .sortBy(t => (t._1, t._2))
    val got = queries("q168_bitmap_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expect, s"${got.take(3)} vs ${expect.take(3)}")
  }

  test("q169 phrase blocklist equals the per-document contains replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def r6(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000
    val phrases = graft.operators.TextQueries.blockPhrases
    val docs = spark.table("documents").select($"source", $"text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val expect = docs.groupBy(_._1).toSeq.map { case (src, xs) =>
      val hits = xs.count { case (_, t) =>
        val lt = t.toLowerCase; phrases.exists(lt.contains)
      }
      (src, xs.length.toLong, hits.toLong, (xs.length - hits).toLong,
        r6(hits.toDouble / xs.length))
    }.sortBy(_._1)
    val got = queries("q169_phrase_blocklist")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expect, s"${got.take(3)} vs ${expect.take(3)}")
    // the gate must be live on the fixture: some docs dropped, some kept
    assert(got.exists(_._3 > 0) && got.exists(_._4 > 0))
  }

  test("q170 embedding decontamination equals the max-cosine replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val vecs = spark.table("embeddings")
      .select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2))).toSeq
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0 // left fold, the graft_dot association order
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val norm = vecs.map(v => v._1 -> math.sqrt(dot(v._2, v._2))).toMap
    val bench = vecs.filter(_._1 < 16)
    val expect = vecs.filter(_._1 >= 16).map { case (id, e, lab) =>
      val mc = bench.map(b =>
        dot(e, b._2) / (norm(id) * norm(b._1))).max
      (lab, mc)
    }.groupBy(_._1).toSeq.map { case (lab, xs) =>
      (lab, xs.length.toLong, xs.count(_._2 >= 0.30).toLong,
        math.floor(xs.map(_._2).max * 10000 + 0.5) / 10000)
    }.sortBy(_._1)
    val got = queries("q170_embedding_decontaminate")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expect, s"${got.take(3)} vs ${expect.take(3)}")
    // the τ gate must flag a strict, nonempty subset on the fixture
    assert(got.map(_._3).sum > 0 && got.map(_._3).sum < got.map(_._2).sum)
  }

  test("q171 HLL union registers equal the pairwise-max merge replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def r6d(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val ev = spark.table("events").select($"event_type", $"user_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    def regsOf(uids: Seq[Long]): Array[Int] = {
      val regs = Array.fill(64)(0)
      uids.distinct.foreach { uid =>
        val h = md5hex(uid.toString)
        val b = (java.lang.Long.parseLong(h.substring(0, 8), 16) % 64).toInt
        val w = java.lang.Long.parseLong(h.substring(8, 16), 16)
        regs(b) = math.max(regs(b), if (w == 0) 33 else 33 - w.toBinaryString.length)
      }
      regs
    }
    def est(regs: Array[Int]): Double =
      0.709 * 4096 / regs.map(m => 1.0 / (1L << m)).sum
    val byType = ev.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    val expect = (for {
      (a, ua) <- byType.toSeq; (b, ub) <- byType.toSeq if a < b
    } yield {
      val (ra, rb) = (regsOf(ua), regsOf(ub))
      val merged = ra.zip(rb).map { case (x, y) => math.max(x, y) }
      val checksum = merged.zipWithIndex
        .map { case (m, i) => m.toLong * (i + 1) }.sum
      val (ea, eb, ue) = (est(ra), est(rb), est(merged))
      val nUnion = (ua.toSet ++ ub.toSet).size.toLong
      (a, b, checksum, r4(ue), r4(ea + eb - ue), nUnion,
        r6d((ue - nUnion) / nUnion))
    }).sortBy(t => (t._1, t._2))
    val got = queries("q171_hll_union")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == expect, s"${got.take(2)} vs ${expect.take(2)}")
  }

  test("q172 RFM segments equal the per-customer scoring replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val dayUs = 86400000000L
    val orders = spark.table("orders")
      .select($"o_custkey", unix_micros($"o_orderdate"), $"o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val gmax = orders.map(_._2).max
    val expect = orders.groupBy(_._1).toSeq.map { case (_, xs) =>
      val rec = (gmax - xs.map(_._2).max) / dayUs
      val f = xs.length.toLong
      // exact money: the fixture carries <= 2 decimals, sum in cents
      val cents = xs.map(o => math.round(o._3 * 100)).sum
      val r = if (rec <= 90) 3 else if (rec <= 250) 2 else 1
      val fs = if (f >= 12) 3 else if (f >= 9) 2 else 1
      val ms = if (cents >= 3000000L * 100) 3
        else if (cents >= 2200000L * 100) 2 else 1
      ((r, fs, ms), cents)
    }.groupBy(_._1).toSeq.map { case ((r, fs, ms), xs) =>
      (r, fs, ms, xs.length.toLong,
        math.round(xs.map(_._2).sum.toDouble / 100 * 10000).toDouble / 10000)
    }.sortBy(t => (t._1, t._2, t._3))
    val got = queries("q172_rfm_segments")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expect, s"${got.take(3)} vs ${expect.take(3)}")
    // the fixture must exercise several segments in every dimension
    assert(got.map(_._1).distinct.size == 3 &&
      got.map(_._2).distinct.size == 3 && got.map(_._3).distinct.size == 3)
  }

  test("q173 shingle novelty equals the first-seen set replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def r6d(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000
    val docs = spark.table("documents").select($"source", $"text")
      .collect().map(r =>
        (r.getString(0).drop(3).toInt, r.getString(1))).toSeq
    val sets = docs.groupBy(_._1).map { case (ord, xs) =>
      ord -> xs.flatMap { case (_, t) =>
        tokens(t).sliding(3).filter(_.length == 3).map(_.mkString(" "))
      }.toSet
    }
    val firstSeen = sets.toSeq.flatMap { case (o, s) => s.map(_ -> o) }
      .groupBy(_._1).map { case (sh, xs) => sh -> xs.map(_._2).min }
    val ords = sets.keys.toSeq.sorted
    var cum = 0L
    val expect = ords.map { o =>
      val novel = firstSeen.count(_._2 == o).toLong
      cum += novel
      (o, sets(o).size.toLong, novel, cum,
        r6d(novel.toDouble / sets(o).size))
    }
    val got = queries("q173_shingle_novelty")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expect, s"${got.take(3)} vs ${expect.take(3)}")
    // every source must contribute; later sources mostly repeat earlier
    // shingles, so the curve genuinely bends on the fixture
    assert(got.head._5 == 1.0 && got.last._5 < 1.0)
  }

  test("q174 association rules equal the basket-set replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def r6d(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000
    val items = spark.table("lineitem")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq
    val n = items.map(_._1).distinct.size.toLong
    val cnt = items.groupBy(_._2).map { case (pk, xs) => pk -> xs.size.toLong }
    val support = items.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ps = xs.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).collect { case (p, xs) if xs.size >= 2 =>
      (p, xs.size.toLong)
    }.toSeq
    val expect = support.flatMap { case ((a, b), s) =>
      Seq((a, b, s), (b, a, s)) }.map { case (ante, cons, s) =>
      (ante, cons, s, r6d(s.toDouble / cnt(ante)),
        r6d(s.toDouble * n / (cnt(ante) * cnt(cons))))
    }.sortBy(t => (-t._5, t._1, t._2)).take(200)
    val got = queries("q174_association_rules")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == expect, s"${got.take(3)} vs ${expect.take(3)}")
    // lift must genuinely discriminate (not all rules tied at one value)
    assert(got.map(_._5).distinct.size > 1)
  }

  test("q175 corpus checksum equals the per-source XOR replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val docs = spark.table("documents")
      .select($"source", $"doc_id", $"text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    val expect = docs.groupBy(_._1).toSeq.map { case (src, xs) =>
      val x = xs.map { case (_, id, t) =>
        java.lang.Long.parseLong(md5hex(s"$id:$t").substring(0, 15), 16)
      }.reduce(_ ^ _)
      (src, xs.length.toLong, x)
    }.sortBy(_._1)
    val got = queries("q175_corpus_checksum")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"${got.take(3)} vs ${expect.take(3)}")
    // self-inverse: XOR-ing a replica with itself cancels to zero, and a
    // single changed payload flips its source cell
    val flipped = docs.map { case (s, id, t) =>
      if (id == docs.head._2) (s, id, t + "!") else (s, id, t) }
    val re = flipped.groupBy(_._1).map { case (src, xs) =>
      src -> xs.map { case (_, id, t) =>
        java.lang.Long.parseLong(md5hex(s"$id:$t").substring(0, 15), 16)
      }.reduce(_ ^ _)
    }
    val diff = expect.filter { case (s, _, x) => re(s) != x }
    assert(diff.size == 1 && diff.head._1 == docs.head._1)
  }

  test("q180 AGMS join-size estimates land inside the error band") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val got = queries("q180_join_size_sketch")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // exact sizes replayed from the collected relations
    val li = spark.table("lineitem").select($"l_orderkey", $"l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val orderKeys = spark.table("orders").select($"o_orderkey")
      .collect().map(_.getLong(0)).toSet
    val f2 = li.groupBy(_._2).map(_._2.size.toLong)
      .map(c => c * c).sum
    val joinSize = li.count(r => orderKeys(r._1)).toLong
    assert(got("lineitem_selfjoin_partkey")._1 == f2)
    assert(got("orders_lineitem_orderkey")._1 == joinSize)
    // the unbiased sign-sketch estimator must sit within the AMS error
    // band on the fixture — a plain CMS inner product over-counted the
    // selective join by 58x here, the sign cancellation is what's tested
    got.foreach { case (pair, (exact, est)) =>
      val rel = math.abs(est - exact).toDouble / exact
      assert(rel < 0.5, s"$pair: est $est vs exact $exact (rel $rel)")
    }
  }

  test("q181 bloom decontamination never misses and pays bounded FPs") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val got = queries("q181_bloom_decontaminate")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // exact flags replayed from shingle sets (the q79b ground truth)
    val docs = spark.table("documents").select($"doc_id", $"source", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    def shingleSet(t: String) =
      tokens(t).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val bench = docs.filter(_._1 < 10).flatMap(d => shingleSet(d._3)).toSet
    val exact = docs.filter(_._1 >= 10).groupBy(_._2).map { case (src, xs) =>
      src -> xs.count(d => shingleSet(d._3).exists(bench)).toLong
    }
    got.foreach { case (src, _, bloomN, exactN, fp) =>
      assert(exactN == exact(src), s"$src exact mismatch")
      // Bloom's contract: NO false negatives — bloom >= exact, per source
      assert(bloomN >= exactN, s"$src: bloom missed ($bloomN < $exactN)")
      assert(fp == bloomN - exactN)
    }
    // the filter must be selective: FPs a small fraction of the corpus
    val (nd, fps) = (got.map(_._2).sum, got.map(_._5).sum)
    assert(fps.toDouble / nd < 0.1, s"$fps FPs over $nd docs")
  }

  test("q182 attribution conserves revenue to the cent and splits linearly") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val ev = spark.table("events")
      .select($"user_id", $"event_type", unix_micros($"ts"), $"event_id",
        $"value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val purchases = ev.filter(_._2 == "purchase")
    val touches = ev.filter(e => e._2 == "view" || e._2 == "click")
    def cents(v: Double) = math.floor(v * 100 + 0.5).toLong
    val credits = purchases.flatMap { case (u, _, pt, pid, v) =>
      val c = cents(v)
      val ts = touches.filter(t =>
          t._1 == u && t._3 >= pt - 604800000000L && t._3 < pt)
        .sortBy(t => (t._3, t._4))
      if (ts.isEmpty) Seq("direct" -> c)
      else ts.zipWithIndex.map { case (t, i) =>
        t._2 -> (c / ts.size + (if (i < c % ts.size) 1L else 0L))
      }
    }
    val expect = credits.groupBy(_._1).toSeq.map { case (ch, xs) =>
      (ch, xs.length.toLong,
        math.floor(xs.map(_._2).sum.toDouble / 100 * 100 + 0.5) / 100)
    }.sortBy(_._1)
    val got = queries("q182_linear_attribution")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect, s"$got vs $expect")
    // conservation law: credited cents across channels == purchase cents
    val purchased = purchases.map(p => cents(p._5)).sum
    assert(credits.map(_._2).sum == purchased)
    // both split branches live: some direct, some multi-touch remainder
    assert(got.exists(_._1 == "direct") && got.size == 3)
  }

  test("q183 golden records equal the union-find survivorship replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val parts = spark.table("part")
      .select($"p_partkey", $"p_name", $"p_type", $"p_brand", $"p_size",
        $"p_retailprice")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4), r.getDouble(5))).toSeq
    val byBlock = parts.groupBy(p => (p._2, p._3))
    val pairs = byBlock.values.flatMap { xs =>
      val s = xs.sortBy(_._1)
      for {
        i <- s.indices; j <- i + 1 until s.length
        a = s(i); b = s(j)
        if math.abs(a._5 - b._5) <= 1 &&
          math.abs(a._6 - b._6) / math.max(a._6, b._6) <= 0.05
      } yield (a._1, b._1)
    }.toSeq
    // union-find closure
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expect = members.groupBy(find).toSeq.map { case (_, ids) =>
      val ms = ids.map(id => parts.find(_._1 == id).get)
      (ids.min, ids.size.toLong, ms.map(_._2).min,
        ms.minBy(_._1)._4, ms.map(_._5).max, ms.map(_._6).min)
    }.sortBy(_._1)
    val got = queries("q183_golden_record")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getInt(4), r.getDouble(5))).toSeq
    assert(got == expect, s"${got.take(3)} vs ${expect.take(3)}")
    // clusters exist and every one holds at least a matched pair
    // (transitive >2-member clusters appear from sf0.01 up — max 4 at
    // sf0.01, 38 at sf0.1 — this sf0.001 fixture tops out at pairs)
    assert(got.nonEmpty && got.forall(_._2 >= 2))
  }

  test("q184 token drift equals the smoothed-KL replay and flags the drift") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val docs = spark.table("documents").select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val ta = docs.filter(_._1 % 7 != 0).flatMap(d => tokens(d._2))
    val tb = docs.filter(_._1 % 5 != 0).flatMap { case (id, t) =>
      tokens(if (id % 3 == 0) t + " drifted" else t) }
    val ca = ta.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val cb = tb.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val vocab = (ca.keySet ++ cb.keySet).toSeq.sorted
    val (na, nb, vs) = (ta.size.toLong, tb.size.toLong, vocab.size.toLong)
    def pA(t: String) = (ca.getOrElse(t, 0L) + 1).toDouble / (na + vs)
    def pB(t: String) = (cb.getOrElse(t, 0L) + 1).toDouble / (nb + vs)
    def r4f(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val klBA = r4f(vocab.foldLeft(0.0)((acc, t) =>
      acc + pB(t) * math.log(pB(t) / pA(t))))
    val klAB = r4f(vocab.foldLeft(0.0)((acc, t) =>
      acc + pA(t) * math.log(pA(t) / pB(t))))
    val tv = r4f(vocab.foldLeft(0.0)((acc, t) =>
      acc + math.abs(ca.getOrElse(t, 0L).toDouble / na -
        cb.getOrElse(t, 0L).toDouble / nb)) / 2)
    val got = queries("q184_token_drift")(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((na, nb, vs)))
    assert((got.getDouble(3), got.getDouble(4), got.getDouble(5)) ==
      ((klBA, klAB, tv)), s"$got vs ($klBA, $klAB, $tv)")
    // drift genuinely registers: the injected token moves every measure
    assert(got.getDouble(3) > 0 && got.getDouble(5) > 0)
  }

  test("q176 compression quality equals the per-document Deflater replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def r6d(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000
    val docs = spark.table("documents").select($"source", $"text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val defl = new java.util.zip.Deflater(6)
    val sized = docs.map { case (src, text) =>
      val raw = text.getBytes("UTF-8")
      (src, raw.length.toLong,
        graft.operators.TextQueries.deflatedSize(raw, defl))
    }
    defl.end()
    val thr = graft.operators.TextQueries.repetitiveRatio
    val expect = sized.groupBy(_._1).toSeq.map { case (src, xs) =>
      val raw = xs.map(_._2).sum
      val dz = xs.map(_._3).sum
      (src, xs.length.toLong, raw, dz, r6d(dz.toDouble / raw),
        xs.count(x => x._3.toDouble / x._2 < thr).toLong)
    }.sortBy(_._1)
    val got = queries("q176_compression_quality")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSeq
    assert(got == expect, s"${got.take(3)} vs ${expect.take(3)}")
    // the synthetic word-salad corpus is highly repetitive: the ratio must
    // sit well below 1 and the gate must be live without flagging everything
    assert(got.forall(_._5 < 0.8))
    val flagged = got.map(_._6).sum
    assert(flagged > 0 && flagged < got.map(_._2).sum,
      s"repetitive gate must be live and partial: $got")
  }

  test("q185 Wilson intervals equal the closed-form replay and bracket p") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def r6d(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000
    val events = spark.table("events")
      .select(org.apache.spark.sql.functions.hour($"ts").as("h"),
        $"event_type").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    val expect = events.groupBy(_._1).toSeq.map { case (h, xs) =>
      val n = xs.length.toDouble
      val x = xs.count(_._2 == "purchase").toDouble
      val p = x / n
      val z2 = 1.96 * 1.96
      val center = p + z2 / (n * 2)
      val marg = 1.96 * math.sqrt(p * (1.0 - p) / n + z2 / (n * n * 4))
      val denom = 1.0 + z2 / n
      (h, xs.length.toLong, x.toLong, r6d(p),
        r6d((center - marg) / denom), r6d((center + marg) / denom))
    }.sortBy(_._1)
    val got = queries("q185_wilson_ci")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expect, s"${got.take(2)} vs ${expect.take(2)}")
    got.foreach { case (h, _, _, p, lo, hi) =>
      assert(lo >= 0 && hi <= 1 && lo <= p && p <= hi,
        s"hour $h: interval [$lo, $hi] must bracket $p inside [0,1]")
    }
  }

  test("q186 temperature shares sum to 1 and upweight small sources") {
    graft.sources.Tables.register(spark, sf)
    val got = queries("q186_temperature_mixing")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(5)))
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-4,
      s"shares must sum to ~1: ${got.map(_._3).sum}")
    // α < 1 ⇒ epochs (upsampling factor) strictly decrease with source size
    val byToks = got.sortBy(_._2)
    byToks.sliding(2).foreach { case Array((sa, ta, _, ea), (sb, tb, _, eb)) =>
      if (ta < tb) assert(ea >= eb,
        s"$sa ($ta toks, $ea epochs) vs $sb ($tb toks, $eb epochs)")
    }
  }

  test("q187 length gate partitions every source's docs exactly") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val nDocs = spark.table("documents").groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = queries("q187_length_gate")(spark, sf).collect()
    assert(got.length == nDocs.size)
    got.foreach { r =>
      val src = r.getAs[String]("source")
      val total = r.getAs[Long]("drop_short") + r.getAs[Long]("drop_long") +
        r.getAs[Long]("kept")
      assert(total == nDocs(src), s"$src: $total != ${nDocs(src)}")
      assert(r.getAs[Double]("p05") <= r.getAs[Double]("p95"))
      assert(r.getAs[Long]("kept") > 0, s"$src: gate must keep the bulk")
    }
  }

  test("q190 Zipf fit is a sane log-log regression on this corpus") {
    graft.sources.Tables.register(spark, sf)
    val r = queries("q190_zipf_slope")(spark, sf).collect().head
    val (n, slope, r2) = (r.getAs[Long]("n_top"),
      r.getAs[Double]("zipf_slope"), r.getAs[Double]("r2"))
    assert(n > 10, s"expected a real top-k relation, got $n")
    assert(slope < 0, s"rank-frequency slope must be negative: $slope")
    assert(r2 > 0 && r2 <= 1, s"r² out of range: $r2")
  }

  test("q213 threshold curve is monotone and anchored to q110 at 0.6") {
    graft.sources.Tables.register(spark, sf)
    val got = queries("q213_dedup_threshold_curve")(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    // tighter thresholds can only lose pairs/drops and gain survivors
    got.sliding(2).foreach {
      case Array((_, p1, d1, s1), (_, p2, d2, s2)) =>
        assert(p2 <= p1 && d2 <= d1 && s2 >= s1, s"curve not monotone: $got")
      case _ =>
    }
    // the 0.6 point must equal the committed q110 relation
    val q110 = queries("q110_ppjoin")(spark, sf).collect()
    val at06 = got.find(_._1 == 0.6).get
    assert(at06._2 == q110.length)
    assert(at06._3 == q110.map(_.getLong(1)).distinct.length)
  }

  test("q212 k-anonymity risk equals the QI-group replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val docs = spark.table("documents")
      .select($"lang", $"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 100))
    val gsz = docs.groupBy(identity).map { case (k, xs) => k -> xs.length }
    val expect = docs.groupBy(_._2).map { case (src, xs) =>
      val risky = xs.count(x => gsz(x) < 5)
      src -> ((xs.length.toLong, risky.toLong,
        xs.map(gsz(_)).min.toLong))
    }
    val got = queries("q212_k_anonymity")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getAs[Long]("min_group")))).toMap
    assert(got == expect, s"${got.take(3)} vs ${expect.take(3)}")
  }

  test("q210 coverage greedy equals the reference and gains never increase") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    // reference greedy on collected shingle sets
    val sets = spark.table("documents")
      .select($"doc_id", $"text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split(" ", -1)
        r.getLong(0) -> toks.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.toMap
    var covered = Set.empty[String]
    var chosen = Set.empty[Long]
    val expect = (1 to 5).map { r =>
      val (id, gain) = sets.filterNot(kv => chosen(kv._1))
        .map { case (id, s) => (id, (s -- covered).size) }
        .minBy { case (id, g) => (-g, id) }
      covered ++= sets(id); chosen += id
      (r, id, gain.toLong)
    }
    val got = queries("q210_coverage_select")(spark, sf).collect()
      .map(r => (r.getAs[Int]("sel_round"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("gain")))
    assert(got.toSeq == expect, s"${got.toSeq} vs $expect")
    // submodularity: marginal gains are non-increasing along the greedy
    got.map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, s"gains increased: $a -> $b")
      case _ =>
    }
  }

  test("q208 folds are exactly balanced within every source") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val perSrc = spark.table("documents").groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = queries("q208_stratified_kfold")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("fold"),
        r.getAs[Long]("n_docs")))
    got.groupBy(_._1).foreach { case (src, xs) =>
      assert(xs.map(_._3).sum == perSrc(src), s"$src conservation")
      // tiny sources (sf0.001) fill folds 0..n-1; balance counts absent
      // folds as size 0
      val k = math.min(5, perSrc(src)).toInt
      assert(xs.map(_._2).sorted.toSeq == (0 until k), s"$src folds")
      val minSize = if (xs.length == 5) xs.map(_._3).min else 0L
      assert(xs.map(_._3).max - minSize <= 1,
        s"$src folds unbalanced: ${xs.map(_._3).mkString(",")}")
    }
  }

  test("q209 burstiness moments equal a per-user integer replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    // replay one mid-size user's (n, s1, s2) and its bucket
    val byUser = spark.table("events")
      .select($"user_id", expr("unix_micros(ts)").as("tus"), $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val stats = byUser.toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._2, x._3)).map(_._2)
      val gaps = s.sliding(2).collect { case Array(a, b) => (b - a) / 1000000 }
        .toSeq
      if (gaps.length >= 5 && gaps.sum > 0) {
        val n = gaps.length.toLong
        val (s1, s2) = (gaps.sum, gaps.map(g => g * g).sum)
        val mean = s1.toDouble / n
        val sd = math.sqrt((s2.toDouble - s1.toDouble * s1 / n) / n)
        val b = (sd - mean) / (sd + mean)
        Some(math.floor((b + 1.0) * 5).toLong -> n)
      } else None
    }
    val expect = stats.groupBy(_._1).map { case (bk, xs) =>
      bk -> ((xs.length.toLong, xs.map(_._2).sum))
    }
    val got = queries("q209_burstiness")(spark, sf).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("n_gaps")))).toMap
    assert(got == expect, s"$got vs $expect")
    // scripted metronomes would pile into bucket <= 2 (B near -1); humans
    // sit near 0 — the fixture must be in the human band
    assert(got.keySet.forall(b => b >= 3 && b <= 6), got.keySet)
  }

  test("q207 CDC chunking equals the replay and survives byte shifts") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    // replay: chunk every payload with the same pure function, rebuild the
    // per-source stats, compare exactly
    val docs = spark.table("documents").select($"doc_id", $"source", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val chunks = docs.flatMap { case (id, srcName, text) =>
      val payload = text.getBytes("UTF-8")
      graft.operators.MultimodalQueries.cdcChunks(payload).zipWithIndex.map {
        case ((off, len), idx) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          md.update(payload, off, len)
          (srcName, id * 4096 + idx, len.toLong,
            md.digest().map("%02x".format(_)).mkString)
      }
    }
    val firstOf = chunks.groupBy(_._4).map { case (d, xs) =>
      d -> xs.map(_._2).min
    }
    val expect = chunks.groupBy(_._1).map { case (srcName, xs) =>
      val dups = xs.filter(x => firstOf(x._4) != x._2)
      srcName -> ((xs.length.toLong, xs.map(_._3).sum,
        dups.length.toLong, dups.map(_._3).sum))
    }
    val got = queries("q207_cdc_chunk_dedup")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, s"${got.take(2)} vs ${expect.take(2)}")
    // shift invariance: prefixing bytes must preserve most chunk digests
    // (the property fixed-size framing lacks). Long sample (~10 docs) so
    // the one pre-re-sync chunk is statistical noise, not 25% of the set.
    val body = docs.take(10).map(_._3).mkString(" ")
    val sample = body.getBytes("UTF-8")
    val shifted = ("PREFIX " + body).getBytes("UTF-8")
    def digests(p: Array[Byte]) =
      graft.operators.MultimodalQueries.cdcChunks(p).map { case (o, l) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(p, o, l); md.digest().toSeq
      }.toSet
    val (d1, d2) = (digests(sample), digests(shifted))
    val overlap = d1.intersect(d2).size.toDouble / d1.size
    assert(overlap >= 0.5,
      s"CDC must re-sync after a shift: only ${d1.intersect(d2).size}/${d1.size} chunks survived")
  }

  test("q206 confusion matrix conserves docs and row shares sum to 1") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val perLang = spark.table("documents").groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = queries("q206_lang_confusion")(spark, sf).collect()
    got.groupBy(_.getAs[String]("lang")).foreach { case (lang, xs) =>
      assert(xs.map(_.getAs[Long]("n_docs")).sum == perLang(lang))
      val shareSum = xs.map(_.getAs[Double]("row_share")).sum
      assert(math.abs(shareSum - 1.0) < 1e-3, s"$lang shares $shareSum")
    }
    // matrix must equal a direct rollup of q150's predictions
    val direct = queries("q150_langid_trigram")(spark, sf).collect()
      .groupBy(r => (r.getAs[String]("lang"), r.getAs[String]("lang_pred")))
      .map { case (k, xs) => k -> xs.length.toLong }
    val matrix = got.map(r => (r.getAs[String]("lang"),
      r.getAs[String]("lang_pred")) -> r.getAs[Long]("n_docs")).toMap
    assert(matrix == direct)
  }

  test("q204 KS statistic equals the brute-force two-sample replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def r6d(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000
    val ev = spark.table("events")
      .select($"event_id", $"user_id", $"value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val as = ev.filter(_._1 % 2 == 0).map(_._3)
    val bs = ev.filter(_._1 % 2 == 1)
      .map(e => if (e._2 % 3 == 0) e._3 * 1.25 + 2.0 else e._3)
    val support = (as ++ bs).distinct.sorted
    val d = support.map { v =>
      math.abs(as.count(_ <= v).toDouble / as.length -
        bs.count(_ <= v).toDouble / bs.length)
    }.max
    val r = queries("q204_ks_test")(spark, sf).collect().head
    assert(r.getAs[Long]("n_a") == as.length && r.getAs[Long]("n_b") == bs.length)
    assert(r.getAs[Double]("d_stat") == r6d(d),
      s"${r.getAs[Double]("d_stat")} vs ${r6d(d)}")
    val crit = 1.358 * math.sqrt(
      (as.length + bs.length).toDouble / (as.length.toLong * bs.length))
    assert(r.getAs[Int]("reject_05") == (if (d > crit) 1 else 0))
  }

  test("q205 Gini equals the textbook sorted-rank replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def r6d(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000
    val cents = spark.table("orders")
      .groupBy($"o_custkey")
      .agg(sum($"o_totalprice".cast("decimal(18,4)") * 100)
        .cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(x => (x._2, x._1)).map(_._2)
    val n = cents.length.toLong
    val total = cents.sum
    val num = cents.zipWithIndex
      .map { case (x, i0) => (2L * (i0 + 1) - n - 1) * x }.sum
    val gini = r6d(num.toDouble / (n.toDouble * total))
    val r = queries("q205_gini_revenue")(spark, sf).collect().head
    assert(r.getAs[Long]("n_customers") == n)
    assert(r.getAs[Long]("total_cents") == total)
    assert(r.getAs[Double]("gini") == gini,
      s"${r.getAs[Double]("gini")} vs $gini")
    assert(gini > 0 && gini < 1)
  }

  test("q203 epoch shuffle: partitions conserve the corpus and differ per epoch") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val nDocs = spark.table("documents").count()
    val got = queries("q203_epoch_shuffle")(spark, sf).collect()
      .map(r => (r.getAs[Int]("epoch"), r.getAs[Long]("batch"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("member_digest")))
    val byEpoch = got.groupBy(_._1)
    assert(byEpoch.keySet == Set(0, 1))
    byEpoch.foreach { case (ep, xs) =>
      assert(xs.map(_._3).sum == nDocs, s"epoch $ep must cover the corpus")
      // all batches full at 32 except possibly the last
      val full = xs.sortBy(_._2).dropRight(1)
      assert(full.forall(_._3 == 32), s"epoch $ep has a short inner batch")
      // XOR digest over all batches = XOR over the corpus: epoch-invariant
    }
    val eXor = byEpoch.map { case (ep, xs) =>
      ep -> xs.map(_._4).reduce(_ ^ _)
    }
    assert(eXor(0) == eXor(1), "whole-corpus digest must not depend on epoch")
    // the shuffle must actually shuffle: batch compositions differ
    val b0 = byEpoch(0).map(x => x._2 -> x._4).toMap
    val b1 = byEpoch(1).map(x => x._2 -> x._4).toMap
    assert(b0.exists { case (b, d) => b1.get(b).exists(_ != d) },
      "epoch 1 produced identical batches to epoch 0")
  }

  test("q201 keywords: chi-square replay on the top cell, 5 per source") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val got = queries("q201_source_keywords")(spark, sf).collect()
    got.groupBy(_.getAs[String]("source")).foreach { case (src, xs) =>
      assert(xs.map(_.getAs[Int]("kw_rank")).sorted.toSeq ==
        (1 to xs.length) && xs.length <= 5, s"$src ranks")
    }
    // replay the statistic for the single highest-ranked cell
    val top = got.minBy(r => (r.getAs[String]("source"), r.getAs[Int]("kw_rank")))
    val (src, tok) = (top.getAs[String]("source"), top.getAs[String]("token"))
    val cells = spark.table("documents")
      .select($"source", explode(split(lower($"text"), " ")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = cells.length.toDouble
    val nst = cells.count(c => c._1 == src && c._2 == tok).toDouble
    val nt = cells.count(_._2 == tok).toDouble
    val ns = cells.count(_._1 == src).toDouble
    val d = nst * (n - nt - ns + nst) - (nt - nst) * (ns - nst)
    val chi2 = n * d * d / (nt * (n - nt) * ns * (n - ns))
    val r4 = math.floor(chi2 * 10000 + 0.5) / 10000
    assert(top.getAs[Double]("chi2") == r4,
      s"$src/$tok: ${top.getAs[Double]("chi2")} vs $r4")
  }

  test("q202 LSH evaluation counts are internally consistent") {
    graft.sources.Tables.register(spark, sf)
    val r = queries("q202_lsh_eval")(spark, sf).collect().head
    val (nl, ne, tp) = (r.getAs[Long]("n_lsh"), r.getAs[Long]("n_exact"),
      r.getAs[Long]("tp"))
    assert(tp <= math.min(nl, ne))
    assert(r.getAs[Long]("fp") == nl - tp)
    assert(r.getAs[Long]("fn") == ne - tp)
    // LSH candidates must dominate the exact join's recall floor when the
    // exact join is non-empty (the band family's documented behavior)
    if (ne > 0) assert(r.getAs[Double]("recall_at_06") >= 0.8,
      s"recall ${r.getAs[Double]("recall_at_06")}")
  }

  test("q200 BPE encoding conserves tokens and compresses every source") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val wsTok = spark.table("documents")
      .select($"source", explode(split(lower($"text"), " ")).as("w"))
      .filter(length($"w") > 0).groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = queries("q200_bpe_encode")(spark, sf).collect()
    assert(got.length == wsTok.size)
    got.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("ws_tokens") == wsTok(src))
      val (chars, syms) = (r.getAs[Long]("chars"), r.getAs[Long]("symbols"))
      // 3 merges can only shrink, and on this corpus each fires somewhere
      assert(syms < chars, s"$src: $syms !< $chars")
      val c = r.getAs[Double]("compression")
      assert(c > 0.5 && c < 1.0, s"$src compression $c")
    }
  }

  test("q199 recommendations are ranked, bounded, and cosine-normalized") {
    graft.sources.Tables.register(spark, sf)
    val got = queries("q199_item_recs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (item, xs) =>
      val sorted = xs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to xs.length), s"item $item ranks")
      assert(xs.length <= 3)
      // scores descend with rank; basket-cosine lives in (0, 1]
      sorted.map(_._4).sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"item $item not ranked by score")
        case _ =>
      }
      xs.foreach { case (_, _, rec, s) =>
        assert(s > 0 && s <= 1.0, s"item $item rec $rec score $s")
      }
    }
  }

  test("q198 Holt states equal the textbook recursion replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def r4d(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val series = spark.table("events")
      .select($"event_type", expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy($"event_type", $"day").count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, xs) =>
        t -> xs.sortBy(_._2).map(_._3.toDouble).toSeq
      }
    val expect = series.map { case (t, ys) =>
      var (l, b) = (ys.head, 0.0)
      var step = 1
      ys.tail.foreach { y =>
        if (step == 1) { b = y - l; l = y }
        else {
          val l2 = 0.3 * y + 0.7 * (l + b)
          b = 0.1 * (l2 - l) + 0.9 * b
          l = l2
        }
        step += 1
      }
      t -> ((ys.length.toLong, r4d(l), r4d(b)))
    }
    val got = queries("q198_holt_forecast")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(got == expect, s"$got vs $expect")
  }

  test("q197 Markov attribution: removal monotone, shares sum to one") {
    graft.sources.Tables.register(spark, sf)
    val got = queries("q197_markov_attribution")(spark, sf).collect()
    assert(got.map(_.getAs[String]("channel")).sorted.toSeq ==
      Seq("click", "error", "signup", "view"))
    val base = got.head.getAs[Double]("conv_base")
    assert(base > 0 && base <= 1)
    got.foreach { r =>
      assert(r.getAs[Double]("conv_base") == base)
      // removing a channel only deletes conversion paths — v can't rise
      assert(r.getAs[Double]("conv_removed") <= base + 1e-9)
      assert(r.getAs[Double]("removal_effect") >= 0)
    }
    val shares = got.map(_.getAs[Double]("attribution_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4, s"shares ${shares.sum}")
  }

  test("q195 PSI conserves both snapshots and detects the planted drift") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val nA = spark.table("events").filter($"event_id" % 2 === 0).count()
    val nB = spark.table("events").filter($"event_id" % 2 === 1).count()
    val got = queries("q195_psi_drift")(spark, sf).collect()
    assert(got.length == 10)
    assert(got.map(_.getAs[Long]("n_a")).sum == nA)
    assert(got.map(_.getAs[Long]("n_b")).sum == nB)
    // PSI contributions are (p-q)ln(p/q) >= 0 termwise; the planted
    // upscale on a third of users must register as positive drift
    got.foreach(r => assert(r.getAs[Double]("contrib") >= 0.0))
    val psi = got.head.getAs[Double]("psi_total")
    assert(psi > 0.003, s"planted drift must be visible: PSI $psi")
    assert(got.forall(_.getAs[Double]("psi_total") == psi))
  }

  test("q196 backtest window is the last fifth and errors are live") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val days = spark.table("events")
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().count()
    val got = queries("q196_seasonal_backtest")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val n = r.getAs[Long]("n_test_days")
      assert(n >= days / 5 - 7 && n <= days / 5 + 7,
        s"test window $n vs ~${days / 5} of $days days")
      assert(r.getAs[Double]("mape") > 0, "a zero-error forecast is a bug")
      assert(r.getAs[Double]("mae") >= 0)
    }
  }

  test("q194 stitch recall: every synthesized page pair is recovered") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    // docs with >=16 tokens each contribute exactly one true stitch pair,
    // and candidates can only exceed stitches (8-gram collisions), never
    // miss them — unless the boundary key was df-capped, which the cap
    // census below rules out on this fixture
    val eligible = spark.table("documents")
      .select($"source", size(split(lower($"text"), " ")).as("n"))
      .filter($"n" >= 16).groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = queries("q194_continuation_stitch")(spark, sf).collect()
    assert(got.length == eligible.size)
    got.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_pages") == 2 * eligible(src))
      assert(r.getAs[Long]("stitches") == eligible(src),
        s"$src: lost a true stitch (df cap must not fire at this SF)")
      assert(r.getAs[Long]("cand_pairs") >= r.getAs[Long]("stitches"))
    }
  }

  test("q192 BPE merges equal the textbook reference implementation") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    // reference BPE (Sennrich ACL'16): count-weighted adjacent pairs over
    // the distinct-word multiset, merge the argmax greedily leftmost-first
    var words: Map[Vector[String], Long] = spark.table("documents")
      .select(explode(split(lower($"text"), " ")).as("w")).collect()
      .map(_.getString(0)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) =>
        w.toVector.map(_.toString) -> xs.length.toLong
      }
    val expect = (1 to 3).map { r =>
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      val ((a, b), n) = pc.toSeq.minBy { case ((x, y), m) => (-m, x, y) }
      words = words.map { case (syms, c) =>
        val acc = syms.foldLeft(Vector.empty[String]) { (st, s) =>
          if (st.nonEmpty && st.last == a && s == b) st.init :+ (a + b)
          else st :+ s
        }
        acc -> c
      }
      (r, a, b, n)
    }
    val got = queries("q192_bpe_merges")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"$got vs $expect")
    // the learned units must be genuine multi-char subwords
    assert(got.forall { case (_, a, b, n) => (a + b).length >= 2 && n > 0 })
  }

  test("q191 vocabulary growth conserves types and tokens") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val toks = spark.table("documents")
      .select(explode(split(lower($"text"), " ")).as("t"))
    val vocab = toks.distinct().count()
    val total = toks.count()
    val got = queries("q191_vocab_growth")(spark, sf).collect()
    assert(got.map(_.getAs[Long]("new_types")).sum == vocab)
    assert(got.map(_.getAs[Long]("bucket_tokens")).sum == total)
    val cums = got.sortBy(_.getAs[Long]("bucket")).map(_.getAs[Long]("cum_vocab"))
    assert(cums.last == vocab)
    cums.sliding(2).foreach { case Array(a, b) => assert(a <= b) case _ => }
  }

  test("q223 sequence packing equals a Scala greedy replay; fill invariants hold") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    import graft.operators.ScaleQueries
    val got = queries("q223_sequence_packing")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val docs = spark.table("documents").select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val B = ScaleQueries.packBudget
    val W = ScaleQueries.packBlock
    val expect = docs.groupBy(_._1 / W).toSeq.flatMap { case (blk, ds) =>
      var pack = 0L; var fill = 0L; var pos = 0L
      ds.sortBy(_._1).map { case (id, text) =>
        val n = tokens(text).length.toLong
        if (pack == 0L || fill + n > B) { pack += 1; fill = n; pos = 1 }
        else { fill += n; pos += 1 }
        (id, blk, pack, pos, n)
      }
    }.sortBy(_._1)
    assert(got.sortBy(_._1) == expect)
    // invariants: every doc packed exactly once; within a pack the fill
    // stays <= budget unless the pack is a single oversize doc; pack ids
    // are consecutive from 1 within each block
    assert(got.map(_._1).distinct.length == docs.length)
    val byPack = got.groupBy(t => (t._2, t._3))
    byPack.foreach { case ((blk, pid), members) =>
      val total = members.map(_._5).sum
      assert(total <= B || members.length == 1,
        s"pack ($blk, $pid) overfilled with ${members.length} members")
      assert(members.map(_._4).sorted == (1L to members.length).toSeq)
    }
    got.groupBy(_._2).foreach { case (blk, ms) =>
      val packs = ms.map(_._3).distinct.sorted
      assert(packs == (1L to packs.length).toSeq,
        s"block $blk pack ids not consecutive: $packs")
    }
    assert(byPack.exists(_._2.length > 1),
      "fixture must produce at least one multi-doc pack")
  }

  test("q223 packing edge cases: empty, oversize, and exact-budget docs") {
    import spark.implicits._
    import graft.operators.ScaleQueries
    val B = ScaleQueries.packBudget.toInt
    // doc 0: empty text (1 token by the split convention); doc 1: exactly
    // the budget; doc 2: oversize (spills alone, fill > budget); doc 3/4:
    // two small docs that share the next pack; doc 64: next block
    // restarts pack ids at 1
    val docs = Seq(
      (0L, ""),
      (1L, Seq.fill(B)("w").mkString(" ")),
      (2L, Seq.fill(B + 40)("w").mkString(" ")),
      (3L, Seq.fill(10)("w").mkString(" ")),
      (4L, Seq.fill(10)("w").mkString(" ")),
      (64L, Seq.fill(5)("w").mkString(" "))).toDF("doc_id", "text")
    val got = ScaleQueries.sequencePackingOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got(0L) == ((0L, 1L, 1L, 1L)), "empty doc: 1 token, opens pack 1")
    // 1 + B > B → doc 1 seals pack 1 and opens pack 2 at exactly-budget fill
    assert(got(1L) == ((0L, 2L, 1L, B.toLong)))
    // oversize doc spills alone into pack 3 (fill > budget is allowed for
    // a single member)
    assert(got(2L) == ((0L, 3L, 1L, (B + 40).toLong)))
    // the two small docs share pack 4
    assert(got(3L) == ((0L, 4L, 1L, 10L)))
    assert(got(4L) == ((0L, 4L, 2L, 10L)))
    // a new block restarts pack numbering — no cross-block coordination
    assert(got(64L) == ((1L, 1L, 1L, 5L)))
  }

  test("q226 span corruption: spans stay in bounds, never overlap, track the budget") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val spans = queries("q226_span_corruption")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(spans.nonEmpty)
    spans.groupBy(_._1).foreach { case (doc, ss) =>
      val n = ss.head._5
      // every span inside the doc
      ss.foreach { case (_, _, start, len, _) =>
        assert(start >= 1 && start + len - 1 <= n,
          s"doc $doc span [$start, ${start + len - 1}] outside 1..$n")
      }
      // strata containment makes spans disjoint
      val sorted = ss.sortBy(_._3).toSeq
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a._3 + a._4 <= b._3, s"doc $doc spans overlap: $a $b")
      }
      // masked volume tracks the 15% budget: k·3 ≤ m + 3 and ≥ min(m, 3)
      val masked = ss.map(_._4).sum
      val m = n * 15 / 100
      assert(masked <= m + 3 && masked >= math.min(m, 3L),
        s"doc $doc masked $masked vs budget $m")
      // span indices are 1..k
      assert(ss.map(_._2).sorted.toSeq == (1L to ss.length).toSeq)
    }
    // docs under the mask budget emit nothing
    val docsWithSpans = spans.map(_._1).toSet
    val tiny = spark.table("documents")
      .select($"doc_id", size(split(lower($"text"), " ")).as("n"))
      .collect().filter(_.getInt(1) < 7).map(_.getLong(0))
    tiny.foreach(d => assert(!docsWithSpans.contains(d)))
    // determinism across partitioning
    val alt = graft.operators.TextQueries
      .spanCorruptionOf(spark.table("documents").repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(alt == spans.sorted.toSeq)
  }

  test("q230 stratified sample equals the per-lang exponential-races replay") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    def key(id: Long, nc: Long): Double = {
      val d = MessageDigest.getInstance("MD5")
        .digest(s"ws:$id".getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16)
      math.log((h + 0.5) / 4294967296.0) / nc.toDouble
    }
    val docs = spark.table("documents")
      .select($"doc_id", $"lang", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      ds.map { case (id, _, nc) => (id, nc, key(id, nc)) }
        .sortBy { case (id, _, k) => (-k, id) }
        .take(25).zipWithIndex
        .map { case ((id, nc, k), i) =>
          (lang, i + 1L, id, nc, math.floor(k * 1000000 + 0.5) / 1000000 + 0)
        }
    }.sortBy { case (lang, rnk, _, _, _) => (lang, rnk) }
    val got = queries("q230_weighted_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expect, s"got ${got.take(3)}…, expect ${expect.take(3)}…")
    // every stratum is fully represented: rank runs 1..min(25, |lang|)
    val perLang = docs.groupBy(_._2).view.mapValues(_.length).toMap
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._2).sorted ==
        (1L to math.min(25, perLang(lang)).toLong), lang)
    }
  }

  test("q233 water-filling equals the sorted-boundary replay and " +
      "exhausts the budget") {
    import spark.implicits._
    graft.sources.Tables.register(spark, sf)
    val perLang = spark.table("documents")
      .select($"lang", $"text").collect()
      .map(r => (r.getString(0), tokens(r.getString(1)).length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val b = perLang.values.sum * 9 / 10
    val rows = perLang.toSeq.map { case (lang, toks) =>
      val w = math.exp(0.25 * math.log(toks.toDouble))
      (lang, toks, w, toks.toDouble / w)
    }.sortBy { case (lang, _, _, r) => (r, lang) }
    // identical sequential prefix folds to the engine's (r, lang) windows
    val pc = rows.scanLeft(0L) { case (a, (_, t, _, _)) => a + t }.tail
    val pw = rows.scanLeft(0.0) { case (a, (_, _, w, _)) => a + w }.tail
    val totalW = pw.last
    val lam = rows.indices.map { j =>
      (b.toDouble - (pc(j) - rows(j)._2).toDouble) /
        (totalW - (pw(j) - rows(j)._3))
    }.zipWithIndex.collectFirst { case (l, j)
        if (j == 0 || rows(j - 1)._4 <= l) && l <= rows(j)._4 => l }.get
    val expect = rows.map { case (lang, toks, w, r) =>
      val raw = if (r <= lam) toks.toDouble else lam * w
      (lang, toks, r <= lam, math.floor(raw * 10000 + 0.5) / 10000,
        math.floor(raw / b.toDouble * 1000000 + 0.5) / 1000000)
    }.sortBy(_._1)
    val got = queries("q233_budget_waterfill")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expect, s"got $got, expect $expect")
    // the allocation is feasible (never above capacity) and exhausts the
    // budget exactly (up to the surfaced r4 rounding)
    got.foreach { case (lang, toks, sat, alloc, _) =>
      assert(alloc <= toks.toDouble, lang)
      assert(sat == (alloc == toks.toDouble), lang)
    }
    assert(math.abs(got.map(_._4).sum - b) < 0.01,
      s"${got.map(_._4).sum} != $b")
  }

  test("q244 perceptual frame dedup: planted near-dup survives a byte edit " +
      "that defeats md5") {
    import spark.implicits._
    // doc 1: two frames of clearly bimodal content (cells far from the
    // mean, so single-byte noise cannot flip unrelated borderline bits);
    // doc 2: same frames with (a) one char changed in frame 0 — aHash
    // IDENTICAL, md5 different — and (b) one whole 4-byte cell rewritten
    // in frame 1 — exactly one bit flips (hamming 1). q92b's exact-md5
    // join finds NEITHER; the perceptual path must find both frames.
    val f0 = "a" * 128 + "z" * 128
    val f1 = "z" * 128 + "a" * 128
    val f0edit = "a" * 60 + "b" + "a" * 67 + "z" * 128 // one byte inside a cell
    val f1edit = "z" * 128 + "a" * 60 + "zzzz" + "a" * 64 // one whole cell
    val docs = Seq((1L, f0 + f1), (2L, f0edit + f1edit)).toDF("doc_id", "text")
    val pairs = graft.operators.MultimodalQueries.frameAhashPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    assert(pairs.length == 1, pairs.toSeq)
    val (a, b2, n, minH) = pairs.head
    assert((a, b2) == ((1L, 2L)))
    assert(n == 2L, s"both planted near-dup frames must match, got $n")
    assert(minH <= 3)
    // ...and md5 equality (q92b's fingerprint) really is defeated
    assert(java.security.MessageDigest.getInstance("MD5").digest(
      f0.getBytes("UTF-8")).toSeq !=
      java.security.MessageDigest.getInstance("MD5").digest(
        f0edit.getBytes("UTF-8")).toSeq)
    // signature sanity: byte-edit frame pins hamming 0, cell-edit ≤ 3
    val sigs = graft.operators.MultimodalQueries.frameAhashSigs(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(3)).toMap
    assert(sigs((1L, 0)) == sigs((2L, 0)),
      "a single-byte edit inside a cell must not move the aHash")
    assert(sigs((1L, 1)) != sigs((2L, 1)),
      "a whole-cell rewrite must move the aHash (within the verify bar)")
  }

  test("q246 scene cuts: planted cut detected, steady scene uncut") {
    import spark.implicits._
    // frame contents engineered bimodal (q244's trick): f0 and f1 have
    // COMPLEMENTARY aHashes (hamming 64 — a hard cut); f0edit differs from
    // f0 by one byte inside a cell (hamming 0 — same scene). The fixture's
    // word-soup frames always step ≥ τ_cut, so the NO-cut direction only
    // exists via crafted frames.
    val f0 = "a" * 128 + "z" * 128
    val f1 = "z" * 128 + "a" * 128
    val f0edit = "a" * 60 + "b" + "a" * 67 + "z" * 128
    val docs = Seq(
      (1L, f0 + f0edit), // two frames, same scene: 0 cuts, longest 2
      (2L, f0 + f1 + f1), // cut at frame 1, then steady: 1 cut, 2 segments
      (3L, f0)) // single frame: degenerate — 0 cuts, 1 segment
      .toDF("doc_id", "text")
    val got = graft.operators.MultimodalQueries.sceneCutsOf(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getInt(5)))).toMap
    // (n_frames, n_cuts, n_segments, longest_segment, max_step)
    assert(got(1L) == ((2L, 0L, 1L, 2L, 0)), got(1L))
    assert(got(2L) == ((3L, 1L, 2L, 2L, 64)), got(2L))
    assert(got(3L) == ((1L, 0L, 1L, 1L, 0)), got(3L))
  }

  test("q249 cross-modal consistency: one-modality mismatches flagged, " +
      "both-modality corruption separated, small groups guarded") {
    import spark.implicits._
    // crafted signatures (popcount-controlled aHashes) + embeddings drive
    // the exact production chain. r = popcount·10000/64: 31→4844,
    // 32→5000, 33→5156, 2→313; e = mean(embedding)·10000: 0.5→5000,
    // 0.9→9000. Hand-checked against the integer outlier spelling:
    // label 0's planted visual outlier has LHS 3.80e12 > RHS 2.17e12.
    def emb(v: Float) = Array.fill(64)(v)
    val sigRows = Seq.newBuilder[(Long, String)]
    val embRows = Seq.newBuilder[(Long, Array[Float], Int)]
    // label 0: 12 normals with r-jitter (31/33 bits), doc 12 visually
    // extreme (2 bits) with a NORMAL embedding → caption mismatch
    for (d <- 0 until 12) sigRows +=
      ((d.toLong, if (d % 2 == 0) "fffffff700000000" else "ffffffff10000000"))
    sigRows += ((12L, "3000000000000000"))
    for (d <- 0 to 12) embRows += ((d.toLong, emb(0.5f), 0))
    // doc 0 gets a second identical frame — the per-doc rate must average
    sigRows += ((0L, "fffffff700000000"))
    // label 1: embedding outlier with normal visuals → the other mismatch
    for (d <- 20 to 31) {
      sigRows += ((d.toLong, "ffffffff00000000"))
      embRows += ((d.toLong, emb(0.5f), 1))
    }
    sigRows += ((32L, "ffffffff00000000")); embRows += ((32L, emb(0.9f), 1))
    // label 2: outlier in BOTH modalities → corruption, not mismatch
    for (d <- 40 to 51) {
      sigRows += ((d.toLong, "ffffffff00000000"))
      embRows += ((d.toLong, emb(0.5f), 2))
    }
    sigRows += ((52L, "3000000000000000")); embRows += ((52L, emb(0.9f), 2))
    // label 3: n = 5 < 8 — the small-group guard must mute even an
    // extreme doc (not enough mass to estimate a spread)
    for (d <- 60 to 63) {
      sigRows += ((d.toLong, "ffffffff00000000"))
      embRows += ((d.toLong, emb(0.5f), 3))
    }
    sigRows += ((64L, "0000000000000000")); embRows += ((64L, emb(0.9f), 3))
    val got = graft.operators.MultimodalQueries.crossModalOf(
      sigRows.result().toDF("doc_id", "ahash"),
      embRows.result().toDF("vec_id", "embedding", "label"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // (docs, vis_outliers, emb_outliers, mismatch, both, first_mismatch)
    assert(got(0L) == ((13L, 1L, 0L, 1L, 0L, 12L)), got(0L))
    assert(got(1L) == ((13L, 0L, 1L, 1L, 0L, 32L)), got(1L))
    assert(got(2L) == ((13L, 1L, 1L, 0L, 1L, -1L)), got(2L))
    assert(got(3L) == ((5L, 0L, 0L, 0L, 0L, -1L)), got(3L))
  }

  test("memoized frame fingerprints equal a fresh build bit-for-bit") {
    graft.sources.Tables.register(spark, sf)
    graft.sources.Tables.noteViewSwap(spark) // fresh generation: cold memo
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .sorted.toSeq
    val memoized = graft.operators.MultimodalQueries.frameSigs(spark)
    val fresh = graft.operators.MultimodalQueries
      .frameAhashSigs(spark.table("documents"))
    assert(rows(memoized) == rows(fresh),
      "memo == fresh must hold for the shared q244/q246 fingerprints")
    assert(memoized eq graft.operators.MultimodalQueries.frameSigs(spark),
      "second call must serve the cached frame")
  }
}
