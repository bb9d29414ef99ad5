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
}
