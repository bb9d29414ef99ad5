package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** Per-(session, fixture dir, view generation) cache for deterministic
  * derived relations that many queries consume unchanged — trained model
  * artifacts (k-means centroids, PQ codebooks, class prototypes) and the
  * spec-pinned shared pair relations (MinHash signatures / LSH band pairs,
  * PPJoin exact-Jaccard pairs).
  *
  * This is the `trainedMemo` pattern (r09) promoted to a shared home: the
  * r08 bench regressions were one deterministic k-means training paid five
  * times, and the identical lesson applied to the q73/q110 pair relations
  * (rebuilt inside q75/q77/q79/q101/q129/q138/q202/q213/q221 each run).
  * Every cached builder is deterministic — fixed init order, fixed
  * iteration counts, order-pinned folds, order-pinned salted bucket
  * enumeration — so memo == fresh build is spec-pinned
  * (SimilarityDedupSpec / DedupSpec assert bit equality) and memoization
  * cannot change any query result.
  *
  * Keying and lifecycle:
  *  - key = (session, [[Tables.boundDir]], kind, [[Tables.viewGeneration]]).
  *    The generation is bumped by every rebinding `Tables.register` and by
  *    `Tables.noteViewSwap`, so a rebound session can never be served a
  *    relation built from the previous binding (ADVICE r09). A never-bound
  *    session has no safe key and builds fresh.
  *  - entries hold `localCheckpoint`ed frames (bounded: signatures ≈ one
  *    row per doc, pair relations ≈ the candidate set); [[release]] drops
  *    a session's entries when `Engine.Session.close()` releases it, so a
  *    long-lived server does not retain one SparkSession per departed
  *    connection.
  *
  * At 100 TB this is exactly the "computed-once lineage" an engine should
  * expose: the pair graph is a first-class materialization consumed by the
  * survivor/component/evaluation family, not a subplan replayed per query.
  */
private[graft] object Memo {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String, Long), DataFrame]

  /** Return the cached frame for `kind` on this (session, bound dir,
    * generation), building + localCheckpoint-ing it on first use. Unbound
    * sessions build fresh (still checkpointed — every caller is
    * multi-consumer).
    *
    * Get-then-putIfAbsent, NOT computeIfAbsent: builders nest (the LSH
    * pair build consumes the signature memo), and ConcurrentHashMap
    * forbids a recursive update from inside a computeIfAbsent mapping
    * function (IllegalStateException when the keys share a bin — caught
    * by DedupSpec's cold-map memo case). The relaxed pattern means two
    * racing threads may both run a build; both builds are deterministic
    * and the loser's checkpoint is simply dropped, so this trades a rare
    * duplicated job for deadlock-freedom. */
  def cached(spark: SparkSession, kind: String)(
      build: => DataFrame): DataFrame = {
    val dir = Tables.boundDir(spark)
    if (dir.isEmpty) build.localCheckpoint()
    else {
      val key = (spark, dir, kind, Tables.viewGeneration(spark))
      val hit = cache.get(key)
      if (hit != null) hit
      else {
        val built = build.localCheckpoint() // may re-enter cached()
        val prev = cache.putIfAbsent(key, built)
        if (prev != null) prev else built
      }
    }
  }

  /** Drop every relation cached for `spark` — see [[cached]]. */
  def release(spark: SparkSession): Unit = {
    val it = cache.keySet.iterator
    while (it.hasNext) if (it.next()._1 eq spark) it.remove()
  }

  /** Drop `spark`'s entries whose generation key is below `gen`. Swept by
    * every generation bump (`Tables.noteViewSwap` / rebinding `register`):
    * entries keyed on an older generation can never be served again — the
    * lookup key always carries the current generation — so without this a
    * long-lived connection interleaving LOAD DATA with memoized queries
    * accumulates unreachable localCheckpoint'ed frames until close()
    * (ADVICE r11). */
  private[graft] def releaseStale(spark: SparkSession, gen: Long): Unit = {
    val it = cache.keySet.iterator
    while (it.hasNext) {
      val k = it.next()
      if ((k._1 eq spark) && k._4 < gen) it.remove()
    }
  }

  /** Number of relations cached for `spark` — the EngineSpec abandon-path
    * probe (a leaked session's entries must not survive a registry sweep). */
  private[graft] def entriesFor(spark: SparkSession): Int = {
    var n = 0
    val it = cache.keySet.iterator
    while (it.hasNext) if (it.next()._1 eq spark) n += 1
    n
  }
}
