package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed, MERGEABLE Aggregator — the
  * §2B "imperative UDAF with a sketch buffer" row (the buffer is a bounded
  * counter map, not a scalar): at most `k − 1` counters regardless of input
  * cardinality, so a 100 TB token stream aggregates in one map-side-
  * combinable pass with O(k) state per partition instead of a
  * full-cardinality shuffle.
  *
  * Algorithm (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS'12): on overflow subtract the evicting count from every
  * counter and drop non-positive ones; merging sums counter maps and
  * re-shrinks the same way. Guarantee: every item with true frequency
  * > n/k SURVIVES in the sketch, and each surviving estimate undercounts by
  * at most n/k. The candidate set may vary with merge order (only the
  * guarantee is deterministic), so oracle-checked queries must recount
  * candidates exactly and filter on the true threshold — candidates ⊇ true
  * heavy hitters makes that final answer exact and order-independent
  * (TextQueries q108).
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k > 1, s"sketch width must exceed 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    shrink(b.updated(tok, b.getOrElse(tok, 0L) + 1L))

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val summed = y.foldLeft(x) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    shrink(summed)
  }

  /** Restore the ≤ k−1 counter bound: subtract the k-th largest count from
    * every counter and drop non-positives (removes ≥ 1 entry per call; the
    * total subtracted mass is what the n/k error bound accounts for). */
  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size < k) m
    else {
      val kth = m.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
      m.collect { case (t, c) if c > kth => t -> (c - kth) }
    }

  /** Surviving candidates; a SET (sorted only for readability) — estimates
    * are intentionally not exposed, the exact recount is the contract. */
  override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
