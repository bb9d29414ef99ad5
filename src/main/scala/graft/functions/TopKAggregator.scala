package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2B "UDF/UDAF/UDTF", §7.3): bounded top-k
  * by score as an `Aggregator[IN, BUF, OUT]`.
  *
  * This is the scale path for per-key top-k: a window `ROW_NUMBER() <= k`
  * must sort every partition's full candidate list, while this aggregator
  * keeps at most k elements per partial buffer, combines map-side, and
  * shuffles only k rows per key — the same partial/final split Spark gives
  * built-in aggregates.
  *
  * Ordering matches the exact top-k queries: score DESC, id ASC tiebreak.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
    s.sortWith(better).take(k)

  override def zero: Seq[(Long, Double)] = Nil
  override def reduce(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] =
    trim(a +: b)
  override def merge(x: Seq[(Long, Double)], y: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(x ++ y)
  override def finish(r: Seq[(Long, Double)]): Seq[(Long, Double)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufferEncoder
}
