package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Block-local entity-resolution closure (q183's golden-record clustering).
  *
  * The ER pipeline enumerates candidates inside BLOCKS (exact (name, type)
  * agreement — the Fellegi-Sunter blocking strategy the reference's clients
  * run behind the relay, /root/reference/gateway/relay.go:47-99), and every
  * match edge therefore has both endpoints in one salt-capped block chunk.
  * Connected components of such a graph never span chunks, so the closure
  * can run PER CHUNK over a ≤cap member array — one bounded expression
  * call per chunk row — instead of a distributed label-propagation fixpoint
  * whose O(log d) rounds each cost a full join + materialization + action
  * (12 rounds at sf0.1; the round count, not the data, dominated q183's
  * wall-clock). Equivalence to the fixpoint over chunk-confined edges is
  * exact: same edges, same transitive closure, same min-id labels.
  *
  * Input: `array<struct<id:long, size:int, price:double>>`, sorted by id
  * (the caller's `sort_array(collect_list(...))` — makes the evaluation a
  * pure function of the member SET, partition-order invariant). Members
  * match when `|size_a − size_b| <= sizeTol` and
  * `abs(price_a − price_b) / max(price_a, price_b) <= priceTol` — spelled
  * as the same IEEE double operations as the SQL predicate
  * (`abs(..) / greatest(..)`), so the closure agrees bit-for-bit with the
  * DuckDB oracle's recursive-CTE closure over the same pairs.
  * Output: `array<struct<id:long, component:long>>` with component = min
  * member id of the connected component, EXCLUDING singletons (a node with
  * no match edge never enters the pair graph the fixpoint labeled either).
  *
  * Union-find with path compression: O(k²) predicate checks per chunk
  * (k ≤ cap = 256 → ≤32k cheap comparisons), O(k α(k)) unions. Interpreted
  * eval (CodegenFallback) is deliberate — the expression runs once per
  * CHUNK row (corpus/cap rows total), never per corpus row, so codegen
  * would buy nothing measurable.
  */
case class LinkageComponents(child: Expression, sizeTol: Int,
    priceTol: Double) extends UnaryExpression with CodegenFallback {

  private val memberType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("size", IntegerType, nullable = false),
    StructField("price", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 3 && s(0).dataType == LongType &&
          s(1).dataType == IntegerType && s(2).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<id:long, size:int, price:double>>, " +
        s"got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("component", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_linkage_components"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = arr.numElements()
    val ids = new Array[Long](k)
    val sizes = new Array[Int](k)
    val prices = new Array[Double](k)
    var i = 0
    while (i < k) {
      val m = arr.getStruct(i, 3)
      ids(i) = m.getLong(0)
      sizes(i) = m.getInt(1)
      prices(i) = m.getDouble(2)
      i += 1
    }
    val parent = Array.tabulate(k)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val matched = new Array[Boolean](k)
    i = 0
    while (i < k) {
      var j = i + 1
      while (j < k) {
        // the SQL rule verbatim: abs(Δsize) <= tol AND
        // abs(Δprice) / greatest(price_a, price_b) <= tol — same IEEE ops
        if (math.abs(sizes(i) - sizes(j)) <= sizeTol &&
            math.abs(prices(i) - prices(j)) /
              math.max(prices(i), prices(j)) <= priceTol) {
          matched(i) = true; matched(j) = true
          val (ri, rj) = (find(i), find(j))
          if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
        }
        j += 1
      }
      i += 1
    }
    // component label = min member id of the root set; ids are sorted
    // ascending, so the smallest member INDEX under a root carries it
    val label = new Array[Long](k)
    java.util.Arrays.fill(label, Long.MaxValue)
    i = 0
    while (i < k) {
      val r = find(i)
      if (ids(i) < label(r)) label(r) = ids(i)
      i += 1
    }
    val out = Array.newBuilder[InternalRow]
    i = 0
    while (i < k) {
      if (matched(i)) out += InternalRow(ids(i), label(find(i)))
      i += 1
    }
    new GenericArrayData(out.result().asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LinkageComponents {
  /** Column API: per-chunk ER closure over a sorted member array. */
  def apply(members: Column, sizeTol: Int, priceTol: Double): Column =
    Bridge.column(new LinkageComponents(Bridge.expression(members),
      sizeTol, priceTol))
}
