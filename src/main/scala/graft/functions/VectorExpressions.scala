package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, NullType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector-similarity hot path
  * (SURVEY.md §7.3: a codegen'd `Expression` beats the interpreted
  * higher-order-function pipeline by ~10× on the O(n²) scoring stages).
  *
  * Semantics deliberately match the HOF/oracle formulation bit-for-bit:
  * a strict left-to-right fold `((0 + x0·y0) + x1·y1) + …`, the same
  * association order as DuckDB's `list_dot_product` over DOUBLE[] — so
  * queries using this expression stay hash-checkable against the oracle.
  *
  * Fixture embeddings contain no null elements; element nulls read as 0.0
  * via ArrayData.getDouble (documented engine restriction — declared-schema
  * vectors are non-null by contract, §1.3).
  */
object VectorExpressions {

  /** dot(a, b) over ArrayType(DoubleType) OR ArrayType(FloatType) (mixed
    * allowed), whole-stage-codegen'd. Float elements widen to double before
    * multiplying — an EXACT conversion, so scoring the raw parquet
    * `array<float>` column bit-matches DuckDB's
    * `list_dot_product(CAST(embedding AS DOUBLE[]), …)` while keeping the
    * scan's primitive UnsafeArrayData in the hot loop (no per-row
    * transform()-built boxed arrays — the r02 q81 regression). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    private def elemOk(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    private def isFloat(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(left.dataType) && elemOk(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double|float> arguments, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val lf = isFloat(left.dataType)
      val rf = isFloat(right.dataType)
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0d
      var i = 0
      while (i < n) {
        val xe = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val ye = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xe * ye
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val xe =
          if (isFloat(left.dataType)) s"(double) $x.getFloat($i)"
          else s"$x.getDouble($i)"
        val ye =
          if (isFloat(right.dataType)) s"(double) $y.getFloat($i)"
          else s"$y.getDouble($i)"
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $xe * $ye;
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column API: dot product of two double-array columns. */
  def dotd(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** First 16 lowercase-hex chars of a digest string packed into one signed
    * 64-bit long, nibble 0 highest: bit `(b%4)` of hex nibble `(b/4)` — the
    * SimHash vote-bit convention — is `(packed >> ((15 - b/4)*4 + b%4)) & 1`.
    * One pass over the string, zero allocations — replaces r02's 16
    * `ascii(substring(h, i, 1))` slices per token (q78 regressed 1.9× on
    * that decode, VERDICT r02 §wrong-2). Input must be lowercase hex
    * (Spark's `md5` output); behavior on other characters is undefined. */
  case class HexPack16(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hexpack16"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      if (s.numBytes() < 16) throw HexPack16.tooShort(s.numBytes())
      var v = 0L
      var i = 0
      while (i < 16) {
        val c = s.getByte(i)
        v = (v << 4) | (if (c >= 'a') c - ('a' - 10) else c - '0').toLong
        i += 1
      }
      v
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, h => {
        val v = ctx.freshName("v")
        val i = ctx.freshName("i")
        val c = ctx.freshName("c")
        s"""
           |if ($h.numBytes() < 16) {
           |  throw new IllegalArgumentException(
           |    "graft_hexpack16 requires at least 16 hex chars, got " + $h.numBytes());
           |}
           |long $v = 0L;
           |for (int $i = 0; $i < 16; $i++) {
           |  byte $c = $h.getByte($i);
           |  $v = ($v << 4) | (long) ($c >= 97 ? $c - 87 : $c - 48);
           |}
           |${ev.value} = $v;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object HexPack16 {
    /** Shared by interpreted and generated code: inputs shorter than 16
      * bytes would be an out-of-bounds unsafe read — reject them instead
      * (the function contract is "a digest string", always ≥ 32 hex chars). */
    def tooShort(n: Int): IllegalArgumentException =
      new IllegalArgumentException(
        s"graft_hexpack16 requires at least 16 hex chars, got $n")
  }

  /** Column API: pack the first 16 hex chars of a digest string into a long. */
  def hexPack16(c: Column): Column =
    Bridge.column(HexPack16(Bridge.expression(c)))

  /** 32 sign bits of `left[offset … offset+31]` packed into one long —
    * bit k set iff element `offset+k` > 0 (q125's binary-quantization
    * code; two calls cover a 64-dim vector). Replaces the interpreted
    * `aggregate(sequence(…))` fold — per-row O(d) lambda interpretation in
    * the code-build scan — with one codegen'd loop over the scan's
    * primitive UnsafeArrayData, the same move DotProduct makes for the
    * scoring stage. Bit semantics identical to the fold (element j weights
    * 2^(j−offset)); elements past the array end read as 0-bits. `right`
    * must be a foldable int (the offset). */
  case class SignPack32(left: Expression, right: Expression)
      extends BinaryExpression {

    private def isFloat: Boolean = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def checkInputDataTypes(): TypeCheckResult = (left.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }, right.dataType) match {
      case (true, org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double|float>, int), got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_signpack32"

    override def nullSafeEval(a: Any, o: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val off = o.asInstanceOf[Int]
      val n = x.numElements()
      var v = 0L
      var k = 0
      while (k < 32) {
        val j = off + k
        if (j >= 0 && j < n) {
          val e = if (isFloat) x.getFloat(j).toDouble else x.getDouble(j)
          if (e > 0d) v |= 1L << k
        }
        k += 1
      }
      v
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, o) => {
        val n = ctx.freshName("n")
        val k = ctx.freshName("k")
        val j = ctx.freshName("j")
        val v = ctx.freshName("v")
        val e = ctx.freshName("e")
        val read =
          if (isFloat) s"(double) $x.getFloat($j)" else s"$x.getDouble($j)"
        s"""
           |int $n = $x.numElements();
           |long $v = 0L;
           |for (int $k = 0; $k < 32; $k++) {
           |  int $j = $o + $k;
           |  if ($j >= 0 && $j < $n) {
           |    double $e = $read;
           |    if ($e > 0.0) $v |= 1L << $k;
           |  }
           |}
           |${ev.value} = $v;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column API: pack 32 sign bits starting at `offset` (0-based). */
  def signPack32(a: Column, offset: Column): Column =
    Bridge.column(SignPack32(Bridge.expression(a), Bridge.expression(offset)))

  /** q244's perceptual frame fingerprint: 16 lowercase-hex chars encoding
    * 64 aHash bits over an ≤256-byte ASCII frame — cell c (0-based) sums
    * bytes 4c..4c+3 (missing tail bytes read 0), bit c = cell_c·64 > total,
    * nibble j packs bits 4j..4j+3 (first bit highest). Bit-identical to the
    * interpreted spelling `ascii(substring(frame, p, 1))` sums + the CASE
    * nibble build (the committed DuckDB oracle chain) on ASCII input —
    * the fixture contract (q92's octet_length == length assert); non-ASCII
    * frames are outside the contract like HexPack16's non-hex input. One
    * pass, zero boxing — replaces 256 interpreted HOF lambda calls per
    * frame (q244 measured 3.1 s at sf0.1 on the lambda spelling). */
  case class Ahash16(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_ahash16"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      val n = math.min(s.numBytes(), 256)
      val cells = new Array[Int](64)
      var i = 0
      while (i < n) { cells(i >> 2) += s.getByte(i) & 0xff; i += 1 }
      var total = 0
      i = 0
      while (i < 64) { total += cells(i); i += 1 }
      val out = new Array[Byte](16)
      var j = 0
      while (j < 16) {
        var nib = 0
        var b = 0
        while (b < 4) {
          nib = (nib << 1) | (if (cells(j * 4 + b) * 64 > total) 1 else 0)
          b += 1
        }
        out(j) = Ahash16.hexDigits(nib)
        j += 1
      }
      UTF8String.fromBytes(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, in => {
        val n = ctx.freshName("n")
        val cells = ctx.freshName("cells")
        val total = ctx.freshName("total")
        val out = ctx.freshName("out")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val b = ctx.freshName("b")
        val nib = ctx.freshName("nib")
        s"""
           |int $n = java.lang.Math.min($in.numBytes(), 256);
           |int[] $cells = new int[64];
           |for (int $i = 0; $i < $n; $i++) {
           |  $cells[$i >> 2] += $in.getByte($i) & 0xFF;
           |}
           |int $total = 0;
           |for (int $i = 0; $i < 64; $i++) $total += $cells[$i];
           |byte[] $out = new byte[16];
           |for (int $j = 0; $j < 16; $j++) {
           |  int $nib = 0;
           |  for (int $b = 0; $b < 4; $b++) {
           |    $nib = ($nib << 1) | (($cells[$j * 4 + $b] * 64 > $total) ? 1 : 0);
           |  }
           |  // inline hex digit: a nested Scala object's method is not
           |  // addressable as plain Java (Janino failed on
           |  // VectorExpressions.Ahash16.hexDigit and Spark silently fell
           |  // back to interpreted eval — caught via the probe's codegen
           |  // CompileException log)
           |  $out[$j] = (byte) ($nib < 10 ? 48 + $nib : 87 + $nib);
           |}
           |${ev.value} = UTF8String.fromBytes($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object Ahash16 {
    private[functions] val hexDigits: Array[Byte] =
      "0123456789abcdef".getBytes("US-ASCII")
  }

  /** Column API: 16-hex-char perceptual aHash of an ASCII frame string. */
  def ahash16(c: Column): Column =
    Bridge.column(Ahash16(Bridge.expression(c)))

  /** In-bucket verified pair enumeration for packed 64-bit signatures:
    * input is one salt chunk's member list `array<struct<id:long, pk:long>>`
    * (sorted by the caller — id-ascending, so emitted pairs satisfy
    * id_a < id_b exactly like the oracle's `a.doc_id < b.doc_id`), output
    * is `array<struct<id_a, id_b, hamming>>` of ONLY the pairs whose
    * popcount(pk_a XOR pk_b) ≤ tau.
    *
    * Replaces the enumerate-everything shape (interpreted HOF pair build →
    * distinct exchange over EVERY in-bucket pair → two joins back to the
    * signature relation → popcount filter) with one compiled double loop
    * per bucket: the C(chunk,2) combinations are scanned at compiled-loop
    * speed and only verified survivors are ever materialized, shuffled, or
    * deduped. q244's fixture volume: 1.24M candidate combinations → the
    * handful of true ≤τ pairs; the 1.24M-row distinct + two verify joins
    * disappear from the plan. The emitted hamming is the same
    * `bit_count(xor(...))` the join-based verify computed, so downstream
    * filters/aggregations are unchanged. `tau` must be foldable. */
  case class HammingClosePairs(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    private def memberOk: Boolean = left.dataType match {
      case ArrayType(StructType(fields), _) if fields.length == 2 =>
        fields(0).dataType == LongType && fields(1).dataType == LongType
      case _ => false
    }

    override def checkInputDataTypes(): TypeCheckResult =
      if (memberOk && right.dataType == org.apache.spark.sql.types.IntegerType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<struct<long, long>>, int), got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false),
      StructField("hamming", org.apache.spark.sql.types.IntegerType,
        nullable = false))), containsNull = false)
    override def prettyName: String = "graft_hamming_close_pairs"

    override def nullSafeEval(a: Any, t: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val tau = t.asInstanceOf[Int]
      val n = arr.numElements()
      val ids = new Array[Long](n)
      val pks = new Array[Long](n)
      var i = 0
      while (i < n) {
        val s = arr.getStruct(i, 2)
        ids(i) = s.getLong(0)
        pks(i) = s.getLong(1)
        i += 1
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val h = java.lang.Long.bitCount(pks(i) ^ pks(j))
          if (h <= tau)
            out += new GenericInternalRow(Array[Any](ids(i), ids(j), h))
          j += 1
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column API: verified (id_a, id_b, hamming ≤ tau) pairs of one sorted
    * salt-chunk member list of packed signatures. */
  def hammingClosePairs(members: Column, tau: Column): Column =
    Bridge.column(HammingClosePairs(
      Bridge.expression(members), Bridge.expression(tau)))

  /** q140's deterministic idf² fold in ONE compiled pass: input is a
    * `(d, s)`-sorted `array<struct<d:long, s:long>>` of per-shingle integer
    * products tagged with the shingle's df, plus the corpus size n; output
    * is Σ over df runs (ascending) of `(Σ s in run)·ln²(n/d)`, accumulated
    * left-to-right from 0.0.
    *
    * Bit-identical to the oracle's two-level spelling (exact BIGINT partial
    * sums per df via `SUM(...)`, then `list_reduce(list_transform(
    * list_sort(...)))` over one struct per df): long addition inside a run
    * is order-independent and exact, the run sum is cast to double exactly
    * like `CAST(x.s AS DOUBLE)`, each term is `(s·ln(n/d))·ln(n/d)` in the
    * same association, and runs are visited df-ascending because the caller
    * sorts by (d, s). Replaces a per-df HashAggregate + second exchange +
    * interpreted HOF fold over ~1.1M pair arrays with one collect per pair
    * and this compiled walk. */
  case class IdfRunFold(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    private def memberOk: Boolean = left.dataType match {
      case ArrayType(StructType(fields), _) if fields.length == 2 =>
        fields(0).dataType == LongType && fields(1).dataType == LongType
      case _ => false
    }

    override def checkInputDataTypes(): TypeCheckResult =
      if (memberOk && right.dataType == DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<struct<long, long>>, double), got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_idf_run_fold"

    override def nullSafeEval(a: Any, nAny: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val n = nAny.asInstanceOf[Double]
      val m = arr.numElements()
      var acc = 0.0
      var i = 0
      while (i < m) {
        val d = arr.getStruct(i, 2).getLong(0)
        var run = 0L
        while (i < m && arr.getStruct(i, 2).getLong(0) == d) {
          run += arr.getStruct(i, 2).getLong(1)
          i += 1
        }
        val l = java.lang.Math.log(n / d)
        acc = acc + run.toDouble * l * l
      }
      acc
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column API: df-run idf² fold of a (d, s)-sorted product array. */
  def idfRunFold(arr: Column, n: Column): Column =
    Bridge.column(IdfRunFold(Bridge.expression(arr), Bridge.expression(n)))

  /** q189's greedy MMR selection over ONE probe's bounded candidate set,
    * compiled: inputs are the cid-sorted candidates
    * `array<struct<cid:long, rel:double>>` (rel already r4-rounded — the
    * cosine invariant), the candidate-pair sims
    * `array<struct<a:long, b:long, sim:double>>` (also r4-rounded), and k;
    * output is `array<struct<sel_rank:int, cid:long, sc:double>>` in
    * selection order.
    *
    * Exactly the unrolled relational greedy the oracle replays: round 1
    * scores every candidate `0.7·rel − 0.3·0.0` (spelled with the
    * multiply-by-zero so the doubles match the CTE bit-for-bit), rounds
    * 2..k score unselected candidates `0.7·rel − 0.3·max_sim_to_selected`
    * (MAX over doubles — order-independent), and each round picks by
    * (sc DESC, cid ASC) — iterating cid-ascending and updating only on
    * strictly-greater sc reproduces the row_number tie-break. Replaces the
    * per-round checkpoint + window + anti-join/max-join chain (k Spark job
    * rounds over ≤ |probes|·16 rows) with one expression eval per probe. */
  case class MmrGreedy(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression with CodegenFallback {

    private def candsOk: Boolean = first.dataType match {
      case ArrayType(StructType(f), _) if f.length == 2 =>
        f(0).dataType == LongType && f(1).dataType == DoubleType
      case _ => false
    }
    private def pairsOk: Boolean = second.dataType match {
      case ArrayType(StructType(f), _) if f.length == 3 =>
        f(0).dataType == LongType && f(1).dataType == LongType &&
          f(2).dataType == DoubleType
      case _ => false
    }

    override def checkInputDataTypes(): TypeCheckResult =
      if (candsOk && pairsOk &&
          third.dataType == org.apache.spark.sql.types.IntegerType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<struct<long, double>>, " +
          s"array<struct<long, long, double>>, int), got " +
          s"${first.dataType.simpleString} / ${second.dataType.simpleString}" +
          s" / ${third.dataType.simpleString}")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("sel_rank", org.apache.spark.sql.types.IntegerType,
        nullable = false),
      StructField("cid", LongType, nullable = false),
      StructField("sc", DoubleType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "graft_mmr_greedy"

    override def nullSafeEval(c: Any, p: Any, kAny: Any): Any = {
      val cArr = c.asInstanceOf[ArrayData]
      val pArr = p.asInstanceOf[ArrayData]
      val k = kAny.asInstanceOf[Int]
      val n = cArr.numElements()
      val cids = new Array[Long](n)
      val rels = new Array[Double](n)
      var i = 0
      while (i < n) {
        val s = cArr.getStruct(i, 2)
        cids(i) = s.getLong(0)
        rels(i) = s.getDouble(1)
        i += 1
      }
      val idxOf = scala.collection.mutable.LongMap.empty[Int]
      i = 0
      while (i < n) { idxOf(cids(i)) = i; i += 1 }
      val sim = Array.ofDim[Double](n, n)
      val m = pArr.numElements()
      i = 0
      while (i < m) {
        val s = pArr.getStruct(i, 3)
        sim(idxOf(s.getLong(0)))(idxOf(s.getLong(1))) = s.getDouble(2)
        i += 1
      }
      val picked = new Array[Boolean](n)
      val out = new Array[Any](math.min(k, n))
      var t = 0
      while (t < out.length) {
        var bestIdx = -1
        var bestSc = 0.0
        i = 0
        while (i < n) {
          if (!picked(i)) {
            var msim = 0.3 * 0.0 // round 1's literal zero term
            if (t > 0) {
              var mx = Double.NegativeInfinity
              var j = 0
              while (j < n) {
                if (picked(j) && sim(i)(j) > mx) mx = sim(i)(j)
                j += 1
              }
              msim = 0.3 * mx
            }
            val sc = 0.7 * rels(i) - msim
            // cid-ascending scan + strictly-greater update == row_number
            // over (sc DESC, cid ASC)
            if (bestIdx < 0 || sc > bestSc) { bestIdx = i; bestSc = sc }
          }
          i += 1
        }
        picked(bestIdx) = true
        out(t) = new GenericInternalRow(
          Array[Any](t + 1, cids(bestIdx), bestSc))
        t += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** Column API: greedy MMR selection over one probe's candidate arrays. */
  def mmrGreedy(cands: Column, pairs: Column, k: Column): Column =
    Bridge.column(MmrGreedy(Bridge.expression(cands),
      Bridge.expression(pairs), Bridge.expression(k)))

  /** q109b's per-document NLL fold, compiled: input is the sorted
    * `array<struct<bigram:string, c:long, n12:long, n1:long>>` of the
    * doc's DISTINCT bigrams with their in-doc instance count c; output
    * replays the per-instance interpreted HOF spelling exactly —
    * `acc = (acc + ln(n1)) − ln(n12)` left-to-right from 0.0, applied c
    * times per element (instances of one bigram are adjacent in the
    * instance-sorted order and carry identical counts, so the repeat loop
    * reproduces the same double sequence), the same java.lang.Math.log
    * Catalyst's log() calls — at compiled-loop speed. */
  case class LogRatioFold(child: Expression) extends UnaryExpression
      with CodegenFallback {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StructType(f), _) if f.length == 4 &&
          f(1).dataType == LongType && f(2).dataType == LongType &&
          f(3).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<_, long, long, long>>, got " +
          other.simpleString)
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_log_ratio_fold"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      var acc = 0.0
      var i = 0
      while (i < m) {
        val s = arr.getStruct(i, 4)
        val l1 = java.lang.Math.log(s.getLong(3).toDouble)
        val l12 = java.lang.Math.log(s.getLong(2).toDouble)
        var r = s.getLong(1)
        while (r > 0) { acc = (acc + l1) - l12; r -= 1 }
        i += 1
      }
      acc
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: (acc + ln n1) − ln n12 left fold, c repeats per element. */
  def logRatioFold(arr: Column): Column =
    Bridge.column(LogRatioFold(Bridge.expression(arr)))

  /** q247's whole sample-side anisotropy diagnostic in ONE compiled fold:
    * input is the vec_id-sorted sample `array<struct<id, array<double|float>>>`
    * (sort_array(collect_list(...)) — the caller establishes the order),
    * output is struct(tr, nrm, mu2) = (covariance trace, round-4
    * power-iteration norm = λ₁ estimate, ‖μ‖²).
    *
    * Every accumulation is the oracle's exact double sequence — a strict
    * 0.0-seeded left fold in the same element order DuckDB's
    * `list_reduce(list_prepend(0.0, list_transform(list_sort(...), …)))`
    * replays: sample mean per dim over vec_id-ascending rows, centered
    * covariance cell (i,j) over the same row order, per-round matvec over
    * j-ascending, norm over i-ascending, trace over i-ascending, ‖μ‖² over
    * dim-ascending. Divisions are double/long exactly like the oracle's
    * `/ CAST(COUNT(*) AS BIGINT)`. Replaces a ~15-job chain (5
    * localCheckpoints + 4 rounds × 2 jobs) with one expression eval on a
    * single collected row — the sample is bounded (512×d), so this is
    * driver-scale work by design at any corpus size.
    *
    * Float elements widen to double before any arithmetic (exact), so the
    * raw parquet `array<float>` column feeds it without a per-row cast
    * over the corpus. Evaluated once per query on one row: interpreted
    * eval (CodegenFallback) is the right cost point, no codegen needed. */
  case class AnisotropyDiag(child: Expression) extends UnaryExpression
      with CodegenFallback {

    private def embType: DataType = child.dataType match {
      case ArrayType(StructType(fields), _) if fields.length == 2 =>
        fields(1).dataType
      case _ => NullType
    }
    private def isFloat: Boolean = embType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def checkInputDataTypes(): TypeCheckResult = embType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<id, array<double|float>>>, got " +
          child.dataType.simpleString)
    }
    override def dataType: DataType = StructType(Seq(
      StructField("tr", DoubleType, nullable = false),
      StructField("nrm", DoubleType, nullable = false),
      StructField("mu2", DoubleType, nullable = false)))
    override def prettyName: String = "graft_anisotropy_diag"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val flt = isFloat
      // centered sample matrix, rows in the caller's (vec_id) order
      val first = if (n == 0) null else arr.getStruct(0, 2).getArray(1)
      val d = if (first == null) 0 else first.numElements()
      val x = Array.ofDim[Double](n, d)
      var r = 0
      while (r < n) {
        val e = arr.getStruct(r, 2).getArray(1)
        var j = 0
        while (j < d) {
          x(r)(j) = if (flt) e.getFloat(j).toDouble else e.getDouble(j)
          j += 1
        }
        r += 1
      }
      // mean per dim: left fold over rows, then / n (double / long)
      val mu = new Array[Double](d)
      var j = 0
      while (j < d) {
        var s = 0.0
        r = 0
        while (r < n) { s += x(r)(j); r += 1 }
        mu(j) = s / n
        j += 1
      }
      // center in place
      r = 0
      while (r < n) {
        j = 0
        while (j < d) { x(r)(j) -= mu(j); j += 1 }
        r += 1
      }
      // covariance cell (i,j): left fold of products over rows, / n
      val cov = Array.ofDim[Double](d, d)
      var i = 0
      while (i < d) {
        j = 0
        while (j < d) {
          var s = 0.0
          r = 0
          while (r < n) { s += x(r)(i) * x(r)(j); r += 1 }
          cov(i)(j) = s / n
          j += 1
        }
        i += 1
      }
      // 4 power-iteration rounds from the all-ones start
      val v = Array.fill(d)(1.0)
      val w = new Array[Double](d)
      var nrm = 0.0
      var round = 0
      while (round < 4) {
        i = 0
        while (i < d) {
          var s = 0.0
          j = 0
          while (j < d) { s += cov(i)(j) * v(j); j += 1 }
          w(i) = s
          i += 1
        }
        var s2 = 0.0
        i = 0
        while (i < d) { s2 += w(i) * w(i); i += 1 }
        nrm = math.sqrt(s2)
        j = 0
        while (j < d) { v(j) = w(j) / nrm; j += 1 }
        round += 1
      }
      var tr = 0.0
      i = 0
      while (i < d) { tr += cov(i)(i); i += 1 }
      var mu2 = 0.0
      j = 0
      while (j < d) { mu2 += mu(j) * mu(j); j += 1 }
      new GenericInternalRow(Array[Any](tr, nrm, mu2))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: the q247 diagnostic fold over a vec-sorted sample array. */
  def anisotropyDiag(c: Column): Column =
    Bridge.column(AnisotropyDiag(Bridge.expression(c)))
}
