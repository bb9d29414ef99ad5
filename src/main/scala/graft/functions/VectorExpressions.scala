package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
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
}
