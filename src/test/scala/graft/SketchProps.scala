package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.MisraGries

/** Misra-Gries guarantee properties (pure sketch maths — no SparkSession):
  * under ANY partitioning of the input and merge order, (1) the counter
  * bound holds, (2) every true heavy hitter (freq > n/k) survives, (3) each
  * surviving estimate undercounts by at most n/k. These are the invariants
  * q108's exactness argument rests on (candidates ⊇ heavy hitters ⇒ the
  * exact recount + threshold is deterministic). */
object SketchProps extends Properties("Sketches") {

  private val k = 8
  // a skewed alphabet so heavy hitters actually occur
  private val token: Gen[String] =
    Gen.frequency(8 -> Gen.const("hot1"), 5 -> Gen.const("hot2"),
      3 -> Gen.const("warm"), 1 -> Gen.oneOf(
        "c1", "c2", "c3", "c4", "c5", "c6", "c7", "c8", "c9", "c10"))
  private val stream: Gen[List[String]] = Gen.listOf(token)

  private def sketchOf(chunks: List[List[String]]): Map[String, Long] = {
    val mg = new MisraGries(k)
    chunks.map(_.foldLeft(mg.zero)(mg.reduce)).foldLeft(mg.zero)(mg.merge)
  }

  property("MG bound, coverage, and estimate error under any partitioning") =
    forAll(stream, Gen.choose(1, 6)) { (ts, nChunks) =>
      val mg = new MisraGries(k)
      val size = math.max(1, ts.size / nChunks)
      val sketch = sketchOf(ts.grouped(size).toList)
      val n = ts.size.toLong
      val exact = ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val heavy = exact.collect { case (t, c) if c * k > n => t }.toSet
      val cands = mg.finish(sketch).toSet
      val bound = sketch.size <= k - 1
      val coverage = heavy.subsetOf(cands)
      val errorOk = sketch.forall { case (t, est) =>
        est <= exact(t) && (exact(t) - est) * k <= n
      }
      bound && coverage && errorOk
    }

  property("MG merge is associative on the candidate guarantee") =
    forAll(stream, stream, stream) { (a, b, c) =>
      val mg = new MisraGries(k)
      def s(xs: List[String]) = xs.foldLeft(mg.zero)(mg.reduce)
      val left = mg.merge(mg.merge(s(a), s(b)), s(c))
      val right = mg.merge(s(a), mg.merge(s(b), s(c)))
      val n = (a.size + b.size + c.size).toLong
      val exact = (a ++ b ++ c).groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toLong }
      val heavy = exact.collect { case (t, cnt) if cnt * k > n => t }.toSet
      heavy.subsetOf(left.keySet) && heavy.subsetOf(right.keySet)
    }

  // --- sign-bit quantization (q125's graft_signpack32, interpreted path;
  // the codegen path is asserted equal to the HOF fold on the fixture in
  // SimilarityDedupSpec) ---

  private val floatArr: Gen[Array[Float]] =
    Gen.choose(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-2.0f, 2.0f)).map(_.toArray))

  property("SignPack32 packs exactly the positive-element mask at any offset") =
    forAll(floatArr, Gen.oneOf(0, 32)) { (xs, off) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}
      val e = graft.functions.VectorExpressions.SignPack32(
        Literal.create(xs, ArrayType(FloatType)),
        Literal.create(off, IntegerType))
      val got = e.eval(null).asInstanceOf[Long]
      val expect = (0 until 32).foldLeft(0L) { (v, k) =>
        val j = off + k
        if (j < xs.length && xs(j) > 0f) v | (1L << k) else v
      }
      got == expect && got >= 0L && got < (1L << 32)
    }
}
