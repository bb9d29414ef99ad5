package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck property tests (SURVEY.md §5.2.2) — the generalization of the
  * reference's randomized framing tests
  * (/root/reference/mysql/conn_test.go:67-74): random micro-tables, algebraic
  * invariants that must hold for every input.
  */
object RelationalLawsProps extends Properties("RelationalLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10) // each case runs Spark jobs — keep bounded

  private def spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def df(xs: List[(Int, Int)]): DataFrame = {
    val s = spark
    import s.implicits._
    xs.toDF("k", "v")
  }

  private val rows: Gen[List[(Int, Int)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 9), Gen.choose(0, 99)))

  property("unionAll counts add") = forAll(rows, rows) { (a, b) =>
    df(a).unionAll(df(b)).count() == a.size + b.size
  }

  property("union-distinct equals set union") = forAll(rows, rows) { (a, b) =>
    df(a).union(df(b)).distinct().count() == (a.toSet ++ b.toSet).size
  }

  property("exceptAll ⊎ intersectAll partitions the left bag") =
    forAll(rows, rows) { (a, b) =>
      val l = df(a)
      val r = df(b)
      l.exceptAll(r).count() + l.intersectAll(r).count() == a.size
    }

  property("semi-join keys ⊆ distinct inner-join keys, anti is complement") =
    forAll(rows, rows) { (a, b) =>
      val l = df(a)
      val r = df(b)
      val semi = l.join(r, Seq("k"), "left_semi")
      val anti = l.join(r, Seq("k"), "left_anti")
      semi.count() + anti.count() == a.size &&
        semi.select("k").distinct().count() ==
          l.join(r, Seq("k")).select("k").distinct().count()
    }

  property("row_number over a total order is a permutation of 1..n") =
    forAll(rows) { a =>
      val w = Window.orderBy(col("k"), col("v"), monotonically_increasing_id())
      val rns = df(a).withColumn("rn", row_number().over(w))
        .select("rn").collect().map(_.getInt(0)).sorted
      rns.toSeq == (1 to a.size)
    }

  property("groupBy sum equals per-key reference sum") = forAll(rows) { a =>
    val got = df(a).groupBy("k").agg(sum("v").as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = a.groupBy(_._1).view.mapValues(_.map(_._2.toLong).sum).toMap
    got == want
  }

  property("TopKByScore equals sort-take on any input") =
    forAll(Gen.listOfN(40, Gen.zip(Gen.choose(0L, 20L), Gen.choose(0, 50)))) { xs =>
      val s = spark
      import s.implicits._
      val topk = udaf(new graft.functions.TopKByScore(5))
      val got = xs.map { case (id, sc) => (1, id, sc.toDouble) }
        .toDF("g", "id", "score")
        .groupBy("g").agg(topk(col("id"), col("score")).as("top"))
        .select(explode(col("top")).as("p")).select("p._1", "p._2")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
      val want = xs.map { case (id, sc) => (id, sc.toDouble) }
        .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)).take(5)
      got == want
    }

  property("sqlBatch returns one result set per non-empty statement") =
    forAll(Gen.choose(1, 5)) { n =>
      val sql = (1 to n).map(i => s"SELECT $i AS x").mkString("; ")
      val res = Engine.sqlBatch(spark, sql)
      res.size == n && res.zipWithIndex.forall { case (d, i) =>
        d.head().getInt(0) == i + 1
      }
    }
}
