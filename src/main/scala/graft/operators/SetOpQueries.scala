package graft.operators

import org.apache.spark.sql.functions._

import graft.api.{GraftQuery, QueryModule}

/** Set operations (UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL]) and the
  * multi-statement batch façade. SURVEY.md §2B "Set operations";
  * multi-statement grounding: ClientMultiStatements/ClientMultiResults
  * capability bits (/root/reference/mysql/constants.go:57-58).
  */
object SetOpQueries extends QueryModule {

  def queries: Seq[GraftQuery] = Seq(

    q("q41_union_all",
      """SELECT k FROM (
        |  SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 100000
        |) t ORDER BY k""".stripMargin) { spark =>
      import spark.implicits._
      val a = spark.table("orders").filter($"o_orderstatus" === "F")
        .select($"o_orderkey".as("k"))
      val b = spark.table("orders").filter($"o_totalprice" > 100000)
        .select($"o_orderkey".as("k"))
      a.unionAll(b).orderBy($"k")
    },

    q("q42_union_distinct",
      """SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 100000
        |ORDER BY k""".stripMargin) { spark =>
      import spark.implicits._
      val a = spark.table("orders").filter($"o_orderstatus" === "F")
        .select($"o_orderkey".as("k"))
      val b = spark.table("orders").filter($"o_totalprice" > 100000)
        .select($"o_orderkey".as("k"))
      a.union(b).distinct().orderBy($"k")
    },

    q("q43_intersect",
      """SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'
        |INTERSECT
        |SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY k""".stripMargin) { spark =>
      import spark.implicits._
      val a = spark.table("lineitem").filter($"l_returnflag" === "R")
        .select($"l_orderkey".as("k"))
      val b = spark.table("orders").filter($"o_orderstatus" === "F")
        .select($"o_orderkey".as("k"))
      a.intersect(b).orderBy($"k")
    },

    q("q44_except",
      """SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY k""".stripMargin) { spark =>
      import spark.implicits._
      val a = spark.table("orders").filter($"o_orderstatus" === "F")
        .select($"o_orderkey".as("k"))
      val b = spark.table("lineitem").filter($"l_returnflag" === "R")
        .select($"l_orderkey".as("k"))
      a.except(b).orderBy($"k")
    },

    q("q45_intersect_all",
      """SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'A'
        |INTERSECT ALL
        |SELECT l_partkey AS k FROM lineitem WHERE l_linestatus = 'F'
        |ORDER BY k""".stripMargin) { spark =>
      import spark.implicits._
      val a = spark.table("lineitem").filter($"l_returnflag" === "A")
        .select($"l_partkey".as("k"))
      val b = spark.table("lineitem").filter($"l_linestatus" === "F")
        .select($"l_partkey".as("k"))
      a.intersectAll(b).orderBy($"k")
    },

    q("q46_except_all",
      """SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'A'
        |EXCEPT ALL
        |SELECT l_partkey AS k FROM lineitem WHERE l_linestatus = 'F'
        |ORDER BY k""".stripMargin) { spark =>
      import spark.implicits._
      val a = spark.table("lineitem").filter($"l_returnflag" === "A")
        .select($"l_partkey".as("k"))
      val b = spark.table("lineitem").filter($"l_linestatus" === "F")
        .select($"l_partkey".as("k"))
      a.exceptAll(b).orderBy($"k")
    })
}
