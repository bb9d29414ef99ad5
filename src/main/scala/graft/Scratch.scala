package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev stage profiler (ExplainAll's timing sibling): rewritten freely per
  * investigation to time one query family's stages with the noop sink —
  * never part of any query path or gate. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.sources.Tables.register(spark, sfDir)
    spark.sql("SELECT COUNT(*) FROM lineitem WHERE l_quantity > 0").collect()

    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- q140 stage profile ----
    val w = graft.operators.DedupQueries.tfidfPostingsShared(spark)
    timed("tfidfPostings (memo build)") { noop(w) }
    timed("tfidfPostings (memo)") { noop(w) }
    println(s"[scratch] postings rows = ${w.count()}")
    val pairProd = w.as("a")
      .join(w.as("b"), $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
    println(s"[scratch] pair-join rows = ${pairProd.count()}")
    val grouped = pairProd
      .groupBy($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"), $"a.df".as("df"))
      .agg(sum($"a.tf" * $"b.tf").as("ip"))
    println(s"[scratch] grouped (pair,df) rows = ${grouped.count()}")
    timed("pair join + group") { noop(grouped) }
    val gq = graft.SparkEntry.allQueries.filter(q =>
      Set("q140_tfidf_cosine_pairs")(q.name))
    gq.foreach { g =>
      timed(g.name + " rep1") { g.run(spark, sfDir).count(): Unit }
      timed(g.name + " rep2") { g.run(spark, sfDir).count(): Unit }
    }
    spark.stop()
  }
}
