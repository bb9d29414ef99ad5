package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
      println(f"[scratch] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- q109b stage profile ----
    val bg = graft.sources.Tables.spread(spark.table("documents"))
      .select($"doc_id", split(lower($"text"), " ").as("toks"))
      .select($"doc_id", explode(transform(
        graft.api.Canon.seq1(size($"toks") - 1),
        i => concat_ws(" ", element_at($"toks", i), element_at($"toks", i + 1))))
        .as("bigram"))
    println(s"[scratch] bigram instances = ${bg.count()}")
    println(s"[scratch] distinct (doc,bigram) = ${bg.distinct().count()}")
    timed("bg explode alone") { noop(bg) }
    val c12 = bg.groupBy($"bigram").agg(count(lit(1)).as("n12"))
    timed("c12") { noop(c12) }
    val c1 = bg.select(split($"bigram", " ").getItem(0).as("w1"))
      .groupBy($"w1").agg(count(lit(1)).as("n1"))
    timed("c1") { noop(c1) }
    val joined = bg.join(broadcast(c12), "bigram")
      .join(broadcast(c1), split(bg("bigram"), " ").getItem(0) === c1("w1"))
    timed("joined (bg + both broadcasts)") { noop(joined) }
    val grouped = joined.groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"bigram", $"n12", $"n1"))).as("tl"))
    timed("grouped collect+sort") { noop(grouped) }
    val folded = grouped.select($"doc_id", size($"tl").cast(LongType).as("n_bigrams"),
      (floor((graft.functions.VectorExpressions.logRatioFold($"tl")
        / size($"tl")) * 10000 + 0.5) / 10000).as("nll"))
    timed("folded full (rep1)") { noop(folded) }
    timed("folded full (rep2)") { noop(folded) }
    spark.stop()
  }
}
