package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (never committed — deleted before gate). */
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

    // ---- q244 stage profile ----
    val sig = graft.operators.MultimodalQueries.frameSigs(spark)
    timed("frameSigs (memo build, 1st)") { noop(sig) }
    timed("frameSigs (memo, 2nd)") { noop(sig) }
    println(s"[scratch] n frames = ${sig.count()}")
    val bands = graft.operators.MultimodalQueries.frameAhashBandRows(sig)
    timed("bands") { noop(bands) }
    val pairs = graft.operators.DedupQueries.saltedBucketPairs(
      bands, graft.operators.DedupQueries.defaultBucketCap)
    println(s"[scratch] n candidate pairs = ${pairs.count()}")
    timed("saltedBucketPairs") { noop(pairs) }
    timed("full q244 (rep1)") {
      noop(graft.operators.MultimodalQueries.frameAhashPairsFromSigs(sig))
    }
    timed("full q244 (rep2)") {
      noop(graft.operators.MultimodalQueries.frameAhashPairsFromSigs(sig))
    }
    // bucket size distribution
    bands.groupBy($"band", $"bh").count()
      .agg(max($"count").as("max"), expr("percentile(count, 0.5)").as("med"),
        count(lit(1)).as("n_buckets"), sum($"count").as("rows"))
      .show()
    spark.stop()
  }
}
