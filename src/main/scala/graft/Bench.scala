package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/classloading/file-index paths so per-query timings
    // reflect steady state, and run in declaration order (stable output)
    graft.sources.Tables.register(spark, sfDir)
    spark.sql("SELECT COUNT(*) FROM lineitem WHERE l_quantity > 0").collect()
    // A failed query must be visible in the emitted JSON (negative sentinel
    // second + an errors map), never silently timed as a fast success.
    val results = SparkEntry.allQueries.map { gq =>
      val t0 = System.nanoTime()
      val err =
        try { gq.run(spark, sfDir).count(); None }
        catch { case t: Throwable =>
          System.err.println(s"BENCH FAIL ${gq.name}: $t")
          Some(t.getClass.getSimpleName)
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (gq.name, if (err.isEmpty) sec else -sec, err)
    }
    // Keep the JSON line SHORT: the driver captures only a tail buffer of
    // the run output (BENCH_r01.json shows the line's head truncated away →
    // "parsed": null), so seconds are rounded to 3 decimals and the errors
    // map is emitted only when non-empty.
    def s3(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + s3(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"$k\":\"$e\"" }
      .mkString("{", ",", "}")
    val total = results.map { case (_, v, _) => math.abs(v) }.sum
    val nFail = results.count(_._3.isDefined)
    val errField = if (nFail > 0) s""","errors":$errs""" else ""
    println(s"""{"metric":"total","value":${s3(total)},"unit":"sec","queries":$qs,"failed":$nFail$errField,"sf":"$sfDir"}""")
    spark.stop()
  }
}
