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
    // The driver keeps only a 2000-char TAIL of the run output (measured in
    // BENCH_r02.json: capture is exactly 2000 chars, the full 3.2 KB line's
    // head — including "metric"/"value" — was cut and "parsed" came back
    // null). So: a full-detail line goes out FIRST (local logs; its head may
    // be truncated in the tail), and the LAST stdout line is a compact JSON
    // object with shortened query keys + 2-decimal seconds, size-enforced to
    // fit the tail budget with room for sbt's trailing "[success]" line.
    def s3(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def s2(v: Double): String =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val total = results.map { case (_, v, _) => math.abs(v) }.sum
    val nFail = results.count(_._3.isDefined)
    // Short key = the "qNN[letter]" prefix (unique across SparkEntry); fall
    // back to the full name if a collision ever appears.
    val shortOf: Map[String, String] = {
      val pref = results.map { case (k, _, _) => k -> k.takeWhile(_ != '_') }
      val dup = pref.groupBy(_._2).collect { case (p, g) if g.size > 1 => p }.toSet
      pref.map { case (k, p) => k -> (if (dup(p)) k else p) }.toMap
    }
    val detail = results.map { case (k, v, _) => s"\"" + k + "\":" + s3(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"detail","queries":$detail,"sf":"$sfDir"}""")
    val errs = results.collect { case (k, _, Some(e)) => s"\"${shortOf(k)}\":\"$e\"" }
      .mkString("{", ",", "}")
    val errField = if (nFail > 0) s""","errors":$errs""" else ""
    def line(qs: Seq[(String, Double, Option[String])], omitted: Int): String = {
      val m = qs.map { case (k, v, _) => s"\"${shortOf(k)}\":${s2(v)}" }
        .mkString("{", ",", "}")
      val om = if (omitted > 0) s""","omitted":$omitted""" else ""
      s"""{"metric":"total","value":${s2(total)},"unit":"sec","queries":$m,"failed":$nFail$errField$om,"sf":"$sfDir"}"""
    }
    // Budget 1600 chars: 2000-char tail − ~100 for sbt's success trailer −
    // slack. If over, drop the cheapest queries (failures always kept).
    var kept = results
    var out = line(kept, results.size - kept.size)
    while (out.length > 1600 && kept.exists(_._3.isEmpty)) {
      val cheapest = kept.filter(_._3.isEmpty).minBy { case (_, v, _) => math.abs(v) }
      kept = kept.filterNot(_ eq cheapest)
      out = line(kept, results.size - kept.size)
    }
    println(out)
    spark.stop()
  }
}
