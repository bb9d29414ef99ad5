package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump the formatted physical plan of every declared query —
  * the per-operator plan review the 100 TB design rule calls for
  * (SURVEY.md §2C): check pushdown/pruning reached the scan, broadcasts
  * fired, no accidental nested-loop or cartesian shapes, exchanges only on
  * intended keys. `grep -A3 '^== q'` the output, or pipe to a file. */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // optional query-name filter (r18: per-query before/after plan diffs)
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.allQueries.foreach { gq =>
      if (only.nonEmpty && !only(gq.name)) ()
      else {
      println(s"== ${gq.name}")
      try println(gq.run(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted")))
      catch { case t: Throwable => println(s"EXPLAIN FAILED: $t") }
      }
    }
    spark.stop()
  }
}
