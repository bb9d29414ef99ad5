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

    // ---- q180 component profile (r18 shape) ----
    val li = spark.table("lineitem")
    val cmsW = 256
    def md5j(k: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
      md5(concat(k, lit("#"), j.cast("string"))
        .cast(org.apache.spark.sql.types.BinaryType))
    def cells(keys: org.apache.spark.sql.DataFrame) = keys
      .select($"k", explode(array((0 to 4).map(lit(_)): _*)).as("j"))
      .select($"j", md5j($"k", $"j").as("h"))
      .select($"j",
        (conv(substring($"h", 1, 8), 16, 10)
          .cast(org.apache.spark.sql.types.LongType) % cmsW).as("b"),
        (lit(1) - lit(2) * (conv(substring($"h", 9, 1), 16, 10)
          .cast(org.apache.spark.sql.types.LongType) % 2)).as("s"))
      .groupBy($"j", $"b")
      .agg(sum($"s").cast(org.apache.spark.sql.types.LongType).as("c"))
    val liSp = graft.sources.Tables.spread(li
      .select($"l_orderkey".cast("string").as("ko"),
        $"l_partkey".cast("string").as("kp")))
    println(s"[scratch] lineitem rows = ${li.count()}, orders = ${spark.table("orders").count()}")
    timed("cells(cl) l_orderkey") { noop(cells(liSp.select($"ko".as("k")))) }
    timed("cells(cp) l_partkey") { noop(cells(liSp.select($"kp".as("k")))) }
    timed("cells(co) orders") { noop(cells(graft.sources.Tables.spread(
      spark.table("orders")).select($"o_orderkey".cast("string").as("k")))) }
    timed("eol exact join count") {
      noop(spark.table("orders").join(li, $"l_orderkey" === $"o_orderkey")
        .agg(count(lit(1))))
    }
    timed("epp exact groupBy partkey") {
      noop(li.groupBy($"l_partkey").agg(count(lit(1)).as("c"))
        .agg(sum($"c" * $"c")))
    }
    val gq = graft.SparkEntry.allQueries.filter(_.name == "q180_join_size_sketch")
    gq.foreach { g =>
      timed(g.name + " rep1") { g.run(spark, sfDir).count(): Unit }
      timed(g.name + " rep2") { g.run(spark, sfDir).count(): Unit }
      timed(g.name + " rep3") { g.run(spark, sfDir).count(): Unit }
    }
    spark.stop()
  }
}
