package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev stage profiler (ExplainAll's timing sibling): rewritten freely per
  * investigation. Current form: the r19 scaling octave (VERDICT r18 #6) —
  * time the heavy operator kernels on a ScaleProbe-synthesized corpus big
  * enough that DATA dominates fixed cost, at the core count given by
  * SPARK_GRAFT_CPUS, so an 8-vs-32 run pair measures parallel scaling the
  * sf0.1 fixtures cannot (sub-second queries there are fixed-cost bound;
  * 8 ≈ 32 cores on the whole fleet, VERDICT r18 scaling block). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_OCTAVE_DOCS", "400000").toLong
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

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // synthetic corpora (ScaleProbe's generators — pure hash functions of
    // the id, no files): big enough that per-task data work dominates
    val docs = ScaleProbe.synthDocs(spark, n)
      .localCheckpoint() // materialize once so kernels time THEIR work
    val emb = ScaleProbe.synthEmbeddings(spark, n / 4).localCheckpoint()
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    // warm-up (codegen/classloading)
    noop(docs.limit(1000))

    results("simhash_signatures") = timed {
      noop(graft.operators.DedupQueries.simhashesOf(docs))
    }
    results("frame_ahash_pairs") = timed {
      noop(graft.operators.MultimodalQueries.frameAhashPairs(
        docs.select($"doc_id", $"text")))
    }
    results("minhash_band_rows") = timed {
      noop(graft.operators.DedupQueries.minhashBandRowsOf(docs))
    }
    results("semdedup_candidates") = timed {
      noop(graft.operators.SimilarityQueries.semdedupCandidatesOf(emb, 64))
    }
    val json = results.map { case (k, v) =>
      f""""$k":$v%.2f""" }.mkString("{", ",", "}")
    println(s"""{"metric":"scaling_octave","cpus":$cpus,"n_docs":$n,"kernels":$json}""")
    spark.stop()
  }
}
