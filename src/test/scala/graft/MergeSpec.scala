package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.{IngestQueries, Tables}

/** The MERGE INTO analog's partition-scoped contract: an upsert batch
  * rewrites exactly the partitions it touches — survivors merge with
  * corrections, matched keys are superseded, and every file in an untouched
  * partition survives byte-identical (it is never even opened). */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(root: Path): Map[String, (Long, Long)] =
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_"))
      .map(p => root.relativize(p).toString ->
        (Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toMap

  test("compaction rewrites 64 fragments into 4 files, losslessly") {
    val (frag, compact) =
      graft.operators.ScaleQueries.compactedLayout(spark, sf)
    def files(p: String): Seq[Path] =
      Files.walk(Paths.get(p)).iterator().asScala
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet")).toSeq
    assert(files(frag).size == 64, s"fragmented: ${files(frag).size}")
    assert(files(compact).size == 4, s"compacted: ${files(compact).size}")
    // even sizes: repartition spreads rows round-robin, so no file holds a
    // disproportionate share (the skew coalesce() would have kept)
    val sizes = files(compact).map(Files.size)
    assert(sizes.max < 2 * sizes.min, s"skewed compaction: $sizes")
    // lossless: the compacted row multiset equals the source table's
    val a = spark.read.parquet(compact).collect().map(_.toString).sorted
    val b = Tables.table(spark, sf, "documents")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("upsertPartitioned rewrites only the touched partitions") {
    val base = Paths.get(tempDir("graft_mergespec_"))
    val layout = base.toString + "/orders"
    val orders = Tables.table(spark, sf, "orders")
      .withColumn("om", date_format($"o_orderdate", "yyyy-MM"))
    orders.write.mode("overwrite").partitionBy("om").parquet(layout)
    val before = snapshot(Paths.get(layout))

    // corrections confined to two months: one update, one insert
    val corrections = orders.orderBy($"o_orderkey").limit(1)
      .withColumn("o_orderpriority", lit("CORRECTED"))
      .unionByName(orders.orderBy($"o_orderkey".desc).limit(1)
        .withColumn("o_orderkey", $"o_orderkey" + 100000000L))
    val touched = corrections.select($"om").distinct()
      .collect().map(_.getString(0)).toSet
    IngestQueries.upsertPartitioned(spark, layout, base.toString + "/staging",
      corrections, keyCol = "o_orderkey", partCol = "om")

    val after = snapshot(Paths.get(layout))
    val untouchedBefore = before.filterNot { case (p, _) => touched.exists(p.contains) }
    val untouchedAfter = after.filterNot { case (p, _) => touched.exists(p.contains) }
    assert(untouchedBefore.nonEmpty, "fixture produced no untouched partitions")
    assert(untouchedAfter == untouchedBefore,
      "files outside the touched partitions changed")
    touched.foreach { m =>
      assert(after.keys.exists(_.contains(m)), s"touched partition $m missing")
    }

    // semantics: merged layout == corrections ∪ (orders anti-join keys)
    val expected = corrections.unionByName(
      orders.join(corrections.select("o_orderkey"), Seq("o_orderkey"), "left_anti"))
    val got = spark.read.parquet(layout)
      .select(expected.columns.map(col): _*)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "merged content differs from the anti-join + union replay")
  }
}
