package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** One declared engine operator: a Spark-native implementation plus — when the
  * semantics are ANSI-SQL-expressible — a DuckDB oracle equivalent used by the
  * correctness gate (SURVEY.md §2B "oracle" column). The two sides of a pair
  * are committed together and must produce identically-named, identically-
  * ordered, hash-equal results (FIXTURES.md canonicalization rules).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Mixed into each operator module; collects its declared queries. */
trait QueryModule {
  def queries: Seq[GraftQuery]

  /** Declare an oracle-checked query. Fixture views are registered before the
    * body runs, so the body can use `spark.table("lineitem")` / `spark.sql`. */
  protected def q(name: String, oracle: String)(
      f: SparkSession => DataFrame): GraftQuery =
    GraftQuery(name, (s, dir) => { Tables.register(s, dir); f(s) }, Some(oracle))

  /** Declare a rows-only-checked query (non-SQL-expressible semantics:
    * randomized LSH, streaming state, …). */
  protected def qRowsOnly(name: String)(f: SparkSession => DataFrame): GraftQuery =
    GraftQuery(name, (s, dir) => { Tables.register(s, dir); f(s) }, None)

  /** Oracle-checked query whose body also needs the fixture directory
    * (sources that re-read raw files: streaming ingest, partitioned
    * re-layout, …). */
  protected def qDir(name: String, oracle: String)(
      f: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, (s, dir) => { Tables.register(s, dir); f(s, dir) }, Some(oracle))
}
