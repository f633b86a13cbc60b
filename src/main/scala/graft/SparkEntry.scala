package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/**
 * Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md.
 *
 * `queries` is the proven operator inventory (SURVEY.md §2): one entry per
 * capability, each with a DuckDB oracle in `oracleSql` where the semantics
 * are ANSI-SQL-expressible (driver hash-compares at sf0.01). Entries without
 * an oracle (custom source, geo, sketches, LSH) are covered by ScalaTest
 * golden specs instead.
 */
object SparkEntry {

  val allQueries: Seq[Q] =
    CoreQueries.all ++ JoinQueries.all ++ AggQueries.all ++ WindowQueries.all ++
      SortSetQueries.all ++ ScalarQueries.all ++ RelationalQueries.all ++
      ZarrQueries.all ++ MLQueries.all ++ CorpusQueries.all

  /** Flagship on sf0.001: the reference's STAC-style Zarr search end-to-end. */
  def entry(spark: SparkSession): DataFrame = ZarrQueries.flagship(spark)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** Untimed seed phases (see [[graft.queries.Q.prepare]]): the bench
   *  runs a query's prepare before each timed attempt; Verify runs it
   *  before the dump. Queries without one are unaffected. */
  def prepares: Map[String, (SparkSession, String) => Unit] =
    allQueries.flatMap(q => q.prepare.map(p => q.name -> p)).toMap

  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
