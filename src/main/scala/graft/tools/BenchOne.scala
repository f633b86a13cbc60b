package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Ad-hoc single-query bench: `runMain graft.tools.BenchOne <query> [runs] [unpersist|keep]`.
  * Mirrors Bench.scala's measurement (toRdd.count, warmup, optional
  * between-attempt unpersist) so regressions can be bisected to either the
  * operator or the harness policy.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: BenchOne <query> [runs] [unpersist|keep]")
      System.err.println("queries: " + SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(1)
    }
    val name = args(0)
    if (!SparkEntry.queries.contains(name)) {
      System.err.println(s"unknown query '$name'; valid names:")
      System.err.println(SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(1)
    }
    val runs = if (args.length > 1) args(1).toInt else 3
    val unpersistBetween = args.length <= 2 || args(2) != "keep"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    val prep = SparkEntry.prepares.get(name)
    (1 to runs).foreach { i =>
      val tp0 = System.nanoTime()
      prep.foreach(_(spark, sfDir))
      val prepSec = (System.nanoTime() - tp0) / 1e9
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val prepNote = if (prep.isDefined) f" (+ untimed prepare $prepSec%.3fs)" else ""
      println(f"[benchone] $name attempt $i: $sec%.3fs (unpersistBetween=$unpersistBetween)$prepNote")
      if (unpersistBetween) {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        // unpersist drops blocks but leaves CacheManager plan entries; clear
        // those too so re-runs aren't substituted with empty InMemoryRelations
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
