package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates the literal-VALUES oracle body for q_dedup_simhash
  * (`graft.queries.SimhashOracle`): runs the query at sf0.01 and prints one
  * `(id_a, id_b, distance)` tuple per line. The simhash kernel is
  * deterministic, so the output is stable until the corpus or the hash
  * kernel changes — same regeneration contract as FingerprintOracle.
  */
object DumpSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_dedup_simhash")(spark, sfDir)
    df.printSchema()
    val rows = df.collect()
    println(s"ROWS=${rows.length}")
    rows.foreach(r => println(s"ROW|${r.get(0)}|${r.get(1)}|${r.get(2)}"))
    spark.stop()
  }
}
