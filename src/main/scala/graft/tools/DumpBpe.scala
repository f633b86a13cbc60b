package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerate q_text_bpe's pinned oracle: prints the merge table of
  * `Corpus.trainBpe(documents, numMerges=20)` at the given sfDir as SQL
  * VALUES rows. `runMain graft.tools.DumpBpe [sfDir]`. */
object DumpBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Tables.t(spark, sfDir, "documents")
    val rows = graft.operators.Corpus.trainBpe(docs, numMerges = 20).collect()
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    println("[bpe] " + rows.map(r =>
      s"(${r.getLong(0)}, ${q(r.getString(1))}, ${q(r.getString(2))}, " +
        s"${q(r.getString(3))}, ${r.getLong(4)})").mkString(","))
    // the encode oracle: per-doc subword counts under those 20 merges
    val merges = rows.map(r => (r.getString(1), r.getString(2))).toSeq
    val counts = graft.operators.Corpus.bpeEncodeCounts(docs, merges).collect()
    println("[bpe-encode] " + counts.map(r =>
      s"(${r.getLong(0)},${r.getLong(1)})").mkString(","))
    // the token-id oracle: full id sequences for the doc_id < 40 slice
    import org.apache.spark.sql.functions.col
    val ids = graft.operators.Corpus.bpeEncode(docs.filter(col("doc_id") < 40), merges)
      .orderBy("doc_id").collect()
    println("[bpe-ids] " + ids.map(r =>
      s"(${r.getLong(0)},'${r.getSeq[Int](1).mkString(",")}')").mkString(","))
    spark.stop()
  }
}
