package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Regenerate q_sim_recall's pinned IVF picks: seeds the at-rest IVF
  * table from `embeddings` at the given sfDir (farthest-first + Lloyd's
  * trained codebook, the q_sim_recall prepare shape), probes vec_id < 10 at k = 10 / nProbe = 4,
  * and prints the (probe_id, neighbor_id) picks as SQL VALUES rows plus
  * the measured recall@10 vs brute force.
  * `runMain graft.tools.DumpRecall [sfDir]`. */
object DumpRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.queries.Tables.t(spark, sfDir, "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val root = java.nio.file.Files.createTempDirectory("dump_recall").toString +
      "/corpus.parquet"
    Similarity.ivfWriteAtRest(emb,
      Similarity.ivfTrainKmeans(emb, nLists = 16, iters = 10), root, replicas = 2)
    val exact = Similarity.bruteForceTopK(emb, probes, k = 10)
      .select(col("probe_id"), col("neighbor_id"))
    val nProbes = probes.count()
    for (nProbe <- Seq(2, 4, 8)) {
      val ivf = Similarity.ivfTopKAtRest(spark, root, probes, k = 10,
        nProbe = nProbe, idCol = "vec_id", vecCol = "embedding")
      val picks = ivf.select("probe_id", "neighbor_id", "rank")
        .orderBy("probe_id", "rank").collect()
      println(s"[recall-picks-$nProbe] " + picks.map(r =>
        s"($nProbe,${r.getLong(0)},${r.getLong(1)})").mkString(","))
      val hits = exact.join(ivf.select("probe_id", "neighbor_id"),
        Seq("probe_id", "neighbor_id"), "left_semi").count()
      println(f"[recall-at-10-$nProbe] ${hits / (10.0 * nProbes)}%.3f")
    }

    // q_sim_filtered_recall picks: same trained table but with the label
    // payload riding at rest; FILTERED probes at FIXED nProbe = 4 across
    // three filter selectivities — the curve that shows recall collapsing
    // as the filter sharpens (the known IVF×filter interaction)
    val froot = java.nio.file.Files.createTempDirectory("dump_frecall")
      .toString + "/corpus.parquet"
    Similarity.ivfWriteAtRest(emb,
      Similarity.ivfTrainKmeans(emb, nLists = 16, iters = 10), froot,
      replicas = 2)
    val sels: Seq[(Long, org.apache.spark.sql.Column)] = Seq(
      (50L, col("label") >= 5),
      (10L, col("label") === 3),
      (2L, col("label") === 3 && pmod(col("vec_id"), lit(5)) === 0))
    for ((tag, pred) <- sels) {
      val got = Similarity.ivfTopKAtRest(spark, froot, probes,
        Similarity.readCodebook(spark, froot).get, k = 10, nProbe = 4,
        idCol = "vec_id", vecCol = "embedding", candidateFilter = pred)
      val picks = got.select("probe_id", "neighbor_id", "rank")
        .orderBy("probe_id", "rank").collect()
      println(s"[filtered-picks-$tag] " + picks.map(r =>
        s"($tag,${r.getLong(0)},${r.getLong(1)})").mkString(","))
      val fExact = Similarity.bruteForceTopK(emb.filter(pred), probes, k = 10)
        .select(col("probe_id"), col("neighbor_id"))
      val nExact = fExact.count()
      val hits = fExact.join(got.select("probe_id", "neighbor_id"),
        Seq("probe_id", "neighbor_id"), "left_semi").count()
      println(f"[filtered-recall-$tag] ${hits.toDouble / nExact}%.3f " +
        s"(hits=$hits exact=$nExact)")
    }
    spark.stop()
  }
}
