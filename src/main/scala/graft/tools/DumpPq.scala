package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Regenerate the PQ pins:
  *  - q_sim_pq (PqOracle is not involved — its picks feed simPickedOracle
  *    directly): deterministic pqTrain(m=8, ksub=16, iters=5) model,
  *    probes vec_id < 5, ADC top-20 reranked exactly to k=5 — printed as
  *    (probe_id, neighbor_id, rank) SQL VALUES rows;
  *  - q_sim_pq_recall (PqOracle.pickValues): ADC-only top-10 picks for
  *    probes vec_id < 10 swept over m = 16 / 8 / 4 subquantizers — printed
  *    as (m, probe_id, neighbor_id) rows plus the measured recall@10 vs
  *    brute force.
  * `runMain graft.tools.DumpPq [sfDir]`. */
object DumpPq {
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

    val probes5 = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val cb8 = Similarity.pqTrain(emb, m = 8, ksub = 16, iters = 5)
    val picked = Similarity.pqTopK(emb, probes5, cb8, k = 5, rerank = 20)
      .select("probe_id", "neighbor_id", "rank")
      .orderBy("probe_id", "rank").collect()
    println("[pq-picks] " + picked.map(r =>
      s"(${r.getLong(0)},${r.getLong(1)},${r.getInt(2)})").mkString(","))

    val probes10 = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val exact = Similarity.bruteForceTopK(emb, probes10, k = 10)
      .select(col("probe_id"), col("neighbor_id"))
    val nProbes = probes10.count()
    for (m <- Seq(16, 8, 4)) {
      val cb = Similarity.pqTrain(emb, m = m, ksub = 16, iters = 5)
      val adc = Similarity.pqTopK(emb, probes10, cb, k = 10)
      val picks = adc.select("probe_id", "neighbor_id", "rank")
        .orderBy("probe_id", "rank").collect()
      println(s"[pq-recall-picks-$m] " + picks.map(r =>
        s"($m,${r.getLong(0)},${r.getLong(1)})").mkString(","))
      val hits = exact.join(adc.select("probe_id", "neighbor_id"),
        Seq("probe_id", "neighbor_id"), "left_semi").count()
      println(f"[pq-recall-at-10-$m] ${hits / (10.0 * nProbes)}%.3f")
    }
    spark.stop()
  }
}
