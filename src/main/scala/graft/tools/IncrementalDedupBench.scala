package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup, DedupIndex}
import graft.queries.Tables

/**
 * Measures the round-10 incremental operators against their full-rescan
 * twins: `runMain graft.tools.IncrementalDedupBench [sfDir] [replicas...]`.
 *
 * The question at 100 TB is not "is one probe fast at 5k docs" (fixed
 * overheads dominate there) but "how does the per-batch ingest cost GROW
 * as the accepted corpus grows". So the corpus is replicated K× with
 * DedupScaleBench's disjoint vowel/consonant rotations while the arriving
 * batch stays FIXED (the sf's %7 slice): full `nearDuplicates` must grow
 * with the corpus, the at-rest `probe` should track the batch + its
 * candidates instead. Shuffle bytes per phase come from the stage-metrics
 * listener, same as DedupScaleBench.
 *
 * Also times broadcast-exact `decontaminate` vs `decontaminateBloom` at
 * the base sf (identical results by construction; the bloom path exists
 * for gram sets too big to broadcast — parity, not speedup, is the
 * expectation at this scale).
 */
object IncrementalDedupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 5, 20)
    val spark = BenchHarness.session(32)
    val shuffle = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffle.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
    })
    def freeCaches(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    def timedMB(body: => Unit): (Double, Double) = {
      shuffle.set(0)
      val t0 = System.nanoTime()
      body
      ((System.nanoTime() - t0) / 1e9, shuffle.get / 1e6)
    }

    val base = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    val batch = base.filter(col("doc_id") % 7 === 0)
    val nBatch = batch.count()
    val vowels = "aeiou"
    val consonants = "bcdfghjklm"
    replicas.foreach { k =>
      // replica 0 keeps the original text, so the batch's true pairs stay
      // present in every corpus size; later replicas rotate into disjoint
      // shingle spaces (no clique inflation — see DedupScaleBench)
      val corpusDir = java.nio.file.Files.createTempDirectory("incbench_corpus").toString
      (0 until k).map { r =>
        val rotV = vowels.drop(r % 5) + vowels.take(r % 5)
        val rotC = consonants.drop((r / 5) % 10) + consonants.take((r / 5) % 10)
        base.filter(col("doc_id") % 7 =!= 0)
          .select((col("doc_id") + lit(r * 1000000L)).as("doc_id"),
            translate(col("text"), vowels + consonants, rotV + rotC).as("text"))
      }.reduce(_ unionAll _)
        // materialized to parquet, not cached: every phase then pays a real
        // disk scan (the production shape), and the inter-phase cache sweep
        // can't silently turn later phases into 20-way union recomputes
        .write.mode("overwrite").parquet(corpusDir)
      val corpus = spark.read.parquet(corpusDir)
      val whole = corpus.unionAll(batch)
      val (tFull, mbFull) = timedMB {
        Dedup.nearDuplicates(whole, threshold = 0.7).queryExecution.toRdd.count()
        freeCaches()
      }
      val restDir = java.nio.file.Files.createTempDirectory("incbench_idx").toString
      val idx = restDir + "/index.parquet"
      val corpRest = restDir + "/corpus.parquet"
      val (tWrite, _) = timedMB {
        DedupIndex.writeAtRest(corpus, idx)
        DedupIndex.writeCorpus(corpus, corpRest)
      }
      // the round-11 steady-state path: index probe AND candidate-text
      // fetch both partition-pruned against the id-addressable layouts
      val (tProbe, mbProbe) = timedMB {
        DedupIndex.probeAtRest(spark, idx, batch, corpRest, threshold = 0.7)
          .queryExecution.toRdd.count()
        freeCaches()
      }
      val nCorpus = corpus.count()
      println(f"[incbench] corpus=$nCorpus%8d batch=$nBatch%5d " +
        f"full=${tFull}%6.2fs (${mbFull}%7.1fMB shuffle)  atRestWrite=${tWrite}%6.2fs  " +
        f"probeAtRest=${tProbe}%6.2fs (${mbProbe}%7.1fMB shuffle)")
      // replicated corpora are multi-GB at high replica counts: reclaim
      // each iteration's temp dirs instead of stranding them in /tmp
      Seq(new java.io.File(corpusDir), new java.io.File(restDir))
        .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    }

    val docs = Tables.t(spark, sfDir, "documents")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val evalSet = docs.filter(col("doc_id") % 10 === 0)
    val tExact = BenchHarness.timeBest(3, "decontaminate") {
      Corpus.decontaminate(train, evalSet).queryExecution.toRdd.count()
      freeCaches()
    }
    val tBloom = BenchHarness.timeBest(3, "decontaminateBloom") {
      Corpus.decontaminateBloom(train, evalSet).queryExecution.toRdd.count()
      freeCaches()
    }
    println(f"[incbench] decontaminate: exact=${tExact}%.2fs bloom=${tBloom}%.2fs")
    spark.stop()
  }
}
