package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.Tables

/**
 * Dedup-family scaling measurement for SCALE.md:
 * `runMain graft.tools.DedupScaleBench [sfDir] [replicas...]`.
 *
 * Runs minhash-LSH candidates → exact-Jaccard verification →
 * connected-component groups over the sf corpus replicated K× and reports
 * wall time + total shuffle read/write per scale point. Replicas are
 * vowel-rotated per copy (a deterministic `translate`), so intra-replica
 * near-dup structure is preserved exactly while cross-replica pairs are
 * eliminated — scaling the corpus without quadratically inflating each
 * duplicate clique the way verbatim copies would.
 */
object DedupScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val replicas = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 2, 5, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        shuffleRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    val base = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    val nBase = base.count()
    // two independent rotations → 5 × 10 = 50 distinct transforms, so every
    // replica's shingle space is disjoint from every other's (a single
    // 5-state rotation made replicas 5-9 verbatim copies of 0-4 and
    // quadratically inflated the cliques — measured before fixing)
    val vowels = "aeiou"
    val consonants = "bcdfghjklm"
    replicas.foreach { k =>
      val docs = (0 until k).map { r =>
        val rotV = vowels.drop(r % 5) + vowels.take(r % 5)
        val rotC = consonants.drop((r / 5) % 10) + consonants.take((r / 5) % 10)
        base.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"),
          translate(col("text"), vowels + consonants, rotV + rotC).as("text"))
      }.reduce(_ unionAll _)
      docs.persist().count() // input materialized: measure the operators, not the scan
      shuffleRead.set(0); shuffleWrite.set(0)
      val t0 = System.nanoTime()
      val pairs = Dedup.nearDuplicates(docs, threshold = 0.7)
      val nPairs = pairs.count()
      val t1 = System.nanoTime()
      val groups = Dedup.nearDupGroups(pairs)
      val nGroups = groups.count()
      val t2 = System.nanoTime()
      println(f"[dedupscale] docs=${nBase * k}%8d pairs=$nPairs%6d groupRows=$nGroups%6d " +
        f"minhashVerify=${(t1 - t0) / 1e9}%6.2fs groups=${(t2 - t1) / 1e9}%6.2fs " +
        f"shuffleRead=${shuffleRead.get / 1e6}%8.1fMB shuffleWrite=${shuffleWrite.get / 1e6}%8.1fMB")
      docs.unpersist()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
