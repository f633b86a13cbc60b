package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupIndex}
import graft.queries.Tables

/** The at-rest LSH dedup index: probe results equal the in-memory operator
 *  restricted to cross (batch x corpus) pairs, probes partition-prune, and
 *  the admit decision drops exactly the matched batch docs. */
class DedupIndexSpec extends SparkSpec {

  private lazy val docs = Tables.t(spark, "/root/testdata/sf0.01", "documents")
  private lazy val corpus = docs.filter(col("doc_id") % 7 =!= 0)
  private lazy val batch = docs.filter(col("doc_id") % 7 === 0)

  test("probe equals nearDuplicates restricted to cross pairs") {
    val dir = tempDir("lsh_rest") + "/index.parquet"
    DedupIndex.writeAtRest(corpus, dir)
    val atRest = DedupIndex.probe(spark, dir, batch, corpus, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the batch operator over the WHOLE corpus, keeping only pairs that
    // straddle the split (either orientation of its id_a < id_b form)
    val whole = Dedup.nearDuplicates(docs, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cross = whole.collect {
      case (a, b, j) if a % 7 == 0 && b % 7 != 0 => (a, b, j)
      case (a, b, j) if b % 7 == 0 && a % 7 != 0 => (b, a, j)
    }.toSet
    assert(atRest == cross, s"at-rest $atRest vs in-memory cross $cross")
    assert(atRest.nonEmpty) // the sf0.01 corpus has 9 true cross pairs
  }

  test("a small batch's probe scan plans only its touched bucket_part partitions") {
    val dir = tempDir("lsh_rest_prune") + "/index.parquet"
    DedupIndex.writeAtRest(corpus, dir, nParts = 16)
    val nWritten = spark.read.parquet(dir)
      .select("bucket_part").distinct().count()
    assert(nWritten == 16) // sf0.01 populates every partition
    // one doc explodes to `bands` = 8 bucket keys → at most 8 of 16 parts
    val oneDoc = batch.filter(col("doc_id") === 0)
    // the probe persists its intermediates (and its result), so the index
    // scan sits under InMemoryTableScan nodes — recurse through cachedPlan
    // to reach the probe query's OWN FileSourceScan, not a hand-built twin
    def indexScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("index.parquet")) =>
        Seq(f)
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        indexScans(m.relation.cachedPlan)
    }.flatten
    spark.conf.set("spark.sql.adaptive.enabled", false)
    val scan =
      try {
        val q = DedupIndex.probe(spark, dir, oneDoc, corpus, threshold = 0.7)
        q.collect() // the pruned probe executes cleanly
        indexScans(q.queryExecution.executedPlan).head
      } finally spark.conf.set("spark.sql.adaptive.enabled", true)
    assert(scan.selectedPartitions.partitionCount <= 8,
      s"planned ${scan.selectedPartitions.partitionCount} partitions, want <= 8 of 16")
  }

  test("admitNew = batch minus the probe's matched ids") {
    val dir = tempDir("lsh_rest_admit") + "/index.parquet"
    DedupIndex.writeAtRest(corpus, dir)
    val matched = DedupIndex.probe(spark, dir, batch, corpus, threshold = 0.7)
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    val admitted = DedupIndex.admitNew(spark, dir, batch, corpus, threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == all -- matched)
    assert(matched.nonEmpty && admitted.nonEmpty)
  }
}
