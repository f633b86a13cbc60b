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

  test("streaming ingest: micro-batches self-dedup, dedup against all prior batches, grow the index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tempDir("lsh_ingest")
    val idxPath = s"$root/index.parquet"
    val corpPath = s"$root/corpus.parquet"
    def doc(n: Int) = (0 until 12).map(i => s"w${n}t$i").mkString(" ") // 12 unique tokens
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.DedupIndex.ingestStream(
      mem.toDF().toDF("doc_id", "text"), idxPath, corpPath, s"$root/ckpt")
    try {
      // batch 1: two originals + an exact in-batch copy of doc 1
      mem.addData((1L, doc(1)), (2L, doc(2)), (3L, doc(1)))
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpPath).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(after1 === Set(1L, 2L)) // 3 dropped: larger member of the (1,3) pair
      // batch 2: a copy of an EARLIER batch's doc + a fresh doc
      mem.addData((10L, doc(2)), (11L, doc(4)))
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpPath).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(after2 === Set(1L, 2L, 11L)) // 10 matched indexed doc 2 across batches
      // batch 3: copies of docs from BOTH prior batches → nothing admits
      mem.addData((20L, doc(1)), (21L, doc(4)))
      q.processAllAvailable()
      val after3 = spark.read.parquet(corpPath).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(after3 === Set(1L, 2L, 11L))
      // the index holds exactly the admitted docs' keys (bands each)
      val idxIds = spark.read.parquet(idxPath).select("id")
        .collect().map(_.getLong(0)).toSet
      assert(idxIds === Set(1L, 2L, 11L))
    } finally q.stop()
  }

  test("an empty batch probes to an empty result without reading the index") {
    import spark.implicits._
    val dir = tempDir("lsh_rest_empty") + "/index.parquet"
    DedupIndex.writeAtRest(corpus, dir)
    val out = DedupIndex.probe(spark, dir,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), corpus)
    assert(out.columns.toSeq === Seq("batch_id", "corpus_id", "jaccard"))
    assert(out.count() === 0L)
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
