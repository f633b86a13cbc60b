package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/**
 * At-rest MinHash-LSH dedup index — the INCREMENTAL half of [[Dedup]].
 *
 * [[Dedup.nearDuplicates]] answers "which pairs inside this frame are
 * near-dups" and re-signs the whole corpus every run. A growing corpus
 * needs the other shape: dedup each ARRIVING batch against everything
 * already accepted, without rescanning (or even re-reading) the accepted
 * corpus. Same pattern as `Similarity.ivfWriteAtRest`: pay one layout
 * write, then every probe is partition-pruned.
 *
 *  - [[writeAtRest]] signs the corpus once and stores its banded LSH keys
 *    `(band, bucket, id)` hash-partitioned on `bucket_part =
 *    pmod(xxhash64(band, bucket), nParts)`. Text and signatures stay OUT
 *    of the index — it is O(bands) longs per document.
 *  - [[probe]] signs only the batch, derives the touched `bucket_part`
 *    values (a bounded collect of at most `nParts` partition keys — the
 *    index layout's keyspace, not data), and scans ONLY those partition
 *    directories for bucket collisions. Candidates verify with exact
 *    word-shingle Jaccard, fetching text for candidate ids alone.
 *
 * At 100 TB: the index is ~1% of corpus bytes, a small batch touches a
 * subset of its partitions (a single doc at most `bands` of them), and
 * the accepted corpus's TEXT is read only for verified candidates via a
 * semi-join — the steady-state ingest cost is proportional to the batch,
 * not the corpus.
 *
 * Concurrency boundary: ONE writer (the ingest loop appends serially per
 * micro-batch; Structured Streaming already serializes foreachBatch).
 * Concurrent READERS are safe at file granularity — parquet appends
 * commit files via rename, so a probe racing an append sees the index
 * without some of the newest batch's keys (missing a just-admitted
 * duplicate, the same window any ingest pipeline has) but never a torn
 * file. Two concurrent WRITERS are not supported: both could admit the
 * same near-duplicate before seeing each other's keys.
 */
object DedupIndex {

  /**
   * Sign `corpus` and write its banded LSH keys under `path`, partitioned
   * by `bucket_part`. Buckets larger than `maxBucket` are dropped at write
   * time (degenerate boilerplate buckets would contribute `k` candidate
   * rows per probe doc forever); unlike the batch self-join, SINGLETON
   * buckets are kept — a future batch doc can collide with a so-far-unique
   * corpus doc.
   */
  /** The banded LSH key stream of `docs`: (bucket_part, band, bucket, id),
   *  scan-local except the final layout column. Shared by the write, append
   *  and probe paths so key derivation cannot drift between them. */
  private def bandedKeys(docs: DataFrame, textCol: String, idCol: String,
      numHashes: Int, bands: Int, shingleWords: Int, nParts: Int): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val rows = numHashes / bands
    docs.select(col(idCol).as("id"),
        Dedup.signatureFromShingles(
          TextFunctions.wordShingles(col(textCol), shingleWords), numHashes).as("sig"))
      .select(col("id"),
        posexplode(Dedup.bandBuckets(col("sig"), bands, rows)).as(Seq("band", "bucket")))
      .withColumn("bucket_part", pmod(xxhash64(col("band"), col("bucket")), lit(nParts)))
      .select("bucket_part", "band", "bucket", "id")
  }

  private def capBuckets(banded: DataFrame, maxBucket: Int): DataFrame = {
    val ok = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxBucket)
      .select("band", "bucket")
    banded.join(ok, Seq("band", "bucket"))
      .select("bucket_part", "band", "bucket", "id")
  }

  def writeAtRest(corpus: DataFrame, path: String, textCol: String = "text",
      idCol: String = "doc_id", numHashes: Int = 32, bands: Int = 8,
      shingleWords: Int = 3, maxBucket: Int = 1000, nParts: Int = 16): Unit =
    capBuckets(bandedKeys(corpus, textCol, idCol, numHashes, bands, shingleWords, nParts),
        maxBucket)
      .write.partitionBy("bucket_part").mode("overwrite").parquet(path)

  /** Append newly-admitted documents' keys to an existing index — the
   *  index-maintenance step of an ingest loop. The degenerate-bucket cap
   *  applies WITHIN this append only; across appends a bucket can accrete
   *  past it, which is why [[probe]] re-applies the cap at read time. */
  def appendToIndex(docs: DataFrame, path: String, textCol: String = "text",
      idCol: String = "doc_id", numHashes: Int = 32, bands: Int = 8,
      shingleWords: Int = 3, maxBucket: Int = 1000, nParts: Int = 16): Unit =
    capBuckets(bandedKeys(docs, textCol, idCol, numHashes, bands, shingleWords, nParts),
        maxBucket)
      .write.partitionBy("bucket_part").mode("append").parquet(path)

  /**
   * Near-duplicate pairs between an arriving `batch` and the indexed
   * corpus: `(batch_id, corpus_id, jaccard)` for every verified pair with
   * exact word-shingle Jaccard ≥ `threshold`. The signature/banding
   * parameters MUST match the ones the index was written with — bucket
   * keys are hashes, so a mismatch silently yields zero collisions; pass
   * the same values, not new defaults.
   *
   * `corpus` supplies candidate TEXT only (semi-join-reduced fetch); its
   * rows are never banded or shuffled wholesale.
   */
  def probe(spark: SparkSession, path: String, batch: DataFrame, corpus: DataFrame,
      threshold: Double = 0.7, textCol: String = "text", idCol: String = "doc_id",
      numHashes: Int = 32, bands: Int = 8, shingleWords: Int = 3,
      nParts: Int = 16, maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val rows = numHashes / bands
    val batchSlim = batch.select(col(idCol).as("id"), col(textCol).as("text"))
    val batchBanded = batchSlim.select(col("id"),
        Dedup.signatureFromShingles(
          TextFunctions.wordShingles(col("text"), shingleWords), numHashes).as("sig"))
      .select(col("id"),
        posexplode(Dedup.bandBuckets(col("sig"), bands, rows)).as(Seq("band", "bucket")))
      .withColumn("bucket_part", pmod(xxhash64(col("band"), col("bucket")), lit(nParts)))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    // bounded collect: ≤ nParts partition KEYS (the layout constant), the
    // static IN-filter that makes the parquet scan plan only the touched
    // partition directories (FileSourceScan partition-count spec'd)
    val parts = batchBanded.select("bucket_part").distinct()
      .collect().map(_.getLong(0)).sorted
    if (parts.isEmpty) { // empty batch (e.g. an idle streaming trigger):
      batchBanded.unpersist(blocking = false) // nothing to probe, no index read
      return spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("batch_id",
            batchSlim.schema("id").dataType),
          org.apache.spark.sql.types.StructField("corpus_id",
            batchSlim.schema("id").dataType),
          org.apache.spark.sql.types.StructField("jaccard",
            org.apache.spark.sql.types.DoubleType))))
    }
    // matched partitions' keys, with the write-time degenerate-bucket cap
    // RE-APPLIED at probe time: appendToIndex enforces the cap only within
    // each append, so a boilerplate bucket can accrete past it across
    // appends — without this every future probe touching that bucket would
    // pay its full membership forever
    val matched = spark.read.parquet(path)
      .filter(col("bucket_part").isin(parts.map(_.asInstanceOf[Any]): _*))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val okBuckets = matched.groupBy("bucket_part", "band", "bucket")
      .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxBucket)
      .select("bucket_part", "band", "bucket")
    val idx = matched.join(okBuckets, Seq("bucket_part", "band", "bucket"))
    val cand = batchBanded
      .join(idx.select(col("bucket_part"), col("band"), col("bucket"),
          col("id").as("corpus_id")),
        Seq("bucket_part", "band", "bucket"))
      // a batch doc already in the corpus under the same id is itself, not
      // a duplicate pair
      .filter(col("id") =!= col("corpus_id"))
      .select(col("id").as("batch_id"), col("corpus_id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val shB = batchSlim
      .join(cand.select(col("batch_id").as("id")), Seq("id"), "left_semi")
      .select(col("id"), TextFunctions.wordShingles(col("text"), shingleWords).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val shC = corpus.select(col(idCol).as("id"), col(textCol).as("text"))
      .join(cand.select(col("corpus_id").as("id")), Seq("id"), "left_semi")
      .select(col("id"), TextFunctions.wordShingles(col("text"), shingleWords).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val out = cand
      .join(shB.select(col("id").as("batch_id"), col("sh").as("sh_a")), "batch_id")
      .join(shC.select(col("id").as("corpus_id"), col("sh").as("sh_b")), "corpus_id")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("batch_id", "corpus_id")
    Dedup.materializeThenFree(out, batchBanded, matched, cand, shB, shC)
  }

  /** The admit decision built on [[probe]]: batch rows with NO verified
   *  near-dup in the indexed corpus (the ones an ingest pipeline appends
   *  and indexes next). */
  def admitNew(spark: SparkSession, path: String, batch: DataFrame, corpus: DataFrame,
      threshold: Double = 0.7, textCol: String = "text", idCol: String = "doc_id",
      numHashes: Int = 32, bands: Int = 8, shingleWords: Int = 3,
      nParts: Int = 16): DataFrame = {
    val dups = probe(spark, path, batch, corpus, threshold, textCol, idCol,
        numHashes, bands, shingleWords, nParts)
      .select(col("batch_id").as(idCol)).distinct()
    batch.join(dups, Seq(idCol), "left_anti")
  }

  /**
   * One micro-batch of the CONTINUOUS ingest loop: dedup `batch` within
   * itself and against the accepted corpus, append the survivors' text to
   * `corpusPath` and their LSH keys to `indexPath`. Returns the admitted
   * count.
   *
   * Within-batch semantics are the greedy local rule — a doc is dropped
   * when it is the strictly-LARGER member of any verified pair — which
   * needs no iteration; docs whose cluster links run only through dropped
   * members can each survive as a representative (unlike
   * [[Dedup.nearDupGroups]]' transitive canonical, which an offline
   * compaction pass can still apply later).
   *
   * Bootstrap: a missing/empty index means nothing is accepted yet — the
   * whole (self-deduped) first batch admits and seeds both paths.
   *
   * Delivery: `foreachBatch` replays a batch after a failure, so the two
   * appends are AT-LEAST-ONCE — a replayed batch can duplicate corpus rows
   * and index keys. Duplicate keys only re-surface candidates that
   * `probe`'s distinct already collapses; production sinks wanting
   * exactly-once write per-batchId subdirectories and commit by rename.
   */
  def ingestBatch(batch: DataFrame, indexPath: String, corpusPath: String,
      threshold: Double = 0.7, textCol: String = "text", idCol: String = "doc_id",
      numHashes: Int = 32, bands: Int = 8, shingleWords: Int = 3,
      nParts: Int = 16, maxBucket: Int = 1000): Long = {
    val spark = batch.sparkSession
    val b = batch.select(col(idCol), col(textCol)).dropDuplicates(idCol)
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val inBatchDrop = Dedup.nearDuplicates(b, textCol, idCol, threshold,
        shingleWords, numHashes, bands, maxBucket)
      .select(col("id_b").as(idCol)).distinct()
    val hasIndex = {
      val p = new org.apache.hadoop.fs.Path(indexPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(p) && fs.listStatus(p).nonEmpty
    }
    val crossDrop =
      if (hasIndex)
        probe(spark, indexPath, b, spark.read.parquet(corpusPath), threshold,
            textCol, idCol, numHashes, bands, shingleWords, nParts, maxBucket)
          .select(col("batch_id").as(idCol)).distinct()
      else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        b.select(col(idCol)).schema)
    val admitted = b.join(inBatchDrop.unionByName(crossDrop).distinct(),
        Seq(idCol), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val n = admitted.count()
    if (n > 0) {
      admitted.write.mode("append").parquet(corpusPath)
      appendToIndex(admitted, indexPath, textCol, idCol, numHashes, bands,
        shingleWords, maxBucket, nParts)
    }
    admitted.unpersist(blocking = false)
    b.unpersist(blocking = false)
    n
  }

  /** The streaming wrapper: every micro-batch of `docs` flows through
   *  [[ingestBatch]]. State lives in the two at-rest paths (corpus text +
   *  LSH index), NOT in Spark streaming state — so it survives restarts,
   *  is shared with batch probes, and is unbounded-corpus-safe (the
   *  watermark-state alternative, [[Dedup.streamingNearDupCandidates]],
   *  bounds state but forgets old buckets). */
  def ingestStream(docs: DataFrame, indexPath: String, corpusPath: String,
      checkpointPath: String, threshold: Double = 0.7, textCol: String = "text",
      idCol: String = "doc_id", numHashes: Int = 32, bands: Int = 8,
      shingleWords: Int = 3, nParts: Int = 16, maxBucket: Int = 1000)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (b: DataFrame, _: Long) =>
        ingestBatch(b, indexPath, corpusPath, threshold, textCol, idCol,
          numHashes, bands, shingleWords, nParts, maxBucket)
        ()
      }
      .start()
}
