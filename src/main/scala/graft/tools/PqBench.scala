package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measure the IVF-PQ probe against the raw-vector IVF probe on a
  * multi-hundred-MB at-rest table — the scan-I/O claim in SCALE.md, made
  * concrete: both probes prune to the same nProbe lists; the PQ probe's
  * candidate pass reads the m-byte code column instead of the dim×4-byte
  * embedding column, then point-fetches `rerank` rows per probe.
  *
  * Synthetic corpus: hash-derived uniform floats (deterministic, no RNG),
  * `nVecs` × `dim` float32. The PQ model trains on a hash-picked ~50k
  * sample (the documented 100 TB recipe).
  *
  * `runMain graft.tools.PqBench [nVecs] [dim] [nLists] [nProbe]` */
object PqBench {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val nVecs = if (args.length > 0) args(0).toLong else 1000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val nLists = if (args.length > 2) args(2).toInt else 64
    val nProbe = if (args.length > 3) args(3).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic pseudo-random corpus: dim uniform floats in [-0.5, 0.5)
    // per id, derived from xxhash64(id, dimIndex)
    def synth(n: Long): DataFrame =
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          ((pmod(xxhash64(col("id"), i), lit(1000000L)).cast("double") / 1e6)
            - 0.5).cast("float")).as("embedding"))

    val root = java.nio.file.Files.createTempDirectory("pq_bench").toString
    val corpus = synth(nVecs)
    val sample = corpus.filter(pmod(xxhash64(col("vec_id")), lit(20)) === 0)
      .limit(50000)
    val (pq, tTrain) = timed(Similarity.pqTrain(sample, m = 8, ksub = 16, iters = 3))
    val centroids = Similarity.ivfCodebook(corpus, nLists)
    val (_, tWrite) = timed(Similarity.ivfWriteAtRest(
      corpus, centroids, s"$root/corpus.parquet", pqModel = pq))
    println(f"[pq-bench] n=$nVecs dim=$dim: train=$tTrain%.1fs seed-write=$tWrite%.1fs")

    // the at-rest byte claim, measured: the candidate pass's two possible
    // column sets written as real parquet (same codec, same rows)
    def dirBytes(p: String): Long = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    }
    val enc = Similarity.pqEncode(corpus, pq)
    enc.select("vec_id", "embedding").write.mode("overwrite").parquet(s"$root/raw_cols")
    enc.select("vec_id", "pq_code").write.mode("overwrite").parquet(s"$root/code_cols")
    val (rawB, codeB) = (dirBytes(s"$root/raw_cols"), dirBytes(s"$root/code_cols"))
    println(f"[pq-bench-bytes] candidate-scan columns at rest: raw (id+vec) " +
      f"${rawB / 1e6}%.0f MB vs codes (id+code) ${codeB / 1e6}%.0f MB -> " +
      f"${rawB.toDouble / codeB}%.1fx less to read/store")

    val probes = synth(8).select(col("vec_id").as("probe_id"),
      col("embedding").as("probe_vec"))
    // warm both paths once (codegen + FS metadata), then measure
    for (round <- 0 to 1) {
      val (nRaw, tRaw) = timed(Similarity.ivfTopKAtRest(spark,
        s"$root/corpus.parquet", probes, k = 10, nProbe = nProbe,
        idCol = "vec_id", vecCol = "embedding").count())
      val (nPq, tPq) = timed(Similarity.ivfPqTopKAtRest(spark,
        s"$root/corpus.parquet", probes, k = 10, nProbe = nProbe,
        rerank = 50).count())
      val tag = if (round == 0) "warmup" else "measured"
      val scanned = nVecs.toDouble * nProbe / nLists
      println(f"[pq-bench-$tag] raw-IVF probe: $tRaw%.2fs ($nRaw rows); " +
        f"IVF-PQ probe: $tPq%.2fs ($nPq rows); speedup ${tRaw / tPq}%.2fx " +
        f"over ~${scanned / 1e6}%.1fM candidate rows " +
        f"(code bytes/vec = 8 vs ${dim * 4} raw)")
    }

    // BYTES ACTUALLY READ, per probe stage, through the countfs:// counting
    // proxy over the same at-rest table (no copy — the scheme just routes
    // reads through the counters). On an object store bytes requested ≈
    // bytes billed and fetched: this table, not local wall-clock, is where
    // the PQ win lives (page cache hides it locally).
    CountingFileSystem.register(spark.sparkContext.hadoopConfiguration)
    val cpath = s"countfs://$root/corpus.parquet"
    CountingFileSystem.reset()
    Similarity.ivfTopKAtRest(spark, cpath, probes, k = 10, nProbe = nProbe,
      idCol = "vec_id", vecCol = "embedding").count()
    val rawRead = CountingFileSystem.bytesRead.get
    var adcStart = -1L
    var adcEnd = -1L
    val pqRead =
      try {
        Similarity.onPqAdcPlan = _ => adcStart = CountingFileSystem.bytesRead.get
        Similarity.onPqAdcDone = () => adcEnd = CountingFileSystem.bytesRead.get
        CountingFileSystem.reset()
        Similarity.ivfPqTopKAtRest(spark, cpath, probes, k = 10,
          nProbe = nProbe, rerank = 50).count()
        CountingFileSystem.bytesRead.get
      } finally {
        Similarity.onPqAdcPlan = _ => ()
        Similarity.onPqAdcDone = () => ()
      }
    val adcBytes = adcEnd - adcStart
    println(f"[pq-bench-io] raw-IVF probe read ${rawRead / 1e6}%.1f MB; " +
      f"IVF-PQ probe: plan+sidecars ${adcStart / 1e6}%.1f MB, ADC candidate " +
      f"pass ${adcBytes / 1e6}%.1f MB (${rawRead.toDouble / adcBytes}%.1fx " +
      f"less than raw), rerank point-fetch ${(pqRead - adcEnd) / 1e6}%.1f MB, " +
      f"total ${pqRead / 1e6}%.1f MB (${rawRead.toDouble / pqRead}%.1fx less)")

    // the SERVING deployment shape, bytes-measured end to end: a
    // codes-only ANN table + an id-SORTED external vector store written
    // for point reads (tight page row bounds so the chunked-In pushdown
    // skips pages; see InPushdownProbe) — the fetch stops re-reading the
    // wanted lists and becomes candidate-sized
    spark.sparkContext.hadoopConfiguration.setInt("parquet.page.row.count.limit", 512)
    corpus.sortWithinPartitions("vec_id").write.parquet(s"$root/store")
    spark.sparkContext.hadoopConfiguration.setInt("parquet.page.row.count.limit", 20000)
    Similarity.ivfWriteAtRest(corpus, centroids, s"$root/codes.parquet",
      pqModel = pq, codesOnly = true)
    val extStore = spark.read.parquet(s"countfs://$root/store")
    val codesPath = s"countfs://$root/codes.parquet"
    adcStart = -1L; adcEnd = -1L
    val servRead =
      try {
        Similarity.onPqAdcPlan = _ => adcStart = CountingFileSystem.bytesRead.get
        Similarity.onPqAdcDone = () => adcEnd = CountingFileSystem.bytesRead.get
        CountingFileSystem.reset()
        Similarity.ivfPqTopKAtRest(spark, codesPath, probes, k = 10,
          nProbe = nProbe, rerank = 50, rerankFrom = extStore).count()
        CountingFileSystem.bytesRead.get
      } finally {
        Similarity.onPqAdcPlan = _ => ()
        Similarity.onPqAdcDone = () => ()
      }
    println(f"[pq-bench-serving] codes-only table + id-sorted store: ADC " +
      f"${(adcEnd - adcStart) / 1e6}%.1f MB, point-fetch " +
      f"${(servRead - adcEnd) / 1e6}%.1f MB, total ${servRead / 1e6}%.1f MB " +
      f"(${rawRead.toDouble / servRead}%.1fx less than the raw probe)")
    spark.stop()
  }
}
