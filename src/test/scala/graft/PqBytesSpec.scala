package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.tools.CountingFileSystem

/**
 * The IVF-PQ byte claim, MEASURED (r14 verdict order #2): the whole point
 * of storing 8-byte codes beside (or instead of) the raw vectors is that
 * the ADC candidate pass reads a small fraction of the bytes the raw-vector
 * probe reads at equal nProbe/nLists. On page-cached local disk the
 * wall-clock difference is invisible (PqBench measured 0.7–1.04×); on an
 * object store, bytes requested ≈ bytes billed and fetched, so the counted
 * bytes through the `countfs://` proxy ARE the cold-storage cost model.
 */
class PqBytesSpec extends SparkSpec {

  test("IVF-PQ ADC candidate pass reads <= 1/8 the bytes of the raw-vector " +
      "probe at equal nProbe (countfs-measured)") {
    CountingFileSystem.register(spark.sparkContext.hadoopConfiguration)
    val dir = "countfs://" + tempDir("pq_bytes") + "/corpus"
    // hash-derived corpus, big enough that column bytes dominate footers:
    // 20k rows × 64-dim float32 ≈ 5 MB of vector pages at rest
    val corpus = spark.range(20000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        ((pmod(xxhash64(col("id"), i), lit(1000000L)).cast("double") / 1e6)
          - 0.5).cast("float")).as("embedding"))
    val cents = Similarity.ivfCodebook(corpus, nLists = 8)
    val pq = Similarity.pqTrain(corpus, m = 8, ksub = 16, iters = 2,
      maxTrainRows = 2000)
    Similarity.ivfWriteAtRest(corpus, cents, dir, pqModel = pq)
    val probe = corpus.filter(col("vec_id") === 7)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))

    // raw-vector probe: reads (id, embedding) pages of the wanted lists
    CountingFileSystem.reset()
    Similarity.ivfTopKAtRest(spark, dir, probe, k = 10, nProbe = 2,
      idCol = "vec_id", vecCol = "embedding").collect()
    val rawBytes = CountingFileSystem.bytesRead.get

    // IVF-PQ probe: the seams isolate the ADC candidate pass (executed by
    // the eager localCheckpoint between them) from the sidecar reads
    // before it and the rerank point-fetch after it
    var adcStart = -1L
    var adcEnd = -1L
    val totalPq =
      try {
        Similarity.onPqAdcPlan = _ => adcStart = CountingFileSystem.bytesRead.get
        Similarity.onPqAdcDone = () => adcEnd = CountingFileSystem.bytesRead.get
        CountingFileSystem.reset()
        Similarity.ivfPqTopKAtRest(spark, dir, probe, k = 10, nProbe = 2,
          rerank = 50).collect()
        CountingFileSystem.bytesRead.get
      } finally {
        Similarity.onPqAdcPlan = _ => ()
        Similarity.onPqAdcDone = () => ()
      }
    assert(adcStart >= 0 && adcEnd > adcStart, "seams must have fired")
    val adcBytes = adcEnd - adcStart
    val rerankBytes = totalPq - adcEnd
    info(f"raw probe read $rawBytes%,d B; PQ probe: ADC pass $adcBytes%,d B " +
      f"(${rawBytes.toDouble / adcBytes}%.1fx less), rerank fetch " +
      f"$rerankBytes%,d B, total $totalPq%,d B")
    assert(rawBytes > 500000, s"raw probe read only $rawBytes B — fixture too small")
    assert(adcBytes * 8 <= rawBytes,
      s"ADC candidate pass should read <= 1/8 of the raw probe's bytes: " +
        s"$adcBytes vs $rawBytes")
    // HONEST granularity caveat on the rerank fetch: at this fixture's
    // file sizes each list is one row group with one page per column
    // chunk, so the 50 scattered candidate ids force the whole wanted
    // lists' vector pages to load — the fetch reads ≈ what the raw probe
    // reads, and the TOTAL lands near raw. The fetch shrinks only when
    // candidates/row-groups < 1 (real tables: thousands of row groups per
    // list) or when rerank is served from an id-addressable store
    // (codes-only layout). Bound it loosely so a regression to a
    // FULL-TABLE fetch (≈ 4x raw here: 8 lists vs 2) still fails.
    assert(totalPq <= (rawBytes * 1.25).toLong,
      s"full PQ probe read $totalPq B vs raw $rawBytes B — the rerank " +
        "fetch widened past the wanted lists")
  }
}
