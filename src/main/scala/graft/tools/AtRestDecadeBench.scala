package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * Decade-up evidence for the AT-REST vector family:
 * `runMain graft.tools.AtRestDecadeBench [nVecs] [nLists] [planesPerTable]`
 * (defaults 500000 / 64 / auto). Run at 500k and 5M (one decade) and
 * compare rows in SCALE.md.
 *
 * Seeds a LEDGERED IVF-PQ table (full layout) at ~nVecs vectors, then
 * measures the five operators a production fleet exercises, with the
 * expected decade shape of each:
 *
 *  - `ivfPqTopKAtRest` (16 probes, nProbe 4, rerank 50): prices by the
 *    probed lists' CODES (~nVecs/nLists × nProbe rows of m bytes) —
 *    grows with list size when nLists is held fixed; production grows
 *    nLists with the table;
 *  - `ivfIngestBatch` (1000 arrivals): batch-proportional — FLAT;
 *  - `ivfLedgerCard`: O(committed batches × sources) ledger rows — FLAT;
 *  - `ivfRecheckIncremental` (window = the one new batch): the pair
 *    search signs the table once (one scan) but joins only the new ids'
 *    buckets — scan-bound, shallow growth;
 *  - `ivfRecheck` (FULL sweep): the deliberate whole-table deep clean —
 *    ~LINEAR when the LSH key space scales with the corpus (see below),
 *    the honest row.
 *
 * LSH sizing matters at scale: with planesPerTable FIXED, a decade-up
 * multiplies per-bucket load 10× and candidate pairs ~100× (the key
 * space saturates). Since r17 the seed AUTO-SIZES the scheme
 * (planes ≈ log2(n)+1, tables holding the design recall —
 * [[Similarity.autoLshPlanes]]/[[autoLshTables]]), records it in
 * `_meta.json`, and PERSISTS the signatures at rest — so the rechecks
 * here pass no LSH knobs at all: the incremental pass joins the
 * persisted signatures (no signing, no vector read outside candidates)
 * and the full sweep measures the operator, not a saturated key space.
 * The optional [planesPerTable] arg pins the seed scheme for A/B runs.
 *
 * Corpus: sf0.1's 2000 embeddings replicated with per-replica
 * deterministic sign-flip masks (expected cross-replica cosine ~0.1 —
 * replicated-identical vectors would hand the sweep degenerate
 * maxBucket-capped buckets and measure the cap, not the operator).
 * Rechecks run at threshold 0.999: at 5M the n²-tail of same-base
 * sign-flip pairs (identical |v_i| profiles, random ± walk) produces a
 * handful of GENUINE ≥0.95 cosine collisions, whose drop-rewrite would
 * contaminate the pure-search timing — 0.999 has no reachable pair, so
 * both scales measure search cost alone (drops = 0, no rewrite).
 */
object AtRestDecadeBench {
  def main(args: Array[String]): Unit = {
    val nVecs = if (args.length > 0) args(0).toLong else 500000L
    val nLists = if (args.length > 1) args(1).toInt else 64
    val spark = BenchHarness.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val planes = if (args.length > 2) args(2).toInt else 0 // 0 = auto-size

    val root = java.nio.file.Files.createTempDirectory("atrest_decade").toString
    val path = s"$root/corpus.parquet"
    val rawPath = s"$root/raw.parquet"

    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val baseN = base.count()
    val factor = math.max(1L, nVecs / baseN)

    /** `reps` key-shifted, sign-flip-decorrelated replicas starting at
     *  replica index `from` (arrivals use a disjoint range). */
    def replicate(from: Long, reps: Long): DataFrame =
      base.crossJoin(spark.range(from, from + reps).select(col("id").as("_r")))
        .select((col("vec_id") + col("_r") * baseN).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(pmod(xxhash64(col("_r"), i), lit(3)) === 0, -x).otherwise(x))
            .as("embedding"),
          pmod(col("label"), lit(4)).cast("string").as("src"))

    // materialize the synthetic corpus once (untimed) — training and the
    // seed write must price parquet scans, not the generator pipeline
    replicate(0L, factor).write.mode("overwrite").parquet(rawPath)
    val corpus = spark.read.parquet(rawPath)
    val n = corpus.count()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (_, seedSec) = time {
      val cb = Similarity.ivfTrainKmeans(corpus, nLists = nLists, iters = 2,
        maxTrainRows = 65536)
      val pq = Similarity.pqTrain(corpus, m = 8, ksub = 16, iters = 3,
        maxTrainRows = 16384)
      Similarity.ivfWriteAtRest(corpus, cb, path, ledgerBy = "src", pqModel = pq,
        lshPlanes = planes)
    }
    val scheme = Similarity.lshSchemeOf(spark, path).get

    val probes = corpus.limit(16)
      .select((col("vec_id") + 900000000L).as("probe_id"),
        col("embedding").as("probe_vec"))
      .localCheckpoint(true)
    val (probeRows, probeSec) = time {
      Similarity.ivfPqTopKAtRest(spark, path, probes, k = 10, nProbe = 4,
        rerank = 50).queryExecution.toRdd.count()
    }

    // 1000 novel arrivals from a disjoint replica range (cosine ~0.1 to
    // everything at rest — all admit, the batch-proportional shape)
    val batch = replicate(factor + 7L, math.max(1L, 1000L / baseN))
      .limit(1000).localCheckpoint(true)
    val (admitted, ingestSec) = time {
      Similarity.ivfIngestBatch(batch, path, threshold = 0.95, nProbe = 4,
        idCol = "vec_id", vecCol = "embedding", batchId = 0L)
    }

    val (cardRows, cardSec) = time {
      Similarity.ivfLedgerCard(spark, path).collect().length
    }

    // no LSH knobs: both passes join the PERSISTED signatures under the
    // meta-recorded scheme (the incremental one signs nothing at all)
    val (incRemoved, incSec) = time {
      Similarity.ivfRecheckIncremental(spark, path, threshold = 0.999)
    }

    val (fullRemoved, fullSec) = time {
      Similarity.ivfRecheck(spark, path, threshold = 0.999)
    }

    println(f"""{"bench":"atrest-decade","n_vecs":$n,"n_lists":$nLists,"planes":${scheme._1},"tables":${scheme._2},"seed_s":$seedSec%.1f,"probe_s":$probeSec%.2f,"probe_rows":$probeRows,"ingest_batch_s":$ingestSec%.2f,"admitted":$admitted,"ledger_card_s":$cardSec%.2f,"card_rows":$cardRows,"recheck_incremental_s":$incSec%.2f,"recheck_full_s":$fullSec%.2f,"removed":[$incRemoved,$fullRemoved]}""")
    assert(admitted == 1000, s"expected all 1000 arrivals admitted: $admitted")
    assert(incRemoved == 0 && fullRemoved == 0,
      "no pair reaches cosine 0.999 by construction")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
