package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.Tables

/**
 * Residual product quantization (FAISS-style IVF-PQ): codes quantize
 * `normalized(v) − centroid[list]` instead of the raw vector, and probes
 * score `p̂·c_list + ADC(residual)` — the exact probe-to-centroid term plus
 * the quantized remainder. Verdicts the DuckDB oracle can't give:
 *  - the residual kernel's geometry (hand-computed residuals, loud
 *    out-of-range list ids, the zero-vector convention),
 *  - the model flag's travel through every write/maintenance path,
 *  - at-rest == in-memory parity (the q_sim_ivfpq_residual design),
 *  - the recall claim itself: residual ADC selection ≥ raw ADC selection
 *    against brute-force truth on the unclustered gaussian worst case.
 */
class PqResidualSpec extends SparkSpec {

  lazy val emb: DataFrame = Tables.t(spark, sf, "embeddings")

  private def probesOf(df: DataFrame, n: Int): DataFrame =
    df.filter(col("vec_id") < n)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))

  test("ivf_residual kernel: normalized(v) - centroid[list], zero-vector " +
      "and out-of-range conventions") {
    import spark.implicits._
    val cents = Seq(Seq(1.0f, 0.0f, 0.0f, 0.0f), Seq(0.0f, 0.5f, 0.5f, 0.0f))
    val df = Seq(
      (0L, Array(3.0f, 0.0f, 4.0f, 0.0f), 0),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f), 1) // zero vector: residual = -c
    ).toDF("id", "v", "list_id")
    val got = df.select(col("id"),
        graft.functions.VectorFunctions.ivf_residual(col("v"), col("list_id"), cents).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // |v0| = 5 → v̂ = (0.6, 0, 0.8, 0); minus ĉ0 = c0 = (1,0,0,0)
    val r0 = got(0L)
    assert(math.abs(r0(0) - (-0.4)) < 1e-6 && math.abs(r0(2) - 0.8) < 1e-6)
    // zero vector: residual = −ĉ1 = −(0, .5, .5, 0)/√.5
    val r1 = got(1L)
    val s = 1.0 / math.sqrt(0.5)
    assert(math.abs(r1(0)) < 1e-9 && math.abs(r1(1) + 0.5 * s) < 1e-9 &&
      math.abs(r1(2) + 0.5 * s) < 1e-9 && math.abs(r1(3)) < 1e-9)
    // out-of-range list id is a loud error, not a silent wrong residual
    val bad = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 7)).toDF("id", "v", "list_id")
    val e = intercept[Exception] {
      bad.select(graft.functions.VectorFunctions.ivf_residual(
        col("v"), col("list_id"), cents)).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("out of range")), s"got: $msgs")
  }

  test("model flag: residual travels with the persisted model; raw and " +
      "pre-flag files read as non-residual") {
    val dir = tempDir("pq_flag")
    val cents = Similarity.ivfCodebook(emb, nLists = 8)
    val pqRaw = Similarity.pqTrain(emb, m = 8, ksub = 16, iters = 2)
    Similarity.pqWriteModel(spark, s"$dir/raw", pqRaw)
    assert(!Similarity.pqModelResidual(spark, s"$dir/raw"))
    val pqRes = Similarity.pqTrainResidual(emb, cents, m = 8, ksub = 16, iters = 2)
    Similarity.pqWriteModel(spark, s"$dir/res", pqRes, residual = true)
    assert(Similarity.pqModelResidual(spark, s"$dir/res"))
    assert(Similarity.pqReadModel(spark, s"$dir/res") == pqRes,
      "the flag must not disturb the float-bits roundtrip")
    // determinism: the residual trainer is run-to-run stable like pqTrain
    assert(Similarity.pqTrainResidual(emb, cents, m = 8, ksub = 16, iters = 2) == pqRes)
  }

  test("at-rest residual probe == in-memory residual comparator " +
      "(the q_sim_ivfpq_residual design)") {
    val dir = tempDir("pqres_rest") + "/corpus"
    val cents = Similarity.ivfCodebook(emb, nLists = 8)
    val pq = Similarity.pqTrainResidual(emb, cents, m = 8, ksub = 16, iters = 3)
    Similarity.ivfWriteAtRest(emb, cents, dir, pqModel = pq, pqResidual = true)
    assert(Similarity.pqModelResidual(spark, graft.operators.AtRest.resolve(spark, dir)))
    val probes = probesOf(emb, 5)
    val atRest = Similarity.ivfPqTopKAtRest(spark, dir, probes, k = 5,
      nProbe = 4, rerank = 20)
    val inMem = Similarity.ivfPqTopK(emb, probes, cents, pq, k = 5,
      nProbe = 4, rerank = 20, residual = true)
    val diff = atRest.exceptAll(inMem).unionAll(inMem.exceptAll(atRest))
    assert(atRest.count() == 25 && diff.count() == 0)
  }

  test("lifecycle: append/ingest/enablePq/retrain keep the residual " +
      "convention; retrain re-encodes under the NEW centroids") {
    val dir = tempDir("pqres_life") + "/corpus"
    val cents = Similarity.ivfCodebook(emb, nLists = 8)
    val pq = Similarity.pqTrainResidual(emb, cents, m = 8, ksub = 16, iters = 2)
    // migrate a live plain-IVF table to RESIDUAL PQ
    Similarity.ivfWriteAtRest(emb, cents, dir)
    Similarity.ivfEnablePq(spark, dir, pq, residual = true)
    assert(Similarity.pqModelResidual(spark, graft.operators.AtRest.resolve(spark, dir)))
    // append encodes residually (near-copy of vec 1 must surface via ADC)
    val extra = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 900000).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.0f) + lit(0.02f)).as("embedding"))
    Similarity.ivfAppendAtRest(extra, cents, dir)
    // rerank wide enough to cover both probed lists: the verdict is then
    // exact-cosine over every candidate — it passes iff the APPEND PATH
    // encoded/attributed the rows correctly (the plumbing under test),
    // independent of ADC selection noise on this worst-case fixture
    val probe = emb.filter(col("vec_id") === 1)
      .select((col("vec_id") + 800000).as("probe_id"), col("embedding").as("probe_vec"))
    val got = Similarity.ivfPqTopKAtRest(spark, dir, probe, k = 2, nProbe = 2,
      rerank = 400).collect()
    assert(got.map(_.getLong(1)).toSet == Set(1L, 900001L) &&
      got.forall(_.getDouble(2) > 0.98),
      s"appended near-copy not found through residual codes: ${got.mkString(";")}")
    // the exactly-once ingest path encodes residually too
    val novel = emb.filter(col("vec_id") >= 100 && col("vec_id") < 103)
      .select((col("vec_id") + 920000).as("vec_id"),
        transform(col("embedding"), x => x * lit(-1.0f)).as("embedding"))
    assert(Similarity.ivfIngestBatch(novel, cents, dir,
      threshold = 0.999, batchId = 3L) == 3)
    assert(Similarity.ivfRead(spark, dir).filter(col("pq_code").isNull).count() == 0)
    // retrain: new codebook ⇒ every residual code re-derives AND the
    // residual subquantizers RETRAIN against the new centroids (r14
    // advice: re-encoding with the old model under new lists silently
    // drifts ADC recall across retrains); the at-rest probe must equal
    // the in-memory comparator under the NEW centroids + NEW model
    val newCb = Similarity.ivfRetrain(spark, dir, nLists = 8, iters = 1)
    assert(Similarity.pqModelResidual(spark, graft.operators.AtRest.resolve(spark, dir)),
      "retrain must carry the residual flag into the new version")
    val newPq = Similarity.ivfPqModel(spark, dir).get
    assert(newPq != pq,
      "retrain must retrain the residual subquantizers against the new " +
        "centroids, not carry the old-centroid model")
    assert(newPq.length == pq.length && newPq.head.length == pq.head.length,
      "retrained model must keep the table's m and ksub")
    val full = Similarity.ivfRead(spark, dir)
      .select("vec_id", "embedding").dropDuplicates("vec_id")
    val probes = probesOf(emb, 5)
    val atRest = Similarity.ivfPqTopKAtRest(spark, dir, probes, k = 5,
      nProbe = 4, rerank = 20)
    val inMem = Similarity.ivfPqTopK(full, probes, newCb, newPq, k = 5,
      nProbe = 4, rerank = 20, residual = true)
    val diff = atRest.exceptAll(inMem).unionAll(inMem.exceptAll(atRest))
    assert(diff.count() == 0,
      "retrained residual table desynced from the in-memory comparator")
  }

  test("residual flag mismatch is caught loudly: a raw-trained model cannot " +
      "be declared residual, nor a residual-trained one raw") {
    // CLUSTERED data makes the conventions decisively distinguishable:
    // residuals are tiny offsets near zero, raw vectors sit on the unit
    // sphere — a mismatched flag fits the opposite geometry far better
    val clustered = emb.limit(200).select(col("vec_id"),
      transform(sequence(lit(0), lit(15)), i =>
        (when(pmod(col("vec_id"), lit(4)) === pmod(i, lit(4)), lit(1.0f))
          .otherwise(lit(0.0f))
          + (pmod(xxhash64(col("vec_id"), i), lit(100)).cast("float") / lit(2000.0f))
        ).cast("float")).as("embedding"))
    val cents = Similarity.ivfTrainKmeans(clustered, nLists = 4, iters = 3)
    val rawPq = Similarity.pqTrain(clustered, m = 4, ksub = 8, iters = 3)
    val resPq = Similarity.pqTrainResidual(clustered, cents, m = 4, ksub = 8, iters = 3)
    val okDir = tempDir("pqres_flag") + "/ok"
    // correct flags pass
    Similarity.ivfWriteAtRest(clustered, cents, okDir, pqModel = resPq,
      pqResidual = true)
    // a raw model declared residual fails loudly at seed time
    assert(intercept[IllegalArgumentException] {
      Similarity.ivfWriteAtRest(clustered, cents,
        tempDir("pqres_flag") + "/bad1", pqModel = rawPq, pqResidual = true)
    }.getMessage.contains("RAW convention"))
    // a residual model declared raw fails loudly at migration time
    val dir2 = tempDir("pqres_flag") + "/bad2"
    Similarity.ivfWriteAtRest(clustered, cents, dir2)
    assert(intercept[IllegalArgumentException] {
      Similarity.ivfEnablePq(spark, dir2, resPq, residual = false)
    }.getMessage.contains("RESIDUAL convention"))
    // and the matching migration passes
    Similarity.ivfEnablePq(spark, dir2, rawPq, residual = false)
  }

  test("ivf_residual: an over-length input fails loudly instead of " +
      "silently truncating") {
    import spark.implicits._
    val cents = Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    val df = Seq((0L, Array(1.0f, 2.0f, 3.0f), 0)).toDF("id", "v", "list_id")
    val e = intercept[Throwable] {
      df.select(graft.functions.VectorFunctions.ivf_residual(
        col("v"), col("list_id"), cents)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("truncated")),
      s"expected the over-length loud error, got: ${messages(e).mkString(" | ")}")
  }

  /** ADC selection recall@10 vs brute-force truth over `corpus`, all
   *  lists probed (isolates PQ quantization quality from IVF pruning).
   *  rerank = 0 ⇒ the candidate set IS the ADC top-k. */
  private def adcRecall(corpus: DataFrame, cents: Seq[Seq[Float]],
      residual: Boolean): Double = {
    val probes = probesOf(corpus, 10)
    val truth = Similarity.bruteForceTopK(corpus, probes, k = 10)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq =
      if (residual) Similarity.pqTrainResidual(corpus, cents, m = 8, ksub = 16, iters = 3)
      else Similarity.pqTrain(corpus, m = 8, ksub = 16, iters = 3)
    val got = Similarity.ivfPqTopK(corpus, probes, cents, pq, k = 10,
      nProbe = cents.length, rerank = 0, residual = residual)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (truth intersect got).size.toDouble / truth.size
  }

  test("residual ADC selection beats raw ADC selection on CLUSTERED " +
      "embeddings (the real-corpus regime residual PQ exists for)") {
    import spark.implicits._
    // deterministic clustered corpus: 8 centers drawn from the fixture,
    // members = center + 0.25 × another fixture vector (both unit-scale
    // after normalization, so within-cluster spread ≪ between-cluster)
    val base = emb.orderBy("vec_id").limit(400)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val centers = base.take(8).map(_._2)
    val members = base.drop(8).zipWithIndex.map { case ((id, noise), i) =>
      val c = centers(i % 8)
      (id, c.indices.map(t => c(t) + 0.25f * noise(t)).toArray)
    }
    val corpus = members.toSeq.toDF("vec_id", "embedding")
    val cents = Similarity.ivfTrainKmeans(corpus, nLists = 8, iters = 2)
    val raw = adcRecall(corpus, cents, residual = false)
    val res = adcRecall(corpus, cents, residual = true)
    info(f"clustered ADC-only recall@10: raw=$raw%.3f residual=$res%.3f")
    assert(res > raw,
      f"residual recall $res%.3f did not beat raw $raw%.3f on clustered data " +
        "— the within-cell residual should quantize strictly finer there")
  }

  test("gaussian worst case measured honestly: residual ADC stays within " +
      "the raw model's band (no structure for the coarse quantizer to remove)") {
    val cents = Similarity.ivfCodebook(emb, nLists = 8)
    val raw = adcRecall(emb, cents, residual = false)
    val res = adcRecall(emb, cents, residual = true)
    info(f"gaussian ADC-only recall@10: raw=$raw%.3f residual=$res%.3f")
    // isotropic data is the regime where residual CANNOT win (‖v̂ − ĉ‖ ≈
    // √(2−2cosθ) exceeds ‖v̂‖ = 1 once within-list cosθ < 0.5, and 8 wide
    // lists on 64-dim gaussian sit right there) — assert it does not
    // collapse either: the exact p̂·ĉ term keeps it within the raw band.
    // The production rerank path returns exact cosines in both regimes.
    assert(res >= raw - 0.15,
      f"residual recall $res%.3f collapsed vs raw $raw%.3f on gaussian data")
  }

  test("replicas=2 residual table: per-list codes, deterministic " +
      "max-collapse, planted copy found") {
    val dir = tempDir("pqres_rep") + "/corpus"
    val cents = Similarity.ivfCodebook(emb, nLists = 8)
    val pq = Similarity.pqTrainResidual(emb, cents, m = 8, ksub = 16, iters = 2)
    Similarity.ivfWriteAtRest(emb, cents, dir, replicas = 2,
      pqModel = pq, pqResidual = true)
    // a replicated vector's two rows carry DIFFERENT codes (the residual
    // to each of its lists) — that's the convention, not corruption
    val codesPerId = Similarity.ivfRead(spark, dir)
      .groupBy("vec_id").agg(countDistinct("pq_code").as("n"))
    assert(codesPerId.filter(col("n") > 1).count() > 0,
      "expected at least one vector whose two replicas encode differently")
    val probes = probesOf(emb, 5)
    val a = Similarity.ivfPqTopKAtRest(spark, dir, probes, k = 5,
      nProbe = 2, rerank = 20).collect().toSeq
    val b = Similarity.ivfPqTopKAtRest(spark, dir, probes, k = 5,
      nProbe = 2, rerank = 20).collect().toSeq
    assert(a == b, "replica max-collapse must be deterministic")
    assert(a.size == 25)
  }
}
