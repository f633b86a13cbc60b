package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Character-trigram language-model quality scoring — the cheap stand-in
 * for the KenLM-perplexity filter every large corpus pipeline runs: train
 * trigram/bigram counts on a reference corpus, score each document by the
 * mean log-probability of its trigrams under additive smoothing, drop the
 * low-scoring tail (gibberish, wrong-language, OCR noise).
 *
 * The normalized alphabet ([a-z0-9 ], V = 37) BOUNDS the model: at most
 * 37³ ≈ 50k trigram rows and 37² bigram rows regardless of corpus size —
 * so the trained counts broadcast to the scoring join and the whole score
 * is two aggregates + two broadcast joins + one per-doc average. No
 * collect of data, no UDF; the trigram explode is scan-local.
 */
object LanguageModel {

  /** Lowercased, non-alphanumerics collapsed to single spaces, trimmed —
   *  the shared normalization (mirrored verbatim in the DuckDB oracle). */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  private val V = 37.0 // |[a-z0-9 ]|: the smoothing vocabulary of the 3rd char
  private val Alpha = 0.5

  /** (id, tri) rows: every char trigram of the normalized text, in
   *  position order (docs shorter than 3 normalized chars emit nothing). */
  def trigrams(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val norm = normalize(col(textCol))
    docs.select(col(idCol), norm.as("_n"))
      // the short-doc guard must be an explicit empty array: Spark's
      // sequence(1, 0) COUNTS DOWN (implicit step -1) rather than being
      // empty, which would hand every <3-char doc two phantom trigrams
      .select(col(idCol), explode(
        when(length(col("_n")) >= 3,
          transform(sequence(lit(1), length(col("_n")) - 2),
            i => col("_n").substr(i, lit(3))))
          .otherwise(array().cast("array<string>"))).as("tri"))
  }

  /**
   * Mean trigram log-probability per document of `docs` under counts
   * trained on `reference`: ln((c(tri) + α) / (c(bi) + α·V)) averaged over
   * the doc's trigram positions, where c(bi) counts the trigram PREFIX
   * bigrams of the reference (same position set, so the model is
   * self-consistent). Unseen trigrams/bigrams fall back to the smoothing
   * mass. Docs with no trigram are excluded (nothing to score).
   *
   * Laziness contract (changed in r17, noted per ADVICE): the trained
   * counts are collected EAGERLY at call time (the model is pinned to the
   * reference as of this call), but the RETURNED frame is lazy — each
   * action recomputes the scores from the current `docs` source. Callers
   * needing a snapshot across actions over a mutating source should
   * persist or localCheckpoint the result themselves.
   */
  def scoreDocs(docs: DataFrame, reference: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // the trained counts ARE the model: ≤ 37³ cells regardless of corpus
    // size — a bounded collect (the previous formulation broadcast exactly
    // these rows, then EXPLODED every scored doc into per-trigram rows
    // through two joins and a doc-keyed aggregation: |chars| rows per doc
    // through the plan). Collected into a dense table riding inside a
    // codegen'd expression, scoring is fully SCAN-LOCAL (guide §2.4) —
    // this is the path that runs over the whole corpus at 100 TB. The
    // prefix-bigram marginal derives inside the expression (same exact
    // LONG sums as the SQL rollup), and the kernel sums log-probs in
    // position order — the same addition order the exploded stream's
    // map-side Average produced — so scores are bit-identical.
    val tcArr = new Array[Long](37 * 37 * 37)
    trigrams(reference, textCol, idCol)
      .groupBy("tri").agg(count(lit(1)).as("tc")).collect()
      .foreach(r => tcArr(
        graft.functions.TextKernelImplLm.triIndex(r.getString(0))) = r.getLong(1))
    val norm = normalize(col(textCol))
    docs.select(col(idCol), norm.as("_n"))
      .filter(length(col("_n")) >= 3) // docs with no trigram are excluded
      .select(col(idCol),
        round(graft.functions.TextKernels.lm_mean_logp(col("_n"), tcArr.toSeq), 6)
          .as("lm_score"),
        (length(col("_n")) - 2).cast("long").as("n_trigrams"))
  }
}
