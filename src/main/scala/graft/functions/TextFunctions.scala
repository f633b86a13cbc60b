package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis building blocks for LLM training-data pipelines: tokenizing,
 * n-gram shingling, language ID, quality scoring, fingerprinting.
 *
 * Everything here composes Spark built-ins (split / transform / aggregate /
 * xxhash64 …), so the whole pipeline stays inside whole-stage codegen and
 * needs no UDF — each derived column is a scan-local map at any scale.
 */
object TextFunctions {

  /** Lowercased word tokens (letters+digits runs). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /**
   * BPE-ish token count: words, numbers and punctuation counted separately —
   * the standard cheap proxy for subword token counts.
   */
  def tokenCountBpeish(text: Column): Column =
    size(filter(split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"), t => trim(t) =!= ""))

  /** Character n-gram shingles of the normalized text (distinct). */
  def shingles(text: Column, n: Int): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    val count = greatest(length(norm) - (n - 1), lit(1))
    array_distinct(transform(sequence(lit(1), count), i => substring(norm, i, lit(n))))
  }

  /**
   * Word n-gram shingles (space-joined runs of n tokens, distinct).
   *
   * Built as a zip_with chain of shifted copies rather than per-index
   * `slice` calls inside a `transform` lambda: expressions captured by a
   * higher-order-function lambda are re-evaluated per ELEMENT, so the naive
   * form re-tokenized the document O(tokens) times (q_text_fingerprint was
   * 37 s at sf0.1 on ~50-token docs). Here the token array is evaluated
   * O(n) times per row, once per zip_with argument.
   */
  def wordShingles(text: Column, n: Int): Column =
    // native kernel (round 4): the zip_with/slice formulation below is the
    // DEFINITION (and what the DuckDB oracles mirror); the kernel is
    // spec-proven equal to it (TextSpec) and ~an order of magnitude cheaper,
    // because HOF lambdas are interpreted and re-evaluate the token array
    // once per zip_with argument
    TextKernels.word_shingles(text, n)

  /** The Column-function DEFINITION of [[wordShingles]], kept as the
   *  equivalence-spec reference (mirrors the oracle SQL shingle CTEs). */
  def wordShinglesColumns(text: Column, n: Int): Column = {
    val ts = tokens(text)
    val joined = (1 until n).map(k => slice(ts, lit(k + 1), greatest(size(ts) - k, lit(0))))
      .foldLeft(ts)((acc, nxt) => zip_with(acc, nxt,
        (a, b) => when(b.isNull, a).otherwise(concat(a, lit(" "), b))))
    // drop the partial tail shingles the null-padding produced; keep one
    // (possibly short) shingle for docs with fewer than n tokens
    array_distinct(slice(joined, lit(1), greatest(size(ts) - (n - 1), lit(1))))
  }

  // Tiny per-language stopword marker sets for the n-gram/stopword heuristic
  // language ID. Deliberately small + deterministic (same lists are inlined
  // into the DuckDB oracle SQL of q_text_langid).
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "as"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "por", "que", "una", "para"))

  /** Count of distinct tokens that appear in `words`. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens(text)), array(words.map(lit): _*)))

  /**
   * Heuristic language ID: the language whose stopword set has the most
   * distinct hits; ties and zero hits resolve to 'und' → first in list order.
   */
  def langId(text: Column): Column = {
    // argmax via struct ordering: (hits, -listIndex) — ties resolve to the
    // earliest language in StopwordSets order; zero hits → 'und'
    val cands = StopwordSets.zipWithIndex.map { case ((lang, words), i) =>
      struct(stopwordHits(text, words).as("hits"), lit(-i).as("prio"), lit(lang).as("lang"))
    }
    val best = greatest(cands: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /**
   * Quality score in [0,1]: mixes document length, mean word length,
   * alphanumeric ratio and stopword ratio — the classic cheap quality gates.
   * Backed by a single-pass native kernel
   * ([[graft.functions.TextKernelImpl.qualityScore]]); [[qualityScoreHof]]
   * is the definitional Column formulation the equivalence spec checks
   * the kernel against.
   */
  def qualityScore(text: Column): Column =
    graft.functions.TextKernels.quality_score(text)

  /** Reference formulation of [[qualityScore]] in pure Column functions
   *  (re-tokenizes the document five times — kept for the equivalence spec). */
  def qualityScoreHof(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(text).cast("double")
    val alnum = length(regexp_replace(text, "[^A-Za-z0-9]", "")).cast("double")
    val meanWordLen = when(nTok > 0, alnum / nTok).otherwise(0.0)
    val stopRatio = when(nTok > 0,
      stopwordHits(text, StopwordSets.head._2).cast("double") / least(nTok, lit(10.0)))
      .otherwise(0.0)
    val lengthScore = least(nChar / 500.0, lit(1.0))
    val wordLenScore = when(meanWordLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    val alnumScore = when(nChar > 0, alnum / nChar).otherwise(0.0)
    round(lengthScore * 0.3 + wordLenScore * 0.2 + alnumScore * 0.3 + stopRatio * 0.2, 6)
  }
}
