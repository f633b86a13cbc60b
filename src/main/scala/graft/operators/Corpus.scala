package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Corpus-preparation operators a large-scale training-data pipeline needs
 * beyond dedup/similarity (SURVEY.md §2 north-star block): lexical search,
 * deterministic splits, sequence packing, per-group capping, PII redaction,
 * and repetition scoring.
 *
 * Scale shape: every operator here is one scan plus at most one shuffle on a
 * natural key (lang / user_id) or a broadcast of an O(1) stats row. No
 * collects, no UDFs — all column expressions stay inside whole-stage codegen.
 */
object Corpus {

  /** Tokenization shared with TextFunctions' oracle contract — ONE
   *  definition, delegated, so the two can never drift. */
  def tokens(text: Column): Column = TextFunctions.tokens(text)

  /**
   * BM25 ranking of `docs` against a bag of query `terms` (Robertson/
   * Sparck-Jones idf in the +1 form Lucene uses, k1/b defaults likewise).
   *
   * Plan: one pass computes per-doc tf for each query term scan-locally (a
   * size(filter(...)) per term — no explode, no shuffle); a single global
   * aggregate reduces to ONE stats row (N, avgdl, df per term) which is
   * broadcast back; scoring is then scan-local and the top-k is
   * TakeOrderedAndProject — at 100 TB the only exchanges are the tiny
   * stats reduction and the k-row gather. Ranks are assigned on the ROUNDED
   * score with doc_id tiebreak so float ulps can't flip order vs an oracle.
   */
  def bm25Search(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 10): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("dl", size(col("t")).cast("double"))
    val withTf = terms.indices.foldLeft(toks) { case (d, i) =>
      d.withColumn(s"tf_$i",
        size(filter(col("t"), x => x === lit(terms(i)))).cast("double"))
    }.drop("t")
    val aggs = count(lit(1)).cast("double").as("n_docs") +:
      avg(col("dl")).as("avgdl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1.0).otherwise(0.0)).as(s"df_$i"))
    val stats = withTf.agg(aggs.head, aggs.tail: _*)
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i")
      val idf = log((col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) / (tf + (col("dl") / col("avgdl") * b + (1.0 - b)) * k1)
    }.reduce(_ + _)
    val scored = withTf.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 6).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id")).limit(topK)
    scored.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
        .cast("bigint"))
      .orderBy("rank")
  }

  /**
   * Deterministic train/val/test assignment from a content-independent hash
   * of the id — the standard reproducible-holdout pattern: stable across
   * runs, cluster sizes, and row order, and any engine with md5 agrees on
   * the split. First hex nibble: 0-b → train (12/16), c-d → val, e-f → test.
   */
  def hashSplit(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("h", substring(md5(col(idCol).cast("string")), 1, 1))
      .withColumn("split",
        when(col("h") <= "b", "train")
          .when(col("h") <= "d", "val")
          .otherwise("test"))
      .drop("h")

  /**
   * Benchmark decontamination — drop training docs that share ANY word
   * n-gram (default 8, the common contamination heuristic) with a
   * benchmark/eval corpus, so the training set can't leak eval answers.
   * Benchmarks are small by definition: their distinct n-grams broadcast,
   * training docs' n-grams stay scan-local (explode → broadcast semi-join
   * → anti-join on the flagged ids) — no corpus-wide text shuffle at any
   * scale.
   */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", ngram: Int = 8): DataFrame = {
    val docGrams = docs.select(col(idCol),
      explode(TextFunctions.wordShingles(col(textCol), ngram)).as("g"))
    val benchGrams = benchmark
      .select(explode(TextFunctions.wordShingles(col(textCol), ngram)).as("g"))
      .distinct()
    val contaminated = docGrams.join(broadcast(benchGrams), "g")
      .select(idCol).distinct()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }

  /**
   * The AUDIT companion to [[decontaminate]]: per BENCHMARK document, how
   * many training documents share at least one word n-gram with it and
   * how many distinct grams leak. Decontamination DROPS; a release review
   * also wants the evidence — which eval items are compromised and how
   * badly. Benchmark docs with zero leakage report (0, 0).
   *
   * Same plan shape as [[decontaminate]] (bench grams broadcast, training
   * grams scan-local, one aggregate on the hit stream), so the corpus
   * never shuffles text at any scale.
   */
  def contaminationReport(docs: DataFrame, benchmark: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", ngram: Int = 8): DataFrame = {
    val benchGrams = benchmark.select(col(idCol).as("bench_doc_id"),
        explode(TextFunctions.wordShingles(col(textCol), ngram)).as("g"))
      .distinct()
    val docGrams = docs.select(col(idCol).as("_doc"),
      explode(TextFunctions.wordShingles(col(textCol), ngram)).as("g"))
    val hits = docGrams.join(broadcast(benchGrams), "g")
      .groupBy("bench_doc_id")
      .agg(countDistinct(col("_doc")).as("n_contaminated_docs"),
        countDistinct(col("g")).as("n_leaked_grams"))
    benchmark.select(col(idCol).as("bench_doc_id"))
      .join(hits, Seq("bench_doc_id"), "left")
      .select(col("bench_doc_id"),
        coalesce(col("n_contaminated_docs"), lit(0L)).as("n_contaminated_docs"),
        coalesce(col("n_leaked_grams"), lit(0L)).as("n_leaked_grams"))
      .orderBy("bench_doc_id")
  }

  /**
   * [[decontaminate]] with a BLOOM-FILTER prefilter — the shape for when
   * the benchmark/eval gram set is too large to broadcast as a join table.
   * An aggregate builds Spark's own bloom filter over the benchmark grams
   * (one serialized binary, ≤ `spark.sql.optimizer.runtime.bloomFilter
   * .maxNumBits`, default 8 MiB — a bounded driver collect of a trained
   * model, not of data); every training gram then tests against it
   * SCAN-LOCALLY (codegen'd, no join, no broadcast table), and only the
   * surviving grams — true hits plus the filter's ~1% false positives —
   * enter the exact verification join. Bloom filters have no false
   * negatives, so the result is IDENTICAL to [[decontaminate]]: the
   * verify join (deliberately un-hinted — candidates ≪ corpus, so
   * whatever strategy Catalyst/AQE picks shuffles candidates only, never
   * the corpus gram stream) removes the false positives.
   */
  def decontaminateBloom(docs: DataFrame, benchmark: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", ngram: Int = 8,
      estimatedGrams: Long = 1000000L): DataFrame = {
    val benchGrams = benchmark
      .select(explode(TextFunctions.wordShingles(col(textCol), ngram)).as("g"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val bloom = benchGrams
      .agg(graft.functions.SketchFunctions.bloom_agg(xxhash64(col("g")), estimatedGrams))
      .head.getAs[Array[Byte]](0)
    val candGrams = docs.select(col(idCol),
        explode(TextFunctions.wordShingles(col(textCol), ngram)).as("g"))
      .filter(graft.functions.SketchFunctions.bloom_contains(bloom, xxhash64(col("g"))))
    val contaminated = candGrams.join(benchGrams, "g").select(idCol).distinct()
    val out = docs.join(contaminated, Seq(idCol), "left_anti")
    // materialize before releasing the gram cache (it fed both the bloom
    // build and the verify join)
    Dedup.materializeThenFree(out, benchGrams)
  }

  /**
   * Exact repeated-SPAN removal (the "dedup training data at substring
   * granularity" operator, à la Lee et al. 2022 but word-k-gram based
   * rather than suffix-array based): any token position covered by a
   * word-k-gram whose exact text occurs in ≥ `minDocs` DISTINCT documents
   * is dropped, and each document is rebuilt from its surviving tokens
   * (over the normalized token stream — removal makes original spacing
   * unreconstructable anyway). Within-doc repetition alone does NOT
   * trigger removal (count distinct docs, not occurrences); documents
   * shorter than k tokens pass through untouched.
   *
   * Plan, 100 TB shape: positional grams are built scan-locally (indexed
   * `transform`, no UDF) in ONE pass and NOT materialized; the
   * duplicated-span frequency test is a sorted run-length distinct-doc
   * counter over the gram key ([[flagMinDistinctRuns]] — one exchange of
   * the gram stream, state bounded by the first minDocs−1 documents'
   * rows per gram); per-doc coverage is one groupBy over the surviving
   * (id, pos) rows (`collect_set` of positions — bounded by doc length),
   * and the rebuild is one final doc-key join + scan-local indexed
   * filter. Three shuffles, all on natural keys, no collect, no UDF.
   */
  def removeRepeatedSpans(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", k: Int = 8, minDocs: Long = 2): DataFrame = {
    val toks = docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("t"))
    // the gram stream is built ONCE and the duplicate-frequency test is a
    // window distinct-doc count over the gram key — one shuffle of the
    // gram stream. The previous def-based groupBy + join-back ran the
    // tokenize + k-gram kernel twice (its dominant scan-local cost) and
    // shuffled the heavy gram strings a second time for the join
    // (guide §2.4); the distinct-doc sets per gram are bounded by the
    // docs actually sharing the span, exactly what countDistinct's
    // partial state held
    val grams = toks.filter(size(col("t")) >= k)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), size(col("t")) - k),
          i => array_join(slice(col("t"), i + 1, lit(k)), " "))).as(Seq("pos", "gram")))
    // duplicated-span test in ONE pass of the gram stream: sorted by
    // (gram, id), a streaming run-length counter keeps the rows of grams
    // reaching `minDocs` DISTINCT documents ([[flagMinDistinctRuns]]) —
    // bounded state per gram, where the r17 window `size(collect_set(id))`
    // materialized the FULL distinct doc-id set per gram in one
    // unspillable buffer only to compare its size (a boilerplate 8-gram
    // shared by 10⁸ docs at the design point is an executor OOM — r17
    // ADVICE, guide §2.5). Shuffle count is unchanged; only (id, pos)
    // survive into the coverage explode.
    val covered = flagMinDistinctRuns(grams, "gram", idCol, minDocs)
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
      .groupBy(idCol).agg(collect_set(col("p")).as("cov"))
    toks.join(covered, Seq(idCol), "left")
      .select(col(idCol), array_join(
        filter(
          transform(col("t"), (tok, i) =>
            when(col("cov").isNotNull && array_contains(col("cov"), i), lit(null))
              .otherwise(tok)),
          x => x.isNotNull), " ").as("cleaned"))
  }

  /** Rows of `df` whose `keyCol` run (one exchange, sorted within
   *  partitions by (keyCol, docCol)) spans at least `minDocs` DISTINCT
   *  non-null `docCol` values — the duplicated-span frequency test of
   *  [[removeRepeatedSpans]], streaming: a run's rows buffer only until
   *  the distinct count reaches minDocs (equal doc ids are sort-adjacent,
   *  so distinct = transition count), then the rest of the run flows
   *  through row by row. Equivalent row set to the window formulation
   *  `size(collect_set(docCol)).over(Window.partitionBy(keyCol)) >=
   *  minDocs` it replaces — null doc ids do not count toward the distinct
   *  total but pass through with a qualifying run (collect_set
   *  semantics), null keys group together (window semantics) — without
   *  materializing a per-key doc-id set (guide §2.5). */
  private def flagMinDistinctRuns(df: DataFrame, keyCol: String,
      docCol: String, minDocs: Long): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val sorted = df.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(docCol))
    val schema = sorted.schema
    val kIdx = schema.fieldIndex(keyCol)
    val dIdx = schema.fieldIndex(docCol)
    val minD = minDocs
    sorted.mapPartitions { it =>
      def sameGroup(a: Row, b: Row): Boolean = {
        val x = a.get(kIdx); val y = b.get(kIdx)
        if (x == null) y == null else x == y
      }
      new scala.collection.AbstractIterator[Row] {
        private var look: Row = if (it.hasNext) it.next() else null
        private var out: Iterator[Row] = Iterator.empty
        private var streamHead: Row = null // qualifying run still flowing
        private def load(): Unit = {
          while (!out.hasNext && (streamHead != null || look != null)) {
            if (streamHead != null) {
              // tail of a qualifying run: stream until the key changes
              if (it.hasNext) {
                val r = it.next()
                if (sameGroup(streamHead, r)) out = Iterator.single(r)
                else { look = r; streamHead = null }
              } else streamHead = null
            } else {
              val head = look
              look = null
              val buf = new scala.collection.mutable.ArrayBuffer[Row](8)
              buf += head
              var lastDoc: Any = head.get(dIdx)
              var distinct = if (lastDoc == null) 0L else 1L
              var qualified = distinct >= minD
              var scanning = !qualified
              while (scanning && it.hasNext) {
                val r = it.next()
                if (sameGroup(head, r)) {
                  val d = r.get(dIdx)
                  if (d != null && d != lastDoc) { distinct += 1; lastDoc = d }
                  buf += r
                  if (distinct >= minD) { qualified = true; scanning = false }
                } else { look = r; scanning = false }
              }
              if (qualified) { out = buf.iterator; streamHead = head }
            }
          }
        }
        def hasNext: Boolean = { load(); out.hasNext }
        def next(): Row = { load(); out.next() }
      }
    }(Encoders.row(schema))
  }

  /**
   * CCNet-style boilerplate removal: a segment (line by default) whose
   * EXACT text appears in at least `minDocs` distinct documents is
   * boilerplate — headers, navigation, cookie banners, newsletter pitches —
   * and every document is rebuilt without its boilerplate segments
   * (dropped docs come back as the empty string, never disappear).
   *
   * Plan, 100 TB shape: segments explode scan-locally with their position;
   * the document-frequency aggregate is a two-phase (partial/final)
   * count-distinct on the segment text; flagged segments anti-join back
   * (no broadcast assumption — the boilerplate set can be large); the
   * rebuild is one groupBy(doc) assembling `array_sort(collect_list(
   * struct(pos, segment)))`, so segment order is restored regardless of
   * shuffle order. Three shuffles total, all on natural keys, no collect,
   * no UDF. At extreme scale the exact count-distinct can be swapped for
   * `approx_count_distinct` — a segment's 2-vs-3-doc frequency hardly
   * needs exactness — but the default stays exact so results are
   * oracle-reproducible.
   */
  def removeBoilerplate(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minDocs: Long = 2,
      separator: String = "\n"): DataFrame = {
    val sep = java.util.regex.Pattern.quote(separator)
    val segs = docs.select(col(idCol),
      posexplode(split(col(textCol), sep)).as(Seq("pos", "seg")))
    // empty segments (blank lines / paragraph breaks) are document
    // STRUCTURE: nearly every doc contains one, so counting them would flag
    // "" as boilerplate and silently strip every paragraph break corpus-wide
    val boiler = segs.filter(length(col("seg")) > 0).groupBy("seg")
      .agg(countDistinct(col(idCol)).as("_d"))
      .filter(col("_d") >= minDocs)
      .select("seg")
    val kept = segs.join(boiler, Seq("seg"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("seg")))),
          x => x.getField("seg")),
        separator).as("_rebuilt"))
    // preserve the frame shape (like decontaminate/stratifiedSample): every
    // non-text column rides through, only textCol is replaced
    docs.join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("_rebuilt"), lit("")))
      .drop("_rebuilt")
  }

  /**
   * Deterministic per-stratum downsampling (e.g. "keep 50% of English,
   * 10% of everything else" when rebalancing a training corpus): a row
   * survives iff the first md5 byte of its id (two lowercase hex chars)
   * is below its stratum's threshold — "80" ≈ 50%, "1a" ≈ 10%. A pure
   * scan-local filter: no shuffle, no RNG state, identical membership on
   * every engine/run/cluster-size (the md5 trick [[hashSplit]] uses).
   */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      thresholds: Map[String, String], defaultThreshold: String): DataFrame = {
    val h = substring(md5(col(idCol).cast("string")), 1, 2)
    val thr = thresholds.foldLeft(lit(defaultThreshold)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(h < thr)
  }

  /**
   * Deterministic epoch shuffle — the reproducible global permutation every
   * training run needs ("same seed → same order on any cluster"): order by
   * a seeded hash of the id, id as tiebreak. Emits the hash as `sort_key`
   * rather than materializing ordinal positions: a global `row_number()`
   * collapses Spark to one partition, while ORDER BY a key is a
   * range-partitioned sort that scales — downstream sequential consumers
   * (packing, sharded export) key off the order itself. A new seed is a
   * fresh, uncorrelated permutation (md5 avalanches), identical on every
   * engine/run/cluster size (the md5 trick [[hashSplit]] uses). Null ids
   * hash via a COLLISION-FREE encoding ('v'+value, null → 'null'): a NULL
   * sort key would land NULLS FIRST on Spark but NULLS LAST on engines
   * with the other default, and coalescing to '' would collide null with
   * a genuine empty-string id and push the divergence into the tiebreak.
   */
  private[operators] def hashId(idCol: String) =
    coalesce(concat(lit("v"), col(idCol).cast("string")), lit("null"))

  def epochShuffle(df: DataFrame, idCol: String, seed: Long): DataFrame =
    df.withColumn("sort_key",
        md5(concat(lit(seed.toString), lit(":"), hashId(idCol))))
      .orderBy(col("sort_key"), col(idCol))

  /**
   * Token-budget data mixing — take documents per source until that
   * source's budget is exhausted (how corpus mixing weights become an
   * actual training set): within each source, docs in deterministic
   * md5-of-id order accumulate their cost (e.g. char or token count) and a
   * doc survives iff its RUNNING TOTAL fits the budget. One shuffle on the
   * natural source key plus a window cumsum; membership is reproducible on
   * any engine/run/cluster size. Sources skewed enough to matter are
   * exactly the ones a budget is for.
   */
  def tokenBudgetMix(df: DataFrame, sourceCol: String, idCol: String,
      costCol: String, budget: Long): DataFrame = {
    // null COSTS are dropped up front — a doc with no cost cannot be
    // budgeted, and a NULL in the ordering tiebreak would land NULLS FIRST
    // on Spark but NULLS LAST elsewhere, diverging membership
    df.filter(col(costCol).isNotNull)
      .withColumn("cum_cost", cumCost(sourceCol, idCol, costCol))
      .filter(col("cum_cost") <= budget)
  }

  /** The deterministic per-source running total both mixers share: docs in
   *  md5-of-id order accumulate `costCol`. Explicit ROWS frame (the RANGE
   *  default gives ordering ties their COMBINED peer total) and the cost
   *  column in the ordering tiebreak (duplicate ids with differing costs
   *  accumulate in a fixed order) keep membership identical on any
   *  engine/run/cluster size. Callers must drop null costs first. */
  private def cumCost(sourceCol: String, idCol: String, costCol: String) = {
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(hashId(idCol)), col(idCol), col(costCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sum(col(costCol)).over(w)
  }

  /**
   * Temperature-based mixture resampling — the multilingual-pretraining
   * reweighting (XLM/mT5 style): a source's share of the output budget is
   * proportional to `mass^alpha` rather than its raw mass, so `alpha < 1`
   * upsamples the tail relative to the head (alpha = 1 keeps natural
   * proportions, alpha = 0 gives every source an equal quota). Each source
   * then fills its quota exactly like [[tokenBudgetMix]]: docs in
   * deterministic md5-of-id order accumulate cost while the running total
   * fits. Output adds `cum_cost` and the source's computed `quota`.
   *
   * Determinism across engines: per-source quotas are derived with EXACT
   * integer arithmetic — the weight is `floor(sqrt(mass))` for the default
   * alpha 0.5 (IEEE sqrt is correctly rounded everywhere, so the floor is
   * portable ground truth; other alphas go through `pow`, which is only
   * ~1-ulp on some libms — documented, and the floor makes a boundary hit
   * astronomically unlikely) and `quota = totalBudget * w DIV sum(w)`, all
   * in BIGINT. A float Σw would be partial-sum-order-dependent and could
   * flip a quota by one cost unit between runs.
   *
   * Plan, 100 TB shape: one per-source mass aggregate (map-side combined
   * into a source-bounded frame), the Σw reduced over that bounded frame
   * and attached via a broadcast 1-row cross join, quotas broadcast back,
   * then the same single window cumsum as tokenBudgetMix. No collect, no
   * UDF; the only full-data shuffle is the window's source partitioning.
   */
  def temperatureMix(df: DataFrame, sourceCol: String, idCol: String,
      costCol: String, totalBudget: Long, alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val priced = df.filter(col(costCol).isNotNull)
    val weightOf = (mass: Column) =>
      if (alpha == 0.5) floor(sqrt(mass.cast("double"))).cast("long")
      else floor(pow(mass.cast("double"), alpha)).cast("long")
    val mass = priced.groupBy(col(sourceCol))
      .agg(sum(col(costCol)).as("_mass"))
      .withColumn("_w", weightOf(col("_mass")))
    val wsum = mass.agg(sum(col("_w")).as("_wsum"))
    // widen the multiply to DECIMAL(38,0): a multi-trillion-token budget
    // times a large sqrt-mass weight overflows Long silently; `div` on
    // decimals still returns LONG, so the output schema is unchanged. An
    // all-zero weight sum (every source's mass floors to 0) would yield
    // NULL quotas and silently drop every row — fail loudly instead.
    val quota = mass.crossJoin(broadcast(wsum))
      .select(col(sourceCol),
        when(col("_wsum").isNull || col("_wsum") === 0L,
            raise_error(lit("temperatureMix: total weight is 0 (every " +
              "source's mass^alpha floored to 0) — no quota is definable")))
          .otherwise(
            expr(s"CAST($totalBudget AS DECIMAL(38,0)) * _w div _wsum"))
          .as("quota"))
    priced
      .withColumn("cum_cost", cumCost(sourceCol, idCol, costCol))
      .join(broadcast(quota), Seq(sourceCol))
      .filter(col("cum_cost") <= col("quota"))
  }

  /**
   * Fixed-budget contiguous sequence packing, concatenate-then-chop style
   * (how LLM pretraining fills context windows): within each `groupCol`,
   * docs in `orderCol` order are laid end to end and each doc is assigned
   * the pack its FIRST cost unit lands in (`floor(start_offset / budget)`);
   * long docs flow across pack boundaries rather than forcing a new pack.
   * One shuffle on the group key, then a single window cumsum — the
   * scalable deterministic alternative to greedy bin packing (which needs a
   * sequential scan per group and packs no better on shuffled corpora).
   */
  def packSequences(df: DataFrame, groupCol: String, orderCol: String,
      costCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_cost", sum(col(costCol)).over(w))
      .withColumn("pack_id",
        floor((col("cum_cost") - col(costCol)) / lit(budget.toDouble)).cast("long"))
  }

  /** Per-group cap: keep the top `k` rows of each group by `order` — the
   *  quota-sampling/boilerplate-capping primitive (e.g. at most k docs per
   *  domain). One shuffle on the group key; rank prunes before any
   *  downstream join. */
  def topKPerGroup(df: DataFrame, groupCol: String, order: Seq[Column],
      k: Int): DataFrame =
    df.withColumn("rank",
        row_number().over(Window.partitionBy(groupCol).orderBy(order: _*))
          .cast("bigint"))
      .filter(col("rank") <= k)

  // (?i): uppercase PII must not leak through a compliance scrub; \S (not
  // [^ ]): a URL ends at ANY whitespace, or redaction eats the next line's
  // first word. The q_text_redact oracle interpolates these constants, so
  // the DuckDB side always uses the identical patterns.
  val EmailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val UrlRe = "(?i)https?://[^\\s]+"

  /**
   * Train a byte-pair-encoding merge table (Sennrich et al. 2016, the
   * word-frequency formulation — the tokenizer-training step of a data
   * pipeline): the corpus is scanned ONCE to build the word-frequency
   * table, and every merge round then runs on that table alone — explode
   * adjacent symbol pairs weighted by word count, pick the most frequent
   * pair (ties: lexicographically smallest), rewrite the symbol arrays
   * with the merge applied greedily left-to-right. Only the winning pair
   * — ONE row — reaches the driver per round; stops early when no
   * adjacent pair remains.
   *
   * Returns `(rank, left, right, merged, pair_count)`, rank 1 first.
   * Words carry the standard `</w>` end-of-word marker so word-final
   * subwords can differ from word-internal ones.
   *
   * 100 TB shape: the corpus cost is ONE token groupBy (shuffles one
   * row per distinct word, capped at `maxVocab` by frequency); the
   * merge loop then runs DRIVER-SIDE over the collected vocab — the
   * vocab is the bounded MODEL (Zipf: it grows orders of magnitude
   * slower than the corpus), so collecting it is the ivfTrainKmeans
   * pattern, not a data collect. A real tokenizer's 30k–50k merges are
   * tens of thousands of rounds: as Spark jobs that is a driver-
   * coordinated latency wall (the round-11 formulation paid a
   * pair-count aggregate + checkpoint rewrite per round); in memory
   * each round is microseconds via the classic Sennrich incremental
   * structure (pair counts plus a pair→words index, so a merge touches
   * only the words that contain it).
   */
  /** One greedy left-to-right application of merge (a, b) to a symbol
   *  array — the shared rewrite of BPE training and encoding. */
  private def mergeSym(sym: org.apache.spark.sql.Column, a: String, b: String) =
    aggregate(sym, typedLit(Seq.empty[String]), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** A word's initial BPE symbols: characters plus the `</w>` marker. */
  private def initialSym(word: org.apache.spark.sql.Column) =
    concat(split(word, ""), array(lit("</w>")))

  /** One greedy left-to-right application of merge (a, b) to a symbol
   *  array, driver-side — the exact JVM mirror of [[mergeSym]]'s fold
   *  (a freshly-merged symbol is compared as a WHOLE string, so e.g.
   *  merging (a,a) over [a,a,a] yields [aa,a], not [aa,aa]). */
  private[operators] def applyMergeLocal(sym: Array[String], a: String,
      b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](sym.length)
    var i = 0
    while (i < sym.length) {
      if (out.nonEmpty && out.last == a && sym(i) == b) out(out.length - 1) = a + b
      else out += sym(i)
      i += 1
    }
    out.toArray
  }

  def trainBpe(docs: DataFrame, textCol: String = "text", numMerges: Int = 30,
      maxVocab: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    // the ONE distributed pass: word frequencies, frequency-capped at
    // maxVocab (ties at the cap break deterministically on the word), then
    // a bounded collect of the MODEL — at most maxVocab (word, count) rows
    val vocab = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .orderBy(col("wc").desc, col("w")).limit(maxVocab)
      .collect()
    val words: Array[Array[String]] =
      vocab.map(r => (r.getString(0).map(_.toString) :+ "</w>").toArray)
    val wc: Array[Long] = vocab.map(_.getLong(1))
    // Sennrich incremental structure: global pair counts + pair → the set
    // of words currently containing it, so each merge round re-derives
    // pairs ONLY for the touched words. Symbols are ASCII ([a-z0-9] tokens
    // plus the '</w>' marker), so the lexicographic (a, b) tie-break below
    // matches the former Spark orderBy's UTF8 binary ordering exactly.
    val stats = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val index = scala.collection.mutable.HashMap.empty[(String, String),
      scala.collection.mutable.HashSet[Int]]
    def addWord(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val n = stats.getOrElse(p, 0L) + sign * wc(i)
        if (n == 0L) stats.remove(p) else stats.update(p, n)
        if (sign > 0) index.getOrElseUpdate(p,
          scala.collection.mutable.HashSet.empty[Int]) += i
        j += 1
      }
      // stale index entries (words that no longer contain a pair) are
      // filtered lazily at merge time — deleting here would need a second
      // containment scan per pair per word
    }
    var i = 0
    while (i < words.length) { addWord(i, 1L); i += 1 }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    while (rank <= numMerges && stats.nonEmpty) {
      // argmax by (count desc, a asc, b asc) — the exact former SQL order
      var best: ((String, String), Long) = null
      for (e <- stats) {
        if (best == null || e._2 > best._2 ||
            (e._2 == best._2 && (e._1._1 < best._1._1 ||
              (e._1._1 == best._1._1 && e._1._2 < best._1._2)))) best = e
      }
      val ((a, b), n) = best
      merges += ((rank, a, b, a + b, n))
      val touched = index.remove((a, b)).getOrElse(
        scala.collection.mutable.HashSet.empty[Int])
      for (w <- touched) {
        // lazy-index filter: the word may have been rewritten since it was
        // indexed under this pair — re-derive its pairs from its CURRENT
        // symbols (addWord(-1) subtracts exactly what it contributes now)
        addWord(w, -1L)
        words(w) = applyMergeLocal(words(w), a, b)
        addWord(w, 1L)
      }
      rank += 1
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
      .select(col("rank").cast("bigint"), col("left"), col("right"),
        col("merged"), col("pair_count"))
      .orderBy("rank")
  }

  /**
   * ENCODE with a trained merge table — the inference half of
   * [[trainBpe]]: each word becomes its subword sequence by applying the
   * merges in RANK ORDER, each greedily left-to-right (the exact
   * training contract, so encoding the training corpus reproduces the
   * training-time symbol states). Returns per-document REAL subword
   * counts `(idCol, n_subwords)` — the number a data-mixing budget
   * actually needs, vs the `tokenCountBpeish` proxy.
   *
   * The merge fold (interpreted higher-order functions, O(merges × word
   * length) per word) runs over DISTINCT words only — the vocab is
   * orders of magnitude smaller than the token stream (50k words vs
   * millions of occurrences at sf0.1: the naive inline-per-occurrence
   * chain measured 53 s where this takes ~2 s), and the per-word lengths
   * then broadcast back onto the exploded token stream for one
   * doc-keyed sum. At 100 TB the vocab side stays bounded (Zipf: the
   * stream grows much faster than the vocabulary) and the only wide
   * shuffle is the final per-document aggregation.
   */
  def bpeEncodeCounts(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val encodedLen: Column => Column = w =>
      size(merges.foldLeft(initialSym(w)) { case (sym, (a, b)) => mergeSym(sym, a, b) })
    val occurrences = docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
    val wordLens = occurrences.select("w").distinct()
      .select(col("w"), encodedLen(col("w")).as("_n"))
    val perDoc = occurrences.join(broadcast(wordLens), "w")
      .groupBy(idCol).agg(sum("_n").cast("bigint").as("n_subwords"))
    // tokenless docs still count (zero subwords), matching the budget
    // semantics downstream
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_subwords"), lit(0L)).as("n_subwords"))
      .orderBy(idCol)
  }

  /** The id map of a trained merge table: `</w>` = 0, the closed base
   *  alphabet (tokens() emits only [a-z0-9]) = 1..36 in sorted order,
   *  then each merge's surface string in rank order. Two merges that
   *  concatenate to the same surface string share one id — same-surface
   *  = same-token, the standard vocab contract. */
  def bpeVocabIds(merges: Seq[(String, String)]): Map[String, Int] = {
    val base = "</w>" +: (('0' to '9') ++ ('a' to 'z')).map(_.toString)
    val withMerges = base ++ merges.map { case (a, b) => a + b }
    withMerges.zipWithIndex.reverse.toMap // first occurrence wins an id
  }

  /**
   * ENCODE to TOKEN-ID SEQUENCES — the artifact a training pipeline
   * actually ships to sequence packing: each document becomes the
   * concatenation of its words' subword ids under [[bpeVocabIds]]'
   * deterministic map, words in token order, every word `</w>`-terminated.
   * Tokenless documents return an empty array. Returns
   * `(idCol, token_ids array<int>)`.
   *
   * Same scale shape as [[bpeEncodeCounts]]: the interpreted merge fold
   * runs once per DISTINCT word (Zipf-bounded — the per-occurrence
   * inline chain measured 53 s where this takes ~2 s), the per-word id
   * arrays broadcast back onto the positional token stream, and one
   * doc-keyed `array_sort(collect_list(struct(pos, ids)))` reassembles
   * order regardless of shuffle order (the removeBoilerplate rebuild
   * pattern) — the only wide shuffle is that final per-document group.
   */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val vocab = bpeVocabIds(merges)
    val encodeSyms: Column => Column = w =>
      merges.foldLeft(initialSym(w)) { case (sym, (a, b)) => mergeSym(sym, a, b) }
    val occ = docs.select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
    val wordIds = occ.select("w").distinct()
      .select(col("w"),
        transform(encodeSyms(col("w")), s => element_at(typedLit(vocab), s)).as("ids"))
    val perDoc = occ.join(broadcast(wordIds), "w")
      .groupBy(idCol)
      .agg(flatten(transform(array_sort(collect_list(struct(col("pos"), col("ids")))),
        x => x.getField("ids"))).as("token_ids"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("token_ids"), typedLit(Seq.empty[Int])).as("token_ids"))
  }

  /**
   * Split documents into overlapping token windows — the chunker every
   * RAG / context-window pipeline needs: windows of `chunkTokens` tokens
   * starting every `chunkTokens - overlap` positions over the normalized
   * token stream, the final partial window kept (≥ 1 token). Emits
   * `(idCol, chunk_index, chunk_text, n_tokens)`; `chunk_index` is
   * 0-based. Scan-local (one indexed-transform + posexplode, no UDF, no
   * shuffle, no sort) — at 100 TB the chunk stream pipelines straight
   * into the next stage (embed, pack, write) without materializing.
   * Output order is whatever the scan produces; consumers needing a
   * deterministic order sort on (idCol, chunk_index) themselves (the
   * q_text_chunks wrapper does, for oracle comparison).
   */
  def chunkDocs(docs: DataFrame, chunkTokens: Int, overlap: Int = 0,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap ($overlap) < chunkTokens ($chunkTokens)")
    val step = chunkTokens - overlap
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("t"))
      .filter(size(col("t")) > 0)
    // starts: 0, step, 2*step, ... keeping only chunks that contribute at
    // least one token beyond the previous chunk's coverage (start <
    // n_tokens - overlap) — a tail window fully contained in its
    // predecessor is noise, not a chunk. slice is 1-based.
    toks.select(col(idCol),
        posexplode(transform(
          sequence(lit(0),
            (floor(greatest(size(col("t")) - overlap - 1, lit(0)) / step) * step)
              .cast("int"),
            lit(step)),
          s => slice(col("t"), s + 1, lit(chunkTokens)))).as(Seq("chunk_index", "c")))
      .select(col(idCol), col("chunk_index").cast("bigint").as("chunk_index"),
        concat_ws(" ", col("c")).as("chunk_text"),
        size(col("c")).cast("bigint").as("n_tokens"))
  }

  /** PII scrubbing: replace emails then URLs with typed placeholders and
   *  count what was redacted (the audit trail a compliance pass needs).
   *  Pure regexp_replace/regexp_count — codegen'd, scan-local. */
  def redact(text: Column): (Column, Column, Column) = (
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), UrlRe, "<URL>"),
    regexp_count(text, lit(EmailRe)),
    regexp_count(text, lit(UrlRe)))

  /** Token-level repetition score: 1 - distinct/total tokens. High values
   *  flag boilerplate/spam for quality filtering. */
  def repetitionStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"),
        size(col("t")).cast("bigint").as("n_tokens"),
        size(array_distinct(col("t"))).cast("bigint").as("n_distinct"),
        round(lit(1.0) - size(array_distinct(col("t"))).cast("double") /
          greatest(size(col("t")), lit(1)), 6).as("repetition_ratio"))
}
