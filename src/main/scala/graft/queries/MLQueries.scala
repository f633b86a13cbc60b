package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{AtRest, Corpus, Dedup, DedupIndex, Multimodal, Similarity}

/**
 * Training-data pipeline surface: text analysis, dedup, similarity search,
 * multimodal plumbing (SURVEY.md §2 north-star block). Oracles are provided
 * where the semantics are plain SQL (token stats, language ID, exact dedup);
 * the sketch/LSH operators are verified by ScalaTest golden + property specs
 * instead (hash functions differ across engines by construction).
 */
object MLQueries {
  import Tables.t

  private val enStop = TextFunctions.StopwordSets.head._2

  private def scratchDir(name: String): String = QueryScratch.dir(name)

  /** Oracle scaffold for the approximate-ANN queries: `triples` pins the
   *  (probe_id, neighbor_id, rank) rows the deterministic index selects on
   *  the sf0.01 corpus; the cosine column is NOT pinned — DuckDB recomputes
   *  it from the raw embeddings, cross-checking the vec_cosine kernel. */
  private def simPickedOracle(triples: String): String = s"""
      WITH picked(probe_id, neighbor_id, rank) AS (SELECT * FROM (VALUES $triples)),
      v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
      SELECT CAST(p.probe_id AS BIGINT) AS probe_id,
             CAST(p.neighbor_id AS BIGINT) AS neighbor_id,
             round(list_inner_product(a.emb, b.emb)
               / (sqrt(list_inner_product(a.emb, a.emb))
                  * sqrt(list_inner_product(b.emb, b.emb))), 6) AS cosine,
             CAST(p.rank AS INTEGER) AS rank
      FROM picked p
      JOIN v a ON a.vec_id = p.probe_id
      JOIN v b ON b.vec_id = p.neighbor_id
      ORDER BY probe_id, rank"""

  /** Oracle scaffold shared by the classifier rows: rescore the corpus
   *  under a PINNED trained model (f -> weight_nano VALUES) with the
   *  engine-portable md5 feature hash mod `dim`, recomputing the
   *  weak-supervision labels from scratch — a training drift (live
   *  weights != pins) or a scoring bug both go red. */
  private def classifierSql(dim: Int, biasNano: Long, weightValues: String): String = {
    val langs = TextFunctions.StopwordSets.map(_._1)
    val hits = TextFunctions.StopwordSets.map { case (lang, words) =>
      s"len(list_intersect(list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))," +
        s" [${words.map(w => s"'$w'").mkString(", ")}])) AS h_$lang"
    }.mkString(",\n             ")
    val enWins = langs.filter(_ != "en").map(o => s"h_en >= h_$o").mkString(" AND ")
    s"""
      WITH w(f, wn) AS (SELECT * FROM (VALUES $weightValues)),
      lbl AS (
        SELECT doc_id, CASE WHEN h_en > 0 AND $enWins THEN 1 ELSE 0 END AS label
        FROM (SELECT doc_id, $hits FROM documents)
      ), tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), grams AS (
        SELECT doc_id, unnest(t || CASE WHEN len(t) >= 2
            THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
            ELSE [] END) AS g
        FROM tok
      ), feats AS (
        SELECT DISTINCT doc_id,
               CAST(CAST(('0x' || substring(md5(g), 1, 8)) AS UBIGINT) % $dim AS BIGINT) AS f
        FROM grams
      ), sums AS (
        SELECT fe.doc_id, sum(w.wn) AS s FROM feats fe JOIN w ON w.f = fe.f
        GROUP BY fe.doc_id
      ), zz AS (
        SELECT d.doc_id, ($biasNano + COALESCE(s.s, 0)) / 1e9 AS z
        FROM documents d LEFT JOIN sums s USING (doc_id)
      )
      SELECT zz.doc_id, CAST(l.label AS BIGINT) AS label,
             round(1 / (1 + exp(-zz.z)), 6) AS prob,
             CAST(CASE WHEN zz.z >= 0 THEN 1 ELSE 0 END AS BIGINT) AS predicted
      FROM zz JOIN lbl l USING (doc_id)
      ORDER BY doc_id"""
  }

  /** q_text_classifier_multi's oracle: rescore every document under the
   *  PINNED one-vs-rest weight matrix (argmax margin, ties by head
   *  priority — exact fixed-point LONGs end to end) while recomputing the
   *  quality-bucket labels from scratch, so training drift and scoring
   *  bugs both go red. */
  private def multiClassifierSql(dim: Int, biasValues: String,
      weightValues: String): String = s"""
      WITH w(cls, f, wn) AS (SELECT * FROM (VALUES $weightValues)),
      b(cls, prio, bn) AS (SELECT * FROM (VALUES $biasValues)),
      base AS (
        SELECT doc_id, length(text) AS n_char,
               len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS n_tok,
               length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS n_alnum,
               len(list_intersect(
                   list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')),
                   [${enStop.map(w => s"'$w'").mkString(", ")}])) AS stop_hits
        FROM documents
      ), lbl AS (
        SELECT doc_id,
               CASE WHEN q < 0.6 THEN 'low' WHEN q < 0.7 THEN 'mid' ELSE 'high' END AS label
        FROM (
          SELECT doc_id,
                 round(least(n_char / 500.0, 1.0) * 0.3
                     + (CASE WHEN n_tok > 0 AND n_alnum / n_tok BETWEEN 3.0 AND 10.0
                             THEN 1.0 ELSE 0.5 END) * 0.2
                     + (CASE WHEN n_char > 0 THEN n_alnum / n_char ELSE 0.0 END) * 0.3
                     + (CASE WHEN n_tok > 0 THEN stop_hits / least(n_tok, 10.0) ELSE 0.0 END) * 0.2,
                   6) AS q
          FROM base)
      ), tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), grams AS (
        SELECT doc_id, unnest(t || CASE WHEN len(t) >= 2
            THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
            ELSE [] END) AS g
        FROM tok
      ), feats AS (
        SELECT DISTINCT doc_id,
               CAST(CAST(('0x' || substring(md5(g), 1, 8)) AS UBIGINT) % $dim AS BIGINT) AS f
        FROM grams
      ), sums AS (
        SELECT fe.doc_id, w.cls, sum(w.wn) AS s
        FROM feats fe JOIN w ON w.f = fe.f
        GROUP BY 1, 2
      ), m AS (
        SELECT d.doc_id, b.cls, b.prio, b.bn + COALESCE(s.s, 0) AS m
        FROM documents d CROSS JOIN b
        LEFT JOIN sums s ON s.doc_id = d.doc_id AND s.cls = b.cls
      ), best AS (
        SELECT doc_id, cls, m,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY m DESC, prio ASC) AS rn
        FROM m
      )
      SELECT l.doc_id, l.label, best.cls AS predicted, CAST(best.m AS BIGINT) AS margin_nano
      FROM best JOIN lbl l USING (doc_id)
      WHERE rn = 1
      ORDER BY doc_id"""

  val all: Seq[Q] = Seq(

    Q("q_text_stats", Some(s"""
      SELECT doc_id,
             length(text) AS n_char,
             len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS n_tokens,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS n_alnum,
             round(CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1), 6) AS alnum_ratio,
             len(list_intersect(
                 list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')),
                 [${enStop.map(w => s"'$w'").mkString(", ")}])) AS en_stopword_hits
      FROM documents
      ORDER BY doc_id"""),
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).cast("bigint").as("n_char"),
        TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tokens"),
        length(regexp_replace(col("text"), "[^A-Za-z0-9]", "")).cast("bigint").as("n_alnum"),
        round(length(regexp_replace(col("text"), "[^A-Za-z0-9]", "")).cast("double") /
          greatest(length(col("text")), lit(1)), 6).as("alnum_ratio"),
        TextFunctions.stopwordHits(col("text"), enStop).cast("bigint").as("en_stopword_hits"))
        .orderBy("doc_id")),

    Q("q_text_langid", Some {
      val hits = TextFunctions.StopwordSets.map { case (lang, words) =>
        s"len(list_intersect(list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))," +
          s" [${words.map(w => s"'$w'").mkString(", ")}])) AS h_$lang"
      }.mkString(",\n             ")
      val langs = TextFunctions.StopwordSets.map(_._1)
      val cases = langs.map { l =>
        val geq = langs.filter(_ != l).map(o => s"h_$l >= h_$o").mkString(" AND ")
        s"WHEN h_$l > 0 AND $geq THEN '$l'"
      }.mkString("\n                  ")
      s"""
      SELECT doc_id, lang AS labeled_lang,
             CASE $cases
                  ELSE 'und' END AS detected_lang
      FROM (SELECT doc_id, lang, $hits FROM documents)
      ORDER BY doc_id"""
    },
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"), col("lang").as("labeled_lang"),
        TextFunctions.langId(col("text")).as("detected_lang"))
        .orderBy("doc_id")),

    // quality heuristic + BPE-ish token count, both with full DuckDB oracles.
    // The BPE-ish lookaround split has no RE2 equivalent, but its count has a
    // closed form: alnum runs + non-alnum chars that aren't spaces (each
    // non-alnum char splits into its own piece; all-space pieces are trimmed
    // away). The quality formula is the same arithmetic as the native kernel.
    Q("q_text_quality", Some(s"""
      WITH base AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS n_char,
               CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS DOUBLE) AS n_tok,
               CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE) AS n_alnum,
               CAST(len(list_intersect(
                   list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')),
                   [${enStop.map(w => s"'$w'").mkString(", ")}])) AS DOUBLE) AS stop_hits,
               len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'), x -> x <> ''))
                 + length(text)
                 - length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
                 - (length(text) - length(replace(text, ' ', ''))) AS bpeish_tokens
        FROM documents
      )
      SELECT doc_id,
             round(least(n_char / 500.0, 1.0) * 0.3
                 + (CASE WHEN n_tok > 0 AND n_alnum / n_tok BETWEEN 3.0 AND 10.0
                         THEN 1.0 ELSE 0.5 END) * 0.2
                 + (CASE WHEN n_char > 0 THEN n_alnum / n_char ELSE 0.0 END) * 0.3
                 + (CASE WHEN n_tok > 0 THEN stop_hits / least(n_tok, 10.0) ELSE 0.0 END) * 0.2,
               6) AS quality,
             bpeish_tokens
      FROM base
      ORDER BY doc_id"""),
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.tokenCountBpeish(col("text")).cast("bigint").as("bpeish_tokens"))
        .orderBy("doc_id")),

    // Char-trigram LM quality score (the KenLM-perplexity stand-in): counts
    // trained on the %3 reference slice, every doc scored by mean smoothed
    // trigram log-prob. The normalized alphabet bounds the model at 37³
    // trigrams, so the trained counts BROADCAST — the whole score is two
    // aggregates + two broadcast joins. DuckDB retrains and rescores from
    // scratch with the identical formula.
    Q("q_text_lm_score", Some("""
      WITH norm AS (
        SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS n
        FROM documents
      ), tri AS (
        SELECT doc_id, substring(n, CAST(i AS INTEGER), 3) AS tri
        FROM (SELECT doc_id, n, unnest(range(1, greatest(len(n) - 1, 1))) AS i FROM norm)
      ), tc AS (
        SELECT tri, count(*) AS tc FROM tri WHERE doc_id % 3 = 0 GROUP BY tri
      ), bc AS (
        SELECT substring(tri, 1, 2) AS bi, count(*) AS bc
        FROM tri WHERE doc_id % 3 = 0 GROUP BY 1
      )
      SELECT t.doc_id,
             round(avg(ln((COALESCE(tc.tc, 0) + 0.5) / (COALESCE(bc.bc, 0) + 0.5 * 37))), 6) AS lm_score,
             count(*) AS n_trigrams
      FROM tri t
      LEFT JOIN tc ON t.tri = tc.tri
      LEFT JOIN bc ON substring(t.tri, 1, 2) = bc.bi
      GROUP BY t.doc_id
      ORDER BY t.doc_id"""),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.operators.LanguageModel.scoreDocs(
            docs, docs.filter(col("doc_id") % 3 === 0))
          .orderBy("doc_id")
      }),

    // The LEARNED text classifier (fastText-style hashed-ngram logistic
    // regression, IRLS-trained): labels come from the rule-based language
    // labeler (weak supervision — a labeler labels, the model learns to
    // reproduce it), training re-runs IN-QUERY (bit-deterministic: every
    // distributed sum is an exact LONG, the solve is sequential), and the
    // oracle scores the corpus under the PINNED trained weights
    // (ClassifierOracle, regenerate with tools.DumpClassifier) while
    // recomputing the labels from scratch — so a training drift OR a
    // scoring bug both go red. The md5 feature map is engine-portable.
    Q("q_text_classifier",
      Some(classifierSql(512, ClassifierOracle.biasNano,
        ClassifierOracle.weightValues)),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val labeled = docs.withColumn("label",
          (TextFunctions.langId(col("text")) === "en").cast("int"))
        // train on the labeled SLICE (%2), score the whole corpus — the
        // weak-supervision production shape (labels only ever exist for a
        // sample), and what bounds training cost at any corpus scale
        val (b, w) = graft.operators.TextClassifier.train(
          labeled.filter(col("doc_id") % 2 === 0), "label")
        graft.operators.TextClassifier.score(docs, b, w.toSeq)
          .join(labeled.select(col("doc_id"),
            col("label").cast("bigint").as("label")), "doc_id")
          .select(col("doc_id"), col("label"), col("prob"), col("predicted"))
          .orderBy("doc_id")
      }),

    // The HESSIAN-FREE classifier (Newton-CG on Hessian-vector products)
    // at dim 2048 — the scale path past the dense solver's dim ceiling
    // (the dense Hessian is (dim+1)² driver keys + an O(dim³) solve;
    // CG's per-iteration cost is two LONG aggregates linear in the gram
    // stream). Training re-runs IN-QUERY, bit-deterministic under the
    // same grid contract; the oracle rescores under the pinned CG model
    // while recomputing the labels — training drift or scoring bugs both
    // go red. More buckets = fewer hash collisions: train accuracy 0.972
    // here vs 0.912 at dim 512.
    Q("q_text_classifier_cg",
      Some(classifierSql(2048, ClassifierOracle.cgBiasNano,
        ClassifierOracle.cgWeightValues)),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val labeled = docs.withColumn("label",
          (TextFunctions.langId(col("text")) === "en").cast("int"))
        val (b, w) = graft.operators.TextClassifier.trainCG(
          labeled.filter(col("doc_id") % 4 === 0), "label", dim = 2048,
          cgIters = 8)
        graft.operators.TextClassifier.score(docs, b, w.toSeq, dim = 2048)
          .join(labeled.select(col("doc_id"),
            col("label").cast("bigint").as("label")), "doc_id")
          .select(col("doc_id"), col("label"), col("prob"), col("predicted"))
          .orderBy("doc_id")
      }),

    // The MULTICLASS (one-vs-rest) classifier: three Newton-CG heads over
    // ONE shared feature cache learn the heuristic quality score's
    // release bucket (low/mid/high — the weak-supervision routing shape:
    // a rule scores a slice, the model routes the rest), then scoreMulti
    // argmaxes three scan-local exact-LONG margins per doc (ties by head
    // priority). Training re-runs IN-QUERY, bit-deterministic; the oracle
    // rescores under the PINNED weight matrix while recomputing labels
    // from scratch. 3-class train accuracy 0.828 (chance 0.36).
    Q("q_text_classifier_multi",
      Some(multiClassifierSql(512, ClassifierOracle.multiBiasValues,
        ClassifierOracle.multiWeightValues)),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val q = TextFunctions.qualityScore(col("text"))
        val labeled = docs.withColumn("lab",
          when(q < 0.6, "low").when(q < 0.7, "mid").otherwise("high"))
        val models = graft.operators.TextClassifier.trainMulti(
          labeled.filter(col("doc_id") % 2 === 0), "lab",
          Seq("low", "mid", "high"), cgIters = 8)
        graft.operators.TextClassifier.scoreMulti(docs,
            models.map { case (c, b, w) => (c, b, w.toSeq) })
          .join(labeled.select(col("doc_id"), col("lab").as("label")), "doc_id")
          .select(col("doc_id"), col("label"), col("predicted"), col("margin_nano"))
          .orderBy("doc_id")
      }),

    // minhash4 serialized to a string: the driver's pandas row-count pass
    // chokes on ndarray cells even for oracle-less queries (r01 crash).
    Q("q_text_fingerprint", Some(FingerprintOracle.sql),
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        xxhash64(regexp_replace(lower(col("text")), "\\s+", " ")).as("fingerprint"),
        // word shingles: char-5-gram arrays made this the slowest bench
        // entry (12.9 s at sf0.01) for a 4-hash fingerprint
        concat_ws(",", Dedup.signatureFromShingles(
          graft.functions.TextFunctions.wordShingles(col("text"), 3), 4)).as("minhash4"),
        // winnowing (rolling hash + window minima): local fingerprints that
        // any shared substring of length >= w+k-1 must surface on both docs
        size(graft.functions.TextKernels.winnow_fingerprints(col("text"))).as("n_winnow"))
        .orderBy("doc_id")),

    Q("q_dedup_exact", Some("""
      SELECT md5(text) AS content_hash, count(*) AS n_copies, min(doc_id) AS canonical_id
      FROM documents
      GROUP BY 1
      HAVING count(*) > 1
      ORDER BY content_hash"""),
      (s, dir) => Dedup.exactGroups(t(s, dir, "documents"))),

    // n-gram Jaccard similarity with a full DuckDB oracle — the one dedup-
    // family operator whose semantics are plain SQL on both engines (same
    // word-trigram shingle definition as TextFunctions.wordShingles).
    Q("q_ngram_jaccard", Some("""
      WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                      ELSE [array_to_string(t, ' ')] END) AS sh
        FROM tok
      )
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / greatest(len(list_distinct(a.sh || b.sh)), 1), 6) AS jaccard
      FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
      ORDER BY id_a"""),
      (s, dir) => {
        // adjacent-pair self-join without the join: each doc posts its
        // (once-computed) shingles to its own pair key and its
        // predecessor's, and a conditional aggregation reassembles the
        // pair — ONE kernel pass and ONE shuffle where the naive a⋈b plan
        // runs the shingle kernel twice and shuffles both join sides
        val d = t(s, dir, "documents").select(col("doc_id"),
          TextFunctions.wordShingles(col("text"), 3).as("sh"))
        val posted = d.select(explode(array(
            struct(col("doc_id").as("k"), lit(0).as("side"), col("sh")),
            struct((col("doc_id") - 1).as("k"), lit(1).as("side"), col("sh")))).as("p"))
          .select(col("p.k"), col("p.side"), col("p.sh"))
        posted.groupBy("k")
          .agg(
            any_value(when(col("side") === 0, col("sh")), lit(true)).as("sh_a"),
            any_value(when(col("side") === 1, col("sh")), lit(true)).as("sh_b"))
          .filter(col("sh_a").isNotNull && col("sh_b").isNotNull)
          .select(col("k").as("id_a"), (col("k") + 1).as("id_b"),
            round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
              greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)), 6).as("jaccard"))
          .orderBy("id_a")
      }),

    Q("q_dedup_keep_canonical", Some("""
      SELECT doc_id, lang, source
      FROM documents
      QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
      ORDER BY doc_id"""),
      (s, dir) => Dedup.exactDedup(t(s, dir, "documents"))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    // The oracle is the GROUND TRUTH: all-pairs exact word-shingle Jaccard
    // >= threshold, computed independently by DuckDB. The operator's output
    // is LSH candidates verified by the same exact Jaccard, so passing this
    // row proves the banded pipeline loses no true pair — which is
    // deterministic here (fixed hash family) and safe on this corpus: every
    // true pair sits at j >= 0.9, where 8 bands x 4 rows has ~0.9998 recall,
    // and the corpus has NO pair in [0.5, 0.9) to sit on the margin.
    Q("q_dedup_minhash", Some("""
      WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                      ELSE [array_to_string(t, ' ')] END) AS sh
        FROM tok
      )
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(list_distinct(a.sh || b.sh)), 6) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(a.sh || b.sh)) >= 0.7
      ORDER BY id_a, id_b"""),
      (s, dir) => Dedup.nearDuplicates(t(s, dir, "documents"), threshold = 0.7)),

    // pairs → clusters: connected components of the verified near-dup graph,
    // each doc labeled with its component's minimum id (the doc a dedup pass
    // keeps). DuckDB recomputes ground truth from the exact all-pairs
    // Jaccard via a RECURSIVE transitive closure — fully portable.
    Q("q_dedup_groups", Some("""
      WITH RECURSIVE tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                      ELSE [array_to_string(t, ' ')] END) AS sh
        FROM tok
      ), cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(a.sh || b.sh)) >= 0.7
      ), edges AS (
        SELECT id_a AS s, id_b AS d FROM cand
        UNION ALL SELECT id_b, id_a FROM cand
      ), closure(s, d) AS (
        SELECT s, d FROM edges
        UNION
        SELECT c.s, e.d FROM closure c JOIN edges e ON c.d = e.s
      )
      SELECT s AS doc_id, least(s, min(d)) AS canonical_id
      FROM closure GROUP BY s ORDER BY doc_id"""),
      (s, dir) => Dedup.nearDupGroups(
          Dedup.nearDuplicates(t(s, dir, "documents"), threshold = 0.7))
        .orderBy("doc_id")),

    // Quality-aware representative selection: within each near-dup
    // cluster keep the doc with the most characters (tie → smallest id) —
    // what a production dedup actually keeps, vs q_dedup_groups' min-id
    // canonical. DuckDB recomputes clusters from the exact all-pairs
    // Jaccard (RECURSIVE closure) and picks keepers with the same window.
    Q("q_dedup_keep_best", Some("""
      WITH RECURSIVE tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                      ELSE [array_to_string(t, ' ')] END) AS sh
        FROM tok
      ), cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(a.sh || b.sh)) >= 0.7
      ), edges AS (
        SELECT id_a AS s, id_b AS d FROM cand
        UNION ALL SELECT id_b, id_a FROM cand
      ), closure(s, d) AS (
        SELECT s, d FROM edges
        UNION
        SELECT c.s, e.d FROM closure c JOIN edges e ON c.d = e.s
      ), groups AS (
        SELECT s AS doc_id, least(s, min(d)) AS canonical_id
        FROM closure GROUP BY s
      ), ranked AS (
        SELECT g.doc_id, g.canonical_id, d.n_chars,
               row_number() OVER (PARTITION BY g.canonical_id
                                  ORDER BY d.n_chars DESC, g.doc_id) AS rn
        FROM groups g JOIN documents d USING (doc_id)
      )
      SELECT r.doc_id, r.canonical_id, k.doc_id AS keep_id
      FROM ranked r
      JOIN ranked k ON k.canonical_id = r.canonical_id AND k.rn = 1
      ORDER BY r.doc_id"""),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.nearDupKeepBest(docs,
          Dedup.nearDuplicates(docs, threshold = 0.7), "n_chars")
      }),

    // Incremental dedup against the at-rest LSH index: the corpus (doc_id
    // % 7 <> 0) is signed and written ONCE, then the arriving batch (% 7
    // = 0) probes only its touched bucket_part partitions and verifies
    // candidates with exact Jaccard. Oracle = ground-truth exact cross
    // Jaccard in DuckDB, same recall reasoning as q_dedup_minhash: this
    // corpus's 9 true cross pairs all sit at j >= 0.9 (8x4 banding recall
    // ~0.9998 there) and NO cross pair lands in [0.5, 0.9).
    Q("q_dedup_incremental", Some("""
      WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                      ELSE [array_to_string(t, ' ')] END) AS sh
        FROM tok
      )
      SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
             round(CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE)
                   / len(list_distinct(b.sh || c.sh)), 6) AS jaccard
      FROM sh b JOIN sh c ON b.doc_id % 7 = 0 AND c.doc_id % 7 <> 0
      WHERE CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE)
            / len(list_distinct(b.sh || c.sh)) >= 0.7
      ORDER BY batch_id, corpus_id"""),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val batch = docs.filter(col("doc_id") % 7 === 0)
        val root = scratchDir("dedup_lsh_index")
        DedupIndex.probeAtRest(s, root + "/index.parquet", batch,
          root + "/corpus.parquet", threshold = 0.7)
      },
      // seed phase (untimed): the timed number is the PROBE, the
      // steady-state operation — the one-off layout build re-runs per
      // attempt only so bench re-runs can't accrete state
      prepare = Some((s, dir) => {
        val corpus = t(s, dir, "documents").filter(col("doc_id") % 7 =!= 0)
        val root = scratchDir("dedup_lsh_index")
        DedupIndex.writeAtRest(corpus, root + "/index.parquet")
        DedupIndex.writeCorpus(corpus.select("doc_id", "text"),
          root + "/corpus.parquet")
      })),

    // Same ground truth as q_dedup_incremental, but the index is built the
    // way a long-running ingest leaves it — seeded from HALF the corpus,
    // the other half APPENDED, then COMPACTED (per-append files merged,
    // cross-append bucket accretion dropped at rest, bloom sidecar
    // collapsed) — before the partition-pruned probe runs. Proves the
    // maintenance pass is invisible to query results.
    Q("q_dedup_compact", Some("""
      WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                      ELSE [array_to_string(t, ' ')] END) AS sh
        FROM tok
      )
      SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
             round(CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE)
                   / len(list_distinct(b.sh || c.sh)), 6) AS jaccard
      FROM sh b JOIN sh c ON b.doc_id % 7 = 0 AND c.doc_id % 7 <> 0
      WHERE CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE)
            / len(list_distinct(b.sh || c.sh)) >= 0.7
      ORDER BY batch_id, corpus_id"""),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val batch = docs.filter(col("doc_id") % 7 === 0)
        val root = QueryScratch.dir("dedup_compact")
        val idx = root + "/index.parquet"
        val corp = root + "/corpus.parquet"
        DedupIndex.compact(s, idx)
        DedupIndex.compactCorpus(s, corp)
        DedupIndex.probeAtRest(s, idx, batch, corp, threshold = 0.7)
      },
      // seed (untimed): a fragmented long-running-ingest shape; the timed
      // number is the MAINTENANCE pass + the post-compaction probe
      prepare = Some((s, dir) => {
        val corpus = t(s, dir, "documents").filter(col("doc_id") % 7 =!= 0)
        val root = QueryScratch.fresh("dedup_compact")
        val idx = root + "/index.parquet"
        DedupIndex.writeAtRest(corpus.filter(col("doc_id") % 2 === 0), idx)
        DedupIndex.appendToIndex(corpus.filter(col("doc_id") % 2 =!= 0), idx)
        DedupIndex.writeCorpus(corpus.select("doc_id", "text"),
          root + "/corpus.parquet")
      })),

    // The full ingest micro-batch, end to end: corpus (%3 <> 0) seeds the
    // at-rest index + text path, then ingestBatch runs the real loop on
    // the %3 = 0 batch — greedy in-batch drop (3 true in-batch pairs at
    // sf0.01) AND cross-corpus probe drop (10 cross pairs), appends, and
    // the query returns the newly-admitted ids from the corpus path.
    // DuckDB recomputes both drop sets from exact all-pairs Jaccard
    // (every true pair sits at j >= 0.9; banding recall ~0.9998 there,
    // nothing in [0.5, 0.9) to straddle the margin). QueryScratch.fresh
    // wipes the append-mode targets per execution so bench re-runs don't
    // accrete state.
    Q("q_dedup_ingest", Some("""
      WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                      ELSE [array_to_string(t, ' ')] END) AS sh
        FROM tok
      ), pairs AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(a.sh || b.sh)) >= 0.7
      ), in_drop AS (
        SELECT DISTINCT ib AS doc_id FROM pairs WHERE ia % 3 = 0 AND ib % 3 = 0
      ), cross_drop AS (
        SELECT DISTINCT CASE WHEN ia % 3 = 0 THEN ia ELSE ib END AS doc_id
        FROM pairs WHERE (ia % 3 = 0) <> (ib % 3 = 0)
      )
      SELECT doc_id FROM documents
      WHERE doc_id % 3 = 0
        AND doc_id NOT IN (SELECT doc_id FROM in_drop)
        AND doc_id NOT IN (SELECT doc_id FROM cross_drop)
      ORDER BY doc_id"""),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val batch = docs.filter(col("doc_id") % 3 === 0)
        val root = QueryScratch.dir("dedup_ingest")
        val idx = root + "/index.parquet"
        val corp = root + "/corpus.parquet"
        DedupIndex.ingestBatch(batch.select("doc_id", "text"), idx, corp, batchId = 0L)
        DedupIndex.readCorpus(s, corp)
          .filter(col("doc_id") % 3 === 0)
          .select("doc_id")
          .orderBy("doc_id")
      },
      // seed (untimed): the timed number is the INGEST micro-batch — the
      // steady-state loop iteration — not the one-off corpus bootstrap;
      // fresh per attempt so the exactly-once marker can't short-circuit
      // a bench re-run into a no-op
      prepare = Some((s, dir) => {
        val corpus = t(s, dir, "documents").filter(col("doc_id") % 3 =!= 0)
        val root = QueryScratch.fresh("dedup_ingest")
        DedupIndex.writeCorpus(corpus.select("doc_id", "text"),
          root + "/corpus.parquet")
        DedupIndex.writeAtRest(corpus, root + "/index.parquet")
      })),

    // OFFLINE quality recheck of an at-rest corpus: every document lands
    // at rest (simulating greedy-admit stragglers), then recheckCorpus
    // re-runs the full near-dup pass, keeps each cluster's LONGEST member
    // (ties: smallest id), rewrites the corpus and rebuilds the index.
    // The query returns the surviving ids from the corpus path; DuckDB
    // recomputes clusters from exact all-pairs Jaccard (RECURSIVE
    // closure) and applies the identical keeper window.
    Q("q_dedup_recheck", Some("""
      WITH RECURSIVE tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                      ELSE [array_to_string(t, ' ')] END) AS sh
        FROM tok
      ), cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(a.sh || b.sh)) >= 0.7
      ), edges AS (
        SELECT id_a AS s, id_b AS d FROM cand
        UNION ALL SELECT id_b, id_a FROM cand
      ), closure(s, d) AS (
        SELECT s, d FROM edges
        UNION
        SELECT c.s, e.d FROM closure c JOIN edges e ON c.d = e.s
      ), groups AS (
        SELECT s AS doc_id, least(s, min(d)) AS canonical_id
        FROM closure GROUP BY s
      ), ranked AS (
        SELECT g.doc_id,
               row_number() OVER (PARTITION BY g.canonical_id
                                  ORDER BY length(d.text) DESC, g.doc_id) AS rn
        FROM groups g JOIN documents d USING (doc_id)
      )
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)
      ORDER BY doc_id"""),
      (s, dir) => {
        val root = QueryScratch.dir("dedup_recheck")
        val idx = root + "/index.parquet"
        val corp = root + "/corpus.parquet"
        DedupIndex.recheckCorpus(s, corp, idx, threshold = 0.7)
        DedupIndex.readCorpus(s, corp).select("doc_id").orderBy("doc_id")
      },
      // seed (untimed): the timed number is the offline RECHECK pass
      prepare = Some((s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val root = QueryScratch.fresh("dedup_recheck")
        DedupIndex.writeCorpus(docs, root + "/corpus.parquet")
        DedupIndex.writeAtRest(docs, root + "/index.parquet")
      })),

    // INCREMENTAL recheck — the batch-proportional backstop: the corpus
    // ingests the %3 = 0 batch at a LOOSE threshold (0.97: only near-exact
    // dups drop), then recheckSince re-adjudicates pairs involving the
    // new batch at the production threshold 0.9 and TOMBSTONES each
    // affected cluster's non-best members (deletion vectors — no corpus
    // rewrite). Pairs between two OLD docs are out of scope by contract
    // (the previous recheck owned them) — the oracle replays exactly
    // that: ingest drops at 0.97, then the 0.9-pair closure restricted to
    // pairs touching a new doc, keep-longest, reading the corpus through
    // the tombstone anti-join.
    Q("q_dedup_recheck_since", Some("""
      WITH RECURSIVE tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                      ELSE [array_to_string(t, ' ')] END) AS sh
        FROM tok
      ), p AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(a.sh || b.sh)) AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(a.sh || b.sh)) >= 0.9
      ), ingest_drop AS (
        SELECT ib AS doc_id FROM p WHERE ia % 3 = 0 AND ib % 3 = 0 AND j >= 0.97
        UNION
        SELECT CASE WHEN ia % 3 = 0 THEN ia ELSE ib END
        FROM p WHERE (ia % 3 = 0) <> (ib % 3 = 0) AND j >= 0.97
      ), corpus AS (
        SELECT doc_id FROM documents
        WHERE doc_id % 3 <> 0
           OR doc_id NOT IN (SELECT doc_id FROM ingest_drop)
      ), rp AS (
        SELECT ia, ib FROM p
        WHERE ia IN (SELECT doc_id FROM corpus)
          AND ib IN (SELECT doc_id FROM corpus)
          AND (ia % 3 = 0 OR ib % 3 = 0)
      ), edges AS (
        SELECT ia AS s, ib AS d FROM rp
        UNION ALL SELECT ib, ia FROM rp
      ), closure(s, d) AS (
        SELECT s, d FROM edges
        UNION
        SELECT c.s, e.d FROM closure c JOIN edges e ON c.d = e.s
      ), groups AS (
        SELECT s AS doc_id, least(s, min(d)) AS canonical_id
        FROM closure GROUP BY s
      ), ranked AS (
        SELECT g.doc_id,
               row_number() OVER (PARTITION BY g.canonical_id
                                  ORDER BY length(d.text) DESC, g.doc_id) AS rn
        FROM groups g JOIN documents d USING (doc_id)
      )
      SELECT doc_id FROM corpus
      WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)
      ORDER BY doc_id"""),
      (s, dir) => {
        val root = QueryScratch.dir("dedup_recheck_since")
        // the cron-shaped entry: sinceBatch/recheckId derive from the
        // persisted frontier (absent on the fresh seed -> batch 0, id 0 —
        // exactly the caller-supplied call this query previously made)
        DedupIndex.recheckIncremental(s, root + "/corpus.parquet",
          root + "/index.parquet", threshold = 0.9)
        DedupIndex.readCorpus(s, root + "/corpus.parquet")
          .select("doc_id").orderBy("doc_id")
      },
      // seed (untimed): corpus + index from the %3 <> 0 docs, then the
      // loose-threshold ingest of the %3 = 0 batch; the timed number is
      // the INCREMENTAL recheck itself
      prepare = Some((s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val root = QueryScratch.fresh("dedup_recheck_since")
        val seed = docs.filter(col("doc_id") % 3 =!= 0)
        DedupIndex.writeCorpus(seed, root + "/corpus.parquet")
        DedupIndex.writeAtRest(seed, root + "/index.parquet")
        DedupIndex.ingestBatch(docs.filter(col("doc_id") % 3 === 0),
          root + "/index.parquet", root + "/corpus.parquet",
          threshold = 0.97, batchId = 0L)
      })),

    // TIME TRAVEL over the versioned at-rest layout: the corpus seeds as
    // version 0, an offline recheck publishes version 1 (dropping each
    // near-dup cluster's non-longest members), and the query reads BOTH
    // retained generations through readCorpusAt — the audit read "what
    // did the corpus look like before last night's maintenance pass?".
    // DuckDB recomputes both states from scratch: v0 = every document,
    // v1 = the recheck survivors (same closure as q_dedup_recheck).
    Q("q_time_travel", Some("""
      WITH RECURSIVE tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                      ELSE [array_to_string(t, ' ')] END) AS sh
        FROM tok
      ), cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(a.sh || b.sh)) >= 0.7
      ), edges AS (
        SELECT id_a AS s, id_b AS d FROM cand
        UNION ALL SELECT id_b, id_a FROM cand
      ), closure(s, d) AS (
        SELECT s, d FROM edges
        UNION
        SELECT c.s, e.d FROM closure c JOIN edges e ON c.d = e.s
      ), groups AS (
        SELECT s AS doc_id, least(s, min(d)) AS canonical_id
        FROM closure GROUP BY s
      ), ranked AS (
        SELECT g.doc_id,
               row_number() OVER (PARTITION BY g.canonical_id
                                  ORDER BY length(d.text) DESC, g.doc_id) AS rn
        FROM groups g JOIN documents d USING (doc_id)
      )
      SELECT CAST(0 AS BIGINT) AS version, FALSE AS is_current,
             count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS n_chars
      FROM documents
      UNION ALL
      SELECT CAST(1 AS BIGINT), TRUE, count(*), CAST(sum(length(text)) AS BIGINT)
      FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)
      ORDER BY version"""),
      (s, dir) => {
        val corp = QueryScratch.dir("time_travel") + "/corpus.parquet"
        AtRest.listVersions(s, corp).map { case (v, cur) =>
          DedupIndex.readCorpusAt(s, corp, v)
            .agg(count(lit(1)).as("n_docs"),
              sum(length(col("text"))).cast("long").as("n_chars"))
            .select(lit(v).as("version"), lit(cur).as("is_current"),
              col("n_docs"), col("n_chars"))
        }.reduce(_ unionByName _).orderBy("version")
      },
      // seed (untimed): v0 = the raw corpus, v1 = the recheck rewrite;
      // the timed number is the two-generation audit read
      prepare = Some((s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val root = QueryScratch.fresh("time_travel")
        DedupIndex.writeCorpus(docs, root + "/corpus.parquet")
        DedupIndex.recheckCorpus(s, root + "/corpus.parquet",
          root + "/index.parquet", threshold = 0.7)
      })),

    // Document chunking (the RAG / context-window splitter): overlapping
    // 64-token windows, stride 48, tail windows kept unless fully
    // contained in their predecessor. DuckDB recomputes the identical
    // windows with list slicing.
    Q("q_text_chunks", Some("""
      WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), starts AS (
        SELECT doc_id, t,
               unnest(range(0, greatest(len(t) - 16 - 1, 0) // 48 * 48 + 1, 48)) AS s
        FROM tok WHERE len(t) > 0
      )
      SELECT doc_id, CAST(s // 48 AS BIGINT) AS chunk_index,
             array_to_string(t[s + 1 : s + 64], ' ') AS chunk_text,
             CAST(len(t[s + 1 : s + 64]) AS BIGINT) AS n_tokens
      FROM starts
      ORDER BY doc_id, chunk_index"""),
      (s, dir) => Corpus.chunkDocs(t(s, dir, "documents"),
        chunkTokens = 64, overlap = 16)
        // determinism sort lives in the WRAPPER: the operator itself stays
        // sort-free so the chunk stream pipelines at scale
        .orderBy("doc_id", "chunk_index")),

    // Chunk-granularity exact dedup — the RAG-index hygiene step: chunk
    // every document into overlapping 64-token windows, then find window
    // TEXTS that repeat (within a doc via self-repetition, or across the
    // corpus's near/exact duplicate docs) — exactly what gets dropped
    // before embedding a retrieval index so duplicate passages can't
    // dominate nearest-neighbor results. Composes chunkDocs with the
    // md5-group exact-dedup shape; DuckDB recomputes the identical
    // windows and grouping from scratch.
    Q("q_chunk_dedup", Some("""
      WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), starts AS (
        SELECT doc_id, t,
               unnest(range(0, greatest(len(t) - 16 - 1, 0) // 48 * 48 + 1, 48)) AS s
        FROM tok WHERE len(t) > 0
      ), chunks AS (
        SELECT doc_id, array_to_string(t[s + 1 : s + 64], ' ') AS chunk_text
        FROM starts
      )
      SELECT md5(chunk_text) AS content_hash,
             count(*) AS n_copies,
             count(DISTINCT doc_id) AS n_docs,
             min(doc_id) AS canonical_doc_id
      FROM chunks
      GROUP BY 1
      HAVING count(*) > 1
      ORDER BY content_hash"""),
      (s, dir) => Corpus.chunkDocs(t(s, dir, "documents"),
          chunkTokens = 64, overlap = 16)
        .groupBy(md5(col("chunk_text")).as("content_hash"))
        .agg(count(lit(1)).as("n_copies"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("canonical_doc_id"))
        .filter(col("n_copies") > 1)
        .orderBy("content_hash")),

    // COMPOSITION of the round-11 operators as one pipeline: quality-
    // keeper near-dup dedup (keep the LONGEST cluster member, by n_chars)
    // → REAL subword counts under the corpus-trained BPE merges →
    // token-budget data mix per source on those counts. DuckDB recomputes
    // the cluster/keeper stages from exact all-pairs Jaccard (RECURSIVE
    // closure) and joins the pinned per-doc BPE counts (BpeOracle — the
    // same pins q_text_bpe_encode verifies row-by-row), then applies the
    // identical running-total window.
    Q("q_corpus_pipeline_tokens", Some(s"""
      WITH RECURSIVE tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                      ELSE [array_to_string(t, ' ')] END) AS sh
        FROM tok
      ), cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(a.sh || b.sh)) >= 0.7
      ), edges AS (
        SELECT id_a AS s, id_b AS d FROM cand
        UNION ALL SELECT id_b, id_a FROM cand
      ), closure(s, d) AS (
        SELECT s, d FROM edges
        UNION
        SELECT c.s, e.d FROM closure c JOIN edges e ON c.d = e.s
      ), groups AS (
        SELECT s AS doc_id, least(s, min(d)) AS canonical_id
        FROM closure GROUP BY s
      ), ranked AS (
        SELECT g.doc_id,
               row_number() OVER (PARTITION BY g.canonical_id
                                  ORDER BY d.n_chars DESC, g.doc_id) AS rn
        FROM groups g JOIN documents d USING (doc_id)
      ), bpe(bdoc_id, n_subwords) AS (SELECT * FROM (VALUES ${BpeOracle.countValues})),
      kept AS (
        SELECT d.source, d.doc_id, CAST(bpe.n_subwords AS BIGINT) AS n_subwords
        FROM documents d JOIN bpe ON bpe.bdoc_id = d.doc_id
        WHERE d.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)
      )
      SELECT source, doc_id, cum_cost FROM (
        SELECT source, doc_id,
               CAST(sum(n_subwords) OVER (
                 PARTITION BY source
                 ORDER BY md5(COALESCE('v' || CAST(doc_id AS VARCHAR), 'null')),
                          doc_id, n_subwords
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cost
        FROM kept)
      WHERE cum_cost <= 15000
      ORDER BY source, cum_cost"""),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val best = Dedup.nearDupKeepBest(docs,
          Dedup.nearDuplicates(docs, threshold = 0.7), "n_chars")
        val kept = docs.join(
          best.filter(col("doc_id") =!= col("keep_id")).select("doc_id"),
          Seq("doc_id"), "left_anti")
        val merges = Corpus.trainBpe(docs, numMerges = 20).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        val counts = Corpus.bpeEncodeCounts(kept, merges)
        Corpus.tokenBudgetMix(
            kept.select("source", "doc_id").join(counts, "doc_id"),
            "source", "doc_id", "n_subwords", budget = 15000L)
          .select("source", "doc_id", "cum_cost")
          .orderBy("source", "cum_cost")
      }),

    // Pinned literal-VALUES oracle (SimhashOracle): simhash is an
    // engine-specific hash family, but deterministic — the full 840-row
    // output at sf0.01 is pinned, same pattern as q_text_fingerprint.
    Q("q_dedup_simhash", Some(SimhashOracle.sql),
      (s, dir) => Dedup.simhashDuplicates(t(s, dir, "documents"), maxDistance = 10)),

    // Ground-truth oracle, same reasoning as q_dedup_minhash: all-pairs exact
    // cosine >= threshold in DuckDB (double precision). The operator verifies
    // its LSH candidates with the same exact cosine, and this corpus's max
    // inter-pair cosine is 0.513 — nowhere near 0.95 — so the answer is the
    // empty set and any emitted pair is a hard failure.
    Q("q_dedup_embedding", Some("""
      WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      ), scored AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_inner_product(a.emb, b.emb)
                 / (sqrt(list_inner_product(a.emb, a.emb))
                    * sqrt(list_inner_product(b.emb, b.emb))) AS cos
        FROM v a JOIN v b ON a.vec_id < b.vec_id
      )
      SELECT id_a, id_b, round(cos, 6) AS cosine
      FROM scored WHERE cos >= 0.95
      ORDER BY id_a, id_b"""),
      (s, dir) => Similarity.embeddingDuplicates(
        t(s, dir, "embeddings"), threshold = 0.95)),

    // Brute-force cosine top-k IS oracle-able: the scores are deterministic
    // arithmetic once both engines compute in double (DuckDB's
    // list_cosine_similarity on FLOAT[] stays float32 — cast first), and both
    // sides rank on the ROUNDED cosine so ulp noise can't flip ranks.
    // int8 symmetric quantization of the embedding column (the standard
    // memory-shrink before ANN serving): per-vector scale = max |x|, codes =
    // round(x * 127 / scale). Scan-local higher-order functions, no UDF, no
    // shuffle; the q8 codes serialize to a string for the driver compare.
    Q("q_embed_quantize", Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
      SELECT vec_id,
             round(greatest(list_max(list_transform(emb, x -> abs(x))), 1e-9), 6) AS max_abs,
             array_to_string(list_transform(emb, x ->
               CAST(round(x * 127.0 / greatest(list_max(list_transform(emb, y -> abs(y))), 1e-9))
                    AS INTEGER)), ',') AS q8
      FROM v ORDER BY vec_id"""),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val maxAbs = greatest(
          array_max(transform(col("embedding"), x => abs(x.cast("double")))), lit(1e-9))
        emb.select(col("vec_id"),
          round(maxAbs, 6).as("max_abs"),
          concat_ws(",", transform(col("embedding"),
            x => round(x.cast("double") * lit(127.0) / maxAbs).cast("int").cast("string")))
            .as("q8"))
          .orderBy("vec_id")
      }),

    Q("q_sim_bruteforce", Some("""
      WITH probes AS (
        SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS probe_vec
        FROM embeddings WHERE vec_id < 5
      ), scored AS (
        SELECT p.probe_id, e.vec_id AS neighbor_id,
               round(list_inner_product(p.probe_vec, CAST(e.embedding AS DOUBLE[]))
                 / (sqrt(list_inner_product(p.probe_vec, p.probe_vec))
                    * sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))), 6) AS cosine
        FROM embeddings e JOIN probes p ON p.probe_id <> e.vec_id
      ), ranked AS (
        SELECT probe_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
      )
      SELECT probe_id, neighbor_id, cosine, rank
      FROM ranked WHERE rank <= 5
      ORDER BY probe_id, rank"""),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
        Similarity.bruteForceTopK(emb, probes, k = 5)
      }),

    // Class centroids in long form — posexplode + one (label, pos) hash agg
    // on the Spark side, unnest + generate_subscripts in DuckDB.
    Q("q_embedding_centroids", Some("""
      SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
             round(avg(v), 6) AS centroid
      FROM (
        SELECT label,
               unnest(CAST(embedding AS DOUBLE[])) AS v,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings
      )
      GROUP BY label, pos
      ORDER BY label, pos"""),
      (s, dir) => Similarity.centroids(t(s, dir, "embeddings"))),

    // LSH/IVF oracles pin WHICH neighbors the (deterministic) approximate
    // index selects for the sf0.01 corpus — candidate selection is
    // engine-specific by nature — but make DuckDB RECOMPUTE every cosine
    // from the raw embeddings, so the hash compare cross-checks our native
    // vec_cosine kernel's arithmetic pair by pair. Recall itself is gated
    // separately in SketchSpec against brute force.
    Q("q_sim_lsh", Some(simPickedOracle(
      "(0,423,1),(0,229,2),(0,29,3),(0,443,4),(0,22,5)," +
      "(1,2,1),(2,1,1),(2,28,2),(3,396,1)," +
      "(4,136,1),(4,366,2),(4,275,3)")),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
        Similarity.lshTopK(emb, probes, k = 5)
      }),

    Q("q_sim_ivf", Some(simPickedOracle(
      "(0,365,1),(0,334,2),(0,387,3),(0,423,4),(0,73,5)," +
      "(1,195,1),(1,64,2),(1,124,3),(1,472,4),(1,312,5)," +
      "(2,117,1),(2,450,2),(2,145,3),(2,188,4),(2,320,5)," +
      "(3,231,1),(3,474,2),(3,463,3),(3,444,4),(3,449,5)," +
      "(4,496,1),(4,280,2),(4,249,3),(4,89,4),(4,332,5)")),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
        Similarity.ivfTopK(emb, probes, k = 5)
      }),

    // ANN QUALITY, driver-visible: recall@10 of the at-rest IVF index vs
    // exact brute-force cosine top-10, swept over nProbe 2/4/8 of 16
    // lists — the recall/efficiency tradeoff curve a production deploy
    // tunes (more lists probed = more I/O, higher recall; 0.31/0.48/0.70
    // on the sf0.01 gaussian embeddings, where neighbors are nearly
    // unclustered — the HARD regime; planted near-dup recall, the regime
    // ANN dedup actually serves, is ~1.0 and spec'd in SketchSpec).
    // DuckDB recomputes the EXACT top-10 from raw embeddings and derives
    // recall against the PINNED deterministic IVF picks (RecallOracle,
    // regenerate with tools.DumpRecall) — a drifted index, a broken
    // pruning path, or a recall regression all go red.
    Q("q_sim_recall", Some(s"""
      WITH picked(n_probe, probe_id, neighbor_id) AS
        (SELECT * FROM (VALUES ${RecallOracle.pickValues})),
      v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      pr AS (SELECT vec_id AS probe_id, emb AS pemb FROM v WHERE vec_id < 10),
      scored AS (
        SELECT pr.probe_id, v.vec_id,
               round(list_inner_product(pr.pemb, v.emb)
                 / (sqrt(list_inner_product(pr.pemb, pr.pemb))
                    * sqrt(list_inner_product(v.emb, v.emb))), 6) AS cos
        FROM pr JOIN v ON v.vec_id <> pr.probe_id
      ), exact AS (
        SELECT probe_id, vec_id
        FROM (SELECT probe_id, vec_id,
                     row_number() OVER (PARTITION BY probe_id
                                        ORDER BY cos DESC, vec_id) AS rnk
              FROM scored)
        WHERE rnk <= 10
      )
      SELECT CAST(p.n_probe AS BIGINT) AS n_probe,
             CAST(count(e.vec_id) AS BIGINT) AS n_hit,
             round(count(e.vec_id) / 100.0, 6) AS recall
      FROM picked p
      LEFT JOIN exact e ON e.probe_id = p.probe_id AND e.vec_id = p.neighbor_id
      GROUP BY p.n_probe
      ORDER BY n_probe"""),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
        val out = scratchDir("sim_recall") + "/corpus.parquet"
        val exact = Similarity.bruteForceTopK(emb, probes, k = 10)
          .select(col("probe_id"), col("neighbor_id"))
        Seq(2, 4, 8).map { nProbe =>
          Similarity.ivfTopKAtRest(s, out, probes, k = 10, nProbe = nProbe,
              idCol = "vec_id", vecCol = "embedding")
            .select(lit(nProbe.toLong).as("n_probe"),
              col("probe_id"), col("neighbor_id"))
        }.reduce(_ unionAll _)
          .join(exact.withColumn("hit", lit(1L)),
            Seq("probe_id", "neighbor_id"), "left")
          .groupBy("n_probe")
          .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .select(col("n_probe"), col("n_hit"),
            round(col("n_hit") / 100.0, 6).as("recall"))
          .orderBy("n_probe")
      },
      // seed (untimed): the timed number is the three pruned at-rest
      // probes + one brute-force pass — the quality AUDIT a deploy runs
      prepare = Some((s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfWriteAtRest(emb,
          Similarity.ivfTrainKmeans(emb, nLists = 16, iters = 10),
          scratchDir("sim_recall") + "/corpus.parquet", replicas = 2)
      })),

    // PRODUCT QUANTIZATION, exact-reranked — the two-stage ANN serving
    // shape: the corpus is scored from its 8-byte PQ codes (32× smaller
    // than the float32 vectors) against each probe's broadcast ADC lookup
    // table, then only the top-20 survivors per probe fetch raw vectors
    // for EXACT cosine reranking. The returned scores are true cosines, so
    // the picks pin the deterministic (trained) model's selection and
    // DuckDB recomputes every pair's cosine from the raw embeddings — a
    // drifted pqTrain, a broken encode/LUT/ADC kernel, or a rerank bug all
    // go red. Pins regenerate with tools.DumpPq.
    Q("q_sim_pq", Some(simPickedOracle(
      "(0,365,1),(0,334,2),(0,387,3),(0,423,4),(0,73,5)," +
      "(1,386,1),(1,27,2),(1,195,3),(1,64,4),(1,353,5)," +
      "(2,117,1),(2,145,2),(2,471,3),(2,172,4),(2,440,5)," +
      "(3,130,1),(3,315,2),(3,474,3),(3,396,4),(3,490,5)," +
      "(4,114,1),(4,482,2),(4,249,3),(4,257,4),(4,346,5)")),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
        val cb = Similarity.pqReadModel(s, scratchDir("sim_pq"))
        Similarity.pqTopK(emb, probes, cb, k = 5, rerank = 20)
      },
      // seed (untimed): train the m=8/ksub=16 model once and persist it —
      // the timed number is the ADC code scan + candidate-sized rerank
      prepare = Some((s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.pqWriteModel(s, scratchDir("sim_pq"),
          Similarity.pqTrain(emb, m = 8, ksub = 16, iters = 5))
      })),

    // PQ COMPRESSION/RECALL CURVE, driver-visible: ADC-only recall@10 vs
    // exact brute-force cosine top-10, swept over m = 16/8/4 subquantizers
    // (16×/32×/64× compression) — the storage/quality tradeoff a 100 TB
    // embedding store tunes. Same oracle design as q_sim_recall: DuckDB
    // recomputes the EXACT top-10 from raw embeddings and derives recall
    // against the PINNED deterministic PQ picks (PqOracle, regenerate with
    // tools.DumpPq). Gaussian embeddings are the no-structure WORST case
    // (0.48/0.33/0.17); planted near-dup recall ~1.0 and the rerank
    // recovery path are spec'd in SketchSpec.
    Q("q_sim_pq_recall", Some(s"""
      WITH picked(m, probe_id, neighbor_id) AS
        (SELECT * FROM (VALUES ${PqOracle.pickValues})),
      v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      pr AS (SELECT vec_id AS probe_id, emb AS pemb FROM v WHERE vec_id < 10),
      scored AS (
        SELECT pr.probe_id, v.vec_id,
               round(list_inner_product(pr.pemb, v.emb)
                 / (sqrt(list_inner_product(pr.pemb, pr.pemb))
                    * sqrt(list_inner_product(v.emb, v.emb))), 6) AS cos
        FROM pr JOIN v ON v.vec_id <> pr.probe_id
      ), exact AS (
        SELECT probe_id, vec_id
        FROM (SELECT probe_id, vec_id,
                     row_number() OVER (PARTITION BY probe_id
                                        ORDER BY cos DESC, vec_id) AS rnk
              FROM scored)
        WHERE rnk <= 10
      )
      SELECT CAST(p.m AS BIGINT) AS m,
             CAST(count(e.vec_id) AS BIGINT) AS n_hit,
             round(count(e.vec_id) / 100.0, 6) AS recall
      FROM picked p
      LEFT JOIN exact e ON e.probe_id = p.probe_id AND e.vec_id = p.neighbor_id
      GROUP BY p.m
      ORDER BY m"""),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
        val exact = Similarity.bruteForceTopK(emb, probes, k = 10)
          .select(col("probe_id"), col("neighbor_id"))
        Seq(16, 8, 4).map { m =>
          val cb = Similarity.pqReadModel(s, scratchDir("sim_pq_recall") + s"/m$m")
          Similarity.pqTopK(emb, probes, cb, k = 10)
            .select(lit(m.toLong).as("m"), col("probe_id"), col("neighbor_id"))
        }.reduce(_ unionAll _)
          .join(exact.withColumn("hit", lit(1L)),
            Seq("probe_id", "neighbor_id"), "left")
          .groupBy("m")
          .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .select(col("m"), col("n_hit"),
            round(col("n_hit") / 100.0, 6).as("recall"))
          .orderBy("m")
      },
      // seed (untimed): train + persist the three models; the timed number
      // is three ADC code scans + one brute-force exact pass (the audit)
      prepare = Some((s, dir) => {
        val emb = t(s, dir, "embeddings")
        Seq(16, 8, 4).foreach { m =>
          Similarity.pqWriteModel(s, scratchDir("sim_pq_recall") + s"/m$m",
            Similarity.pqTrain(emb, m = m, ksub = 16, iters = 5))
        }
      })),

    // IVF AT REST — the 100 TB layout: the assigned corpus persisted
    // partitionBy(list_id), probed through a static list_id filter so the
    // parquet scan plans ONLY the nProbe×|probes| wanted partitions
    // (partition-count asserted in SketchSpec; SCALE.md records the I/O
    // ratio). The query's verdict: the at-rest probe must return EXACTLY
    // the in-memory ivfTopK result on the same codebook — 5 probes × k=5
    // rows, zero mismatches (symmetric exceptAll).
    Q("q_sim_ivf_at_rest", Some("""
      SELECT CAST(25 AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch"""),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
        val out = scratchDir("ivf_at_rest") + "/corpus.parquet"
        val centroids = Similarity.readCodebook(s, out).get
        val atRest = Similarity.ivfTopKAtRest(s, out, probes, centroids, k = 5)
        val inMem = Similarity.ivfTopK(emb, probes, k = 5)
        val diff = atRest.exceptAll(inMem).unionAll(inMem.exceptAll(atRest))
        atRest.agg(count(lit(1)).as("n_rows"))
          .crossJoin(diff.agg(count(lit(1)).as("n_mismatch")))
      },
      // seed (untimed): the timed number is the pruned at-rest probe +
      // the in-memory comparator; the probe loads the PERSISTED codebook
      prepare = Some((s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfWriteAtRest(emb, Similarity.ivfCodebook(emb),
          scratchDir("ivf_at_rest") + "/corpus.parquet")
      })),

    // IVF-PQ AT REST — the full 100 TB ANN serving stack: lists pruned to
    // the probes' nProbe partitions AND the pruned scan reads only the
    // 8-byte PQ codes (the embedding column's pages never load); the
    // top-20 ADC survivors per probe turn into a static IN point-fetch of
    // raw vectors for exact reranking. Verdict: the at-rest two-stage
    // probe must return EXACTLY the in-memory IVF-PQ comparator's result
    // on the same codebook + model — 5 probes × k=5, zero mismatches.
    Q("q_sim_ivfpq_at_rest", Some("""
      SELECT CAST(25 AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch"""),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
        val out = scratchDir("ivfpq_at_rest") + "/corpus.parquet"
        val atRest = Similarity.ivfPqTopKAtRest(s, out, probes, k = 5, rerank = 20)
        val inMem = Similarity.ivfPqTopK(emb, probes,
          Similarity.readCodebook(s, out).get,
          Similarity.ivfPqModel(s, out).get, k = 5, rerank = 20)
        val diff = atRest.exceptAll(inMem).unionAll(inMem.exceptAll(atRest))
        atRest.agg(count(lit(1)).as("n_rows"))
          .crossJoin(diff.agg(count(lit(1)).as("n_mismatch")))
      },
      // seed (untimed): IVF codebook + trained PQ model, written together;
      // the timed number is the code-only ADC scan + point fetch + the
      // in-memory comparator
      prepare = Some((s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfWriteAtRest(emb, Similarity.ivfCodebook(emb),
          scratchDir("ivfpq_at_rest") + "/corpus.parquet",
          pqModel = Similarity.pqTrain(emb, m = 8, ksub = 16, iters = 5))
      })),

    // RESIDUAL IVF-PQ AT REST — the FAISS-style refinement of
    // q_sim_ivfpq_at_rest: codes quantize `normalized(v) − centroid[list]`
    // (within-cell residual variance ≪ global variance, so the same m×ksub
    // budget quantizes finer; PqResidualSpec pins the ADC recall gain) and
    // probes score the EXACT probe·centroid term plus the residual ADC.
    // Same verdict design: the at-rest two-stage probe must return EXACTLY
    // the in-memory residual comparator's result — 5 probes × k=5, zero
    // mismatches.
    Q("q_sim_ivfpq_residual", Some("""
      SELECT CAST(25 AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch"""),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
        val out = scratchDir("ivfpq_residual") + "/corpus.parquet"
        val atRest = Similarity.ivfPqTopKAtRest(s, out, probes, k = 5, rerank = 20)
        val inMem = Similarity.ivfPqTopK(emb, probes,
          Similarity.readCodebook(s, out).get,
          Similarity.ivfPqModel(s, out).get, k = 5, rerank = 20, residual = true)
        val diff = atRest.exceptAll(inMem).unionAll(inMem.exceptAll(atRest))
        atRest.agg(count(lit(1)).as("n_rows"))
          .crossJoin(diff.agg(count(lit(1)).as("n_mismatch")))
      },
      // seed (untimed): IVF codebook + residual-trained PQ model persisted
      // together (the residual flag rides in the model sidecar header)
      prepare = Some((s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cents = Similarity.ivfCodebook(emb)
        Similarity.ivfWriteAtRest(emb, cents,
          scratchDir("ivfpq_residual") + "/corpus.parquet",
          pqModel = Similarity.pqTrainResidual(emb, cents, m = 8, ksub = 16, iters = 5),
          pqResidual = true)
      })),

    // IVF MAINTENANCE end to end: seed at rest under a sampled codebook,
    // append a mean-shifted drift batch under the SAME (stale) codebook,
    // then ivfRetrain — k-means over the full table, partitioned rewrite,
    // new codebook returned. Verdict: the retrained at-rest probe equals
    // the in-memory scoring of the full corpus under the same new
    // codebook — 5 probes × k=5 rows, zero mismatches (symmetric
    // exceptAll). QueryScratch.fresh wipes the append-mode target per
    // execution so bench re-runs don't accrete drift replicas.
    Q("q_sim_ivf_retrain", Some("""
      SELECT CAST(25 AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch"""),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
        val out = QueryScratch.dir("ivf_retrain_q") + "/corpus.parquet"
        val drift = emb.select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(0.5f) + lit(0.5f)).as("embedding"),
          col("label"))
        // maxTrainRows = 1024 exercises the SAMPLED training path (the
        // enforced 100 TB recipe: k-means over a deterministic hash-sample,
        // full-table reassignment) — the oracle is model-agnostic (the same
        // new codebook scores both sides), so the verdict stays exact
        val newCb = Similarity.ivfRetrain(s, out, nLists = 16, iters = 2,
          maxTrainRows = 1024)
        val full = emb.select("vec_id", "embedding")
          .unionByName(drift.select("vec_id", "embedding"))
        val atRest = Similarity.ivfTopKAtRest(s, out, probes, newCb, k = 5)
        val inMem = Similarity.ivfTopK(full, probes, newCb, k = 5, nProbe = 4,
          idCol = "vec_id", vecCol = "embedding")
        val diff = atRest.exceptAll(inMem).unionAll(inMem.exceptAll(atRest))
        atRest.agg(count(lit(1)).as("n_rows"))
          .crossJoin(diff.agg(count(lit(1)).as("n_mismatch")))
      },
      // seed (untimed): stale-codebook drift state; the timed number is
      // the RETRAIN (k-means + rewrite) plus the verification probes.
      // fresh per attempt so re-runs don't accrete drift replicas
      prepare = Some((s, dir) => {
        val emb = t(s, dir, "embeddings")
        val out = QueryScratch.fresh("ivf_retrain_q") + "/corpus.parquet"
        val oldCb = Similarity.ivfCodebook(emb)
        Similarity.ivfWriteAtRest(emb, oldCb, out)
        Similarity.ivfAppendAtRest(
          emb.select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(0.5f) + lit(0.5f)).as("embedding"),
            col("label")),
          oldCb, out)
      })),

    // OFFLINE VECTOR RECHECK — the deep-clean backstop for the ingest
    // loop's cross-probe caveat: 20 exact copies (cosine 1.0, ids
    // +5,000,000) are planted directly at rest (the bulk seed does not
    // dedupe), then ivfRecheck sweeps the whole table with banded
    // sign-LSH + exact verification (independent of the IVF cells) and
    // drops each pair's larger id. The query returns the DROPPED ids;
    // DuckDB recomputes them from raw embeddings: exactly the planted
    // copies (threshold 0.98 — natural max cosine in this corpus ~0.5,
    // so no engine-noise ambiguity), no pins.
    Q("q_sim_recheck", Some("""
      WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cop AS (SELECT vec_id + 5000000 AS vec_id, v FROM base WHERE vec_id < 20),
      allv AS (SELECT * FROM base UNION ALL SELECT * FROM cop),
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM allv a JOIN allv b
          ON a.vec_id < b.vec_id
        WHERE list_inner_product(a.v, b.v)
              / (sqrt(list_inner_product(a.v, a.v))
                 * sqrt(list_inner_product(b.v, b.v))) >= 0.98)
      SELECT DISTINCT CAST(id_b AS BIGINT) AS vec_id FROM pairs ORDER BY 1"""),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = QueryScratch.dir("sim_recheck") + "/corpus.parquet"
        val before = emb.select("vec_id")
          .unionByName(emb.filter(col("vec_id") < 20)
            .select((col("vec_id") + 5000000L).as("vec_id")))
        Similarity.ivfRecheck(s, path, threshold = 0.98)
        val survivors = Similarity.ivfRead(s, path)
          .select("vec_id").dropDuplicates("vec_id")
        before.join(survivors, Seq("vec_id"), "left_anti")
          .select(col("vec_id")).orderBy("vec_id")
      },
      // seed (untimed): the accreted table — originals plus exact copies;
      // fresh per attempt so re-runs re-plant what the sweep removes
      prepare = Some((s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = QueryScratch.fresh("sim_recheck") + "/corpus.parquet"
        val planted = emb.select("vec_id", "embedding")
          .unionByName(emb.filter(col("vec_id") < 20)
            .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding")))
        Similarity.ivfWriteAtRest(planted, Similarity.ivfCodebook(emb), path)
      })),

    // FILTERED ANN (round 16): top-k restricted to rows whose PAYLOAD
    // matches a predicate (label = 3) — the production "search within a
    // metadata slice" shape. candidateFilter pushes into the SAME pruned
    // parquet scan as the list_id partition filter (plan-asserted in
    // SketchSpec), so a selective filter shrinks the code scan instead
    // of post-filtering results. Verdict: the at-rest filtered IVF-PQ
    // probe ≡ the in-memory IVF-PQ comparator over the PRE-filtered
    // corpus under the same codebook+model — 5 probes × k=5 rows, zero
    // mismatches (symmetric exceptAll); nProbe = nLists so the verdict
    // covers every candidate the filter admits.
    Q("q_sim_filtered", Some("""
      SELECT CAST(25 AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch"""),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = scratchDir("sim_filtered") + "/corpus.parquet"
        val cb = Similarity.readCodebook(s, path).get
        val pq = Similarity.ivfPqModel(s, path).get
        val probes = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
        val atRest = Similarity.ivfPqTopKAtRest(s, path, probes, k = 5,
          nProbe = 16, rerank = 30, candidateFilter = col("label") === 3)
        val inMem = Similarity.ivfPqTopK(emb.filter(col("label") === 3)
            .select("vec_id", "embedding"), probes, cb, pq,
          k = 5, nProbe = 16, rerank = 30)
        val diff = atRest.exceptAll(inMem).unionAll(inMem.exceptAll(atRest))
        atRest.agg(count(lit(1)).as("n_rows"))
          .crossJoin(diff.agg(count(lit(1)).as("n_mismatch")))
      },
      // seed (untimed): IVF-PQ table with the label column riding at rest
      prepare = Some((s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = QueryScratch.fresh("sim_filtered") + "/corpus.parquet"
        Similarity.ivfWriteAtRest(emb, Similarity.ivfCodebook(emb), path,
          pqModel = Similarity.pqTrain(emb, m = 8, ksub = 16, iters = 3))
      })),

    // INCREMENTAL vector recheck — q_dedup_recheck_since's IVF twin and
    // q_sim_recheck's steady-state path: the seed holds a pre-existing
    // near-dup pair (exact copies at +6,000,000 — OLD vs OLD, adjudicated
    // by a previous pass by contract), batch 0 ingests exact copies at
    // +5,000,000 under a threshold the admission check cannot trip
    // (1.1 > any cosine — the accretion class the backstop exists for),
    // then the frontier-driven ivfRecheckIncremental re-adjudicates ONLY
    // pairs involving batch-0 vectors: the +5M copies drop (each pair's
    // larger id), the +6M seed pair SURVIVES (outside the window — a full
    // sweep would have dropped it, so the oracle verdict distinguishes
    // the two). DuckDB recomputes the dropped ids from raw embeddings
    // (exact cosine >= 0.98 restricted to pairs touching a new id), no
    // pins; a wrongly-dropped old id would surface as an extra row.
    Q("q_sim_recheck_since", Some("""
      WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      newv AS (SELECT vec_id + 5000000 AS vec_id, v FROM base
               WHERE vec_id >= 10 AND vec_id < 30),
      oldv AS (SELECT vec_id + 6000000 AS vec_id, v FROM base WHERE vec_id < 10),
      allv AS (SELECT * FROM base UNION ALL SELECT * FROM oldv),
      dropped AS (
        SELECT DISTINCT n.vec_id FROM newv n JOIN allv a
          ON a.vec_id <> n.vec_id
         AND list_inner_product(n.v, a.v)
             / (sqrt(list_inner_product(n.v, n.v))
                * sqrt(list_inner_product(a.v, a.v))) >= 0.98)
      SELECT CAST(vec_id AS BIGINT) AS vec_id FROM dropped ORDER BY 1"""),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = QueryScratch.dir("sim_recheck_since") + "/corpus.parquet"
        val before = emb.select("vec_id")
          .unionByName(emb.filter(col("vec_id") < 10)
            .select((col("vec_id") + 6000000L).as("vec_id")))
          .unionByName(emb.filter(col("vec_id") >= 10 && col("vec_id") < 30)
            .select((col("vec_id") + 5000000L).as("vec_id")))
        Similarity.ivfRecheckIncremental(s, path, threshold = 0.98)
        val survivors = Similarity.ivfRead(s, path)
          .select("vec_id").dropDuplicates("vec_id")
        before.join(survivors, Seq("vec_id"), "left_anti")
          .select(col("vec_id")).orderBy("vec_id")
      },
      // seed (untimed): versioned seed incl. the out-of-window pair, plus
      // the exactly-once batch-0 ingest of the in-window copies; the timed
      // number is the INCREMENTAL recheck itself. fresh per attempt.
      prepare = Some((s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = QueryScratch.fresh("sim_recheck_since") + "/corpus.parquet"
        val seed = emb.select("vec_id", "embedding")
          .unionByName(emb.filter(col("vec_id") < 10)
            .select((col("vec_id") + 6000000L).as("vec_id"), col("embedding")))
        Similarity.ivfWriteAtRest(seed, Similarity.ivfCodebook(emb), path)
        Similarity.ivfIngestBatch(
          emb.filter(col("vec_id") >= 10 && col("vec_id") < 30)
            .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding")),
          path, threshold = 1.1, nProbe = 4, idCol = "vec_id",
          vecCol = "embedding", batchId = 0L)
      })),

    // FILTERED-ANN RECALL CURVE (round 17): recall@10 of the at-rest
    // FILTERED raw-vector IVF probe vs EXACT top-10 over the filtered
    // corpus, at FIXED nProbe = 4 of 16 lists across three filter
    // selectivities (~50% / ~10% / ~2%) — the known IVF×filter
    // interaction: lists partition by geometry, not payload, so a
    // sharpening filter empties the probed lists and recall sags at
    // fixed nProbe (the mitigation — filterSelectivityHint widening the
    // probe to ceil(nProbe/s) lists, capped at nLists — is spec'd in
    // SketchSpec; SCALE.md names the crossover). DuckDB recomputes the
    // exact side over each filtered corpus and derives recall against
    // the PINNED deterministic picks (FilteredRecallOracle, regenerate
    // with tools.DumpRecall).
    Q("q_sim_filtered_recall", Some(s"""
      WITH picked(sel, probe_id, neighbor_id) AS
        (SELECT * FROM (VALUES ${FilteredRecallOracle.pickValues})),
      v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings),
      pr AS (SELECT vec_id AS probe_id, emb AS pemb FROM v WHERE vec_id < 10),
      f AS (SELECT 50 AS sel, vec_id, emb FROM v WHERE label >= 5
            UNION ALL SELECT 10, vec_id, emb FROM v WHERE label = 3
            UNION ALL SELECT 2, vec_id, emb FROM v
              WHERE label = 3 AND vec_id % 5 = 0),
      scored AS (
        SELECT f.sel, pr.probe_id, f.vec_id,
               round(list_inner_product(pr.pemb, f.emb)
                 / (sqrt(list_inner_product(pr.pemb, pr.pemb))
                    * sqrt(list_inner_product(f.emb, f.emb))), 6) AS cos
        FROM pr JOIN f ON f.vec_id <> pr.probe_id),
      exact AS (
        SELECT sel, probe_id, vec_id
        FROM (SELECT sel, probe_id, vec_id,
                     row_number() OVER (PARTITION BY sel, probe_id
                                        ORDER BY cos DESC, vec_id) AS rnk
              FROM scored)
        WHERE rnk <= 10),
      ex_n AS (SELECT sel, count(*) AS n_exact FROM exact GROUP BY sel)
      SELECT CAST(p.sel AS BIGINT) AS sel,
             CAST(count(e.vec_id) AS BIGINT) AS n_hit,
             CAST(x.n_exact AS BIGINT) AS n_exact,
             round(count(e.vec_id) * 1.0 / x.n_exact, 6) AS recall
      FROM picked p
      JOIN ex_n x ON x.sel = p.sel
      LEFT JOIN exact e ON e.sel = p.sel AND e.probe_id = p.probe_id
                       AND e.vec_id = p.neighbor_id
      GROUP BY p.sel, x.n_exact
      ORDER BY sel"""),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = scratchDir("sim_filtered_recall") + "/corpus.parquet"
        val probes = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"),
            col("embedding").as("probe_vec"))
        val sels = Seq(
          (50L, col("label") >= 5),
          (10L, col("label") === 3),
          (2L, col("label") === 3 && pmod(col("vec_id"), lit(5)) === 0))
        val picks = sels.map { case (tag, pred) =>
          Similarity.ivfTopKAtRest(s, path, probes,
              Similarity.readCodebook(s, path).get, k = 10, nProbe = 4,
              idCol = "vec_id", vecCol = "embedding", candidateFilter = pred)
            .select(lit(tag).as("sel"), col("probe_id"), col("neighbor_id"))
        }.reduce(_ unionAll _)
        val exact = sels.map { case (tag, pred) =>
          Similarity.bruteForceTopK(emb.filter(pred), probes, k = 10)
            .select(lit(tag).as("sel"), col("probe_id"), col("neighbor_id"))
        }.reduce(_ unionAll _).localCheckpoint(true)
        val exN = exact.groupBy("sel").agg(count(lit(1)).as("n_exact"))
        picks.join(exact.withColumn("hit", lit(1L)),
            Seq("sel", "probe_id", "neighbor_id"), "left")
          .groupBy("sel")
          .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .join(exN, "sel")
          .select(col("sel"), col("n_hit"), col("n_exact"),
            round(col("n_hit") * lit(1.0) / col("n_exact"), 6).as("recall"))
          .orderBy("sel")
      },
      // seed (untimed): the label payload rides at rest beside the
      // vectors; the timed number is three filtered pruned probes + one
      // brute-force exact pass per filter (the quality audit)
      prepare = Some((s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfWriteAtRest(emb,
          Similarity.ivfTrainKmeans(emb, nLists = 16, iters = 10),
          scratchDir("sim_filtered_recall") + "/corpus.parquet",
          replicas = 2)
      })),

    // THRESHOLD CALIBRATION (round 17): the r16 decade run found 17
    // GENUINE >= 0.95 cosine collisions among non-duplicates at 5M rows —
    // at scale a constant near-dup threshold needs to be DATA-DERIVED.
    // calibrateThreshold samples the non-dup pair-cosine distribution and
    // returns the threshold at a target false-collision quantile as an
    // EXACT ORDER STATISTIC (the k-th largest pair cosine, k =
    // ceil(rate × nPairs)) — no quantile interpolation, so DuckDB
    // recomputes the identical value from the same deterministic sample
    // (here a vec_id % 2 pre-filter with the internal cut disabled; the
    // operator's own hash-cut is the production path). Any drift in the
    // cosine kernel, the pair set, or the rank arithmetic goes red.
    Q("q_sim_calibrate", Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                 FROM embeddings WHERE vec_id % 2 = 0),
      c AS (SELECT round(list_inner_product(a.emb, b.emb)
              / (sqrt(list_inner_product(a.emb, a.emb))
                 * sqrt(list_inner_product(b.emb, b.emb))), 6) AS cos
            FROM v a JOIN v b ON a.vec_id < b.vec_id),
      n AS (SELECT (SELECT count(*) FROM v) AS n_sampled,
                   count(*) AS n_pairs,
                   greatest(1, CAST(ceil(0.001 * count(*)) AS BIGINT)) AS k
            FROM c),
      ranked AS (SELECT cos, row_number() OVER (ORDER BY cos DESC) AS r
                 FROM c)
      SELECT CAST(n.n_sampled AS BIGINT) AS n_sampled,
             CAST(n.n_pairs AS BIGINT) AS n_pairs,
             CAST(n.k AS BIGINT) AS k,
             (SELECT cos FROM ranked WHERE r = n.k) AS threshold
      FROM n"""),
      (s, dir) => Similarity.calibrateThreshold(
        t(s, dir, "embeddings").filter(pmod(col("vec_id"), lit(2)) === 0),
        falsePairRate = 0.001, maxSampleRows = 0)),

    // Tokenizer training: the BPE merge table (Sennrich-style word-
    // frequency formulation — one corpus scan builds the vocab, then 20
    // argmax/rewrite rounds over the vocab alone). Deterministic (ties
    // break lexicographically), so the full sf0.01 merge table is pinned
    // as a literal-VALUES oracle (FingerprintOracle pattern; regenerate
    // with `tools.DumpBpe`).
    Q("q_text_bpe", Some("""
      SELECT CAST(c0 AS BIGINT) AS rank, c1 AS "left", c2 AS "right",
             c3 AS merged, CAST(c4 AS BIGINT) AS pair_count
      FROM (VALUES
        (1, 'e', 'r', 'er', 4568),(2, 'e', '</w>', 'e</w>', 4473),
        (3, 'n', '</w>', 'n</w>', 2834),(4, 'er', '</w>', 'er</w>', 2779),
        (5, 'o', 'w', 'ow', 2747),(6, 'ow', '</w>', 'ow</w>', 2747),
        (7, 'o', 'r', 'or', 2696),(8, 's', 't', 'st', 2676),
        (9, 'h', '</w>', 'h</w>', 1884),(10, 'a', 't', 'at', 1845),
        (11, 'l', 'u', 'lu', 1831),(12, 'i', 'n', 'in', 1796),
        (13, 'a', '</w>', 'a</w>', 1788),(14, 'g', '</w>', 'g</w>', 1777),
        (15, 'y', '</w>', 'y</w>', 1767),(16, 'a', 'r', 'ar', 1758),
        (17, 'p', 'ar', 'par', 1758),(18, 't', '</w>', 't</w>', 1750),
        (19, 'i', 'n</w>', 'in</w>', 964),(20, 'j', 'o', 'jo', 964))
        AS v(c0, c1, c2, c3, c4)
      ORDER BY rank"""),
      (s, dir) => Corpus.trainBpe(t(s, dir, "documents"), numMerges = 20)),

    // The ENCODE half: apply q_text_bpe's 20 merges back to the corpus and
    // count REAL subwords per document (the number a token-budget mix
    // actually needs, vs the bpeish proxy). Scan-local merge chain — no
    // join, no shuffle. Oracle = pinned per-doc counts (BpeOracle,
    // regenerate with tools.DumpBpe); the training merges are re-derived
    // in-query so train and encode can never drift.
    Q("q_text_bpe_encode", Some(BpeOracle.encodeSql),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = Corpus.trainBpe(docs, numMerges = 20).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        Corpus.bpeEncodeCounts(docs, merges)
      }),

    // The full tokenizer OUTPUT: per-document token-ID sequences under
    // the trained merges and the deterministic vocab map (</w>=0, base
    // alphabet, then merges by rank) — what sequence packing actually
    // consumes, vs q_text_bpe_encode's lengths. The doc_id < 40 slice's
    // complete id streams are pinned (BpeOracle.idValues, regenerate
    // with tools.DumpBpe); CorpusSpec proves corpus-wide that the ids
    // decode back to the exact token stream and their lengths equal the
    // counts operator. Merges re-derived in-query so train/encode can't
    // drift; ids serialize to CSV for the driver compare.
    Q("q_text_bpe_ids", Some(BpeOracle.idsSql),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = Corpus.trainBpe(docs, numMerges = 20).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        Corpus.bpeEncode(docs.filter(col("doc_id") < 40), merges)
          .select(col("doc_id"),
            concat_ws(",", col("token_ids")).as("token_ids_csv"))
          .orderBy("doc_id")
      }),

    // The VECTOR ingest micro-batch end to end (the embedding twin of
    // q_dedup_ingest): the corpus seeds the at-rest IVF table, then
    // ivfIngestBatch runs the real loop on a planted batch — 10
    // near-copies of corpus vectors (x*1.001f, cosine ~1.0 -> cross-probe
    // drop), 10 mean-shifted novels (x*0.9f + 0.1f: max 0.79 vs corpus,
    // 0.66 in-batch — all admit), and 2 in-batch plants (copies of two
    // novels at larger ids -> greedy in-batch drop). DuckDB recomputes
    // BOTH drop rules from exact cosines over the same float32-transformed
    // vectors; every decision sits >= 0.03 from the 0.95 threshold, so
    // engine float noise cannot flip it. QueryScratch.fresh wipes the
    // append-mode table per execution.
    Q("q_sim_ivf_ingest", Some("""
      WITH corp AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      ), batch AS (
        SELECT vec_id + 2000000 AS bid,
               CAST(list_transform(embedding, x -> x * CAST(1.001 AS FLOAT)) AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 10
        UNION ALL
        SELECT vec_id + 1000000,
               CAST(list_transform(embedding, x -> x * CAST(0.9 AS FLOAT) + CAST(0.1 AS FLOAT)) AS DOUBLE[])
        FROM embeddings WHERE vec_id >= 50 AND vec_id < 60
        UNION ALL
        SELECT vec_id + 5000000,
               CAST(list_transform(list_transform(embedding, x -> x * CAST(0.9 AS FLOAT) + CAST(0.1 AS FLOAT)),
                 y -> CAST(y AS FLOAT) * CAST(1.002 AS FLOAT)) AS DOUBLE[])
        FROM embeddings WHERE vec_id >= 50 AND vec_id < 52
      ), in_drop AS (
        SELECT DISTINCT b.bid FROM batch a JOIN batch b ON a.bid < b.bid
        WHERE list_inner_product(a.v, b.v)
              / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) >= 0.95
      ), cross_drop AS (
        SELECT DISTINCT b.bid FROM batch b JOIN corp c
          ON list_inner_product(b.v, c.v)
             / (sqrt(list_inner_product(b.v, b.v)) * sqrt(list_inner_product(c.v, c.v))) >= 0.95
      )
      SELECT bid AS vec_id FROM batch
      WHERE bid NOT IN (SELECT bid FROM in_drop)
        AND bid NOT IN (SELECT bid FROM cross_drop)
      ORDER BY vec_id"""),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val out = QueryScratch.dir("ivf_ingest_q") + "/corpus.parquet"
        val cb = Similarity.readCodebook(s, out).get
        val novel = emb.filter(col("vec_id") >= 50 && col("vec_id") < 60)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(0.9f) + lit(0.1f)).as("embedding"))
        val batch = emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 2000000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
          .unionByName(novel)
          .unionByName(novel.filter(col("vec_id") < 1000052L)
            .select((col("vec_id") + 4000000L).as("vec_id"),
              transform(col("embedding"), y => y * lit(1.002f)).as("embedding")))
        Similarity.ivfIngestBatch(batch, cb, out, threshold = 0.95)
        Similarity.ivfRead(s, out)
          .filter(col("vec_id") >= 1000000L)
          .select("vec_id").orderBy("vec_id")
      },
      // seed (untimed): the timed number is the vector-ingest micro-batch
      // under the table's persisted codebook; fresh per attempt so the
      // append-mode table can't accrete across bench re-runs
      prepare = Some((s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfWriteAtRest(emb.select("vec_id", "embedding"),
          Similarity.ivfCodebook(emb),
          QueryScratch.fresh("ivf_ingest_q") + "/corpus.parquet")
      })),

    // The INCREMENTAL vector-table card — the IVF twin of
    // q_corpus_card_incremental: admitted vectors and the ingest loop's
    // near-duplicate drop history per label, read from the at-rest stats
    // LEDGER that ivfIngestBatch maintains batch-proportionally (at 100 TB
    // the alternative — a table sweep per report — dwarfs the ingest
    // itself). History: the %3==1 slice seeds the ledgered table, then TWO
    // exactly-once micro-batches ingest the %3==2 and %3==0 slices, each
    // salted with planted near-copies (x*1.001f, cosine ~1.0): copies of
    // at-rest vectors land in n_dropped_cross, copies of same-batch
    // members in n_dropped_batch (the greedy larger-id rule). nProbe=16 =
    // nLists makes the cross probe exhaustive, so DuckDB's all-pairs
    // recompute of BOTH drop rules from exact cosines is the exact oracle;
    // every decision sits >= 0.43 from the 0.95 threshold (natural max
    // cosine in this corpus is 0.52), so engine float noise cannot flip it.
    Q("q_sim_card_incremental", Some("""
      WITH emb_d AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      ), near_d AS (
        SELECT vec_id, label,
               CAST(list_transform(embedding, x -> x * CAST(1.001 AS FLOAT)) AS DOUBLE[]) AS v
        FROM embeddings
      ), seed AS (
        SELECT vec_id, label, v FROM emb_d WHERE vec_id % 3 = 1
      ), b1 AS (
        SELECT vec_id, label, v FROM emb_d WHERE vec_id % 3 = 2
        UNION ALL SELECT vec_id + 1000000, label, v FROM near_d
          WHERE vec_id % 3 = 1 AND vec_id % 5 = 0
        UNION ALL SELECT vec_id + 2000000, label, v FROM near_d
          WHERE vec_id % 3 = 2 AND vec_id % 5 = 0
      ), in1 AS (
        SELECT DISTINCT b.vec_id, b.label FROM b1 a JOIN b1 b ON a.vec_id < b.vec_id
        WHERE list_inner_product(a.v, b.v)
              / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) >= 0.95
      ), cross1 AS (
        SELECT DISTINCT a.vec_id, a.label FROM b1 a JOIN seed c
          ON list_inner_product(a.v, c.v)
             / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(c.v, c.v))) >= 0.95
      ), adm1 AS (
        SELECT * FROM b1 WHERE vec_id NOT IN (SELECT vec_id FROM in1)
          AND vec_id NOT IN (SELECT vec_id FROM cross1)
      ), tab1 AS (
        SELECT * FROM seed UNION ALL SELECT * FROM adm1
      ), b2 AS (
        SELECT vec_id, label, v FROM emb_d WHERE vec_id % 3 = 0
        UNION ALL SELECT vec_id + 3000000, label, v FROM near_d
          WHERE vec_id % 3 = 2 AND vec_id % 5 = 1
        UNION ALL SELECT vec_id + 4000000, label, v FROM near_d
          WHERE vec_id % 3 = 0 AND vec_id % 5 = 0
      ), in2 AS (
        SELECT DISTINCT b.vec_id, b.label FROM b2 a JOIN b2 b ON a.vec_id < b.vec_id
        WHERE list_inner_product(a.v, b.v)
              / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) >= 0.95
      ), cross2 AS (
        SELECT DISTINCT a.vec_id, a.label FROM b2 a JOIN tab1 c
          ON list_inner_product(a.v, c.v)
             / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(c.v, c.v))) >= 0.95
      ), adm2 AS (
        SELECT * FROM b2 WHERE vec_id NOT IN (SELECT vec_id FROM in2)
          AND vec_id NOT IN (SELECT vec_id FROM cross2)
      ), nv AS (
        SELECT label, count(*) AS n FROM
          (SELECT label FROM tab1 UNION ALL SELECT label FROM adm2) GROUP BY label
      ), db AS (
        SELECT label, count(*) AS n FROM
          (SELECT vec_id, label FROM in1 UNION ALL SELECT vec_id, label FROM in2)
        GROUP BY label
      ), dc AS (
        SELECT label, count(*) AS n FROM (
          SELECT vec_id, label FROM cross1
            WHERE vec_id NOT IN (SELECT vec_id FROM in1)
          UNION ALL
          SELECT vec_id, label FROM cross2
            WHERE vec_id NOT IN (SELECT vec_id FROM in2)) GROUP BY label
      ), labels AS (
        SELECT DISTINCT label FROM embeddings
      )
      SELECT CAST(l.label AS VARCHAR) AS label,
             CAST(COALESCE(nv.n, 0) AS BIGINT) AS n_vecs,
             CAST(COALESCE(db.n, 0) AS BIGINT) AS n_dropped_batch,
             CAST(COALESCE(dc.n, 0) AS BIGINT) AS n_dropped_cross
      FROM labels l
      LEFT JOIN nv USING (label)
      LEFT JOIN db USING (label)
      LEFT JOIN dc USING (label)
      ORDER BY 1"""),
      (s, dir) => {
        val path = QueryScratch.dir("sim_card_incr") + "/vectors.parquet"
        Similarity.ivfLedgerCard(s, path)
          .select("label", "n_vecs", "n_dropped_batch", "n_dropped_cross")
      },
      // seed (untimed): the ledgered table bootstrap + two real exactly-once
      // vector micro-batches; the timed number is the LEDGER READ — the
      // whole point of maintaining the card incrementally
      prepare = Some((s, dir) => {
        val emb = t(s, dir, "embeddings")
        val path = QueryScratch.fresh("sim_card_incr") + "/vectors.parquet"
        val cb = Similarity.ivfCodebook(emb)
        def near(src: org.apache.spark.sql.DataFrame, offset: Long) = src.select(
          (col("vec_id") + offset).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.001f)).as("embedding"),
          col("label"))
        val seed = emb.filter(col("vec_id") % 3 === 1)
          .select("vec_id", "embedding", "label")
        Similarity.ivfWriteAtRest(seed, cb, path, ledgerBy = "label")
        val o1 = emb.filter(col("vec_id") % 3 === 2)
          .select("vec_id", "embedding", "label")
        val b1 = o1.unionByName(near(seed.filter(col("vec_id") % 5 === 0), 1000000L))
          .unionByName(near(o1.filter(col("vec_id") % 5 === 0), 2000000L))
        Similarity.ivfIngestBatch(b1, cb, path, threshold = 0.95,
          nProbe = 16, batchId = 0L)
        val o2 = emb.filter(col("vec_id") % 3 === 0)
          .select("vec_id", "embedding", "label")
        val b2 = o2.unionByName(near(o1.filter(col("vec_id") % 5 === 1), 3000000L))
          .unionByName(near(o2.filter(col("vec_id") % 5 === 0), 4000000L))
        Similarity.ivfIngestBatch(b2, cb, path, threshold = 0.95,
          nProbe = 16, batchId = 1L)
      })),

    // Literal-VALUES oracle (the zarr-fixture pattern): the whole pipeline —
    // PNG/WAV synthesis, decode, bilinear resize, re-encode, feature
    // extraction, decimal-exact aggregation — is deterministic for the
    // sf0.01 corpus the driver verifies against (independent of partition
    // count: counts and byte sums are integer math and avg_f0 is a decimal
    // aggregate, order-independent by construction).
    Q("q_multimodal_features", Some("""
      SELECT * FROM (VALUES
        ('audio', CAST(167 AS BIGINT), CAST(97048 AS BIGINT), 0.301241),
        ('image', CAST(167 AS BIGINT), CAST(1929702 AS BIGINT), 0.499794),
        ('video', CAST(166 AS BIGINT), CAST(590110 AS BIGINT), 0.03996))
        AS v(media_type, n_assets, total_bytes, avg_f0)
      ORDER BY media_type"""),
      (s, dir) => Multimodal.featureSummary(s, t(s, dir, "documents")))
  )
}
