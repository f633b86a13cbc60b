package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/**
 * Deduplication operators for document corpora — the workhorses of a
 * training-data pipeline. Four families, all shuffle-frugal:
 *
 *  - exact: one hash groupBy; shuffled volume = one digest per row.
 *  - MinHash+LSH: signatures are scan-local maps (nested higher-order
 *    functions, no UDF); candidate generation explodes b band keys per doc
 *    and self-joins per bucket — the join is on (band, bandHash), so at
 *    100 TB it shuffles b small keys per doc, never the text. The final
 *    exact-Jaccard verification runs only on candidate pairs.
 *  - SimHash: 64-bit fingerprint via per-bit majority vote of token hashes
 *    (native per-row kernel — scan-local, no shuffle), near-dups
 *    = Hamming distance on band-matched fingerprints.
 *  - Embedding cosine: delegated to [[Similarity.cosine]] over candidate
 *    pairs from sign-LSH buckets.
 */
object Dedup {

  /** Exact duplicate groups by content digest. */
  def exactGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(idCol).as("canonical_id"))
      .filter(col("n_copies") > 1)
      .orderBy("content_hash")

  /** Keep one row per distinct content (the minimum id wins). */
  def exactDedup(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /**
   * STREAMING exact dedup — the ingest-time half of [[exactDedup]]: the
   * first document with a given content digest passes, later copies are
   * dropped. State is keyed by the digest and BOUNDED by the watermark
   * (`dropDuplicatesWithinWatermark`): a digest's state expires `delay`
   * after its event time, so state size is O(docs per watermark window),
   * not O(all docs ever) — the property that lets this run on an unbounded
   * crawl. The trade-off is explicit: a copy arriving later than `delay`
   * after the original is re-admitted (downstream batch dedup catches it).
   */
  def exactDedupStream(docs: DataFrame, tsCol: String = "ts",
      delay: String = "10 minutes", textCol: String = "text"): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")

  /**
   * MinHash signature over a MATERIALIZED shingle-array column: k independent
   * permutations approximated by `xxhash64(shingle, seed)`; sig[j] = min over
   * shingles. Pure higher-order built-ins — stays in codegen, no UDF
   * serialization. Taking the shingle column (not the raw text) matters:
   * nesting the shingling inside the per-seed lambda re-shingled the document
   * k times (r01's 1,064 s scale-killer, ingredient b).
   */
  def signatureFromShingles(sh: Column, numHashes: Int): Column =
    // native codegen'd kernel: single pass over the shingle array updating
    // all k min-lanes ([[graft.functions.VectorKernels.minhash]]). The
    // higher-order-function formulations are interpreted and either
    // re-evaluate the shingle expression per seed (transform-per-seed) or
    // allocate a k-array per shingle (aggregate+zip_with).
    graft.functions.VectorFunctions.minhash_signature(sh, numHashes)

  /** Convenience single-pass form for small k (fingerprinting). */
  def minhashSignature(text: Column, numHashes: Int, shingleSize: Int): Column =
    signatureFromShingles(TextFunctions.shingles(text, shingleSize), numHashes)

  /** Banded bucket keys for a signature: one (band, xxhash64(slice)) per band. */
  private[operators] def bandBuckets(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(sig, b * rows + 1, lit(rows)), b))

  /**
   * LSH candidate pairs: split the signature into `bands` bands, bucket by
   * (band index, hash of band slice), pair up docs sharing a bucket.
   * Returns distinct (id_a < id_b) candidate pairs with their estimated
   * Jaccard (fraction of matching minhashes).
   *
   * Scale design (the r01 version recomputed everything ~5× and went
   * quadratic in degenerate buckets):
   *  - the signature frame is persisted — banding and both join sides read
   *    the cached copy, so shingling+hashing runs exactly once per doc;
   *  - buckets larger than `maxBucket` are dropped before the self-join
   *    (a k-doc bucket contributes k² join rows; at 100 TB a degenerate
   *    bucket — boilerplate docs, empty strings — would otherwise dominate
   *    the stage). Dropped buckets only lose candidates that the other
   *    bands' buckets usually re-surface.
   */

  /** Sorted run-length LSH bucket machinery shared by the candidate
   *  generators ([[bandedCandidatePairs]], `Similarity.pairsFromSigs`):
   *  ONE exchange of the banded keys (`repartition(keyCols)`), a
   *  within-partition sort by (keyCols, idCol), and a streaming
   *  run-length pass that buffers AT MOST `maxBucket + 1` rows per bucket
   *  run and emits each qualifying bucket's candidate pairs directly.
   *
   *  Versus the r17 window-count prune this (a) never buffers a whole
   *  key group — a degenerate bucket (the empty/boilerplate-doc pathology
   *  `maxBucket` exists for) is discarded streaming with O(maxBucket)
   *  task memory instead of being buffered by WindowExec before the
   *  `_n <= maxBucket` filter sees it (guide §2.5), and (b) needs no
   *  persist and no self-join — the pairs fall out of the run buffer, so
   *  the banded keys cross the wire exactly once. Versus the r16
   *  groupBy → join-back → self-join it keeps the 3-shuffles→1 win.
   *  Three-arm min-of-5 A/B + job/shuffle tallies: OPTIMIZATION_r18.md §1.
   *
   *  Semantics proved equal to `pruned ⋈ pruned ON keyCols` over the
   *  bucket-size filter `2 <= n <= maxBucket` + `id_a < id_b` + distinct:
   *   - rows are sorted by (keyCols, idCol) with SPARK's ordering, so
   *     emitting (run(i), run(j)) for i < j yields id_a <= id_b under the
   *     same comparator the old `col("id_a") < col("id_b")` used
   *     (UTF8String binary order for strings — NOT JVM String order);
   *     equal-id pairs are then dropped by the trailing `=!=` filter
   *     exactly as the old strict `<` (or the incremental mode's `=!=`)
   *     dropped them;
   *   - a row whose key contains NULL emits nothing (the old equi-join
   *     never matched null keys);
   *   - runs longer than maxBucket emit nothing (the `n <= maxBucket`
   *     prune) and singleton runs have no pairs (the `n >= 2` prune).
   *
   *  `flagCol` (nullable boolean): when set, only pairs where at least
   *  one member's flag is true are emitted — the incremental-recheck
   *  "pair involves a new id" restriction, previously a second semi-join
   *  + join against the pruned frame. Equivalence: old = unordered pairs
   *  {a,b}, a≠b, both in a capped bucket, b ∈ newIds, least/greatest-
   *  normalized; new = same set with the membership test carried as a
   *  per-row flag. */
  private[operators] def cappedRunPairs(banded: DataFrame, keyCols: Seq[String],
      idCol: String, maxBucket: Int, flagCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.StructType
    val sorted = banded
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols :+ idCol).map(col): _*)
    val schema = sorted.schema
    val kIdx = keyCols.map(schema.fieldIndex).toArray
    val iIdx = schema.fieldIndex(idCol)
    val fIdx = flagCol.map(schema.fieldIndex).getOrElse(-1)
    val outSchema = StructType(Seq(
      schema(iIdx).copy(name = "id_a"), schema(iIdx).copy(name = "id_b")))
    val cap = maxBucket
    val pairs = sorted.mapPartitions { it =>
      // equi-join key equality: NULL matches nothing
      def sameKey(a: Row, b: Row): Boolean = {
        var i = 0
        while (i < kIdx.length) {
          val x = a.get(kIdx(i)); val y = b.get(kIdx(i))
          if (x == null || y == null || x != y) return false
          i += 1
        }
        true
      }
      def keyHasNull(r: Row): Boolean = kIdx.exists(r.isNullAt)
      def isNew(r: Row): Boolean = !r.isNullAt(fIdx) && r.getBoolean(fIdx)
      val runs: Iterator[scala.collection.IndexedSeq[Row]] =
          new scala.collection.AbstractIterator[scala.collection.IndexedSeq[Row]] {
        private var look: Row = if (it.hasNext) it.next() else null
        private var run: scala.collection.IndexedSeq[Row] = null
        private def load(): Unit = {
          while (run == null && look != null) {
            val head = look
            look = null
            val buf = new scala.collection.mutable.ArrayBuffer[Row](8)
            var drop = keyHasNull(head) // null-key rows pair with nothing
            if (!drop) buf += head
            var scanning = true
            while (scanning && it.hasNext) {
              val r = it.next()
              if (sameKey(head, r)) {
                if (!drop) {
                  buf += r
                  if (buf.length > cap) { drop = true; buf.clear() }
                }
              } else { look = r; scanning = false }
            }
            if (!drop && buf.length >= 2) run = buf
          }
        }
        def hasNext: Boolean = { load(); run != null }
        def next(): scala.collection.IndexedSeq[Row] = {
          load()
          if (run == null) throw new NoSuchElementException("empty run iterator")
          val r = run; run = null; r
        }
      }
      runs.flatMap { run =>
        run.indices.iterator.flatMap { i =>
          (i + 1 until run.length).iterator
            .filter(j => fIdx < 0 || isNew(run(i)) || isNew(run(j)))
            .map(j => Row(run(i).get(iIdx), run(j).get(iIdx)))
        }
      }
    }(Encoders.row(outSchema))
    pairs.filter(col("id_a") =!= col("id_b")).distinct()
  }

  /** Run-length bucket-size CAP (no pair emission): rows of runs longer
   *  than `maxBucket` are dropped streaming, buffering at most
   *  `maxBucket + 1` rows — the prune half of [[cappedRunPairs]] for
   *  consumers that join the surviving keys against something else
   *  (`DedupIndex.probeCore`). Mirrors the window-count formulation it
   *  replaces: null keys group together (like `Window.partitionBy`, not
   *  like an equi-join) and ALL input columns pass through unchanged. */
  private[operators] def cappedRuns(df: DataFrame, keyCols: Seq[String],
      maxBucket: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val sorted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col): _*)
    val schema = sorted.schema
    val kIdx = keyCols.map(schema.fieldIndex).toArray
    val cap = maxBucket
    sorted.mapPartitions { it =>
      def sameGroup(a: Row, b: Row): Boolean = {
        var i = 0
        while (i < kIdx.length) {
          val x = a.get(kIdx(i)); val y = b.get(kIdx(i))
          val eq = if (x == null) y == null else x == y
          if (!eq) return false
          i += 1
        }
        true
      }
      new scala.collection.AbstractIterator[Row] {
        private var look: Row = if (it.hasNext) it.next() else null
        private var out: Iterator[Row] = Iterator.empty
        private def load(): Unit = {
          while (!out.hasNext && look != null) {
            val head = look
            look = null
            val buf = new scala.collection.mutable.ArrayBuffer[Row](8)
            buf += head
            var drop = false
            var scanning = true
            while (scanning && it.hasNext) {
              val r = it.next()
              if (sameGroup(head, r)) {
                if (!drop) {
                  buf += r
                  if (buf.length > cap) { drop = true; buf.clear() }
                }
              } else { look = r; scanning = false }
            }
            if (!drop) out = buf.iterator
          }
        }
        def hasNext: Boolean = { load(); out.hasNext }
        def next(): Row = { load(); out.next() }
      }
    }(Encoders.row(schema))
  }

  /** Banded LSH candidate generation shared by [[minhashCandidates]] and
   *  [[nearDuplicates]]: (band, bucket) explode → degenerate-bucket prune
   *  (a k-doc bucket contributes k² rows; other bands re-surface real
   *  pairs) → within-bucket pair emission → distinct (id_a < id_b)
   *  pairs. One code path so bucket-cap semantics cannot drift between
   *  the two operators. Prune and pair emission are one sorted
   *  run-length pass ([[cappedRunPairs]]) — the banded keys shuffle
   *  once, nothing is persisted. */
  private def bandedCandidatePairs(sig: DataFrame, bands: Int, rows: Int,
      maxBucket: Int): DataFrame = {
    val banded = sig.select(col("id"),
      posexplode(bandBuckets(col("sig"), bands, rows)).as(Seq("band", "bucket")))
    cappedRunPairs(banded, Seq("band", "bucket"), "id", maxBucket)
  }

  def minhashCandidates(docs: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 8, shingleWords: Int = 3,
      maxBucket: Int = 1000): DataFrame = StageCoalesce.sizeBased(docs.sparkSession) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // serialized storage: signature arrays cached deserialized thrash the
    // heap under host memory pressure (r02's 5 s → 60 s bench swing)
    val sig = docs.select(col(idCol).as("id"),
        signatureFromShingles(TextFunctions.wordShingles(col(textCol), shingleWords), numHashes).as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val pairs = bandedCandidatePairs(sig, bands, rows, maxBucket)
    val out = pairs
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes)
      .select("id_a", "id_b", "est_jaccard")
    materializeThenFree(out, sig)
  }

  /**
   * Eagerly materialize a (small) result frame, then free the (large)
   * intermediate caches that built it. Operators that persist intermediates
   * must not leak them past their own lifetime: a lazily-returned frame pins
   * every upstream cache until some later action, and under memory pressure
   * those pinned deserialized blocks evict each other (the r02 bench
   * recorded 60 s for a 5 s query exactly this way). The result frame stays
   * cached serialized — candidate pairs are ≪ corpus by construction.
   */
  private[operators] def materializeThenFree(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = result.persist(StorageLevel.MEMORY_AND_DISK_SER)
    out.foreach(_ => ()) // materialize while intermediates are still cached
    intermediates.foreach(_.unpersist(blocking = false))
    out
  }

  /**
   * Near-duplicate pairs: LSH candidates verified with EXACT word-shingle
   * Jaccard over the candidate pairs only. Word shingles (not char 5-grams,
   * r01 ingredient d) keep the verification arrays ~2 orders of magnitude
   * smaller at identical discrimination for document-scale text; the
   * candidate-only shingle frame is persisted and reused by both
   * verification join sides.
   */
  def nearDuplicates(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      threshold: Double = 0.8, shingleWords: Int = 3,
      numHashes: Int = 32, bands: Int = 8, maxBucket: Int = 1000): DataFrame = {
    // Raw (id, text) is what the verification fetch re-reads below; the
    // shingle arrays themselves are NOT materialized corpus-wide. They are
    // the largest objects in the pipeline: persisting them thrashed the
    // heap in r02 (12× degradation), and even recomputing the codegen'd
    // shingle kernel over the FULL corpus twice (r04) doubled the
    // dominant scan-local cost. The kernel now runs corpus-wide exactly
    // once (signature pass) and a second time only over the candidate
    // subset, which at scale is ≪ corpus.
    val docsSlim = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val rows = numHashes / bands
    // signatures are small (numHashes longs/doc) and feed three consumers
    // (banding + both verification joins' semi-join source) → cache, but
    // serialized so eviction pressure spills instead of thrashing
    val sig = docsSlim.select(col("id"),
        signatureFromShingles(TextFunctions.wordShingles(col("text"), shingleWords), numHashes).as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    nearDuplicatesFromSigs(docsSlim, sig, threshold, shingleWords, bands, rows,
      maxBucket, freeAlso = Seq(sig))
  }

  /** [[nearDuplicates]] from a CALLER-OWNED signature frame `(id, sig)` —
   *  lets the ingest loop sign its batch ONCE and share the signatures
   *  between the in-batch sweep, the index probe and the admitted-keys
   *  write (previously three signature passes over the same text).
   *  `docsSlim` must be `(id, text)`; frames in `freeAlso` are
   *  unpersisted with the internals once the result materializes. */
  private[operators] def nearDuplicatesFromSigs(docsSlim: DataFrame,
      sig: DataFrame, threshold: Double, shingleWords: Int, bands: Int,
      rows: Int, maxBucket: Int, freeAlso: Seq[DataFrame] = Nil): DataFrame =
      StageCoalesce.sizeBased(docsSlim.sparkSession) {
    val pairs = bandedCandidatePairs(sig, bands, rows, maxBucket)
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    // semi-join reduction: only candidate docs' shingle arrays enter the
    // verification join — at scale candidates ≪ corpus, so this avoids
    // shuffling every document's (large) shingle array twice. The semi-join
    // filters on the raw (id, text) rows and shingles AFTER, so the shingle
    // kernel's second pass touches candidates only (not the whole corpus).
    val candIds = pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id"))) // no distinct: left_semi dedupes
    // persisted (serialized): it feeds BOTH verification join sides —
    // unpersisted, the semi-join subtree would run twice
    val shNeeded = docsSlim.join(candIds, Seq("id"), "left_semi")
      .select(col("id"), TextFunctions.wordShingles(col("text"), shingleWords).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val out = pairs
      .join(shNeeded.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shNeeded.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
    materializeThenFree(out, (Seq(pairs, shNeeded) ++ freeAlso): _*)
  }

  /**
   * 64-bit SimHash fingerprint per document: per-bit majority vote of the
   * token hashes, computed by a native codegen'd kernel
   * ([[graft.functions.TextKernelImpl.simhash64]]) — a scan-local map with
   * NO explode and NO shuffle (the explode + 64-partial-sums formulation
   * shuffled 64 longs per doc and ran interpreted; bit-identical output).
   */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.TextKernels.simhash64(col(textCol)).as("simhash"))

  /** Hamming distance between two long fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * SimHash near-dup pairs: block on 4 × 16-bit bands (any exact band match
   * → candidate; Hamming ≤ maxDistance verified on candidates only).
   */
  def simhashDuplicates(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      maxDistance: Int = 6): DataFrame = {
    val fp = simhash(docs, textCol, idCol)
    val banded = fp.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(k =>
        col("simhash").bitwiseAND(lit(0xffffL << (16 * k)))): _*)).as(Seq("band", "key")))
    val a = banded.select(col("band"), col("key"), col("id").as("id_a"), col("simhash").as("fp_a"))
    val b = banded.select(col("band"), col("key"), col("id").as("id_b"), col("simhash").as("fp_b"))
    a.join(b, Seq("band", "key")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "fp_a", "fp_b").distinct()
      .withColumn("distance", hamming(col("fp_a"), col("fp_b")))
      .filter(col("distance") <= maxDistance)
      .select("id_a", "id_b", "distance")
      .orderBy("id_a", "id_b")
  }

  /**
   * Connected components over near-duplicate pairs → (doc_id, canonical_id):
   * the step that turns pairwise matches into DROPPABLE duplicate clusters
   * (keep each component's minimum id, drop the rest). Iterative min-label
   * propagation — each round is one equi-join + min-aggregation, and the
   * round count is the component diameter's log, which for dedup clusters
   * (cliques and short chains around a canonical doc) is 2-4 rounds
   * regardless of corpus size. No GraphX, no driver-side union-find: the
   * only driver work is the convergence check (a count), so 100 TB of
   * pairs iterate as ordinary shuffles.
   */
  def nearDupGroups(pairs: DataFrame): DataFrame =
      StageCoalesce.sizeBased(pairs.sparkSession) {
    // localCheckpoint (not persist): iterative plans NEST — without lineage
    // truncation round N's logical tree embeds round N-1's several times
    // plus the whole candidate pipeline, and driver-side analysis/
    // optimization grows exponentially even though every byte is cached
    // (measured 15 s/round on a 477-node graph; ~1 s/round truncated)
    // ids stay their natural type: cast("long") on string/UUID ids yields
    // null keys and silently collapses every cluster; min() gives the
    // canonical member for numeric AND lexicographic id domains alike
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      val prop = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min(col("label")).as("nl"))
      // the change flag rides the propagation row (new label strictly
      // below the old) so convergence is a scan of the checkpointed
      // frame — the previous formulation re-joined next against labels
      // every round, one extra shuffle join per iteration (guide §2.4)
      val next = labels.join(prop, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"),
          (coalesce(col("nl"), col("label")) < col("label")).as("_chg"))
        .localCheckpoint(true)
      changed = next.filter(col("_chg")).count()
      labels = next.select("id", "label")
    }
    labels.select(col("id").as("doc_id"), col("label").as("canonical_id"))
  }

  /**
   * Cluster-representative selection by QUALITY, not id: production
   * pipelines keep the BEST member of each near-dup cluster (longest,
   * highest LM score, freshest crawl), not the minimum id. Components
   * come from [[nearDupGroups]] over the verified `pairs`; within each,
   * the kept doc maximizes `scoreCol`, ties broken by smallest id
   * (deterministic). Returns `(doc_id, canonical_id, keep_id)` for every
   * CLUSTERED doc — downstream keeps rows with `doc_id = keep_id` plus
   * all unclustered singletons.
   *
   * Plan shape: the component labels join doc scores on the id key, and
   * the per-cluster argmax is one window over `canonical_id` — clusters
   * are tiny by construction (bucket caps bound them), so the window
   * partition never skews; nothing here touches text or the full corpus
   * beyond the single score-column join.
   */
  def nearDupKeepBest(docs: DataFrame, pairs: DataFrame, scoreCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val groups = nearDupGroups(pairs)
    val scored = groups.join(
      docs.select(col(idCol).as("doc_id"), col(scoreCol).as("_score")), "doc_id")
    val w = Window.partitionBy("canonical_id")
      .orderBy(col("_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    scored.withColumn("keep_id", first(col("doc_id")).over(w))
      .select("doc_id", "canonical_id", "keep_id")
      .orderBy("doc_id")
  }

  /**
   * STREAMING MinHash-LSH near-duplicate candidates — ingest-time dedup for
   * a document firehose (`readStream` → this → route/drop), the streaming
   * twin of [[minhashCandidates]] built on `flatMapGroupsWithState`.
   *
   * Same scan-local signature + banding kernels; state is keyed by
   * (band, bucket) and holds at most `bucketCap` (id, signature) members —
   * text never enters state or the shuffle, so state per bucket is bounded
   * at `bucketCap × numHashes` longs regardless of document size. Each
   * arriving doc emits a candidate pair per stored member whose signature
   * agreement ≥ `minEstimate`, then joins the bucket (dropped once the cap
   * is hit, mirroring the batch operator's degenerate-bucket guard).
   *
   * A pair sharing several buckets is emitted once per band — consumers
   * `dropDuplicates` or verify-exactly downstream, which is where the batch
   * operator's exact-Jaccard verification lives too. `idleTimeout` (e.g.
   * "1 hour") evicts buckets idle for that processing-time span: on an
   * unbounded stream the state otherwise grows with distinct buckets.
   */
  def streamingNearDupCandidates(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", numHashes: Int = 32, bands: Int = 8,
      shingleWords: Int = 3, bucketCap: Int = 64, minEstimate: Double = 0.5,
      idleTimeout: Option[String] = None): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    // the keyed-state encoder below is typed (Long, Seq[Long], Int, Long) —
    // a string/UUID id would be silently cast to null keys (the id-type
    // trap the batch path's nearDupGroups documents avoiding), so reject
    // non-integral id columns loudly up front
    docs.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => ()
      case other => throw new IllegalArgumentException(
        s"streamingNearDupCandidates: id column '$idCol' must be integral " +
          s"(the keyed state is Long-typed), got ${other.simpleString} — " +
          "derive a long id (e.g. xxhash64) upstream")
    }
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val rows = numHashes / bands
    val banded = docs.select(col(idCol).cast("long").as("id"),
        signatureFromShingles(
          TextFunctions.wordShingles(col(textCol), shingleWords), numHashes).as("sig"))
      .select(col("id"), col("sig"),
        posexplode(bandBuckets(col("sig"), bands, rows)).as(Seq("band", "bucket")))
      .as[(Long, Seq[Long], Int, Long)]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    banded.groupByKey { case (_, _, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState[Seq[(Long, Seq[Long])], (Long, Long, Double)](
          OutputMode.Append(), timeoutConf) { case (_, arrivals, state) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          var members = state.getOption.getOrElse(Seq.empty)
          val emitted = Seq.newBuilder[(Long, Long, Double)]
          arrivals.foreach { case (id, sig, _, _) =>
            members.foreach { case (mid, msig) =>
              if (mid != id) {
                var agree = 0
                var i = 0
                while (i < numHashes) { if (sig(i) == msig(i)) agree += 1; i += 1 }
                val est = agree.toDouble / numHashes
                if (est >= minEstimate)
                  emitted += ((math.min(id, mid), math.max(id, mid), est))
              }
            }
            if (members.size < bucketCap) members = members :+ ((id, sig))
          }
          state.update(members)
          idleTimeout.foreach(state.setTimeoutDuration)
          emitted.result().iterator
        }
      }.toDF("id_a", "id_b", "est_jaccard")
  }
}
