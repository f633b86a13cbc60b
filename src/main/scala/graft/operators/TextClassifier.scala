package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * A fastText-style linear text classifier on HASHED n-gram features —
 * the learned third leg of the text-quality family next to the heuristic
 * `quality_score` kernel and the char-trigram LM perplexity: production
 * pipelines label a slice (heuristics, a rule-based labeler, an LLM
 * judge), train a cheap supervised linear model on it, and score the
 * whole corpus with that model.
 *
 * Model: L2-regularized logistic regression over binary presence
 * features of word unigrams + bigrams hashed into `dim` buckets, plus an
 * intercept. The feature map is the engine-portable md5 trick (first 8
 * hex chars as an integer, mod dim), so an external SQL engine
 * reproduces scoring bit-for-bit from the trained weights.
 *
 * Training is distributed IRLS (damped Newton — the optimizer Spark
 * MLlib's own GLMs use): each round aggregates the exact gradient
 * (≤ dim+1 rows) and the exact Hessian (≤ (dim+1)² `(f1, f2, Σ p(1-p))`
 * rows — the model's keyspace squared, a few MB, NOT data) and solves
 * the damped normal equations on the driver. Full-batch gradient descent
 * needs thousands of rounds on this geometry; IRLS converges in ~2-4,
 * which is what makes in-query training affordable.
 *
 * Determinism: probabilities quantize to a 1e-6 grid and weights live on
 * a 1e-9 grid, so every distributed sum is over LONGs — exact and
 * order-independent regardless of partitioning — and the driver-side
 * solve is sequential. Trained weights are therefore bit-reproducible
 * and pinnable as a regression oracle (`tools.DumpClassifier`).
 *
 * At 100 TB: the gram stream is scan-local (no text shuffle); per round
 * the exchanges are one doc-keyed sum, one feature-keyed sum, and one
 * feature-pair-keyed sum (dim-bounded keys; row volume is
 * docs × active-features², so at full scale one TRAINS on the labeled
 * sample — the production shape anyway: labels only exist for a slice —
 * and scores the whole corpus with the broadcast model). Scoring
 * broadcasts the weights as a literal array — scan-local except the
 * final doc-keyed sum.
 */
object TextClassifier {

  /** Distinct hashed features per document: `(id, f)` for every distinct
   *  unigram/bigram hash bucket the doc's tokens touch. Presence (not
   *  count) keeps the distributed sums integer-exact and the margin
   *  bounded by the doc's distinct-feature count. */
  def features(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", dim: Int = 512): DataFrame = {
    // bind the token array ONCE through a projection before the bigram
    // lambdas reference it — inlining tokens() into every element_at
    // would re-run the regex tokenizer per bigram, O(tokens²) per doc
    // (the r11 per-occurrence-HOF lesson; CollapseProject keeps the
    // barrier because the alias is non-cheap and multiply referenced)
    val toks = docs.select(col(idCol).as("id"),
      graft.functions.TextFunctions.tokens(col(textCol)).as("t"))
    val t = col("t")
    val bigrams = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + lit(1)))))
      .otherwise(typedLit(Seq.empty[String]))
    toks.select(col("id"), explode(concat(t, bigrams)).as("g"))
      .select(col("id"),
        pmod(conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"),
          lit(dim.toLong)).as("f"))
      .distinct()
  }

  /** Spark's `round(double).cast("long")` exactly — Round(HALF_UP) goes
   *  through BigDecimal.valueOf (shortest-decimal), which differs from
   *  `math.round` (= floor(x+0.5)) on values binary-adjacent to a .5
   *  boundary, so the RDD-side Hv kernel must replicate it bit-for-bit
   *  to keep trained weights identical to the SQL formulation. */
  private def sparkRoundToLong(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** Σ over docs of `vals` per present feature — the gradient/Hv reduce,
   *  as ONE single-stage job: each task folds its cached rows into
   *  `nVals` exact-LONG arrays of length `d` and the ≤ `d × nVals`-cell
   *  results combine on the driver (tree-combined past 64 partitions so
   *  a large cluster's reduce never funnels through one driver pass).
   *  Replaces the explode(fs) → shuffle(f) → collect shape: no row
   *  explosion (|fs| rows per doc), no exchange, no AQE stage split —
   *  the same exact LONG sums in any partitioning/order (guide §2.4:
   *  remove the shuffle outright; the keyspace is the MODEL, not data).
   *  `df` must be `(fs: array<long>, v1..vn: long)`. */
  private def sumByFeature(df: DataFrame, d: Int, nVals: Int): Array[Array[Long]] = {
    val rdd = df.queryExecution.toRdd.mapPartitions { it =>
      val acc = Array.fill(nVals)(new Array[Long](d))
      it.foreach { row =>
        val fs = row.getArray(0)
        val n = fs.numElements()
        var k = 0
        while (k < nVals) {
          val v = row.getLong(1 + k)
          if (v != 0L) {
            val a = acc(k)
            var i = 0
            while (i < n) { a(fs.getLong(i).toInt) += v; i += 1 }
          }
          k += 1
        }
      }
      Iterator.single(acc)
    }
    def add(x: Array[Array[Long]], y: Array[Array[Long]]): Array[Array[Long]] = {
      var k = 0
      while (k < nVals) {
        val a = x(k); val b = y(k)
        var i = 0
        while (i < d) { a(i) += b(i); i += 1 }
        k += 1
      }
      x
    }
    // an EMPTY frame can plan to a zero-partition RDD, where reduce
    // throws — the collect() formulation this replaced returned no rows,
    // i.e. all-zero sums, so that is the value here too
    if (rdd.getNumPartitions == 0) Array.fill(nVals)(new Array[Long](d))
    else if (rdd.getNumPartitions > 64) rdd.treeReduce(add, depth = 2)
    else rdd.reduce(add)
  }

  /** Sequential Gaussian elimination with partial pivoting — a
   *  deterministic dense solve of the (dim+1)² damped normal equations;
   *  ~1e8 flops at dim 512, driver-side milliseconds. */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val d = b.length
    for (c <- 0 until d) {
      var piv = c
      for (r <- c + 1 until d) if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r
      if (piv != c) { val t = a(piv); a(piv) = a(c); a(c) = t
        val tb = b(piv); b(piv) = b(c); b(c) = tb }
      val p = a(c)(c)
      for (r <- c + 1 until d) {
        val m = a(r)(c) / p
        if (m != 0.0) {
          var k = c
          while (k < d) { a(r)(k) -= m * a(c)(k); k += 1 }
          b(r) -= m * b(c)
        }
      }
    }
    val x = new Array[Double](d)
    for (c <- d - 1 to 0 by -1) {
      var s = b(c)
      var k = c + 1
      while (k < d) { s -= a(c)(k) * x(k); k += 1 }
      x(c) = s / a(c)(c)
    }
    x
  }

  /**
   * Train on `docs` with a 0/1 `labelCol`; returns `(biasNano,
   * weightsNano)` on the 1e-9 fixed-point grid that [[score]] and the
   * SQL oracle consume. `lambda` is the per-document L2 strength (it
   * also keeps separable data from driving weights to infinity);
   * `rounds` IRLS iterations.
   */
  def train(docs: DataFrame, labelCol: String, textCol: String = "text",
      idCol: String = "doc_id", dim: Int = 512, rounds: Int = 2,
      lambda: Double = 0.01): (Long, Array[Long]) = {
    // duplicate doc_ids would double-count the intercept/label rows and
    // silently skew the exact sums (features() already dedups per-doc) —
    // one defensive pass keeps every aggregate per-DOCUMENT
    val d0 = docs.dropDuplicates(idCol)
    // ONE materialization of the per-doc feature arrays (+ label), the
    // trainCG shape: the previous long-form stream shuffled feature rows
    // every round (docSums groupBy(id), then the Hessian pair stream's
    // id-keyed self-join + (dim+1)²-keyed exchange + a 263k-row collect
    // per round — 84 MB of shuffle per fit at sf0.1). On the cached
    // arrays the forward pass is a scan-local nano_fold and gradient +
    // Hessian reduce in ONE single-stage [[sumByFeature]]-style pass —
    // identical exact-LONG sums, zero per-round exchanges (guide §2.4).
    val docFeats = featureArrays(d0, textCol, idCol, dim,
        "y" -> col(labelCol).cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val nDocs = math.max(docFeats.count(), 1L).toDouble
    val d = dim + 1
    var w = new Array[Long](d)
    for (_ <- 0 until rounds) {
      // forward pass on the current weights: error e = p_q - y (1e-6
      // grid) and curvature pq = p_q(1-p_q) (1e-6 grid), both LONGs
      val z = graft.functions.VectorFunctions.nano_fold(col("fs"), w.toSeq) / lit(1e9)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val scored = docFeats
        .select(col("fs"),
          (round(p * 1e6).cast("long") - col("y") * 1000000L).as("e"),
          round(p * (lit(1.0) - p) * 1e6).cast("long").as("pq"))
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      // gradient (d cells) + Hessian (d² cells, Σ_d pq_d over every PAIR
      // of the doc's features — the model squared, not data) in ONE
      // single-stage pass; H is symmetric so each task fills the upper
      // triangle and the driver mirrors it
      val (gL, hL) = gradHessPass(scored, d)
      scored.unpersist(blocking = false)
      // damped normal equations in real units, solved sequentially
      val a = Array.fill(d)(new Array[Double](d))
      val g = new Array[Double](d)
      for (i <- 0 until d; j <- i until d) {
        val v = hL(i * d + j) / 1e6 / nDocs
        a(i)(j) = v
        if (i != j) a(j)(i) = v
      }
      for (j <- 0 until d) g(j) = gL(j) / 1e6 / nDocs
      for (j <- 0 until d) {
        a(j)(j) += lambda
        g(j) += lambda * (w(j) / 1e9)
      }
      val delta = solve(a, g)
      w = Array.tabulate(d)(j => w(j) - math.round(delta(j) * 1e9))
    }
    docFeats.unpersist(blocking = false)
    (w(dim), w.take(dim))
  }

  /** One pass over the cached `(fs, e, pq)` frame producing the exact-LONG
   *  gradient vector (g(f) = Σ e over docs containing f) and the upper
   *  triangle of the Hessian numerator (h(f1·d+f2) = Σ pq over docs
   *  containing both, f1 ≤ f2) — same cells the per-pair shuffle+collect
   *  produced, as primitive array adds. */
  private def gradHessPass(scored: DataFrame, d: Int): (Array[Long], Array[Long]) = {
    val rdd = scored.queryExecution.toRdd.mapPartitions { it =>
      val g = new Array[Long](d)
      val h = new Array[Long](d * d)
      it.foreach { row =>
        val fs = row.getArray(0)
        val e = row.getLong(1)
        val pq = row.getLong(2)
        val n = fs.numElements()
        var i = 0
        while (i < n) {
          val fi = fs.getLong(i).toInt
          g(fi) += e
          var j = 0
          while (j < n) {
            val fj = fs.getLong(j).toInt
            if (fi <= fj) h(fi * d + fj) += pq
            j += 1
          }
          i += 1
        }
      }
      Iterator.single((g, h))
    }
    def add(x: (Array[Long], Array[Long]), y: (Array[Long], Array[Long])) = {
      var i = 0
      while (i < d) { x._1(i) += y._1(i); i += 1 }
      i = 0
      val n2 = d * d
      while (i < n2) { x._2(i) += y._2(i); i += 1 }
      x
    }
    // zero-partition (empty-frame) guard, as in sumByFeature
    if (rdd.getNumPartitions == 0) (new Array[Long](d), new Array[Long](d * d))
    else if (rdd.getNumPartitions > 64) rdd.treeReduce(add, depth = 2)
    else rdd.reduce(add)
  }

  /**
   * HESSIAN-FREE training — same model, same determinism contract, no
   * dim ceiling. [[train]] materializes the dense (dim+1)² Hessian
   * (collected to the driver, O(dim³) Gaussian solve): perfect at
   * dim 512, unusable at the ~16k-64k hashed dims production fastText
   * uses (dim 16k is a 2.1e12-flop solve over a 2 GiB matrix). Here
   * each damped-Newton step solves the same normal equations by
   * CONJUGATE GRADIENT on Hessian-VECTOR products, so nothing
   * (dim+1)²-sized ever exists:
   *
   *   (H + λI)v  with  H = FᵀDF/n  needs only
   *   t_d = Σ_{f∈d} v_f        (a SCAN-LOCAL exact-LONG array fold: the
   *                             per-doc feature arrays are materialized
   *                             once, v rides as a literal nano array)
   *   u_d = round(pq_d·t_d/1e6) (per-row, deterministic double→long)
   *   (Hv)_f = Σ_{d∋f} u_d / n (one feature-keyed exact-LONG sum,
   *                             map-side combined into ≤ dim+1 keys)
   *
   * — ONE job per CG iteration with a single bounded-key exchange, and
   * the per-round data-side work is linear in the gram stream, never
   * quadratic in active features. Determinism:
   * every distributed sum is an exact LONG; CG's driver-side scalars
   * (α, β, residual norms) derive only from those sums and from
   * fixed-seed arithmetic; CG directions are re-quantized to the 1e-9
   * grid before each product, and the stopping rule (fixed max
   * iterations, deterministic residual floor) depends on deterministic
   * quantities — so weights stay bit-reproducible under any
   * partitioning, same as the dense path.
   *
   * Magnitude bound (why the LONG sums cannot overflow in the training
   * regime): |t_d| ≤ activeFeats(d) × max|v|ₙₐₙₒ ~ 1e3 × 1e11 = 1e14;
   * |u_d| ≤ 2.5e5 × 1e14 / 1e6 = 2.5e13; the feature-keyed sum then
   * needs |labeled docs sharing a feature| × 2.5e13 < 9.2e18 — held by
   * ~1e5-doc labeled slices, which is the documented training shape
   * (labels only exist for a sample; the full corpus is SCORED, not
   * trained on).
   */
  def trainCG(docs: DataFrame, labelCol: String, textCol: String = "text",
      idCol: String = "doc_id", dim: Int = 16384, rounds: Int = 2,
      lambda: Double = 0.01, cgIters: Int = 12): (Long, Array[Long]) = {
    val d0 = docs.dropDuplicates(idCol)
    // ONE materialization of the per-doc feature ARRAYS (+ label): with
    // the gram stream collapsed to |docs| cached rows, every per-doc sum
    // (forward pass, the t of each Hv) is a scan-local array fold over
    // the broadcast-literal model — no doc-keyed shuffle, no join, per
    // CG iteration exactly ONE job whose only exchange is the map-side-
    // combined feature-keyed sum into ≤ dim+1 keys. collect_list order
    // is nondeterministic, which is safe here: every fold is an exact
    // integer sum, order-independent by construction.
    val docFeats = featureArrays(d0, textCol, idCol, dim,
        "y" -> col(labelCol).cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    try cgCore(docFeats, dim, rounds, lambda, cgIters)
    finally docFeats.unpersist(blocking = false)
  }

  /** Hessian-vector products for `dirs.length` heads in ONE single-stage
   *  job over the cached `(fs, pq1..pqH)` frame: per row and head, fold
   *  that head's direction over fs (exact LONG t), u = round(pq·t/1e6)
   *  on Spark's exact round grid ([[sparkRoundToLong]]), scatter u back
   *  over fs into the head's d-cell accumulator. Same exact LONGs as
   *  the explode → feature-keyed exchange → collect formulation, with
   *  no row explosion and no shuffle. */
  private def hvPass(df: DataFrame, dirs: Array[Array[Long]], d: Int)
      : Array[Array[Long]] = {
    val nH = dirs.length
    val rdd = df.queryExecution.toRdd.mapPartitions { it =>
      val acc = Array.fill(nH)(new Array[Long](d))
      it.foreach { row =>
        val fs = row.getArray(0)
        val n = fs.numElements()
        var h = 0
        while (h < nH) {
          val dir = dirs(h)
          var t = 0L
          var i = 0
          while (i < n) { t += dir(fs.getLong(i).toInt); i += 1 }
          val u = sparkRoundToLong(
            row.getLong(1 + h).toDouble * t.toDouble / 1e6)
          if (u != 0L) {
            val a = acc(h)
            i = 0
            while (i < n) { a(fs.getLong(i).toInt) += u; i += 1 }
          }
          h += 1
        }
      }
      Iterator.single(acc)
    }
    def add(x: Array[Array[Long]], y: Array[Array[Long]]): Array[Array[Long]] = {
      var k = 0
      while (k < nH) {
        val a = x(k); val b = y(k)
        var i = 0
        while (i < d) { a(i) += b(i); i += 1 }
        k += 1
      }
      x
    }
    // zero-partition (empty-frame) guard, as in sumByFeature
    if (rdd.getNumPartitions == 0) Array.fill(nH)(new Array[Long](d))
    else if (rdd.getNumPartitions > 64) rdd.treeReduce(add, depth = 2)
    else rdd.reduce(add)
  }

  /** The per-doc feature-ARRAY frame `(id, fs, extra...)` the trainers
   *  share: the same distinct md5-hashed buckets as [[features]] plus
   *  the virtual intercept feature `dim`, built SCAN-LOCALLY per row
   *  (the [[score]] formulation) with any `extra` columns (labels)
   *  carried through the same projection. The previous long-form
   *  explode → global distinct → groupBy(id) collapse shuffled the gram
   *  stream twice and then joined labels back on id — three exchanges
   *  per fit where zero are needed (guide §2.4); the bucket SET per doc
   *  is identical (distinct per bucket, intercept appended — `dim`
   *  cannot collide with a pmod-by-dim bucket), and every consumer's
   *  fold/scatter over `fs` is order-independent exact-LONG arithmetic. */
  private def featureArrays(d0: DataFrame, textCol: String, idCol: String,
      dim: Int, extra: (String, Column)*): DataFrame = {
    // a null-id doc never trained before the r17 scan-local reshape (the
    // old groupBy(id) + inner id-join dropped it) — keep that contract so
    // trained weights stay bit-identical across formulations on corpora
    // that carry a null id (r17 ADVICE)
    val d = d0.filter(col(idCol).isNotNull)
    val toks = d.select((col(idCol).as("id") +:
      graft.functions.TextFunctions.tokens(col(textCol)).as("t") +:
      extra.map { case (n, c) => c.as(n) }): _*)
    val t = col("t")
    val bigrams = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + lit(1)))))
      .otherwise(typedLit(Seq.empty[String]))
    val buckets = array_distinct(transform(concat(t, bigrams), g =>
      pmod(conv(substring(md5(g), 1, 8), 16, 10).cast("long"),
        lit(dim.toLong))))
    toks.select((col("id") +:
      concat(coalesce(buckets, typedLit(Seq.empty[Long])),
        array(lit(dim.toLong))).as("fs") +:
      extra.map { case (n, _) => col(n) }): _*)
  }

  /** The damped-Newton-CG loop over a CACHED `(fs, y)` frame — the whole
   *  of [[trainCG]] after feature materialization, factored out so
   *  [[trainMulti]]'s per-class heads can share one feature cache. */
  private def cgCore(docFeats: DataFrame, dim: Int, rounds: Int,
      lambda: Double, cgIters: Int): (Long, Array[Long]) = {
    val nDocs = math.max(docFeats.count(), 1L).toDouble
    val d = dim + 1
    def dotv(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0; while (i < d) { s += a(i) * b(i); i += 1 }; s
    }
    // exact-LONG fold of the nano-grid vector over the doc's features —
    // the codegen'd kernel; the ArrayAggregate higher-order formulation
    // ran interpreted with a boxed element_at per feature against a
    // (dim+1)-element literal re-embedded in every iteration's plan
    def foldNano(vNano: Array[Long]): Column =
      graft.functions.VectorFunctions.nano_fold(col("fs"), vNano.toSeq)
    var w = new Array[Long](d)
    for (_ <- 0 until rounds) {
      val z = foldNano(w) / lit(1e9)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val scored = docFeats
        .select(col("fs"),
          (round(p * 1e6).cast("long") - col("y") * 1000000L).as("e"),
          round(p * (lit(1.0) - p) * 1e6).cast("long").as("pq"))
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      val g = new Array[Double](d)
      val gL = sumByFeature(scored.select(col("fs"), col("e")), d, 1)(0)
      for (j <- 0 until d) g(j) = gL(j) / 1e6 / nDocs
      for (j <- 0 until d) g(j) += lambda * (w(j) / 1e9)
      // (H + λI)v: ONE single-stage job — per cached row, fold the
      // direction over fs (exact LONG t), u = round(pq·t/1e6) with
      // Spark's exact round semantics, scatter u back over fs; ≤ d-cell
      // task accumulators combine on the driver. Replaces the
      // per-iteration explode → (dim+1)-key exchange → collect.
      def hv(vNano: Array[Long]): Array[Double] = {
        val hvL = hvPass(scored.select(col("fs"), col("pq")),
          Array(vNano), d)(0)
        val out = new Array[Double](d)
        for (j <- 0 until d) out(j) = hvL(j) / 1e9 / nDocs
        for (j <- 0 until d) out(j) += lambda * (vNano(j) / 1e9)
        out
      }
      // CG on (H + λI)Δ = g from Δ = 0; directions re-quantized to the
      // nano grid so each product is over exact LONGs
      val delta = new Array[Double](d)
      val r = g.clone()
      var dir = r.clone()
      var rs = dotv(r, r)
      var it = 0
      var stop = false
      while (it < cgIters && rs > 1e-18 && !stop) {
        val dirNano = dir.map(x => math.round(x * 1e9))
        val dirQ = dirNano.map(_ / 1e9)
        val hp = hv(dirNano)
        val denom = dotv(dirQ, hp)
        if (denom <= 0) stop = true // damped H is PD; quantization floor guard
        else {
          val alpha = rs / denom
          var i = 0
          while (i < d) { delta(i) += alpha * dirQ(i); r(i) -= alpha * hp(i); i += 1 }
          val rs2 = dotv(r, r)
          val beta = rs2 / rs
          rs = rs2
          i = 0
          while (i < d) { dir(i) = r(i) + beta * dir(i); i += 1 }
          it += 1
        }
      }
      scored.unpersist(blocking = false)
      w = Array.tabulate(d)(j => w(j) - math.round(delta(j) * 1e9))
    }
    (w(dim), w.take(dim))
  }

  /**
   * MULTICLASS (one-vs-rest) training — the language-ID / domain-routing
   * shape (fastText's `ova` loss): one [[trainCG]]-style binary head per
   * class over a SHARED per-doc feature cache (the gram stream and the
   * array collapse are paid once, not once per class). Returns
   * one `(class, biasNano, weightsNano)` model per entry of `classes`,
   * in the given order — which is also [[scoreMulti]]'s tie-break
   * priority. Same determinism contract as the binary path: every
   * distributed sum is an exact LONG, so the full weight MATRIX is
   * bit-reproducible and pinnable.
   *
   * ALL K heads advance TOGETHER, one Spark job per step, not K: the
   * forward pass projects K (e, pq) column pairs off the shared cached
   * arrays, the gradient is ONE groupBy(f) with K exact-LONG sums
   * (≤ K×(dim+1) result cells — K models, still not data), and each CG
   * iteration folds the ACTIVE heads' broadcast-literal direction arrays
   * in one pass with one feature-keyed exchange. A K-sequential loop
   * pays K × rounds × (1 + cgIters) whole-stage jobs over the same
   * cache — pure scheduling overhead at any scale; batched it's
   * rounds × (1 + cgIters), with per-head early-stop masking a finished
   * head's fold out of later iterations. Bit-identical to the sequential
   * formulation (each head's sums are the same exact LONGs whether or
   * not other heads' columns ride in the same job — spec-asserted
   * against [[trainMultiSequential]]).
   */
  def trainMulti(docs: DataFrame, labelCol: String, classes: Seq[String],
      textCol: String = "text", idCol: String = "doc_id", dim: Int = 512,
      rounds: Int = 2, lambda: Double = 0.01, cgIters: Int = 12)
      : Seq[(String, Long, Array[Long])] = {
    require(classes.nonEmpty && classes.distinct.size == classes.size,
      s"classes must be non-empty and distinct, got $classes")
    val d0 = docs.dropDuplicates(idCol)
    val base = featureArrays(d0, textCol, idCol, dim,
        "lab" -> col(labelCol).cast("string"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    try cgCoreMulti(base, classes, dim, rounds, lambda, cgIters)
    finally base.unpersist(blocking = false)
  }

  /** The K-sequential one-head-at-a-time formulation [[trainMulti]] is
   *  bit-identical to — kept (test-only) as the equivalence spec's
   *  ground truth. */
  private[graft] def trainMultiSequential(docs: DataFrame, labelCol: String,
      classes: Seq[String], textCol: String = "text", idCol: String = "doc_id",
      dim: Int = 512, rounds: Int = 2, lambda: Double = 0.01, cgIters: Int = 12)
      : Seq[(String, Long, Array[Long])] = {
    val d0 = docs.dropDuplicates(idCol)
    val base = featureArrays(d0, textCol, idCol, dim,
        "lab" -> col(labelCol).cast("string"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    try classes.map { c =>
      val head = base.select(col("fs"), (col("lab") === c).cast("long").as("y"))
      val (b, w) = cgCore(head, dim, rounds, lambda, cgIters)
      (c, b, w)
    } finally base.unpersist(blocking = false)
  }

  /** The batched damped-Newton-CG loop behind [[trainMulti]]: K binary
   *  heads over one cached `(fs, lab)` frame, every distributed step a
   *  single job with K (or |active heads|) exact-LONG agg columns keyed
   *  by feature. Per-head CG state (direction, residual, early-stop) is
   *  driver-side and independent — head k runs EXACTLY the iterations it
   *  would run alone, so the weights match [[trainMultiSequential]]
   *  bit for bit. */
  private def cgCoreMulti(base: DataFrame, classes: Seq[String], dim: Int,
      rounds: Int, lambda: Double, cgIters: Int): Seq[(String, Long, Array[Long])] = {
    val kN = classes.size
    val nDocs = math.max(base.count(), 1L).toDouble
    val d = dim + 1
    def dotv(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0; while (i < d) { s += a(i) * b(i); i += 1 }; s
    }
    def foldNano(vNano: Array[Long]): Column =
      graft.functions.VectorFunctions.nano_fold(col("fs"), vNano.toSeq)
    val w = Array.fill(kN)(new Array[Long](d))
    for (_ <- 0 until rounds) {
      // forward pass, all heads in one projection: e_k = p_k·1e6 − y_k·1e6
      // and pq_k = p_k(1−p_k)·1e6 per doc, exactly the binary per-head
      // arithmetic (z_k folds head k's own weights)
      val perHead = (0 until kN).flatMap { k =>
        val z = foldNano(w(k)) / lit(1e9)
        val p = lit(1.0) / (lit(1.0) + exp(-z))
        val y = (col("lab") === classes(k)).cast("long")
        Seq((round(p * 1e6).cast("long") - y * 1000000L).as(s"e$k"),
          round(p * (lit(1.0) - p) * 1e6).cast("long").as(s"pq$k"))
      }
      val scored = base.select(col("fs") +: perHead: _*)
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      // ONE single-stage gradient job: K exact-LONG d-cell sums per task,
      // driver-combined — no explode, no feature-keyed exchange
      val g = Array.fill(kN)(new Array[Double](d))
      val gLs = sumByFeature(
        scored.select(col("fs") +: (0 until kN).map(k => col(s"e$k")): _*),
        d, kN)
      for (k <- 0 until kN; j <- 0 until d) g(k)(j) = gLs(k)(j) / 1e6 / nDocs
      for (k <- 0 until kN; j <- 0 until d) g(k)(j) += lambda * (w(k)(j) / 1e9)
      // per-head CG state; `active` masks finished heads out of later jobs
      val delta = Array.fill(kN)(new Array[Double](d))
      val r = g.map(_.clone())
      val dir = r.map(_.clone())
      val rs = r.map(x => dotv(x, x))
      val active = Array.tabulate(kN)(k => rs(k) > 1e-18)
      var it = 0
      while (it < cgIters && active.exists(identity)) {
        val act = (0 until kN).filter(active)
        val dirNano = act.map(k => dir(k).map(x => math.round(x * 1e9)))
        val dirQ = dirNano.map(_.map(_ / 1e9))
        // ONE single-stage Hv job for every active head:
        // u_k = round(pq_k·t_k/1e6) per row, |act| d-cell exact-LONG
        // accumulators per task, driver-combined — no explode, no
        // feature-keyed exchange
        val hvLs = hvPass(
          scored.select(col("fs") +: act.map(k => col(s"pq$k")): _*),
          dirNano.toArray, d)
        val hp = act.indices.map { i =>
          val out = new Array[Double](d)
          for (j <- 0 until d) out(j) = hvLs(i)(j) / 1e9 / nDocs
          for (j <- 0 until d) out(j) += lambda * (dirNano(i)(j) / 1e9)
          out
        }
        act.zipWithIndex.foreach { case (k, i) =>
          val denom = dotv(dirQ(i), hp(i))
          if (denom <= 0) active(k) = false // damped H is PD; quantization floor
          else {
            val alpha = rs(k) / denom
            var j = 0
            while (j < d) {
              delta(k)(j) += alpha * dirQ(i)(j); r(k)(j) -= alpha * hp(i)(j); j += 1
            }
            val rs2 = dotv(r(k), r(k))
            val beta = rs2 / rs(k)
            rs(k) = rs2
            j = 0
            while (j < d) { dir(k)(j) = r(k)(j) + beta * dir(k)(j); j += 1 }
            if (rs(k) <= 1e-18) active(k) = false
          }
        }
        it += 1
      }
      scored.unpersist(blocking = false)
      for (k <- 0 until kN)
        w(k) = Array.tabulate(d)(j => w(k)(j) - math.round(delta(k)(j) * 1e9))
    }
    classes.zipWithIndex.map { case (c, k) => (c, w(k)(dim), w(k).take(dim)) }
  }

  /** Score `docs` under a [[trainMulti]] model set: `(id, predicted,
   *  margin_nano)` where `predicted` is the argmax-margin class (ties:
   *  earliest in `models` order, the [[graft.functions.TextFunctions.langId]]
   *  convention) and `margin_nano` the winner's EXACT fixed-point margin
   *  — cross-engine-comparable with no float in sight.
   *
   *  Scan-local like the binary [[score]]: the bucket array is built once
   *  per row and each class's margin is one exact-LONG fold over it
   *  against that head's broadcast-literal weights; the argmax is a
   *  `greatest` over (margin, priority) structs. Zero exchanges — this is
   *  the path that runs over the whole corpus. */
  def scoreMulti(docs: DataFrame, models: Seq[(String, Long, Seq[Long])],
      textCol: String = "text", idCol: String = "doc_id",
      dim: Int = 512): DataFrame = {
    require(models.size >= 2, "scoreMulti needs at least two class heads")
    val toks = docs.select(col(idCol).as("id"),
      graft.functions.TextFunctions.tokens(col(textCol)).as("t"))
    val t = col("t")
    val bigrams = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + lit(1)))))
      .otherwise(typedLit(Seq.empty[String]))
    val buckets = array_distinct(transform(col("g"), g =>
      pmod(conv(substring(md5(g), 1, 8), 16, 10).cast("long"),
        lit(dim.toLong))))
    // bind the bucket array ONCE through a projection — K folds reference
    // it, and inlining would re-hash every gram K times per row
    val withB = toks.select(col("id"), concat(t, bigrams).as("g"))
      .select(col("id"), buckets.as("bs"))
    val cands = models.zipWithIndex.map { case ((cls, biasNano, wNano), i) =>
      val m = lit(biasNano) + coalesce(
        graft.functions.VectorFunctions.nano_fold(col("bs"), wNano),
        lit(0L))
      struct(m.as("m"), lit(-i).as("prio"), lit(cls).as("cls"))
    }
    val best = greatest(cands: _*)
    withB.select(col("id").as(idCol),
      best.getField("cls").as("predicted"),
      best.getField("m").as("margin_nano"))
  }

  /** Score `docs` under a trained model: `(id, prob, predicted)` with
   *  prob rounded to 6 (the cross-engine comparison grid) and predicted
   *  = 1 iff the margin is ≥ 0.
   *
   *  FULLY SCAN-LOCAL — scoring is the part that runs over the WHOLE
   *  corpus (training sees only the labeled slice), so at 100 TB it must
   *  not shuffle: each row builds its distinct gram array in a
   *  projection (the token array bound first — inlining it into the
   *  bigram lambdas would re-run the tokenizer per element), then one
   *  exact-LONG `aggregate` fold hashes each gram and looks the weight
   *  up in the broadcast-literal nano array. Same distinct-gram set,
   *  same md5-bucket hash, same integer sum as the long-form
   *  [[features]] stream — bit-identical output (the pinned oracles
   *  hold across the formulations), zero exchanges in the plan
   *  (spec-asserted). */
  def score(docs: DataFrame, biasNano: Long, weightsNano: Seq[Long],
      textCol: String = "text", idCol: String = "doc_id",
      dim: Int = 512): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      graft.functions.TextFunctions.tokens(col(textCol)).as("t"))
    val t = col("t")
    val bigrams = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + lit(1)))))
      .otherwise(typedLit(Seq.empty[String]))
    // presence features are distinct per BUCKET (two grams colliding into
    // one hash bucket count once — what features()' distinct() and the
    // SQL oracle's DISTINCT (doc_id, f) both do), so dedupe the bucket
    // array, not the gram array
    val buckets = array_distinct(transform(col("g"), g =>
      pmod(conv(substring(md5(g), 1, 8), 16, 10).cast("long"),
        lit(dim.toLong))))
    val s = coalesce(
      graft.functions.VectorFunctions.nano_fold(buckets, weightsNano),
      lit(0L))
    val z = (lit(biasNano) + s) / lit(1e9)
    toks.select(col("id"), concat(t, bigrams).as("g"))
      .select(col("id").as(idCol),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("prob"),
        when(z >= 0, 1L).otherwise(0L).as("predicted"))
  }
}
