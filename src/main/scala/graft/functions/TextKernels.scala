package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native text kernels for the NON-oracled text operators.
 *
 * The oracle-verified scalar queries (q_text_stats, q_text_langid)
 * deliberately keep their Column-function formulations so the Spark and
 * DuckDB semantics stay definitionally identical; these kernels back the
 * operators whose outputs are engine-internal — SimHash fingerprints, the
 * quality heuristic, word shingles — where a single tight pass replaces an
 * explode + 64 partial aggregations (SimHash), five re-tokenizations
 * (quality), or an interpreted per-element lambda chain (shingles). Each
 * kernel that replaces a Column DEFINITION carries an equivalence spec
 * against it, and the shingle-consuming queries stay oracle-pinned (DuckDB
 * recomputes shingles from the SQL definition).
 */
/** THE tokenization contract shared by every text kernel (and mirrored by
 *  TextFunctions.tokens and the DuckDB oracles): lowercase, maximal
 *  [a-z0-9] runs. One definition — a tweak applied to one copy and not the
 *  others would silently break kernel/oracle equivalence. */
private[functions] object TextTok {
  def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** Packed (start << 32 | end) of the first maximal alnum run at or after
   *  `from` in (already lowercased) `s`, or -1 when none remains. A static
   *  step function rather than a foreach-with-closure: three kernels share
   *  this call site, and a closure parameter went megamorphic — the JIT
   *  stopped inlining the token bodies, measured ~12% on the
   *  shingle-dominated queries. */
  def nextToken(s: String, from: Int): Long = {
    val n = s.length
    var i = from
    while (i < n && !isAlnum(s.charAt(i))) i += 1
    if (i >= n) return -1L
    var j = i
    while (j < n && isAlnum(s.charAt(j))) j += 1
    (i.toLong << 32) | j
  }
}

object TextKernelImpl {

  /**
   * 64-bit SimHash over the word tokens of `text` (lowercased alnum runs —
   * same tokenization as TextFunctions.tokens): per-bit majority vote of
   * token hashes, computed per row with no explode and no shuffle. The
   * shuffle-free formulation matters at scale: the explode form shuffles 64
   * partial sums per doc; this is a scan-local map.
   */
  def simhash64(text: UTF8String): Long = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val counts = new Array[Int](64)
    var t = TextTok.nextToken(s, 0)
    while (t >= 0) {
      val i = (t >>> 32).toInt
      val j = t.toInt
      val tok = UTF8String.fromString(s.substring(i, j))
      val h = XXH64.hashUnsafeBytes(tok.getBaseObject, tok.getBaseOffset, tok.numBytes, 42L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) != 0L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      t = TextTok.nextToken(s, j)
    }
    var fp = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) > 0) fp |= (1L << k)
      k += 1
    }
    fp
  }

  /**
   * Quality score in [0,1] — single pass over the text computing length,
   * token count, alnum count and English-stopword hits together (the
   * Column formulation re-tokenized the document five times).
   * Mirrors TextFunctions.qualityScore's formula exactly.
   */
  /** `stopSet` is the PREBUILT lowercase stopword set (built once per
   *  expression instance, not per row — this kernel exists to collapse
   *  per-row overhead). */
  def qualityScore(text: UTF8String, stopSet: java.util.HashSet[String]): Double = {
    val s = text.toString
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    // codepoints, not UTF-16 units: Spark's length() counts codepoints,
    // and this kernel must mirror the Column formula on astral-plane text
    val nChar = s.codePointCount(0, s.length).toDouble
    var nTok = 0.0
    var nAlnum = 0.0
    var stopHits = 0.0
    val seenStops = new java.util.HashSet[String]()
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))
        nAlnum += 1
      i += 1
    }
    var t = TextTok.nextToken(lower, 0)
    while (t >= 0) {
      val j2 = t.toInt
      nTok += 1
      val tok = lower.substring((t >>> 32).toInt, j2)
      if (stopSet.contains(tok) && seenStops.add(tok)) stopHits += 1
      t = TextTok.nextToken(lower, j2)
    }
    val meanWordLen = if (nTok > 0) nAlnum / nTok else 0.0
    val stopRatio = if (nTok > 0) stopHits / math.min(nTok, 10.0) else 0.0
    val lengthScore = math.min(nChar / 500.0, 1.0)
    val wordLenScore = if (meanWordLen >= 3.0 && meanWordLen <= 10.0) 1.0 else 0.5
    val alnumScore = if (nChar > 0) nAlnum / nChar else 0.0
    val raw = lengthScore * 0.3 + wordLenScore * 0.2 + alnumScore * 0.3 + stopRatio * 0.2
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
}

object TextKernelImplShingles {

  /**
   * Word n-gram shingles — the native twin of the zip_with/slice Column
   * formulation in [[TextFunctions.wordShinglesColumns]] (spec-proven equal
   * on the corpus + edge cases): lowercase-alnum tokenization, n-token
   * space-joined shingles, distinct in first-occurrence order; documents
   * with 0 < tokens < n yield ONE shingle of all their tokens, empty
   * documents yield an empty array. One tight pass per row instead of a
   * per-element interpreted lambda chain that re-evaluates the token array
   * n times — the shingle build dominated q_ngram_jaccard/q_dedup_minhash.
   */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var t = TextTok.nextToken(s, 0)
    while (t >= 0) {
      val j = t.toInt
      toks += s.substring((t >>> 32).toInt, j)
      t = TextTok.nextToken(s, j)
    }
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (toks.isEmpty) {
      // no tokens → no shingles (matches slice-of-empty in the Column form)
    } else if (toks.length < n) {
      out.add(UTF8String.fromString(toks.mkString(" ")))
    } else {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k + n <= toks.length) {
        sb.setLength(0)
        var t = 0
        while (t < n) {
          if (t > 0) sb.append(' ')
          sb.append(toks(k + t))
          t += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        k += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[UTF8String](out.size)).asInstanceOf[Array[Any]])
  }
}

object TextKernelImplWinnow {

  /**
   * Winnowing document fingerprints (rolling hash + window minima — the
   * classic local document fingerprinting construction): a polynomial
   * rolling hash over every k-gram of the normalized text, then the minimum
   * hash of each w-wide window, deduplicated in order. Guarantees any match
   * of length ≥ w+k-1 between two documents shares a fingerprint, at a
   * density of ~2/(w+1) — per-row, scan-local, no shuffle.
   */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
    val n = s.length
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val B = 1000003L
    var pow = 1L
    var i = 1
    while (i < k) { pow *= B; i += 1 }
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var lastPos = -1
    i = 0
    val windows = math.max(m - w + 1, 1)
    while (i < windows) {
      var minPos = i
      var j = i + 1
      val end = math.min(i + w, m)
      while (j < end) {
        // rightmost minimum per the winnowing rule
        if (hashes(j) <= hashes(minPos)) minPos = j
        j += 1
      }
      if (minPos != lastPos) { out += hashes(minPos); lastPos = minPos }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Char-trigram LM scoring kernel (graft.operators.LanguageModel): mean
  * trigram log-probability of a NORMALIZED ([a-z0-9 ]) text under additive
  * smoothing, against count tables indexed over the 37-char alphabet. */
object TextKernelImplLm {
  val V = 37
  private val V2 = V * V

  /** [a-z0-9 ] → 0..36; anything else (impossible post-normalize) → -1. */
  private def charIdx(b: Byte): Int =
    if (b >= 'a' && b <= 'z') b - 'a'
    else if (b >= '0' && b <= '9') 26 + (b - '0')
    else if (b == ' ') 36
    else -1

  /** [[charIdx]] with a loud contract failure: the registered SQL surface
   *  (`lm_mean_logp`) takes arbitrary input, and a silent -1 would index
   *  a garbage/negative cell of the count table deep inside generated
   *  code (r17 ADVICE). One predictable branch per char — negligible next
   *  to the log() each trigram pays. */
  private def charIdxChecked(b: Byte): Int = {
    val i = charIdx(b)
    if (i < 0) throw new IllegalArgumentException(
      s"lm_mean_logp expects normalized [a-z0-9 ] input " +
        s"(LanguageModel.normalize), got byte ${b.toInt} — normalize first")
    i
  }

  /** Dense index of a 3-char normalized trigram string: c1·37² + c2·37 + c3. */
  def triIndex(tri: String): Int = {
    require(tri.length == 3, s"trigram must be 3 chars, got '$tri'")
    val i1 = charIdx(tri.charAt(0).toByte)
    val i2 = charIdx(tri.charAt(1).toByte)
    val i3 = charIdx(tri.charAt(2).toByte)
    require(i1 >= 0 && i2 >= 0 && i3 >= 0,
      s"trigram '$tri' outside the normalized [a-z0-9 ] alphabet")
    i1 * V2 + i2 * V + i3
  }

  /** Σ_i ln((tc[tri_i] + 0.5) / (bc[bi_i] + 18.5)) / nTrigrams over the
    * normalized text's trigram positions, summed IN POSITION ORDER — the
    * same addition order the exploded-row formulation's map-side Average
    * partial produced (a doc's trigram rows never left their scan
    * partition), so the double is bit-identical. The expression wrapper
    * returns null below 3 bytes (nothing to score); the alphabet is
    * validated per char — non-normalized input fails loudly instead of
    * reading a garbage index (r17 ADVICE). */
  def lmMeanLogp(norm: UTF8String, tc: Array[Long], bc: Array[Long]): Double = {
    val n = norm.numBytes
    require(n >= 3,
      s"lm_mean_logp needs >= 3 normalized chars, got $n — guard or filter first")
    val nTr = n - 2
    var i = 0
    // running 2-char prefix index, shifted one char per step
    var i1 = charIdxChecked(norm.getByte(0))
    var i2 = charIdxChecked(norm.getByte(1))
    var sum = 0.0
    while (i < nTr) {
      val i3 = charIdxChecked(norm.getByte(i + 2))
      sum += java.lang.Math.log(
        (tc(i1 * V2 + i2 * V + i3) + 0.5) / (bc(i1 * V + i2) + 0.5 * V))
      i1 = i2
      i2 = i3
      i += 1
    }
    sum / nTr
  }
}

object TextKernels {

  /** Analysis-time contract shared by all four text expressions: the child
   *  must be a string — otherwise a wrong-typed SQL argument dies at task
   *  runtime with a ClassCastException instead of an AnalysisException. */
  private def checkStringInput(name: String, child: Expression)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$name expects a string argument, got ${child.dataType.sql}")

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes() = checkStringInput(prettyName, child)
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      TextKernelImpl.simhash64(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, v => s"graft.functions.TextKernelImpl.simhash64($v)")
    override def prettyName: String = "simhash64"
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  }

  case class QualityScore(child: Expression, stopwords: Seq[String]) extends UnaryExpression {
    override def checkInputDataTypes() = checkStringInput(prettyName, child)
    override def dataType: DataType = DoubleType
    // built ONCE per expression instance (serializes to executors with the
    // expression), not per row inside the kernel
    private lazy val stops: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      stopwords.foreach(w => s.add(w.toLowerCase(java.util.Locale.ROOT)))
      s
    }
    override def nullSafeEval(v: Any): Any =
      TextKernelImpl.qualityScore(v.asInstanceOf[UTF8String], stops)
    // stopword set shipped through a codegen reference object
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("qsStops", stops, "java.util.HashSet")
      defineCodeGen(ctx, ev, v => s"graft.functions.TextKernelImpl.qualityScore($v, $ref)")
    }
    override def prettyName: String = "quality_score"
    override protected def withNewChildInternal(c: Expression): QualityScore = copy(child = c)
  }

  case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
    require(n > 0, s"word_shingles: n must be positive, got $n")
    override def checkInputDataTypes() = checkStringInput(prettyName, child)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernelImplShingles.wordShingles(v.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, v =>
        s"graft.functions.TextKernelImplShingles.wordShingles($v, $n)")
    override def prettyName: String = "word_shingles"
    override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  }

  case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {
    // w <= 0 would read past the hash array in the window loop; k <= 0
    // would take negative-length substrings — reject at construction
    // (= analysis time through the registry builder)
    require(k > 0 && w > 0, s"winnow_fingerprints: k and w must be positive, got k=$k w=$w")
    override def checkInputDataTypes() = checkStringInput(prettyName, child)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      TextKernelImplWinnow.winnow(v.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, v =>
        s"graft.functions.TextKernelImplWinnow.winnow($v, $k, $w)")
    override def prettyName: String = "winnow_fingerprints"
    override protected def withNewChildInternal(c: Expression): Winnow = copy(child = c)
  }

  /** Mean trigram log-prob of a pre-normalized string under the trained
   *  count table `tc` (dense 37³ layout, [[TextKernelImplLm.triIndex]]).
   *  The prefix-bigram table is the exact marginal of `tc` (same LONG
   *  sums as the SQL rollup), derived once per expression instance; both
   *  ride to codegen as shared long[] reference objects — scoring the
   *  whole corpus is scan-local, no trigram explode, no model join. */
  case class LmMeanLogp(child: Expression, tc: Seq[Long]) extends UnaryExpression {
    require(tc.length == TextKernelImplLm.V * TextKernelImplLm.V * TextKernelImplLm.V,
      s"lm_mean_logp count table must have 37^3 cells, got ${tc.length}")
    override def checkInputDataTypes() = checkStringInput(prettyName, child)
    override def dataType: DataType = DoubleType
    @transient private lazy val tcArr = tc.toArray
    @transient private lazy val bcArr = {
      val v = TextKernelImplLm.V
      val bc = new Array[Long](v * v)
      var i = 0
      while (i < tcArr.length) { bc(i / v) += tcArr(i); i += 1 }
      bc
    }
    // a sub-3-byte string has no trigram to average — null, not NaN or an
    // out-of-bounds byte read (r17 ADVICE; the operator path filters
    // length >= 3 before ever reaching here, so declared results are
    // untouched — only the registered SQL surface changes)
    override def nullable: Boolean = true
    override def nullSafeEval(s: Any): Any = {
      val u = s.asInstanceOf[UTF8String]
      if (u.numBytes < 3) null
      else TextKernelImplLm.lmMeanLogp(u, tcArr, bcArr)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tcRef = ctx.addReferenceObj("lmTc", tcArr, "long[]")
      val bcRef = ctx.addReferenceObj("lmBc", bcArr, "long[]")
      nullSafeCodeGen(ctx, ev, v => s"""
        if ($v.numBytes() < 3) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.functions.TextKernelImplLm.lmMeanLogp($v, $tcRef, $bcRef);
        }""")
    }
    override def prettyName: String = "lm_mean_logp"
    override protected def withNewChildInternal(c: Expression): LmMeanLogp = copy(child = c)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      (es: Seq[Expression]) => { VectorFunctions.expectArity(es, 1, "simhash64(text)")
        SimHash64(es.head) }, "scala_udf")
    reg.createOrReplaceTempFunction("quality_score",
      (es: Seq[Expression]) => { VectorFunctions.expectArity(es, 1, "quality_score(text)")
        QualityScore(es.head, TextFunctions.StopwordSets.head._2) }, "scala_udf")
    reg.createOrReplaceTempFunction("winnow_fingerprints",
      (es: Seq[Expression]) => { VectorFunctions.expectArity(es, 3, "winnow_fingerprints(text, k, w)")
        Winnow(es(0),
          VectorFunctions.litIntArg(es(1), "k"), VectorFunctions.litIntArg(es(2), "w")) }, "scala_udf")
    reg.createOrReplaceTempFunction("word_shingles",
      (es: Seq[Expression]) => { VectorFunctions.expectArity(es, 2, "word_shingles(text, n)")
        WordShingles(es(0),
          VectorFunctions.litIntArg(es(1), "n")) }, "scala_udf")
    reg.createOrReplaceTempFunction("lm_mean_logp",
      (es: Seq[Expression]) => { VectorFunctions.expectArity(es, 2, "lm_mean_logp(norm, tc)")
        LmMeanLogp(es(0), VectorFunctions.foldLongArray(es(1), "tc")) }, "scala_udf")
  }

  def word_shingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.lit
    register(SparkSession.active)
    call_function("word_shingles", text, lit(n))
  }

  def winnow_fingerprints(text: Column, k: Int = 5, w: Int = 8): Column = {
    import org.apache.spark.sql.functions.lit
    register(SparkSession.active)
    call_function("winnow_fingerprints", text, lit(k), lit(w))
  }

  def simhash64(text: Column): Column = {
    register(SparkSession.active)
    call_function("simhash64", text)
  }

  def quality_score(text: Column): Column = {
    register(SparkSession.active)
    call_function("quality_score", text)
  }

  def lm_mean_logp(norm: Column, tc: Seq[Long]): Column = {
    import org.apache.spark.sql.functions.typedLit
    register(SparkSession.active)
    call_function("lm_mean_logp", norm, typedLit(tc))
  }
}
