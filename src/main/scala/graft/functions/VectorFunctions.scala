package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/**
 * Native vector kernels for the similarity operators.
 *
 * Spark's higher-order functions (zip_with/aggregate) are interpreted —
 * they fall out of whole-stage codegen and allocate per element. For 64-dim
 * embedding math that cost ~3 ms/row in the LSH signature path. These are
 * tight primitive loops exposed as Catalyst expressions with `doGenCode`
 * (a static call — the expression stays inside the surrounding codegen
 * span), the (b) option in the custom-operator preference order.
 */
object VectorKernels {

  // Null ELEMENTS (containsNull arrays): every numeric kernel reads a null
  // slot as 0.0 — UnsafeArrayData zeroes null slots and GenericArrayData's
  // unboxing yields 0.0, so the behavior is identical on both eval paths
  // and deterministic: a null dimension simply contributes nothing to the
  // dot/norm/projection. (minhash skips null shingles explicitly — there
  // the raw getUTF8String would be a task-killing NPE.)
  private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += elem(a, i, aFloat) * elem(b, i, bFloat); i += 1 }
    s
  }

  /** Cosine in one pass (dot and both norms together). */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dp = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, aFloat); val y = elem(b, i, bFloat)
      dp += x * y; na += x * x; nb += y * y
      i += 1
    }
    // zero-norm input (failed/padded embedding row): cosine is undefined;
    // return 0 rather than NaN — Spark sorts NaN above every real value,
    // so a NaN would make the zero vector every probe's rank-1 neighbor
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dp / denom
  }

  /**
   * Sign-LSH signature: bit j (MSB-first fold) = sign(v · hyperplane_{offset+j}),
   * hyperplane component (i, p) = ±1 from the parity of
   * xxhash64(i, then p, seed 42) — deterministic, no stored model.
   */
  // The ±1 hyperplane matrix is row-INVARIANT (pure function of plane index
  // and dimension), so it is materialized once per (planes, offset, dim)
  // and reused by every row — the naive form recomputed 2 xxhash calls per
  // element per plane per ROW (2048 hashes/row at 64 dims × 16 planes). A
  // small cap bounds the cache; past it the signs are computed inline
  // (correctness identical, just the original speed).
  private val signTables =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private def planeSign(j: Int, i: Int, offset: Int): Double = {
    val h = XXH64.hashLong(offset + j, XXH64.hashLong(i, 42L))
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  private def signTable(planes: Int, offset: Int, n: Int): Array[Double] = {
    // CACHED entries stay usable past the cap: the size guard gates only
    // NEW materializations, or crossing 64 distinct shapes would silently
    // demote every hot shape to the 2048-hashes/row inline path forever
    val hit = signTables.get((planes, offset, n))
    if (hit != null) return hit
    if (signTables.size > 64) return null // unbounded dims guard
    // per-entry budget: n comes from each ROW's array length, so one
    // pathological multi-million-element vector must not materialize a
    // planes×n table (16 × 100M = ~12.8 GB) inside computeIfAbsent —
    // fall back to the inline planeSign path past 1M elements
    if (planes.toLong * n > (1L << 20)) return null
    signTables.computeIfAbsent((planes, offset, n), _ => {
      val t = new Array[Double](planes * n)
      var j = 0
      while (j < planes) {
        var i = 0
        while (i < n) { t(j * n + i) = planeSign(j, i, offset); i += 1 }
        j += 1
      }
      t
    })
  }

  def signLsh(v: ArrayData, vFloat: Boolean, planes: Int, offset: Int): Long = {
    val n = v.numElements()
    val table = signTable(planes, offset, n)
    var sig = 0L
    var j = 0
    while (j < planes) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val s = if (table != null) table(j * n + i) else planeSign(j, i, offset)
        proj += elem(v, i, vFloat) * s
        i += 1
      }
      sig = sig * 2 + (if (proj >= 0) 1L else 0L)
      j += 1
    }
    sig
  }

  // ------------------------------------------------ product quantization
  //
  // PQ compresses a d-dim float vector to `m` bytes: the vector is split
  // into m contiguous subspaces of dsub = d/m dims, and each subvector is
  // replaced by the index of its nearest sub-centroid (ksub ≤ 256 per
  // subspace, trained by per-subspace k-means — Similarity.pqTrain). At
  // 100 TB of 64-dim float32 embeddings that is a 32× (m=8) storage and
  // scan-I/O reduction; queries score codes WITHOUT decompressing via ADC
  // (asymmetric distance computation): per probe, a lookup table
  // lut[j][c] = probe_sub_j · centroid_{j,c} is built once (m×ksub dots),
  // and every candidate then costs m table reads instead of d multiplies.
  // Because corpus vectors are L2-NORMALIZED before encoding and the probe
  // is normalized in the LUT, the ADC score approximates the cosine the
  // exact operators rank by — Σ_j p_sub_j · C_j[code_j] = p · reconstruction.
  // The flat codebook layout everywhere: cb[((j*ksub)+c)*dsub + t].

  /** Nearest sub-centroid per subspace over the NORMALIZED input; ties go
   *  to the lowest centroid index (deterministic). Dimensions past the
   *  input's length read as 0.0 (the null-slot convention above).
   *  `normalize = false` encodes the input AS IS — the residual-PQ path,
   *  where the input is already `normalized(v) − centroid[list]` and a
   *  second normalization would corrupt the geometry. */
  def pqEncode(v: ArrayData, vFloat: Boolean, cb: Array[Float],
      m: Int, ksub: Int, normalize: Boolean): Array[Byte] = {
    val dsub = cb.length / (m * ksub)
    val n = v.numElements()
    var nrm = 0.0
    var i = 0
    while (i < n) { val x = elem(v, i, vFloat); nrm += x * x; i += 1 }
    // zero-norm vector: encode the zero vector itself (inv = 0) — every
    // subspace picks its centroid nearest the origin, deterministically
    val inv = if (!normalize) 1.0 else if (nrm == 0.0) 0.0 else 1.0 / math.sqrt(nrm)
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val cbase = (j * ksub + c) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val x = if (base + t < n) elem(v, base + t, vFloat) * inv else 0.0
          val diff = x - cb(cbase + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  /** [[pqEncode]] as int codes — the training loop's explode-friendly twin
   *  (binary columns don't posexplode). */
  def pqEncodeInts(v: ArrayData, vFloat: Boolean, cb: Array[Float],
      m: Int, ksub: Int, normalize: Boolean): ArrayData = {
    val bytes = pqEncode(v, vFloat, cb, m, ksub, normalize)
    val out = new Array[Int](m)
    var j = 0
    while (j < m) { out(j) = bytes(j) & 0xFF; j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Per-probe ADC lookup table: lut[j*ksub + c] = normalized-probe
   *  subvector j · centroid (j, c). Built ONCE per probe row (m×ksub
   *  dots), amortized over every candidate the probe scores. */
  def pqLut(p: ArrayData, pFloat: Boolean, cb: Array[Float],
      m: Int, ksub: Int): ArrayData = {
    val dsub = cb.length / (m * ksub)
    val n = p.numElements()
    var nrm = 0.0
    var i = 0
    while (i < n) { val x = elem(p, i, pFloat); nrm += x * x; i += 1 }
    val inv = if (nrm == 0.0) 0.0 else 1.0 / math.sqrt(nrm)
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var c = 0
      while (c < ksub) {
        val cbase = (j * ksub + c) * dsub
        var s = 0.0
        var t = 0
        while (t < dsub) {
          val x = if (base + t < n) elem(p, base + t, pFloat) * inv else 0.0
          s += x * cb(cbase + t)
          t += 1
        }
        out(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ADC score: m table reads, no vector math. ksub is implied by the
   *  shapes (lut.length / code.length), so the same expression serves any
   *  codebook the LUT was built from. */
  def pqAdc(code: Array[Byte], lut: ArrayData): Double = {
    val m = code.length
    if (m == 0) return 0.0
    val ksub = lut.numElements() / m
    var s = 0.0
    var j = 0
    while (j < m) { s += lut.getDouble(j * ksub + (code(j) & 0xFF)); j += 1 }
    s
  }

  /** IVF residual: `normalized(v) − normalized(centroids[listId])` — the
   *  vector the residual-PQ path encodes (FAISS-style IVF-PQ: quantize the
   *  offset from the list's coarse centroid instead of the raw vector).
   *  BOTH sides normalize: the cosine metric scores unit vectors, so the
   *  reference point must live on the unit sphere too — against a raw
   *  sampled centroid (norm ≫ 1) the residual would be dominated by the
   *  centroid itself and quantize WORSE than the raw vector. The probe
   *  side's exact term is then simply `cosine(probe, centroid)`. Zero-norm
   *  input keeps the zero vector (residual = −ĉ); a zero-norm centroid
   *  reads as zeros. Dimensions past the input's length read as 0.0; an
   *  out-of-range listId is a loud error (assignments come from this
   *  codebook — out of range means the row and the codebook drifted
   *  apart). Output dims = the codebook's. */
  def ivfResidual(v: ArrayData, vFloat: Boolean, cents: Array[Float],
      dim: Int, listId: Int): ArrayData = {
    val nLists = cents.length / dim
    if (listId < 0 || listId >= nLists)
      throw new IllegalArgumentException(
        s"ivf_residual: list_id $listId out of range for a $nLists-list codebook " +
          "(the row's assignment and the codebook literal drifted apart)")
    val n = v.numElements()
    // an OVER-length input would be silently truncated (its norm counts
    // the dropped tail, shrinking every kept component) — loud error,
    // mirroring the out-of-range listId; shorter inputs keep the
    // documented zero-pad convention
    if (n > dim)
      throw new IllegalArgumentException(
        s"ivf_residual: input has $n dims but the codebook is $dim-dimensional " +
          "— a longer vector would be silently truncated; re-train the " +
          "codebook on this embedding column")
    var nrm = 0.0
    var i = 0
    while (i < n) { val x = elem(v, i, vFloat); nrm += x * x; i += 1 }
    val inv = if (nrm == 0.0) 0.0 else 1.0 / math.sqrt(nrm)
    val base = listId * dim
    var cn = 0.0
    var t = 0
    while (t < dim) { val c = cents(base + t).toDouble; cn += c * c; t += 1 }
    val cInv = if (cn == 0.0) 0.0 else 1.0 / math.sqrt(cn)
    val out = new Array[Double](dim)
    t = 0
    while (t < dim) {
      val x = if (t < n) elem(v, t, vFloat) * inv else 0.0
      out(t) = x - cents(base + t) * cInv
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Exact-LONG fold of a weight table over a feature-index array:
   *  Σ w(fs(i)) — the classifier's per-doc margin kernel. The weight
   *  table rides as a shared long[] reference (like the PQ codebooks),
   *  so the fold is one primitive loop per row; the ArrayAggregate
   *  higher-order formulation it replaces ran interpreted with a boxed
   *  element_at lookup per feature against a 16k-element literal. */
  def nanoFold(fs: ArrayData, w: Array[Long]): Long = {
    var s = 0L
    val n = fs.numElements()
    var i = 0
    while (i < n) {
      val idx = fs.getLong(i)
      // the registered SQL surface (`nano_fold`) takes arbitrary input;
      // internal callers are pmod-bounded and never trip this. One
      // predictable compare per feature (r17 ADVICE).
      if (idx < 0 || idx >= w.length)
        throw new IllegalArgumentException(
          s"nano_fold: feature index $idx outside the weight table [0, ${w.length})")
      s += w(idx.toInt)
      i += 1
    }
    s
  }

  /** MinHash signature over a string-shingle array: sig[j] = min over
   *  shingles of xxhash64(shingle bytes, seed j). One pass over shingles,
   *  all k lanes updated per element — no per-seed re-traversal, no
   *  intermediate arrays. */
  def minhash(sh: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      // skip null shingle slots: getUTF8String on one would NPE the task;
      // a null shingle carries no content to hash
      if (!sh.isNullAt(i)) {
        val s = sh.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j)
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorFunctions {

  /** Analysis-time input contract: without it a wrong-typed SQL argument
   *  passes analysis and every task dies with a ClassCastException at
   *  runtime. */
  private def checkVecArgs(name: String, es: Expression*): TypeCheckResult = {
    val bad = es.find(e => e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => false
      case _ => true
    })
    bad match {
      case Some(e) => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<float|double> arguments, got ${e.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }

  /** Registry-builder arity check: extra args would otherwise be silently
   *  dropped by positional `es(i)` access. */
  private[graft] def expectArity(es: Seq[Expression], n: Int, sig: String): Unit =
    if (es.length != n)
      throw new IllegalArgumentException(s"$sig expects $n arguments, got ${es.length}")

  case class VectorCosine(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecArgs(prettyName, left, right)
    override def dataType: DataType = DoubleType
    private lazy val lf = isFloatArray(left)
    private lazy val rf = isFloatArray(right)
    override def nullSafeEval(a: Any, b: Any): Any =
      VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorKernels.cosine($a, $b, $lf, $rf);")
    override def prettyName: String = "vec_cosine"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorCosine =
      copy(left = l, right = r)
  }

  case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecArgs(prettyName, left, right)
    override def dataType: DataType = DoubleType
    private lazy val lf = isFloatArray(left)
    private lazy val rf = isFloatArray(right)
    override def nullSafeEval(a: Any, b: Any): Any =
      VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorKernels.dot($a, $b, $lf, $rf);")
    override def prettyName: String = "vec_dot"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
      copy(left = l, right = r)
  }

  case class SignLshSignature(child: Expression, planes: Int, offset: Int)
    extends UnaryExpression {
    require(planes > 0 && planes <= 62, "1..62 planes fit a long key")
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecArgs(prettyName, child)
    override def dataType: DataType = LongType
    private lazy val vf = isFloatArray(child)
    override def nullSafeEval(v: Any): Any =
      VectorKernels.signLsh(v.asInstanceOf[ArrayData], vf, planes, offset)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, v =>
        s"graft.functions.VectorKernels.signLsh($v, $vf, $planes, $offset)")
    override def prettyName: String = "sign_lsh"
    override protected def withNewChildInternal(c: Expression): SignLshSignature =
      copy(child = c)
  }

  /** Σ weights(f) over a long-array feature column — LongType, exact.
   *  The weight table is a constructor field (Seq for structural
   *  case-class equality, same rationale as the PQ codebook), shipped to
   *  codegen as one shared long[] reference object. */
  case class NanoFold(child: Expression, w: Seq[Long]) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint> feature indices, got ${other.sql}")
    }
    override def dataType: DataType = LongType
    @transient private lazy val wArr = w.toArray
    override def nullSafeEval(v: Any): Any =
      VectorKernels.nanoFold(v.asInstanceOf[ArrayData], wArr)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("nanow", wArr, "long[]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.VectorKernels.nanoFold($v, $ref);")
    }
    override def prettyName: String = "nano_fold"
    override protected def withNewChildInternal(c: Expression): NanoFold =
      copy(child = c)
  }

  case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
    require(numHashes > 0, "minhash_signature needs at least one hash lane")
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> shingles, got ${other.sql}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      VectorKernels.minhash(v.asInstanceOf[ArrayData], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, v =>
        s"graft.functions.VectorKernels.minhash($v, $numHashes)")
    override def prettyName: String = "minhash_signature"
    override protected def withNewChildInternal(c: Expression): MinHashSignature =
      copy(child = c)
  }

  // --------------------------------------------- product quantization exprs
  //
  // The codebook rides INSIDE the expression (a Seq[Float] field — Seq, not
  // Array, so case-class equality stays structural for canonicalization),
  // handed to codegen as a reference object: the generated code reads one
  // shared float[] — no per-row literal array construction, and the
  // expression stays inside the surrounding whole-stage span.

  case class PqEncode(child: Expression, cb: Seq[Float], m: Int, ksub: Int,
      asInts: Boolean, normalize: Boolean = true) extends UnaryExpression {
    require(m > 0 && ksub > 0 && ksub <= 256 && cb.length % (m * ksub) == 0,
      s"pq codebook shape: len=${cb.length} must be m($m) x ksub($ksub) x dsub, ksub <= 256")
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecArgs(prettyName, child)
    override def dataType: DataType =
      if (asInts) ArrayType(IntegerType, containsNull = false) else BinaryType
    private lazy val vf = isFloatArray(child)
    @transient private lazy val cbArr = cb.toArray
    override def nullSafeEval(v: Any): Any =
      if (asInts) VectorKernels.pqEncodeInts(v.asInstanceOf[ArrayData], vf, cbArr, m, ksub, normalize)
      else VectorKernels.pqEncode(v.asInstanceOf[ArrayData], vf, cbArr, m, ksub, normalize)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqcb", cbArr, "float[]")
      val fn = if (asInts) "pqEncodeInts" else "pqEncode"
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.VectorKernels.$fn($v, $vf, $ref, $m, $ksub, $normalize);")
    }
    override def prettyName: String = if (asInts) "pq_encode_ints" else "pq_encode"
    override protected def withNewChildInternal(c: Expression): PqEncode =
      copy(child = c)
  }

  /** `normalized(vec) − centroids[list_id]` — the residual the IVF-PQ
   *  encode path quantizes. The centroid table rides inside the
   *  expression like the PQ codebooks (one shared float[], no per-row
   *  literal construction); `list_id` is a per-row COLUMN (each replica
   *  of a multi-assigned vector gets the residual to ITS list). */
  case class IvfResidual(left: Expression, right: Expression,
      cents: Seq[Float], dim: Int) extends BinaryExpression {
    require(dim > 0 && cents.nonEmpty && cents.length % dim == 0,
      s"ivf_residual centroid table: len=${cents.length} must be nLists x dim($dim)")
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecArgs(prettyName, left) match {
        case TypeCheckResult.TypeCheckSuccess => right.dataType match {
          case IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"$prettyName expects an integral list_id, got ${other.sql}")
        }
        case fail => fail
      }
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    private lazy val vf = isFloatArray(left)
    private lazy val idLong = right.dataType == LongType
    @transient private lazy val cArr = cents.toArray
    override def nullSafeEval(v: Any, id: Any): Any =
      VectorKernels.ivfResidual(v.asInstanceOf[ArrayData], vf, cArr, dim,
        if (idLong) id.asInstanceOf[Long].toInt else id.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ivfcents", cArr, "float[]")
      nullSafeCodeGen(ctx, ev, (v, id) =>
        s"${ev.value} = graft.functions.VectorKernels.ivfResidual($v, $vf, $ref, $dim, (int) $id);")
    }
    override def prettyName: String = "ivf_residual"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): IvfResidual =
      copy(left = l, right = r)
  }

  case class PqLut(child: Expression, cb: Seq[Float], m: Int, ksub: Int)
    extends UnaryExpression {
    require(m > 0 && ksub > 0 && ksub <= 256 && cb.length % (m * ksub) == 0,
      s"pq codebook shape: len=${cb.length} must be m($m) x ksub($ksub) x dsub, ksub <= 256")
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecArgs(prettyName, child)
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    private lazy val vf = isFloatArray(child)
    @transient private lazy val cbArr = cb.toArray
    override def nullSafeEval(v: Any): Any =
      VectorKernels.pqLut(v.asInstanceOf[ArrayData], vf, cbArr, m, ksub)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqcb", cbArr, "float[]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.VectorKernels.pqLut($v, $vf, $ref, $m, $ksub);")
    }
    override def prettyName: String = "pq_lut"
    override protected def withNewChildInternal(c: Expression): PqLut =
      copy(child = c)
  }

  case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (binary code, array<double> lut), got (${l.sql}, ${r.sql})")
      }
    override def dataType: DataType = DoubleType
    override def nullSafeEval(code: Any, lut: Any): Any =
      VectorKernels.pqAdc(code.asInstanceOf[Array[Byte]], lut.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c, l) =>
        s"${ev.value} = graft.functions.VectorKernels.pqAdc($c, $l);")
    override def prettyName: String = "pq_adc"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
      copy(left = l, right = r)
  }

  /** Flatten a FOLDABLE array<array<array<float>>> codebook argument at
   *  analysis time (typedLit from the Column helpers, or an inline literal
   *  from SQL) into the kernels' flat layout + derived (m, ksub). */
  private[graft] def foldCodebook(e: Expression): (Seq[Float], Int, Int) = {
    require(e.foldable, s"pq codebook must be a literal, got $e")
    val ok = e.dataType match {
      case ArrayType(ArrayType(ArrayType(FloatType, _), _), _) => true
      case _ => false
    }
    require(ok, s"pq codebook must be array<array<array<float>>>, got ${e.dataType.sql}")
    val outer = e.eval().asInstanceOf[ArrayData]
    val m = outer.numElements()
    require(m > 0, "pq codebook has no subspaces")
    val subs = (0 until m).map(j => outer.getArray(j))
    val ksub = subs.head.numElements()
    require(ksub > 0 && subs.forall(_.numElements() == ksub),
      "pq codebook subspaces must share one ksub > 0")
    val dsub = subs.head.getArray(0).numElements()
    val flat = new Array[Float](m * ksub * dsub)
    for (j <- 0 until m; c <- 0 until ksub) {
      val cent = subs(j).getArray(c)
      require(cent.numElements() == dsub, "pq codebook centroids must share one dsub")
      var t = 0
      while (t < dsub) { flat((j * ksub + c) * dsub + t) = cent.getFloat(t); t += 1 }
    }
    (flat.toSeq, m, ksub)
  }

  /** Flatten a FOLDABLE array<array<float>> centroid table (the IVF
   *  codebook) into a flat row-major Seq[Float] + its dim. */
  private[graft] def foldCentroids(e: Expression): (Seq[Float], Int) = {
    require(e.foldable, s"ivf centroid table must be a literal, got $e")
    val ok = e.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => true
      case _ => false
    }
    require(ok, s"ivf centroid table must be array<array<float>>, got ${e.dataType.sql}")
    val outer = e.eval().asInstanceOf[ArrayData]
    val nLists = outer.numElements()
    require(nLists > 0, "ivf centroid table is empty")
    val dim = outer.getArray(0).numElements()
    require(dim > 0, "ivf centroids have no dimensions")
    val flat = new Array[Float](nLists * dim)
    for (j <- 0 until nLists) {
      val c = outer.getArray(j)
      require(c.numElements() == dim, "ivf centroids must share one dim")
      var t = 0
      while (t < dim) { flat(j * dim + t) = c.getFloat(t); t += 1 }
    }
    (flat.toSeq, dim)
  }

  /** Fold a FOLDABLE array<bigint> literal (the nano weight table) into
   *  a Seq[Long]. */
  private[graft] def foldLongArray(e: Expression, what: String): Seq[Long] = {
    require(e.foldable, s"$what must be a literal, got $e")
    e.dataType match {
      case ArrayType(LongType, _) => ()
      case other => throw new IllegalArgumentException(
        s"$what must be array<bigint>, got ${other.sql}")
    }
    e.eval().asInstanceOf[ArrayData].toLongArray().toSeq
  }

  private[graft] def litIntArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }
  private def litInt(e: Expression, what: String): Int = litIntArg(e, what)

  private[graft] def litBoolArg(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, BooleanType) => v
    case other => throw new IllegalArgumentException(s"$what must be a boolean literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_cosine",
      (es: Seq[Expression]) => { expectArity(es, 2, "vec_cosine(a, b)")
        VectorCosine(es(0), es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("vec_dot",
      (es: Seq[Expression]) => { expectArity(es, 2, "vec_dot(a, b)")
        VectorDot(es(0), es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("sign_lsh",
      (es: Seq[Expression]) => { expectArity(es, 3, "sign_lsh(vec, planes, offset)")
        SignLshSignature(es(0),
          litInt(es(1), "planes"), litInt(es(2), "offset")) }, "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      (es: Seq[Expression]) => { expectArity(es, 2, "minhash_signature(shingles, numHashes)")
        MinHashSignature(es(0), litInt(es(1), "numHashes")) }, "scala_udf")
    reg.createOrReplaceTempFunction("pq_encode",
      (es: Seq[Expression]) => {
        require(es.length == 2 || es.length == 3,
          s"pq_encode(vec, codebook[, normalize]) takes 2-3 args, got ${es.length}")
        val (cb, m, ksub) = foldCodebook(es(1))
        PqEncode(es(0), cb, m, ksub, asInts = false,
          normalize = es.lift(2).forall(litBoolArg(_, "normalize"))) }, "scala_udf")
    reg.createOrReplaceTempFunction("pq_encode_ints",
      (es: Seq[Expression]) => {
        require(es.length == 2 || es.length == 3,
          s"pq_encode_ints(vec, codebook[, normalize]) takes 2-3 args, got ${es.length}")
        val (cb, m, ksub) = foldCodebook(es(1))
        PqEncode(es(0), cb, m, ksub, asInts = true,
          normalize = es.lift(2).forall(litBoolArg(_, "normalize"))) }, "scala_udf")
    reg.createOrReplaceTempFunction("ivf_residual",
      (es: Seq[Expression]) => { expectArity(es, 3, "ivf_residual(vec, list_id, centroids)")
        val (cents, dim) = foldCentroids(es(2))
        IvfResidual(es(0), es(1), cents, dim) }, "scala_udf")
    reg.createOrReplaceTempFunction("pq_lut",
      (es: Seq[Expression]) => { expectArity(es, 2, "pq_lut(probe_vec, codebook)")
        val (cb, m, ksub) = foldCodebook(es(1))
        PqLut(es(0), cb, m, ksub) }, "scala_udf")
    reg.createOrReplaceTempFunction("pq_adc",
      (es: Seq[Expression]) => { expectArity(es, 2, "pq_adc(code, lut)")
        PqAdc(es(0), es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("nano_fold",
      (es: Seq[Expression]) => { expectArity(es, 2, "nano_fold(fs, weights)")
        NanoFold(es(0), foldLongArray(es(1), "weights")) }, "scala_udf")
  }

  /** Column helpers; register on the active session lazily. */
  def vec_cosine(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function("vec_cosine", a, b)
  }
  def vec_dot(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function("vec_dot", a, b)
  }
  def sign_lsh(vec: Column, planes: Int, offset: Int): Column = {
    import org.apache.spark.sql.functions.lit
    register(SparkSession.active)
    call_function("sign_lsh", vec, lit(planes), lit(offset))
  }
  def minhash_signature(shingles: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.functions.lit
    register(SparkSession.active)
    call_function("minhash_signature", shingles, lit(numHashes))
  }
  def pq_encode(vec: Column, codebook: Seq[Seq[Seq[Float]]],
      normalize: Boolean = true): Column = {
    import org.apache.spark.sql.functions.{lit, typedLit}
    register(SparkSession.active)
    call_function("pq_encode", vec, typedLit(codebook), lit(normalize))
  }
  def pq_encode_ints(vec: Column, codebook: Seq[Seq[Seq[Float]]],
      normalize: Boolean = true): Column = {
    import org.apache.spark.sql.functions.{lit, typedLit}
    register(SparkSession.active)
    call_function("pq_encode_ints", vec, typedLit(codebook), lit(normalize))
  }
  def ivf_residual(vec: Column, listId: Column,
      centroids: Seq[Seq[Float]]): Column = {
    import org.apache.spark.sql.functions.typedLit
    register(SparkSession.active)
    call_function("ivf_residual", vec, listId, typedLit(centroids))
  }
  def pq_lut(probeVec: Column, codebook: Seq[Seq[Seq[Float]]]): Column = {
    import org.apache.spark.sql.functions.typedLit
    register(SparkSession.active)
    call_function("pq_lut", probeVec, typedLit(codebook))
  }
  def pq_adc(code: Column, lut: Column): Column = {
    register(SparkSession.active)
    call_function("pq_adc", code, lut)
  }
  def nano_fold(fs: Column, weights: Seq[Long]): Column = {
    import org.apache.spark.sql.functions.typedLit
    register(SparkSession.active)
    call_function("nano_fold", fs, typedLit(weights))
  }
}
