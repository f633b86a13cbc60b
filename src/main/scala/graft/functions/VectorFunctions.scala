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

  private[graft] def litIntArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }
  private def litInt(e: Expression, what: String): Int = litIntArg(e, what)

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
}
