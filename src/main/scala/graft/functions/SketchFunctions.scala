package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{call_function, lit}

/**
 * Column wrappers over Spark's OWN bloom-filter expressions
 * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair the
 * optimizer uses for runtime row-level join filtering, reachable only
 * internally: neither is in the public FunctionRegistry). Registered
 * lazily as temp functions, same pattern as [[VectorFunctions]].
 *
 * The membership test takes the SERIALIZED filter as a foldable binary —
 * `BloomFilterMightContain` requires its filter side constant (literal or
 * scalar subquery), which is exactly the "small trained model on the
 * driver" shape [[graft.operators.Similarity]] uses for IVF codebooks: an
 * aggregate builds the filter (one binary, capped by
 * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`, default 8 MiB),
 * the driver collects it, and the scan-side test stays codegen'd with no
 * join and no broadcast table.
 */
object SketchFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bloom_agg",
      (es: Seq[Expression]) => {
        VectorFunctions.expectArity(es, 2, "bloom_agg(valueLong, estimatedItems)")
        new BloomFilterAggregate(es(0), es(1))
      }, "scala_udf")
    reg.createOrReplaceTempFunction("bloom_contains",
      (es: Seq[Expression]) => {
        VectorFunctions.expectArity(es, 2, "bloom_contains(bloomBinary, valueLong)")
        BloomFilterMightContain(es(0), es(1))
      }, "scala_udf")
  }

  /** Aggregate a LONG column into a serialized bloom filter (binary). */
  def bloom_agg(value: Column, estimatedItems: Long): Column = {
    register(SparkSession.active)
    call_function("bloom_agg", value, lit(estimatedItems))
  }

  /** Membership test of a LONG column against a collected filter binary:
   *  no false negatives, ~fpp false positives — callers verify hits
   *  exactly downstream when exactness matters. */
  def bloom_contains(bloom: Array[Byte], value: Column): Column = {
    register(SparkSession.active)
    call_function("bloom_contains", lit(bloom), value)
  }
}
