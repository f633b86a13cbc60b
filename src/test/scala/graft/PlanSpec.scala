package graft

import graft.queries.Tables

/**
 * Physical-plan property assertions (the verifiable form of SURVEY §2's
 * EXPLAIN row — plan text is engine-specific so it can never be
 * DuckDB-oracled; what matters is that the plans are the ones we'd want
 * at 100 TB: pushed filters, broadcast dims, TakeOrdered top-k, no
 * accidental cartesian products).
 */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("EXPLAIN surface works via SQL") {
    Tables.registerAll(spark, sf)
    val rows = spark.sql(
      "EXPLAIN FORMATTED SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1")
      .collect()
    assert(rows.nonEmpty && rows.head.getString(0).contains("HashAggregate"))
  }

  test("q1_agg: filter is pushed to the parquet scan, agg is partial+final") {
    val p = planOf("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), "no partial aggregation")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_filter_compare: comparison predicates reach the scan") {
    // the plan string truncates long PushedFilters lists, so assert on the
    // leading pushed predicates rather than the full set
    val p = planOf("q_filter_compare")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), p.take(2000))
    assert(p.contains("(l_quantity") && p.contains("> 30.0"), "filter not in plan")
  }

  test("q_join_inner: dimension tables broadcast, no shuffle of the fact side") {
    val p = planOf("q_join_inner")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_topk plans TakeOrderedAndProject (no global sort)") {
    val p = planOf("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q_join_range stays an equi-join with a range residual (no nested loop)") {
    val p = planOf("q_join_range")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q_dedup_minhash: no cartesian products, candidate join is an equi-join") {
    val p = planOf("q_dedup_minhash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "minhash LSH must join on (band,bucket), never all-pairs")
  }

  test("q_dedup_embedding: banded LSH join is an equi-join on (table,signature)") {
    val p = planOf("q_dedup_embedding")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("projection pruning: 2-column query reads 2 columns from parquet") {
    val p = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p.take(2000))
  }

  test("whole-stage codegen covers the scalar pipeline") {
    // AQE shows codegen spans only in the FINAL plan — execute first
    val df = SparkEntry.queries("q_string_funcs")(spark, sf)
    df.queryExecution.toRdd.count()
    // codegen spans render as "*(n) " in the simple plan string
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), s"scalar query fell out of codegen:\n${p.take(800)}")
  }
}
