package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}

import graft.queries.Tables

/**
 * Bucketed co-located joins: both fact tables written bucketed+sorted on the
 * join key → the equi-join plans bucket-to-bucket with NO Exchange on either
 * side. This is the layout-for-joins half of the scale story (broadcast
 * covers small dims; bucketing covers fact⋈fact).
 */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans no shuffle under the join") {
    // at sf0.001 the small side would be broadcast (also shuffle-free, but
    // not the path under test) — force the merge-join path the plan takes
    // when BOTH sides are too big to broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = SparkEntry.queries("q_join_bucketed")(spark, sf)
      q.queryExecution.toRdd.count() // finalize AQE
      // TreeNode.collect stops at AQE query-stage boundaries — walk through
      def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case s: QueryStageExec => allNodes(s.plan)
        case other => other.children.flatMap(allNodes)
      })
      val nodes = allNodes(q.queryExecution.executedPlan)
      val joins = nodes.collect { case j: SortMergeJoinExec => j }
      assert(joins.nonEmpty, s"expected a SortMergeJoin, got:\n${nodes.head}")
      val shufflesUnderJoin = allNodes(joins.head).filter(n =>
        n.isInstanceOf[ShuffleExchangeExec] || n.isInstanceOf[ShuffleQueryStageExec])
      assert(shufflesUnderJoin.isEmpty,
        s"bucketed join must not shuffle either side:\n${joins.head}")
      assert(joins.head.toString.contains("Bucketed: true"), "scan is not bucket-aware")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join result equals the plain join") {
    val viaBuckets = SparkEntry.queries("q_join_bucketed")(spark, sf).collect()
    val l = Tables.t(spark, sf, "lineitem")
    val o = Tables.t(spark, sf, "orders")
    val plain = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_lines"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum("l_extendedprice"), 2).as("revenue"))
      .orderBy("o_orderpriority").collect()
    assert(viaBuckets.toSeq == plain.toSeq)
  }
}
