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

  private def planOf(name: String): String = {
    SparkEntry.prepares.get(name).foreach(_(spark, sf))
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
  }

  test("EXPLAIN surface works via SQL") {
    Tables.registerAll(spark, sf)
    val rows = spark.sql(
      "EXPLAIN FORMATTED SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1")
      .collect()
    assert(rows.nonEmpty && rows.head.getString(0).contains("HashAggregate"))
  }

  test("runtime bloom filter: selective dim filter injects a bloom on the fact scan") {
    import org.apache.spark.sql.functions._
    // Spark's InjectRuntimeFilter builds a bloom from the filtered creation
    // side and applies it to the big side BEFORE the shuffle — the runtime
    // half of pushdown that matters at 100 TB (the static planner can't see
    // the dim filter's selectivity). Thresholds lowered so sf-scale tables
    // qualify; assert the bloom expression lands in the fact side's plan.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      // bloom injection targets SHUFFLE joins (a broadcast already filters);
      // force SMJ so the sf-scale fixture exercises the 100 TB-shaped plan
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      val ord = Tables.t(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      val q = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity"))
      val plan = q.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("bloom"), s"no runtime bloom filter in plan:\n${plan.take(1200)}")
      assert(q.collect().nonEmpty)
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
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

  test("q_ngram_jaccard: pair assembly is a join-free single-shuffle aggregation") {
    val df = SparkEntry.queries("q_ngram_jaccard")(spark, sf)
    df.queryExecution.toRdd.count() // finalize AQE
    // AQE toString repeats the tree as "Current Plan" + "Initial Plan" —
    // assert over the current one only
    val full = df.queryExecution.executedPlan.toString
    val p = full.split("== Initial Plan ==").head
    assert(!p.toLowerCase.contains("join"),
      "adjacent-pair jaccard must reassemble pairs via aggregation, not a self-join")
    // exactly one hash-partitioned exchange (the groupBy); the only other
    // exchange is the oracle-demanded final range sort
    val exchanges = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.count(_ == "hashpartitioning") == 1, s"exchanges=$exchanges")
  }

  test("whole-stage codegen covers the scalar pipeline") {
    // AQE shows codegen spans only in the FINAL plan — execute first
    val df = SparkEntry.queries("q_string_funcs")(spark, sf)
    df.queryExecution.toRdd.count()
    // codegen spans render as "*(n) " in the simple plan string
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), s"scalar query fell out of codegen:\n${p.take(800)}")
  }

  test("sweep: no accidental cartesian/nested-loop join in ANY declared query") {
    // every query's physical plan, mechanically — an operator added in a
    // later round cannot silently ship an O(n²) join. The allow-list names
    // the PROVEN-bounded exceptions: a deliberate cross join and the
    // ONE-row broadcast frames (BM25 stats row, roundtrip self-check
    // counts) whose nested-loop side is a single row by construction.
    val legitimate = Set(
      "q_join_cross",          // the cross-join operator itself (3×3 regions)
      "q_join_nonequi",        // pure non-equi join: no hash key exists; the
                               //   dim side is explicitly broadcast (bounded)
      "q_sim_bruteforce",      // brute-force ANN baseline: 5 probe vectors
                               //   broadcast against the corpus BY DESIGN
      "q_search_bm25",         // broadcast of a 1-row corpus-stats frame
      "q_zarr_roundtrip", "q_zarr_write_roundtrip", "q_zarr_shard_roundtrip",
      "q_zarr_binary_roundtrip", "q_zarr_v2_roundtrip",
      "q_zarr_stream_sink",
      "q_zarr_nd_roundtrip",   // 1-row self-check counts (round 9)
      "q_sim_ivf_at_rest",     // 1-row at-rest≡in-memory mismatch count
      "q_sim_ivfpq_at_rest",   // same 1-row self-check shape (IVF-PQ)
      "q_sim_ivfpq_residual",  // same 1-row self-check shape (residual PQ)
      "q_sim_ivf_retrain",     // same 1-row self-check shape, post-retrain
      "q_sim_filtered",        // same 1-row self-check shape (filtered ANN)
      "q_sim_recall",          // recall audit embeds the brute-force exact
                               //   pass BY DESIGN (10 probes broadcast) —
                               //   the thing the IVF result is graded against
      "q_sim_pq",              // ADC scan: 5 probe LUT rows broadcast against
                               //   the code column BY DESIGN (the PQ serving
                               //   shape); the rerank fetch is an equi-join
      "q_sim_pq_recall",       // same ADC shape ×3 models, plus the embedded
                               //   brute-force exact pass it is graded against
      "q_sim_calibrate",       // calibration IS a bounded all-pairs: the
                               //   broadcast self-join runs over the
                               //   hash-cut sample (≤ maxSampleRows, with a
                               //   hard k ≤ 2^22 require), never the corpus
      "q_mix_temperature")     // broadcast of the 1-row global weight-sum
                               //   frame (same proven-bounded shape as
                               //   q_search_bm25's corpus-stats row)
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(legitimate)
      .flatMap { name =>
        val p =
          try planOf(name)
          catch { case e: Exception =>
            throw new RuntimeException(s"query '$name' failed to plan", e) }
        if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    assert(offenders.isEmpty, s"accidental cartesian/nested-loop joins in: $offenders")
  }
}
