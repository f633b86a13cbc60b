package graft

import org.apache.spark.sql.functions._

import graft.operators.LanguageModel

/** Char-trigram LM scoring: hand-computed probabilities, smoothing
 *  fallback for unseen n-grams, and the fluency ordering the filter
 *  exists for. */
class LanguageModelSpec extends SparkSpec {

  test("scores match the closed-form smoothed log-probs") {
    import spark.implicits._
    val ref = Seq((1L, "aaaa")).toDF("doc_id", "text") // tc(aaa)=2, bc(aa)=2
    val out = LanguageModel.scoreDocs(
        Seq((10L, "aaaa"), (11L, "bbbb"), (12L, "ab")).toDF("doc_id", "text"), ref)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val seen = math.log((2 + 0.5) / (2 + 0.5 * 37))
    val unseen = math.log(0.5 / (0.5 * 37))
    assert(out(10L) === ((math.rint(seen * 1e6) / 1e6, 2L)))
    assert(out(11L) === ((math.rint(unseen * 1e6) / 1e6, 2L)))
    assert(!out.contains(12L)) // too short for a trigram: excluded, not zero
  }

  test("reference-like text outscores gibberish on the real corpus") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val ref = docs.filter(col("doc_id") % 3 === 0)
    import spark.implicits._
    val probes = Seq(
      (9000001L, "the system reads the stream and writes the table"),
      (9000002L, "zzqx vvkj qqzz xkcv jjww zzqq xxvv kkjj")).toDF("doc_id", "text")
    val scored = LanguageModel.scoreDocs(probes, ref)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(9000001L) > scored(9000002L),
      s"fluent ${scored(9000001L)} should beat gibberish ${scored(9000002L)}")
  }

  test("the scoring plan broadcasts both trained-count joins (no corpus-wide shuffle join)") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    // AQE wraps the plan in adaptive stages the TreeNode collect can't see
    // through before execution (SketchSpec's note) — assert the static plan
    spark.conf.set("spark.sql.adaptive.enabled", false)
    val plan =
      try LanguageModel.scoreDocs(docs, docs.filter(col("doc_id") % 3 === 0))
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", true)
    // the operator returns its result persisted (materializeThenFree), so
    // the join plan sits under an InMemoryTableScan — recurse into it
    def count(p: org.apache.spark.sql.execution.SparkPlan, pred: Any => Boolean): Int =
      p.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          count(m.relation.cachedPlan, pred)
        case n if pred(n) => 1
      }.sum
    val bhj = count(plan, _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
    val smj = count(plan, _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])
    val shj = count(plan, _.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec])
    assert(bhj === 2, s"want both count joins broadcast, got $bhj broadcast / $smj SMJ / $shj SHJ")
    assert(smj + shj === 0, "a trained-model join must never shuffle the trigram stream")
  }

  test("normalization collapses runs and trims, matching the oracle's regex") {
    import spark.implicits._
    val n = Seq("  Héllo,,  World!42  ").toDF("t")
      .select(LanguageModel.normalize(col("t"))).head.getString(0)
    assert(n === "h llo world 42")
  }
}
