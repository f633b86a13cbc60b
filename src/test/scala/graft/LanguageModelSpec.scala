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

  test("the scoring plan is SCAN-LOCAL: no join, no exchange, no explode") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    // AQE wraps the plan in adaptive stages the TreeNode collect can't see
    // through before execution (SketchSpec's note) — assert the static plan
    spark.conf.set("spark.sql.adaptive.enabled", false)
    val plan =
      try LanguageModel.scoreDocs(docs, docs.filter(col("doc_id") % 3 === 0))
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.adaptive.enabled", true)
    // r17: the ≤37³-cell trained counts ride inside the lm_mean_logp
    // codegen kernel, so the path that scans the WHOLE corpus carries no
    // join (the old broadcast model joins), no trigram explode (|chars|
    // rows per doc), and no exchange at all
    assert(!plan.contains("Join"), s"scoring must not join:\n${plan.take(800)}")
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n${plan.take(800)}")
    assert(!plan.contains("Generate"), s"scoring must not explode:\n${plan.take(800)}")
    assert(plan.contains("lm_mean_logp"), "scoring should go through the kernel")
  }

  test("normalization collapses runs and trims, matching the oracle's regex") {
    import spark.implicits._
    val n = Seq("  Héllo,,  World!42  ").toDF("t")
      .select(LanguageModel.normalize(col("t"))).head.getString(0)
    assert(n === "h llo world 42")
  }

  test("lm_mean_logp guards: < 3 chars is null, non-normalized input fails loudly") {
    import spark.implicits._
    val tc = Seq.fill(37 * 37 * 37)(0L)
    // the operator path filters length >= 3 before the kernel; the
    // registered SQL surface takes arbitrary input (r17 ADVICE)
    val short = Seq("ab", "a", "").toDF("s")
      .select(graft.functions.TextKernels.lm_mean_logp(col("s"), tc).as("v"))
      .collect()
    assert(short.forall(_.isNullAt(0)))
    // exactly 3 normalized chars still scores (one trigram)
    val three = Seq("abc").toDF("s")
      .select(graft.functions.TextKernels.lm_mean_logp(col("s"), tc).as("v"))
      .collect()
    assert(!three.head.isNullAt(0))
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    val e = intercept[Throwable] {
      Seq("ABC!").toDF("s")
        .select(graft.functions.TextKernels.lm_mean_logp(col("s"), tc)).collect()
    }
    assert(msgs(e).contains("normalized"), s"unexpected error: ${msgs(e)}")
  }
}
