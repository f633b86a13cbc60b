package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextClassifier

/** The IRLS-trained hashed-ngram text classifier: separates a planted
 *  marker vocabulary, trains bit-deterministically, reproduces the
 *  rule-based language labeler on real corpus text, and hashes features
 *  identically to the SQL oracle's md5 formulation. */
class ClassifierSpec extends SparkSpec {

  test("features: unigrams + bigrams, distinct presence, empty docs vanish") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta alpha"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val f = TextClassifier.features(docs)
    // doc 1: unigrams {alpha, beta} + bigrams {alpha beta, beta alpha} = 4
    // distinct grams (the repeated 'alpha' dedupes); doc 2: 1; doc 3: none
    val counts = f.groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 4L, 2L -> 1L))
    assert(f.agg(min("f"), max("f")).head match {
      case r => r.getLong(0) >= 0 && r.getLong(1) < 512
    })
  }

  test("train separates a planted marker vocabulary and scores it ~certain") {
    import spark.implicits._
    // class 1 docs carry 'goodmark', class 0 docs 'badmark'; shared filler
    val docs = (0 until 40).map { i =>
      val mark = if (i % 2 == 0) "goodmark" else "badmark"
      (i.toLong, s"common filler words here $mark tail token t$i", (i + 1) % 2)
    }.toDF("doc_id", "text", "label")
    val (b, w) = TextClassifier.train(docs, "label", rounds = 2)
    val scored = TextClassifier.score(docs, b, w.toSeq)
      .join(docs.select(col("doc_id"), col("label").cast("long").as("y")), "doc_id")
    val acc = scored.agg(avg((col("predicted") === col("y")).cast("double")))
      .head.getDouble(0)
    assert(acc === 1.0, s"marker vocabulary should separate perfectly, got $acc")
    // and the margins are confident, not coin flips
    val probs = scored.select(col("y"), col("prob")).collect()
    probs.foreach { r =>
      if (r.getLong(0) == 1L) assert(r.getDouble(1) > 0.9)
      else assert(r.getDouble(1) < 0.1)
    }
  }

  test("training is bit-deterministic across runs and repartitionings") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
      .withColumn("label", (TextFunctions.langId(col("text")) === "en").cast("int"))
    val (b1, w1) = TextClassifier.train(docs, "label")
    val (b2, w2) = TextClassifier.train(docs.repartition(7), "label")
    assert(b1 === b2)
    assert(w1.toSeq === w2.toSeq)
  }

  test("trainCG at dim 16384: separates, bit-deterministic across repartitionings, bounded wall") {
    import spark.implicits._
    val docs = (0 until 60).map { i =>
      val mark = if (i % 2 == 0) "goodmark" else "badmark"
      (i.toLong, s"common filler words here $mark tail token t$i", (i + 1) % 2)
    }.toDF("doc_id", "text", "label")
    val t0 = System.nanoTime()
    val (b1, w1) = TextClassifier.trainCG(docs, "label", dim = 16384)
    val wall = (System.nanoTime() - t0) / 1e9
    // the DENSE path at this dim would collect a (16385)² Hessian and run
    // a 2.1e12-flop solve; CG must stay interactive
    assert(wall < 120.0, s"dim-16384 CG training took ${wall}s")
    val (b2, w2) = TextClassifier.trainCG(docs.repartition(13), "label", dim = 16384)
    assert(b1 === b2)
    assert(w1.toSeq === w2.toSeq)
    val scored = TextClassifier.score(docs, b1, w1.toSeq, dim = 16384)
      .join(docs.select(col("doc_id"), col("label").cast("long").as("y")), "doc_id")
    val acc = scored.agg(avg((col("predicted") === col("y")).cast("double")))
      .head.getDouble(0)
    assert(acc === 1.0, s"marker vocabulary should separate perfectly, got $acc")
  }

  test("trainCG agrees with the dense IRLS solver at dim 512") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
      .withColumn("label", (TextFunctions.langId(col("text")) === "en").cast("int"))
    val y = docs.select(col("doc_id"), col("label").cast("long").as("y"))
    val (bd, wd) = TextClassifier.train(docs, "label")
    val (bc, wc) = TextClassifier.trainCG(docs, "label", dim = 512)
    // different solvers for the same convex objective: identical bits are
    // not expected, but the decision function must be the same in practice
    val dense = TextClassifier.score(docs, bd, wd.toSeq).select(col("doc_id"),
      col("predicted").as("pd"))
    val cg = TextClassifier.score(docs, bc, wc.toSeq).select(col("doc_id"),
      col("predicted").as("pc"))
    val agree = dense.join(cg, "doc_id")
      .agg(avg((col("pd") === col("pc")).cast("double"))).head.getDouble(0)
    assert(agree >= 0.95, s"dense/CG prediction agreement $agree")
    val accCg = cg.join(y, "doc_id")
      .agg(avg((col("pc") === col("y")).cast("double"))).head.getDouble(0)
    assert(accCg >= 0.9, s"CG train accuracy $accCg")
  }

  test("scoring is fully scan-local: zero exchanges in the plan") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
    val plan = TextClassifier.score(docs, 0L, Seq.fill(512)(1000L))
      .queryExecution.executedPlan.toString
    // the corpus-wide path must not shuffle the gram stream — at 100 TB
    // scoring touches every row; the model rides as a broadcast literal
    assert(!plan.contains("Exchange"), s"scoring plan shuffles:\n$plan")
  }

  test("trainMulti (batched, one job/iter for all heads) is bit-identical to K-sequential") {
    import spark.implicits._
    // three planted classes over shared filler; a modest dim keeps each
    // head's CG path exercised (incl. round-2 warm starts) in seconds
    val docs = (0 until 60).map { i =>
      val mark = i % 3 match {
        case 0 => "redmark"; case 1 => "bluemark"; case _ => "greenmark"
      }
      (i.toLong, s"common filler words here $mark tail token t$i", s"c${i % 3}")
    }.toDF("doc_id", "text", "lab")
    val classes = Seq("c0", "c1", "c2")
    val batched = TextClassifier.trainMulti(docs, "lab", classes,
      dim = 256, rounds = 2, cgIters = 8)
    val seq = TextClassifier.trainMultiSequential(docs, "lab", classes,
      dim = 256, rounds = 2, cgIters = 8)
    batched.zip(seq).foreach { case ((c1, b1, w1), (c2, b2, w2)) =>
      assert(c1 === c2)
      assert(b1 === b2, s"bias drifted for head $c1")
      assert(w1.toSeq === w2.toSeq, s"weights drifted for head $c1")
    }
    // and the heads actually separate the planted vocabulary
    val models = batched.map { case (c, b, w) => (c, b, w.toSeq) }
    val acc = TextClassifier.scoreMulti(docs, models, dim = 256)
      .join(docs.select(col("doc_id"), col("lab")), "doc_id")
      .agg(avg((col("predicted") === col("lab")).cast("double")))
      .head.getDouble(0)
    assert(acc === 1.0, s"planted 3-class vocabulary should separate, got $acc")
  }

  test("empty training frame yields zero weights, no throw (r17 array-reduce edge)") {
    // the r17 single-stage array reductions replaced collect() with an
    // RDD reduce; an empty frame can plan to a ZERO-partition RDD, where
    // reduce throws — the guards must return the all-zero sums the
    // collect() formulation produced (-> zero weights after the damped
    // solve, exactly the old result)
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Int)].toDF("doc_id", "text", "label")
    val (b, w) = TextClassifier.train(empty, "label", dim = 64)
    assert(b === 0L && w.forall(_ == 0L))
    val (bc, wc) = TextClassifier.trainCG(empty, "label", dim = 64, cgIters = 2)
    assert(bc === 0L && wc.forall(_ == 0L))
    val multi = TextClassifier.trainMulti(
      empty.withColumn("lab", col("label").cast("string")), "lab",
      classes = Seq("0", "1"), dim = 64, cgIters = 2)
    assert(multi.forall { case (_, mb, mw) => mb === 0L && mw.forall(_ == 0L) })
  }

  test("reproduces the rule-based language labeler on the sf0.01 corpus (acc >= 0.9)") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.01", "documents")
      .withColumn("label", (TextFunctions.langId(col("text")) === "en").cast("int"))
    val (b, w) = TextClassifier.train(docs, "label")
    val acc = TextClassifier.score(docs, b, w.toSeq)
      .join(docs.select(col("doc_id"), col("label").cast("long").as("y")), "doc_id")
      .agg(avg((col("predicted") === col("y")).cast("double")))
      .head.getDouble(0)
    assert(acc >= 0.9, s"train accuracy $acc")
  }

  test("nano_fold rejects out-of-range feature indexes with a named error") {
    import spark.implicits._
    val w = Seq(10L, 20L, 30L)
    val ok = Seq(Seq(0L, 2L, 2L)).toDF("fs")
      .select(graft.functions.VectorFunctions.nano_fold(col("fs"), w).as("v"))
      .collect().head.getLong(0)
    assert(ok === 70L)
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    Seq(Seq(3L), Seq(-1L)).foreach { bad =>
      val e = intercept[Throwable] {
        Seq(bad).toDF("fs")
          .select(graft.functions.VectorFunctions.nano_fold(col("fs"), w)).collect()
      }
      assert(msgs(e).contains("nano_fold"), s"unexpected error: ${msgs(e)}")
    }
  }
}
