package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Regenerate q_text_classifier's pinned oracle: trains
  * `TextClassifier.train(documents, label = (lang = 'en'))` at the given
  * sfDir and prints the bias + non-zero weights as SQL VALUES rows, plus
  * the training accuracy. `runMain graft.tools.DumpClassifier [sfDir]`. */
object DumpClassifier {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the label is the rule-based language labeler's verdict — the
    // weak-supervision shape: a cheap labeler labels, the classifier
    // learns to reproduce it from hashed features
    val docs = graft.queries.Tables.t(spark, sfDir, "documents")
      .withColumn("label",
        (graft.functions.TextFunctions.langId(col("text")) === "en").cast("int"))
    // train on the labeled SLICE (%2), score the whole corpus — the
    // weak-supervision production shape, and what keeps training cost a
    // fifth of the corpus at any scale
    val (bNano, w) = graft.operators.TextClassifier.train(
      docs.filter(col("doc_id") % 2 === 0), "label")
    println(s"[classifier-bias] $bNano")
    println("[classifier-weights] " + w.zipWithIndex.collect {
      case (wn, f) if wn != 0L => s"($f,$wn)"
    }.mkString(","))
    val scoredAcc = graft.operators.TextClassifier
      .score(docs, bNano, w.toSeq)
      .join(docs.select(col("doc_id"), col("label")), "doc_id")
      .select(avg((col("predicted") === col("label").cast("long")).cast("double")))
      .head.getDouble(0)
    println(f"[classifier-train-accuracy] $scoredAcc%.4f")
    // the Hessian-free (Newton-CG) model at dim 2048 — q_text_classifier_cg's pins
    val (bCg, wCg) = graft.operators.TextClassifier.trainCG(
      docs.filter(col("doc_id") % 4 === 0), "label", dim = 2048, cgIters = 8)
    println(s"[classifier-cg-bias] $bCg")
    println("[classifier-cg-weights] " + wCg.zipWithIndex.collect {
      case (wn, f) if wn != 0L => s"($f,$wn)"
    }.mkString(","))
    val accCg = graft.operators.TextClassifier
      .score(docs, bCg, wCg.toSeq, dim = 2048)
      .join(docs.select(col("doc_id"), col("label")), "doc_id")
      .select(avg((col("predicted") === col("label").cast("long")).cast("double")))
      .head.getDouble(0)
    println(f"[classifier-cg-train-accuracy] $accCg%.4f")
    // the MULTICLASS (one-vs-rest) QUALITY-BUCKET model at dim 512 —
    // q_text_classifier_multi's pins: label = the heuristic quality
    // score's release bucket (the weak-supervision routing shape: a rule
    // scores a slice, the model learns to route the rest)
    val classes = Seq("low", "mid", "high")
    val q = graft.functions.TextFunctions.qualityScore(col("text"))
    val multi = docs.withColumn("lab",
      when(q < 0.6, "low").when(q < 0.7, "mid").otherwise("high"))
    val models = graft.operators.TextClassifier.trainMulti(
      multi.filter(col("doc_id") % 2 === 0), "lab", classes, cgIters = 8)
    println("[classifier-multi-bias] " + models.zipWithIndex.map {
      case ((c, b, _), i) => s"('$c',$i,$b)"
    }.mkString(","))
    println("[classifier-multi-weights] " + models.flatMap { case (c, _, w) =>
      w.zipWithIndex.collect { case (wn, f) if wn != 0L => s"('$c',$f,$wn)" }
    }.mkString(","))
    val accMulti = graft.operators.TextClassifier
      .scoreMulti(multi, models.map { case (c, b, w) => (c, b, w.toSeq) })
      .join(multi.select(col("doc_id"), col("lab")), "doc_id")
      .select(avg((col("predicted") === col("lab")).cast("double")))
      .head.getDouble(0)
    println(f"[classifier-multi-train-accuracy] $accMulti%.4f")
    spark.stop()
  }
}
