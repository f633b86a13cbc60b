package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Multimodal
import graft.queries.Tables

/** Text-pipeline and multimodal-plumbing specs. */
class TextSpec extends SparkSpec {

  lazy val docs = Tables.t(spark, sf, "documents")

  // NOTE: the generator's documents are the same keyword soup for every
  // `lang` label (verified by inspection), so the label is NOT a usable
  // ground truth. Golden sentences per language are.
  test("language ID: golden sentences per supported language + und fallback") {
    val df = spark.createDataFrame(Seq(
      (1, "the cat sat on the mat and looked at the dog for a while", "en"),
      (2, "der Hund ist nicht mit der Katze auf das Sofa gegangen und bleibt", "de"),
      (3, "le chat est dans la maison et les enfants sont pour une heure dans le jardin", "fr"),
      (4, "el perro es grande y no come por la mañana para una hora", "es"),
      (5, "zzz qqq 12345", "und"),
      (6, "", "und"))).toDF("id", "t", "expected")
    val out = df.select(col("expected"), TextFunctions.langId(col("t")).as("got")).collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)}, got ${r.getString(1)}"))
  }

  test("token counts: golden cases") {
    val df = spark.createDataFrame(Seq(
      (1, "Hello, world! This is a test."),
      (2, ""),
      (3, "   "),
      (4, "one-two three_four"))).toDF("id", "t")
    val out = df.select(col("id"), TextFunctions.tokenCount(col("t")).as("n"))
      .orderBy("id").collect().map(_.getInt(1)).toSeq
    // "one-two three_four" → one, two, three, four (non-alnum splits)
    assert(out == Seq(6, 0, 0, 4))
  }

  test("word shingles: golden trigrams, distinct, short-doc fallback") {
    val df = spark.createDataFrame(Seq(
      (1, "a b c d e"),
      (2, "x y"),
      (3, "w w w w"))).toDF("id", "t")
    val out = df.select(col("id"), TextFunctions.wordShingles(col("t"), 3).as("sh"))
      .orderBy("id").collect().map(_.getSeq[String](1).toSet)
    assert(out(0) == Set("a b c", "b c d", "c d e"))
    assert(out(1) == Set("x y")) // fewer than n tokens → one short shingle
    assert(out(2) == Set("w w w")) // distinct collapses repeats
  }

  test("quality score is in [0,1] and orders empty < normal text") {
    val df = spark.createDataFrame(Seq(
      (1, "The quick brown fox jumps over the lazy dog and keeps running for a while longer."),
      (2, "x"),
      (3, "!!!! ???? ####"))).toDF("id", "t")
    val out = df.select(col("id"), TextFunctions.qualityScore(col("t")).as("q"))
      .orderBy("id").collect().map(_.getDouble(1))
    out.foreach(q => assert(q >= 0.0 && q <= 1.0))
    assert(out(0) > out(1) && out(0) > out(2))
  }

  test("multimodal: stubbed decode is deterministic and batched shape is real") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticAssets(spark, docs))
    val rows = feats.collect()
    assert(rows.length == docs.count())
    rows.foreach { f =>
      assert(f.features.length == Multimodal.MediaCodecStub.FeatureDim)
      assert(Set("image", "audio", "video").contains(f.media_type))
    }
    // determinism: same input → same checksum+features
    val again = Multimodal.extractFeatures(Multimodal.syntheticAssets(spark, docs))
      .collect().map(f => (f.asset_id, f.checksum, f.features.toSeq)).toSet
    assert(again == rows.map(f => (f.asset_id, f.checksum, f.features.toSeq)).toSet)
    // summary query groups per media type
    val summary = Multimodal.featureSummary(spark, docs).collect()
    assert(summary.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
  }

  test("bpe-ish token count >= word token count (punctuation counted)") {
    val scored = docs.limit(50).select(
      TextFunctions.tokenCount(col("text")).as("words"),
      TextFunctions.tokenCountBpeish(col("text")).as("bpeish")).collect()
    scored.foreach(r => assert(r.getInt(1) >= r.getInt(0)))
  }
}
