package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Multimodal
import graft.queries.Tables

/** Text-pipeline and multimodal-plumbing specs. */
class TextSpec extends SparkSpec {

  test("kernel misuse fails at analysis/registration, not in tasks") {
    import graft.functions.{TextKernels, VectorFunctions}
    TextKernels.register(spark)
    VectorFunctions.register(spark)
    spark.range(3).selectExpr("cast(id as string) AS t", "id AS n")
      .createOrReplaceTempView("tk_misuse")
    // wrong-typed argument: AnalysisException (checkInputDataTypes), never
    // a task-side ClassCastException
    for (bad <- Seq(
        "SELECT simhash64(n) FROM tk_misuse",
        "SELECT quality_score(n) FROM tk_misuse",
        "SELECT word_shingles(n, 3) FROM tk_misuse",
        "SELECT vec_cosine(t, t) FROM tk_misuse",
        "SELECT minhash_signature(t, 4) FROM tk_misuse"))
      intercept[org.apache.spark.sql.AnalysisException] { spark.sql(bad).collect() }
    // wrong arity: rejected by the builder, not silently dropped
    for (bad <- Seq(
        "SELECT simhash64(t, t) FROM tk_misuse",
        "SELECT word_shingles(t) FROM tk_misuse",
        "SELECT vec_cosine(t) FROM tk_misuse"))
      intercept[Exception] { spark.sql(bad).collect() }
    // non-positive kernel parameters: rejected at construction
    intercept[Exception] {
      spark.sql("SELECT winnow_fingerprints(t, 5, 0) FROM tk_misuse").collect() }
    intercept[Exception] {
      spark.sql("SELECT word_shingles(t, 0) FROM tk_misuse").collect() }
  }

  test("minhash skips null shingle slots instead of dying") {
    import graft.functions.VectorFunctions
    VectorFunctions.register(spark)
    val sig = spark.sql(
      "SELECT minhash_signature(array('a', CAST(NULL AS STRING), 'b'), 4) AS s")
      .head().getSeq[Long](0)
    val ref = spark.sql(
      "SELECT minhash_signature(array('a', 'b'), 4) AS s").head().getSeq[Long](0)
    assert(sig == ref, "null slot must contribute nothing")
  }

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

  test("shingle kernel is element-identical to the Column-function definition") {
    // corpus sample + adversarial edges: empty, punctuation-only, exactly n,
    // under n, repeats, mixed case/separators
    val edges = spark.createDataFrame(Seq(
      (9001L, ""), (9002L, "  !?  "), (9003L, "One Two three"),
      (9004L, "solo"), (9005L, "a a a a a"), (9006L, "A-b_c d,e f.g h"))
    ).toDF("doc_id", "text")
    val sample = docs.limit(200).select("doc_id", "text").union(edges)
    for (n <- Seq(2, 3, 5)) {
      val both = sample.select(
        TextFunctions.wordShingles(col("text"), n).as("kernel"),
        TextFunctions.wordShinglesColumns(col("text"), n).as("columns")).collect()
      both.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n kernel=${r.getSeq[String](0)} columns=${r.getSeq[String](1)}")
      }
    }
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

  test("quality kernel is value-identical to the Column-function formulation") {
    val both = docs.limit(200).select(
      TextFunctions.qualityScore(col("text")).as("kernel"),
      TextFunctions.qualityScoreHof(col("text")).as("hof")).collect()
    both.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
      s"kernel=${r.getDouble(0)} hof=${r.getDouble(1)}"))
  }

  test("simhash kernel matches the explode+majority-vote definition") {
    import graft.functions.TextKernels
    val expected = {
      // definitional formulation: explode token hashes, per-bit ±1 sums
      val toks = docs.limit(50).select(col("doc_id").as("id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
        .withColumn("h", xxhash64(col("tok")))
      val bitSums = (0 until 64).map { k =>
        sum(when(col("h").bitwiseAND(lit(1L << k)) =!= 0, 1).otherwise(-1)).as(s"b$k")
      }
      val fp = (0 until 64).map { k =>
        when(col(s"b$k") > 0, lit(1L << k)).otherwise(0L)
      }.reduce(_.bitwiseOR(_))
      toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
        .select(col("id"), fp.as("simhash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val kernel = docs.limit(50).select(col("doc_id"),
      TextKernels.simhash64(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel == expected)
  }

  test("image codec: known 2x2 image decodes to the exact expected feature vector") {
    import graft.operators.Multimodal.ImageCodec
    // 2x2: TL=red TR=green BL=blue BR=white
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val f = ImageCodec.embed(ImageCodec.decode(ImageCodec.encodePng(img)))
    // means: R=(255+0+0+255)/4/255=0.5 (same for G,B); luma weights sum to 1
    // so meanLuma=0.5; quadrants are single pixels → their luma weights
    val expected = Seq(0.5f, 0.5f, 0.5f, 0.5f, 0.299f, 0.587f, 0.114f, 1.0f)
    f.toSeq.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-6, s"got ${f.toSeq}, want $expected")
    }
    // real resize: a solid-color image stays solid at any size
    val red = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 2).foreach(y => (0 until 2).foreach(x => red.setRGB(x, y, 0xff0000)))
    val resized = ImageCodec.embed(ImageCodec.decode(
      ImageCodec.resizePng(ImageCodec.encodePng(red), 7, 5)))
    assert(math.abs(resized(0) - 1.0f) < 1e-6 && resized(1) == 0.0f && resized(2) == 0.0f)
  }

  test("audio codec: WAV roundtrip is exact; known tone yields expected features") {
    import graft.operators.Multimodal.AudioCodec
    val pcm = AudioCodec.synthesizePcm(0, 8000) // 1s of 200 Hz at amp 8000
    assert(AudioCodec.decode(AudioCodec.encodeWav(pcm)).toSeq == pcm.toSeq)
    val f = AudioCodec.embed(pcm)
    val rms = 8000.0 / math.sqrt(2) / 32768.0 // sine rms = amp/sqrt(2)
    assert(math.abs(f(0) - rms) < 1e-3, s"rms ${f(0)} want $rms")
    // 200 periods in 1s → ~400 sign changes → zcr ~0.05
    assert(math.abs(f(1) - 0.05) < 0.005, s"zcr ${f(1)}")
    assert(f(2) > 0.24 && f(2) <= 8000f / 32768f, s"peak ${f(2)}")
    assert(math.abs(f(3) - 0.5) < 1e-3, s"mean ${f(3)}") // symmetric wave
    (4 until 8).foreach(q => assert(math.abs(f(q) - rms) < 2e-3, s"q$q ${f(q)}"))
  }

  test("video codec: GIF clip roundtrips frames; frame-sample really drops frames") {
    import graft.operators.Multimodal.VideoCodec
    val clip = VideoCodec.synthesizeGif(5L, 16, 12, 6)
    val frames = VideoCodec.decodeFrames(clip)
    assert(frames.length == 6)
    assert(frames.forall(f => f.getWidth == 16 && f.getHeight == 12))
    // consecutive synthetic frames differ → motion feature is non-zero
    val f = VideoCodec.embed(frames)
    assert(f(0) == 6 / 30.0f && f(5) > 0f, f.toSeq.toString)
    assert(f(6) == 16 / 64.0f && f(7) == 12 / 64.0f)
    // re-encode every 2nd frame and DECODE AGAIN: the container really holds 3
    val sampled = VideoCodec.encodeGif(frames.zipWithIndex.collect {
      case (fr, i) if i % 2 == 0 => fr
    })
    assert(VideoCodec.decodeFrames(sampled).length == 3)
    // deterministic encode
    assert(VideoCodec.synthesizeGif(5L, 16, 12, 6).toSeq == clip.toSeq)
  }

  test("multimodal: decode is deterministic and batched shape is real") {
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

  test("multimodal: an undecodable payload degrades to the byte-projection " +
      "fallback instead of killing the task") {
    import spark.implicits._
    val garbage = "not a PNG at all".getBytes("UTF-8")
    val assets = Seq(
      Multimodal.MediaAsset(1L, "image", garbage, 0, 0, 0),
      Multimodal.MediaAsset(2L, "audio", garbage, 0, 0, 0),
      Multimodal.MediaAsset(3L, "video", garbage, 0, 0, 0)).toDS()
    val feats = Multimodal.extractFeatures(assets).collect().sortBy(_.asset_id)
    assert(feats.length == 3)
    val expected = Multimodal.MediaCodecStub.decodeAndEmbed(garbage).toSeq
    feats.foreach { f =>
      assert(f.features.toSeq == expected, f.media_type)
      assert(f.checksum == Multimodal.MediaCodecStub.checksum(garbage))
    }
  }

  test("multimodal resize and frame-sample keep metadata and payload consistent") {
    val assets = Multimodal.syntheticAssets(spark, docs.limit(100))
    val resized = Multimodal.resize(assets, 64, 64).collect()
    resized.foreach { a =>
      assert(a.width == 64 && a.height == 64)
      assert(a.payload.length >= 16)
    }
    val sampled = Multimodal.frameSample(Multimodal.resize(assets, 64, 64), 5).collect()
    sampled.filter(_.media_type == "video").foreach { a =>
      assert(a.n_frames >= 1 && a.n_frames <= 6) // 1..30 frames → ceil(n/5)
    }
    sampled.filterNot(_.media_type == "video").foreach(a => assert(a.n_frames >= 1))
    // deterministic
    val again = Multimodal.frameSample(Multimodal.resize(assets, 64, 64), 5).collect()
    assert(again.map(a => (a.asset_id, a.n_frames, a.payload.toSeq)).toSet ==
      sampled.map(a => (a.asset_id, a.n_frames, a.payload.toSeq)).toSet)
  }

  test("winnowing fingerprints: identical docs match fully, shared substrings surface") {
    import graft.functions.TextKernels
    val df = spark.createDataFrame(Seq(
      (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3, "INTRO text then the quick brown fox jumps over the lazy dog END part"),
      (4, "completely different content with no overlap at all in these words here"),
      (5, "ab"))) // shorter than k → empty fingerprint set
      .toDF("id", "t")
    val fp = df.select(col("id"), TextKernels.winnow_fingerprints(col("t")).as("fp"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fp(1) == fp(2)) // identical text → identical fingerprints
    assert((fp(1) & fp(3)).nonEmpty, "40-char shared substring must surface")
    assert((fp(1) & fp(4)).isEmpty, "disjoint text should share nothing")
    assert(fp(5).isEmpty)
    // density: ~2/(w+1) of positions, never empty for real docs
    val real = docs.limit(100).select(
      size(TextKernels.winnow_fingerprints(col("text"))).as("n"),
      length(col("text")).as("len")).collect()
    real.foreach { r =>
      assert(r.getInt(0) > 0 && r.getInt(0) <= r.getInt(1))
    }
  }

  test("bpe-ish token count >= word token count (punctuation counted)") {
    val scored = docs.limit(50).select(
      TextFunctions.tokenCount(col("text")).as("words"),
      TextFunctions.tokenCountBpeish(col("text")).as("bpeish")).collect()
    scored.foreach(r => assert(r.getInt(1) >= r.getInt(0)))
  }
}
