package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Corpus
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/**
 * Corpus-preparation operators: BM25 against a hand-computed score, split
 * determinism, pack-boundary semantics, redaction, and the streaming ≡
 * batch sessionization equivalence (the batch side carries the DuckDB
 * oracle, so this transitively grounds the flatMapGroupsWithState path).
 */
class CorpusSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bm25: matches a hand-computed score; non-matching docs are absent") {
    val d = docs(
      0L -> "spark join spark runs",
      1L -> "stream stream stream stream",
      2L -> "nothing here at all")
    val out = Corpus.bm25Search(d, Seq("spark", "join", "stream"), topK = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out.keySet == Set(0L, 1L)) // doc 2 has score 0 → filtered

    // independent reimplementation of the formula (N=3, avgdl=4)
    val k1 = 1.2; val b = 0.75; val n = 3.0; val avgdl = 4.0
    def term(tf: Double, df: Double, dl: Double): Double =
      if (tf == 0) 0.0
      else math.log((n - df + 0.5) / (df + 0.5) + 1.0) *
        (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(0L)._1 == r6(term(2, 1, 4) + term(1, 1, 4) + term(0, 1, 4)))
    assert(out(1L)._1 == r6(term(4, 1, 4)))
    // ranks are dense from 1 in rounded-score-desc order
    assert(out.values.map(_._2).toSeq.sorted == Seq(1L, 2L))
  }

  test("bm25: plan has no cartesian product; stats row is broadcast; top-k is TakeOrdered") {
    val d = docs((0L to 50L).map(i => i -> s"spark join word$i stream"): _*)
    val q = Corpus.bm25Search(d, Seq("spark", "stream"), topK = 5)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Broadcast"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("hashSplit: deterministic, md5-grounded, ~75/12.5/12.5, order-independent") {
    val base = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    val split = Corpus.hashSplit(base, "doc_id")
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 2700 && counts("train") < 3300) // 75% ± noise
    assert(counts("val") > 350 && counts("test") > 350)
    // grounded in md5: recompute a few assignments on the driver
    val some = split.filter(col("doc_id") < 50).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    (0L until 50L).foreach { id =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val want =
        if (hex.head <= 'b') "train" else if (hex.head <= 'd') "val" else "test"
      assert(some(id) == want, s"id=$id hex=${hex.head}")
    }
    // shuffled input yields the identical assignment
    val reshuffled = Corpus.hashSplit(base.orderBy(rand(7)), "doc_id")
      .filter(col("doc_id") < 50).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reshuffled == some)
  }

  test("packSequences: concatenate-then-chop assignment by start offset") {
    import spark.implicits._
    // group g: costs 3000,3000,3000 with budget 4096 → start offsets
    // 0,3000,6000 → packs 0,0,1 (doc 2 straddles, doc 3 starts past 4096)
    val d = Seq(
      ("g", 1L, 3000L), ("g", 2L, 3000L), ("g", 3L, 3000L),
      ("h", 1L, 5000L), ("h", 2L, 100L))
      .toDF("lang", "doc_id", "cost")
    val out = Corpus.packSequences(d, "lang", "doc_id", "cost", 4096L)
      .select("lang", "doc_id", "pack_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out(("g", 1L)) == 0L && out(("g", 2L)) == 0L && out(("g", 3L)) == 1L)
    // an over-budget doc occupies its own start pack; the next doc starts
    // in the pack where the long doc ended (offset 5000 → pack 1)
    assert(out(("h", 1L)) == 0L && out(("h", 2L)) == 1L)
  }

  test("redact: emails and urls replaced with typed placeholders and counted") {
    import spark.implicits._
    val d = Seq((1L, "mail a.b@c.io and https://x.y/z plus plain text"))
      .toDF("id", "raw")
    val (red, ne, nu) = Corpus.redact(col("raw"))
    val r = d.select(red.as("r"), ne.as("e"), nu.as("u")).head()
    assert(r.getString(0) == "mail <EMAIL> and <URL> plus plain text")
    assert(r.getInt(1) == 1 && r.getInt(2) == 1)
  }

  test("sessionize: streaming (flatMapGroupsWithState) equals declarative batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(min: Long) = new Timestamp(min * 60000L)
    // user 1: two sessions split by a 100-min gap (both emit once the
    // watermark passes their end+gap — nothing emits early);
    // user 2: one session. Sentinel user 99 advances the watermark far
    // enough that every real session times out and is emitted.
    val real = Seq(
      Event(1, ts(1), 1, "click", 1.5),
      Event(2, ts(10), 1, "click", 2.5),
      Event(3, ts(110), 1, "view", 2.0),
      Event(4, ts(112), 1, "view", 4.0),
      Event(5, ts(115), 2, "click", 5.0))
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_eq").outputMode("append").start()
    try {
      mem.addData(real: _*)
      q.processAllAvailable()
      mem.addData(Event(90, ts(500), 99, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Event(91, ts(900), 99, "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_eq")
      .filter(col("user_id") =!= 99)
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .collect().map(_.toSeq).toSet
    val batch = EventStream.sessionizeBatch(real.toDS().toDF(), gapMinutes = 30)
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }

  test("removeBoilerplate strips cross-doc repeated lines, rebuilds order exactly") {
    val nav = "Home | About | Contact"
    val cookie = "We use cookies"
    val d = docs(
      (1L, s"$nav\nReal content one\n$cookie\nMore real text"),
      (2L, s"$nav\nCompletely different body\n$cookie"),
      (3L, s"$nav\nThird document line\nAnother unique line\n$cookie"),
      (4L, s"$nav\n$cookie")) // nothing but boilerplate → empty string
    val out = graft.operators.Corpus.removeBoilerplate(d, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq(
      "Real content one\nMore real text",
      "Completely different body",
      "Third document line\nAnother unique line",
      ""))
    // below the threshold nothing is touched — byte-for-byte identity,
    // including segment order and separators
    val untouched = graft.operators.Corpus.removeBoilerplate(d, minDocs = 5)
      .orderBy("doc_id").collect()
    assert(untouched.map(_.getString(1)).toSeq ==
      d.orderBy("doc_id").collect().map(_.getString(1)).toSeq)
    // a doc repeating its own line 3x does NOT make it boilerplate —
    // frequency is COUNT DISTINCT docs
    val selfRep = docs((1L, "same\nsame\nsame\nunique"), (2L, "other"))
    val kept = graft.operators.Corpus.removeBoilerplate(selfRep, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(kept.head.getString(1) == "same\nsame\nsame\nunique")
    // non-text columns ride through unchanged (frame shape preserved,
    // like the sibling Corpus operators)
    val withLang = d.withColumn("lang",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("l"), org.apache.spark.sql.functions.col("doc_id")))
    val shaped = graft.operators.Corpus.removeBoilerplate(withLang, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(shaped.head.schema.fieldNames.toSet == Set("doc_id", "text", "lang"))
    assert(shaped.map(_.getAs[String]("lang")).toSeq == Seq("l1", "l2", "l3", "l4"))
    assert(shaped.map(_.getAs[String]("text")).head == "Real content one\nMore real text")
  }

  test("removeBoilerplate keeps blank lines (paragraph structure is not boilerplate)") {
    val d = docs(
      (1L, "para one\n\npara two\nNav bar"),
      (2L, "different one\n\ndifferent two\nNav bar"))
    val out = graft.operators.Corpus.removeBoilerplate(d, minDocs = 2)
      .orderBy("doc_id").collect()
    // "Nav bar" (in both docs) goes; the empty segment between paragraphs stays
    assert(out.map(_.getString(1)).toSeq == Seq(
      "para one\n\npara two", "different one\n\ndifferent two"))
  }

  test("redact scrubs uppercase PII and stops URLs at any whitespace") {
    import spark.implicits._
    val df = Seq(
      "Contact John.Doe@Example.COM today",
      "see HTTPS://Host.com/x\nSecond line here").toDF("text")
    val (red, nEmail, nUrl) = graft.operators.Corpus.redact(org.apache.spark.sql.functions.col("text"))
    val rows = df.select(red.as("r"), nEmail.as("e"), nUrl.as("u")).collect()
    assert(rows(0).getString(0) == "Contact <EMAIL> today")
    assert(rows(0).getInt(1) == 1)
    // the URL match ends at the newline — "Second" survives
    assert(rows(1).getString(0) == "see <URL>\nSecond line here")
    assert(rows(1).getInt(2) == 1)
  }

  test("nearDupGroups works on STRING ids (no silent long cast)") {
    import spark.implicits._
    val pairs = Seq(("doc-a", "doc-b"), ("doc-b", "doc-c"), ("doc-x", "doc-y"))
      .toDF("id_a", "id_b")
    val g = graft.operators.Dedup.nearDupGroups(pairs)
      .orderBy("doc_id").collect()
    assert(g.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("doc-a", "doc-a"), ("doc-b", "doc-a"), ("doc-c", "doc-a"),
      ("doc-x", "doc-x"), ("doc-y", "doc-x")))
  }

  test("tokenBudgetMix: duplicate ids keep running-total (ROWS) semantics") {
    import spark.implicits._
    // a RANGE-framed cumsum (Spark's ORDER BY default) would give both tied
    // rows the combined peer total 1200 and drop BOTH; the running total
    // must keep exactly one at 600
    val df = Seq(("web", 1L, 600L), ("web", 1L, 600L))
      .toDF("source", "doc_id", "n_chars")
    val out = graft.operators.Corpus.tokenBudgetMix(
      df, "source", "doc_id", "n_chars", budget = 900L)
      .select("doc_id", "cum_cost").collect()
    assert(out.length == 1 && out.head.getLong(1) == 600L)
    // duplicate ids with DIFFERING costs: the cost joins the ordering, so
    // the smaller cost accumulates first on every run/engine — without the
    // tiebreak, which row survives budget 900 here would be run-dependent
    val df2 = Seq(("web", 1L, 900L), ("web", 1L, 100L))
      .toDF("source", "doc_id", "n_chars")
    val out2 = graft.operators.Corpus.tokenBudgetMix(
      df2, "source", "doc_id", "n_chars", budget = 900L)
      .select("cum_cost").collect()
    assert(out2.map(_.getLong(0)).toSeq == Seq(100L))
  }

  test("epochShuffle: null id and empty-string id get distinct sort keys") {
    import spark.implicits._
    // a plain coalesce-to-'' encoding would hash both identically and push
    // the divergence into the NULLS FIRST/LAST tiebreak across engines
    val df = Seq(Some(""), None).toDF("doc_id")
    val keys = graft.operators.Corpus.epochShuffle(df, "doc_id", 1L)
      .select("sort_key").collect().map(_.getString(0))
    assert(keys.toSet.size == 2)
  }

  test("epochShuffle: a permutation, deterministic per seed, different across seeds") {
    import spark.implicits._
    val df = spark.range(200).toDF("doc_id")
    val e1 = graft.operators.Corpus.epochShuffle(df, "doc_id", 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val e1b = graft.operators.Corpus.epochShuffle(df, "doc_id", 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val e2 = graft.operators.Corpus.epochShuffle(df, "doc_id", 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(e1 == e1b, "same seed must reproduce the same order")
    assert(e1.sorted == (0L until 200L) && e2.sorted == (0L until 200L),
      "every row appears exactly once")
    assert(e1 != e2, "different seeds must permute differently")
    assert(e1 != (0L until 200L).toSeq, "the permutation actually shuffles")
  }

  test("tokenBudgetMix: running total never exceeds the budget, order deterministic") {
    import spark.implicits._
    val df = (0 until 50).map(i => (if (i % 2 == 0) "web" else "code", i.toLong, 100L))
      .toDF("source", "doc_id", "n_chars")
    val out = graft.operators.Corpus.tokenBudgetMix(
      df, "source", "doc_id", "n_chars", budget = 900L)
      .select("source", "doc_id", "cum_cost")
    val rows = out.collect()
    // 25 docs x 100 chars per source, budget 900 → exactly 9 per source
    assert(rows.length == 18)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length == 9)
      assert(rs.map(_.getLong(2)).max == 900L)
    }
    // membership is hash-of-id determined, not id-ordered
    val kept = rows.map(_.getLong(1)).toSet
    assert(kept != (0L until 18L).toSet)
    val again = graft.operators.Corpus.tokenBudgetMix(
      df, "source", "doc_id", "n_chars", budget = 900L)
      .collect().map(_.getLong(1)).toSet
    assert(again == kept)
  }

  test("trainBpe: hand-computed merge sequence, lexicographic tie-break, early stop") {
    import spark.implicits._
    // words: ab ×3, abc ×2 → syms [a,b,</w>] wc3, [a,b,c,</w>] wc2
    // pairs: (a,b)=5, (b,</w>)=3, (b,c)=2, (c,</w>)=2     → merge 1: (a,b,5)
    // then [ab,</w>]/[ab,c,</w>]: (ab,</w>)=3, (ab,c)=2, (c,</w>)=2 → merge 2
    // then [ab</w>]/[ab,c,</w>]: (ab,c)=2 TIES (c,</w>)=2 → lexicographic:
    // "ab" < "c" → merge 3 = (ab,c,2); merge 4 = (abc,</w>,2); then no
    // pair remains → early stop despite numMerges=10
    val docs = Seq("ab ab", "ab abc", "abc").toDF("text")
    val got = Corpus.trainBpe(docs, numMerges = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === Seq(
      (1L, "a", "b", "ab", 5L),
      (2L, "ab", "</w>", "ab</w>", 3L),
      (3L, "ab", "c", "abc", 2L),
      (4L, "abc", "</w>", "abc</w>", 2L)))
  }

  test("trainBpe: greedy left-to-right non-overlapping merge inside a run") {
    import spark.implicits._
    // one word "aaaa" = [a,a,a,a,</w>]: (a,a) counts 3 adjacent positions;
    // the merge must yield non-overlapping [aa, aa, </w>] — then round 2
    // ties (aa,aa)=(aa,</w>)=1 and "</w>" < "aa" lexicographically, so the
    // full sequence pins both the greedy rewrite and the tie-break
    val docs = Seq("aaaa").toDF("text")
    val got = Corpus.trainBpe(docs, numMerges = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got === Seq((1L, "a", "a", 3L), (2L, "aa", "</w>", 1L), (3L, "aa", "aa</w>", 1L)))
  }

  test("bpeEncodeCounts: merges applied in rank order, per-doc subword totals") {
    import spark.implicits._
    // merges [(a,b),(ab,</w>)]: "ab"->[ab</w>] (1), "abc"->[ab,c,</w>] (3);
    // tokenless doc 4 counts zero
    val docs = Seq((1L, "ab ab"), (2L, "ab abc"), (3L, "abc"), (4L, ""))
      .toDF("doc_id", "text")
    val got = Corpus.bpeEncodeCounts(docs, Seq(("a", "b"), ("ab", "</w>")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 2L), (2L, 4L), (3L, 3L), (4L, 0L)))
    // and with NO merges every word is chars + marker
    val raw = Corpus.bpeEncodeCounts(docs, Seq.empty)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(raw === Seq((1L, 6L), (2L, 7L), (3L, 4L), (4L, 0L)))
  }

  // ---- independent BPE reference (naive Sennrich, recompute-from-scratch) —
  // a SECOND implementation sharing no code with Corpus.trainBpe's
  // incremental pair-index loop or mergeSym's fold, so a shared bug cannot
  // self-validate (the q_text_bpe pins alone only prove determinism)

  /** Naive greedy left-to-right merge: index scan with explicit skip —
   *  deliberately a different formulation from both applyMergeLocal (last-
   *  element rewrite) and mergeSym (HOF fold). */
  private def naiveRewrite(s: Array[String], a: String, b: String): Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { buf += (a + b); i += 2 }
      else { buf += s(i); i += 1 }
    }
    buf.toArray
  }

  /** Full-stats-recompute-per-round Sennrich trainer over a word-frequency
   *  table: O(vocab) per merge, fine for test sizes. */
  private def naiveBpe(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(Long, String, String, String, Long)] = {
    var words = wordCounts.map { case (w, c) =>
      ((w.map(_.toString) :+ "</w>").toArray, c) }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val stats = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((s, c) <- words; j <- 0 until s.length - 1)
        stats.updateWith((s(j), s(j + 1)))(v => Some(v.getOrElse(0L) + c))
      if (stats.isEmpty) done = true
      else {
        val ((a, b), n) = stats.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((rank.toLong, a, b, a + b, n))
        words = words.map { case (s, c) => (naiveRewrite(s, a, b), c) }
        rank += 1
      }
    }
    out.toSeq
  }

  test("trainBpe matches an independent naive Sennrich trainer on real corpus text") {
    // independent tokenization too: plain-Scala lowercase + [^a-z0-9]+ split
    val texts = graft.queries.Tables.t(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val wcs = texts.flatMap(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, o) => (w, o.length.toLong) }.toSeq
    val expected = naiveBpe(wcs, numMerges = 200)
    val got = Corpus.trainBpe(
        graft.queries.Tables.t(spark, sf, "documents"), numMerges = 200)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("bpeEncodeCounts matches independent per-word encoding under the trained merges") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
    val merges = Corpus.trainBpe(docs, numMerges = 50).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // independent encode: naiveRewrite per merge in rank order, per word
    def encodeLen(w: String): Long =
      merges.foldLeft((w.map(_.toString) :+ "</w>").toArray) {
        case (s, (a, b)) => naiveRewrite(s, a, b) }.length.toLong
    val expected = docs.select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      (r.getLong(0), toks.map(encodeLen).sum)
    }.sortBy(_._1).toSeq
    val got = Corpus.bpeEncodeCounts(docs, merges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("bpeEncode: token-id sequences under the deterministic vocab map") {
    import spark.implicits._
    // vocab: </w>=0, '0'..'9'=1..10, 'a'..'z'=11..36, then merges:
    // "ab"=37, "ab</w>"=38. "ab" -> [ab</w>] -> [38]; "abc" ->
    // [ab, c, </w>] -> [37, 13, 0]; empty doc -> []
    val docs = Seq((1L, "ab ab"), (2L, "abc"), (3L, "")).toDF("doc_id", "text")
    val got = Corpus.bpeEncode(docs, Seq(("a", "b"), ("ab", "</w>")))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toList
    assert(got === List((1L, List(38, 38)), (2L, List(37, 13, 0)), (3L, Nil)))
  }

  test("bpeEncode round-trips: lengths match counts, ids decode back to the token stream") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
    val merges = Corpus.trainBpe(docs, numMerges = 40).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val ids = Corpus.bpeEncode(docs, merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // every doc's id count equals the counts operator's subword count
    val counts = Corpus.bpeEncodeCounts(docs, merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids.keySet === counts.keySet)
    ids.foreach { case (d, seq) => assert(seq.length.toLong === counts(d), s"doc $d") }
    // and decoding the ids reproduces the normalized token stream exactly
    val inv = Corpus.bpeVocabIds(merges).map(_.swap)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (d, text) =>
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toList
      val decoded = ids(d).map(inv).mkString
        .split(java.util.regex.Pattern.quote("</w>")).filter(_.nonEmpty).toList
      assert(decoded === toks, s"doc $d")
    }
  }

  test("trainBpe at tokenizer-scale merge counts trains in seconds, not Spark rounds") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val t0 = System.nanoTime()
    val merges = Corpus.trainBpe(docs, numMerges = 5000).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // the sf0.01 vocab exhausts (every word one symbol) or reaches 5000
    // merges; either way the driver-side loop must be interactive-fast —
    // the former one-Spark-job-per-merge shape took ~0.1 s/merge
    assert(merges.length == 5000 || merges.length < 5000)
    assert(merges.nonEmpty && merges.map(_.getLong(0)).toSeq == (1L to merges.length).toSeq)
    assert(secs < 60.0, s"trainBpe(5000) took $secs s")
  }

  test("chunkDocs: overlapping windows, partial tail kept, contained tail dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (2L, "s0 s1 s2"),                      // shorter than one chunk
      (3L, "")                               // empty: no chunks
    ).toDF("doc_id", "text")
    val got = Corpus.chunkDocs(docs, chunkTokens = 5, overlap = 2)
      .orderBy("doc_id", "chunk_index") // the operator itself is sort-free
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    // doc 1, step 3: starts 0,3,6 — start 9's [t9] is inside [t6..t9], dropped
    assert(got === Seq(
      (1L, 0L, "t0 t1 t2 t3 t4", 5L),
      (1L, 1L, "t3 t4 t5 t6 t7", 5L),
      (1L, 2L, "t6 t7 t8 t9", 4L),
      (2L, 0L, "s0 s1 s2", 3L)))
    // no overlap: clean partition into ceil(n/chunk) windows
    val flat = Corpus.chunkDocs(docs.filter(col("doc_id") === 1L), 4)
      .orderBy("chunk_index")
      .collect().map(r => (r.getLong(1), r.getString(2))).toSeq
    assert(flat === Seq((0L, "t0 t1 t2 t3"), (1L, "t4 t5 t6 t7"), (2L, "t8 t9")))
  }

  test("removeRepeatedSpans drops cross-doc spans, keeps within-doc repetition") {
    import spark.implicits._
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel" // 8 tokens
    val docs = Seq(
      (1L, s"unique one two three $shared tail1 only"),
      (2L, s"different prefix words here $shared tail2 words"),
      // within-doc repetition of an 8-gram, but ONE doc → untouched
      (3L, "repeat seven words again now ok fine yes " +
        "repeat seven words again now ok fine yes"),
      (4L, "short doc"), // < 8 tokens → untouched
      (5L, "")).toDF("doc_id", "text")
    val out = Corpus.removeRepeatedSpans(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // the shared 8-gram vanishes from BOTH docs; surrounding tokens survive
    assert(out(1L) === "unique one two three tail1 only")
    assert(out(2L) === "different prefix words here tail2 words")
    assert(out(3L) === "repeat seven words again now ok fine yes " +
      "repeat seven words again now ok fine yes")
    assert(out(4L) === "short doc")
    assert(out(5L) === "")
  }

  test("removeRepeatedSpans merges overlapping duplicated grams into one span") {
    import spark.implicits._
    // 9 shared tokens → two overlapping duplicated 8-grams; coverage must
    // union to the 9 positions, not double-remove or leave a seam
    val span9 = "one two three four five six seven eight nine"
    val docs = Seq(
      (1L, s"head $span9 tail"),
      (2L, s"other words $span9 ending here")).toDF("doc_id", "text")
    val out = Corpus.removeRepeatedSpans(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "head tail")
    assert(out(2L) === "other words ending here")
  }

  test("removeRepeatedSpans: streaming distinct counter — many-doc grams and within-doc repeats") {
    import spark.implicits._
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel" // 8 tokens
    // 12 docs share the 8-gram (the run keeps STREAMING after the distinct
    // count reaches minDocs=2 — the r18 run-length counter's flow path)
    // and doc 1 carries it twice (equal ids are sort-adjacent and must
    // count ONCE toward the distinct total)
    val docs = (1L to 12L).map(i =>
      (i, if (i == 1L) s"$shared filler1 $shared" else s"pre$i $shared post$i"))
      .toDF("doc_id", "text")
    val out = Corpus.removeRepeatedSpans(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "filler1")
    (2L to 12L).foreach(i => assert(out(i) === s"pre$i post$i"))
  }
}
