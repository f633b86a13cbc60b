package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupIndex}

/**
 * Long-running ingest soak: `runMain graft.tools.IngestSoakBench
 * [nBatches] [docsPerBatch] [compactAt]` (defaults 100 / 50 / 66).
 *
 * Drives [[DedupIndex.ingestStream]] through `nBatches` MemoryStream
 * micro-batches of deterministic drift-y documents (a sliding vocabulary
 * window, ~20% cross-batch duplicates of earlier docs, ~10% in-batch
 * duplicates), measuring what a production stream would care about:
 *
 *  - per-batch wall clock: flat once the index holds thousands of docs —
 *    the id-addressable corpus + partition-pruned index probe keep each
 *    micro-batch's cost batch-proportional, not corpus-proportional;
 *  - file-count accretion: one file-set per batch per path until the
 *    mid-run [[DedupIndex.compact]]/[[DedupIndex.compactCorpus]] pass
 *    (stream stopped, compacted, RESTARTED on the same checkpoint —
 *    also exercising batchId continuity across a restart);
 *  - admit/drop accounting vs an OFFLINE batch dedup of the identical
 *    document stream (`Dedup.nearDuplicates` over the union) — the
 *    sequential-greedy stream admits a superset of the offline
 *    transitive-canonical survivors by design; the bench reports both.
 *
 * Emits one JSON line per batch plus a summary line for SCALE.md.
 */
object IngestSoakBench {
  def main(args: Array[String]): Unit = {
    val nBatches = if (args.length > 0) args(0).toInt else 100
    val docsPer = if (args.length > 1) args(1).toInt else 50
    val compactAt = if (args.length > 2) args(2).toInt else 66
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val root = java.nio.file.Files.createTempDirectory("ingest_soak").toString
    val idxPath = s"$root/index.parquet"
    val corpPath = s"$root/corpus.parquet"

    // deterministic drift-y generator: vocabulary window slides with the
    // batch number; duplicates copy an earlier doc's text verbatim
    val texts = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def genBatch(b: Int): Seq[(Long, String)] = {
      val rng = new scala.util.Random(42L + b)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      (0 until docsPer).foreach { i =>
        val id = b.toLong * 100000L + i
        val r = rng.nextDouble()
        val text =
          if (r < 0.2 && texts.nonEmpty) // cross-batch duplicate
            texts(rng.nextInt(texts.length))._2
          else if (r < 0.3 && out.nonEmpty) // in-batch duplicate
            out(rng.nextInt(out.length))._2
          else
            (0 until 40).map(_ => s"w${b * 3 + rng.nextInt(500)}").mkString(" ")
        out += ((id, text))
      }
      texts ++= out
      out.toSeq
    }

    def countFiles(root: String): Int = {
      // count the LIVE version only — a maintenance swap retains the
      // replaced version for one generation of reader grace, which would
      // otherwise double-count
      val p = graft.operators.AtRest.resolve(spark, root)
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(p))) 0
      else {
        val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
        var n = 0
        while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
        n
      }
    }
    def admittedOf(batchId: Long): Long = {
      val fs = new org.apache.hadoop.fs.Path(corpPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val p = new org.apache.hadoop.fs.Path(corpPath, s"_committed/batch-$batchId")
      val in = fs.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in)).trim.toLong
      finally in.close()
    }

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    def startStream() = DedupIndex.ingestStream(
      mem.toDF().toDF("doc_id", "text"), idxPath, corpPath, s"$root/ckpt")
    var q = startStream()
    var cum = 0L
    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    var filesAtCompact = (0, 0)
    (0 until nBatches).foreach { b =>
      val batch = genBatch(b)
      val t0 = System.nanoTime()
      mem.addData(batch: _*)
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      walls += wall
      val adm = admittedOf(b.toLong)
      cum += adm
      println(f"""{"batch":$b,"wall":$wall%.3f,"admitted":$adm,"cum_admitted":$cum}""")
      if (b == compactAt) {
        q.stop()
        // the stream's lifetime lease releases on a LISTENER event, which
        // is asynchronous — release it explicitly (idempotent) so the
        // immediate maintenance pass can't race a not-yet-fired listener
        graft.operators.AtRest.releaseLease(spark, idxPath, s"ckpt:$root/ckpt")
        graft.operators.AtRest.releaseLease(spark, corpPath, s"ckpt:$root/ckpt")
        val before = (countFiles(idxPath), countFiles(corpPath))
        val t1 = System.nanoTime()
        DedupIndex.compact(spark, idxPath)
        DedupIndex.compactCorpus(spark, corpPath)
        val tCompact = (System.nanoTime() - t1) / 1e9
        val after = (countFiles(idxPath), countFiles(corpPath))
        filesAtCompact = before
        println(f"""{"compact_at":$b,"wall":$tCompact%.3f,"idx_files":[${before._1},${after._1}],"corp_files":[${before._2},${after._2}]}""")
        q = startStream() // same checkpoint: batchIds continue
      }
    }
    q.stop()

    // offline comparison on the identical stream: transitive canonical
    // survivors (the offline lower bound) vs the stream's greedy admits
    val all = texts.toSeq.toDF("doc_id", "text")
    val offlineSurvivors = all.count() -
      Dedup.nearDupGroups(Dedup.nearDuplicates(all, threshold = 0.7))
        .filter(col("doc_id") =!= col("canonical_id")).count()
    val corpusRows = DedupIndex.readCorpus(spark, corpPath).count()
    val head = walls.take(10).sum / math.min(10, walls.length)
    val tail = walls.takeRight(10).sum / math.min(10, walls.length)
    println(f"""{"summary":{"batches":$nBatches,"docs":${texts.length},"stream_admitted":$cum,"corpus_rows":$corpusRows,"offline_survivors":$offlineSurvivors,"wall_first10_avg":$head%.3f,"wall_last10_avg":$tail%.3f,"idx_files_final":${countFiles(idxPath)},"corp_files_final":${countFiles(corpPath)},"idx_files_precompact":${filesAtCompact._1},"corp_files_precompact":${filesAtCompact._2}}}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
