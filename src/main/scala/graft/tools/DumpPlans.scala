package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Optimization-round instrumentation:
  * `runMain graft.tools.DumpPlans <outDir> <suffix> <query> [query...]`
  * (or `all`) writes `<outDir>/<query>_<suffix>.txt` containing the
  * query's `.explain("formatted")` output plus the EXECUTED job/stage/
  * shuffle tallies of one `toRdd.count()` run (prepare first, untimed,
  * exactly the bench methodology). The tallies answer what explain can't:
  * how many jobs a multi-job lifecycle operator actually schedules and
  * how many bytes its exchanges move. */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: DumpPlans <outDir> <suffix> <query...|all>")
      sys.exit(1)
    }
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val suffix = args(1)
    val names =
      if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    val bad = names.filterNot(SparkEntry.queries.contains)
    if (bad.nonEmpty) { System.err.println(s"unknown queries: $bad"); sys.exit(1) }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val shuffleWrite = new AtomicLong
    val shuffleRead = new AtomicLong
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobTimes = new java.util.concurrent.ConcurrentLinkedQueue[(Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(j.stageInfos.lastOption.map(_.name)).getOrElse("?")
        jobStarts.put(j.jobId, (j.time, desc.take(140)))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = jobStarts.remove(j.jobId)
        if (s != null) jobTimes.add(((j.time - s._1) / 1e3, s._2))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      SparkEntry.prepares.get(name).foreach(_(spark, sfDir))
      // listenerBus is private[spark]: a short sleep drains queued events
      // from prepare well enough for whole-query tallies
      Thread.sleep(500)
      jobs.set(0); stages.set(0); shuffleWrite.set(0); shuffleRead.set(0)
      jobTimes.clear()
      // the fn CALL is inside the tallied+timed region: lifecycle
      // operators (ingest, recheck, retrain) do their work eagerly while
      // building the returned frame — exactly what the bench times
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      import scala.jdk.CollectionConverters._
      val slowest = jobTimes.asScala.toSeq.sortBy(-_._1).take(10)
        .map { case (s, d) => f"  $s%7.3fs  $d%s" }.mkString("\n")
      val tallies =
        f"""== Executed (one bench-methodology run at local[$cpus%s], sf=$sfDir%s) ==
           |wall_sec: $sec%.3f
           |jobs: ${jobs.get}%d   stages: ${stages.get}%d
           |shuffle_bytes_written: ${shuffleWrite.get}%d
           |shuffle_bytes_read: ${shuffleRead.get}%d
           |slowest jobs (sec, callsite):
           |$slowest%s
           |""".stripMargin
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"),
        tallies + "\n" + plan)
      println(f"[dumpplans] $name%-28s $sec%.3fs jobs=${jobs.get}%-4d stages=${stages.get}%-4d shufW=${shuffleWrite.get}%-10d shufR=${shuffleRead.get}%d")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
