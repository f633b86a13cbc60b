package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared scaffolding for the `graft.tools` benches: one session builder
 *  and one best-of-N timer, so every bench measures under the same
 *  configuration (same shuffle partitions, UTC, UI off) and the same
 *  timing discipline (explicit GC between attempts — see
 *  graft-bench-hygiene notes: leftover garbage otherwise bills the next
 *  variant). */
private[tools] object BenchHarness {

  def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def timeBest(runs: Int, tag: String = "bench")(body: => Unit): Double = {
    var best = Double.MaxValue
    (1 to runs).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[$tag] attempt $i: $sec%.3fs")
      best = math.min(best, sec)
    }
    best
  }
}
