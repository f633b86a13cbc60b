package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs every declared query against SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line (last line of stdout, also BENCH.json in cwd).
  *
  * Execution is measured with `queryExecution.toRdd.count()` — a plain
  * `df.count()` lets Catalyst prune unreferenced projections, so
  * scalar-heavy queries would be under-measured (r01 verdict #6). Errors are
  * recorded per query instead of being swallowed into a plausible time.
  *
  * Each query reports its BEST of SPARK_GRAFT_BENCH_RUNS attempts
  * (default 2): this host's CPU-burst contention swings identical runs
  * 2-12×, so a single sample routinely reads as a regression that isn't
  * there (r02's recorded 60 s for a stable-5 s query). Min-of-N measures
  * the code, not the neighbors. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JVM/codegen warmup outside the timed loop — the alphabetically-first
    // query was absorbing ~4s of session startup in r01/r02 numbers
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.queries("q1_agg")(spark, sfDir).queryExecution.toRdd.count()
    catch { case _: Throwable => }
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val prepares = SparkEntry.prepares
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val attempts = (1 to runs).map { _ =>
        // seed phase (at-rest table builds) runs UNTIMED before each
        // attempt — the timed number is the operator, so suite totals
        // stay comparable as seeds evolve; a failed seed fails the query
        val prepFailed =
          try { prepares.get(name).foreach(_(spark, sfDir)); false }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name PREPARE FAILED: ${e.getMessage}")
            true
          }
        val t0 = System.nanoTime()
        val failed = prepFailed ||
          (try { fn(spark, sfDir).queryExecution.toRdd.count(); false }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            true
          })
        val sec = (System.nanoTime() - t0) / 1e9
        // drop operator-internal persisted frames between attempts/queries:
        // with a big heap the GC-driven ContextCleaner almost never fires, so
        // 88 queries' caches accumulate and later queries pay eviction/spill
        // they don't own
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        // also evict plan-level CacheManager entries: unpersisting the RDDs
        // drops blocks but leaves InMemoryRelation substitution in place, so
        // re-runs would silently recompute through an empty cache node and
        // entries accumulate across 110 queries (r05 advice)
        spark.catalog.clearCache()
        (sec, failed)
      }
      val ok = attempts.collect { case (sec, false) => sec }
      if (ok.isEmpty) errors += name
      val sec = if (ok.isEmpty) attempts.head._1 else ok.min
      System.err.println(f"[bench] $name%-28s $sec%.2fs  (${attempts.map(a => f"${a._1}%.2f").mkString("/")})")
      name -> sec
    }
    // escaped + capped: raw exception text can contain quotes/backslashes
    // (invalid JSON), and a mass failure's unbounded error array would blow
    // the printed line past the driver's 2000-char capture exactly when
    // diagnostics matter most
    def esc(x: String): String = x.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    def errJsonCapped(cap: Int, each: Int): String = {
      val kept = errors.take(cap).map(e => "\"" + esc(e.take(each)) + "\"")
      val more = if (errors.length > cap)
        Seq("\"...+" + (errors.length - cap) + " more\"") else Seq.empty
      (kept ++ more).mkString("[", ",", "]")
    }
    val errJson = errJsonCapped(20, 400)
    // total over SUCCESSFUL queries only: an errored query fails fast
    // (~0.05s) and would make totals non-comparable across runs with
    // different error sets (r09 advice) — the errors array plus the
    // completed-count make any exclusion visible
    val failedSet = errors.toSet
    val total = results.collect { case (k, v) if !failedSet(k) => v }.sum
    // full per-query detail (unbounded, full precision) goes to BENCH.json
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val completed = results.length - errors.length
    Files.writeString(Paths.get("BENCH.json"),
      s"""{"metric":"total","value":$total,"unit":"sec","completed":$completed,"queries":$fullQs,"errors":$errJson,"sf":"${esc(sfDir)}"}""" + "\n")
    // The PRINTED line must survive the driver's stdout capture, which keeps
    // only the last 2000 chars (with sbt's "[success] ..." line after ours):
    // r01-r03 all recorded parsed:null because the full per-query map is
    // ~2.8KB and the line's head was cut off. Budget the printed line to
    // 1900 chars (the only other trailing line is sbt's ~72-char success
    // line) — slowest queries first (the informative ones), 2-decimal
    // seconds in the map, and an explicit omitted-count so truncation is
    // visible. r17 lesson: four completed sub-0.8 s queries fell off the
    // printed line and read as "dropped" in the cross-round comparison —
    // the tighter formatting + budget fit ~10 more rows (BENCH.json always
    // carries all of them at full precision). Timing methodology unchanged.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v)) // not the
        // default-locale f"" interpolator: de_DE would print 60,123
    def fmt2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val prefix = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":{"""
    val errJsonLine = errJsonCapped(3, 120)
    val suffixFor = (omitted: Int) =>
      s"""},"queries_omitted":$omitted,"completed":$completed,"errors":$errJsonLine,"sf":"${esc(sfDir)}"}"""
    val bySlowest = results.sortBy(-_._2).map { case (k, v) => "\"" + k + "\":" + fmt2(v) }
    val budget = 1900 - prefix.length - suffixFor(results.length).length
    var used = 0
    val kept = bySlowest.takeWhile { e =>
      val cost = e.length + (if (used == 0) 0 else 1)
      if (used + cost <= budget) { used += cost; true } else false
    }
    val line = prefix + kept.mkString(",") + suffixFor(results.length - kept.length)
    spark.stop()
    // printed after spark.stop() so no executor/log line can trail it —
    // r01's line was followed by sbt output and the driver failed to parse.
    println(line)
  }
}
