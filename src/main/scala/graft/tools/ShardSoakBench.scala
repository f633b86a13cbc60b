package graft.tools

import org.apache.spark.sql.functions._

/**
 * Multi-GiB single-shard soak — the case the ranged-read and streamed-write
 * rewrites exist for: a shard too large to exist as one JVM byte array
 * under a realistic executor heap.
 *
 * `runMain graft.tools.ShardSoakBench [rows] [dir]` — default 360M int64
 * rows = one ~2.9 GiB (zstd-incompressible xxhash payload) shard of 1M-row
 * inner chunks. Run it with a PINNED small heap (`sbt -J-Xmx3500m …`) so
 * the whole-object fallback is physically impossible:
 *
 *  1. streamed WRITE — the task buffers one inner chunk of values and one
 *     open output stream; peak heap is sampled to show the ceiling holds;
 *  2. ranged LIMIT read — 1 stat + 1 open + index range + ONE inner chunk
 *     on the single held stream (the RPC profile counter-pinned in
 *     ObjectStoreSpec), kilobytes transferred from a ~3 GiB object;
 *  3. ranged FULL scan — every inner chunk decoded sequentially on the one
 *     held stream, peak heap sampled;
 *  4. whole-GET attempt (threshold forced to MaxValue) — the pre-round-8
 *     path; under the pinned heap this must FAIL (a >2 GiB object cannot
 *     be materialized), demonstrating what the ranged path removes.
 */
object ShardSoakBench {

  private def peakHeapSampler(): (() => Unit, () => Long) = {
    val peak = new java.util.concurrent.atomic.AtomicLong(0)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      while (!stop.get()) {
        val rt = Runtime.getRuntime
        val used = rt.totalMemory() - rt.freeMemory()
        peak.updateAndGet(p => math.max(p, used))
        Thread.sleep(50)
      }
    })
    t.setDaemon(true)
    t.start()
    (() => stop.set(true), () => peak.get())
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 360L * 1024 * 1024
    val dir = if (args.length > 1) args(1) else "/tmp/graft_shardsoak/store.zarr"
    val innerRows = 1 << 20
    val spark = BenchHarness.session(4)
    val maxHeap = Runtime.getRuntime.maxMemory()

    def timed[A](what: String)(body: => A): (A, Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val a = body
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[soak] $what: $sec%.2fs")
      (a, sec)
    }

    // 1. streamed write of ONE shard (chunk_rows = rows)
    val (stopW, peakW) = peakHeapSampler()
    val (_, tWrite) = timed("streamed write") {
      spark.range(rows).select(col("id"), xxhash64(col("id")).as("v"))
        .coalesce(1)
        .write.format("zarr").option("group", "/t")
        .option("chunk_rows", rows.toString)
        .option("shard_rows", innerRows.toString)
        .option("compression", "zstd")
        .mode("overwrite").save(dir)
    }
    stopW()
    val objBytes = java.nio.file.Files.size(
      java.nio.file.Paths.get(dir, "t", "v", "c", "0"))

    def read() = spark.read.format("zarr").option("group", "/t").load(dir)

    // 2. ranged LIMIT — index + one inner chunk off the ~3 GiB object
    val (_, tLimit) = timed("ranged LIMIT 5") {
      read().select("id", "v").limit(5).collect()
    }

    // 3. ranged full scan
    val (stopS, peakS) = peakHeapSampler()
    val (sum, tFull) = timed("ranged full scan") {
      // bit_xor: order-independent checksum that cannot ANSI-overflow
      read().agg(expr("bit_xor(v)")).collect()(0).getLong(0)
    }
    stopS()

    // main metrics FIRST — the whole-GET leg below may kill the JVM, which
    // is itself the demonstration
    println(s"""{"metric":"shardsoak","rows":$rows,"object_bytes":$objBytes,""" +
      s""""max_heap_bytes":$maxHeap,""" +
      s""""write_sec":${f(tWrite)},"write_peak_heap_bytes":${peakW()},""" +
      s""""limit_ranged_sec":${f(tLimit)},""" +
      s""""full_ranged_sec":${f(tFull)},"scan_peak_heap_bytes":${peakS()},""" +
      s""""checksum":$sum}""")
    Console.out.flush()

    // 4. the pre-round-8 whole-GET path must fail under the pinned heap
    val prev = graft.zarr.ZarrCodecs.rangedShardThresholdBytes
    graft.zarr.ZarrCodecs.rangedShardThresholdBytes = Long.MaxValue
    val wholeGet =
      try {
        read().select("v").limit(5).collect()
        "succeeded (heap not pinned tightly enough to demonstrate)"
      } catch {
        case t: Throwable =>
          s"failed as expected: ${rootCause(t).getClass.getSimpleName}"
      } finally graft.zarr.ZarrCodecs.rangedShardThresholdBytes = prev
    println(s"""{"metric":"shardsoak_wholeget","whole_get":"$wholeGet"}""")
  }

  private def rootCause(t: Throwable): Throwable =
    if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)

  private def f(d: Double): String = f"$d%.3f"
}
