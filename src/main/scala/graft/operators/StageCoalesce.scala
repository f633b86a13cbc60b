package graft.operators

import org.apache.spark.sql.SparkSession

/**
 * Size-based AQE partition coalescing, scoped to the many-tiny-stage
 * lifecycle operators (guide §2.2/§2.6; r17 verdict item 5).
 *
 * With Spark's default `coalescePartitions.parallelismFirst=true`, AQE
 * coalesces a post-shuffle stage only down to the CORE COUNT — so the
 * dedup/at-rest operators, which schedule 40-70 KB-sized stages per run
 * (replay/ledger/bloom protocol steps, candidate prunes, convergence
 * rounds), launch cores × stages near-empty tasks of pure scheduling
 * overhead. The r17 driver measured them ANTI-scaling: 8 cores beat 32
 * (sec@8/sec@32 ratios 0.45-0.77). Flipping to `false` inside these
 * operators makes AQE respect `advisoryPartitionSizeInBytes`, so
 * partition count derives from DATA SIZE at any scale: a KB-sized
 * protocol stage runs one task at local[8] and local[32] alike, and a
 * 100 TB shuffle still gets thousands of partitions.
 *
 * Scoped, NOT session-global, because the inverse holds for compute-dense
 * mid-size stages: a ~50 MB window/percentile stage that fits one
 * "advisory" partition is bytes-small but seconds-heavy, and coalescing
 * it to one task serializes real work (measured 3× on sf1 window rows
 * when this was session-wide — OPTIMIZATION_r18.md §7). The lifecycle
 * operators' stages are metadata-sized (keys, ids, counters), never
 * compute-dense, so the trade is one-sided here.
 *
 * Back-to-back min-of-N evidence at local[32]/sf0.1:
 * q_dedup_recheck 6.93 → 5.71 s, q_sim_recheck 5.40 → 5.26 s,
 * q_dedup_ingest flat; full-suite sec@8/sec@32 ratios for the family
 * rose from 0.45-0.77 to 0.70-2.03 (OPTIMIZATION_r18.md §7).
 *
 * An explicit deployment setting (builder conf / --conf / -D) wins: the
 * scope is a no-op when the conf is pinned in the SparkConf. Nest-safe
 * (restores the previous session value).
 */
private[graft] object StageCoalesce {
  private val Key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"

  def sizeBased[T](spark: SparkSession)(body: => T): T =
    if (spark.sparkContext.getConf.contains(Key)) body
    else {
      val prev = spark.conf.getOption(Key)
      spark.conf.set(Key, "false")
      try body
      finally prev match {
        case Some(v) => spark.conf.set(Key, v)
        case None => spark.conf.unset(Key)
      }
    }
}
