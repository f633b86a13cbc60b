package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One verifiable capability: a named Spark query over the driver test tables
 * plus (where SQL-expressible) an equivalent DuckDB oracle statement.
 *
 * Determinism contract (FIXTURES.md §3): every query ORDER BYs a unique key,
 * aggregation-order-sensitive float results are rounded identically on both
 * sides, and ORDER BY on nullable keys pins NULLS FIRST/LAST explicitly
 * (Spark defaults NULLS FIRST on ASC, DuckDB defaults NULLS LAST).
 */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame,
    /** Optional SEED phase, run before `fn` on every execution but NOT
     *  timed by the bench: the heavy at-rest rows re-seed complete
     *  tables per attempt (so bench re-runs can't accrete state), which
     *  made their suite numbers measure mostly seeding — the phase
     *  split keeps totals comparable as seeds evolve across rounds
     *  while Verify still runs both phases for correctness. */
    prepare: Option[(SparkSession, String) => Unit] = None)

/** Per-JVM scratch dirs keyed by query — the ONE leak guard behind every
 *  query that writes a table: roundtrip queries re-run every bench attempt,
 *  and a fresh createTempDirectory per EXECUTION leaked a full table copy
 *  each time (gigabytes per round at sf0.1). Overwrite-mode writers reuse
 *  the cached dir; [[fresh]] wipes it for append-only/streaming targets. */
private[queries] object QueryScratch {
  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def dir(name: String): String =
    dirs.computeIfAbsent(name,
      n => java.nio.file.Files.createTempDirectory(s"graft_$n").toString)
  def fresh(name: String): String = {
    val d = dir(name)
    org.apache.commons.io.FileUtils.cleanDirectory(new java.io.File(d))
    d
  }
}

object Tables {
  /**
   * The generator has emitted events.ts under two encodings across rounds:
   * INT64 TIMESTAMP(NANOS), which the Spark parquet reader rejects outright
   * (PARQUET_TYPE_ILLEGAL) unless nanosAsLong maps it to a raw long, and
   * plain naive TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ.
   * Normalize both to TimestampType by inspecting the landed schema — every
   * session here pins spark.sql.session.timeZone=UTC, so the NTZ→TZ cast is
   * wall-clock lossless and matches what DuckDB (naive either way) computes.
   */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** Schema-dispatch normalization of the three `ts` encodings seen from the
   *  generator (raw nanos long via nanosAsLong, TIMESTAMP_NTZ from naive
   *  micros, TimestampType already) — exposed for TablesSpec. */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  val names = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register all test tables as temp views (for spark.sql-based queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  /**
   * A projection of a test table, written ONCE per (session, dir) as a
   * bucketed+sorted catalog table (external, under java.io.tmpdir) and read
   * back bucket-aware: equi-joins between tables bucketed on their join key
   * plan with NO Exchange on either side. The bucketed copy is the scale
   * pattern — pay one layout write, then every fact⋈fact join is co-located.
   */
  def bucketed(spark: SparkSession, dir: String, name: String, bucketCol: String,
      cols: Seq[String], nBuckets: Int = 8): DataFrame = {
    // full-width content digest of the dir: abs(hashCode) collides across
    // dirs (silently reusing the wrong dataset's bucketed copy) and
    // abs(Int.MinValue) is negative, putting a '-' in the identifier
    val tbl = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      s"graft_bkt_${name}_" + md.take(6).map("%02x".format(_)).mkString
    }
    if (!spark.catalog.tableExists(tbl)) {
      val path = java.nio.file.Files.createTempDirectory(s"graft_bkt_$name").toString
      t(spark, dir, name).select(cols.map(org.apache.spark.sql.functions.col): _*)
        .write.bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
        .option("path", path).mode("overwrite").saveAsTable(tbl)
    }
    spark.table(tbl)
  }
}
