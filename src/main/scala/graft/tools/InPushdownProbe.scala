package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement: does chunking a wide `IN` into ≤10-value groups
  * (below `spark.sql.parquet.pushdown.inFilterThreshold`, so Spark pushes
  * REAL In predicates instead of a min/max range) activate parquet
  * page/row-group skipping on an id-SORTED store? Prints bytes read via
  * countfs:// for: (a) one wide isin, (b) or-of-chunked isin, at two page
  * sizes. `runMain graft.tools.InPushdownProbe [nRows] [nCand]` */
object InPushdownProbe {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 4000000L
    val nCand = if (args.length > 1) args(1).toInt else 400
    val spark = SparkSession.builder().master("local[24]")
      .config("spark.sql.shuffle.partitions", 24)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    CountingFileSystem.register(spark.sparkContext.hadoopConfiguration)
    val root = java.nio.file.Files.createTempDirectory("in_probe").toString
    val dim = 64
    def synth(n: Long) =
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          ((pmod(xxhash64(col("id"), i), lit(1000000L)).cast("double") / 1e6)
            - 0.5).cast("float")).as("embedding"))
    val cands: Seq[Long] = (0 until nCand)
      .map(i => math.abs((i * 2654435761L) % nRows))
    def measure(tag: String, store: org.apache.spark.sql.DataFrame): Unit =
      for ((label, filt) <- Seq(
        ("wide-in", store.filter(col("vec_id").isin(cands.map(_.asInstanceOf[Any]): _*))),
        ("chunked-in", store.filter(cands.grouped(10)
          .map(g => col("vec_id").isin(g.map(_.asInstanceOf[Any]): _*))
          .reduce(_ || _))))) {
        CountingFileSystem.reset()
        val n = filt.select("vec_id", "embedding").collect().length
        println(f"[in-probe] $tag%-28s $label%-10s rows=$n bytes=${CountingFileSystem.bytesRead.get / 1e6}%.1f MB")
      }
    // A: hadoopConf-set page row limit, flat store (the known-good case)
    for ((pageKb, rowLimit) <- Seq((1024, 20000), (64, 512))) {
      spark.sparkContext.hadoopConfiguration.setInt("parquet.page.size", pageKb * 1024)
      spark.sparkContext.hadoopConfiguration.setInt("parquet.page.row.count.limit", rowLimit)
      val dir = s"$root/store_${pageKb}_$rowLimit"
      synth(nRows).sortWithinPartitions("vec_id").write.parquet(dir)
      measure(s"conf page=${pageKb}KB rows=$rowLimit", spark.read.parquet(s"countfs://$dir"))
    }
    spark.sparkContext.hadoopConfiguration.setInt("parquet.page.size", 1024 * 1024)
    spark.sparkContext.hadoopConfiguration.setInt("parquet.page.row.count.limit", 20000)
    // B: the limit passed as a WRITER OPTION instead (does it forward?)
    synth(nRows).sortWithinPartitions("vec_id").write
      .option("parquet.page.row.count.limit", "512")
      .parquet(s"$root/store_opt")
    measure("option rows=512 flat", spark.read.parquet(s"countfs://$root/store_opt"))
    // C: partitioned like the IVF table (16 partitions, per-task files)
    synth(nRows).withColumn("part", pmod(xxhash64(col("vec_id")), lit(16)))
      .sortWithinPartitions("part", "vec_id").write
      .option("parquet.page.row.count.limit", "512")
      .partitionBy("part").parquet(s"$root/store_part")
    measure("option rows=512 partitioned",
      spark.read.parquet(s"countfs://$root/store_part").drop("part"))
    spark.stop()
  }
}
