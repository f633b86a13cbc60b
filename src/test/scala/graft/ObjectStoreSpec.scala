package graft

import org.apache.spark.sql.functions._

/**
 * Exercises the Hadoop-FileSystem-generic code path of ZarrStore with a
 * NON-file:// scheme (the reference demos S3 via obstore,
 * reference: python/src/table.rs:29-42; our single Hadoop-FS path claims
 * s3a://gs://abfs:// support). Covers scheme dispatch AND the full e2e
 * surface through the foreign scheme: batch read, DSv2 write, and the
 * micro-batch streaming source.
 */
class ObjectStoreSpec extends SparkSpec {

  test("zarr source reads through a custom (non-file) Hadoop scheme") {
    val dir = tempDir("zarr_mockfs")
    graft.zarr.ZarrWriter.writeGroup(dir, "/meta")
    graft.zarr.ZarrWriter.writeStringArray(dir, "/meta", "collection",
      Seq("collection_a", "collection_b", "collection_c"), 3)
    graft.zarr.ZarrWriter.writeLongArray(dir, "/meta", "v", Seq(1L, 2L, 3L), 3)
    // register scheme mockfs:// backed by the local filesystem (on the
    // context's hadoopConfiguration — newHadoopConf() derives from it)
    spark.sparkContext.hadoopConfiguration.set("fs.mockfs.impl",
      classOf[MockObjectStoreFileSystem].getName)
    val df = spark.read.format("zarr").option("group", "/meta").load(s"mockfs://$dir")
    assert(df.schema.fieldNames.toSeq == Seq("collection", "v"))
    assert(df.orderBy("v").collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("collection_a", 1L), ("collection_b", 2L), ("collection_c", 3L)))
    // predicate + projection still work across the scheme boundary
    assert(df.filter(col("collection") === "collection_b").select("v")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("e2e non-file scheme: DSv2 write, read-back, and streaming through mockfs://") {
    val dir = tempDir("zarr_mockfs_e2e")
    spark.sparkContext.hadoopConfiguration.set("fs.mockfs.impl",
      classOf[MockObjectStoreFileSystem].getName)
    import spark.implicits._

    // write path: the crash-safe DSv2 commit runs entirely through the
    // foreign scheme (task temp objects + rename-based commit)
    val src = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("k", "name")
    val out = s"mockfs://$dir/out.zarr"
    src.coalesce(1).write.format("zarr").option("group", "/meta")
      .mode("overwrite").save(out)
    val back = spark.read.format("zarr").option("group", "/meta").load(out)
      .select("k", "name")
    assert(back.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))

    // streaming path: micro-batch offsets tracked against the foreign scheme;
    // appended rows surface in the next trigger
    val sdir = s"$dir/stream.zarr"
    graft.zarr.ZarrWriter.writeGroup(sdir, "/g")
    graft.zarr.ZarrWriter.writeLongArray(sdir, "/g", "x", Seq(0L, 1L), chunkLen = 2)
    val q = spark.readStream.format("zarr").option("group", "/g").load(s"mockfs://$sdir")
      .writeStream.format("memory").queryName("mockfs_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("mockfs_stream").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(0L, 1L))
      graft.zarr.ZarrWriter.writeLongArray(sdir, "/g", "x", 0L until 4L, chunkLen = 2)
      q.processAllAvailable()
      assert(spark.table("mockfs_stream").collect().map(_.getLong(0)).sorted.toSeq ==
        (0L until 4L).toSeq)
    } finally q.stop()
  }
}

/** file-backed FileSystem registered under the scheme `mockfs://`. */
class MockObjectStoreFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}
