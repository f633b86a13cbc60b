package graft

import org.apache.spark.sql.functions._

/**
 * Exercises the Hadoop-FileSystem-generic code path of ZarrStore with a
 * NON-file:// scheme (the reference demos S3 via obstore,
 * reference: python/src/table.rs:29-42; our single Hadoop-FS path claims
 * s3a://gs://abfs:// support — this proves scheme dispatch + qualified-URI
 * handling actually work beyond the default local scheme).
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
}

/** file-backed FileSystem registered under the scheme `mockfs://`. */
class MockObjectStoreFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}
