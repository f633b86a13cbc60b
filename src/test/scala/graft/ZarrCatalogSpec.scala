package graft

import org.apache.spark.sql.functions._

import graft.sources.ZarrCatalog
import graft.zarr.ZarrWriter

/**
 * The catalog surface: a Zarr store root exposed as a namespace — groups
 * list as tables via SHOW TABLES, resolve via multi-part identifiers, and
 * CTAS creates new groups through the DSv2 write path.
 */
class ZarrCatalogSpec extends SparkSpec {

  private lazy val root: String = {
    val dir = tempDir("zarr_catalog")
    ZarrWriter.writeGroup(dir, "/meta_a")
    ZarrWriter.writeStringArray(dir, "/meta_a", "collection",
      Seq("collection_a", "collection_b", "collection_c"), 3)
    ZarrWriter.writeLongArray(dir, "/meta_a", "v", Seq(1L, 2L, 3L), 3)
    ZarrWriter.writeGroup(dir, "/meta_b")
    ZarrWriter.writeLongArray(dir, "/meta_b", "k", Seq(10L, 20L), 2)
    ZarrWriter.writeDoubleArray(dir, "/meta_b", "x", Seq(0.5, 1.5), 2)
    // a namespace: group with nested table, no direct arrays
    ZarrWriter.writeGroup(dir, "/nested/inner")
    ZarrWriter.writeLongArray(dir, "/nested/inner", "n", Seq(7L), 1)
    spark.conf.set("spark.sql.catalog.zcat", classOf[ZarrCatalog].getName)
    spark.conf.set("spark.sql.catalog.zcat.root", dir)
    dir
  }

  test("SHOW TABLES lists each group with arrays as a table") {
    root
    val tables = spark.sql("SHOW TABLES IN zcat").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(tables == Seq(("", "meta_a"), ("", "meta_b")))
    // groups without direct arrays surface as namespaces, not tables
    val ns = spark.sql("SHOW NAMESPACES IN zcat").collect().map(_.getString(0)).toSeq
    assert(ns == Seq("nested"))
    assert(spark.sql("SHOW TABLES IN zcat.nested").collect()
      .map(_.getString(1)).toSeq == Seq("inner"))
  }

  test("multi-part identifiers query two groups through spark.sql") {
    root
    val a = spark.sql(
      "SELECT collection, v FROM zcat.meta_a WHERE collection <> 'collection_b' ORDER BY v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a == Seq(("collection_a", 1L), ("collection_c", 3L)))
    val joined = spark.sql(
      """SELECT b.k, b.x, a.collection FROM zcat.meta_b b
         JOIN zcat.meta_a a ON a.v * 10 = b.k ORDER BY b.k""")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(joined == Seq((10L, 0.5, "collection_a"), (20L, 1.5, "collection_b")))
    // nested namespace table resolves through the longer identifier
    assert(spark.sql("SELECT n FROM zcat.nested.inner").collect()
      .map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("CTAS creates a new group through the DSv2 write path; DROP removes it") {
    root
    spark.sql(
      "CREATE TABLE zcat.derived AS SELECT v * 100 AS v100 FROM zcat.meta_a ORDER BY v")
    assert(spark.sql("SELECT v100 FROM zcat.derived ORDER BY v100").collect()
      .map(_.getLong(0)).toSeq == Seq(100L, 200L, 300L))
    assert(spark.sql("SHOW TABLES IN zcat").collect().map(_.getString(1)).toSeq
      .contains("derived"))
    spark.sql("DROP TABLE zcat.derived")
    assert(!spark.sql("SHOW TABLES IN zcat").collect().map(_.getString(1)).toSeq
      .contains("derived"))
  }

  test("path-syntactic identifiers are rejected — no escape from the store root") {
    root
    // a backquoted `..` or absolute segment would otherwise resolve OUTSIDE
    // the configured root (Hadoop Path does not normalize dot-segments):
    // DROP TABLE would recursively delete foreign directories
    for (bad <- Seq("SELECT * FROM zcat.`..`", "SELECT * FROM zcat.`/etc`",
        "DROP TABLE zcat.`..`", "DROP TABLE zcat.`a/b`",
        "SHOW TABLES IN zcat.`..`", "CREATE TABLE zcat.`.hidden` AS SELECT 1 AS x")) {
      val e = intercept[Exception] { spark.sql(bad).collect() }
      def traceHas(t: Throwable): Boolean = t != null &&
        ((t.getMessage != null && t.getMessage.contains("illegal identifier segment"))
          || traceHas(t.getCause))
      assert(traceHas(e), s"$bad -> ${e.getMessage}")
    }
  }

  test("CTAS honors zarr_format=2: the created table is a v2 store") {
    val dir = root
    spark.sql("""CREATE TABLE zcat.derived_v2 TBLPROPERTIES('zarr_format'='2')
      AS SELECT v * 10 AS v10, collection FROM zcat.meta_a ORDER BY v""")
    // v2 layout on disk: .zarray + bare chunk keys, no v3 array document
    val p = java.nio.file.Paths.get(dir, "derived_v2")
    assert(java.nio.file.Files.exists(p.resolve("v10").resolve(".zarray")))
    assert(java.nio.file.Files.exists(p.resolve("v10").resolve("0")))
    assert(!java.nio.file.Files.exists(p.resolve("v10").resolve("zarr.json")))
    assert(spark.sql("SELECT v10 FROM zcat.derived_v2 ORDER BY v10").collect()
      .map(_.getLong(0)).toSeq == Seq(10L, 20L, 30L))
    spark.sql("DROP TABLE zcat.derived_v2")
  }

  test("a Zarr V2 store mounts as a catalog (.zgroup groups, .zarray tables)") {
    val dir = tempDir("zarr_catalog_v2")
    ZarrWriter.writeV2Fixture(dir)
    spark.conf.set("spark.sql.catalog.zcat2", classOf[ZarrCatalog].getName)
    spark.conf.set("spark.sql.catalog.zcat2.root", dir)
    val tables = spark.sql("SHOW TABLES IN zcat2").collect()
      .map(_.getString(1)).toSeq
    assert(tables == Seq("meta"))
    val rows = spark.sql(
      "SELECT id, name FROM zcat2.meta WHERE score > 1.0 ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((3L, "n3"), (4L, "n4"), (5L, "n5"), (6L, "n6")))
  }
}
