package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions
import graft.operators.Corpus
import graft.queries.Tables

/** Bloom wrappers over Spark's internal filter expressions, and the
 *  bloom-prefiltered decontamination's equivalence to the exact one. */
class BloomSpec extends SparkSpec {

  test("bloom_agg/bloom_contains: no false negatives, low false-positive rate") {
    import spark.implicits._
    val members = (0L until 5000L).map(_ * 7L)
    val bloom = members.toDF("v")
      .agg(SketchFunctions.bloom_agg(col("v"), 5000L))
      .head.getAs[Array[Byte]](0)
    assert(bloom.length > 0)
    // every member tests positive
    val missed = members.toDF("v")
      .filter(!SketchFunctions.bloom_contains(bloom, col("v"))).count()
    assert(missed === 0L)
    // non-members (odd offsets can't be multiples of 7 shifted by 1..6)
    val fp = (0L until 5000L).map(_ * 7L + 3L).toDF("v")
      .filter(SketchFunctions.bloom_contains(bloom, col("v"))).count()
    assert(fp < 250L, s"false-positive count $fp of 5000 (expect ~3% worst case)")
  }

  test("bloom_contains requires a constant filter side (why the operator collects)") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val bloom = Seq(1L, 2L, 3L).toDF("v")
      .agg(SketchFunctions.bloom_agg(col("v"), 10L)).head.getAs[Array[Byte]](0)
    // constant (literal) filter side: resolves and evaluates
    val hits = Seq(2L, 99L).toDF("v")
      .filter(SketchFunctions.bloom_contains(bloom, col("v")))
      .collect().map(_.getLong(0)).toSeq
    assert(hits === Seq(2L))
    // an ATTRIBUTE filter side is rejected at analysis (eager, at
    // construction) — Spark demands a constant or scalar subquery there,
    // which is why decontaminateBloom collects the binary to the driver
    val err = intercept[Exception] {
      Seq((2L, bloom)).toDF("v", "b").selectExpr("bloom_contains(b, v) AS hit")
    }
    assert(err.getMessage.toLowerCase.contains("constant")
      || err.getMessage.toLowerCase.contains("scalar"), err.getMessage)
  }

  test("decontaminateBloom equals exact decontaminate on the sf0.01 corpus") {
    val docs = Tables.t(spark, "/root/testdata/sf0.01", "documents")
    // % 10 split: 6 docs ARE contaminated at sf0.01, so the equality isn't
    // vacuous — both paths must drop the same non-empty set
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val exact = Corpus.decontaminate(train, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloomed = Corpus.decontaminateBloom(train, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloomed === exact)
    assert(bloomed.nonEmpty && bloomed.size < train.count())
  }
}
