package graft.queries

import org.apache.spark.sql.functions._

/**
 * Sort / limit / top-k / set operations (SURVEY.md §2 C-sort, C-set).
 * Top-K goes through Spark's `TakeOrderedAndProjectExec` (per-partition heap
 * + driver merge of K rows — no global sort); full ORDER BY uses range
 * partitioning, the right distributed sort at scale.
 */
object SortSetQueries {
  import Tables.t

  val all: Seq[Q] = Seq(

    Q("q_orderby_multi", Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders
      ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC"""),
      (s, dir) => t(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc, col("o_orderkey").asc)),

    Q("q_orderby_nulls", Some("""
      SELECT o_orderkey, nullif(o_orderstatus, 'P') AS maybe_status
      FROM orders
      WHERE o_orderkey <= 500
      ORDER BY maybe_status DESC NULLS LAST, o_orderkey ASC"""),
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("P")).as("maybe_status"))
        .orderBy(col("maybe_status").desc_nulls_last, col("o_orderkey").asc)),

    Q("q_limit_offset", Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      ORDER BY o_orderkey
      LIMIT 20 OFFSET 40"""),
      (s, dir) => t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(40).limit(20)),

    Q("q_topk", Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 15"""),
      (s, dir) => t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(15)),

    Q("q_union_all", Some("""
      SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer WHERE c_custkey <= 100
      UNION ALL
      SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
      ORDER BY nationkey, side"""),
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_custkey") <= 100)
          .select(col("c_nationkey").as("nationkey"), lit("customer").as("side"))
        val sup = t(s, dir, "supplier")
          .select(col("s_nationkey").as("nationkey"), lit("supplier").as("side"))
        c.unionAll(sup).orderBy("nationkey", "side")
      }),

    Q("q_union_distinct", Some("""
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier
      ORDER BY nationkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.union(sup).distinct().orderBy("nationkey")
      }),

    Q("q_intersect", Some("""
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey AS nationkey FROM supplier
      ORDER BY nationkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.intersect(sup).orderBy("nationkey")
      }),

    Q("q_intersect_all", Some("""
      SELECT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey <= 50
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier)
      ORDER BY nationkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_custkey") <= 50)
          .select(col("c_nationkey").as("nationkey"))
        val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.intersectAll(sup).orderBy("nationkey")
      }),

    Q("q_except", Some("""
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey AS nationkey FROM supplier
      ORDER BY nationkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.except(sup).orderBy("nationkey")
      }),

    Q("q_except_all", Some("""
      SELECT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey <= 50
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier)
      ORDER BY nationkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_custkey") <= 50)
          .select(col("c_nationkey").as("nationkey"))
        val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        c.exceptAll(sup).orderBy("nationkey")
      })
  )
}
