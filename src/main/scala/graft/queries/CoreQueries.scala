package graft.queries

import org.apache.spark.sql.functions._

/**
 * Projection / filter / predicate / cast surface (SURVEY.md §2 C-projection,
 * C-filter rows). All plain `Dataset` transformations: Catalyst pushes the
 * filters and the pruned column set into the parquet scan, so at 100 TB each
 * of these is a scan-local map with no shuffle.
 */
object CoreQueries {
  import Tables.t

  val all: Seq[Q] = Seq(

    Q("q1_agg", Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 4) AS avg_qty,
             round(avg(l_extendedprice), 4) AS avg_price,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // `charged` computed in DECIMAL on both sides: the inputs are 2-dp
    // values, so decimal multiply+round is exact and engine-independent
    // (rounding the raw double product at 4 dp sits on representation
    // boundaries and diverged on 347/60k rows in r01).
    Q("q_projection", Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(round(CAST(l_extendedprice AS DECIMAL(14,2))
                        * (1 - CAST(l_discount AS DECIMAL(6,2)))
                        * (1 + CAST(l_tax AS DECIMAL(6,2))), 4) AS DOUBLE) AS charged,
             l_quantity * 2 AS double_qty,
             concat(l_returnflag, '/', l_linestatus) AS flags
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber"""),
      (s, dir) => t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice").cast("decimal(14,2)")
            * (lit(1) - col("l_discount").cast("decimal(6,2)"))
            * (lit(1) + col("l_tax").cast("decimal(6,2)")), 4)
          .cast("double").as("charged"),
        (col("l_quantity") * 2).as("double_qty"),
        concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("flags"))
        .orderBy("l_orderkey", "l_linenumber")),

    Q("q_filter_compare", Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount
      FROM lineitem
      WHERE l_quantity > 30 AND l_discount <= 0.05
        AND l_returnflag <> 'A' AND l_linenumber >= 2
      ORDER BY l_orderkey, l_linenumber"""),
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_quantity") > 30 && col("l_discount") <= 0.05 &&
          col("l_returnflag") =!= "A" && col("l_linenumber") >= 2)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")),

    Q("q_between_date", Some("""
      SELECT o_orderkey, o_orderdate, o_totalprice
      FROM orders
      WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
      ORDER BY o_orderkey"""),
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderdate").between(
          to_timestamp(lit("1996-01-01 00:00:00")), to_timestamp(lit("1996-12-31 23:59:59"))))
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderkey")),

    Q("q_bool_connectives", Some("""
      SELECT o_orderkey
      FROM orders
      WHERE (o_orderstatus = 'F' OR o_totalprice > 100000)
        AND NOT (o_orderpriority = '5-LOW' AND o_orderstatus = 'O')
      ORDER BY o_orderkey"""),
      (s, dir) => t(s, dir, "orders")
        .filter((col("o_orderstatus") === "F" || col("o_totalprice") > 100000) &&
          !(col("o_orderpriority") === "5-LOW" && col("o_orderstatus") === "O"))
        .select("o_orderkey").orderBy("o_orderkey")),

    Q("q_in_list", Some("""
      SELECT o_orderkey, o_orderpriority
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND o_custkey NOT IN (1, 2, 3)
      ORDER BY o_orderkey"""),
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          !col("o_custkey").isin(1, 2, 3))
        .select("o_orderkey", "o_orderpriority").orderBy("o_orderkey")),

    Q("q_like_regex", Some("""
      SELECT p_partkey, p_name
      FROM part
      WHERE p_name LIKE '%red%' OR p_name ILIKE 'BLUE%'
         OR regexp_matches(p_name, '(bolt|nut)$')
      ORDER BY p_partkey"""),
      (s, dir) => t(s, dir, "part")
        .filter(col("p_name").like("%red%") || col("p_name").ilike("BLUE%") ||
          col("p_name").rlike("(bolt|nut)$"))
        .select("p_partkey", "p_name").orderBy("p_partkey")),

    Q("q_null_handling", Some("""
      SELECT o_orderkey,
             nullif(o_orderstatus, 'P') AS status_or_null,
             coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
             CASE WHEN o_totalprice > 150000 THEN 'big'
                  WHEN o_totalprice > 50000 THEN 'mid'
                  ELSE 'small' END AS bucket,
             (nullif(o_orderstatus, 'P') IS NULL) AS was_pending
      FROM orders
      ORDER BY o_orderkey"""),
      (s, dir) => t(s, dir, "orders").select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("status_or_null"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_filled"),
        when(col("o_totalprice") > 150000, "big")
          .when(col("o_totalprice") > 50000, "mid")
          .otherwise("small").as("bucket"),
        nullif(col("o_orderstatus"), lit("P")).isNull.as("was_pending"))
        .orderBy("o_orderkey")),

    Q("q_cast", Some("""
      SELECT o_orderkey,
             CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
             CAST(o_orderdate AS DATE) AS order_date,
             CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
             TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_orderstatus
                           ELSE CAST(o_orderkey AS VARCHAR) END AS INTEGER) AS bad_cast
      FROM orders
      ORDER BY o_orderkey"""),
      (s, dir) => t(s, dir, "orders").select(
        col("o_orderkey"),
        floor(col("o_totalprice")).cast("bigint").as("price_floor"),
        col("o_orderdate").cast("date").as("order_date"),
        col("o_orderkey").cast("string").cast("bigint").as("key_roundtrip"),
        // mixed validity on purpose: proves BOTH try_cast outcomes (value and
        // null), and an all-failing input is also the worst case at scale —
        // TryEval materializes a caught exception per failing row (~13 µs):
        // see SCALE.md "TRY_CAST at scale"
        expr("try_cast(CASE WHEN o_orderkey % 3 = 0 THEN o_orderstatus " +
          "ELSE CAST(o_orderkey AS STRING) END AS int)").as("bad_cast"))
        .orderBy("o_orderkey")),

    Q("q_distinct", Some("""
      SELECT DISTINCT l_returnflag, l_linestatus
      FROM lineitem
      ORDER BY l_returnflag, l_linestatus"""),
      (s, dir) => t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"))
  )
}
