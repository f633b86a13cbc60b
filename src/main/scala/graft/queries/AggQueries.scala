package graft.queries

import org.apache.spark.sql.functions._

/**
 * Aggregation surface (SURVEY.md §2 C-aggregation). Every groupBy here is a
 * hash aggregate that Spark plans as partial (map-side) + final — one shuffle
 * of the already-reduced groups, which is the correct distributed plan: the
 * shuffled volume is O(groups), not O(rows), at any scale. COUNT(DISTINCT) is
 * planned via expand+two-phase agg by Catalyst; approx_count_distinct (HLL)
 * is the constant-memory alternative that actually survives 100 TB.
 */
object AggQueries {
  import Tables.t

  val all: Seq[Q] = Seq(

    Q("q_agg_distinct", Some("""
      SELECT l_returnflag,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT l_partkey) AS n_part,
             count(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_suppkey").as("n_supp"),
          countDistinct("l_partkey").as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    Q("q_agg_stats", Some("""
      SELECT l_linestatus,
             round(var_pop(l_quantity), 4) AS var_pop_qty,
             round(var_samp(l_quantity), 4) AS var_samp_qty,
             round(stddev_pop(l_quantity), 4) AS sd_pop_qty,
             round(stddev_samp(l_quantity), 4) AS sd_samp_qty,
             round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
             round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_pop_qp,
             round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_samp_qp
      FROM lineitem
      GROUP BY l_linestatus
      ORDER BY l_linestatus"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          round(var_pop("l_quantity"), 4).as("var_pop_qty"),
          round(var_samp("l_quantity"), 4).as("var_samp_qty"),
          round(stddev_pop("l_quantity"), 4).as("sd_pop_qty"),
          round(stddev_samp("l_quantity"), 4).as("sd_samp_qty"),
          round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qty_price"),
          round(covar_pop("l_quantity", "l_extendedprice"), 2).as("covar_pop_qp"),
          round(covar_samp("l_quantity", "l_extendedprice"), 2).as("covar_samp_qp"))
        .orderBy("l_linestatus")),

    Q("q_agg_percentile", Some("""
      SELECT o_orderstatus,
             round(median(o_totalprice), 4) AS median_price,
             round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
             round(quantile_cont(o_totalprice, 0.90), 4) AS p90,
             min(o_totalprice) AS min_price,
             max(o_totalprice) AS max_price
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          round(median(col("o_totalprice")), 4).as("median_price"),
          round(percentile(col("o_totalprice"), lit(0.25)), 4).as("p25"),
          round(percentile(col("o_totalprice"), lit(0.90)), 4).as("p90"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
        .orderBy("o_orderstatus")),

    // HLL sketch: engines' raw estimates differ by design, so the oracled
    // contract is the estimator's ACCURACY — the exact distinct count (DuckDB
    // recomputes it) plus a within-3×rsd check of the HLL estimate against
    // that exact count (at rsd=0.02 a correct HLL is inside 6% with
    // overwhelming probability; the ScalaTest spec keeps the tighter check).
    Q("q_agg_approx_distinct", Some("""
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS exact_parts,
             TRUE AS approx_within_3rsd
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct("l_partkey").as("exact_parts"),
          (abs(approx_count_distinct("l_partkey", 0.02).cast("double") /
            countDistinct("l_partkey") - 1.0) <= 0.06).as("approx_within_3rsd"))
        .orderBy("l_returnflag")),

    // Fixed-width histogram (width_bucket semantics, written as the
    // portable floor arithmetic both engines evaluate identically):
    // 20 buckets over [0, 600000), out-of-range clamps to 0 / 21.
    Q("q_agg_histogram", Some("""
      SELECT CAST(least(greatest(floor(o_totalprice / 30000.0) + 1, 0), 21) AS BIGINT)
               AS bucket,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders
      GROUP BY 1
      ORDER BY bucket"""),
      (s, dir) => t(s, dir, "orders")
        .groupBy(least(greatest(floor(col("o_totalprice") / 30000.0) + 1, lit(0)),
          lit(21)).cast("bigint").as("bucket"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("bucket")),

    // approx_percentile accuracy contract (the q_agg_approx_distinct
    // pattern): DuckDB provides the exact percentile; the Spark side proves
    // its t-digest-style estimate sits within the rank-error guarantee by
    // comparing against its OWN exact percentile, emitting the exact value +
    // a within-bounds boolean the oracle pins to TRUE. With accuracy=10000
    // the rank error is 1e-4, so the estimate must land between the
    // p-0.001 and p+0.001 exact quantiles (10x slack).
    Q("q_agg_approx_percentile", Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.5), 2) AS exact_p50,
             TRUE AS approx_within_rank_err
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          // ONE exact-percentile pass for all three quantiles (the
          // three-separate-aggregates form tripled the sort cost)
          expr("percentile(l_extendedprice, array(0.499D, 0.5D, 0.501D))").as("ps"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 2), 2).as("exact_p50"),
          (col("ap") >= element_at(col("ps"), 1) &&
            col("ap") <= element_at(col("ps"), 3)).as("approx_within_rank_err"))
        .orderBy("l_returnflag")),

    // list outputs serialized to strings on BOTH sides: the driver's pandas
    // hash-compare cannot hash ndarray cells (r01 compare crash).
    Q("q_agg_collect", Some("""
      SELECT n.n_name,
             array_to_string(list_sort(list(DISTINCT r.r_name)), '|') AS regions,
             string_agg(DISTINCT r.r_name, ',' ORDER BY r.r_name) AS regions_csv
      FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name
      ORDER BY n.n_name"""),
      (s, dir) => {
        val n = t(s, dir, "nation")
        val r = broadcast(t(s, dir, "region"))
        n.join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy("n_name")
          .agg(
            concat_ws("|", array_sort(collect_set("r_name"))).as("regions"),
            concat_ws(",", array_sort(collect_set("r_name"))).as("regions_csv"))
          .orderBy("n_name")
      }),

    Q("q_agg_minmax_by", Some("""
      SELECT o_orderstatus,
             min_by(o_orderdate, o_orderkey) AS first_key_date,
             max_by(o_totalprice, o_orderkey) AS last_key_price
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),
      // argmin/argmax over the UNIQUE o_orderkey → deterministic
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(min_by(col("o_orderdate"), col("o_orderkey")).as("first_key_date"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("last_key_price"))
        .orderBy("o_orderstatus")),

    // FIRST/LAST aggregates (SURVEY §2 C-aggregation): deterministic here
    // because the aggregated columns are functionally dependent on the
    // group key (the canonical "grab a dependent column without adding it
    // to GROUP BY" use) — any pick order yields the same value.
    Q("q_agg_first_last", Some("""
      SELECT o.o_custkey,
             first(c.c_mktsegment) AS seg,
             last(c.c_name) AS cname,
             count(*) AS n_orders
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY o.o_custkey
      ORDER BY o.o_custkey"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = broadcast(t(s, dir, "customer"))
        o.join(c, o("o_custkey") === c("c_custkey"))
          .groupBy("o_custkey")
          .agg(first("c_mktsegment").as("seg"),
            last("c_name").as("cname"),
            count(lit(1)).as("n_orders"))
          .orderBy("o_custkey")
      }),

    Q("q_agg_bool", Some("""
      SELECT l_returnflag,
             bool_and(l_quantity > 0) AS all_positive,
             bool_or(l_discount > 0.09) AS any_big_discount,
             bool_and(l_extendedprice > 1) AS every_priced
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(bool_and(col("l_quantity") > 0).as("all_positive"),
          bool_or(col("l_discount") > 0.09).as("any_big_discount"),
          every(col("l_extendedprice") > 1).as("every_priced"))
        .orderBy("l_returnflag")),

    Q("q_rollup", Some("""
      SELECT r.r_name, n.n_name, count(*) AS n_cust,
             round(sum(c.c_acctbal), 2) AS bal
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY ROLLUP (r.r_name, n.n_name)
      ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"""),
      // via spark.sql: the Dataset chain (join → rollup → orderBy on the
      // rolled-up key) trips Spark's ambiguous-self-join detector on the
      // re-resolved grouping columns; SQL names resolve cleanly.
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT r.r_name, n.n_name, count(*) AS n_cust,
                 round(sum(c.c_acctbal), 2) AS bal
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          GROUP BY ROLLUP (r.r_name, n.n_name)
          ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")
      }),

    Q("q_cube", Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""),
      (s, dir) => t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    Q("q_grouping_sets", Some("""
      SELECT o_orderstatus, o_orderpriority,
             grouping(o_orderstatus) AS g_status,
             grouping(o_orderpriority) AS g_prio,
             count(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT o_orderstatus, o_orderpriority,
                 CAST(grouping(o_orderstatus) AS INT) AS g_status,
                 CAST(grouping(o_orderpriority) AS INT) AS g_prio,
                 count(*) AS n
          FROM orders
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
      }),

    // skew-safe two-phase aggregation (operators.Skew): the salt stage is
    // invisible in the result, so a plain GROUP BY oracles it exactly
    Q("q_skew_salted_agg", Some("""
      SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 'HOT'
                  ELSE CAST(l_orderkey AS VARCHAR) END AS k,
             round(sum(l_quantity), 2) AS total_r, count(*) AS n
      FROM lineitem
      GROUP BY 1
      ORDER BY k"""),
      (s, dir) => {
        val skewed = t(s, dir, "lineitem").select(
          when(col("l_orderkey") % 10 =!= 0, lit("HOT"))
            .otherwise(col("l_orderkey").cast("string")).as("k"),
          col("l_quantity").as("v"), col("l_orderkey").as("rid"))
        graft.operators.Skew.saltedSumCount(skewed, "k", "v", "rid", buckets = 16)
          .select(col("k"), round(col("total"), 2).as("total_r"), col("n"))
          .orderBy("k")
      }),

    // skew-safe salted JOIN (operators.Skew.saltedJoin): salting the big
    // side and replicating the small side only changes row PLACEMENT, so
    // the plain join + aggregate oracles it exactly
    Q("q_skew_salted_join", Some("""
      SELECT o.o_orderpriority, count(*) AS n, round(sum(l.l_quantity), 2) AS qty
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
      ORDER BY o_orderpriority"""),
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        val ord = t(s, dir, "orders").select(
          col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        graft.operators.Skew.saltedJoin(li, ord, "l_orderkey",
            saltOn = "l_linenumber", buckets = 8)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
          .orderBy("o_orderpriority")
      }),

    Q("q_having", Some("""
      SELECT l_suppkey, count(*) AS n, round(sum(l_quantity), 2) AS qty
      FROM lineitem
      GROUP BY l_suppkey
      HAVING count(*) > 50 AND sum(l_quantity) > 500
      ORDER BY l_suppkey"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty_raw"))
        .where(col("n") > 50 && col("qty_raw") > 500)
        .select(col("l_suppkey"), col("n"), round(col("qty_raw"), 2).as("qty"))
        .orderBy("l_suppkey")),

    Q("q_agg_filter_clause", Some("""
      SELECT l_returnflag,
             count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
             round(sum(l_extendedprice) FILTER (WHERE l_quantity > 25), 2) AS big_qty_revenue,
             round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice ELSE 0 END), 2) AS f_revenue
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(when(col("l_discount") > 0.05, 1)).as("n_discounted"),
          round(sum(when(col("l_quantity") > 25, col("l_extendedprice"))), 2).as("big_qty_revenue"),
          round(sum(when(col("l_linestatus") === "F", col("l_extendedprice")).otherwise(0)), 2).as("f_revenue"))
        .orderBy("l_returnflag"))
  )
}
