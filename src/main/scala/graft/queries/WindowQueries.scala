package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Window-function surface (SURVEY.md §2 C-window). Every window partitions by
 * a real key (status/custkey/user) — a window with no PARTITION BY would pull
 * the whole table into one task and is avoided everywhere; all ORDER BYs end
 * on a unique key so ranks/offsets are deterministic.
 */
object WindowQueries {
  import Tables.t

  val all: Seq[Q] = Seq(

    Q("q_window_rank", Some("""
      SELECT o_orderkey,
             row_number() OVER w AS rn,
             rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk,
             round(percent_rank() OVER w, 6) AS prnk,
             ntile(4) OVER w AS quartile,
             round(cume_dist() OVER w, 6) AS cdist
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderkey"""),
      (s, dir) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders").select(
          col("o_orderkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"),
          ntile(4).over(w).as("quartile"),
          round(cume_dist().over(w), 6).as("cdist"))
          .orderBy("o_orderkey")
      }),

    Q("q_window_lag_lead", Some("""
      SELECT o_orderkey,
             lag(o_totalprice) OVER w AS prev_price,
             lead(o_totalprice) OVER w AS next_price,
             lag(o_totalprice, 2, -1.0) OVER w AS prev2_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_orderkey"""),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        t(s, dir, "orders").select(
          col("o_orderkey"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"),
          lag(col("o_totalprice"), 2, -1.0).over(w).as("prev2_price"))
          .orderBy("o_orderkey")
      }),

    Q("q_window_value_fns", Some("""
      SELECT o_orderkey,
             first_value(o_orderkey) OVER w AS first_key,
             last_value(o_orderkey) OVER w AS last_key,
             nth_value(o_orderkey, 3) OVER w AS third_key
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_orderkey"""),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders").select(
          col("o_orderkey"),
          first("o_orderkey").over(w).as("first_key"),
          last("o_orderkey").over(w).as("last_key"),
          nth_value(col("o_orderkey"), 3).over(w).as("third_key"))
          .orderBy("o_orderkey")
      }),

    // IGNORE NULLS variants: last non-null carried forward (the gap-fill
    // pattern) + first/nth skipping nulls — a nullable column is synthesized
    // so the skip semantics actually fire.
    Q("q_window_ignore_nulls", Some("""
      WITH o AS (
        SELECT o_orderkey, o_custkey, o_orderdate,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice END AS p
        FROM orders
      )
      SELECT o_orderkey,
             last_value(p IGNORE NULLS) OVER w AS fill_forward,
             first_value(p IGNORE NULLS) OVER wu AS first_nn,
             lead(p, 1 IGNORE NULLS) OVER wu AS next_nn
      FROM o
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wu AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_orderkey"""),
      (s, dir) => {
        val base = t(s, dir, "orders").select(
          col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          when(col("o_orderkey") % 3 === 0, col("o_totalprice")).as("p"))
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wu = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        base.select(
          col("o_orderkey"),
          last("p", ignoreNulls = true).over(w).as("fill_forward"),
          first("p", ignoreNulls = true).over(wu).as("first_nn"),
          lead(col("p"), 1, null, ignoreNulls = true).over(wu).as("next_nn"))
          .orderBy("o_orderkey")
      }),

    Q("q_window_running", Some("""
      SELECT o_orderkey,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
             round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
             count(*) OVER (PARTITION BY o_custkey) AS cust_orders
      FROM orders
      ORDER BY o_orderkey"""),
      (s, dir) => {
        val byTime = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        t(s, dir, "orders").select(
          col("o_orderkey"),
          round(sum("o_totalprice").over(byTime.rowsBetween(Window.unboundedPreceding, 0)), 2)
            .as("running_total"),
          round(avg("o_totalprice").over(byTime.rowsBetween(-2, 0)), 4).as("moving_avg3"),
          count(lit(1)).over(Window.partitionBy("o_custkey")).as("cust_orders"))
          .orderBy("o_orderkey")
      }),

    Q("q_window_range_frame", Some("""
      SELECT o_orderkey,
             count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
                   RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS keys_within_1000
      FROM orders
      ORDER BY o_orderkey"""),
      (s, dir) => {
        val w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
          .rangeBetween(-1000, 0)
        t(s, dir, "orders").select(
          col("o_orderkey"),
          count(lit(1)).over(w).as("keys_within_1000"))
          .orderBy("o_orderkey")
      })
  )
}
