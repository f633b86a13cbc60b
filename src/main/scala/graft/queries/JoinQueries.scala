package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Join surface (SURVEY.md §2 C-joins). Scale notes, per join:
 *
 *  - Dimension tables (region/nation/supplier/customer at TPC-H ratios) are
 *    explicitly `broadcast()` where they join a fact table — no shuffle of
 *    the big side at any scale.
 *  - Fact-to-fact equi-joins (lineitem⋈orders) are left to Catalyst/AQE:
 *    they hash-partition both sides on the join key, which is the correct
 *    100 TB plan (sort-merge with both sides shuffled once).
 *  - Non-equi joins are kept to bounded inputs (supplier self-pairs) because
 *    a nested-loop join over unbounded sides is wrong at any scale.
 *  - The as-of join is expressed as a window (`lag` over user/time), NOT a
 *    self-join: one shuffle by user_id, no quadratic blowup.
 */
object JoinQueries {
  import Tables.t

  val all: Seq[Q] = Seq(

    Q("q_join_inner", Some("""
      SELECT n.n_name, r.r_name,
             count(*) AS n_customers,
             round(sum(c.c_acctbal), 2) AS total_bal
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name, r.r_name
      ORDER BY n.n_name, r.r_name"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = broadcast(t(s, dir, "nation"))
        val r = broadcast(t(s, dir, "region"))
        c.join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy("n_name", "r_name")
          .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("total_bal"))
          .orderBy("n_name", "r_name")
      }),

    // Bucketing: the fact-fact join SHUFFLE-FREE. Both fact tables are
    // written bucketed (and sorted) on the join key; a bucketed read then
    // sort-merge-joins bucket-to-bucket with NO Exchange on either side —
    // at 100 TB this converts the biggest recurring shuffle a warehouse has
    // (fact⋈fact) into a co-located map-side join, paid once at write time.
    // BucketingSpec asserts the join subtree plans zero shuffles; the DuckDB
    // oracle checks the result against the raw parquet tables.
    Q("q_join_bucketed", Some("""
      SELECT o.o_orderpriority,
             count(*) AS n_lines,
             round(sum(l.l_extendedprice), 2) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority"""),
      (s, dir) => {
        val l = Tables.bucketed(s, dir, "lineitem", "l_orderkey",
          Seq("l_orderkey", "l_extendedprice"))
        val o = Tables.bucketed(s, dir, "orders", "o_orderkey",
          Seq("o_orderkey", "o_orderpriority"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_lines"),
            round(sum("l_extendedprice"), 2).as("revenue"))
          .orderBy("o_orderpriority")
      }),

    Q("q_join_fact_fact", Some("""
      SELECT o.o_orderpriority,
             count(*) AS n_lines,
             round(sum(l.l_extendedprice), 2) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority"""),
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_lines"), round(sum("l_extendedprice"), 2).as("revenue"))
          .orderBy("o_orderpriority")
      }),

    Q("q_join_left_outer", Some("""
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
      ORDER BY c.c_custkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(c("c_custkey"))
          .agg(count(o("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")
      }),

    Q("q_join_right_outer", Some("""
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM orders o
      RIGHT JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
      ORDER BY c.c_custkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        o.join(c, c("c_custkey") === o("o_custkey"), "right_outer")
          .groupBy(c("c_custkey"))
          .agg(count(o("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")
      }),

    Q("q_join_full_outer", Some("""
      WITH od AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders
                  FROM orders GROUP BY 1),
           ev AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n_events
                  FROM events GROUP BY 1)
      SELECT coalesce(od.d, ev.d) AS day, od.n_orders, ev.n_events
      FROM od FULL JOIN ev ON od.d = ev.d
      ORDER BY day"""),
      (s, dir) => {
        val od = t(s, dir, "orders").groupBy(col("o_orderdate").cast("date").as("d"))
          .agg(count(lit(1)).as("n_orders"))
        val ev = t(s, dir, "events").groupBy(col("ts").cast("date").as("d"))
          .agg(count(lit(1)).as("n_events"))
        od.join(ev, od("d") === ev("d"), "full_outer")
          .select(coalesce(od("d"), ev("d")).as("day"), col("n_orders"), col("n_events"))
          .orderBy("day")
      }),

    Q("q_join_semi", Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
      ORDER BY c_custkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_totalprice") > 200000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      }),

    Q("q_join_anti", Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      }),

    Q("q_join_cross", Some("""
      SELECT r1.r_name AS from_region, r2.r_name AS to_region
      FROM region r1 CROSS JOIN region r2
      WHERE r1.r_name < r2.r_name
      ORDER BY from_region, to_region"""),
      (s, dir) => {
        val r1 = t(s, dir, "region").select(col("r_name").as("from_region"))
        val r2 = t(s, dir, "region").select(col("r_name").as("to_region"))
        r1.crossJoin(r2).filter(col("from_region") < col("to_region"))
          .orderBy("from_region", "to_region")
      }),

    Q("q_join_nonequi", Some("""
      SELECT s1.s_suppkey AS a, s2.s_suppkey AS b,
             round(abs(s1.s_acctbal - s2.s_acctbal), 2) AS bal_gap
      FROM supplier s1 JOIN supplier s2
        ON s1.s_suppkey < s2.s_suppkey
       AND abs(s1.s_acctbal - s2.s_acctbal) < 100
      ORDER BY a, b"""),
      (s, dir) => {
        val s1 = t(s, dir, "supplier").select(col("s_suppkey").as("a"), col("s_acctbal").as("bal_a"))
        val s2 = t(s, dir, "supplier").select(col("s_suppkey").as("b"), col("s_acctbal").as("bal_b"))
        s1.join(broadcast(s2), col("a") < col("b") && abs(col("bal_a") - col("bal_b")) < 100)
          .select(col("a"), col("b"), round(abs(col("bal_a") - col("bal_b")), 2).as("bal_gap"))
          .orderBy("a", "b")
      }),

    Q("q_join_range", Some("""
      SELECT o.o_orderkey, count(l.l_orderkey) AS late_lines
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                     AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      GROUP BY o.o_orderkey
      ORDER BY o.o_orderkey"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        // equi key + range residual: stays a shuffled hash/sort-merge join on
        // l_orderkey with the range predicate as a post-join filter — no
        // nested loop even at 100 TB.
        o.join(l, l("l_orderkey") === o("o_orderkey") &&
            l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAY"))
          .groupBy(o("o_orderkey"))
          .agg(count(l("l_orderkey")).as("late_lines"))
          .orderBy("o_orderkey")
      }),

    Q("q_join_asof", Some("""
      SELECT e.event_id, p.event_id AS prev_event_id
      FROM events e
      ASOF JOIN events p ON e.user_id = p.user_id AND e.ts > p.ts
      WHERE e.event_type = 'purchase'
      ORDER BY e.event_id"""),
      (s, dir) => {
        // as-of (nearest prior event per user): window lag, not a self-join —
        // single shuffle by user_id, linear in events. Ordering carries the
        // event_id tiebreak (Q.scala determinism contract) and the oracle's
        // ASOF is STRICT (e.ts > p.ts), so an equal-ts predecessor is
        // excluded, not returned. (If ties ever appear with a strictly
        // earlier event behind them, ASOF keeps that earlier event while
        // this drops the row — the driver fixture has unique (user_id, ts).)
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("prev_event_id", lag("event_id", 1).over(w))
          .withColumn("prev_ts", lag("ts", 1).over(w))
          .filter(col("event_type") === "purchase" && col("prev_event_id").isNotNull &&
            col("prev_ts") < col("ts"))
          .select("event_id", "prev_event_id")
          .orderBy("event_id")
      })
  )
}
