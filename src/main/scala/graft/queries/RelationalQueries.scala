package graft.queries

import org.apache.spark.sql.functions._

/**
 * Subqueries, CTEs, VALUES, UNNEST, time bucketing (SURVEY.md §2 C-other).
 * Catalyst decorrelates the correlated predicates into joins
 * (RewritePredicateSubquery / RewriteCorrelatedScalarSubquery), so these plan
 * as ordinary distributed joins — nothing row-at-a-time.
 */
object RelationalQueries {
  import Tables.t

  val all: Seq[Q] = Seq(

    Q("q_subquery_scalar", Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
      ORDER BY o_orderkey"""),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT o_orderkey, o_totalprice
          FROM orders
          WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
          ORDER BY o_orderkey""")
      }),

    Q("q_subquery_correlated", Some("""
      SELECT c_custkey
      FROM customer c
      WHERE c_acctbal > (SELECT coalesce(avg(o_totalprice), 1e18) FROM orders o
                         WHERE o.o_custkey = c.c_custkey) / 50.0
      ORDER BY c_custkey"""),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT c_custkey
          FROM customer c
          WHERE c_acctbal > (SELECT coalesce(avg(o_totalprice), 1e18) FROM orders o
                             WHERE o.o_custkey = c.c_custkey) / 50.0
          ORDER BY c_custkey""")
      }),

    Q("q_subquery_in", Some("""
      SELECT p_partkey, p_name
      FROM part
      WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      ORDER BY p_partkey"""),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT p_partkey, p_name
          FROM part
          WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
          ORDER BY p_partkey""")
      }),

    Q("q_cte", Some("""
      WITH big_orders AS (
        SELECT o_custkey, count(*) AS n_big
        FROM orders WHERE o_totalprice > 150000
        GROUP BY o_custkey
      ), ranked AS (
        SELECT o_custkey, n_big FROM big_orders WHERE n_big >= 2
      )
      SELECT c.c_custkey, c.c_mktsegment, r.n_big
      FROM ranked r JOIN customer c ON c.c_custkey = r.o_custkey
      ORDER BY c.c_custkey"""),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          WITH big_orders AS (
            SELECT o_custkey, count(*) AS n_big
            FROM orders WHERE o_totalprice > 150000
            GROUP BY o_custkey
          ), ranked AS (
            SELECT o_custkey, n_big FROM big_orders WHERE n_big >= 2
          )
          SELECT c.c_custkey, c.c_mktsegment, r.n_big
          FROM ranked r JOIN customer c ON c.c_custkey = r.o_custkey
          ORDER BY c.c_custkey""")
      }),

    Q("q_values_inline", Some("""
      SELECT v.region_name, r.r_regionkey
      FROM (VALUES ('AFRICA', 1), ('ASIA', 2), ('NOWHERE', 3)) AS v(region_name, prio)
      LEFT JOIN region r ON r.r_name = v.region_name
      ORDER BY v.prio"""),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT v.region_name, r.r_regionkey
          FROM VALUES ('AFRICA', 1), ('ASIA', 2), ('NOWHERE', 3) AS v(region_name, prio)
          LEFT JOIN region r ON r.r_name = v.region_name
          ORDER BY v.prio""")
      }),

    Q("q_unnest", Some("""
      SELECT vec_id, CAST(u.pos AS INTEGER) - 1 AS pos, u.val
      FROM (SELECT vec_id, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings WHERE vec_id < 5) u
      ORDER BY vec_id, pos"""),
      (s, dir) => t(s, dir, "embeddings")
        .filter(col("vec_id") < 5)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .orderBy("vec_id", "pos")),

    Q("q_time_bucket", Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket,
             event_type,
             count(*) AS n,
             round(sum(value), 4) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY bucket, event_type"""),
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
        .orderBy("bucket", "event_type")),

    // the streaming module's windowed aggregation, driven in batch mode over
    // the bounded events table (same code path Structured Streaming runs;
    // StreamingSpec drives the unbounded MemoryStream side) — gives the
    // streaming surface an oracle-verified row
    Q("q_stream_window_batch", Some("""
      SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start, event_type,
             count(*) AS n, round(sum(value), 6) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start, event_type"""),
      (s, dir) => graft.streaming.EventStream.windowedCounts(Tables.t(s, dir, "events"))
        .orderBy("window_start", "event_type")),

    // EXPLAIN surface (SURVEY §2 C-other) is covered by PlanSpec in
    // src/test — plan text is engine-specific, so an oracle-less query here
    // could never be verified; the spec asserts plan *properties* instead
    // (pushed filters, broadcast joins, TakeOrderedAndProject).

    Q("q_map_struct_funcs", Some("""
      SELECT n_nationkey,
             struct_pack(key := n_nationkey, name := n_name).name AS s_name,
             map([n_name], [n_nationkey])[n_name][1] AS self_val,
             array_to_string(map_keys(map(['a','b'], [n_nationkey, n_regionkey])), ',') AS mkeys,
             array_to_string(map_values(map(['a','b'], [n_nationkey, n_regionkey])), ',') AS mvals,
             map(['x'], [n_regionkey])['x'][1] AS elem_x
      FROM nation
      ORDER BY n_nationkey"""),
      (s, dir) => t(s, dir, "nation").select(
        col("n_nationkey"),
        struct(col("n_nationkey").as("key"), col("n_name").as("name"))
          .getField("name").as("s_name"),
        element_at(map(col("n_name"), col("n_nationkey")), col("n_name")).as("self_val"),
        concat_ws(",", map_keys(map(lit("a"), col("n_nationkey"), lit("b"), col("n_regionkey")))).as("mkeys"),
        concat_ws(",", map_values(map(lit("a"), col("n_nationkey"), lit("b"), col("n_regionkey")))).as("mvals"),
        element_at(map(lit("x"), col("n_regionkey")), lit("x")).as("elem_x"))
        .orderBy("n_nationkey")),

    // Series generation + calendar gap-fill: every day of a month appears
    // even when no order lands on it (the time-series densify pattern).
    // Spark: explode(sequence(date, date)); DuckDB: generate_series.
    Q("q_date_series_fill", Some("""
      WITH days AS (
        SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-01-31',
                                           INTERVAL 1 DAY)) AS DATE) AS d
      ), cnt AS (
        SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
        FROM orders GROUP BY 1
      )
      SELECT days.d, CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_orders
      FROM days LEFT JOIN cnt USING (d)
      ORDER BY d"""),
      (s, dir) => {
        val days = s.sql(
          "SELECT explode(sequence(DATE'1995-01-01', DATE'1995-01-31')) AS d")
        val cnt = t(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("d"))
          .agg(count(lit(1)).as("n"))
        days.join(cnt, Seq("d"), "left")
          .select(col("d"), coalesce(col("n"), lit(0L)).as("n_orders"))
          .orderBy("d")
      }),

    // PIVOT (long → wide): Spark's relational pivot with an explicit value
    // list; the oracle is the definitional conditional-aggregation form.
    Q("q_pivot", Some("""
      SELECT o_orderpriority,
             round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
             round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
             round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
      (s, dir) => {
        val wide = t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(sum("o_totalprice"))
        wide.select(col("o_orderpriority"),
          round(col("F"), 2).as("F"), round(col("O"), 2).as("O"),
          round(col("P"), 2).as("P"))
          .orderBy("o_orderpriority")
      }),

    // UNPIVOT (wide → long): Dataset.unpivot / SQL stack; oracle is the
    // definitional UNION ALL.
    Q("q_unpivot", Some("""
      SELECT l_orderkey, l_linenumber, metric, round(value, 2) AS value
      FROM (
        SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_quantity', l_quantity FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
      )
      ORDER BY l_orderkey, l_linenumber, metric"""),
      (s, dir) => t(s, dir, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_discount"), col("l_extendedprice"), col("l_quantity"), col("l_tax")),
          "metric", "value")
        .select(col("l_orderkey"), col("l_linenumber"), col("metric"),
          round(col("value"), 2).as("value"))
        .orderBy("l_orderkey", "l_linenumber", "metric")),

    // LATERAL correlated subquery (a per-row derived table) — both engines
    // run the same ANSI text; the aggregate without GROUP BY preserves
    // orders with no lineitems (max = NULL), unlike an inner join.
    Q("q_lateral", Some("""
      SELECT o.o_orderkey, l.max_price, l.n_lines
      FROM orders o,
           LATERAL (SELECT max(l_extendedprice) AS max_price,
                           count(l_orderkey) AS n_lines
                    FROM lineitem
                    WHERE l_orderkey = o.o_orderkey) l
      ORDER BY o.o_orderkey"""),
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT o.o_orderkey, l.max_price, l.n_lines
          FROM orders o,
               LATERAL (SELECT max(l_extendedprice) AS max_price,
                               count(l_orderkey) AS n_lines
                        FROM lineitem
                        WHERE l_orderkey = o.o_orderkey) l
          ORDER BY o.o_orderkey""")
      })
  )
}
