package graft.queries

import org.apache.spark.sql.functions._

/**
 * Scalar-function families (SURVEY.md §2 C-scalar): string, date/time, math,
 * array/higher-order, JSON, conditional. All codegen'd built-ins — each query
 * is a narrow per-row map over one scan, nothing here shuffles.
 */
object ScalarQueries {
  import Tables.t

  val all: Seq[Q] = Seq(

    Q("q_string_funcs", Some("""
      SELECT c_custkey,
             upper(c_name) AS up, lower(c_mktsegment) AS lo,
             length(c_name) AS len,
             substring(c_name, 1, 8) AS sub,
             strpos(c_name, '#') AS pos,
             replace(c_name, 'Customer', 'Cust') AS repl,
             concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS joined,
             lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
             rtrim(rpad(c_mktsegment, 12, ' ')) AS trimmed,
             reverse(c_mktsegment) AS rev,
             left(c_name, 4) AS l4, right(c_name, 4) AS r4,
             repeat(c_mktsegment[1:1], 3) AS rep3,
             translate(c_mktsegment, 'AEIOU', 'aeiou') AS trans,
             split_part(c_name, '#', 2) AS after_hash,
             starts_with(c_name, 'Customer') AS is_cust,
             ends_with(c_name, '1') AS ends1,
             md5(c_name) AS name_md5,
             sha256(c_name) AS name_sha
      FROM customer
      ORDER BY c_custkey"""),
      (s, dir) => t(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("up"), lower(col("c_mktsegment")).as("lo"),
        length(col("c_name")).as("len"),
        substring(col("c_name"), 1, 8).as("sub"),
        instr(col("c_name"), "#").as("pos"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("repl"),
        concat_ws("-", col("c_mktsegment"), col("c_nationkey").cast("string")).as("joined"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
        rtrim(rpad(col("c_mktsegment"), 12, " ")).as("trimmed"),
        reverse(col("c_mktsegment")).as("rev"),
        substring(col("c_name"), 0, 4).as("l4"),
        expr("right(c_name, 4)").as("r4"), // substr(len-3, 4) diverges from
                                           // the oracle's right() under 4 chars
        repeat(substring(col("c_mktsegment"), 1, 1), 3).as("rep3"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("trans"),
        element_at(split(col("c_name"), "#"), 2).as("after_hash"),
        col("c_name").startsWith("Customer").as("is_cust"),
        col("c_name").endsWith("1").as("ends1"),
        md5(col("c_name")).as("name_md5"),
        sha2(col("c_name"), 256).as("name_sha"))
        .orderBy("c_custkey")),

    Q("q_regexp_funcs", Some("""
      SELECT p_partkey,
             regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
             regexp_matches(p_type, '^(ECONOMY|PREMIUM)') AS is_tier
      FROM part
      ORDER BY p_partkey"""),
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        col("p_type").rlike("^(ECONOMY|PREMIUM)").as("is_tier"))
        .orderBy("p_partkey")),

    Q("q_date_funcs", Some("""
      SELECT o_orderkey,
             date_trunc('month', o_orderdate) AS month_start,
             EXTRACT(year FROM o_orderdate) AS yr,
             EXTRACT(month FROM o_orderdate) AS mo,
             EXTRACT(day FROM o_orderdate) AS dy,
             EXTRACT(hour FROM o_orderdate) AS hr,
             EXTRACT(dow FROM o_orderdate) + 1 AS dow_sun1,
             EXTRACT(doy FROM o_orderdate) AS doy,
             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95,
             o_orderdate + INTERVAL 30 DAY AS due_date,
             last_day(CAST(o_orderdate AS DATE)) AS month_end,
             make_date(2020, EXTRACT(month FROM o_orderdate), 15) AS mid_month
      FROM orders
      ORDER BY o_orderkey"""),
      (s, dir) => t(s, dir, "orders").select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        year(col("o_orderdate")).cast("bigint").as("yr"),
        month(col("o_orderdate")).cast("bigint").as("mo"),
        dayofmonth(col("o_orderdate")).cast("bigint").as("dy"),
        hour(col("o_orderdate")).cast("bigint").as("hr"),
        dayofweek(col("o_orderdate")).cast("bigint").as("dow_sun1"),
        dayofyear(col("o_orderdate")).cast("bigint").as("doy"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("bigint").as("days_since_95"),
        (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due_date"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        make_date(lit(2020), month(col("o_orderdate")), lit(15)).as("mid_month"))
        .orderBy("o_orderkey")),

    Q("q_math_funcs", Some("""
      SELECT p_partkey,
             abs(p_retailprice - 1000) AS dist_1k,
             CAST(ceil(p_retailprice) AS BIGINT) AS c,
             CAST(floor(p_retailprice) AS BIGINT) AS f,
             round(p_retailprice, 1) AS r1,
             CAST(round(trunc(p_retailprice), 4) AS DOUBLE) AS tr,
             round(pow(p_size, 2), 4) AS size_sq,
             round(sqrt(p_retailprice), 6) AS sq,
             round(exp(p_size / 10.0), 6) AS ex,
             round(ln(p_retailprice), 6) AS lnp,
             round(log10(p_retailprice), 6) AS l10,
             round(log2(greatest(p_size, 1)), 6) AS l2,
             round(sin(p_size), 6) AS sn, round(cos(p_size), 6) AS cs,
             round(atan2(p_size, 7), 6) AS at2,
             CAST(sign(p_retailprice - 1000) AS DOUBLE) AS sg,
             CAST(p_size % 7 AS INTEGER) AS m7,
             round(pi(), 6) AS pi_val
      FROM part
      ORDER BY p_partkey"""),
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        abs(col("p_retailprice") - 1000).as("dist_1k"),
        ceil(col("p_retailprice")).as("c"), floor(col("p_retailprice")).as("f"),
        round(col("p_retailprice"), 1).as("r1"),
        // Spark has no 1-arg numeric trunc; toward-zero == floor/ceil by sign
        round(when(col("p_retailprice") >= 0, floor(col("p_retailprice")))
          .otherwise(ceil(col("p_retailprice"))).cast("double"), 4).as("tr"),
        round(pow(col("p_size"), 2), 4).as("size_sq"),
        round(sqrt(col("p_retailprice")), 6).as("sq"),
        round(exp(col("p_size") / 10.0), 6).as("ex"),
        round(log(col("p_retailprice")), 6).as("lnp"),
        round(log10(col("p_retailprice")), 6).as("l10"),
        round(log2(greatest(col("p_size"), lit(1))), 6).as("l2"),
        round(sin(col("p_size")), 6).as("sn"), round(cos(col("p_size")), 6).as("cs"),
        round(atan2(col("p_size"), lit(7)), 6).as("at2"),
        signum(col("p_retailprice") - 1000).as("sg"),
        (col("p_size") % 7).cast("int").as("m7"),
        round(lit(math.Pi), 6).as("pi_val"))
        .orderBy("p_partkey")),

    // array-valued columns serialized via array_to_string/concat_ws — the
    // driver's pandas compare cannot hash ndarray cells; list_position is
    // coalesced to 0 (DuckDB: NULL for absent, Spark array_position: 0).
    Q("q_array_funcs", Some("""
      SELECT vec_id,
             len(embedding) AS dim,
             embedding[1] AS first_elem,
             round(CAST(embedding[1] AS DOUBLE) + CAST(embedding[64] AS DOUBLE), 5) AS ends_sum,
             array_to_string(list_sort([CAST(label AS INTEGER), CAST(vec_id % 5 AS INTEGER), 7]), ',') AS sorted_arr,
             list_distinct([label, label, 1]) IS NOT NULL AS has_distinct,
             CAST(coalesce(list_position([10, 20, 30], CAST(label AS INTEGER)), 0) AS BIGINT) AS pos_in_ref,
             list_contains([0, 1, 2, 3, 4], label) AS label_small,
             array_to_string(flatten([[label], [label + 1]]), ',') AS flat
      FROM embeddings
      ORDER BY vec_id"""),
      (s, dir) => t(s, dir, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_elem"),
        round(element_at(col("embedding"), 1).cast("double") +
          element_at(col("embedding"), 64).cast("double"), 5).as("ends_sum"),
        concat_ws(",", array_sort(array(col("label").cast("int"), (col("vec_id") % 5).cast("int"), lit(7))))
          .as("sorted_arr"),
        array_distinct(array(col("label"), col("label"), lit(1))).isNotNull.as("has_distinct"),
        array_position(array(lit(10), lit(20), lit(30)), col("label").cast("int")).as("pos_in_ref"),
        array_contains(array(lit(0), lit(1), lit(2), lit(3), lit(4)), col("label")).as("label_small"),
        concat_ws(",", flatten(array(array(col("label")), array(col("label") + 1)))).as("flat"))
        .orderBy("vec_id")),

    Q("q_higher_order", Some("""
      SELECT vec_id,
             round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
             round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS vec_sq_sum,
             len(list_filter(embedding, x -> x > 0)) AS n_positive,
             round(CAST(list_max(embedding) AS DOUBLE), 5) AS max_elem,
             round(CAST(list_min(embedding) AS DOUBLE), 5) AS min_elem
      FROM embeddings
      ORDER BY vec_id"""),
      (s, dir) => t(s, dir, "embeddings").select(
        col("vec_id"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")), 4).as("vec_sum"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")), 4).as("vec_sq_sum"),
        size(filter(col("embedding"), x => x > 0)).as("n_positive"),
        round(array_max(col("embedding")).cast("double"), 5).as("max_elem"),
        round(array_min(col("embedding")).cast("double"), 5).as("min_elem"))
        .orderBy("vec_id")),

    Q("q_json_funcs", Some("""
      SELECT event_id,
             json_extract_string(props, '$.k') AS k_str,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
             CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS absent,
             json_valid(props) AS ok
      FROM events
      ORDER BY event_id"""),
      (s, dir) => t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k_num"),
        get_json_object(col("props"), "$.missing").as("absent"),
        // '$' probes whole-document validity (json_valid semantics) — the
        // '$.k' presence probe only agreed with the oracle because every
        // fixture row happens to carry a non-null "k"
        get_json_object(col("props"), "$").isNotNull.as("ok"))
        .orderBy("event_id")),

    Q("q_conditional_funcs", Some("""
      SELECT s_suppkey,
             greatest(s_acctbal, 0.0) AS bal_pos,
             least(s_acctbal, 5000.0) AS bal_capped,
             coalesce(NULLIF(s_name, s_name), s_name) AS name_kept,
             ifnull(NULLIF(s_nationkey, s_nationkey), -1) AS nk_defaulted
      FROM supplier
      ORDER BY s_suppkey"""),
      (s, dir) => t(s, dir, "supplier").select(
        col("s_suppkey"),
        greatest(col("s_acctbal"), lit(0.0)).as("bal_pos"),
        least(col("s_acctbal"), lit(5000.0)).as("bal_capped"),
        coalesce(nullif(col("s_name"), col("s_name")), col("s_name")).as("name_kept"),
        coalesce(nullif(col("s_nationkey"), col("s_nationkey")), lit(-1)).as("nk_defaulted"))
        .orderBy("s_suppkey"))
  )
}
