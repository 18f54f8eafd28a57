"""Relational operator coverage (SURVEY.md §2) over the TPC-H-ish testdata.

Each query exercises one operator family from the reference inventory with
the idiomatic Spark primitive (broadcast joins for dims, window tie-breaks
for the upsert policies, higher-order array ops for in-row suppression) and
ships an ANSI-SQL DuckDB oracle. Reference citations are on each function.

All scans here are parquet; Catalyst pushes the filters/projections down
(verified via .explain in tests — PushedFilters/ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    from ..session import scan_parquet

    return scan_parquet(spark, f"{sf}/{name}.parquet")


# --- P1/P3/P4/P6/P7: projection + conjunctive pushdown + membership filter
# + null guards, one scan (reference usecols src/amr.py:369-381, filters
# src/get_chembl_data.py:31-37, membership src/sources.py:28, null guards
# src/amr.py:108-115). Pruned ReadSchema + PushedFilters asserted in
# tests/test_plans.py.
def q_filters(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.filter(
            F.col("event_type").isin("click", "view", "purchase")
            & (F.col("ts") >= F.lit("2024-01-08"))
            & ((F.col("value") < 90) | F.col("value").isNull())
        )
        .select(
            "event_id",
            "event_type",
            F.when(F.col("value") > 50, F.lit("high"))
            .when(F.col("value").isNotNull(), F.lit("low"))
            .otherwise(F.lit("missing"))
            .alias("value_band"),
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
        )
    )


# --- J1: dict-lookup join chain as broadcast joins (src/amr.py:25-68) -----
def q_broadcast_lookup(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            "o_orderkey",
            F.col("c_name").alias("customer"),
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


# --- J4 + P5: existence gate (left_semi) and its dangling-key complement
# (left_anti) in one query (src/relations.py:104-105 gate; the reference's
# `continue` on missing keys). Each branch is one pass; the union marks
# which gate admitted the row.
def q_semi_anti(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    semi = c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_name", F.lit("has_orders").alias("gate")
    )
    anti = c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name", F.lit("no_orders").alias("gate")
    )
    return semi.unionByName(anti)


# --- J5: priority fallback chain as coalesce over left joins ---------------
# (reference nested try/except, src/relations.py:146-155,198-204)
def q_priority_fallback(spark, sf):
    e = _t(spark, sf, "events")
    c = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("ck"), F.col("c_name").alias("cname")
    )
    s = _t(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("sk"), F.col("s_name").alias("sname")
    )
    return (
        e.join(F.broadcast(c), e["user_id"] == F.col("ck"), "left")
        .join(F.broadcast(s), e["user_id"] == F.col("sk"), "left")
        .select(
            "event_id",
            F.coalesce("cname", "sname", F.lit("unresolved")).alias("actor"),
        )
    )


# --- J6: merge-update join (property graft, src/sources.py:107-109) --------
def q_merge_update(spark, sf):
    c = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = _t(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("key"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    # supplier side wins on collision (last-wins property merge)
    joined = c.alias("l").join(s.alias("r"), "key", "full_outer")
    return joined.select(
        "key",
        F.coalesce(F.col("r.name"), F.col("l.name")).alias("name"),
        F.coalesce(F.col("r.acctbal"), F.col("l.acctbal")).alias("acctbal"),
    )


# --- A2/A3/O3: column distinct + set union (src/amr.py:200-203) -------------
def q_union_distinct(spark, sf):
    p = _t(spark, sf, "part")
    return (
        p.select(F.col("p_brand").alias("tag"))
        .union(p.select(F.concat(F.col("p_type"), F.lit("_group")).alias("tag")))
        .distinct()
    )


# --- A4 + A5: last-wins upsert AND first-wins skip, both policies in one
# pass (src/sources.py:46 last-wins dict update; src/sources.py:91-92
# first-wins skip). Two row_numbers over the same partitioning (one
# shuffle, opposing sorts); 'policy' marks which upsert rule kept the row.
def q_upsert_policies(spark, sf):
    o = _t(spark, sf, "orders")
    w_first = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    w_last = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.row_number().over(w_first).alias("rn_f"),
            F.row_number().over(w_last).alias("rn_l"),
        )
        .filter((F.col("rn_f") == 1) | (F.col("rn_l") == 1))
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.when((F.col("rn_f") == 1) & (F.col("rn_l") == 1), "both")
            .when(F.col("rn_f") == 1, "first_wins")
            .otherwise("last_wins")
            .alias("policy"),
        )
    )


# --- A6: group-size metrics (src/amr.py:273-275) -----------------------------
def q_group_count(spark, sf):
    return (
        _t(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


# --- A7: in-row adjacent-duplicate suppression (src/relations.py:45-65) ------
def q_adjacent_suppression(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.explode(
            F.array_distinct(F.array("l_returnflag", "l_linestatus"))
        ).alias("flag"),
    )


# --- §2.5 lag/lead + O2 per-group top-k, one window pass (reference top-1
# pick src/sources.py:105; turn-ordering lag/lead per SURVEY §2.5) ----------
def q_window_funcs(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rank"),
            F.lag("o_orderkey").over(w).alias("prev_orderkey"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
        )
        .filter(F.col("rank") <= 3)
    )


# --- F1-F10: string/scalar function surface + split/explode flatten, one
# query (concat/curie F1-F2, lower F3, initcap F4, split-explode F5-F6
# src/amr.py:174-175,328-330, suffix F7, regex extract, cast F10) ------------
def q_string_explode(spark, sf):
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.explode(F.split(F.col("p_name"), " ")).alias("word"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.concat(F.col("p_type"), F.lit("_group")).alias("type_group"),
        F.col("p_size").cast("string").alias("size_str"),
    ).select(
        "p_partkey",
        "word",
        F.lower("word").alias("word_lower"),
        F.initcap("word").alias("word_title"),
        "brand_type",
        "brand_num",
        "type_group",
        "size_str",
    )


# --- F12-adjacent: JSON property extraction (dynamic props, events.props) ----
def q_json_extract(spark, sf):
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


# --- tumbling event-time window + pivot to wide format, one query (batch
# form of the streaming agg; pivot = explicit-values wide aggregation) -------
def q_window_pivot(spark, sf):
    e = _t(spark, sf, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"))
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
        .select(F.col("w.start").alias("day"), *kinds)
    )


# --- as-of join (custom operator: union + window, no range explosion) --------
def q_asof_join(spark, sf):
    from ..operators.asof import asof_join

    e = _t(spark, sf, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf, "orders")
    return asof_join(
        e, o, key="user_id", right_key="o_custkey", left_ts="ts",
        right_ts="o_orderdate", payload_cols=["o_orderkey"],
        tiebreak="o_orderkey",
    ).select("event_id", "asof_o_orderkey")


# --- correlated subqueries (Catalyst decorrelation exercise) ------------------
def q_scalar_subquery(spark, sf):
    for t in ("orders", "customer"):
        _t(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT round(max(o_totalprice), 4) FROM orders
                WHERE o_custkey = c_custkey) AS max_order
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        """
    )


# --- distinct counting (exact; HLL sketch is rows-only by nature) -------------
def q_distinct_counts(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


# --- rollup/cube grouping sets with grouping_id (beyond the reference;
# analytics surface — one query covers the multi-level grouping family) ------
def q_grouping_sets(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


# --- TPC-H headliners (bench + optimizer exercise) ---------------------------
def q_tpch_q6(spark, sf):
    """Forecasting revenue change: pure filter + agg — the pushdown check."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )



def q_tpch_q1(spark, sf):
    """Pricing summary: the classic partial-agg / whole-stage-codegen check."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q3(spark, sf):
    """Shipping priority: selective join + agg + top-N."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q_tpch_q5(spark, sf):
    """Local supplier volume: the multi-join + broadcast-dim pattern."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    # lineitem-centric join order: the FACT table streams and every other
    # input is the build side. Written (o ⋈ c) ⋈ li, the planner's
    # inflated estimate for the o⋈c subtree made it broadcast LINEITEM
    # itself (the largest table — a 600k-row hashed relation at sf0.1,
    # and the one side that can never be broadcast at real scale).
    # Inner-join reordering; the aggregate output is identical.
    return (
        li.join(o.select("o_orderkey", "o_custkey"),
                li["l_orderkey"] == o["o_orderkey"])
        .join(c.select("c_custkey"), o["o_custkey"] == c["c_custkey"])
        .join(s.select("s_suppkey", "s_nationkey"),
              li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


QUERIES = {
    "rel_filters": q_filters,
    "rel_broadcast_lookup": q_broadcast_lookup,
    "rel_semi_anti": q_semi_anti,
    "rel_priority_fallback": q_priority_fallback,
    "rel_merge_update": q_merge_update,
    "rel_union_distinct": q_union_distinct,
    "rel_upsert_policies": q_upsert_policies,
    "rel_group_count": q_group_count,
    "rel_adjacent_suppression": q_adjacent_suppression,
    "rel_window_funcs": q_window_funcs,
    "rel_string_explode": q_string_explode,
    "rel_json_extract": q_json_extract,
    "rel_window_pivot": q_window_pivot,
    "rel_asof_join": q_asof_join,
    "rel_scalar_subquery": q_scalar_subquery,
    "rel_distinct_counts": q_distinct_counts,
    "rel_grouping_sets": q_grouping_sets,
    "tpch_q1": q_tpch_q1,
    "tpch_q6": q_tpch_q6,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
}

ORACLES = {
    "rel_filters": (
        "SELECT event_id, event_type, CASE WHEN value > 50 THEN 'high' "
        "WHEN value IS NOT NULL THEN 'low' ELSE 'missing' END AS value_band, "
        "COALESCE(value, 0.0) AS value_filled FROM events "
        "WHERE event_type IN ('click', 'view', 'purchase') "
        "AND ts >= TIMESTAMP '2024-01-08' AND (value < 90 OR value IS NULL)"
    ),
    "rel_broadcast_lookup": (
        "SELECT o_orderkey, c_name AS customer, n_name AS nation, r_name AS region "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey"
    ),
    "rel_semi_anti": (
        "SELECT c_custkey, c_name, CASE WHEN EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) "
        "THEN 'has_orders' ELSE 'no_orders' END AS gate FROM customer"
    ),
    "rel_priority_fallback": (
        "SELECT event_id, COALESCE(c.c_name, s.s_name, 'unresolved') AS actor "
        "FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey "
        "LEFT JOIN supplier s ON e.user_id = s.s_suppkey"
    ),
    "rel_merge_update": (
        "SELECT COALESCE(l.key, r.key) AS key, "
        "COALESCE(r.name, l.name) AS name, "
        "COALESCE(r.acctbal, l.acctbal) AS acctbal FROM "
        "(SELECT c_custkey AS key, c_name AS name, c_acctbal AS acctbal FROM customer) l "
        "FULL OUTER JOIN "
        "(SELECT s_suppkey AS key, s_name AS name, s_acctbal AS acctbal FROM supplier) r "
        "USING (key)"
    ),
    "rel_union_distinct": (
        "SELECT DISTINCT tag FROM (SELECT p_brand AS tag FROM part "
        "UNION ALL SELECT p_type || '_group' FROM part)"
    ),
    "rel_upsert_policies": (
        "SELECT o_custkey, o_orderkey, o_orderdate, "
        "CASE WHEN rn_f = 1 AND rn_l = 1 THEN 'both' "
        "WHEN rn_f = 1 THEN 'first_wins' ELSE 'last_wins' END AS policy FROM ("
        "SELECT o_custkey, o_orderkey, o_orderdate, "
        "row_number() OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn_f, "
        "row_number() OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_l "
        "FROM orders) WHERE rn_f = 1 OR rn_l = 1"
    ),
    "rel_group_count": (
        "SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value, "
        "round(avg(value), 4) AS avg_value FROM events GROUP BY event_type"
    ),
    "rel_adjacent_suppression": (
        "SELECT l_orderkey, l_linenumber, "
        "unnest(list_distinct([l_returnflag, l_linestatus])) AS flag FROM lineitem"
    ),
    "rel_window_funcs": (
        "SELECT o_custkey, o_orderkey, o_totalprice, rank, prev_orderkey, "
        "next_orderkey FROM ("
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "CAST(row_number() OVER w AS INT) AS rank, "
        "lag(o_orderkey) OVER w AS prev_orderkey, "
        "lead(o_orderkey) OVER w AS next_orderkey "
        "FROM orders WINDOW w AS (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey ASC)) WHERE rank <= 3"
    ),
    "rel_string_explode": (
        "SELECT p_partkey, word, lower(word) AS word_lower, "
        "upper(word[1]) || lower(word[2:]) AS word_title, "
        "p_brand || ':' || p_type AS brand_type, "
        "regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num, "
        "p_type || '_group' AS type_group, "
        "CAST(p_size AS VARCHAR) AS size_str FROM ("
        "SELECT p_partkey, p_brand, p_type, p_size, "
        "unnest(string_split(p_name, ' ')) AS word FROM part)"
    ),
    "rel_json_extract": (
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k "
        "FROM events"
    ),
    "rel_window_pivot": (
        "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
        "count(*) FILTER (WHERE event_type = 'click') AS click, "
        "count(*) FILTER (WHERE event_type = 'view') AS view, "
        "count(*) FILTER (WHERE event_type = 'purchase') AS purchase, "
        "count(*) FILTER (WHERE event_type = 'signup') AS signup, "
        "count(*) FILTER (WHERE event_type = 'error') AS error "
        "FROM events GROUP BY date_trunc('day', ts)"
    ),
    "rel_asof_join": """
SELECT event_id, asof_o_orderkey FROM (
  SELECT event_id, is_left,
         last_value(pk IGNORE NULLS) OVER (
           PARTITION BY k ORDER BY ts, is_left, tb
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_o_orderkey
  FROM (
    SELECT user_id AS k, ts, 1 AS is_left, CAST(NULL AS BIGINT) AS tb,
           event_id, CAST(NULL AS BIGINT) AS pk
    FROM events
    UNION ALL
    SELECT o_custkey, o_orderdate, 0, o_orderkey, NULL, o_orderkey
    FROM orders
  )
) WHERE is_left = 1
""",
    "rel_scalar_subquery": (
        "SELECT c_custkey, c_name, "
        "(SELECT round(max(o_totalprice), 4) FROM orders "
        " WHERE o_custkey = c_custkey) AS max_order "
        "FROM customer WHERE EXISTS (SELECT 1 FROM orders "
        "WHERE o_custkey = c_custkey AND o_orderstatus = 'O')"
    ),
    "rel_distinct_counts": (
        "SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, "
        "count(DISTINCT l_suppkey) AS n_supps FROM lineitem GROUP BY l_returnflag"
    ),
    "rel_grouping_sets": (
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n, "
        "round(sum(o_totalprice), 4) AS total, "
        "CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid "
        "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"
    ),
    "tpch_q6": (
        "SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1994-01-01' "
        "AND l_shipdate < TIMESTAMP '1995-01-01' "
        "AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24"
    ),
    "tpch_q1": (
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 4) AS sum_qty, "
        "round(sum(l_extendedprice), 4) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price, "
        "round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge, "
        "round(avg(l_quantity), 4) AS avg_qty, count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
    ),
    "tpch_q3": (
        "SELECT l_orderkey, o_orderdate, o_orderpriority, "
        "round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15' "
        "AND l_shipdate > TIMESTAMP '1995-03-15' "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"
    ),
    "tpch_q5": (
        "SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY n_name ORDER BY revenue DESC, n_name"
    ),
}
