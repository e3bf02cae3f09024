"""Relational operator inventory (SURVEY.md §2.1-2.6) as driver-contract
queries over the TPC-H-ish testdata, each with a DuckDB oracle.

Performance notes (100 TB design):
- Aggregations are expressed groupBy->agg so Catalyst plans partial
  (map-side) aggregation before the shuffle.
- The left joins put the small dimension on the build side; Catalyst
  broadcasts it (verified via explain in tests/bench).
- Filters precede projections so parquet pushdown prunes row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import QuerySpec, load, load_spread

QUERIES: dict[str, QuerySpec] = {}


def q(name: str, sql: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, sql=sql, doc=doc)
        return fn

    return deco


# --------------------------------------------------------------- scans --

@q(
    "scan_parquet_projection",
    "SELECT r_regionkey AS region_key, r_name AS region_name FROM region",
    "S2 parquet scan + P2 projection/alias",
)
def scan_parquet_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("region_key"), F.col("r_name").alias("region_name")
    )


@q(
    "filter_year_date_pack",
    """
    SELECT o_orderkey, o_custkey, o_orderpriority,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS order_quarter,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT)
             AS days_to_epochend,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) BETWEEN 1996 AND 1998
      AND contains(o_orderpriority, 'URGENT')
    """,
    "P5 year-range + substring predicate (reference filter_by_year_and_venue,"
    " src/cleaning.py:163-172) + date/time scalar pack over the filtered "
    "rows: interval add, extract parts, datediff, trunc",
)
def filter_year_date_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.filter(
        F.year("o_orderdate").between(1996, 1998)
        & F.col("o_orderpriority").contains("URGENT")
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.date_format(d, "yyyy-MM-dd").alias("order_date"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.year(d).cast("bigint").alias("order_year"),
        F.quarter(d).cast("bigint").alias("order_quarter"),
        F.month(d).cast("bigint").alias("order_month"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), d)
        .cast("bigint")
        .alias("days_to_epochend"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
    )


# --------------------------------------------------------------- joins --

@q(
    "join_kinds_pack",
    """
    SELECT 'cross' AS join_kind, CAST(NULL AS BIGINT) AS left_key,
           r.r_name AS left_name, n.n_name AS nation_name
    FROM region r CROSS JOIN nation n
    WHERE contains(n.n_name, 'A') AND contains(r.r_name, 'A')
    UNION ALL
    SELECT 'left', s.s_suppkey, s.s_name, n.n_name
    FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    UNION ALL
    SELECT 'semi', c_custkey, c_name, CAST(NULL AS VARCHAR) FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT 'anti', c_custkey, c_name, CAST(NULL AS VARCHAR) FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'P')
    """,
    "join-kind pack, tagged by join_kind: J1 cross join + post-filter "
    "(reference src/match.py:94), J2 left equi-join against a broadcast "
    "dimension (reference src/create_graph.py:69-74), left-semi join "
    "(EXISTS: customers with an urgent order) and left-anti join (NOT "
    "EXISTS: customers with no pending order) — the semi/anti arms were "
    "standalone `semi_anti_join_customers` through r5; merged in r6 to "
    "free a registry slot inside the driver's 50-query verified window",
)
def join_kinds_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    crossed = (
        region.crossJoin(nation)
        .filter(F.col("n_name").contains("A") & F.col("r_name").contains("A"))
        .select(
            F.lit("cross").alias("join_kind"),
            F.lit(None).cast("bigint").alias("left_key"),
            F.col("r_name").alias("left_name"),
            F.col("n_name").alias("nation_name"),
        )
    )
    supplier = load(spark, sf_dir, "supplier")
    dim = F.broadcast(load(spark, sf_dir, "nation"))
    lefted = supplier.join(
        dim, supplier.s_nationkey == dim.n_nationkey, "left"
    ).select(
        F.lit("left").alias("join_kind"),
        F.col("s_suppkey").cast("bigint").alias("left_key"),
        F.col("s_name").alias("left_name"),
        F.col("n_name").alias("nation_name"),
    )
    c = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pending = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")

    def _existence(df, kind):
        return df.select(
            F.lit(kind).alias("join_kind"),
            F.col("c_custkey").cast("bigint").alias("left_key"),
            F.col("c_name").alias("left_name"),
            F.lit(None).cast("string").alias("nation_name"),
        )

    semi = _existence(
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi"), "semi"
    )
    anti = _existence(
        c.join(pending, c.c_custkey == pending.o_custkey, "left_anti"), "anti"
    )
    return crossed.unionByName(lefted).unionByName(semi).unionByName(anti)


# --------------------------------------------------------- aggregations --

@q(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10)) ) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,10))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "A-class hash aggregate with exact decimal accumulation (TPC-H Q1 shape)",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan-out measured-and-REJECTED across scales (r11): spreading the
    # scan wins at sf0.1 (1.26 -> 0.81 s: the eight decimal partial
    # aggregates run map-side on a one-task scan) but LOSES at sf1
    # (1.2-2.8 -> 1.7-9.5 s: the round-robin shuffles 126 MB to
    # parallelize an aggregate whose per-row work is cheaper than the
    # move). Scale wins: plain load, partial aggregation rides the scan.
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c, t="DECIMAL(18,2)": F.col(c).cast(t)
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "DECIMAL(28,10)"
    )
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("DECIMAL(28,10)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@q(
    "join_agg_revenue_by_segment",
    """
    SELECT c.c_mktsegment,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY c.c_mktsegment
    """,
    "multi-join + aggregate (TPC-H Q3 shape); fact-fact sort-merge join with"
    " broadcast customer dim at scale",
)
def join_agg_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = load(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "DECIMAL(28,10)"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@q(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
    "selective scan aggregate; predicate pushdown to parquet (TPC-H Q6 shape)",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("DECIMAL(28,10)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@q(
    "groupby_min_max_count",
    """
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_order,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_custkey
    """,
    "A1-style per-group aggregate with deterministic min/max (reference used"
    " nondeterministic first(), src/create_graph.py:62-64)",
)
def groupby_min_max_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_order"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@q(
    "pivot_distinct_pack",
    """
    SELECT 'pivot' AS kind, o_orderpriority, CAST(NULL AS VARCHAR) AS o_orderstatus,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT DISTINCT 'distinct', o_orderpriority, o_orderstatus,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM orders
    """,
    "A2 pivot aggregate with explicit pivot values (reference "
    "src/create_graph.py:79-87; explicit values skip the distinct scan) + "
    "A4 distinct (reference src/match.py:118-120), tagged by kind",
)
def pivot_distinct_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    # Spark pivot yields NULL for absent combinations; the oracle's FILTER
    # count yields 0 — normalize.
    pivot_part = pivoted.select(
        F.lit("pivot").alias("kind"),
        "o_orderpriority",
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.coalesce("O", F.lit(0)).alias("O"),
        F.coalesce("F", F.lit(0)).alias("F"),
        F.coalesce("P", F.lit(0)).alias("P"),
    )
    distinct_part = (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderstatus")
        .distinct()
        .select(
            F.lit("distinct").alias("kind"),
            "o_orderpriority",
            "o_orderstatus",
            F.lit(None).cast("bigint").alias("O"),
            F.lit(None).cast("bigint").alias("F"),
            F.lit(None).cast("bigint").alias("P"),
        )
    )
    return pivot_part.unionByName(distinct_part)


@q(
    "window_functions_pack",
    """
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey) OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order,
           CAST(row_number() OVER w AS BIGINT) AS order_seq,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS 2 PRECEDING) AS DOUBLE)
             / CAST(least(row_number() OVER w, 3) AS DOUBLE) AS moving_avg3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "window-frame scalar pack over a deterministic unique ordering: "
    "lag/lead navigation, running decimal-exact cumulative sum (ROWS "
    "UNBOUNDED PRECEDING), and a 3-row moving average (ROWS 2 PRECEDING, "
    "exact decimal sum / explicit frame count) — the time-series frame "
    "surface of the engine",
)
def window_functions_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dec = F.col("o_totalprice").cast("DECIMAL(18,2)")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = w.rowsBetween(-2, Window.currentRow)
    seq = F.row_number().over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        seq.cast("bigint").alias("order_seq"),
        F.sum(dec).over(running).cast("double").alias("running_total"),
        (
            F.sum(dec).over(last3).cast("double")
            / F.least(seq, F.lit(3)).cast("double")
        ).alias("moving_avg3"),
    )


# ----------------------------------------------------------- set ops --

@q(
    "set_ops_pack",
    """
    SELECT 'union' AS set_op, CAST(c_custkey AS BIGINT) AS key, c_name AS name
    FROM customer
    UNION ALL
    SELECT 'union', s_suppkey, s_name FROM supplier
    UNION ALL
    SELECT 'intersect', k, NULL FROM (
      SELECT c_nationkey AS k FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT 'except', k, NULL FROM (
      SELECT c_custkey AS k FROM customer
      EXCEPT
      SELECT o_custkey FROM orders
    )
    """,
    "U1 union (bag semantics, by name — reference src/match.py:118 used "
    "positional union), U2 intersect (src/performance.py:13), U3 subtract/"
    "EXCEPT set semantics (src/performance.py:14-15), tagged by set_op",
)
def set_ops_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    union_part = (
        c.select(
            F.col("c_custkey").cast("bigint").alias("key"),
            F.col("c_name").alias("name"),
        )
        .unionByName(
            s.select(
                F.col("s_suppkey").cast("bigint").alias("key"),
                F.col("s_name").alias("name"),
            )
        )
        .select(F.lit("union").alias("set_op"), "key", "name")
    )
    inter_part = (
        c.select(F.col("c_nationkey").cast("bigint").alias("key"))
        .intersect(s.select(F.col("s_nationkey").cast("bigint").alias("key")))
        .select(
            F.lit("intersect").alias("set_op"),
            "key",
            F.lit(None).cast("string").alias("name"),
        )
    )
    except_part = (
        c.select(F.col("c_custkey").cast("bigint").alias("key"))
        .subtract(o.select(F.col("o_custkey").cast("bigint").alias("key")))
        .select(
            F.lit("except").alias("set_op"),
            "key",
            F.lit(None).cast("string").alias("name"),
        )
    )
    return union_part.unionByName(inter_part).unionByName(except_part)


# ------------------------------------------------- scalar function pack --

@q(
    "string_functions_pack",
    """
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           trim(p_name) AS name_trim,
           string_split(p_name, ' ')[1] AS first_token,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
           regexp_replace(p_brand, '[^0-9]', '', 'g') AS brand_digits,
           CAST(contains(p_type, 'ECONOMY') AS BOOLEAN) AS is_economy,
           CAST(p_size AS BIGINT) + 100 AS size_plus,
           lpad(p_brand, 12, '*') AS brand_pad,
           reverse(p_name) AS name_rev,
           replace(p_type, 'ECONOMY', 'ECO') AS type_short,
           split_part(p_name, ' ', 1) AS name_head,
           repeat('-', CAST(p_size % 5 AS INTEGER)) AS size_bar,
           CAST(length(p_name) AS BIGINT) AS name_len,
           CAST(strpos(p_name, 'widget') AS BIGINT) AS widget_pos,
           upper(p_brand) AS brand_upper
    FROM part
    """,
    "F1-F5/F8 scalar string pack: lower/trim/split/getItem/regexp_replace/"
    "contains/cast/arithmetic (reference src/cleaning.py:101-160) plus "
    "pad/reverse/replace/split_part/repeat/length/position/case",
)
def string_functions_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.trim("p_name").alias("name_trim"),
        F.get(toks, 0).alias("first_token"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.regexp_replace("p_brand", "[^0-9]", "").alias("brand_digits"),
        F.col("p_type").contains("ECONOMY").alias("is_economy"),
        (F.col("p_size").cast("bigint") + 100).alias("size_plus"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.reverse("p_name").alias("name_rev"),
        F.replace("p_type", F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
        F.split_part("p_name", F.lit(" "), F.lit(1)).alias("name_head"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5).cast("int")).alias("size_bar"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.instr("p_name", "widget").cast("bigint").alias("widget_pos"),
        F.upper("p_brand").alias("brand_upper"),
    )


@q(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,10))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE EXTRACT(year FROM o.o_orderdate) BETWEEN 1996 AND 1997
    GROUP BY n.n_name
    """,
    "six-table join tree (TPC-H Q5 shape): fact-fact shuffle joins with "
    "broadcast dimensions, aggregate on top",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").between(1996, 1997)
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "DECIMAL(28,10)"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@q(
    "parts_above_brand_average",
    """
    SELECT p_partkey, p_brand, p_retailprice,
           round(brand_avg, 4) AS brand_avg
    FROM (
      SELECT p_partkey, p_brand, p_retailprice,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY p_brand) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY p_brand) AS brand_avg
      FROM part
    )
    WHERE p_retailprice > brand_avg
    """,
    "correlated-aggregate predicate (price above brand average) "
    "decorrelated into a window aggregate — one shuffle, no self-join",
)
def parts_above_brand_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    brand_avg = (
        F.sum(F.col("p_retailprice").cast("DECIMAL(18,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        p.withColumn("brand_avg", brand_avg)
        .filter(F.col("p_retailprice") > F.col("brand_avg"))
        .select(
            "p_partkey", "p_brand", "p_retailprice",
            F.round("brand_avg", 4).alias("brand_avg"),
        )
    )


@q(
    "count_distinct_suppliers_per_nation",
    """
    SELECT n.n_name AS nation_name,
           COUNT(DISTINCT s.s_suppkey) AS n_suppliers,
           COUNT(DISTINCT c.c_custkey) AS n_customers
    FROM nation n
    LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    "multi-column distinct aggregation (expand-based distinct agg plan)",
)
def count_distinct_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey, "left")
        .join(c, F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.countDistinct("s_suppkey").alias("n_suppliers"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
    )


@q(
    "orders_topk_pack",
    """
    WITH g AS (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders
    ),
    p AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders
    )
    SELECT 'global' AS scope, CAST(NULL AS BIGINT) AS o_custkey,
           o_orderkey, o_totalprice, CAST(rank AS BIGINT) AS rank,
           CAST(NULL AS VARCHAR) AS order_years
    FROM g WHERE rank <= 100
    UNION ALL
    SELECT 'per_customer', o_custkey, o_orderkey, o_totalprice,
           CAST(rank AS BIGINT), CAST(NULL AS VARCHAR)
    FROM p WHERE rank <= 3
    UNION ALL
    SELECT 'order_years', o_custkey, CAST(NULL AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),
           array_to_string(list_sort(list(DISTINCT EXTRACT(year FROM o_orderdate)::VARCHAR)), ',')
    FROM orders GROUP BY o_custkey
    """,
    "orders-table shaping pack, tagged by scope: global deterministic "
    "top-N (TakeOrderedAndProject — per-partition heaps + driver merge, "
    "no full sort shuffle; rank attached after the 100-row limit), "
    "per-group top-k via rank window tie-broken on the unique key, and "
    "the collection aggregate (per-customer sorted distinct year list: "
    "collect_set -> sort_array -> join — deterministic despite unordered "
    "aggregation input; standalone `array_agg_order_years` through r5, "
    "merged in r6 to free a registry slot inside the driver's 50-query "
    "verified window)",
)
def orders_topk_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    top100 = (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )
    # rank over the already-reduced 100 rows (cheap single-partition window)
    wg = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    global_part = top100.select(
        F.lit("global").alias("scope"),
        F.lit(None).cast("bigint").alias("o_custkey"),
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(wg).cast("bigint").alias("rank"),
    )
    wp = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    per_cust = (
        o.withColumn("rank", F.row_number().over(wp))
        .filter(F.col("rank") <= 3)
        .select(
            F.lit("per_customer").alias("scope"),
            F.col("o_custkey").cast("bigint").alias("o_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.col("rank").cast("bigint").alias("rank"),
            F.lit(None).cast("string").alias("order_years"),
        )
    )
    global_part = global_part.withColumn(
        "order_years", F.lit(None).cast("string")
    )
    years = F.collect_set(F.year("o_orderdate").cast("string"))
    order_years = o.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(years), ",").alias("order_years")
    ).select(
        F.lit("order_years").alias("scope"),
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(None).cast("bigint").alias("rank"),
        "order_years",
    )
    return global_part.unionByName(per_cust).unionByName(order_years)


_SAMPLE_BUCKET_SQL = (
    "('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 6))::BIGINT % 1000000"
)


# mix_sources oracle: the same IEEE-double dance the Python operator
# performs, op-for-op (sum order, (w * t) / n association, floor-not-
# round, the one-bucket clamp) so the CASE thresholds come out
# bit-identical — see operators/sampling.py mix_sources
_MIX_W = "(0.5 / ((0.5 + 0.3) + 0.2))", "(0.3 / ((0.5 + 0.3) + 0.2))", \
    "(0.2 / ((0.5 + 0.3) + 0.2))"
_MIX_SQL = f"""
    mix_counts AS (
      SELECT
        SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS n1,
        SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS n2,
        SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS n3
      FROM orders
    ),
    mix_thr AS (
      SELECT
        CAST(floor(greatest(least(1.0, ({_MIX_W[0]} * t) / n1), 0.000001)
             * 1000000) AS BIGINT) AS th1,
        CAST(floor(greatest(least(1.0, ({_MIX_W[1]} * t) / n2), 0.000001)
             * 1000000) AS BIGINT) AS th2,
        CAST(floor(greatest(least(1.0, ({_MIX_W[2]} * t) / n3), 0.000001)
             * 1000000) AS BIGINT) AS th3
      FROM (
        SELECT least(n1 / {_MIX_W[0]}, n2 / {_MIX_W[1]}, n3 / {_MIX_W[2]}) AS t,
               n1, n2, n3
        FROM mix_counts
      )
    )
"""


@q(
    "deterministic_sample",
    f"""
    WITH {_MIX_SQL}
    SELECT 'flat' AS rule, o_orderkey, o_custkey FROM orders
    WHERE {_SAMPLE_BUCKET_SQL} < 100000
    UNION ALL
    SELECT 'stratified', o_orderkey, o_custkey FROM orders
    WHERE {_SAMPLE_BUCKET_SQL} <
      CASE o_orderpriority
        WHEN '1-URGENT' THEN 300000
        WHEN '2-HIGH' THEN 150000
        ELSE 50000
      END
    UNION ALL
    SELECT 'mix', o_orderkey, o_custkey FROM orders, mix_thr
    WHERE {_SAMPLE_BUCKET_SQL} <
      CASE o_orderpriority
        WHEN '1-URGENT' THEN th1
        WHEN '2-HIGH' THEN th2
        WHEN '3-MEDIUM' THEN th3
        ELSE 0
      END
    """,
    "deterministic hash sampling (md5-bucket filter): reproducible across "
    "engines/runs/retries unlike rand()-based sampling. 'flat' = uniform "
    "~10%; 'stratified' = per-priority rates; 'mix' = mix_sources "
    "weight-targeted no-oversample source mixing (50/30/20 over three "
    "priorities: the binding source kept whole, the rest hash-sampled to "
    "their shares — the oracle recomputes the thresholds from scratch, "
    "so the K-row collect + rate arithmetic is hash-verified, not just "
    "unit-tested)",
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    sections = deterministic_sample_sections(spark, sf_dir)
    return (sections["flat"]
            .unionByName(sections["stratified"])
            .unionByName(sections["mix"]))


def deterministic_sample_sections(
    spark: SparkSession, sf_dir: str
) -> "dict[str, DataFrame]":
    """The pack's sampling rules, individually addressable — the pack
    is their union, and `bench.py --full` also times each rule
    separately so a widened pack's cost stays attributable from the
    artifact alone (the 'mix' rule pays a K-row collect for its rate
    computation that 'flat'/'stratified' never do)."""
    from ..operators.sampling import (
        hash_sample,
        mix_sources,
        stratified_hash_sample,
    )

    o = load(spark, sf_dir, "orders")
    flat = hash_sample(o, "o_orderkey", 0.10).select(
        F.lit("flat").alias("rule"), "o_orderkey", "o_custkey"
    )
    strat = stratified_hash_sample(
        o, "o_orderkey", "o_orderpriority",
        rates={"1-URGENT": 0.30, "2-HIGH": 0.15},
        default_rate=0.05,
    ).select(F.lit("stratified").alias("rule"), "o_orderkey", "o_custkey")
    mix = mix_sources(
        o, "o_orderkey", "o_orderpriority",
        weights={"1-URGENT": 0.5, "2-HIGH": 0.3, "3-MEDIUM": 0.2},
    ).select(F.lit("mix").alias("rule"), "o_orderkey", "o_custkey")
    return {"flat": flat, "stratified": strat, "mix": mix}


@q(
    "data_profile_pack",
    """
    WITH nn AS (SELECT COUNT(*) AS n FROM customer)
    SELECT 'table' AS section, '*' AS key, 'n_rows' AS metric,
           CAST(n AS DOUBLE) AS value_num, CAST(NULL AS VARCHAR) AS value_str
    FROM nn
    UNION ALL
    SELECT 'column', 'c_custkey', 'n_null',
           CAST(COUNT(*) - COUNT(c_custkey) AS DOUBLE), NULL FROM customer
    UNION ALL
    SELECT 'column', 'c_custkey', 'n_distinct',
           CAST(COUNT(DISTINCT c_custkey) AS DOUBLE), NULL FROM customer
    UNION ALL
    SELECT 'column', 'c_custkey', 'min', CAST(MIN(c_custkey) AS DOUBLE), NULL
    FROM customer
    UNION ALL
    SELECT 'column', 'c_custkey', 'max', CAST(MAX(c_custkey) AS DOUBLE), NULL
    FROM customer
    UNION ALL
    SELECT 'column', 'c_custkey', 'avg',
           round(CAST(SUM(CAST(c_custkey AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(c_custkey), 4), NULL
    FROM customer
    UNION ALL
    SELECT 'column', 'c_acctbal', 'n_null',
           CAST(COUNT(*) - COUNT(c_acctbal) AS DOUBLE), NULL FROM customer
    UNION ALL
    SELECT 'column', 'c_acctbal', 'n_distinct',
           CAST(COUNT(DISTINCT c_acctbal) AS DOUBLE), NULL FROM customer
    UNION ALL
    SELECT 'column', 'c_acctbal', 'min', CAST(MIN(c_acctbal) AS DOUBLE), NULL
    FROM customer
    UNION ALL
    SELECT 'column', 'c_acctbal', 'max', CAST(MAX(c_acctbal) AS DOUBLE), NULL
    FROM customer
    UNION ALL
    SELECT 'column', 'c_acctbal', 'avg',
           round(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(c_acctbal), 4), NULL
    FROM customer
    UNION ALL
    SELECT 'column', 'c_mktsegment', 'n_null',
           CAST(COUNT(*) - COUNT(c_mktsegment) AS DOUBLE), NULL FROM customer
    UNION ALL
    SELECT 'column', 'c_mktsegment', 'n_distinct',
           CAST(COUNT(DISTINCT c_mktsegment) AS DOUBLE), NULL FROM customer
    UNION ALL
    SELECT 'column', 'c_mktsegment', 'min', NULL, MIN(c_mktsegment) FROM customer
    UNION ALL
    SELECT 'column', 'c_mktsegment', 'max', NULL, MAX(c_mktsegment) FROM customer
    UNION ALL
    SELECT 'column', 'c_name', 'n_null',
           CAST(COUNT(*) - COUNT(c_name) AS DOUBLE), NULL FROM customer
    UNION ALL
    SELECT 'column', 'c_name', 'n_distinct',
           CAST(COUNT(DISTINCT c_name) AS DOUBLE), NULL FROM customer
    UNION ALL
    SELECT 'column', 'c_name', 'min', NULL, MIN(c_name) FROM customer
    UNION ALL
    SELECT 'column', 'c_name', 'max', NULL, MAX(c_name) FROM customer
    UNION ALL
    SELECT 'percentile', c_mktsegment, 'median_price',
           round(quantile_cont(o_totalprice, 0.5), 4), NULL
    FROM customer JOIN orders ON c_custkey = o_custkey GROUP BY c_mktsegment
    UNION ALL
    SELECT 'percentile', c_mktsegment, 'p95_price',
           round(quantile_cont(o_totalprice, 0.95), 4), NULL
    FROM customer JOIN orders ON c_custkey = o_custkey GROUP BY c_mktsegment
    UNION ALL
    SELECT 'topk', v, 'count', CAST(c AS DOUBLE), NULL FROM (
      SELECT c_mktsegment AS v, COUNT(*) AS c FROM customer
      GROUP BY c_mktsegment ORDER BY c DESC, v LIMIT 3
    )
    """,
    "dataset profiling pack: single-scan per-column profile (nulls, exact "
    "cardinality, range, decimal-accumulated mean), exact interpolated "
    "percentiles per group, and exact heavy hitters — the long-format "
    "(section, key, metric, value) report a 100 TB ingest runs first; "
    "the HLL/percentile-sketch variant is profile_columns_approx",
)
def data_profile_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import profile as P

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    prof = P.profile_columns(
        c, ["c_custkey", "c_acctbal", "c_mktsegment", "c_name"],
        include_stddev=False,
    )
    pct = P.group_percentiles(
        c.join(o, c.c_custkey == o.o_custkey),
        "c_mktsegment",
        "o_totalprice",
        {"median_price": 0.5, "p95_price": 0.95},
    )
    top = P.heavy_hitters(c, "c_mktsegment", k=3)
    return prof.unionByName(pct).unionByName(top)


@q(
    "unpivot_lineitem_metrics",
    """
    SELECT l_orderkey, l_linenumber, metric, value
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem WHERE l_orderkey < 1000
    )
    UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount))
    """,
    "unpivot/melt: wide metric columns -> long (metric, value) rows",
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@q(
    "math_functions_pack",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25) AS qty_dev,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
           CAST(floor(sqrt(l_extendedprice) * 10000 + 0.5) AS BIGINT) AS price_sqrt_q,
           CAST(floor(ln(l_extendedprice + 1) * 10000 + 0.5) AS BIGINT) AS price_ln_q,
           CAST(floor(power(1 + l_tax, 2) * 10000 + 0.5) AS BIGINT) AS tax_compound_q,
           CAST(sign(l_quantity - 25) AS BIGINT) AS qty_sign,
    CAST(CAST(l_quantity AS BIGINT) % 7 AS BIGINT) AS qty_mod
    FROM lineitem WHERE l_orderkey < 500
    """,
    "math scalar pack: abs/ceil/floor/round/sqrt/ln/power/sign/mod. "
    "Transcendentals are quantized as floor(x*1e4 + 0.5) -> BIGINT rather "
    "than round(): round() implementations diverge across engines on "
    "boundary values (Spark rounds the shortest decimal repr HALF_UP, "
    "DuckDB multiplies and rounds the scaled double), whereas floor of a "
    "bit-identical double is bit-identical. sign() is cast BIGINT on both "
    "sides: DuckDB sign() yields TINYINT while Spark signum yields DOUBLE, "
    "which stringify as 1 vs 1.0 under value-hash comparison",
)
def math_functions_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k_ceil"),
        F.floor(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
        F.floor(F.sqrt("l_extendedprice") * 10000 + 0.5).cast("bigint").alias("price_sqrt_q"),
        F.floor(F.log(F.col("l_extendedprice") + 1) * 10000 + 0.5).cast("bigint").alias("price_ln_q"),
        F.floor(F.pow(F.col("l_tax") + 1, 2) * 10000 + 0.5).cast("bigint").alias("tax_compound_q"),
        F.signum(F.col("l_quantity") - 25).cast("bigint").alias("qty_sign"),
        (F.col("l_quantity").cast("bigint") % 7).cast("bigint").alias("qty_mod"),
    )


@q(
    "skew_salted_join_agg",
    """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    "skew-mitigated join: the large side carries a deterministic "
    "xxhash64 salt, the small side replicates num_salts-fold, and the "
    "join key becomes (custkey, salt) — spreading any hot key across 8 "
    "reducers. The oracle is the PLAIN join: salting must be "
    "result-invariant, which is exactly what this row proves",
)
def skew_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(o, c, on=["c_custkey"], num_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("DECIMAL(18,2)")).cast("double").alias("total"),
    )


@q(
    "sql_api_revenue_by_nation",
    """
    SELECT n.n_name AS nation_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    "pure spark.sql() entry point: tables registered as temp views, query "
    "authored as SQL text — the engine's SQL API surface (same Catalyst "
    "plan as the DataFrame form)",
)
def sql_api_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    return spark.sql(
        """
        SELECT n.n_name AS nation_name,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM v_orders o
        JOIN v_customer c ON o.o_custkey = c.c_custkey
        JOIN v_nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


@q(
    "merge_upsert_conditional",
    """
    WITH updates AS (  -- deterministic 10% of customers get new balances,
                       -- plus synthetic new rows
      SELECT c_custkey AS k, c_name AS u_name,
             round(c_acctbal + 1000, 2) AS u_acctbal
      FROM customer
      WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6))::BIGINT % 10 = 0
      UNION ALL
      SELECT c_custkey + 1000000 AS k, c_name AS u_name, 0.0 AS u_acctbal
      FROM customer
      WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6))::BIGINT % 50 = 0
    )
    SELECT coalesce(u.k, c.c_custkey) AS c_custkey,
           coalesce(u.u_name, c.c_name) AS c_name,
           coalesce(u.u_acctbal, c.c_acctbal) AS c_acctbal,
           CASE WHEN u.k IS NULL THEN 'unchanged'
                WHEN c.c_custkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS merge_action,
           CASE WHEN coalesce(u.u_acctbal, c.c_acctbal) < 0 THEN 'debtor'
                WHEN coalesce(u.u_acctbal, c.c_acctbal) < 5000 THEN 'standard'
                ELSE 'premium' END AS tier,
           coalesce(nullif(c.c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_ex,
           greatest(coalesce(u.u_acctbal, c.c_acctbal), 0.0) AS bal_floor,
           least(coalesce(CAST(c.c_nationkey AS BIGINT), 0), 10) AS nk_cap
    FROM customer c FULL OUTER JOIN updates u ON c.c_custkey = u.k
    """,
    "MERGE INTO / SCD-1 upsert as a full-outer join + coalesce: updates "
    "win, inserts append, base rows survive — the parquet-lake merge "
    "pattern (one shuffle on the key). The merged rows then feed the "
    "conditional scalar pack: CASE bands, coalesce/nullif, greatest/least",
)
def merge_upsert_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    bucket = (
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
    )
    updates = (
        c.filter(bucket % 10 == 0)
        .select(
            F.col("c_custkey").alias("k"),
            F.col("c_name").alias("u_name"),
            F.round(F.col("c_acctbal") + 1000, 2).alias("u_acctbal"),
        )
        .unionByName(
            c.filter(bucket % 50 == 0).select(
                (F.col("c_custkey") + 1000000).alias("k"),
                F.col("c_name").alias("u_name"),
                F.lit(0.0).alias("u_acctbal"),
            )
        )
    )
    merged = c.join(updates, c.c_custkey == updates.k, "full_outer")
    bal = F.coalesce("u_acctbal", "c_acctbal")
    return merged.select(
        F.coalesce("k", "c_custkey").alias("c_custkey"),
        F.coalesce("u_name", "c_name").alias("c_name"),
        bal.alias("c_acctbal"),
        F.when(F.col("k").isNull(), "unchanged")
        .when(F.col("c_custkey").isNull(), "inserted")
        .otherwise("updated")
        .alias("merge_action"),
        F.when(bal < 0, "debtor")
        .when(bal < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "segment_ex"
        ),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor"),
        F.least(F.coalesce(F.col("c_nationkey").cast("bigint"), F.lit(0)), F.lit(10)).alias(
            "nk_cap"
        ),
    )
