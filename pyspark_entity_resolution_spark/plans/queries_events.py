"""Event-stream analytics (batch semantics of the streaming operators)
with DuckDB oracles: tumbling windows, sessionization, JSON extraction,
ranked top-k. The Structured Streaming twins live in
``pyspark_entity_resolution_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import QuerySpec, load, load_events

QUERIES: dict[str, QuerySpec] = {}


def q(name: str, sql: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, sql=sql, doc=doc)
        return fn

    return deco


@q(
    "events_tumbling_window",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "1-hour tumbling-window aggregation (batch twin of the streaming "
    "windowed count; watermarked variant in streaming/)",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("DECIMAL(18,2)")).cast("double").alias("total_value"),
        )
    )


@q(
    "events_sessionization",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    )
    SELECT user_id,
           CAST(SUM(is_new) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM g GROUP BY user_id
    """,
    "gap-based sessionization (30-min inactivity) via lag window — the "
    "batch twin of stateful streaming session windows",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | (F.col("ts").cast("double") - prev.cast("double") > 1800),
        1,
    ).otherwise(0)
    return (
        e.withColumn("is_new", is_new)
        .groupBy("user_id")
        .agg(
            F.sum("is_new").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@q(
    "events_json_extract",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS total_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / COUNT(*) AS avg_k
    FROM events GROUP BY event_type
    """,
    "JSON property extraction + aggregate (semi-structured column support)",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).cast("bigint").alias("total_k"),
            (F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
    )


@q(
    "orders_topk_per_customer",
    """
    WITH r AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
    """,
    "deterministic per-group top-k via rank window (tie-broken on the "
    "unique key)",
)
def orders_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


@q(
    "events_asof_join",
    """
    WITH p AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    e AS (  -- one error per (user, ts): max event_id breaks exact-ts ties
      SELECT user_id, ts, max(event_id) AS err_id
      FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    )
    SELECT p.event_id AS purchase_id,
           e.err_id AS last_error_id,
           CAST(date_diff('second', e.ts, p.ts) AS BIGINT) AS gap_sec
    FROM p ASOF LEFT JOIN e
      ON p.user_id = e.user_id AND e.ts <= p.ts
    """,
    "as-of join (most recent prior event): composed from union + one "
    "last-ignorenulls window pass — a single shuffle on the key, no range "
    "cross join; oracle uses DuckDB's native ASOF JOIN",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import as_of_join

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("err_id"))
    )
    joined = as_of_join(purchases, errors, on=["user_id"])
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        F.col("err_id_right").alias("last_error_id"),
        (F.col("ts").cast("long") - F.col("ts_right").cast("long"))
        .cast("bigint")
        .alias("gap_sec"),
    )


@q(
    "events_rollup_daily",
    """
    SELECT CASE WHEN GROUPING(d) = 0 THEN strftime(d, '%Y-%m-%d') END AS day,
           CASE WHEN GROUPING(event_type) = 0 THEN event_type END AS event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (SELECT date_trunc('day', ts) AS d, event_type, value FROM events)
    GROUP BY ROLLUP (d, event_type)
    """,
    "hierarchical rollup (day, event_type) -> daily totals -> grand total "
    "(the hypertable-rollup shape); NULL marks aggregated-out levels",
)
def events_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        F.date_trunc("day", "ts").alias("d"), "event_type", "value"
    )
    return (
        e.rollup("d", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("DECIMAL(18,2)")).cast("double").alias("total_value"),
            F.grouping("d").alias("__gd"),
            F.grouping("event_type").alias("__ge"),
        )
        .select(
            F.when(F.col("__gd") == 0, F.date_format("d", "yyyy-MM-dd")).alias("day"),
            F.when(F.col("__ge") == 0, F.col("event_type")).alias("event_type"),
            "n_events",
            "total_value",
        )
    )


@q(
    "events_sliding_window",
    """
    WITH w AS (
      SELECT event_type, value,
             unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts - INTERVAL 30 MINUTE)
                       + INTERVAL 30 MINUTE]) AS win_start
      FROM events
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM w GROUP BY 1, 2
    """,
    "sliding-window aggregation (1h window, 30min slide): each event lands"
    " in 2 windows via F.window; batch twin of the streaming sliding agg",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("DECIMAL(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@q(
    "events_cube_type_day",
    """
    SELECT CASE WHEN GROUPING(event_type) = 0 THEN event_type END AS event_type,
           CASE WHEN GROUPING(dow) = 0 THEN dow END AS dow,
           COUNT(*) AS n_events
    FROM (SELECT event_type, CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow
          FROM events)
    GROUP BY CUBE (event_type, dow)
    """,
    "full cube over (event_type, day-of-week): all four grouping "
    "combinations in one pass (Expand-based plan)",
)
def events_cube_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        "event_type", F.dayofweek("ts").alias("__dow")
    )
    # DuckDB dow: Sunday=0; Spark dayofweek: Sunday=1 -> normalize
    e = e.select("event_type", (F.col("__dow") - 1).cast("bigint").alias("dow"))
    return (
        e.cube("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.grouping("event_type").alias("__gt"),
            F.grouping("dow").alias("__gd"),
        )
        .select(
            F.when(F.col("__gt") == 0, F.col("event_type")).alias("event_type"),
            F.when(F.col("__gd") == 0, F.col("dow")).alias("dow"),
            "n_events",
        )
    )


@q(
    "events_session_windows",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
             AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
    "per-session rows via native session_window (30-min gap): start, "
    "gap-extended end, event count — values-level parity with the "
    "lag/cumsum formulation",
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.col("win.end"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
        )
    )
