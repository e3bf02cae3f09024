"""Event-stream analytics (batch semantics of the streaming operators)
with DuckDB oracles: tumbling windows, sessionization, JSON extraction,
ranked top-k. The Structured Streaming twins live in
``pyspark_entity_resolution_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import QuerySpec, load_events

QUERIES: dict[str, QuerySpec] = {}


def q(name: str, sql: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, sql=sql, doc=doc)
        return fn

    return deco


@q(
    "events_windowed_agg",
    """
    SELECT 'tumbling' AS window_kind,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding', strftime(win_start, '%Y-%m-%d %H:%M:%S'), event_type,
           COUNT(*), CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
    FROM (
      SELECT event_type, value,
             unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts - INTERVAL 30 MINUTE)
                       + INTERVAL 30 MINUTE]) AS win_start
      FROM events
    )
    GROUP BY 2, 3
    """,
    "1-hour tumbling-window aggregation + sliding-window aggregation (1h "
    "window, 30min slide: each event lands in 2 windows via F.window), "
    "tagged by window_kind — batch twins of the streaming windowed aggs",
)
def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    tumbling = (
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
        .select(
            F.lit("tumbling").alias("window_kind"),
            "window_start", "event_type", "n_events", "total_value",
        )
    )
    sliding = (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("DECIMAL(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.lit("sliding").alias("window_kind"),
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return tumbling.unionByName(sliding)


@q(
    "events_sessions_pack",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL
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
    SELECT 'per_user' AS variant, user_id,
           CAST(NULL AS VARCHAR) AS session_start,
           CAST(NULL AS VARCHAR) AS session_end,
           CAST(SUM(is_new) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM g GROUP BY user_id
    UNION ALL
    SELECT 'per_session', user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S'),
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S'),
           CAST(NULL AS BIGINT),
           COUNT(*)
    FROM s GROUP BY user_id, session_id
    """,
    "gap-based sessionization (30-min inactivity) two ways, tagged by "
    "variant: per-user session/event counts via lag window (the batch "
    "twin of stateful streaming session windows) + per-session rows via "
    "native session_window (start, gap-extended end, event count — "
    "values-level parity with the lag/cumsum formulation)",
)
def events_sessions_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | (F.col("ts").cast("double") - prev.cast("double") > 1800),
        1,
    ).otherwise(0)
    per_user = (
        e.withColumn("is_new", is_new)
        .groupBy("user_id")
        .agg(
            F.sum("is_new").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.lit("per_user").alias("variant"),
            "user_id",
            F.lit(None).cast("string").alias("session_start"),
            F.lit(None).cast("string").alias("session_end"),
            "n_sessions",
            "n_events",
        )
    )
    per_session = (
        e.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.lit("per_session").alias("variant"),
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.col("win.end"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            F.lit(None).cast("bigint").alias("n_sessions"),
            "n_events",
        )
    )
    return per_user.unionByName(per_session)


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
    "events_grouping_sets",
    """
    SELECT 'rollup' AS grouping_kind,
           CASE WHEN GROUPING(d) = 0 THEN strftime(d, '%Y-%m-%d') END AS day,
           CASE WHEN GROUPING(event_type) = 0 THEN event_type END AS event_type,
           CAST(NULL AS BIGINT) AS dow,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (SELECT date_trunc('day', ts) AS d, event_type, value FROM events)
    GROUP BY ROLLUP (d, event_type)
    UNION ALL
    SELECT 'cube', NULL,
           CASE WHEN GROUPING(event_type) = 0 THEN event_type END,
           CASE WHEN GROUPING(dow) = 0 THEN dow END,
           COUNT(*), CAST(NULL AS DOUBLE)
    FROM (SELECT event_type, CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow
          FROM events)
    GROUP BY CUBE (event_type, dow)
    """,
    "hierarchical rollup (day, event_type) -> daily totals -> grand total "
    "(the hypertable-rollup shape) + full cube over (event_type, "
    "day-of-week): all four grouping combinations in one Expand-based "
    "pass; NULL marks aggregated-out levels, tagged by grouping_kind",
)
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir).select(
        F.date_trunc("day", "ts").alias("d"), "event_type", "value"
    )
    rollup_part = (
        e.rollup("d", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("DECIMAL(18,2)")).cast("double").alias("total_value"),
            F.grouping("d").alias("__gd"),
            F.grouping("event_type").alias("__ge"),
        )
        .select(
            F.lit("rollup").alias("grouping_kind"),
            F.when(F.col("__gd") == 0, F.date_format("d", "yyyy-MM-dd")).alias("day"),
            F.when(F.col("__ge") == 0, F.col("event_type")).alias("event_type"),
            F.lit(None).cast("bigint").alias("dow"),
            "n_events",
            "total_value",
        )
    )
    # DuckDB dow: Sunday=0; Spark dayofweek: Sunday=1 -> normalize
    e2 = load_events(spark, sf_dir).select(
        "event_type", (F.dayofweek("ts") - 1).cast("bigint").alias("dow")
    )
    cube_part = (
        e2.cube("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.grouping("event_type").alias("__gt"),
            F.grouping("dow").alias("__gd"),
        )
        .select(
            F.lit("cube").alias("grouping_kind"),
            F.lit(None).cast("string").alias("day"),
            F.when(F.col("__gt") == 0, F.col("event_type")).alias("event_type"),
            F.when(F.col("__gd") == 0, F.col("dow")).alias("dow"),
            "n_events",
            F.lit(None).cast("double").alias("total_value"),
        )
    )
    return rollup_part.unionByName(cube_part)


