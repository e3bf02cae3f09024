"""Structured Streaming operators.

The reference has no streaming surface (SURVEY.md §2.9); these are the
engine's scale extensions: event streams land as files/Kafka, and the
same declarative transformations run incrementally with watermarked
state. Each operator takes/returns streaming DataFrames, so callers
compose them exactly like the batch plans.

Design for scale: watermarks bound state; aggregations are keyed by
(window, event_type)-style compound keys so state shards across
executors; dedup uses dropDuplicatesWithinWatermark so the id-set state
is GC'd with event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, schema: StructType = EVENT_SCHEMA
) -> DataFrame:
    """File-based event stream (parquet drops into ``path``); swap for a
    Kafka source in production — the downstream plan is identical."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "10 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding) window counts/sums per event
    type with late-data bound.

    Streaming twin of the batch ``events_windowed_agg`` query (both
    window kinds).
    """
    win = (
        F.window("ts", window_duration, slide)
        if slide
        else F.window("ts", window_duration)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("DECIMAL(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    id_cols: list[str] = ("event_id",),
    watermark: str = "30 minutes",
) -> DataFrame:
    """Exactly-once-style id dedup with state GC'd by watermark."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Native session windows (gap-based) per user — the streaming twin of
    the batch lag-window sessionization."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_to_memory_sink(
    stream: DataFrame, query_name: str, output_mode: str = "append"
):
    """Drain a stream with availableNow into an in-memory table (tests /
    local smoke); production uses parquet/Delta sinks with checkpoints."""
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_user_totals(
    events: DataFrame,
    watermark: str = "1 hour",
    reap_idle_state: bool = False,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value total, emitted per micro-batch.

    This is the escape hatch for stateful logic the built-in windowed
    aggregations can't express (per-key accumulators, custom eviction).
    State is a tiny (n, total) tuple per user, sharded by the groupBy key
    across executors.

    ``reap_idle_state`` turns on ProcessingTimeTimeout-based state GC for
    long-running production triggers; leave it off for availableNow/
    drain-style runs (a pending timeout makes the scheduler keep
    re-triggering empty micro-batches forever, so the drain never
    finishes — observed 228 epochs on a 50-row input).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if reap_idle_state
        else GroupStateTimeout.NoTimeout
    )
    update = _make_totals_update(reap_idle_state)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )


def _make_totals_update(reap_idle_state: bool):
    """Build the per-key state-update function (module-level so the
    timeout/GC branch is unit-testable against a stub GroupState)."""
    import pandas as pd

    def update(key, pdf_iter, state):
        if reap_idle_state and state.hasTimedOut:
            # Idle-key GC: drop the accumulator and emit nothing. Without
            # this branch a timeout invocation would re-update + re-arm the
            # timeout, so state would never be reaped and timed-out keys
            # would re-trigger (and re-emit a spurious row) forever.
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        if reap_idle_state:
            state.setTimeoutDuration(24 * 3600 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return update


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "30 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: pair each left event with right
    events for the same ``key`` whose timestamp falls in
    ``[left.ts, left.ts + within]`` (the ad-tech impression->click /
    trigger->conversion attribution shape).

    Both inputs buffer rows in join state; the watermarks plus the
    explicit time-range condition let Spark derive per-side state
    watermarks and evict buffered rows as event time advances — state
    stays bounded by ``watermark + within`` regardless of stream length,
    and the state store shards by the equi-join key across executors.
    ``how="left_outer"`` additionally emits null-padded left rows once
    the watermark proves no match can arrive (outer results are
    therefore delayed by the watermark, not dropped).

    Output columns are prefixed ``l_``/``r_`` (the two sides usually
    share a schema).
    """
    l = left.withWatermark("ts", left_watermark).select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns]
    )
    r = right.withWatermark("ts", right_watermark).select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)


def attribute_conversions(
    events: DataFrame,
    trigger_type: str = "click",
    conversion_type: str = "purchase",
    within: str = "30 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "2 hours",
) -> DataFrame:
    """Split one event stream by type and attribute conversions to the
    trigger events that precede them: (trigger event) x (conversion by
    the same user within ``within``). Returns (user_id, trigger_id,
    conversion_id, trigger_ts, conversion_ts, conversion_value)."""
    joined = stream_stream_interval_join(
        events.filter(F.col("event_type") == trigger_type),
        events.filter(F.col("event_type") == conversion_type),
        key="user_id",
        within=within,
        left_watermark=left_watermark,
        right_watermark=right_watermark,
    )
    return joined.select(
        F.col("l_user_id").alias("user_id"),
        F.col("l_event_id").alias("trigger_id"),
        F.col("r_event_id").alias("conversion_id"),
        F.col("l_ts").alias("trigger_ts"),
        F.col("r_ts").alias("conversion_ts"),
        F.col("r_value").alias("conversion_value"),
    )


def run_foreach_batch_parquet(
    stream: DataFrame,
    dest: str,
    checkpoint: str,
    batch_fn=None,
):
    """Production-style sink: foreachBatch writing parquet with a
    checkpoint. Restarting with the same checkpoint resumes from the last
    committed offset — already-processed input is not re-emitted
    (exactly-once file output per epoch). ``batch_fn(df, epoch_id)``
    overrides the default append write."""

    def default_fn(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("append").parquet(dest)

    return (
        stream.writeStream.foreachBatch(batch_fn or default_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
