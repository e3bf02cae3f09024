"""Structured Streaming operator tests (availableNow -> memory sink),
cross-checked against the batch twins."""

import shutil

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.plans.common import load_events
from pyspark_entity_resolution_spark.streaming.pipeline import (
    read_event_stream,
    run_to_memory_sink,
    session_windows,
    streaming_dedup,
    windowed_counts,
)


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """Stream-source dir: the sf0.001 events re-encoded as µs timestamps
    (stream readers hit the same NANOS limitation as batch)."""
    d = tmp_path_factory.mktemp("events_stream")
    load_events(spark, "/root/testdata/sf0.001").write.mode("overwrite").parquet(
        str(d / "data")
    )
    return str(d / "data")


def test_windowed_counts_matches_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    assert stream.isStreaming
    query = run_to_memory_sink(
        windowed_counts(stream), "win_counts", output_mode="complete"
    )
    query.processAllAvailable()
    query.stop()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from win_counts").collect()
    }

    batch = (
        spark.read.parquet(event_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("DECIMAL(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events", "total_value")
    )
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got == expected
    assert len(got) > 100


def test_streaming_dedup(spark, event_dir, tmp_path):
    # duplicate the source files -> every event appears twice in the stream
    dup_dir = tmp_path / "dup"
    shutil.copytree(event_dir, dup_dir)
    for f in (dup_dir).glob("part-*.parquet"):
        shutil.copy(f, dup_dir / ("copy-" + f.name))

    stream = read_event_stream(spark, str(dup_dir))
    query = run_to_memory_sink(streaming_dedup(stream), "dedup_events")
    query.processAllAvailable()
    query.stop()

    n_distinct = spark.read.parquet(event_dir).select("event_id").distinct().count()
    got = spark.sql("select count(*) c from dedup_events").collect()[0]["c"]
    assert got == n_distinct


def test_session_windows_run(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    query = run_to_memory_sink(
        session_windows(stream), "sessions", output_mode="complete"
    )
    query.processAllAvailable()
    query.stop()
    rows = spark.sql(
        "select user_id, count(*) n, sum(n_events) total from sessions group by user_id"
    ).collect()
    assert len(rows) > 0
    total_events = sum(r["total"] for r in rows)
    assert total_events == spark.read.parquet(event_dir).count()


def test_running_user_totals_stateful(spark, event_dir):
    from pyspark_entity_resolution_spark.streaming.pipeline import (
        running_user_totals,
    )

    stream = read_event_stream(spark, event_dir)
    query = run_to_memory_sink(
        running_user_totals(stream), "user_totals", output_mode="update"
    )
    query.processAllAvailable()
    query.stop()
    # single availableNow batch -> one row per user with the full totals
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            "select user_id, n_events, total_value from ("
            "  select *, row_number() over "
            "  (partition by user_id order by n_events desc) as rk"
            "  from user_totals) where rk = 1"
        ).collect()
    }
    batch = (
        spark.read.parquet(event_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("t"))
    )
    expected = {r["user_id"]: (r["n"], r["t"]) for r in batch.collect()}
    assert set(got) == set(expected)
    for uid, (n, t) in expected.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - t) < 0.05  # float accumulation tolerance


def test_foreach_batch_checkpoint_recovery(spark, event_dir, tmp_path):
    from pyspark_entity_resolution_spark.streaming.pipeline import (
        run_foreach_batch_parquet,
    )

    # private copy: this test APPENDS to the source dir, and event_dir is
    # a module-scoped fixture shared with the other streaming tests
    src = str(tmp_path / "src")
    shutil.copytree(event_dir, src)
    event_dir = src

    dest = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n_src = spark.read.parquet(event_dir).count()

    q = run_foreach_batch_parquet(read_event_stream(spark, event_dir), dest, ckpt)
    q.processAllAvailable(); q.stop()
    assert spark.read.parquet(dest).count() == n_src

    # restart with the SAME checkpoint and no new input -> nothing re-emitted
    q2 = run_foreach_batch_parquet(read_event_stream(spark, event_dir), dest, ckpt)
    q2.processAllAvailable(); q2.stop()
    assert spark.read.parquet(dest).count() == n_src

    # drop new files in -> only the delta lands
    extra = spark.read.parquet(event_dir).limit(25)
    extra.write.mode("append").parquet(event_dir)
    q3 = run_foreach_batch_parquet(read_event_stream(spark, event_dir), dest, ckpt)
    q3.processAllAvailable(); q3.stop()
    assert spark.read.parquet(dest).count() == n_src + 25


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg: an event arriving behind the watermark is
    dropped from its (already finalized) window."""
    from datetime import datetime

    from pyspark_entity_resolution_spark.streaming.pipeline import (
        EVENT_SCHEMA,
        read_event_stream,
        windowed_counts,
    )

    src = tmp_path / "src"
    src.mkdir()

    def write_batch(name, rows):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def ev(eid, ts):
        return (eid, ts, 1, "click", 1.0, "{}")

    # batch 1: three events in the 12:00 window + one at 14:00 that pushes
    # the watermark (30 min) to 13:30, past the 12:00 window's end
    write_batch("b1", [
        ev(1, datetime(2024, 6, 1, 12, 0, 5)),
        ev(2, datetime(2024, 6, 1, 12, 20, 0)),
        ev(3, datetime(2024, 6, 1, 12, 40, 0)),
        ev(4, datetime(2024, 6, 1, 14, 0, 0)),
    ])

    stream = read_event_stream(spark, str(src))
    query = (
        windowed_counts(stream, window_duration="1 hour", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
        # batch 2: a LATE event for the 12:00 window (behind the 13:30
        # watermark) -> must be dropped
        write_batch("b2", [ev(5, datetime(2024, 6, 1, 12, 30, 0))])
        query.processAllAvailable()
    finally:
        query.stop()

    rows = {
        r["window_start"]: r["n_events"]
        for r in spark.sql("select * from late_test").collect()
    }
    noon = datetime(2024, 6, 1, 12, 0, 0)
    assert rows.get(noon) == 3, rows  # late event 5 NOT counted


def test_stream_stream_join_matches_batch(spark, event_dir):
    """Inner watermarked stream-stream interval join == the equivalent
    batch join (every click x purchase by the same user within 30 min)."""
    from pyspark_entity_resolution_spark.streaming.pipeline import (
        attribute_conversions,
    )

    stream = read_event_stream(spark, event_dir)
    query = run_to_memory_sink(attribute_conversions(stream), "attributions")
    query.processAllAvailable()
    query.stop()
    got = {
        (r["trigger_id"], r["conversion_id"])
        for r in spark.sql("select * from attributions").collect()
    }

    ev = spark.read.parquet(event_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("event_id").alias("trigger_id"), F.col("ts").alias("l_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("conversion_id"), F.col("ts").alias("r_ts")
    )
    batch = clicks.join(purchases, "user_id").filter(
        (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 30 minutes"))
    )
    expected = {
        (r["trigger_id"], r["conversion_id"]) for r in batch.collect()
    }
    assert got == expected
    assert len(got) > 0  # fixture actually exercises the join


def test_stream_stream_left_outer_emits_unmatched(spark, tmp_path):
    """left_outer: once the watermark passes, an unmatched left row is
    emitted null-padded rather than dropped."""
    from datetime import datetime

    from pyspark_entity_resolution_spark.streaming.pipeline import (
        EVENT_SCHEMA,
        stream_stream_interval_join,
    )

    src = tmp_path / "src"

    def ev(eid, ts, etype, uid=1):
        return (eid, ts, uid, etype, 1.0, "{}")

    rows = [
        ev(1, datetime(2024, 6, 1, 12, 0, 0), "click"),       # matched
        ev(2, datetime(2024, 6, 1, 12, 10, 0), "purchase"),   # its match
        ev(3, datetime(2024, 6, 1, 13, 0, 0), "click"),       # never matched
        # watermark pusher: far enough ahead that click 3's join window
        # (13:00 + 30min + 1h watermark) is provably closed
        ev(4, datetime(2024, 6, 2, 0, 0, 0), "click"),
        ev(5, datetime(2024, 6, 2, 0, 0, 0), "purchase", uid=2),
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(str(src))

    stream = read_event_stream(spark, str(src))
    joined = stream_stream_interval_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("outer_join")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch advances the watermark past click 3's window so the
        # outer (null-padded) result can finalize
        spark.createDataFrame(
            [ev(6, datetime(2024, 6, 3, 0, 0, 0), "click", uid=3)], EVENT_SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["l_event_id"]: r["r_event_id"]
        for r in spark.sql("select * from outer_join").collect()
    }
    assert got.get(1) == 2      # matched pair survives
    assert 3 in got and got[3] is None  # unmatched click emitted null-padded


class _StubState:
    """Minimal GroupState stand-in for driving _make_totals_update."""

    def __init__(self, exists=False, value=None, timed_out=False):
        self.exists = exists
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.updated = None
        self.timeout_ms = None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self.updated = v

    def remove(self):
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_totals_update_timeout_reaps_state():
    """A timeout invocation must remove state and emit nothing — not
    re-update + re-arm (which would make idle keys re-trigger forever)."""
    from pyspark_entity_resolution_spark.streaming.pipeline import _make_totals_update

    update = _make_totals_update(reap_idle_state=True)
    state = _StubState(exists=True, value=(3, 42.0), timed_out=True)
    out = list(update((7,), iter([]), state))
    assert out == []
    assert state.removed
    assert state.updated is None
    assert state.timeout_ms is None


def test_totals_update_live_key_accumulates_and_arms_timeout():
    import pandas as pd
    from pyspark_entity_resolution_spark.streaming.pipeline import _make_totals_update

    update = _make_totals_update(reap_idle_state=True)
    state = _StubState(exists=True, value=(2, 10.0))
    out = list(update((7,), iter([pd.DataFrame({"value": [1.5, 2.5]})]), state))
    assert state.updated == (4, 14.0)
    assert state.timeout_ms == 24 * 3600 * 1000
    assert len(out) == 1 and out[0]["n_events"].iloc[0] == 4


def test_streaming_quality_gate_and_dedup_compose(spark, tmp_path):
    """The batch corpus-prep stages (scalar quality gate, watermarked id
    dedup) compose directly onto a document stream — same operators, no
    streaming-specific rewrites."""
    from datetime import datetime

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    from pyspark_entity_resolution_spark.operators.corpus import quality_gate

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("text", StringType()),
    ])
    t0 = datetime(2024, 6, 1, 12, 0, 0)
    good = ("the quick brown fox jumps over the lazy dog and keeps running "
            "through quiet green fields toward the distant hills")
    rows = [
        (1, t0, good),
        (1, t0, good),                      # duplicate id -> dedup drops
        (2, t0, "!!! ??? ### $$$ %%%"),     # junk -> gate drops
        (3, t0, good + " under a clear morning sky"),
    ]
    src = tmp_path / "src"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    gated = quality_gate(stream, min_score=0.75, min_tokens=5)
    deduped = streaming_dedup(gated, id_cols=["doc_id"])
    q = run_to_memory_sink(deduped, "stream_corpus")
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"] for r in spark.sql("select doc_id from stream_corpus").collect()}
    assert got == {1, 3}


def test_pii_scrub_composes_onto_streams(spark, tmp_path):
    """The PII scrub is a scalar projection, so the SAME expression runs
    unchanged over a stream — no batch/stream twin needed."""
    from pyspark_entity_resolution_spark.functions.pii import (
        pii_count,
        redact_pii,
    )

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "ping admin@example.org from 10.1.2.3"),
         (1, "no pii in this one at all")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
        .select(
            "doc_id",
            redact_pii("text").alias("redacted"),
            pii_count("text", "email").alias("n_email"),
        )
    )
    query = run_to_memory_sink(stream, "pii_stream")
    query.awaitTermination(60)
    rows = {r.doc_id: r for r in spark.table("pii_stream").collect()}
    assert rows[0].redacted == "ping [EMAIL] from [IP]"
    assert rows[0].n_email == 1
    assert rows[1].redacted == "no pii in this one at all"
