"""Ingest-time embedding near-dup: the vector twin of the incremental
minhash path. Candidates must come only from the persisted index join
(never an all-pairs scan), matches must be exactly-once per pair, and
the streaming plan must equal the batch plan on the same data."""

import math
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from pyspark_entity_resolution_spark.operators.ann import (
    _bucket_expr,
    hyperplanes,
    incremental_embedding_dedup,
    incremental_embedding_matches,
    lsh_corpus_index,
)

DIM = 16
SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
])


def _vectors(rng, n, start_id=0):
    rows = []
    for i in range(n):
        rows.append((start_id + i, [rng.uniform(-1, 1) for _ in range(DIM)]))
    return rows


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def _table_keys(vec, num_planes, num_tables):
    planes = hyperplanes(num_planes * num_tables, DIM)
    keys = []
    for t in range(num_tables):
        bits = ""
        for p in planes[t * num_planes:(t + 1) * num_planes]:
            bits += "1" if sum(x * y for x, y in zip(vec, p)) >= 0 else "0"
        keys.append(bits)
    return keys


def _expected_matches(arr_rows, acc_rows, threshold, num_planes, num_tables):
    """Brute-force oracle: pairs sharing >= 1 table key, cosine-verified."""
    out = set()
    for aid, avec in arr_rows:
        ak = _table_keys(avec, num_planes, num_tables)
        for cid, cvec in acc_rows:
            ck = _table_keys(cvec, num_planes, num_tables)
            if any(x == y for x, y in zip(ak, ck)):
                if _cos(avec, cvec) >= threshold:
                    out.add((aid, cid))
    return out


def test_batch_matches_equal_bruteforce_oracle(spark):
    rng = random.Random(41)
    acc_rows = _vectors(rng, 40, start_id=0)
    arr_rows = _vectors(rng, 25, start_id=1000)
    # plant near-dups: arriving copies of accepted vectors, tiny nudge
    for j, src in enumerate((3, 7, 11)):
        vid, vec = acc_rows[src]
        arr_rows.append((2000 + j, [v * 1.01 for v in vec]))

    accepted = spark.createDataFrame(acc_rows, SCHEMA)
    arriving = spark.createDataFrame(arr_rows, SCHEMA)
    idx = lsh_corpus_index(accepted, num_planes=3, num_tables=4, dim=DIM)
    got = {
        (r["vec_id"], r["accepted_id"])
        for r in incremental_embedding_matches(
            arriving, idx, accepted, threshold=0.6,
            num_planes=3, num_tables=4, dim=DIM,
        ).collect()
    }
    expected = _expected_matches(arr_rows, acc_rows, 0.6, 3, 4)
    assert got == expected
    assert expected  # the planted near-dups actually matched


def test_matches_are_exactly_once_per_pair(spark):
    """An identical vector collides in EVERY table; without the
    first-colliding-table admission it would emit num_tables rows."""
    rng = random.Random(42)
    acc_rows = _vectors(rng, 10, start_id=0)
    arr_rows = [(500 + i, list(vec)) for i, (_, vec) in enumerate(acc_rows)]
    accepted = spark.createDataFrame(acc_rows, SCHEMA)
    arriving = spark.createDataFrame(arr_rows, SCHEMA)
    idx = lsh_corpus_index(accepted, num_planes=3, num_tables=4, dim=DIM)
    rows = incremental_embedding_matches(
        arriving, idx, accepted, threshold=0.99,
        num_planes=3, num_tables=4, dim=DIM,
    ).collect()
    pairs = [(r["vec_id"], r["accepted_id"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert set(pairs) >= {(500 + i, i) for i in range(10)}  # every copy found


def test_streaming_matches_equal_batch(spark, tmp_path):
    rng = random.Random(43)
    acc_rows = _vectors(rng, 30, start_id=0)
    arr_rows = _vectors(rng, 15, start_id=1000)
    arr_rows.append((2000, [v * 1.02 for v in acc_rows[5][1]]))

    accepted = spark.createDataFrame(acc_rows, SCHEMA)
    src = str(tmp_path / "arriving")
    spark.createDataFrame(arr_rows, SCHEMA).coalesce(1).write.parquet(src)
    idx = lsh_corpus_index(accepted, num_planes=3, num_tables=4, dim=DIM)

    batch_set = {
        (r["vec_id"], r["accepted_id"], r["cos_sim"])
        for r in incremental_embedding_matches(
            spark.read.parquet(src), idx, accepted, threshold=0.6,
            num_planes=3, num_tables=4, dim=DIM,
        ).collect()
    }

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    matches = incremental_embedding_matches(
        stream, idx, accepted, threshold=0.6,
        num_planes=3, num_tables=4, dim=DIM,
    )
    assert matches.isStreaming
    collected = []
    q = (
        matches.writeStream.foreachBatch(
            lambda df, _id: collected.extend(df.collect())
        )
        .queryName("emb_ingest")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream_set = {
        (r["vec_id"], r["accepted_id"], r["cos_sim"]) for r in collected
    }
    assert stream_set == batch_set
    assert batch_set  # the planted near-dup crossed the stream


def test_incremental_embedding_dedup_keeps_fresh_and_minimum(spark, tmp_path):
    rng = random.Random(44)
    acc_rows = _vectors(rng, 20, start_id=0)
    fresh_rows = _vectors(rng, 10, start_id=1000)
    dup_of_history = (3000, [v * 1.001 for v in acc_rows[2][1]])
    twin_a = (4000, [rng.uniform(-1, 1) for _ in range(DIM)])
    twin_b = (4001, [v * 1.001 for v in twin_a[1]])  # within-batch pair
    arr_rows = fresh_rows + [dup_of_history, twin_a, twin_b]

    accepted = spark.createDataFrame(acc_rows, SCHEMA)
    arriving = spark.createDataFrame(arr_rows, SCHEMA)
    idx = lsh_corpus_index(accepted, num_planes=3, num_tables=4, dim=DIM)
    kept = {
        r["vec_id"]
        for r in incremental_embedding_dedup(
            arriving, idx, accepted, threshold=0.999,
            num_planes=3, num_tables=4, dim=DIM,
        ).collect()
    }
    assert 3000 not in kept          # history near-dup dropped
    assert 4000 in kept and 4001 not in kept  # within-batch keep-minimum
    assert {r[0] for r in fresh_rows} <= kept

    stream_dir = tmp_path / "stream_src"
    stream_dir.mkdir()
    with pytest.raises(ValueError):
        incremental_embedding_dedup(
            spark.readStream.schema(SCHEMA).parquet(str(stream_dir)),
            idx, accepted,
        )


def test_zero_vectors_never_match_and_never_error(spark):
    """A zero vector has no defined cosine; try_divide yields NULL and
    the threshold filter drops it — zero vectors flow through the
    ingest path without matching anything or erroring (ANSI mode would
    have raised on a plain division)."""
    rng = random.Random(45)
    acc_rows = _vectors(rng, 5, start_id=0) + [(99, [0.0] * DIM)]
    arr_rows = [(1000, [0.0] * DIM), (1001, list(acc_rows[0][1]))]
    accepted = spark.createDataFrame(acc_rows, SCHEMA)
    arriving = spark.createDataFrame(arr_rows, SCHEMA)
    idx = lsh_corpus_index(accepted, num_planes=3, num_tables=4, dim=DIM)
    got = {
        (r["vec_id"], r["accepted_id"])
        for r in incremental_embedding_matches(
            arriving, idx, accepted, threshold=0.0,
            num_planes=3, num_tables=4, dim=DIM,
        ).collect()
    }
    assert all(1000 not in pair and 99 not in pair for pair in got)
    assert (1001, 0) in got  # the exact copy still matches


def test_index_survives_parquet_round_trip(spark, tmp_path):
    """The docstring's deployment contract: persist lsh_corpus_index as
    parquet (partitioned by key), read it back in a fresh plan, and get
    the identical match set — schema and key encoding are stable across
    the round trip, and the partitioned layout prunes on the join key."""
    rng = random.Random(46)
    acc_rows = _vectors(rng, 30, start_id=0)
    arr_rows = _vectors(rng, 10, start_id=1000)
    arr_rows.append((2000, [v * 1.01 for v in acc_rows[4][1]]))
    accepted = spark.createDataFrame(acc_rows, SCHEMA)
    arriving = spark.createDataFrame(arr_rows, SCHEMA)

    live_idx = lsh_corpus_index(accepted, num_planes=3, num_tables=4, dim=DIM)
    idx_path = str(tmp_path / "emb_index")
    live_idx.write.partitionBy("key").parquet(idx_path)
    stored_idx = spark.read.parquet(idx_path)

    def match_set(idx):
        return {
            (r["vec_id"], r["accepted_id"], r["cos_sim"])
            for r in incremental_embedding_matches(
                arriving, idx, accepted, threshold=0.6,
                num_planes=3, num_tables=4, dim=DIM,
            ).collect()
        }

    live = match_set(live_idx)
    stored = match_set(stored_idx)
    assert stored == live
    assert any(p[0] == 2000 for p in live)  # the planted near-dup matched


def test_foreachbatch_embedding_driver_equals_direct_streaming_form(spark, tmp_path):
    """streaming_incremental_embedding_dedup(emit="matches") drains to
    exactly the direct stream-static plan's result set, via the slim
    batch path (vectors joined post-admission)."""
    from pyspark_entity_resolution_spark.streaming.ingest import (
        streaming_incremental_embedding_dedup,
    )

    rng = random.Random(47)
    acc_rows = _vectors(rng, 25, start_id=0)
    arr_rows = _vectors(rng, 12, start_id=1000)
    arr_rows.append((2000, [v * 1.01 for v in acc_rows[3][1]]))
    arr_rows.append((2001, [v * 0.98 for v in acc_rows[7][1]]))

    accepted = spark.createDataFrame(acc_rows, SCHEMA)
    idx = lsh_corpus_index(
        accepted, num_planes=3, num_tables=4, dim=DIM
    ).localCheckpoint()
    src = str(tmp_path / "arr_fb")
    out = str(tmp_path / "matches_fb")
    spark.createDataFrame(arr_rows[:7], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(arr_rows[7:], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_incremental_embedding_dedup(
        stream, idx, accepted, out, threshold=0.6,
        num_planes=3, num_tables=4, dim=DIM, emit="matches",
        checkpoint_dir=str(tmp_path / "ckpt_emb_fb"),
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["vec_id"], r["accepted_id"], r["cos_sim"])
        for r in spark.read.parquet(out).collect()
    }
    expected = {
        (r["vec_id"], r["accepted_id"], r["cos_sim"])
        for r in incremental_embedding_matches(
            spark.createDataFrame(arr_rows, SCHEMA), idx, accepted,
            threshold=0.6, num_planes=3, num_tables=4, dim=DIM,
        ).collect()
    }
    assert got == expected
    assert {(a, c) for a, c, _ in got} >= {(2000, 3), (2001, 7)}


def test_foreachbatch_embedding_driver_kept_mode(spark, tmp_path):
    """emit="kept": arriving vectors with a corpus near-dup (and the
    larger-id side of within-batch pairs) never reach the sink."""
    from pyspark_entity_resolution_spark.streaming.ingest import (
        streaming_incremental_embedding_dedup,
    )

    rng = random.Random(48)
    acc_rows = _vectors(rng, 20, start_id=0)
    arr_rows = _vectors(rng, 8, start_id=1000)
    arr_rows.append((2000, [v * 1.02 for v in acc_rows[5][1]]))  # corpus dup
    base = [rng.uniform(-1, 1) for _ in range(DIM)]
    arr_rows.append((3000, base))
    arr_rows.append((3001, [v * 1.01 for v in base]))  # in-batch dup, loses

    accepted = spark.createDataFrame(acc_rows, SCHEMA)
    idx = lsh_corpus_index(
        accepted, num_planes=3, num_tables=4, dim=DIM
    ).localCheckpoint()
    src = str(tmp_path / "arr_kept")
    out = str(tmp_path / "kept_emb")
    spark.createDataFrame(arr_rows, SCHEMA).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = streaming_incremental_embedding_dedup(
        stream, idx, accepted, out, threshold=0.85,
        num_planes=3, num_tables=4, dim=DIM, emit="kept",
        checkpoint_dir=str(tmp_path / "ckpt_kept_emb"),
    )
    q.processAllAvailable()
    q.stop()

    kept = {r["vec_id"] for r in spark.read.parquet(out).collect()}
    expected_kept = {
        r["vec_id"]
        for r in incremental_embedding_dedup(
            spark.createDataFrame(arr_rows, SCHEMA), idx, accepted,
            threshold=0.85, num_planes=3, num_tables=4, dim=DIM,
        ).collect()
    }
    assert kept == expected_kept
    assert 2000 not in kept and 3001 not in kept and 3000 in kept
