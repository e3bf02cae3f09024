"""Sequence-packing tests (operators/packing.py)."""

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.operators.packing import (
    pack_chunks,
    pack_summary,
)


def _chunks(spark, rows, with_group=False):
    schema = "doc_id long, chunk_idx long, n_chunk_tokens long" + (
        ", src string" if with_group else ""
    )
    return spark.createDataFrame(rows, schema)


def test_packs_fill_to_budget_without_splitting(spark):
    # 6 chunks of 100 tokens, budget 250 -> starts 0,100,200,300,400,500
    # -> packs 0,0,0,1,1,2 (chunk at start 200 overflows pack 0; never split)
    df = _chunks(spark, [(0, i, 100) for i in range(6)])
    packed = {r.chunk_idx: r.pack_id for r in pack_chunks(df, budget=250).collect()}
    assert packed == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2}


def test_oversized_chunk_overflows_without_splitting(spark):
    # offset-based contract: the giant joins the pack its START falls in
    # (overflowing it — never split), and later chunks skip ahead past
    # the space it consumed
    df = _chunks(spark, [(0, 0, 100), (0, 1, 900), (0, 2, 100)])
    packed = {r.chunk_idx: r.pack_id for r in pack_chunks(df, budget=256).collect()}
    assert packed == {0: 0, 1: 0, 2: 3}  # starts 0, 100, 1000


def test_groups_pack_independently(spark):
    rows = [(0, 0, 200, "web"), (1, 0, 200, "web"),
            (2, 0, 200, "books"), (3, 0, 200, "books")]
    packed = pack_chunks(
        _chunks(spark, rows, with_group=True), group_col="src", budget=256
    )
    by_src = {
        (r.src, r.doc_id): r.pack_id for r in packed.collect()
    }
    # both groups restart at pack 0 -> pack_id is group-local
    assert by_src[("web", 0)] == by_src[("books", 2)] == 0


def test_deterministic_under_repartition(spark):
    rows = [(i, j, 37 + (i * 7 + j) % 90) for i in range(20) for j in range(3)]
    df = _chunks(spark, rows)
    a = {(r.doc_id, r.chunk_idx): (r.pack_id, r.pack_pos)
         for r in pack_chunks(df, budget=300).collect()}
    b = {(r.doc_id, r.chunk_idx): (r.pack_id, r.pack_pos)
         for r in pack_chunks(df.repartition(13), budget=300).collect()}
    assert a == b


def test_fill_ratio_bounded(spark):
    rows = [(i, j, 37 + (i * 7 + j) % 90) for i in range(20) for j in range(3)]
    packed = pack_chunks(_chunks(spark, rows), budget=300)
    summary = pack_summary(packed).collect()
    max_item = 37 + 89
    # every pack except possibly the last is filled past budget-start of
    # its boundary chunk; none exceeds budget + largest item
    assert all(r.n_tokens < 300 + max_item for r in summary)
    total = sum(r.n_tokens for r in summary)
    assert total == sum(r for _, _, r in rows)  # nothing lost or split


def test_budget_validation(spark):
    with pytest.raises(ValueError):
        pack_chunks(_chunks(spark, [(0, 0, 10)]), budget=0)


def test_overflow_invariant_property(spark):
    """Property over random chunk lengths (seeded generators): every
    boundary chunk overflows its pack by LESS than its own length —
    i.e. a pack's tokens minus its last chunk stay under budget — and
    packs partition the ordered chunk sequence into consecutive runs."""
    import random

    for seed in range(6):
        rng = random.Random(seed)
        budget = rng.choice([64, 100, 256, 1000])
        rows = [
            (i, j, rng.randint(1, int(budget * 1.5)))
            for i in range(rng.randint(1, 15))
            for j in range(rng.randint(1, 5))
        ]
        packed = sorted(
            pack_chunks(_chunks(spark, rows), budget=budget).collect(),
            key=lambda r: (r.pack_id, r.pack_pos),
        )
        # consecutive-run property: global order by (pack_id, pack_pos)
        # equals order by order_cols, and pack_ids never decrease
        assert [(r.doc_id, r.chunk_idx) for r in packed] == sorted(
            (r.doc_id, r.chunk_idx) for r in packed
        ), f"seed {seed}: packs are not consecutive runs"
        by_pack: dict[int, list] = {}
        for r in packed:
            by_pack.setdefault(r.pack_id, []).append(r.n_chunk_tokens)
        for pid, toks in by_pack.items():
            assert sum(toks) - toks[-1] < budget, (
                f"seed {seed}: pack {pid} overflows by its boundary "
                f"chunk's full length or more: {toks}"
            )
        # nothing lost, nothing split
        assert sum(sum(t) for t in by_pack.values()) == sum(r[2] for r in rows)


def test_tie_rows_get_stable_distinct_positions(spark):
    # order_cols ties (identical doc_id/chunk_idx) fall back to the
    # row-content hash: assignment is reproducible and positions distinct
    rows = [(0, 0, 100, "a"), (0, 0, 100, "b"), (0, 0, 100, "c")]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_idx long, n_chunk_tokens long, payload string"
    )
    a = {r.payload: (r.pack_id, r.pack_pos)
         for r in pack_chunks(df, budget=250).collect()}
    b = {r.payload: (r.pack_id, r.pack_pos)
         for r in pack_chunks(df.repartition(5), budget=250).collect()}
    assert a == b
    assert len({v for v in a.values()}) == 3


def test_pack_summary_fill_ratio(spark):
    df = _chunks(spark, [(0, 0, 100), (0, 1, 100), (0, 2, 100)])
    out = {r.pack_id: r for r in
           pack_summary(pack_chunks(df, budget=250), budget=250).collect()}
    # pack 0 holds all three chunks (starts 0,100,200): fill 300/250 > 1
    assert out[0].n_tokens == 300
    assert out[0].fill == pytest.approx(1.2)
    # without budget the fill column is absent (two-column report)
    cols = pack_summary(pack_chunks(df, budget=250)).columns
    assert "fill" not in cols
