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
