"""SimHash secondary length-banding: the bucket key must scale past the
2^16 chunk-value bound without losing true near-duplicates."""

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.operators import dedup as D

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").repartition(8).cache()
    d.count()
    yield d
    d.unpersist()


def _pairs(df):
    return {(r["a_id"], r["b_id"]): (r["a_sim"], r["b_sim"]) for r in df.collect()}


def _hamming(a_hex, b_hex):
    return bin(int(a_hex, 16) ^ int(b_hex, 16)).count("1")


def test_length_band_prunes_noise_but_keeps_all_near_dups(spark, docs):
    raw = _pairs(D.simhash_candidates(docs, length_band=False))
    banded = _pairs(D.simhash_candidates(docs, length_band=True))

    # banding only removes candidates, never invents them
    assert set(banded) <= set(raw)
    # and it does remove cross-length random chunk collisions
    assert len(banded) < len(raw)

    # every true near-duplicate (Hamming <= 3 — the pigeonhole contract)
    # survives the banding: near-dup docs sit in adjacent length bands
    near_raw = {p for p, (x, y) in raw.items() if _hamming(x, y) <= 3}
    near_banded = {p for p, (x, y) in banded.items() if _hamming(x, y) <= 3}
    assert near_raw == near_banded
    assert len(near_raw) > 0  # the fixture actually exercises the contract
