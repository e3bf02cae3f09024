"""Deterministic sampling and source mixing for training-data pipelines.

``rand()``-based sampling is non-reproducible across runs, engines, and
retried tasks. Every operator here derives its keep/drop decision from an
md5 hash of the row's id — bit-identical on any engine (the DuckDB oracle
runs the same expression), stable under retries, and join-free: a row's
fate is a pure function of its key.

``mix_sources`` is the data-mixing primitive: given target weights per
source, it computes the largest corpus achievable without oversampling
any source and hash-samples each source down to its share. The only
driver-side data is one row per source (a scalar-sized collect, same
class as k-means centroids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 1_000_000


def _hash_bucket(key: Column, seed: str = "") -> Column:
    """Uniform bucket in [0, HASH_BUCKETS) from md5(seed || key) — the
    first 6 hex digits give 24 uniform bits, reduced mod the bucket
    count."""
    h = F.md5(F.concat(F.lit(seed), key.cast("string")))
    return F.conv(F.substring(h, 1, 6), 16, 10).cast("bigint") % HASH_BUCKETS


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by id hash: deterministic,
    engine-portable, retry-stable. ``seed`` decorrelates independent
    samples over the same keys."""
    return df.filter(_hash_bucket(F.col(key_col), seed) < int(rate * HASH_BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value keeps its
    own rate (absent strata keep ``default_rate``). The rate lookup is a
    literal CASE expression — no join, no broadcast; the filter rides the
    scan."""
    threshold = F.lit(int(default_rate * HASH_BUCKETS))
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(rate * HASH_BUCKETS))
        ).otherwise(threshold)
    return df.filter(_hash_bucket(F.col(key_col)) < threshold)


def mix_sources(
    df: DataFrame,
    key_col: str,
    source_col: str,
    weights: dict[str, float],
) -> DataFrame:
    """Sample each source so the output composition matches ``weights``
    as closely as possible WITHOUT oversampling (no row duplication).

    The binding source is the one with the smallest ``n_s / w_s``: it is
    kept whole, and every other source is hash-sampled down to
    ``w_s * T`` rows where ``T = min_s(n_s / w_s)`` is the largest total
    honoring the weights. Sources absent from ``weights`` are dropped.

    One aggregation + a K-row collect (K = number of sources) computes
    the rates; the sampling itself is the same scan-riding hash filter.
    """
    total_w = sum(weights.values())
    norm = {s: w / total_w for s, w in weights.items()}
    counts = {
        r["s"]: r["n"]
        for r in df.filter(F.col(source_col).isin(list(norm)))
        .groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # zero-weight sources are dropped like absent ones (a 0-share entry
    # must not bind t_max via a division by zero)
    present = {s: w for s, w in norm.items() if counts.get(s) and w > 0}
    if not present:
        return df.filter(F.lit(False))
    t_max = min(counts[s] / w for s, w in present.items())
    rates = {s: min(1.0, w * t_max / counts[s]) for s, w in present.items()}
    # HASH_BUCKETS quantizes rates to 1e-6 steps and the threshold
    # floors: a positive-share source with rate < 1/HASH_BUCKETS would
    # silently keep 0 rows even when its weighted target is >= 1 row
    # (e.g. a 10^7-row source owed 5 rows). Clamp every positive rate to
    # one bucket — the smallest expressible non-zero share — so no
    # present source vanishes from the mix.
    rates = {s: max(r, 1.0 / HASH_BUCKETS) for s, r in rates.items()}
    return stratified_hash_sample(
        df, key_col, source_col, rates, default_rate=0.0
    )
