"""Winnowing fingerprints vs a brute-force Python oracle + the paper's
coverage guarantee (every window selects; every long verbatim match is
caught by a shared fingerprint)."""

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.operators.winnowing import (
    fingerprint_overlap_pairs,
    winnow_fingerprints,
)

K, W = 5, 4


def _norm(text):
    return " ".join((text or "").split())


def _brute_winnow(text, k=K, w=W):
    """Reference winnowing: every window of w k-gram positions selects
    its minimal (md5, pos) key; the union of selections is the set.
    Empty (after normalization) documents yield NO fingerprints — the
    md5('') fingerprint would pair unrelated empty docs."""
    txt = _norm(text)
    if not txt:
        return set()
    n_pos = max(1, len(txt) - k + 1)
    keys = [
        (hashlib.md5(txt[i - 1 : i - 1 + k].encode()).hexdigest(), i)
        for i in range(1, n_pos + 1)
    ]
    out = set()
    last_full = max(1, n_pos - w + 1)
    for p in range(1, last_full + 1):
        out.add(min(keys[p - 1 : p - 1 + w]))
    return {(pos, h) for h, pos in out}


def _spark_winnow(spark, texts, k=K, w=W):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = winnow_fingerprints(df, k=k, w=w).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], set()).add((r["fp_pos"], r["fp_hash"]))
    return got


def test_matches_bruteforce_on_random_texts(spark):
    rng = random.Random(7)
    alphabet = "abcdef "
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(40)
    ]
    # adversarial extremes: empty, all-whitespace, NULL-ish, shorter
    # than k, exactly k, repeated char, vertical tab (Java/RE2 \s gap)
    texts += ["", "   ", "\t\n", "ab", "abcde", "aaaaaaaaaaaaaaaaaaaa",
              "  spaced   out  ", "a\x0bb cdefgh"]
    got = _spark_winnow(spark, texts)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _brute_winnow(t), f"doc {i}: {t!r}"


def test_every_window_is_covered(spark):
    """Winnowing invariant: each full window of w consecutive k-gram
    positions contains at least one selected position."""
    rng = random.Random(11)
    texts = ["".join(rng.choice("abc ") for _ in range(80)) for _ in range(10)]
    got = _spark_winnow(spark, texts)
    for i, t in enumerate(texts):
        n_pos = max(1, len(_norm(t)) - K + 1)
        sel = sorted(p for p, _ in got[i])
        for p in range(1, max(1, n_pos - W + 1) + 1):
            assert any(p <= s <= p + W - 1 for s in sel), (i, p, sel)


def test_shared_verbatim_region_yields_shared_fingerprint(spark):
    """The guarantee that makes winnowing a detection primitive: a
    verbatim match of >= w + k - 1 chars shares >= 1 fingerprint hash."""
    rng = random.Random(13)
    region = "the quick brown fox jumps over the lazy dog"
    assert len(region) >= W + K - 1
    pad = lambda: "".join(rng.choice("xyzw ") for _ in range(30))
    texts = [pad() + region + pad(), pad() + region + pad()]
    got = _spark_winnow(spark, texts)
    shared = {h for _, h in got[0]} & {h for _, h in got[1]}
    assert shared, "verbatim region must share a fingerprint"


def test_selection_density_near_two_over_w_plus_one(spark):
    rng = random.Random(17)
    text = "".join(rng.choice("abcdefghij") for _ in range(5000))
    got = _spark_winnow(spark, [text])
    n_pos = len(text) - K + 1
    density = len(got[0]) / n_pos
    assert 0.5 * 2 / (W + 1) < density < 2.0 * 2 / (W + 1)


def test_overlap_pairs_bounded_and_correct(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # verbatim dup of 1
            (3, "zeta eta theta iota kappa"),
            (4, "unrelated words entirely here"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, k=K, w=W)
    pairs = fingerprint_overlap_pairs(fps, max_df=10).collect()
    by_pair = {(r["a_id"], r["b_id"]): r["n_shared"] for r in pairs}
    assert (1, 2) in by_pair and by_pair[(1, 2)] >= 1
    assert all(a < b for a, b in by_pair)
    # a hash present in every doc (df > max_df) must not create pairs:
    # with max_df=1 nothing can pair
    assert fingerprint_overlap_pairs(fps, max_df=1).isEmpty()


def test_common_hash_suppression_bounds_fanout(spark):
    """df > max_df hashes are dropped BEFORE the self-join — the hottest
    bucket contributes zero pairs instead of C(n_docs, 2)."""
    docs = [(i, "identical boilerplate text shared by every doc") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=K, w=W)
    assert fingerprint_overlap_pairs(fps, max_df=10).isEmpty()
    full = fingerprint_overlap_pairs(fps, max_df=20)
    assert full.count() == 20 * 19 // 2


def test_empty_docs_never_pair(spark):
    """Empty/whitespace/NULL documents emit no fingerprints at all —
    without the exclusion every empty doc carries md5('') and any
    2..max_df of them would report verbatim-overlap pairs over zero
    shared content."""
    df = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "   "), (4, None), (5, "real content here")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, k=K, w=W)
    assert {r["doc_id"] for r in fps.collect()} == {5}
    assert fingerprint_overlap_pairs(fps, max_df=10).isEmpty()


def test_xx64_fast_path_matches_bruteforce_and_invariants(spark):
    """The production hash="xx64" path winnows EXACTLY like the md5
    path under its own hash order: parity is checked against a brute
    Python winnow fed Spark's own xxhash64 values (collected from a
    plain per-gram projection — no window machinery), and the coverage
    invariant (every full window contains a selection) holds as it must
    under ANY fixed total order on hashes."""
    rng = random.Random(29)
    texts = [
        "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 80)))
        for _ in range(20)
    ] + ["", "  ", None, "ab", "aaaaaaaaaaaaaaaa"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    # Spark's own per-gram xx64 hex keys, no windowing involved
    norm = F.trim(F.regexp_replace(F.coalesce(F.col("text"), F.lit("")),
                                   r"\s+", " "))
    n_pos = F.greatest(F.lit(1), F.length(norm) - F.lit(K - 1))
    grams = df.filter(F.length(norm) > 0).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), n_pos)).alias("pos"),
        F.lpad(
            F.hex(F.xxhash64(norm.substr(F.col("pos"), F.lit(K)))), 16, "0"
        ).alias("h"),
    )
    keys = {}
    for r in grams.collect():
        keys.setdefault(r["doc_id"], {})[r["pos"]] = r["h"]

    expected = {}
    for i, per_pos in keys.items():
        ordered = [(per_pos[p], p) for p in sorted(per_pos)]
        sel = set()
        last_full = max(1, len(ordered) - W + 1)
        for p in range(1, last_full + 1):
            sel.add(min(ordered[p - 1 : p - 1 + W]))
        expected[i] = {(pos, h) for h, pos in sel}

    rows = winnow_fingerprints(df, k=K, w=W, hash="xx64").collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], set()).add((r["fp_pos"], r["fp_hash"]))
    assert got == {i: s for i, s in expected.items() if s}

    # coverage invariant on the fast path
    for i, fp in got.items():
        n = max(1, len(_norm(texts[i])) - K + 1)
        sel = sorted(p for p, _ in fp)
        for p in range(1, max(1, n - W + 1) + 1):
            assert any(p <= s <= p + W - 1 for s in sel), (i, p, sel)

    with pytest.raises(ValueError, match="hash must be"):
        winnow_fingerprints(df, hash="sha1")


def test_lag_dedup_equals_distinct(spark):
    """The no-shuffle consecutive-run dedup must equal a plain distinct
    over per-window selections (the DuckDB oracle's formulation)."""
    rng = random.Random(23)
    texts = ["".join(rng.choice("ab ") for _ in range(100)) for _ in range(5)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = winnow_fingerprints(df, k=K, w=W)
    assert out.count() == out.distinct().count()


def test_array_mode_equals_window_mode(spark):
    """The r11 shuffle-free array path must select the IDENTICAL
    fingerprint set as the legacy window-function path — same composite
    (hash, pos) order, same full-window set, same consecutive dedup —
    across short (< w positions), empty, null, single-char and long
    random docs, for both hash functions and several (k, w)."""
    rng = random.Random(47)
    texts = (
        ["", None, "x", "abc", "ab " * 3]
        + ["".join(rng.choice("abcd ") for _ in range(n)) for n in (5, 9, 40, 200)]
        + ["tile" * 30]  # heavy in-window hash runs
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for k, w in ((K, W), (3, 1), (2, 9), (5, 50)):
        for h in ("md5", "xx64"):
            arr = winnow_fingerprints(df, k=k, w=w, hash=h, mode="array")
            win = winnow_fingerprints(df, k=k, w=w, hash=h, mode="window")
            assert sorted(map(tuple, arr.collect())) == sorted(
                map(tuple, win.collect())
            ), (k, w, h)
    with pytest.raises(ValueError, match="mode must be"):
        winnow_fingerprints(df, mode="sorted")


def test_array_mode_plan_has_no_exchange(spark):
    """The point of the array path: fingerprint selection adds NO
    shuffle — the physical plan up to the fingerprint rows must contain
    zero Exchange and zero Sort nodes (the window path had one of
    each)."""
    df = spark.createDataFrame([(1, "abcdef" * 10)], "doc_id long, text string")
    plan = winnow_fingerprints(df, k=K, w=W)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Sort" not in plan, plan
