"""BPE-pre-tokenizer count: cross-engine parity on adversarial strings
(the documents fixture is plain lowercase words, so the driver oracle
barely exercises the contraction/digit/symbol branches — this does)."""

import duckdb
import pytest

from pyspark_entity_resolution_spark.functions.text import (
    BPE_PRETOKEN_PATTERN,
    bpe_like_token_count,
)

CASES = [
    "",
    "hello world",
    "it's we're they'll I'd you've i'm don't",
    "abc123 45.67 1,000,000",
    "foo--bar...baz?!?",
    "  leading  and   multiple   spaces  ",
    "tab\tand\nnewline\r\nmix",
    "CamelCase MixedCASE lower UPPER",
    "unicode: déjà vu naïve Zürich",
    "symbols @#$%^&*() end",
    "a'x b'sides rock'n'roll",
    "trailing space ",
    "'s at start",
    "12abc34def",
    # U+000B: Java \s and RE2 \s disagree on it — the pattern spells
    # the whitespace class out so both engines bill VT identically
    "a\x0bb",
    "vt\x0b\x0bruns\x0bhere",
]


def _duckdb_counts():
    con = duckdb.connect()
    pat = BPE_PRETOKEN_PATTERN.replace("'", "''")
    out = []
    for s in CASES:
        lit = s.replace("'", "''")
        out.append(
            con.execute(
                f"SELECT len(regexp_extract_all('{lit}', '{pat}'))"
            ).fetchone()[0]
        )
    return out


def test_counts_match_duckdb_re2(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CASES)], "i long, text string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", bpe_like_token_count("text").alias("n")).collect()
    }
    for i, expect in enumerate(_duckdb_counts()):
        assert got[i] == expect, (i, CASES[i], got[i], expect)


def test_count_tracks_tokenizer_shape(spark):
    """Sanity of the signal itself: punctuation and digit runs bill
    extra pieces that whitespace counting misses."""
    df = spark.createDataFrame(
        [(1, "one two three"), (2, "one,two...three 42!")],
        "i long, text string",
    )
    rows = {
        r["i"]: r["n"]
        for r in df.select("i", bpe_like_token_count("text").alias("n")).collect()
    }
    assert rows[1] == 3
    # "one" "," "two" "..." "three" " 42" "!" = 7 pieces
    assert rows[2] == 7
