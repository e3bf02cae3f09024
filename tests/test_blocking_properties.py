"""Property test: block-key explosion == the reference loop's membership
rule for arbitrary years/venues (SURVEY.md §7.1 step 5 equivalence)."""

from hypothesis import given, settings, strategies as st

from pyspark_entity_resolution_spark.operators.blocking import with_block_keys

LOWER, UPPER = 1995, 2004
VENUES = ["sigmod", "vldb"]


def _oracle_windows(year: int, window: int) -> set[int]:
    """Reference loop semantics (src/match.py:102-115): window [s, s+N]
    with s in range(lower, upper), break when s+N > upper."""
    out = set()
    for s in range(LOWER, UPPER):
        if s + window > UPPER:
            break
        if s <= year <= s + window:
            out.add(s)
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1985, max_value=2010),
            st.sampled_from(
                ["sigmod conf", "vldb j", "icde", "the vldb+sigmod workshop", ""]
            ),
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=9),
)
def test_block_key_explosion_matches_loop_rule(spark, records, window):
    df = spark.createDataFrame(
        [(i, y, v) for i, (y, v) in enumerate(records)], ["id", "year", "venue"]
    )
    got = {}
    rows = with_block_keys(df, VENUES, window=window).collect()
    for r in rows:
        got.setdefault(r["id"], set()).add((r["venue_tag"], r["window_start"]))

    for i, (year, venue) in enumerate(records):
        expected = {
            (v, s)
            for v in VENUES
            if v in venue
            for s in _oracle_windows(year, window)
        }
        assert got.get(i, set()) == expected, (i, year, venue, window)
