"""Golden-artifact regression against the reference's own committed output.

The reference repo commits the result of its blocked (N=3) run:
``data/matched_entities/blocked/Matched_Entities.csv`` — 1,524 matched
entities, each row holding the raw AMiner source records of the matched
pair (reference src/create_graph.py:79-87 output shape; SURVEY.md §5.2).
This is the one real-data artifact available without network access, so
it is the strongest parity check we can run: reconstruct the records,
re-run THIS engine's parse→filter→clean→block(N=3)→match pipeline over
them, and require the matched-pair set to reproduce the golden pairing
exactly — 1,524 of 1,524 pairs, with no spurious extras.

(The golden rows are cluster representatives; on this input every
cluster is a single cross-source pair, so pair-level equality is the
right assertion.)
"""

import csv
import os
import re

import pytest

GOLD = "/root/reference/data/matched_entities/blocked/Matched_Entities.csv"

_TAGS = ("#@", "#t", "#c", "#index", "#%", "#!")


def _unflatten(rec: str) -> str:
    """The reference wrote each record's ``value`` flattened to one line
    (newlines -> single spaces). Restore the line-per-tag AMiner layout so
    the engine's codec can re-parse it."""
    for tag in _TAGS:
        rec = rec.replace(" " + tag, "\n" + tag)
    return rec


def _index_of(rec: str) -> str:
    # hex-only: a few cells carry a stray CSV quote glued to the id
    return re.search(r"#index([0-9a-fA-F]+)", rec).group(1).lower()


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    if not os.path.exists(GOLD):
        pytest.skip("reference golden artifact not present")
    with open(GOLD, newline="") as f:
        rows = [
            (row["dblp_first(value)"], row["acm_first(value)"])
            for row in csv.DictReader(f, delimiter="\t")
        ]
    assert len(rows) == 1524  # SURVEY §5.2: 1,525 lines incl. header

    pairs = {(_index_of(d), _index_of(a)) for d, a in rows}
    assert len(pairs) == 1524

    d = tmp_path_factory.mktemp("golden")
    (d / "dblp.txt").write_text("\n\n".join(_unflatten(r[0]) for r in rows))
    (d / "acm.txt").write_text("\n\n".join(_unflatten(r[1]) for r in rows))
    return str(d / "dblp.txt"), str(d / "acm.txt"), pairs


@pytest.fixture(scope="module")
def pipeline_out(spark, golden):
    from pyspark_entity_resolution_spark.pipeline import ERConfig, run_er_pipeline

    dblp_path, acm_path, _ = golden
    out = run_er_pipeline(spark, dblp_path, acm_path, ERConfig(window=3))
    # matches feeds both the pair assertion and the cluster/resolve stage;
    # cache the small intermediates so the two tests don't re-run scoring
    out["left_clean"].cache()
    out["right_clean"].cache()
    out["matches"].cache()
    return out


def test_engine_reproduces_reference_blocked_output(golden, pipeline_out):
    _, _, golden_pairs = golden
    assert pipeline_out["left_clean"].count() == 1524
    assert pipeline_out["right_clean"].count() == 1524

    matched = {
        (r["a_index"], r["b_index"])
        for r in pipeline_out["matches"].select("a_index", "b_index").collect()
    }
    # exact reproduction: every reference-matched pair is re-derived, and
    # nothing else matches — precision = recall = 1.0 on the golden input
    assert matched == golden_pairs


def test_entity_table_covers_every_golden_record(golden, pipeline_out):
    """End-to-end (cluster + resolve): the emitted entity table pairs the
    same records the reference paired."""
    _, _, golden_pairs = golden
    ents = pipeline_out["entities"].collect()
    assert len(ents) == 1524
    got = {(_index_of(r["a_value"]), _index_of(r["b_value"])) for r in ents}
    assert got == golden_pairs
