"""CLI end-to-end: the staged pipeline through the real
``python -m pyspark_entity_resolution_spark`` entry point, compared to the
brute-force Python oracle (codifies the manual verification drive)."""

import json
import os
import subprocess
import sys

import pytest

from .er_fixture import oracle_matches, write_fixture


def _run_cli(*args, env):
    result = subprocess.run(
        [sys.executable, "-m", "pyspark_entity_resolution_spark", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd="/root/repo",
        timeout=420,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    lines = [l for l in result.stdout.strip().splitlines() if l.strip()]
    return lines[-1] if lines else ""


@pytest.mark.slow
def test_cli_run_matches_oracle(tmp_path):
    pa, pb, recs_a, recs_b = write_fixture(str(tmp_path))
    env = dict(
        os.environ, PYTHONPATH="/root/repo", SPARK_GRAFT_CPUS="4",
    )
    out = _run_cli(
        "run", "--left-raw", pa, "--right-raw", pb,
        "--dest", str(tmp_path / "out"), "--year-range", "3",
        env=env,
    )
    stats = json.loads(out)
    assert stats["matches"] == len(oracle_matches(recs_a, recs_b, window=3))
    assert stats["entities"] > 0
    assert (tmp_path / "out" / "entities_csv" / "Matched_Entities.csv").exists()
