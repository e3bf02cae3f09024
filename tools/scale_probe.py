"""Scale probes behind README's "Scale probes" numbers — reproducible.

Probe A: ER pipeline at ~11x the reference's candidate-pair volume
         (10k x 10k AMiner corpus, blocked N=3): parse+clean+block+match,
         then the FULL pipeline incl. clustering + entity table.
Probe B: connected components on a ~1M-edge random graph in the
         giant-component regime — the case the reference's recursive
         driver DFS cannot run at all.

Usage: python tools/scale_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from bench import _gen_er_corpus  # noqa: E402
from pyspark_entity_resolution_spark.session import get_spark  # noqa: E402


def probe_er(spark) -> None:
    from pyspark_entity_resolution_spark.pipeline import (
        ERConfig,
        match_publications,
        prepare_publications,
        run_er_pipeline,
    )

    pa, pb = _gen_er_corpus("/tmp/er_scale_corpus_10k", n_per_side=10000)
    cfg = ERConfig(window=3)

    t0 = time.perf_counter()
    left = prepare_publications(spark, pa, cfg)
    right = prepare_publications(spark, pb, cfg)
    n_matches = match_publications(left, right, cfg).count()
    t_match = time.perf_counter() - t0
    print(f"[probe A] 10k x 10k blocked N=3 parse+clean+block+match: "
          f"{t_match:.1f}s ({n_matches} matches)", flush=True)

    t0 = time.perf_counter()
    out = run_er_pipeline(spark, pa, pb, cfg)
    n_entities = out["entities"].count()
    t_full = time.perf_counter() - t0
    print(f"[probe A] 10k x 10k FULL pipeline incl. cluster+resolve: "
          f"{t_full:.1f}s ({n_entities} entity rows)", flush=True)


def probe_cc(spark, n_nodes: int = 500_000, n_edges: int = 1_000_000) -> None:
    from pyspark.sql import functions as F

    from pyspark_entity_resolution_spark.operators.clustering import (
        connected_components,
    )

    # deterministic pseudo-random edges: xxhash64 over the id sequence
    edges = (
        spark.range(n_edges)
        .select(
            (F.abs(F.xxhash64(F.col("id"))) % n_nodes).alias("src"),
            (F.abs(F.xxhash64(F.col("id") + 7_777_777)) % n_nodes).alias("dst"),
        )
        .localCheckpoint()
    )
    t0 = time.perf_counter()
    labels = connected_components(edges)
    n_components = labels.select("component").distinct().count()
    t = time.perf_counter() - t0
    print(f"[probe B] connected components, {n_edges} edges / "
          f"~{n_nodes} nodes: {t:.1f}s ({n_components} components)", flush=True)


def main() -> None:
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    probe_er(spark)
    probe_cc(spark)
    spark.stop()


if __name__ == "__main__":
    main()
