"""Scale probes behind README's "Scale probes" numbers — reproducible.

Probe A: ER pipeline at ~11x the reference's candidate-pair volume
         (10k x 10k AMiner corpus, blocked N=3): parse+clean+block+match,
         then the FULL pipeline incl. clustering + entity table.
Probe B: connected components on a ~1M-edge random graph in the
         giant-component regime — the case the reference's recursive
         driver DFS cannot run at all.

Probe C (``trio``): one measured DECADE of scaling for the three
         heaviest ops — MinHash-LSH dedup on a x10 documents corpus
         (per-copy token salting keeps the near-dup workload exactly
         linear: within-copy structure is preserved, cross-copy band
         collisions are impossible), connected components at 1M vs 10M
         edges, and the full ER pipeline at 3k vs 30k records/side.
         Turns the "survives 100x" plan-shape argument into numbers.

Probe D (``century``): TWO measured decades (x100) for MinHash-LSH,
         exact substring dedup, connected components, and the full ER
         pipeline — each family in its own subprocess (fresh JVM) so
         base legs never measure a predecessor's heap. Individual
         families: ``century-minhash`` ``century-substring``
         ``century-ngram`` (prefix-filtered token-shingle Jaccard — the
         selective-vocabulary scale path, with an exactly-100x result
         assertion) ``century-cc`` ``century-er`` ``century-ingest`` (the
         ingest-time serving paths: fixed arriving batch vs a x100
         persisted index) ``century-labelstore`` ``century-winnow``
         ``century-audio`` (planted near-dup WAV clips: Arrow decode
         throughput + banded audio dedup, exact pair-count assertion)
         ``century-image`` (PNG/JPEG pixel decode + GIF frame sampling
         + MJPEG-AVI sampled-frame decode through the stdlib kernels,
         row-count tripwires per leg) ``century-lev`` (the affix-strip
         dense pair scan + ed-1 deletion-neighborhood edges over
         per-block-salted id corpora, exact-linearity tripwires).

Usage: python tools/scale_probe.py [trio|ann|winnow|century|century-<family>]
"""

from __future__ import annotations

import os
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


def _docs_x10(spark, base_dir: str = "/root/testdata/sf0.1") -> str:
    """10x documents corpus at /tmp (cached): copy 0 is the original;
    copies 1-9 get remapped ids and a per-copy token salt (``tok~i``),
    so every copy keeps the original's internal near-dup structure but
    no band key can collide across copies — the LSH workload is exactly
    10x, not quadratically inflated."""
    import os

    from pyspark.sql import functions as F

    dest = "/tmp/scale_docs_x10.parquet"
    if os.path.exists(dest + "/_SUCCESS"):
        return dest
    docs = spark.read.parquet(f"{base_dir}/documents.parquet")
    copies = [docs]
    for i in range(1, 10):
        copies.append(
            docs.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t, i=i: F.concat(t, F.lit(f"~{i}")),
                    ),
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(dest)
    return dest


def probe_trio(spark) -> None:
    from pyspark.sql import functions as F

    from pyspark_entity_resolution_spark.operators.dedup import minhash_lsh_dedup
    from pyspark_entity_resolution_spark.pipeline import ERConfig, run_er_pipeline
    from pyspark_entity_resolution_spark.plans.queries_text import (
        _BANDS,
        _NUM_HASHES,
    )

    def _timed(tag, fn):
        # min of 2: the first run pays JVM/codegen + Python-worker
        # startup (measured 10x inflation on the first probe of a cold
        # session), which is not the scaling signal
        best, n = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        print(f"[trio] {tag}: {best:.1f}s ({n} rows)", flush=True)
        return best

    # --- MinHash-LSH dedup: sf0.1 documents (5k docs) vs x10 (50k) ---
    # spread() matches the bench query's plan: the base table is ONE
    # parquet file -> one input partition, and without the repartition the
    # whole signature+verify pipeline runs on a single core (measured 79 s
    # vs ~7 s) — the probe would measure partitioning skew, not scaling
    from pyspark_entity_resolution_spark.plans.common import spread

    base = spread(spark, spark.read.parquet("/root/testdata/sf0.1/documents.parquet"))
    big = spread(spark, spark.read.parquet(_docs_x10(spark)))
    t1 = _timed(
        "minhash_lsh 5k docs",
        lambda: minhash_lsh_dedup(
            base, num_hashes=_NUM_HASHES, bands=_BANDS, threshold=0.5
        ).count(),
    )
    t2 = _timed(
        "minhash_lsh 50k docs (x10)",
        lambda: minhash_lsh_dedup(
            big, num_hashes=_NUM_HASHES, bands=_BANDS, threshold=0.5
        ).count(),
    )
    print(f"[trio] minhash_lsh x10 data -> x{t2 / t1:.1f} time", flush=True)

    # --- connected components: 1M vs 10M edges ---
    from pyspark_entity_resolution_spark.operators.clustering import (
        connected_components,
    )

    def _cc(n_nodes, n_edges):
        edges = (
            spark.range(n_edges)
            .select(
                (F.abs(F.xxhash64(F.col("id"))) % n_nodes).alias("src"),
                (F.abs(F.xxhash64(F.col("id") + 7_777_777)) % n_nodes).alias("dst"),
            )
            .localCheckpoint()
        )
        return connected_components(edges).select("component").distinct().count()

    t1 = _timed("connected_components 1M edges", lambda: _cc(500_000, 1_000_000))
    t2 = _timed("connected_components 10M edges (x10)", lambda: _cc(5_000_000, 10_000_000))
    print(f"[trio] connected_components x10 data -> x{t2 / t1:.1f} time", flush=True)

    # --- full ER pipeline: 3k/side (bench scale) vs 30k/side ---
    def _er(n, path):
        pa, pb = _gen_er_corpus(path, n_per_side=n)
        out = run_er_pipeline(spark, pa, pb, ERConfig(window=3))
        return out["entities"].count()

    t1 = _timed("er_pipeline 3k/side", lambda: _er(3000, "/tmp/er_bench_corpus_v1"))
    t2 = _timed(
        "er_pipeline 30k/side (x10)", lambda: _er(30000, "/tmp/er_scale_corpus_30k")
    )
    print(f"[trio] er_pipeline x10 data -> x{t2 / t1:.1f} time", flush=True)

    # --- exact substring dedup: same x10 corpus (the per-copy token salt
    # keeps window hashes copy-local too, so duplicated-span volume is
    # exactly 10x, never cross-copy inflated) ---
    from pyspark_entity_resolution_spark.operators.substring_dedup import (
        duplicated_spans,
    )

    t1 = _timed(
        "substring_spans 5k docs", lambda: duplicated_spans(base, w=10).count()
    )
    t2 = _timed(
        "substring_spans 50k docs (x10)", lambda: duplicated_spans(big, w=10).count()
    )
    print(f"[trio] substring_spans x10 data -> x{t2 / t1:.1f} time", flush=True)


def _docs_xn(spark, factor: int, base_dir: str = "/root/testdata/sf0.1") -> str:
    """``factor``x documents corpus at /tmp (cached) — same construction
    as :func:`_docs_x10` (copy 0 original, copies 1..n-1 id-remapped and
    token-salted so near-dup structure stays copy-local) but built as ONE
    cross-join plan instead of an n-way union, which keeps the logical
    plan O(1) in ``factor``."""
    import os

    from pyspark.sql import functions as F

    dest = f"/tmp/scale_docs_x{factor}.parquet"
    if os.path.exists(dest + "/_SUCCESS"):
        return dest
    docs = spark.read.parquet(f"{base_dir}/documents.parquet")
    copies = spark.range(factor).select(F.col("id").alias("__copy"))
    salted = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(t, F.lit("~"), F.col("__copy").cast("string")),
        ),
    )
    out = docs.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("__copy") * 10_000_000).alias("doc_id"),
        F.when(F.col("__copy") == 0, F.col("text")).otherwise(salted).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    out.repartition(64).write.mode("overwrite").parquet(dest)
    return dest


def _timed_century(tag, fn, runs=2):
    # base legs: min-of-2 (cold-start inflation is not the scaling
    # signal). x100 legs: one run — at 100-900 s a warm-up rerun
    # doubles probe cost for a <5% correction.
    best, n = None, None
    for _ in range(runs):
        t0 = time.perf_counter()
        n = fn()
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    print(f"[century] {tag}: {best:.1f}s ({n} rows)", flush=True)
    return best


def _with_scaled_partitions(spark, fn, factor=8):
    # emulate cluster sizing: shuffle width must grow with the data
    # (a real 100x cluster config would set this); AQE only
    # coalesces DOWN, so a fixed sf0.1-sized width silently spills
    # at x100 (measured x1.8 on the substring leg)
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(int(old) * factor))
    try:
        return fn()
    finally:
        spark.conf.set(key, old)


CENTURY_FAMILIES = (
    "century-minhash", "century-substring", "century-ngram", "century-cc",
    "century-image", "century-lev",
    "century-er", "century-ingest", "century-labelstore", "century-winnow",
    "century-audio",
)


def probe_century() -> None:
    """TWO measured decades (x100 data) for the heaviest dedup operators,
    connected components, and the full ER pipeline — the direct answer
    to "would this survive 100x". Each family runs in its OWN
    subprocess (fresh JVM): an earlier in-process design measured a
    later family's base leg at 42-61 s vs 7.4 s in a fresh session —
    the x100 legs' checkpoint blocks bloat the heap and advisory
    System.gc() does not deflate it, so only process isolation keeps
    the base legs honest. Corpora are cached on /tmp, so the x100
    inputs build once and every family pays only its own legs."""
    import subprocess

    for mode in CENTURY_FAMILIES:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode], check=True
        )


def probe_century_minhash(spark) -> None:
    from pyspark_entity_resolution_spark.operators.dedup import minhash_lsh_dedup
    from pyspark_entity_resolution_spark.plans.common import spread
    from pyspark_entity_resolution_spark.plans.queries_text import (
        _BANDS,
        _NUM_HASHES,
    )

    base = spread(spark, spark.read.parquet("/root/testdata/sf0.1/documents.parquet"))
    big = spread(spark, spark.read.parquet(_docs_xn(spark, 100)), factor=2)
    t1 = _timed_century(
        "minhash_lsh 5k docs",
        lambda: minhash_lsh_dedup(
            base, num_hashes=_NUM_HASHES, bands=_BANDS, threshold=0.5
        ).count(),
        runs=3,
    )
    t2 = _timed_century(
        "minhash_lsh 500k docs (x100)",
        lambda: _with_scaled_partitions(
            spark,
            lambda: minhash_lsh_dedup(
                big, num_hashes=_NUM_HASHES, bands=_BANDS, threshold=0.5
            ).count(),
        ),
        runs=1,
    )
    print(f"[century] minhash_lsh x100 data -> x{t2 / t1:.1f} time", flush=True)


def probe_century_substring(spark) -> None:
    from pyspark_entity_resolution_spark.operators.substring_dedup import (
        duplicated_spans,
    )
    from pyspark_entity_resolution_spark.plans.common import spread

    base = spread(spark, spark.read.parquet("/root/testdata/sf0.1/documents.parquet"))
    big = spread(spark, spark.read.parquet(_docs_xn(spark, 100)), factor=2)
    t1 = _timed_century(
        "substring_spans 5k docs",
        lambda: duplicated_spans(base, w=10).count(),
        runs=3,
    )
    t2 = _timed_century(
        "substring_spans 500k docs (x100)",
        lambda: _with_scaled_partitions(
            spark, lambda: duplicated_spans(big, w=10).count()
        ),
        runs=1,
    )
    print(f"[century] substring_spans x100 data -> x{t2 / t1:.1f} time", flush=True)


def probe_century_ngram(spark) -> None:
    """x100 leg for the n-gram Jaccard SCALE path: AllPairs/PPJoin
    prefix filtering over token shingles (the selective-vocabulary
    regime the strategy exists for). The blocked default is the
    small-block baseline and is deliberately NOT run at x100: within
    (lang, source) blocks it is O(sum block^2) — at 500k docs that is
    ~2.8e9 array intersections, hours of work the prefix path replaces
    with rare-gram bucket joins. The x100 corpus's per-copy token salt
    makes every copy's shingle vocabulary disjoint, so the correct
    result is EXACTLY 100x the base pair set (id-remapped) — the probe
    asserts that, making this a correctness check at scale, not just a
    timing. Standalone mode: ``scale_probe.py century-ngram``."""
    from pyspark_entity_resolution_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from pyspark_entity_resolution_spark.plans.common import spread

    base = spread(spark, spark.read.parquet("/root/testdata/sf0.1/documents.parquet"))

    def _pairs(df):
        return ngram_jaccard_pairs(
            df, k=3, threshold=0.6, strategy="prefix", shingle="token"
        ).count()

    n_base = _pairs(base)
    t1 = _timed_century("ngram_prefix 5k docs", lambda: _pairs(base), runs=3)
    # build (or cache-hit) the x100 corpus only AFTER the base leg is
    # timed: the 500k-doc build in the same JVM bloats the heap and a
    # first-run base leg measured after it read 30.7 s vs 5-6 s clean
    big = spread(spark, spark.read.parquet(_docs_xn(spark, 100)), factor=2)
    counted = {}
    t2 = _timed_century(
        "ngram_prefix 500k docs (x100)",
        lambda: counted.setdefault(
            "n", _with_scaled_partitions(spark, lambda: _pairs(big))
        ),
        runs=1,
    )
    assert counted["n"] == 100 * n_base, (
        f"x100 corpus must yield exactly 100x the base pairs "
        f"(copy-local salting): got {counted['n']}, want {100 * n_base}"
    )
    print(
        f"[century] ngram_prefix x100 data -> x{t2 / t1:.1f} time "
        f"({n_base} -> {counted['n']} pairs, exactly 100x: OK)",
        flush=True,
    )


def probe_century_cc(spark) -> None:
    import json

    from pyspark.sql import functions as F

    from pyspark_entity_resolution_spark.operators import clustering
    from pyspark_entity_resolution_spark.operators.clustering import (
        connected_components,
    )

    def _cc(n_nodes, n_edges):
        # no probe-side localCheckpoint: connected_components checkpoints
        # its input itself, and a second full-edge-set copy held across
        # the whole call was exactly the heap pressure that tipped the
        # x100 leg (100M edges, 8g) into AGGREGATE_OUT_OF_MEMORY
        edges = spark.range(n_edges).select(
            (F.abs(F.xxhash64(F.col("id"))) % n_nodes).alias("src"),
            (F.abs(F.xxhash64(F.col("id") + 7_777_777)) % n_nodes).alias("dst"),
        )
        n = connected_components(edges).select("component").distinct().count()
        # per-round decomposition (r8 task #8): the 100M leg's 375-730 s
        # night-to-night band needs attributing to round-count vs
        # per-round shuffle time; one line per call so every _timed
        # repetition is visible, not just the min
        print(
            "[century] cc_round_sec "
            + json.dumps(clustering.LAST_RUN_ROUND_STATS),
            flush=True,
        )
        return n

    t1 = _timed_century(
        "connected_components 1M edges", lambda: _cc(500_000, 1_000_000),
        runs=3,
    )
    # Width note (re-bisected in r6 on the memory-aware-checkpoint
    # code): narrow width measured WORSE here this time (591 s at 32 vs
    # 542 s at x8, 64g heap, single runs inside the documented noise
    # band) — the r4 "narrow wins" lesson does not survive the r6
    # checkpoint changes, so the leg keeps the same x8 scaling as the
    # pair-verify legs for cross-round comparability.
    t2 = _timed_century(
        "connected_components 100M edges (x100)",
        lambda: _with_scaled_partitions(
            spark, lambda: _cc(50_000_000, 100_000_000)
        ),
        runs=1,
    )
    print(
        f"[century] connected_components x100 data -> x{t2 / t1:.1f} time",
        flush=True,
    )


def probe_century_er(spark) -> None:
    """The flagship path two decades up: full ER pipeline (parse ->
    clean -> block N=3 -> match -> CC -> resolve) at 300k records/side
    vs the 3k bench scale. Year-window blocking makes candidate pairs
    quadratic in PER-YEAR density, so the x100 corpus widens the year
    span x100 (records/year held at the bench corpus's 300/side) — the
    blocked workload is then exactly x100, the ER analog of the dedup
    legs' per-copy token salting. Planted-duplicate volume stays
    n-proportional. Standalone mode: ``scale_probe.py century-er``."""
    from pyspark_entity_resolution_spark.pipeline import (
        ERConfig,
        run_er_pipeline,
    )

    # corpora generated OUTSIDE the timed region (the 300k-side dump is
    # ~60 s of driver-side Python string building — workload setup, not
    # engine time)
    base_paths = _gen_er_corpus("/tmp/er_bench_corpus_v1", n_per_side=3000)
    big_paths = _gen_er_corpus(
        "/tmp/er_scale_corpus_300k_y1000", n_per_side=300_000, n_years=1000
    )

    def _er(paths, n_years):
        cfg = ERConfig(window=3, year_upper=1995 + n_years - 1)
        out = run_er_pipeline(spark, paths[0], paths[1], cfg)
        return out["entities"].count()

    t1 = _timed_century(
        "er_pipeline 3k/side", lambda: _er(base_paths, 10), runs=3
    )
    t2 = _timed_century(
        "er_pipeline 300k/side (x100, year span x100)",
        lambda: _with_scaled_partitions(spark, lambda: _er(big_paths, 1000)),
        runs=2,
    )
    print(f"[century] er_pipeline x100 data -> x{t2 / t1:.1f} time", flush=True)


def _emb_x10(spark, base_dir: str = "/root/testdata/sf0.1") -> str:
    """10x embeddings corpus at /tmp (cached): copies 1-9 get remapped
    ids and a per-copy nudge on the first vector component, so no copy
    is an exact duplicate (which would make cosine top-k degenerate to
    ties) while the overall geometry stays realistic."""
    import os

    from pyspark.sql import functions as F

    dest = "/tmp/scale_emb_x10.parquet"
    if os.path.exists(dest + "/_SUCCESS"):
        return dest
    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet")

    def _nudge(i):
        # PySpark infers HOF arity from the lambda's parameter count, so
        # the copy index must be captured by closure, not a default arg
        return lambda x, j: F.when(
            j == 0, (x + F.lit(i * 0.013)).cast("float")
        ).otherwise(x)

    copies = [emb]
    for i in range(1, 10):
        copies.append(
            emb.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.transform(F.col("embedding"), _nudge(i)).alias("embedding"),
                "label",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(dest)
    return dest


def probe_ann(spark) -> None:
    """Decade probe for the ANN arms: a FIXED 200-query set against the
    sf0.1 embeddings corpus (2k vectors) vs the x10 corpus (20k).
    Measures the adaptive-plane claim (operators/ann.py
    choose_num_planes): plane count grows with log2(corpus), so
    per-bucket candidate volume — and therefore query cost — stays
    ~flat while a fixed-plane scheme would grow linearly."""
    from pyspark.sql import functions as F

    from pyspark_entity_resolution_spark.operators.ann import (
        brute_force_topk,
        lsh_topk,
    )
    from pyspark_entity_resolution_spark.plans.common import spread

    def _timed(tag, fn):
        best, n = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        print(f"[ann] {tag}: {best:.1f}s ({n} rows)", flush=True)
        return best

    base = spread(
        spark, spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    )
    big = spread(spark, spark.read.parquet(_emb_x10(spark)))
    queries = (
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .filter(F.col("vec_id") % 10 == 0)
        .limit(200)
        .localCheckpoint()
    )

    t1 = _timed(
        "lsh_topk adaptive, 2k corpus",
        lambda: lsh_topk(queries, base, k=5).count(),
    )
    t2 = _timed(
        "lsh_topk adaptive, 20k corpus (x10)",
        lambda: lsh_topk(queries, big, k=5).count(),
    )
    print(f"[ann] lsh_topk x10 corpus -> x{t2 / t1:.2f} time", flush=True)

    t3 = _timed(
        "brute_force_topk, 2k corpus",
        lambda: brute_force_topk(queries, base, k=5).count(),
    )
    t4 = _timed(
        "brute_force_topk, 20k corpus (x10)",
        lambda: brute_force_topk(queries, big, k=5).count(),
    )
    print(
        f"[ann] brute_force x10 corpus -> x{t4 / t3:.2f} time "
        f"(the linear contrast)",
        flush=True,
    )

    # --- ingest-time embedding near-dup: fixed arriving batch (200
    # vectors) probed against the PERSISTED LSH key index of a 2k vs
    # 20k accepted corpus. The claim: per-arrival cost tracks bucket
    # occupancy, not corpus size — adaptive planes hold occupancy flat,
    # so the x10 corpus costs ~the same per arriving batch.
    from pyspark_entity_resolution_spark.operators.ann import (
        choose_num_planes,
        incremental_embedding_matches,
        lsh_corpus_index,
    )

    def _ingest(corpus):
        n = corpus.count()
        planes = choose_num_planes(n)
        idx = lsh_corpus_index(corpus, num_planes=planes, num_tables=4)
        return incremental_embedding_matches(
            queries, idx, corpus, threshold=0.9,
            num_planes=planes, num_tables=4,
        ).count()

    t5 = _timed("ingest matches, 2k corpus index", lambda: _ingest(base))
    t6 = _timed("ingest matches, 20k corpus index (x10)", lambda: _ingest(big))
    print(
        f"[ann] ingest_matches x10 corpus -> x{t6 / t5:.2f} time "
        f"(fixed arriving batch)",
        flush=True,
    )

    # --- product quantization: the compressed-scan decade. ADC is a
    # brute-force-shaped scan like brute_force_topk above, but over the
    # m-codes table instead of raw 64-float vectors — the probe
    # separates the TRAIN+ASSIGN cost (linear, done once per corpus
    # vintage, like building the LSH index) from the per-query-batch
    # SERVING scan on the persisted codes.
    from pyspark_entity_resolution_spark.operators.pq import (
        pq_assign,
        pq_topk,
        pq_train,
    )

    def _pq_codes(corpus):
        books = pq_train(corpus, dim=64, m=4, k=8, max_iterations=2, quantize=6)
        codes = pq_assign(corpus, books, dim=64, quantize=6).localCheckpoint()
        codes.count()
        return books, codes

    b_base, c_base = _pq_codes(base)
    b_big, c_big = _pq_codes(big)
    t7 = _timed(
        "pq_adc_topk, 2k codes",
        lambda: pq_topk(queries, c_base, b_base, dim=64, topk=5).count(),
    )
    t8 = _timed(
        "pq_adc_topk, 20k codes (x10)",
        lambda: pq_topk(queries, c_big, b_big, dim=64, topk=5).count(),
    )
    print(
        f"[ann] pq_adc x10 corpus -> x{t8 / t7:.2f} time "
        f"(compressed scan vs brute_force's x{t4 / t3:.2f} raw scan)",
        flush=True,
    )

    # --- IVF-PQ residual (TPAMI'11 §IV): the higher-recall encoding.
    # Same decade shape as plain ADC, at fixed nprobe; plus the
    # recall-vs-plain check at identical bits (m=4, k=8, nprobe=4) —
    # residual coding models within-list displacements, so its recall
    # must not fall below the raw encoding's on the same corpus.
    from pyspark_entity_resolution_spark.operators.pq import (
        ivf_pq_topk,
        ivf_pq_train,
    )

    def _ivf_centroids(corpus, every=64):
        return corpus.filter(F.col("vec_id") % every == 0).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        ).localCheckpoint()

    cent_base = _ivf_centroids(base)
    cent_big = _ivf_centroids(big)
    NPROBE = 4

    def _ivf_run(corpus, cent, residual, books):
        return ivf_pq_topk(
            queries, corpus, cent, dim=64, m=4, k=8, nprobe=NPROBE,
            topk=5, quantize=6, residual=residual, codebooks=books,
        )

    books_res_base = ivf_pq_train(base, cent_base, dim=64, m=4, k=8,
                                  quantize=6, residual=True)
    books_res_big = ivf_pq_train(big, cent_big, dim=64, m=4, k=8,
                                 quantize=6, residual=True)
    t9 = _timed(
        f"ivf_pq residual nprobe={NPROBE}, 2k corpus",
        lambda: _ivf_run(base, cent_base, True, books_res_base).count(),
    )
    t10 = _timed(
        f"ivf_pq residual nprobe={NPROBE}, 20k corpus (x10)",
        lambda: _ivf_run(big, cent_big, True, books_res_big).count(),
    )
    print(
        f"[ann] ivf_pq_residual x10 corpus -> x{t10 / t9:.2f} time "
        f"(pruned compressed scan; plain adc read x{t8 / t7:.2f})",
        flush=True,
    )

    # recall vs exact euclidean top-5 at the same nprobe/bits, on a
    # CLUSTERED corpus (the regime the paper's residual claim is
    # about): the sf0.1 embeddings are near-uniform, where coarse
    # residuals carry no structure and both encodings bottom out at
    # ~4% recall with these tiny m=4/k=8 codebooks — a comparison
    # there measures noise, not the encoding. 2k vectors in 32
    # gaussian clusters (sigma 2 around centers spanning +-100), true
    # centers as the IVF centroids; exact set computed driver-side
    # (2k x 64 floats).
    import numpy as np

    rng = np.random.RandomState(7)
    n_clusters, per, dim = 32, 64, 64
    centers = rng.uniform(-100, 100, size=(n_clusters, dim))
    vecs = np.repeat(centers, per, axis=0) + rng.normal(
        0, 2.0, (n_clusters * per, dim)
    )
    clus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>",
    ).localCheckpoint()
    clus_cent = spark.createDataFrame(
        [(c, [float(x) for x in centers[c]]) for c in range(n_clusters)],
        "centroid_id long, centroid_vec array<double>",
    ).localCheckpoint()
    clus_q = clus.filter(F.col("vec_id") % per == 0).localCheckpoint()
    qids = [int(r["vec_id"]) for r in clus_q.select("vec_id").collect()]
    exact = {}
    for q in qids:
        d = ((vecs - vecs[q]) ** 2).sum(1)
        d[q] = np.inf
        exact[q] = set(np.lexsort((np.arange(len(vecs)), d))[:5].tolist())

    def _recall(residual, books):
        got = {}
        rows = ivf_pq_topk(
            clus_q, clus, clus_cent, dim=dim, m=4, k=8, nprobe=NPROBE,
            topk=5, quantize=6, residual=residual, codebooks=books,
        ).collect()
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(got.get(q, set()) & exact[q]) / 5 for q in qids
        ) / len(qids)

    r_plain = _recall(
        False, ivf_pq_train(clus, clus_cent, dim=dim, m=4, k=8, quantize=6)
    )
    r_res = _recall(
        True,
        ivf_pq_train(clus, clus_cent, dim=dim, m=4, k=8, quantize=6,
                     residual=True),
    )
    print(
        f"[ann] ivf_pq recall@5 vs exact euclidean, clustered corpus, "
        f"nprobe={NPROBE}: plain={r_plain:.3f} residual={r_res:.3f}",
        flush=True,
    )
    assert r_res > r_plain, (
        f"residual encoding recall ({r_res:.3f}) did not beat plain ADC "
        f"({r_plain:.3f}) on clustered data at identical bits/nprobe — "
        "wrong-domain LUTs?"
    )


def _emb_xn(spark, factor: int, base_dir: str = "/root/testdata/sf0.1") -> str:
    """factor-x embeddings corpus at /tmp (cached): each copy gets
    remapped ids and a per-copy ROTATION + DETERMINISTIC SIGN-FLIP of
    the components — both orthogonal transforms, so within-copy inner
    products (and thus the near-dup structure the probe's arriving
    batch hits in copy 0) are preserved exactly, while cross-copy
    cosines are incoherent (expected 0, concentration ~1/sqrt(64)),
    far below any near-dup threshold. Rotation alone is not enough at
    factor > dim: copies c and c+64 would share a rotation, so the
    per-copy sign pattern (hash parity of (copy, position)) breaks the
    tie. The first cut of this helper used a first-component NUDGE
    (the ANN probe's tie-breaker trick) — measured INSUFFICIENT here:
    at threshold 0.9 the x100 corpus matched 7,148 rows vs the base's
    200, quietly turning the fixed-batch probe into a growing-output
    one. Built via one broadcast cross join so x100 is a single pass."""
    from pyspark.sql import functions as F

    dest = f"/tmp/scale_emb_xn{factor}_rot.parquet"
    if os.path.exists(dest + "/_SUCCESS"):
        return dest
    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    copies = spark.range(factor).select(F.col("id").alias("__copy"))
    out = (
        emb.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("__copy") * 10_000_000).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                # copy 0 is the IDENTITY (sign +1, rotation 0): the
                # probe's arriving batch carries raw base vectors, so
                # its in-corpus near-dups must survive verbatim in the
                # scaled corpus — the first cut sign-flipped copy 0 too
                # and the x100 leg matched 0 rows
                lambda x, j: F.when(F.col("__copy") == 0, x).otherwise(
                    (
                        (
                            F.lit(1.0)
                            - 2.0
                            * F.pmod(
                                F.xxhash64(F.col("__copy") * dim + j), F.lit(2)
                            ).cast("double")
                        ).cast("float")
                        * F.element_at(
                            F.col("embedding"),
                            (F.pmod(j + F.col("__copy"), F.lit(dim)) + 1).cast(
                                "int"
                            ),
                        )
                    ).cast("float")
                ),
            ).alias("embedding"),
            "label",
        )
    )
    out.repartition(64).write.mode("overwrite").parquet(dest)
    return dest


def probe_century_ingest(spark) -> None:
    """Ingest-time near-dup serving cost two decades up — THE 100 TB
    story for these paths: a FIXED arriving batch probes a PERSISTED
    corpus index (parquet on disk, built untimed) at x1 vs x100 corpus
    size. The arriving side equi-joins the slim (id + keys) index and
    verification joins only the admitted candidates, so corpus growth
    enters the timed leg only through the index/profile scan — never a
    corpus re-hash or all-pairs pass. Expect the x100 leg to track the
    batch size (near-flat), not the corpus. MinHash (text) and
    sign-LSH (embedding, planes scaled by choose_num_planes exactly as
    production would) twins. Standalone: ``scale_probe.py
    century-ingest``."""
    from pyspark.sql import functions as F

    from pyspark_entity_resolution_spark.operators.ann import (
        choose_num_planes,
        incremental_embedding_matches,
        lsh_corpus_index,
    )
    from pyspark_entity_resolution_spark.operators.dedup import (
        incremental_minhash_matches,
        minhash_corpus_index,
        token_profile,
    )

    # --- MinHash twin: 500-doc batch vs 5k and 500k corpora ----------
    base_docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    big_docs = spark.read.parquet(_docs_xn(spark, 100))
    batch = (
        base_docs.filter(F.col("doc_id") % 10 == 1).limit(500).localCheckpoint()
    )

    def _minhash_tables(docs, tag):
        ipath = f"/tmp/ingest_midx_{tag}.parquet"
        ppath = f"/tmp/ingest_mprof_{tag}.parquet"
        if not os.path.exists(ipath + "/_SUCCESS"):
            minhash_corpus_index(docs).write.mode("overwrite").parquet(ipath)
        if not os.path.exists(ppath + "/_SUCCESS"):
            token_profile(docs).write.mode("overwrite").parquet(ppath)
        return spark.read.parquet(ipath), spark.read.parquet(ppath)

    idx1, prof1 = _minhash_tables(base_docs, "x1")
    idx100, prof100 = _minhash_tables(big_docs, "x100")
    t1 = _timed_century(
        "minhash ingest probe, 500-doc batch, 5k-doc index",
        lambda: incremental_minhash_matches(batch, idx1, prof1).count(),
        runs=3,
    )
    t2 = _timed_century(
        "minhash ingest probe, 500-doc batch, 500k-doc index (x100)",
        lambda: incremental_minhash_matches(batch, idx100, prof100).count(),
        runs=3,
    )
    print(
        f"[century] minhash ingest probe x100 corpus -> x{t2 / t1:.2f} time "
        f"(fixed batch)",
        flush=True,
    )

    # --- embedding twin: 500-vector batch vs 2k and 200k corpora -----
    base_emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    big_emb = spark.read.parquet(_emb_xn(spark, 100))
    vbatch = (
        base_emb.filter(F.col("vec_id") % 10 == 1).limit(500).localCheckpoint()
    )

    def _emb_tables(emb, tag):
        n = emb.count()
        planes = choose_num_planes(n)
        ipath = f"/tmp/ingest_eidx_{tag}_p{planes}.parquet"
        if not os.path.exists(ipath + "/_SUCCESS"):
            lsh_corpus_index(emb, num_planes=planes, num_tables=4).write.mode(
                "overwrite"
            ).parquet(ipath)
        return spark.read.parquet(ipath), planes

    eidx1, p1 = _emb_tables(base_emb, "x1")
    eidx100, p100 = _emb_tables(big_emb, "x100")
    t3 = _timed_century(
        f"embedding ingest probe, 500-vec batch, 2k-vec index (planes={p1})",
        lambda: incremental_embedding_matches(
            vbatch, eidx1, base_emb, threshold=0.9, num_planes=p1, num_tables=4
        ).count(),
        runs=3,
    )
    t4 = _timed_century(
        f"embedding ingest probe, 500-vec batch, 200k-vec index (x100, planes={p100})",
        lambda: incremental_embedding_matches(
            vbatch, eidx100, big_emb, threshold=0.9, num_planes=p100,
            num_tables=4,
        ).count(),
        runs=3,
    )
    print(
        f"[century] embedding ingest probe x100 corpus -> x{t4 / t3:.2f} time "
        f"(fixed batch)",
        flush=True,
    )


def probe_century_labelstore(spark) -> None:
    """Streaming-ER label-store fold + point-lookup cost two decades up —
    the serving story behind `streaming/er.py`: a FIXED 1k-match batch
    (50 touched components, 20 new members each) folds into a PERSISTED
    bucketed label store at x1 vs x100 store size, with `n_buckets`
    scaled with the store exactly as a deployment would size it (the
    sidecar pins the layout), so per-bucket row count is constant and
    the fold's contract — read O(touched components) through the
    component->bucket index, rewrite O(touched buckets) — predicts
    near-flat fold cost while the store grows x100. The initial store
    build is untimed (it is history, not serving). `entity_lookup` of a
    fixed 100-key set is timed the same way: bucket-pruned reads should
    track the key count, not the store. Standalone: ``scale_probe.py
    century-labelstore``."""
    import shutil

    from pyspark.sql import functions as F

    from pyspark_entity_resolution_spark.streaming.er import (
        entity_lookup,
        incremental_entity_labels,
    )

    SPAN = 100_000  # id span reserved per group (root + members + probe ids)
    PER = 15        # members per group in the initial store

    def _star_matches(n_groups):
        # group g: root a:(g*SPAN) matched to members b:(g*SPAN+1..PER)
        # — one component per group, built in a single untimed fold
        return spark.range(n_groups * PER).select(
            ((F.col("id") / PER).cast("long") * SPAN).alias("a_id"),
            (
                (F.col("id") / PER).cast("long") * SPAN
                + 1
                + F.col("id") % PER
            ).alias("b_id"),
        )

    def _probe_batch(n_groups, fold, k_groups=50, per=20):
        # 50 groups spread across the id space, `per` NEVER-SEEN member
        # ids each (offset block per fold) — every fold does identical
        # work: touch 50 components, attach 1000 new nodes
        stride = max(1, n_groups // k_groups)
        g = (F.col("id") / per).cast("long") * stride * SPAN
        return spark.range(k_groups * per).select(
            g.alias("a_id"),
            (g + 1_000 + fold * per + F.col("id") % per).alias("b_id"),
        )

    def _leg(tag, n_groups, n_buckets):
        path = f"/tmp/labelstore_probe_{tag}"
        shutil.rmtree(path, ignore_errors=True)
        incremental_entity_labels(
            spark, path, _star_matches(n_groups), n_buckets=n_buckets
        )  # untimed history build
        folds = []
        for fold in range(3):
            t0 = time.perf_counter()
            incremental_entity_labels(
                spark, path, _probe_batch(n_groups, fold), n_buckets=n_buckets
            )
            folds.append(time.perf_counter() - t0)
        keys = [f"a:{g * (max(1, n_groups // 100)) * SPAN}" for g in range(100)]
        lookups = []
        for _ in range(3):
            t0 = time.perf_counter()
            entity_lookup(spark, path, keys, n_buckets=n_buckets).count()
            lookups.append(time.perf_counter() - t0)
        print(
            f"[century] labelstore {tag}: {n_groups * (PER + 1)} labels, "
            f"{n_buckets} buckets — fold(1k matches/50 components) "
            f"min {min(folds):.2f}s {[round(t, 2) for t in folds]}, "
            f"lookup(100 keys) min {min(lookups):.2f}s",
            flush=True,
        )
        return min(folds), min(lookups)

    f1, l1 = _leg("x1", 12_500, 8)       # 200k labels, 25k rows/bucket
    f100, l100 = _with_scaled_partitions(
        spark, lambda: _leg("x100", 1_250_000, 800)
    )                                    # 20M labels, same rows/bucket
    print(
        f"[century] labelstore x100 store -> fold x{f100 / f1:.2f}, "
        f"lookup x{l100 / l1:.2f} (fixed batch / fixed keys)",
        flush=True,
    )


def _docs_xn_affine(spark, factor: int) -> str:
    """``factor``x documents corpus for CHARACTER-gram operators: copy
    i maps letters through the affine bijection j -> (a*j + b) mod 26
    (a coprime to 26) — the first 26 maps are the plain rotations, so
    the decade probe's x10 corpus is this generator at factor 10. The
    honesty argument: a bijective character map preserves within-copy
    gram structure exactly (positions, repetition pattern, document
    frequencies), so fingerprint/pair output scales exactly ``factor``x
    and hashes stay copy-local — unlike the token-salt corpus
    (``_docs_x10``), which rewrites the char-gram frequency
    distribution (measured x32 output inflation at x10 data on the
    winnowing pair probe; token-level operators are unaffected and keep
    the salt construction). Built as one cross-join plan like
    :func:`_docs_xn`."""
    import os

    from pyspark.sql import functions as F

    dest = f"/tmp/scale_docs_x{factor}_aff.parquet"
    if os.path.exists(dest + "/_SUCCESS"):
        return dest
    alpha = "abcdefghijklmnopqrstuvwxyz"
    maps = []
    for a in (1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25):
        for b in range(26):
            maps.append("".join(alpha[(a * j + b) % 26] for j in range(26)))
            if len(maps) == factor:
                break
        if len(maps) == factor:
            break
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    # the exactly-factor-x / copy-local-hashes invariant requires every
    # NON-SPACE character to be mapped: an unmapped char (uppercase,
    # digit, punctuation) passes through identically in all copies, so
    # grams made only of such chars would collide ACROSS copies and
    # break the probe's honesty argument. Space itself is safe: the
    # consumers normalize whitespace runs to single spaces, so every
    # k>=2 gram contains a mapped letter. The fixture is
    # lowercase+space by construction — verify rather than assume
    # (one cheap scan).
    n_unmapped = docs.filter(F.col("text").rlike("[^a-z ]")).count()
    if n_unmapped:
        raise AssertionError(
            f"_docs_xn_affine: {n_unmapped} documents contain characters "
            "outside [a-z ] — the affine map would leave them identical "
            "across copies and the probe's exact-factor invariant breaks; "
            "extend the map before scaling this corpus"
        )
    copies = spark.range(factor).select(F.col("id").alias("__copy"))
    # per-copy translate via an array literal indexed by copy id (keeps
    # the plan O(1) in factor, unlike a when-chain). F.translate demands
    # LITERAL from/to strings, but the SQL form takes any expression.
    out = (
        docs.crossJoin(F.broadcast(copies))
        .withColumn("__tr", F.element_at(F.lit(maps), (F.col("__copy") + 1).cast("int")))
        .select(
            (F.col("doc_id") + F.col("__copy") * 10_000_000).alias("doc_id"),
            F.expr(f"translate(text, '{alpha}', __tr)").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    out.repartition(64).write.mode("overwrite").parquet(dest)
    return dest


def probe_century_audio(spark) -> None:
    """Media family at x1/x10/x100 (r9): planted near-dup WAV clips
    (tools/media_corpus.py — 3 qualifying pairs per 10-clip group, pure
    hash patterns so an n-fold corpus has EXACTLY n-fold pairs). Two
    legs per scale: decode throughput through the Arrow
    extract_audio_features kernel (clips/s), and the full fingerprints
    -> banded near-dup join with the exact planted-pair assertion."""
    from pyspark_entity_resolution_spark.operators.multimodal import (
        audio_fingerprints,
        audio_near_dup_pairs,
        audio_near_dup_pairs_shifted,
        extract_audio_features,
    )
    from tools.media_corpus import (
        WINDOW_FRAMES,
        build_media_corpus,
        expected_audio_pairs,
    )

    base_n = 2_000
    legs = {}
    for factor in (1, 10, 100):
        n = base_n * factor
        media = spark.read.parquet(
            build_media_corpus(
                spark, f"/tmp/scale_media_x{factor}.parquet", n_audio=n
            )
        )

        def _decode(m=media):
            return extract_audio_features(m).count()

        def _pairs(m=media, nn=n):
            fps = audio_fingerprints(m, window_frames=WINDOW_FRAMES)
            got = audio_near_dup_pairs(fps, min_match_fraction=0.9).count()
            want = expected_audio_pairs(nn)
            if got != want:
                raise AssertionError(
                    f"x{nn // base_n}: {got} pairs, planted {want}"
                )
            return got

        def _shifted(m=media):
            # MinHash banding recall is probabilistic (deterministic per
            # corpus) — the count is RECORDED for the artifact; the
            # exact planted assertion rides the aligned leg above
            fps = audio_fingerprints(m, window_frames=WINDOW_FRAMES)
            return audio_near_dup_pairs_shifted(
                fps, max_shift_windows=4
            ).count()

        runs = 2 if factor == 1 else 1
        td = _timed_century(f"audio_decode {n} clips", _decode, runs=runs)
        tp = _timed_century(
            f"audio_near_dup {n} clips",
            (lambda f=_pairs: _with_scaled_partitions(spark, f))
            if factor == 100 else _pairs,
            runs=runs,
        )
        ts = _timed_century(
            f"audio_near_dup_shifted {n} clips",
            (lambda f=_shifted: _with_scaled_partitions(spark, f))
            if factor == 100 else _shifted,
            runs=runs,
        )
        legs[factor] = (td, tp, ts)
        print(f"[century] audio_decode x{factor}: {n / td:.0f} clips/s",
              flush=True)
    for factor in (10, 100):
        print(
            f"[century] audio x{factor} data -> "
            f"decode x{legs[factor][0] / legs[1][0]:.1f} time, "
            f"near_dup x{legs[factor][1] / legs[1][1]:.1f} time, "
            f"shifted x{legs[factor][2] / legs[1][2]:.1f} time",
            flush=True,
        )


def probe_century_image(spark) -> None:
    """Image-decode family at x1/x10/x100 (r10, r9 verdict task 6;
    r11: +MJPEG-AVI sampled-frame decode): PNG + baseline-JPEG full
    pixel decode, GIF frame sampling, and MJPEG-in-AVI sampled-frame
    decode through the stdlib kernels over the deterministic
    tools/media_corpus.py payloads. Each leg carries an untimed
    row-count tripwire (decode rows == corpus size; GIF rows == 2
    sampled frames per 3-frame 0.5s-clocked clip; MJPEG rows ==
    expected_mjpeg_frames' replayed rational clock at
    every_n_seconds=1), so a silent workload change can never read as
    a perf delta. Per-payload Arrow kernels are expected LINEAR in
    clip count; the x10 leg usually reads sublinear (fixed-overhead
    amortization). Corpus cache is v2 (+AVIs) since r11."""
    from pyspark.sql import functions as F

    from pyspark_entity_resolution_spark.operators.multimodal import (
        extract_image_features,
        sample_video_frames,
    )
    from tools.media_corpus import build_media_corpus, expected_mjpeg_frames

    base = 1_000
    legs = {}
    for factor in (1, 10, 100):
        n = base * factor
        media = spark.read.parquet(
            build_media_corpus(
                spark, f"/tmp/scale_image_v2_x{factor}.parquet",
                n_audio=0, n_images=n, n_jpegs=n, n_gifs=n // 2,
                n_avis=n // 2,
            )
        )
        pngs = media.filter(F.col("mime") == "image/png")
        jpgs = media.filter(F.col("mime") == "image/jpeg")
        gifs = media.filter(F.col("mime") == "image/gif")
        avis = media.filter(F.col("mime") == "video/x-msvideo")

        def _png(m=pngs, nn=n):
            got = extract_image_features(m, codec="png-stdlib").count()
            if got != nn:
                raise AssertionError(f"png leg: {got} rows, corpus {nn}")
            return got

        def _jpeg(m=jpgs, nn=n):
            got = extract_image_features(m, codec="jpeg-stdlib").count()
            if got != nn:
                raise AssertionError(f"jpeg leg: {got} rows, corpus {nn}")
            return got

        def _gif(m=gifs, nn=n // 2):
            got = sample_video_frames(
                m, every_n_seconds=1, codec="gif-stdlib"
            ).count()
            if got != 2 * nn:
                raise AssertionError(
                    f"gif leg: {got} frames, expected {2 * nn}"
                )
            return got

        def _mjpeg(m=avis, nn=n // 2):
            got = sample_video_frames(
                m, every_n_seconds=1, codec="mjpeg-stdlib"
            ).count()
            want = expected_mjpeg_frames(nn)
            if got != want:
                raise AssertionError(
                    f"mjpeg leg: {got} frames, expected {want}"
                )
            return got

        runs = 2 if factor == 1 else 1
        tp = _timed_century(f"png_decode {n} images", _png, runs=runs)
        tj = _timed_century(f"jpeg_decode {n} images", _jpeg, runs=runs)
        tg = _timed_century(f"gif_frames {n // 2} clips", _gif, runs=runs)
        tm = _timed_century(f"mjpeg_frames {n // 2} clips", _mjpeg,
                            runs=runs)
        legs[factor] = (tp, tj, tg, tm)
        print(f"[century] png_decode x{factor}: {n / tp:.0f} images/s",
              flush=True)
    for factor in (10, 100):
        print(
            f"[century] image x{factor} data -> "
            f"png x{legs[factor][0] / legs[1][0]:.1f} time, "
            f"jpeg x{legs[factor][1] / legs[1][1]:.1f} time, "
            f"gif x{legs[factor][2] / legs[1][2]:.1f} time, "
            f"mjpeg x{legs[factor][3] / legs[1][3]:.1f} time",
            flush=True,
        )


def probe_century_lev(spark) -> None:
    """Affix-strip Levenshtein family at x1/x10/x100 (r11, r10 verdict
    task 4): the dense blocked pair scan (``blocked_levenshtein_pairs``,
    ed<=2) and the sparse ed-1 edge generation
    (``deletion_neighborhood_pairs``) over an id-styled corpus whose
    blocks carry HETEROGENEOUS affixes ('Cust00007#000123': the
    corpus-global strip sees only 'Cust', the r11 per-block strip
    removes 13 of 17 chars), so these legs exercise the per-block path
    end to end at the scale where the strip is the win. Every block
    holds the IDENTICAL member population (000000-000999 behind its own
    salt), so the output is exactly linear in block count — the
    tripwire asserts pairs-per-block equals the x1 leg's figure with
    zero remainder. Scaling adds blocks at constant block size, which
    is how a blocked pair scan actually grows at 100 TB (more blocks,
    not bigger ones)."""
    from pyspark.sql import functions as F

    from pyspark_entity_resolution_spark.operators.matching import (
        blocked_levenshtein_pairs,
        deletion_neighborhood_pairs,
    )

    base_blocks = 4
    per_block: dict[str, int] = {}

    def corpus(n_blocks):
        blk = (F.col("id") / 1000).cast("long")
        return spark.range(n_blocks * 1000).select(
            F.col("id"),
            blk.alias("blk"),
            F.concat(
                F.format_string("Cust%05d#", blk),
                F.format_string("%06d", F.col("id") % 1000),
            ).alias("s"),
        )

    def _tripwire(op, got, nb):
        if got % nb:
            raise AssertionError(
                f"{op} leg: {got} pairs not divisible by {nb} blocks")
        p = got // nb
        want = per_block.setdefault(op, p)
        if p != want:
            raise AssertionError(
                f"{op} leg: {p} pairs/block, x1 leg had {want}")
        return got

    legs = {}
    for factor in (1, 10, 100):
        nb = base_blocks * factor
        df = corpus(nb)

        def _dense(d=df, n=nb):
            return _tripwire(
                "dense",
                blocked_levenshtein_pairs(
                    d, "id", "s", block_cols=["blk"], max_distance=2
                ).count(),
                n,
            )

        def _ed1(d=df, n=nb):
            return _tripwire(
                "ed1",
                deletion_neighborhood_pairs(
                    d, "id", "s", block_cols=["blk"]
                ).count(),
                n,
            )

        runs = 2 if factor == 1 else 1
        if factor == 100:
            td = _timed_century(
                f"blocked_lev_pairs {nb} blocks (x100)",
                lambda: _with_scaled_partitions(spark, _dense), runs=1)
            te = _timed_century(
                f"ed1_neighborhood {nb} blocks (x100)",
                lambda: _with_scaled_partitions(spark, _ed1), runs=1)
        else:
            td = _timed_century(
                f"blocked_lev_pairs {nb} blocks", _dense, runs=runs)
            te = _timed_century(
                f"ed1_neighborhood {nb} blocks", _ed1, runs=runs)
        legs[factor] = (td, te)
    for factor in (10, 100):
        print(
            f"[century] lev x{factor} data -> "
            f"dense x{legs[factor][0] / legs[1][0]:.1f} time, "
            f"ed1 x{legs[factor][1] / legs[1][1]:.1f} time",
            flush=True,
        )


def probe_century_winnow(spark) -> None:
    """Winnowing fingerprints + overlap pairs TWO decades up: sf0.1
    (5k docs) vs the x100 affine-mapped corpus (500k docs) — output
    exactly x100 by construction. Standalone: ``century-winnow``."""
    from pyspark_entity_resolution_spark.operators.winnowing import (
        fingerprint_overlap_pairs,
        winnow_fingerprints,
    )
    from pyspark_entity_resolution_spark.plans.common import spread

    base = spread(spark, spark.read.parquet("/root/testdata/sf0.1/documents.parquet"))
    big = spread(spark, spark.read.parquet(_docs_xn_affine(spark, 100)), factor=2)

    def _run(df):
        fps = winnow_fingerprints(df).localCheckpoint(eager=False)
        return fps.count() + fingerprint_overlap_pairs(fps, max_df=10).count()

    t1 = _timed_century("winnow fp+pairs 5k docs", lambda: _run(base), runs=3)
    t2 = _timed_century(
        "winnow fp+pairs 500k docs (x100)",
        lambda: _with_scaled_partitions(spark, lambda: _run(big)),
        runs=1,
    )
    print(f"[century] winnow x100 data -> x{t2 / t1:.1f} time", flush=True)


def probe_winnow(spark) -> None:
    """One measured decade for winnowing fingerprints + overlap pairs
    (sf0.1 5k docs vs a x10 alphabet-rotated corpus — see
    :func:`_docs_xn_affine` (whose first 10 maps are exactly the plain
    rotations) for why char-gram probes must not reuse the token-salt
    corpus). Output scales exactly x10 by construction,
    so the time ratio is the engine-scaling signal."""
    from pyspark_entity_resolution_spark.operators.winnowing import (
        fingerprint_overlap_pairs,
        winnow_fingerprints,
    )
    from pyspark_entity_resolution_spark.plans.common import spread

    def _timed(tag, fn):
        best, n = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        print(f"[winnow] {tag}: {best:.1f}s ({n} rows)", flush=True)
        return best

    base = spread(spark, spark.read.parquet("/root/testdata/sf0.1/documents.parquet"))
    big = spread(spark, spark.read.parquet(_docs_xn_affine(spark, 10)))

    def _run(df, hash="md5"):
        fps = winnow_fingerprints(df, hash=hash).localCheckpoint(eager=False)
        return fps.count() + fingerprint_overlap_pairs(fps, max_df=10).count()

    t1 = _timed("winnow fp+pairs 5k docs", lambda: _run(base))
    t2 = _timed("winnow fp+pairs 50k docs (x10)", lambda: _run(big))
    print(f"[winnow] x10 data -> x{t2 / t1:.1f} time", flush=True)

    # the production hash="xx64" fast path (the registered query keeps
    # md5 so the correctness gate stays hash-checked); same plan,
    # cheaper per-gram kernel — the module's own estimate is ~2x on
    # the hash itself, this measures the end-to-end effect
    t3 = _timed("winnow fp+pairs 5k docs [xx64]", lambda: _run(base, "xx64"))
    t4 = _timed("winnow fp+pairs 50k docs (x10) [xx64]",
                lambda: _run(big, "xx64"))
    print(
        f"[winnow] xx64 fast path: x{t3 / t1:.2f} of md5 at 5k, "
        f"x{t4 / t2:.2f} at 50k; xx64 decade x{t4 / t3:.1f}",
        flush=True,
    )

    # the PRODUCTION-SHAPED consumer (r8): prepare_training_corpus's
    # winnow stage — gate + exact dedup + LSH near-dup + fingerprints,
    # the pipeline a real corpus build runs — at 50k docs, md5 arm vs
    # the stage's xx64 default. This is the fast path carrying in situ,
    # not in an isolated operator probe.
    from pyspark_entity_resolution_spark.operators.corpus import (
        prepare_training_corpus,
    )

    def _corpus_fp(df, hash):
        stages = prepare_training_corpus(df, winnow_k=8, winnow_hash=hash)
        return stages["fingerprints"].count()

    t5 = _timed("corpus-prep fp stage 50k docs [md5]",
                lambda: _corpus_fp(big, "md5"))
    t6 = _timed("corpus-prep fp stage 50k docs [xx64 default]",
                lambda: _corpus_fp(big, "xx64"))
    print(
        f"[winnow] corpus-prep winnow stage at 50k docs: xx64 "
        f"x{t6 / t5:.2f} of md5",
        flush=True,
    )


def main() -> None:
    # the x100 legs need a big driver heap (local mode: the executors'
    # heap too) — the 100M-edge CC leg at the session factory's 8g
    # default dies in a GCLocker-starved OOM while materializing the
    # initial edge checkpoint, before any demotion logic can act. The
    # README's probe numbers are all measured at 64g; default to that
    # here (subprocess family runs inherit it) while still honoring an
    # explicit override from the environment.
    if any(a.startswith("century") for a in sys.argv[1:]):
        os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")
    if "century" in sys.argv[1:]:
        # no SparkSession here: each family spawns its own process
        # (fresh JVM) so base legs never measure a predecessor's heap
        probe_century()
        return
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if "trio" in sys.argv[1:]:
        probe_trio(spark)
    elif "ann" in sys.argv[1:]:
        probe_ann(spark)
    elif "winnow" in sys.argv[1:]:
        probe_winnow(spark)
    elif "century-minhash" in sys.argv[1:]:
        probe_century_minhash(spark)
    elif "century-substring" in sys.argv[1:]:
        probe_century_substring(spark)
    elif "century-ngram" in sys.argv[1:]:
        probe_century_ngram(spark)
    elif "century-cc" in sys.argv[1:]:
        probe_century_cc(spark)
    elif "century-er" in sys.argv[1:]:
        probe_century_er(spark)
    elif "century-ingest" in sys.argv[1:]:
        probe_century_ingest(spark)
    elif "century-labelstore" in sys.argv[1:]:
        probe_century_labelstore(spark)
    elif "century-winnow" in sys.argv[1:]:
        probe_century_winnow(spark)
    elif "century-audio" in sys.argv[1:]:
        probe_century_audio(spark)
    elif "century-image" in sys.argv[1:]:
        probe_century_image(spark)
    elif "century-lev" in sys.argv[1:]:
        probe_century_lev(spark)
    else:
        probe_er(spark)
        probe_cc(spark)
    spark.stop()


if __name__ == "__main__":
    main()
