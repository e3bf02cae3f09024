"""Local replica of the driver's correctness gate.

Runs every __spark_entry__ query on Spark AND its oracle SQL on DuckDB at
the given scale factor, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted, cell-exact
with a tiny float tolerance report). Use while iterating so the real
CORRECTNESS_r{N}.json holds no surprises.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
           [--json OUT.json]

``--json`` additionally writes a machine-readable per-query artifact
(status, row/col counts, spark+duckdb wall seconds) — used for the
committed ``CORRECTNESS_SF1_r{N}.json`` spot-checks, where the gate
runs above its usual scale and the skips/timings need recording.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    """pandas frame -> (columns, sorted row tuples as canonical strings)."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(f"{v:.9g}")
            elif isinstance(v, bool):
                row.append(str(bool(v)).lower())
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return cols, sorted(rows)


def main():
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod
    from pyspark_entity_resolution_spark.session import get_spark

    spark = get_spark(
        app_name="oracle-check", master="local[8]", shuffle_partitions=8,
        # above-scale spot-checks (sf1) can legitimately return >1 GiB
        # result sets to value-compare; the 1g default killed
        # dedup_minhash_lsh's toPandas at sf1
        extra_conf={"spark.driver.maxResultSize": "8g"},
    )
    con = duckdb.connect()
    import os as _os

    for t in TABLES:
        # driver testdata is one file per table; Spark-written datasets
        # (tools/gen_scale_data.py sf1) are DIRECTORIES of part files —
        # DuckDB needs the explicit glob for those
        path = f"{sf_dir}/{t}.parquet"
        if _os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    from pyspark_entity_resolution_spark.plans.registry import all_queries

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    specs = all_queries()
    failures = []
    report: dict[str, dict] = {}
    import time as _time

    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        # scale-aware oracles (QuerySpec.adaptive_sql): regenerate the
        # SQL for THIS sf_dir so above-gate spot-checks value-compare
        # (the driver contract itself only sees the static sql)
        adaptive = False
        spec = specs.get(name)
        rec = report[name] = {}
        if spec is not None and getattr(spec, "adaptive_sql", None):
            t0 = _time.perf_counter()
            sql = spec.adaptive_sql(sf_dir)
            adaptive = True
            # generators may do real work (e.g. the CC oracle's DuckDB
            # edge join + union-find) — record it so sec_duckdb alone
            # never understates the oracle's true cost
            rec["sec_oracle_gen"] = round(_time.perf_counter() - t0, 1)
            rec["oracle"] = "adaptive_sql (regenerated for this sf_dir)"
        try:
            t0 = _time.perf_counter()
            # scale-adaptive queries declare their STATIC oracle invalid
            # at build time on stderr (e.g. embedding_near_dup_lsh's
            # plane count beyond the 4-plane band) — honor the
            # declaration when running the static oracle; with an
            # adaptive oracle in hand, the declaration is moot
            import contextlib as _ctx
            import io as _io

            _err = _io.StringIO()
            with _ctx.redirect_stderr(_err):
                df = fn(spark, sf_dir)
            if "oracle is NOT valid" in _err.getvalue() and not adaptive:
                rec["rows"] = df.count()
                rec["cols"] = len(df.columns)
                rec["sec_spark"] = round(_time.perf_counter() - t0, 1)
                rec["status"] = ("oracle-declared-invalid-at-this-scale "
                                 "(rows-only; see the query's in-code note)")
                print(f"[rows-only] {name}: {rec['rows']} rows — the query "
                      "declared its pinned oracle invalid at this scale")
                continue
            sdf = df.toPandas()
            rec["sec_spark"] = round(_time.perf_counter() - t0, 1)
            rec["rows"] = len(sdf)
            rec["cols"] = len(sdf.columns)
        except Exception as e:
            if "maxResultSize" in str(e) and sql is not None:
                # the RESULT is too big to value-compare on this driver
                # even at the raised limit — degrade to a count+schema
                # comparison instead of failing (recorded as such, so a
                # weaker check never silently reads as a hash match)
                df = fn(spark, sf_dir)
                n_spark = df.count()
                s_cols = sorted(df.columns)
                d_head = con.execute(
                    f"SELECT * FROM ({sql}) LIMIT 0"
                ).fetchdf()
                n_duck = con.execute(
                    f"SELECT count(*) FROM ({sql})"
                ).fetchone()[0]
                rec["rows"] = n_spark
                rec["cols"] = len(s_cols)
                if s_cols != sorted(d_head.columns) or n_spark != n_duck:
                    failures.append(name)
                    rec["status"] = "rows/schema differ (too large to value-compare)"
                    print(f"[FAIL] {name}: rows/schema differ "
                          f"spark={n_spark}/{s_cols} duckdb={n_duck}")
                else:
                    rec["status"] = "rows+schema-match (too large to value-compare)"
                    print(f"[rows+schema] {name}: {n_spark} rows, "
                          f"{len(s_cols)} cols (value compare skipped: "
                          "result exceeds driver maxResultSize)")
                continue
            failures.append(name)
            rec["status"] = f"spark error {type(e).__name__}"
            print(f"[FAIL] {name}: spark error {type(e).__name__}: {e}")
            continue
        if sql is None:
            rec["status"] = "rows-only (no oracle SQL)"
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            t0 = _time.perf_counter()
            ddf = con.execute(sql).fetchdf()
            rec["sec_duckdb"] = round(_time.perf_counter() - t0, 1)
        except Exception as e:
            failures.append(name)
            rec["status"] = f"duckdb error {type(e).__name__}"
            print(f"[FAIL] {name}: duckdb error {type(e).__name__}: {e}")
            continue
        s_cols, s_rows = canon(sdf)
        d_cols, d_rows = canon(ddf)
        if s_cols != d_cols:
            failures.append(name)
            rec["status"] = "columns differ"
            print(f"[FAIL] {name}: columns differ spark={s_cols} duckdb={d_cols}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append(name)
            rec["status"] = "rowcount differs"
            print(f"[FAIL] {name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
            continue
        bad = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ]
        if bad:
            failures.append(name)
            rec["status"] = f"{len(bad)} rows differ"
            print(f"[FAIL] {name}: {len(bad)}/{len(s_rows)} rows differ; first: ")
            print(f"    spark : {bad[0][0]}")
            print(f"    duckdb: {bad[0][1]}")
        else:
            rec["status"] = "values-match"
            print(f"[OK] {name}: {len(s_rows)} rows, {len(s_cols)} cols")

    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(
                {"sf_dir": sf_dir,
                 "checked": sorted(report),
                 "skipped": sorted(set(queries) - set(report)),
                 "queries": report},
                f, indent=1, sort_keys=True,
            )
        print(f"\nwrote {json_out}")

    print()
    if failures:
        print(f"FAILURES ({len(failures)}): {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
