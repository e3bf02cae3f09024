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

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    report: dict[str, dict] = {}
    import time as _time

    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        rec = report[name] = {}
        try:
            t0 = _time.perf_counter()
            sdf = fn(spark, sf_dir).toPandas()
            rec["sec_spark"] = round(_time.perf_counter() - t0, 1)
            rec["rows"] = len(sdf)
            rec["cols"] = len(sdf.columns)
        except Exception as e:
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
