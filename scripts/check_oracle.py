"""Run every declared query on Spark and DuckDB at a given SF; report
mismatches.  Local stand-in for the driver's CORRECTNESS gate.

Compares in STRICT normalization mode (-0.0 kept distinct from +0.0),
which is at least as strict as the driver's hash — the r7 pl_jl_project
red row was a signed zero the lenient local mode collapsed.  Pass
--lenient to reproduce the old behavior.

Usage: python scripts/check_oracle.py [sf_dir] [--only q01,...] [--lenient]
"""

from __future__ import annotations

import sys
import time

import duckdb

from adenhq_hive_spark.catalog import TABLES
from adenhq_hive_spark.normalize import normalize
from adenhq_hive_spark.queries import all_queries
from adenhq_hive_spark.session import get_spark


def main() -> int:
    argv = list(sys.argv[1:])
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    strict = "--lenient" not in argv
    if not strict:
        argv.remove("--lenient")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    for name, spec in sorted(all_queries().items()):
        if only is not None and name not in only:
            continue
        t0 = time.time()
        try:
            df = spec.run(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            # free the _materialize-pinned caches between queries —
            # the 264-query sweep otherwise accumulates corpus-sized
            # MEMORY_AND_DISK relations for the session lifetime
            from adenhq_hive_spark.operators.dedup import (
                release_persisted,
            )

            release_persisted()
        except Exception as exc:
            failures.append(name)
            print(f"{name}: SPARK ERROR {str(exc)[:200]}")
            continue
        if spec.oracle is None:
            print(f"{name}: rows-only, {len(rows)} rows, "
                  f"{time.time() - t0:.2f}s")
            continue
        rel = con.execute(spec.oracle)
        dcols = [d[0] for d in rel.description]
        drows = rel.fetchall()
        s_norm = normalize(cols, rows, strict=strict)
        d_norm = normalize(dcols, drows, strict=strict)
        ok = s_norm == d_norm
        if not ok:
            failures.append(name)
            s_lines, d_lines = s_norm.splitlines(), d_norm.splitlines()
            print(f"{name}: MISMATCH ({len(s_lines)-1} vs {len(d_lines)-1} rows)")
            shown = 0
            for a, b in zip(s_lines, d_lines):
                if a != b and shown < 3:
                    print(f"  spark: {a[:160]}\n  duck : {b[:160]}")
                    shown += 1
        else:
            print(f"{name}: OK {len(rows)} rows, {time.time() - t0:.2f}s")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
