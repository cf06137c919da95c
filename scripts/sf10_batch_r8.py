"""Round-8 sf10 sweep extension (r7 verdict #6): sf10 points for the
remaining expensive compute tiers with none — engine (min-of-2 warm
where feasible, single run where a run is minutes) vs DuckDB single run
under a hard cap.  Each query runs in its own TIMED try-block so one
DNF doesn't kill the batch; DuckDB runs in a SUBPROCESS so an
out-of-memory oracle cannot take the harness down (the r7 PageRank
oracle died at 77 GB of spill).

Usage: PYTHONPATH=/root/repo python scripts/sf10_batch_r8.py \
    [sf_dir] [q1,q2,...] [duck_cap_s]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

DEFAULT_QUERIES = [
    "pl_ngram_jaccard",
    "pl_minhash_lsh",
    "pl_semdedup",
    "pl_editdist",
    "pl_copurchase_lift",
    "pl_trigram_search",
]

_DUCK_RUNNER = r"""
import json, sys, time
import duckdb
sf_dir, name = sys.argv[1], sys.argv[2]
sys.path.insert(0, "/root/repo")
from adenhq_hive_spark.catalog import TABLES
from adenhq_hive_spark.queries import all_queries
spec = all_queries()[name]
if spec.oracle is None:
    print(json.dumps({"name": name, "duck_s": None, "note": "no_oracle"}))
    raise SystemExit(0)
con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM "
        f"read_parquet('{sf_dir}/{t}.parquet')"
    )
t0 = time.perf_counter()
con.execute(spec.oracle).fetchall()
print(json.dumps({"name": name, "duck_s": round(time.perf_counter() - t0, 1)}))
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_sf10"
    names = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_QUERIES
    )
    duck_cap = int(sys.argv[3]) if len(sys.argv) > 3 else 1200

    from adenhq_hive_spark.queries import all_queries
    from adenhq_hive_spark.session import get_spark

    spark = get_spark("sf10-batch")
    specs = all_queries()
    results: dict[str, dict] = {}

    for name in names:
        spec = specs[name]
        entry: dict = {}
        try:
            t0 = time.perf_counter()
            spec.run(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            first = time.perf_counter() - t0
            entry["engine_s"] = round(first, 1)
            if first < 120:  # min-of-2 only when a rerun is cheap
                t0 = time.perf_counter()
                spec.run(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                entry["engine_s"] = round(
                    min(first, time.perf_counter() - t0), 1
                )
        except Exception as exc:
            entry["engine_err"] = str(exc)[:300]
        results[name] = entry
        print(f"ENGINE {name}: {json.dumps(entry)}", flush=True)
    spark.stop()

    for name in names:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _DUCK_RUNNER, sf_dir, name],
                capture_output=True,
                text=True,
                timeout=duck_cap,
            )
            if proc.returncode == 0 and proc.stdout.strip():
                # the runner's JSON is the LAST stdout line — imports may
                # emit chatter above it
                results[name].update(
                    json.loads(proc.stdout.strip().splitlines()[-1])
                )
            else:
                results[name]["duck_err"] = (
                    f"rc={proc.returncode} {proc.stderr[-200:]}"
                )
        except subprocess.TimeoutExpired:
            results[name]["duck_err"] = f"DNF > {duck_cap}s"
        print(f"DUCK {name}: {json.dumps(results[name])}", flush=True)

    print(json.dumps({"sf_dir": sf_dir, "results": results}))


if __name__ == "__main__":
    main()
