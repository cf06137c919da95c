"""Time one registered query: fresh-JVM run 0 (cold) + N-1 warm runs,
per-run /proc/stat hypervisor-steal recorded (r11 verdict #3: the sf10
heavy rows were single-cold-run points; this gives n>=2 with cold/warm
separated instead of conflated).

Usage: PYTHONPATH=/root/repo python scripts/time_query.py <sf_dir> <name> \
           [runs] [--cache-decompose] [--conf k=v ...]
Prints one JSON line {"name", "sf_dir", "cold_s", "warm_min_s",
"runs": [...], "steal_pct": [...], "load_1m"}.

--cache-decompose adds a final run after dropping the OS page cache
(echo 3 > /proc/sys/vm/drop_caches): run 0 is cold-JVM+cold-cache, the
middle runs are warm+warm, the last is warm-JVM+cold-cache — so
  I/O share       ~= warm_cold_s - warm_min_s
  JIT/plan share  ~= cold_s - warm_cold_s
(the r11 winnow 2.1x cold/warm gap attribution, verdict #3/#5).
"""

from __future__ import annotations

import json
import os
import sys
import time


def steal_ticks():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v[7], sum(v)


def main() -> None:
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 \
        and not sys.argv[3].startswith("--") else 2
    decompose = "--cache-decompose" in sys.argv
    overrides = {}
    for i, a in enumerate(sys.argv):
        if a == "--conf":
            k, v = sys.argv[i + 1].split("=", 1)
            overrides[k] = v

    sys.path.insert(0, "/root/repo")
    from adenhq_hive_spark.queries import all_queries
    from adenhq_hive_spark.session import get_spark

    spark = get_spark(f"time-{name}", **overrides)
    spark.sparkContext.setJobDescription(f"time_query:{name}")
    spec = all_queries()[name]

    def one(i, label=""):
        s0, t0 = steal_ticks()
        w0 = time.perf_counter()
        spec.run(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - w0
        s1, t1 = steal_ticks()
        runs.append(round(dt, 1))
        steals.append(round(100.0 * (s1 - s0) / max(1, t1 - t0), 1))
        print(f"run{i}{label}: {dt:.1f}s steal {steals[-1]}%",
              file=sys.stderr, flush=True)

    runs, steals = [], []
    for i in range(n):
        one(i)
    out = {
        "name": name, "sf_dir": sf_dir,
        "cold_s": runs[0],
        "warm_min_s": min(runs[1:]) if len(runs) > 1 else None,
        "runs": runs, "steal_pct": steals,
        "load_1m": round(os.getloadavg()[0], 2),
    }
    if decompose:
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        one(n, " (warm JVM, dropped page cache)")
        out["warm_cold_s"] = runs[-1]
        out["io_share_s"] = round(runs[-1] - out["warm_min_s"], 1)
        out["jit_share_s"] = round(out["cold_s"] - runs[-1], 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
