"""pl_heavy_hitters win-condition demonstration (r5 verdict #3).

The MG sketch path's regime argument: exact `GROUP BY token` shuffles one
record per (map partition, distinct token) — when the vocabulary is huge
(URLs, ids, typo-heavy web text), map-side combine stops helping and the
shuffle carries ~|tokens| rows; the MG pass instead ships a bounded
``capacity`` summary per partition (plus one broadcast-join verify scan),
so its shuffle volume is O(capacity * n_partitions) regardless of
vocabulary size.

This script MEASURES that crossover on a synthetic high-cardinality
corpus: each row contributes a zipf head token plus ``uniq_per_row``
NEVER-REPEATED tokens, so vocabulary ~= rows * uniq_per_row while the
heavy hitters stay a handful of head tokens.

Usage: PYTHONPATH=/root/repo python scripts/bench_heavy_hitters.py \
           [n_rows] [uniq_per_row]
Prints one JSON line {rows, vocab, exact_s, sketch_s, speedup}.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from adenhq_hive_spark.operators.sketch import heavy_hitters
from adenhq_hive_spark.session import get_spark


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    uniq = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    spark = get_spark("bench-heavy-hitters")
    # head tokens: 4 genuinely heavy tokens per row (>= 10bp each, by
    # construction); tail: `uniq` tokens that never repeat.
    tail = F.concat_ws(
        " ",
        *[F.concat(F.lit(f"u{j}_"), F.col("id").cast("string"))
          for j in range(uniq)],
    )
    df = (
        spark.range(n_rows)
        .select(
            F.concat_ws(
                " ", F.lit("the"), F.lit("of"),
                F.concat(F.lit("h"), (F.col("id") % 2).cast("string")),
                F.concat(F.lit("m"), (F.col("id") % 64).cast("string")),
                tail,
            ).alias("text")
        )
        .repartition(32)
        .localCheckpoint(eager=True)  # exclude generation from timings
    )
    toks = df.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("token")
    )
    total = n_rows * (4 + uniq)
    min_share_bp = 10

    def run_exact() -> int:
        out = (
            toks.groupBy("token")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") * 10_000 >= min_share_bp * total)
        )
        return out.count()

    def run_sketch() -> int:
        return heavy_hitters(df, "text", min_share_bp=min_share_bp).count()

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    # warm-up then min-of-2, same protocol as bench.py
    run_exact(), run_sketch()
    exact_s = min(timed(run_exact) for _ in range(2))
    sketch_s = min(timed(run_sketch) for _ in range(2))
    n_hh = run_exact()
    assert n_hh == run_sketch(), "sketch path must match exact"
    print(json.dumps({
        "rows": n_rows,
        "token_occurrences": total,
        "vocab_approx": n_rows * uniq + 70,
        "heavy_hitters": n_hh,
        "exact_s": round(exact_s, 3),
        "sketch_s": round(sketch_s, 3),
        "speedup": round(exact_s / sketch_s, 2),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
