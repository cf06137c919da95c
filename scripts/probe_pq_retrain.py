"""PQ re-train policy probe (r10; ROADMAP r11 candidate): quantify how
codebook staleness maps to ANN recall as an appended delta drifts, so
pq_staleness's threshold is a MEASURED trigger, not a guess.

Method: train a PQ index on half the embeddings table; synthesize
deltas at increasing drift — each held-out vector pulled toward one
fixed off-distribution direction g, v' = normalize((1-a)*v + a*g) for
a in {0, .25, .5, .75, 1} (a=0 is the in-distribution control; a=1 is
total collapse onto g) — then for each delta:

- staleness ratio = pq_staleness(delta) (mean quantization error under
  the frozen books / train-time mean), and
- recall@10 of the frozen-book ADC probe: append the delta's codes,
  query with a sample of delta vectors, compare against exact cosine
  top-10 over the full corpus (base + delta).

The pairing (ratio, recall) is the policy curve: the ratio is cheap
(one linear pass, no ground truth needed) and monotone in drift, so a
production pipeline can gate re-trains on it.  Recorded in BASELINE.md.

Usage: PYTHONPATH=/root/repo python scripts/probe_pq_retrain.py \
          [sf_dir] [n_queries]
Defaults: /root/testdata/sf0.1, 50.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

import numpy as np
from pyspark.sql import functions as F

from adenhq_hive_spark.catalog import load_table
from adenhq_hive_spark.operators.similarity import (
    cosine_topk,
    pq_append_index,
    pq_query_index,
    pq_staleness,
    save_pq_index,
)
from adenhq_hive_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = get_spark("probe-pq-retrain")
    # project to the index shape: the synthetic delta lacks the table's
    # label column, and unionByName for the ground truth needs parity
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") % 2 == 0)
    held = emb.filter(F.col("vec_id") % 2 == 1)

    held_rows = held.collect()
    ids = np.array([r["vec_id"] for r in held_rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in held_rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    dim = mat.shape[1]
    g = np.random.default_rng(0).standard_normal(dim)
    g /= np.linalg.norm(g)
    print(f"base={base.count()} held={len(ids)} dim={dim}",
          file=sys.stderr)

    work = tempfile.mkdtemp(prefix="pq_retrain_")
    results = []
    for alpha in (0.0, 0.25, 0.5, 0.75, 1.0):
        drifted = (1 - alpha) * mat + alpha * g[None, :]
        drifted /= np.linalg.norm(drifted, axis=1, keepdims=True)
        delta = spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(ids, drifted)],
            "vec_id long, embedding array<double>",
        )
        path = f"{work}/pq_a{int(alpha * 100)}"
        save_pq_index(base, path, m=16, n_codes=16)
        st = pq_staleness(spark, path, delta).collect()[0]
        pq_append_index(spark, path, delta)

        queries = delta.orderBy("vec_id").limit(n_q)
        got = pq_query_index(spark, path, queries, k=10).collect()
        corpus = base.unionByName(delta)
        want = cosine_topk(corpus, queries, k=10).collect()

        def topset(rows):
            by_q: dict = {}
            for r in rows:
                by_q.setdefault(r.query_id, []).append(r)
            return {
                q: {x.cand_id for x in sorted(
                    v, key=lambda x: (-x.cosine, x.cand_id))[:10]}
                for q, v in by_q.items()
            }

        g_t, w_t = topset(got), topset(want)
        recs = [len(g_t.get(q, set()) & w) / len(w)
                for q, w in w_t.items() if w]
        rec = round(float(np.mean(recs)), 3) if recs else 0.0
        row = {"alpha": alpha, "ratio": float(st.ratio),
               "code_dup_rate": float(st.code_dup_rate),
               "code_top_share": float(st.code_top_share),
               "retrain": bool(st.retrain), "recall_at_10": rec}
        results.append(row)
        print(row, file=sys.stderr)

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
