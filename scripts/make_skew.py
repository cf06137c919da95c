"""Generate the SKEWED bench dataset the uniform testdata cannot
exhibit: one key carrying ~50% of the fact table, a zipf-ish tail over
the rest — the regime the hot-key operators (operators/skew.py
salted_topk / salted_join, AQE skew handling) exist for.  The uniform
events.event_type (5 types at 20% each) never serializes a window or a
join on one task, so every r9 scale claim for that tier rested on
reasoning; this dataset lets scripts/bench_skew.py measure it.

Usage: python scripts/make_skew.py [out_dir] [n_rows]
Defaults: /root/repo/.bench_skew, 10_000_000 rows.

Layout (DuckDB-written parquet, same convention as make_sf1.py):

- events_skew.parquet — (event_id BIGINT unique, ts TIMESTAMP,
  user_id BIGINT, event_type VARCHAR, value DOUBLE):
  event_type = 'hot' for 50% of rows (hash-chosen, not positional, so
  the hot rows are interleaved through every parquet row group exactly
  like a production log), else 'type_NNNN' zipf-weighted over 999 tail
  types (weight 1/rank — a realistic long tail, and the tail's own head
  is ~5% so AQE sees ONE dominant partition plus a second tier).
- type_dim.parquet — one row per event_type (1000 rows) with a 2 KB
  pad column: the stand-in for a dimension too wide to broadcast at
  scale (the salted_join target); measurements disable auto-broadcast
  to model that.

Everything derives from hash(event_id) — rebuilding yields identical
bytes, so dual-time rows are reproducible across sessions.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

N_TAIL = 999  # tail types type_0001..type_0999, zipf weight 1/rank


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_skew"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    t0 = time.time()

    # zipf CDF over the tail, expanded into a 1e6-slot lookup table so
    # per-row tail assignment is ONE hash join (a correlated range probe
    # per row would make generation quadratic-ish)
    con.execute(f"""
        CREATE TEMP TABLE slots AS
        WITH w AS (
          SELECT r, 1.0 / r AS wt FROM range(1, {N_TAIL + 1}) t(r)
        ),
        c AS (
          SELECT r,
                 SUM(wt) OVER (ORDER BY r) / SUM(wt) OVER () AS cdf,
                 (SUM(wt) OVER (ORDER BY r) - wt) / SUM(wt) OVER () AS lo
          FROM w
        )
        , e AS (
          SELECT r, unnest(generate_series(
                   CAST(floor(lo * 1000000) AS BIGINT),
                   CAST(ceil(cdf * 1000000) AS BIGINT) - 1)) AS slot
          FROM c
        )
        SELECT slot, MIN(r) AS r FROM e
        WHERE slot BETWEEN 0 AND 999999
        GROUP BY 1
    """)

    con.execute(f"""
        COPY (
          WITH base AS (
            SELECT i AS event_id,
                   CAST(hash(i * 2654435761) % 9223372036854775807
                        AS BIGINT) AS h1,
                   CAST(hash(i * 40503 + 7) % 9223372036854775807
                        AS BIGINT)  AS h2,
                   CAST(hash(i * 69069 + 13) % 9223372036854775807
                        AS BIGINT) AS h3
            FROM range(1, {n + 1}) t(i)
          ),
          typed AS (
            SELECT b.event_id, b.h2, b.h3,
                   CASE WHEN b.h1 % 2 = 0 THEN 'hot'
                        ELSE 'type_' || lpad(CAST(s.r AS VARCHAR), 4, '0')
                   END AS event_type
            FROM base b
            LEFT JOIN slots s ON s.slot = (b.h1 // 2) % 1000000
          )
          SELECT event_id,
                 TIMESTAMP '2025-01-01 00:00:00'
                   + to_seconds(h3 % 2592000) AS ts,
                 CAST(h2 % {max(n // 100, 1)} AS BIGINT) AS user_id,
                 COALESCE(event_type, 'type_0999') AS event_type,
                 CAST(h2 % 1000000 AS DOUBLE) / 1000 AS value
          FROM typed
        ) TO '{out}/events_skew.parquet' (FORMAT PARQUET)
    """)

    con.execute(f"""
        COPY (
          SELECT 'hot' AS event_type, 0 AS type_rank,
                 'category_0' AS category,
                 repeat('x', 2048) AS pad
          UNION ALL
          SELECT 'type_' || lpad(CAST(r AS VARCHAR), 4, '0'),
                 CAST(r AS INTEGER),
                 'category_' || CAST(r % 17 AS VARCHAR),
                 repeat('x', 2048)
          FROM range(1, {N_TAIL + 1}) t(r)
          ORDER BY 1
        ) TO '{out}/type_dim.parquet' (FORMAT PARQUET)
    """)

    shape = con.execute(f"""
        SELECT event_type, COUNT(*) AS n
        FROM read_parquet('{out}/events_skew.parquet')
        GROUP BY 1 ORDER BY 2 DESC LIMIT 5
    """).fetchall()
    total = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT event_id) FROM "
        f"read_parquet('{out}/events_skew.parquet')"
    ).fetchone()
    print(f"built {out} in {time.time() - t0:.1f}s: rows={total[0]} "
          f"distinct_ids={total[1]} top_types={shape}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
