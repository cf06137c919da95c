"""Generate an sf1-equivalent bench dataset by 10x replication of sf0.1.

Usage: python scripts/make_sf1.py [src_sf_dir] [out_dir] [factor]
Defaults: /root/testdata/sf0.1 -> /root/repo/.bench_sf1, factor 10.

Replication is key-consistent so every declared query stays meaningful:

- Fact tables (lineitem, orders, customer, events) replicate with key
  offsets applied consistently across referencing columns (orderkey on
  both orders+lineitem, custkey on both customer+orders), mirroring how
  real deployments scale: facts grow, dimensions stay.
- Dimensions (region, nation, part, supplier) are copied as-is;
  l_partkey / l_suppkey keep their values so star joins still hit.
- events: event_id/user_id offsets keep per-user sessions intact inside
  each replica; ts shifts i microseconds so replicas don't collide on
  exact timestamps while window distributions are unchanged.
- documents: every 5th word is replaced with a replica token — every
  5-gram shingle window then contains a replica marker, so cross-replica
  near-dup pairs vanish while within-replica near-dup structure is
  preserved: near-dup workload grows linearly (10x), not quadratically
  (100x identical-copy pairs).
- embeddings: element rotation by (7*i mod dim) — norms unchanged,
  cross-replica cosine decorrelates (iid dims), within-replica neighbor
  structure preserved exactly.

Built with DuckDB so events keeps its TIMESTAMP_NS physical type (the
Spark catalog and the DuckDB oracle both depend on it).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

KEY_OFF = 1_000_000_000  # fallback floor; the real stride is derived

COPY_TABLES = ("region", "nation", "part", "supplier")


def key_stride(con, src: str) -> int:
    """Replica offset stride: the next power of 10 ABOVE every key in
    the source.  A fixed 1e9 stride silently COLLIDES when the source
    is itself a replicated dataset (sf1 keys span 0..9e9+), mapping
    replica pairs (i, j) with equal i+j onto the same key — the r9
    audit found .bench_sf10 built sf1->x10 this way had only 19x15000
    distinct custkeys instead of 100x15000, a ~5x join fanout that
    inflated every multi-hop join (q25 measured 50 s instead of 5).
    Deriving the stride from the data makes replication associative:
    x10 twice == x100 once, key-distinctness preserved by construction.
    """
    mx = 0
    for table, cols in (
        ("orders", ("o_orderkey", "o_custkey")),
        ("lineitem", ("l_orderkey",)),
        ("customer", ("c_custkey",)),
        ("documents", ("doc_id",)),
        ("embeddings", ("vec_id",)),
        ("events", ("event_id", "user_id")),
    ):
        for c in cols:
            v = con.execute(
                f"SELECT MAX({c}) FROM read_parquet('{src}/{table}.parquet')"
            ).fetchone()[0]
            mx = max(mx, int(v or 0))
    stride = KEY_OFF
    while stride <= mx:
        stride *= 10
    return stride


def replica_sql(table: str, src: str, i: int, stride: int = KEY_OFF) -> str:
    off = i * stride
    p = f"read_parquet('{src}/{table}.parquet')"
    if table == "orders":
        return (f"SELECT o_orderkey + {off} AS o_orderkey, "
                f"o_custkey + {off} AS o_custkey, o_orderstatus, "
                f"o_totalprice, o_orderdate, o_orderpriority FROM {p}")
    if table == "lineitem":
        return (f"SELECT l_orderkey + {off} AS l_orderkey, l_partkey, "
                f"l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
                f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
                f"FROM {p}")
    if table == "customer":
        return (f"SELECT c_custkey + {off} AS c_custkey, c_name, "
                f"c_nationkey, c_acctbal, c_mktsegment FROM {p}")
    if table == "documents":
        if i == 0:
            return f"SELECT * FROM {p}"
        return (
            f"SELECT doc_id + {off} AS doc_id, "
            f"array_to_string(list_transform(string_split(text, ' '), "
            f"(w, j) -> CASE WHEN j % 5 = 0 THEN 'r{i}tok' ELSE w END), ' ') "
            f"AS text, lang, source, n_chars FROM {p}"
        )
    if table == "embeddings":
        if i == 0:
            return f"SELECT * FROM {p}"
        return (
            f"SELECT vec_id + {off} AS vec_id, "
            f"list_concat(list_slice(embedding, (7*{i} % len(embedding)) + 1, "
            f"len(embedding)), list_slice(embedding, 1, 7*{i} % "
            f"len(embedding)))::FLOAT[] AS embedding, label FROM {p}"
        )
    raise ValueError(table)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    stride = key_stride(con, src)
    print(f"replica key stride: {stride}", flush=True)
    for table in COPY_TABLES:
        t0 = time.time()
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied in {time.time() - t0:.1f}s", flush=True)
    for table in ("orders", "lineitem", "customer",
                  "documents", "embeddings"):
        t0 = time.time()
        union = " UNION ALL ".join(
            f"({replica_sql(table, src, i, stride)})" for i in range(factor)
        )
        con.execute(
            f"COPY ({union}) TO '{out}/{table}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 200000)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows in {time.time() - t0:.1f}s", flush=True)
    _replicate_events(src, out, factor, stride)


def _replicate_events(src: str, out: str, factor: int,
                      stride: int = KEY_OFF) -> None:
    """events via pyarrow: DuckDB's parquet writer emits TIMESTAMP(us),
    but the Spark catalog and DuckDB oracle both depend on the table's
    INT64 TIMESTAMP(NANOS) physical type — pyarrow preserves it."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t0 = time.time()
    base = pq.read_table(os.path.join(src, "events.parquet"))
    replicas = []
    for i in range(factor):
        off = i * stride
        replicas.append(
            pa.table(
                {
                    "event_id": pc.add(base["event_id"], off),
                    # +i µs = +i*1000 ns: replicas don't collide on
                    # identical timestamps, window distribution unchanged
                    "ts": pc.add(
                        base["ts"].cast(pa.int64()), i * 1000
                    ).cast(pa.timestamp("ns")),
                    "user_id": pc.add(base["user_id"], off),
                    "event_type": base["event_type"],
                    "value": base["value"],
                    "props": base["props"],
                }
            )
        )
    pq.write_table(
        pa.concat_tables(replicas),
        os.path.join(out, "events.parquet"),
        row_group_size=200_000,
    )
    print(f"events: {len(base) * factor} rows in {time.time() - t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
