"""Pandas-path oracle compare — a closer stand-in for the DRIVER's
correctness gate than scripts/check_oracle.py.

check_oracle.py compares ``collect()`` vs ``fetchall()`` rows, where both
engines surface DECIMAL as ``decimal.Decimal`` and integer sums as ``int``.
The driver's artifact shows failures that path cannot reproduce (r3:
a47_pl_repetition hash-red on the driver, green locally) — consistent with
a compare that goes through pandas, where the engines diverge in DTYPE:

- DuckDB ``SUM(int)`` is HUGEINT/DECIMAL(38,0) -> pandas float64
  (``500.0``), Spark's is bigint -> int64 (``500``);
- DECIMAL columns: Spark -> object(decimal.Decimal), DuckDB -> float64.

This script runs every registered query on Spark (``toPandas()``) and its
oracle on DuckDB (``.df()``), normalizes cells the same way regardless of
dtype *formatting* choices (floats rounded to 4, ints as ints), and ALSO
flags any dtype-class mismatch (int vs float vs object) — the condition
under which a string-formatting driver would hash-diverge even when the
values are numerically identical.

Usage: python scripts/driver_sim.py [sf_dir] [--only q01,...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import numpy as np
import pandas as pd

from adenhq_hive_spark.catalog import TABLES
from adenhq_hive_spark.queries import all_queries
from adenhq_hive_spark.session import get_spark


def _kind(dtype) -> str:
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "ts"
    return "obj"


def _cell(v) -> str:
    if v is None or v is pd.NaT or (isinstance(v, float) and np.isnan(v)):
        return r"\N"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        r = round(f, 4)
        if r == 0.0:
            r = 0.0
        return repr(r)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        "\t".join(_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def main() -> int:
    argv = list(sys.argv[1:])
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    spark = get_spark("driver-sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    for name, spec in sorted(all_queries().items()):
        if only is not None and name not in only:
            continue
        if spec.oracle is None:
            continue
        t0 = time.time()
        try:
            sdf = spec.run(spark, sf_dir).toPandas()
            ddf = con.execute(spec.oracle).df()
            from adenhq_hive_spark.operators.dedup import (
                release_persisted,
            )

            release_persisted()
        except Exception as exc:
            bad.append(name)
            print(f"{name}: ERROR {str(exc)[:200]}")
            continue
        problems = []
        s_kinds = {c: _kind(sdf[c].dtype) for c in sdf.columns}
        d_kinds = {c: _kind(ddf[c].dtype) for c in ddf.columns}
        for c in sorted(set(s_kinds) | set(d_kinds)):
            sk, dk = s_kinds.get(c), d_kinds.get(c)
            if sk != dk:
                # int-vs-float on a WHOLE column is the driver killer;
                # obj-vs-float (decimal) likewise
                problems.append(f"dtype[{c}]: spark={sk} duck={dk}")
        if norm_hash(sdf) != norm_hash(ddf):
            problems.append("hash")
        if problems:
            bad.append(name)
            print(f"{name}: {'; '.join(problems)}")
        else:
            print(f"{name}: OK {len(sdf)} rows, {time.time() - t0:.2f}s")
    print(f"\n{len(bad)} problems: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
