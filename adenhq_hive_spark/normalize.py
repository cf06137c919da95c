"""Result normalization + oracle comparison (SURVEY §5.4, normative).

Normalizes a result set (list of row tuples + column names) from either
Spark or DuckDB to a canonical text form, then hashes it.  Used by the
test suite to enforce the cross-engine contract locally; the driver runs
its own equivalent at sf0.01.

Rules (SURVEY §5.4): DOUBLE → round(x, 4) with -0.0 → 0.0; DECIMAL →
plain string (no exponent); timestamps → ``YYYY-MM-DD HH:MM:SS.ffffff``
(µs kept — both engines read the testdata identically at µs); date →
ISO; NULL → ``\\N``; cells joined with TAB, rows with NL; sha256.
Columns are sorted by name and rows sorted lexicographically, making the
hash order-insensitive (mirrors the driver's compare).

``strict=True`` keeps ``-0.0`` distinct from ``+0.0`` (the driver's
hash does — CORRECTNESS_r07 failed pl_jl_project on exactly one signed
zero the lenient mode here collapsed).  The declared queries must not
DEPEND on the lenient collapse: check_oracle runs strict, so any oracle
whose engine/oracle pair can disagree on a zero's sign fails locally
before the driver sees it (SURVEY §5.4: the harness may normalize, the
queries must not rely on it).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
from decimal import Decimal
from typing import Any, Sequence


def norm_cell(v: Any, strict: bool = False) -> str:
    if v is None:
        return r"\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 4)
        if not strict and r == 0.0:
            r = 0.0  # collapse -0.0 (lenient mode only)
        return repr(r)
    if isinstance(v, Decimal):
        return str(v.normalize()) if v == v.to_integral_value() else str(v)
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x, strict) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalize(
    columns: Sequence[str],
    rows: Sequence[Sequence[Any]],
    strict: bool = False,
) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out_rows = sorted(
        "\t".join(norm_cell(row[i], strict) for i in order) for row in rows
    )
    header = "\t".join(columns[i] for i in order)
    return header + "\n" + "\n".join(out_rows)


def result_hash(
    columns: Sequence[str],
    rows: Sequence[Sequence[Any]],
    strict: bool = False,
) -> str:
    return hashlib.sha256(
        normalize(columns, rows, strict).encode("utf-8")
    ).hexdigest()
