"""Data-contract validation — the dbt-tests/Great-Expectations primitive
a 100 TB ingest runs before anything downstream trusts a table: each
rule compiles to ONE aggregate expression over a single shared scan, so
a whole contract costs one pass regardless of rule count.

Rules (all return a violation COUNT, 0 = pass):

- ``not_null(col)``          — nulls in a required column
- ``unique(col)``            — rows beyond the first per key value
- ``accepted_range(col, lo, hi)`` — values outside [lo, hi] (nulls
  don't violate range; pair with not_null)
- ``accepted_values(col, values)`` — values outside the enum
- ``refers_to(col, other_df, other_col)`` — dangling foreign keys
  (checked via a broadcast-set anti containment on the DISTINCT key
  set of the referenced side)

``validate_contract`` returns one row per rule: (rule, column,
n_violations, ok) — the artifact a pipeline gate asserts on. Every
non-join rule folds into a single agg over one scan; each refers_to
adds one left-anti join (key-distinct both sides).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    kind: str
    column: str
    params: dict[str, Any] = field(default_factory=dict)

    @property
    def name(self) -> str:
        return f"{self.kind}({self.column})"


def not_null(col: str) -> Rule:
    return Rule("not_null", col)


def unique(col: str) -> Rule:
    return Rule("unique", col)


def accepted_range(col: str, lo, hi) -> Rule:
    return Rule("accepted_range", col, {"lo": lo, "hi": hi})


def accepted_values(col: str, values: list) -> Rule:
    return Rule("accepted_values", col, {"values": list(values)})


def refers_to(col: str, other: DataFrame, other_col: str) -> Rule:
    return Rule("refers_to", col, {"other": other, "other_col": other_col})


def validate_contract(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One row per rule: (rule, column, n_violations, ok), rule order
    preserved. All scalar rules share ONE aggregation over one scan;
    unique(col) counts rows minus distinct keys (exact, partial-agg
    friendly); refers_to anti-joins the distinct key sets."""
    spark = df.sparkSession
    aggs = []
    agg_rules = []
    join_rules = []
    for r in rules:
        c = F.col(r.column)
        if r.kind == "not_null":
            aggs.append(F.sum(c.isNull().cast("long")))
        elif r.kind == "unique":
            aggs.append(F.count(r.column) - F.count_distinct(c))
        elif r.kind == "accepted_range":
            lo, hi = r.params["lo"], r.params["hi"]
            aggs.append(
                F.sum(((c < F.lit(lo)) | (c > F.lit(hi))).cast("long"))
            )
        elif r.kind == "accepted_values":
            vals = r.params["values"]
            aggs.append(
                F.sum((~c.isin(vals) & c.isNotNull()).cast("long"))
            )
        elif r.kind == "refers_to":
            join_rules.append(r)
            continue
        else:
            raise ValueError(f"unknown rule kind {r.kind!r}")
        agg_rules.append(r)

    counts: dict[str, int] = {}
    if agg_rules:
        row = df.agg(
            *[a.alias(f"_r{i}") for i, a in enumerate(aggs)]
        ).collect()[0]
        for i, r in enumerate(agg_rules):
            counts[r.name] = int(row[f"_r{i}"] or 0)
    for r in join_rules:
        other = r.params["other"]
        ocol = r.params["other_col"]
        dangling = (
            df.select(F.col(r.column).alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
            .join(
                other.select(F.col(ocol).alias("k")).distinct(),
                "k",
                "left_anti",
            )
            .count()
        )
        counts[r.name] = int(dangling)

    rows = [
        (r.name, r.column, counts[r.name], counts[r.name] == 0)
        for r in rules
    ]
    return spark.createDataFrame(
        rows, "rule string, column string, n_violations long, ok boolean"
    )
