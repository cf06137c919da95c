"""Z-order (Morton) multi-dimensional clustering.

The lakehouse data-skipping pattern (Delta ``OPTIMIZE ZORDER BY``,
Iceberg sort orders): interleave the bits of two scan-predicate columns
into one key, range-partition the table by that key, and every output
file covers a small RECTANGLE of the (x, y) space — so min/max file
statistics prune on BOTH columns, not just the leading sort key.

Everything here is pure JVM bit arithmetic (``&``, ``|``, fixed-amount
shifts) on BIGINTs below the sign bit, so the identical formula runs on
DuckDB — the Morton key itself is oracle-hashable, which is rare for a
physical-layout operator and lets the clustering math carry a full
correctness row (pl_zorder) rather than just a plan test.

Scale posture: key computation is map-only (zero shuffle);
``zorder_layout`` adds the one range-exchange any re-clustering write
needs. ``repartitionByRange`` samples key quantiles, so files stay
balanced even when the key distribution is skewed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_bits16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` to the even bit positions of a
    32-bit value (the classic magic-mask sequence, public domain — see
    e.g. Sean Eron Anderson's Bit Twiddling Hacks)."""
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def morton_key(x: Column, y: Column) -> Column:
    """32-bit Morton interleave of two 16-bit non-negative columns:
    x occupies the even bits, y the odd bits."""
    return spread_bits16(x).bitwiseOR(F.shiftleft(spread_bits16(y), 1))


def zorder_layout(
    df: DataFrame, x: Column, y: Column, n_files: int,
    key_col: str = "zkey",
) -> DataFrame:
    """Range-partition ``df`` by the Morton key of (x, y) — each output
    partition (file, after a write) covers a contiguous Z-curve segment,
    i.e. a bounded rectangle stack in (x, y). Drop-in before
    ``.write.parquet``; parquet min/max stats then prune on both columns.
    """
    return df.withColumn(key_col, morton_key(x, y)).repartitionByRange(
        n_files, F.col(key_col)
    )
