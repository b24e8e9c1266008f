"""Data-layout keys — Z-order (Morton) interleaving, pure Catalyst.

At 100 TB the scan you never do is the fastest operator: sorting a
table by a Z-order key before writing clusters rows so that BOTH key
columns' min/max file statistics become selective — parquet/Iceberg
data skipping then prunes on either predicate (the Delta
``OPTIMIZE ZORDER BY`` / Iceberg rewrite strategy).  A plain sort on
(a, b) skips well on ``a`` only; the bit-interleaved key skips on each.

``zorder_key2`` interleaves the low ``bits`` of two non-negative ints:
bit i of x lands at position 2i, bit i of y at 2i+1.  Implemented as a
sum of shift/mask terms — whole-stage-codegen arithmetic, zero Python,
and digit-for-digit expressible in the DuckDB oracle dialect.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key2(x, y, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two longs (caller clamps /
    buckets values into [0, 2^bits) — out-of-range high bits are simply
    ignored by the masks).  Returns a long usable as a sort/cluster key."""
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(
            F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(
            F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out
