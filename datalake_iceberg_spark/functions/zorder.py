"""Z-order (Morton) curve expression for multi-column clustering.

``zvalue`` maps N numeric/temporal columns to one interleaved-bit sort
key, entirely with JVM bitwise expressions (no UDF): each column is
linearly scaled to a ``bits``-wide integer using provided [min, max]
ranges, then the bits are interleaved with the standard
shift-and-mask spreading so no column dominates the sort.

Sorting a file by z-value bounds EVERY clustered column's extent within
each row group to ~1/2^(k/N) of its range (k = bits consumed at that
granularity) — so range predicates on ANY clustered column prune row
groups, where a lexicographic multi-column sort only prunes on the
leading column. This is the same layout optimization Iceberg/Delta
expose as ``rewrite_data_files(strategy => 'sort', sort_order =>
'zorder(a, b)')`` / ``OPTIMIZE ... ZORDER BY``.

Supported column types: anything castable to double (ints, floats,
dates/timestamps via ``unix_micros``/day cast upstream). Nulls sort
first (scaled slot 0).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: spread masks for interleaving TWO 16-bit values into 32 bits
#: (classic magic-number bit spreading; for N columns the loop below
#: shifts by (N-1) positions per level instead)
_MAX_BITS = 16


def _scale(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear [lo, hi] → [0, 2^bits - 1] as long; clamped, null → 0."""
    span = float(hi) - float(lo)
    top = (1 << bits) - 1
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = ((col.cast("double") - F.lit(float(lo))) / F.lit(span)) * F.lit(float(top))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(top)))
    return F.coalesce(F.floor(clamped).cast("long"), F.lit(0).cast("long"))


def _spread(col: Column, n: int, bits: int) -> Column:
    """Insert ``n - 1`` zero bits between consecutive bits of ``col``
    (bit j moves to position j*n) via explicit per-bit shifts — O(bits)
    JVM expressions, codegen-friendly, works for any column count."""
    parts = []
    for j in range(bits):
        bit = F.shiftright(col, j).bitwiseAND(F.lit(1).cast("long"))
        parts.append(F.shiftleft(bit, j * n))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zvalue(
    cols: list[Column | str],
    ranges: list[tuple[float, float]],
    bits: int = _MAX_BITS,
) -> Column:
    """Morton key for ``cols`` (with matching [min, max] ``ranges``).

    ``bits`` per column; total key width = ``bits * len(cols)`` ≤ 63.
    """
    n = len(cols)
    if n != len(ranges):
        raise ValueError("cols and ranges must align")
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed long")
    out = None
    for i, (c, (lo, hi)) in enumerate(zip(cols, ranges)):
        col = F.col(c) if isinstance(c, str) else c
        lane = F.shiftleft(_spread(_scale(col, lo, hi, bits), n, bits), i)
        out = lane if out is None else out.bitwiseOR(lane)
    return out
