"""Z-order (Morton) multi-column clustering — the lakehouse
data-layout operator behind Delta's ``OPTIMIZE ZORDER BY`` and
Iceberg's sort-order rewrites.

Why it exists at 100 TB: file-level min/max stats (parquet footers,
or a manifest like ``TableIO.file_stats``) can only skip a file when
the filtered column's values are CLUSTERED across files. A linear
sort clusters exactly one column — a range predicate on any other
column intersects every file. Interleaving the bits of k columns
gives every column ~1/k of the key's high bits, so files cover small
HYPER-RECTANGLES of the value space and range predicates on ANY of
the z-columns prune most files (tests/test_zorder.py measures
exactly this: a y-slice prunes nothing under x-sort and most files
under z-order).

Everything is JVM bit arithmetic (shiftleft / shiftright / bitwise
or) inside whole-stage codegen — no UDFs, no driver loops. The only
driver-side work is one min/max agg row (to scale columns into the
bit domain), the same bounded contract as any write-path statistics
collection.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC_KINDS = ("int", "bigint", "smallint", "tinyint", "float", "double", "decimal")


def _as_double(df: DataFrame, col: str) -> Column:
    """Numeric / date / timestamp → orderable double."""
    kind = dict(df.dtypes)[col]
    c = F.col(col)
    if kind.startswith("date"):
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    if kind.startswith("timestamp"):
        return c.cast("double")
    if any(kind.startswith(k) for k in _NUMERIC_KINDS):
        return c.cast("double")
    raise ValueError(f"zorder column {col!r} has unsupported type {kind}")


def zorder_key(df: DataFrame, cols: list[str], bits_per_col: int = 16) -> Column:
    """Morton key over ``cols`` as one LONG column expression.

    Each column is scaled into [0, 2^bits−1] by global min/max
    (equi-width — one tiny agg; rank-based scaling would resist
    skew better but needs a global sort, and layout quality, not
    correctness, is all that's at stake). Bit i of column j lands at
    interleaved position ``i·k + (k−1−j)`` so all columns share the
    high bits equally. NULLs scale to 0 (cluster together at the
    low corner). Total bits ≤ 62 to stay in a signed long.
    """
    k = len(cols)
    if k * bits_per_col > 62:
        raise ValueError("bits_per_col * len(cols) must be <= 62")
    # one bounded driver row: global [min,max] per z-column
    bounds = df.agg(
        *[f for c in cols for f in (F.min(_as_double(df, c)).alias(f"lo_{c}"),
                                    F.max(_as_double(df, c)).alias(f"hi_{c}"))]
    ).collect()[0]
    top = (1 << bits_per_col) - 1
    scaled: list[Column] = []
    for c in cols:
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        x = _as_double(df, c)
        if lo is None or hi is None or hi == lo:
            scaled.append(F.lit(0).cast("long"))
        else:
            frac = (x - F.lit(float(lo))) / F.lit(float(hi) - float(lo))
            q = F.floor(frac * top).cast("long")
            scaled.append(F.coalesce(F.least(F.greatest(q, F.lit(0)), F.lit(top)), F.lit(0)))
    terms = [
        (F.shiftright(scaled[j], i).bitwiseAND(F.lit(1))).cast("long") * F.lit(
            1 << (i * k + (k - 1 - j))
        )
        for i in range(bits_per_col)
        for j in range(k)
    ]
    # disjoint bit positions: plain + is exactly bitwise OR here (and
    # Column.__or__ is BOOLEAN or in Spark, not bitwise)
    return reduce(add, [t.cast("long") for t in terms]).alias("__zkey")


def zorder_layout(df: DataFrame, cols: list[str], n_files: int, bits_per_col: int = 16) -> DataFrame:
    """Rows range-partitioned and sorted by their Morton key —
    ready to write so every output file covers a compact
    hyper-rectangle of the z-column space. The key column is
    dropped before write (derivable, and layout metadata doesn't
    belong in the data)."""
    keyed = df.withColumn("__zkey", zorder_key(df, cols, bits_per_col))
    return (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
