"""Z-order (Morton) clustering key — multi-dimensional file clustering.

Single-column sorted compaction (``compact(sort_by=["warc_ts"])``)
makes ONE dimension prunable; a filter on any other column still scans
every file. Interleaving the bits of several columns' normalized ranks
gives a 1-D sort key whose prefix locality is shared by ALL the
interleaved dimensions — files then hold small hyper-rectangles of the
value space and the manifest bounds (lake/stats.py) get tight on every
clustered column at once. This is the public OPTIMIZE-ZORDER idea from
the Delta/Iceberg world, built here from plain Spark expressions.

Everything is JVM-side column arithmetic (shifts/ors folded into one
expression, whole-stage-codegen friendly): no UDF, no shuffle beyond
the range repartition the caller chooses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(df_types: dict[str, str], name: str) -> Column:
    """Project a column onto a totally ordered double axis."""
    t = df_types[name]
    c = F.col(name)
    if t.startswith("timestamp"):
        return F.unix_micros(c.cast("timestamp")).cast("double")
    if t == "date":
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    if t in ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal"):
        return c.cast("double")
    raise ValueError(f"zorder unsupported for column {name!r} of type {t}")


def zorder_key(df: DataFrame, cols: list[str], bounds: dict[str, tuple[float, float]]) -> Column:
    """Morton key over ``cols``: each value is min-max scaled into
    ``bits = 63 // len(cols)`` bits using the caller-supplied global
    ``bounds`` (one tiny agg — see ``zorder_bounds``), then the bit
    planes are interleaved so close keys are close in every dimension.

    NULLs and values outside the bounds clamp to the range edges —
    ordering stays total and the key never overflows a long.
    """
    if not 2 <= len(cols) <= 6:
        raise ValueError("zorder needs 2-6 columns")
    bits = 63 // len(cols)
    max_cell = (1 << bits) - 1
    types = dict(df.dtypes)
    scaled = []
    for name in cols:
        lo, hi = bounds[name]
        axis = _as_double(types, name)
        if hi > lo:
            frac = (axis - F.lit(float(lo))) / F.lit(float(hi - lo))
        else:  # constant column: every value maps to cell 0
            frac = F.lit(0.0)
        cell = F.least(
            F.lit(max_cell),
            F.greatest(F.lit(0), F.floor(frac * F.lit(float(max_cell + 1))).cast("long")),
        )
        scaled.append(F.coalesce(cell, F.lit(0)))
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, cell in enumerate(scaled):
            plane = F.shiftleft(
                F.shiftrightunsigned(cell, bit).bitwiseAND(F.lit(1)),
                bit * len(scaled) + i,
            )
            z = z.bitwiseOR(plane)
    return z


def zorder_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Global [min, max] per column — one aggregate, collected as a
    single driver row (bounded by len(cols), never by data size)."""
    types = dict(df.dtypes)
    aggs = []
    for name in cols:
        axis = _as_double(types, name)
        aggs.append(F.min(axis).alias(f"_lo_{name}"))
        aggs.append(F.max(axis).alias(f"_hi_{name}"))
    row = df.agg(*aggs).first()
    return {
        name: (
            row[f"_lo_{name}"] if row[f"_lo_{name}"] is not None else 0.0,
            row[f"_hi_{name}"] if row[f"_hi_{name}"] is not None else 0.0,
        )
        for name in cols
    }
