"""Z-order (Morton) clustering for multi-dimensional data skipping.

The Delta/Iceberg ``OPTIMIZE ZORDER BY`` pattern, DataFrame-first: a
range sort on one column gives tight per-file min/max stats on THAT
column only; sorting by the bit-interleaved Morton code of several
columns gives *simultaneously* tight stats on ALL of them, so the
engine's ordinary parquet row-group/file skipping prunes box
predicates on any clustered dimension — no reader changes, the scan
just reads fewer files.

The z-value is a pure codegen'd column expression (a sum of
shift/mask terms — no Python, no UDF), so clustering a 100 TB table
costs exactly one repartitionByRange shuffle, the same as any other
sorted write. At query time nothing new runs at all: the win is
layout, picked up by predicate pushdown.

For key-ordered stores (the shc table layout) the same trick applies
by modeling the ROWKEY as (zvalue, id): region boundaries then cut
z-space and the existing range pruning covers z-ranges. Translating a
per-dimension box predicate into minimal z-ranges (the BIGMIN /
LITMAX refinement) is the further scale path; file-stat skipping
already delivers most of the benefit without it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[str | Column], bits: int = 16, check_bounds: bool = True) -> Column:
    """Morton code: interleave the low ``bits`` bits of each column
    (non-negative integers; values must fit in ``bits`` bits — scale
    or rank-bucket wider domains first). For d columns, bit i of
    column j lands at position i*d + j, so the result fits in
    bits*d <= 64 bits.

    Bits above ``bits`` are NOT silently dropped: with the default
    ``check_bounds=True`` any out-of-range value (negative or
    >= 1<<bits) raises at execution time via ``raise_error`` — a
    too-narrow bit budget would otherwise alias distant values onto
    colliding Morton codes and quietly destroy the clustering (and
    with it the file-skipping win). Pass ``check_bounds=False`` only
    when the domain is already proven (e.g. the output of a
    rank-bucketing step) — the guard is one codegen'd comparison per
    row, but dropping it removes even that.

    Built as a sum of (x >> i & 1) << (i*d + j) terms — whole-stage
    codegen folds this into straight-line JVM bit math."""
    d = len(cols)
    if d < 2:
        raise ValueError("zvalue needs >= 2 columns")
    if bits * d > 63:
        raise ValueError(f"{bits} bits x {d} dims exceeds a signed 64-bit z-value")
    lim = 1 << bits
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        x = F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
        if check_bounds:
            name = c if isinstance(c, str) else f"dim{j}"
            x = F.when(
                (x < 0) | (x >= lim),
                F.raise_error(
                    F.concat(
                        F.lit(f"zvalue: {name} value "),
                        x.cast("string"),
                        F.lit(f" outside [0, {lim}) for bits={bits}"),
                    )
                ).cast("long"),
            ).otherwise(x)
        for i in range(bits):
            z = z + F.shiftleft(F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1)), i * d + j)
    return z


def zorder_by(
    df: DataFrame, cols: list[str], bits: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition + sort by the
    z-value of ``cols``. Write the result with any sink; every output
    file then covers a small hyper-rectangle of the clustered
    dimensions and min/max stats prune on each of them."""
    z = zvalue(cols, bits=bits).alias("__zval")
    out = df.withColumn("__zval", z)
    n = num_partitions or out.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        out.repartitionByRange(int(n), F.col("__zval"))
        .sortWithinPartitions("__zval")
        .drop("__zval")
    )


def zvalue_sql(cols: list[str], bits: int = 16) -> str:
    """The IDENTICAL Morton-code expression as ANSI SQL (for oracles
    and for engines without the DataFrame API)."""
    d = len(cols)
    # each term fully parenthesized: << binds LOOSER than + in SQL,
    # so a bare `a << p + b` would parse as `a << (p + b)`
    terms = [
        f"((({c} >> {i}) & 1) << {i * d + j})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"
