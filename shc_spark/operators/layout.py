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
z-space and the existing range pruning covers z-ranges. A
per-dimension box predicate translates into a small set of contiguous
z-ranges via the quadtree-trie descent in ``zbox_ranges`` below (the
BIGMIN/LITMAX refinement, done all at once instead of jump-by-jump);
feed them to ``read_table(key_ranges=...)`` and the scan opens only
the regions a range touches (HBaseTableScan.scala:63-89 analog) —
Spark's Python DataSource filter API has no Or class, so the
disjunction cannot arrive via pushFilters (r11).
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
    xs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    z = F.lit(0).cast("long")
    for j, x in enumerate(xs):
        for i in range(bits):
            z = z + F.shiftleft(F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1)), i * d + j)
    if check_bounds:
        # ONE guard wrapping the whole code — never per bit term: a
        # per-use guard multiplies the expression tree ~2x per bit and
        # blew generated filter code past JIT limits (measured 6.5s vs
        # 0.4s on a sf0.1 box query)
        ok = None
        vals = [F.lit(" [")]
        for j, x in enumerate(xs):
            # NULL dims stay ok=true: the arithmetic already yields a
            # NULL z for them (pre-guard behavior), which is the right
            # outcome — raising on missing data would fail whole writes
            c = F.coalesce((x >= 0) & (x < lim), F.lit(True))
            ok = c if ok is None else ok & c
            vals += ([F.lit(",")] if j else []) + [F.coalesce(x.cast("string"), F.lit("null"))]
        vals.append(F.lit("]"))
        z = F.when(ok, z).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"zvalue: input outside [0, {lim}) for bits={bits}"),
                    *vals,
                )
            ).cast("long")
        )
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


# ---------------------------------------------------------------------------
# box-predicate -> z-range translation (the BIGMIN/LITMAX refinement
# promised in the module docstring): turn a per-dimension box query
# into a small set of contiguous z-value ranges, so a z-KEYED store
# (rowkey = (zval, id)) prunes regions on every clustered dimension —
# the single coarse range [zmin(box), zmax(box)] can cover nearly the
# whole key space for boxes that straddle a high-order bit split.


def zbox_ranges(
    lows: list[int],
    highs: list[int],
    bits: int = 16,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """Sorted, disjoint, inclusive z-value ranges covering the box
    ``lows[j] <= x_j <= highs[j]`` under the ``zvalue`` bit layout
    (bit i of dim j at z-position i*d + j).

    Quadtree-trie descent in z-order: a node is a z-prefix, i.e. both
    one contiguous z-interval AND one axis-aligned cell. Cells fully
    inside the box emit their whole interval; disjoint cells are
    skipped; straddling cells split — until ``max_ranges`` would be
    exceeded, at which point remaining straddling cells emit their
    whole interval unsplit. The result is therefore always a COVERING
    superset of the exact box z-set (exact when the budget never
    binds); conjoin the per-dimension predicates on top (zbox_filter
    does) so query semantics never depend on the budget.

    Driver-side pure Python: the box is a query-plan constant; cost is
    O(max_ranges * bits * d) — microseconds, never touches data."""
    d = len(lows)
    if d != len(highs):
        raise ValueError("lows/highs length mismatch")
    if d < 2:
        raise ValueError("zbox_ranges needs >= 2 dimensions")
    if bits * d > 63:
        raise ValueError(f"{bits} bits x {d} dims exceeds a signed 64-bit z-value")
    lim = 1 << bits
    for j, (lo, hi) in enumerate(zip(lows, highs)):
        if not (0 <= lo <= hi < lim):
            raise ValueError(
                f"dim {j}: box [{lo}, {hi}] outside [0, {lim}) for bits={bits}"
            )
    L = bits * d  # total z bits; descend from z-position L-1 down
    out: list[tuple[int, int]] = []
    # stack entries: (zpos, zlo, per-dim cell bounds); zlo = node's
    # first z-value, node interval = [zlo, zlo + 2^zpos - 1]
    stack = [(L, 0, [(0, lim - 1) for _ in range(d)])]
    while stack:
        zpos, zlo, cell = stack.pop()
        if any(c_hi < lo or c_lo > hi for (c_lo, c_hi), lo, hi in zip(cell, lows, highs)):
            continue
        whole = zpos == 0 or all(
            lo <= c_lo and c_hi <= hi
            for (c_lo, c_hi), lo, hi in zip(cell, lows, highs)
        )
        if whole or len(out) + len(stack) + 2 > max_ranges:
            # budget: count the as-yet-unsplit stack nodes too — each
            # will emit at most one range, so the total stays bounded
            out.append((zlo, zlo + (1 << zpos) - 1))
            continue
        p = zpos - 1  # next z bit to fix
        j = p % d  # dim owning this bit (zvalue layout: i*d + j)
        c_lo, c_hi = cell[j]
        mid = (c_lo + c_hi) // 2  # halves dim j's cell
        hi_cell = list(cell)
        hi_cell[j] = (mid + 1, c_hi)
        lo_cell = list(cell)
        lo_cell[j] = (c_lo, mid)
        # push upper half first so the lower half pops first -> out
        # stays sorted in z order
        stack.append((p, zlo + (1 << p), hi_cell))
        stack.append((p, zlo, lo_cell))
    # merge touching ranges (trie siblings that both emitted whole)
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def zbox_filter(
    cols: list[str],
    lows: list[int],
    highs: list[int],
    bits: int = 16,
    zval_col: str = "zval",
    max_ranges: int = 64,
) -> Column:
    """Box predicate as (z-range disjunction) AND (exact per-dimension
    bounds). On a z-keyed shc table the range disjunction translates
    to rowkey ScanRanges (region + row-group pruning); on a z-sorted
    parquet layout it prunes via the stored column's footer stats. The
    exact bounds keep semantics independent of the range budget."""
    ranges = zbox_ranges(lows, highs, bits=bits, max_ranges=max_ranges)
    # exact bounds FIRST: plain base-column conjuncts push to the scan
    # and short-circuit before any z arithmetic runs
    cond = None
    for c, lo, hi in zip(cols, lows, highs):
        b = (F.col(c) >= lo) & (F.col(c) <= hi)
        cond = b if cond is None else cond & b
    # range membership via exists() over a LITERAL struct array: the
    # z expression is referenced exactly ONCE, so when zval_col is an
    # on-the-fly withColumn (not a stored key) Catalyst's filter
    # inlining cannot duplicate the 2*bits-term arithmetic per range —
    # an OR-chain did, and the blown-up generated code measured 3.5x
    # slower (1.34s vs 0.38s, sf0.1 lineitem, 34 ranges)
    z = F.col(zval_col)
    lit_ranges = F.array(
        *[
            F.struct(F.lit(lo).alias("lo"), F.lit(hi).alias("hi"))
            for lo, hi in ranges
        ]
    )
    rc = F.exists(lit_ranges, lambda r: (z >= r["lo"]) & (z <= r["hi"]))
    return cond & rc
