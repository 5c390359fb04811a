"""Range-algebra + filter-translation tests — model:
ScanRangeTestSuite.scala:40-493 (interval AND/OR over ints) and the
§2.2 pushdown semantics, checked against brute-force evaluation."""

from dataclasses import dataclass

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from shc_spark.coders import get_coder
from shc_spark.filters import (
    FULL_SCAN,
    HRF,
    ScanRange,
    _prefix_upper,
    ranges_and,
    ranges_or,
    translate_filters,
)

ordered = get_coder("OrderedType")
INT = T.IntegerType()


def enc(v) -> bytes:
    return ordered.to_bytes(v, INT)


def contains(ranges, v: int) -> bool:
    b = enc(v)
    for r in ranges:
        lo_ok = (
            r.start is None
            or b > r.start
            or (b == r.start and r.start_inclusive)
        )
        hi_ok = r.end is None or b < r.end or (b == r.end and r.end_inclusive)
        if lo_ok and hi_ok:
            return True
    return False


def rng(lo, lo_inc, hi, hi_inc) -> ScanRange:
    return ScanRange(
        None if lo is None else enc(lo), lo_inc, None if hi is None else enc(hi), hi_inc
    )


interval = st.tuples(
    st.one_of(st.none(), st.integers(-50, 50)),
    st.booleans(),
    st.one_of(st.none(), st.integers(-50, 50)),
    st.booleans(),
)


@given(st.lists(interval, min_size=1, max_size=4), st.lists(interval, min_size=1, max_size=4))
@settings(max_examples=300)
def test_and_or_against_bruteforce(a_specs, b_specs):
    """AND/OR of interval sets match pointwise evaluation over [-55, 55]
    (the property behind ScanRangeTestSuite's 45 example tests)."""
    a = [rng(*s) for s in a_specs]
    b = [rng(*s) for s in b_specs]
    anded = ranges_and(a, b)
    ored = ranges_or(a, b)
    for v in range(-55, 56):
        in_a, in_b = contains(a, v), contains(b, v)
        assert contains(anded, v) == (in_a and in_b), f"AND wrong at {v}"
        assert contains(ored, v) == (in_a or in_b), f"OR wrong at {v}"


@given(st.lists(interval, min_size=1, max_size=5))
@settings(max_examples=200)
def test_normalize_disjoint_sorted(specs):
    """After OR-normalization ranges are sorted and non-overlapping."""
    rs = ranges_or([rng(*s) for s in specs], [])
    for r1, r2 in zip(rs, rs[1:]):
        assert r1.start is None or r2.start is not None
        if r1.end is not None and r2.start is not None:
            assert r1.end <= r2.start
            if r1.end == r2.start:
                assert not (r1.end_inclusive and r2.start_inclusive)


# --------------------------------------------------------------------------
# Spark Filter translation (§2.2 zoo). Use simple stand-ins with the same
# class names/attrs as pyspark.sql.datasource filters.


@dataclass
class EqualTo:
    attribute: tuple
    value: object


@dataclass
class GreaterThan:
    attribute: tuple
    value: object


@dataclass
class GreaterThanOrEqual:
    attribute: tuple
    value: object


@dataclass
class LessThan:
    attribute: tuple
    value: object


@dataclass
class LessThanOrEqual:
    attribute: tuple
    value: object


@dataclass
class In:
    attribute: tuple
    values: tuple


@dataclass
class StringStartsWith:
    attribute: tuple
    value: str


@dataclass
class Not:
    child: object


@dataclass
class And:
    left: object
    right: object


@dataclass
class Or:
    left: object
    right: object


KEY = "col0"


def evaluate(f, v) -> bool:
    k = type(f).__name__
    if k == "EqualTo":
        return v == f.value
    if k == "GreaterThan":
        return v > f.value
    if k == "GreaterThanOrEqual":
        return v >= f.value
    if k == "LessThan":
        return v < f.value
    if k == "LessThanOrEqual":
        return v <= f.value
    if k == "In":
        return v in f.values
    if k == "Not":
        return not evaluate(f.child, v)
    if k == "And":
        return evaluate(f.left, v) and evaluate(f.right, v)
    if k == "Or":
        return evaluate(f.left, v) or evaluate(f.right, v)
    raise AssertionError(k)


def a(name=KEY):
    return (name,)


filter_strategy = st.deferred(
    lambda: st.one_of(
        st.builds(EqualTo, st.just(a()), st.integers(-20, 20)),
        st.builds(GreaterThan, st.just(a()), st.integers(-20, 20)),
        st.builds(GreaterThanOrEqual, st.just(a()), st.integers(-20, 20)),
        st.builds(LessThan, st.just(a()), st.integers(-20, 20)),
        st.builds(LessThanOrEqual, st.just(a()), st.integers(-20, 20)),
        st.builds(In, st.just(a()), st.tuples(st.integers(-20, 20), st.integers(-20, 20))),
        st.builds(Not, filter_strategy),
        st.builds(And, filter_strategy, filter_strategy),
        st.builds(Or, filter_strategy, filter_strategy),
    )
)


@given(st.lists(filter_strategy, min_size=1, max_size=3))
@settings(max_examples=200, deadline=None)
def test_translation_superset_and_exactness(filters):
    """The translated range set is ALWAYS a superset of matching keys
    (correctness under re-filtering), and exact when handled=True —
    the HRF contract (HBaseFilter.scala:126-138)."""
    hrf = translate_filters(filters, KEY, enc)
    for v in range(-25, 26):
        truth = all(evaluate(f, v) for f in filters)
        got = contains(hrf.ranges, v)
        if truth:
            assert got, f"range set lost matching key {v}"
        if hrf.handled and not truth:
            assert not got, f"handled=True but superset at {v}"


def test_signed_int_ranges_exact():
    """The DataTypeSuite battery (DataTypeSuite.scala:90-151): keys
    -31..30, col0 = i if i%2==0 else -i."""
    keys = [i if i % 2 == 0 else -i for i in range(32)]

    def count(filters):
        hrf = translate_filters(filters, KEY, enc)
        return sum(1 for k in keys if contains(hrf.ranges, k)), hrf

    n, hrf = count([LessThan(a(), 0)])
    assert n == 16 and hrf.handled
    n, _ = count([LessThanOrEqual(a(), -10)])
    assert n == 11
    n, _ = count([GreaterThan(a(), 10)])
    assert n == 10
    n, _ = count([And(GreaterThan(a(), -10), LessThanOrEqual(a(), 10))])
    assert n == 11
    # In ∧ Not(In) set difference (DefaultSourceSuite.scala:156-194)
    n, hrf = count([In(a(), (0, 2, 4)), Not(In(a(), (2, 4)))])
    assert n == 1 and hrf.handled


def test_or_with_unhandled_side_full_scans():
    """README.md:24-26 / HBaseFilter.scala:108-114 conservatism."""
    other_col = EqualTo(("colX",), 5)  # not the key -> unhandled
    hrf = translate_filters([Or(EqualTo(a(), 1), other_col)], KEY, enc)
    assert hrf.ranges == list(FULL_SCAN)
    assert not hrf.handled


def test_prefix_becomes_range():
    senc = lambda s: ordered.to_bytes(s, T.StringType())
    hrf = translate_filters([StringStartsWith(a(), "row00")], KEY, senc)
    assert hrf.handled
    (r,) = hrf.ranges
    assert r.start == b"row00" and r.end == b"row01"
    assert _prefix_upper(b"\xff\xff") is None
    assert _prefix_upper(b"a\xff") == b"b"


def test_point_range_detection():
    hrf = translate_filters([EqualTo(a(), 42)], KEY, enc)
    assert len(hrf.ranges) == 1 and hrf.ranges[0].is_point()
    hrf = translate_filters([In(a(), (1, 2, 3))], KEY, enc)
    assert all(r.is_point() for r in hrf.ranges)
