"""Coder roundtrip + order-preservation property tests (hypothesis) —
an upgrade over the reference's example-based serde tests
(AvroRecordSuite.scala:31-250, DataTypeSuite.scala:90-151)."""

import math
import struct

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from shc_spark.catalog import Field
from shc_spark.coders import get_coder
from shc_spark.coders.avro import AvroType, avro_to_spark_type, spark_to_avro_schema

prim = get_coder("PrimitiveType")
ordered = get_coder("OrderedType")
phoenix = get_coder("PhoenixType")

INT_RANGES = {
    T.ByteType(): (-(2**7), 2**7 - 1),
    T.ShortType(): (-(2**15), 2**15 - 1),
    T.IntegerType(): (-(2**31), 2**31 - 1),
    T.LongType(): (-(2**63), 2**63 - 1),
}


@given(st.data())
@settings(max_examples=300)
def test_int_roundtrip_all_coders(data):
    for dt, (lo, hi) in INT_RANGES.items():
        v = data.draw(st.integers(lo, hi))
        for coder in (prim, ordered, phoenix):
            assert coder.from_bytes(coder.to_bytes(v, dt), dt) == v


@given(st.data())
@settings(max_examples=300)
def test_int_order_preserved(data):
    """Byte order == numeric order for the ordered/phoenix coders —
    including across sign, the case the reference needs 2 ranges for."""
    for dt, (lo, hi) in INT_RANGES.items():
        a = data.draw(st.integers(lo, hi))
        b = data.draw(st.integers(lo, hi))
        for coder in (ordered, phoenix):
            ea, eb = coder.to_bytes(a, dt), coder.to_bytes(b, dt)
            assert (a < b) == (ea < eb), (a, b, ea, eb)


@given(st.floats(allow_nan=False, width=64), st.floats(allow_nan=False, width=64))
@settings(max_examples=300)
def test_double_order_preserved(a, b):
    dt = T.DoubleType()
    ea, eb = ordered.to_bytes(a, dt), ordered.to_bytes(b, dt)
    if a == b:  # +0.0/-0.0 encode differently but compare equal; skip
        return
    assert (a < b) == (ea < eb)
    assert ordered.from_bytes(ea, dt) == a


@given(st.floats(allow_nan=False, allow_infinity=True, width=32))
@settings(max_examples=200)
def test_float_roundtrip(v):
    dt = T.FloatType()
    v = struct.unpack(">f", struct.pack(">f", v))[0]
    for coder in (prim, ordered):
        got = coder.from_bytes(coder.to_bytes(v, dt), dt)
        assert got == v or (math.isnan(got) and math.isnan(v))


@given(st.text())
@settings(max_examples=200)
def test_string_roundtrip(s):
    dt = T.StringType()
    for coder in (prim, ordered, phoenix):
        assert coder.from_bytes(coder.to_bytes(s, dt), dt) == s


def test_hbase_bytes_compat():
    """Spot-check bit-compatibility with HBase Bytes (PrimitiveType.scala):
    known encodings from the public HBase Bytes javadoc semantics."""
    assert prim.to_bytes(True, T.BooleanType()) == b"\xff"
    assert prim.to_bytes(False, T.BooleanType()) == b"\x00"
    assert prim.to_bytes(1, T.IntegerType()) == b"\x00\x00\x00\x01"
    assert prim.to_bytes(-1, T.IntegerType()) == b"\xff\xff\xff\xff"
    assert prim.to_bytes(256, T.LongType()) == b"\x00" * 6 + b"\x01\x00"
    assert prim.to_bytes("row001", T.StringType()) == b"row001"
    # the raw-encoding hazard the reference works around: -1 sorts above 1
    assert prim.to_bytes(-1, T.IntegerType()) > prim.to_bytes(1, T.IntegerType())
    # and the ordered coder fixes it
    assert ordered.to_bytes(-1, T.IntegerType()) < ordered.to_bytes(1, T.IntegerType())


def _f(name, type_str, length=None):
    return Field(col_name=name, cf="rowkey", col=name, type_str=type_str, length=length)


def test_composite_rowkey_roundtrip():
    """Fixed-width prefix + var-width tail (PrimitiveType.scala:74-113,
    CompositeKeySuite.scala fixture shape)."""
    fields = [_f("k1", "string", 6), _f("k2", "int"), _f("k3", "string")]
    for coder in (prim, ordered):
        key = coder.encode_rowkey(["row001", -42, "tail-of-any-length"], fields)
        assert coder.decode_rowkey(key, fields) == ["row001", -42, "tail-of-any-length"]


def test_phoenix_composite_separator():
    """Phoenix: var-length dims NUL-terminated unless last (Phoenix.scala:63-86)."""
    fields = [_f("k1", "string"), _f("k2", "int"), _f("k3", "string")]
    key = phoenix.encode_rowkey(["abc", 7, "xyz"], fields)
    assert phoenix.decode_rowkey(key, fields) == ["abc", 7, "xyz"]
    assert b"\x00" in key  # separator after the first var-length dim


@given(st.data())
@settings(max_examples=150)
def test_composite_rowkey_order(data):
    """Composite (int, long) ordered-coder keys sort like tuples."""
    fields = [_f("k1", "int"), _f("k2", "long")]
    a = (data.draw(st.integers(-(2**31), 2**31 - 1)), data.draw(st.integers(-(2**63), 2**63 - 1)))
    b = (data.draw(st.integers(-(2**31), 2**31 - 1)), data.draw(st.integers(-(2**63), 2**63 - 1)))
    ea = ordered.encode_rowkey(list(a), fields)
    eb = ordered.encode_rowkey(list(b), fields)
    assert (a < b) == (ea < eb)


# --------------------------------------------------------------------------
# Avro


AVRO_SCHEMA = {
    "type": "record",
    "name": "rec",
    "fields": [
        {"name": "name", "type": "string"},
        {"name": "favorite_number", "type": ["int", "null"]},
        {"name": "favorite_color", "type": ["string", "null"]},
        {"name": "favorite_array", "type": {"type": "array", "items": "string"}},
        {"name": "favorite_map", "type": {"type": "map", "values": "int"}},
    ],
}


def test_avro_roundtrip_record():
    # mirrors AvroSourceSuite record shape (AvroSourceSuite.scala:40-60)
    coder = AvroType(AVRO_SCHEMA)
    value = ("alice", 7, None, ["a", "bb"], {"k1": 1, "k2": 2})
    assert coder.from_bytes(coder.to_bytes(value)) == value


@given(
    st.tuples(
        st.text(),
        st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
        st.one_of(st.none(), st.text()),
        st.lists(st.text(), max_size=5),
        st.dictionaries(st.text(min_size=1), st.integers(-(2**31), 2**31 - 1), max_size=5),
    )
)
@settings(max_examples=150)
def test_avro_roundtrip_property(value):
    coder = AvroType(AVRO_SCHEMA)
    assert coder.from_bytes(coder.to_bytes(value)) == value


def test_avro_schema_converters():
    # Avro -> Spark (Avro.scala:83-135 semantics)
    dt = avro_to_spark_type(AVRO_SCHEMA)
    assert isinstance(dt, T.StructType)
    assert dt["favorite_number"].dataType == T.IntegerType() and dt["favorite_number"].nullable
    assert dt["favorite_array"].dataType == T.ArrayType(T.StringType(), False)
    assert dt["favorite_map"].dataType == T.MapType(T.StringType(), T.IntegerType(), False)
    # union widening: int|long -> long, float|double -> double
    assert avro_to_spark_type(["int", "long"]) == T.LongType()
    assert avro_to_spark_type(["float", "double"]) == T.DoubleType()
    assert avro_to_spark_type({"type": "enum", "name": "e", "symbols": ["A"]}) == T.StringType()
    assert avro_to_spark_type({"type": "fixed", "name": "f", "size": 4}) == T.BinaryType()
    # Spark -> Avro -> Spark fixpoint
    back = avro_to_spark_type(spark_to_avro_schema(dt))
    assert back == dt


def test_avro_multi_branch_union_member_struct():
    """Multi-branch non-null unions materialize the member struct on
    decode and unwrap it on encode (ADVICE r1; reference
    SchemaConverters behavior, Avro.scala:83-135)."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "u", "type": ["null", "int", "string"]}],
    }
    dt = avro_to_spark_type(schema)
    assert dt == T.StructType(
        [
            T.StructField(
                "u",
                T.StructType(
                    [
                        T.StructField("member0", T.IntegerType()),
                        T.StructField("member1", T.StringType()),
                    ]
                ),
                nullable=True,
            )
        ]
    )
    codec = AvroType(schema)
    for rec in [((5, None),), ((None, "x"),), (None,)]:
        assert codec.from_bytes(codec.to_bytes(rec)) == rec


def test_avro_widened_unions_stay_scalar():
    """[int,long] -> long and [float,double] -> double keep scalar
    representation; no member struct is produced."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": ["int", "long"]},
            {"name": "b", "type": ["null", "float", "double"]},
        ],
    }
    dt = avro_to_spark_type(schema)
    assert dt["a"].dataType == T.LongType()
    assert dt["b"].dataType == T.DoubleType()
    codec = AvroType(schema)
    assert codec.from_bytes(codec.to_bytes((7, 1.5))) == (7, 1.5)
    assert codec.from_bytes(codec.to_bytes((2**40, None))) == (2**40, None)
