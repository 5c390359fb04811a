"""Catalog parsing tests — model: CatalogSuite.scala:45-55 plus the
validation rules in HBaseTableCatalog.scala:184-224, 263-305."""

import json

import pytest
from pyspark.sql import types as T

from shc_spark.catalog import Catalog, parse_catalog, parse_data_type

BASIC = {
    "table": {"namespace": "default", "name": "table1", "tableCoder": "PrimitiveType", "version": "2.0"},
    "rowkey": "key",
    "columns": {
        "col0": {"cf": "rowkey", "col": "key", "type": "string"},
        "col1": {"cf": "cf1", "col": "col1", "type": "boolean"},
        "col2": {"cf": "cf2", "col": "col2", "type": "double"},
        "col3": {"cf": "cf3", "col": "col3", "type": "float"},
        "col4": {"cf": "cf4", "col": "col4", "type": "int"},
        "col5": {"cf": "cf5", "col": "col5", "type": "bigint"},
        "col6": {"cf": "cf6", "col": "col6", "type": "smallint"},
        "col7": {"cf": "cf7", "col": "col7", "type": "string"},
        "col8": {"cf": "cf8", "col": "col8", "type": "tinyint"},
    },
}


def test_basic_parse():
    cat = parse_catalog(json.dumps(BASIC))
    assert isinstance(cat, Catalog)
    assert cat.full_name == "default:table1"
    assert cat.row_key.key_names == ["key"]
    assert [f.col_name for f in cat.rowkey_fields()] == ["col0"]
    assert len(cat.value_fields()) == 8


def test_column_order_preserved():
    # CatalogSuite.scala:51-55 — catalog JSON order defines schema order
    cat = parse_catalog(json.dumps(BASIC))
    assert list(cat.fields) == [f"col{i}" for i in range(9)]
    schema = cat.spark_schema()
    assert schema.names == [f"col{i}" for i in range(9)]
    assert schema["col4"].dataType == T.IntegerType()
    assert schema["col6"].dataType == T.ShortType()
    assert schema["col8"].dataType == T.ByteType()


def test_rowkey_not_nullable():
    cat = parse_catalog(json.dumps(BASIC))
    schema = cat.spark_schema()
    assert not schema["col0"].nullable
    assert schema["col1"].nullable


def test_version2_requires_coder():
    bad = json.loads(json.dumps(BASIC))
    del bad["table"]["tableCoder"]
    with pytest.raises(ValueError, match="tableCoder"):
        parse_catalog(bad)


def test_version1_defaults_primitive():
    v1 = json.loads(json.dumps(BASIC))
    del v1["table"]["tableCoder"]
    v1["table"]["version"] = "1.0"
    assert parse_catalog(v1).table_coder == "PrimitiveType"


def test_composite_key_lengths():
    cat_json = {
        "table": {"namespace": "default", "name": "ck", "tableCoder": "PrimitiveType", "version": "2.0"},
        "rowkey": "key1:key2",
        "columns": {
            "col00": {"cf": "rowkey", "col": "key1", "type": "string", "length": "6"},
            "col01": {"cf": "rowkey", "col": "key2", "type": "int"},
            "col1": {"cf": "cf1", "col": "col1", "type": "double"},
        },
    }
    cat = parse_catalog(cat_json)
    ks = cat.rowkey_fields()
    assert [f.col_name for f in ks] == ["col00", "col01"]
    assert ks[0].length == 6
    assert ks[1].length == 4  # SIZEOF_INT default


def test_composite_var_length_must_be_last():
    cat_json = {
        "table": {"namespace": "default", "name": "ck", "tableCoder": "PrimitiveType", "version": "2.0"},
        "rowkey": "key1:key2",
        "columns": {
            "col00": {"cf": "rowkey", "col": "key1", "type": "string"},  # var-length, not last
            "col01": {"cf": "rowkey", "col": "key2", "type": "int"},
        },
    }
    with pytest.raises(ValueError, match="fixed length"):
        parse_catalog(cat_json)


def test_coder_mixing_rejected():
    bad = json.loads(json.dumps(BASIC))
    bad["columns"]["col1"]["coder"] = "PhoenixType"
    with pytest.raises(ValueError, match="mix"):
        parse_catalog(bad)


def test_dynamic_and_version_map_columns():
    cat_json = {
        "table": {"namespace": "default", "name": "dyn", "tableCoder": "PrimitiveType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "key": {"cf": "rowkey", "col": "key", "type": "string"},
            "dyn": {"cf": "cf1", "col": "", "type": "map<string,int>"},
            "versions": {"cf": "cf2", "col": "v", "type": "map<long,double>"},
        },
    }
    cat = parse_catalog(cat_json)
    assert cat.field("dyn").is_dynamic
    assert cat.field("dyn").dt == T.MapType(T.StringType(), T.IntegerType())
    assert not cat.field("versions").is_dynamic  # has a qualifier
    assert cat.field("versions").dt == T.MapType(T.LongType(), T.DoubleType())


def test_parse_data_type_nested():
    assert parse_data_type("map<string, map<long, double>>") == T.MapType(
        T.StringType(), T.MapType(T.LongType(), T.DoubleType())
    )
    assert parse_data_type("array<struct<a:int,b:string>>") == T.ArrayType(
        T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())])
    )
    assert parse_data_type("decimal(10,2)") == T.DecimalType(10, 2)


def test_avro_field():
    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "name", "type": "string"},
                {"name": "favorite_number", "type": ["int", "null"]},
                {"name": "favorite_array", "type": {"type": "array", "items": "string"}},
            ],
        }
    )
    cat_json = {
        "table": {"namespace": "default", "name": "av", "tableCoder": "PrimitiveType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "key": {"cf": "rowkey", "col": "key", "type": "string"},
            "rec": {"cf": "cf1", "col": "c", "avro": "schema1"},
        },
        "schema1": schema,
    }
    cat = parse_catalog(cat_json)
    dt = cat.field("rec").dt
    assert isinstance(dt, T.StructType)
    assert dt["favorite_number"].dataType == T.IntegerType()
    assert dt["favorite_number"].nullable
    assert dt["favorite_array"].dataType == T.ArrayType(T.StringType(), False)


def test_ordered_var_length_before_last_rejected():
    """OrderedType has no separator: a var-length dim before the last
    makes ('ab','c') and ('a','bc') encode identically — rejected at
    parse time (ADVICE r1). PhoenixType (NUL separators) is allowed."""
    def cat(coder):
        return {
            "table": {"namespace": "default", "name": "vl", "tableCoder": coder, "version": "2.0"},
            "rowkey": "key1:key2",
            "columns": {
                "c0": {"cf": "rowkey", "col": "key1", "type": "string"},
                "c1": {"cf": "rowkey", "col": "key2", "type": "int"},
            },
        }

    with pytest.raises(ValueError, match="fixed length"):
        parse_catalog(cat("OrderedType"))
    parse_catalog(cat("PhoenixType"))  # separator-based: fine
