"""Catalog: HBase-table-to-relational-schema mapping.

Re-expresses the reference's `HBaseTableCatalog` model in Python
(reference: core/src/main/scala/org/apache/spark/sql/execution/
datasources/hbase/HBaseTableCatalog.scala:72-305):

- the same JSON shape (``{"table": {...}, "rowkey": "k1:k2",
  "columns": {...}}``) is accepted verbatim;
- ``Field`` = one Spark column mapped to one (cf, qualifier) cell or
  one rowkey dimension (cf == "rowkey", HBaseTableCatalog.scala:81);
- ``RowKey`` = colon-delimited composite key; with the PrimitiveType
  coder only the LAST dimension may be variable-length
  (HBaseTableCatalog.scala:184-204);
- catalog version >= 2.0 makes ``tableCoder`` mandatory
  (HBaseTableCatalog.scala:274-286); default 1.0 -> PrimitiveType;
- only the Avro coder may be mixed with one other coder
  (validateCatalogDef, HBaseTableCatalog.scala:213-218);
- column order in the JSON is preserved (getColsPreservingOrder,
  HBaseTableCatalog.scala:307-318) — Python dicts keep insertion
  order, so ``json.loads`` gives us this for free.

The Spark schema is ``StructType`` over the fields in catalog order
(toDataType, HBaseTableCatalog.scala:172).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import types as T

ROWKEY_CF = "rowkey"
TABLE_CODER_PRIMITIVE = "PrimitiveType"
TABLE_CODER_PHOENIX = "PhoenixType"
TABLE_CODER_AVRO = "Avro"

# fixed byte widths of primitive encodings (HBase Bytes.SIZEOF_*,
# HBaseTableCatalog.scala:107-123)
_PRIMITIVE_WIDTHS = {
    "boolean": 1,
    "tinyint": 1,
    "byte": 1,
    "smallint": 2,
    "short": 2,
    "int": 4,
    "integer": 4,
    "bigint": 8,
    "long": 8,
    "float": 4,
    "double": 8,
}

_SIMPLE_TYPES = {
    "boolean": T.BooleanType(),
    "tinyint": T.ByteType(),
    "byte": T.ByteType(),
    "smallint": T.ShortType(),
    "short": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
}


def parse_data_type(s: str) -> T.DataType:
    """Parse a SQL type string to a Spark DataType without needing an
    active SparkSession (the reference uses CatalystSqlParser,
    HBaseTableCatalog.scala:105)."""
    s = s.strip()
    low = s.lower()
    if low in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[low]
    m = re.fullmatch(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", low)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"array\s*<(.+)>", s, flags=re.IGNORECASE | re.DOTALL)
    if m:
        return T.ArrayType(parse_data_type(m.group(1)))
    m = re.fullmatch(r"map\s*<(.+)>", s, flags=re.IGNORECASE | re.DOTALL)
    if m:
        key_s, val_s = _split_top_level(m.group(1))
        return T.MapType(parse_data_type(key_s), parse_data_type(val_s))
    m = re.fullmatch(r"struct\s*<(.+)>", s, flags=re.IGNORECASE | re.DOTALL)
    if m:
        fields = []
        for part in _split_all_top_level(m.group(1)):
            fname, ftype = part.split(":", 1)
            fields.append(T.StructField(fname.strip(), parse_data_type(ftype)))
        return T.StructType(fields)
    raise ValueError(f"unsupported type string: {s!r}")


def _split_all_top_level(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p for p in (p.strip() for p in parts) if p]


def _split_top_level(s: str) -> tuple[str, str]:
    parts = _split_all_top_level(s)
    if len(parts) != 2:
        raise ValueError(f"expected key,value in {s!r}")
    return parts[0], parts[1]


@dataclass
class Field:
    """One Spark column <-> one HBase cell (or rowkey dimension).

    Mirrors Field at HBaseTableCatalog.scala:72-130.
    """

    col_name: str  # Spark-side column name
    cf: str  # column family ("rowkey" for key dims)
    col: str  # HBase qualifier ("" = dynamic whole-family map)
    type_str: str | None = None
    avro_schema: str | None = None  # Avro schema JSON for Avro-coded cells
    coder: str = TABLE_CODER_PRIMITIVE
    length: int | None = None  # fixed byte length of the encoding

    def __post_init__(self) -> None:
        if self.avro_schema is not None:
            from shc_spark.coders.avro import avro_to_spark_type

            self.dt = avro_to_spark_type(json.loads(self.avro_schema))
        elif self.type_str is not None:
            self.dt = parse_data_type(self.type_str)
        else:
            raise ValueError(f"field {self.col_name}: needs 'type' or 'avro'")
        if self.length is None and self.type_str:
            self.length = _PRIMITIVE_WIDTHS.get(self.type_str.lower())

    @property
    def is_rowkey(self) -> bool:
        return self.cf == ROWKEY_CF

    @property
    def is_dynamic(self) -> bool:
        """Empty qualifier + map type = whole-family dynamic column
        (HBaseTableScan.scala:97-100)."""
        return self.col == "" and isinstance(self.dt, T.MapType)

    @property
    def var_length(self) -> bool:
        return self.length is None

    def spark_field(self) -> T.StructField:
        return T.StructField(self.col_name, self.dt, nullable=not self.is_rowkey)


@dataclass
class RowKey:
    """Composite rowkey `k1:k2:...` (HBaseTableCatalog.scala:134-149).

    With the PrimitiveType coder, all dimensions before the last must
    be fixed-length so offsets are computable
    (initRowKey, HBaseTableCatalog.scala:184-204).
    """

    raw: str
    fields: list[Field] = dc_field(default_factory=list)

    @property
    def key_names(self) -> list[str]:
        return [k for k in self.raw.split(":") if k]

    def validate(self, coder: str) -> None:
        # Only PhoenixType writes a separator after var-length dims
        # (Phoenix.scala:63-74). Every other coder concatenates raw
        # bytes, so a var-length dim before the last makes distinct
        # tuples like ('ab','c') and ('a','bc') encode to the SAME
        # rowkey — ambiguous keys break decode_rowkey and writer
        # uniqueness stats. Reject at parse time (ADVICE r1).
        for f in self.fields[:-1]:
            if f.var_length and f.coder != TABLE_CODER_PHOENIX:
                raise ValueError(
                    f"composite key dimension {f.col_name!r} before the last "
                    f"must have fixed length with the {f.coder} coder "
                    "(only PhoenixType separates var-length dimensions)"
                )


@dataclass
class Catalog:
    namespace: str
    name: str
    table_coder: str
    version: str
    row_key: RowKey
    fields: dict[str, Field]  # Spark-name -> Field, insertion-ordered
    num_regions: int = 0
    min_split: str = "aaaaaa"  # HBaseTableCatalog.scala:301-302
    max_split: str = "zzzzzz"
    has_split_hints: bool = False  # explicit min/maxTableSplitPoint given
    salt_buckets: int = 0  # Phoenix SALT_BUCKETS analog; 0 = unsalted
    # HBase per-column-family TTL (HColumnDescriptor.setTimeToLive):
    # cf -> seconds. Cells whose __ts is older than now - ttl are
    # invisible to reads and purged by major compaction.
    ttl: dict = dc_field(default_factory=dict)

    @property
    def full_name(self) -> str:
        return f"{self.namespace}:{self.name}"

    def spark_schema(self) -> T.StructType:
        return T.StructType([f.spark_field() for f in self.fields.values()])

    def rowkey_fields(self) -> list[Field]:
        return self.row_key.fields

    def value_fields(self) -> list[Field]:
        return [f for f in self.fields.values() if not f.is_rowkey]

    def field(self, name: str) -> Field:
        return self.fields[name]


def parse_catalog(catalog_json: str | dict, numReg: int = 0) -> Catalog:
    """Parse the reference's catalog JSON (HBaseTableCatalog.apply,
    HBaseTableCatalog.scala:263-305)."""
    params = catalog_json if isinstance(catalog_json, dict) else json.loads(catalog_json)
    table = params["table"]
    version = str(table.get("version", "1.0"))
    table_coder = table.get("tableCoder")
    # version >= 2.0 -> tableCoder mandatory (HBaseTableCatalog.scala:274-286)
    if _version_ge(version, "2.0") and table_coder is None:
        raise ValueError("catalog version >= 2.0 requires table.tableCoder")
    if table_coder is None:
        table_coder = TABLE_CODER_PRIMITIVE

    rowkey_raw = params["rowkey"]
    cols = params["columns"]
    salt_buckets = int(table.get("saltBuckets", 0) or 0)
    if not (0 <= salt_buckets <= 256):
        raise ValueError(f"saltBuckets must be in [0, 256], got {salt_buckets}")

    # per-family TTL: {"ttl": {"cf1": seconds, ...}} or a bare number
    # applying to every value family (HBase's per-family
    # TimeToLive; rowkey dimensions never expire)
    ttl_raw = table.get("ttl")
    known_cfs = {spec["cf"] for spec in cols.values() if spec["cf"] != "rowkey"}
    if ttl_raw is None:
        ttl = {}
    elif isinstance(ttl_raw, dict):
        ttl = {cf: int(s) for cf, s in ttl_raw.items()}
    else:
        ttl = {cf: int(ttl_raw) for cf in known_cfs}
    for cf, s in ttl.items():
        if cf == "rowkey" or cf not in known_cfs:
            raise ValueError(f"ttl names unknown column family {cf!r}")
        if s <= 0:
            raise ValueError(f"ttl for family {cf!r} must be > 0 seconds")

    fields: dict[str, Field] = {}
    coders_seen: set[str] = set()
    for cname, spec in cols.items():
        coder = spec.get("coder", table_coder)
        avro = spec.get("avro")
        if avro is not None:
            # the avro key points at a schema string passed alongside
            # the catalog (AvroSourceSuite pattern) or inline JSON
            avro_schema = params.get(avro, avro)
            coder = TABLE_CODER_AVRO
        else:
            avro_schema = None
        f = Field(
            col_name=cname,
            cf=spec["cf"],
            col=spec.get("col", ""),
            type_str=spec.get("type"),
            avro_schema=avro_schema,
            coder=coder,
            length=int(spec["length"]) if "length" in spec else None,
        )
        coders_seen.add(coder)
        fields[cname] = f

    # coder-mixing rule: Avro is the only coder mixable with one other
    # (validateCatalogDef, HBaseTableCatalog.scala:213-218)
    non_avro = {c for c in coders_seen if c != TABLE_CODER_AVRO}
    if len(non_avro) > 1:
        raise ValueError(f"cannot mix non-Avro coders in one catalog: {sorted(non_avro)}")

    rk = RowKey(raw=rowkey_raw)
    for key_name in rk.key_names:
        matches = [f for f in fields.values() if f.is_rowkey and f.col == key_name]
        if not matches:
            raise ValueError(f"rowkey dimension {key_name!r} has no column mapping")
        rk.fields.append(matches[0])
    rk.validate(table_coder)

    return Catalog(
        namespace=table.get("namespace", "default"),
        name=table["name"],
        table_coder=table_coder,
        version=version,
        row_key=rk,
        fields=fields,
        num_regions=numReg or int(params.get("newtable", 0) or 0),
        min_split=str(params.get("minTableSplitPoint", "aaaaaa")),
        max_split=str(params.get("maxTableSplitPoint", "zzzzzz")),
        has_split_hints=(
            "minTableSplitPoint" in params or "maxTableSplitPoint" in params
        ),
        salt_buckets=salt_buckets,
        ttl=ttl,
    )


def _version_ge(a: str, b: str) -> bool:
    def key(v: str):
        return [int(x) for x in re.findall(r"\d+", v)] or [0]

    return key(a) >= key(b)
