"""High-level connector API: the reference's read/write surface
re-expressed Spark-first.

- ``write_table(df, catalog, ...)`` = S2/S3/S4: pre-split via
  ``repartitionByRange`` on the encoded rowkey (the Spark-native
  analog of `Bytes.split` pre-splitting, HBaseRelation.scala:124-175),
  sort within partitions, write through the "shc" data source.
- ``read_table(spark, catalog, ...)`` = S1 + S14/S15: returns a
  DataFrame with the catalog schema; time-travel options
  (timestamp/minStamp/maxStamp, HBaseRelation.scala:77-81) and version
  semantics (maxVersions × mergeToLatest, MaxVersionsSuite.scala:45-98)
  are DataFrame aggregations ABOVE the source, so Catalyst pushes
  rowkey predicates through them into the scan (filter pushdown +
  region pruning live in ShcReader).

Divergences from the reference, on purpose (SURVEY.md §4.3):
- version-exploded reads keep multiset semantics (the reference's
  `Set[Row]` silently drops duplicate rows, HBaseTableScan.scala:245);
- merge-to-latest treats a map-typed cell as one value (latest non-null
  map wins) rather than per-qualifier overlay; per-qualifier merge is
  available explicitly via ``merge_dynamic_maps=True``.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from shc_spark.catalog import Catalog, parse_catalog
from shc_spark.coders import get_coder
from shc_spark.sources.shc_source import ROWKEY_COL, TS_COL, ShcDataSource

DEFAULT_ROOT = "/tmp/shc_tables"


def register(spark: SparkSession) -> None:
    """Register format("shc") with this session and enable Python data
    source filter pushdown (off by default in Spark 4.1)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ShcDataSource)


def _encode_dim_vectorized(col: pd.Series, coder, dt: T.DataType) -> "list[bytes] | None":
    """numpy fast path for OrderedType/PhoenixType int-family and
    string dims: whole-column encode without a Python loop. Returns
    None when no fast path applies."""
    import numpy as np

    if not getattr(coder, "order_preserving", False):
        return None
    widths = {T.ByteType: 1, T.ShortType: 2, T.IntegerType: 4, T.LongType: 8}
    w = widths.get(type(dt))
    if w is not None:
        vals = col.to_numpy()
        if pd.isna(vals).any():
            raise ValueError("rowkey dimension is null")
        bits = vals.astype(np.uint64) ^ np.uint64(1 << (8 * w - 1))
        be = bits.astype(">u8").view(np.uint8).reshape(-1, 8)[:, 8 - w :]
        return [r.tobytes() for r in be]
    if isinstance(dt, T.StringType):
        if col.isna().any():
            raise ValueError("rowkey dimension is null")
        return [s.encode("utf-8") for s in col]
    return None


def _rowkey_encoder(cat: Catalog):
    """Vectorized rowkey encoder: pandas UDF over the key columns
    (Arrow-batched, numpy-encoded per dimension — the write-side fix
    for the reference's per-row `convertToPut` cost,
    HBaseRelation.scala:202-267)."""
    key_fields = cat.rowkey_fields()
    coders = [get_coder(f.coder) for f in key_fields]
    dts = [f.dt for f in key_fields]
    lengths = [f.length if f.var_length is False else None for f in key_fields]
    names = [f.col_name for f in key_fields]
    phoenix_like = [type(c).__name__ == "PhoenixType" for c in coders]

    def encode_dim(col: pd.Series, j: int) -> list[bytes]:
        fast = _encode_dim_vectorized(col, coders[j], dts[j])
        if fast is None:
            fast = []
            for v in col:
                if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
                    raise ValueError(f"rowkey dimension {names[j]!r} is null")
                fast.append(coders[j].to_bytes(v, dts[j]))
        if lengths[j] is not None:
            for enc in fast:
                if len(enc) != lengths[j]:
                    raise ValueError(
                        f"rowkey dim {names[j]!r}: encoded length {len(enc)} != "
                        f"declared length {lengths[j]}"
                    )
        return fast

    @F.pandas_udf(T.BinaryType())
    def encode(*cols: pd.Series) -> pd.Series:
        dims = [encode_dim(col, j) for j, col in enumerate(cols)]
        seps = [
            b"\x00" if phoenix_like[j] and lengths[j] is None and j != len(cols) - 1 else b""
            for j in range(len(cols))
        ]
        if len(dims) == 1:
            return pd.Series(dims[0])
        return pd.Series(
            [b"".join(d[i] + s for d, s in zip(dims, seps)) for i in range(len(dims[0]))]
        )

    return encode, names


def _avro_encode_udf(field):
    """struct value -> Avro binary cell (pure-python serde — the
    spark-avro jar is not loadable here; mirrors AvroSerde.serialize,
    types/Avro.scala:401-414)."""
    from shc_spark.coders.avro import AvroType

    coder = AvroType(field.avro_schema)
    struct_fields = list(field.dt.fields)

    @F.pandas_udf(T.BinaryType())
    def enc(pdf: pd.DataFrame) -> pd.Series:
        out = []
        for _, row in pdf.iterrows():
            if row.isna().all():
                out.append(None)
                continue
            value = tuple(_coerce(row[sf.name], sf.dataType) for sf in struct_fields)
            out.append(coder.to_bytes(value))
        return pd.Series(out)

    return enc


def _coerce(v, dt: T.DataType):
    """pandas/numpy value -> python value matching the Spark type
    (nullable ints arrive as float64 from pandas; arrays as ndarray)."""
    import numpy as np

    if v is None or (not isinstance(v, (list, dict, np.ndarray, tuple)) and pd.isna(v)):
        return None
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(v)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(v)
    if isinstance(dt, T.BooleanType):
        return bool(v)
    if isinstance(dt, T.StringType):
        return str(v)
    if isinstance(dt, T.BinaryType):
        return bytes(v)
    if isinstance(dt, T.ArrayType):
        return [_coerce(x, dt.elementType) for x in v]
    if isinstance(dt, T.MapType):
        items = v.items() if isinstance(v, dict) else v  # arrow may give pair-lists
        return {k: _coerce(x, dt.valueType) for k, x in items}
    if isinstance(dt, T.StructType):
        if isinstance(v, dict):
            return tuple(_coerce(v.get(sf.name), sf.dataType) for sf in dt.fields)
        return tuple(_coerce(x, sf.dataType) for x, sf in zip(v, dt.fields))
    return v


def _avro_decode_udf(field):
    """Avro binary cell -> struct value (AvroSerde.deserialize,
    types/Avro.scala:416-426)."""
    from shc_spark.coders.avro import AvroType

    coder = AvroType(field.avro_schema)
    names = [sf.name for sf in field.dt.fields]

    @F.pandas_udf(field.dt)
    def dec(blobs: pd.Series) -> pd.DataFrame:
        rows = []
        for b in blobs:
            if b is None:
                rows.append({n: None for n in names})
            else:
                tup = coder.from_bytes(bytes(b))
                rows.append(dict(zip(names, tup)))
        return pd.DataFrame(rows)

    return dec


def write_table(
    df: DataFrame,
    catalog: str,
    root: str = DEFAULT_ROOT,
    num_regions: int | None = None,
    timestamp: int | None = None,
    mode: str = "append",
) -> None:
    """Write ``df`` as an shc table (pre-split, sorted regions).

    ``num_regions`` mirrors the `newtable` option: required > 3 when
    creating a new table (HBaseRelation.scala:150-153).
    """
    import os

    cat = parse_catalog(catalog)
    path = os.path.join(root, f"{cat.namespace}.{cat.name}")
    exists = os.path.exists(os.path.join(path, "_regions.json"))
    if not exists or mode == "overwrite":
        if num_regions is None:
            num_regions = 8
        if num_regions <= 3:
            raise ValueError("new tables need num_regions > 3 (reference `newtable` rule)")

    register(df.sparkSession)
    encode, key_names = _rowkey_encoder(cat)
    ts = timestamp if timestamp is not None else int(time.time() * 1000)

    out = df.select([f.col_name for f in cat.fields.values()])
    if num_regions:
        # range-partition + sort on the TYPED key columns (same order
        # as encoded bytes for order-preserving coders) BEFORE the
        # encode projection: the range-sampling pass then prunes to the
        # key columns and never evaluates the encode UDF, and the UDF
        # runs exactly once, above the exchange. (= HBase pre-split.)
        out = out.repartitionByRange(num_regions, *[F.col(k) for k in key_names])
    out = out.sortWithinPartitions(*[F.col(k) for k in key_names])
    for f in cat.fields.values():
        if f.avro_schema is not None:
            out = out.withColumn(f.col_name, _avro_encode_udf(f)(F.col(f.col_name)))
    out = out.withColumn(ROWKEY_COL, encode(*[F.col(k) for k in key_names]))
    out = out.withColumn(TS_COL, F.lit(ts).cast("long"))
    (
        out.write.format("shc")
        .mode(mode)
        .option("catalog", catalog)
        .option("root", root)
        .save()
    )


def _merge_is_noop(table_path: str) -> bool:
    """True when every region file has unique keys (writer-recorded)
    and region key ranges are pairwise disjoint — then one row per key
    exists and merge-to-latest is the identity."""
    import json as _json
    import os as _os

    meta = _os.path.join(table_path, "_regions.json")
    if not _os.path.exists(meta):
        return False
    regions = _json.load(open(meta))
    if not regions or not all(r.get("unique") for r in regions):
        return False
    spans = sorted(
        ((r["start"] or "", r["end"] or "") for r in regions), key=lambda x: x[0]
    )
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        if s2 <= e1:  # hex strings compare like the underlying bytes
            return False
    return True


def read_table(
    spark: SparkSession,
    catalog: str,
    root: str = DEFAULT_ROOT,
    timestamp: int | None = None,
    min_stamp: int | None = None,
    max_stamp: int | None = None,
    max_versions: int | None = None,
    merge_to_latest: bool = True,
    merge_dynamic_maps: bool = False,
    keep_internal: bool = False,
) -> DataFrame:
    """Read an shc table back as a DataFrame with the catalog schema.

    Call read_table once per logical query: Spark 4.1 caches the
    planned scan per relation, so reusing ONE returned DataFrame
    across differently-filtered queries can reuse stale partition
    pruning (see ShcReader.pushFilters). Each call here builds a fresh
    relation, which is always safe.
    """
    register(spark)
    cat = parse_catalog(catalog)
    df = (
        spark.read.format("shc")
        .option("catalog", catalog)
        .option("root", root)
        .load()
    )
    # S15 time semantics (handleTimeSemantics, HBaseTableScan.scala:496-516)
    if timestamp is not None:
        df = df.filter(F.col(TS_COL) == timestamp)
    if min_stamp is not None:
        df = df.filter(F.col(TS_COL) >= min_stamp)
    if max_stamp is not None:
        df = df.filter(F.col(TS_COL) < max_stamp)  # half-open, like Scan.setTimeRange

    key_names = [f.col_name for f in cat.rowkey_fields()]
    value_fields = [f for f in cat.fields.values() if not f.is_rowkey]

    import os as _os

    table_dir = _os.path.join(root, f"{cat.namespace}.{cat.name}")
    if merge_to_latest and max_versions is None and _merge_is_noop(table_dir):
        # single write, every file's keys unique, files key-disjoint:
        # each key exists exactly once, so merge-to-latest is the
        # identity — skip the groupBy entirely. At 100 TB this turns
        # every plain read into a shuffle-FREE scan.
        merge_to_latest = False

    if max_versions is not None:
        # keep the N newest versions per key (Window; rowkey predicates
        # still push through — partition keys are grouping columns)
        from pyspark.sql import Window as W

        w = W.partitionBy(*key_names).orderBy(F.col(TS_COL).desc())
        df = df.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= max_versions
        ).drop("__rn")

    if merge_to_latest:
        # per-cell latest-non-null merge (buildRow, HBaseTableScan.scala:114-175):
        # max_by ignores rows whose ordering key is null, so a newer
        # version with a null cell does NOT shadow an older value —
        # matching HBase "nulls are not stored" semantics
        aggs = []
        for f in value_fields:
            if merge_dynamic_maps and isinstance(f.dt, T.MapType):
                # per-qualifier overlay (HBase dynamic-column merge,
                # HBaseTableScan.scala:139-151): fold version maps in
                # ts order, newer keys shadowing older ones; keys are
                # removed from the accumulator before map_concat so no
                # dedup policy is needed
                dt_sql = f.dt.simpleString()
                # maps aren't orderable, entry arrays are: sort (ts,
                # entries) structs by ts, fold newer-shadows-older
                aggs.append(
                    F.expr(
                        f"aggregate("
                        f"  array_sort(collect_list(struct(`{TS_COL}` AS ts,"
                        f"    map_entries(coalesce(`{f.col_name}`, cast(map() AS {dt_sql}))) AS e))),"
                        f"  cast(map() AS {dt_sql}),"
                        f"  (acc, x) -> map_concat("
                        f"    map_filter(acc, (k, v) -> NOT array_contains(transform(x.e, p -> p.key), k)),"
                        f"    map_from_entries(x.e)))"
                    ).alias(f.col_name)
                )
            else:
                aggs.append(
                    F.expr(
                        f"max_by(`{f.col_name}`, CASE WHEN `{f.col_name}` IS NOT NULL "
                        f"THEN `{TS_COL}` END)"
                    ).alias(f.col_name)
                )
        keep = [F.max(TS_COL).alias(TS_COL)] if keep_internal else []
        df = df.groupBy(*key_names).agg(*aggs, *keep)
        cols = key_names + [f.col_name for f in value_fields]
    else:
        cols = key_names + [f.col_name for f in value_fields]
    if keep_internal:
        cols = cols + [TS_COL]
    # Avro cells travel as binary through filter/merge (pushdown and
    # max_by never look inside); decode to the logical struct last, on
    # the merged row count
    for f in value_fields:
        if f.avro_schema is not None:
            df = df.withColumn(f.col_name, _avro_decode_udf(f)(F.col(f.col_name)))
    return df.select(*cols)


def bulk_get(
    spark: SparkSession,
    catalog: str,
    keys: list,
    root: str = DEFAULT_ROOT,
    **read_opts,
) -> DataFrame:
    """BulkGet (S11, HBaseTableScan.scala:424-447): point lookups for a
    list of first-dimension key values. The IN-list pushes down to
    point ranges, so only the region files (and row groups) containing
    those keys are opened — the multi-Get analog, without a batch-size
    knob because partitions parallelize naturally."""
    cat = parse_catalog(catalog)
    first = cat.rowkey_fields()[0].col_name
    df = read_table(spark, catalog, root=root, **read_opts)
    return df.filter(F.col(first).isin(list(keys)))
