"""Registry invariants: the driver records correctness for the FIRST
50 registered gates only, so the window composition is load-bearing —
pin it."""

from shc_spark.queries import _WINDOW, all_oracles, all_queries


def test_window_is_exactly_first_50():
    names = list(all_queries())
    assert len(_WINDOW) == 50
    assert names[:50] == _WINDOW


def test_window_families_all_represented():
    fams = {
        "connector": [n for n in _WINDOW if n.startswith("shc_")],
        "dedup": [n for n in _WINDOW if n.startswith("dedup_")],
        "similarity": [n for n in _WINDOW if n.startswith("sim_")],
        "text": [n for n in _WINDOW if n.startswith("text_")],
        "multimodal": [n for n in _WINDOW if n.startswith("mm_")],
        "streaming": [n for n in _WINDOW if n.startswith("stream_")],
        "relational": [n for n in _WINDOW if n.startswith("q")],
    }
    for fam, members in fams.items():
        assert members, f"family {fam} has no in-window gate"


def test_every_window_gate_has_value_exact_oracle():
    # 50/50 recordable as full rows+schema+hash matches (no-oracle
    # approximate gates live outside the window by design)
    oracles = all_oracles()
    missing = [n for n in _WINDOW if n not in oracles]
    assert missing == []


def test_no_complex_types_in_any_gate_output_schema(spark):
    """Gate output schemas must be scalar-only at the top level:
    driver-side canonicalizers sort result columns with pandas, which
    cannot factorize list/dict cells (round-3's `embed_quantize` red
    was exactly this crash). Also bans raw TIMESTAMP outputs (Spark's
    are tz-aware UTC, DuckDB's naive — a guaranteed hash mismatch;
    cast to DATE or format as string). Structural ban over ALL
    registered gates INCLUDING the TAIL_QUERIES outside the window —
    rotation must never reintroduce either class."""
    from pyspark.sql.types import (
        ArrayType,
        MapType,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    sf_dir = "/root/testdata/sf0.001"
    offenders = []
    for name, fn in all_queries().items():
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(
                f.dataType,
                (ArrayType, MapType, StructType, TimestampType, TimestampNTZType),
            ):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert offenders == []


def test_tail_queries_distinct_and_oracle_checked():
    """TAIL_QUERIES are redundant baselines kept OUTSIDE the driver
    window; a rotation could still promote one, so they get the same
    hygiene: distinct from every windowed/registered name (no silent
    shadowing in the all_queries() merge) and each either carries a
    DuckDB oracle or is a documented rows-only approximation."""
    from shc_spark.queries import connector, pipeline, relational, streaming_q

    primary = set()
    for m in (connector, pipeline, streaming_q, relational):
        primary |= set(m.QUERIES)
    tail = set(pipeline.TAIL_QUERIES)
    assert not (tail & primary), sorted(tail & primary)
    # every tail gate is callable and registered in the full listing
    q = all_queries()
    assert tail <= set(q)
    # since r7 there are NO rows-only gates left: approximate ops emit
    # deterministic hash-checked verdicts (recall floors, roundtrip
    # identities, error contracts) instead of unchecked rows
    oracles = all_oracles()
    assert sorted(tail - set(oracles)) == []


def test_every_registered_gate_has_an_oracle():
    """r7 invariant: every gate in the registry — windowed, rotated
    out, or tail — carries a DuckDB oracle. New approximate operators
    must ship a verdict oracle (see _ann_recall_verdict), not a
    rows-only entry."""
    q = all_queries()
    o = all_oracles()
    assert sorted(set(q) - set(o)) == []


def test_every_query_callable_and_every_oracle_has_query():
    q = all_queries()
    o = all_oracles()
    assert all(callable(f) for f in q.values())
    dangling = [n for n in o if n not in q]
    assert dangling == []


def test_local_correctness_artifact_covers_every_gate():
    """VERDICT r7 #3: the committed CORRECTNESS_LOCAL.json must have a
    green row for EVERY registered gate — the README's "all gates
    hash-checked" claim can never again run ahead of the recorded
    artifact. A full (unfiltered) `python tools/check_oracle.py` run
    rewrites it — make that the last commit of every round."""
    import json
    import os

    art = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_LOCAL.json")
    rows = json.load(open(art))
    q = set(all_queries())
    missing = sorted(q - set(rows))
    assert missing == [], f"gates without a recorded local row: {missing}"
    stale = sorted(set(rows) - q)
    assert stale == [], f"recorded rows for unregistered gates: {stale}"
    red = sorted(
        n
        for n, v in rows.items()
        if not (v.get("rows_match") and v.get("schema_match"))
        or v.get("hash_match") is False
        or v.get("err")
    )
    assert red == [], f"non-green local rows: {red}"
