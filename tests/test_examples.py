"""Every example script runs green in one session — the examples
directory is part of the supported surface, not documentation rot."""

import importlib
import sys

import pytest

sys.path.insert(0, "examples")


@pytest.mark.parametrize(
    "mod",
    ["basic_source", "join_two_clusters", "avro_source", "composite_key", "data_pipeline", "storage_lifecycle", "mixed_sources", "corpus_to_training", "corpus_quality_report", "colocated_and_layout", "intervals_ttl_drift", "media_pipeline", "serving_indexes", "rest_transport", "rest_serving_ops", "curation_at_scale", "telemetry_and_maintenance"]
)
def test_example(spark, tmp_path, mod):
    m = importlib.import_module(mod)
    if mod == "join_two_clusters":
        m.main(spark, root1=str(tmp_path / "c1"), root2=str(tmp_path / "c2"))
    elif mod in ("data_pipeline", "corpus_to_training", "corpus_quality_report"):
        m.main(spark)
    else:
        m.main(spark, root=str(tmp_path))
