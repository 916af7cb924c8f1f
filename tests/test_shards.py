"""Training-shard export: determinism, completeness, balance, manifest."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from datalake_iceberg_spark.ingest.shards import write_training_shards


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_export_complete_and_deterministic(spark, docs, tmp_path):
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = write_training_shards(docs, out1, 8, by=["doc_id"])
    m2 = write_training_shards(docs, out2, 8, by=["doc_id"])
    assert m1["total_rows"] == docs.count()
    # identical assignment across runs
    assert {k: v["rows"] for k, v in m1["shards"].items()} == {
        k: v["rows"] for k, v in m2["shards"].items()
    }
    # round-trip: union of shards == input
    back = spark.read.parquet(out1)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.select("doc_id").distinct().count()


def test_shards_reasonably_balanced(docs, tmp_path):
    m = write_training_shards(docs, str(tmp_path / "s"), 8, by=["doc_id"])
    rows = [v["rows"] for v in m["shards"].values()]
    assert len(rows) == 8
    assert max(rows) <= 2.5 * (sum(rows) / len(rows))


def test_manifest_written_and_consistent(docs, tmp_path):
    out = str(tmp_path / "s")
    m = write_training_shards(docs, out, 4)
    with open(os.path.join(out, "manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk == m
    assert on_disk["n_shards"] == 4
    assert on_disk["total_bytes"] > 0
    assert all(v["files"] >= 1 for v in on_disk["shards"].values())


def test_validations(docs, tmp_path):
    with pytest.raises(ValueError):
        write_training_shards(docs, str(tmp_path / "x"), 0)
    with pytest.raises(ValueError):
        write_training_shards(docs, str(tmp_path / "y"), 4, by=["nope"])
