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


class _RecordingFs:
    """Delegates to the real local FS but records every call — proves the
    export touches the filesystem ONLY through the seam."""

    def __init__(self):
        from datalake_iceberg_spark.fs import LocalFilesystem

        self._inner = LocalFilesystem()
        self.calls: list[str] = []

    def __getattr__(self, name):
        fn = getattr(self._inner, name)
        if callable(fn):
            def wrapped(*a, **kw):
                self.calls.append(name)
                return fn(*a, **kw)
            return wrapped
        return fn


def test_manifest_goes_through_fs_seam(docs, tmp_path):
    fs = _RecordingFs()
    m = write_training_shards(docs, str(tmp_path / "seam"), 4, by=["doc_id"], fs=fs)
    # listing, sizing, footer reads, and the manifest write all recorded
    for op in ("listdir", "size", "open_input", "replace_atomic"):
        assert op in fs.calls, (op, set(fs.calls))
    assert m["total_rows"] > 0


def test_shards_module_has_no_direct_os_access():
    """The module must not bypass the seam with os.* / open() — the
    round-3 ADVICE defect."""
    import inspect

    from datalake_iceberg_spark.ingest import shards

    src = inspect.getsource(shards)
    assert "import os" not in src
    assert "os.listdir" not in src and "os.path" not in src


def test_manifest_rows_match_footers(spark, docs, tmp_path):
    """Row counts come from the written files, not a source re-scan."""
    out = str(tmp_path / "footer")
    m = write_training_shards(docs, out, 4, by=["doc_id"])
    back = spark.read.parquet(out)
    per_shard = {
        str(r["_shard"]): r["n"]
        for r in back.groupBy("_shard").agg(F.count("*").alias("n")).collect()
    }
    assert {k: v["rows"] for k, v in m["shards"].items()} == per_shard


def test_sorted_export_disjoint_ordered_ranges(spark, tmp_path):
    from datalake_iceberg_spark.ingest.shards import write_sorted_export

    df = spark.range(0, 10_000).selectExpr(
        "pmod(xxhash64(id), 10000) AS k", "id AS payload"
    )
    out = str(tmp_path / "sorted")
    man = write_sorted_export(df, out, n_shards=8, order_by=["k"])
    assert man["total_rows"] == 10_000
    shards = [m for _, m in sorted(man["shards"].items())]
    assert len(shards) == 8
    # files sort lexicographically by partition index -> ranges ordered
    ordered = sorted(shards, key=lambda m: m["min"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["max"] <= b["min"]  # disjoint ranges
    # within a shard the rows are sorted on the key
    first = sorted(man["shards"])[0]
    rows = [r.k for r in spark.read.parquet(f"{out}/{first}").collect()]
    assert rows == sorted(rows)
    # roughly balanced (range sampler targets equal rows)
    sizes = [m["rows"] for m in shards]
    assert max(sizes) < 3 * min(sizes)


def test_sorted_export_validates_columns(spark, tmp_path):
    import pytest as _pytest

    from datalake_iceberg_spark.ingest.shards import write_sorted_export

    df = spark.range(10)
    with _pytest.raises(ValueError, match="order_by columns"):
        write_sorted_export(df, str(tmp_path / "x"), 2, order_by=["nope"])
