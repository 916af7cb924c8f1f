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
    """The METADATA plane (manifests, listings, sizes) must not bypass
    the fs seam with os.* — the round-3 ADVICE defect. The executor-side
    tar closure is DATA-plane code (like Spark's own parquet tasks) and
    is allowed exactly one os usage: the attempt-temp → final
    ``os.replace`` that makes task retries corruption-safe (r7 ADVICE)."""
    import inspect

    from datalake_iceberg_spark.ingest import shards

    src = inspect.getsource(shards)
    assert "os.listdir" not in src and "os.path" not in src
    # every `import os` sits inside the executor closure, for os.replace
    closure = inspect.getsource(shards.write_webdataset_shards)
    assert src.count("import os") == closure.count("import os") == 1
    assert src.count("os.replace") == 1 and "os.replace" in closure


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


# ------------------------------------------------------ webdataset export


def test_webdataset_shards_roundtrip(spark, tmp_path):
    import tarfile

    from pyspark.sql import Row

    from datalake_iceberg_spark.ingest.shards import write_webdataset_shards

    rows = [
        Row(doc_id=i, payload=bytes([i % 256] * (10 + i)), text=f"t{i}",
            lang="en" if i % 2 else "ko", n_chars=10 + i)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    out = str(tmp_path / "wds")
    man = write_webdataset_shards(
        df, out, n_shards=4, key_col="doc_id",
        payload_cols={"payload": "bin", "text": "txt"},
        meta_cols=["lang", "n_chars"],
    )
    assert man["total_samples"] == 40
    assert set(man["shards"]) <= {f"shard-{i:05d}.tar" for i in range(4)}
    # every sample's members are present, grouped, and byte-correct
    seen = {}
    import json as _json

    for tar_name in man["shards"]:
        with tarfile.open(str(tmp_path / "wds" / tar_name)) as tf:
            names = tf.getnames()
            # members of one key are consecutive (loader contract)
            keys_in_order = [n.split(".")[0] for n in names]
            for i in range(1, len(keys_in_order) - 1):
                if keys_in_order[i] != keys_in_order[i - 1]:
                    assert keys_in_order[i - 1] not in keys_in_order[i:]
            for n in names:
                data = tf.extractfile(n).read()
                key, ext = n.split(".", 1)
                seen.setdefault(int(key), {})[ext] = data
    assert set(seen) == set(range(40))
    for i, members in seen.items():
        assert members["bin"] == bytes([i % 256] * (10 + i))
        assert members["txt"] == f"t{i}".encode()
        meta = _json.loads(members["json"])
        assert meta == {"lang": "en" if i % 2 else "ko", "n_chars": 10 + i}


def test_webdataset_export_is_deterministic(spark, tmp_path):
    import hashlib

    from pyspark.sql import Row

    from datalake_iceberg_spark.ingest.shards import write_webdataset_shards

    rows = [Row(doc_id=i, text=f"body {i}") for i in range(25)]

    def digest(out_dir, order):
        df = spark.createDataFrame([rows[j] for j in order])
        man = write_webdataset_shards(
            df, str(out_dir), n_shards=3, key_col="doc_id",
            payload_cols={"text": "txt"},
        )
        h = hashlib.sha256()
        for tar_name in sorted(man["shards"]):
            h.update((out_dir / tar_name).read_bytes())
        return h.hexdigest()

    import random

    shuffled = list(range(25))
    random.Random(3).shuffle(shuffled)
    d1 = digest(tmp_path / "a", list(range(25)))
    d2 = digest(tmp_path / "b", shuffled)
    assert d1 == d2  # same data, any row order -> byte-identical tars


def test_webdataset_no_temp_files_and_retry_safe_naming(spark, tmp_path):
    """Tars are staged under attempt-unique temp names and renamed into
    place at task end, so task retries / speculative attempts never
    append to the same file. After export the directory holds ONLY
    complete final tars + the manifest — no *.tmp leftovers — and a
    re-export over the same final paths (the retry-after-success shape)
    replaces them atomically with identical bytes."""
    import tarfile

    from pyspark.sql import Row

    from datalake_iceberg_spark.ingest.shards import write_webdataset_shards

    rows = [Row(doc_id=i, text=f"b{i}") for i in range(20)]
    df = spark.createDataFrame(rows)
    out = tmp_path / "wds_tmpsafe"
    write_webdataset_shards(
        df, str(out), n_shards=2, key_col="doc_id", payload_cols={"text": "txt"}
    )
    names = sorted(p.name for p in out.iterdir())
    assert names == ["manifest.json", "shard-00000.tar", "shard-00001.tar"]
    before = {n: (out / n).read_bytes() for n in names if n.endswith(".tar")}
    # second attempt over existing finals: os.replace, not append/corrupt
    write_webdataset_shards(
        df, str(out), n_shards=2, key_col="doc_id", payload_cols={"text": "txt"}
    )
    for n, b in before.items():
        assert (out / n).read_bytes() == b
        with tarfile.open(str(out / n)) as tf:  # still a valid tar
            assert tf.getnames()


def test_webdataset_roundtrip_reader(spark, tmp_path):
    """write -> read_webdataset_shards reproduces every sample's
    members and metadata exactly."""
    import json as _json

    from pyspark.sql import Row

    from datalake_iceberg_spark.ingest.shards import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    rows = [
        Row(doc_id=i, payload=bytes([i] * (5 + i)), text=f"t{i}", lang="en")
        for i in range(12)
    ]
    out = str(tmp_path / "wds_rt")
    write_webdataset_shards(
        spark.createDataFrame(rows), out, n_shards=3, key_col="doc_id",
        payload_cols={"payload": "bin", "text": "txt"}, meta_cols=["lang"],
    )
    back = read_webdataset_shards(spark, out).collect()
    assert len(back) == 12
    by_key = {int(r.key): r for r in back}
    for i in range(12):
        r = by_key[i]
        assert r.members["bin"] == bytes([i] * (5 + i))
        assert r.members["txt"] == f"t{i}".encode()
        assert _json.loads(r.meta) == {"lang": "en"}
        assert "json" not in r.members


def test_webdataset_dotted_keys_roundtrip(spark, tmp_path):
    """Keys containing '.' round-trip when our manifest names the
    extension set (longest-known-suffix split); WebDataset's first-dot
    convention alone would truncate 'doc.v2' to 'doc'."""
    from pyspark.sql import Row

    from datalake_iceberg_spark.ingest.shards import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    rows = [
        Row(doc_id=f"doc.v{i}.rev{i % 2}", payload=bytes([i] * 4), text=f"t{i}")
        for i in range(6)
    ]
    out = str(tmp_path / "wds_dot")
    write_webdataset_shards(
        spark.createDataFrame(rows), out, n_shards=2, key_col="doc_id",
        # multi-dot extension exercises longest-suffix matching too
        payload_cols={"payload": "seg.bin", "text": "txt"},
    )
    back = read_webdataset_shards(spark, out).collect()
    assert len(back) == 6
    keys = {r.key for r in back}
    assert keys == {f"doc.v{i}.rev{i % 2}" for i in range(6)}
    for r in back:
        assert set(r.members) == {"seg.bin", "txt"}
