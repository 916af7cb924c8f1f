"""Table-property-driven writer options and maintenance ergonomics:
``write.parquet.compression-codec``, ``expire_snapshots(older_than=)``,
``remove_orphan_files(dry_run=)``.
"""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row

from datalake_iceberg_spark.tables import LakeCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "warehouse"))


def _mk(catalog, spark, name, props=None, n=200):
    df = spark.createDataFrame([Row(id=i, v=f"x{i}") for i in range(n)])
    return catalog.create_or_replace(
        name, df, key=["id"], n_buckets=4, properties=props
    )


def _codecs(table):
    out = set()
    for f in glob.glob(f"{table.location}/data/*/**/*.parquet", recursive=True):
        md = pq.ParquetFile(f).metadata
        for g in range(md.num_row_groups):
            out.add(md.row_group(g).column(0).compression)
    return out


def test_compression_codec_property_applies_to_all_writes(catalog, spark):
    t = _mk(catalog, spark, "db.z",
            props={"write.parquet.compression-codec": "zstd"})
    t.append(spark.createDataFrame([Row(id=1000, v="a")]))
    t.merge(spark.createDataFrame([Row(id=0, v="patched")]))
    t.rewrite_data_files()
    t.expire_snapshots()
    t.remove_orphan_files()
    assert _codecs(t) == {"ZSTD"}
    assert {r["v"] for r in t.lookup(
        spark.createDataFrame([Row(id=0)])).collect()} == {"patched"}


def test_default_codec_unchanged(catalog, spark):
    t = _mk(catalog, spark, "db.s")
    assert "ZSTD" not in _codecs(t)


def test_expire_older_than_keeps_recent(catalog, spark):
    t = _mk(catalog, spark, "db.e")
    for i in range(3):
        t.append(spark.createDataFrame([Row(id=1000 + i, v="a")]))
    # cutoff before any commit: nothing expires even with keep_last=1
    out = t.expire_snapshots(keep_last=1, older_than="1990-01-01T00:00:00")
    assert out["expired_snapshots"] == 0
    assert t.read(version=0).count() == 200  # still travelable
    # cutoff in the far future: falls back to keep_last semantics
    out = t.expire_snapshots(keep_last=1, older_than="9999-01-01T00:00:00")
    assert out["expired_snapshots"] == 3
    with pytest.raises(ValueError, match="no snapshot"):
        t.snapshot(0)


def test_orphan_dry_run_reports_without_deleting(catalog, spark):
    t = _mk(catalog, spark, "db.g")
    _mk(catalog, spark, "db.g")  # replace: the first commit dir dies
    t.expire_snapshots(keep_last=1)
    dry = t.remove_orphan_files(dry_run=True)
    assert dry["orphan_dirs_removed"] == 0
    assert len(dry["orphan_dirs_found"]) >= 1
    # nothing was touched: a real pass still finds the same dirs
    real = t.remove_orphan_files()
    assert real["orphan_dirs_removed"] == len(dry["orphan_dirs_found"])
    assert t.read().count() == 200
