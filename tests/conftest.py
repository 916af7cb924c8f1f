import os

import pytest

from datalake_iceberg_spark.session import create_spark_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = create_spark_session(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def load(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tamper_manifest(t, mutate):
    """Rewrite a table's CURRENT manifest with ``mutate(doc)`` applied to
    the fully-inlined doc (bulk fields materialized from segments), then
    evict the per-fs manifest cache so readers see the tampered state —
    the segmented-manifest-era replacement for tests that used to edit
    ``v{N}.json`` in place. Writes back INLINE format (the legacy shape
    these tests simulate), which the loader handles transparently."""
    import json as _json

    import datalake_iceberg_spark.tables as _tables

    v = t.current_version()
    doc = _json.loads(t.snapshot(v).to_json())
    mutate(doc)
    mpath = t.fs.join(t.meta_dir, f"v{v}.json")
    os.remove(mpath)
    with open(mpath, "w") as f:
        f.write(_json.dumps(doc))
    _tables.evict_meta_cache(t.fs, t.meta_dir)
