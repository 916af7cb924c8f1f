"""LakeTable.fsck — read-only manifest<->disk integrity audit (r11)."""

import pytest
from pyspark.sql import Row

from datalake_iceberg_spark.tables import LakeCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "wh"))


def _mk(catalog, spark, name, n=24):
    df = spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(n)])
    return catalog.create_or_replace(name, df, key=["id"], n_buckets=4)


def test_fsck_clean_table_ok_including_deep(catalog, spark):
    t = _mk(catalog, spark, "db.f1")
    t.merge(spark.createDataFrame([Row(id=1, v="m"), Row(id=99, v="n")]))
    t.delete_keys(spark.createDataFrame([(2,)], "id long"), mode="merge-on-read")
    rep = t.fsck(deep=True)
    assert rep["ok"], rep
    assert rep["row_drift"] == []
    assert rep["missing_dirs"] == rep["empty_dirs"] == []
    assert rep["dangling_covers"] == [] and rep["staged_missing"] == []


def test_fsck_flags_externally_deleted_dir(catalog, spark):
    t = _mk(catalog, spark, "db.f2")
    victim = t.snapshot().all_dirs()[0]
    catalog.fs.rmtree(catalog.fs.join(t.location, victim))
    rep = t.fsck()
    assert not rep["ok"]
    assert victim in rep["missing_dirs"]


def test_fsck_flags_emptied_dir_and_staged_missing(catalog, spark):
    import os

    t = _mk(catalog, spark, "db.f3")
    doc = t.stage_append(
        spark.createDataFrame([Row(id=500, v="w")]), wap_id="aud1"
    )
    staged_dir = [d for dirs in doc["buckets"].values() for d in dirs][0]
    catalog.fs.rmtree(catalog.fs.join(t.location, staged_dir))
    victim = t.snapshot().all_dirs()[0]
    abs_victim = catalog.fs.join(t.location, victim)
    for f in os.listdir(abs_victim):
        os.remove(os.path.join(abs_victim, f))
    rep = t.fsck()
    assert not rep["ok"]
    assert victim in rep["empty_dirs"]
    assert {"wap_id": "aud1", "dir": staged_dir} in rep["staged_missing"]


def test_fsck_deep_detects_row_drift(catalog, spark):
    """Replace one dir's parquet with a differently-sized file: the
    manifest ROWS_STAT disagrees with a footer recount."""
    import os

    t = _mk(catalog, spark, "db.f4")
    d = t.snapshot().all_dirs()[0]
    abs_d = catalog.fs.join(t.location, d)
    parquets = [f for f in os.listdir(abs_d) if f.endswith(".parquet")]
    spark.createDataFrame([Row(id=9000 + i, v="x") for i in range(3)]) \
        .coalesce(1).write.mode("overwrite").parquet(str(abs_d) + "_tmp")
    new = [f for f in os.listdir(str(abs_d) + "_tmp") if f.endswith(".parquet")][0]
    for f in parquets:
        os.remove(os.path.join(abs_d, f))
    os.replace(os.path.join(str(abs_d) + "_tmp", new),
               os.path.join(abs_d, parquets[0]))
    rep = t.fsck(deep=True)
    assert not rep["ok"] or rep["row_drift"], rep
    assert any(x["dir"] == d and x["footers"] == 3 for x in rep["row_drift"])


def test_fsck_stale_stats_cosmetic_only(catalog, spark):
    """A stats key for a dead dir is reported but does not fail ok —
    simulate by injecting one into the manifest."""
    import json as _json
    import os

    from tests.conftest import tamper_manifest

    t = _mk(catalog, spark, "db.f5")
    tamper_manifest(t, lambda doc: doc.setdefault("stats", {}).update(
        {"data/c-deadbeef0000": {"id": [0, 1]}}
    ))
    rep = catalog.table("db.f5").fsck()
    assert rep["ok"]
    assert rep["stale_stats"] == ["data/c-deadbeef0000"]


def test_catalog_admin_fsck_command(catalog, spark, tmp_path, capsys):
    """Job surface: `catalog_admin fsck` audits every table in the
    schema, exits 0 when clean and 3 when any table has issues."""
    from datalake_iceberg_spark.jobs import catalog_admin

    _mk(catalog, spark, "default.fa")
    _mk(catalog, spark, "default.fb")
    args = ["fsck", "--warehouse", catalog.warehouse,
            "--env-file", str(tmp_path / "none.env"), "--json"]
    rc = catalog_admin.main(args, spark=spark)
    out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert rc == 0 and len(out) == 2
    import json as _json
    assert all(_json.loads(l)["ok"] for l in out)
    # break one table -> nonzero exit, flagged line
    t = catalog.table("default.fb")
    victim = t.snapshot().all_dirs()[0]
    catalog.fs.rmtree(catalog.fs.join(t.location, victim))
    rc = catalog_admin.main(args, spark=spark)
    out = [_json.loads(l) for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert rc == 3
    flagged = {r["table"]: r["ok"] for r in out}
    assert flagged["default.fb"] is False and flagged["default.fa"] is True


def test_catalog_admin_stats_command(catalog, spark, capsys):
    """`catalog_admin stats` reports the metadata aggregates as JSON
    lines — row count always, bounds + null count with --column."""
    import json as _json

    from datalake_iceberg_spark.jobs import catalog_admin

    df = spark.createDataFrame(
        [(i, None if i % 4 == 0 else float(i)) for i in range(16)],
        "id long, score double",
    )
    catalog.create_or_replace("db.adminstats", df, key=["id"], n_buckets=2)
    rc = catalog_admin.main(
        ["stats", "--table", "db.adminstats", "--column", "score", "--json",
         "--warehouse", catalog.warehouse],
        spark=spark,
    )
    assert rc == 0
    rec = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["row_count"] == 16
    assert rec["bounds"] == [1.0, 15.0]
    assert rec["null_count"] == 4


def test_fsck_deep_detects_bytes_drift(catalog, spark):
    """An in-place rewrite that preserves rows (valid footer, same row
    count, different encoding/size) is invisible to the row recount —
    bytes_drift is the tripwire. (A junk-tail append instead breaks the
    footer and lands in unreadable_footers; both flip ok=False.)"""
    import glob
    import os

    import pyarrow.parquet as pq

    df = spark.createDataFrame([(i, f"v{i}" * 20) for i in range(20)],
                               "id long, v string")
    t = catalog.create_or_replace("db.bdrift", df, key=["id"], n_buckets=2)
    assert t.fsck(deep=True)["bytes_drift"] == []
    victim = sorted(glob.glob(
        os.path.join(t.location, "data", "*", "**", "*.parquet"),
        recursive=True,
    ))[0]
    tbl = pq.read_table(victim)
    pq.write_table(tbl, victim, compression="none")  # same rows, new size
    rep = t.fsck(deep=True)
    assert rep["row_drift"] == []  # rows unchanged: count audit is blind
    assert [d["dir"] for d in rep["bytes_drift"]] == [
        os.path.relpath(os.path.dirname(victim), t.location)
    ]
    assert not rep["ok"]


def test_catalog_admin_stats_sweep_isolates_broken_tables(
    catalog, spark, capsys
):
    """A schema sweep keeps reporting past a table that errors (missing
    --column here) and exits 3, mirroring fsck's posture."""
    import json as _json

    from datalake_iceberg_spark.jobs import catalog_admin

    catalog.create_or_replace(
        "db.sweep_a",
        spark.createDataFrame([(1, 2.0)], "id long, score double"),
        key=["id"], n_buckets=1,
    )
    catalog.create_or_replace(
        "db.sweep_b",
        spark.createDataFrame([(1, "x")], "id long, name string"),
        key=["id"], n_buckets=1,
    )
    rc = catalog_admin.main(
        ["stats", "--schema", "db", "--column", "score", "--json",
         "--warehouse", catalog.warehouse],
        spark=spark,
    )
    assert rc == 3  # one table lacks the column
    recs = [_json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    by = {r["table"]: r for r in recs}
    assert by["db.sweep_a"]["null_count"] == 0
    assert "error" in by["db.sweep_b"] and "score" in by["db.sweep_b"]["error"]
