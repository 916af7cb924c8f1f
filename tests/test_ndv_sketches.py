"""NDV sketches (r13) — ``analyze_ndv`` / ``approx_ndv``, the Iceberg
Puffin / ``compute_table_stats`` analogue on Spark's Datasketches HLL.

Contract under test:
- estimates track exact ``COUNT(DISTINCT col)`` within HLL tolerance
  for every supported type (native + injective string casts);
- analyze is INCREMENTAL over immutable dirs (re-analyze scans only
  dirs added since the last analyze — pinned via the commit summary);
- the hybrid path under a live MoR delete era excludes masked rows;
- sidecars are swept by ``remove_orphan_files`` only once unreferenced,
  survive while referenced, and a vanished sidecar degrades to
  recompute (never a wrong answer) + an fsck finding;
- clones and column renames drop the pointer instead of serving stale
  sketches.
"""

import os

import pytest
from pyspark.sql import functions as F

from datalake_iceberg_spark.tables import NDV_SIDECAR_DIR, LakeCatalog

TOL = 0.06  # 3.5+ sigma at lg_k=12 (RSE ~1.6%)


def _close(est: int, exact: int) -> bool:
    return exact == 0 and est == 0 or abs(est - exact) <= TOL * exact


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "wh"))


def _mk(catalog, spark, name, n=4000):
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 313).alias("grp"),
        F.concat(F.lit("u"), (F.col("id") % 771).cast("string")).alias("user"),
        (F.col("id") % 57 / 7.0).alias("dbl"),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   (F.col("id") % 365).cast("int")).alias("dt"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id") % 23).alias("with_nulls"),
    )
    return catalog.create_or_replace(name, df, key=["k"], n_buckets=4)


def test_estimates_track_exact_all_types(catalog, spark):
    t = _mk(catalog, spark, "db.ndv")
    t.analyze_ndv(["grp", "user", "dbl", "dt", "with_nulls", "k"])
    exact = t.read().agg(
        *[F.countDistinct(c).alias(c)
          for c in ("grp", "user", "dbl", "dt", "with_nulls", "k")]
    ).first()
    for c in ("grp", "user", "dbl", "dt", "with_nulls", "k"):
        assert _close(t.approx_ndv(c), exact[c]), (
            c, t.approx_ndv(c), exact[c])


def test_unanalyzed_column_degrades_to_scan_sketch(catalog, spark):
    t = _mk(catalog, spark, "db.ndvu")
    assert _close(t.approx_ndv("grp"), 313)
    assert t.snapshot().ndv == {}  # approx alone never commits


def test_analyze_is_incremental_and_version_pinned(catalog, spark):
    t = _mk(catalog, spark, "db.ndvi")
    s1 = t.analyze_ndv(["user"])
    n_dirs_full = s1.summary["scanned_dirs"]["user"]
    assert n_dirs_full == len(s1.all_dirs())
    v_analyzed = t.current_version()
    t.append(spark.range(4000, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 313).alias("grp"),
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("user"),
        F.lit(1.0).alias("dbl"), F.lit("2025-01-01").cast("date").alias("dt"),
        F.lit(None).cast("bigint").alias("with_nulls")))
    # fresh-delta path: estimate reflects the new rows pre-re-analyze
    assert _close(t.approx_ndv("user"), 771 + 1000)
    s2 = t.analyze_ndv(["user"])
    # only the appended dirs were scanned — incremental by construction
    assert 0 < s2.summary["scanned_dirs"]["user"] < n_dirs_full + 1
    assert s2.summary["scanned_dirs"]["user"] == len(
        set(s2.all_dirs()) - set(s1.all_dirs()))
    assert _close(t.approx_ndv("user"), 1771)
    # time travel: the pinned version answers with its own coverage
    assert _close(t.approx_ndv("user", version=v_analyzed), 771)


def test_hybrid_under_live_mor_era_and_fold(catalog, spark):
    t = _mk(catalog, spark, "db.ndvm")
    t.analyze_ndv(["grp"])
    t.delete_keys(
        spark.range(0, 4000).select(F.col("id").alias("k"))
        .where("k % 313 < 200"),  # kill grp values 0..199 entirely
        mode="merge-on-read",
    )
    assert t.snapshot().deletes  # era live -> hybrid path
    exact = t.read().agg(F.countDistinct("grp")).first()[0]
    assert exact == 113
    assert _close(t.approx_ndv("grp"), exact)
    # analyze under the era skips masked dirs rather than caching
    # sketches that cannot subtract masked rows
    s = t.analyze_ndv(["grp"])
    assert s.summary["skipped_masked_dirs"] > 0
    t.rewrite_position_delete_files()
    assert not t.snapshot().deletes
    assert _close(t.approx_ndv("grp"), exact)
    # post-fold analyze covers the rewritten dirs; estimate unchanged
    t.analyze_ndv(["grp"])
    assert _close(t.approx_ndv("grp"), exact)


def test_sidecar_gc_and_vanished_sidecar_degrades(catalog, spark):
    t = _mk(catalog, spark, "db.ndvg")
    t.analyze_ndv(["grp"])
    t.analyze_ndv(["user"])  # second sidecar, both referenced
    root = os.path.join(t.location, NDV_SIDECAR_DIR)
    before = set(os.listdir(root))
    assert len(before) == 2
    # referenced sidecars survive GC
    res = t.remove_orphan_files(older_than_s=0.0)
    assert res["orphan_ndv_sidecars_removed"] == 0
    assert set(os.listdir(root)) == before
    # re-analyze supersedes the grp sidecar; expire + GC sweeps the old
    t.append(spark.range(99999, 100000).select(
        F.col("id").alias("k"), F.lit(7).cast("bigint").alias("grp"),
        F.lit("x").alias("user"), F.lit(0.0).alias("dbl"),
        F.lit(None).cast("date").alias("dt"),
        F.lit(None).cast("bigint").alias("with_nulls")))
    t.analyze_ndv(["grp"])
    t.expire_snapshots(keep_last=1)
    res = t.remove_orphan_files(older_than_s=0.0)
    assert res["orphan_ndv_sidecars_removed"] >= 1
    live_rels = set(t.snapshot().ndv.values())
    assert {os.path.join(NDV_SIDECAR_DIR, e) for e in os.listdir(root)} == live_rels
    # vanished sidecar: cosmetic fsck finding + graceful recompute
    import shutil

    shutil.rmtree(os.path.join(t.location, t.snapshot().ndv["user"]))
    rep = t.fsck()
    assert rep["ok"] and rep["missing_ndv_sidecars"] == ["user"]
    assert _close(t.approx_ndv("user"), 772)


def test_in_flight_analyze_sidecar_protected_by_grace(catalog, spark):
    """A sidecar written moments ago (an analyze whose commit hasn't
    published yet) must survive a concurrent default-grace GC."""
    t = _mk(catalog, spark, "db.ndvf")
    t.analyze_ndv(["grp"])
    t.expire_snapshots(keep_last=1)
    # make the current pointer dangle-free but drop the reference by
    # simulating: fresh unreferenced sidecar dir (in-flight analyze)
    os.makedirs(os.path.join(t.location, NDV_SIDECAR_DIR, "inflight-x"))
    res = t.remove_orphan_files(dry_run=True)  # default grace
    assert "inflight-x" not in res["orphan_ndv_sidecars_found"]
    res = t.remove_orphan_files(dry_run=True, older_than_s=0.0)
    assert "inflight-x" in res["orphan_ndv_sidecars_found"]


def test_rename_drops_pointer_and_clone_starts_clean(catalog, spark):
    t = _mk(catalog, spark, "db.ndvr")
    t.analyze_ndv(["grp", "user"])
    t.rename_column("grp", "grp2")
    snap = t.snapshot()
    assert "grp" not in snap.ndv and "grp2" not in snap.ndv
    assert "user" in snap.ndv  # untouched column keeps its sketches
    assert _close(t.approx_ndv("grp2"), 313)  # recompute path, correct
    c = catalog.clone_table("db.ndvr", "db.ndvr_clone")
    assert c.snapshot().ndv == {}  # relative pointers don't transfer
    assert _close(c.approx_ndv("user"), 771)
