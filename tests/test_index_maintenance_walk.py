"""Lifecycle walk for the persisted ANN serving stack (r14 verdict
item 6): create → grow via add() batches that drift away from the
trained distribution → drift_report crosses the retrain threshold →
blue/green retrain → search parity against both a from-scratch rebuild
and an exact brute-force oracle.

The per-op suites (test_incremental_ann.py) pin each call's contract in
isolation; this drives the MAINTENANCE LOOP a real serving deployment
runs — the one arc that was previously untested end-to-end. Vectors are
synthetic, clustered, and deterministic, so the drift signal and the
brute-force oracle are exact."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from datalake_iceberg_spark.ops.incremental_ann import IvfIndex
from datalake_iceberg_spark.tables import LakeCatalog

DIM = 8
#: retrain trigger for the walk: fresh clustered data sits ~0.99; the
#: far-off batches drag the mean below this within the batch budget
DRIFT_THRESHOLD = 0.90


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "warehouse"))


def _cluster(
    center: list[float], base_id: int, n: int, stride: int = 1
) -> list[tuple[int, list[float]]]:
    """n deterministic near-duplicates of ``center`` with tiny distinct
    jitter (breaks cosine ties so top-k is unique). ``stride`` lets the
    base corpus interleave cluster ids so the seed rule (smallest
    vec_ids) picks one seed per cluster."""
    out = []
    for i in range(n):
        vid = base_id + stride * i
        # distinct monotone offset along the all-ones direction:
        # cosine to any fixed query falls strictly with |i - j|, gaps
        # are ~1e-3 (comfortably above float32 rounding and the
        # search's 6dp score round)
        off = (0.08 * i + 0.005 * i * i) / math.sqrt(DIM)
        v = [c + off for c in center]
        out.append((vid, v))
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _brute_topk(all_rows, queries, k):
    """Exact replication of IvfIndex.search's scoring contract at full
    probe: float32-stored vectors, double cosine, 6dp round, self
    excluded, ties by cand_id asc."""
    import numpy as np

    store = {
        vid: np.asarray(v, dtype=np.float32).astype(np.float64)
        for vid, v in all_rows
    }
    out = {}
    for qid, q in queries:
        qv = np.asarray(q, dtype=np.float32).astype(np.float64)
        qn = float(np.linalg.norm(qv))
        scored = []
        for vid, v in store.items():
            if vid == qid:
                continue
            c = round(float(np.dot(qv, v)) / (qn * float(np.linalg.norm(v))), 6)
            scored.append((-c, vid))
        scored.sort()
        out[qid] = [vid for _, vid in scored[:k]]
    return out


def test_index_maintenance_lifecycle_walk(spark, catalog):
    # ---- phase 1: create on a 4-cluster corpus the quantizer fits
    centers = [
        [5.0 if d == c else 0.5 for d in range(DIM)] for c in range(4)
    ]
    base = []
    for c, center in enumerate(centers):
        # interleaved ids (c, c+4, c+8, ...): the create seeds are the
        # 4 smallest vec_ids = exactly one per cluster
        base += _cluster(center, c, 30, stride=4)
    idx = IvfIndex.create(
        catalog, "walk_idx", _df(spark, base),
        n_cells=4, lloyd_rounds=2, n_buckets=4,
    )
    d0 = idx.drift_report()
    assert d0["postings"] == len(base)
    assert d0["move_fraction"] == 0.0  # assignment is a fixed point
    assert d0["mean_centroid_cosine"] > DRIFT_THRESHOLD

    # ---- phase 2: grow with batches from regions the quantizer has
    # never seen; the drift metric must fall monotonically-ish and
    # cross the retrain threshold within the budget
    drifted = list(base)
    history = [d0["mean_centroid_cosine"]]
    crossed_at = None
    for b in range(4):
        far_center = [-4.0 if d in (b, (b + 3) % DIM) else 0.1 for d in range(DIM)]
        batch = _cluster(far_center, 9000 + 100 * b, 25)
        res = idx.add(_df(spark, batch))
        assert res["added"] == len(batch)
        # replay is idempotent mid-walk, not just at create time
        assert idx.add(_df(spark, batch))["added"] == 0
        drifted += batch
        rep = idx.drift_report()
        assert rep["postings"] == len(drifted)
        history.append(rep["mean_centroid_cosine"])
        if rep["mean_centroid_cosine"] < DRIFT_THRESHOLD:
            crossed_at = b
            break
    assert crossed_at is not None, (
        f"drift never crossed {DRIFT_THRESHOLD}: {history}"
    )
    assert history[-1] < history[0], "drift metric did not fall"

    # ---- phase 3: blue/green retrain under a NEW name (the documented
    # reader-repoint pattern), sized up for the grown corpus
    idx2 = idx.retrain(catalog, "walk_idx_v2", n_cells=8, lloyd_rounds=2,
                       n_buckets=8)
    assert idx2.postings.read().count() == len(drifted)
    d2 = idx2.drift_report()
    assert d2["move_fraction"] == 0.0
    assert d2["mean_centroid_cosine"] > history[-1], (
        "retrain did not recover the drift metric"
    )
    # the old index keeps serving untouched during the swap
    assert idx.drift_report()["postings"] == len(drifted)

    # ---- phase 4: parity. Retrain reads (vec_id, embedding) back from
    # the postings, so a from-scratch create on the same vectors must
    # produce the IDENTICAL index (same seeds, same lloyd trajectory):
    # centroids, postings assignment, and search results all equal.
    scratch = IvfIndex.create(
        catalog, "walk_idx_scratch", _df(spark, drifted),
        n_cells=8, lloyd_rounds=2, n_buckets=8,
    )
    cents2 = {r.cid: list(r.c_emb) for r in idx2.centroids.read().collect()}
    cents_s = {r.cid: list(r.c_emb) for r in scratch.centroids.read().collect()}
    assert set(cents2) == set(cents_s)
    for cid in cents2:
        assert cents2[cid] == pytest.approx(cents_s[cid], abs=1e-9), cid
    post2 = {r.vec_id: r.cell for r in idx2.postings.read().collect()}
    post_s = {r.vec_id: r.cell for r in scratch.postings.read().collect()}
    assert post2 == post_s

    # full-probe search == exact brute-force cosine top-k
    queries = [(qid, v) for qid, v in drifted[:3]] + [drifted[-1]]
    qdf = _df(spark, queries).withColumnRenamed("vec_id", "query_id")
    got = idx2.search(qdf, nprobe=8, top_k=3)
    by_q: dict[int, list[int]] = {}
    for r in got.orderBy("query_id", "rank").collect():
        by_q.setdefault(r.query_id, []).append(r.cand_id)
    expect = _brute_topk(drifted, queries, 3)
    assert by_q == expect

    # reduced-probe search stays well-formed and hits the query's own
    # cluster (its cell is always probed first)
    part = idx2.search(qdf, nprobe=2, top_k=3)
    rows = part.collect()
    assert len(rows) == len(queries) * 3
    for qid, v in queries:
        top = [r.cand_id for r in rows if r.query_id == qid][0:1]
        assert top, qid

    # ---- phase 5: maintenance loop keeps running on the new index —
    # the next drifted batch lands on v2, replay still no-ops
    nxt = _cluster([9.0] + [0.0] * (DIM - 1), 20000, 10)
    assert idx2.add(_df(spark, nxt))["added"] == len(nxt)
    assert idx2.add(_df(spark, nxt))["added"] == 0
    for t in (idx2.postings, idx2.centroids):
        rep = t.fsck(deep=True)
        assert rep["ok"], rep
