"""Lifecycle walk for the persisted MinHash dedup index — completing
the set (IvfIndex, IvfPqIndex, TextIndex walks): bootstrap on a seed
corpus → daily dedup_batch() ingests mixing fresh docs, exact dups of
indexed docs, and in-batch dups → replay idempotence mid-walk → final
index state identical to a from-scratch create over exactly the
admitted corpus → probe symmetry.

Docs are built from per-doc-unique vocabularies, so the only LSH
collisions are the intended exact-duplicate ones — the walk is fully
deterministic without relying on hash accidents."""

from __future__ import annotations

import pytest

from datalake_iceberg_spark.ops.incremental_dedup import SignatureIndex
from datalake_iceberg_spark.tables import LakeCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "warehouse"))


def _doc(i):
    """5 words (3 shingles), vocabulary unique to doc i."""
    return (i, " ".join(f"w{i}{c}" for c in "abcde"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _state(idx):
    sigs = {
        r.doc_id: tuple(r[f"sig_{i}"] for i in range(8))
        for r in idx.table.read().collect()
    }
    bands = {(r.band_hash, r.doc_id) for r in idx.bands.read().collect()}
    return sigs, bands


def test_signature_index_lifecycle_walk(spark, catalog):
    seed = [_doc(i) for i in range(20)]
    idx = SignatureIndex.create(catalog, "sigwalk", _df(spark, seed),
                                n_buckets=8)
    assert idx.table.read().count() == len(seed)

    # ---- day 1: 5 fresh + 3 exact dups of indexed docs
    fresh1 = [_doc(i) for i in range(100, 105)]
    dups1 = [(200 + j, seed[j][1]) for j in range(3)]
    r1 = idx.dedup_batch(_df(spark, fresh1 + dups1), count_index=True)
    assert r1 == {
        "batch_docs": 8, "near_dups_dropped": 3, "admitted": 5,
        "index_docs": 25,
    }

    # ---- replay of day 1 mid-walk: the dups still report as dups, the
    # already-admitted docs self-collide but are NOT dups, and nothing
    # is added — the index converges
    bands_before = idx.bands.read().count()
    r1b = idx.dedup_batch(_df(spark, fresh1 + dups1), count_index=True)
    assert r1b == r1
    assert idx.bands.read().count() == bands_before

    # ---- day 2 with in-batch collapse: 301 duplicates 300 (greedy
    # keep-first), 302 is fresh
    batch2 = [_doc(300), (301, _doc(300)[1]), _doc(302)]
    r2 = idx.dedup_batch(_df(spark, batch2), collapse_batch=True,
                         count_index=True)
    assert r2 == {
        "batch_docs": 3, "near_dups_dropped": 1, "admitted": 2,
        "index_docs": 27,
    }

    # ---- probe is read-only and symmetric: an exact copy of doc 5
    # collides with doc 5 (and with nothing else)
    hits = idx.probe(_df(spark, [(999, seed[5][1])])).collect()
    assert {(r.batch_doc, r.index_doc) for r in hits} == {(999, 5)}
    assert idx.table.read().count() == 27  # probe did not mutate

    # ---- parity: the incrementally-built index equals a from-scratch
    # create over exactly the admitted corpus
    admitted = seed + fresh1 + [_doc(300), _doc(302)]
    scratch = SignatureIndex.create(
        catalog, "sigwalk_s", _df(spark, admitted), n_buckets=8
    )
    assert _state(idx) == _state(scratch)

    for t in (idx.table, idx.bands):
        rep = t.fsck(deep=True)
        assert rep["ok"], rep
