"""Lifecycle walk for the persisted BM25 text index: create on a seed
corpus → grow via add() batches (replay-idempotent mid-walk) → search
equals BOTH a from-scratch index on the full corpus (the incremental
build leaves no trace) AND an exact pure-Python BM25 oracle replicating
the engine's formula bit-for-bit (Lucene idf ln(1+(N-df+0.5)/(df+0.5)),
k1=1.2 b=0.75, score rounded @6dp for ties then @4dp for presentation,
ties doc_id asc).

test_text_index.py pins the per-op contracts; this drives the arc a
serving deployment runs — the same closure the IvfIndex/IvfPqIndex
walks give the ANN stack."""

from __future__ import annotations

import math

import pytest

from datalake_iceberg_spark.ops.text_index import TextIndex
from datalake_iceberg_spark.queries.textops import BM25_B, BM25_K1
from datalake_iceberg_spark.tables import LakeCatalog

WORDS = ["merge", "scan", "filter", "sort", "stream", "batch", "spark",
         "index", "query", "join"]


@pytest.fixture()
def catalog(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "warehouse"))


def _corpus(n_docs):
    """Deterministic docs with varied lengths, term frequencies and
    document frequencies (word w appears in doc d iff d % (w+2) == 0,
    repeated 1 + (d+w) % 3 times)."""
    docs = []
    for d in range(n_docs):
        toks = []
        for w, word in enumerate(WORDS):
            if d % (w + 2) == 0:
                toks += [word] * (1 + (d + w) % 3)
        docs.append((d, " ".join(toks) or "spark"))
    return docs


def _bm25_oracle(docs, queries, top_k):
    """Exact replication of TextIndex.search's scoring contract."""
    toks = {d: text.split() for d, text in docs}
    dl = {d: len(t) for d, t in toks.items()}
    n_docs = len(docs)
    avgdl = sum(dl.values()) / n_docs
    out = {}
    for qid, qtext in queries:
        scores = {}
        for term in qtext.lower().split():
            df = sum(1 for t in toks.values() if term in t)
            if not df:
                continue
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for d, t in toks.items():
                tf = t.count(term)
                if not tf:
                    continue
                denom = tf + BM25_K1 * (1 - BM25_B + BM25_B * dl[d] / avgdl)
                scores[d] = scores.get(d, 0.0) + idf * tf * (BM25_K1 + 1) / denom
        ranked = sorted(
            ((round(s, 6), d) for d, s in scores.items()),
            key=lambda x: (-x[0], x[1]),
        )[:top_k]
        out[qid] = [(d, round(s6, 4)) for s6, d in ranked]
    return out


def test_text_index_lifecycle_walk(spark, catalog):
    docs = _corpus(60)
    seed, batch1, batch2 = docs[:30], docs[30:45], docs[45:]

    def df_of(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    # ---- create on the seed corpus, grow in two batches
    idx = TextIndex.create(catalog, "tiwalk", df_of(seed), n_buckets=8)
    assert idx.docs.read().count() == len(seed)
    r1 = idx.add(df_of(batch1))
    assert r1 == {"batch_docs": 15, "added": 15, "already_indexed": 0}
    # mid-walk replay: a re-delivered batch adds nothing
    assert idx.add(df_of(batch1))["added"] == 0
    # overlapping redelivery: half old half new
    r2 = idx.add(df_of(batch1[-5:] + batch2))
    assert r2 == {"batch_docs": 20, "added": 15, "already_indexed": 5}
    assert idx.docs.read().count() == len(docs)

    # ---- search parity: incremental == from-scratch == exact oracle
    queries = [
        (0, "merge scan"),
        (1, "spark index query"),
        (2, "stream filter sort join batch"),
        (3, "nosuchtoken merge"),
    ]
    scratch = TextIndex.create(catalog, "tiwalk_s", df_of(docs), n_buckets=8)
    got = {
        qid: [(r.doc_id, r.score) for r in rows]
        for qid, rows in _by_query(idx.search(queries, top_k=5)).items()
    }
    got_scratch = {
        qid: [(r.doc_id, r.score) for r in rows]
        for qid, rows in _by_query(scratch.search(queries, top_k=5)).items()
    }
    assert got == got_scratch
    expect = _bm25_oracle(docs, queries, top_k=5)
    assert got == {q: v for q, v in expect.items() if v}

    # ranks are dense and 1-based per query
    for qid, rows in _by_query(idx.search(queries, top_k=5)).items():
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))

    # ---- maintenance end-state: tables healthy
    for t in (idx.postings, idx.docs):
        rep = t.fsck(deep=True)
        assert rep["ok"], rep


def _by_query(result_df):
    out = {}
    for r in result_df.orderBy("query_id", "rank").collect():
        out.setdefault(r.query_id, []).append(r)
    return out
