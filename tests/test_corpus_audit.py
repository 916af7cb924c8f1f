"""Unit semantics for the corpus-audit layer (queries/corpus_audit.py).

Oracle parity at sf0.001 is covered by tests/test_oracle_parity.py and
plan shape by tests/test_all_plans_lint.py; here we pin the SEMANTICS
on hand-built corpora where the right answer is known in closed form.
"""

import pytest
from pyspark.sql import Row

from datalake_iceberg_spark.queries import corpus_audit as ca


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lang, source=src, n_chars=len(t))
         for i, (t, lang, src) in enumerate(rows)]
    )


def test_ngram_novelty_closed_form(spark, tmp_path, monkeypatch):
    """Force the split assignment and check the novelty arithmetic:
    test-split grams absent from train are novel."""
    docs = _docs(spark, [
        ("a b c d", "en", "s"),        # doc 0
        ("a b c e", "en", "s"),        # doc 1
        ("x y z w", "en", "s"),        # doc 2
    ])
    import pyspark.sql.functions as F
    monkeypatch.setattr(
        ca, "_split_expr",
        lambda: F.when(F.col("doc_id") < 2, "train").otherwise("test"),
    )
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: docs)
    out = {r.lang: r for r in ca.ngram_novelty(spark, "ignored").collect()}
    # test doc 2 has grams {x y z, y z w}; none occur in train
    assert out["en"].n_test_grams == 2
    assert out["en"].n_novel == 2
    assert out["en"].novelty_rate == 1.0


def test_token_gini_uniform_and_concentrated(spark, monkeypatch):
    """Gini 0 for identical doc lengths; near 1-1/n when one doc holds
    almost all tokens (exact closed forms of the rank-sum formula)."""
    uniform = _docs(spark, [("w " * 10, "en", "u")] * 4)
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: uniform)
    (row,) = ca.token_gini(spark, "ignored").collect()
    assert row.n_docs == 4 and row.gini == 0.0

    skew = _docs(
        spark,
        [("w", "en", "s"), ("w", "en", "s"), ("w", "en", "s"),
         ("w " * 97, "en", "s")],
    )
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: skew)
    (row,) = ca.token_gini(spark, "ignored").collect()
    # values 1,1,1,97: T = 1+2+3+4*97 = 394, N=4, S=100
    # gini = 2*394/400 - 5/4 = 1.97 - 1.25 = 0.72
    assert row.total_tokens == 100
    assert row.gini == pytest.approx(0.72)


def test_dup_graph_degree_bands(spark, monkeypatch):
    """Three exact-duplicate docs form a triangle (degree 2 each); two
    singletons have degree 0; bands and counts must reflect that."""
    docs = _docs(spark, [
        ("alpha beta gamma delta", "en", "s"),
        ("alpha beta gamma delta", "en", "s"),
        ("alpha beta gamma delta", "en", "s"),
        ("one two three four", "en", "s"),
        ("five six seven eight", "en", "s"),
    ])
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: docs)
    out = {r.degree_band: r.n_docs for r in
           ca.dup_graph_degree(spark, "ignored").collect()}
    assert out["2-3"] == 3
    # the two singletons may or may not band-collide with each other;
    # with distinct shingle sets they do not
    assert out.get("0", 0) == 2


def test_minhash_est_error_on_exact_duplicates(spark, monkeypatch):
    """Exact duplicates: estimated and exact Jaccard are both 1.0, so
    every error statistic is 0 — pinning sign/scale conventions."""
    docs = _docs(spark, [
        ("the quick brown fox jumps", "en", "s"),
        ("the quick brown fox jumps", "en", "s"),
    ])
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: docs)
    (row,) = ca.minhash_est_error(spark, "ignored", sample_mod=1).collect()
    assert row.n_pairs == 1
    assert row.mean_est == 1.0 and row.mean_exact == 1.0
    assert row.mean_abs_err == 0.0 and row.max_abs_err == 0.0


def test_knn_label_purity_pure_clusters(spark, monkeypatch):
    """Two well-separated label clusters: every vector's neighbors share
    its label -> purity and majority accuracy are exactly 1.0."""
    from pyspark.sql import Row

    rows = []
    for i in range(6):
        rows.append(Row(vec_id=i, embedding=[10.0 + i * 0.01, 0.1, 0.0], label=0))
    for i in range(6, 12):
        rows.append(Row(vec_id=i, embedding=[0.1, 10.0 + i * 0.01, 0.0], label=1))
    emb = spark.createDataFrame(rows)
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: emb)
    out = {r.label: r for r in ca.knn_label_purity(spark, "ignored", sample_mod=1, cand_mod=1).collect()}
    assert set(out) == {0, 1}
    for lbl in (0, 1):
        assert out[lbl].n_vecs == 6
        assert out[lbl].mean_purity == 1.0
        assert out[lbl].majority_acc == 1.0


def test_knn_label_purity_flags_mislabeled_vector(spark, monkeypatch):
    """A vector labeled 1 but embedded inside cluster 0 must drag label
    1's majority accuracy below 1 (the label-noise signal)."""
    from pyspark.sql import Row

    rows = [Row(vec_id=i, embedding=[10.0 + i * 0.01, 0.1, 0.0], label=0)
            for i in range(6)]
    rows += [Row(vec_id=i, embedding=[0.1, 10.0 + i * 0.01, 0.0], label=1)
             for i in range(6, 11)]
    rows.append(Row(vec_id=11, embedding=[10.0, 0.11, 0.0], label=1))  # mislabeled
    emb = spark.createDataFrame(rows)
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: emb)
    out = {r.label: r for r in ca.knn_label_purity(spark, "ignored", sample_mod=1, cand_mod=1).collect()}
    assert out[1].majority_acc < 1.0
    assert out[0].majority_acc == 1.0


def test_token_kl_shift_identical_split_is_zero(spark, monkeypatch):
    """Train and test drawn from the same tokens: KL is ~0; a disjoint
    test vocabulary drives KL up."""
    import pyspark.sql.functions as F
    from pyspark.sql import Row

    same = _docs(spark, [("alpha beta gamma", "en", "s")] * 10)
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: same)
    monkeypatch.setattr(
        ca, "_split_expr",
        lambda: F.when(F.col("doc_id") < 8, "train").otherwise("test"),
    )
    (row,) = ca.token_kl_shift(spark, "ignored").collect()
    assert row.kl_nats == 0.0

    drift = _docs(
        spark,
        [("alpha beta gamma", "en", "s")] * 8
        + [("delta epsilon zeta", "en", "s")] * 2,
    )
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: drift)
    (row2,) = ca.token_kl_shift(spark, "ignored").collect()
    assert row2.kl_nats > 0.5


def test_embedding_split_drift_identical_distribution(spark, monkeypatch):
    """Same vector repeated across both splits: centroids coincide,
    cosine is exactly 1.0 and counts reflect the split sizes."""
    import pyspark.sql.functions as F
    from pyspark.sql import Row

    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, 2.0, 2.0], label=0) for i in range(20)]
    )
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: emb)
    (row,) = ca.embedding_split_drift(spark, "ignored").collect()
    assert row.centroid_cosine == 1.0
    assert row.n_train + row.n_test == 20


def test_embedding_split_drift_detects_divergence(spark, monkeypatch):
    """Orthogonal train/test embeddings for one label must drive its
    split-centroid cosine to ~0 (the drift signal)."""
    from pyspark.sql import Row

    # md5-split is deterministic: compute which ids land in test
    import hashlib

    def is_test(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % ca.TRAIN_MOD >= ca.TRAIN_PCT

    ids = list(range(200))
    rows = [
        Row(vec_id=i,
            embedding=[0.0, 1.0, 0.0] if is_test(i) else [1.0, 0.0, 0.0],
            label=0)
        for i in ids
    ]
    assert any(is_test(i) for i in ids) and any(not is_test(i) for i in ids)
    emb = spark.createDataFrame(rows)
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: emb)
    (row,) = ca.embedding_split_drift(spark, "ignored").collect()
    assert row.centroid_cosine == 0.0


def _write_embeddings(tmp_path, rows):
    """A real parquet file (not a Spark directory) so the DuckDB oracle
    and the Spark query read byte-identical input."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_knn_label_purity_zero_vector_parity(spark, tmp_path):
    """A zero-norm embedding must be excluded by BOTH engines (the Spark
    plan filters q_nrm/c_nrm > 0; the oracle needs the same predicate or
    it emits NaN/div-by-zero cosines and the hashes diverge)."""
    import duckdb

    rows = [(i, [10.0 + i, 0.1, 0.0], 0) for i in range(6)]
    rows += [(i, [0.1, 10.0 + i, 0.0], 1) for i in range(6, 12)]
    rows.append((12, [0.0, 0.0, 0.0], 0))  # the hazard
    sf = _write_embeddings(tmp_path, rows)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    from oracle_harness import compare

    res = compare(
        ca.knn_label_purity(spark, sf, sample_mod=1), con, ca.KNN_LABEL_PURITY_SQL.replace(
            f"% {ca.PURITY_SAMPLE_MOD} = 0", "% 1 = 0"
        )
    )
    assert res["ok"], res


def test_embedding_split_drift_zero_centroid_parity(spark, tmp_path):
    """A label whose split centroids are zero vectors has no defined
    cosine: both engines must exclude it rather than compare NaNs."""
    import duckdb

    rows = [(i, [1.0 + (i % 3) * 0.1, 2.0, 0.5], 0) for i in range(40)]
    rows += [(100 + i, [0.0, 0.0, 0.0], 9) for i in range(40)]  # zero label
    sf = _write_embeddings(tmp_path, rows)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    from oracle_harness import compare

    out = ca.embedding_split_drift(spark, sf)
    labels = [r.label for r in out.collect()]
    assert 9 not in labels and 0 in labels
    res = compare(out, con, ca.EMBEDDING_SPLIT_DRIFT_SQL)
    assert res["ok"], res


def test_split_leakage_counts_cross_pairs(spark, monkeypatch):
    """Three exact duplicates land in the candidate graph as a triangle;
    with a forced split putting one of them on the other side, exactly
    2 of 3 pairs cross the split."""
    import pyspark.sql.functions as F

    docs = _docs(spark, [
        ("alpha beta gamma delta epsilon", "en", "s"),
        ("alpha beta gamma delta epsilon", "en", "s"),
        ("alpha beta gamma delta epsilon", "en", "s"),
        ("one two three four five", "en", "s"),
    ])
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: docs)
    # drive the REAL md5 split and compute the expected answer from it
    split_df = docs.select(
        "doc_id",
        F.when(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % ca.TRAIN_MOD < ca.TRAIN_PCT, "train"
        ).otherwise("test").alias("split"),
    )
    splits = {r.doc_id: r.split for r in split_df.collect()}
    trio = [0, 1, 2]
    expected_cross = sum(
        1 for i in trio for j in trio if i < j and splits[i] != splits[j]
    )
    (row,) = ca.split_leakage(spark, "ignored").collect()
    assert row.lang == "en"
    assert row.n_pairs == 3  # the triangle; the singleton pairs with no one
    assert row.n_cross_split == expected_cross
    assert row.leak_rate == pytest.approx(round(expected_cross / 3, 4))


def test_near_dup_source_matrix_diagonal_and_cross(spark, monkeypatch):
    """Two duplicate docs within source A and one shared with source B:
    pairs roll up to the unordered source matrix."""
    docs = spark.createDataFrame([
        Row(doc_id=0, text="alpha beta gamma delta epsilon", lang="en",
            source="a", n_chars=30),
        Row(doc_id=1, text="alpha beta gamma delta epsilon", lang="en",
            source="a", n_chars=30),
        Row(doc_id=2, text="alpha beta gamma delta epsilon", lang="en",
            source="b", n_chars=30),
        Row(doc_id=3, text="six seven eight nine ten", lang="en",
            source="b", n_chars=24),
    ])
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: docs)
    out = {(r.src_lo, r.src_hi): r.n_pairs
           for r in ca.near_dup_source_matrix(spark, "ignored").collect()}
    assert out == {("a", "a"): 1, ("a", "b"): 2}


def test_len_vocab_corr_closed_forms(spark, monkeypatch):
    """Perfectly correlated (all-distinct tokens: y == x) gives r = 1;
    a source whose length varies but vocabulary is constant gives
    pearson_r NULL (zero type variance)."""
    docs = _docs(spark, [
        ("a b", "en", "perfect"),
        ("a b c d", "en", "perfect"),
        ("a b c d e f", "en", "perfect"),
        ("w w", "en", "flat"),
        ("w w w w", "en", "flat"),
        ("w w w w w w", "en", "flat"),
    ])
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: docs)
    out = {r.source: r for r in ca.len_vocab_corr(spark, "ignored").collect()}
    assert out["perfect"].pearson_r == 1.0
    assert out["perfect"].n_docs == 3
    assert out["perfect"].mean_tokens == 4.0
    assert out["perfect"].mean_types == 4.0
    assert out["flat"].pearson_r is None  # var(types) == 0
    assert out["flat"].mean_types == 1.0


def test_dsir_log_ratio_separates_target_like_sources(spark, monkeypatch):
    """A source written in the target language's vocabulary must score a
    higher mean importance weight (and selection fraction) than a
    source with disjoint vocabulary — the DSIR selection contract."""
    docs = _docs(spark, [
        ("alpha beta alpha beta gamma", "en", "targetish"),
        ("alpha gamma beta alpha", "en", "targetish"),
        ("zork quux blarg zork", "xx", "offdomain"),
        ("quux blarg zork quux blarg", "xx", "offdomain"),
    ])
    monkeypatch.setattr(ca, "load_balanced", lambda sp, sd, name: docs)
    out = {r.source: r for r in ca.dsir_log_ratio(spark, "ignored").collect()}
    assert out["targetish"].mean_w_nats > out["offdomain"].mean_w_nats
    assert out["targetish"].frac_target_like == 1.0
    assert out["offdomain"].frac_target_like == 0.0
    assert out["targetish"].n_docs == out["offdomain"].n_docs == 2
