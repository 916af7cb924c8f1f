"""Edge cases for the curation layer that the TESTDATA fixtures don't
exercise: documents shorter than one shingle (reviewed round 3 —
``sequence(0, n-1)`` with ``n=0`` yields the descending ``[0, -1]``
and ``slice`` start 0 throws, so the index stream must degrade to
EMPTY, exactly like the oracle's ``generate_series(1, 0)``)."""

from __future__ import annotations

import duckdb
import pytest

from datalake_iceberg_spark.queries import curation


@pytest.fixture()
def tiny_docs_dir(spark, tmp_path):
    rows = [
        (0, "a b c", "en", "src0", 5),                # 3 tokens: 0 shingles
        (1, "", "en", "src0", 0),                     # empty text
        (2, "one two three four five", "en", "src1", 23),   # exactly 5
        (3, "w x y z q r s t u v", "de", "src1", 19),  # 10 tokens
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def test_shingle_repetition_short_docs(spark, tiny_docs_dir):
    sdf = curation.shingle_repetition(spark, tiny_docs_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tiny_docs_dir}/documents.parquet/*.parquet')"
    )
    odf = con.execute(curation.SHINGLE_REPETITION_SQL).df()
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert s.shape == o.shape
    # only docs with >= 1 shingle appear: doc 2 (1 shingle) and doc 3 (6)
    assert set(s["source"]) == {"src1"}
    for c in cols:
        assert (s[c].astype(str) == o[c].astype(str)).all(), c


def test_other_curation_ops_survive_short_docs(spark, tiny_docs_dir):
    for fn in (
        curation.term_scrub_stats,
        curation.filter_funnel,
        curation.token_len_histogram,
        curation.oov_rate,
    ):
        assert fn(spark, tiny_docs_dir).count() >= 0
