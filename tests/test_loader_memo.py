"""r16 (ADVICE r15): the queries.load schema/partition memos must
invalidate when the file at a path changes — a fixture regenerated
in-process with a different schema must re-sniff, not silently read
all-null columns through the stale schema."""

import os
import shutil

from datalake_iceberg_spark import queries as q


def test_schema_memo_invalidates_on_rewrite(spark, tmp_path):
    d = str(tmp_path)
    spark.range(5).selectExpr("id AS a").write.mode("overwrite").parquet(
        f"{d}/t.parquet"
    )
    df1 = q.load(spark, d, "t")
    assert [f.name for f in df1.schema.fields] == ["a"]
    # warm the memo, then regenerate the fixture with a DIFFERENT schema
    q.load(spark, d, "t")
    shutil.rmtree(f"{d}/t.parquet")
    spark.range(5).selectExpr(
        "id AS b", "CAST(id AS STRING) AS c"
    ).write.mode("overwrite").parquet(f"{d}/t.parquet")
    os.utime(f"{d}/t.parquet")  # ensure the dir mtime moves even on
    # coarse-timestamp filesystems
    df2 = q.load(spark, d, "t")
    assert [f.name for f in df2.schema.fields] == ["b", "c"]
    assert df2.count() == 5


def test_schema_memo_hit_serves_same_schema(spark, tmp_path):
    d = str(tmp_path)
    spark.range(3).selectExpr("id AS x").write.mode("overwrite").parquet(
        f"{d}/u.parquet"
    )
    s1 = q.load(spark, d, "u").schema
    s2 = q.load(spark, d, "u").schema  # memo hit
    assert s1 == s2
    assert q.load(spark, d, "u").count() == 3
