"""spark-submit job entry points — the reference's launch surface.

The reference ships its pipelines as argparse CLIs driven by
``submit-command/*.sh`` (``src/mysql_to_iceberg.py``,
``kafka_to_iceberg.py``, ``iceberg_maintenance.py``, ...). A user
switching engines keeps the same operational shape: every reference
job maps to a module here with the same argument vocabulary
(``--service --table --num-partition --env-file``) bound to this
engine's components.

| Reference job | Engine job module |
|---|---|
| mysql_to_iceberg / sqlserver_to_iceberg | ``jobs.jdbc_to_lake`` |
| mysql_to_parquet / sqlserver_to_parquet | ``jobs.jdbc_to_landing`` |
| parquet_to_iceberg | ``jobs.landing_to_lake`` |
| kafka_to_s3 | ``jobs.stream_to_landing`` |
| kafka_to_iceberg | ``jobs.cdc_to_lake`` |
| kafka_to_iceberg_stream | ``jobs.cdc_to_lake`` ``--rounds`` |
| iceberg_maintenance | ``jobs.maintenance`` |
| watermark_maintenance | ``jobs.watermark_maintenance`` |
| schema_validate | ``jobs.schema_validate_job`` |
| (beyond-reference) IVF / IVF+PQ index ops | ``jobs.ann_index`` (``--pq``) |
| (beyond-reference) catalog admin: clones, renames, storage report | ``jobs.catalog_admin`` |
| (beyond-reference) BM25 inverted-index ops | ``jobs.text_index_job`` |

Every ``main(argv, spark=None)`` accepts an injected session so tests
drive the full argument path without a spark-submit; run standalone as
``python -m datalake_iceberg_spark.jobs.<name> ...``. JDBC jobs take
``--input-parquet`` as the offline source seam (no live database in
the test environment — the reader construction is still the JDBC
partitioned path and activates when connection settings are present).
"""
