"""datalake_iceberg_spark — a PySpark-native analytics/ingestion engine.

A from-scratch rebuild of the capabilities of the reference system
(``blueriver97/datalake-iceberg``): CDC streaming upsert, batch snapshot
ingestion, versioned lakehouse tables with MERGE/DELETE/UPDATE semantics,
operational watermark ledgers, and table-maintenance services — expressed
as idiomatic Spark DataFrame / SQL plans so Catalyst + Tungsten (AQE,
whole-stage codegen, predicate pushdown) do the physical planning.

On top of the reference's surface, it adds the operators a large-scale
training-data pipeline needs: exact & near deduplication (MinHash-LSH,
SimHash, n-gram Jaccard), embedding similarity search, text analysis,
and multimodal-column plumbing.

No Iceberg runtime is assumed: ``tables.LakeTable`` provides snapshot
isolation, time travel, and copy-on-write DML over plain Parquet with a
bucket-partitioned layout so keyed DML rewrites only affected buckets
(the moral equivalent of Iceberg's hidden bucket partitioning, which the
reference left latent at ``src/utils/iceberg.py:92``).
"""

__version__ = "0.1.0"
