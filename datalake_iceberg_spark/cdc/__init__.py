from datalake_iceberg_spark.cdc.pipeline import (  # noqa: F401
    dedup_latest,
    flatten_envelope,
    split_upserts_deletes,
    transform_and_dedup,
    apply_cdc_changes,
)
