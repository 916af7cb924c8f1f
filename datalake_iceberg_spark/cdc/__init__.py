from datalake_iceberg_spark.cdc.pipeline import (  # noqa: F401
    dedup_latest,
    flatten_envelope,
    split_upserts_deletes,
    transform_and_dedup,
    apply_cdc_changes,
)
from datalake_iceberg_spark.cdc.schema_registry import (  # noqa: F401
    RegisteredSchema,
    SchemaRegistryClient,
    SchemaRegistryError,
    registry_schema_map,
)
