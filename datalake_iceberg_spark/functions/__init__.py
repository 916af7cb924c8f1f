from datalake_iceberg_spark.functions.keys import (  # noqa: F401
    surrogate_key,
    trim_string_columns,
    normalize_timestamps_utc,
    with_audit_columns,
)
from datalake_iceberg_spark.functions.temporal import cast_debezium_column  # noqa: F401
from datalake_iceberg_spark.functions.skew import (  # noqa: F401
    salted_agg,
    salted_broadcast_replicate,
)
from datalake_iceberg_spark.functions.zorder import zvalue  # noqa: F401
