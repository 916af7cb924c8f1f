"""JDBC source scaffolding: type mapping + partitioned parallel reads.

Rebuilds the semantics of the reference's ``src/utils/database.py``:
- source-DB type name → Spark type (``MYSQL_TYPE_MAPPING``
  ``database.py:13-41``, ``MSSQL_TYPE_MAPPING`` ``database.py:43-72``),
  with parametric ``decimal(p,s)`` (``database.py:89-94``),
  ``tinyint(1)`` → Boolean (``database.py:83-86``) and a StringType
  fallback (``database.py:104``);
- partitioned parallel range read: pick a partition column, probe
  min/max bounds, fan out N range queries
  (``read_jdbc_table``, ``database.py:442-492``).

No live MySQL/SQL Server exists in this environment, so the JDBC
round-trip itself is behind ``spark.read.format("jdbc")`` option
builders (exactly what a production deployment would pass), and the
bounds/partition logic is testable against any DataFrame source via
``partition_bounds``/``range_predicates``.

Scale note: a single-connection JDBC read serializes the whole table
through one executor. ``partition_options`` is what makes snapshot
ingestion parallel — N executors × N connections, each reading a key
range — and the reason the reference probes INFORMATION_SCHEMA for an
auto_increment/identity/temporal column.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MYSQL_BASE = {
    "tinyint": T.IntegerType(), "smallint": T.IntegerType(),
    "mediumint": T.IntegerType(), "int": T.IntegerType(),
    "integer": T.IntegerType(), "bigint": T.LongType(),
    "float": T.FloatType(), "double": T.DoubleType(), "real": T.DoubleType(),
    "boolean": T.BooleanType(), "bool": T.BooleanType(),
    "char": T.StringType(), "varchar": T.StringType(), "text": T.StringType(),
    "tinytext": T.StringType(), "mediumtext": T.StringType(),
    "longtext": T.StringType(), "enum": T.StringType(), "set": T.StringType(),
    "json": T.StringType(),
    "blob": T.BinaryType(), "tinyblob": T.BinaryType(),
    "mediumblob": T.BinaryType(), "longblob": T.BinaryType(),
    "binary": T.BinaryType(), "varbinary": T.BinaryType(),
    "date": T.DateType(), "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(), "time": T.TimestampType(),
    "year": T.IntegerType(),
}

_MSSQL_BASE = {
    "tinyint": T.ByteType(), "smallint": T.ShortType(), "int": T.IntegerType(),
    "bigint": T.LongType(), "bit": T.BooleanType(),
    "float": T.DoubleType(), "real": T.FloatType(),
    "char": T.StringType(), "varchar": T.StringType(), "text": T.StringType(),
    "nchar": T.StringType(), "nvarchar": T.StringType(), "ntext": T.StringType(),
    "uniqueidentifier": T.StringType(), "xml": T.StringType(),
    "sql_variant": T.StringType(), "time": T.StringType(),
    "binary": T.BinaryType(), "varbinary": T.BinaryType(), "image": T.BinaryType(),
    "date": T.DateType(), "datetime": T.TimestampType(),
    "datetime2": T.TimestampType(), "smalldatetime": T.TimestampType(),
    "money": T.DecimalType(19, 4), "smallmoney": T.DecimalType(10, 4),
}

_DECIMAL_RE = re.compile(r"^(decimal|numeric|dec)\s*(?:\((\d+)\s*(?:,\s*(\d+))?\))?$")


def convert_db_type_to_spark(db_type: str, dialect: str = "mysql") -> T.DataType:
    """Type-name string → Spark type (reference ``database.py:75-104``).

    Handles: parametric decimals, ``tinyint(1)`` → Boolean (MySQL),
    ``int unsigned`` → Long (range overflow), fallback String.
    """
    s = db_type.strip().lower()
    m = _DECIMAL_RE.match(s)
    if m:
        p = int(m.group(2) or 10)
        sc = int(m.group(3) or 0)
        return T.DecimalType(p, sc)
    base = re.sub(r"\(.*\)", "", s).strip()
    if dialect == "mysql":
        if s.startswith("tinyint(1)"):
            return T.BooleanType()
        if "unsigned" in base:
            stripped = base.replace("unsigned", "").strip()
            if stripped == "bigint":
                return T.DecimalType(20, 0)  # unsigned bigint overflows long
            if stripped in ("int", "integer", "mediumint", "smallint", "tinyint"):
                return T.LongType()
        return _MYSQL_BASE.get(base, T.StringType())
    if dialect in ("mssql", "sqlserver"):
        return _MSSQL_BASE.get(base, T.StringType())
    raise ValueError(f"unknown dialect {dialect!r}")


@dataclass
class JdbcSource:
    url: str
    user: str
    password: str
    driver: str = "com.mysql.cj.jdbc.Driver"

    def base_options(self) -> dict[str, str]:
        """Connection options incl. the reference's correctness pins:
        zero-dates→NULL (``database.py:190``) and UTC session."""
        return {
            "url": self.url, "user": self.user, "password": self.password,
            "driver": self.driver,
            "zeroDateTimeBehavior": "convertToNull",
            "connectionTimeZone": "UTC",
        }

    @classmethod
    def from_settings(cls, db, database: str) -> "JdbcSource":
        """Build from the env-driven ``DatabaseSettings`` group (the
        reference assembles the same URLs in ``database.py``): type
        ``mysql`` or ``sqlserver`` selects URL shape + driver."""
        db.require()
        if db.type == "mysql":
            return cls(
                url=f"jdbc:mysql://{db.host}:{db.port}/{database}",
                user=db.user, password=db.password or "",
                driver="com.mysql.cj.jdbc.Driver",
            )
        if db.type == "sqlserver":
            return cls(
                url=(
                    f"jdbc:sqlserver://{db.host}:{db.port};"
                    f"databaseName={database};encrypt=true;"
                    "trustServerCertificate=true"
                ),
                user=db.user, password=db.password or "",
                driver="com.microsoft.sqlserver.jdbc.SQLServerDriver",
            )
        raise ValueError(f"unsupported database type {db.type!r}")


def partition_options(
    partition_column: str, lower: int, upper: int, num_partitions: int
) -> dict[str, str]:
    """Options for Spark's partitioned JDBC scan (``database.py:483-492``)."""
    return {
        "partitionColumn": partition_column,
        "lowerBound": str(lower),
        "upperBound": str(upper),
        "numPartitions": str(max(1, num_partitions)),
    }


def range_predicates(lower: int, upper: int, num_partitions: int, column: str) -> list[str]:
    """The WHERE predicates Spark generates for a range-partitioned scan —
    exposed for testing and for sources that take explicit predicates.
    Matches Spark's JDBCRelation stride semantics: first/last partitions
    are unbounded so no rows outside the probed bounds are lost."""
    if num_partitions <= 1 or upper <= lower:
        return []
    stride = max(1, (upper - lower) // num_partitions)
    preds = []
    bound = lower
    for i in range(num_partitions):
        lo = bound
        bound += stride
        if i == 0:
            preds.append(f"{column} < {bound} OR {column} IS NULL")
        elif i == num_partitions - 1:
            preds.append(f"{column} >= {lo}")
        else:
            preds.append(f"{column} >= {lo} AND {column} < {bound}")
    return preds


def read_jdbc_table(
    spark: SparkSession, source: JdbcSource, table: str,
    partition_column: str | None = None,
    bounds: tuple[int, int] | None = None,
    num_partitions: int = 1,
) -> DataFrame:
    """Partitioned parallel JDBC read with graceful single-read fallback
    (reference ``database.py:442-492``). ``bounds`` normally comes from a
    ``SELECT min(pk), max(pk)`` probe pushed to the source."""
    reader = spark.read.format("jdbc")
    for k, v in source.base_options().items():
        reader = reader.option(k, v)
    reader = reader.option("dbtable", table)
    if partition_column and bounds and num_partitions > 1 and bounds[1] > bounds[0]:
        for k, v in partition_options(partition_column, *bounds, num_partitions).items():
            reader = reader.option(k, v)
    return reader.load()


# INFORMATION_SCHEMA probe SQL (pushed down to the source DB over JDBC,
# reference database.py:197-231 / 323-353). Kept as query builders:
def mysql_primary_key_sql(database: str, table: str) -> str:
    return (
        "SELECT COLUMN_NAME FROM INFORMATION_SCHEMA.KEY_COLUMN_USAGE "
        f"WHERE TABLE_SCHEMA = '{database}' AND TABLE_NAME = '{table}' "
        "AND CONSTRAINT_NAME = 'PRIMARY' ORDER BY ORDINAL_POSITION"
    )


def mysql_partition_key_sql(database: str, table: str) -> str:
    """auto_increment column if any, else first int/temporal column."""
    return (
        "SELECT COLUMN_NAME FROM INFORMATION_SCHEMA.COLUMNS "
        f"WHERE TABLE_SCHEMA = '{database}' AND TABLE_NAME = '{table}' "
        "AND (EXTRA LIKE '%auto_increment%' "
        "     OR DATA_TYPE IN ('int','bigint','date','datetime','timestamp')) "
        "ORDER BY EXTRA LIKE '%auto_increment%' DESC, ORDINAL_POSITION LIMIT 1"
    )


def bounds_probe_sql(partition_column: str, table: str) -> str:
    return f"SELECT MIN({partition_column}) AS lo, MAX({partition_column}) AS hi FROM {table}"
