"""Analytic query suite over the TESTDATA star schema.

TPC-H-shaped queries adapted to the available columns, plus the
reference's own relational idioms (dedup-latest window WF1, keep-latest
purge J3/A3, semi/anti-join deletes J2, batch stats A1) re-expressed as
standalone queries so the driver's DuckDB oracle can grade them.

Oracle-parity rules used throughout:
- money values are converted to **exact integer cents** via
  ``floor(x*100 + 0.5)`` (IEEE-deterministic in both engines), all
  aggregation runs in exact int64, and outputs divide back to double —
  bit-identical across engines with no decimal-rounding-mode hazards;
- `events.ts` is decoded type-adaptively by ``load_events`` (µs
  timestamp used as-is; legacy int64-nanos truncated to µs); oracles
  shadow the ``events`` view with the type-agnostic ``EVENTS_CTE``
  (``epoch_ns(ts) // 1000``) so both encodings grade identically;
- every computed column is aliased identically in Spark and SQL, and
  top-k queries carry deterministic tiebreakers.

Scale notes: every query is a declarative DataFrame plan — Catalyst
pushes filters/column pruning into the parquet scan, AQE picks
broadcast joins for the small dims (region/nation/customer at any SF)
and handles skew. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_iceberg_spark.queries import load


def cents(col: Column | str) -> Column:
    """Dollars-as-double → exact integer cents. ``floor(x*100 + 0.5)`` is
    deterministic IEEE arithmetic — identical in Spark and DuckDB,
    avoiding cross-engine decimal rounding-mode differences."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


def cents_sql(expr: str) -> str:
    return f"CAST(FLOOR({expr} * 100 + 0.5) AS BIGINT)"


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Shared type-adaptive ``ts`` normalization for batch AND streaming
    events readers — one place to extend when the fixture grows a new
    encoding (round-2 lesson: two copies of this logic WILL diverge).

    - ``timestamp``: already the target type;
    - ``timestamp_ntz`` (µs parquet): wall-clock → LTZ through the
      session timezone (value-preserving in UTC sessions);
    - ``long``/``bigint`` (legacy int64-nanos): truncate ns → µs.
    """
    ts_type = df.schema["ts"].dataType.typeName()
    if ts_type == "timestamp":
        return df
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.to_timestamp_ltz("ts"))
    if ts_type in ("long", "bigint"):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raise TypeError(f"events.ts has unsupported dtype {ts_type!r}; expected timestamp or int64-nanos")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-adaptive events reader — branches on the *actual* ``ts``
    dtype instead of assuming a fixture encoding (the same robustness
    idiom as the reference's temporal decode, cdc_pipeline.py:81-124):

    - ``timestamp`` / ``timestamp_ntz`` (µs parquet): use as-is;
    - ``long`` (TIMESTAMP(NANOS) fixture read under
      ``spark.sql.legacy.parquet.nanosAsLong``): truncate ns → µs.

    Either way the result matches the oracle's ``epoch_ns(ts) // 1000``
    CTE, which is itself type-agnostic in DuckDB.
    """
    from pyspark.errors import AnalysisException

    path = f"{sf_dir}/events.parquet"
    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        # TIMESTAMP(NANOS) physical type: the vectorized reader rejects
        # it at schema inference (AnalysisException: Illegal Parquet
        # type). Opt into the legacy long decode for this session; the
        # read below then sees ts as int64 nanos. Other failures
        # (missing file, FS errors) propagate untouched.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    return normalize_events_ts(df)


EVENTS_CTE = """events_us AS (
  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
         user_id, event_type, value, props
  FROM events
)"""


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: big scan + 4-group aggregate. The flagship query.

    revenue/charge accumulate in cents × integer percent (exact int64);
    one shuffle for the aggregate, partial map-side combine free."""
    li = load(spark, sf_dir, "lineitem")
    price_c = cents("l_extendedprice")
    disc_pct = cents("l_discount")        # 0.05 -> 5
    tax_pct = cents("l_tax")
    qty_c = cents("l_quantity")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c).cast("double") / 100.0).alias("sum_qty"),
            (F.sum(price_c).cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(price_c * (100 - disc_pct)).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(price_c * (100 - disc_pct) * (100 + tax_pct)).cast("double") / 1000000.0).alias("sum_charge"),
            (F.sum(qty_c).cast("double") / 100.0 / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({cents_sql('l_quantity')}) AS DOUBLE) / 100.0 AS sum_qty,
       CAST(SUM({cents_sql('l_extendedprice')}) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(SUM({cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')}) * (100 + {cents_sql('l_tax')})) AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(SUM({cents_sql('l_quantity')}) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

_REV_SPARK = lambda: cents("l_extendedprice") * (100 - cents("l_discount"))  # noqa: E731
_REV_SQL = f"{cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})"


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + agg + top-10.

    ``customer`` is small at every SF relative to lineitem — broadcast;
    orders⋈lineitem is the real shuffle and AQE sizes it."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(_REV_SPARK()).cast("double") / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. All dims broadcast; the single
    shuffle is lineitem⋈orders (the agg reuses its partitioning)."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    sup = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg((F.sum(_REV_SPARK()).cast("double") / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = f"""
SELECT r_name, n_name,
       CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY r_name, n_name
ORDER BY revenue DESC, n_name
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-06-01")) & (F.col("o_orderdate") < F.lit("1996-06-01"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg((F.sum(_REV_SPARK()).cast("double") / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name, c_mktsegment,
       CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-06-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
GROUP BY c_custkey, c_name, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 priciest parts per brand — rank window (O3/WF family)."""
    part = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc(cents("p_retailprice")), F.asc("p_partkey")
    )
    return (
        part.withColumn("price_rank", F.row_number().over(w))
        .filter(F.col("price_rank") <= 3)
        .select(
            "p_brand", "p_partkey", "p_name",
            (cents("p_retailprice").cast("double") / 100.0).alias("retailprice"),
            "price_rank",
        )
        .orderBy("p_brand", "price_rank")
    )


TOP_PARTS_SQL = f"""
SELECT p_brand, p_partkey, p_name,
       CAST({cents_sql('p_retailprice')} AS DOUBLE) / 100.0 AS retailprice, price_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY {cents_sql('p_retailprice')} DESC, p_partkey ASC) AS price_rank
  FROM part
) t
WHERE price_rank <= 3
ORDER BY p_brand, price_rank
"""


def dedup_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WF1, the reference's load-bearing idiom (``cdc_pipeline.py:199-204``):
    latest event per user. The reference writes it as ``row_number``
    over desc ordering; the engine computes the same row with a
    ``max_by`` aggregation (r15 optimization): the window shuffles and
    sorts EVERY event, while max_by partial-aggregates map-side so one
    row per user crosses the exchange — at 100 TB that is shuffling the
    distinct keys instead of the event stream. Key (ts, event_id) ==
    orderBy(ts DESC, event_id DESC) row 1, tie-free (event_id unique
    per user)."""
    ev = load_events(spark, sf_dir)
    best = ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_id", "ts", "event_type", "value"),
            F.struct("ts", "event_id"),
        ).alias("b")
    )
    return best.select(
        "user_id",
        F.col("b.event_id").alias("event_id"),
        F.col("b.ts").alias("ts"),
        F.col("b.event_type").alias("event_type"),
        (cents(F.col("b.value")).cast("double") / 100.0).alias("value"),
    ).orderBy("user_id")


DEDUP_LATEST_SQL = f"""
WITH {EVENTS_CTE}
SELECT user_id, event_id, ts, event_type,
       CAST({cents_sql('value')} AS DOUBLE) / 100.0 AS value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS __rn
  FROM events_us
) t
WHERE __rn = 1
ORDER BY user_id
"""


def purge_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's retention purge (W6/J3, ``watermark.py:421-438``):
    rows older than a cutoff are deleted *except* each key's latest.
    Returns survivors; anti-join expressed as a window filter —
    equivalent plan, one shuffle."""
    ev = load_events(spark, sf_dir)
    cutoff = F.lit("2024-01-25 00:00:00").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("ts") >= cutoff) | (F.col("__rn") == 1))
        .select("event_id", "user_id", "ts", "event_type")
        .orderBy("event_id")
    )


PURGE_KEEP_LATEST_SQL = f"""
WITH {EVENTS_CTE}
SELECT event_id, user_id, ts, event_type
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS __rn
  FROM events_us
) t
WHERE ts >= TIMESTAMP '2024-01-25 00:00:00' OR __rn = 1
ORDER BY event_id
"""


def semi_anti_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J3: customers that have 'purchase' events (semi) but no 'error'
    events (anti) — the reference's DELETE WHERE EXISTS / NOT IN shapes."""
    cust = load(spark, sf_dir, "customer")
    ev = load_events(spark, sf_dir)
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    erroring = ev.filter(F.col("event_type") == "error").select("user_id")
    return (
        cust.join(purchasers, cust.c_custkey == purchasers.user_id, "left_semi")
        .join(erroring, cust.c_custkey == erroring.user_id, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


SEMI_ANTI_SQL = f"""
WITH {EVENTS_CTE}
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM events_us WHERE event_type = 'purchase' AND user_id = c_custkey)
  AND NOT EXISTS (SELECT 1 FROM events_us WHERE event_type = 'error' AND user_id = c_custkey)
ORDER BY c_custkey
"""


def batch_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the reference's one-pass batch metrics
    (``cdc_pipeline.py:317-322``) over events, grouped by type."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("event_count"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("max_event_ts"),
            F.min("event_id").alias("min_offset"),
            F.max("event_id").alias("max_offset"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


BATCH_STATS_SQL = f"""
WITH {EVENTS_CTE}
SELECT event_type,
       COUNT(*) AS event_count,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_event_ts,
       MIN(event_id) AS min_offset,
       MAX(event_id) AS max_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM events_us
GROUP BY event_type
ORDER BY event_type
"""


def hourly_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup (batch equivalent of the streaming windowed
    agg): events per hour × type. At scale this is the hypertable-rollup
    pattern — partial aggregation map-side, single shuffle on (hour, type)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(cents("value")).cast("double") / 100.0).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


HOURLY_ROLLUP_SQL = f"""
WITH {EVENTS_CTE}
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM({cents_sql('value')}) AS DOUBLE) / 100.0 AS sum_value
FROM events_us
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def surrogate_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 + key derivation: ``id_iceberg = md5(concat_ws('|', pk))`` with
    string trim — the reference's batch-ingest projection
    (``mysql_to_iceberg.py:57-60``). md5 hex is identical across engines."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("o_orderkey"),
            F.md5(F.concat_ws("|", F.col("o_orderkey").cast("string"),
                              F.col("o_custkey").cast("string"))).alias("id_iceberg"),
            F.trim(F.col("o_orderpriority")).alias("o_orderpriority"),
        )
        .orderBy("o_orderkey")
    )


SURROGATE_KEY_SQL = """
SELECT o_orderkey,
       md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR))) AS id_iceberg,
       trim(o_orderpriority) AS o_orderpriority
FROM orders
ORDER BY o_orderkey
"""


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 MERGE semantics as a standalone relational query: source =
    deduped-latest change rows derived from events; target = orders.
    Result = target ⟕anti source ∪ source (update-all/insert-all) —
    exactly the plan ``LakeTable.merge`` executes per bucket."""
    orders = load(spark, sf_dir, "orders")
    ev = load_events(spark, sf_dir)
    # dedup-latest via max_by aggregation (r15, same rewrite as
    # dedup_latest_events): one partial-aggregated row per user crosses
    # the exchange instead of the window's full sorted event shuffle
    source = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("ts", "value"), F.struct("ts", "event_id")
            ).alias("b")
        )
        .select(
            (F.col("user_id") * 10).alias("o_orderkey"),
            F.col("user_id").alias("o_custkey"),
            F.lit("M").alias("o_orderstatus"),
            (cents(F.col("b.value")).cast("double") / 100.0).alias("o_totalprice"),
            F.col("b.ts").alias("o_orderdate"),
            F.lit("MERGED").alias("o_orderpriority"),
        )
    )
    target = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        (cents("o_totalprice").cast("double") / 100.0).alias("o_totalprice"),
        "o_orderdate", "o_orderpriority",
    )
    return (
        target.join(source, on="o_orderkey", how="left_anti")
        .unionByName(source)
        .orderBy("o_orderkey", "o_custkey")
    )


MERGE_UPSERT_SQL = f"""
WITH {EVENTS_CTE},
source AS (
  SELECT user_id * 10 AS o_orderkey, user_id AS o_custkey, 'M' AS o_orderstatus,
         CAST({cents_sql('value')} AS DOUBLE) / 100.0 AS o_totalprice,
         ts AS o_orderdate, 'MERGED' AS o_orderpriority
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS __rn
    FROM events_us WHERE event_type = 'purchase'
  ) WHERE __rn = 1
),
target AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST({cents_sql('o_totalprice')} AS DOUBLE) / 100.0 AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders
)
SELECT * FROM (
  SELECT t.* FROM target t ANTI JOIN source s ON t.o_orderkey = s.o_orderkey
  UNION ALL
  SELECT * FROM source
)
ORDER BY o_orderkey, o_custkey
"""


import threading as _threading

_PARTIAL_MERGE_TABLES: dict[str, str] = {}
_PARTIAL_MERGE_LOCK = _threading.Lock()


def _partial_merge_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduped-latest purchase rows shaped as full order records — the
    same source as ``merge_upsert_orders`` (the merge contract requires
    the source to carry EVERY column even for a partial update, because
    unmatched rows insert in full)."""
    ev = load_events(spark, sf_dir)
    # dedup-latest via max_by aggregation (r15) — see merge_upsert_orders
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("ts", "value"), F.struct("ts", "event_id")
            ).alias("b")
        )
        .select(
            (F.col("user_id") * 10).alias("o_orderkey"),
            F.col("user_id").alias("o_custkey"),
            F.lit("M").alias("o_orderstatus"),
            (cents(F.col("b.value")).cast("double") / 100.0).alias("o_totalprice"),
            F.col("b.ts").alias("o_orderdate"),
            F.lit("MERGED").alias("o_orderpriority"),
        )
    )


def merge_partial_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 partial-column MERGE through the REAL ``LakeTable.merge``
    path (``update_columns`` — Iceberg/Delta ``WHEN MATCHED THEN UPDATE
    SET col, ... / WHEN NOT MATCHED THEN INSERT *``; reference MERGE
    semantics at ``src/utils/cdc_pipeline.py:221-237``).

    Target = orders staged once per sf_dir as a keyed, bucketed lake
    table in a temp dir; source = deduped-latest purchase rows. The
    merge updates ONLY (o_totalprice, o_orderpriority): matched rows
    must keep their CURRENT o_custkey / o_orderstatus / o_orderdate —
    source o_custkey deliberately differs from the target's so a
    full-row update would hash-mismatch the oracle — while unmatched
    source rows insert in full. The graded DataFrame is the table's
    post-merge snapshot read (MoR-free CoW path, bucket/dir pruned).

    Idempotent under re-runs: merging the same source again updates the
    same columns to the same values, so a cached table re-read (or even
    a re-merge) grades identically.
    """
    import atexit
    import shutil
    import tempfile

    from datalake_iceberg_spark.tables import LakeTable

    with _PARTIAL_MERGE_LOCK:  # one builder per sf_dir, even under
        loc = _PARTIAL_MERGE_TABLES.get(sf_dir)  # concurrent grading
        if loc is None:
            loc = tempfile.mkdtemp(prefix="merge_partial_orders_")
            atexit.register(shutil.rmtree, loc, ignore_errors=True)
            orders = load(spark, sf_dir, "orders")
            target = orders.select(
                "o_orderkey", "o_custkey", "o_orderstatus",
                (cents("o_totalprice").cast("double") / 100.0).alias("o_totalprice"),
                "o_orderdate", "o_orderpriority",
            )
            t = LakeTable(spark, loc)
            t.create_or_replace(target, key=["o_orderkey"], n_buckets=4)
            t.merge(
                _partial_merge_source(spark, sf_dir),
                update_columns=["o_totalprice", "o_orderpriority"],
            )
            _PARTIAL_MERGE_TABLES[sf_dir] = loc  # publish only when built
    return (
        LakeTable(spark, loc)
        .read()
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        )
        .orderBy("o_orderkey", "o_custkey")
    )


MERGE_PARTIAL_SQL = f"""
WITH {EVENTS_CTE},
source AS (
  SELECT user_id * 10 AS o_orderkey, user_id AS o_custkey, 'M' AS o_orderstatus,
         CAST({cents_sql('value')} AS DOUBLE) / 100.0 AS o_totalprice,
         ts AS o_orderdate, 'MERGED' AS o_orderpriority
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS __rn
    FROM events_us WHERE event_type = 'purchase'
  ) WHERE __rn = 1
),
target AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST({cents_sql('o_totalprice')} AS DOUBLE) / 100.0 AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders
)
SELECT * FROM (
  -- WHEN MATCHED: update ONLY (o_totalprice, o_orderpriority) from source
  SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
         s.o_totalprice, t.o_orderdate, s.o_orderpriority
  FROM target t JOIN source s ON t.o_orderkey = s.o_orderkey
  UNION ALL
  -- untouched target rows
  SELECT t.* FROM target t ANTI JOIN source s ON t.o_orderkey = s.o_orderkey
  UNION ALL
  -- WHEN NOT MATCHED: insert all
  SELECT s.* FROM source s ANTI JOIN target t ON s.o_orderkey = t.o_orderkey
)
ORDER BY o_orderkey, o_custkey
"""


_METADATA_STATS_CACHE: dict[str, tuple] = {}
_METADATA_STATS_LOCK = _threading.Lock()


def metadata_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 metadata aggregates, driver-graded against scan truth:
    ``LakeTable.row_count`` (Iceberg's manifest record-count analogue)
    and ``column_bounds`` (manifest min/max) on a staged orders table.

    The staged flow exercises every rung of the resolution ladder:

    1. a merge-on-read DELETE leaves a LIVE delete era → ``row_count``
       and ``column_bounds`` take the hybrid path (anti-joined read of
       ONLY era-covered dirs, manifest math for the rest): ``n_live``,
       ``*_live`` bounds — a masked row may hold an extremum, so the
       hybrid must find the SURVIVING extrema exactly;
    2. ``rewrite_position_delete_files`` folds the era →
       ``row_count`` is pure manifest math (no Spark job) =
       ``n_folded``; ``column_bounds`` answers purely from
       footer-harvested stats = key/price min/max.

    The DuckDB oracle computes all eight numbers by scanning the kept
    rows: metadata/hybrid math must equal scan truth exactly or the
    grade hash-mismatches. Idempotent: values are computed once per
    sf_dir and replayed."""
    import atexit
    import shutil
    import tempfile

    from datalake_iceberg_spark.tables import LakeTable

    with _METADATA_STATS_LOCK:
        vals = _METADATA_STATS_CACHE.get(sf_dir)
        if vals is None:
            loc = tempfile.mkdtemp(prefix="metadata_order_stats_")
            atexit.register(shutil.rmtree, loc, ignore_errors=True)
            orders = load(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderpriority",
            )
            t = LakeTable(spark, loc)
            t.create_or_replace(orders, key=["o_orderkey"], n_buckets=4)
            t.delete_keys(
                orders.where(F.col("o_orderkey") % 10 == 7)
                .select("o_orderkey"),
                mode="merge-on-read",
            )
            assert t.snapshot().deletes  # era live: hybrid paths
            n_live = t.row_count()
            klo_l, khi_l = t.column_bounds("o_orderkey")
            plo_l, phi_l = t.column_bounds("o_totalprice")
            t.rewrite_position_delete_files()
            assert not t.snapshot().deletes  # folded: pure metadata
            n_folded = t.row_count()
            key_lo, key_hi = t.column_bounds("o_orderkey")
            price_lo, price_hi = t.column_bounds("o_totalprice")
            vals = (n_live, int(klo_l), int(khi_l), float(plo_l), float(phi_l),
                    n_folded,
                    int(key_lo), int(key_hi), float(price_lo), float(price_hi))
            _METADATA_STATS_CACHE[sf_dir] = vals
    return spark.createDataFrame(
        [vals],
        schema=(
            "n_live bigint, key_min_live bigint, key_max_live bigint, "
            "price_min_live double, price_max_live double, n_folded bigint, "
            "key_min bigint, key_max bigint, price_min double, price_max double"
        ),
    )


METADATA_STATS_SQL = """
WITH kept AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 7)
SELECT CAST(COUNT(*) AS BIGINT)  AS n_live,
       MIN(o_orderkey)           AS key_min_live,
       MAX(o_orderkey)           AS key_max_live,
       MIN(o_totalprice)         AS price_min_live,
       MAX(o_totalprice)         AS price_max_live,
       CAST(COUNT(*) AS BIGINT)  AS n_folded,
       MIN(o_orderkey)           AS key_min,
       MAX(o_orderkey)           AS key_max,
       MIN(o_totalprice)         AS price_min,
       MAX(o_totalprice)         AS price_max
FROM kept
"""


_NULL_COUNTS_CACHE: dict[str, tuple] = {}
_NULL_COUNTS_LOCK = _threading.Lock()


def metadata_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 metadata aggregates, part 2: ``LakeTable.null_count`` —
    exact COUNT(col IS NULL) from the per-dir ``#nulls:<col>`` footer
    pseudo-stats (Iceberg's manifest ``null_value_counts`` analogue),
    driver-graded against DuckDB scan truth.

    The staged orders table derives a nullable column
    (``NULLIF(o_orderstatus, 'F')`` — the testdata has no native NULLs)
    and grades three rungs: the pure manifest path (zero IO), the
    hybrid under a LIVE MoR delete era (masked dirs really read; the
    deleted keys include both null and non-null rows), and the restored
    metadata path post-fold. Idempotent via the per-sf_dir cache."""
    import atexit
    import shutil
    import tempfile

    from datalake_iceberg_spark.tables import LakeTable

    with _NULL_COUNTS_LOCK:
        vals = _NULL_COUNTS_CACHE.get(sf_dir)
        if vals is None:
            loc = tempfile.mkdtemp(prefix="metadata_null_counts_")
            atexit.register(shutil.rmtree, loc, ignore_errors=True)
            orders = load(spark, sf_dir, "orders").select(
                "o_orderkey",
                F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("status_nf"),
                "o_totalprice",
            )
            t = LakeTable(spark, loc)
            t.create_or_replace(orders, key=["o_orderkey"], n_buckets=4)
            n_initial = t.null_count("status_nf")
            n_price = t.null_count("o_totalprice")  # 0: no nulls
            t.delete_keys(
                orders.where(F.col("o_orderkey") % 9 == 4)
                .select("o_orderkey"),
                mode="merge-on-read",
            )
            assert t.snapshot().deletes
            n_live = t.null_count("status_nf")  # hybrid path
            t.rewrite_position_delete_files()
            n_folded = t.null_count("status_nf")  # metadata path
            vals = (n_initial, n_price, n_live, n_folded)
            _NULL_COUNTS_CACHE[sf_dir] = vals
    return spark.createDataFrame(
        [vals],
        schema=(
            "nulls_initial bigint, nulls_price bigint, "
            "nulls_live bigint, nulls_folded bigint"
        ),
    )


METADATA_NULLS_SQL = """
SELECT CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
         AS nulls_initial,
       CAST(0 AS BIGINT) AS nulls_price,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' AND o_orderkey % 9 <> 4
                     THEN 1 ELSE 0 END) AS BIGINT) AS nulls_live,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' AND o_orderkey % 9 <> 4
                     THEN 1 ELSE 0 END) AS BIGINT) AS nulls_folded
FROM orders
"""


_NDV_CACHE: dict[str, tuple] = {}
_NDV_LOCK = _threading.Lock()

#: relative tolerance for the graded NDV booleans — Datasketches HLL at
#: the default lg_k=12 has ~1.6% RSE; 5% is >3 sigma, and the estimate
#: is DETERMINISTIC for a given input set (hash-based, no RNG), so the
#: booleans are stable round over round.
_NDV_TOL = 0.05


def metadata_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 metadata aggregates, part 3 (r13): ``LakeTable.analyze_ndv``
    + ``approx_ndv`` — per-dir HLL NDV sketches in a parquet sidecar,
    the Iceberg Puffin / ``compute_table_stats`` analogue (Spark's
    ``hll_sketch_agg`` does the math; reference exposes NDV only via
    engine ``COUNT(DISTINCT)``).

    Grades three rungs against DuckDB scan truth:

    1. sketch path after ``analyze_ndv`` (sidecar-only, no data scan)
       for a bigint key and a low-cardinality string (o_orderpriority:
       HLL is EXACT in its sparse range, so small-NDV answers are not
       approximations at all);
    2. hybrid under a LIVE merge-on-read delete era — masked dirs are
       sketched from the real anti-joined read because a raw-dir sketch
       cannot subtract masked rows (keys ``% 7 == 3`` deleted, which
       which can thin o_custkey values whose every order matched);
    3. post-fold, back on the pure sidecar path.

    The DataFrame carries the EXACT distinct counts (computed by Spark
    scan, hash-compared against DuckDB's COUNT(DISTINCT)) plus booleans
    asserting each HLL estimate lands within the 5% tolerance — so the
    grade checks both that exact truth agrees across engines AND that
    the sketch machinery tracks it. Idempotent via the per-sf_dir
    cache."""
    import atexit
    import shutil
    import tempfile

    from datalake_iceberg_spark.tables import LakeTable

    with _NDV_LOCK:
        vals = _NDV_CACHE.get(sf_dir)
        if vals is None:
            loc = tempfile.mkdtemp(prefix="metadata_ndv_")
            atexit.register(shutil.rmtree, loc, ignore_errors=True)
            orders = load(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus",
            )
            t = LakeTable(spark, loc)
            t.create_or_replace(orders, key=["o_orderkey"], n_buckets=4)
            t.analyze_ndv(["o_custkey", "o_orderpriority"])

            def _exact(cols):
                r = t.read().agg(
                    *[F.countDistinct(c).alias(c) for c in cols]
                ).first()
                return {c: int(r[c]) for c in cols}

            def _ok(est, exact):
                return bool(abs(est - exact) <= _NDV_TOL * exact)

            e0 = _exact(["o_custkey", "o_orderpriority"])
            cust_est = t.approx_ndv("o_custkey")
            prio_est = t.approx_ndv("o_orderpriority")
            t.delete_keys(
                orders.where(F.col("o_orderkey") % 7 == 3)
                .select("o_orderkey"),
                mode="merge-on-read",
            )
            assert t.snapshot().deletes  # era live: hybrid sketch path
            e1 = _exact(["o_custkey"])
            cust_live_est = t.approx_ndv("o_custkey")
            t.rewrite_position_delete_files()
            t.analyze_ndv(["o_custkey"])  # re-cover the rewritten dirs
            assert not t.snapshot().deletes
            e2 = _exact(["o_custkey"])
            cust_folded_est = t.approx_ndv("o_custkey")
            vals = (
                e0["o_custkey"], _ok(cust_est, e0["o_custkey"]),
                e0["o_orderpriority"], _ok(prio_est, e0["o_orderpriority"]),
                e1["o_custkey"], _ok(cust_live_est, e1["o_custkey"]),
                e2["o_custkey"], _ok(cust_folded_est, e2["o_custkey"]),
            )
            _NDV_CACHE[sf_dir] = vals
    return spark.createDataFrame(
        [vals],
        schema=(
            "ndv_custkey bigint, custkey_ok boolean, "
            "ndv_prio bigint, prio_ok boolean, "
            "ndv_custkey_live bigint, custkey_live_ok boolean, "
            "ndv_custkey_folded bigint, custkey_folded_ok boolean"
        ),
    )


METADATA_NDV_SQL = """
WITH kept AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 3)
SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv_custkey,
       TRUE AS custkey_ok,
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS ndv_prio,
       TRUE AS prio_ok,
       (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM kept)
         AS ndv_custkey_live,
       TRUE AS custkey_live_ok,
       (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM kept)
         AS ndv_custkey_folded,
       TRUE AS custkey_folded_ok
FROM orders
"""


_UPDATE_WHERE_TABLES: dict[str, str] = {}
_UPDATE_WHERE_LOCK = _threading.Lock()


def update_where_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 bulk UPDATE through the REAL ``LakeTable.update_where`` path
    (reference: ``scripts/migrate_v2_naming.sql:43-49``), driver-graded
    for the first time in r12 — previously test-pinned only.

    Tuple-filter form ``[("o_totalprice", ">", 300000.0)]`` engages
    dir-level data skipping: dirs whose footer max can't exceed the cut
    are carried forward untouched (at 100 TB a narrow UPDATE costs ∝
    the dirs it can touch). The graded DataFrame is the post-update
    snapshot read; the DuckDB oracle applies the same SET as a CASE
    over the raw parquet. Idempotent: re-running the update assigns the
    same value to the same rows."""
    import atexit
    import shutil
    import tempfile

    from datalake_iceberg_spark.tables import LakeTable

    with _UPDATE_WHERE_LOCK:
        loc = _UPDATE_WHERE_TABLES.get(sf_dir)
        if loc is None:
            loc = tempfile.mkdtemp(prefix="update_where_orders_")
            atexit.register(shutil.rmtree, loc, ignore_errors=True)
            orders = load(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderpriority",
            )
            t = LakeTable(spark, loc)
            t.create_or_replace(orders, key=["o_orderkey"], n_buckets=4)
            t.update_where(
                [("o_totalprice", ">", 300000.0)],
                {"o_orderpriority": "'BULK-UPDATED'"},
            )
            _UPDATE_WHERE_TABLES[sf_dir] = loc
    return (
        LakeTable(spark, loc)
        .read()
        .select("o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


UPDATE_WHERE_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       CASE WHEN o_totalprice > 300000.0 THEN 'BULK-UPDATED'
            ELSE o_orderpriority END AS o_orderpriority
FROM orders
ORDER BY o_orderkey
"""


_DELETE_MOR_TABLES: dict[str, str] = {}
_DELETE_MOR_LOCK = _threading.Lock()


def delete_mor_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 merge-on-read DELETE graded at READ time: the graded
    DataFrame is the post-delete snapshot read **while the delete era
    is still live** — masked rows must vanish via the era's anti-join
    (``_read_with_deletes``), not a rewrite, so this grades the exact
    read path a 100 TB hot-ingest table runs between folds (the
    broadcast-vs-AQE byte gate included). The DuckDB oracle filters the
    same keys from the raw parquet. Idempotent: the staged table is
    built once per sf_dir; the era stays live for every re-read."""
    import atexit
    import shutil
    import tempfile

    from datalake_iceberg_spark.tables import LakeTable

    with _DELETE_MOR_LOCK:
        loc = _DELETE_MOR_TABLES.get(sf_dir)
        if loc is None:
            loc = tempfile.mkdtemp(prefix="delete_mor_orders_")
            atexit.register(shutil.rmtree, loc, ignore_errors=True)
            orders = load(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderpriority",
            )
            t = LakeTable(spark, loc)
            t.create_or_replace(orders, key=["o_orderkey"], n_buckets=4)
            t.delete_keys(
                orders.where(F.col("o_orderkey") % 7 == 3)
                .select("o_orderkey"),
                mode="merge-on-read",
            )
            assert t.snapshot().deletes  # era LIVE: the mask is graded
            _DELETE_MOR_TABLES[sf_dir] = loc
    return (
        LakeTable(spark, loc)
        .read()
        .select("o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


DELETE_MOR_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderkey % 7 <> 3
ORDER BY o_orderkey
"""


_TXN_ARCHIVE_WH: dict[str, str] = {}
_TXN_ARCHIVE_LOCK = _threading.Lock()


def txn_archive_move(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table ATOMIC archival move through the REAL
    ``CatalogTransaction`` path (``txn.py`` — reserved manifests + a
    write-ahead intent log): one transaction stages a keyed DELETE on
    the live table and the matching APPEND on the archive table, then
    publishes both or neither. The graded DataFrame proves the
    move-without-loss-or-duplication invariant as per-side aggregates
    (live ∪ archive == source, live ∩ archive == ∅); the DuckDB oracle
    recomputes both sides from the raw parquet with the same split
    predicate. Idempotent: the warehouse is staged once per sf_dir."""
    import atexit
    import shutil
    import tempfile

    from datalake_iceberg_spark.tables import LakeCatalog

    with _TXN_ARCHIVE_LOCK:
        wh = _TXN_ARCHIVE_WH.get(sf_dir)
        if wh is None:
            wh = tempfile.mkdtemp(prefix="txn_archive_")
            atexit.register(shutil.rmtree, wh, ignore_errors=True)
            orders = load(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderstatus", "o_totalprice"
            )
            cat = LakeCatalog(spark, wh)
            cat.create_or_replace(
                "default.live", orders, key=["o_orderkey"], n_buckets=4
            )
            archived = orders.filter(F.col("o_orderkey") % 13 == 5)
            cat.create_or_replace(
                "default.archive", archived.limit(0),
                key=["o_orderkey"], n_buckets=4,
            )
            with cat.transaction() as txn:
                txn.table("default.live").delete_keys(
                    archived.select("o_orderkey")
                )
                txn.table("default.archive").append(archived)
            _TXN_ARCHIVE_WH[sf_dir] = wh
    cat = LakeCatalog(spark, wh)
    live = cat.table("default.live").read()
    arch = cat.table("default.archive").read()
    both = live.withColumn("side", F.lit("live")).unionByName(
        arch.withColumn("side", F.lit("archive"))
    )
    return (
        both.groupBy("side")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(cents("o_totalprice")).alias("total_cents"),
            F.countDistinct("o_orderkey").alias("n_keys"),
        )
        .orderBy("side")
    )


TXN_ARCHIVE_SQL = f"""
SELECT side, COUNT(*) AS n_rows,
       CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) AS total_cents,
       COUNT(DISTINCT o_orderkey) AS n_keys
FROM (
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_orderkey % 13 = 5 THEN 'archive' ELSE 'live' END AS side
    FROM orders
)
GROUP BY side
ORDER BY side
"""


_UPDATE_MOR_TABLES: dict[str, str] = {}
_UPDATE_MOR_LOCK = _threading.Lock()


def update_mor_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 bulk UPDATE in **merge-on-read** mode (r12; Iceberg's
    ``write.update.mode`` choice) graded at READ time: the tuple-filter
    predicate is evaluated over only the dirs whose footer stats can
    match, the MATCHED rows commit as new data dirs doubling as the
    equality-delete mask of their old versions (covers = the touched
    dirs only), and the graded DataFrame is the post-update read
    **while the era is live** — old versions must vanish via the era
    anti-join and the updated rows must serve from the new dirs, the
    exact read a 100 TB backfill pipeline runs between folds. The
    DuckDB oracle applies the same SET as a CASE over the raw parquet.
    Idempotent: staged once per sf_dir; the era stays live."""
    import atexit
    import shutil
    import tempfile

    from datalake_iceberg_spark.tables import LakeTable

    with _UPDATE_MOR_LOCK:
        loc = _UPDATE_MOR_TABLES.get(sf_dir)
        if loc is None:
            loc = tempfile.mkdtemp(prefix="update_mor_orders_")
            atexit.register(shutil.rmtree, loc, ignore_errors=True)
            orders = load(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderpriority",
            )
            t = LakeTable(spark, loc)
            t.create_or_replace(orders, key=["o_orderkey"], n_buckets=4)
            snap = t.update_where(
                [("o_totalprice", "<", 5000.0)],
                {"o_orderpriority": "'MOR-UPDATED'"},
                mode="merge-on-read",
            )
            assert snap.deletes  # era LIVE: the masked read is graded
            _UPDATE_MOR_TABLES[sf_dir] = loc
    return (
        LakeTable(spark, loc)
        .read()
        .select("o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


UPDATE_MOR_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       CASE WHEN o_totalprice < 5000.0 THEN 'MOR-UPDATED'
            ELSE o_orderpriority END AS o_orderpriority
FROM orders
ORDER BY o_orderkey
"""


_SCAN_DNF_TABLES: dict[str, str] = {}
_SCAN_DNF_LOCK = _threading.Lock()


def scan_dnf_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive filtered scan (r12 DNF vocabulary) through the REAL
    ``LakeTable.scan`` path: ``(status='F' AND price>300k) OR
    priority='1-URGENT'`` prunes dirs branch-wise (a dir is read only
    when SOME branch's footer stats can match) and re-applies the exact
    OR predicate on the survivors. The DuckDB oracle runs the same
    disjunction over the raw parquet. Idempotent: the staged lake table
    is built once per sf_dir and only ever read."""
    import atexit
    import shutil
    import tempfile

    from datalake_iceberg_spark.tables import LakeTable

    with _SCAN_DNF_LOCK:
        loc = _SCAN_DNF_TABLES.get(sf_dir)
        if loc is None:
            loc = tempfile.mkdtemp(prefix="scan_dnf_orders_")
            atexit.register(shutil.rmtree, loc, ignore_errors=True)
            orders = load(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderpriority",
            )
            t = LakeTable(spark, loc)
            t.create_or_replace(orders, key=["o_orderkey"], n_buckets=4)
            _SCAN_DNF_TABLES[sf_dir] = loc
    return (
        LakeTable(spark, loc)
        .scan([
            [("o_orderstatus", "=", "F"), ("o_totalprice", ">", 300000.0)],
            [("o_orderpriority", "=", "1-URGENT")],
        ])
        .select("o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


SCAN_DNF_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE (o_orderstatus = 'F' AND o_totalprice > 300000.0)
   OR o_orderpriority = '1-URGENT'
ORDER BY o_orderkey
"""


_DELETE_WHERE_TABLES: dict[str, str] = {}
_DELETE_WHERE_LOCK = _threading.Lock()


def delete_where_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate DELETE (W3/W6 shape, reference retention purge
    ``src/utils/watermark.py:421-438``) through the r12 dir-pruned
    ``delete_where`` in **merge-on-read** mode: the tuple-filter
    predicate is evaluated over only the dirs whose footer stats can
    match, the matching rows' keys commit as an equality-delete era
    covering exactly those dirs, and the graded DataFrame is the
    post-delete read **while the era is live** — at 100 TB a retention
    purge costs O(matching rows) with reads anti-joining only the
    covered dirs until the scheduled fold. The DuckDB oracle applies
    the inverse predicate to the raw parquet. Idempotent: the staged
    table is built once per sf_dir; the era stays live for re-reads."""
    import atexit
    import shutil
    import tempfile

    from datalake_iceberg_spark.tables import LakeTable

    with _DELETE_WHERE_LOCK:
        loc = _DELETE_WHERE_TABLES.get(sf_dir)
        if loc is None:
            loc = tempfile.mkdtemp(prefix="delete_where_orders_")
            atexit.register(shutil.rmtree, loc, ignore_errors=True)
            orders = load(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderpriority",
            )
            t = LakeTable(spark, loc)
            t.create_or_replace(orders, key=["o_orderkey"], n_buckets=4)
            snap = t.delete_where(
                [("o_totalprice", ">", 400000.0)], mode="merge-on-read"
            )
            assert snap.deletes  # era LIVE: the masked read is graded
            _DELETE_WHERE_TABLES[sf_dir] = loc
    return (
        LakeTable(spark, loc)
        .read()
        .select("o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


DELETE_WHERE_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE NOT (o_totalprice > 400000.0)
ORDER BY o_orderkey
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate — beyond-reference coverage (§2.5 notes it absent).
    Revenue by (status, priority), (status), and grand total."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(cents("o_totalprice")).cast("double") / 100.0).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


GROUPING_SETS_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM({cents_sql('o_totalprice')}) AS DOUBLE) / 100.0 AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session assignment: a new session starts after a >30 min gap per
    user (lag + cumulative sum windows). The batch form of the streaming
    session-window operator; one shuffle on user_id, both windows reuse
    the same partitioning."""
    ev = load_events(spark, sf_dir)
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts")), 1).over(by_user)
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    return (
        ev.withColumn("new_session", new_sess)
        .withColumn("session_seq", F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_seq")
    )


SESSIONIZE_SQL = f"""
WITH {EVENTS_CTE},
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
  FROM events_us
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessions
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day revenue per customer — a RANGE window frame over
    event time (absent from the reference, SURVEY §2.6 notes no frame
    specs). The frame key is an integer day number so Spark's
    ``rangeBetween`` and DuckDB's ``RANGE BETWEEN n PRECEDING`` agree
    exactly, ties (same-day orders) included as frame peers by both.
    One shuffle on o_custkey; the sort rides the window exchange."""
    orders = load(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy(day.cast("long")).rangeBetween(-6, 0)
    return (
        orders.select(
            "o_custkey", "o_orderdate",
            F.sum(cents("o_totalprice")).over(w).alias("rolling_c"),
        )
        .select(
            "o_custkey", "o_orderdate",
            (F.col("rolling_c").cast("double") / 100.0).alias("revenue_7d"),
        )
        .orderBy("o_custkey", "o_orderdate")
    )


ROLLING_REVENUE_SQL = f"""
SELECT o_custkey, o_orderdate,
       CAST(SUM({cents_sql('o_totalprice')}) OVER (
              PARTITION BY o_custkey
              ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS revenue_7d
FROM orders
ORDER BY o_custkey, o_orderdate
"""


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts by priority × status as columns. The status
    values are DECLARED (not discovered) so the plan needs no pre-scan
    and the output schema is stable at any SF — the scale-safe pivot."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
            F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_partial"),
        )
        .orderBy("o_orderpriority")
    )


PIVOT_STATUS_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- TPC-H-shape extensions (adapted to available columns; the tables
# carry no partsupp/commitdate/shipmode, so q2/q4/q11/q12/q16/q20 keep
# their join/agg SHAPE but use predicates the data supports) ---


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate. The whole predicate
    set must reach the parquet scan (PushedFilters) — zero joins, one
    partial+final agg, the pushdown litmus test."""
    li = load(spark, sf_dir, "lineitem")
    revenue = F.sum(cents(F.col("l_extendedprice") * F.col("l_discount")))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg((revenue.cast("double") / 100.0).alias("revenue"))
    )


Q6_SQL = f"""
SELECT CAST(SUM({cents_sql('l_extendedprice * l_discount')}) AS DOUBLE) / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def q4_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join orders→lineitem, then priority
    rollup. Catalyst plans the EXISTS as a left-semi hash join."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    windowed = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    big_items = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        windowed.join(big_items, windowed.o_orderkey == big_items.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact⋈dim with conditional aggregation ratio.
    The part dim broadcasts; revenue arithmetic in exact cents."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    disc_price = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = li.filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    ).join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            F.sum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0)))
            .cast("double")
            * 100.0
            / F.sum(disc_price).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


Q14_SQL = f"""
SELECT ROUND(
  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {cents_sql('l_extendedprice * (1 - l_discount)')} ELSE 0 END) AS DOUBLE)
  * 100.0 / CAST(SUM({cents_sql('l_extendedprice * (1 - l_discount)')}) AS DOUBLE),
  6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: agg-subquery keyed filter (orders whose total
    quantity > 250) joined back to customer. The HAVING subquery output
    is tiny → broadcast back against orders."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            (cents("o_totalprice").cast("double") / 100.0).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST({cents_sql('o_totalprice')} AS DOUBLE) / 100.0 AS o_totalprice,
       total_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicates. Catalyst extracts
    the common join key (equi) and CNF-pushes the brand/size filters to
    the part scan; the OR never degrades to a nested loop."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    arm = lambda brand, qlo, qhi, smax: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
        & (F.col("p_size") <= smax)
    )
    revenue = F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
    return joined.filter(
        arm("Brand#23", 1, 11, 5) | arm("Brand#15", 10, 20, 10) | arm("Brand#5", 20, 30, 15)
    ).agg((revenue.cast("double") / 100.0).alias("revenue"))


Q19_SQL = f"""
SELECT CAST(SUM({cents_sql('l_extendedprice * (1 - l_discount)')}) AS DOUBLE) / 100.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#23' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
   OR (p_brand = 'Brand#15' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
   OR (p_brand = 'Brand#5'  AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two nation legs (supplier vs customer) over the
    fact, grouped by nation pair and ship year. Nation/customer/supplier
    all broadcast; the only big shuffle is the final group-by."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    revenue = F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
    return (
        li.filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((revenue.cast("double") / 100.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({cents_sql('l_extendedprice * (1 - l_discount)')}) AS DOUBLE) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (global avg positive
    balance) + anti-join (customers with no orders since 2000), rolled
    up by nation. The scalar agg broadcasts as a literal-like 1-row
    relation; the anti-join is the null-aware NOT EXISTS plan."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg(cents("c_acctbal")).alias("avg_cents"))
    )
    recent = orders.filter(F.col("o_orderdate") >= "2000-01-01").select("o_custkey")
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(cents("c_acctbal") > F.col("avg_cents"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    )
    return (
        rich.join(F.broadcast(nation), rich.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(cents("c_acctbal")).cast("double") / 100.0).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


Q22_SQL = f"""
SELECT n_name, COUNT(*) AS numcust,
       CAST(SUM({cents_sql('c_acctbal')}) AS DOUBLE) / 100.0 AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE {cents_sql('c_acctbal')} > (
        SELECT AVG({cents_sql('c_acctbal')}) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
ORDER BY n_name
"""


# -------------------------------------------------------- funnel / cohorts

FUNNEL_STAGES = ["view", "click", "purchase"]


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: how many users
    performed view → click → purchase IN ORDER (any gaps allowed) — the
    product-analytics staple Spark has no built-in for.

    Plan: ONE shuffle (groupBy user), then a per-user ``array_sort`` +
    ``aggregate`` fold that advances a stage counter through the sorted
    event sequence — greedy first-occurrence matching, which is optimal
    for subsequence tests, all in codegen'd higher-order functions.
    The oracle states the same semantics as a min-timestamp chain
    (first view, first click ≥ it, first purchase ≥ that) — equivalent
    because greedy earliest matching dominates any other witness.
    Per-user event sequences are bounded, so the collected array is
    small at any corpus scale; 100 TB of events still shuffles once.
    Output: (stage_idx, stage, n_users)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*FUNNEL_STAGES)
    )
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_type"))).alias("seq")
    )
    stage = F.aggregate(
        "seq",
        F.lit(0),
        lambda acc, x: F.when((acc == 0) & (x.event_type == "view"), 1)
        .when((acc == 1) & (x.event_type == "click"), 2)
        .when((acc == 2) & (x.event_type == "purchase"), 3)
        .otherwise(acc),
    )
    agg = per_user.select(stage.alias("stage")).agg(
        F.count("*").alias("n_total"),
        F.sum((F.col("stage") >= 1).cast("long")).alias("n_view"),
        F.sum((F.col("stage") >= 2).cast("long")).alias("n_click"),
        F.sum((F.col("stage") >= 3).cast("long")).alias("n_purchase"),
    )
    return agg.select(
        F.stack(
            F.lit(4),
            F.lit(0), F.lit("users_with_any_stage_event"), "n_total",
            F.lit(1), F.lit("viewed"), "n_view",
            F.lit(2), F.lit("clicked_after_view"), "n_click",
            F.lit(3), F.lit("purchased_after_click"), "n_purchase",
        ).alias("stage_idx", "stage", "n_users")
    )


FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, MIN(ts) FILTER (WHERE event_type = 'view') AS t1
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
  GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts >= t1.t1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= t2.t2
  GROUP BY e.user_id
),
a AS (
  SELECT COUNT(*) AS n_total,
         CAST(SUM(CASE WHEN t1.t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
         CAST(SUM(CASE WHEN t2.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         CAST(SUM(CASE WHEN t3.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
  FROM t1
  LEFT JOIN t2 ON t1.user_id = t2.user_id
  LEFT JOIN t3 ON t1.user_id = t3.user_id
)
SELECT * FROM (
  SELECT 0 AS stage_idx, 'users_with_any_stage_event' AS stage, n_total AS n_users FROM a
  UNION ALL SELECT 1, 'viewed', n_view FROM a
  UNION ALL SELECT 2, 'clicked_after_view', n_click FROM a
  UNION ALL SELECT 3, 'purchased_after_click', n_purchase FROM a
)
"""

COHORT_EPOCH = "2024-01-01"


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users are cohorted by their first active
    week; each (cohort, week-offset) cell counts how many of them were
    active that many weeks later — the retention triangle every growth
    dashboard is built on.

    Weeks are integer indexes from a fixed epoch (pure date arithmetic,
    no locale/ISO-week hazard between engines). Two aggregations, both
    keyed compatibly (user → cohort, then (cohort, week)): the user-
    level exchange is reused by Catalyst for the join back. At 100 TB
    the cells aggregate partially map-side; no collect anywhere.
    Output: (cohort_week, week_offset, n_users)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit(COHORT_EPOCH).cast("date")) / 7
        ).cast("int").alias("week"),
    ).distinct()
    cohorts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(cohorts, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


RETENTION_SQL = f"""
WITH ev AS (
  SELECT DISTINCT user_id,
         CAST(floor(datediff('day', DATE '{COHORT_EPOCH}', CAST(ts AS DATE)) / 7.0) AS INT) AS week
  FROM events
),
cohorts AS (
  SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id
)
SELECT c.cohort_week, e.week - c.cohort_week AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM ev e JOIN cohorts c ON e.user_id = c.user_id
GROUP BY c.cohort_week, e.week - c.cohort_week
ORDER BY cohort_week, week_offset
"""


# ----------------------------------------------- session paths (r7)

PATH_TOP_K = 10
PATH_MAX_LEN = 8  # long sessions truncate to their first 8 steps


def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the most common ordered event-type SEQUENCES per
    session (30-min-gap sessions, same rule as ``sessionize_events``),
    truncated to the first ``PATH_MAX_LEN`` steps — the product-
    analytics staple that turns raw event streams into "users do
    view→click→purchase, or view→view→drop" narratives.

    Plan: one shuffle on user_id shared by the gap/cumsum/ordering
    windows, per-session path assembled with an ordered collect inside
    the same partitioning (sessions are bounded by the gap rule, so the
    per-group list is small), then a path-count aggregate and a top-K
    rank. Ties: count desc, path asc. Output:
    (path, n_sessions, rank)."""
    ev = load_events(spark, sf_dir)
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(
        F.unix_micros(F.col("ts")), 1
    ).over(by_user)
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    steps = (
        ev.withColumn("new_session", new_sess)
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                by_user.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("step", F.row_number().over(
            Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
        ))
        .where(F.col("step") <= PATH_MAX_LEN)
    )
    paths = (
        steps.groupBy("user_id", "session_seq")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("step", "event_type"))
                    ),
                    lambda s: s.event_type,
                ),
                ">",
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
    # distributed top-K (TakeOrderedAndProject — per-partition heaps,
    # never a single-partition sort), then rank the ≤K survivors with
    # the broadcast better-than count (the zipf_stats idiom; no
    # partitionless window anywhere)
    top = counts.orderBy(F.desc("n_sessions"), F.asc("path")).limit(PATH_TOP_K)
    a, b = top.alias("a"), top.alias("b")
    better = (F.col("b.n_sessions") > F.col("a.n_sessions")) | (
        (F.col("b.n_sessions") == F.col("a.n_sessions"))
        & (F.col("b.path") < F.col("a.path"))
    )
    return (
        a.join(F.broadcast(b), better, "left")
        .groupBy(F.col("a.path").alias("path"),
                 F.col("a.n_sessions").alias("n_sessions"))
        .agg((F.count(F.col("b.path")) + 1).cast("long").alias("rank"))
        .orderBy("rank")
    )


TOP_SESSION_PATHS_SQL = f"""
WITH {EVENTS_CTE},
flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events_us
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
  FROM flagged
),
steps AS (
  SELECT user_id, session_seq, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                            ORDER BY ts, event_id) AS step
  FROM sessions
),
paths AS (
  SELECT user_id, session_seq,
         string_agg(event_type, '>' ORDER BY step) AS path
  FROM steps WHERE step <= {PATH_MAX_LEN}
  GROUP BY user_id, session_seq
),
counts AS (
  SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path
)
SELECT path, n_sessions, rank FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path ASC) AS rank
  FROM counts
) WHERE rank <= {PATH_TOP_K}
ORDER BY rank
"""


def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over consecutive events per
    user: for every (from_type → to_type) pair, the transition count
    and probability — the aggregate complement of
    ``top_session_paths`` (full-path frequencies there, one-step
    dynamics here; the |types|² matrix is what funnel designers and
    next-event models actually consume).

    Plan: one user-keyed shuffle shared by the lag window, then a
    partial-agg count over a ≤|types|² key space; probabilities derive
    from an exact integer count ratio per from-type (broadcast-sized
    join). Output: (from_type, to_type, n_transitions, p) ordered."""
    ev = load_events(spark, sf_dir)
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.lag("event_type", 1).over(by_user).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    outdeg = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("n_from")
    )
    return (
        counts.join(F.broadcast(outdeg), "from_type")
        .select(
            "from_type", "to_type",
            F.col("n_transitions").cast("long").alias("n_transitions"),
            F.round(
                F.col("n_transitions").cast("double") / F.col("n_from"), 4
            ).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


EVENT_TRANSITIONS_SQL = f"""
WITH {EVENTS_CTE},
steps AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type,
         event_type AS to_type
  FROM events_us
),
counts AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM steps WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
),
outdeg AS (
  SELECT from_type, SUM(n_transitions) AS n_from FROM counts GROUP BY from_type
)
SELECT c.from_type, c.to_type,
       CAST(c.n_transitions AS BIGINT) AS n_transitions,
       ROUND(CAST(c.n_transitions AS DOUBLE) / o.n_from, 4) AS p
FROM counts c JOIN outdeg o USING (from_type)
ORDER BY from_type, to_type
"""


_BRANCH_BACKFILL_TABLES: dict[str, str] = {}
_BRANCH_BACKFILL_LOCK = _threading.Lock()


def branch_backfill_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch/WAP lifecycle driver-graded end-to-end (r12 verdict item
    4 — the last tests-only subsystem): ``create_branch`` → branch-local
    predicate DML (a retention ``delete_where`` + a backfill
    ``update_where``, both MoR-free CoW on the branch) → ``fast_forward``
    promotion to main (the Iceberg audit-branch pattern the reference
    leaves to Iceberg's own branch refs). The graded DataFrame is
    per-side aggregates:

    - ``pre_fork`` — a TIME-TRAVEL read of main's v0, which must still
      serve the untouched original after promotion (isolation: branch
      work never mutated published history);
    - ``promoted`` — main's current read after ``fast_forward``, which
      must equal the branch's backfilled/purged state exactly.

    The DuckDB oracle recomputes both sides from the raw parquet with
    the same predicate arithmetic. Idempotent: staged once per sf_dir."""
    import atexit
    import shutil
    import tempfile

    from datalake_iceberg_spark.tables import LakeTable

    with _BRANCH_BACKFILL_LOCK:
        loc = _BRANCH_BACKFILL_TABLES.get(sf_dir)
        if loc is None:
            loc = tempfile.mkdtemp(prefix="branch_backfill_")
            atexit.register(shutil.rmtree, loc, ignore_errors=True)
            orders = load(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderstatus", "o_totalprice",
                "o_orderpriority",
            )
            t = LakeTable(spark, loc)
            t.create_or_replace(orders, key=["o_orderkey"], n_buckets=4)
            br = t.create_branch("backfill")
            # branch-local retention purge + priority backfill
            br.delete_where([("o_orderstatus", "=", "F"),
                             ("o_totalprice", "<", 50000.0)])
            br.update_where(
                [("o_totalprice", ">=", 150000.0)],
                {"o_orderpriority": "'5-BACKFILLED'"},
            )
            # isolation: main's published read is untouched pre-publish
            assert t.current_version() == 0
            t.fast_forward("backfill")
            t.drop_branch("backfill")
            _BRANCH_BACKFILL_TABLES[sf_dir] = loc
    t = LakeTable(spark, loc)
    pre = t.read(version=0).withColumn("side", F.lit("pre_fork"))
    cur = t.read().withColumn("side", F.lit("promoted"))
    return (
        pre.unionByName(cur)
        .groupBy("side", "o_orderpriority")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(cents("o_totalprice")).alias("total_cents"),
        )
        .orderBy("side", "o_orderpriority")
    )


BRANCH_BACKFILL_SQL = f"""
WITH pre AS (
    SELECT 'pre_fork' AS side, o_orderpriority, o_totalprice FROM orders
), promoted AS (
    SELECT 'promoted' AS side,
           CASE WHEN o_totalprice >= 150000.0 THEN '5-BACKFILLED'
                ELSE o_orderpriority END AS o_orderpriority,
           o_totalprice
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 50000.0)
)
SELECT side, o_orderpriority, COUNT(*) AS n_rows,
       CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) AS total_cents
FROM (SELECT * FROM pre UNION ALL SELECT * FROM promoted)
GROUP BY side, o_orderpriority
ORDER BY side, o_orderpriority
"""


def scan_dnf_or_marker_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r13 explicit ``{"or": [...]}`` filter marker through the
    REAL ``LakeTable.scan`` path — the disjunction-of-single-triples
    shape the list vocabulary cannot express unambiguously (a short
    list of triples parses as a conjunction). Reuses the
    ``scan_dnf_orders`` staged table; the DuckDB oracle runs the same
    OR over the raw parquet."""
    from datalake_iceberg_spark.tables import LakeTable

    scan_dnf_orders(spark, sf_dir)  # stage (idempotent, shared lock)
    loc = _SCAN_DNF_TABLES[sf_dir]
    return (
        LakeTable(spark, loc)
        .scan({"or": [
            ("o_totalprice", "<", 1500.0),
            ("o_orderpriority", "=", "1-URGENT"),
        ]})
        .select("o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


SCAN_DNF_OR_MARKER_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_totalprice < 1500.0 OR o_orderpriority = '1-URGENT'
ORDER BY o_orderkey
"""


_READ_CHANGES_TABLES: dict[str, str] = {}
_READ_CHANGES_LOCK = _threading.Lock()


def _stage_cdc_out_table(spark: SparkSession, sf_dir: str) -> str:
    """Shared staging for the CDC-out graded entries: orders as a keyed
    lake table (v0), then one deterministic CDC batch — keyed MERGE
    (updates: o_orderkey % 50 == 0 re-prioritized +1000 cents; inserts:
    key+10M clones of every o_orderkey % 97 == 3 row) and a keyed
    DELETE (o_orderkey % 50 == 7). Key sets are disjoint mod 50/97
    offsets, so each change row has exactly one classification."""
    import atexit
    import shutil
    import tempfile

    from datalake_iceberg_spark.tables import LakeTable

    with _READ_CHANGES_LOCK:
        loc = _READ_CHANGES_TABLES.get(sf_dir)
        if loc is not None:
            return loc
        loc = tempfile.mkdtemp(prefix="cdc_out_orders_")
        atexit.register(shutil.rmtree, loc, ignore_errors=True)
        orders = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus",
            cents("o_totalprice").alias("total_cents"),
            "o_orderpriority",
        )
        t = LakeTable(spark, loc)
        t.create_or_replace(orders, key=["o_orderkey"], n_buckets=4)
        upd = (
            orders.filter(F.col("o_orderkey") % 50 == 0)
            .withColumn("o_orderpriority", F.lit("CDC-UPD"))
            .withColumn("total_cents", F.col("total_cents") + F.lit(1000))
        )
        ins = (
            orders.filter(F.col("o_orderkey") % 97 == 3)
            .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
            .withColumn("o_orderpriority", F.lit("CDC-NEW"))
        )
        t.merge(upd.unionByName(ins))
        t.delete_keys(
            orders.filter(F.col("o_orderkey") % 50 == 7).select("o_orderkey")
        )
        _READ_CHANGES_TABLES[sf_dir] = loc
        return loc


def read_changes_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 incremental CDC-out driver-graded (r13; previously tests +
    bench only): ``read_changes(0)`` over a keyed MERGE + DELETE range
    classifies every changed row insert / update_postimage / delete
    (deletes carry the pre-image) via the changed-bucket-pruned
    full-outer diff — the feed a downstream incremental consumer
    ingests instead of re-reading the table. The DuckDB oracle derives
    the identical classification from the raw parquet with the same
    batch arithmetic."""
    from datalake_iceberg_spark.tables import LakeTable

    loc = _stage_cdc_out_table(spark, sf_dir)
    return (
        LakeTable(spark, loc)
        .read_changes(0)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "total_cents",
                "o_orderpriority", "_change_type")
        .orderBy("_change_type", "o_orderkey")
    )


READ_CHANGES_SQL = f"""
WITH base AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           {cents_sql('o_totalprice')} AS total_cents, o_orderpriority
    FROM orders
)
SELECT o_orderkey, o_custkey, o_orderstatus,
       total_cents + 1000 AS total_cents,
       'CDC-UPD' AS o_orderpriority, 'update_postimage' AS _change_type
FROM base WHERE o_orderkey % 50 = 0
UNION ALL
SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, total_cents,
       'CDC-NEW', 'insert'
FROM base WHERE o_orderkey % 97 = 3
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, total_cents,
       o_orderpriority, 'delete'
FROM base WHERE o_orderkey % 50 = 7
ORDER BY _change_type, o_orderkey
"""


_ROLLUP_TABLES: dict[str, str] = {}
_ROLLUP_LOCK = _threading.Lock()


def incremental_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incrementally-maintained GROUP-BY rollup driver-graded (r13;
    ``ops/rollup.py`` was tests-only): rebuild the per-customer
    count/sum target at v0, apply the shared CDC batch (MERGE updates +
    inserts, keyed DELETE) to the SOURCE, then ``refresh()`` — which
    reads only the ``read_changes`` delta (pre-images included), delta-
    aggregates, and MERGEs only the affected groups. The graded
    DataFrame is the refreshed TARGET; the DuckDB oracle is the full
    GROUP BY over the post-batch state — incremental must equal
    recompute exactly (sums are integer cents, so no float drift)."""
    import atexit
    import shutil
    import tempfile

    from datalake_iceberg_spark.ops.rollup import MaterializedRollup
    from datalake_iceberg_spark.tables import LakeTable

    with _ROLLUP_LOCK:
        tloc = _ROLLUP_TABLES.get(sf_dir)
        if tloc is None:
            # a PRIVATE source staging: the rollup's refresh() must see
            # v0 -> post-batch as its own (from, to] range, independent
            # of the shared CDC table's life cycle
            sloc = tempfile.mkdtemp(prefix="rollup_src_orders_")
            tloc = tempfile.mkdtemp(prefix="rollup_tgt_orders_")
            atexit.register(shutil.rmtree, sloc, ignore_errors=True)
            atexit.register(shutil.rmtree, tloc, ignore_errors=True)
            orders = load(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey",
                cents("o_totalprice").alias("total_cents"),
            )
            src = LakeTable(spark, sloc)
            src.create_or_replace(orders, key=["o_orderkey"], n_buckets=4)
            tgt = LakeTable(spark, tloc)
            roll = MaterializedRollup(
                src, tgt, group_by=["o_custkey"], sum_cols=["total_cents"]
            )
            roll.rebuild()
            upd = (
                orders.filter(F.col("o_orderkey") % 50 == 0)
                .withColumn("total_cents", F.col("total_cents") + F.lit(1000))
            )
            ins = (
                orders.filter(F.col("o_orderkey") % 97 == 3)
                .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
            )
            src.merge(upd.unionByName(ins))
            src.delete_keys(
                orders.filter(F.col("o_orderkey") % 50 == 7).select("o_orderkey")
            )
            out = roll.refresh()
            assert out["mode"] == "incremental", out
            _ROLLUP_TABLES[sf_dir] = tloc
    return (
        LakeTable(spark, _ROLLUP_TABLES[sf_dir])
        .read()
        .select("o_custkey", "n_rows", "sum_total_cents")
        .orderBy("o_custkey")
    )


INCREMENTAL_ROLLUP_SQL = f"""
WITH base AS (
    SELECT o_orderkey, o_custkey,
           {cents_sql('o_totalprice')} AS total_cents
    FROM orders
), post AS (
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 50 = 0 THEN total_cents + 1000
                ELSE total_cents END AS total_cents
    FROM base WHERE o_orderkey % 50 <> 7
    UNION ALL
    SELECT o_orderkey + 10000000, o_custkey, total_cents
    FROM base WHERE o_orderkey % 97 = 3
)
SELECT o_custkey, COUNT(*) AS n_rows,
       CAST(SUM(total_cents) AS BIGINT) AS sum_total_cents
FROM post
GROUP BY o_custkey
ORDER BY o_custkey
"""
