"""As-of and range joins — operators Spark lacks natively, built
Spark-first (SURVEY §2.4 notes the reference has no such joins; a
training-data pipeline needs them for point-in-time feature joins).

- ``asof_join``: for each left row, the most recent right row with
  ``right.ts <= left.ts`` per key. NOT implemented as an inequality
  join (which Catalyst plans as BroadcastNestedLoop — O(n·m) and a
  100 TB death sentence). Instead the classic distributed as-of
  algorithm: tag both sides, union, and carry the last right row
  forward with ``last_value(..., ignoreNulls)`` over a per-key
  event-time window — ONE shuffle on the key, linear work.
  The DuckDB oracle uses its native ``ASOF LEFT JOIN`` — a different
  algorithm entirely, which makes the parity check genuinely
  independent.
- ``range_join_binned``: count/join rows within a ±horizon window.
  Naive theta join is quadratic; here both sides are assigned to
  fixed-width time bins, joined on (key, bin) with each left row
  probing its own and adjacent bins, then exact-filtered. Equi-join
  on small composite keys → hash shuffle, AQE-splittable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_iceberg_spark.queries.analytics import EVENTS_CTE, load_events


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Point-in-time join: latest right row (by ``right_ts``) at or
    before each left row's ``left_ts``, per ``key``. Right-side columns
    come back suffixed; left rows with no prior right row get nulls."""
    tie = right_cols[0]  # deterministic pick among equal-ts right rows
    lt = left.select(
        F.lit(1).alias("__is_left"),
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(right.schema[tie].dataType).alias("__tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    rt = right.select(
        F.lit(0).alias("__is_left"),
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.col(tie).alias("__tie"),
        F.lit(None).cast(
            lt.schema["__l"].dataType
        ).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    # right rows sort before left rows at equal ts → "<=" semantics;
    # __tie makes the winner among equal-ts right rows deterministic
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "__is_left",
        "__l",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__rv_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        F.col("__l.*"),
        *[F.col(f"__rv_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase: the user's most recent click at or before it.
    Output: (event_id, user_id, ts, event_id_asof, ts_asof)."""
    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["event_id", "ts"],
    )
    return joined.select(
        "event_id", "user_id", "ts",
        F.col("event_id_asof"), F.col("ts_asof"),
    ).orderBy("event_id")


ASOF_PURCHASE_CLICK_SQL = f"""
WITH {EVENTS_CTE},
purchases AS (
  SELECT event_id, user_id, ts FROM events_us WHERE event_type = 'purchase'
),
clicks AS (
  SELECT event_id, user_id, ts FROM events_us WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts,
       c.event_id AS event_id_asof, c.ts AS ts_asof
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon_sec: int,
    agg_exprs: list[Column],
) -> DataFrame:
    """Aggregate right rows with ``left_ts - horizon <= right_ts <
    left_ts`` per left row, via bin-bucketed equi-join (left probes its
    bin and the previous one, exact predicate applied after)."""
    lbin = (F.unix_timestamp(F.col(left_ts)) / horizon_sec).cast("long")
    rbin = (F.unix_timestamp(F.col(right_ts)) / horizon_sec).cast("long")
    probes = left.withColumn(
        "__bin", F.explode(F.array(lbin - 1, lbin))
    ).withColumnRenamed(key, "__lkey")
    rb = right.select(
        F.col(key).alias("__rkey"),
        F.col(right_ts).alias("__rts"),
        rbin.alias("__bin"),
        *[F.col(c) for c in right.columns if c not in (key, right_ts)],
    )
    cond = (
        (F.col("__rts") >= F.col(left_ts) - F.expr(f"INTERVAL {horizon_sec} SECONDS"))
        & (F.col("__rts") < F.col(left_ts))
    )
    # left join + null-out (not filter): a left row whose bin-mates all
    # fail the exact predicate must still aggregate (e.g. to count 0)
    joined = probes.join(
        rb,
        (probes["__lkey"] == rb["__rkey"]) & (probes["__bin"] == rb["__bin"]),
        "left",
    ).withColumn("__rts", F.when(cond, F.col("__rts")))
    group_cols = [c for c in left.columns if c != key] + ["__lkey"]
    return (
        joined.groupBy(*[F.col(c) for c in group_cols])
        .agg(*agg_exprs)
        .withColumnRenamed("__lkey", key)
    )


def errors_context_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each error event: how many same-user events happened in the
    preceding 30 minutes (the blast-radius probe). Output:
    (event_id, user_id, ts, n_prior_events)."""
    ev = load_events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    others = ev.select("user_id", "ts")
    out = range_join_binned(
        errors,
        others,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        horizon_sec=1800,
        agg_exprs=[F.count(F.col("__rts")).alias("n_prior_events")],
    )
    return out.select("event_id", "user_id", "ts", "n_prior_events").orderBy("event_id")


ERRORS_CONTEXT_SQL = f"""
WITH {EVENTS_CTE},
errors AS (
  SELECT event_id, user_id, ts FROM events_us WHERE event_type = 'error'
)
SELECT e.event_id, e.user_id, e.ts,
       (SELECT COUNT(*) FROM events_us o
        WHERE o.user_id = e.user_id
          AND o.ts >= e.ts - INTERVAL 30 MINUTE
          AND o.ts < e.ts) AS n_prior_events
FROM errors e
ORDER BY e.event_id
"""
