"""Event-time streaming operators — the engine's extension beyond the
reference.

The reference does **no** event-time processing (SURVEY §2.10: no
``withWatermark``, no windows, no stateful ops — late data is handled
by batch-dedup + MERGE idempotence). A training-data pipeline at
100 TB/day needs real event-time semantics, so the engine adds them as
first-class Structured Streaming operators:

- ``windowed_aggregate`` — tumbling/sliding window counts+aggregates
  with a watermark bound on state (late rows beyond the watermark are
  dropped, state is GC'd — without it, window state grows forever).
- ``dedup_within_watermark`` — streaming exact-dedup with bounded
  state (``dropDuplicatesWithinWatermark``), the streaming complement
  of the batch WF1 idiom.
- ``stateful_running_stats`` — custom per-key stateful operator via
  ``applyInPandasWithState`` (Arrow-batched, GroupState timeout):
  running count/sum/max per key across micro-batches, the shape used
  for per-source ingest accounting or per-user session rollups.

Scale notes: all state here is keyed and watermark-bounded, so state
store size is O(active keys × window horizon), not O(stream). The
shuffle per micro-batch is on the grouping key — same key layout the
sinks bucket by, so downstream MERGE sees co-located data.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_aggregate(
    stream_df: DataFrame,
    ts_col: str,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Watermarked tumbling (or sliding) window aggregation.

    Output: window struct + keys + count (+ caller aggs). In append
    mode a window only emits once the watermark passes its end —
    exactly-once window results into the lake.
    """
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    grouped = stream_df.withWatermark(ts_col, watermark).groupBy(
        win.alias("window"), *[F.col(k) for k in (keys or [])]
    )
    return grouped.agg(F.count("*").alias("n_events"), *(aggs or []))


def session_window_aggregate(
    stream_df: DataFrame,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Gap-based session windows (``F.session_window``) — the streaming
    complement of the batch ``sessionize_events`` query. Sessions merge
    dynamically as events arrive; a session closes (and in append mode
    emits) once the watermark passes its end + gap. State is bounded by
    (active keys × open sessions), GC'd by the watermark. Spark supports
    only append/complete output for session aggregations — update mode
    raises (a session's extent isn't final until the watermark seals it)."""
    grouped = stream_df.withWatermark(ts_col, watermark).groupBy(
        F.session_window(F.col(ts_col), gap).alias("session"),
        *[F.col(k) for k in (keys or [])],
    )
    return grouped.agg(F.count("*").alias("n_events"), *(aggs or []))


def enrich_stream(
    stream_df: DataFrame, dim_df: DataFrame, on: list[str] | str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    CURRENT state of the static side (re-resolved per batch — a lake dim
    table picks up its latest snapshot). The dim is broadcast, so the
    stream side never shuffles; at scale keep the dim under the
    broadcast threshold or pre-bucket both sides on the join key."""
    return stream_df.join(F.broadcast(dim_df), on=on, how=how)


def dedup_within_watermark(
    stream_df: DataFrame, keys: list[str], ts_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact-dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped; state for keys older than
    the watermark is GC'd."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


STATS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
    ]
)

STATS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
    ]
)


def _stats_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        (k,) = key
        n, total, vmax = state.get
        state.remove()
        yield pd.DataFrame([{"key": k, "n": n, "total": total, "vmax": vmax}])
        return
    n, total, vmax = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            vmax = max(vmax, float(pdf["value"].max()))
    state.update((n, total, vmax))
    (k,) = key
    yield pd.DataFrame([{"key": k, "n": n, "total": total, "vmax": vmax}])


def stateful_running_stats(
    stream_df: DataFrame, key_col: str = "key", value_col: str = "value"
) -> DataFrame:
    """Custom stateful operator: per-key running (count, sum, max) across
    micro-batches via ``applyInPandasWithState`` — Arrow-batched, state
    persisted in the state store, emitted each update."""
    renamed = stream_df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return renamed.groupBy("key").applyInPandasWithState(
        _stats_fn,
        outputStructType=STATS_OUTPUT_SCHEMA,
        stateStructType=STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_to_list(
    out_df: DataFrame,
    checkpoint: str,
    rows_sink: list,
    output_mode: str = "append",
    timeout_sec: int = 120,
) -> None:
    """Drain an availableNow query through foreachBatch into a Python
    list. Unlike the memory sink, foreachBatch supports checkpoint
    recovery — use this for incremental-run tests where the watermark
    must persist across drains."""

    def _collect(batch_df: DataFrame, batch_id: int) -> None:
        rows_sink.extend(batch_df.collect())

    q = (
        out_df.writeStream.foreachBatch(_collect)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def run_to_memory(
    out_df: DataFrame,
    query_name: str,
    checkpoint: str,
    output_mode: str = "append",
    max_files_per_trigger: int | None = None,
    timeout_sec: int = 120,
) -> None:
    """Drain an availableNow streaming query into a named memory sink
    (test/inspection seam; production sinks go through foreachBatch →
    LakeTable, see :mod:`datalake_iceberg_spark.streaming.runner`)."""
    q = (
        out_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
