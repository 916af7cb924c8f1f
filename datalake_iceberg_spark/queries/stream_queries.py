"""Driver-gradeable Structured Streaming queries.

Each function drains a STREAM (``readStream`` file source over the
TESTDATA parquet, ``availableNow`` trigger) through real streaming
operators — watermark + tumbling window — via ``foreachBatch`` into a
parquet sink directory, then reads that back as a batch DataFrame.
Because event-time windowing is deterministic, the result is
value-identical to the batch formulation, so the DuckDB oracle grades
the STREAMING path exactly — stream/batch parity as a first-class
correctness check, not just a unit test.

Scale notes: the same plan runs unbounded — the file source becomes
Kafka (option swap, see ``streaming/runner.py``), ``availableNow``
becomes a processing-time trigger, and the foreachBatch body writes a
``LakeTable`` instead of a bare parquet dir. The graded path is the
PRODUCTION sink shape: executors write the sink files directly and
driver memory is never in the loop, at any window count (the r5 memory
sink collected every drained row to the driver — safe for these
watermark-bounded aggregates, but an idiom a user could copy into an
unbounded drain). Watermarked window state is O(active windows ×
keys), GC'd as the watermark advances.

Resource hygiene (these run repeatedly inside one driver session): the
staged source dir is cached per ``sf_dir`` and removed at exit, each
drain's checkpoint dir is deleted right after termination, and sink
dirs are deterministic per (query, sf_dir) — a re-run wipes and
replaces the previous drain's output instead of accumulating.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STAGED_SOURCES: dict[str, str] = {}
_SINK_DIRS: dict[str, str] = {}


def _cleanup_staged() -> None:  # pragma: no cover - exit hook
    for d in _STAGED_SOURCES.values():
        shutil.rmtree(d, ignore_errors=True)
    _STAGED_SOURCES.clear()
    for d in _SINK_DIRS.values():
        shutil.rmtree(d, ignore_errors=True)
    _SINK_DIRS.clear()


atexit.register(_cleanup_staged)


def _sink_name(prefix: str, sf_dir: str) -> str:
    return f"{prefix}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"


def _stream_events(spark: SparkSession, sf_dir: str):
    """File-source stream over the events table with the same
    type-adaptive ts decode as the batch ``load_events`` (shared
    helper — the two paths cannot diverge). Spark's file source
    requires a DIRECTORY, so the single TESTDATA parquet is staged
    (copied once per sf_dir, removed at exit) — in production the
    directory is the landing zone / Kafka topic and nothing is staged."""
    from datalake_iceberg_spark.queries.analytics import load_events, normalize_events_ts

    # batch read first: resolves the on-disk ts encoding (and, for a
    # legacy int64-nanos fixture, sets the session conf the file source
    # needs before schema inference)
    load_events(spark, sf_dir)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stage = _STAGED_SOURCES.get(sf_dir)
    if stage is None or not os.path.isdir(stage):
        stage = tempfile.mkdtemp(prefix="stream_events_src_")
        src = os.path.join(sf_dir, "events.parquet")
        if os.path.isdir(src):
            # directory-shaped parquet dataset (the layout Spark itself
            # writes): stage the part-files, skip _SUCCESS markers
            for part in os.listdir(src):
                if part.endswith(".parquet"):
                    shutil.copy(os.path.join(src, part), stage)
        else:
            shutil.copy(src, stage)
        _STAGED_SOURCES[sf_dir] = stage
    stream = spark.readStream.schema(raw_schema).parquet(stage)
    return normalize_events_ts(stream)


def _drain(
    df: DataFrame,
    sink: str,
    output_mode: str = "complete",
    shuffle_partitions: int | None = 8,
) -> DataFrame:
    """availableNow drain through ``foreachBatch`` into a parquet sink
    directory — the production sink pattern (``foreachBatch`` →
    table/file write): a complete-mode batch OVERWRITES the sink (the
    engine re-emits full state, so the last batch is the result),
    update/append batches APPEND. Executors write the files; the driver
    never holds the drained rows. Returns the sink read back as a batch
    DataFrame. The checkpoint dir is per-run (replaying one would skip
    the backlog) and deleted as soon as the drain terminates; the sink
    dir is wiped at the start of each drain so a re-run replaces the
    previous output.

    ``shuffle_partitions`` bounds the STATEFUL-operator parallelism for
    the drain (state-store instances = shuffle partitions, captured at
    query start and pinned by the checkpoint): the fixture key
    cardinalities are small, so 8 loaded stores beat 32 mostly-empty
    ones on both wall clock and task-skew profile. A production
    deployment sizes this to key cardinality × throughput instead; pass
    ``None`` to inherit the session setting. The session conf is
    restored after the drain either way."""
    spark = df.sparkSession
    out = _SINK_DIRS.get(sink)
    if out is None:
        out = tempfile.mkdtemp(prefix=f"sink_{sink}_")
        _SINK_DIRS[sink] = out
    shutil.rmtree(out, ignore_errors=True)
    write_mode = "overwrite" if output_mode == "complete" else "append"

    def _write_batch(batch: DataFrame, _batch_id: int) -> None:
        batch.write.mode(write_mode).parquet(out)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    ckpt = tempfile.mkdtemp(prefix="ckpt_stream_q_")
    # State-store provider knob (r16, VERDICT item 7): default stays
    # the in-memory HDFSBackedStateStoreProvider — at fixture scale the
    # state per store is KBs and the A/B (plans/r16) measured RocksDB
    # strictly slower here (native column-family setup + checkpoint
    # uploads per micro-batch dominate tiny state). At production state
    # sizes (GBs per partition) RocksDB is the right provider — flip
    # via SPARK_GRAFT_STATE_STORE=rocksdb without code changes; the
    # checkpoint is per-run so the provider swap never corrupts state.
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    want_rocks = os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower() == "rocksdb"
    prev_provider = None
    try:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        if want_rocks:
            try:
                prev_provider = spark.conf.get(provider_key)
            except Exception:
                prev_provider = None
            spark.conf.set(
                provider_key,
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
        q = (
            df.writeStream.foreachBatch(_write_batch)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if want_rocks:
            if prev_provider:
                spark.conf.set(provider_key, prev_provider)
            else:
                spark.conf.unset(provider_key)
        shutil.rmtree(ckpt, ignore_errors=True)
    if not os.path.isdir(out) or not any(
        f.endswith(".parquet") for f in os.listdir(out)
    ):
        # no batch fired (empty source): an empty frame with the
        # drain's own schema keeps downstream selects well-typed
        return spark.createDataFrame([], df.schema)
    return spark.read.parquet(out)


def stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event rollup computed BY THE STREAMING ENGINE: file-source
    stream → type-adaptive ts decode → 1-hour tumbling window with
    watermark → availableNow drain → parquet sink. Output matches the
    batch/oracle rollup bit-for-bit (sums ride in exact integer cents).
    """
    from datalake_iceberg_spark.queries.analytics import cents
    from datalake_iceberg_spark.streaming.event_time import windowed_aggregate

    agg = windowed_aggregate(
        _stream_events(spark, sf_dir),
        "ts",
        window_duration="1 hour",
        watermark="1 minute",
        keys=["event_type"],
        aggs=[F.sum(cents("value")).alias("sum_value_c")],
    )
    res = _drain(agg, _sink_name("stream_hourly_rollup", sf_dir))
    return (
        res
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n_events",
            (F.col("sum_value_c").cast("double") / 100.0).alias("sum_value"),
        )
        .orderBy("hour_start", "event_type")
    )


def stream_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup parity check: drain the events stream
    through ``dropDuplicatesWithinWatermark`` on the event key and
    count survivors per event_type — matches batch COUNT(DISTINCT).
    State is watermark-bounded; at scale this is the streaming
    ingest-dedup front door."""
    from datalake_iceberg_spark.streaming.event_time import dedup_within_watermark

    deduped = dedup_within_watermark(
        _stream_events(spark, sf_dir), ["event_id"], "ts", watermark="1 minute"
    )
    res = _drain(
        deduped.groupBy("event_type").agg(F.count("*").alias("n_unique")),
        _sink_name("stream_dedup", sf_dir),
    )
    return res.select("event_type", "n_unique").orderBy("event_type")


def stream_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-stateful-operator parity check: per-event-type running
    (count, sum, max) computed BY ``applyInPandasWithState`` (Arrow
    batches, state store, update mode) and drained with availableNow;
    the LAST update per key is the final state, which must equal the
    batch aggregate — grading the custom stateful path itself against
    the DuckDB oracle. Values ride as exact integer micros (pandas sums
    of integer-valued doubles are exact below 2^53), so stream-order
    float accumulation cannot drift from the batch sum."""
    from pyspark.sql import Window

    from datalake_iceberg_spark.streaming.event_time import stateful_running_stats

    ev = _stream_events(spark, sf_dir)
    micros = ev.select(
        "event_type",
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("double").alias("v"),
    )
    out = stateful_running_stats(micros, key_col="event_type", value_col="v")
    res = _drain(out, _sink_name("stream_running_stats", sf_dir), output_mode="update")
    w = Window.partitionBy("key").orderBy(F.desc("n"))
    final = (
        res
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return final.select(
        F.col("key").alias("event_type"),
        F.col("n").alias("n_events"),
        (F.col("total") / 1_000_000.0).alias("sum_value"),
        (F.col("vmax") / 1_000_000.0).alias("max_value"),
    ).orderBy("event_type")


def _stream_running_stats_sql() -> str:
    from datalake_iceberg_spark.queries.analytics import EVENTS_CTE

    return f"""
WITH {EVENTS_CTE}
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value,
       CAST(MAX(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS max_value
FROM events_us GROUP BY event_type ORDER BY event_type
"""


STREAM_RUNNING_STATS_SQL = _stream_running_stats_sql()


def _stream_hourly_rollup_sql() -> str:
    from datalake_iceberg_spark.queries.analytics import EVENTS_CTE

    return f"""
WITH {EVENTS_CTE}
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events_us GROUP BY 1, 2 ORDER BY 1, 2
"""


STREAM_HOURLY_ROLLUP_SQL = _stream_hourly_rollup_sql()

STREAM_DEDUP_COUNT_SQL = """
SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
FROM events GROUP BY event_type ORDER BY event_type
"""


ATTRIBUTION_WINDOW = "1 hour"


def stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM join parity check: purchases joined to the same
    user's clicks in the preceding hour, computed BY THE STREAMING
    ENGINE — two watermarked streams off the event source, an interval
    join condition (equi user key + event-time range), append-mode
    drain. The per-user match counts must equal the batch interval
    self-join, so the stateful symmetric-hash join itself is graded by
    the DuckDB oracle.

    Scale: join state is bounded by the watermark + the 1 h range
    condition (each side buffers ~1 h of rows per user key and is GC'd
    as the watermark advances); the equi key keeps the join hash-
    partitioned — the range predicate evaluates within partition.
    Output: (user_id, n_attributed)."""
    ev = _stream_events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "1 minute")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 minute")
    )
    pairs = purchases.join(
        clicks,
        F.expr(
            f"p_user = c_user AND "
            f"click_ts BETWEEN p_ts - INTERVAL {ATTRIBUTION_WINDOW} AND p_ts"
        ),
        "inner",
    )
    res = _drain(pairs, _sink_name("stream_click_attr", sf_dir), output_mode="append")
    return (
        res
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(F.count("*").alias("n_attributed"))
        .orderBy("user_id")
    )


def _stream_click_attribution_sql() -> str:
    from datalake_iceberg_spark.queries.analytics import EVENTS_CTE

    return f"""
WITH {EVENTS_CTE}
SELECT p.user_id AS user_id, COUNT(*) AS n_attributed
FROM events_us p JOIN events_us c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
GROUP BY p.user_id ORDER BY user_id
"""


STREAM_CLICK_ATTRIBUTION_SQL = _stream_click_attribution_sql()


# eviction margin for the OUTER join's null verdicts: watermark delay
# (1 min) + the 1 h join range + slack — purchases older than
# max(click ts) - this margin are guaranteed fully adjudicated by the
# final no-data flush batch
UNATTRIBUTED_MARGIN_MIN = 65


def stream_unattributed_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join parity check: purchases
    with NO click from the same user in the preceding hour, computed BY
    THE STREAMING ENGINE. This grades the semantics the inner-join
    check (``stream_click_attribution``) cannot: an outer null verdict
    only becomes emittable when the CLICK side's watermark passes the
    purchase's match window (no future click can attribute it any
    more), so correct rows here prove watermark-driven state EVICTION
    emits, not just state lookup. availableNow drains end with a
    no-data flush batch that adjudicates the remaining evictable state.

    End-of-stream truth: purchases inside the last watermark-delay +
    range window are never adjudicated (the watermark cannot pass
    them), so both engine and oracle score only purchases at least
    ``UNATTRIBUTED_MARGIN_MIN`` minutes older than the newest click —
    the margin is part of the operator's declared contract, exactly the
    bound a production pipeline states for outer-join completeness.

    Scale: same bounded symmetric-hash join state as the inner variant
    (~1 h per user key per side, GC'd by the watermark); the null
    verdicts add no state, only eviction-time output. Output:
    (user_id, n_unattributed)."""
    ev = _stream_events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "1 minute")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 minute")
    )
    pairs = purchases.join(
        clicks,
        F.expr(
            f"p_user = c_user AND "
            f"click_ts BETWEEN p_ts - INTERVAL {ATTRIBUTION_WINDOW} AND p_ts"
        ),
        "leftOuter",
    )
    res = _drain(pairs, _sink_name("stream_unattr", sf_dir), output_mode="append")
    # deterministic adjudication cutoff from the batch table (one-row
    # driver probe; the oracle computes the identical expression)
    from datalake_iceberg_spark.queries.analytics import load_events

    cut = (
        load_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .agg(
            (F.max("ts") - F.expr(f"INTERVAL {UNATTRIBUTED_MARGIN_MIN} MINUTES")).alias("cut")
        )
        .collect()[0]["cut"]
    )
    return (
        res.filter(F.col("c_user").isNull())
        .filter(F.col("p_ts") <= F.lit(cut))
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(F.count("*").alias("n_unattributed"))
        .orderBy("user_id")
    )


def _stream_unattributed_sql() -> str:
    from datalake_iceberg_spark.queries.analytics import EVENTS_CTE

    return f"""
WITH {EVENTS_CTE},
mx AS (
  SELECT max(ts) - INTERVAL {UNATTRIBUTED_MARGIN_MIN} MINUTE AS cut
  FROM events_us WHERE event_type = 'click'
)
SELECT p.user_id AS user_id, COUNT(*) AS n_unattributed
FROM events_us p, mx
WHERE p.event_type = 'purchase' AND p.ts <= mx.cut
  AND NOT EXISTS (
    SELECT 1 FROM events_us c
    WHERE c.user_id = p.user_id AND c.event_type = 'click'
      AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
  )
GROUP BY p.user_id ORDER BY user_id
"""


STREAM_UNATTRIBUTED_SQL = _stream_unattributed_sql()


SESSION_GAP = "30 minutes"


def stream_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION-window parity check: per-user session counts computed BY
    THE STREAMING ENGINE's ``session_window`` (dynamic-gap merging
    state), drained complete — must equal the batch gap-based
    sessionization. Spark's session semantics: an event extends the
    session iff it lands strictly inside ``last_event + gap``, so the
    batch oracle opens a new session when the time delta is ``>= gap``.

    Scale: session state is per (user, open session) and merges as
    events arrive; with a watermark + append mode (production shape)
    closed sessions emit incrementally and state stays bounded; the
    complete-mode drain here re-emits full state per batch, which is
    fine for the fixture's bounded key space. Output: (user_id, n_sessions, n_events)."""
    ev = _stream_events(spark, sf_dir)
    sess = (
        ev.withWatermark("ts", "1 minute")
        .groupBy(F.session_window("ts", SESSION_GAP), F.col("user_id"))
        .agg(F.count("*").alias("n_ev"))
    )
    res = _drain(sess, _sink_name("stream_session_stats", sf_dir))
    return (
        res
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_ev").alias("n_events"),
        )
        .orderBy("user_id")
    )


def _stream_session_stats_sql() -> str:
    from datalake_iceberg_spark.queries.analytics import EVENTS_CTE

    return f"""
WITH {EVENTS_CTE},
seq AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_start
  FROM events_us
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id, CAST(SUM(is_start) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM seq GROUP BY user_id ORDER BY user_id
"""


STREAM_SESSION_STATS_SQL = _stream_session_stats_sql()


TREND_TOP_K = 3


def stream_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-window trending audit computed by the streaming engine:
    2-hour windows sliding every hour (each event feeds TWO overlapping
    windows — the overlapping-state shape tumbling windows don't
    exercise), counts per event_type, drained availableNow; the top-K
    cut per window is a batch post-step over the drained aggregate
    (rank over final windowed counts — the same split a production
    trending job uses: stream maintains the counts, serving ranks).
    State is watermark-bounded at 2 active windows per key."""
    from pyspark.sql import Window

    ev = _stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 minute")
        .groupBy(
            F.window("ts", "2 hours", "1 hour").alias("window"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
    )
    res = _drain(agg, _sink_name("stream_topk_trending", sf_dir))
    w = Window.partitionBy("window").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        res
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TREND_TOP_K)
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "rank",
        )
        .orderBy("window_start", "rank")
    )


def _stream_topk_trending_sql() -> str:
    from datalake_iceberg_spark.queries.analytics import EVENTS_CTE

    return f"""
WITH {EVENTS_CTE},
-- each event belongs to the 2h windows starting at trunc(ts) and
-- trunc(ts) - 1h (duration 2h, slide 1h)
assigned AS (
  SELECT event_type,
         UNNEST([date_trunc('hour', ts),
                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start
  FROM events_us
),
counts AS (
  SELECT window_start, event_type, COUNT(*) AS n_events
  FROM assigned GROUP BY 1, 2
),
ranked AS (
  SELECT window_start, event_type, n_events,
         ROW_NUMBER() OVER (PARTITION BY window_start
                            ORDER BY n_events DESC, event_type ASC) AS rank
  FROM counts
)
SELECT window_start, event_type, n_events, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TREND_TOP_K}
ORDER BY window_start, rank
"""


STREAM_TOPK_TRENDING_SQL = _stream_topk_trending_sql()
