"""Skew mitigation: salted two-phase aggregation and salted broadcast
join — the explicit fallbacks for when AQE's runtime skew handling is
not enough (e.g. a groupBy whose key domain is SMALLER than the
cluster's parallelism, where no amount of split-on-size helps because
one reducer owns each hot key end-to-end).

AQE (on by default in :mod:`datalake_iceberg_spark.session`) already
splits skewed SHUFFLE-JOIN partitions; what it cannot do is parallelize
a single hot GROUP-BY key. ``salted_agg`` does: phase 1 aggregates on
(key, salt) — spreading each hot key over ``n_salt`` reducers — and
phase 2 merges the ``n_salt`` partials per key. Only algebraic
aggregates (sum / count / min / max) decompose this way, which is why
the function takes a declared spec instead of arbitrary expressions.

The salt mixes ``xxhash64`` over all input columns with
``spark_partition_id()`` mod ``n_salt``. The hash alone would send
fully-identical duplicate rows (the common count-duplicates hot key) to
ONE reducer, defeating the salting; the partition id spreads them by
input location instead. Both components are deterministic within a task
attempt — a retried task re-reads the same input split with the same
partition id, so partials are stable under retries, and algebraic
aggregates (the only ones allowed here) are insensitive to how rows are
distributed across salts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PHASE2 = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PHASE1 = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    spec: dict[str, tuple[Column | str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``spec`` maps output column name → (input column, fn) with fn in
    {"sum", "count", "min", "max"}. Result is exactly equal to
    ``df.groupBy(keys).agg(...)``; the plan trades one extra (cheap,
    ``n_salt × |keys|``-row) shuffle for hot-key parallelism.
    """
    bad = [fn for _, fn in spec.values() if fn not in _PHASE1]
    if bad:
        raise ValueError(f"non-algebraic aggregate(s) {bad}; salting needs sum/count/min/max")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns], F.spark_partition_id()),
        F.lit(n_salt),
    ).alias("__salt")
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[_PHASE1[fn](col).alias(name) for name, (col, fn) in spec.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[_PHASE2[fn](name).alias(name) for name, (_, fn) in spec.items()]
    )


def salted_broadcast_replicate(small: DataFrame, n_salt: int = 16) -> DataFrame:
    """Replicate the small side of a skewed join ``n_salt`` times with a
    ``__salt`` column, so the big side can join on (key, __salt) with
    its own uniform salt — every hot key's rows spread over ``n_salt``
    tasks. The replication multiplies the broadcast by ``n_salt``; use
    only when the small side stays comfortably under the broadcast
    threshold after replication."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("__salt")
    return small.select("*", salts)
