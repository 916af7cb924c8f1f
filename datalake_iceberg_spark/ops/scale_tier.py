"""Derive a larger scale-factor tier from an existing testdata dir.

The committed bench history is all sf0.1 (~600k lineitem); the 100 TB
design claims (dir pruning ∝ hot eras, probe ∝ nprobe/cells, one-scan
text shapes) were structurally argued but never MEASURED above sf0.1.
This module manufactures an sfN tier deterministically from the driver
fixture — ``replication`` key-shifted copies of every table — so the
bench can record per-query scaling factors (t_sfN / t_sf0.1) next to
the host-calibration constant, and a query scaling worse than ~linear
is named by measurement instead of argument.

Why replication (not a fresh generator): the fixture's distributions
per copy are preserved exactly and the derivation is reproducible from
the read-only driver data — no second synthetic-data generator to
drift from TESTDATA.md. Replication's raw distortions are corrected
deterministically per copy (copy 0 always stays verbatim):

- TEXT near-duplication: every doc would be replication-way
  near-duplicated, blowing up MinHash pair volume ~replication² — fixed
  by the position-keyed word shuffle (``_shuffle_text``).
- CONSTANT vocabulary: distinct tokens would not grow with copies
  (Heaps' law adds new types; replicas repeat them), so the
  vocabulary-keyed joins (tfidf df side, pmi pair vocab, ngram_lm
  grams) would be measured at sf0.1 CARDINALITY under sfN volume —
  fixed by renaming a deterministic per-copy fraction of word TYPES to
  copy-unique variants (``_PERTURB_PCT``), giving ~Heaps-like
  V(10N) ≈ √10 · V(N) distinct-type growth at replication 10.
- VERBATIM embeddings: each vector would recur as ``replication``
  exact duplicates (cosine 1.0, all in one cluster), an artifact for
  kmeans/semantic-dedup shapes — fixed by a copy-keyed tiny
  per-element offset (``_perturb_embeddings``): replicas stay
  near-duplicates of their source (which is what replication means)
  without being bit-identical, and cluster-size distributions stay
  corpus-shaped rather than collapsing onto exact-dup stacks.

Key shifting preserves referential integrity (every foreign key shifts
by the same per-copy offset as its dimension's primary key) and the
graded modular splits (offsets are rounded to a multiple of 100, so
``id % 10`` / ``% 50`` / ``% 100`` cohorts keep their meaning inside
every copy). Fixed query sets stay fixed: ``vec_id < N_QUERIES`` keeps
selecting the 10 copy-0 vectors, against a corpus N× the size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: round every key offset UP to a multiple of this so the modular
#: splits the graded entries rely on (% 10, % 50, % 100) survive
_OFFSET_ROUND = 100

_MARKER = "_SCALE_TIER_SUCCESS.json"

#: Derivation-algorithm version, part of the reuse fingerprint. BUMP
#: THIS whenever _SHIFTS, _OFFSET_ROUND, _shuffle_text, or _replicate
#: change behavior: the marker otherwise matches on {src, replication,
#: tables} alone and a host that built the tier under the OLD
#: derivation would silently reuse it forever (this fired in-round:
#: the pre-shuffle tier survived the shuffle fix until deleted by
#: hand). v2 = position-keyed replica text shuffle + pre-replication
#: repartition. v3 = Heaps-like per-copy vocabulary perturbation +
#: copy-keyed embedding offsets.
_ALGO_VERSION = 3

#: Per-replica percentage of word TYPES renamed to copy-unique
#: variants (all occurrences of a gated type within one copy rename
#: together, so each copy's frequency distribution is an isomorphic
#: relabeling of the source's). Derivation: Heaps' law with β ≈ 0.5
#: gives V(10N) ≈ √10 · V(N) ≈ 3.16 · V(N); nine perturbed replicas
#: each contributing p·V new types solves 1 + 9p = 3.16 → p ≈ 0.24.
_PERTURB_PCT = 24

#: Relative scale of the per-element embedding offset. Small enough
#: that a replica stays a near-duplicate of its source vector (the
#: honest meaning of replication), large enough that no two copies are
#: bit-identical.
_EMB_EPS = 1e-3

#: table -> list of (column, offset_domain); every column shifts by
#: copy_index * offset(domain), and a domain's offset comes from the
#: max of its OWNING table's key, so foreign keys stay consistent
_SHIFTS: dict[str, list[tuple[str, str]]] = {
    "region": [],
    "nation": [],
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events"), ("user_id", "events_user")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}

#: domain -> (table, key column) the offset is computed from
_DOMAIN_KEY = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}


def _offsets(spark: SparkSession, src_dir: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for domain, (table, col) in _DOMAIN_KEY.items():
        m = (
            spark.read.parquet(f"{src_dir}/{table}.parquet")
            .agg(F.max(col))
            .collect()[0][0]
        )
        out[domain] = ((int(m or 0) // _OFFSET_ROUND) + 1) * _OFFSET_ROUND
    return out


def _shuffle_text(out: DataFrame) -> DataFrame:
    """Deterministically permute each REPLICA's word order by a
    copy-keyed POSITION hash (copy 0 keeps the source text verbatim).

    Why: plain replication makes every document 10-way NEAR-DUPLICATED
    across copies — MinHash/LSH candidate-pair volume then grows
    ~replication² per duplicate group (measured: minhash_recall
    "scaled" 11-18× at the 10× tier purely from the pair blowup),
    which is a tier artifact, not a corpus property.

    Why POSITIONS and not words: sorting words by a copy-keyed
    word-hash CANONICALIZES order per copy — every pair of docs
    sharing vocabulary becomes sequence-aligned, and the pair stage
    explodes the other way (measured: 145× "scaling", 302 GB spill).
    Hashing the position index instead gives each copy one fixed
    permutation independent of content: same-length near-dup source
    docs permute identically, so each copy reproduces the source's own
    duplicate structure (~honest 10× pair growth), while the same doc
    in two copies shares almost no consecutive word n-grams (cross-copy
    shingle overlap destroyed). Term frequencies and document lengths
    (in tokens) are untouched.

    v3 additionally renames a ``_PERTURB_PCT``% hash-gated fraction of
    word TYPES per replica to copy-unique variants (``word_c<copy>``) —
    the gate hashes (word, copy), so every occurrence of a gated type
    inside one copy renames together and the per-copy frequency
    distribution stays an isomorphic relabeling of the source's, while
    DISTINCT vocabulary grows ~Heaps-like across copies. This is what
    lets the sf1 tier measure the de-hinted vocabulary-keyed joins
    (tfidf df side, pmi pair vocab, ngram_lm grams) under distinct-key
    growth instead of sf0.1 cardinality."""
    w = F.split(F.col("text"), " ")
    shuffled = F.array_join(
        F.transform(
            F.array_sort(
                F.transform(
                    w,
                    lambda x, i: F.struct(
                        F.xxhash64(i, F.col("__copy")).alias("h"),
                        F.when(
                            F.pmod(
                                F.xxhash64(x, F.col("__copy")), F.lit(100)
                            ) < F.lit(_PERTURB_PCT),
                            F.concat(
                                x, F.lit("_c"),
                                F.col("__copy").cast("string"),
                            ),
                        ).otherwise(x).alias("w"),
                    ),
                )
            ),
            lambda s: s.w,
        ),
        " ",
    )
    out = out.withColumn(
        "text",
        F.when(F.col("__copy") == 0, F.col("text")).otherwise(shuffled),
    )
    if "n_chars" in out.columns:
        # the type renames add characters — keep the metadata column
        # consistent with the perturbed text (copy 0 stays the fixture's
        # own value verbatim)
        out = out.withColumn(
            "n_chars",
            F.when(F.col("__copy") == 0, F.col("n_chars")).otherwise(
                F.length("text").cast("long")
            ),
        )
    return out


def _perturb_embeddings(out: DataFrame) -> DataFrame:
    """Copy-keyed tiny per-element offset (copy 0 verbatim): without
    it every vector recurs as ``replication`` EXACT duplicates (cosine
    1.0, one cluster per stack) — a tier artifact for the
    kmeans/semantic-dedup shapes analogous to the text near-dup blowup
    ``_shuffle_text`` fixes. The offset is uniform in ±``_EMB_EPS``
    from xxhash64(vec_id, copy, position), so replicas remain honest
    near-duplicates of their source without being bit-identical.

    ``vec_id`` is already copy-shifted when this runs, which is fine:
    the hash only needs to be deterministic and copy-distinct."""
    delta_scale = F.lit(_EMB_EPS / 1000.0)
    return out.withColumn(
        "embedding",
        F.when(F.col("__copy") == 0, F.col("embedding")).otherwise(
            F.transform(
                F.col("embedding"),
                lambda x, i: (
                    x.cast("double")
                    + (
                        F.pmod(
                            F.xxhash64(F.col("vec_id"), F.col("__copy"), i),
                            F.lit(2001),
                        ) - F.lit(1000)
                    ).cast("double") * delta_scale
                ).cast("float"),
            )
        ),
    )


def _replicate(
    df: DataFrame, shifts: list[tuple[str, str]],
    offsets: dict[str, int], replication: int,
) -> DataFrame:
    """One scan → ``replication``× rows: cross join against the tiny
    copy-index frame, shifting every keyed column per copy."""
    if not shifts:
        return df
    copies = df.sparkSession.range(replication).select(
        F.col("id").alias("__copy")
    )
    out = df.crossJoin(F.broadcast(copies))
    for col, domain in shifts:
        out = out.withColumn(
            col, F.col(col) + F.col("__copy") * F.lit(offsets[domain])
        )
    if "text" in df.columns:
        out = _shuffle_text(out)
    if "embedding" in df.columns:
        out = _perturb_embeddings(out)
    return out.drop("__copy")


def ensure_scaled_dir(
    spark: SparkSession,
    src_dir: str,
    target_dir: str,
    replication: int = 10,
) -> str:
    """Build (or reuse) the scaled tier at ``target_dir``. Idempotent:
    a marker records the source dir + replication; a matching marker
    short-circuits, anything else rebuilds from scratch."""
    want = {"src": os.path.abspath(src_dir), "replication": replication,
            "tables": sorted(_SHIFTS), "algo": _ALGO_VERSION}
    marker = os.path.join(target_dir, _MARKER)
    try:
        with open(marker) as fh:
            if json.load(fh) == want:
                return target_dir
    except (OSError, ValueError):
        pass
    os.makedirs(target_dir, exist_ok=True)
    offsets = _offsets(spark, src_dir)
    for table, shifts in _SHIFTS.items():
        src = spark.read.parquet(f"{src_dir}/{table}.parquet")
        if shifts:
            # Spread the source across the cluster BEFORE the
            # replication cross join: the fixture is one smallish
            # parquet file (= 1-2 input splits), so replicating in
            # place would hand ONE task the whole 10x explode (473x
            # task skew, measured) and land the tier in a few huge row
            # groups that skew every downstream scan. One shuffle of
            # the 1x data buys an evenly-parallel generation stage AND
            # evenly-sized output files, exactly what a real ingest
            # job would do.
            src = src.repartition(spark.sparkContext.defaultParallelism)
        out = _replicate(src, shifts, offsets, replication)
        out.write.mode("overwrite").parquet(f"{target_dir}/{table}.parquet")
    with open(marker, "w") as fh:
        json.dump(want, fh)
    return target_dir
