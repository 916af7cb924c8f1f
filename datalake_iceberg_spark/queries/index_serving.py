"""Driver-graded search through the PERSISTED index tables.

The incremental-index subsystems (``ops/incremental_ann.IvfIndex``,
``ops/text_index.TextIndex``) were bench+tests-only until r14: the
graded ``ivf_ann_topk`` / ``bm25_topk`` entries recompute from raw
parquet, never touching the persisted postings tables. These two
entries close that gap the same way ``read_changes_orders`` and
``incremental_dedup`` grade their subsystems: stage the REAL index in a
temp warehouse once per sf_dir (create from a deterministic corpus
split, ``add()`` the held-out batch through the frozen quantizer,
replay the add to assert idempotence), then return the index's own
``search()`` DataFrame — while the DuckDB oracle recomputes the answer
from the raw parquet with none of the index machinery.

Determinism note (ANN): the staged ``IvfIndex`` trains with
``lloyd_rounds=0``, freezing the quantizer at the seed vectors (first
``ANN_N_CELLS`` of the create split by vec_id). Both engines then
compute every cosine as a left-to-right array-order dot product over
the SAME exact input doubles, so assignments match bit-for-bit; a
mean-update round would compare cosines of avg-derived centroids whose
ULPs depend on each engine's summation order (the Lloyd trainer itself
is graded separately by ``kmeans_clusters``, which pins that hazard by
rounding). The index plumbing this entry grades — cell-bucketed
postings, frozen-centroid batch add, idempotent replay, nprobe-bounded
bucket-pruned probe — is identical either way.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_iceberg_spark.queries import load
from datalake_iceberg_spark.queries.similarity import N_QUERIES
from datalake_iceberg_spark.queries.textops import BM25_QUERIES, BM25_TOPK_SQL

IDX_BATCH_MOD = 10  # id % 10 == 0 is the post-create add() batch
ANN_N_CELLS = 16
ANN_NPROBE = 2
ANN_TOP_K = 3

_STAGED: dict[tuple[str, str], str] = {}
_STAGE_LOCK = threading.Lock()


def _split(df, id_col: str):
    """(create_split, add_batch): id % IDX_BATCH_MOD == 0 is the batch."""
    is_batch = F.pmod(F.col(id_col), F.lit(IDX_BATCH_MOD)) == 0
    return df.filter(~is_batch), df.filter(is_batch)


def _stage(kind: str, spark: SparkSession, sf_dir: str, build) -> str:
    """Shared staging discipline for every persisted-index entry: one
    temp warehouse per (kind, sf_dir) for the process lifetime, built
    under a lock, cleaned at exit. ``build(catalog)`` creates the index
    from the create split, add()s the held-out batch TWICE, and returns
    both add-result dicts — the replay must land nothing (idempotence).
    Explicit raises, not asserts, so ``python -O`` can't strip the
    contract."""
    from datalake_iceberg_spark.tables import LakeCatalog

    with _STAGE_LOCK:
        loc = _STAGED.get((kind, sf_dir))
        if loc is not None:
            return loc
        loc = tempfile.mkdtemp(prefix=f"{kind}_index_wh_")
        atexit.register(shutil.rmtree, loc, ignore_errors=True)
        added, replay = build(LakeCatalog(spark, loc))
        if added["added"] <= 0:
            raise RuntimeError(f"{kind} staging: empty add batch: {added}")
        if replay["added"] != 0:
            raise RuntimeError(
                f"{kind} staging: replayed add landed rows: {replay}"
            )
        _STAGED[(kind, sf_dir)] = loc
        return loc


def _stage_ann_index(spark: SparkSession, sf_dir: str) -> str:
    from datalake_iceberg_spark.ops.incremental_ann import IvfIndex

    def build(cat):
        create, batch = _split(
            load(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
            "vec_id",
        )
        idx = IvfIndex.create(
            cat, "ann_idx", create,
            n_cells=ANN_N_CELLS, lloyd_rounds=0, n_buckets=ANN_N_CELLS,
        )
        return idx.add(batch), idx.add(batch)

    return _stage("ann", spark, sf_dir, build)


def ann_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K cosine search through the PERSISTED ``IvfIndex`` tables
    (``ops/incremental_ann.py``): the coarse probe ranks the frozen
    broadcast centroids, the candidate read is a bucket-pruned lookup
    of exactly the ``ANN_NPROBE`` probed cells' buckets (~nprobe/ncells
    of the postings at scale), exact cosine + per-query top-K inside.
    Output: (query_id, cand_id, cosine, rank)."""
    from datalake_iceberg_spark.ops.incremental_ann import IvfIndex
    from datalake_iceberg_spark.tables import LakeCatalog

    loc = _stage_ann_index(spark, sf_dir)
    idx = IvfIndex.open(LakeCatalog(spark, loc), "ann_idx")
    q = load(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < N_QUERIES
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    return idx.search(q, nprobe=ANN_NPROBE, top_k=ANN_TOP_K)


_DOT_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)
_NRM_SQL = (
    "sqrt(list_sum(list_transform({a}, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)

# Oracle: replay the staged index's lifecycle from raw parquet — seed
# centroids from the create split, assign EVERY vector (create's final
# assign + the frozen-quantizer add batch land in identical cells),
# then the nprobe-bounded probe and exact re-rank. Dense cell
# renumbering is monotonic in the seed id, so tie-breaking on the
# original cid is equivalent.
ANN_INDEX_TOPK_SQL = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS c_emb FROM (
    SELECT vec_id, embedding FROM embeddings
    WHERE vec_id % {IDX_BATCH_MOD} != 0 ORDER BY vec_id LIMIT {ANN_N_CELLS}
  ) WHERE {_NRM_SQL.format(a="embedding")} > 0
),
assigned AS (
  SELECT vec_id, embedding, cid AS cell FROM (
    SELECT s.*, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
    FROM (
      SELECT e.vec_id, e.embedding, c.cid,
             {_DOT_SQL.format(a="e.embedding", b="c.c_emb")}
             / ({_NRM_SQL.format(a="e.embedding")}
                * {_NRM_SQL.format(a="c.c_emb")}) AS cos
      FROM embeddings e CROSS JOIN cents c
      WHERE {_NRM_SQL.format(a="e.embedding")} > 0
    ) s
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {N_QUERIES} AND {_NRM_SQL.format(a="embedding")} > 0
),
probed AS (
  SELECT query_id, q_emb, cell FROM (
    SELECT s.*, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cell_cos DESC, cell ASC) AS cell_rank
    FROM (
      SELECT q.query_id, q.q_emb, c.cid AS cell,
             {_DOT_SQL.format(a="q.q_emb", b="c.c_emb")}
             / ({_NRM_SQL.format(a="q.q_emb")}
                * {_NRM_SQL.format(a="c.c_emb")}) AS cell_cos
      FROM queries q CROSS JOIN cents c
    ) s
  ) WHERE cell_rank <= {ANN_NPROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id AS cand_id,
         ROUND({_DOT_SQL.format(a="p.q_emb", b="a.embedding")}
               / ({_NRM_SQL.format(a="p.q_emb")}
                  * {_NRM_SQL.format(a="a.embedding")}), 6) AS cosine
  FROM probed p JOIN assigned a ON p.cell = a.cell
  WHERE p.query_id != a.vec_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT s.*, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rank
  FROM scored s
) WHERE rank <= {ANN_TOP_K}
ORDER BY query_id, rank
"""


def _stage_text_index(spark: SparkSession, sf_dir: str) -> str:
    from datalake_iceberg_spark.ops.text_index import TextIndex

    def build(cat):
        create, batch = _split(
            load(spark, sf_dir, "documents").select("doc_id", "text"),
            "doc_id",
        )
        idx = TextIndex.create(cat, "text_idx", create, n_buckets=8)
        return idx.add(batch), idx.add(batch)

    return _stage("text", spark, sf_dir, build)


def text_index_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 through the PERSISTED ``TextIndex`` tables
    (``ops/text_index.py``): the hit read is a bucket-pruned lookup of
    only the token buckets the query terms hash to; scoring and tie
    rules are identical to the raw-parquet ``bm25_topk`` entry, so the
    oracle is the SAME SQL — create split + added batch reassemble the
    full corpus, and the index search must equal the from-scratch
    recompute exactly. Output: (query_id, doc_id, score, rank)."""
    from datalake_iceberg_spark.ops.text_index import TextIndex
    from datalake_iceberg_spark.tables import LakeCatalog

    loc = _stage_text_index(spark, sf_dir)
    idx = TextIndex.open(LakeCatalog(spark, loc), "text_idx")
    return idx.search(list(BM25_QUERIES), top_k=10)


TEXT_INDEX_BM25_SQL = BM25_TOPK_SQL


# Import the ENGINE's PQ geometry rather than re-declaring it: the
# oracle below bakes these into SQL literals, and a silent desync
# (e.g. PQ_K retuned in ops/incremental_ann) would grade the engine as
# WRONG when only the oracle went stale.
from datalake_iceberg_spark.ops.incremental_ann import PQ_K as _PQ_K
from datalake_iceberg_spark.ops.incremental_ann import PQ_M as _PQ_M

EMB_DIM = 64  # the fixture's embedding width. NOTE: IvfPqIndex.create
# only raises when dim % PQ_M != 0, so a fixture change to another
# multiple of PQ_M (e.g. 128) would NOT fail at create — it would
# surface as an oracle/engine hash mismatch misattributed to the engine
# (the oracle bakes PQ_DIM_PER_SUB into SQL literals). _stage_pq_index
# therefore checks the staged width against EMB_DIM explicitly.
PQ_DIM_PER_SUB = EMB_DIM // _PQ_M


def _stage_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """Same create/add/replay discipline, with BOTH quantizers frozen
    at their seeds (lloyd_rounds=0, pq_rounds=0) for the cross-engine
    bit-determinism argument in the module docstring: codebooks are the
    subvectors of the PQ_K smallest create-split vec_ids verbatim, so
    the oracle replays them exactly."""
    from datalake_iceberg_spark.ops.incremental_ann import IvfPqIndex

    def build(cat):
        create, batch = _split(
            load(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
            "vec_id",
        )
        width = create.select(F.size("embedding")).first()[0]
        if width != EMB_DIM:
            raise RuntimeError(
                f"pq staging: fixture embedding width {width} != EMB_DIM "
                f"{EMB_DIM} — the oracle bakes PQ_DIM_PER_SUB="
                f"{PQ_DIM_PER_SUB} into SQL literals; update EMB_DIM (and "
                "re-derive the oracle) rather than letting this surface as "
                "a grading mismatch"
            )
        idx = IvfPqIndex.create(
            cat, "pq_idx", create,
            n_cells=ANN_N_CELLS, lloyd_rounds=0, pq_rounds=0,
            n_buckets=ANN_N_CELLS,
        )
        return idx.add(batch), idx.add(batch)

    return _stage("pq", spark, sf_dir, build)


def pq_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-K through the PERSISTED ``IvfPqIndex`` tables — the
    billion-scale serving layout (candidates exist only as PQ codes +
    norms, ~16× smaller; scoring is M LUT lookups, never a
    full-dimension dot). Coarse probe over frozen broadcast centroids,
    bucket-pruned read of the probed cells, per-query M·K LUT
    broadcast. Output: (query_id, cand_id, adc_cosine, rank)."""
    from datalake_iceberg_spark.ops.incremental_ann import IvfPqIndex
    from datalake_iceberg_spark.tables import LakeCatalog

    loc = _stage_pq_index(spark, sf_dir)
    idx = IvfPqIndex.open(LakeCatalog(spark, loc), "pq_idx")
    q = load(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < N_QUERIES
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    return idx.search(q, nprobe=ANN_NPROBE, top_k=ANN_TOP_K)


_L2_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))"
    " * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))"
)

# Oracle: replay the whole IVF-PQ lifecycle from raw parquet — frozen
# seed centroids AND seed codebooks (rounds=0 on both), full-corpus
# cell assignment + code assignment (create final-encode and the
# frozen-quantizer add batch land identically), then the ADC scoring
# with the reconstruction-norm denominator sqrt(Σ cn2).
PQ_INDEX_TOPK_SQL = f"""
WITH mset AS (SELECT UNNEST(generate_series(0, {_PQ_M - 1})) AS m),
create_split AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id % {IDX_BATCH_MOD} != 0
),
cents AS (
  SELECT vec_id AS cid, embedding AS c_emb FROM (
    SELECT vec_id, embedding FROM create_split ORDER BY vec_id LIMIT {ANN_N_CELLS}
  ) WHERE {_NRM_SQL.format(a="embedding")} > 0
),
cb AS (
  SELECT m.m, s.code,
         s.embedding[m.m * {PQ_DIM_PER_SUB} + 1 : (m.m + 1) * {PQ_DIM_PER_SUB}] AS c_sv
  FROM (
    SELECT vec_id, embedding,
           CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code
    FROM (SELECT vec_id, embedding FROM create_split ORDER BY vec_id LIMIT {_PQ_K})
  ) s CROSS JOIN mset m
),
live AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE {_NRM_SQL.format(a="embedding")} > 0
),
assigned AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT s.*, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
    FROM (
      SELECT e.vec_id, c.cid,
             {_DOT_SQL.format(a="e.embedding", b="c.c_emb")}
             / ({_NRM_SQL.format(a="e.embedding")}
                * {_NRM_SQL.format(a="c.c_emb")}) AS cos
      FROM live e CROSS JOIN cents c
    ) s
  ) WHERE rn = 1
),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT s.vec_id, s.m, b.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY ROUND({_L2_SQL.format(a="s.sv", b="b.c_sv")}, 6) ASC,
                                       b.code ASC) AS rn
    FROM (
      SELECT e.vec_id, m.m,
             e.embedding[m.m * {PQ_DIM_PER_SUB} + 1 : (m.m + 1) * {PQ_DIM_PER_SUB}] AS sv
      FROM live e CROSS JOIN mset m
    ) s JOIN cb b ON s.m = b.m
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_id, embedding AS q_emb,
         {_NRM_SQL.format(a="embedding")} AS q_nrm
  FROM embeddings
  WHERE vec_id < {N_QUERIES} AND {_NRM_SQL.format(a="embedding")} > 0
),
probed AS (
  SELECT query_id, q_emb, q_nrm, cell FROM (
    SELECT s.*, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cell_cos DESC, cell ASC) AS cell_rank
    FROM (
      SELECT q.query_id, q.q_emb, q.q_nrm, c.cid AS cell,
             {_DOT_SQL.format(a="q.q_emb", b="c.c_emb")}
             / (q.q_nrm * {_NRM_SQL.format(a="c.c_emb")}) AS cell_cos
      FROM queries q CROSS JOIN cents c
    ) s
  ) WHERE cell_rank <= {ANN_NPROBE}
),
lut AS (
  SELECT q.query_id, b.m, b.code,
         {_DOT_SQL.format(a="b.c_sv", b="b.c_sv")} AS cn2,
         list_sum(list_transform(
           list_zip(q.q_emb[b.m * {PQ_DIM_PER_SUB} + 1 : (b.m + 1) * {PQ_DIM_PER_SUB}], b.c_sv),
           x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS pdot
  FROM queries q CROSS JOIN cb b
),
scored AS (
  SELECT p.query_id, a.vec_id AS cand_id,
         ROUND(SUM(l.pdot) / (MAX(p.q_nrm) * sqrt(SUM(l.cn2))), 6) AS adc_cosine
  FROM probed p
  JOIN assigned a ON p.cell = a.cell AND a.vec_id != p.query_id
  JOIN codes c ON c.vec_id = a.vec_id
  JOIN lut l ON l.query_id = p.query_id AND l.m = c.m AND l.code = c.code
  GROUP BY p.query_id, a.vec_id
)
SELECT query_id, cand_id, adc_cosine, rank FROM (
  SELECT s.*, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY adc_cosine DESC, cand_id ASC) AS rank
  FROM scored s
) WHERE rank <= {ANN_TOP_K}
ORDER BY query_id, rank
"""
