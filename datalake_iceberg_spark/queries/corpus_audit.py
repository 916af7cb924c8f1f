"""Corpus-level audits for training-data curation.

Corpus-level audits a 100 TB training-data pipeline runs before (and
after) every curation change, complementing the dedup/similarity stack
(``queries/dedup.py``, ``queries/similarity.py``):

- :func:`ngram_novelty` — train→test n-gram generalization gap: how
  much of the held-out split's trigram vocabulary never occurs in the
  train split. A collapsing novelty rate means the hash split leaks or
  the corpus is self-repetitive.
- :func:`minhash_est_error` — MinHash's ESTIMATED Jaccard vs exact
  Jaccard on the LSH candidate pairs. ``minhash_recall`` audits what
  banding MISSES; this audits whether the signature arithmetic can be
  trusted on the pairs it finds (the two numbers every LSH deployment
  publishes together).
- :func:`dup_graph_degree` — degree histogram of the LSH candidate
  graph. The connectivity check run BEFORE ``dup_clusters``: a heavy
  8+ band means boilerplate is about to glue the corpus into one giant
  component and the shingle/band parameters need retuning.
- :func:`token_gini` — Gini concentration of tokens over documents per
  source, from a grouped token-count histogram (no per-doc global
  sort). High inequality means a handful of mega-docs dominate a
  source's token budget — a sampling-weights input.
- :func:`knn_label_purity` — label-noise sweep via kNN consistency
  over a sampled query set: labels whose neighbor-majority agreement
  falls off the band are where mislabeled samples concentrate.
- :func:`token_kl_shift` — train→test token-distribution KL per
  language, summed in integer nano-nats so the reduction is exact and
  order-independent at any vocabulary size.

All are JVM-expression plans with map-side partial aggregation;
the only Python is in the driver. Reference scope anchor: the
reference engine ships the batch-stats surface these extend
(``src/utils/cdc_pipeline.py:148`` batch stats; the corpus-audit layer
itself is an extension the reference does not have).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_iceberg_spark.queries import load_balanced
from datalake_iceberg_spark.queries.dedup import (
    BAND_SIZE,
    N_HASHES,
    RECALL_SAMPLE_MOD,
    _BAND_EXPRS_SQL,
    _norm_text,
    _recall_sample_pred,
    _RECALL_SAMPLE_WHERE,
    _shingle_array,
    _shingle_sql,
    _shingles,
    _SIG_COLS_SQL,
    banded_for,
    signatures_for_shingles,
)

TRAIN_MOD = 100
TRAIN_PCT = 90  # same 90/10 md5 split as pipeline_ops.hash_split_stats


def _split_expr():
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % TRAIN_MOD
    )
    return F.when(bucket < TRAIN_PCT, F.lit("train")).otherwise(F.lit("test"))


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out trigram novelty per language: of the test split's
    distinct trigrams, the fraction absent from the train split.

    Plan: ONE aggregation, no join — explode trigrams with the
    deterministic split label, group by (lang, gram) folding presence
    flags per split (map-side partial agg collapses duplicate grams
    before the single shuffle), then a tiny per-lang rollup. The
    gram-level shuffle is the cost driver at 100 TB and is unavoidable
    for an exact answer; the key space is the trigram vocabulary, which
    hashes uniformly — no hot keys."""
    docs = load_balanced(spark, sf_dir, "documents")
    grams = docs.select(
        "lang",
        _split_expr().alias("split"),
        F.explode(_shingle_array()).alias("gram"),
    )
    per_gram = grams.groupBy("lang", "gram").agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias("in_train"),
        F.max(F.when(F.col("split") == "test", 1).otherwise(0)).alias("in_test"),
    )
    return (
        per_gram.groupBy("lang")
        .agg(
            F.sum("in_test").cast("long").alias("n_test_grams"),
            F.sum(
                F.when((F.col("in_test") == 1) & (F.col("in_train") == 0), 1)
                .otherwise(0)
            ).cast("long").alias("n_novel"),
        )
        .select(
            "lang",
            "n_test_grams",
            "n_novel",
            F.round(
                F.when(
                    F.col("n_test_grams") > 0,
                    F.col("n_novel").cast("double") / F.col("n_test_grams"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("novelty_rate"),
        )
        .orderBy("lang")
    )


_SPLIT_SQL = (
    "CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    f" % {TRAIN_MOD} < {TRAIN_PCT} THEN 'train' ELSE 'test' END"
)

NGRAM_NOVELTY_SQL = f"""
WITH sh AS ({_shingle_sql()}),
grams AS (
  SELECT d.lang, {_SPLIT_SQL} AS split, sh.shingle AS gram
  FROM sh JOIN documents d USING (doc_id)
),
per_gram AS (
  SELECT lang, gram,
         MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
         MAX(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_test
  FROM grams GROUP BY lang, gram
)
SELECT lang,
       CAST(SUM(in_test) AS BIGINT) AS n_test_grams,
       CAST(SUM(CASE WHEN in_test = 1 AND in_train = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       ROUND(CASE WHEN SUM(in_test) > 0
                  THEN CAST(SUM(CASE WHEN in_test = 1 AND in_train = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                       / SUM(in_test)
                  ELSE 0.0 END, 4) AS novelty_rate
FROM per_gram GROUP BY lang ORDER BY lang
"""


def minhash_est_error(
    spark: SparkSession, sf_dir: str, sample_mod: int = RECALL_SAMPLE_MOD
) -> DataFrame:
    """Signature-arithmetic fidelity on the LSH candidate pairs:
    MinHash-estimated Jaccard (matching signature components / N) vs
    exact shingle Jaccard, summarized as mean/max absolute error and
    RMSE. Runs on the same deterministic hash-sampled sub-corpus as
    ``minhash_recall`` (candidate-pair error is a per-pair property, so
    the sampled estimate is unbiased and the exact-side inverted-index
    join stays bounded).

    Plan: shingles checkpointed once (sizes + signatures + exact-side
    self-join all reuse it); candidate pairs from the production band
    join; the exact-intersection inverted-index self-join runs ONLY on
    shingles of docs that appear in some candidate pair (a semi-join
    first — exact Jaccard is consumed solely for candidate pairs, and
    candidate docs are typically a small fraction of the sample, so the
    quadratic stage shrinks by that fraction squared); intersections
    meet the candidates in one LEFT join (a candidate pair sharing no
    shingle — possible only via hash collision — scores exact 0, the
    right answer); one final aggregation."""
    docs = load_balanced(spark, sf_dir, "documents").where(
        _recall_sample_pred(sample_mod)
    )
    sh = _shingles(docs).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sig = signatures_for_shingles(sh).localCheckpoint(eager=False)
    banded = banded_for(sig)
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(b, (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_c = sh.join(cand_docs, "doc_id", "left_semi")
    sa, sb = sig.alias("sa"), sig.alias("sb")
    matches = sum(
        F.when(F.col(f"sa.sig_{i}") == F.col(f"sb.sig_{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    est = (
        cands.join(sa, cands.doc_a == F.col("sa.doc_id"))
        .join(sb, cands.doc_b == F.col("sb.doc_id"))
        .select(
            "doc_a", "doc_b",
            (matches.cast("double") / F.lit(float(N_HASHES))).alias("jac_est"),
        )
    )
    x, y = sh_c.alias("x"), sh_c.alias("y")
    inter = (
        x.join(y, (F.col("x.shingle") == F.col("y.shingle"))
               & (F.col("x.doc_id") < F.col("y.doc_id")))
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    za, zb = sizes.alias("za"), sizes.alias("zb")
    jac_exact = F.coalesce(F.col("n_inter"), F.lit(0)).cast("double") / (
        F.col("za.n_sh") + F.col("zb.n_sh")
        - F.coalesce(F.col("n_inter"), F.lit(0))
    )
    pairs = (
        est.join(inter, ["doc_a", "doc_b"], "left")
        .join(za, est.doc_a == F.col("za.doc_id"))
        .join(zb, est.doc_b == F.col("zb.doc_id"))
        .select(
            F.round(F.col("jac_est"), 6).alias("jac_est"),
            F.round(jac_exact, 6).alias("jac_exact"),
        )
        .withColumn("abs_err", F.round(F.abs(F.col("jac_est") - F.col("jac_exact")), 6))
    )
    return pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.avg("jac_est"), 4).alias("mean_est"),
        F.round(F.avg("jac_exact"), 4).alias("mean_exact"),
        F.round(F.avg("abs_err"), 4).alias("mean_abs_err"),
        F.round(F.max("abs_err"), 4).alias("max_abs_err"),
    )


_EST_MATCH_SQL = " + ".join(
    f"CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END" for i in range(N_HASHES)
)

MINHASH_EST_ERROR_SQL = f"""
WITH shingles AS ({_shingle_sql(_RECALL_SAMPLE_WHERE)}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
sigs AS (
  SELECT doc_id,
         {_SIG_COLS_SQL}
  FROM shingles GROUP BY doc_id
),
banded AS (
  SELECT DISTINCT doc_id, band_hash FROM (
    SELECT doc_id, unnest([{", ".join(f"band_{b}" for b in range(N_HASHES // BAND_SIZE))}]) AS band_hash
    FROM (SELECT doc_id, {_BAND_EXPRS_SQL} FROM sigs)
  )
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
est AS (
  SELECT c.doc_a, c.doc_b,
         CAST(({_EST_MATCH_SQL}) AS DOUBLE) / {N_HASHES} AS jac_est
  FROM cands c
  JOIN sigs sa ON sa.doc_id = c.doc_a
  JOIN sigs sb ON sb.doc_id = c.doc_b
),
cdocs AS (
  SELECT doc_a AS doc_id FROM cands UNION SELECT doc_b FROM cands
),
shc AS (
  SELECT sh.doc_id, sh.shingle FROM shingles sh JOIN cdocs USING (doc_id)
),
inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM shc x JOIN shc y
    ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
pairs AS (
  SELECT ROUND(e.jac_est, 6) AS jac_est,
         ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
               / (za.n_sh + zb.n_sh - COALESCE(i.n_inter, 0)), 6) AS jac_exact
  FROM est e
  LEFT JOIN inter i USING (doc_a, doc_b)
  JOIN sizes za ON za.doc_id = e.doc_a
  JOIN sizes zb ON zb.doc_id = e.doc_b
)
SELECT COUNT(*) AS n_pairs,
       ROUND(AVG(jac_est), 4) AS mean_est,
       ROUND(AVG(jac_exact), 4) AS mean_exact,
       ROUND(AVG(ROUND(ABS(jac_est - jac_exact), 6)), 4) AS mean_abs_err,
       ROUND(MAX(ROUND(ABS(jac_est - jac_exact), 6)), 4) AS max_abs_err
FROM pairs
"""


DEGREE_BANDS = [(0, 0, "0"), (1, 1, "1"), (2, 3, "2-3"), (4, 7, "4-7")]


def dup_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the LSH candidate graph — the connectivity
    audit run before ``dup_clusters``: per signed-up doc (docs with a
    signature), the number of candidate partners, banded. A fat tail
    (many docs in 8+) predicts boilerplate gluing the corpus into one
    giant component; near-all-zero says the band parameters are too
    strict to find anything.

    Plan: the production band self-join yields pairs; degrees are one
    explode + count; degree-0 docs are recovered with a LEFT join from
    the signature frame (cheap — one row per doc). The signature stage
    is materialized once (``localCheckpoint``) — its three consumers
    (both self-join legs via the band explode, and the degree-0
    recovery) would otherwise each re-scan and re-shingle the corpus
    (measured: 5 FileScans → 1). Everything shuffles on doc_id or
    band_hash; no all-pairs stage anywhere."""
    docs = load_balanced(spark, sf_dir, "documents")
    sig = signatures_for_shingles(_shingles(docs)).localCheckpoint(eager=False)
    banded = banded_for(sig)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ends = pairs.select(F.col("doc_a").alias("doc_id")).unionAll(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count("*").alias("degree"))
    all_deg = (
        sig.select("doc_id")
        .join(deg, "doc_id", "left")
        .select(F.coalesce("degree", F.lit(0)).alias("degree"))
    )
    band = F.lit("8+")
    lo = F.lit(8)
    for b_lo, b_hi, label in reversed(DEGREE_BANDS):
        band = F.when(F.col("degree").between(b_lo, b_hi), label).otherwise(band)
        lo = F.when(F.col("degree").between(b_lo, b_hi), b_lo).otherwise(lo)
    return (
        all_deg.select(band.alias("degree_band"), lo.cast("long").alias("band_lo"))
        .groupBy("degree_band", "band_lo")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("band_lo")
    )


_DEGREE_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN degree BETWEEN {lo} AND {hi} THEN '{label}'"
        for lo, hi, label in DEGREE_BANDS
    )
    + " ELSE '8+' END"
)
_DEGREE_LO_SQL = (
    "CASE "
    + " ".join(
        f"WHEN degree BETWEEN {lo} AND {hi} THEN {lo}"
        for lo, hi, label in DEGREE_BANDS
    )
    + " ELSE 8 END"
)

DUP_GRAPH_DEGREE_SQL = f"""
WITH shingles AS ({_shingle_sql()}),
sigs AS (
  SELECT doc_id,
         {_SIG_COLS_SQL}
  FROM shingles GROUP BY doc_id
),
banded AS (
  SELECT DISTINCT doc_id, band_hash FROM (
    SELECT doc_id, unnest([{", ".join(f"band_{b}" for b in range(N_HASHES // BAND_SIZE))}]) AS band_hash
    FROM (SELECT doc_id, {_BAND_EXPRS_SQL} FROM sigs)
  )
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
ends AS (
  SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b FROM pairs
),
deg AS (
  SELECT s.doc_id, COALESCE(d.degree, 0) AS degree
  FROM (SELECT DISTINCT doc_id FROM sigs) s
  LEFT JOIN (SELECT doc_id, COUNT(*) AS degree FROM ends GROUP BY doc_id) d
    USING (doc_id)
)
SELECT {_DEGREE_CASE_SQL} AS degree_band,
       CAST({_DEGREE_LO_SQL} AS BIGINT) AS band_lo,
       COUNT(*) AS n_docs
FROM deg GROUP BY 1, 2 ORDER BY band_lo
"""


def token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass concentration per source: the Gini coefficient of
    tokens-per-document, computed from the GROUPED token-count
    histogram — group docs by (source, token_count), then run the
    rank-sum Gini formula over the distinct-count rows. The window
    partitions carry one row per DISTINCT token count (thousands at
    most), never one per document, so there is no per-doc global sort
    at any corpus size; all sums are integer-exact until the final
    division.

    Grouped rank-sum identity: with counts v_1<v_2<... and frequencies
    f_k, the tied-rank sum Σ_i rank_i·x_i equals
    Σ_k v_k·(f_k·cumF_{k-1} + f_k(f_k+1)/2); Gini = 2T/(N·S) − (N+1)/N.
    Output: (source, n_docs, total_tokens, gini)."""
    docs = load_balanced(spark, sf_dir, "documents")
    tok = F.size(F.filter(F.split(_norm_text(), " "), lambda t: F.length(t) > 0))
    grp = (
        docs.select("source", tok.cast("long").alias("v"))
        .groupBy("source", "v")
        .agg(F.count("*").cast("long").alias("f"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grp = grp.withColumn("cum_before", F.coalesce(F.sum("f").over(w), F.lit(0)))
    # integer `div`, not `/`: float division would lose exactness past
    # 2^53 and the whole point of the grouped formula is integer sums
    t_k = F.expr("v * (f * cum_before + (f * (f + 1)) div 2)")
    per_src = grp.groupBy("source").agg(
        F.sum("f").cast("long").alias("n_docs"),
        F.sum(F.col("f") * F.col("v")).cast("long").alias("total_tokens"),
        F.sum(t_k).cast("long").alias("t_sum"),
    )
    n, s, t = F.col("n_docs"), F.col("total_tokens"), F.col("t_sum")
    gini = (
        F.lit(2.0) * t.cast("double") / (n * s).cast("double")
        - (n + 1).cast("double") / n.cast("double")
    )
    return (
        per_src.select(
            "source",
            "n_docs",
            "total_tokens",
            F.round(F.when(s > 0, gini).otherwise(F.lit(0.0)), 4).alias("gini"),
        )
        .orderBy("source")
    )


TOKEN_GINI_SQL = """
WITH toks AS (
  SELECT source,
         len(list_filter(string_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' '),
                         t -> length(t) > 0)) AS v
  FROM documents
),
grp AS (
  SELECT source, v, COUNT(*) AS f FROM toks GROUP BY source, v
),
ranked AS (
  SELECT source, v, f,
         COALESCE(SUM(f) OVER (PARTITION BY source ORDER BY v
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM grp
),
per_src AS (
  SELECT source,
         SUM(f) AS n_docs,
         SUM(f * v) AS total_tokens,
         SUM(v * (f * cum_before + (f * (f + 1)) // 2)) AS t_sum
  FROM ranked GROUP BY source
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(total_tokens AS BIGINT) AS total_tokens,
       ROUND(CASE WHEN total_tokens > 0
                  THEN 2.0 * t_sum / (n_docs * total_tokens)
                       - CAST(n_docs + 1 AS DOUBLE) / n_docs
                  ELSE 0.0 END, 4) AS gini
FROM per_src ORDER BY source
"""


# ----------------------------------------------------- label-purity audit

PURITY_K = 5        # neighbors per vector
PURITY_NPROBE = 2   # label-centroid cells probed per vector
PURITY_SALT = 8     # salt width for the low-cardinality cell join
PURITY_CAND_MOD = 2  # keep 1/MOD of candidates (independent md5 slice)
PURITY_SAMPLE_MOD = 4  # keep 1/MOD of vectors as audit queries


def knn_label_purity(
    spark: SparkSession, sf_dir: str, sample_mod: int = PURITY_SAMPLE_MOD,
    cand_mod: int = PURITY_CAND_MOD,
) -> DataFrame:
    """Label-noise audit via kNN consistency: for a deterministic
    md5-sampled 1/``sample_mod`` of vectors, the fraction of each
    query's ``PURITY_K`` nearest neighbors (cosine, IVF-probed, over a
    deterministic 1/``cand_mod`` candidate subsample) sharing its own
    label, and whether the neighbor MAJORITY agrees — rolled up per
    label. Per-label purity is a mean over vectors, so the sampled
    estimate is unbiased in the queries; subsampling candidates turns
    exact kNN into kNN-of-a-uniform-subsample — the k nearest of a
    1/c sample are distributionally the ~(c·k) nearest of the corpus,
    which measures the same label-noise statistic (this is an audit,
    not a serving path). Scale law stated honestly: candidate work ∝
    (N/sample_mod)·(nprobe/L)·(N/cand_mod) — quadratic in N with both
    mods fixed, so at growing corpus sizes hold the audit budget by
    scaling sample_mod·cand_mod ∝ N (a 4× corpus probe measured 17×
    before the candidate dial existed). The two samples use DISJOINT
    md5 slices so they are independent. Labels whose majority-agreement falls off the
    corpus band are where mislabeled or boundary samples concentrate
    (the standard embedding-space label-QA sweep run before training
    on labeled corpora).

    Plan: label centroids are an L-row broadcast (the Lloyd-assignment
    shape, declared in SMALL_CROSS); every vector probes its
    ``PURITY_NPROBE`` nearest cells, candidates meet queries in an
    equi join on (cell, salt) — the raw cell key has only L distinct
    values, which would cap the join's parallelism at L tasks (measured
    3× slower at L=10 on 32 cores), so the PROBE side (small: it scales
    with 1/sample_mod) replicates across all ``PURITY_SALT`` salts and
    the candidate corpus takes one deterministic hash salt as a plain
    projection — the replicate-small/salt-big direction of the standard
    low-cardinality-key fix (exact; each pair meets once; the corpus is
    never copied). Per-query top-K window, then two
    tiny rollups. Per-vector candidate work is ∝ nprobe/L of the
    corpus — the same IVF dial as ``ivf_ann_topk``. Ties are
    deterministic everywhere (cosine 6 dp, then id; majority count,
    then smaller label). Output per label:
    (label, n_vecs, mean_purity, majority_acc)."""
    from datalake_iceberg_spark.queries.similarity import _dot, _norm

    emb = load_balanced(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(_as_double_col("embedding")).alias("pos", "v")
    )
    cents = (
        exploded.groupBy("label", "pos")
        .agg(F.avg("v").alias("cv"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pairs"))
        .select(
            F.col("label").alias("cell"),
            F.transform("pairs", lambda s: s.cv).alias("centroid"),
        )
        .select("cell", "centroid", _norm(F.col("centroid")).alias("cell_nrm"))
    )
    sample = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % sample_mod == 0
    )
    q = emb.where(sample).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("own_label"),
        _as_double_col("embedding").alias("q_emb"),
        _norm(_as_double_col("embedding")).alias("q_nrm"),
    ).where(F.col("q_nrm") > 0)
    cell_scores = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "own_label", "q_emb", "q_nrm", "cell",
        (_dot(F.col("q_emb"), F.col("centroid"))
         / (F.col("q_nrm") * F.col("cell_nrm"))).alias("cell_cos"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cell_cos"), F.asc("cell"))
    # Salt direction matters at scale: REPLICATE the probe side (small —
    # it shrinks with the audit's sample_mod dial) across all SALT values
    # and hash-salt the candidate corpus ONCE (a projection, zero
    # replication). The r6 shape exploded the corpus ×SALT instead,
    # which at 100 TB is SALT extra copies of the biggest table; each
    # (query, candidate) pair still meets exactly once because a query
    # carries every salt and a candidate exactly one.
    probed = (
        cell_scores.withColumn("cr", F.row_number().over(wq))
        .filter(F.col("cr") <= PURITY_NPROBE)
        .select("query_id", "own_label", "q_emb", "q_nrm", "cell")
        .withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(PURITY_SALT)]))
        )
    )
    cand_sample = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 9, 8), 16, 10)
        .cast("long") % cand_mod == 0
    )
    cand = emb.where(cand_sample).select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cell"),
        F.col("label").alias("cand_label"),
        _as_double_col("embedding").alias("c_emb"),
        _norm(_as_double_col("embedding")).alias("c_nrm"),
        F.pmod(F.xxhash64("vec_id"), F.lit(PURITY_SALT)).alias("salt"),
    ).where(F.col("c_nrm") > 0)
    scored = (
        probed.join(cand, ["cell", "salt"])
        .where(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "own_label", "cand_id", "cand_label",
            F.round(
                _dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("cosine"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    topk = scored.withColumn("rk", F.row_number().over(wk)).filter(
        F.col("rk") <= PURITY_K
    )
    per_q_label = topk.groupBy("query_id", "own_label", "cand_label").agg(
        F.count("*").alias("cnt")
    )
    wm = Window.partitionBy("query_id").orderBy(
        F.desc("cnt"), F.asc("cand_label")
    )
    per_q = (
        per_q_label.withColumn("mr", F.row_number().over(wm))
        .groupBy("query_id", "own_label")
        .agg(
            F.sum(F.when(F.col("cand_label") == F.col("own_label"),
                         F.col("cnt")).otherwise(0)).alias("n_same"),
            F.sum("cnt").alias("n_nb"),
            F.max(F.when(F.col("mr") == 1, F.col("cand_label"))).alias("maj"),
        )
    )
    return (
        per_q.groupBy(F.col("own_label").cast("long").alias("label"))
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg(F.col("n_same") / F.col("n_nb")), 4).alias("mean_purity"),
            F.round(
                F.avg(F.when(F.col("maj") == F.col("own_label"), 1.0).otherwise(0.0)),
                4,
            ).alias("majority_acc"),
        )
        .orderBy("label")
    )


def _as_double_col(col):
    return F.col(col).cast("array<double>")


_COS_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) "
    "/ (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) "
    "* sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)

# squared-norm guard — mirrors the Spark plans' ``_norm(...) > 0``
# filters so a zero vector in the corpus is excluded by BOTH engines
# instead of producing engine-specific NaN/div-by-zero cosines
_NRM2_SQL = "list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

KNN_LABEL_PURITY_SQL = f"""
WITH exploded AS (
  SELECT label, g.i AS pos, CAST(embedding[g.i + 1] AS DOUBLE) AS v
  FROM embeddings, UNNEST(generate_series(0, len(embedding) - 1)) AS g(i)
),
cents AS (
  SELECT label AS cell, list(cv ORDER BY pos) AS centroid
  FROM (SELECT label, pos, AVG(v) AS cv FROM exploded GROUP BY label, pos)
  GROUP BY label
),
q AS (
  SELECT vec_id AS query_id, label AS own_label, embedding AS q_emb
  FROM embeddings
  WHERE CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % {PURITY_SAMPLE_MOD} = 0
    AND {_NRM2_SQL.format(a="embedding")} > 0
),
cell_scores AS (
  SELECT q.query_id, q.own_label, q.q_emb, c.cell,
         {_COS_SQL.format(a="q.q_emb", b="c.centroid")} AS cell_cos
  FROM q CROSS JOIN cents c
),
probed AS (
  SELECT query_id, own_label, q_emb, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cell_cos DESC, cell ASC) AS cr
    FROM cell_scores
  ) WHERE cr <= {PURITY_NPROBE}
),
scored AS (
  SELECT p.query_id, p.own_label, e.vec_id AS cand_id, e.label AS cand_label,
         ROUND({_COS_SQL.format(a="p.q_emb", b="e.embedding")}, 6) AS cosine
  FROM probed p JOIN embeddings e ON p.cell = e.label
  WHERE p.query_id != e.vec_id
    AND CAST(('0x' || substr(md5(CAST(e.vec_id AS VARCHAR)), 9, 8)) AS BIGINT)
        % {PURITY_CAND_MOD} = 0
    AND {_NRM2_SQL.format(a="e.embedding")} > 0
),
topk AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id ASC) AS rk
    FROM scored
  ) WHERE rk <= {PURITY_K}
),
per_q_label AS (
  SELECT query_id, own_label, cand_label, COUNT(*) AS cnt
  FROM topk GROUP BY 1, 2, 3
),
per_q AS (
  SELECT query_id, own_label,
         SUM(CASE WHEN cand_label = own_label THEN cnt ELSE 0 END) AS n_same,
         SUM(cnt) AS n_nb,
         MAX(CASE WHEN mr = 1 THEN cand_label END) AS maj
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cnt DESC, cand_label ASC) AS mr
    FROM per_q_label
  ) GROUP BY 1, 2
)
SELECT CAST(own_label AS BIGINT) AS label,
       COUNT(*) AS n_vecs,
       ROUND(AVG(CAST(n_same AS DOUBLE) / n_nb), 4) AS mean_purity,
       ROUND(AVG(CASE WHEN maj = own_label THEN 1.0 ELSE 0.0 END), 4)
         AS majority_acc
FROM per_q GROUP BY own_label ORDER BY label
"""


# ------------------------------------------------- split-distribution KL

KL_SCALE = 1_000_000_000  # nano-nats: per-term integer fixed point


def token_kl_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test token-distribution shift per language:
    ``KL(test ‖ train)`` over the add-one-smoothed shared vocabulary of
    the deterministic md5 split — the drift number that says whether
    the held-out split (or tomorrow's crawl, swapping the split
    predicate for a date) still looks like the training distribution.

    FP discipline: each term's contribution ``p·ln(p/q)`` is fixed to
    INTEGER nano-nats before summing, so the reduction is exact and
    order-independent — a plain double sum over a 100M-term vocabulary
    would differ run-to-run (and engine-to-engine) in the low digits
    purely from addition order. One gram-level shuffle, same shape as
    ``ngram_novelty``. Output: (lang, vocab, train_tokens, test_tokens,
    kl_nats)."""
    docs = load_balanced(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        _split_expr().alias("split"),
        F.explode(
            F.filter(F.split(_norm_text(), " "), lambda t: F.length(t) > 0)
        ).alias("tok"),
    )
    per_tok = toks.groupBy("lang", "tok").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("c_train"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("c_test"),
    )
    totals = per_tok.groupBy("lang").agg(
        F.count("*").alias("vocab"),
        F.sum("c_train").alias("t_train"),
        F.sum("c_test").alias("t_test"),
    )
    j = per_tok.join(totals, "lang")
    p = (F.col("c_test") + 1).cast("double") / (F.col("t_test") + F.col("vocab"))
    qd = (F.col("c_train") + 1).cast("double") / (F.col("t_train") + F.col("vocab"))
    term_nano = F.round(p * F.log(p / qd) * F.lit(float(KL_SCALE))).cast("long")
    return (
        j.groupBy("lang")
        .agg(
            F.max("vocab").cast("long").alias("vocab"),
            F.max("t_train").cast("long").alias("train_tokens"),
            F.max("t_test").cast("long").alias("test_tokens"),
            F.round(
                F.sum(term_nano).cast("double") / F.lit(float(KL_SCALE)), 4
            ).alias("kl_nats"),
        )
        .orderBy("lang")
    )


TOKEN_KL_SHIFT_SQL = f"""
WITH toks AS (
  SELECT lang, {_SPLIT_SQL} AS split, t.tok
  FROM documents,
       UNNEST(list_filter(string_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' '),
                          x -> length(x) > 0)) AS t(tok)
),
per_tok AS (
  SELECT lang, tok,
         SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS c_train,
         SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS c_test
  FROM toks GROUP BY lang, tok
),
totals AS (
  SELECT lang, COUNT(*) AS vocab, SUM(c_train) AS t_train, SUM(c_test) AS t_test
  FROM per_tok GROUP BY lang
),
terms AS (
  SELECT p.lang, t.vocab, t.t_train, t.t_test,
         CAST(ROUND(
           (CAST(p.c_test + 1 AS DOUBLE) / (t.t_test + t.vocab))
           * ln((CAST(p.c_test + 1 AS DOUBLE) / (t.t_test + t.vocab))
                / (CAST(p.c_train + 1 AS DOUBLE) / (t.t_train + t.vocab)))
           * {KL_SCALE}) AS BIGINT) AS term_nano
  FROM per_tok p JOIN totals t USING (lang)
)
SELECT lang,
       CAST(MAX(vocab) AS BIGINT) AS vocab,
       CAST(MAX(t_train) AS BIGINT) AS train_tokens,
       CAST(MAX(t_test) AS BIGINT) AS test_tokens,
       ROUND(CAST(SUM(term_nano) AS DOUBLE) / {KL_SCALE}, 4) AS kl_nats
FROM terms GROUP BY lang ORDER BY lang
"""


# -------------------------------------------------- embedding split drift

def embedding_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space split integrity per label: cosine between the
    TRAIN-split centroid and the TEST-split centroid of each label
    (md5 hash split on vec_id). Near-1 cosines mean the held-out split
    sees the same embedding distribution it will be evaluated on; a
    label whose split centroids diverge is either undersampled or its
    test slice drifted — the multimodal counterpart of
    ``token_kl_shift``.

    Plan: one posexplode → (label, split, pos) mean aggregate (the IVF
    coarse-quantizer shape, 2·L·64 cells), centroids re-assembled per
    (label, split), then the train/test sides meet in a conditional
    aggregation per label instead of a self-join (r15 optimization):
    Catalyst does not deduplicate a diamond, so the two join legs each
    re-ran the whole explode pipeline from the scan — 2 corpus explodes
    → 1, and the L-row shuffle of the pivot replaces a join. A label
    missing either split aggregates to NULL and is excluded exactly as
    the inner join excluded it. Nothing larger than L rows past the
    first aggregate at any corpus size. Output:
    (label, n_train, n_test, centroid_cosine)."""
    from datalake_iceberg_spark.queries.similarity import _dot, _norm

    emb = load_balanced(spark, sf_dir, "embeddings")
    split = (
        F.when(
            F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % TRAIN_MOD < TRAIN_PCT,
            "train",
        ).otherwise("test")
    )
    exploded = emb.select(
        "label", split.alias("split"),
        F.posexplode(_as_double_col("embedding")).alias("pos", "v"),
    )
    cents = (
        exploded.groupBy("label", "split", "pos")
        .agg(F.avg("v").alias("cv"), F.count("*").alias("n"))
        .groupBy("label", "split")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pairs"),
            F.max("n").alias("n_vecs"),
        )
        .select(
            "label", "split", "n_vecs",
            F.transform("pairs", lambda s: s.cv).alias("centroid"),
        )
    )
    # train/test pivot: exactly one cents row per (label, split), so a
    # conditional MAX is a deterministic "the value or NULL"
    both = cents.groupBy("label").agg(
        F.max(F.when(F.col("split") == "train", F.col("n_vecs"))).alias("n_train"),
        F.max(F.when(F.col("split") == "train", F.col("centroid"))).alias("c_tr"),
        F.max(F.when(F.col("split") == "test", F.col("n_vecs"))).alias("n_test"),
        F.max(F.when(F.col("split") == "test", F.col("centroid"))).alias("c_te"),
    ).where(F.col("c_tr").isNotNull() & F.col("c_te").isNotNull())
    return (
        both
        .withColumn("nrm_tr", _norm(F.col("c_tr")))
        .withColumn("nrm_te", _norm(F.col("c_te")))
        # a label whose split centroid is the zero vector has no defined
        # cosine — exclude it in BOTH engines rather than compare NaNs
        .where((F.col("nrm_tr") > 0) & (F.col("nrm_te") > 0))
        .select(
            F.col("label").cast("long").alias("label"),
            "n_train", "n_test",
            F.round(
                _dot(F.col("c_tr"), F.col("c_te"))
                / (F.col("nrm_tr") * F.col("nrm_te")),
                4,
            ).alias("centroid_cosine"),
        )
        .orderBy("label")
    )


EMBEDDING_SPLIT_DRIFT_SQL = f"""
WITH exploded AS (
  SELECT label,
         CASE WHEN CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % {TRAIN_MOD} < {TRAIN_PCT} THEN 'train' ELSE 'test' END AS split,
         g.i AS pos, CAST(embedding[g.i + 1] AS DOUBLE) AS v
  FROM embeddings, UNNEST(generate_series(0, len(embedding) - 1)) AS g(i)
),
cents AS (
  SELECT label, split, MAX(n) AS n_vecs, list(cv ORDER BY pos) AS centroid
  FROM (
    SELECT label, split, pos, AVG(v) AS cv, COUNT(*) AS n
    FROM exploded GROUP BY label, split, pos
  ) GROUP BY label, split
)
SELECT CAST(tr.label AS BIGINT) AS label,
       CAST(tr.n_vecs AS BIGINT) AS n_train,
       CAST(te.n_vecs AS BIGINT) AS n_test,
       ROUND({_COS_SQL.format(a="tr.centroid", b="te.centroid")}, 4)
         AS centroid_cosine
FROM cents tr JOIN cents te
  ON tr.label = te.label AND tr.split = 'train' AND te.split = 'test'
WHERE {_NRM2_SQL.format(a="tr.centroid")} > 0
  AND {_NRM2_SQL.format(a="te.centroid")} > 0
ORDER BY label
"""


# ---------------------------------------------------- split leakage (r7)

def split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test NEAR-duplicate leakage: LSH candidate pairs (the
    production banded MinHash path — never all-pairs) whose two docs
    fall on OPPOSITE sides of the deterministic md5 train/test split,
    per language. ``ngram_novelty`` asks whether the held-out split
    sees new n-grams; this asks the sharper eval-integrity question —
    how many test documents have a near-copy in train, which inflates
    held-out metrics exactly like benchmark contamination. Cross-rate
    ≈ 2·p·(1−p) (p = train fraction) is the unavoidable baseline for
    random splits of a corpus with internal duplication; the actionable
    signal is the ABSOLUTE cross-pair count — each one is a test doc
    whose evaluation is compromised — and dedup-before-split is the fix.

    Plan: signatures → bands → the standard band-bucket self-join
    (bounded per bucket, no all-pairs stage); pair langs/splits come
    from one 3-column projection of ``documents`` joined to each pair
    leg (column-pruned scans). Pair attributed to
    ``least(lang_a, lang_b)`` so the grouping is deterministic even for
    the rare cross-lang near-dup. Output:
    (lang, n_pairs, n_cross_split, leak_rate)."""
    from datalake_iceberg_spark.queries.dedup import (
        banded_for,
        signatures_for,
    )

    docs = load_balanced(spark, sf_dir, "documents")
    banded = banded_for(signatures_for(docs))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    split = (
        F.when(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % TRAIN_MOD < TRAIN_PCT,
            "train",
        ).otherwise("test")
    )
    meta = docs.select("doc_id", "lang", split.alias("split"))
    ma, mb = meta.alias("ma"), meta.alias("mb")
    tagged = (
        pairs.join(ma, pairs.doc_a == F.col("ma.doc_id"))
        .join(mb, pairs.doc_b == F.col("mb.doc_id"))
        .select(
            F.least(F.col("ma.lang"), F.col("mb.lang")).alias("lang"),
            (F.col("ma.split") != F.col("mb.split")).cast("int").alias("cross"),
        )
    )
    return (
        tagged.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("cross").cast("long").alias("n_cross_split"),
            F.round(F.sum("cross").cast("double") / F.count("*"), 4).alias(
                "leak_rate"
            ),
        )
        .orderBy("lang")
    )


SPLIT_LEAKAGE_SQL = f"""
WITH shingles AS ({{shingle_sql}}),
sigs AS (
  SELECT doc_id,
         {{sig_cols}}
  FROM shingles GROUP BY doc_id
),
banded AS (
  SELECT DISTINCT doc_id, band_hash FROM (
    SELECT doc_id, unnest([{{band_list}}]) AS band_hash
    FROM (SELECT doc_id, {{band_exprs}} FROM sigs)
  )
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
meta AS (
  SELECT doc_id, lang, {_SPLIT_SQL} AS split FROM documents
),
tagged AS (
  SELECT LEAST(ma.lang, mb.lang) AS lang,
         CASE WHEN ma.split != mb.split THEN 1 ELSE 0 END AS cross_split
  FROM pairs p
  JOIN meta ma ON ma.doc_id = p.doc_a
  JOIN meta mb ON mb.doc_id = p.doc_b
)
SELECT lang,
       COUNT(*) AS n_pairs,
       CAST(SUM(cross_split) AS BIGINT) AS n_cross_split,
       ROUND(CAST(SUM(cross_split) AS DOUBLE) / COUNT(*), 4) AS leak_rate
FROM tagged GROUP BY lang ORDER BY lang
"""


def near_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplication matrix: LSH candidate pairs rolled
    up by unordered source pair — which sources mirror/syndicate each
    other (off-diagonal mass) vs self-duplicate (diagonal). The
    source-level view that decides WHICH feed to drop or down-weight
    when near-dup mass is concentrated, where doc-level dedup alone
    would silently keep deleting half of every crawl snapshot forever.

    Plan: identical candidate generation to ``split_leakage`` (band
    bucket self-join); source tags from a 2-column projection joined to
    each leg; unordered pair normalized with least/greatest. Output:
    (src_lo, src_hi, n_pairs), ordered by src_lo, src_hi."""
    from datalake_iceberg_spark.queries.dedup import (
        banded_for,
        signatures_for,
    )

    docs = load_balanced(spark, sf_dir, "documents")
    banded = banded_for(signatures_for(docs))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    meta = docs.select("doc_id", "source")
    ma, mb = meta.alias("ma"), meta.alias("mb")
    return (
        pairs.join(ma, pairs.doc_a == F.col("ma.doc_id"))
        .join(mb, pairs.doc_b == F.col("mb.doc_id"))
        .select(
            F.least(F.col("ma.source"), F.col("mb.source")).alias("src_lo"),
            F.greatest(F.col("ma.source"), F.col("mb.source")).alias("src_hi"),
        )
        .groupBy("src_lo", "src_hi")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .orderBy("src_lo", "src_hi")
    )


NEAR_DUP_SOURCE_SQL = f"""
WITH shingles AS ({{shingle_sql}}),
sigs AS (
  SELECT doc_id,
         {{sig_cols}}
  FROM shingles GROUP BY doc_id
),
banded AS (
  SELECT DISTINCT doc_id, band_hash FROM (
    SELECT doc_id, unnest([{{band_list}}]) AS band_hash
    FROM (SELECT doc_id, {{band_exprs}} FROM sigs)
  )
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
SELECT LEAST(ma.source, mb.source) AS src_lo,
       GREATEST(ma.source, mb.source) AS src_hi,
       COUNT(*) AS n_pairs
FROM pairs p
JOIN documents ma ON ma.doc_id = p.doc_a
JOIN documents mb ON mb.doc_id = p.doc_b
GROUP BY 1, 2 ORDER BY src_lo, src_hi
"""


_BAND_LIST_SQL = ", ".join(f"band_{b}" for b in range(N_HASHES // BAND_SIZE))
SPLIT_LEAKAGE_SQL = SPLIT_LEAKAGE_SQL.format(
    shingle_sql=_shingle_sql(), sig_cols=_SIG_COLS_SQL,
    band_list=_BAND_LIST_SQL, band_exprs=_BAND_EXPRS_SQL,
)
NEAR_DUP_SOURCE_SQL = NEAR_DUP_SOURCE_SQL.format(
    shingle_sql=_shingle_sql(), sig_cols=_SIG_COLS_SQL,
    band_list=_BAND_LIST_SQL, band_exprs=_BAND_EXPRS_SQL,
)


# ------------------------------------------- length/vocabulary Pearson r

def len_vocab_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Pearson correlation between document token count and
    distinct-token (type) count — the Heaps-law health check as one
    number per source. Healthy text keeps a strong positive r (longer
    docs keep introducing types); r collapsing toward 0 flags template
    or log-like sources whose extra length is pure repetition, and
    those are exactly the sources whose length-based quality weighting
    misleads.

    FP discipline: all five moments (Σx, Σy, Σxy, Σx², Σy²) are exact
    BIGINT sums of per-doc integers, so the reduction is
    order-independent in both engines; the single FP step is the final
    r = (nΣxy−ΣxΣy)/√(nΣx²−(Σx)²)/√(nΣy²−(Σy)²) from identical integer
    operands. Plan: one explode → per-doc (count, count_distinct) agg →
    per-source moment agg; docs with zero tokens drop out of the
    explode in both engines. Output:
    (source, n_docs, mean_tokens, mean_types, pearson_r)."""
    docs = load_balanced(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id",
        F.explode(
            F.filter(F.split(_norm_text(), " "), lambda t: F.length(t) > 0)
        ).alias("tok"),
    )
    per_doc = toks.groupBy("source", "doc_id").agg(
        F.count("*").alias("x"),                 # tokens
        F.count_distinct("tok").alias("y"),      # types
    )
    mom = per_doc.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    vx = mom.n * mom.sxx - mom.sx * mom.sx
    vy = mom.n * mom.syy - mom.sy * mom.sy
    cov = mom.n * mom.sxy - mom.sx * mom.sy
    return mom.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.round(mom.sx.cast("double") / mom.n, 4).alias("mean_tokens"),
        F.round(mom.sy.cast("double") / mom.n, 4).alias("mean_types"),
        F.when(
            (vx > 0) & (vy > 0),
            F.round(
                cov.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
                4,
            ),
        ).alias("pearson_r"),
    ).orderBy("source")


LEN_VOCAB_CORR_SQL = """
WITH toks AS (
  SELECT source, doc_id, tok
  FROM (
    SELECT source, doc_id,
           unnest(string_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')) AS tok
    FROM documents
  ) WHERE length(tok) > 0
),
per_doc AS (
  SELECT source, doc_id,
         COUNT(*) AS x, COUNT(DISTINCT tok) AS y
  FROM toks GROUP BY source, doc_id
),
mom AS (
  SELECT source, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM per_doc GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       ROUND(CAST(sx AS DOUBLE) / n, 4) AS mean_tokens,
       ROUND(CAST(sy AS DOUBLE) / n, 4) AS mean_types,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                          * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 4)
       END AS pearson_r
FROM mom GROUP BY ALL ORDER BY source
"""


# ---------------------------------------------- DSIR importance weights

DSIR_TARGET_LANG = "en"  # the target domain: its docs define p_target


def dsir_log_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al., *Data Selection for
    Language Models via Importance Resampling*): score every document
    by the log-likelihood ratio of its tokens under the TARGET
    distribution (here: the ``DSIR_TARGET_LANG`` slice) vs the RAW
    corpus distribution, both add-one smoothed — the principled
    replacement for hand-tuned quality filters when curating toward a
    domain. Positive weight ⇒ the doc looks more like the target than
    like the average crawl; resampling ∝ exp(weight) is the DSIR
    selection rule.

    FP discipline: per-token log ratios are fixed to INTEGER nano-nats
    (the ``token_kl_shift`` recipe), so every per-doc weight is an
    exact integer sum — order-independent across partitions and
    engines. Plan: two passes over the token stream (count pass, then a
    token-keyed join of the per-token ratio back onto occurrences) — at
    100 TB re-exploding is deliberately cheaper than materializing a
    row-per-token stream; the ratio table is vocabulary-sized and the
    join key hashes uniformly; corpus totals are a 1-row broadcast.
    Output per source: (source, n_docs, mean_w_nats,
    frac_target_like)."""
    docs = load_balanced(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source",
        (F.col("lang") == DSIR_TARGET_LANG).alias("is_t"),
        F.explode(
            F.filter(F.split(_norm_text(), " "), lambda t: F.length(t) > 0)
        ).alias("tok"),
    )
    per_tok = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("c_t"),
        F.count("*").alias("c_r"),
    )
    totals = per_tok.agg(
        F.count("*").alias("v"),
        F.sum("c_t").alias("t_tot"),
        F.sum("c_r").alias("r_tot"),
    )
    lr = per_tok.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.round(
            F.log(
                ((F.col("c_t") + 1).cast("double") / (F.col("t_tot") + F.col("v")))
                / ((F.col("c_r") + 1).cast("double") / (F.col("r_tot") + F.col("v")))
            )
            * F.lit(float(KL_SCALE))
        ).cast("long").alias("lr_nano"),
    )
    per_doc = (
        toks.join(lr, "tok")
        .groupBy("doc_id", "source")
        .agg(F.sum("lr_nano").alias("w_nano"))
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(
                F.sum("w_nano").cast("double")
                / (F.count("*") * F.lit(float(KL_SCALE))),
                4,
            ).alias("mean_w_nats"),
            F.round(
                F.sum(F.when(F.col("w_nano") > 0, 1).otherwise(0)).cast("double")
                / F.count("*"),
                4,
            ).alias("frac_target_like"),
        )
        .orderBy("source")
    )


DSIR_LOG_RATIO_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, lang = '{DSIR_TARGET_LANG}' AS is_t, t.tok
  FROM documents,
       UNNEST(list_filter(string_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' '),
                          x -> length(x) > 0)) AS t(tok)
),
per_tok AS (
  SELECT tok,
         SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS c_t,
         COUNT(*) AS c_r
  FROM toks GROUP BY tok
),
totals AS (
  SELECT COUNT(*) AS v, SUM(c_t) AS t_tot, SUM(c_r) AS r_tot FROM per_tok
),
lr AS (
  SELECT tok,
         CAST(ROUND(
           ln((CAST(c_t + 1 AS DOUBLE) / (t_tot + v))
              / (CAST(c_r + 1 AS DOUBLE) / (r_tot + v)))
           * {KL_SCALE}) AS BIGINT) AS lr_nano
  FROM per_tok CROSS JOIN totals
),
per_doc AS (
  SELECT k.doc_id, k.source, SUM(l.lr_nano) AS w_nano
  FROM toks k JOIN lr l USING (tok)
  GROUP BY k.doc_id, k.source
)
SELECT source,
       COUNT(*) AS n_docs,
       ROUND(CAST(SUM(w_nano) AS DOUBLE) / (COUNT(*) * {KL_SCALE}.0), 4)
         AS mean_w_nats,
       ROUND(CAST(SUM(CASE WHEN w_nano > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS frac_target_like
FROM per_doc GROUP BY source ORDER BY source
"""
