"""Deduplication operators over ``documents``: exact, MinHash-LSH,
SimHash, n-gram Jaccard.

Design for 100 TB:
- **Exact**: hash-groupBy on a normalized-content digest — one shuffle
  keyed by md5, minimal row width (digest + doc_id) after projection.
- **MinHash-LSH**: shingle → k independent min-hashes → band buckets →
  candidate pairs only within a bucket. The self-join is on band-hash
  (tiny keys), never all-pairs; at scale band buckets bound join fanout
  and skewed buckets split under AQE.
- **SimHash**: 32-bit signature as exact integer; near-dup = equal
  signature (or banded prefix). One shuffle.
- **n-gram Jaccard**: exact verify step for LSH candidates — shingle
  sets joined per candidate pair, not all-pairs.

All hashing is md5-based (identical hex in Spark and DuckDB) so every
step is oracle-checkable — no engine-specific hash functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_iceberg_spark.queries import load, load_balanced

N_HASHES = 8          # minhash signature length
BAND_SIZE = 2         # rows per band -> 4 bands
SHINGLE_N = 3         # word shingles


def _norm_text():
    return F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " ")


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized content hash; survivor = min doc_id.
    Returns (content_md5, survivor_doc_id, n_copies)."""
    docs = load_balanced(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(_norm_text()).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .orderBy("survivor_doc_id")
    )


EXACT_DEDUP_SQL = """
SELECT md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS content_md5,
       MIN(doc_id) AS survivor_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
ORDER BY survivor_doc_id
"""


def _shingle_array():
    """Word-SHINGLE_N-grams per doc as an array column (multiset — NOT
    deduped: ``array_distinct`` is O(n²) per row and MinHash is
    duplicate-invariant, min over a multiset == min over its set).

    Built as zip_with over SHINGLE_N shifted slices — one linear pass
    per doc. The index-based form (transform over sequence + slice(i))
    re-walks the token array per index: quadratic per document, ~3×
    slower end-to-end on the minhash pipeline at sf0.1."""
    toks = F.split(_norm_text(), " ")
    m = F.greatest(F.size(toks) - (SHINGLE_N - 1), F.lit(1))
    out = F.slice(toks, 1, m)
    for j in range(1, SHINGLE_N):
        out = F.zip_with(
            out, F.slice(toks, j + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(F.size(toks) >= SHINGLE_N, out).otherwise(
        F.array().cast("array<string>")
    )


def _shingles(docs: DataFrame) -> DataFrame:
    """Distinct row-per-shingle form — for the Jaccard verify stage,
    where set semantics matter; dedup is a hash shuffle (O(n)), not a
    per-row array_distinct (O(n²))."""
    return docs.select(
        "doc_id", F.explode(_shingle_array()).alias("shingle")
    ).distinct()


def _sig_expr(i: int):
    """Hash-family member i as an 8-hex-char (32-bit) slice of one of
    two seeded md5 digests — 2 md5 evaluations yield all N_HASHES
    functions (the standard one-hash-split trick; slices of a digest
    are independent uniform components), a 4× hashing saving over
    md5-per-seed on the 10M+ shingle rows at sf0.1."""
    seed = i // 4
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("shingle")))
    return F.substring(h, (i % 4) * 8 + 1, 8)


def _sig_sql(i: int) -> str:
    seed = i // 4
    return f"substr(md5(concat_ws('|', '{seed}', shingle)), {(i % 4) * 8 + 1}, 8)"


_SIG_COLS_SQL = ", ".join(f"MIN({_sig_sql(i)}) AS sig_{i}" for i in range(N_HASHES))


def signatures_for(docs: DataFrame) -> DataFrame:
    """MinHash signatures for an arbitrary ``documents``-shaped frame
    (doc_id, text): sig_i = min over shingles of hash_i(shingle).
    Docs with < SHINGLE_N words yield no shingles and no signature row.

    Plan note (measured, sf0.1): the tempting zero-shuffle variant —
    ``array_min(transform(...))`` per row — is ~10× SLOWER, because
    higher-order-function lambdas are not codegen-supported (interpreted,
    no subexpression elimination). The relational explode → groupBy with
    map-side partial mins is the fast Spark plan: one shuffle of tiny
    (doc_id, 8×min) partial rows; codegen CSE evaluates each seeded md5
    once per shingle."""
    sh = docs.select("doc_id", F.explode(_shingle_array()).alias("shingle"))
    aggs = [F.min(_sig_expr(i)).alias(f"sig_{i}") for i in range(N_HASHES)]
    return sh.groupBy("doc_id").agg(*aggs)


def signatures_for_shingles(sh: DataFrame) -> DataFrame:
    """Signatures from an existing (doc_id, shingle) frame — for
    callers that already materialized the shingle stage for other
    consumers (``minhash_recall``). MinHash is duplicate-invariant, so
    the distinct-set form yields signatures identical to
    :func:`signatures_for`'s multiset explode."""
    aggs = [F.min(_sig_expr(i)).alias(f"sig_{i}") for i in range(N_HASHES)]
    return sh.groupBy("doc_id").agg(*aggs)


def banded_for(sig: DataFrame) -> DataFrame:
    """LSH band hashes from a signature frame: (doc_id, band_hash), one
    row per band, band = md5 of band index + BAND_SIZE consecutive
    signature values. The distinct() is a no-op set-wise (band index is
    baked into the hash) but load-bearing plan-wise: its exchange is the
    materialization point self-join legs reuse (ReusedExchange)."""
    n_bands = N_HASHES // BAND_SIZE
    bands = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"sig_{b * BAND_SIZE + j}") for j in range(BAND_SIZE)],
            )
        ).alias("band_hash")
        for b in range(n_bands)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("band_hash")
    ).distinct()


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature: sig_i = min over shingles of hash_i(shingle),
    where hash_i is a 32-bit slice of a seeded md5 (see ``_sig_expr``).
    Hex-string min is a valid exchangeable hash-min (uniform over hex)
    and engine-portable. Output: doc_id + N_HASHES columns."""
    docs = load_balanced(spark, sf_dir, "documents")
    return signatures_for(docs).orderBy("doc_id")


def _shingle_sql(where: str = "") -> str:
    return f"""
  SELECT DISTINCT doc_id, array_to_string(norm_tokens[i:i+{SHINGLE_N - 1}], ' ') AS shingle
  FROM (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ') AS norm_tokens
    FROM documents {where}
  ) t, UNNEST(generate_series(1, GREATEST(len(norm_tokens) - {SHINGLE_N - 1}, 0))) AS u(i)
  WHERE length(array_to_string(norm_tokens[i:i+{SHINGLE_N - 1}], ' ')) > 0
"""


MINHASH_SIG_SQL = f"""
WITH shingles AS ({_shingle_sql()})
SELECT doc_id,
       {_SIG_COLS_SQL}
FROM shingles
GROUP BY doc_id
ORDER BY doc_id
"""


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: docs sharing ≥1 band (band = md5 of BAND_SIZE
    consecutive signature values). Join happens per band bucket — the
    scale path (no all-pairs)."""
    docs = load_balanced(spark, sf_dir, "documents")
    banded = banded_for(signatures_for(docs))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


_BAND_EXPRS_SQL = ", ".join(
    "md5(concat_ws('|', '{b}', {cols})) AS band_{b}".format(
        b=b,
        cols=", ".join(f"sig_{b * BAND_SIZE + j}" for j in range(BAND_SIZE)),
    )
    for b in range(N_HASHES // BAND_SIZE)
)

MINHASH_LSH_SQL = f"""
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
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b ON a.band_hash = b.band_hash AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


MAX_CC_ITERS = 50


def dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the LSH
    candidate-pair graph, cluster id = min doc_id in the component.
    The end-game of near-dup detection — every doc gets a cluster label
    and a cluster size (1 = unique).

    Implementation (r15 optimization): iterative min-label propagation
    over the band HYPERGRAPH instead of the materialized pair graph. A
    band bucket with k docs encodes the same connectivity as its k(k-1)/2
    candidate pairs, so CC over (doc, band) incidences ≡ CC over the
    pair graph — but the incidence list is Σk rows where the pair list
    is Σk² (the memory hog the r14 sf1 capture flagged at 7.8% GC, and
    the exact blowup a boilerplate-heavy web corpus produces). The pair
    self-join, its DISTINCT and the pair checkpoint are gone from the
    plan; one band-count shuffle restricts the loop to HOT bands (≥2
    docs), so per-round shuffle volume stays ∝ the duplicate graph, not
    the corpus, and each round is: labels ⋈ incidences → per-band min →
    ⋈ incidences → per-doc min (all partial-aggregated map-side).
    ``localCheckpoint`` per round truncates lineage (the standard Spark
    iterative-graph pattern). Converges in O(component diameter) rounds
    — LSH duplicate clusters are near-cliques, so 2-3 rounds in
    practice. For adversarially long chains switch to
    large-star/small-star (Kiveris et al., "Connected Components in
    MapReduce"), which bounds rounds at O(log n).

    Oracle: DuckDB recursive CTE computing min reachable id over the
    candidate-PAIR graph — an independent fixpoint formulation of the
    same components (band-mates ≡ pair-neighbors, see above).
    Output: (doc_id, cluster_id, cluster_size) for every document.
    """
    from pyspark.storagelevel import StorageLevel

    docs = load(spark, sf_dir, "documents").select("doc_id")
    banded = banded_for(signatures_for(load_balanced(spark, sf_dir, "documents")))
    # hot bands only: a band containing a single doc contributes no
    # edge, and every doc outside all hot bands is a singleton by
    # definition (re-labelling it every round is wasted shuffle). The
    # count and the semi-join share one exchange on band_hash. Docs in
    # hot bands = docs with ≥1 candidate partner — the same node set
    # the pair-graph loop iterated over. Serialized storage
    # (MEMORY_AND_DISK is the serialized level in PySpark naming):
    # byte-array blocks, not millions of live row objects.
    hot = banded.groupBy("band_hash").agg(F.count("*").alias("k")).where(
        F.col("k") >= 2
    )
    # every checkpoint in the loop is LAZY: the per-round convergence
    # count is the one action that materializes that round's blocks, so
    # each round costs ONE Spark job instead of checkpoint-job + count-
    # job (and inc/labels materialize inside round 1 rather than as two
    # serial warm-up jobs). Blocks are still written exactly once and
    # reused by the next round / the final assembly.
    inc = banded.join(hot.select("band_hash"), "band_hash").localCheckpoint(
        eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
    # r16 note (VERDICT item 4 "fuse the first hop into the incidence
    # checkpoint job" — EXAMINED, MEASURED, REJECTED): seeding labels
    # with hop(identity) (= per-band min(doc_id) joined back, no label
    # join needed) removes this DISTINCT but only saves an iteration
    # when a component's convergence hop-count H is ODD — the loop
    # stops at the first k with 2k(-1 when seeded) ≥ H. Both measured
    # tiers converge at EVEN H (sf0.1: 2 hops; sf1: 8), so the seeded
    # form ran the same 2 / 5 iterations PLUS the seed's extra
    # join+aggregation pair: A/B min-of-3 at matched calibration read
    # +0.2-0.4 s at sf0.1 (2.99-3.13 s identity seed vs 3.22-3.51 s
    # hop-seeded) and job count rose 34 -> 36. Kept the identity seed.
    labels = (
        inc.select("doc_id")
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    def _hop(lab: DataFrame) -> DataFrame:
        # one hypergraph min-hop: per-band min, then per-doc min over
        # the doc's bands. A doc belongs to its own bands, so the hop
        # already includes (and can only improve) its own label.
        band_min = (
            inc.join(lab, "doc_id")
            .groupBy("band_hash")
            .agg(F.min("label").alias("bmin"))
        )
        return (
            inc.join(band_min, "band_hash")
            .groupBy("doc_id")
            .agg(F.min("bmin").alias("label"))
        )

    for _ in range(MAX_CC_ITERS):
        # TWO hops per iteration, one convergence check: hops only ever
        # DECREASE labels (monotone from identity), so
        # hop(hop(L)) == L ⟹ hop(L) == L — the two-hop fixpoint test is
        # exact while halving the driver actions / checkpoints on deep
        # components (the sf1 tier's duplicate chains take 8 single
        # hops; near-clique LSH clusters still converge in one
        # iteration + confirm). The intermediate hop feeds exactly one
        # consumer, so it needs no materialization.
        stepped = (
            _hop(_hop(labels))
            .join(labels.select("doc_id", F.col("label").alias("prev")), "doc_id")
            .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
        )
        changed = stepped.filter(F.col("label") < F.col("prev")).count()
        labels = stepped.drop("prev")
        if changed == 0:
            break
    else:  # pragma: no cover - convergence guard
        raise RuntimeError(f"label propagation did not converge in {MAX_CC_ITERS} rounds")
    # sizes is CLUSTER-COUNT-sized — it grows with the duplicate graph
    # (tens of millions of components on a web corpus), so the join is
    # deliberately UNHINTED: AQE broadcasts while small, sort-merges
    # when the component count outgrows the threshold. Both sides are
    # already keyed on label, so the fallback is a co-partitioned join.
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    clustered = labels.join(sizes, "label").select(
        "doc_id", F.col("label").alias("cluster_id"), "cluster_size"
    )
    singletons = docs.join(
        labels.select("doc_id"), "doc_id", "left_anti"
    ).select(
        "doc_id",
        F.col("doc_id").alias("cluster_id"),
        F.lit(1).cast("long").alias("cluster_size"),
    )
    return clustered.unionByName(singletons).orderBy("doc_id")


DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE shingles AS ({_shingle_sql()}),
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
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM cands
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cands
),
reach(id, root) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.dst, r.root FROM reach r JOIN sym s ON s.src = r.id
),
comp AS (SELECT id AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, cluster_id, cluster_size
FROM comp JOIN (SELECT cluster_id AS cid, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
  ON cluster_id = cid
ORDER BY doc_id
"""


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash as an exact integer.

    Bit b of a token = parity of the b-th hex char of md5(token); the
    signature bit is the sign of the weighted bit sum over the doc's
    distinct tokens. Pure integer arithmetic — portable and exact.

    Plan note (measured, sf0.1): the zero-shuffle per-row form — 32
    ``F.aggregate`` lambdas over the token-hash array — is ~25% SLOWER
    than this relational explode → groupBy, because higher-order-
    function lambdas are interpreted (no codegen, and each of the 32
    re-walks the array). Exploding distinct tokens keeps every bit
    contribution inside whole-stage codegen; the one shuffle carries
    map-side-combined (doc_id, 32×int) partials — same tradeoff the
    minhash pipeline makes (see :func:`signatures_for`)."""
    docs = load_balanced(spark, sf_dir, "documents")
    tok_arr = F.array_distinct(
        F.filter(F.split(_norm_text(), " "), lambda t: F.length(t) > 0)
    )
    toks = docs.select("doc_id", F.explode(tok_arr).alias("tok"))
    h = F.md5(F.col("tok"))
    contrib = toks.select(
        "doc_id",
        *[
            ((F.ascii(F.substring(h, b + 1, 1)) % 2) * 2 - 1).alias(f"c_{b}")
            for b in range(32)
        ],
    )
    bal = contrib.groupBy("doc_id").agg(
        *[F.sum(f"c_{b}").alias(f"bal_{b}") for b in range(32)]
    )
    sig = sum(
        F.when(F.col(f"bal_{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
        for b in range(32)
    )
    return bal.select("doc_id", sig.alias("simhash32")).orderBy("doc_id")


SIMHASH_SQL = """
WITH toks AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id,
           unnest(string_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')) AS tok
    FROM documents
  ) WHERE length(tok) > 0
),
hashed AS (SELECT doc_id, md5(tok) AS h FROM toks),
bal AS (
  SELECT doc_id,
         {BAL_COLS}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, ({SIG_EXPR}) AS simhash32
FROM bal ORDER BY doc_id
""".format(
    BAL_COLS=", ".join(
        f"SUM((ascii(substr(h, {b + 1}, 1)) % 2) * 2 - 1) AS bal_{b}" for b in range(32)
    ),
    SIG_EXPR=" + ".join(
        f"CAST(CASE WHEN bal_{b} > 0 THEN {2 ** b} ELSE 0 END AS BIGINT)" for b in range(32)
    ),
)


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity for LSH candidate pairs ≥ 0.2.

    The verify stage of near-dup detection: intersection via shingle
    join *restricted to candidate pairs*, union by inclusion-exclusion.
    """
    docs = load_balanced(spark, sf_dir, "documents")
    sh = _shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    cands = minhash_lsh_pairs(spark, sf_dir)
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        cands.join(a, cands.doc_a == F.col("a.doc_id"))
        .join(b, (cands.doc_b == F.col("b.doc_id"))
              & (F.col("a.shingle") == F.col("b.shingle")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.round(
        F.col("n_inter").cast("double")
        / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")),
        4,
    )
    return (
        inter.join(sa, inter.doc_a == F.col("sa.doc_id"))
        .join(sb, inter.doc_b == F.col("sb.doc_id"))
        .select(
            "doc_a", "doc_b",
            F.col("n_inter").alias("n_common_shingles"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.2)
        .orderBy("doc_a", "doc_b")
    )


NGRAM_JACCARD_SQL = f"""
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
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cands c
  JOIN shingles a ON a.doc_id = c.doc_a
  JOIN shingles b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, n_inter AS n_common_shingles,
       ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.2
ORDER BY doc_a, doc_b
"""


# ------------------------------------------------------- incremental dedup

BATCH_MOD = 10  # graded-entry batch split: doc_id % 10 == 0 is "new"


def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup: near-dup check of a NEW batch against
    the existing corpus via an asymmetric LSH band join (new-vs-index,
    never corpus-vs-corpus) — the daily-ingest shape of MinHash dedup.

    The graded entry splits the fixture deterministically (doc_id %
    BATCH_MOD == 0 is the incoming batch; the rest is the corpus, a
    stand-in for the PERSISTED signature index — see
    :class:`datalake_iceberg_spark.ops.incremental_dedup.SignatureIndex`
    for the real persisted flow). At 100 TB the index side is a lake
    table bucketed by band_hash: the probe shuffles ONLY the batch
    (broadcast when small) and touches only colliding index buckets, so
    cost scales with batch size, not corpus size.

    Output, one row per batch doc: (batch_doc, is_dup, first_match =
    min colliding corpus doc_id or NULL, n_matches = colliding corpus
    docs)."""
    docs = load_balanced(spark, sf_dir, "documents")
    is_batch = F.pmod(F.col("doc_id"), F.lit(BATCH_MOD)) == 0
    batch = docs.filter(is_batch)
    # ONE shingle→signature→band pipeline over the whole corpus, split
    # into probe/index legs AFTER banding (r15 optimization): signatures
    # and bands are per-doc independent, so filtering banded rows by the
    # batch predicate is identical to banding each side separately. The
    # lazy localCheckpoint is the required barrier — without it Catalyst
    # pushes each leg's doc_id filter back down to the scan and the two
    # legs re-become two full scan+shingle+md5 pipelines (2 corpus
    # scans → 1 materialized band list, tiny rows: doc_id + hash).
    banded = banded_for(signatures_for(docs)).localCheckpoint(eager=False)
    bands_b = banded.where(F.pmod(F.col("doc_id"), F.lit(BATCH_MOD)) == 0)
    bands_c = banded.where(F.pmod(F.col("doc_id"), F.lit(BATCH_MOD)) != 0)
    cand = (
        bands_b.alias("n")
        .join(bands_c.alias("i"), F.col("n.band_hash") == F.col("i.band_hash"))
        .select(
            F.col("n.doc_id").alias("batch_doc"),
            F.col("i.doc_id").alias("corpus_doc"),
        )
        .distinct()
    )
    per_batch = cand.groupBy("batch_doc").agg(
        F.min("corpus_doc").alias("first_match"),
        F.count("*").alias("n_matches"),
    )
    return (
        batch.select(F.col("doc_id").alias("batch_doc"))
        .join(per_batch, "batch_doc", "left")
        .select(
            "batch_doc",
            F.col("first_match").isNotNull().alias("is_dup"),
            "first_match",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
        )
        .orderBy("batch_doc")
    )


_BANDED_CTE = f"""
  SELECT DISTINCT doc_id, band_hash FROM (
    SELECT doc_id, unnest([{", ".join(f"band_{b}" for b in range(N_HASHES // BAND_SIZE))}]) AS band_hash
    FROM (SELECT doc_id, {_BAND_EXPRS_SQL} FROM {{sigs}})
  )
"""

INCREMENTAL_DEDUP_SQL = f"""
WITH bsh AS ({_shingle_sql(f"WHERE doc_id % {BATCH_MOD} = 0")}),
csh AS ({_shingle_sql(f"WHERE doc_id % {BATCH_MOD} != 0")}),
bsig AS (SELECT doc_id, {_SIG_COLS_SQL} FROM bsh GROUP BY doc_id),
csig AS (SELECT doc_id, {_SIG_COLS_SQL} FROM csh GROUP BY doc_id),
bband AS ({_BANDED_CTE.format(sigs="bsig")}),
cband AS ({_BANDED_CTE.format(sigs="csig")}),
cand AS (
  SELECT DISTINCT b.doc_id AS batch_doc, c.doc_id AS corpus_doc
  FROM bband b JOIN cband c ON b.band_hash = c.band_hash
),
per AS (
  SELECT batch_doc, MIN(corpus_doc) AS first_match, COUNT(*) AS n_matches
  FROM cand GROUP BY batch_doc
)
SELECT d.doc_id AS batch_doc,
       per.first_match IS NOT NULL AS is_dup,
       per.first_match,
       CAST(COALESCE(per.n_matches, 0) AS BIGINT) AS n_matches
FROM (SELECT doc_id FROM documents WHERE doc_id % {BATCH_MOD} = 0) d
LEFT JOIN per ON d.doc_id = per.batch_doc
ORDER BY batch_doc
"""


# ------------------------------------------------- duplicate span audit

DUPSPAN_N = 5  # word n-gram span length (Lee et al. use 50-token spans
               # at corpus scale; 5 keeps the small fixtures meaningful)


def duplicate_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicated-span mass — the exact-substring-dedup
    signal of Lee et al., "Deduplicating Training Data Makes Language
    Models Better" (2107.06499), at n-gram granularity: how many of a
    source's word-``DUPSPAN_N``-gram POSITIONS sit inside a span that
    also occurs in at least one OTHER document. Unlike
    ``boilerplate_ngrams`` (top-N offender spans) this measures the
    per-source fraction of text that span-level dedup would remove.

    Plan: ONE scan, one pass. Spans are built with array HOFs in
    codegen and exploded WITH multiplicity (every position counts);
    first shuffle aggs by (gram, source) with map-side partial combine.
    The gram-level doc frequency is the SUM of per-source distinct-doc
    counts (each doc lives in exactly one source), computed as a WINDOW
    over ``partitionBy(gram)`` — no self-join, no diamond that would
    re-scan and re-explode the corpus (grams are high-cardinality, so
    the window parallelizes fully). Final agg by source is a few-row
    shuffle. Integer counts end-to-end: exact on any engine.
    Output: (source, n_docs, total_spans, dup_spans)."""
    from pyspark.sql import Window

    docs = load_balanced(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    grams = F.when(
        F.size("toks") >= DUPSPAN_N,
        F.expr(
            f"transform(sequence(1, size(toks) - {DUPSPAN_N - 1}), "
            f"i -> array_join(slice(toks, i, {DUPSPAN_N}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    spans = docs.select("doc_id", "source", F.explode(grams).alias("gram"))
    gs = spans.groupBy("gram", "source").agg(
        F.count("*").alias("occ"),
        F.count_distinct("doc_id").alias("docs_in_source"),
    )
    df_over_gram = F.sum("docs_in_source").over(Window.partitionBy("gram"))
    per_source = (
        gs.withColumn("df", df_over_gram)
        .groupBy("source")
        .agg(
            F.sum("occ").alias("total_spans"),
            F.sum(F.when(F.col("df") >= 2, F.col("occ")).otherwise(0)).alias(
                "dup_spans"
            ),
        )
    )
    n_docs = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    return (
        n_docs.join(per_source, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("total_spans", F.lit(0)).alias("total_spans"),
            F.coalesce("dup_spans", F.lit(0)).alias("dup_spans"),
        )
        .orderBy("source")
    )


DUPSPAN_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
),
spans AS (
  SELECT doc_id, source, array_to_string(t[i:i + {DUPSPAN_N - 1}], ' ') AS gram
  FROM toks, UNNEST(range(1, greatest(len(t) - {DUPSPAN_N - 1}, 0) + 1)) AS g(i)
),
gs AS (
  SELECT gram, source, COUNT(*) AS occ, COUNT(DISTINCT doc_id) AS docs_in_source
  FROM spans GROUP BY gram, source
),
gdf AS (SELECT gram, SUM(docs_in_source) AS df FROM gs GROUP BY gram),
agg AS (
  SELECT s.source, SUM(s.occ) AS total_spans,
         SUM(CASE WHEN g.df >= 2 THEN s.occ ELSE 0 END) AS dup_spans
  FROM gs s JOIN gdf g USING (gram) GROUP BY s.source
),
nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
SELECT nd.source, nd.n_docs,
       CAST(COALESCE(agg.total_spans, 0) AS BIGINT) AS total_spans,
       CAST(COALESCE(agg.dup_spans, 0) AS BIGINT) AS dup_spans
FROM nd LEFT JOIN agg USING (source) ORDER BY nd.source
"""


# ------------------------------------------------------- LSH recall audit

RECALL_TAU = 0.5  # ground-truth near-dup threshold for the audit
RECALL_SAMPLE_MOD = 2  # keep 1/MOD of docs in the audit sub-corpus


def _recall_sample_pred(mod: int):
    """Deterministic doc sample predicate, identical across engines:
    first 8 md5 hex chars of doc_id as an int, mod ``mod`` == 0. Same
    idiom as ``hash_split_stats`` — reproducible, uniform, RNG-free."""
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % mod == 0
    )


def minhash_recall(
    spark: SparkSession, sf_dir: str, sample_mod: int = RECALL_SAMPLE_MOD
) -> DataFrame:
    """Recall audit of the banded-LSH candidate generation against
    EXACT Jaccard ground truth (the dedup twin of ``ivf_recall``): of
    all pairs with true shingle-Jaccard ≥ ``RECALL_TAU``, what fraction
    did the band join surface? The number every LSH deployment must
    publish before anyone trusts its "dedup rate" — banding is a
    probabilistic filter (P(candidate) = 1-(1-j^band_size)^n_bands) and
    this measures its realized miss rate on THIS corpus.

    The audit runs on a deterministic hash-sampled sub-corpus (keep
    doc iff md5-bucket(doc_id) % ``sample_mod`` == 0). Recall is a
    per-pair property and banding treats each doc independently, so
    restricting BOTH truth and candidates to the same sample is an
    unbiased estimator of full-corpus recall — and it bounds the
    exact-truth inverted-index self-join, whose hot-shingle key size
    shrinks by 1/sample_mod (expected k²/mod² pairs per boilerplate
    shingle shared by k docs). At 100 TB raise ``sample_mod`` (e.g.
    100–10000) until the sampled corpus fits the audit budget; at
    bench scale MOD=2 keeps enough true pairs to grade.

    Plan: ground truth is an inverted-index shingle self-join (never
    all-pairs — only docs SHARING a shingle meet), one shuffle on the
    shingle; candidates reuse the production band join; truth and
    candidates then meet in ONE full-outer pair join whose single
    aggregation yields all three counts (a crossJoin of separate
    count branches would re-run each pipeline from the scan — the
    plan-lint scan budget exists to catch exactly that). The shingle
    stage is materialized once (``localCheckpoint``) because four
    consumers (self-join both sides, sizes, signatures) would
    otherwise each re-explode the corpus.
    """
    docs = load_balanced(spark, sf_dir, "documents").where(
        _recall_sample_pred(sample_mod)
    )
    sh = _shingles(docs).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_inter").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")
    )
    truth = (
        inter.join(sa, inter.doc_a == F.col("sa.doc_id"))
        .join(sb, inter.doc_b == F.col("sb.doc_id"))
        .where(jac >= RECALL_TAU)
        .select("doc_a", "doc_b", F.lit(1).alias("is_true"))
    )
    cands = banded_for(signatures_for_shingles(sh))
    a2, b2 = cands.alias("a"), cands.alias("b")
    cand_pairs = (
        a2.join(b2, (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .withColumn("is_cand", F.lit(1))
    )
    j = truth.join(cand_pairs, ["doc_a", "doc_b"], "full_outer")
    return j.agg(
        F.sum("is_true").cast("long").alias("n_true_pairs"),
        F.sum("is_cand").cast("long").alias("n_candidates"),
        F.sum(
            F.when((F.col("is_true") == 1) & (F.col("is_cand") == 1), 1).otherwise(0)
        ).cast("long").alias("n_hit"),
    ).select(
        "n_true_pairs",
        "n_candidates",
        "n_hit",
        F.round(
            F.when(F.col("n_true_pairs") > 0,
                   F.col("n_hit").cast("double") / F.col("n_true_pairs"))
            .otherwise(F.lit(1.0)),
            4,
        ).alias("recall"),
    )


_RECALL_SAMPLE_WHERE = (
    "WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    f" % {RECALL_SAMPLE_MOD} = 0"
)

MINHASH_RECALL_SQL = f"""
WITH shingles AS ({_shingle_sql(_RECALL_SAMPLE_WHERE)}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
truth AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= {RECALL_TAU}
),
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
hit AS (SELECT t.* FROM truth t JOIN cands c USING (doc_a, doc_b))
SELECT (SELECT COUNT(*) FROM truth) AS n_true_pairs,
       (SELECT COUNT(*) FROM cands) AS n_candidates,
       (SELECT COUNT(*) FROM hit) AS n_hit,
       ROUND(CASE WHEN (SELECT COUNT(*) FROM truth) > 0
                  THEN CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
                       / (SELECT COUNT(*) FROM truth)
                  ELSE 1.0 END, 4) AS recall
"""


# ------------------------------------------------- survivor selection (r7)

def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection over the near-dup clusters — the curation
    decision ``dup_clusters`` stops short of: within every non-trivial
    cluster KEEP THE MOST COMPLETE document (most tokens; tie → smaller
    doc_id) and drop the rest. Keeping the longest variant is the
    standard policy for near-dup web pages (truncated/paywalled copies
    lose to the full article); swapping the ranking column for a model
    quality score changes one ORDER BY.

    Plan: reuses the full connected-components pipeline (banded LSH
    hypergraph → min-label propagation), joins per-doc token counts
    (one column-pruned scan), then ONE aggregation per cluster (r15
    optimization): the survivor is ``min_by`` over (-n_tokens, doc_id)
    — identical to the old rank window's (n_tokens DESC, doc_id ASC)
    row 1, tie-free since doc_id is unique — and the dropped stats
    derive from the same aggregate (n_dropped = size−1, dropped_tokens
    = total − survivor). The window version shuffled and sorted every
    member row AND fed two consumers (survivors + dropped), a Catalyst
    diamond that re-ran the whole cluster assembly and the token scan
    twice. Output per non-trivial cluster:
    (cluster_id, cluster_size, survivor_doc_id, survivor_tokens,
    n_dropped, dropped_tokens)."""
    clusters = dup_clusters(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(_norm_text(), " "), lambda t: F.length(t) > 0)
        ).alias("n_tokens"),
    )
    joined = clusters.where(F.col("cluster_size") > 1).join(toks, "doc_id")
    agg = joined.groupBy("cluster_id").agg(
        F.max("cluster_size").cast("long").alias("cluster_size"),
        # n_tokens coalesced to -1 inside the ordering key (ADVICE r15):
        # struct ASC sorts a NULL field FIRST, so a null-text doc would
        # win survivorship where the old window (n_tokens DESC = nulls
        # LAST) never picked it; -(-1) = +1 loses to every real count.
        F.min_by(
            F.struct("doc_id", "n_tokens"),
            F.struct(
                (-F.coalesce(F.col("n_tokens"), F.lit(-1))).alias("nt"),
                F.col("doc_id"),
            ),
        ).alias("s"),
        F.count("*").alias("n_members"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    return agg.select(
        "cluster_id",
        "cluster_size",
        F.col("s.doc_id").alias("survivor_doc_id"),
        F.col("s.n_tokens").cast("long").alias("survivor_tokens"),
        (F.col("n_members") - 1).cast("long").alias("n_dropped"),
        (F.col("total_tokens") - F.col("s.n_tokens")).cast("long").alias(
            "dropped_tokens"
        ),
    ).orderBy("cluster_id")


DEDUP_KEEP_BEST_SQL = f"""
WITH RECURSIVE shingles AS ({_shingle_sql()}),
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
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM cands
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cands
),
reach(id, root) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.dst, r.root FROM reach r JOIN sym s ON s.src = r.id
),
comp AS (SELECT id AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY id),
sized AS (
  SELECT c.doc_id, c.cluster_id, s.cluster_size
  FROM comp c JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
                    FROM comp GROUP BY 1) s USING (cluster_id)
  WHERE s.cluster_size > 1
),
toks AS (
  SELECT doc_id, COUNT(*) AS n_tokens FROM (
    SELECT doc_id,
           unnest(string_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')) AS tok
    FROM documents
  ) WHERE length(tok) > 0 GROUP BY doc_id
),
ranked AS (
  SELECT z.*, t.n_tokens,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY t.n_tokens DESC, z.doc_id ASC) AS rk
  FROM sized z JOIN toks t USING (doc_id)
)
SELECT s.cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       s.doc_id AS survivor_doc_id,
       CAST(s.n_tokens AS BIGINT) AS survivor_tokens,
       CAST(d.n_dropped AS BIGINT) AS n_dropped,
       CAST(d.dropped_tokens AS BIGINT) AS dropped_tokens
FROM (SELECT * FROM ranked WHERE rk = 1) s
JOIN (SELECT cluster_id, COUNT(*) AS n_dropped, SUM(n_tokens) AS dropped_tokens
      FROM ranked WHERE rk > 1 GROUP BY cluster_id) d USING (cluster_id)
ORDER BY cluster_id
"""
