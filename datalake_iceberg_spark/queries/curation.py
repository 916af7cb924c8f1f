"""Training-data curation operators over the ``documents`` / ``events``
/ ``embeddings`` tables — the filter/scrub/sample/audit layer a
large-scale LLM data pipeline runs between raw ingest and tokenization.

Beyond-reference surface (the reference has no query corpus); each
operator is a declarative DataFrame plan with a DuckDB oracle.

Cross-engine determinism rules (same as analytics.py):
- ratios/averages are computed from exact integer counts and divided in
  double at the end — identical IEEE results in both engines;
- per-row float reductions (embedding norms) fold a fixed-length array
  left-to-right in both engines, then quantize to integer millis before
  any cross-row aggregation;
- sampling is content-hash-based (md5 hex prefix), not RNG-based, so
  both engines select identical rows.

Scale notes: every operator is one scan + one shuffle (or none);
term/vocab lists ride as plan-time literals (broadcast-free); the
contamination check semi-joins against a small benchmark side that
Spark auto-broadcasts. No Python execution anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_iceberg_spark.queries import load, load_balanced

# ---------------------------------------------------------------- scrub

#: stand-in "sensitive term" patterns (the corpus has no real PII; the
#: plumbing — regex redaction + audit counts — is what the operator is)
SCRUB_PATTERN = r"\b(customer|spark)\b"


def term_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrub audit: per source, how many docs contain the
    sensitive pattern and how many chars redaction removes. One scan,
    one agg shuffle; the regex evaluates in codegen."""
    docs = load(spark, sf_dir, "documents")
    scrubbed_len = F.length(F.regexp_replace(F.col("text"), SCRUB_PATTERN, ""))
    hit = (F.length("text") > scrubbed_len).cast("long")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(hit).alias("docs_with_term"),
            F.sum(F.length("text") - scrubbed_len).alias("chars_redacted"),
        )
        .orderBy("source")
    )


TERM_SCRUB_SQL = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN length(text) > length(regexp_replace(text, '\\b(customer|spark)\\b', '', 'g')) THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_term,
       CAST(SUM(length(text) - length(regexp_replace(text, '\\b(customer|spark)\\b', '', 'g'))) AS BIGINT) AS chars_redacted
FROM documents GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------- funnel

def filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel: how many docs survive each successive
    curation gate. Computed as one pass of conditional aggregates (no
    per-stage re-scan); the gates nest, so each count is the AND of all
    previous predicates."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "a")))
    g1 = (F.col("n_chars") >= 100) & (F.col("n_chars") <= 2000)
    g2 = g1 & (n_tok >= 20)
    g3 = g2 & (stop * 5 <= n_tok)  # stopword ratio <= 20%, integer math
    agg = docs.agg(
        F.count("*").alias("all_docs"),
        F.sum(g1.cast("long")).alias("len_ok"),
        F.sum(g2.cast("long")).alias("tokens_ok"),
        F.sum(g3.cast("long")).alias("stopword_ok"),
    )
    return agg.select(
        F.stack(
            F.lit(4),
            F.lit(0), F.lit("all_docs"), "all_docs",
            F.lit(1), F.lit("len_ok"), "len_ok",
            F.lit(2), F.lit("tokens_ok"), "tokens_ok",
            F.lit(3), F.lit("stopword_ok"), "stopword_ok",
        ).alias("stage_idx", "stage", "n_docs")
    )


FILTER_FUNNEL_SQL = """
WITH t AS (
  SELECT n_chars,
         length(string_split(text, ' ')) AS n_tok,
         length(list_filter(string_split(text, ' '), x -> x IN ('the','a'))) AS stop
  FROM documents
), a AS (
  SELECT COUNT(*) AS all_docs,
         CAST(SUM(CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END) AS BIGINT) AS len_ok,
         CAST(SUM(CASE WHEN n_chars BETWEEN 100 AND 2000 AND n_tok >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS tokens_ok,
         CAST(SUM(CASE WHEN n_chars BETWEEN 100 AND 2000 AND n_tok >= 20 AND stop * 5 <= n_tok THEN 1 ELSE 0 END) AS BIGINT) AS stopword_ok
  FROM t
)
SELECT * FROM (
  SELECT 0 AS stage_idx, 'all_docs' AS stage, all_docs AS n_docs FROM a
  UNION ALL SELECT 1, 'len_ok', len_ok FROM a
  UNION ALL SELECT 2, 'tokens_ok', tokens_ok FROM a
  UNION ALL SELECT 3, 'stopword_ok', stopword_ok FROM a
)
"""


# ----------------------------------------------------- shingle repetition

def shingle_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal-repetition audit: per source, the average fraction of a
    doc's 5-gram shingles that are duplicates of an earlier shingle in
    the SAME doc (degenerate/looping text detector). All array HOFs —
    zero shuffle until the final per-source agg."""
    docs = load_balanced(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # 5-gram shingles via 5 shifted-slice zip_withs — ONE linear pass
    # per doc (the index form, transform over sequence + slice(i),
    # re-walks the token array per index: quadratic, measured 2.4×
    # slower end-to-end at sf0.1). Docs under 5 tokens degrade to an
    # EMPTY array, matching the oracle's generate_series(1, n<=0).
    m = F.greatest(F.size(toks) - F.lit(4), F.lit(1))
    out = F.slice(toks, 1, m)
    for j in range(1, 5):
        out = F.zip_with(
            out, F.slice(toks, j + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    shingles = F.when(F.size(toks) >= 5, out).otherwise(
        F.array().cast("array<string>")
    )
    with_counts = docs.select(
        "doc_id",
        "source",
        F.size(shingles).alias("n_shingles"),
        F.size(F.array_distinct(shingles)).alias("n_unique"),
    ).withColumn("n_dup", F.col("n_shingles") - F.col("n_unique"))
    return (
        with_counts.filter(F.col("n_shingles") > 0)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_dup").alias("dup_shingles"),
            F.sum("n_shingles").alias("total_shingles"),
            (F.sum("n_dup").cast("double") / F.sum("n_shingles")).alias("dup_ratio"),
        )
        .orderBy("source")
    )


SHINGLE_REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT doc_id, source,
         [array_to_string(t[i:i+4], ' ') FOR i IN generate_series(1, GREATEST(length(t) - 4, 0))] AS shingles
  FROM toks
), counts AS (
  SELECT doc_id, source, length(shingles) AS n_shingles,
         length(list_distinct(shingles)) AS n_unique
  FROM sh WHERE length(shingles) > 0
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_shingles - n_unique) AS BIGINT) AS dup_shingles,
       CAST(SUM(n_shingles) AS BIGINT) AS total_shingles,
       CAST(SUM(n_shingles - n_unique) AS DOUBLE) / CAST(SUM(n_shingles) AS DOUBLE) AS dup_ratio
FROM counts GROUP BY source ORDER BY source
"""


# ------------------------------------------------------------- sampling

def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling (md5 hex prefix ∈ {0,1} —
    a 2/16 systematic rate), stratified by language. Hash-based so both
    engines (and any two cluster runs) pick identical rows; per stratum
    the realized rate rides along for sampling-bias audits."""
    docs = load(spark, sf_dir, "documents")
    sampled = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(sampled.cast("long")).alias("n_sampled"),
            (F.sum(sampled.cast("long")).cast("double") / F.count("*")).alias("rate"),
        )
        .orderBy("lang")
    )


STRATIFIED_SAMPLE_SQL = """
SELECT lang, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1') THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS rate
FROM documents GROUP BY lang ORDER BY lang
"""


# -------------------------------------------------------- contamination

def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: exact-content overlap between the
    corpus and a held-out benchmark set (stand-in: docs with
    ``doc_id % 97 == 0``). Per source: docs whose md5(text) appears in
    the benchmark. The benchmark side is tiny → Spark broadcasts the
    semi-join; at 100 TB this is the canonical broadcast-semi-join
    decontamination shape."""
    docs = load(spark, sf_dir, "documents").withColumn("h", F.md5("text"))
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("h").distinct()
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    contaminated = corpus.join(bench, "h", "left_semi")
    return (
        corpus.groupBy("source").agg(F.count("*").alias("n_docs"))
        .join(
            contaminated.groupBy("source").agg(F.count("*").alias("n_contaminated")),
            "source",
            "left",
        )
        .select(
            "source",
            "n_docs",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        )
        .orderBy("source")
    )


CONTAMINATION_SQL = """
WITH h AS (
  SELECT source, doc_id, md5(text) AS h FROM documents
), bench AS (
  SELECT DISTINCT h FROM h WHERE doc_id % 97 = 0
), corpus AS (
  SELECT * FROM h WHERE doc_id % 97 != 0
)
SELECT c.source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN c.h IN (SELECT h FROM bench) THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
FROM corpus c GROUP BY c.source ORDER BY c.source
"""


# ------------------------------------------------------------ winsorize

def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust value stats per event_type: mean before vs after
    clipping to the [P05, P95] band. Percentiles via exact
    ``percentile`` (same linear interpolation as DuckDB's
    ``quantile_cont``); means accumulate in integer micros so the
    cross-row sum is order-independent."""
    from datalake_iceberg_spark.queries.analytics import load_events

    ev = load_events(spark, sf_dir)
    micros = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
    ev = ev.withColumn("v_us", micros)
    pct = ev.groupBy("event_type").agg(
        F.expr("percentile(v_us, 0.05)").alias("p05_us"),
        F.expr("percentile(v_us, 0.95)").alias("p95_us"),
        F.count("*").alias("n_events"),
        F.sum("v_us").alias("sum_us"),
    )
    clipped = (
        ev.join(F.broadcast(pct.select("event_type", "p05_us", "p95_us")), "event_type")
        .withColumn(
            "c_us",
            F.greatest(F.least(F.col("v_us").cast("double"), F.col("p95_us")), F.col("p05_us")),
        )
        .groupBy("event_type")
        .agg(F.sum(F.floor(F.col("c_us") + F.lit(0.5)).cast("long")).alias("clip_sum_us"))
    )
    return (
        pct.join(clipped, "event_type")
        .select(
            "event_type",
            "n_events",
            (F.col("sum_us").cast("double") / 1e6 / F.col("n_events")).alias("mean_raw"),
            (F.col("clip_sum_us").cast("double") / 1e6 / F.col("n_events")).alias("mean_winsorized"),
        )
        .orderBy("event_type")
    )


WINSORIZED_SQL = """
WITH v AS (
  SELECT event_type, CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v_us FROM events
), pct AS (
  SELECT event_type, quantile_cont(v_us, 0.05) AS p05_us, quantile_cont(v_us, 0.95) AS p95_us,
         COUNT(*) AS n_events, CAST(SUM(v_us) AS BIGINT) AS sum_us
  FROM v GROUP BY event_type
), clipped AS (
  SELECT v.event_type,
         CAST(SUM(CAST(FLOOR(GREATEST(LEAST(CAST(v.v_us AS DOUBLE), p.p95_us), p.p05_us) + 0.5) AS BIGINT)) AS BIGINT) AS clip_sum_us
  FROM v JOIN pct p ON v.event_type = p.event_type
  GROUP BY v.event_type
)
SELECT p.event_type, p.n_events,
       CAST(p.sum_us AS DOUBLE) / 1e6 / p.n_events AS mean_raw,
       CAST(c.clip_sum_us AS DOUBLE) / 1e6 / p.n_events AS mean_winsorized
FROM pct p JOIN clipped c ON p.event_type = c.event_type
ORDER BY p.event_type
"""


# ------------------------------------------------------------ histogram

def token_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-length histogram in fixed-width buckets of 10
    tokens (integer math — no float bucket-boundary hazards). The
    pre-tokenization length audit every training pipeline runs."""
    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    # explicit floor division: a bare CAST(x/10 AS INT) truncates in
    # Spark but rounds in DuckDB — floor() makes both engines agree
    bucket = F.floor(n_tok / 10).cast("int") * 10
    return (
        docs.select(bucket.alias("bucket_lo"), n_tok.alias("n_tok"))
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tok").alias("min_tokens"),
            F.max("n_tok").alias("max_tokens"),
        )
        .orderBy("bucket_lo")
    )


TOKEN_HISTOGRAM_SQL = """
WITH t AS (
  SELECT CAST(length(string_split(text, ' ')) AS INT) AS n_tok FROM documents
)
SELECT CAST(FLOOR(n_tok / 10) AS INT) * 10 AS bucket_lo, COUNT(*) AS n_docs,
       CAST(MIN(n_tok) AS INT) AS min_tokens, CAST(MAX(n_tok) AS INT) AS max_tokens
FROM t GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------------------- OOV rate

#: reference vocabulary for out-of-vocabulary auditing (plan-time
#: literal — rides in the task binary, no broadcast needed)
REFERENCE_VOCAB = (
    "the a data join merge table row column key value query scan filter "
    "sort group agg window hash batch stream"
).split()


def oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary token rate per language against a reference
    vocabulary: total tokens, OOV tokens, and the rate from exact
    integer counts. Token membership runs as an array HOF in codegen."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    vocab = F.array(*[F.lit(w) for w in REFERENCE_VOCAB])
    n_oov = F.size(F.filter(toks, lambda t: ~F.array_contains(vocab, t)))
    agg = docs.groupBy("lang").agg(
        F.sum(F.size(toks).cast("long")).alias("total_tokens"),
        F.sum(n_oov.cast("long")).alias("oov_tokens"),
    )
    return agg.select(
        "lang",
        "total_tokens",
        "oov_tokens",
        (F.col("oov_tokens").cast("double") / F.col("total_tokens")).alias("oov_ratio"),
    ).orderBy("lang")


OOV_RATE_SQL = """
WITH t AS (
  SELECT lang, string_split(text, ' ') AS toks FROM documents
), c AS (
  SELECT lang, length(toks) AS n_tok,
         length(list_filter(toks, x -> NOT list_contains(
           ['the','a','data','join','merge','table','row','column','key','value','query','scan','filter','sort','group','agg','window','hash','batch','stream'], x))) AS n_oov
  FROM t
)
SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(n_oov) AS BIGINT) AS oov_tokens,
       CAST(SUM(n_oov) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE) AS oov_ratio
FROM c GROUP BY lang ORDER BY lang
"""


# ------------------------------------------------------ embedding norms

def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm stats per label: the norm folds the fixed-length vector
    left-to-right (same order both engines), quantizes to integer
    millis per row, then aggregates exactly — order-independent across
    the cluster."""
    emb = load(spark, sf_dir, "embeddings")
    ss = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    norm_milli = F.floor(F.sqrt(ss) * 1000 + F.lit(0.5)).cast("long")
    return (
        emb.select("label", norm_milli.alias("nm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.min("nm").alias("min_norm_milli"),
            F.max("nm").alias("max_norm_milli"),
            (F.sum("nm").cast("double") / 1000.0 / F.count("*")).alias("avg_norm"),
        )
        .orderBy("label")
    )


EMBEDDING_NORM_SQL = """
WITH n AS (
  SELECT label,
         CAST(FLOOR(sqrt(list_aggregate([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding], 'sum')) * 1000 + 0.5) AS BIGINT) AS nm
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vectors,
       CAST(MIN(nm) AS BIGINT) AS min_norm_milli, CAST(MAX(nm) AS BIGINT) AS max_norm_milli,
       CAST(SUM(nm) AS DOUBLE) / 1000.0 / COUNT(*) AS avg_norm
FROM n GROUP BY label ORDER BY label
"""


# ------------------------------------------------------------- packing

PACK_TOKEN_BUDGET = 512
N_PACK_SHARDS = 16


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget training
    bins (the pre-tokenization packing step of an LLM pipeline). Docs
    are packed PER SHARD in deterministic doc_id order; within a shard a
    doc goes in the bin of its preceding cumulative token count
    (``floor(cum_before / budget)``) — greedy packing where a boundary
    doc may overflow its bin, the standard concat-and-split
    approximation. Bin identity is ``(shard, local_bin)``, globally
    unique without any cross-shard coordination.

    The cumsum window is PARTITIONED by the shard id, so the plan is one
    hash shuffle on shard + per-partition sort — no single-partition
    global sort at any scale; shard count is tuned so one shard ≈ one
    task's worth of docs (same sizing rule as training-shard export,
    :func:`datalake_iceberg_spark.ingest.shards.shard_expr`). The shard
    id here is a SQL-portable ``doc_id % N`` so the DuckDB oracle can
    replicate the exact assignment; production exports use the
    xxhash64-based ``shard_expr`` for key-agnostic balance.
    Output per bin: doc count, token sum, first/last doc id."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    shard = F.pmod(F.col("doc_id"), F.lit(N_PACK_SHARDS)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = (
        docs.select("doc_id", n_tok.alias("n_tok"), shard.alias("shard"))
        .withColumn(
            "local_bin",
            F.floor(
                F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / PACK_TOKEN_BUDGET
            ).cast("int"),
        )
    )
    return (
        binned.groupBy("shard", "local_bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard", "local_bin")
    )


def pack_sequences_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-sequence packing variant: one bin stream over the GLOBAL
    doc_id order. The window has no partition spec — a deliberate
    single-partition sort, acceptable only for small curated sets (e.g.
    an eval suite); the first-class entry is the shard-local
    :func:`pack_sequences`."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    cum_before = F.coalesce(F.sum(n_tok).over(w), F.lit(0))
    binned = docs.select(
        "doc_id",
        n_tok.alias("n_tok"),
        F.floor(cum_before / PACK_TOKEN_BUDGET).cast("int").alias("bin_id"),
    )
    return (
        binned.groupBy("bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bin_id")
    )


PACK_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT doc_id, length(string_split(text, ' ')) AS n_tok,
         CAST(doc_id % {N_PACK_SHARDS} AS INT) AS shard
  FROM documents
), c AS (
  SELECT doc_id, n_tok, shard,
         CAST(FLOOR(COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {PACK_TOKEN_BUDGET}) AS INT) AS local_bin
  FROM t
)
SELECT shard, local_bin, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc, CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM c GROUP BY shard, local_bin ORDER BY shard, local_bin
"""


# ----------------------------------------------------------------- cube

def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping combinations
    in one pass (extends the GROUPING SETS coverage in analytics.py).
    Revenue accumulates in exact integer cents."""
    from datalake_iceberg_spark.queries.analytics import cents

    li = load(spark, sf_dir, "lineitem")
    rev = cents("l_extendedprice")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(rev).cast("double") / 100.0).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "revenue",
        )
        .orderBy("returnflag", "linestatus")
    )


CUBE_REVENUE_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


# -------------------------------------------------------------- mixture

MIXTURE_BUDGET_FRAC = 2  # budget = total_docs // 2


def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mixing sampler — the stage that reshapes a raw
    corpus into a target source mixture before tokenization. Per-source
    target weights derive in-plan from the source name (stand-in for a
    configured mixture table); the per-source acceptance rate is
    ``min(1, target_n / n_s)`` quantized to integer permyriad, and a doc
    is accepted iff its md5 bucket falls under the rate — identical
    row picks on any engine, run, or cluster (no RNG state).

    Plan shape: one tiny per-source aggregate + a 1-row totals cross
    (broadcast), then one corpus scan joined (broadcast) to the ≤
    |sources| rate rows — no shuffle of the corpus itself; exact
    integer arithmetic end-to-end so both engines floor identically.
    Output: (source, n_docs, target_n, n_sampled, realized_rate)."""
    docs = load(spark, sf_dir, "documents")
    w = (F.ascii(F.substring("source", 4, 1)) % 3 + 1).cast("long")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.max(w).alias("w")
    )
    totals = per_src.agg(
        F.sum("n_docs").alias("total_docs"), F.sum("w").alias("w_sum")
    )
    rates = (
        per_src.crossJoin(F.broadcast(totals))
        .withColumn(
            "target_n",
            (F.floor(F.col("total_docs") / MIXTURE_BUDGET_FRAC) * F.col("w"))
            .cast("long")
            / F.col("w_sum"),
        )
        .withColumn("target_n", F.floor("target_n").cast("long"))
        .withColumn(
            "rate_pm",
            F.least(
                F.lit(10_000),
                F.floor(F.lit(10_000) * F.col("target_n") / F.col("n_docs")),
            ).cast("long"),
        )
        .select("source", "n_docs", "target_n", "rate_pm")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10_000
    )
    picked = docs.select("source", bucket.alias("bkt")).join(
        F.broadcast(rates), "source"
    )
    return (
        picked.groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("target_n").alias("target_n"),
            F.sum((F.col("bkt") < F.col("rate_pm")).cast("long")).alias("n_sampled"),
        )
        .withColumn(
            "realized_rate",
            F.col("n_sampled").cast("double") / F.col("n_docs"),
        )
        .orderBy("source")
    )


MIXTURE_SQL = f"""
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         MAX(CAST(ascii(substr(source, 4, 1)) % 3 + 1 AS BIGINT)) AS w
  FROM documents GROUP BY source
),
totals AS (
  SELECT SUM(n_docs) AS total_docs, SUM(w) AS w_sum FROM per_src
),
rates AS (
  SELECT source, n_docs,
         CAST(FLOOR(CAST(FLOOR(total_docs / {MIXTURE_BUDGET_FRAC}) * w AS BIGINT) / w_sum) AS BIGINT) AS target_n
  FROM per_src CROSS JOIN totals
),
rated AS (
  SELECT source, n_docs, target_n,
         LEAST(10000, CAST(FLOOR(10000 * target_n / n_docs) AS BIGINT)) AS rate_pm
  FROM rates
)
SELECT d.source, MAX(r.n_docs) AS n_docs, MAX(r.target_n) AS target_n,
       CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
                     < r.rate_pm THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
                     < r.rate_pm THEN 1 ELSE 0 END) AS DOUBLE) / MAX(r.n_docs) AS realized_rate
FROM documents d JOIN rated r USING (source)
GROUP BY d.source ORDER BY d.source
"""


# -------------------------------------------------------------- deciles

def quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source NTILE(10) binning by document length — the
    curriculum / quality-band assignment step (train on high bands
    first, or drop the bottom band). Deterministic: the tile order
    breaks ties on doc_id, and NTILE's extra-rows-to-early-buckets
    rule is engine-standard. One hash shuffle on source + per-partition
    sort. Output: (source, decile, n_docs, min_chars, max_chars)."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return (
        docs.withColumn("decile", F.ntile(10).over(w))
        .groupBy("source", "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source", "decile")
    )


QUALITY_DECILES_SQL = """
SELECT source, decile, COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM (
  SELECT source, n_chars,
         NTILE(10) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS decile
  FROM documents
)
GROUP BY source, decile ORDER BY source, decile
"""


# ---------------------------------------------------------- boilerplate

BOILERPLATE_N = 3  # n-gram length
BOILERPLATE_MIN_DOCS = 2  # a span repeated across >= this many docs
BOILERPLATE_TOP = 20


def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-span detector: word n-grams that recur across many
    DISTINCT documents (headers, footers, license blurbs — the spans a
    curation pipeline strips before training). Complements the pairwise
    dedup family: doc-frequency of spans, not doc-pair similarity.

    Plan: one scan; n-grams built with array HOFs in codegen (linear in
    text length); ``array_distinct`` collapses within-doc repeats
    BEFORE the explode so the shuffle carries one row per (doc, gram);
    then a single agg + deterministic top-N. At 100 TB the gram agg is
    the only shuffle and partials combine map-side.
    Output: (gram, n_docs), top-N by (n_docs desc, gram asc)."""
    docs = load_balanced(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    grams = F.when(
        F.size("toks") >= BOILERPLATE_N,
        F.expr(
            f"transform(sequence(1, size(toks) - {BOILERPLATE_N - 1}), "
            f"i -> array_join(slice(toks, i, {BOILERPLATE_N}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_doc = docs.select("doc_id", F.explode(F.array_distinct(grams)).alias("gram"))
    return (
        per_doc.groupBy("gram")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
        .orderBy(F.desc("n_docs"), F.asc("gram"))
        .limit(BOILERPLATE_TOP)
    )


BOILERPLATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i + {BOILERPLATE_N - 1}], ' ') AS gram
  FROM toks, UNNEST(range(1, greatest(len(t) - {BOILERPLATE_N - 1}, 0) + 1)) AS g(i)
)
SELECT gram, COUNT(*) AS n_docs
FROM grams GROUP BY gram
HAVING COUNT(*) >= {BOILERPLATE_MIN_DOCS}
ORDER BY n_docs DESC, gram ASC
LIMIT {BOILERPLATE_TOP}
"""


# ------------------------------------------------------------- chunking

CHUNK_SIZE = 16  # tokens per chunk
CHUNK_STRIDE = 12  # overlap = CHUNK_SIZE - CHUNK_STRIDE


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking — the RAG / context-window prep step:
    split each document into overlapping ``CHUNK_SIZE``-token windows
    advancing by ``CHUNK_STRIDE``, fingerprint each chunk (md5 of the
    re-joined tokens) for downstream chunk-level dedup.

    Chunk count and offsets are pure integer arithmetic per document
    (``1 + ceil((n - size) / stride)`` when n > size, else 1), generated
    with ``sequence`` + ``transform`` — one explode, zero shuffles, zero
    Python. At 100 TB this is an embarrassingly parallel map stage whose
    output partitioning inherits the scan's.
    Output: (doc_id, chunk_id, chunk_start, n_chunk_tokens, chunk_md5)."""
    docs = load_balanced(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.where(F.trim(F.col("text")) != "").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    ).withColumn("n", F.size("w"))
    n_chunks = F.when(
        F.col("n") <= CHUNK_SIZE, F.lit(1)
    ).otherwise(
        F.lit(1) + F.ceil((F.col("n") - F.lit(CHUNK_SIZE)) / F.lit(CHUNK_STRIDE)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            (i * CHUNK_STRIDE).alias("chunk_start"),
            F.slice(F.col("w"), i * CHUNK_STRIDE + 1, CHUNK_SIZE).alias("toks"),
        ),
    )
    return (
        words.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").cast("int").alias("chunk_id"),
            F.col("c.chunk_start").cast("int").alias("chunk_start"),
            F.size("c.toks").alias("n_chunk_tokens"),
            F.md5(F.array_join("c.toks", " ")).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


CHUNK_DOCUMENTS_SQL = rf"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
  FROM documents WHERE trim(text) != ''
),
sized AS (
  SELECT doc_id, w, len(w) AS n,
         CASE WHEN len(w) <= {CHUNK_SIZE} THEN 1
              ELSE 1 + CAST(ceil((len(w) - {CHUNK_SIZE}) / CAST({CHUNK_STRIDE} AS DOUBLE)) AS INT)
         END AS n_chunks
  FROM words
),
chunks AS (
  SELECT doc_id, g.i AS chunk_id, g.i * {CHUNK_STRIDE} AS chunk_start,
         w[g.i * {CHUNK_STRIDE} + 1 : g.i * {CHUNK_STRIDE} + {CHUNK_SIZE}] AS toks
  FROM sized, UNNEST(generate_series(0, n_chunks - 1)) AS g(i)
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(chunk_start AS INT) AS chunk_start,
       CAST(len(toks) AS INT) AS n_chunk_tokens,
       md5(array_to_string(toks, ' ')) AS chunk_md5
FROM chunks
ORDER BY doc_id, chunk_id
"""


# ------------------------------------------------- weighted sampling

SAMPLE_TOP_K = 20


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis–Spirakis
    A-ES scheme with a DETERMINISTIC pseudo-uniform: u(doc) derives
    from an md5 prefix of the doc id (content-hash convention shared
    with ``stratified_sample_counts``), priority key = -ln(u) / weight
    (weight = n_chars), and the K smallest keys per source win — longer
    documents are proportionally likelier to be drawn, yet reruns and
    both engines select IDENTICAL rows.

    Scale: the key is a projection; selection is one top-K-per-group
    window (partial-aggregated rank, no global sort). This is the
    standard distributed weighted-reservoir formulation — at 100 TB the
    same plan runs as a map + per-source top-K tree reduce.
    Output: (source, rank, doc_id, n_chars)."""
    docs = load_balanced(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double") + F.lit(1.0)
    ) / F.lit(4294967296.0)  # (h+1)/2^32 in (0, 1]
    key = -F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    w = Window.partitionBy("source").orderBy(F.col("es_key").asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("es_key", key)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= SAMPLE_TOP_K)
        .select("source", "rank", "doc_id", "n_chars")
        .orderBy("source", "rank")
    )


WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         -ln(CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1 AS DOUBLE)
             / CAST(4294967296 AS DOUBLE))
         / CAST(greatest(n_chars, 1) AS DOUBLE) AS es_key
  FROM documents
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY es_key ASC, doc_id ASC) AS rank
  FROM keyed
)
SELECT source, CAST(rank AS INT) AS rank, doc_id, n_chars
FROM ranked WHERE rank <= {SAMPLE_TOP_K}
ORDER BY source, rank
"""


# ------------------------------------- n-gram-level decontamination

CONTAM_NGRAM_N = 3


def ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-level benchmark decontamination — the published GPT-3
    appendix-C rule (flag a training doc if it shares any long word
    n-gram with an eval set), at n=3 to suit this corpus' short docs
    and tiny synthetic vocabulary (production corpora use 8-13).
    Complements ``contamination_overlap`` (whole-doc hash): n-gram
    containment catches partial inclusions a doc hash misses.

    Plan: the benchmark side (doc_id % 97 == 0) distills to a DISTINCT
    set of gram md5s — tiny, so Spark broadcasts the semi-join; corpus
    grams are ``array_distinct``-ed per doc BEFORE the explode, and the
    doc-level verdict is a distinct on (source, doc_id) after the
    semi-join. At 100 TB: one corpus scan, gram build in codegen, the
    broadcast semi-join filters at the map side, and the only shuffles
    carry (source, doc_id) survivors and the final per-source partials.
    Output: (source, n_docs, n_contaminated)."""
    docs = load_balanced(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.col("text"), " ")
    )
    grams = F.when(
        F.size("toks") >= CONTAM_NGRAM_N,
        F.expr(
            f"transform(sequence(1, size(toks) - {CONTAM_NGRAM_N - 1}), "
            f"i -> md5(array_join(slice(toks, i, {CONTAM_NGRAM_N}), ' ')))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    with_grams = docs.select(
        "doc_id", "source", F.array_distinct(grams).alias("grams")
    )
    bench = (
        with_grams.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("grams").alias("g"))
        .distinct()
    )
    corpus = with_grams.filter(F.col("doc_id") % 97 != 0)
    contaminated = (
        corpus.select("doc_id", "source", F.explode("grams").alias("g"))
        .join(bench, "g", "left_semi")
        .select("source", "doc_id")
        .distinct()
    )
    return (
        corpus.groupBy("source").agg(F.count("*").alias("n_docs"))
        .join(
            contaminated.groupBy("source").agg(F.count("*").alias("n_contaminated")),
            "source",
            "left",
        )
        .select(
            "source",
            "n_docs",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        )
        .orderBy("source")
    )


NGRAM_CONTAMINATION_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, source,
         md5(array_to_string(t[i:i + {CONTAM_NGRAM_N - 1}], ' ')) AS g
  FROM toks, UNNEST(range(1, greatest(len(t) - {CONTAM_NGRAM_N - 1}, 0) + 1)) AS gs(i)
  WHERE len(t) >= {CONTAM_NGRAM_N}
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
corpus_docs AS (
  SELECT doc_id, source FROM toks WHERE doc_id % 97 != 0
),
contaminated AS (
  SELECT DISTINCT gr.source, gr.doc_id
  FROM grams gr JOIN bench b ON gr.g = b.g
  WHERE gr.doc_id % 97 != 0
)
SELECT c.source, COUNT(*) AS n_docs,
       CAST(COALESCE(MAX(x.n), 0) AS BIGINT) AS n_contaminated
FROM corpus_docs c
LEFT JOIN (SELECT source, COUNT(*) AS n FROM contaminated GROUP BY source) x
  ON c.source = x.source
GROUP BY c.source ORDER BY c.source
"""


# ------------------------------------------------------- gopher quality

#: Rae et al. 2021 (Gopher, arXiv 2112.11446) appendix-A quality rules —
#: the canonical named rule set public web-corpus pipelines apply before
#: training. Thresholds are the published ones; comparisons are kept in
#: INTEGER form (3n <= Σlen <= 10n instead of 3 <= Σlen/n <= 10) so both
#: engines evaluate bit-identical predicates.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOPWORDS = 2


def gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule audit: per source, how many docs fail each
    rule and how many pass ALL of them — the go/no-go gate before a
    corpus enters training. One scan, one agg shuffle; every rule is a
    codegen array-HOF expression over the tokenized text, no Python,
    no floating-point thresholds (integer cross-multiplied forms).

    Rules: word count in [50, 100k]; mean word length in [3, 10];
    ≥2 stopwords from the published 8-word list; ≥80% of words contain
    an alphabetic character; symbol-to-word ratio ('#' chars and '...'
    runs) ≤ 10%.
    Output: (source, n_docs, fail_*, pass_all) — all BIGINT."""
    docs = load_balanced(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*GOPHER_STOPWORDS)))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    n_hash = F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
    ) / 3
    f_wc = (n < GOPHER_MIN_WORDS) | (n > GOPHER_MAX_WORDS)
    f_mwl = (sum_len < 3 * n) | (sum_len > 10 * n)
    f_stop = n_stop < GOPHER_MIN_STOPWORDS
    f_alpha = n_alpha * 5 < n * 4
    f_sym = (n_hash + n_ellipsis) * 10 > n
    flags = [
        ("fail_word_count", f_wc),
        ("fail_mean_word_len", f_mwl),
        ("fail_stopwords", f_stop),
        ("fail_alpha_ratio", f_alpha),
        ("fail_symbol_ratio", f_sym),
    ]
    pass_all = ~(f_wc | f_mwl | f_stop | f_alpha | f_sym)
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            *[F.sum(c.cast("long")).alias(name) for name, c in flags],
            F.sum(pass_all.cast("long")).alias("pass_all"),
        )
        .orderBy("source")
    )


GOPHER_SQL = rf"""
WITH t AS (
  SELECT source,
         string_split_regex(trim(text), '\s+') AS w,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         (length(text) - length(replace(text, '...', ''))) / 3 AS n_ellipsis
  FROM documents
), f AS (
  SELECT source,
         len(w) AS n,
         list_sum(list_transform(w, x -> length(x))) AS sum_len,
         len(list_filter(w, x -> x IN {GOPHER_STOPWORDS})) AS n_stop,
         len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
         n_hash, n_ellipsis
  FROM t
), g AS (
  SELECT source,
         (n < {GOPHER_MIN_WORDS} OR n > {GOPHER_MAX_WORDS}) AS f_wc,
         (sum_len < 3 * n OR sum_len > 10 * n) AS f_mwl,
         (n_stop < {GOPHER_MIN_STOPWORDS}) AS f_stop,
         (n_alpha * 5 < n * 4) AS f_alpha,
         ((n_hash + n_ellipsis) * 10 > n) AS f_sym
  FROM f
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN f_wc THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_count,
       CAST(SUM(CASE WHEN f_mwl THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_word_len,
       CAST(SUM(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopwords,
       CAST(SUM(CASE WHEN f_alpha THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha_ratio,
       CAST(SUM(CASE WHEN f_sym THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbol_ratio,
       CAST(SUM(CASE WHEN NOT (f_wc OR f_mwl OR f_stop OR f_alpha OR f_sym)
                THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
FROM g GROUP BY source ORDER BY source
"""


# ------------------------------------------------------- budgeted selection


def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained corpus selection: per source, admit documents
    in descending token-count order (doc_id tiebreak) until 20% of the
    source's total tokens are spent — the "fill an N-token training
    budget with the best docs per source" curation primitive. One scan,
    one shuffle on ``source`` (two window functions share the
    partitioning); the ROWS-frame cumulative sum makes the admission
    threshold exact and deterministic in both engines. Reports, per
    source, the docs/tokens admitted and the smallest admitted doc (the
    admission cut-off a pipeline would publish)."""
    docs = load_balanced(spark, sf_dir, "documents")
    toks = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col("text")), " ")))
    d = docs.select("doc_id", "source", toks.alias("n_tokens"))
    order = Window.partitionBy("source").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    whole = Window.partitionBy("source")
    sel = (
        d.withColumn("cum_tokens", F.sum("n_tokens").over(order))
        .withColumn("total_tokens", F.sum("n_tokens").over(whole))
        .filter(F.col("cum_tokens") * 5 <= F.col("total_tokens"))
    )
    return (
        sel.groupBy("source")
        .agg(
            F.count("*").alias("n_selected"),
            F.sum("n_tokens").alias("tokens_selected"),
            F.min("n_tokens").alias("cutoff_tokens"),
        )
        .orderBy("source")
    )


TOKEN_BUDGET_SQL = """
WITH d AS (
    SELECT doc_id, source,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split(trim(text), ' ')) END AS n_tokens
    FROM documents
), ranked AS (
    SELECT source, n_tokens,
           SUM(n_tokens) OVER (
               PARTITION BY source
               ORDER BY n_tokens DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum_tokens,
           SUM(n_tokens) OVER (PARTITION BY source) AS total_tokens
    FROM d
)
SELECT source,
       COUNT(*) AS n_selected,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected,
       MIN(n_tokens) AS cutoff_tokens
FROM ranked
WHERE cum_tokens * 5 <= total_tokens
GROUP BY source
ORDER BY source
"""
