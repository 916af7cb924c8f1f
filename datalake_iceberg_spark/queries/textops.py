"""Text-analysis operators over the ``documents`` table.

The training-data-pipeline surface the reference lacks: token counting,
quality scoring, language ID, document fingerprinting. All pure JVM
built-ins (split/regexp/length/md5) — no Python on the hot path, so at
100 TB these run inside whole-stage codegen with only the final
aggregation shuffling.

Oracle parity: each transform uses constructs with identical semantics
in DuckDB (regexp_replace / string splits on single spaces / md5 hex /
exact integer arithmetic), and ratios divide exact ints as IEEE doubles
then round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_iceberg_spark.queries import load, load_balanced

# deterministic tiny stopword sets per language (marker-word heuristic)
LANG_MARKERS = {
    "en": ["the", "a", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "zh": ["de", "shi", "le"],
}
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def _token_count():
    # texts are single-space separated; count = words in non-empty text
    return F.when(
        F.length(F.trim(F.col("text"))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col("text")), " ")))


# BPE-style pre-tokenizer pattern (the GPT-2 shape, simplified to the
# POSIX-portable subset both engines share): letter runs, digit runs,
# and single non-alphanumeric marks each count as one token.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count, BPE-ish regex token count (the LLM
    budget estimator), and char stats per document."""
    docs = load_balanced(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _token_count().alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_PATTERN)).alias("n_bpe_tokens"),
        F.length("text").alias("text_len"),
        F.length(F.regexp_replace("text", "[^a-z]", "")).alias("n_alpha"),
    ).orderBy("doc_id")


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split(trim(text), ' ')) END AS n_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens,
       length(text) AS text_len,
       length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha
FROM documents
ORDER BY doc_id
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword-ratio quality heuristic; `keep` flag for filtering.

    The classic pre-training quality gate shape (C4/Gopher-style rules,
    simplified to deterministic arithmetic): token count bounds, mean
    word length bounds, stopword-hit requirement.
    """
    docs = load_balanced(spark, sf_dir, "documents")
    n_tokens = _token_count()
    stop_hits = sum(
        F.when(F.contains(F.col("text"), F.lit(f" {w} "))
               | F.startswith(F.col("text"), F.lit(f"{w} "))
               | F.endswith(F.col("text"), F.lit(f" {w}")), 1).otherwise(0)
        for w in STOPWORDS
    )
    mean_word_len = F.round(
        (F.length(F.regexp_replace("text", " ", "")).cast("double"))
        / F.greatest(n_tokens, F.lit(1)),
        4,
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        stop_hits.cast("int").alias("stopword_hits"),
        (
            (n_tokens >= 10) & (n_tokens <= 100000)
            & (mean_word_len >= 2.0) & (mean_word_len <= 12.0)
            & (stop_hits >= 1)
        ).cast("int").alias("keep"),
    ).orderBy("doc_id")


_STOP_HITS_SQL = " + ".join(
    "(CASE WHEN contains(text, ' {w} ') OR starts_with(text, '{w} ') "
    "OR ends_with(text, ' {w}') THEN 1 ELSE 0 END)".format(w=w)
    for w in STOPWORDS
)

QUALITY_SCORE_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split(trim(text), ' ')) END AS n_tokens,
         ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / GREATEST(CASE WHEN length(trim(text)) = 0 THEN 0
                               ELSE len(string_split(trim(text), ' ')) END, 1), 4) AS mwl,
         {_STOP_HITS_SQL} AS stopword_hits
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(mwl AS DOUBLE) AS mean_word_len,
       CAST(stopword_hits AS INT) AS stopword_hits,
       CAST(CASE WHEN n_tokens >= 10 AND n_tokens <= 100000
                  AND mwl >= 2.0 AND mwl <= 12.0
                  AND stopword_hits >= 1 THEN 1 ELSE 0 END AS INT) AS keep
FROM base
ORDER BY doc_id
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language scoring: count hits per language's marker set,
    predict argmax (ties broken by language code). N-gram-heuristic shape
    — at scale this is one codegen'd projection, no shuffle before agg."""
    docs = load_balanced(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    scores = [
        sum(
            F.when(F.contains(padded, F.lit(f" {w} ")), 1).otherwise(0)
            for w in words
        ).alias(f"score_{lang}")
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    df = docs.select("doc_id", "lang", *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.coalesce(
        *[F.when((F.col(f"score_{lg}") == best) & (best > 0), F.lit(lg)) for lg in langs],
        F.lit("und"),
    )
    return df.select(
        "doc_id", F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang")
    ).orderBy("doc_id")


_LANG_SCORE_SQL = {
    lang: " + ".join(
        "(CASE WHEN contains(' ' || text || ' ', ' {w} ') THEN 1 ELSE 0 END)".format(w=w)
        for w in words
    )
    for lang, words in sorted(LANG_MARKERS.items())
}
_LANGS = sorted(LANG_MARKERS)
_BEST_SQL = "GREATEST({})".format(", ".join(f"score_{lg}" for lg in _LANGS))
_PRED_SQL = "COALESCE({}, 'und')".format(
    ", ".join(
        f"CASE WHEN score_{lg} = best AND best > 0 THEN '{lg}' END" for lg in _LANGS
    )
)

LANG_ID_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {", ".join(f"{expr} AS score_{lang}" for lang, expr in _LANG_SCORE_SQL.items())}
  FROM documents
), best AS (
  SELECT *, {_BEST_SQL} AS best FROM scored
)
SELECT doc_id, lang AS labeled_lang, {_PRED_SQL} AS predicted_lang
FROM best
ORDER BY doc_id
"""


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of normalized text plus a 32-bit
    content hash derived from the hex digest (portable rolling-hash
    stand-in — exact integer arithmetic both engines)."""
    docs = load_balanced(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " ")
    digest = F.md5(norm)
    h32 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    return docs.select(
        "doc_id",
        digest.alias("content_md5"),
        h32.alias("fingerprint32"),
    ).orderBy("doc_id")


FINGERPRINT_SQL = """
WITH d AS (
  SELECT doc_id, md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS content_md5
  FROM documents
)
SELECT doc_id, content_md5,
       CAST(('0x' || substr(content_md5, 1, 8))::BIGINT AS BIGINT) AS fingerprint32
FROM d
ORDER BY doc_id
"""


# ----------------------------------------------------- n-gram LM scoring


def ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM negative log-likelihood per document, aggregated per
    source — the n-gram stand-in for the KenLM-perplexity quality
    filter in public web-corpus pipelines (CCNet-style): fluent text
    made of corpus-frequent transitions scores low, repetitive or
    out-of-distribution text scores high.

    Model: add-one-smoothed bigram probabilities estimated on the SAME
    corpus — P(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V), where c(w1·) counts
    w1 as a bigram left-context and V is the distinct-token count.
    doc_nll = -mean ln P over the document's bigrams (rounded 6 dp).

    Scale: ONE explode for bigrams, materialized once
    (``localCheckpoint``) because the count estimation and the scoring
    join both consume it — unmaterialized, each consumer re-explodes
    the corpus. Left-context counts derive from the bigram counts
    (c(w1·) = Σ_w2 c(w1,w2)) instead of a second pass. Scoring joins
    doc-bigrams to the count table ON THE BIGRAM KEY — a plain shuffle
    join that AQE can skew-split (stopword bigrams are hot keys); V is
    a one-row broadcast, never a collect.
    Output: (source, n_docs, avg_nll, min_nll, max_nll)."""
    docs = load_balanced(spark, sf_dir, "documents").select("doc_id", "source", "text")
    words = docs.select(
        "doc_id", "source", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    ).withColumn("n", F.size("w"))
    bigrams = F.zip_with(
        F.slice("w", 1, F.col("n") - 1),
        F.slice("w", 2, F.col("n") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    doc_big = (
        words.where(F.col("n") >= 2)
        .select("doc_id", "source", F.explode(bigrams).alias("bg"))
        .select("doc_id", "source", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .localCheckpoint(eager=False)
    )
    c2 = doc_big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        words.select(F.explode("w").alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    scored = (
        doc_big.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id", "source",
            # integer counts cast to double BEFORE the divide: both
            # engines then run the same IEEE double division (a DECIMAL
            # intermediate on the oracle side would round differently)
            F.log(
                (F.col("c2") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("v")).cast("double")
            ).alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.round(-F.avg("lp"), 6).alias("nll")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("nll"), 4).alias("avg_nll"),
            F.round(F.min("nll"), 4).alias("min_nll"),
            F.round(F.max("nll"), 4).alias("max_nll"),
        )
        .orderBy("source")
    )


NGRAM_LM_SQL = r"""
WITH words AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS w
  FROM documents
),
doc_big AS (
  SELECT doc_id, source, w[g.i] AS w1, w[g.i + 1] AS w2
  FROM words, UNNEST(generate_series(1, len(w) - 1)) AS g(i)
  WHERE len(w) >= 2
),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM doc_big GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM doc_big GROUP BY w1),
vocab AS (
  SELECT COUNT(DISTINCT tok) AS v
  FROM (SELECT UNNEST(w) AS tok FROM words)
),
scored AS (
  SELECT d.doc_id, d.source,
         ln(CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + vocab.v AS DOUBLE)) AS lp
  FROM doc_big d
  JOIN c2 ON d.w1 = c2.w1 AND d.w2 = c2.w2
  JOIN c1 ON d.w1 = c1.w1
  CROSS JOIN vocab
),
per_doc AS (
  SELECT doc_id, source, ROUND(-AVG(lp), 6) AS nll
  FROM scored GROUP BY doc_id, source
)
SELECT source, COUNT(*) AS n_docs,
       ROUND(AVG(nll), 4) AS avg_nll,
       ROUND(MIN(nll), 4) AS min_nll,
       ROUND(MAX(nll), 4) AS max_nll
FROM per_doc GROUP BY source ORDER BY source
"""


# ------------------------------------------------------ Zipf audit

ZIPF_TOP = 100


def zipf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency audit: OLS slope of ln(freq) on ln(rank)
    over the top-``ZIPF_TOP`` corpus terms. Natural-language corpora
    sit near slope ≈ -1; a strong deviation flags synthetic, templated,
    or degenerate text — a cheap whole-corpus health probe to run after
    every major ingest.

    Plan: term counts are one explode + one partial-aggregated shuffle;
    the top-N cut is an ``orderBy().limit()`` (tree-reduced top-K, no
    global sort materialization). Rank is then derived WITHOUT a
    partitionless window: a count over the N×N self-join of the tiny
    top-N set (broadcast nested loop over ≤100 rows — declared, same
    class as the scalar-subquery shapes). The OLS closed form runs on
    exact ln values; only the final slope/intercept round.
    Output: one row (n_terms, slope, intercept)."""
    docs = load_balanced(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(ZIPF_TOP)
    )
    a = counts.select(F.col("tok").alias("a_tok"), F.col("cnt").alias("a_cnt"))
    b = counts.select(F.col("tok").alias("b_tok"), F.col("cnt").alias("b_cnt"))
    ahead = (F.col("b_cnt") > F.col("a_cnt")) | (
        (F.col("b_cnt") == F.col("a_cnt")) & (F.col("b_tok") < F.col("a_tok"))
    )
    ranked = (
        a.join(b, ahead, "left")
        .groupBy("a_tok", "a_cnt")
        .agg((F.count("b_tok") + F.lit(1)).alias("rank"))
        .select(
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("a_cnt").cast("double")).alias("y"),
        )
    )
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 4).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias("intercept"),
    )


ZIPF_SQL = rf"""
WITH counts AS (
  SELECT tok, COUNT(*) AS cnt
  FROM (SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS tok FROM documents)
  GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT {ZIPF_TOP}
),
ranked AS (
  SELECT ln(CAST((SELECT COUNT(*) FROM counts b
                  WHERE b.cnt > a.cnt OR (b.cnt = a.cnt AND b.tok < a.tok)) + 1
             AS DOUBLE)) AS x,
         ln(CAST(a.cnt AS DOUBLE)) AS y
  FROM counts a
),
agg AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM ranked
)
SELECT n AS n_terms,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4) AS intercept
FROM agg
"""


# ------------------------------------------------- PMI collocations

PMI_MIN_PAIR = 20
PMI_TOP = 50


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-word collocation mining by pointwise mutual information
    — the classic corpus-linguistics signal for multi-word expressions
    ("new york", "machine learning") that tokenizer / vocab builders
    feed on. PMI(w1,w2) = ln( P(w1,w2) / (P(w1)·P(w2)) ) with pair
    probabilities over adjacent positions and unigram probabilities
    over all tokens.

    Plan (100 TB shape): pairs come from ``arrays_zip(slice, slice)``
    + one explode — linear in corpus tokens, no self-join. Pair counts
    and unigram counts are each ONE partial-aggregated shuffle. The
    unigram-probability lookups are UNHINTED equi joins: the unigram
    table is corpus-vocabulary-sized (Heaps' law), so a forced
    broadcast would blow the driver at web scale — AQE broadcasts it
    while it fits and sort-merges (with skew split for Zipf-hot words)
    when it doesn't. Only the 1-row totals ride a broadcast hint.
    """
    docs = load_balanced(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), " ")
    toks = docs.where(F.length(F.trim(F.col("text"))) > 0).select(
        words.alias("w")
    )
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("w"), 1, F.size("w") - 1).alias("w1"),
                F.slice(F.col("w"), 2, F.size("w") - 1).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    pair_counts = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c_pair"))
    uni = (
        toks.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c_tok"))
    )
    totals = uni.agg(
        F.sum("c_tok").alias("n_tokens"),
    ).crossJoin(pair_counts.agg(F.sum("c_pair").alias("n_pairs")))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c_tok").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c_tok").alias("c2"))
    scored = (
        pair_counts.where(F.col("c_pair") >= PMI_MIN_PAIR)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.col("c_pair"),
            F.round(
                F.log(
                    (F.col("c_pair").cast("double") / F.col("n_pairs"))
                    / (
                        (F.col("c1").cast("double") / F.col("n_tokens"))
                        * (F.col("c2").cast("double") / F.col("n_tokens"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(PMI_TOP)


PMI_SQL = f"""
WITH toks AS (
  SELECT string_split(trim(text), ' ') AS w
  FROM documents WHERE length(trim(text)) > 0
),
pairs AS (
  SELECT w[g] AS w1, w[g + 1] AS w2
  FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(g)
),
pair_counts AS (SELECT w1, w2, COUNT(*) AS c_pair FROM pairs GROUP BY w1, w2),
uni AS (
  SELECT tok, COUNT(*) AS c_tok
  FROM (SELECT UNNEST(w) AS tok FROM toks) GROUP BY tok
),
totals AS (
  SELECT (SELECT SUM(c_tok) FROM uni) AS n_tokens,
         (SELECT SUM(c_pair) FROM pair_counts) AS n_pairs
)
SELECT p.w1, p.w2, p.c_pair,
       ROUND(LN((CAST(p.c_pair AS DOUBLE) / t.n_pairs)
                / ((CAST(u1.c_tok AS DOUBLE) / t.n_tokens)
                   * (CAST(u2.c_tok AS DOUBLE) / t.n_tokens))), 6) AS pmi
FROM pair_counts p
JOIN uni u1 ON p.w1 = u1.tok
JOIN uni u2 ON p.w2 = u2.tok
CROSS JOIN totals t
WHERE p.c_pair >= {PMI_MIN_PAIR}
ORDER BY pmi DESC, p.w1 ASC, p.w2 ASC
LIMIT {PMI_TOP}
"""


# ----------------------------------------------- vocabulary growth


def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary audit (the Heaps-law health probe): token
    mass, distinct types, hapax legomena (once-only types — templated
    or machine text collapses this), and type-token ratio. A corpus
    slice whose TTR or hapax share diverges from its siblings is the
    first thing a data-mixing run should look at.

    Plan: one explode, then (source, word) partial-agg shuffle, then a
    source-keyed rollup — the per-(source,word) intermediate is the
    vocab-size working set, not the corpus."""
    docs = load_balanced(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), " ")
    per_word = (
        docs.where(F.length(F.trim(F.col("text"))) > 0)
        .select("source", F.explode(words).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        per_word.groupBy("source")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("n_hapax"),
            F.round(
                F.count("*").cast("double") / F.sum("cnt").cast("double"), 6
            ).alias("ttr"),
        )
        .orderBy("source")
    )


VOCAB_GROWTH_SQL = """
WITH per_word AS (
  SELECT source, tok, COUNT(*) AS cnt
  FROM (
    SELECT source, UNNEST(string_split(trim(text), ' ')) AS tok
    FROM documents WHERE length(trim(text)) > 0
  )
  GROUP BY source, tok
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_types,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) AS ttr
FROM per_word GROUP BY source ORDER BY source
"""


# ----------------------------------------------- unigram entropy


def unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy (nats), aggregated per
    language — the repetition-collapse detector: boilerplate and
    keyword-stuffed docs sit far below their language's band. Entropy
    = -Σ p·ln p over the doc's own word distribution.

    Plan: explode → (doc, word) counts → doc rollup; the per-doc token
    total folds in as sum(cnt) inside the same rollup so no second
    pass over the corpus, then a lang-keyed final agg. Per-doc entropy
    rounds to 6 dp before the lang aggregate (same FP discipline as
    ``ngram_lm_score``)."""
    docs = load_balanced(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), " ")
    per_word = (
        docs.where(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", "lang", F.explode(words).alias("tok"))
        .groupBy("doc_id", "lang", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    n_tok = F.sum("cnt").cast("double")
    # -sum(c*ln c)/n + ln n  ==  -sum(c/n * ln(c/n)) with one division
    per_doc = per_word.groupBy("doc_id", "lang").agg(
        F.round(
            -F.sum(F.col("cnt").cast("double") * F.log(F.col("cnt").cast("double")))
            / n_tok
            + F.log(n_tok),
            6,
        ).alias("entropy")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("entropy"), 4).alias("avg_entropy"),
            F.round(F.min("entropy"), 4).alias("min_entropy"),
            F.round(F.max("entropy"), 4).alias("max_entropy"),
        )
        .orderBy("lang")
    )


UNIGRAM_ENTROPY_SQL = """
WITH per_word AS (
  SELECT doc_id, lang, tok, COUNT(*) AS cnt
  FROM (
    SELECT doc_id, lang, UNNEST(string_split(trim(text), ' ')) AS tok
    FROM documents WHERE length(trim(text)) > 0
  )
  GROUP BY doc_id, lang, tok
),
per_doc AS (
  SELECT doc_id, lang,
         ROUND(-SUM(CAST(cnt AS DOUBLE) * LN(CAST(cnt AS DOUBLE)))
                 / CAST(SUM(cnt) AS DOUBLE)
               + LN(CAST(SUM(cnt) AS DOUBLE)), 6) AS entropy
  FROM per_word GROUP BY doc_id, lang
)
SELECT lang, COUNT(*) AS n_docs,
       ROUND(AVG(entropy), 4) AS avg_entropy,
       ROUND(MIN(entropy), 4) AS min_entropy,
       ROUND(MAX(entropy), 4) AS max_entropy
FROM per_doc GROUP BY lang ORDER BY lang
"""


# ------------------------------------------------------ BM25 retrieval (r7)

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10
# fixed query set over the corpus vocabulary — constants so both engines
# and every run rank the identical workload
BM25_QUERIES = [
    (0, "merge join window"),
    (1, "scan filter column"),
    (2, "sort order key"),
    (3, "stream batch spark"),
    (4, "group agg value"),
]


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-K retrieval for a fixed query set — the lexical
    search baseline every RAG / retrieval-eval pipeline needs next to
    the embedding ANN stack (`ivf_ann_topk`): rank documents by
    Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with the
    Lucene idf form ln(1 + (N−df+0.5)/(df+0.5)).

    Plan (r14 rework, measured 25-35% faster than the r13 two-pass
    shape at sf0.1): the query vocabulary is a FIXED constant, so
    per-doc tf for each query token becomes a conditional-sum column in
    ONE ``groupBy(doc_id)`` over the token explode — a single corpus
    scan and a shuffle of one ~|q|-wide row per document (vs the old
    per-(doc, token) pair shuffle that carried the corpus token
    multiset). Everything downstream derives from that frame: dl is the
    unconditional count, document frequencies / n_docs / total_len fold
    into ONE 1-row aggregate (broadcast, scalar-subquery shape), and
    hits are a ``stack`` unpivot of the tf columns (no shuffle). The
    per-doc frame is lazily localCheckpoint-ed because it feeds two
    consumers (hits + the stats row) — doc-count-sized blocks, never
    the token stream. Scoring is pure codegen arithmetic; per-query
    top-K window partitioned by query. Ties break on (score@6dp desc,
    doc_id asc) identically in both engines; the reported score is the
    4dp presentation round, exactly as before.
    Output: (query_id, doc_id, score, rank)."""
    docs = load_balanced(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " "), " "),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok"),
    )
    qterms = sorted({t for _, q in BM25_QUERIES for t in q.split(" ")})
    per_doc = toks.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i, t in enumerate(qterms)
        ],
    ).localCheckpoint(eager=False)
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("total_len"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(qterms))
        ],
    )
    stack_args = ", ".join(f"'{t}', tf_{i}" for i, t in enumerate(qterms))
    hits = per_doc.selectExpr(
        "doc_id", "dl", f"stack({len(qterms)}, {stack_args}) AS (tok, tf)"
    ).filter(F.col("tf") > 0)
    qtok = spark.createDataFrame(
        [(qid, t) for qid, q in BM25_QUERIES for t in q.split(" ")],
        "query_id int, tok string",
    )
    # per-token df lookup against the 1-row stats frame: a |q|-branch
    # CASE chain, fully codegen — no df table, no join
    df_col = None
    for i, t in enumerate(qterms):
        c = F.when(F.col("tok") == t, F.col(f"df_{i}"))
        df_col = c if df_col is None else F.coalesce(df_col, c)
    scored = (
        hits.join(F.broadcast(qtok), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn("df", df_col)
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    term = idf * (
        F.col("tf") * F.lit(BM25_K1 + 1.0)
        / (F.col("tf") + F.lit(BM25_K1)
           * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl))
    )
    per_query_doc = scored.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(term), 6).alias("score6")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score6"), F.asc("doc_id")
    )
    return (
        per_query_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select(
            "query_id", "doc_id",
            F.round(F.col("score6"), 4).alias("score"), "rank",
        )
        .orderBy("query_id", "rank")
    )


_BM25_QUERY_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, q in BM25_QUERIES for t in q.split(" ")
)

BM25_TOPK_SQL = f"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(string_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')) AS tok
    FROM documents
  ) WHERE length(tok) > 0
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
totals AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl),
qtok(query_id, tok) AS (VALUES {_BM25_QUERY_VALUES}),
hits AS (
  SELECT tf.* FROM tf WHERE tok IN (SELECT DISTINCT tok FROM qtok)
),
df AS (SELECT tok, COUNT(*) AS df FROM hits GROUP BY tok),
scored AS (
  SELECT q.query_id, h.doc_id,
         LN(1.0 + (t.n_docs - d.df + 0.5) / (d.df + 0.5))
         * (h.tf * {BM25_K1 + 1.0}
            / (h.tf + {BM25_K1}
               * ({1.0 - BM25_B} + {BM25_B} * l.dl
                  / (CAST(t.total_len AS DOUBLE) / t.n_docs)))) AS term
  FROM hits h
  JOIN qtok q USING (tok)
  JOIN df d USING (tok)
  JOIN dl l USING (doc_id)
  CROSS JOIN totals t
),
per_doc AS (
  SELECT query_id, doc_id, ROUND(SUM(term), 6) AS score6
  FROM scored GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, ROUND(score6, 4) AS score, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score6 DESC, doc_id ASC) AS rank
  FROM per_doc
) WHERE rank <= {BM25_TOP_K}
ORDER BY query_id, rank
"""


def token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility audit per language: bytes per whitespace
    token and BPE-ish tokens per whitespace token — the numbers that
    turn a byte-sized crawl budget into a training-token budget, and
    that flag languages whose tokenizer fertility will blow up compute
    (the multilingual-tokenizer planning table). All integer sums; two
    exact divisions at the end. Output: (lang, n_docs, ws_tokens,
    bpe_tokens, bytes_per_ws_tok, bpe_per_ws_tok)."""
    docs = load_balanced(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        _token_count().alias("ws"),
        F.regexp_count(F.col("text"), F.lit(BPE_PATTERN)).alias("bpe"),
        F.octet_length("text").alias("nbytes"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("ws").cast("long").alias("ws_tokens"),
        F.sum("bpe").cast("long").alias("bpe_tokens"),
        F.sum("nbytes").alias("total_bytes"),
    )
    return agg.select(
        "lang", "n_docs", "ws_tokens", "bpe_tokens",
        F.round(
            F.col("total_bytes").cast("double") / F.col("ws_tokens"), 4
        ).alias("bytes_per_ws_tok"),
        F.round(
            F.col("bpe_tokens").cast("double") / F.col("ws_tokens"), 4
        ).alias("bpe_per_ws_tok"),
    ).orderBy("lang")


TOKEN_FERTILITY_SQL = f"""
WITH per_doc AS (
  SELECT lang,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split(trim(text), ' ')) END AS ws,
         len(regexp_extract_all(text, '{BPE_PATTERN}')) AS bpe,
         strlen(text) AS nbytes
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS ws_tokens,
       CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
       ROUND(CAST(SUM(nbytes) AS DOUBLE) / SUM(ws), 4) AS bytes_per_ws_tok,
       ROUND(CAST(SUM(bpe) AS DOUBLE) / SUM(ws), 4) AS bpe_per_ws_tok
FROM per_doc GROUP BY lang ORDER BY lang
"""
