"""Training-data pipeline operators beyond the text/dedup/similarity
suites: JSON property extraction, deterministic hash-based train/test
splits, corpus n-gram statistics, regex scanning, and TF-IDF term
ranking. All JVM-side (no Python UDFs) and DuckDB-oracled.

The reference maps JSON columns to plain strings and uses no JSON /
regex / array functions (SURVEY §2.9 "Not present") — this module is
the beyond-reference surface exercising exactly those families.

Scale notes (100 TB design point):
- `props_json_stats`: get_json_object evaluates in the scan projection,
  then one partial-agg shuffle on event_type — same shape as A1.
- `hash_split_stats`: the split is a pure projection (md5 of the key),
  so it composes with any downstream op without a shuffle; buckets are
  uniform by construction, so downstream partitioning never skews.
- `bigram_counts` / `tfidf_top_terms`: explode fans out ~words-per-doc
  rows but partial aggregation collapses them map-side before the
  (term)- or (doc,term)-keyed shuffle. At real corpus scale the df
  (document-frequency) side is Zipf-skewed — the tf→df join here keeps
  df as the broadcast side so hot terms never concentrate a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_iceberg_spark.queries import load, load_balanced
from datalake_iceberg_spark.queries.analytics import EVENTS_CTE, load_events

TRAIN_PCT = 90
SCAN_PATTERN = r"\b(key|hash|join)\b"
TOP_BIGRAMS = 50
TOP_TERMS = 3


def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the events ``props`` column: per event_type
    stats of the numeric ``$.k`` property. get_json_object stays in the
    scan's generated projection — no shuffle until the final agg."""
    ev = load_events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_events"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


PROPS_JSON_SQL = f"""
WITH {EVENTS_CTE}
SELECT event_type,
       COUNT(k) AS n_events, CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k, MAX(k) AS max_k
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events_us)
GROUP BY event_type
ORDER BY event_type
"""


def hash_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/test split: bucket = first 8 md5 hex
    chars of the key, mod 100. The assignment is reproducible across
    engines, runs, and scale factors (no RNG state), and uniform, so
    neither split skews downstream partitioning."""
    docs = load_balanced(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    split = F.when(bucket < TRAIN_PCT, "train").otherwise("test")
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang", "split")
    )


HASH_SPLIT_SQL = f"""
SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
            < {TRAIN_PCT} THEN 'train' ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
ORDER BY lang, split
"""


def bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency (the n-gram LM / contamination-scan
    primitive): split → adjacent-pair fan-out → count, top 50. The
    pair construction is a JVM higher-order transform; partial agg
    collapses duplicates map-side before the single term shuffle."""
    docs = load_balanced(spark, sf_dir, "documents")
    # adjacent pairs as zip_with over two shifted slices — one linear
    # pass per doc. The index-based form (transform over sequence +
    # element_at(i)) is 6-10x slower: element_at re-walks the array per
    # index, making bigram construction quadratic per document.
    words = docs.select(F.split(F.trim(F.col("text")), r"\s+").alias("w")).select(
        "w", F.size("w").alias("n")
    )
    bigrams = F.zip_with(
        F.slice("w", 1, F.col("n") - 1),
        F.slice("w", 2, F.col("n") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        words.where(F.col("n") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(TOP_BIGRAMS)
    )


BIGRAM_SQL = f"""
WITH words AS (
  SELECT string_split_regex(trim(text), '\\s+') AS w FROM documents
),
bigrams AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM words WHERE len(w) >= 2
)
SELECT bigram, COUNT(*) AS n
FROM bigrams
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT {TOP_BIGRAMS}
"""


def regex_term_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scan per source (the PII / contamination-pattern shape):
    total matches of a pattern and documents containing it. The regex
    runs inside the scan projection over each text once."""
    docs = load_balanced(spark, sf_dir, "documents")
    n_matches = F.size(F.regexp_extract_all(F.col("text"), F.lit(SCAN_PATTERN), 0))
    return (
        docs.select("source", n_matches.alias("n_matches"))
        .groupBy("source")
        .agg(
            F.sum("n_matches").alias("total_matches"),
            F.sum(F.when(F.col("n_matches") > 0, 1).otherwise(0)).alias("docs_matching"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("source")
    )


REGEX_SCAN_SQL = f"""
SELECT source,
       CAST(SUM(n_matches) AS BIGINT) AS total_matches,
       CAST(SUM(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_matching,
       COUNT(*) AS n_docs
FROM (SELECT source, len(regexp_extract_all(text, '{SCAN_PATTERN}')) AS n_matches
      FROM documents)
GROUP BY source
ORDER BY source
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most characteristic terms per document, TF-IDF style.
    Ranking is (tf DESC, df ASC, term ASC) — pure integers, so the
    order is bit-identical across engines with no float-log hazard;
    tf and df are exactly the TF-IDF inputs (rarer term wins at equal
    tf, which is what idf weighting does monotonically per-doc).

    Shape: explode → tf agg on (doc,term) → df agg on term (broadcast
    back: vocab ≪ corpus) → per-doc rank window."""
    docs = load_balanced(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    terms = docs.select("doc_id", F.explode(words).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("df"), F.asc("term"))
    return (
        tf.join(F.broadcast(df_), "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_TERMS)
        .select("doc_id", "term", "tf", "df", "rank")
        .orderBy("doc_id", "rank")
    )


TFIDF_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
SELECT doc_id, term, tf, df, rank
FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rank
  FROM tf JOIN df ON tf.term = df.term
)
WHERE rank <= {TOP_TERMS}
ORDER BY doc_id, rank
"""


# -------------------------------------------------------- spike detection

SPIKE_Z = 3  # flag hours whose count sits more than 3 sigma off the mean


def event_spike_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type traffic-spike audit: how many HOURS deviate more
    than ``SPIKE_Z`` standard deviations from that type's mean hourly
    volume — the ops-monitoring primitive behind ingest anomaly alerts.

    Exactness trick: the z-test runs entirely in INTEGER arithmetic.
    With n hours, total = Σc and sum_sq = Σc², the condition
    |z| > Z  ⟺  (c·n − total)² > Z² · (n·sum_sq − total²)
    — both sides are exact BIGINT products, so the Spark plan and the
    DuckDB oracle evaluate the identical predicate with no
    floating-point variance ordering to disagree about.

    Plan: one scan → (type, hour) count (map-side combine) → per-type
    moment aggregate (a FEW rows) broadcast back against the hourly
    counts → exact predicate → per-type result. Two shuffles total, the
    second over #types·#hours rows, never raw events.
    Output: (event_type, n_hours, total_events, spike_hours)."""
    from datalake_iceberg_spark.queries.analytics import load_events

    ev = load_events(spark, sf_dir)
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("c"))
    )
    moments = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
    )
    joined = hourly.join(F.broadcast(moments), "event_type")
    dev = F.col("c") * F.col("n") - F.col("total")
    var_n3 = F.col("n") * F.col("sum_sq") - F.col("total") * F.col("total")
    spike = (dev * dev) > (SPIKE_Z * SPIKE_Z) * var_n3
    return (
        joined.groupBy("event_type")
        .agg(
            F.first("n").alias("n_hours"),
            F.first("total").alias("total_events"),
            F.sum(spike.cast("long")).alias("spike_hours"),
        )
        .orderBy("event_type")
    )


EVENT_SPIKE_SQL = f"""
WITH {EVENTS_CTE},
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
  FROM events_us GROUP BY event_type, h
),
m AS (
  SELECT event_type, COUNT(*) AS n, SUM(c) AS total, SUM(c * c) AS sum_sq
  FROM hourly GROUP BY event_type
)
SELECT h.event_type,
       CAST(MIN(m.n) AS BIGINT) AS n_hours,
       CAST(MIN(m.total) AS BIGINT) AS total_events,
       CAST(SUM(CASE WHEN (h.c * m.n - m.total) * (h.c * m.n - m.total)
                      > {SPIKE_Z * SPIKE_Z} * (m.n * m.sum_sq - m.total * m.total)
                THEN 1 ELSE 0 END) AS BIGINT) AS spike_hours
FROM hourly h JOIN m USING (event_type)
GROUP BY h.event_type ORDER BY h.event_type
"""
