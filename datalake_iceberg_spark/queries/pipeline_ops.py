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

    Shape: explode → tf agg on (doc,term) → df agg on term → per-doc
    rank window. The tf↔df join is deliberately UNHINTED: df is
    corpus-vocabulary-sized (Heaps' law — billions of distinct tokens
    on a web-scale corpus), so a forced broadcast would be a
    driver-memory failure at 100 TB. AQE broadcasts it while small and
    falls back to a sort-merge join (both sides already shuffled on
    ``term``) when the vocabulary outgrows the threshold."""
    docs = load_balanced(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    terms = docs.select("doc_id", F.explode(words).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("df"), F.asc("term"))
    return (
        tf.join(df_, "term")
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


# ------------------------------------------- time-decayed engagement

DECAY_HALF_LIFE_US = 7 * 86_400 * 1_000_000  # 7-day half-life, in µs


def decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially time-decayed engagement score — the
    freshness-weighted feature a ranking / sampling pipeline derives
    from an event stream: each event contributes ``value · 0.5^(age /
    half_life)`` with age measured from the corpus max timestamp.

    Plan: the reference timestamp is a 1-row aggregate broadcast onto
    the scan (no window, no second shuffle); decay is a pure projection
    in codegen; one user-keyed partial-agg shuffle ends the plan. Ages
    are exact integer microseconds so both engines exponentiate the
    same double."""
    ev = load_events(spark, sf_dir)
    ref = ev.agg(F.max(F.unix_micros("ts")).alias("ref_us"))
    decay = F.pow(
        F.lit(0.5),
        (F.col("ref_us") - F.unix_micros("ts")).cast("double")
        / F.lit(float(DECAY_HALF_LIFE_US)),
    )
    return (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value") * decay), 4).alias("decayed_value"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


DECAYED_ENGAGEMENT_SQL = f"""
WITH {EVENTS_CTE},
ref AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events_us)
SELECT user_id,
       COUNT(*) AS n_events,
       ROUND(SUM(value * POWER(0.5,
             CAST(ref.ref_us - epoch_us(ts) AS DOUBLE) / {float(DECAY_HALF_LIFE_US)})), 4)
         AS decayed_value,
       MAX(ts) AS last_ts
FROM events_us CROSS JOIN ref
GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------- PII-pattern scan

PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_IPV4 = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
PII_DIGIT_RUN = "[0-9]+"


def props_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / sensitive-pattern scan over the raw ``props`` payload —
    the pre-release gate every training-data export runs: email, IPv4
    and digit-run detectors per event_type, plus the digit mass that a
    redaction pass would scrub. On this corpus the email/IPv4 counts
    are structurally zero (synthetic payloads) — the point is the scan
    executes the same compiled-regex projection a real corpus needs,
    entirely in codegen, one partial-agg shuffle, no Python.

    A real redaction (``regexp_replace(props, pat, '<pii>')``) is the
    same projection shape; see ``term_scrub_stats`` for the scrub-mass
    variant over document text."""
    ev = load_events(spark, sf_dir)
    digit_runs = F.regexp_extract_all("props", F.lit(PII_DIGIT_RUN), 0)
    digit_sum = F.aggregate(
        F.transform(digit_runs, lambda x: x.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        ev.select(
            "event_type",
            F.regexp_count("props", F.lit(PII_EMAIL)).alias("n_email"),
            F.regexp_count("props", F.lit(PII_IPV4)).alias("n_ipv4"),
            F.size(digit_runs).alias("n_digit_runs"),
            digit_sum.alias("digit_mass"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("n_email").alias("email_hits"),
            F.sum("n_ipv4").alias("ipv4_hits"),
            F.sum("n_digit_runs").alias("digit_runs"),
            F.sum("digit_mass").alias("digit_mass"),
            F.sum(F.when(F.col("n_digit_runs") > 0, 1).otherwise(0)).alias(
                "events_with_digits"
            ),
        )
        .orderBy("event_type")
    )


PROPS_PII_SQL = f"""
WITH {EVENTS_CTE},
scanned AS (
  SELECT event_type,
         len(regexp_extract_all(props, '{PII_EMAIL}')) AS n_email,
         len(regexp_extract_all(props, '{PII_IPV4}')) AS n_ipv4,
         regexp_extract_all(props, '{PII_DIGIT_RUN}') AS runs
  FROM events_us
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(n_email) AS BIGINT) AS email_hits,
       CAST(SUM(n_ipv4) AS BIGINT) AS ipv4_hits,
       CAST(SUM(len(runs)) AS BIGINT) AS digit_runs,
       CAST(SUM(list_sum(list_transform(runs, x -> CAST(x AS BIGINT)))) AS BIGINT)
         AS digit_mass,
       CAST(SUM(CASE WHEN len(runs) > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS events_with_digits
FROM scanned GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------- salted hot-key rollup


def salted_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key engagement rollup through the salted two-phase
    aggregation (:func:`datalake_iceberg_spark.functions.skew.salted_agg`):
    the events key domain (15 users) is far below any
    real cluster's parallelism, so a plain groupBy pins each hot user
    to ONE reducer — exactly the shape AQE cannot split. Phase 1
    spreads each user over 16 salt reducers, phase 2 merges 16 partial
    rows per user.

    Values sum as exact integer cents (per-row ``floor(v·100+0.5)``),
    so the two-phase regrouping cannot perturb an IEEE sum order —
    result is bit-identical to the plain aggregate the oracle runs."""
    from datalake_iceberg_spark.functions.skew import salted_agg

    ev = load_events(spark, sf_dir).withColumn(
        "value_cents",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
    )
    out = salted_agg(
        ev,
        ["user_id"],
        {
            "n_events": ("event_id", "count"),
            "value_cents": (F.col("value_cents"), "sum"),
            "first_event": ("ts", "min"),
            "last_event": ("ts", "max"),
        },
        n_salt=16,
    )
    return out.orderBy("user_id")


SALTED_USER_STATS_SQL = f"""
WITH {EVENTS_CTE}
SELECT user_id,
       COUNT(event_id) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
       MIN(ts) AS first_event,
       MAX(ts) AS last_event
FROM events_us GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------- unpivot / melt


def unpivot_event_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long UNPIVOT (Spark ``stack``): per event_type aggregate
    metrics melt into (event_type, metric, value) rows — the shape a
    metrics store or plotting layer ingests. The melt is a projection
    (stack is a generator, no shuffle); the only exchange is the
    upstream aggregate's."""
    ev = load_events(spark, sf_dir)
    wide = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.count_distinct("user_id").cast("double").alias("n_users"),
    )
    return (
        wide.select(
            "event_type",
            F.expr(
                "stack(4, 'n_events', n_events, 'sum_value', sum_value, "
                "'max_value', max_value, 'n_users', n_users) AS (metric, value)"
            ),
        )
        .orderBy("event_type", "metric")
    )


UNPIVOT_SQL = f"""
WITH {EVENTS_CTE},
wide AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n_events,
         ROUND(SUM(value), 4) AS sum_value,
         ROUND(MAX(value), 4) AS max_value,
         CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users
  FROM events_us GROUP BY event_type
)
SELECT event_type, metric, value
FROM wide
UNPIVOT (value FOR metric IN (n_events, sum_value, max_value, n_users))
ORDER BY event_type, metric
"""


# --------------------------------------------- count-min heavy hitters

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOP = 10


def _cms_cell(d: int, col):
    """Depth-d cell index: md5 hex slice → int mod width (the portable
    hash family both engines share, same trick as the minhash
    signatures)."""
    h = F.md5(F.concat_ws("|", F.lit(str(d)), col))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % CMS_WIDTH).cast("int")


def _cms_cell_sql(d: int, expr: str) -> str:
    return (
        f"CAST(CAST(('0x' || substr(md5('{d}' || '|' || {expr}), 1, 8)) AS BIGINT)"
        f" % {CMS_WIDTH} AS INT)"
    )


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection through a COUNT-MIN SKETCH built as a
    relational plan (self-checking, like the HLL/quantile entries):
    every token occurrence hashes into ``CMS_DEPTH`` rows of a
    ``CMS_WIDTH``-cell grid; a token's estimate is the MIN over its
    depth cells. The sketch is a fixed-size (depth×width) table no
    matter the corpus — at 100 TB the grid build is one explode + one
    partial-agg shuffle collapsing to ≤1024 rows, and the candidate
    probe is a broadcast join against that grid. Output: the true
    top-``CMS_TOP`` corpus tokens with exact count, CMS estimate, and
    the CMS guarantees as booleans (estimate never undercounts;
    overcount bounded by grid mass / width per the standard
    expectation argument, slack 4x) — both engines must agree on every
    bit, which they do because the hash family is shared md5.
    """
    docs = load_balanced(spark, sf_dir, "documents")
    toks = docs.where(F.length(F.trim(F.col("text"))) > 0).select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    # ONE corpus explode (r15 optimization): aggregate occurrences to
    # the vocab-sized (tok, exact_count) first and materialize it once
    # (lazy localCheckpoint — it feeds the grid, the corpus total and
    # the top-K probe, which would otherwise each re-scan and re-explode
    # the corpus: 3 FileScans → 1). The grid then derives from the
    # TOKEN counts — a cell's count is the sum of its tokens'
    # occurrence counts, identical integers — so the 4 md5 cell hashes
    # run per DISTINCT token, not per occurrence (guide §2.3: aggregate
    # before you shuffle; the vocab is Heaps-law-smaller than the
    # corpus).
    exact = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("exact_count"))
        .localCheckpoint(eager=False)
    )
    # grid: depth d, cell c -> count (<= DEPTH*WIDTH rows after the agg)
    cells = exact.select(
        "exact_count",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"), _cms_cell(d, F.col("tok")).alias("cell")
                )
                for d in range(CMS_DEPTH)
            ])
        ).alias("p"),
    ).groupBy(F.col("p.d").alias("d"), F.col("p.cell").alias("cell")).agg(
        F.sum("exact_count").alias("cnt")
    )
    total = exact.agg(F.sum("exact_count").alias("n_total"))
    top = (
        exact.orderBy(F.desc("exact_count"), F.asc("tok"))
        .limit(CMS_TOP)
        .select(
            "tok",
            "exact_count",
            *[_cms_cell(d, F.col("tok")).alias(f"c{d}") for d in range(CMS_DEPTH)],
        )
    )
    probed = top
    for d in range(CMS_DEPTH):
        g = cells.where(F.col("d") == d).select(
            F.col("cell").alias(f"c{d}"), F.col("cnt").alias(f"est{d}")
        )
        probed = probed.join(F.broadcast(g), f"c{d}")
    est = F.least(*[F.col(f"est{d}") for d in range(CMS_DEPTH)])
    return (
        probed.crossJoin(F.broadcast(total))
        .select(
            "tok",
            "exact_count",
            est.alias("cms_estimate"),
            (est >= F.col("exact_count")).alias("never_undercounts"),
            (
                est - F.col("exact_count")
                <= F.col("n_total") * F.lit(4.0) / F.lit(CMS_WIDTH)
            ).alias("within_bound"),
        )
        .orderBy(F.desc("exact_count"), F.asc("tok"))
    )


_CMS_CELL_UNIONS = "\n  UNION ALL\n  ".join(
    f"SELECT {d} AS d, {_cms_cell_sql(d, 'tok')} AS cell FROM toks"
    for d in range(CMS_DEPTH)
)
_CMS_PROBE_COLS = ", ".join(
    f"{_cms_cell_sql(d, 'tok')} AS c{d}" for d in range(CMS_DEPTH)
)
_CMS_JOINS = "\n".join(
    f"JOIN grid g{d} ON g{d}.d = {d} AND g{d}.cell = top.c{d}"
    for d in range(CMS_DEPTH)
)
_CMS_LEAST = "LEAST(" + ", ".join(f"g{d}.cnt" for d in range(CMS_DEPTH)) + ")"

CMS_SQL = f"""
WITH toks AS (
  SELECT UNNEST(string_split(trim(text), ' ')) AS tok
  FROM documents WHERE length(trim(text)) > 0
),
grid AS (
  SELECT d, cell, COUNT(*) AS cnt FROM (
  {_CMS_CELL_UNIONS}
  ) GROUP BY d, cell
),
exact AS (SELECT tok, COUNT(*) AS exact_count FROM toks GROUP BY tok),
total AS (SELECT SUM(exact_count) AS n_total FROM exact),
top AS (
  SELECT tok, exact_count, {_CMS_PROBE_COLS}
  FROM exact ORDER BY exact_count DESC, tok ASC LIMIT {CMS_TOP}
)
SELECT top.tok, top.exact_count,
       {_CMS_LEAST} AS cms_estimate,
       {_CMS_LEAST} >= top.exact_count AS never_undercounts,
       {_CMS_LEAST} - top.exact_count <= total.n_total * 4.0 / {CMS_WIDTH}
         AS within_bound
FROM top
{_CMS_JOINS}
CROSS JOIN total
ORDER BY top.exact_count DESC, top.tok ASC
"""


# ------------------------------------------------ MAD outlier audit

MAD_K = 3.0  # flag days beyond K robust deviations


def mad_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly audit over the event stream: per event_type,
    flag DAYS whose value mass deviates from the median by more than
    ``MAD_K`` × MAD (median absolute deviation) — the outlier detector
    that, unlike z-scores, one bad day cannot drag (median and MAD
    have 50% breakdown; `event_spike_hours` is the mean-based sibling).

    Exactness: daily masses are integer cents, and medians of integers
    interpolate only at .5 — every intermediate is exactly
    representable, so the flag booleans cannot straddle an FP boundary
    between engines. Plan: one day-keyed partial-agg shuffle, a
    per-type median (tiny groups: days-per-type), broadcast back."""
    ev = load_events(spark, sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .alias("cents")
        )
    )
    med = daily.groupBy("event_type").agg(
        F.median(F.col("cents").cast("double")).alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    flagged = dev.join(F.broadcast(mad), "event_type").withColumn(
        "is_outlier", F.col("adev") > F.lit(MAD_K) * F.col("mad")
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.min("med"), 1).alias("median_cents"),
            F.round(F.min("mad"), 1).alias("mad_cents"),
            F.sum(F.when(F.col("is_outlier"), 1).otherwise(0)).alias("n_outlier_days"),
        )
        .orderBy("event_type")
    )


MAD_OUTLIER_SQL = f"""
WITH {EVENTS_CTE},
daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cents
  FROM events_us GROUP BY 1, 2
),
med AS (
  SELECT event_type, MEDIAN(CAST(cents AS DOUBLE)) AS med
  FROM daily GROUP BY event_type
),
dev AS (
  SELECT d.event_type, d.cents, m.med, ABS(d.cents - m.med) AS adev
  FROM daily d JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, MEDIAN(adev) AS mad FROM dev GROUP BY event_type
)
SELECT dev.event_type,
       COUNT(*) AS n_days,
       ROUND(MIN(dev.med), 1) AS median_cents,
       ROUND(MIN(mad.mad), 1) AS mad_cents,
       CAST(SUM(CASE WHEN dev.adev > {MAD_K} * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outlier_days
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type ORDER BY dev.event_type
"""
