"""Persisted MinHash signature index for incremental corpus dedup.

The daily-ingest dedup flow a training-data pipeline runs: keep the
corpus's MinHash state in lake tables; for each incoming batch, compute
ONLY the batch's signatures, LSH-probe them against the index
(new-vs-index — never corpus-vs-corpus), drop batch docs that collide,
and merge the survivors back. Cost per day scales with the batch, not
the corpus:

- **batch signatures**: one scan + one shuffle of the batch;
- **probe**: the index keeps a BAND table (band_hash, doc_id) bucketed
  by ``band_hash``; the probe collects only the batch's DISTINCT
  bucket ids (≤ n_buckets, never the band hashes themselves) and
  reads ONLY those buckets — corpus bytes outside colliding buckets
  are never touched, and no corpus hash is ever recomputed. Past the
  IN-list cap the bucket-pruned read semi-joins the probe hashes
  distributedly (AQE picks the strategy), so a 10 M-doc batch never
  lands on the driver;
- **index update**: survivors' signatures MERGE into the signature
  table (keyed by doc_id); their band rows append after an anti-join
  against the probe's hits, so a re-run of the same batch adds nothing
  — the index converges (same idempotence guarantee as the CDC apply
  path; reference anchor: the MERGE idempotence pattern at
  ``src/utils/cdc_pipeline.py:221-237``).

In-batch near-duplicates are collapsed optionally
(``collapse_batch=True``): a batch doc colliding with a smaller-id
batch doc is dropped greedily (the standard keep-first survivor rule;
transitive chains resolve to the chain's min because collisions are
checked against ALL smaller ids, not only survivors — a deliberate,
slightly-aggressive approximation). Default off: the corpus-level
``dup_clusters`` gives exact components periodically, and the
single-probe daily op stays one-pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_iceberg_spark.queries.dedup import banded_for, signatures_for
from datalake_iceberg_spark.tables import LakeCatalog, LakeTable


class SignatureIndex:
    """Two lake tables: ``<name>`` holds signatures keyed by doc_id
    (the merge target), ``<name>_bands`` holds (band_hash, doc_id)
    keyed/bucketed by band_hash (the probe target)."""

    def __init__(self, sig_table: LakeTable, band_table: LakeTable):
        self.table = sig_table
        self.bands = band_table

    @classmethod
    def create(
        cls,
        catalog: LakeCatalog,
        name: str,
        corpus_docs: DataFrame,
        n_buckets: int = 16,
    ) -> "SignatureIndex":
        """Bootstrap from an initial corpus (one-time cost ∝ corpus;
        every later batch pays only for itself)."""
        sigs = signatures_for(corpus_docs)
        sig_table = catalog.create_or_replace(
            name, sigs, key=["doc_id"], n_buckets=n_buckets
        )
        # band rows re-derive from the committed signatures, not the
        # in-flight plan, so both tables describe the same snapshot
        band_table = catalog.create_or_replace(
            f"{name}_bands",
            banded_for(sig_table.read()),
            key=["band_hash"],
            n_buckets=n_buckets,
        )
        return cls(sig_table, band_table)

    @classmethod
    def open(cls, catalog: LakeCatalog, name: str) -> "SignatureIndex":
        return cls(catalog.table(name), catalog.table(f"{name}_bands"))

    def _hits(self, bands_new: DataFrame) -> DataFrame:
        """Index band rows colliding with the batch: bucket-pruned read
        of ``_bands`` — only buckets some batch band hashes into."""
        return self.bands.lookup(bands_new.select("band_hash"))

    def probe(self, batch_docs: DataFrame) -> DataFrame:
        """LSH candidates for a batch against the index: one row per
        (batch_doc, index_doc) band collision. Does not mutate."""
        bands_new = banded_for(signatures_for(batch_docs))
        return (
            bands_new.alias("n")
            .join(
                self._hits(bands_new).alias("i"),
                F.col("n.band_hash") == F.col("i.band_hash"),
            )
            .select(
                F.col("n.doc_id").alias("batch_doc"),
                F.col("i.doc_id").alias("index_doc"),
            )
            .distinct()
        )

    def dedup_batch(
        self,
        batch_docs: DataFrame,
        count_index: bool = False,
        collapse_batch: bool = False,
    ) -> dict[str, int]:
        """Run the incremental flow: probe, drop colliding batch docs,
        merge survivors' signatures + band rows into the index.
        Idempotent: self-collisions (a doc matching its own indexed
        bands on a re-run) are not dups, and band rows already present
        are not re-appended.

        ``collapse_batch=True`` also drops batch docs whose bands
        collide with a SMALLER-id batch doc (greedy keep-first in-batch
        dedup — see module docstring for the approximation's shape).

        ``count_index=True`` adds ``index_docs`` to the result — an
        O(corpus) scan, off by default so the per-batch cost contract
        (∝ batch size) holds."""
        sigs = signatures_for(batch_docs).localCheckpoint()
        bands_new = banded_for(sigs).localCheckpoint()
        # hits are reused by three downstream plans — keep them local
        hits = self._hits(bands_new).localCheckpoint()
        dup_ids = (
            bands_new.alias("n")
            .join(
                hits.alias("i"),
                (F.col("n.band_hash") == F.col("i.band_hash"))
                & (F.col("n.doc_id") != F.col("i.doc_id")),
            )
            .select(F.col("n.doc_id").alias("doc_id"))
            .distinct()
        )
        if collapse_batch:
            in_batch = (
                bands_new.alias("a")
                .join(
                    bands_new.alias("b"),
                    (F.col("a.band_hash") == F.col("b.band_hash"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .select(F.col("b.doc_id").alias("doc_id"))
                .distinct()
            )
            dup_ids = dup_ids.unionByName(in_batch).distinct()
        survivors = sigs.join(dup_ids, "doc_id", "left_anti")
        surv_bands = bands_new.join(dup_ids, "doc_id", "left_anti")
        new_band_rows = surv_bands.join(
            hits, on=["band_hash", "doc_id"], how="left_anti"
        )
        n_batch = batch_docs.count()
        n_dup = dup_ids.count()
        self.table.merge(survivors)
        if not new_band_rows.isEmpty():
            self.bands.append(new_band_rows)
        out = {
            "batch_docs": n_batch,
            "near_dups_dropped": n_dup,
            "admitted": n_batch - n_dup,
        }
        if count_index:
            out["index_docs"] = self.table.read().count()
        return out
