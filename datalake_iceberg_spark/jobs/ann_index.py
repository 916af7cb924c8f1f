"""IVF index operations as a job CLI — beyond-reference serving path
(the vector-corpus analogue of the maintenance job): build / add /
search / drift over the persisted :class:`ops.incremental_ann.IvfIndex`.

Subcommands::

    ann_index build  --name db.idx --input-parquet vecs.parquet \
        [--n-cells 256] [--n-buckets 64]
    ann_index add    --name db.idx --input-parquet batch.parquet
    ann_index search --name db.idx --input-parquet queries.parquet \
        [--nprobe 2] [--top-k 5] [--output out_dir]
    ann_index drift  --name db.idx

``--pq`` on build/add/search routes to :class:`IvfPqIndex` — the same
index with product-quantized postings and ADC scoring (drift stays an
:class:`IvfIndex` report; a PQ index audits fidelity via the graded
``pq_quant_error`` entry instead).

Input parquet needs (vec_id, embedding) — search renames vec_id to
query_id. ``search --output`` writes results as parquet (executor-side,
like every query sink); without it the top rows print for ad-hoc use.
"""

from __future__ import annotations

from datalake_iceberg_spark.jobs.common import (
    base_parser,
    get_catalog,
    get_session,
    load_settings,
)
from datalake_iceberg_spark.ops.incremental_ann import IvfIndex, IvfPqIndex


def build_parser():
    p = base_parser("persisted IVF index build / add / search / drift")
    p.add_argument("command", choices=["build", "add", "search", "drift"])
    p.add_argument("--name", required=True, help="index table name")
    p.add_argument("--input-parquet", default=None,
                   help="(vec_id, embedding) parquet for build/add/search")
    p.add_argument("--n-cells", type=int, default=16)
    p.add_argument("--n-buckets", type=int, default=16)
    p.add_argument("--lloyd-rounds", type=int, default=2)
    p.add_argument("--nprobe", type=int, default=2)
    p.add_argument("--top-k", type=int, default=3)
    p.add_argument("--output", default=None, help="search-result parquet dir")
    p.add_argument("--pq", action="store_true",
                   help="product-quantized postings + ADC search")
    return p


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    settings = load_settings(args)
    spark = get_session(f"ann_index:{args.command}", settings, spark)
    catalog = get_catalog(spark, settings)
    if args.command in ("build", "add", "search") and not args.input_parquet:
        raise SystemExit(f"{args.command} requires --input-parquet")
    cls = IvfPqIndex if args.pq else IvfIndex
    if args.command == "build":
        vecs = spark.read.parquet(args.input_parquet).select("vec_id", "embedding")
        idx = cls.create(
            catalog, args.name, vecs,
            n_cells=args.n_cells, lloyd_rounds=args.lloyd_rounds,
            n_buckets=args.n_buckets,
        )
        print(f"built {args.name}: cells={idx.centroids.read().count()} "
              f"postings={idx.postings.read().count()}")
        return 0
    if args.command == "drift" and args.pq:
        raise SystemExit("drift is an IvfIndex report; PQ fidelity is "
                         "audited by the pq_quant_error entry")
    idx = cls.open(catalog, args.name)
    if args.command == "add":
        batch = spark.read.parquet(args.input_parquet).select("vec_id", "embedding")
        rep = idx.add(batch)
        print(f"add {args.name}: {rep}")
        return 0
    if args.command == "search":
        from pyspark.sql import functions as F

        q = spark.read.parquet(args.input_parquet).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        res = idx.search(q, nprobe=args.nprobe, top_k=args.top_k)
        if args.output:
            res.write.mode("overwrite").parquet(args.output)
            print(f"search results -> {args.output}")
        else:
            res.show(50, truncate=False)
        return 0
    rep = idx.drift_report()
    print(f"drift {args.name}: {rep}")
    # non-zero exit when a retrain is clearly due lets schedulers alert
    return 1 if rep["move_fraction"] > 0.5 else 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
