"""Persisted BM25 inverted-index operations as a job CLI — the lexical
sibling of ``jobs.ann_index``.

Subcommands::

    text_index build  --name db.tix --input-parquet docs.parquet \
        [--n-buckets 32]
    text_index add    --name db.tix --input-parquet batch.parquet
    text_index search --name db.tix --query "merge join window" \
        [--top-k 10] [--output out_dir]

Input parquet needs (doc_id, text). ``search`` takes one query string
(query_id 0); ``--output`` writes results as parquet, otherwise the top
rows print for ad-hoc use.
"""

from __future__ import annotations

from datalake_iceberg_spark.jobs.common import (
    base_parser,
    get_catalog,
    get_session,
    load_settings,
)
from datalake_iceberg_spark.ops.text_index import TextIndex


def build_parser():
    p = base_parser("persisted BM25 inverted index build / add / search")
    p.add_argument("command", choices=["build", "add", "search"])
    p.add_argument("--name", required=True, help="index table name")
    p.add_argument("--input-parquet", default=None,
                   help="(doc_id, text) parquet for build/add")
    p.add_argument("--query", default=None, help="search query string")
    p.add_argument("--n-buckets", type=int, default=32)
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--output", default=None, help="search-result parquet dir")
    return p


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    settings = load_settings(args)
    spark = get_session(f"text_index:{args.command}", settings, spark)
    catalog = get_catalog(spark, settings)
    if args.command in ("build", "add"):
        if not args.input_parquet:
            raise SystemExit(f"{args.command} requires --input-parquet")
        docs = spark.read.parquet(args.input_parquet).select("doc_id", "text")
        if args.command == "build":
            idx = TextIndex.create(
                catalog, args.name, docs, n_buckets=args.n_buckets
            )
            print(f"built {args.name}: docs={idx.docs.read().count()} "
                  f"postings={idx.postings.read().count()}")
        else:
            rep = TextIndex.open(catalog, args.name).add(docs)
            print(f"add {args.name}: {rep}")
        return 0
    if not args.query:
        raise SystemExit("search requires --query")
    idx = TextIndex.open(catalog, args.name)
    res = idx.search([(0, args.query)], top_k=args.top_k)
    if args.output:
        res.write.mode("overwrite").parquet(args.output)
        print(f"search results -> {args.output}")
    else:
        res.show(args.top_k, truncate=False)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
