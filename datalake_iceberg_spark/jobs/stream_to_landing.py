"""Stream source → partitioned parquet landing — the reference's
``kafka_to_s3.py`` job: readStream from the source (file-backed dir
locally; ``--source-format kafka`` swaps the reader when the Kafka jar
is deployed), foreachBatch-write time-partitioned parquet, availableNow
drain or continuous with ``--processing-time``.
"""

from __future__ import annotations

from datalake_iceberg_spark.ingest.landing import land_stream
from datalake_iceberg_spark.jobs.common import base_parser, get_session, load_settings


def build_parser():
    p = base_parser("stream source -> partitioned parquet landing")
    p.add_argument("--source-path", required=True,
                   help="stream source dir (or Kafka topic with --source-format kafka)")
    p.add_argument("--source-format", default="json",
                   choices=["json", "parquet", "kafka"])
    p.add_argument("--schema", default=None,
                   help="DDL schema string for json sources")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--ts-col", default="timestamp")
    p.add_argument("--granularity", choices=["day", "hour"], default="day")
    p.add_argument("--processing-time", default=None,
                   help="continuous trigger, e.g. '10 seconds'; default drains availableNow")
    p.add_argument("--timeout-sec", type=float, default=None)
    return p


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    settings = load_settings(args)
    spark = get_session("stream_to_landing", settings, spark)
    if args.source_format == "kafka":
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", settings.kafka.bootstrap_servers or "")
            .option("subscribe", args.source_path)
            .option("startingOffsets", settings.kafka.starting_offsets)
        )
        stream = reader.load()
    else:
        reader = spark.readStream
        if args.schema:
            reader = reader.schema(args.schema)
        stream = reader.format(args.source_format).load(args.source_path)
    q = land_stream(
        stream, args.output, args.checkpoint,
        ts_col=args.ts_col, granularity=args.granularity,
        available_now=args.processing_time is None,
        processing_time=args.processing_time,
    )
    if args.timeout_sec:
        q.awaitTermination(args.timeout_sec)
        q.stop()
    else:
        q.awaitTermination()
    print(f"landed stream {args.source_path} -> {args.output}")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
