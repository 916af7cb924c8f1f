"""CDC streams → lake MERGE apply — the reference's
``kafka_to_iceberg.py`` (one drain) and ``kafka_to_iceberg_stream.py``
(``--rounds``: the always-on drain→sleep→repeat loop with the
signal-file graceful shutdown).

``--sources`` is a JSON file listing one object per topic::

    [{"name": "db.orders", "path": "/landing/orders",
      "format": "json", "schema": "op string, id bigint, v string, ...",
      "key_cols": ["id"], "target": "db.orders",
      "write_mode": "copy-on-write"}]

An Avro-wire topic adds ``"avro": {"payload_schema": "<row DDL>"}``
(optional ``"value_col"``): the job resolves each batch's embedded
Confluent schema ids against ``KAFKA__SCHEMA_REGISTRY`` and decodes
inside foreachBatch — the reference's registry loop, declaratively.

Each source drains through its own checkpoint into its target table
(which a snapshot job created beforehand, as in the reference flow);
thread/semaphore parallelism, per-source failure domains, heartbeat
watermarks and the round loop all come from the streaming runner.
"""

from __future__ import annotations

import json

from datalake_iceberg_spark.jobs.common import (
    base_parser,
    get_catalog,
    get_session,
    load_settings,
)
from datalake_iceberg_spark.ops.watermark import WatermarkStore
from datalake_iceberg_spark.streaming.runner import (
    CdcStreamRunner,
    SourceConfig,
    StopSignal,
    run_rounds,
)


def build_parser():
    p = base_parser("CDC streams -> lake MERGE apply")
    p.add_argument("--sources", required=True, help="JSON source-spec file")
    p.add_argument("--concurrency", type=int, default=None)
    p.add_argument("--checkpoint-root", default=None,
                   help="override RUNNER__CHECKPOINT_ROOT")
    p.add_argument("--dag-id", default=None, help="override RUNNER__DAG_ID")
    p.add_argument("--rounds", type=int, default=None,
                   help="run the always-on round loop for N rounds (omit = one drain)")
    p.add_argument("--round-interval-sec", type=float, default=None)
    p.add_argument("--signal-file", default=None,
                   help="graceful-shutdown signal file (round loop)")
    p.add_argument("--with-watermarks", action="store_true",
                   help="record heartbeat/progress watermarks in the ops ledger")
    p.add_argument("--registry-url", default=None,
                   help="Confluent Schema Registry base URL for sources "
                        "declaring avro wire decode (overrides "
                        "KAFKA__SCHEMA_REGISTRY)")
    return p


def load_sources(path: str, catalog, settings=None, registry_client=None):
    """``"avro": {"payload_schema": "<DDL>"}`` in a source spec wires
    the registry-driven wire decode (the reference's per-batch
    ``get_schema(sid)`` loop): messages are Confluent-framed
    Debezium-AVRO ``value`` bytes, resolved against
    ``settings.kafka.schema_registry`` inside foreachBatch. Pass
    ``registry_client`` to share one memoized client (tests inject a
    fake-transport one)."""
    from pyspark.sql import types as T

    specs = json.loads(open(path).read())
    out = []
    client = registry_client
    for s in specs:
        batch_pre = None
        avro = s.get("avro")
        if avro:
            if client is None:
                from datalake_iceberg_spark.cdc.schema_registry import (
                    SchemaRegistryClient,
                )

                url = settings.kafka.schema_registry if settings else None
                if not url:
                    raise ValueError(
                        f"source {s['name']!r} declares avro decode but "
                        "KAFKA__SCHEMA_REGISTRY is not configured"
                    )
                client = SchemaRegistryClient({"url": url})
            from datalake_iceberg_spark.cdc.schema_registry import (
                registry_avro_batch_decoder,
            )

            batch_pre = registry_avro_batch_decoder(
                client,
                T.StructType.fromDDL(avro["payload_schema"]),
                value_col=avro.get("value_col", "value"),
            )
        cfg = SourceConfig(
            name=s["name"],
            path=s["path"],
            format=s.get("format", "json"),
            schema=s.get("schema"),
            key_cols=s.get("key_cols", []),
            max_files_per_trigger=s.get("max_files_per_trigger"),
            options=s.get("options", {}),
            write_mode=s.get("write_mode", "copy-on-write"),
            batch_pre_transform=batch_pre,
        )
        out.append((cfg, catalog.table(s.get("target", s["name"]))))
    return out


def main(argv=None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    settings = load_settings(args)
    if args.registry_url:
        settings.kafka.schema_registry = args.registry_url
    spark = get_session("cdc_to_lake", settings, spark)
    catalog = get_catalog(spark, settings)
    store = None
    if args.with_watermarks:
        store = WatermarkStore(catalog)
        store.ensure_tables()
    if args.checkpoint_root:
        settings.runner.checkpoint_root = args.checkpoint_root
    if args.dag_id:
        settings.runner.dag_id = args.dag_id
    runner = CdcStreamRunner.from_settings(spark, settings=settings, store=store)
    sources = load_sources(args.sources, catalog, settings=settings)
    concurrency = args.concurrency or settings.runner.max_concurrency
    if args.rounds is None:
        errors = runner.run_sources(sources, concurrency=concurrency)
        failed = {n: e for n, e in errors.items() if e}
        for n, e in failed.items():
            print(f"FAILED {n}: {e}")
        print(f"drained {len(sources) - len(failed)}/{len(sources)} sources")
        return 1 if failed else 0
    signal = StopSignal(
        args.signal_file or f"{runner.checkpoint_root}/{runner.dag_id}.stop"
    )
    rc = run_rounds(
        runner, sources, signal,
        round_interval_sec=args.round_interval_sec
        or settings.runner.round_interval_sec,
        max_rounds=args.rounds,
    )
    print(f"round loop exited rc={rc}")
    return rc


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
