"""Confluent Schema Registry client — the last wire seam of the CDC path.

The reference resolves every batch's embedded schema ids against a live
registry (``src/utils/cdc_pipeline.py:269-272`` builds
``{schema_id: schema_str}`` maps per micro-batch;
``:374`` constructs ``SchemaRegistryClient({"url": ...})``). This module
re-expresses that on the standard library only:

- :class:`SchemaRegistryClient` speaks the public Confluent REST API
  (``GET /schemas/ids/{id}``, ``GET /subjects/{s}/versions/{v}``) via an
  injectable ``transport`` callable, so tests and air-gapped runs swap in
  a fake without patching HTTP internals (same seam pattern as the Vault
  adapter, ``settings.py:217``). Registered schema ids are IMMUTABLE in
  the registry, so responses are memoized for the client's lifetime —
  a 1000-executor job resolves each id once per driver, not per batch.
- :func:`registry_schema_map` is the per-batch loop: distinct ids from
  the wire-metadata column (a bounded driver collect over ≤ a handful of
  ints, mirroring the reference) → fetch each → the exact
  ``{schema_id: schema_json}`` map ``parse_avro_envelope_python`` /
  ``try_from_avro`` consume. FAILFAST: an id the registry doesn't know
  raises — silently skipping an unknown-schema message would drop CDC
  events.

Everything here is driver-side control plane; no executor ever holds a
registry connection.
"""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.request
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame

__all__ = [
    "RegisteredSchema",
    "SchemaRegistryClient",
    "SchemaRegistryError",
    "registry_avro_batch_decoder",
    "registry_schema_map",
]

# (url, headers, timeout_sec) -> (http_status, body_bytes)
Transport = Callable[[str, dict, float], tuple[int, bytes]]


class SchemaRegistryError(RuntimeError):
    """Registry interaction failed (HTTP error, bad payload, unknown id)."""


@dataclass(frozen=True)
class RegisteredSchema:
    """One registry entry: the reference reads ``.schema_str`` off the
    confluent-kafka client's return value; same attribute here."""

    schema_id: int
    schema_str: str
    schema_type: str = "AVRO"
    subject: str | None = None
    version: int | None = None


def _urllib_transport(url: str, headers: dict, timeout: float) -> tuple[int, bytes]:
    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310 — http(s) registry URL from settings
            return resp.status, resp.read()
    except urllib.error.HTTPError as exc:
        return exc.code, exc.read()


class SchemaRegistryClient:
    """Minimal read-side Confluent Schema Registry REST client.

    ``conf`` mirrors the confluent-kafka constructor shape the reference
    uses (``{"url": ..., "basic.auth.user.info": "user:pass"}``);
    ``transport`` swaps the HTTP layer out for tests/offline runs.
    """

    def __init__(
        self,
        conf: dict | str,
        transport: Transport | None = None,
        timeout: float = 10.0,
    ) -> None:
        if isinstance(conf, str):
            conf = {"url": conf}
        url = (conf.get("url") or "").rstrip("/")
        if not url:
            raise ValueError("schema registry conf requires a non-empty 'url'")
        self.base_url = url
        self.timeout = timeout
        self._transport = transport or _urllib_transport
        self._headers = {"Accept": "application/vnd.schemaregistry.v1+json"}
        auth = conf.get("basic.auth.user.info")
        if auth:
            token = base64.b64encode(auth.encode()).decode()
            self._headers["Authorization"] = f"Basic {token}"
        self._by_id: dict[int, RegisteredSchema] = {}

    # ------------------------------------------------------------ http
    def _get(self, path: str) -> dict:
        url = f"{self.base_url}{path}"
        try:
            status, body = self._transport(url, dict(self._headers), self.timeout)
        except SchemaRegistryError:
            raise
        except Exception as exc:  # DNS, refused, timeout, ...
            raise SchemaRegistryError(f"GET {url} failed: {exc}") from exc
        if status == 404:
            raise SchemaRegistryError(f"not found in registry: {path}")
        if status != 200:
            raise SchemaRegistryError(
                f"GET {url} -> HTTP {status}: {body[:200]!r}"
            )
        try:
            doc = json.loads(body)
        except ValueError as exc:
            raise SchemaRegistryError(
                f"GET {url} returned non-JSON body: {body[:200]!r}"
            ) from exc
        if not isinstance(doc, dict):
            raise SchemaRegistryError(f"GET {url} returned {type(doc).__name__}")
        return doc

    # ------------------------------------------------------------- api
    def get_schema(self, schema_id: int) -> RegisteredSchema:
        """Schema by global id (``GET /schemas/ids/{id}``) — what the
        reference calls per distinct wire id. Memoized: ids are
        immutable once registered."""
        schema_id = int(schema_id)
        hit = self._by_id.get(schema_id)
        if hit is not None:
            return hit
        doc = self._get(f"/schemas/ids/{schema_id}")
        if "schema" not in doc:
            raise SchemaRegistryError(
                f"registry response for id {schema_id} has no 'schema' field"
            )
        rec = RegisteredSchema(
            schema_id=schema_id,
            schema_str=doc["schema"],
            schema_type=doc.get("schemaType", "AVRO"),
        )
        self._by_id[schema_id] = rec
        return rec

    def get_version(self, subject: str, version: int | str = "latest") -> RegisteredSchema:
        """Subject-versioned lookup (``GET /subjects/{s}/versions/{v}``) —
        how a consumer pins a reader schema. NOT memoized: 'latest'
        moves as producers evolve."""
        doc = self._get(f"/subjects/{subject}/versions/{version}")
        for fld in ("id", "schema"):
            if fld not in doc:
                raise SchemaRegistryError(
                    f"registry response for {subject}/{version} has no {fld!r}"
                )
        rec = RegisteredSchema(
            schema_id=int(doc["id"]),
            schema_str=doc["schema"],
            schema_type=doc.get("schemaType", "AVRO"),
            subject=doc.get("subject", subject),
            version=doc.get("version"),
        )
        # versioned responses still pin an immutable global id — seed
        # the id cache so the decode loop never re-fetches it
        self._by_id.setdefault(rec.schema_id, rec)
        return rec


def subject_for(topic: str, part: str = "value") -> str:
    """Confluent TopicNameStrategy subject for a topic: ``<topic>-value``
    / ``<topic>-key`` — the default strategy the reference's topics use;
    pass to :meth:`SchemaRegistryClient.get_version` to pin a reader
    schema by subject instead of wire id."""
    if part not in ("key", "value"):
        raise ValueError(f"part must be 'key' or 'value', got {part!r}")
    return f"{topic}-{part}"


def registry_schema_map(
    client: SchemaRegistryClient,
    df: DataFrame,
    id_col: str = "value_schema_id",
) -> dict[int, str]:
    """Per-batch id→schema resolution (``cdc_pipeline.py:269-272``):
    distinct wire ids in this batch (bounded driver collect — a live
    topic carries a handful of versions, not thousands), each resolved
    through the memoized client. The result feeds
    ``parse_avro_envelope_python(..., avro_schema_json=<this map>)``
    directly. Raises on any id the registry doesn't know (FAILFAST)."""
    ids = [
        int(r[0])
        for r in df.select(id_col).distinct().collect()
        if r[0] is not None
    ]
    return {sid: client.get_schema(sid).schema_str for sid in sorted(ids)}


def registry_avro_batch_decoder(
    client: SchemaRegistryClient,
    payload_schema,
    value_col: str = "value",
):
    """foreachBatch-side wire decode, the reference's full loop
    (``cdc_pipeline.py:254-294``): resolve THIS batch's embedded schema
    ids against the live registry, then decode every message with the
    schema its own Confluent header names. Returns a callable for
    ``SourceConfig.batch_pre_transform`` — it must run inside
    foreachBatch, not on the stream, because id resolution is an action
    (``distinct().collect()`` of a few ints) that streaming plans can't
    execute. Multi-version batches decode correctly by construction:
    the id→schema map covers every id present, and
    ``parse_avro_envelope_python`` dispatches per message. FAILFAST on
    ids the registry doesn't know."""

    def _decode(batch_df: DataFrame) -> DataFrame:
        from datalake_iceberg_spark.cdc.debezium import (
            parse_avro_envelope_python,
        )
        from datalake_iceberg_spark.functions.temporal import (
            confluent_schema_id,
        )

        ids_df = batch_df.select(
            confluent_schema_id(value_col).alias("__sid")
        )
        schema_map = registry_schema_map(client, ids_df, id_col="__sid")
        return parse_avro_envelope_python(
            batch_df, payload_schema, schema_map,
            value_col=value_col, confluent_framed=True,
        )

    return _decode
